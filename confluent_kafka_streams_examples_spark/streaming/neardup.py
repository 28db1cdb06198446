"""Streaming NEAR-duplicate candidate generation — MinHash-LSH at
arrival time.

The batch dedup family (operators/dedup.py) finds near-duplicates by
banding stored MinHash signatures and equi-joining on band
signatures.  An ingest pipeline wants the same signal BEFORE landing:
"this incoming document collides with one we accepted minutes ago."
This module is that operator:

1. Each arriving document is SIGNED in its own row projection —
   `with_minhash_signatures` computes the identical Carter-Wegman
   signature the batch path stores, with array higher-order functions
   and no aggregation (a groupBy signature would be a second stateful
   operator and could not precede the LSH state in one query).
2. The signature splits into LSH bands (same layout as
   `band_signatures`), one row per band, keyed by a hash bucket of the
   band signature (the bucketed-state pattern of processor.py/funnel.py:
   Python invocations per trigger bounded by n_buckets, not by the
   band-key universe).
3. Per bucket, `applyInPandasWithState` holds {(band_idx, band_sig):
   [(doc_id, ts_us), ...]} for documents inside the WATERMARK HORIZON
   and emits a candidate pair (id_a = already-stored document, id_b =
   new document, band_idx) for every collision; entries older than the
   watermark are evicted on every visit, so state is bounded by
   rate x delay exactly like dropDuplicatesWithinWatermark — the
   near-in-time assumption is the same one the exact streaming dedup
   already makes (re-posts, mirrored feeds, crawl revisits cluster in
   time).

Pair orientation: within a micro-batch the fold SORTS by (ts_us,
doc_id) — Spark does not guarantee cross-partition row order after the
bucket shuffle, so frame order is not arrival order — which makes
id_a/id_b deterministic: id_a precedes id_b in event time within a
batch, and was stored in an earlier batch across batches.  A
re-delivered doc_id refreshes its stored timestamp and emits nothing
(every pair involving it already emitted when the later member first
arrived), so re-posts cannot flip orientation or duplicate entries.

Contract vs batch: over an in-order replay whose horizon spans the
whole stream, the DISTINCT {id_a, id_b} set equals
`minhash_lsh_pairs`' candidate set on the union of all batches
(differential-tested); a pair colliding in several bands emits once
per band (band_idx tells which), and consumers that need uniqueness
apply the same `.distinct()` the batch path does.  Late documents
(event time already behind the watermark) are dropped, not signed —
the standard horizon trade.

Reference analog: KTableExample's keyed state store consulted on every
arrival (KTableExample.scala:52-56), with the key being the LSH band
signature instead of the record key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from confluent_kafka_streams_examples_spark.operators.dedup import (
    band_signatures,
    with_minhash_signatures,
)

PAIR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("band_idx", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("blob", BinaryType())])


def _band_structs(num_hashes: int, bands: int) -> list:
    """Per-row LSH band structs over mh0..mh{K-1} columns — the same
    '|'-joined band_sig layout as the stored-artifact path
    (operators/dedup.py band_signatures), so streamed band keys join
    the persisted signature table exactly."""
    rows_per_band = num_hashes // bands
    return [
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.concat_ws(
                "|",
                *[
                    F.col(f"mh{bi * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            ).alias("band_sig"),
        )
        for bi in range(bands)
    ]


def neardup_candidates_stream(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    delay: str = "10 minutes",
    n_buckets: int = 1024,
) -> DataFrame:
    """Append-mode stream of (id_a, id_b, band_idx) MinHash-LSH
    candidate pairs, id_a stored first (event-time order within a
    micro-batch, batch order across micro-batches); state bounded by
    the watermark horizon ``delay``.  See module docstring for the
    batch parity contract."""
    import pickle

    horizon_us = int(pd.Timedelta(delay).total_seconds() * 1_000_000)
    base = (
        stream.withWatermark(ts_col, delay)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
            F.col(ts_col).alias("__ts"),  # keep the watermark attribute
            F.col(text_col),
        )
        # short/null docs have no signature (the grouped twin has no row
        # for them) — gate on the CHEAP equivalent predicate BEFORE the
        # signing projection.  A post-sign filter on mh0 IS NOT NULL
        # gets predicate-pushed below the projection (and any exchange)
        # and re-evaluates the ENTIRE 16-permutation chain inside the
        # scan stage — measured 10x the whole pillar (SCALE.md r11)
        .filter(
            F.col("doc_id").isNotNull()
            & (F.size(F.split(F.col(text_col), " ")) >= n)
        )
    )
    signed = with_minhash_signatures(base, text_col, num_hashes, n).drop(
        text_col
    )
    band_structs = _band_structs(num_hashes, bands)
    banded = signed.select(
        "doc_id",
        "ts_us",
        "__ts",
        F.explode(F.array(*band_structs)).alias("band"),
    ).select(
        "doc_id",
        "ts_us",
        "__ts",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_sig").alias("band_sig"),
        F.pmod(
            F.xxhash64(F.col("band.band_idx"), F.col("band.band_sig")),
            F.lit(n_buckets),
        ).cast("long").alias("bucket"),
    )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            last_sweep, store = pickle.loads(state.get[0])
        else:
            last_sweep, store = 0, {}
        out_a: list[int] = []
        out_b: list[int] = []
        out_bi: list[int] = []
        # frame order is NOT arrival order (the bucket shuffle merges
        # upstream partitions in nondeterministic order), so pin the
        # within-batch order to event time with doc_id tiebreak; evict
        # per touched key, not per batch — untouched keys age out the
        # next time their bucket is visited, which only delays RAM
        # reclaim, never changes emissions (expired entries can't be
        # matched: a new doc with ts >= wm never pairs under a key
        # whose stored docs are all < wm unless they are still listed)
        if len(pdf) > 1:
            pdf = pdf.sort_values(["ts_us", "doc_id"], kind="stable")
        for doc, ts_us, bi, sig in zip(
            pdf["doc_id"].tolist(),
            pdf["ts_us"].tolist(),
            pdf["band_idx"].tolist(),
            pdf["band_sig"].tolist(),
        ):
            if ts_us < wm_us:
                continue  # late past the horizon: dropped, not signed
            k = (bi, sig)
            prev = store.get(k)
            if prev is None:
                store[k] = [(doc, ts_us)]
                continue
            if len(prev) == 1:  # overwhelmingly common: fast path
                d, t = prev[0]
                if d == doc:
                    # re-delivery: refresh the entry in place — never a
                    # second (doc, ts) tuple, never a re-emission
                    prev[0] = (doc, max(t, ts_us))
                elif t >= wm_us:
                    out_a.append(d)
                    out_b.append(doc)
                    out_bi.append(bi)
                    prev.append((doc, ts_us))
                else:
                    store[k] = [(doc, ts_us)]
                continue
            live = [(d, t) for d, t in prev if t >= wm_us]
            for i, (d, t) in enumerate(live):
                if d == doc:  # re-delivery: refresh, emit nothing
                    live[i] = (doc, max(t, ts_us))
                    break
            else:
                for d, _t in live:
                    out_a.append(d)
                    out_b.append(doc)
                    out_bi.append(bi)
                live.append((doc, ts_us))
            store[k] = live
        # dead-key compaction is a FULL-store walk: amortize it to once
        # per half horizon of watermark progress (correctness does not
        # depend on it — expired entries are filtered at match time —
        # the sweep only bounds blob growth under key churn)
        if wm_us - last_sweep >= horizon_us // 2:
            for k in [
                k for k, v in store.items() if all(t < wm_us for _, t in v)
            ]:
                del store[k]
            last_sweep = wm_us
        state.update(
            (pickle.dumps((last_sweep, store), protocol=pickle.HIGHEST_PROTOCOL),)
        )
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "band_idx": out_bi}
            )

    return banded.groupBy("bucket").applyInPandasWithState(
        fold,
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def neardup_vs_corpus_stream(
    stream: DataFrame,
    corpus_sig: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Streaming ingest gate vs the WHOLE accepted corpus: each arriving
    document's per-row band signatures stream-static-join the persisted
    LSH signature artifact, emitting (id_a=new doc, id_b=matched corpus
    id, band_idx) — the collision signal `neardup_candidates_stream`
    cannot give beyond its watermark horizon (VERDICT r10 gap #2).

    ``corpus_sig`` is the stored (id, mh0..mh{K-1}) signature table that
    `incremental_minhash_pairs` / `dedup_incremental_persisted` already
    maintain (~1e-4 the corpus bytes); it is banded here with the SAME
    band_sig layout, so a streamed key equi-joins stored rows exactly.

    Stateless by design: no watermark, no state store — the corpus side
    carries the history.  A pair emits once per matching band per
    DELIVERY (band_idx distinguishes bands; re-deliveries re-emit —
    downstream dedup is a `.distinct()` away, same convention as the
    horizon operator).  Reference analog: the stream–table enrichment
    join (JoinsExample.scala:41-45) with the table side = the signature
    store.

    100 TB execution: ``broadcast_batch`` (default) broadcasts the
    MICRO-BATCH side — thousands of banded rows per trigger — so the
    multi-GB corpus signature table is never shuffled or sorted, just
    scanned and probed per trigger; disable it for bulk replays whose
    triggers are themselves huge, where a shuffle-hash join on band_sig
    against a signature artifact bucketed by band_sig co-locates both
    sides instead.
    """
    # cheap pre-sign short-doc gate, NOT a post-sign mh0 filter — see
    # neardup_candidates_stream for the pushed-predicate double-compute
    # this avoids (10x measured)
    base = stream.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col)
    ).filter(
        F.col("doc_id").isNotNull()
        & (F.size(F.split(F.col(text_col), " ")) >= n)
    )
    signed = with_minhash_signatures(base, text_col, num_hashes, n).drop(
        text_col
    )
    banded_new = signed.select(
        F.col("doc_id").alias("id_a"),
        F.explode(F.array(*_band_structs(num_hashes, bands))).alias("band"),
    ).select("id_a", F.col("band.band_idx"), F.col("band.band_sig"))
    if broadcast_batch:
        banded_new = banded_new.hint("broadcast")
    banded_corpus = band_signatures(corpus_sig, id_col, num_hashes, bands).select(
        F.col(id_col).alias("id_b"), "band_idx", "band_sig"
    )
    return banded_new.join(banded_corpus, ["band_idx", "band_sig"]).select(
        "id_a", "id_b", "band_idx"
    )


def neardup_ingest_gate_stream(
    stream: DataFrame,
    corpus_sig: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    delay: str = "10 minutes",
    n_buckets: int = 1024,
) -> DataFrame:
    """The full production ingest gate = both collision sources in ONE
    append-mode stream of (id_a, id_b, band_idx, match_src):

    - ``match_src='corpus'``: the arriving doc collides with the stored
      corpus signature artifact (stream-static band join, stateless);
    - ``match_src='batch'``: it collides with another RECENT arrival
      inside the watermark horizon (bucketed LSH state), canonicalized
      to id_a < id_b — the orientation `incremental_minhash_pairs`
      gives new-new pairs.

    Over an in-order replay whose horizon spans the stream, the distinct
    output equals the batch `incremental_minhash_pairs` candidate set on
    (union of batches) vs the same corpus table (differential-tested).
    Both branches read the one source stream; Spark runs them as two
    branches of a self-union in the same micro-batch.
    """
    corpus_hits = neardup_vs_corpus_stream(
        stream, corpus_sig, id_col, text_col, num_hashes, bands, n
    ).withColumn("match_src", F.lit("corpus"))
    batch_hits = neardup_candidates_stream(
        stream, id_col, text_col, ts_col, num_hashes, bands, n, delay, n_buckets
    ).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        "band_idx",
        F.lit("batch").alias("match_src"),
    )
    return corpus_hits.unionByName(batch_hits)
