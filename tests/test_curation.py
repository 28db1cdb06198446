"""Semantic edge-case tests for the round-8 curation/analytics queries:
ordered funnel, n-gram novelty, histogram quantile gate, shard export,
and per-dimension embedding moments.  Style follows test_corpus.py —
monkeyed load_table over constructed frames for exact semantics, plus
plan-shape assertions for the scale posture."""

from __future__ import annotations

import datetime as dt

from confluent_kafka_streams_examples_spark.plans.describe import explain_str
from confluent_kafka_streams_examples_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _with_table(module, df, fn, spark):
    """Run query fn with the module's load_table returning df."""
    orig = module.load_table
    module.load_table = lambda spark, name, sf_dir: df  # noqa: ARG005
    try:
        return fn(spark, SF_SMOKE).collect()
    finally:
        module.load_table = orig


# ---------------------------------------------------------------- funnel

def test_funnel_strict_order_semantics(spark):
    """A purchase BEFORE the user's first post-view click must not
    count at stage 3; users lacking a stage are absent downstream."""
    import confluent_kafka_streams_examples_spark.queries_extra as qe

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: full funnel in order
        (1, "view", t0),
        (1, "click", t0 + s),
        (1, "purchase", t0 + 2 * s),
        # user 2: purchase first -> reaches click, NOT purchase
        (2, "purchase", t0),
        (2, "view", t0 + s),
        (2, "click", t0 + 2 * s),
        # user 3: click only -> no stages
        (3, "click", t0),
        # user 4: view only -> stage 1
        (4, "view", t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r["stage"]: r["n_users"]
        for r in _with_table(qe, df, qe.funnel_conversion, spark)
    }
    assert out == {"1_view": 3, "2_click": 2, "3_purchase": 1}


def test_funnel_pushes_type_predicate_to_scan(spark):
    p = explain_str(QUERIES["funnel_conversion"](spark, SF_SMOKE), "formatted")
    assert "PushedFilters" in p and "event_type" in p
    assert "CartesianProduct" not in p


# --------------------------------------------------------------- novelty

def test_ngram_novelty_union_of_predecessors(spark):
    """A verbatim repeat scores 0 novelty; a doc sharing one of two
    shingles scores 0.5; sub-3-token docs are absent."""
    import confluent_kafka_streams_examples_spark.queries_llm as ql

    rows = [
        (1, "a b c d"),  # shingles {a b c, b c d} -> both novel
        (2, "a b c d"),  # same -> 0 novel
        (3, "a b c x"),  # {a b c (owned by 1), b c x (novel)} -> 0.5
        (4, "a b"),      # < 3 tokens -> no shingles -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in _with_table(df=df, module=ql, fn=ql.ngram_novelty_scores, spark=spark)
    }
    assert out == {1: (2, 2, 1.0), 2: (2, 0, 0.0), 3: (2, 1, 0.5)}


# ------------------------------------------------- histogram quantile gate

def test_quality_threshold_matches_rank_reimplementation(spark):
    """Histogram threshold == independent per-doc reimplementation:
    for each lang, threshold_bucket is the LARGEST bucket whose
    at-or-above count covers >= 20% of the language's docs."""
    rows = QUERIES["text_stats"](spark, SF_SMOKE).collect()
    docs = QUERIES["quality_histogram_threshold"](spark, SF_SMOKE).collect()
    # rebuild buckets from the (engine-portable) rounded quality score
    from confluent_kafka_streams_examples_spark.session import load_table

    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, "documents", SF_SMOKE).select("doc_id", "lang").collect()
    }
    per_lang: dict[str, list[int]] = {}
    for r in rows:
        b = int(round(r["quality_score"] * 1e4)) // 100
        per_lang.setdefault(langs[r["doc_id"]], []).append(b)
    expect = {}
    for lang, buckets in per_lang.items():
        n = len(buckets)
        thr = None
        for b in sorted(set(buckets), reverse=True):
            kept = sum(1 for x in buckets if x >= b)
            if kept * 5 >= n:
                thr = (b, n, kept)
                break
        expect[lang] = thr
    got = {r["lang"]: (r["threshold_bucket"], r["n_total"], r["n_kept"]) for r in docs}
    assert got == expect


def test_quality_threshold_two_exchanges(spark):
    """Corpus-size-independent plan: one partial-agg exchange to the
    (lang, bucket) histogram, one lang repartition for the windows —
    never a per-doc rank window."""
    p = explain_str(QUERIES["quality_histogram_threshold"](spark, SF_SMOKE), "simple")
    assert p.count("Exchange") == 2, p


# ------------------------------------------------------------ shard export

def test_shard_export_positions_contiguous_and_deterministic(spark):
    out1 = QUERIES["corpus_shard_export"](spark, SF_SMOKE).collect()
    out2 = QUERIES["corpus_shard_export"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_shard: dict[int, list[int]] = {}
    for r in out1:
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # every doc exactly once
    from confluent_kafka_streams_examples_spark.session import load_table

    n_docs = load_table(spark, "documents", SF_SMOKE).count()
    assert len({r["doc_id"] for r in out1}) == len(out1) == n_docs


def test_shard_export_single_exchange(spark):
    """Shard windows need exactly ONE exchange (hash on shard_id) —
    a global ORDER BY would show a rangepartitioning exchange."""
    p = explain_str(QUERIES["corpus_shard_export"](spark, SF_SMOKE), "simple")
    assert p.count("Exchange") == 1, p
    assert "rangepartitioning" not in p.lower(), p


# -------------------------------------------------- embedding dim moments

def test_embedding_dim_stats_negative_mean_floor_semantics(spark):
    """Negative-numerator division parity: for INTEGER operands both
    Spark `div` and DuckDB `//` truncate toward zero (verified:
    `SELECT -250001 // 2` -> -125000 in DuckDB; `//` floors only for
    FLOAT operands), so sum=-250001 over n=2 docs -> mean -125000 on
    BOTH engines for any sign — no offset trick needed — and the
    Cauchy-Schwarz variance div is exact."""
    import confluent_kafka_streams_examples_spark.queries_corpus as qc

    rows = [([-0.25, 0.25],), ([-0.000001, 0.25],)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    out = {
        r["dim"]: (r["n"], r["sum_q"], r["mean_q"], r["var_q"], r["min_q"], r["max_q"])
        for r in _with_table(df=df, module=qc, fn=qc.embedding_dim_stats, spark=spark)
    }
    # float32 -1e-06 quantizes to floor(-0.99999... + 0.5) = -1
    assert out[0] == (2, -250001, -125000, 15624875000, -250000, -1)
    assert out[1] == (2, 500000, 250000, 0, 250000, 250000)


def test_embedding_dim_stats_partial_agg_before_exchange(spark):
    """The exchange must carry partials, not rows: HashAggregate
    appears both below and above the single exchange."""
    p = explain_str(QUERIES["embedding_dim_stats"](spark, SF_SMOKE), "simple")
    assert p.count("Exchange") == 1, p
    assert p.count("HashAggregate") >= 2, p


# ----------------------------------------------------- property tests
# Strategy: hypothesis corpora run through the ORACLE SQL (DuckDB, no
# Spark job per example) against brute-force Python references.  The
# driver hash-pins Spark == oracle at sf0.01, so oracle == reference
# here transitively pins Spark == reference.

import datetime as _dt

import duckdb
from hypothesis import given, settings, strategies as st

from confluent_kafka_streams_examples_spark.queries import ORACLES


def _brute_funnel(rows):
    """rows: (user_id, event_type, ts).  First-touch strict cascade."""
    by_user = {}
    for u, e, t in rows:
        by_user.setdefault(u, []).append((e, t))
    n = {1: 0, 2: 0, 3: 0}
    for evs in by_user.values():
        t1 = min((t for e, t in evs if e == "view"), default=None)
        if t1 is None:
            continue
        n[1] += 1
        t2 = min((t for e, t in evs if e == "click" and t > t1), default=None)
        if t2 is None:
            continue
        n[2] += 1
        t3 = min((t for e, t in evs if e == "purchase" and t > t2), default=None)
        if t3 is not None:
            n[3] += 1
    return {"1_view": n[1], "2_click": n[2], "3_purchase": n[3]}


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=40, deadline=None)
def test_funnel_oracle_matches_bruteforce(rows):
    t0 = _dt.datetime(2024, 1, 1)
    data = [(u, e, t0 + _dt.timedelta(seconds=s)) for u, e, s in rows]
    con = duckdb.connect()
    con.execute("CREATE TABLE events (user_id BIGINT, event_type VARCHAR, ts TIMESTAMP)")
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", data)
    got = dict(con.execute(ORACLES["funnel_conversion"]).fetchall())
    con.close()
    want = _brute_funnel([(u, e, ts) for u, e, ts in data])
    assert got == want
    # funnel monotonicity is implied but assert it explicitly
    assert got["1_view"] >= got["2_click"] >= got["3_purchase"]


def _brute_novelty(docs):
    """docs: (doc_id, text).  Distinct word-3-gram first-owner shares."""
    sh = {}
    per_doc = {}
    for doc_id, text in sorted(docs):
        toks = text.split(" ")
        grams = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
        if not grams:
            continue
        per_doc[doc_id] = grams
        for g in grams:
            sh.setdefault(g, doc_id)  # min doc_id owns (sorted insert order)
    out = {}
    for doc_id, grams in per_doc.items():
        novel = sum(1 for g in grams if sh[g] == doc_id)
        out[doc_id] = (len(grams), novel)
    return out


@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=10).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=40, deadline=None)
def test_novelty_oracle_matches_bruteforce(texts):
    docs = list(enumerate(texts))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(ORACLES["ngram_novelty_scores"]).fetchall()
    }
    con.close()
    want = _brute_novelty(docs)
    assert got == want
    # every distinct corpus shingle is novel in exactly one doc
    all_grams = set()
    for _, text in docs:
        toks = text.split(" ")
        all_grams |= {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert sum(n for _, n in got.values()) == len(all_grams)


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-0.5, max_value=0.5, allow_nan=False, width=32),
            min_size=2,
            max_size=2,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=40, deadline=None)
def test_dim_stats_oracle_matches_bruteforce(vecs):
    """Floor-division mean/variance over quantized values — pins the
    floor-vs-truncate semantics for any sign mix."""
    import math

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)", list(enumerate(vecs))
    )
    got = {
        r[0]: (r[1], r[2], r[5], r[6])  # n, sum_q, mean_q, var_q
        for r in con.execute(ORACLES["embedding_dim_stats"]).fetchall()
    }
    con.close()
    import struct

    def f32(x):  # the float32 the parquet column would store
        return struct.unpack("f", struct.pack("f", x))[0]

    def tdiv(a, b):
        # truncate-toward-zero division: Spark's `div` and DuckDB's
        # `//` on INTEGER operands (DuckDB floors only for floats) —
        # the engines' shared semantics since the r9 sign fix
        q = abs(a) // b
        return q if a >= 0 else -q

    for dim in (0, 1):
        qs = [math.floor(f32(v[dim]) * 1e6 + 0.5) for v in vecs]
        n, s = len(qs), sum(qs)
        mean = tdiv(s, n)
        # the variance numerator is >= 0 by Cauchy-Schwarz, so
        # truncation and floor agree and plain // is exact here
        var = (n * sum(q * q for q in qs) - s * s) // (n * n)
        assert got[dim] == (n, s, mean, var), dim


# ------------------------------------------------------------- z-order

def test_zorder_buckets_bound_both_dimensions(spark):
    """The pruning property: a z-bucket (top-8 z bits) confines EACH
    dimension to a <= 16-wide range (top 4 bits fixed per dim), vs 256
    under a single-key layout — this is why footer min/max prunes on
    either predicate."""
    rows = QUERIES["zorder_layout_stats"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["user_hi"] - r["user_lo"] <= 15, r
        assert r["hour_hi"] - r["hour_lo"] <= 15, r


def test_zorder_single_partial_agg_exchange(spark):
    p = explain_str(QUERIES["zorder_layout_stats"](spark, SF_SMOKE), "simple")
    assert p.count("Exchange") == 1, p
    assert p.count("HashAggregate") >= 2, p


def test_shard_export_writes_partitioned_layout(spark, tmp_path):
    """The manifest drives a real export: partitionBy(shard_id) write
    produces one directory per shard whose rows reproduce the manifest
    exactly — the trainer-facing contract of corpus_shard_export."""
    import os

    from confluent_kafka_streams_examples_spark.sources.parquet import write_sized

    manifest = QUERIES["corpus_shard_export"](spark, SF_SMOKE)
    out = str(tmp_path / "shards")
    write_sized(manifest, out, target_file_mb=64, partition_by=["shard_id"])
    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard_id=")
    )
    assert dirs == [f"shard_id={i}" for i in sorted(
        {r["shard_id"] for r in manifest.collect()}
    )]
    back = spark.read.parquet(out)
    a = sorted(map(tuple, manifest.select("shard_id", "pos", "doc_id").collect()))
    b = sorted(map(tuple, back.select("shard_id", "pos", "doc_id").collect()))
    assert a == b


# ------------------------------------------------------- hybrid search

def test_hybrid_search_is_subset_of_bm25_candidates(spark):
    """Every reranked hit must come from the lexical candidate set —
    the two-stage contract."""
    from confluent_kafka_streams_examples_spark.operators.text import bm25_rank
    from confluent_kafka_streams_examples_spark.session import load_table

    docs = load_table(spark, "documents", SF_SMOKE).select("doc_id", "text")
    cand = {
        r["doc_id"]
        for r in bm25_rank(docs, ["join", "merge", "vector"], topk=50).collect()
    }
    hits = QUERIES["hybrid_search"](spark, SF_SMOKE).collect()
    assert hits and {r["doc_id"] for r in hits} <= cand
    # rerank order is by cosine desc with id tie-break
    sims = [(r["cos_sim"], -r["doc_id"]) for r in hits]
    assert sims == sorted(sims, reverse=True)


def test_hybrid_search_broadcasts_candidates_into_rerank(spark):
    """The candidate set reaches the embeddings scan as a broadcast —
    the rerank never shuffles the embedding store."""
    p = explain_str(QUERIES["hybrid_search"](spark, SF_SMOKE), "simple")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


# ---------------------------------------------------------- CMS sketch

def test_cms_never_underestimates(spark):
    """The count-min invariant: est >= true for every probed key (a
    single underestimate means the sketch arithmetic diverged)."""
    rows = QUERIES["sketch_heavy_hitters"](spark, SF_SMOKE).collect()
    # sf0.001 has fewer than 20 distinct users; the LIMIT caps at 20
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["est_n"] >= r["true_n"], r


def test_cms_build_exchange_is_corpus_independent(spark):
    """The sketch build aggregates into a fixed 1,024-cell space with
    map-side partials — HashAggregate below and above its exchange."""
    p = explain_str(QUERIES["sketch_heavy_hitters"](spark, SF_SMOKE), "simple")
    assert p.count("HashAggregate") >= 2, p
    assert "CartesianProduct" not in p


# --------------------------------------------------------- bloom filter

def test_bloom_has_no_false_negatives(spark):
    """Every true duplicate must be bloom-positive — a false negative
    means the bit arithmetic diverged between build and probe."""
    rows = QUERIES["dedup_bloom_prefilter"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r["is_true_dup"] == 1:
            assert r["bloom_positive"] == 1, r


def test_bloom_bit_set_is_broadcast(spark):
    """The 65,536-row-bounded bit set reaches the probes as a
    broadcast; the probe side never shuffles on bit position."""
    p = explain_str(QUERIES["dedup_bloom_prefilter"](spark, SF_SMOKE), "simple")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_bpe_apply_merge_greedy_semantics(spark):
    """_apply_merge (operators/text.py): greedy leftmost
    non-overlapping merge, including the left==right run-parity case
    and merges at array edges."""
    from pyspark.sql import functions as F

    from confluent_kafka_streams_examples_spark.operators.text import (
        _apply_merge,
    )

    from confluent_kafka_streams_examples_spark.operators.text import (
        _pad,
        _padded_tokens,
    )

    cases = [
        # (tokens, left, right, expected)
        ("a b a b b a", "a", "b", ["a##b", "a##b", "b", "a"]),
        ("a a a a", "a", "a", ["a##a", "a##a"]),
        ("a a a", "a", "a", ["a##a", "a"]),
        ("x y", "x", "y", ["x##y"]),
        ("x y", "y", "x", ["x", "y"]),
        ("q", "q", "q", ["q"]),
        ("b a b a b", "a", "b", ["b", "a##b", "a##b"]),
    ]
    df = spark.createDataFrame(
        [(i, t, l, r) for i, (t, l, r, _) in enumerate(cases)],
        "i int, t string, l string, r string",
    )
    out = {
        r["i"]: r["m"]
        for r in df.select(
            "i",
            _padded_tokens(
                _apply_merge(_pad(F.col("t")), F.col("l"), F.col("r"))
            ).alias("m"),
        ).collect()
    }
    for i, (_, _, _, expect) in enumerate(cases):
        assert out[i] == expect, (i, cases[i], out[i])


def test_bpe_merge_rounds_rewrites_before_recount(spark):
    """bpe_merge_rounds: round 2 counts the REWRITTEN corpus — after
    merging the round-1 winner, a pair containing the merged token
    becomes the next winner (the rewrite-then-recount loop that makes
    this training, not the bpe_pair_counts statistic)."""
    from confluent_kafka_streams_examples_spark.operators.text import (
        bpe_merge_rounds,
    )

    # 'a b' wins round 1 (4x); after merging, 'a##b c' appears 3x and
    # must win round 2; round 3 then merges 'a##b##c d' (2x)
    docs = [
        ("a b c d",),
        ("a b c d",),
        ("a b c x",),
        ("a b x x",),
    ]
    df = spark.createDataFrame(docs, "text string")
    rows = {r["round"]: (r["pair"], r["n"]) for r in
            bpe_merge_rounds(df, "text", rounds=3).collect()}
    assert rows[1] == ("a b", 4)
    assert rows[2] == ("a##b c", 3)
    assert rows[3] == ("a##b##c d", 2)
