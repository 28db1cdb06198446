"""Connected components over a pair list — duplicate-cluster formation.

The dedup operators (minhash_lsh_pairs, ngram_jaccard_pairs, simhash)
emit *pairs*; a pipeline needs *groups* (keep one representative per
component).  Pairs → components is connected components, computed in
two phases:

**Phase 1 — partition-local union-find.**  The edge list is hash-
bucketed into groups of ~``rows_per_partition`` edges and each group is
collapsed independently by an in-executor union-find
(``applyInPandas``; path-compressed, min-rooted).  One shuffle of
8-byte id pairs, one vectorized pass — every chain that lives inside a
bucket collapses in O(alpha) immediately instead of one hop per
distributed round.  Labels never leave the executors.

**Phase 2 — min-label propagation on the contracted graph.**  Local
roots that share a node across buckets are bridged (root → the node's
global-min root) and the much smaller bridge graph is solved by
iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint, INTERLEAVED with pointer jumping
(label(v) ← label(label(v))) each round — the Shiloach-Vishkin
shortcut; same family as Hash-to-Min (Rastogi et al.) and the
two-phase/contraction structure of Kiveris et al.'s "Connected
Components in MapReduce and Beyond".  The contracted graph has one
node per (bucket, local component) that straddles buckets — orders of
magnitude smaller than the input, and its diameter (≤ number of
buckets a component spans) bounds the distributed rounds, where the
raw graph's diameter (similarity-chain length, which grows with
corpus size) bounded them before.  Measured at sf0.1: 13 rounds of
3 joins each → 0 rounds (single bucket) / 1-2 rounds (many buckets).

Each loop round is three keyed equi-joins + a min-aggregate; the
per-iteration convergence check is a scalar count — the only
driver-side value; labels never leave the cluster.  Lineage is
truncated each round: eager ``localCheckpoint`` by default, reliable
``checkpoint(checkpoint_dir)`` when a directory is supplied (pass an
HDFS/S3 path on a real cluster so recomputation can't cascade through
executor loss).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_partition(pdf: pd.DataFrame) -> pd.DataFrame:
    """Collapse one edge bucket: (a, b) pairs -> (node, root) with
    root = min node id of the node's local component.

    Ids are factorized to dense indices so the union-find state is two
    numpy int64 arrays (~16 bytes/node — a 2M-edge bucket costs tens of
    MB, not the hundreds a dict of boxed ints would).  Union joins the
    two trees' roots; the final vectorized pointer-jump pass both fully
    compresses the forest and rewrites every root to its component's
    MIN id (the invariant the caller needs).  Runs inside the
    executor's Python worker — the driver never sees an edge."""
    import numpy as np

    a_col = pdf["a"].to_numpy(dtype="int64", copy=False)
    b_col = pdf["b"].to_numpy(dtype="int64", copy=False)
    codes, uniques = pd.factorize(np.concatenate([a_col, b_col]))
    n = len(uniques)
    ids = np.asarray(uniques, dtype="int64")
    parent = np.arange(n, dtype="int64")
    ca, cb = codes[: len(a_col)], codes[len(a_col):]

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(ca, cb):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[ry] = rx

    # collapse the whole forest: repeated vectorized pointer jumping
    # (log-depth passes), then relabel each tree to its min member id
    while True:
        grand = parent[parent]
        if np.array_equal(grand, parent):
            break
        parent = grand
    min_id = np.full(n, np.iinfo("int64").max, dtype="int64")
    np.minimum.at(min_id, parent, ids)
    return pd.DataFrame({"node": ids, "root": min_id[parent]})


def _min_label_loop(
    sym: DataFrame,
    labels: DataFrame,
    max_iter: int,
    ckpt,
) -> DataFrame:
    """Min-label propagation + pointer jumping to fixpoint.

    ``sym``: symmetric edge list (a, b); ``labels``: (node, component)
    initial labels.  Both should be materialized by the caller."""
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_chg"),
            )
        )
        # materialize before the self-join below, or the neighbor
        # join above would be recomputed for both sides of it
        stepped = ckpt(stepped)
        # pointer jumping: component ← label(component).  Labels that
        # already moved k hops this round move 2k, so chains collapse
        # in O(log d) rounds instead of d.
        ptr = stepped.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_labels = (
            stepped.join(ptr, stepped["component"] == ptr["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("p_comp", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("_chg", F.lit(False))
                    | (F.col("p_comp") < F.col("component"))
                ).alias("_changed"),
            )
        )
        new_labels = ckpt(new_labels)
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    rows_per_partition: int = 2_000_000,
    checkpoint_dir: str | None = None,
    local_phase: bool = True,
) -> DataFrame:
    """Return (node, component) — component = min node id reachable.

    ``edges``: undirected pair list (each pair once is fine).  Integral
    ids (the dedup operators emit BIGINT doc ids) take the fast
    union-find phase; non-integral ids (strings, uuids) are detected
    from the column types and automatically fall back to pure min-label
    propagation (``local_phase=False``) — F.min/least order strings
    lexicographically, so "component = min reachable id" stays
    well-defined, just without the numpy contraction step.
    Raises if the propagation loop hasn't converged in ``max_iter``
    rounds (contracted-graph diameter guard).

    ``checkpoint_dir``: when given, per-round lineage truncation uses a
    RELIABLE ``checkpoint`` into that directory (HDFS/S3 path on a real
    cluster) — executor loss can then recover from storage instead of
    recomputing the whole iteration cascade.  When ``None`` (local/test
    default) the cheaper ``localCheckpoint`` is used; its blocks live
    in executor memory/disk and die with the executor, which is fine on
    a single-node session and NOT fine on a 1000-executor job.

    ``local_phase``: set False to skip the union-find contraction and
    run pure min-label propagation on the raw edges (the loop is then
    bounded by the raw graph's diameter — kept for tests and as the
    fallback for non-integral ids).

    The iteration frames (edge list + labels) are usually orders of
    magnitude smaller than the documents they came from, but AQE's
    ``parallelismFirst`` keeps shuffles at default parallelism — dozens
    of near-empty tasks per round × several stages × several rounds is
    pure scheduling overhead.  So bucket/partition counts are sized
    from the MATERIALIZED edge count (the checkpoint makes the count
    free): ~``rows_per_partition`` rows per task, which collapses to
    1-2 buckets on test data and grows linearly for a 10^12-edge
    list."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def ckpt(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # the union-find phase needs int64 numpy ids; anything else (string
    # doc ids, uuids) routes to the propagation-only path UNCASTED — an
    # ANSI bigint cast on strings would throw at runtime (or null out
    # nodes with ANSI off)
    integral = {"tinyint", "smallint", "int", "bigint"}
    dt = dict(edges.select(src, dst).dtypes)
    if not (dt[src] in integral and dt[dst] in integral):
        local_phase = False
        id_expr = F.col
    else:
        id_expr = lambda c: F.col(c).cast("bigint")  # noqa: E731

    # materialize the pair list BEFORE anything that references it twice
    # (the upstream plan — possibly expensive LSH candidate generation —
    # must run exactly once)
    edges = ckpt(edges.select(id_expr(src).alias("a"), id_expr(dst).alias("b")))
    parallelism = spark.sparkContext.defaultParallelism
    # NOTE (ADVICE r11): with a duplicate-tolerant pair source
    # (minhash_lsh_pairs distinct_pairs=False) this count includes up
    # to bands-x duplicated edges, so buckets/partitions are sized for
    # the stream actually processed — slightly MORE buckets than the
    # unique-edge count needs, which errs toward smaller (safer)
    # union-find groups at the cost of a few more bridge rows.
    n_edges = edges.count()
    parts = max(1, min(parallelism * 8, 2 * n_edges // rows_per_partition + 1))

    if not local_phase:
        sym = edges.union(edges.select(F.col("b"), F.col("a")))
        sym = ckpt(sym.repartition(parts, "b"))
        labels = ckpt(
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .repartition(parts, "node")
        )
        return _min_label_loop(sym, labels, max_iter, ckpt)

    # ---- phase 1: bucket edges, union-find each bucket in-executor ----
    # bucket by hash of the FULL edge (a, b): any partition of the edge
    # SET is correct — bucketing only decides how much collapses locally
    # vs in the bridge loop — and the full-edge hash keeps every bucket
    # ~uniform at ~rows_per_partition edges.  Hashing only the src
    # endpoint would co-locate stars (nice locally) but lets one hot hub
    # concentrate millions of edges in a single applyInPandas group — a
    # straggler/OOM at corpus scale; a hub's edges spread here instead
    # and its component is stitched by the bridge loop.
    n_buckets = max(1, min(parallelism * 8, n_edges // rows_per_partition + 1))
    local = ckpt(
        edges.withColumn("_bucket", F.pmod(F.xxhash64("a", "b"), F.lit(n_buckets)))
        .groupBy("_bucket")
        .applyInPandas(
            lambda _key, pdf: _union_find_partition(pdf),
            "node bigint, root bigint",
        )
    )

    # ---- phase 2: bridge local components that share a node ----
    # Single-bucket fast path: with one bucket every edge was in the
    # same union-find, so no component can straddle buckets and the
    # bridge graph is empty BY CONSTRUCTION — skip the gmin aggregate,
    # the bridge materialization and the emptiness-probe job outright
    # (three eager jobs of pure overhead at test scale; at corpus
    # scale n_buckets > 1 and this branch never fires).  Phase 1
    # already emits one (node, root) row per node in that case.
    if n_buckets == 1:
        return local.select("node", F.col("root").alias("component"))

    # node seen in k buckets with distinct roots r1..rk, gmin = min ri:
    # contraction edges (ri, gmin).  Two local components are globally
    # connected iff a chain of shared nodes links them, which is exactly
    # the connectivity of this bridge graph.
    gmin = local.groupBy("node").agg(F.min("root").alias("gmin"))
    bridges = ckpt(
        local.join(gmin, "node")
        .filter(F.col("root") != F.col("gmin"))
        .select(F.col("root").alias("a"), F.col("gmin").alias("b"))
        .distinct()
    )

    if bridges.limit(1).count() == 0:
        # single bucket, or no component spans buckets: roots are final
        return local.groupBy("node").agg(F.min("root").alias("component"))

    sym = bridges.union(bridges.select(F.col("b"), F.col("a")))
    sym = ckpt(sym.repartition(parts, "b"))
    blabels = ckpt(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .repartition(parts, "node")
    )
    bcomp = _min_label_loop(sym, blabels, max_iter, ckpt).select(
        F.col("node").alias("r_node"), F.col("component").alias("r_comp")
    )

    # map local roots through the resolved bridge components; roots not
    # in the bridge graph already are their component's min.  A node's
    # rows across buckets all resolve to the same component (their roots
    # are bridge-connected), so the groupBy-min is a dedup, not a choice.
    return (
        local.join(bcomp, local["root"] == bcomp["r_node"], "left")
        .select("node", F.coalesce("r_comp", F.col("root")).alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def dedup_components(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, cluster_id, is_representative) for EVERY id: paired ids get
    their component's min id, unpaired ids are their own singleton.
    ``keep = is_representative`` is the dedup decision."""
    comp = connected_components(pairs, pair_a, pair_b, checkpoint_dir=checkpoint_dir)
    return (
        all_ids.select(F.col(id_col))
        .join(comp, all_ids[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_representative", F.col(id_col) == F.col("cluster_id"))
    )
