"""Connected components over a pair list — duplicate-cluster formation.

The dedup operators (minhash_lsh_pairs, ngram_jaccard_pairs, simhash)
emit *pairs*; a pipeline needs *groups* (keep one representative per
component).  Pairs → components is connected components, computed here
by iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint, INTERLEAVED with pointer jumping
(label(v) ← label(label(v))) each round.  Neighbor propagation alone
needs diameter-many rounds — near-dup graphs contain long similarity
chains, and at corpus scale chains only get longer.  Pointer jumping
lets already-propagated labels shortcut through each other (the
Shiloach-Vishkin idea; same family as Hash-to-Min, Rastogi et al.).
On a pure min-directed chain distance doubles per round (measured: a
200-node path converges in 8 rounds vs 199 without); on the sf0.1
LSH pair graph, whose chains aren't all oriented toward the
component min, measured rounds drop 23 → 13.

Each round is three keyed equi-joins + a min-aggregate (neighbor
join, label merge, jump self-join); the
per-iteration convergence check is a scalar count — the only
driver-side value; labels never leave the cluster.  Lineage is
truncated each round: eager ``localCheckpoint`` by default, reliable
``checkpoint(checkpoint_dir)`` when a directory is supplied (pass an
HDFS/S3 path on a real cluster so recomputation can't cascade through
executor loss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    rows_per_partition: int = 2_000_000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return (node, component) — component = min node id reachable.

    ``edges``: undirected pair list (each pair once is fine).
    Raises if not converged in ``max_iter`` (diameter guard).

    ``checkpoint_dir``: when given, per-round lineage truncation uses a
    RELIABLE ``checkpoint`` into that directory (HDFS/S3 path on a real
    cluster) — executor loss can then recover from storage instead of
    recomputing the whole iteration cascade.  When ``None`` (local/test
    default) the cheaper ``localCheckpoint`` is used; its blocks live
    in executor memory/disk and die with the executor, which is fine on
    a single-node session and NOT fine on a 1000-executor job.

    The iteration frames (edge list + labels) are usually orders of
    magnitude smaller than the documents they came from, but AQE's
    ``parallelismFirst`` keeps shuffles at default parallelism — dozens
    of near-empty tasks per round × several stages × several rounds is
    pure scheduling overhead.  So partitioning is sized from the
    MATERIALIZED edge count (the checkpoint makes the count free):
    ~``rows_per_partition`` rows per task, which collapses to 1-2
    partitions on test data and grows linearly for a 10^12-edge list."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def ckpt(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # materialize the pair list BEFORE the symmetrizing union: both
    # union branches reference `edges`, and without this the (possibly
    # expensive — LSH candidate generation) upstream plan runs twice
    edges = ckpt(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    parallelism = spark.sparkContext.defaultParallelism
    parts = max(1, min(parallelism * 8, 2 * edges.count() // rows_per_partition + 1))
    sym = edges.union(edges.select(F.col("b"), F.col("a")))
    sym = ckpt(sym.repartition(parts, "b"))

    labels = ckpt(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .repartition(parts, "node")
    )

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
