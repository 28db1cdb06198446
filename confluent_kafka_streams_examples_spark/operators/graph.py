"""Connected components over a pair list — duplicate-cluster formation.

The dedup operators (minhash_lsh_pairs, ngram_jaccard_pairs, simhash)
emit *pairs*; a pipeline needs *groups* (keep one representative per
component).  Pairs → components is connected components, computed here
by iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Each iteration is one shuffle (join on the edge
list + min-aggregate); rounds needed = graph diameter in label-hops
(≈ log n with min-propagation on typical near-dup graphs, whose
components are tiny and star-like).  The per-iteration convergence
check is a scalar count — the only driver-side value; labels never
leave the cluster.  Lineage is truncated each round with an eager
``localCheckpoint`` (swap for reliable ``checkpoint(dir)`` on a real
cluster so recomputation can't cascade).

This is the standard "large-star/small-star"-family approach
specialized to min-propagation (see the Structured Streaming / GraphX
literature in PAPERS.md); for near-dup graphs the iteration count is
small and every step stays a keyed equi-join.
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
) -> DataFrame:
    """Return (node, component) — component = min node id reachable.

    ``edges``: undirected pair list (each pair once is fine).
    Raises if not converged in ``max_iter`` (diameter guard).

    The iteration frames (edge list + labels) are usually orders of
    magnitude smaller than the documents they came from, but AQE's
    ``parallelismFirst`` keeps shuffles at default parallelism — dozens
    of near-empty tasks per round × several stages × several rounds is
    pure scheduling overhead.  So partitioning is sized from the
    MATERIALIZED edge count (the checkpoint makes the count free):
    ~``rows_per_partition`` rows per task, which collapses to 1-2
    partitions on test data and grows linearly for a 10^12-edge list."""
    # materialize the pair list BEFORE the symmetrizing union: both
    # union branches reference `edges`, and without this the (possibly
    # expensive — LSH candidate generation) upstream plan runs twice
    edges = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    parallelism = edges.sparkSession.sparkContext.defaultParallelism
    parts = max(1, min(parallelism * 8, 2 * edges.count() // rows_per_partition + 1))
    sym = edges.union(edges.select(F.col("b"), F.col("a")))
    sym = sym.repartition(parts, "b").localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .repartition(parts, "node")
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
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
) -> DataFrame:
    """(id, cluster_id, is_representative) for EVERY id: paired ids get
    their component's min id, unpaired ids are their own singleton.
    ``keep = is_representative`` is the dedup decision."""
    comp = connected_components(pairs, pair_a, pair_b)
    return (
        all_ids.select(F.col(id_col))
        .join(comp, all_ids[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_representative", F.col(id_col) == F.col("cluster_id"))
    )
