"""Connected components (operators/graph.py): hand-checkable graphs —
chains force multi-round propagation, singletons, convergence guard."""

from __future__ import annotations

import pytest

from confluent_kafka_streams_examples_spark.operators.graph import (
    connected_components,
    dedup_components,
)


def test_components_chain_and_island(spark):
    # chain 1-2-3-4 (diameter forces >1 iteration) + island {10, 11}
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src int, dst int"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges, "src", "dst").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_components_includes_singletons(spark):
    pairs = spark.createDataFrame([(1, 5), (5, 9)], "id_a int, id_b int")
    ids = spark.createDataFrame([(i,) for i in (1, 5, 9, 42)], "doc_id int")
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_representative"])
        for r in dedup_components(pairs, ids, "doc_id").collect()
    }
    assert got == {
        1: (1, True),
        5: (1, False),
        9: (1, False),
        42: (42, True),  # unpaired: own singleton cluster
    }


def test_nonconvergence_guard(spark):
    # the guard lives in the propagation loop; disable the union-find
    # contraction so a length-11 chain actually needs >1 round
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 12)], "src int, dst int")
    with pytest.raises(RuntimeError):
        connected_components(edges, "src", "dst", max_iter=1, local_phase=False)


def test_multibucket_matches_pure_propagation(spark):
    # random-ish graph forced across many union-find buckets: the
    # two-phase result must equal the pure min-label-propagation result
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src int, dst int")
    two_phase = {
        r["node"]: r["component"]
        for r in connected_components(
            df, "src", "dst", rows_per_partition=10
        ).collect()
    }
    pure = {
        r["node"]: r["component"]
        for r in connected_components(df, "src", "dst", local_phase=False).collect()
    }
    assert two_phase == pure


def test_chain_across_buckets(spark):
    # a single long chain sliced over many buckets exercises the bridge
    # graph: every bucket's local component must contract to min id 0
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "src", "dst", rows_per_partition=4).collect()
    }
    assert got == {i: 0 for i in range(61)}


def test_reliable_checkpoint_path(spark, tmp_path):
    # same result through the reliable-checkpoint branch, and RDD
    # checkpoint files must actually land in the supplied directory
    ckdir = str(tmp_path / "cc_ckpt")
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src int, dst int"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            edges, "src", "dst", checkpoint_dir=ckdir
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    import pathlib

    ckpt_files = list(pathlib.Path(ckdir).rglob("*"))
    assert any(p.is_file() for p in ckpt_files)


def test_empty_and_selfloop_edges(spark):
    # empty pair list -> every id a singleton via dedup_components
    empty = spark.createDataFrame([], "id_a long, id_b long")
    ids = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_representative"])
        for r in dedup_components(empty, ids, "doc_id").collect()
    }
    assert got == {1: (1, True), 2: (2, True)}
    # self-loops are inert
    loops = spark.createDataFrame([(3, 3), (3, 4)], "src long, dst long")
    comp = {r["node"]: r["component"] for r in connected_components(loops, "src", "dst").collect()}
    assert comp == {3: 3, 4: 3}


def test_union_find_partition_matches_brute_force():
    # pure-python: the bucket-local union-find against naive fixpoint
    # propagation on 100 random multigraphs (no Spark needed)
    import itertools
    import random

    import pandas as pd

    from confluent_kafka_streams_examples_spark.operators.graph import (
        _union_find_partition,
    )

    def brute(edges, nodes):
        comp = {n: n for n in nodes}
        changed = True
        while changed:
            changed = False
            for a, b in edges:
                m = min(comp[a], comp[b])
                for x in (a, b):
                    if comp[x] != m:
                        comp[x] = m
                        changed = True
        for _ in range(len(nodes)):
            for x in nodes:
                if comp[comp[x]] < comp[x]:
                    comp[x] = comp[comp[x]]
        return comp

    rng = random.Random(3)
    for _ in range(100):
        m = rng.randrange(1, 30)
        edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(m)]
        pdf = pd.DataFrame({"a": [e[0] for e in edges], "b": [e[1] for e in edges]})
        out = _union_find_partition(pdf)
        got = dict(zip(out["node"], out["root"]))
        assert got == brute(edges, set(itertools.chain(*edges)))


def test_string_ids_auto_fallback(spark):
    # non-integral ids must route to the propagation-only path (an ANSI
    # bigint cast on these would throw); min-component is lexicographic
    edges = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("zzz", "yyy")],
        "src string, dst string",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges, "src", "dst").collect()}
    assert got == {
        "doc-a": "doc-a",
        "doc-b": "doc-a",
        "doc-c": "doc-a",
        "yyy": "yyy",
        "zzz": "yyy",
    }


def test_string_ids_dedup_components(spark):
    pairs = spark.createDataFrame([("u1", "u5")], "id_a string, id_b string")
    ids = spark.createDataFrame([("u1",), ("u5",), ("u9",)], "doc_id string")
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_representative"])
        for r in dedup_components(pairs, ids, "doc_id").collect()
    }
    assert got == {"u1": ("u1", True), "u5": ("u1", False), "u9": ("u9", True)}


def test_hot_hub_star_spreads_buckets(spark):
    # a 300-edge star on one hub with tiny buckets: full-edge bucketing
    # must keep every applyInPandas group bounded and still stitch the
    # component via the bridge loop
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 301)], "src int, dst int"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "src", "dst", rows_per_partition=20).collect()
    }
    assert set(got.values()) == {0} and len(got) == 301
