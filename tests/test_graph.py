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
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 12)], "src int, dst int")
    with pytest.raises(RuntimeError):
        connected_components(edges, "src", "dst", max_iter=1)


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
