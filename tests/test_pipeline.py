"""Pipeline composition: each stage's keep/drop decision on constructed
inputs, plus the composed pipeline's stage-ordering invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.pipeline import (
    clean_corpus,
    compose,
    exact_dedup,
    neardup_dedup,
    quality_filter,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_filter_gates(spark):
    base = " ".join(f"w{i}" for i in range(30))  # 30 distinct tokens
    rows = [
        (1, base),                                # passes
        (2, "too short"),                         # < min_tokens
        (3, " ".join(["spam"] * 40)),             # top_frac = 1.0
        (4, base + " filler" * 0),                # passes (same as base)
    ]
    out = quality_filter(min_tokens=20, max_tokens=5000, max_top_token_frac=0.15)(
        _docs(spark, rows)
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 4]


def test_exact_dedup_keeps_min_id(spark):
    rows = [(10, "same text here"), (7, "same text here"), (3, "unique one")]
    out = exact_dedup()(_docs(spark, rows))
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 7]


def test_neardup_dedup_keeps_representative(spark):
    # two documents sharing all shingles collide in every LSH band;
    # the third is disjoint
    a = " ".join(f"tok{i}" for i in range(25))
    rows = [(5, a), (9, a + " extra"), (2, " ".join(f"other{i}" for i in range(25)))]
    out = neardup_dedup()(_docs(spark, rows))
    kept = sorted(r["doc_id"] for r in out.collect())
    assert 2 in kept
    assert 5 in kept and 9 not in kept  # min id represents the cluster


def test_compose_order(spark):
    seen = []

    def tag(name):
        def s(df):
            seen.append(name)
            return df

        return s

    compose(tag("a"), tag("b"), tag("c"))(_docs(spark, [(1, "x")]))
    assert seen == ["a", "b", "c"]


def test_clean_corpus_monotone(spark):
    """The pipeline only ever drops rows, never invents or mutates them."""
    base = [" ".join(f"t{i}{j}" for i in range(30)) for j in range(4)]
    rows = [(i, base[i % 4]) for i in range(8)]  # 4 exact-dup pairs
    docs = _docs(spark, rows)
    out = clean_corpus(docs)
    out_rows = {(r["doc_id"], r["text"]) for r in out.collect()}
    in_rows = {(r["doc_id"], r["text"]) for r in docs.collect()}
    assert out_rows <= in_rows
    # exact dedup must collapse the 4 duplicate pairs to their min ids
    assert {d for d, _ in out_rows} == {0, 1, 2, 3}
