"""artifacts.py: freshness is part of the artifact name."""

from __future__ import annotations

import os


def test_artifact_path_tracks_source_version_and_params(tmp_path):
    from confluent_kafka_streams_examples_spark.artifacts import artifact_path

    src = tmp_path / "documents.parquet"
    src.write_bytes(b"v1")
    p1 = artifact_path(str(src), "overlap|n=3")
    assert p1 == artifact_path(str(src), "overlap|n=3")  # stable
    assert p1 != artifact_path(str(src), "overlap|n=4")  # params in tag

    os.utime(src, (1, 1))  # same bytes, new version stamp
    p2 = artifact_path(str(src), "overlap|n=3")
    assert p2 != p1  # mtime invalidates

    src.write_bytes(b"v2-longer")
    os.utime(src, (1, 1))
    assert artifact_path(str(src), "overlap|n=3") != p2  # size invalidates

    # a missing source must not raise — it yields a distinct bucket
    missing = artifact_path(str(tmp_path / "nope.parquet"), "overlap|n=3")
    assert missing not in (p1, p2)


def test_artifact_path_tracks_engine_version(tmp_path, monkeypatch):
    """A CODE change must invalidate stored artifacts: the tag folds in
    the package-source digest, so an artifact built by old code is
    never read by new code (the cross-round staleness hazard)."""
    import confluent_kafka_streams_examples_spark.artifacts as art

    src = tmp_path / "documents.parquet"
    src.write_bytes(b"v1")
    p1 = art.artifact_path(str(src), "t")
    monkeypatch.setattr(art, "_ENGINE_DIGEST", "deadbeef")
    assert art.artifact_path(str(src), "t") != p1


def test_materialized_cleans_staging_on_build_failure(tmp_path, spark):
    """A failed build must leave neither a published artifact nor an
    orphaned staging directory, and the cleanup hook still runs."""
    import glob

    from confluent_kafka_streams_examples_spark.artifacts import (
        artifact_path,
        materialized,
    )

    src = tmp_path / "documents.parquet"
    src.write_bytes(b"v1")
    ran = []

    def bad_build():
        raise RuntimeError("boom")

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        materialized(
            spark, str(src), "failing", bad_build, cleanup=lambda: ran.append(1)
        )
    assert ran == [1]
    path = artifact_path(str(src), "failing")
    assert not glob.glob(path + "*"), glob.glob(path + "*")
