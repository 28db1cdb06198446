"""Materialized intermediate artifacts — the stored-dataset pattern.

Several expensive intermediates are the COMMON subplan of multiple
registered queries (the shared-shingle count table behind the whole
Jaccard family; the near-dup cluster assignment behind clustering and
representative selection).  Production maintains these as first-class
stored datasets next to the corpus rather than recomputing them per
metric; this module is that pattern, generalized from the corpus
MinHash signature table `dedup_incremental_persisted` established:

- the artifact's path TAG includes the source file's mtime+size plus
  every semantic parameter, so freshness is part of the NAME — a
  regenerated source or changed parameter silently builds a new
  artifact, never reads a stale one;
- builds stage into a per-process directory and publish with an atomic
  same-filesystem rename, so concurrent builders race safely (first
  rename wins, losers discard their staging dir);
- columns must roundtrip parquet exactly (BIGINT/BOOLEAN/DOUBLE-free
  integer contracts), so scorers reading the artifact agree
  row-for-row with scorers recomputing from source — every consumer
  keeps its own independent DuckDB oracle.

Reference analog: a compacted changelog topic restoring a state store
instead of replaying the source (KTableExample.scala:52-56).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


_ENGINE_DIGEST: str | None = None


def _engine_digest() -> str:
    """md5 over every .py source in this package — folded into every
    artifact tag so a CODE change (not just a data or parameter change)
    invalidates stored artifacts.  Deliberately coarse: any engine edit
    rebuilds everything, which is the conservative direction — an
    artifact built by old code is never read by new code.  Computed
    once per process (~ms)."""
    global _ENGINE_DIGEST
    if _ENGINE_DIGEST is None:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        h = hashlib.md5()
        for root, _dirs, files in sorted(os.walk(pkg_dir)):
            for fname in sorted(files):
                if fname.endswith(".py"):
                    with open(os.path.join(root, fname), "rb") as fh:
                        h.update(fh.read())
        _ENGINE_DIGEST = h.hexdigest()[:8]
    return _ENGINE_DIGEST


def artifact_path(source_file: str, tag: str) -> str:
    """Deterministic scratch location for one (source version, params,
    engine version) artifact.  The digest covers the source's
    mtime+size and the package-source digest, so freshness is part of
    the name, not a check."""
    try:
        st = os.stat(source_file)
        stamp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        stamp = "missing"
    digest = hashlib.md5(
        f"{source_file}|{stamp}|{tag}|{_engine_digest()}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"ckse_art_{digest}")


def materialized(
    spark: SparkSession,
    source_file: str,
    tag: str,
    build: Callable[[], DataFrame],
    cleanup: Callable[[], None] | None = None,
    partition_by: str | None = None,
) -> DataFrame:
    """Return the artifact for (source version, tag), building it first
    if this version does not exist yet.  ``build`` is only invoked on a
    miss; its result is written to parquet and atomically published.
    ``cleanup`` (also miss-only) releases build-scoped resources — the
    usual case is unpersisting an intermediate the build pinned for
    multi-reference reuse, whose job is done once the parquet exists."""
    path = artifact_path(source_file, tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        staging = f"{path}.build.{os.getpid()}"
        try:
            writer = build().write.mode("overwrite")
            if partition_by is not None:
                # partitioned layout (e.g. IVF inverted lists): consumers
                # get partition pruning on the artifact's key column
                writer = writer.partitionBy(partition_by)
            writer.parquet(staging)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)  # no orphan staging
            raise
        finally:
            if cleanup is not None:
                cleanup()
        try:
            os.rename(staging, path)  # atomic publish (same filesystem)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)  # other builder won
    return spark.read.parquet(path)
