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
  keeps its own independent DuckDB oracle;
- superseded versions are RETIRED: each artifact carries a `_CKSE_META`
  manifest (source path + version stamp + engine digest), and every
  successful publish sweeps sibling artifacts whose manifest no longer
  matches live state — a stale version can only accumulate for as long
  as the grace window, never across corpus regenerations or code
  edits.  This is the retention half of the stored-dataset contract:
  a compacted changelog keeps the LATEST value per key and lets the
  broker delete superseded segments (KTableExample.scala:76-85); here
  the "key" is (source, params) and the superseded segment is the
  previous version directory.

Reference analog: a compacted changelog topic restoring a state store
instead of replaying the source (KTableExample.scala:52-56).
"""

from __future__ import annotations

import errno
import hashlib
import json
import os
import shutil
import stat as _stat
import tempfile
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_ENGINE_DIGEST: str | None = None

# A stale sibling younger than this many seconds is left alone: a
# concurrently-running OLD-code process may still be reading it (its
# own digest points there).  Old enough that any such process has
# finished or republished; short enough that probe-scale (multi-GB)
# versions don't outlive one working session.  The grace only shields
# RECENTLY-PUBLISHED artifacts: directory mtime does not advance on
# reads, so an old-engine process still reading an artifact published
# more than the grace ago is not protected — acceptable for
# single-session tooling, where "old engine" means "this repo before
# the edit I just made".
GC_GRACE_SECONDS = 300.0

# A staging directory older than this is removed even if a live pid
# matches its suffix: pid reuse can make a dead builder's multi-GB
# staging dir look alive indefinitely.  No real build at any probed
# scale approaches this (x1000 cold build: ~245 s).
STAGING_TTL_SECONDS = 6 * 3600.0

_META_NAME = "_CKSE_META"

#: target parquet file size for artifact writes (guide §6: aim for
#: 128 MB - 1 GB per output file).  256 MiB sits mid-range.
TARGET_FILE_BYTES = 256 * 1024 * 1024


def parquet_row_count(path: str) -> int | None:
    """Row count of a parquet file from its FOOTER — driver-side
    metadata only (~ms), no Spark job.  Returns None when the footer
    cannot be read (missing file, directory dataset)."""
    try:
        import pyarrow.parquet as pq

        return int(pq.ParquetFile(path).metadata.num_rows)
    except Exception:
        return None


def write_partitions(est_bytes: int | None, spark: SparkSession) -> int:
    """File-count scaling for artifact writes: one output file per
    ~TARGET_FILE_BYTES of ESTIMATED output, capped at 16x the cluster
    parallelism (a write wider than that is scheduler overhead, not
    bandwidth).  At bench scale every artifact estimate is far below
    one target file and this returns 1 — the caller then skips the
    repartition outright, so small-scale plans are unchanged; at
    100 TB the same estimate yields a parallel write instead of one
    straggler task funneling the whole table (VERDICT r11 #5)."""
    if not est_bytes or est_bytes <= 0:
        return 1
    return int(
        max(
            1,
            min(
                est_bytes // TARGET_FILE_BYTES + 1,
                16 * spark.sparkContext.defaultParallelism,
            ),
        )
    )


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


def artifact_root() -> str:
    """Per-user artifact directory (mode 0700).  A shared world-
    writable /tmp prefix would let another user squat a predictable
    artifact path; scoping by uid removes the collision surface and
    gives the GC sweep a closed universe to reason about."""
    root = os.path.join(
        tempfile.gettempdir(), f"ckse_artifacts_{os.getuid()}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
    # makedirs(exist_ok=True) accepts a pre-existing path with ANY
    # owner/mode — another user could pre-create (or symlink) the
    # predictable name and plant artifact dirs with valid-looking
    # manifests.  Verify what we got is ours, a real directory, and
    # private (same pattern tempfile's mkdtemp relies on).
    st = os.lstat(root)
    if not _stat.S_ISDIR(st.st_mode):
        raise RuntimeError(
            f"artifact root {root!r} is not a directory (symlink squat?)"
        )
    if st.st_uid != os.getuid():
        raise RuntimeError(
            f"artifact root {root!r} is owned by uid {st.st_uid}, "
            f"not {os.getuid()} — refusing to use it"
        )
    if _stat.S_IMODE(st.st_mode) != 0o700:
        os.chmod(root, 0o700)
    return root


def _source_stamp(source_file: str) -> str:
    try:
        st = os.stat(source_file)
        return f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return "missing"


def artifact_path(source_file: str, tag: str) -> str:
    """Deterministic scratch location for one (source version, params,
    engine version) artifact.  The digest covers the source's
    mtime+size and the package-source digest, so freshness is part of
    the name, not a check."""
    digest = hashlib.md5(
        f"{source_file}|{_source_stamp(source_file)}|{tag}"
        f"|{_engine_digest()}".encode()
    ).hexdigest()[:12]
    return os.path.join(artifact_root(), f"ckse_art_{digest}")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except OSError:
        pass  # EPERM etc.: exists but not ours — treat as alive
    return True


def _is_stale(dirpath: str) -> bool:
    """A published artifact is stale when its manifest no longer
    derives from live state: built by a different package digest, or
    from a source version that has since been replaced (or deleted).
    Manifest-less directories (pre-manifest format, or a foreign
    squatter) are stale by definition — current code always writes
    one, so nothing live reads them."""
    meta_file = os.path.join(dirpath, _META_NAME)
    try:
        with open(meta_file, encoding="utf-8") as fh:
            meta = json.load(fh)
    except (OSError, ValueError):
        return True
    if meta.get("engine") != _engine_digest():
        return True
    return _source_stamp(meta.get("source_file", "")) != meta.get("stamp")


def sweep_stale_artifacts(grace_seconds: float | None = None) -> list[str]:
    """Delete superseded artifact versions under the per-user root.

    Removes (a) published artifacts whose manifest fails `_is_stale`
    and whose mtime is older than the grace window, and (b) staging
    directories whose builder pid is dead (a builder that crashed
    between the parquet write and the rename).  Fresh artifacts —
    current engine digest AND current source stamp — are never
    touched, so concurrent CURRENT-code builders/readers are safe:
    their paths only ever point at fresh directories.  Returns the
    removed paths (for tests/logging)."""
    grace = GC_GRACE_SECONDS if grace_seconds is None else grace_seconds
    root = artifact_root()
    removed = []
    now = time.time()
    for name in os.listdir(root):
        if not name.startswith("ckse_art_"):
            continue
        p = os.path.join(root, name)
        if not os.path.isdir(p):
            continue
        try:
            age = now - os.stat(p).st_mtime
        except OSError:
            continue  # raced with another sweeper
        if ".build." in name:
            try:
                pid = int(name.rsplit(".", 1)[1])
            except ValueError:
                pid = -1
            if (
                pid >= 0
                and _pid_alive(pid)
                and age < STAGING_TTL_SECONDS
            ):
                # an in-flight build owns this staging dir — but pid
                # reuse can resurrect a dead builder's pid, so a
                # generous TTL bounds how long "alive" is believed
                continue
        elif not _is_stale(p):
            continue
        if age < grace:
            continue
        shutil.rmtree(p, ignore_errors=True)
        removed.append(p)
    return removed


def materialized(
    spark: SparkSession,
    source_file: str,
    tag: str,
    build: Callable[[], DataFrame],
    cleanup: Callable[[], None] | None = None,
    partition_by: str | None = None,
    est_bytes: int | None = None,
) -> DataFrame:
    """Return the artifact for (source version, tag), building it first
    if this version does not exist yet.  ``build`` is only invoked on a
    miss; its result is written to parquet and atomically published.
    ``cleanup`` (also miss-only) releases build-scoped resources — the
    usual case is unpersisting an intermediate the build pinned for
    multi-reference reuse, whose job is done once the parquet exists.
    Every successful publish also retires superseded sibling versions
    (see `sweep_stale_artifacts`).

    ``est_bytes``: the caller's estimate of the artifact's output size
    (typically source row count x bytes per output row — see
    `parquet_row_count`).  When the estimate exceeds one target file
    the build result is repartitioned to ~TARGET_FILE_BYTES files so
    the write parallelizes (`write_partitions`); below that the plan
    is untouched."""
    path = artifact_path(source_file, tag)
    success_marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(success_marker):
        staging = f"{path}.build.{os.getpid()}"
        try:
            built = build()
            n_parts = write_partitions(est_bytes, spark)
            if n_parts > 1 and partition_by is None:
                built = built.repartition(n_parts)
            writer = built.write.mode("overwrite")
            if partition_by is not None:
                # partitioned layout (e.g. IVF inverted lists): consumers
                # get partition pruning on the artifact's key column
                writer = writer.partitionBy(partition_by)
            writer.parquet(staging)
            # manifest inside the same guarded region: a failure here
            # (e.g. ENOSPC) must clean the staging dir too, or it
            # orphans for the life of the builder pid
            with open(
                os.path.join(staging, _META_NAME), "w", encoding="utf-8"
            ) as fh:
                json.dump(
                    {
                        "source_file": source_file,
                        "stamp": _source_stamp(source_file),
                        "tag": tag,
                        "engine": _engine_digest(),
                    },
                    fh,
                )
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)  # no orphan staging
            raise
        finally:
            if cleanup is not None:
                cleanup()
        try:
            os.rename(staging, path)  # atomic publish (same filesystem)
        except OSError as exc:
            shutil.rmtree(staging, ignore_errors=True)
            # "Another builder won" is only one of the ways a rename
            # fails; verify the winner actually published before
            # reading, instead of failing opaquely (or reading a
            # squatter's directory) downstream.
            if not os.path.exists(success_marker):
                raise RuntimeError(
                    f"artifact publish failed for {path!r} "
                    f"({errno.errorcode.get(exc.errno, exc.errno)}) and no "
                    "concurrent builder published a valid artifact there"
                ) from exc
        sweep_stale_artifacts()
    else:
        # read-refresh: restart the sweep grace clock from the LAST
        # READ, not the publish.  Without this, an artifact that goes
        # stale while a long-running reader holds a plan over it (e.g.
        # another process publishes under a new engine digest) could
        # age past the grace window and be swept mid-scan; with it, a
        # concurrent sweeper always sees age < grace for anything read
        # in the last GC_GRACE_SECONDS.  (spark.read is lazy — the
        # refresh marks plan-creation time, and each re-materialize
        # of the same artifact re-arms it.)
        try:
            os.utime(path)
        except OSError:
            pass  # raced with a sweeper; the read below surfaces it
    # schema resolved once per (session, artifact version): artifact
    # consumers re-read the same published directory many times per
    # session (the IVF family alone reads two artifacts per query),
    # and each inferred read costs 60-90 ms of driver-side footer and
    # listing work.  The manifest file is the stamp — written once at
    # publish and never touched again (the read-refresh utime above
    # only touches the directory), so the key is stable across reads
    # and rolls over exactly when a new version is published.
    from confluent_kafka_streams_examples_spark.session import _resolved_schema

    schema = _resolved_schema(
        spark, path, stamp_path=os.path.join(path, _META_NAME)
    )
    return spark.read.schema(schema).parquet(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    max_files: int = 8,
    target_files: int = 1,
) -> list[str]:
    """Small-files compaction for a partitioned artifact (VERDICT r10
    #5): rewrite ONLY the partition directories whose parquet file
    count exceeds ``max_files``, each into ``target_files`` files.

    Daily appends (`_ivf_index_appended_table`'s pattern: one
    ``mode=append`` write per batch into the same ``key=`` directories)
    accrete one file per batch per partition — the classic small-files
    decay: after 100 days every probe opens 100 footers per pruned
    partition.  Compaction is the other half of that maintenance
    story: untouched partitions are NEVER read or rewritten (cost
    tracks the offending partitions only), directory names are
    unchanged so consumers' partition pruning survives verbatim, and
    each rewrite publishes via rename so a reader never sees a
    half-written partition.

    Single-session caveat, same as the appender and the GC: the
    swap is two renames, so a concurrent reader could glimpse a
    missing directory between them; production on an object store
    runs this through a manifest-based table format (Iceberg/Delta
    rewrite-data-files) where the swap is a metadata commit.  Returns
    the rewritten partition directory names.
    """
    import glob as _glob

    rewritten: list[str] = []
    for part_dir in sorted(
        _glob.glob(os.path.join(path, f"{partition_col}=*"))
    ):
        n_files = sum(
            1 for f in os.listdir(part_dir) if f.endswith(".parquet")
        )
        if n_files <= max_files:
            continue
        staging = f"{part_dir}.compact.{os.getpid()}"
        try:
            # reading the partition DIRECTORY yields exactly the
            # non-partition columns its files carry, so the rewrite
            # preserves the original file schema
            (
                spark.read.parquet(part_dir)
                .coalesce(target_files)
                .write.mode("overwrite")
                .parquet(staging)
            )
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        trash = f"{part_dir}.old.{os.getpid()}"
        os.rename(part_dir, trash)
        os.rename(staging, part_dir)
        shutil.rmtree(trash, ignore_errors=True)
        rewritten.append(os.path.basename(part_dir))
    return rewritten
