"""Scalar function surface (SURVEY.md §2.8) — all built-in expressions,
JVM-side, whole-stage-codegen friendly.  No Python UDFs here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def substr_after_first(col: Column | str, delim: str) -> Column:
    """Everything after the FIRST occurrence of ``delim``.

    Matches the reference's ``v.substring(v.indexOf("-") + 1)``
    (reference BasicStreams.scala:57, KTableExample.scala:60): split at
    the first delimiter — ``substring_index(v, d, -1)`` would be wrong
    for values containing the delimiter twice.  When the delimiter is
    absent, ``instr`` = 0 so the start position is 1 and the whole
    string is returned (reference: indexOf=-1 -> substring(0)).
    """
    c = _c(col)
    return F.substr(c, F.instr(c, delim) + F.lit(1))


def epoch_us(col: Column | str) -> Column:
    """Integer microseconds since epoch, robust to TIMESTAMP vs
    TIMESTAMP_NTZ inputs.

    Driver testdata has shipped ``ts`` as parquet TIMESTAMP(NANOS),
    TIMESTAMP(MICROS, adjusted-to-UTC) and TIMESTAMP(MICROS, NTZ) in
    different rounds; ``unix_micros`` rejects NTZ outright
    (DATATYPE_MISMATCH).  Casting to TimestampType first is a no-op for
    LTZ and interprets NTZ wall-time in the session timezone (pinned to
    UTC by ``load_table``), which matches DuckDB's ``epoch_us`` on naive
    timestamps.
    """
    return F.unix_micros(_c(col).cast("timestamp"))


def safe_long(col: Column | str) -> Column:
    """String -> BIGINT, null on garbage (try_cast semantics).

    The reference's ``v.toLong`` (BasicStreams.scala:58) *throws* on
    non-numeric input; the engine normalizes to null-on-failure (the
    documented policy, SURVEY.md §2.8) so one bad record can't kill a
    100 TB job.  Use :func:`strict_long` for throw parity.
    """
    return _c(col).try_cast("bigint")


def strict_long(col: Column | str) -> Column:
    """String -> BIGINT, raising on garbage — exact ``.toLong`` parity.
    Spark 4 runs ANSI mode by default, so a plain cast already throws
    SparkNumberFormatException on malformed input."""
    return _c(col).cast("bigint")


def contains(col: Column | str, needle: str) -> Column:
    """Substring containment (reference BasicStreams.scala:26,56)."""
    return _c(col).contains(needle)


def round_det(col: Column | str, places: int) -> Column:
    """Engine-portable half-up rounding: floor(x * 10^p + 0.5) / 10^p.

    Spark's ROUND and DuckDB's ROUND disagree on exact decimal ties
    (e.g. 0.11625 at 4 dp), which ratios of small integers hit
    constantly.  This formulation gives identical results in any engine
    given identical input doubles.  SQL twin:
    ``floor(x * 1e{p} + 0.5) / 1e{p}``.
    """
    scale = float(10**places)
    return F.floor(_c(col) * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
