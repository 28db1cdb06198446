"""Windowed aggregation (SURVEY.md §2.5).

The reference exercises only the ±5s sliding *join* window
(JoinWindows.ofTimeDifferenceWithNoGrace, reference JoinsExample.scala:47-49);
tumbling/hopping/session windows are the course's natural generalization and
are one-liners in Spark — included as first-class engine surface.

All three compile to a single shuffle on (key, window); watermarks bound
state in streaming (streaming.join / streaming.ktable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame, ts_col: str, duration: str, keys: list[str], *aggs: Column
) -> DataFrame:
    """Tumbling window groupBy keeping the window struct columns flat."""
    out = df.groupBy(F.window(ts_col, duration).alias("win"), *keys).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def hopping_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    *aggs: Column,
) -> DataFrame:
    """Overlapping (hopping) windows: each row lands in duration/slide
    windows.  Spark expands rows window-side before the shuffle — at
    100 TB keep duration/slide ratios small (<= 6) to bound the blowup."""
    out = df.groupBy(F.window(ts_col, duration, slide).alias("win"), *keys).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def session_agg(
    df: DataFrame, ts_col: str, gap: str, keys: list[str], *aggs: Column
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into one
    session.  Batch uses ``session_window``; in streaming it requires a
    watermark (streaming module)."""
    out = df.groupBy(F.session_window(ts_col, gap).alias("win"), *keys).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )
