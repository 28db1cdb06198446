"""Batch parquet source — the correctness substrate.

Reads go through ``spark.read.parquet`` so Catalyst pushes filters and
prunes columns into the vectorized scan.  At 100 TB this is the dominant
IO path: callers must select only needed columns so ``ReadSchema`` in the
physical plan stays narrow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def parquet_source(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)
    return df


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")
