"""Driver-mimicking correctness harness: run a registered query on Spark
and its oracle on DuckDB over the same parquet, compare row count, schema
arity, and order-insensitive values (sorted-column, row-set compare).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and absorb <1 ulp noise below rounded precision
        return f"{v + 0.0:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    # sort by repr: rows may contain None / mixed types (rollup nulls)
    return sorted(normed, key=repr), [cols[i] for i in order]


def compare(spark, name, query_fn, oracle, sf_dir) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)

    con = duckdb_con(sf_dir)
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    s_set, _ = _rowset(s_cols, s_rows)
    d_set, _ = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diff_a = [r for r in s_set if r not in set(d_set)][:3]
        diff_b = [r for r in d_set if r not in set(s_set)][:3]
        return False, f"value mismatch: spark-only={diff_a} duckdb-only={diff_b}"
    return True, f"ok rows={len(s_rows)}"
