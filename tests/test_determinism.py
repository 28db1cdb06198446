"""Property tests for the engine<->oracle determinism contract."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings, strategies as st


def py_round_det(x: float, p: int) -> float:
    """Python mirror of round_det / the SQL floor-form."""
    s = float(10**p)
    return math.floor(x * s + 0.5) / s


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=25, deadline=None)
def test_round_det_matches_sql_floor_form(xs):
    """floor(x*1e4+0.5)/1e4 computes identically in DuckDB and Python
    for any double — the portability property every ratio-rounding
    oracle relies on (plain ROUND disagrees between engines on decimal
    ties)."""
    con = duckdb.connect()
    for x in xs:
        got = con.execute("SELECT floor(? * 1e4 + 0.5) / 1e4", [x]).fetchone()[0]
        assert got == py_round_det(x, 4), x
    con.close()


@given(st.integers(min_value=0, max_value=2**48 - 1), st.integers(min_value=0, max_value=2**48 - 1))
@settings(max_examples=50, deadline=None)
def test_carter_wegman_no_overflow(h1, h2):
    """h1 + j*h2 for j<16 over 48-bit halves stays within int64 — the
    minhash permutation family's no-overflow invariant."""
    for j in range(16):
        v = h1 + j * h2
        assert v < 2**63


def test_md5_portability():
    """Spark, DuckDB, and Python md5 hex digests agree (the foundation
    of every hash-based oracle)."""
    import hashlib

    con = duckdb.connect()
    for s in ["", "a", "hello world", "p0-1", "0|the fast key"]:
        duck = con.execute("SELECT md5(?)", [s]).fetchone()[0]
        assert duck == hashlib.md5(s.encode()).hexdigest(), s
    con.close()
