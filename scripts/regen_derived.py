"""Regenerate ALL derived files in one step, then re-check freshness.

Run this after ANY change to a query body, helper, or the artifact /
operator layers, and ALWAYS before an end-of-round snapshot commit:

    python scripts/regen_derived.py

It chains the two generators whose drift broke round 7 (the
`artifacts.py` rewrite landed after the rotation paste, leaving 14
artifact-backed queries outside the verify window — VERDICT r7):

  1. scripts/gen_verify_order.py  -> paste into queries.py _VERIFY_FIRST
  2. scripts/gen_query_index.py   -> QUERIES.md

and finishes by running the two freshness tests
(tests/test_verify_order.py, tests/test_plans.py::test_query_index_is_fresh)
so a stale paste can never be committed silently.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    print("+", " ".join(cmd), flush=True)
    if kw.get("capture_output"):
        kw.setdefault("encoding", "utf-8")  # content has em dashes
    res = subprocess.run(cmd, cwd=ROOT, **kw)
    if res.returncode != 0:
        # surface the generator's actionable message (e.g. the >50
        # changed-queries rotation-unsound SystemExit) instead of a
        # bare CalledProcessError that swallows captured stderr
        if res.stderr:
            print(res.stderr, file=sys.stderr, flush=True)
        res.check_returncode()
    return res


def main() -> int:
    gen = run(
        [sys.executable, "scripts/gen_verify_order.py"],
        capture_output=True,
        text=True,
    ).stdout
    with tempfile.NamedTemporaryFile(
        "w", suffix=".txt", delete=False, encoding="utf-8"
    ) as fh:
        fh.write(gen)
        tmp = fh.name
    try:
        run([sys.executable, "scripts/paste_verify_order.py", tmp])
    finally:
        os.unlink(tmp)

    index = run(
        [sys.executable, "scripts/gen_query_index.py"],
        capture_output=True,
        text=True,
    ).stdout
    with open(os.path.join(ROOT, "QUERIES.md"), "w", encoding="utf-8") as fh:
        fh.write(index)

    run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_verify_order.py",
            "tests/test_plans.py::test_query_index_is_fresh",
            "-q",
        ]
    )
    print("derived files regenerated and fresh")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
