"""Generate QUERIES.md — the user-facing index of every registered
query: name, module:line, first docstring sentence.  Run from the repo
root:

    python scripts/gen_query_index.py > QUERIES.md
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from confluent_kafka_streams_examples_spark.queries import ORACLES, QUERIES  # noqa: E402


def first_sentence(doc: str | None) -> str:
    if not doc:
        return "(no docstring)"
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    return text if text.endswith(".") else text + "."


def main() -> None:
    print("# Query index (generated — do not edit)")
    print()
    print(f"{len(QUERIES)} registered queries, {len(ORACLES)} with DuckDB")
    print("oracles.  Regenerate with `python scripts/gen_query_index.py >")
    print("QUERIES.md` after adding a query.")
    print()
    print("| # | Query | Where | What |")
    print("|---|---|---|---|")
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        src = inspect.getsourcefile(fn) or "?"
        rel = os.path.relpath(src, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = inspect.getsourcelines(fn)[1]
        desc = first_sentence(inspect.getdoc(fn))
        print(f"| {i} | `{name}` | `{rel}:{line}` | {desc} |")


if __name__ == "__main__":
    main()
