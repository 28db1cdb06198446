"""Python UDTF surface (Spark 4): table functions for 1→N emission.

The reference's Processor can forward any number of records per input
(ProcessorApiExample.scala:53-57 — U4 in SURVEY §2.6).  Batch Spark has
three escalating forms: ``explode`` on built-in arrays (preferred,
JVM-side), grouped-map pandas UDFs, and — for genuinely per-row
imperative fan-out with its own schema — a Python UDTF (``@udtf``),
registered once and callable from SQL via LATERAL.

UDTFs are row-at-a-time Python: keep them OFF the 100 TB hot path
(use explode/pandas there); they are the ergonomic escape hatch for
low-volume enrichment and tooling.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, token: string, is_long: boolean")
class TokenizeWithPositions:
    """(text) -> one row per whitespace token: position, token, and a
    per-token computed flag — the shape of a per-record forward loop."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split()):
            yield i, tok, len(tok) > 4


def register_udtfs(spark) -> None:
    """Make the UDTF surface callable from the SQL interface:
    ``SELECT t.* FROM docs, LATERAL tokenize_pos(text) t``."""
    spark.udtf.register("tokenize_pos", TokenizeWithPositions)
