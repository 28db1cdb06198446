"""Delta-style MERGE INTO, emulated as one declarative full-outer join.

The reference engine has no MERGE (Kafka Streams tables are upserted by
the changelog itself); a batch engine over parquet needs it for the
KTable-maintenance / SCD use cases (apply a day of changes to a
snapshot).  Without a transactional table format, MERGE **is** a full
snapshot rewrite:

    new_target = MERGE(target, source) =
        matched  & delete-cond   -> row dropped
        matched  & update-cond   -> target row with updated columns
        matched  otherwise       -> target row unchanged
        source-only & insert     -> inserted row
        target-only              -> target row unchanged

Expressed as ONE full-outer equi-join plus CASE projection — Catalyst
sees a plain join, so it broadcasts a small source (the common "daily
delta into huge snapshot" shape becomes a broadcast join: no shuffle of
the snapshot), and AQE handles a skewed merge key.

Clause semantics mirror Delta Lake's (first matching clause wins;
update/delete conditions optional) so a user can later swap in real
`DeltaTable.merge` unchanged.

At 100 TB: partition-prune first — anti-join the source's touched
partition values against the target's partitioning column and rewrite
only touched partitions (helper ``touched_partitions``); the untouched
ones are carried by the table format / directory layout, not the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TARGET_ALIAS = "t"
SOURCE_ALIAS = "s"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str | list[str],
    matched_update: dict[str, Column] | None = None,
    matched_update_condition: Column | None = None,
    matched_delete_condition: Column | None = None,
    insert_values: dict[str, Column] | None = None,
    insert_condition: Column | None = None,
) -> DataFrame:
    """Return the post-MERGE snapshot of ``target``.

    ``on``: equi-join key column name(s), present in both sides.
    ``matched_update``: {target_col: expr} applied to matched rows
        (where ``matched_update_condition`` holds, if given).  Exprs may
        reference ``t.<col>`` / ``s.<col>``.
    ``matched_delete_condition``: matched rows satisfying it are
        dropped.  Delete is evaluated BEFORE update (Delta's
        first-clause-wins with delete listed first).
    ``insert_values``: {target_col: expr} for source-only rows (all
        target columns must be covered unless they share names with
        source columns); ``None`` disables inserts.
    ``insert_condition``: optional filter on which source-only rows
        insert.

    The result has exactly the target's columns, in target order.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # existence markers survive the outer join where key columns go null
    # (added BEFORE aliasing so the alias qualifies them too)
    t = target.withColumn("_t_exists", F.lit(True)).alias(TARGET_ALIAS)
    s = source.withColumn("_s_exists", F.lit(True)).alias(SOURCE_ALIAS)
    cond = None
    for k in keys:
        c = F.col(f"{TARGET_ALIAS}.{k}") == F.col(f"{SOURCE_ALIAS}.{k}")
        cond = c if cond is None else (cond & c)
    j = t.join(s, cond, "full_outer")

    t_exists = F.col("_t_exists").isNotNull()
    s_exists = F.col("_s_exists").isNotNull()
    matched = t_exists & s_exists

    delete_cond = (
        matched & matched_delete_condition
        if matched_delete_condition is not None
        else F.lit(False)
    )
    update_cond = matched
    if matched_update_condition is not None:
        update_cond = update_cond & matched_update_condition

    out_cols: list[Column] = []
    for name in target.columns:
        tcol = F.col(f"{TARGET_ALIAS}.{name}")
        col = tcol
        if matched_update and name in matched_update:
            col = F.when(update_cond, matched_update[name]).otherwise(tcol)
        if insert_values is not None:
            ins = insert_values.get(name, F.lit(None))
            col = F.when(~t_exists, ins).otherwise(col)
        out_cols.append(col.alias(name))

    keep = t_exists & ~delete_cond
    if insert_values is not None:
        ins_ok = ~t_exists & s_exists
        if insert_condition is not None:
            ins_ok = ins_ok & insert_condition
        keep = keep | ins_ok
    return j.filter(keep).select(*out_cols)


def touched_partitions(source: DataFrame, partition_col: str) -> DataFrame:
    """Distinct partition values the source touches — at scale, join
    this against the target's partition listing and run ``merge_into``
    only over those partitions (everything else is untouched bytes)."""
    return source.select(partition_col).distinct()
