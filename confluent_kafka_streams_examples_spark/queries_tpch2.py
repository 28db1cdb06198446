"""TPC-H analogs, part 2 — the remaining query shapes (Q8, Q9, Q11,
Q12, Q13, Q14, Q15, Q16, Q17, Q19, Q20, Q21, Q22) adapted to the
driver's star schema (no partsupp / shipmode / phone / container:
lineitem's (partkey, suppkey) pairs stand in for partsupp, linestatus
for shipmode, nationkey for the phone country code, size for the
container).  Together with queries_tpch.py this completes all 22
TPC-H query shapes.

Each analog documents its 100 TB plan story: what broadcasts, what
shuffles, which aggregate is decorrelated so no per-row subquery
survives, and where the data volume collapses.  Non-trivial doubles
are rounded identically on both engines (see
functions.scalar.round_det for the tie-safe formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.functions.scalar import round_det
from confluent_kafka_streams_examples_spark.queries import query
from confluent_kafka_streams_examples_spark.session import load_table


@query(
    "market_share",
    oracle="""
    WITH all_sales AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           floor(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume) * 1e4 + 0.5) / 1e4 AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's order volume by
    year.  Every dimension (customer, both nation aliases, region,
    supplier) broadcasts; lineitem-orders is the only shuffle join; the
    share is a conditional-sum / sum ratio computed in ONE aggregate
    pass (no second scan, no self-join).  round_det keeps the ratio
    hash-identical across engines."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            round_det(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(0.0))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           sum(CAST(floor((l_extendedprice * (1 - l_discount)
                           - 0.5 * p_retailprice * l_quantity) * 1e2 + 0.5)
                    AS BIGINT)) / 100.0 AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a part-name family by supplier nation
    and order year (0.5 * retailprice stands in for ps_supplycost).
    The LIKE filter is applied to part BEFORE its broadcast, so the
    fact join probes a pruned hash table; lineitem-orders is the only
    shuffle.  Per-row profit is rounded to integer cents BEFORE the
    sum: a double sum's last-ulp depends on partition order and can
    flip the cent-rounding of the total, while an integer cent sum is
    exact and order-independent on both engines."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_name", "p_retailprice")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%gear%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (
                F.sum(F.floor(profit * 100 + F.lit(0.5)).cast("long")) / 100.0
            ).alias("profit")
        )
    )


@query(
    "important_part_value",
    oracle="""
    WITH val AS (
      SELECT l_partkey, sum(l_extendedprice) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey),
    tot AS (SELECT sum(value) AS total FROM val)
    SELECT l_partkey, round(value, 2) AS part_value
    FROM val, tot
    WHERE value > 0.001 * total
    """,
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem value from one nation's suppliers
    stands in for partsupp stock value): per-part aggregate, then a
    HAVING against a GLOBAL scalar aggregate.  The scalar total is a
    1-row broadcast-nested-loop join — the per-part set is never
    re-shuffled or re-scanned, and the raw threshold (not the rounded
    display value) feeds the compare so both engines filter
    identically."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    total = val.agg(F.sum("value").alias("total"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value") > 0.001 * F.col("total"))
        .select("l_partkey", F.round("value", 2).alias("part_value"))
    )


@query(
    "late_shipment_priority_counts",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (linestatus stands in for shipmode): late
    shipments split into high/low priority with conditional sums in a
    single aggregate.  The shipdate range pushes to the parquet scan;
    the >30-day lateness predicate is a join-time filter, so dropped
    rows never reach the aggregate."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_shipdate", "l_linestatus"
    )
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(
            orders,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram over ALL customers —
    the left join keeps zero-order customers (count(o_orderkey)
    ignores the nulls, yielding c_count = 0).  Two cascading
    aggregates; the second groups by a low-cardinality count, so its
    shuffle is tiny.  At 100 TB the first agg pre-aggregates map-side
    on custkey before the shuffle."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "promo_revenue",
    oracle="""
    SELECT floor(100.0
                 * sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)) * 1e4 + 0.5) / 1e4
           AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo share of one month's revenue.  Part
    broadcasts (2-column hash table); the month filter pushes to the
    lineitem scan (row-group pruning on l_shipdate at scale); the
    ratio is one conditional-sum aggregate."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            round_det(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The per-supplier aggregate is computed ONCE and reused for both the
    max (1-row broadcast) and the equality probe — no second lineitem
    scan.  Revenue is rounded BEFORE the max-compare so the equality is
    exact on both engines."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_rev"
            )
        )
    )
    best = rev.agg(F.max("total_rev").alias("_best"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("_best"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "part_supplier_counts",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'ECONOMY'
      AND p_size IN (5, 10, 15, 20)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem (part, supp) pairs stand in for
    partsupp; negative account balance stands in for the complaints
    exclusion): NOT IN decorrelated to a broadcast LEFT ANTI join,
    then count-distinct suppliers per (brand, size).  The part filter
    prunes before broadcast; the distinct collapses map-side under
    partial aggregation."""
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    part = load_table(spark, "part", sf_dir).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    bad = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    keep_part = part.filter(
        (F.col("p_type") != "ECONOMY") & F.col("p_size").isin(5, 10, 15, 20)
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(keep_part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "small_quantity_revenue",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey AS ap, 0.5 * avg(l_quantity) AS thr
      FROM lineitem GROUP BY l_partkey)
    SELECT floor(sum(l_extendedprice) / 7.0 * 1e2 + 0.5) / 1e2 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq ON ap = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < thr
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-half-average-quantity
    lineitems of one brand.  The correlated per-part AVG subquery is
    decorrelated into ONE per-part aggregate joined back on partkey —
    lineitem is scanned twice but never nested-loop-probed.  The
    threshold compare is deterministic: quantities are integral
    doubles, so the per-part sum (and hence avg) is exact in IEEE
    arithmetic regardless of summation order."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    avgq = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (0.5 * F.avg("l_quantity")).alias("thr")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#3")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(avgq, F.col("ap") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(round_det(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "disjunctive_predicate_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (size range stands in for container): a 3-branch
    OR of brand x size x quantity conjunctions evaluated as a join-time
    filter on a broadcast part join.  Catalyst extracts the common
    quantity bounds (1..30) as a pushable scan predicate; the full
    disjunction runs post-join where both sides' columns exist."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1) & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 10)
            & (q >= 10) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 15)
            & (q >= 20) & (q <= 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "excess_suppliers",
    oracle="""
    WITH target AS (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
    sup_qty AS (
      SELECT l_suppkey, sum(l_quantity) AS qty
      FROM lineitem JOIN target ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey)
    SELECT s_name, n_name AS nation
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (SELECT l_suppkey FROM sup_qty WHERE qty > 100)
    """,
)
def excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped >100 units
    of a part-name family in a year.  The IN subquery is decorrelated
    to a LEFT SEMI join against the already-aggregated per-supplier
    quantity — supplier rows are probed, never multiplied.  The part
    family filter broadcasts into the lineitem scan."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_name")
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_2")
    sup_qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like("blue%")).select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(sup_qty, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("n_name").alias("nation"))
    )


@query(
    "sole_late_supplier",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                 THEN l_suppkey END) AS n_late,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN l_suppkey END) AS late_supp
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey)
    SELECT s_name, count(*) AS numwait
    FROM per_order
    JOIN supplier ON s_suppkey = late_supp
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s_name
    """,
)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: for finished orders, count per supplier the
    orders where that supplier was the ONLY late one among multiple
    suppliers.  The reference formulation is EXISTS + NOT EXISTS
    against the same fact table; here both collapse into ONE per-order
    aggregate (distinct suppliers / distinct late suppliers / the late
    supplier via conditional max) — three self-joins of lineitem
    become a single shuffle on orderkey, the decisive rewrite at
    100 TB."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "dormant_customer_balance",
    oracle="""
    WITH pos AS (
      SELECT avg(c_acctbal) AS cutoff FROM customer
      WHERE c_acctbal > 0 AND c_nationkey IN (1, 2, 3, 4, 5))
    SELECT CAST(c_nationkey AS BIGINT) AS nation_code,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, pos
    WHERE c_nationkey IN (1, 2, 3, 4, 5)
      AND c_acctbal > cutoff
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
)
def dormant_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey stands in for the phone country
    code; "dormant" = no order since 2001 — this generator gives every
    customer some order, so Q22's literal never-ordered set is empty).
    The scalar AVG broadcasts (1 row); NOT EXISTS decorrelates to a
    LEFT ANTI join on custkey whose right side is date-pruned at the
    scan — at 100 TB the anti join shuffles only the recent orders'
    custkeys, and the nation filter pushes to both customer scans."""
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    in_nations = F.col("c_nationkey").isin(1, 2, 3, 4, 5)
    cutoff = (
        cust.filter(in_nations & (F.col("c_acctbal") > 0))
        .agg(F.avg("c_acctbal").alias("cutoff"))
    )
    return (
        cust.filter(in_nations)
        .join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nation_code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "bucketed_revenue_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join through the write-once/join-forever bucketed
    layout (operators/skew.py write_bucketed): lineitem and orders are
    persisted hash-bucketed AND sorted by the join key, so the
    sort-merge join reads co-located buckets with NO Exchange and NO
    Sort on either side — the plan's only shuffle is the final
    4-row-per-partition priority rollup (asserted in
    tests/test_plans.py).  At 100 TB this is the difference between
    shuffling the two largest tables for every join and paying the
    layout cost once at ingest; the merge hint pins the join strategy
    the layout was built for (a broadcast would also be exchange-free
    here but stops scaling the moment orders outgrows the threshold).
    Money math in integer cents so the rollup is associative and
    engine-exact."""
    import hashlib

    from confluent_kafka_streams_examples_spark.operators.skew import write_bucketed

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    lt, ot = f"ckse_bkt_lineitem_{tag}", f"ckse_bkt_orders_{tag}"
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    od = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    write_bucketed(li, lt, "l_orderkey")
    write_bucketed(od, ot, "o_orderkey")
    lb, ob = spark.table(lt), spark.table(ot)
    return (
        lb.join(ob.hint("merge"), lb["l_orderkey"] == ob["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
