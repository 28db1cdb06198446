"""Typed schemas — the engine's serde boundary.

The reference declares schemas as Scala case classes with circe JSON codecs
(reference: src/main/scala/example/serdes/circe.scala:11-26; entity classes
at JoinsExample.scala:199-286, AggregationsExample.scala:116-147,
ProcessorApiExample.scala:182-197).  Here they are explicit ``StructType``s
used with ``from_json``/``to_json`` at source/sink boundaries.

Malformed-record policy matches the reference (circe.scala:15-23): decode
failure -> record dropped, not failed (see ``functions.json_serde``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Reference entity schemas (JoinsExample.scala:199-286) ----------------

# User(id: UUID, name: String, address: String) — JoinsExample.scala:199-210
USER = StructType(
    [
        StructField("id", StringType()),  # UUID -> canonical 36-char string
        StructField("name", StringType()),
        StructField("address", StringType()),
    ]
)

# ApplianceOrder(orderId, applianceId, userId, time) — JoinsExample.scala:212-230
APPLIANCE_ORDER = StructType(
    [
        StructField("order_id", StringType()),
        StructField("appliance_id", StringType()),
        StructField("user_id", StringType()),
        StructField("time", TimestampType()),
    ]
)

# ElectronicOrder(orderId, electronicId, userId, price, time)
# — JoinsExample.scala:232-253, ProcessorApiExample.scala:182-197
ELECTRONIC_ORDER = StructType(
    [
        StructField("order_id", StringType()),
        StructField("electronic_id", StringType()),
        StructField("user_id", StringType()),
        StructField("price", DoubleType()),
        StructField("time", TimestampType()),
    ]
)

# CombinedOrder(applianceOrderId, electronicOrderId, userId, time)
# — JoinsExample.scala:255-272
COMBINED_ORDER = StructType(
    [
        StructField("appliance_order_id", StringType()),
        StructField("electronic_order_id", StringType()),
        StructField("user_id", StringType()),
        StructField("time", TimestampType()),
    ]
)

# UserCombinedOrder(order: CombinedOrder, user: User) — JoinsExample.scala:274-286
USER_COMBINED_ORDER = StructType(
    [
        StructField("order", COMBINED_ORDER),
        StructField("user", USER),
    ]
)

# OrderTotal(orderId, total) — AggregationsExample.scala:116-147
ORDER_TOTAL = StructType(
    [
        StructField("order_id", StringType()),
        StructField("total", DoubleType()),
    ]
)

# Raw Kafka record shape (BinaryType key/value like the Kafka source)
KAFKA_RECORD = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
    ]
)

# --- Driver testdata schemas (TESTDATA.md / FIXTURES.md) ------------------

REGION = StructType(
    [StructField("r_regionkey", IntegerType()), StructField("r_name", StringType())]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

#: schema of the JSON blob inside events.props
EVENT_PROPS = StructType([StructField("k", LongType())])

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

#: multimodal column convention: opaque binary payload + typed metadata
MULTIMODAL_BLOB = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # "image" | "audio" | "video"
        StructField("payload", BinaryType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)

TESTDATA_SCHEMAS = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
