"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference stream processor
(slemus9/confluent-kafka-streams-examples, Kafka Streams course examples).

Architecture (Spark-first, NOT a port):

- The reference's KStream/KTable/state-store abstractions are re-expressed
  as DataFrame transformations (batch) and Structured Streaming queries
  (streaming).  See ``operators.stream.Stream`` / ``operators.table.Table``.
- The "topology" is the Catalyst logical plan; ``plans.describe`` exposes
  the ``topology.describe()`` analog via ``df.explain``.
- All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
  whole-stage-codegen).  Pandas UDFs appear only where semantics genuinely
  require imperative state (``streaming.processor``) or vectorized python
  (multimodal decode stubs).
- Every operator is designed collect-free and partition-parallel for
  100 TB scale: joins broadcast dimension tables, aggregations rely on
  partial (map-side) combine, dedup/similarity use bucketed hash joins.
"""

from confluent_kafka_streams_examples_spark.session import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
