from confluent_kafka_streams_examples_spark.operators.stream import Stream
from confluent_kafka_streams_examples_spark.operators.table import Table, latest_per_key

__all__ = ["Stream", "Table", "latest_per_key"]
