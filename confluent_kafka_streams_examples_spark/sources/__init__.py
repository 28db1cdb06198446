from confluent_kafka_streams_examples_spark.sources.parquet import parquet_source
from confluent_kafka_streams_examples_spark.sources.kafka import kafka_stream, kafka_sink
from confluent_kafka_streams_examples_spark.sources.files import file_stream

__all__ = ["parquet_source", "kafka_stream", "kafka_sink", "file_stream"]
