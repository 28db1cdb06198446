from confluent_kafka_streams_examples_spark.streaming.ktable import latest_per_key_stream
from confluent_kafka_streams_examples_spark.streaming.join import windowed_stream_join
from confluent_kafka_streams_examples_spark.streaming.processor import running_total_with_emission
from confluent_kafka_streams_examples_spark.streaming.lifecycle import StreamApp
from confluent_kafka_streams_examples_spark.streaming.neardup import neardup_candidates_stream

__all__ = [
    "latest_per_key_stream",
    "windowed_stream_join",
    "running_total_with_emission",
    "StreamApp",
    "neardup_candidates_stream",
]
