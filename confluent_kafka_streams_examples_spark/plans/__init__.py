from confluent_kafka_streams_examples_spark.plans.describe import (
    describe,
    explain_str,
    assert_pushed_filters,
    assert_broadcast_join,
)

__all__ = ["describe", "explain_str", "assert_pushed_filters", "assert_broadcast_join"]
