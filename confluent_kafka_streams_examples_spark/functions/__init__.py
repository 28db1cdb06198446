from confluent_kafka_streams_examples_spark.functions.scalar import (
    safe_long,
    strict_long,
    substr_after_first,
)
from confluent_kafka_streams_examples_spark.functions.json_serde import (
    deserialize_json,
    serialize_json,
)

__all__ = [
    "safe_long",
    "strict_long",
    "substr_after_first",
    "deserialize_json",
    "serialize_json",
]
