from confluent_kafka_streams_examples_spark.functions.scalar import (
    round_det,
    safe_long,
    strict_long,
    substr_after_first,
)
from confluent_kafka_streams_examples_spark.functions.json_serde import (
    deserialize_json,
    serialize_json,
)

__all__ = [
    "round_det",
    "safe_long",
    "strict_long",
    "substr_after_first",
    "deserialize_json",
    "serialize_json",
]
