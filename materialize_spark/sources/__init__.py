"""Sources: external data → time-varying collections.

Reference: GenericSourceConnection {Kafka, Postgres, MySQL, SqlServer,
LoadGenerator, Webhook} (src/storage-types/src/sources.rs:694-700), formats
DataEncoding {Avro, Protobuf, Csv, Regex, Bytes, Json, Text}
(src/storage-types/src/sources/encoding.rs:95-102), envelopes {None, Upsert,
Debezium, CdcV2} (src/storage-types/src/sources/envelope.rs:24-40).

Spark mapping here:
- files (parquet/csv/json/text) → ``readers`` batch + streaming
- Kafka → native spark-sql-kafka when the connector jar is present
  (gated; this container ships without it)
- decode: from_json / from_csv / regex extraction — JVM-side
- envelopes: ``envelopes.debezium_decode`` / upsert via
  streaming.upsert; None = append-only passthrough
- LoadGenerator (Counter/Clock/Tpch) → ``loadgen`` on the rate source
- webhook → file-drop directory watched by a file stream
"""

from materialize_spark.sources.readers import (
    read_table, stream_table, kafka_available, read_kafka_stream,
)
from materialize_spark.sources.envelopes import debezium_decode, ENVELOPE_NONE, ENVELOPE_UPSERT, ENVELOPE_DEBEZIUM
from materialize_spark.sources.loadgen import counter_source, clock_source

__all__ = [
    "read_table", "stream_table", "kafka_available", "read_kafka_stream",
    "debezium_decode", "ENVELOPE_NONE", "ENVELOPE_UPSERT", "ENVELOPE_DEBEZIUM",
    "counter_source", "clock_source",
]
