"""Format readers: batch + streaming over files; Kafka when available.

Formats (reference DataEncoding, encoding.rs:95-102) → Spark readers:
parquet/csv/json/text native; regex = text + regexp_extract; bytes =
binaryFile. Avro/Protobuf need the spark-avro/protobuf packages — gated.

Scale: all file readers split by ``spark.sql.files.maxPartitionBytes``;
predicate/column pushdown applies (parquet/csv). Streaming file sources
use ``maxFilesPerTrigger`` to bound micro-batch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "csv", "json", "text")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", *,
               schema: StructType | str | None = None,
               regex: str | None = None, **options) -> DataFrame:
    """Batch read. ``fmt='regex'`` reads text and explodes capture groups."""
    if fmt == "regex":
        assert regex is not None
        raw = spark.read.text(path)
        ngroups = regex.count("(")
        return raw.select(*[
            F.regexp_extract("value", regex, i + 1).alias(f"column{i + 1}")
            for i in range(ngroups)
        ])
    if fmt == "bytes":
        return spark.read.format("binaryFile").load(path)
    assert fmt in _FORMATS, f"unsupported format {fmt!r}"
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def stream_table(spark: SparkSession, path: str, fmt: str = "parquet", *,
                 schema: StructType | str, max_files_per_trigger: int = 1,
                 **options) -> DataFrame:
    """Streaming file source (the webhook/file-drop ingestion path)."""
    assert fmt in _FORMATS
    reader = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark.readStream.format("kafka") \
            .option("kafka.bootstrap.servers", "none:9092") \
            .option("subscribe", "probe").load()
        return True
    except Exception as ex:  # connector missing → DATA_SOURCE_NOT_FOUND
        return "DATA_SOURCE_NOT_FOUND" not in str(ex) and "Failed to find" not in str(ex)


def read_kafka_stream(spark: SparkSession, bootstrap: str, topic: str, *,
                      value_schema: StructType | str | None = None,
                      starting_offsets: str = "earliest") -> DataFrame:
    """Kafka source → (key, value, timestamp[, parsed value struct]).

    Reference: KafkaSourceConnection. Requires the kafka connector jar —
    call ``kafka_available`` first. Without the jar, the dependency-free
    wire client (sources/kafka_wire.read_kafka_wire: own protocol
    implementation, per-partition parallel fetch) covers the batch/
    snapshot path against any real broker.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    out = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "timestamp", "partition", "offset",
    )
    if value_schema is not None:
        out = out.withColumn("parsed", F.from_json("value", value_schema))
    return out
