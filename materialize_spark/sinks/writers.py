"""Sink writers.

Reference sink surface (src/storage-types/src/sinks.rs:137-140 — Kafka and
Iceberg continuous sinks; src/compute/src/sink/copy_to_s3_oneshot.rs — the
one-shot COPY TO export) mapped to Spark writers: copy_to = batch
DataFrameWriter export; stream_to_files / kafka_sink = writeStream
continuous sinks with checkpointing; stream_to_memory = the SUBSCRIBE-style
in-session sink used by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copy_to(df: DataFrame, path: str, fmt: str = "parquet", *,
            partition_by: list[str] | None = None, mode: str = "overwrite",
            **options) -> None:
    """COPY ... TO: one-shot export (reference copy_to_s3_oneshot).

    ``partition_by`` maps to directory partitioning — the 100 TB layout
    lever (downstream partition pruning)."""
    w = df.write.mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
        w = w.option("header", "true")
    w.format(fmt).save(path)


def write_sink_snapshot(df: DataFrame, path: str, fmt: str = "json",
                        envelope: str = "none") -> None:
    """CREATE SINK initial snapshot (reference sinks emit a snapshot, then
    deltas — src/storage-types/src/sinks.rs:137-140).

    Envelopes shape the emitted records like the reference's Kafka sink:
    - none: bare rows
    - upsert: (key-less here) rows as upsert values with a null-means-delete
      contract — snapshot rows are all values
    - debezium: {"before": null, "after": row} change records
    """
    if envelope == "debezium":
        out = df.select(
            F.lit(None).cast("string").alias("before"),
            F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("after"),
        )
    elif envelope == "upsert":
        out = df.select(
            F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"))
    else:
        out = df
    copy_to(out, path, fmt)


def stream_to_files(df: DataFrame, path: str, checkpoint: str,
                    fmt: str = "parquet", *, partition_by: list[str] | None = None,
                    trigger_available_now: bool = True):
    """Continuous file sink (append mode — the ENVELOPE NONE export)."""
    w = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_to_memory(df: DataFrame, name: str, *, output_mode: str = "append",
                     trigger_available_now: bool = True):
    """Memory sink — the SUBSCRIBE/console serving path for tests/REPL."""
    w = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def kafka_sink(df: DataFrame, bootstrap: str, topic: str, checkpoint: str, *,
               key_col: str | None = None, value_cols: list[str] | None = None):
    """Kafka sink (JSON envelope): requires the kafka connector jar —
    absent in this container, gated at call time by Spark itself."""
    value = F.to_json(F.struct(*[F.col(c) for c in (value_cols or df.columns)]))
    out = df.select(
        (F.col(key_col).cast("string") if key_col else F.lit(None).cast("string"))
        .alias("key"),
        value.alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
