"""Sink writers.

Reference sink surface (src/storage-types/src/sinks.rs:137-140 — Kafka and
Iceberg continuous sinks; src/compute/src/sink/copy_to_s3_oneshot.rs — the
one-shot COPY TO export) mapped to Spark writers: copy_to = batch
DataFrameWriter export; stream_to_files / kafka_sink = writeStream
continuous sinks with checkpointing; stream_to_memory = the SUBSCRIBE-style
in-session sink used by tests.
"""

from __future__ import annotations

import pandas as pd

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


def kafka_envelope_frames(adds: DataFrame, rets: DataFrame | None,
                          key_col: str, envelope: str,
                          ) -> list[DataFrame]:
    """Frame a change batch (additions + retractions) as Kafka sink
    records per the declared ENVELOPE (reference
    src/storage-types/src/sinks.rs:137-140; upsert/debezium framing
    src/interchange). Returns (key string, value string-or-NULL) frames
    to produce IN ORDER — ordering carries the envelope's semantics
    (a key's tombstone must precede its re-insert, never follow it).

    - ``upsert``: latest-value-per-key with NULL-value tombstones for
      keys that vanish; a key present in both sides is an update and
      emits only its new value (no transient tombstone).
    - ``debezium``: {"before", "after"} change records — deletes have
      after = null, inserts before = null.
    - ``none``: append-only bare values; retractions are unrepresentable
      and raise (the reference rejects the combination at CREATE time).
    """
    data_cols = [c for c in adds.columns]
    row_json = F.to_json(F.struct(*[F.col(c) for c in data_cols]))
    key = F.col(key_col).cast("string").alias("key")
    if envelope == "upsert":
        frames = []
        if rets is not None:
            gone = rets.join(adds.select(key_col).distinct(),
                             on=key_col, how="left_anti")
            frames.append(gone.select(
                key, F.lit(None).cast("string").alias("value")))
        frames.append(adds.select(key, row_json.alias("value")))
        return frames
    if envelope == "debezium":
        # ignoreNullFields=false keeps the explicit "before"/"after"
        # nulls Debezium consumers dispatch on
        opts = {"ignoreNullFields": "false"}
        row_struct = F.struct(*[F.col(c) for c in data_cols])
        null_side = F.lit(None).cast("string")
        frames = []
        if rets is not None:
            frames.append(rets.select(key, F.to_json(F.struct(
                row_struct.alias("before"),
                null_side.alias("after"),
                F.lit("d").alias("op")), opts).alias("value")))
        frames.append(adds.select(key, F.to_json(F.struct(
            null_side.alias("before"),
            row_struct.alias("after"),
            F.lit("c").alias("op")), opts).alias("value")))
        return frames
    if envelope == "none":
        if rets is not None and not rets.isEmpty():
            raise ValueError(
                "ENVELOPE NONE Kafka sink cannot represent retractions; "
                "recreate the sink with ENVELOPE UPSERT or DEBEZIUM")
        return [adds.select(key, row_json.alias("value"))]
    raise ValueError(f"unsupported sink ENVELOPE {envelope!r} "
                     "(none | upsert | debezium)")


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


def kafka_murmur2(data: bytes) -> int:
    """Apache Kafka's murmur2 (seed 0x9747b28c,
    org.apache.kafka.common.utils.Utils#murmur2), signed-32 result —
    byte-identical to the broker's DefaultPartitioner hash."""
    length = len(data)
    m, r = 0x5BD1E995, 24
    h = (0x9747B28C ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> r
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
        i += 4
    tail = length - i
    if tail == 3:
        h ^= (data[i + 2] & 0xFF) << 16
    if tail >= 2:
        h ^= (data[i + 1] & 0xFF) << 8
    if tail >= 1:
        h = ((h ^ (data[i] & 0xFF)) * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h - (1 << 32) if h >= 1 << 31 else h


def kafka_murmur2_partition(key: "Column | str", num_partitions: int):
    """Kafka's DefaultPartitioner assignment for a key column:
    ``murmur2(key_bytes) & 0x7fffffff % num_partitions``.

    The reference exposes ``kafka_murmur2`` as a SQL builtin
    (src/sql/src/func.rs mz_catalog) so sink routing is predictable; the
    murmur2 variant is the public Apache Kafka one (seed 0x9747b28c,
    org.apache.kafka.common.utils.Utils#murmur2). Implemented as an
    Arrow-batched pandas UDF — byte-level mixing has no Column-expression
    form; one UDF eval per row batch, used only on the sink path.
    """
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("int")
    def _murmur2_part(keys: pd.Series) -> pd.Series:
        return keys.map(
            lambda k: None if k is None else
            (kafka_murmur2(
                k if isinstance(k, (bytes, bytearray)) else str(k).encode())
             & 0x7FFFFFFF) % num_partitions)

    key_col = col(key) if isinstance(key, str) else key
    return _murmur2_part(key_col)


def write_kafka_wire(df, bootstrap: str, topic: str, *,
                     key_col: str = "key", value_col: str = "value",
                     num_partitions: int | None = None,
                     ssl_conf: dict | None = None) -> int:
    """Kafka SINK over the wire protocol (sources/kafka_wire.py client):
    rows route to partitions by murmur2(key) — byte-identical to the
    broker's DefaultPartitioner (kafka_murmur2 above) — then each Spark
    task produces ITS partitions over its own connection. Returns the
    row count written.

    Parallel shape mirrors the source: shuffle on the computed partition
    (one producer per partition, ordered within it — the reference's
    sink contract, src/storage/src/sink/kafka.rs: per-partition ordered
    appends), no driver-side record collection."""
    from typing import Iterator

    from pyspark.sql import functions as F

    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, kafka_partitions,
    )

    host, port = bootstrap.rsplit(":", 1)
    port_i = int(port)
    if num_partitions is None:
        num_partitions = len(kafka_partitions(bootstrap, topic,
                                              ssl_conf)) or 1
    routed = df.select(
        F.col(key_col).cast("binary").alias("k"),
        F.col(value_col).cast("binary").alias("v"),
        kafka_murmur2_partition(F.col(key_col).cast("binary"),
                                num_partitions).alias("p"),
    ).repartition(num_partitions, "p")

    def produce(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            n = 0
            if len(pdf):
                by_p: dict[int, list] = {}
                for k, v, p in zip(pdf["k"], pdf["v"], pdf["p"]):
                    by_p.setdefault(int(p), []).append(
                        (bytes(k) if k is not None else None,
                         bytes(v) if v is not None else None, -1))
                from materialize_spark.sources.tlsconf import (
                    client_context,
                )
                with KafkaWireClient(
                        host, port_i,
                        ssl_context=client_context(ssl_conf)) as c:
                    for p, recs in sorted(by_p.items()):
                        c.produce(topic, p, recs)
                        n += len(recs)
            yield pd.DataFrame({"n": [n]})

    out = routed.mapInPandas(produce, schema="n long")
    return int(out.agg(F.sum("n")).first()[0] or 0)
