"""Binary-format envelope pipelines end-to-end, without a broker.

Reference shape: FORMAT AVRO USING CONFLUENT SCHEMA REGISTRY + ENVELOPE
UPSERT feeding a maintained view with SUBSCRIBE downstream
(src/storage-types/src/sources/encoding.rs:95-102 for the CSR-resolved
decode; src/storage/src/upsert.rs for the keyed-state envelope). The topic
is emulated as sequential parquet files of (offset, value<binary>) records
— the record shape a Kafka batch read yields — driven through readStream
with maxFilesPerTrigger=1 so each file is one micro-batch.
"""

import json
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from materialize_spark.sources.avro import encode_record
from materialize_spark.sources.schema_registry import (
    SchemaRegistry, decode_confluent_stream,
)
from materialize_spark.streaming.ivm import MaterializedView
from materialize_spark.streaming.upsert import merge_upsert_batch, upsert_latest

SCHEMA_V1 = json.dumps({
    "type": "record", "name": "item", "fields": [
        {"name": "k", "type": "long"},
        {"name": "category", "type": "string"},
        {"name": "amount", "type": ["null", "double"]},
    ]})
# v2 adds a nullable field the v1 writer doesn't know about.
SCHEMA_V2 = json.dumps({
    "type": "record", "name": "item", "fields": [
        {"name": "k", "type": "long"},
        {"name": "category", "type": "string"},
        {"name": "amount", "type": ["null", "double"]},
        {"name": "note", "type": ["null", "string"]},
    ]})


def _registry():
    return SchemaRegistry({1: SCHEMA_V1, 2: SCHEMA_V2})


def _rec(sid, k, category, amount, note=None):
    schema = SCHEMA_V1 if sid == 1 else SCHEMA_V2
    row = {"k": k, "category": category, "amount": amount}
    if sid == 2:
        row["note"] = note
    return encode_record(schema, row, wire="confluent", schema_id=sid)


def _avro_topic(tmp_path):
    """Three micro-batch files of Confluent-framed Avro over keys 1..4,
    mixing writer schema versions; a None amount is the tombstone."""
    batches = [
        [_rec(1, 1, "a", 10.0), _rec(1, 2, "a", 20.0), _rec(1, 3, "b", 30.0)],
        # v2 writer appears mid-stream: update k=2 into 'b', insert k=4
        [_rec(2, 2, "b", 25.0, "moved"), _rec(2, 4, "a", 40.0, None)],
        # tombstone k=1
        [_rec(1, 1, "a", None)],
    ]
    src = tmp_path / "avro_topic"
    src.mkdir()
    for i, batch in enumerate(batches):
        table = pa.table({
            "offset": pa.array([i * 100 + j for j in range(len(batch))],
                               pa.int64()),
            "value": pa.array(list(batch), pa.binary()),
        })
        f = src / f"part-{i:05d}.parquet"
        pq.write_table(table, str(f))
        # deterministic pickup order for maxFilesPerTrigger=1
        os.utime(str(f), (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src)


def test_confluent_avro_two_schema_versions_decode(spark):
    reg = _registry()
    rows = [
        (0, bytearray(_rec(1, 7, "x", 1.5))),
        (1, bytearray(_rec(2, 8, "y", 2.5, "hello"))),
    ]
    df = spark.createDataFrame(rows, "offset bigint, value binary")
    got = {r.k: (r.category, r.amount, r.note)
           for r in decode_confluent_stream(df, "value", reg).collect()}
    # v1-written record resolves against the v2 reader: note is NULL.
    assert got == {7: ("x", 1.5, None), 8: ("y", 2.5, "hello")}


def test_confluent_avro_unknown_schema_id_raises(spark):
    reg = _registry()
    bad = b"\x00" + struct.pack(">I", 99) + b"\x02"
    df = spark.createDataFrame([(0, bytearray(bad))],
                               "offset bigint, value binary")
    with pytest.raises(Exception, match="schema id 99"):
        decode_confluent_stream(df, "value", reg).collect()


def test_avro_upsert_ivm_subscribe_e2e(spark, tmp_path):
    """Confluent Avro decode → ENVELOPE UPSERT state → maintained
    category aggregate → SUBSCRIBE deltas, over a file-backed stream."""
    src = _avro_topic(tmp_path)
    reg = _registry()

    mv = MaterializedView(
        spark,
        define=lambda df: df.groupBy("category").agg(
            F.round(F.sum("amount"), 4).alias("total"),
            F.count(F.lit(1)).alias("n")),
        keys=["category"], combine=None)
    upsert_state = [None]
    subscribe = []

    def on_batch(batch_df, _epoch):
        decoded = decode_confluent_stream(batch_df, "value", reg)
        latest = upsert_latest(
            decoded, ["k"], [F.col("offset").desc()],
            delete_when=F.col("amount").isNull())
        merged = merge_upsert_batch(upsert_state[0], latest, ["k"])
        # tombstoned keys leave the maintained state entirely
        tombstones = upsert_latest(decoded, ["k"], [F.col("offset").desc()]) \
            .filter(F.col("amount").isNull()).select("k")
        upsert_state[0] = merged.join(
            tombstones, on="k", how="left_anti").localCheckpoint(eager=True)
        delta = mv.on_state(upsert_state[0].select("category", "amount"))
        subscribe.append([tuple(r) for r in delta.collect()])

    stream = (spark.readStream
              .schema("offset bigint, value binary")
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    q = (stream.writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    # Survivors: k2(b,25), k3(b,30), k4(a,40).
    final = {r.category: (r.total, r.n) for r in mv.result().collect()}
    assert final == {"a": (40.0, 1), "b": (55.0, 2)}

    # SUBSCRIBE saw three delta batches; the last (k=1 tombstone) touches
    # only 'a': retract the stale aggregate, add the corrected one —
    # deltas, not snapshots ('b' unchanged, so it must not re-emit).
    assert len(subscribe) == 3
    last = {(r[0], r[-1]) for r in subscribe[-1]}
    assert {c for c, _ in last} == {"a"}
    assert {d for _, d in last} == {1, -1}


def test_avro_bytes_field_roundtrip(spark):
    """'bytes' fields decode to BinaryType (regression: the type table
    lacked an entry although encode/decode and the validator accept it)."""
    schema = json.dumps({
        "type": "record", "name": "blob", "fields": [
            {"name": "k", "type": "long"},
            {"name": "payload", "type": "bytes"},
        ]})
    from materialize_spark.sources.avro import decode_avro_stream
    raw = encode_record(schema, {"k": 5, "payload": b"\x01\x02\xff"})
    df = spark.createDataFrame([(bytearray(raw),)], "value binary")
    [row] = decode_avro_stream(df, "value", schema).collect()
    assert row.k == 5 and bytes(row.payload) == b"\x01\x02\xff"


def test_protobuf_envelope_batch(spark):
    """Protobuf wire decode feeding the batch upsert envelope."""
    from materialize_spark.sources.protobuf import (
        decode_proto_stream, encode_message,
    )
    fields = {1: ("k", "int64"), 2: ("category", "string"),
              3: ("amount", "double")}
    msgs = [
        (0, encode_message(fields, {"k": 1, "category": "a", "amount": 10.0})),
        (1, encode_message(fields, {"k": 1, "category": "a", "amount": 15.0})),
        (2, encode_message(fields, {"k": 2, "category": "b", "amount": 30.0})),
    ]
    df = spark.createDataFrame(
        [(o, bytearray(m)) for o, m in msgs], "offset bigint, value binary")
    decoded = decode_proto_stream(df, "value", fields)
    latest = upsert_latest(decoded, ["k"], [F.col("offset").desc()])
    got = sorted((r.k, r.category, r.amount) for r in latest.collect())
    assert got == [(1, "a", 15.0), (2, "b", 30.0)]


def test_value_decoding_errors_inline(spark):
    """ENVELOPE UPSERT (VALUE DECODING ERRORS = INLINE): a poison record
    keeps its key columns, NULLs the data fields, and carries the message
    in decode_error — and a later good value for the key supersedes it
    (reference UpsertStyle::ValueErrInline, envelope.rs:80)."""
    reg = _registry()
    rows = [
        (0, bytearray(_rec(1, 1, "a", 10.0))),
        (1, bytearray(b"\x01garbage")),            # bad magic byte
        (2, bytearray(b"\x00\x00\x00\x00\x63\x02")),  # unknown schema 99
        (3, bytearray(_rec(1, 2, "b", 20.0))),
    ]
    df = spark.createDataFrame(rows, "offset bigint, value binary")
    out = decode_confluent_stream(df, "value", reg, errors="inline") \
        .orderBy("offset").collect()
    assert [r.decode_error is None for r in out] == [True, False, False,
                                                     True]
    assert "magic byte" in out[1].decode_error
    assert "schema id 99" in out[2].decode_error
    assert out[1].k is None and out[2].category is None
    assert (out[0].k, out[0].amount) == (1, 10.0)
    assert (out[3].k, out[3].amount) == (2, 20.0)
    # keyed upsert view: offsets still order the per-key state, so the
    # error rows (keyless here) do not displace good keys
    good = upsert_latest(
        decode_confluent_stream(df, "value", reg, errors="inline")
        .filter(F.col("decode_error").isNull()),
        ["k"], [F.col("offset").desc()])
    assert {r.k: r.amount for r in good.collect()} == {1: 10.0, 2: 20.0}


def test_value_decoding_errors_default_raises(spark):
    reg = _registry()
    df = spark.createDataFrame([(0, bytearray(b"\x01oops"))],
                               "offset bigint, value binary")
    with pytest.raises(Exception, match="magic byte"):
        decode_confluent_stream(df, "value", reg).collect()
