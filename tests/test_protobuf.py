"""FORMAT PROTOBUF decode: wire-format round trips, proto3 defaults,
unknown-field skipping, negative ints, streaming path."""

import pytest
from pyspark.sql import functions as F

from materialize_spark.sources.protobuf import (
    decode_proto_stream, encode_message, proto_spark_schema,
)

FIELDS = {
    1: ("user_id", "int64"),
    2: ("delta", "sint64"),
    3: ("page", "string"),
    4: ("score", "double"),
    5: ("mobile", "bool"),
}

ROWS = [
    {"user_id": 7, "delta": -5, "page": "/home", "score": 2.5,
     "mobile": True},
    {"user_id": -42, "delta": 9, "page": "", "score": 0.0, "mobile": False},
    {"user_id": 2 ** 50, "delta": -(2 ** 40), "page": "héllo", "score": -1.5,
     "mobile": True},
]


def test_proto_roundtrip(spark):
    payloads = [(i, bytearray(encode_message(FIELDS, r)))
                for i, r in enumerate(ROWS)]
    df = spark.createDataFrame(payloads, "offset long, value binary")
    got = {r.offset: r.asDict()
           for r in decode_proto_stream(df, "value", FIELDS).collect()}
    for i, expected in enumerate(ROWS):
        for k, v in expected.items():
            assert got[i][k] == v, (i, k, got[i][k], v)


def test_proto_defaults_and_unknown_fields(spark):
    # A message with only field 3 set, plus an unknown field 99 (varint)
    # and an unknown length-delimited field 100 — both must be skipped.
    payload = encode_message({3: ("page", "string")}, {"page": "/x"})
    payload += encode_message({99: ("zz", "int64")}, {"zz": 123})
    payload += encode_message({100: ("yy", "string")}, {"yy": "junk"})
    df = spark.createDataFrame([(0, bytearray(payload))],
                               "offset long, value binary")
    row = decode_proto_stream(df, "value", FIELDS).first()
    assert row.page == "/x"
    assert row.user_id == 0 and row.delta == 0  # proto3 defaults
    assert row.mobile is False and row.score == 0.0
    row_null = decode_proto_stream(df, "value", FIELDS,
                                   missing_as_null=True).first()
    assert row_null.user_id is None and row_null.page == "/x"


def test_proto_schema():
    st = proto_spark_schema(FIELDS)
    assert [f.name for f in st.fields] == \
        ["user_id", "delta", "page", "score", "mobile"]
    assert st["delta"].dataType.simpleString() == "bigint"


def test_proto_streaming_decode(spark, tmp_path):
    payloads = [(i, bytearray(encode_message(FIELDS, r)))
                for i, r in enumerate(ROWS * 5)]
    src = str(tmp_path / "proto_src")
    spark.createDataFrame(payloads, "offset long, value binary") \
        .coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("offset long, value binary").parquet(src)
    agg = (decode_proto_stream(stream, "value", FIELDS)
           .groupBy("mobile").agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream.format("memory").queryName("proto_out")
         .outputMode("complete").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination(120)
    got = {r.mobile: r.n for r in spark.sql("SELECT * FROM proto_out").collect()}
    assert got == {True: 10, False: 5}
