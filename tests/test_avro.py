"""FORMAT AVRO decode: spec-level round trips, Confluent framing, and the
file-backed streaming path (Kafka-shaped, no broker)."""

import pytest
from pyspark.sql import functions as F

from materialize_spark.sources.avro import (
    avro_spark_schema, decode_avro_stream, encode_record,
)

SCHEMA = """
{"type": "record", "name": "click", "fields": [
  {"name": "user_id", "type": "long"},
  {"name": "page", "type": "string"},
  {"name": "dwell", "type": "double"},
  {"name": "mobile", "type": "boolean"},
  {"name": "referrer", "type": ["null", "string"]}
]}
"""

ROWS = [
    {"user_id": 7, "page": "/home", "dwell": 1.25, "mobile": True,
     "referrer": None},
    {"user_id": -3, "page": "/a/b", "dwell": -0.5, "mobile": False,
     "referrer": "g.example"},
    {"user_id": 2 ** 40, "page": "", "dwell": 0.0, "mobile": True,
     "referrer": ""},
]


@pytest.mark.parametrize("wire", ["raw", "confluent"])
def test_avro_roundtrip(spark, wire):
    payloads = [(i, bytearray(encode_record(SCHEMA, r, wire=wire)))
                for i, r in enumerate(ROWS)]
    df = spark.createDataFrame(payloads, "offset long, value binary")
    out = decode_avro_stream(df, "value", SCHEMA, wire=wire)
    got = {r.offset: r.asDict() for r in out.collect()}
    for i, expected in enumerate(ROWS):
        for k, v in expected.items():
            assert got[i][k] == v, (i, k, got[i][k], v)


def test_avro_schema_mapping():
    st = avro_spark_schema(SCHEMA)
    assert [f.name for f in st.fields] == \
        ["user_id", "page", "dwell", "mobile", "referrer"]
    assert st["user_id"].dataType.simpleString() == "bigint"
    assert st["referrer"].dataType.simpleString() == "string"


def test_avro_streaming_decode(spark, tmp_path):
    """readStream over avro-framed files -> decode -> aggregate: the
    FORMAT AVRO source path end-to-end."""
    payloads = [(i, bytearray(encode_record(SCHEMA, r, wire="confluent")))
                for i, r in enumerate(ROWS * 10)]
    src = str(tmp_path / "avro_src")
    spark.createDataFrame(payloads, "offset long, value binary") \
        .coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("offset long, value binary").parquet(src)
    decoded = decode_avro_stream(stream, "value", SCHEMA, wire="confluent")
    agg = decoded.groupBy("page").agg(F.count(F.lit(1)).alias("n"))
    q = (agg.writeStream.format("memory").queryName("avro_out")
         .outputMode("complete").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination(120)
    got = {r.page: r.n for r in spark.sql("SELECT * FROM avro_out").collect()}
    assert got == {"/home": 10, "/a/b": 10, "": 10}


def test_avro_rejects_nested():
    nested = ('{"type":"record","name":"r","fields":'
              '[{"name":"x","type":{"type":"record","name":"inner",'
              '"fields":[]}}]}')
    with pytest.raises(ValueError, match="primitive"):
        avro_spark_schema(nested)
