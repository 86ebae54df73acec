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


def test_avro_nested_record_maps_to_struct():
    """Inline record fields (the Debezium before/after envelope shape)
    map to nullable Spark structs; other complex types still reject."""
    from pyspark.sql.types import LongType, StructType

    nested = ('{"type":"record","name":"r","fields":'
              '[{"name":"x","type":{"type":"record","name":"inner",'
              '"fields":[{"name":"a","type":["null","long"]}]}}]}')
    sch = avro_spark_schema(nested)
    assert isinstance(sch["x"].dataType, StructType)
    assert isinstance(sch["x"].dataType["a"].dataType, LongType)
    arrays = ('{"type":"record","name":"r","fields":'
              '[{"name":"x","type":{"type":"array","items":"long"}}]}')
    with pytest.raises(ValueError, match="record"):
        avro_spark_schema(arrays)


def test_avro_debezium_envelope_roundtrip():
    """The nested envelope encodes/decodes through the binary codec:
    {before: null, after: row} and the reverse."""
    import json as _json

    from materialize_spark.sources.avro import (
        _decode_value, _encode_value, _fields,
        spark_to_debezium_avro_schema,
    )
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    sch = StructType([StructField("id", LongType()),
                      StructField("name", StringType())])
    sj, _strf = spark_to_debezium_avro_schema(sch)
    fields = _fields(_json.loads(sj))
    for rec in ({"before": None, "after": {"id": 5, "name": "x"}},
                {"before": {"id": 5, "name": None}, "after": None}):
        buf = b"".join(_encode_value(t, rec[n]) for n, t in fields)
        pos, out = 0, {}
        for n, t in fields:
            out[n], pos = _decode_value(t, buf, pos)
        assert out == rec
