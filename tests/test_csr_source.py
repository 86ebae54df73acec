"""SQL-path source formats over the wire: FORMAT AVRO / PROTOBUF USING
CONFLUENT SCHEMA REGISTRY CONNECTION (reference DataEncoding,
src/storage-types/src/sources/encoding.rs:95-102 + the src/ccsr client),
and FORMAT CSV / REGEX — e2e against MiniBroker + MiniSchemaRegistryServer
(real TCP + real HTTP)."""

import json
import struct

import pytest

from materialize_spark.plans.sqlfront import MzSession
from materialize_spark.sources.avro import encode_record
from materialize_spark.sources.kafka_wire import KafkaWireClient, MiniBroker
from materialize_spark.sources.protobuf import encode_message
from materialize_spark.sources.schema_registry import (
    MiniSchemaRegistryServer,
)

SF_DIR = "/root/testdata/sf0.001"

SCHEMA_V1 = json.dumps({
    "type": "record", "name": "m",
    "fields": [{"name": "a", "type": "long"},
               {"name": "b", "type": "string"}]})
SCHEMA_V2 = json.dumps({
    "type": "record", "name": "m",
    "fields": [{"name": "a", "type": "long"},
               {"name": "b", "type": "string"},
               {"name": "c", "type": "double"}]})


def _conns(s, broker, csr):
    s.execute(f"CREATE CONNECTION kc TO KAFKA "
              f"(BROKER '{broker.host}:{broker.port}')")
    s.execute(f"CREATE CONNECTION csr TO CONFLUENT SCHEMA REGISTRY "
              f"(URL '{csr.url}')")


def test_avro_csr_source_schema_evolution(spark):
    """Writer-schema evolution through the registry: v1 records (no c)
    decode with c = NULL against the latest reader schema."""
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker, MiniSchemaRegistryServer() as csr:
        broker.create_topic("av", partitions=2)
        id1 = csr.register_subject("av-value", SCHEMA_V1)
        id2 = csr.register_subject("av-value", SCHEMA_V2)
        with KafkaWireClient(broker.host, broker.port) as c:
            c.produce("av", 0, [
                (b"k1", encode_record(SCHEMA_V1, {"a": 1, "b": "x"},
                                      wire="confluent", schema_id=id1),
                 1000),
                (b"k2", encode_record(SCHEMA_V2,
                                      {"a": 2, "b": "y", "c": 2.5},
                                      wire="confluent", schema_id=id2),
                 1001)])
            c.produce("av", 1, [
                (b"k3", encode_record(SCHEMA_V2,
                                      {"a": 3, "b": "z", "c": 3.5},
                                      wire="confluent", schema_id=id2),
                 1002)])
        _conns(s, broker, csr)
        s.execute("CREATE SOURCE av FROM KAFKA CONNECTION kc "
                  "(TOPIC 'av') FORMAT AVRO USING CONFLUENT SCHEMA "
                  "REGISTRY CONNECTION csr")
        got = sorted((r.key, r.a, r.b, r.c) for r in
                     s.sql("SELECT key, a, b, c FROM av").collect())
        assert got == [("k1", 1, "x", None), ("k2", 2, "y", 2.5),
                       ("k3", 3, "z", 3.5)]
        # SHOW CREATE keeps the statement; the catalog knows the source
        assert "av" in {r.name for r in s.sql("SHOW SOURCES").collect()}
        s.execute("DROP SOURCE av")
        for conn in ("kc", "csr"):
            s.execute(f"DROP CONNECTION {conn}")


def test_avro_csr_upsert_envelope_tombstone(spark):
    """ENVELOPE UPSERT over CSR Avro: last write per key wins and a
    NULL-value tombstone deletes the key."""
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker, MiniSchemaRegistryServer() as csr:
        broker.create_topic("avu", partitions=1)
        sid = csr.register_subject("avu-value", SCHEMA_V1)
        rec = lambda a, b: encode_record(  # noqa: E731
            SCHEMA_V1, {"a": a, "b": b}, wire="confluent", schema_id=sid)
        with KafkaWireClient(broker.host, broker.port) as c:
            c.produce("avu", 0, [
                (b"k1", rec(1, "old"), 1000),
                (b"k2", rec(2, "two"), 1001),
                (b"k1", rec(10, "new"), 1002),
                (b"k2", None, 1003)])  # tombstone deletes k2
        _conns(s, broker, csr)
        s.execute("CREATE SOURCE avu FROM KAFKA CONNECTION kc "
                  "(TOPIC 'avu') FORMAT AVRO USING CONFLUENT SCHEMA "
                  "REGISTRY CONNECTION csr ENVELOPE UPSERT")
        got = sorted((r.key, r.a, r.b) for r in
                     s.sql("SELECT key, a, b FROM avu").collect())
        assert got == [("k1", 10, "new")]
        s.execute("DROP SOURCE avu")
        for conn in ("kc", "csr"):
            s.execute(f"DROP CONNECTION {conn}")


def test_protobuf_csr_source(spark):
    """FORMAT PROTOBUF USING CSR: Confluent-framed protobuf payloads
    (magic + schema id + message-index list) decode against the
    subject's field descriptors."""
    s = MzSession(spark, SF_DIR)
    fields = {1: ("n", "int64"), 2: ("s", "string"), 3: ("f", "double")}
    desc = json.dumps({str(k): list(v) for k, v in fields.items()})
    with MiniBroker() as broker, MiniSchemaRegistryServer() as csr:
        broker.create_topic("pb", partitions=1)
        sid = csr.register_subject("pb-value", desc,
                                   schema_type="PROTOBUF")
        frame = lambda row: (b"\x00" + struct.pack(">I", sid)  # noqa: E731
                             + b"\x00" + encode_message(fields, row))
        with KafkaWireClient(broker.host, broker.port) as c:
            c.produce("pb", 0, [
                (b"a", frame({"n": 7, "s": "hi", "f": 1.5}), 1000),
                (b"b", frame({"n": -3, "s": "", "f": 0.0}), 1001)])
        _conns(s, broker, csr)
        s.execute("CREATE SOURCE pb FROM KAFKA CONNECTION kc "
                  "(TOPIC 'pb') FORMAT PROTOBUF USING CONFLUENT "
                  "SCHEMA REGISTRY CONNECTION csr")
        got = sorted((r.key, r.n, r.s, r.f) for r in
                     s.sql("SELECT key, n, s, f FROM pb").collect())
        assert got == [("a", 7, "hi", 1.5), ("b", -3, "", 0.0)]
        s.execute("DROP SOURCE pb")
        for conn in ("kc", "csr"):
            s.execute(f"DROP CONNECTION {conn}")


def test_csv_format_source(spark):
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        broker.create_topic("cv", partitions=1)
        with KafkaWireClient(broker.host, broker.port) as c:
            c.produce("cv", 0, [
                (b"r1", b"1,alpha,9.5", 1000),
                (b"r2", b"2,beta,0.25", 1001)])
        s.execute(f"CREATE CONNECTION kc2 TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute("CREATE SOURCE cv FROM KAFKA CONNECTION kc2 "
                  "(TOPIC 'cv') FORMAT CSV WITH 3 COLUMNS")
        got = sorted((r.key, r.column1, r.column2, r.column3) for r in
                     s.sql("SELECT key, column1, column2, column3 "
                           "FROM cv").collect())
        assert got == [("r1", "1", "alpha", "9.5"),
                       ("r2", "2", "beta", "0.25")]
        s.execute("DROP SOURCE cv")
        s.execute("DROP CONNECTION kc2")


def test_regex_format_source(spark):
    """Named capture groups become columns; non-matching rows come out
    NULL (the reference's RegexEncoding semantics)."""
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        broker.create_topic("rx", partitions=1)
        with KafkaWireClient(broker.host, broker.port) as c:
            c.produce("rx", 0, [
                (b"l1", b"GET /api/users 200", 1000),
                (b"l2", b"POST /api/orders 500", 1001)])
        s.execute(f"CREATE CONNECTION kc3 TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute("CREATE SOURCE rx FROM KAFKA CONNECTION kc3 "
                  "(TOPIC 'rx') FORMAT REGEX "
                  "'(?P<verb>\\w+) (?P<path>\\S+) (?P<code>\\d+)'")
        got = sorted((r.verb, r.path, r.code) for r in
                     s.sql("SELECT verb, path, code FROM rx").collect())
        assert got == [("GET", "/api/users", "200"),
                       ("POST", "/api/orders", "500")]
        s.execute("DROP SOURCE rx")
        s.execute("DROP CONNECTION kc3")


def test_avro_csr_unknown_connection_errors(spark):
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        broker.create_topic("nope", partitions=1)
        s.execute(f"CREATE CONNECTION kc4 TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        with pytest.raises(KeyError, match="unknown connection"):
            s.execute("CREATE SOURCE nope FROM KAFKA CONNECTION kc4 "
                      "(TOPIC 'nope') FORMAT AVRO USING CONFLUENT "
                      "SCHEMA REGISTRY CONNECTION ghost")
        s.execute("DROP CONNECTION kc4")


def test_include_metadata_projection(spark):
    """INCLUDE KEY|PARTITION|OFFSET|TIMESTAMP [AS alias] controls which
    metadata columns the source exposes (reference KafkaMetadataKind);
    without INCLUDE the legacy full set remains."""
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        broker.create_topic("inc", partitions=1)
        with KafkaWireClient(broker.host, broker.port) as c:
            c.produce("inc", 0, [(b"k1", b'{"v": 1}', 1000),
                                 (b"k2", b'{"v": 2}', 1001)])
        s.execute(f"CREATE CONNECTION ikc TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute("CREATE SOURCE inc1 FROM KAFKA CONNECTION ikc "
                  "(TOPIC 'inc') FORMAT JSON "
                  "INCLUDE KEY AS msg_key, OFFSET")
        cols = s.sql("SELECT * FROM inc1").columns
        assert cols == ["msg_key", "data", "offset"]
        got = sorted((r.msg_key, r.offset) for r in
                     s.sql("SELECT msg_key, offset FROM inc1")
                     .collect())
        assert got == [("k1", 0), ("k2", 1)]
        # upsert consumed partition/offset: requesting them errors
        import pytest as _pytest
        with _pytest.raises(ValueError, match="INCLUDE"):
            s.execute("CREATE SOURCE inc2 FROM KAFKA CONNECTION ikc "
                      "(TOPIC 'inc') FORMAT JSON INCLUDE OFFSET "
                      "ENVELOPE UPSERT")
        s.execute("DROP SOURCE inc1")
        s.execute("DROP CONNECTION ikc")
