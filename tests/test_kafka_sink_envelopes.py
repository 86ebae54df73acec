"""Honest Kafka sinks: ENVELOPE UPSERT / DEBEZIUM framing applied to the
produced payload, and CONTINUOUS emission on every upstream commit — the
sink's output re-ingested through this engine's own envelope decoders
must reproduce the upstream object (reference
src/storage-types/src/sinks.rs:137-140 + sink rendering
src/storage/src/render)."""

import json

import pytest

from materialize_spark.plans.sqlfront import MzSession
from materialize_spark.sources.kafka_wire import MiniBroker, read_kafka_wire

SF_DIR = "/root/testdata/sf0.001"


def test_kafka_sink_upsert_roundtrip(spark):
    """Table → UPSERT sink → topic → UPSERT source: latest-per-key with
    tombstone deletes survives inserts, updates, and deletes."""
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        broker.create_topic("out_u", partitions=2)
        s.execute("CREATE TABLE sku_t (id BIGINT, v STRING)")
        s.execute("INSERT INTO sku_t VALUES (1, 'a'), (2, 'b')")
        s.execute(f"CREATE CONNECTION skc TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute("CREATE SINK sku FROM sku_t INTO KAFKA CONNECTION skc "
                  "(TOPIC 'out_u') KEY (id) FORMAT JSON ENVELOPE UPSERT")
        # continuous emission: every commit produces its diff
        s.execute("INSERT INTO sku_t VALUES (3, 'c')")
        s.execute("UPDATE sku_t SET v = 'B' WHERE id = 2")
        s.execute("DELETE FROM sku_t WHERE id = 1")
        # re-ingest through this engine's own upsert decoder
        s.execute("CREATE SOURCE sku_back FROM KAFKA CONNECTION skc "
                  "(TOPIC 'out_u') FORMAT JSON ENVELOPE UPSERT")
        back = {}
        for r in s.sql("SELECT key, data FROM sku_back").collect():
            back[int(r.key)] = json.loads(r.data)["v"]
        want = {r.id: r.v for r in
                s.sql("SELECT id, v FROM sku_t").collect()}
        assert back == want == {2: "B", 3: "c"}
        s.execute("DROP SOURCE sku_back")
        s.execute("DROP SINK sku")
        s.execute("DROP TABLE sku_t")
        s.execute("DROP CONNECTION skc")


def test_kafka_sink_debezium_roundtrip(spark):
    """Table → DEBEZIUM sink → topic → DEBEZIUM-decoding source: the
    folded change stream reproduces the table."""
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        broker.create_topic("out_d", partitions=1)
        s.execute("CREATE TABLE skd_t (id BIGINT, v STRING)")
        s.execute("INSERT INTO skd_t VALUES (1, 'x'), (2, 'y')")
        s.execute(f"CREATE CONNECTION skdc TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute("CREATE SINK skd FROM skd_t INTO KAFKA CONNECTION "
                  "skdc (TOPIC 'out_d') KEY (id) FORMAT JSON "
                  "ENVELOPE DEBEZIUM")
        s.execute("DELETE FROM skd_t WHERE id = 1")
        s.execute("INSERT INTO skd_t VALUES (3, 'z')")
        # raw records carry explicit before/after nulls
        raw = [json.loads(bytes(r.value))
               for r in read_kafka_wire(
                   spark, f"{broker.host}:{broker.port}",
                   "out_d").collect()]
        assert all({"before", "after"} <= set(r) for r in raw)
        assert any(r["before"] is not None and r["after"] is None
                   for r in raw)  # the delete
        # re-ingest through the engine's debezium envelope decoder
        s.execute("CREATE SOURCE skd_back FROM KAFKA CONNECTION skdc "
                  "(TOPIC 'out_d') FORMAT JSON ENVELOPE DEBEZIUM")
        back = sorted((r.id, r.v) for r in
                      s.sql("SELECT id, v FROM skd_back").collect())
        want = sorted((r.id, r.v) for r in
                      s.sql("SELECT id, v FROM skd_t").collect())
        assert back == want == [(2, "y"), (3, "z")]
        s.execute("DROP SOURCE skd_back")
        s.execute("DROP SINK skd")
        s.execute("DROP TABLE skd_t")
        s.execute("DROP CONNECTION skdc")


def test_kafka_sink_none_envelope_rejects_retractions(spark):
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        broker.create_topic("out_n", partitions=1)
        s.execute("CREATE TABLE skn_t (id BIGINT, v STRING)")
        s.execute("INSERT INTO skn_t VALUES (1, 'a')")
        s.execute(f"CREATE CONNECTION sknc TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute("CREATE SINK skn FROM skn_t INTO KAFKA CONNECTION "
                  "sknc (TOPIC 'out_n') KEY (id) FORMAT JSON")
        # appends are fine
        s.execute("INSERT INTO skn_t VALUES (2, 'b')")
        # a retraction is unrepresentable in ENVELOPE NONE: loud error
        with pytest.raises(ValueError, match="ENVELOPE NONE"):
            s.execute("DELETE FROM skn_t WHERE id = 1")
        s.execute("DROP SINK skn")
        s.execute("DROP TABLE skn_t")
        s.execute("DROP CONNECTION sknc")


def test_kafka_sink_over_materialized_view_refresh(spark):
    """Sink over an MV: REFRESH commits emit the view's diff."""
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        broker.create_topic("out_mv", partitions=1)
        s.execute("CREATE TABLE skm_t (k STRING, v BIGINT)")
        s.execute("INSERT INTO skm_t VALUES ('a', 1), ('a', 2), "
                  "('b', 10)")
        s.execute("CREATE MATERIALIZED VIEW skm_mv AS SELECT k, "
                  "SUM(v) AS total FROM skm_t GROUP BY k")
        s.execute(f"CREATE CONNECTION skmc TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute("CREATE SINK skm FROM skm_mv INTO KAFKA CONNECTION "
                  "skmc (TOPIC 'out_mv') KEY (k) FORMAT JSON "
                  "ENVELOPE UPSERT")
        s.execute("INSERT INTO skm_t VALUES ('b', 5)")
        s.execute("REFRESH MATERIALIZED VIEW skm_mv")
        s.execute("CREATE SOURCE skm_back FROM KAFKA CONNECTION skmc "
                  "(TOPIC 'out_mv') FORMAT JSON ENVELOPE UPSERT")
        back = {r.key: json.loads(r.data)["total"] for r in
                s.sql("SELECT key, data FROM skm_back").collect()}
        assert back == {"a": 3, "b": 15}
        s.execute("DROP SOURCE skm_back")
        s.execute("DROP SINK skm")
        s.execute("DROP VIEW skm_mv")
        s.execute("DROP TABLE skm_t")
        s.execute("DROP CONNECTION skmc")


def test_kafka_sink_avro_csr_roundtrip(spark):
    """Table → AVRO(CSR) UPSERT sink → topic → AVRO(CSR) source: the
    sink derives + registers its value schema and produces Confluent-
    framed records; re-ingesting through the engine's own CSR decoder
    over the SAME registry reproduces the table exactly — the
    reference's production sink format loop (sinks.rs +
    src/interchange/src/avro)."""
    from materialize_spark.sources.schema_registry import (
        MiniSchemaRegistryServer,
    )
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker, MiniSchemaRegistryServer() as csr:
        broker.create_topic("out_av", partitions=2)
        s.execute("CREATE TABLE ska_t (id BIGINT, v STRING, f DOUBLE, "
                  "d DATE)")
        s.execute("INSERT INTO ska_t VALUES (1, 'a', 1.5, "
                  "DATE '2024-01-02'), (2, 'b', 2.5, DATE '2024-03-04')")
        s.execute(f"CREATE CONNECTION skab TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute(f"CREATE CONNECTION skac TO CONFLUENT SCHEMA "
                  f"REGISTRY (URL '{csr.url}')")
        s.execute("CREATE SINK ska FROM ska_t INTO KAFKA CONNECTION "
                  "skab (TOPIC 'out_av') KEY (id) FORMAT AVRO USING "
                  "CONFLUENT SCHEMA REGISTRY CONNECTION skac "
                  "ENVELOPE UPSERT")
        # continuous: update + delete after the snapshot
        s.execute("UPDATE ska_t SET v = 'B' WHERE id = 2")
        s.execute("DELETE FROM ska_t WHERE id = 1")
        s.execute("INSERT INTO ska_t VALUES (3, 'c', 0.25, "
                  "DATE '2024-05-06')")
        s.execute("CREATE SOURCE ska_back FROM KAFKA CONNECTION skab "
                  "(TOPIC 'out_av') FORMAT AVRO USING CONFLUENT "
                  "SCHEMA REGISTRY CONNECTION skac ENVELOPE UPSERT")
        back = sorted((int(r.key), r.id, r.v, r.f, r.d) for r in
                      s.sql("SELECT key, id, v, f, d FROM ska_back")
                      .collect())
        want = sorted((r.id, r.id, r.v, r.f, str(r.d)) for r in
                      s.sql("SELECT id, v, f, d FROM ska_t").collect())
        assert back == want
        assert [r[1:3] for r in back] == [(2, "B"), (3, "c")]
        s.execute("DROP SOURCE ska_back")
        s.execute("DROP SINK ska")
        s.execute("DROP TABLE ska_t")
        for c in ("skab", "skac"):
            s.execute(f"DROP CONNECTION {c}")


def test_kafka_sink_avro_debezium_roundtrip(spark):
    """FORMAT AVRO + ENVELOPE DEBEZIUM (round 10, was rejected before):
    the nested before/after envelope schema registers with the CSR,
    deletes produce {before: row, after: null}, and the topic
    re-ingested through the engine's own CSR decoder + DEBEZIUM fold
    reproduces the table's net state."""
    from materialize_spark.sources.schema_registry import (
        MiniSchemaRegistryServer,
    )
    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker, MiniSchemaRegistryServer() as csr:
        broker.create_topic("out_avd", partitions=1)
        s.execute("CREATE TABLE skad_t (id BIGINT, v STRING)")
        s.execute("INSERT INTO skad_t VALUES (1, 'a'), (2, 'b')")
        s.execute(f"CREATE CONNECTION skadb TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute(f"CREATE CONNECTION skadc TO CONFLUENT SCHEMA "
                  f"REGISTRY (URL '{csr.url}')")
        s.execute("CREATE SINK skad FROM skad_t INTO KAFKA "
                  "CONNECTION skadb (TOPIC 'out_avd') KEY (id) "
                  "FORMAT AVRO USING CONFLUENT SCHEMA REGISTRY "
                  "CONNECTION skadc ENVELOPE DEBEZIUM")
        s.execute("DELETE FROM skad_t WHERE id = 1")
        s.execute("INSERT INTO skad_t VALUES (3, 'c')")
        s.execute("UPDATE skad_t SET v = 'B' WHERE id = 2")
        s.execute("CREATE SOURCE skad_back FROM KAFKA CONNECTION skadb "
                  "(TOPIC 'out_avd') FORMAT AVRO USING CONFLUENT "
                  "SCHEMA REGISTRY CONNECTION skadc ENVELOPE DEBEZIUM")
        back = {r.id: r.v
                for r in s.sql("SELECT id, v FROM skad_back").collect()}
        assert back == {2: "B", 3: "c"}
        s.execute("DROP TABLE skad_t")
        for c in ("skadb", "skadc"):
            s.execute(f"DROP CONNECTION {c}")


def test_kafka_sink_emission_is_commit_diff_fed_no_table_scan(spark):
    """Continuous emission consumes the COMMIT'S OWN diff frames — no
    frame produced to the broker may contain an Except (the old
    full-table exceptAll-vs-last-snapshot diff): O(delta) per commit,
    the property that keeps a sink on a 100 TB object affordable."""
    import unittest.mock as mock

    from materialize_spark.sinks import writers

    captured = []
    real = writers.write_kafka_wire

    def spy(frame, bootstrap, topic):
        captured.append(
            frame._jdf.queryExecution().optimizedPlan().toString())
        return real(frame, bootstrap, topic)

    s = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        broker.create_topic("out_nd", partitions=1)
        s.execute("CREATE TABLE sknd_t (id BIGINT, v STRING)")
        s.execute("INSERT INTO sknd_t VALUES (1, 'a')")
        s.execute(f"CREATE CONNECTION skndc TO KAFKA "
                  f"(BROKER '{broker.host}:{broker.port}')")
        s.execute("CREATE SINK sknd FROM sknd_t INTO KAFKA CONNECTION "
                  "skndc (TOPIC 'out_nd') KEY (id) FORMAT JSON "
                  "ENVELOPE UPSERT")
        # _emit_kafka_sinks resolves write_kafka_wire from the writers
        # module at call time, so patching the module attribute is
        # enough to observe every produced frame
        with mock.patch.object(writers, "write_kafka_wire", spy):
            s.execute("INSERT INTO sknd_t VALUES (2, 'b')")
            s.execute("DELETE FROM sknd_t WHERE id = 1")
        assert captured, "emission did not produce"
        for plan in captured:
            assert "Except" not in plan
        s.execute("DROP TABLE sknd_t")
        s.execute("DROP CONNECTION skndc")
