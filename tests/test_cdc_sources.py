"""CREATE SOURCE ... FROM POSTGRES | MYSQL | SQL SERVER through the SQL
front-end: connection → replication artifacts → per-table subsources
holding snapshot ⊎ log (reference sources.rs:694-700 statement shapes).
"""

import pytest

from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


def _write_pg_log(spark, path):
    from materialize_spark.sources.pgoutput import (
        encode_delete, encode_insert, encode_relation, encode_update,
    )
    oid = 9001
    msgs = [
        encode_relation(oid, "public", "fruit",
                        [("id", 23, True), ("name", 25, False)]),
        encode_insert(oid, [1, "apple"]),
        encode_insert(oid, [2, "pear"]),
        encode_update(oid, [1, "APPLE"], old_vals=[1, None],
                      old_is_key_only=True),
        encode_insert(oid, [3, "plum"]),
        encode_delete(oid, [2, None]),
    ]
    spark.createDataFrame(
        [(i + 1, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn long, message binary").write.mode("overwrite").parquet(path)


def test_postgres_source_sql(spark, tmp_path):
    path = str(tmp_path / "pg_log")
    _write_pg_log(spark, path)
    sess = MzSession(spark, SF_DIR)
    sess.execute(f"CREATE CONNECTION pgc TO POSTGRES (log = '{path}')")
    sess.execute("CREATE SOURCE pg FROM POSTGRES CONNECTION pgc "
                 "(PUBLICATION 'mz') FOR ALL TABLES")
    rows = {r.id: r.name
            for r in sess.execute("SELECT * FROM pg_fruit").collect()}
    assert rows == {1: "APPLE", 3: "plum"}
    srcs = {r.name: r.type
            for r in sess.execute("SHOW SOURCES").collect()}
    assert srcs.get("pg") == "postgres"


def test_mysql_source_sql_uses_snapshot_schema(spark, tmp_path):
    from materialize_spark.sources.mysql_binlog import (
        DELETE_ROWS_V2, T_LONGLONG, T_VARCHAR, WRITE_ROWS_V2,
        encode_rows_event, encode_table_map,
    )
    ct, meta = [T_LONGLONG, T_VARCHAR], [0, 255]
    events = [
        encode_table_map(7, "db", "pets", ct, meta),
        encode_rows_event(WRITE_ROWS_V2, 7, [[10, "rex"], [11, "tom"]],
                          ct, meta),
        encode_rows_event(DELETE_ROWS_V2, 7, [[1, "?"]], ct, meta),
    ]
    path = str(tmp_path / "binlog")
    spark.createDataFrame(
        [(i + 1, bytearray(e)) for i, e in enumerate(events)],
        "pos long, event binary").write.mode("overwrite").parquet(path)
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE pets (pet_id BIGINT, pet_name STRING)")
    sess.execute("INSERT INTO pets VALUES (1, 'old'), (2, 'kept')")
    sess.execute(f"CREATE CONNECTION myc TO MYSQL (log = '{path}')")
    sess.execute("CREATE SOURCE my FROM MYSQL CONNECTION myc "
                 "FOR TABLES (pets)")
    rows = {r.pet_id: r.pet_name
            for r in sess.execute("SELECT * FROM my_pets").collect()}
    # snapshot row 1 deleted by the log; names come from the snapshot table
    assert rows == {2: "kept", 10: "rex", 11: "tom"}


def test_mysql_source_requires_snapshot(spark, tmp_path):
    from materialize_spark.sources.mysql_binlog import (
        T_LONGLONG, encode_table_map,
    )
    path = str(tmp_path / "binlog2")
    spark.createDataFrame(
        [(1, bytearray(encode_table_map(8, "db", "ghost",
                                        [T_LONGLONG], [0])))],
        "pos long, event binary").write.mode("overwrite").parquet(path)
    sess = MzSession(spark, SF_DIR)
    sess.execute(f"CREATE CONNECTION myc2 TO MYSQL (log = '{path}')")
    with pytest.raises(KeyError, match="information_schema"):
        sess.execute("CREATE SOURCE my2 FROM MYSQL CONNECTION myc2 "
                     "FOR ALL TABLES")


def test_sqlserver_source_sql(spark, tmp_path):
    from materialize_spark.sources.sqlserver_cdc import (
        OP_DELETE, OP_INSERT, lsn_bytes,
    )
    path = str(tmp_path / "ct")
    spark.createDataFrame(
        [(bytearray(lsn_bytes(1)), bytearray(lsn_bytes(0, 0, 1)),
          OP_INSERT, 5, "e"),
         (bytearray(lsn_bytes(2)), bytearray(lsn_bytes(0, 0, 1)),
          OP_DELETE, 5, "e"),
         (bytearray(lsn_bytes(3)), bytearray(lsn_bytes(0, 0, 1)),
          OP_INSERT, 6, "f")],
        "`__$start_lsn` binary, `__$seqval` binary, `__$operation` int, "
        "k long, v string").write.mode("overwrite").parquet(path)
    sess = MzSession(spark, SF_DIR)
    sess.execute(
        f"CREATE CONNECTION ssc TO SQLSERVER (changes_things = '{path}')")
    sess.execute("CREATE SOURCE ss FROM SQL SERVER CONNECTION ssc "
                 "FOR ALL TABLES")
    rows = {r.k: r.v
            for r in sess.execute("SELECT * FROM ss_things").collect()}
    assert rows == {6: "f"}


def test_for_tables_missing_errors(spark, tmp_path):
    path = str(tmp_path / "pg_log3")
    _write_pg_log(spark, path)
    sess = MzSession(spark, SF_DIR)
    sess.execute(f"CREATE CONNECTION pgc3 TO POSTGRES (log = '{path}')")
    with pytest.raises(KeyError, match="not present"):
        sess.execute("CREATE SOURCE pg3 FROM POSTGRES CONNECTION pgc3 "
                     "FOR TABLES (fruit, nosuch)")


def test_postgres_source_sql_live_wire(spark):
    """CREATE CONNECTION with HOST/PORT dials a real socket: the source
    drains the replication slot via the wire protocol (round-6
    pg_replication.py) instead of reading a log file."""
    from materialize_spark.sources.pg_replication import MiniPostgres
    from materialize_spark.sources.pgoutput import (
        encode_delete, encode_insert, encode_relation,
    )
    oid = 61001
    msgs = [
        encode_relation(oid, "public", "gadgets",
                        [("id", 20, True), ("label", 1043, False)]),
        encode_insert(oid, [1, "gear"]),
        encode_insert(oid, [2, "lever"]),
        encode_delete(oid, [1, None]),
        encode_insert(oid, [3, "cog"]),
    ]
    wal = [(100 + i, m) for i, m in enumerate(msgs)]
    with MiniPostgres(wal) as srv:
        sess = MzSession(spark, SF_DIR)
        sess.execute(
            f"CREATE CONNECTION pglive TO POSTGRES (host = '{srv.host}', "
            f"port = {srv.port}, slot = 'mz_slot', publication = 'mz')")
        sess.execute("CREATE SOURCE pgw FROM POSTGRES CONNECTION pglive "
                     "(PUBLICATION 'mz') FOR ALL TABLES")
        rows = {r.id: r.label for r in
                sess.execute("SELECT * FROM pgw_gadgets").collect()}
        assert rows == {2: "lever", 3: "cog"}


def test_mysql_source_sql_live_wire(spark):
    """MySQL flavor over a real socket: handshake + COM_BINLOG_DUMP with
    CRC32 checksums (round-6 mysql_wire.py)."""
    from materialize_spark.sources.mysql_binlog import (
        T_LONGLONG, T_VARCHAR, WRITE_ROWS_V2, DELETE_ROWS_V2,
        encode_format_description, encode_rows_event, encode_table_map,
        with_crc32,
    )
    from materialize_spark.sources.mysql_wire import MiniMySQL
    tid = 31
    ct, md = [T_LONGLONG, T_VARCHAR], [0, 400]
    events = [encode_format_description("crc32")] + [with_crc32(e) for e in [
        encode_table_map(tid, "db", "widgets", ct, md),
        encode_rows_event(WRITE_ROWS_V2, tid,
                          [[1, "bolt"], [2, "nut"]], ct, md),
        encode_rows_event(DELETE_ROWS_V2, tid, [[1, "bolt"]], ct, md),
    ]]
    with MiniMySQL(events) as srv:
        sess = MzSession(spark, SF_DIR)
        sess.execute("CREATE TABLE widgets (id BIGINT, label TEXT)")
        sess.execute(
            f"CREATE CONNECTION mylive TO MYSQL (host = '{srv.host}', "
            f"port = {srv.port})")
        sess.execute("CREATE SOURCE myw FROM MYSQL CONNECTION mylive "
                     "FOR TABLES (widgets)")
        rows = {r.id: r.label for r in
                sess.execute("SELECT * FROM myw_widgets").collect()}
        assert rows == {2: "nut"}


def test_sqlserver_source_sql_live_wire(spark):
    """SQL Server flavor over a real TDS socket: PRELOGIN/LOGIN7 +
    SQL_BATCH change-table reads (round-6 tds_wire.py)."""
    from materialize_spark.sources.sqlserver_cdc import (
        OP_DELETE, OP_INSERT, lsn_bytes,
    )
    from materialize_spark.sources.tds_wire import MiniSqlServer
    schema = [("__$start_lsn", "varbinary"), ("__$seqval", "varbinary"),
              ("__$operation", "int"), ("id", "bigint"),
              ("name", "nvarchar")]
    rows = [
        (lsn_bytes(1), lsn_bytes(0, 0, 1), OP_INSERT, 1, "one"),
        (lsn_bytes(1), lsn_bytes(0, 0, 2), OP_INSERT, 2, "two"),
        (lsn_bytes(2), lsn_bytes(0, 0, 1), OP_DELETE, 1, "one"),
    ]
    with MiniSqlServer({"cdc.things_CT": (schema, rows)}) as srv:
        sess = MzSession(spark, SF_DIR)
        sess.execute(
            f"CREATE CONNECTION sqlive TO SQLSERVER (host = '{srv.host}', "
            f"port = {srv.port})")
        sess.execute("CREATE SOURCE ssw FROM SQL SERVER CONNECTION sqlive "
                     "FOR TABLES (things)")
        rows_out = {r.id: r.name for r in
                    sess.execute("SELECT * FROM ssw_things").collect()}
        assert rows_out == {2: "two"}


def test_validate_connection(spark):
    """VALIDATE CONNECTION dials the endpoint now: success against a
    live MiniBroker, a clear error against a dead port, and file-backed
    connections validate trivially."""
    import pytest

    from materialize_spark.sources.kafka_wire import MiniBroker

    sess = MzSession(spark, SF_DIR)
    with MiniBroker() as broker:
        sess.execute(
            f"CREATE CONNECTION live TO KAFKA "
            f"(host = '{broker.host}', port = '{broker.port}')")
        assert sess.execute("VALIDATE CONNECTION live") is None
    sess.execute(
        "CREATE CONNECTION dead TO KAFKA (host = '127.0.0.1', "
        "port = '9')")  # discard port: nothing listens
    with pytest.raises(ConnectionError, match="failed validation"):
        sess.execute("VALIDATE CONNECTION dead")
    with pytest.raises(KeyError, match="unknown connection"):
        sess.execute("VALIDATE CONNECTION nope")
    sess.execute("CREATE CONNECTION filec TO POSTGRES (log = '/tmp/x')")
    assert sess.execute("VALIDATE CONNECTION filec") is None


def test_show_subsources(spark, tmp_path):
    path = str(tmp_path / "pg_log_ss")
    _write_pg_log(spark, path)
    sess = MzSession(spark, SF_DIR)
    sess.execute(f"CREATE CONNECTION ssc TO POSTGRES (log = '{path}')")
    sess.execute("CREATE SOURCE pgs FROM POSTGRES CONNECTION ssc "
                 "(PUBLICATION 'mz') FOR ALL TABLES")
    rows = [(r.name, r.source, r.type) for r in
            sess.execute("SHOW SUBSOURCES").collect()]
    assert ("pgs_fruit", "pgs", "subsource") in rows
    rows2 = sess.execute("SHOW SUBSOURCES FROM pgs").collect()
    assert [r.name for r in rows2] == ["pgs_fruit"]
    import pytest as _pytest
    with _pytest.raises(KeyError, match="unknown source"):
        sess.execute("SHOW SUBSOURCES FROM nope")


def test_kafka_source_sql_live_wire(spark):
    """CREATE SOURCE ... FROM KAFKA CONNECTION — the reference's primary
    source statement, over a real wire broker: FORMAT JSON + both
    envelopes, with the topic drained per-partition by Spark tasks."""
    import json as _json

    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    with MiniBroker() as b:
        b.create_topic("clicks", partitions=2)
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("clicks", 0, [
                (b"u1", _json.dumps({"page": "a"}).encode(), 1),
                (b"u1", _json.dumps({"page": "b"}).encode(), 2),
                (b"u2", _json.dumps({"page": "c"}).encode(), 3),
            ])
            c.produce("clicks", 1, [
                (b"u3", _json.dumps({"page": "d"}).encode(), 4),
                (b"u3", None, 5),  # tombstone: deletes u3 under UPSERT
            ])
        sess = MzSession(spark, SF_DIR)
        sess.execute(
            f"CREATE CONNECTION kwire TO KAFKA (host = '{b.host}', "
            f"port = {b.port})")
        sess.execute("CREATE SOURCE clicks_all FROM KAFKA CONNECTION "
                     "kwire (TOPIC 'clicks') FORMAT JSON ENVELOPE NONE")
        sess.execute("CREATE SOURCE clicks_cur FROM KAFKA CONNECTION "
                     "kwire (TOPIC 'clicks') FORMAT JSON ENVELOPE UPSERT")
        # ENVELOPE NONE keeps every record (incl. the tombstone row)
        assert sess.sql("SELECT count(*) AS n FROM clicks_all"
                        ).first().n == 5
        # UPSERT: latest per key, tombstoned key gone
        cur = {r.key: r.data for r in
               sess.sql("SELECT key, data FROM clicks_cur").collect()}
        assert set(cur) == {"u1", "u2"}
        assert _json.loads(cur["u1"]) == {"page": "b"}
        # the JSON payload is queryable through the jsonb operators
        page = sess.sql("SELECT data ->> 'page' AS p FROM clicks_cur "
                        "WHERE key = 'u2'").first().p
        assert page == "c"
        # introspection: it is a SOURCE, of kafka flavor
        kinds = {r.name: r.type
                 for r in sess.execute("SHOW OBJECTS").collect()}
        assert kinds.get("clicks_cur") == "source"
        flavors = {r.name: r.type
                   for r in sess.execute("SHOW SOURCES").collect()}
        assert flavors.get("clicks_cur") == "kafka"


def test_kafka_source_sql_secured(spark):
    """The same statement against a TLS + SASL/SCRAM broker, credentials
    carried by the CREATE CONNECTION options."""
    import json as _json

    import pytest as _pytest

    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    try:
        from tests.tlsutil import cert_files, client_ctx, server_ctx
        sctx, cctx = server_ctx(), client_ctx()
        cafile, _ = cert_files()
    except Exception:
        _pytest.skip("cert tooling unavailable")
    with MiniBroker(ssl_context=sctx,
                    sasl_users={"svc": "pw"}) as b:
        b.create_topic("sec", partitions=1)
        with KafkaWireClient(b.host, b.port, ssl_context=cctx,
                             sasl=("SCRAM-SHA-256", "svc", "pw")) as c:
            c.produce("sec", 0, [(b"k", _json.dumps({"v": 1}).encode(),
                                  1)])
        sess = MzSession(spark, SF_DIR)
        sess.execute("CREATE SECRET ksecret AS 'pw'")
        sess.execute(
            f"CREATE CONNECTION ksec TO KAFKA (host = '{b.host}', "
            f"port = {b.port}, ssl = 'true', ssl_ca = '{cafile}', "
            f"sasl_mechanism = 'SCRAM-SHA-256', "
            f"sasl_username = 'svc', sasl_password = SECRET ksecret)")
        sess.execute("CREATE SOURCE sec_src FROM KAFKA CONNECTION ksec "
                     "(TOPIC 'sec') FORMAT JSON")
        assert sess.sql("SELECT count(*) AS n FROM sec_src").first().n == 1


def test_kafka_source_unknown_connection_errors(spark):
    sess = MzSession(spark, SF_DIR)
    import pytest as _pytest
    with _pytest.raises(KeyError, match="unknown connection"):
        sess.execute("CREATE SOURCE nos FROM KAFKA CONNECTION nothere "
                     "(TOPIC 't')")


def test_mysql_source_sql_with_credentials(spark):
    """Live MySQL CDC source with mysql_native_password credentials from
    CREATE CONNECTION (password via SECRET)."""
    from materialize_spark.sources.mysql_binlog import (
        T_LONGLONG, T_VARCHAR, WRITE_ROWS_V2, encode_format_description,
        encode_rows_event, encode_table_map, with_crc32,
    )
    from materialize_spark.sources.mysql_wire import MiniMySQL
    tid = 77
    ct, md = [T_LONGLONG, T_VARCHAR], [0, 400]
    events = [encode_format_description("crc32")] + [with_crc32(e) for e in [
        encode_table_map(tid, "db", "parts_t", ct, md),
        encode_rows_event(WRITE_ROWS_V2, tid, [[1, "bolt"]], ct, md),
    ]]
    with MiniMySQL(events, auth=("repl", "cdc-pw")) as srv:
        sess = MzSession(spark, SF_DIR)
        sess.execute("CREATE TABLE parts_t (id BIGINT, label TEXT)")
        sess.execute("CREATE SECRET mypw AS 'cdc-pw'")
        sess.execute(
            f"CREATE CONNECTION myauth TO MYSQL (host = '{srv.host}', "
            f"port = {srv.port}, user = 'repl', password = SECRET mypw)")
        sess.execute("CREATE SOURCE myp FROM MYSQL CONNECTION myauth "
                     "FOR TABLES (parts_t)")
        rows = {r.id: r.label for r in
                sess.execute("SELECT * FROM myp_parts_t").collect()}
        assert rows == {1: "bolt"}
        # wrong credentials fail cleanly
        sess.execute(
            f"CREATE CONNECTION mybad TO MYSQL (host = '{srv.host}', "
            f"port = {srv.port}, user = 'repl', password = 'wrong')")
        import pytest as _pytest
        with _pytest.raises(ValueError, match="authentication failed"):
            sess.execute("CREATE SOURCE myq FROM MYSQL CONNECTION mybad "
                         "FOR TABLES (parts_t)")


def test_kafka_source_sql_envelope_debezium(spark):
    """FORMAT JSON ENVELOPE DEBEZIUM over a wire broker: change events
    {before, after, op} consolidate to the current collection — THE
    reference combo for database->Kafka pipelines."""
    import json as _json

    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )

    def ev(op, before=None, after=None):
        return _json.dumps({"op": op, "before": before,
                            "after": after}).encode()

    with MiniBroker() as b:
        b.create_topic("dbz", partitions=1)
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("dbz", 0, [
                (b"1", ev("c", after={"id": 1, "name": "ada"}), 1),
                (b"2", ev("c", after={"id": 2, "name": "bob"}), 2),
                (b"1", ev("u", before={"id": 1, "name": "ada"},
                          after={"id": 1, "name": "ada2"}), 3),
                (b"2", ev("d", before={"id": 2, "name": "bob"}), 4),
            ])
        sess = MzSession(spark, SF_DIR)
        sess.execute(
            f"CREATE CONNECTION kdbz TO KAFKA (host = '{b.host}', "
            f"port = {b.port})")
        sess.execute("CREATE SOURCE dbz_cur FROM KAFKA CONNECTION kdbz "
                     "(TOPIC 'dbz') FORMAT JSON ENVELOPE DEBEZIUM")
        rows = {(r.id, r.name) for r in
                sess.sql("SELECT id, name FROM dbz_cur").collect()}
        assert rows == {(1, "ada2")}
        # envelope requires JSON
        import pytest as _pytest
        with _pytest.raises(ValueError, match="requires FORMAT JSON"):
            sess.execute("CREATE SOURCE dbz_b FROM KAFKA CONNECTION "
                         "kdbz (TOPIC 'dbz') FORMAT BYTES "
                         "ENVELOPE DEBEZIUM")


def test_kafka_source_ticks_feed_delta_mvs_and_subscriptions(spark):
    """Continuous ingestion: records produced AFTER CREATE SOURCE
    arrive via tick_sources() as ordinary commits — the delta MV over
    the source and an open subscription both update; idle ticks are
    no-ops."""
    import json as _json

    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    s = MzSession(spark, "/root/testdata/sf0.001")
    with MiniBroker() as b:
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("tick_m", 0,
                      [(b"k1", _json.dumps({"v": 1}).encode(), 1)])
        s.execute(f"CREATE CONNECTION tkc TO KAFKA "
                  f"(BROKER '{b.host}:{b.port}')")
        s.execute("CREATE SOURCE tick_ev FROM KAFKA CONNECTION tkc "
                  "(TOPIC 'tick_m') FORMAT JSON")
        s.execute("CREATE MATERIALIZED VIEW tick_mv WITH (MAINTENANCE "
                  "'delta') AS SELECT key, COUNT(*) AS n FROM tick_ev "
                  "GROUP BY key")
        sid, _first, _ = s.subscribe_open("SUBSCRIBE tick_ev")
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("tick_m", 0,
                      [(b"k1", _json.dumps({"v": 2}).encode(), 2),
                       (b"k2", _json.dumps({"v": 9}).encode(), 3)])
        assert s.tick_sources() == ["tick_ev"]
        got = {r.key: r.n
               for r in s.sql("SELECT * FROM tick_mv").collect()}
        assert got == {"k1": 2, "k2": 1}
        delta = s.subscribe_poll(sid)
        assert sorted((r.key, r.diff) for r in delta.collect()) == \
            [("k1", 1), ("k2", 1)]
        assert s.tick_sources() == []  # idle: nothing re-ingested
        s.subscribe_close(sid)


def test_kafka_source_upsert_ticks_merge_keyed(spark):
    """UPSERT ticks merge keyed against the current collection:
    updates replace, tombstones delete, untouched keys survive."""
    import json as _json

    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    s = MzSession(spark, "/root/testdata/sf0.001")
    with MiniBroker() as b:
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("tick_u", 0,
                      [(b"a", _json.dumps({"v": 1}).encode(), 1),
                       (b"c", _json.dumps({"v": 3}).encode(), 2)])
        s.execute(f"CREATE CONNECTION tku TO KAFKA "
                  f"(BROKER '{b.host}:{b.port}')")
        s.execute("CREATE SOURCE tick_us FROM KAFKA CONNECTION tku "
                  "(TOPIC 'tick_u') FORMAT JSON ENVELOPE UPSERT")
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("tick_u", 0,
                      [(b"a", _json.dumps({"v": 5}).encode(), 3),
                       (b"b", _json.dumps({"v": 7}).encode(), 4),
                       (b"a", None, 5)])  # update then tombstone
        s.tick_sources()
        got = {r.key: _json.loads(r.data)["v"] for r in
               s.sql("SELECT key, data FROM tick_us").collect()}
        assert got == {"b": 7, "c": 3}  # c untouched, a gone, b new


def test_postgres_source_ticks_apply_new_wal(spark, tmp_path):
    """Continuous replication: frames appended to the slot/log AFTER
    CREATE SOURCE arrive via tick_sources() — the subsource, a delta
    MV over it, and an open subscription all update; the LSN frontier
    advances (idle ticks no-op)."""
    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.pgoutput import (
        encode_delete, encode_insert, encode_relation, encode_update,
    )
    OID = 910
    rel = encode_relation(OID, "public", "accts",
                          [("id", 23, True), ("name", 25, False)])
    logdir = str(tmp_path / "wal")
    spark.createDataFrame(
        [(1, bytearray(rel)),
         (2, bytearray(encode_insert(OID, [1, "alice"]))),
         (3, bytearray(encode_insert(OID, [2, "bob"])))],
        "lsn long, message binary").write.mode("append").parquet(logdir)
    s = MzSession(spark, "/root/testdata/sf0.001")
    s.execute(f"CREATE CONNECTION treplc TO POSTGRES (log = '{logdir}')")
    s.execute("CREATE SOURCE tpg FROM POSTGRES CONNECTION treplc "
              "(PUBLICATION 'mz') FOR ALL TABLES")
    s.execute("CREATE MATERIALIZED VIEW tacct_n WITH (MAINTENANCE "
              "'delta') AS SELECT name, COUNT(*) AS n FROM tpg_accts "
              "GROUP BY name")
    sid, _f, _ = s.subscribe_open("SUBSCRIBE tpg_accts")
    spark.createDataFrame(
        [(4, bytearray(encode_update(OID, [2, "bobby"],
                                     old_vals=[2, None],
                                     old_is_key_only=True))),
         (5, bytearray(encode_insert(OID, [3, "carol"]))),
         (6, bytearray(encode_delete(OID, [1, None])))],
        "lsn long, message binary").write.mode("append").parquet(logdir)
    assert "tpg" in s.tick_sources()
    got = sorted((r.id, r.name)
                 for r in s.sql("SELECT * FROM tpg_accts").collect())
    assert got == [(2, "bobby"), (3, "carol")]
    mv = sorted((r.name, r.n)
                for r in s.sql("SELECT * FROM tacct_n").collect())
    assert mv == [("bobby", 1), ("carol", 1)]
    delta = s.subscribe_poll(sid)
    assert sorted((r.id, r.name, r.diff) for r in delta.collect()) == [
        (1, "alice", -1), (2, "bob", -1), (2, "bobby", 1),
        (3, "carol", 1)]
    assert s.tick_sources() == []  # frontier advanced: idle no-op
    s.subscribe_close(sid)


def test_mysql_source_ticks_apply_new_binlog(spark, tmp_path):
    """Binlog events appended after CREATE arrive via tick_sources;
    the position frontier advances."""
    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.mysql_binlog import (
        DELETE_ROWS_V2, T_LONGLONG, T_VARCHAR, WRITE_ROWS_V2,
        encode_rows_event, encode_table_map,
    )
    ct = [T_LONGLONG, T_VARCHAR]
    meta = [0, 255]
    TID = 78
    logdir = str(tmp_path / "binlog")
    spark.createDataFrame(
        [(1, bytearray(encode_table_map(TID, "public", "tpets", ct,
                                        meta))),
         (2, bytearray(encode_rows_event(WRITE_ROWS_V2, TID,
                                         [[1, "rex"]], ct, meta)))],
        "pos long, event binary").write.mode("append").parquet(logdir)
    s = MzSession(spark, "/root/testdata/sf0.001")
    s.execute("CREATE TABLE tpets (id BIGINT, name STRING)")
    s.execute(f"CREATE CONNECTION tmyc TO MYSQL (log = '{logdir}')")
    s.execute("CREATE SOURCE tmy FROM MYSQL CONNECTION tmyc "
              "FOR ALL TABLES")
    spark.createDataFrame(
        [(3, bytearray(encode_rows_event(WRITE_ROWS_V2, TID,
                                         [[2, "max"]], ct, meta))),
         (4, bytearray(encode_rows_event(DELETE_ROWS_V2, TID,
                                         [[1, "rex"]], ct, meta)))],
        "pos long, event binary").write.mode("append").parquet(logdir)
    assert "tmy" in s.tick_sources()
    got = sorted((r.id, r.name)
                 for r in s.sql("SELECT * FROM tmy_tpets").collect())
    assert got == [(2, "max")]
    assert "tmy" not in s.tick_sources()


def test_sqlserver_source_ticks_apply_new_changes(spark, tmp_path):
    """Change-table rows appended after CREATE arrive via ticks; the
    per-table LSN frontier advances (hex-string order)."""
    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.sqlserver_cdc import (
        OP_DELETE, OP_INSERT, lsn_bytes,
    )
    DDL = ("`__$start_lsn` binary, `__$seqval` binary, "
           "`__$operation` int, id long, color string")
    ctdir = str(tmp_path / "ct")
    spark.createDataFrame(
        [(bytearray(lsn_bytes(1)), bytearray(lsn_bytes(0, 0, 1)),
          OP_INSERT, 1, "red")], DDL
    ).write.mode("append").parquet(ctdir)
    s = MzSession(spark, "/root/testdata/sf0.001")
    s.execute(f"CREATE CONNECTION tssc TO SQL SERVER "
              f"(changes_tpaint = '{ctdir}')")
    s.execute("CREATE SOURCE tss FROM SQL SERVER CONNECTION tssc "
              "FOR ALL TABLES")
    spark.createDataFrame(
        [(bytearray(lsn_bytes(2)), bytearray(lsn_bytes(0, 0, 1)),
          OP_INSERT, 2, "blue"),
         (bytearray(lsn_bytes(3)), bytearray(lsn_bytes(0, 0, 1)),
          OP_DELETE, 1, "red")], DDL
    ).write.mode("append").parquet(ctdir)
    assert "tss" in s.tick_sources()
    got = sorted((r.id, r.color)
                 for r in s.sql("SELECT * FROM tss_tpaint").collect())
    assert got == [(2, "blue")]
    assert "tss" not in s.tick_sources()


def test_postgres_source_through_ssh_tunnel(spark):
    """CREATE SOURCE ... FROM POSTGRES CONNECTION where the connection
    says SSH TUNNEL tun: the replication wire dials THROUGH the SSH
    peer's direct-tcpip channel (reference connections.rs SshTunnel +
    ssh-util) and the drained WAL matches the direct-dial result."""
    import base64

    from materialize_spark.sources.pg_replication import MiniPostgres
    from materialize_spark.sources.pgoutput import (
        encode_delete, encode_insert, encode_relation,
    )
    from materialize_spark.sources.ssh_tunnel import SshTunnelServer
    oid = 61077
    msgs = [
        encode_relation(oid, "public", "tunneled",
                        [("id", 20, True), ("label", 1043, False)]),
        encode_insert(oid, [1, "alpha"]),
        encode_insert(oid, [2, "beta"]),
        encode_delete(oid, [1, None]),
        encode_insert(oid, [3, "gamma"]),
    ]
    wal = [(500 + i, m) for i, m in enumerate(msgs)]
    with MiniPostgres(wal) as pg, \
            SshTunnelServer({"mz": "pw"}) as bastion:
        hk = base64.b64encode(bastion.host_public_key).decode()
        sess = MzSession(spark, SF_DIR)
        sess.execute("CREATE SECRET tpw AS 'pw'")
        sess.execute(
            f"CREATE CONNECTION bast TO SSH TUNNEL (HOST "
            f"'{bastion.host}', PORT {bastion.port}, USER 'mz', "
            f"PASSWORD SECRET tpw, HOST_KEY '{hk}')")
        sess.execute(
            f"CREATE CONNECTION pgtun TO POSTGRES (host = '{pg.host}',"
            f" port = {pg.port}, slot = 'mz_slot', publication = 'mz',"
            f" SSH TUNNEL bast)")
        sess.execute("CREATE SOURCE pgt FROM POSTGRES CONNECTION pgtun"
                     " (PUBLICATION 'mz') FOR ALL TABLES")
        rows = {r.id: r.label for r in
                sess.execute("SELECT * FROM pgt_tunneled").collect()}
        assert rows == {2: "beta", 3: "gamma"}


def test_mysql_source_through_ssh_tunnel(spark):
    """MySQL replica wire through the SSH tunnel: handshake +
    COM_BINLOG_DUMP forwarded over a direct-tcpip channel."""
    from materialize_spark.sources.mysql_binlog import (
        T_LONGLONG, T_VARCHAR, WRITE_ROWS_V2, DELETE_ROWS_V2,
        encode_format_description, encode_rows_event, encode_table_map,
        with_crc32,
    )
    from materialize_spark.sources.mysql_wire import MiniMySQL
    from materialize_spark.sources.ssh_tunnel import SshTunnelServer
    tid = 77
    ct, md = [T_LONGLONG, T_VARCHAR], [0, 400]
    events = [encode_format_description("crc32")] + [
        with_crc32(e) for e in [
            encode_table_map(tid, "db", "tcogs", ct, md),
            encode_rows_event(WRITE_ROWS_V2, tid,
                              [[1, "bolt"], [2, "nut"]], ct, md),
            encode_rows_event(DELETE_ROWS_V2, tid, [[1, "bolt"]],
                              ct, md),
        ]]
    with MiniMySQL(events) as my, \
            SshTunnelServer({"mz": "pw"}) as bastion:
        sess = MzSession(spark, SF_DIR)
        sess.execute("CREATE TABLE tcogs (id BIGINT, label TEXT)")
        sess.execute(
            f"CREATE CONNECTION mbast TO SSH TUNNEL (HOST "
            f"'{bastion.host}', PORT {bastion.port}, USER 'mz', "
            f"PASSWORD 'pw')")
        sess.execute(
            f"CREATE CONNECTION mytun TO MYSQL (host = '{my.host}', "
            f"port = {my.port}, SSH TUNNEL mbast)")
        sess.execute("CREATE SOURCE myt FROM MYSQL CONNECTION mytun "
                     "FOR TABLES (tcogs)")
        rows = {r.id: r.label for r in
                sess.execute("SELECT * FROM myt_tcogs").collect()}
        assert rows == {2: "nut"}
