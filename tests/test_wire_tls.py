"""TLS on every wire client ↔ mini peer, plus CREATE CONNECTION SSL
options.

Reference: all external connections carry TLS configuration
(/root/reference/src/storage-types/src/connections.rs — Kafka broker TLS,
Postgres/MySQL TlsMode); validation exercises it. Python ``ssl`` wraps
the same sockets here. Kafka uses a TLS listener (TLS from byte 0, like a
real broker's SSL endpoint); PG replication does the real SSLRequest
dance; the MySQL/TDS mini peers expose TLS listeners (documented
simplification of their in-protocol upgrades).
"""

import pytest
from pyspark.sql import functions as F

from tests.tlsutil import cert_files, client_ctx, server_ctx

SF_DIR = "/root/testdata/sf0.001"


def test_kafka_tls_produce_fetch():
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    with MiniBroker(ssl_context=server_ctx()) as broker:
        broker.create_topic("enc", partitions=1)
        with KafkaWireClient(broker.host, broker.port,
                             ssl_context=client_ctx()) as c:
            base = c.produce("enc", 0, [(b"k", b"sealed", 1)])
            assert base == 0
            _hw, recs = c.fetch("enc", 0, offset=0)
            assert [(k, v) for _o, k, v, _t in recs] == [(b"k", b"sealed")]


def test_kafka_tls_verified_chain():
    """CERT_REQUIRED against the self-signed cert as trust root."""
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    with MiniBroker(ssl_context=server_ctx()) as broker:
        broker.create_topic("enc", partitions=1)
        with KafkaWireClient(broker.host, broker.port,
                             ssl_context=client_ctx(verify=True)) as c:
            assert c.api_versions()


def test_kafka_plaintext_client_against_tls_broker_fails():
    import socket
    import struct

    from materialize_spark.sources.kafka_wire import MiniBroker
    with MiniBroker(ssl_context=server_ctx()) as broker:
        s = socket.create_connection((broker.host, broker.port), timeout=5)
        try:
            s.sendall(struct.pack(">i", 4) + b"\x00\x12\x00\x00")
            s.settimeout(3)
            got = s.recv(64)
        except (ConnectionError, OSError):
            got = b""
        finally:
            s.close()
        # a TLS endpoint never answers a plaintext Kafka frame with a
        # valid response; it either alerts (0x15...) or drops
        assert not got or got[0:1] == b"\x15"


def test_kafka_distributed_read_over_tls(spark):
    """read_kafka_wire ships a PICKLABLE ssl conf into executor tasks and
    builds the SSLContext per task."""
    from materialize_spark.sources.kafka_wire import (
        MiniBroker, read_kafka_wire,
    )
    certf, _ = cert_files()
    with MiniBroker(ssl_context=server_ctx()) as broker:
        broker.create_topic("dist", partitions=2)
        broker.append("dist", 0, [(b"a", b"1", 1)])
        broker.append("dist", 1, [(b"b", b"2", 2)])
        df = read_kafka_wire(
            spark, f"{broker.host}:{broker.port}", "dist",
            ssl_conf={"cafile": certf, "insecure": True})
        got = {bytes(r.key): bytes(r.value) for r in df.collect()}
        assert got == {b"a": b"1", b"b": b"2"}


def test_pg_replication_tls_sslrequest_dance():
    from materialize_spark.sources.pg_replication import (
        MiniPostgres, PgReplicationClient,
    )
    wal = [(100, b"m1"), (101, b"m2")]
    with MiniPostgres(wal, ssl_context=server_ctx()) as srv:
        with PgReplicationClient(srv.host, srv.port,
                                 ssl_context=client_ctx()) as c:
            frames = c.start_replication("s", "pub", start_lsn=0)
        assert [(l, bytes(m)) for l, m in frames] == wal


def test_pg_replication_plaintext_unchanged():
    from materialize_spark.sources.pg_replication import (
        MiniPostgres, PgReplicationClient,
    )
    wal = [(7, b"x")]
    with MiniPostgres(wal) as srv:
        with PgReplicationClient(srv.host, srv.port) as c:
            frames = c.start_replication("s", "pub", start_lsn=0)
        assert [(l, bytes(m)) for l, m in frames] == wal


def test_pg_client_refused_tls_raises():
    from materialize_spark.sources.pg_replication import (
        MiniPostgres, PgReplicationClient,
    )
    with MiniPostgres([(1, b"m")]) as srv:  # plaintext-only peer
        with pytest.raises(ValueError, match="refused TLS"):
            PgReplicationClient(srv.host, srv.port,
                                ssl_context=client_ctx())


def test_mysql_binlog_tls():
    from materialize_spark.sources.mysql_binlog import (
        WRITE_ROWS_V2, encode_format_description, encode_rows_event,
        encode_table_map, with_crc32,
    )
    from materialize_spark.sources.mysql_wire import (
        MiniMySQL, MySQLBinlogClient,
    )
    from materialize_spark.sources.mysql_binlog import T_LONGLONG
    events = [encode_format_description("crc32")] + [with_crc32(e) for e in [
        encode_table_map(9, "db", "t", [T_LONGLONG], [0]),
        encode_rows_event(WRITE_ROWS_V2, 9, [[5]], [T_LONGLONG], [0]),
    ]]
    with MiniMySQL(events, ssl_context=server_ctx()) as srv:
        with MySQLBinlogClient(srv.host, srv.port,
                               ssl_context=client_ctx()) as c:
            got = c.binlog_dump("", 4)
        assert len(got) == len(events)


def test_tds_query_tls():
    from materialize_spark.sources.tds_wire import (
        MiniSqlServer, SqlServerWireClient,
    )
    schema = [("id", "bigint"), ("name", "nvarchar")]
    rows = [(1, "one"), (2, "two")]
    with MiniSqlServer({"dbo.t": (schema, rows)},
                       ssl_context=server_ctx()) as srv:
        with SqlServerWireClient(srv.host, srv.port,
                                 ssl_context=client_ctx()) as c:
            names, out = c.query("SELECT * FROM dbo.t")
        assert names == ["id", "name"] and len(out) == 2


def test_connection_ssl_conf_parsing():
    from materialize_spark.sources.tlsconf import connection_ssl_conf
    assert connection_ssl_conf({"host": "h"}) is None
    assert connection_ssl_conf({"ssl": "true"}) == {
        "cafile": None, "verify_hostname": False, "insecure": True}
    c = connection_ssl_conf({"ssl_mode": "verify-ca", "ssl_ca": "/ca.pem"})
    assert c == {"cafile": "/ca.pem", "verify_hostname": False,
                 "insecure": False}
    assert connection_ssl_conf(
        {"ssl_mode": "verify-full", "ssl_ca": "/ca.pem"}
    )["verify_hostname"] is True


def test_validate_connection_over_tls(spark):
    """CREATE CONNECTION ... (SSL ...) + VALIDATE dials TLS."""
    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.kafka_wire import MiniBroker
    certf, _ = cert_files()
    sess = MzSession(spark, SF_DIR)
    with MiniBroker(ssl_context=server_ctx()) as broker:
        sess.execute(
            f"CREATE CONNECTION ktls TO KAFKA (host = '{broker.host}', "
            f"port = {broker.port}, ssl = 'true', ssl_ca = '{certf}')")
        sess.execute("VALIDATE CONNECTION ktls")  # no raise = pass
    with MiniBroker() as plain:  # plaintext peer still validates
        sess.execute(
            f"CREATE CONNECTION kplain TO KAFKA (host = '{plain.host}', "
            f"port = {plain.port})")
        sess.execute("VALIDATE CONNECTION kplain")


# --------------------------------------------------------------------------
# Kafka SASL (SaslHandshake + SaslAuthenticate: PLAIN and SCRAM-SHA-256)

def test_kafka_sasl_plain():
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    with MiniBroker(sasl_users={"svc": "pw1"}) as broker:
        broker.create_topic("s1", partitions=1)
        with KafkaWireClient(broker.host, broker.port,
                             sasl=("PLAIN", "svc", "pw1")) as c:
            c.produce("s1", 0, [(b"k", b"v", 1)])
            _hw, recs = c.fetch("s1", 0, offset=0)
            assert [(k, v) for _o, k, v, _t in recs] == [(b"k", b"v")]


def test_kafka_sasl_scram():
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    with MiniBroker(sasl_users={"svc": "pw1"}) as broker:
        broker.create_topic("s2", partitions=1)
        with KafkaWireClient(broker.host, broker.port,
                             sasl=("SCRAM-SHA-256", "svc", "pw1")) as c:
            assert c.api_versions()


def test_kafka_sasl_wrong_password_and_unknown_user():
    import pytest as _pytest

    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    with MiniBroker(sasl_users={"svc": "pw1"}) as broker:
        for mech in ("PLAIN", "SCRAM-SHA-256"):
            with _pytest.raises(ValueError,
                                match="authentication failed"):
                KafkaWireClient(broker.host, broker.port,
                                sasl=(mech, "svc", "nope"))
            with _pytest.raises(ValueError,
                                match="authentication failed"):
                KafkaWireClient(broker.host, broker.port,
                                sasl=(mech, "ghost", "pw1"))


def test_kafka_unauthenticated_connection_closed():
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    with MiniBroker(sasl_users={"svc": "pw1"}) as broker:
        broker.create_topic("s3", partitions=1)
        c = KafkaWireClient(broker.host, broker.port)  # no SASL
        with pytest.raises((ConnectionError, ValueError)):
            c.metadata(["s3"])
        c.close()


def test_kafka_sasl_over_tls():
    """The production posture: TLS listener + SCRAM credentials."""
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    with MiniBroker(ssl_context=server_ctx(),
                    sasl_users={"svc": "pw1"}) as broker:
        broker.create_topic("s4", partitions=1)
        with KafkaWireClient(broker.host, broker.port,
                             ssl_context=client_ctx(),
                             sasl=("SCRAM-SHA-256", "svc", "pw1")) as c:
            c.produce("s4", 0, [(b"a", b"b", 1)])
            _hw, recs = c.fetch("s4", 0, offset=0)
            assert len(recs) == 1


# --------------------------------------------------------------------------
# MySQL native-password and TDS LOGIN7 auth on the mini peers

def test_mysql_native_password_roundtrip():
    from materialize_spark.sources.mysql_binlog import (
        T_LONGLONG, WRITE_ROWS_V2, encode_format_description,
        encode_rows_event, encode_table_map, with_crc32,
    )
    from materialize_spark.sources.mysql_wire import (
        MiniMySQL, MySQLBinlogClient,
    )
    events = [encode_format_description("crc32")] + [with_crc32(e) for e in [
        encode_table_map(9, "db", "t", [T_LONGLONG], [0]),
        encode_rows_event(WRITE_ROWS_V2, 9, [[5]], [T_LONGLONG], [0]),
    ]]
    with MiniMySQL(events, auth=("repl", "replica-pw")) as srv:
        with MySQLBinlogClient(srv.host, srv.port, user="repl",
                               password="replica-pw") as c:
            assert len(c.binlog_dump("", 4)) == len(events)
        for user, pw in (("repl", "wrong"), ("ghost", "replica-pw"),
                         ("repl", None)):
            with pytest.raises(ValueError,
                               match="authentication failed"):
                MySQLBinlogClient(srv.host, srv.port, user=user,
                                  password=pw)


def test_mysql_trust_mode_unchanged():
    from materialize_spark.sources.mysql_binlog import (
        encode_format_description,
    )
    from materialize_spark.sources.mysql_wire import (
        MiniMySQL, MySQLBinlogClient,
    )
    with MiniMySQL([encode_format_description("crc32")]) as srv:
        with MySQLBinlogClient(srv.host, srv.port) as c:
            assert len(c.binlog_dump("", 4)) == 1


def test_tds_login7_password_roundtrip():
    from materialize_spark.sources.tds_wire import (
        MiniSqlServer, SqlServerWireClient, _tds_password,
        _tds_password_decode,
    )
    # the swizzle round-trips (MS-TDS 2.2.6.4)
    assert _tds_password_decode(_tds_password("s3cr3t!")) == "s3cr3t!"
    schema = [("id", "bigint")]
    with MiniSqlServer({"dbo.t": (schema, [(1,)])},
                       auth=("sa", "tds-pw")) as srv:
        with SqlServerWireClient(srv.host, srv.port, user="sa",
                                 password="tds-pw") as c:
            _names, rows = c.query("SELECT * FROM dbo.t")
            assert len(rows) == 1
        with pytest.raises(ValueError, match="access denied"):
            SqlServerWireClient(srv.host, srv.port, user="sa",
                                password="nope")
        with pytest.raises(ValueError, match="access denied"):
            SqlServerWireClient(srv.host, srv.port, user="other",
                                password="tds-pw")
