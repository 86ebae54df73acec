"""CDC source queries: pgoutput logical replication applied to a snapshot.

Reference shape: CREATE SOURCE ... FROM POSTGRES ... — initial table
snapshot, then the replication slot's pgoutput stream keeps the table
current (/root/reference/src/storage/src/source/postgres/{snapshot,
replication}.rs). Here the slot is emulated with wire-exact pgoutput
bytes (sources/pgoutput.py encodes and decodes the PUBLIC message
format), and the oracle states the same logical changes in plain SQL —
so the driver certifies the full decode → typed diff → snapshot-merge
path, not just the byte parser.
"""

from __future__ import annotations

from materialize_spark.queries import register
from materialize_spark.queries.util import T

_NATION_OID = 24001
_NATION_COLS = [("n_nationkey", 23, True), ("n_name", 25, False),
                ("n_regionkey", 23, False)]


def _nation_log():
    """Deterministic replication log over the driver's `nation` table:
    rename 0, move 3 to region 4, delete 7, delete+re-insert 5
    (as PHOENIX), insert 25, insert-then-delete 26 (never visible)."""
    from materialize_spark.sources.pgoutput import (
        encode_delete, encode_insert, encode_relation, encode_update,
        parse_relation,
    )
    rel_bytes = encode_relation(_NATION_OID, "public", "nation",
                                _NATION_COLS)
    rel = parse_relation(rel_bytes)
    msgs = [
        rel_bytes,
        encode_update(_NATION_OID, [0, "ZERO_RENAMED", 0],
                      old_vals=[0, None, None], old_is_key_only=True),
        encode_update(_NATION_OID, [3, "NATION_3", 4],
                      old_vals=[3, None, None], old_is_key_only=True),
        encode_delete(_NATION_OID, [7, None, None]),
        encode_delete(_NATION_OID, [5, None, None]),
        encode_insert(_NATION_OID, [26, "GONELAND", 2]),
        encode_insert(_NATION_OID, [25, "NEWLAND", 1]),
        encode_insert(_NATION_OID, [5, "PHOENIX", 0]),
        encode_delete(_NATION_OID, [26, None, None]),
    ]
    return msgs, {rel["oid"]: rel}


_SUP_TABLE_ID = 311
_SUP_DDL = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"


def _supplier_binlog():
    """Deterministic binlog section over the driver's `supplier` table:
    full-row-image updates of 0 and 10, delete 50, delete+re-insert 7,
    insert 100, insert-then-delete 101 (never visible). Row images are
    FULL (binlog_row_image default), so updates carry every column."""
    from materialize_spark.sources.mysql_binlog import (
        DELETE_ROWS_V2, T_DOUBLE, T_LONG, T_LONGLONG, T_VARCHAR,
        UPDATE_ROWS_V2, WRITE_ROWS_V2, encode_rows_event, encode_table_map,
    )
    ct = [T_LONGLONG, T_VARCHAR, T_LONG, T_DOUBLE]
    meta = [0, 255, 0, 8]
    dummy = lambda k: [k, "?", 0, 0.0]  # before-image values never surface
    events = [
        encode_table_map(_SUP_TABLE_ID, "public", "supplier", ct, meta),
        encode_rows_event(UPDATE_ROWS_V2, _SUP_TABLE_ID,
                          [(dummy(0), [0, "SUP_ZERO", 9, 0.0])], ct, meta),
        encode_rows_event(UPDATE_ROWS_V2, _SUP_TABLE_ID,
                          [(dummy(10), [10, "SUP_TEN", 5, 1234.5])],
                          ct, meta),
        encode_rows_event(DELETE_ROWS_V2, _SUP_TABLE_ID, [dummy(50)],
                          ct, meta),
        encode_rows_event(DELETE_ROWS_V2, _SUP_TABLE_ID, [dummy(7)],
                          ct, meta),
        encode_rows_event(WRITE_ROWS_V2, _SUP_TABLE_ID,
                          [[101, "SUP_GONE", 1, 9.0]], ct, meta),
        encode_rows_event(WRITE_ROWS_V2, _SUP_TABLE_ID,
                          [[7, "SUP_PHOENIX", 0, -1.25],
                           [100, "SUP_NEW", 3, 42.0]], ct, meta),
        encode_rows_event(DELETE_ROWS_V2, _SUP_TABLE_ID,
                          [dummy(101)], ct, meta),
    ]
    return events


@register(
    "cdc_mysql_apply",
    """
    -- the same logical changes the binlog section encodes, in plain SQL
    SELECT s_suppkey,
           CASE WHEN s_suppkey = 0 THEN 'SUP_ZERO'
                WHEN s_suppkey = 10 THEN 'SUP_TEN'
                WHEN s_suppkey = 7 THEN 'SUP_PHOENIX'
                ELSE s_name END AS s_name,
           CASE WHEN s_suppkey = 0 THEN 9
                WHEN s_suppkey = 10 THEN 5
                WHEN s_suppkey = 7 THEN 0
                ELSE s_nationkey END AS s_nationkey,
           CASE WHEN s_suppkey = 0 THEN 0.0
                WHEN s_suppkey = 10 THEN 1234.5
                WHEN s_suppkey = 7 THEN -1.25
                ELSE s_acctbal END AS s_acctbal
    FROM supplier WHERE s_suppkey <> 50
    UNION ALL
    SELECT CAST(100 AS BIGINT), 'SUP_NEW', CAST(3 AS INTEGER), 42.0
    """,
    "cdc", "source", "mysql",
)
def cdc_mysql_apply(spark, sf_dir):
    from materialize_spark.sources.mysql_binlog import (
        binlog_to_diff, decode_binlog_stream,
    )
    from materialize_spark.sources.pgoutput import apply_cdc
    events = _supplier_binlog()
    log = spark.createDataFrame(
        [(i + 1, bytearray(e)) for i, e in enumerate(events)],
        "pos long, event binary")
    env = decode_binlog_stream(
        log, columns={"public.supplier":
                      ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]})
    diff = binlog_to_diff(env, "public.supplier", _SUP_DDL)
    base = T(spark, sf_dir).supplier
    return apply_cdc(base, diff, ["s_suppkey"])


def _region_change_table(spark):
    """cdc.region_CT emulation (no SQL Server in the sandbox): rename 0
    (update pair), delete 3, delete+re-insert 1 across two transactions,
    insert 5, insert-then-delete 6 (never visible). Two ops share a
    start_lsn with distinct seqvals to exercise intra-txn ordering."""
    from materialize_spark.sources.sqlserver_cdc import (
        OP_DELETE, OP_INSERT, OP_UPDATE_NEW, OP_UPDATE_OLD, lsn_bytes,
    )
    rows = [
        (lsn_bytes(1), lsn_bytes(0, 0, 1), OP_UPDATE_OLD, 0, "?"),
        (lsn_bytes(1), lsn_bytes(0, 0, 1), OP_UPDATE_NEW, 0,
         "REGION_ZERO"),
        (lsn_bytes(2), lsn_bytes(0, 0, 1), OP_DELETE, 3, "?"),
        # one transaction: delete 1 then insert 6 (seqval orders them)
        (lsn_bytes(3), lsn_bytes(0, 0, 1), OP_DELETE, 1, "?"),
        (lsn_bytes(3), lsn_bytes(0, 0, 2), OP_INSERT, 6, "EPHEMERAL"),
        (lsn_bytes(4), lsn_bytes(0, 0, 1), OP_INSERT, 1, "REBORN"),
        (lsn_bytes(4), lsn_bytes(0, 0, 2), OP_INSERT, 5, "NEWREGION"),
        (lsn_bytes(5), lsn_bytes(0, 0, 1), OP_DELETE, 6, "?"),
    ]
    return spark.createDataFrame(
        [(bytearray(a), bytearray(b), op, k, n)
         for a, b, op, k, n in rows],
        "`__$start_lsn` binary, `__$seqval` binary, `__$operation` int, "
        "r_regionkey long, r_name string")


@register(
    "cdc_sqlserver_apply",
    """
    -- the same logical changes the change table encodes, in plain SQL
    SELECT r_regionkey,
           CASE WHEN r_regionkey = 0 THEN 'REGION_ZERO'
                WHEN r_regionkey = 1 THEN 'REBORN'
                ELSE r_name END AS r_name
    FROM region WHERE r_regionkey <> 3
    UNION ALL
    SELECT CAST(5 AS BIGINT), 'NEWREGION'
    """,
    "cdc", "source", "sqlserver",
)
def cdc_sqlserver_apply(spark, sf_dir):
    from materialize_spark.sources.sqlserver_cdc import apply_changes
    base = T(spark, sf_dir).region
    return apply_changes(base, _region_change_table(spark),
                         ["r_regionkey"])


@register(
    "cdc_pgoutput_apply",
    """
    -- the same logical changes the pgoutput log encodes, in plain SQL
    SELECT n_nationkey,
           CASE WHEN n_nationkey = 0 THEN 'ZERO_RENAMED'
                ELSE n_name END AS n_name,
           CASE WHEN n_nationkey = 3 THEN 4
                WHEN n_nationkey = 5 THEN 0
                ELSE n_regionkey END AS n_regionkey
    FROM (SELECT n_nationkey,
                 CASE WHEN n_nationkey = 5 THEN 'PHOENIX'
                      ELSE n_name END AS n_name, n_regionkey
          FROM nation WHERE n_nationkey <> 7)
    UNION ALL
    SELECT CAST(25 AS INTEGER), 'NEWLAND', CAST(1 AS INTEGER)
    """,
    "cdc", "source", "pgoutput",
)
def cdc_pgoutput_apply(spark, sf_dir):
    from materialize_spark.sources.pgoutput import (
        apply_cdc, decode_pgoutput_stream, pgoutput_to_diff,
    )
    msgs, rels = _nation_log()
    log = spark.createDataFrame(
        [(i + 1, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn long, message binary")
    env = decode_pgoutput_stream(log, relations=rels)
    diff = pgoutput_to_diff(env, rels[_NATION_OID])
    base = T(spark, sf_dir).nation
    return apply_cdc(base, diff, ["n_nationkey"])


# -- Kafka wire source (kafka_wire.py: real TCP protocol, no broker pkg) ----
_KAFKA_BROKER = None


def _kafka_broker():
    """One MiniBroker per process, seeded deterministically — it must
    outlive the query callable (the driver collects the returned
    DataFrame later, and fetch tasks dial the socket at execute time)."""
    global _KAFKA_BROKER
    if _KAFKA_BROKER is None:
        import json as _json

        from materialize_spark.sources.kafka_wire import (
            KafkaWireClient, MiniBroker,
        )
        b = MiniBroker()
        b.create_topic("orders_feed", partitions=4)
        with KafkaWireClient(b.host, b.port) as c:
            for p in range(4):
                c.produce("orders_feed", p, [
                    (str(100 * p + i).encode(),
                     _json.dumps({"region": ["east", "west"][i % 2],
                                  "qty": p + i}).encode(),
                     1_700_000_000_000 + i)
                    for i in range(25)])
        _KAFKA_BROKER = b
    return _KAFKA_BROKER


@register(
    "kafka_wire_e2e",
    """
    -- oracle: closed form of the produced feed. 4 partitions x 25 records,
    -- region alternates east/west by record index, qty = partition + index.
    WITH feed AS (
      SELECT p, i,
             CASE WHEN i % 2 = 0 THEN 'east' ELSE 'west' END AS region,
             p + i AS qty
      FROM (SELECT UNNEST(range(4)) AS p), (SELECT UNNEST(range(25)) AS i)
    )
    SELECT region, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(qty) AS BIGINT) AS total_qty,
           CAST(max(qty) AS BIGINT) AS max_qty
    FROM feed GROUP BY region
    """,
    "source", "kafka", "wire",
)
def kafka_wire_e2e(spark, sf_dir):
    """Kafka over a REAL socket: tasks fetch their partitions from the
    in-process broker via the wire protocol (Fetch v2 / message-set v1),
    values decode JVM-side with from_json, and the aggregate is
    oracle-checked against the closed form of what was produced.
    Reference: src/storage/src/source/kafka.rs (partition consumers);
    wire format kafka.apache.org/protocol."""
    from pyspark.sql import functions as F

    from materialize_spark.sources.kafka_wire import read_kafka_wire
    b = _kafka_broker()
    frame = read_kafka_wire(spark, f"{b.host}:{b.port}", "orders_feed")
    parsed = frame.select(F.from_json(
        F.col("value").cast("string"),
        "region string, qty int").alias("r")).select("r.*")
    return parsed.groupBy("region").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.max("qty").cast("long").alias("max_qty"))


@register(
    "mv_consistency_frontier",
    """
    -- oracle: closed form of three coordinated ingests over one source.
    -- Batches i=1..3 append (k='a', v=i) and (k='b', v=10*i); both views
    -- are read at the shared frontier ts=3.
    SELECT k, CAST(3 AS BIGINT) AS ts,
           CAST(CASE k WHEN 'a' THEN 1+2+3 ELSE 10+20+30 END AS BIGINT)
             AS total,
           CAST(3 AS BIGINT) AS n
    FROM (SELECT UNNEST(['a','b']) AS k)
    """,
    "streaming", "ivm", "consistency",
)
def mv_consistency_frontier(spark, sf_dir):
    """Two MVs over one coordinated source must expose one frontier
    (streaming/oracle.py — the reference's timestamp-oracle + txn-wal
    guarantee, /root/reference/src/timestamp-oracle/src/lib.rs:46).
    The query joins both views' snapshots AT THEIR PUBLISHED TIMESTAMPS:
    any divergence (one view at ts=2 while the other serves ts=3)
    changes the joined rows and fails the hash compare."""
    from pyspark.sql import functions as F

    from materialize_spark.streaming.ivm import MaterializedView
    from materialize_spark.streaming.oracle import CoordinatedSource

    src = CoordinatedSource()
    src.attach("totals", MaterializedView(
        spark=spark,
        define=lambda df: df.groupBy("k").agg(F.sum("v").alias("total")),
        keys=["k"], combine={"total": "sum"}))
    src.attach("counts", MaterializedView(
        spark=spark,
        define=lambda df: df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n")),
        keys=["k"], combine={"n": "sum"}))
    for i in (1, 2, 3):
        src.ingest(spark.createDataFrame(
            [("a", i), ("b", 10 * i)], "k string, v long"))
    ts1, totals = src.peek("totals")
    ts2, counts = src.peek("counts")
    return (
        totals.withColumn("ts", F.lit(ts1).cast("long"))
        .join(counts.withColumn("ts2", F.lit(ts2).cast("long")), on="k")
        .filter(F.col("ts") == F.col("ts2"))  # divergence drops rows
        .select("k", "ts", F.col("total").cast("long").alias("total"),
                F.col("n").cast("long").alias("n"))
    )


@register(
    "cdc_pgoutput_wire_apply",
    """
    -- identical logical changes to cdc_pgoutput_apply, delivered over the
    -- replication WIRE protocol instead of a log file
    SELECT n_nationkey,
           CASE WHEN n_nationkey = 0 THEN 'ZERO_RENAMED'
                ELSE n_name END AS n_name,
           CASE WHEN n_nationkey = 3 THEN 4
                WHEN n_nationkey = 5 THEN 0
                ELSE n_regionkey END AS n_regionkey
    FROM (SELECT n_nationkey,
                 CASE WHEN n_nationkey = 5 THEN 'PHOENIX'
                      ELSE n_name END AS n_name, n_regionkey
          FROM nation WHERE n_nationkey <> 7)
    UNION ALL
    SELECT CAST(25 AS INTEGER), 'NEWLAND', CAST(1 AS INTEGER)
    """,
    "cdc", "source", "pgoutput", "wire",
)
def cdc_pgoutput_wire_apply(spark, sf_dir):
    """Same state fold as cdc_pgoutput_apply, but the log arrives by
    dialing a replication endpoint: startup with replication=database,
    START_REPLICATION, CopyBoth XLogData frames (pg_replication.py —
    the reference's replication.rs network path). The wire drain is
    eager, so the in-process server lives only for the call."""
    from materialize_spark.sources.pg_replication import (
        MiniPostgres, read_pg_replication,
    )
    from materialize_spark.sources.pgoutput import (
        apply_cdc, pgoutput_to_diff, decode_pgoutput_stream,
    )
    msgs, rels = _nation_log()
    wal = [(1000 + i, m) for i, m in enumerate(msgs)]
    with MiniPostgres(wal) as srv:
        log = read_pg_replication(spark, srv.host, srv.port,
                                  "mz_slot", "mz_pub")
    env = decode_pgoutput_stream(log, relations=rels)
    diff = pgoutput_to_diff(env, rels[_NATION_OID])
    base = T(spark, sf_dir).nation
    return apply_cdc(base, diff, ["n_nationkey"])


@register(
    "cdc_mysql_wire_apply",
    """
    -- identical logical changes to cdc_mysql_apply, delivered over the
    -- MySQL replica WIRE protocol (COM_BINLOG_DUMP) with CRC32 checksums
    SELECT s_suppkey,
           CASE WHEN s_suppkey = 0 THEN 'SUP_ZERO'
                WHEN s_suppkey = 10 THEN 'SUP_TEN'
                WHEN s_suppkey = 7 THEN 'SUP_PHOENIX'
                ELSE s_name END AS s_name,
           CASE WHEN s_suppkey = 0 THEN 9
                WHEN s_suppkey = 10 THEN 5
                WHEN s_suppkey = 7 THEN 0
                ELSE s_nationkey END AS s_nationkey,
           CASE WHEN s_suppkey = 0 THEN 0.0
                WHEN s_suppkey = 10 THEN 1234.5
                WHEN s_suppkey = 7 THEN -1.25
                ELSE s_acctbal END AS s_acctbal
    FROM supplier WHERE s_suppkey <> 50
    UNION ALL
    SELECT CAST(100 AS BIGINT), 'SUP_NEW', CAST(3 AS INTEGER), 42.0
    """,
    "cdc", "source", "mysql", "wire",
)
def cdc_mysql_wire_apply(spark, sf_dir):
    """Same state fold as cdc_mysql_apply, but the binlog arrives via
    handshake + COM_BINLOG_DUMP (mysql_wire.py) with binlog_checksum=
    CRC32 — the real-server default — verified and trimmed in decode."""
    from materialize_spark.sources.mysql_binlog import (
        binlog_to_diff, decode_binlog_stream, encode_format_description,
        with_crc32,
    )
    from materialize_spark.sources.mysql_wire import (
        MiniMySQL, read_mysql_binlog,
    )
    from materialize_spark.sources.pgoutput import apply_cdc
    events = [encode_format_description("crc32")] + [
        with_crc32(e) for e in _supplier_binlog()]
    with MiniMySQL(events) as srv:
        log = read_mysql_binlog(spark, srv.host, srv.port)
    env = decode_binlog_stream(
        log, columns={"public.supplier":
                      ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]})
    diff = binlog_to_diff(env, "public.supplier", _SUP_DDL)
    base = T(spark, sf_dir).supplier
    return apply_cdc(base, diff, ["s_suppkey"])


@register(
    "cdc_sqlserver_wire_apply",
    """
    -- identical logical changes to cdc_sqlserver_apply, delivered over a
    -- real TDS socket (PRELOGIN/LOGIN7/SQL_BATCH) instead of a frame
    SELECT r_regionkey,
           CASE WHEN r_regionkey = 0 THEN 'REGION_ZERO'
                WHEN r_regionkey = 1 THEN 'REBORN'
                ELSE r_name END AS r_name
    FROM region WHERE r_regionkey <> 3
    UNION ALL
    SELECT CAST(5 AS BIGINT), 'NEWREGION'
    """,
    "cdc", "source", "sqlserver", "wire",
)
def cdc_sqlserver_wire_apply(spark, sf_dir):
    """Same state fold as cdc_sqlserver_apply, but the change table is
    read over the TDS wire protocol (tds_wire.py) from an in-process
    server — the reference's by-query CDC consumption end-to-end."""
    from materialize_spark.sources.sqlserver_cdc import apply_changes
    from materialize_spark.sources.tds_wire import (
        MiniSqlServer, read_sqlserver_ct,
    )
    ct_df = _region_change_table(spark)
    schema = [("__$start_lsn", "varbinary"), ("__$seqval", "varbinary"),
              ("__$operation", "int"), ("r_regionkey", "int"),
              ("r_name", "nvarchar")]
    rows = [(bytes(r[0]), bytes(r[1]), r[2], r[3], r[4])
            for r in ct_df.collect()]
    with MiniSqlServer({"cdc.region_CT": (schema, rows)}) as srv:
        ct = read_sqlserver_ct(spark, srv.host, srv.port, "region")
    base = T(spark, sf_dir).region
    return apply_changes(base, ct, ["r_regionkey"])


_KAFKA_SECURE_BROKER = None


def _kafka_secure_broker():
    """TLS + SASL/SCRAM MiniBroker, seeded like _kafka_broker; skipped
    transparently when the cert tooling is unavailable (SASL-only)."""
    global _KAFKA_SECURE_BROKER
    if _KAFKA_SECURE_BROKER is None:
        import json as _json

        from materialize_spark.sources.kafka_wire import (
            KafkaWireClient, MiniBroker,
        )
        sctx = cctx = None
        cafile = None
        try:
            from tests.tlsutil import cert_files, client_ctx, server_ctx
            sctx, cctx = server_ctx(), client_ctx()
            cafile, _ = cert_files()
        except Exception:
            pass
        b = MiniBroker(ssl_context=sctx,
                       sasl_users={"ingest": "feed-pass"})
        b.create_topic("secure_feed", partitions=2)
        with KafkaWireClient(b.host, b.port, ssl_context=cctx,
                             sasl=("SCRAM-SHA-256", "ingest",
                                   "feed-pass")) as c:
            for p in range(2):
                c.produce("secure_feed", p, [
                    (str(10 * p + i).encode(),
                     _json.dumps({"shard": p, "v": 3 * i + p}).encode(),
                     1_700_000_000_000 + i)
                    for i in range(10)])
        _KAFKA_SECURE_BROKER = (b, cafile)
    return _KAFKA_SECURE_BROKER


@register(
    "kafka_wire_secure",
    """
    -- oracle: closed form of the secured feed. 2 partitions x 10 records,
    -- v = 3*i + p.
    WITH feed AS (
      SELECT p, i, 3 * i + p AS v
      FROM (SELECT UNNEST(range(2)) AS p), (SELECT UNNEST(range(10)) AS i)
    )
    SELECT CAST(p AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS total
    FROM feed GROUP BY p ORDER BY shard
    """,
    "source", "kafka", "wire", "tls", "sasl",
)
def kafka_wire_secure(spark, sf_dir):
    """The production Kafka posture end-to-end: every fetch task dials a
    TLS listener and authenticates with SASL/SCRAM-SHA-256 before
    draining its partition — TLS conf and credentials ride the task
    closure as picklable values. Reference: Kafka connection TLS+SASL
    options (src/storage-types/src/connections.rs) feeding
    src/storage/src/source/kafka.rs partition consumers."""
    from pyspark.sql import functions as F

    from materialize_spark.sources.kafka_wire import read_kafka_wire
    b, cafile = _kafka_secure_broker()
    ssl_conf = ({"cafile": cafile, "insecure": True}
                if cafile is not None else None)
    frame = read_kafka_wire(
        spark, f"{b.host}:{b.port}", "secure_feed",
        ssl_conf=ssl_conf,
        sasl=("SCRAM-SHA-256", "ingest", "feed-pass"))
    parsed = frame.select(F.from_json(
        F.col("value").cast("string"),
        "shard int, v int").alias("r")).select("r.*")
    return (parsed.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("v").cast("long").alias("total"))
            .select(F.col("shard").cast("long").alias("shard"), "n",
                    "total")
            .orderBy("shard"))


_KAFKA_SQL_BROKER = None


def _kafka_sql_broker():
    """Broker seeded for the CREATE SOURCE FROM KAFKA entry: 2 partitions
    of keyed JSON updates where each key's last value wins and key 'k3'
    ends tombstoned."""
    global _KAFKA_SQL_BROKER
    if _KAFKA_SQL_BROKER is None:
        import json as _json

        from materialize_spark.sources.kafka_wire import (
            KafkaWireClient, MiniBroker,
        )
        b = MiniBroker()
        b.create_topic("metrics_feed", partitions=2)
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("metrics_feed", 0, [
                (b"k1", _json.dumps({"v": 1}).encode(), 1),
                (b"k1", _json.dumps({"v": 5}).encode(), 2),
                (b"k3", _json.dumps({"v": 9}).encode(), 3),
                (b"k3", None, 4),
            ])
            c.produce("metrics_feed", 1, [
                (b"k2", _json.dumps({"v": 2}).encode(), 5),
                (b"k2", _json.dumps({"v": 7}).encode(), 6),
            ])
        _KAFKA_SQL_BROKER = b
    return _KAFKA_SQL_BROKER


@register(
    "kafka_source_sql",
    """
    -- oracle: closed form of the upserted feed — latest value per key,
    -- k3 tombstoned away.
    SELECT * FROM (VALUES ('k1', CAST(5 AS BIGINT)),
                          ('k2', CAST(7 AS BIGINT))) AS t(key, v)
    ORDER BY key
    """,
    "source", "kafka", "sqlfront", "envelope",
)
def kafka_source_sql(spark, sf_dir):
    """The reference's PRIMARY source statement end-to-end over SQL:
    CREATE CONNECTION + CREATE SOURCE ... FROM KAFKA CONNECTION
    (TOPIC) FORMAT JSON ENVELOPE UPSERT drains a real wire broker,
    collapses to latest-per-key with tombstone deletes, and the JSON
    payload is queried through the jsonb operators. Reference:
    src/sql-parser CreateSource + sources.rs KafkaSourceConnection +
    upsert.rs envelope."""
    from materialize_spark.plans.sqlfront import MzSession

    b = _kafka_sql_broker()
    s = MzSession(spark, sf_dir)
    s.execute(f"CREATE CONNECTION ksrc_conn TO KAFKA "
              f"(host = '{b.host}', port = {b.port})")
    s.execute("CREATE SOURCE metrics_cur FROM KAFKA CONNECTION ksrc_conn "
              "(TOPIC 'metrics_feed') FORMAT JSON ENVELOPE UPSERT")
    return s.sql("SELECT key, CAST(data ->> 'v' AS BIGINT) AS v "
                 "FROM metrics_cur ORDER BY key")


_CSR_PEERS = None


def _csr_peers():
    """MiniBroker + MiniSchemaRegistryServer seeded with a two-version
    Avro subject — module-global so the sockets outlive the query
    callable (fetch tasks dial at collect time)."""
    global _CSR_PEERS
    if _CSR_PEERS is None:
        import json as _json

        from materialize_spark.sources.avro import encode_record
        from materialize_spark.sources.kafka_wire import (
            KafkaWireClient, MiniBroker,
        )
        from materialize_spark.sources.schema_registry import (
            MiniSchemaRegistryServer,
        )
        v1 = _json.dumps({"type": "record", "name": "t", "fields": [
            {"name": "station", "type": "string"},
            {"name": "temp", "type": "long"}]})
        v2 = _json.dumps({"type": "record", "name": "t", "fields": [
            {"name": "station", "type": "string"},
            {"name": "temp", "type": "long"},
            {"name": "humidity", "type": "long"}]})
        b = MiniBroker()
        b.create_topic("weather", partitions=2)
        csr = MiniSchemaRegistryServer()
        id1 = csr.register_subject("weather-value", v1)
        id2 = csr.register_subject("weather-value", v2)
        with KafkaWireClient(b.host, b.port) as c:
            # 8 v1 records (no humidity -> NULL) + 8 v2 records,
            # deterministic, split across partitions
            for p in range(2):
                recs = []
                for i in range(4):
                    recs.append((f"s{p}{i}".encode(), encode_record(
                        v1, {"station": f"st{p}", "temp": 10 * p + i},
                        wire="confluent", schema_id=id1),
                        1_700_000_000_000 + i))
                for i in range(4):
                    recs.append((f"n{p}{i}".encode(), encode_record(
                        v2, {"station": f"st{p}", "temp": 20 * p + i,
                             "humidity": 50 + i},
                        wire="confluent", schema_id=id2),
                        1_700_000_000_100 + i))
                c.produce("weather", p, recs)
        _CSR_PEERS = (b, csr)
    return _CSR_PEERS


@register(
    "kafka_source_avro_csr",
    """
    -- oracle: closed form of the produced feed — per partition p:
    -- 4 writer-v1 records (humidity NULL) with temp 10p+i and
    -- 4 writer-v2 records with temp 20p+i, humidity 50+i (i in 0..3)
    WITH feed AS (
      SELECT p, i, 'st' || p AS station, 10 * p + i AS temp,
             CAST(NULL AS BIGINT) AS humidity
      FROM (SELECT UNNEST(range(2)) AS p), (SELECT UNNEST(range(4)) AS i)
      UNION ALL
      SELECT p, i, 'st' || p, 20 * p + i, 50 + i
      FROM (SELECT UNNEST(range(2)) AS p), (SELECT UNNEST(range(4)) AS i)
    )
    SELECT station, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(temp) AS BIGINT) AS total_temp,
           CAST(COUNT(humidity) AS BIGINT) AS n_humidity,
           CAST(AVG(humidity) AS DOUBLE) AS avg_humidity
    FROM feed GROUP BY station ORDER BY station
    """,
    "source", "kafka", "sqlfront", "avro", "schema-registry",
)
def kafka_source_avro_csr(spark, sf_dir):
    """FORMAT AVRO USING CONFLUENT SCHEMA REGISTRY end-to-end: a real
    HTTP registry resolves per-record writer schema ids (two subject
    versions live in the topic simultaneously), old records surface the
    added column as NULL — Avro schema resolution, the reference's
    primary production format (encoding.rs:95-102 AvroEncoding +
    src/ccsr client; testdrive corpus test/testdrive/avro-*.td)."""
    from materialize_spark.plans.sqlfront import MzSession

    b, csr = _csr_peers()
    s = MzSession(spark, sf_dir)
    s.execute(f"CREATE CONNECTION wx_kc TO KAFKA "
              f"(BROKER '{b.host}:{b.port}')")
    s.execute(f"CREATE CONNECTION wx_csr TO CONFLUENT SCHEMA REGISTRY "
              f"(URL '{csr.url}')")
    s.execute("CREATE SOURCE weather FROM KAFKA CONNECTION wx_kc "
              "(TOPIC 'weather') FORMAT AVRO USING CONFLUENT SCHEMA "
              "REGISTRY CONNECTION wx_csr")
    return s.sql(
        "SELECT station, COUNT(*) AS n, SUM(temp) AS total_temp, "
        "COUNT(humidity) AS n_humidity, "
        "CAST(AVG(humidity) AS DOUBLE) AS avg_humidity "
        "FROM weather GROUP BY station ORDER BY station")


_SINK_RT_PEER = None


def _sink_rt_peer():
    global _SINK_RT_PEER
    if _SINK_RT_PEER is None:
        from materialize_spark.sources.kafka_wire import MiniBroker
        b = MiniBroker()
        b.create_topic("inv_out", partitions=2)
        _SINK_RT_PEER = b
    return _SINK_RT_PEER


@register(
    "sink_kafka_upsert_roundtrip",
    """
    -- oracle: closed form of the write script's net state — id 1
    -- deleted, id 2 updated to 'B', id 3 inserted after the snapshot
    SELECT * FROM (VALUES (CAST(2 AS BIGINT), 'B'),
                          (CAST(3 AS BIGINT), 'c')) AS t(id, v)
    ORDER BY id
    """,
    "sink", "kafka", "envelope", "upsert",
)
def sink_kafka_upsert_roundtrip(spark, sf_dir):
    """The sink's output IS the envelope: a Kafka sink with ENVELOPE
    UPSERT produces its snapshot then every commit's diff (update =
    new value, delete = NULL tombstone) continuously; re-ingesting the
    topic through the engine's own upsert decoder reproduces the
    table exactly (reference sinks.rs:137-140 — the sink emits
    correctly-framed change data, not a one-shot JSON dump)."""
    import json as _json

    from materialize_spark.plans.sqlfront import MzSession

    b = _sink_rt_peer()
    s = MzSession(spark, sf_dir)
    s.execute(f"CREATE CONNECTION inv_kc TO KAFKA "
              f"(BROKER '{b.host}:{b.port}')")
    s.execute("CREATE TABLE inv (id BIGINT, v STRING)")
    s.execute("INSERT INTO inv VALUES (1, 'a'), (2, 'b')")
    s.execute("CREATE SINK inv_sink FROM inv INTO KAFKA CONNECTION "
              "inv_kc (TOPIC 'inv_out') KEY (id) FORMAT JSON "
              "ENVELOPE UPSERT")
    s.execute("INSERT INTO inv VALUES (3, 'c')")
    s.execute("UPDATE inv SET v = 'B' WHERE id = 2")
    s.execute("DELETE FROM inv WHERE id = 1")
    s.execute("CREATE SOURCE inv_back FROM KAFKA CONNECTION inv_kc "
              "(TOPIC 'inv_out') FORMAT JSON ENVELOPE UPSERT")
    return s.sql(
        "SELECT CAST(key AS BIGINT) AS id, data ->> 'v' AS v "
        "FROM inv_back ORDER BY id")


_AVRO_SINK_PEERS = None


def _avro_sink_peers():
    global _AVRO_SINK_PEERS
    if _AVRO_SINK_PEERS is None:
        from materialize_spark.sources.kafka_wire import MiniBroker
        from materialize_spark.sources.schema_registry import (
            MiniSchemaRegistryServer,
        )
        b = MiniBroker()
        b.create_topic("stock_out", partitions=2)
        _AVRO_SINK_PEERS = (b, MiniSchemaRegistryServer())
    return _AVRO_SINK_PEERS


@register(
    "sink_kafka_avro_roundtrip",
    """
    -- oracle: closed form of the write script's net state — id 1
    -- deleted, id 2 updated, id 3 inserted post-snapshot
    SELECT * FROM (VALUES
        (CAST(2 AS BIGINT), 'beta', CAST(20.5 AS DOUBLE)),
        (CAST(3 AS BIGINT), 'gamma', CAST(0.25 AS DOUBLE))
    ) AS t(id, name, qty) ORDER BY id
    """,
    "sink", "kafka", "avro", "schema-registry",
)
def sink_kafka_avro_roundtrip(spark, sf_dir):
    """The production sink loop: an AVRO UPSERT sink derives its value
    schema from the relation, registers it with the (real HTTP) schema
    registry, and produces Confluent-framed records continuously; the
    topic re-ingested through the engine's own CSR decoder over the
    SAME registry reproduces the table (reference sinks.rs:137-140 +
    src/interchange/src/avro + src/ccsr)."""
    from materialize_spark.plans.sqlfront import MzSession

    b, csr = _avro_sink_peers()
    s = MzSession(spark, sf_dir)
    s.execute(f"CREATE CONNECTION stk_kc TO KAFKA "
              f"(BROKER '{b.host}:{b.port}')")
    s.execute(f"CREATE CONNECTION stk_csr TO CONFLUENT SCHEMA "
              f"REGISTRY (URL '{csr.url}')")
    s.execute("CREATE TABLE stock (id BIGINT, name STRING, qty DOUBLE)")
    s.execute("INSERT INTO stock VALUES (1, 'alpha', 10.0), "
              "(2, 'bravo', 20.5)")
    s.execute("CREATE SINK stock_sink FROM stock INTO KAFKA "
              "CONNECTION stk_kc (TOPIC 'stock_out') KEY (id) "
              "FORMAT AVRO USING CONFLUENT SCHEMA REGISTRY "
              "CONNECTION stk_csr ENVELOPE UPSERT")
    s.execute("UPDATE stock SET name = 'beta' WHERE id = 2")
    s.execute("DELETE FROM stock WHERE id = 1")
    s.execute("INSERT INTO stock VALUES (3, 'gamma', 0.25)")
    s.execute("CREATE SOURCE stock_back FROM KAFKA CONNECTION stk_kc "
              "(TOPIC 'stock_out') FORMAT AVRO USING CONFLUENT "
              "SCHEMA REGISTRY CONNECTION stk_csr ENVELOPE UPSERT")
    return s.sql("SELECT id, name, qty FROM stock_back ORDER BY id")


@register(
    "sink_kafka_avro_debezium_roundtrip",
    """
    -- oracle: closed form of the write script's net state — id 1
    -- deleted, id 2 renamed via UPDATE, id 3 inserted post-snapshot
    SELECT * FROM (VALUES
        (CAST(2 AS BIGINT), 'beta', CAST(20.5 AS DOUBLE)),
        (CAST(3 AS BIGINT), 'gamma', CAST(0.25 AS DOUBLE))
    ) AS t(id, name, qty) ORDER BY id
    """,
    "sink", "kafka", "avro", "debezium", "schema-registry",
)
def sink_kafka_avro_debezium_roundtrip(spark, sf_dir):
    """Debezium-enveloped AVRO sink: the value schema is the NESTED
    before/after envelope (each a row record — reference
    src/interchange/src/avro), registered with the real HTTP schema
    registry; deletes produce {before: row, after: null}, inserts the
    reverse, continuously on every commit. The topic re-ingested
    through the engine's own CSR decoder with ENVELOPE DEBEZIUM folds
    the change records back to the table's net state."""
    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.kafka_wire import MiniBroker
    from materialize_spark.sources.schema_registry import (
        MiniSchemaRegistryServer,
    )

    with MiniBroker() as b, MiniSchemaRegistryServer() as csr:
        b.create_topic("ledger_dbz", partitions=2)
        s = MzSession(spark, sf_dir)
        s.execute(f"CREATE CONNECTION ldg_kc TO KAFKA "
                  f"(BROKER '{b.host}:{b.port}')")
        s.execute(f"CREATE CONNECTION ldg_csr TO CONFLUENT SCHEMA "
                  f"REGISTRY (URL '{csr.url}')")
        s.execute("CREATE TABLE ledger (id BIGINT, name STRING, "
                  "qty DOUBLE)")
        s.execute("INSERT INTO ledger VALUES (1, 'alpha', 10.0), "
                  "(2, 'bravo', 20.5)")
        s.execute("CREATE SINK ledger_sink FROM ledger INTO KAFKA "
                  "CONNECTION ldg_kc (TOPIC 'ledger_dbz') KEY (id) "
                  "FORMAT AVRO USING CONFLUENT SCHEMA REGISTRY "
                  "CONNECTION ldg_csr ENVELOPE DEBEZIUM")
        s.execute("UPDATE ledger SET name = 'beta' WHERE id = 2")
        s.execute("DELETE FROM ledger WHERE id = 1")
        s.execute("INSERT INTO ledger VALUES (3, 'gamma', 0.25)")
        s.execute("CREATE SOURCE ledger_back FROM KAFKA CONNECTION "
                  "ldg_kc (TOPIC 'ledger_dbz') FORMAT AVRO USING "
                  "CONFLUENT SCHEMA REGISTRY CONNECTION ldg_csr "
                  "ENVELOPE DEBEZIUM")
        return s.sql("SELECT id, name, qty FROM ledger_back "
                     "ORDER BY id")


@register(
    "kafka_source_include_headers",
    """
    -- oracle: literal truth of the seeded header-bearing feed —
    -- per-record header projection (HEADER 'lang' → text, missing →
    -- NULL; HEADER 'trace' BYTES → hex of the raw bytes) plus the
    -- HEADERS list rendered as name:hex pairs
    SELECT * FROM (VALUES
        (0, 'en',  '7765-62',   'lang=656e,src=776562'),
        (1, 'fr',  NULL,        'lang=6672'),
        (2, NULL,  NULL,        '')
    ) AS t(off, lang, trace_hex, all_headers)
    ORDER BY off
    """,
    "source", "kafka", "sqlfront", "headers",
)
def kafka_source_include_headers(spark, sf_dir):
    """INCLUDE HEADERS / HEADER 'key' [BYTES] end-to-end over the wire:
    records with headers produce as magic-2 record batches (Produce v3,
    CRC-32C — the only Kafka format that carries headers), fetch back
    through the same decoder, and the SQL source projects them per the
    reference's KafkaMetadataKind (src/storage-types/src/sources/
    kafka.rs:299,534-540): HEADERS as list<record{key, value bytes}>,
    HEADER 'k' as the one value (text unless BYTES), NULL when absent."""
    from pyspark.sql import functions as F

    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )

    with MiniBroker() as b:
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("hdr_feed", 0, [
                (b"k1", b'{"v": 1}', 10,
                 [("lang", b"en"), ("src", b"web")]),
                (b"k2", b'{"v": 2}', 11, [("lang", b"fr")]),
            ])
            c.produce("hdr_feed", 0, [(b"k3", b'{"v": 3}', 12)])
        s = MzSession(spark, sf_dir)
        s.execute(f"CREATE CONNECTION hdr_conn TO KAFKA "
                  f"(BROKER '{b.host}:{b.port}')")
        s.execute("CREATE SOURCE hdr_src FROM KAFKA CONNECTION hdr_conn "
                  "(TOPIC 'hdr_feed') FORMAT JSON INCLUDE OFFSET, "
                  "HEADERS, HEADER 'lang' AS lang, "
                  "HEADER 'src' AS src_raw BYTES")
        out = s.execute("SELECT * FROM hdr_src")
        return (out.select(
            F.col("offset").cast("bigint").alias("off"),
            "lang",
            # hex with a dash so the oracle literal is format-stable
            F.when(F.col("src_raw").isNotNull(),
                   F.concat(F.lower(F.hex(F.expr("substring(src_raw, 1, 2)"))),
                            F.lit("-"),
                            F.lower(F.hex(F.expr("substring(src_raw, 3)")))))
            .alias("trace_hex"),
            F.array_join(
                F.transform(
                    F.col("headers"),
                    lambda h: F.concat(h["key"], F.lit("="),
                                       F.lower(F.hex(h["value"])))),
                ",").alias("all_headers"))
            .orderBy("off"))


@register(
    "kafka_source_continuous_tick",
    """
    -- oracle: literal truth of the produce script — the snapshot saw
    -- only k1@1; two tick rounds ingested the post-CREATE records, so
    -- the delta-maintained count over the SOURCE reflects all five
    SELECT * FROM (VALUES
        ('k1', CAST(3 AS BIGINT)),
        ('k2', CAST(2 AS BIGINT))
    ) AS t(key, n) ORDER BY key
    """,
    "source", "kafka", "streaming", "delta-mv",
)
def kafka_source_continuous_tick(spark, sf_dir):
    """The reference's PRIMARY loop end-to-end: Kafka topic → SOURCE →
    delta-maintained MV, CONTINUOUSLY. Records produced AFTER CREATE
    SOURCE arrive via the host-driven tick (tick_sources polls the
    committed offset frontier — kafka.rs consume → emit → advance) and
    apply as ordinary commits, so the always-fresh MV over the source
    updates with no REFRESH anywhere. Two tick rounds prove the
    frontier advances (no re-ingestion)."""
    import json as _json

    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )

    with MiniBroker() as b:
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("cont_m", 0,
                      [(b"k1", _json.dumps({"v": 1}).encode(), 1)])
        s = MzSession(spark, sf_dir)
        s.execute(f"CREATE CONNECTION cont_kc TO KAFKA "
                  f"(BROKER '{b.host}:{b.port}')")
        s.execute("CREATE SOURCE cont_ev FROM KAFKA CONNECTION cont_kc "
                  "(TOPIC 'cont_m') FORMAT JSON")
        s.execute("CREATE MATERIALIZED VIEW cont_mv WITH (MAINTENANCE "
                  "'delta') AS SELECT key, COUNT(*) AS n FROM cont_ev "
                  "GROUP BY key")
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("cont_m", 0,
                      [(b"k1", _json.dumps({"v": 2}).encode(), 2),
                       (b"k2", _json.dumps({"v": 9}).encode(), 3)])
        s.tick_sources()
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("cont_m", 0,
                      [(b"k2", _json.dumps({"v": 1}).encode(), 4),
                       (b"k1", _json.dumps({"v": 0}).encode(), 5)])
        s.tick_sources()
        s.tick_sources()  # idle round: frontier already advanced
        return s.sql("SELECT key, n FROM cont_mv ORDER BY key")


@register(
    "cdc_pgoutput_continuous_tick",
    """
    -- oracle: literal truth of the two-phase replication script —
    -- snapshot (alice, bob), then ticked WAL renames bob, adds carol,
    -- deletes alice
    SELECT * FROM (VALUES
        (CAST(2 AS INTEGER), 'bobby'),
        (CAST(3 AS INTEGER), 'carol')
    ) AS t(id, name) ORDER BY id
    """,
    "cdc", "source", "pgoutput", "streaming",
)
def cdc_pgoutput_continuous_tick(spark, sf_dir):
    """Continuous Postgres replication end-to-end at the SQL surface:
    CREATE SOURCE snapshots the slot's current log, then WAL frames
    appended AFTERWARDS arrive via the host-driven tick (tick_sources
    decodes only frames past the applied LSN frontier — the
    reference's replication.rs stream keeping the table current after
    snapshot.rs hands off). Update + insert + delete all land; a
    second idle tick proves the frontier advanced."""
    import tempfile

    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.pgoutput import (
        encode_delete, encode_insert, encode_relation, encode_update,
    )
    OID = 920
    rel = encode_relation(OID, "public", "folk",
                          [("id", 23, True), ("name", 25, False)])
    logdir = tempfile.mkdtemp(prefix="mz_cdc_tick_")
    spark.createDataFrame(
        [(1, bytearray(rel)),
         (2, bytearray(encode_insert(OID, [1, "alice"]))),
         (3, bytearray(encode_insert(OID, [2, "bob"])))],
        "lsn long, message binary").write.mode("append").parquet(logdir)
    s = MzSession(spark, sf_dir)
    s.execute(f"CREATE CONNECTION ctk_conn TO POSTGRES "
              f"(log = '{logdir}')")
    s.execute("CREATE SOURCE ctk FROM POSTGRES CONNECTION ctk_conn "
              "(PUBLICATION 'mz') FOR ALL TABLES")
    spark.createDataFrame(
        [(4, bytearray(encode_update(OID, [2, "bobby"],
                                     old_vals=[2, None],
                                     old_is_key_only=True))),
         (5, bytearray(encode_insert(OID, [3, "carol"]))),
         (6, bytearray(encode_delete(OID, [1, None])))],
        "lsn long, message binary").write.mode("append").parquet(logdir)
    s.tick_sources()
    s.tick_sources()  # idle: frontier already advanced
    return s.sql("SELECT id, name FROM ctk_folk ORDER BY id")


@register(
    "cdc_pgoutput_via_ssh_tunnel",
    """
    -- identical logical changes to cdc_pgoutput_wire_apply, but the
    -- replication wire dials THROUGH an SSH-2 direct-tcpip tunnel
    SELECT n_nationkey,
           CASE WHEN n_nationkey = 0 THEN 'ZERO_RENAMED'
                ELSE n_name END AS n_name,
           CASE WHEN n_nationkey = 3 THEN 4
                WHEN n_nationkey = 5 THEN 0
                ELSE n_regionkey END AS n_regionkey
    FROM (SELECT n_nationkey,
                 CASE WHEN n_nationkey = 5 THEN 'PHOENIX'
                      ELSE n_name END AS n_name, n_regionkey
          FROM nation WHERE n_nationkey <> 7)
    UNION ALL
    SELECT CAST(25 AS INTEGER), 'NEWLAND', CAST(1 AS INTEGER)
    """,
    "cdc", "source", "pgoutput", "wire", "ssh-tunnel",
)
def cdc_pgoutput_via_ssh_tunnel(spark, sf_dir):
    """cdc_pgoutput_wire_apply's exact state fold, with the wire dialed
    through a real SSH tunnel (sources/ssh_tunnel.py: curve25519 kex,
    ed25519 host-key pinning, aes128-ctr + hmac-sha2-256, password
    auth, direct-tcpip forwarding) — reference SshConnection
    (src/storage-types/src/connections.rs:315) + ssh-util. Byte-equal
    WAL implies the tunnel is transparent to the replication client."""
    from materialize_spark.sources.pg_replication import (
        MiniPostgres, read_pg_replication,
    )
    from materialize_spark.sources.pgoutput import (
        apply_cdc, pgoutput_to_diff, decode_pgoutput_stream,
    )
    from materialize_spark.sources.ssh_tunnel import (
        SshTunnelServer, tunnel_dialer,
    )
    msgs, rels = _nation_log()
    wal = [(1000 + i, m) for i, m in enumerate(msgs)]
    with MiniPostgres(wal) as srv, \
            SshTunnelServer({"mz": "pw"}) as bastion:
        dial = tunnel_dialer({
            "host": bastion.host, "port": bastion.port,
            "user": "mz", "password": "pw",
            "host_key": bastion.host_public_key})
        log = read_pg_replication(spark, srv.host, srv.port,
                                  "mz_slot", "mz_pub", dialer=dial)
    env = decode_pgoutput_stream(log, relations=rels)
    diff = pgoutput_to_diff(env, rels[_NATION_OID])
    base = T(spark, sf_dir).nation
    return apply_cdc(base, diff, ["n_nationkey"])
