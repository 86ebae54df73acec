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
