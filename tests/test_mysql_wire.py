"""MySQL binlog wire protocol: handshake, COM_BINLOG_DUMP, e2e decode.

Protocol under test is the PUBLIC client/server protocol (packet
framing, handshake v10/response 41, COM_BINLOG_DUMP with NON_BLOCK →
EOF); semantics mirrored are the reference's replica connection
(/root/reference/src/storage/src/source/mysql/replication.rs). The
canned binlog runs with binlog_checksum=CRC32 — the real-server default
— so the wire path exercises the round-6 checksum handling end-to-end.
"""

import pytest

from materialize_spark.sources.mysql_binlog import (
    T_DOUBLE, T_LONG, T_LONGLONG, T_VARCHAR, DELETE_ROWS_V2,
    UPDATE_ROWS_V2, WRITE_ROWS_V2, collect_table_maps,
    decode_binlog_stream, binlog_to_diff, encode_format_description,
    encode_rows_event, encode_table_map, with_crc32,
)
from materialize_spark.sources.mysql_wire import (
    MiniMySQL, MySQLBinlogClient, read_mysql_binlog,
)
from materialize_spark.sources.pgoutput import apply_cdc

TID = 9
COL_TYPES = [T_LONGLONG, T_VARCHAR, T_DOUBLE, T_LONG]
METADATA = [0, 400, 8, 0]
COLS = {"shop.orders": ["id", "sku", "price", "qty"]}
DDL = "id bigint, sku string, price double, qty int"


def _binlog():
    return [encode_format_description("crc32")] + [with_crc32(e) for e in [
        encode_table_map(TID, "shop", "orders", COL_TYPES, METADATA),
        encode_rows_event(WRITE_ROWS_V2, TID,
                          [[1, "a", 5.0, 1], [2, "b", 6.0, 2]],
                          COL_TYPES, METADATA),
        encode_rows_event(UPDATE_ROWS_V2, TID,
                          [([2, "b", 6.0, 2], [2, "b", 7.5, 3])],
                          COL_TYPES, METADATA),
        encode_rows_event(DELETE_ROWS_V2, TID, [[1, "a", 5.0, 1]],
                          COL_TYPES, METADATA),
        encode_rows_event(WRITE_ROWS_V2, TID, [[3, "c", 1.0, 9]],
                          COL_TYPES, METADATA),
    ]]


def test_handshake_and_dump():
    with MiniMySQL(_binlog()) as srv:
        with MySQLBinlogClient(srv.host, srv.port) as c:
            assert c.server_version.startswith("8.0")
            events = c.binlog_dump("binlog.000001", 4)
        assert len(events) == len(_binlog())
        # positions strictly increase (stream frontier)
        positions = [p for p, _ in events]
        assert positions == sorted(positions)
        assert srv.dump_requests == [("binlog.000001", 4)]


def test_dump_resume_from_pos():
    with MiniMySQL(_binlog()) as srv:
        with MySQLBinlogClient(srv.host, srv.port) as c:
            full = c.binlog_dump("", 4)
            resume_pos = full[2][0]  # after the first rows event
            tail = c.binlog_dump("", resume_pos)
        assert [p for p, _ in tail] == [p for p, _ in full[3:]]


def test_wire_to_apply_cdc_e2e(spark):
    """Handshake → dump → CRC32-checked decode → typed diff → state."""
    with MiniMySQL(_binlog()) as srv:
        log = read_mysql_binlog(spark, srv.host, srv.port)
        maps = collect_table_maps(log)
        assert maps["checksum"] == "crc32" and TID in maps
        env = decode_binlog_stream(log, table_maps=maps, columns=COLS)
        diff = binlog_to_diff(env, "shop.orders", DDL)
        base = spark.createDataFrame(
            [], "id bigint, sku string, price double, qty int")
        state = apply_cdc(base, diff, ["id"]).toPandas().sort_values("id")
        assert list(state.id) == [2, 3]
        assert state[state.id == 2].price.iloc[0] == pytest.approx(7.5)
        assert int(state[state.id == 2].qty.iloc[0]) == 3
