"""MySQL binlog row-event decode: wire round-trip, envelope decode,
typed diff, and snapshot+stream CDC e2e (shared apply_cdc downstream).

Format under test is the PUBLIC binlog v4 event layout (TABLE_MAP +
ROWS_EVENT v2); semantics mirrored are the reference's rows-event →
(before, after) pair handling
(/root/reference/src/storage/src/source/mysql/replication/events.rs:
311-360) with column names supplied out-of-band, as the reference reads
them from information_schema (schemas.rs).
"""

import pytest

from materialize_spark.sources.mysql_binlog import (
    DELETE_ROWS_V2, T_DOUBLE, T_LONG, T_LONGLONG, T_VARCHAR,
    UPDATE_ROWS_V2, WRITE_ROWS_V2, collect_table_maps,
    decode_binlog_stream, binlog_to_diff, encode_rows_event,
    encode_table_map, parse_header, parse_rows_event, parse_table_map,
)
from materialize_spark.sources.pgoutput import apply_cdc

TID = 77
COL_TYPES = [T_LONGLONG, T_VARCHAR, T_DOUBLE, T_LONG]
METADATA = [0, 400, 8, 0]  # varchar max 400 → 2-byte length prefix
COLS = {"shop.orders": ["id", "sku", "price", "qty"]}
ROW_DDL = "id bigint, sku string, price double, qty int"


def _tme():
    return encode_table_map(TID, "shop", "orders", COL_TYPES, METADATA)


def _log():
    return [
        _tme(),
        encode_rows_event(WRITE_ROWS_V2, TID,
                          [[1, "a-1", 9.5, 2], [2, "b-2", 3.25, 1],
                           [3, "c-3", 7.0, None]],
                          COL_TYPES, METADATA),
        encode_rows_event(UPDATE_ROWS_V2, TID,
                          [([2, "b-2", 3.25, 1], [2, "b-2", 4.75, 6])],
                          COL_TYPES, METADATA),
        encode_rows_event(DELETE_ROWS_V2, TID, [[3, "c-3", 7.0, None]],
                          COL_TYPES, METADATA),
        encode_rows_event(WRITE_ROWS_V2, TID, [[4, "d-4", None, 9]],
                          COL_TYPES, METADATA),
    ]


def test_table_map_roundtrip():
    tme = parse_table_map(_tme())
    assert tme["table_id"] == TID
    assert (tme["schema"], tme["table"]) == ("shop", "orders")
    assert tme["column_types"] == COL_TYPES
    assert tme["metadata"] == METADATA
    hdr = parse_header(_tme())
    assert hdr["type"] == 19 and hdr["event_size"] == len(_tme())


def test_rows_event_roundtrip():
    maps = {}
    assert parse_rows_event(_tme(), maps) is None  # metadata
    envs = parse_rows_event(_log()[1], maps)
    assert [e["op"] for e in envs] == ["insert"] * 3
    assert envs[0]["after"] == [1, "a-1", 9.5, 2]
    assert envs[2]["after"][3] is None  # NULL survives the bitmap
    upd = parse_rows_event(_log()[2], maps)[0]
    assert upd["op"] == "update"
    assert upd["before"][2] == 3.25 and upd["after"][2] == 4.75
    dele = parse_rows_event(_log()[3], maps)[0]
    assert dele["op"] == "delete" and dele["after"] is None


def test_rows_for_unmapped_table_skipped():
    # events.rs: rows whose table_id has no TABLE_MAP → ignored
    assert parse_rows_event(_log()[1], {}) is None


def _log_df(spark):
    return spark.createDataFrame(
        [(i + 1, bytearray(m)) for i, m in enumerate(_log())],
        "pos long, event binary")


def test_decode_stream_and_diff(spark):
    df = _log_df(spark)
    maps = collect_table_maps(df)
    assert TID in maps
    env = decode_binlog_stream(df, table_maps=maps, columns=COLS)
    diff = binlog_to_diff(env, "shop.orders", ROW_DDL)
    pdf = diff.toPandas()
    assert str(pdf.dtypes["id"]) == "int64"
    assert len(pdf[pdf["diff"] == 1]) == 5   # 4 inserts + update-after
    assert len(pdf[pdf["diff"] == -1]) == 2  # update-before + delete
    # pos 3 is the update event; pos 2 is the original insert of id=2
    upd_after = pdf[(pdf.id == 2) & (pdf["diff"] == 1) & (pdf.lsn == 3)]
    assert upd_after.price.iloc[0] == pytest.approx(4.75)
    assert int(upd_after.qty.iloc[0]) == 6


def test_apply_cdc_e2e(spark):
    base = spark.createDataFrame(
        [], "id bigint, sku string, price double, qty int")
    df = _log_df(spark)
    env = decode_binlog_stream(df, columns=COLS)  # implicit driver harvest
    diff = binlog_to_diff(env, "shop.orders", ROW_DDL)
    state = apply_cdc(base, diff, ["id"]).toPandas().sort_values("id")
    assert list(state.id) == [1, 2, 4]  # 3 deleted
    assert state[state.id == 2].price.iloc[0] == pytest.approx(4.75)
    assert state[state.id == 4].price.isna().all()


def test_crc32_checksum_mode():
    """Real MySQL servers default binlog_checksum=CRC32 since 5.6: the
    FORMAT_DESCRIPTION declares the mode and every following event
    carries a 4-byte trailer that must be verified and trimmed, not
    decoded as row data (ADVICE r5)."""
    from materialize_spark.sources.mysql_binlog import (
        encode_format_description, parse_format_description, with_crc32,
    )
    fd = encode_format_description("crc32")
    assert parse_format_description(fd)["checksum"] == "crc32"
    maps = {}
    assert parse_rows_event(fd, maps) is None
    assert maps["checksum"] == "crc32"
    # checksummed TABLE_MAP + rows events decode identically
    assert parse_rows_event(with_crc32(_tme()), maps) is None
    envs = parse_rows_event(with_crc32(_log()[1]), maps)
    assert [e["after"] for e in envs] == [
        [1, "a-1", 9.5, 2], [2, "b-2", 3.25, 1], [3, "c-3", 7.0, None]]
    # corrupting the trailer is caught
    bad = bytearray(with_crc32(_log()[3]))
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        parse_rows_event(bytes(bad), maps)
    # checksum NONE: unadorned events still decode (back-compat)
    maps2 = {}
    assert parse_rows_event(encode_format_description("none"),
                            maps2) is None
    assert parse_rows_event(_tme(), maps2) is None
    assert len(parse_rows_event(_log()[1], maps2)) == 3


def test_crc32_stream_e2e(spark):
    """Whole checksummed binlog through the Spark decode path: the FD
    event rides in the frame, collect_table_maps harvests the mode, and
    apply_cdc lands the same final state as the unchecksummed log."""
    from materialize_spark.sources.mysql_binlog import (
        encode_format_description, with_crc32,
    )
    events = [encode_format_description("crc32")] + [
        with_crc32(e) for e in _log()]
    df = spark.createDataFrame(
        [(i + 1, bytearray(m)) for i, m in enumerate(events)],
        "pos long, event binary")
    maps = collect_table_maps(df)
    assert maps["checksum"] == "crc32" and TID in maps
    env = decode_binlog_stream(df, table_maps=maps, columns=COLS)
    diff = binlog_to_diff(env, "shop.orders", ROW_DDL)
    base = spark.createDataFrame(
        [], "id bigint, sku string, price double, qty int")
    state = apply_cdc(base, diff, ["id"]).toPandas().sort_values("id")
    assert list(state.id) == [1, 2, 4]
    assert state[state.id == 2].price.iloc[0] == pytest.approx(4.75)


def test_unnamed_columns_fall_back_positional(spark):
    df = _log_df(spark)
    env = decode_binlog_stream(df)  # no column names supplied
    row = env.filter("op = 'insert'").orderBy("pos").first()
    import json
    assert json.loads(row.after)["c0"] == 1


def test_checksum_flip_mid_stream(spark):
    """binlog_checksum can flip when the server restarts with changed
    config: a new FORMAT_DESCRIPTION declares the new mode mid-stream.
    Both the driver-side harvest (now one ORDERED pass: each table map
    verifies with the mode in effect at its position) and the in-task
    data decode must honor the flip."""
    from materialize_spark.sources.mysql_binlog import (
        WRITE_ROWS_V2, encode_format_description, encode_rows_event,
        with_crc32,
    )
    pre = encode_rows_event(WRITE_ROWS_V2, TID, [[1, "pre", 1.0, 1]],
                            COL_TYPES, METADATA)
    post = encode_rows_event(WRITE_ROWS_V2, TID, [[2, "post", 2.0, 2]],
                             COL_TYPES, METADATA)
    events = [
        encode_format_description("none"),
        _tme(), pre,
        # server restart: checksum now CRC32 — everything after carries
        # (and must be verified against) a CRC32 trailer
        encode_format_description("crc32"),
        with_crc32(_tme()), with_crc32(post),
    ]
    df = spark.createDataFrame(
        [(i + 1, bytearray(m)) for i, m in enumerate(events)],
        "pos long, event binary")
    maps = collect_table_maps(df)
    assert TID in maps and maps["checksum"] == "crc32"
    env = decode_binlog_stream(df.coalesce(1), columns=COLS).collect()
    import json as _json
    got = sorted(_json.loads(r.after)["sku"] for r in env)
    assert got == ["post", "pre"]


def test_checksum_flip_across_partitions(spark):
    """A decode task starting PAST the flip (multi-partition frame, no
    in-task FD event) must still verify with the mode at its events'
    positions: the harvest carries the (position → mode) break list."""
    from materialize_spark.sources.mysql_binlog import (
        WRITE_ROWS_V2, encode_format_description, encode_rows_event,
        with_crc32,
    )
    pre = encode_rows_event(WRITE_ROWS_V2, TID, [[1, "pre", 1.0, 1]],
                            COL_TYPES, METADATA)
    post = encode_rows_event(WRITE_ROWS_V2, TID, [[2, "post", 2.0, 2]],
                             COL_TYPES, METADATA)
    events = [
        encode_format_description("none"), _tme(), pre,
        encode_format_description("crc32"), with_crc32(_tme()),
        with_crc32(post),
    ]
    rows = [(i + 1, bytearray(m)) for i, m in enumerate(events)]
    # two slices: [fd-none, tme, pre] | [fd-crc32, tme, post] — then
    # THREE slices so the crc32 data event lands in a task with no FD
    for slices in (2, 3):
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, slices),
            "pos long, event binary")
        env = decode_binlog_stream(df, columns=COLS).collect()
        import json as _json
        got = sorted(_json.loads(r.after)["sku"] for r in env)
        assert got == ["post", "pre"], f"slices={slices}"
