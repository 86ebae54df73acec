"""Property-based round-trips for the CDC wire codecs (pure Python —
no Spark session needed, so hypothesis can run hundreds of cases).

Mirrors the reference's proptest strategy for decode paths (SURVEY §5):
arbitrary rows → encode → parse → identical values, across the
supported column-type matrix and null patterns.
"""

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from materialize_spark.sources import mysql_binlog as mb
from materialize_spark.sources import pgoutput as pg

# ---------------------------------------------------------------- mysql
_INT_RANGES = {
    mb.T_TINY: (-(2 ** 7), 2 ** 7 - 1),
    mb.T_SHORT: (-(2 ** 15), 2 ** 15 - 1),
    mb.T_INT24: (-(2 ** 23), 2 ** 23 - 1),
    mb.T_LONG: (-(2 ** 31), 2 ** 31 - 1),
    mb.T_LONGLONG: (-(2 ** 63), 2 ** 63 - 1),
}


def _value_for(ctype):
    if ctype in _INT_RANGES:
        lo, hi = _INT_RANGES[ctype]
        return st.integers(lo, hi)
    if ctype == mb.T_FLOAT:
        # round-trips through IEEE binary32: quantize via struct
        return st.floats(allow_nan=False, allow_infinity=False,
                         width=32).map(
            lambda v: struct.unpack("<f", struct.pack("<f", v))[0])
    if ctype == mb.T_DOUBLE:
        return st.floats(allow_nan=False, allow_infinity=False)
    return st.text(max_size=40)  # VARCHAR


col_types = st.lists(
    st.sampled_from([mb.T_TINY, mb.T_SHORT, mb.T_INT24, mb.T_LONG,
                     mb.T_LONGLONG, mb.T_FLOAT, mb.T_DOUBLE,
                     mb.T_VARCHAR]),
    min_size=1, max_size=6)


@st.composite
def binlog_case(draw):
    types = draw(col_types)
    meta = [255 if t == mb.T_VARCHAR else (4 if t == mb.T_FLOAT else
            (8 if t == mb.T_DOUBLE else 0)) for t in types]
    n_rows = draw(st.integers(1, 5))
    rows = []
    for _ in range(n_rows):
        row = [None if draw(st.booleans()) and i % 2 == 0
               else draw(_value_for(t))
               for i, t in enumerate(types)]
        rows.append(row)
    return types, meta, rows


@given(binlog_case())
@settings(max_examples=200, deadline=None)
def test_mysql_write_rows_round_trip(case):
    types, meta, rows = case
    maps = {}
    tm = mb.encode_table_map(42, "s", "t", types, meta)
    assert mb.parse_rows_event(tm, maps) is None  # metadata, not data
    ev = mb.encode_rows_event(mb.WRITE_ROWS_V2, 42, rows, types, meta)
    out = mb.parse_rows_event(ev, maps)
    assert len(out) == len(rows)
    for env, row in zip(out, rows):
        assert env["op"] == "insert" and env["before"] is None
        for got, want in zip(env["after"], row):
            if isinstance(want, float):
                assert got is not None and math.isclose(
                    got, want, rel_tol=1e-6, abs_tol=1e-30)
            else:
                assert got == want


@given(binlog_case())
@settings(max_examples=100, deadline=None)
def test_mysql_update_rows_pair_round_trip(case):
    types, meta, rows = case
    pairs = [(r, r) for r in rows]  # full before/after images
    maps = {}
    mb.parse_rows_event(mb.encode_table_map(7, "s", "t", types, meta), maps)
    ev = mb.encode_rows_event(mb.UPDATE_ROWS_V2, 7, pairs, types, meta)
    out = mb.parse_rows_event(ev, maps)
    assert [e["op"] for e in out] == ["update"] * len(pairs)
    for env, (before, after) in zip(out, pairs):
        for got, want in zip(env["before"] + env["after"], before + after):
            if isinstance(want, float):
                assert math.isclose(got, want, rel_tol=1e-6, abs_tol=1e-30)
            else:
                assert got == want


# ------------------------------------------------------------- pgoutput
pg_text = st.one_of(st.none(), st.text(max_size=30))


@given(st.lists(pg_text, min_size=1, max_size=6), st.integers(1, 10 ** 6))
@settings(max_examples=200, deadline=None)
def test_pgoutput_insert_round_trip(vals, oid):
    cols = [(f"c{i}", 25, i == 0) for i in range(len(vals))]
    rel = pg.parse_relation(pg.encode_relation(oid, "public", "t", cols))
    assert [c["name"] for c in rel["columns"]] == [c[0] for c in cols]
    assert [c["is_key"] for c in rel["columns"]] == [c[2] for c in cols]
    msg = pg.parse_message(pg.encode_insert(oid, list(vals)),
                           {rel["oid"]: rel})
    got = [msg["after"].get(f"c{i}") for i in range(len(vals))]
    assert got == [v for v in vals]


@given(st.lists(st.integers(-10 ** 9, 10 ** 9), min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_pgoutput_delete_key_round_trip(keys):
    cols = [(f"k{i}", 23, True) for i in range(len(keys))]
    rel = pg.parse_relation(pg.encode_relation(5, "public", "t", cols))
    msg = pg.parse_message(pg.encode_delete(5, list(keys)),
                           {rel["oid"]: rel})
    assert msg["op"] == "delete"
    got = [msg["before"].get(f"k{i}") for i in range(len(keys))]
    assert got == [str(k) for k in keys]  # pgoutput text mode


# ------------------------------------------------------------ sqlserver
@given(st.integers(0, 2 ** 32 - 1), st.integers(0, 2 ** 32 - 1),
       st.integers(0, 2 ** 16 - 1))
@settings(max_examples=200, deadline=None)
def test_sqlserver_lsn_bytes_order_is_numeric_order(vlf, block, rec):
    from materialize_spark.sources.sqlserver_cdc import lsn_bytes
    a = lsn_bytes(vlf, block, rec)
    b = lsn_bytes(vlf, block, min(rec + 1, 2 ** 16 - 1))
    c = lsn_bytes(min(vlf + 1, 2 ** 32 - 1), 0, 0)
    assert len(a) == 10
    assert a <= b <= c or (rec == 2 ** 16 - 1 or vlf == 2 ** 32 - 1)
    # hex encoding preserves the order (the Spark-side sort key)
    assert (a.hex() <= b.hex()) == (a <= b)


def test_cdc_final_state_invariant_to_partition_layout(spark):
    """Partition-layout invariance: a wire drain decoded with 1, 2, 3,
    or 5 slices must land the IDENTICAL final state — the deterministic
    wire-position seq makes (lsn, seq) a total order no matter how the
    frame is partitioned. Uses a history with same-LSN insert/delete
    ties and an update pair, the shapes that broke per-task counters."""
    from materialize_spark.sources.pgoutput import (
        apply_cdc, collect_relations, decode_pgoutput_stream,
        encode_delete, encode_insert, encode_relation, encode_update,
        pgoutput_to_diff,
    )

    oid = 31001
    rel = encode_relation(oid, "public", "items",
                          [("id", 20, True), ("v", 25, False)])
    history = [
        (1, rel),
        (5, encode_insert(oid, [1, "a"])),
        (5, encode_delete(oid, [1, None])),          # same-LSN tie
        (5, encode_insert(oid, [2, "b"])),
        (8, encode_update(oid, [2, "b2"], old_vals=[2, "b"])),
        (9, encode_insert(oid, [3, "c"])),
        (9, encode_delete(oid, [3, None])),          # another tie
        (9, encode_insert(oid, [3, "c2"])),
    ]
    rows = [(lsn, bytearray(m)) for lsn, m in history]
    states = []
    for slices in (1, 2, 3, 5):
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, slices),
            "lsn long, message binary")
        rels = collect_relations(df)
        diff = pgoutput_to_diff(
            decode_pgoutput_stream(df, relations=rels), rels[oid])
        base = spark.createDataFrame([], "id long, v string")
        got = sorted((r.id, r.v) for r in
                     apply_cdc(base, diff, ["id"]).collect())
        states.append(got)
    assert all(s == states[0] for s in states), states
    assert states[0] == [(2, "b2"), (3, "c2")]
