"""pgoutput logical-replication decode: wire round-trip, envelope decode,
typed projection, and snapshot+stream CDC e2e.

Protocol under test is the PUBLIC pgoutput format
(postgresql.org/docs/current/protocol-logicalrep-message-formats.html);
the semantics mirrored are the reference's Insert→+1 / Update→retract+
insert / Delete→-1 mapping
(/root/reference/src/storage/src/source/postgres/replication.rs:920-996).
"""

import pandas as pd
import pytest

from materialize_spark.sources.pgoutput import (
    PG_TYPE_OIDS, apply_cdc, collect_relations, decode_pgoutput_stream,
    encode_begin, encode_commit, encode_delete, encode_insert,
    encode_relation, encode_truncate, encode_update, parse_message,
    parse_relation, pgoutput_to_diff,
)

ACCOUNTS_OID = 16401
ACCOUNTS_COLS = [("id", 20, True), ("name", 1043, False),
                 ("balance", 701, False), ("active", 16, False)]


def _relation_msg():
    return encode_relation(ACCOUNTS_OID, "public", "accounts",
                           ACCOUNTS_COLS)


def _txn_log():
    """One snapshot-era table + a replication transaction log:
    insert 1..3, update 2 (balance), delete 3, insert 4, then an
    update of 1 with key-only old tuple."""
    us = 1_700_000_000_000_000
    return [
        _relation_msg(),
        encode_begin(1000, us, 701),
        encode_insert(ACCOUNTS_OID, [1, "alice", 10.5, "t"]),
        encode_insert(ACCOUNTS_OID, [2, "bob", 20.0, "f"]),
        encode_insert(ACCOUNTS_OID, [3, "carol", 30.25, "t"]),
        encode_commit(1000, 1001, us),
        encode_begin(2000, us + 1, 702),
        encode_update(ACCOUNTS_OID, [2, "bob", 99.75, "f"],
                      old_vals=[2, "bob", 20.0, "f"]),
        encode_delete(ACCOUNTS_OID, [3, None, None, None], key_only=True),
        encode_insert(ACCOUNTS_OID, [4, "dave", None, "t"]),
        encode_commit(2000, 2001, us + 1),
    ]


def test_parse_relation_wire():
    rel = parse_relation(_relation_msg())
    assert rel["oid"] == ACCOUNTS_OID
    assert rel["name"] == "accounts"
    assert rel["namespace"] == "public"
    assert [c["name"] for c in rel["columns"]] == [
        "id", "name", "balance", "active"]
    assert rel["columns"][0]["is_key"] and not rel["columns"][1]["is_key"]
    assert rel["columns"][2]["type_oid"] == 701


def test_parse_message_dispatch():
    rels = {}
    assert parse_message(_relation_msg(), rels) is None  # metadata
    assert ACCOUNTS_OID in rels
    ins = parse_message(encode_insert(ACCOUNTS_OID, [7, "x", 1.5, "t"]),
                        rels)
    assert ins["op"] == "insert"
    assert ins["after"] == {"id": "7", "name": "x", "balance": "1.5",
                            "active": "t"}
    upd = parse_message(
        encode_update(ACCOUNTS_OID, [7, "y", 2.0, "f"],
                      old_vals=[7, None, None, None], old_is_key_only=True),
        rels)
    assert upd["op"] == "update" and upd["key_only_before"]
    assert upd["before"]["id"] == "7" and upd["before"]["name"] is None
    dele = parse_message(encode_delete(ACCOUNTS_OID, [7, None, None, None]),
                         rels)
    assert dele["op"] == "delete" and dele["after"] is None
    # framing messages are swallowed
    assert parse_message(encode_begin(1, 1_700_000_000_000_000, 1),
                         rels) is None
    assert parse_message(encode_commit(1, 2, 1_700_000_000_000_000),
                         rels) is None
    trunc = parse_message(encode_truncate([ACCOUNTS_OID]), rels)
    assert trunc == {"op": "truncate", "relations": ["accounts"]}


def test_data_before_relation_is_ignored():
    # replication.rs:916-919: data for unknown rel_id increments `ignored`.
    assert parse_message(encode_insert(999, [1]), {}) is None


def _log_df(spark, msgs):
    return spark.createDataFrame(
        [(i + 1, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn long, message binary")


def test_decode_stream_envelope(spark):
    import json as _json
    env = decode_pgoutput_stream(_log_df(spark, _txn_log())).collect()
    def side(r):
        return _json.loads(r.after if r.after else r.before)
    ops = [(r.op, side(r)["id"]) for r in sorted(env, key=lambda r: r.lsn)]
    assert ops == [("insert", "1"), ("insert", "2"), ("insert", "3"),
                   ("update", "2"), ("delete", "3"), ("insert", "4")]
    upd = [r for r in env if r.op == "update"][0]
    assert _json.loads(upd.before)["balance"] == "20.0"
    assert _json.loads(upd.after)["balance"] == "99.75"


def test_typed_diff_frame(spark):
    df = _log_df(spark, _txn_log())
    rels = collect_relations(df)
    env = decode_pgoutput_stream(df, relations=rels)
    diff = pgoutput_to_diff(env, rels[ACCOUNTS_OID])
    pdf = diff.toPandas().sort_values(["lsn", "diff"]).reset_index(drop=True)
    # schema is typed, not text
    assert str(pdf.dtypes["id"]) == "int64"
    assert pdf[pdf.id == 4].balance.isna().all()  # NULL survives typing
    adds = pdf[pdf["diff"] == 1]
    rets = pdf[pdf["diff"] == -1]
    assert len(adds) == 5 and len(rets) == 2  # 4 inserts + upd-after; upd-before + delete
    bob_new = adds[(adds.id == 2) & (adds.balance > 99)]
    assert len(bob_new) == 1 and bool(bob_new.active.iloc[0]) is False


def test_apply_cdc_snapshot_plus_stream(spark):
    base = spark.createDataFrame(
        [], "id long, name string, balance double, active boolean")
    df = _log_df(spark, _txn_log())
    rels = collect_relations(df)
    diff = pgoutput_to_diff(decode_pgoutput_stream(df, relations=rels),
                            rels[ACCOUNTS_OID])
    state = apply_cdc(base, diff, ["id"]).toPandas().sort_values("id")
    assert list(state.id) == [1, 2, 4]  # 3 deleted
    assert state[state.id == 2].balance.iloc[0] == pytest.approx(99.75)
    assert state[state.id == 4].balance.isna().all()


def test_apply_cdc_nonempty_snapshot(spark):
    """Snapshot rows exist; replication updates/deletes/re-inserts them —
    the snapshot-then-rewind handoff of the reference's source."""
    base = spark.createDataFrame(
        [(1, "alice", 10.5, True), (3, "carol", 30.25, True),
         (9, "zoe", 1.0, False)],
        "id long, name string, balance double, active boolean")
    msgs = [
        _relation_msg(),
        encode_update(ACCOUNTS_OID, [1, "alice", 11.0, "t"],
                      old_vals=[1, "alice", 10.5, "t"]),
        encode_delete(ACCOUNTS_OID, [9, None, None, None]),
        encode_delete(ACCOUNTS_OID, [3, None, None, None]),
        encode_insert(ACCOUNTS_OID, [3, "carol2", 3.0, "f"]),
    ]
    df = _log_df(spark, msgs)
    rels = collect_relations(df)
    diff = pgoutput_to_diff(decode_pgoutput_stream(df, relations=rels),
                            rels[ACCOUNTS_OID])
    state = apply_cdc(base, diff, ["id"]).toPandas().sort_values("id")
    assert list(state.id) == [1, 3]
    assert state[state.id == 1].balance.iloc[0] == pytest.approx(11.0)
    assert state[state.id == 3].name.iloc[0] == "carol2"  # delete+reinsert


def test_truncate_errors_the_stream(spark):
    """TRUNCATE of a replicated table puts the stream into an errored
    state (reference: a truncate is a definite error — it cannot be
    expressed as diffs); on_truncate="ignore" restores the old skip."""
    msgs = [
        _relation_msg(),
        encode_insert(ACCOUNTS_OID, [1, "alice", 10.5, "t"]),
        encode_truncate([ACCOUNTS_OID]),
    ]
    df = _log_df(spark, msgs)
    rels = collect_relations(df)
    env = decode_pgoutput_stream(df, relations=rels)
    assert [r.op for r in env.collect()] == ["insert", "truncate"]
    diff = pgoutput_to_diff(env, rels[ACCOUNTS_OID])
    with pytest.raises(Exception, match="TRUNCATE of replicated table"):
        diff.collect()
    # ignore mode: truncate rows dropped, stream keeps serving
    lenient = pgoutput_to_diff(env, rels[ACCOUNTS_OID],
                               on_truncate="ignore")
    assert lenient.count() == 1


def test_same_lsn_insert_then_delete(spark):
    """Insert-then-delete of one key inside a single LSN must not
    resurrect the row: the per-message seq orders the tie (ADVICE r5)."""
    msgs = [
        _relation_msg(),
        encode_insert(ACCOUNTS_OID, [7, "ghost", 1.0, "t"]),
        encode_delete(ACCOUNTS_OID, [7, None, None, None]),
    ]
    # both data messages share lsn=5 (one transaction)
    df = spark.createDataFrame(
        [(1, bytearray(msgs[0])), (5, bytearray(msgs[1])),
         (5, bytearray(msgs[2]))],
        "lsn long, message binary").coalesce(1)
    rels = collect_relations(df)
    diff = pgoutput_to_diff(decode_pgoutput_stream(df, relations=rels),
                            rels[ACCOUNTS_OID])
    base = spark.createDataFrame(
        [], "id long, name string, balance double, active boolean")
    assert apply_cdc(base, diff, ["id"]).count() == 0
    # and the reverse order (delete a snapshot row, re-insert at one lsn)
    msgs2 = [
        _relation_msg(),
        encode_delete(ACCOUNTS_OID, [7, None, None, None]),
        encode_insert(ACCOUNTS_OID, [7, "back", 2.0, "f"]),
    ]
    df2 = spark.createDataFrame(
        [(1, bytearray(msgs2[0])), (5, bytearray(msgs2[1])),
         (5, bytearray(msgs2[2]))],
        "lsn long, message binary").coalesce(1)
    rels2 = collect_relations(df2)
    diff2 = pgoutput_to_diff(decode_pgoutput_stream(df2, relations=rels2),
                             rels2[ACCOUNTS_OID])
    base2 = spark.createDataFrame(
        [(7, "orig", 1.0, True)],
        "id long, name string, balance double, active boolean")
    state = apply_cdc(base2, diff2, ["id"]).toPandas()
    assert list(state.name) == ["back"]


def test_same_lsn_tie_across_partitions(spark):
    """Same-LSN ordering must survive a MULTI-partition log frame: the
    decode seq is partition-prefixed (partition order == wire order), so
    an insert in task 0 and its delete in task 1 at one LSN still apply
    insert-then-delete — per-task counters alone would overlap and could
    resurrect the row (driver ADVICE r6)."""
    msgs = [
        _relation_msg(),
        encode_insert(ACCOUNTS_OID, [7, "ghost", 1.0, "t"]),
        encode_delete(ACCOUNTS_OID, [7, None, None, None]),
    ]
    rows = [(1, bytearray(msgs[0])), (5, bytearray(msgs[1])),
            (5, bytearray(msgs[2]))]
    # two slices in wire order: [rel, insert] | [delete]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        "lsn long, message binary")
    assert df.rdd.getNumPartitions() == 2
    rels = collect_relations(df)
    diff = pgoutput_to_diff(decode_pgoutput_stream(df, relations=rels),
                            rels[ACCOUNTS_OID])
    base = spark.createDataFrame(
        [], "id long, name string, balance double, active boolean")
    assert apply_cdc(base, diff, ["id"]).count() == 0


def test_oid_coverage():
    # every advertised OID casts to a valid Spark type string
    from pyspark.sql.types import _parse_datatype_string
    for oid, t in PG_TYPE_OIDS.items():
        _parse_datatype_string(t)


def test_relation_redeclared_mid_stream_across_partitions(spark):
    """ALTER TABLE on the publisher sends a fresh 'R' with the new
    schema mid-stream: each message must decode with the relation
    version in effect AT ITS LSN, even when the decode task never sees
    the 'R' event (multi-partition frame). The harvest's versioned
    relation_breaks make that hold."""
    import json as _json

    v1 = encode_relation(ACCOUNTS_OID, "public", "accounts",
                         [("id", 20, True), ("name", 1043, False)])
    v2 = encode_relation(ACCOUNTS_OID, "public", "accounts",
                         [("id", 20, True), ("name", 1043, False),
                          ("vip", 16, False)])
    msgs = [
        (1, v1),
        (2, encode_insert(ACCOUNTS_OID, [1, "old"])),
        (3, v2),  # ALTER adds a column
        (4, encode_insert(ACCOUNTS_OID, [2, "new", "t"])),
    ]
    rows = [(lsn, bytearray(m)) for lsn, m in msgs]
    for slices in (1, 2, 4):
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, slices),
            "lsn long, message binary")
        rels = collect_relations(df)
        env = decode_pgoutput_stream(df, relations=rels).collect()
        after = {r.lsn: _json.loads(r.after) for r in env
                 if r.op == "insert"}
        assert after[2] == {"id": "1", "name": "old"}, f"slices={slices}"
        assert after[4] == {"id": "2", "name": "new", "vip": "t"}, \
            f"slices={slices}"
