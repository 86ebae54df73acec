"""SQL Server CDC change-table decode (sources/sqlserver_cdc.py).

Semantics under test mirror the reference's parser
(/root/reference/src/sql-server-util/src/cdc.rs:719-792): operation
codes 1-4, LSN byte order, intra-transaction seqval order, update pairs
sharing a seqval, unknown codes erroring.
"""

import pytest
from pyspark.sql import functions as F

from materialize_spark.sources.sqlserver_cdc import (
    OP_DELETE, OP_INSERT, OP_UPDATE_NEW, OP_UPDATE_OLD, apply_changes,
    changes_to_diff, lsn_bytes,
)

DDL = ("`__$start_lsn` binary, `__$seqval` binary, `__$operation` int, "
       "k long, v string")


def _ct(spark, rows):
    return spark.createDataFrame(
        [(bytearray(a), bytearray(b), op, k, v)
         for a, b, op, k, v in rows], DDL)


def test_operation_codes_map_to_diffs(spark):
    ct = _ct(spark, [
        (lsn_bytes(1), lsn_bytes(0, 0, 1), OP_INSERT, 1, "a"),
        (lsn_bytes(2), lsn_bytes(0, 0, 1), OP_DELETE, 1, "a"),
        (lsn_bytes(3), lsn_bytes(0, 0, 1), OP_UPDATE_OLD, 2, "old"),
        (lsn_bytes(3), lsn_bytes(0, 0, 1), OP_UPDATE_NEW, 2, "new"),
    ])
    out = {(r.k, r.v): r.diff for r in changes_to_diff(ct).collect()}
    assert out == {(1, "a"): -1, (2, "old"): -1, (2, "new"): 1}
    # the insert and delete of (1,"a") both appear; dict collapsed them
    diffs = sorted(r.diff for r in changes_to_diff(ct).collect())
    assert diffs == [-1, -1, 1, 1]


def test_lsn_hex_key_is_byte_order(spark):
    # VLF 256 vs record 65535: numeric order must survive the hex encoding
    ct = _ct(spark, [
        (lsn_bytes(256), lsn_bytes(0, 0, 1), OP_INSERT, 1, "later"),
        (lsn_bytes(255, 0xFFFFFFFF, 0xFFFF), lsn_bytes(0, 0, 1),
         OP_INSERT, 2, "earlier"),
    ])
    rows = changes_to_diff(ct).orderBy("lsn").collect()
    assert [r.v for r in rows] == ["earlier", "later"]
    assert all(len(r.lsn) == 40 for r in rows)


def test_apply_changes_snapshot_merge(spark):
    base = spark.createDataFrame([(1, "one"), (2, "two"), (3, "three")],
                                 "k long, v string")
    ct = _ct(spark, [
        (lsn_bytes(1), lsn_bytes(0, 0, 1), OP_UPDATE_OLD, 1, "?"),
        (lsn_bytes(1), lsn_bytes(0, 0, 1), OP_UPDATE_NEW, 1, "ONE"),
        (lsn_bytes(2), lsn_bytes(0, 0, 1), OP_DELETE, 2, "?"),
        # same transaction: delete 3 (seq 1) then re-insert 3 (seq 2)
        (lsn_bytes(3), lsn_bytes(0, 0, 1), OP_DELETE, 3, "?"),
        (lsn_bytes(3), lsn_bytes(0, 0, 2), OP_INSERT, 3, "THREE"),
        (lsn_bytes(4), lsn_bytes(0, 0, 1), OP_INSERT, 9, "nine"),
    ])
    state = {r.k: r.v for r in apply_changes(base, ct, ["k"]).collect()}
    assert state == {1: "ONE", 3: "THREE", 9: "nine"}


def test_unknown_operation_code_errors(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    ct = _ct(spark, [
        (lsn_bytes(1), lsn_bytes(0, 0, 1), 7, 1, "a"),
    ])
    with pytest.raises(Exception) as ei:
        changes_to_diff(ct).collect()
    assert "unrecognized __$operation" in str(ei.value)
