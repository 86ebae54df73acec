"""Iceberg-shaped sink: commits, snapshot log, time travel
(reference src/storage-types/src/sinks.rs:137-140; format shape from the
public Apache Iceberg spec)."""

import time

import pytest

from materialize_spark.sinks.iceberg_lite import (
    read_iceberg, snapshots, write_iceberg,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_append_commits_accumulate(spark, table):
    s1 = write_iceberg(_df(spark, 0, 10), table)
    s2 = write_iceberg(_df(spark, 10, 15), table, mode="append")
    assert read_iceberg(spark, table).count() == 15
    log = snapshots(table)
    assert [s["snapshot-id"] for s in log] == [s1, s2]
    assert log[0]["parent-snapshot-id"] is None
    assert log[1]["parent-snapshot-id"] == s1
    assert log[1]["summary"]["operation"] == "append"
    assert log[1]["summary"]["total-data-files"] \
        > log[1]["summary"]["added-data-files"] or \
        log[0]["summary"]["added-data-files"] > 0


def test_overwrite_replaces_logically(spark, table):
    write_iceberg(_df(spark, 0, 100), table)
    write_iceberg(_df(spark, 0, 7), table, mode="overwrite")
    cur = read_iceberg(spark, table)
    assert cur.count() == 7
    assert sorted(r.v for r in cur.collect()) == [i * 2 for i in range(7)]


def test_time_travel_by_snapshot_and_timestamp(spark, table):
    s1 = write_iceberg(_df(spark, 0, 10), table)
    t_between = int(time.time() * 1000)
    time.sleep(0.01)
    write_iceberg(_df(spark, 0, 3), table, mode="overwrite")
    # by snapshot id: the pre-overwrite rows are still readable
    old = read_iceberg(spark, table, snapshot_id=s1)
    assert old.count() == 10
    # by timestamp: latest snapshot at/before t_between is s1
    assert read_iceberg(spark, table, as_of_ms=t_between).count() == 10
    assert read_iceberg(spark, table).count() == 3


def test_unknown_snapshot_raises(spark, table):
    write_iceberg(_df(spark, 0, 5), table)
    with pytest.raises(KeyError):
        read_iceberg(spark, table, snapshot_id=123456)
    with pytest.raises(KeyError):
        read_iceberg(spark, table, as_of_ms=1)  # before first commit


def test_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_iceberg(spark, str(tmp_path / "nope"))


def test_schema_recorded_per_commit(spark, table):
    write_iceberg(_df(spark, 0, 5), table)
    meta_schema = snapshots(table)
    assert meta_schema  # log exists
    df = read_iceberg(spark, table)
    assert set(df.columns) == {"id", "v"}
