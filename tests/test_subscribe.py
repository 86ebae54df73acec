"""SUBSCRIBE envelope shaping over IVM delta frames."""

from pyspark.sql import functions as F

from materialize_spark.streaming.ivm import MaterializedView
from materialize_spark.streaming.subscribe import (
    envelope_debezium, envelope_upsert, within_timestamp_order_by,
)

SRC = "k string, v long"


def _mv(spark):
    return MaterializedView(
        spark,
        define=lambda df: df.groupBy("k").agg(F.sum("v").alias("total")),
        keys=["k"], combine={"total": "sum"})


def test_upsert_envelope_update_and_insert(spark):
    mv = _mv(spark)
    mv.on_batch(spark.createDataFrame([("a", 1), ("b", 2)], SRC))
    delta = mv.on_batch(spark.createDataFrame([("a", 10), ("c", 5)], SRC))
    up = {(r.k): r.total for r in envelope_upsert(delta, ["k"]).collect()}
    # a updated (11), c inserted (5); b unchanged -> absent
    assert up == {"a": 11, "c": 5}


def test_upsert_envelope_tombstone_needs_true_delete(spark):
    """A key that only retracts (no matching addition) yields NULL values."""
    mv = _mv(spark)
    mv.on_batch(spark.createDataFrame([("a", 1), ("b", 2)], SRC))
    new_state = spark.createDataFrame([("b", 2)], "k string, total long")
    delta = mv._delta(mv._state, new_state)  # a disappears entirely
    rows = {r.k: r.total for r in envelope_upsert(delta, ["k"]).collect()}
    assert rows == {"a": None}


def test_debezium_envelope_before_after(spark):
    mv = _mv(spark)
    mv.on_batch(spark.createDataFrame([("a", 1)], SRC))
    delta = mv.on_batch(spark.createDataFrame([("a", 4), ("b", 7)], SRC))
    rows = {r.k: (r.before, r.after)
            for r in envelope_debezium(delta, ["k"]).collect()}
    assert rows["a"] == ((1,), (5,))   # update: before and after
    assert rows["b"] == (None, (7,))   # insert: no before


def test_within_timestamp_order_by(spark):
    mv = _mv(spark)
    delta = mv.on_batch(spark.createDataFrame(
        [("c", 3), ("a", 1), ("b", 2)], SRC))
    ordered = within_timestamp_order_by(delta, "k").collect()
    assert [r.k for r in ordered] == ["a", "b", "c"]


def test_subscribe_with_snapshot_false(spark):
    from materialize_spark.plans.sqlfront import MzSession
    sess = MzSession(spark, "/root/testdata/sf0.001")
    sess.execute("CREATE TABLE sub_snap (k STRING, v BIGINT)")
    sess.execute("INSERT INTO sub_snap VALUES ('a', 1), ('b', 2)")
    first = sess.execute(
        "SUBSCRIBE sub_snap WITH (SNAPSHOT = false)").collect()
    assert first == []  # initial state suppressed
    sess.execute("INSERT INTO sub_snap VALUES ('c', 3)")
    second = sess.execute(
        "SUBSCRIBE sub_snap WITH (SNAPSHOT = false)").collect()
    assert [(r.k, r.v, r.diff) for r in second] == [("c", 3, 1)]


def test_subscribe_with_progress(spark):
    from materialize_spark.plans.sqlfront import MzSession
    sess = MzSession(spark, "/root/testdata/sf0.001")
    sess.execute("CREATE TABLE sub_prog (k STRING, v BIGINT)")
    sess.execute("INSERT INTO sub_prog VALUES ('a', 1)")
    b1 = sess.execute("SUBSCRIBE sub_prog WITH (PROGRESS)").collect()
    data = [r for r in b1 if not r.mz_progressed]
    marks = [r for r in b1 if r.mz_progressed]
    assert [(r.k, r.v, r.diff) for r in data] == [("a", 1, 1)]
    assert len(marks) == 1 and marks[0].k is None and marks[0].diff is None
    # a no-change batch still progresses: one marker, zero data rows
    b2 = sess.execute("SUBSCRIBE sub_prog WITH (PROGRESS)").collect()
    assert [r.mz_progressed for r in b2] == [True]
    assert b2[0].mz_timestamp > marks[0].mz_timestamp


def test_subscribe_progress_composes_with_envelope(spark):
    """WITH (PROGRESS) must not be silently dropped when combined with
    ENVELOPE UPSERT or WITHIN TIMESTAMP ORDER BY (ADVICE r5): the
    marker wraps whatever shape the modifier produced."""
    from materialize_spark.plans.sqlfront import MzSession
    sess = MzSession(spark, "/root/testdata/sf0.001")
    sess.execute("CREATE TABLE sub_pc (k STRING, v BIGINT)")
    sess.execute("INSERT INTO sub_pc VALUES ('a', 1), ('b', 2)")
    b1 = sess.execute(
        "SUBSCRIBE sub_pc ENVELOPE UPSERT (KEY (k)) WITH (PROGRESS)"
    ).collect()
    marks = [r for r in b1 if r.mz_progressed]
    data = [r for r in b1 if not r.mz_progressed]
    assert len(marks) == 1 and marks[0].mz_timestamp == 1
    assert {r.k for r in data} == {"a", "b"}
    # envelope shape kept: upsert rows carry no raw diff column
    assert not any(hasattr(r, "diff") for r in data)
    # and with WITHIN TIMESTAMP ORDER BY
    b2 = sess.execute(
        "SUBSCRIBE sub_pc WITHIN TIMESTAMP ORDER BY v DESC WITH (PROGRESS)"
    ).collect()
    marks2 = [r for r in b2 if r.mz_progressed]
    assert len(marks2) == 1 and marks2[0].mz_timestamp == 2
