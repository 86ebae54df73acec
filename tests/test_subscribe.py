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
