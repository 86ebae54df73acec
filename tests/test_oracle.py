"""Cross-MV consistency: shared timestamp oracle + coordinated commit.

Semantics mirrored: the reference's TimestampOracle
(/root/reference/src/timestamp-oracle/src/lib.rs:46 — write_ts/read_ts/
apply_write, reads never observe an open write) and txn-wal's atomic
multi-shard commit (/root/reference/src/txn-wal/src/lib.rs:10-18 — two
views over one source move together or not at all).
"""

import pytest
from pyspark.sql import functions as F

from materialize_spark.streaming.ivm import MaterializedView
from materialize_spark.streaming.oracle import (
    CoordinatedSource, TimestampOracle,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v bigint")


def _sum_view(spark):
    return MaterializedView(
        spark=spark,
        define=lambda df: df.groupBy("k").agg(F.sum("v").alias("total")),
        keys=["k"], combine={"total": "sum"})


def _count_view(spark):
    return MaterializedView(
        spark=spark,
        define=lambda df: df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n")),
        keys=["k"], combine={"n": "sum"})


def test_oracle_monotonic_and_closed():
    o = TimestampOracle()
    assert o.read_ts() == 0
    t1 = o.write_ts()
    # open write not readable yet
    assert o.read_ts() == 0
    o.apply_write(t1)
    assert o.read_ts() == t1
    t2 = o.write_ts()
    assert t2 > t1


def test_two_views_always_serve_same_timestamp(spark):
    src = CoordinatedSource()
    src.attach("totals", _sum_view(spark))
    src.attach("counts", _count_view(spark))
    for i in range(5):  # churn
        ts = src.ingest(_batch(spark, [("a", i), ("b", 10 * i)]))
        t1, s1 = src.peek("totals")
        t2, s2 = src.peek("counts")
        assert t1 == t2 == ts == src.frontier()
        # and the states are the batch-i-inclusive results
        got = {r.k: r.total for r in s1.collect()}
        assert got["a"] == sum(range(i + 1))
        assert {r.k: r.n for r in s2.collect()}["a"] == i + 1


def test_failed_ingest_leaves_both_views_at_old_frontier(spark):
    """The txn-wal property: a write that fails mid-apply is invisible —
    neither view's published state nor the frontier moves, even though
    the first member applied before the second raised."""
    src = CoordinatedSource()
    src.attach("totals", _sum_view(spark))

    class Poisoned(MaterializedView):
        def on_batch(self, batch_df):
            if batch_df.filter(F.col("v") < 0).limit(1).count():
                raise RuntimeError("decode error")
            return super().on_batch(batch_df)

    src.attach("counts", Poisoned(
        spark=spark,
        define=lambda df: df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n")),
        keys=["k"], combine={"n": "sum"}))

    ts1 = src.ingest(_batch(spark, [("a", 1), ("b", 2)]))
    with pytest.raises(RuntimeError, match="decode error"):
        src.ingest(_batch(spark, [("a", -5)]))
    # frontier and BOTH snapshots still at ts1 (totals applied the poison
    # batch internally, but publish-on-commit never exposed it)
    assert src.frontier() == ts1
    t1, s1 = src.peek("totals")
    t2, s2 = src.peek("counts")
    assert t1 == t2 == ts1
    assert {r.k: r.total for r in s1.collect()} == {"a": 1, "b": 2}
    assert {r.k: r.n for r in s2.collect()} == {"a": 1, "b": 1}


def test_subscribe_deltas_aligned_across_members(spark):
    src = CoordinatedSource()
    src.attach("totals", _sum_view(spark))
    src.attach("counts", _count_view(spark))
    src.ingest(_batch(spark, [("a", 1)]))
    src.ingest(_batch(spark, [("a", 2), ("b", 3)]))
    sub_t = src.subscribe("totals").collect()
    sub_c = src.subscribe("counts").collect()
    # both streams carry exactly the oracle's committed timestamps
    assert {r.mz_timestamp for r in sub_t} \
        == {r.mz_timestamp for r in sub_c} == {1, 2}
    # at ts=2 totals retracts (a,1) and adds (a,3): net state visible
    ts2 = [((r.k, r.total), r.diff) for r in sub_t if r.mz_timestamp == 2]
    assert (("a", 3), 1) in ts2 and (("a", 1), -1) in ts2
    # since-cursor: strictly-after semantics
    later = src.subscribe("totals", since=1).collect()
    assert {r.mz_timestamp for r in later} == {2}


def test_failed_ingest_is_retryable_without_double_apply(spark):
    """Retry safety (txn-wal exactly-once multi-shard apply): member 2 of
    3 fails transiently mid-batch; every member's INTERNAL state rolls
    back, so retrying the same batch converges all three to the correct
    state at one timestamp — no member double-applies."""
    src = CoordinatedSource()
    src.attach("totals", _sum_view(spark))

    class Flaky(MaterializedView):
        fail_next = True

        def on_batch(self, batch_df):
            if Flaky.fail_next:
                Flaky.fail_next = False
                raise RuntimeError("transient decode error")
            return super().on_batch(batch_df)

    src.attach("counts", Flaky(
        spark=spark,
        define=lambda df: df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n")),
        keys=["k"], combine={"n": "sum"}))
    src.attach("maxes", MaterializedView(
        spark=spark,
        define=lambda df: df.groupBy("k").agg(F.max("v").alias("hi")),
        keys=["k"], combine={"hi": "max"}))

    Flaky.fail_next = False
    ts1 = src.ingest(_batch(spark, [("a", 1), ("b", 2)]))
    Flaky.fail_next = True
    batch2 = _batch(spark, [("a", 10), ("b", 20)])
    with pytest.raises(RuntimeError, match="transient"):
        src.ingest(batch2)
    ts2 = src.ingest(batch2)  # the retry
    assert ts2 > ts1 and src.frontier() == ts2
    t1, s1 = src.peek("totals")
    t2, s2 = src.peek("counts")
    t3, s3 = src.peek("maxes")
    assert t1 == t2 == t3 == ts2
    # totals applied batch2 exactly ONCE despite member 1 having applied
    # before member 2 raised on the first attempt
    assert {r.k: r.total for r in s1.collect()} == {"a": 11, "b": 22}
    assert {r.k: r.n for r in s2.collect()} == {"a": 2, "b": 2}
    assert {r.k: r.hi for r in s3.collect()} == {"a": 10, "b": 20}
