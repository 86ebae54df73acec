"""RETAIN HISTORY / AS OF time travel: reads at any retained timestamp are
exactly the recompute over the update prefix, before and after compaction."""

import random

import pytest
from pyspark.sql import functions as F

from materialize_spark.streaming.history import (
    HistoryMaterializedView, RetainedHistory, SinceViolation,
)
from materialize_spark.streaming.ivm import MaterializedView

SCHEMA = "k string, v long, diff long"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _random_batches(seed, n_batches):
    """Insert-heavy workload with deletes of previously inserted rows."""
    rng = random.Random(seed)
    live, batches = [], []
    for _ in range(n_batches):
        batch = []
        for _ in range(rng.randint(1, 6)):
            if live and rng.random() < 0.3:
                row = live.pop(rng.randrange(len(live)))
                batch.append((row[0], row[1], -1))
            else:
                row = (rng.choice("abc"), rng.randint(0, 100))
                live.append(row)
                batch.append((row[0], row[1], 1))
        batches.append(batch)
    return batches


def test_as_of_equals_prefix_recompute(spark):
    batches = _random_batches(7, 6)
    hist = RetainedHistory()
    for ts, batch in enumerate(batches):
        hist.append(spark.createDataFrame(batch, SCHEMA), ts)

    for ts in range(len(batches)):
        prefix = [r for b in batches[: ts + 1] for r in b]
        from materialize_spark.operators.setops import threshold
        expect = (
            threshold(spark.createDataFrame(prefix, SCHEMA))
            .withColumn("__m", F.explode(F.sequence(F.lit(1), F.col("diff"))))
            .drop("diff", "__m")
        )
        assert _rows(hist.as_of(ts)) == _rows(expect), f"ts={ts}"
    # reading past the upper frontier sees the latest state
    assert _rows(hist.as_of(99)) == _rows(hist.as_of(len(batches) - 1))


def test_compaction_preserves_reads_at_or_after_frontier(spark):
    batches = _random_batches(11, 6)
    hist = RetainedHistory()
    for ts, batch in enumerate(batches):
        hist.append(spark.createDataFrame(batch, SCHEMA), ts)

    before = {ts: _rows(hist.as_of(ts)) for ts in range(3, 6)}
    hist.compact(3)
    assert hist.since == 3
    for ts in range(3, 6):
        assert _rows(hist.as_of(ts)) == before[ts], f"ts={ts}"
    with pytest.raises(SinceViolation):
        hist.as_of(2)
    with pytest.raises(SinceViolation):
        hist.subscribe_since(1)
    # compaction bounded the changelog: one snapshot + recent updates only
    assert hist.changelog().filter(F.col("mz_timestamp") < 3).count() == 0


def test_subscribe_since_returns_only_later_updates(spark):
    hist = RetainedHistory()
    hist.append(spark.createDataFrame([("a", 1, 1)], SCHEMA), 0)
    hist.append(spark.createDataFrame([("b", 2, 1)], SCHEMA), 1)
    hist.append(spark.createDataFrame([("a", 1, -1)], SCHEMA), 2)
    got = _rows(hist.subscribe_since(0))
    # column order in _rows is alphabetical: (diff, k, mz_timestamp, v)
    assert got == [(-1, "a", 2, 1), (1, "b", 1, 2)]


def test_append_rejects_time_regression(spark):
    hist = RetainedHistory()
    hist.append(spark.createDataFrame([("a", 1, 1)], SCHEMA), 5)
    with pytest.raises(ValueError):
        hist.append(spark.createDataFrame([("b", 1, 1)], SCHEMA), 4)


def test_history_matview_as_of_each_epoch(spark):
    """AS OF over a maintained aggregate view == the aggregate over the
    source prefix at every epoch — time travel composed with IVM."""
    rng = random.Random(3)
    batches = [
        [(rng.choice("xy"), rng.randint(1, 9)) for _ in range(rng.randint(1, 5))]
        for _ in range(4)
    ]
    define = lambda df: df.groupBy("k").agg(  # noqa: E731
        F.sum("v").alias("total"), F.count("v").alias("n"))
    hmv = HistoryMaterializedView(MaterializedView(
        spark, define, keys=["k"], combine={"total": "sum", "n": "count"}))

    for batch in batches:
        hmv.on_batch(spark.createDataFrame(batch, "k string, v long"))

    for epoch in range(len(batches)):
        prefix = [r for b in batches[: epoch + 1] for r in b]
        expect = define(spark.createDataFrame(prefix, "k string, v long"))
        assert _rows(hmv.as_of(epoch)) == _rows(expect), f"epoch={epoch}"
    assert _rows(hmv.result()) == _rows(hmv.as_of(len(batches) - 1))


def test_appends_defer_until_read_and_cadence_bounds_pending(spark):
    """Optimization pin: append() must not plan anything (the pending
    list grows, the consolidated leaf stays absent) until a read — or
    the consolidation cadence — folds it; reads stay exact across
    interleaved appends and consolidations."""
    from materialize_spark.streaming import history as H

    hist = RetainedHistory()
    batches = _random_batches(5, 5)
    for ts, batch in enumerate(batches):
        hist.append(spark.createDataFrame(batch, SCHEMA), ts)
    # all five appends deferred: no consolidated leaf yet
    assert hist._log is None
    assert len(hist._pending) == len(batches)

    # a read consolidates exactly once and empties the pending list
    prefix = [r for b in batches for r in b]
    from materialize_spark.operators.setops import threshold
    expect = (
        threshold(spark.createDataFrame(prefix, SCHEMA))
        .withColumn("__m", F.explode(F.sequence(F.lit(1), F.col("diff"))))
        .drop("diff", "__m")
    )
    assert _rows(hist.as_of(len(batches) - 1)) == _rows(expect)
    assert hist._log is not None and not hist._pending

    # appends after the read defer again; a second read folds them in
    more = _random_batches(6, 3)
    for i, batch in enumerate(more):
        hist.append(spark.createDataFrame(batch, SCHEMA), len(batches) + i)
    assert len(hist._pending) == len(more)
    full = prefix + [r for b in more for r in b]
    expect_full = (
        threshold(spark.createDataFrame(full, SCHEMA))
        .withColumn("__m", F.explode(F.sequence(F.lit(1), F.col("diff"))))
        .drop("diff", "__m")
    )
    assert _rows(hist.as_of(99)) == _rows(expect_full)

    # the cadence bounds pending growth for never-read histories
    h2 = RetainedHistory()
    one = spark.createDataFrame([("a", 1, 1)], SCHEMA)
    for ts in range(H._CONSOLIDATE_EVERY + 1):
        h2.append(one, ts)
    assert h2._log is not None
    assert len(h2._pending) == 1
    assert _rows(h2.as_of(0)) == [("a", 1)]
