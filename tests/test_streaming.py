"""Streaming IVM tests: the defining Materialize property is that the
incrementally-maintained result equals a full recompute at every batch
boundary (SURVEY.md §2.8; reference consistency model)."""

import pytest
from pyspark.sql import functions as F

from materialize_spark.catalog import load_tables
from materialize_spark.operators.setops import DIFF_COL
from materialize_spark.streaming.ivm import MaterializedView
from materialize_spark.streaming.upsert import merge_upsert_batch, upsert_latest
from materialize_spark.streaming.temporal import temporal_filter

SF_DIR = "/root/testdata/sf0.001"


def _event_chunks(spark, n_chunks=4):
    """Replay the events table in timestamp order as n micro-batches."""
    events = load_tables(spark, SF_DIR)["events"]
    rows = events.orderBy("ts", "event_id").collect()
    size = (len(rows) + n_chunks - 1) // n_chunks
    return events, [
        spark.createDataFrame(rows[i:i + size], events.schema)
        for i in range(0, len(rows), size)
    ]


def _agg_define(df):
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


def _as_sorted(df, *, round_cols=("total",)):
    out = df
    for c in round_cols:
        out = out.withColumn(c, F.round(c, 6))
    return sorted(tuple(r) for r in out.collect())


def test_ivm_incremental_equals_recompute(spark):
    events, chunks = _event_chunks(spark)
    mv = MaterializedView(
        spark, _agg_define, keys=["event_type"],
        combine={"n": "sum", "total": "sum", "vmin": "min", "vmax": "max"})
    seen = None
    for chunk in chunks:
        mv.on_batch(chunk)
        seen = chunk if seen is None else seen.unionByName(chunk)
        assert _as_sorted(mv.result()) == _as_sorted(_agg_define(seen))
    # and the final state matches the full batch answer
    assert _as_sorted(mv.result()) == _as_sorted(_agg_define(events))


def test_ivm_basic_plan_recompute(spark):
    """combine=None (non-combinable aggregate) also stays consistent."""
    _, chunks = _event_chunks(spark, n_chunks=3)

    def median_define(df):
        return df.groupBy("event_type").agg(
            F.expr("percentile_approx(value, 0.5)").alias("p50"))

    mv = MaterializedView(spark, median_define, keys=["event_type"], combine=None)
    seen = None
    for chunk in chunks:
        mv.on_batch(chunk)
        seen = chunk if seen is None else seen.unionByName(chunk)
    assert _as_sorted(mv.result(), round_cols=("p50",)) == \
        _as_sorted(median_define(seen), round_cols=("p50",))


def test_ivm_delta_is_subscribe_stream(spark):
    """Deltas carry +1/-1 diffs and replaying them reconstructs the state."""
    _, chunks = _event_chunks(spark, n_chunks=2)
    mv = MaterializedView(
        spark, lambda df: df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")),
        keys=["event_type"], combine={"n": "sum"})
    d1 = mv.on_batch(chunks[0])
    assert set(d1.select(DIFF_COL).distinct().toPandas()[DIFF_COL]) == {1}
    d2 = mv.on_batch(chunks[1])
    diffs = set(d2.select(DIFF_COL).distinct().toPandas()[DIFF_COL])
    assert diffs == {1, -1}  # updated groups retract the old row
    # replay: state == sum of diffs per row
    replay = d1.unionByName(d2).groupBy("event_type", "n") \
        .agg(F.sum(DIFF_COL).alias("net")).filter(F.col("net") > 0) \
        .select("event_type", "n")
    assert sorted(map(tuple, replay.collect())) == \
        sorted(map(tuple, mv.result().collect()))


def test_upsert_envelope(spark):
    feed = spark.createDataFrame(
        [(1, "a", 10, False), (1, "b", 20, False), (2, "x", 11, False),
         (2, None, 30, True), (3, "z", 5, False)],
        ["key", "val", "offset", "deleted"])
    latest = upsert_latest(
        feed, ["key"], [F.col("offset").desc()],
        value_cols=["val"], delete_when=F.col("deleted"))
    assert {(r.key, r.val) for r in latest.collect()} == {(1, "b"), (3, "z")}


def test_upsert_merge_batches(spark):
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], ["key", "val"])
    b2 = spark.createDataFrame([(2, "b2"), (3, "c")], ["key", "val"])
    state = merge_upsert_batch(None, b1, ["key"])
    state = merge_upsert_batch(state, b2, ["key"])
    assert {(r.key, r.val) for r in state.collect()} == \
        {(1, "a"), (2, "b2"), (3, "c")}


def test_temporal_filter_rows_age_out(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "old"), ("2024-01-10 00:00:00", "live")],
        ["ts", "tag"]).withColumn("ts", F.col("ts").cast("timestamp"))
    now = F.lit("2024-01-11 00:00:00").cast("timestamp")
    live = temporal_filter(
        df, valid_from=F.col("ts"),
        valid_until=F.col("ts") + F.expr("INTERVAL 3 DAYS"), now=now)
    assert [r.tag for r in live.collect()] == ["live"]


def test_ivm_streaming_driver_available_now(spark, tmp_path):
    """End-to-end through writeStream.foreachBatch with a file source."""
    events = load_tables(spark, SF_DIR)["events"]
    src = str(tmp_path / "stream_src")
    events.limit(200).coalesce(1).write.parquet(src)
    mv = MaterializedView(
        spark, lambda df: df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")),
        keys=["event_type"], combine={"n": "sum"})
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = mv.start(stream, checkpointLocation=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    expected = events.limit(200).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, mv.result().collect())) == \
        sorted(map(tuple, expected.collect()))


def test_refresh_every_processing_time_trigger(spark, tmp_path):
    """REFRESH EVERY maps to a processing-time trigger: the query stays up
    and keeps merging as new files land (vs availableNow drain-and-stop)."""
    import time

    from pyspark.sql import functions as F
    from materialize_spark.streaming.ivm import MaterializedView

    src = str(tmp_path / "src")
    first = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    first.coalesce(1).write.mode("append").parquet(src)
    mv = MaterializedView(
        spark, define=lambda df: df.groupBy("k").agg(F.sum("v").alias("t")),
        keys=["k"], combine={"t": "sum"})
    stream = spark.readStream.schema(first.schema).parquet(src)
    q = mv.start(stream, refresh_every="1 seconds")
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if mv._state is not None and mv._state.count() == 2:
                break
            time.sleep(0.5)
        # drop a second file while the query is live; it must get merged
        spark.createDataFrame([("a", 10)], "k string, v long") \
            .coalesce(1).write.mode("append").parquet(src)
        while time.time() < deadline:
            rows = {r.k: r.t for r in mv.result().collect()} \
                if mv._state is not None else {}
            if rows.get("a") == 11:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert {r.k: r.t for r in mv.result().collect()} == {"a": 11, "b": 2}


def test_incremental_dedup_across_batches(spark):
    """Batch 2's duplicates of batch 1 are filtered; per-batch cost is a
    join against compacted state, never a rescan of history."""
    from materialize_spark.streaming.dedup_stream import IncrementalDeduper
    d = IncrementalDeduper(spark)
    b1 = spark.createDataFrame(
        [(1, "the cat sat"), (2, "a dog ran"), (3, "THE CAT sat!")],
        "doc_id long, text string")
    out1 = {r.doc_id for r in d.on_batch(b1).collect()}
    assert out1 == {1, 2}  # 3 normalizes to 1's content
    b2 = spark.createDataFrame(
        [(4, "the cat sat"), (5, "brand new text"), (6, "brand new text")],
        "doc_id long, text string")
    out2 = {r.doc_id for r in d.on_batch(b2).collect()}
    assert out2 == {5}  # 4 duplicates batch-1 content; 6 duplicates 5
    dups = {(r.canonical_id, r.n_seen) for r in d.duplicates().collect()}
    assert dups == {(1, 3), (5, 2)}


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Streaming F.session_window sessions == batch gaps-and-islands
    (queries/events.py window_session semantics) on the same data."""
    from materialize_spark.streaming.sessions import session_window_agg

    events = load_tables(spark, SF_DIR)["events"].filter(F.col("user_id") <= 10)
    src = str(tmp_path / "sess_src")
    events.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    sess = session_window_agg(
        stream, ts_col="ts", gap="30 minutes", keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events"),
              F.round(F.sum("value"), 4).alias("total_value")])
    q = (sess.writeStream.format("memory").queryName("sessions_out")
         .outputMode("complete").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "sess_ckpt")).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "SELECT user_id, CAST(session_start AS STRING), n_events, total_value "
        "FROM sessions_out").collect()))

    # batch oracle: gaps-and-islands with the same 30-minute gap
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    ordered = events.withColumn(
        "is_start",
        F.when(F.lag("ts").over(w).isNull()
               | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
                  >= 1800), 1).otherwise(0))
    sessions = ordered.withColumn(
        "session_id",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    expected = sorted(map(tuple, (
        sessions.groupBy("user_id", "session_id")
        .agg(F.min("ts").cast("string").alias("session_start"),
             F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select("user_id", "session_start", "n_events", "total_value")
    ).collect()))
    assert got == expected


def test_hopping_window_stream_matches_batch_date_bin(spark, tmp_path):
    """Streaming F.window(width, hop) == batch date_bin_hopping explode —
    the reference's 'windows are data' model and Spark's native stateful
    operator agree window-for-window."""
    from materialize_spark.functions.datetime import date_bin_hopping
    from materialize_spark.streaming.sessions import time_window_agg

    events = load_tables(spark, SF_DIR)["events"].filter(F.col("user_id") <= 20)
    src = str(tmp_path / "hop_src")
    events.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    hopped = time_window_agg(
        stream, ts_col="ts", width="1 hour", hop="15 minutes",
        keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n"),
              F.round(F.sum("value"), 4).alias("total")])
    q = (hopped.writeStream.format("memory").queryName("hop_out")
         .outputMode("complete").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "SELECT event_type, CAST(window_start AS STRING), n, total "
        "FROM hop_out").collect()))

    expected = sorted(map(tuple, (
        events.select("event_type", "value",
                      F.explode(date_bin_hopping("15 minutes", "1 hour", "ts"))
                      .alias("w"))
        .groupBy("event_type", F.col("w").cast("string").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total"))
    ).collect()))
    assert got == expected
