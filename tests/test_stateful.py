"""Monotonic TopK as a real stateful streaming query (state store +
applyInPandasWithState), fed by a file stream in multiple micro-batches."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from materialize_spark.streaming.stateful import (
    latest_per_group, monotonic_topk_stream,
)

from tests.conftest import SF_DIR


def test_monotonic_topk_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("user_id", "value").filter(F.col("user_id") < 20)

    # three chunk files -> three micro-batches (maxFilesPerTrigger=1)
    src = str(tmp_path / "chunks")
    for i in range(3):
        events.filter(F.col("user_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    topk = monotonic_topk_stream(stream, ["user_id"], "value", limit=3)
    q = (topk.writeStream.format("memory").queryName("mtopk")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = latest_per_group(spark.table("mtopk"), ["user_id"]) \
        .select("user_id", "value")

    w = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    want = (events.withColumn("__rn", F.row_number().over(w))
            .filter("__rn <= 3").select("user_id",
                                        F.col("value").cast("double")))
    got_rows = sorted((r.user_id, round(r.value, 6)) for r in got.collect())
    want_rows = sorted((r.user_id, round(r.value, 6)) for r in want.collect())
    assert got_rows == want_rows


def test_monotonic_topk_multiple_batches_bump_version(spark, tmp_path):
    rows = spark.createDataFrame(
        [(1, float(v)) for v in (5, 1, 9)], "user_id long, value double")
    src = str(tmp_path / "vchunks")
    for i in range(2):
        rows.coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(rows.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    topk = monotonic_topk_stream(stream, ["user_id"], "value", limit=2)
    q = (topk.writeStream.format("memory").queryName("vtopk")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "vckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.table("vtopk")
    assert res.agg(F.max("version")).first()[0] == 2
    latest = latest_per_group(res, ["user_id"])
    # duplicates across batches: top-2 of [5,1,9,5,1,9] is [9,9]
    assert sorted(r.value for r in latest.collect()) == [9.0, 9.0]
