"""Stream-stream / stream-table joins driven by real file streams."""

from pyspark.sql import functions as F

from materialize_spark.streaming.joins import (
    stream_stream_join, stream_table_join,
)

from tests.conftest import SF_DIR


def test_stream_stream_join_within_band(spark, tmp_path):
    from materialize_spark.catalog import load_tables

    evs = (load_tables(spark, SF_DIR)["events"]
           .filter(F.col("user_id") < 10)
           .select("user_id", "ts", "event_type", "value"))
    clicks = evs.filter("event_type = 'click'") \
        .select("user_id", F.col("ts").alias("c_ts"),
                F.col("value").alias("c_val"))
    views = evs.filter("event_type = 'view'") \
        .select("user_id", F.col("ts").alias("v_ts"),
                F.col("value").alias("v_val"))
    lsrc, rsrc = str(tmp_path / "clicks"), str(tmp_path / "views")
    clicks.coalesce(1).write.parquet(lsrc)
    views.coalesce(1).write.parquet(rsrc)

    ls = spark.readStream.schema(clicks.schema).parquet(lsrc)
    rs = spark.readStream.schema(views.schema).parquet(rsrc)
    joined = stream_stream_join(
        ls, rs, ["user_id"], left_time="c_ts", right_time="v_ts",
        watermark="10 minutes", band="5 minutes")
    q = (joined.writeStream.format("memory").queryName("ssj")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("ssj")

    want = clicks.join(
        views,
        (clicks.user_id == views.user_id)
        & (views.v_ts >= clicks.c_ts - F.expr("INTERVAL 5 minutes"))
        & (views.v_ts <= clicks.c_ts + F.expr("INTERVAL 5 minutes")))
    assert got.count() == want.count()
    assert got.count() > 0
    # every joined pair honors the band
    bad = got.filter(
        F.abs(F.col("c_ts").cast("long") - F.col("v_ts").cast("long")) > 300)
    assert bad.count() == 0


def test_stream_table_join_enrichment(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet") \
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    src = str(tmp_path / "orders")
    orders.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(orders.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    enriched = stream_table_join(stream, cust, on=["o_custkey"])
    q = (enriched.writeStream.format("memory").queryName("stj")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("stj")
    assert got.count() == orders.count()  # every order has its customer
    assert "c_mktsegment" in got.columns
