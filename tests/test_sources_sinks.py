"""Sources/sinks: format readers, envelopes, load generators, COPY TO."""

import json

from pyspark.sql import functions as F

from materialize_spark.catalog import load_tables
from materialize_spark.operators.setops import threshold
from materialize_spark.sinks import copy_to, stream_to_memory
from materialize_spark.sources import (
    counter_source, debezium_decode, kafka_available, read_table, stream_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_csv_json_roundtrip(spark, tmp_path):
    nation = load_tables(spark, SF_DIR)["nation"]
    for fmt in ("csv", "json"):
        path = str(tmp_path / fmt)
        copy_to(nation, path, fmt)
        back = read_table(spark, path, fmt, schema=nation.schema)
        assert sorted(map(tuple, back.collect())) == \
            sorted(map(tuple, nation.collect()))


def test_regex_format(spark, tmp_path):
    path = str(tmp_path / "log.txt")
    with open(path, "w") as f:
        f.write("2024-01-01 ERROR boom\n2024-01-02 INFO ok\n")
    df = read_table(spark, path, "regex",
                    regex=r"^(\S+) (\S+) (.*)$")
    rows = sorted(map(tuple, df.collect()))
    assert rows == [("2024-01-01", "ERROR", "boom"), ("2024-01-02", "INFO", "ok")]


def test_debezium_envelope_decode(spark):
    msgs = [
        {"before": None, "after": {"id": 1, "v": "a"}, "op": "c"},
        {"before": {"id": 1, "v": "a"}, "after": {"id": 1, "v": "b"}, "op": "u"},
        {"before": {"id": 2, "v": "x"}, "after": None, "op": "d"},
        {"before": None, "after": {"id": 2, "v": "x"}, "op": "r"},
    ]
    df = spark.createDataFrame([(json.dumps(m),) for m in msgs], ["value"])
    updates = debezium_decode(df, "value", "id bigint, v string")
    # consolidate: id=1 ends at v=b; id=2 insert+delete cancels
    state = threshold(updates)
    assert {(r.id, r.v) for r in state.collect()} == {(1, "b")}


def test_streaming_file_source_incremental(spark, tmp_path):
    events = load_tables(spark, SF_DIR)["events"].limit(100)
    src = str(tmp_path / "src")
    events.coalesce(2).write.parquet(src)
    stream = stream_table(spark, src, "parquet", schema=events.schema,
                          max_files_per_trigger=1)
    q = stream_to_memory(
        stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")),
        "evt_counts", output_mode="complete")
    q.awaitTermination(120)
    got = spark.table("evt_counts")
    expected = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_counter_loadgen(spark, tmp_path):
    q = stream_to_memory(counter_source(spark, rows_per_second=500),
                         "counter_ticks", trigger_available_now=False)
    try:
        import time
        deadline = time.time() + 30
        while time.time() < deadline and spark.table("counter_ticks").count() < 1:
            time.sleep(0.5)
        assert spark.table("counter_ticks").count() >= 1
    finally:
        q.stop()


def test_kafka_gated(spark):
    # Container has no kafka connector; the probe must say so (not crash).
    assert kafka_available(spark) is False


def test_copy_to_partitioned(spark, tmp_path):
    orders = load_tables(spark, SF_DIR)["orders"]
    path = str(tmp_path / "orders_part")
    copy_to(orders.withColumn("yr", F.year("o_orderdate")), path,
            partition_by=["yr"])
    back = spark.read.parquet(path)
    # partition pruning works on the layout
    assert back.filter(F.col("yr") == 1996).count() == \
        orders.filter(F.year("o_orderdate") == 1996).count()


def test_auction_loadgen_windowed_agg(spark, tmp_path):
    """AUCTION generator -> tumbling-window revenue per auction: the
    loadgen + event-time windowed aggregation path, end to end."""
    import time

    from pyspark.sql import functions as F
    from materialize_spark.sources.loadgen import auction_source

    bids = auction_source(spark, rows_per_second=500)
    agg = (bids.withWatermark("bid_time", "2 seconds")
           .groupBy(F.window("bid_time", "1 second"), "auction_id")
           .agg(F.sum("amount").alias("revenue"),
                F.count(F.lit(1)).alias("n_bids")))
    q = (agg.writeStream.format("memory").queryName("auction_rev")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            if spark.table("auction_rev").count() > 0:
                break
            time.sleep(1)
        rows = spark.table("auction_rev").collect()
    finally:
        q.stop()
    assert rows, "no windows materialized within deadline"
    assert all(r.n_bids >= 1 and r.revenue >= 0 for r in rows)
    assert all(0 <= r.auction_id < 100 for r in rows)


def test_datums_loadgen_type_surface(spark):
    """DATUMS generator: one row covering the type surface; every column
    non-null and of the declared Spark type."""
    from materialize_spark.sources.loadgen import load_generator
    df = load_generator(spark, "datums")
    row = df.first()
    assert df.count() == 1
    assert all(row[c] is not None for c in df.columns)
    kinds = dict(df.dtypes)
    assert kinds["int2_v"] == "smallint" and kinds["int8_v"] == "bigint"
    assert kinds["numeric_v"].startswith("decimal")
    assert kinds["bytes_v"] == "binary" and kinds["map_v"].startswith("map")


def test_keyvalue_loadgen_feeds_upsert(spark):
    """KEY VALUE generator through the upsert envelope: cycling keys mean
    the upserted state holds exactly one (latest) value per key."""
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from materialize_spark.sources.loadgen import keyvalue_source

    kv = keyvalue_source(spark, rows_per_second=2000, keys=50)
    q = (kv.writeStream.format("memory").queryName("kv_raw")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table("kv_raw").count() < 120:
            time.sleep(0.5)
        raw = spark.table("kv_raw")
        assert raw.count() >= 120  # keys must have cycled (>2x 50 keys)
    finally:
        q.stop()
    latest = (raw.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("key").orderBy(F.desc("ts"), F.desc("value"))))
        .filter("rn = 1"))
    assert latest.count() == latest.select("key").distinct().count()
    assert raw.select("key").distinct().count() <= 50
    assert raw.filter(~F.col("partition").isin(0)).count() == 0  # 1 partition


def test_marketing_loadgen_ctr(spark):
    """MARKETING generator: deterministic click flag -> stable CTR agg."""
    import time

    from pyspark.sql import functions as F

    from materialize_spark.sources.loadgen import marketing_source

    imps = marketing_source(spark, rows_per_second=2000)
    q = (imps.writeStream.format("memory").queryName("mkt_raw")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table("mkt_raw").count() < 100:
            time.sleep(0.5)
        raw = spark.table("mkt_raw").localCheckpoint()
    finally:
        q.stop()
    # clicked is a pure function of impression_id
    recomputed = raw.withColumn(
        "c2", (F.col("impression_id") * 2654435761 % 100 < 3))
    assert recomputed.filter(F.col("clicked") != F.col("c2")).count() == 0


def test_avro_roundtrip_or_skip(spark, tmp_path):
    """Avro encode/decode (reference FORMAT AVRO,
    src/storage-types/src/sources/encoding.rs:95-102). The spark-avro
    datasource module is not deployed in this container; the test runs
    the full round-trip when it is, and records the precise reason when
    it is not."""
    import pytest
    nation = load_tables(spark, SF_DIR)["nation"]
    path = str(tmp_path / "nation_avro")
    try:
        nation.write.format("avro").save(path)
    except Exception as ex:
        pytest.skip("spark-avro datasource not deployed in this container: "
                    + str(ex).split("\n")[0][:100])
    back = spark.read.format("avro").load(path)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_tpch_load_generator(spark):
    """LOAD GENERATOR TPCH (reference LoadGenerator::Tpch with SCALE
    FACTOR): deterministic tables at the reference's row-count ratios,
    exposed as per-table subsources."""
    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.loadgen import tpch_source
    t = tpch_source(spark, scale_factor=0.001)
    assert t["region"].count() == 5 and t["nation"].count() == 25
    assert t["customer"].count() == 150 and t["orders"].count() == 1500
    # deterministic: same SF → identical data
    a = t["orders"].agg({"o_totalprice": "sum"}).first()[0]
    b = tpch_source(spark, scale_factor=0.001)["orders"] \
        .agg({"o_totalprice": "sum"}).first()[0]
    assert a == b
    # lineitem fans out 1-7 lines per order
    n_li = t["lineitem"].count()
    assert 1500 <= n_li <= 1500 * 7
    # SQL surface registers subsources
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE SOURCE gen FROM LOAD GENERATOR TPCH "
                 "(SCALE FACTOR 0.001)")
    assert sess.sql("SELECT count(*) AS n FROM gen_nation").first().n == 25
    joined = sess.sql("""
        SELECT count(*) AS n FROM gen_orders o
        JOIN gen_customer c ON o.o_custkey = c.c_custkey
    """).first()
    assert joined.n == 1500


def test_protobuf_roundtrip_or_skip(spark, tmp_path):
    """Protobuf encode/decode (reference FORMAT PROTOBUF,
    src/storage-types/src/sources/encoding.rs:95-102). Needs the
    spark-protobuf module jar; skips with the reason when absent."""
    import pytest
    try:
        from pyspark.sql.protobuf.functions import to_protobuf  # noqa: F401
    except Exception as ex:
        pytest.skip(f"pyspark protobuf API unavailable: {ex}")
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    try:
        out = df.select(
            __import__("pyspark.sql.protobuf.functions", fromlist=["to_protobuf"])
            .to_protobuf(__import__("pyspark.sql.functions", fromlist=["struct"])
                         .struct("id", "name"),
                         "google.protobuf.Empty").alias("pb"))
        out.collect()
    except Exception as ex:
        pytest.skip("spark-protobuf module not deployed in this container: "
                    + str(ex).split("\n")[0][:100])


def test_kafka_murmur2_public_vectors():
    """Byte-identical to Apache Kafka Utils#murmur2 (public test vectors
    from kafka's UtilsTest) — sink partition routing matches the broker's
    DefaultPartitioner."""
    from materialize_spark.sinks.writers import kafka_murmur2
    vectors = {
        b"21": -973932308,
        b"foobar": -790332482,
        b"a-little-bit-long-string": -985981536,
        b"a-little-bit-longer-string": -1486304829,
        b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8": -58897971,
        b"": 275646681,
    }
    for key, expected in vectors.items():
        assert kafka_murmur2(key) == expected, key


def test_kafka_murmur2_partition_column(spark):
    from materialize_spark.sinks.writers import (
        kafka_murmur2, kafka_murmur2_partition,
    )
    df = spark.createDataFrame(
        [("21",), ("foobar",), (None,)], "key string")
    got = {r.key: r.p for r in df.select(
        "key", kafka_murmur2_partition("key", 12).alias("p")).collect()}
    assert got["21"] == (kafka_murmur2(b"21") & 0x7FFFFFFF) % 12
    assert got["foobar"] == (kafka_murmur2(b"foobar") & 0x7FFFFFFF) % 12
    assert got[None] is None


def test_webhook_http_endpoint(spark, tmp_path):
    """Live HTTP POSTs land in the source relation; the HMAC CHECK
    rejects unsigned deliveries with 401 (reference webhook.rs CHECK
    clause + constant_time_eq validation)."""
    import hashlib
    import hmac
    import json as _json
    import urllib.error
    import urllib.request

    from materialize_spark.sources.webhook import (
        WebhookSource, hmac_sha256_check,
    )

    src = WebhookSource(spark, str(tmp_path / "hooks"))
    host, port = src.serve_http(
        validate=hmac_sha256_check("s3cret", "x-signature"))
    try:
        url = f"http://{host}:{port}/"
        body = _json.dumps({"event": "signup", "uid": 7}).encode()
        sig = hmac.new(b"s3cret", body, hashlib.sha256).hexdigest()
        req = urllib.request.Request(
            url, data=body, headers={"x-signature": sig})
        assert urllib.request.urlopen(req, timeout=5).status == 200
        # tampered signature → 401, nothing spooled
        bad = urllib.request.Request(
            url, data=body, headers={"x-signature": "0" * 64})
        try:
            urllib.request.urlopen(bad, timeout=5)
            raise AssertionError("unsigned delivery admitted")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        rows = src.df().collect()
        assert len(rows) == 1
        assert _json.loads(rows[0].body)["uid"] == 7
        assert rows[0].headers["x-signature"] == sig
    finally:
        src.stop_http()


def test_webhook_posts_feed_delta_mvs_and_subscriptions(spark):
    """Every webhook POST is a commit: delta MVs over the source and
    open subscriptions update without any REFRESH."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, "/root/testdata/sf0.001")
    s.execute("CREATE SOURCE hook FROM WEBHOOK BODY FORMAT JSON")
    s.execute("CREATE MATERIALIZED VIEW hook_n WITH (MAINTENANCE "
              "'delta') AS SELECT body, COUNT(*) AS n FROM hook "
              "GROUP BY body")
    sid, _first, _ = s.subscribe_open("SUBSCRIBE hook")
    s.webhook("hook").post({"e": 1})
    s.webhook("hook").post({"e": 1})
    s.webhook("hook").post({"e": 2})
    got = {r.body: r.n for r in s.sql("SELECT * FROM hook_n").collect()}
    assert got == {'{"e": 1}': 2, '{"e": 2}': 1}
    delta = s.subscribe_poll(sid)
    assert sorted(r.body for r in delta.collect()) == \
        ['{"e": 1}', '{"e": 1}', '{"e": 2}']
    assert all(r.diff == 1 for r in delta.collect())
    s.subscribe_close(sid)
