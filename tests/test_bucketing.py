"""Bucketed tables give shuffle-free co-located joins (at-rest index)."""

import uuid

import pytest
from pyspark.sql import functions as F

from materialize_spark.sources.bucketing import (
    colocated_join, shuffle_exchange_count, write_bucketed,
)

from tests.conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so the join strategy under test is SMJ."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe_old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.enabled", aqe_old)


def test_colocated_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    uniq = uuid.uuid4().hex[:8]
    li, od = f"li_b_{uniq}", f"od_b_{uniq}"
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "okey"),
                   li, ["okey"], 4, str(tmp_path / "li"))
    write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"),
                   od, ["okey"], 4, str(tmp_path / "od"))

    joined = colocated_join(spark, li, od, on=["okey"])
    assert shuffle_exchange_count(joined) == 0

    # same answer as the plain (shuffling) join
    plain = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == plain
    assert shuffle_exchange_count(
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)) > 0

    spark.sql(f"DROP TABLE IF EXISTS {li}")
    spark.sql(f"DROP TABLE IF EXISTS {od}")


def test_bucketed_aggregation_skips_shuffle(spark, tmp_path, no_broadcast):
    uniq = uuid.uuid4().hex[:8]
    tbl = f"li_agg_{uniq}"
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(lineitem, tbl, ["l_orderkey"], 4, str(tmp_path / "agg"))
    agg = (spark.table(tbl).groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("q")))
    assert shuffle_exchange_count(agg) == 0
    assert agg.count() == lineitem.select("l_orderkey").distinct().count()
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_salted_join_matches_plain_join(spark):
    from materialize_spark.operators.skew import salted_join
    # one hot key (90% of rows) + a tail
    left = spark.createDataFrame(
        [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        "k string, v long")
    right = spark.createDataFrame(
        [("hot", 1), ("k1", 10), ("k2", 20), ("missing", 0)], "k string, w long")
    got = salted_join(left, right, on=["k"]).groupBy("k").count()
    want = left.join(right, on=["k"]).groupBy("k").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    from materialize_spark.operators.skew import salted_join
    left = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    right = spark.createDataFrame([("a", 9)], "k string, w long")
    rows = sorted((r.k, r.w) for r in salted_join(left, right, ["k"], "left").collect())
    assert rows == [("a", 9), ("b", None)]


def test_keyed_arrangements_share_one_shard_count(spark):
    """Co-partitioned joins need MATCHING partition counts: every keyed
    arrangement must use the session-uniform shard count (round 6 — the
    reference arranges all collections across one timely worker set).
    Pinned at sf0.1 where the counts are non-trivial."""
    from materialize_spark.catalog import ARRANGE_KEYS, LazyTables
    tabs = LazyTables(spark, "/root/testdata/sf0.1", register=False)
    counts = {n: tabs[n].rdd.getNumPartitions()
              for n in ("lineitem", "orders", "customer", "supplier",
                        "part") if n in ARRANGE_KEYS}
    assert len(set(counts.values())) == 1, counts
    assert counts["lineitem"] > 1  # sf0.1 is big enough to be keyed
    # secondary arrangements too
    sec = tabs.index("orders", "o_custkey")
    assert sec.rdd.getNumPartitions() == counts["orders"]
