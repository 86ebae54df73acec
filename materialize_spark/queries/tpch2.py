"""Adapted variants of the partsupp-dependent TPC-H queries (Q2/Q11/Q16/Q20).

The driver schema has no partsupp table (FIXTURES.md), so the part↔supplier
relationship is derived from lineitem history. Each variant preserves the
original query's *plan shape* — the point of the exercise:
Q2: correlated-min over a multiway dim join; Q11: scalar-subquery threshold
over a grouped sum; Q16: NOT IN + count-distinct grouping; Q20: nested
semi-join chain with a correlated aggregate threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.queries import register
from materialize_spark.queries.util import T, r2, revenue, ts

B = F.broadcast


@register(
    "tpch_q2_adapted",
    """
    -- cheapest (min s_acctbal) supplier who ever shipped each EUROPE part
    WITH ps AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE')
    SELECT p_partkey, p_name, s_name, n_name, round(s_acctbal, 2) AS s_acctbal
    FROM part JOIN ps ON p_partkey = partkey
              JOIN eu ON suppkey = s_suppkey
    WHERE p_size <= 10
      AND s_acctbal = (SELECT min(e2.s_acctbal) FROM ps ps2 JOIN eu e2
                       ON ps2.suppkey = e2.s_suppkey
                       WHERE ps2.partkey = p_partkey)
    """,
    "tpch", "correlated-subquery",
)
def q2_adapted(spark, sf_dir):
    t = T(spark, sf_dir)
    ps = t.lineitem.select(F.col("l_partkey").alias("partkey"),
                           F.col("l_suppkey").alias("suppkey")).distinct()
    eu = (
        t.supplier
        .join(B(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(B(t.region.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pse = ps.join(eu, F.col("suppkey") == F.col("s_suppkey"))
    min_bal = pse.groupBy("partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        pse.join(min_bal, on="partkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(B(t.part.filter(F.col("p_size") <= 10)),
              F.col("partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "s_name", "n_name",
                F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "tpch_q11_adapted",
    """
    -- inventory value per part from one nation's suppliers, keep parts
    -- above 1/1000 of the total (scalar-subquery threshold)
    WITH v AS (
      SELECT l_partkey AS partkey,
             sum(l_extendedprice * l_quantity) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l_partkey)
    SELECT partkey, round(value, 2) AS value
    FROM v WHERE value > (SELECT sum(value) * 0.001 FROM v)
    """,
    "tpch", "scalar-subquery",
)
def q11_adapted(spark, sf_dir):
    t = T(spark, sf_dir)
    nats = t.nation.filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
    v = (
        t.lineitem
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(B(nats), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    total = v.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        v.join(B(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("partkey", F.round("value", 2).alias("value"))
    )


@register(
    "tpch_q16_adapted",
    """
    -- supplier diversity per (brand, type, size), excluding flagged suppliers
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%#000000001%')
    GROUP BY p_brand, p_type, p_size
    """,
    "tpch", "antijoin", "count-distinct",
)
def q16_adapted(spark, sf_dir):
    t = T(spark, sf_dir)
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    flagged = t.supplier.filter(F.col("s_name").like("%#000000001%")) \
        .select("s_suppkey")
    return (
        t.lineitem
        .join(B(parts.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(B(flagged), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_adapted",
    """
    -- suppliers who shipped more than 50 units of some 'red' part in 1997
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 50)
    """,
    "tpch", "semijoin", "having",
)
def q20_adapted(spark, sf_dir):
    t = T(spark, sf_dir)
    qualifying = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= ts("1997-01-01"))
            & (F.col("l_shipdate") < ts("1998-01-01")))
        .join(B(t.part.filter(F.col("p_name").like("%red%")).select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    return (
        t.supplier.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"),
                        "left_semi")
        .join(B(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )
