"""TPC-H-adapted macro queries.

Reference corpus: test/sqllogictest/tpch_select.slt (all 22 queries). The
driver's schema (FIXTURES.md) omits partsupp and several columns
(l_commitdate, l_receiptdate, l_shipmode, p_container, c_phone, ...), so
queries touching those are adapted to equivalent operator shapes on the
available columns; Q2/Q11/Q16/Q20 (partsupp-central) are covered by adapted
variants exercising the same plan shapes (multi-way join + correlated agg).

Plan-shape notes (100 TB stance):
- region/nation joins always broadcast (O(10)-row dims).
- customer/supplier/part joins: leave to AQE's dynamic broadcast; at real
  scale these are hash-shuffle joins co-partitioned on the join key.
- Aggregates are expressed groupBy().agg() so Catalyst does partial
  (map-side) aggregation before the shuffle.

The 8 HEADLINE queries (bench.py) are built as single ``spark.sql`` strings
via ``sql_over``: one py4j roundtrip instead of one per Column call, which
removes ~60-110 ms/query of driver→JVM plan-build chatter (PERF.md). The
non-headline queries stay in DataFrame form — both styles produce identical
Catalyst plans, and keeping both demonstrates the two front-ends.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.queries import register
from materialize_spark.queries.util import T, fmt_date, r2, revenue, sql_over, ts

B = F.broadcast


# --------------------------------------------------------------------------
@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)      AS sum_qty,
           round(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) / 1e2, 2) AS sum_base_price,
           round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4 + 0.5) AS BIGINT)) / 1e4, 2) AS sum_disc_price,
           round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e6 + 0.5) AS BIGINT)) / 1e6, 2) AS sum_charge,
           round(avg(l_quantity), 4)      AS avg_qty,
           round(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) / 1e2 / count(*), 4) AS avg_price,
           round(sum(CAST(floor(l_discount * 1e2 + 0.5) AS BIGINT)) / 1e2 / count(*), 6) AS avg_disc,
           CAST(count(*) AS BIGINT)       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "tpch", "reduce",
)
def q1(spark, sf_dir):
    # lineitem_scan: the scan-optimal access path — q1 joins nothing,
    # so the keyed arrangement's co-partitioning buys it nothing; past
    # the SCAN_PARQUET_BYTES crossover the vectorized parquet reader
    # beats the columnar cache decode (catalog.LazyTables.scan,
    # measured x10: 216 vs 289 ms).
    #
    # Money sums accumulate as exact integer cents (the source values
    # carry 2/4/6 decimal digits, so floor(x*10^k + 0.5) recovers the
    # exact scaled integer from the double — the products sit within
    # 1e-5 of it): BIGINT summation is order-independent, where the
    # plain double sum differs between Spark's 32-shard partial-agg
    # order and the oracle's sequential scan by ~1e-5 at sf0.1 —
    # enough to flip round(x, 2) at one-cent knife-edges (VERDICT r13
    # item 7; both raw sums measured straddling ...231.625). floor+cast
    # stays in whole-stage codegen (no per-row BigDecimal like round()),
    # and the avg columns divide the exact sums, with the scaled
    # round(x*10^k)/10^k form on the Spark side matching DuckDB's
    # binary-value rounding (the subquery_decorrelated precedent).
    # Verified value-identical vs DuckDB at sf0.001/0.01/0.1.
    return sql_over(spark, sf_dir, ("lineitem:scan",), """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) / 1e2, 2) AS sum_base_price,
               round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4 + 0.5) AS BIGINT)) / 1e4, 2) AS sum_disc_price,
               round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e6 + 0.5) AS BIGINT)) / 1e6, 2) AS sum_charge,
               round(round(avg(l_quantity) * 1e4) / 1e4, 4) AS avg_qty,
               round(round(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) / 1e2 / count(*) * 1e4) / 1e4, 4) AS avg_price,
               round(round(sum(CAST(floor(l_discount * 1e2 + 0.5) AS BIGINT)) / 1e2 / count(*) * 1e6) / 1e6, 6) AS avg_disc,
               count(*)                       AS count_order
        FROM lineitem_scan
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """)


# --------------------------------------------------------------------------
@register(
    "tpch_q3",
    """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    "tpch", "join", "topk",
)
def q3(spark, sf_dir):
    # SHUFFLE_HASH(lineitem): the filtered fact side fits under the 64 MiB
    # broadcast threshold at sf0.1, but a broadcast hash-relation build is
    # single-threaded on the driver (~100 ms here) AND is the wrong shape at
    # scale — a fact table must never be the broadcast side. Shuffled hash
    # join builds in parallel and is the 100 TB plan.
    return sql_over(spark, sf_dir, ("customer", "orders", "lineitem"), """
        SELECT /*+ BROADCAST(customer), SHUFFLE_HASH(lineitem) */ o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """)


# --------------------------------------------------------------------------
@register(
    "tpch_q4",
    """
    -- adapted: no l_commitdate/l_receiptdate; 'late' = shipped >90d after order
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
    "tpch", "semijoin",
)
def q4(spark, sf_dir):
    t = T(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= ts("1997-01-01"))
        & (F.col("o_orderdate") < ts("1997-10-01"))
    )
    late = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q5",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    "tpch", "join", "multiway",
)
def q5(spark, sf_dir):
    # Join order is delta-join routing over arrangements: orders and
    # lineitem are both arranged by orderkey, so the biggest join is
    # exchange-free (lineitem — the fastest-growing table — never
    # shuffles); only the much smaller post-join stream re-keys to meet
    # customer. Catalyst keeps the syntactic order with CBO off, so the
    # SQL spells the routing. supplier_asia_denorm is the SHARED
    # region-filtered arrangement of supplier⋈nation⋈region
    # (catalog.denorm — the reference keeps an index on exactly such a
    # filtered view and shares it across dataflows): the
    # filter + projection + dim joins are paid once per session; each
    # execution pays one broadcast build over the tiny cached frame.
    return sql_over(
        spark, sf_dir,
        ("customer", "orders", "lineitem", "supplier_asia_denorm"), """
        SELECT /*+ BROADCAST(asia), SHUFFLE_HASH(orders) */
               n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
          JOIN supplier_asia_denorm asia
            ON l_suppkey = s_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          -- customer: the KEYED arrangement (hash-partitioned on
          -- c_custkey). Below the broadcast threshold Catalyst still
          -- broadcasts it; past it (x10+) the join plans shuffled-hash
          -- with the customer side EXCHANGE-FREE (HashPartitioning on
          -- a subset of the join keys satisfies the distribution) —
          -- only the small post-join stream re-keys. Measured x10:
          -- 318 ms vs 366 ms for the broadcast-side compact copy,
          -- and no fact-sized broadcast build at any scale.
          JOIN customer
            ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """)


# --------------------------------------------------------------------------
@register(
    "tpch_q6",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "tpch", "filter",
)
def q6(spark, sf_dir):
    # lineitem_scan: see q1 — scan-optimal path for the no-join agg
    return sql_over(spark, sf_dir, ("lineitem:scan",), """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem_scan
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """)


# --------------------------------------------------------------------------
@register(
    "tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                        JOIN orders   ON o_orderkey = l_orderkey
                        JOIN customer ON c_custkey = o_custkey
                        JOIN nation n1 ON s_nationkey = n1.n_nationkey
                        JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
         ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch", "join", "selfjoin",
)
def q7(spark, sf_dir):
    t = T(spark, sf_dir)
    n1 = t.nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = t.nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        t.lineitem.filter(F.col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31")))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(B(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(B(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            revenue().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(r2(F.sum("volume")).alias("revenue"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q8",
    """
    SELECT o_year, round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                         / sum(volume), 6) AS mkt_share
    FROM (SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part JOIN lineitem ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders   ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation n1 ON c_nationkey = n1.n_nationkey
                    JOIN region    ON n1.n_regionkey = r_regionkey
                    JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
         ) all_nations
    GROUP BY o_year
    """,
    "tpch", "join", "agg-expr",
)
def q8(spark, sf_dir):
    t = T(spark, sf_dir)
    n1 = t.nation.select(F.col("n_nationkey").alias("c_nk"), "n_regionkey")
    n2 = t.nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    vol = (
        t.lineitem
        .join(B(t.part.filter(F.col("p_type") == "STANDARD").select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t.orders.filter(
            F.col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(B(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(B(t.region.filter(F.col("r_name") == "AMERICA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .join(B(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"),
                revenue().alias("volume"), "nation")
    )
    return (
        vol.groupBy("o_year")
        .agg(F.round(
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
            / F.sum("volume"), 6).alias("mkt_share"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q9",
    """
    -- adapted: no ps_supplycost; profit = revenue only
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS amount
          FROM part JOIN lineitem ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    """,
    "tpch", "join",
)
def q9(spark, sf_dir):
    # supplier_denorm (shared supplier⋈nation arrangement, catalog.denorm)
    # replaces the separate supplier and nation broadcasts: one fewer
    # broadcast-exchange job per execution, same rows broadcast.
    return sql_over(
        spark, sf_dir, ("part", "lineitem", "supplier_denorm", "orders"), """
        SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (SELECT /*+ BROADCAST(part, supplier_denorm),
                         SHUFFLE_HASH(orders) */
                     n_name AS nation,
                     CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount) AS amount
              -- broadcast joins preserve lineitem's orderkey
              -- arrangement, so the orders join that follows them is
              -- exchange-free; the only shuffle left is the final agg
              FROM part JOIN lineitem ON p_partkey = l_partkey
                        JOIN orders ON o_orderkey = l_orderkey
                        JOIN supplier_denorm ON s_suppkey = l_suppkey
              WHERE p_name LIKE '%red%') profit
        GROUP BY nation, o_year
    """)


# --------------------------------------------------------------------------
@register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "tpch", "join", "topk",
)
def q10(spark, sf_dir):
    t = T(spark, sf_dir)
    return (
        t.orders.filter(
            (F.col("o_orderdate") >= ts("1997-10-01"))
            & (F.col("o_orderdate") < ts("1998-01-01")))
        .join(t.lineitem.filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(B(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(r2(F.sum(revenue())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                F.round("c_acctbal", 2).alias("c_acctbal"), "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q12",
    """
    -- adapted: no l_shipmode/l_commitdate; lateness buckets by priority
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
    "tpch", "agg-expr",
)
def q12(spark, sf_dir):
    t = T(spark, sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    return (
        t.orders.filter(
            (F.col("o_orderdate") >= ts("1996-01-01"))
            & (F.col("o_orderdate") < ts("1997-01-01")))
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("late_count"),
            F.sum(F.when(~late, 1).otherwise(0)).cast("long").alias("ontime_count"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
    "tpch", "outerjoin",
)
def q13(spark, sf_dir):
    # Aggregate pushdown through the outer join: count orders per custkey
    # FIRST (partial+final agg over the o_custkey secondary arrangement —
    # exchange-free), then left-join customer to the counts. The join
    # shrinks from |customer| x |orders| rows probed to |customer| x
    # |custkeys-with-orders| (~10x fewer at any SF), and both join inputs
    # remain arranged on the join key, so the whole pipeline to the final
    # c_count regroup is still exchange-free. SHUFFLE_HASH pins the
    # counts side out of broadcast: per-customer counts are
    # customer-cardinality — a fact-sized relation at 100 TB, not a dim
    # (same rule as test_plans.py's no-fact-broadcast guard).
    return sql_over(spark, sf_dir, ("customer", "orders:o_custkey"), """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT /*+ SHUFFLE_HASH(oc) */
                     c_custkey, coalesce(cnt, CAST(0 AS BIGINT)) AS c_count
              FROM customer LEFT OUTER JOIN (
                  SELECT o_custkey, count(*) AS cnt
                  FROM orders_by_o_custkey
                  WHERE o_orderpriority <> '1-URGENT'
                  GROUP BY o_custkey) oc
                ON c_custkey = o_custkey) c_orders
        GROUP BY c_count
    """)


# --------------------------------------------------------------------------
@register(
    "tpch_q14",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "tpch", "agg-expr",
)
def q14(spark, sf_dir):
    t = T(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= ts("1997-09-01"))
            & (F.col("l_shipdate") < ts("1997-10-01")))
        .join(B(t.part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", revenue()).otherwise(0.0))
            / F.sum(revenue()), 6).alias("promo_revenue"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q15",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "tpch", "cte", "subquery",
)
def q15(spark, sf_dir):
    t = T(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= ts("1997-01-01"))
            & (F.col("l_shipdate") < ts("1997-04-01")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(r2(F.sum(revenue())).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mr"))
    return (
        rev.join(B(max_rev), F.col("total_revenue") == F.col("mr"))
        .join(t.supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q17",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
    """,
    "tpch", "correlated-subquery",
)
def q17(spark, sf_dir):
    t = T(spark, sf_dir)
    part_avg = (
        t.lineitem.groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.avg("l_quantity") * 0.2).alias("qty_limit"))
    )
    return (
        t.lineitem
        .join(B(t.part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    "tpch", "semijoin", "having",
)
def q18(spark, sf_dir):
    return sql_over(spark, sf_dir, ("customer", "orders", "lineitem"), """
        SELECT /*+ SHUFFLE_HASH(lineitem) */
               c_name, c_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(sum(l_quantity), 2) AS sum_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """)


# --------------------------------------------------------------------------
@register(
    "tpch_q19",
    """
    -- adapted: p_container → p_size bands
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    "tpch", "disjunctive-join",
)
def q19(spark, sf_dir):
    t = T(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        t.lineitem.join(B(t.part.select("p_partkey", "p_brand", "p_size")),
                        F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(r2(F.sum(revenue())).alias("revenue"))
    )


# --------------------------------------------------------------------------
@register(
    "tpch_q21",
    """
    -- adapted: 'kept waiting' = only supplier in a multi-supplier order whose
    -- shipment is >60d after order date
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                  JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    "tpch", "antijoin",
)
def q21(spark, sf_dir):
    # Explicit SEMI/ANTI join form (not correlated EXISTS): Catalyst's
    # decorrelation of the two EXISTS planned an extra join pass; spelling
    # the semi/anti joins keeps the one fact×fact self-join of the hand
    # plan (the deliberate SortMergeJoin — see PLANS.md).
    return sql_over(spark, sf_dir, ("supplier", "lineitem", "orders"), """
        WITH l1 AS (
          SELECT /*+ SHUFFLE_HASH(orders) */ l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT /*+ BROADCAST(supplier) */ s_name, count(*) AS numwait
        FROM (
          SELECT /*+ SHUFFLE_HASH(others, late_others) */
                 l_orderkey, l_suppkey FROM l1
          LEFT SEMI JOIN (SELECT l_orderkey AS ok2, l_suppkey AS sk2
                          FROM lineitem) others
            ON ok2 = l_orderkey AND sk2 <> l_suppkey
          LEFT ANTI JOIN (SELECT l_orderkey AS ok3, l_suppkey AS sk3
                          FROM l1) late_others
            ON ok3 = l_orderkey AND sk3 <> l_suppkey
        ) waiting
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """)


# --------------------------------------------------------------------------
@register(
    "tpch_q22",
    """
    -- adapted: c_phone cntrycode → nation; customers with above-average
    -- positive balance and no orders
    SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
    "tpch", "antijoin", "subquery",
)
def q22(spark, sf_dir):
    t = T(spark, sf_dir)
    avg_bal = (
        t.customer.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    return (
        t.customer.join(B(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
        .join(t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey")),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(B(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"),
             r2(F.sum("c_acctbal")).alias("totacctbal"))
    )
