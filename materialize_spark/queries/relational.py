"""Operator-coverage queries: one per MIR/HIR operator family.

Reference inventory: SURVEY.md §2.1 (MirRelationExpr, 16 variants,
src/expr/src/relation.rs:99-309) + HIR features (outer joins, EXISTS/IN,
DISTINCT ON — src/sql/src/plan/hir.rs) + window functions (§2.5) + table
functions (§2.4) + LetRec (§2.1 #4).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from materialize_spark.functions.aggregates import string_agg
from materialize_spark.operators import (
    distinct_on, except_all, intersect_all, let_rec, topk, with_ordinality,
)
from materialize_spark.queries import register
from materialize_spark.queries.util import T, fmt_date, r2


# -- Union / set operations (MIR Union/Negate/Threshold) --------------------
@register(
    "setops_union_all",
    """
    SELECT part, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT 'cust' AS part, c_nationkey AS nk FROM customer
      UNION ALL
      SELECT 'supp' AS part, s_nationkey AS nk FROM supplier
    ) u GROUP BY part
    """,
    "setops",
)
def setops_union_all(spark, sf_dir):
    t = T(spark, sf_dir)
    u = (
        t.customer.select(F.lit("cust").alias("part"), F.col("c_nationkey").alias("nk"))
        .unionAll(t.supplier.select(F.lit("supp").alias("part"), F.col("s_nationkey").alias("nk")))
    )
    return u.groupBy("part").agg(F.count(F.lit(1)).alias("n"))


@register(
    "setops_except_intersect",
    """
    SELECT 'except' AS op, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT c_nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier) a
    UNION ALL
    SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT c_nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier) b
    UNION ALL
    SELECT 'except_distinct' AS op, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier) c
    """,
    "setops", "threshold",
)
def setops_except_intersect(spark, sf_dir):
    t = T(spark, sf_dir)
    c = t.customer.select(F.col("c_nationkey"))
    s = t.supplier.select(F.col("s_nationkey"))
    exc = except_all(c, s).agg(F.count(F.lit(1)).alias("n")) \
        .select(F.lit("except").alias("op"), "n")
    ixn = intersect_all(c, s).agg(F.count(F.lit(1)).alias("n")) \
        .select(F.lit("intersect").alias("op"), "n")
    exd = c.exceptAll(s).distinct().exceptAll(s.distinct()).distinct() \
        .agg(F.count(F.lit(1)).alias("n")) \
        .select(F.lit("except_distinct").alias("op"), "n")
    return exc.unionAll(ixn).unionAll(exd)


# -- DISTINCT ON (TopK limit=1, src/sql/src/plan/query.rs:2688) -------------
@register(
    "distinct_on_first_order",
    """
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS first_orderdate
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    "distinct-on", "topk",
)
def distinct_on_first_order(spark, sf_dir):
    t = T(spark, sf_dir)
    return distinct_on(
        t.orders, ["o_custkey"],
        [F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc_nulls_last()],
    ).select("o_custkey", "o_orderkey", fmt_date("o_orderdate").alias("first_orderdate"))


# -- TopK per group (MIR TopK) ----------------------------------------------
@register(
    "topk_orders_per_segment",
    """
    SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders JOIN customer ON o_custkey = c_custkey) x
    WHERE rn <= 3
    """,
    "topk",
)
def topk_orders_per_segment(spark, sf_dir):
    t = T(spark, sf_dir)
    joined = t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
    return topk(
        joined, ["c_mktsegment"],
        [F.col("o_totalprice").desc_nulls_first(), F.col("o_orderkey").asc_nulls_last()],
        limit=3,
    ).select("c_mktsegment", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


# -- Window functions (§2.5: row_number/rank/lag/lead/frames) ---------------
@register(
    "window_functions",
    """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS BIGINT) AS rk,
           CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS BIGINT) AS drk,
           lag(o_orderkey) OVER w AS prev_ok,
           lead(o_orderkey) OVER w AS next_ok,
           first_value(o_orderkey) OVER w AS first_ok,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window",
)
def window_functions(spark, sf_dir):
    t = T(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t.orders.filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey", "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(wp).cast("long").alias("rk"),
            F.dense_rank().over(wp).cast("long").alias("drk"),
            F.lag("o_orderkey").over(w).alias("prev_ok"),
            F.lead("o_orderkey").over(w).alias("next_ok"),
            F.first("o_orderkey").over(w).alias("first_ok"),
            F.round(F.sum("o_totalprice").over(wr), 2).alias("running_total"),
        )
    )


@register(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS BIGINT) AS orders_30d
    FROM orders WHERE o_custkey <= 50
    """,
    "window", "range-frame",
)
def window_range_frame(spark, sf_dir):
    t = T(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return (
        t.orders.filter(F.col("o_custkey") <= 50)
        .select("o_orderkey", "o_custkey",
                F.count(F.lit(1)).over(w).cast("long").alias("orders_30d"))
    )


# -- Outer joins (HIR JoinKind, lowered per 101-query-compilation.md) -------
@register(
    "outer_join_full",
    """
    SELECT n_name,
           CAST(coalesce(cust_n, 0) AS BIGINT) AS cust_n,
           CAST(coalesce(supp_n, 0) AS BIGINT) AS supp_n
    FROM (SELECT c_nationkey AS nk, count(*) AS cust_n FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS supp_n FROM supplier GROUP BY 1) s
      USING (nk)
    JOIN nation ON n_nationkey = coalesce(c.nk, s.nk)
    """,
    "outerjoin",
)
def outer_join_full(spark, sf_dir):
    t = T(spark, sf_dir)
    c = t.customer.groupBy(F.col("c_nationkey").alias("cnk")) \
        .agg(F.count(F.lit(1)).alias("cust_n"))
    s = t.supplier.groupBy(F.col("s_nationkey").alias("snk")) \
        .agg(F.count(F.lit(1)).alias("supp_n"))
    return (
        c.join(s, F.col("cnk") == F.col("snk"), "full_outer")
        .join(t.nation, F.col("n_nationkey") == F.coalesce(F.col("cnk"), F.col("snk")))
        .select("n_name",
                F.coalesce("cust_n", F.lit(0)).cast("long").alias("cust_n"),
                F.coalesce("supp_n", F.lit(0)).cast("long").alias("supp_n"))
    )


@register(
    "cross_join_pairs",
    """
    SELECT r1.r_name AS a, r2.r_name AS b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_name < r2.r_name
    """,
    "crossjoin",
)
def cross_join_pairs(spark, sf_dir):
    t = T(spark, sf_dir)
    r1 = t.region.select(F.col("r_name").alias("a"))
    r2 = t.region.select(F.col("r_name").alias("b"))
    return r1.crossJoin(r2).filter(F.col("a") < F.col("b"))


# -- Table functions (MIR FlatMap) ------------------------------------------
@register(
    "tablefunc_generate_series",
    """
    SELECT CAST(g AS BIGINT) AS g, CAST(g * g AS BIGINT) AS g_squared
    FROM generate_series(1, 100) t(g)
    """,
    "tablefunc",
)
def tablefunc_generate_series(spark, sf_dir):
    from materialize_spark.operators import generate_series
    g = generate_series(spark, 1, 100, col_name="g")
    return g.select(F.col("g").cast("long").alias("g"),
                    (F.col("g") * F.col("g")).cast("long").alias("g_squared"))


@register(
    "tablefunc_unnest_ordinality",
    """
    SELECT p_partkey, word, CAST(ordinality AS BIGINT) AS ordinality
    FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word,
                 generate_subscripts(string_split(p_name, ' '), 1) AS ordinality
          FROM part) x
    """,
    "tablefunc", "unnest",
)
def tablefunc_unnest_ordinality(spark, sf_dir):
    t = T(spark, sf_dir)
    return with_ordinality(
        t.part.select("p_partkey", F.split("p_name", " ").alias("words")),
        "words", alias="word",
    ).select("p_partkey", "word", F.col("ordinality").cast("long").alias("ordinality"))


# -- LetRec / WITH MUTUALLY RECURSIVE (MIR LetRec) --------------------------
@register(
    "letrec_reachability",
    """
    -- transitive closure: region <-> nation(key+100) bipartite edges
    WITH RECURSIVE edges(src, dst) AS (
        SELECT n_regionkey, n_nationkey + 100 FROM nation
        UNION ALL
        SELECT n_nationkey + 100, n_regionkey FROM nation
    ),
    reach(node) AS (
        SELECT 0 UNION
        SELECT e.dst FROM edges e, reach r WHERE e.src = r.node
    )
    SELECT CAST(count(*) AS BIGINT) AS reachable,
           CAST(sum(node) AS BIGINT) AS node_sum
    FROM reach
    """,
    "letrec", "recursion",
)
def letrec_reachability(spark, sf_dir):
    t = T(spark, sf_dir)
    # Graph: region r connects to nation (key+100) for every nation in r.
    edges = t.nation.select(
        F.col("n_regionkey").cast("long").alias("src"),
        (F.col("n_nationkey") + 100).cast("long").alias("dst"))
    edges = edges.unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seed = spark.range(1).select(F.lit(0).cast("long").alias("node"))

    def step(bindings):
        reach = bindings["reach"]
        new = reach.join(edges, reach["node"] == edges["src"]).select(
            F.col("dst").alias("node"))
        return {"reach": reach.unionAll(new)}

    result = let_rec({"reach": seed}, step, distinct=True)["reach"]
    return result.agg(F.count(F.lit(1)).alias("reachable"),
                      F.sum("node").cast("long").alias("node_sum"))


# -- Reduce: full aggregate battery (§2.3) ----------------------------------
@register(
    "agg_battery",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_discount > 0.09) AS any_big_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    "reduce", "aggregates",
)
def agg_battery(spark, sf_dir):
    t = T(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        )
    )


@register(
    "agg_string_agg_ordered",
    """
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
    "aggregates", "string_agg",
)
def agg_string_agg_ordered(spark, sf_dir):
    t = T(spark, sf_dir)
    return t.nation.groupBy("n_regionkey").agg(
        string_agg("n_name", ",", order_by="n_name").alias("nations"))


# -- Grouping sets / rollup (Spark-native surplus; SURVEY §2.3 note) --------
@register(
    "agg_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "rollup",
)
def agg_rollup(spark, sf_dir):
    t = T(spark, sf_dir)
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"), "n")
    )


@register(
    "join_skew_salted",
    """
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.event_type
    """,
    "join", "skew", "salting",
)
def join_skew_salted(spark, sf_dir):
    """Skew-aware salted join (operators/skew.salted_join): identical
    output to the plain equi-join — the oracle IS the plain join — with
    the hot keys spread over 8 salted partitions. The explicit-salting
    path AQE can't always rewrite (streaming micro-batches, pre-stats
    plans); here exercised end-to-end against the unsalted oracle."""
    from materialize_spark.operators.skew import salted_join

    t = T(spark, sf_dir)
    ev = t.events.select(F.col("user_id").alias("c_custkey"),
                         "event_type", "value")
    joined = salted_join(ev, t.customer.select("c_custkey"),
                         on=["c_custkey"], salt=8)
    return (joined.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("total_value")))


@register(
    "join_asof",
    """
    WITH calib AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hts,
             round(avg(value), 6) AS calib
      FROM events GROUP BY 1, 2),
    l AS (SELECT user_id, ts, event_id FROM events WHERE user_id <= 100)
    SELECT CAST(l.user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(c.calib), 2) AS total_calib
    FROM l ASOF JOIN calib c ON l.user_id = c.user_id AND l.ts >= c.hts
    GROUP BY l.user_id
    """,
    "join", "asof",
)
def join_asof(spark, sf_dir):
    """As-of join (operators/asof.asof_join): attach each event's latest
    hourly calibration at-or-before its timestamp. Union-merge form — tag
    sides, per-key time sort, carry the last right payload forward — ONE
    keyed shuffle, no inequality join, no per-key quadratic blowup. The
    oracle is DuckDB's native ASOF JOIN."""
    from materialize_spark.operators.asof import asof_join

    t = T(spark, sf_dir)
    calib = (t.events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hts"))
        .agg(F.round(F.avg("value"), 6).alias("calib")))
    left = (t.events.filter(F.col("user_id") <= 100)
            .select("user_id", "ts", "event_id"))
    joined = asof_join(left, calib, on=["user_id"],
                       left_ts="ts", right_ts="hts")
    return (joined.groupBy(F.col("user_id").cast("long").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("calib"), 2).alias("total_calib")))


@register(
    "join_range_band",
    """
    WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id
               FROM events WHERE user_id <= 20)
    SELECT CAST(a.user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND abs(a.tus - b.tus) <= 300000000
     AND a.event_id < b.event_id
    GROUP BY a.user_id
    """,
    "join", "range", "band",
)
def join_range_band(spark, sf_dir):
    """Range (band) join (operators/asof.range_join): event pairs of the
    same user within 5 minutes. Bucketed into band-width bins so the
    quadratic candidate set shrinks to same/adjacent-bin pairs and the
    join is an equi-join on (user, bin); integer-microsecond time on both
    engines. The oracle is the plain inequality join."""
    from materialize_spark.operators.asof import range_join

    t = T(spark, sf_dir)
    base = (t.events.filter(F.col("user_id") <= 20)
            .select("user_id", F.unix_micros("ts").alias("tus"), "event_id"))
    l = base.select("user_id", F.col("tus").alias("ltus"),
                    F.col("event_id").alias("id_a"))
    r = base.select("user_id", F.col("tus").alias("rtus"),
                    F.col("event_id").alias("id_b"))
    pairs = range_join(l, r, on=["user_id"], left_ts="ltus",
                       right_ts="rtus", width=300_000_000,
                       how_filter=F.col("id_a") < F.col("id_b"))
    return (pairs.groupBy(F.col("user_id").cast("long").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n_pairs")))


@register(
    "join_wide_16way",
    """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, n1.n_name AS nat,
           r1.r_name AS reg, n8.n_name AS nat8, r8.r_name AS reg8
    FROM customer c
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
    JOIN nation n2 ON n2.n_nationkey = n1.n_nationkey JOIN region r2 ON r2.r_regionkey = n2.n_regionkey JOIN nation n3 ON n3.n_nationkey = n1.n_nationkey JOIN region r3 ON r3.r_regionkey = n3.n_regionkey JOIN nation n4 ON n4.n_nationkey = n1.n_nationkey JOIN region r4 ON r4.r_regionkey = n4.n_regionkey JOIN nation n5 ON n5.n_nationkey = n1.n_nationkey JOIN region r5 ON r5.r_regionkey = n5.n_regionkey JOIN nation n6 ON n6.n_nationkey = n1.n_nationkey JOIN region r6 ON r6.r_regionkey = n6.n_regionkey JOIN nation n7 ON n7.n_nationkey = n1.n_nationkey JOIN region r7 ON r7.r_regionkey = n7.n_regionkey JOIN nation n8 ON n8.n_nationkey = n1.n_nationkey JOIN region r8 ON r8.r_regionkey = n8.n_regionkey
    WHERE c_custkey <= 500
""",
    "join", "wide", "delta",
)
def join_wide_16way(spark, sf_dir):
    """16-relation join chain (reference: delta joins 'tested on joins of
    up to 64 relations', README; MIR N-ary Join). One broadcast per
    O(10)-row dim side; Catalyst folds the chain into a single codegen
    pipeline over the customer scan — the shape a delta join keeps at
    scale (no intermediate materialization)."""
    from materialize_spark.queries.util import sql_over

    return sql_over(
        spark, sf_dir, ("customer", "nation", "region"),
        """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, n1.n_name AS nat,
           r1.r_name AS reg, n8.n_name AS nat8, r8.r_name AS reg8
    FROM customer c
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
    JOIN nation n2 ON n2.n_nationkey = n1.n_nationkey JOIN region r2 ON r2.r_regionkey = n2.n_regionkey JOIN nation n3 ON n3.n_nationkey = n1.n_nationkey JOIN region r3 ON r3.r_regionkey = n3.n_regionkey JOIN nation n4 ON n4.n_nationkey = n1.n_nationkey JOIN region r4 ON r4.r_regionkey = n4.n_regionkey JOIN nation n5 ON n5.n_nationkey = n1.n_nationkey JOIN region r5 ON r5.r_regionkey = n5.n_regionkey JOIN nation n6 ON n6.n_nationkey = n1.n_nationkey JOIN region r6 ON r6.r_regionkey = n6.n_regionkey JOIN nation n7 ON n7.n_nationkey = n1.n_nationkey JOIN region r7 ON r7.r_regionkey = n7.n_regionkey JOIN nation n8 ON n8.n_nationkey = n1.n_nationkey JOIN region r8 ON r8.r_regionkey = n8.n_regionkey
    WHERE c_custkey <= 500
""")


def _wide64_sql() -> str:
    """64-relation join chain: customer + nation x32 + region x31 —
    the reference's advertised delta-join width (README 'tested on
    joins of up to 64 relations'; LDBC-BI experiments)."""
    joins = []
    for i in range(1, 33):
        joins.append(f"JOIN nation n{i} "
                     f"ON n{i}.n_nationkey = c.c_nationkey")
        if i <= 31:
            joins.append(f"JOIN region r{i} "
                         f"ON r{i}.r_regionkey = n{i}.n_regionkey")
    return (
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, "
        "n1.n_name AS nat, r1.r_name AS reg, "
        "n32.n_name AS nat32, r31.r_name AS reg31 "
        "FROM customer c " + " ".join(joins) + " WHERE c_custkey <= 500")


@register(
    "join_wide_64way",
    # Oracle note: DuckDB's join-order optimizer is exponential past
    # ~40 relations (measured: 32 rels 0.2s, 40 rels 2.5s, 48 rels 49s),
    # so the oracle is the SEMANTICALLY equal collapsed form — every
    # nation join is 1:1 on the same key, so the 64-way result equals
    # the 3-way join with aliased repeats. Spark runs the REAL 64-way.
    """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           n.n_name AS nat, r.r_name AS reg,
           n.n_name AS nat32, r.r_name AS reg31
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE c_custkey <= 500
    """,
    "join", "wide", "delta",
)
def join_wide_64way(spark, sf_dir):
    """64-relation join chain (reference README: delta joins 'tested on
    joins of up to 64 relations'). Every dim side is a broadcast; the
    customer fact never moves, and Catalyst reuses the repeated
    nation/region broadcast exchanges — the no-intermediate-
    materialization shape a delta join keeps at scale. Plan-pinned in
    tests/test_golden_plans.py (zero runtime exchanges on the fact)."""
    from materialize_spark.queries.util import sql_over

    return sql_over(spark, sf_dir, ("customer", "nation", "region"),
                    _wide64_sql())
