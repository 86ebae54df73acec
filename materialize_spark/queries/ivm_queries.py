"""IVM-under-retraction as oracle-checked queries.

Each query replays the events table as a sequence of explicit-diff update
batches — three insert waves followed by a retraction wave that deletes
every 'error' event (exactly the rows inserted earlier) — through the
retraction-aware maintenance operators (streaming/retraction.py). The final
maintained state must equal what DuckDB computes directly over the net
rows (events minus errors): the reference's defining property, incremental
result == full recompute, checked by the driver's hash gate.

Reference: Accumulable/Hierarchical reduce plans
(src/compute-types/src/plan/reduce.rs:89-140) and non-monotonic TopK
(src/compute-types/src/plan/top_k.rs:28-120).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.queries import register
from materialize_spark.queries.util import T
from materialize_spark.streaming.retraction import (
    RetractionAwareAgg, RetractionAwareTopK,
)


def _update_batches(events):
    """Three insert waves (by event_id mod 3) + one retraction wave that
    deletes every 'error' event."""
    payload = ["user_id", "value"]
    inserts = [
        events.filter(F.col("event_id") % 3 == i)
        .select(*payload).withColumn("diff", F.lit(1))
        for i in range(3)
    ]
    retract = (events.filter(F.col("event_type") == "error")
               .select(*payload).withColumn("diff", F.lit(-1)))
    return inserts + [retract]


@register(
    "ivm_retraction_agg",
    """
    SELECT user_id,
           round(sum(value), 2)            AS total,
           CAST(count(value) AS BIGINT)    AS n,
           -- mean compared as floor(x1000) of the 2-dp-rounded sum over
           -- count: both engines floor IDENTICAL doubles — round() at any
           -- width flakes on exact half-boundaries (sum/n hits .xxxx5
           -- often), and Spark rounds the printed value where DuckDB
           -- rounds the binary one
           CAST(floor(round(sum(value), 2) / count(value) * 1000) AS BIGINT) AS mean_milli,
           round(min(value), 2)            AS lo,
           round(max(value), 2)            AS hi
    FROM events WHERE event_type <> 'error'
    GROUP BY user_id
    """,
    "ivm", "retraction", "aggregate",
)
def ivm_retraction_agg(spark, sf_dir):
    """sum/count/avg (accumulable, diff arithmetic) and min/max
    (hierarchical, support table) maintained through insert + delete
    batches; the retraction wave deletes the current min/max for many
    groups, forcing the support-table path."""
    t = T(spark, sf_dir)
    mv = RetractionAwareAgg(
        spark, keys=["user_id"],
        aggs={"total": ("sum", "value"), "n": ("count", "value"),
              "mean": ("avg", "value"), "lo": ("min", "value"),
              "hi": ("max", "value")})
    out = None
    for batch in _update_batches(t.events):
        out = mv.on_batch(batch)
    return out.select(
        "user_id",
        F.round("total", 2).alias("total"),
        F.col("n").cast("long").alias("n"),
        F.floor(F.round("total", 2) / F.col("n") * 1000).cast("long")
        .alias("mean_milli"),
        F.round("lo", 2).alias("lo"),
        F.round("hi", 2).alias("hi"),
    )


@register(
    "ivm_retraction_topk",
    """
    SELECT user_id, round(value, 2) AS value
    FROM (SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC) AS rn
          FROM events WHERE event_type <> 'error')
    WHERE rn <= 3
    """,
    "ivm", "retraction", "topk",
)
def ivm_retraction_topk(spark, sf_dir):
    """Per-user top-3 values maintained under deletes: the retraction wave
    removes rows that were in the top-3, so previously-evicted rows must
    re-enter — only possible because the operator keeps the full compacted
    support, not just the current top-k (reference: non-monotonic 'Basic'
    TopK plan)."""
    t = T(spark, sf_dir)
    tk = RetractionAwareTopK(spark, keys=["user_id"], order_col="value",
                             limit=3, descending=True)
    out = None
    for batch in _update_batches(t.events):
        out = tk.on_batch(batch)
    return out.select("user_id", F.round("value", 2).alias("value"))


@register(
    "ivm_q18_threshold_delta",
    """
    WITH net AS (SELECT * FROM lineitem WHERE l_returnflag <> 'R')
    SELECT c_name, c_custkey, o_orderkey AS l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN net ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM net
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    "ivm", "retraction", "having-threshold",
)
def ivm_q18_threshold_delta(spark, sf_dir):
    """tpch q18's HAVING-threshold semijoin maintained by DELTA, not
    recompute: lineitem arrives in three insert waves plus a retraction
    wave deleting every returned ('R') shipment; per batch only touched orderkeys
    re-threshold and re-enrich (streaming/delta_ivm.ThresholdSemijoinMV).
    Final maintained state must equal DuckDB's direct q18 over the net
    rows — threshold crossings in BOTH directions happen under the
    retraction wave."""
    from materialize_spark.streaming.delta_ivm import ThresholdSemijoinMV

    t = T(spark, sf_dir)
    orders, customer = t.orders, t.customer

    def enrich(q):  # q: (l_orderkey, __sum) — the changed qualifying keys
        return (
            q.join(orders, q.l_orderkey == orders.o_orderkey)
            .join(customer, orders.o_custkey == customer.c_custkey)
            .select(
                "c_name", "c_custkey", "l_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                F.round("o_totalprice", 2).alias("o_totalprice"),
                F.round("__sum", 2).alias("sum_qty"),
            )
        )

    mv = ThresholdSemijoinMV(spark, keys=["l_orderkey"], val="l_quantity",
                             having=lambda s: s > 250, enrich=enrich)
    li = t.lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    h = F.abs(F.hash("l_orderkey", "l_linenumber")) % 3
    out = None
    for wave in range(3):
        out = mv.on_batch(li.filter(h == wave).withColumn("diff", F.lit(1)))
    out = mv.on_batch(li.filter(F.col("l_returnflag") == "R")
                      .withColumn("diff", F.lit(-1)))
    return out


@register(
    "ivm_q21_antijoin_delta",
    """
    WITH net AS (SELECT * FROM lineitem WHERE l_linenumber < 6),
    l1 AS (SELECT l_orderkey, l_suppkey
           FROM net JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'
             AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier JOIN l1 w ON s_suppkey = w.l_suppkey
    WHERE EXISTS (SELECT 1 FROM net l2
                  WHERE l2.l_orderkey = w.l_orderkey
                    AND l2.l_suppkey <> w.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3
                      WHERE l3.l_orderkey = w.l_orderkey
                        AND l3.l_suppkey <> w.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    "ivm", "retraction", "antijoin",
)
def ivm_q21_antijoin_delta(spark, sf_dir):
    """tpch q21's anti-join ("only late supplier of a multi-supplier
    order") maintained by per-key support counts instead of recompute
    (streaming/delta_ivm.ExclusiveAntiJoinMV): three insert waves plus a
    retraction wave deleting every 6th-or-later line of its order. A retracted late row can
    make ANOTHER supplier start qualifying — the non-monotonic flip the
    reference's delta-join machinery exists for; the maintained pairs are
    then rolled up per supplier and must equal DuckDB's direct answer over
    the net rows."""
    from materialize_spark.streaming.delta_ivm import ExclusiveAntiJoinMV

    t = T(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_linenumber", "l_suppkey",
                           "l_shipdate")
    ords = t.orders.select("o_orderkey", "o_orderstatus", "o_orderdate")

    def flags(rows):  # the late subset of a wave (o-join is a fixed dim)
        return (rows.join(ords, rows.l_orderkey == ords.o_orderkey)
                .filter((F.col("o_orderstatus") == "F")
                        & (F.col("l_shipdate")
                           > F.date_add(F.col("o_orderdate"), 60)))
                .select("l_orderkey", "l_suppkey", "diff"))

    mv = ExclusiveAntiJoinMV(spark, group_key="l_orderkey",
                             member_key="l_suppkey")
    h = F.abs(F.hash("l_orderkey", "l_linenumber")) % 3
    for wave in range(3):
        rows = li.filter(h == wave).withColumn("diff", F.lit(1))
        mv.on_batch(all_delta=rows.select("l_orderkey", "l_suppkey", "diff"),
                    flag_delta=flags(rows))
    retract = (li.filter(F.col("l_linenumber") >= 6)
               .withColumn("diff", F.lit(-1)))
    wait = mv.on_batch(
        all_delta=retract.select("l_orderkey", "l_suppkey", "diff"),
        flag_delta=flags(retract))
    return (
        wait.join(F.broadcast(t.supplier.select("s_suppkey", "s_name")),
                  wait.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_flag").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "ivm_incremental_join",
    """
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    """,
    "ivm", "join", "retraction",
)
def ivm_incremental_join(spark, sf_dir):
    """Join maintained incrementally from both sides' update streams
    (differential join bilinearity: delta-A joins old-B, old-A joins
    delta-B, delta joins delta — src/compute/src/render/join/
    linear_join.rs). Lineitem and orders each arrive in two insert waves;
    a final wave retracts every 'F'-status order, which must retract all
    of that order's join outputs. The maintained result is then aggregated
    and must equal DuckDB's direct join over the net rows.
    """
    from materialize_spark.streaming.ivm_join import IncrementalJoinView

    t = T(spark, sf_dir)
    li = t.lineitem.select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice", "l_discount")
    od = t.orders.select(
        F.col("o_orderkey").alias("okey"), "o_orderstatus", "o_orderpriority")

    jv = IncrementalJoinView(on=["okey"])
    for wave in range(2):
        jv.on_batch(
            li.filter(F.col("okey") % 2 == wave).withColumn("diff", F.lit(1)),
            od.filter(F.col("okey") % 2 == wave).withColumn("diff", F.lit(1)),
        )
    jv.on_batch(right_delta=od.filter(F.col("o_orderstatus") == "F")
                .withColumn("diff", F.lit(-1)))

    return (
        jv.result_expanded()
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n"))
    )
