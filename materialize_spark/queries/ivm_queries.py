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
