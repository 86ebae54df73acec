"""Fourth surface wave: window navigation functions and month-granularity
date arithmetic.

Reference parity targets:
- Window functions executed inside Reduce (src/expr/src/relation/func.rs:
  1960-1999 — RowNumber/Rank/DenseRank/LagLead/FirstValue/LastValue plus
  WindowAggregate). ntile / percent_rank / cume_dist / nth_value round out
  the standard navigation set; Spark executes all of them natively in a
  single window exchange (one shuffle on the partition key, sort within).
- Date/interval arithmetic (BinaryFunc Add/Sub over date-time combos,
  AgeTimestamp, VariadicFunc DateDiff* — src/expr/src/scalar/func/
  binary.rs, variadic.rs): month addition with end-of-month clamping,
  last_day, and an explicit month-delta formula that is integer-exact on
  both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from materialize_spark.queries import register
from materialize_spark.queries.util import T


@register(
    "window_navigation",
    """
    SELECT c_custkey,
           c_mktsegment,
           nth_value(c_name, 2) OVER (PARTITION BY c_mktsegment
               ORDER BY c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_name,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey)
                AS BIGINT) AS quartile,
           round(percent_rank() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_custkey), 6) AS pct_rank,
           round(cume_dist() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_custkey), 6) AS cume_d
    FROM customer
    WHERE c_custkey <= 2000
    """,
    "window", "navigation",
)
def window_navigation(spark, sf_dir):
    """nth_value / ntile / percent_rank / cume_dist in one window spec.

    All four share a single (partition, order) pair, so Catalyst plans ONE
    exchange + sort and evaluates every function in the same Window
    operator — the plan cost is one shuffle regardless of how many
    navigation columns ride on it. Ordering by the unique c_custkey makes
    every output deterministic (no peer-row ties for cume_dist).
    """
    t = T(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t.customer.filter(F.col("c_custkey") <= 2000)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.nth_value("c_name", 2).over(w_full).alias("second_name"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_d"),
        )
    )


@register(
    "scalar_month_arithmetic",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_1mo,
           strftime(o_orderdate + INTERVAL 13 MONTH, '%Y-%m-%d') AS plus_13mo,
           strftime(last_day(o_orderdate), '%Y-%m-%d')           AS month_end,
           CAST((extract(year FROM o_orderdate) - 1995) * 12
                + extract(month FROM o_orderdate) - 1 AS BIGINT) AS months_since,
           CAST(extract(isodow FROM o_orderdate) AS BIGINT)      AS isodow_v,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start
    FROM orders WHERE o_orderkey <= 1000
    """,
    "scalar", "datetime", "interval",
)
def scalar_month_arithmetic(spark, sf_dir):
    """Month-granularity arithmetic with end-of-month clamping.

    add_months clamps Jan 31 + 1 month to Feb 28/29 — the same semantics
    DuckDB and Postgres give `date + INTERVAL '1 month'`, so the battery
    proves the clamping rule, not just happy-path addition. months_since is
    an explicit integer formula (12*Δyear + Δmonth) rather than an engine
    month-diff builtin, because boundary-crossing vs whole-month counting
    differs between engines; the formula is exact on both. isodow (Monday=1)
    = Spark weekday()+1; week_start via ISO Monday truncation.
    """
    t = T(spark, sf_dir)
    d = F.col("o_orderdate")
    fmt = "yyyy-MM-dd"
    return (
        t.orders.filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.date_format(F.add_months(d, 1), fmt).alias("plus_1mo"),
            F.date_format(F.add_months(d, 13), fmt).alias("plus_13mo"),
            F.date_format(F.last_day(d), fmt).alias("month_end"),
            ((F.year(d) - F.lit(1995)) * 12 + F.month(d) - 1)
            .cast("bigint").alias("months_since"),
            (F.weekday(d) + 1).cast("bigint").alias("isodow_v"),
            F.date_format(F.date_trunc("week", d), fmt).alias("week_start"),
        )
    )
