"""As-of join and range (band) join — time-series joins Spark lacks as
built-ins, composed from relational operators so Catalyst still owns the
physical plan.

The reference reaches these shapes through temporal filters + DISTINCT ON
over its arrangements (doc/developer/design/20210426_temporal_filters.md);
time-series stores (kdb, QuestDB, DuckDB's ASOF JOIN) ship them natively.
Here:

- ``asof_join``: for each left row, the LATEST right row with the same key
  and right_ts <= left_ts. Implemented as the **union-merge** form: tag
  both sides, sort per key by time, carry the last non-null right payload
  forward with an ordered window. ONE shuffle on (key), NO inequality
  join, no per-key quadratic blowup — the form that survives 100 TB,
  unlike the naive theta-join + row_number (which Spark plans as a
  broadcast-nested-loop).
- ``range_join``: pairs within a time band |l.ts - r.ts| <= width.
  Implemented by bucketing both sides into band-width bins and joining on
  (key, bin) with the left side exploded to its 3 adjacent bins, then the
  exact band filter. Candidates are bounded by bucket population — an
  equi-join Catalyst shuffles on (key, bin) — instead of the
  key-only join whose per-key cross product explodes on hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join (right_ts <= left_ts, latest wins; ties at equal
    timestamps match). Right payload columns keep their names — they must
    not collide with left's. Rows with no prior right row keep NULLs."""
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts]
    lhs = left.select(
        *on, F.col(left_ts).alias("__t"), F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_cols],
    ).withColumn("__lts", F.col("__t"))
    rhs = right.select(
        *on, F.col(right_ts).alias("__t"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on and c != left_ts],
        *[F.col(c) for c in right_cols],
    ).withColumn("__lts", F.lit(None).cast(left.schema[left_ts].dataType))
    merged = lhs.unionByName(rhs)
    # right rows sort before left rows at equal time → equality matches
    w = (Window.partitionBy(*on).orderBy("__t", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = merged.select(
        *on, "__side", "__lts",
        *[c for c in left.columns if c not in on and c != left_ts],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return (carried.filter(F.col("__side") == 1)
            .drop("__side")
            .withColumnRenamed("__lts", left_ts))


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    width: int,
    how_filter: Column | None = None,
) -> DataFrame:
    """Band join: rows with equal keys and |left_ts - right_ts| <= width.

    ``left_ts``/``right_ts`` are NUMERIC (long) columns in the caller's
    time unit (pass ``F.unix_micros(ts)`` for timestamps — integer time
    avoids sub-second truncation disagreements across engines); ``width``
    is in the same unit. Both sides bucket into width-sized bins; the left
    side probes its own and both adjacent bins, so every in-band pair
    shares a (key, bin) — an equi-join Catalyst shuffles on (key, bin) —
    and the exact band predicate prunes the remainder. Each qualifying
    pair matches exactly once (at the right row's own bin).
    ``how_filter`` adds an extra pair predicate (e.g. id_a < id_b for
    unordered self-join pairs)."""
    lb = left.withColumn(
        "__bin", F.explode(F.array(
            *[F.floor(F.col(left_ts) / width).cast("long") + d
              for d in (-1, 0, 1)])))
    rb = right.withColumn(
        "__bin", F.floor(F.col(right_ts) / width).cast("long"))
    joined = lb.join(rb, on=on + ["__bin"])
    band = F.abs(lb[left_ts] - rb[right_ts]) <= width
    if how_filter is not None:
        band = band & how_filter
    return joined.filter(band).drop("__bin")
