"""Date/time functions: date_bin, date_bin_hopping, date_part, age.

Reference: BinaryFunc::DateBin (src/expr/src/scalar/func/binary.rs — timestamp
bucketing), date_bin_hopping (src/sql/src/func.rs mz_catalog), date_part /
extract, AgeTimestamp. These are the foundation of the reference's windowing
model — "windows are data, not operators" (SURVEY.md §2.8.3): tumbling =
date_bin + GROUP BY, hopping = date_bin_hopping (a table function emitting one
row per covering window).

All pure column expressions (codegen'd); hopping uses sequence+explode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _ts(c) -> Column:
    # unix_micros rejects TIMESTAMP_NTZ (Spark 4.1+ reads parquet NANOS as
    # NTZ); cast to session-TZ timestamp — a no-op for already-LTZ inputs.
    return _col(c).cast("timestamp")


def date_bin(stride: str, ts, origin: str = "1970-01-01 00:00:00") -> Column:
    """date_bin(stride, ts, origin): largest origin + k*stride <= ts.

    ``stride`` is an interval literal like ``'1 hour'`` / ``'15 minutes'``.
    Implemented with epoch arithmetic (exact for second-resolution strides,
    which is all the reference's TPCH/window tests use).
    """
    stride_us = F.unix_micros(F.lit(origin).cast("timestamp") + F.expr(f"INTERVAL {stride}")) \
        - F.unix_micros(F.lit(origin).cast("timestamp"))
    t, o = F.unix_micros(_ts(ts)), F.unix_micros(F.lit(origin).cast("timestamp"))
    # pure integer arithmetic: double division drifts a ULP near bin edges
    # at large epochs; pmod gives floored-division semantics, so
    # timestamps BEFORE the origin still bin downward (PG behavior).
    binned = t - F.pmod(t - o, stride_us)
    return F.timestamp_micros(binned.cast("long"))


def date_bin_hopping(hop: str, width: str, ts,
                     origin: str = "1970-01-01 00:00:00") -> Column:
    """One window-start per hopping window covering ts (an ARRAY — explode
    for the table-function form). Window w covers ts iff w <= ts < w+width
    with w ≡ origin (mod hop), i.e. w ∈ (ts-width, ts]:
    first = date_bin(ts - width) + hop, last = date_bin(ts)."""
    t = _col(ts)
    first = date_bin(hop, t - F.expr(f"INTERVAL {width}"), origin) + F.expr(f"INTERVAL {hop}")
    last = date_bin(hop, t, origin)
    return F.sequence(first, last, F.expr(f"INTERVAL {hop}"))


def date_part(field: str, ts) -> Column:
    """date_part/extract — PG returns double precision."""
    return F.date_part(F.lit(field), _col(ts)).cast("double")


def age(a, b) -> Column:
    """age(ts, ts): symbolic interval difference (PG semantics: years/months
    preserved). Spark has no interval subtraction yielding mixed interval;
    emit a (months, days, micros) struct like the reference's Interval
    (src/repr/src/scalar.rs Interval)."""
    a, b = _col(a), _col(b)
    months = (F.year(a) - F.year(b)) * 12 + (F.month(a) - F.month(b))
    return F.struct(
        months.cast("int").alias("months"),
        (F.dayofmonth(a) - F.dayofmonth(b)).cast("int").alias("days"),
        (F.unix_micros(a) % 86_400_000_000 - F.unix_micros(b) % 86_400_000_000)
        .cast("long").alias("micros"),
    )
