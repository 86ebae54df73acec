"""Temporal filters — `WHERE mz_now() BETWEEN valid_from AND valid_until`.

Reference: design doc doc/developer/design/20210426_temporal_filters.md;
MfpPlan lower_bounds/upper_bounds (src/expr/src/linear.rs:1724-1760). In the
reference, rows *appear and retract automatically* as the logical clock
passes their validity bounds.

Spark mapping:
- batch / serving path: re-evaluate the filter against a supplied logical
  ``now`` (defaults to current_timestamp() at query time) — same answers,
  pull- instead of push-based.
- streaming append path: the same predicate with a watermark supplies the
  retraction bound (rows age out of state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mz_now(now: Column | None = None) -> Column:
    """The logical clock. In batch it is the query-evaluation timestamp
    (reference Unmaterializable::MzNow,
    src/expr/src/scalar/func/unmaterializable.rs:44)."""
    return now if now is not None else F.current_timestamp()


def temporal_filter(
    df: DataFrame,
    *,
    valid_from: Column | None = None,
    valid_until: Column | None = None,
    now: Column | None = None,
) -> DataFrame:
    """Keep rows whose validity interval contains the logical now.

    ``valid_from <= mz_now() [ < valid_until ]`` — either bound optional,
    mirroring the reference's lower/upper bound lists.
    """
    clock = mz_now(now)
    cond = F.lit(True)
    if valid_from is not None:
        cond = cond & (valid_from <= clock)
    if valid_until is not None:
        cond = cond & (clock <= valid_until)
    return df.filter(cond)
