"""Multiplicity (diff) algebra: Negate, Threshold, Union.

Reference: MIR Negate/Threshold/Union (src/expr/src/relation.rs:278-299;
threshold render src/compute/src/render/threshold.rs). In the reference every
collection is a multiset with signed multiplicities; set operations are
compiled to Union + Negate + Threshold.

In Spark there are two representations:

1. **Implicit** (batch): plain DataFrames are multisets with positive
   multiplicities; `exceptAll`/`intersectAll` realize
   Threshold(Union(a, Negate(b))) without materializing diffs.
2. **Explicit** (CDC frames): a DataFrame with a ``diff`` LongType column —
   the (data, diff) half of the reference's update triples; used by the
   streaming IVM layer. `negate`/`threshold`/`union_diffs` operate on these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIFF_COL = "diff"


def negate(df: DataFrame, diff_col: str = DIFF_COL) -> DataFrame:
    """MIR Negate: flip multiplicities of an explicit-diff frame."""
    return df.withColumn(diff_col, -F.col(diff_col))


def threshold(df: DataFrame, diff_col: str = DIFF_COL) -> DataFrame:
    """MIR Threshold: keep rows whose summed multiplicity is positive,
    consolidating duplicates. group-by-all-columns → sum(diff) > 0.

    Scale: one hash-shuffle on the full row (same cost shape as the
    reference's arrangement by row).
    """
    data_cols = [c for c in df.columns if c != diff_col]
    return (
        df.groupBy(*data_cols)
        .agg(F.sum(diff_col).alias(diff_col))
        .filter(F.col(diff_col) > 0)
    )


def union_diffs(*dfs: DataFrame) -> DataFrame:
    """MIR Union over explicit-diff frames: bag union, multiplicities add
    lazily (consolidate with ``threshold`` when a positive-only view is
    needed)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT ALL == Threshold(Union(a, Negate(b))) — Spark native."""
    return a.exceptAll(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """INTERSECT ALL — Spark native."""
    return a.intersectAll(b)
