"""Shared helpers for registered queries."""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from materialize_spark.catalog import load_tables


def T(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """Load driver tables as attributes (also registers temp views)."""
    return SimpleNamespace(**load_tables(spark, sf_dir))


def revenue() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp")


def r2(c: Column) -> Column:
    """Round money-scale aggregates so FP summation order can't flip the
    driver's value hash (both sides round identically)."""
    return F.round(c, 2)


def fmt_date(c: str | Column) -> Column:
    """Temporal outputs as strings — avoids engine-specific date dtypes in
    the hash comparison."""
    col = c if isinstance(c, Column) else F.col(c)
    return F.date_format(col, "yyyy-MM-dd")
