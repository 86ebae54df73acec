"""Shared helpers for registered queries."""

from __future__ import annotations

import weakref

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from materialize_spark.catalog import load_tables, view_owner


class _TableNS:
    """Attribute view over LazyTables: ``t.lineitem`` reads (and registers a
    temp view for) lineitem on first touch — a query never pays for, nor can
    it be broken by, tables it doesn't reference."""

    __slots__ = ("_tables",)

    def __init__(self, tables):
        self._tables = tables

    def __getattr__(self, name):
        try:
            return self._tables[name]
        except KeyError:
            raise AttributeError(name) from None


def T(spark: SparkSession, sf_dir: str) -> _TableNS:
    """Driver tables as lazy attributes (registers temp views on access)."""
    return _TableNS(load_tables(spark, sf_dir))


def sql_over(spark: SparkSession, sf_dir: str, tables: tuple[str, ...],
             sql: str) -> DataFrame:
    """Build a query as ONE ``spark.sql`` call over registered temp views.

    Rationale (PERF.md): a deep DataFrame chain costs one py4j roundtrip per
    Column/DataFrame call — ~65 ms of driver→JVM chatter for a TPC-H-sized
    plan — while a SQL string is a single roundtrip and parsing happens
    JVM-side. Same logical plan either way; Catalyst sees no difference.
    ``tables`` lists the views the statement references so only those are
    loaded (lazy-table contract preserved). Temp views are one namespace per
    session shared across scale factors, so names registered last by a
    DIFFERENT sf_dir are re-bound first (catalog tracks per-view ownership).
    """
    tabs = load_tables(spark, sf_dir)
    owner = view_owner(spark)
    for n in tables:
        if n.endswith(":compact"):  # broadcast-side compact arrangement
            base = n.split(":", 1)[0]
            n = f"{base}_compact"
            df = tabs.compact(base)
        elif n.endswith(":scan"):  # scan-optimal path (no-join aggs)
            base = n.split(":", 1)[0]
            n = f"{base}_scan"
            df = tabs.scan(base)
        elif ":" in n:  # "orders:o_custkey" → secondary arrangement view
            base, key = n.split(":", 1)
            n = f"{base}_by_{key}"
            df = tabs.index(base, key)
        elif n.endswith("_denorm"):  # shared denormalized arrangement
            df = tabs.denorm(n)
        else:
            df = tabs[n]  # load (registers + ownership on first touch)
        if owner.get(n) != sf_dir:
            df.createOrReplaceTempView(n)
            owner[n] = sf_dir
    return spark.sql(sql)


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
