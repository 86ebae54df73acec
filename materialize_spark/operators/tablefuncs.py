"""Table functions — MIR FlatMap (src/expr/src/relation.rs:190; TableFunc
enum src/expr/src/relation/func.rs:3556-3595).

Every reference TableFunc maps to a Spark generator expression (explode /
posexplode / sequence / from_json), which Catalyst executes inside
whole-stage codegen — no Python in the loop.

| reference TableFunc              | here                                  |
|----------------------------------|---------------------------------------|
| GenerateSeriesInt32/64/Timestamp | ``generate_series``                   |
| UnnestArray/List/Map             | ``unnest``                            |
| WithOrdinality wrapper (:3695)   | ``with_ordinality`` (posexplode)      |
| RegexpExtract/RegexpMatches      | ``regexp_extract_rows``               |
| JsonbArrayElements / JsonbEach   | functions/jsonb.py                    |
| CsvExtract(n)                    | ``from_csv`` (functions/strings)      |
| RepeatRow                        | ``explode(array_repeat(...))``        |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_series(
    spark: SparkSession, start, stop, step=1, *, col_name: str = "generate_series"
) -> DataFrame:
    """generate_series(start, stop, step) — inclusive bounds, PG semantics.

    Integer series use ``spark.range`` (parallelized, no data movement);
    timestamp series use ``sequence()`` + explode.
    """
    if isinstance(start, int) and isinstance(stop, int):
        return spark.range(start, stop + (1 if step > 0 else -1), step) \
            .withColumnRenamed("id", col_name)
    # timestamp/date series
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(F.lit(start).cast("timestamp"),
                           F.lit(stop).cast("timestamp"),
                           F.expr(step) if isinstance(step, str) else step)
            ).alias(col_name)
        )
    )


def unnest(df: DataFrame, col: str | Column, *, outer: bool = False,
           alias: str = "unnest") -> DataFrame:
    """UnnestArray/UnnestList: one output row per element; ``outer`` keeps
    rows with empty/null arrays (PG's LEFT JOIN LATERAL unnest)."""
    fn = F.explode_outer if outer else F.explode
    return df.withColumn(alias, fn(col if isinstance(col, Column) else F.col(col)))


def with_ordinality(df: DataFrame, col: str | Column, *, alias: str = "unnest",
                    ordinal: str = "ordinality") -> DataFrame:
    """WITH ORDINALITY: 1-based element index alongside each element."""
    c = col if isinstance(col, Column) else F.col(col)
    return (
        df.select("*", F.posexplode(c).alias("__pos", alias))
        .withColumn(ordinal, F.col("__pos") + 1)
        .drop("__pos")
    )


def regexp_extract_rows(df: DataFrame, col: str | Column, pattern: str,
                        *, alias: str = "match") -> DataFrame:
    """regexp_matches as a table function: one row per match of ``pattern``."""
    c = col if isinstance(col, Column) else F.col(col)
    return df.withColumn(alias, F.explode(F.regexp_extract_all(c, F.lit(pattern), 0)))


def generate_subscripts(df: DataFrame, col: str | Column, *,
                        alias: str = "subscript") -> DataFrame:
    """generate_subscripts(array, 1): one row per valid 1-based index of
    the array (reference TableFunc::GenerateSubscriptsArray,
    src/expr/src/relation/func.rs). Spark analog: explode a 1..size
    sequence — stays in codegen, no element data is moved, only indices."""
    c = col if isinstance(col, Column) else F.col(col)
    return df.withColumn(
        alias,
        F.explode(F.when(F.size(c) > 0, F.sequence(F.lit(1), F.size(c)))))
