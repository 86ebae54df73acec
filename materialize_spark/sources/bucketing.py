"""Bucketed (co-located) table layout — the at-rest analog of indexes.

Reference: an index is an in-memory arrangement of a collection keyed by
expressions, built once and *shared* by every dataflow that joins or looks
up on that key (doc/developer/arrangements.md; ArrangeBy,
src/expr/src/relation.rs:303). The cost model it buys: joins on the
arrangement key need no repartitioning at query time.

Spark-at-rest translation: **bucketed tables**. Writing a table bucketed
(and sorted) by its join key hash-partitions the files once at write time;
every later sort-merge join between tables bucketed on the same key with
the same bucket count runs *shuffle-free* (zero Exchange operators), and
sorted buckets skip the sort too. At 100 TB this converts the dominant
per-query cost (re-shuffling the fact table for every join) into a one-time
write cost — exactly the trade the reference's indexes make.

Catalog.create_index (repartition + persist) is the in-memory flavor for a
live session; this module is the durable flavor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    path: str,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a parquet table bucketed by ``keys``.

    ``buckets`` sizing at scale: total_data / buckets should land near the
    executor task target (~128 MiB-1 GiB); both sides of a co-located join
    must use the same count.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.option("path", path).saveAsTable(table)
    return df.sparkSession.table(table)


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the optimized physical plan
    (broadcast exchanges excluded) — 0 for a fully co-located join."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange hashpartitioning" in line)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str,
    on: list[str], how: str = "inner",
) -> DataFrame:
    """Join two same-key same-bucket-count tables; with bucketing enabled
    Catalyst plans a shuffle-free (and for sorted buckets, sort-free)
    sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
