"""Load generators — reference LOAD GENERATOR sources.

Reference: LoadGenerator {Counter, Clock, Auction, Datums, Marketing,
KeyValue, Tpch} (src/storage-types/src/sources/load_generator.rs:552; TPCH
row counts :157-167).

Spark mapping: the ``rate`` streaming source is the tick supplier
(value = monotone counter, timestamp = wall clock); generators are pure
column transforms over it, so they run at any throughput and parallelism
(``numPartitions`` option). The TPCH generator role is filled by the
driver's parquet testdata (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _rate(spark: SparkSession, rows_per_second: int, num_partitions: int) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )


def counter_source(spark: SparkSession, *, rows_per_second: int = 1000,
                   num_partitions: int = 1) -> DataFrame:
    """COUNTER: monotonically increasing i64 ticks."""
    return _rate(spark, rows_per_second, num_partitions) \
        .select(F.col("value").alias("counter"))


def clock_source(spark: SparkSession, *, rows_per_second: int = 1) -> DataFrame:
    """CLOCK: current timestamp per tick (upsert key = singleton)."""
    return _rate(spark, rows_per_second, 1) \
        .select(F.lit(1).alias("id"), F.col("timestamp").alias("time"))


def auction_source(spark: SparkSession, *, rows_per_second: int = 100,
                   num_partitions: int = 1) -> DataFrame:
    """AUCTION-style synthetic bids: deterministic columns derived from the
    tick counter (seller/auction/amount), mirroring the reference's demo
    generator shape."""
    t = _rate(spark, rows_per_second, num_partitions)
    v = F.col("value")
    return t.select(
        v.alias("bid_id"),
        (v % 100).alias("auction_id"),
        (v % 1000).alias("buyer_id"),
        ((v * 7919) % 10000 / 100.0).alias("amount"),
        F.col("timestamp").alias("bid_time"),
    )


def load_generator(spark: SparkSession, name: str, **kwargs) -> DataFrame:
    """Dispatch `CREATE SOURCE ... FROM LOAD GENERATOR <name>` (reference
    generator enum: src/storage-types/src/sources/load_generator.rs)."""
    gens = {
        "counter": counter_source,
        "clock": clock_source,
        "auction": auction_source,
    }
    try:
        return gens[name.lower()](spark, **kwargs)
    except KeyError:
        raise ValueError(
            f"unknown load generator {name!r}; have {sorted(gens)}") from None
