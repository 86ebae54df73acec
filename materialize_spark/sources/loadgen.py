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


def datums_source(spark: SparkSession) -> DataFrame:
    """DATUMS: one row per supported type with a representative value
    (reference uses it to exercise the type surface end-to-end). Static
    collection → plain batch DataFrame."""
    return spark.sql("""
        SELECT CAST(TRUE AS BOOLEAN)                    AS bool_v,
               CAST(32767 AS SMALLINT)                  AS int2_v,
               CAST(2147483647 AS INT)                  AS int4_v,
               CAST(9223372036854775807 AS BIGINT)      AS int8_v,
               CAST(1.5 AS FLOAT)                       AS float4_v,
               CAST(2.25 AS DOUBLE)                     AS float8_v,
               CAST(12345.6789 AS DECIMAL(18,4))        AS numeric_v,
               'text'                                   AS text_v,
               CAST('2020-01-01' AS DATE)               AS date_v,
               CAST('2020-01-01 12:34:56' AS TIMESTAMP) AS ts_v,
               CAST(X'DEADBEEF' AS BINARY)              AS bytes_v,
               ARRAY(1, 2, 3)                           AS array_v,
               MAP('k', 'v')                            AS map_v,
               NAMED_STRUCT('a', 1, 'b', 'x')           AS record_v,
               TO_JSON(NAMED_STRUCT('j', 1))            AS jsonb_v
    """)


def marketing_source(spark: SparkSession, *, rows_per_second: int = 100,
                     num_partitions: int = 1) -> DataFrame:
    """MARKETING: impression/click funnel events derived deterministically
    from the tick counter (reference's demo generator emits leads /
    impressions / clicks; the click flag here is a deterministic
    pseudo-random derived column so downstream CTR aggregates are stable)."""
    t = _rate(spark, rows_per_second, num_partitions)
    v = F.col("value")
    return t.select(
        v.alias("impression_id"),
        (v % 500).alias("campaign_id"),
        (v % 10000).alias("customer_id"),
        ((v * 2654435761) % 100 < 3).alias("clicked"),
        F.col("timestamp").alias("impression_time"),
    )


def keyvalue_source(spark: SparkSession, *, rows_per_second: int = 1000,
                    num_partitions: int = 1, keys: int = 1000) -> DataFrame:
    """KEY VALUE: keyed payloads where keys cycle, so the stream is a
    natural ENVELOPE UPSERT input (later ticks overwrite earlier values for
    the same key) — the reference generator's role in upsert benchmarks.
    Partition column = key % num_partitions, mirroring its partitioned
    output."""
    t = _rate(spark, rows_per_second, num_partitions)
    v = F.col("value")
    key = (v % keys)
    return t.select(
        (key % num_partitions).alias("partition"),
        key.alias("key"),
        F.md5(v.cast("string")).alias("value"),
        F.col("timestamp").alias("ts"),
    )


def _hash01(col) -> F.Column:
    """Deterministic uniform(0,1) from any column: md5 prefix / 16^8 —
    portable, repeatable, and computed scan-side (no shuffle)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("double") / float(16 ** 8)
    )


def tpch_source(spark: SparkSession, *, scale_factor: float = 0.001,
                num_partitions: int | None = None) -> dict[str, DataFrame]:
    """TPCH load generator (reference LoadGenerator::Tpch with SCALE
    FACTOR, src/storage-types/src/sources/load_generator.rs:157-167):
    deterministic synthetic tables at the reference's row counts
    (lineitem ≈ 6M·sf is emitted via its orders, orders 1.5M·sf,
    customer 150k·sf, part 200k·sf, supplier 10k·sf, nation 25, region 5).

    Built on ``spark.range`` — generation is partition-parallel and
    column-deterministic (md5-derived), so the same SF yields identical
    data on any cluster size; at large SF this generates 100 TB without
    any driver involvement.
    """
    def rng(n: int) -> DataFrame:
        df = spark.range(n)
        return df.repartition(num_partitions) if num_partitions else df

    i = F.col("id")
    region = rng(5).select(
        i.alias("r_regionkey"),
        F.concat(F.lit("REGION#"), i.cast("string")).alias("r_name"))
    nation = rng(25).select(
        i.alias("n_nationkey"),
        F.concat(F.lit("NATION#"), i.cast("string")).alias("n_name"),
        (i % 5).alias("n_regionkey"))
    n_cust = max(1, int(150_000 * scale_factor))
    customer = rng(n_cust).select(
        i.alias("c_custkey"),
        F.concat(F.lit("Customer#"), i.cast("string")).alias("c_name"),
        (i % 25).alias("c_nationkey"),
        F.round(_hash01(i) * 10_000 - 1_000, 2).alias("c_acctbal"))
    n_supp = max(1, int(10_000 * scale_factor))
    supplier = rng(n_supp).select(
        i.alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), i.cast("string")).alias("s_name"),
        (i % 25).alias("s_nationkey"))
    n_part = max(1, int(200_000 * scale_factor))
    part = rng(n_part).select(
        i.alias("p_partkey"),
        F.concat(F.lit("Part#"), i.cast("string")).alias("p_name"),
        F.round(_hash01(i + 7) * 2_000, 2).alias("p_retailprice"))
    n_ord = max(1, int(1_500_000 * scale_factor))
    orders = rng(n_ord).select(
        i.alias("o_orderkey"),
        (F.floor(_hash01(i + 13) * n_cust)).alias("o_custkey"),
        F.round(_hash01(i + 17) * 400_000, 2).alias("o_totalprice"),
        F.date_add(F.lit("1992-01-01").cast("date"),
                   (F.floor(_hash01(i + 19) * 2400)).cast("int"))
        .alias("o_orderdate"))
    lineitem = (
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.explode(F.sequence(
                F.lit(1),
                (F.floor(_hash01(F.col("o_orderkey") + 23) * 7) + 1)
                .cast("int"))).alias("l_linenumber"))
        .select(
            "l_orderkey", "l_linenumber",
            (F.floor(_hash01(F.col("l_orderkey") * 8 +
                             F.col("l_linenumber")) * n_part))
            .alias("l_partkey"),
            F.round(_hash01(F.col("l_orderkey") * 16 +
                            F.col("l_linenumber")) * 50 + 1, 0)
            .alias("l_quantity"),
            F.round(_hash01(F.col("l_orderkey") * 32 +
                            F.col("l_linenumber")) * 100_000, 2)
            .alias("l_extendedprice"))
    )
    return {"region": region, "nation": nation, "customer": customer,
            "supplier": supplier, "part": part, "orders": orders,
            "lineitem": lineitem}


def load_generator(spark: SparkSession, name: str, **kwargs) -> DataFrame:
    """Dispatch `CREATE SOURCE ... FROM LOAD GENERATOR <name>` (reference
    generator enum: src/storage-types/src/sources/load_generator.rs)."""
    gens = {
        "counter": counter_source,
        "clock": clock_source,
        "auction": auction_source,
        "datums": datums_source,
        "marketing": marketing_source,
        "key_value": keyvalue_source,
        "keyvalue": keyvalue_source,
        "tpch": tpch_source,
    }
    try:
        return gens[name.lower()](spark, **kwargs)
    except KeyError:
        raise ValueError(
            f"unknown load generator {name!r}; have {sorted(gens)}") from None
