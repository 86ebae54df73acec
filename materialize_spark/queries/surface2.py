"""Second surface-coverage wave: jsonb table functions, csv extraction,
bit/encode scalars, date_bin, lag/lead frames, subquery decorrelation,
grouping sets, and embedding-cosine near-dup.

Reference parity targets:
- jsonb_each / jsonb_array_elements table functions
  (src/expr/src/relation/func.rs:3556-3595).
- RegexpMatches / CsvExtract table functions (same enum).
- BinaryFunc bit ops BitAnd/Or/Xor/ShiftLeft/ShiftRight and
  encode/decode (src/expr/src/scalar/func/binary.rs).
- date_bin with stride + origin (BinaryFunc::DateBin;
  src/sql/src/func.rs catalog entry) — the tumbling-window primitive.
- lag/lead/first_value/last_value window functions incl. ignore-nulls
  (src/expr/src/relation/func.rs:1969-1973).
- Correlated-subquery decorrelation ("outer relation as key" method,
  src/sql/src/plan/lowering.rs:10-37) — expressed here as the explicit
  join+aggregate lowering so the Spark plan shows the decorrelated shape.
- GROUPING SETS is a capability *surplus* over the reference (no
  GroupingSets in its AST, SURVEY.md §2.3) — exposed because Spark has it
  natively.
- Embedding-cosine near-dup is the remaining dedup family from the
  training-data pipeline set (exact / minhash / simhash / ngram already
  covered in pipeline.py).

Scale notes are on each query: everything here is built-in-function only
(whole-stage codegen), no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.queries import register
from materialize_spark.queries.util import T


@register(
    "tablefunc_jsonb_each",
    """
    SELECT event_id, k AS key, json_extract_string(props, '$.' || k) AS val
    FROM events, unnest(json_keys(props)) AS t(k)
    """,
    "tablefunc", "jsonb",
)
def tablefunc_jsonb_each(spark, sf_dir):
    """jsonb_each: explode a JSON object into (key, value-text) rows.

    Spark-first: parse once to map<string,string>, then a generator
    (explode) — stays in codegen, no Python. At 100 TB the explode is
    narrow (no shuffle); output rows ∝ total key count.
    """
    t = T(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "val"),
    )


@register(
    "tablefunc_jsonb_array_elements",
    """
    SELECT event_id, unnest(from_json(to_json([event_type, user_id::VARCHAR]),
                                      '["VARCHAR"]')) AS elem
    FROM events
    """,
    "tablefunc", "jsonb",
)
def tablefunc_jsonb_array_elements(spark, sf_dir):
    """jsonb_build_array → jsonb_array_elements round-trip.

    Builds a JSON array from columns (to_json), re-parses it
    (from_json array<string>), explodes the elements. All narrow ops.
    """
    t = T(spark, sf_dir)
    arr = F.to_json(F.array(F.col("event_type"), F.col("user_id").cast("string")))
    return t.events.select(
        "event_id",
        F.explode(F.from_json(arr, "array<string>")).alias("elem"),
    )


@register(
    "tablefunc_regexp_matches",
    """
    SELECT p_partkey, t.word
    FROM part, unnest(regexp_extract_all(p_name, '[a-z]+')) AS t(word)
    """,
    "tablefunc", "regex",
)
def tablefunc_regexp_matches(spark, sf_dir):
    """Set-returning regexp_matches: one row per match."""
    t = T(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.explode(F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0)).alias("word"),
    )


@register(
    "tablefunc_csv_extract",
    """
    SELECT c_custkey,
           split_part(line, ',', 1) AS f1,
           split_part(line, ',', 2) AS f2,
           split_part(line, ',', 3) AS f3
    FROM (SELECT c_custkey,
                 c_name || ',' || c_mktsegment || ',' || c_custkey::VARCHAR AS line
          FROM customer)
    """,
    "tablefunc", "csv",
)
def tablefunc_csv_extract(spark, sf_dir):
    """CsvExtract(n): split a CSV-encoded text column into n fields.

    Spark-first: F.split + getItem (codegen); from_csv would also work but
    plain split matches the reference's non-quoted CsvExtract semantics.
    """
    t = T(spark, sf_dir)
    line = F.concat_ws(",", "c_name", "c_mktsegment", F.col("c_custkey").cast("string"))
    parts = F.split(line, ",")
    return t.customer.select(
        "c_custkey",
        parts.getItem(0).alias("f1"),
        parts.getItem(1).alias("f2"),
        parts.getItem(2).alias("f3"),
    )


@register(
    "scalar_bits_encode",
    """
    SELECT c_custkey,
           CAST(c_custkey & 255 AS BIGINT)        AS and_v,
           CAST(c_custkey | 16 AS BIGINT)         AS or_v,
           CAST(xor(c_custkey, 85) AS BIGINT)     AS xor_v,
           CAST(c_custkey << 3 AS BIGINT)         AS shl_v,
           CAST(c_custkey >> 2 AS BIGINT)         AS shr_v,
           CAST(bit_count(c_custkey) AS BIGINT)   AS bitcount_v,
           to_hex(c_custkey)                      AS hex_v,
           to_base64(c_name::BLOB)                AS b64_v,
           decode(from_base64(to_base64(c_name::BLOB))) AS b64_rt,
           CAST(octet_length(c_name::BLOB) AS BIGINT) AS octets_v
    FROM customer
    """,
    "scalar", "bits", "encode",
)
def scalar_bits_encode(spark, sf_dir):
    """Bit ops + encode/decode (BinaryFunc::{BitAnd,BitOr,BitXor,
    BitShiftLeft,BitShiftRight}, encode/decode base64/hex)."""
    t = T(spark, sf_dir)
    k = F.col("c_custkey")
    return t.customer.select(
        "c_custkey",
        k.bitwiseAND(255).cast("long").alias("and_v"),
        k.bitwiseOR(16).cast("long").alias("or_v"),
        k.bitwiseXOR(85).cast("long").alias("xor_v"),
        F.shiftleft(k, 3).cast("long").alias("shl_v"),
        F.shiftright(k, 2).cast("long").alias("shr_v"),
        F.bit_count(k).cast("long").alias("bitcount_v"),
        F.hex(k).alias("hex_v"),
        F.base64(F.col("c_name").cast("binary")).alias("b64_v"),
        F.unbase64(F.base64(F.col("c_name").cast("binary"))).cast("string")
        .alias("b64_rt"),
        F.octet_length("c_name").cast("long").alias("octets_v"),
    )


@register(
    "scalar_date_bin",
    """
    SELECT event_id,
           strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S')
               AS bin15,
           strftime(time_bucket(INTERVAL '1 hour', ts,
                                TIMESTAMP '2024-01-01 00:30:00'),
                    '%Y-%m-%d %H:%M:%S') AS bin1h_off,
           strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S')
               AS bin1d
    FROM events
    """,
    "scalar", "datetime", "date_bin",
)
def scalar_date_bin(spark, sf_dir):
    """date_bin(stride, source[, origin]) — the reference's tumbling-window
    primitive (BinaryFunc::DateBin; design: windows are data, not operators,
    SURVEY.md §2.8.3).

    Spark-first: pure integer arithmetic on epoch micros — floor((t - origin)
    / stride) * stride + origin — which stays in codegen and vectorizes;
    equivalent to F.window(ts, ...) but usable as a scalar (groupable,
    joinable) exactly like the reference's date_bin.
    """
    t = T(spark, sf_dir)

    def date_bin(col, stride_us: int, origin_us: int = 0):
        # Floor-mod (pmod), not truncating %, so timestamps *before* the
        # origin still bin downward — PG/reference date_bin semantics.
        us = F.unix_micros(col)
        return F.timestamp_micros(us - F.pmod(us - origin_us, F.lit(stride_us)))

    ts = F.col("ts")
    m15 = 15 * 60 * 1_000_000
    h1 = 60 * 60 * 1_000_000
    d1 = 24 * h1
    origin = 1_704_069_000_000_000  # 2024-01-01T00:30:00Z in epoch micros
    fmt = "yyyy-MM-dd HH:mm:ss"
    return t.events.select(
        "event_id",
        F.date_format(date_bin(ts, m15), fmt).alias("bin15"),
        F.date_format(date_bin(ts, h1, origin), fmt).alias("bin1h_off"),
        F.date_format(date_bin(ts, d1), fmt).alias("bin1d"),
    )


@register(
    "window_lag_lead",
    """
    SELECT event_id, user_id,
           round(lag(value) OVER w, 2)             AS prev_v,
           round(lead(value, 2, -1.0) OVER w, 2)   AS next2_v,
           round(first_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW), 2) AS first_v,
           round(last_value(CASE WHEN event_type <> 'click' THEN value END
                            IGNORE NULLS)
                 OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS last_nonclick_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "window", "lag_lead",
)
def window_lag_lead(spark, sf_dir):
    """lag/lead (with offset + default) and first/last_value incl.
    IGNORE NULLS (AggregateFunc::{LagLead,FirstValue,LastValue},
    src/expr/src/relation/func.rs:1960-1999).

    The reference executes these inside Reduce over whole groups; Spark's
    Window exec is the idiomatic physical strategy — one shuffle on
    user_id, then a sorted in-partition pass. Order is made total with the
    (ts, event_id) tiebreak so results are deterministic.
    """
    from pyspark.sql import Window

    t = T(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nonclick = F.when(F.col("event_type") != "click", F.col("value"))
    return t.events.select(
        "event_id", "user_id",
        F.round(F.lag("value").over(w), 2).alias("prev_v"),
        F.round(F.lead("value", 2, -1.0).over(w), 2).alias("next2_v"),
        F.round(F.first("value").over(wf), 2).alias("first_v"),
        F.round(F.last(nonclick, ignorenulls=True).over(wf), 2)
        .alias("last_nonclick_v"),
    )


@register(
    "subquery_decorrelated",
    """
    SELECT c.c_custkey,
           round(c.c_acctbal - (SELECT avg(c2.c_acctbal) FROM customer c2
                                WHERE c2.c_nationkey = c.c_nationkey), 2)
               AS diff_nation_avg,
           EXISTS(SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 100000) AS has_big_order,
           c.c_custkey IN (SELECT o_custkey FROM orders
                           WHERE o_orderpriority = '1-URGENT') AS has_urgent
    FROM customer c
    """,
    "subquery", "decorrelation",
)
def subquery_decorrelated(spark, sf_dir):
    """Correlated scalar subquery + EXISTS + IN, written as their explicit
    decorrelated lowering — the "outer relation as key" method the reference
    uses (src/sql/src/plan/lowering.rs:10-37): correlated scalar agg →
    groupBy(correlation key) + equi-join; EXISTS/IN → distinct-key left
    join with null test.

    Scale: nation-avg side is tiny (broadcast); the orders-derived key sets
    shuffle once on custkey each — same keying, so AQE can reuse the
    exchange. No per-row subquery execution anywhere.
    """
    t = T(spark, sf_dir)
    # avg over the RAW file-order scan, not the keyed arrangement: the
    # shards change the double-sum accumulation order, which flips
    # round(x, 2) at .xx5 knife-edges against the oracle's sequential
    # sum (caught at sf0.001: custkeys 40/85 came out one cent off).
    # The raw single split reproduces the oracle's order bit-for-bit.
    nation_avg = t._tables.raw("customer").groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("nation_avg"))
    big = (t.orders.filter(F.col("o_totalprice") > 100000)
           .select(F.col("o_custkey").alias("big_key")).distinct())
    urgent = (t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("urg_key")).distinct())
    return (
        t.customer
        .join(F.broadcast(nation_avg), "c_nationkey")
        .join(big, F.col("c_custkey") == F.col("big_key"), "left")
        .join(urgent, F.col("c_custkey") == F.col("urg_key"), "left")
        .select(
            "c_custkey",
            # round(x*100)/100, not round(x, 2): Spark's round(double, n)
            # rounds the SHORTEST DECIMAL REPR (BigDecimal.valueOf) while
            # the oracle rounds the scaled binary value (round(x*100)/100
            # in doubles) — they disagree exactly at .xx5 knife-edges
            # (sf0.001 custkeys 40/85: 4472.355 → .36 vs .35). The scaled
            # form reproduces the oracle's semantics bit-for-bit at every
            # SF (verified 0 mismatches at sf0.001/0.01/0.1; the plain
            # form already agreed everywhere but the knife-edges, so
            # sf0.01/0.1 results are unchanged).
            (F.round((F.col("c_acctbal") - F.col("nation_avg")) * 100, 0)
             / 100).alias("diff_nation_avg"),
            F.col("big_key").isNotNull().alias("has_big_order"),
            F.col("urg_key").isNotNull().alias("has_urgent"),
        )
    )


@register(
    "agg_grouping_sets",
    """
    SELECT c_mktsegment, o_orderpriority,
           CAST(grouping(c_mktsegment) AS BIGINT)   AS g_seg,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
           CAST(count(*) AS BIGINT)                 AS n,
           round(sum(o_totalprice), 2)              AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority),
                            (c_mktsegment, o_orderpriority), ())
    """,
    "aggregate", "grouping_sets",
)
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS + grouping() markers — capability surplus over the
    reference (its AST has no GroupingSets/Cube/Rollup, SURVEY.md §2.3);
    Spark expands them into a single Expand + one aggregate, i.e. one
    shuffle for all four groupings."""
    t = T(spark, sf_dir)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupingSets([["c_mktsegment"], ["o_orderpriority"],
                       ["c_mktsegment", "o_orderpriority"], []],
                      "c_mktsegment", "o_orderpriority")
        .agg(F.grouping("c_mktsegment").cast("long").alias("g_seg"),
             F.grouping("o_orderpriority").cast("long").alias("g_pri"),
             F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select("c_mktsegment", "o_orderpriority",
                "g_seg", "g_pri", "n", "total"))


@register(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
    """,
    "pipeline", "dedup", "embedding",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (the 5th dedup family).

    Brute-force all-pairs baseline computed as blocked matrix
    multiplication (pipeline.simsearch.cosine_pairs_blocked): the
    broadcast-one-side + per-partition GEMM layout of sharded brute-force
    ANN. Quadratic by design — the unbounded-scale path is the LSH variant
    (simsearch_lsh_buckets): sign-random-projection buckets first, exact
    cosine only within buckets, O(n * bucket_size). Threshold 0.4 chosen
    for the driver's random embeddings (true near-dup corpora use ~0.95).
    """
    from materialize_spark.pipeline.simsearch import cosine_pairs_blocked

    t = T(spark, sf_dir)
    return cosine_pairs_blocked(t.embeddings, threshold=0.4)
