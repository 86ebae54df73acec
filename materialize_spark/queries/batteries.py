"""Combined certification batteries.

The driver's correctness gate evaluates the first ~50 registry entries, so
each slot is scarce. These two batteries union several operator families
into one query each — one slot certifies a whole SURVEY §2 sub-table —
while the granular single-family queries stay registered (#51+) for
debugging and local certification.

Both normalize every arm to a uniform (tag, k, v) string schema so the
driver's sorted value-hash is well-defined across arms.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.queries import register
from materialize_spark.queries.util import T


@register(
    "agg_rich",
    """
    -- string_agg(ordered) / jsonb_agg / jsonb_object_agg+map_agg /
    -- ROLLUP / GROUPING SETS, one arm each (SURVEY §2.3 remainder).
    WITH map_src AS (
      SELECT r_name, n_name, count(*) AS cnt
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name)
    SELECT 'string_agg' AS tag, CAST(n_regionkey AS VARCHAR) AS k,
           string_agg(n_name, ',' ORDER BY n_name) AS v
    FROM nation GROUP BY n_regionkey
    UNION ALL
    SELECT 'jsonb_agg', CAST(n_regionkey AS VARCHAR),
           '[' || string_agg('"' || n_name || '"', ',' ORDER BY n_name) || ']'
    FROM nation GROUP BY n_regionkey
    UNION ALL
    SELECT 'map_agg', r_name,
           CAST(to_json(map(list(n_name ORDER BY n_name),
                            list(cnt ORDER BY n_name))) AS VARCHAR)
    FROM map_src GROUP BY r_name
    UNION ALL
    SELECT 'rollup',
           coalesce(l_returnflag, 'ALL') || '|' || coalesce(l_linestatus, 'ALL'),
           CAST(count(*) AS VARCHAR)
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'grouping_sets',
           coalesce(c_mktsegment, '*') || '|' || coalesce(o_orderpriority, '*')
             || '|' || CAST(grouping(c_mktsegment) AS VARCHAR)
             || CAST(grouping(o_orderpriority) AS VARCHAR),
           CAST(count(*) AS VARCHAR)
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority),
                            (c_mktsegment, o_orderpriority), ())
    """,
    "aggregates", "battery",
)
def agg_rich(spark, sf_dir):
    """Ordered/structural aggregates battery (AggregateFunc::{StringAgg,
    JsonbAgg, JsonbObjectAgg, MapAgg}, src/expr/src/relation/func.rs:
    1875-1990; ROLLUP/GROUPING SETS are Spark-native surplus, SURVEY
    §2.3). Arms reuse the same helpers as the granular queries
    (agg_string_agg_ordered, agg_jsonb_agg, agg_map_agg, agg_rollup,
    agg_grouping_sets)."""
    from materialize_spark.functions.aggregates import jsonb_agg, string_agg

    t = T(spark, sf_dir)
    s = lambda c: c.cast("string")  # noqa: E731

    a_string = t.nation.groupBy("n_regionkey").agg(
        string_agg("n_name", ",", order_by="n_name").alias("v"),
    ).select(F.lit("string_agg").alias("tag"),
             s(F.col("n_regionkey")).alias("k"), "v")

    a_jsonb = t.nation.groupBy("n_regionkey").agg(
        jsonb_agg("n_name", order_by="n_name").alias("v"),
    ).select(F.lit("jsonb_agg").alias("tag"),
             s(F.col("n_regionkey")).alias("k"), "v")

    per_nation = (
        t.customer
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name").agg(F.count(F.lit(1)).alias("cnt")))
    a_map = per_nation.groupBy("r_name").agg(
        F.to_json(F.map_from_entries(F.transform(
            F.array_sort(F.collect_list(F.struct(
                F.col("n_name").alias("k"), F.col("cnt").alias("v")))),
            lambda e: e))).alias("v"),
    ).select(F.lit("map_agg").alias("tag"), F.col("r_name").alias("k"), "v")

    a_rollup = (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("rollup").alias("tag"),
                F.concat_ws("|",
                            F.coalesce("l_returnflag", F.lit("ALL")),
                            F.coalesce("l_linestatus", F.lit("ALL"))).alias("k"),
                s(F.col("n")).alias("v")))

    # Native groupingSets (no temp-view SQL: immune to view rebinding when
    # one session mixes scale factors).
    a_gsets = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupingSets([["c_mktsegment"], ["o_orderpriority"],
                       ["c_mktsegment", "o_orderpriority"], []],
                      "c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.grouping("c_mktsegment").alias("g_seg"),
             F.grouping("o_orderpriority").alias("g_pri"))
        .select(F.lit("grouping_sets").alias("tag"),
                F.concat_ws("|",
                            F.coalesce("c_mktsegment", F.lit("*")),
                            F.coalesce("o_orderpriority", F.lit("*")),
                            F.concat(s(F.col("g_seg")), s(F.col("g_pri"))))
                .alias("k"),
                s(F.col("n")).alias("v")))
    return a_string.unionAll(a_jsonb).unionAll(a_map) \
        .unionAll(a_rollup).unionAll(a_gsets)


@register(
    "tablefunc_battery",
    """
    -- JsonbArrayElements / CsvExtract / Unnest WITH ORDINALITY /
    -- GenerateSubscripts / Wrap2 / RepeatRow / GenerateSeries(int,ts),
    -- one arm each (SURVEY §2.4 remainder).
    SELECT 'jsonb_array_elements' AS tag, CAST(event_id AS VARCHAR) AS k,
           unnest(from_json(to_json([event_type, user_id::VARCHAR]),
                            '["VARCHAR"]')) AS v
    FROM events WHERE event_id <= 500
    UNION ALL
    SELECT 'csv_extract', CAST(c_custkey AS VARCHAR),
           split_part(line, ',', 1) || '|' || split_part(line, ',', 2)
             || '|' || split_part(line, ',', 3)
    FROM (SELECT c_custkey,
                 c_name || ',' || c_mktsegment || ',' || c_custkey::VARCHAR
                   AS line
          FROM customer)
    UNION ALL
    SELECT 'unnest_ordinality',
           CAST(p_partkey AS VARCHAR) || ':'
             || CAST(generate_subscripts(string_split(p_name, ' '), 1)
                     AS VARCHAR),
           unnest(string_split(p_name, ' '))
    FROM part
    UNION ALL
    SELECT 'generate_subscripts', CAST(vec_id AS VARCHAR), CAST(x AS VARCHAR)
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(x)
    WHERE vec_id <= 3
    UNION ALL
    SELECT 'wrap2', CAST(c_custkey AS VARCHAR),
           chunk[1] || '|' || chunk[2]
    FROM (SELECT c_custkey,
                 [c_name, c_mktsegment, c_custkey::VARCHAR,
                  c_nationkey::VARCHAR] AS arr
          FROM customer),
         unnest([list_slice(arr, 1, 2), list_slice(arr, 3, 4)]) AS t(chunk)
    UNION ALL
    SELECT 'repeat_row', CAST(p_partkey AS VARCHAR), CAST(u AS VARCHAR)
    FROM (SELECT p_partkey, p_size % 4 AS n FROM part),
         unnest(range(n)) AS t(u)
    UNION ALL
    SELECT 'series_int', 'i', CAST(u AS VARCHAR)
    FROM unnest(range(1, 101)) AS t(u)
    UNION ALL
    SELECT 'series_ts', 'ts',
           strftime(u, '%Y-%m-%d %H:%M:%S')
    FROM unnest(range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-10',
                      INTERVAL 1 DAY)) AS t(u)
    """,
    "tablefunc", "battery",
)
def tablefunc_battery(spark, sf_dir):
    """Table-function battery (reference TableFunc variants,
    src/expr/src/relation/func.rs:2600+: JsonbArrayElements, CsvExtract,
    UnnestArray + WITH ORDINALITY, GenerateSubscriptsArray, Wrap,
    RepeatRow, GenerateSeries int/timestamp). Arms reuse the granular
    queries' operators (operators/tablefuncs.py)."""
    from materialize_spark.operators.tablefuncs import with_ordinality

    t = T(spark, sf_dir)
    s = lambda c: c.cast("string")  # noqa: E731

    arr = F.to_json(F.array(F.col("event_type"),
                            F.col("user_id").cast("string")))
    a_json = t.events.filter(F.col("event_id") <= 500).select(
        F.lit("jsonb_array_elements").alias("tag"),
        s(F.col("event_id")).alias("k"),
        F.explode(F.from_json(arr, "array<string>")).alias("v"))

    line = F.concat_ws(",", "c_name", "c_mktsegment",
                       F.col("c_custkey").cast("string"))
    parts = F.split(line, ",")
    a_csv = t.customer.select(
        F.lit("csv_extract").alias("tag"), s(F.col("c_custkey")).alias("k"),
        F.concat_ws("|", parts.getItem(0), parts.getItem(1),
                    parts.getItem(2)).alias("v"))

    a_unnest = with_ordinality(
        t.part.select("p_partkey", F.split("p_name", " ").alias("words")),
        "words", alias="word",
    ).select(F.lit("unnest_ordinality").alias("tag"),
             F.concat_ws(":", s(F.col("p_partkey")),
                         s(F.col("ordinality"))).alias("k"),
             F.col("word").alias("v"))

    a_subs = (
        t.embeddings.filter(F.col("vec_id") <= 3)
        .select("vec_id",
                F.explode(F.sequence(
                    F.lit(1), F.size("embedding"))).alias("x"))
        .select(F.lit("generate_subscripts").alias("tag"),
                s(F.col("vec_id")).alias("k"), s(F.col("x")).alias("v")))

    warr = F.array(F.col("c_name"), F.col("c_mktsegment"),
                   F.col("c_custkey").cast("string"),
                   F.col("c_nationkey").cast("string"))
    chunks = F.transform(F.sequence(F.lit(0), F.lit(1)),
                         lambda i: F.slice(warr, i * 2 + 1, 2))
    a_wrap = (
        t.customer.select("c_custkey", F.explode(chunks).alias("chunk"))
        .select(F.lit("wrap2").alias("tag"), s(F.col("c_custkey")).alias("k"),
                F.concat_ws("|", F.col("chunk").getItem(0),
                            F.col("chunk").getItem(1)).alias("v")))

    n = F.col("p_size") % 4
    a_repeat = (
        t.part.select("p_partkey", n.alias("n"))
        .filter(F.col("n") > 0)
        .select("p_partkey",
                F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("u"))
        .select(F.lit("repeat_row").alias("tag"),
                s(F.col("p_partkey")).alias("k"), s(F.col("u")).alias("v")))

    a_ser_i = spark.range(1, 101).select(
        F.lit("series_int").alias("tag"), F.lit("i").alias("k"),
        s(F.col("id")).alias("v"))

    a_ser_ts = spark.range(1).select(F.explode(F.sequence(
        F.to_timestamp(F.lit("2024-01-01")),
        F.to_timestamp(F.lit("2024-01-09")),
        F.expr("INTERVAL 1 DAY"))).alias("ts")).select(
        F.lit("series_ts").alias("tag"), F.lit("ts").alias("k"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("v"))

    return (a_json.unionAll(a_csv).unionAll(a_unnest).unionAll(a_subs)
            .unionAll(a_wrap).unionAll(a_repeat).unionAll(a_ser_i)
            .unionAll(a_ser_ts))
