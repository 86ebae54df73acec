"""Array / list / map / range / interval coverage.

Reference families: ArrayCreate/Index/Position/Fill/ToString, ListCreate/
Slice/Concat, MapBuild/MapGetValue/MapContainsKey
(src/expr/src/scalar/func/variadic.rs), Range* operators
(src/expr/src/scalar/func/binary.rs RangeContains*/Union/Intersection/
Overlaps), interval arithmetic (BinaryFunc Add/Sub Interval×Timestamp).

Ranges have no Spark type; per SURVEY.md §1.4 they are
struct{lower, upper, lower_inc, upper_inc} with operators as expressions —
demonstrated here over numeric ranges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.queries import register
from materialize_spark.queries.util import T


@register(
    "array_functions",
    """
    SELECT p_partkey,
           CAST(len(words) AS BIGINT)                      AS n_words,
           list_contains(words, 'red')                     AS has_red,
           CAST(coalesce(list_position(words, 'red'), 0) AS BIGINT) AS red_pos,
           array_to_string(list_sort(words), '-')          AS sorted_joined,
           array_to_string(list_sort(list_distinct(words)), '-') AS distinct_joined,
           array_to_string(words[1:2], '-')                AS first_two,
           array_to_string(list_concat(words, ['tail']), '-') AS with_tail,
           words[1]                                        AS first_word,
           words[len(words)]                               AS last_word,
           coalesce(array_to_string(list_filter(words, w -> len(w) > 3), '-'), '')
               AS long_words,
           array_to_string(list_transform(words, w -> upper(w)), '-') AS upper_words
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    """,
    "collections", "array",
)
def array_functions(spark, sf_dir):
    t = T(spark, sf_dir)
    df = t.part.select("p_partkey", F.split("p_name", " ").alias("words"))
    w = F.col("words")
    return df.select(
        "p_partkey",
        F.size(w).cast("long").alias("n_words"),
        F.array_contains(w, "red").alias("has_red"),
        F.coalesce(F.array_position(w, "red"), F.lit(0)).cast("long").alias("red_pos"),
        F.array_join(F.array_sort(w), "-").alias("sorted_joined"),
        F.array_join(F.array_sort(F.array_distinct(w)), "-").alias("distinct_joined"),
        F.array_join(F.slice(w, 1, 2), "-").alias("first_two"),
        F.array_join(F.concat(w, F.array(F.lit("tail"))), "-").alias("with_tail"),
        F.element_at(w, 1).alias("first_word"),
        F.element_at(w, F.size(w)).alias("last_word"),
        F.array_join(F.filter(w, lambda x: F.length(x) > 3), "-").alias("long_words"),
        F.array_join(F.transform(w, F.upper), "-").alias("upper_words"),
    )


@register(
    "map_functions",
    """
    SELECT n_nationkey,
           array_to_string(map_keys(m), ',')               AS keys_joined,
           array_to_string(map_values(m), ',')             AS vals_joined,
           m['name'][1]                                    AS name_val,
           CAST(cardinality(m) AS BIGINT)                  AS map_size,
           len(m['missing']) = 0                           AS missing_is_null
    FROM (SELECT n_nationkey,
                 map {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)} AS m
          FROM nation)
    """,
    "collections", "map",
)
def map_functions(spark, sf_dir):
    t = T(spark, sf_dir)
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"))
    df = t.nation.select("n_nationkey", m.alias("m"))
    return df.select(
        "n_nationkey",
        F.array_join(F.map_keys("m"), ",").alias("keys_joined"),
        F.array_join(F.map_values("m"), ",").alias("vals_joined"),
        F.col("m").getItem("name").alias("name_val"),
        F.size("m").cast("long").alias("map_size"),
        F.col("m").getItem("missing").isNull().alias("missing_is_null"),
    )


@register(
    "interval_arithmetic",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL '1 month', '%Y-%m-%d')  AS plus_month,
           strftime(o_orderdate - INTERVAL '90 days', '%Y-%m-%d')  AS minus_90d,
           strftime(o_orderdate + INTERVAL '1 year'
                    + INTERVAL '2 months' + INTERVAL '3 days', '%Y-%m-%d') AS compound,
           strftime(o_orderdate + INTERVAL '36 hours', '%Y-%m-%d %H:%M:%S') AS plus_36h,
           o_orderdate + INTERVAL '1 day' > o_orderdate             AS day_later_gt,
           CAST(date_diff('day', o_orderdate,
                          o_orderdate + INTERVAL '3 months') AS BIGINT) AS days_in_3mo
    FROM orders WHERE o_orderkey <= 500
    """,
    "collections", "interval",
)
def interval_arithmetic(spark, sf_dir):
    t = T(spark, sf_dir)
    d = F.col("o_orderdate")
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return t.orders.filter(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        fmt(d + F.expr("INTERVAL 1 MONTH")).alias("plus_month"),
        fmt(d - F.expr("INTERVAL 90 DAYS")).alias("minus_90d"),
        fmt(d + F.expr("INTERVAL 1 YEAR") + F.expr("INTERVAL 2 MONTHS")
            + F.expr("INTERVAL 3 DAYS")).alias("compound"),
        F.date_format(d + F.expr("INTERVAL 36 HOURS"), "yyyy-MM-dd HH:mm:ss")
        .alias("plus_36h"),
        ((d + F.expr("INTERVAL 1 DAY")) > d).alias("day_later_gt"),
        F.datediff(d + F.expr("INTERVAL 3 MONTHS"), d).cast("long")
        .alias("days_in_3mo"),
    )


@register(
    "range_operations",
    """
    -- ranges as struct{lower, upper} with half-open [lower, upper) semantics
    WITH r AS (
      SELECT c_custkey,
             floor(c_acctbal / 1000) * 1000       AS lo,
             floor(c_acctbal / 1000) * 1000 + 1000 AS hi,
             c_acctbal AS x
      FROM customer WHERE c_acctbal >= 0)
    SELECT CAST(lo AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_contained,
           bool_and(x >= lo AND x < hi)  AS all_contained,
           bool_or(lo < 2000 AND hi > 1000) AS overlaps_1k_2k,
           CAST(max(greatest(lo, 500)) AS BIGINT) AS isect_lo_max
    FROM r GROUP BY lo
    """,
    "collections", "range",
)
def range_operations(spark, sf_dir):
    t = T(spark, sf_dir)
    lo = F.floor(F.col("c_acctbal") / 1000) * 1000
    r = t.customer.filter(F.col("c_acctbal") >= 0).select(
        lo.alias("lo"), (lo + 1000).alias("hi"), F.col("c_acctbal").alias("x"))
    contains = (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    overlaps = (F.col("lo") < 2000) & (F.col("hi") > 1000)
    return r.groupBy("lo").agg(
        F.count(F.lit(1)).alias("n_contained"),
        F.bool_and(contains).alias("all_contained"),
        F.bool_or(overlaps).alias("overlaps_1k_2k"),
        F.max(F.greatest(F.col("lo"), F.lit(500))).cast("long").alias("isect_lo_max"),
    ).select(F.col("lo").cast("long").alias("bucket_lo"), "n_contained",
             "all_contained", "overlaps_1k_2k", "isect_lo_max")


@register(
    "agg_statistics",
    """
    SELECT l_linestatus,
           round(corr(l_quantity, l_extendedprice), 6)        AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6)       AS covar_qty_disc,
           round(covar_pop(l_quantity, l_discount), 6)        AS covar_pop_qty_disc,
           round(quantile_cont(l_quantity, 0.5), 4)           AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4)      AS p90_price
    FROM lineitem GROUP BY l_linestatus
    """,
    "aggregates", "statistics",
)
def agg_statistics(spark, sf_dir):
    t = T(spark, sf_dir)
    return t.lineitem.groupBy("l_linestatus").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covar_pop_qty_disc"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@register(
    "agg_jsonb_agg",
    """
    SELECT n_regionkey,
           '[' || string_agg('"' || n_name || '"', ',' ORDER BY n_name) || ']'
               AS nations_json
    FROM nation GROUP BY n_regionkey
    """,
    "aggregates", "jsonb_agg",
)
def agg_jsonb_agg(spark, sf_dir):
    from materialize_spark.functions.aggregates import jsonb_agg
    t = T(spark, sf_dir)
    return t.nation.groupBy("n_regionkey").agg(
        jsonb_agg("n_name", order_by="n_name").alias("nations_json"))


@register(
    "scalar_pg_compat2",
    """
    SELECT c_custkey,
           array_to_string(list_transform(range(1, 4), x -> c_nationkey), ',')
               AS filled,
           array_to_string(string_split(c_name, '#'), ',') AS name_parts,
           CASE WHEN regexp_matches(c_mktsegment, '^[a-z_][a-z0-9_]*$')
                THEN c_mktsegment
                ELSE '"' || replace(c_mktsegment, '"', '""') || '"'
           END AS quoted,
           CAST(len(string_split(c_name, '#')) AS BIGINT) AS ident_parts
    FROM customer WHERE c_custkey <= 50
    """,
    "scalar", "pg-compat",
)
def scalar_pg_compat2(spark, sf_dir):
    """array_fill / string_to_array / quote_ident / parse_ident
    (reference VariadicFunc::ArrayFill, pg_catalog string_to_array /
    quote_ident / parse_ident, src/sql/src/func.rs:1851)."""
    from materialize_spark.functions.strings import quote_ident

    t = T(spark, sf_dir)
    return t.customer.filter(F.col("c_custkey") <= 50).select(
        "c_custkey",
        F.array_join(F.array_repeat(F.col("c_nationkey"), 3), ",")
        .alias("filled"),
        F.array_join(F.split(F.col("c_name"), "#"), ",").alias("name_parts"),
        quote_ident("c_mktsegment").alias("quoted"),
        F.size(F.split(F.col("c_name"), "#")).cast("long")
        .alias("ident_parts"),
    )


@register(
    "scalar_ranges",
    """
    -- DuckDB has no PG range type; the oracle mirrors the canonical-[) int
    -- semantics (and the continuous numrange cases) with plain arithmetic.
    WITH base AS (
      SELECT o_orderkey AS k,
             CAST(o_orderkey % 97 AS INT)                       AS a_lo,
             CAST(o_orderkey % 97 + o_orderkey % 13 AS INT)     AS a_hi,
             CAST(o_orderkey % 89 AS INT)                       AS b_lo,
             CAST(o_orderkey % 89 + o_orderkey % 17 AS INT)     AS b_hi,
             CAST(o_orderkey % 50 AS INT)                       AS x,
             CAST(o_orderkey % 13 AS INT)                       AS d
      FROM orders WHERE o_orderkey <= 2000),
    r AS (
      SELECT *,
             a_lo >= a_hi AS e1,
             b_lo >= b_hi AS e2
      FROM base)
    SELECT k AS o_orderkey,
      CASE WHEN e1 THEN 'empty' ELSE '[' || a_lo || ',' || a_hi || ')' END
        AS r1_txt,
      CASE WHEN e2 THEN 'empty' ELSE '[' || b_lo || ',' || b_hi || ')' END
        AS r2_txt,
      CASE WHEN a_lo + 1 >= a_hi + 1 THEN 'empty'
           ELSE '[' || (a_lo + 1) || ',' || (a_hi + 1) || ')' END
        AS r3_txt,
      (NOT e1 AND x >= a_lo AND x < a_hi)                       AS contains_x,
      (e2 OR (NOT e1 AND a_lo <= b_lo AND a_hi >= b_hi))        AS contains_r2,
      (NOT e1 AND NOT e2 AND a_lo < b_hi AND b_lo < a_hi)       AS overlaps,
      (NOT e1 AND NOT e2 AND (a_hi = b_lo OR b_hi = a_lo))      AS adjacent,
      (NOT e1 AND NOT e2 AND a_hi <= b_lo)                      AS before,
      (x < 40)                                                  AS in_lt40,
      CASE
        WHEN e1 AND e2 THEN 'empty'
        WHEN e1 THEN '[' || b_lo || ',' || b_hi || ')'
        WHEN e2 THEN '[' || a_lo || ',' || a_hi || ')'
        WHEN (a_lo < b_hi AND b_lo < a_hi) OR a_hi = b_lo OR b_hi = a_lo
          THEN '[' || least(a_lo, b_lo) || ',' || greatest(a_hi, b_hi) || ')'
      END                                                       AS union_txt,
      CASE
        WHEN NOT (NOT e1 AND NOT e2 AND a_lo < b_hi AND b_lo < a_hi)
          THEN 'empty'
        WHEN greatest(a_lo, b_lo) >= least(a_hi, b_hi) THEN 'empty'
        ELSE '[' || greatest(a_lo, b_lo) || ',' || least(a_hi, b_hi) || ')'
      END                                                       AS isect_txt,
      CASE
        WHEN e1 THEN 'empty'
        WHEN e2 OR NOT (a_lo < b_hi AND b_lo < a_hi)
          THEN '[' || a_lo || ',' || a_hi || ')'
        WHEN b_lo <= a_lo AND b_hi >= a_hi THEN 'empty'
        WHEN b_lo <= a_lo THEN '[' || b_hi || ',' || a_hi || ')'
        WHEN b_hi >= a_hi THEN '[' || a_lo || ',' || b_lo || ')'
      END                                                       AS diff_txt,
      CASE WHEN d = 0 THEN 'empty'
           ELSE '(' || CAST(a_lo + 0.5 AS DOUBLE)
                || ',' || CAST(a_lo + 0.5 + d AS DOUBLE) || ')' END
        AS nr_txt
    FROM r
    """,
    "scalar", "range", "pg-compat",
)
def scalar_ranges(spark, sf_dir):
    """Range type + operators battery (reference: SqlScalarType::Range,
    src/repr/src/scalar.rs:1621-1760; RangeContains*/RangeOverlaps/
    RangeUnion/RangeIntersection/RangeDifference/RangeAdjacent binary
    funcs, src/expr/src/scalar/func/binary.rs). Exercises int4range
    canonicalization ('(]' -> '[)'), element/range containment, overlap,
    adjacency, strict ordering, union/intersection/difference, unbounded
    sides, and continuous numrange construction — all as pure Column
    expressions over the struct encoding in functions/ranges.py."""
    from materialize_spark.functions import ranges as R

    t = T(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        (F.col("o_orderkey") % 97).cast("int").alias("a_lo"),
        ((F.col("o_orderkey") % 97) + (F.col("o_orderkey") % 13))
        .cast("int").alias("a_hi"),
        (F.col("o_orderkey") % 89).cast("int").alias("b_lo"),
        ((F.col("o_orderkey") % 89) + (F.col("o_orderkey") % 17))
        .cast("int").alias("b_hi"),
        (F.col("o_orderkey") % 50).cast("int").alias("x"),
        (F.col("o_orderkey") % 13).cast("int").alias("d"),
    )
    # Stage each range STRUCT as a named column before the operator
    # battery: every range op reads its operand's fields several times,
    # so inlined struct expressions (with their canonicalization CASEs)
    # get duplicated per field access and the single wide select's
    # eager analysis walks the duplicated trees (guide §7.3 — measured
    # 5.9 s build + 2.5 s plan for this entry at sf0.01; staged: the
    # ops read attribute fields instead). Values identical — same
    # expressions, evaluated once under a name.
    c = F.col
    o = o.withColumns({
        "__r1": R.int4range(c("a_lo"), c("a_hi")),
        "__r2": R.int4range(c("b_lo"), c("b_hi")),
        "__r3": R.int4range(c("a_lo"), c("a_hi"), "(]"),
        "__nr": R.numrange(c("a_lo") + 0.5, c("a_lo") + 0.5 + c("d"),
                           "()"),
    })
    o = o.withColumns({
        "__ru": R.range_union(c("__r1"), c("__r2")),
        "__ri": R.range_intersection(c("__r1"), c("__r2")),
        "__rd": R.range_difference(c("__r1"), c("__r2")),
    })
    unb = R.int4range(None, 40)
    return o.select(
        "o_orderkey",
        R.range_text(c("__r1")).alias("r1_txt"),
        R.range_text(c("__r2")).alias("r2_txt"),
        R.range_text(c("__r3")).alias("r3_txt"),
        R.range_contains_elem(c("__r1"), c("x")).alias("contains_x"),
        R.range_contains_range(c("__r1"), c("__r2")).alias("contains_r2"),
        R.range_overlaps(c("__r1"), c("__r2")).alias("overlaps"),
        R.range_adjacent(c("__r1"), c("__r2")).alias("adjacent"),
        R.range_before(c("__r1"), c("__r2")).alias("before"),
        R.range_contains_elem(unb, c("x")).alias("in_lt40"),
        R.range_text(c("__ru")).alias("union_txt"),
        R.range_text(c("__ri")).alias("isect_txt"),
        R.range_text(c("__rd")).alias("diff_txt"),
        R.range_text(c("__nr")).alias("nr_txt"),
    )
