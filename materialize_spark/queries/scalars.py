"""Scalar function surface coverage.

Reference: ~780 scalar function variants across UnaryFunc/BinaryFunc/
VariadicFunc (src/expr/src/scalar/func/{unary,binary,variadic}.rs) exposed
as 351 SQL names (src/sql/src/func.rs:1851,4249). Each battery below
evaluates a function family row-wise over driver tables and is oracle-checked
against DuckDB — covering the math / string / datetime / conditional / hash
categories of SURVEY.md §2.6.

All expressions are pyspark.sql.functions (JVM codegen); nothing here calls
Python per row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.functions.strings import left_, right_, split_part
from materialize_spark.queries import register
from materialize_spark.queries.util import T


@register(
    "scalar_math",
    """
    SELECT p_partkey,
           CAST(abs(p_size - 25) AS BIGINT)          AS abs_v,
           round(sqrt(p_size), 8)                    AS sqrt_v,
           round(cbrt(p_size), 8)                    AS cbrt_v,
           round(exp(p_size / 25.0), 8)              AS exp_v,
           round(ln(p_size), 8)                      AS ln_v,
           round(log10(p_size), 8)                   AS log10_v,
           round(pow(p_size, 2), 2)                  AS pow_v,
           CAST(mod(p_size, 7) AS BIGINT)            AS mod_v,
           round(sin(p_size), 8)                     AS sin_v,
           round(cos(p_size), 8)                     AS cos_v,
           round(atan(p_size / 10.0), 8)             AS atan_v,
           round(degrees(p_size / 10.0), 8)          AS degrees_v,
           round(radians(p_size), 8)                 AS radians_v,
           CAST(sign(p_size - 25) AS BIGINT)         AS sign_v,
           CAST(ceil(p_size / 7.0) AS BIGINT)        AS ceil_v,
           CAST(floor(p_size / 7.0) AS BIGINT)       AS floor_v,
           round(p_retailprice, 1)                   AS round1_v,
           CAST(trunc(p_retailprice) AS BIGINT)      AS trunc_v
    FROM part
    """,
    "scalar", "math",
)
def scalar_math(spark, sf_dir):
    t = T(spark, sf_dir)
    s = F.col("p_size")
    return t.part.select(
        "p_partkey",
        F.abs(s - 25).cast("long").alias("abs_v"),
        F.round(F.sqrt(s), 8).alias("sqrt_v"),
        F.round(F.cbrt(s), 8).alias("cbrt_v"),
        F.round(F.exp(s / 25.0), 8).alias("exp_v"),
        F.round(F.log(s.cast("double")), 8).alias("ln_v"),
        F.round(F.log10(s), 8).alias("log10_v"),
        F.round(F.pow(s, 2), 2).alias("pow_v"),
        (s % 7).cast("long").alias("mod_v"),
        F.round(F.sin(s), 8).alias("sin_v"),
        F.round(F.cos(s), 8).alias("cos_v"),
        F.round(F.atan(s / 10.0), 8).alias("atan_v"),
        F.round(F.degrees(s / 10.0), 8).alias("degrees_v"),
        F.round(F.radians(s), 8).alias("radians_v"),
        F.signum((s - 25).cast("double")).cast("long").alias("sign_v"),
        F.ceil(s / 7.0).cast("long").alias("ceil_v"),
        F.floor(s / 7.0).cast("long").alias("floor_v"),
        F.round("p_retailprice", 1).alias("round1_v"),
        F.col("p_retailprice").cast("long").alias("trunc_v"),
    )


@register(
    "scalar_string",
    """
    SELECT c_custkey,
           upper(c_name)                          AS upper_v,
           lower(c_name)                          AS lower_v,
           CAST(length(c_name) AS BIGINT)         AS len_v,
           substr(c_name, 1, 8)                   AS substr_v,
           left(c_name, 4)                        AS left_v,
           right(c_name, 4)                       AS right_v,
           reverse(c_name)                        AS reverse_v,
           replace(c_name, '#', '-')              AS replace_v,
           concat(c_name, '|', c_mktsegment)      AS concat_v,
           concat_ws('-', c_mktsegment, c_name)   AS concat_ws_v,
           lpad(c_mktsegment, 12, '*')            AS lpad_v,
           rpad(c_mktsegment, 12, '*')            AS rpad_v,
           trim(concat(' ', c_name, ' '))         AS trim_v,
           ltrim(concat('xx', c_name), 'x')       AS ltrim_v,
           split_part(c_name, '#', 2)             AS split_part_v,
           CAST(strpos(c_name, '#') AS BIGINT)    AS strpos_v,
           starts_with(c_name, 'Customer')        AS starts_v,
           repeat(c_mktsegment, 2)                AS repeat_v,
           CAST(ascii(c_name) AS BIGINT)          AS ascii_v,
           chr(CAST(65 + (c_custkey % 26) AS INT)) AS chr_v,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS translate_v,
           md5(c_name)                            AS md5_v,
           sha256(c_name)                         AS sha256_v
    FROM customer
    """,
    "scalar", "string", "hash",
)
def scalar_string(spark, sf_dir):
    t = T(spark, sf_dir)
    n = F.col("c_name")
    return t.customer.select(
        "c_custkey",
        F.upper(n).alias("upper_v"),
        F.lower(n).alias("lower_v"),
        F.length(n).cast("long").alias("len_v"),
        F.substring(n, 1, 8).alias("substr_v"),
        left_(n, 4).alias("left_v"),
        right_(n, 4).alias("right_v"),
        F.reverse(n).alias("reverse_v"),
        F.replace(n, F.lit("#"), F.lit("-")).alias("replace_v"),
        F.concat(n, F.lit("|"), F.col("c_mktsegment")).alias("concat_v"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("concat_ws_v"),
        F.lpad("c_mktsegment", 12, "*").alias("lpad_v"),
        F.rpad("c_mktsegment", 12, "*").alias("rpad_v"),
        F.trim(F.concat(F.lit(" "), n, F.lit(" "))).alias("trim_v"),
        F.expr("ltrim('x', concat('xx', c_name))").alias("ltrim_v"),
        split_part(n, "#", 2).alias("split_part_v"),
        F.instr(n, "#").cast("long").alias("strpos_v"),
        F.startswith(n, F.lit("Customer")).alias("starts_v"),
        F.repeat("c_mktsegment", 2).alias("repeat_v"),
        F.ascii(n).cast("long").alias("ascii_v"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26)).alias("chr_v"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translate_v"),
        F.md5(n).alias("md5_v"),
        F.sha2(n, 256).alias("sha256_v"),
    )


@register(
    "scalar_regex",
    """
    SELECT p_partkey, p_name,
           regexp_matches(p_name, '^[a-z]+ [a-z]+$')            AS is_two_words,
           regexp_extract(p_name, '([a-z]+)$', 1)               AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')          AS devoweled,
           CAST(length(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS word_count
    FROM part
    """,
    "scalar", "regex",
)
def scalar_regex(spark, sf_dir):
    t = T(spark, sf_dir)
    n = F.col("p_name")
    return t.part.select(
        "p_partkey", "p_name",
        n.rlike("^[a-z]+ [a-z]+$").alias("is_two_words"),
        F.regexp_extract(n, "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace(n, "[aeiou]", "_").alias("devoweled"),
        F.size(F.regexp_extract_all(n, F.lit("[a-z]+"), 0)).cast("long").alias("word_count"),
    )


@register(
    "scalar_datetime",
    """
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS BIGINT)    AS year_v,
           CAST(extract(month FROM o_orderdate) AS BIGINT)   AS month_v,
           CAST(extract(day FROM o_orderdate) AS BIGINT)     AS day_v,
           CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS quarter_v,
           CAST(extract(dow FROM o_orderdate) AS BIGINT)     AS dow_v,
           CAST(extract(doy FROM o_orderdate) AS BIGINT)     AS doy_v,
           CAST(extract(epoch FROM o_orderdate) AS BIGINT)   AS epoch_v,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
           strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS plus45,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')        AS formatted,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since
    FROM orders WHERE o_orderkey <= 1000
    """,
    "scalar", "datetime",
)
def scalar_datetime(spark, sf_dir):
    t = T(spark, sf_dir)
    d = F.col("o_orderdate")
    return t.orders.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.year(d).cast("long").alias("year_v"),
        F.month(d).cast("long").alias("month_v"),
        F.dayofmonth(d).cast("long").alias("day_v"),
        F.quarter(d).cast("long").alias("quarter_v"),
        (F.dayofweek(d) - 1).cast("long").alias("dow_v"),  # PG dow: 0=Sunday
        F.dayofyear(d).cast("long").alias("doy_v"),
        F.unix_timestamp(d).cast("long").alias("epoch_v"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("quarter_start"),
        F.date_format(d + F.expr("INTERVAL 45 DAY"), "yyyy-MM-dd").alias("plus45"),
        F.date_format(d, "yyyy-MM-dd HH:mm:ss").alias("formatted"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("long").alias("days_since"),
    )


@register(
    "scalar_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END                                AS bucket,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           round(greatest(c_acctbal, 0.0), 2)                  AS floor0,
           round(least(c_acctbal, 1000.0), 2)                  AS cap1000,
           c_acctbal IS NULL                                   AS is_null_v,
           c_acctbal BETWEEN 0 AND 1000                        AS in_range,
           c_nationkey IN (1, 2, 3)                            AS in_list
    FROM customer
    """,
    "scalar", "conditional",
)
def scalar_conditional(spark, sf_dir):
    t = T(spark, sf_dir)
    b = F.col("c_acctbal")
    return t.customer.select(
        "c_custkey",
        F.when(b < 0, "debt").when(b < 5000, "mid").otherwise("rich").alias("bucket"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER"))
        .alias("seg_or_other"),
        F.round(F.greatest(b, F.lit(0.0)), 2).alias("floor0"),
        F.round(F.least(b, F.lit(1000.0)), 2).alias("cap1000"),
        b.isNull().alias("is_null_v"),
        b.between(0, 1000).alias("in_range"),
        F.col("c_nationkey").isin(1, 2, 3).alias("in_list"),
    )


@register(
    "scalar_casts",
    """
    SELECT s_suppkey,
           CAST(s_suppkey AS VARCHAR)                     AS int_to_str,
           CAST(CAST(s_suppkey AS VARCHAR) AS BIGINT)     AS str_to_int,
           CAST(floor(s_acctbal) AS BIGINT)               AS dbl_floor_int,
           round(CAST(s_suppkey AS DOUBLE) / 7, 8)        AS int_to_dbl,
           CAST(s_acctbal > 0 AS VARCHAR)                 AS bool_to_str,
           CAST('123' AS BIGINT) + s_suppkey              AS parsed_plus,
           round(CAST('3.5' AS DOUBLE) * s_suppkey, 2)    AS parsed_dbl
    FROM supplier
    """,
    "scalar", "casts",
)
def scalar_casts(spark, sf_dir):
    t = T(spark, sf_dir)
    k = F.col("s_suppkey")
    return t.supplier.select(
        "s_suppkey",
        k.cast("string").alias("int_to_str"),
        k.cast("string").cast("long").alias("str_to_int"),
        F.floor("s_acctbal").cast("long").alias("dbl_floor_int"),
        F.round(k.cast("double") / 7, 8).alias("int_to_dbl"),
        (F.col("s_acctbal") > 0).cast("string").alias("bool_to_str"),
        (F.lit("123").cast("long") + k).alias("parsed_plus"),
        F.round(F.lit("3.5").cast("double") * k, 2).alias("parsed_dbl"),
    )


@register(
    "scalar_casts2",
    """
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
           CAST(CAST(o_orderkey AS SMALLINT) AS BIGINT) AS key_small,
           CAST(CAST(o_orderkey % 2 AS BOOLEAN) AS VARCHAR) AS odd_bool,
           CAST(try_cast(o_orderpriority AS INTEGER) AS BIGINT) AS bad_int,
           strftime(CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                         AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_roundtrip
    FROM orders WHERE o_orderkey <= 500
    """,
    "scalar", "casts",
)
def scalar_casts2(spark, sf_dir):
    """Cast-matrix depth (reference UnaryFunc cast families,
    src/expr/src/scalar/func/unary.rs): timestamp->date->string,
    double->decimal->string, int narrowing round-trip, int->bool->string,
    failing string->int via try_cast (NULL, both engines), and a
    string<->timestamp round-trip."""
    t = T(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
        .alias("date_str"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string")
        .alias("price_dec"),
        F.col("o_orderkey").cast("smallint").cast("long").alias("key_small"),
        (F.col("o_orderkey") % 2).cast("boolean").cast("string")
        .alias("odd_bool"),
        F.try_to_number(F.col("o_orderpriority"), F.lit("999999"))
        .cast("long").alias("bad_int"),
        F.date_format(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
            .cast("timestamp"), "yyyy-MM-dd HH:mm:ss").alias("ts_roundtrip"),
    )
