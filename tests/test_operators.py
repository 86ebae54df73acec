"""Unit tests for the MIR-operator combinators (SURVEY.md §2.1)."""

from pyspark.sql import functions as F

from materialize_spark.operators import (
    distinct_on, generate_series, let_rec, negate, threshold, topk,
    union_diffs, with_ordinality,
)
from materialize_spark.functions.datetime import date_bin, date_bin_hopping
from materialize_spark.functions.aggregates import string_agg


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8)], ["k", "v"])
    out = topk(df, ["k"], [F.col("v").desc()], limit=2)
    got = {(r.k, r.v) for r in out.collect()}
    assert got == {("a", 3), ("a", 2), ("b", 9), ("b", 8)}


def test_topk_offset_and_global(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    out = topk(df, [], [F.col("v").asc()], limit=3, offset=2)
    assert [r.v for r in out.collect()] == [2, 3, 4]
    grouped = topk(df.withColumn("k", F.lit(1)), ["k"],
                   [F.col("v").asc()], limit=2, offset=5)
    assert sorted(r.v for r in grouped.collect()) == [5, 6]


def test_distinct_on(spark):
    df = spark.createDataFrame(
        [("a", 2, "x"), ("a", 1, "y"), ("b", 5, "z")], ["k", "o", "payload"])
    out = distinct_on(df, ["k"], [F.col("o").asc()])
    assert {(r.k, r.payload) for r in out.collect()} == {("a", "y"), ("b", "z")}


def test_diff_algebra_negate_threshold(spark):
    """Threshold(Union(a, Negate(b))) == EXCEPT ALL (reference semantics)."""
    a = spark.createDataFrame([(1, 1), (1, 1), (2, 1)], ["v", "diff"])
    b = spark.createDataFrame([(1, 1), (3, 1)], ["v", "diff"])
    out = threshold(union_diffs(a, negate(b)))
    assert sorted((r.v, r.diff) for r in out.collect()) == [(1, 1), (2, 1)]


def test_let_rec_fixpoint(spark):
    """Transitive closure of a 4-node chain reaches all nodes."""
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    seed = spark.createDataFrame([(0,)], ["node"])

    def step(b):
        new = b["reach"].join(edges, b["reach"]["node"] == edges["src"]) \
            .select(F.col("dst").alias("node"))
        return {"reach": b["reach"].unionAll(new)}

    out = let_rec({"reach": seed}, step)["reach"]
    assert sorted(r.node for r in out.collect()) == [0, 1, 2, 3]


def test_let_rec_iteration_limit(spark):
    counter = spark.createDataFrame([(0,)], ["n"])

    def step(b):
        return {"n": b["n"].select((F.col("n") + 1).alias("n"))}

    out = let_rec({"n": counter}, step, max_iter=5)["n"]
    assert out.collect()[0].n == 5  # hit the limit, no fixpoint


def test_generate_series_and_ordinality(spark):
    assert generate_series(spark, 1, 5).count() == 5
    df = spark.createDataFrame([(["x", "y"],)], ["arr"])
    rows = with_ordinality(df, "arr", alias="el").collect()
    assert {(r.el, r.ordinality) for r in rows} == {("x", 1), ("y", 2)}


def test_date_bin_and_hopping(spark):
    df = spark.createDataFrame([("2024-01-01 10:37:00",)], ["s"]) \
        .select(F.col("s").cast("timestamp").alias("ts"))
    binned = df.select(date_bin("15 minutes", "ts").alias("b")).collect()[0].b
    assert str(binned) == "2024-01-01 10:30:00"
    hops = df.select(date_bin_hopping("15 minutes", "1 hour", "ts").alias("h")) \
        .collect()[0].h
    assert [str(h) for h in hops] == [
        "2024-01-01 09:45:00", "2024-01-01 10:00:00",
        "2024-01-01 10:15:00", "2024-01-01 10:30:00"]


def test_string_agg_ordered(spark):
    df = spark.createDataFrame([(1, "b"), (1, "a"), (2, "c")], ["k", "s"])
    out = df.groupBy("k").agg(string_agg("s", ",", order_by="s").alias("agg"))
    assert {(r.k, r.agg) for r in out.collect()} == {(1, "a,b"), (2, "c")}


def test_checked_div_errors_on_zero(spark):
    """PG semantics: x/0 raises, it does not NULL (reference Div* eval)."""
    import pytest
    from materialize_spark.functions.errors import checked_div

    df = spark.createDataFrame([(10, 2), (7, 0)], "a long, b long")
    ok = df.filter("b != 0").select(checked_div("a", "b").alias("q"))
    assert [r.q for r in ok.collect()] == [5.0]
    with pytest.raises(Exception, match="division by zero"):
        df.select(checked_div("a", "b")).collect()


def test_checked_cast_long_errors_on_garbage(spark):
    import pytest
    from materialize_spark.functions.errors import checked_cast_long

    good = spark.createDataFrame([("42",), (None,)], "s string")
    vals = [r.v for r in good.select(checked_cast_long("s").alias("v")).collect()]
    assert vals == [42, None]  # NULL passes through (SQL cast of NULL)
    bad = spark.createDataFrame([("4x2",)], "s string")
    with pytest.raises(Exception, match="invalid input"):
        bad.select(checked_cast_long("s").alias("v")).collect()


def test_jsonb_strip_nulls_and_parse_ident(spark):
    from materialize_spark.functions.jsonb import jsonb_strip_nulls
    from materialize_spark.functions.strings import parse_ident
    df = spark.createDataFrame(
        [('{"a":1,"b":null,"c":2}', 'public."My Table".col')],
        "j string, i string")
    r = df.select(jsonb_strip_nulls("j").alias("s"),
                  parse_ident("i").alias("p")).first()
    assert r.s == '{"a":1,"c":2}'
    assert r.p == ["public", "My Table", "col"]


def test_asof_join_semantics(spark):
    """Backward as-of: latest right at-or-before; no prior right → NULL."""
    from materialize_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 20), (2, 7)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 9, "c")], "k long, rts long, v string")
    out = {(r.k, r.ts): r.v
           for r in asof_join(left, right, on=["k"], left_ts="ts",
                              right_ts="rts").collect()}
    assert out == {(1, 5): None,     # before any right row
                   (1, 10): "a",     # tie at equal ts matches
                   (1, 20): "b",     # latest at-or-before
                   (2, 7): None}


def test_range_join_counts_each_pair_once(spark):
    from materialize_spark.operators.asof import range_join
    df = spark.createDataFrame(
        [(1, 0, 1), (1, 90, 2), (1, 250, 3)], "k long, t long, id long")
    l = df.select("k", F.col("t").alias("lt"), F.col("id").alias("id_a"))
    r = df.select("k", F.col("t").alias("rt"), F.col("id").alias("id_b"))
    pairs = range_join(l, r, on=["k"], left_ts="lt", right_ts="rt",
                       width=100, how_filter=F.col("id_a") < F.col("id_b"))
    got = sorted((p.id_a, p.id_b) for p in pairs.collect())
    assert got == [(1, 2)]  # |0-90|<=100; |90-250|>100; |0-250|>100
