"""Range type edge cases (PG semantics; reference src/repr/src/adt/range.rs,
src/expr/src/scalar/func/binary.rs Range* variants)."""

import pytest

from pyspark.sql import functions as F

from materialize_spark.functions import ranges as R


@pytest.fixture(scope="module")
def spark():
    from materialize_spark.session import get_spark
    s = get_spark("test-ranges")
    s.sparkContext.setLogLevel("ERROR")
    return s


def one(spark, *cols):
    return spark.range(1).select(*cols).collect()[0]


def test_int4range_canonicalization(spark):
    row = one(
        spark,
        R.range_text(R.int4range(1, 5)).alias("a"),
        R.range_text(R.int4range(1, 5, "(]")).alias("b"),
        R.range_text(R.int4range(1, 5, "[]")).alias("c"),
        R.range_text(R.int4range(1, 5, "()")).alias("d"),
    )
    assert row.a == "[1,5)"
    assert row.b == "[2,6)"   # (1,5] -> [2,6)
    assert row.c == "[1,6)"   # [1,5] -> [1,6)
    assert row.d == "[2,5)"   # (1,5) -> [2,5)


def test_int4range_empty_and_singleton(spark):
    row = one(
        spark,
        R.range_text(R.int4range(5, 5)).alias("e"),
        R.range_text(R.int4range(7, 3)).alias("rev"),
        R.range_text(R.int4range(5, 5, "[]")).alias("single"),
        R.range_is_empty(R.int4range(5, 5)).alias("is_e"),
    )
    assert row.e == "empty" and row.rev == "empty"
    assert row.single == "[5,6)"
    assert row.is_e is True


def test_unbounded_sides(spark):
    row = one(
        spark,
        R.range_text(R.int4range(None, 40)).alias("lo_unb"),
        R.range_text(R.int4range(40, None)).alias("hi_unb"),
        R.range_contains_elem(R.int4range(None, 40), F.lit(39)).alias("in39"),
        R.range_contains_elem(R.int4range(None, 40), F.lit(40)).alias("in40"),
        R.range_contains_range(R.int4range(None, None),
                               R.int4range(1, 100)).alias("all_contains"),
    )
    assert row.lo_unb == "(,40)"
    assert row.hi_unb == "[40,)"
    assert row.in39 is True and row.in40 is False
    assert row.all_contains is True


def test_overlap_adjacent_ordering(spark):
    a, b, c = R.int4range(1, 5), R.int4range(5, 9), R.int4range(7, 12)
    row = one(
        spark,
        R.range_overlaps(a, b).alias("ab_ov"),
        R.range_adjacent(a, b).alias("ab_adj"),
        R.range_adjacent(b, a).alias("ba_adj"),
        R.range_overlaps(b, c).alias("bc_ov"),
        R.range_before(a, c).alias("a_before_c"),
        R.range_after(c, a).alias("c_after_a"),
        R.range_before(b, c).alias("b_before_c"),
    )
    assert row.ab_ov is False and row.ab_adj is True and row.ba_adj is True
    assert row.bc_ov is True
    assert row.a_before_c is True and row.c_after_a is True
    assert row.b_before_c is False


def test_union_intersection_difference(spark):
    a, b = R.int4range(1, 5), R.int4range(3, 9)
    disjoint = R.int4range(20, 30)
    inner = R.int4range(2, 4)
    wide = R.int4range(0, 10)
    row = one(
        spark,
        R.range_text(R.range_union(a, b)).alias("u"),
        R.range_text(R.range_union(a, R.int4range(5, 9))).alias("u_adj"),
        R.range_union(a, disjoint).alias("u_bad"),
        R.range_union_valid(a, disjoint).alias("u_bad_valid"),
        R.range_text(R.range_intersection(a, b)).alias("i"),
        R.range_text(R.range_intersection(a, disjoint)).alias("i_empty"),
        R.range_text(R.range_difference(a, b)).alias("d_high_chop"),
        R.range_text(R.range_difference(b, a)).alias("d_low_chop"),
        R.range_text(R.range_difference(a, wide)).alias("d_covered"),
        R.range_difference(wide, inner).alias("d_split"),
        R.range_text(R.range_difference(a, disjoint)).alias("d_noop"),
    )
    assert row.u == "[1,9)" and row.u_adj == "[1,9)"
    assert row.u_bad is None and row.u_bad_valid is False
    assert row.i == "[3,5)" and row.i_empty == "empty"
    assert row.d_high_chop == "[1,3)"
    assert row.d_low_chop == "[5,9)"
    assert row.d_covered == "empty"
    assert row.d_split is None          # PG raises; we yield NULL
    assert row.d_noop == "[1,5)"


def test_empty_range_algebra(spark):
    a = R.int4range(1, 5)
    e = R.empty_range()
    row = one(
        spark,
        R.range_text(R.range_union(a, e)).alias("u"),
        R.range_text(R.range_intersection(a, e)).alias("i"),
        R.range_text(R.range_difference(a, e)).alias("d"),
        R.range_contains_range(a, e).alias("contains_empty"),
        R.range_contains_range(e, a).alias("empty_contains"),
        R.range_overlaps(a, e).alias("ov"),
        R.range_adjacent(a, e).alias("adj"),
    )
    assert row.u == "[1,5)" and row.i == "empty" and row.d == "[1,5)"
    assert row.contains_empty is True and row.empty_contains is False
    assert row.ov is False and row.adj is False


def test_numrange_continuous(spark):
    row = one(
        spark,
        R.range_text(R.numrange(1.5, 3.5)).alias("a"),
        R.range_text(R.numrange(1.5, 3.5, "[]")).alias("b"),
        R.range_text(R.numrange(1.5, 1.5, "()")).alias("e"),
        R.range_text(R.numrange(1.5, 1.5, "[]")).alias("single"),
        R.range_contains_elem(R.numrange(1.5, 3.5), F.lit(3.5)).alias("hi_open"),
        R.range_contains_elem(R.numrange(1.5, 3.5, "[]"), F.lit(3.5)).alias("hi_closed"),
    )
    assert row.a == "[1.5,3.5)" and row.b == "[1.5,3.5]"
    assert row.e == "empty" and row.single == "[1.5,1.5]"
    assert row.hi_open is False and row.hi_closed is True


def test_bad_bounds_spec_rejected(spark):
    with pytest.raises(ValueError):
        R.int4range(1, 2, "[x")
    with pytest.raises(ValueError):
        R.numrange(1, 2, "))")
