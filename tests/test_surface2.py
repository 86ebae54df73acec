"""Tests for the second surface wave (queries/surface2.py)."""

from pyspark.sql import functions as F

from materialize_spark.queries import load_all

from tests.conftest import SF_DIR

REG = load_all()


def run(name, spark):
    return REG[name].fn(spark, SF_DIR)


def test_jsonb_each_shape(spark):
    rows = run("tablefunc_jsonb_each", spark).limit(5).collect()
    assert rows and all(r.key == "k" and r.val.isdigit() for r in rows)


def test_jsonb_array_elements_count(spark):
    df = run("tablefunc_jsonb_array_elements", spark)
    n_events = df.select("event_id").distinct().count()
    assert df.count() == 2 * n_events  # 2 elements per built array


def test_csv_extract_roundtrip(spark):
    r = run("tablefunc_csv_extract", spark).filter(F.col("c_custkey") == 1).first()
    assert r.f3 == "1" and r.f1.startswith("Customer")


def test_date_bin_floor_before_origin(spark):
    # bin1h_off uses origin 00:30; events at 00:00-00:29 must floor DOWN
    r = (run("scalar_date_bin", spark)
         .filter(F.col("bin1h_off") < "2024-01-01 00:30:00").count())
    assert r > 0  # pre-origin timestamps bin to 2023-12-31 23:30


def test_window_lag_lead_default(spark):
    df = run("window_lag_lead", spark)
    # lead(value, 2, -1.0): last two rows of each user get the default
    assert df.filter(F.col("next2_v") == -1.0).count() > 0
    # first row per user has null lag
    assert df.filter(F.col("prev_v").isNull()).count() > 0


def test_subquery_decorrelated_flags(spark):
    df = run("subquery_decorrelated", spark)
    assert df.filter("has_big_order").count() > 0
    assert df.filter("NOT has_urgent").count() > 0


def test_grouping_sets_totals(spark):
    df = run("agg_grouping_sets", spark)
    grand = df.filter((F.col("g_seg") == 1) & (F.col("g_pri") == 1)).collect()
    assert len(grand) == 1
    per_seg = df.filter((F.col("g_seg") == 0) & (F.col("g_pri") == 1))
    assert per_seg.agg(F.sum("n")).first()[0] == grand[0].n


def test_embedding_cosine_symmetric_bounds(spark):
    df = run("dedup_embedding_cosine", spark)
    rows = df.collect()
    assert all(r.id_a < r.id_b and -1.0 <= r.cos <= 1.0 for r in rows)
    assert all(r.cos >= 0.4 - 1e-4 for r in rows)


def test_decimal_sums_are_exact(spark):
    # Final columns are canonical fixed-scale strings (engine-neutral for
    # the driver's value hash); exactness shows as full decimal scale.
    df = run("agg_decimal", spark)
    from decimal import Decimal
    r = df.first()
    assert isinstance(r.sum_qty, str)
    parsed = Decimal(r.sum_qty)
    assert parsed == parsed.quantize(Decimal("0.01"))
    assert "." in r.sum_qty and len(r.sum_qty.split(".")[1]) == 2


def test_repeat_row_drops_zero_counts(spark):
    df = run("tablefunc_repeat_row", spark)
    per = df.groupBy("p_partkey").count().collect()
    assert all(1 <= r["count"] <= 3 for r in per)  # n in 1..3 after the n>0 filter


def test_wrap_two_rows_per_input(spark):
    df = run("tablefunc_wrap", spark)
    n_cust = df.select("c_custkey").distinct().count()
    assert df.count() == 2 * n_cust
