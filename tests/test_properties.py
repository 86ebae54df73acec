"""Property-based tests (hypothesis) for semantic edge cases.

Mirrors the reference's proptest layer (arb_datum round-trips and eval
invariants, src/repr proptest exports — SURVEY.md §5): instead of golden
outputs, assert algebraic laws on randomized inputs. Example counts are
kept small because every example is a Spark job.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from materialize_spark.functions.ordering import pg_sort_key
from materialize_spark.operators.setops import threshold, union_diffs
from materialize_spark.operators.topk import topk

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=list(HealthCheck))

maybe_int = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))


@SETTINGS
@given(st.lists(maybe_int, min_size=1, max_size=12))
def test_pg_null_ordering_nulls_last_asc(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = [r.v for r in df.orderBy(pg_sort_key("v")).collect()]
    non_null = sorted(v for v in vals if v is not None)
    want = non_null + [None] * (len(vals) - len(non_null))
    assert got == want


@SETTINGS
@given(st.lists(st.tuples(st.sampled_from("ab"),
                          st.integers(0, 50)), min_size=1, max_size=20),
       st.integers(1, 4))
def test_topk_matches_python_sort(spark, rows, k):
    df = spark.createDataFrame(rows, "k string, v long")
    got = sorted((r.k, r.v)
                 for r in topk(df, ["k"], [F.col("v").desc()], limit=k).collect())
    want = []
    for key in {r[0] for r in rows}:
        vs = sorted((v for kk, v in rows if kk == key), reverse=True)[:k]
        want += [(key, v) for v in vs]
    assert got == sorted(want)


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(-2, 3)),
                min_size=1, max_size=15))
def test_threshold_union_diff_algebra(spark, rows):
    """Threshold(Union(frames)) == per-value positive net multiplicity."""
    df = spark.createDataFrame(rows, "v int, diff long")
    half = df.limit(len(rows) // 2)
    rest = df.exceptAll(half)
    got = {(r.v, r.diff)
           for r in threshold(union_diffs(half, rest)).collect()}
    net: dict[int, int] = {}
    for v, d in rows:
        net[v] = net.get(v, 0) + d
    want = {(v, d) for v, d in net.items() if d > 0}
    assert got == want


@SETTINGS
@given(st.integers(0, 10_000_000), st.sampled_from([60, 900, 3600, 86400]),
       st.integers(0, 3600))
def test_date_bin_floor_law(spark, epoch_s, stride_s, origin_s):
    """origin <= bin <= ts and (bin - origin) % stride == 0 and
    ts - bin < stride — the PG date_bin contract, including ts < origin."""
    row = spark.range(1).select(
        F.timestamp_seconds(F.lit(epoch_s)).alias("ts"))
    us, stride_us, origin_us = (epoch_s * 10**6, stride_s * 10**6,
                                origin_s * 10**6)
    binned = row.select(
        F.unix_micros(
            F.timestamp_micros(
                F.unix_micros(F.col("ts"))
                - F.pmod(F.unix_micros(F.col("ts")) - origin_us,
                         F.lit(stride_us)))).alias("b")).first().b
    assert (binned - origin_us) % stride_us == 0
    assert binned <= us < binned + stride_us
