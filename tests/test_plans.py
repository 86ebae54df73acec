"""Plan-shape regression guards: pushdown, pruning, broadcast, partial agg.

These pin the *physical* properties that make the engine viable at 100 TB;
a failure here means Catalyst stopped doing something we rely on (or a
query was rewritten in a way that defeats it) even though results are
still correct.
"""

from materialize_spark.plans.audit import (
    operator_counts, physical_plan, read_columns, scans,
)
from materialize_spark.queries import load_all

from tests.conftest import SF_DIR

REG = load_all()


def q(name, spark):
    return REG[name].fn(spark, SF_DIR)


def test_q6_filter_pushed_and_schema_pruned(spark):
    """The 100 TB path: with the in-memory arrangement budget off (a fact
    table past the budget streams from parquet), predicates and column
    pruning must reach the parquet reader."""
    import materialize_spark.catalog as cat

    saved = cat.ARRANGE_BYTES
    cat.ARRANGE_BYTES = 0
    cat.clear_table_cache(spark)
    # Drop JVM-side cached relations too: Spark's CacheManager substitutes an
    # InMemoryRelation for ANY logical plan matching a persisted one, so a
    # lineitem cached by an earlier test would mask the parquet scan here.
    spark.catalog.clearCache()
    try:
        df = q("tpch_q6", spark)
        [scan] = scans(df)
        # shipdate/discount/quantity predicates reach the parquet reader
        assert "l_shipdate" in scan["PushedFilters"]
        assert "l_discount" in scan["PushedFilters"]
        # only the 4 needed columns are read from the 11-column table
        cols = read_columns(scan)
        assert cols == {"l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"}
    finally:
        cat.ARRANGE_BYTES = saved
        cat.clear_table_cache(spark)


def test_q6_cached_scan_under_budget(spark):
    """Under the arrangement budget the same scan serves from the in-memory
    columnar cache (InMemoryTableScan) instead of re-decoding parquet."""
    df = q("tpch_q6", spark)
    plan = physical_plan(df, "simple")
    assert "InMemoryTableScan" in plan or "Scan In-memory" in plan


def test_q3_join_shape(spark):
    """q3's intended shape at scale: the filtered customer dim broadcasts;
    orders joins lineitem hash-partitioned on the join key (never sorted,
    never broadcasting a filtered fact side — a driver-built broadcast of a
    fact subset is single-threaded and wrong at 100 TB); the group-by keys
    include the join key so the aggregate reuses the join partitioning
    (no exchange between join and agg)."""
    df = q("tpch_q3", spark)
    ops = operator_counts(df)
    assert ops.get("BroadcastHashJoin", 0) >= 1   # customer side
    assert ops.get("ShuffledHashJoin", 0) == 1    # orders x lineitem
    assert ops.get("SortMergeJoin", 0) == 0
    # Exchanges: one per shuffled-join input; cache-build repartitions show
    # up inside InMemoryRelation subtrees but execute once, not per query.
    assert ops.get("Exchange", 0) <= 3


def test_q1_partial_aggregation(spark):
    plan = physical_plan(q("tpch_q1", spark), "simple")
    # map-side partial + final aggregate around a single exchange
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1


def test_q9_join_shape(spark):
    """q9's 5-way join: true dimensions (part, supplier, nation) broadcast;
    the one fact-x-fact join (lineitem x orders) hash-partitions on the join
    key instead of broadcasting a filtered fact side. Never sort-based."""
    df = q("tpch_q9", spark)
    ops = operator_counts(df)
    assert ops.get("BroadcastHashJoin", 0) >= 3
    assert ops.get("ShuffledHashJoin", 0) == 1
    assert ops.get("SortMergeJoin", 0) == 0


def test_pipeline_minhash_no_python_udf(spark):
    """Dedup hot path stays JVM-side: no Python eval operators in plan."""
    plan = physical_plan(q("dedup_minhash_lsh", spark), "simple")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_whole_stage_codegen_active(spark):
    df = q("tpch_q1", spark)
    df.collect()  # AQE finalizes (and codegens) only on execution
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in final  # starred stages = whole-stage-codegen spans


def test_no_fact_broadcast_in_headline_queries(spark):
    """No headline query may put fact-table ROWS on a broadcast build side
    (driver-built single-threaded hash relation; wrong at any scale — a
    filtered fact that fits the threshold at sf0.01 does not at 100 TB).
    Aggregated key-set broadcasts (q18's HAVING subquery) are allowed."""
    from materialize_spark.plans.audit import fact_broadcasts
    from bench import HEADLINE

    for name in HEADLINE:
        assert fact_broadcasts(q(name, spark)) == [], name
