"""Golden plan-shape pins for the most expensive registry queries.

The reference pins optimizer behavior with golden EXPLAIN sqllogictests
(test/sqllogictest/transform/*.slt); these are the Catalyst equivalent
(VERDICT r5 item 8): for each query the physical plan must keep the shape
that makes it viable at 100 TB. A regression anywhere — a lost
arrangement elision (extra runtime exchange), a join degrading to
cartesian/nested-loop, Python eval appearing in a JVM-only pipeline —
fails here long before it ships as a 10x slowdown.

Pinned at sf0.1 (the bench scale) because arrangement-based exchange
elision is size-gated: at sf0.001 the keyed arrangements collapse to one
shard and the pins would be vacuous.
"""

import re

import pytest

from materialize_spark.queries import load_all

SF_DIR_BENCH = "/root/testdata/sf0.1"

REG = load_all()

# name -> (max ENSURE_REQUIREMENTS exchanges, max BroadcastExchange).
# Exchange bounds count the EXECUTED plan string, which includes cached
# arrangement lineage (REPARTITION_BY_NUM builds are excluded — those are
# paid once at arrangement build, not per query).
GOLDEN = {
    # headline: at most ONE runtime exchange (the final aggregate);
    # joins run over co-partitioned arrangements or broadcasts
    "tpch_q1": (1, 0),
    "tpch_q3": (0, 1),   # TakeOrderedAndProject, no agg exchange
    "tpch_q5": (1, 4),
    "tpch_q6": (1, 0),
    "tpch_q9": (1, 4),
    "tpch_q13": (1, 0),  # agg pushed below the outer join; both sides arranged
    "tpch_q18": (0, 3),
    "tpch_q21": (1, 1),  # fact x fact anti-join over shared arrangement
    # wider tpch
    "tpch_q7": (1, 5),
    "tpch_q8": (1, 7),
    "tpch_q10": (1, 3),
    "tpch_q17": (2, 2),
    # LLM pipeline: shuffle only where the algorithm requires a key hop
    "dedup_minhash_lsh": (2, 1),
    "dedup_simhash": (0, 0),
    "dedup_components": (0, 0),
    "simsearch_cosine_topk": (0, 0),
    "simsearch_lsh_buckets": (1, 0),
    # relational
    "window_functions": (1, 0),
    "join_wide_16way": (0, 16),  # 16 dims broadcast, fact never moves
    # 64-relation delta-join width (reference README): 63 dim sides all
    # broadcast (Catalyst may reuse repeated exchanges), customer fact
    # never moves, zero runtime exchanges
    "join_wide_64way": (0, 64),
    "topk_orders_per_segment": (1, 1),
    # k-means result plan: one count exchange + the K-row presentation
    # sort; the K-row norms broadcast; centroids are literals, no Python
    "pipeline_cluster_kmeans": (2, 1),
}


@pytest.fixture(scope="module")
def bench_spark():
    from materialize_spark.session import get_spark
    s = get_spark("golden-plans")
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_plan_shape(bench_spark, name):
    max_ens, max_bcast = GOLDEN[name]
    df = REG[name].fn(bench_spark, SF_DIR_BENCH)
    plan = df._jdf.queryExecution().executedPlan().toString()
    ens = plan.count("ENSURE_REQUIREMENTS")
    bcast = len(re.findall(r"BroadcastExchange", plan))
    assert ens <= max_ens, \
        f"{name}: {ens} runtime exchanges (max {max_ens}) — arrangement " \
        f"elision regressed"
    assert bcast <= max_bcast, \
        f"{name}: {bcast} broadcast exchanges (max {max_bcast})"
    # universal invariants: no cartesian/nested-loop joins, and no Python
    # evaluation inside queries whose operators are JVM expressions
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "EvalPython" not in plan, name


def test_golden_covers_the_expensive_set():
    """The pin set must include every headline query plus the dedup/
    simsearch/window families — the 20 most expensive registry shapes."""
    from bench import HEADLINE
    for h in HEADLINE:
        assert h in GOLDEN, f"headline {h} unpinned"
    assert len(GOLDEN) >= 20
