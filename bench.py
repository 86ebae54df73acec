"""Benchmark entry point (driver contract).

Runs the headline query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed via its registered callable (same code path the
correctness gate uses) and timed to full materialization (collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9",
    "tpch_q13", "tpch_q18", "tpch_q21",
]


def main() -> None:
    # Contamination guard (VERDICT r11 item 7): sample the load BEFORE
    # any Spark work — a loaded box inflates every number uniformly
    # (BENCH_r11 ran ~30% hot incl. pure plan time) and the stamp lets
    # readers reject such runs instead of chasing phantom regressions.
    try:
        _load1 = os.getloadavg()[0]
        _cpus = os.cpu_count() or 1
    except OSError:
        _load1 = _cpus = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from materialize_spark.queries import load_all
    from materialize_spark.session import get_spark

    registry = load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in HEADLINE if n in registry]
    # Optional extension benchmarks (pipeline ops) run when present.
    names += [n for n in registry if n.startswith("bench_") and n not in names]

    # JVM/codegen warmup outside the timed region: four full passes at the
    # target scale factor so whole-stage codegen is compiled and HotSpot has
    # tiered the Catalyst + execution hot paths before timing starts. (C2
    # compilation of the optimizer itself is the largest cold-start term —
    # single-pass warmup leaves 20-30% JIT noise in the timings.)
    for _ in range(4):
        for name in names:
            try:
                registry[name].fn(spark, sf_dir).collect()
            except Exception:
                pass

    # Best-of-6 with a FRESH plan per iteration: every timed run pays full
    # parse/analyze/optimize/execute, i.e. honest ad-hoc query latency —
    # no plan or result reuse inside the timed region. (6 reps: the box's
    # GC/frequency noise puts 50-150 ms outliers on ~1/4 of runs; a larger
    # sample tightens the min without changing what is measured.)
    times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    # Optimizer-latency metric mirroring the reference's optbench (EXPLAIN
    # only, no execution): plan build + analyze + optimize + physical
    # planning. This is the dominant term in the small-SF ad-hoc numbers
    # above (see PERF.md) and the term that amortizes away at scale.
    plan_times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            df._jdf.queryExecution().executedPlan()
            best = min(best, time.perf_counter() - t0)
        plan_times[name] = round(best, 3)

    # Secondary metrics mirroring the reference's own benchmark protocol
    # (BASELINE.md: cluster-spec-sheet measures arrangement_formation =
    # one-time dataflow build, and peek_serving = reading the maintained
    # result). For an IVM engine the steady state is maintained views:
    # mv_create pays plan+execute once, mv_peek is what every subsequent
    # read costs. Reported alongside — never mixed into — the ad-hoc
    # headline number above.
    mv_create: dict[str, float] = {}
    mv_peek: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        snap = registry[name].fn(spark, sf_dir).localCheckpoint(eager=True)
        mv_create[name] = round(time.perf_counter() - t0, 3)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            snap.collect()
            best = min(best, time.perf_counter() - t0)
        mv_peek[name] = round(best, 3)

    load1, cpus = _load1, _cpus
    idle_ok = None if load1 is None else load1 / cpus < 0.25

    # Scaling-contract self-documentation (VERDICT r13 item 2): emit the
    # core count the driver asked for, the derived master, and the
    # effective shuffle parallelism, so the driver's scaling probe can
    # verify $SPARK_GRAFT_CPUS took effect from the artifact alone
    # (at sf0.1 per-query constants dominate, so the 8-vs-32-core ratio
    # sits near 1 even though the env IS honored — session.py:37-41).
    graft_cpus = os.environ.get("SPARK_GRAFT_CPUS")
    try:
        eff_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    except Exception:
        eff_shuffle = None
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total_wallclock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "plan_sec": plan_times,
        "plan_total": round(sum(plan_times.values()), 3),
        "mv_create_sec": mv_create,
        "mv_peek_sec": mv_peek,
        "mv_peek_total": round(sum(mv_peek.values()), 3),
        "cpus": int(graft_cpus) if graft_cpus else None,
        "master": spark.sparkContext.master,
        "shuffle_partitions": int(eff_shuffle) if eff_shuffle else None,
        "load1_before": None if load1 is None else round(load1, 2),
        "load_per_cpu": None if load1 is None
        else round(load1 / cpus, 3),
        "idle_ok": idle_ok,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
