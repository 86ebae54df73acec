"""DuckDB baseline under bench.py's EXACT protocol.

The round-3 advisor found the 2x-bar verdict rested on an unscripted ad-hoc
DuckDB measurement that nobody could reproduce (0.64s-1.74s depending on
protocol). This script removes the ambiguity: it runs the SAME headline
queries' registered oracle SQL over the SAME parquet at the SAME scale
factor with the SAME warmup/best-of-N discipline as bench.py, and prints one
JSON line in the same shape. Ratio = bench.py value / this value, computed
from two committed scripts, not from anyone's shell history.

Protocol mirror of bench.py:
- threads = $SPARK_GRAFT_CPUS (default 32), matching Spark's local[N];
- one warm connection, parquet views registered once (bench.py registers
  temp views once per session too);
- 4 untimed warmup passes over the full set, then best-of-4 timed runs,
  each timed run re-parsing/re-planning the SQL (DuckDB has no prepared
  reuse here, matching the fresh-plan-per-iteration rule);
- timed to full materialization (fetchall).

Usage: python tools/bench_duckdb.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from bench import HEADLINE
    from materialize_spark.queries import load_all

    registry = load_all()
    names = [n for n in HEADLINE if n in registry and registry[n].oracle]
    sql = {n: registry[n].oracle for n in names}

    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}')")

    for _ in range(4):
        for n in names:
            con.execute(sql[n]).fetchall()

    times: dict[str, float] = {}
    for n in names:
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            con.execute(sql[n]).fetchall()
            best = min(best, time.perf_counter() - t0)
        times[n] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "duckdb_baseline_total_wallclock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "threads": threads,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
