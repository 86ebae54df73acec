"""Paired Spark/DuckDB benchmark at a scaled-up SF: the amortization proof.

At sf0.1 the headline comparison is dominated by Spark's fixed per-query
cost (planning + job scheduling, ~0.1s/query — PERF.md), a constant that
DuckDB's embedded execution does not pay and that vanishes into execution
time at real data sizes. This script measures that claim instead of
asserting it: it scales the driver's sf0.1 tables up by an integer factor
(default 10 ≈ sf1) and runs BOTH committed bench scripts (bench.py,
tools/bench_duckdb.py — same protocol, same queries, same files) over the
scaled data.

Scaling is key-offset replication, the TPC-H growth law: each replica i
shifts every join key by i*K (K = max(key)+1), so per-key fan-outs
(orders per customer, lineitems per order) and join selectivities match a
natively generated larger SF; nation/region stay fixed-size exactly as
TPC-H specifies. Both engines read the same parquet files, so neither gets
a storage advantage.

Usage: python tools/bench_scale.py [factor]
Output: one JSON line {"spark_sec", "duckdb_sec", "ratio", ...}.
The scaled data lands under .scratch/ (gitignored) and is reused.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# join-key columns shifted per replica, keyed by the domain they draw from
_KEY_DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
}
_SCALED = ("customer", "supplier", "part", "orders", "lineitem")
_COPIED = ("region", "nation", "events", "documents", "embeddings")


def generate(dst: str, factor: int) -> None:
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    shift: dict[tuple[str, str], int] = {}
    for domain, cols in _KEY_DOMAINS.items():
        k = 0
        for table, col in cols:
            m = con.execute(
                f"SELECT max({col}) FROM "
                f"read_parquet('{SRC}/{table}.parquet')").fetchone()[0]
            k = max(k, int(m) + 1)
        for table, col in cols:
            shift[(table, col)] = k

    os.makedirs(dst, exist_ok=True)
    for table in _SCALED:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchall()]
        sel = ", ".join(
            f"{c} + i * {shift[(table, c)]} AS {c}"
            if (table, c) in shift else c
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} "
            f"      FROM read_parquet('{SRC}/{table}.parquet'), "
            f"           range({factor}) t(i)) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    for table in _COPIED:
        src = f"{SRC}/{table}.parquet"
        if os.path.exists(src):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")


def run_bench(script: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = os.path.join(REPO, ".scratch", f"sf_scaled_x{factor}")
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        generate(dst, factor)

    spark = run_bench("bench.py", dst)
    duck = run_bench(os.path.join("tools", "bench_duckdb.py"), dst)
    ratio = round(spark["value"] / duck["value"], 3) if duck["value"] else None
    per_query = {
        n: {"spark": spark["queries"][n], "duckdb": duck["queries"].get(n),
            "ratio": (round(spark["queries"][n] / duck["queries"][n], 2)
                      if duck["queries"].get(n) else None)}
        for n in spark["queries"]}
    print(json.dumps({
        "metric": "headline_scaled_paired",
        "scale_factor_equivalent": 0.1 * factor,
        "spark_sec": spark["value"],
        "duckdb_sec": duck["value"],
        "ratio": ratio,
        "queries": per_query,
        "spark_plan_total": spark.get("plan_total"),
        "spark_mv_peek_total": spark.get("mv_peek_total"),
    }))


if __name__ == "__main__":
    main()
