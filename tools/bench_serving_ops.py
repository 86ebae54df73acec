"""Per-commit serving lag for the round-11 maintained-operator families.

The always-fresh contract is "a commit returns when every dependent MV
has republished"; this measures that end-to-end wall time through the
SQL front-end (MzSession.execute) for the operator families added in
round 11 — set ops, multi-set window aggregates, a 3-level stacked
chain, keyless aggregates, RANK TopK — each over a base of ``base_rows``
rows with per-commit batches of ``batch_rows``.

Prints one JSON line:
{"metric": "serving_commit_lag", "families": {name: {p50, max}},
 "base_rows": N, "batch_rows": M}

Usage: python tools/bench_serving_ops.py [base_rows] [batch_rows] [n]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from pyspark.sql import functions as F

    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.session import get_spark
    spark = get_spark("bench_serving_ops")
    spark.sparkContext.setLogLevel("ERROR")
    s = MzSession(spark, "/root/testdata/sf0.001")

    def seed(table: str, offset: int = 0) -> None:
        s.execute(f"CREATE TABLE {table} (k STRING, g STRING, "
                  "v BIGINT)")
        rows = (spark.range(base_rows)
                .select((F.concat(F.lit("k"),
                                  (F.col("id") % 997)))
                        .alias("k"),
                        (F.concat(F.lit("g"), (F.col("id") % 31)))
                        .alias("g"),
                        ((F.col("id") * 7 + offset) % 100_000)
                        .cast("long").alias("v")))
        s.append_rows(table, rows)

    def commit_series(table: str) -> dict:
        lags = []
        for i in range(n):
            vals = ", ".join(
                f"('k{(i * 131 + j) % 997}', 'g{(i + j) % 31}', "
                f"{(i * 977 + j * 13) % 100_000})"
                for j in range(batch_rows))
            t0 = time.perf_counter()
            s.execute(f"INSERT INTO {table} VALUES {vals}")
            lags.append(time.perf_counter() - t0)
        return {"p50": round(statistics.median(lags), 3),
                "max": round(max(lags), 3)}

    out = {}

    # set op: EXCEPT ALL over two bases
    seed("bso_l")
    seed("bso_r", offset=3)
    s.execute("CREATE MATERIALIZED VIEW bso WITH (MAINTENANCE 'delta')"
              " AS SELECT k, v FROM bso_l EXCEPT ALL "
              "SELECT k, v FROM bso_r")
    out["setop_except_all"] = commit_series("bso_l")

    # multi-set window aggregate incl. global total
    seed("bwa_t")
    s.execute("CREATE MATERIALIZED VIEW bwa WITH (MAINTENANCE 'delta')"
              " AS SELECT k, g, v, SUM(v) OVER (PARTITION BY k) AS sk,"
              " COUNT(*) OVER (PARTITION BY g) AS ng FROM bwa_t")
    out["window_agg_two_sets"] = commit_series("bwa_t")

    # stacked 3-level chain: agg -> filter -> stateless map
    seed("bst_t")
    s.execute("CREATE MATERIALIZED VIEW bst1 WITH (MAINTENANCE "
              "'delta') AS SELECT k, SUM(v) AS tot, COUNT(*) AS cnt "
              "FROM bst_t GROUP BY k")
    s.execute("CREATE MATERIALIZED VIEW bst2 WITH (MAINTENANCE "
              "'delta') AS SELECT k, tot FROM bst1 WHERE tot > 1000")
    s.execute("CREATE MATERIALIZED VIEW bst3 WITH (MAINTENANCE "
              "'delta') AS SELECT k, tot * 2 AS dbl FROM bst2")
    out["stacked_3_level"] = commit_series("bst_t")

    # keyless aggregate
    seed("bga_t")
    s.execute("CREATE MATERIALIZED VIEW bga WITH (MAINTENANCE 'delta')"
              " AS SELECT SUM(v) AS s, COUNT(*) AS n, MAX(v) AS hi "
              "FROM bga_t")
    out["global_agg"] = commit_series("bga_t")

    # RANK TopK (ties kept)
    seed("btk_t")
    s.execute("CREATE MATERIALIZED VIEW btk WITH (MAINTENANCE 'delta')"
              " AS SELECT k, g, v FROM (SELECT k, g, v, RANK() OVER "
              "(PARTITION BY g ORDER BY v DESC) AS rn FROM btk_t) t "
              "WHERE rn <= 5")
    out["rank_topk"] = commit_series("btk_t")

    print(json.dumps({"metric": "serving_commit_lag",
                      "families": out, "base_rows": base_rows,
                      "batch_rows": batch_rows, "n_commits": n}))


if __name__ == "__main__":
    main()
