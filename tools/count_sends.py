"""Histogram py4j send_command roundtrips by call site.

Patches the py4j connection send to walk the Python stack and attribute
each roundtrip to (a) the innermost materialize_spark frame and (b) the
pyspark public API function that issued it. Warm-run attribution guides
the batched-plan-construction work (OPTIMIZATION_r14).

Usage: python tools/count_sends.py <entry> [sf_dir]
"""

from __future__ import annotations

import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")


def main() -> None:
    entry = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    from materialize_spark.queries import load_all

    registry = load_all()
    spark = (SparkSession.builder.master("local[32]")
             .appName("count_sends").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry[entry].fn
    # cold run first
    fn(spark, sf_dir).collect()

    import py4j.clientserver as cs
    mz_hist: Counter = Counter()
    api_hist: Counter = Counter()
    pair_hist: Counter = Counter()
    orig = cs.ClientServerConnection.send_command

    def counting(self, *a, **kw):
        f = sys._getframe(1)
        mz = api = None
        while f is not None:
            fname = f.f_code.co_filename
            if api is None and "/pyspark/sql/" in fname:
                api = f.f_code.co_name
            if "/materialize_spark/" in fname or fname.endswith("check.py"):
                mz = f"{fname.rsplit('/',1)[-1]}:{f.f_lineno}:{f.f_code.co_name}"
                break
            f = f.f_back
        mz_hist[mz or "<none>"] += 1
        api_hist[api or "<none>"] += 1
        pair_hist[(mz or "<none>", api or "<none>")] += 1
        return orig(self, *a, **kw)

    cs.ClientServerConnection.send_command = counting
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    cs.ClientServerConnection.send_command = orig

    total = sum(mz_hist.values())
    print(f"warm wall {wall:.1f}s, total sends {total}")
    print("--- by materialize_spark call site (top 40)")
    for k, v in mz_hist.most_common(40):
        print(f"{v:7d}  {k}")
    print("--- by pyspark API fn (top 25)")
    for k, v in api_hist.most_common(25):
        print(f"{v:7d}  {k}")
    print("--- top (site, api) pairs (top 40)")
    for (m, a), v in pair_hist.most_common(40):
        print(f"{v:7d}  {a:28s} {m}")


if __name__ == "__main__":
    main()
