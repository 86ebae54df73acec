"""Profile one registry entry's py4j roundtrips and blocking calls.

Counts py4j ``send_command`` invocations (each is one driver<->JVM
roundtrip) and attributes them to the engine call sites that issue them,
plus wall time of the blocking Spark actions. Run the entry twice in one
process: the second (warm) run isolates steady-state maintenance cost
from first-touch arrangement builds.

Usage: python tools/profile_roundtrips.py <entry> [sf_dir] [n_runs]
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    entry = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import SparkSession

    from materialize_spark.queries import load_all

    registry = load_all()
    spark = (SparkSession.builder.master("local[32]")
             .appName("profile").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    fn = registry[entry].fn

    import py4j.clientserver as cs
    import py4j.java_gateway as jg
    counts = {"send": 0}
    orig = jg.GatewayConnection.send_command

    def counting_send(self, *a, **kw):
        counts["send"] += 1
        return orig(self, *a, **kw)

    jg.GatewayConnection.send_command = counting_send
    # ClientServer mode uses its own connection class.
    orig_cs = cs.ClientServerConnection.send_command

    def counting_send_cs(self, *a, **kw):
        counts["send"] += 1
        return orig_cs(self, *a, **kw)

    cs.ClientServerConnection.send_command = counting_send_cs

    for i in range(n_runs):
        counts["send"] = 0
        t0 = time.perf_counter()
        prof = cProfile.Profile()
        prof.enable()
        rows = fn(spark, sf_dir).collect()
        prof.disable()
        wall = time.perf_counter() - t0
        print(f"=== run {i}: wall {wall:.1f}s  rows {len(rows)}  "
              f"roundtrips {counts['send']}")
        if i == n_runs - 1:
            out = io.StringIO()
            stats = pstats.Stats(prof, stream=out)
            stats.sort_stats("cumulative").print_stats(60)
            text = out.getvalue()
            print(text)


if __name__ == "__main__":
    main()
