"""Profile one registry entry's wall-clock composition.

Runs a single entry under cProfile on a vanilla session (same setup as
tools/check.py) and prints the cumulative top — the py4j wait lines show
which engine calls block the driver; pure-Python hot spots show planner
overhead on our side.

Usage: python tools/profile_entry.py <entry> [sf_dir]
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

    from pyspark.sql import SparkSession

    from materialize_spark.queries import load_all

    registry = load_all()
    spark = (SparkSession.builder.master("local[32]")
             .appName("profile").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    fn = registry[entry].fn
    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    fn(spark, sf_dir).collect()
    prof.disable()
    wall = time.perf_counter() - t0
    out = io.StringIO()
    stats = pstats.Stats(prof, stream=out)
    stats.sort_stats("cumulative").print_stats(45)
    print(out.getvalue())
    print(f"WALL {entry}: {wall:.1f}s")


if __name__ == "__main__":
    main()
