"""Ingest-path throughput benchmark — the reference's Kafka scalability
scenario analog (KafkaEnvelopeNoneBytesScalability,
misc/python/materialize/feature_benchmark/scenarios/benchmark_main.py:1411:
10^SCALE records through ENVELOPE NONE / UPSERT).

No broker in the sandbox, so records are synthesized deterministically
executor-side (spark.range — no driver materialization) and pushed through
the same decode/collapse operators the Kafka path uses:

- envelope_none: append-only passthrough + projection (scan-rate bound).
- envelope_upsert: key-latest collapse over an update stream with 10
  updates/key average (streaming/upsert.upsert_latest — one shuffle).
- debezium_decode: JSON envelope decode (from_json) + diff split
  (sources/envelopes.debezium_decode).

Prints one JSON line: rows/sec per path at the given record count.

Usage: python tools/bench_ingest.py [n_records]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from materialize_spark.session import get_spark
    from materialize_spark.sources.envelopes import debezium_decode
    from materialize_spark.streaming.upsert import upsert_latest

    spark = get_spark("bench_ingest")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    # Deterministic keyed update stream, built executor-side.
    base = spark.range(0, n, 1, cores).select(
        F.col("id").alias("offset"),
        (F.col("id") % (n // 10 or 1)).alias("key"),
        (F.col("id") * 7 % 1000).cast("double").alias("value"),
        F.date_format(F.timestamp_micros(F.col("id")), "yyyy-MM-dd").alias("day"),
    )
    dbz = base.select(
        "offset",
        F.to_json(F.struct(
            F.struct("key", "value").alias("after"),
            F.lit(None).cast("struct<key:bigint,value:double>").alias("before"),
            F.lit("c").alias("op"))).alias("payload"))

    results: dict[str, float] = {}

    def timed(name, df):
        df.count()  # warm
        t0 = time.perf_counter()
        out = df.count()
        dt = time.perf_counter() - t0
        results[name] = round(n / dt)
        return out

    timed("envelope_none_rows_per_sec",
          base.select("key", "value", "day").filter(F.col("value") >= 0))
    timed("envelope_upsert_rows_per_sec",
          upsert_latest(base, ["key"], [F.col("offset").desc()],
                        value_cols=["value", "day"]))
    timed("debezium_decode_rows_per_sec",
          debezium_decode(dbz, "payload", "key bigint, value double"))

    print(json.dumps({
        "metric": "ingest_paths",
        "n_records": n,
        "cores": cores,
        **results,
    }))


if __name__ == "__main__":
    main()
