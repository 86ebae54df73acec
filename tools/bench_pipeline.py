"""Throughput benchmark for the training-data pipeline operators.

Separate from bench.py (the driver contract) so the headline metric stays
comparable across rounds. Prints one JSON line with per-operator wall time
and rows/sec at the given scale factor.

Usage: python tools/bench_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PIPELINE = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "dedup_spans",
    "pipeline_sample_temperature",
    "simsearch_cosine_topk", "simsearch_lsh_buckets", "simsearch_ivf",
    "text_language_id", "text_quality", "text_token_counts",
    "text_fingerprint", "multimodal_features",
    "pipeline_cluster_kmeans", "text_tfidf_topterms",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from materialize_spark.queries import load_all
    from materialize_spark.session import get_spark

    registry = load_all()
    spark = get_spark("bench-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {}
    for name in PIPELINE:
        if name not in registry:
            continue
        fn = registry[name].fn
        fn(spark, sf_dir).count()  # warm (codegen + shuffle services)
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        results[name] = {"sec": round(best, 3), "out_rows": rows}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({"metric": "pipeline_ops", "sf": sf, "ops": results,
                      "total_sec": round(sum(r["sec"] for r in results.values()), 3)}))


if __name__ == "__main__":
    main()
