"""Training-data pipeline operators (no reference analog; Spark-native).

Large-scale corpus operations a 100 TB training-data pipeline needs:

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``simsearch``  — brute-force cosine top-k; hyperplane-LSH bucketing
- ``textstats``  — language ID, quality scoring, token counting,
                   fingerprinting
- ``multimodal`` — binary-column decode/feature plumbing (mapInPandas)

Design rules: everything is a DataFrame → DataFrame combinator built from
JVM expressions (array/lambda functions, no per-row Python) except where
numeric kernels genuinely need vectorized Python (Pandas UDF over Arrow).
Hashes are md5-based so results are engine-portable (the DuckDB oracle
computes identical values).
"""

from materialize_spark.pipeline.dedup import (
    exact_dedup, minhash_signatures, lsh_candidate_pairs, simhash, jaccard_pairs,
)
from materialize_spark.pipeline.simsearch import cosine_topk, lsh_bucket_signature
from materialize_spark.pipeline.textstats import (
    tokens_col, language_id, quality_metrics, fingerprint,
)

__all__ = [
    "exact_dedup", "minhash_signatures", "lsh_candidate_pairs", "simhash",
    "jaccard_pairs", "cosine_topk", "lsh_bucket_signature",
    "tokens_col", "language_id", "quality_metrics", "fingerprint",
]
