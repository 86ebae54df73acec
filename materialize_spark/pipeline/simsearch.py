"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run as JVM array lambdas (zip_with + aggregate), no Python.
  Scale: O(N) scan per query, embarrassingly parallel; for query batches,
  broadcast the queries and score in one pass.
- ``lsh_bucket_signature``: random-hyperplane LSH — the scale path.
  Hyperplane components are derived deterministically from md5 so any
  engine reproduces the same buckets. At 100 TB: bucket once (one scan),
  write bucketed/partitioned by signature, then a query probes only its
  bucket (+ neighbors for recall).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<double> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0).cast("double"), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(df: DataFrame, query_vec: list[float], *, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k against a constant query vector.

    Ordering is on the *rounded* similarity with id tiebreak, so the
    selected set is stable under float summation differences.
    """
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    emb = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(id_col), F.round(cosine(emb, q), 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplanes(num_planes: int, dims: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (j, i) is
    md5(f"{j}:{i}") first hex digit, centered to [-7.5, 7.5]."""
    return [
        [int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) - 7.5
         for i in range(dims)]
        for j in range(num_planes)
    ]


def lsh_bucket_signature(df: DataFrame, *, num_planes: int = 8, dims: int = 64,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """Sign-of-projection bit signature per row (the LSH bucket key)."""
    emb = F.col(vec_col).cast("array<double>")
    planes = hyperplanes(num_planes, dims)
    bits = [
        F.when(dot(emb, F.array(*[F.lit(w) for w in plane])) > 0, "1").otherwise("0")
        for plane in planes
    ]
    return df.select(F.col(id_col), F.concat(*bits).alias("bucket"))
