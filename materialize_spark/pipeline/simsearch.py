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


def cosine_pairs_blocked(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_out: int = 4,
) -> DataFrame:
    """All-pairs cosine >= threshold via blocked matrix multiplication.

    The JVM expression route (zip_with + aggregate per pair) evaluates
    higher-order functions interpreted — ~19s for 12.5M pairs at sf0.1 —
    and unrolling element_at sums falls out of codegen entirely (worse).
    Real linear algebra wants BLAS: broadcast the (n x d) normalized-id
    matrix once, then mapInPandas computes each partition's block product
    A_block @ B.T with numpy — Arrow batches in, one GEMM per block.
    Measured: ~19s -> ~1s at sf0.1. This is the standard sharded
    brute-force ANN layout: one side must fit in executor memory (2.5 MB
    here; ~3 GB at 5M x 64 floats), beyond that use the LSH-bucketed path
    (lsh_bucket_signature) to bound the candidate side.

    Emits (id_a, id_b, cos) with id_a < id_b, cos rounded to
    ``round_out``; the threshold is applied on the 6-decimal rounding so
    engine-vs-oracle float noise (BLAS reassociates sums) can't flip
    boundary pairs.
    """
    import numpy as np

    spark = df.sparkSession
    side = df.select(id_col, vec_col).toPandas()
    ids_all = side[id_col].to_numpy()
    mat = np.vstack(side[vec_col].to_numpy()).astype("float64")
    norms = np.linalg.norm(mat, axis=1)
    b_side = spark.sparkContext.broadcast((ids_all, mat, norms))

    def gen(batches):
        import pandas as pd

        ids_b, mat_b, norms_b = b_side.value
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            ids_a = pdf[id_col].to_numpy()
            cos = (a @ mat_b.T) / np.outer(np.linalg.norm(a, axis=1), norms_b)
            ia, ib = np.nonzero(np.round(cos, 6) >= threshold)
            keep = ids_a[ia] < ids_b[ib]
            yield pd.DataFrame({
                "id_a": ids_a[ia][keep],
                "id_b": ids_b[ib][keep],
                "cos": np.round(cos[ia, ib][keep], round_out),
            })

    return df.select(id_col, vec_col).mapInPandas(
        gen, "id_a long, id_b long, cos double")
