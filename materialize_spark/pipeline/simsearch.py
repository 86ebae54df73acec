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


# Driver-collect budget for the blocked-GEMM path. Beyond this the broadcast
# side cannot safely live on the driver/executors and the bucketed LSH path
# takes over automatically (candidate generation instead of all-pairs).
MAX_COLLECT_BYTES = 256 << 20


def cosine_pairs_lsh_bucketed(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_out: int = 4,
    num_planes: int = 8,
) -> DataFrame:
    """Near-pairs at scale: hyperplane-LSH bucket, exact GEMM within bucket.

    Only pairs sharing an ``num_planes``-bit signature are compared: one
    shuffle on the bucket key, a per-bucket numpy GEMM, no driver collect
    and no all-pairs blowup. Recall is approximate (cross-bucket pairs are
    missed — standard candidate-generation semantics; raise recall by
    lowering ``num_planes`` or probing neighbor signatures). This is the
    100 TB path ``cosine_pairs_blocked`` falls back to when the embedding
    side exceeds its collect budget.
    """
    import numpy as np
    import pandas as pd

    dims = df.select(F.size(F.col(vec_col))).first()[0]
    sig = lsh_bucket_signature(df, num_planes=num_planes, dims=dims,
                               vec_col=vec_col, id_col=id_col)
    data = df.select(id_col, vec_col).join(sig, on=id_col)

    def per_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({
            "id_a": np.array([], dtype="int64"),
            "id_b": np.array([], dtype="int64"),
            "cos": np.array([], dtype="float64"),
        })
        if len(pdf) < 2:
            return empty
        mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
        ids = pdf[id_col].to_numpy()
        nrm = np.linalg.norm(mat, axis=1)
        cos = (mat @ mat.T) / np.outer(nrm, nrm)
        ia, ib = np.nonzero(np.round(cos, 6) >= threshold)
        keep = ids[ia] < ids[ib]
        if not keep.any():
            return empty
        return pd.DataFrame({
            "id_a": ids[ia][keep],
            "id_b": ids[ib][keep],
            "cos": np.round(cos[ia, ib][keep], round_out),
        })

    return data.groupBy("bucket").applyInPandas(
        per_bucket, "id_a long, id_b long, cos double")


def cosine_pairs_blocked(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_out: int = 4,
    max_collect_bytes: int = MAX_COLLECT_BYTES,
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
    here; ~3 GB at 5M x 64 floats). A size guard estimates the collect
    footprint and automatically reroutes to
    ``cosine_pairs_lsh_bucketed`` above ``max_collect_bytes`` — the
    all-pairs GEMM is a small-data privilege, never a scale plan.

    Emits (id_a, id_b, cos) with id_a < id_b, cos rounded to
    ``round_out``; the threshold is applied on the 6-decimal rounding so
    engine-vs-oracle float noise (BLAS reassociates sums) can't flip
    boundary pairs.
    """
    import numpy as np

    spark = df.sparkSession
    # Size guard: the broadcast side must fit on the driver. Estimate bytes
    # from row count x (id + dims doubles); above budget, route to the
    # LSH-bucketed candidate path instead of OOMing at scale.
    n_rows = df.count()
    first_sz = df.select(F.size(F.col(vec_col))).first()
    dims = (first_sz[0] or 0) if first_sz else 0
    est_bytes = n_rows * (24 + dims * 8)
    if est_bytes > max_collect_bytes:
        return cosine_pairs_lsh_bucketed(
            df, id_col=id_col, vec_col=vec_col,
            threshold=threshold, round_out=round_out)
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


def quantized(vec_col: Column, scale: int = 1000) -> Column:
    """Embedding elements quantized to BIGINT (round(x * scale)).

    Integer dot products are *exact* in any engine, and IEEE
    division/sqrt of identical integer-derived doubles is bit-identical —
    so cosine ranking over quantized vectors is deterministic across Spark
    and the DuckDB oracle, with no float-tie risk. At 3-decimal
    quantization of unit-scale embeddings the ranking error is ~1e-3 —
    irrelevant for coarse IVF routing (production keeps the float vectors
    for final re-ranking). The float32 element is widened to double before
    scaling so both engines round the identical value."""
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * scale).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two BIGINT arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


def int_cosine(a: Column, b: Column) -> Column:
    """Cosine from exact integer dots — bit-stable across engines."""
    return (int_dot(a, b).cast("double")
            / (F.sqrt(int_dot(a, a).cast("double"))
               * F.sqrt(int_dot(b, b).cast("double"))))


def ivf_search(
    df: DataFrame,
    *,
    k_clusters: int = 16,
    nprobe: int = 4,
    n_queries: int = 3,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbor search.

    Build: every vector is assigned to its nearest of ``k_clusters``
    centroids (deterministically the k_clusters smallest-id vectors;
    production would refine with Lloyd/KMeans — the routing machinery is
    identical). Search: each query probes only its ``nprobe`` nearest
    clusters and ranks candidates by exact cosine within them — the
    partition-pruning trade that makes brute-force affordable: scored
    rows shrink by ~nprobe/k_clusters.

    Scale shape: assignment is a broadcast-join of the K-row centroid
    table (no shuffle of the big side beyond the cluster-key grouping);
    the probe join touches only probed clusters' partitions. Quantized
    integer cosine keeps ranking deterministic (see ``quantized``).
    """
    from pyspark.sql import Window

    q = df.select(F.col(id_col), quantized(F.col(vec_col)).alias("__qv"))
    q = q.localCheckpoint(eager=True)  # reused: centroids, assignment, queries
    cen = (q.orderBy(id_col).limit(k_clusters)
           .select(F.col(id_col).alias("cid"), F.col("__qv").alias("__cv")))

    sim = F.round(int_cosine(F.col("__qv"), F.col("__cv")), 9)
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("__sim"), "cid")
    assign = (
        q.crossJoin(F.broadcast(cen))
        .withColumn("__sim", sim)
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("__qv"), F.col("cid").alias("cluster"))
    )

    queries = (q.orderBy(id_col).limit(n_queries)
               .select(F.col(id_col).alias("qid"), F.col("__qv").alias("__query")))
    w_probe = Window.partitionBy("qid").orderBy(F.desc("__sim"), "cid")
    probes = (
        queries.crossJoin(F.broadcast(cen))
        .withColumn("__sim", F.round(int_cosine(F.col("__query"), F.col("__cv")), 9))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select("qid", "__query", F.col("cid").alias("cluster"))
    )

    w_rank = Window.partitionBy("qid").orderBy(F.desc("__cos"), id_col)
    return (
        probes.join(assign, on="cluster")
        .withColumn("__cos", F.round(int_cosine(F.col("__query"), F.col("__qv")), 9))
        .withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") <= k)
        .select("qid", F.col(id_col),
                F.round("__cos", 4).alias("cos"))
    )


def ivf_write_index(df: DataFrame, path: str, *, k_clusters: int = 16,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Persist the inverted file: vectors written as parquet PARTITIONED BY
    their nearest-centroid id, centroids alongside. This is the on-disk
    layout that makes ANN affordable at 100 TB: a probe reads only
    nprobe/k_clusters of the directories (Spark partition pruning — the
    probe's plan shows PartitionFilters on `cluster`), so index build is
    one broadcast-join pass and search I/O is proportional to nprobe, not
    corpus size. Same centroid scheme as ivf_search (deterministic
    smallest-id seeds, quantized integer cosine)."""
    from pyspark.sql import Window

    q = df.select(F.col(id_col), quantized(F.col(vec_col)).alias("qv"))
    cen = (q.orderBy(id_col).limit(k_clusters)
           .select(F.col(id_col).alias("cid"), F.col("qv").alias("cv")))
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), "cid")
    assign = (
        q.crossJoin(F.broadcast(cen))
        .withColumn("__sim", F.round(int_cosine(F.col("qv"), F.col("cv")), 9))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "qv", F.col("cid").alias("cluster"))
    )
    assign.write.mode("overwrite").partitionBy("cluster") \
        .parquet(f"{path}/vectors")
    cen.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_probe_index(spark, path: str, *, nprobe: int = 4, n_queries: int = 3,
                    k: int = 10, id_col: str = "vec_id") -> DataFrame:
    """Probe a persisted IVF index: route each query to its nprobe nearest
    centroids (the K-row centroid table is driver-resident metadata, as in
    any ANN system), then scan ONLY those cluster partitions and rank by
    exact quantized cosine. Emits (qid, vec_id, cos) identical to the
    in-memory ivf_search for the same parameters."""
    from pyspark.sql import Window

    cen = spark.read.parquet(f"{path}/centroids")
    vectors = spark.read.parquet(f"{path}/vectors")
    queries = (vectors.select(F.col(id_col), F.col("qv"))
               .orderBy(id_col).limit(n_queries)
               .select(F.col(id_col).alias("qid"), F.col("qv").alias("query")))
    w_probe = Window.partitionBy("qid").orderBy(F.desc("__sim"), "cid")
    probes = (
        queries.crossJoin(F.broadcast(cen))
        .withColumn("__sim", F.round(int_cosine(F.col("query"), F.col("cv")), 9))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select("qid", "query", "cid")
    )
    # literal cluster list → the vectors scan prunes to probed partitions
    probed = {int(r.cid) for r in probes.select("cid").distinct().collect()}
    candidates = vectors.filter(F.col("cluster").isin(*probed))
    w_rank = Window.partitionBy("qid").orderBy(F.desc("__cos"), id_col)
    return (
        probes.join(candidates,
                    probes["cid"] == candidates["cluster"])
        .withColumn("__cos", F.round(int_cosine(F.col("query"), F.col("qv")), 9))
        .withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") <= k)
        .select("qid", F.col(id_col), F.round("__cos", 4).alias("cos"))
    )


# -- scalar quantization (SQ8) ----------------------------------------------

def sq8_train(df: DataFrame, *, dims: int = 64,
              vec_col: str = "embedding") -> tuple[list[float], list[float]]:
    """Per-dimension [min, max] over the corpus — the SQ8 'codebook'.

    One aggregation of 2*dims min/max columns — map-side partial
    aggregation before a single-row shuffle, so at 100 TB this is one
    combined pass; the codebook is bytes-sized and broadcasts anywhere.
    """
    emb = F.col(vec_col).cast("array<double>")
    row = df.agg(
        *[F.min(emb[i]).alias(f"lo{i}") for i in range(dims)],
        *[F.max(emb[i]).alias(f"hi{i}") for i in range(dims)],
    ).first()
    return ([row[f"lo{i}"] for i in range(dims)],
            [row[f"hi{i}"] for i in range(dims)])


def sq8_encode(df: DataFrame, lo: list[float], hi: list[float], *,
               vec_col: str = "embedding", code_col: str = "code") -> DataFrame:
    """Quantize each vector to per-dimension 8-bit codes:
    code_i = round(255 * (x_i - lo_i) / (hi_i - lo_i)), clamped to [0,255].

    4x memory compression vs float32 (16x vs float64) — the scale lever
    that keeps a 100 TB embedding corpus scannable from memory. Pure
    column expressions; constant-width degenerate dims encode as 0.
    """
    emb = F.col(vec_col).cast("array<double>")
    lo_a = F.array(*[F.lit(float(v)) for v in lo])
    span = F.array(*[F.lit(float(h - l) if h > l else 1.0)
                     for l, h in zip(lo, hi)])
    scaled = F.zip_with(F.zip_with(emb, lo_a, lambda x, l: x - l), span,
                        lambda d, s: d / s)
    # floor(x*255 + 0.5): explicit half-up rounding — identical across
    # engines (round() half-rule conventions differ between engines).
    code = F.transform(
        scaled,
        lambda f: F.least(F.lit(255),
                          F.greatest(F.lit(0),
                                     F.floor(f * 255 + 0.5).cast("int"))))
    return df.withColumn(code_col, code)


def sq8_decode_col(code: Column, lo: list[float], hi: list[float]) -> Column:
    """Reconstruct approximate doubles from codes (for scoring)."""
    lo_a = F.array(*[F.lit(float(v)) for v in lo])
    span = F.array(*[F.lit(float(h - l) if h > l else 1.0)
                     for l, h in zip(lo, hi)])
    return F.zip_with(
        F.zip_with(code, span, lambda c, s: c.cast("double") / 255.0 * s),
        lo_a, lambda x, l: x + l)


def sq8_cosine_topk(df: DataFrame, query_vec: list[float],
                    lo: list[float], hi: list[float], *, k: int = 10,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Approximate cosine top-k over SQ8 codes: encode the corpus, score
    the query against *decoded* codes (asymmetric distance — the query
    stays full-precision), exact ordering on the rounded score."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    coded = sq8_encode(df, lo, hi, vec_col=vec_col)
    approx = sq8_decode_col(F.col("code"), lo, hi)
    return (
        coded.select(F.col(id_col),
                     F.round(cosine(approx, q), 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )
