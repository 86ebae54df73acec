"""Corpus clustering: Lloyd's k-means over an embedding column.

A training-data-curation staple (domain discovery, stratified corpus
mixing, near-duplicate cluster pruning) and the engine's iterative-
algorithm representative alongside LetRec: per iteration, assignment is
a broadcast of the K-row centroid table against the corpus (one scan),
and the centroid update is one groupBy(cluster) aggregation with
map-side partial means — O(iters) passes, no all-pairs work, the only
shuffle keyed on K values. The K-row centroid collect between
iterations is driver-resident metadata, the same budget class as the
IVF centroid routing (simsearch.py).

Determinism contract (mirrored by the DuckDB oracle in
queries/pipeline.py): initial centroids are the k smallest-id vectors;
distances are sequential double sums over dimensions (F.aggregate /
list_sum both fold left-to-right); ties pick the lowest cluster id;
per-dimension means are rounded to 6 decimals each iteration so
summation-order noise cannot flip a later assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _sqdist(vec: Column, centroid: list[float]) -> Column:
    """Sequential left-to-right squared-L2 sum (matches list_sum)."""
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec.cast("array<double>"), arr,
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(df: DataFrame, centroids: list[tuple[int, list[float]]],
                    vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment; ties go to the lowest cluster id.

    Centroids embed as plan literals — right for K up to the hundreds
    (plan size is K x dims doubles). Past that, switch to a broadcast
    join against a centroid TABLE with a per-row argmin, the
    ivf_search routing shape (simsearch.py:254)."""
    cents = sorted(centroids)
    dists = F.array(*[_sqdist(F.col(vec_col), v) for _cid, v in cents])
    idx = F.array_position(dists, F.array_min(dists)).cast("int") - 1
    ids = F.array(*[F.lit(int(cid)) for cid, _v in cents])
    return df.withColumn("cluster", F.element_at(ids, idx + 1))


def kmeans(df: DataFrame, *, k: int = 4, iters: int = 2, dims: int = 64,
           id_col: str = "vec_id", vec_col: str = "embedding",
           ) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """(assignments, final centroids) after ``iters`` Lloyd iterations.

    Assignments carry the labels of the LAST assignment pass; the
    returned centroids are the means of that pass (rounded), i.e. one
    final update beyond the last assignment — exactly what the oracle
    computes."""
    if iters < 1:
        raise ValueError("kmeans needs at least one iteration")
    base = df.select(id_col, vec_col)
    init_rows = (base.orderBy(id_col).limit(k).collect())
    centroids = [(i, [float(x) for x in r[vec_col]])
                 for i, r in enumerate(init_rows)]

    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(base, centroids, vec_col)
        mean_cols = [
            F.round(F.avg(F.element_at(F.col(vec_col), i).cast("double")),
                    6).alias(f"c{i}")
            for i in range(1, dims + 1)
        ]
        rows = assigned.groupBy("cluster").agg(*mean_cols).collect()
        centroids = sorted(
            (int(r["cluster"]), [float(r[f"c{i}"])
                                 for i in range(1, dims + 1)])
            for r in rows)
    return assigned, centroids
