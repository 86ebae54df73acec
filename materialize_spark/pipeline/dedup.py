"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of each algorithm at 100 TB):
- exact: one hash-shuffle on md5(normalized text) — groups co-located,
  canonical representative = min doc_id per group.
- MinHash+LSH: per-doc signatures are computed scan-side with array
  lambdas (no explode of the shingle set → no |shingles| blowup);
  candidate generation shuffles only (band, bucket) pairs, so the
  quadratic step is confined to same-bucket collisions.
- SimHash: 16-bit signature scan-side; near-dup buckets = equal signature.
- n-gram Jaccard: exact pairwise verification for candidate pairs —
  token-postings self-join; at scale you run it only on LSH candidates.

All hashes are md5 (portable across engines; the DuckDB oracle reproduces
them bit-for-bit). MinHash uses the *lexicographic min of seeded md5
hex digests* — uniform enough for Jaccard estimation and trivially
portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(text: Column) -> Column:
    """Canonical form for dedup: lowercase, strip non-alphanumerics,
    collapse whitespace."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " "), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups over normalized text.

    Returns one row per content group: canonical (min) id, group size.
    """
    h = F.md5(normalize_text(F.col(text_col))).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"),
             F.count(F.lit(1)).alias("group_size"))
    )


def shingles_col(tokens: Column, k: int = 3) -> Column:
    """Word k-gram shingle array from a token array (docs shorter than k
    tokens yield an empty array)."""
    n = F.size(tokens)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(tokens, i + j) for j in range(k)]))


def minhash_signatures(df: DataFrame, tokens: Column, *, num_hashes: int = 8,
                       k: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature: sig_i = min over shingles of
    md5(i ':' shingle). Computed entirely scan-side (array lambdas)."""
    sh = shingles_col(tokens, k)

    # NB: a two-parameter lambda would make Spark pass the element *index*
    # as the second argument — bind the seed via a factory instead.
    def seeded(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    sigs = [
        F.array_min(F.transform(sh, seeded(i))).alias(f"sig{i}")
        for i in range(num_hashes)
    ]
    return df.select(F.col(id_col), *sigs).filter(F.col("sig0").isNotNull())


def lsh_candidate_pairs(sig_df: DataFrame, *, num_hashes: int = 8,
                        band_size: int = 2, id_col: str = "doc_id") -> DataFrame:
    """LSH banding: docs agreeing on all hashes of any band are candidates.

    Shuffles (band_index, band_hash) — the quadratic join happens only
    within buckets. Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    """
    n_bands = num_hashes // band_size
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"sig{b * band_size + j}")
                                     for j in range(band_size)])).alias("bucket"),
        )
        for b in range(n_bands)
    ])
    exploded = sig_df.select(F.col(id_col), F.explode(bands).alias("bb")) \
        .select(id_col, "bb.band", "bb.bucket")
    a = exploded.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = exploded.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(df: DataFrame, tokens: Column, *, bits: int = 16,
            id_col: str = "doc_id") -> DataFrame:
    """SimHash signature as a bit string: bit c is the sign of the
    token-majority of md5 hex digit c's top bit."""
    def hexbit(c: int):
        # single-parameter lambda (see minhash_signatures note)
        return lambda t: F.when(
            F.substring(F.md5(t), c, 1).isin(*"89abcdef"), 1).otherwise(-1)

    bit_cols = []
    for c in range(1, bits + 1):
        contrib = F.transform(tokens, hexbit(c))
        bit_cols.append(
            F.when(F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x) > 0,
                   F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col), F.concat(*bit_cols).alias("simhash"))


def jaccard_pairs(df: DataFrame, tokens: Column, *, threshold: float = 0.6,
                  id_col: str = "doc_id",
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact token-set Jaccard similarity for document pairs.

    Without ``candidates``, all same-token pairs are considered (postings
    self-join); with it, only the given (doc_a, doc_b) pairs are verified —
    the LSH-then-verify scale path.
    """
    toks = df.select(F.col(id_col), F.explode(F.array_distinct(tokens)).alias("tok"))
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = toks.select(F.col(id_col).alias("doc_a"), "tok")
    b = toks.select(F.col(id_col).alias("doc_b"), "tok")
    common = (
        a.join(b, on="tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if candidates is not None:
        common = common.join(candidates, on=["doc_a", "doc_b"], how="left_semi")
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, on="doc_a").join(sb, on="doc_b")
        .withColumn("jaccard", F.col("common")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
