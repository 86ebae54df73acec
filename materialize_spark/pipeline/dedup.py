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
    md5(i ':' shingle).

    Physical shape: explode shingles, then groupBy(doc).min over all seeded
    hashes at once. The explode multiplies scan rows by ~|shingles|, but
    min() partial-aggregates map-side (one surviving row per doc per
    partition before the shuffle) and every expression stays inside
    whole-stage codegen. The tempting no-shuffle alternative — array
    lambdas (transform + array_min) — is 15-20x slower because Spark
    evaluates higher-order functions interpreted, outside codegen: measured
    32.6s vs ~2s for 5k docs x 8 hashes. Docs with < k tokens (empty
    shingle array) drop out at the explode, matching MinHash's undefined
    signature for empty sets."""
    sh = shingles_col(tokens, k)
    exploded = df.select(F.col(id_col), F.explode(sh).alias("__shingle"))
    sigs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("__shingle"))))
        .alias(f"sig{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*sigs)


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
    token-majority of md5 hex digit c's top bit.

    The token md5s are materialized ONCE into an intermediate projected
    column and every bit position reads from it — computing md5 inside
    each of the 16 per-bit lambdas re-hashed every token 16 times
    (higher-order lambdas are interpreted, so nothing deduplicated it);
    hoisting the hash is a measured 3.2x at sf0.1 and keeps the operator
    a pure scan-side projection — no shuffle at any scale."""
    def hexbit(c: int):
        # MUST be a 1-arg lambda: pyspark dispatches on lambda arity, and
        # a second (defaulted) parameter turns it into an (element, index)
        # lambda with the index bound over the default.
        return lambda h: F.when(
            F.substring(h, c, 1).isin(*"89abcdef"), 1).otherwise(-1)

    hashed = df.select(
        F.col(id_col), F.transform(tokens, lambda t: F.md5(t)).alias("__h"))
    bit_cols = []
    for c in range(1, bits + 1):
        contrib = F.transform(F.col("__h"), hexbit(c))
        bit_cols.append(
            F.when(F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x) > 0,
                   F.lit("1")).otherwise(F.lit("0")))
    return hashed.select(F.col(id_col), F.concat(*bit_cols).alias("simhash"))


def jaccard_pairs(df: DataFrame, tokens: Column, *, threshold: float = 0.6,
                  id_col: str = "doc_id",
                  candidates: DataFrame | None = None,
                  max_broadcast_bytes: int = 256 << 20) -> DataFrame:
    """Exact token-set Jaccard similarity for document pairs at or above
    ``threshold``.

    Candidate generation uses **prefix filtering** (the PPJoin family,
    lossless for threshold joins): order every doc's tokens by ascending
    global frequency and keep only the first ``sz - ceil(t*sz) + 1``
    tokens — two sets with Jaccard >= t MUST share a prefix token under a
    consistent total order, so joining prefixes instead of full postings
    loses no result pairs while shrinking the quadratic bucket sizes from
    "docs sharing any token" (all of them, for natural language) to "docs
    sharing a *rare* token". Verification then computes the exact
    intersection with array_intersect on the full token sets (codegen).
    Measured at sf0.1 (5k templated docs): 82.6s -> ~8s, identical output.

    With ``candidates`` (e.g. LSH pairs), only those pairs are verified.
    """
    from pyspark.sql import Window

    # One row per doc — materialized once (Let/CSE) and reused by the
    # postings explode and both verification sides.
    tok_arrays = df.select(
        F.col(id_col), F.array_distinct(tokens).alias("__ta")) \
        .localCheckpoint(eager=True)
    if candidates is None:
        toks = tok_arrays.select(
            F.col(id_col), F.size("__ta").alias("__sz"),
            F.explode(F.col("__ta")).alias("tok"))
        freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
        w = Window.partitionBy(id_col).orderBy("__df", "tok")
        prefix = (
            toks.join(F.broadcast(freq), on="tok")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= F.col("__sz")
                    - F.ceil(F.lit(threshold) * F.col("__sz")) + 1)
            .select(F.col(id_col), "tok")
            .localCheckpoint(eager=True)  # both join sides read this
        )
        # Same AQE bytes-vs-compute mismatch as the verify stage below:
        # postings rows are tiny but the self-join is the quadratic part,
        # so pin its parallelism with an explicit hash repartition on the
        # join key (both sides identically partitioned -> no extra
        # exchange inside the join).
        par = prefix.sparkSession.sparkContext.defaultParallelism
        pa = prefix.select(F.col(id_col).alias("doc_a"), "tok") \
            .repartition(par, "tok")
        pb = prefix.select(F.col(id_col).alias("doc_b"), "tok") \
            .repartition(par, "tok")
        candidates = (
            pa.join(pb, on="tok")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
    # The candidate stream is narrow (two ids/row), so AQE's byte-targeted
    # coalescing squeezes it onto 1-2 partitions — but the verify stage
    # below is COMPUTE-bound (array_intersect over full token sets per
    # pair), and on a 32-core box that serialized ~98% of the work
    # (measured 116s -> see PERF.md). Pin verify parallelism to the
    # cluster's cores explicitly; the extra shuffle moves ~16 bytes/pair.
    sess = candidates.sparkSession
    candidates = candidates.repartition(
        sess.sparkContext.defaultParallelism, "doc_a", "doc_b")
    ta = tok_arrays.select(F.col(id_col).alias("doc_a"),
                           F.col("__ta").alias("__ta_a"))
    tb = tok_arrays.select(F.col(id_col).alias("doc_b"),
                           F.col("__ta").alias("__ta_b"))
    # Join strategy for the verification lookups, budget-gated like
    # cosine_pairs_blocked (simsearch.py): under budget, broadcast the
    # per-doc arrays (the candidate stream is the huge side, up to
    # O(pairs), and Catalyst's unknown-size estimate for the derived
    # array table would otherwise pick a 2-sided shuffle join). Over
    # budget — at corpus scale the token arrays are terabytes, far past
    # Spark's broadcast ceiling — pin SHUFFLE_HASH on the array side:
    # candidates hash-partition by doc_a/doc_b (already pre-shuffled on
    # those keys above) and each array row ships exactly once, no sort,
    # no driver-side hash relation. Decoded-bytes estimate, not on-disk:
    # one agg over the already-checkpointed tok_arrays.
    stats = tok_arrays.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.size("__ta")), F.lit(0)).alias("ntok"),
        F.coalesce(F.sum(F.aggregate(
            F.transform("__ta", lambda t: F.length(t)),
            F.lit(0).cast("long"), lambda a, x: a + x)), F.lit(0))
        .alias("chars"),
    ).first()
    # UnsafeArrayData layout: ~32 B/row header + ~24 B/token slot + chars
    est_bytes = stats.n * 32 + stats.ntok * 24 + stats.chars * 2
    if est_bytes <= max_broadcast_bytes:
        ta, tb = F.broadcast(ta), F.broadcast(tb)
    else:
        ta, tb = ta.hint("shuffle_hash"), tb.hint("shuffle_hash")
    return (
        candidates.join(ta, on="doc_a")
        .join(tb, on="doc_b")
        .withColumn("common",
                    F.size(F.array_intersect("__ta_a", "__ta_b")))
        .withColumn("jaccard", F.col("common") /
                    (F.size("__ta_a") + F.size("__ta_b") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def dedup_components(pairs: DataFrame, ids: DataFrame, *,
                     id_col: str = "doc_id", src: str = "id_a",
                     dst: str = "id_b", max_iter: int = 50) -> DataFrame:
    """Connected components over a near-duplicate pair graph: the step that
    turns pairwise candidates (LSH / Jaccard / cosine output) into dedup
    *clusters* with one canonical representative each.

    Algorithm: min-label propagation — every node starts labeled with its
    own id; each round every node takes the min label among itself and its
    neighbors; fixpoint = per-component min id (the reference's fixpoint
    machinery is MIR LetRec, src/expr/src/relation.rs:154 — this is that
    loop over Spark jobs, operators/letrec.let_rec).

    Scale: one join + one groupBy per round, converging in
    O(graph diameter) rounds — near-dup graphs are overwhelmingly tiny
    cliques, so 2-3 rounds in practice; every round is a keyed shuffle,
    no driver-side data.
    """
    from materialize_spark.operators.letrec import let_rec

    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"),
                                  F.col(src).alias("b")))
        .distinct()
    )
    labels0 = ids.select(F.col(id_col).alias("node"),
                         F.col(id_col).alias("label"))

    def step(cur):
        lbl = cur["labels"]
        neighbor_min = (
            edges.join(lbl.withColumnRenamed("node", "b")
                          .withColumnRenamed("label", "nlabel"), on="b")
            .groupBy("a").agg(F.min("nlabel").alias("nlabel"))
            .withColumnRenamed("a", "node")
        )
        nxt = (
            lbl.join(neighbor_min, on="node", how="left")
            .select("node", F.least(
                F.col("label"),
                F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"))
        )
        return {"labels": nxt}

    out = let_rec({"labels": labels0}, step, distinct=False,
                  max_iter=max_iter)
    return out["labels"].select(F.col("node").alias(id_col),
                                F.col("label").alias("cluster_id"))


def contamination_check(docs: DataFrame, benchmark: DataFrame, *,
                        tokens_col_name: str = "tokens", k: int = 3,
                        id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    k-gram shingle with an evaluation/benchmark corpus — the standard
    pre-training hygiene step (contaminated docs leak test answers).

    Both sides reduce to distinct shingle md5s; the check is one
    broadcast-able semi-join on the hash followed by a per-doc count:
    O(docs + benchmark), no quadratic pairing. Returns per-document
    (doc_id, n_hits, contaminated)."""
    doc_sh = (
        docs.select(F.col(id_col),
                    F.explode(F.array_distinct(
                        shingles_col(F.col(tokens_col_name), k=k)))
                    .alias("sh"))
        .select(id_col, F.md5("sh").alias("h"))
    )
    bench_sh = (
        benchmark.select(F.explode(F.array_distinct(
            shingles_col(F.col(tokens_col_name), k=k))).alias("sh"))
        .select(F.md5("sh").alias("h")).distinct()
    )
    hits = (doc_sh.join(F.broadcast(bench_sh), on="h")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits")))
    return (docs.select(id_col).distinct()
            .join(hits, on=id_col, how="left")
            .select(id_col,
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                    .alias("contaminated")))
