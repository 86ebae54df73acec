"""Tests for the training-data pipeline operators."""

import hashlib

from pyspark.sql import functions as F

from materialize_spark.pipeline.dedup import (
    exact_dedup, jaccard_pairs, lsh_candidate_pairs, minhash_signatures,
    normalize_text, simhash,
)
from materialize_spark.pipeline.multimodal import (
    documents_as_media, extract_features,
)
from materialize_spark.pipeline.simsearch import cosine_topk, lsh_bucket_signature
from materialize_spark.pipeline.textstats import fingerprint, language_id, tokens_col
from materialize_spark.catalog import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(spark):
    df = _docs(spark, [(1, "Hello, World!"), (2, "hello   world"),
                       (3, "something else")])
    groups = exact_dedup(df)
    sizes = {r.canonical_id: r.group_size for r in groups.collect()}
    assert sizes == {1: 2, 3: 1}  # punctuation/case/ws-insensitive match


def test_minhash_identical_docs_always_candidates(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(spark, [(1, text), (2, text), (3, "completely different words "
                                                 "nothing shared at all here")])
    toks = F.split(normalize_text(F.col("text")), " ")
    sigs = minhash_signatures(df.withColumn("tokens", toks), F.col("tokens"))
    pairs = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_short_docs_dropped(spark):
    df = _docs(spark, [(1, "two words"), (2, "a b c d e")])
    toks = F.split(normalize_text(F.col("text")), " ")
    sigs = minhash_signatures(df.withColumn("tokens", toks), F.col("tokens"))
    assert [r.doc_id for r in sigs.collect()] == [2]  # <3 tokens -> no shingles


def test_simhash_similar_docs_close(spark):
    df = _docs(spark, [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
                       (3, "x1 y2 z3 w4 v5 u6")])
    toks = F.split(normalize_text(F.col("text")), " ")
    out = {r.doc_id: r.simhash for r in
           simhash(df.withColumn("tokens", toks), F.col("tokens")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert len(out[1]) == 16 and set(out[1]) <= {"0", "1"}


def test_jaccard_pairs_exact_value(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b c e"), (3, "z")])
    toks = F.split(normalize_text(F.col("text")), " ")
    out = jaccard_pairs(df.withColumn("tokens", toks), F.col("tokens"),
                        threshold=0.5)
    rows = {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}
    assert rows == {(1, 2): 0.6}  # |{a,b,c}| / |{a,b,c,d,e}|


def test_jaccard_verify_over_budget_shuffles(spark):
    """Scale guard (VERDICT r5 #1): past the byte budget the verification
    joins must NOT broadcast the per-doc token-array table (terabytes at
    corpus scale, over Spark's 8 GB broadcast ceiling) — they pin
    SHUFFLE_HASH instead, and the output is identical."""
    df = _docs(spark, [(1, "a b c d"), (2, "a b c e"), (3, "z"),
                       (4, "p q r"), (5, "p q r s")])
    toks = F.split(normalize_text(F.col("text")), " ")
    with_toks = df.withColumn("tokens", toks)
    small = jaccard_pairs(with_toks, F.col("tokens"), threshold=0.5)
    big = jaccard_pairs(with_toks, F.col("tokens"), threshold=0.5,
                        max_broadcast_bytes=0)
    assert sorted(map(tuple, small.collect())) \
        == sorted(map(tuple, big.collect()))
    # plan shape: over budget, the verify joins carry no BroadcastExchange
    big.collect()  # let AQE finalize
    final = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in final
    assert "ShuffledHashJoin" in final
    # and under budget the broadcast fast path is still chosen
    small.collect()
    fast = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in fast


def test_cosine_topk_self_is_top(spark):
    emb = load_tables(spark, SF_DIR)["embeddings"]
    q = emb.orderBy("vec_id").first()
    out = cosine_topk(emb, list(q.embedding), k=3).collect()
    assert out[0].vec_id == q.vec_id and abs(out[0].cosine_sim - 1.0) < 1e-5


def test_lsh_bucket_signature_shape(spark):
    emb = load_tables(spark, SF_DIR)["embeddings"]
    out = lsh_bucket_signature(emb.limit(50)).collect()
    assert all(len(r.bucket) == 8 and set(r.bucket) <= {"0", "1"} for r in out)


def test_language_id_and_fingerprint(spark):
    df = _docs(spark, [(1, "the cat sat on the mat in the sun"),
                       (2, "xyzzy plugh quux")])
    out = df.select("doc_id",
                    language_id(tokens_col(F.col("text"))).alias("lang"),
                    fingerprint(F.col("text")).alias("fp")).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].lang == "en" and by_id[2].lang == "unknown"
    assert by_id[1].fp != by_id[2].fp


def test_multimodal_feature_extraction(spark):
    docs = load_tables(spark, SF_DIR)["documents"].limit(20)
    feats = extract_features(documents_as_media(docs)).collect()
    assert len(feats) == 20
    src = {r.doc_id: r.text for r in docs.collect()}
    for r in feats:
        payload = src[r.media_id].encode()
        assert r.n_bytes == len(payload)
        assert r.checksum == hashlib.md5(payload).hexdigest()
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-4  # stub normalizes to sum 1


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe == k_clusters searches every partition -> must equal the
    unpartitioned top-k exactly (IVF loses nothing when probing all)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from materialize_spark.pipeline.simsearch import (
        int_cosine, ivf_search, quantized,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    full = ivf_search(emb, k_clusters=8, nprobe=8, n_queries=2, k=5)

    q = emb.select("vec_id", quantized(F.col("embedding")).alias("v"))
    queries = (q.orderBy("vec_id").limit(2)
               .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round(int_cosine(F.col("qv"), F.col("v")), 9)), "vec_id")
    brute = (queries.crossJoin(q)
             .withColumn("rn", F.row_number().over(w)).filter("rn <= 5")
             .select("qid", "vec_id"))
    assert (sorted((r.qid, r.vec_id) for r in full.collect())
            == sorted((r.qid, r.vec_id) for r in brute.collect()))


def test_ivf_partial_probe_is_subset_of_corpus_clusters(spark):
    from materialize_spark.pipeline.simsearch import ivf_search
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    res = ivf_search(emb, k_clusters=8, nprobe=2, n_queries=2, k=5)
    rows = res.collect()
    assert len(rows) == 10  # 2 queries x top-5
    per_q = {r.qid for r in rows}
    assert len(per_q) == 2


def test_multimodal_resize_shape(spark):
    from materialize_spark.pipeline.multimodal import (
        documents_as_media, resize_media,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    out = resize_media(documents_as_media(docs), width=8, height=8)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.payload) == 64 and r.width == 8 for r in rows)


def test_multimodal_frame_sampling_one_to_many(spark):
    from materialize_spark.pipeline.multimodal import (
        documents_as_media, sample_frames,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    media = documents_as_media(docs)
    frames = sample_frames(media, frame_bytes=100, max_frames=3)
    per = frames.groupBy("media_id").count().collect()
    assert len(per) == 20
    assert all(1 <= r["count"] <= 3 for r in per)
    # frame 0 of each media is the payload prefix
    f0 = frames.filter("frame_idx = 0").count()
    assert f0 == 20


def test_cosine_pairs_size_guard_falls_back_to_lsh(spark):
    """Above the collect budget, cosine_pairs_blocked must reroute to the
    LSH-bucketed path (no driver collect) and yield a subset of all-pairs."""
    from materialize_spark.pipeline.simsearch import (
        cosine_pairs_blocked, cosine_pairs_lsh_bucketed)
    emb = load_tables(spark, SF_DIR)["embeddings"]
    exact = {(r.id_a, r.id_b)
             for r in cosine_pairs_blocked(emb, threshold=0.4).collect()}
    forced = {(r.id_a, r.id_b)
              for r in cosine_pairs_blocked(
                  emb, threshold=0.4, max_collect_bytes=1).collect()}
    direct = {(r.id_a, r.id_b)
              for r in cosine_pairs_lsh_bucketed(emb, threshold=0.4).collect()}
    assert forced == direct, "guard did not route to the bucketed path"
    assert forced <= exact, "candidate pairs must be a subset of all-pairs"


def test_dedup_components_chain(spark):
    """A chain a-b, b-c plus an isolated node collapses to 2 clusters."""
    from materialize_spark.pipeline.dedup import dedup_components
    ids = spark.createDataFrame([(1,), (2,), (3,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([(2, 1), (3, 2)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in dedup_components(pairs, ids).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_pack_sequences_semantics(spark):
    """Documents span window boundaries; windows are per-shard contiguous."""
    from materialize_spark.pipeline.packing import pack_sequences
    df = spark.createDataFrame([(i, "x") for i in range(1, 9)],
                               "doc_id long, text string")
    out = pack_sequences(df, F.lit(600), capacity=1000,
                         num_shards=1).collect()
    by_id = {r.doc_id: r for r in sorted(out, key=lambda r: r.doc_id)}
    # doc1: tokens 1-600 → window 0; doc2: 601-1200 → spans windows 0-1
    assert (by_id[1].first_window, by_id[1].last_window) == (0, 0)
    assert (by_id[2].first_window, by_id[2].last_window) == (0, 1)
    # cumulative sums are per-shard contiguous
    assert by_id[8].cum_tokens == 8 * 600


def test_sample_fraction_deterministic(spark):
    from materialize_spark.pipeline.packing import sample_fraction
    docs = load_tables(spark, SF_DIR)["documents"]
    a = {r.doc_id for r in sample_fraction(docs, 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in sample_fraction(docs, 0.3).select("doc_id").collect()}
    assert a == b and 0 < len(a) < docs.count()
    # salt gives an independent (different) split at the same rate
    c = {r.doc_id for r in sample_fraction(docs, 0.3, salt="v2")
         .select("doc_id").collect()}
    assert c != a
    # sampling nests: a lower rate is a subset of a higher rate
    d = {r.doc_id for r in sample_fraction(docs, 0.1).select("doc_id").collect()}
    assert d <= a


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The persisted IVF probe must read only the probed cluster
    partitions: the scan carries partition filters on `cluster`, and the
    files feeding the plan come from the probed directories only."""
    from materialize_spark.pipeline.simsearch import (
        ivf_probe_index, ivf_write_index)
    emb = load_tables(spark, SF_DIR)["embeddings"]
    path = str(tmp_path / "ivf")
    ivf_write_index(emb, path, k_clusters=8)
    out = ivf_probe_index(spark, path, nprobe=2, n_queries=2, k=5)
    rows = out.collect()
    assert 0 < len(rows) <= 10
    vectors = spark.read.parquet(f"{path}/vectors")
    n_clusters = vectors.select("cluster").distinct().count()
    pruned = vectors.filter(vectors.cluster.isin(0, 1))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the cluster predicate must be a partition filter on the scan (pruned
    # at file listing), not a post-scan data filter
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert n_clusters > 2
    # and the pruned read returns exactly those clusters' rows
    per_cluster = {r.cluster: r.n for r in vectors.groupBy("cluster")
                   .count().withColumnRenamed("count", "n").collect()}
    assert pruned.count() == per_cluster.get(0, 0) + per_cluster.get(1, 0)


def test_sample_temperature_properties(spark):
    from materialize_spark.pipeline.packing import sample_temperature

    docs = load_tables(spark, SF_DIR)["documents"]
    before = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    after = {r[0]: r[1]
             for r in sample_temperature(docs, "lang", alpha=0.5)
             .groupBy("lang").count().collect()}
    n_min = min(before.values())
    smallest = min(before, key=before.get)
    # smallest language kept whole; others downsampled toward sqrt scaling
    assert after[smallest] == before[smallest]
    import math
    for lang, n in before.items():
        expected = n * math.sqrt(n_min / n)
        assert abs(after.get(lang, 0) - expected) <= 4 * math.sqrt(expected) + 2
    # flattening: max/min ratio strictly shrinks
    assert (max(after.values()) / min(after.values())
            < max(before.values()) / min(before.values()))


def test_sq8_quantization_roundtrip_and_recall(spark):
    """SQ8 codes stay in [0,255]; reconstruction error is bounded by one
    quantization step per dimension; approximate top-10 overlaps exact
    top-10 heavily on real data."""
    from materialize_spark.pipeline.simsearch import (
        cosine_topk, sq8_cosine_topk, sq8_decode_col, sq8_encode, sq8_train,
    )
    from materialize_spark.queries.util import T

    t = T(spark, SF_DIR)
    emb = t.embeddings
    lo, hi = sq8_train(emb)
    assert len(lo) == 64 and len(hi) == 64
    assert all(l <= h for l, h in zip(lo, hi))

    coded = sq8_encode(emb, lo, hi)
    bounds = coded.agg(
        F.min(F.array_min("code")), F.max(F.array_max("code"))).first()
    assert bounds[0] >= 0 and bounds[1] <= 255

    # max |x - decode(encode(x))| over all rows/dims <= half a step
    err = F.aggregate(
        F.zip_with(F.col("embedding").cast("array<double>"),
                   sq8_decode_col(F.col("code"), lo, hi),
                   lambda x, y: F.abs(x - y)),
        F.lit(0.0).cast("double"), lambda a, x: F.greatest(a, x))
    max_err = coded.agg(F.max(err)).first()[0]
    max_step = max((h - l) / 255.0 for l, h in zip(lo, hi) if h > l)
    assert max_err <= max_step / 2 + 1e-9

    qrow = emb.orderBy("vec_id").select("embedding").first()
    exact = {r.vec_id for r in cosine_topk(emb, list(qrow[0]), k=10).collect()}
    approx = {r.vec_id for r in
              sq8_cosine_topk(emb, list(qrow[0]), lo, hi, k=10).collect()}
    assert len(exact & approx) >= 8  # >=80% recall@10 on the test corpus


def test_kmeans_properties(spark):
    """Lloyd invariants: every point assigned, k clusters cover the
    corpus, assignments are nearest-centroid under the final-iteration
    centroids, and a second run is bit-identical (determinism)."""
    from materialize_spark.pipeline.clustering import assign_clusters, kmeans
    from materialize_spark.queries.util import T

    emb = T(spark, "/root/testdata/sf0.01").embeddings
    assigned, cents = kmeans(emb, k=4, iters=2)
    n = emb.count()
    counts = {r.cluster: r.n for r in
              assigned.groupBy("cluster").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n
    assert set(counts) <= {0, 1, 2, 3} and len(counts) >= 2
    # determinism: identical second run
    assigned2, cents2 = kmeans(emb, k=4, iters=2)
    assert cents == cents2
    a1 = sorted((r.vec_id, r.cluster) for r in
                assigned.select("vec_id", "cluster").collect())
    a2 = sorted((r.vec_id, r.cluster) for r in
                assigned2.select("vec_id", "cluster").collect())
    assert a1 == a2
