"""Training-data pipeline queries over documents/embeddings.

Every dedup/similarity operator is oracle-checked: hashing is md5-based so
DuckDB reproduces signatures bit-for-bit (see pipeline/dedup.py).

Shared normalization contract (both engines):
  normalized = trim(collapse_ws(strip_non_alnum(lower(text))))
  tokens     = split(normalized, ' ')
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.pipeline.dedup import (
    exact_dedup, jaccard_pairs, lsh_candidate_pairs, minhash_signatures,
    normalize_text, simhash,
)
from materialize_spark.pipeline.simsearch import cosine_topk, lsh_bucket_signature
from materialize_spark.pipeline.textstats import (
    EN_STOPWORDS, fingerprint, language_id, quality_metrics, tokens_col,
)
from materialize_spark.queries import register
from materialize_spark.queries.util import T

# DuckDB fragment mirroring normalize_text()/tokens.
_DD_TOKENS = r"""
  SELECT doc_id, lang, source,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS tokens
  FROM documents
"""


@register(
    "dedup_exact",
    rf"""
    WITH groups AS (
      SELECT md5(array_to_string(tokens, ' ')) AS content_hash,
             min(doc_id) AS canonical_id, count(*) AS group_size
      FROM ({_DD_TOKENS}) GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN group_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
           CAST(sum(group_size) AS BIGINT) AS n_docs,
           CAST(min(canonical_id) AS BIGINT) AS first_canonical
    FROM groups
    """,
    "pipeline", "dedup",
)
def dedup_exact(spark, sf_dir):
    t = T(spark, sf_dir)
    groups = exact_dedup(t.documents)
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("group_size") > 1, 1).otherwise(0)).cast("long")
        .alias("n_dup_groups"),
        F.sum("group_size").cast("long").alias("n_docs"),
        F.min("canonical_id").alias("first_canonical"),
    )


_DD_SIGS = _DD_TOKENS.join("")  # readability alias
_SIG_EXPRS = ",\n".join(
    f"      list_min(list_transform(shingles, s -> md5('{i}:' || s))) AS sig{i}"
    for i in range(8)
)
_BAND_SELECTS = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, {b} AS band, md5(sig{2*b} || '|' || sig{2*b+1}) AS bucket FROM sigs"
    for b in range(4)
)


@register(
    "dedup_minhash_lsh",
    rf"""
    WITH toks AS ({_DD_TOKENS}),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, len(tokens) - 1),
                            i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]) AS shingles
      FROM toks WHERE len(tokens) >= 3),
    sigs AS (
      SELECT doc_id,
{_SIG_EXPRS}
      FROM sh),
    bands AS (
{_BAND_SELECTS}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b USING (band, bucket)
    WHERE a.doc_id < b.doc_id
    """,
    "pipeline", "dedup", "minhash",
)
def dedup_minhash_lsh(spark, sf_dir):
    t = T(spark, sf_dir)
    docs = t.documents.withColumn(
        "tokens", F.split(normalize_text(F.col("text")), " "))
    sigs = minhash_signatures(docs, F.col("tokens"), num_hashes=8, k=3)
    return lsh_candidate_pairs(sigs, num_hashes=8, band_size=2)


_SIMHASH_BITS = ",\n".join(
    "      CASE WHEN list_sum(list_transform(tokens, t -> CASE WHEN "
    f"substr(md5(t), {c}, 1) IN ('8','9','a','b','c','d','e','f') "
    "THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
    for c in range(1, 17)
)


@register(
    "dedup_simhash",
    rf"""
    WITH toks AS ({_DD_TOKENS})
    SELECT doc_id, concat(
{_SIMHASH_BITS}
    ) AS simhash
    FROM toks
    """,
    "pipeline", "dedup", "simhash",
)
def dedup_simhash(spark, sf_dir):
    t = T(spark, sf_dir)
    docs = t.documents.withColumn(
        "tokens", F.split(normalize_text(F.col("text")), " "))
    return simhash(docs, F.col("tokens"), bits=16)


@register(
    "dedup_ngram_jaccard",
    rf"""
    WITH toks AS (
      SELECT doc_id, list_distinct(tokens) AS tokens FROM ({_DD_TOKENS})),
    posting AS (SELECT doc_id, unnest(tokens) AS tok FROM toks),
    sizes AS (SELECT doc_id, len(tokens) AS sz FROM toks),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      FROM posting a JOIN posting b USING (tok)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
    FROM common JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.8
    """,
    "pipeline", "dedup", "jaccard",
)
def dedup_ngram_jaccard(spark, sf_dir):
    t = T(spark, sf_dir)
    docs = t.documents.withColumn(
        "tokens", F.split(normalize_text(F.col("text")), " "))
    return jaccard_pairs(docs, F.col("tokens"), threshold=0.8)


@register(
    "simsearch_cosine_topk",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings
               WHERE vec_id = (SELECT min(vec_id) FROM embeddings))
    SELECT vec_id, round(
        list_sum(list_transform(range(1, 65),
                 i -> embedding[i]::DOUBLE * qe[i]::DOUBLE))
        / (sqrt(list_sum(list_transform(range(1, 65),
                 i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
         * sqrt(list_sum(list_transform(range(1, 65),
                 i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))), 6) AS cosine_sim
    FROM embeddings, q
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
    "pipeline", "simsearch",
)
def simsearch_cosine_topk(spark, sf_dir):
    t = T(spark, sf_dir)
    qrow = (t.embeddings.orderBy("vec_id").select("embedding").first())
    return cosine_topk(t.embeddings, list(qrow[0]), k=10)


def _lsh_oracle() -> str:
    dots = ",\n".join(
        "      list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * "
        f"(instr('0123456789abcdef', substr(md5({j} || ':' || (i - 1)), 1, 1)) - 8.5))) AS dot{j}"
        for j in range(8)
    )
    bits = " || ".join(
        f"CASE WHEN dot{j} > 0 THEN '1' ELSE '0' END" for j in range(8))
    return f"""
    WITH dots AS (
      SELECT vec_id,
{dots}
      FROM embeddings)
    SELECT {bits} AS bucket, CAST(count(*) AS BIGINT) AS n
    FROM dots GROUP BY 1
    """


@register("simsearch_lsh_buckets", _lsh_oracle(), "pipeline", "simsearch", "lsh")
def simsearch_lsh_buckets(spark, sf_dir):
    t = T(spark, sf_dir)
    return (
        lsh_bucket_signature(t.embeddings, num_planes=8, dims=64)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    )


def _lsh_pairs_oracle() -> str:
    """DuckDB mirror of cosine_pairs_lsh_bucketed: identical md5-derived
    hyperplane buckets, exact cosine within buckets only."""
    dots = ",\n".join(
        "      list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * "
        f"(instr('0123456789abcdef', substr(md5({j} || ':' || (i - 1)), 1, 1)) - 8.5))) AS dot{j}"
        for j in range(8)
    )
    bits = " || ".join(
        f"CASE WHEN dot{j} > 0 THEN '1' ELSE '0' END" for j in range(8))
    return f"""
    WITH dots AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
{dots}
      FROM embeddings),
    b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
                 {bits} AS bucket
          FROM dots)
    SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
           round(list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm), 4) AS cos
    FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    WHERE round(list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm), 6) >= 0.4
    """


@register("simsearch_lsh_pairs", _lsh_pairs_oracle(),
          "pipeline", "simsearch", "lsh")
def simsearch_lsh_pairs(spark, sf_dir):
    """Near-pair generation through the SCALE path: the all-pairs GEMM's
    size guard is forced to trip (max_collect_bytes=1), so this exercises
    cosine_pairs_lsh_bucketed — bucket shuffle + per-bucket GEMM, no
    driver collect. The oracle reproduces the identical buckets in SQL."""
    from materialize_spark.pipeline.simsearch import cosine_pairs_blocked

    t = T(spark, sf_dir)
    return cosine_pairs_blocked(t.embeddings, threshold=0.4,
                                max_collect_bytes=1)


_SW_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@register(
    "text_language_id",
    rf"""
    WITH toks AS ({_DD_TOKENS}),
    pred AS (
      SELECT lang,
             CASE WHEN CAST(len(list_filter(tokens, t -> t IN ({_SW_LIST}))) AS DOUBLE)
                       / greatest(len(tokens), 1) >= 0.05
                  THEN 'en' ELSE 'unknown' END AS predicted
      FROM toks)
    SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """,
    "pipeline", "textstats",
)
def text_language_id(spark, sf_dir):
    t = T(spark, sf_dir)
    toks = F.split(normalize_text(F.col("text")), " ")
    return (
        t.documents
        .select("lang", language_id(toks).alias("predicted"))
        .groupBy("lang", "predicted").agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_quality",
    rf"""
    WITH toks AS ({_DD_TOKENS})
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           round(CAST(list_sum(list_transform(tokens, t -> len(t))) AS DOUBLE)
                 / greatest(len(tokens), 1), 4) AS avg_token_len,
           round(CAST(len(list_distinct(tokens)) AS DOUBLE)
                 / greatest(len(tokens), 1), 4) AS unique_ratio,
           round(CAST(len(list_filter(tokens, t -> t IN ({_SW_LIST}))) AS DOUBLE)
                 / greatest(len(tokens), 1), 4) AS stopword_ratio,
           round(CAST(least(len(tokens), 50) * 8 * greatest(len(tokens), 1)
                 + CASE WHEN CAST(list_sum(list_transform(tokens, t -> len(t))) AS DOUBLE)
                             / greatest(len(tokens), 1) BETWEEN 3 AND 10
                        THEN 300 ELSE 0 END * greatest(len(tokens), 1)
                 + least(len(list_distinct(tokens)) * 600,
                         greatest(len(tokens), 1) * 300) AS DOUBLE)
                 / (CAST(greatest(len(tokens), 1) AS DOUBLE) * 1000.0),
                 4) AS quality_score
    FROM toks
    """,
    "pipeline", "textstats",
)
def text_quality(spark, sf_dir):
    t = T(spark, sf_dir)
    return quality_metrics(t.documents)


@register(
    "text_token_counts",
    r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                t -> len(t) > 0)) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS re_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual
    FROM documents
    """,
    "pipeline", "textstats", "tokenize",
)
def text_token_counts(spark, sf_dir):
    t = T(spark, sf_dir)
    ws = F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                  lambda x: F.length(x) > 0)
    return t.documents.select(
        "doc_id",
        F.size(ws).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0))
        .cast("long").alias("re_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


@register(
    "text_fingerprint",
    rf"""
    WITH fp AS (
      SELECT source, md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS f
      FROM ({_DD_TOKENS}))
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT f) AS BIGINT) AS n_fingerprints
    FROM fp GROUP BY source
    """,
    "pipeline", "textstats", "fingerprint",
)
def text_fingerprint(spark, sf_dir):
    t = T(spark, sf_dir)
    return (
        t.documents
        .select("source", fingerprint(F.col("text")).alias("f"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.countDistinct("f").alias("n_fingerprints"))
    )


# Multimodal plumbing: mapInPandas feature extraction over binary payloads.
# The Arrow/Python kernel IS DuckDB-expressible for this table: payloads are
# UTF-8 text bytes (testdata documents are pure ASCII, so ascii(char) ==
# byte), checksum is md5 over those bytes, and the stub feature fold is
# integer byte sums (exact in float64) normalized and narrowed to float32 —
# mirrored below with CAST(.. AS REAL). Kernel-level asserts also live in
# tests/test_pipeline.py.
@register(
    "multimodal_features",
    """
    WITH b AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             'image' AS kind,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             md5(text) AS checksum,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(text[i])) AS bytes
      FROM documents),
    s AS (
      SELECT media_id, kind, n_bytes, checksum,
             list_sum(list_transform(range(0, CAST(n_bytes AS INT)),
                      i -> CASE WHEN i % 8 = 0 THEN bytes[i + 1] ELSE 0 END))
               AS s0,
             list_sum(bytes) AS s_total
      FROM b)
    SELECT media_id, kind, n_bytes, checksum,
           round(CAST(CAST(CASE WHEN coalesce(s_total, 0) = 0 THEN 0.0
                      ELSE CAST(s0 AS DOUBLE) / CAST(s_total AS DOUBLE) END
                      AS REAL) AS DOUBLE), 6) AS f0
    FROM s
    """,
    "pipeline", "multimodal",
)
def multimodal_features(spark, sf_dir):
    from materialize_spark.pipeline.multimodal import (
        documents_as_media, extract_features,
    )
    t = T(spark, sf_dir)
    feats = extract_features(documents_as_media(t.documents))
    return feats.select(
        "media_id", "kind", "n_bytes", "checksum",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


# Real-decoder certification: per-document solid-color PPM images are
# synthesized Python-side (pipeline/imaging.encode_ppm), pushed through
# the REAL netpbm decoder + pixel feature kernel, and the oracle states
# the closed-form answers (a solid image's channel means ARE the color;
# dims come from doc_id arithmetic) — so the driver cross-checks actual
# image decode, not plumbing. Edge energy/dark fraction rows are covered
# value-level in tests/test_imaging.py.
@register(
    "multimodal_decode_real",
    """
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(doc_id % 5 + 1 AS DOUBLE) AS img_h,
           CAST(doc_id % 7 + 1 AS DOUBLE) AS img_w,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
    FROM documents
    """,
    "pipeline", "multimodal", "codec",
)
def multimodal_decode_real(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from materialize_spark.pipeline.multimodal import extract_features
    t = T(spark, sf_dir)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from materialize_spark.pipeline.imaging import encode_ppm
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                h, w = int(did) % 5 + 1, int(did) % 7 + 1
                color = [int(did) % 256, (int(did) * 7) % 256,
                         (int(did) * 13) % 256]
                arr = np.tile(np.array(color, np.uint8), (h, w, 1))
                payloads.append(encode_ppm(arr))
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": "image", "payload": payloads,
                "meta_format": "ppm"})

    media = t.documents.select("doc_id").mapInPandas(
        synth, schema="media_id long, kind string, payload binary, "
                      "meta_format string")
    feats = extract_features(media)
    f = lambda i: F.element_at("feature", i).cast("double")
    return feats.select(
        "media_id", f(1).alias("img_h"), f(2).alias("img_w"),
        f(3).alias("mean_r"), f(4).alias("mean_g"), f(5).alias("mean_b"))


# Audio analog of multimodal_decode_real: constant-amplitude PCM WAVs
# with amplitude (doc_id % 128)/128 — exactly representable in both
# int16 PCM and float32, so RMS == peak == |mean| == the amplitude with
# zero rounding slack; duration is sample-count arithmetic. The decoder
# (pipeline/imaging.decode_wav) chunk-walks real RIFF bytes.
@register(
    "multimodal_audio_real",
    """
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           round(CAST(doc_id % 50 + 1 AS DOUBLE) / 8000, 9) AS duration_s,
           CAST(8000 AS DOUBLE) AS sample_rate,
           CAST(1 AS DOUBLE) AS channels,
           round(CAST(doc_id % 128 AS DOUBLE) / 128, 9) AS rms,
           round(CAST(doc_id % 128 AS DOUBLE) / 128, 9) AS peak
    FROM documents
    """,
    "pipeline", "multimodal", "codec", "audio",
)
def multimodal_audio_real(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from materialize_spark.pipeline.multimodal import extract_features
    t = T(spark, sf_dir)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from materialize_spark.pipeline.imaging import encode_wav
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                n = int(did) % 50 + 1
                amp = (int(did) % 128) / 128.0
                payloads.append(encode_wav(
                    np.full((n, 1), amp, np.float32), 8000))
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": "audio", "payload": payloads,
                "meta_format": "wav"})

    media = t.documents.select("doc_id").mapInPandas(
        synth, schema="media_id long, kind string, payload binary, "
                      "meta_format string")
    feats = extract_features(media)
    f = lambda i: F.element_at("feature", i).cast("double")
    return feats.select(
        "media_id", F.round(f(1), 9).alias("duration_s"),
        f(2).alias("sample_rate"), f(3).alias("channels"),
        F.round(f(4), 9).alias("rms"), F.round(f(5), 9).alias("peak"))


# Video analog: constant-brightness uncompressed AVIs with closed-form
# descriptors (integer gray levels are exact in float32 means; constant
# frames ⇒ zero temporal energy). Certifies the RIFF/AVI container walk
# + DIB frame decode (pipeline/imaging.decode_avi) cross-engine.
@register(
    "multimodal_video_real",
    """
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(doc_id % 6 + 2 AS DOUBLE) AS n_frames,
           CAST(10 AS DOUBLE) AS fps,
           CAST(doc_id % 3 + 1 AS DOUBLE) AS img_h,
           CAST(doc_id % 4 + 1 AS DOUBLE) AS img_w,
           CAST(doc_id % 200 AS DOUBLE) AS mean_bright,
           CAST(CASE WHEN doc_id % 200 < 32 THEN 1 ELSE 0 END AS DOUBLE)
             AS dark_frac
    FROM documents
    """,
    "pipeline", "multimodal", "codec", "video",
)
def multimodal_video_real(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from materialize_spark.pipeline.multimodal import extract_features
    t = T(spark, sf_dir)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from materialize_spark.pipeline.imaging import encode_avi
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                n = int(did) % 6 + 2
                h, w = int(did) % 3 + 1, int(did) % 4 + 1
                level = int(did) % 200
                frames = np.full((n, h, w, 3), level, np.uint8)
                payloads.append(encode_avi(frames, fps=10.0))
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": "video", "payload": payloads,
                "meta_format": "avi"})

    media = t.documents.select("doc_id").mapInPandas(
        synth, schema="media_id long, kind string, payload binary, "
                      "meta_format string")
    feats = extract_features(media)
    f = lambda i: F.element_at("feature", i).cast("double")
    return feats.select(
        "media_id", f(1).alias("n_frames"), F.round(f(2), 9).alias("fps"),
        f(3).alias("img_h"), f(4).alias("img_w"),
        F.round(f(5), 9).alias("mean_bright"),
        f(8).alias("dark_frac"))


_CC_EDGES = rf"""
    toks AS ({_DD_TOKENS}),
    hashed AS (
      SELECT doc_id, md5(array_to_string(tokens, ' ')) AS h FROM toks),
    canon AS (
      SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS c FROM hashed),
    e1 AS (SELECT doc_id AS a, c AS b FROM canon WHERE doc_id <> c),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, len(tokens) - 1),
                            i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]) AS shingles
      FROM toks WHERE len(tokens) >= 3),
    sigs AS (
      SELECT doc_id,
{_SIG_EXPRS}
      FROM sh),
    bands AS (
{_BAND_SELECTS}
    ),
    e2 AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bands a JOIN bands b USING (band, bucket)
      WHERE a.doc_id < b.doc_id),
    edges AS (
      SELECT a, b FROM e1 UNION SELECT b, a FROM e1
      UNION SELECT a, b FROM e2 UNION SELECT b, a FROM e2)
"""


@register(
    "dedup_components",
    rf"""
    WITH RECURSIVE
{_CC_EDGES},
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM toks
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
    SELECT CAST(a AS BIGINT) AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
    FROM reach GROUP BY a
    """,
    "pipeline", "dedup", "components", "letrec",
)
def dedup_components_query(spark, sf_dir):
    """Near-dup clustering: exact-dup edges ∪ MinHash-LSH candidate edges,
    collapsed into connected components by iterated min-label propagation
    (pipeline.dedup.dedup_components over operators/letrec) — pairwise
    candidates become dedup clusters with one canonical id each. The
    DuckDB oracle recomputes the same graph and closes it with a
    recursive CTE."""
    from pyspark.sql import Window

    from materialize_spark.pipeline.dedup import dedup_components

    t = T(spark, sf_dir)
    docs = t.documents.withColumn(
        "tokens", F.split(normalize_text(F.col("text")), " "))
    hashed = docs.select(
        "doc_id", F.md5(F.concat_ws(" ", F.col("tokens"))).alias("h"))
    canon = hashed.withColumn(
        "c", F.min("doc_id").over(Window.partitionBy("h")))
    e1 = (canon.filter(F.col("doc_id") != F.col("c"))
          .select(F.col("doc_id").alias("id_a"), F.col("c").alias("id_b")))
    sigs = minhash_signatures(docs, F.col("tokens"), num_hashes=8, k=3)
    e2 = (lsh_candidate_pairs(sigs, num_hashes=8, band_size=2)
          .select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")))
    comp = dedup_components(e1.unionByName(e2), t.documents)
    return comp.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.col("cluster_id").cast("long").alias("cluster_id"))


@register(
    "pipeline_pack_sequences",
    rf"""
    WITH toks AS ({_DD_TOKENS}),
    base AS (
      SELECT doc_id, len(tokens) AS ntokens,
             (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 16
               AS shard
      FROM toks),
    packed AS (
      SELECT doc_id, shard, ntokens,
             sum(ntokens) OVER (PARTITION BY shard ORDER BY doc_id)
               AS cum_tokens
      FROM base)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(shard AS BIGINT) AS shard,
           CAST(ntokens AS BIGINT) AS ntokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(floor((cum_tokens - ntokens) / 2048.0) AS BIGINT) AS first_window,
           CAST(floor((cum_tokens - 1) / 2048.0) AS BIGINT) AS last_window
    FROM packed
    """,
    "pipeline", "packing",
)
def pipeline_pack_sequences(spark, sf_dir):
    """Concatenative sequence packing into 2048-token context windows,
    shard-parallel (pipeline.packing.pack_sequences)."""
    from materialize_spark.pipeline.packing import pack_sequences

    t = T(spark, sf_dir)
    docs = t.documents.withColumn(
        "tokens", F.split(normalize_text(F.col("text")), " "))
    out = pack_sequences(docs, F.size("tokens"), capacity=2048)
    return out.select(*[F.col(c).cast("long").alias(c) for c in out.columns])


def _stratified_oracle() -> str:
    from materialize_spark.pipeline.packing import _rate_threshold
    en, rest = _rate_threshold(0.5), _rate_threshold(0.1)
    return f"""
    WITH s AS (
      SELECT doc_id, lang FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
            < CASE WHEN lang = 'en' THEN '{en}' ELSE '{rest}' END)
    SELECT lang, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY lang
    """


@register("pipeline_sample_stratified", _stratified_oracle(),
          "pipeline", "sampling")
def pipeline_sample_stratified(spark, sf_dir):
    """Language-stratified deterministic sampling (md5-hash buckets,
    pipeline.packing.sample_stratified): 50% of English docs, 10% of every
    other language — the corpus-mixing step of a training-data pipeline,
    reproducible across engines and runs."""
    from materialize_spark.pipeline.packing import sample_stratified

    t = T(spark, sf_dir)
    out = sample_stratified(t.documents, "lang", {"en": 0.5},
                            default_rate=0.1)
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "text_chunking",
    rf"""
    WITH toks AS ({_DD_TOKENS}),
    starts AS (
      SELECT doc_id, tokens,
             unnest(range(1, greatest(len(tokens) - 64 + 48, 1) + 1, 48)) AS s
      FROM toks)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST((s - 1) // 48 AS BIGINT) AS chunk_id,
           array_to_string(list_slice(tokens, s, s + 63), ' ') AS chunk
    FROM starts
    """,
    "pipeline", "chunking",
)
def text_chunking(spark, sf_dir):
    """RAG-style overlapping chunking: 64-token windows, 16-token overlap
    (stride 48), one row per (doc, chunk) — pipeline.textstats.chunk_tokens
    as a pure generator expression (no shuffle; chunking at 100 TB is a
    map-only pass)."""
    from materialize_spark.pipeline.textstats import chunk_tokens

    t = T(spark, sf_dir)
    docs = t.documents.withColumn(
        "tokens", F.split(normalize_text(F.col("text")), " "))
    out = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(chunk_tokens(F.col("tokens"))).alias("c"))
    return out.select("doc_id", F.col("c.chunk_id").alias("chunk_id"),
                      F.col("c.chunk").alias("chunk"))


@register(
    "text_redact_pii",
    r"""
    WITH synth AS (
      SELECT doc_id,
             'contact user' || doc_id || '@example.com or +1 (555) 123-4567 '
               || 'ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS text
      FROM documents WHERE doc_id <= 50)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+',
                 '<EMAIL>', 'g'),
               '[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]',
               '<SSN>', 'g'),
             '\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g') AS redacted
    FROM synth
    """,
    "pipeline", "textstats", "pii",
)
def text_redact_pii(spark, sf_dir):
    """PII scrubbing (emails, phones, SSN shapes -> placeholders) over a
    synthesized contact line per document — the redaction pass of a
    training-data pipeline, shared regex subset with the oracle
    (pipeline.textstats.redact_pii)."""
    from materialize_spark.pipeline.textstats import redact_pii

    t = T(spark, sf_dir)
    synth = t.documents.filter(F.col("doc_id") <= 50).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.lit("contact user"), F.col("doc_id").cast("string"),
                 F.lit("@example.com or +1 (555) 123-4567 ssn 123-45-"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
        .alias("text"))
    return synth.select("doc_id", redact_pii(F.col("text")).alias("redacted"))


@register(
    "text_repetition",
    rf"""
    WITH toks AS ({_DD_TOKENS}),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, len(tokens) - 1),
                            i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]) AS shingles
      FROM toks),
    ex AS (
      SELECT doc_id, unnest(shingles) AS g, len(shingles) AS total
      FROM sh WHERE len(shingles) > 0),
    cnt AS (
      SELECT doc_id, g, count(*) AS c, any_value(total) AS total
      FROM ex GROUP BY doc_id, g)
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           coalesce(round(CAST((SELECT max(c) FROM cnt WHERE cnt.doc_id = t.doc_id) AS DOUBLE)
                          / (SELECT any_value(total) FROM cnt WHERE cnt.doc_id = t.doc_id), 6),
                    0.0) AS rep_ratio
    FROM toks t
    """,
    "pipeline", "textstats", "quality", "gopher",
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition signal: share of all trigram shingles taken
    by the most frequent one (pipeline.textstats.repetition_ratio) —
    filters boilerplate/spam in training corpora. Scan-side map
    accumulation, no shuffle."""
    from materialize_spark.pipeline.textstats import repetition_ratio

    t = T(spark, sf_dir)
    docs = t.documents.withColumn(
        "tokens", F.split(normalize_text(F.col("text")), " "))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round(repetition_ratio(F.col("tokens")), 6).alias("rep_ratio"))


@register(
    "pipeline_contamination",
    rf"""
    WITH toks AS ({_DD_TOKENS}),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(tokens) - 1),
                 i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]))
               AS shingles
      FROM toks),
    bench AS (
      SELECT DISTINCT md5(unnest(shingles)) AS h FROM sh WHERE doc_id < 25),
    doc_sh AS (
      SELECT doc_id, md5(unnest(shingles)) AS h FROM sh WHERE doc_id >= 25),
    hits AS (
      SELECT doc_id, count(*) AS n_hits
      FROM doc_sh JOIN bench USING (h) GROUP BY doc_id)
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(n_hits, 0) > 0 AS contaminated
    FROM (SELECT DISTINCT doc_id FROM toks WHERE doc_id >= 25) t
    LEFT JOIN hits ON t.doc_id = hits.doc_id
    """,
    "pipeline", "dedup", "contamination",
)
def pipeline_contamination(spark, sf_dir):
    """Benchmark decontamination (pipeline.dedup.contamination_check):
    docs 0-24 stand in for an eval set; every other document is flagged
    if it shares any trigram shingle — one broadcast semi-join on shingle
    md5s, O(corpus + benchmark)."""
    from materialize_spark.pipeline.dedup import contamination_check

    t = T(spark, sf_dir)
    docs = t.documents.withColumn(
        "tokens", F.split(normalize_text(F.col("text")), " "))
    bench = docs.filter(F.col("doc_id") < 25)
    train = docs.filter(F.col("doc_id") >= 25)
    out = contamination_check(train, bench)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("n_hits").cast("long").alias("n_hits"),
                      "contaminated")


@register(
    "text_url_stats",
    r"""
    WITH synth AS (
      SELECT doc_id,
             'see https://example.com/p/' || CAST(doc_id AS VARCHAR)
               || ' and http://mirror' || CAST(doc_id % 7 AS VARCHAR)
               || '.org/x ' || text AS text
      FROM documents WHERE doc_id <= 100),
    urls AS (
      SELECT doc_id, unnest(regexp_extract_all(text,
             'https?://[A-Za-z0-9.-]+[A-Za-z0-9./_-]*')) AS url
      FROM synth),
    domains AS (
      SELECT doc_id, regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1)
               AS domain
      FROM urls)
    SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM domains GROUP BY domain
    """,
    "pipeline", "textstats", "urls",
)
def text_url_stats(spark, sf_dir):
    """URL extraction + per-domain histogram — the domain-mix audit every
    web-scale corpus runs (synthesized URLs: the testdata has none).
    Pure regexp extraction, scan-side; one shuffle for the histogram."""
    t = T(spark, sf_dir)
    synth = t.documents.filter(F.col("doc_id") <= 100).select(
        "doc_id",
        F.concat(F.lit("see https://example.com/p/"),
                 F.col("doc_id").cast("string"),
                 F.lit(" and http://mirror"),
                 (F.col("doc_id") % 7).cast("string"),
                 F.lit(".org/x "), F.col("text")).alias("text"))
    urls = synth.select(
        "doc_id",
        F.explode(F.regexp_extract_all(
            "text", F.lit(r"https?://[A-Za-z0-9.-]+[A-Za-z0-9./_-]*"), 0))
        .alias("url"))
    domains = urls.select(
        "doc_id",
        F.regexp_extract("url", r"https?://([A-Za-z0-9.-]+)", 1)
        .alias("domain"))
    return (domains.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs")))


def _temperature_oracle() -> str:
    # rate_l = sqrt(n_min / n_l); threshold = 8-hex md5-prefix cutoff,
    # 'g' sentinel for rate 1 (every hex prefix < 'g'). sqrt/divide are
    # correctly-rounded IEEE, so both engines derive identical thresholds.
    return """
    WITH counts AS (
      SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
    rates AS (
      SELECT lang, sqrt((SELECT min(n) FROM counts) / n) AS rate FROM counts),
    thr AS (
      SELECT lang,
             CASE WHEN rate >= 1.0 THEN 'g'
                  ELSE lpad(lower(hex(CAST(floor(rate * 4294967296.0) AS BIGINT))), 8, '0')
             END AS cutoff
      FROM rates)
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
    FROM documents d JOIN thr USING (lang)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.cutoff
    GROUP BY d.lang
    """


@register("pipeline_sample_temperature", _temperature_oracle(),
          "pipeline", "sampling", "temperature")
def pipeline_sample_temperature(spark, sf_dir):
    """Temperature rebalancing of the multilingual corpus at alpha=0.5
    (pipeline.packing.sample_temperature): big languages downsampled by
    sqrt(n_min/n_l), smallest kept whole — deterministic md5 thresholds,
    verified bit-for-bit against the oracle's independent derivation."""
    from materialize_spark.pipeline.packing import sample_temperature

    t = T(spark, sf_dir)
    out = sample_temperature(t.documents, "lang", alpha=0.5)
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "dedup_spans",
    rf"""
    WITH toks AS ({_DD_TOKENS}),
    spans AS (
      SELECT doc_id,
             CAST((s - 1) // 32 AS BIGINT) AS span_id,
             md5(array_to_string(list_slice(tokens, s, s + 31), ' ')) AS h
      FROM (SELECT doc_id, tokens,
                   unnest(range(1, greatest(len(tokens) - 31, 1) + 1, 32)) AS s
            FROM toks)
      WHERE len(list_slice(tokens, s, s + 31)) = 32),
    freq AS (SELECT h, count(*) AS n FROM spans GROUP BY h)
    SELECT spans.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN freq.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           round(sum(CASE WHEN freq.n > 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS dup_frac
    FROM spans JOIN freq USING (h)
    GROUP BY spans.doc_id
    """,
    "pipeline", "dedup", "spans",
)
def dedup_spans(spark, sf_dir):
    """Span-level exact dedup (RefinedWeb-style boilerplate detection):
    non-overlapping 32-token spans hashed corpus-wide; per-document count
    and fraction of spans that occur elsewhere. Distinct from document
    dedup (dedup_exact) and near-dup (minhash): this finds REPEATED
    PASSAGES inside otherwise-distinct documents.

    Scale: explode is a map-side pass; the only shuffle is the span-hash
    groupBy (partial-aggregated), then a hash join back — both keyed on
    md5, uniformly distributed, no skew. At 100 TB the span-frequency side
    is a fraction of corpus size and AQE picks broadcast when it fits."""
    t = T(spark, sf_dir)
    docs = t.documents.select(
        "doc_id",
        F.split(normalize_text(F.col("text")), " ").alias("tokens"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("tokens") - 31, F.lit(1)), F.lit(32))
    spans = (
        docs.select(
            "doc_id",
            F.explode(F.transform(
                starts,
                lambda s: F.struct(
                    ((s - 1) / 32).cast("long").alias("span_id"),
                    F.slice(F.col("tokens"), s, 32).alias("toks"))))
            .alias("sp"))
        .filter(F.size("sp.toks") == 32)
        .select("doc_id", F.col("sp.span_id").alias("span_id"),
                F.md5(F.array_join(F.col("sp.toks"), " ")).alias("h"))
    )
    freq = spans.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    dup = F.when(F.col("n") > 1, 1).otherwise(0)
    return (
        spans.join(freq, on="h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_spans"),
             F.sum(dup).alias("n_dup_spans"),
             F.round(F.sum(dup) / F.count(F.lit(1)), 6).alias("dup_frac"))
    )


@register(
    "text_lm_score",
    rf"""
    WITH toks AS ({_DD_TOKENS}),
    bg AS (
      SELECT doc_id,
             tokens[i] AS w1, tokens[i + 1] AS w2
      FROM toks, unnest(range(1, len(tokens))) AS t(i)
      WHERE len(tokens) >= 2),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT w2) AS v FROM bg)
    SELECT bg.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c12.c12 + 1.0) / (c1.c1 + 1.0 * v.v))), 6)
             AS lm_logprob
    FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY bg.doc_id
    """,
    "pipeline", "textstats", "lm",
)
def text_lm_score_query(spark, sf_dir):
    """Corpus bigram-LM quality scoring (perplexity-style ranking signal
    for training-data filtering): add-1-smoothed bigram log-likelihood
    averaged per document, trained on the corpus itself. Purely
    relational — two counting shuffles + one keyed join; see
    pipeline/textstats.py lm_score for the scale notes."""
    from materialize_spark.pipeline.dedup import normalize_text
    from materialize_spark.pipeline.textstats import lm_score, tokens_col

    t = T(spark, sf_dir)
    toks = tokens_col(normalize_text(F.col("text")))
    return lm_score(t.documents, toks)


def _sq8_oracle() -> str:
    """DuckDB mirror of sq8_train/encode/decode + asymmetric cosine."""
    los = ",\n".join(
        f"      min(embedding[{i}]::DOUBLE) AS lo{i}" for i in range(1, 65))
    his = ",\n".join(
        f"      max(embedding[{i}]::DOUBLE) AS hi{i}" for i in range(1, 65))
    spans = ",\n".join(
        f"      CASE WHEN hi{i} > lo{i} THEN hi{i} - lo{i} ELSE 1.0 END"
        f" AS sp{i}" for i in range(1, 65))
    codes = ",\n".join(
        f"      least(255, greatest(0, CAST(floor((embedding[{i}]::DOUBLE"
        f" - lo{i}) / sp{i} * 255 + 0.5) AS INT))) AS c{i}"
        for i in range(1, 65))
    approx_dot = " + ".join(
        f"(c{i} / 255.0 * sp{i} + lo{i}) * qe[{i}]::DOUBLE"
        for i in range(1, 65))
    approx_norm = " + ".join(
        f"(c{i} / 255.0 * sp{i} + lo{i}) * (c{i} / 255.0 * sp{i} + lo{i})"
        for i in range(1, 65))
    qnorm = ("sqrt(list_sum(list_transform(range(1, 65), "
             "i -> qe[i]::DOUBLE * qe[i]::DOUBLE)))")
    return f"""
    WITH stats AS (
      SELECT
{los},
{his}
      FROM embeddings),
    sp AS (
      SELECT *,
{spans}
      FROM stats),
    q AS (SELECT embedding AS qe FROM embeddings
          WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
    coded AS (
      SELECT vec_id, qe,
{codes},
             sp.* FROM embeddings, sp, q)
    SELECT vec_id,
           round(({approx_dot}) / (sqrt({approx_norm}) * {qnorm}), 6)
             AS cosine_sim
    FROM coded
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """


@register("simsearch_sq8", _sq8_oracle(), "pipeline", "simsearch", "sq8")
def simsearch_sq8(spark, sf_dir):
    """SQ8 scalar-quantized ANN: per-dimension [min,max] codebook (one
    map-side-combined aggregation), 8-bit codes (4x memory vs float32 —
    the lever that keeps a 100 TB embedding corpus memory-resident),
    asymmetric cosine scoring (full-precision query vs decoded codes).
    pipeline/simsearch.py sq8_*; rounding is explicit floor(x+0.5) so
    any engine reproduces the codes bit-for-bit."""
    from materialize_spark.pipeline.simsearch import (
        sq8_cosine_topk, sq8_train,
    )

    t = T(spark, sf_dir)
    qrow = t.embeddings.orderBy("vec_id").select("embedding").first()
    lo, hi = sq8_train(t.embeddings)
    return sq8_cosine_topk(t.embeddings, list(qrow[0]), lo, hi, k=10)


def _kmeans_oracle() -> str:
    """Lloyd's k-means, k=4, 2 iterations, mirrored exactly: init = 4
    smallest-id vectors; sequential squared-L2 sums; ties → lowest
    cluster; per-dimension means rounded to 6 decimals per iteration."""
    def assign(src: str, cents: str) -> str:
        return f"""
      SELECT vec_id, embedding, cluster FROM (
        SELECT e.vec_id, e.embedding, c.cluster,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_sum(list_transform(range(1, 65),
                   i -> (e.embedding[i]::DOUBLE - c.cvec[i])
                      * (e.embedding[i]::DOUBLE - c.cvec[i]))),
                 c.cluster) AS rn
        FROM {src} e CROSS JOIN {cents} c) WHERE rn = 1"""

    def means(src: str) -> str:
        return f"""
      SELECT cluster, list(cm ORDER BY i) AS cvec FROM (
        SELECT cluster, i, round(avg(embedding[i]::DOUBLE), 6) AS cm
        FROM {src}, range(1, 65) t(i) GROUP BY cluster, i)
      GROUP BY cluster"""

    return f"""
    WITH init AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
             list_transform(embedding, x -> x::DOUBLE) AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 4),
    a1 AS ({assign('embeddings', 'init')}),
    c1 AS ({means('a1')}),
    a2 AS ({assign('embeddings', 'c1')}),
    c2 AS ({means('a2')}),
    norms AS (
      SELECT cluster,
             round(sqrt(list_sum(list_transform(cvec, x -> x * x))), 4)
               AS centroid_norm
      FROM c2)
    SELECT CAST(a.cluster AS BIGINT) AS cluster,
           CAST(count(*) AS BIGINT) AS n,
           max(norms.centroid_norm) AS centroid_norm
    FROM a2 a JOIN norms USING (cluster)
    GROUP BY a.cluster
    ORDER BY cluster
    """


@register("pipeline_cluster_kmeans", _kmeans_oracle(),
          "pipeline", "clustering", "kmeans")
def pipeline_cluster_kmeans(spark, sf_dir):
    """Corpus clustering: Lloyd's k-means (k=4, 2 iterations) over the
    embedding column — domain discovery / corpus-mix curation, and the
    iterative-refinement representative next to LetRec. Per iteration:
    one broadcast K-row assignment pass + one groupBy(cluster) mean
    with map-side partials; the inter-iteration centroid collect is
    K-row metadata (IVF budget class). Deterministic by construction:
    smallest-id init, sequential distance sums, lowest-cluster ties,
    6-decimal centroid rounding (pipeline/clustering.py)."""
    import math

    from materialize_spark.pipeline.clustering import kmeans

    t = T(spark, sf_dir)
    assigned, centroids = kmeans(t.embeddings, k=4, iters=2)
    norms = [(cid, round(math.sqrt(sum(x * x for x in vec)), 4))
             for cid, vec in centroids]
    norms_df = spark.createDataFrame(
        norms, "cluster int, centroid_norm double")
    return (assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(F.broadcast(norms_df), on="cluster")
            .select(F.col("cluster").cast("long").alias("cluster"),
                    F.col("n").cast("long").alias("n"),
                    "centroid_norm")
            .orderBy("cluster"))


@register(
    "text_tfidf_topterms",
    f"""
    WITH toks0 AS ({_DD_TOKENS}),
    toks AS (
      SELECT doc_id, unnest(tokens) AS term FROM toks0),
    toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY 1, 2),
    dfreq AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks2 GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, term,
             round(tf * ln(n.n::DOUBLE / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rank AS BIGINT) AS rank,
           term, tfidf
    FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
    "pipeline", "text", "tfidf",
)
def text_tfidf_topterms(spark, sf_dir):
    """Per-document top-3 TF-IDF terms — the retrieval-relevance signal
    a curation pipeline uses for topic tagging / relevance filtering.
    Scale shape: one explode + two keyed aggregations (tf by (doc,term),
    df by term with map-side partial distinct) + a term-keyed join and a
    doc-keyed window — every shuffle on a real key, no all-pairs work,
    all JVM expressions. N is one driver scalar."""
    from pyspark.sql.window import Window

    from materialize_spark.pipeline.dedup import normalize_text

    docs = T(spark, sf_dir).documents
    n_docs = docs.count()
    toks = (docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " "))
        .alias("term"))
        .filter(F.col("term") != ""))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = (toks.select("doc_id", "term").distinct()
             .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    scored = (tf.join(dfreq, on="term")
              .withColumn("tfidf", F.round(
                  F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")),
                  6)))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("rank").cast("long").alias("rank"),
                    "term", "tfidf")
            .orderBy("doc_id", "rank"))


_AGREE8 = " + ".join(
    f"CASE WHEN x.sig{i} = y.sig{i} THEN 1 ELSE 0 END" for i in range(8))


@register(
    "dedup_incremental_lsh",
    rf"""
    WITH toks AS ({_DD_TOKENS}),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, len(tokens) - 1),
                            i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]) AS shingles
      FROM toks WHERE len(tokens) >= 3),
    sigs AS (
      SELECT doc_id,
{_SIG_EXPRS}
      FROM sh),
    bands AS (
{_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b USING (band, bucket)
      WHERE a.doc_id < b.doc_id),
    ver AS (
      SELECT DISTINCT c.doc_b
      FROM cand c JOIN sigs x ON x.doc_id = c.doc_a
                  JOIN sigs y ON y.doc_id = c.doc_b
      WHERE {_AGREE8} >= 4)
    SELECT CAST(count(*) AS BIGINT) AS survivors,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE doc_id NOT IN (SELECT doc_b FROM ver)
    """,
    "pipeline", "dedup", "minhash", "ivm",
)
def dedup_incremental_lsh(spark, sf_dir):
    """Streaming near-dup dedup: documents arrive in three doc_id-ordered
    batches through IncrementalLSHDedup (LSH bucket + signature state as
    append-only parts, probe-only against seen corpus); the union of the
    per-batch survivor sets must equal the batch drop rule evaluated on
    the WHOLE corpus at once (drop a doc iff a verified >= 4/8-signature
    candidate with a lower doc_id exists). Summarized as (count, id-sum)
    so the result is scale-stable. Reference: the dedup pipeline over
    upsert-state incrementality (src/storage/src/upsert.rs) applied to
    the LSH operators."""
    from materialize_spark.streaming.dedup_stream import IncrementalLSHDedup

    t = T(spark, sf_dir)
    docs = t.documents.select("doc_id", "text")
    hi = docs.agg(F.max("doc_id")).first()[0] or 0
    cut1, cut2 = hi // 3, 2 * hi // 3
    dd = IncrementalLSHDedup(spark, num_hashes=8, band_size=2, k=3,
                             min_agree=4)
    tokens = F.split(normalize_text(F.col("text")), " ")
    out = None
    for lo, up in ((None, cut1), (cut1, cut2), (cut2, None)):
        batch = docs
        if lo is not None:
            batch = batch.filter(F.col("doc_id") > lo)
        if up is not None:
            batch = batch.filter(F.col("doc_id") <= up)
        surv = dd.on_batch(batch.localCheckpoint(eager=True), tokens)
        s = surv.select("doc_id")
        out = s if out is None else out.unionByName(s)
    return out.agg(F.count(F.lit(1)).cast("long").alias("survivors"),
                   F.sum("doc_id").cast("long").alias("id_sum"))
