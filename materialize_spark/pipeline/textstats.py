"""Text analysis: language ID, quality scoring, token counting,
fingerprinting. All JVM expressions over token arrays — scan-side, no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny high-frequency English function-word list — enough signal for a
# coarse n-gram-free language heuristic.
EN_STOPWORDS = ("the", "a", "an", "and", "of", "in", "to", "is", "for", "on")


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lowercased text (empty strings removed)."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"),
                    lambda t: F.length(t) > 0)


def stopword_ratio(tokens: Column) -> Column:
    hits = F.size(F.filter(tokens, lambda t: t.isin(*EN_STOPWORDS)))
    return hits / F.greatest(F.size(tokens), F.lit(1))


def language_id(tokens: Column, *, en_threshold: float = 0.05) -> Column:
    """'en' when the stopword ratio clears the threshold, else 'unknown'."""
    return F.when(stopword_ratio(tokens) >= en_threshold, "en").otherwise("unknown")


def quality_metrics(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features + a composite score in [0, 1]."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    avg_len = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) \
        / F.greatest(n_tok, F.lit(1))
    uniq_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    sw = stopword_ratio(toks)
    # crude but monotone: enough tokens, sane word length, lexical
    # diversity. Computed as ONE division of an exact integer numerator
    # (x1000·n): accumulating three float terms lands on 4th-decimal
    # rounding boundaries whose last bit differs between engines; a single
    # identical-integer division yields the identical double everywhere.
    n1 = F.greatest(n_tok, F.lit(1))
    d = F.size(F.array_distinct(toks))
    score_num = (
        F.least(n_tok, F.lit(50)) * 8 * n1
        + F.when((avg_len >= 3) & (avg_len <= 10), 300).otherwise(0) * n1
        + F.least(d * 600, n1 * 300)
    )
    score = score_num.cast("double") / (n1.cast("double") * 1000.0)
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(uniq_ratio, 4).alias("unique_ratio"),
        F.round(sw, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set (the classic 'fingerprint' clustering key)."""
    toks = tokens_col(text)
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def chunk_tokens(tokens, *, chunk_size: int = 64,
                 overlap: int = 16):
    """Overlapping token-window chunks (the RAG / context-window chunking
    step): windows start every ``chunk_size - overlap`` tokens, each
    ``chunk_size`` long (the final, shorter tail window included). Pure
    generator expressions — explode of slices, no Python, no shuffle;
    chunk_id is the 0-based window index."""
    from pyspark.sql import functions as F

    t = tokens if not isinstance(tokens, str) else F.col(tokens)
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    n = F.size(t)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - F.lit(chunk_size) + F.lit(stride), F.lit(1)),
        F.lit(stride))
    return F.transform(
        starts,
        lambda s: F.struct(
            ((s - 1) / stride).cast("long").alias("chunk_id"),
            F.array_join(F.slice(t, s, chunk_size), " ").alias("chunk")))


# PII patterns shared verbatim with the DuckDB oracle — simple ERE subset
# so both regex engines agree (no lookarounds, no shorthand classes that
# differ across engines).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"),
    ("phone", r"\+?[0-9][0-9 ()-]{7,}[0-9]"),
    ("ssn", r"[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]"),
)


def redact_pii(text: Column) -> Column:
    """Replace emails / phone numbers / SSN-shaped spans with
    ``<KIND>`` placeholders — the scrubbing pass every training corpus
    runs. Pure regexp_replace chain: scan-side, order fixed (ssn before
    phone so the digit-run pattern can't eat an SSN first)."""
    out = text
    for kind, pat in (PII_PATTERNS[0], PII_PATTERNS[2], PII_PATTERNS[1]):
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def repetition_ratio(tokens: Column, *, n: int = 3) -> Column:
    """Gopher-style repetition signal: the share of all token n-grams
    taken by the single most frequent n-gram (1.0 = the document is one
    phrase repeated). Computed as expressions over the shingle array —
    aggregate(map accumulation) stays JVM-side, no shuffle."""
    from materialize_spark.pipeline.dedup import shingles_col

    sh = shingles_col(tokens, k=n)
    counts = F.aggregate(
        sh,
        F.create_map().cast("map<string,int>"),
        lambda acc, s: F.map_concat(
            F.map_filter(acc, lambda k, _v: k != s),
            F.create_map(s, F.coalesce(
                F.element_at(acc, s), F.lit(0)) + 1)),
    )
    top = F.array_max(F.map_values(counts))
    return (F.when(F.size(sh) > 0,
                   top.cast("double") / F.size(sh))
            .otherwise(F.lit(0.0)))


def lm_score(df: DataFrame, tokens: Column, *, id_col: str = "doc_id",
             add_k: float = 1.0) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    perplexity-style quality signal training pipelines use to rank/filter
    documents (low average log-likelihood = boilerplate, gibberish, or
    out-of-domain text).

    Model: add-k-smoothed bigram LM trained on the corpus itself —
    p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*V), score = mean ln p over the
    doc's bigrams. All relational: two counting aggregations (bigram,
    unigram) + one keyed join back to the exploded bigram stream + a
    per-doc aggregate.

    Scale: counts are map-side-combined before their shuffles; the join
    keys on (w1, w2) so fan-out is bounded by corpus vocabulary, and the
    count tables (V and V^2-bounded, Zipf-truncated in practice) are far
    smaller than the token stream. No Python, no collect.
    """
    bigrams = (
        df.select(F.col(id_col), tokens.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            id_col,
            F.explode(F.arrays_zip(
                F.slice("toks", 1, F.size("toks") - 1).alias("w1"),
                F.slice("toks", 2, F.size("toks") - 1).alias("w2"),
            )).alias("bg"))
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bigram_counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12"))
    unigram_counts = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    # single-row vocab size, broadcast into the scoring join
    v_size = F.broadcast(bigrams.select(F.countDistinct("w2").alias("v")))
    scored = (
        bigrams
        .join(bigram_counts, ["w1", "w2"])
        .join(unigram_counts, ["w1"])
        .crossJoin(v_size)
        .select(
            id_col,
            (F.log((F.col("c12") + F.lit(add_k))
                   / (F.col("c1") + F.lit(add_k) * F.col("v")))).alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("lm_logprob"))
