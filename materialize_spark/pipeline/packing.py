"""Training-batch assembly operators: sequence packing and deterministic
sampling — the steps between a curated corpus and a training run.

These are engine surplus over the reference (its surface stops at SQL), but
they are first-class citizens of a 100 TB training-data pipeline and are
built like every other operator here: pure column expressions, portable
(md5-based) determinism so the DuckDB oracle reproduces results bit-for-bit,
and shuffle patterns that survive scale-up.

Portability notes: md5 hex is identical in every engine; comparing a hex
PREFIX lexicographically equals comparing it numerically (hex digits are
ASCII-ordered), so sampling thresholds are hex-string literals and shard
ids come from hex-digit positions — no engine-specific base conversion
anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _md5_of_id(id_col: str) -> Column:
    return F.md5(F.col(id_col).cast("string"))


def hex_shard(id_col: str, num_shards: int = 16) -> Column:
    """Deterministic shard in [0, num_shards): position of the md5's first
    hex digit (num_shards <= 16 keeps the expression portable verbatim)."""
    if not 1 <= num_shards <= 16:
        raise ValueError("hex_shard supports 1..16 shards")
    digit = F.substring(_md5_of_id(id_col), 1, 1)
    return (F.instr(F.lit(_HEX), digit) - 1) % num_shards


def _rate_threshold(rate: float) -> str:
    """8-hex-digit threshold: md5 prefix < threshold ⇔ uniform(0,1) < rate."""
    return f"{int(max(0.0, min(1.0, rate)) * 16**8):08x}"


def pack_sequences(df: DataFrame, token_count: Column, *,
                   capacity: int, id_col: str = "doc_id",
                   num_shards: int = 16) -> DataFrame:
    """Concatenative sequence packing: documents are laid end-to-end in id
    order and cut into fixed-``capacity`` context windows (the standard
    LLM pretraining packing — documents may span a window boundary).

    Emits per document: its shard, token span, and the first/last window
    it lands in. Scale design: a single global running sum would funnel
    everything through one partition, so documents are first split into
    deterministic md5 shards and packed per shard — the window function's
    partition key — giving shard-parallel packing, which is how training
    shards are actually laid out. Window ids are globally unique via
    (shard, window-in-shard).
    """
    w = (Window.partitionBy("shard")
         .orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (
        df.select(F.col(id_col), token_count.alias("ntokens"),
                  hex_shard(id_col, num_shards).alias("shard"))
        .withColumn("cum_tokens", F.sum("ntokens").over(w))
        .withColumn("first_window",
                    F.floor((F.col("cum_tokens") - F.col("ntokens"))
                            / capacity))
        .withColumn("last_window",
                    F.floor((F.col("cum_tokens") - 1) / capacity))
    )
    return out.select(id_col, "shard", "ntokens", "cum_tokens",
                      "first_window", "last_window")


def sample_fraction(df: DataFrame, rate: float, *,
                    id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic hash sampling: keep a row iff the md5 prefix of its id
    (plus an optional salt, for independent resamples) falls under the
    rate threshold. Portable across engines/runs — the property that makes
    held-out splits reproducible; scan-side filter, no shuffle."""
    prefix = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8)
    return df.filter(prefix < F.lit(_rate_threshold(rate)))


def sample_stratified(df: DataFrame, strata_col: str,
                      rates: dict[str, float], *, id_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language-balanced corpus
    mixing): each stratum keeps its own md5-hash fraction. One scan, no
    shuffle; rates fold into a literal CASE expression."""
    prefix = F.substring(_md5_of_id(id_col), 1, 8)
    thr = F.lit(_rate_threshold(default_rate))
    for value, r in rates.items():
        thr = F.when(F.col(strata_col) == value,
                     F.lit(_rate_threshold(r))).otherwise(thr)
    return df.filter(prefix < thr)


def sample_temperature(df: DataFrame, strata_col: str, *,
                       alpha: float = 0.5, id_col: str = "doc_id") -> DataFrame:
    """Temperature-based stratum rebalancing (multilingual corpus mixing a
    la XLM-R): keep-rate per stratum = (n_min / n_l)^alpha, which flattens
    the language distribution toward uniform as alpha -> 1 and leaves it
    unchanged at alpha -> 0. The largest strata are downsampled, the
    smallest kept whole (rate 1).

    Determinism/scale notes:
    - the only driver-side data is the K-row stratum-count table (same
      budget class as the IVF centroid collect);
    - sampling itself is the md5-prefix filter — one scan, no shuffle;
    - at alpha=0.5 the rate is sqrt(n_min/n_l): sqrt and divide are
      IEEE-correctly-rounded, so an independent engine computing the same
      formula gets bit-identical thresholds (the cross-engine test relies
      on this; arbitrary alpha goes through libm pow, identical on one
      host but not portable in principle).
    """
    import math

    counts = {r[0]: r[1] for r in
              df.groupBy(strata_col).count().collect()}
    n_min = min(counts.values())
    prefix = F.substring(_md5_of_id(id_col), 1, 8)
    thr = F.lit("g")  # rate >= 1: every 8-hex md5 prefix sorts below 'g'
    for value, n in counts.items():
        if alpha == 0.5:
            rate = math.sqrt(n_min / n)
        else:
            rate = (n_min / n) ** alpha
        t = "g" if rate >= 1.0 else _rate_threshold(rate)
        thr = F.when(F.col(strata_col) == value, F.lit(t)).otherwise(thr)
    return df.filter(prefix < thr)
