"""Third surface wave: exact decimal aggregation, timestamp
parse/construct/timezone, and the RepeatRow / Wrap table functions.

Reference parity targets:
- Numeric (up to 39 digits) exact arithmetic (src/repr/src/scalar.rs:84-180)
  → Spark DecimalType(38) — one digit less max precision, documented gap
  (SURVEY.md §1.4). The decimal battery proves sums/min/max are *exact*
  (no float rounding), unlike the double-typed TPC-H columns.
- to_timestamp / make_timestamp / timezone / epoch round-trips
  (VariadicFunc::MakeTimestamp, BinaryFunc timezone ops,
  try_parse_monotonic_iso8601_timestamp in src/sql/src/func.rs).
- TableFunc::RepeatRow[NonNegative] and TableFunc::Wrap{width}
  (src/expr/src/relation/func.rs:3556-3595).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.queries import register
from materialize_spark.queries.util import T, sql_over


@register(
    "agg_decimal",
    """
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS VARCHAR) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l_discount AS DECIMAL(18,4)))
                     AS DECIMAL(38,6)) AS VARCHAR) AS sum_disc_price,
           CAST(CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS VARCHAR) AS min_price,
           CAST(CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS VARCHAR) AS max_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "aggregate", "decimal", "numeric",
)
def agg_decimal(spark, sf_dir):
    """Exact decimal aggregation — the engine's Numeric story.

    Casting to DECIMAL before aggregating makes the sums exact and
    order-independent (integer arithmetic under the hood). The final columns
    are emitted as VARCHAR on BOTH engines: DuckDB's pandas path renders
    DECIMAL as float64 while Spark returns Decimal objects, so identical
    values hash differently unless canonicalized — fixed-scale decimal →
    string is exact and engine-neutral. Group-by shuffles only the 3
    returnflag groups after map-side partial aggregation.
    """
    t = T(spark, sf_dir)
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    return t.lineitem.groupBy("l_returnflag").agg(
        F.sum(qty).cast("decimal(38,2)").cast("string").alias("sum_qty"),
        F.sum(price * disc).cast("decimal(38,6)").cast("string")
            .alias("sum_disc_price"),
        F.min(price).cast("decimal(38,2)").cast("string").alias("min_price"),
        F.max(price).cast("decimal(38,2)").cast("string").alias("max_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "scalar_parse_timestamp",
    """
    SELECT o_orderkey,
           strftime(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                             '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')
               AS parse_rt,
           strftime(make_timestamp(CAST(extract(year FROM o_orderdate) AS BIGINT),
                                   CAST(extract(month FROM o_orderdate) AS BIGINT),
                                   CAST(extract(day FROM o_orderdate) AS BIGINT),
                                   12, 30, 15.0),
                    '%Y-%m-%d %H:%M:%S') AS made,
           strftime(timezone('America/New_York', o_orderdate),
                    '%Y-%m-%d %H:%M:%S') AS ny_utc,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS epoch_ms_v,
           strftime(to_timestamp(epoch_ms(o_orderdate) / 1000),
                    '%Y-%m-%d %H:%M:%S') AS epoch_rt
    FROM orders WHERE o_orderkey <= 2000
    """,
    "scalar", "datetime", "parse",
)
def scalar_parse_timestamp(spark, sf_dir):
    """Timestamp parse / construct / timezone / epoch round-trips.

    ny_utc: interpret the naive timestamp as America/New_York wall time and
    convert to UTC (PG `AT TIME ZONE` direction the reference implements as
    BinaryFunc timezone ops) — Spark's to_utc_timestamp is the exact analog.
    """
    t = T(spark, sf_dir)
    d = F.col("o_orderdate")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return t.orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.date_format(
            F.to_timestamp(F.date_format(d, fmt), fmt), fmt).alias("parse_rt"),
        F.date_format(
            F.make_timestamp(F.year(d), F.month(d), F.dayofmonth(d),
                             F.lit(12), F.lit(30), F.lit(15)),
            fmt).alias("made"),
        F.date_format(F.to_utc_timestamp(d, "America/New_York"), fmt)
        .alias("ny_utc"),
        F.unix_millis(d.cast("timestamp")).alias("epoch_ms_v"),
        F.date_format(
            F.timestamp_seconds(F.unix_millis(d.cast("timestamp")) / 1000),
            fmt).alias("epoch_rt"),
    )


@register(
    "tablefunc_repeat_row",
    """
    SELECT p_partkey, CAST(u AS BIGINT) AS copy_idx
    FROM (SELECT p_partkey, p_size % 4 AS n FROM part), unnest(range(n)) AS t(u)
    """,
    "tablefunc", "repeat_row",
)
def tablefunc_repeat_row(spark, sf_dir):
    """RepeatRowNonNegative: emit each row n >= 0 times (n = 0 drops the
    row) with the copy index. Spark: explode(sequence(...)) after filtering
    n > 0 — sequence() would count *down* for n = 0, so the filter is load-
    bearing, matching the table function's NonNegative guard."""
    t = T(spark, sf_dir)
    n = F.col("p_size") % 4
    return (
        t.part.select("p_partkey", n.alias("n"))
        .filter(F.col("n") > 0)
        .select("p_partkey",
                F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("u"))
        .select("p_partkey", F.col("u").cast("long").alias("copy_idx"))
    )


@register(
    "tablefunc_wrap",
    """
    SELECT c_custkey, chunk[1] AS w1, chunk[2] AS w2
    FROM (SELECT c_custkey,
                 [c_name, c_mktsegment, c_custkey::VARCHAR,
                  c_nationkey::VARCHAR] AS arr
          FROM customer),
         unnest([list_slice(arr, 1, 2), list_slice(arr, 3, 4)]) AS t(chunk)
    """,
    "tablefunc", "wrap",
)
def tablefunc_wrap(spark, sf_dir):
    """Wrap{width=2}: reshape a 4-column row into 2 rows of 2 columns —
    chunk the values array and explode the chunks."""
    t = T(spark, sf_dir)
    arr = F.array(F.col("c_name"), F.col("c_mktsegment"),
                  F.col("c_custkey").cast("string"),
                  F.col("c_nationkey").cast("string"))
    chunks = F.transform(
        F.sequence(F.lit(0), F.lit(1)),
        lambda i: F.slice(arr, i * 2 + 1, 2),
    )
    return (
        t.customer.select("c_custkey", F.explode(chunks).alias("chunk"))
        .select("c_custkey",
                F.col("chunk").getItem(0).alias("w1"),
                F.col("chunk").getItem(1).alias("w2"))
    )


@register(
    "letrec_mutual_parity",
    """
    WITH RECURSIVE r AS (
        SELECT 0 AS node, 0 AS par
        UNION
        SELECT e.dst, 1 - r.par
        FROM r JOIN (SELECT DISTINCT l_orderkey % 500 AS src,
                                     l_partkey % 500 AS dst
                     FROM lineitem) e ON e.src = r.node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(par AS BIGINT) AS par FROM r
    """,
    "letrec", "recursion", "mutual",
)
def letrec_mutual_parity(spark, sf_dir):
    """WITH MUTUALLY RECURSIVE with two genuinely mutual bindings
    (MIR LetRec, src/expr/src/relation.rs:154): even/odd-step reachability,
    where each binding's step reads the *other* binding. The DuckDB oracle
    encodes the same fixpoint as a single parity-tagged recursive CTE
    (DuckDB has no mutual recursion — the tagged union is its standard
    encoding).

    Scale: each iteration is one shuffle join of the frontier against the
    edge table; localCheckpoint per iteration keeps lineage flat.
    """
    from materialize_spark.operators.letrec import let_rec

    t = T(spark, sf_dir)
    edges = t.lineitem.select(
        (F.col("l_orderkey") % 500).cast("long").alias("src"),
        (F.col("l_partkey") % 500).cast("long").alias("dst")).distinct()

    def neighbors(df):
        return (df.join(edges, df["node"] == edges["src"])
                .select(F.col("dst").alias("node")))

    seed_even = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    seed_odd = seed_even.filter(F.lit(False))

    def step(b):
        return {"even": neighbors(b["odd"]), "odd": neighbors(b["even"])}

    out = let_rec({"even": seed_even, "odd": seed_odd}, step,
                  distinct=True, accumulate=True)
    return (
        out["even"].select("node", F.lit(0).cast("long").alias("par"))
        .unionByName(
            out["odd"].select("node", F.lit(1).cast("long").alias("par")))
    )


@register(
    "agg_map_agg",
    """
    WITH per_nation AS (
      SELECT r_name, n_name, count(*) AS cnt
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name)
    SELECT r_name,
           to_json(map(list(n_name ORDER BY n_name),
                       list(cnt ORDER BY n_name))) AS nation_counts
    FROM per_nation GROUP BY r_name
    """,
    "aggregate", "map_agg", "jsonb",
)
def agg_map_agg(spark, sf_dir):
    """map_agg / jsonb_object_agg: build an ordered key->value map per
    group (AggregateFunc::MapAgg / JsonbObjectAgg,
    src/expr/src/relation/func.rs:1875-1990). Spark: collect entry structs,
    sort (deterministic key order — both engines emit identical compact
    JSON), map_from_entries, to_json. Two-level aggregation: the inner
    count shuffles on (region, nation); the map build then shuffles only
    the 5-row-per-region summaries."""
    t = T(spark, sf_dir)
    per_nation = (
        t.customer
        .join(F.broadcast(t.nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name").agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_nation.groupBy("r_name").agg(
        F.to_json(F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("n_name", "cnt")))))
        .alias("nation_counts"))


def _ivf_oracle() -> str:
    def cos(a, b):
        dot = (f"CAST(list_sum(list_transform(range(1, 65), "
               f"i -> {a}[i] * {b}[i])) AS DOUBLE)")
        na = (f"sqrt(CAST(list_sum(list_transform(range(1, 65), "
              f"i -> {a}[i] * {a}[i])) AS DOUBLE))")
        nb = (f"sqrt(CAST(list_sum(list_transform(range(1, 65), "
              f"i -> {b}[i] * {b}[i])) AS DOUBLE))")
        return f"{dot} / ({na} * {nb})"

    return f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                 AS v
      FROM embeddings),
    cen AS (SELECT vec_id AS cid, v AS cv FROM qv ORDER BY vec_id LIMIT 16),
    assign AS (
      SELECT vec_id, v, cluster FROM (
        SELECT q.vec_id, q.v, c.cid AS cluster,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round({cos('q.v', 'c.cv')}, 9) DESC,
                                           c.cid) AS rn
        FROM qv q CROSS JOIN cen c) WHERE rn = 1),
    queries AS (SELECT vec_id AS qid, v AS qvec FROM qv
                ORDER BY vec_id LIMIT 3),
    probes AS (
      SELECT qid, qvec, cluster FROM (
        SELECT q.qid, q.qvec, c.cid AS cluster,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY round({cos('q.qvec', 'c.cv')}, 9) DESC,
                                           c.cid) AS rn
        FROM queries q CROSS JOIN cen c) WHERE rn <= 4)
    SELECT qid, vec_id, round(rc, 4) AS cos FROM (
      SELECT p.qid, a.vec_id, round({cos('p.qvec', 'a.v')}, 9) AS rc,
             row_number() OVER (PARTITION BY p.qid
                                ORDER BY round({cos('p.qvec', 'a.v')}, 9) DESC,
                                         a.vec_id) AS rn
      FROM probes p JOIN assign a USING (cluster)) WHERE rn <= 10
    """


@register(
    "simsearch_ivf",
    _ivf_oracle(),
    "pipeline", "simsearch", "ivf",
)
def simsearch_ivf(spark, sf_dir):
    """IVF (inverted-file) ANN: nearest-centroid partitioning + probe-only
    search (pipeline/simsearch.ivf_search). Completes the similarity-
    search family: brute-force (simsearch_cosine_topk) is the correctness
    baseline, LSH buckets (simsearch_lsh_buckets) and IVF are the two
    scale paths — IVF trades one broadcast centroid pass for scoring only
    ~nprobe/k_clusters of the corpus per query. Integer-quantized cosine
    makes the routing bit-deterministic across engines (no float-tie
    flakiness in the oracle comparison)."""
    from materialize_spark.pipeline.simsearch import ivf_search

    t = T(spark, sf_dir)
    return ivf_search(t.embeddings, k_clusters=16, nprobe=4, n_queries=3, k=10)


@register(
    "scalar_like_battery",
    """
    SELECT c_custkey,
           c_name LIKE 'Customer#%'            AS like_prefix,
           c_name LIKE '%001'                  AS like_suffix,
           c_name LIKE 'Customer#____01%'      AS like_underscores,
           upper(c_name) ILIKE 'customer#%'    AS ilike_ci,
           c_name NOT LIKE '%XYZ%'             AS not_like,
           'a_b' LIKE 'a!_b' ESCAPE '!'        AS escaped_underscore,
           c_mktsegment ILIKE 'build%'         AS seg_ilike
    FROM customer
    """,
    "scalar", "like",
)
def scalar_like_battery(spark, sf_dir):
    """LIKE family: PG spellings ~~, ~~* (ILIKE), !~~, plus ESCAPE
    (BinaryFunc IsLikeMatch with case-insensitive flag; dialect.py rewrites
    the operator spellings). All compile to Spark's native LIKE/ILIKE —
    codegen string matching, no regex engine for the non-regex cases."""
    t = T(spark, sf_dir)
    n = F.col("c_name")
    return t.customer.select(
        "c_custkey",
        n.like("Customer#%").alias("like_prefix"),
        n.like("%001").alias("like_suffix"),
        n.like("Customer#____01%").alias("like_underscores"),
        F.upper(n).ilike("customer#%").alias("ilike_ci"),
        (~n.like("%XYZ%")).alias("not_like"),
        F.expr(r"'a_b' LIKE 'a!_b' ESCAPE '!'").alias("escaped_underscore"),
        F.col("c_mktsegment").ilike("build%").alias("seg_ilike"),
    )


@register(
    "tablefunc_generate_series_ts",
    """
    SELECT o_orderkey,
           strftime(g, '%Y-%m-%d %H:%M:%S') AS tick
    FROM (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey <= 200),
         unnest(generate_series(o_orderdate,
                                o_orderdate + INTERVAL 3 HOUR,
                                INTERVAL 1 HOUR)) AS t(g)
    """,
    "tablefunc", "generate_series", "timestamp",
)
def tablefunc_generate_series_ts(spark, sf_dir):
    """generate_series over timestamps with an interval stride
    (TableFunc::GenerateSeriesTimestamp) — Spark sequence() accepts
    timestamp bounds + interval step natively; explode is narrow."""
    t = T(spark, sf_dir)
    d = F.col("o_orderdate").cast("timestamp")
    series = F.sequence(d, d + F.expr("INTERVAL 3 HOURS"),
                        F.expr("INTERVAL 1 HOUR"))
    return (
        t.orders.filter(F.col("o_orderkey") <= 200)
        .select("o_orderkey", F.explode(series).alias("g"))
        .select("o_orderkey",
                F.date_format("g", "yyyy-MM-dd HH:mm:ss").alias("tick"))
    )


@register(
    "record_struct_ops",
    """
    SELECT o_orderkey,
           rec.priority                       AS priority,
           round(rec.price, 2)                AS price,
           rec.who.nation                     AS nation_key,
           upper(rec.who.name)                AS cust_upper,
           round(rec.price * 2, 2)            AS price_doubled
    FROM (SELECT o_orderkey,
                 {'priority': o_orderpriority,
                  'price': o_totalprice,
                  'who': {'name': c_name, 'nation': c_nationkey}} AS rec
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE o_orderkey <= 2000)
    """,
    "scalar", "record", "struct",
)
def record_struct_ops(spark, sf_dir):
    """Record{fields} type (SqlScalarType::Record, SURVEY.md §1.2 →
    StructType): build nested records, project fields through two levels,
    compute on extracted fields. Catalyst flattens the struct accesses —
    the nesting is purely logical, no runtime boxing survives
    optimization (check: the optimized plan reads the base columns
    directly)."""
    t = T(spark, sf_dir)
    rec = F.struct(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
        F.struct(F.col("c_name").alias("name"),
                 F.col("c_nationkey").alias("nation")).alias("who"),
    )
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", rec.alias("rec"))
        .select(
            "o_orderkey",
            F.col("rec.priority").alias("priority"),
            F.round("rec.price", 2).alias("price"),
            F.col("rec.who.nation").alias("nation_key"),
            F.upper("rec.who.name").alias("cust_upper"),
            F.round(F.col("rec.price") * 2, 2).alias("price_doubled"),
        )
    )



@register(
    "tablefunc_generate_subscripts",
    """
    SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(x AS BIGINT) AS subscript
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(x)
    WHERE vec_id <= 3
    """,
    "tablefunc", "generate_subscripts",
)
def tablefunc_generate_subscripts(spark, sf_dir):
    """generate_subscripts over the embedding arrays (reference
    TableFunc::GenerateSubscriptsArray): emits each valid 1-based index."""
    from materialize_spark.operators.tablefuncs import generate_subscripts

    t = T(spark, sf_dir)
    out = generate_subscripts(
        t.embeddings.filter(F.col("vec_id") <= 3), "embedding")
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.col("subscript").cast("long").alias("subscript"))


@register(
    "simsearch_ivf_disk",
    _ivf_oracle(),
    "pipeline", "simsearch", "ivf", "index",
)
def simsearch_ivf_disk(spark, sf_dir):
    """Persisted IVF index: vectors written as parquet PARTITIONED BY
    nearest-centroid, then probed with a literal cluster filter so the
    scan reads only nprobe/k_clusters of the directories (partition
    pruning — the 100 TB ANN I/O shape). Must produce results identical
    to the in-memory ivf_search, so it shares that query's oracle."""
    import tempfile

    from materialize_spark.pipeline.simsearch import (
        ivf_probe_index, ivf_write_index)

    t = T(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="mz_ivf_")
    ivf_write_index(t.embeddings, path, k_clusters=16)
    return ivf_probe_index(spark, path, nprobe=4, n_queries=3, k=10)


@register(
    "scalar_decimal38_margin",
    """
    -- Decimal(38) margin battery: where Spark's 38-digit ceiling meets the
    -- reference's Numeric(39). Everything below 39 digits matches DuckDB
    -- exactly; the 39-digit literal is the documented parity edge (NULL
    -- here, representable in the reference).
    SELECT p_partkey,
           CAST(CAST('99999999999999999999999999999.999999999'
                     AS DECIMAL(38,9)) AS VARCHAR)            AS max38,
           CAST(CAST('9999999999999999999999999999.999999999'
                     AS DECIMAL(37,9))
                - CAST(p_partkey AS DECIMAL(37,9))            AS VARCHAR)
                                                              AS max37_minus,
           TRY_CAST('123456789012345678901234567890123456789'
                    AS DECIMAL(38,0))                         AS digits39,
           CAST(CAST(round(CAST(1 AS DECIMAL(20,10))
                           / CAST(p_partkey + 2 AS DECIMAL(20,10)), 9)
                     AS DECIMAL(38,9)) AS VARCHAR)            AS div_round9,
           CAST(round(CAST(p_retailprice + 0.005 AS DECIMAL(18,3)), 2)
                AS VARCHAR)                                   AS round_half_up,
           CAST(round(CAST(-(p_retailprice + 0.005) AS DECIMAL(18,3)), 2)
                AS VARCHAR)                                   AS round_half_neg,
           CAST(CAST(CAST(p_retailprice AS DECIMAL(18,2))
                     * CAST('1.333333' AS DECIMAL(10,6))
                     AS DECIMAL(38,9)) AS VARCHAR)            AS mul_rescale
    FROM part
    """,
    "scalar", "decimal", "numeric",
)
def scalar_decimal38_margin(spark, sf_dir):
    """Decimal(38) boundary semantics, oracle-pinned (VERDICT r5 item 6).

    Columns exercise: identity at full 38-digit precision, exact
    subtraction at precision 37 (headroom for the +1 result digit), the
    39-digit overflow margin (try_cast -> NULL on both engines; the
    reference's Numeric keeps 39 digits — permanent, documented gap,
    reference /root/reference/src/repr/src/scalar.rs Numeric), division
    rounded at scale 9, HALF_UP rounding on positive and negative ties,
    and exact multiplication rescale. All values canonicalized to
    VARCHAR so the hash compare is representation-exact.

    Two REAL parity edges this battery deliberately stays inside of
    (found while building it; see README "Numeric precision"):
    - (38,9) - (38,9) needs precision 39: Spark clamps to (38,8) and
      ROUNDS the last scale digit away; DuckDB (and the reference's
      Numeric) keep scale 9. Operands at (37,9) stay exact on both.
    - Casting an 11-scale product down to scale 9 rounds HALF_UP in
      Spark but can differ by 1 ulp in DuckDB at the truncation edge;
      a scale-6 multiplier keeps the product scale <= 9 (no rounding).
    """
    return sql_over(spark, sf_dir, ("part",), """
        SELECT p_partkey,
               CAST(CAST('99999999999999999999999999999.999999999'
                         AS DECIMAL(38,9)) AS STRING)             AS max38,
               CAST(CAST('9999999999999999999999999999.999999999'
                         AS DECIMAL(37,9))
                    - CAST(p_partkey AS DECIMAL(37,9)) AS STRING)
                                                            AS max37_minus,
               try_cast('123456789012345678901234567890123456789'
                        AS DECIMAL(38,0))                      AS digits39,
               CAST(CAST(round(CAST(1 AS DECIMAL(20,10))
                               / CAST(p_partkey + 2 AS DECIMAL(20,10)), 9)
                         AS DECIMAL(38,9)) AS STRING)          AS div_round9,
               CAST(round(CAST(p_retailprice + 0.005 AS DECIMAL(18,3)), 2)
                    AS STRING)                              AS round_half_up,
               CAST(round(CAST(-(p_retailprice + 0.005) AS DECIMAL(18,3)), 2)
                    AS STRING)                             AS round_half_neg,
               CAST(CAST(CAST(p_retailprice AS DECIMAL(18,2))
                         * CAST('1.333333' AS DECIMAL(10,6))
                         AS DECIMAL(38,9)) AS STRING)        AS mul_rescale
        FROM part
    """)
