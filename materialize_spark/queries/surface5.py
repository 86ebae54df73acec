"""Fifth surface wave: PG-compat builtins the round-3 review flagged as the
top coverage gap — to_char, justify_days/hours/interval,
regexp_split_to_array/to_table, encode/decode, digest.

Reference parity: ToCharTimestamp (src/expr/src/scalar/func.rs:157,1740),
JustifyDays/JustifyHours/JustifyInterval (func.rs unary interval funcs),
RegexpSplitToArray + Encode/Decode/Digest
(src/expr/src/scalar/func/variadic.rs). Names and semantics follow the
catalog surface in /root/reference/src/sql/src/func.rs (PG_CATALOG_BUILTINS).

All batteries are pure column expressions (whole-stage codegen); hmac —
the one non-JVM function — is exercised in pytest with RFC 4231 vectors
(DuckDB cannot compute it either, so there is no meaningful oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from materialize_spark.functions.pgcompat import (
    digest,
    encode,
    regexp_split_to_table,
    to_char,
    with_justified,
)
from materialize_spark.queries import register
from materialize_spark.queries.util import T

# trunc-toward-zero integer division for the SQL oracle (DuckDB's // floors;
# PG interval justification truncates).
_TRUNC_DIV = "(CASE WHEN {n} < 0 THEN -1 ELSE 1 END * CAST(trunc(abs({n}) / {d}) AS BIGINT))"


@register(
    "scalar_to_char",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')       AS iso_day,
           strftime(o_orderdate, '%d %b %Y')       AS pretty_day,
           strftime(o_orderdate, '%a')             AS dow_abbrev,
           strftime(o_orderdate, '%j')             AS day_of_year,
           CAST(quarter(o_orderdate) AS VARCHAR)   AS qtr
    FROM orders WHERE o_orderkey <= 2000
    """,
    "scalar", "to_char", "datetime",
)
def scalar_to_char(spark, sf_dir):
    """to_char over the supported PG token set (func.rs ToCharTimestamp).

    The oracle uses DuckDB's strftime with the equivalent C99 patterns —
    same rendered text, which is exactly what to_char is for.
    """
    t = T(spark, sf_dir)
    d = F.col("o_orderdate")
    return (
        t.orders.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            to_char(d, "YYYY-MM-DD").alias("iso_day"),
            to_char(d, "DD Mon YYYY").alias("pretty_day"),
            to_char(d, "Dy").alias("dow_abbrev"),
            to_char(d, "DDD").alias("day_of_year"),
            to_char(d, "Q").alias("qtr"),
        )
    )


def _justify_oracle() -> str:
    td_us = _TRUNC_DIV.format(n="us0", d=86400000000)
    td_d = _TRUNC_DIV.format(n="d0", d=30)
    # justify_interval: carry hours->days->months, then PG sign
    # normalization (borrow a unit downward when component signs disagree
    # with the leading component) — mirrors pgcompat.justify_interval.
    return f"""
    WITH src AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_suppkey % 25 - 12 AS BIGINT)  AS m0,
               CAST(l_partkey % 100 - 50 AS BIGINT) AS d0,
               CAST((l_orderkey % 90000 - 45000) AS BIGINT) * 1000000 AS us0
        FROM lineitem WHERE l_orderkey <= 1000
    ), jh AS (
        SELECT *, {td_us} AS hcarry FROM src
    ), jd AS (
        SELECT *, {td_d} AS dcarry FROM jh
    ), ji0 AS (
        SELECT *,
               d0 + hcarry AS ji_d2,
               us0 - hcarry * 86400000000 AS ji_us2
        FROM jd
    ), ji1 AS (
        SELECT *,
               m0 + {_TRUNC_DIV.format(n="ji_d2", d=30)} AS ji_m2,
               ji_d2 - {_TRUNC_DIV.format(n="ji_d2", d=30)} * 30 AS ji_d3
        FROM ji0
    ), ji2 AS (
        SELECT *,
            CASE WHEN ji_m2 > 0 AND (ji_d3 < 0 OR (ji_d3 = 0 AND ji_us2 < 0))
                 THEN ji_m2 - 1 ELSE ji_m2 END AS ji_m3,
            CASE WHEN ji_m2 > 0 AND (ji_d3 < 0 OR (ji_d3 = 0 AND ji_us2 < 0))
                 THEN ji_d3 + 30 ELSE ji_d3 END AS ji_d4
        FROM ji1
    ), ji3 AS (
        SELECT *,
            CASE WHEN ji_m2 < 0 AND (ji_d4 > 0 OR (ji_d4 = 0 AND ji_us2 > 0))
                 THEN ji_m3 + 1 ELSE ji_m3 END AS ji_m4,
            CASE WHEN ji_m2 < 0 AND (ji_d4 > 0 OR (ji_d4 = 0 AND ji_us2 > 0))
                 THEN ji_d4 - 30 ELSE ji_d4 END AS ji_d5
        FROM ji2
    ), ji4 AS (
        SELECT *,
            CASE WHEN ji_d5 > 0 AND ji_us2 < 0 THEN ji_d5 - 1 ELSE ji_d5 END AS ji_d6,
            CASE WHEN ji_d5 > 0 AND ji_us2 < 0 THEN ji_us2 + 86400000000 ELSE ji_us2 END AS ji_us3
        FROM ji3
    ), ji5 AS (
        SELECT *,
            CASE WHEN ji_d6 < 0 AND ji_us3 > 0 THEN ji_d6 + 1 ELSE ji_d6 END AS ji_d7,
            CASE WHEN ji_d6 < 0 AND ji_us3 > 0 THEN ji_us3 - 86400000000 ELSE ji_us3 END AS ji_us4
        FROM ji4
    )
    SELECT l_orderkey, l_linenumber,
           m0 AS jh_months, d0 + hcarry AS jh_days,
           us0 - hcarry * 86400000000 AS jh_micros,
           m0 + dcarry AS jd_months, d0 - dcarry * 30 AS jd_days,
           us0 AS jd_micros,
           ji_m4 AS ji_months, ji_d7 AS ji_days, ji_us4 AS ji_micros
    FROM ji5
    """


@register(
    "scalar_justify_interval",
    _justify_oracle(),
    "scalar", "interval", "justify",
)
def scalar_justify_interval(spark, sf_dir):
    """justify_hours/days/interval over signed synthetic intervals derived
    from lineitem keys (covers carry, truncation-toward-zero, and the
    sign-normalization borrows of func.rs JustifyInterval). Uses the
    staged ``with_justified`` form — same step functions as the Column
    API, staged as named columns so the plan stays linear-size (the
    single-Column form built an exponentially duplicated tree: 15.6 s
    analysis+plan+exec at sf0.01 vs 2.4 s staged; values identical,
    pinned by tests/test_pgcompat.py)."""
    t = T(spark, sf_dir)
    li = (
        t.lineitem.filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey", "l_linenumber",
            (F.col("l_suppkey") % 25 - 12).cast("long").alias("m0"),
            (F.col("l_partkey") % 100 - 50).cast("long").alias("d0"),
            ((F.col("l_orderkey") % 90000 - 45000).cast("long")
             * 1_000_000).alias("us0"),
        )
    )
    return with_justified(li, "m0", "d0", "us0").select(
        "l_orderkey", "l_linenumber",
        "jh_months", "jh_days", "jh_micros",
        "jd_months", "jd_days", "jd_micros",
        "ji_months", "ji_days", "ji_micros",
    )


@register(
    "scalar_encode_digest",
    """
    SELECT c_custkey,
           base64(CAST(c_name AS BLOB))                       AS b64,
           lower(hex(CAST(c_name AS BLOB)))                   AS hexed,
           CAST(from_base64(base64(CAST(c_name AS BLOB))) AS VARCHAR)
                                                              AS b64_roundtrip,
           md5(c_name)                                        AS md5_hex,
           sha256(c_name)                                     AS sha256_hex
    FROM customer WHERE c_custkey <= 1000
    """,
    "scalar", "encode", "digest", "pgcrypto",
)
def scalar_encode_digest(spark, sf_dir):
    """encode/decode (base64, hex) + digest (md5, sha256) — variadic.rs
    Encode/Decode/Digest. All JVM builtins; lowercase-hex canonical form on
    both engines."""
    t = T(spark, sf_dir)
    name = F.col("c_name")
    return (
        t.customer.filter(F.col("c_custkey") <= 1000)
        .select(
            "c_custkey",
            encode(name, "base64").alias("b64"),
            encode(name, "hex").alias("hexed"),
            F.decode(F.unbase64(encode(name, "base64")), "UTF-8")
                .alias("b64_roundtrip"),
            digest(name, "md5").alias("md5_hex"),
            digest(name, "sha256").alias("sha256_hex"),
        )
    )


@register(
    "tablefunc_regexp_split",
    """
    SELECT c_custkey, piece
    FROM (
        SELECT c_custkey,
               unnest(regexp_split_to_array(c_name, '[#_]+')) AS piece
        FROM customer WHERE c_custkey <= 1000
    )
    """,
    "tablefunc", "regexp_split",
)
def tablefunc_regexp_split(spark, sf_dir):
    """regexp_split_to_table (variadic.rs RegexpSplitToArray + FlatMap) —
    one row per split piece; interior empty fields kept, PG-style."""
    t = T(spark, sf_dir)
    return (
        t.customer.filter(F.col("c_custkey") <= 1000)
        .select("c_custkey",
                regexp_split_to_table("c_name", "[#_]+").alias("piece"))
    )


@register(
    "scalar_pg_compat3",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < -1000.0 THEN 0
                WHEN c_acctbal >= 10000.0 THEN 21
                ELSE CAST(floor((c_acctbal - (-1000.0))
                                / ((10000.0 - (-1000.0)) / 20.0)) AS BIGINT) + 1
           END                                         AS bal_bucket,
           substr(c_name, 1, 2) || 'XXX' || substr(c_name, 7)
                                                       AS name_masked,
           upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
                                                       AS seg_initcap,
           chr(65 + CAST(c_custkey % 26 AS INTEGER))   AS letter,
           CAST(ascii(substr(c_name, 1, 1)) AS BIGINT) AS first_ascii,
           repeat('ab', CAST(c_custkey % 4 AS INTEGER)) AS repeated,
           reverse(c_mktsegment)                        AS seg_rev,
           CAST(bit_length(c_name) AS BIGINT)           AS name_bits,
           left(c_name, 9)                              AS name_l,
           right(c_name, 4)                             AS name_r,
           translate(c_name, '#0', '-x')                AS name_trans,
           CAST(strpos(c_name, '#') AS BIGINT)          AS hash_pos,
           starts_with(c_name, 'Customer')              AS is_cust,
           CAST(array_position(string_to_array(c_name, '#'),
                               right(c_name, 9)) AS BIGINT) AS num_part_idx,
           printf('%s:%05d', c_mktsegment, CAST(c_custkey AS INTEGER))
                                                        AS fmt
    FROM customer WHERE c_custkey <= 1000
    """,
    "scalar", "pg-compat",
)
def scalar_pg_compat3(spark, sf_dir):
    """Third PG-compat scalar battery: width_bucket, overlay, initcap,
    chr/ascii, repeat/reverse, bit_length, left/right, translate, strpos,
    starts_with, string_to_array + array_position, format.

    Reference: the pg_catalog builtin surface
    (/root/reference/src/sql/src/func.rs PG_CATALOG_BUILTINS). Where DuckDB
    lacks the builtin (width_bucket, overlay, initcap) the oracle states
    the defining formula instead — same output, independent derivation.
    All columns are JVM builtins (whole-stage codegen)."""
    t = T(spark, sf_dir)
    name, seg = F.col("c_name"), F.col("c_mktsegment")
    return (
        t.customer.filter(F.col("c_custkey") <= 1000)
        .select(
            "c_custkey",
            F.width_bucket(F.col("c_acctbal"), F.lit(-1000.0),
                           F.lit(10000.0), F.lit(20)).alias("bal_bucket"),
            F.overlay(name, F.lit("XXX"), F.lit(3), F.lit(4))
                .alias("name_masked"),
            F.initcap(F.lower(seg)).alias("seg_initcap"),
            F.chr(F.lit(65) + (F.col("c_custkey") % 26)).alias("letter"),
            F.ascii(F.substring(name, 1, 1)).cast("long").alias("first_ascii"),
            F.repeat(F.lit("ab"), (F.col("c_custkey") % 4).cast("int"))
                .alias("repeated"),
            F.reverse(seg).alias("seg_rev"),
            F.bit_length(name).cast("long").alias("name_bits"),
            F.left(name, F.lit(9)).alias("name_l"),
            F.right(name, F.lit(4)).alias("name_r"),
            F.translate(name, "#0", "-x").alias("name_trans"),
            F.instr(name, "#").cast("long").alias("hash_pos"),
            F.startswith(name, F.lit("Customer")).alias("is_cust"),
            F.array_position(F.split(name, "#"), F.right(name, F.lit(9)))
                .cast("long").alias("num_part_idx"),
            F.format_string("%s:%05d", seg, F.col("c_custkey").cast("int"))
                .alias("fmt"),
        )
    )


@register(
    "jsonb_mutation",
    """
    SELECT event_id,
           '{"k":' || k || ',"v":' || k * 2 || '}'  AS set_v,
           '{}'                                      AS del_k,
           '{"k":' || k || ',"m":1}'                 AS concat_m,
           '{"e":"' || event_type || '","k":' || k || '}' AS built,
           '{"k":' || k || '}'                       AS stripped
    FROM (
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events WHERE event_id <= 2000
    )
    """,
    "jsonb", "mutation",
)
def jsonb_mutation(spark, sf_dir):
    """jsonb_set / `- key` / `||` / jsonb_build_object / jsonb_strip_nulls
    over the events.props payloads, all in jsonb canonical form (sorted
    keys, no whitespace). The oracle constructs the expected documents by
    string concatenation — an independent derivation of the same canonical
    form (binary.rs JsonbConcat/JsonbDeleteString parity)."""
    from materialize_spark.functions.jsonb import (
        jsonb_concat, jsonb_delete, jsonb_get, jsonb_set, jsonb_strip_nulls,
    )
    t = T(spark, sf_dir)
    k = jsonb_get("props", "k").cast("long")
    with_null = F.concat(F.lit('{"a":null,"k":'), k.cast("string"), F.lit("}"))
    built = F.to_json(F.struct(F.col("event_type").alias("e"), k.alias("k")))
    return (
        t.events.filter(F.col("event_id") <= 2000)
        .select(
            "event_id",
            jsonb_set("props", "v", k * 2).alias("set_v"),
            jsonb_delete("props", "k").alias("del_k"),
            jsonb_concat("props", F.lit('{"m":1}')).alias("concat_m"),
            built.alias("built"),
            jsonb_strip_nulls(with_null, "bigint").alias("stripped"),
        )
    )


@register(
    "window_session_native",
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                  THEN 1 ELSE 0 END AS is_start
      FROM events WHERE user_id <= 50
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sessions AS (
      SELECT user_id, ts, value,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM sessions GROUP BY user_id, sid
    """,
    "window", "session", "native",
)
def window_session_native(spark, sf_dir):
    """Spark's native F.session_window in BATCH, proven against a
    gaps-and-islands SQL oracle — the same stateful operator the streaming
    path uses (streaming/sessions.py), so a green row here certifies the
    session semantics end to end. Note the >= gap split convention:
    F.session_window merges events strictly closer than the gap.

    Scale: one shuffle on user_id; the window-merge is the native
    state-store session operator, no Python."""
    t = T(spark, sf_dir)
    ev = t.events.filter(F.col("user_id") <= 50)
    win = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy(win, "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("user_id").cast("long").alias("user_id"),
                F.date_format(F.col("session_window.start"),
                              "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                "n_events", "total_value")
    )


@register(
    "array_functions2",
    """
    SELECT p_partkey,
           array_to_string(list_concat(words, ['x', 'y']), '-')   AS cat_xy,
           array_to_string([first_w, first_w, first_w], '-') AS filled,
           array_to_string([CAST(i AS BIGINT) FOR i IN generate_series(1, len(words))
                            IF words[i] = first_w], ',')          AS first_positions,
           array_to_string(list_filter(words, w -> w != first_w), '-') AS removed,
           array_to_string(list_transform(words,
                w -> CASE WHEN w = first_w THEN 'REPL' ELSE w END), '-') AS replaced,
           CAST(len(words) AS BIGINT)                             AS cardinality_v,
           array_to_string(list_append(list_prepend('head', words), 'tail'), '-')
                                                                  AS pre_app,
           array_to_string(words[1:len(words)-1], '-')            AS trimmed
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words,
                 string_split(p_name, ' ')[1] AS first_w
          FROM part WHERE p_partkey <= 2000)
    """,
    "collections", "array", "pg-compat",
)
def array_functions2(spark, sf_dir):
    """PG array builtins round 2: array_cat, array_fill, array_positions
    (all occurrences of a value), array_remove, array_replace, cardinality,
    array_prepend/append, trim_array (func.rs pg_catalog array family).
    All JVM higher-order/array expressions; arrays canonicalized to joined
    strings per the repo convention."""
    t = T(spark, sf_dir)
    df = (t.part.filter(F.col("p_partkey") <= 2000)
          .select("p_partkey", F.split("p_name", " ").alias("words"))
          .withColumn("first_w", F.element_at("words", 1)))
    w, fw = F.col("words"), F.col("first_w")
    positions = F.filter(
        F.transform(w, lambda x, i: F.when(x == fw, i + 1)),
        lambda p: p.isNotNull())
    return df.select(
        "p_partkey",
        F.array_join(F.concat(w, F.array(F.lit("x"), F.lit("y"))), "-")
            .alias("cat_xy"),
        F.array_join(F.array_repeat(fw, 3), "-").alias("filled"),
        F.array_join(positions.cast("array<string>"), ",")
            .alias("first_positions"),
        F.array_join(F.array_remove(w, fw), "-").alias("removed"),
        F.array_join(
            F.transform(w, lambda x: F.when(x == fw, F.lit("REPL"))
                        .otherwise(x)), "-").alias("replaced"),
        F.size(w).cast("long").alias("cardinality_v"),
        F.array_join(
            F.concat(F.array(F.lit("head")), w, F.array(F.lit("tail"))), "-")
            .alias("pre_app"),
        F.array_join(F.slice(w, 1, F.size(w) - 1), "-").alias("trimmed"),
    )


@register(
    "scalar_string2",
    """
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0')       AS padded_key,
           rpad(c_mktsegment, 12, '.')                     AS padded_seg,
           trim('  ' || c_mktsegment || '  ')              AS btrimmed,
           trim(c_name, 'Cr0123456789')                    AS trim_chars,
           ltrim(c_name, 'Cust')                           AS ltrim_chars,
           rtrim(c_name, '0123456789')                     AS rtrim_chars,
           concat_ws(':', c_mktsegment, CAST(c_custkey AS VARCHAR),
                     CAST(c_nationkey AS VARCHAR))         AS joined,
           regexp_extract(c_name, '([0-9]+)', 1)           AS num_part,
           split_part(c_name, '#', 2)                      AS after_hash,
           CASE WHEN regexp_matches(c_mktsegment, '^[a-z_][a-z0-9_]*$')
                THEN c_mktsegment
                ELSE '"' || replace(c_mktsegment, '"', '""') || '"' END
                                                           AS quoted_ident,
           array_to_string([CASE WHEN regexp_matches(s, '^".*"$')
                                 THEN replace(s[2:len(s)-1], '""', '"')
                                 ELSE s END
                            FOR s IN string_split(lower(c_mktsegment)
                                     || '.' || 'tbl', '.')], '|')
                                                           AS parsed_ident
    FROM customer WHERE c_custkey <= 1500
    """,
    "scalar", "string", "pg-compat",
)
def scalar_string2(spark, sf_dir):
    """Second string battery: lpad/rpad, btrim, trim/ltrim/rtrim with
    character sets, concat_ws, substring-by-regex, split_part, quote_ident,
    parse_ident (func.rs pg_catalog string family; quote/parse_ident in
    functions/strings.py)."""
    from materialize_spark.functions.strings import (
        parse_ident, quote_ident, split_part,
    )
    t = T(spark, sf_dir)
    name, seg = F.col("c_name"), F.col("c_mktsegment")
    return (
        t.customer.filter(F.col("c_custkey") <= 1500)
        .select(
            "c_custkey",
            F.lpad(F.col("c_custkey").cast("string"), 12, "0")
                .alias("padded_key"),
            F.rpad(seg, 12, ".").alias("padded_seg"),
            F.btrim(F.concat(F.lit("  "), seg, F.lit("  "))).alias("btrimmed"),
            F.btrim(name, F.lit("Cr0123456789")).alias("trim_chars"),
            F.ltrim(name, F.lit("Cust")).alias("ltrim_chars"),
            F.rtrim(name, F.lit("0123456789")).alias("rtrim_chars"),
            F.concat_ws(":", seg, F.col("c_custkey").cast("string"),
                        F.col("c_nationkey").cast("string")).alias("joined"),
            F.regexp_extract(name, "([0-9]+)", 1).alias("num_part"),
            split_part(name, "#", 2).alias("after_hash"),
            quote_ident(seg).alias("quoted_ident"),
            F.array_join(
                parse_ident(F.concat(F.lower(seg), F.lit(".tbl"))), "|")
                .alias("parsed_ident"),
        )
    )


@register(
    "scalar_uuid",
    """
    WITH h AS (
      SELECT doc_id, md5('corpus:' || CAST(doc_id AS VARCHAR)) AS x
      FROM documents)
    SELECT doc_id,
           substr(x,1,8) || '-' || substr(x,9,4) || '-3' || substr(x,14,3)
           || '-' || translate(substr(x,17,1),
                               '0123456789abcdef', '89ab89ab89ab89ab')
           || substr(x,18,3) || '-' || substr(x,21,12) AS doc_uuid
    FROM h
    """,
    "scalar", "uuid",
)
def scalar_uuid(spark, sf_dir):
    """Deterministic per-document UUIDs (functions/pgcompat.uuid_v3_text):
    RFC-4122 v3 format with correct version/variant bits, md5 over a text
    namespace — the stable document-identity primitive a pipeline keys
    everything on. Scan-side projection, no shuffle."""
    from materialize_spark.functions.pgcompat import uuid_v3_text
    t = T(spark, sf_dir)
    return t.documents.select(
        "doc_id", uuid_v3_text("corpus", "doc_id").alias("doc_uuid"))


@register(
    "sink_iceberg_roundtrip",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
    """,
    "sink", "iceberg",
)
def sink_iceberg_roundtrip(spark, sf_dir):
    """Iceberg-shaped sink roundtrip (reference Iceberg sink,
    src/storage-types/src/sinks.rs:137-140): two commits (snapshot +
    append) into a versioned table, read back the current snapshot.
    Snapshot-log and time-travel semantics are pinned in
    tests/test_iceberg_lite.py."""
    import tempfile

    from materialize_spark.sinks.iceberg_lite import (
        read_iceberg, write_iceberg,
    )

    t = T(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="mz_iceberg_")
    nation = t.nation.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name")
    write_iceberg(nation.filter(F.col("n_nationkey") <= 12), d)
    write_iceberg(nation.filter(F.col("n_nationkey") > 12), d, mode="append")
    return read_iceberg(spark, d)


@register(
    "scalar_pg_compat4",
    """
    SELECT o_orderkey,
           CASE WHEN len(string_split(o_orderpriority, '-')) > 0 THEN 1 END
             AS arr_lower,
           CAST(len(string_split(o_orderpriority, '-')) AS BIGINT)
             AS arr_upper,
           array_to_string(string_split(o_orderpriority, '-')
                           || string_split(o_orderstatus, '-'), ',')
             AS arr_cat,
           'bigint'            AS typeof_key,
           'timestamp'         AS typeof_date,
           (o_orderstatus = o_orderpriority) AS ct_eq,
           strftime(try_strptime('2023-07-0' || CAST(o_orderkey % 9 + 1 AS VARCHAR)
                                 || 'T12:34:56Z', '%Y-%m-%dT%H:%M:%SZ'),
                    '%Y-%m-%d %H:%M:%S') AS iso_parsed,
           try_strptime(o_orderpriority, '%Y-%m-%dT%H:%M:%SZ') IS NULL
             AS iso_reject,
           CAST((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1)
                AS INT) AS age_months
    FROM orders WHERE o_orderkey <= 1000
    """,
    "scalar", "pg-compat",
)
def scalar_pg_compat4(spark, sf_dir):
    """Builtin-surface tail battery: array_lower/array_upper/array_cat
    (func.rs pg_catalog array builtins), pg_typeof (plan-time type name),
    constant_time_eq (timing-safe equality — semantics-equal comparison in
    batch), try_parse_monotonic_iso8601_timestamp (NULL on non-ISO input,
    reference src/expr/src/scalar/func.rs TryParseMonotonicIso8601
    Timestamp), and age() month arithmetic (PG symbolic interval)."""
    from materialize_spark.functions.datetime import age

    t = T(spark, sf_dir)
    arr_a = F.split(F.col("o_orderpriority"), "-")
    arr_b = F.split(F.col("o_orderstatus"), "-")
    iso = F.concat(F.lit("2023-07-0"),
                   (F.col("o_orderkey") % 9 + 1).cast("string"),
                   F.lit("T12:34:56Z"))
    o = t.orders.filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        # array_lower(arr, 1): 1 for non-empty arrays, NULL otherwise
        F.when(F.size(arr_a) > 0, F.lit(1)).alias("arr_lower"),
        F.size(arr_a).cast("long").alias("arr_upper"),
        F.array_join(F.concat(arr_a, arr_b), ",").alias("arr_cat"),
        # pg_typeof is resolved at plan time from the schema
        F.lit(dict(o.dtypes)["o_orderkey"]).alias("typeof_key"),
        F.lit(dict(o.dtypes)["o_orderdate"]).alias("typeof_date"),
        (F.col("o_orderstatus") == F.col("o_orderpriority")).alias("ct_eq"),
        F.date_format(
            F.try_to_timestamp(iso, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
            "yyyy-MM-dd HH:mm:ss").alias("iso_parsed"),
        F.try_to_timestamp(F.col("o_orderpriority"),
                           F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).isNull()
        .alias("iso_reject"),
        age("o_orderdate", F.lit("1995-01-15").cast("timestamp"))["months"]
        .alias("age_months"),
    )


@register(
    "jsonb_path_battery",
    """
    WITH j AS (
      SELECT event_id, props,
             json_object('t', event_type,
                         'm', json_object('v', value,
                                          'arr', json_array(value, value * 2)))
               AS doc
      FROM events WHERE event_id <= 2000)
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(doc, '$.t')                   AS t_txt,
           round(CAST(json_extract_string(doc, '$.m.v') AS DOUBLE), 6)
             AS nested_v,
           round(CAST(json_extract_string(doc, '$.m.arr[1]') AS DOUBLE), 6)
             AS arr1,
           json_extract_string(props, '$.k') IS NOT NULL     AS has_k,
           json_extract_string(props, '$.nope') IS NOT NULL  AS has_nope
    FROM j
    """,
    "jsonb", "jsonpath",
)
def jsonb_path_battery(spark, sf_dir):
    """SQL/JSON path battery: jsonb_path_query_first / jsonb_path_exists
    over the member/index path dialect, against both a stored JSON column
    (events.props) and a nested document built in-query. All JVM-side
    (get_json_object); no parsing in Python."""
    from materialize_spark.functions.jsonb import (
        jsonb_path_exists, jsonb_path_query_first,
    )

    t = T(spark, sf_dir)
    doc = F.to_json(F.struct(
        F.col("event_type").alias("t"),
        F.struct(F.col("value").alias("v"),
                 F.array(F.col("value"), F.col("value") * 2).alias("arr"))
        .alias("m")))
    return (
        t.events.filter(F.col("event_id") <= 2000)
        .select(
            "event_id",
            jsonb_path_query_first("props", "$.k").cast("long").alias("k_val"),
            jsonb_path_query_first(doc, "$.t").alias("t_txt"),
            F.round(jsonb_path_query_first(doc, "$.m.v").cast("double"), 6)
            .alias("nested_v"),
            F.round(jsonb_path_query_first(doc, "$.m.arr[1]").cast("double"),
                    6).alias("arr1"),
            jsonb_path_exists("props", "$.k").alias("has_k"),
            jsonb_path_exists("props", "$.nope").alias("has_nope"),
        ))
