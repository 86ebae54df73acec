"""PG-compat builtins: to_char pattern translation, justify_* semantics
(PG-verified expectations), hmac RFC-4231 vectors, encode/decode roundtrips.
"""

import pytest
from pyspark.sql import functions as F

from materialize_spark.functions import pgcompat as P


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_to_char_pattern_translation():
    assert P._translate_pg_format("YYYY-MM-DD") == "yyyy-MM-dd"
    assert P._translate_pg_format("HH24:MI:SS") == "HH:mm:ss"
    assert P._translate_pg_format("DD Mon YYYY") == "dd MMM yyyy"
    # literal pattern letters get quoted
    assert P._translate_pg_format("YYYYT") == "yyyy'T'"


def test_to_char_values(spark):
    df = spark.sql("SELECT TIMESTAMP '1997-06-09 15:04:05' AS ts")
    row = df.select(
        P.to_char("ts", "YYYY-MM-DD HH24:MI:SS").alias("a"),
        P.to_char("ts", "Dy DD Mon YYYY").alias("b"),
        P.to_char("ts", "Q").alias("q"),
        P.to_char("ts", "DDD").alias("doy"),
        P.to_char("ts", "HH12 PM").alias("ampm"),
    ).first()
    assert row.a == "1997-06-09 15:04:05"
    assert row.b == "Mon 09 Jun 1997"
    assert row.q == "2"
    assert row.doy == "160"
    assert row.ampm == "03 PM"


@pytest.mark.parametrize("m,d,us,exp", [
    # justify_hours('27:00') = '1 day 03:00' (PG)
    (0, 0, 27 * 3_600_000_000, (0, 1, 3 * 3_600_000_000)),
    # negative truncates toward zero: '-27:00' -> '-1 day -03:00'
    (0, 0, -27 * 3_600_000_000, (0, -1, -3 * 3_600_000_000)),
])
def test_justify_hours(spark, m, d, us, exp):
    c = P.justify_hours(F.lit(m), F.lit(d), F.lit(us))
    r = _one(spark, c)
    assert (r.months, r.days, r.micros) == exp


def test_justify_days(spark):
    r = _one(spark, P.justify_days(F.lit(0), F.lit(35), F.lit(0)))
    assert (r.months, r.days, r.micros) == (1, 5, 0)
    r = _one(spark, P.justify_days(F.lit(0), F.lit(-35), F.lit(0)))
    assert (r.months, r.days, r.micros) == (-1, -5, 0)


def test_justify_interval_sign_normalization(spark):
    # PG: justify_interval('1 mon -1 hour') = '29 days 23:00:00'
    r = _one(spark, P.justify_interval(F.lit(1), F.lit(0),
                                       F.lit(-3_600_000_000)))
    assert (r.months, r.days, r.micros) == (0, 29, 23 * 3_600_000_000)
    # carry chain: 1 mon 35 days 49 hours -> 2 mon 7 days 1 hour
    r = _one(spark, P.justify_interval(F.lit(1), F.lit(35),
                                       F.lit(49 * 3_600_000_000)))
    assert (r.months, r.days, r.micros) == (2, 7, 3_600_000_000)


def test_with_justified_matches_column_forms(spark):
    """The staged with_justified must agree with the single-Column
    justify_* forms on a signed battery covering every carry/borrow
    branch (zero, ±carry, sign-disagreement borrows, lends)."""
    vals = [(m, d, us)
            for m in (-2, -1, 0, 1, 2)
            for d in (-45, -30, -5, 0, 5, 30, 45)
            for us in (-49 * 3_600_000_000, -3_600_000_000, 0,
                       3_600_000_000, 49 * 3_600_000_000)]
    df = spark.createDataFrame(vals, "m0 long, d0 long, us0 long")
    staged = P.with_justified(df, "m0", "d0", "us0").collect()
    jh = P.justify_hours("m0", "d0", "us0")
    jd = P.justify_days("m0", "d0", "us0")
    ji = P.justify_interval("m0", "d0", "us0")
    col_form = df.select(
        "m0", "d0", "us0",
        jh.months.alias("jh_months"), jh.days.alias("jh_days"),
        jh.micros.alias("jh_micros"),
        jd.months.alias("jd_months"), jd.days.alias("jd_days"),
        jd.micros.alias("jd_micros"),
        ji.months.alias("ji_months"), ji.days.alias("ji_days"),
        ji.micros.alias("ji_micros")).collect()
    key = lambda r: (r.m0, r.d0, r.us0)  # noqa: E731
    cols = ["jh_months", "jh_days", "jh_micros",
            "jd_months", "jd_days", "jd_micros",
            "ji_months", "ji_days", "ji_micros"]
    for s, c in zip(sorted(staged, key=key), sorted(col_form, key=key)):
        assert [s[k] for k in cols] == [c[k] for k in cols], key(s)


def test_encode_decode_roundtrip(spark):
    df = spark.sql("SELECT 'Customer#000001' AS s")
    row = df.select(
        P.encode("s", "base64").alias("b64"),
        P.encode("s", "hex").alias("hx"),
        F.decode(P.decode(P.encode("s", "base64"), "base64"), "UTF-8").alias("rt"),
    ).first()
    import base64
    assert row.b64 == base64.b64encode(b"Customer#000001").decode()
    assert row.hx == b"Customer#000001".hex()
    assert row.rt == "Customer#000001"


def test_digest_known_values(spark):
    df = spark.sql("SELECT 'abc' AS s")
    row = df.select(
        P.digest("s", "md5").alias("m"),
        P.digest("s", "sha1").alias("s1"),
        P.digest("s", "sha256").alias("s2"),
        P.digest("s", "sha512").alias("s5"),
    ).first()
    import hashlib
    assert row.m == hashlib.md5(b"abc").hexdigest()
    assert row.s1 == hashlib.sha1(b"abc").hexdigest()
    assert row.s2 == hashlib.sha256(b"abc").hexdigest()
    assert row.s5 == hashlib.sha512(b"abc").hexdigest()


def test_hmac_rfc4231_vector(spark):
    # RFC 4231 test case 2: key "Jefe", data "what do ya want for nothing?"
    df = spark.sql("SELECT 'what do ya want for nothing?' AS s")
    got = df.select(P.hmac("s", "Jefe", "sha256").alias("h")).first().h
    assert got == ("5bdcc146bf60754e6a042426089575c7"
                   "5a003f089d2739839dec58b964ec3843")


def test_regexp_split_keeps_interior_empties(spark):
    df = spark.sql("SELECT 'a,,b' AS s")
    arr = df.select(P.regexp_split_to_array("s", ",").alias("a")).first().a
    assert arr == ["a", "", "b"]


def test_jsonb_mutations_canonical(spark):
    from materialize_spark.functions.jsonb import (
        jsonb_concat, jsonb_delete, jsonb_set,
    )
    df = spark.sql("""SELECT '{"b":2,"a":1}' AS j""")
    row = df.select(
        jsonb_set("j", "c", F.lit(3)).alias("set_c"),
        jsonb_set("j", "a", F.lit(9)).alias("overwrite_a"),
        jsonb_delete("j", "a").alias("del_a"),
        jsonb_concat("j", F.lit('{"a":7,"z":0}')).alias("cat"),
    ).first()
    # canonical: sorted keys, compact
    assert row.set_c == '{"a":1,"b":2,"c":3}'
    assert row.overwrite_a == '{"a":9,"b":2}'
    assert row.del_a == '{"b":2}'
    assert row.cat == '{"a":7,"b":2,"z":0}'  # right side wins


def test_uuid_v3_text_stable_and_valid(spark):
    import uuid
    from materialize_spark.functions.pgcompat import uuid_v3_text
    got = [r.u for r in
           spark.range(3).select(uuid_v3_text("ns", "id").alias("u"))
           .collect()]
    assert len(set(got)) == 3
    for g in got:
        u = uuid.UUID(g)
        assert u.version == 3
    again = [r.u for r in
             spark.range(3).select(uuid_v3_text("ns", "id").alias("u"))
             .collect()]
    assert got == again


def test_to_char_cased_and_padded_names(spark):
    df = spark.sql("SELECT TIMESTAMP '1997-06-09 15:04:05' AS ts")
    row = df.select(
        P.to_char("ts", "MON").alias("mon_up"),
        P.to_char("ts", "mon").alias("mon_lo"),
        P.to_char("ts", "MONTH").alias("month_up"),
        P.to_char("ts", "Month").alias("month_pad"),
        P.to_char("ts", "DAY").alias("day_up"),
        P.to_char("ts", "Dy, DD").alias("mixed"),
    ).first()
    # PG renders MON/MONTH/DAY upper-case; Month/Day blank-pad to 9 chars
    assert row.mon_up == "JUN" and row.mon_lo == "jun"
    assert row.month_up == "JUNE     "
    assert row.month_pad == "June     "
    assert row.day_up == "MONDAY   "
    assert row.mixed == "Mon, 09"


def test_to_char_ww_and_julian(spark):
    df = spark.sql("SELECT TIMESTAMP '2000-01-01 00:00:00' AS ts")
    row = df.select(
        P.to_char("ts", "WW").alias("ww"),
        P.to_char("ts", "J").alias("j"),
    ).first()
    # PG: to_char('2000-01-01','WW') = '01', Julian day 2451545
    assert row.ww == "01"
    assert row.j == "2451545"
    df2 = spark.sql("SELECT TIMESTAMP '1997-06-09 00:00:00' AS ts")
    row2 = df2.select(P.to_char("ts", "WW").alias("ww")).first()
    assert row2.ww == "23"  # doy 160 -> (160-1)//7+1


def test_trunc_div_exact_at_large_magnitudes(spark):
    # 2^60 micros: double division would be off by ULPs here
    n = 1 << 60
    d = 86_400_000_000
    got = _one(spark, P._trunc_div(F.lit(n).cast("long"), d))
    assert got == n // d
    got_neg = _one(spark, P._trunc_div(F.lit(-n).cast("long"), d))
    assert got_neg == -(n // d)
