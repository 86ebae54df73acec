"""PG-compatibility scalar builtins: to_char, justify_*, regexp_split,
encode/decode, digest/hmac.

Reference parity targets:
- ToCharTimestamp / to_char_timestamp_format
  (/root/reference/src/expr/src/scalar/func.rs:157,1740) with the PG
  format-pattern grammar in
  /root/reference/src/pgrepr/src/format/chrono.rs (DATE_FORMAT nodes).
- JustifyDays / JustifyHours / JustifyInterval unary funcs
  (/root/reference/src/expr/src/scalar/func.rs — interval normalization,
  PG semantics: truncation toward zero per component).
- RegexpSplitToArray (variadic.rs), Encode/Decode + Digest/Hmac
  (/root/reference/src/expr/src/scalar/func/variadic.rs — pgcrypto shim).

Everything except hmac is pure column expressions (whole-stage codegen).
hmac has no JVM builtin; it is a vectorized Arrow pandas_udf — the
documented slow path, used only when called.

Interval representation: the engine models SQL INTERVAL as a
(months, days, micros) struct — same triple the reference's Interval type
carries (src/repr/src/adt/interval.rs) — because Spark's two native
interval types cannot mix month and sub-day fields.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

DAY_US = 86_400_000_000
MONTH_DAYS = 30


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


# -- to_char ----------------------------------------------------------------

# PG pattern token -> rendering spec, longest-match scan ('DDD' before
# 'DD', 'MONTH' before 'MON'). A spec is either a java.time pattern
# fragment (str), a (case, pattern, pad_width) tuple for PG's cased /
# blank-padded name tokens (PG renders MONTH upper-case and pads
# Month/MONTH/Day/DAY to 9 chars), or a callable(ts) -> Column for tokens
# java.time cannot express (WW = Jan-1-anchored week, J = Julian day).
_PAD_NAME = 9  # PG blank-pads full month/day names to 9 characters


def _ww(ts: Column) -> Column:
    # PG 'WW': week of year with week 1 starting Jan 1, zero-padded to 2.
    return F.lpad((F.floor((F.dayofyear(ts) - 1) / 7) + 1).cast("string"),
                  2, "0")


def _julian_day(ts: Column) -> Column:
    # Julian day number: days since the Julian epoch; JDN(1970-01-01) =
    # 2440588 (e.g. JDN(2000-01-01) = 2451545). Integer date arithmetic.
    return (F.datediff(ts.cast("date"), F.lit("1970-01-01").cast("date"))
            + 2440588).cast("string")


_TO_CHAR_TOKENS: list[tuple[str, object]] = [
    ("YYYY", "yyyy"), ("YY", "yy"),
    ("MONTH", ("upper", "MMMM", _PAD_NAME)),
    ("Month", ("asis", "MMMM", _PAD_NAME)),
    ("month", ("lower", "MMMM", _PAD_NAME)),
    ("MON", ("upper", "MMM", 0)), ("Mon", "MMM"), ("mon", ("lower", "MMM", 0)),
    ("MM", "MM"),
    ("DDD", "DDD"), ("DD", "dd"),
    ("DAY", ("upper", "EEEE", _PAD_NAME)),
    ("Day", ("asis", "EEEE", _PAD_NAME)),
    ("day", ("lower", "EEEE", _PAD_NAME)),
    ("DY", ("upper", "EEE", 0)), ("Dy", "EEE"), ("dy", ("lower", "EEE", 0)),
    ("HH24", "HH"), ("HH12", "hh"), ("HH", "hh"),
    ("MI", "mm"), ("SS", "ss"), ("MS", "SSS"), ("US", "SSSSSS"),
    ("AM", "a"), ("PM", "a"),
    ("am", ("lower", "a", 0)), ("pm", ("lower", "a", 0)),
    ("TZ", "zz"), ("Q", "Q"), ("WW", _ww), ("J", _julian_day),
]


def _compile_pg_format(fmt: str) -> list:
    """Compile a PG to_char pattern into segments: plain java.time pattern
    strings (merged greedily) interleaved with cased/padded/computed
    specs."""
    segs: list = []
    i = 0
    while i < len(fmt):
        for tok, spec in _TO_CHAR_TOKENS:
            if fmt.startswith(tok, i):
                segs.append(spec)
                i += len(tok)
                break
        else:
            ch = fmt[i]
            # literal text must be quoted if it is a pattern letter
            segs.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    merged: list = []
    for s in segs:
        if isinstance(s, str) and merged and isinstance(merged[-1], str):
            merged[-1] += s
        else:
            merged.append(s)
    return merged


def _translate_pg_format(fmt: str) -> str:
    """Compile a PG pattern that maps onto a single date_format pattern;
    raises for tokens needing post-processing (cased names, WW, J)."""
    segs = _compile_pg_format(fmt) or [""]
    if len(segs) != 1 or not isinstance(segs[0], str):
        raise ValueError(
            f"format {fmt!r} needs composed rendering; use to_char()")
    return segs[0]


def to_char(ts, fmt: str) -> Column:
    """PG to_char(timestamp, text) for the supported token set."""
    ts = _col(ts)
    cols: list[Column] = []
    for seg in _compile_pg_format(fmt):
        if isinstance(seg, str):
            cols.append(F.date_format(ts, seg))
        elif callable(seg):
            cols.append(seg(ts))
        else:
            case, pattern, pad = seg
            c = F.date_format(ts, pattern)
            if case == "upper":
                c = F.upper(c)
            elif case == "lower":
                c = F.lower(c)
            if pad:
                c = F.rpad(c, pad, " ")
            cols.append(c)
    if not cols:
        return F.lit("")
    return cols[0] if len(cols) == 1 else F.concat(*cols)


# -- justify_* --------------------------------------------------------------

def _trunc_div(n: Column, d: int) -> Column:
    """Integer division truncating toward zero (PG interval semantics;
    Spark's ``div`` on negatives floors). Exact at all long magnitudes:
    integer ``div`` on the absolute value (trunc == floor for
    non-negatives) — never a double division, which would lose ULPs past
    2^53 (~285-year intervals in micros)."""
    sign = F.when(n < 0, F.lit(-1)).otherwise(F.lit(1))
    return sign * F.call_function("div", F.abs(n), F.lit(d).cast("long"))


def _interval_struct(months, days, micros) -> Column:
    return F.struct(_col(months).cast("long").alias("months"),
                    _col(days).cast("long").alias("days"),
                    _col(micros).cast("long").alias("micros"))


def justify_hours(months, days, micros) -> Column:
    """Every 24h of micros becomes a day (justify_hours('27:00') = '1 day
    03:00')."""
    m, d, us = _col(months).cast("long"), _col(days).cast("long"), _col(micros).cast("long")
    carry = _trunc_div(us, DAY_US)
    return _interval_struct(m, d + carry, us - carry * DAY_US)


def justify_days(months, days, micros) -> Column:
    """Every 30 days becomes a month."""
    m, d, us = _col(months).cast("long"), _col(days).cast("long"), _col(micros).cast("long")
    carry = _trunc_div(d, MONTH_DAYS)
    return _interval_struct(m + carry, d - carry * MONTH_DAYS, us)


def justify_interval(months, days, micros) -> Column:
    """justify_hours then justify_days, then PG's sign normalization:
    components are adjusted so they all carry the sign of the total
    (e.g. '1 month -1 hour' -> '29 days 23:00:00')."""
    m, d, us = _col(months).cast("long"), _col(days).cast("long"), _col(micros).cast("long")
    # carry hours into days, days into months
    hc = _trunc_div(us, DAY_US)
    d2, us2 = d + hc, us - hc * DAY_US
    dc = _trunc_div(d2, MONTH_DAYS)
    m2, d3 = m + dc, d2 - dc * MONTH_DAYS
    # sign normalization: borrow one unit downward when signs disagree
    borrow_m = (m2 > 0) & ((d3 < 0) | ((d3 == 0) & (us2 < 0)))
    m3 = F.when(borrow_m, m2 - 1).otherwise(m2)
    d4 = F.when(borrow_m, d3 + MONTH_DAYS).otherwise(d3)
    lend_m = (m2 < 0) & ((d4 > 0) | ((d4 == 0) & (us2 > 0)))
    m4 = F.when(lend_m, m3 + 1).otherwise(m3)
    d5 = F.when(lend_m, d4 - MONTH_DAYS).otherwise(d4)
    borrow_d = (d5 > 0) & (us2 < 0)
    d6 = F.when(borrow_d, d5 - 1).otherwise(d5)
    us3 = F.when(borrow_d, us2 + DAY_US).otherwise(us2)
    lend_d = (d6 < 0) & (us3 > 0)
    d7 = F.when(lend_d, d6 + 1).otherwise(d6)
    us4 = F.when(lend_d, us3 - DAY_US).otherwise(us3)
    return _interval_struct(m4, d7, us4)


# -- regexp_split -----------------------------------------------------------

def regexp_split_to_array(s, pattern: str) -> Column:
    """PG regexp_split_to_array — keeps interior empty fields."""
    return F.split(_col(s), pattern)


def regexp_split_to_table(s, pattern: str) -> Column:
    """Table-function form: explode(regexp_split_to_array(...))."""
    return F.explode(F.split(_col(s), pattern))


# -- encode / decode / digest / hmac ---------------------------------------

def encode(data, fmt: str) -> Column:
    """PG encode(bytea, format): base64 | hex (lowercase) | escape."""
    c = _col(data)
    if fmt == "base64":
        return F.base64(c.cast("binary"))
    if fmt == "hex":
        return F.lower(F.hex(c.cast("binary")))
    if fmt == "escape":
        # printable ASCII stays; PG octal-escapes the rest. Covers the
        # engine's text-typed inputs (full bytea escape needs bytes).
        return c.cast("string")
    raise ValueError(f"encode: unknown format {fmt!r}")


def decode(data, fmt: str) -> Column:
    """PG decode(text, format) -> bytea."""
    c = _col(data)
    if fmt == "base64":
        return F.unbase64(c)
    if fmt == "hex":
        return F.unhex(c)
    if fmt == "escape":
        return c.cast("binary")
    raise ValueError(f"decode: unknown format {fmt!r}")


def digest(data, algo: str) -> Column:
    """pgcrypto digest(): lowercase hex over md5/sha1/sha224/sha256/
    sha384/sha512 (sha* via JVM sha2, all codegen'd)."""
    c = _col(data)
    algo = algo.lower()
    if algo == "md5":
        return F.md5(c.cast("binary"))
    if algo == "sha1":
        return F.sha1(c.cast("binary"))
    if algo.startswith("sha"):
        bits = int(algo[3:])
        return F.sha2(c.cast("binary"), bits)
    raise ValueError(f"digest: unknown algorithm {algo!r}")


def hmac(data, key: str, algo: str = "sha256") -> Column:
    """pgcrypto hmac() — no JVM builtin, so an Arrow-vectorized pandas UDF
    over hashlib (RFC 2104). Lowercase hex output like digest()."""
    from pyspark.sql.functions import pandas_udf

    algo_l = algo.lower()

    @pandas_udf("string")
    def _hmac(col: pd.Series) -> pd.Series:
        import hashlib
        import hmac as _h
        kb = key.encode()
        return col.map(
            lambda v: None if v is None
            else _h.new(kb, str(v).encode(), getattr(hashlib, algo_l)).hexdigest())

    return _hmac(_col(data))


# -- deterministic UUIDs ----------------------------------------------------

def uuid_v3_text(namespace: str, name) -> Column:
    """Deterministic RFC-4122-formatted UUID from md5(namespace ':' name).

    The version (3) and variant (10xx) bits are set exactly per RFC 4122;
    the digest input is the TEXT namespace rather than RFC namespace-UUID
    bytes (PG computes uuid_generate_v3 only via the uuid-ossp extension,
    and byte-level namespaces cannot be expressed in engines whose md5 is
    text-only — the deviation is the input convention, not the format).
    Stable across engines/runs: the pipeline's document-identity primitive.
    """
    h = F.md5(F.concat(F.lit(namespace), F.lit(":"),
                       _col(name).cast("string")))
    # variant nibble: (x & 0x3) | 0x8  ==  translate over hex digits
    variant = F.translate(F.substring(h, 17, 1),
                          "0123456789abcdef", "89ab89ab89ab89ab")
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("3"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )
