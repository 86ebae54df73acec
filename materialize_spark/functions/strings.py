"""PG string functions lacking a 1:1 pyspark.sql.functions name.

Reference: string members of BinaryFunc/VariadicFunc
(src/expr/src/scalar/func/{binary,variadic}.rs — Left, Right, Position,
SplitPart, Translate, Repeat, Trim*, PadLeading, EncodedBytesCharLength).
All are thin column-expression wrappers — JVM codegen path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def split_part(s, delim: str, n) -> Column:
    """split_part(string, delimiter, n) — 1-based, '' when out of range (PG)."""
    parts = F.split(_col(s), F.lit(delim), -1)
    idx = n if isinstance(n, Column) else F.lit(n)
    return F.coalesce(F.element_at(parts, idx), F.lit(""))


def position(sub, s) -> Column:
    """position(sub IN s) — 1-based, 0 when absent (PG strpos)."""
    return F.instr(_col(s), sub if isinstance(sub, str) else sub)


def left_(s, n: int) -> Column:
    return F.substring(_col(s), 1, n)


def right_(s, n: int) -> Column:
    c = _col(s)
    return F.substring(c, -n, n)


def translate_(s, from_chars: str, to_chars: str) -> Column:
    return F.translate(_col(s), from_chars, to_chars)


def to_hex(n) -> Column:
    return F.lower(F.hex(_col(n)))


def quote_ident(ident) -> Column:
    """PG quote_ident: double-quote unless a safe lowercase identifier;
    embedded double quotes doubled (reference pg_catalog quote_ident)."""
    c = ident if isinstance(ident, Column) else F.col(ident)
    safe = c.rlike("^[a-z_][a-z0-9_]*$")
    return F.when(safe, c).otherwise(
        F.concat(F.lit('"'), F.regexp_replace(c, '"', '""'), F.lit('"')))


def parse_ident(ident) -> Column:
    """PG parse_ident: split a qualified identifier on dots, strip
    double-quotes from quoted segments."""
    c = ident if isinstance(ident, Column) else F.col(ident)
    return F.transform(
        F.split(c, r"\."),
        lambda s: F.regexp_replace(F.regexp_replace(s, '^"|"$', ""),
                                   '""', '"'))
