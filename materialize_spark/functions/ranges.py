"""Range type + operators (PG-compatible semantics, Spark struct encoding).

The reference models ranges as ``Range { lower, upper }`` with per-bound
inclusivity and an ``empty`` flag (reference: src/repr/src/scalar.rs
SqlScalarType::Range and src/repr/src/adt/range.rs), and implements the
binary operators RangeContainsElem/RangeContainsRange/RangeOverlaps/
RangeUnion/RangeIntersection/RangeDifference/RangeAdjacent/RangeBefore/
RangeAfter (reference: src/expr/src/scalar/func/binary.rs).

Spark has no native range type; we encode one as

    struct<lower:T, upper:T, lower_inc:boolean, upper_inc:boolean,
           empty:boolean>

with NULL lower/upper meaning an unbounded side, and implement every
operator as pure Column expressions — no UDFs, fully inside whole-stage
codegen, so range predicates stay scan-side at any scale.

Discrete ranges (int4range/int8range) are canonicalized to ``[lo, hi)``
exactly as PG does: ``(a`` becomes ``[a+1``, ``b]`` becomes ``b+1)``, and
a range with ``lo >= hi`` after canonicalization is the empty range.
Continuous ranges (numrange) keep their bounds as constructed.

Deviation from PG: ``range_union`` of two ranges that neither overlap nor
touch yields NULL instead of raising (Spark expressions cannot raise
per-row without poisoning the whole task); pair it with
``range_union_valid`` when strictness matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_FIELDS = ("lower", "upper", "lower_inc", "upper_inc", "empty")


def _mk(lower, upper, lower_inc, upper_inc, empty) -> Column:
    return F.struct(
        lower.alias("lower"), upper.alias("upper"),
        lower_inc.alias("lower_inc"), upper_inc.alias("upper_inc"),
        empty.alias("empty"),
    )


def _lit(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def empty_range(dtype: str = "int") -> Column:
    """The canonical empty range."""
    null = F.lit(None).cast(dtype)
    return _mk(null, null, F.lit(False), F.lit(False), F.lit(True))


def int4range(lo, hi, bounds: str = "[)") -> Column:
    """Discrete integer range, canonicalized to ``[lo, hi)`` (PG int4range).

    ``lo``/``hi`` may be Columns or literals; NULL means unbounded on that
    side. ``bounds`` is a 2-char PG bounds spec: one of [), [], (), (].
    """
    if bounds not in ("[)", "[]", "()", "(]"):
        raise ValueError(f"invalid bounds spec {bounds!r}")
    lo, hi = _lit(lo).cast("int"), _lit(hi).cast("int")
    # canonicalize: exclusive lower -> +1 inclusive; inclusive upper -> +1
    # exclusive. Unbounded (NULL) sides never shift.
    clo = lo + 1 if bounds[0] == "(" else lo
    chi = hi + 1 if bounds[1] == "]" else hi
    is_empty = clo.isNotNull() & chi.isNotNull() & (clo >= chi)
    return F.when(
        is_empty,
        _mk(F.lit(None).cast("int"), F.lit(None).cast("int"),
            F.lit(False), F.lit(False), F.lit(True)),
    ).otherwise(
        _mk(clo, chi, clo.isNotNull(), F.lit(False), F.lit(False)))


def numrange(lo, hi, bounds: str = "[)") -> Column:
    """Continuous numeric range (PG numrange) — bounds kept as written;
    empty only when lo == hi and not both-inclusive, or lo > hi."""
    if bounds not in ("[)", "[]", "()", "(]"):
        raise ValueError(f"invalid bounds spec {bounds!r}")
    lo, hi = _lit(lo).cast("double"), _lit(hi).cast("double")
    lo_inc, hi_inc = bounds[0] == "[", bounds[1] == "]"
    bounded = lo.isNotNull() & hi.isNotNull()
    is_empty = bounded & (
        (lo > hi) | ((lo == hi) & F.lit(not (lo_inc and hi_inc))))
    return F.when(
        is_empty,
        _mk(F.lit(None).cast("double"), F.lit(None).cast("double"),
            F.lit(False), F.lit(False), F.lit(True)),
    ).otherwise(
        _mk(lo, hi, F.lit(lo_inc) & lo.isNotNull(),
            F.lit(hi_inc) & hi.isNotNull(), F.lit(False)))


# -- bound comparisons ------------------------------------------------------
# A lower bound (value, inc) sorts before another when its effective start
# is earlier; NULL value = -infinity for lower, +infinity for upper.

def _lower_le(r1: Column, r2: Column) -> Column:
    """r1's lower bound starts at or before r2's."""
    l1, i1 = r1["lower"], r1["lower_inc"]
    l2, i2 = r2["lower"], r2["lower_inc"]
    return (
        l1.isNull()
        | (l2.isNotNull()
           & ((l1 < l2) | ((l1 == l2) & (i1 | ~i2)))))


def _upper_ge(r1: Column, r2: Column) -> Column:
    """r1's upper bound ends at or after r2's."""
    u1, i1 = r1["upper"], r1["upper_inc"]
    u2, i2 = r2["upper"], r2["upper_inc"]
    return (
        u1.isNull()
        | (u2.isNotNull()
           & ((u1 > u2) | ((u1 == u2) & (i1 | ~i2)))))


def _starts_after_end(r1: Column, r2: Column) -> Column:
    """r1 begins strictly after r2 ends (a gap or a touch-with-exclusion)."""
    l1, li = r1["lower"], r1["lower_inc"]
    u2, ui = r2["upper"], r2["upper_inc"]
    return (
        l1.isNotNull() & u2.isNotNull()
        & ((l1 > u2) | ((l1 == u2) & (~li | ~ui))))


# -- predicates -------------------------------------------------------------

def range_contains_elem(r: Column, x) -> Column:
    """``r @> x`` — element containment."""
    x = _lit(x)
    lo_ok = r["lower"].isNull() | F.when(r["lower_inc"], x >= r["lower"]) \
        .otherwise(x > r["lower"])
    hi_ok = r["upper"].isNull() | F.when(r["upper_inc"], x <= r["upper"]) \
        .otherwise(x < r["upper"])
    return ~r["empty"] & x.isNotNull() & lo_ok & hi_ok


def range_contains_range(r1: Column, r2: Column) -> Column:
    """``r1 @> r2`` — range containment (every empty range is contained)."""
    return r2["empty"] | (~r1["empty"] & _lower_le(r1, r2) & _upper_ge(r1, r2))


def range_overlaps(r1: Column, r2: Column) -> Column:
    """``r1 && r2`` — the ranges share at least one point."""
    return (~r1["empty"] & ~r2["empty"]
            & ~_starts_after_end(r1, r2) & ~_starts_after_end(r2, r1))


def range_adjacent(r1: Column, r2: Column) -> Column:
    """``r1 -|- r2`` — the ranges touch with no gap and no overlap."""
    def touches(a, b):
        # a's upper meets b's lower exactly, with exactly one side closed.
        return (a["upper"].isNotNull() & b["lower"].isNotNull()
                & (a["upper"] == b["lower"])
                & (a["upper_inc"] != b["lower_inc"]))
    return ~r1["empty"] & ~r2["empty"] & (touches(r1, r2) | touches(r2, r1))


def range_before(r1: Column, r2: Column) -> Column:
    """``r1 << r2`` — strictly left of."""
    return ~r1["empty"] & ~r2["empty"] & _starts_after_end(r2, r1)


def range_after(r1: Column, r2: Column) -> Column:
    """``r1 >> r2`` — strictly right of."""
    return ~r1["empty"] & ~r2["empty"] & _starts_after_end(r1, r2)


def range_is_empty(r: Column) -> Column:
    return r["empty"]


def range_lower(r: Column) -> Column:
    return F.when(~r["empty"], r["lower"])


def range_upper(r: Column) -> Column:
    return F.when(~r["empty"], r["upper"])


# -- combining operators ----------------------------------------------------

def range_union(r1: Column, r2: Column) -> Column:
    """``r1 + r2``. NULL when the inputs neither overlap nor touch (PG
    raises there; see module docstring)."""
    take_l1 = _lower_le(r1, r2)
    take_u1 = _upper_ge(r1, r2)
    merged = _mk(
        F.when(take_l1, r1["lower"]).otherwise(r2["lower"]),
        F.when(take_u1, r1["upper"]).otherwise(r2["upper"]),
        F.when(take_l1, r1["lower_inc"]).otherwise(r2["lower_inc"]),
        F.when(take_u1, r1["upper_inc"]).otherwise(r2["upper_inc"]),
        F.lit(False))
    return (
        F.when(r1["empty"], r2)
        .when(r2["empty"], r1)
        .when(range_overlaps(r1, r2) | range_adjacent(r1, r2), merged))


def range_union_valid(r1: Column, r2: Column) -> Column:
    """True when ``r1 + r2`` is a single contiguous range (PG would not
    raise)."""
    return (r1["empty"] | r2["empty"]
            | range_overlaps(r1, r2) | range_adjacent(r1, r2))


def range_intersection(r1: Column, r2: Column) -> Column:
    """``r1 * r2``."""
    take_l2 = _lower_le(r1, r2)   # r2 starts later -> take r2's lower
    take_u2 = _upper_ge(r1, r2)   # r2 ends earlier -> take r2's upper
    lo = F.when(take_l2, r2["lower"]).otherwise(r1["lower"])
    lo_inc = F.when(take_l2, r2["lower_inc"]).otherwise(r1["lower_inc"])
    hi = F.when(take_u2, r2["upper"]).otherwise(r1["upper"])
    hi_inc = F.when(take_u2, r2["upper_inc"]).otherwise(r1["upper_inc"])
    degenerate = (
        lo.isNotNull() & hi.isNotNull()
        & ((lo > hi) | ((lo == hi) & ~(lo_inc & hi_inc))))
    null_t = F.lit(None).cast("int")
    mk_empty = _mk(null_t, null_t, F.lit(False), F.lit(False), F.lit(True))
    return (
        F.when(~range_overlaps(r1, r2), mk_empty)
        .when(degenerate, mk_empty)
        .otherwise(_mk(lo, hi, lo_inc, hi_inc, F.lit(False))))


def range_difference(r1: Column, r2: Column) -> Column:
    """``r1 - r2``. NULL when the subtraction would split r1 in two (PG
    raises there)."""
    null_t = F.lit(None).cast("int")
    mk_empty = _mk(null_t, null_t, F.lit(False), F.lit(False), F.lit(True))
    no_overlap = ~range_overlaps(r1, r2)
    # r2 covers r1 entirely -> empty
    covered = range_contains_range(r2, r1)
    # r2 chops the low side of r1: keep [r2.upper-flip, r1.upper]
    low_chopped = _lower_le(r2, r1) & ~_upper_ge(r2, r1)
    keep_high = _mk(r2["upper"], r1["upper"], ~r2["upper_inc"],
                    r1["upper_inc"], F.lit(False))
    # r2 chops the high side of r1: keep [r1.lower, r2.lower-flip]
    high_chopped = _upper_ge(r2, r1) & ~_lower_le(r2, r1)
    keep_low = _mk(r1["lower"], r2["lower"], r1["lower_inc"],
                   ~r2["lower_inc"], F.lit(False))
    return (
        F.when(r1["empty"] | r2["empty"] | no_overlap, r1)
        .when(covered, mk_empty)
        .when(low_chopped, keep_high)
        .when(high_chopped, keep_low))
    # final fallthrough (split in the middle) -> NULL


def range_text(r: Column) -> Column:
    """Canonical text rendering: ``empty`` or ``[lo,hi)`` / ``(lo,hi]`` …
    with unbounded sides rendered as nothing (PG style)."""
    lo = F.when(r["lower"].isNotNull(), r["lower"].cast("string")) \
        .otherwise(F.lit(""))
    hi = F.when(r["upper"].isNotNull(), r["upper"].cast("string")) \
        .otherwise(F.lit(""))
    open_b = F.when(r["lower_inc"], F.lit("[")).otherwise(F.lit("("))
    close_b = F.when(r["upper_inc"], F.lit("]")).otherwise(F.lit(")"))
    return F.when(r.isNull(), F.lit(None).cast("string")) \
        .when(r["empty"], F.lit("empty")) \
        .otherwise(F.concat(open_b, lo, F.lit(","), hi, close_b))
