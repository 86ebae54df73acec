"""Ordered aggregates: string_agg / array_agg / jsonb_agg / map_agg.

Reference: AggregateFunc::{StringAgg, ArrayConcat, ListConcat, JsonbAgg,
JsonbObjectAgg, MapAgg} (src/expr/src/relation/func.rs:1875-1990) — all
support ORDER BY inside the aggregate.

Spark's collect_list has no intra-aggregate ORDER BY, so ordered variants
collect (sort_key, value) structs and array_sort before projecting — a pure
expression composition, still map-side-combinable and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _sorted_collect(value: Column, order_by: Column | None) -> Column:
    if order_by is None:
        return F.collect_list(value)
    pairs = F.collect_list(F.struct(order_by.alias("k"), value.alias("v")))
    return F.transform(F.array_sort(pairs), lambda p: p["v"])


def string_agg(value, sep: str, order_by=None) -> Column:
    """string_agg(value, sep ORDER BY k)."""
    arr = _sorted_collect(_col(value), _col(order_by) if order_by is not None else None)
    return F.array_join(arr, sep)


def array_agg(value, order_by=None) -> Column:
    return _sorted_collect(_col(value), _col(order_by) if order_by is not None else None)


def jsonb_agg(value, order_by=None) -> Column:
    """jsonb_agg → JSON array text."""
    return F.to_json(array_agg(value, order_by))


def map_agg(key, value) -> Column:
    """map_agg(k, v) → MapType(string, v)."""
    return F.map_from_entries(F.collect_list(F.struct(_col(key), _col(value))))
