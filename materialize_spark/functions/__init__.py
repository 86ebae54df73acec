"""Scalar & aggregate function surface.

The reference exposes 351 builtin SQL functions (src/sql/src/func.rs:1851,
:4249) evaluated by interpreted Rust (src/expr/src/scalar/func/). Here the
same surface is `pyspark.sql.functions` expressions — JVM-side, inside
whole-stage codegen; nothing in this package drops to Python row loops.

Modules:
- ``ordering``  — PostgreSQL null-sort-order shims (nulls last on ASC)
- ``jsonb``     — jsonb operator family (`->`, `->>`, jsonb_each, ...)
- ``datetime``  — date_bin / date_bin_hopping / date_part / age
- ``strings``   — PG string functions missing 1:1 Spark names
- ``aggregates``— ordered string_agg/array_agg/jsonb_agg compositions
"""

from materialize_spark.functions.ordering import asc_nulls_last, desc_nulls_first, pg_sort_key
from materialize_spark.functions.datetime import date_bin, date_bin_hopping, date_part, age
from materialize_spark.functions.jsonb import (
    jsonb_get, jsonb_get_text, jsonb_typeof, jsonb_array_elements, jsonb_object_keys,
)
from materialize_spark.functions.strings import (
    split_part, position, left_, right_, translate_, to_hex,
)
from materialize_spark.functions.aggregates import string_agg, array_agg, jsonb_agg, map_agg

__all__ = [
    "asc_nulls_last", "desc_nulls_first", "pg_sort_key",
    "date_bin", "date_bin_hopping", "date_part", "age",
    "jsonb_get", "jsonb_get_text", "jsonb_typeof", "jsonb_array_elements",
    "jsonb_object_keys",
    "split_part", "position", "left_", "right_", "translate_", "to_hex",
    "string_agg", "array_agg", "jsonb_agg", "map_agg",
]
