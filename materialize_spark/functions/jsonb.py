"""jsonb operator family.

Reference: jsonb is a first-class scalar type (src/repr/src/scalar.rs Jsonb)
with operators `->` `->>` `#>` `@>` `||` and functions jsonb_each /
jsonb_array_elements / jsonb_object_keys / jsonb_typeof
(src/expr/src/scalar/func/binary.rs JsonbGet*; table funcs
src/expr/src/relation/func.rs:3556).

Spark representation: JSON text in a StringType column (SURVEY.md §1.4),
operated on with the native JSON expression family (variant-free, works on
Spark 4's codegen path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def jsonb_get(js, key: str | int) -> Column:
    """`->`: field/element access returning JSON text (recombinable)."""
    path = f"$[{key}]" if isinstance(key, int) else f"$.{key}"
    return F.get_json_object(_col(js), path)


def jsonb_get_text(js, key: str | int) -> Column:
    """`->>`: field/element access returning text (get_json_object already
    unquotes scalar strings)."""
    return jsonb_get(js, key)


def jsonb_typeof(js) -> Column:
    c = _col(js)
    trimmed = F.ltrim(c)
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(trimmed.startswith("{"), F.lit("object"))
        .when(trimmed.startswith("["), F.lit("array"))
        .when(trimmed.startswith('"'), F.lit("string"))
        .when(trimmed == "null", F.lit("null"))
        .when(trimmed.isin("true", "false"), F.lit("boolean"))
        .otherwise(F.lit("number"))
    )


def jsonb_array_elements(js) -> Column:
    """Array of element JSON texts — explode for the table-function form."""
    return F.from_json(_col(js), "array<string>")


def jsonb_object_keys(js) -> Column:
    """Array of object keys — explode for the table-function form."""
    return F.json_object_keys(_col(js))


def jsonb_strip_nulls(js, value_type: str = "int") -> Column:
    """jsonb_strip_nulls for flat objects: drop null-valued fields
    (reference UnaryFunc::JsonbStripNulls). Parses the object as a typed
    map, filters null entries JVM-side, re-serializes."""
    return F.to_json(F.map_filter(
        F.from_json(_col(js), f"map<string,{value_type}>"),
        lambda _k, v: v.isNotNull()))
