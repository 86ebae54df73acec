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


# -- mutation operators (flat objects) --------------------------------------
# Reference: jsonb_set / jsonb_build_object / `||` / `-` operators
# (src/expr/src/scalar/func/binary.rs JsonbConcat/JsonbDeleteString,
# src/sql/src/func.rs jsonb_build_object). The engine's jsonb carrier is
# JSON text; these mutators cover the flat-object case (typed map payloads
# like events.props) — nested *reads* go through jsonb_get paths. Output is
# canonical: keys sorted, no whitespace — PG jsonb's own normal form, and
# what makes results engine-comparable.

def _obj_map(js, value_type: str) -> Column:
    return F.from_json(_col(js), f"map<string,{value_type}>")


def jsonb_canonical(m) -> Column:
    """Serialize a map column as key-sorted compact JSON (jsonb normal
    form). array_sort on struct entries orders by key first."""
    return F.to_json(F.map_from_entries(F.array_sort(F.map_entries(m))))


def jsonb_set(js, key: str, value, value_type: str = "bigint") -> Column:
    """jsonb_set(obj, '{key}', value) for flat objects: upsert the field,
    emit canonical form."""
    v = value if isinstance(value, Column) else F.lit(value)
    patch = F.create_map(F.lit(key), v.cast(value_type))
    return jsonb_canonical(
        F.map_concat(
            F.map_filter(_obj_map(js, value_type), lambda k, _v: k != F.lit(key)),
            patch))


def jsonb_delete(js, key: str, value_type: str = "bigint") -> Column:
    """PG `jsonb - 'key'`: drop the field, canonical output."""
    return jsonb_canonical(
        F.map_filter(_obj_map(js, value_type), lambda k, _v: k != F.lit(key)))


def jsonb_concat(a, b, value_type: str = "bigint") -> Column:
    """PG `jsonb || jsonb` for flat objects: right side wins on key
    collisions (map_concat keeps the last duplicate under
    spark.sql.mapKeyDedupPolicy=LAST_WIN; enforce by pre-filtering)."""
    bm = _obj_map(b, value_type)
    am = F.map_filter(_obj_map(a, value_type),
                      lambda k, _v: ~F.array_contains(F.map_keys(bm), k))
    return jsonb_canonical(F.map_concat(am, bm))


def jsonb_path_query_first(js, path: str) -> Column:
    """jsonb_path_query_first(js, '$.a.b[i]') — the member/index core of
    PG's SQL/JSON path language (reference jsonb path funcs,
    src/sql/src/func.rs pg_catalog). Spark's get_json_object evaluates
    exactly this dialect JVM-side; scalars come back as unquoted text."""
    return F.get_json_object(_col(js), path)


def jsonb_path_exists(js, path: str) -> Column:
    """jsonb_path_exists(js, path): does the path land on any value?"""
    return F.get_json_object(_col(js), path).isNotNull()
