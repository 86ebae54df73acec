"""CDC source queries: pgoutput logical replication applied to a snapshot.

Reference shape: CREATE SOURCE ... FROM POSTGRES ... — initial table
snapshot, then the replication slot's pgoutput stream keeps the table
current (/root/reference/src/storage/src/source/postgres/{snapshot,
replication}.rs). Here the slot is emulated with wire-exact pgoutput
bytes (sources/pgoutput.py encodes and decodes the PUBLIC message
format), and the oracle states the same logical changes in plain SQL —
so the driver certifies the full decode → typed diff → snapshot-merge
path, not just the byte parser.
"""

from __future__ import annotations

from materialize_spark.queries import register
from materialize_spark.queries.util import T

_NATION_OID = 24001
_NATION_COLS = [("n_nationkey", 23, True), ("n_name", 25, False),
                ("n_regionkey", 23, False)]


def _nation_log():
    """Deterministic replication log over the driver's `nation` table:
    rename 0, move 3 to region 4, delete 7, delete+re-insert 5
    (as PHOENIX), insert 25, insert-then-delete 26 (never visible)."""
    from materialize_spark.sources.pgoutput import (
        encode_delete, encode_insert, encode_relation, encode_update,
        parse_relation,
    )
    rel_bytes = encode_relation(_NATION_OID, "public", "nation",
                                _NATION_COLS)
    rel = parse_relation(rel_bytes)
    msgs = [
        rel_bytes,
        encode_update(_NATION_OID, [0, "ZERO_RENAMED", 0],
                      old_vals=[0, None, None], old_is_key_only=True),
        encode_update(_NATION_OID, [3, "NATION_3", 4],
                      old_vals=[3, None, None], old_is_key_only=True),
        encode_delete(_NATION_OID, [7, None, None]),
        encode_delete(_NATION_OID, [5, None, None]),
        encode_insert(_NATION_OID, [26, "GONELAND", 2]),
        encode_insert(_NATION_OID, [25, "NEWLAND", 1]),
        encode_insert(_NATION_OID, [5, "PHOENIX", 0]),
        encode_delete(_NATION_OID, [26, None, None]),
    ]
    return msgs, {rel["oid"]: rel}


@register(
    "cdc_pgoutput_apply",
    """
    -- the same logical changes the pgoutput log encodes, in plain SQL
    SELECT n_nationkey,
           CASE WHEN n_nationkey = 0 THEN 'ZERO_RENAMED'
                ELSE n_name END AS n_name,
           CASE WHEN n_nationkey = 3 THEN 4
                WHEN n_nationkey = 5 THEN 0
                ELSE n_regionkey END AS n_regionkey
    FROM (SELECT n_nationkey,
                 CASE WHEN n_nationkey = 5 THEN 'PHOENIX'
                      ELSE n_name END AS n_name, n_regionkey
          FROM nation WHERE n_nationkey <> 7)
    UNION ALL
    SELECT CAST(25 AS INTEGER), 'NEWLAND', CAST(1 AS INTEGER)
    """,
    "cdc", "source", "pgoutput",
)
def cdc_pgoutput_apply(spark, sf_dir):
    from materialize_spark.sources.pgoutput import (
        apply_cdc, decode_pgoutput_stream, pgoutput_to_diff,
    )
    msgs, rels = _nation_log()
    log = spark.createDataFrame(
        [(i + 1, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn long, message binary")
    env = decode_pgoutput_stream(log, relations=rels)
    diff = pgoutput_to_diff(env, rels[_NATION_OID])
    base = T(spark, sf_dir).nation
    return apply_cdc(base, diff, ["n_nationkey"])
