"""SQL Server CDC change-table decode, Spark-first.

Reference: the reference's SQL Server source does not tail a binary log;
SQL Server's CDC agent materializes each captured table's changes into a
change table `cdc.<capture_instance>_CT` whose rows the source reads and
parses into (lsn, operation, row) updates
(/root/reference/src/sql-server-util/src/cdc.rs:719-792 `Operation::
try_parse`): columns `__$start_lsn binary(10)`, `__$seqval binary(10)`,
`__$operation int` with 1=delete, 2=insert, 3=update-before,
4=update-after, followed by the captured data columns. The format is
public (learn.microsoft.com → "cdc.<capture_instance>_CT"). The LSN is a
10-byte big-endian triple (VLF:block:record), totally ordered as bytes;
`__$seqval` orders operations within a transaction, and an update's
before/after rows share a seqval (cdc.rs:782-783).

Spark-first split — the change table is already relational, so the whole
decode is column expressions (no Python execution at all, unlike the
byte-parsing pgoutput/binlog paths):

- `changes_to_diff` maps operation codes to retraction/addition diffs
  and builds a total order key `hex(start_lsn) || hex(seqval)` — a
  fixed-width hex string whose lexicographic order IS the byte order.
- `apply_cdc` (shared with the Postgres/MySQL sources) folds the diffs
  onto the snapshot with one key-shuffle + window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# cdc.rs:780-783
OP_DELETE, OP_INSERT, OP_UPDATE_OLD, OP_UPDATE_NEW = 1, 2, 3, 4

START_LSN, SEQVAL, OPERATION = "__$start_lsn", "__$seqval", "__$operation"


def lsn_bytes(vlf: int, block: int = 0, record: int = 0) -> bytes:
    """binary(10) LSN: u32 VLF sequence, u32 log block, u16 record —
    big-endian, so byte order is numeric order (cdc.rs `Lsn`)."""
    return (vlf.to_bytes(4, "big") + block.to_bytes(4, "big")
            + record.to_bytes(2, "big"))


def changes_to_diff(ct: DataFrame) -> DataFrame:
    """Change-table frame → (data..., lsn, diff) update frame.

    1=delete and 3=update-before retract (-1); 2=insert and
    4=update-after add (+1). `lsn` is the 40-hex-char concatenation of
    start_lsn and seqval: fixed width, so string order == byte order,
    and an update's paired rows tie on lsn (resolved by the shared
    window's diff-desc tiebreak, same as the other CDC sources)."""
    data_cols = [c for c in ct.columns
                 if c not in (START_LSN, SEQVAL, OPERATION)]
    op = F.col(f"`{OPERATION}`")
    # unrecognized codes are a decode error in the reference
    # (cdc.rs:785-789); raise_error in the otherwise branch surfaces
    # them the same way, and cannot be pruned away from the diff column
    return ct.select(
        *data_cols,
        F.concat(F.lower(F.hex(F.col(f"`{START_LSN}`"))),
                 F.lower(F.hex(F.col(f"`{SEQVAL}`")))).alias("lsn"),
        F.when(op.isin(OP_INSERT, OP_UPDATE_NEW), F.lit(1))
         .when(op.isin(OP_DELETE, OP_UPDATE_OLD), F.lit(-1))
         .otherwise(F.raise_error(
             F.concat(F.lit("unrecognized __$operation code "),
                      op.cast("string"))).cast("int"))
         .alias("diff"),
    )


def apply_changes(base: DataFrame, ct: DataFrame, key_cols: list[str],
                  ) -> DataFrame:
    """Snapshot + change table → current state (the reference's
    snapshot-then-replication handoff, sql_server/replication.rs)."""
    from materialize_spark.sources.pgoutput import apply_cdc
    return apply_cdc(base, changes_to_diff(ct), key_cols)
