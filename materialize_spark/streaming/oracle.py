"""Cross-MV consistency: a timestamp oracle + coordinated commit.

Reference: the reference guarantees strict serializability across objects
with a shared timestamp oracle — every read and write is assigned a
monotonic logical timestamp, and reads of two materialized views over the
same source can never observe different times
(/root/reference/src/timestamp-oracle/src/lib.rs:46 `TimestampOracle`:
write_ts/read_ts/apply_write; /root/reference/src/txn-wal/src/lib.rs:10-18:
atomic multi-shard writes so downstream views move together).

Spark-first analog (per session, not per cluster — SURVEY §2.8.6 documents
the per-batch consistency model this upgrades):

- ``TimestampOracle``: monotonic logical clock. ``write_ts`` allocates the
  timestamp for an ingest batch; ``apply_write`` closes it; ``read_ts``
  is the latest closed timestamp — reads never see an open write.
- ``CoordinatedSource``: one ingest feed fanned out to N registered
  MaterializedViews with *publish-on-commit*: each batch is applied to
  every member view first, and only then is the frontier advanced and all
  result snapshots published atomically (localCheckpoint'ed DataFrames
  swapped under one lock). A failure mid-apply leaves the frontier — and
  every published snapshot — at the previous timestamp, so readers can
  NEVER observe view A at t+1 while view B still serves t (the exact
  anomaly the reference's oracle exists to prevent).
- ``peek(name)`` serves the published snapshot with its timestamp;
  ``subscribe(name)`` returns the per-timestamp delta stream, rows
  stamped ``mz_timestamp`` — aligned across members by construction.

Scale shape: coordination is driver-side metadata (one lock, K DataFrame
handles); the data path is unchanged — each view's incremental merge runs
distributed exactly as streaming/ivm.py does. This is the same split as
the reference: the oracle is tiny coordination state next to the dataflow.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from materialize_spark.operators.setops import DIFF_COL
from materialize_spark.streaming.ivm import MaterializedView

TS_COL = "mz_timestamp"


class TimestampOracle:
    """Monotonic logical clock with closed-timestamp reads
    (timestamp-oracle/src/lib.rs:46: write_ts / read_ts / apply_write)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._next = 1
        self._closed = 0

    def write_ts(self) -> int:
        """Allocate the timestamp for a write batch (open until applied)."""
        with self._lock:
            ts = self._next
            self._next += 1
            return ts

    def apply_write(self, ts: int) -> None:
        """Close ``ts``: reads may now observe it."""
        with self._lock:
            self._closed = max(self._closed, ts)
            self._next = max(self._next, ts + 1)

    def read_ts(self) -> int:
        """Latest closed timestamp — what every read serves at."""
        with self._lock:
            return self._closed


@dataclass
class _Published:
    ts: int
    state: DataFrame


class CoordinatedSource:
    """One source feeding N materialized views under a shared oracle.

    All member views commit each ingest batch atomically: apply-all, then
    publish-all at one timestamp. Readers (peek/subscribe) only ever see
    published snapshots, so no interleaving of reads and a failed or
    in-flight write can serve two members at different times.
    """

    def __init__(self, oracle: TimestampOracle | None = None) -> None:
        self.oracle = oracle or TimestampOracle()
        self._members: dict[str, MaterializedView] = {}
        self._published: dict[str, _Published] = {}
        self._deltas: dict[str, list[tuple[int, DataFrame]]] = {}
        self._lock = threading.Lock()

    def attach(self, name: str, mv: MaterializedView) -> None:
        if name in self._members:
            raise KeyError(f"view {name!r} already attached")
        self._members[name] = mv
        self._deltas[name] = []

    # -- write path ---------------------------------------------------------
    def ingest(self, batch_df: DataFrame) -> int:
        """Apply one source batch to every member view, then publish all
        results at one new timestamp. Returns the committed timestamp.

        Failure atomicity: if any member's apply raises, every member's
        INTERNAL state is rolled back to its pre-batch snapshot and the
        frontier and published snapshots stay at the previous timestamp —
        so a failed ingest can simply be retried with the same batch and
        no member double-applies (the txn-wal property: a multi-view
        write lands everywhere or nowhere,
        /root/reference/src/txn-wal/src/lib.rs:10-18)."""
        ts = self.oracle.write_ts()
        saved = {name: mv.snapshot_state()
                 for name, mv in self._members.items()}
        staged: dict[str, tuple[DataFrame, DataFrame]] = {}
        try:
            for name, mv in self._members.items():
                delta = mv.on_batch(batch_df)
                staged[name] = (mv.result().localCheckpoint(eager=True),
                                delta.localCheckpoint(eager=True))
        except BaseException:
            for name, snap in saved.items():
                self._members[name].restore_state(snap)
            raise
        with self._lock:
            for name, (state, delta) in staged.items():
                self._published[name] = _Published(ts, state)
                self._deltas[name].append((ts, delta))
            self.oracle.apply_write(ts)
        return ts

    # -- read path ----------------------------------------------------------
    def frontier(self) -> int:
        return self.oracle.read_ts()

    def peek(self, name: str) -> tuple[int, DataFrame]:
        """(timestamp, snapshot) for one view — always the published
        frontier, identical across members at any instant."""
        with self._lock:
            pub = self._published.get(name)
            if pub is None:
                raise KeyError(f"view {name!r} has no published state yet")
            return pub.ts, pub.state

    def subscribe(self, name: str, since: int = 0) -> DataFrame:
        """Delta stream of one view strictly after ``since``, rows stamped
        with their commit timestamp — the SUBSCRIBE shape, aligned across
        members because timestamps come from the shared oracle."""
        with self._lock:
            parts = [d.select(F.lit(ts).alias(TS_COL), "*")
                     for ts, d in self._deltas[name] if ts > since]
        if not parts:
            mv = self._members[name]
            empty = mv.result().withColumn(DIFF_COL, F.lit(1)).limit(0)
            return empty.select(F.lit(0).alias(TS_COL), "*")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
