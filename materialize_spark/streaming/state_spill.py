"""Spillable arrangement-spine state: append-only in-memory parts with
an optional hash-prefix-partitioned parquet tier past a row budget.

The in-memory part list is the small-state fast path every delta
operator uses (per-batch O(batch) appends, amortized folds). At 100 TB
the folded state cannot live in executor memory and — worse — every
probe would scan all of it. Past ``spill_rows`` the folded state moves
to parquet partitioned by ``pmod(xxhash64(keys), prefixes)``; probes
filter on the touched keys' prefixes BEFORE any I/O, so directory
pruning caps per-batch reads at state/prefixes × touched-prefixes.
This is the moral analog of the reference consolidating arrangements
to its persist tier and reading them back shard-pruned.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SpilledPartsState:
    spark: SparkSession
    key_cols: list[str]
    name: str = "state"
    spill_rows: int | None = None
    spill_dir: str | None = None
    prefixes: int = 64
    _parts: list = field(default_factory=list, init=False)
    _disk: str | None = field(default=None, init=False)

    def append(self, part: DataFrame) -> None:
        self._parts.append(part)

    def n_parts(self) -> int:
        return len(self._parts)

    def _mem(self) -> DataFrame | None:
        if not self._parts:
            return None
        out = self._parts[0]
        for p in self._parts[1:]:
            out = out.unionByName(p)
        return out

    def _kp(self):
        return F.pmod(F.xxhash64(*self.key_cols), F.lit(self.prefixes))

    def _disk_frame(self, touched: DataFrame | None) -> DataFrame | None:
        if self._disk is None:
            return None
        out = self.spark.read.parquet(self._disk)
        if touched is not None:
            pfx = [r.p for r in touched.select(self._kp().alias("p"))
                   .distinct().collect()]
            out = out.filter(F.col("__kp").isin(pfx))
        return out.drop("__kp")

    def probe_frame(self, touched: DataFrame | None) -> DataFrame:
        """Memory parts ∪ the spilled tier pruned to the touched keys'
        prefixes — the per-batch probe input."""
        mem = self._mem()
        disk = self._disk_frame(touched)
        if mem is None:
            return disk
        return mem if disk is None else mem.unionByName(disk)

    def full_frame(self) -> DataFrame | None:
        """Everything (memory + whole spilled tier) — compaction input."""
        mem = self._mem()
        disk = self._disk_frame(None)
        if mem is None:
            return disk
        return mem if disk is None else mem.unionByName(disk)

    def replace(self, folded: DataFrame) -> None:
        """Install a freshly folded state: past the row budget it spills
        to the partitioned tier (memory keeps only the empty schema
        frame for later unions); under it, memory holds it whole."""
        import os
        import tempfile
        if self.spill_rows is not None and folded.count() > self.spill_rows:
            if self.spill_dir is None:
                self.spill_dir = tempfile.mkdtemp(
                    prefix=f"mz_{self.name}_")
            gen = sum(1 for d in os.listdir(self.spill_dir)
                      if d.startswith(self.name))
            path = os.path.join(self.spill_dir, f"{self.name}{gen}")
            (folded.withColumn("__kp", self._kp())
             .write.mode("overwrite").partitionBy("__kp").parquet(path))
            self._disk = path
            self._parts = [folded.limit(0)]
        else:
            self._disk = None
            self._parts = [folded]
