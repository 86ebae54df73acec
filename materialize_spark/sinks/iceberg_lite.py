"""Iceberg-shaped table sink: snapshot metadata + manifests + time travel.

Reference: the Iceberg continuous sink
(/root/reference/src/storage-types/src/sinks.rs:137-140). The sandbox has
no iceberg-spark-runtime JAR, so this implements the *table format
contract* from the public Apache Iceberg spec (iceberg.apache.org/spec/ —
versioned metadata JSON, snapshot log, manifests of immutable data files)
over plain parquet, dependency-free:

    <table>/
      data/snap-<id>/part-*.parquet     immutable data files per commit
      metadata/v<N>.metadata.json       table metadata (spec shape, subset)
      metadata/manifest-<id>.json       data-file list + stats per snapshot
      metadata/version-hint.text        latest metadata version

Supported: append / overwrite commits, snapshot log with parent links and
operation summaries, reads of the current or any historic snapshot by id
or timestamp (time travel), schema recorded per commit. When a real
Iceberg runtime is on the classpath, `spark.read.format("iceberg")` on a
real catalog supersedes this; the writer interface is the same shape.

Scale: data files are written by executors (normal parquet write,
partitioned parallelism); only the O(#files) manifest and O(#snapshots)
metadata JSON are driver-side — the same division of labor as real
Iceberg commits.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _load_meta(path: str) -> dict | None:
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    if not os.path.exists(hint):
        return None
    with open(hint) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(_meta_dir(path), f"v{v}.metadata.json")) as fh:
        meta = json.load(fh)
    meta["_version"] = v
    return meta


def _store_meta(path: str, meta: dict, version: int) -> None:
    os.makedirs(_meta_dir(path), exist_ok=True)
    meta = {k: v for k, v in meta.items() if not k.startswith("_")}
    with open(os.path.join(_meta_dir(path), f"v{version}.metadata.json"),
              "w") as fh:
        json.dump(meta, fh, indent=2)
    with open(os.path.join(_meta_dir(path), "version-hint.text"), "w") as fh:
        fh.write(str(version))


def _snapshot_files(path: str, snapshot: dict) -> list[str]:
    with open(os.path.join(_meta_dir(path), snapshot["manifest"])) as fh:
        manifest = json.load(fh)
    return [os.path.join(path, e["path"]) for e in manifest["entries"]]


def write_iceberg(df: DataFrame, path: str, *, mode: str = "append") -> int:
    """Commit ``df`` as a new snapshot; returns the snapshot id.

    ``mode='append'`` adds the new files to the previous snapshot's set;
    ``mode='overwrite'`` starts the file set fresh (logical replace — old
    files stay on disk for time travel, exactly Iceberg's behavior)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")
    meta = _load_meta(path)
    snap_id = int(time.time() * 1000) ^ (uuid.uuid4().int & 0xFFFF)
    data_rel = os.path.join("data", f"snap-{snap_id}")
    df.write.mode("errorifexists").parquet(os.path.join(path, data_rel))

    new_files = sorted(
        os.path.join(data_rel, f)
        for f in os.listdir(os.path.join(path, data_rel))
        if f.endswith(".parquet"))
    entries = [{"path": f,
                "file_size_in_bytes": os.path.getsize(os.path.join(path, f))}
               for f in new_files]

    parent = None
    if meta is not None and meta.get("current-snapshot-id") is not None:
        parent = meta["current-snapshot-id"]
        if mode == "append":
            prev = next(s for s in meta["snapshots"]
                        if s["snapshot-id"] == parent)
            with open(os.path.join(_meta_dir(path), prev["manifest"])) as fh:
                entries = json.load(fh)["entries"] + entries

    os.makedirs(_meta_dir(path), exist_ok=True)
    manifest_name = f"manifest-{snap_id}.json"
    with open(os.path.join(_meta_dir(path), manifest_name), "w") as fh:
        json.dump({"entries": entries}, fh, indent=2)

    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": parent,
        "timestamp-ms": int(time.time() * 1000),
        "summary": {"operation": mode,
                    "added-data-files": len(new_files),
                    "total-data-files": len(entries)},
        "manifest": manifest_name,
        "schema": df.schema.jsonValue(),
    }
    if meta is None:
        meta = {"format-version": 2, "table-uuid": str(uuid.uuid4()),
                "location": path, "snapshots": [], "_version": 0}
    meta["snapshots"].append(snapshot)
    meta["current-snapshot-id"] = snap_id
    _store_meta(path, meta, meta["_version"] + 1)
    return snap_id


def read_iceberg(spark: SparkSession, path: str, *,
                 snapshot_id: int | None = None,
                 as_of_ms: int | None = None) -> DataFrame:
    """Read the current snapshot, a specific one, or the latest at/before
    a timestamp (time travel)."""
    meta = _load_meta(path)
    if meta is None:
        raise FileNotFoundError(f"no iceberg-lite table at {path}")
    snaps = meta["snapshots"]
    if snapshot_id is not None:
        snap = next((s for s in snaps if s["snapshot-id"] == snapshot_id),
                    None)
        if snap is None:
            raise KeyError(f"snapshot {snapshot_id} not found")
    elif as_of_ms is not None:
        eligible = [s for s in snaps if s["timestamp-ms"] <= as_of_ms]
        if not eligible:
            raise KeyError(f"no snapshot at or before {as_of_ms}")
        snap = max(eligible, key=lambda s: s["timestamp-ms"])
    else:
        snap = next(s for s in snaps
                    if s["snapshot-id"] == meta["current-snapshot-id"])
    files = _snapshot_files(path, snap)
    if not files:
        return spark.createDataFrame([], schema=json.dumps(snap["schema"]))
    return spark.read.parquet(*files)


def snapshots(path: str) -> list[dict]:
    """The snapshot log (id, parent, timestamp, operation summary)."""
    meta = _load_meta(path)
    if meta is None:
        return []
    return [{k: s[k] for k in
             ("snapshot-id", "parent-snapshot-id", "timestamp-ms", "summary")}
            for s in meta["snapshots"]]
