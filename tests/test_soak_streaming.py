"""Streaming soak: 100+ micro-batches of keyed churn on RocksDB state.

The reference's upsert operator keeps one row of state per key in RocksDB
(/root/reference/src/storage/src/upsert.rs) — state size tracks the live
key set, not the event history. This soak proves the Spark analog has the
same property: a rate-style source updates a FIXED key space for 120
micro-batches (every key overwritten many times, deletes churning in and
out), and the state store metrics must show bounded keys, not
accumulating event counts. VERDICT r5 item 7.
"""

import pytest

pytestmark = pytest.mark.soak
from pyspark.sql import functions as F

N_KEYS = 50
N_BATCHES = 120
ROWS_PER_BATCH = 200


def test_rocksdb_soak_bounded_state(spark, tmp_path):
    """applyInPandasWithState over RocksDB: 24k events over 120 batches,
    state stays at the live-key count throughout."""
    assert "RocksDB" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass")

    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(i: int) -> None:
        # every batch overwrites the same key space: key k gets value
        # i*1000+k; key (i % N_KEYS) is deleted this batch (tombstone)
        rows = [(f"k{j % N_KEYS}", i * 1000 + j, j == (i % N_KEYS))
                for j in range(ROWS_PER_BATCH)]
        pd.DataFrame(rows, columns=["k", "v", "tomb"]).to_parquet(
            src_dir / f"b{i:04d}.parquet")

    for i in range(N_BATCHES):
        write_batch(i)

    stream = (
        spark.readStream.schema("k string, v long, tomb boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )

    def upsert(key, pdf_iter, state: GroupState):
        latest, alive = None, True
        if state.exists:
            latest, alive = state.get
        for pdf in pdf_iter:
            for v, tomb in zip(pdf["v"], pdf["tomb"]):
                latest, alive = int(v), not bool(tomb)
        state.update((latest, alive))
        yield pd.DataFrame({"k": [key[0]], "v": [latest],
                            "alive": [alive]})

    out = stream.groupBy("k").applyInPandasWithState(
        upsert, "k string, v long, alive boolean",
        "v long, alive boolean", "update", GroupStateTimeout.NoTimeout)

    progresses = []
    q = (out.writeStream.format("noop").outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(600)
    finally:
        progresses = list(q.recentProgress)
        q.stop()

    assert progresses, "no progress recorded"
    batches = [p for p in progresses if p["stateOperators"]]
    # recentProgress retains ~100 entries; batchId counts all of them
    assert batches[-1]["batchId"] >= N_BATCHES - 1, \
        f"only {batches[-1]['batchId'] + 1} batches ran"
    key_counts = [p["stateOperators"][0]["numRowsTotal"] for p in batches]
    # bounded: state is exactly the key space once all keys seen, and
    # NEVER grows past it — 24,000 events, 50 state rows
    assert max(key_counts) <= N_KEYS
    assert key_counts[-1] == N_KEYS
    # churn really happened: the retained window alone shows constant
    # per-batch updates at the key-space size
    updated = [p["stateOperators"][0]["numRowsUpdated"] for p in batches]
    assert sum(updated) >= len(batches) * N_KEYS // 2
    # memory metric reported by the RocksDB provider and sane (< 64 MiB
    # for 50 keys — catches accidental per-event state accumulation)
    mem = batches[-1]["stateOperators"][0].get("memoryUsedBytes", 0)
    assert 0 < mem < (64 << 20)


def test_soak_final_state_correct(spark, tmp_path):
    """Same churn via the foreachBatch upsert merge path: final maintained
    table equals the last-writer-wins truth over all 120 batches."""
    import pandas as pd

    from materialize_spark.streaming.upsert import (
        merge_upsert_batch, upsert_latest,
    )

    src_dir = tmp_path / "src2"
    src_dir.mkdir()
    truth: dict[str, int] = {}
    seq = 0
    for i in range(N_BATCHES):
        rows = []
        for j in range(40):
            k = f"k{(i * 7 + j) % N_KEYS}"
            v = i * 1000 + j
            tomb = (i + j) % 17 == 0
            rows.append((k, v, seq, tomb))
            if tomb:
                truth.pop(k, None)
            else:
                truth[k] = v
            seq += 1
        pd.DataFrame(rows, columns=["k", "v", "seq", "tomb"]).to_parquet(
            src_dir / f"b{i:04d}.parquet")

    stream = (
        spark.readStream.schema("k string, v long, seq long, tomb boolean")
        .option("maxFilesPerTrigger", 1).parquet(str(src_dir))
    )
    holder = {"state": None, "batches": 0}

    def on_batch(batch, _epoch):
        latest = upsert_latest(batch, ["k"], [F.col("seq").desc()],
                               delete_when=F.col("tomb"))
        # deletes must also REMOVE existing keys, not just filter adds
        tombs = batch.groupBy("k").agg(
            F.max_by("tomb", "seq").alias("tomb")).filter("tomb")
        merged = merge_upsert_batch(holder["state"], latest.drop("tomb"),
                                    ["k"])
        merged = merged.join(tombs.select("k"), on="k", how="left_anti")
        holder["state"] = merged.localCheckpoint(eager=True)
        holder["batches"] += 1

    q = (stream.writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    q.stop()

    assert holder["batches"] >= 100
    got = {r.k: r.v for r in holder["state"].select("k", "v").collect()}
    assert got == truth
