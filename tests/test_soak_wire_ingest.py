"""Wire-ingest soak: 100+ micro-batches through the FULL chain —
Kafka wire source → ENVELOPE UPSERT → MV maintenance → SUBSCRIBE.

The round-6 soak (test_soak_streaming.py) proved the state STORE is
bounded; this one proves the whole continual-ingestion chain is
(reference model: kafka.rs source loop feeding upsert.rs feeding a
maintained dataflow): under 100 batches of keyed churn over a real
socket, (a) the per-partition offset frontier advances monotonically
every batch, (b) upsert state tracks the LIVE key set, never the event
history, (c) the maintained view stays correct, and (d) SUBSCRIBE
deltas stay per-batch-sized. VERDICT r6 next-round task 5.
"""

import json

import pytest

pytestmark = pytest.mark.soak
from pyspark.sql import functions as F

from materialize_spark.sources.kafka_wire import KafkaWireStream, MiniBroker
from materialize_spark.streaming.ivm import MaterializedView
from materialize_spark.streaming.upsert import (
    merge_upsert_batch, upsert_latest,
)

N_KEYS = 20
N_BATCHES = 100
ROWS_PER_BATCH = 30
N_PARTS = 2


def test_wire_ingest_chain_bounded(spark):
    with MiniBroker() as broker:
        broker.create_topic("churn", partitions=N_PARTS)
        stream = KafkaWireStream(
            spark, f"{broker.host}:{broker.port}", "churn")

        view = MaterializedView(
            spark=spark,
            define=lambda df: df.groupBy("grp").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("total")),
            keys=["grp"])  # combine=None: recompute over upsert STATE

        truth: dict[str, int] = {}
        state = None
        seq = 0
        frontiers = []
        state_sizes = []
        delta_sizes = []
        for i in range(N_BATCHES):
            # produce one batch of churn over the wire log: every key
            # rewritten ~every cycle, one tombstone per batch
            recs = []
            for j in range(ROWS_PER_BATCH):
                k = f"k{(i * 3 + j) % N_KEYS}"
                tomb = j == (i % ROWS_PER_BATCH)
                v = i * 1000 + j
                payload = None if tomb else json.dumps(
                    {"v": v, "grp": f"g{int(k[1:]) % 4}"}).encode()
                recs.append((k.encode(), payload, seq))
                if tomb:
                    truth.pop(k, None)
                else:
                    truth[k] = v
                seq += 1
            broker.append("churn", i % N_PARTS, recs)

            batch = stream.poll()
            # ENVELOPE UPSERT: last record per key wins; null value = del
            typed = batch.select(
                F.col("key").cast("string").alias("k"),
                F.col("value").cast("string").alias("payload"),
                "partition", "offset")
            latest = upsert_latest(
                typed, ["k"],
                [F.col("partition").desc(), F.col("offset").desc()],
                delete_when=F.col("payload").isNull())
            tombs = (typed.groupBy("k")
                     .agg(F.max_by("payload", "offset").alias("p"))
                     .filter(F.col("p").isNull()).select("k"))
            merged = merge_upsert_batch(
                state, latest.select("k", "payload"), ["k"])
            state = (merged.join(tombs, on="k", how="left_anti")
                     .localCheckpoint(eager=True))

            # MV over the replaced state + SUBSCRIBE delta
            parsed = state.select(
                "k",
                F.get_json_object("payload", "$.v").cast("long").alias("v"),
                F.get_json_object("payload", "$.grp").alias("grp"))
            delta = view.on_state(parsed)
            stream.commit()

            frontiers.append(dict(stream.offsets))
            if i % 10 == 9 or i == N_BATCHES - 1:
                state_sizes.append(state.count())
                delta_sizes.append(delta.count())

        # (a) offset frontier advanced monotonically, ending at the log
        for p in range(N_PARTS):
            seen = [f.get(p, 0) for f in frontiers]
            assert seen == sorted(seen), f"partition {p} frontier regressed"
        total_produced = N_BATCHES * ROWS_PER_BATCH
        assert sum(frontiers[-1].values()) == total_produced

        # (b) upsert state is the LIVE key set, not the event history
        assert max(state_sizes) <= N_KEYS
        assert state_sizes[-1] == len(truth)

        # (c) the maintained view equals the truth aggregated
        expect: dict[str, tuple[int, int]] = {}
        for k, v in truth.items():
            g = f"g{int(k[1:]) % 4}"
            n, tot = expect.get(g, (0, 0))
            expect[g] = (n + 1, tot + v)
        got = {r.grp: (r.n, r.total) for r in view.result().collect()}
        assert got == expect

        # (d) SUBSCRIBE deltas are per-batch-sized (touched groups × 2),
        # not state-sized — the incremental contract
        assert all(d <= 4 * 2 for d in delta_sizes)


def test_wire_ingest_failed_batch_repolls(spark):
    """At-least-once replay: if the consumer fails before commit(), the
    next poll returns the SAME offsets — no data loss across a crashed
    batch (the reference's source loop resumes from its frontier)."""
    with MiniBroker() as broker:
        broker.create_topic("replay", partitions=1)
        stream = KafkaWireStream(
            spark, f"{broker.host}:{broker.port}", "replay")
        broker.append("replay", 0, [(b"a", b"1", 1), (b"b", b"2", 2)])
        b1 = stream.poll()
        assert b1.count() == 2
        # consumer crashes — NO commit; repoll sees the same records
        b2 = stream.poll()
        assert sorted(r.offset for r in b2.collect()) == [0, 1]
        stream.commit()
        broker.append("replay", 0, [(b"c", b"3", 3)])
        b3 = stream.poll()
        assert [bytes(r.key) for r in b3.collect()] == [b"c"]
