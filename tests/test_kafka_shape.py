"""Kafka-shaped pipeline end-to-end, without a broker.

Reference shape: src/storage/src/upsert.rs — a keyed topic of Debezium
envelopes feeding a maintained view, with SUBSCRIBE deltas downstream.
The sandbox has no Kafka, so the topic is emulated as sequential JSON
files (one per micro-batch via maxFilesPerTrigger=1): same record shape
(key, value-envelope, offset), same decode → IVM → SUBSCRIBE dataflow the
Kafka source would drive.
"""

import json

import pytest
from pyspark.sql import functions as F

from materialize_spark.sources.envelopes import debezium_decode
from materialize_spark.streaming.retraction import DIFF_COL, RetractionAwareAgg
from materialize_spark.streaming.subscribe import envelope_upsert

ROW_DDL = "k bigint, category string, amount double"


def _envelope(op, before=None, after=None):
    return json.dumps({"before": before, "after": after, "op": op})


def _topic_files(tmp_path):
    """Three 'Kafka batches' of Debezium traffic over keys 1..4."""
    b1 = [
        _envelope("c", after={"k": 1, "category": "a", "amount": 10.0}),
        _envelope("c", after={"k": 2, "category": "a", "amount": 20.0}),
        _envelope("c", after={"k": 3, "category": "b", "amount": 30.0}),
    ]
    b2 = [
        # update k=2 (retract before, add after), insert k=4
        _envelope("u", before={"k": 2, "category": "a", "amount": 20.0},
                  after={"k": 2, "category": "b", "amount": 25.0}),
        _envelope("c", after={"k": 4, "category": "a", "amount": 40.0}),
    ]
    b3 = [
        # delete k=1
        _envelope("d", before={"k": 1, "category": "a", "amount": 10.0}),
    ]
    src = tmp_path / "topic"
    src.mkdir()
    for i, batch in enumerate([b1, b2, b3]):
        (src / f"part-{i:05d}.json").write_text(
            "\n".join(json.dumps({"offset": i * 100 + j, "value": v})
                      for j, v in enumerate(batch)))
    return str(src)


def test_debezium_topic_to_ivm_to_subscribe(spark, tmp_path):
    src = _topic_files(tmp_path)

    view = RetractionAwareAgg(
        spark, keys=["category"],
        aggs={"total": ("sum", "amount"), "n": ("count", "amount")})
    subscribe_batches = []
    prev_result = [None]

    def on_batch(batch_df, batch_id):
        delta = debezium_decode(batch_df, "value", ROW_DDL) \
            .withColumnRenamed("diff", DIFF_COL)
        result = view.on_batch(delta).localCheckpoint(eager=True)
        # result-level (data, diff) delta = the SUBSCRIBE stream
        # (streaming/ivm.py _delta semantics)
        adds = (result if prev_result[0] is None
                else result.exceptAll(prev_result[0])).withColumn(
                    DIFF_COL, F.lit(1))
        out_delta = adds if prev_result[0] is None else adds.unionByName(
            prev_result[0].exceptAll(result).withColumn(DIFF_COL, F.lit(-1)))
        prev_result[0] = result
        subscribe_batches.append(
            [tuple(r) for r in
             envelope_upsert(out_delta, ["category"]).collect()])

    stream = (spark.readStream
              .schema("offset bigint, value string")
              .option("maxFilesPerTrigger", 1)
              .json(src))
    q = (stream.writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # Final maintained state == batch recompute over surviving rows:
    # k=2 moved a->b, k=1 deleted; survivors: k2(b,25), k3(b,30), k4(a,40).
    final = {r.category: (round(r.total, 4), r.n)
             for r in view.result().collect()}
    assert final == {"a": (40.0, 1), "b": (55.0, 2)}

    # Replaying the SUBSCRIBE upsert envelopes reconstructs the same state:
    # apply batches in order, NULL values delete the key.
    state = {}
    for batch in subscribe_batches:
        for row in batch:
            cat, vals = row[0], row[1:]
            if all(v is None for v in vals):
                state.pop(cat, None)
            else:
                state[cat] = vals
    replayed = {k: (round(v[0], 4), v[1]) for k, v in state.items()}
    assert replayed == final

    # Deltas, not snapshots: batch 3 (k=1's delete) touches only 'a', so
    # its envelope must carry exactly the corrected 'a' row — a snapshot
    # would re-emit the unchanged 'b' aggregate too.
    assert len(subscribe_batches) == 3
    last = subscribe_batches[2]
    assert [row[0] for row in last] == ["a"]
    assert (round(last[0][1], 4), last[0][2]) == (40.0, 1)


def test_debezium_decode_shapes(spark):
    rows = [
        (_envelope("c", after={"k": 9, "category": "z", "amount": 1.0}),),
        (_envelope("d", before={"k": 9, "category": "z", "amount": 1.0}),),
    ]
    df = spark.createDataFrame(rows, "value string")
    decoded = debezium_decode(df, "value", ROW_DDL)
    got = sorted((r.k, r.category, r.amount, r.diff)
                 for r in decoded.collect())
    assert got == [(9, "z", 1.0, -1), (9, "z", 1.0, 1)]
