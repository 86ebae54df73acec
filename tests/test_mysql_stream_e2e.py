"""MySQL binlog CDC over a real Structured Streaming pipeline.

Reference shape: the MySQL source tails the binlog continuously and the
decoded (row, diff) updates keep downstream state current
(/root/reference/src/storage/src/source/mysql/replication.rs). Here the
binlog is a file-backed stream (one parquet file per replication chunk,
maxFilesPerTrigger=1 → one micro-batch each), decoded with the same
Arrow-batched mapInPandas path the batch queries use, folded into the
maintained table state per batch.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from materialize_spark.sources.mysql_binlog import (
    DELETE_ROWS_V2, T_LONGLONG, T_VARCHAR, UPDATE_ROWS_V2, WRITE_ROWS_V2,
    binlog_to_diff, decode_binlog_stream, encode_rows_event,
    encode_table_map, parse_table_map,
)
from materialize_spark.sources.pgoutput import apply_cdc

CT, META = [T_LONGLONG, T_VARCHAR], [0, 255]
DDL = "id long, name string"


def _binlog_chunks(tmp_path):
    chunks = [
        [encode_rows_event(WRITE_ROWS_V2, 3, [[1, "ann"], [2, "bob"]],
                           CT, META)],
        [encode_rows_event(UPDATE_ROWS_V2, 3, [([1, "ann"], [1, "ANN"])],
                           CT, META),
         encode_rows_event(WRITE_ROWS_V2, 3, [[3, "cat"]], CT, META)],
        [encode_rows_event(DELETE_ROWS_V2, 3, [[2, "bob"]], CT, META)],
    ]
    src = tmp_path / "binlog_stream"
    src.mkdir()
    pos = 0
    for i, chunk in enumerate(chunks):
        table = pa.table({
            "pos": pa.array(range(pos, pos + len(chunk)), pa.int64()),
            "event": pa.array([bytes(e) for e in chunk], pa.binary()),
        })
        pos += len(chunk)
        f = src / f"part-{i:05d}.parquet"
        pq.write_table(table, str(f))
        os.utime(str(f), (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src)


def test_binlog_stream_maintains_state(spark, tmp_path):
    src = _binlog_chunks(tmp_path)
    # TABLE_MAP arrives out-of-band here (harvested once in the reference
    # via its schema snapshot); rows events reference it by table id
    tme = parse_table_map(encode_table_map(3, "db", "people", CT, META))
    maps = {3: tme}
    cols = {"db.people": ["id", "name"]}

    state = [spark.createDataFrame([], DDL)]
    batches = []

    def on_batch(batch_df, _epoch):
        env = decode_binlog_stream(batch_df, table_maps=maps, columns=cols)
        diff = binlog_to_diff(env, "db.people", DDL)
        state[0] = apply_cdc(state[0], diff, ["id"]) \
            .localCheckpoint(eager=True)
        batches.append({r.id: r.name for r in state[0].collect()})

    stream = (spark.readStream
              .schema("pos bigint, event binary")
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    q = (stream.writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    assert batches[0] == {1: "ann", 2: "bob"}
    assert batches[1] == {1: "ANN", 2: "bob", 3: "cat"}
    assert batches[-1] == {1: "ANN", 3: "cat"}
