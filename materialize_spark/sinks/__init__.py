"""Sinks: continuous export + one-shot COPY TO.

Reference: StorageSinkConnection {Kafka, Iceberg}
(src/storage-types/src/sinks.rs:137-140), COPY TO s3 one-shot
(src/compute/src/sink/copy_to_s3_oneshot.rs), SUBSCRIBE
(src/compute/src/sink/subscribe.rs).

Spark mapping: writeStream (kafka when the jar exists; files/memory always),
``copy_to`` = batch DataFrameWriter, SUBSCRIBE = the IVM delta frames
(streaming/ivm.py) written to any sink.
"""

from materialize_spark.sinks.writers import copy_to, stream_to_files, stream_to_memory, kafka_sink

__all__ = ["copy_to", "stream_to_files", "stream_to_memory", "kafka_sink"]
