"""Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``thake/logminer-kafka-connect`` (an Oracle
LogMiner -> Kafka Connect CDC source) as a batch-incremental
``ray.data`` pipeline over a Common-Crawl-style web-page Parquet lake.

The reference (read-only at /root/reference) emits an SCN-ordered,
committed-transactions-only stream of change events with
before/after images and resumable offsets; Kafka log compaction on
the primary-key gives the downstream a last-writer-wins table state.
This engine rebuilds those *semantics* natively on Ray Data:

- snapshot-then-stream handoff   (reference SourceTask.kt:113-131)
- transaction consolidation      (reference logminer/TransactionConsolidator.kt)
- change decoding + envelope     (reference ConnectSchemaFactory.kt)
- LWW key-partitioned merge      (reference semantics: Kafka compaction on PK)
- checkpoint / resume / lineage  (reference Offset.kt)
- schema evolution               (reference SchemaService.kt:34-40)

See SURVEY.md at the repo root for the full mapping.
"""

from logminer_kafka_connect_ray.config import EngineConfig


def __getattr__(name):  # lazy: avoid importing ray at package import
    if name == "Engine":
        from logminer_kafka_connect_ray.pipelines.engine import Engine
        return Engine
    raise AttributeError(name)


__all__ = ["Engine", "EngineConfig"]
__version__ = "0.1.0"
