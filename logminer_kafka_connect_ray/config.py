"""Engine configuration.

Re-expresses the reference's typed config surface
(``SourceConnectorConfig.kt:121-250``, 16 keys: batch.size, start.scn,
table whitelist, tombstones, poll interval, db timezone, fetch size, ...)
as a plain dataclass. Keys that only make sense for a JDBC poll loop
(connection retry, fetch size) map onto Ray-native knobs
(task max_retries, map_batches batch_size).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


@dataclass
class EngineConfig:
    # Lake layout -----------------------------------------------------
    lake_dir: str = "/tmp/cdc_lake"
    #: number of hash partitions of the lake (partition id =
    #: stable_hash(url) % num_partitions).  This is the ONE partitioning
    #: key reused across snapshot, merge and read; at 100 TB scale pick
    #: num_partitions so a partition is ~1 GiB.
    num_partitions: int = 16

    # Source ----------------------------------------------------------
    #: table whitelist (reference `table.whitelist`,
    #: SourceConnectorConfig.kt:86-97).  Empty = all tables.
    table_whitelist: tuple[str, ...] = ()
    #: SCN to start from when there is no checkpoint (reference
    #: `start.scn`, SourceConnectorConfig.kt:122-139).  0 = snapshot first.
    start_scn: int = 0
    #: changelog input shape: 'struct' (before/after image structs) or
    #: 'redo_sql' (raw statement text + CSF flags, the reference's
    #: v$logmnr_contents shape parsed by functions/redo_sql.py).
    changelog_format: str = "struct"
    #: timezone unzoned redo literals are interpreted in (reference
    #: `db.timezone`, ColumnSchemaBuilder.kt:159-181).
    db_timezone: str = "UTC"

    # Replay loop -----------------------------------------------------
    #: max change events per micro-batch checkpoint (reference
    #: `batch.size` poll batches, SourceConnectorConfig.kt:207-213 --
    #: scaled up: ours is a distributed micro-batch, not a poll).
    max_events_per_checkpoint: int = 50_000_000
    #: rows per Arrow batch inside map_batches stages.  None (default)
    #: = auto: target ``target_batch_bytes`` per batch using the event
    #: files' uncompressed row size, clamped to [16k, 512k] rows.
    #: Large batches amortize per-batch overhead and give the
    #: block-local combiner enough rows per key to prune; the byte
    #: target keeps batch x concurrency within worker heaps even for
    #: multi-KB html payloads.
    batch_size: int | None = None
    #: in-memory bytes targeted per processing batch when batch_size
    #: is auto.
    target_batch_bytes: int = 64 * 1024 * 1024
    #: actor-pool size for stateful stages (txn consolidation, schema
    #: registry).  None = let Ray pick from cluster size.
    actor_concurrency: int | None = None
    #: emit (key, null) tombstone rows into the optional changelog
    #: output (reference `tombstones.on.delete`,
    #: SourceConnectorConfig.kt:118-119).  The lake itself materializes
    #: deletes by removing rows.
    emit_tombstones: bool = False

    # Skew ------------------------------------------------------------
    #: per-block net-change pre-aggregation is always on (it is the
    #: salted two-level fold that protects the merge shuffle from hot
    #: urls); this additionally salts the *shuffle key* so a single hot
    #: partition's events spread over `salt_factor` sub-shards before
    #: the final per-partition fold.
    salt_factor: int = 1

    # Schema ----------------------------------------------------------
    #: key column of the lake table (reference: PK discovered from the
    #: catalog, SchemaService.kt:50-54; here the web-page PK is `url`).
    key_column: str = "url"
    #: initial data columns (beyond the key).  Grows by schema evolution.
    data_columns: tuple[str, ...] = ("warc_ts", "html", "text", "lang")

    # Misc ------------------------------------------------------------
    #: drop rows whose redo was unreadable (reference status=2 skip,
    #: LogminerSource.kt:96-115) -- always on; this only controls
    #: whether they are routed to the dead-letter output.
    dead_letter: bool = True
    #: user single-message-transform hook (the reference declares Kafka
    #: Connect SMT support in its manifest.json / SURVEY.md section
    #: 2.10): a module-level callable ``pa.Table -> pa.Table`` applied
    #: to each decoded flat change batch exactly once, between decode
    #: and the commit-resolve/combiner stages (so transformed rows are
    #: what gets spilled, emitted and merged).  It may rewrite the data
    #: columns (``a_*``/``b_*``) but must preserve the pipeline schema;
    #: the processor raises if the schema changes.  Must be picklable
    #: (a top-level function), since it ships to Ray workers.
    transform: Callable[[Any], Any] | None = None

    #: incrementally-maintained aggregate views over the lake table
    #: (materialized-view maintenance -- the downstream-aggregate half
    #: of a CDC pipeline, kept fresh from per-partition merge deltas
    #: instead of rescanning the lake).  Each spec is
    #: ``(view_name, group_column, char_length_column_or_None)``; the
    #: maintained state is, per group value: row count and (optionally)
    #: total character length of the named string column.  Updated
    #: exactly-once per committed version (deltas ride the lineage rows
    #: the merge already emits; the cumulative state is published as a
    #: ``views/v{version}.json`` sidecar next to the manifest).  Read
    #: back with ``Engine.view(name)``.
    views: tuple[tuple[str, str, str | None], ...] = ()

    #: sub-batch resume granularity (reference analog: per-(scn,rowId)
    #: offsets, Offset.kt:19-59).  When on, each partition-merge task
    #: records its lineage row in a per-version ledger
    #: (``_partial/v{V}``) after its atomic file rename; a re-run of the
    #: same uncommitted version skips completed partitions instead of
    #: rewriting the whole micro-batch.  Zero cost on the happy path
    #: beyond one tiny JSON write per partition per micro-batch.
    subbatch_checkpoint: bool = True

    extra: dict = field(default_factory=dict)

    @property
    def all_columns(self) -> tuple[str, ...]:
        return (self.key_column, *self.data_columns)
