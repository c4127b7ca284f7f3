"""Multi-table orchestration.

The reference streams one redo log carrying changes for MANY tables and
fans them out to one Kafka topic per table (``TableId`` +
``SourceDatabaseNameService`` naming, whitelist expansion
``SourceTask.kt:46-63``).  Here: one changelog directory carrying mixed
tables fans out to one lake per table -- each table gets its own
``Engine`` with ``table_whitelist=(that table,)`` (the decode stage's
S6 filter) and a partition directory named with the reference's
sanitization rules (``naming.py``).

Per-table replays are independent micro-batch pipelines over the same
files (each prunes to its own rows at decode); their manifests advance
independently, like per-topic offsets.
"""

from __future__ import annotations

import os
from dataclasses import replace

import pyarrow.dataset as pads

from logminer_kafka_connect_ray.config import EngineConfig
from logminer_kafka_connect_ray.naming import matches_whitelist, sanitize_name
from logminer_kafka_connect_ray.pipelines.engine import Engine
from logminer_kafka_connect_ray.state.checkpoint import Manifest


def discover_tables(changelog_dir: str) -> list[str]:
    """Distinct table names in the changelog (column-pruned scan)."""
    paths = [
        os.path.join(changelog_dir, f)
        for f in sorted(os.listdir(changelog_dir))
        if f.endswith(".parquet")
    ]
    if not paths:
        return []
    t = pads.dataset(paths, format="parquet").to_table(columns=["table"])
    return sorted(x for x in set(t.column("table").to_pylist()) if x)


class MultiTableEngine:
    """One Engine per whitelisted table under ``{root}/{db.owner.table}``."""

    def __init__(self, root_dir: str, base_config: EngineConfig, db_name: str = "lake"):
        self.root_dir = root_dir
        self.base_config = base_config
        self.db_name = db_name
        self.engines: dict[str, Engine] = {}

    def engine_for(self, table: str) -> Engine:
        if table not in self.engines:
            name = sanitize_name(f"{self.db_name}.{table}")
            cfg = replace(
                self.base_config,
                lake_dir=os.path.join(self.root_dir, name),
                table_whitelist=(table,),
            )
            self.engines[table] = Engine(cfg)
        return self.engines[table]

    def snapshot(self, bases: dict[str, str], snapshot_scn: int) -> dict[str, Manifest]:
        """bases: table name -> base parquet path."""
        out = {}
        for table, path in bases.items():
            out[table] = self.engine_for(table).snapshot(path, snapshot_scn)
        return out

    def replay(self, changelog_dir: str) -> dict[str, Manifest]:
        """Replay the mixed changelog into every whitelisted table's lake."""
        wl = self.base_config.table_whitelist
        tables = [
            t for t in discover_tables(changelog_dir) if matches_whitelist(t, wl)
        ]
        return {t: self.engine_for(t).replay(changelog_dir) for t in tables}

    def stream(
        self, changelog_dir: str, max_polls: int = 10, **stream_kw
    ) -> dict[str, int]:
        """Streaming fan-out: one poll loop per whitelisted table over
        the SAME mixed changelog (the reference's single task serving
        many topics, ``SourceTask.kt:46-63``).  Each table's decode
        task prunes to its own rows (S6 whitelist inside
        ``_decode_changelog_file``); terminators for foreign tables'
        txns are no-ops on that table's shards, so per-table
        watermarks advance independently -- per-topic offsets,
        re-expressed.  Returns rows applied per table."""
        from logminer_kafka_connect_ray.pipelines.streaming import (
            StreamingEngine,
        )

        wl = self.base_config.table_whitelist
        tables = [
            t for t in discover_tables(changelog_dir) if matches_whitelist(t, wl)
        ]
        streams = {
            t: StreamingEngine(self.engine_for(t), changelog_dir, **stream_kw)
            for t in tables
        }
        try:
            return {t: s.run(max_polls=max_polls) for t, s in streams.items()}
        finally:
            for s in streams.values():
                s.shutdown()
