"""Engine driver: snapshot -> replay loop -> resumable lake.

The Ray-Data-native re-expression of the reference's task lifecycle
(``SourceTask.kt:113-150``): cold start runs the initial snapshot, then
hands off to the redo-log tail at the snapshot SCN
(``SourceTask.kt:125-131``, ``Offset.kt:45``); every poll batch becomes
a micro-batch here; the Kafka Connect offset store becomes the lake's
manifest store (``state/checkpoint.py``).  See SURVEY.md section 3.4
for the lifecycle mapping.

One micro-batch = one committed lake version:

    txn-metadata scan (parallel, OVERLAPPED with the read below)
    read event files (SCN-pruned, column-pruned)       [parquet scan]
      -> fused processor: decode + resume-skip filter
         + commit resolve (broadcast hashes) + combiner [map_batches]
      -> union(carryover open-txn spill)
      -> sort('_part', boundaries=[1..P-1])             [the exchange]
      -> PartitionMerger (LWW fold, copy-on-write)      [map_batches]
      -> lineage rows -> manifest publish               [driver]

The committed path streams end-to-end; only the tiny lineage table
ever materializes on the driver.
"""

from __future__ import annotations

import logging
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.config import EngineConfig
from logminer_kafka_connect_ray.functions.hashing import hash_probe
from logminer_kafka_connect_ray.sources import changelog as changelog_src
from logminer_kafka_connect_ray.sources.snapshot import SnapshotStamper
from logminer_kafka_connect_ray.stages.decode import ChangeDecoder
from logminer_kafka_connect_ray.stages.evolve import (
    align_flat,
    apply_renames,
    catalog_defaults,
    catalog_dropped,
    catalog_fields,
    catalog_renames,
    discover_image_fields,
    typed_defaults,
    unify_with,
)
from logminer_kafka_connect_ray.stages.merge import PartitionMerger, PreaggPartitioner
from logminer_kafka_connect_ray.stages.process import make_processor_fn
from logminer_kafka_connect_ray.stages.txn import collect_txn_info_ref
from logminer_kafka_connect_ray.state.checkpoint import (
    Manifest,
    ManifestStore,
    PartitionEntry,
)

log = logging.getLogger(__name__)


def _ray():
    import ray  # local import: the driver owns ray.init, never this module

    return ray


class Engine:
    def __init__(self, config: EngineConfig):
        self.config = config
        self.store = ManifestStore(config.lake_dir)
        self.last_stats: str | None = None

    # ------------------------------------------------------------------
    # Public API (reference SPI analog: Engine(config).snapshot()/
    # .replay()/.resume(), SURVEY.md section 2.10)
    # ------------------------------------------------------------------
    def snapshot(self, base_parquet: str | list[str], snapshot_scn: int) -> Manifest:
        """Initial snapshot: every base row -> READ event at
        ``snapshot_scn``, applied through the standard merge path as
        lake version 1.  Idempotent: an existing version-1 manifest
        short-circuits (resume semantics of SelectOffset, Offset.kt:45).
        """
        import ray.data as rd

        existing = self.store.load()
        if existing is not None:
            log.info("snapshot already committed (version %d)", existing.version)
            return existing

        cfg = self.config
        table_schema = self._initial_schema(base_parquet)
        schema_json = schemas.schema_to_json(table_schema)
        ds = rd.read_parquet(base_parquet)
        flat = ds.map_batches(
            SnapshotStamper(schema_json, cfg.key_column, snapshot_scn),
            batch_format="pyarrow",
        )
        return self._merge_and_publish(
            flat,
            version=1,
            phase="snapshot",
            table_schema=table_schema,
            schema_version=0,
            scn_lo=snapshot_scn - 1,
            scn_hi=snapshot_scn,
            prev=None,
            open_spill=None,
            markers_stats=(0, 0, 0),
        )

    def snapshot_chunked(
        self, chunks: list[tuple[str, int]], base_scn: int
    ) -> Manifest:
        """DBLog-style chunked snapshot: each chunk is a key-range
        slice of the source table read AS OF ITS OWN SCN (a live
        database keeps moving while a long snapshot runs; Netflix
        DBLog, Andreadis & Gross 2019, solves this with per-chunk
        watermark windows).  The reference cannot do this -- its
        flashback snapshot is one consistent SCN (SelectSource.kt:9-104)
        and a table too large to snapshot in one flashback window
        simply fails.

        ``chunks`` is ``[(parquet_path, chunk_scn), ...]``.  Each
        chunk's rows become READ events stamped at that chunk's SCN
        (``commit_scn = scn = chunk_scn``), so the standard
        ``(commit_scn, scn, row_id)`` LWW fold IS the watermark
        arbitration: a change event with commit <= chunk_scn loses to
        the chunk row (its effect is already inside the chunk image),
        one with commit > chunk_scn wins.  No special-case window
        logic -- the DBLog chunk/log interleave collapses into the
        same fold every other path uses, which is why all six replay
        routes can share one oracle.

        The published manifest watermark is ``base_scn`` (before the
        first change event), so a following ``replay()`` re-reads the
        whole log and idempotently folds it over the mixed-SCN chunk
        state; a production deployment would advance it to
        ``min(chunk_scns)`` (files wholly below the oldest chunk are
        dominated) -- kept at base_scn here so chunk SCN choice can
        never interact with file pruning.  Chunk SCNs must not equal
        any event commit_scn (ties would make 'already inside the
        image' ambiguous); callers pick inter-transaction SCNs.
        Idempotent like ``snapshot()``: an existing manifest
        short-circuits."""
        import ray.data as rd

        existing = self.store.load()
        if existing is not None:
            log.info("snapshot already committed (version %d)", existing.version)
            return existing

        cfg = self.config
        table_schema = self._initial_schema(chunks[0][0])
        schema_json = schemas.schema_to_json(table_schema)
        flat = None
        for path, chunk_scn in chunks:
            part = rd.read_parquet(path).map_batches(
                SnapshotStamper(schema_json, cfg.key_column, int(chunk_scn)),
                batch_format="pyarrow",
            )
            flat = part if flat is None else flat.union(part)
        return self._merge_and_publish(
            flat,
            version=1,
            phase="snapshot",
            table_schema=table_schema,
            schema_version=0,
            scn_lo=base_scn - 1,
            scn_hi=base_scn,
            prev=None,
            open_spill=None,
            markers_stats=(0, 0, 0),
        )

    def replay(self, changelog_dir: str) -> Manifest:
        """Replay all unapplied change-event files, one committed lake
        version per micro-batch.  Safe to call repeatedly / after a
        crash: already-committed versions are detected by manifest and
        skipped (exactly-once table state)."""
        m = self.store.load()
        if m is None:
            if self.config.start_scn > 0:
                # snapshot-less start (reference `start.scn`,
                # SourceConnectorConfig.kt:122-139; SourceTaskTest
                # `start.scn=1 reads history via CDC only`): bootstrap
                # an empty lake at start_scn and replay from there
                m = self._bootstrap_from_scn(changelog_dir)
            else:
                raise RuntimeError(
                    "no snapshot/manifest; run snapshot() first or set "
                    "EngineConfig.start_scn for a snapshot-less start"
                )
        files = changelog_src.list_batch_files(changelog_dir)
        changelog_src.check_contiguity(files, m.watermark_scn)
        pending = changelog_src.prune_files(files, m.watermark_scn, None)
        plan = changelog_src.plan_microbatches(
            pending, self.config.max_events_per_checkpoint
        )
        for bfiles, _, hi in plan:
            m = self._apply_cdc_batch(m, bfiles, m.watermark_scn, hi)
        # trailing open txns with no more files: nothing to do -- their
        # spill carries to the next replay() call (reference: offset
        # held at minOpenTransaction, TransactionConsolidator.kt:56-64)
        return m

    def resume(self, changelog_dir: str) -> Manifest:
        """Alias of replay(): the manifest IS the offset."""
        return self.replay(changelog_dir)

    def changelog(self, changelog_dir: str, scn_lo: int | None = None,
                  scn_hi: int | None = None):
        """Committed change events as Debezium-envelope records (the
        reference's OUTPUT surface: op/before/after/source/ts_ms per
        row, ConnectSchemaFactory.kt:56-163), as a streaming Dataset.
        ``config.emit_tombstones`` adds the (key, null) tombstone row
        after each DELETE (reference `tombstones.on.delete`,
        SourceConnectorConfig.kt:118-119)."""
        import ray.data as rd

        from logminer_kafka_connect_ray.stages.envelope import EnvelopeStage

        m = self._require_manifest(None)
        table_schema = schemas.schema_from_json(m.schema)
        files = changelog_src.list_batch_files(changelog_dir)
        pruned = changelog_src.prune_files(files, scn_lo, scn_hi)
        paths = [f.path for f in pruned]
        if not paths:
            return rd.from_arrow(
                EnvelopeStage(m.schema, self.config.key_column).out_schema.empty_table()
            )
        _, markers_ref = collect_txn_info_ref(paths, scn_lo, scn_hi, block=False)
        ds = rd.read_parquet(paths)
        decoded = ds.map_batches(
            make_processor_fn(
                markers_ref, m.schema, self.config.key_column,
                self.config.table_whitelist, scn_lo, scn_hi,
                self.config.num_partitions, "emit",
                changelog_format=self.config.changelog_format,
                db_timezone=self.config.db_timezone,
                transform=self.config.transform,
            ),
            batch_format="pyarrow",
        )
        return decoded.map_batches(
            EnvelopeStage(
                m.schema, self.config.key_column,
                emit_tombstones=self.config.emit_tombstones,
            ),
            batch_format="pyarrow",
        )

    def _bootstrap_from_scn(self, changelog_dir: str) -> Manifest:
        """Publish an empty version-1 manifest at ``start_scn - 1`` so
        events with scn >= start_scn replay onto an empty table.  The
        table schema comes from the changelog itself: struct-image
        footers, plus the _catalog.json dictionary sidecar for the
        redo-SQL format (the reference discovers it from the DB catalog,
        SchemaService.kt:50-69)."""
        cfg = self.config
        files = changelog_src.list_batch_files(changelog_dir)
        paths = [f.path for f in files]
        fields = discover_image_fields(paths)
        if cfg.changelog_format == "redo_sql":
            fields = fields + catalog_fields(paths)
        data_fields = [f for f in fields if f.name != cfg.key_column]
        if not data_fields:
            raise RuntimeError(
                "start_scn bootstrap needs a schema source: no image "
                "struct footers or _catalog.json found in the changelog"
            )
        table_schema = pa.schema(
            [pa.field(cfg.key_column, pa.string())] + data_fields
        )
        m = Manifest(
            version=1,
            checkpoint_id="ckpt-00000001",
            watermark_scn=cfg.start_scn - 1,
            last_commit_scn=0,
            min_open_scn=None,
            phase="start-scn",
            num_partitions=cfg.num_partitions,
            schema_version=0,
            schema=schemas.schema_to_json(table_schema),
            partitions=[],
            open_txn_spill=None,
            hash_probe=hash_probe(cfg.num_partitions),
            metrics={"events_applied": 0},
        )
        if not self.store.publish(m):
            return self.store.load()
        return m

    # ------------------------------------------------------------------
    def read_table(
        self,
        version: int | None = None,
        with_meta: bool = False,
        columns: list[str] | None = None,
    ):
        """Current lake state as a ray Dataset (schema-unified;
        ``columns`` prunes at the parquet read)."""
        import ray.data as rd

        m = self._require_manifest(version)
        paths = [
            f"{self.config.lake_dir}/{p.file}" for p in m.partitions if p.file
        ]
        schema = schemas.schema_from_json(m.schema)
        out_schema = schemas.lake_schema(schema) if with_meta else schema
        if columns:
            out_schema = pa.schema([out_schema.field(c) for c in columns])
        if not paths:
            return rd.from_arrow(out_schema.empty_table())
        dflt = typed_defaults(
            out_schema, m.defaults, self.config.db_timezone
        )
        fillf = {new: old for old, new in (m.renames or {}).items()}
        # a renamed-into column's source must be read even when pruned
        read_cols = list(columns) if columns else None
        if read_cols is not None:
            for c in list(read_cols):
                if c in fillf and fillf[c] not in read_cols:
                    read_cols.append(fillf[c])
        ds = rd.read_parquet(paths, columns=read_cols)
        return ds.map_batches(
            lambda t, s=out_schema, d=dflt, ff=fillf: align_flat(t, s, d, ff),
            batch_format="pyarrow",
        )

    def to_arrow(self, version: int | None = None, with_meta: bool = False) -> pa.Table:
        """Lake state as one Arrow table (tests / small results only)."""
        m = self._require_manifest(version)
        schema = schemas.schema_from_json(m.schema)
        out_schema = schemas.lake_schema(schema) if with_meta else schema
        dflt = typed_defaults(out_schema, m.defaults, self.config.db_timezone)
        fillf = {new: old for old, new in (m.renames or {}).items()}
        tables = []
        for p in m.partitions:
            if p.file:
                t = pq.read_table(f"{self.config.lake_dir}/{p.file}")
                tables.append(align_flat(t, out_schema, dflt, fillf))
        if not tables:
            return out_schema.empty_table()
        t = pa.concat_tables(tables)
        return t.take(
            pc.sort_indices(t, sort_keys=[(self.config.key_column, "ascending")])
        )

    def lookup(
        self,
        keys: list[str],
        version: int | None = None,
        with_meta: bool = False,
    ) -> pa.Table:
        """Point lookup by key with partition pruning: hash each probe
        key with the SAME partitioner the merge used (the manifest's
        ``hash_probe`` guards against drift via ``_require_manifest``),
        read ONLY the partition files those hashes land in, and return
        the matching rows.  At 100 TB this is the difference between
        touching ~k files and scanning the lake; the per-probe cost is
        O(partition), independent of lake size.

        Reads go through the same ``align_flat`` lineage fill as
        ``read_table`` (defaults / renames / widenings), so a looked-up
        row is byte-identical to the same row in a full scan.
        ``self.last_lookup_stats`` records the pruning
        (``partitions_read`` vs ``partitions_total``) for tests and
        ops telemetry."""
        from logminer_kafka_connect_ray.functions.hashing import partition_ids

        m = self._require_manifest(version)
        schema = schemas.schema_from_json(m.schema)
        if with_meta:
            schema = schemas.lake_schema(schema)
        dflt = typed_defaults(schema, m.defaults, self.config.db_timezone)
        fillf = {new: old for old, new in (m.renames or {}).items()}
        want = sorted(set(keys))
        pids = set(
            partition_ids(pa.array(want, pa.string()), m.num_partitions)
            .tolist()
        )
        by_id = {p.part_id: p for p in m.partitions}
        key_set = pa.array(want, pa.string())
        tables = []
        n_read = 0
        for pid in sorted(pids):
            p = by_id.get(pid)
            if p is None or not p.file:
                continue  # empty partition: key cannot exist
            n_read += 1
            t = pq.read_table(f"{self.config.lake_dir}/{p.file}")
            t = t.filter(
                pc.is_in(t.column(self.config.key_column), value_set=key_set)
            )
            if t.num_rows:
                tables.append(align_flat(t, schema, dflt, fillf))
        self.last_lookup_stats = {
            "partitions_read": n_read,
            "partitions_total": sum(1 for p in m.partitions if p.file),
            "keys_probed": len(want),
        }
        if not tables:
            return schema.empty_table()
        t = pa.concat_tables(tables)
        return t.take(
            pc.sort_indices(t, sort_keys=[(self.config.key_column, "ascending")])
        )

    def scan(
        self,
        hosts: list[str] | None = None,
        ts_range: tuple | None = None,
        ts_column: str = "warc_ts",
        columns: list[str] | None = None,
        version: int | None = None,
    ):
        """Predicate scan with PARTITION-STATS data skipping: before a
        single parquet file is opened, each partition's manifest stats
        (stages/merge.py partition_stats_json) are consulted --

        * ``hosts=[...]``: partitions whose host Bloom filter proves
          none of the probe hosts is present are skipped.  The lake is
          url-hash-partitioned, so this prunes hard exactly where it
          matters: a needle host (few pages) lives in few partitions;
          a dense host saturates every filter and the scan honestly
          degrades to a full read (same trade as a Parquet/Delta bloom
          index).
        * ``ts_range=(lo, hi)``: partitions whose ``ts_column`` zonemap
          misses the window are skipped (lo/hi inclusive; either side
          None = unbounded).  Timestamps compare as int64 us.

        Partitions without stats (pre-stats manifests) are always read
        -- pruning is evidence-only, so a Bloom false positive or a
        missing zonemap costs a read, never a row.  Surviving rows are
        then EXACTLY filtered (the stats are a superset test), flow
        through the same ``align_flat`` lineage fill as ``read_table``,
        and come back as a streaming Dataset.  ``last_scan_stats``
        records the pruning telemetry."""
        import json as _json

        import numpy as np
        import ray.data as rd

        from logminer_kafka_connect_ray.stages.merge import bloom_may_contain

        m = self._require_manifest(version)
        schema = schemas.schema_from_json(m.schema)
        if columns:
            out_schema = pa.schema([schema.field(c) for c in columns])
        else:
            out_schema = schema
        dflt = typed_defaults(out_schema, m.defaults, self.config.db_timezone)
        fillf = {new: old for old, new in (m.renames or {}).items()}

        lo = hi = None
        if ts_range is not None:
            def _us(v):
                if v is None:
                    return None
                if isinstance(v, (int, np.integer)):
                    return int(v)
                return pc.cast(
                    pa.scalar(v, pa.timestamp("us")), pa.int64()
                ).as_py()
            lo, hi = _us(ts_range[0]), _us(ts_range[1])

        kept, n_bloom, n_zone = [], 0, 0
        total = 0
        for p in m.partitions:
            if not p.file:
                continue
            total += 1
            st = _json.loads(p.stats) if p.stats else {}
            if hosts is not None and not bloom_may_contain(st, list(hosts)):
                n_bloom += 1
                continue
            mm = st.get("mm", {}).get(ts_column)
            if mm is not None and (
                (lo is not None and mm[1] < lo)
                or (hi is not None and mm[0] > hi)
            ):
                n_zone += 1
                continue
            kept.append(f"{self.config.lake_dir}/{p.file}")
        self.last_scan_stats = {
            "partitions_total": total,
            "partitions_read": len(kept),
            "pruned_by_bloom": n_bloom,
            "pruned_by_zonemap": n_zone,
        }
        if not kept:
            return rd.from_arrow(out_schema.empty_table())

        key = self.config.key_column
        # the exact row filter needs the key (host derivation) and the
        # ts column even when the caller pruned them away
        read_cols = list(columns) if columns else None
        if read_cols is not None:
            for extra in ([key] if hosts is not None else []) + (
                [ts_column] if ts_range is not None else []
            ):
                if extra not in read_cols:
                    read_cols.append(extra)
            for c in list(read_cols):
                if c in fillf and fillf[c] not in read_cols:
                    read_cols.append(fillf[c])

        host_set = pa.array(sorted(set(hosts)), pa.string()) if hosts else None

        def _filter(t: pa.Table, s=out_schema, d=dflt, ff=fillf) -> pa.Table:
            if host_set is not None:
                # keys without '//' have no host component -> can't match
                # (guards list_element against short splits on odd keys)
                t = t.filter(pc.match_substring(t.column(key), "//"))
                if t.num_rows:
                    h = pc.list_element(
                        pc.split_pattern(t.column(key), "/"), 2
                    )
                    t = t.filter(pc.is_in(h, value_set=host_set))
            if ts_range is not None and t.num_rows:
                ts = pc.cast(
                    pc.cast(t.column(ts_column), pa.timestamp("us")),
                    pa.int64(),
                )
                mask = pc.is_valid(ts)
                if lo is not None:
                    mask = pc.and_(mask, pc.greater_equal(ts, lo))
                if hi is not None:
                    mask = pc.and_(mask, pc.less_equal(ts, hi))
                t = t.filter(mask)
            return align_flat(t, s, d, ff)

        ds = rd.read_parquet(kept, columns=read_cols)
        return ds.map_batches(_filter, batch_format="pyarrow")

    # --- materialized-view maintenance -------------------------------
    def _views_path(self, version: int) -> str:
        return os.path.join(self.config.lake_dir, "views", f"v{version:08d}.json")

    def _load_views_state(self, version: int | None) -> dict:
        """Cumulative view state at ``version`` (or the latest sidecar
        at/below it -- bootstrap and pre-view versions write none).
        Shape: {view_name: {group_or_NULLSENTINEL: [rows, chars]}}."""
        import json as _json

        vdir = os.path.join(self.config.lake_dir, "views")
        if version is None or not os.path.isdir(vdir):
            return {}
        cands = sorted(
            f for f in os.listdir(vdir)
            if f.startswith("v") and f.endswith(".json")
            and f <= f"v{version:08d}.json"
        )
        if not cands:
            return {}
        with open(os.path.join(vdir, cands[-1])) as f:
            raw = _json.load(f)
        return {
            name: {g: [int(r), int(c)] for g, r, c in rows}
            for name, rows in raw["views"].items()
        }

    def _publish_views(self, prev, lineage_tbl: pa.Table, version: int) -> None:
        """Fold this version's per-partition view deltas (riding the
        lineage rows) into the cumulative state and write the
        ``views/v{version}.json`` sidecar atomically.  Deterministic
        content + temp/rename => idempotent under retries and
        concurrent republish, exactly like partition files."""
        import json as _json

        state = self._load_views_state(prev.version if prev else None)
        for name, _g, _l in self.config.views:
            state.setdefault(name, {})
        if "views_delta" in lineage_tbl.column_names:
            for blob in lineage_tbl.column("views_delta").to_pylist():
                if not blob:
                    continue
                for entry in _json.loads(blob):
                    view = state.setdefault(entry["view"], {})
                    for g, d_rows, d_chars in entry["delta"]:
                        r = view.setdefault(g, [0, 0])
                        r[0] += int(d_rows)
                        r[1] += int(d_chars)
        payload = {
            "version": version,
            "views": {
                name: sorted(
                    [[g, r, c] for g, (r, c) in groups.items() if r or c]
                )
                for name, groups in state.items()
            },
        }
        path = self._views_path(version)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump(payload, f, sort_keys=True)
        os.replace(tmp, path)

    def view(self, name: str, version: int | None = None) -> pa.Table:
        """Materialized-view state as an Arrow table:
        ``(<group_col>, n_rows[, sum_<col>_chars])`` sorted by group
        (nulls last, matching SQL ORDER BY).  Maintained incrementally
        from merge deltas -- reading it never scans the lake."""
        from logminer_kafka_connect_ray.stages.merge import PartitionMerger

        spec = next((v for v in self.config.views if v[0] == name), None)
        if spec is None:
            raise KeyError(f"no view {name!r} configured; views="
                           f"{[v[0] for v in self.config.views]}")
        _, gcol, lcol = spec
        m = self._require_manifest(version)
        state = self._load_views_state(m.version).get(name, {})
        rows = sorted(
            ((None if g == PartitionMerger.NULL_GROUP else g, r, c)
             for g, (r, c) in state.items() if r),
            key=lambda x: (x[0] is None, x[0] or ""),
        )
        cols = {
            gcol: pa.array([x[0] for x in rows], pa.string()),
            "n_rows": pa.array([x[1] for x in rows], pa.int64()),
        }
        if lcol is not None:
            cols[f"sum_{lcol}_chars"] = pa.array(
                [x[2] for x in rows], pa.int64()
            )
        return pa.table(cols)

    def diff(self, v_old: int, v_new: int | None = None):
        """Reconciliation diff between two lake versions: a Dataset of
        ``(key, change)`` rows with change in {'added', 'removed',
        'modified'} (unchanged keys are not emitted).

        Zero-shuffle by construction: the lake's partition assignment
        (hash(key) % P) is stable across versions, so partition i of
        both manifests holds the same key range and diffs pairwise in
        one task.  Copy-on-write pruning: a partition whose FILE path
        is identical in both manifests was not rewritten between the
        versions -- byte-identical, skipped without reading.  At 100 TB
        the cost is proportional to the churn, not the table."""
        import ray.data as rd

        m1 = self._require_manifest(v_old)
        m2 = self._require_manifest(v_new)
        if (
            m1.num_partitions != m2.num_partitions
            or m1.hash_probe != m2.hash_probe
        ):
            raise ValueError(
                "diff requires identical partitioning between versions; "
                "a repartition_lake in between breaks the alignment"
            )
        key = self.config.key_column
        s1 = schemas.schema_from_json(m1.schema)
        s2 = schemas.schema_from_json(m2.schema)
        # compare the columns both versions carry, at unified types
        # (schema evolution only ever adds / widens)
        common = [
            f.name
            for f in s1
            if f.name != key and s2.get_field_index(f.name) != -1
        ]
        cols = [key] + common
        cmp_schema = pa.unify_schemas(
            [
                pa.schema([s.field(c) for c in cols])
                for s in (s1, s2)
            ]
        )
        out_schema = pa.schema([(key, pa.string()), ("change", pa.string())])
        # align by part_id -- a manifest only lists partitions that
        # have ever been written, so the two lists can differ in length
        by_id1 = {p.part_id: p.file for p in m1.partitions}
        by_id2 = {p.part_id: p.file for p in m2.partitions}
        items = []
        for pid in range(m1.num_partitions):
            f1 = by_id1.get(pid) or ""
            f2 = by_id2.get(pid) or ""
            if f1 != f2:
                items.append({"f1": f1, "f2": f2})
        if not items:
            return rd.from_arrow(out_schema.empty_table())
        lake = self.config.lake_dir

        def _load(f: str) -> pa.Table:
            if not f:
                return cmp_schema.empty_table()
            t = pq.read_table(f"{lake}/{f}", columns=cols)
            return pa.table(
                {c: t.column(c).cast(cmp_schema.field(c).type) for c in cols},
                schema=cmp_schema,
            )

        def _col_differs(a: pa.ChunkedArray, b: pa.ChunkedArray) -> pa.Array:
            neq = pc.fill_null(pc.not_equal(a, b), False)
            null_flip = pc.xor(pc.is_valid(a), pc.is_valid(b))
            return pc.or_(neq, null_flip)

        def diff_pair(b: pa.Table) -> pa.Table:
            outs = [out_schema.empty_table()]
            for f1, f2 in zip(
                b.column("f1").to_pylist(), b.column("f2").to_pylist()
            ):
                t1, t2 = _load(f1), _load(f2)
                u1, u2 = t1.column(key), t2.column(key)
                pos = pc.index_in(u1, value_set=u2.combine_chunks())
                removed = u1.filter(pc.is_null(pos))
                added = u2.filter(
                    pc.is_null(pc.index_in(u2, value_set=u1.combine_chunks()))
                )
                hit = pc.is_valid(pos)
                t1m = t1.filter(hit)
                t2m = t2.take(pos.filter(hit))
                if t1m.num_rows:
                    differs = pa.array([False] * t1m.num_rows)
                    for c in common:
                        differs = pc.or_(
                            differs,
                            _col_differs(t1m.column(c), t2m.column(c)),
                        )
                    modified = t1m.column(key).filter(differs)
                else:
                    modified = pa.chunked_array([], pa.string())
                for urls, tag in (
                    (added, "added"),
                    (removed, "removed"),
                    (modified, "modified"),
                ):
                    if len(urls):
                        outs.append(
                            pa.table(
                                {
                                    key: pc.cast(urls, pa.string()),
                                    "change": pa.array(
                                        [tag] * len(urls), pa.string()
                                    ),
                                },
                                schema=out_schema,
                            )
                        )
            return pa.concat_tables(outs)

        ds = rd.from_items(items, override_num_blocks=len(items))
        return ds.map_batches(
            diff_pair, batch_format="pyarrow", batch_size=None
        )

    def repartition_lake(self, new_num_partitions: int) -> Manifest:
        """Re-hash the lake into a different partition count (grow P as
        the table grows so partitions stay ~1 GiB).  Full copy-on-write
        rewrite: current rows re-enter the standard merge path as
        pseudo-events at their recorded ``(_commit_scn, _scn)``, so the
        result is byte-identical state under the new layout.  The
        engine's config switches to the new partition count."""
        from dataclasses import replace as dc_replace

        import ray.data as rd

        from logminer_kafka_connect_ray.stages.fold import base_as_pseudo_events
        from logminer_kafka_connect_ray.stages.merge import PreaggPartitioner

        m = self._require_manifest()
        if m.open_txn_spill:
            raise RuntimeError(
                "repartition with open-txn carryover pending; replay the "
                "committing changelog (or drain) first"
            )
        schema = schemas.schema_from_json(m.schema)
        ds = self.read_table(with_meta=True)
        data_cols = schemas.data_columns_of(schema, self.config.key_column)

        def to_flat(t: pa.Table, s=schema, key=self.config.key_column):
            return base_as_pseudo_events(t, s, key)

        self.config = dc_replace(self.config, num_partitions=new_num_partitions)
        flat = ds.map_batches(to_flat, batch_format="pyarrow").map_batches(
            PreaggPartitioner(
                self.config.key_column, len(data_cols), new_num_partitions
            ),
            batch_format="pyarrow",
        )
        return self._merge_and_publish(
            flat,
            version=m.version + 1,
            phase="repartition",
            table_schema=schema,
            schema_version=m.schema_version,
            scn_lo=m.watermark_scn - 1,
            scn_hi=m.watermark_scn,
            prev=None,
            open_spill=None,
            pre_partitioned=True,
            # prev=None (full rewrite) -- carry the DDL metadata forward
            # explicitly; the rewrite also materializes it physically
            defaults=dict(m.defaults),
            renames=dict(m.renames),
            dropped=list(m.dropped),
        )

    def erase(self, keys: list[str]) -> Manifest:
        """GDPR right-to-erasure: delete the given keys from the lake
        as ONE committed copy-on-write version.

        Each key becomes a delete pseudo-event stamped at
        ``last_commit_scn + 1`` (strictly after every applied change,
        so the LWW fold removes the key regardless of its history);
        the events flow through the standard partition exchange, so
        ONLY partitions holding a target key are rewritten -- the
        untouched partitions carry their existing files forward in the
        new manifest, and a later ``vacuum`` drops the pre-erasure
        files, completing the physical forget.  Erasing an absent key
        is a no-op (the delete folds against an empty group).  The CDC
        watermark does not move: pending changelog files stay pending,
        and a post-erasure event for the same key legitimately
        re-creates it (new data after a forget is new data).

        The reference has no sink-side analog (its sink is Kafka,
        where erasure is the compacted-topic tombstone,
        ConnectSchemaFactory.kt:56-163 tombstone emission); this is
        the lake-side completion of that contract."""
        import ray.data as rd

        m = self._require_manifest()
        if m.open_txn_spill:
            raise RuntimeError(
                "erase with open-txn carryover pending; replay the "
                "committing changelog (or drain) first"
            )
        schema = schemas.schema_from_json(m.schema)
        data_cols = schemas.data_columns_of(schema, self.config.key_column)
        n = len(keys)
        scn = m.last_commit_scn + 1
        cols = {
            self.config.key_column: pa.array(
                [str(k) for k in keys], pa.string()
            ),
            "commit_scn": pa.array([scn] * n, pa.int64()),
            "scn": pa.array([scn] * n, pa.int64()),
            "row_id": pa.array([""] * n, pa.string()),
            "op": pa.array(["d"] * n, pa.string()),
            "set_mask": pa.array([0] * n, pa.int64()),
        }
        for c in data_cols:
            ftype = schema.field(c).type
            cols[f"a_{c}"] = pa.nulls(n, ftype)
            cols[f"b_{c}"] = pa.nulls(n, ftype)
        flat = rd.from_arrow(pa.table(cols))
        return self._merge_and_publish(
            flat,
            version=m.version + 1,
            phase="erase",
            table_schema=schema,
            schema_version=m.schema_version,
            scn_lo=m.watermark_scn - 1,
            scn_hi=m.watermark_scn,
            prev=m,
            open_spill=None,
        )

    def vacuum(self, keep_versions: int = 2) -> dict:
        """Remove partition files and spills referenced only by
        manifests older than the newest ``keep_versions`` (copy-on-write
        housekeeping).  Time-travel reads (``read_table(version=...)``)
        keep working for retained versions."""
        import os

        latest = self.store.latest_version()
        if latest is None:
            return {"removed_files": 0, "removed_manifests": 0}
        keep = {
            v
            for v in range(max(1, latest - keep_versions + 1), latest + 1)
            if self.store.exists(v)
        }
        live: set[str] = set()
        for v in keep:
            m = self.store.load(v)
            live |= {p.file for p in m.partitions if p.file}
            if m.open_txn_spill:
                live.add(m.open_txn_spill)

        removed_files = 0
        parts_dir = os.path.join(self.config.lake_dir, "parts")
        if os.path.isdir(parts_dir):
            for f in os.listdir(parts_dir):
                rel = f"parts/{f}"
                if rel not in live and f.endswith(".parquet"):
                    os.remove(os.path.join(parts_dir, f))
                    removed_files += 1
        state_dir = os.path.join(self.config.lake_dir, "state")
        if os.path.isdir(state_dir):
            for d in os.listdir(state_dir):
                rel = f"state/{d}"
                if d.startswith("open-v") and rel not in live:
                    import shutil

                    shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)
                    removed_files += 1
        removed_manifests = 0
        for v in range(1, latest + 1):
            if v not in keep and self.store.exists(v):
                os.remove(self.store._path(v))
                removed_manifests += 1
        return {"removed_files": removed_files, "removed_manifests": removed_manifests}

    # ------------------------------------------------------------------
    # Internals
    # ------------------------------------------------------------------
    def _require_manifest(self, version: int | None = None) -> Manifest:
        m = self.store.load(version)
        if m is None:
            raise RuntimeError("lake has no committed manifest")
        probe = hash_probe(self.config.num_partitions)
        if m.hash_probe and m.hash_probe != probe:
            raise RuntimeError(
                "partition hash drift: lake was laid out with a different "
                "hash function; refusing to mis-partition"
            )
        return m

    def _auto_batch_size(self, sample_path: str, total_rows: int | None = None) -> int:
        """Rows per batch targeting ``target_batch_bytes`` of
        uncompressed data (parquet row-group stats of a sample file),
        additionally capped so the fused decode stage gets >= ~1 task
        per CPU.  Both extremes measured slow on the 6M-event replay
        (32 cpus, interleaved pairs): a byte-only target gave ~15
        tasks (under-parallelized, 8.4-10.2 s), while 3 tasks/cpu gave
        96 tasks whose per-task fixed cost dominated (6.9-8.0 s);
        ~30 tasks (1 wave) ran 4.1-5.7 s with t_merge 3.1-3.9 s."""
        try:
            md = pq.ParquetFile(sample_path).metadata
            rows = md.num_rows or 1
            raw = sum(
                md.row_group(i).total_byte_size for i in range(md.num_row_groups)
            )
            row_bytes = max(16, raw // rows)
        except Exception:
            row_bytes = 1024
        n = self.config.target_batch_bytes // row_bytes
        if total_rows:
            cpus = 8
            try:
                import ray

                if ray.is_initialized():
                    cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                pass
            n = min(n, total_rows // cpus or n)
        return int(min(524_288, max(16_384, n)))

    def _initial_schema(self, base_parquet: str | list[str]) -> pa.Schema:
        paths = [base_parquet] if isinstance(base_parquet, str) else list(base_parquet)
        import os

        p0 = paths[0]
        if os.path.isdir(p0):
            p0 = next(
                os.path.join(p0, f) for f in sorted(os.listdir(p0)) if f.endswith(".parquet")
            )
        file_schema = pq.ParquetFile(p0).schema_arrow
        cols = [self.config.key_column, *self.config.data_columns]
        fields = [file_schema.field(c) for c in cols if c in file_schema.names]
        return pa.schema(fields)

    def _apply_cdc_batch(
        self,
        prev: Manifest,
        bfiles: list[changelog_src.BatchFile],
        scn_lo: int,
        scn_hi: int,
    ) -> Manifest:
        import ray.data as rd

        version = prev.version + 1
        if self.store.exists(version):
            existing = self.store.load(version)
            log.info("micro-batch v%d already committed; skipping", version)
            return existing

        cfg = self.config
        paths = [f.path for f in bfiles]
        t_meta0 = time.monotonic()

        # --- txn metadata scan: LAUNCH FIRST, BARRIER BEFORE EXEC ----
        # (SURVEY.md T1 batch path: markers are tiny vs change rows)
        # The scan tree is launched async here so it overlaps the
        # driver's plan work (schema discovery footer reads, batch
        # sizing, pipeline build), then the driver WAITS on the ref
        # right before triggering execution.  Measured 5-pair
        # interleaved A/B vs letting the fused decode+resolve tasks
        # ray.get() the ref mid-task: in-task blocking stalls the
        # executor's slots behind the scan -- t_merge inflated 78.2s
        # -> 46.7s total across pairs (the barrier variant won every
        # pair).  LKC_PRESCAN=0 restores the in-task-blocking variant
        # for A/B.
        info, markers_ref = collect_txn_info_ref(
            paths, scn_lo, scn_hi, block=False,
        )

        # --- schema evolution detection (plan time) -------------------
        cur_schema = schemas.schema_from_json(prev.schema)
        img_fields = discover_image_fields(paths)
        if cfg.changelog_format == "redo_sql":
            # redo statements carry no type info; the _catalog.json
            # dictionary sidecar is the schema-refresh source
            # (stages/evolve.py catalog_fields)
            img_fields = img_fields + catalog_fields(paths)
        table_schema, changed = unify_with(cur_schema, img_fields)
        # DDL rename policy (catalog_renames doc): add-new+keep-old
        # with lineage fill; drops are ignored-but-accounted
        batch_renames = dict(prev.renames or {})
        batch_renames.update(catalog_renames(paths))
        batch_dropped = list(prev.dropped or [])
        for c in catalog_dropped(paths):
            if c not in batch_dropped:
                batch_dropped.append(c)
        table_schema, ren_changed = apply_renames(table_schema, batch_renames)
        schema_version = prev.schema_version + (
            1 if (changed or ren_changed) else 0
        )
        schema_json = schemas.schema_to_json(table_schema)
        flat_schema = schemas.flat_change_schema(cfg.key_column, table_schema)
        # DDL default discovery (ColumnSchemaBuilder.kt:91-107): a
        # column added WITH a default backfills pre-existing rows; raw
        # literals persist in the manifest, typed at use sites
        batch_defaults = dict(prev.defaults or {})
        batch_defaults.update(catalog_defaults(paths))

        batch_size = cfg.batch_size or self._auto_batch_size(
            paths[0], total_rows=sum(f.num_rows for f in bfiles)
        )
        if cfg.changelog_format == "redo_sql" and cfg.batch_size is None:
            # the redo source is from_items(paths) -> one-ROW path
            # records expanded to file-sized blocks by read_reassembled;
            # a row-count batch_size here makes the fused
            # read->decode->resolve operator bundle ALL path rows into
            # ONE task (measured: 60 files decoded serially, 29.8 s of
            # a 31 s replay in a single task).  batch_size=None keeps
            # one task per file: per-file read+decode+resolve,
            # parallel across the pool.
            batch_size = None

        #: still-open rows side-write here from the committed pass
        #: (single decode per micro-batch, round-2 verdict #8).  A
        #: re-run of this uncommitted version (crash before publish)
        #: starts from a clean spill dir so attempts don't accumulate.
        open_rel = f"state/open-v{version:08d}"
        open_dir = f"{cfg.lake_dir}/{open_rel}"
        import shutil

        shutil.rmtree(open_dir, ignore_errors=True)

        def source() -> "rd.Dataset":
            # one fused operator for the whole per-event CPU path:
            # decode + resume-skip SCN filter (LogminerFetcher.kt:74-101)
            # + commit resolve + combiner, with still-open rows
            # side-written to the carryover spill in the SAME pass.
            # Stateless tasks with a per-worker-process cache
            # (see stages/process.py).
            src_paths = paths
            # prune at the read: only the columns the decoder consumes
            wanted = {
                "scn", "row_id", "commit_scn", "tx_id", "op", "ts_ms",
                "table", "status", "before", "after", "set_cols", "csf",
                "sql_redo",
            }
            avail = pq.ParquetFile(src_paths[0]).schema_arrow.names
            cols = [c for c in avail if c in wanted]
            if cfg.changelog_format == "redo_sql" and "csf" in cols:
                # CSF runs are contiguous within one log file but a
                # row-sliced map_batches batch can cut a run in half,
                # orphaning both fragments (reference reassembles over
                # the continuous cursor BEFORE batching,
                # LogminerFetcher.kt:144-153).  Reassemble per file in
                # the read task; downstream batch slicing then only
                # sees whole statements.  Assumes one redo log file
                # fits a read task's heap -- true for archive-log-sized
                # files, same bound the reference's cursor has.
                from logminer_kafka_connect_ray.functions.redo_sql import (
                    reassemble_csf,
                )

                read_cols = list(cols)

                def read_reassembled(b: pa.Table) -> pa.Table:
                    out = []
                    for p in b.column("path").to_pylist():
                        out.append(
                            reassemble_csf(pq.read_table(p, columns=read_cols))
                        )
                    return pa.concat_tables(out)

                ds = rd.from_items([{"path": p} for p in src_paths]).map_batches(
                    read_reassembled, batch_size=1, batch_format="pyarrow"
                )
            else:
                ds = rd.read_parquet(src_paths, columns=cols)
            dead_dir = f"{cfg.lake_dir}/dead_letters" if cfg.dead_letter else None
            if os.environ.get("LKC_FUSED_RESOLVE", "0") == "1":
                # single fused operator (previous default): no
                # inter-stage hop, but every worker's first batch
                # blocks on the broadcast TxnInfo ref -- decode waits
                # behind the whole marker-scan tree
                proc = ds.map_batches(
                    make_processor_fn(
                        markers_ref, schema_json, cfg.key_column,
                        cfg.table_whitelist, scn_lo, scn_hi,
                        cfg.num_partitions, "committed",
                        changelog_format=cfg.changelog_format,
                        db_timezone=cfg.db_timezone,
                        dead_dir=dead_dir,
                        version=version,
                        transform=cfg.transform,
                        open_dir=open_dir,
                    ),
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    zero_copy_batch=True,
                )
            else:
                # two pipelined stages: decode has NO marker
                # dependency, so it streams concurrently with the
                # marker-scan task tree; resolve blocks on the
                # broadcast ref only when its first decoded block
                # lands, by which point the overlapped scan is done.
                # Costs one plasma hop of the decoded rows -- measured
                # cheaper than serializing 32 workers behind the scan.
                decoded = ds.map_batches(
                    make_processor_fn(
                        None, schema_json, cfg.key_column,
                        cfg.table_whitelist, scn_lo, scn_hi,
                        cfg.num_partitions, "committed",
                        changelog_format=cfg.changelog_format,
                        db_timezone=cfg.db_timezone,
                        dead_dir=dead_dir,
                        version=version,
                        transform=cfg.transform,
                        stage="decode",
                    ),
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    zero_copy_batch=True,
                )
                proc = decoded.map_batches(
                    make_processor_fn(
                        markers_ref, schema_json, cfg.key_column,
                        cfg.table_whitelist, scn_lo, scn_hi,
                        cfg.num_partitions, "committed",
                        version=version,
                        open_dir=open_dir,
                        stage="resolve",
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                    zero_copy_batch=True,
                )
            if prev.open_txn_spill:
                carry = rd.read_parquet(
                    f"{cfg.lake_dir}/{prev.open_txn_spill}"
                ).map_batches(
                    make_processor_fn(
                        markers_ref, schema_json, cfg.key_column,
                        cfg.table_whitelist, scn_lo, scn_hi,
                        cfg.num_partitions, "committed", carryover=True,
                        open_dir=open_dir,
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                proc = proc.union(carry)
            return proc

        committed = source()
        # prescan barrier: the scan has been overlapping all the plan
        # work above; make sure it is RESOLVED before the streaming
        # executor starts, so no fused decode+resolve task ever blocks
        # on the ref while holding an executor slot (see the A/B note
        # at the collect_txn_info_ref call)
        if (
            markers_ref is not None
            and not hasattr(markers_ref, "n_open_rows")  # plain info w/o Ray
            and os.environ.get("LKC_PRESCAN", "1") == "1"
        ):
            _ray().get(markers_ref)
        self._t_meta = time.monotonic() - t_meta0
        self._info_ref = markers_ref
        manifest = self._merge_and_publish(
            committed,
            version=version,
            phase="cdc",
            table_schema=table_schema,
            schema_version=schema_version,
            scn_lo=scn_lo,
            scn_hi=scn_hi,
            prev=prev,
            open_spill=(markers_ref, open_rel),
            pre_partitioned=True,
            defaults=batch_defaults,
            renames=batch_renames,
            dropped=batch_dropped,
        )
        return manifest

    def read_dead_letters(self, version: int | None = None):
        """Rejected rows as a Dataset (scn, row_id, tx_id, table,
        sql_redo, reason), deduplicated on (scn, row_id) -- a retried
        micro-batch may have written the same rejects twice.  Pass
        ``version`` to restrict to one micro-batch's files."""
        import ray.data as rd

        d = f"{self.config.lake_dir}/dead_letters"
        prefix = f"v{version:08d}-" if version is not None else None
        paths = (
            [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
                and (prefix is None or f.startswith(prefix))
            ]
            if os.path.isdir(d)
            else []
        )
        if not paths:
            empty = pa.schema(
                [("scn", pa.int64()), ("row_id", pa.string()),
                 ("tx_id", pa.string()), ("table", pa.string()),
                 ("sql_redo", pa.string()), ("reason", pa.string())]
            ).empty_table()
            return rd.from_arrow(empty)
        ds = rd.read_parquet(paths)

        def first_per_key(t: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                t, sort_keys=[("scn", "ascending"), ("row_id", "ascending")]
            )
            t = t.take(idx)
            import numpy as np

            n = t.num_rows
            if n <= 1:
                return t
            s = t.column("scn").combine_chunks()
            r = t.column("row_id").combine_chunks()
            same = pc.and_(
                pc.equal(s.slice(1), s.slice(0, n - 1)),
                pc.equal(r.slice(1), r.slice(0, n - 1)),
            )
            keep = np.ones(n, bool)
            keep[1:] = ~pc.fill_null(same, False).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(keep))

        # block-local first (combiner), then a small hash exchange on
        # (scn, row_id) so the same key can only land in one block, and
        # the identical vectorized first-per-key sweep again per block
        # (the same duplicate pair can arrive from two source files) --
        # no per-group pandas dispatch anywhere
        from logminer_kafka_connect_ray.functions.hashing import partition_ids

        n_parts = max(1, min(16, len(paths)))

        def stamp(t: pa.Table) -> pa.Table:
            key = pc.binary_join_element_wise(
                pc.cast(t.column("scn"), pa.string()),
                pc.fill_null(pc.cast(t.column("row_id"), pa.string()), ""),
                "\x1f",
            )
            return t.append_column(
                "_p", pa.array(partition_ids(key, n_parts))
            )

        return (
            ds.map_batches(first_per_key, batch_format="pyarrow")
            .map_batches(stamp, batch_format="pyarrow")
            .sort("_p", boundaries=list(range(1, n_parts)))
            .map_batches(
                lambda t: first_per_key(t.drop_columns(["_p"])),
                batch_format="pyarrow",
            )
        )

    def repair(
        self,
        changelog_dir: str,
        corrections: pa.Table,
        base_version: int = 1,
    ) -> Manifest:
        """Dead-letter repair as COMPENSATING WRITES (the pt-table-sync
        shape): re-fold each affected key's FULL history -- its base
        row at a retained pre-correction version + every decodable
        original event + the supplied corrections -- and write the
        key's true final value as one full-image repair event at
        ``last_commit_scn + 1`` through the standard merge.

        Why not simply merge the corrected events at their original
        coordinates?  The lake is a LOSSY fold: a base row is a full
        image stamped at its last-applied ``(commit_scn, scn)``, so an
        OLDER corrected event (e.g. a dead-lettered INSERT under later
        partial updates) would be dominated and its never-again-set
        columns stay null.  A late event fundamentally requires
        re-folding its key's history (the same reason a compacted
        Kafka topic cannot take out-of-order keys); doing so per
        affected key keeps the rebuild at O(one changelog scan +
        affected-key events), independent of lake size.

        ``corrections`` is a flat RESOLVED event table -- the repair
        tooling consulted the source of truth (reference analog: the
        connector re-selects rows it could not parse): ``(key,
        commit_scn, scn, row_id, op, set_mask, a_*/b_*)``; rolled-back
        txns must be excluded by the fixer (they never committed).
        ``base_version`` names a retained version whose watermark
        predates every correction (default: the snapshot) -- repair
        needs base + log, the same retention contract as
        point-in-time recovery.

        The compensating version moves NO watermark: pending changelog
        files stay pending, and genuinely newer changes replayed later
        still win (they carry higher commit SCNs).  Keys whose
        re-folded history ends deleted (or never existed) get a
        compensating delete -- a no-op if already absent."""
        import ray.data as rd

        cfg = self.config
        m = self._require_manifest()
        if self.store.load(base_version) is None:
            raise RuntimeError(
                f"repair base version {base_version} is not retained "
                "(vacuumed?); repair needs base + changelog, like PITR"
            )
        schema = schemas.schema_from_json(m.schema)
        flat_schema = schemas.flat_change_schema(cfg.key_column, schema)
        data_cols = schemas.data_columns_of(schema, cfg.key_column)
        full_mask = (1 << len(data_cols)) - 1
        keys = sorted(
            set(pc.drop_null(corrections.column(cfg.key_column)).to_pylist())
        )
        self.last_repair_stats = {
            "keys_targeted": len(keys), "keys_alive": 0, "keys_deleted": 0,
        }
        if not keys:
            return m
        key_set = pa.array(keys, pa.string())
        key_col = cfg.key_column

        # (1) decode+resolve the ORIGINAL changelog up to the current
        # watermark with the same fused processor replay uses (whole
        # log: late events need history from the beginning), keeping
        # only the affected keys' rows
        files = changelog_src.list_batch_files(changelog_dir)
        paths = [f.path for f in files]
        schema_json = schemas.schema_to_json(schema)
        _info, markers_ref = collect_txn_info_ref(paths, None, m.watermark_scn)
        decoded = rd.read_parquet(paths).map_batches(
            make_processor_fn(
                markers_ref, schema_json, key_col, cfg.table_whitelist,
                None, m.watermark_scn, cfg.num_partitions, "committed",
                changelog_format=cfg.changelog_format,
                db_timezone=cfg.db_timezone,
                transform=cfg.transform,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def only_keys(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column(key_col), value_set=key_set))

        history = decoded.map_batches(only_keys, batch_format="pyarrow")

        # (2) base rows of the affected keys at the retained
        # pre-correction version (hash-pruned point read), as 'r'
        # pseudo-events at their recorded coordinates
        from logminer_kafka_connect_ray.stages.fold import (
            base_as_pseudo_events,
            fold_final,
        )

        dflt = typed_defaults(schema, m.defaults, cfg.db_timezone)
        fillf = {new: old for old, new in (m.renames or {}).items()}
        base_rows = self.lookup(keys, version=base_version, with_meta=True)
        pieces = [history]
        if base_rows.num_rows:
            base_flat = base_as_pseudo_events(
                base_rows, schema, key_col, defaults=dflt, fill_from=fillf
            )
            pieces.append(rd.from_arrow(align_flat(base_flat, flat_schema)))
        # (3) the corrections themselves (schema-aligned)
        pieces.append(rd.from_arrow(align_flat(corrections, flat_schema)))
        stamp = PreaggPartitioner(key_col, len(data_cols), cfg.num_partitions)
        merged = history.map_batches(
            lambda t: align_flat(
                t.drop_columns(["_part"]), flat_schema
            ).append_column("_part", t.column("_part")),
            batch_format="pyarrow",
        )
        for p in pieces[1:]:
            merged = merged.union(
                p.map_batches(stamp, batch_format="pyarrow").map_batches(
                    lambda t: align_flat(
                        t.drop_columns(["_part"]), flat_schema
                    ).append_column("_part", t.column("_part")),
                    batch_format="pyarrow",
                )
            )

        # (4) per-key re-fold (one exchange; volume = affected keys'
        # events only) -> compensating full-image events at
        # last_commit_scn + 1
        repair_scn = m.last_commit_scn + 1

        def refold(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return align_flat(
                    flat_schema.empty_table(), flat_schema
                ).append_column("_part", pa.array([], pa.int64()))
            final = fold_final(
                t.drop_columns(["_part"]), schema, key_col
            )
            n = final.num_rows
            cols = {
                key_col: final.column(key_col),
                "commit_scn": pa.array([repair_scn] * n, pa.int64()),
                "scn": pa.array([repair_scn] * n, pa.int64()),
                "row_id": pa.array(["repair"] * n, pa.string()),
                "op": pa.array(["r"] * n, pa.string()),
                "set_mask": pa.array([full_mask] * n, pa.int64()),
            }
            for c in data_cols:
                cols[f"a_{c}"] = final.column(c)
                cols[f"b_{c}"] = pa.nulls(n, schema.field(c).type)
            out = align_flat(pa.table(cols), flat_schema)
            from logminer_kafka_connect_ray.functions.hashing import (
                partition_ids,
            )

            return out.append_column(
                "_part",
                pa.array(partition_ids(out.column(key_col),
                                       cfg.num_partitions)),
            )

        # materialize: the compensating rows are consumed twice (alive-
        # key sweep + merge) and must not re-run the changelog scan;
        # blocks stay in the object store, only KEYS reach the driver
        comp = (
            merged.sort("_part", boundaries=list(range(1, cfg.num_partitions)))
            .map_batches(refold, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        alive: set = set()
        n_comp = 0
        for ref in comp.select_columns([key_col]).to_arrow_refs():
            kt = _ray().get(ref)
            if kt.num_rows == 0 or key_col not in kt.column_names:
                continue  # schemaless empty exchange block
            n_comp += kt.num_rows
            alive.update(kt.column(key_col).to_pylist())
        if n_comp != len(alive):
            # the _part exchange split a partition across blocks and a
            # key folded twice -- refuse to publish partial folds
            raise RuntimeError(
                "repair refold fragmented a partition across blocks "
                f"({n_comp} rows for {len(alive)} keys); raise "
                "DataContext.target_max_block_size"
            )
        # keys whose re-folded history is EMPTY (true-deleted or never
        # existed): compensating delete (no-op when already absent)
        gone = [k for k in keys if k not in alive]
        repair_ds = comp
        if gone:
            ng = len(gone)
            dcols = {
                key_col: pa.array(gone, pa.string()),
                "commit_scn": pa.array([repair_scn] * ng, pa.int64()),
                "scn": pa.array([repair_scn] * ng, pa.int64()),
                "row_id": pa.array(["repair"] * ng, pa.string()),
                "op": pa.array(["d"] * ng, pa.string()),
                "set_mask": pa.array([0] * ng, pa.int64()),
            }
            for c in data_cols:
                dcols[f"a_{c}"] = pa.nulls(ng, schema.field(c).type)
            from logminer_kafka_connect_ray.functions.hashing import (
                partition_ids,
            )

            dt = align_flat(pa.table(dcols), flat_schema)
            dt = dt.append_column(
                "_part",
                pa.array(partition_ids(dt.column(key_col),
                                       cfg.num_partitions)),
            )
            repair_ds = comp.union(rd.from_arrow(dt))
        self.last_repair_stats = {
            "keys_targeted": len(keys),
            "keys_alive": len(alive),
            "keys_deleted": len(gone),
        }
        return self._merge_and_publish(
            repair_ds,
            version=m.version + 1,
            phase="repair",
            table_schema=schema,
            schema_version=m.schema_version,
            scn_lo=m.watermark_scn - 1,
            scn_hi=m.watermark_scn,
            prev=m,
            open_spill=None,
            pre_partitioned=True,
        )

    def _count_dead_letters(self, version: int) -> int:
        """Rows routed to lake/dead_letters/ by this version's decode
        pass (file names carry the version prefix).  Counted through
        the deduplicating reader so a retried task's rewritten file
        can't overcount; routing itself is SCN-window-filtered, so each
        reject belongs to exactly one version.  Zero cost in the common
        (no rejects) case."""
        d = f"{self.config.lake_dir}/dead_letters"
        if not os.path.isdir(d):
            return 0
        prefix = f"v{version:08d}-"
        if not any(
            f.startswith(prefix) and f.endswith(".parquet") for f in os.listdir(d)
        ):
            return 0
        return self.read_dead_letters(version).count()

    def _merge_and_publish(
        self,
        flat_committed,
        version: int,
        phase: str,
        table_schema: pa.Schema,
        schema_version: int,
        scn_lo: int,
        scn_hi: int,
        prev: Manifest | None,
        open_spill,
        markers_stats: tuple[int, int, int] = (0, 0, 0),
        pre_partitioned: bool = False,
        defaults: dict[str, str] | None = None,
        renames: dict[str, str] | None = None,
        dropped: list[str] | None = None,
    ) -> Manifest:
        import ray.data as rd

        cfg = self.config
        t0 = time.monotonic()
        schema_json = schemas.schema_to_json(table_schema)
        data_cols = schemas.data_columns_of(table_schema, cfg.key_column)
        part_files = (
            {p.part_id: p.file for p in prev.partitions} if prev else {}
        )
        # DDL defaults/renames/drops carry forward version-to-version
        # unless the caller discovered new ones this batch
        if defaults is None:
            defaults = dict(prev.defaults) if prev else {}
        if renames is None:
            renames = dict(prev.renames) if prev else {}
        if dropped is None:
            dropped = list(prev.dropped) if prev else []

        if pre_partitioned:
            pre = flat_committed  # fused stage already combined+stamped
        else:
            pre = flat_committed.map_batches(
                PreaggPartitioner(cfg.key_column, len(data_cols), cfg.num_partitions),
                batch_format="pyarrow",
            )

        # --- sub-batch resume (state/checkpoint.py PartialLedger) -----
        # partitions a previous crashed attempt of THIS version already
        # merged are excluded from the exchange entirely; their lineage
        # rows are spliced back in below.  Zero-cost when the ledger is
        # empty (the common case): no filter stage is added.
        from logminer_kafka_connect_ray.state.checkpoint import PartialLedger

        ledger = PartialLedger(cfg.lake_dir, version)
        done_rows = ledger.load() if cfg.subbatch_checkpoint else []
        if done_rows:
            done_set = pa.array(sorted(r["part_id"] for r in done_rows))

            def _skip_done(t: pa.Table, _d=done_set) -> pa.Table:
                col = t.column("_part")
                return t.filter(
                    pc.invert(pc.is_in(col, value_set=pc.cast(_d, col.type)))
                )

            pre = pre.map_batches(_skip_done, batch_format="pyarrow")
            log.info(
                "v%d resume: %d partitions already merged by a prior "
                "attempt; skipping them", version, len(done_rows),
            )
        merger = PartitionMerger(
            cfg.lake_dir, part_files, schema_json, cfg.key_column, version,
            views=cfg.views, defaults_raw=defaults,
            db_timezone=cfg.db_timezone, renames=renames,
            ledger_dir=ledger.dir if cfg.subbatch_checkpoint else None,
            fault_parts=tuple(cfg.extra.get("fault_merge_parts", ())),
        )
        def merge_partition(group, _m=merger):
            return _m(group)

        t_merge0 = time.monotonic()
        if cfg.salt_factor > 1:
            # salted two-level fold (north rule): spread each lake
            # partition's events over salt_factor sub-shards, fold each
            # sub-shard with the dominance combiner, THEN exchange by
            # partition.  Costs one extra exchange; use when a single
            # partition's event volume can exceed a worker's block.
            from logminer_kafka_connect_ray.stages.merge import (
                SaltedCombiner,
                SaltStamper,
            )

            pre = pre.map_batches(
                SaltStamper(cfg.key_column, cfg.num_partitions, cfg.salt_factor),
                batch_format="pyarrow",
            )
            pre = pre.sort(
                "_salt",
                boundaries=list(range(1, cfg.num_partitions * cfg.salt_factor)),
            )
            pre = pre.map_batches(
                SaltedCombiner(cfg.key_column, len(data_cols)),
                batch_format="pyarrow",
                batch_size=None,
            )
        # the one wide exchange: range-partition on the precomputed
        # _part key with EXPLICIT boundaries (one lake partition per
        # output block -- no sampling pass, no per-group dispatch)
        exchanged = pre.sort("_part", boundaries=list(range(1, cfg.num_partitions)))
        lineage = exchanged.map_batches(
            merge_partition, batch_format="pyarrow", batch_size=None
        )
        lineage_tbl = pa.Table.from_pandas(lineage.to_pandas())
        if done_rows:
            # splice the prior attempt's completed partitions back in
            from logminer_kafka_connect_ray.stages.merge import LINEAGE_SCHEMA

            done_tbl = pa.Table.from_pylist(done_rows, schema=LINEAGE_SCHEMA)
            if lineage_tbl.num_rows and "part_id" in lineage_tbl.column_names:
                lineage_tbl = pa.concat_tables(
                    [lineage_tbl.cast(LINEAGE_SCHEMA), done_tbl]
                )
            else:
                lineage_tbl = done_tbl
        if lineage_tbl.num_rows == 0 or "part_id" not in lineage_tbl.column_names:
            # a micro-batch can legitimately contain ZERO committed
            # rows (e.g. only open-txn rows before their COMMIT
            # arrives): the empty pipeline loses its schema -- publish
            # a no-rewrite manifest instead of crashing
            from logminer_kafka_connect_ray.stages.merge import LINEAGE_SCHEMA

            lineage_tbl = LINEAGE_SCHEMA.empty_table()
        try:
            #: per-stage Ray Data stats of the last committed pipeline
            #: (read -> process -> exchange -> merge); surfaced by
            #: ``BENCH_STATS=1 python bench.py`` for stats-driven tuning
            self.last_stats = lineage.stats()
        except Exception:
            self.last_stats = None
        t_merge = time.monotonic() - t_merge0
        pids = lineage_tbl.column("part_id").to_pylist()
        if len(pids) != len(set(pids)):
            raise RuntimeError(
                "merge exchange fragmented a lake partition across blocks "
                "(partition larger than target_max_block_size); raise "
                "DataContext.target_max_block_size or num_partitions"
            )

        # --- open-txn carryover spill --------------------------------
        # the committed pass already side-wrote any still-open rows
        # (single decode per micro-batch); fetch the overlapped txn
        # metadata for the manifest stats and take stock of the spill
        open_rel = None
        min_open = None
        n_open = 0
        if open_spill is not None:
            info_ref, open_candidate = open_spill
            info = (
                _ray().get(info_ref)
                if not hasattr(info_ref, "n_open_rows")
                else info_ref
            )
            markers_stats = (info.n_markers, info.n_commit, info.n_rolled)
            self._n_unreadable = info.n_unreadable
            open_dir = f"{cfg.lake_dir}/{open_candidate}"
            stats = []
            for f in os.listdir(open_dir) if os.path.isdir(open_dir) else []:
                if f.endswith(".parquet"):
                    t = pq.read_table(f"{open_dir}/{f}", columns=["scn"])
                    n_open += t.num_rows
                    if t.num_rows:
                        stats.append(pc.min(t.column("scn")).as_py())
            min_open = min(stats) if stats else None
            if n_open:
                open_rel = open_candidate

        # --- materialized-view maintenance ---------------------------
        if cfg.views:
            self._publish_views(prev, lineage_tbl, version)

        # --- assemble manifest ---------------------------------------
        entries = {p.part_id: p for p in (prev.partitions if prev else [])}
        rows_applied = 0
        for r in lineage_tbl.to_pylist():
            entries[r["part_id"]] = PartitionEntry(
                part_id=r["part_id"],
                file=r["file"],
                rows=r["rows"],
                bytes=r["bytes"],
                scn_lo=r["scn_lo"],
                scn_hi=r["scn_hi"],
                version=version,
                schema_version=schema_version,
                stats=r.get("stats", ""),
            )
            rows_applied += r["events_applied"]
        all_parts = [entries[k] for k in sorted(entries)]
        last_commit = max(
            [prev.last_commit_scn if prev else 0]
            + [r["scn_hi"] or 0 for r in lineage_tbl.to_pylist()]
        )
        m = Manifest(
            version=version,
            checkpoint_id=f"ckpt-{version:08d}",
            watermark_scn=scn_hi,
            last_commit_scn=last_commit,
            min_open_scn=min_open,
            phase=phase,
            num_partitions=cfg.num_partitions,
            schema_version=schema_version,
            schema=schema_json,
            partitions=all_parts,
            open_txn_spill=open_rel,
            hash_probe=hash_probe(cfg.num_partitions),
            defaults=defaults,
            renames=renames,
            dropped=dropped,
            metrics={
                "events_applied": int(rows_applied),
                "open_events": int(n_open),
                "markers": markers_stats[0],
                "committed_txns": markers_stats[1],
                "rolled_back_txns": markers_stats[2],
                "partitions_rewritten": lineage_tbl.num_rows,
                "duration_s": round(time.monotonic() - t0, 3),
                "t_plan_s": round(getattr(self, "_t_meta", 0.0), 3),
                "t_merge_s": round(t_merge, 3),
                "skipped_unreadable": int(getattr(self, "_n_unreadable", 0)),
                "dead_letters": self._count_dead_letters(version),
                "partitions_resumed": len(done_rows),
            },
        )
        if not self.store.publish(m):
            log.info("manifest v%d already published by a concurrent run", version)
            ledger.clear()
            return self.store.load(version)
        ledger.clear()
        return m
