"""Copy-on-write LWW merge apply (the sink half of the engine).

The reference has no sink-side materializer -- Kafka + log compaction on
the PK key is what turns its at-least-once, commit-ordered emission
into an LWW table state (SURVEY.md section 0).  This stage implements
that end state directly: events are hash-partitioned by key to the lake
partition that owns them (``partition id = stable_hash(url) % P`` --
the SAME function that laid out the lake, so base rows never move:
"events shuffle, base rows stay put"), and each partition task

1. reads its current partition file (copy-on-write: never mutated),
2. folds base rows + events with ``fold.fold_final``,
3. writes the new partition file ``p{part:05d}-v{version:08d}.parquet``
   atomically (temp + rename; deterministic content, so a retried task
   is harmless),
4. emits a per-partition lineage row (scn range, rows applied, bytes,
   checkpoint id) -- the north rule's per-partition lineage + metrics.

Runs as ``events.groupby("_part").map_groups(merger)`` -- the one wide
shuffle of the pipeline, fed by dominance-pruned (pre-aggregated)
events to keep hot-key volume down.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64, partition_ids
from logminer_kafka_connect_ray.stages import fold

LINEAGE_SCHEMA = pa.schema(
    [
        ("part_id", pa.int64()),
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
        ("scn_lo", pa.int64()),
        ("scn_hi", pa.int64()),
        ("events_applied", pa.int64()),
        ("rows_deleted", pa.int64()),
        # JSON-encoded per-view aggregate deltas for this partition
        # merge (materialized-view maintenance): list of
        # {"view": name, "delta": [[group, d_rows, d_chars], ...]}.
        # "" when the engine has no views configured.
        ("views_delta", pa.string()),
        # JSON-encoded data-skipping stats of the FINAL partition
        # content (see partition_stats_json): host Bloom filter +
        # numeric/timestamp min-max zonemaps.  "" = no stats (pre-stats
        # manifests; scans fall back to reading the partition).
        ("stats", pa.string()),
    ]
)

# --- per-partition data-skipping stats (lakehouse "bloom index") ------
#: Bloom geometry for the per-partition distinct-host filter.  2048
#: bits / k=4 gives FP < 1e-5 at 20 distinct hosts per partition and
#: costs 512 hex chars of manifest per partition (at 1e5 partitions
#: that is ~50 MB of manifest -- acceptable for a 100 TB lake, and the
#: cap below empties the filter long before it saturates).
STATS_BLOOM_BITS = 2048
STATS_BLOOM_K = 4
#: above this many distinct hosts the filter would saturate (prune
#: nothing) -- store no bloom instead of a useless one.
STATS_BLOOM_HOST_CAP = 1024


def _bloom_hashes(hosts) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 hash pairs for Kirsch-Mitzenmacher double
    hashing: h1 = FNV-1a of the host, h2 = an odd avalanche mix of h1.
    Writer and prober MUST share this recipe (same module, no drift)."""
    h1 = fnv1a_u64(hosts)
    with np.errstate(over="ignore"):
        h2 = h1 * np.uint64(0x9E3779B97F4A7C15)
        h2 ^= h2 >> np.uint64(31)
        h2 |= np.uint64(1)
    return h1, h2


def _bloom_positions(hosts) -> np.ndarray:
    """(n, k) bit positions for each host."""
    h1, h2 = _bloom_hashes(hosts)
    j = np.arange(STATS_BLOOM_K, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return (h1[:, None] + j * h2[:, None]) % np.uint64(STATS_BLOOM_BITS)


def hosts_of(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Host component of url-shaped strings (``split_part(url,'/',3)``
    -- the shared host contract of lake_host_stats); rows with fewer
    than 3 '/'-separated parts are dropped (not url-shaped)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    split = pc.split_pattern(urls, "/")
    ok = pc.greater_equal(pc.list_value_length(split), 3)
    return pc.list_element(split.filter(ok), 2)


def partition_stats_json(final: pa.Table, key_column: str) -> str:
    """Data-skipping stats of one FINAL partition file, computed at the
    copy-on-write rewrite (the only moment the whole partition content
    is in hand) and carried in the manifest's lineage entry:

    * ``hb``: hex Bloom filter over the partition's DISTINCT url hosts.
      The lake is hash-partitioned by url, so a dense host (many pages)
      scatters over every partition and the filter prunes nothing --
      but a NEEDLE host (a handful of pages) touches only the
      partitions its few urls hash to, and host-predicate scans skip
      the rest without opening a file.  Same trade as a Parquet/Delta
      bloom index: point predicates on high-cardinality values.
    * ``mm``: min-max zonemap per numeric/timestamp column (timestamps
      as int64 us).  Prunes time-range scans (e.g. "pages crawled
      after T") when a partition's warc_ts range misses the window.

    Strings other than the derived host are skipped (long values would
    bloat the JSON manifest; host + zonemaps cover the scan shapes the
    engine serves).  Returns "" when nothing useful can be computed.
    """
    import json as _json

    out: dict = {}
    if final.num_rows:
        keys = final.column(key_column)
        if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
            hosts = pc.unique(hosts_of(keys))
            if 0 < len(hosts) <= STATS_BLOOM_HOST_CAP:
                pos = _bloom_positions(hosts).ravel()
                bits = np.zeros(STATS_BLOOM_BITS // 8, np.uint8)
                np.bitwise_or.at(
                    bits, (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
                out["hb"] = bits.tobytes().hex()
                out["nh"] = len(hosts)
        mm: dict = {}
        for name in final.column_names:
            if name == key_column:
                continue
            col = final.column(name)
            typ = col.type
            is_ts = pa.types.is_timestamp(typ) or pa.types.is_date(typ)
            if not (pa.types.is_integer(typ) or pa.types.is_floating(typ)
                    or is_ts):
                continue
            r = pc.min_max(col)
            lo, hi = r["min"], r["max"]
            if not lo.is_valid:
                continue  # all-null column
            if is_ts:
                lo = pc.cast(pc.cast(lo, pa.timestamp("us")), pa.int64())
                hi = pc.cast(pc.cast(hi, pa.timestamp("us")), pa.int64())
            mm[name] = [lo.as_py(), hi.as_py()]
        if mm:
            out["mm"] = mm
    return _json.dumps(out, sort_keys=True) if out else ""


def bloom_may_contain(stats: dict, hosts: list[str]) -> bool:
    """Probe a partition's host Bloom: True when ANY probe host may be
    present (or when the partition has no bloom -- never prune without
    evidence; false positives only add reads, never drop rows)."""
    hb = stats.get("hb")
    if not hb:
        return True
    bits = np.frombuffer(bytes.fromhex(hb), np.uint8)
    pos = _bloom_positions(list(hosts))
    byte_i = (pos >> np.uint64(3)).astype(np.int64)
    mask = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    return bool(((bits[byte_i] & mask) != 0).all(axis=1).any())


class PreaggPartitioner:
    """``map_batches`` stage: dominance-prune a block's events and stamp
    the shuffle key ``_part``.  This block-local fold is the combiner /
    salted first level of the two-level merge (north-rule skew
    handling): a hot url's update storm collapses to at most one
    boundary + trailing partial overlays per block before shuffling.
    """

    def __init__(self, key_column: str, n_data_cols: int, num_partitions: int):
        self.key_column = key_column
        self.n_data_cols = n_data_cols
        self.num_partitions = num_partitions

    def __call__(self, t: pa.Table) -> pa.Table:
        # rows with no key (both images null) are undecodable -> drop
        # (reference conversion-failure skip, SourceTask.kt:133-141)
        t = t.filter(pc.is_valid(t.column(self.key_column)))
        t = fold.preagg_block(t, self.key_column, self.n_data_cols)
        parts = partition_ids(t.column(self.key_column), self.num_partitions)
        return t.append_column("_part", pa.array(parts))


class SaltStamper:
    """Stamp the salted sub-shard key ``_salt = _part * S + salt(key)``
    (north-rule "salted repartitioning").  The salt uses independent
    bits of the SAME stable key hash (quotient by P), so one key always
    lands in one sub-shard and the sub-shard fold is final per key."""

    def __init__(self, key_column: str, num_partitions: int, salt_factor: int):
        self.key_column = key_column
        self.num_partitions = num_partitions
        self.salt_factor = salt_factor

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        keys = t.column(self.key_column)
        if not (pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)):
            keys = _pc.cast(keys, pa.string())
        h = fnv1a_u64(keys)
        salt = ((h // np.uint64(self.num_partitions)) % np.uint64(self.salt_factor)).astype(np.int64)
        part = t.column("_part").to_numpy()
        return t.append_column("_salt", pa.array(part * self.salt_factor + salt))


class SaltedCombiner:
    """Fold one whole salted sub-shard (delivered as one block by the
    ``sort('_salt', boundaries=...)`` exchange) with the dominance
    combiner: a hot partition's event volume collapses to
    O(distinct keys x (2 + n_data_cols)) before the final _part
    exchange -- the escape hatch for an event storm on a single lake
    partition larger than one worker's block."""

    def __init__(self, key_column: str, n_data_cols: int):
        self.key_column = key_column
        self.n_data_cols = n_data_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        if "_salt" in t.column_names:
            t = t.drop_columns(["_salt"])
        return fold.preagg_block(t, self.key_column, self.n_data_cols)


class PartitionMerger:
    """``map_groups`` callable: merge one lake partition (see module doc)."""

    def __init__(
        self,
        lake_dir: str,
        part_files: dict[int, str | None],
        table_schema_json: list[dict],
        key_column: str,
        version: int,
        views: tuple[tuple[str, str, str | None], ...] = (),
        defaults_raw: dict[str, str] | None = None,
        db_timezone: str = "UTC",
        renames: dict[str, str] | None = None,
        ledger_dir: str | None = None,
        fault_parts: tuple[int, ...] = (),
    ):
        from logminer_kafka_connect_ray.stages.evolve import typed_defaults

        self.lake_dir = lake_dir
        self.part_files = part_files
        self.table_schema = schemas.schema_from_json(table_schema_json)
        self.key_column = key_column
        self.version = version
        self.views = views
        #: typed DDL defaults: backfill columns missing from old
        #: partition files (added-with-DEFAULT evolution)
        self.defaults = typed_defaults(
            self.table_schema, defaults_raw or {}, db_timezone
        )
        #: rename lineage as fill map (new -> old)
        self.fill_from = {new: old for old, new in (renames or {}).items()}
        #: sub-batch resume: record each completed partition merge here
        #: (state/checkpoint.py PartialLedger); None = disabled
        self.ledger_dir = ledger_dir
        #: crash-test hook: raise instead of merging these partitions
        #: (config.extra["fault_merge_parts"]; exercises the ledger's
        #: partial-completion resume path deterministically)
        self.fault_parts = tuple(fault_parts)

    def _read_base(self, part_id: int) -> pa.Table | None:
        rel = self.part_files.get(part_id)
        if rel is None:
            return None
        return pq.read_table(os.path.join(self.lake_dir, rel))

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Merge every lake partition present in this batch.

        The exchange (``sort('_part', boundaries=[1..P-1])``) delivers
        one whole partition per block; a batch can also carry several
        whole partitions (hash-bucket exchange), but never a fragment
        -- the engine cross-checks lineage for duplicate part ids and
        aborts the batch if a partition ever splits."""
        if batch.num_rows == 0:
            return LINEAGE_SCHEMA.empty_table()
        parts = batch.column("_part").unique().to_pylist()
        out = [self._merge_one(int(p), batch) for p in sorted(parts)]
        return pa.concat_tables(out)

    def _merge_one(self, part_id: int, batch: pa.Table) -> pa.Table:
        if part_id in self.fault_parts:
            # give sibling merge tasks time to complete + ledger their
            # partitions before this task's exception aborts execution
            import time as _time

            _time.sleep(1.0)
            raise RuntimeError(f"injected merge fault on partition {part_id}")
        group = batch.filter(pc.equal(batch.column("_part"), part_id))
        events = group.drop_columns(["_part"])
        base = self._read_base(part_id)

        pieces = [events]
        n_base = 0
        if base is not None and base.num_rows:
            n_base = base.num_rows
            pseudo = fold.base_as_pseudo_events(
                base, self.table_schema, self.key_column,
                defaults=self.defaults, fill_from=self.fill_from,
            )
            pieces.append(pseudo)
        flat = pa.concat_tables(pieces, promote_options="default")
        final = fold.fold_final(flat, self.table_schema, self.key_column)
        # deterministic file content: sort by key
        final = final.take(pc.sort_indices(final, sort_keys=[(self.key_column, "ascending")]))

        rel = f"parts/p{part_id:05d}-v{self.version:08d}.parquet"
        path = os.path.join(self.lake_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(final, tmp)
        os.rename(tmp, path)
        size = os.path.getsize(path)

        scn_col = events.column("scn")
        row = {
            "part_id": part_id,
            "file": rel,
            "rows": final.num_rows,
            "bytes": size,
            "scn_lo": pc.min(scn_col).as_py(),
            "scn_hi": pc.max(scn_col).as_py(),
            "events_applied": events.num_rows,
            "rows_deleted": max(0, n_base + _inserts(events) - final.num_rows),
            "views_delta": self._views_delta_json(events, base, final),
            "stats": partition_stats_json(final, self.key_column),
        }
        if self.ledger_dir is not None:
            # sub-batch resume point: partition file is durable (renamed
            # above), so its lineage row survives a driver crash
            from logminer_kafka_connect_ray.state.checkpoint import (
                write_ledger_entry,
            )

            write_ledger_entry(self.ledger_dir, row)
        return pa.table(
            {k: [v] for k, v in row.items()}, schema=LINEAGE_SCHEMA
        )

    #: JSON stand-in for a NULL group value (views_delta is JSON, and
    #: a null group must stay distinct from the string "null")
    NULL_GROUP = "\x00NULL"

    def _views_delta_json(self, events: pa.Table, base: pa.Table | None,
                          final: pa.Table) -> str:
        """Per-partition materialized-view deltas: for every key the
        events TOUCHED, subtract its old (base) contribution and add
        its new (final) one, per configured view.  Untouched keys
        cancel by construction, so the delta is touched-rows-sized --
        the whole point of incremental maintenance.  Vectorized:
        is_in key probe + np.unique/bincount per side."""
        if not self.views:
            return ""
        import json as _json

        touched = events.column(self.key_column).combine_chunks().unique()
        out = []
        for name, gcol, lcol in self.views:
            acc: dict[str, list[int]] = {}
            for tbl, sign in ((base, -1), (final, 1)):
                if tbl is None or tbl.num_rows == 0 or gcol not in tbl.column_names:
                    continue
                sel = tbl.filter(
                    pc.is_in(tbl.column(self.key_column), value_set=touched)
                )
                if sel.num_rows == 0:
                    continue
                g_arr = np.asarray(
                    [self.NULL_GROUP if g is None else str(g)
                     for g in sel.column(gcol).to_pylist()],
                    dtype=object,
                )
                if lcol is not None and lcol in sel.column_names:
                    lens = pc.fill_null(
                        pc.utf8_length(sel.column(lcol)), 0
                    ).to_numpy(zero_copy_only=False).astype(np.int64)
                else:
                    lens = np.zeros(sel.num_rows, np.int64)
                uniq, inv = np.unique(g_arr, return_inverse=True)
                cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
                chs = np.bincount(
                    inv, weights=lens, minlength=len(uniq)
                ).astype(np.int64)
                for g, c, s in zip(uniq, cnt, chs):
                    r = acc.setdefault(g, [0, 0])
                    r[0] += sign * int(c)
                    r[1] += sign * int(s)
            delta = [
                [g, r[0], r[1]] for g, r in sorted(acc.items())
                if r[0] or r[1]
            ]
            out.append({"view": name, "delta": delta})
        return _json.dumps(out)


def _inserts(events: pa.Table) -> int:
    return pc.sum(
        pc.cast(pc.equal(events.column("op"), "i"), pa.int64())
    ).as_py() or 0
