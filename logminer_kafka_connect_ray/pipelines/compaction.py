"""Changelog compaction: fold a committed change log down to ONE
replay-equivalent event per key.

The reference's output topics are Kafka PK-COMPACTED (SURVEY.md
section 7.0: final state = per-key fold, i.e. exactly what Kafka log
compaction retains), so a bootstrap consumer of the connector reads a
compacted stream, not the full history.  This module gives the engine
the producer side of that contract: ``compact_changelog`` rewrites a
changelog directory into a new directory of batch files containing one
event per key, such that

    snapshot(base) + replay(compacted)  ==  snapshot(base) + replay(full)

byte-for-byte (the ``cdc_changelog_compaction`` SQL gate proves it
against the full-replay oracle).  Uncommitted (still-open) transactions
are CARRIED VERBATIM -- the active tail keeps its original ``tx_id``
rows unresolved, so a transaction whose COMMIT lives in a later
segment loses nothing (the Kafka log cleaner never touches the active
segment), and ``compact([prev_compacted, tail])`` -- incremental
compaction, a directory LIST input -- resolves them once the marker
appears, equaling a from-scratch compaction of the full history.
Rolled back transactions are dropped (they never reach state).
Because each compacted event keeps its key's LAST ``(commit_scn, scn,
row_id)``, later tail events still win LWW arbitration exactly as they
would have against the uncompacted history.

Scale shape (10^10 events -> ~|keys| events):

1. the engine's own decode + commit-resolve + dominance-combiner tasks
   stream over the log files (same fused per-event CPU path as replay;
   the combiner already collapses hot keys to <= 2 + n_cols rows per
   block before anything shuffles);
2. ONE wide exchange on the precomputed ``_part`` key (explicit
   boundaries, no sampling pass) co-locates each key, and
   :func:`stages.fold.fold_to_events` folds every block to one event
   per key -- output volume is bounded by distinct keys from here on;
3. the (now output-sized) compacted events take a second, cheap
   exchange onto scn-range buckets so the emitted files carry DISJOINT
   ascending SCN ranges (a compacted log is still an SCN-ordered log:
   micro-batch planning, footer pruning and gap detection keep
   working), and each bucket writes one batch file of PRE-RESOLVED
   events (original commit_scn kept, ``tx_id = NO_TXN``, no markers --
   see :func:`encode_change_events`).

A guard side-channel (one sentinel row per fold block, all routed to a
dedicated final bucket) makes a split ``_part`` block -- a partition
bigger than ``target_max_block_size``, which would silently emit two
half-folded events for the same key -- fail loudly instead.
"""

from __future__ import annotations

import logging
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.config import EngineConfig
from logminer_kafka_connect_ray.sources import changelog as changelog_src
from logminer_kafka_connect_ray.stages import fold
from logminer_kafka_connect_ray.stages.evolve import (
    catalog_fields,
    discover_image_fields,
)
from logminer_kafka_connect_ray.stages.process import make_processor_fn
from logminer_kafka_connect_ray.stages.txn import collect_txn_info_ref

log = logging.getLogger(__name__)

#: lineage row emitted per written compacted file (and one guard row)
_LINEAGE_SCHEMA = pa.schema(
    [
        ("file_idx", pa.int64()),
        ("path", pa.string()),
        ("n_events", pa.int64()),
        ("n_open", pa.int64()),
        ("scn_lo", pa.int64()),
        ("scn_hi", pa.int64()),
        ("guard_parts", pa.list_(pa.int64())),
    ]
)


#: per-worker-process cache for the resolve+split stage (same stateless
#: task + module cache pattern as stages/process.py)
_SPLIT_CACHE: dict = {}


def _make_split_keep_fn(markers_ref, schema_json, key_column: str,
                        num_partitions: int):
    """Resolve stage that KEEPS still-open rows inline (tagged
    ``_kind=1``) instead of spilling them: compaction must carry the
    active tail verbatim -- a transaction whose COMMIT lives in a
    later, not-yet-compacted segment would otherwise lose its
    already-written rows (the Kafka log cleaner never drops the active
    segment).  Committed rows take the combiner + ``_part`` stamp
    (``_kind=0``)."""
    import json as _json

    ref_key = (markers_ref.hex() if hasattr(markers_ref, "hex")
               else str(id(markers_ref)))
    cache_key = (ref_key, _json.dumps(schema_json), key_column,
                 num_partitions)

    def fn(t: pa.Table) -> pa.Table:
        pair = _SPLIT_CACHE.get(cache_key)
        if pair is None:
            if len(_SPLIT_CACHE) > 8:
                _SPLIT_CACHE.clear()
            from logminer_kafka_connect_ray.stages.merge import (
                PreaggPartitioner,
            )
            from logminer_kafka_connect_ray.stages.txn import CommitResolver

            table_schema = schemas.schema_from_json(schema_json)
            n_data = len(schemas.data_columns_of(table_schema, key_column))
            pair = (
                CommitResolver(markers_ref, "committed"),
                PreaggPartitioner(key_column, n_data, num_partitions),
            )
            _SPLIT_CACHE[cache_key] = pair
        resolver, partitioner = pair
        committed, open_rows = resolver.split(t)
        c = partitioner(committed)
        c = c.append_column("_kind", pa.array(np.zeros(c.num_rows, np.int64)))
        if open_rows.num_rows:
            from logminer_kafka_connect_ray.functions.hashing import (
                partition_ids,
            )

            o = open_rows.filter(pc.is_valid(open_rows.column(key_column)))
            o = o.append_column(
                "_part", pa.array(partition_ids(o.column(key_column),
                                                num_partitions))
            )
            o = o.append_column(
                "_kind", pa.array(np.ones(o.num_rows, np.int64))
            )
            return pa.concat_tables([c, o])
        return c

    fn.__name__ = "resolve_splitkeep"
    return fn


def encode_change_events(
    flat: pa.Table,
    table_schema: pa.Schema,
    key_column: str,
    raw_mask: np.ndarray | None = None,
) -> pa.Table:
    """Flat compacted events -> on-disk ``change_event_schema`` rows.

    Inverse of the decode stage for the three compacted shapes:
    ``i`` = full after image, ``u`` = partial after image with an
    explicit ``set_cols`` list (so a column SET TO NULL survives the
    decode round-trip, Issue14Test.kt:93-116) and the carried
    before-image fallback, ``d`` = key in the before image.

    Compacted events are PRE-RESOLVED: they keep their key's original
    ``commit_scn`` in the file and carry ``tx_id = NO_TXN`` (the same
    no-transaction sentinel snapshot READ rows use), so no commit
    markers are written, the marker scan never counts them as open
    rows, and the resolver's pre-resolved path stamps the original
    commit SCN back -- lake lineage (``_commit_scn``/``_scn``) after a
    compacted replay is bit-identical to the full-history replay's.

    ``raw_mask`` marks STILL-OPEN rows carried verbatim (the active
    tail): those keep their original ``tx_id`` with a null
    ``commit_scn`` so a later replay / incremental compaction resolves
    them when their COMMIT marker finally appears.
    """
    n = flat.num_rows
    data_cols = schemas.data_columns_of(table_schema, key_column)
    ev_schema = schemas.change_event_schema(table_schema)
    op = flat.column("op").combine_chunks()
    is_d = pc.equal(op, "d")
    is_i = pc.equal(op, "i")
    key = flat.column(key_column).combine_chunks()

    def _child(name: str, side: str) -> pa.Array:
        ftype = table_schema.field(name).type
        if name == key_column:
            return key.cast(ftype)
        col = flat.column(f"{side}_{name}").combine_chunks()
        return col.cast(ftype) if col.type != ftype else col

    after = pa.StructArray.from_arrays(
        [_child(f.name, "a") for f in table_schema],
        names=[f.name for f in table_schema],
        mask=is_d.combine_chunks() if isinstance(is_d, pa.ChunkedArray) else is_d,
    )
    before = pa.StructArray.from_arrays(
        [_child(f.name, "b") for f in table_schema],
        names=[f.name for f in table_schema],
        mask=is_i.combine_chunks() if isinstance(is_i, pa.ChunkedArray) else is_i,
    )

    # explicit set_cols from the folded mask (vectorized list build)
    mask = flat.column("set_mask").combine_chunks().to_numpy(zero_copy_only=False)
    C = len(data_cols)
    bits = ((mask[:, None] >> np.arange(C, dtype=np.int64)) & 1).astype(bool)
    counts = bits.sum(axis=1).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    names_arr = pa.array(data_cols, pa.string())
    values = names_arr.take(pa.array(np.nonzero(bits)[1].astype(np.int64)))
    set_cols = pa.ListArray.from_arrays(pa.array(offsets), values)

    if raw_mask is None:
        commit_col = flat.column("commit_scn").cast(pa.int64())
        tx_col = pa.array([schemas.NO_TXN] * n, pa.string())
    else:
        raw_arr = pa.array(raw_mask.astype(bool))
        commit_col = pc.if_else(
            raw_arr, pa.nulls(n, pa.int64()),
            flat.column("commit_scn").combine_chunks().cast(pa.int64()),
        )
        tx_col = pc.if_else(
            raw_arr, flat.column("tx_id").combine_chunks().cast(pa.string()),
            pa.scalar(schemas.NO_TXN, pa.string()),
        )
    rows = pa.table(
        {
            "scn": flat.column("scn").cast(pa.int64()),
            "row_id": flat.column("row_id").cast(pa.string()),
            "commit_scn": commit_col,
            "tx_id": tx_col,
            "op": op.cast(pa.string()),
            "ts_ms": flat.column("ts_ms").cast(pa.timestamp("ms", tz="UTC")),
            "table": flat.column("table").cast(pa.string()),
            "username": pa.nulls(n, pa.string()),
            "status": pa.array(np.zeros(n, np.int32)),
            "before": before,
            "after": after,
            "set_cols": set_cols,
        },
        schema=ev_schema,
    )
    return rows.take(pc.sort_indices(rows, sort_keys=[("scn", "ascending")]))


def compact_changelog(
    config: EngineConfig,
    changelog_dir: str | list[str],
    out_dir: str,
    num_files: int | None = None,
    scn_hi: int | None = None,
) -> dict:
    """Rewrite ``changelog_dir`` into ``out_dir`` as a compacted log
    (one committed event per key; see module docstring).  Returns a
    metrics dict.  ``scn_hi`` bounds compaction to events at or below
    it (compact behind a watermark); ``num_files`` sets the output
    fan-out (default: ``config.num_partitions``).

    ``changelog_dir`` may be a LIST of directories -- the Kafka
    log-cleaner shape: ``compact([prev_compacted, tail])`` folds the
    previous compacted output (~|keys| pre-resolved events) with the
    new tail segments, reaching the same state as compacting the full
    history without ever re-reading it (incremental compaction; the
    decode+resolve pass handles pre-resolved and marker-resolved rows
    in one stream)."""
    import ray
    import ray.data as rd

    t0 = time.monotonic()
    cfg = config
    dirs = [changelog_dir] if isinstance(changelog_dir, str) else list(
        changelog_dir
    )
    # realpath-dedupe (preserving input order): the same dir listed
    # twice -- or aliased via a symlink -- would be read twice, which
    # is benign for the LWW fold but inflates events_in and duplicates
    # carried open rows
    seen_real: dict[str, str] = {}
    for d in dirs:
        seen_real.setdefault(os.path.realpath(d), d)
    dirs = list(seen_real.values())
    files = [f for d in dirs for f in changelog_src.list_batch_files(d)]
    if scn_hi is not None:
        files = changelog_src.prune_files(files, None, scn_hi)
    if not files:
        raise RuntimeError(f"no batch files under {dirs}")
    paths = [f.path for f in files]
    lo = min(f.scn_min for f in files) - 1
    hi = scn_hi if scn_hi is not None else max(f.scn_max for f in files)
    # NOTE: footer-level count -- a file straddling scn_hi contributes
    # ALL its footer rows here even though decode drops rows above the
    # watermark, so events_in is an upper bound on rows actually folded
    events_in = sum(f.num_rows for f in files)

    info, markers_ref = collect_txn_info_ref(paths, lo, hi, block=False)

    # per-dir format detection: a prev-compacted dir is ALWAYS struct
    # form (encode_change_events output), even when the original log is
    # redo-SQL -- the incremental log-cleaner loop mixes formats freely
    by_dir: dict[str, list[str]] = {}
    for p in paths:
        by_dir.setdefault(os.path.dirname(p), []).append(p)
    dir_fmt = {
        d: ("redo_sql"
            if "sql_redo" in pq.ParquetFile(ps[0]).schema_arrow.names
            else "struct")
        for d, ps in by_dir.items()
    }

    # schema from the log itself (same discovery as the start_scn
    # bootstrap: image-struct footers + redo catalog sidecar), deduped
    # first-wins by name across sources
    fields = discover_image_fields(paths)
    if "redo_sql" in dir_fmt.values():
        fields = fields + catalog_fields(paths)
    seen: dict[str, pa.Field] = {}
    for f in fields:
        seen.setdefault(f.name, f)
    data_fields = [f for n, f in seen.items() if n != cfg.key_column]
    table_schema = pa.schema(
        [pa.field(cfg.key_column, pa.string())] + data_fields
    )
    schema_json = schemas.schema_to_json(table_schema)
    data_cols = schemas.data_columns_of(table_schema, cfg.key_column)
    P = cfg.num_partitions
    F = num_files or cfg.num_partitions

    # ---- source: one decode stream per input dir (same per-event CPU
    # path as replay, format chosen per dir) -------------------------
    wanted = {
        "scn", "row_id", "commit_scn", "tx_id", "op", "ts_ms", "table",
        "status", "before", "after", "set_cols", "csf", "sql_redo",
    }
    decoded = None
    for d, d_paths in by_dir.items():
        avail = pq.ParquetFile(d_paths[0]).schema_arrow.names
        cols = [c for c in avail if c in wanted]
        fmt = dir_fmt[d]
        if fmt == "redo_sql" and "csf" in cols:
            from logminer_kafka_connect_ray.functions.redo_sql import (
                reassemble_csf,
            )

            read_cols = list(cols)

            def read_reassembled(b: pa.Table, _rc=read_cols) -> pa.Table:
                out = []
                for p in b.column("path").to_pylist():
                    out.append(reassemble_csf(pq.read_table(p, columns=_rc)))
                return pa.concat_tables(out)

            ds_d = rd.from_items([{"path": p} for p in d_paths]).map_batches(
                read_reassembled, batch_size=1, batch_format="pyarrow"
            )
        else:
            ds_d = rd.read_parquet(d_paths, columns=cols)
        dec_d = ds_d.map_batches(
            make_processor_fn(
                None, schema_json, cfg.key_column, cfg.table_whitelist,
                lo, hi, P, "committed",
                changelog_format=fmt,
                db_timezone=cfg.db_timezone,
                stage="decode",
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        decoded = dec_d if decoded is None else decoded.union(dec_d)

    # resolve+split-keep: committed rows combined + _part-stamped
    # (_kind=0), still-open rows carried inline verbatim (_kind=1)
    committed = decoded.map_batches(
        _make_split_keep_fn(markers_ref, schema_json, cfg.key_column, P),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )

    # ---- exchange 1: co-locate keys, fold to one event per key ------
    flat_schema = schemas.flat_change_schema(cfg.key_column, table_schema)
    stage1_schema = pa.schema(
        list(flat_schema)
        + [pa.field("_kind", pa.int64()), pa.field("_file", pa.int64()),
           pa.field("_gpart", pa.int64())]
    )
    span = max(1, hi - lo)

    def _stamp_file(t: pa.Table) -> pa.Table:
        scn = t.column("scn").combine_chunks().to_numpy(zero_copy_only=False)
        fidx = np.clip((scn - lo - 1) * F // span, 0, F - 1)
        t = t.append_column("_file", pa.array(fidx.astype(np.int64)))
        return t.append_column(
            "_gpart", pa.array(np.full(t.num_rows, -1, np.int64))
        )

    def fold_block(t: pa.Table, _key=cfg.key_column) -> pa.Table:
        if t.num_rows == 0:
            return stage1_schema.empty_table()
        kind = t.column("_kind")
        # still-open rows (the active tail) pass through VERBATIM
        carried = t.filter(pc.equal(kind, 1)).drop_columns(["_part"])
        t0 = t.filter(pc.equal(kind, 0))
        # guard parts come from the COMMITTED subset only: carried open
        # rows pass through verbatim and need no co-location, so a big
        # open tail split across blocks must not trip the guard
        parts = pc.unique(t0.column("_part")).to_pylist()
        t0 = t0.drop_columns(["_part", "_kind"])
        out = fold.fold_to_events(t0, table_schema, _key)
        out = out.append_column(
            "_kind", pa.array(np.zeros(out.num_rows, np.int64))
        )
        pieces = [
            _stamp_file(out).select(stage1_schema.names).cast(stage1_schema)
        ]
        if carried.num_rows:
            pieces.append(
                _stamp_file(carried)
                .select(stage1_schema.names).cast(stage1_schema)
            )
        # guard side-channel: one sentinel per (block, part) routed to
        # the dedicated final bucket; a part seen in TWO fold blocks
        # means the exchange split it (half-folded keys) -> fail loudly
        guard = stage1_schema.empty_table().to_pydict()
        for p in parts:
            for f in stage1_schema.names:
                guard[f].append(
                    F if f == "_file" else (p if f == "_gpart" else None)
                )
        pieces.append(pa.table(guard, schema=stage1_schema))
        return pa.concat_tables(pieces)

    folded = (
        committed.sort("_part", boundaries=list(range(1, P)))
        .map_batches(fold_block, batch_size=None, batch_format="pyarrow")
    )

    # ---- exchange 2: disjoint scn-range buckets -> batch files ------
    # compaction OWNS its output dir: bucket ranges are deterministic
    # for (input, F), so a re-run after a crash rewrites the same file
    # names atomically (tmp+rename) -- but a prior attempt with
    # different parameters could leave stale batch files that a reader
    # would pick up, so clear them first.  The _compacted.json manifest
    # written at the end is the completeness marker.
    # never compact in place: the pre-clean below would unlink the
    # source log before the lazy read ever executes
    out_real = os.path.realpath(out_dir)
    for d in dirs:
        if os.path.realpath(d) == out_real:
            raise ValueError(
                f"compact_changelog: out_dir {out_dir!r} is an input "
                "directory; in-place compaction would destroy the log"
            )
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if (f.startswith("batch-") or f.startswith(".tmp-")
                or f in ("_compacted.json", "_catalog.json")):
            # .tmp-<uuid> files are orphans of a crashed attempt (the
            # uuid names mean a re-run's tmp+rename never overwrites
            # them), so they'd accumulate across crash/retry cycles
            os.unlink(os.path.join(out_dir, f))
    # DDL catalog sidecar travels with the log: defaults/renames/drops
    # discovered by a replay of the COMPACTED log must match what the
    # full log would have taught it (default backfill of old base
    # partitions happens at merge time, not in the events themselves).
    # MERGE catalogs across input dirs in input order (later dirs --
    # the newer tail -- override per key), mirroring the per-dir merge
    # catalog_fields/catalog_defaults do at replay time.
    import json as _json

    merged: dict = {}
    for d in dirs:
        cat = os.path.join(d, "_catalog.json")
        if not os.path.exists(cat):
            continue
        with open(cat) as fh:
            c = _json.load(fh)
        for k, v in c.items():
            if isinstance(v, dict):
                merged.setdefault(k, {}).update(v)
            elif isinstance(v, list):
                prev = merged.setdefault(k, [])
                prev.extend(x for x in v if x not in prev)
            else:
                merged[k] = v
    if merged:
        tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            _json.dump(merged, fh, indent=1)
        os.rename(tmp, os.path.join(out_dir, "_catalog.json"))

    def write_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _LINEAGE_SCHEMA.empty_table()
        guards = t.filter(pc.equal(t.column("_file"), F))
        t = t.filter(pc.less(t.column("_file"), F))
        rows = []
        if guards.num_rows:
            rows.append(
                {
                    "file_idx": -1, "path": "", "n_events": 0, "n_open": 0,
                    "scn_lo": 0, "scn_hi": 0,
                    "guard_parts": guards.column("_gpart").to_pylist(),
                }
            )
        if t.num_rows:
            fvals = pc.unique(t.column("_file")).to_pylist()
            if len(fvals) != 1:
                raise RuntimeError(
                    f"compaction bucket exchange mixed file buckets {fvals}"
                )
            fidx = int(fvals[0])
            raw = pc.equal(t.column("_kind"), 1).combine_chunks()
            raw_np = raw.to_numpy(zero_copy_only=False)
            flat = t.drop_columns(["_kind", "_file", "_gpart"])
            s_lo = int(pc.min(flat.column("scn")).as_py())
            s_hi = int(pc.max(flat.column("scn")).as_py())
            enc = encode_change_events(
                flat, table_schema, cfg.key_column,
                raw_mask=raw_np if raw_np.any() else None,
            )
            name = f"batch-{s_lo:012d}-{s_hi:012d}.parquet"
            tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
            pq.write_table(enc, tmp)
            os.rename(tmp, os.path.join(out_dir, name))
            n_open = int(raw_np.sum())
            rows.append(
                {
                    "file_idx": fidx, "path": name,
                    "n_events": flat.num_rows - n_open, "n_open": n_open,
                    "scn_lo": s_lo, "scn_hi": s_hi, "guard_parts": [],
                }
            )
        return pa.Table.from_pylist(rows, schema=_LINEAGE_SCHEMA)

    lineage = pa.Table.from_pandas(
        folded.sort("_file", boundaries=list(range(1, F + 1)))
        .map_batches(write_bucket, batch_size=None, batch_format="pyarrow")
        .to_pandas(),
        schema=_LINEAGE_SCHEMA,
        preserve_index=False,
    )

    gp = [p for row in lineage.column("guard_parts").to_pylist() for p in row]
    if len(gp) != len(set(gp)):
        raise RuntimeError(
            "compaction fold exchange split a partition across blocks "
            "(partition larger than target_max_block_size); raise "
            "DataContext.target_max_block_size or num_partitions"
        )
    fidxs = [i for i in lineage.column("file_idx").to_pylist() if i >= 0]
    if len(fidxs) != len(set(fidxs)):
        raise RuntimeError(
            "compaction bucket exchange fragmented a file bucket across "
            "blocks; raise DataContext.target_max_block_size or num_files"
        )
    if markers_ref is not None and not hasattr(markers_ref, "n_open_rows"):
        info = ray.get(markers_ref)
    events_out = int(
        pc.sum(lineage.column("n_events")).as_py() or 0
    )
    metrics = {
        "events_in": events_in,
        "events_out": events_out,
        "n_files": len(fidxs),
        "n_open_rows_carried": int(
            pc.sum(lineage.column("n_open")).as_py() or 0
        ),
        "n_rolled_back_txns": int(info.n_rolled),
        "scn_lo": lo,
        "scn_hi": hi,
        "seconds": round(time.monotonic() - t0, 3),
    }
    # completeness marker (atomic): a reader finding batch files but no
    # manifest is looking at a crashed attempt -- re-run compaction
    import json

    files_out = sorted(
        p for p in lineage.column("path").to_pylist() if p
    )
    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump({"metrics": metrics, "files": files_out}, fh, indent=1)
    os.rename(tmp, os.path.join(out_dir, "_compacted.json"))
    log.info("compacted %s -> %s: %s", changelog_dir, out_dir, metrics)
    return metrics
