"""Streaming mode: long-lived transaction-consolidation actors.

The batch-replay path (``pipelines/engine.py``) resolves transactions
with a per-micro-batch metadata scan + broadcast join.  Stream-shaped
ingest -- events trickling in file by file, transactions staying open
across polls -- needs *persistent* consolidation state instead.  This
module is the direct actor re-expression of the reference's stateful
core:

* ``TxnShard`` (a Ray actor) == ``TransactionConsolidator`` +
  ``Transaction`` (``logminer/TransactionConsolidator.kt:19-116``,
  ``logminer/Transaction.kt:17-145``): per-txn buffers keyed by tx_id,
  commit releases a txn's rows stamped with the commit SCN, rollback
  discards them, big buffers spill to disk (reference Chronicle-Queue
  spill past ``maxRecordsInMemory``, ``Transaction.kt:59-71``), and the
  shard tracks ``min`` SCN over its open txns -- the safe offset lower
  bound (``TransactionConsolidator.kt:56-64``).

* ``StreamingConsolidator`` shards that state ``hash(tx_id) % K`` so a
  txn's rows always meet in one actor (the partitioning assumption the
  reference gets for free from its single-threaded task; here it is
  explicit and documented).

* ``StreamingEngine.poll()`` == the reference poll loop
  (``LogminerSource.kt:76-94``): emit up to ``batch_size`` committed
  rows in commit order, sleep ``poll_interval`` when idle
  (``SourceTask.kt:142-146``).

This is the documented "raw actors where the Dataset API can't express
the semantics" escape hatch: shared mutable per-txn state with
cross-poll lifetime.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64


def _decode_changelog_file(
    path: str,
    schema_json: list[dict],
    key_column: str,
    watermark: int,
    transform=None,
    changelog_format: str = "struct",
    db_timezone: str = "UTC",
    dead_dir: str | None = None,
    whitelist: tuple[str, ...] = (),
) -> tuple[pa.Table, pa.Table, pa.Table, int]:
    """Ray TASK: raw event file -> (auto-commit rows, to-buffer rows,
    marker rows).  Runs OFF the driver (round-2 verdict: the poll
    loop's full-file decode in the driver process was the streaming
    path's scale-killer); the driver only ever touches the returned
    object refs, except the tiny marker tables it fetches to route
    terminators.  ``transform`` is the SMT hook, applied exactly once
    here -- rows buffered in shard actors are already transformed.

    ``changelog_format='redo_sql'`` decodes raw redo statements (CSF
    reassembled per file before any slicing, LogminerFetcher.kt:
    144-153) with the same parse/convert dead-letter routing as the
    batch path; streaming dead letters are attributed to version 0
    (the stream has no plan-time version) and deduplicated by the
    (scn, row_id) reader like any retried write."""
    from logminer_kafka_connect_ray.stages.decode import (
        ChangeDecoder,
        RedoSqlDecoder,
        route_dead_rows,
    )

    raw = pq.read_table(path)
    schema = schemas.schema_from_json(schema_json)
    if changelog_format == "redo_sql":
        from logminer_kafka_connect_ray.functions.redo_sql import reassemble_csf

        raw = reassemble_csf(raw)
        dec = RedoSqlDecoder(
            schema, key_column, whitelist, db_timezone,
            dead_dir=dead_dir, version=0, scn_lo=watermark,
        )
    else:
        dec = ChangeDecoder(schema, key_column, whitelist)
    markers = raw.filter(
        pc.is_in(raw.column("op"), value_set=pa.array(schemas.MARKER_OPS))
    ).select(["scn", "tx_id", "op"])
    flat = dec(raw)
    flat = flat.filter(pc.greater(flat.column("scn"), watermark))
    # struct-format null-key rows are undecodable: route them like the
    # batch processor does (process.py missing_key parity)
    nk = pc.is_null(flat.column(key_column))
    if pc.any(nk).as_py():
        if dead_dir is not None:
            bad = flat.filter(nk).select(["scn", "row_id", "tx_id", "table"])
            rows = bad.to_pylist()
            route_dead_rows(dead_dir, 0, rows, ["missing_key"] * len(rows))
        flat = flat.filter(pc.invert(nk))
    if transform is not None:
        flat = transform(flat)
    # auto-commit rows (snapshot READs / no-txn) bypass buffering
    auto = pc.fill_null(
        pc.or_(
            pc.equal(flat.column("op"), schemas.OP_READ),
            pc.or_(
                pc.equal(flat.column("tx_id"), schemas.NO_TXN),
                pc.is_null(flat.column("tx_id")),
            ),
        ),
        False,
    )
    auto_rows = flat.filter(auto)
    if auto_rows.num_rows:
        # PRE-RESOLVED rows (compacted changelog bootstrap,
        # pipelines/compaction.py) keep their original commit stamp;
        # plain no-txn rows auto-commit at their own scn
        i = auto_rows.column_names.index("commit_scn")
        pre = auto_rows.column("commit_scn").cast(pa.int64()).combine_chunks()
        scn = auto_rows.column("scn").cast(pa.int64()).combine_chunks()
        auto_rows = auto_rows.set_column(
            # explicit if_else(is_valid) over combined chunks -- see the
            # pc.coalesce chunk-misalignment note in stages/txn.py
            i, "commit_scn", pc.if_else(pc.is_valid(pre), pre, scn),
        )
    # the auto count rides back as its own (tiny) return so the run()
    # loop never needs a _count task round over the auto refs
    return auto_rows, flat.filter(pc.invert(auto)), markers, auto_rows.num_rows


def _route_shards(flat: pa.Table, num_shards: int):
    """Ray TASK: split buffered change rows into per-shard pieces by
    ``fnv(tx_id) % K`` so each shard actor fetches only its piece."""
    h = fnv1a_u64(flat.column("tx_id").cast(pa.string()))
    shard = (h % np.uint64(num_shards)).astype(np.int64)
    pieces = tuple(
        flat.filter(pa.array(shard == s)) for s in range(num_shards)
    )
    return pieces if num_shards > 1 else pieces[0]


#: emission order of released rows (reference commit-order drain,
#: LogminerSource.kt:76-94)
_ORDER_KEYS = [
    ("commit_scn", "ascending"),
    ("scn", "ascending"),
    ("row_id", "ascending"),
]


def _sort_run(*tables):
    """Ray TASK: newly released tables -> ONE sorted run (cross-schema
    promote for mid-stream evolution).  Returns (run, n_rows); only the
    tiny count is fetched by the driver.  Sorting cost is O(new) per
    poll -- the backlog itself is never re-sorted (see
    ``_emit_from_runs``)."""
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        z = pa.table({"commit_scn": pa.array([], pa.int64())})
        return z, 0
    merged = pa.concat_tables(live, promote_options="default")
    merged = merged.take(pc.sort_indices(merged, sort_keys=_ORDER_KEYS))
    return merged, merged.num_rows


def _compact_runs(offsets, *runs):
    """Ray TASK: fold the live tails of many runs into one run (keeps
    the per-poll k-way emission bounded).  Amortized over the
    compaction interval this is O(backlog log backlog) once per C
    polls, not per poll."""
    live = [
        t.slice(off) for t, off in zip(runs, offsets) if t.num_rows - off > 0
    ]
    return _sort_run(*live)


def _count_rows(t) -> int:
    """Ray TASK: row count of a released ref (None-safe) -- lets the
    driver drop empty terminate outputs without fetching tables."""
    return t.num_rows if t is not None else 0


def _txn_summary(flat: pa.Table) -> pa.Table:
    """Per-txn (tx_id, min_scn, n_rows) of a buffered-rows block --
    the METADATA the consolidator shards need for the min-open-SCN
    watermark when the rows themselves stay in plasma (bulk catch-up
    path)."""
    if flat.num_rows == 0:
        return pa.table(
            {"tx_id": pa.array([], pa.string()),
             "min_scn": pa.array([], pa.int64()),
             "n_rows": pa.array([], pa.int64())}
        )
    tx = flat.column("tx_id").cast(pa.string()).combine_chunks()
    scn = flat.column("scn").to_numpy(zero_copy_only=False)
    idx = pc.sort_indices(pa.table({"t": tx}), sort_keys=[("t", "ascending")])
    order = idx.to_numpy(zero_copy_only=False)
    txs, scns = tx.take(idx), scn[order]
    n = len(order)
    neq = pc.not_equal(txs.slice(1), txs.slice(0, n - 1))
    change = (
        pc.fill_null(neq, True).to_numpy(zero_copy_only=False)
        if n > 1
        else np.empty(0, bool)
    )
    starts = np.concatenate([[0], np.flatnonzero(change) + 1]).astype(np.int64)
    sizes = np.diff(starts, append=n)
    return pa.table(
        {
            "tx_id": txs.take(pa.array(starts)),
            "min_scn": pa.array(np.minimum.reduceat(scns, starts)),
            "n_rows": pa.array(sizes.astype(np.int64)),
        }
    )


_EMPTY_OPEN_SUMMARY = pa.table(
    {"tx_id": pa.array([], pa.string()), "min_scn": pa.array([], pa.int64())}
)


def _open_txn_fold(
    prev: pa.Table, commit_map: pa.Table, *summaries: pa.Table
) -> pa.Table:
    """Ray TASK: bulk-regime open-transaction bookkeeping.

    Folds this poll's per-block txn summaries into the carried-over
    open-txn table, drops every txn this poll's terminator map
    commits or rolls back, and returns the still-open ``(tx_id,
    min_scn)`` table (one row per open txn -- min over its blocks).

    This replaces the round-3 design that shipped per-txn metadata to
    the consolidator actors in bulk mode: a 1M-txn catch-up poll cost
    ~1.5 s of actor dict churn (feed_meta + 60x8 terminate calls +
    the stats barrier) for state only ever read as ``min(min_scn)``.
    One vectorized task computes the same exact watermark input."""
    live = [
        t.select(["tx_id", "min_scn"])
        for t in (prev, *summaries)
        if t is not None and t.num_rows
    ]
    if not live:
        return _EMPTY_OPEN_SUMMARY
    t = pa.concat_tables(live, promote_options="default")
    if commit_map.num_rows:
        pos = pc.index_in(
            t.column("tx_id").cast(pa.string()),
            value_set=commit_map.column("tx_id"),
        )
        t = t.filter(pc.is_null(pos))
    if t.num_rows == 0:
        return _EMPTY_OPEN_SUMMARY
    tx = t.column("tx_id").cast(pa.string()).combine_chunks()
    idx = pc.sort_indices(pa.table({"t": tx}), sort_keys=[("t", "ascending")])
    order = idx.to_numpy(zero_copy_only=False)
    txs = tx.take(idx)
    scns = t.column("min_scn").to_numpy(zero_copy_only=False)[order]
    n = len(order)
    neq = pc.not_equal(txs.slice(1), txs.slice(0, n - 1))
    change = (
        pc.fill_null(neq, True).to_numpy(zero_copy_only=False)
        if n > 1
        else np.empty(0, bool)
    )
    starts = np.concatenate([[0], np.flatnonzero(change) + 1]).astype(np.int64)
    return pa.table(
        {
            "tx_id": txs.take(pa.array(starts)),
            "min_scn": pa.array(np.minimum.reduceat(scns, starts)),
        }
    )


def _release_filter(
    block: pa.Table, commit_map: pa.Table, apply_spec: tuple | None = None
):
    """Ray TASK (num_returns=3): split a plasma-resident buffered-rows
    block against this poll's terminator map.

    ``commit_map`` columns: ``tx_id`` + nullable ``commit_scn`` (null
    = ROLLBACK -> rows dropped).  Returns ``(released, still_open,
    (n_released, n_open))``: released rows get their commit scn joined
    in with one ``index_in`` pass; unmatched rows stay open and are
    re-filtered by later polls.  This is the bulk-regime release path:
    row payloads move plasma -> task once per terminator poll instead
    of round-tripping through the consolidator actors.

    ``apply_spec`` (``run()``'s lake-apply form only; ``poll()`` needs
    raw rows for the commit-order emission contract): a
    ``(flat_schema_json, key_column, n_data_cols, num_partitions)``
    tuple -- the released rows additionally get schema-aligned,
    dominance-combined and ``_part``-stamped HERE, in the same task
    that already holds the block, so the apply path needs no further
    pass over the released volume.  ``n_released`` still counts the
    pre-combine released EVENTS; ``still_open`` rows stay raw."""
    if block.num_rows == 0:
        # apply-form empties keep the apply schema so a merge dataset
        # mixing empty and non-empty release outputs unifies cleanly
        rel = block if apply_spec is None else _apply_form(block, apply_spec)
        return rel, block, (0, 0)
    pos = pc.index_in(
        block.column("tx_id").cast(pa.string()),
        value_set=commit_map.column("tx_id"),
    )
    matched = pc.is_valid(pos)
    cs = pc.take(commit_map.column("commit_scn"), pc.fill_null(pos, 0))
    committed = pc.and_(matched, pc.is_valid(cs))
    i = block.column_names.index("commit_scn")
    if pc.all(committed).as_py():
        # bulk catch-up fast path: the whole block commits (the common
        # shape when draining a backlog whose terminators arrived in
        # the same poll).  set_column reuses every other column's
        # buffers -- no copy of the html payloads, unlike filter().
        if isinstance(cs, pa.ChunkedArray):
            cs = cs.combine_chunks()
        released = block.set_column(i, "commit_scn", cs.cast(pa.int64()))
        n_rel = released.num_rows
        if apply_spec is not None:
            released = _apply_form(released, apply_spec)
        return released, block.slice(0, 0), (n_rel, 0)
    released = block.filter(committed)
    if released.num_rows:
        rel_cs = pc.take(
            commit_map.column("commit_scn"),
            pc.index_in(
                released.column("tx_id").cast(pa.string()),
                value_set=commit_map.column("tx_id"),
            ),
        )
        if isinstance(rel_cs, pa.ChunkedArray):
            rel_cs = rel_cs.combine_chunks()
        released = released.set_column(
            i, "commit_scn", rel_cs.cast(pa.int64())
        )
    still_open = block.filter(pc.invert(matched))
    n_rel = released.num_rows
    if apply_spec is not None:
        released = _apply_form(released, apply_spec)
    return released, still_open, (n_rel, still_open.num_rows)


def _apply_form(t: pa.Table, apply_spec: tuple) -> pa.Table:
    """Align a raw released table to the current flat schema, then
    dominance-combine + ``_part``-stamp it (the same fused pass
    ``run()`` applies to non-pre-formed refs)."""
    from logminer_kafka_connect_ray.stages.evolve import align_flat
    from logminer_kafka_connect_ray.stages.merge import PreaggPartitioner

    flat_schema, key_column, n_data_cols, num_partitions = apply_spec
    t = align_flat(t, flat_schema)
    return PreaggPartitioner(key_column, n_data_cols, num_partitions)(t)


def _emit_from_runs(batch_size, offsets, *runs):
    """Ray TASK: k-way-select the globally smallest ``batch_size`` rows
    across the sorted runs' live tails.

    Each run contributes at most ``batch_size`` rows, and those rows
    are necessarily a PREFIX of its tail (the tail is sorted) -- so
    only a bounded candidate window per run is examined, the emitted
    batch is exactly what sorting the whole backlog would emit, and
    the per-poll cost is O(R * batch_size log) independent of backlog
    size.  Returns (sorted batch, rows consumed per run); runs are
    immutable plasma objects -- the driver just advances offsets."""
    cands, ids = [], []
    for i, t in enumerate(runs):
        w = t.slice(offsets[i], batch_size)
        if w.num_rows:
            cands.append(w)
            ids.append(np.full(w.num_rows, i, np.int64))
    if not cands:
        z = pa.table({"commit_scn": pa.array([], pa.int64())})
        return z, [0] * len(runs)
    merged = pa.concat_tables(cands, promote_options="default")
    rid = np.concatenate(ids)
    order = pc.sort_indices(merged, sort_keys=_ORDER_KEYS).to_numpy(
        zero_copy_only=False
    )
    take = order[: batch_size]
    batch = merged.take(pa.array(take))
    counts = np.bincount(rid[take], minlength=len(runs))
    return batch, counts.tolist()


class _TxnShardImpl:
    """One shard of consolidation state (plain class; wrapped
    ``ray.remote`` at pool construction so importing this module never
    touches Ray)."""

    def __init__(self, shard_id: int, spill_dir: str, max_rows_in_memory: int = 100_000):
        self.shard_id = shard_id
        self.spill_dir = spill_dir
        self.max_rows_in_memory = max_rows_in_memory
        #: tx_id -> list[pa.Table] in-memory buffered chunks
        self.buffers: dict[str, list[pa.Table]] = {}
        #: tx_id -> spill file path (reference Transaction.kt:59-71)
        self.spilled: dict[str, str] = {}
        #: tx_id -> min change scn (watermark input)
        self.tx_min_scn: dict[str, int] = {}
        self.rows_in_memory = 0

    # -- ingest -------------------------------------------------------
    def add_events(self, flat: pa.Table) -> int:
        """Buffer change rows (flat pipeline form) under their tx_id."""
        if flat.num_rows == 0:
            return 0
        tx_col = flat.column("tx_id")
        idx = pc.sort_indices(pa.table({"t": tx_col}), sort_keys=[("t", "ascending")])
        flat = flat.take(idx)
        tx_sorted = flat.column("tx_id").combine_chunks()
        n = flat.num_rows
        neq = pc.not_equal(tx_sorted.slice(1), tx_sorted.slice(0, n - 1))
        change = pc.fill_null(neq, True).to_numpy(zero_copy_only=False) if n > 1 else np.empty(0, bool)
        starts = np.concatenate([[0], np.flatnonzero(change) + 1]).astype(np.int64)
        sizes = np.diff(starts, append=n)
        # one vectorized pass for the per-txn min scns and tx ids --
        # a per-txn pc.min/as_py loop is ~ms per txn and the feed path
        # sees thousands of txns per file
        mins = np.minimum.reduceat(
            flat.column("scn").to_numpy(zero_copy_only=False), starts
        )
        txs = tx_sorted.take(pa.array(starts)).to_pylist()
        for tx, s, sz, mn in zip(txs, starts, sizes, mins):
            self.buffers.setdefault(tx, []).append(flat.slice(int(s), int(sz)))
            cur = self.tx_min_scn.get(tx)
            self.tx_min_scn[tx] = int(mn) if cur is None else min(cur, int(mn))
            self.rows_in_memory += int(sz)
        self._maybe_spill()
        return flat.num_rows

    def _maybe_spill(self):
        """Spill the largest open txns to parquet when over budget."""
        if self.rows_in_memory <= self.max_rows_in_memory:
            return
        os.makedirs(self.spill_dir, exist_ok=True)
        by_size = sorted(
            self.buffers.items(), key=lambda kv: -sum(t.num_rows for t in kv[1])
        )
        for tx, chunks in by_size:
            if self.rows_in_memory <= self.max_rows_in_memory // 2:
                break
            # promote across chunk schemas: a column added mid-stream
            # (schema evolution) null-fills older buffered chunks
            tbl = pa.concat_tables(chunks, promote_options="default")
            path = os.path.join(self.spill_dir, f"s{self.shard_id}-{tx}.parquet")
            if tx in self.spilled:  # append to existing spill
                tbl = pa.concat_tables(
                    [pq.read_table(self.spilled[tx]), tbl],
                    promote_options="default",
                )
            pq.write_table(tbl, path)
            self.spilled[tx] = path
            self.rows_in_memory -= sum(t.num_rows for t in chunks)
            self.buffers[tx] = []

    # -- terminate ----------------------------------------------------
    def terminate(self, commit_tx: list[str], commit_scn: list[int], rolled_tx: list[str]) -> pa.Table | None:
        """Release committed txns (stamped with commit scn), discard
        rolled-back ones.  Returns the released rows (or None).

        Vectorized: a CDC stream is mostly SMALL txns (the bench
        workload averages ~6 rows/txn), so a per-txn concat +
        set_column loop costs ~ms per TXN and dominates the whole
        streaming path at volume.  The loop below only moves list
        references; the released table is built with ONE concat and
        the commit scns joined in with one ``index_in`` pass."""
        released_chunks: list[pa.Table] = []
        for tx in rolled_tx:  # TransactionConsolidator.kt:42-45
            chunks = self.buffers.pop(tx, None)
            if chunks:
                self.rows_in_memory -= sum(t.num_rows for t in chunks)
            sp = self.spilled.pop(tx, None)
            if sp and os.path.exists(sp):
                os.remove(sp)
            self.tx_min_scn.pop(tx, None)
        for tx in commit_tx:
            sp = self.spilled.pop(tx, None)
            if sp is not None:
                released_chunks.append(pq.read_table(sp))
                os.remove(sp)
            chunks = self.buffers.pop(tx, None)
            if chunks:
                self.rows_in_memory -= sum(t.num_rows for t in chunks)
                released_chunks.extend(chunks)
            self.tx_min_scn.pop(tx, None)
        if not released_chunks:
            return None
        tbl = pa.concat_tables(released_chunks, promote_options="default")
        pos = pc.index_in(
            tbl.column("tx_id").cast(pa.string()),
            value_set=pa.array(commit_tx, pa.string()),
        )
        cs = pc.take(pa.array(commit_scn, pa.int64()), pos)
        if isinstance(cs, pa.ChunkedArray):
            cs = cs.combine_chunks()
        i = tbl.column_names.index("commit_scn")
        return tbl.set_column(i, "commit_scn", cs)

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "open_txns": len(self.tx_min_scn),
            "rows_in_memory": self.rows_in_memory,
            "spilled_txns": len(self.spilled),
            "min_open_scn": min(self.tx_min_scn.values()) if self.tx_min_scn else None,
        }


class StreamingConsolidator:
    """K ``TxnShard`` actors; rows routed by ``fnv(tx_id) % K`` so each
    transaction's rows meet in exactly one actor."""

    def __init__(self, num_shards: int, spill_dir: str, max_rows_in_memory: int = 100_000):
        import ray

        self.num_shards = num_shards
        shard_cls = ray.remote(_TxnShardImpl)
        self.shards = [
            shard_cls.options(num_cpus=0.5).remote(
                i, os.path.join(spill_dir, f"shard-{i}"), max_rows_in_memory
            )
            for i in range(num_shards)
        ]
        self._router = ray.remote(num_returns=max(num_shards, 1))(_route_shards)

    def _shard_of(self, tx_hashes: np.ndarray) -> np.ndarray:
        return (tx_hashes % np.uint64(self.num_shards)).astype(np.int64)

    def feed_ref(self, flat_ref):
        """Route buffered change rows (an OBJECT REF) to their txn's
        shard: a routing task splits off-driver, each shard fetches
        only its piece -- no driver decode or filter."""
        if self.num_shards == 1:
            return [self.shards[0].add_events.remote(flat_ref)]
        pieces = self._router.remote(flat_ref, self.num_shards)
        return [
            self.shards[s].add_events.remote(pieces[s])
            for s in range(self.num_shards)
        ]

    def feed(self, flat: pa.Table):
        """Driver-side convenience wrapper over ``feed_ref``."""
        import ray

        if flat.num_rows == 0:
            return []
        return self.feed_ref(ray.put(flat))

    def terminate(self, commit_tx: list[str], commit_scn: list[int], rolled_tx: list[str]):
        """Broadcast txn terminators; returns refs of released tables."""
        if not (commit_tx or rolled_tx):
            return []
        ch = self._shard_of(fnv1a_u64(list(commit_tx))) if commit_tx else np.empty(0, np.int64)
        rh = self._shard_of(fnv1a_u64(list(rolled_tx))) if rolled_tx else np.empty(0, np.int64)
        # numpy mask routing: the commit list can be 10^4-10^5 entries
        # per poll, so per-element Python zip filters add up
        ct = np.asarray(commit_tx, dtype=object)
        cs = np.asarray(commit_scn, dtype=np.int64)
        rt = np.asarray(rolled_tx, dtype=object)
        refs = []
        for s in range(self.num_shards):
            cm, rm = ch == s, rh == s
            if cm.any() or rm.any():
                refs.append(
                    self.shards[s].terminate.remote(
                        ct[cm].tolist(), cs[cm].tolist(), rt[rm].tolist()
                    )
                )
        return refs

    def stats(self) -> list[dict]:
        import ray

        return ray.get([s.stats.remote() for s in self.shards])

    def min_open_scn(self) -> int | None:
        """Global safe-offset lower bound = min over shard watermarks
        (reference minOpenTransaction, TransactionConsolidator.kt:56-64)."""
        vals = [s["min_open_scn"] for s in self.stats() if s["min_open_scn"] is not None]
        return min(vals) if vals else None

    def shutdown(self):
        import ray

        for s in self.shards:
            ray.kill(s)
        self.shards = []


class StreamingEngine:
    """Poll-loop streaming ingest over a growing changelog directory.

    Mirrors the reference task lifecycle (``SourceTask.kt:113-150``):
    each ``poll()`` ingests newly-appeared event files, feeds change
    rows to the consolidator shards, applies any COMMIT/ROLLBACK
    markers, and returns up to ``batch_size`` released rows in commit
    order (``LogminerSource.kt:76-94`` drains one committed txn batch
    at a time).  ``run()`` loops with ``poll_interval`` pacing and
    applies released rows to the lake through the standard merge path.

    Two ingest regimes (chosen per poll by ``bulk_file_threshold``):

    * trickle (few files -- the reference's poll shape): rows buffer
      in the shard actors with per-txn disk spill past
      ``max_rows_in_memory`` (``Transaction.kt:59-71``);
    * bulk catch-up (many files -- backfill/recovery): row blocks
      stay in the object store as refs, open-txn state is a single
      vectorized ``_open_txn_fold`` task per poll (the min-open-SCN
      watermark stays exact; the actors are not involved), and
      release is a parallel filter of blocks against the poll's
      terminator map.  ``max_rows_in_memory`` does not apply here:
      plasma spills the open blocks natively.
    """

    def __init__(
        self,
        engine,
        changelog_dir: str,
        num_shards: int | None = None,
        batch_size: int = 100_000,
        poll_interval: float = 0.2,
        max_rows_in_memory: int = 100_000,
        bulk_file_threshold: int = 4,
    ):
        import ray

        if num_shards is None:
            # EngineConfig.actor_concurrency sizes the stateful pool
            num_shards = engine.config.actor_concurrency or 4
        self.engine = engine
        self.changelog_dir = changelog_dir
        self.batch_size = batch_size
        self.poll_interval = poll_interval
        self.consolidator = StreamingConsolidator(
            num_shards,
            os.path.join(engine.config.lake_dir, "state", "stream-spill"),
            max_rows_in_memory,
        )
        self.seen_files: set[str] = set()
        #: released-but-not-emitted backlog as a list of SORTED runs:
        #: ``[ref, consumed_offset, length]``.  Runs are immutable
        #: plasma objects (Ray's object store spills the backlog
        #: natively; the driver holds only refs + two ints per run) and
        #: are never re-sorted -- each poll sorts ONLY the newly
        #: released rows into one new run and k-way-selects the
        #: emission batch from bounded windows of every run's live tail
        #: (the round-2 design concat+re-sorted the WHOLE backlog every
        #: poll: O(backlog log backlog) per poll, quadratic over a
        #: stream's life).
        self._runs: list[list] = []
        #: fold run tails into one run when this many accumulate
        self._compact_after = 32
        m = engine.store.load()
        if m is None:
            raise RuntimeError("streaming needs a snapshotted lake (schema source)")
        self.watermark = m.watermark_scn
        self._schema = schemas.schema_from_json(m.schema)
        self._schema_version = m.schema_version
        self._defaults: dict[str, str] = dict(m.defaults or {})
        self._renames: dict[str, str] = dict(m.renames or {})
        self._dropped: list[str] = list(m.dropped or [])
        self._decode = ray.remote(num_returns=4)(_decode_changelog_file)
        self._fold = ray.remote(_open_txn_fold)
        #: bulk-regime open-txn state: (tx_id, min_scn) of every txn
        #: whose rows live in plasma blocks, maintained by
        #: ``_open_txn_fold`` tasks (the actors never see bulk txns)
        self._open_summary: pa.Table = _EMPTY_OPEN_SUMMARY
        self._open_summary_ref = None  # pending fold output, if any
        #: True once the trickle path has fed rows into the shard
        #: actors -- only then do terminators need actor round-trips
        self._actors_dirty = False
        self._sort = ray.remote(num_returns=2)(_sort_run)
        self._compact = ray.remote(num_returns=2)(_compact_runs)
        self._emit = ray.remote(num_returns=2)(_emit_from_runs)
        self._count = ray.remote(_count_rows)
        self._summary = ray.remote(_txn_summary)
        self._release = ray.remote(num_returns=3)(_release_filter)
        #: bulk catch-up: buffered-rows blocks kept as plasma refs,
        #: released by `_release_filter` tasks instead of actor
        #: round-trips (the object store natively spills these)
        self._open_blocks: list = []
        #: a poll ingesting >= this many files uses the bulk path
        self.bulk_file_threshold = bulk_file_threshold

    def _refresh_schema(self, paths: list[str]) -> None:
        """Mid-stream schema evolution (reference SchemaService
        refresh-on-mismatch, ChangingTableTest.kt:42-93): unify the
        current schema with any new image-struct fields the incoming
        files carry.  Older rows buffered in shard actors or pending
        refs null-fill the new columns at concat/align time."""
        from logminer_kafka_connect_ray.stages.evolve import (
            discover_image_fields,
            unify_with,
        )

        fields = discover_image_fields(paths)
        if self.engine.config.changelog_format == "redo_sql":
            # redo statements carry no type info; the _catalog.json
            # dictionary sidecar is the refresh source (same as the
            # batch plan path, stages/evolve.py catalog_fields)
            from logminer_kafka_connect_ray.stages.evolve import catalog_fields

            fields = fields + catalog_fields(paths)
        schema, changed = unify_with(self._schema, fields)
        # DDL defaults/renames/drops discovered mid-stream flow into the
        # next poll's published manifest (same sidecar source and
        # add-new+keep-old rename policy as the batch plan)
        from logminer_kafka_connect_ray.stages.evolve import (
            apply_renames,
            catalog_defaults,
            catalog_dropped,
            catalog_renames,
        )

        self._renames.update(catalog_renames(paths))
        for c in catalog_dropped(paths):
            if c not in self._dropped:
                self._dropped.append(c)
        schema, ren_changed = apply_renames(schema, self._renames)
        if changed or ren_changed:
            self._schema = schema
            self._schema_version += 1
        new_defaults = catalog_defaults(paths)
        if new_defaults:
            self._defaults.update(new_defaults)

    def _poll_ref(self):
        """One reference-style poll: ingest new files (decoded in Ray
        TASKS -- never in the driver), release committed rows, and
        return ``(batch_ref, n_rows)`` for <= batch_size rows in
        (commit_scn, scn) order.  The driver handles only refs and the
        tiny marker tables."""
        import ray

        released, _hi, _counts, _pre, _def = self._ingest()
        return self._emit_sorted(released)

    def _ingest(self, apply_form: bool = False):
        """Ingest newly-appeared files: decode in parallel Ray tasks,
        then apply feed -> terminate PER FILE in SCN-file order.
        Returns ``(released_refs, max_commit_scn_or_None, counts,
        preformed)`` where ``counts`` aligns with the refs (int where
        the row count is already known driver-side, None where it
        isn't) and ``preformed`` flags refs already in lake-apply form
        (aligned+combined+``_part``-stamped inside the release task --
        only when ``apply_form=True``, the ``run()`` path); the driver
        touches only refs and the tiny marker tables."""
        import ray

        tm: dict[str, float] = {}
        t_phase = time.monotonic()
        new = [
            f
            for f in sorted(os.listdir(self.changelog_dir))
            if f.endswith(".parquet") and f not in self.seen_files
        ]
        feed_refs = []
        released = []  # this poll's newly released tables (refs)
        terminator_parts = []  # this poll's (tx_id, commit_scn|null) map
        hi_commit = None
        auto_idx: list[int] = []
        auto_n_refs: list = []
        summary_refs: list = []
        if new:
            paths = [os.path.join(self.changelog_dir, f) for f in new]
            self._refresh_schema(paths)
            schema_json = schemas.schema_to_json(self._schema)
            decoded = []
            for name, path in zip(new, paths):
                self.seen_files.add(name)
                cfg = self.engine.config
                decoded.append(
                    self._decode.remote(
                        path,
                        schema_json,
                        cfg.key_column,
                        self.watermark,
                        cfg.transform,
                        cfg.changelog_format,
                        cfg.db_timezone,
                        (f"{cfg.lake_dir}/dead_letters"
                         if cfg.dead_letter else None),
                        cfg.table_whitelist,
                    )
                )
            # Apply feed -> terminate PER FILE, in SCN-file order
            # (decode itself stays fully parallel above).  Per-shard
            # actor-task submission order guarantees a file's buffered
            # rows land before its terminators run, and a marker in
            # file i can only commit rows from files <= i (commit scn
            # > all its change scns), so no global feed barrier is
            # needed.  This keeps shard buffers OPEN-TXN-sized: the
            # old apply-all-markers-after-all-feeds shape made a poll
            # that catches up on many files buffer EVERY row before
            # releasing any, spilling millions of rows that were about
            # to be released anyway.
            # Bulk catch-up regime (many files in one poll -- initial
            # backfill or recovery): buffered rows would round-trip
            # ~the whole stream volume through the consolidator actors
            # only to be released moments later.  Instead the blocks
            # stay in plasma, open-txn state folds in ONE vectorized
            # task per poll (_open_txn_fold; exact min-open-SCN
            # watermark, zero actor traffic), and release is a parallel
            # filter of blocks against the poll's terminator map.  The
            # trickle regime (reference poll shape, few files) keeps
            # the actor-buffer + per-txn disk spill semantics
            # (Transaction.kt:59-71).
            bulk = len(new) >= self.bulk_file_threshold
            for auto_ref, buf_ref, markers_ref, auto_n_ref in decoded:
                auto_idx.append(len(released))
                auto_n_refs.append(auto_n_ref)
                released.append(auto_ref)
                if bulk:
                    # rows stay in plasma; open-txn bookkeeping happens
                    # in ONE _open_txn_fold task at loop end -- the
                    # actors are not involved in the bulk regime at all
                    summary_refs.append(self._summary.remote(buf_ref))
                    self._open_blocks.append(buf_ref)
                else:
                    feed_refs += self.consolidator.feed_ref(buf_ref)
                    self._actors_dirty = True
                m = ray.get(markers_ref)  # tiny: (scn, tx_id, op) only
                if m.num_rows == 0:
                    continue
                commits = m.filter(pc.equal(m.column("op"), schemas.OP_COMMIT))
                rolls = m.filter(pc.equal(m.column("op"), schemas.OP_ROLLBACK))
                if commits.num_rows:
                    c_hi = pc.max(commits.column("scn")).as_py()
                    hi_commit = c_hi if hi_commit is None else max(hi_commit, c_hi)
                # actor-resident rows come back as refs and stay refs;
                # skip the K-actor round when nothing was ever fed
                # (pure bulk catch-up: 60 files x 8 shards of no-op
                # terminate calls measured ~0.5 s at 1M txns)
                if self._actors_dirty:
                    released += self.consolidator.terminate(
                        commits.column("tx_id").to_pylist(),
                        commits.column("scn").to_pylist(),
                        rolls.column("tx_id").to_pylist(),
                    )
                terminator_parts.append(
                    pa.table(
                        {
                            "tx_id": pa.concat_arrays(
                                [
                                    commits.column("tx_id").cast(pa.string()).combine_chunks(),
                                    rolls.column("tx_id").cast(pa.string()).combine_chunks(),
                                ]
                            ),
                            "commit_scn": pa.concat_arrays(
                                [
                                    commits.column("scn").cast(pa.int64()).combine_chunks(),
                                    pa.nulls(rolls.num_rows, pa.int64()),
                                ]
                            ),
                        }
                    )
                )
        tm["ingest_loop"] = time.monotonic() - t_phase
        t_phase = time.monotonic()
        if feed_refs:
            ray.get(feed_refs)  # buffers settled before watermark reads
        tm["feed_wait"] = time.monotonic() - t_phase
        t_phase = time.monotonic()
        rel_counts: list[int | None] = [None] * len(released)
        if auto_n_refs:
            # free: every decode already completed (its markers were
            # fetched above), so these gets return immediately and the
            # run() loop needs no _count task round over the auto refs
            for i, c in zip(auto_idx, ray.get(auto_n_refs)):
                rel_counts[i] = int(c)
        preformed: list[bool] = [False] * len(released)
        deferred: list[tuple] = []  # (rel_ref, open_ref, count_ref)
        cm_tbl = (
            pa.concat_tables(terminator_parts)
            if terminator_parts
            else _EMPTY_OPEN_SUMMARY.select(["tx_id"]).append_column(
                "commit_scn", pa.array([], pa.int64())
            )
        )
        # bulk-regime open-txn bookkeeping: ONE fold task replaces the
        # per-file actor metadata round-trips (see _open_txn_fold)
        if summary_refs or (cm_tbl.num_rows and self._open_summary.num_rows):
            if self._open_summary_ref is not None:
                # a prior poll's fold is still pending; chain off it
                prev_state = self._open_summary_ref
            else:
                prev_state = self._open_summary
            self._open_summary_ref = self._fold.remote(
                prev_state, cm_tbl, *summary_refs
            )
        # release block-resident rows against this poll's terminators
        if self._open_blocks and terminator_parts:
            apply_spec = None
            if apply_form:
                data_cols = schemas.data_columns_of(
                    self._schema, self.engine.config.key_column
                )
                apply_spec = (
                    schemas.flat_change_schema(
                        self.engine.config.key_column, self._schema
                    ),
                    self.engine.config.key_column,
                    len(data_cols),
                    self.engine.config.num_partitions,
                )
            cm_ref = ray.put(cm_tbl)
            results = [
                self._release.remote(b, cm_ref, apply_spec)
                for b in self._open_blocks
            ]
            if apply_form:
                # run() path: do NOT barrier on the release counts --
                # the merge consumes the release outputs directly, so
                # release tasks overlap the merge's own exchange work
                # (the barrier serialized ~1.2s of release behind
                # ~1.0s of merge at sf0.1 catch-up volume).  run()
                # finishes the open-block bookkeeping once the counts
                # have resolved (they always have by merge end: the
                # merge consumed every release output).
                deferred = results
            else:
                counts = ray.get([r[2] for r in results])
                new_open = []
                for (rel_ref, open_ref, _), (n_rel, n_open) in zip(
                    results, counts
                ):
                    if n_rel:
                        released.append(rel_ref)
                        rel_counts.append(n_rel)
                        preformed.append(apply_form)
                    if n_open:
                        new_open.append(open_ref)
                self._open_blocks = new_open
        tm["release"] = time.monotonic() - t_phase
        self.last_poll_timings = tm
        return released, hi_commit, rel_counts, preformed, deferred

    def _emit_sorted(self, released):
        """Sorted-run bookkeeping for the commit-order ``poll()``
        surface: fold this poll's released refs into one sorted run
        and k-way-select the next emission batch."""
        import ray

        if released:
            # sort ONLY the new rows into one run; the backlog is never
            # re-sorted
            run_ref, n_ref = self._sort.remote(*released)
            n_new = ray.get(n_ref)
            if n_new:
                self._runs.append([run_ref, 0, n_new])
        if len(self._runs) > self._compact_after:
            run_ref, n_ref = self._compact.remote(
                [r[1] for r in self._runs], *[r[0] for r in self._runs]
            )
            n_live = ray.get(n_ref)
            self._runs = [[run_ref, 0, n_live]] if n_live else []
        if not self._runs:
            return None, 0
        batch_ref, counts_ref = self._emit.remote(
            self.batch_size,
            [r[1] for r in self._runs],
            *[r[0] for r in self._runs],
        )
        counts = ray.get(counts_ref)
        for r, c in zip(self._runs, counts):
            r[1] += int(c)
        self._runs = [r for r in self._runs if r[1] < r[2]]
        n = int(sum(counts))
        return (batch_ref, n) if n else (None, 0)

    def min_open_scn(self) -> int | None:
        """Global safe-offset lower bound over BOTH open-txn stores:
        the bulk regime's block-tracked summary (``_open_txn_fold``)
        and the trickle regime's shard actors (reference
        minOpenTransaction, TransactionConsolidator.kt:56-64).  A txn
        spanning both regimes is tracked in both; min over the union
        stays exact."""
        import ray

        if self._open_summary_ref is not None:
            self._open_summary = ray.get(self._open_summary_ref)
            self._open_summary_ref = None
        vals = []
        if self._open_summary.num_rows:
            vals.append(int(pc.min(self._open_summary.column("min_scn")).as_py()))
        if self._actors_dirty:
            a = self.consolidator.min_open_scn()
            if a is not None:
                vals.append(a)
        return min(vals) if vals else None

    def poll(self) -> pa.Table | None:
        """Driver-facing poll: fetches the (batch_size-bounded) batch."""
        import ray

        ref, n = self._poll_ref()
        return ray.get(ref) if n else None

    def poll_envelopes(self) -> pa.Table | None:
        """``poll()`` shaped as Debezium-envelope records -- the
        reference's per-record OUTPUT surface (op/before/after/source/
        ts_ms, ConnectSchemaFactory.kt:56-163) on the streaming side,
        with ``config.emit_tombstones`` adding the (key, null) row
        after each DELETE.  The envelope stage is rebuilt when the
        schema evolves mid-stream."""
        from logminer_kafka_connect_ray.stages.envelope import EnvelopeStage

        batch = self.poll()
        if batch is None:
            return None
        cached = getattr(self, "_env_stage", None)
        if cached is None or cached[0] != self._schema_version:
            cached = (
                self._schema_version,
                EnvelopeStage(
                    schemas.schema_to_json(self._schema),
                    self.engine.config.key_column,
                    self.engine.config.emit_tombstones,
                ),
            )
            self._env_stage = cached
        return cached[1](batch)

    def run(self, max_polls: int = 10,
            idle_polls_limit: int | None = None) -> int:
        """Poll loop applying released rows to the lake; returns rows
        applied.  Pacing per reference SourceTask.kt:142-146.

        ``idle_polls_limit``: stop after this many CONSECUTIVE polls
        that released nothing (a finite-backlog drain, e.g. catch-up
        or benchmark runs); ``None`` (default) polls to ``max_polls``
        like the reference's forever-task.

        The lake apply is ORDER-FREE: the LWW fold in the merge path
        orders per key by (commit_scn, scn, row_id), so released refs
        flow straight into a Dataset (``from_arrow_refs``) with no
        global commit-order sort -- that sort is the ``poll()``
        emission contract (the reference's Kafka drain), not a merge
        prerequisite, and funneling the whole released volume through
        the single-task sorted-run machinery made catch-up polls
        driver-shaped (53 s sorting one 450k-row x html-payload run
        measured at 10x file backlog)."""
        import ray
        import ray.data as rd

        applied = 0
        idle = 0
        for _ in range(max_polls):
            released, hi_commit, known, preformed, deferred = self._ingest(
                apply_form=True
            )
            # drain any backlog left by interleaved poll() usage first
            if self._runs:
                batch_ref, n = self._emit_sorted([])
                if n:
                    released.append(batch_ref)
                    known.append(n)
                    preformed.append(False)
            if not released and not deferred:
                idle += 1
                if idle_polls_limit is not None and idle >= idle_polls_limit:
                    break
                time.sleep(self.poll_interval)
                continue
            t_phase = time.monotonic()
            counts = list(known)
            todo = [i for i, c in enumerate(counts) if c is None]
            for i, c in zip(
                todo, ray.get([self._count.remote(released[i]) for i in todo])
            ):
                counts[i] = c
            n_known = int(sum(counts))
            # Deferred (bulk) release outputs: wait only until the
            # FIRST nonzero released count proves the merge has work --
            # the remaining release tasks overlap the merge itself.
            # If every count resolves zero this degenerates to the old
            # full barrier (all tasks are done), and the open-block
            # bookkeeping happens right here before idling.
            any_rows = n_known > 0
            if deferred and not any_rows:
                cref_to_i = {r[2]: i for i, r in enumerate(deferred)}
                resolved: dict[int, tuple] = {}
                pend = [r[2] for r in deferred]
                while not any_rows and pend:
                    done, pend = ray.wait(pend, num_returns=1)
                    got = tuple(ray.get(done[0]))
                    resolved[cref_to_i[done[0]]] = got
                    any_rows = got[0] > 0
                if not any_rows:
                    # all release counts are zero and fully resolved
                    self._open_blocks = [
                        r[1]
                        for i, r in enumerate(deferred)
                        if resolved[i][1]
                    ]
                    deferred = []
            self.last_poll_timings["counts"] = time.monotonic() - t_phase
            live = [r for r, c in zip(released, counts) if c]
            live_pre = [p for p, c in zip(preformed, counts) if c]
            if not any_rows:
                idle += 1
                if idle_polls_limit is not None and idle >= idle_polls_limit:
                    break
                time.sleep(self.poll_interval)
                continue
            idle = 0
            t_phase = time.monotonic()
            prev = self.engine.store.load()
            self.last_poll_timings["t_store"] = time.monotonic() - t_phase
            # Conservative resumable watermark (reference holds the
            # offset at min(scn, minOpenTransaction.minScn),
            # TransactionConsolidator.kt:56-64): rows of still-open
            # txns exist only in shard-actor memory, so the published
            # watermark must not pass them -- after a restart
            # _decode_file re-feeds everything above the watermark and
            # the idempotent LWW merge absorbs re-applied rows.  hi is
            # the max COMMIT scn this ingest saw: any row above it is
            # either open (min_open clamps below it), rolled back
            # (discarded -- no re-read needed), or autocommit
            # (re-feeding after restart is absorbed idempotently).
            min_open = self.min_open_scn()
            self.last_poll_timings["t_minopen"] = (
                time.monotonic() - t_phase
            )
            hi = self.watermark if hi_commit is None else hi_commit
            safe_hi = hi if min_open is None else min(hi, min_open - 1)
            new_wm = max(self.watermark, safe_hi)
            from logminer_kafka_connect_ray.stages.evolve import align_flat
            from logminer_kafka_connect_ray.stages.merge import PreaggPartitioner

            data_cols = schemas.data_columns_of(
                self._schema, self.engine.config.key_column
            )
            flat_schema = schemas.flat_change_schema(
                self.engine.config.key_column, self._schema
            )
            preagg = PreaggPartitioner(
                self.engine.config.key_column,
                len(data_cols),
                self.engine.config.num_partitions,
            )
            # Bulk-released refs are already in apply form (aligned +
            # combined + _part-stamped inside the release task -- zero
            # further passes over that volume).  Raw refs (auto-commit
            # rows, trickle actor releases, interleaved-poll backlog)
            # get ONE fused whole-block pass: align (rows decoded
            # before a mid-stream column add null-fill the new
            # columns) + dominance combiner + _part stamp.  Fused and
            # zero-copy-batched because the default 1024-row batch
            # slicing re-materialized the html payloads twice per poll
            # (the r3 streaming-vs-batch gap's main term).
            raw = [r for r, p in zip(live, live_pre) if not p]
            pre = [r for r, p in zip(live, live_pre) if p]
            # deferred release outputs go in unconditionally (empties
            # carry the apply schema); their counts resolve during the
            # merge, which consumes every one of them
            pre += [r[0] for r in deferred]
            parts = []
            if raw:
                parts.append(
                    rd.from_arrow_refs(raw).map_batches(
                        lambda t, s=flat_schema, p=preagg: p(align_flat(t, s)),
                        batch_format="pyarrow",
                        batch_size=None,
                        zero_copy_batch=True,
                    )
                )
            if pre:
                parts.append(rd.from_arrow_refs(pre))
            apply_ds = parts[0] if len(parts) == 1 else parts[0].union(
                *parts[1:]
            )
            self.last_poll_timings["pre_merge"] = time.monotonic() - t_phase
            t_phase = time.monotonic()
            self.engine._merge_and_publish(
                apply_ds,
                version=prev.version + 1,
                phase="cdc-stream",
                table_schema=self._schema,
                schema_version=self._schema_version,
                scn_lo=self.watermark,
                scn_hi=new_wm,
                prev=prev,
                open_spill=None,
                markers_stats=(0, 0, 0),
                pre_partitioned=True,
                defaults=dict(self._defaults),
                renames=dict(self._renames),
                dropped=list(self._dropped),
            )
            self.last_poll_timings["merge"] = time.monotonic() - t_phase
            # post-merge bookkeeping: every deferred count has resolved
            # (the merge consumed each release output), so this get is
            # instant -- it is the accounting the pre-merge barrier
            # used to do, moved past the overlapped work
            if deferred:
                cts = ray.get([r[2] for r in deferred])
                n_known += int(sum(c[0] for c in cts))
                self._open_blocks = [
                    r[1] for r, c in zip(deferred, cts) if c[1]
                ]
            applied += n_known
            #: telemetry: phase timings of the most recent poll that
            #: actually applied rows (idle polls overwrite
            #: last_poll_timings with zeros)
            self.last_busy_poll_timings = dict(self.last_poll_timings)
            self.watermark = new_wm
        return applied

    def shutdown(self):
        self.consolidator.shutdown()
