"""Transaction consolidation (batch-replay mode).

Re-expresses the reference's ``TransactionConsolidator`` + ``Transaction``
(``logminer/TransactionConsolidator.kt:19-116``,
``logminer/Transaction.kt:17-145``): change rows are buffered per
transaction id, emitted only once a COMMIT marker for their txn is seen
(stamped with the commit SCN so emission order = commit order), and
discarded on ROLLBACK.  Snapshot READ rows and rows outside any
transaction auto-commit at their own SCN
(``initial/TableFetcher.kt:58-69``: tx_id = 'NOT AVAILABLE').

Batch-replay shape (SURVEY.md T1 "at 10^10 scale"):

1. ``collect_txn_info`` -- a parallel column-pruned scan (one Ray task
   per event file, (scn, tx_id, op) only) producing the micro-batch's
   txn metadata: commit SCN per txn, rollback set, open-txn set, and
   the min-open-SCN watermark (reference ``minOpenTransaction``,
   ``TransactionConsolidator.kt:56-64``).
2. The metadata is broadcast via ``ray.put`` as SORTED uint64 tx-id
   hashes + aligned SCNs; workers resolve each change row's commit SCN
   with ``np.searchsorted`` -- a broadcast hash semi-join with zero
   per-worker index-build cost, instead of an all-to-all shuffle on
   tx_id.  (FNV-1a 64-bit hashes; micro-batches are bounded by
   ``max_events_per_checkpoint``, keeping the collision probability
   ~(markers/2^32)^2 negligible.)
3. Change rows whose txn has no terminator inside the micro-batch are
   *open*: they are spilled to a carryover file and re-enter the next
   micro-batch -- this engine's version of the reference's conservative
   offset that never advances past the oldest open txn.

A long-lived actor variant for streaming mode lives in
``pipelines/streaming.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64


@dataclass
class TxnInfo:
    """Per-micro-batch transaction metadata (broadcast to workers)."""

    commit_hash: np.ndarray        # sorted uint64 hashes of committed tx ids
    commit_scn_sorted: np.ndarray  # aligned commit SCNs (int64)
    rolled_hash: np.ndarray        # sorted uint64 hashes of rolled-back tx ids
    open_hash: np.ndarray          # sorted uint64 hashes of open tx ids
    min_open_scn: int | None
    n_markers: int
    n_commit: int
    n_rolled: int
    n_open_rows: int
    n_unreadable: int = 0


def _empty_info() -> TxnInfo:
    return TxnInfo(
        np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, np.uint64),
        np.empty(0, np.uint64), None, 0, 0, 0, 0,
    )


def _scan_one(path: str, scn_lo: int | None, scn_hi: int | None) -> dict:
    """Partial txn metadata for one event file (column-pruned read)."""
    cols = ["scn", "tx_id", "op"]
    have_status = "status" in pq.ParquetFile(path).schema_arrow.names
    t = pq.read_table(path, columns=cols + (["status"] if have_status else []))
    flt = None
    if scn_lo is not None:
        flt = pc.greater(t.column("scn"), scn_lo)
    if scn_hi is not None:
        f2 = pc.less_equal(t.column("scn"), scn_hi)
        flt = f2 if flt is None else pc.and_(flt, f2)
    if flt is not None:
        t = t.filter(flt)
    op = t.column("op")
    is_commit = pc.equal(op, schemas.OP_COMMIT)
    is_rollback = pc.equal(op, schemas.OP_ROLLBACK)
    is_marker = pc.or_(is_commit, is_rollback)

    commits = t.filter(is_commit)
    c_hash = fnv1a_u64(commits.column("tx_id").cast(pa.string()))
    c_scn = commits.column("scn").to_numpy(zero_copy_only=False).astype(np.int64)
    r_hash = fnv1a_u64(
        t.filter(is_rollback).column("tx_id").combine_chunks().unique().cast(pa.string())
    )

    changes = t.filter(pc.invert(is_marker))
    if have_status:  # unreadable rows never buffer (skip path)
        changes = changes.filter(
            pc.fill_null(
                pc.not_equal(changes.column("status"), schemas.STATUS_UNREADABLE),
                True,
            )
        )
    ch_tx = changes.column("tx_id")
    real = changes.filter(
        pc.and_(
            pc.fill_null(pc.not_equal(ch_tx, schemas.NO_TXN), False),
            pc.is_valid(ch_tx),
        )
    )
    # per-file partial: min scn + row count per distinct change tx hash
    rh = fnv1a_u64(real.column("tx_id").cast(pa.string()))
    rscn = real.column("scn").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(rh, kind="stable")
    rh_s, rscn_s = rh[order], rscn[order]
    if len(rh_s):
        first = np.concatenate([[True], rh_s[1:] != rh_s[:-1]])
        starts = np.flatnonzero(first)
        tx_hash = rh_s[starts]
        tx_min_scn = np.minimum.reduceat(rscn_s, starts)
        tx_rows = np.diff(np.append(starts, len(rh_s)))
    else:
        tx_hash = np.empty(0, np.uint64)
        tx_min_scn = np.empty(0, np.int64)
        tx_rows = np.empty(0, np.int64)
    # dead-letter accounting: unreadable rows are skipped with a count,
    # never crash the stream (LogminerSource.kt:96-115)
    n_unreadable = 0
    if have_status:
        n_unreadable = int(
            pc.sum(
                pc.cast(
                    pc.fill_null(
                        pc.equal(t.column("status"), schemas.STATUS_UNREADABLE), False
                    ),
                    pa.int64(),
                )
            ).as_py()
            or 0
        )
    return {
        "commit_hash": c_hash, "commit_scn": c_scn, "rolled_hash": r_hash,
        "change_tx_hash": tx_hash, "change_tx_min_scn": tx_min_scn,
        "change_tx_rows": tx_rows, "n_markers": int(len(c_hash) + len(r_hash)),
        "n_unreadable": n_unreadable,
    }


def _merge_partials(*partials: dict) -> dict:
    """Associative merge of scan partials (runs in tree-merge tasks).

    Commit arrays are merged by PURE CONCAT here -- the sort +
    duplicate-marker dedup they need happens exactly once, in
    ``_finalize`` (per-level lexsorts of the ~N-commit arrays were
    pure critical-path latency; duplicate COMMITs are rare).  The
    change-txn aggregates DO reduce per level (reduceat), since txns
    spanning files collapse and that shrinks what flows up the tree."""
    commit_hash = np.concatenate([p["commit_hash"] for p in partials])
    commit_scn = np.concatenate([p["commit_scn"] for p in partials])
    ch, cs = commit_hash, commit_scn
    tx_hash = np.concatenate([p["change_tx_hash"] for p in partials])
    tx_min = np.concatenate([p["change_tx_min_scn"] for p in partials])
    tx_rows = np.concatenate([p["change_tx_rows"] for p in partials])
    order = np.argsort(tx_hash, kind="stable")
    tx_hash, tx_min, tx_rows = tx_hash[order], tx_min[order], tx_rows[order]
    if len(tx_hash):
        first = np.concatenate([[True], tx_hash[1:] != tx_hash[:-1]])
        starts = np.flatnonzero(first)
        u_hash = tx_hash[starts]
        u_min = np.minimum.reduceat(tx_min, starts)
        u_rows = np.add.reduceat(tx_rows, starts)
    else:
        u_hash, u_min, u_rows = tx_hash, tx_min, tx_rows
    return {
        "commit_hash": ch,
        "commit_scn": cs,
        "rolled_hash": np.unique(np.concatenate([p["rolled_hash"] for p in partials])),
        "change_tx_hash": u_hash,
        "change_tx_min_scn": u_min,
        "change_tx_rows": u_rows,
        "n_markers": int(sum(p["n_markers"] for p in partials)),
        "n_unreadable": int(sum(p.get("n_unreadable", 0) for p in partials)),
    }


def _finalize(merged: dict) -> TxnInfo:
    """Merged partial -> TxnInfo (open-txn detection + watermark).
    The one place commit arrays are sorted + deduped (duplicate COMMIT
    markers keep the max commit scn)."""
    ch = merged["commit_hash"]
    cs = merged["commit_scn"]
    order = np.lexsort((cs, ch))
    ch, cs = ch[order], cs[order]
    if len(ch):
        last = np.concatenate([ch[1:] != ch[:-1], [True]])
        ch, cs = ch[last], cs[last]
    rolled_hash = merged["rolled_hash"]
    u_hash = merged["change_tx_hash"]
    u_min = merged["change_tx_min_scn"]
    u_rows = merged["change_tx_rows"]
    n_markers = merged["n_markers"]
    n_unreadable = merged["n_unreadable"]

    terminated = np.concatenate([ch, rolled_hash])
    terminated.sort()
    if len(terminated):
        pos = np.searchsorted(terminated, u_hash)
        pos = np.minimum(pos, len(terminated) - 1)
        is_open = terminated[pos] != u_hash
    else:
        is_open = np.ones(len(u_hash), bool)
    open_hash = np.sort(u_hash[is_open])
    n_open_rows = int(u_rows[is_open].sum())
    min_open = int(u_min[is_open].min()) if is_open.any() else None

    return TxnInfo(
        commit_hash=ch,
        commit_scn_sorted=cs,
        rolled_hash=rolled_hash,
        open_hash=open_hash,
        min_open_scn=min_open,
        n_markers=n_markers,
        n_commit=int(len(ch)),
        n_rolled=int(len(rolled_hash)),
        n_open_rows=n_open_rows,
        n_unreadable=n_unreadable,
    )


def _scan_merge_finalize(*partials: dict) -> TxnInfo:
    return _finalize(_merge_partials(*partials))


def collect_txn_info(
    paths: list[str],
    scn_lo: int | None = None,
    scn_hi: int | None = None,
    parallel: bool = True,
) -> TxnInfo:
    """Micro-batch txn metadata (driver-local result)."""
    info, _ = collect_txn_info_ref(paths, scn_lo, scn_hi, parallel)
    return info


def collect_txn_info_ref(
    paths: list[str],
    scn_lo: int | None = None,
    scn_hi: int | None = None,
    parallel: bool = True,
    block: bool = True,
):
    """Micro-batch txn metadata as ``(TxnInfo, broadcast_ref)``.

    With a live Ray session: one scan task per file, a TREE of merge
    tasks, and a finalize task whose OUTPUT ref is handed straight to
    the workers -- the driver only fetches the (plasma-backed, shared)
    result for its own bookkeeping; big arrays never round-trip
    through a driver-side ``ray.put``.  With ``block=False`` the driver
    gets ``(None, ref)`` immediately so the scan OVERLAPS the read +
    decode phase of the pipeline (workers block on the ref only when
    the resolve stage first needs it)."""
    if not paths:
        info = _empty_info()
        return info, _try_put(info)

    if parallel and len(paths) > 1:
        try:
            import ray

            if ray.is_initialized():
                scan, merge, finalize = _remote_fns()
                refs = [scan.remote(p, scn_lo, scn_hi) for p in paths]
                # FAN=16 measured best here: merging is allocation-
                # heavy (concat of ~1M-element marker arrays), so a
                # wider fan serializes work the tree runs in parallel
                # (A/B: FAN=64 cost +2s on the 6M-event replay)
                FAN = 16
                while len(refs) > FAN:
                    refs = [
                        merge.remote(*refs[i : i + FAN])
                        for i in range(0, len(refs), FAN)
                    ]
                info_ref = finalize.remote(*refs)
                if not block:
                    return None, info_ref
                return ray.get(info_ref), info_ref
        except Exception:
            pass
    info = _finalize(
        _merge_partials(*[_scan_one(p, scn_lo, scn_hi) for p in paths])
    )
    return info, _try_put(info)


_REMOTE_FNS = None


def _remote_fns():
    """Cache the ray.remote wrappers: re-wrapping per call re-exports
    the function definitions to every worker on each micro-batch."""
    global _REMOTE_FNS
    if _REMOTE_FNS is None:
        import ray

        _REMOTE_FNS = (
            ray.remote(num_cpus=1)(_scan_one),
            ray.remote(num_cpus=1)(_merge_partials),
            ray.remote(num_cpus=1)(_scan_merge_finalize),
        )
    return _REMOTE_FNS


def _try_put(info: TxnInfo):
    try:
        import ray

        if ray.is_initialized():
            return ray.put(info)
    except Exception:
        pass
    return info


class CommitResolver:
    """``map_batches`` callable: stamp commit_scn and keep committed
    rows; ``split`` additionally returns the still-open rows of the
    same pass (single-decode spill path).

    Per batch everything is FNV hashing + ``np.searchsorted`` binary
    probes against the broadcast sorted marker hashes -- no per-worker
    hash-table build (which would be duplicated per worker and cap
    scaling)."""

    def __init__(self, txn_ref, mode: str = "committed"):
        if isinstance(txn_ref, TxnInfo):
            info = txn_ref
        else:
            import ray

            info = ray.get(txn_ref)
        self.info = info
        self.mode = mode

    def _lookup_commit(self, tx: pa.ChunkedArray):
        info = self.info
        h = fnv1a_u64(tx.cast(pa.string()))
        m = len(info.commit_hash)
        if m:
            pos = np.minimum(np.searchsorted(info.commit_hash, h), m - 1)
            hit = info.commit_hash[pos] == h
            commit = pa.array(
                info.commit_scn_sorted[pos].astype(np.int64), mask=~hit
            )
        else:
            commit = pa.nulls(len(h), pa.int64())
        if len(info.rolled_hash):
            rp = np.minimum(
                np.searchsorted(info.rolled_hash, h), len(info.rolled_hash) - 1
            )
            rolled = pa.array(info.rolled_hash[rp] == h)
        else:
            rolled = pa.array(np.zeros(len(h), bool))
        return commit, rolled

    def _resolve(self, batch: pa.Table):
        tx = batch.column("tx_id")
        # broadcast hash join tx_id -> commit scn
        commit_scn, is_rolled = self._lookup_commit(tx)
        auto = pc.fill_null(
            pc.or_(
                pc.equal(batch.column("op"), schemas.OP_READ),
                pc.or_(pc.equal(tx, schemas.NO_TXN), pc.is_null(tx)),
            ),
            False,
        )
        commit_scn = pc.if_else(auto, batch.column("scn"), commit_scn)
        # PRE-RESOLVED rows (a compacted changelog's events,
        # pipelines/compaction.py) arrive with commit_scn already
        # stamped and tx_id = NO_TXN: honor the stamp so lake lineage
        # (_commit_scn) survives compaction bit-for-bit instead of
        # degrading to the auto-commit scn
        pre = batch.column("commit_scn")
        if pre.null_count < len(pre):
            # NOT pc.coalesce: with a chunked `pre` and a flat second
            # arg arrow misaligns chunks and fabricates 0 for rows
            # where BOTH sides are null (observed pyarrow 16-21)
            if isinstance(pre, pa.ChunkedArray):
                pre = pre.combine_chunks()
            if isinstance(commit_scn, pa.ChunkedArray):
                commit_scn = commit_scn.combine_chunks()
            commit_scn = pc.if_else(pc.is_valid(pre), pre, commit_scn)
        is_committed = pc.and_(
            pc.is_valid(commit_scn), pc.invert(pc.and_(is_rolled, pc.invert(auto)))
        )
        stamped = batch.set_column(
            batch.column_names.index("commit_scn"),
            "commit_scn",
            commit_scn.combine_chunks()
            if isinstance(commit_scn, pa.ChunkedArray)
            else commit_scn,
        )
        return stamped, is_committed, is_rolled, auto

    def split(self, batch: pa.Table) -> tuple[pa.Table, pa.Table]:
        """(committed rows stamped with commit_scn, still-open rows) in
        ONE resolve pass -- the single-decode spill path: the committed
        pipeline side-writes the open rows instead of a second
        read+decode pass over the same files."""
        if batch.num_rows == 0:
            return batch, batch
        stamped, is_committed, is_rolled, auto = self._resolve(batch)
        open_mask = pc.and_(
            pc.invert(is_committed), pc.invert(pc.and_(is_rolled, pc.invert(auto)))
        )
        return stamped.filter(is_committed), batch.filter(open_mask)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        stamped, is_committed, _, _ = self._resolve(batch)
        return stamped.filter(is_committed)
