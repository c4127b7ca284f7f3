"""Transaction consolidation (batch-replay mode).

Re-expresses the reference's ``TransactionConsolidator`` + ``Transaction``
(``logminer/TransactionConsolidator.kt:19-116``,
``logminer/Transaction.kt:17-145``): change rows are buffered per
transaction id, emitted only once a COMMIT marker for their txn is seen
(stamped with the commit SCN so emission order = commit order), and
discarded on ROLLBACK.  Snapshot READ rows and rows outside any
transaction auto-commit at their own SCN
(``initial/TableFetcher.kt:58-69``: tx_id = 'NOT AVAILABLE').

Batch-replay shape (SURVEY.md T1 "at 10^10 scale"): marker rows (one
COMMIT/ROLLBACK per txn -- orders of magnitude fewer than change rows)
are collected once per micro-batch by a column-pruned metadata scan and
**broadcast** via ``ray.put``; the change stream then resolves each
row's commit SCN with vectorized Arrow hash lookups (``pc.index_in``)
inside ``map_batches`` -- a broadcast hash semi-join instead of an
all-to-all shuffle on tx_id.  Change rows whose txn has no terminator
inside the micro-batch are *open*: they are spilled to a carryover file
and re-enter the next micro-batch, which is this engine's version of
the reference's conservative offset (never advance past the oldest
open txn, ``TransactionConsolidator.kt:56-64``).

A long-lived actor variant for streaming mode lives in
``pipelines/streaming.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from logminer_kafka_connect_ray import schemas


@dataclass
class TxnInfo:
    """Per-micro-batch transaction metadata (broadcast to workers)."""

    commit_tx: pa.Array      # tx ids with a COMMIT marker
    commit_scn: pa.Array     # aligned commit SCNs
    rolled_tx: pa.Array      # tx ids with a ROLLBACK marker
    open_tx: pa.Array        # change-row tx ids with no terminator
    min_open_scn: int | None
    n_markers: int
    n_open_rows: int


def collect_txn_info(
    paths: list[str], scn_lo: int | None = None, scn_hi: int | None = None
) -> TxnInfo:
    """One column-pruned scan of (scn, tx_id, op) over the micro-batch's
    event files -> commit map + rollback set + open-txn set + the
    min-open-SCN watermark (reference minOpenTransaction,
    TransactionConsolidator.kt:56-64).

    Driver-side: ~3 small columns of one micro-batch (bounded by
    max_events_per_checkpoint).  For larger micro-batches this becomes
    a distributed aggregate over the same three columns.
    """
    empty_s = pa.array([], pa.string())
    if not paths:
        return TxnInfo(empty_s, pa.array([], pa.int64()), empty_s, empty_s, None, 0, 0)
    dset = pads.dataset(paths, format="parquet")
    flt = None
    if scn_lo is not None:
        flt = pc.field("scn") > scn_lo
    if scn_hi is not None:
        f2 = pc.field("scn") <= scn_hi
        flt = f2 if flt is None else (flt & f2)
    t = dset.to_table(columns=["scn", "tx_id", "op"], filter=flt)

    op = t.column("op")
    is_commit = pc.equal(op, schemas.OP_COMMIT)
    is_rollback = pc.equal(op, schemas.OP_ROLLBACK)
    is_marker = pc.or_(is_commit, is_rollback)

    commits = t.filter(is_commit)
    commit_tx = commits.column("tx_id").combine_chunks()
    commit_scn = commits.column("scn").combine_chunks()
    rolled_tx = t.filter(is_rollback).column("tx_id").combine_chunks().unique()

    changes = t.filter(pc.invert(is_marker))
    ch_tx = changes.column("tx_id")
    # auto-commit rows are never "open"
    real = changes.filter(
        pc.and_(
            pc.fill_null(pc.not_equal(ch_tx, schemas.NO_TXN), False),
            pc.is_valid(ch_tx),
        )
    )
    terminated = pa.concat_arrays(
        [commit_tx.cast(pa.string()), rolled_tx.cast(pa.string())]
    )
    open_mask = pc.invert(
        pc.is_in(real.column("tx_id"), value_set=terminated)
    )
    open_rows = real.filter(open_mask)
    open_tx = open_rows.column("tx_id").combine_chunks().unique()
    min_open = (
        pc.min(open_rows.column("scn")).as_py() if open_rows.num_rows else None
    )
    return TxnInfo(
        commit_tx=commit_tx,
        commit_scn=commit_scn,
        rolled_tx=rolled_tx,
        open_tx=open_tx.cast(pa.string()),
        min_open_scn=min_open,
        n_markers=int(pc.sum(pc.cast(is_marker, pa.int64())).as_py() or 0),
        n_open_rows=open_rows.num_rows,
    )


# backwards-compatible helper used by query pipelines
def collect_markers(paths, scn_lo=None, scn_hi=None):
    info = collect_txn_info(paths, scn_lo, scn_hi)
    commit = dict(
        zip(info.commit_tx.to_pylist(), info.commit_scn.to_pylist())
    )
    return commit, set(info.rolled_tx.to_pylist()), info.n_markers


class CommitResolver:
    """``map_batches`` callable: stamp commit_scn, keep committed rows
    (``mode='committed'``) or still-open rows (``mode='open'``).

    Instantiated per worker (actor-pool style): the broadcast TxnInfo
    is fetched from the object store once in ``__init__``; per batch
    everything is Arrow hash-kernel lookups (index_in / is_in).
    """

    def __init__(self, txn_ref, mode: str = "committed"):
        if isinstance(txn_ref, TxnInfo):
            info = txn_ref
        else:
            import ray

            info = ray.get(txn_ref)
        self.info = info
        self.mode = mode
        # pandas Index = a hash table built ONCE per actor/worker and
        # probed per batch (pc.index_in would rebuild the value_set
        # hash on every call)
        import pandas as pd

        commit_s = pd.Series(
            info.commit_scn.to_numpy(zero_copy_only=False),
            index=info.commit_tx.to_pandas(),
        )
        if not commit_s.index.is_unique:  # duplicate COMMIT markers: last wins
            commit_s = commit_s.groupby(level=0).max()
        self._commit_idx = commit_s.index
        self._commit_scn = commit_s.to_numpy()
        self._rolled_idx = pd.Index(info.rolled_tx.to_pandas()).unique()

    def _lookup_commit(self, tx: pa.ChunkedArray):
        tx_pd = tx.to_pandas()
        pos = self._commit_idx.get_indexer(tx_pd) if len(self._commit_idx) else np.full(len(tx_pd), -1)
        hit = pos >= 0
        scn = np.where(hit, self._commit_scn[np.where(hit, pos, 0)], 0)
        commit = pa.array(scn.astype(np.int64), mask=~hit)
        if len(self._rolled_idx):
            rolled = pa.array(self._rolled_idx.get_indexer(tx_pd) >= 0)
        else:
            rolled = pa.array(np.zeros(len(tx_pd), bool))
        return commit, rolled

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
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
        is_committed = pc.and_(
            pc.is_valid(commit_scn), pc.invert(pc.and_(is_rolled, pc.invert(auto)))
        )
        if self.mode == "committed":
            out = batch.set_column(
                batch.column_names.index("commit_scn"),
                "commit_scn",
                commit_scn.combine_chunks()
                if isinstance(commit_scn, pa.ChunkedArray)
                else commit_scn,
            )
            return out.filter(is_committed)
        open_mask = pc.and_(
            pc.invert(is_committed), pc.invert(pc.and_(is_rolled, pc.invert(auto)))
        )
        return batch.filter(open_mask)
