"""Transaction consolidation (batch-replay mode).

Re-expresses the reference's ``TransactionConsolidator`` + ``Transaction``
(``logminer/TransactionConsolidator.kt:19-116``,
``logminer/Transaction.kt:17-145``): change rows are buffered per
transaction id, emitted only once a COMMIT marker for their txn is seen
(stamped with the commit SCN so emission order = commit order), and
discarded on ROLLBACK.  Snapshot READ rows and rows outside any
transaction auto-commit at their own SCN
(``initial/TableFetcher.kt:58-69``: tx_id = 'NOT AVAILABLE').

Batch-replay shape (SURVEY.md T1 "at 10^10 scale"): the marker rows
(one COMMIT/ROLLBACK per txn -- orders of magnitude fewer than change
rows) are collected once per micro-batch and **broadcast** via
``ray.put``; the change stream then resolves each row's commit SCN with
a vectorized dict lookup inside ``map_batches`` -- a broadcast hash
semi-join instead of an all-to-all shuffle on tx_id.  Change rows whose
txn has no terminator inside the micro-batch are *open*: they are
spilled to a carryover file and re-enter the next micro-batch, which is
this engine's version of the reference's conservative offset
(never advance past the oldest open txn,
``TransactionConsolidator.kt:56-64``).

A long-lived actor variant for streaming mode lives in
``pipelines/streaming.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from logminer_kafka_connect_ray import schemas


def collect_markers(paths: list[str], scn_lo: int | None = None, scn_hi: int | None = None):
    """Read COMMIT/ROLLBACK marker rows from event batch files.

    Returns ``(commit_scn_by_tx: dict[str, int], rolled: set[str],
    marker_count: int)``.  Reads only (scn, tx_id, op) columns with a
    predicate pushed to the parquet scan.
    """
    if not paths:
        return {}, set(), 0
    dset = pads.dataset(paths, format="parquet")
    flt = pc.field("op").isin(list(schemas.MARKER_OPS))
    if scn_lo is not None:
        flt = flt & (pc.field("scn") > scn_lo)
    if scn_hi is not None:
        flt = flt & (pc.field("scn") <= scn_hi)
    t = dset.to_table(columns=["scn", "tx_id", "op"], filter=flt)
    ops = t.column("op").to_pylist()
    txs = t.column("tx_id").to_pylist()
    scns = t.column("scn").to_pylist()
    commit: dict[str, int] = {}
    rolled: set[str] = set()
    for op, tx, scn in zip(ops, txs, scns):
        if op == schemas.OP_COMMIT:
            commit[tx] = scn
        else:
            rolled.add(tx)
    return commit, rolled, t.num_rows


class CommitResolver:
    """``map_batches`` callable class: stamp commit_scn, split
    committed / rolled-back / open.

    ``mode='committed'`` keeps committed rows with commit_scn filled
    (the drained, ordered output of the reference consolidator);
    ``mode='open'`` keeps the still-open rows (for carryover spill).

    Instantiated per worker (actor-pool style): the broadcast marker
    maps are fetched from the object store once in ``__init__``, not
    per batch.
    """

    def __init__(self, markers_ref, mode: str = "committed"):
        import ray

        commit, rolled = (
            ray.get(markers_ref) if not isinstance(markers_ref, tuple) else markers_ref
        )
        self.commit = commit
        self.rolled = rolled
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        tx = batch.column("tx_id").to_pandas()
        commit_scn = tx.map(self.commit)
        scn_np = pc.fill_null(batch.column("scn"), 0).to_numpy(zero_copy_only=False)
        # auto-commit: snapshot READs / no-txn rows commit at their scn
        ops = batch.column("op")
        auto = pc.fill_null(
            pc.or_(
                pc.equal(ops, schemas.OP_READ),
                pc.or_(
                    pc.equal(batch.column("tx_id"), schemas.NO_TXN),
                    pc.is_null(batch.column("tx_id")),
                ),
            ),
            False,
        ).to_numpy(zero_copy_only=False)
        commit_np = commit_scn.to_numpy(dtype="float64", na_value=np.nan)
        commit_np = np.where(auto, scn_np.astype(np.float64), commit_np)
        is_rolled = tx.isin(self.rolled).to_numpy() & ~auto
        is_committed = ~np.isnan(commit_np) & ~is_rolled
        if self.mode == "committed":
            out = batch.set_column(
                batch.column_names.index("commit_scn"),
                "commit_scn",
                pa.array(
                    np.where(is_committed, commit_np, 0).astype(np.int64),
                    mask=~is_committed,
                ),
            )
            return out.filter(pa.array(is_committed))
        else:
            open_mask = ~is_committed & ~is_rolled
            return batch.filter(pa.array(open_mask))
