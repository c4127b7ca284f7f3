"""The LWW fold kernel: ordered per-key folding of change events.

Semantics being reproduced (SURVEY.md section 7.0): final state =
per-key fold of committed change events in ``(commit_scn, scn, row_id)``
order -- the order the reference emits (commit-order emission,
``TransactionConsolidator.kt:47-77``) combined with Kafka PK compaction.
Full images replace; partial UPDATE images coalesce column-wise
(``ConnectSchemaFactory.kt:97-104``); DELETE removes the row
(tombstone + compaction, ``ConnectSchemaFactory.kt:138-152``).

Everything here is vectorized: pyarrow multi-key stable sort + numpy
``reduceat`` segment reductions over the sorted frame + Arrow ``take``
gathers.  No Python loop touches row values.

Two entry points:

* ``preagg_block`` -- per-block *dominance pruning* run inside
  ``map_batches`` BEFORE the merge shuffle: within a block, any event at
  or before the block-local last full-image boundary (INSERT / READ /
  DELETE / full-mask UPDATE) of its key is dead -- a later total
  replacement exists in the same shuffle destination -- so only the
  boundary and later partial overlays ship.  This is the combiner that
  collapses hot-key update storms (skew handling per the north rule):
  provably safe under the global sort order because pruning only drops
  events that sort strictly before a total replacement of their key.

* ``fold_final`` -- the full fold producing final rows, run per lake
  partition at merge time over (base rows as pseudo-events) + events.
  Base rows carry their last-applied ``(_commit_scn, _scn)`` and enter
  the sort at that position, which makes re-application of an
  already-applied event a row-level no-op (reference re-read
  suppression on resume, ``logminer/LogminerFetcher.kt:19-41``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from logminer_kafka_connect_ray import schemas

SORT_KEYS = ["commit_scn", "scn", "row_id"]


def _sort_indices(t: pa.Table, key_column: str) -> pa.Array:
    return pc.sort_indices(
        t, sort_keys=[(key_column, "ascending")] + [(k, "ascending") for k in SORT_KEYS]
    )


def _group_layout(key_arr: pa.ChunkedArray | pa.Array):
    """starts / sizes of contiguous equal-key runs in a sorted column."""
    n = len(key_arr)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    arr = key_arr.combine_chunks() if isinstance(key_arr, pa.ChunkedArray) else key_arr
    neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
    change = pc.fill_null(neq, True).to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.flatnonzero(change) + 1]).astype(np.int64)
    sizes = np.diff(starts, append=n)
    return starts, sizes


def _np(col, fill=None) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if fill is not None:
        a = pc.fill_null(a, fill)
    return a.to_numpy(zero_copy_only=False)


def _boundary_masks(t: pa.Table, full_mask: int):
    op = _np(t.column("op"), "")
    mask = _np(t.column("set_mask"), 0)
    is_u = op == "u"
    is_d = op == "d"
    is_full = (op == "i") | (op == "r") | (is_u & (mask == full_mask))
    is_boundary = is_full | is_d
    return is_u, is_d, is_full, is_boundary, mask


def preagg_block(t: pa.Table, key_column: str, n_data_cols: int) -> pa.Table:
    """Block-local combiner: keep, per key, only the events that can
    still influence the final fold --

    * the block-local LAST full-image boundary (i/r/d/full-mask u):
      everything before it is a dead total replacement victim;
    * the FIRST partial overlay after that boundary (its before image
      is the fold's from-scratch fallback);
    * for each data column, the LAST overlay that sets it (earlier
      setters of the same column are overridden).

    Safe for arbitrary block subsets under the global sort order,
    assuming before-images are consistent (each event's before = the
    row state just before it -- what redo logs guarantee).  Bounds a
    hot key's contribution per block to <= 2 + n_data_cols rows no
    matter how many updates it received (the north rule's skew
    mitigation, first level of the two-level fold).
    """
    if t.num_rows <= 1:
        return t
    idx = _sort_indices(t, key_column)
    t = t.take(idx)
    full_mask = (1 << n_data_cols) - 1
    is_u, _, _, is_boundary, mask = _boundary_masks(t, full_mask)
    starts, sizes = _group_layout(t.column(key_column))
    n = t.num_rows
    pos = np.arange(n, dtype=np.int64)
    lastb = np.maximum.reduceat(np.where(is_boundary, pos, -1), starts)
    lastb_row = np.repeat(lastb, sizes)

    is_overlay = is_u & ~is_boundary & (pos > lastb_row)
    keep = pos == np.maximum(lastb_row, 0)
    keep &= lastb_row >= 0  # no boundary in block -> no boundary kept
    BIG = n + 1
    first_ov = np.minimum.reduceat(np.where(is_overlay, pos, BIG), starts)
    keep |= pos == np.repeat(first_ov, sizes)
    for i in range(n_data_cols):
        bit = ((mask >> i) & 1).astype(bool)
        lastset = np.maximum.reduceat(np.where(is_overlay & bit, pos, -1), starts)
        keep |= pos == np.repeat(np.where(lastset >= 0, lastset, -BIG), sizes)
    return t.filter(pa.array(keep))


def base_as_pseudo_events(
    base: pa.Table, table_schema: pa.Schema, key_column: str,
    defaults: dict | None = None,
    fill_from: dict[str, str] | None = None,
) -> pa.Table:
    """Lake rows -> op='r' full-image pseudo-events at their last-applied
    (commit_scn, scn) so they slot into the fold's sort order.

    ``fill_from`` (``missing_col -> source_col``): rename lineage --
    a renamed-into column fills from its source column's values.
    ``defaults`` (typed per column): a column MISSING from the base
    partition file (added after that partition's last rewrite) fills
    with its DDL default instead of null (ChangingTableTest.kt:42-93:
    Oracle gives pre-existing rows the added column's default)."""
    n = base.num_rows
    data_cols = schemas.data_columns_of(table_schema, key_column)
    full_mask = (1 << len(data_cols)) - 1
    cols = {
        key_column: base.column(key_column),
        "commit_scn": base.column("_commit_scn").cast(pa.int64()),
        "scn": base.column("_scn").cast(pa.int64()),
        # "" sorts before any real row_id -> on a tie the re-applied
        # event wins (idempotent re-apply)
        "row_id": pa.array([""] * n, pa.string()),
        "op": pa.array(["r"] * n, pa.string()),
        "set_mask": pa.array(np.full(n, full_mask, np.int64)),
    }
    for c in data_cols:
        ftype = table_schema.field(c).type
        if c in base.column_names:
            col = base.column(c)
            if col.type != ftype:
                col = col.cast(ftype)
        elif fill_from and c in fill_from and fill_from[c] in base.column_names:
            # rename lineage: renamed-into column fills from its source
            col = base.column(fill_from[c])
            if col.type != ftype:
                col = col.cast(ftype)
        elif defaults and c in defaults:
            # schema evolution with DDL DEFAULT: backfill old partition
            col = pa.repeat(pa.scalar(defaults[c], ftype), n)
        else:  # schema evolution: new column, old partition -> nulls
            col = pa.nulls(n, ftype)
        cols[f"a_{c}"] = col
        cols[f"b_{c}"] = pa.nulls(n, ftype)
    return pa.table(cols)


def fold_final(
    events: pa.Table, table_schema: pa.Schema, key_column: str
) -> pa.Table:
    """Fold a flat event table (optionally including base pseudo-events)
    into final rows: ``key, <data cols>, _commit_scn, _scn``.

    Deleted keys are absent from the output.
    """
    data_cols = schemas.data_columns_of(table_schema, key_column)
    full_mask = (1 << len(data_cols)) - 1
    need = [key_column, "commit_scn", "scn", "row_id", "op", "set_mask"]
    need += [f"a_{c}" for c in data_cols] + [f"b_{c}" for c in data_cols]
    ev = pa.table(
        {
            c: (
                events.column(c)
                if c in events.column_names
                else pa.nulls(
                    events.num_rows,
                    pa.int64()
                    if c in ("commit_scn", "scn", "set_mask")
                    else (
                        pa.string()
                        if c in (key_column, "row_id", "op")
                        else table_schema.field(c[2:]).type
                    ),
                )
            )
            for c in need
        }
    )
    out_schema = schemas.lake_schema(
        pa.schema(
            [table_schema.field(key_column)]
            + [table_schema.field(c) for c in data_cols]
        )
    )
    if ev.num_rows == 0:
        return out_schema.empty_table()

    idx = _sort_indices(ev, key_column)
    ev = ev.take(idx)
    n = ev.num_rows
    is_u, is_d, is_full, is_boundary, mask = _boundary_masks(ev, full_mask)
    starts, sizes = _group_layout(ev.column(key_column))
    pos = np.arange(n, dtype=np.int64)

    lastb = np.maximum.reduceat(np.where(is_boundary, pos, -1), starts)
    lastb_row = np.repeat(lastb, sizes)
    in_seg = pos >= lastb_row           # final segment (lastb==-1 -> all)

    # first overlay strictly after the boundary (before-image fallback
    # when the row is being built from scratch)
    BIG = n + 1
    o_pos = np.where(is_u & (pos > lastb_row), pos, BIG)
    fb_pos = np.minimum.reduceat(o_pos, starts)

    # deleted groups: final boundary is DELETE and nothing follows it
    lastb_valid = lastb >= 0
    lastb_safe = np.where(lastb_valid, lastb, 0)
    deleted = lastb_valid & is_d[lastb_safe] & (fb_pos == BIG)

    last_pos = starts + sizes - 1
    keep_g = ~deleted
    n_groups = len(starts)

    fb_idx = np.where(fb_pos < BIG, fb_pos, -1)[keep_g]
    fb_arr = pa.array(fb_idx, mask=(fb_idx < 0))

    key_sorted = ev.column(key_column).combine_chunks()
    out_cols = {key_column: key_sorted.take(pa.array(starts[keep_g]))}

    provider_full = is_full & in_seg
    for i, c in enumerate(data_cols):
        bit = ((mask >> i) & 1).astype(bool)
        prov = provider_full | (is_u & bit & in_seg)
        lastprov = np.maximum.reduceat(np.where(prov, pos, -1), starts)[keep_g]
        prov_arr = pa.array(lastprov, mask=(lastprov < 0))
        a_val = ev.column(f"a_{c}").combine_chunks().take(prov_arr)
        b_val = ev.column(f"b_{c}").combine_chunks().take(fb_arr)
        # before-image fallback ONLY when no event provided the column
        # (an explicit SET col = NULL is a provider whose value is null,
        # issues/Issue14Test.kt:93-116)
        out_cols[c] = pc.if_else(pa.array(lastprov >= 0), a_val, b_val)

    lp = pa.array(last_pos[keep_g])
    out_cols["_commit_scn"] = ev.column("commit_scn").combine_chunks().take(lp)
    out_cols["_scn"] = ev.column("scn").combine_chunks().take(lp)
    tbl = pa.table(out_cols)
    return tbl.cast(out_schema)


def fold_to_events(
    events: pa.Table, table_schema: pa.Schema, key_column: str
) -> pa.Table:
    """Changelog compaction kernel: fold a flat committed-event table
    down to ONE replay-equivalent event per key (Kafka compacted-topic
    semantics -- the reference's output topics are PK-compacted, so a
    bootstrap consumer reads exactly this shape; SURVEY.md section 7.0).

    The compacted event is chosen so that ``fold_final(base + [event])
    == fold_final(base + events)`` for ANY base state (including "no
    base row"):

    * key finally deleted (last boundary is ``d`` with no overlays
      after it) -> one ``d`` event;
    * any full-image boundary in the history (i/r/d/full-mask u) ->
      the base row cannot contribute, so emit one FULL image ``i``
      whose per-column values are the fold of the events alone
      (last provider, else the first post-boundary overlay's
      before-image -- exactly ``fold_final``'s from-scratch path);
    * overlays only -> one partial ``u`` whose set mask is the union
      of the group's (enriched) masks with the last setter's value
      per column, carrying the FIRST overlay's before image so a
      downstream fold with no base row resolves never-set columns
      the same way the uncompacted history would.

    The compacted event keeps the group's LAST ``(commit_scn, scn,
    row_id, tx_id, ts_ms, table)`` so lake lineage stamps
    (``_commit_scn``/``_scn``) and LWW arbitration against any LATER
    uncompacted tail replay are identical to the uncompacted history.

    Same vectorized shape as :func:`fold_final`: one multi-key sort +
    ``reduceat`` segment sweeps; no Python row loop.
    """
    data_cols = schemas.data_columns_of(table_schema, key_column)
    full_mask = (1 << len(data_cols)) - 1
    if events.num_rows == 0:
        return events
    idx = _sort_indices(events, key_column)
    ev = events.take(idx)
    n = ev.num_rows
    is_u, is_d, is_full, is_boundary, mask = _boundary_masks(ev, full_mask)
    starts, sizes = _group_layout(ev.column(key_column))
    pos = np.arange(n, dtype=np.int64)
    lastb = np.maximum.reduceat(np.where(is_boundary, pos, -1), starts)
    lastb_row = np.repeat(lastb, sizes)
    in_seg = pos >= lastb_row
    BIG = n + 1
    o_pos = np.where(is_u & (pos > lastb_row), pos, BIG)
    fb_pos = np.minimum.reduceat(o_pos, starts)
    lastb_valid = lastb >= 0
    lastb_safe = np.where(lastb_valid, lastb, 0)
    deleted = lastb_valid & is_d[lastb_safe] & (fb_pos == BIG)
    last_pos = starts + sizes - 1
    g = len(starts)

    is_i_g = lastb_valid & ~deleted      # full-image rebuild
    is_u_g = ~lastb_valid                # partial overlay-only group
    fb_idx = np.where(fb_pos < BIG, fb_pos, -1)
    fb_arr = pa.array(fb_idx, mask=(fb_idx < 0))

    out: dict = {
        key_column: ev.column(key_column).combine_chunks().take(pa.array(starts))
    }
    out_mask = np.zeros(g, np.int64)
    provider_full = is_full & in_seg
    for i, c in enumerate(data_cols):
        bit = ((mask >> i) & 1).astype(bool)
        prov = provider_full | (is_u & bit & in_seg)
        lastprov = np.maximum.reduceat(np.where(prov, pos, -1), starts)
        prov_arr = pa.array(lastprov, mask=(lastprov < 0))
        a_val = ev.column(f"a_{c}").combine_chunks().take(prov_arr)
        b_val = ev.column(f"b_{c}").combine_chunks().take(fb_arr)
        has_prov = pa.array(lastprov >= 0)
        # full rebuild: provider value, else before-image fallback;
        # partial: only set columns carry a value; deleted: null
        a_out = pc.if_else(has_prov, a_val, b_val)
        a_out = pc.if_else(
            pa.array(is_i_g | (lastprov >= 0)), a_out, pa.nulls(g, a_out.type)
        )
        a_out = pc.if_else(pa.array(deleted), pa.nulls(g, a_out.type), a_out)
        out[f"a_{c}"] = a_out
        # before image carried only on 'u' (the from-scratch fallback a
        # downstream fold needs when the key has no base row)
        out[f"b_{c}"] = pc.if_else(pa.array(is_u_g), b_val, pa.nulls(g, b_val.type))
        out_mask |= ((lastprov >= 0) & is_u_g).astype(np.int64) << i
    out_mask[is_i_g] = full_mask

    lp = pa.array(last_pos)
    for c in ("scn", "row_id", "commit_scn", "tx_id", "ts_ms", "table"):
        if c in ev.column_names:
            out[c] = ev.column(c).combine_chunks().take(lp)
    out["op"] = pa.array(
        np.where(deleted, "d", np.where(lastb_valid, "i", "u")), pa.string()
    )
    out["set_mask"] = pa.array(out_mask)
    cols = [f for f in events.column_names if f in out]
    return pa.table({c: out[c] for c in cols})
