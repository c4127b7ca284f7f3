"""Event-time relational operators: as-of join, gap sessionization,
tumbling-window aggregation.

These are the windowed/temporal primitives the reference's consumers
apply downstream of the connector (a CDC feed is an event stream;
Kafka-side stream processors sessionize it, window it, and as-of-join
it against dimension feeds).  Ray Data has no native as-of join or
session window, so each is built from the repo's standard exchange
primitive: stamp a key partition id, range-partition with explicit
boundaries (``sort(_p, boundaries=...)``), and run one vectorized
numpy sweep per delivered block (`SURVEY.md` section 2.8/2.9 custom
operators; same pattern as the near-dup sweeps in ``dataops.py``).

Partitioning assumption (documented per the custom-operator contract):
each stamp range arrives as ONE block.  The `_guard_record` /
`_finalize_guard` side-channel from ``dataops`` fails loudly if an
exchange ever splits a range across blocks; widths are derived from
input size via `_exchange_width`, so 100x the input grows the
exchange instead of overflowing it.

All money/value sums are computed in integer cents (``floor(value *
100)``) on BOTH the Ray side and the DuckDB oracle side: float
summation order differs between engines, integer sums do not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pandas import isna as pd_isna

from logminer_kafka_connect_ray.functions.hashing import partition_ids
from logminer_kafka_connect_ray.pipelines.dataops import (
    _exchange_width,
    _finalize_guard,
    _group_segments,
    _guard_record,
    _new_guard_dir,
    _read,
    _read_dim,
    _segment_starts,
    _table_meta,
)

_US = 1_000_000


def _ts_i64(col: pa.ChunkedArray) -> np.ndarray:
    """timestamp[us] column -> int64 microseconds (zero-copy view)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _cents(v: np.ndarray) -> np.ndarray:
    """double -> int64 floor-cents (exact; same double -> same floor
    on every engine, unlike half-even vs half-away ``round``)."""
    return np.floor(v * 100.0).astype(np.int64)


# ---------------------------------------------------------------------------
# Gap sessionization
# ---------------------------------------------------------------------------
def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Per-user gap sessions over the ``events`` table: a session
    breaks when consecutive events (ordered by ``ts, event_id``) are
    more than ``gap_minutes`` apart.  Returns one row per session:
    ``(user_id, session_idx, session_start, session_end, n_events,
    sum_value_cents)``, ``session_idx`` 1-based per user.

    Distributed shape: one hash exchange on ``user_id`` (every event
    of a user lands in the same range partition), then a single
    lexsort + ``reduceat`` sweep per block -- no per-row Python, no
    driver-side iteration; the result is session-count-sized.
    """
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gap_us = np.int64(gap_minutes * 60 * _US)
    gd = _new_guard_dir("sessionize")

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_idx", pa.int64()),
            ("session_start", pa.timestamp("us")),
            ("session_end", pa.timestamp("us")),
            ("n_events", pa.int64()),
            ("sum_value_cents", pa.int64()),
        ]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "sess", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, u))
        u, ts, cents = u[order], ts[order], cents[order]
        n = len(u)
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        brk = new_user.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, n))
        # 1-based session index per user: global session ordinal minus
        # the ordinal of the user's first session
        sess_new_user = new_user[starts]
        ordinal = np.arange(len(starts), dtype=np.int64)
        base = np.maximum.accumulate(np.where(sess_new_user, ordinal, -1))
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "session_idx": pa.array(ordinal - base + 1),
                "session_start": pa.array(ts[starts]).cast(pa.timestamp("us")),
                "session_end": pa.array(ts[starts + counts - 1]).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(counts.astype(np.int64)),
                "sum_value_cents": pa.array(np.add.reduceat(cents, starts)),
            },
            schema=out_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("session_idx", "ascending")]
        )
    )
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# Tumbling-window aggregation
# ---------------------------------------------------------------------------
def events_window_stats(sf_dir: str, window_minutes: int = 60) -> pa.Table:
    """Tumbling event-time windows over ``events``: per
    ``(event_type, window_start)`` emit ``n_events``, exact distinct
    ``n_users``, and ``sum_value_cents``.

    One hash exchange on ``(event_type, window)`` co-locates each
    window's rows, then a lexsort + ``reduceat`` sweep computes counts
    and exact distinct users per group (distinct needs co-location,
    which is why this is an exchange rather than a pure combiner
    pre-aggregation like the CDC fold's).  Result is
    window-cardinality-sized.
    """
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    win_us = np.int64(window_minutes * 60 * _US)
    gd = _new_guard_dir("winstats")

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "user_id", "value"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "_w": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "_cents": pa.array([], pa.int64()),
                    "_p": pa.array([], pa.int64()),
                }
            )
        ts = _ts_i64(t.column("ts"))
        w = (ts // win_us) * win_us
        et = t.column("event_type")
        key = pc.binary_join_element_wise(
            pc.cast(et, pa.string()),
            pc.cast(pa.array(w), pa.string()),
            "\x00",
        )
        return pa.table(
            {
                "event_type": et,
                "_w": pa.array(w),
                "user_id": t.column("user_id"),
                "_cents": pa.array(
                    _cents(t.column("value").to_numpy(zero_copy_only=False))
                ),
                "_p": pa.array(partition_ids(key, P)),
            }
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("window_start", pa.timestamp("us")),
            ("n_events", pa.int64()),
            ("n_users", pa.int64()),
            ("sum_value_cents", pa.int64()),
        ]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "win", t.column("_p").to_numpy(zero_copy_only=False)
        )
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        # dictionary-encode event_type once -> int codes for lexsort
        codes = pc.dictionary_encode(et)
        etc = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        etd = codes.dictionary
        w = t.column("_w").to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = t.column("_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, w, etc))
        etc, w, uid, cents = etc[order], w[order], uid[order], cents[order]
        n = len(w)
        brk = np.concatenate([[True], (etc[1:] != etc[:-1]) | (w[1:] != w[:-1])])
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, n))
        # exact distinct users per group: uid is sorted within group,
        # count positions where uid changes (or a group starts)
        uid_new = brk | np.concatenate([[True], uid[1:] != uid[:-1]])
        n_users = np.add.reduceat(uid_new.astype(np.int64), starts)
        return pa.table(
            {
                "event_type": etd.take(pa.array(etc[starts])),
                "window_start": pa.array(w[starts]).cast(pa.timestamp("us")),
                "n_events": pa.array(counts.astype(np.int64)),
                "n_users": pa.array(n_users),
                "sum_value_cents": pa.array(np.add.reduceat(cents, starts)),
            },
            schema=out_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(
        pc.sort_indices(
            t,
            sort_keys=[("event_type", "ascending"), ("window_start", "ascending")],
        )
    )
    return _finalize_guard(gd, t)


def events_window_sliding(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 15
) -> pa.Table:
    """HOPPING (sliding) event-time windows: every event belongs to
    ``window/hop`` overlapping windows; per ``(event_type,
    window_start)`` emit count and cents-sum.

    Distributed shape: the per-batch stamp REPLICATES each row once
    per covering window (k = window/hop copies of the tiny key
    columns only -- the fan-out happens before the exchange so the
    wide step still sees pre-bucketed keys), then the same exchange +
    reduceat sweep as the tumbling case.  Distinct users are left to
    the tumbling variant: replicating user ids k-fold is the exact
    cost sliding distinct requires, and the gate covers count/sum.
    """
    assert window_minutes % hop_minutes == 0, "window must be a multiple of hop"
    k = window_minutes // hop_minutes
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows * k)
    win_us = np.int64(window_minutes * 60 * _US)
    hop_us = np.int64(hop_minutes * 60 * _US)
    gd = _new_guard_dir("slidewin")

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("window_start", pa.timestamp("us")),
            ("n_events", pa.int64()),
            ("sum_value_cents", pa.int64()),
        ]
    )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "_w": pa.array([], pa.int64()),
                    "_cents": pa.array([], pa.int64()),
                    "_p": pa.array([], pa.int64()),
                }
            )
        ts = _ts_i64(t.column("ts"))
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        n = len(ts)
        # last hop-aligned window start covering each event, then k
        # hops backwards (windows with start > ts excluded by clip
        # below being >= 0-length check: start w satisfies
        # w <= ts < w + win  <=>  w in (ts-win, ts] hop-aligned)
        last = (ts // hop_us) * hop_us
        offs = (np.arange(k, dtype=np.int64) * hop_us)[None, :]
        w = (last[:, None] - offs).reshape(-1)
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        keep = w >= 0  # drop pre-epoch window starts
        w, idx = w[keep], idx[keep]
        et_rep = et.take(pa.array(idx))
        key = pc.binary_join_element_wise(
            pc.cast(et_rep, pa.string()),
            pc.cast(pa.array(w), pa.string()),
            "\x00",
        )
        return pa.table(
            {
                "event_type": et_rep,
                "_w": pa.array(w),
                "_cents": pa.array(cents[idx]),
                "_p": pa.array(partition_ids(key, P)),
            }
        )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "swin", t.column("_p").to_numpy(zero_copy_only=False)
        )
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = pc.dictionary_encode(et)
        etc = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("_w").to_numpy(zero_copy_only=False)
        cents = t.column("_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, etc))
        etc, w, cents = etc[order], w[order], cents[order]
        brk = np.concatenate([[True], (etc[1:] != etc[:-1]) | (w[1:] != w[:-1])])
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(w)))
        return pa.table(
            {
                "event_type": codes.dictionary.take(pa.array(etc[starts])),
                "window_start": pa.array(w[starts]).cast(pa.timestamp("us")),
                "n_events": pa.array(counts.astype(np.int64)),
                "sum_value_cents": pa.array(np.add.reduceat(cents, starts)),
            },
            schema=out_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(
        pc.sort_indices(
            t,
            sort_keys=[("event_type", "ascending"), ("window_start", "ascending")],
        )
    )
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------
def orders_asof_events(sf_dir: str) -> pa.Table:
    """As-of join: for every order, the LATEST event of the same
    customer (``events.user_id = orders.o_custkey``) with ``ts <=
    o_orderdate`` (ties on ``ts`` broken by max ``event_id``); orders
    with no prior event keep nulls (left as-of join).

    Distributed shape: tag both sides, union into ONE relation, hash
    exchange on the join key, and per block run the textbook
    vectorized as-of sweep -- lexsort by ``(key, t, side, eid)`` so
    every probe row follows exactly the events at-or-before it, then a
    single ``maximum.accumulate`` forward-fills the last event index
    (validated against the key-group start, so a fill never crosses
    keys).  No per-row Python, one shuffle, probe-count-sized output.
    """
    n_ev, _ = _table_meta(sf_dir, "events")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_ev + n_or)
    gd = _new_guard_dir("asof")

    rel_schema = pa.schema(
        [
            ("_k", pa.int64()),
            ("_t", pa.int64()),
            ("_side", pa.int8()),  # 0 = event, 1 = probe (order)
            ("_eid", pa.int64()),  # event_id, -1 on probes
            ("_etype", pa.string()),  # "" on probes
            ("_okey", pa.int64()),  # o_orderkey, -1 on events
            ("_p", pa.int64()),
        ]
    )

    def pad_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return rel_schema.empty_table()
        k = t.column("user_id").cast(pa.int64())
        return pa.table(
            {
                "_k": k,
                "_t": pa.array(_ts_i64(t.column("ts"))),
                "_side": pa.array(np.zeros(n, np.int8)),
                "_eid": t.column("event_id").cast(pa.int64()),
                "_etype": t.column("event_type").cast(pa.string()),
                "_okey": pa.array(np.full(n, -1, np.int64)),
                "_p": pa.array(partition_ids(k, P)),
            },
            schema=rel_schema,
        )

    def pad_orders(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return rel_schema.empty_table()
        k = t.column("o_custkey").cast(pa.int64())
        return pa.table(
            {
                "_k": k,
                "_t": pa.array(_ts_i64(t.column("o_orderdate"))),
                "_side": pa.array(np.ones(n, np.int8)),
                "_eid": pa.array(np.full(n, -1, np.int64)),
                "_etype": pa.array([""] * n, pa.string()),
                "_okey": t.column("o_orderkey").cast(pa.int64()),
                "_p": pa.array(partition_ids(k, P)),
            },
            schema=rel_schema,
        )

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    rel = ev.map_batches(pad_events, batch_format="pyarrow").union(
        orders.map_batches(pad_orders, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("asof_event_id", pa.int64()),
            ("asof_ts", pa.timestamp("us")),
            ("asof_event_type", pa.string()),
        ]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "asof", t.column("_p").to_numpy(zero_copy_only=False)
        )
        t = t.select(rel_schema.names).cast(rel_schema)  # re-inference safety
        k = t.column("_k").to_numpy(zero_copy_only=False)
        tt = t.column("_t").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        eid = t.column("_eid").to_numpy(zero_copy_only=False)
        # events (side 0) sort BEFORE probes at equal (k, t): an event
        # at ts == o_orderdate is eligible; eid last = max tiebreak
        order = np.lexsort((eid, side, tt, k))
        k, tt, side, eid = k[order], tt[order], side[order], eid[order]
        n = len(k)
        idx = np.arange(n, dtype=np.int64)
        marker = np.where(side == 0, idx, np.int64(-1))
        m = np.maximum.accumulate(marker)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        gstart = np.maximum.accumulate(np.where(new_key, idx, np.int64(-1)))
        probe = side == 1
        matched = probe & (m >= gstart)
        pm = m[probe]
        ok = matched[probe]
        etype_col = t.column("_etype")
        if isinstance(etype_col, pa.ChunkedArray):
            etype_col = etype_col.combine_chunks()
        etype_sorted = etype_col.take(pa.array(order))
        okey_sorted = t.column("_okey").to_numpy(zero_copy_only=False)[order]
        # matched event's sorted position per probe (0 placeholder on
        # unmatched rows -- nulled out by the if_else below)
        take_idx = np.where(ok, pm, 0)
        unmatched = pa.array(~ok)
        asof_eid = pc.if_else(
            unmatched, pa.nulls(len(ok), pa.int64()), pa.array(eid[take_idx])
        )
        asof_ts = pc.if_else(
            unmatched, pa.nulls(len(ok), pa.int64()), pa.array(tt[take_idx])
        ).cast(pa.timestamp("us"))
        asof_etype = pc.if_else(
            unmatched,
            pa.nulls(len(ok), pa.string()),
            etype_sorted.take(pa.array(take_idx)),
        )
        return pa.table(
            {
                "o_orderkey": pa.array(okey_sorted[probe]),
                "o_custkey": pa.array(k[probe]),
                "o_orderdate": pa.array(tt[probe]).cast(pa.timestamp("us")),
                "asof_event_id": asof_eid,
                "asof_ts": asof_ts,
                "asof_event_type": asof_etype,
            },
            schema=out_schema,
        )

    res = rel.sort("_p", boundaries=list(range(1, P))).map_batches(
        sweep, batch_format="pyarrow", batch_size=None
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(pc.sort_indices(t, sort_keys=[("o_orderkey", "ascending")]))
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# Range (interval) join -- aggregate form
# ---------------------------------------------------------------------------
def orders_range_join_events(sf_dir: str, window_hours: int = 24) -> pa.Table:
    """Range join: for every order, the count and cents-sum of the
    same customer's events with ``ts`` in ``(o_orderdate - window,
    o_orderdate]`` (trailing window, exclusive lower / inclusive upper
    bound).  Aggregate form -- emitting raw (order, event) pairs is
    the scale-unsafe shape; the aggregate keeps output probe-sized.

    Distributed shape: per order emit TWO probe rows into the union
    relation, one at each window bound; after the key exchange a
    single merge sweep computes the running per-key event count and
    cents cumsum (``cumsum`` reset at key-group starts), so each probe
    reads "events at-or-before me" in O(1); the window aggregate is
    the difference of its two probes, paired in-block.  Probes sort
    AFTER events at equal ts (side 1 > 0), which makes the upper bound
    inclusive and the lower bound exclusive, matching the SQL
    ``ts > lo AND ts <= hi``.
    """
    n_ev, _ = _table_meta(sf_dir, "events")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_ev + 2 * n_or)
    gd = _new_guard_dir("rangejoin")
    win_us = np.int64(window_hours * 3600 * _US)

    rel_schema = pa.schema(
        [
            ("_k", pa.int64()),
            ("_t", pa.int64()),
            ("_side", pa.int8()),   # 0 = event, 1 = probe
            ("_bound", pa.int8()),  # probes: 0 = lower, 1 = upper
            ("_cents", pa.int64()),
            ("_okey", pa.int64()),
            ("_odate", pa.int64()),
            ("_p", pa.int64()),
        ]
    )

    def pad_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return rel_schema.empty_table()
        k = t.column("user_id").cast(pa.int64())
        return pa.table(
            {
                "_k": k,
                "_t": pa.array(_ts_i64(t.column("ts"))),
                "_side": pa.array(np.zeros(n, np.int8)),
                "_bound": pa.array(np.zeros(n, np.int8)),
                "_cents": pa.array(
                    _cents(t.column("value").to_numpy(zero_copy_only=False))
                ),
                "_okey": pa.array(np.full(n, -1, np.int64)),
                "_odate": pa.array(np.full(n, -1, np.int64)),
                "_p": pa.array(partition_ids(k, P)),
            },
            schema=rel_schema,
        )

    def pad_orders(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return rel_schema.empty_table()
        k = t.column("o_custkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        od = _ts_i64(t.column("o_orderdate"))
        ok = t.column("o_orderkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        k2 = np.concatenate([k, k])
        part = partition_ids(pa.array(k2), P)
        return pa.table(
            {
                "_k": pa.array(k2),
                "_t": pa.array(np.concatenate([od - win_us, od])),
                "_side": pa.array(np.ones(2 * n, np.int8)),
                "_bound": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
                ),
                "_cents": pa.array(np.zeros(2 * n, np.int64)),
                "_okey": pa.array(np.concatenate([ok, ok])),
                "_odate": pa.array(np.concatenate([od, od])),
                "_p": pa.array(part),
            },
            schema=rel_schema,
        )

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    rel = ev.map_batches(pad_events, batch_format="pyarrow").union(
        orders.map_batches(pad_orders, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("n_events_w", pa.int64()),
            ("sum_value_cents_w", pa.int64()),
        ]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "range", t.column("_p").to_numpy(zero_copy_only=False)
        )
        t = t.select(rel_schema.names).cast(rel_schema)
        k = t.column("_k").to_numpy(zero_copy_only=False)
        tt = t.column("_t").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        cents = t.column("_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, tt, k))
        k, tt, side, cents = k[order], tt[order], side[order], cents[order]
        n = len(k)
        is_ev = side == 0
        cum_n = np.cumsum(is_ev.astype(np.int64))
        cum_c = np.cumsum(np.where(is_ev, cents, 0))
        idx = np.arange(n, dtype=np.int64)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        gstart = np.maximum.accumulate(np.where(new_key, idx, np.int64(-1)))
        # events-at-or-before within the key group: cumulative minus
        # the cumulative just before the group start
        base_n = np.where(gstart > 0, cum_n[np.maximum(gstart - 1, 0)], 0)
        base_c = np.where(gstart > 0, cum_c[np.maximum(gstart - 1, 0)], 0)
        at_n = cum_n - base_n
        at_c = cum_c - base_c
        probe = side == 1
        bound = t.column("_bound").to_numpy(zero_copy_only=False)[order][probe]
        okey = t.column("_okey").to_numpy(zero_copy_only=False)[order][probe]
        odate = t.column("_odate").to_numpy(zero_copy_only=False)[order][probe]
        pk = k[probe]
        pn, pc_ = at_n[probe], at_c[probe]
        # pair each order's two bound probes: sort by (okey, bound)
        po = np.lexsort((bound, okey))
        okey, odate, pk = okey[po], odate[po], pk[po]
        pn, pc_, bound = pn[po], pc_[po], bound[po]
        lo, hi = slice(0, None, 2), slice(1, None, 2)
        if len(okey) % 2 or not (
            np.array_equal(okey[lo], okey[hi])
            and (bound[lo] == 0).all()
            and (bound[hi] == 1).all()
        ):
            raise RuntimeError(
                "range-join probe pairing broken: an order's bound probes "
                "were not co-delivered (exchange split?)"
            )
        return pa.table(
            {
                "o_orderkey": pa.array(okey[lo]),
                "o_custkey": pa.array(pk[lo]),
                "o_orderdate": pa.array(odate[lo]).cast(pa.timestamp("us")),
                "n_events_w": pa.array(pn[hi] - pn[lo]),
                "sum_value_cents_w": pa.array(pc_[hi] - pc_[lo]),
            },
            schema=out_schema,
        )

    res = rel.sort("_p", boundaries=list(range(1, P))).map_batches(
        sweep, batch_format="pyarrow", batch_size=None
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(pc.sort_indices(t, sort_keys=[("o_orderkey", "ascending")]))
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# Grouped top-k
# ---------------------------------------------------------------------------
def events_group_topk(sf_dir: str, k: int = 3) -> pa.Table:
    """Top-``k`` events per user by ``(value DESC, event_id ASC)``.

    Two-level: a block-local combiner keeps at most ``k`` rows per
    user per block (cuts shuffle volume to ~k x users before the wide
    step), then one hash exchange on ``user_id`` and a final identical
    sweep.  Value doubles pass through untouched (no arithmetic), so
    the oracle comparison is bit-exact; descending order is
    ``-value`` (IEEE negation is exact).
    """
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("topk")

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("rank", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
        ]
    )

    def _topk(t: pa.Table, final: bool) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table() if final else t
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("value").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, -v, u))
        us = u[order]
        new_u = np.concatenate([[True], us[1:] != us[:-1]])
        idx = np.arange(len(us), dtype=np.int64)
        base = np.maximum.accumulate(np.where(new_u, idx, -1))
        rank = idx - base + 1
        keep = rank <= k
        sel = pa.array(order[keep])
        kept = t.take(sel)
        if not final:
            return kept
        return pa.table(
            {
                "user_id": kept.column("user_id").cast(pa.int64()),
                "rank": pa.array(rank[keep]),
                "event_id": kept.column("event_id").cast(pa.int64()),
                "ts": kept.column("ts"),
                "value": kept.column("value"),
            },
            schema=out_schema,
        )

    def stamp(t: pa.Table) -> pa.Table:
        t = _topk(t, final=False)
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    def final_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "topk", t.column("_p").to_numpy(zero_copy_only=False)
        )
        return _topk(t, final=True)

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(final_sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("rank", "ascending")]
        )
    )
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# Broadcast dimension join
# ---------------------------------------------------------------------------
def nation_order_stats(sf_dir: str) -> pa.Table:
    """Orders joined to their customer's nation WITHOUT a shuffle:
    the small side (customer -> nation, ~0.1% of the fact table) is
    built once on the driver, ``ray.put`` into the object store, and
    probed zero-copy inside every ``map_batches`` task (the canonical
    broadcast-join shape: at 100 TB the orders stream never moves,
    only per-block partial aggregates do).  Per nation: order count
    and total price in cents.
    """
    import ray
    import ray.data as rd  # noqa: F401

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        .to_pandas()
    )
    nat = _read_dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    n_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    # dense lookup array custkey -> nationkey (custkeys are small ints;
    # fall back would be a dict probe, but the driver-built array is
    # tiny either way and ships ONCE via ray.put)
    max_ck = int(cust["c_custkey"].max())
    lut = np.full(max_ck + 2, -1, np.int64)
    lut[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
    lut_ref = ray.put(lut)

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table, _ref=lut_ref) -> pa.Table:
        lookup = ray.get(_ref)  # zero-copy plasma view, cached per task
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        nk = lookup[np.clip(ck, 0, len(lookup) - 1)]
        cents = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        order = np.argsort(nk)
        nk, cents = nk[order], cents[order]
        brk = np.concatenate([[True], nk[1:] != nk[:-1]])
        starts = np.flatnonzero(brk)
        return pa.table(
            {
                "n_nationkey": pa.array(nk[starts]),
                "n_orders": pa.array(
                    np.diff(np.append(starts, len(nk))).astype(np.int64)
                ),
                "sum_price_cents": pa.array(np.add.reduceat(cents, starts)),
            }
        )

    parts = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("n_nationkey", as_index=False).sum()
    agg["n_name"] = agg["n_nationkey"].map(n_name)
    out = pa.table(
        {
            "n_nationkey": pa.array(agg["n_nationkey"].to_numpy(), pa.int64()),
            "n_name": pa.array(agg["n_name"], pa.string()),
            "n_orders": pa.array(agg["n_orders"].to_numpy(), pa.int64()),
            "sum_price_cents": pa.array(
                agg["sum_price_cents"].to_numpy(), pa.int64()
            ),
        }
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("n_nationkey", "ascending")])
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (the scale path for distinct
# counting; `events_window_stats` is the exact, SQL-gated sibling --
# same pairing contract as the LSH paths and their exact kernels)
# ---------------------------------------------------------------------------
_HLL_P = 12  # 4096 registers; relative error ~1.04/sqrt(m) ~ 1.6%


def _hll_registers(keys: np.ndarray, m: int = 1 << _HLL_P) -> np.ndarray:
    """One block's HLL register array from uint64 key hashes.

    Register = top ``p`` hash bits; value = 1 + leading-zero count of
    the remaining 64-p bits (capped).  Fully vectorized: the leading
    zeros come from a float64 exponent extraction (exact for the
     52-bit window, which covers every rank this sketch can store)."""
    regs = np.zeros(m, np.uint8)
    if len(keys) == 0:
        return regs
    # murmur3 finalizer: FNV-1a's high bits avalanche poorly on short
    # keys (decimal-int strings clustered into ~44 of 4096 registers),
    # which collapses the estimate; shared with the KMV sketch
    from logminer_kafka_connect_ray.functions.hashing import fmix64

    keys = fmix64(keys)
    idx = (keys >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (keys << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
    # leading zeros of `rest` via the float64 exponent of its top bits
    top = (rest >> np.uint64(11)).astype(np.float64)  # fits 53-bit mantissa
    exp = ((top.view(np.uint64) >> np.uint64(52)) & np.uint64(0x7FF)).astype(
        np.int64
    )
    nlz = 1075 - exp  # 1023 + 52 - exp = leading zeros within 53 bits
    rank = (nlz + 1).clip(1, 64 - _HLL_P + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction -- Flajolet et al. 2007."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def events_distinct_users_hll(sf_dir: str) -> pa.Table:
    """Approximate global distinct ``user_id`` count via a distributed
    HyperLogLog: each block emits its 4096-register sketch, registers
    merge by elementwise max (one tiny reduction -- NO shuffle of the
    keys themselves), and the estimator runs on the merged sketch.

    This is the 100 TB path for distinct counting: the exact
    per-window distinct in ``events_window_stats`` co-locates keys
    (one full exchange), while this moves 4 KB per block regardless
    of input size.  Accuracy (~1.6% expected) is pinned by a pytest
    against the exact count; no SQL gate because the estimate is
    approximate by construction."""
    from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64

    ds = _read(sf_dir, "events", columns=["user_id"])

    def block_sketch(t: pa.Table) -> pa.Table:
        h = fnv1a_u64(pc.cast(t.column("user_id"), pa.string()))
        return pa.table({"regs": pa.array([_hll_registers(h).tobytes()])})

    merged = np.zeros(1 << _HLL_P, np.uint8)
    for b in ds.map_batches(block_sketch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b.column("regs").to_pylist():
            np.maximum(
                merged, np.frombuffer(buf, np.uint8), out=merged
            )
    return pa.table(
        {
            "n_users_approx": pa.array([int(round(_hll_estimate(merged)))],
                                       pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Exact distributed quantiles
# ---------------------------------------------------------------------------
def events_value_quantiles(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> pa.Table:
    """EXACT discrete quantiles of ``floor(value * 100)`` cents over
    ``events`` (``quantile_disc`` semantics: the smallest element
    whose cumulative count reaches ``ceil(q * n)``).

    Distributed as a counting sort: each block emits its distinct
    ``(cents, count)`` partial (``np.unique``), a ``groupby.sum``
    merges the partials, and the driver walks the cumulative counts of
    the DISTINCT-value table only -- the wide input never leaves the
    cluster, and the driver-side work is bounded by the value domain
    (cents cardinality), not the row count.
    """
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"cents": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        c = _cents(t.column("value").to_numpy(zero_copy_only=False))
        vals, counts = np.unique(c, return_counts=True)
        return pa.table(
            {"cents": pa.array(vals), "n": pa.array(counts.astype(np.int64))}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cents")
        .sum("n")
    )
    t = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
    vals = t.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
    counts = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vals)
    vals, counts = vals[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        target = max(1, int(np.ceil(q * n)))
        pos = int(np.searchsorted(cum, target))
        out_q.append(float(q))
        out_v.append(int(vals[pos]))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()),
         "value_cents": pa.array(out_v, pa.int64())}
    )


def events_value_quantiles_cont(
    sf_dir: str, ks: tuple[int, ...] = (1, 2, 3)
) -> pa.Table:
    """EXACT continuous (interpolated) quartiles of ``floor(value *
    100)`` cents -- ``percentile_cont`` semantics at ``q = k/4``,
    kept integer-exact by reporting ``4x`` the interpolated value:
    with ``h = (n-1) * k / 4 = m + r/4``, the result is
    ``cont_x4 = 4 * v[m] + r * (v[m+1] - v[m])`` (order statistics
    0-based; ``v[m+1]`` clamps at the max).  The discrete sibling is
    ``events_value_quantiles``; this completes the family
    (disc / per-group disc / HDR-approx / cont).

    Same distributed counting-sort shape: per-block distinct
    ``(cents, count)`` partials -> ``groupby.sum`` -> the driver
    walks the DISTINCT-value cumulative only (domain-bounded, never
    row-bounded)."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"cents": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        c = _cents(t.column("value").to_numpy(zero_copy_only=False))
        vals, counts = np.unique(c, return_counts=True)
        return pa.table(
            {"cents": pa.array(vals), "n": pa.array(counts.astype(np.int64))}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cents")
        .sum("n")
    )
    t = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
    vals = t.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
    counts = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vals)
    vals, counts = vals[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0

    def v_at(pos: int) -> int:  # 0-based order statistic
        return int(vals[int(np.searchsorted(cum, pos + 1))])

    out_q, out_v = [], []
    for k in ks:
        h = (n - 1) * k
        m, r = h // 4, h % 4
        lo = v_at(m)
        hi = v_at(min(m + 1, n - 1))
        out_q.append(k * 25)
        out_v.append(4 * lo + r * (hi - lo))
    return pa.table(
        {"q_pct": pa.array(out_q, pa.int64()),
         "cont_x4": pa.array(out_v, pa.int64())}
    )


def events_type_quantiles(
    sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9)
) -> pa.Table:
    """EXACT per-GROUP discrete quantiles: for every ``event_type``,
    the p50/p90 of ``floor(value * 100)`` cents (``quantile_disc``
    semantics, same as the global `events_value_quantiles`).

    Grouped variant of the distributed counting sort: each block emits
    distinct ``(event_type, cents, count)`` partials via a composite
    ``np.unique``, a ``groupby.sum`` merges them, and the driver walks
    each group's cumulative counts -- driver work is bounded by
    (groups x distinct values), never by row count."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "cents": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        et = t.column("event_type")
        codes_arr = pc.dictionary_encode(
            et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        )
        if isinstance(codes_arr, pa.ChunkedArray):
            codes_arr = codes_arr.combine_chunks()
        cats = codes_arr.dictionary.to_pylist()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = _cents(t.column("value").to_numpy(zero_copy_only=False))
        # composite (group, value) counting via a single np.unique
        span = c.max() - c.min() + 1 if len(c) else 1
        comp = codes * span + (c - c.min())
        uniq, counts = np.unique(comp, return_counts=True)
        g = uniq // span
        v = uniq % span + c.min()
        return pa.table(
            {"event_type": pa.array([cats[int(i)] for i in g], pa.string()),
             "cents": pa.array(v.astype(np.int64)),
             "n": pa.array(counts.astype(np.int64))}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .sum("n")
    )
    df = merged.to_pandas()
    df.columns = ["event_type", "cents", "n"]
    rows_et, rows_q, rows_v = [], [], []
    for et, grp in df.groupby("event_type"):
        vals = grp["cents"].to_numpy().astype(np.int64)
        counts = grp["n"].to_numpy().astype(np.int64)
        order = np.argsort(vals)
        vals, counts = vals[order], counts[order]
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for q in qs:
            target = max(1, int(np.ceil(q * n)))
            pos = int(np.searchsorted(cum, target))
            rows_et.append(et)
            rows_q.append(float(q))
            rows_v.append(int(vals[pos]))
    out = pa.table(
        {"event_type": pa.array(rows_et, pa.string()),
         "q": pa.array(rows_q, pa.float64()),
         "value_cents": pa.array(rows_v, pa.int64())}
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("event_type", "ascending"), ("q", "ascending")]
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti join (EXISTS / NOT EXISTS against a fact stream)
# ---------------------------------------------------------------------------
def customer_order_presence(sf_dir: str) -> pa.Table:
    """Distributed semi/anti join: per market segment, how many
    customers have at least one order (semi) and how many have none
    (anti).  Returns ``(c_mktsegment, n_customers, n_with_orders,
    n_without_orders)``.

    Distributed shape (the EXISTS-probe analog of the broadcast join
    in ``nation_order_stats``): the FACT stream (orders) never
    shuffles -- each block emits its distinct ``o_custkey`` partial
    (bounded by min(block rows, |customer|)), a ``groupby.count``
    merges them into the dim-bounded distinct-key table, the driver
    packs that into a ``ray.put`` bitmap, and the customer stream is
    probed block-by-block with per-block partial counts.  Driver-side
    state is O(|customer|) bits -- the dim side by definition fits
    the broadcast pattern, the fact side stays distributed.
    """
    import ray

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        u = np.unique(t.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(u.astype(np.int64))})

    have = (
        orders.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("k")
        .count()
        .to_pandas()["k"]
        .to_numpy()
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    max_k = int(have.max()) if len(have) else 0
    bitmap = np.zeros(max_k + 2, bool)
    bitmap[have] = True
    bm_ref = ray.put(bitmap)

    def probe(t: pa.Table, _ref=bm_ref) -> pa.Table:
        bm = ray.get(_ref)  # zero-copy plasma view
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        hit = bm[np.clip(ck, 0, len(bm) - 1)]
        seg = t.column("c_mktsegment")
        segs, inv = np.unique(
            np.asarray(seg.to_pandas(), dtype=object), return_inverse=True
        )
        n = np.bincount(inv, minlength=len(segs))
        nw = np.bincount(inv, weights=hit.astype(np.float64),
                         minlength=len(segs)).astype(np.int64)
        return pa.table(
            {
                "c_mktsegment": pa.array(list(segs), pa.string()),
                "n_customers": pa.array(n.astype(np.int64)),
                "n_with_orders": pa.array(nw),
            }
        )

    parts = cust.map_batches(probe, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("c_mktsegment", as_index=False).sum()
    out = pa.table(
        {
            "c_mktsegment": pa.array(agg["c_mktsegment"], pa.string()),
            "n_customers": pa.array(agg["n_customers"].to_numpy(), pa.int64()),
            "n_with_orders": pa.array(
                agg["n_with_orders"].to_numpy(), pa.int64()
            ),
            "n_without_orders": pa.array(
                (agg["n_customers"] - agg["n_with_orders"]).to_numpy(),
                pa.int64(),
            ),
        }
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("c_mktsegment", "ascending")])
    )


# ---------------------------------------------------------------------------
# Approximate quantile sketch (HDR-histogram; scale path paired with
# the exact sibling `events_value_quantiles`, same contract as HLL)
# ---------------------------------------------------------------------------
_QSK_MBITS = 6  # 64 sub-buckets per octave -> relative error <= 2^-6


def _qsketch_bins(cents: np.ndarray) -> np.ndarray:
    """Non-negative int64 cents -> HDR-histogram bin ids (vectorized).

    bin = exponent * 64 + top-6 mantissa bits; values 0..63 map to
    their own exact bins (exponent<=6 keeps full precision), larger
    values land in a bin whose width is value * 2^-6 -- bounded
    RELATIVE error, domain-independent, fixed 64*64=4096 bins."""
    v = cents.astype(np.int64)
    if (v < 0).any():
        raise ValueError("quantile sketch is defined for non-negative values")
    f = np.maximum(v, 1).astype(np.float64)
    e = ((f.view(np.uint64) >> np.uint64(52)).astype(np.int64) & 0x7FF) - 1023
    m = _QSK_MBITS
    small = e <= m
    shift = np.maximum(e - m, 0)
    mant = (v >> shift) & ((1 << m) - 1)
    bins = np.where(small, v, e * (1 << m) + mant)
    return bins.astype(np.int64)


def _qsketch_lo(bins: np.ndarray) -> np.ndarray:
    """Bin id -> inclusive lower bound of the bin (the reported
    quantile representative)."""
    m = _QSK_MBITS
    e = bins >> m
    mant = bins & ((1 << m) - 1)
    small = e <= 1  # ids < 128 are exact values by construction
    return np.where(small, bins, ((1 << m) + mant) << np.maximum(e - m, 0))


def _merged_value_histogram(ds) -> np.ndarray:
    """Exact global HDR histogram of ``floor(value*100)`` cents over a
    dataset with a ``value`` column: each block emits one 4096-counter
    sketch (``_qsketch_bins``; 32 KB regardless of block size), and the
    driver merges them by elementwise SUM -- no key exchange, no sort.
    Shared by the quantile sketch and the global-rank range planner."""
    NB = 64 * (1 << _QSK_MBITS)

    def block_sketch(t: pa.Table) -> pa.Table:
        counts = np.zeros(NB, np.int64)
        if t.num_rows:
            c = _cents(t.column("value").to_numpy(zero_copy_only=False))
            np.add.at(counts, _qsketch_bins(c), 1)
        return pa.table({"counts": pa.array([counts.tobytes()])})

    merged = np.zeros(NB, np.int64)
    for b in ds.map_batches(block_sketch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b.column("counts").to_pylist():
            merged += np.frombuffer(buf, np.int64)
    return merged


def events_value_quantiles_approx(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> pa.Table:
    """Approximate quantiles of ``floor(value*100)`` cents via a
    distributed HDR histogram: each block emits a 4096-counter sketch
    (exponent + 6 mantissa bits per value), sketches merge by
    elementwise SUM (one 32 KB array per block -- no key exchange, no
    sort), and the driver walks the merged counters.  Relative error
    is bounded by 2^-6 ~ 1.6% regardless of domain or row count --
    the 100 TB path; ``events_value_quantiles`` is the exact,
    SQL-gated sibling (pytest pins this sketch against it)."""
    ds = _read(sf_dir, "events", columns=["value"])
    NB = 64 * (1 << _QSK_MBITS)
    merged = _merged_value_histogram(ds)

    cum = np.cumsum(merged)
    n = int(cum[-1]) if len(cum) else 0
    lo = _qsketch_lo(np.arange(NB, dtype=np.int64))
    out_q, out_v = [], []
    for q in qs:
        target = max(1, int(np.ceil(q * n)))
        pos = int(np.searchsorted(cum, target))
        out_q.append(float(q))
        out_v.append(int(lo[pos]))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()),
         "value_cents_approx": pa.array(out_v, pa.int64())}
    )


# ---------------------------------------------------------------------------
# Global ROW_NUMBER (distributed total-order rank)
# ---------------------------------------------------------------------------
def events_global_rank(sf_dir: str) -> pa.Table:
    """Exact GLOBAL ``ROW_NUMBER() OVER (ORDER BY value_cents DESC,
    event_id)`` for every event -- the distributed total-order sort
    pattern, built without ever materializing a single global sort on
    one node.

    Distributed shape (range-partition by sort key + exact prefix
    offsets):

    1. Histogram pass: each block emits a 4096-counter HDR histogram
       of its value cents (the same `_qsketch_bins` mapping the
       quantile sketch uses -- monotonic in the value, 32 KB per
       block, merged by elementwise SUM on the driver; no exchange).
    2. The driver groups CONTIGUOUS bins into P count-balanced value
       ranges and computes each range's exact base rank = total rows
       in higher-value ranges (suffix sums of the merged histogram --
       exact, because ranges are unions of whole bins and every row's
       bin is known exactly).
    3. Ranked pass: rows are stamped with their range id, one
       explicit-boundary exchange co-locates each value range, and a
       per-block numpy lexsort assigns ``rnk = base + 1..n`` locally.
       Ranks are globally exact: ranges are value-disjoint.

    Skew note: a single hot VALUE maps to one bin and therefore one
    range; the histogram bounds a range's overshoot by that one bin's
    count.  Output is row-sized (rank per input row) -- at real scale
    it streams to Parquet; the gate returns it like every gate does."""
    n_ev, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_ev)
    gd = _new_guard_dir("grank")
    # --- pass 1: exact global value histogram ------------------------
    merged = _merged_value_histogram(
        _read(sf_dir, "events", columns=["value"])
    )

    total = int(merged.sum())
    target = max(1, -(-total // P))  # ceil
    cum_excl = np.concatenate([[np.int64(0)], np.cumsum(merged)[:-1]])
    bin_range = np.minimum(cum_excl // target, P - 1).astype(np.int64)
    range_counts = np.bincount(bin_range, weights=merged, minlength=P).astype(
        np.int64
    )
    # base[r] = exact number of rows in HIGHER-value ranges (ranges
    # are ascending in value; rank orders value DESC)
    suffix = np.concatenate(
        [np.cumsum(range_counts[::-1])[::-1][1:], [np.int64(0)]]
    )

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("value_cents", pa.int64()),
            ("rnk", pa.int64()),
        ]
    )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "value_cents": pa.array([], pa.int64()),
                 "_p": pa.array([], pa.int64())}
            )
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "value_cents": pa.array(cents),
                "_p": pa.array(bin_range[_qsketch_bins(cents)]),
            }
        )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        p = t.column("_p").to_numpy(zero_copy_only=False)
        _guard_record(gd, "grank", p)
        if not (p == p[0]).all():
            raise RuntimeError(
                "global-rank sweep got a mixed-range block; base offset "
                "would be wrong (exchange merged partitions?)"
            )
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        cents = t.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -cents))
        base = int(suffix[int(p[0])])
        rnk = np.empty(len(eid), np.int64)
        rnk[order] = base + 1 + np.arange(len(eid), dtype=np.int64)
        return pa.table(
            {"event_id": pa.array(eid), "value_cents": pa.array(cents),
             "rnk": pa.array(rnk)},
            schema=out_schema,
        )

    res = (
        _read(sf_dir, "events", columns=["event_id", "value"])
        .map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(pc.sort_indices(t, sort_keys=[("rnk", "ascending")]))
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# Deterministic hash sampling (reproducible bernoulli-by-key)
# ---------------------------------------------------------------------------
def events_sample_hash(sf_dir: str, one_in: int = 20) -> pa.Table:
    """Deterministic 1-in-``one_in`` sample of ``events``: keep rows
    where ``fnv1a(decimal_string(event_id)) % one_in == 0``.

    Unlike ``Dataset.random_sample`` this is REPRODUCIBLE across
    runs, cluster sizes and block layouts (the hash depends only on
    the row key), composable (the same predicate picks the same rows
    in every derived pipeline), and embarrassingly parallel -- a
    stateless vectorized filter per block, no coordination, no RNG
    state.  The SQL oracle recomputes the FNV-1a fold byte-by-byte in
    a recursive CTE, so the sample membership itself is gate-checked.
    """
    from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64

    ds = _read(
        sf_dir, "events",
        columns=["event_id", "user_id", "event_type", "value"],
    )

    def pick(t: pa.Table) -> pa.Table:
        h = fnv1a_u64(pc.cast(t.column("event_id"), pa.string()))
        keep = (h % np.uint64(one_in)) == 0
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "value_cents": pa.array(
                    _cents(t.column("value").to_numpy(zero_copy_only=False))
                ),
            }
        )

    t = pa.Table.from_pandas(
        ds.map_batches(pick, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    return t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))


# ---------------------------------------------------------------------------
# Distributive moments (variance / correlation building block)
# ---------------------------------------------------------------------------
def events_type_moments(sf_dir: str) -> pa.Table:
    """Per-``event_type`` second-order moments of ``value`` cents --
    ``(n, sum, sum_sq)`` -- the distributive aggregate every
    variance / stddev / z-score / correlation computation reduces to.
    Moments stay INTEGER end-to-end (cents; no float summation-order
    divergence between engines); the caller derives
    ``var = (sum_sq - sum^2/n) / n`` from them in one deterministic
    division.

    Same two-level shape as the pivot: per-block lexsort + reduceat
    partials -> one dim-bounded ``groupby.sum``.  ``sum_sq`` of int64
    cents fits int64 up to ~1e8 rows x 1e5-cent values; beyond that a
    real deployment widens the partial to two limbs.  The partial
    RAISES on any |cents| >= sqrt(int64 max) (where ``c*c`` alone
    would wrap) -- out-of-domain data fails loudly, never silently."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64()),
         ("sum_cents", pa.int64()), ("sum_sq_cents", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        c = _cents(t.column("value").to_numpy(zero_copy_only=False))
        if c.size and int(np.abs(c).max()) >= 3_037_000_499:  # isqrt(2^63)
            raise ValueError(
                "events_type_moments: |value_cents| >= 3037000499 would "
                "overflow int64 in sum_sq; widen the partial to two limbs"
            )
        order, starts, counts = _group_segments(et)
        et, c = et[order], c[order]
        return pa.table(
            {"event_type": pa.array(list(et[starts]), pa.string()),
             "n": pa.array(counts.astype(np.int64)),
             "sum_cents": pa.array(np.add.reduceat(c, starts)),
             "sum_sq_cents": pa.array(np.add.reduceat(c * c, starts))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n", "sum_cents", "sum_sq_cents"])
        .to_pandas()
    )
    merged.columns = ["event_type", "n", "sum_cents", "sum_sq_cents"]
    out = pa.table(
        {"event_type": pa.array(merged["event_type"], pa.string()),
         "n": pa.array(merged["n"].astype(np.int64)),
         "sum_cents": pa.array(merged["sum_cents"].astype(np.int64)),
         "sum_sq_cents": pa.array(merged["sum_sq_cents"].astype(np.int64))}
    )
    return out.take(pc.sort_indices(out, sort_keys=[("event_type", "ascending")]))


# ---------------------------------------------------------------------------
# Semi-structured extraction (JSON payload column)
# ---------------------------------------------------------------------------
def events_props_stats(sf_dir: str) -> pa.Table:
    """Extract the integer ``k`` field from the JSON ``props`` payload
    column and aggregate it per ``event_type`` -- the semi-structured
    flatten-then-aggregate shape every web-scale event table needs
    (payloads arrive as JSON strings; typed fields are pulled out in
    flight, never materialized as a parsed column).

    Extraction is a single vectorized ``pc.extract_regex`` Arrow
    kernel over the string column (no per-row json.loads); rows whose
    payload lacks the field count as NULL (n_with_k tracks presence).
    Semantics are REGEX semantics, by contract: the first
    ``"k": <int>`` match anywhere in the payload (a nested object's
    ``k`` counts; a float's integer prefix is taken) -- and the DuckDB
    oracle restates the same regex, so the two sides agree on any
    payload shape, not just the generator's flat ``{"k": N}``.
    Aggregation is the standard two-level shape: per-block lexsort +
    reduceat partials -> one dim-bounded ``groupby.sum``."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("n_events", pa.int64()),
         ("n_with_k", pa.int64()), ("sum_k", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ex = pc.extract_regex(
            t.column("props"), pattern=r'"k"\s*:\s*(?P<k>-?\d+)'
        )
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        kvals = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        valid = pc.is_valid(kvals).to_numpy(zero_copy_only=False)
        k = kvals.fill_null(0).to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order, starts, counts = _group_segments(et)
        et, k, valid = et[order], k[order], valid[order]
        return pa.table(
            {"event_type": pa.array(list(et[starts]), pa.string()),
             "n_events": pa.array(counts.astype(np.int64)),
             "n_with_k": pa.array(
                 np.add.reduceat(valid.astype(np.int64), starts)
             ),
             "sum_k": pa.array(np.add.reduceat(k, starts))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n_events", "n_with_k", "sum_k"])
        .to_pandas()
    )
    merged.columns = ["event_type", "n_events", "n_with_k", "sum_k"]
    out = pa.table(
        {"event_type": pa.array(merged["event_type"], pa.string()),
         "n_events": pa.array(merged["n_events"].astype(np.int64)),
         "n_with_k": pa.array(merged["n_with_k"].astype(np.int64)),
         "sum_k": pa.array(merged["sum_k"].astype(np.int64))}
    )
    return out.take(pc.sort_indices(out, sort_keys=[("event_type", "ascending")]))


# ---------------------------------------------------------------------------
# Stratified deterministic sampling (per-group capped subset)
# ---------------------------------------------------------------------------
def events_stratified_sample(sf_dir: str, cap: int = 50) -> pa.Table:
    """Per-GROUP deterministic sample: for every ``event_type``, the
    ``cap`` events ranked first by FNV-1a(event_id) hash order -- the
    class-balancing primitive (equal-size per-class subsets,
    reproducible across runs and cluster sizes, no RNG state).

    Scale shape: per-block partials keep at most ``cap`` rows per
    group (lexsort + rank-within-group -- the same combiner as grouped
    top-k), so the exchange carries <= blocks x groups x cap tiny
    rows no matter how hot a class is; a final per-group sweep merges
    partials and re-ranks.  A naive group-exchange of raw rows would
    put an entire hot class in one block -- this shape never does."""
    from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64

    P = 8  # partials are cap-bounded per group per block: tiny exchange
    gd = _new_guard_dir("strat")
    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("event_id", pa.int64()),
         ("h", pa.uint64())]
    )

    def _rank_within(et: np.ndarray, h: np.ndarray, eid: np.ndarray):
        """sorted-by-(type, h, eid) order + 1-based rank per type."""
        order = np.lexsort((eid, h, et))
        starts, counts = _segment_starts(et[order])
        rnk = (
            np.arange(len(et), dtype=np.int64)
            - np.repeat(starts, counts) + 1
        )
        return order, rnk

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        h = fnv1a_u64(pc.cast(t.column("event_id"), pa.string()))
        order, rnk = _rank_within(et, h, eid)
        keep = order[rnk <= cap]
        return pa.table(
            {"event_type": pa.array(list(et[keep]), pa.string()),
             "event_id": pa.array(eid[keep]),
             "h": pa.array(h[keep], pa.uint64())},
            schema=part_schema,
        )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("event_type"), P))
        )

    out_schema = pa.schema(
        [("event_type", pa.string()), ("event_id", pa.int64()),
         ("rnk", pa.int64())]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "strat", t.column("_p").to_numpy(zero_copy_only=False))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        h = t.column("h").to_numpy(zero_copy_only=False)
        order, rnk = _rank_within(et, h, eid)
        keep = rnk <= cap
        o = order[keep]
        return pa.table(
            {"event_type": pa.array(list(et[o]), pa.string()),
             "event_id": pa.array(eid[o]),
             "rnk": pa.array(rnk[keep])},
            schema=out_schema,
        )

    res = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False).cast(out_schema)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("event_type", "ascending"), ("rnk", "ascending")]
        )
    )


# ---------------------------------------------------------------------------
# Cumulative window function (running total per key)
# ---------------------------------------------------------------------------
def events_running_total(sf_dir: str) -> pa.Table:
    """``SUM(value_cents) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` -- the cumulative window-function shape, one output
    row per input row.

    Same distributed shape as sessionization: hash exchange on
    ``user_id`` -> per-block lexsort -> segmented cumulative sum
    (one ``np.cumsum`` minus the per-segment base; no per-row
    Python).  Output is input-sized, so at 100 TB this would write
    straight to partitioned Parquet; the gate returns it whole at
    gate scale."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("runtot")
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("cum_value_cents", pa.int64()),
        ]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "runtot", t.column("_p").to_numpy(zero_copy_only=False))
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, u))
        u, eid, cents = u[order], eid[order], cents[order]
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        counts = np.diff(np.append(starts, len(u)))
        c = np.cumsum(cents)
        base = np.repeat(c[starts] - cents[starts], counts)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "cum_value_cents": pa.array(c - base),
            },
            schema=out_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False).cast(out_schema)
    t = t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))
    return _finalize_guard(gd, t)


def _fused_sweep_sink(
    sf_dir: str,
    out_dir: str | None,
    guard_tag: str,
    kernel,
    out_schema: pa.Schema,
    digest_sums: dict[str, str],
) -> pa.Table:
    """Shared corpus-scale finisher for input-sized window-function
    outputs (one output row per input event): hash exchange on
    ``user_id`` -> per-range vectorized sweep with the parquet WRITE
    FUSED INTO THE SWEEP -- each delivered block is already one
    user-hash range, so the sweep publishes its own
    ``part-{p:05d}.parquet`` via tmp+rename (NO second exchange; a
    re-run skips parts whose final file exists) and emits only a
    bounded lineage row.  The gate then reads the sink back with a
    streaming 64-bucket integer digest (:func:`~.dataops
    .bucket_digest` on ``user_id % 64``), so the check certifies the
    bytes on disk; every summed quantity is int64, bit-equal to the
    DuckDB window-function oracle wrapped in the same outer GROUP BY.

    ``kernel(u, ts_us, eid, cents)`` receives the block's rows sorted
    by ``(user_id, ts, event_id)`` and returns the output columns
    (np or pa arrays, aligned with that order) for ``out_schema``.

    With ``out_dir=None`` (the gate/bench path) the sink is a scratch
    mkdtemp REMOVED after the digest materializes; pass ``out_dir``
    to keep the sink.  ``sink_prepare`` guards parameter drift and
    cleans crashed-attempt ``.tmp-*`` orphans; the digest reads back
    only PUBLISHED part files."""
    import shutil
    import tempfile

    import ray.data as rd

    from logminer_kafka_connect_ray.pipelines.dataops import (
        bucket_digest,
        publish_part,
        sink_files,
        sink_prepare,
    )

    scratch = out_dir is None
    if scratch:
        out_dir = tempfile.mkdtemp(prefix=f"lkc-{guard_tag}-")
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    sink_prepare(out_dir, "user_id", P)
    gd = _new_guard_dir(guard_tag)
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    lineage_schema = pa.schema([("part_id", pa.int64()), ("rows", pa.int64())])

    def sweep_write(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return lineage_schema.empty_table()
        pvals = t.column("_p").to_numpy(zero_copy_only=False)
        _guard_record(gd, guard_tag, pvals)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, u))
        u, ts, eid, cents = u[order], ts[order], eid[order], cents[order]
        pv = pvals.astype(np.int64)[order]
        cols = kernel(u, ts, eid, cents)
        block = pa.table(
            {n: (c if isinstance(c, (pa.Array, pa.ChunkedArray))
                 else pa.array(c)) for n, c in cols.items()},
            schema=out_schema,
        )
        # guard asserts each _p range arrives exactly once, so one
        # file per range id is a complete, resumable unit -- but one
        # delivered block may COALESCE several small ranges, so split
        # the block's rows by their own range id before publishing
        rows = []
        for p in sorted({int(x) for x in pvals}):
            g = block.filter(pa.array(pv == p))
            publish_part(out_dir, p, g)
            rows.append({"part_id": p, "rows": g.num_rows})
        return pa.Table.from_pylist(rows, schema=lineage_schema)

    try:
        lineage = (
            ds.map_batches(stamp, batch_format="pyarrow")
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(sweep_write, batch_format="pyarrow", batch_size=None)
        )
        _finalize_guard(
            gd,
            pa.Table.from_pandas(lineage.to_pandas(), preserve_index=False),
        )
        # read back only PUBLISHED part files (never .tmp orphans)
        return bucket_digest(
            rd.read_parquet(sink_files(out_dir)), "user_id", digest_sums
        )
    finally:
        if scratch:
            shutil.rmtree(out_dir, ignore_errors=True)


def events_running_total_sink(sf_dir: str, out_dir: str | None = None) -> pa.Table:
    """Corpus-scale finisher for :func:`events_running_total` (see
    :func:`_fused_sweep_sink` for the shared fused-write/digest
    shape and its scale rationale)."""
    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("cum_value_cents", pa.int64()),
        ]
    )

    def kernel(u, ts, eid, cents):
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        counts = np.diff(np.append(starts, len(u)))
        c = np.cumsum(cents)
        base = np.repeat(c[starts] - cents[starts], counts)
        return {"event_id": eid, "user_id": u, "cum_value_cents": c - base}

    return _fused_sweep_sink(
        sf_dir, out_dir, "runtotsink", kernel, out_schema,
        {"sum_event_id": "event_id", "sum_cum_cents": "cum_value_cents"},
    )


def events_lag_delta_sink(sf_dir: str, out_dir: str | None = None) -> pa.Table:
    """Corpus-scale finisher for :func:`events_lag_delta` -- same
    fused sweep-sink shape; each user's FIRST event carries null
    gap/delta (masked in the kernel), and the digest's null-as-0
    int64 partial equals the SQL oracle's null-skipping sum()."""
    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("gap_seconds", pa.int64()),
            ("delta_value_cents", pa.int64()),
        ]
    )

    def kernel(u, ts, eid, cents):
        n = len(u)
        first = np.concatenate([[True], u[1:] != u[:-1]])
        prev_ts = np.empty(n, np.int64)
        prev_c = np.empty(n, np.int64)
        prev_ts[1:], prev_ts[0] = ts[:-1], 0
        prev_c[1:], prev_c[0] = cents[:-1], 0
        gap = (ts - prev_ts) // _US
        dlt = cents - prev_c
        mask = pa.array(first)
        return {
            "event_id": eid,
            "user_id": u,
            "gap_seconds": pc.if_else(
                mask, pa.nulls(n, pa.int64()), pa.array(gap)
            ),
            "delta_value_cents": pc.if_else(
                mask, pa.nulls(n, pa.int64()), pa.array(dlt)
            ),
        }

    return _fused_sweep_sink(
        sf_dir, out_dir, "lagsink", kernel, out_schema,
        {"sum_gap_seconds": "gap_seconds",
         "sum_delta_cents": "delta_value_cents"},
    )


# ---------------------------------------------------------------------------
# LAG window function (previous-row deltas per key)
# ---------------------------------------------------------------------------
def events_lag_delta(sf_dir: str) -> pa.Table:
    """``LAG(ts) / LAG(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` deltas -- for every event, the seconds since the same
    user's PREVIOUS event and the cents change vs it (NULL for each
    user's first event).  Completes the window-function family:
    cumulative (`events_running_total`), global rank
    (`events_global_rank`), grouped top-k, and now offset (lag/lead;
    LEAD is this sweep with the shift reversed).

    Same distributed shape as the running total: hash exchange on
    ``user_id`` -> per-block lexsort -> a one-element ``np.roll``-free
    shifted difference with the per-segment first row masked to NULL."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("lag")
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("gap_seconds", pa.int64()),
            ("delta_value_cents", pa.int64()),
        ]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "lag", t.column("_p").to_numpy(zero_copy_only=False))
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, u))
        u, ts, eid, cents = u[order], ts[order], eid[order], cents[order]
        first = np.concatenate([[True], u[1:] != u[:-1]])
        gap = np.empty(len(u), np.int64)
        dlt = np.empty(len(u), np.int64)
        gap[1:] = (ts[1:] - ts[:-1]) // _US
        dlt[1:] = cents[1:] - cents[:-1]
        gap[0] = dlt[0] = 0  # masked below
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "gap_seconds": pa.array(gap, pa.int64(), mask=first),
                "delta_value_cents": pa.array(dlt, pa.int64(), mask=first),
            },
            schema=out_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False).cast(out_schema)
    t = t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# Pivot (wide aggregation: one column per category value)
# ---------------------------------------------------------------------------
_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(sf_dir: str) -> pa.Table:
    """Per-user pivot of event counts: one row per ``user_id`` with a
    ``n_<event_type>`` column per category plus the purchase value
    total -- the wide-aggregation / pivot shape.

    Distributed as per-block partials (lexsort + ``reduceat`` per
    masked category -- no per-row Python, the block collapses to
    its distinct users) merged by one dim-bounded ``groupby.sum``;
    unknown categories fail loudly rather than dropping silently."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])
    cats = list(_PIVOT_TYPES)

    def partial(t: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64())}
        for c in cats:
            cols[f"n_{c}"] = pa.array([], pa.int64())
        cols["purchase_cents"] = pa.array([], pa.int64())
        if t.num_rows == 0:
            return pa.table(cols)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t.column("event_type").to_pandas(), dtype=object)
        unknown = ~np.isin(et, cats)
        if unknown.any():
            raise ValueError(f"unknown event_type(s): {set(et[unknown])}")
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        order = np.argsort(u, kind="stable")
        u, et, cents = u[order], et[order], cents[order]
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        out = {"user_id": pa.array(u[starts])}
        for c in cats:
            m = (et == c).astype(np.int64)
            out[f"n_{c}"] = pa.array(np.add.reduceat(m, starts))
        pm = np.where(et == "purchase", cents, 0)
        out["purchase_cents"] = pa.array(np.add.reduceat(pm, starts))
        return pa.table(out)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .sum([f"n_{c}" for c in cats] + ["purchase_cents"])
    )
    t = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
    t = t.rename_columns(
        ["user_id"] + [f"n_{c}" for c in cats] + ["purchase_cents"]
    )
    t = t.cast(
        pa.schema(
            [("user_id", pa.int64())]
            + [(f"n_{c}", pa.int64()) for c in cats]
            + [("purchase_cents", pa.int64())]
        )
    )
    return t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))


# ---------------------------------------------------------------------------
# Distributed set operations (fact-vs-fact INTERSECT / EXCEPT)
# ---------------------------------------------------------------------------
def user_custkey_set_ops(sf_dir: str) -> pa.Table:
    """Set relations between two FACT-side key sets -- distinct
    ``events.user_id`` vs distinct ``orders.o_custkey``: how many keys
    appear only in events, only in orders, and in both (INTERSECT /
    EXCEPT / EXCEPT-reversed cardinalities in one pass).

    Unlike the semi/anti probe (dim-bounded driver bitmap), BOTH sides
    here stay distributed: each side emits per-block ``(key, side_bit)``
    distinct partials, one hash exchange co-locates keys, and a
    per-block sweep ORs the side bits per key and counts the three
    classes.  Only the 3-row class-count table reaches the driver."""
    n_e, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_e)
    gd = _new_guard_dir("setops")

    ev_ds = _read(sf_dir, "events", columns=["user_id"])
    or_ds = _read(sf_dir, "orders", columns=["o_custkey"])

    def partial(col: str, bit: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"k": pa.array([], pa.int64()),
                     "side": pa.array([], pa.int64())}
                )
            u = np.unique(t.column(col).to_numpy(zero_copy_only=False))
            return pa.table(
                {"k": pa.array(u.astype(np.int64)),
                 "side": pa.array(np.full(len(u), bit, np.int64))}
            )
        return fn

    both = ev_ds.map_batches(partial("user_id", 1), batch_format="pyarrow").union(
        or_ds.map_batches(partial("o_custkey", 2), batch_format="pyarrow")
    )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column("_p", pa.array(partition_ids(t.column("k"), P)))

    out_schema = pa.schema(
        [("n_only_events", pa.int64()), ("n_only_orders", pa.int64()),
         ("n_both", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n_only_events": [0], "n_only_orders": [0], "n_both": [0]},
                schema=out_schema,
            )
        _guard_record(gd, "setops", t.column("_p").to_numpy(zero_copy_only=False))
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        side = t.column("side").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, side = k[order], side[order]
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        mask = np.bitwise_or.reduceat(side, starts)
        return pa.table(
            {
                "n_only_events": [int((mask == 1).sum())],
                "n_only_orders": [int((mask == 2).sum())],
                "n_both": [int((mask == 3).sum())],
            },
            schema=out_schema,
        )

    res = (
        both.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    parts = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    out = pa.table(
        {c: pa.array([int(pc.sum(parts.column(c)).as_py() or 0)], pa.int64())
         for c in out_schema.names},
        schema=out_schema,
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Fact-to-fact shuffle hash join
# ---------------------------------------------------------------------------
def orders_events_join(
    sf_dir: str, how: str = "inner", bloom: bool = True, salt: int = 1
) -> pa.Table:
    """Distributed inner equi-join of two FACT tables -- ``orders``
    joined to ``events`` on ``o_custkey = user_id`` -- emitting the
    joined ROWS, not an aggregate.  Completes the join family: the
    broadcast join handles a small dimension side, semi/anti handles
    existence, as-of/range handle temporal predicates; this is the
    general case where BOTH sides are too large to broadcast.

    Distributed shape (partitioned hash join): each side's rows are
    stamped with the same ``hash(key) % P`` partition id and padded
    into one union relation; a single explicit-boundary exchange
    co-locates each key's rows from both sides; a per-block numpy
    sweep then sorts the build side (orders) by key and expands the
    probe side (events) against it with a vectorized
    searchsorted + repeat cross-product -- no per-row Python, no
    driver-side key index.  Only the joined projection is emitted.

    Scale notes: join OUTPUT is inherently row-multiplied, so at real
    scale the sweep's result should flow straight to
    ``write_parquet`` (the gate returns it to the caller instead, as
    every gate does).  One KEY's full cross product must fit one
    block; a pathological hot key needs the same salting escape the
    LWW fold uses (``salt_factor``) on the smaller side.  Width P is
    data-derived (`_exchange_width`), and the `_guard_record`
    side-channel fails loudly if the exchange ever splits a key range
    across blocks.

    ``how="left"`` keeps every ORDER: build rows no probe row matched
    are emitted once with NULL event columns (the per-block matched
    mask makes this exact -- a key's rows from both sides are
    co-located by the exchange, so "unmatched in this block" IS
    "unmatched globally").

    ``how="full"`` additionally keeps every EVENT: probe rows with no
    build match are emitted once with NULL order columns (the same
    per-block exactness argument).

    Shuffle pruning: a build-side BLOOM filter (one pruned key-column
    pass; 1 MiB constant regardless of cardinality, per-block bitmaps
    OR-merged then ``ray.put`` once) drops probe rows whose key
    definitely has no match BEFORE they enter the exchange -- at
    scale, probe rows that would join to nothing are pure shuffle
    waste.  No false negatives, so results are bit-identical with
    ``bloom=False``; left-join semantics are unaffected (only probe
    rows are dropped, never build rows).  Bloom is auto-disabled for
    ``how="full"`` -- a full join must KEEP unmatched probe rows.

    ``salt > 1`` splits each HOT KEY across ``salt`` exchange ranges
    (the same escape hatch the LWW fold's ``salt_factor`` provides):
    build rows replicate to every salt lane, each probe row goes to
    exactly ONE deterministic lane (``fnv(event_id) % salt``), so
    every (build, probe) pair still meets exactly once and the output
    is bit-identical -- at ``salt``x the build-side exchange volume.
    Inner-join only: a replicated build row's per-lane "unmatched"
    state is no longer global, so left/full outer need the unsalted
    path."""
    if how not in ("inner", "left", "full"):
        raise ValueError(f"how={how!r}: expected 'inner', 'left' or 'full'")
    if salt > 1 and how != "inner":
        raise ValueError(
            "salt>1 requires how='inner': outer joins derive unmatched "
            "rows per block, which salting makes non-global"
        )
    if how == "full":
        bloom = False
    if salt < 1:
        raise ValueError("salt must be >= 1")
    n_ev, _ = _table_meta(sf_dir, "events")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_ev + n_or * max(1, salt))
    if salt > P:
        raise ValueError(f"salt={salt} must be <= exchange width P={P} "
                         "(lane spreading needs distinct ranges)")
    gd = _new_guard_dir("hashjoin")

    rel_schema = pa.schema(
        [
            ("_k", pa.int64()),
            ("_side", pa.int8()),    # 0 = build (orders), 1 = probe (events)
            ("_id", pa.int64()),     # o_orderkey | event_id
            ("_cents", pa.int64()),  # o_totalprice | value, floor-cents
            ("_p", pa.int64()),
        ]
    )

    _GOLD = 2654435761  # odd constant spreading salt lanes over ranges

    def pad_orders(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return rel_schema.empty_table()
        k = t.column("o_custkey").cast(pa.int64())
        pid = partition_ids(k, P)
        kv = k.to_numpy(zero_copy_only=False) if salt > 1 else None
        oid = t.column("o_orderkey").cast(pa.int64())
        cents = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        if salt > 1:
            # build rows replicate to every salt lane of their key
            lanes = np.tile(np.arange(salt, dtype=np.int64), n)
            kv = np.repeat(kv, salt)
            pid = (np.repeat(pid, salt) + lanes * _GOLD) % P
            return pa.table(
                {
                    "_k": pa.array(kv),
                    "_side": pa.array(np.zeros(n * salt, np.int8)),
                    "_id": pa.array(
                        np.repeat(oid.to_numpy(zero_copy_only=False), salt)
                    ),
                    "_cents": pa.array(np.repeat(cents, salt)),
                    "_p": pa.array(pid),
                },
                schema=rel_schema,
            )
        return pa.table(
            {
                "_k": k,
                "_side": pa.array(np.zeros(n, np.int8)),
                "_id": oid,
                "_cents": pa.array(cents),
                "_p": pa.array(pid),
            },
            schema=rel_schema,
        )

    def pad_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return rel_schema.empty_table()
        k = t.column("user_id").cast(pa.int64())
        pid = partition_ids(k, P)
        if salt > 1:
            # each probe row picks exactly ONE deterministic lane
            from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64

            lane = (
                fnv1a_u64(pc.cast(t.column("event_id"), pa.string()))
                % np.uint64(salt)
            ).astype(np.int64)
            pid = (pid + lane * _GOLD) % P
        return pa.table(
            {
                "_k": k,
                "_side": pa.array(np.ones(n, np.int8)),
                "_id": t.column("event_id").cast(pa.int64()),
                "_cents": pa.array(
                    _cents(t.column("value").to_numpy(zero_copy_only=False))
                ),
                "_p": pa.array(pid),
            },
            schema=rel_schema,
        )

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    bloom_ref = None
    if bloom:
        import ray

        from logminer_kafka_connect_ray.functions.hashing import bloom_block

        def block_bloom(t: pa.Table) -> pa.Table:
            return pa.table(
                {"bits": pa.array([bloom_block(t.column("o_custkey"))])}
            )

        words = None
        for b in (
            _read(sf_dir, "orders", columns=["o_custkey"])
            .map_batches(block_bloom, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            for buf in b.column("bits").to_pylist():
                w = np.frombuffer(buf, np.uint64)
                words = w.copy() if words is None else np.bitwise_or(words, w)
        if words is not None:
            bloom_ref = ray.put(words)

    def prefilter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or bloom_ref is None:
            return t
        import ray

        from logminer_kafka_connect_ray.functions.hashing import bloom_probe

        mask = bloom_probe(ray.get(bloom_ref), t.column("user_id"))
        return t.filter(pa.array(mask))

    probe_ds = ev
    if bloom_ref is not None:
        probe_ds = ev.map_batches(prefilter, batch_format="pyarrow")
    rel = orders.map_batches(pad_orders, batch_format="pyarrow").union(
        probe_ds.map_batches(pad_events, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("event_id", pa.int64()),
            ("o_total_cents", pa.int64()),
            ("value_cents", pa.int64()),
        ]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "hj", t.column("_p").to_numpy(zero_copy_only=False))
        t = t.select(rel_schema.names).cast(rel_schema)
        k = t.column("_k").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        rid = t.column("_id").to_numpy(zero_copy_only=False)
        cents = t.column("_cents").to_numpy(zero_copy_only=False)
        build = side == 0
        bk, bid, bc = k[build], rid[build], cents[build]
        order = np.argsort(bk, kind="stable")
        bk, bid, bc = bk[order], bid[order], bc[order]
        pk, pid, pv = k[~build], rid[~build], cents[~build]
        lo = np.searchsorted(bk, pk, side="left")
        hi = np.searchsorted(bk, pk, side="right")
        cnt = hi - lo
        tot = int(cnt.sum())
        # vectorized ragged cross product: probe row i pairs with
        # build rows [lo[i], hi[i])
        if len(pk):
            p_idx = np.repeat(np.arange(len(pk), dtype=np.int64), cnt)
            offs = np.concatenate([[np.int64(0)], np.cumsum(cnt[:-1])])
            b_idx = np.repeat(lo, cnt) + (np.arange(tot, dtype=np.int64)
                                          - np.repeat(offs, cnt))
        else:  # probe side empty in this range (build-only keys)
            p_idx = b_idx = np.zeros(0, np.int64)
        cols = {
            "o_orderkey": pa.array(bid[b_idx]),
            "o_custkey": pa.array(bk[b_idx]),
            "event_id": pa.array(pid[p_idx]),
            "o_total_cents": pa.array(bc[b_idx]),
            "value_cents": pa.array(pv[p_idx]),
        }
        if how in ("left", "full"):
            matched = np.zeros(len(bk), bool)
            matched[b_idx] = True
            um = np.flatnonzero(~matched)          # unmatched build rows
            upm = (
                np.flatnonzero(cnt == 0) if how == "full"
                else np.zeros(0, np.int64)
            )                                       # unmatched probe rows
            n_um, n_up = len(um), len(upm)
            if n_um or n_up:
                bnull = np.concatenate(
                    [np.zeros(tot + n_um, bool), np.ones(n_up, bool)]
                )
                pnull = np.concatenate(
                    [np.zeros(tot, bool), np.ones(n_um, bool),
                     np.zeros(n_up, bool)]
                )
                z_um = np.zeros(n_um, np.int64)
                z_up = np.zeros(n_up, np.int64)
                cols = {
                    "o_orderkey": pa.array(
                        np.concatenate([bid[b_idx], bid[um], z_up]),
                        mask=bnull,
                    ),
                    "o_custkey": pa.array(
                        np.concatenate([bk[b_idx], bk[um], pk[upm]])
                    ),
                    "event_id": pa.array(
                        np.concatenate([pid[p_idx], z_um, pid[upm]]),
                        mask=pnull,
                    ),
                    "o_total_cents": pa.array(
                        np.concatenate([bc[b_idx], bc[um], z_up]),
                        mask=bnull,
                    ),
                    "value_cents": pa.array(
                        np.concatenate([pv[p_idx], z_um, pv[upm]]),
                        mask=pnull,
                    ),
                }
        elif tot == 0:
            return out_schema.empty_table()
        return pa.table(cols, schema=out_schema)

    res = rel.sort("_p", boundaries=list(range(1, P))).map_batches(
        sweep, batch_format="pyarrow", batch_size=None
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("o_orderkey", "ascending"), ("event_id", "ascending")]
        )
    )
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# Rollup (grouping-sets aggregate)
# ---------------------------------------------------------------------------
def events_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP(event_type, user_bucket): event counts and value sums at
    three grouping levels -- (event_type, bucket), (event_type), and
    grand total -- in ONE distributed pass.  ``user_bucket =
    user_id % 10`` keeps the fixture deterministic; NULL group columns
    mark rolled-up levels exactly as SQL ROLLUP does.

    Distributed shape: each block computes its FINEST-level partial
    (lexsort + reduceat), the partials merge in a single dim-bounded
    ``groupby.sum``, and the coarser levels derive from the merged
    finest level on the driver (group-count-sized, not row-sized) --
    the standard rollup-from-finest push-down."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "user_bucket": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "sum_value_cents": pa.array([], pa.int64())}
            )
        et = np.asarray(t.column("event_type").to_pandas(), dtype=object)
        ub = (t.column("user_id").to_numpy(zero_copy_only=False) % 10).astype(
            np.int64
        )
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        # composite sort key: type then bucket
        order = np.lexsort((ub, et))
        et, ub, cents = et[order], ub[order], cents[order]
        brk = np.concatenate(
            [[True], (et[1:] != et[:-1]) | (ub[1:] != ub[:-1])]
        )
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(et)))
        return pa.table(
            {
                "event_type": pa.array(list(et[starts]), pa.string()),
                "user_bucket": pa.array(ub[starts]),
                "n_events": pa.array(counts.astype(np.int64)),
                "sum_value_cents": pa.array(np.add.reduceat(cents, starts)),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_bucket"])
        .sum(["n_events", "sum_value_cents"])
        .to_pandas()
    )
    merged.columns = ["event_type", "user_bucket", "n_events", "sum_value_cents"]
    fine = merged
    by_type = (
        fine.groupby("event_type", as_index=False)[["n_events", "sum_value_cents"]]
        .sum()
    )
    by_type["user_bucket"] = None
    total = {
        "event_type": [None], "user_bucket": [None],
        "n_events": [fine["n_events"].sum()],
        "sum_value_cents": [fine["sum_value_cents"].sum()],
    }
    import pandas as pd

    allp = pd.concat(
        [fine, by_type, pd.DataFrame(total)], ignore_index=True
    )[["event_type", "user_bucket", "n_events", "sum_value_cents"]]
    out = pa.table(
        {
            "event_type": pa.array(allp["event_type"], pa.string()),
            "user_bucket": pa.array(
                allp["user_bucket"].astype("Int64"), pa.int64()
            ),
            "n_events": pa.array(allp["n_events"].astype(np.int64)),
            "sum_value_cents": pa.array(
                allp["sum_value_cents"].astype(np.int64)
            ),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("event_type", "ascending"), ("user_bucket", "ascending")],
        )
    )


def events_cube(sf_dir: str) -> pa.Table:
    """CUBE(event_type, user_bucket): all FOUR grouping sets --
    (type, bucket), (type), (bucket), () -- from one distributed
    finest-level pass (``events_rollup``'s superset: CUBE adds the
    bucket-only marginal ROLLUP omits).  Same
    rollup-from-finest push-down: every coarser level derives from
    the merged finest table on the driver (group-count-sized);
    NULL group columns mark the aggregated dimensions exactly as SQL
    CUBE does."""
    import pandas as pd

    # finest level via the identical distributed pass events_rollup
    # runs; coarser levels are pandas folds of its group-sized result
    fine_tbl = events_rollup(sf_dir)
    fine = fine_tbl.to_pandas()
    fine = fine[fine["event_type"].notna() & fine["user_bucket"].notna()]
    by_type = (
        fine.groupby("event_type", as_index=False)[
            ["n_events", "sum_value_cents"]].sum()
    )
    by_type["user_bucket"] = None
    by_bucket = (
        fine.groupby("user_bucket", as_index=False)[
            ["n_events", "sum_value_cents"]].sum()
    )
    by_bucket["event_type"] = None
    total = pd.DataFrame(
        {"event_type": [None], "user_bucket": [None],
         "n_events": [fine["n_events"].sum()],
         "sum_value_cents": [fine["sum_value_cents"].sum()]}
    )
    allp = pd.concat(
        [fine, by_type, by_bucket, total], ignore_index=True
    )[["event_type", "user_bucket", "n_events", "sum_value_cents"]]
    out = pa.table(
        {
            "event_type": pa.array(allp["event_type"], pa.string()),
            "user_bucket": pa.array(
                allp["user_bucket"].astype("Int64"), pa.int64()
            ),
            "n_events": pa.array(allp["n_events"].astype(np.int64)),
            "sum_value_cents": pa.array(
                allp["sum_value_cents"].astype(np.int64)
            ),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("event_type", "ascending"),
                       ("user_bucket", "ascending")],
        )
    )


# ---------------------------------------------------------------------------
# Exact per-group COUNT(DISTINCT) -- the cardinality aggregate
# ---------------------------------------------------------------------------
def events_user_distinct(sf_dir: str) -> pa.Table:
    """``COUNT(DISTINCT user_id) GROUP BY event_type`` -- the exact
    distributed distinct-count aggregate (the HLL sketch in
    ``events_distinct_users_hll`` above is this operator's
    approximate scale sibling).

    Shape: per-block distinct (event_type, user_id) pairs (lexsort +
    segment starts -- each block ships at most its local distinct
    pairs, the combiner), hash exchange on the PAIR so every copy of
    a pair co-locates, per-block global dedup + per-type counts, then
    one group-count-bounded ``groupby.sum``.  The exchange carries
    global-distinct-pair volume, never raw rows; a hot type spreads
    across ALL partitions because the hash includes user_id (no
    skew pile-up, unlike a groupby on event_type alone)."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("udist")
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    pair_schema = pa.schema(
        [("event_type", pa.string()), ("user_id", pa.int64())]
    )

    def _distinct_pairs(t: pa.Table):
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((uid, et))
        et, uid = et[order], uid[order]
        first = np.concatenate(
            [[True], (et[1:] != et[:-1]) | (uid[1:] != uid[:-1])]
        ) if len(et) else np.array([], bool)
        return et[first], uid[first]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        et, uid = _distinct_pairs(t)
        return pa.table(
            {"event_type": pa.array(list(et), pa.string()),
             "user_id": pa.array(uid)},
            schema=pair_schema,
        )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        key = pc.binary_join_element_wise(
            t.column("event_type"),
            pc.cast(t.column("user_id"), pa.string()),
            "\x00",
        )
        return t.append_column("_p", pa.array(partition_ids(key, P)))

    cnt_schema = pa.schema([("event_type", pa.string()), ("n", pa.int64())])

    def count_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cnt_schema.empty_table()
        _guard_record(gd, "udist",
                      t.column("_p").to_numpy(zero_copy_only=False))
        et, _uid = _distinct_pairs(t)
        starts, counts = _segment_starts(et)
        return pa.table(
            {"event_type": pa.array(list(et[starts]), pa.string()),
             "n": pa.array(counts.astype(np.int64))},
            schema=cnt_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(count_block, batch_format="pyarrow", batch_size=None)
        .groupby("event_type").sum("n")
    )
    df = agg.to_pandas().rename(columns={"sum(n)": "n_users"})
    df["n_users"] = df["n_users"].astype("int64")
    df = df.sort_values("event_type", ignore_index=True)
    t = pa.Table.from_pandas(df, preserve_index=False)
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------
def events_user_kmv_distinct(sf_dir: str, k: int = 64) -> pa.Table:
    """Mergeable KMV distinct-count sketch per ``event_type``: keep
    the ``k`` smallest DISTINCT 64-bit FNV-1a hashes of the member
    keys; estimate ``n_hat = floor((k-1) * 2^64 / h_(k))`` from the
    k-th smallest, or the exact count when fewer than ``k`` distinct
    hashes exist (Bar-Yossef et al. 2002, the classic KMV estimator).

    Unlike HLL (``events_distinct_users_hll``, pytest-gated within 5%
    error), KMV is DETERMINISTIC given the hash function -- the DuckDB
    oracle reproduces the estimate bit-for-bit with the same recursive
    FNV-1a fold ``events_sample_hash`` uses (plus the ``fmix64``
    finalizer restated in UHUGEINT arithmetic), so this approximate
    operator carries an EXACT SQL gate.  The finalizer matters: raw
    FNV-1a order statistics on short sequential keys are clustered
    enough to bias the estimate ~2.4x (measured in the pytest).

    Scale shape: per-block partial = the k smallest distinct
    ``(event_type, hash)`` pairs (at most ``k x n_types`` rows leave
    any block -- the mergeable-sketch combiner), then one
    type-count-bounded ``groupby.map_groups`` union.  Sketch union is
    associative, commutative and idempotent, so task retries and block
    splits cannot change the answer (no exchange guard needed)."""
    from logminer_kafka_connect_ray.functions.hashing import fmix64, fnv1a_u64

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    part_schema = pa.schema([("event_type", pa.string()), ("h", pa.uint64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        h = fmix64(fnv1a_u64(pc.cast(t.column("user_id"), pa.string())))
        order = np.lexsort((h, et))
        et, h = et[order], h[order]
        distinct = np.concatenate(
            [[True], (et[1:] != et[:-1]) | (h[1:] != h[:-1])]
        )
        et, h = et[distinct], h[distinct]
        starts, counts = _segment_starts(et)
        rank = np.arange(len(et), dtype=np.int64) - np.repeat(starts, counts)
        sel = rank < k
        return pa.table(
            {"event_type": pa.array(list(et[sel]), pa.string()),
             "h": pa.array(h[sel], pa.uint64())},
            schema=part_schema,
        )

    i64_max = (1 << 63) - 1

    def merge(g: pa.Table) -> pa.Table:
        et = g.column("event_type")[0].as_py()
        h = np.unique(
            g.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        c = len(h)
        if c < k:
            est = c
        else:
            hk = max(int(h[k - 1]), 1)
            est = min(((k - 1) << 64) // hk, i64_max)
        return pa.table(
            {"event_type": pa.array([et], pa.string()),
             "n_users_kmv": pa.array([est], pa.int64())}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )
    t = pa.Table.from_pandas(out, preserve_index=False)
    return t.take(pc.sort_indices(t, sort_keys=[("event_type", "ascending")]))


# ---------------------------------------------------------------------------
# TPC-H Q1-shape pricing summary over lineitem
# ---------------------------------------------------------------------------
def lineitem_pricing(sf_dir: str, cutoff: str = "2000-09-02") -> pa.Table:
    """Pricing-summary report over ``lineitem`` (the TPC-H Q1 shape):
    per ``(l_returnflag, l_linestatus)`` for rows shipped on or before
    ``cutoff``, the additive bases every Q1 column derives from --
    row count, quantity, base price, discounted price and charged
    price -- ALL in exact integers (cents; the discount/tax products
    scale by 100 each, so ``disc_cents_x100`` is cents*100 and
    ``charge_cents_x10k`` cents*10000).  Float summation order
    diverges between engines; integer sums do not, and the averages
    TPC-H prints are one deterministic division away.

    Scale shape: predicate + column pruning at the read, one
    per-block lexsort+reduceat partial (group cardinality <= 9), then
    a 9-row ``groupby.sum`` -- the canonical pre-aggregated wide
    aggregate, no raw-row shuffle.  Partials RAISE on any product
    that could wrap int64 (|cents| bounded at read time), never
    silently overflow."""
    cutoff_us = np.datetime64(cutoff + "T23:59:59.999999", "us").astype(
        np.int64
    )
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
    )

    part_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("n_rows", pa.int64()),
            ("sum_qty", pa.int64()),
            ("sum_base_cents", pa.int64()),
            ("sum_disc_cents_x100", pa.int64()),
            ("sum_charge_cents_x10k", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(
            pc.cast(t.column("l_shipdate"), pa.int64()), cutoff_us
        )
        t = t.filter(keep)
        if t.num_rows == 0:
            return part_schema.empty_table()
        rf = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        st = np.asarray(t.column("l_linestatus").to_pylist(), dtype=object)
        key = np.char.add(rf.astype(str), np.char.add("|", st.astype(str)))
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        base = _cents(t.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc = _cents(t.column("l_discount").to_numpy(zero_copy_only=False))
        tax = _cents(t.column("l_tax").to_numpy(zero_copy_only=False))
        if base.size and int(np.abs(base).max()) >= 1 << 40:
            raise ValueError(
                "lineitem_pricing: |base_cents| >= 2^40 could wrap int64 "
                "in the charge product; widen the partial to two limbs"
            )
        disc_x100 = base * (100 - disc)
        charge_x10k = disc_x100 * (100 + tax)
        order, starts, counts = _group_segments(key)
        rf, st = rf[order][starts], st[order][starts]
        return pa.table(
            {
                "l_returnflag": pa.array(list(rf), pa.string()),
                "l_linestatus": pa.array(list(st), pa.string()),
                "n_rows": pa.array(counts.astype(np.int64)),
                "sum_qty": pa.array(np.add.reduceat(qty[order], starts)),
                "sum_base_cents": pa.array(
                    np.add.reduceat(base[order], starts)
                ),
                "sum_disc_cents_x100": pa.array(
                    np.add.reduceat(disc_x100[order], starts)
                ),
                "sum_charge_cents_x10k": pa.array(
                    np.add.reduceat(charge_x10k[order], starts)
                ),
            },
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(
            [
                "n_rows", "sum_qty", "sum_base_cents",
                "sum_disc_cents_x100", "sum_charge_cents_x10k",
            ]
        )
        .to_pandas()
    )
    merged.columns = [
        "l_returnflag", "l_linestatus", "n_rows", "sum_qty",
        "sum_base_cents", "sum_disc_cents_x100", "sum_charge_cents_x10k",
    ]
    t = pa.Table.from_pandas(merged, preserve_index=False)
    t = pa.table(
        {
            "l_returnflag": pc.cast(t.column("l_returnflag"), pa.string()),
            "l_linestatus": pc.cast(t.column("l_linestatus"), pa.string()),
            "n_rows": pc.cast(t.column("n_rows"), pa.int64()),
            "sum_qty": pc.cast(t.column("sum_qty"), pa.int64()),
            "sum_base_cents": pc.cast(t.column("sum_base_cents"), pa.int64()),
            "sum_disc_cents_x100": pc.cast(
                t.column("sum_disc_cents_x100"), pa.int64()
            ),
            "sum_charge_cents_x10k": pc.cast(
                t.column("sum_charge_cents_x10k"), pa.int64()
            ),
        }
    )
    return t.take(
        pc.sort_indices(
            t,
            sort_keys=[
                ("l_returnflag", "ascending"),
                ("l_linestatus", "ascending"),
            ],
        )
    )


def lineitem_qp_corr(sf_dir: str) -> pa.Table:
    """Per-``l_returnflag`` Pearson-correlation base between quantity
    and extended price: every ingredient of
    ``corr(q, p) = (n*Sqp - Sq*Sp) / sqrt((n*Sqq - Sq^2)(n*Spp - Sp^2))``
    as EXACT integers, including the second moment of price --
    ``sum(price_cents^2)`` -- which does NOT fit int64 at scale
    (1e7-cent prices square to 1e14; 1e5 rows wrap a single int64).
    This implements the two-limb widening the ``events_type_moments``
    docstring points to: partials carry ``p^2`` split as
    ``(p^2 >> 25, p^2 & (2^25-1))`` -- both limb sums stay exact in
    int64 up to ~1e10 rows -- and the final 3-row reduce reassembles
    the exact 128-bit total in Python ints, returned as base-2^62
    ``(hi, lo)`` limbs that DuckDB's HUGEINT ``sum`` restates
    directly.  Same floor-cents conversion as ``lineitem_pricing``
    (deterministic across engines, unlike half-even rounds).

    Scale shape: column-pruned read -> per-block lexsort+reduceat
    partial (group cardinality 3) -> 3-row ``groupby.sum`` -- no
    raw-row shuffle; the only post-aggregate work is O(groups) limb
    carries on the driver."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    part_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("n", pa.int64()),
            ("sum_qty", pa.int64()),
            ("sum_qty_sq", pa.int64()),
            ("sum_price_cents", pa.int64()),
            ("sum_qp_cents", pa.int64()),
            ("psq_hi25", pa.int64()),
            ("psq_lo25", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        rf = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        p = _cents(t.column("l_extendedprice").to_numpy(zero_copy_only=False))
        # p*p must stay exact in int64 per row (2^25-limb split bounds
        # the SUMS, not the square itself)
        if p.size and int(np.abs(p).max()) >= 3_037_000_499:  # isqrt(2^63)
            raise ValueError(
                "lineitem_qp_corr: |price_cents| >= 3037000499 would "
                "overflow int64 in p^2; widen to a third limb"
            )
        psq = p * p
        order, starts, counts = _group_segments(rf)
        rf_s = rf[order][starts]
        qty, p, psq = qty[order], p[order], psq[order]
        return pa.table(
            {
                "l_returnflag": pa.array(list(rf_s), pa.string()),
                "n": pa.array(counts.astype(np.int64)),
                "sum_qty": pa.array(np.add.reduceat(qty, starts)),
                "sum_qty_sq": pa.array(np.add.reduceat(qty * qty, starts)),
                "sum_price_cents": pa.array(np.add.reduceat(p, starts)),
                "sum_qp_cents": pa.array(np.add.reduceat(qty * p, starts)),
                "psq_hi25": pa.array(np.add.reduceat(psq >> 25, starts)),
                "psq_lo25": pa.array(
                    np.add.reduceat(psq & ((1 << 25) - 1), starts)
                ),
            },
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .sum(
            [
                "n", "sum_qty", "sum_qty_sq", "sum_price_cents",
                "sum_qp_cents", "psq_hi25", "psq_lo25",
            ]
        )
        .to_pandas()
    )
    merged.columns = [
        "l_returnflag", "n", "sum_qty", "sum_qty_sq", "sum_price_cents",
        "sum_qp_cents", "psq_hi25", "psq_lo25",
    ]
    merged = merged.sort_values("l_returnflag").reset_index(drop=True)
    # exact 128-bit reassembly (O(groups) Python ints), then base-2^62
    # limbs so the HUGEINT oracle restates them with // and %
    hi62, lo62 = [], []
    for a, b in zip(merged["psq_hi25"], merged["psq_lo25"]):
        total = (int(a) << 25) + int(b)
        hi62.append(total >> 62)
        lo62.append(total & ((1 << 62) - 1))
    return pa.table(
        {
            "l_returnflag": pa.array(
                merged["l_returnflag"].tolist(), pa.string()
            ),
            "n": pa.array(merged["n"].astype(np.int64)),
            "sum_qty": pa.array(merged["sum_qty"].astype(np.int64)),
            "sum_qty_sq": pa.array(merged["sum_qty_sq"].astype(np.int64)),
            "sum_price_cents": pa.array(
                merged["sum_price_cents"].astype(np.int64)
            ),
            "sum_qp_cents": pa.array(merged["sum_qp_cents"].astype(np.int64)),
            "sum_price_sq_hi": pa.array(hi62, pa.int64()),
            "sum_price_sq_lo": pa.array(lo62, pa.int64()),
        }
    )


def events_funnel(sf_dir: str) -> pa.Table:
    """Ordered conversion funnel per user: the furthest stage of
    ``signup -> click -> purchase`` each user reaches, where every
    later stage must occur STRICTLY AFTER the user's first completion
    of the previous one (by ``(ts, event_id)`` order) -- the product-
    analytics sequential-pattern query that a bag-of-events aggregate
    cannot answer.  Returns ``(user_id, funnel_stage)`` for every
    user, stage in 0..3.

    Distributed shape: same one-hash-exchange-per-user as
    ``events_sessionize`` -- stamp ``_p = hash(user)``, explicit-
    boundary exchange, then a single per-block lexsort sweep where
    each stage is one ``min.reduceat`` over positions gated by the
    previous stage's per-segment first-completion position
    (``repeat`` back to rows); no per-row Python, no window state."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("funnel")
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("funnel_stage", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "funnel", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        et = t.column("event_type")
        is_s = pc.equal(et, "signup").to_numpy(zero_copy_only=False)
        is_c = pc.equal(et, "click").to_numpy(zero_copy_only=False)
        is_p = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, is_s, is_c, is_p = u[order], is_s[order], is_c[order], is_p[order]
        n = len(u)
        new_u = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.flatnonzero(new_u)
        counts = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64)
        BIG = np.int64(n + 1)
        fs = np.minimum.reduceat(np.where(is_s, pos, BIG), starts)
        fs_row = np.repeat(fs, counts)
        fc = np.minimum.reduceat(
            np.where(is_c & (pos > fs_row), pos, BIG), starts
        )
        fc_row = np.repeat(fc, counts)
        fp = np.minimum.reduceat(
            np.where(is_p & (pos > fc_row), pos, BIG), starts
        )
        stage = (
            (fs < BIG).astype(np.int64)
            + (fc < BIG).astype(np.int64)
            + (fp < BIG).astype(np.int64)
        )
        return pa.table(
            {"user_id": pa.array(u[starts]), "funnel_stage": pa.array(stage)},
            schema=out_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))
    return _finalize_guard(gd, t)


def events_cohort_retention(sf_dir: str) -> pa.Table:
    """Cohort retention matrix: users are cohorted by the EPOCH WEEK
    of their first event (``floor(epoch_days / 7)`` -- integer weeks,
    no calendar ambiguity between engines), and each cell counts the
    distinct cohort users active ``weeks_since`` weeks later --
    ``(cohort_week, weeks_since, n_users)``.

    Distributed shape: one user-hash exchange (a user's whole history
    in one block), then a per-block sweep derives each user's cohort
    week (``min.reduceat``), dedups (user, week) activity pairs with
    one sort + neighbor mask, and emits per-(cohort, delta) PARTIAL
    counts via ``np.unique`` -- distinct-user exactness is free
    because a user lives in exactly one block; the final
    ``groupby.sum`` is matrix-sized, not event-sized."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("cohort")
    week_us = np.int64(7 * 24 * 3600 * _US)
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    part_schema = pa.schema(
        [("cohort_week", pa.int64()), ("weeks_since", pa.int64()),
         ("n_users", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "cohort", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        wk = _ts_i64(t.column("ts")) // week_us
        order = np.lexsort((wk, u))
        u, wk = u[order], wk[order]
        n = len(u)
        new_u = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.flatnonzero(new_u)
        counts = np.diff(np.append(starts, n))
        cw = wk[starts]  # sorted per user: first week = cohort week
        # distinct (user, week) pairs: neighbor mask on the sorted rows
        keep = new_u.copy()
        keep[1:] |= wk[1:] != wk[:-1]
        delta = wk - np.repeat(cw, counts)
        pairs = np.stack([np.repeat(cw, counts)[keep], delta[keep]], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table(
            {"cohort_week": pa.array(uniq[:, 0]),
             "weeks_since": pa.array(uniq[:, 1]),
             "n_users": pa.array(cnt.astype(np.int64))},
            schema=part_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["cohort_week", "weeks_since"])
        .sum("n_users")
    )
    merged = res.to_pandas()
    merged.columns = ["cohort_week", "weeks_since", "n_users"]
    t = pa.Table.from_pandas(merged, preserve_index=False).cast(part_schema)
    t = t.take(
        pc.sort_indices(
            t,
            sort_keys=[("cohort_week", "ascending"),
                       ("weeks_since", "ascending")],
        )
    )
    return _finalize_guard(gd, t)


def events_user_path(sf_dir: str, k: int = 20) -> pa.Table:
    """Per-user journey string: the user's first ``k`` event types in
    ``(ts, event_id)`` order joined with ``'>'`` -- the ordered
    ``string_agg`` shape funnel/path analytics read, plus the
    UNCAPPED event count.  Returns ``(user_id, n_events, path)``.

    Distributed shape: one user-hash exchange, then a per-block
    lexsort sweep that materializes each user's capped prefix as ONE
    Arrow ListArray (offsets from the segment layout, values gathered
    with a single ``take``) joined by ``pc.binary_join`` -- the
    string assembly never leaves Arrow."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("upath")
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()),
         ("path", pa.large_string())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "upath", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((eid, ts, u))
        u = u[order]
        et = pc.cast(
            t.column("event_type").combine_chunks(), pa.large_string()
        ).take(pa.array(order))
        n = len(u)
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        counts = np.diff(np.append(starts, n))
        cap = np.minimum(counts, k)
        # gather indices: for each segment, starts[g] .. starts[g]+cap[g]
        rep = np.repeat(np.arange(len(starts)), cap)
        within = np.arange(cap.sum()) - np.repeat(
            np.concatenate([[0], np.cumsum(cap)[:-1]]), cap
        )
        gather = np.repeat(starts, cap) + within
        values = et.take(pa.array(gather))
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(cap)]), pa.int64()
        )
        lists = pa.LargeListArray.from_arrays(offsets, values)
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "n_events": pa.array(counts.astype(np.int64)),
                "path": pc.binary_join(
                    lists, pa.scalar(">", pa.large_string())
                ),
            },
            schema=out_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))
    return _finalize_guard(gd, t)


def events_dedup_window(sf_dir: str, window_minutes: int = 10) -> pa.Table:
    """Window-throttle dedup -- the streaming-ETL suppression rule
    "drop an event if the SAME (user, event_type) occurred within the
    last ``window_minutes``" (previous OCCURRENCE, kept or not, in
    ``(ts, event_id)`` order; strictly-greater gaps survive).
    Returns the per-type accounting ``(event_type, n_events,
    n_kept)`` -- the throttle family's summary a pipeline alarms on.

    Distributed shape: one user-hash exchange (a (user, type) pair
    never spans blocks), per-block lexsort, neighbor-diff keep mask,
    dimension-bounded partial counts -> tiny ``groupby.sum``."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("throttle")
    win_us = np.int64(window_minutes * 60 * _US)
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    part_schema = pa.schema(
        [("event_type", pa.string()), ("n_events", pa.int64()),
         ("n_kept", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "throttle", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        types, code = np.unique(et, return_inverse=True)
        order = np.lexsort((eid, ts, code, u))
        u, ts, code = u[order], ts[order], code[order]
        n = len(u)
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = (u[1:] == u[:-1]) & (code[1:] == code[:-1])
        keep = np.ones(n, bool)
        if n > 1:
            keep[1:] = ~same[1:] | ((ts[1:] - ts[:-1]) > win_us)
        n_ev = np.bincount(code, minlength=len(types)).astype(np.int64)
        n_kept = np.bincount(
            code, weights=keep.astype(np.int64), minlength=len(types)
        ).astype(np.int64)
        return pa.table(
            {"event_type": pa.array(list(types), pa.string()),
             "n_events": pa.array(n_ev), "n_kept": pa.array(n_kept)},
            schema=part_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .sum(["n_events", "n_kept"])
    )
    merged = res.to_pandas()
    merged.columns = ["event_type", "n_events", "n_kept"]
    t = pa.Table.from_pandas(merged, preserve_index=False).cast(part_schema)
    t = t.take(pc.sort_indices(t, sort_keys=[("event_type", "ascending")]))
    return _finalize_guard(gd, t)


def events_resample_ffill(sf_dir: str) -> pa.Table:
    """Time-series densification: resample each event type's hourly
    event counts onto the FULL global hour range (dense output over
    sparse input) with forward-fill semantics for the running count
    -- the gap-filling step a monitoring/ETL pipeline applies before
    charting or joining series.  Per ``(event_type, hour)`` over
    every hour between the corpus-wide min and max (inclusive):
    ``n_events`` (0 on gap hours) and ``cum_events`` (running total,
    which forward-fills through gaps by construction).

    Distributed shape: per-block ``(type, hour) -> count`` partials
    (lexsort + reduceat) -> dim-bounded ``groupby.sum``; the dense
    expansion + cumulative fold happen on the type x hour-range
    GRID (series-sized, never event-sized), vectorized with one
    searchsorted scatter per type."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    hour_us = np.int64(3600 * _US)

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // hour_us
        order = np.lexsort((hr, et))
        et, hr = et[order], hr[order]
        brk = np.concatenate([[True], (et[1:] != et[:-1]) | (hr[1:] != hr[:-1])])
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(et)))
        return pa.table(
            {"event_type": pa.array(list(et[starts]), pa.string()),
             "hour": pa.array(hr[starts]),
             "n": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n"]
    lo, hi = int(merged["hour"].min()), int(merged["hour"].max())
    hours = np.arange(lo, hi + 1, dtype=np.int64)
    types = sorted(merged["event_type"].unique())
    out_t, out_h, out_n, out_c = [], [], [], []
    for ty in types:
        g = merged[merged["event_type"] == ty].sort_values("hour")
        dense = np.zeros(len(hours), np.int64)
        idx = (g["hour"].to_numpy() - lo).astype(np.int64)
        dense[idx] = g["n"].to_numpy()
        out_t.append(np.full(len(hours), ty, object))
        out_h.append(hours)
        out_n.append(dense)
        out_c.append(np.cumsum(dense))
    return pa.table(
        {
            "event_type": pa.array(
                list(np.concatenate(out_t)), pa.string()
            ),
            "hour": pa.array(np.concatenate(out_h)),
            "n_events": pa.array(np.concatenate(out_n)),
            "cum_events": pa.array(np.concatenate(out_c)),
        }
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event journeys
# ---------------------------------------------------------------------------
def events_markov_transitions(sf_dir: str) -> pa.Table:
    """First-order Markov transition counts over user journeys: for
    every consecutive event pair of the SAME user in ``(ts,
    event_id)`` order, count ``src_type -> dst_type`` transitions
    globally, plus the per-source row total (the denominator of the
    transition probability, kept as an exact integer so the gate
    needs no float division).  Returns ``(src_type, dst_type,
    n_pairs, n_from_src)`` -- the journey-analytics matrix funnel /
    next-action models start from.

    Distributed shape: one user-hash exchange (a user's events never
    span blocks), a per-block lexsort + neighbor-shift sweep codes
    each adjacent same-user pair as ``src_code * T + dst_code`` and
    bincounts it -- per-block output is at most T^2 rows (T = event
    types), so the final ``groupby.sum`` is dimension-bounded and the
    driver only ever touches the T x T matrix."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("markov")
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    part_schema = pa.schema(
        [("src_type", pa.string()), ("dst_type", pa.string()),
         ("n", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "markov", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        types, code = np.unique(et, return_inverse=True)
        order = np.lexsort((eid, ts, u))
        u, code = u[order], code[order]
        same = u[1:] == u[:-1]
        src, dst = code[:-1][same], code[1:][same]
        if len(src) == 0:
            return part_schema.empty_table()
        T = len(types)
        flat = np.bincount(src * T + dst, minlength=T * T)
        nz = np.flatnonzero(flat)
        return pa.table(
            {"src_type": pa.array(list(types[nz // T]), pa.string()),
             "dst_type": pa.array(list(types[nz % T]), pa.string()),
             "n": pa.array(flat[nz].astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["src_type", "dst_type"])
        .sum("n")
        .to_pandas()
    )
    merged.columns = ["src_type", "dst_type", "n_pairs"]
    merged["n_pairs"] = merged["n_pairs"].astype("int64")
    # per-source denominators on the T x T matrix (driver-side, tiny)
    merged["n_from_src"] = (
        merged.groupby("src_type")["n_pairs"].transform("sum").astype("int64")
    )
    merged = merged.sort_values(["src_type", "dst_type"], ignore_index=True)
    out = pa.Table.from_pandas(merged, preserve_index=False)
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# OHLC downsampling (value-at-first / value-at-last per time bucket)
# ---------------------------------------------------------------------------
def events_ohlc(sf_dir: str) -> pa.Table:
    """Hourly OHLC bars per event type: for each ``(event_type,
    hour)`` bucket, ``open`` = value of the FIRST event (by ``ts,
    event_id``), ``close`` = value of the LAST, ``high``/``low`` =
    max/min, plus the event count -- the time-series downsampling
    shape a metrics/feature pipeline emits.  All values in exact
    floor-cents (``floor(value*100)``; see module header).

    Distributed shape: NO exchange -- this is a pure combiner-style
    aggregation.  Each block computes per-``(type, hour)`` partial
    bars carrying (first_ts, first_eid, open) / (last_ts, last_eid,
    close) witness keys via lexsort + ``reduceat``; partials are
    bar-dimension-bounded (types x hours, never event count), so the
    final cross-block combine is a tiny driver-side lexsort that
    resolves open/close by the witness keys -- the same
    "dim-bounded partials -> tiny final" shape as
    ``events_dedup_window``."""
    hour_us = np.int64(3600 * _US)
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "event_id",
                                          "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("first_ts", pa.int64()), ("first_eid", pa.int64()),
         ("open_cents", pa.int64()),
         ("last_ts", pa.int64()), ("last_eid", pa.int64()),
         ("close_cents", pa.int64()),
         ("high_cents", pa.int64()), ("low_cents", pa.int64()),
         ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        types, code = np.unique(et, return_inverse=True)
        ts = _ts_i64(t.column("ts"))
        hr = ts // hour_us
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, hr, code))
        code, hr, ts, eid, cents = (
            code[order], hr[order], ts[order], eid[order], cents[order]
        )
        brk = np.concatenate(
            [[True], (code[1:] != code[:-1]) | (hr[1:] != hr[:-1])]
        )
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(code)) - 1
        return pa.table(
            {"event_type": pa.array(list(types[code[starts]]), pa.string()),
             "hour": pa.array(hr[starts]),
             "first_ts": pa.array(ts[starts]),
             "first_eid": pa.array(eid[starts]),
             "open_cents": pa.array(cents[starts]),
             "last_ts": pa.array(ts[ends]),
             "last_eid": pa.array(eid[ends]),
             "close_cents": pa.array(cents[ends]),
             "high_cents": pa.array(np.maximum.reduceat(cents, starts)),
             "low_cents": pa.array(np.minimum.reduceat(cents, starts)),
             "n": pa.array((ends - starts + 1).astype(np.int64))},
            schema=part_schema,
        )

    parts = pa.Table.from_pandas(
        ds.map_batches(partial, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    ).cast(part_schema)
    if parts.num_rows == 0:
        return pa.schema(
            [("event_type", pa.string()), ("hour", pa.int64()),
             ("open_cents", pa.int64()), ("high_cents", pa.int64()),
             ("low_cents", pa.int64()), ("close_cents", pa.int64()),
             ("n_events", pa.int64())]
        ).empty_table()
    # cross-block combine on the bar-dimension-bounded partial table
    et = np.asarray(parts.column("event_type").to_pylist(), dtype=object)
    types, code = np.unique(et, return_inverse=True)
    hr = parts.column("hour").to_numpy()
    f_ts = parts.column("first_ts").to_numpy()
    f_eid = parts.column("first_eid").to_numpy()
    l_ts = parts.column("last_ts").to_numpy()
    l_eid = parts.column("last_eid").to_numpy()
    op = parts.column("open_cents").to_numpy()
    cl = parts.column("close_cents").to_numpy()
    hi = parts.column("high_cents").to_numpy()
    lo = parts.column("low_cents").to_numpy()
    n = parts.column("n").to_numpy()
    # open: earliest (first_ts, first_eid) witness per (type, hour)
    o1 = np.lexsort((f_eid, f_ts, hr, code))
    brk = np.concatenate(
        [[True], (code[o1][1:] != code[o1][:-1]) | (hr[o1][1:] != hr[o1][:-1])]
    )
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], len(o1)) - 1
    g_code, g_hr = code[o1][starts], hr[o1][starts]
    g_open = op[o1][starts]
    # close: latest (last_ts, last_eid) witness; same group layout
    # because the sort keys (code, hr) break groups identically
    o2 = np.lexsort((l_eid, l_ts, hr, code))
    g_close = cl[o2][ends]
    g_hi = np.maximum.reduceat(hi[o1], starts)
    g_lo = np.minimum.reduceat(lo[o1], starts)
    g_n = np.add.reduceat(n[o1], starts)
    return pa.table(
        {"event_type": pa.array(list(types[g_code]), pa.string()),
         "hour": pa.array(g_hr),
         "open_cents": pa.array(g_open),
         "high_cents": pa.array(g_hi),
         "low_cents": pa.array(g_lo),
         "close_cents": pa.array(g_close),
         "n_events": pa.array(g_n.astype(np.int64))}
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way join -> aggregate -> global top-k
# ---------------------------------------------------------------------------
def customer_revenue_topk(
    sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-06-01",
    k: int = 10,
) -> pa.Table:
    """Unshipped-revenue report (the TPC-H Q3 shape): the ``k``
    orders with the highest outstanding revenue -- orders placed by
    ``segment`` customers BEFORE ``cutoff`` whose line items shipped
    AFTER it -- as ``(o_orderkey, o_orderdate, revenue_cents)``,
    revenue summed as exact per-row ``floor(extprice * (1-disc) *
    100)`` cents.  One query, three join strategies composed the way
    a 100 TB plan would pick them:

    * customer (dim side) never shuffles: the segment's custkeys
      become a ``ray.put`` bitmap probed inside the orders scan --
      the broadcast join.
    * orders x lineitem (two fact sides) meet in ONE partitioned
      hash exchange on ``o_orderkey`` -- both sides pre-filtered and
      pre-projected at the read, so only surviving join keys ship.
    * the aggregate needs no second shuffle: the exchange co-locates
      each order key, so a per-block segment-sum IS the final
      per-order revenue, and each block emits only its local top-k
      -- the driver merges P*k candidate rows, never the join.
    """
    import ray

    cutoff_us = np.datetime64(cutoff, "us").astype(np.int64)
    n_li, _ = _table_meta(sf_dir, "lineitem")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_li + n_or)
    gd = _new_guard_dir("q3")

    # -- broadcast dim side: segment custkeys as a bitmap ------------
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def seg_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("c_mktsegment"), segment)
        keys = t.filter(m).column("c_custkey").cast(pa.int64())
        return pa.table({"k": keys})

    keys = (
        cust.map_batches(seg_keys, batch_format="pyarrow")
        .groupby("k").count().to_pandas()["k"].to_numpy()
    )
    bitmap = np.zeros((int(keys.max()) + 2) if len(keys) else 1, bool)
    bitmap[keys] = True
    bm_ref = ray.put(bitmap)

    rel_schema = pa.schema(
        [("_k", pa.int64()), ("_side", pa.int8()),
         ("_date", pa.int64()), ("_rev", pa.int64()), ("_p", pa.int64())]
    )

    def pad_orders(t: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        od = _ts_i64(t.column("o_orderdate"))
        keep = (od < cutoff_us) & (ck < len(bm)) & bm[np.clip(ck, 0, len(bm) - 1)]
        if not keep.any():
            return rel_schema.empty_table()
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        return pa.table(
            {"_k": pa.array(ok),
             "_side": pa.array(np.zeros(len(ok), np.int8)),
             "_date": pa.array(od[keep]),
             "_rev": pa.array(np.zeros(len(ok), np.int64)),
             "_p": pa.array(partition_ids(pa.array(ok), P))},
            schema=rel_schema,
        )

    def pad_lineitem(t: pa.Table) -> pa.Table:
        sd = _ts_i64(t.column("l_shipdate"))
        keep = sd > cutoff_us
        if not keep.any():
            return rel_schema.empty_table()
        lk = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        rev = np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
        return pa.table(
            {"_k": pa.array(lk),
             "_side": pa.array(np.ones(len(lk), np.int8)),
             "_date": pa.array(np.zeros(len(lk), np.int64)),
             "_rev": pa.array(rev),
             "_p": pa.array(partition_ids(pa.array(lk), P))},
            schema=rel_schema,
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(pad_orders, batch_format="pyarrow")
    items = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(pad_lineitem, batch_format="pyarrow")

    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
         ("revenue_cents", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "q3", t.column("_p").to_numpy(zero_copy_only=False))
        kcol = t.column("_k").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        dt = t.column("_date").to_numpy(zero_copy_only=False)
        rev = t.column("_rev").to_numpy(zero_copy_only=False)
        bk, bd = kcol[side == 0], dt[side == 0]
        pk, pr = kcol[side == 1], rev[side == 1]
        if len(bk) == 0 or len(pk) == 0:
            return out_schema.empty_table()
        bo = np.argsort(bk, kind="stable")
        bk, bd = bk[bo], bd[bo]
        pos = np.searchsorted(bk, pk)
        hit = (pos < len(bk)) & (bk[np.clip(pos, 0, len(bk) - 1)] == pk)
        if not hit.any():
            return out_schema.empty_table()
        pk, pr, pos = pk[hit], pr[hit], pos[hit]
        po = np.argsort(pk, kind="stable")
        pk, pr, pos = pk[po], pr[po], pos[po]
        starts = np.flatnonzero(np.concatenate([[True], pk[1:] != pk[:-1]]))
        sums = np.add.reduceat(pr, starts)
        okeys, odates = pk[starts], bd[pos[starts]]
        # local top-k by (revenue desc, orderkey asc)
        top = np.lexsort((okeys, -sums))[:k]
        return pa.table(
            {"o_orderkey": pa.array(okeys[top]),
             "o_orderdate": pa.array(odates[top]).cast(pa.timestamp("us")),
             "revenue_cents": pa.array(sums[top])},
            schema=out_schema,
        )

    res = (
        orders.union(items)
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    cand = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    cand = cand.cast(out_schema)
    ok = cand.column("o_orderkey").to_numpy()
    rv = cand.column("revenue_cents").to_numpy()
    top = np.lexsort((ok, -rv))[:k]
    out = cand.take(pa.array(top))
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share per ship month
# ---------------------------------------------------------------------------
def part_promo_revenue(sf_dir: str) -> pa.Table:
    """Promotion-effect report (the TPC-H Q14 shape): per ship MONTH
    (integer months since 1970-01), the revenue from parts of type
    ``PROMO`` next to total revenue and item count -- the
    numerator/denominator pair Q14's percentage derives from, kept as
    exact floor-cents integers.  Returns ``(ship_month, promo_cents,
    total_cents, n_items)``.

    Distributed shape: the part dimension never shuffles -- its
    ``l_partkey`` key domain is dense, so "is this part PROMO" packs
    into ONE broadcast bit per key (``ray.put`` once, read per task);
    the lineitem scan stays a single pruned pass emitting per-block
    month partials (month cardinality is tiny) into a dim-bounded
    ``groupby.sum``.  With a sparse/huge key domain the bitmap
    becomes the same partitioned hash exchange ``customer_revenue_topk``
    uses -- the bitmap is the dense-key fast path, not the only path."""
    import ray

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def promo_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("p_type"), "PROMO")
        return pa.table(
            {"k": t.filter(m).column("p_partkey").cast(pa.int64())}
        )

    keys = (
        part.map_batches(promo_keys, batch_format="pyarrow")
        .to_pandas()["k"]
        .to_numpy()
    )
    # non-promo keys above the max promo key probe past the bitmap
    # and are (correctly) treated as not-promo by the bounds check
    bitmap = np.zeros((int(keys.max()) + 2) if len(keys) else 1, bool)
    bitmap[keys] = True
    bm_ref = ray.put(bitmap)

    part_schema = pa.schema(
        [("ship_month", pa.int64()), ("promo_cents", pa.int64()),
         ("total_cents", pa.int64()), ("n_items", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        bm = ray.get(bm_ref)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
        promo = (pk < len(bm)) & bm[np.clip(pk, 0, len(bm) - 1)]
        month = (
            _ts_i64(t.column("l_shipdate"))
            .astype("datetime64[us]")
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        order = np.argsort(month, kind="stable")
        month, rev, promo = month[order], rev[order], promo[order]
        starts = np.flatnonzero(
            np.concatenate([[True], month[1:] != month[:-1]])
        )
        counts = np.diff(np.append(starts, len(month)))
        return pa.table(
            {"ship_month": pa.array(month[starts]),
             "promo_cents": pa.array(
                 np.add.reduceat(np.where(promo, rev, 0), starts)
             ),
             "total_cents": pa.array(np.add.reduceat(rev, starts)),
             "n_items": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_shipdate", "l_extendedprice",
                       "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ship_month")
        .sum(["promo_cents", "total_cents", "n_items"])
        .to_pandas()
    )
    merged.columns = ["ship_month", "promo_cents", "total_cents", "n_items"]
    merged = merged.sort_values("ship_month", ignore_index=True)
    for c in merged.columns:
        merged[c] = merged[c].astype("int64")
    return pa.Table.from_pandas(merged, preserve_index=False)


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: broadcast dimension chain -> per-region rollup
# ---------------------------------------------------------------------------
def region_orders_rollup(sf_dir: str) -> pa.Table:
    """Per-region order rollup (the TPC-H Q5 dimension-chain shape):
    every order attributed to its customer's nation's REGION, with
    order count and exact total-price cents -- ``(r_name, n_orders,
    sum_total_cents)``.

    Distributed shape: the THREE dimension tables (region <- nation
    <- customer) collapse into one broadcast custkey -> region-code
    array built dim-side (region and nation are tiny; customer is
    the classic broadcast side), shipped once via ``ray.put``; the
    orders fact table streams through a single pruned pass emitting
    region-bounded partials -- no shuffle anywhere, the canonical
    star-schema plan."""
    import ray

    reg = _read_dim(sf_dir, "region", columns=["r_regionkey", "r_name"])
    nat = _read_dim(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    n2r = np.full(int(nat["n_nationkey"].max()) + 2, -1, np.int64)
    n2r[nat["n_nationkey"].to_numpy()] = nat["n_regionkey"].to_numpy()

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def cust_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {"k": t.column("c_custkey").cast(pa.int64()),
             "r": pa.array(
                 n2r[t.column("c_nationkey").to_numpy(zero_copy_only=False)]
             )}
        )

    cdf = cust.map_batches(cust_pairs, batch_format="pyarrow").to_pandas()
    c2r = np.full(int(cdf["k"].max()) + 2, -1, np.int64)
    c2r[cdf["k"].to_numpy()] = cdf["r"].to_numpy()
    c2r_ref = ray.put(c2r)

    part_schema = pa.schema(
        [("r_regionkey", pa.int64()), ("n_orders", pa.int64()),
         ("sum_total_cents", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        lut = ray.get(c2r_ref)
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        r = lut[np.clip(ck, 0, len(lut) - 1)]
        cents = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        order = np.argsort(r, kind="stable")
        rs, cs = r[order], cents[order]
        keep = rs >= 0
        rs, cs = rs[keep], cs[keep]
        if len(rs) == 0:
            return part_schema.empty_table()
        starts = np.flatnonzero(np.concatenate([[True], rs[1:] != rs[:-1]]))
        counts = np.diff(np.append(starts, len(rs)))
        return pa.table(
            {"r_regionkey": pa.array(rs[starts]),
             "n_orders": pa.array(counts.astype(np.int64)),
             "sum_total_cents": pa.array(np.add.reduceat(cs, starts))},
            schema=part_schema,
        )

    merged = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("r_regionkey")
        .sum(["n_orders", "sum_total_cents"])
        .to_pandas()
    )
    merged.columns = ["r_regionkey", "n_orders", "sum_total_cents"]
    name = {int(k): v for k, v in zip(reg["r_regionkey"], reg["r_name"])}
    merged["r_name"] = [name[int(k)] for k in merged["r_regionkey"]]
    merged = merged.sort_values("r_name", ignore_index=True)
    return pa.table(
        {"r_name": pa.array(list(merged["r_name"]), pa.string()),
         "n_orders": pa.array(merged["n_orders"].astype("int64").to_numpy()),
         "sum_total_cents": pa.array(
             merged["sum_total_cents"].astype("int64").to_numpy()
         )}
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection: median / MAD outlier counts per group
# ---------------------------------------------------------------------------
def events_anomaly_mad(sf_dir: str, k_sigma: int = 3) -> pa.Table:
    """Robust per-type outlier report: for every ``event_type``, the
    exact lower-median of ``floor(value*100)`` cents, the median
    absolute deviation (MAD, same lower-median rule), and how many
    events sit strictly beyond ``k_sigma`` MADs from the median --
    the classic heavy-tail-safe anomaly screen (mean/std break on the
    outliers themselves; median/MAD don't).  Returns ``(event_type,
    median_cents, mad_cents, n_outliers, n_events)``.

    Distributed shape: ONE pass -- the same per-block ``(type, cents,
    count)`` counting-sort partials as `events_type_quantiles` merged
    by ``groupby.sum``; median, the DERIVED deviation histogram, MAD
    and the outlier count are all cumulative walks over that
    histogram on the driver (bounded by groups x distinct values,
    never row count).  No second data pass: ``|c - med|`` of a
    histogram is a histogram transform."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("cents", pa.int64()),
         ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        types, codes = np.unique(et, return_inverse=True)
        c = _cents(t.column("value").to_numpy(zero_copy_only=False))
        span = (c.max() - c.min() + 1) if len(c) else 1
        comp = codes.astype(np.int64) * span + (c - c.min())
        uniq, counts = np.unique(comp, return_counts=True)
        return pa.table(
            {"event_type": pa.array(list(types[uniq // span]), pa.string()),
             "cents": pa.array((uniq % span + c.min()).astype(np.int64)),
             "n": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .sum("n")
        .to_pandas()
    )
    df.columns = ["event_type", "cents", "n"]

    def lower_median(vals: np.ndarray, counts: np.ndarray) -> int:
        cum = np.cumsum(counts)
        n = int(cum[-1])
        target = max(1, int(np.ceil(0.5 * n)))
        return int(vals[int(np.searchsorted(cum, target))])

    rows = []
    for et, grp in df.groupby("event_type"):
        vals = grp["cents"].to_numpy().astype(np.int64)
        counts = grp["n"].to_numpy().astype(np.int64)
        order = np.argsort(vals)
        vals, counts = vals[order], counts[order]
        med = lower_median(vals, counts)
        # deviation histogram = |vals - med| re-aggregated
        dev = np.abs(vals - med)
        do = np.argsort(dev, kind="stable")
        dvals, dcounts = dev[do], counts[do]
        starts = np.flatnonzero(
            np.concatenate([[True], dvals[1:] != dvals[:-1]])
        )
        dvals = dvals[starts]
        dcounts = np.add.reduceat(dcounts, starts)
        mad = lower_median(dvals, dcounts)
        n_out = int(counts[np.abs(vals - med) > k_sigma * mad].sum())
        rows.append((et, med, mad, n_out, int(counts.sum())))
    rows.sort()
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "median_cents": pa.array([r[1] for r in rows], pa.int64()),
         "mad_cents": pa.array([r[2] for r in rows], pa.int64()),
         "n_outliers": pa.array([r[3] for r in rows], pa.int64()),
         "n_events": pa.array([r[4] for r in rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: fact-vs-fact EXISTS semi-join
# ---------------------------------------------------------------------------
def orders_late_shipment(sf_dir: str, grace_days: int = 90) -> pa.Table:
    """Late-shipment report (the TPC-H Q4 shape): per
    ``o_orderpriority``, how many orders have AT LEAST ONE line item
    shipped more than ``grace_days`` after the order date -- the
    EXISTS predicate where BOTH sides are fact tables, completing the
    semi-join family (`customer_order_presence` handles the
    dim-vs-fact case with a broadcast bitmap; here neither side
    broadcasts).  Returns ``(o_orderpriority, n_orders, n_late)``.

    Distributed shape: one orderkey hash exchange co-locates each
    order with its line items; the per-block sweep sorts the build
    side, maps every probe row to its order with ONE searchsorted,
    and reduces the lateness predicate per order with
    ``logical_or.reduceat`` -- priority-bounded partials (<= 5 rows
    per block) then a tiny ``groupby.sum``.  The EXISTS never
    materializes joined rows: only (order, any_late) bits leave the
    sweep, so join fan-out cannot inflate the exchange output."""
    n_li, _ = _table_meta(sf_dir, "lineitem")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_li + n_or)
    gd = _new_guard_dir("q4")
    grace_us = np.int64(grace_days) * 86_400 * _US

    rel_schema = pa.schema(
        [("_k", pa.int64()), ("_side", pa.int8()), ("_ts", pa.int64()),
         ("_prio", pa.string()), ("_p", pa.int64())]
    )

    def pad_orders(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return rel_schema.empty_table()
        ok = t.column("o_orderkey").cast(pa.int64())
        return pa.table(
            {"_k": ok,
             "_side": pa.array(np.zeros(t.num_rows, np.int8)),
             "_ts": pa.array(_ts_i64(t.column("o_orderdate"))),
             "_prio": pc.cast(t.column("o_orderpriority"), pa.string()),
             "_p": pa.array(partition_ids(ok, P))},
            schema=rel_schema,
        )

    def pad_items(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return rel_schema.empty_table()
        lk = t.column("l_orderkey").cast(pa.int64())
        return pa.table(
            {"_k": lk,
             "_side": pa.array(np.ones(t.num_rows, np.int8)),
             "_ts": pa.array(_ts_i64(t.column("l_shipdate"))),
             "_prio": pa.array([""] * t.num_rows, pa.string()),
             "_p": pa.array(partition_ids(lk, P))},
            schema=rel_schema,
        )

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(pad_orders, batch_format="pyarrow")
    items = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(pad_items, batch_format="pyarrow")

    part_schema = pa.schema(
        [("o_orderpriority", pa.string()), ("n_orders", pa.int64()),
         ("n_late", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(gd, "q4", t.column("_p").to_numpy(zero_copy_only=False))
        k = t.column("_k").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        ts = t.column("_ts").to_numpy(zero_copy_only=False)
        prio = np.asarray(t.column("_prio").to_pylist(), dtype=object)
        b = side == 0
        bk, bd, bp = k[b], ts[b], prio[b]
        pk, ps = k[~b], ts[~b]
        if len(bk) == 0:
            return part_schema.empty_table()
        bo = np.argsort(bk, kind="stable")
        bk, bd, bp = bk[bo], bd[bo], bp[bo]
        late = np.zeros(len(bk), bool)
        if len(pk):
            pos = np.searchsorted(bk, pk)
            ok = (pos < len(bk)) & (bk[np.clip(pos, 0, len(bk) - 1)] == pk)
            pos, ps = pos[ok], ps[ok]
            is_late = ps > bd[pos] + grace_us
            late[pos[is_late]] = True
        prios, code = np.unique(bp, return_inverse=True)
        n_orders = np.bincount(code, minlength=len(prios))
        n_late = np.bincount(code[late], minlength=len(prios))
        return pa.table(
            {"o_orderpriority": pa.array(list(prios), pa.string()),
             "n_orders": pa.array(n_orders.astype(np.int64)),
             "n_late": pa.array(n_late.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        orders.union(items)
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("o_orderpriority")
        .sum(["n_orders", "n_late"])
        .to_pandas()
    )
    merged.columns = ["o_orderpriority", "n_orders", "n_late"]
    merged = merged.sort_values("o_orderpriority", ignore_index=True)
    out = pa.table(
        {"o_orderpriority": pa.array(
            list(merged["o_orderpriority"]), pa.string()
        ),
         "n_orders": pa.array(merged["n_orders"].astype("int64").to_numpy()),
         "n_late": pa.array(merged["n_late"].astype("int64").to_numpy())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Sliding-window COUNT DISTINCT: trailing-7-day active users
# ---------------------------------------------------------------------------
def events_wau(sf_dir: str, window_days: int = 7) -> pa.Table:
    """Trailing-window distinct users -- the DAU/WAU pair: per epoch
    day, the exact count of distinct users active THAT day (``dau``)
    and within the trailing ``window_days`` window (``wau``).  This
    is the sliding-window COUNT DISTINCT the hopping-window gate
    deliberately deferred (`events_window_sliding`: "replicating user
    ids k-fold is the exact cost sliding distinct requires") -- here
    the replication happens on the per-user DISTINCT-DAY relation
    (bounded by users x active days, not events), which is the
    cheapest exact form.  Days with no user active in the trailing
    window emit no row; trailing windows extending past the last
    active day are trimmed (symmetric with the oracle).

    Distributed shape: ONE user-hash exchange co-locates each user's
    events, so per-block distinct days, the +0..window-1 forward
    expansion, and the per-user re-dedup are all block-local AND
    globally exact (users never span blocks); per-block partials are
    day-bounded counts, merged by one tiny ``groupby.sum``."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("wau")
    day_us = np.int64(86_400 * _US)
    W = int(window_days)

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    part_schema = pa.schema(
        [("day", pa.int64()), ("dau", pa.int64()), ("wau", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(gd, "wau", t.column("_p").to_numpy(zero_copy_only=False))
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = _ts_i64(t.column("ts")) // day_us
        uu, uidx = np.unique(u, return_inverse=True)
        lo = day.min()
        span = day.max() - lo + 1 + W  # room for the forward expansion
        ud = np.unique(uidx * span + (day - lo))  # distinct (user, day)
        # forward expansion then per-user re-dedup (runs closer than
        # W days overlap) -- all in the composite key space
        exp = np.unique(
            (ud[:, None] + np.arange(W, dtype=np.int64)[None, :]).ravel()
        )
        # per-day counts: distinct users per expanded / source day
        wau_days = exp % span + lo
        dau_days = ud % span + lo
        wd, wc = np.unique(wau_days, return_counts=True)
        dd, dc = np.unique(dau_days, return_counts=True)
        days = np.union1d(wd, dd)
        wau = np.zeros(len(days), np.int64)
        dau = np.zeros(len(days), np.int64)
        wau[np.searchsorted(days, wd)] = wc
        dau[np.searchsorted(days, dd)] = dc
        return pa.table(
            {"day": pa.array(days), "dau": pa.array(dau),
             "wau": pa.array(wau)},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("day")
        .sum(["dau", "wau"])
        .to_pandas()
    )
    merged.columns = ["day", "dau", "wau"]
    # trim trailing windows past the last ACTIVE day (oracle parity)
    max_day = int(merged.loc[merged["dau"] > 0, "day"].max())
    merged = merged[merged["day"] <= max_day].sort_values(
        "day", ignore_index=True
    )
    out = pa.table(
        {"day": pa.array(merged["day"].astype("int64").to_numpy()),
         "dau": pa.array(merged["dau"].astype("int64").to_numpy()),
         "wau": pa.array(merged["wau"].astype("int64").to_numpy())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# ANALYZE-style statistics collection (optimizer table profile)
# ---------------------------------------------------------------------------
def table_profile(sf_dir: str) -> pa.Table:
    """ANALYZE-style table statistics over ``events``: per column,
    exact row count, null count, EXACT distinct-value count, and
    min/max -- the optimizer/statistics pass every engine runs before
    planning.  Columns are profiled on a canonical domain so the
    oracle is bit-exact: integers as themselves, timestamps as
    epoch-microseconds, doubles as floor-cents, strings raw.
    Returns ``(column, n_rows, n_null, n_distinct, min_num, max_num,
    min_str, max_str)`` (num stats null for string columns and vice
    versa).

    Distributed shape: ONE events pass emits (a) tiny per-block
    ``(column, n, n_null)`` count partials and (b) per-block DISTINCT
    ``(column, value)`` pairs -- the NDV combiner, bounded by local
    distincts, never rows.  The pair relation exchanges on the
    (column, value) hash (a hot column spreads over ALL partitions,
    same anti-skew argument as `events_user_distinct`), then a
    per-block sweep counts the now-globally-distinct pairs and takes
    per-column partial min/max; one group-bounded ``groupby`` merge
    each.  At 100 TB the NDV exchange carries only global-distinct
    volume per column."""
    P = _exchange_width(_table_meta(sf_dir, "events")[0])
    gd = _new_guard_dir("profile")
    ds = _read(
        sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )

    NUM_COLS = ("event_id", "ts", "user_id", "value")
    STR_COLS = ("event_type", "props")

    def canon_num(t: pa.Table, name: str) -> np.ndarray:
        if name == "ts":
            return _ts_i64(t.column("ts"))
        if name == "value":
            return _cents(t.column("value").to_numpy(zero_copy_only=False))
        return t.column(name).to_numpy(zero_copy_only=False).astype(np.int64)

    counts_schema = pa.schema(
        [("column", pa.string()), ("n_rows", pa.int64()),
         ("n_null", pa.int64())]
    )
    pair_schema = pa.schema(
        [("column", pa.string()), ("v_num", pa.int64()),
         ("v_str", pa.string()), ("_p", pa.int64())]
    )

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return counts_schema.empty_table()
        cols, nr, nn = [], [], []
        for name in NUM_COLS + STR_COLS:
            cols.append(name)
            nr.append(t.num_rows)
            nn.append(t.column(name).null_count)
        return pa.table(
            {"column": pa.array(cols, pa.string()),
             "n_rows": pa.array(nr, pa.int64()),
             "n_null": pa.array(nn, pa.int64())},
            schema=counts_schema,
        )

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        cols, vnum, vstr, route = [], [], [], []
        for name in NUM_COLS:
            col = t.column(name)
            v = canon_num(t, name)
            if col.null_count:
                v = v[~np.asarray(pc.is_null(col.combine_chunks()))]
            u = np.unique(v)
            cols.extend([name] * len(u))
            vnum.extend(u.tolist())
            vstr.extend([None] * len(u))
            route.extend((name + ":" + s for s in u.astype(str)))
        for name in STR_COLS:
            vals = [x for x in t.column(name).to_pylist() if x is not None]
            u = sorted(set(vals))
            cols.extend([name] * len(u))
            vnum.extend([None] * len(u))
            vstr.extend(u)
            route.extend((name + ":" + s for s in u))
        rarr = pa.array(route, pa.string())
        return pa.table(
            {"column": pa.array(cols, pa.string()),
             "v_num": pa.array(vnum, pa.int64()),
             "v_str": pa.array(vstr, pa.string()),
             "_p": pa.array(partition_ids(rarr, P))},
            schema=pair_schema,
        )

    stat_schema = pa.schema(
        [("column", pa.string()), ("n_distinct", pa.int64()),
         ("min_num", pa.int64()), ("max_num", pa.int64()),
         ("min_str", pa.string()), ("max_str", pa.string())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return stat_schema.empty_table()
        _guard_record(
            gd, "profile", t.column("_p").to_numpy(zero_copy_only=False)
        )
        cols = np.asarray(t.column("column").to_pylist(), dtype=object)
        vnum = t.column("v_num")
        vstr = t.column("v_str")
        out = []
        for name in NUM_COLS + STR_COLS:
            m = cols == name
            k = int(m.sum())
            if not k:
                continue
            idx = pa.array(np.flatnonzero(m))
            if name in NUM_COLS:
                vals = vnum.take(idx).to_numpy(zero_copy_only=False)
                # pairs were deduped per block but distinct blocks can
                # re-emit the same value: dedup within the co-located
                # partition (global for this hash range)
                vals = np.unique(vals)
                out.append((name, len(vals), int(vals.min()),
                            int(vals.max()), None, None))
            else:
                vals = sorted(set(vstr.take(idx).to_pylist()))
                out.append((name, len(vals), None, None, vals[0],
                            vals[-1]))
        return pa.table(
            {"column": pa.array([r[0] for r in out], pa.string()),
             "n_distinct": pa.array([r[1] for r in out], pa.int64()),
             "min_num": pa.array([r[2] for r in out], pa.int64()),
             "max_num": pa.array([r[3] for r in out], pa.int64()),
             "min_str": pa.array([r[4] for r in out], pa.string()),
             "max_str": pa.array([r[5] for r in out], pa.string())},
            schema=stat_schema,
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("column")
        .sum(["n_rows", "n_null"])
        .to_pandas()
    )
    counts.columns = ["column", "n_rows", "n_null"]

    stats = pa.Table.from_pandas(
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .to_pandas(),
        preserve_index=False,
    ).cast(stat_schema).to_pandas()
    # merge the per-partition stat partials (group-bounded)
    agg = stats.groupby("column", as_index=False).agg(
        n_distinct=("n_distinct", "sum"),
        min_num=("min_num", "min"), max_num=("max_num", "max"),
        min_str=("min_str", "min"), max_str=("max_str", "max"),
    )
    df = counts.merge(agg, on="column").sort_values(
        "column", ignore_index=True
    )
    return pa.table(
        {"column": pa.array(list(df["column"]), pa.string()),
         "n_rows": pa.array(df["n_rows"].astype("int64").to_numpy()),
         "n_null": pa.array(df["n_null"].astype("int64").to_numpy()),
         "n_distinct": pa.array(df["n_distinct"].astype("int64").to_numpy()),
         "min_num": pa.array(
             [None if pd_isna(x) else int(x) for x in df["min_num"]],
             pa.int64(),
         ),
         "max_num": pa.array(
             [None if pd_isna(x) else int(x) for x in df["max_num"]],
             pa.int64(),
         ),
         "min_str": pa.array(
             [None if pd_isna(x) else x for x in df["min_str"]], pa.string()
         ),
         "max_str": pa.array(
             [None if pd_isna(x) else x for x in df["max_str"]], pa.string()
         )}
    )


def orders_skyline(sf_dir: str) -> pa.Table:
    """2-D Pareto frontier (skyline) over ``orders``: the maximal set
    under joint (price_cents, day) dominance -- "no other order is at
    least as expensive AND at least as recent, strictly better in
    one".  The multi-objective filter behind best-offer search and
    data-curation frontier selection; Ray Data has no skyline
    primitive, so it composes from the repo's partial-aggregate
    pattern.  Output is one row per surviving DISTINCT (price, day)
    point with its order count and min orderkey, price-descending.

    Distributed shape: per-block (price, day) aggregation + LOCAL
    skyline filter.  Dominance is transitive, so a block's skyline
    dominates everything the block dropped -- a locally dominated
    point is globally dominated, and a globally surviving point is
    dropped by NO block, so its count partials all reach the merge
    (exactness argument the test pins).  Local skylines are
    frontier-sized (O(log n) expected on independent dims), so the
    final merge is one single-block sweep over tiny partials
    (``repartition(1)``), never a driver loop."""
    day_us = np.int64(86_400 * _US)

    part_schema = pa.schema(
        [("price_cents", pa.int64()), ("day", pa.int64()),
         ("n_orders", pa.int64()), ("min_orderkey", pa.int64())]
    )

    # day < 2^21 (epoch days ~2e4) and price_cents < 2^26 (TPC-H
    # totalprice tops out ~6e7 cents): the packed key fits int64.
    _DAY_BITS = 21

    def kernel(price, day, cnt, mk):
        """Aggregate per (price, day) then keep the Pareto frontier.
        Returns (price, day, count, min_orderkey) arrays."""
        comb = price * (np.int64(1) << _DAY_BITS) + day
        order = np.argsort(comb, kind="stable")
        comb_s = comb[order]
        starts = np.flatnonzero(np.r_[True, comb_s[1:] != comb_s[:-1]])
        n = np.add.reduceat(cnt[order], starts)
        k = np.minimum.reduceat(mk[order], starts)
        u = comb_s[starts]
        up = u >> _DAY_BITS
        ud = u & ((np.int64(1) << _DAY_BITS) - 1)
        # prices ascending, days ascending within a price group: the
        # group's last element is its max day; lower days in the same
        # group are dominated by it
        pstarts = np.flatnonzero(np.r_[True, up[1:] != up[:-1]])
        pend = np.r_[pstarts[1:], len(up)] - 1
        maxd = ud[pend]
        # survivor test vs strictly greater prices: suffix max of day
        nxt = np.r_[
            np.maximum.accumulate(maxd[::-1])[::-1][1:], np.int64(-1)
        ]
        keep = pend[maxd > nxt]
        return up[keep], ud[keep], n[keep], k[keep]

    def to_table(p, d, n, k) -> pa.Table:
        return pa.table(
            {"price_cents": pa.array(p), "day": pa.array(d),
             "n_orders": pa.array(n), "min_orderkey": pa.array(k)},
            schema=part_schema,
        )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        price = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        day = _ts_i64(t.column("o_orderdate")) // day_us
        mk = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return to_table(
            *kernel(price, day, np.ones(t.num_rows, np.int64), mk)
        )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        return to_table(*kernel(
            t.column("price_cents").to_numpy(zero_copy_only=False),
            t.column("day").to_numpy(zero_copy_only=False),
            t.column("n_orders").to_numpy(zero_copy_only=False),
            t.column("min_orderkey").to_numpy(zero_copy_only=False),
        ))

    df = (
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_totalprice", "o_orderdate"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    df = df.sort_values("price_cents", ascending=False, ignore_index=True)
    return pa.table(
        {c: pa.array(df[c].astype("int64").to_numpy())
         for c in ("price_cents", "day", "n_orders", "min_orderkey")}
    )


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 16 bits of ``x`` to the even bit
    positions of a 32-bit word (Morton interleave half)."""
    x = x.astype(np.int64) & np.int64(0xFFFF)
    x = (x | (x << 8)) & np.int64(0x00FF00FF)
    x = (x | (x << 4)) & np.int64(0x0F0F0F0F)
    x = (x | (x << 2)) & np.int64(0x33333333)
    x = (x | (x << 1)) & np.int64(0x55555555)
    return x


def orders_zorder_layout(sf_dir: str, prefix_bits: int = 4) -> pa.Table:
    """Z-order (Morton-curve) clustering layout over ``orders`` --
    the OPTIMIZE ZORDER BY (custkey, orderdate) primitive of
    copy-on-write lakes: min-max scale both clustering dimensions to
    the full 16-bit domain (raw values share their high bits, which
    would collapse every row into one Z-range -- scaling is what real
    Z-ordering does too), interleave them into a 32-bit Morton code,
    assign each row to one of ``2**prefix_bits`` Z-range files (the
    code's top bits), and report per-file locality stats (row count,
    min/max of each scaled dimension and of the code itself).  Tight
    per-bucket dimension ranges are exactly what makes later range
    queries prune files on EITHER dimension -- the property the
    gate's min/max columns pin.

    Distributed shape: a tiny bounds pass (per-block 4-int min/max
    partials, driver-merged) then one layout pass; the scaling is
    exact integer arithmetic (``(v - lo) * 65535 // range``, floor
    division restated verbatim in the oracle), the Morton interleave
    is five shift-mask numpy ops per dimension, partials are
    bucket-bounded (<= 2**prefix_bits rows per block), merged
    driver-side like `table_profile` (group-bounded, never
    row-bounded)."""
    day_us = np.int64(86_400 * _US)
    shift = np.int64(32 - prefix_bits)

    def dims(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        return (
            t.column("o_custkey").to_numpy(zero_copy_only=False),
            _ts_i64(t.column("o_orderdate")) // day_us,
        )

    bounds_schema = pa.schema(
        [("min_c", pa.int64()), ("max_c", pa.int64()),
         ("min_d", pa.int64()), ("max_d", pa.int64())]
    )

    def bounds_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return bounds_schema.empty_table()
        c, dy = dims(t)
        return pa.table(
            {"min_c": pa.array([int(c.min())]),
             "max_c": pa.array([int(c.max())]),
             "min_d": pa.array([int(dy.min())]),
             "max_d": pa.array([int(dy.max())])},
            schema=bounds_schema,
        )

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    b = ds.map_batches(bounds_partial, batch_format="pyarrow").to_pandas()
    lo_c, hi_c = int(b["min_c"].min()), int(b["max_c"].max())
    lo_d, hi_d = int(b["min_d"].min()), int(b["max_d"].max())
    rng_c = np.int64(max(hi_c - lo_c, 1))
    rng_d = np.int64(max(hi_d - lo_d, 1))

    part_schema = pa.schema(
        [("zbucket", pa.int64()), ("n_orders", pa.int64()),
         ("min_cx", pa.int64()), ("max_cx", pa.int64()),
         ("min_dy", pa.int64()), ("max_dy", pa.int64()),
         ("min_z", pa.int64()), ("max_z", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        c, dy0 = dims(t)
        cx = (c - np.int64(lo_c)) * np.int64(65535) // rng_c
        dy = (dy0 - np.int64(lo_d)) * np.int64(65535) // rng_d
        z = _spread16(cx) | (_spread16(dy) << 1)
        bk = z >> shift
        order = np.argsort(bk, kind="stable")
        bs, zs = bk[order], z[order]
        cxs, dys = cx[order], dy[order]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[starts[1:], len(bs)]
        return pa.table(
            {"zbucket": pa.array(bs[starts]),
             "n_orders": pa.array(ends - starts),
             "min_cx": pa.array(np.minimum.reduceat(cxs, starts)),
             "max_cx": pa.array(np.maximum.reduceat(cxs, starts)),
             "min_dy": pa.array(np.minimum.reduceat(dys, starts)),
             "max_dy": pa.array(np.maximum.reduceat(dys, starts)),
             "min_z": pa.array(np.minimum.reduceat(zs, starts)),
             "max_z": pa.array(np.maximum.reduceat(zs, starts))},
            schema=part_schema,
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("zbucket", as_index=False).agg(
        n_orders=("n_orders", "sum"),
        min_cx=("min_cx", "min"), max_cx=("max_cx", "max"),
        min_dy=("min_dy", "min"), max_dy=("max_dy", "max"),
        min_z=("min_z", "min"), max_z=("max_z", "max"),
    ).sort_values("zbucket", ignore_index=True)
    return pa.table(
        {c: pa.array(agg[c].astype("int64").to_numpy())
         for c in ("zbucket", "n_orders", "min_cx", "max_cx",
                   "min_dy", "max_dy", "min_z", "max_z")}
    )


def events_frame_agg(sf_dir: str, frame: int = 3) -> pa.Table:
    """Frame-window aggregate: per event, the COUNT/SUM/MAX of value
    cents over the trailing ``frame``-row window (``ROWS BETWEEN 2
    PRECEDING AND CURRENT ROW`` per user, ordered by ts then
    event_id) -- the bounded-frame member of the window family
    (cumulative = `events_running_total`, offset = `events_lag_delta`,
    rank = `events_global_rank`).

    Same distributed shape as lag: ONE user-hash exchange, per-block
    lexsort, then the frame is a cumsum difference (``cs[i] -
    cs[i-w]`` with w clamped to the segment-local position) and a
    max over ``frame`` shifted copies -- O(frame) vectorized ops,
    no per-row loop."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("frame")
    F = int(frame)
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("n_in_frame", pa.int64()), ("frame_sum_cents", pa.int64()),
         ("frame_max_cents", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "frame",
                      t.column("_p").to_numpy(zero_copy_only=False))
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, u))
        u, eid, cents = u[order], eid[order], cents[order]
        n = len(u)
        first = np.concatenate([[True], u[1:] != u[:-1]])
        seg_id = np.cumsum(first) - 1
        base = np.flatnonzero(first)[seg_id]
        idx = np.arange(n, dtype=np.int64)
        pos = idx - base
        w = np.minimum(pos + 1, F)
        cs = np.cumsum(cents)
        prev = idx - w
        sum_f = cs - np.where(prev >= 0, cs[np.maximum(prev, 0)], 0)
        max_f = cents.copy()
        for k in range(1, F):
            shifted = np.empty(n, np.int64)
            shifted[k:] = cents[:-k]
            shifted[:k] = np.iinfo(np.int64).min
            np.maximum(max_f, np.where(pos >= k, shifted, max_f), out=max_f)
        return pa.table(
            {"event_id": pa.array(eid), "user_id": pa.array(u),
             "n_in_frame": pa.array(w), "frame_sum_cents": pa.array(sum_f),
             "frame_max_cents": pa.array(max_f)},
            schema=out_schema,
        )

    res = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False).cast(
        out_schema
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))
    return _finalize_guard(gd, t)


def events_last_touch(sf_dir: str) -> pa.Table:
    """Last-touch attribution: every ``purchase`` event is credited
    to the same user's most recent STRICTLY-preceding non-purchase
    event type ('none' when the purchase is the user's first
    activity); returns per-source purchase counts -- the marketing
    attribution primitive downstream of the funnel gate.

    Distributed shape: user-hash exchange, per-block lexsort, then a
    segment-reset ``maximum.accumulate`` over non-purchase positions
    resolves each row's latest preceding source in O(n); per-block
    partials are source-type-bounded and merged by one tiny
    ``groupby.sum``."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("touch")
    ds = _read(
        sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    part_schema = pa.schema(
        [("src_event_type", pa.string()), ("n_purchases", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(gd, "touch",
                      t.column("_p").to_numpy(zero_copy_only=False))
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        n = len(u)
        first = np.concatenate([[True], u[1:] != u[:-1]])
        base = np.flatnonzero(first)[np.cumsum(first) - 1]
        is_p = et == "purchase"
        pos_np = np.where(~is_p, np.arange(n, dtype=np.int64), -1)
        last = np.maximum.accumulate(pos_np)
        # a purchase row is never its own source (pos_np = -1 there),
        # so `last` at a purchase is strictly preceding; resets at
        # user boundaries via the base comparison
        valid = last >= base
        src = np.where(valid, et[np.maximum(last, 0)], "none")[is_p]
        uniq, counts = np.unique(src.astype(str), return_counts=True)
        return pa.table(
            {"src_event_type": pa.array(list(uniq), pa.string()),
             "n_purchases": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    df = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("src_event_type")
        .sum("n_purchases")
        .to_pandas()
    )
    df.columns = ["src_event_type", "n_purchases"]
    df = df.sort_values("src_event_type", ignore_index=True)
    out = pa.table(
        {"src_event_type": pa.array(list(df["src_event_type"]), pa.string()),
         "n_purchases": pa.array(df["n_purchases"].astype("int64").to_numpy())}
    )
    return _finalize_guard(gd, out)


def events_user_cms(
    sf_dir: str, depth: int = 4, width: int = 64, probe_mod: int = 13
) -> pa.Table:
    """Count-Min sketch over per-user event counts: a ``depth x
    width`` counter matrix (FNV-1a row hashes, seed-prefixed) built
    as MERGEABLE per-block partials -- the sketch property that makes
    it a streaming/distributed primitive -- then probed for every
    user with ``user_id % probe_mod == 0``.  Returns ``(user_id,
    n_events, cms_estimate)``: the exact count next to the sketch
    estimate, whose overcount is the classic CMS collision bias (the
    driver domain packs ~150-1500 users into 64 buckets, so
    collisions are real, and -- like the KMV gate -- the estimate is
    hash-deterministic, so the oracle reproduces it bit-for-bit via
    the same recursive FNV fold).

    Distributed shape: ONE events pass emits (a) d*w-bounded counter
    partials and (b) probe-user exact-count partials; both merge by
    tiny ``groupby.sum``; the probe resolution is probes x depth
    driver arithmetic over the merged counters."""
    ds = _read(sf_dir, "events", columns=["user_id"])
    from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64

    D, W = int(depth), int(width)

    ctr_schema = pa.schema(
        [("seed", pa.int64()), ("bucket", pa.int64()), ("n", pa.int64())]
    )
    probe_schema = pa.schema(
        [("user_id", pa.int64()), ("n", pa.int64())]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return ctr_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        uu, counts = np.unique(u, return_counts=True)
        seeds, buckets, ns = [], [], []
        for s in range(D):
            h = fnv1a_u64([f"{s}:{x}" for x in uu]) % np.uint64(W)
            b = h.astype(np.int64)
            order = np.argsort(b, kind="stable")
            bs = b[order]
            starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
            seeds.extend([s] * len(starts))
            buckets.extend(bs[starts].tolist())
            ns.extend(np.add.reduceat(counts[order], starts).tolist())
        return pa.table(
            {"seed": pa.array(seeds, pa.int64()),
             "bucket": pa.array(buckets, pa.int64()),
             "n": pa.array(ns, pa.int64())},
            schema=ctr_schema,
        )

    def probe_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return probe_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        u = u[u % probe_mod == 0]
        if not len(u):
            return probe_schema.empty_table()
        uu, counts = np.unique(u, return_counts=True)
        return pa.table(
            {"user_id": pa.array(uu), "n": pa.array(counts)},
            schema=probe_schema,
        )

    ctr = ds.map_batches(partials, batch_format="pyarrow").groupby(
        ["seed", "bucket"]
    ).sum("n").to_pandas()
    ctr.columns = ["seed", "bucket", "n"]
    cm = np.zeros((D, W), np.int64)
    cm[ctr["seed"].to_numpy(), ctr["bucket"].to_numpy()] = ctr[
        "n"
    ].to_numpy()

    probes = ds.map_batches(probe_partials, batch_format="pyarrow").groupby(
        "user_id"
    ).sum("n").to_pandas()
    probes.columns = ["user_id", "n"]
    probes = probes.sort_values("user_id", ignore_index=True)
    pu = probes["user_id"].astype("int64").to_numpy()
    est = np.full(len(pu), np.iinfo(np.int64).max)
    for s in range(D):
        b = (fnv1a_u64([f"{s}:{x}" for x in pu]) % np.uint64(W)).astype(
            np.int64
        )
        np.minimum(est, cm[s, b], out=est)
    return pa.table(
        {"user_id": pa.array(pu),
         "n_events": pa.array(probes["n"].astype("int64").to_numpy()),
         "cms_estimate": pa.array(est)}
    )


def events_active_time(sf_dir: str, window_s: int = 300) -> pa.Table:
    """Interval-union coverage: per user, the total microseconds
    covered by the UNION of ``[ts, ts + window_s)`` activity
    intervals -- the "time actually active" metric sessionization
    approximates; overlapping intervals must not double-count, which
    makes it the interval-merge (gaps-and-islands) primitive rather
    than a plain aggregate.

    Distributed shape: user-hash exchange, per-block lexsort, then
    union length = sum of ``max(0, end_i - max(start_i, max_prev_end))``
    with a segment-reset shifted cummax -- one vectorized pass, exact
    in integer microseconds (tie order is irrelevant: an interval
    starting at a covered point contributes its uncovered suffix
    only, which is order-independent for fixed-width windows)."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("active")
    win_us = np.int64(window_s) * _US
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("active_us", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "active",
                      t.column("_p").to_numpy(zero_copy_only=False))
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = _ts_i64(t.column("ts"))
        order = np.lexsort((s, u))
        u, s = u[order], s[order]
        e = s + win_us
        first = np.concatenate([[True], u[1:] != u[:-1]])
        # previous max end within the user segment: the FIXED window
        # width makes ends co-sorted with starts, so the previous end
        # IS the running max (variable widths would need a
        # segment-local cummax instead)
        prev = np.empty(len(e), np.int64)
        prev[1:] = e[:-1]
        prev[first] = 0  # segment reset: first interval fully counts
        cover = np.maximum(e - np.maximum(s, prev), 0)
        cover[first] = win_us
        starts = np.flatnonzero(first)
        return pa.table(
            {"user_id": pa.array(u[starts]),
             "active_us": pa.array(np.add.reduceat(cover, starts))},
            schema=out_schema,
        )

    df = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    df = df.sort_values("user_id", ignore_index=True)
    out = pa.table(
        {"user_id": pa.array(df["user_id"].astype("int64").to_numpy()),
         "active_us": pa.array(df["active_us"].astype("int64").to_numpy())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Market-basket association rules (pair support / confidence / lift)
# ---------------------------------------------------------------------------
def basket_pair_rules(
    sf_dir: str, n_items: int = 97, min_pairs: int = 5
) -> pa.Table:
    """Association-rule mining over order baskets: each order is a
    basket of item classes (``l_partkey % n_items``), and for every
    unordered item pair ``(a < b)`` that co-occurs in a basket we
    report exact ``pair_count`` / per-item basket counts plus the
    classic rule metrics -- ``support = pairs/N``, ``conf_ab =
    pairs/n_a``, ``conf_ba = pairs/n_b``, ``lift = pairs*N /
    (n_a*n_b)`` -- filtered at ``pair_count >= min_pairs``.  The
    float metrics are single IEEE divisions of exact int64 counts, so
    both engines produce bit-identical doubles (no float SUM anywhere).

    Distributed shape (the a-priori counting pass): one orderkey-hash
    exchange so a basket never spans blocks; the per-block sweep
    lexsorts ``(order, item)``, dedupes within-basket repeats,
    generates the pairs of each basket with a repeat/offset
    vectorization (no Python loop), and bincounts them into the
    ``n_items x n_items`` upper triangle.  Per-block partials are
    dimension-bounded (<= T^2 + T + 1 rows with T = n_items), so the
    final ``groupby.sum`` and the driver-side metric arithmetic touch
    only the bounded rule matrix, never the baskets.  Item-class
    vocabularies beyond driver size would swap the marker-row partials
    for a second key-hash exchange (same pattern as ``word_freq_topk``).
    """
    n_rows, _ = _table_meta(sf_dir, "lineitem")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("basket")
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("l_orderkey"), P))
        )

    part_schema = pa.schema(
        [("item_a", pa.int64()), ("item_b", pa.int64()), ("n", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "basket", t.column("_p").to_numpy(zero_copy_only=False)
        )
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        item = (
            t.column("l_partkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            % n_items
        )
        order = np.lexsort((item, ok))
        ok, item = ok[order], item[order]
        # drop within-basket repeats of the same item class
        keep = np.concatenate(
            [[True], (ok[1:] != ok[:-1]) | (item[1:] != item[:-1])]
        )
        ok, item = ok[keep], item[keep]
        starts, lens = _segment_starts(ok)
        # all in-basket pairs, vectorized: element at position p with
        # cpe[p] following basket-mates contributes cpe[p] pairs
        pos = np.arange(len(ok), dtype=np.int64)
        ends = np.repeat(starts + lens, lens)
        cpe = ends - pos - 1
        tot = int(cpe.sum())
        T = n_items
        rows = {"item_a": [], "item_b": [], "n": []}
        if tot > 0:
            a_idx = np.repeat(pos, cpe)
            run_starts = np.cumsum(cpe) - cpe
            off = np.arange(tot, dtype=np.int64) - np.repeat(
                run_starts, cpe
            ) + 1
            b_idx = a_idx + off
            # items ascend within a basket, so item[a_idx] < item[b_idx]
            flat = np.bincount(
                item[a_idx] * T + item[b_idx], minlength=T * T
            )
            nz = np.flatnonzero(flat)
            rows["item_a"].append(nz // T)
            rows["item_b"].append(nz % T)
            rows["n"].append(flat[nz].astype(np.int64))
        # marker partials: per-item basket counts (item_b = -1) and
        # the basket total (item_a = item_b = -2)
        icnt = np.bincount(item, minlength=T)
        inz = np.flatnonzero(icnt)
        rows["item_a"].append(inz.astype(np.int64))
        rows["item_b"].append(np.full(len(inz), -1, np.int64))
        rows["n"].append(icnt[inz].astype(np.int64))
        rows["item_a"].append(np.array([-2], np.int64))
        rows["item_b"].append(np.array([-2], np.int64))
        rows["n"].append(np.array([len(starts)], np.int64))
        return pa.table(
            {k: pa.array(np.concatenate(v)) for k, v in rows.items()},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["item_a", "item_b"])
        .sum("n")
        .to_pandas()
    )
    merged.columns = ["item_a", "item_b", "n"]
    n_orders = int(merged.loc[merged["item_a"] == -2, "n"].iloc[0])
    ic = merged[merged["item_b"] == -1].set_index("item_a")["n"]
    pairs = merged[(merged["item_a"] >= 0) & (merged["item_b"] >= 0)].copy()
    pairs = pairs[pairs["n"] >= min_pairs]
    a = pairs["item_a"].astype("int64").to_numpy()
    b = pairs["item_b"].astype("int64").to_numpy()
    n = pairs["n"].astype("int64").to_numpy()
    n_a = ic.reindex(a).astype("int64").to_numpy()
    n_b = ic.reindex(b).astype("int64").to_numpy()
    out = pa.table(
        {
            "item_a": pa.array(a),
            "item_b": pa.array(b),
            "pair_count": pa.array(n),
            "n_a": pa.array(n_a),
            "n_b": pa.array(n_b),
            "support": pa.array(n.astype(np.float64) / float(n_orders)),
            "conf_ab": pa.array(n.astype(np.float64) / n_a.astype(np.float64)),
            "conf_ba": pa.array(n.astype(np.float64) / n_b.astype(np.float64)),
            "lift": pa.array(
                (n * n_orders).astype(np.float64)
                / (n_a * n_b).astype(np.float64)
            ),
        }
    )
    out = out.take(
        pc.sort_indices(
            out,
            sort_keys=[("item_a", "ascending"), ("item_b", "ascending")],
        )
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Customer RFM segmentation (distributed NTILE over derived metrics)
# ---------------------------------------------------------------------------
def _ntile_bucket(rank0: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from exact 0-based global ranks: the first
    ``n % k`` buckets hold ``n//k + 1`` rows, the rest ``n//k``."""
    big = n // k + 1
    n_big = n % k
    small = max(n // k, 1)
    return np.where(
        rank0 < n_big * big,
        rank0 // big,
        n_big + (rank0 - n_big * big) // small,
    ).astype(np.int64) + 1


def customer_rfm_segments(sf_dir: str, k: int = 4) -> pa.Table:
    """RFM segmentation -- the classic customer-scoring pipeline: per
    customer, recency (days since last order, vs the corpus-max order
    date), frequency (order count) and monetary (exact cents sum),
    each scored into NTILE(k) quartiles under ``(metric, custkey)``
    order, plus the combined ``rfm_code = r*100 + f*10 + m``.

    Distributed shape (three exact global NTILEs without a global
    sort):

    1. one custkey-hash exchange folds orders into the per-customer
       metric rows (a customer never spans blocks);
    2. per metric, the HDR-histogram range planner from
       ``events_global_rank`` assigns value-disjoint ranges with exact
       base offsets (32 KB sketch per block, merged on the driver --
       no exchange), one boundary exchange co-locates each range, and
       the per-block lexsort turns base+local position into the exact
       global rank -> NTILE bucket (bucket sizes derived from the
       exact customer count);
    3. one final custkey exchange pivots the three (custkey, quart)
       streams back onto the metric rows.

    The metric table is ``materialize()``d between passes -- it is
    dimension-sized (one row per active customer) and stays in the
    object store, never on the driver."""
    n_orders, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_orders)
    gd = _new_guard_dir("rfm_fold")
    _DAY_US = 86_400_000_000

    ds = _read(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("o_custkey"), P))
        )

    fold_schema = pa.schema(
        [("custkey", pa.int64()), ("last_us", pa.int64()),
         ("freq", pa.int64()), ("monet_cents", pa.int64())]
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return fold_schema.empty_table()
        _guard_record(
            gd, "rfm_fold", t.column("_p").to_numpy(zero_copy_only=False)
        )
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ts = _ts_i64(t.column("o_orderdate"))
        cents = _cents(
            t.column("o_totalprice").to_numpy(zero_copy_only=False)
        )
        order = np.argsort(ck, kind="stable")
        ck, ts, cents = ck[order], ts[order], cents[order]
        starts, lens = _segment_starts(ck)
        return pa.table(
            {"custkey": pa.array(ck[starts]),
             "last_us": pa.array(np.maximum.reduceat(ts, starts)),
             "freq": pa.array(lens.astype(np.int64)),
             "monet_cents": pa.array(np.add.reduceat(cents, starts))},
            schema=fold_schema,
        )

    metrics = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    mx_us = int(metrics.max("last_us"))
    n_cust = int(metrics.count())
    Pc = _exchange_width(n_cust)

    met_schema = pa.schema(
        [("custkey", pa.int64()), ("r_days", pa.int64()),
         ("freq", pa.int64()), ("monet_cents", pa.int64())]
    )

    def with_recency(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return met_schema.empty_table()
        last = t.column("last_us").to_numpy(zero_copy_only=False)
        return pa.table(
            {"custkey": t.column("custkey"),
             "r_days": pa.array((mx_us - last) // _DAY_US),
             "freq": t.column("freq"),
             "monet_cents": t.column("monet_cents")},
            schema=met_schema,
        )

    met = metrics.map_batches(with_recency, batch_format="pyarrow")

    wide_schema = pa.schema(
        [("custkey", pa.int64()), ("code", pa.int64()),
         ("v1", pa.int64()), ("v2", pa.int64()), ("v3", pa.int64()),
         ("_p", pa.int64())]
    )

    def ntile_pass(col: str, code: int):
        """(custkey, code, quart) rows for one metric's NTILE(k)."""
        gdn = _new_guard_dir(f"rfm_nt{code}")
        # exact int64 histogram: bin the metric itself (NOT via the
        # float cents round-trip of _merged_value_histogram) so the
        # planner's counts and the stamp pass agree bit-for-bit
        NB = 64 * (1 << _QSK_MBITS)

        def block_sketch(t: pa.Table, _c=col) -> pa.Table:
            counts = np.zeros(NB, np.int64)
            if t.num_rows:
                v = t.column(_c).to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                np.add.at(counts, _qsketch_bins(v), 1)
            return pa.table({"counts": pa.array([counts.tobytes()])})

        merged = np.zeros(NB, np.int64)
        for b in met.map_batches(
            block_sketch, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for buf in b.column("counts").to_pylist():
                merged += np.frombuffer(buf, np.int64)
        total = int(merged.sum())
        target = max(1, -(-total // Pc))
        cum_excl = np.concatenate([[np.int64(0)], np.cumsum(merged)[:-1]])
        bin_range = np.minimum(cum_excl // target, Pc - 1).astype(np.int64)
        # base[r] = rows in LOWER-value ranges (ascending rank order)
        range_counts = np.bincount(
            bin_range, weights=merged, minlength=Pc
        ).astype(np.int64)
        base = np.concatenate([[np.int64(0)], np.cumsum(range_counts)[:-1]])

        def nstamp(t: pa.Table, _c=col) -> pa.Table:
            if t.num_rows == 0:
                return wide_schema.empty_table()
            v = t.column(_c).to_numpy(zero_copy_only=False).astype(np.int64)
            z = pa.array(np.zeros(t.num_rows, np.int64))
            return pa.table(
                {"custkey": t.column("custkey"), "code": z,
                 "v1": pa.array(v), "v2": z, "v3": z,
                 "_p": pa.array(bin_range[_qsketch_bins(v)])},
                schema=wide_schema,
            )

        def nsweep(t: pa.Table, _code=code, _gd=gdn) -> pa.Table:
            if t.num_rows == 0:
                return wide_schema.empty_table()
            p = t.column("_p").to_numpy(zero_copy_only=False)
            _guard_record(_gd, f"rfm_nt{_code}", p)
            if not (p == p[0]).all():
                raise RuntimeError(
                    "rfm ntile sweep got a mixed-range block"
                )
            ck = t.column("custkey").to_numpy(zero_copy_only=False)
            v = t.column("v1").to_numpy(zero_copy_only=False)
            order = np.lexsort((ck, v))
            rank0 = np.empty(len(ck), np.int64)
            rank0[order] = int(base[int(p[0])]) + np.arange(
                len(ck), dtype=np.int64
            )
            quart = _ntile_bucket(rank0, n_cust, k)
            z = pa.array(np.zeros(len(ck), np.int64))
            return pa.table(
                {"custkey": pa.array(ck),
                 "code": pa.array(np.full(len(ck), _code, np.int64)),
                 "v1": pa.array(quart), "v2": z, "v3": z,
                 "_p": pa.array(
                     partition_ids(pa.array(ck.astype(np.int64)), Pc)
                 )},
                schema=wide_schema,
            )

        out = (
            met.map_batches(nstamp, batch_format="pyarrow")
            .sort("_p", boundaries=list(range(1, Pc)))
            .map_batches(nsweep, batch_format="pyarrow", batch_size=None)
        )
        return out, gdn

    r_ds, gd_r = ntile_pass("r_days", 1)
    f_ds, gd_f = ntile_pass("freq", 2)
    m_ds, gd_m = ntile_pass("monet_cents", 3)

    def met_wide(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return wide_schema.empty_table()
        return pa.table(
            {"custkey": t.column("custkey"),
             "code": pa.array(np.zeros(t.num_rows, np.int64)),
             "v1": t.column("r_days"), "v2": t.column("freq"),
             "v3": t.column("monet_cents"),
             "_p": pa.array(partition_ids(t.column("custkey"), Pc))},
            schema=wide_schema,
        )

    gd_fin = _new_guard_dir("rfm_pivot")
    out_schema = pa.schema(
        [("custkey", pa.int64()), ("r_days", pa.int64()),
         ("freq", pa.int64()), ("monet_cents", pa.int64()),
         ("r_quart", pa.int64()), ("f_quart", pa.int64()),
         ("m_quart", pa.int64()), ("rfm_code", pa.int64())]
    )

    def pivot(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd_fin, "rfm_pivot",
            t.column("_p").to_numpy(zero_copy_only=False),
        )
        ck = t.column("custkey").to_numpy(zero_copy_only=False)
        code = t.column("code").to_numpy(zero_copy_only=False)
        v1 = t.column("v1").to_numpy(zero_copy_only=False)
        v2 = t.column("v2").to_numpy(zero_copy_only=False)
        v3 = t.column("v3").to_numpy(zero_copy_only=False)
        order = np.lexsort((code, ck))
        ck, code, v1, v2, v3 = (
            ck[order], code[order], v1[order], v2[order], v3[order]
        )
        starts, lens = _segment_starts(ck)
        if not (lens == 4).all():
            raise RuntimeError(
                "rfm pivot expects exactly 4 rows per customer "
                f"(metrics + 3 quarts); got lens {np.unique(lens)}"
            )
        # rows per customer arrive code-sorted: 0=metrics, 1=r, 2=f, 3=m
        met_i, r_i, f_i, m_i = starts, starts + 1, starts + 2, starts + 3
        rq, fq, mq = v1[r_i], v1[f_i], v1[m_i]
        return pa.table(
            {"custkey": pa.array(ck[met_i]),
             "r_days": pa.array(v1[met_i]), "freq": pa.array(v2[met_i]),
             "monet_cents": pa.array(v3[met_i]),
             "r_quart": pa.array(rq), "f_quart": pa.array(fq),
             "m_quart": pa.array(mq),
             "rfm_code": pa.array(rq * 100 + fq * 10 + mq)},
            schema=out_schema,
        )

    combined = (
        met.map_batches(met_wide, batch_format="pyarrow")
        .union(r_ds, f_ds, m_ds)
        .sort("_p", boundaries=list(range(1, Pc)))
        .map_batches(pivot, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(combined.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    for g in (gd, gd_r, gd_f, gd_m, gd_fin):
        t = _finalize_guard(g, t)
    return t.take(pc.sort_indices(t, sort_keys=[("custkey", "ascending")]))


# ---------------------------------------------------------------------------
# Per-group OLS trend (exact integer sufficient statistics)
# ---------------------------------------------------------------------------
#: Hour-index origin for the trend regressor: hours-since-epoch of
#: 2023-12-19 00:00 UTC.  Subtracting a fixed origin keeps x small
#: (and x*y / x*x limb-safe) without a pre-pass over the data; the
#: DuckDB oracle subtracts the same constant.
_TREND_H0 = 473_000
_LIMB = 1 << 25  # same base-2^25 limb split as lineitem_qp_corr


def events_type_trend(sf_dir: str) -> pa.Table:
    """Per-``event_type`` ordinary-least-squares trend of value cents
    against event time (hour granularity): the grouped
    ``regr_slope`` / ``regr_intercept`` pair, computed from EXACT
    integer sufficient statistics ``(n, Sx, Sy, Sxy, Sxx)`` so the
    two engines cannot diverge on float summation order.  ``x`` is
    hours since ``_TREND_H0``, ``y`` is floor-cents.

    ``Sxy`` and ``Sxx`` use the ``lineitem_qp_corr`` two-limb
    widening (``v >> 25`` / ``v & (2^25-1)`` partial sums, exact past
    1e10 rows); ``slope_e9 = floor(1e9 * (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2))`` and ``intercept_e6 = floor(1e6 *
    (Sy*Sxx - Sx*Sxy) / (n*Sxx - Sx^2))`` are reassembled from the
    limbs in arbitrary-precision Python ints on the driver (one row
    per type) and restated in DuckDB HUGEINT with an explicit
    floor-division CASE (DuckDB ``//`` truncates toward zero; Python
    floors).  Degenerate groups (zero x-variance) report 0/0.

    Domain contract (loud, never silent): ``0 <= x < 2^20`` (about
    120 years of data from the origin) and ``0 <= y < 2^26`` --
    negative cents would flip the limb-split floor/trunc parity
    between numpy ``>>`` and DuckDB ``//``; out-of-range data raises.

    Scale shape: column-pruned read -> per-block lexsort+reduceat
    partial (one row per type per block) -> dim-bounded
    ``groupby.sum`` -> O(types) driver math.  No raw-row shuffle."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64()),
         ("sum_x", pa.int64()), ("sum_y", pa.int64()),
         ("sxy_hi", pa.int64()), ("sxy_lo", pa.int64()),
         ("sxx_hi", pa.int64()), ("sxx_lo", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        x = _ts_i64(t.column("ts")) // 3_600_000_000 - _TREND_H0
        y = _cents(t.column("value").to_numpy(zero_copy_only=False))
        if x.size and not (
            0 <= int(x.min()) and int(x.max()) < (1 << 20)
            and 0 <= int(y.min()) and int(y.max()) < (1 << 26)
        ):
            raise ValueError(
                "events_type_trend domain: need 0 <= hour-_TREND_H0 < 2^20 "
                "and 0 <= cents < 2^26 (limb split is unsigned); widen the "
                "limbs for data outside this window"
            )
        xy = x * y
        xx = x * x
        order, starts, counts = _group_segments(et)
        et, xy, xx = et[order], xy[order], xx[order]
        xs, ys = x[order], y[order]
        return pa.table(
            {"event_type": pa.array(list(et[starts]), pa.string()),
             "n": pa.array(counts.astype(np.int64)),
             "sum_x": pa.array(np.add.reduceat(xs, starts)),
             "sum_y": pa.array(np.add.reduceat(ys, starts)),
             "sxy_hi": pa.array(np.add.reduceat(xy >> 25, starts)),
             "sxy_lo": pa.array(np.add.reduceat(xy & (_LIMB - 1), starts)),
             "sxx_hi": pa.array(np.add.reduceat(xx >> 25, starts)),
             "sxx_lo": pa.array(np.add.reduceat(xx & (_LIMB - 1), starts))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n", "sum_x", "sum_y", "sxy_hi", "sxy_lo", "sxx_hi", "sxx_lo"])
        .to_pandas()
    )
    merged.columns = ["event_type", "n", "sum_x", "sum_y",
                      "sxy_hi", "sxy_lo", "sxx_hi", "sxx_lo"]

    rows = {k: [] for k in ("event_type", "n", "sum_x", "sum_y",
                            "sum_xy", "sum_xx", "slope_e9", "intercept_e6")}
    for r in merged.itertuples(index=False):
        n, sx, sy = int(r.n), int(r.sum_x), int(r.sum_y)
        sxy = int(r.sxy_hi) * _LIMB + int(r.sxy_lo)
        sxx = int(r.sxx_hi) * _LIMB + int(r.sxx_lo)
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) * 10**9 // den if den else 0
        icpt = (sy * sxx - sx * sxy) * 10**6 // den if den else 0
        for k, v in (("event_type", r.event_type), ("n", n), ("sum_x", sx),
                     ("sum_y", sy), ("sum_xy", sxy), ("sum_xx", sxx),
                     ("slope_e9", slope), ("intercept_e6", icpt)):
            rows[k].append(v)
    out = pa.table(
        {"event_type": pa.array(rows["event_type"], pa.string()),
         **{k: pa.array(rows[k], pa.int64()) for k in
            ("n", "sum_x", "sum_y", "sum_xy", "sum_xx",
             "slope_e9", "intercept_e6")}}
    )
    return out.take(pc.sort_indices(out, sort_keys=[("event_type", "ascending")]))


# ---------------------------------------------------------------------------
# Per-user modal event type (grouped argmax with deterministic ties)
# ---------------------------------------------------------------------------
def events_user_mode(sf_dir: str) -> pa.Table:
    """Per-user modal ``event_type`` -- the grouped MODE aggregate
    with a deterministic tie-break (highest count, then
    lexicographically smallest type), i.e. the distributed analog of
    ``row_number() OVER (PARTITION BY user ORDER BY n DESC, type)``.

    Scale shape: per-block (user, type) count partials (lexsort +
    reduceat -- the raw rows never shuffle), ONE hash exchange of the
    partials on ``user_id``, then a per-block sweep that merges the
    partials and takes each user's argmax row.  Exchange integrity is
    covered by the standard guard; width derives from input size."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("usermode")

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()),
         ("n", pa.int64()), ("_p", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((et, u))
        u, et = u[order], et[order]
        brk = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        )
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(u)))
        uu = u[starts]
        return pa.table(
            {"user_id": pa.array(uu),
             "event_type": pa.array(list(et[starts]), pa.string()),
             "n": pa.array(counts.astype(np.int64)),
             "_p": pa.array(partition_ids(pa.array(uu), P))},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("mode_type", pa.string()),
         ("mode_n", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "mode", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        n = t.column("n").to_numpy(zero_copy_only=False)
        # merge cross-block partials for the same (user, type)
        order = np.lexsort((et, u))
        u, et, n = u[order], et[order], n[order]
        brk = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        )
        starts = np.flatnonzero(brk)
        u, et = u[starts], et[starts]
        n = np.add.reduceat(n, starts)
        # per-user argmax: sort by (user, -n, type); first row per user
        order = np.lexsort((et, -n, u))
        u, et, n = u[order], et[order], n[order]
        first = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        return pa.table(
            {"user_id": pa.array(u[first]),
             "mode_type": pa.array(list(et[first]), pa.string()),
             "mode_n": pa.array(n[first])},
            schema=out_schema,
        )

    res = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = _finalize_guard(gd, t)
    return t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))


# ---------------------------------------------------------------------------
# Chi-square contingency screen (exact rational, integer-scaled)
# ---------------------------------------------------------------------------
def events_hour_chi2(sf_dir: str) -> pa.Table:
    """Chi-square independence screen between ``event_type`` and
    hour-of-day: the full contingency table plus each cell's exact
    chi-square contribution ``floor(1e6 * (O*N - R*C)^2 /
    (R*C*N))`` -- i.e. ``1e6 * (O-E)^2/E`` cleared of the rational
    expected value ``E = R*C/N`` so both engines compute ONE integer
    floor division instead of accumulating float error.  All terms
    are nonnegative, so DuckDB's truncating HUGEINT ``//`` equals
    Python's floor ``//`` (the engine uses arbitrary-precision ints;
    the HUGEINT restatement is exact to ~1e9-row cells -- past that
    ``(O*N)^2`` exceeds 128 bits and the oracle, not the engine,
    would need a gcd reduction).

    Scale shape: one per-block lexsort+reduceat partial over
    (type, hour) -> dim-bounded ``groupby.sum`` (types x 24 cells) ->
    O(cells) exact driver math.  The raw rows never shuffle."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000 % 24
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        et, hr = et[order][starts], hr[order][starts]
        return pa.table(
            {"event_type": pa.array(list(et), pa.string()),
             "hour": pa.array(hr),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n_obs"]
    et = merged["event_type"].to_numpy(dtype=object)
    hr = merged["hour"].to_numpy(dtype=np.int64)
    obs = merged["n_obs"].to_numpy(dtype=np.int64)
    total = int(obs.sum())
    row_tot = {k: 0 for k in set(et)}
    col_tot = {int(h): 0 for h in set(hr)}
    for e, h, o in zip(et, hr, obs):
        row_tot[e] += int(o)
        col_tot[int(h)] += int(o)
    chi = [
        (int(o) * total - row_tot[e] * col_tot[int(h)]) ** 2 * 10**6
        // (row_tot[e] * col_tot[int(h)] * total)
        for e, h, o in zip(et, hr, obs)
    ]
    out = pa.table(
        {"event_type": pa.array(list(et), pa.string()),
         "hour": pa.array(hr),
         "n_obs": pa.array(obs),
         "chi2_cell_e6": pa.array(chi, pa.int64())}
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("event_type", "ascending"), ("hour", "ascending")],
        )
    )


# ---------------------------------------------------------------------------
# Windowed co-occurrence (stream-stream self-join within a time bound)
# ---------------------------------------------------------------------------
def events_cooccurrence(sf_dir: str, window_minutes: int = 5) -> pa.Table:
    """Per ordered type pair ``(type_a, type_b)``: how many event
    pairs of the SAME user have ``b`` at-or-after ``a`` within
    ``window_minutes`` -- the bounded stream-stream self-join every
    "what follows what" analysis needs (a windowed theta join, not an
    equi/as-of join: one left row matches a RANGE of right rows).
    Pair order is ``(ts, event_id)`` lexicographic, so simultaneous
    events pair in one deterministic direction; a row never pairs
    with itself.

    Scale shape: ONE hash exchange on ``user_id``, then a per-block
    vectorized sweep: sort the block by (user, ts, event_id), find
    each row's window end with ``np.searchsorted`` capped at its user
    segment end, expand the (start, end) ranges with the standard
    repeat+arange trick (no Python loop over rows or pairs), encode
    pairs as ``code_a * K + code_b`` over block-local factorized
    types, and ``bincount``.  Per-block pair counts are tiny
    (types x types); the final cross-block reduce is a dim-bounded
    ``groupby.sum``.  Pair volume is bounded by the window width --
    the block never materializes the O(n^2) unwindowed join."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    win_us = np.int64(window_minutes * 60 * _US)
    gd = _new_guard_dir("cooccur")

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    part_schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()),
         ("n_pairs", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "cooc", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        n = len(u)
        # window end per row: first index past ts_i + W, capped at the
        # user segment end (searchsorted over the block-sorted ts is
        # valid within a segment because ts is the second sort key)
        seg_starts = np.flatnonzero(
            np.concatenate([[True], u[1:] != u[:-1]])
        )
        seg_lens = np.diff(np.append(seg_starts, n))
        seg_ends = np.append(seg_starts[1:], n)
        row_seg_end = np.repeat(seg_ends, seg_lens)
        # ts is piecewise-sorted (per user segment).  Lift each
        # segment onto a disjoint, increasing key range -- key =
        # seg_idx * stride + (ts - min) -- so ONE global searchsorted
        # answers every segment at once; fall back to a per-segment
        # loop (still a vectorized searchsorted per user) only if the
        # composite key cannot fit int64.
        rel = ts - ts.min()
        stride = int(rel.max()) + int(win_us) + 1
        seg_idx = np.repeat(
            np.arange(len(seg_starts), dtype=np.int64), seg_lens
        )
        if len(seg_starts) * stride < (1 << 62):
            key = seg_idx * stride + rel
            win_end = np.searchsorted(key, key + win_us, side="right")
        else:
            win_end = np.empty(n, dtype=np.int64)
            for s, e in zip(seg_starts, seg_ends):
                win_end[s:e] = s + np.searchsorted(
                    ts[s:e], ts[s:e] + win_us, side="right"
                )
        win_end = np.minimum(win_end, row_seg_end)
        starts = np.arange(n, dtype=np.int64) + 1
        counts = np.maximum(win_end - starts, 0)
        total = int(counts.sum())
        if total == 0:
            return part_schema.empty_table()
        # expand ranges: j = start_i + offset within each range
        i_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        j_idx = starts[i_idx] + offs
        types, codes = np.unique(et, return_inverse=True)
        k = len(types)
        pair_code = codes[i_idx] * k + codes[j_idx]
        cnt = np.bincount(pair_code, minlength=k * k).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"type_a": pa.array([str(types[c // k]) for c in nz],
                                pa.string()),
             "type_b": pa.array([str(types[c % k]) for c in nz],
                                pa.string()),
             "n_pairs": pa.array(cnt[nz])},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["type_a", "type_b"])
        .sum("n_pairs")
        .to_pandas()
    )
    merged.columns = ["type_a", "type_b", "n_pairs"]
    out = pa.table(
        {"type_a": pa.array(merged["type_a"], pa.string()),
         "type_b": pa.array(merged["type_b"], pa.string()),
         "n_pairs": pa.array(merged["n_pairs"].astype(np.int64))}
    )
    out = _finalize_guard(gd, out)
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("type_a", "ascending"), ("type_b", "ascending")]
        )
    )


# ---------------------------------------------------------------------------
# Grouped weighted median (exact order statistic under weights)
# ---------------------------------------------------------------------------
def lineitem_weighted_median(sf_dir: str) -> pa.Table:
    """Per-``l_returnflag`` WEIGHTED lower median of extended-price
    cents, weighted by (floored) quantity: the smallest price ``y``
    whose cumulative weight reaches half the group's total
    (``2*cumw(y) >= totw``) -- the exact grouped order statistic
    under weights, which no single-pass aggregate expresses.

    Scale shape: per-block (flag, cents) weight partials (lexsort +
    reduceat over a composite sort -- raw rows never shuffle), ONE
    hash exchange of the partials on the group key, then a per-block
    sweep that merges duplicate cells, prefix-sums each group's
    weight histogram in cents order, and picks the crossing cell.
    The value domain (distinct cents per group) bounds partial size,
    not the row count."""
    n_rows, _ = _table_meta(sf_dir, "lineitem")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("wmedian")

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    part_schema = pa.schema(
        [("l_returnflag", pa.string()), ("cents", pa.int64()),
         ("w", pa.int64()), ("_p", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        rf = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        cents = _cents(t.column("l_extendedprice").to_numpy(zero_copy_only=False))
        w = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        order = np.lexsort((cents, rf))
        rf, cents, w = rf[order], cents[order], w[order]
        brk = np.concatenate(
            [[True], (rf[1:] != rf[:-1]) | (cents[1:] != cents[:-1])]
        )
        starts = np.flatnonzero(brk)
        rfs = rf[starts]
        return pa.table(
            {"l_returnflag": pa.array(list(rfs), pa.string()),
             "cents": pa.array(cents[starts]),
             "w": pa.array(np.add.reduceat(w, starts)),
             "_p": pa.array(
                 partition_ids(pa.array(list(rfs), pa.string()), P)
             )},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("l_returnflag", pa.string()), ("total_w", pa.int64()),
         ("wmedian_cents", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "wmed", t.column("_p").to_numpy(zero_copy_only=False)
        )
        rf = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, rf))
        rf, cents, w = rf[order], cents[order], w[order]
        brk = np.concatenate(
            [[True], (rf[1:] != rf[:-1]) | (cents[1:] != cents[:-1])]
        )
        starts = np.flatnonzero(brk)
        rf, cents = rf[starts], cents[starts]
        w = np.add.reduceat(w, starts)
        # per-group prefix sums and totals over the merged histogram
        gstarts = np.flatnonzero(
            np.concatenate([[True], rf[1:] != rf[:-1]])
        )
        glens = np.diff(np.append(gstarts, len(rf)))
        cum = np.cumsum(w)
        base = np.repeat(cum[gstarts] - w[gstarts], glens)
        cum = cum - base
        tot = np.repeat(np.add.reduceat(w, gstarts), glens)
        hit = 2 * cum >= tot
        # first crossing cell per group = argmax of hit within group
        first_hit = np.zeros(len(gstarts), dtype=np.int64)
        for gi, (s, ln) in enumerate(zip(gstarts, glens)):  # O(groups)
            first_hit[gi] = s + int(np.argmax(hit[s:s + ln]))
        return pa.table(
            {"l_returnflag": pa.array(list(rf[gstarts]), pa.string()),
             "total_w": pa.array(tot[gstarts]),
             "wmedian_cents": pa.array(cents[first_hit])},
            schema=out_schema,
        )

    res = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = _finalize_guard(gd, t)
    return t.take(
        pc.sort_indices(t, sort_keys=[("l_returnflag", "ascending")])
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (wide -> long reshape)
# ---------------------------------------------------------------------------
_MELT_MEASURES = (("quantity", "l_quantity"), ("extendedprice",
                  "l_extendedprice"), ("discount", "l_discount"),
                  ("tax", "l_tax"))


def lineitem_melt(sf_dir: str, one_in: int = 31) -> pa.Table:
    """UNPIVOT: reshape the four lineitem measures into long form
    ``(l_orderkey, l_linenumber, measure, value_e4)`` -- the inverse
    of ``events_type_pivot`` and the reshape every
    one-metric-per-row ingestion needs.  Values are uniform
    ``floor(v * 1e4)`` fixed-point so rates (4 decimal digits) and
    prices share one exact integer column.  Deterministic 1-in-``N``
    orderkey sampling keeps the long output result-sized at any
    scale (the reshape itself is per-row and embarrassingly
    parallel; a full melt would just be this without the filter).

    Scale shape: column-pruned read -> one vectorized map_batches
    (filter + 4-way concatenate); no shuffle at all -- melt is the
    rare reshape that never moves a row between workers."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber"] +
                [c for _, c in _MELT_MEASURES],
    )

    out_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_linenumber", pa.int64()),
         ("measure", pa.string()), ("value_e4", pa.int64())]
    )

    def melt(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        m = ok % one_in == 0
        if not m.any():
            return out_schema.empty_table()
        ok = ok[m].astype(np.int64)
        ln = t.column("l_linenumber").to_numpy(
            zero_copy_only=False)[m].astype(np.int64)
        k = len(ok)
        names, vals = [], []
        for mname, col in _MELT_MEASURES:
            v = t.column(col).to_numpy(zero_copy_only=False)[m]
            names += [mname] * k
            vals.append(np.floor(v * 10000.0).astype(np.int64))
        return pa.table(
            {"l_orderkey": pa.array(np.tile(ok, len(_MELT_MEASURES))),
             "l_linenumber": pa.array(np.tile(ln, len(_MELT_MEASURES))),
             "measure": pa.array(names, pa.string()),
             "value_e4": pa.array(np.concatenate(vals))},
            schema=out_schema,
        )

    t = pa.Table.from_pandas(
        ds.map_batches(melt, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    ).cast(out_schema)
    return t.take(
        pc.sort_indices(
            t,
            sort_keys=[("l_orderkey", "ascending"),
                       ("l_linenumber", "ascending"),
                       ("measure", "ascending")],
        )
    )


# ---------------------------------------------------------------------------
# Equi-width histogram (grouped fixed-bin counts)
# ---------------------------------------------------------------------------
def events_value_histogram(
    sf_dir: str, bin_width: int = 50, n_bins: int = 10
) -> pa.Table:
    """Per-``event_type`` equi-width histogram of ``value``:
    ``bin = min(floor(value / bin_width), n_bins - 1)`` (top bin
    open).  The fixed-bin profile every numeric-column monitor wants
    -- and, unlike the quantile queries, a pure single-pass
    distributive aggregate.

    Scale shape: per-block lexsort+reduceat partial over the composite
    (type, bin) key -> dim-bounded ``groupby.sum``; only nonempty
    bins are emitted."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("bin", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.minimum(
            np.floor(v / float(bin_width)).astype(np.int64), n_bins - 1
        )
        key = np.asarray([f"{e}\x00{x:03d}" for e, x in zip(et, b)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "bin": pa.array(b[order][starts]),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "bin", "n_obs"]
    out = pa.table(
        {"event_type": pa.array(merged["event_type"], pa.string()),
         "bin": pa.array(merged["bin"].astype(np.int64)),
         "n_obs": pa.array(merged["n_obs"].astype(np.int64))}
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("event_type", "ascending"), ("bin", "ascending")],
        )
    )


# ---------------------------------------------------------------------------
# Gini concentration index (exact rational over a value histogram)
# ---------------------------------------------------------------------------
def events_type_gini(sf_dir: str) -> pa.Table:
    """Per-``event_type`` Gini coefficient of ``value`` cents,
    EXACT: ``G = (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x))``
    over the ascending sort, emitted as ``floor(G * 1e6)``.  Tied
    values make ``sum(i*x_(i))`` order-invariant, and over a value
    HISTOGRAM the rank sum per distinct value ``v`` (count ``c``,
    ``C`` rows before it) closes to
    ``v * ((C+c)(C+c+1) - C(C+1)) / 2`` -- consecutive-integer
    products are even, so the halving is exact in integers.  DuckDB
    restates the identical formula in HUGEINT with window prefix
    sums.

    Scale shape: per-block (type, cents) count partials (raw rows
    never shuffle), ONE hash exchange on the group key, then a
    per-block sweep whose final accumulation runs in
    arbitrary-precision Python ints over the merged histogram --
    O(value domain) per group, NOT O(rows), so no int64 widening is
    ever needed (rank products are ~n^2)."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("gini")

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("cents", pa.int64()),
         ("c", pa.int64()), ("_p", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((cents, et))
        et, cents = et[order], cents[order]
        brk = np.concatenate(
            [[True], (et[1:] != et[:-1]) | (cents[1:] != cents[:-1])]
        )
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(et)))
        ets = et[starts]
        return pa.table(
            {"event_type": pa.array(list(ets), pa.string()),
             "cents": pa.array(cents[starts]),
             "c": pa.array(counts.astype(np.int64)),
             "_p": pa.array(
                 partition_ids(pa.array(list(ets), pa.string()), P)
             )},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64()),
         ("sum_cents", pa.int64()), ("gini_e6", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "gini", t.column("_p").to_numpy(zero_copy_only=False)
        )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, et))
        et, cents, c = et[order], cents[order], c[order]
        brk = np.concatenate(
            [[True], (et[1:] != et[:-1]) | (cents[1:] != cents[:-1])]
        )
        starts = np.flatnonzero(brk)
        et, cents = et[starts], cents[starts]
        c = np.add.reduceat(c, starts)
        gstarts = np.flatnonzero(
            np.concatenate([[True], et[1:] != et[:-1]])
        )
        glens = np.diff(np.append(gstarts, len(et)))
        names, ns, sums, ginis = [], [], [], []
        for s, ln in zip(gstarts.tolist(), glens.tolist()):
            vs = cents[s:s + ln].tolist()
            cs = c[s:s + ln].tolist()
            C = 0
            two_sum_ix = 0
            sumx = 0
            for v, cc in zip(vs, cs):  # O(value domain), exact bigints
                two_sum_ix += v * ((C + cc) * (C + cc + 1) - C * (C + 1)) // 2
                sumx += v * cc
                C += cc
            n = C
            g = ((2 * two_sum_ix - (n + 1) * sumx) * 10**6 // (n * sumx)
                 if sumx else 0)
            names.append(et[s])
            ns.append(n)
            sums.append(sumx)
            ginis.append(g)
        return pa.table(
            {"event_type": pa.array(names, pa.string()),
             "n": pa.array(ns, pa.int64()),
             "sum_cents": pa.array(sums, pa.int64()),
             "gini_e6": pa.array(ginis, pa.int64())},
            schema=out_schema,
        )

    res = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = _finalize_guard(gd, t)
    return t.take(
        pc.sort_indices(t, sort_keys=[("event_type", "ascending")])
    )


# ---------------------------------------------------------------------------
# AR(1) autoregression over the densified hourly series
# ---------------------------------------------------------------------------
def events_hourly_ar1(sf_dir: str) -> pa.Table:
    """Per-``event_type`` lag-1 autoregression coefficient of the
    DENSE hourly event-count series (missing hours count 0, exactly
    like ``events_resample_ffill``'s densification contract):
    ``phi = (m*Sxy - Sx*Sy) / (m*Sxx - Sx^2)`` over the
    ``(x_t, x_{t+1})`` lag pairs on the global [min_hour, max_hour]
    grid, emitted as exact ``floor(phi * 1e6)`` plus the integer
    sufficient sums -- the time-series persistence diagnostic (is
    traffic bursty or mean-reverting?) beside OHLC and resample.

    Scale shape: ONE per-block lexsort+reduceat partial over
    (type, hour-index) -> dim-bounded ``groupby.sum`` (series cells,
    not rows) -> O(series) driver math in arbitrary-precision ints.
    The raw rows never shuffle; the series length is bounded by the
    data's time span, not its volume."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hour": pa.array(hr[order][starts]),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n_obs"]
    if len(merged) == 0:
        return pa.table(
            {"event_type": pa.array([], pa.string()),
             "m": pa.array([], pa.int64()),
             "sum_x": pa.array([], pa.int64()),
             "sum_xy": pa.array([], pa.int64()),
             "phi_e6": pa.array([], pa.int64())}
        )
    h_lo = int(merged["hour"].min())
    h_hi = int(merged["hour"].max())
    span = h_hi - h_lo + 1
    names, ms, sxs, sxys, phis = [], [], [], [], []
    for et, grp in merged.groupby("event_type", sort=True):
        dense = np.zeros(span, dtype=np.int64)
        dense[grp["hour"].to_numpy(dtype=np.int64) - h_lo] = (
            grp["n_obs"].to_numpy(dtype=np.int64)
        )
        x = [int(v) for v in dense[:-1]]
        y = [int(v) for v in dense[1:]]
        m = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        den = m * sxx - sx * sx
        phi = (m * sxy - sx * sy) * 10**6 // den if den else 0
        names.append(et)
        ms.append(m)
        sxs.append(sx)
        sxys.append(sxy)
        phis.append(phi)
    return pa.table(
        {"event_type": pa.array(names, pa.string()),
         "m": pa.array(ms, pa.int64()),
         "sum_x": pa.array(sxs, pa.int64()),
         "sum_xy": pa.array(sxys, pa.int64()),
         "phi_e6": pa.array(phis, pa.int64())}
    )


# ---------------------------------------------------------------------------
# Decile lift table (model-eval family: NTILE + response rates)
# ---------------------------------------------------------------------------
def customer_decile_lift(sf_dir: str, k: int = 10) -> pa.Table:
    """Score-decile lift table -- the model-evaluation staple: rank
    every customer by account balance (score = acctbal cents + 1e5,
    shifted non-negative for the HDR sketch; a constant shift cannot
    change NTILE order), split into exact NTILE(``k``) deciles under
    ``(score, custkey)`` order, and report each decile's response
    rate (customer placed >= 1 order) as exact
    ``floor(1e6 * responders / n)``.

    Distributed shape: ONE custkey-hash exchange marks responders
    (customer rows + per-block distinct order-custkey partials, union
    -> sweep; orphan order keys are ignored, mirroring the oracle's
    FROM customer), then the ``events_global_rank`` range planner
    turns a 32 KB histogram sketch per block into value-disjoint
    ranges with exact ascending base offsets, one boundary exchange
    co-locates each range, and a per-block lexsort yields exact
    global ranks -> NTILE buckets -> per-block decile partials.  Only
    ``k`` rows reach the driver."""
    n_cust, _ = _table_meta(sf_dir, "customer")
    n_orders, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_cust + n_orders)
    gd = _new_guard_dir("lift_resp")
    SHIFT = np.int64(100_000)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    u_schema = pa.schema(
        [("custkey", pa.int64()), ("score", pa.int64()),
         ("kind", pa.int64()), ("_p", pa.int64())]
    )

    def cust_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return u_schema.empty_table()
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        score = _cents(
            t.column("c_acctbal").to_numpy(zero_copy_only=False)
        ) + SHIFT
        if score.size and int(score.min()) < 0:
            raise ValueError(
                "customer_decile_lift: acctbal below -1000.00; raise SHIFT"
            )
        return pa.table(
            {"custkey": pa.array(ck), "score": pa.array(score),
             "kind": pa.array(np.zeros(len(ck), dtype=np.int64)),
             "_p": pa.array(partition_ids(pa.array(ck), P))},
            schema=u_schema,
        )

    def order_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return u_schema.empty_table()
        ck = np.unique(
            t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        )
        return pa.table(
            {"custkey": pa.array(ck),
             "score": pa.array(np.zeros(len(ck), dtype=np.int64)),
             "kind": pa.array(np.ones(len(ck), dtype=np.int64)),
             "_p": pa.array(partition_ids(pa.array(ck), P))},
            schema=u_schema,
        )

    resp_schema = pa.schema(
        [("custkey", pa.int64()), ("score", pa.int64()),
         ("resp", pa.int64())]
    )

    def mark(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return resp_schema.empty_table()
        _guard_record(
            gd, "lift", t.column("_p").to_numpy(zero_copy_only=False)
        )
        ck = t.column("custkey").to_numpy(zero_copy_only=False)
        score = t.column("score").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        order = np.lexsort((kind, ck))
        ck, score, kind = ck[order], score[order], kind[order]
        starts, lens = _segment_starts(ck)
        # keep only keys whose first row is a customer row (kind 0);
        # order-only keys mirror the oracle's FROM customer
        is_cust = kind[starts] == 0
        has_order = (
            np.add.reduceat(kind, starts) > 0
        )  # any kind-1 row in the segment
        return pa.table(
            {"custkey": pa.array(ck[starts][is_cust]),
             "score": pa.array(score[starts][is_cust]),
             "resp": pa.array(
                 has_order[is_cust].astype(np.int64))},
            schema=resp_schema,
        )

    resp = (
        cust.map_batches(cust_rows, batch_format="pyarrow")
        .union(orders.map_batches(order_rows, batch_format="pyarrow"))
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(mark, batch_format="pyarrow", batch_size=None)
        .materialize()  # dimension-sized (one row per customer)
    )

    # --- exact ascending range planning (events_global_rank pattern)
    NB = 64 * (1 << _QSK_MBITS)

    def block_sketch(t: pa.Table) -> pa.Table:
        counts = np.zeros(NB, np.int64)
        if t.num_rows:
            np.add.at(
                counts,
                _qsketch_bins(
                    t.column("score").to_numpy(zero_copy_only=False)
                ),
                1,
            )
        return pa.table({"counts": pa.array([counts.tobytes()])})

    merged = np.zeros(NB, np.int64)
    for b in resp.map_batches(
        block_sketch, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for buf in b.column("counts").to_pylist():
            merged += np.frombuffer(buf, np.int64)

    Pr = _exchange_width(n_cust)
    total = int(merged.sum())
    target = max(1, -(-total // Pr))
    cum_excl = np.concatenate([[np.int64(0)], np.cumsum(merged)[:-1]])
    bin_range = np.minimum(cum_excl // target, Pr - 1).astype(np.int64)
    range_counts = np.bincount(
        bin_range, weights=merged, minlength=Pr
    ).astype(np.int64)
    base = np.concatenate([[np.int64(0)], np.cumsum(range_counts)[:-1]])

    gd2 = _new_guard_dir("lift_rank")
    part_schema = pa.schema(
        [("decile", pa.int64()), ("n_cust", pa.int64()),
         ("n_resp", pa.int64())]
    )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        s = t.column("score").to_numpy(zero_copy_only=False)
        return t.append_column(
            "_p", pa.array(bin_range[_qsketch_bins(s)])
        )

    def rank_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        p = t.column("_p").to_numpy(zero_copy_only=False)
        _guard_record(gd2, "liftrank", p)
        if not (p == p[0]).all():
            raise RuntimeError(
                "decile-lift sweep got a mixed-range block; base offset "
                "would be wrong"
            )
        ck = t.column("custkey").to_numpy(zero_copy_only=False)
        s = t.column("score").to_numpy(zero_copy_only=False)
        r = t.column("resp").to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, s))
        rank0 = int(base[int(p[0])]) + np.arange(len(ck), dtype=np.int64)
        decile = _ntile_bucket(rank0, n_cust, k)
        rr = r[order]
        nd = np.bincount(decile, minlength=k + 1).astype(np.int64)
        nr = np.bincount(decile, weights=rr, minlength=k + 1).astype(np.int64)
        nz = np.flatnonzero(nd)
        return pa.table(
            {"decile": pa.array(nz.astype(np.int64)),
             "n_cust": pa.array(nd[nz]), "n_resp": pa.array(nr[nz])},
            schema=part_schema,
        )

    merged_df = (
        resp.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, Pr)))
        .map_batches(rank_sweep, batch_format="pyarrow", batch_size=None)
        .groupby("decile")
        .sum(["n_cust", "n_resp"])
        .to_pandas()
    )
    merged_df.columns = ["decile", "n_cust", "n_resp"]
    nd = merged_df["n_cust"].to_numpy(dtype=np.int64)
    nr = merged_df["n_resp"].to_numpy(dtype=np.int64)
    out = pa.table(
        {"decile": pa.array(merged_df["decile"].astype(np.int64)),
         "n_cust": pa.array(nd),
         "n_resp": pa.array(nr),
         "resp_rate_e6": pa.array(
             [int(b) * 10**6 // int(a) for a, b in zip(nd, nr)],
             pa.int64())}
    )
    out = _finalize_guard(gd, out)
    out = _finalize_guard(gd2, out)
    return out.take(pc.sort_indices(out, sort_keys=[("decile", "ascending")]))


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (HAVING on a grouped sum, join back)
# ---------------------------------------------------------------------------
def customer_large_orders(
    sf_dir: str, threshold_qty_cents: int = 25_000, k: int = 100
) -> pa.Table:
    """Large-volume customer report (the TPC-H Q18 shape): the ``k``
    highest-value orders whose TOTAL line-item quantity exceeds the
    threshold (quantities in exact floor-cents, ``floor(qty*100)``),
    joined back to the customer who placed them.  Returns
    ``(c_name, c_custkey, o_orderkey, o_orderdate, totalprice_cents,
    sum_qty_cents)`` ordered by ``(totalprice_cents DESC,
    o_orderkey)``.

    Distributed shape -- the HAVING-then-join-back plan a 100 TB run
    needs:

    * lineitem never ships raw: each block pre-aggregates
      ``(orderkey, qty_cents)`` partials (the combiner), so the
      orderkey exchange moves at most one row per (block, key).
    * ONE hash exchange on ``o_orderkey`` co-locates partials with
      the order row; the per-block sweep folds partials, applies the
      HAVING predicate, and emits only survivors (~1% of orders).
    * survivors join ``customer`` in a SECOND tiny exchange on
      ``c_custkey`` (survivor-sized, not fact-sized), each block
      emitting its local top-``k``; the driver merges P*k rows.
    """
    n_li, _ = _table_meta(sf_dir, "lineitem")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_li + n_or)
    gd = _new_guard_dir("q18a")
    gd2 = _new_guard_dir("q18b")
    thr = np.int64(threshold_qty_cents)

    rel = pa.schema(
        [("_k", pa.int64()), ("_side", pa.int8()), ("_ck", pa.int64()),
         ("_date", pa.int64()), ("_tp", pa.int64()), ("_qty", pa.int64()),
         ("_p", pa.int64())]
    )

    def li_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return rel.empty_table()
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        qty = _cents(t.column("l_quantity").to_numpy(zero_copy_only=False))
        order = np.argsort(ok, kind="stable")
        ok, qty = ok[order], qty[order]
        starts, _ = _segment_starts(ok)
        keys = ok[starts]
        sums = np.add.reduceat(qty, starts)
        z = np.zeros(len(keys), np.int64)
        return pa.table(
            {"_k": pa.array(keys),
             "_side": pa.array(np.ones(len(keys), np.int8)),
             "_ck": pa.array(z), "_date": pa.array(z), "_tp": pa.array(z),
             "_qty": pa.array(sums),
             "_p": pa.array(partition_ids(pa.array(keys), P))},
            schema=rel,
        )

    def order_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return rel.empty_table()
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        od = _ts_i64(t.column("o_orderdate"))
        tp = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        return pa.table(
            {"_k": pa.array(ok),
             "_side": pa.array(np.zeros(len(ok), np.int8)),
             "_ck": pa.array(ck), "_date": pa.array(od), "_tp": pa.array(tp),
             "_qty": pa.array(np.zeros(len(ok), np.int64)),
             "_p": pa.array(partition_ids(pa.array(ok), P))},
            schema=rel,
        )

    surv = pa.schema(
        [("_ck", pa.int64()), ("_ok", pa.int64()), ("_date", pa.int64()),
         ("_tp", pa.int64()), ("_qty", pa.int64()), ("_p", pa.int64())]
    )
    n_cust, _ = _table_meta(sf_dir, "customer")
    P2 = _exchange_width(n_cust)

    def having_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return surv.empty_table()
        _guard_record(gd, "q18", t.column("_p").to_numpy(zero_copy_only=False))
        kcol = t.column("_k").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, kcol))  # order row (side 0) first per key
        kcol, side = kcol[order], side[order]
        ck = t.column("_ck").to_numpy(zero_copy_only=False)[order]
        dt_ = t.column("_date").to_numpy(zero_copy_only=False)[order]
        tp = t.column("_tp").to_numpy(zero_copy_only=False)[order]
        qty = t.column("_qty").to_numpy(zero_copy_only=False)[order]
        starts, _ = _segment_starts(kcol)
        total = np.add.reduceat(qty, starts)
        keep = (total > thr) & (side[starts] == 0)  # order row present
        if not keep.any():
            return surv.empty_table()
        s = starts[keep]
        keys = kcol[s]
        return pa.table(
            {"_ck": pa.array(ck[s]), "_ok": pa.array(keys),
             "_date": pa.array(dt_[s]), "_tp": pa.array(tp[s]),
             "_qty": pa.array(total[keep]),
             "_p": pa.array(partition_ids(pa.array(ck[s]), P2))},
            schema=surv,
        )

    items = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]
    ).map_batches(li_partials, batch_format="pyarrow")
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(order_rows, batch_format="pyarrow")

    survivors = (
        items.union(orders)
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(having_sweep, batch_format="pyarrow", batch_size=None)
    )

    # -- second (survivor-sized) exchange: join back c_name ----------
    j = pa.schema(
        [("_key", pa.int64()), ("_side", pa.int8()), ("_name", pa.string()),
         ("_ok", pa.int64()), ("_date", pa.int64()), ("_tp", pa.int64()),
         ("_qty", pa.int64()), ("_p", pa.int64())]
    )

    def cust_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return j.empty_table()
        ck = t.column("c_custkey").cast(pa.int64())
        n = t.num_rows
        z = pa.array(np.zeros(n, np.int64))
        return pa.table(
            {"_key": ck, "_side": pa.array(np.zeros(n, np.int8)),
             "_name": t.column("c_name").cast(pa.string()),
             "_ok": z, "_date": z, "_tp": z, "_qty": z,
             "_p": pa.array(partition_ids(ck, P2))},
            schema=j,
        )

    def surv_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return j.empty_table()
        n = t.num_rows
        return pa.table(
            {"_key": t.column("_ck"),
             "_side": pa.array(np.ones(n, np.int8)),
             "_name": pa.array([""] * n, pa.string()),
             "_ok": t.column("_ok"), "_date": t.column("_date"),
             "_tp": t.column("_tp"), "_qty": t.column("_qty"),
             "_p": t.column("_p")},
            schema=j,
        )

    out_schema = pa.schema(
        [("c_name", pa.string()), ("c_custkey", pa.int64()),
         ("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
         ("totalprice_cents", pa.int64()), ("sum_qty_cents", pa.int64())]
    )

    def join_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd2, "q18j", t.column("_p").to_numpy(zero_copy_only=False)
        )
        key = t.column("_key").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        ismatch = side == 1
        bk = key[~ismatch]
        if len(bk) == 0 or ismatch.sum() == 0:
            return out_schema.empty_table()
        names = t.column("_name").to_numpy(zero_copy_only=False)[~ismatch]
        bo = np.argsort(bk, kind="stable")
        bk, names = bk[bo], names[bo]
        pk = key[ismatch]
        pos = np.searchsorted(bk, pk)
        hit = (pos < len(bk)) & (bk[np.clip(pos, 0, len(bk) - 1)] == pk)
        sub = t.filter(pa.array(ismatch)).filter(pa.array(hit))
        nm = names[pos[hit]]
        tp = sub.column("_tp").to_numpy(zero_copy_only=False)
        ok = sub.column("_ok").to_numpy(zero_copy_only=False)
        top = np.lexsort((ok, -tp))[:k]
        sub = sub.take(pa.array(top))
        return pa.table(
            {"c_name": pa.array(nm[top]),
             "c_custkey": sub.column("_key"),
             "o_orderkey": sub.column("_ok"),
             "o_orderdate": sub.column("_date").cast(pa.timestamp("us")),
             "totalprice_cents": sub.column("_tp"),
             "sum_qty_cents": sub.column("_qty")},
            schema=out_schema,
        )

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name"]
    ).map_batches(cust_rows, batch_format="pyarrow")

    res = (
        cust.union(survivors.map_batches(surv_rows, batch_format="pyarrow"))
        .sort("_p", boundaries=list(range(1, P2)))
        .map_batches(join_sweep, batch_format="pyarrow", batch_size=None)
    )
    cand = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    cand = cand.cast(out_schema)
    tp = cand.column("totalprice_cents").to_numpy()
    ok = cand.column("o_orderkey").to_numpy()
    top = np.lexsort((ok, -tp))[:k]
    out = cand.take(pa.array(top))
    out = _finalize_guard(gd, out)
    return _finalize_guard(gd2, out)


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: nation-pair trade volume by ship year
# ---------------------------------------------------------------------------
def nation_pair_trade(sf_dir: str, y0: int = 1995, y1: int = 1996) -> pa.Table:
    """Trade-volume report (the TPC-H Q7 shape): revenue shipped
    between every (supplier nation, customer nation) pair per ship
    year in ``[y0, y1]``, as exact floor-cents.  Returns
    ``(supp_nation, cust_nation, l_year, revenue_cents)`` ordered by
    the three keys.

    Distributed shape -- two chained fact exchanges, dims never
    shuffle:

    * ``supplier`` and ``nation`` are broadcast once (``ray.put`` of
      a dense suppkey->nationkey int32 array and the 25-name list);
      lineitem resolves its supplier nation at the scan.
    * exchange 1 on ``c_custkey`` tags each order with its customer
      nation (orders + customer, one segment sweep).
    * exchange 2 on ``o_orderkey`` joins the tagged orders to the
      year-filtered lineitem rows; each block pre-aggregates into
      (supp_nation, cust_nation, year) partials -- a combiner -- so
      the final groupby moves at most ``blocks x pairs x years``
      tiny rows, never the join.
    """
    import ray

    n_li, _ = _table_meta(sf_dir, "lineitem")
    n_or, _ = _table_meta(sf_dir, "orders")
    n_cust, _ = _table_meta(sf_dir, "customer")
    P1 = _exchange_width(n_or + n_cust)
    P2 = _exchange_width(n_li + n_or)
    gd1 = _new_guard_dir("q7a")
    gd2 = _new_guard_dir("q7b")

    # -- broadcast dims ----------------------------------------------
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    sp = supp.to_pandas()
    smap = np.full(int(sp["s_suppkey"].max()) + 2 if len(sp) else 1, -1,
                   np.int32)
    smap[sp["s_suppkey"].to_numpy()] = sp["s_nationkey"].to_numpy()
    smap_ref = ray.put(smap)
    nat = _read_dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    # packed combiner key below is (sn*100 + cn)*10_000 + year: fail
    # loudly if either assumption (nationkey < 100, ship year < 10000)
    # is violated rather than silently corrupting the rollup
    if int(nat["n_nationkey"].max()) >= 100:
        raise ValueError(
            "nation_pair_trade packs nationkey into 2 decimal digits; "
            f"max n_nationkey={int(nat['n_nationkey'].max())} >= 100"
        )
    if not (0 <= y0 <= y1 < 10_000):
        raise ValueError(f"ship-year bounds out of packed range: {y0}..{y1}")
    names = np.full(int(nat["n_nationkey"].max()) + 1, "", object)
    names[nat["n_nationkey"].to_numpy()] = nat["n_name"].to_numpy()

    # -- exchange 1: orders x customer on custkey --------------------
    e1 = pa.schema(
        [("_key", pa.int64()), ("_side", pa.int8()), ("_ok", pa.int64()),
         ("_nat", pa.int32()), ("_p", pa.int64())]
    )

    def cust_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e1.empty_table()
        ck = t.column("c_custkey").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {"_key": ck, "_side": pa.array(np.zeros(n, np.int8)),
             "_ok": pa.array(np.zeros(n, np.int64)),
             "_nat": t.column("c_nationkey").cast(pa.int32()),
             "_p": pa.array(partition_ids(ck, P1))},
            schema=e1,
        )

    def order_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e1.empty_table()
        ck = t.column("o_custkey").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {"_key": ck, "_side": pa.array(np.ones(n, np.int8)),
             "_ok": t.column("o_orderkey").cast(pa.int64()),
             "_nat": pa.array(np.zeros(n, np.int32)),
             "_p": pa.array(partition_ids(ck, P1))},
            schema=e1,
        )

    tagged_schema = pa.schema(
        [("_k", pa.int64()), ("_side", pa.int8()), ("_cn", pa.int32()),
         ("_sn", pa.int32()), ("_yr", pa.int32()), ("_rev", pa.int64()),
         ("_p", pa.int64())]
    )

    def tag_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tagged_schema.empty_table()
        _guard_record(
            gd1, "q7c", t.column("_p").to_numpy(zero_copy_only=False)
        )
        key = t.column("_key").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        ok = t.column("_ok").to_numpy(zero_copy_only=False)
        natk = t.column("_nat").to_numpy(zero_copy_only=False)
        is_order = side == 1
        bk, bn = key[~is_order], natk[~is_order]
        if len(bk) == 0 or is_order.sum() == 0:
            return tagged_schema.empty_table()
        bo = np.argsort(bk, kind="stable")
        bk, bn = bk[bo], bn[bo]
        pk, pok = key[is_order], ok[is_order]
        pos = np.searchsorted(bk, pk)
        hit = (pos < len(bk)) & (bk[np.clip(pos, 0, len(bk) - 1)] == pk)
        pok, cn = pok[hit], bn[pos[hit]]
        z32 = np.zeros(len(pok), np.int32)
        return pa.table(
            {"_k": pa.array(pok),
             "_side": pa.array(np.zeros(len(pok), np.int8)),
             "_cn": pa.array(cn.astype(np.int32)), "_sn": pa.array(z32),
             "_yr": pa.array(z32),
             "_rev": pa.array(np.zeros(len(pok), np.int64)),
             "_p": pa.array(partition_ids(pa.array(pok), P2))},
            schema=tagged_schema,
        )

    tagged = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        .map_batches(cust_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
            .map_batches(order_rows, batch_format="pyarrow")
        )
        .sort("_p", boundaries=list(range(1, P1)))
        .map_batches(tag_sweep, batch_format="pyarrow", batch_size=None)
    )

    # -- lineitem scan: year filter + broadcast supplier nation ------
    def li_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tagged_schema.empty_table()
        sm = ray.get(smap_ref)
        sd = _ts_i64(t.column("l_shipdate"))
        yr = (sd.astype("datetime64[us]").astype("datetime64[Y]")
              .view(np.int64) + 1970).astype(np.int32)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sn = sm[np.clip(sk, 0, len(sm) - 1)]
        keep = (yr >= y0) & (yr <= y1) & (sk < len(sm)) & (sn >= 0)
        if not keep.any():
            return tagged_schema.empty_table()
        lk = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        rev = np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
        return pa.table(
            {"_k": pa.array(lk),
             "_side": pa.array(np.ones(len(lk), np.int8)),
             "_cn": pa.array(np.zeros(len(lk), np.int32)),
             "_sn": pa.array(sn[keep].astype(np.int32)),
             "_yr": pa.array(yr[keep]),
             "_rev": pa.array(rev),
             "_p": pa.array(partition_ids(pa.array(lk), P2))},
            schema=tagged_schema,
        )

    items = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_rows, batch_format="pyarrow")

    part_schema = pa.schema([("key", pa.int64()), ("rev", pa.int64())])

    def join_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd2, "q7j", t.column("_p").to_numpy(zero_copy_only=False)
        )
        key = t.column("_k").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        is_li = side == 1
        bk = key[~is_li]
        if len(bk) == 0 or is_li.sum() == 0:
            return part_schema.empty_table()
        bcn = t.column("_cn").to_numpy(zero_copy_only=False)[~is_li]
        bo = np.argsort(bk, kind="stable")
        bk, bcn = bk[bo], bcn[bo]
        pk = key[is_li]
        pos = np.searchsorted(bk, pk)
        hit = (pos < len(bk)) & (bk[np.clip(pos, 0, len(bk) - 1)] == pk)
        if not hit.any():
            return part_schema.empty_table()
        cn = bcn[pos[hit]].astype(np.int64)
        sn = t.column("_sn").to_numpy(zero_copy_only=False)[is_li][hit].astype(
            np.int64
        )
        yr = t.column("_yr").to_numpy(zero_copy_only=False)[is_li][hit].astype(
            np.int64
        )
        rev = t.column("_rev").to_numpy(zero_copy_only=False)[is_li][hit]
        # combiner: per-block (sn, cn, yr) partial sums, packed key
        packed = (sn * 100 + cn) * 10_000 + yr
        order = np.argsort(packed, kind="stable")
        packed, rev = packed[order], rev[order]
        starts, _ = _segment_starts(packed)
        return pa.table(
            {"key": pa.array(packed[starts]),
             "rev": pa.array(np.add.reduceat(rev, starts))},
            schema=part_schema,
        )

    agg = (
        tagged.union(items)
        .sort("_p", boundaries=list(range(1, P2)))
        .map_batches(join_sweep, batch_format="pyarrow", batch_size=None)
        .groupby("key")
        .sum("rev")
        .to_pandas()
    )
    agg.columns = ["key", "revenue_cents"]
    packed = agg["key"].to_numpy(dtype=np.int64)
    yr = packed % 10_000
    cn = (packed // 10_000) % 100
    sn = packed // 1_000_000
    out = pa.table(
        {"supp_nation": pa.array(names[sn].astype(str)),
         "cust_nation": pa.array(names[cn].astype(str)),
         "l_year": pa.array(yr.astype(np.int64)),
         "revenue_cents": pa.array(
             agg["revenue_cents"].to_numpy(dtype=np.int64))}
    )
    out = _finalize_guard(gd1, out)
    out = _finalize_guard(gd2, out)
    return out.take(pc.sort_indices(
        out, sort_keys=[("supp_nation", "ascending"),
                        ("cust_nation", "ascending"),
                        ("l_year", "ascending")]))


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: dormant wealthy customers (anti-join + global scalar)
# ---------------------------------------------------------------------------
def customer_dormant_cohorts(
    sf_dir: str, cutoff: str = "1998-06-01"
) -> pa.Table:
    """Dormant-capital report (the TPC-H Q22 shape): customers whose
    account balance is above the GLOBAL average yet placed no order
    on/after ``cutoff``, grouped by market segment.  Returns
    ``(c_mktsegment, n_cust, sum_acctbal_cents)`` ordered by segment.

    Distributed shape -- scalar subquery + anti-join, both
    scale-safe:

    * the global average is never materialized as a float: pass 1
      folds per-block ``(sum_cents, n)`` partials to ONE driver
      scalar pair, and the filter compares ``bal_cents * N >
      SUM_cents`` in exact integer cross-multiplication (the
      average itself is a rational we never round).
    * the anti-join is ONE custkey exchange: filtered customer rows
      meet per-block-distinct recent-order keys; a segment sweep
      keeps customers whose key segment has no order row, then
      per-block segment partials feed a tiny final groupby.
    """
    cutoff_us = np.datetime64(cutoff, "us").astype(np.int64)
    n_cust, _ = _table_meta(sf_dir, "customer")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_cust + n_or)
    gd = _new_guard_dir("q22")

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_acctbal", "c_mktsegment"])

    # -- pass 1: global (sum_cents, n) scalar -------------------------
    def bal_partial(t: pa.Table) -> pa.Table:
        c = _cents(t.column("c_acctbal").to_numpy(zero_copy_only=False))
        return pa.table({"s": pa.array([int(c.sum())], pa.int64()),
                         "n": pa.array([len(c)], pa.int64())})

    tot = cust.map_batches(bal_partial, batch_format="pyarrow") \
        .to_pandas().sum()
    sum_cents, n_all = int(tot["s"]), int(tot["n"])

    # -- pass 2: anti-join exchange -----------------------------------
    e = pa.schema(
        [("_key", pa.int64()), ("_side", pa.int8()), ("_seg", pa.string()),
         ("_bal", pa.int64()), ("_p", pa.int64())]
    )

    def cust_rows(t: pa.Table) -> pa.Table:
        bal = _cents(t.column("c_acctbal").to_numpy(zero_copy_only=False))
        keep = bal * n_all > sum_cents  # exact: bal > SUM/N
        if not keep.any():
            return e.empty_table()
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        seg = t.column("c_mktsegment").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {"_key": pa.array(ck),
             "_side": pa.array(np.zeros(len(ck), np.int8)),
             "_seg": pa.array(seg, pa.string()),
             "_bal": pa.array(bal[keep]),
             "_p": pa.array(partition_ids(pa.array(ck), P))},
            schema=e,
        )

    def recent_order_keys(t: pa.Table) -> pa.Table:
        od = _ts_i64(t.column("o_orderdate"))
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )[od >= cutoff_us]
        if len(ck) == 0:
            return e.empty_table()
        ck = np.unique(ck)
        return pa.table(
            {"_key": pa.array(ck),
             "_side": pa.array(np.ones(len(ck), np.int8)),
             "_seg": pa.array([""] * len(ck), pa.string()),
             "_bal": pa.array(np.zeros(len(ck), np.int64)),
             "_p": pa.array(partition_ids(pa.array(ck), P))},
            schema=e,
        )

    part_schema = pa.schema(
        [("c_mktsegment", pa.string()), ("n_cust", pa.int64()),
         ("sum_acctbal_cents", pa.int64())]
    )

    def anti_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "q22", t.column("_p").to_numpy(zero_copy_only=False)
        )
        key = t.column("_key").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, side = key[order], side[order]
        starts, _ = _segment_starts(key)
        has_recent = np.add.reduceat(side.astype(np.int64), starts) > 0
        # map each row to its segment ordinal, keep customer rows in
        # segments with no recent order
        seg_id = np.cumsum(
            np.concatenate([[0], (key[1:] != key[:-1]).astype(np.int64)])
        )
        keep_row = (~has_recent[seg_id]) & (side == 0)
        if not keep_row.any():
            return part_schema.empty_table()
        idx = order[keep_row]
        seg = t.column("_seg").to_numpy(zero_copy_only=False)[idx]
        bal = t.column("_bal").to_numpy(zero_copy_only=False)[idx]
        so = np.argsort(seg, kind="stable")
        seg, bal = seg[so], bal[so]
        sstarts = np.flatnonzero(
            np.concatenate([[True], seg[1:] != seg[:-1]])
        )
        cnt = np.diff(np.append(sstarts, len(seg)))
        return pa.table(
            {"c_mktsegment": pa.array(seg[sstarts], pa.string()),
             "n_cust": pa.array(cnt.astype(np.int64)),
             "sum_acctbal_cents": pa.array(np.add.reduceat(bal, sstarts))},
            schema=part_schema,
        )

    agg = (
        cust.map_batches(cust_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
            .map_batches(recent_order_keys, batch_format="pyarrow")
        )
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(anti_sweep, batch_format="pyarrow", batch_size=None)
        .groupby("c_mktsegment")
        .sum(["n_cust", "sum_acctbal_cents"])
        .to_pandas()
    )
    agg.columns = ["c_mktsegment", "n_cust", "sum_acctbal_cents"]
    agg = agg.sort_values("c_mktsegment", ignore_index=True)
    out = pa.table(
        {"c_mktsegment": pa.array(agg["c_mktsegment"], pa.string()),
         "n_cust": pa.array(agg["n_cust"].to_numpy(dtype=np.int64)),
         "sum_acctbal_cents": pa.array(
             agg["sum_acctbal_cents"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# CUSUM change-point over the dense hourly count series
# ---------------------------------------------------------------------------
def events_cusum_changepoint(sf_dir: str) -> pa.Table:
    """Exact CUSUM change-point per ``event_type`` over the DENSE
    hourly count series (missing hours count 0, on the global
    [min_hour, max_hour] grid shared with ``events_hourly_ar1``):
    with ``T`` hours, series ``x_t`` and total ``N``, the integer
    deviation ``D_t = T * cumsum_t - (t+1) * N`` is ``T *`` the
    classic CUSUM residual -- scaling by ``T`` keeps every value an
    exact integer (no float mean).  The change point is the hour
    maximizing ``|D_t|`` (earliest hour wins ties).  Returns one row
    per type: ``(event_type, cp_hour, d_abs_max, n_hours,
    total_events)``.

    Scale shape: identical to AR(1) -- ONE per-block lexsort+reduceat
    partial over (type, hour) -> dim-bounded ``groupby.sum`` of
    series CELLS -> O(series length) exact-integer driver math; raw
    events never shuffle."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hour": pa.array(hr[order][starts]),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n_obs"]
    out_schema = pa.schema(
        [("event_type", pa.string()), ("cp_hour", pa.int64()),
         ("d_abs_max", pa.int64()), ("n_hours", pa.int64()),
         ("total_events", pa.int64())]
    )
    if len(merged) == 0:
        return out_schema.empty_table()
    h_lo = int(merged["hour"].min())
    h_hi = int(merged["hour"].max())
    span = h_hi - h_lo + 1
    rows = []
    for et, grp in merged.groupby("event_type", sort=True):
        dense = [0] * span
        for h, c in zip(grp["hour"].to_numpy(dtype=np.int64),
                        grp["n_obs"].to_numpy(dtype=np.int64)):
            dense[int(h) - h_lo] = int(c)
        total = sum(dense)
        cum = 0
        best_abs, best_t = -1, 0
        for t, x in enumerate(dense):
            cum += x
            d = abs(span * cum - (t + 1) * total)
            if d > best_abs:
                best_abs, best_t = d, t
        rows.append((et, h_lo + best_t, best_abs, span, total))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "cp_hour": pa.array([r[1] for r in rows], pa.int64()),
         "d_abs_max": pa.array([r[2] for r in rows], pa.int64()),
         "n_hours": pa.array([r[3] for r in rows], pa.int64()),
         "total_events": pa.array([r[4] for r in rows], pa.int64())},
        schema=out_schema,
    )


# ---------------------------------------------------------------------------
# Simpson/HHI concentration of events across users, per type
# ---------------------------------------------------------------------------
def events_type_hhi(sf_dir: str) -> pa.Table:
    """Herfindahl-Hirschman concentration index per ``event_type``:
    how concentrated a type's traffic is across users.  With per-user
    counts ``c_u`` and ``n = sum(c_u)``, ``HHI = sum(c_u^2) / n^2``
    (the Simpson index) and the effective user count is its
    reciprocal -- both exact rationals, emitted as ``floor(1e6 * x)``
    computed in arbitrary-precision ints.  Returns ``(event_type,
    n_events, n_users, hhi_e6, effective_users_e6)`` ordered by type.

    Scale shape: per-block lexsort+reduceat partials over
    (type, user) -> pair-level ``groupby.sum`` (bounded by DISTINCT
    pairs, not rows) -> per-block (type, n, sum_c2, n_users) partials
    -> type-level ``groupby.sum`` -> O(types) driver math.  sum(c^2)
    is additive ONLY over complete per-user counts, hence the
    pair-level fold before squaring."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    pair_schema = pa.schema(
        [("event_type", pa.string()), ("user_id", pa.int64()),
         ("c", pa.int64())]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.asarray([f"{e}\x00{uu}" for e, uu in zip(et, u)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "user_id": pa.array(u[order][starts]),
             "c": pa.array(counts.astype(np.int64))},
            schema=pair_schema,
        )

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .sum("c")
    )

    part_schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64()),
         ("s2", pa.int64()), ("n_users", pa.int64())]
    )

    def type_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        c = t.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
        order, starts, counts = _group_segments(et)
        cs = c[order]
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "n": pa.array(np.add.reduceat(cs, starts)),
             "s2": pa.array(np.add.reduceat(cs * cs, starts)),
             "n_users": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    agg = (
        pairs.map_batches(type_partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n", "s2", "n_users"])
        .to_pandas()
    )
    agg.columns = ["event_type", "n", "s2", "n_users"]
    agg = agg.sort_values("event_type", ignore_index=True)
    hhi, eff = [], []
    for n, s2 in zip(agg["n"], agg["s2"]):
        n, s2 = int(n), int(s2)
        hhi.append(10**6 * s2 // (n * n) if n else 0)
        eff.append(10**6 * n * n // s2 if s2 else 0)
    return pa.table(
        {"event_type": pa.array(agg["event_type"], pa.string()),
         "n_events": pa.array(agg["n"].to_numpy(dtype=np.int64)),
         "n_users": pa.array(agg["n_users"].to_numpy(dtype=np.int64)),
         "hhi_e6": pa.array(hhi, pa.int64()),
         "effective_users_e6": pa.array(eff, pa.int64())}
    )


# ---------------------------------------------------------------------------
# Type-pair audience overlap: user-set Jaccard similarity join
# ---------------------------------------------------------------------------
def events_type_jaccard(sf_dir: str) -> pa.Table:
    """Audience-overlap matrix: for every pair of event types, the
    EXACT Jaccard similarity of their user sets -- ``|A ∩ B| /
    (|A| + |B| - |A ∩ B|)`` as ``floor(1e6 * j)`` -- the set-
    similarity join over categorical audiences (which behaviors
    share users?).  Returns ``(type_a, type_b, n_a, n_b, n_common,
    jaccard_e6)``, ``type_a < type_b``, ordered by the pair.

    Scale shape: per-block distinct (user, type) combiner -> ONE
    user_id hash exchange; each block's segment sweep emits the
    ``m*(m-1)/2`` type pairs per user (m = that user's distinct
    types, dimension-bounded) as count-1 rows pre-folded per block;
    a pair-level ``groupby.sum`` yields intersections and a tiny
    type-level count yields set sizes; the driver does O(types^2)
    exact math.  Raw events never pair up; only per-user TYPE SETS
    do."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("tjac")
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    ut_schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()),
         ("_p", pa.int64())]
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return ut_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.asarray([f"{uu}\x00{e}" for uu, e in zip(u, et)],
                         dtype=object)
        order, starts, _ = _group_segments(key)
        uu = u[order][starts]
        return pa.table(
            {"user_id": pa.array(uu),
             "event_type": pa.array(list(et[order][starts]), pa.string()),
             "_p": pa.array(partition_ids(pa.array(uu), P))},
            schema=ut_schema,
        )

    pp_schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()),
         ("n_common", pa.int64())]
    )

    def pair_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pp_schema.empty_table()
        _guard_record(
            gd, "tjac", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((et, u))
        u, et = u[order], et[order]
        # the per-block combiner distinct-ifies only within its
        # block: the same (user, type) can arrive from two source
        # blocks -- dedupe after the exchange co-locates the user
        keep = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        )
        u, et = u[keep], et[keep]
        starts, lens = _segment_starts(u)
        # size partials ride the same output with a '' sentinel in
        # type_b ('' is no real type: the tokenless empty string)
        pa_ = list(et)
        pb_ = [""] * len(et)
        for s, m in zip(starts, lens):
            if m < 2:
                continue
            seg = et[s:s + m]  # sorted within the user by the lexsort
            for i in range(m - 1):
                for jj in range(i + 1, m):
                    pa_.append(seg[i])
                    pb_.append(seg[jj])
        key = np.asarray([f"{a}\x00{b}" for a, b in zip(pa_, pb_)],
                         dtype=object)
        order2, starts2, counts2 = _group_segments(key)
        a_arr = np.asarray(pa_, dtype=object)
        b_arr = np.asarray(pb_, dtype=object)
        return pa.table(
            {"type_a": pa.array(list(a_arr[order2][starts2]), pa.string()),
             "type_b": pa.array(list(b_arr[order2][starts2]), pa.string()),
             "n_common": pa.array(counts2.astype(np.int64))},
            schema=pp_schema,
        )

    folded = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(pair_sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["type_a", "type_b"])
        .sum("n_common")
        .to_pandas()
    )
    folded.columns = ["type_a", "type_b", "n_common"]
    sizes = folded[folded["type_b"] == ""]
    size_map = dict(zip(sizes["type_a"], sizes["n_common"].astype(int)))
    inter = folded[folded["type_b"] != ""]

    inter = inter.sort_values(["type_a", "type_b"], ignore_index=True)
    na = np.array([size_map[a] for a in inter["type_a"]], np.int64)
    nb = np.array([size_map[b] for b in inter["type_b"]], np.int64)
    nc = inter["n_common"].to_numpy(dtype=np.int64)
    jac = (10**6 * nc) // (na + nb - nc)
    out = pa.table(
        {"type_a": pa.array(inter["type_a"], pa.string()),
         "type_b": pa.array(inter["type_b"], pa.string()),
         "n_a": pa.array(na), "n_b": pa.array(nb),
         "n_common": pa.array(nc), "jaccard_e6": pa.array(jac)}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: revenue share with a global-fraction HAVING
# ---------------------------------------------------------------------------
def nation_revenue_share(sf_dir: str, threshold_bp: int = 400) -> pa.Table:
    """Revenue-concentration report (the TPC-H Q11 shape): supplier
    nations whose lineitem revenue exceeds ``threshold_bp`` basis
    points (1/10000) of GLOBAL revenue.  Returns ``(n_name,
    revenue_cents, share_e6)`` -- share as exact ``floor(1e6 *
    rev/total)`` -- ordered by revenue desc, name asc.

    Distributed shape: the fact scan folds per-block (nation ->
    revenue-cents) partials via the broadcast suppkey->nation map (a
    combiner: one row per nation per block, never a row per
    lineitem); a nation-level ``groupby.sum`` is dimension-sized, the
    global total is its driver-side sum, and the HAVING compares
    ``rev * 10000 > threshold_bp * total`` in exact integer
    cross-multiplication -- the global-fraction predicate needs NO
    second pass over the fact table."""
    import ray

    sp = _read_dim(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    smap = np.full(int(sp["s_suppkey"].max()) + 2 if len(sp) else 1, -1,
                   np.int32)
    smap[sp["s_suppkey"].to_numpy()] = sp["s_nationkey"].to_numpy()
    smap_ref = ray.put(smap)
    nat = _read_dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    names = np.full(int(nat["n_nationkey"].max()) + 1, "", object)
    names[nat["n_nationkey"].to_numpy()] = nat["n_name"].to_numpy()

    part_schema = pa.schema([("nat", pa.int64()), ("rev", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        sm = ray.get(smap_ref)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sn = sm[np.clip(sk, 0, len(sm) - 1)].astype(np.int64)
        keep = (sk < len(sm)) & (sn >= 0)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)[keep]
        sn = sn[keep]
        # exact integer fold (bincount's float weights would not be)
        order = np.argsort(sn, kind="stable")
        sn_s, rev_s = sn[order], rev[order]
        starts, _ = _segment_starts(sn_s)
        return pa.table(
            {"nat": pa.array(sn_s[starts]),
             "rev": pa.array(np.add.reduceat(rev_s, starts))},
            schema=part_schema,
        )

    agg = (
        _read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("nat")
        .sum("rev")
        .to_pandas()
    )
    agg.columns = ["nat", "rev"]
    total = int(agg["rev"].sum())
    rev = agg["rev"].to_numpy(dtype=np.int64)
    keep = rev.astype(object) * 10_000 > threshold_bp * total
    agg = agg[keep]
    rev = agg["rev"].to_numpy(dtype=np.int64)
    share = np.array([10**6 * int(r) // total for r in rev], np.int64)
    nm = names[agg["nat"].to_numpy(dtype=np.int64)].astype(str)
    order = np.lexsort((nm, -rev))
    return pa.table(
        {"n_name": pa.array(nm[order]),
         "revenue_cents": pa.array(rev[order]),
         "share_e6": pa.array(share[order])}
    )


# ---------------------------------------------------------------------------
# Repeat-purchase cadence: per-segment order-gap statistics
# ---------------------------------------------------------------------------
def customer_order_gaps(sf_dir: str) -> pa.Table:
    """Repeat-purchase cadence per market segment: for every customer
    with >= 2 orders, the gaps (days) between consecutive orders
    (ordered by ``o_orderdate, o_orderkey``), aggregated per segment
    as ``(c_mktsegment, n_gaps, sum_gap_days, max_gap_days,
    mean_gap_days_e6)`` with the mean as exact ``floor(1e6 *
    sum/n)``.  The LAG-window-then-rollup shape.

    Distributed shape: ONE custkey hash exchange co-locates each
    customer's orders with their customer row (segment tag); the
    per-block sweep lexsorts, diffs consecutive order dates per
    customer segment, and folds straight to per-segment partials --
    gaps never leave the block; a tiny segment ``groupby`` finishes.
    ``max`` folds via ``groupby.max``, the mean via summed
    numerator/denominator (means are not additive, sums are)."""
    from ray.data import aggregate as _ray_agg

    n_cust, _ = _table_meta(sf_dir, "customer")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_cust + n_or)
    gd = _new_guard_dir("ogaps")
    DAY_US = np.int64(86_400 * _US)

    e = pa.schema(
        [("_key", pa.int64()), ("_side", pa.int8()), ("_seg", pa.string()),
         ("_date", pa.int64()), ("_ok", pa.int64()), ("_p", pa.int64())]
    )

    def cust_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e.empty_table()
        ck = t.column("c_custkey").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {"_key": ck, "_side": pa.array(np.zeros(n, np.int8)),
             "_seg": t.column("c_mktsegment").cast(pa.string()),
             "_date": pa.array(np.zeros(n, np.int64)),
             "_ok": pa.array(np.zeros(n, np.int64)),
             "_p": pa.array(partition_ids(ck, P))},
            schema=e,
        )

    def order_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e.empty_table()
        ck = t.column("o_custkey").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {"_key": ck, "_side": pa.array(np.ones(n, np.int8)),
             "_seg": pa.array([""] * n, pa.string()),
             "_date": pa.array(_ts_i64(t.column("o_orderdate"))),
             "_ok": t.column("o_orderkey").cast(pa.int64()),
             "_p": pa.array(partition_ids(ck, P))},
            schema=e,
        )

    part_schema = pa.schema(
        [("c_mktsegment", pa.string()), ("n_gaps", pa.int64()),
         ("sum_gap_days", pa.int64()), ("max_gap_days", pa.int64())]
    )

    def gap_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "ogap", t.column("_p").to_numpy(zero_copy_only=False)
        )
        key = t.column("_key").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        dt_ = t.column("_date").to_numpy(zero_copy_only=False)
        ok = t.column("_ok").to_numpy(zero_copy_only=False)
        # customer row first, then orders by (date, orderkey)
        order = np.lexsort((ok, dt_, side, key))
        key, side, dt_ = key[order], side[order], dt_[order]
        seg_all = t.column("_seg").to_numpy(zero_copy_only=False)[order]
        starts, lens = _segment_starts(key)
        has_cust = side[starts] == 0
        seg_id = np.cumsum(
            np.concatenate([[0], (key[1:] != key[:-1]).astype(np.int64)])
        )
        # consecutive-order diffs within a customer: rows 2.. of each
        # segment where both rows are orders
        same_seg = np.concatenate([[False], seg_id[1:] == seg_id[:-1]])
        both_orders = np.concatenate(
            [[False], (side[1:] == 1) & (side[:-1] == 1)]
        )
        is_gap = same_seg & both_orders & has_cust[seg_id]
        if not is_gap.any():
            return part_schema.empty_table()
        gaps = (dt_[is_gap] - dt_[np.flatnonzero(is_gap) - 1]) // DAY_US
        segs = seg_all[starts[seg_id[is_gap]]]
        so = np.argsort(segs, kind="stable")
        segs, gaps = segs[so], gaps[so]
        sstarts = np.flatnonzero(
            np.concatenate([[True], segs[1:] != segs[:-1]])
        )
        return pa.table(
            {"c_mktsegment": pa.array(segs[sstarts], pa.string()),
             "n_gaps": pa.array(
                 np.diff(np.append(sstarts, len(segs))).astype(np.int64)),
             "sum_gap_days": pa.array(np.add.reduceat(gaps, sstarts)),
             "max_gap_days": pa.array(np.maximum.reduceat(gaps, sstarts))},
            schema=part_schema,
        )

    folded = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(cust_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderdate", "o_orderkey"])
            .map_batches(order_rows, batch_format="pyarrow")
        )
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(gap_sweep, batch_format="pyarrow", batch_size=None)
        .groupby("c_mktsegment")
        .aggregate(
            _ray_agg.Sum("n_gaps"), _ray_agg.Sum("sum_gap_days"),
            _ray_agg.Max("max_gap_days"),
        )
        .to_pandas()
    )
    folded.columns = ["c_mktsegment", "n_gaps", "sum_gap_days",
                      "max_gap_days"]
    folded = folded.sort_values("c_mktsegment", ignore_index=True)
    mean = [10**6 * int(s) // int(n)
            for s, n in zip(folded["sum_gap_days"], folded["n_gaps"])]
    out = pa.table(
        {"c_mktsegment": pa.array(folded["c_mktsegment"], pa.string()),
         "n_gaps": pa.array(folded["n_gaps"].to_numpy(dtype=np.int64)),
         "sum_gap_days": pa.array(
             folded["sum_gap_days"].to_numpy(dtype=np.int64)),
         "max_gap_days": pa.array(
             folded["max_gap_days"].to_numpy(dtype=np.int64)),
         "mean_gap_days_e6": pa.array(mean, pa.int64())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Gap-fill resample with LINEAR interpolation
# ---------------------------------------------------------------------------
def events_resample_lerp(sf_dir: str) -> pa.Table:
    """Densified hourly ``sum(value)``-cents series per ``event_type``
    with LINEARLY INTERPOLATED gaps (``events_resample_ffill``'s
    sibling: lerp, not last-observation-carried-forward).  Interior
    missing hours take ``v0 + (v1-v0) * (h-h0) / (h1-h0)`` between
    the nearest observed neighbors, computed sign-safely as ``v0 +
    sign(d) * (|d| * (h-h0) // (h1-h0))`` (truncating division
    matches DuckDB's ``//`` on negatives, Python's ``//`` does not);
    hours before the first / after the last observation copy the
    nearest edge.  Returns ``(event_type, hour, value_cents,
    fill_kind)`` -- 0 observed, 1 interpolated, 2 edge-extended.

    Scale shape: per-block (type, hour, cents) lexsort+reduceat
    partials -> dim-bounded ``groupby.sum`` of series CELLS ->
    O(series) vectorized driver fill; raw events never shuffle
    (the ar1/cusum series contract)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("cents", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, _ = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hour": pa.array(hr[order][starts]),
             "cents": pa.array(np.add.reduceat(cents[order], starts))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("cents")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "cents"]
    out_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("value_cents", pa.int64()), ("fill_kind", pa.int64())]
    )
    if len(merged) == 0:
        return out_schema.empty_table()
    h_lo = int(merged["hour"].min())
    h_hi = int(merged["hour"].max())
    span = h_hi - h_lo + 1
    ets, hrs, vals, kinds = [], [], [], []
    for et, grp in merged.groupby("event_type", sort=True):
        obs_h = grp["hour"].to_numpy(dtype=np.int64) - h_lo
        obs_v = grp["cents"].to_numpy(dtype=np.int64)
        o = np.argsort(obs_h)
        obs_h, obs_v = obs_h[o], obs_v[o]
        grid = np.arange(span, dtype=np.int64)
        # index of the nearest observation at-or-before / after
        pos = np.searchsorted(obs_h, grid, side="right") - 1
        nxt = np.searchsorted(obs_h, grid, side="left")
        v = np.empty(span, np.int64)
        kind = np.empty(span, np.int64)
        lead = pos < 0                      # before first observation
        trail = nxt >= len(obs_h)           # after the last
        v[lead] = obs_v[0]
        kind[lead] = 2
        v[trail] = obs_v[-1]
        kind[trail] = 2
        mid = ~lead & ~trail
        p, q_ = pos[mid], nxt[mid]
        h0, h1 = obs_h[p], obs_h[q_]
        v0, v1 = obs_v[p], obs_v[q_]
        exact = h0 == grid[mid]
        d = v1 - v0
        num = np.abs(d) * (grid[mid] - h0)
        den = np.where(h1 > h0, h1 - h0, 1)
        lerp = v0 + np.sign(d) * (num // den)
        vm = np.where(exact, v0, lerp)
        km = np.where(exact, 0, 1)
        v[mid] = vm
        kind[mid] = km
        ets.extend([et] * span)
        hrs.append(grid + h_lo)
        vals.append(v)
        kinds.append(kind)
    return pa.table(
        {"event_type": pa.array(ets, pa.string()),
         "hour": pa.array(np.concatenate(hrs)),
         "value_cents": pa.array(np.concatenate(vals)),
         "fill_kind": pa.array(np.concatenate(kinds))},
        schema=out_schema,
    )


# ---------------------------------------------------------------------------
# Hour-of-day seasonality profile
# ---------------------------------------------------------------------------
def events_seasonality_profile(sf_dir: str) -> pa.Table:
    """Diurnal profile per ``event_type``: each hour-of-day's (0-23)
    exact share of the type's events, ``share_e6 = floor(1e6 *
    n_hour / n_type)``, plus the seasonality index against a flat
    profile (``index_e6 = floor(1e6 * 24 * n_hour / n_type)``, 1e6 =
    no seasonality).  Returns ``(event_type, hour_of_day, n_events,
    share_e6, index_e6)`` for observed cells, ordered by (type,
    hour).

    Scale shape: per-block (type, hour-of-day) count partials (at
    most ``types x 24`` rows per block) -> dim-bounded
    ``groupby.sum`` -> O(types x 24) driver math."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hod", pa.int64()),
         ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hod = (_ts_i64(t.column("ts")) // 3_600_000_000) % 24
        key = np.asarray([f"{e}\x00{h:02d}" for e, h in zip(et, hod)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hod": pa.array(hod[order][starts]),
             "n": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hod"])
        .sum("n")
        .to_pandas()
    )
    merged.columns = ["event_type", "hod", "n"]
    merged = merged.sort_values(["event_type", "hod"], ignore_index=True)
    totals = merged.groupby("event_type")["n"].transform("sum")
    n = merged["n"].to_numpy(dtype=np.int64)
    tot = totals.to_numpy(dtype=np.int64)
    share = np.array([10**6 * int(a) // int(b) for a, b in zip(n, tot)],
                     np.int64)
    idx = np.array([10**6 * 24 * int(a) // int(b) for a, b in zip(n, tot)],
                   np.int64)
    return pa.table(
        {"event_type": pa.array(merged["event_type"], pa.string()),
         "hour_of_day": pa.array(merged["hod"].to_numpy(dtype=np.int64)),
         "n_events": pa.array(n),
         "share_e6": pa.array(share),
         "index_e6": pa.array(idx)}
    )


# ---------------------------------------------------------------------------
# Functional-dependency violation check (profiling primitive)
# ---------------------------------------------------------------------------
def lineitem_fd_check(sf_dir: str) -> pa.Table:
    """Functional-dependency miner's primitive: does ``l_orderkey ->
    l_returnflag`` hold?  Counts the keys whose rows carry more than
    one distinct dependent value.  Returns one row ``(n_keys,
    n_violating_keys, n_max_distinct)``.

    Scale shape: per-block DISTINCT (key, value) combiner -> ONE
    key-hash exchange (bounded by distinct pairs) -> per-block
    dedupe + segment distinct counts folded straight to three
    scalars per block -> driver sum.  The violation test needs every
    (key, value) pair of a key co-located, which the exchange
    guarantees; a pair-level groupby (the first version) did the
    same work with a second all-to-all (7.7 s -> this shape)."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    pair_schema = pa.schema([("k", pa.int64()), ("v", pa.string())])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        key = np.asarray([f"{a}\x00{b}" for a, b in zip(k, v)], dtype=object)
        order, starts, _ = _group_segments(key)
        return pa.table(
            {"k": pa.array(k[order][starts]),
             "v": pa.array(list(v[order][starts]), pa.string())},
            schema=pair_schema,
        )

    n_li, _ = _table_meta(sf_dir, "lineitem")
    P = _exchange_width(n_li)
    gd = _new_guard_dir("fdchk")

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("k"), P))
        )

    stat_schema = pa.schema(
        [("n_keys", pa.int64()), ("n_viol", pa.int64()),
         ("max_nd", pa.int64())]
    )

    def key_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return stat_schema.empty_table()
        _guard_record(
            gd, "fd", t.column("_p").to_numpy(zero_copy_only=False)
        )
        k = t.column("k").to_numpy(zero_copy_only=False)
        v = np.asarray(t.column("v").to_pylist(), dtype=object)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        # dedupe (k, v) pairs arriving from different source blocks
        keep = np.concatenate([[True], (k[1:] != k[:-1]) | (v[1:] != v[:-1])])
        k = k[keep]
        starts, lens = _segment_starts(k)
        return pa.table(
            {"n_keys": pa.array([len(starts)], pa.int64()),
             "n_viol": pa.array([int((lens > 1).sum())], pa.int64()),
             "max_nd": pa.array([int(lens.max())], pa.int64())},
            schema=stat_schema,
        )

    stats = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(key_sweep, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = pa.table(
        {"n_keys": pa.array([int(stats["n_keys"].sum())], pa.int64()),
         "n_violating_keys": pa.array(
             [int(stats["n_viol"].sum())], pa.int64()),
         "n_max_distinct": pa.array(
             [int(stats["max_nd"].max()) if len(stats) else 0],
             pa.int64())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# User lifespan histogram (two-level derived aggregate)
# ---------------------------------------------------------------------------
def events_user_lifespan(sf_dir: str) -> pa.Table:
    """Distribution of user lifespans: per user, days between first
    and last event (``(max_ts - min_ts) // 1 day``), then the
    histogram of those derived per-user values.  Returns
    ``(lifespan_days, n_users)`` ordered by days -- the two-level
    derived-aggregate shape (aggregate, derive, re-aggregate).

    Scale shape: per-block (user -> min_ts, max_ts) partials ->
    user-level ``groupby`` min/max (the only exchange) -> per-block
    histogram partials over the DERIVED value -> tiny final
    ``groupby.sum``; no raw event leaves its block."""
    from ray.data import aggregate as _ray_agg

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    DAY_US = np.int64(86_400 * _US)

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("lo", pa.int64()), ("hi", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        order = np.argsort(u, kind="stable")
        u, ts = u[order], ts[order]
        starts, _ = _segment_starts(u)
        return pa.table(
            {"user_id": pa.array(u[starts]),
             "lo": pa.array(np.minimum.reduceat(ts, starts)),
             "hi": pa.array(np.maximum.reduceat(ts, starts))},
            schema=part_schema,
        )

    hist_schema = pa.schema(
        [("lifespan_days", pa.int64()), ("n_users", pa.int64())]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        lo = t.column("min(lo)").to_numpy(zero_copy_only=False)
        hi = t.column("max(hi)").to_numpy(zero_copy_only=False)
        d = (hi - lo) // DAY_US
        order = np.argsort(d, kind="stable")
        ds_ = d[order]
        starts, lens = _segment_starts(ds_)
        return pa.table(
            {"lifespan_days": pa.array(ds_[starts]),
             "n_users": pa.array(lens.astype(np.int64))},
            schema=hist_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_ray_agg.Min("lo"), _ray_agg.Max("hi"))
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("lifespan_days")
        .sum("n_users")
        .to_pandas()
    )
    agg.columns = ["lifespan_days", "n_users"]
    agg = agg.sort_values("lifespan_days", ignore_index=True)
    return pa.table(
        {"lifespan_days": pa.array(agg["lifespan_days"].to_numpy(np.int64)),
         "n_users": pa.array(agg["n_users"].to_numpy(dtype=np.int64))}
    )


# ---------------------------------------------------------------------------
# Open-order backlog: +1/-1 event-sourced running balance by month
# ---------------------------------------------------------------------------
def orders_open_backlog(sf_dir: str) -> pa.Table:
    """Open-order backlog over time -- the event-sourced inventory
    balance: each order opens (+1) in its ``o_orderdate`` month and
    closes (-1) in the month of its LAST line-item ship date (orders
    with no line items never close).  Returns one row per month from
    the first open to the last close: ``(month, n_opened, n_closed,
    backlog)`` where backlog is the running open count at month end.

    Scale shape: per-block +1 partials from orders; per-block
    (orderkey -> max shipdate) partials folded by ONE orderkey
    ``groupby.max`` (the close month needs the order's GLOBAL max
    ship date -- per-block maxima alone would close an order once
    per block); month-level counts are dim-bounded and the running
    total is O(months) driver math."""
    ds_o = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def month_of(ts_us: np.ndarray) -> np.ndarray:
        return (ts_us.astype("datetime64[us]").astype("datetime64[M]")
                .view(np.int64))  # months since 1970-01

    mo_schema = pa.schema([("month", pa.int64()), ("n", pa.int64())])

    def open_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mo_schema.empty_table()
        m = month_of(_ts_i64(t.column("o_orderdate")))
        order = np.argsort(m, kind="stable")
        ms = m[order]
        starts, lens = _segment_starts(ms)
        return pa.table(
            {"month": pa.array(ms[starts]),
             "n": pa.array(lens.astype(np.int64))},
            schema=mo_schema,
        )

    mo_kind_schema = pa.schema(
        [("kind", pa.int64()), ("month", pa.int64()), ("n", pa.int64())]
    )

    def tag(kind: int):
        def _t(t: pa.Table) -> pa.Table:
            return pa.table(
                {"kind": pa.array(
                    np.full(t.num_rows, kind, np.int64)),
                 "month": t.column("month"), "n": t.column("n")},
                schema=mo_kind_schema,
            )
        return _t

    opened_parts = ds_o.map_batches(
        open_partial, batch_format="pyarrow"
    ).map_batches(tag(0), batch_format="pyarrow")

    li_schema = pa.schema([("k", pa.int64()), ("hi", pa.int64())])

    def ship_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return li_schema.empty_table()
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sd = _ts_i64(t.column("l_shipdate"))
        order = np.argsort(k, kind="stable")
        ks, sds = k[order], sd[order]
        starts, _ = _segment_starts(ks)
        return pa.table(
            {"k": pa.array(ks[starts]),
             "hi": pa.array(np.maximum.reduceat(sds, starts))},
            schema=li_schema,
        )

    n_li, _ = _table_meta(sf_dir, "lineitem")
    P = _exchange_width(n_li)
    gd = _new_guard_dir("backlog")

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("k"), P))
        )

    def key_max_months(t: pa.Table) -> pa.Table:
        """Per-key GLOBAL max ship date (the exchange co-locates each
        key's partials) folded straight to per-block month counts."""
        if t.num_rows == 0:
            return mo_schema.empty_table()
        _guard_record(
            gd, "bk", t.column("_p").to_numpy(zero_copy_only=False)
        )
        k = t.column("k").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, his = k[order], hi[order]
        starts, _ = _segment_starts(ks)
        m = month_of(np.maximum.reduceat(his, starts))
        order2 = np.argsort(m, kind="stable")
        ms = m[order2]
        s2, lens = _segment_starts(ms)
        return pa.table(
            {"month": pa.array(ms[s2]),
             "n": pa.array(lens.astype(np.int64))},
            schema=mo_schema,
        )

    closed_parts = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(ship_partial, batch_format="pyarrow")
        .map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(key_max_months, batch_format="pyarrow",
                     batch_size=None)
        .map_batches(tag(1), batch_format="pyarrow")
    )

    # ONE execution: both sides union into a single (kind, month)
    # fold -- the first version ran two jobs and paid startup twice
    folded = (
        opened_parts.union(closed_parts)
        .groupby(["kind", "month"]).sum("n").to_pandas()
    )
    folded.columns = ["kind", "month", "n"]

    import pandas as pd

    opened = folded[folded["kind"] == 0][["month", "n"]].rename(
        columns={"n": "n_opened"})
    closed = folded[folded["kind"] == 1][["month", "n"]].rename(
        columns={"n": "n_closed"})
    merged = opened.merge(closed, on="month", how="outer").fillna(0)
    lo, hi = int(merged["month"].min()), int(merged["month"].max())
    grid = pd.DataFrame({"month": range(lo, hi + 1)})
    merged = grid.merge(merged, on="month", how="left").fillna(0)
    n_open = merged["n_opened"].to_numpy(dtype=np.int64)
    n_close = merged["n_closed"].to_numpy(dtype=np.int64)
    backlog = np.cumsum(n_open - n_close)
    out = pa.table(
        {"month": pa.array(merged["month"].to_numpy(dtype=np.int64)),
         "n_opened": pa.array(n_open),
         "n_closed": pa.array(n_close),
         "backlog": pa.array(backlog.astype(np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Burstiness: Fano factor of the dense hourly count series
# ---------------------------------------------------------------------------
def events_burstiness(sf_dir: str) -> pa.Table:
    """Fano factor (variance / mean, the burstiness index; 1 =
    Poisson) per ``event_type`` over the DENSE hourly count series
    (missing hours count 0, same global grid as ar1/cusum).  With
    ``T`` hours and counts ``x_t``: ``fano = (T*sum(x^2) -
    (sum x)^2) / (T * sum x)`` -- population variance over mean,
    every factor an integer, emitted as ``floor(1e6 * fano)`` plus
    the integer sufficient sums.  Returns ``(event_type, n_hours,
    sum_x, sum_x2, fano_e6)``.

    Scale shape: identical to ar1/cusum -- per-block (type, hour)
    count partials, dim-bounded ``groupby.sum``, O(types) driver
    math in arbitrary-precision ints (zero hours contribute nothing
    to either sum, so the dense grid costs nothing)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hour": pa.array(hr[order][starts]),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n_obs"]
    out_schema = pa.schema(
        [("event_type", pa.string()), ("n_hours", pa.int64()),
         ("sum_x", pa.int64()), ("sum_x2", pa.int64()),
         ("fano_e6", pa.int64())]
    )
    if len(merged) == 0:
        return out_schema.empty_table()
    span = int(merged["hour"].max()) - int(merged["hour"].min()) + 1
    rows = []
    for et, grp in merged.groupby("event_type", sort=True):
        x = [int(v) for v in grp["n_obs"]]
        sx, sx2 = sum(x), sum(v * v for v in x)
        fano = 10**6 * (span * sx2 - sx * sx) // (span * sx) if sx else 0
        rows.append((et, span, sx, sx2, fano))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n_hours": pa.array([r[1] for r in rows], pa.int64()),
         "sum_x": pa.array([r[2] for r in rows], pa.int64()),
         "sum_x2": pa.array([r[3] for r in rows], pa.int64()),
         "fano_e6": pa.array([r[4] for r in rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Moving-average crossover detection (golden-cross signal)
# ---------------------------------------------------------------------------
def events_ma_crossover(
    sf_dir: str, fast: int = 3, slow: int = 12
) -> pa.Table:
    """Moving-average crossover signal per ``event_type`` over the
    dense hourly count series: hours where the trailing ``fast``-hour
    mean crosses the trailing ``slow``-hour mean.  Means never
    materialize as floats -- ``MA_f > MA_s  <=>  sum_f * slow >
    sum_s * fast`` (exact integer cross-multiplication); a crossover
    fires when the comparison flips sign vs the previous hour (ties
    = equal means break no cross).  Emitted per type: ``(event_type,
    n_golden, n_death, first_cross_hour)`` (golden = fast rises
    above slow; first_cross_hour = -1 if none).

    Scale shape: the ar1/cusum series contract -- per-block
    (type, hour) count partials, dim-bounded ``groupby.sum``,
    O(series) vectorized driver math over trailing sums (both
    windows need ``slow`` complete hours before they compare)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hour": pa.array(hr[order][starts]),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n_obs"]
    out_schema = pa.schema(
        [("event_type", pa.string()), ("n_golden", pa.int64()),
         ("n_death", pa.int64()), ("first_cross_hour", pa.int64())]
    )
    if len(merged) == 0:
        return out_schema.empty_table()
    h_lo = int(merged["hour"].min())
    h_hi = int(merged["hour"].max())
    span = h_hi - h_lo + 1
    rows = []
    for et, grp in merged.groupby("event_type", sort=True):
        dense = np.zeros(span, np.int64)
        dense[grp["hour"].to_numpy(dtype=np.int64) - h_lo] = (
            grp["n_obs"].to_numpy(dtype=np.int64)
        )
        cs = np.concatenate([[0], np.cumsum(dense)])
        if span < slow + 1:
            rows.append((et, 0, 0, -1))
            continue
        # trailing sums at hours t = slow-1 .. span-1
        t = np.arange(slow - 1, span)
        sum_f = cs[t + 1] - cs[t + 1 - fast]
        sum_s = cs[t + 1] - cs[t + 1 - slow]
        # sign of MA_f - MA_s, exact
        sgn = np.sign(sum_f * slow - sum_s * fast)
        golden = (sgn[1:] > 0) & (sgn[:-1] <= 0) & (sgn[:-1] != sgn[1:])
        death = (sgn[1:] < 0) & (sgn[:-1] >= 0) & (sgn[:-1] != sgn[1:])
        cross = golden | death
        first = int(t[1:][cross][0]) + h_lo if cross.any() else -1
        rows.append((et, int(golden.sum()), int(death.sum()), first))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n_golden": pa.array([r[1] for r in rows], pa.int64()),
         "n_death": pa.array([r[2] for r in rows], pa.int64()),
         "first_cross_hour": pa.array([r[3] for r in rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Year-over-year revenue growth (sign-safe exact percentages)
# ---------------------------------------------------------------------------
def orders_yoy_growth(sf_dir: str) -> pa.Table:
    """Year-over-year order-revenue growth: per order year, total
    ``o_totalprice`` in exact cents and the growth vs the PREVIOUS
    observed year as ``sign * floor(1e6 * |rev - prev| / prev)``
    (sign-safe: truncating division of the absolute delta matches
    every engine; NULL -> first year emits growth 0 and flag 0).
    Returns ``(o_year, revenue_cents, has_prev, yoy_e6)``.

    Scale shape: per-block (year -> cents) partials (a combiner:
    years per block, not rows) -> dim-bounded ``groupby.sum`` ->
    O(years) driver lag math."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    part_schema = pa.schema([("y", pa.int64()), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        od = _ts_i64(t.column("o_orderdate"))
        y = (od.astype("datetime64[us]").astype("datetime64[Y]")
             .view(np.int64) + 1970)
        cents = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        order = np.argsort(y, kind="stable")
        ys, cs = y[order], cents[order]
        starts, _ = _segment_starts(ys)
        return pa.table(
            {"y": pa.array(ys[starts]),
             "cents": pa.array(np.add.reduceat(cs, starts))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("y").sum("cents").to_pandas()
    )
    agg.columns = ["y", "cents"]
    agg = agg.sort_values("y", ignore_index=True)
    rev = agg["cents"].to_numpy(dtype=np.int64)
    years = agg["y"].to_numpy(dtype=np.int64)
    yoy, has_prev = [], []
    for i in range(len(rev)):
        # growth only vs the immediately preceding CALENDAR year
        if i > 0 and years[i] == years[i - 1] + 1 and rev[i - 1] != 0:
            d_ = int(rev[i]) - int(rev[i - 1])
            s = -1 if d_ < 0 else 1
            yoy.append(s * (10**6 * abs(d_) // int(rev[i - 1])))
            has_prev.append(1)
        else:
            yoy.append(0)
            has_prev.append(0)
    return pa.table(
        {"o_year": pa.array(years),
         "revenue_cents": pa.array(rev),
         "has_prev": pa.array(has_prev, pa.int64()),
         "yoy_e6": pa.array(yoy, pa.int64())}
    )


# ---------------------------------------------------------------------------
# Share-of-parent hierarchical rollup: nation within region
# ---------------------------------------------------------------------------
def region_nation_share(sf_dir: str) -> pa.Table:
    """Hierarchical share-of-parent rollup: each customer nation's
    order revenue as an exact share of its REGION's revenue --
    ``share_e6 = floor(1e6 * nation_rev / region_rev)`` -- the
    percent-of-parent report every BI rollup needs.  Returns
    ``(r_name, n_name, revenue_cents, share_e6)`` ordered by region,
    share desc, nation.

    Scale shape: the orders fact scan folds per-block (custkey is
    resolved to nation by ONE custkey exchange against the customer
    dim -- no fact-sized broadcast), nation-level sums are
    dim-bounded, and the region totals + shares are O(nations)
    driver math against the broadcast nation->region map."""
    n_cust, _ = _table_meta(sf_dir, "customer")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_cust + n_or)
    gd = _new_guard_dir("rnshare")

    e = pa.schema(
        [("_key", pa.int64()), ("_side", pa.int8()), ("_nat", pa.int32()),
         ("_cents", pa.int64()), ("_p", pa.int64())]
    )

    def cust_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e.empty_table()
        ck = t.column("c_custkey").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {"_key": ck, "_side": pa.array(np.zeros(n, np.int8)),
             "_nat": t.column("c_nationkey").cast(pa.int32()),
             "_cents": pa.array(np.zeros(n, np.int64)),
             "_p": pa.array(partition_ids(ck, P))},
            schema=e,
        )

    def order_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e.empty_table()
        ck = t.column("o_custkey").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {"_key": ck, "_side": pa.array(np.ones(n, np.int8)),
             "_nat": pa.array(np.zeros(n, np.int32)),
             "_cents": pa.array(_cents(
                 t.column("o_totalprice").to_numpy(zero_copy_only=False))),
             "_p": pa.array(partition_ids(ck, P))},
            schema=e,
        )

    part_schema = pa.schema([("nat", pa.int64()), ("cents", pa.int64())])

    def nat_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "rns", t.column("_p").to_numpy(zero_copy_only=False)
        )
        key = t.column("_key").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        nat = t.column("_nat").to_numpy(zero_copy_only=False)
        cents = t.column("_cents").to_numpy(zero_copy_only=False)
        is_o = side == 1
        bk, bn = key[~is_o], nat[~is_o]
        if len(bk) == 0 or is_o.sum() == 0:
            return part_schema.empty_table()
        bo = np.argsort(bk, kind="stable")
        bk, bn = bk[bo], bn[bo]
        pk, pc = key[is_o], cents[is_o]
        pos = np.searchsorted(bk, pk)
        hit = (pos < len(bk)) & (bk[np.clip(pos, 0, len(bk) - 1)] == pk)
        nt = bn[pos[hit]].astype(np.int64)
        pc = pc[hit]
        order = np.argsort(nt, kind="stable")
        nt, pc = nt[order], pc[order]
        starts, _ = _segment_starts(nt)
        return pa.table(
            {"nat": pa.array(nt[starts]),
             "cents": pa.array(np.add.reduceat(pc, starts))},
            schema=part_schema,
        )

    agg = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        .map_batches(cust_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
            .map_batches(order_rows, batch_format="pyarrow")
        )
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(nat_sweep, batch_format="pyarrow", batch_size=None)
        .groupby("nat").sum("cents").to_pandas()
    )
    agg.columns = ["nat", "cents"]

    nat = _read_dim(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = _read_dim(sf_dir, "region", columns=["r_regionkey", "r_name"])
    m = agg.merge(nat, left_on="nat", right_on="n_nationkey") \
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    rtot = m.groupby("r_regionkey")["cents"].transform("sum")
    cents = m["cents"].to_numpy(dtype=np.int64)
    share = np.array(
        [10**6 * int(c) // int(t) for c, t in zip(cents, rtot)], np.int64)
    m = m.assign(share_e6=share)
    m = m.sort_values(["r_name", "share_e6", "n_name"],
                      ascending=[True, False, True], ignore_index=True)
    out = pa.table(
        {"r_name": pa.array(m["r_name"], pa.string()),
         "n_name": pa.array(m["n_name"], pa.string()),
         "revenue_cents": pa.array(m["cents"].to_numpy(dtype=np.int64)),
         "share_e6": pa.array(m["share_e6"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Linear multi-touch attribution
# ---------------------------------------------------------------------------
def events_linear_attribution(
    sf_dir: str, conv_type: str = "purchase", window_hours: int = 24
) -> pa.Table:
    """Linear multi-touch attribution: every ``conv_type`` conversion
    distributes one unit of credit EQUALLY across the same user's
    touches (any event, conversion included) in the preceding
    ``window_hours`` -- each touch earns exact ``floor(1e6 /
    n_touches)`` micro-credits (the per-conversion floor makes the
    split engine-exact; ``events_last_touch`` is the winner-take-all
    sibling).  Returns per touch type: ``(event_type, n_touches,
    credit_e6)`` ordered by type.

    Distributed shape: ONE user_id hash exchange, then a per-block
    two-pointer sweep over each user's time-sorted events (window
    membership via ``searchsorted``); per-block (type -> credit)
    partials make the final ``groupby`` dimension-sized."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("linattr")
    W = np.int64(window_hours * 3600 * _US)

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    part_schema = pa.schema(
        [("event_type", pa.string()), ("n_touches", pa.int64()),
         ("credit_e6", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "lat", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        starts, lens = _segment_starts(u)
        credit: dict[str, int] = {}
        touches: dict[str, int] = {}
        for s, m in zip(starts, lens):
            seg_ts = ts[s:s + m]
            seg_et = et[s:s + m]
            conv_idx = np.flatnonzero(seg_et == conv_type)
            if len(conv_idx) == 0:
                continue
            # earliest index inside each conversion's window
            lo = np.searchsorted(seg_ts, seg_ts[conv_idx] - W, side="left")
            for ci, l_ in zip(conv_idx, lo):
                n = int(ci - l_ + 1)
                c = 10**6 // n
                for j in range(l_, ci + 1):
                    k = seg_et[j]
                    credit[k] = credit.get(k, 0) + c
                    touches[k] = touches.get(k, 0) + 1
        if not credit:
            return part_schema.empty_table()
        keys = sorted(credit)
        return pa.table(
            {"event_type": pa.array(keys, pa.string()),
             "n_touches": pa.array([touches[k] for k in keys], pa.int64()),
             "credit_e6": pa.array([credit[k] for k in keys], pa.int64())},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .sum(["n_touches", "credit_e6"])
        .to_pandas()
    )
    agg.columns = ["event_type", "n_touches", "credit_e6"]
    agg = agg.sort_values("event_type", ignore_index=True)
    out = pa.table(
        {"event_type": pa.array(agg["event_type"], pa.string()),
         "n_touches": pa.array(agg["n_touches"].to_numpy(dtype=np.int64)),
         "credit_e6": pa.array(agg["credit_e6"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Power-user thresholds: exact quantiles of per-user event counts
# ---------------------------------------------------------------------------
def events_user_count_quantiles(sf_dir: str) -> pa.Table:
    """Exact order statistics of the DERIVED per-user event-count
    distribution: the lower quantile (rank ``ceil(q * n)``) of
    events-per-user at q in {0.5, 0.9, 0.99}, plus min/max -- the
    power-user threshold report.  Returns ``(q_e2, value)`` with
    rows 0 (min), 50, 90, 99, 100 (max).

    Distributed shape: per-block per-user count partials -> ONE
    user ``groupby.sum`` -> per-block HISTOGRAM of the derived
    counts (count-of-counts, dimension-bounded) -> exact driver
    quantile walk over the tiny histogram.  No per-user row ever
    reaches the driver."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    part_schema = pa.schema([("user_id", pa.int64()), ("c", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(u, kind="stable")
        us = u[order]
        starts, lens = _segment_starts(us)
        return pa.table(
            {"user_id": pa.array(us[starts]),
             "c": pa.array(lens.astype(np.int64))},
            schema=part_schema,
        )

    hist_schema = pa.schema([("c", pa.int64()), ("n", pa.int64())])

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        c = t.column("sum(c)").to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        cs = c[order]
        starts, lens = _segment_starts(cs)
        return pa.table(
            {"c": pa.array(cs[starts]),
             "n": pa.array(lens.astype(np.int64))},
            schema=hist_schema,
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id").sum("c")
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c").sum("n")
        .to_pandas()
    )
    hist.columns = ["c", "n"]
    hist = hist.sort_values("c", ignore_index=True)
    vals = hist["c"].to_numpy(dtype=np.int64)
    cnts = hist["n"].to_numpy(dtype=np.int64)
    n_users = int(cnts.sum())
    cum = np.cumsum(cnts)

    def q_at(rank: int) -> int:
        return int(vals[np.searchsorted(cum, rank, side="left")])

    rows = [(0, int(vals[0])), (50, q_at(-(-n_users * 50 // 100))),
            (90, q_at(-(-n_users * 90 // 100))),
            (99, q_at(-(-n_users * 99 // 100))), (100, int(vals[-1]))]
    return pa.table(
        {"q_e2": pa.array([r[0] for r in rows], pa.int64()),
         "value": pa.array([r[1] for r in rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Bitmask set algebra over per-user behavior sets
# ---------------------------------------------------------------------------
def events_user_type_algebra(
    sf_dir: str, need=("click", "purchase"), forbid=("error",)
) -> pa.Table:
    """Audience set algebra via bitmap indexes: users who performed
    ALL of ``need`` and NONE of ``forbid``.  Each user folds to one
    int64 bitmask over the (sorted) global type vocabulary -- the
    OR-aggregate bitmap-index pattern (types are dimension-bounded;
    64 is the int64 budget, asserted).  Returns one row:
    ``(n_users_total, n_matching, min_user_id, max_user_id)``.

    Distributed shape: per-block per-user OR-mask partials -> ONE
    user ``groupby`` bit_or-style fold (sum of distinct per-block
    masks would be wrong; the fold re-ORs via max on per-bit
    idempotence -- we instead re-OR inside a second sweep) ->
    per-block predicate partials -> driver scalar fold."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    # global type vocabulary (dimension-bounded)
    tv = (
        ds.map_batches(
            lambda t: pa.table(
                {"event_type": pc.unique(t.column("event_type"))}
            ),
            batch_format="pyarrow",
        )
        .groupby("event_type").count().to_pandas()
    )
    types = sorted(tv["event_type"].tolist())
    if len(types) > 63:
        raise ValueError("bitmap algebra supports <= 63 event types")
    bit = {t: 1 << i for i, t in enumerate(types)}
    need_mask = sum(bit[t] for t in need if t in bit)
    forbid_mask = sum(bit[t] for t in forbid if t in bit)

    part_schema = pa.schema([("user_id", pa.int64()), ("m", pa.int64())])

    def mask_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        m = np.asarray([bit[e] for e in et], np.int64)
        order = np.argsort(u, kind="stable")
        us, ms = u[order], m[order]
        starts, _ = _segment_starts(us)
        return pa.table(
            {"user_id": pa.array(us[starts]),
             "m": pa.array(np.bitwise_or.reduceat(ms, starts))},
            schema=part_schema,
        )

    stat_schema = pa.schema(
        [("n_users", pa.int64()), ("n_match", pa.int64()),
         ("lo", pa.int64()), ("hi", pa.int64())]
    )

    def verdict(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return stat_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        # groupby.sum over per-block masks can double-count bits; the
        # fold below re-ORs the per-block partials per user instead
        m = t.column("m").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, ms = u[order], m[order]
        starts, _ = _segment_starts(us)
        mm = np.bitwise_or.reduceat(ms, starts)
        uu = us[starts]
        ok = ((mm & need_mask) == need_mask) & ((mm & forbid_mask) == 0)
        return pa.table(
            {"n_users": pa.array([len(uu)], pa.int64()),
             "n_match": pa.array([int(ok.sum())], pa.int64()),
             "lo": pa.array(
                 [int(uu[ok].min()) if ok.any() else 2**62], pa.int64()),
             "hi": pa.array(
                 [int(uu[ok].max()) if ok.any() else -1], pa.int64())},
            schema=stat_schema,
        )

    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("typealg")

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    def verdict_g(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return stat_schema.empty_table()
        _guard_record(
            gd, "alg", t.column("_p").to_numpy(zero_copy_only=False)
        )
        return verdict(t)

    stats = (
        ds.map_batches(mask_partial, batch_format="pyarrow")
        .map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(verdict_g, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    n_users = int(stats["n_users"].sum())
    n_match = int(stats["n_match"].sum())
    lo = int(stats["lo"].min()) if n_match else -1
    hi = int(stats["hi"].max()) if n_match else -1
    out = pa.table(
        {"n_users_total": pa.array([n_users], pa.int64()),
         "n_matching": pa.array([n_match], pa.int64()),
         "min_user_id": pa.array([lo], pa.int64()),
         "max_user_id": pa.array([hi], pa.int64())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Session-level rollup over the sessionizer's output
# ---------------------------------------------------------------------------
def events_session_stats(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Corpus-level session metrics COMPOSED over
    ``events_sessionize`` (operators as building blocks, not
    monoliths): total sessions, bounce sessions (single event),
    exact ``bounce_e6``, and the duration sum/max/floor-mean in
    microseconds.  Returns one row.

    Scale shape: inherits the sessionizer's one-exchange plan; this
    rollup adds only a session-table scan folded to per-block scalar
    partials -- the session table itself never concentrates."""
    sess = events_sessionize(sf_dir, gap_minutes=gap_minutes)
    n = sess.num_rows
    if n == 0:
        return pa.table(
            {"n_sessions": pa.array([0], pa.int64()),
             "n_bounce": pa.array([0], pa.int64()),
             "bounce_e6": pa.array([0], pa.int64()),
             "sum_duration_us": pa.array([0], pa.int64()),
             "max_duration_us": pa.array([0], pa.int64()),
             "mean_duration_us": pa.array([0], pa.int64())}
        )
    ne = sess.column("n_events").to_numpy()
    lo = sess.column("session_start").cast(pa.int64()).to_numpy()
    hi = sess.column("session_end").cast(pa.int64()).to_numpy()
    dur = hi - lo
    n_bounce = int((ne == 1).sum())
    return pa.table(
        {"n_sessions": pa.array([n], pa.int64()),
         "n_bounce": pa.array([n_bounce], pa.int64()),
         "bounce_e6": pa.array([10**6 * n_bounce // n], pa.int64()),
         "sum_duration_us": pa.array([int(dur.sum())], pa.int64()),
         "max_duration_us": pa.array([int(dur.max())], pa.int64()),
         "mean_duration_us": pa.array([int(dur.sum()) // n], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Inter-event gap histogram (log2 buckets)
# ---------------------------------------------------------------------------
def events_gap_histogram(sf_dir: str) -> pa.Table:
    """Histogram of inter-event gaps per user on an exact log2 scale:
    each consecutive same-user gap (microseconds, ``(ts, event_id)``
    order) lands in bucket ``bit_length(gap_us)`` (0 for gap 0) --
    integer bucketing with NO float log (``floor(log2 x)`` is not
    correctly rounded near powers of two; bit_length is exact).
    Returns ``(bucket, n_gaps)`` ordered by bucket.

    Scale shape: ONE user hash exchange, per-block lexsort + diff +
    frexp bucketing (exact below 2^53 us ~ 285 years, asserted),
    per-block bucket partials -> tiny final ``groupby.sum``."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("gaph")
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("user_id"), P))
        )

    part_schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64())])

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "gap", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        same = np.concatenate([[False], u[1:] == u[:-1]])
        gaps = (ts - np.concatenate([[0], ts[:-1]]))[same]
        if gaps.size == 0:
            return part_schema.empty_table()
        if int(gaps.max()) >= (1 << 53):
            raise ValueError("gap exceeds exact-frexp range (2^53 us)")
        _, exp = np.frexp(gaps.astype(np.float64))
        bucket = np.where(gaps > 0, exp, 0).astype(np.int64)
        order2 = np.argsort(bucket, kind="stable")
        bs = bucket[order2]
        starts, lens = _segment_starts(bs)
        return pa.table(
            {"bucket": pa.array(bs[starts]),
             "n": pa.array(lens.astype(np.int64))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("bucket").sum("n").to_pandas()
    )
    agg.columns = ["bucket", "n_gaps"]
    agg = agg.sort_values("bucket", ignore_index=True)
    out = pa.table(
        {"bucket": pa.array(agg["bucket"].to_numpy(dtype=np.int64)),
         "n_gaps": pa.array(agg["n_gaps"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Onion peeling: the first L Pareto layers
# ---------------------------------------------------------------------------
def _skyline_mask(p: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Boolean skyline mask over DISTINCT (p, d) points, vectorized
    (the ``orders_skyline`` suffix-max argument): survivors are each
    price group's max-day point whose day beats the suffix max over
    strictly greater prices."""
    order = np.lexsort((d, p))
    ps, ds_ = p[order], d[order]
    pstarts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
    pend = np.r_[pstarts[1:], len(ps)] - 1
    maxd = ds_[pend]
    nxt = np.r_[np.maximum.accumulate(maxd[::-1])[::-1][1:], np.int64(-1)]
    keep_sorted = pend[maxd > nxt]
    mask = np.zeros(len(p), bool)
    mask[order[keep_sorted]] = True
    return mask


def orders_skyline_layers(sf_dir: str, layers: int = 3) -> pa.Table:
    """Onion peeling: the first ``layers`` Pareto layers of the
    (price_cents, day) point set -- layer 1 is the skyline, layer 2
    the skyline after removing it, and so on (the multi-objective
    ranking behind tiered best-offer search).  Returns one row per
    surviving distinct point: ``(layer, price_cents, day, n_orders,
    min_orderkey)``, ordered by (layer, price desc, day).

    Distributed shape + exactness: each block aggregates its
    distinct points and peels LOCALLY ``layers`` times; subset
    monotonicity (``layer_S(p) <= layer_full(p)`` for ``S`` a
    subset) means every point with GLOBAL layer <= L keeps local
    layer <= L, so the block's <= L candidates contain all true
    survivors WITH all their count partials.  The merge re-peels the
    candidate union: a point's dominator chain lies in strictly
    shallower layers, so the chain is fully inside the candidate
    set and the re-peel reproduces exact global layers (extra
    local-only candidates compute layer > L and drop out).  Local
    candidate sets are O(L * frontier), so the single-block merge
    sweeps tiny partials."""
    day_us = np.int64(86_400 * _US)
    part_schema = pa.schema(
        [("price_cents", pa.int64()), ("day", pa.int64()),
         ("n_orders", pa.int64()), ("min_orderkey", pa.int64())]
    )
    out_schema = pa.schema(
        [("layer", pa.int64()), ("price_cents", pa.int64()),
         ("day", pa.int64()), ("n_orders", pa.int64()),
         ("min_orderkey", pa.int64())]
    )

    def distinct_points(t: pa.Table):
        price = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        day = _ts_i64(t.column("o_orderdate")) // day_us
        mk = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((day, price))
        p, d, k = price[order], day[order], mk[order]
        brk = np.r_[True, (p[1:] != p[:-1]) | (d[1:] != d[:-1])]
        starts = np.flatnonzero(brk)
        n = np.diff(np.append(starts, len(p))).astype(np.int64)
        return (p[starts], d[starts], n,
                np.minimum.reduceat(k, starts))

    def peel(p, d, L):
        """layer id (1-based) per point; 0 = deeper than L."""
        layer = np.zeros(len(p), np.int64)
        alive = np.ones(len(p), bool)
        for li in range(1, L + 1):
            if not alive.any():
                break
            idx = np.flatnonzero(alive)
            m = _skyline_mask(p[idx], d[idx])
            layer[idx[m]] = li
            alive[idx[m]] = False
        return layer

    def local_candidates(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        p, d, n, k = distinct_points(t)
        layer = peel(p, d, layers)
        keep = layer > 0
        return pa.table(
            {"price_cents": pa.array(p[keep]), "day": pa.array(d[keep]),
             "n_orders": pa.array(n[keep]),
             "min_orderkey": pa.array(k[keep])},
            schema=part_schema,
        )

    def final_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        p = t.column("price_cents").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        n = t.column("n_orders").to_numpy(zero_copy_only=False)
        k = t.column("min_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, p))
        p, d, n, k = p[order], d[order], n[order], k[order]
        brk = np.r_[True, (p[1:] != p[:-1]) | (d[1:] != d[:-1])]
        starts = np.flatnonzero(brk)
        pu, du = p[starts], d[starts]
        nu = np.add.reduceat(n, starts)
        ku = np.minimum.reduceat(k, starts)
        layer = peel(pu, du, layers)
        keep = layer > 0
        pu, du, nu, ku, layer = (pu[keep], du[keep], nu[keep], ku[keep],
                                 layer[keep])
        order2 = np.lexsort((du, -pu, layer))
        return pa.table(
            {"layer": pa.array(layer[order2]),
             "price_cents": pa.array(pu[order2]),
             "day": pa.array(du[order2]),
             "n_orders": pa.array(nu[order2]),
             "min_orderkey": pa.array(ku[order2])},
            schema=out_schema,
        )

    res = (
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_totalprice", "o_orderdate"])
        .map_batches(local_candidates, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_sweep, batch_format="pyarrow", batch_size=None)
    )
    return pa.Table.from_pandas(res.to_pandas(),
                                preserve_index=False).cast(out_schema)


# ---------------------------------------------------------------------------
# Per-type min-max normalization (row-level feature scaling)
# ---------------------------------------------------------------------------
def events_minmax_normalize(sf_dir: str) -> pa.Table:
    """Row-level min-max feature scaling: every event's value
    rescaled within its type to exact ``z_e6 = floor(1e6 * (x -
    min) / (max - min))`` (0 when the type is constant) -- the
    normalize-before-training transform, emitted per event (a
    row-preserving operator, unlike the aggregate family).  Returns
    ``(event_id, event_type, value_cents, z_e6)`` ordered by id.

    Scale shape: pass 1 folds per-block (type -> min, max) partials
    to a dimension-sized driver dict; pass 2 broadcasts it and maps
    every row in place -- no exchange at all, both passes
    embarrassingly parallel."""
    from ray.data import aggregate as _ray_agg

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    mm_schema = pa.schema(
        [("event_type", pa.string()), ("lo", pa.int64()),
         ("hi", pa.int64())]
    )

    def mm_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mm_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        order, starts, _ = _group_segments(et)
        cs = cents[order]
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "lo": pa.array(np.minimum.reduceat(cs, starts)),
             "hi": pa.array(np.maximum.reduceat(cs, starts))},
            schema=mm_schema,
        )

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(_ray_agg.Min("lo"), _ray_agg.Max("hi"))
        .to_pandas()
    )
    mm.columns = ["event_type", "lo", "hi"]
    lo_map = dict(zip(mm["event_type"], mm["lo"].astype(int)))
    hi_map = dict(zip(mm["event_type"], mm["hi"].astype(int)))

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()),
         ("value_cents", pa.int64()), ("z_e6", pa.int64())]
    )

    def normalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        lo = np.asarray([lo_map[e] for e in et], np.int64)
        hi = np.asarray([hi_map[e] for e in et], np.int64)
        rng = hi - lo
        z = np.where(rng > 0, (10**6 * (cents - lo)) // np.maximum(rng, 1),
                     0).astype(np.int64)
        return pa.table(
            {"event_id": pc.cast(t.column("event_id"), pa.int64()),
             "event_type": pa.array(list(et), pa.string()),
             "value_cents": pa.array(cents),
             "z_e6": pa.array(z)},
            schema=out_schema,
        )

    res = ds.map_batches(normalize, batch_format="pyarrow").to_pandas()
    res = res.sort_values("event_id", ignore_index=True)
    return pa.Table.from_pandas(res, preserve_index=False).cast(out_schema)


# ---------------------------------------------------------------------------
# Mann-Whitney U between two types' value distributions
# ---------------------------------------------------------------------------
def events_mann_whitney(
    sf_dir: str, type_a: str = "purchase", type_b: str = "click"
) -> pa.Table:
    """Exact Mann-Whitney U between the value distributions of two
    event types -- the nonparametric are-these-samples-different
    test.  ``U2 = 2 * #{(x, y): x > y} + #{ties}`` (doubled to stay
    integer under the half-credit tie rule).  Returns one row
    ``(n_a, n_b, u2_a, u2_b)`` with ``u2_a + u2_b = 2 * n_a * n_b``
    (the built-in consistency identity).

    Scale shape: per-block value-HISTOGRAM partials per side (cents
    domain, not row count) -> value ``groupby.sum`` -> one
    O(distinct values) driver merge computing the pair counts from
    cumulative sums -- the n_a * n_b pair space never materializes."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    hist_schema = pa.schema(
        [("v", pa.int64()), ("na", pa.int64()), ("nb", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        is_a, is_b = et == type_a, et == type_b
        keep = is_a | is_b
        if not keep.any():
            return hist_schema.empty_table()
        v = cents[keep]
        side_a = is_a[keep]
        order = np.argsort(v, kind="stable")
        vs, sa = v[order], side_a[order]
        starts, _ = _segment_starts(vs)
        na = np.add.reduceat(sa.astype(np.int64), starts)
        tot = np.add.reduceat(np.ones(len(vs), np.int64), starts)
        return pa.table(
            {"v": pa.array(vs[starts]), "na": pa.array(na),
             "nb": pa.array(tot - na)},
            schema=hist_schema,
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v").sum(["na", "nb"]).to_pandas()
    )
    hist.columns = ["v", "na", "nb"]
    hist = hist.sort_values("v", ignore_index=True)
    na = hist["na"].to_numpy(dtype=np.int64)
    nb = hist["nb"].to_numpy(dtype=np.int64)
    n_a, n_b = int(na.sum()), int(nb.sum())
    # pairs x>y: for each value v, a-count(v) * b-count(below v)
    cum_b = np.concatenate([[0], np.cumsum(nb)[:-1]])
    cum_a = np.concatenate([[0], np.cumsum(na)[:-1]])
    gt_a = int((na.astype(object) * cum_b.astype(object)).sum())
    gt_b = int((nb.astype(object) * cum_a.astype(object)).sum())
    ties = int((na.astype(object) * nb.astype(object)).sum())
    return pa.table(
        {"n_a": pa.array([n_a], pa.int64()),
         "n_b": pa.array([n_b], pa.int64()),
         "u2_a": pa.array([2 * gt_a + ties], pa.int64()),
         "u2_b": pa.array([2 * gt_b + ties], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Squared-cosine similarity between type audience-count vectors
# ---------------------------------------------------------------------------
def events_type_cosine2(sf_dir: str) -> pa.Table:
    """Weighted audience similarity: for every pair of event types,
    the SQUARED cosine between their per-user count vectors --
    ``cos^2 = dot^2 / (|a|^2 |b|^2)`` -- as ``floor(1e6 * cos^2)``.
    Squaring removes the square root, so the statistic stays an
    exact integer ratio (``events_type_jaccard`` is the unweighted
    sibling).  Returns ``(type_a, type_b, dot, norm2_a, norm2_b,
    cos2_e6)``, ``type_a < type_b``.

    Scale shape: per-block (type, user) count partials -> pair-level
    ``groupby.sum`` -> ONE user hash exchange where each block's
    segment sweep emits per-user cross products (types per user are
    dimension-bounded) pre-folded per block -> tiny pair fold; the
    norms fold the same way from squares.  Driver math is
    O(types^2) in arbitrary-precision ints."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("tcos")
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    pair_schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()),
         ("c", pa.int64()), ("_p", pa.int64())]
    )

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.asarray([f"{uu}\x00{e}" for uu, e in zip(u, et)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        uu = u[order][starts]
        return pa.table(
            {"user_id": pa.array(uu),
             "event_type": pa.array(list(et[order][starts]), pa.string()),
             "c": pa.array(counts.astype(np.int64)),
             "_p": pa.array(partition_ids(pa.array(uu), P))},
            schema=pair_schema,
        )

    dot_schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()),
         ("v", pa.int64())]
    )

    def cross_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return dot_schema.empty_table()
        _guard_record(
            gd, "tcos", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((et, u))
        u, et, c = u[order], et[order], c[order]
        # re-fold same (user, type) partials arriving from two blocks
        same = np.concatenate(
            [[False], (u[1:] == u[:-1]) & (et[1:] == et[:-1])]
        )
        starts0 = np.flatnonzero(~same)
        u, et = u[starts0], et[starts0]
        c = np.add.reduceat(c, starts0)
        starts, lens = _segment_starts(u)
        ta, tb, vals = [], [], []
        for s, m in zip(starts, lens):
            seg_t = et[s:s + m]
            seg_c = c[s:s + m]
            # norms ride as (t, t) self-pairs
            for i in range(m):
                ta.append(seg_t[i])
                tb.append(seg_t[i])
                vals.append(int(seg_c[i]) * int(seg_c[i]))
                for j in range(i + 1, m):
                    ta.append(seg_t[i])
                    tb.append(seg_t[j])
                    vals.append(int(seg_c[i]) * int(seg_c[j]))
        key = np.asarray([f"{a}\x00{b}" for a, b in zip(ta, tb)],
                         dtype=object)
        order2, starts2, _ = _group_segments(key)
        a_arr = np.asarray(ta, dtype=object)
        b_arr = np.asarray(tb, dtype=object)
        v_arr = np.asarray(vals, dtype=np.int64)
        return pa.table(
            {"type_a": pa.array(list(a_arr[order2][starts2]), pa.string()),
             "type_b": pa.array(list(b_arr[order2][starts2]), pa.string()),
             "v": pa.array(np.add.reduceat(v_arr[order2], starts2))},
            schema=dot_schema,
        )

    folded = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(cross_sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["type_a", "type_b"])
        .sum("v")
        .to_pandas()
    )
    folded.columns = ["type_a", "type_b", "v"]
    norms = {r.type_a: int(r.v) for r in folded.itertuples()
             if r.type_a == r.type_b}
    pairs = folded[folded["type_a"] != folded["type_b"]].sort_values(
        ["type_a", "type_b"], ignore_index=True)
    dot = pairs["v"].to_numpy(dtype=np.int64)
    na = [norms[a] for a in pairs["type_a"]]
    nb = [norms[b] for b in pairs["type_b"]]
    cos2 = [10**6 * int(d) * int(d) // (a * b)
            for d, a, b in zip(dot, na, nb)]
    out = pa.table(
        {"type_a": pa.array(pairs["type_a"], pa.string()),
         "type_b": pa.array(pairs["type_b"], pa.string()),
         "dot": pa.array(dot),
         "norm2_a": pa.array(na, pa.int64()),
         "norm2_b": pa.array(nb, pa.int64()),
         "cos2_e6": pa.array(cos2, pa.int64())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test over the dense hourly series
# ---------------------------------------------------------------------------
def events_runs_test(sf_dir: str) -> pa.Table:
    """Runs test for randomness per ``event_type``: the dense hourly
    count series binarized against its own mean -- hour t is ABOVE
    iff ``x_t * T > total`` (exact integer cross-multiplication; ties
    count below) -- then the number of maximal same-side runs.  Few
    runs = trending/bursty, many = oscillating.  Returns
    ``(event_type, n_above, n_below, n_runs)``.

    Scale shape: the ar1/cusum series contract (per-block count
    partials -> dim-bounded groupby -> O(series) driver sweep)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hour": pa.array(hr[order][starts]),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n_obs"]
    out_schema = pa.schema(
        [("event_type", pa.string()), ("n_above", pa.int64()),
         ("n_below", pa.int64()), ("n_runs", pa.int64())]
    )
    if len(merged) == 0:
        return out_schema.empty_table()
    h_lo = int(merged["hour"].min())
    h_hi = int(merged["hour"].max())
    span = h_hi - h_lo + 1
    rows = []
    for et, grp in merged.groupby("event_type", sort=True):
        dense = np.zeros(span, np.int64)
        dense[grp["hour"].to_numpy(dtype=np.int64) - h_lo] = (
            grp["n_obs"].to_numpy(dtype=np.int64)
        )
        total = int(dense.sum())
        above = dense * span > total
        n_above = int(above.sum())
        runs = 1 + int((above[1:] != above[:-1]).sum())
        rows.append((et, n_above, span - n_above, runs))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n_above": pa.array([r[1] for r in rows], pa.int64()),
         "n_below": pa.array([r[2] for r in rows], pa.int64()),
         "n_runs": pa.array([r[3] for r in rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Autocorrelation at arbitrary lags (seasonality strength)
# ---------------------------------------------------------------------------
def events_hourly_acf(sf_dir: str, lags: tuple = (1, 24)) -> pa.Table:
    """Autocorrelation-function points of the dense hourly count
    series at the given ``lags`` -- lag 1 is persistence
    (``events_hourly_ar1``), lag 24 is DAILY seasonality strength.
    Same exact integer regression form per lag: ``phi = (m*Sxy -
    Sx*Sy) / (m*Sxx - Sx^2)`` over ``(x_t, x_{t+lag})`` pairs,
    emitted as ``floor(1e6 * phi)`` plus the sufficient sums.
    Returns ``(event_type, lag, m, sum_x, sum_xy, phi_e6)``.

    Scale shape: the ar1 series contract; ALL lags reuse ONE
    dim-bounded (type, hour) fold -- only the O(series) driver math
    runs per lag."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hour": pa.array(hr[order][starts]),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n_obs"]
    out_schema = pa.schema(
        [("event_type", pa.string()), ("lag", pa.int64()),
         ("m", pa.int64()), ("sum_x", pa.int64()),
         ("sum_xy", pa.int64()), ("phi_e6", pa.int64())]
    )
    if len(merged) == 0:
        return out_schema.empty_table()
    h_lo = int(merged["hour"].min())
    h_hi = int(merged["hour"].max())
    span = h_hi - h_lo + 1
    rows = []
    for et, grp in merged.groupby("event_type", sort=True):
        dense = [0] * span
        for h, c in zip(grp["hour"].to_numpy(dtype=np.int64),
                        grp["n_obs"].to_numpy(dtype=np.int64)):
            dense[int(h) - h_lo] = int(c)
        for lag in lags:
            if span <= lag:
                rows.append((et, lag, 0, 0, 0, 0))
                continue
            x = dense[:-lag]
            y = dense[lag:]
            m = len(x)
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sxx = sum(a * a for a in x)
            den = m * sxx - sx * sx
            phi = (m * sxy - sx * sy) * 10**6 // den if den else 0
            rows.append((et, lag, m, sx, sxy, phi))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "lag": pa.array([r[1] for r in rows], pa.int64()),
         "m": pa.array([r[2] for r in rows], pa.int64()),
         "sum_x": pa.array([r[3] for r in rows], pa.int64()),
         "sum_xy": pa.array([r[4] for r in rows], pa.int64()),
         "phi_e6": pa.array([r[5] for r in rows], pa.int64())},
        schema=out_schema,
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance (exact rational)
# ---------------------------------------------------------------------------
def events_ks_test(
    sf_dir: str, type_a: str = "purchase", type_b: str = "click"
) -> pa.Table:
    """Exact two-sample KS distance between the value distributions
    of two event types: ``D = max_v |F_a(v) - F_b(v)|``, carried as
    the integer ``ks_num = max |cum_a * n_b - cum_b * n_a|`` (so
    ``D = ks_num / (n_a * n_b)`` exactly) and emitted with
    ``ks_e6 = floor(1e6 * ks_num / (n_a * n_b))``.  Mann-Whitney's
    location-shift sibling -- KS sees SHAPE differences too.

    Scale shape: the same value-histogram plumbing as
    ``events_mann_whitney`` -- per-block (value -> count_a, count_b)
    partials, one value groupby, O(distinct values) driver cumsum
    walk."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    hist_schema = pa.schema(
        [("v", pa.int64()), ("na", pa.int64()), ("nb", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        is_a, is_b = et == type_a, et == type_b
        keep = is_a | is_b
        if not keep.any():
            return hist_schema.empty_table()
        v = cents[keep]
        side_a = is_a[keep]
        order = np.argsort(v, kind="stable")
        vs, sa = v[order], side_a[order]
        starts, _ = _segment_starts(vs)
        na = np.add.reduceat(sa.astype(np.int64), starts)
        tot = np.add.reduceat(np.ones(len(vs), np.int64), starts)
        return pa.table(
            {"v": pa.array(vs[starts]), "na": pa.array(na),
             "nb": pa.array(tot - na)},
            schema=hist_schema,
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v").sum(["na", "nb"]).to_pandas()
    )
    hist.columns = ["v", "na", "nb"]
    hist = hist.sort_values("v", ignore_index=True)
    na = hist["na"].to_numpy(dtype=np.int64)
    nb = hist["nb"].to_numpy(dtype=np.int64)
    n_a, n_b = int(na.sum()), int(nb.sum())
    cum_a = np.cumsum(na).astype(object)
    cum_b = np.cumsum(nb).astype(object)
    diffs = [abs(int(a) * n_b - int(b) * n_a)
             for a, b in zip(cum_a, cum_b)]
    ks_num = max(diffs) if diffs else 0
    ks_e6 = 10**6 * ks_num // (n_a * n_b) if n_a and n_b else 0
    return pa.table(
        {"n_a": pa.array([n_a], pa.int64()),
         "n_b": pa.array([n_b], pa.int64()),
         "ks_num": pa.array([ks_num], pa.int64()),
         "ks_e6": pa.array([ks_e6], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------
def events_benford(sf_dir: str) -> pa.Table:
    """First-significant-digit profile of event values (cents,
    zeros excluded, sign dropped) -- the Benford's-law fraud/quality
    screen's observed side.  Returns ``(digit, n, share_e6)`` for
    digits 1-9 (missing digits emit no row), share as exact
    ``floor(1e6 * n / total)``.

    Scale shape: per-block digit counts via pure integer decimation
    (divide by 10 until < 10 -- no string round trip, no float log),
    9-row partials -> tiny groupby."""
    ds = _read(sf_dir, "events", columns=["value"])

    part_schema = pa.schema([("digit", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        cents = np.abs(
            _cents(t.column("value").to_numpy(zero_copy_only=False))
        )
        cents = cents[cents > 0]
        if len(cents) == 0:
            return part_schema.empty_table()
        while cents.max() >= 10:
            big = cents >= 10
            cents[big] //= 10
        counts = np.bincount(cents, minlength=10)
        nz = np.flatnonzero(counts[1:]) + 1
        return pa.table(
            {"digit": pa.array(nz.astype(np.int64)),
             "n": pa.array(counts[nz].astype(np.int64))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit").sum("n").to_pandas()
    )
    agg.columns = ["digit", "n"]
    agg = agg.sort_values("digit", ignore_index=True)
    total = int(agg["n"].sum())
    n = agg["n"].to_numpy(dtype=np.int64)
    share = np.array([10**6 * int(c) // total for c in n], np.int64)
    return pa.table(
        {"digit": pa.array(agg["digit"].to_numpy(dtype=np.int64)),
         "n": pa.array(n), "share_e6": pa.array(share)}
    )


# ---------------------------------------------------------------------------
# ABC (Pareto-class) analysis of customer revenue
# ---------------------------------------------------------------------------
def customer_abc_classes(
    sf_dir: str, a_pct: int = 80, b_pct: int = 95
) -> pa.Table:
    """ABC inventory-style classification of customers by order
    revenue: class A = customers in the top revenue tiers that
    jointly cover < ``a_pct``% of total revenue BEFORE their tier,
    B up to ``b_pct``%, C the tail.  All customers sharing a revenue
    value share a class (tie-safe: the class test uses the revenue
    strictly ABOVE the tier, so it needs no within-tie order).
    Exact integer test: ``G(r) * 100 < pct * R`` with ``G(r)`` = sum
    of revenue strictly above ``r``.  Returns ``(abc_class,
    n_customers, revenue_cents)``.

    Scale shape: custkey exchange-free per-block partials ->
    customer ``groupby.sum`` (one all-to-all) -> per-block
    HISTOGRAM of (revenue value -> n customers, revenue mass) ->
    value groupby -> O(distinct revenue values) driver walk."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    part_schema = pa.schema([("ck", pa.int64()), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cents = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        order = np.argsort(ck, kind="stable")
        cks, cs = ck[order], cents[order]
        starts, _ = _segment_starts(cks)
        return pa.table(
            {"ck": pa.array(cks[starts]),
             "cents": pa.array(np.add.reduceat(cs, starts))},
            schema=part_schema,
        )

    hist_schema = pa.schema(
        [("rev", pa.int64()), ("n", pa.int64()), ("mass", pa.int64())]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        c = t.column("sum(cents)").to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        cs = c[order]
        starts, lens = _segment_starts(cs)
        return pa.table(
            {"rev": pa.array(cs[starts]),
             "n": pa.array(lens.astype(np.int64)),
             "mass": pa.array(cs[starts] * lens.astype(np.int64))},
            schema=hist_schema,
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ck").sum("cents")
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("rev").sum(["n", "mass"])
        .to_pandas()
    )
    hist.columns = ["rev", "n", "mass"]
    hist = hist.sort_values("rev", ascending=False, ignore_index=True)
    R = int(hist["mass"].sum())
    above = 0
    cls_n = {"A": 0, "B": 0, "C": 0}
    cls_rev = {"A": 0, "B": 0, "C": 0}
    for rev, n, mass in zip(hist["rev"], hist["n"], hist["mass"]):
        if above * 100 < a_pct * R:
            c = "A"
        elif above * 100 < b_pct * R:
            c = "B"
        else:
            c = "C"
        cls_n[c] += int(n)
        cls_rev[c] += int(mass)
        above += int(mass)
    keys = [k for k in ("A", "B", "C") if cls_n[k] > 0]
    return pa.table(
        {"abc_class": pa.array(keys, pa.string()),
         "n_customers": pa.array([cls_n[k] for k in keys], pa.int64()),
         "revenue_cents": pa.array([cls_rev[k] for k in keys], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Distribution drift: type-share shift between time halves
# ---------------------------------------------------------------------------
def events_share_drift(sf_dir: str) -> pa.Table:
    """Data-drift monitor: each event type's share of traffic in the
    FIRST half of the time range vs the SECOND (split at the
    microsecond midpoint ``(min_ts + max_ts) // 2``, first half
    inclusive of the boundary), and the signed drift.  All exact:
    shares as ``floor(1e6 * n / half_total)``, drift as their
    difference.  Returns ``(event_type, n_first, n_second,
    share_first_e6, share_second_e6, drift_e6)``.

    Scale shape: pass 1 folds per-block (min, max) scalars; pass 2
    counts per (type, half) -- dimension-sized groupby, O(types)
    driver math."""
    from ray.data import aggregate as _ray_agg

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    b_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    def bounds(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return b_schema.empty_table()
        ts = _ts_i64(t.column("ts"))
        return pa.table(
            {"lo": pa.array([int(ts.min())], pa.int64()),
             "hi": pa.array([int(ts.max())], pa.int64())},
            schema=b_schema,
        )

    bd = ds.map_batches(bounds, batch_format="pyarrow").to_pandas()
    cut = (int(bd["lo"].min()) + int(bd["hi"].max())) // 2

    part_schema = pa.schema(
        [("event_type", pa.string()), ("half", pa.int64()),
         ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        half = (_ts_i64(t.column("ts")) > cut).astype(np.int64)
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, half)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "half": pa.array(half[order][starts]),
             "n": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "half"]).sum("n").to_pandas()
    )
    agg.columns = ["event_type", "half", "n"]
    tot = {0: int(agg[agg["half"] == 0]["n"].sum()),
           1: int(agg[agg["half"] == 1]["n"].sum())}
    types = sorted(agg["event_type"].unique())
    per = {(r.event_type, r.half): int(r.n) for r in agg.itertuples()}
    rows = []
    for et in types:
        n1 = per.get((et, 0), 0)
        n2 = per.get((et, 1), 0)
        s1 = 10**6 * n1 // tot[0] if tot[0] else 0
        s2 = 10**6 * n2 // tot[1] if tot[1] else 0
        rows.append((et, n1, n2, s1, s2, s2 - s1))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n_first": pa.array([r[1] for r in rows], pa.int64()),
         "n_second": pa.array([r[2] for r in rows], pa.int64()),
         "share_first_e6": pa.array([r[3] for r in rows], pa.int64()),
         "share_second_e6": pa.array([r[4] for r in rows], pa.int64()),
         "drift_e6": pa.array([r[5] for r in rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# DAU/MAU stickiness per month
# ---------------------------------------------------------------------------
def events_stickiness(sf_dir: str) -> pa.Table:
    """Engagement stickiness per month: ``avg DAU / MAU`` computed
    exactly as ``floor(1e6 * sum_dau / (n_active_days * mau))`` --
    sum_dau = sum over the month's ACTIVE days of that day's
    distinct users, n_active_days = days with any event, mau =
    distinct users in the month.  Returns ``(month, n_active_days,
    sum_dau, mau, stickiness_e6)``.

    Scale shape: per-block DISTINCT (day, user) combiner -> ONE pair
    ``groupby`` (bounded by distinct day-user pairs) -> per-block
    partials for day-level and month-level distincts -- a (day,user)
    pair belongs to exactly one (month,user) pair, so the month
    distinct needs its own dedupe sweep, done inside the same
    exchange keyed by user."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("stick")
    DAY_US = np.int64(86_400 * _US)
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    pair_schema = pa.schema(
        [("user_id", pa.int64()), ("day", pa.int64()), ("_p", pa.int64())]
    )

    def distinct_du(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = _ts_i64(t.column("ts")) // DAY_US
        order = np.lexsort((day, u))
        us, ds_ = u[order], day[order]
        keep = np.concatenate(
            [[True], (us[1:] != us[:-1]) | (ds_[1:] != ds_[:-1])]
        )
        us, ds_ = us[keep], ds_[keep]
        return pa.table(
            {"user_id": pa.array(us), "day": pa.array(ds_),
             "_p": pa.array(partition_ids(pa.array(us), P))},
            schema=pair_schema,
        )

    part_schema = pa.schema(
        [("month", pa.int64()), ("kind", pa.int64()), ("key", pa.int64()),
         ("n", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        """kind 0 rows: (month, day) -> distinct users that day
        (partial); kind 1 rows: (month, 0) -> distinct users that
        month (exact per block: the exchange co-locates a user)."""
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "stk", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        keep = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (day[1:] != day[:-1])]
        )
        u, day = u[keep], day[keep]
        month = (day * DAY_US).astype("datetime64[us]").astype(
            "datetime64[M]").view(np.int64)
        # day-level partial: count users per (month, day)
        key1 = month * 100_000 + (day % 100_000)
        o1 = np.argsort(key1, kind="stable")
        k1 = key1[o1]
        s1, l1 = _segment_starts(k1)
        # month-level: distinct (user, month) -- exact per block
        o2 = np.lexsort((month, u))
        um, mm = u[o2], month[o2]
        keep2 = np.concatenate(
            [[True], (um[1:] != um[:-1]) | (mm[1:] != mm[:-1])]
        )
        mm = mm[keep2]
        o3 = np.argsort(mm, kind="stable")
        m3 = mm[o3]
        s3, l3 = _segment_starts(m3)
        return pa.table(
            {"month": pa.array(np.concatenate(
                [k1[s1] // 100_000, m3[s3]])),
             "kind": pa.array(np.concatenate(
                 [np.zeros(len(s1), np.int64),
                  np.ones(len(s3), np.int64)])),
             "key": pa.array(np.concatenate(
                 [k1[s1] % 100_000, np.zeros(len(s3), np.int64)])),
             "n": pa.array(np.concatenate(
                 [l1.astype(np.int64), l3.astype(np.int64)]))},
            schema=part_schema,
        )

    folded = (
        ds.map_batches(distinct_du, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["month", "kind", "key"]).sum("n").to_pandas()
    )
    folded.columns = ["month", "kind", "key", "n"]
    months = sorted(folded["month"].unique())
    rows = []
    for m in months:
        sub = folded[folded["month"] == m]
        days = sub[sub["kind"] == 0]
        mau = int(sub[sub["kind"] == 1]["n"].sum())
        n_days = len(days)
        sum_dau = int(days["n"].sum())
        stick = 10**6 * sum_dau // (n_days * mau) if n_days and mau else 0
        rows.append((int(m), n_days, sum_dau, mau, stick))
    out = pa.table(
        {"month": pa.array([r[0] for r in rows], pa.int64()),
         "n_active_days": pa.array([r[1] for r in rows], pa.int64()),
         "sum_dau": pa.array([r[2] for r in rows], pa.int64()),
         "mau": pa.array([r[3] for r in rows], pa.int64()),
         "stickiness_e6": pa.array([r[4] for r in rows], pa.int64())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Peak session concurrency (parallel prefix-max over boundaries)
# ---------------------------------------------------------------------------
def events_peak_concurrency(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Peak number of SIMULTANEOUSLY active sessions (sessions from
    ``events_sessionize``'s gap rule; a session is active on the
    closed interval [start, end]) -- capacity planning's headline
    number.  Exact tie handling: at an instant where one session
    ends and another starts, both are active (+1 events sort before
    -1 at the same timestamp).  Returns one row ``(n_sessions,
    peak_concurrency, peak_ts)`` (earliest instant achieving the
    peak).

    Scale shape: the sessionizer's exchange yields session rows;
    boundary (+1/-1) rows then sort by time ONCE, and the classic
    PARALLEL PREFIX trick finishes: each sorted block reports
    (total_delta, max_prefix, argmax_ts) and the driver folds P
    block summaries in order -- no single-machine scan of the
    boundary stream."""
    sess = events_sessionize(sf_dir, gap_minutes=gap_minutes)
    n_sessions = sess.num_rows
    out_schema = pa.schema(
        [("n_sessions", pa.int64()), ("peak_concurrency", pa.int64()),
         ("peak_ts", pa.timestamp("us"))]
    )
    if n_sessions == 0:
        return out_schema.empty_table()
    import ray.data as rd

    lo = sess.column("session_start").cast(pa.int64())
    hi = sess.column("session_end").cast(pa.int64())
    bounds = pa.table(
        {"t": pa.concat_arrays([lo.combine_chunks() if isinstance(lo, pa.ChunkedArray) else lo,
                                (hi.combine_chunks() if isinstance(hi, pa.ChunkedArray) else hi)]),
         "d": pa.array(
             np.concatenate([np.ones(n_sessions, np.int64),
                             -np.ones(n_sessions, np.int64)]))}
    )

    part_schema = pa.schema(
        [("total", pa.int64()), ("max_prefix", pa.int64()),
         ("argmax_t", pa.int64()), ("first_t", pa.int64())]
    )

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ts = t.column("t").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        cum = np.cumsum(d)
        mx = int(cum.max())
        arg = int(np.argmax(cum))
        return pa.table(
            {"total": pa.array([int(cum[-1])], pa.int64()),
             "max_prefix": pa.array([mx], pa.int64()),
             "argmax_t": pa.array([int(ts[arg])], pa.int64()),
             "first_t": pa.array([int(ts[0])], pa.int64())},
            schema=part_schema,
        )

    # sort by (t, -d) => +1 rows first at equal instants (d desc)
    parts = (
        rd.from_arrow(bounds)
        .map_batches(
            lambda t: t.append_column(
                "_negd",
                pa.array(-t.column("d").to_numpy(zero_copy_only=False))),
            batch_format="pyarrow",
        )
        .sort(["t", "_negd"])
        .map_batches(block_summary, batch_format="pyarrow")
        .to_pandas()
    )
    # fold block summaries IN SORT ORDER (to_pandas preserves block
    # order of the sorted dataset)
    parts = parts.sort_values("first_t", kind="stable",
                              ignore_index=True)
    running = 0
    best, best_t = -1, 0
    for r in parts.itertuples():
        cand = running + int(r.max_prefix)
        if cand > best:
            best, best_t = cand, int(r.argmax_t)
        running += int(r.total)
    return pa.table(
        {"n_sessions": pa.array([n_sessions], pa.int64()),
         "peak_concurrency": pa.array([best], pa.int64()),
         "peak_ts": pa.array([best_t], pa.int64()).cast(
             pa.timestamp("us"))},
        schema=out_schema,
    )


# ---------------------------------------------------------------------------
# Spike detection: hours above k x the trailing-24h mean
# ---------------------------------------------------------------------------
def events_spike_hours(sf_dir: str, k_x10: int = 30) -> pa.Table:
    """Rate-alerting screen per ``event_type``: hours whose count
    exceeds ``k_x10/10`` times the TRAILING-24h mean (the 24 hours
    strictly before, requiring a full window), compared exactly as
    ``x * 240 > k_x10 * sum_24`` (cross-multiplied, no float mean).
    Returns ``(event_type, n_spike_hours, first_spike_hour,
    max_streak)`` -- first = -1 when none; max_streak = longest
    consecutive spike run.

    Scale shape: the dense-hourly series contract (per-block count
    partials -> dim-bounded groupby -> O(series) driver sweep)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hour": pa.array(hr[order][starts]),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n_obs"]
    out_schema = pa.schema(
        [("event_type", pa.string()), ("n_spike_hours", pa.int64()),
         ("first_spike_hour", pa.int64()), ("max_streak", pa.int64())]
    )
    if len(merged) == 0:
        return out_schema.empty_table()
    h_lo = int(merged["hour"].min())
    h_hi = int(merged["hour"].max())
    span = h_hi - h_lo + 1
    rows = []
    for et, grp in merged.groupby("event_type", sort=True):
        dense = np.zeros(span, np.int64)
        dense[grp["hour"].to_numpy(dtype=np.int64) - h_lo] = (
            grp["n_obs"].to_numpy(dtype=np.int64)
        )
        if span <= 24:
            rows.append((et, 0, -1, 0))
            continue
        cs = np.concatenate([[0], np.cumsum(dense)])
        t = np.arange(24, span)
        s24 = cs[t] - cs[t - 24]
        spike = dense[t] * 240 > k_x10 * s24
        n = int(spike.sum())
        first = int(t[spike][0]) + h_lo if n else -1
        # longest consecutive run of True
        best = cur = 0
        for b in spike:
            cur = cur + 1 if b else 0
            best = max(best, cur)
        rows.append((et, n, first, best))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n_spike_hours": pa.array([r[1] for r in rows], pa.int64()),
         "first_spike_hour": pa.array([r[2] for r in rows], pa.int64()),
         "max_streak": pa.array([r[3] for r in rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (orphan detection)
# ---------------------------------------------------------------------------
def referential_integrity_audit(sf_dir: str) -> pa.Table:
    """Cross-table conformance audit: orphan counts for the two FK
    relations ``orders.o_custkey -> customer`` and
    ``lineitem.l_orderkey -> orders`` -- the data-quality gate every
    warehouse load runs.  Returns one row per relation:
    ``(relation, n_child_rows, n_orphan_rows)``.

    Scale shape: per relation ONE key-hash exchange of per-block
    child partials (key -> row count) against per-block-distinct
    parent keys; the per-block segment sweep sums counts lacking a
    parent row -- scalars leave the block, never keys."""
    out_rows = []
    for relation, child, ckey, parent, pkey in (
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
    ):
        n_child, _ = _table_meta(sf_dir, child)
        n_parent, _ = _table_meta(sf_dir, parent)
        P = _exchange_width(n_child + n_parent)
        gd = _new_guard_dir(f"ri_{child}")

        e = pa.schema(
            [("_key", pa.int64()), ("_side", pa.int8()),
             ("_n", pa.int64()), ("_p", pa.int64())]
        )

        def child_rows(t: pa.Table, _ck=ckey, _P=P) -> pa.Table:
            if t.num_rows == 0:
                return e.empty_table()
            k = t.column(_ck).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            order = np.argsort(k, kind="stable")
            ks = k[order]
            starts, lens = _segment_starts(ks)
            keys = ks[starts]
            return pa.table(
                {"_key": pa.array(keys),
                 "_side": pa.array(np.ones(len(keys), np.int8)),
                 "_n": pa.array(lens.astype(np.int64)),
                 "_p": pa.array(partition_ids(pa.array(keys), _P))},
                schema=e,
            )

        def parent_rows(t: pa.Table, _pk=pkey, _P=P) -> pa.Table:
            if t.num_rows == 0:
                return e.empty_table()
            k = np.unique(
                t.column(_pk).to_numpy(zero_copy_only=False).astype(
                    np.int64)
            )
            return pa.table(
                {"_key": pa.array(k),
                 "_side": pa.array(np.zeros(len(k), np.int8)),
                 "_n": pa.array(np.zeros(len(k), np.int64)),
                 "_p": pa.array(partition_ids(pa.array(k), _P))},
                schema=e,
            )

        stat = pa.schema([("rows", pa.int64()), ("orphans", pa.int64())])

        def sweep(t: pa.Table, _gd=gd) -> pa.Table:
            if t.num_rows == 0:
                return stat.empty_table()
            _guard_record(
                _gd, "ri", t.column("_p").to_numpy(zero_copy_only=False)
            )
            k = t.column("_key").to_numpy(zero_copy_only=False)
            side = t.column("_side").to_numpy(zero_copy_only=False)
            n = t.column("_n").to_numpy(zero_copy_only=False)
            order = np.lexsort((side, k))
            k, side, n = k[order], side[order], n[order]
            starts, _ = _segment_starts(k)
            seg_id = np.cumsum(
                np.concatenate([[0], (k[1:] != k[:-1]).astype(np.int64)])
            )
            has_parent = side[starts] == 0
            orphan_rows = n[(side == 1) & (~has_parent[seg_id])]
            return pa.table(
                {"rows": pa.array([int(n[side == 1].sum())], pa.int64()),
                 "orphans": pa.array(
                     [int(orphan_rows.sum())], pa.int64())},
                schema=stat,
            )

        cols_child = [ckey]
        cols_parent = [pkey]
        stats = (
            _read(sf_dir, child, columns=cols_child)
            .map_batches(child_rows, batch_format="pyarrow")
            .union(
                _read(sf_dir, parent, columns=cols_parent)
                .map_batches(parent_rows, batch_format="pyarrow")
            )
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(sweep, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        out_rows.append(
            (relation, int(stats["rows"].sum()),
             int(stats["orphans"].sum()))
        )
        _finalize_guard(gd, pa.table({"x": pa.array([1])}))
    return pa.table(
        {"relation": pa.array([r[0] for r in out_rows], pa.string()),
         "n_child_rows": pa.array([r[1] for r in out_rows], pa.int64()),
         "n_orphan_rows": pa.array([r[2] for r in out_rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Order-size histogram (items per order)
# ---------------------------------------------------------------------------
def orders_size_histogram(sf_dir: str) -> pa.Table:
    """Distribution of order sizes: line items per order, as
    ``(n_items, n_orders)`` ordered by size -- the fulfillment-mix
    report, and the two-level derived-aggregate shape again
    (count per key, then histogram of the derived counts).  Orders
    with zero line items are counted at size 0 (LEFT-join
    semantics).

    Scale shape: per-block per-key count partials (lineitem) union
    zero-count order-key rows -> ONE orderkey hash exchange whose
    block sweep folds each key's global item count AND emits
    histogram partials -> tiny final fold; zero-size orders ride the
    kind tag through the same exchange."""
    part_schema = pa.schema(
        [("k", pa.int64()), ("c", pa.int64()), ("is_order", pa.int64())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(k, kind="stable")
        ks = k[order]
        starts, lens = _segment_starts(ks)
        return pa.table(
            {"k": pa.array(ks[starts]),
             "c": pa.array(lens.astype(np.int64)),
             "is_order": pa.array(np.zeros(len(starts), np.int64))},
            schema=part_schema,
        )

    def o_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {"k": pa.array(k),
             "c": pa.array(np.zeros(len(k), np.int64)),
             "is_order": pa.array(np.ones(len(k), np.int64))},
            schema=part_schema,
        )

    hist_schema = pa.schema(
        [("n_items", pa.int64()), ("n_orders", pa.int64())]
    )

    n_li, _ = _table_meta(sf_dir, "lineitem")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_li + n_or)
    gd = _new_guard_dir("sizehist")

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("k"), P))
        )

    def key_sweep(t: pa.Table) -> pa.Table:
        """One exchange replaces the key groupby: each order key's
        partials co-locate, fold to its global item count, and the
        block emits histogram partials directly (the backlog/fd_check
        one-exchange rewrite; the two-groupby first version ran
        6.4 s at sf0.1, this shape ~2 s)."""
        if t.num_rows == 0:
            return hist_schema.empty_table()
        _guard_record(
            gd, "szh", t.column("_p").to_numpy(zero_copy_only=False)
        )
        k = t.column("k").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        is_o = t.column("is_order").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, cs, os_ = k[order], c[order], is_o[order]
        starts, _ = _segment_starts(ks)
        tot = np.add.reduceat(cs, starts)
        has_o = np.add.reduceat(os_, starts) > 0
        tot = tot[has_o]
        if len(tot) == 0:
            return hist_schema.empty_table()
        o2 = np.argsort(tot, kind="stable")
        ts_ = tot[o2]
        s2, lens = _segment_starts(ts_)
        return pa.table(
            {"n_items": pa.array(ts_[s2]),
             "n_orders": pa.array(lens.astype(np.int64))},
            schema=hist_schema,
        )

    agg = (
        _read(sf_dir, "lineitem", columns=["l_orderkey"])
        .map_batches(li_partial, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", columns=["o_orderkey"])
            .map_batches(o_partial, batch_format="pyarrow")
        )
        .map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(key_sweep, batch_format="pyarrow", batch_size=None)
        .groupby("n_items").sum("n_orders")
        .to_pandas()
    )
    agg.columns = ["n_items", "n_orders"]
    agg = agg.sort_values("n_items", ignore_index=True)
    out = pa.table(
        {"n_items": pa.array(agg["n_items"].to_numpy(dtype=np.int64)),
         "n_orders": pa.array(agg["n_orders"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Conversion latency: first event -> first purchase, per user
# ---------------------------------------------------------------------------
def events_conversion_latency(
    sf_dir: str, conv_type: str = "purchase"
) -> pa.Table:
    """Cold-start conversion report: per user, whole days from their
    FIRST event to their FIRST ``conv_type`` event (users whose
    first event IS the conversion land in day 0), histogrammed as
    ``(latency_days, n_users)`` with a trailing ``(-1, n)`` row for
    users who never convert.  The funnel's time-dimension sibling.

    Scale shape: per-block per-user (min ts, min conv-ts) partials
    -> ONE user ``groupby`` min-fold -> per-block histogram of the
    derived day diff -> tiny fold.  A sentinel max-int conv-ts makes
    "never converted" fold correctly through min()."""
    from ray.data import aggregate as _ray_agg

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    DAY_US = np.int64(86_400 * _US)
    SENT = np.int64(1 << 62)

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("first_ts", pa.int64()),
         ("first_conv", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        conv_ts = np.where(et == conv_type, ts, SENT)
        order = np.argsort(u, kind="stable")
        us, tss, cvs = u[order], ts[order], conv_ts[order]
        starts, _ = _segment_starts(us)
        return pa.table(
            {"user_id": pa.array(us[starts]),
             "first_ts": pa.array(np.minimum.reduceat(tss, starts)),
             "first_conv": pa.array(np.minimum.reduceat(cvs, starts))},
            schema=part_schema,
        )

    hist_schema = pa.schema(
        [("latency_days", pa.int64()), ("n_users", pa.int64())]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        ft = t.column("min(first_ts)").to_numpy(zero_copy_only=False)
        fc = t.column("min(first_conv)").to_numpy(zero_copy_only=False)
        days = np.where(fc >= SENT, np.int64(-1), (fc - ft) // DAY_US)
        order = np.argsort(days, kind="stable")
        d = days[order]
        starts, lens = _segment_starts(d)
        return pa.table(
            {"latency_days": pa.array(d[starts]),
             "n_users": pa.array(lens.astype(np.int64))},
            schema=hist_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_ray_agg.Min("first_ts"), _ray_agg.Min("first_conv"))
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("latency_days").sum("n_users")
        .to_pandas()
    )
    agg.columns = ["latency_days", "n_users"]
    agg = agg.sort_values("latency_days", ignore_index=True)
    return pa.table(
        {"latency_days": pa.array(
            agg["latency_days"].to_numpy(dtype=np.int64)),
         "n_users": pa.array(agg["n_users"].to_numpy(dtype=np.int64))}
    )


# ---------------------------------------------------------------------------
# Diversified top-k: global top orders, capped per customer
# ---------------------------------------------------------------------------
def orders_diversified_topk(
    sf_dir: str, k: int = 10, per_cust: int = 2
) -> pa.Table:
    """Result diversification: the global top-``k`` orders by
    ``(totalprice desc, orderkey)`` keeping AT MOST ``per_cust`` per
    customer (the retrieval-dedup rule that stops one whale from
    filling the page).  Returns ``(o_orderkey, o_custkey,
    totalprice_cents)``.

    Distributed shape + exactness: each block applies the cap to its
    OWN rows and keeps its local CAPPED top-``k*(per_cust+1)``; the
    driver merge re-applies rank-then-cap over the P candidate sets.
    Why the inflated local keep: a globally-chosen row r can sit
    below local rank k when better local SURVIVORS are later capped
    out globally (their customer's even-better rows live in other
    blocks) -- but the local cap already limits survivors to
    ``per_cust`` per customer and at most k customers can be
    globally exhausted, so at most ``k*per_cust`` better-than-r
    local rows can be globally discarded; local keep
    ``k*(per_cust+1)`` therefore always contains every global
    winner.  No exchange at all."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("totalprice_cents", pa.int64())]
    )

    def capped_topk(keys, custs, cents, limit):
        order = np.lexsort((keys, -cents))
        seen: dict[int, int] = {}
        pick = []
        for i in order:
            c = int(custs[i])
            if seen.get(c, 0) >= per_cust:
                continue
            seen[c] = seen.get(c, 0) + 1
            pick.append(i)
            if len(pick) == limit:
                break
        idx = np.asarray(pick, np.int64)
        return keys[idx], custs[idx], cents[idx]

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        custs = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cents = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        a, b, c = capped_topk(keys, custs, cents, k * (per_cust + 1))
        return pa.table(
            {"o_orderkey": pa.array(a), "o_custkey": pa.array(b),
             "totalprice_cents": pa.array(c)},
            schema=out_schema,
        )

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    if len(cand) == 0:
        return out_schema.empty_table()
    a, b, c = capped_topk(
        cand["o_orderkey"].to_numpy(dtype=np.int64),
        cand["o_custkey"].to_numpy(dtype=np.int64),
        cand["totalprice_cents"].to_numpy(dtype=np.int64),
        k,
    )
    return pa.table(
        {"o_orderkey": pa.array(a), "o_custkey": pa.array(b),
         "totalprice_cents": pa.array(c)},
        schema=out_schema,
    )


# ---------------------------------------------------------------------------
# Customer LTV cohort triangle (revenue by cohort x order year)
# ---------------------------------------------------------------------------
def customer_ltv_triangle(sf_dir: str) -> pa.Table:
    """Lifetime-value cohort triangle: customers cohorted by their
    FIRST order year; each (cohort_year, order_year) cell reports
    that cohort's revenue in that year and how many of its customers
    ordered -- the retention-revenue matrix every growth team reads.
    Returns ``(cohort_year, order_year, revenue_cents,
    n_active_customers)`` ordered by the pair.

    Scale shape: ONE custkey hash exchange (orders only -- the
    cohort IS derived from the same rows, no dimension needed); the
    per-block segment sweep takes each customer's min year as the
    cohort and folds (cohort, year) cells + distinct-customer
    counts; a dimension-sized ``groupby.sum`` finishes (years x
    years cells)."""
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_or)
    gd = _new_guard_dir("ltv")
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("o_custkey"), P))
        )

    part_schema = pa.schema(
        [("cohort_year", pa.int64()), ("order_year", pa.int64()),
         ("cents", pa.int64()), ("n_cust", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "ltv", t.column("_p").to_numpy(zero_copy_only=False)
        )
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        od = _ts_i64(t.column("o_orderdate"))
        yr = (od.astype("datetime64[us]").astype("datetime64[Y]")
              .view(np.int64) + 1970)
        cents = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        order = np.lexsort((yr, ck))
        ck, yr, cents = ck[order], yr[order], cents[order]
        starts, lens = _segment_starts(ck)
        seg_id = np.cumsum(
            np.concatenate([[0], (ck[1:] != ck[:-1]).astype(np.int64)])
        )
        cohort = yr[starts][seg_id]  # first (= min, sorted) year
        key = cohort * 10_000 + yr
        # revenue per (cohort, year)
        o2 = np.argsort(key, kind="stable")
        k2, c2 = key[o2], cents[o2]
        s2, _ = _segment_starts(k2)
        # distinct customers per (cohort, year): first row of each
        # (cust, year) run
        first_cy = np.concatenate(
            [[True], (ck[1:] != ck[:-1]) | (yr[1:] != yr[:-1])]
        )
        kc = key[first_cy]
        o3 = np.argsort(kc, kind="stable")
        k3 = kc[o3]
        s3, l3 = _segment_starts(k3)
        # merge the two partials into one table keyed identically
        all_k = np.concatenate([k2[s2], k3[s3]])
        all_cents = np.concatenate(
            [np.add.reduceat(c2, s2), np.zeros(len(s3), np.int64)]
        )
        all_n = np.concatenate(
            [np.zeros(len(s2), np.int64), l3.astype(np.int64)]
        )
        return pa.table(
            {"cohort_year": pa.array(all_k // 10_000),
             "order_year": pa.array(all_k % 10_000),
             "cents": pa.array(all_cents),
             "n_cust": pa.array(all_n)},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["cohort_year", "order_year"])
        .sum(["cents", "n_cust"])
        .to_pandas()
    )
    agg.columns = ["cohort_year", "order_year", "cents", "n_cust"]
    agg = agg.sort_values(["cohort_year", "order_year"],
                          ignore_index=True)
    out = pa.table(
        {"cohort_year": pa.array(
            agg["cohort_year"].to_numpy(dtype=np.int64)),
         "order_year": pa.array(
             agg["order_year"].to_numpy(dtype=np.int64)),
         "revenue_cents": pa.array(agg["cents"].to_numpy(dtype=np.int64)),
         "n_active_customers": pa.array(
             agg["n_cust"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Total-variation distance between two types' value distributions
# ---------------------------------------------------------------------------
def events_tv_distance(
    sf_dir: str, type_a: str = "purchase", type_b: str = "click"
) -> pa.Table:
    """Exact total-variation distance between the value-cents
    distributions of two event types: ``TV = (1/2) * sum_v |p_a(v) -
    p_b(v)|``, carried as the integer ``tv_num = sum_v |na*Nb -
    nb*Na|`` so ``TV = tv_num / (2*Na*Nb)`` exactly; emitted with
    ``tv_e6``.  KS measures the worst CDF gap; TV sums every
    pointwise mass gap -- together they bracket distribution shift.

    Scale shape: the Mann-Whitney/KS value-histogram plumbing --
    per-block (value -> count_a, count_b) partials, one value
    groupby, O(distinct values) driver fold in exact ints."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    hist_schema = pa.schema(
        [("v", pa.int64()), ("na", pa.int64()), ("nb", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        is_a, is_b = et == type_a, et == type_b
        keep = is_a | is_b
        if not keep.any():
            return hist_schema.empty_table()
        v = cents[keep]
        side_a = is_a[keep]
        order = np.argsort(v, kind="stable")
        vs, sa = v[order], side_a[order]
        starts, _ = _segment_starts(vs)
        na = np.add.reduceat(sa.astype(np.int64), starts)
        tot = np.add.reduceat(np.ones(len(vs), np.int64), starts)
        return pa.table(
            {"v": pa.array(vs[starts]), "na": pa.array(na),
             "nb": pa.array(tot - na)},
            schema=hist_schema,
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v").sum(["na", "nb"]).to_pandas()
    )
    hist.columns = ["v", "na", "nb"]
    na = hist["na"].to_numpy(dtype=np.int64)
    nb = hist["nb"].to_numpy(dtype=np.int64)
    n_a, n_b = int(na.sum()), int(nb.sum())
    tv_num = sum(abs(int(a) * n_b - int(b) * n_a)
                 for a, b in zip(na, nb))
    tv_e6 = 10**6 * tv_num // (2 * n_a * n_b) if n_a and n_b else 0
    return pa.table(
        {"n_a": pa.array([n_a], pa.int64()),
         "n_b": pa.array([n_b], pa.int64()),
         "tv_num": pa.array([tv_num], pa.int64()),
         "tv_e6": pa.array([tv_e6], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Week heatmap: day-of-week x hour-of-day traffic matrix
# ---------------------------------------------------------------------------
def events_week_heatmap(sf_dir: str) -> pa.Table:
    """The weekly traffic heatmap: global event counts per
    (day-of-week, hour-of-day) cell with each cell's exact share of
    total -- pure integer calendar math (``dow = (epoch_day + 4) %
    7``, 0 = Sunday; no locale-dependent calendar function on either
    side).  Returns ``(dow, hour_of_day, n_events, share_e6)`` for
    observed cells.

    Scale shape: per-block 7x24-bounded count partials -> tiny
    groupby -> O(168) driver shares."""
    ds = _read(sf_dir, "events", columns=["ts"])

    part_schema = pa.schema(
        [("dow", pa.int64()), ("hod", pa.int64()), ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ts = _ts_i64(t.column("ts"))
        day = ts // np.int64(86_400 * _US)
        dow = (day + 4) % 7
        hod = (ts // 3_600_000_000) % 24
        key = dow * 24 + hod
        counts = np.bincount(key, minlength=168)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"dow": pa.array((nz // 24).astype(np.int64)),
             "hod": pa.array((nz % 24).astype(np.int64)),
             "n": pa.array(counts[nz].astype(np.int64))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "hod"]).sum("n").to_pandas()
    )
    agg.columns = ["dow", "hod", "n"]
    agg = agg.sort_values(["dow", "hod"], ignore_index=True)
    total = int(agg["n"].sum())
    n = agg["n"].to_numpy(dtype=np.int64)
    share = np.array([10**6 * int(c) // total for c in n], np.int64)
    return pa.table(
        {"dow": pa.array(agg["dow"].to_numpy(dtype=np.int64)),
         "hour_of_day": pa.array(agg["hod"].to_numpy(dtype=np.int64)),
         "n_events": pa.array(n),
         "share_e6": pa.array(share)}
    )


# ---------------------------------------------------------------------------
# Weighted Jaccard between type audience-count vectors
# ---------------------------------------------------------------------------
def events_type_wjaccard(sf_dir: str) -> pa.Table:
    """Weighted (multiset) Jaccard between every pair of event
    types' per-user count vectors: ``sum_u min(a_u, b_u) / sum_u
    max(a_u, b_u)``, with ``sum max = T_a + T_b - sum min`` (users
    holding one side only contribute whole counts to max) -- the
    third similarity beside the set Jaccard and the squared cosine,
    sensitive to VOLUME overlap.  Exact ``wjaccard_e6``.  Returns
    ``(type_a, type_b, sum_min, total_a, total_b, wjaccard_e6)``.

    Scale shape: the ``events_type_cosine2`` exchange (per-user
    count partials -> user co-location -> per-user pair sweep),
    emitting ``min(a, b)`` per co-user pair; totals fold from the
    same sweep's self rows."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("twjac")
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    pair_schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()),
         ("c", pa.int64()), ("_p", pa.int64())]
    )

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.asarray([f"{uu}\x00{e}" for uu, e in zip(u, et)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        uu = u[order][starts]
        return pa.table(
            {"user_id": pa.array(uu),
             "event_type": pa.array(list(et[order][starts]), pa.string()),
             "c": pa.array(counts.astype(np.int64)),
             "_p": pa.array(partition_ids(pa.array(uu), P))},
            schema=pair_schema,
        )

    dot_schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()),
         ("v", pa.int64())]
    )

    def min_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return dot_schema.empty_table()
        _guard_record(
            gd, "twj", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((et, u))
        u, et, c = u[order], et[order], c[order]
        same = np.concatenate(
            [[False], (u[1:] == u[:-1]) & (et[1:] == et[:-1])]
        )
        starts0 = np.flatnonzero(~same)
        u, et = u[starts0], et[starts0]
        c = np.add.reduceat(c, starts0)
        starts, lens = _segment_starts(u)
        ta, tb, vals = [], [], []
        for s, m in zip(starts, lens):
            seg_t = et[s:s + m]
            seg_c = c[s:s + m]
            for i in range(m):
                ta.append(seg_t[i])
                tb.append(seg_t[i])   # self row carries the total
                vals.append(int(seg_c[i]))
                for j in range(i + 1, m):
                    ta.append(seg_t[i])
                    tb.append(seg_t[j])
                    vals.append(min(int(seg_c[i]), int(seg_c[j])))
        key = np.asarray([f"{a}\x00{b}" for a, b in zip(ta, tb)],
                         dtype=object)
        order2, starts2, _ = _group_segments(key)
        a_arr = np.asarray(ta, dtype=object)
        b_arr = np.asarray(tb, dtype=object)
        v_arr = np.asarray(vals, dtype=np.int64)
        return pa.table(
            {"type_a": pa.array(list(a_arr[order2][starts2]), pa.string()),
             "type_b": pa.array(list(b_arr[order2][starts2]), pa.string()),
             "v": pa.array(np.add.reduceat(v_arr[order2], starts2))},
            schema=dot_schema,
        )

    folded = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(min_sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["type_a", "type_b"])
        .sum("v")
        .to_pandas()
    )
    folded.columns = ["type_a", "type_b", "v"]
    totals = {r.type_a: int(r.v) for r in folded.itertuples()
              if r.type_a == r.type_b}
    pairs = folded[folded["type_a"] != folded["type_b"]].sort_values(
        ["type_a", "type_b"], ignore_index=True)
    sm = pairs["v"].to_numpy(dtype=np.int64)
    ta_ = [totals[a] for a in pairs["type_a"]]
    tb_ = [totals[b] for b in pairs["type_b"]]
    wj = [10**6 * int(m) // (a + b - int(m))
          for m, a, b in zip(sm, ta_, tb_)]
    out = pa.table(
        {"type_a": pa.array(pairs["type_a"], pa.string()),
         "type_b": pa.array(pairs["type_b"], pa.string()),
         "sum_min": pa.array(sm),
         "total_a": pa.array(ta_, pa.int64()),
         "total_b": pa.array(tb_, pa.int64()),
         "wjaccard_e6": pa.array(wj, pa.int64())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# 2x2 behavioral association: odds ratio
# ---------------------------------------------------------------------------
def events_odds_ratio(
    sf_dir: str, type_a: str = "purchase", type_b: str = "error"
) -> pa.Table:
    """Behavioral 2x2 association screen: does doing ``type_a``
    associate with doing ``type_b``?  Users cross-tabulate into
    (both, a-only, b-only, neither) and the odds ratio ``(n11*n00) /
    (n10*n01)`` is emitted as exact ``floor(1e6 * ratio)`` (-1 when
    the denominator is 0 -- a degenerate table).  Returns one row
    ``(n_both, n_a_only, n_b_only, n_neither, odds_ratio_e6)``.

    Scale shape: per-block per-user has-a/has-b OR-mask partials ->
    ONE user ``groupby.max`` fold -> per-block 4-cell counts ->
    driver scalar math."""
    from ray.data import aggregate as _ray_agg

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("ha", pa.int64()), ("hb", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        ha = (et == type_a).astype(np.int64)
        hb = (et == type_b).astype(np.int64)
        order = np.argsort(u, kind="stable")
        us = u[order]
        starts, _ = _segment_starts(us)
        return pa.table(
            {"user_id": pa.array(us[starts]),
             "ha": pa.array(np.maximum.reduceat(ha[order], starts)),
             "hb": pa.array(np.maximum.reduceat(hb[order], starts))},
            schema=part_schema,
        )

    cell_schema = pa.schema(
        [("n11", pa.int64()), ("n10", pa.int64()), ("n01", pa.int64()),
         ("n00", pa.int64())]
    )

    def cells(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cell_schema.empty_table()
        ha = t.column("max(ha)").to_numpy(zero_copy_only=False)
        hb = t.column("max(hb)").to_numpy(zero_copy_only=False)
        return pa.table(
            {"n11": pa.array([int(((ha == 1) & (hb == 1)).sum())],
                             pa.int64()),
             "n10": pa.array([int(((ha == 1) & (hb == 0)).sum())],
                             pa.int64()),
             "n01": pa.array([int(((ha == 0) & (hb == 1)).sum())],
                             pa.int64()),
             "n00": pa.array([int(((ha == 0) & (hb == 0)).sum())],
                             pa.int64())},
            schema=cell_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_ray_agg.Max("ha"), _ray_agg.Max("hb"))
        .map_batches(cells, batch_format="pyarrow")
        .to_pandas()
    )
    n11 = int(agg["n11"].sum())
    n10 = int(agg["n10"].sum())
    n01 = int(agg["n01"].sum())
    n00 = int(agg["n00"].sum())
    den = n10 * n01
    orr = 10**6 * n11 * n00 // den if den else -1
    return pa.table(
        {"n_both": pa.array([n11], pa.int64()),
         "n_a_only": pa.array([n10], pa.int64()),
         "n_b_only": pa.array([n01], pa.int64()),
         "n_neither": pa.array([n00], pa.int64()),
         "odds_ratio_e6": pa.array([orr], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Monthly churn: active in m, absent in m+1
# ---------------------------------------------------------------------------
def events_churn_rate(sf_dir: str) -> pa.Table:
    """Week-over-week churn: of the users active in epoch-week ``w``
    (``epoch_day // 7``), how many are ABSENT in ``w+1`` --
    ``churn_e6 = floor(1e6 * n_churned / n_active)``.  The final
    observed week emits no row (its churn is not yet knowable).
    Returns ``(week, n_active, n_churned, churn_e6)``.

    Scale shape: per-block DISTINCT (user, week) combiner -> ONE
    user hash exchange; each user's week set co-locates, the sweep
    marks per (user, week) whether week+1 is present, and folds
    per-week (active, churned) partials -> tiny final groupby.  The
    global last week broadcasts from a cheap scalar pass."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("churn")
    DAY_US = np.int64(86_400 * _US)
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def month_arr(ts: np.ndarray) -> np.ndarray:
        return (ts // DAY_US) // 7  # epoch weeks

    # global last observed month (scalar pass)
    b_schema = pa.schema([("hi", pa.int64())])

    def hi_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return b_schema.empty_table()
        m = month_arr(_ts_i64(t.column("ts")))
        return pa.table({"hi": pa.array([int(m.max())], pa.int64())},
                        schema=b_schema)

    last_month = int(
        ds.map_batches(hi_partial, batch_format="pyarrow")
        .to_pandas()["hi"].max()
    )

    pair_schema = pa.schema(
        [("user_id", pa.int64()), ("month", pa.int64()),
         ("_p", pa.int64())]
    )

    def distinct_um(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        m = month_arr(_ts_i64(t.column("ts")))
        order = np.lexsort((m, u))
        us, ms = u[order], m[order]
        keep = np.concatenate(
            [[True], (us[1:] != us[:-1]) | (ms[1:] != ms[:-1])]
        )
        us, ms = us[keep], ms[keep]
        return pa.table(
            {"user_id": pa.array(us), "month": pa.array(ms),
             "_p": pa.array(partition_ids(pa.array(us), P))},
            schema=pair_schema,
        )

    part_schema = pa.schema(
        [("month", pa.int64()), ("n_active", pa.int64()),
         ("n_churned", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "chn", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        m = t.column("month").to_numpy(zero_copy_only=False)
        order = np.lexsort((m, u))
        u, m = u[order], m[order]
        keep = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (m[1:] != m[:-1])]
        )
        u, m = u[keep], m[keep]
        # next-month presence: same user and month+1 immediately next
        # in the sorted-dedup order
        nxt = np.concatenate(
            [(u[1:] == u[:-1]) & (m[1:] == m[:-1] + 1), [False]]
        )
        live = m < last_month  # last month emits no churn row
        m2 = m[live]
        churn = (~nxt[live]).astype(np.int64)
        order2 = np.argsort(m2, kind="stable")
        ms = m2[order2]
        starts, lens = _segment_starts(ms)
        return pa.table(
            {"month": pa.array(ms[starts]),
             "n_active": pa.array(lens.astype(np.int64)),
             "n_churned": pa.array(
                 np.add.reduceat(churn[order2], starts))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(distinct_um, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("month").sum(["n_active", "n_churned"])
        .to_pandas()
    )
    if len(agg) == 0:
        return pa.table(
            {"week": pa.array([], pa.int64()),
             "n_active": pa.array([], pa.int64()),
             "n_churned": pa.array([], pa.int64()),
             "churn_e6": pa.array([], pa.int64())}
        )
    agg.columns = ["month", "n_active", "n_churned"]
    agg = agg.sort_values("month", ignore_index=True)
    na = agg["n_active"].to_numpy(dtype=np.int64)
    nc = agg["n_churned"].to_numpy(dtype=np.int64)
    ce = np.array([10**6 * int(c) // int(a) for a, c in zip(na, nc)],
                  np.int64)
    out = pa.table(
        {"week": pa.array(agg["month"].to_numpy(dtype=np.int64)),
         "n_active": pa.array(na),
         "n_churned": pa.array(nc),
         "churn_e6": pa.array(ce)}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Winsorized mean per type (robust central tendency)
# ---------------------------------------------------------------------------
def events_winsorized_mean(
    sf_dir: str, lo_pct: int = 5, hi_pct: int = 95
) -> pa.Table:
    """Winsorized mean of value-cents per ``event_type``: values
    clamp to the exact lower-quantile cut points at ``lo_pct`` /
    ``hi_pct`` (rank ``ceil(q * n)``, the repo's order-statistic
    convention) before averaging -- the robust mean that survives
    fat tails without dropping rows.  All integer-exact: ``wmean_e6
    = floor(1e6 * winsorized_sum / n)``.  Returns ``(event_type, n,
    p_lo, p_hi, wmean_e6)``.

    Scale shape: per-block (type, value) histogram partials -> one
    pair groupby (bounded by type x distinct values) -> per-type
    driver walk over the tiny histogram (cut points from cumulative
    counts, clamped sum from the same pass)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    hist_schema = pa.schema(
        [("event_type", pa.string()), ("v", pa.int64()), ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        key = np.asarray([f"{e}\x00{c}" for e, c in zip(et, cents)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "v": pa.array(cents[order][starts]),
             "n": pa.array(counts.astype(np.int64))},
            schema=hist_schema,
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "v"]).sum("n").to_pandas()
    )
    hist.columns = ["event_type", "v", "n"]
    rows = []
    for et, grp in hist.groupby("event_type", sort=True):
        grp = grp.sort_values("v", ignore_index=True)
        vals = grp["v"].to_numpy(dtype=np.int64)
        cnts = grp["n"].to_numpy(dtype=np.int64)
        n = int(cnts.sum())
        cum = np.cumsum(cnts)
        r_lo = -(-n * lo_pct // 100)
        r_hi = -(-n * hi_pct // 100)
        p_lo = int(vals[np.searchsorted(cum, r_lo, side="left")])
        p_hi = int(vals[np.searchsorted(cum, r_hi, side="left")])
        clamped = np.clip(vals, p_lo, p_hi)
        wsum = int((clamped.astype(object) * cnts.astype(object)).sum())
        # sign-safe truncating division (negative sums possible)
        s = -1 if wsum < 0 else 1
        rows.append((et, n, p_lo, p_hi, s * (10**6 * abs(wsum) // n)))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "n": pa.array([r[1] for r in rows], pa.int64()),
         "p_lo": pa.array([r[2] for r in rows], pa.int64()),
         "p_hi": pa.array([r[3] for r in rows], pa.int64()),
         "wmean_e6": pa.array([r[4] for r in rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Supplier breadth per part type (distinct-pair rollup via dim map)
# ---------------------------------------------------------------------------
def part_supplier_breadth(sf_dir: str) -> pa.Table:
    """Supply-chain breadth: per part type, how many DISTINCT
    suppliers ship it, how many distinct parts move, and total
    shipped quantity (exact cents) -- the assortment-coverage rollup
    over the lineitem fact with the ``part`` dimension resolved by a
    broadcast partkey->type map (the Q14/Q7 dim pattern).  Returns
    ``(p_type, n_suppliers, n_parts, sum_qty_cents)``.

    Scale shape: part dim read DRIVER-SIDE (a broadcast input, not a
    Dataset -- the Dataset plan+execute overhead on a 20k-row dim
    measured 2 s of an 8 s wall) and shipped once via ``ray.put``
    (int32 type ids); per-block DISTINCT (type, supp) / (type, part)
    combiner rows + qty partials -> ONE packed-key hash exchange with
    explicit boundaries -> per-block distinct counts + qty sums per
    type -> tiny driver fold (a (tid,kind,key) Dataset groupby did
    the same work through the sample+sort machinery: 8 s -> this
    shape)."""
    import pyarrow.parquet as _pq
    import ray

    part = _pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    types = sorted(part["p_type"].unique())
    tmap = {t: i for i, t in enumerate(types)}
    # int32 ids: standard TPC-H has 150 distinct p_type values, which
    # would wrap an int8 map negative and silently drop rows at the
    # tid>=0 sentinel filter below
    pmap = np.full(int(part["p_partkey"].max()) + 2, -1, np.int32)
    pmap[part["p_partkey"].to_numpy()] = (
        part["p_type"].map(tmap).to_numpy().astype(np.int32)
    )
    pmap_ref = ray.put(pmap)

    assert len(types) < (1 << 6), "p_type id must fit 6 packed bits"
    # packed exchange key: kind(2) | tid(6) | member(40); kind 0 =
    # (type, supp) distinct marker, 1 = (type, part) distinct marker,
    # 2 = qty partial (member 0, qty payload summed per tid)
    part_schema = pa.schema([("pkey", pa.int64()), ("qty", pa.int64()),
                             ("_p", pa.int64())])
    n_li, _ = _table_meta(sf_dir, "lineitem")
    P = _exchange_width(n_li)
    gd = _new_guard_dir("psbreadth")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        pm = ray.get(pmap_ref)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        assert (pk < (1 << 40)).all() and (sk < (1 << 40)).all(), (
            "packed member key needs partkey/suppkey < 2^40"
        )
        qty = _cents(t.column("l_quantity").to_numpy(zero_copy_only=False))
        tid = pm[np.clip(pk, 0, len(pm) - 1)].astype(np.int64)
        keep = (pk < len(pm)) & (tid >= 0)
        pk, sk, qty, tid = pk[keep], sk[keep], qty[keep], tid[keep]
        ks = np.unique(tid * (1 << 40) + sk)
        kp = np.unique(tid * (1 << 40) + pk) + (1 << 46)
        order = np.argsort(tid, kind="stable")
        ts_, qs = tid[order], qty[order]
        starts, _ = _segment_starts(ts_)
        pkey = np.concatenate(
            [ks, kp, (2 << 46) + ts_[starts] * (1 << 40)]
        )
        qcol = np.concatenate(
            [np.zeros(len(ks) + len(kp), np.int64),
             np.add.reduceat(qs, starts)]
        )
        return pa.table(
            {"pkey": pa.array(pkey), "qty": pa.array(qcol),
             "_p": pa.array(partition_ids(pa.array(pkey), P))},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("tid", pa.int64()), ("n_supp", pa.int64()),
         ("n_part", pa.int64()), ("qty", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        """Per exchange partition: distinct-count markers + sum qty
        partials per tid.  A pkey maps to exactly one partition, so
        per-partition distincts sum to the exact global distincts."""
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "ps", t.column("_p").to_numpy(zero_copy_only=False)
        )
        pkey = np.unique(t.column("pkey").to_numpy(zero_copy_only=False))
        kind = pkey >> 46
        tid = (pkey >> 40) & 63
        # markers: count distinct per (kind, tid)
        rows: dict[int, list[int]] = {}
        for k in (0, 1):
            m = kind == k
            ts_, cnt = np.unique(tid[m], return_counts=True)
            for a, c in zip(ts_, cnt):
                rows.setdefault(int(a), [0, 0, 0])[k] = int(c)
        # qty partials: two source blocks emit the SAME kind-2 pkey
        # for one tid (member bits are 0), so sum from the raw column
        # -- the deduped pkey array above would collapse them
        raw_pkey = t.column("pkey").to_numpy(zero_copy_only=False)
        raw_qty = t.column("qty").to_numpy(zero_copy_only=False)
        qm = raw_pkey >> 46 == 2
        if qm.any():
            qt = (raw_pkey[qm] >> 40) & 63
            ts_, inv = np.unique(qt, return_inverse=True)
            sums = np.bincount(inv, weights=raw_qty[qm]).astype(np.int64)
            for a, s in zip(ts_, sums):
                rows.setdefault(int(a), [0, 0, 0])[2] = int(s)
        tids = sorted(rows)
        return pa.table(
            {"tid": pa.array(tids, pa.int64()),
             "n_supp": pa.array([rows[a][0] for a in tids], pa.int64()),
             "n_part": pa.array([rows[a][1] for a in tids], pa.int64()),
             "qty": pa.array([rows[a][2] for a in tids], pa.int64())},
            schema=out_schema,
        )

    folded = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    agg = folded.groupby("tid", sort=True).sum()
    rows = []
    for i, tname in enumerate(types):
        if i not in agg.index:
            continue
        r = agg.loc[i]
        rows.append((tname, int(r["n_supp"]), int(r["n_part"]),
                     int(r["qty"])))
    out = pa.table(
        {"p_type": pa.array([r[0] for r in rows], pa.string()),
         "n_suppliers": pa.array([r[1] for r in rows], pa.int64()),
         "n_parts": pa.array([r[2] for r in rows], pa.int64()),
         "sum_qty_cents": pa.array([r[3] for r in rows], pa.int64())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Acquisition mix: each user's FIRST event type
# ---------------------------------------------------------------------------
def events_first_touch_mix(sf_dir: str) -> pa.Table:
    """Acquisition-channel mix: the distribution of each user's
    FIRST event type (order ``(ts, event_id)`` -- the witness-
    aggregate pattern: min-key fold carrying a payload).  Returns
    ``(event_type, n_users, share_e6)`` with exact shares.

    Scale shape: per-block per-user (min (ts, event_id) -> type)
    witness partials -> ONE user hash exchange re-folding witnesses
    (the pair (ts, eid) packs into the sort key; the type rides as
    payload) -> per-block type counts -> tiny fold."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("ftmix")
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    w_schema = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.int64()), ("eid", pa.int64()),
         ("event_type", pa.string()), ("_p", pa.int64())]
    )

    def witness(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return w_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column("ts"))
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u2, ts2, e2 = u[order], ts[order], eid[order]
        starts, _ = _segment_starts(u2)
        uu = u2[starts]
        return pa.table(
            {"user_id": pa.array(uu), "ts": pa.array(ts2[starts]),
             "eid": pa.array(e2[starts]),
             "event_type": pa.array(list(et[order][starts]), pa.string()),
             "_p": pa.array(partition_ids(pa.array(uu), P))},
            schema=w_schema,
        )

    cnt_schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64())]
    )

    def refold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cnt_schema.empty_table()
        _guard_record(
            gd, "ftm", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("eid").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u2 = u[order]
        starts, _ = _segment_starts(u2)
        win = et[order][starts]
        o2, s2, counts = _group_segments(win)
        return pa.table(
            {"event_type": pa.array(list(win[o2][s2]), pa.string()),
             "n": pa.array(counts.astype(np.int64))},
            schema=cnt_schema,
        )

    agg = (
        ds.map_batches(witness, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(refold, batch_format="pyarrow", batch_size=None)
        .groupby("event_type").sum("n").to_pandas()
    )
    agg.columns = ["event_type", "n"]
    agg = agg.sort_values("event_type", ignore_index=True)
    total = int(agg["n"].sum())
    n = agg["n"].to_numpy(dtype=np.int64)
    share = np.array([10**6 * int(c) // total for c in n], np.int64)
    out = pa.table(
        {"event_type": pa.array(agg["event_type"], pa.string()),
         "n_users": pa.array(n), "share_e6": pa.array(share)}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Growth accounting: new / retained / resurrected per week
# ---------------------------------------------------------------------------
def events_growth_accounting(sf_dir: str) -> pa.Table:
    """Weekly growth accounting (churn's constructive sibling): each
    active (user, week) classifies as NEW (the user's first-ever
    week), RETAINED (also active in week-1) or RESURRECTED (active
    before, but not in week-1).  Returns ``(week, n_new, n_retained,
    n_resurrected)`` -- with ``events_churn_rate`` this reconciles
    the week-over-week active-user balance exactly.

    Scale shape: the churn exchange -- per-block DISTINCT (user,
    week) combiner, user co-location, per-user sorted-week sweep
    classifying each week in O(weeks-per-user) -> per-week partials
    -> tiny fold."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("growth")
    DAY_US = np.int64(86_400 * _US)
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    pair_schema = pa.schema(
        [("user_id", pa.int64()), ("week", pa.int64()), ("_p", pa.int64())]
    )

    def distinct_uw(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w = (_ts_i64(t.column("ts")) // DAY_US) // 7
        order = np.lexsort((w, u))
        us, ws = u[order], w[order]
        keep = np.concatenate(
            [[True], (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])]
        )
        us, ws = us[keep], ws[keep]
        return pa.table(
            {"user_id": pa.array(us), "week": pa.array(ws),
             "_p": pa.array(partition_ids(pa.array(us), P))},
            schema=pair_schema,
        )

    part_schema = pa.schema(
        [("week", pa.int64()), ("n_new", pa.int64()),
         ("n_retained", pa.int64()), ("n_resurrected", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "grw", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        w = t.column("week").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        )
        u, w = u[keep], w[keep]
        first = np.concatenate([[True], u[1:] != u[:-1]])
        prev_adjacent = np.concatenate(
            [[False], (u[1:] == u[:-1]) & (w[1:] == w[:-1] + 1)]
        )
        is_new = first
        is_ret = prev_adjacent
        is_res = (~first) & (~prev_adjacent)
        order2 = np.argsort(w, kind="stable")
        ws = w[order2]
        starts, _ = _segment_starts(ws)
        return pa.table(
            {"week": pa.array(ws[starts]),
             "n_new": pa.array(np.add.reduceat(
                 is_new[order2].astype(np.int64), starts)),
             "n_retained": pa.array(np.add.reduceat(
                 is_ret[order2].astype(np.int64), starts)),
             "n_resurrected": pa.array(np.add.reduceat(
                 is_res[order2].astype(np.int64), starts))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(distinct_uw, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("week").sum(["n_new", "n_retained", "n_resurrected"])
        .to_pandas()
    )
    agg.columns = ["week", "n_new", "n_retained", "n_resurrected"]
    agg = agg.sort_values("week", ignore_index=True)
    out = pa.table(
        {"week": pa.array(agg["week"].to_numpy(dtype=np.int64)),
         "n_new": pa.array(agg["n_new"].to_numpy(dtype=np.int64)),
         "n_retained": pa.array(
             agg["n_retained"].to_numpy(dtype=np.int64)),
         "n_resurrected": pa.array(
             agg["n_resurrected"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Month-of-year revenue profile for orders
# ---------------------------------------------------------------------------
def orders_month_profile(sf_dir: str) -> pa.Table:
    """Annual seasonality of order revenue: exact per month-of-year
    (1-12) revenue cents and share -- the fiscal-planning profile
    (events' diurnal profile, lifted to the orders fact and the
    yearly cycle).  Returns ``(month_of_year, revenue_cents,
    share_e6)`` for observed months.

    Scale shape: per-block 12-bounded revenue partials -> tiny
    groupby -> O(12) driver shares."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    part_schema = pa.schema([("moy", pa.int64()), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        od = _ts_i64(t.column("o_orderdate"))
        months = (od.astype("datetime64[us]").astype("datetime64[M]")
                  .view(np.int64))
        moy = months % 12 + 1
        cents = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
        order = np.argsort(moy, kind="stable")
        ms, cs = moy[order], cents[order]
        starts, _ = _segment_starts(ms)
        return pa.table(
            {"moy": pa.array(ms[starts]),
             "cents": pa.array(np.add.reduceat(cs, starts))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("moy").sum("cents").to_pandas()
    )
    agg.columns = ["moy", "cents"]
    agg = agg.sort_values("moy", ignore_index=True)
    total = int(agg["cents"].sum())
    c = agg["cents"].to_numpy(dtype=np.int64)
    share = np.array([10**6 * int(x) // total for x in c], np.int64)
    return pa.table(
        {"month_of_year": pa.array(agg["moy"].to_numpy(dtype=np.int64)),
         "revenue_cents": pa.array(c),
         "share_e6": pa.array(share)}
    )


# ---------------------------------------------------------------------------
# Power-user listing: users at or above the P99 activity cutoff
# ---------------------------------------------------------------------------
def events_power_users(sf_dir: str, pct: int = 99) -> pa.Table:
    """The power-user roster: users whose event count reaches the
    exact ``pct``-th lower-quantile cutoff of the per-user count
    distribution (threshold from ``events_user_count_quantiles``'s
    histogram machinery, then a filtered second pass) -- the
    order-statistic-then-broadcast-threshold pattern.  Returns
    ``(user_id, n_events)``, count desc then user asc.

    Scale shape: pass 1 = per-user counts + count-of-counts
    histogram (dimension-bounded) -> driver cutoff scalar; pass 2
    re-folds per-user counts and filters >= cutoff -- output is
    roster-sized by construction (~1% of users)."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    part_schema = pa.schema([("user_id", pa.int64()), ("c", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(u, kind="stable")
        us = u[order]
        starts, lens = _segment_starts(us)
        return pa.table(
            {"user_id": pa.array(us[starts]),
             "c": pa.array(lens.astype(np.int64))},
            schema=part_schema,
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id").sum("c").materialize()
    )

    hist_schema = pa.schema([("c", pa.int64()), ("n", pa.int64())])

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        c = t.column("sum(c)").to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        cs = c[order]
        starts, lens = _segment_starts(cs)
        return pa.table(
            {"c": pa.array(cs[starts]),
             "n": pa.array(lens.astype(np.int64))},
            schema=hist_schema,
        )

    hist = (
        counts.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c").sum("n").to_pandas()
    )
    hist.columns = ["c", "n"]
    hist = hist.sort_values("c", ignore_index=True)
    vals = hist["c"].to_numpy(dtype=np.int64)
    cnts = hist["n"].to_numpy(dtype=np.int64)
    n_users = int(cnts.sum())
    cum = np.cumsum(cnts)
    cutoff = int(vals[np.searchsorted(cum, -(-n_users * pct // 100),
                                      side="left")])

    def above(t: pa.Table) -> pa.Table:
        c = t.column("sum(c)").to_numpy(zero_copy_only=False)
        keep = c >= cutoff
        return pa.table(
            {"user_id": t.column("user_id").filter(pa.array(keep)),
             "n_events": pa.array(c[keep])}
        )

    roster = counts.map_batches(above, batch_format="pyarrow").to_pandas()
    roster = roster.sort_values(["n_events", "user_id"],
                                ascending=[False, True],
                                ignore_index=True)
    return pa.table(
        {"user_id": pa.array(roster["user_id"].to_numpy(dtype=np.int64)),
         "n_events": pa.array(roster["n_events"].to_numpy(dtype=np.int64))}
    )


# ---------------------------------------------------------------------------
# Rate-limit audit: per-user per-minute burst ceilings
# ---------------------------------------------------------------------------
def events_rate_limit_audit(sf_dir: str, limit: int = 3) -> pa.Table:
    """Abuse/bot screen: per (user, minute) event counts -- how many
    user-minutes exist, how many exceed ``limit`` events, and the
    hottest burst observed.  Returns one row ``(n_user_minutes,
    n_over_limit, max_per_minute)``.

    Scale shape: per-block (user, minute) count partials -> ONE pair
    ``groupby.sum`` (bounded by distinct user-minutes) -> per-block
    scalar partials -> driver fold."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    MIN_US = np.int64(60 * _US)

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("minute", pa.int64()), ("c", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        m = _ts_i64(t.column("ts")) // MIN_US
        order = np.lexsort((m, u))
        us, ms = u[order], m[order]
        brk = np.concatenate(
            [[True], (us[1:] != us[:-1]) | (ms[1:] != ms[:-1])]
        )
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, len(us)))
        return pa.table(
            {"user_id": pa.array(us[starts]),
             "minute": pa.array(ms[starts]),
             "c": pa.array(lens.astype(np.int64))},
            schema=part_schema,
        )

    stat_schema = pa.schema(
        [("n_um", pa.int64()), ("n_over", pa.int64()), ("mx", pa.int64())]
    )

    def stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return stat_schema.empty_table()
        c = t.column("sum(c)").to_numpy(zero_copy_only=False)
        return pa.table(
            {"n_um": pa.array([len(c)], pa.int64()),
             "n_over": pa.array([int((c > limit).sum())], pa.int64()),
             "mx": pa.array([int(c.max())], pa.int64())},
            schema=stat_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "minute"]).sum("c")
        .map_batches(stats, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table(
        {"n_user_minutes": pa.array([int(agg["n_um"].sum())], pa.int64()),
         "n_over_limit": pa.array([int(agg["n_over"].sum())], pa.int64()),
         "max_per_minute": pa.array(
             [int(agg["mx"].max()) if len(agg) else 0], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Split-shipment rate: orders shipped on more than one date
# ---------------------------------------------------------------------------
def orders_split_shipments(sf_dir: str) -> pa.Table:
    """Fulfillment fragmentation: how many orders ship on MORE THAN
    ONE distinct date -- ``(n_orders, n_split, split_e6,
    max_ship_dates)`` with the rate as ``floor(1e6 *
    n_split/n_orders)`` over orders that ship at all.

    Scale shape: the fd_check one-exchange shape -- per-block
    DISTINCT (orderkey, shipdate) combiner -> orderkey hash exchange
    -> per-block dedupe + distinct-date counts folded to scalars."""
    n_li, _ = _table_meta(sf_dir, "lineitem")
    P = _exchange_width(n_li)
    gd = _new_guard_dir("splitship")
    DAY_US = np.int64(86_400 * _US)
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    pair_schema = pa.schema(
        [("k", pa.int64()), ("d", pa.int64()), ("_p", pa.int64())]
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        d = _ts_i64(t.column("l_shipdate")) // DAY_US
        order = np.lexsort((d, k))
        ks, ds_ = k[order], d[order]
        keep = np.concatenate(
            [[True], (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])]
        )
        ks, ds_ = ks[keep], ds_[keep]
        return pa.table(
            {"k": pa.array(ks), "d": pa.array(ds_),
             "_p": pa.array(partition_ids(pa.array(ks), P))},
            schema=pair_schema,
        )

    stat_schema = pa.schema(
        [("n_orders", pa.int64()), ("n_split", pa.int64()),
         ("mx", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return stat_schema.empty_table()
        _guard_record(
            gd, "ss", t.column("_p").to_numpy(zero_copy_only=False)
        )
        k = t.column("k").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, k))
        ks, ds_ = k[order], d[order]
        keep = np.concatenate(
            [[True], (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])]
        )
        ks = ks[keep]
        starts, lens = _segment_starts(ks)
        return pa.table(
            {"n_orders": pa.array([len(starts)], pa.int64()),
             "n_split": pa.array([int((lens > 1).sum())], pa.int64()),
             "mx": pa.array([int(lens.max())], pa.int64())},
            schema=stat_schema,
        )

    agg = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    n_orders = int(agg["n_orders"].sum())
    n_split = int(agg["n_split"].sum())
    out = pa.table(
        {"n_orders": pa.array([n_orders], pa.int64()),
         "n_split": pa.array([n_split], pa.int64()),
         "split_e6": pa.array(
             [10**6 * n_split // n_orders if n_orders else 0], pa.int64()),
         "max_ship_dates": pa.array(
             [int(agg["mx"].max()) if len(agg) else 0], pa.int64())}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Fulfillment latency: order date -> first shipment, histogram
# ---------------------------------------------------------------------------
def orders_fulfillment_latency(sf_dir: str) -> pa.Table:
    """Fulfillment speed: whole days from ``o_orderdate`` to the
    order's FIRST line-item shipment, histogrammed as
    ``(latency_days, n_orders)``; orders that never ship land in
    the ``-1`` bucket (the conversion-latency shape on the orders
    fact).

    Scale shape: per-block per-key min-shipdate partials -> ONE
    orderkey exchange joining order rows with their min-fold ->
    per-block histogram partials -> tiny fold."""
    n_li, _ = _table_meta(sf_dir, "lineitem")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_li + n_or)
    gd = _new_guard_dir("fulfill")
    DAY_US = np.int64(86_400 * _US)
    SENT = np.int64(1 << 62)

    e = pa.schema(
        [("_k", pa.int64()), ("_side", pa.int8()), ("_ts", pa.int64()),
         ("_p", pa.int64())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e.empty_table()
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sd = _ts_i64(t.column("l_shipdate"))
        order = np.argsort(k, kind="stable")
        ks, sds = k[order], sd[order]
        starts, _ = _segment_starts(ks)
        keys = ks[starts]
        return pa.table(
            {"_k": pa.array(keys),
             "_side": pa.array(np.ones(len(keys), np.int8)),
             "_ts": pa.array(np.minimum.reduceat(sds, starts)),
             "_p": pa.array(partition_ids(pa.array(keys), P))},
            schema=e,
        )

    def o_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e.empty_table()
        k = t.column("o_orderkey").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {"_k": k, "_side": pa.array(np.zeros(n, np.int8)),
             "_ts": pa.array(_ts_i64(t.column("o_orderdate"))),
             "_p": pa.array(partition_ids(k, P))},
            schema=e,
        )

    hist_schema = pa.schema(
        [("latency_days", pa.int64()), ("n_orders", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        _guard_record(
            gd, "ful", t.column("_p").to_numpy(zero_copy_only=False)
        )
        k = t.column("_k").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        ts = t.column("_ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, k))  # order row first per key
        k, side, ts = k[order], side[order], ts[order]
        starts, lens = _segment_starts(k)
        has_order = side[starts] == 0
        # min over kind-1 partials; sentinel when none ship
        ship_min = np.full(len(starts), SENT, np.int64)
        seg_id = np.cumsum(
            np.concatenate([[0], (k[1:] != k[:-1]).astype(np.int64)])
        )
        is_li = side == 1
        np.minimum.at(ship_min, seg_id[is_li], ts[is_li])
        od = ts[starts]
        keep = has_order
        lat = np.where(ship_min[keep] >= SENT, np.int64(-1),
                       (ship_min[keep] - od[keep]) // DAY_US)
        order2 = np.argsort(lat, kind="stable")
        ls = lat[order2]
        s2, l2 = _segment_starts(ls)
        return pa.table(
            {"latency_days": pa.array(ls[s2]),
             "n_orders": pa.array(l2.astype(np.int64))},
            schema=hist_schema,
        )

    agg = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(li_partial, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
            .map_batches(o_rows, batch_format="pyarrow")
        )
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("latency_days").sum("n_orders")
        .to_pandas()
    )
    agg.columns = ["latency_days", "n_orders"]
    agg = agg.sort_values("latency_days", ignore_index=True)
    out = pa.table(
        {"latency_days": pa.array(
            agg["latency_days"].to_numpy(dtype=np.int64)),
         "n_orders": pa.array(agg["n_orders"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Longest daily-activity streak per user, histogrammed
# ---------------------------------------------------------------------------
def events_streak_histogram(sf_dir: str) -> pa.Table:
    """Habit-strength report: each user's LONGEST run of consecutive
    active days (gaps-and-islands), histogrammed as ``(streak_days,
    n_users)``.

    Scale shape: per-block DISTINCT (user, day) combiner -> ONE user
    hash exchange -> per-user sorted-day sweep finding the longest
    island -> per-block histogram partials -> tiny fold."""
    n_rows, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("streak")
    DAY_US = np.int64(86_400 * _US)
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    pair_schema = pa.schema(
        [("user_id", pa.int64()), ("day", pa.int64()), ("_p", pa.int64())]
    )

    def distinct_ud(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        d = _ts_i64(t.column("ts")) // DAY_US
        order = np.lexsort((d, u))
        us, ds_ = u[order], d[order]
        keep = np.concatenate(
            [[True], (us[1:] != us[:-1]) | (ds_[1:] != ds_[:-1])]
        )
        us, ds_ = us[keep], ds_[keep]
        return pa.table(
            {"user_id": pa.array(us), "day": pa.array(ds_),
             "_p": pa.array(partition_ids(pa.array(us), P))},
            schema=pair_schema,
        )

    hist_schema = pa.schema(
        [("streak_days", pa.int64()), ("n_users", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        _guard_record(
            gd, "stk", t.column("_p").to_numpy(zero_copy_only=False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        )
        u, d = u[keep], d[keep]
        # islands: run breaks where user changes or day jumps
        brk = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)]
        )
        run_id = np.cumsum(brk) - 1
        run_len = np.bincount(run_id)
        # longest run per user: runs are contiguous per user
        run_user = u[np.flatnonzero(brk)]
        order2 = np.argsort(run_user, kind="stable")
        ru, rl = run_user[order2], run_len[order2]
        starts, _ = _segment_starts(ru)
        best = np.maximum.reduceat(rl, starts)
        o3 = np.argsort(best, kind="stable")
        bs = best[o3]
        s3, l3 = _segment_starts(bs)
        return pa.table(
            {"streak_days": pa.array(bs[s3].astype(np.int64)),
             "n_users": pa.array(l3.astype(np.int64))},
            schema=hist_schema,
        )

    agg = (
        ds.map_batches(distinct_ud, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("streak_days").sum("n_users")
        .to_pandas()
    )
    agg.columns = ["streak_days", "n_users"]
    agg = agg.sort_values("streak_days", ignore_index=True)
    out = pa.table(
        {"streak_days": pa.array(
            agg["streak_days"].to_numpy(dtype=np.int64)),
         "n_users": pa.array(agg["n_users"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Effective tax incidence per return flag
# ---------------------------------------------------------------------------
def lineitem_tax_incidence(sf_dir: str) -> pa.Table:
    """Effective tax rate per ``l_returnflag``: exact per-row tax
    cents (``floor(extprice * tax * 100)``) over exact price cents,
    as ``rate_e6 = floor(1e6 * sum_tax / sum_price)`` -- the
    weighted-ratio rollup (a mean of ratios would be wrong; this is
    the ratio of sums).  Returns ``(l_returnflag, sum_price_cents,
    sum_tax_cents, rate_e6)``.

    Scale shape: per-block (flag -> two sums) partials, flag-bounded
    groupby, O(flags) driver division."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice", "l_tax"])

    part_schema = pa.schema(
        [("l_returnflag", pa.string()), ("price", pa.int64()),
         ("tax", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        fl = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        tax = t.column("l_tax").to_numpy(zero_copy_only=False)
        pc = _cents(price)
        tc = np.floor(price * tax * 100.0).astype(np.int64)
        order, starts, _ = _group_segments(fl)
        return pa.table(
            {"l_returnflag": pa.array(list(fl[order][starts]), pa.string()),
             "price": pa.array(np.add.reduceat(pc[order], starts)),
             "tax": pa.array(np.add.reduceat(tc[order], starts))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag").sum(["price", "tax"]).to_pandas()
    )
    agg.columns = ["l_returnflag", "price", "tax"]
    agg = agg.sort_values("l_returnflag", ignore_index=True)
    pr = agg["price"].to_numpy(dtype=np.int64)
    tx = agg["tax"].to_numpy(dtype=np.int64)
    rate = np.array([10**6 * int(t) // int(p) for t, p in zip(tx, pr)],
                    np.int64)
    return pa.table(
        {"l_returnflag": pa.array(agg["l_returnflag"], pa.string()),
         "sum_price_cents": pa.array(pr),
         "sum_tax_cents": pa.array(tx),
         "rate_e6": pa.array(rate)}
    )


# ---------------------------------------------------------------------------
# Co-movement: signed squared correlation between type series
# ---------------------------------------------------------------------------
def events_type_corr2(sf_dir: str) -> pa.Table:
    """Which metrics move together: for every pair of event types,
    the SIGNED squared Pearson correlation of their dense hourly
    count series -- ``corr^2 = cov^2 / (var_a * var_b)`` stays an
    exact integer ratio (no sqrt; the cos^2 trick on centered
    series), the sign rides separately as ``sign(cov)``.  Returns
    ``(type_a, type_b, sign, corr2_e6)``, ``type_a < type_b``.

    Scale shape: ONE dim-bounded (type, hour) fold (the shared
    series contract); all pairwise sufficient statistics are
    O(types^2 * series) driver math in arbitrary-precision ints."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("n_obs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hr = _ts_i64(t.column("ts")) // 3_600_000_000
        key = np.asarray([f"{e}\x00{h}" for e, h in zip(et, hr)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "hour": pa.array(hr[order][starts]),
             "n_obs": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("n_obs")
        .to_pandas()
    )
    merged.columns = ["event_type", "hour", "n_obs"]
    out_schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()),
         ("sign", pa.int64()), ("corr2_e6", pa.int64())]
    )
    if len(merged) == 0:
        return out_schema.empty_table()
    h_lo = int(merged["hour"].min())
    h_hi = int(merged["hour"].max())
    span = h_hi - h_lo + 1
    series: dict[str, list[int]] = {}
    for et, grp in merged.groupby("event_type", sort=True):
        dense = [0] * span
        for h, c in zip(grp["hour"].to_numpy(dtype=np.int64),
                        grp["n_obs"].to_numpy(dtype=np.int64)):
            dense[int(h) - h_lo] = int(c)
        series[et] = dense
    types = sorted(series)
    rows = []
    T = span
    sums = {t: sum(series[t]) for t in types}
    sq = {t: sum(v * v for v in series[t]) for t in types}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            sxy = sum(x * y for x, y in zip(series[a], series[b]))
            cov = T * sxy - sums[a] * sums[b]
            var_a = T * sq[a] - sums[a] ** 2
            var_b = T * sq[b] - sums[b] ** 2
            den = var_a * var_b
            if den == 0:
                rows.append((a, b, 0, 0))
                continue
            sign = 0 if cov == 0 else (1 if cov > 0 else -1)
            rows.append((a, b, sign, 10**6 * cov * cov // den))
    return pa.table(
        {"type_a": pa.array([r[0] for r in rows], pa.string()),
         "type_b": pa.array([r[1] for r in rows], pa.string()),
         "sign": pa.array([r[2] for r in rows], pa.int64()),
         "corr2_e6": pa.array([r[3] for r in rows], pa.int64())},
        schema=out_schema,
    )


# ---------------------------------------------------------------------------
# Quadrant segmentation: balance vs order frequency double median
# ---------------------------------------------------------------------------
def customer_quadrants(sf_dir: str) -> pa.Table:
    """Double-median cross-classification: customers split at the
    exact lower-median of account balance (cents) AND of their order
    count (customers with no orders count 0), yielding the four
    quadrants ``hh / hl / lh / ll`` (balance side first; "high" =
    strictly above the median).  Returns ``(quadrant, n_customers)``
    for non-empty quadrants.

    Scale shape: two dimension-bounded histograms (balance values,
    count-of-order-counts) give both medians exactly; ONE custkey
    exchange tags each customer with its order count; the quadrant
    classification is a stateless map folded to 4 counters."""
    n_cust, _ = _table_meta(sf_dir, "customer")
    n_or, _ = _table_meta(sf_dir, "orders")
    P = _exchange_width(n_cust + n_or)
    gd = _new_guard_dir("quad")

    e = pa.schema(
        [("_key", pa.int64()), ("_side", pa.int8()), ("_bal", pa.int64()),
         ("_p", pa.int64())]
    )

    def cust_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e.empty_table()
        ck = t.column("c_custkey").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {"_key": ck, "_side": pa.array(np.zeros(n, np.int8)),
             "_bal": pa.array(_cents(
                 t.column("c_acctbal").to_numpy(zero_copy_only=False))),
             "_p": pa.array(partition_ids(ck, P))},
            schema=e,
        )

    def order_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return e.empty_table()
        ck = t.column("o_custkey").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {"_key": ck, "_side": pa.array(np.ones(n, np.int8)),
             "_bal": pa.array(np.zeros(n, np.int64)),
             "_p": pa.array(partition_ids(ck, P))},
            schema=e,
        )

    pc_schema = pa.schema(
        [("bal", pa.int64()), ("cnt", pa.int64())]
    )

    def per_cust(t: pa.Table) -> pa.Table:
        """(balance, order count) per customer -- the exchange
        co-locates each custkey; order rows without a customer row
        drop (FROM customer semantics)."""
        if t.num_rows == 0:
            return pc_schema.empty_table()
        _guard_record(
            gd, "quad", t.column("_p").to_numpy(zero_copy_only=False)
        )
        k = t.column("_key").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        bal = t.column("_bal").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, k))
        k, side, bal = k[order], side[order], bal[order]
        starts, lens = _segment_starts(k)
        is_cust = side[starts] == 0
        n_orders = np.add.reduceat(side.astype(np.int64), starts)
        return pa.table(
            {"bal": pa.array(bal[starts][is_cust]),
             "cnt": pa.array(n_orders[is_cust])},
            schema=pc_schema,
        )

    pc = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
        .map_batches(cust_rows, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", columns=["o_custkey"])
            .map_batches(order_rows, batch_format="pyarrow")
        )
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(per_cust, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    def hist_of(col: str):
        def h(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema(
                    [("v", pa.int64()), ("n", pa.int64())]).empty_table()
            v = t.column(col).to_numpy(zero_copy_only=False)
            order = np.argsort(v, kind="stable")
            vs = v[order]
            starts, lens = _segment_starts(vs)
            return pa.table(
                {"v": pa.array(vs[starts]),
                 "n": pa.array(lens.astype(np.int64))}
            )
        df = (pc.map_batches(h, batch_format="pyarrow")
              .groupby("v").sum("n").to_pandas())
        df.columns = ["v", "n"]
        df = df.sort_values("v", ignore_index=True)
        vals = df["v"].to_numpy(dtype=np.int64)
        cnts = df["n"].to_numpy(dtype=np.int64)
        total = int(cnts.sum())
        cum = np.cumsum(cnts)
        rank = -(-total // 2)  # lower median rank ceil(n/2)
        return int(vals[np.searchsorted(cum, rank, side="left")])

    med_bal = hist_of("bal")
    med_cnt = hist_of("cnt")

    q_schema = pa.schema([("quadrant", pa.string()), ("n", pa.int64())])

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return q_schema.empty_table()
        bal = t.column("bal").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        hb = bal > med_bal
        hc = cnt > med_cnt
        code = hb.astype(np.int64) * 2 + hc.astype(np.int64)
        counts = np.bincount(code, minlength=4)
        names = np.array(["ll", "lh", "hl", "hh"], object)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"quadrant": pa.array(list(names[nz]), pa.string()),
             "n": pa.array(counts[nz].astype(np.int64))},
            schema=q_schema,
        )

    agg = (
        pc.map_batches(classify, batch_format="pyarrow")
        .groupby("quadrant").sum("n").to_pandas()
    )
    agg.columns = ["quadrant", "n_customers"]
    agg = agg.sort_values("quadrant", ignore_index=True)
    out = pa.table(
        {"quadrant": pa.array(agg["quadrant"], pa.string()),
         "n_customers": pa.array(
             agg["n_customers"].to_numpy(dtype=np.int64))}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Boxplot outlier screen: Tukey IQR fences, exact
# ---------------------------------------------------------------------------
def events_iqr_outliers(sf_dir: str) -> pa.Table:
    """Tukey boxplot outliers per ``event_type``: Q1/Q3 as exact
    lower quantiles (rank ``ceil(q*n)``) of value cents, fences at
    ``Q1 - 1.5*IQR`` / ``Q3 + 1.5*IQR`` compared WITHOUT fractions
    (``2*v < 2*Q1 - 3*IQR`` etc. -- the half-integer fence never
    materializes).  Returns ``(event_type, q1, q3, n_low, n_high)``.

    Scale shape: ONE (type, value) histogram fold; quantiles AND
    both tail counts come from the same tiny histogram on the
    driver."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    hist_schema = pa.schema(
        [("event_type", pa.string()), ("v", pa.int64()), ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        key = np.asarray([f"{e}\x00{c}" for e, c in zip(et, cents)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"event_type": pa.array(list(et[order][starts]), pa.string()),
             "v": pa.array(cents[order][starts]),
             "n": pa.array(counts.astype(np.int64))},
            schema=hist_schema,
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "v"]).sum("n").to_pandas()
    )
    hist.columns = ["event_type", "v", "n"]
    rows = []
    for et, grp in hist.groupby("event_type", sort=True):
        grp = grp.sort_values("v", ignore_index=True)
        vals = grp["v"].to_numpy(dtype=np.int64)
        cnts = grp["n"].to_numpy(dtype=np.int64)
        n = int(cnts.sum())
        cum = np.cumsum(cnts)
        q1 = int(vals[np.searchsorted(cum, -(-n * 25 // 100),
                                      side="left")])
        q3 = int(vals[np.searchsorted(cum, -(-n * 75 // 100),
                                      side="left")])
        iqr = q3 - q1
        # 2*v < 2*q1 - 3*iqr  <=>  v < q1 - 1.5*iqr
        n_low = int(cnts[2 * vals < 2 * q1 - 3 * iqr].sum())
        n_high = int(cnts[2 * vals > 2 * q3 + 3 * iqr].sum())
        rows.append((et, q1, q3, n_low, n_high))
    return pa.table(
        {"event_type": pa.array([r[0] for r in rows], pa.string()),
         "q1": pa.array([r[1] for r in rows], pa.int64()),
         "q3": pa.array([r[2] for r in rows], pa.int64()),
         "n_low": pa.array([r[3] for r in rows], pa.int64()),
         "n_high": pa.array([r[4] for r in rows], pa.int64())}
    )
