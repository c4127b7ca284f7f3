"""Event-time relational operator tests (pipelines/events.py):
gap sessionization, tumbling windows, as-of join -- planted fixtures
with hand-computed expectations covering boundary/tie semantics.
"""

import datetime as dt

import numpy as np
import pytest
import pyarrow as pa
import pyarrow.parquet as pq

from logminer_kafka_connect_ray.pipelines import events as ev

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return EPOCH + dt.timedelta(minutes=minutes)


def make_events(tmp_path, rows):
    """rows: (event_id, user_id, minutes_from_epoch, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([_ts(r[2]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def make_orders(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, minutes_from_epoch)."""
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
            "o_orderdate": pa.array([_ts(r[2]) for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_sessionize_gap_boundary_and_per_user_idx(ray_session, tmp_path):
    # user 1: events at 0, 30 (gap == 30min: SAME session), 61 (gap 31:
    # break), user 2: single event
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "a", 1.00),
            (2, 1, 30.0, "a", 2.00),
            (3, 1, 61.0, "a", 4.00),
            (4, 2, 5.0, "b", 8.00),
        ],
    )
    out = ev.events_sessionize(sf).to_pylist()
    got = [
        (r["user_id"], r["session_idx"], r["n_events"], r["sum_value_cents"])
        for r in out
    ]
    assert got == [(1, 1, 2, 300), (1, 2, 1, 400), (2, 1, 1, 800)]
    assert out[0]["session_start"] == _ts(0) and out[0]["session_end"] == _ts(30)


def test_sessionize_tie_on_ts_uses_event_id_order(ray_session, tmp_path):
    # two events at the identical ts belong to one session regardless
    # of file order; session bounds cover both
    sf = make_events(
        tmp_path,
        [(10, 7, 100.0, "a", 1.0), (9, 7, 100.0, "a", 1.0)],
    )
    out = ev.events_sessionize(sf).to_pylist()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_window_stats_distinct_users_and_hour_boundary(ray_session, tmp_path):
    # minute 59.999 is hour 0; minute 60 is hour 1.  user 5 appears
    # twice in hour 0 -> n_users counts it once.
    sf = make_events(
        tmp_path,
        [
            (1, 5, 1.0, "click", 1.00),
            (2, 5, 59.9, "click", 2.00),
            (3, 6, 30.0, "click", 3.00),
            (4, 5, 60.0, "click", 5.00),
            (5, 9, 10.0, "view", 7.00),
        ],
    )
    out = ev.events_window_stats(sf).to_pylist()
    got = {
        (r["event_type"], r["window_start"].hour): (
            r["n_events"], r["n_users"], r["sum_value_cents"],
        )
        for r in out
    }
    assert got == {
        ("click", 0): (3, 2, 600),
        ("click", 1): (1, 1, 500),
        ("view", 0): (1, 1, 700),
    }


def test_asof_join_inclusive_ties_and_no_match(ray_session, tmp_path):
    rows = [
        # user 3: events at t=10 (eid 1) and TWO at t=20 (eids 2, 3)
        (1, 3, 10.0, "early", 0.0),
        (2, 3, 20.0, "tie_lo", 0.0),
        (3, 3, 20.0, "tie_hi", 0.0),
        # user 4: single late event
        (4, 4, 500.0, "late", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    make_orders(
        tmp_path,
        [
            (100, 3, 20.0),   # at the tie: inclusive, max event_id wins
            (101, 3, 15.0),   # between events: eid 1
            (102, 4, 100.0),  # before user 4's only event: no match
            (103, 8, 50.0),   # user with no events at all: no match
        ],
    )
    out = {r["o_orderkey"]: r for r in ev.orders_asof_events(sf).to_pylist()}
    assert len(out) == 4
    assert out[100]["asof_event_id"] == 3
    assert out[100]["asof_event_type"] == "tie_hi"
    assert out[100]["asof_ts"] == _ts(20)
    assert out[101]["asof_event_id"] == 1
    assert out[102]["asof_event_id"] is None
    assert out[103]["asof_event_id"] is None
    assert out[103]["asof_event_type"] is None


def test_group_topk_rank_and_ties(ray_session, tmp_path):
    # user 1 has 4 events; equal values tie-break by smaller event_id
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "a", 5.0),
            (2, 1, 1.0, "a", 9.0),
            (3, 1, 2.0, "a", 9.0),
            (4, 1, 3.0, "a", 1.0),
            (5, 2, 0.0, "a", 2.0),
        ],
    )
    out = [
        (r["user_id"], r["rank"], r["event_id"])
        for r in ev.events_group_topk(sf, k=3).to_pylist()
    ]
    assert out == [(1, 1, 2), (1, 2, 3), (1, 3, 1), (2, 1, 5)]


def test_value_quantiles_disc_semantics(ray_session, tmp_path):
    # cents = [100, 200, 300, 400]; quantile_disc: smallest element
    # whose cumulative count >= ceil(q*n)
    sf = make_events(
        tmp_path,
        [(i, 1, float(i), "a", v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0])],
    )
    out = ev.events_value_quantiles(sf, qs=(0.25, 0.5, 0.75, 1.0))
    assert out.column("value_cents").to_pylist() == [100, 200, 300, 400]


def test_range_join_window_bounds(ray_session, tmp_path):
    # window is (orderdate - 24h, orderdate]: an event exactly 24h
    # before is OUT, one exactly at the orderdate is IN
    h = 60.0  # minutes per hour
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "a", 1.00),        # exactly 24h before order at 24h
            (2, 1, 1.0, "a", 2.00),        # inside
            (3, 1, 24 * h, "a", 4.00),     # exactly at the order: inside
            (4, 1, 25 * h, "a", 8.00),     # after: out
            (5, 2, 10.0, "a", 16.00),      # other user
        ],
    )
    make_orders(tmp_path, [(100, 1, 24 * h), (101, 3, 50.0)])
    out = {r["o_orderkey"]: r
           for r in ev.orders_range_join_events(sf).to_pylist()}
    assert out[100]["n_events_w"] == 2
    assert out[100]["sum_value_cents_w"] == 600
    assert out[101]["n_events_w"] == 0 and out[101]["sum_value_cents_w"] == 0


def test_asof_join_orders_only_all_null(ray_session, tmp_path):
    sf = make_events(tmp_path, [])
    make_orders(tmp_path, [(1, 1, 5.0)])
    out = ev.orders_asof_events(sf).to_pylist()
    assert len(out) == 1 and out[0]["asof_event_id"] is None


def test_events_ops_differential_fuzz(ray_session, tmp_path):
    """Random inputs (dense ts/user domains to force ties) vs
    brute-force Python references for sessionize / as-of / range join
    / top-k: the vectorized sweeps must agree exactly."""
    import random

    rng = random.Random(20260817)
    n_users = 12
    ev_rows = []
    for i in range(400):
        ev_rows.append(
            (
                i + 1,
                rng.randrange(1, n_users + 1),
                float(rng.randrange(0, 48 * 60)),  # whole minutes, many ties
                rng.choice(["a", "b"]),
                rng.randrange(0, 2000) / 100.0,
            )
        )
    or_rows = [
        (1000 + j, rng.randrange(1, n_users + 3), float(rng.randrange(0, 48 * 60)))
        for j in range(120)
    ]
    sf = make_events(tmp_path, ev_rows)
    make_orders(tmp_path, or_rows)

    by_user: dict[int, list] = {}
    for eid, uid, mins, et, val in ev_rows:
        by_user.setdefault(uid, []).append((mins, eid, et, val))
    for v in by_user.values():
        v.sort()

    # --- sessionize reference
    want_sess = []
    for uid in sorted(by_user):
        evs = by_user[uid]
        sess, cur = [], [evs[0]]
        for e in evs[1:]:
            if e[0] - cur[-1][0] > 30:
                sess.append(cur)
                cur = [e]
            else:
                cur.append(e)
        sess.append(cur)
        for i, s in enumerate(sess, 1):
            want_sess.append(
                (uid, i, len(s), sum(int(np.floor(x[3] * 100)) for x in s))
            )
    got_sess = [
        (r["user_id"], r["session_idx"], r["n_events"], r["sum_value_cents"])
        for r in ev.events_sessionize(sf).to_pylist()
    ]
    assert got_sess == want_sess

    # --- as-of reference
    got_asof = {r["o_orderkey"]: r for r in ev.orders_asof_events(sf).to_pylist()}
    for ok, ck, mins in or_rows:
        elig = [e for e in by_user.get(ck, []) if e[0] <= mins]
        r = got_asof[ok]
        if not elig:
            assert r["asof_event_id"] is None, ok
        else:
            best = max(elig, key=lambda e: (e[0], e[1]))
            assert r["asof_event_id"] == best[1], ok
            assert r["asof_event_type"] == best[2], ok

    # --- range-join reference (24h trailing window)
    got_rj = {
        r["o_orderkey"]: r
        for r in ev.orders_range_join_events(sf).to_pylist()
    }
    for ok, ck, mins in or_rows:
        win = [
            e for e in by_user.get(ck, [])
            if mins - 24 * 60 < e[0] <= mins
        ]
        r = got_rj[ok]
        assert r["n_events_w"] == len(win), ok
        assert r["sum_value_cents_w"] == sum(
            int(np.floor(e[3] * 100)) for e in win
        ), ok

    # --- top-k reference
    got_tk: dict[int, list] = {}
    for r in ev.events_group_topk(sf, k=3).to_pylist():
        got_tk.setdefault(r["user_id"], []).append(r["event_id"])
    for uid, evs in by_user.items():
        want = [e[1] for e in sorted(evs, key=lambda e: (-e[3], e[1]))[:3]]
        assert got_tk[uid] == want, uid


def test_hll_distinct_users_accuracy(ray_session, tmp_path):
    """The HLL sketch (scale path) must land within 5% of the exact
    distinct count (its SQL-gated sibling is events_window_stats'
    exact distinct)."""
    rows = []
    rng = __import__("random").Random(99)
    true_users = set()
    for i in range(5000):
        u = rng.randrange(1, 1200)
        true_users.add(u)
        rows.append((i + 1, u, float(i % 300), "a", 1.0))
    sf = make_events(tmp_path, rows)
    got = ev.events_distinct_users_hll(sf).column("n_users_approx")[0].as_py()
    exact = len(true_users)
    assert abs(got - exact) / exact < 0.05, (got, exact)


def test_nation_order_stats_broadcast(ray_session, tmp_path):
    """Broadcast-join aggregate with planted customers/nations: orders
    aggregate to their customer's nation without a shuffle."""
    import pyarrow.parquet as pq2

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_name": pa.array(["a", "b", "c"]),
            "c_nationkey": pa.array([10, 10, 20], pa.int64()),
            "c_acctbal": pa.array([0.0, 0.0, 0.0]),
            "c_mktsegment": pa.array(["m"] * 3),
        }
    )
    nat = pa.table(
        {
            "n_nationkey": pa.array([10, 20], pa.int64()),
            "n_name": pa.array(["X", "Y"]),
            "n_regionkey": pa.array([0, 0], pa.int64()),
        }
    )
    pq2.write_table(cust, str(tmp_path / "customer.parquet"))
    pq2.write_table(nat, str(tmp_path / "nation.parquet"))
    make_orders(
        tmp_path, [(100, 1, 1.0), (101, 2, 2.0), (102, 3, 3.0), (103, 1, 4.0)]
    )
    out = {r["n_name"]: r for r in ev.nation_order_stats(str(tmp_path)).to_pylist()}
    assert out["X"]["n_orders"] == 3 and out["Y"]["n_orders"] == 1
    assert out["X"]["sum_price_cents"] == 300  # o_totalprice 1.0 each


def test_window_sliding_membership(ray_session, tmp_path):
    """An event belongs to exactly window/hop hopping windows (fewer
    near the epoch); counts and sums replicate accordingly."""
    # event at minute 30: windows starting at -15, 0, 15, 30; event at
    # minute 70: windows 15, 30, 45, 60 (the w >= 0 guard is for the
    # unix epoch, not the fixture's 2024 base, so -15 is legitimate)
    sf = make_events(
        tmp_path, [(1, 1, 30.0, "a", 1.00), (2, 1, 70.0, "a", 2.00)]
    )
    out = {}
    for r in ev.events_window_sliding(sf).to_pylist():
        w = r["window_start"]
        key = (w - EPOCH).total_seconds() / 60
        out[key] = (r["n_events"], r["sum_value_cents"])
    assert out == {
        -15.0: (1, 100), 0.0: (1, 100), 15.0: (2, 300), 30.0: (2, 300),
        45.0: (1, 200), 60.0: (1, 200),
    }


def test_customer_order_presence_semi_anti(ray_session, tmp_path):
    """Semi/anti join with planted customers: 1 and 3 have orders,
    2 and 4 do not; counts split per segment."""
    import pyarrow.parquet as pq2

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_name": pa.array(["a", "b", "c", "d"]),
            "c_nationkey": pa.array([0, 0, 0, 0], pa.int64()),
            "c_acctbal": pa.array([0.0] * 4),
            "c_mktsegment": pa.array(["M1", "M1", "M2", "M2"]),
        }
    )
    pq2.write_table(cust, str(tmp_path / "customer.parquet"))
    make_orders(tmp_path, [(100, 1, 1.0), (101, 1, 2.0), (102, 3, 3.0)])
    out = {
        r["c_mktsegment"]: r
        for r in ev.customer_order_presence(str(tmp_path)).to_pylist()
    }
    assert out["M1"]["n_customers"] == 2
    assert out["M1"]["n_with_orders"] == 1      # only customer 1
    assert out["M1"]["n_without_orders"] == 1   # customer 2
    assert out["M2"]["n_with_orders"] == 1      # customer 3
    assert out["M2"]["n_without_orders"] == 1   # customer 4


def test_value_quantiles_approx_vs_exact(ray_session, tmp_path):
    """The HDR-histogram sketch must land within its 2^-6 relative
    error bound of the exact sibling at every quantile."""
    rng = np.random.default_rng(17)
    rows = [
        (i + 1, 1, float(i % 100), "a", float(v))
        for i, v in enumerate(rng.gamma(2.0, 150.0, size=4000))
    ]
    sf = make_events(tmp_path, rows)
    exact = {
        r["q"]: r["value_cents"]
        for r in ev.events_value_quantiles(sf).to_pylist()
    }
    approx = {
        r["q"]: r["value_cents_approx"]
        for r in ev.events_value_quantiles_approx(sf).to_pylist()
    }
    for q, v in exact.items():
        assert abs(approx[q] - v) <= max(2, v * 2 ** -6 + 1), (q, v, approx[q])


def test_events_sample_hash_deterministic_membership(ray_session, tmp_path):
    """The hash sample picks exactly the rows whose FNV-1a(decimal
    event_id) % 20 == 0 -- reproducible across runs and block splits."""
    from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64

    rows = [(i, i % 7, float(i), "a", 1.25) for i in range(1, 501)]
    sf = make_events(tmp_path, rows)
    got = ev.events_sample_hash(sf).column("event_id").to_pylist()
    want = [
        i for i in range(1, 501)
        if int(fnv1a_u64([str(i)])[0]) % 20 == 0
    ]
    assert got == want and len(want) > 0
    # second run: byte-identical membership
    assert ev.events_sample_hash(sf).column("event_id").to_pylist() == want


def test_running_total_order_and_segments(ray_session, tmp_path):
    """Cumulative sum restarts per user and follows (ts, event_id)
    order, including a ts tie broken by event_id."""
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "a", 1.00),
            (3, 1, 5.0, "a", 2.00),   # tie on ts with event 2
            (2, 1, 5.0, "a", 4.00),   # same ts, lower id -> earlier
            (4, 2, 1.0, "a", 10.00),
        ],
    )
    out = {r["event_id"]: r["cum_value_cents"]
           for r in ev.events_running_total(sf).to_pylist()}
    assert out[1] == 100
    assert out[2] == 500       # 100 + 400 (event 2 before event 3)
    assert out[3] == 700       # + 200
    assert out[4] == 1000      # user 2 restarts


def test_type_pivot_counts_and_unknown_raises(ray_session, tmp_path):
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "click", 1.00),
            (2, 1, 1.0, "purchase", 2.50),
            (3, 1, 2.0, "purchase", 0.50),
            (4, 2, 3.0, "view", 9.00),
        ],
    )
    out = {r["user_id"]: r for r in ev.events_type_pivot(sf).to_pylist()}
    assert out[1]["n_click"] == 1 and out[1]["n_purchase"] == 2
    assert out[1]["purchase_cents"] == 300
    assert out[1]["n_view"] == 0 and out[2]["n_view"] == 1
    assert out[2]["purchase_cents"] == 0

    import pytest as _pt
    import ray.exceptions

    sf2 = make_events(tmp_path, [(1, 1, 0.0, "mystery", 1.0)])
    with _pt.raises((ValueError, ray.exceptions.RayTaskError)):
        ev.events_type_pivot(sf2)


def test_user_custkey_set_ops_planted(ray_session, tmp_path):
    """Set-op cardinalities with planted keys: events users {1,2,3},
    order custkeys {3,4} -> only_events=2, only_orders=1, both=1."""
    sf = make_events(
        tmp_path,
        [(1, 1, 0.0, "a", 1.0), (2, 2, 1.0, "a", 1.0),
         (3, 3, 2.0, "a", 1.0), (4, 3, 3.0, "a", 1.0)],
    )
    make_orders(tmp_path, [(100, 3, 1.0), (101, 4, 2.0), (102, 4, 3.0)])
    r = ev.user_custkey_set_ops(sf).to_pylist()[0]
    assert r == {"n_only_events": 2, "n_only_orders": 1, "n_both": 1}


def test_events_rollup_levels(ray_session, tmp_path):
    """ROLLUP emits all three grouping levels with NULL markers, and
    the coarser levels are exact sums of the finest."""
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "click", 1.00),   # bucket 1
            (2, 11, 1.0, "click", 2.00),  # bucket 1 (11 % 10)
            (3, 2, 2.0, "click", 4.00),   # bucket 2
            (4, 2, 3.0, "view", 8.00),    # bucket 2
        ],
    )
    rows = ev.events_rollup(sf).to_pylist()
    fine = {(r["event_type"], r["user_bucket"]): r for r in rows
            if r["event_type"] is not None and r["user_bucket"] is not None}
    per_type = {r["event_type"]: r for r in rows
                if r["event_type"] is not None and r["user_bucket"] is None}
    total = [r for r in rows
             if r["event_type"] is None and r["user_bucket"] is None]
    assert fine[("click", 1)]["n_events"] == 2
    assert fine[("click", 1)]["sum_value_cents"] == 300
    assert per_type["click"]["n_events"] == 3
    assert per_type["click"]["sum_value_cents"] == 700
    assert len(total) == 1 and total[0]["n_events"] == 4
    assert total[0]["sum_value_cents"] == 1500


def test_orders_events_join_planted(ray_session, tmp_path):
    # cust 1: 2 orders x 2 events = 4 joined rows; cust 2: 1 x 1;
    # cust 5 (orders only) and user 9 (events only) drop out of the
    # inner join entirely.
    make_events(
        tmp_path,
        [
            (100, 1, 0.0, "a", 1.25),
            (101, 1, 1.0, "a", 0.75),
            (102, 2, 2.0, "a", 2.00),
            (103, 9, 3.0, "a", 5.00),
        ],
    )
    t = pa.table(
        {
            "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
            "o_custkey": pa.array([1, 1, 2, 5], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 4, pa.string()),
            "o_totalprice": pa.array([2.50, 3.00, 4.00, 9.99], pa.float64()),
            "o_orderdate": pa.array([_ts(0)] * 4, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * 4, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = ev.orders_events_join(str(tmp_path)).to_pylist()
    got = [
        (r["o_orderkey"], r["o_custkey"], r["event_id"],
         r["o_total_cents"], r["value_cents"])
        for r in out
    ]
    assert got == [
        (10, 1, 100, 250, 125),
        (10, 1, 101, 250, 75),
        (11, 1, 100, 300, 125),
        (11, 1, 101, 300, 75),
        (12, 2, 102, 400, 200),
    ]


def test_events_global_rank_exact(ray_session, tmp_path):
    # values chosen to straddle histogram bins and include ties (two
    # rows at 3.00 tie-broken by event_id) plus a hot duplicate value
    rows = [
        (1, 1, 0.0, "a", 3.00),
        (2, 1, 1.0, "a", 10.50),
        (3, 2, 2.0, "a", 3.00),
        (4, 2, 3.0, "a", 0.10),
        (5, 3, 4.0, "a", 700.25),
        (6, 3, 5.0, "a", 0.10),
        (7, 4, 6.0, "a", 0.00),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_global_rank(sf).to_pylist()
    got = [(r["rnk"], r["event_id"], r["value_cents"]) for r in out]
    # expected: sort by (cents desc, event_id)
    exp = sorted(
        [(int(v * 100), eid) for eid, _, _, _, v in rows],
        key=lambda t: (-t[0], t[1]),
    )
    assert got == [(i + 1, eid, c) for i, (c, eid) in enumerate(exp)]


def test_events_lag_delta_planted(ray_session, tmp_path):
    # user 1: events at 0s, 90s, 90s (ts tie -> event_id order);
    # user 2: single event -> NULLs
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "a", 1.00),
            (2, 1, 1.5, "a", 2.50),
            (3, 1, 1.5, "a", 2.00),
            (4, 2, 5.0, "b", 8.00),
        ],
    )
    out = {r["event_id"]: r for r in ev.events_lag_delta(sf).to_pylist()}
    assert out[1]["gap_seconds"] is None
    assert out[1]["delta_value_cents"] is None
    assert out[2]["gap_seconds"] == 90 and out[2]["delta_value_cents"] == 150
    assert out[3]["gap_seconds"] == 0 and out[3]["delta_value_cents"] == -50
    assert out[4]["gap_seconds"] is None


def test_events_type_quantiles_disc(ray_session, tmp_path):
    # type a: cents [100, 200, 300, 400] -> p50 = 2nd = 200, p90 = 4th
    # (ceil(0.9*4)=4) = 400; type b: single value
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "a", 1.00),
            (2, 1, 1.0, "a", 2.00),
            (3, 2, 2.0, "a", 3.00),
            (4, 2, 3.0, "a", 4.00),
            (5, 3, 4.0, "b", 7.77),
        ],
    )
    out = {(r["event_type"], r["q"]): r["value_cents"]
           for r in ev.events_type_quantiles(sf).to_pylist()}
    assert out[("a", 0.5)] == 200
    assert out[("a", 0.9)] == 400
    assert out[("b", 0.5)] == 777
    assert out[("b", 0.9)] == 777


def test_orders_events_join_left_nulls(ray_session, tmp_path):
    # cust 5 has an order but no events -> one row with NULL event
    # columns; matched rows identical to the inner join.
    make_events(
        tmp_path,
        [
            (100, 1, 0.0, "a", 1.25),
            (102, 2, 2.0, "a", 2.00),
            (103, 9, 3.0, "a", 5.00),
        ],
    )
    t = pa.table(
        {
            "o_orderkey": pa.array([10, 12, 13], pa.int64()),
            "o_custkey": pa.array([1, 2, 5], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 3, pa.string()),
            "o_totalprice": pa.array([2.50, 4.00, 9.99], pa.float64()),
            "o_orderdate": pa.array([_ts(0)] * 3, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * 3, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = ev.orders_events_join(str(tmp_path), how="left").to_pylist()
    by_key = {r["o_orderkey"]: r for r in out}
    assert len(out) == 3
    assert by_key[10]["event_id"] == 100 and by_key[10]["value_cents"] == 125
    assert by_key[12]["event_id"] == 102
    assert by_key[13]["event_id"] is None
    assert by_key[13]["value_cents"] is None
    assert by_key[13]["o_total_cents"] == 999


def test_new_ops_differential_fuzz(ray_session, tmp_path):
    """Randomized inputs vs brute-force references for the round-3
    additions: shuffle hash join (inner + left), global ROW_NUMBER,
    LAG deltas, per-group quantiles."""
    import random

    rng = random.Random(42)
    n_users = 10
    ev_rows = [
        (
            i + 1,
            rng.randrange(1, n_users + 1),
            float(rng.randrange(0, 600)),  # whole minutes, ties likely
            rng.choice(["a", "b", "c"]),
            rng.randrange(0, 500) / 100.0,  # narrow: force cents ties
        )
        for i in range(300)
    ]
    or_rows = [
        (1000 + j, rng.randrange(1, n_users + 4), float(rng.randrange(0, 600)))
        for j in range(80)
    ]
    sf = make_events(tmp_path, ev_rows)
    make_orders(tmp_path, or_rows)
    cents = {eid: int(np.floor(v * 100)) for eid, _, _, _, v in ev_rows}

    # --- hash join references (o_totalprice fixed at 1.00 by fixture)
    ev_by_user: dict[int, list[int]] = {}
    for eid, uid, _, _, _ in ev_rows:
        ev_by_user.setdefault(uid, []).append(eid)
    want_inner = sorted(
        (ok, ck, eid, 100, cents[eid])
        for ok, ck, _ in or_rows
        for eid in ev_by_user.get(ck, [])
    )
    got_inner = [
        (r["o_orderkey"], r["o_custkey"], r["event_id"],
         r["o_total_cents"], r["value_cents"])
        for r in ev.orders_events_join(sf).to_pylist()
    ]
    assert sorted(got_inner) == want_inner
    want_left = want_inner + sorted(
        (ok, ck, None, 100, None)
        for ok, ck, _ in or_rows
        if ck not in ev_by_user
    )
    got_left = [
        (r["o_orderkey"], r["o_custkey"], r["event_id"],
         r["o_total_cents"], r["value_cents"])
        for r in ev.orders_events_join(sf, how="left").to_pylist()
    ]
    key = lambda t: (t[0], t[2] if t[2] is not None else -1)
    assert sorted(got_left, key=key) == sorted(want_left, key=key)

    # --- global rank reference
    want_rank = sorted(ev_rows, key=lambda r: (-cents[r[0]], r[0]))
    got_rank = ev.events_global_rank(sf).to_pylist()
    assert [r["event_id"] for r in got_rank] == [r[0] for r in want_rank]
    assert [r["rnk"] for r in got_rank] == list(range(1, len(ev_rows) + 1))

    # --- lag reference
    got_lag = {r["event_id"]: r for r in ev.events_lag_delta(sf).to_pylist()}
    by_user: dict[int, list] = {}
    for eid, uid, mins, _, _ in ev_rows:
        by_user.setdefault(uid, []).append((mins, eid))
    for uid, evs in by_user.items():
        evs.sort()
        for i, (mins, eid) in enumerate(evs):
            r = got_lag[eid]
            if i == 0:
                assert r["gap_seconds"] is None and r["delta_value_cents"] is None
            else:
                pm, pe = evs[i - 1]
                assert r["gap_seconds"] == int((mins - pm) * 60), eid
                assert r["delta_value_cents"] == cents[eid] - cents[pe], eid

    # --- grouped quantile reference (disc: smallest elem with
    # cumcount >= ceil(q*n))
    got_q = {(r["event_type"], r["q"]): r["value_cents"]
             for r in ev.events_type_quantiles(sf).to_pylist()}
    by_type: dict[str, list[int]] = {}
    for eid, _, _, et, _ in ev_rows:
        by_type.setdefault(et, []).append(cents[eid])
    for et, vals in by_type.items():
        vals.sort()
        for q in (0.5, 0.9):
            want = vals[max(1, int(np.ceil(q * len(vals)))) - 1]
            assert got_q[(et, q)] == want, (et, q)


def test_hash_join_bloom_prunes_and_matches(ray_session, tmp_path):
    """bloom=True must be bit-identical to bloom=False, and the bloom
    itself must drop definitely-absent probe keys."""
    import numpy as np
    from logminer_kafka_connect_ray.functions.hashing import (
        bloom_block, bloom_probe,
    )

    make_events(
        tmp_path,
        [(100 + i, 1 + i % 20, float(i), "a", i / 7.0) for i in range(60)],
    )
    t = pa.table(
        {
            "o_orderkey": pa.array([10 + j for j in range(15)], pa.int64()),
            "o_custkey": pa.array([1 + (j * 3) % 8 for j in range(15)], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 15, pa.string()),
            "o_totalprice": pa.array([float(j) for j in range(15)], pa.float64()),
            "o_orderdate": pa.array([_ts(0)] * 15, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * 15, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    a = ev.orders_events_join(str(tmp_path), bloom=True)
    b = ev.orders_events_join(str(tmp_path), bloom=False)
    assert a.equals(b)
    al = ev.orders_events_join(str(tmp_path), how="left", bloom=True)
    bl = ev.orders_events_join(str(tmp_path), how="left", bloom=False)
    assert al.equals(bl)
    # direct bloom semantics: no false negatives, absent keys dropped
    w = np.frombuffer(
        bloom_block(pa.array([str(k) for k in range(1, 9)])), np.uint64
    )
    assert bloom_probe(w, pa.array([str(k) for k in range(1, 9)])).all()
    assert not bloom_probe(w, pa.array(["99991", "99992", "99993"])).any()


def test_events_stratified_sample_deterministic(ray_session, tmp_path):
    from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64

    rows = [(i, 1 + i % 3, float(i), ["a", "b"][i % 2], 1.0)
            for i in range(1, 41)]
    sf = make_events(tmp_path, rows)
    out = ev.events_stratified_sample(sf, cap=5).to_pylist()
    # exactly cap rows per present class, ranked 1..cap
    for et in ("a", "b"):
        grp = [r for r in out if r["event_type"] == et]
        assert [r["rnk"] for r in grp] == [1, 2, 3, 4, 5]
        # reference: FNV hash order with event_id tiebreak
        ids = [r[0] for r in rows if r[3] == et]
        h = fnv1a_u64([str(i) for i in ids])
        want = [ids[j] for j in np.lexsort((np.array(ids), h))][:5]
        assert [r["event_id"] for r in grp] == want
    # rerun-stable
    out2 = ev.events_stratified_sample(sf, cap=5).to_pylist()
    assert out == out2


def test_orders_events_join_full_both_sides(ray_session, tmp_path):
    # cust 5: orders only; user 9: events only; cust 1: both
    make_events(
        tmp_path,
        [
            (100, 1, 0.0, "a", 1.25),
            (103, 9, 3.0, "a", 5.00),
        ],
    )
    t = pa.table(
        {
            "o_orderkey": pa.array([10, 13], pa.int64()),
            "o_custkey": pa.array([1, 5], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 2, pa.string()),
            "o_totalprice": pa.array([2.50, 9.99], pa.float64()),
            "o_orderdate": pa.array([_ts(0)] * 2, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * 2, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = ev.orders_events_join(str(tmp_path), how="full").to_pylist()
    assert len(out) == 3
    by_cust = {r["o_custkey"]: r for r in out}
    assert by_cust[1]["o_orderkey"] == 10 and by_cust[1]["event_id"] == 100
    assert by_cust[5]["o_orderkey"] == 13
    assert by_cust[5]["event_id"] is None and by_cust[5]["value_cents"] is None
    assert by_cust[9]["event_id"] == 103
    assert by_cust[9]["o_orderkey"] is None
    assert by_cust[9]["o_total_cents"] is None
    assert by_cust[9]["value_cents"] == 500


def test_events_props_stats_extraction(ray_session, tmp_path):
    rows = [
        (1, 1, 0.0, "a", 1.0),
        (2, 1, 1.0, "a", 1.0),
        (3, 2, 2.0, "b", 1.0),
        (4, 2, 3.0, "b", 1.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([_ts(r[2]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            # one row without k, one negative, whitespace variants
            "props": pa.array(
                ['{"k": 7}', '{"k":-3}', '{"other": 1}', '{ "k" : 10 }'],
                pa.string(),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = {r["event_type"]: r
           for r in ev.events_props_stats(str(tmp_path)).to_pylist()}
    assert out["a"] == {"event_type": "a", "n_events": 2, "n_with_k": 2,
                        "sum_k": 4}
    assert out["b"] == {"event_type": "b", "n_events": 2, "n_with_k": 1,
                        "sum_k": 10}


def test_events_type_moments_exact(ray_session, tmp_path):
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "a", 1.00),   # 100
            (2, 1, 1.0, "a", 2.50),   # 250
            (3, 2, 2.0, "b", 0.10),   # 10
        ],
    )
    out = {r["event_type"]: r for r in ev.events_type_moments(sf).to_pylist()}
    assert out["a"]["n"] == 2
    assert out["a"]["sum_cents"] == 350
    assert out["a"]["sum_sq_cents"] == 100 * 100 + 250 * 250
    assert out["b"] == {"event_type": "b", "n": 1, "sum_cents": 10,
                        "sum_sq_cents": 100}


def test_hash_join_salted_bit_identical(ray_session, tmp_path):
    """salt>1 spreads a hot key over lanes yet produces the identical
    inner-join output; outer joins refuse the salt."""
    import pytest as _pt

    # one HOT user (id 7) with many events + several cold users
    rows = [(i, 7 if i % 2 == 0 else 1 + i % 5, float(i), "a", i / 9.0)
            for i in range(1, 101)]
    make_events(tmp_path, rows)
    t = pa.table(
        {
            "o_orderkey": pa.array(list(range(10, 40)), pa.int64()),
            "o_custkey": pa.array([7 if j % 3 == 0 else 1 + j % 5
                                   for j in range(30)], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 30, pa.string()),
            "o_totalprice": pa.array([float(j) for j in range(30)], pa.float64()),
            "o_orderdate": pa.array([_ts(0)] * 30, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * 30, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    plain = ev.orders_events_join(str(tmp_path), salt=1)
    salted = ev.orders_events_join(str(tmp_path), salt=4)
    assert salted.num_rows == plain.num_rows > 0
    assert salted.equals(plain)  # both sorted by (o_orderkey, event_id)
    with _pt.raises(ValueError, match="salt>1 requires"):
        ev.orders_events_join(str(tmp_path), how="left", salt=4)


def test_events_user_distinct_exact(ray_session, tmp_path):
    """Duplicate (type, user) pairs across and within blocks collapse
    to one; per-type distinct counts match the hand count."""
    rows = [
        (1, 10, 0.0, "click", 1.0),
        (2, 10, 1.0, "click", 1.0),   # dup pair (click, 10)
        (3, 11, 2.0, "click", 1.0),
        (4, 10, 3.0, "view", 1.0),
        (5, 12, 4.0, "view", 1.0),
        (6, 12, 5.0, "view", 1.0),    # dup pair (view, 12)
        (7, 13, 6.0, "buy", 1.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r["n_users"]
           for r in ev.events_user_distinct(sf).to_pylist()}
    assert out == {"click": 2, "view": 2, "buy": 1}


def test_events_user_kmv_distinct_deterministic(ray_session, tmp_path):
    """KMV must equal the single-pass reference computation exactly
    (the estimator is deterministic given the hash fn), cover BOTH
    branches (exact when n_distinct < k, estimated when >= k), and
    the estimate must land within the sketch's error envelope."""
    from logminer_kafka_connect_ray.functions.hashing import fmix64, fnv1a_u64

    k = 64
    rows = []
    # type 'big': 500 distinct users (estimator branch)
    for i in range(500):
        rows.append((len(rows) + 1, 1000 + i, float(i), "big", 1.0))
    # type 'small': 10 distinct users, repeated (exact branch)
    for i in range(30):
        rows.append((len(rows) + 1, 2000 + i % 10, float(i), "small", 1.0))
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r["n_users_kmv"]
           for r in ev.events_user_kmv_distinct(sf, k=k).to_pylist()}

    assert out["small"] == 10  # < k distinct -> exact

    h = np.unique(fmix64(fnv1a_u64([str(1000 + i) for i in range(500)])))
    expect = ((k - 1) << 64) // max(int(h[k - 1]), 1)
    assert out["big"] == expect
    assert abs(out["big"] - 500) / 500 < 0.5  # ~4/sqrt(64) envelope


def test_lineitem_pricing_exact(ray_session, tmp_path):
    """Planted lineitem rows: integer-cents sums per flag/status with
    the shipdate cutoff applied; a row past the cutoff is excluded."""
    t = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", "N"], pa.string()),
            "l_linestatus": pa.array(["F", "F", "O"], pa.string()),
            "l_quantity": pa.array([10.0, 5.0, 2.0], pa.float64()),
            "l_extendedprice": pa.array([100.00, 50.50, 10.00], pa.float64()),
            "l_discount": pa.array([0.05, 0.00, 0.10], pa.float64()),
            "l_tax": pa.array([0.02, 0.08, 0.00], pa.float64()),
            "l_shipdate": pa.array(
                [_ts(0), _ts(1), dt.datetime(2031, 1, 1)], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = ev.lineitem_pricing(str(tmp_path), cutoff="2030-01-01")
    assert out.num_rows == 1  # the N|O row ships after the cutoff
    r = out.to_pylist()[0]
    assert (r["l_returnflag"], r["l_linestatus"]) == ("A", "F")
    assert r["n_rows"] == 2 and r["sum_qty"] == 15
    assert r["sum_base_cents"] == 10000 + 5050
    # disc x100: 10000*(100-5) + 5050*(100-0)
    assert r["sum_disc_cents_x100"] == 10000 * 95 + 5050 * 100
    # charge x10k: disc * (100 + tax_pct)
    assert r["sum_charge_cents_x10k"] == 10000 * 95 * 102 + 5050 * 100 * 108


def test_lineitem_qp_corr_two_limb_exact(ray_session, tmp_path):
    """sum(price_cents^2) larger than int64 reassembles exactly via
    the two-limb partial: 2000 rows at the maximum in-domain price
    (|p| just under isqrt(2^63)) give sum(p^2) ~ 1.8e25 >> 2^63."""
    n = 2000
    price = 30_370_004.98  # floor-cents 3037000498 = isqrt(2^63) - 1
    t = pa.table(
        {
            "l_returnflag": pa.array(["A"] * n + ["R"], pa.string()),
            "l_quantity": pa.array([3.0] * n + [7.0], pa.float64()),
            "l_extendedprice": pa.array(
                [price] * n + [1.00], pa.float64()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = {r["l_returnflag"]: r for r in ev.lineitem_qp_corr(str(tmp_path)).to_pylist()}
    p = 3037000498
    want = n * p * p            # exact python int, ~1.8e25
    assert want > 2**63
    got = (out["A"]["sum_price_sq_hi"] << 62) + out["A"]["sum_price_sq_lo"]
    assert got == want
    assert out["A"]["n"] == n and out["A"]["sum_qty"] == 3 * n
    assert out["A"]["sum_qp_cents"] == 3 * p * n
    assert out["A"]["sum_qty_sq"] == 9 * n
    assert (out["R"]["sum_price_sq_hi"], out["R"]["sum_price_sq_lo"]) == (
        0, 100 * 100,
    )


def test_lineitem_qp_corr_overflow_guard(ray_session, tmp_path):
    t = pa.table(
        {
            "l_returnflag": pa.array(["A"], pa.string()),
            "l_quantity": pa.array([1.0], pa.float64()),
            "l_extendedprice": pa.array([40_000_000.00], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    with pytest.raises(Exception, match=r"overflow int64 in p\^2"):
        ev.lineitem_qp_corr(str(tmp_path))


def test_events_funnel_strict_order(ray_session, tmp_path):
    rows = [
        # user 1: full funnel in order -> stage 3
        (1, 1, 0.0, "signup", 0.0),
        (2, 1, 1.0, "click", 0.0),
        (3, 1, 2.0, "purchase", 0.0),
        # user 2: click BEFORE signup, purchase after signup but no
        # post-signup click -> stage 1
        (4, 2, 0.0, "click", 0.0),
        (5, 2, 1.0, "signup", 0.0),
        (6, 2, 2.0, "purchase", 0.0),
        # user 3: signup then click, purchase between them -> stage 2
        (7, 3, 0.0, "signup", 0.0),
        (8, 3, 1.0, "purchase", 0.0),
        (9, 3, 2.0, "click", 0.0),
        # user 4: never signs up -> stage 0
        (10, 4, 0.0, "click", 0.0),
        (11, 4, 1.0, "purchase", 0.0),
        # user 5: same-ts tiebreak by event_id (signup id 12 < click
        # id 13 at the same minute counts as ordered) -> stage 2
        (12, 5, 0.0, "signup", 0.0),
        (13, 5, 0.0, "click", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["user_id"]: r["funnel_stage"]
           for r in ev.events_funnel(sf).to_pylist()}
    assert out == {1: 3, 2: 1, 3: 2, 4: 0, 5: 2}


def test_events_funnel_differential_fuzz(ray_session, tmp_path):
    """Random event streams (dense ts to force ties) vs a brute-force
    per-user scan: the reduceat funnel must agree exactly."""
    import random

    rng = random.Random(20260818)
    types = ["signup", "click", "purchase", "view", "error"]
    rows = []
    for i in range(600):
        rows.append(
            (i, rng.randrange(15), float(rng.randrange(40)),
             rng.choice(types), 0.0)
        )
    sf = make_events(tmp_path, rows)
    got = {r["user_id"]: r["funnel_stage"]
           for r in ev.events_funnel(sf).to_pylist()}

    by_user = {}
    for eid, uid, minutes, et, _ in rows:
        by_user.setdefault(uid, []).append((minutes, eid, et))
    want = {}
    for uid, evs in by_user.items():
        evs.sort()
        stage, nxt = 0, "signup"
        for _, _, et in evs:
            if stage == 0 and et == "signup":
                stage, nxt = 1, "click"
            elif stage == 1 and et == "click":
                stage, nxt = 2, "purchase"
            elif stage == 2 and et == "purchase":
                stage = 3
                break
        want[uid] = stage
    assert got == want


def test_events_cohort_retention_matrix(ray_session, tmp_path):
    wk = 7 * 24 * 60.0  # minutes per week
    rows = [
        # user 1: first event week 0, active weeks 0, 1, 3 (twice in
        # week 1 -> still one distinct user)
        (1, 1, 0.0, "a", 0.0),
        (2, 1, 1 * wk + 10, "a", 0.0),
        (3, 1, 1 * wk + 20, "a", 0.0),
        (4, 1, 3 * wk, "a", 0.0),
        # user 2: also cohort week 0, active weeks 0 and 1
        (5, 2, 30.0, "a", 0.0),
        (6, 2, 1 * wk + 5, "a", 0.0),
        # user 3: cohort week 2, active week 2 only
        (7, 3, 2 * wk, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {(r["cohort_week"], r["weeks_since"]): r["n_users"]
           for r in ev.events_cohort_retention(sf).to_pylist()}
    # epoch 2024-01-01 lands mid-week; all offsets share its base week
    base = next(k[0] for k in out)
    rel = {(k[0] - base, k[1]): v for k, v in out.items()}
    assert rel == {
        (0, 0): 2, (0, 1): 2, (0, 3): 1, (2, 0): 1,
    }


def test_events_user_path_cap_and_order(ray_session, tmp_path):
    rows = [
        # user 1: 5 events, ts tie between eid 2 and 3 resolved by id
        (1, 1, 0.0, "signup", 0.0),
        (3, 1, 1.0, "view", 0.0),
        (2, 1, 1.0, "click", 0.0),
        (4, 1, 2.0, "purchase", 0.0),
        (5, 1, 3.0, "error", 0.0),
        # user 2: single event
        (6, 2, 0.0, "view", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["user_id"]: r for r in ev.events_user_path(sf, k=3).to_pylist()}
    assert out[1]["path"] == "signup>click>view"      # capped at 3
    assert out[1]["n_events"] == 5                     # count uncapped
    assert out[2]["path"] == "view" and out[2]["n_events"] == 1


def test_events_dedup_window_throttle(ray_session, tmp_path):
    rows = [
        # user 1, type a: 0, 5 (suppressed), 10.0 (gap 5 <= 10:
        # suppressed), 21 (gap 11 > 10: kept)
        (1, 1, 0.0, "a", 0.0),
        (2, 1, 5.0, "a", 0.0),
        (3, 1, 10.0, "a", 0.0),
        (4, 1, 21.0, "a", 0.0),
        # exactly-10-min gap is NOT strictly greater: suppressed
        (5, 1, 31.0, "a", 0.0),
        # same user, different type: independent stream
        (6, 1, 1.0, "b", 0.0),
        # other user, same type: independent stream
        (7, 2, 2.0, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: (r["n_events"], r["n_kept"])
           for r in ev.events_dedup_window(sf).to_pylist()}
    assert out == {"a": (6, 3), "b": (1, 1)}


def test_events_value_quantiles_cont_interpolation(ray_session, tmp_path):
    # cents [100, 200, 300, 400]: n=4, h=(3k)/4
    # k=1: h=0.75 -> m=0, r=3 -> 4*100 + 3*(200-100) = 700
    # k=2: h=1.5  -> m=1, r=2 -> 4*200 + 2*(300-200) = 1000
    # k=3: h=2.25 -> m=2, r=1 -> 4*300 + 1*(400-300) = 1300
    sf = make_events(
        tmp_path,
        [(i, 1, float(i), "a", v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0])],
    )
    out = {r["q_pct"]: r["cont_x4"]
           for r in ev.events_value_quantiles_cont(sf).to_pylist()}
    assert out == {25: 700, 50: 1000, 75: 1300}
    # cross-check vs numpy percentile (x4)
    import numpy as np
    for k in (1, 2, 3):
        assert out[k * 25] == int(
            round(4 * np.percentile([100, 200, 300, 400], k * 25,
                                    method="linear"))
        )


def test_events_cube_grouping_sets(ray_session, tmp_path):
    rows = [
        (1, 10, 0.0, "a", 1.00),   # bucket 0
        (2, 11, 0.0, "a", 2.00),   # bucket 1
        (3, 11, 0.0, "b", 4.00),   # bucket 1
    ]
    sf = make_events(tmp_path, rows)
    out = {(r["event_type"], r["user_bucket"]): (r["n_events"],
                                                 r["sum_value_cents"])
           for r in ev.events_cube(sf).to_pylist()}
    assert out[("a", 0)] == (1, 100)
    assert out[("a", 1)] == (1, 200)
    assert out[("b", 1)] == (1, 400)
    assert out[("a", None)] == (2, 300)      # type marginal
    assert out[("b", None)] == (1, 400)
    assert out[(None, 0)] == (1, 100)        # bucket marginal (CUBE-only)
    assert out[(None, 1)] == (2, 600)
    assert out[(None, None)] == (3, 700)     # grand total
    assert len(out) == 8


def test_events_resample_ffill_gaps(ray_session, tmp_path):
    # type a: events in hours 0 and 3; type b: hour 1 only.
    # global range hours 0..3 -> 4 rows per type, zeros on gaps,
    # cumulative forward-fills through them.
    h = 60.0
    rows = [
        (1, 1, 0.5 * h, "a", 0.0),
        (2, 1, 0.6 * h, "a", 0.0),
        (3, 1, 3.5 * h, "a", 0.0),
        (4, 2, 1.5 * h, "b", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_resample_ffill(sf).to_pylist()
    base = out[0]["hour"]  # epoch hour of 2024-01-01 00:xx
    got = {(r["event_type"], r["hour"] - base): (r["n_events"],
                                                 r["cum_events"])
           for r in out}
    assert got[("a", 0)] == (2, 2)
    assert got[("a", 1)] == (0, 2)   # gap hour: 0 new, cum carried
    assert got[("a", 2)] == (0, 2)
    assert got[("a", 3)] == (1, 3)
    assert got[("b", 0)] == (0, 0)
    assert got[("b", 1)] == (1, 1)
    assert got[("b", 3)] == (0, 1)
    assert len(out) == 8


def test_events_markov_transitions_counts(ray_session, tmp_path):
    rows = [
        # user 1 journey: a > b > a > a  (ts tie at 1.0 broken by id:
        # eid 2 before eid 3)
        (1, 1, 0.0, "a", 0.0),
        (3, 1, 1.0, "a", 0.0),
        (2, 1, 1.0, "b", 0.0),
        (4, 1, 2.0, "a", 0.0),
        # user 2 journey: b > a
        (5, 2, 0.0, "b", 0.0),
        (6, 2, 1.0, "a", 0.0),
        # user 3: single event, no transition
        (7, 3, 0.0, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {(r["src_type"], r["dst_type"]): (r["n_pairs"], r["n_from_src"])
           for r in ev.events_markov_transitions(sf).to_pylist()}
    # user 1 pairs: (a,b), (b,a), (a,a); user 2: (b,a)
    assert out == {
        ("a", "a"): (1, 2),
        ("a", "b"): (1, 2),
        ("b", "a"): (2, 2),
    }


def test_events_ohlc_witness_order(ray_session, tmp_path):
    h = 60.0
    rows = [
        # type a, hour 0: ts tie at 0.2h between eid 2/3 -> open is
        # eid 2's value; close is the max-(ts, eid) witness (eid 4)
        (3, 1, 0.2 * h, "a", 5.00),
        (2, 1, 0.2 * h, "a", 1.00),
        (4, 1, 0.9 * h, "a", 2.00),
        # type a, hour 2 (gap hour 1 emits no bar): single event
        (5, 1, 2.1 * h, "a", 7.50),
        # type b, hour 0
        (6, 2, 0.5 * h, "b", -1.25),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_ohlc(sf).to_pylist()
    base = min(r["hour"] for r in out)
    got = {(r["event_type"], r["hour"] - base):
           (r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["n_events"]) for r in out}
    assert got[("a", 0)] == (100, 500, 100, 200, 3)
    assert got[("a", 2)] == (750, 750, 750, 750, 1)
    # floor(-1.25 * 100) = -125 exactly
    assert got[("b", 0)] == (-125, -125, -125, -125, 1)
    assert len(out) == 3


def test_customer_revenue_topk_q3_semantics(ray_session, tmp_path):
    day = 1440.0
    pq.write_table(
        pa.table(
            {"c_custkey": pa.array([1, 2], pa.int64()),
             "c_name": pa.array(["a", "b"], pa.string()),
             "c_nationkey": pa.array([0, 0], pa.int32()),
             "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
             "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"],
                                      pa.string())}
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([10, 11, 12], pa.int64()),
             "o_custkey": pa.array([1, 1, 2], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 3, pa.string()),
             "o_totalprice": pa.array([1.0] * 3, pa.float64()),
             # order 11 placed AFTER the cutoff -> excluded;
             # order 12 is the wrong segment -> excluded
             "o_orderdate": pa.array([_ts(0), _ts(3 * day), _ts(0)],
                                     pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 3, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    li = {
        "l_orderkey": pa.array([10, 10, 10, 11, 12], pa.int64()),
        "l_extendedprice": pa.array([10.0, 5.0, 99.0, 7.0, 7.0],
                                    pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.0, 0.0], pa.float64()),
        # third item of order 10 shipped BEFORE the cutoff -> excluded
        "l_shipdate": pa.array(
            [_ts(3 * day), _ts(3 * day), _ts(0), _ts(3 * day), _ts(3 * day)],
            pa.timestamp("us"),
        ),
    }
    pq.write_table(pa.table(li), str(tmp_path / "lineitem.parquet"))
    out = ev.customer_revenue_topk(
        str(tmp_path), cutoff="2024-01-02"
    ).to_pylist()
    # only order 10 survives all three predicates; revenue =
    # floor(10*0.9*100) + floor(5*1.0*100) = 900 + 500
    assert [(r["o_orderkey"], r["revenue_cents"]) for r in out] == [(10, 1400)]
    assert out[0]["o_orderdate"] == _ts(0)


def test_part_promo_revenue_months_and_unmatched_part(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"p_partkey": pa.array([0, 1], pa.int64()),
             "p_type": pa.array(["PROMO", "STANDARD"], pa.string())}
        ),
        str(tmp_path / "part.parquet"),
    )
    day = 1440.0
    pq.write_table(
        pa.table(
            {"l_partkey": pa.array([0, 1, 0, 7], pa.int64()),
             # Jan 2024, Jan 2024, Feb 2024, Feb 2024; partkey 7 has
             # NO part row: counted in total, never promo
             "l_shipdate": pa.array(
                 [_ts(0), _ts(day), _ts(32 * day), _ts(33 * day)],
                 pa.timestamp("us"),
             ),
             "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0],
                                         pa.float64()),
             "l_discount": pa.array([0.1, 0.0, 0.0, 0.5], pa.float64())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = ev.part_promo_revenue(str(tmp_path)).to_pylist()
    jan = (2024 - 1970) * 12  # months since 1970-01
    assert [(r["ship_month"], r["promo_cents"], r["total_cents"],
             r["n_items"]) for r in out] == [
        (jan, 900, 2900, 2),        # floor(10*0.9*100)=900; +2000
        (jan + 1, 3000, 5000, 2),   # 3000 promo; +floor(40*0.5*100)
    ]


def test_region_orders_rollup_dimension_chain(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"r_regionkey": pa.array([0, 1], pa.int32()),
             "r_name": pa.array(["ASIA", "EUROPE"], pa.string())}
        ),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {"n_nationkey": pa.array([5, 6], pa.int32()),
             "n_name": pa.array(["JP", "FR"], pa.string()),
             "n_regionkey": pa.array([0, 1], pa.int32())}
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {"c_custkey": pa.array([1, 2, 3], pa.int64()),
             "c_nationkey": pa.array([5, 5, 6], pa.int32())}
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {"o_custkey": pa.array([1, 2, 3, 99], pa.int64()),
             # custkey 99 has no customer row -> dropped (inner join)
             "o_totalprice": pa.array([10.0, 20.5, 40.0, 1000.0],
                                      pa.float64())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = ev.region_orders_rollup(str(tmp_path)).to_pylist()
    assert [(r["r_name"], r["n_orders"], r["sum_total_cents"])
            for r in out] == [("ASIA", 2, 3050), ("EUROPE", 1, 4000)]


def test_events_anomaly_mad_lower_median_and_strict_threshold(
    ray_session, tmp_path
):
    # type a cents: [100, 100, 200, 300, 10000]
    # lower-median (rank ceil(5/2)=3) = 200
    # deviations: [100, 100, 0, 100, 9800] -> sorted [0,100,100,100,9800]
    # MAD (rank 3) = 100; threshold 3*100=300 strict -> only 9800
    rows = [
        (1, 1, 0.0, "a", 1.00),
        (2, 1, 1.0, "a", 1.00),
        (3, 1, 2.0, "a", 2.00),
        (4, 1, 3.0, "a", 3.00),
        (5, 1, 4.0, "a", 100.00),
        # type b: two events; lower-median of [100, 200] (rank 1) = 100
        # deviations [0, 100] -> MAD (rank 1) = 0; any dev > 0 is an
        # outlier under a zero MAD
        (6, 2, 0.0, "b", 1.00),
        (7, 2, 1.0, "b", 2.00),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: (r["median_cents"], r["mad_cents"],
                             r["n_outliers"], r["n_events"])
           for r in ev.events_anomaly_mad(sf).to_pylist()}
    assert out["a"] == (200, 100, 1, 5)
    assert out["b"] == (100, 0, 1, 2)


def test_orders_late_shipment_exists_semantics(ray_session, tmp_path):
    day = 1440.0
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
             "o_custkey": pa.array([1, 1, 1], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 3, pa.string()),
             "o_totalprice": pa.array([1.0] * 3, pa.float64()),
             "o_orderdate": pa.array([_ts(0)] * 3, pa.timestamp("us")),
             "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW"],
                                         pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array([1, 1, 2, 3, 99], pa.int64()),
             # order 1: one on-time (day 10) + one late (day 91) ->
             # late, counted ONCE; order 2: exactly day 90 is NOT
             # strictly greater -> on time; order 3: late; orderkey
             # 99 has no order row -> ignored
             "l_shipdate": pa.array(
                 [_ts(10 * day), _ts(91 * day), _ts(90 * day),
                  _ts(91 * day), _ts(200 * day)],
                 pa.timestamp("us"),
             )}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = ev.orders_late_shipment(str(tmp_path)).to_pylist()
    assert [(r["o_orderpriority"], r["n_orders"], r["n_late"])
            for r in out] == [("1-URGENT", 2, 1), ("5-LOW", 1, 1)]


def test_events_markov_transitions_differential_fuzz(ray_session, tmp_path):
    """Random dense-ts event streams vs a brute-force per-user scan:
    the exchange + neighbor-shift sweep must count identically."""
    import random
    from collections import Counter

    rng = random.Random(20260818)
    types = ["a", "b", "c", "d"]
    rows = [
        (i, rng.randrange(12), float(rng.randrange(30)),
         rng.choice(types), 0.0)
        for i in range(500)
    ]
    sf = make_events(tmp_path, rows)
    got = {(r["src_type"], r["dst_type"]): r["n_pairs"]
           for r in ev.events_markov_transitions(sf).to_pylist()}

    by_user = {}
    for eid, uid, minutes, et, _ in rows:
        by_user.setdefault(uid, []).append((minutes, eid, et))
    want = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, s), (_, _, d) in zip(evs, evs[1:]):
            want[(s, d)] += 1
    assert got == dict(want)


def test_events_ohlc_differential_fuzz(ray_session, tmp_path):
    """Random dense-ts events vs a brute-force pandas reference: the
    witness-key partial combine must resolve open/close identically."""
    import random

    rng = random.Random(20260819)
    types = ["a", "b", "c"]
    rows = [
        (i, rng.randrange(8), float(rng.randrange(300)),
         rng.choice(types), round(rng.uniform(-50, 50), 2))
        for i in range(400)
    ]
    sf = make_events(tmp_path, rows)
    got = {(r["event_type"], r["hour"]):
           (r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["n_events"])
           for r in ev.events_ohlc(sf).to_pylist()}

    import math
    buckets = {}
    for eid, _, minutes, et, val in rows:
        ts_us = int(minutes * 60 * 1_000_000)
        hour = ts_us // 3_600_000_000
        cents = math.floor(val * 100.0)
        buckets.setdefault((et, hour + 473352), []).append(
            (ts_us, eid, cents)
        )  # 473352 = epoch hours of 2024-01-01
    want = {}
    for key, evs in buckets.items():
        evs.sort()
        cents = [c for _, _, c in evs]
        want[key] = (evs[0][2], max(cents), min(cents), evs[-1][2],
                     len(evs))
    assert got == want


def test_events_wau_trailing_distinct(ray_session, tmp_path):
    day = 1440.0
    rows = [
        # user 1 active on days 0 and 1 (two events on day 0: distinct
        # days dedup); user 2 active on day 0 only; user 3 on day 9
        (1, 1, 0.1 * day, "a", 0.0),
        (2, 1, 0.2 * day, "a", 0.0),
        (3, 1, 1.5 * day, "a", 0.0),
        (4, 2, 0.7 * day, "a", 0.0),
        (5, 3, 9.5 * day, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_wau(sf).to_pylist()
    base = out[0]["day"]
    got = {r["day"] - base: (r["dau"], r["wau"]) for r in out}
    # day 0: dau {1,2}; wau {1,2}
    # day 1: dau {1}; wau {1,2}
    # days 2-6: dau 0; wau {1,2} (u1 day1 covers through day 7)
    # day 7: wau {1} (only u1's day-1 activity still in window)
    # day 8: nobody's window covers -> no row
    # day 9: dau {3}; wau {3}; days 10+ trimmed (past last active day)
    assert got == {
        0: (2, 2), 1: (1, 2), 2: (0, 2), 3: (0, 2), 4: (0, 2),
        5: (0, 2), 6: (0, 2), 7: (0, 1), 9: (1, 1),
    }
    assert 8 not in got and max(got) == 9


def test_table_profile_exact_stats(ray_session, tmp_path):
    rows = [
        (1, 10, 0.0, "a", 1.50),
        (2, 10, 1.0, "a", -2.25),   # floor(-225.0) = -225
        (3, 20, 1.0, "b", 1.50),    # duplicate cents with event 1
    ]
    sf = make_events(tmp_path, rows)
    out = {r["column"]: r for r in ev.table_profile(sf).to_pylist()}
    assert out["event_id"]["n_rows"] == 3
    assert out["event_id"]["n_distinct"] == 3
    assert (out["event_id"]["min_num"], out["event_id"]["max_num"]) == (1, 3)
    assert out["user_id"]["n_distinct"] == 2
    assert out["value"]["n_distinct"] == 2          # {150, -225}
    assert out["value"]["min_num"] == -225
    assert out["value"]["max_num"] == 150
    assert out["event_type"]["n_distinct"] == 2
    assert (out["event_type"]["min_str"], out["event_type"]["max_str"]) == (
        "a", "b"
    )
    assert out["event_type"]["min_num"] is None
    assert out["props"]["n_distinct"] == 1          # all "{}"
    assert out["ts"]["n_distinct"] == 2             # two distinct ts
    assert all(r["n_null"] == 0 for r in out.values())


def make_priced_orders(tmp_path, rows):
    """rows: (o_orderkey, price_dollars, day_from_epoch)."""
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [_ts(r[2] * 1440.0) for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_orders_skyline_dominance_and_ties(ray_session, tmp_path):
    base = 19723  # 2024-01-01 in epoch days (EPOCH fixture)
    rows = [
        (1, 5.00, 10),   # frontier: max price
        (2, 5.00, 3),    # same price, older day: dominated by 1
        (3, 3.00, 10),   # equal day, lower price than 1: dominated
        (4, 3.00, 12),   # frontier: newer than everything pricier
        (5, 3.00, 12),   # identical point as 4: same frontier row
        (6, 1.00, 12),   # dominated by 4 (equal day, lower price)
        (7, 1.00, 20),   # frontier: newest overall
        (8, 0.50, 19),   # dominated by 7
    ]
    sf = make_priced_orders(tmp_path, rows)
    out = [
        (r["price_cents"], r["day"] - base, r["n_orders"],
         r["min_orderkey"])
        for r in ev.orders_skyline(sf).to_pylist()
    ]
    assert out == [(500, 10, 1, 1), (300, 12, 2, 4), (100, 20, 1, 7)]


def test_orders_skyline_single_point_duplicates(ray_session, tmp_path):
    # all orders identical: one frontier row carrying every count
    sf = make_priced_orders(tmp_path, [(i, 2.0, 5) for i in range(1, 6)])
    out = ev.orders_skyline(sf).to_pylist()
    assert len(out) == 1
    assert (out[0]["n_orders"], out[0]["min_orderkey"]) == (5, 1)


def test_spread16_bit_interleave():
    x = np.array([0, 1, 0xFFFF, 0b1010], np.int64)
    out = ev._spread16(x)
    assert list(out) == [0, 1, 0x55555555, 0b01000100]


def test_orders_zorder_layout_corners(ray_session, tmp_path):
    # four orders at the corners of the (custkey, day) domain scale
    # to (0,0), (0,65535), (65535,0), (65535,65535): morton codes
    # 0x0, 0xAAAAAAAA, 0x55555555, 0xFFFFFFFF -> buckets 0, 10, 5, 15
    sf = make_orders(
        tmp_path,
        [
            (1, 100, 0.0),            # (min c, min d)
            (2, 100, 63.0 * 1440),    # (min c, max d)
            (3, 500, 0.0),            # (max c, min d)
            (4, 500, 63.0 * 1440),    # (max c, max d)
        ],
    )
    out = {r["zbucket"]: r for r in ev.orders_zorder_layout(sf).to_pylist()}
    assert sorted(out) == [0, 5, 10, 15]
    assert (out[0]["min_z"], out[0]["max_z"]) == (0, 0)
    assert out[10]["min_z"] == 0xAAAAAAAA
    assert out[5]["min_z"] == 0x55555555
    assert out[15]["max_z"] == 0xFFFFFFFF
    assert (out[15]["min_cx"], out[15]["min_dy"]) == (65535, 65535)
    assert all(r["n_orders"] == 1 for r in out.values())


def test_events_frame_agg_trailing_window(ray_session, tmp_path):
    rows = [
        # user 1: cents 100, 300, 200, 500 in ts order
        (1, 1, 0.0, "a", 1.00),
        (2, 1, 1.0, "a", 3.00),
        (3, 1, 2.0, "a", 2.00),
        (4, 1, 3.0, "a", 5.00),
        # user 2: single event
        (5, 2, 0.0, "a", 9.00),
    ]
    sf = make_events(tmp_path, rows)
    out = {
        r["event_id"]: (r["n_in_frame"], r["frame_sum_cents"],
                        r["frame_max_cents"])
        for r in ev.events_frame_agg(sf).to_pylist()
    }
    assert out == {
        1: (1, 100, 100),
        2: (2, 400, 300),
        3: (3, 600, 300),
        4: (3, 1000, 500),   # window slides past event 1
        5: (1, 900, 900),    # frame never crosses users
    }


def test_events_last_touch_attribution(ray_session, tmp_path):
    rows = [
        (1, 1, 0.0, "click", 0.0),
        (2, 1, 1.0, "purchase", 0.0),   # attributed to click
        (3, 1, 2.0, "view", 0.0),
        (4, 1, 3.0, "purchase", 0.0),   # attributed to view
        (5, 2, 0.0, "purchase", 0.0),   # first activity: none
        (6, 2, 1.0, "purchase", 0.0),   # preceding is a purchase: none
        (7, 3, 0.0, "click", 0.0),      # no purchase for user 3
    ]
    sf = make_events(tmp_path, rows)
    out = {
        r["src_event_type"]: r["n_purchases"]
        for r in ev.events_last_touch(sf).to_pylist()
    }
    assert out == {"click": 1, "view": 1, "none": 2}


def test_events_user_cms_overcount_never_under(ray_session, tmp_path):
    # users 0, 13, 26 are probes (% 13 == 0); others add collision mass
    rows = []
    eid = 1
    for uid, n in [(0, 5), (13, 3), (26, 7)] + [(u, 2) for u in range(1, 12)]:
        for _ in range(n):
            rows.append((eid, uid, float(eid), "a", 0.0))
            eid += 1
    sf = make_events(tmp_path, rows)
    out = ev.events_user_cms(sf).to_pylist()
    assert [r["user_id"] for r in out] == [0, 13, 26]
    assert [r["n_events"] for r in out] == [5, 3, 7]
    # CMS never undercounts
    assert all(r["cms_estimate"] >= r["n_events"] for r in out)


def test_events_user_cms_single_user_exact(ray_session, tmp_path):
    sf = make_events(
        tmp_path, [(i, 0, float(i), "a", 0.0) for i in range(1, 9)]
    )
    out = ev.events_user_cms(sf).to_pylist()
    assert out == [{"user_id": 0, "n_events": 8, "cms_estimate": 8}]


def test_events_active_time_interval_union(ray_session, tmp_path):
    rows = [
        (1, 1, 0.0, "a", 0.0),    # [0, 5min)
        (2, 1, 2.0, "a", 0.0),    # [2, 7min): overlaps -> extends to 7
        (3, 1, 10.0, "a", 0.0),   # [10, 15min): disjoint
        (4, 2, 0.0, "a", 0.0),    # single event: exactly 300 s
        (5, 1, 10.0, "a", 0.0),   # duplicate ts: fully covered, adds 0
    ]
    sf = make_events(tmp_path, rows)
    out = {r["user_id"]: r["active_us"] for r in
           ev.events_active_time(sf).to_pylist()}
    assert out == {1: (7 + 5) * 60 * 1_000_000, 2: 300 * 1_000_000}


def test_basket_pair_rules_exact(ray_session, tmp_path):
    """Planted baskets: pair counts dedupe within-basket repeats,
    metrics are exact int ratios, min_pairs filters."""
    # items chosen < 97 so item class == partkey
    rows = [
        # basket 10: items {1, 2, 3} (item 2 repeated -> deduped)
        (10, 1), (10, 2), (10, 2), (10, 3),
        # basket 20: items {1, 2}
        (20, 1), (20, 2),
        # basket 30: items {1, 2}
        (30, 2), (30, 1),
        # basket 40: single item, contributes no pair
        (40, 3),
    ]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = ev.basket_pair_rules(str(tmp_path), min_pairs=1).to_pylist()
    got = {(r["item_a"], r["item_b"]): r for r in out}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    r = got[(1, 2)]
    # pair in baskets 10/20/30; n_1 = 3 baskets, n_2 = 3, N = 4
    assert (r["pair_count"], r["n_a"], r["n_b"]) == (3, 3, 3)
    assert r["support"] == 3 / 4
    assert r["conf_ab"] == 1.0 and r["conf_ba"] == 1.0
    assert r["lift"] == (3 * 4) / (3 * 3)
    assert got[(1, 3)]["pair_count"] == 1
    # min_pairs filter drops singletons
    out2 = ev.basket_pair_rules(str(tmp_path), min_pairs=2).to_pylist()
    assert {(r["item_a"], r["item_b"]) for r in out2} == {(1, 2)}


def test_ntile_bucket_matches_sql_semantics():
    """First n%k buckets get ceil(n/k) rows (SQL NTILE)."""
    # n=10, k=4 -> sizes 3,3,2,2
    r = np.arange(10)
    assert list(ev._ntile_bucket(r, 10, 4)) == [
        1, 1, 1, 2, 2, 2, 3, 3, 4, 4
    ]
    # n=4, k=4 -> one row per bucket
    assert list(ev._ntile_bucket(np.arange(4), 4, 4)) == [1, 2, 3, 4]
    # n=3, k=4 -> buckets 1..3 (no empty bucket in the middle)
    assert list(ev._ntile_bucket(np.arange(3), 3, 4)) == [1, 2, 3]


def test_customer_rfm_segments_planted(ray_session, tmp_path):
    """8 customers with strictly increasing recency / frequency /
    monetary: quartiles are 2-per-bucket and tie-break on custkey."""
    rows = []
    okey = 1
    for ck in range(1, 9):
        # customer ck: ck orders, last at day ck, each 10*ck dollars
        for j in range(ck):
            rows.append((okey, ck, (ck - 1) * 24 * 60.0))
            okey += 1
    sf = make_orders(tmp_path, rows)
    out = {r["custkey"]: r for r in
           ev.customer_rfm_segments(sf).to_pylist()}
    assert len(out) == 8
    # recency: custkey 8 ordered last (r_days=0 -> bucket 1),
    # custkey 1 first (max days -> bucket 4); freq ascends with ck
    assert out[8]["r_days"] == 0 and out[8]["r_quart"] == 1
    assert out[1]["r_quart"] == 4 and out[1]["f_quart"] == 1
    assert out[8]["f_quart"] == 4
    assert [out[ck]["f_quart"] for ck in range(1, 9)] == [
        1, 1, 2, 2, 3, 3, 4, 4
    ]
    # monetary = freq * $1 each (make_orders prices every order 1.0),
    # so m_quart tracks f_quart
    assert all(out[ck]["m_quart"] == out[ck]["f_quart"]
               for ck in range(1, 9))
    assert out[1]["rfm_code"] == 411


def test_events_type_trend_exact(ray_session, tmp_path):
    """Planted perfect line: 100 cents/hour over 3 hourly points gives
    an exact integer slope; a single-point group is degenerate (0/0);
    sufficient statistics match the hand computation."""
    sf = make_events(
        tmp_path,
        [
            (1, 1, 0.0, "a", 1.00),     # x=352, y=100
            (2, 1, 60.0, "a", 2.00),    # x=353, y=200
            (3, 1, 120.0, "a", 3.00),   # x=354, y=300
            (4, 2, 0.0, "b", 5.00),     # lone point -> den=0
        ],
    )
    out = {r["event_type"]: r for r in ev.events_type_trend(sf).to_pylist()}
    a = out["a"]
    assert (a["n"], a["sum_x"], a["sum_y"]) == (3, 1059, 600)
    assert a["sum_xy"] == 352 * 100 + 353 * 200 + 354 * 300
    assert a["sum_xx"] == 352**2 + 353**2 + 354**2
    assert a["slope_e9"] == 100 * 10**9
    assert a["intercept_e6"] == -35_100 * 10**6
    assert out["b"]["slope_e9"] == 0 and out["b"]["intercept_e6"] == 0


def test_events_type_trend_domain_raises(ray_session, tmp_path):
    """Negative cents would break the unsigned limb split -- loud."""
    import pytest as _pt

    sf = make_events(tmp_path, [(1, 1, 0.0, "a", -1.00)])
    with _pt.raises(Exception, match="events_type_trend domain"):
        ev.events_type_trend(sf)


def test_events_user_mode_tie_break(ray_session, tmp_path):
    """Tied counts resolve to the lexicographically smallest type;
    otherwise the max-count type wins."""
    rows = [
        (1, 1, 0.0, "b", 1.0), (2, 1, 1.0, "b", 1.0),
        (3, 1, 2.0, "a", 1.0), (4, 1, 3.0, "a", 1.0),  # tie a/b -> a
        (5, 2, 4.0, "b", 1.0), (6, 2, 5.0, "b", 1.0),
        (7, 2, 6.0, "b", 1.0), (8, 2, 7.0, "a", 1.0),  # b wins 3-1
    ]
    sf = make_events(tmp_path, rows)
    out = {r["user_id"]: (r["mode_type"], r["mode_n"])
           for r in ev.events_user_mode(sf).to_pylist()}
    assert out == {1: ("a", 2), 2: ("b", 3)}


def test_events_hour_chi2_exact(ray_session, tmp_path):
    """2x2 planted contingency with E=2 everywhere: each cell's exact
    contribution is (O-E)^2/E scaled by 1e6."""
    rows = []
    eid = 1
    for hour_min, typ, n in ((0.0, "a", 3), (60.0, "a", 1),
                             (0.0, "b", 1), (60.0, "b", 3)):
        for _ in range(n):
            rows.append((eid, 1, hour_min, typ, 1.0))
            eid += 1
    sf = make_events(tmp_path, rows)
    out = {(r["event_type"], r["hour"]): r["chi2_cell_e6"]
           for r in ev.events_hour_chi2(sf).to_pylist()}
    # (3-2)^2/2 = 0.5 for every cell
    assert out == {("a", 0): 500_000, ("a", 1): 500_000,
                   ("b", 0): 500_000, ("b", 1): 500_000}


def test_events_cooccurrence_window_and_ties(ray_session, tmp_path):
    """Pairs only within the window, same user, (ts, event_id) order:
    simultaneous events pair once in eid order; cross-user and
    out-of-window pairs are excluded."""
    rows = [
        (1, 1, 0.0, "a", 1.0),
        (2, 1, 2.0, "b", 1.0),    # a->b (2 min)
        (3, 1, 2.0, "c", 1.0),    # a->c, b->c (tie: eid 2 < 3)
        (4, 1, 30.0, "a", 1.0),   # outside the 5-min window of all
        (5, 2, 2.0, "b", 1.0),    # other user: no cross pairs
        (6, 1, 31.0, "a", 1.0),   # a->a (1 min after eid 4)
    ]
    sf = make_events(tmp_path, rows)
    out = {(r["type_a"], r["type_b"]): r["n_pairs"]
           for r in ev.events_cooccurrence(sf, window_minutes=5).to_pylist()}
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1,
                   ("a", "a"): 1}


def test_lineitem_weighted_median_exact(ray_session, tmp_path):
    """Planted histogram: median cell is the first whose cumulative
    weight reaches half the total; a heavy low-price row dominates."""
    t = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", "A", "N"], pa.string()),
            "l_quantity": pa.array([6.0, 1.0, 1.0, 2.0], pa.float64()),
            "l_extendedprice": pa.array([1.00, 2.00, 3.00, 9.00],
                                        pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = {r["l_returnflag"]: r
           for r in ev.lineitem_weighted_median(str(tmp_path)).to_pylist()}
    # A: weights 6@100c,1@200c,1@300c -> tot 8, cum(100)=6 >= 4 -> 100
    assert out["A"] == {"l_returnflag": "A", "total_w": 8,
                        "wmedian_cents": 100}
    assert out["N"] == {"l_returnflag": "N", "total_w": 2,
                        "wmedian_cents": 900}


def test_lineitem_melt_long_form(ray_session, tmp_path):
    """Sampled keys melt to exactly 4 rows each with uniform e4
    fixed-point values; unsampled keys are dropped."""
    t = pa.table(
        {
            "l_orderkey": pa.array([31, 32], pa.int64()),
            "l_linenumber": pa.array([1, 1], pa.int32()),
            "l_quantity": pa.array([2.0, 3.0], pa.float64()),
            "l_extendedprice": pa.array([10.50, 1.00], pa.float64()),
            "l_discount": pa.array([0.05, 0.0], pa.float64()),
            "l_tax": pa.array([0.08, 0.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = ev.lineitem_melt(str(tmp_path), one_in=31).to_pylist()
    assert len(out) == 4  # only orderkey 31
    got = {r["measure"]: r["value_e4"] for r in out}
    assert got == {"quantity": 20000, "extendedprice": 105000,
                   "discount": 500, "tax": 800}


def test_events_value_histogram_bins(ray_session, tmp_path):
    """Bin edges: floor(value/50), top bin open at 9."""
    rows = [
        (1, 1, 0.0, "a", 0.01),    # bin 0
        (2, 1, 1.0, "a", 49.99),   # bin 0
        (3, 1, 2.0, "a", 50.0),    # bin 1
        (4, 1, 3.0, "a", 5000.0),  # bin 9 (clamped)
    ]
    sf = make_events(tmp_path, rows)
    out = {(r["event_type"], r["bin"]): r["n_obs"]
           for r in ev.events_value_histogram(sf).to_pylist()}
    assert out == {("a", 0): 2, ("a", 1): 1, ("a", 9): 1}


def test_events_type_gini_exact(ray_session, tmp_path):
    """Hand-checked Gini: equal values -> 0; a planted unequal group
    matches the rank-sum formula computed directly."""
    rows = [
        (1, 1, 0.0, "eq", 2.00), (2, 1, 1.0, "eq", 2.00),
        (3, 1, 2.0, "uneq", 0.00), (4, 1, 3.0, "uneq", 0.00),
        (5, 1, 4.0, "uneq", 10.00),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r for r in ev.events_type_gini(sf).to_pylist()}
    assert out["eq"]["gini_e6"] == 0
    # uneq: sorted cents [0, 0, 1000]; sum(i*x) = 3000, n=3, sumx=1000
    # G = (2*3000 - 4*1000) / (3*1000) = 2000/3000 -> floor(2/3 * 1e6)
    assert out["uneq"] == {"event_type": "uneq", "n": 3,
                           "sum_cents": 1000, "gini_e6": 666_666}


def test_events_hourly_ar1_exact(ray_session, tmp_path):
    """Planted alternating series 2,0,2,0,... has exact phi = -1;
    densified gaps count as zero-hours."""
    rows = []
    eid = 1
    # type 'alt': 2 events at hours 0,2,4; nothing (0) at hours 1,3
    for h in (0, 2, 4):
        for _ in range(2):
            rows.append((eid, 1, h * 60.0, "alt", 1.0))
            eid += 1
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r for r in ev.events_hourly_ar1(sf).to_pylist()}
    a = out["alt"]
    # dense series [2,0,2,0,2]; pairs x=[2,0,2,0], y=[0,2,0,2]
    assert a["m"] == 4 and a["sum_x"] == 4 and a["sum_xy"] == 0
    # phi = (4*0 - 4*4) / (4*8 - 16) = -1
    assert a["phi_e6"] == -1_000_000


def test_customer_decile_lift_exact(ray_session, tmp_path):
    """5 customers into NTILE(10) (degenerate n < k exercises the
    small-bucket branch); responders marked by order existence;
    order-only custkeys ignored."""
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "c_name": pa.array(["a"] * 5, pa.string()),
            "c_nationkey": pa.array([0] * 5, pa.int32()),
            "c_acctbal": pa.array([10.0, 20.0, 30.0, 40.0, 50.0],
                                  pa.float64()),
            "c_mktsegment": pa.array(["s"] * 5, pa.string()),
        }
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    make_orders(tmp_path, [(100, 2, 0.0), (101, 2, 1.0), (102, 5, 2.0),
                           (103, 99, 3.0)])  # 99 is an orphan key
    out = ev.customer_decile_lift(str(tmp_path)).to_pylist()
    # 5 customers, k=10: each lands in its own decile 1..5
    assert [r["decile"] for r in out] == [1, 2, 3, 4, 5]
    assert [r["n_cust"] for r in out] == [1] * 5
    assert [r["n_resp"] for r in out] == [0, 1, 0, 0, 1]
    assert out[1]["resp_rate_e6"] == 1_000_000


def test_customer_large_orders_q18_semantics(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"c_custkey": pa.array([1, 2], pa.int64()),
             "c_name": pa.array(["alice", "bob"], pa.string()),
             "c_nationkey": pa.array([0, 0], pa.int32()),
             "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
             "c_mktsegment": pa.array(["BUILDING"] * 2, pa.string())}
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([10, 11, 12], pa.int64()),
             # order 12's custkey has no customer row -> inner-join drop
             "o_custkey": pa.array([1, 2, 99], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 3, pa.string()),
             "o_totalprice": pa.array([5.0, 9.0, 9.0], pa.float64()),
             "o_orderdate": pa.array([_ts(0)] * 3, pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 3, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array([10, 10, 11, 12], pa.int64()),
             # order 10 totals 7.5 qty = 750 cents > 700; order 11
             # lands exactly ON the threshold -> excluded (strict >)
             "l_quantity": pa.array([5.0, 2.5, 7.0, 8.0], pa.float64())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = ev.customer_large_orders(
        str(tmp_path), threshold_qty_cents=700
    ).to_pylist()
    assert [(r["c_name"], r["o_orderkey"], r["totalprice_cents"],
             r["sum_qty_cents"]) for r in out] == [("alice", 10, 500, 750)]


def test_nation_pair_trade_q7_semantics(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"n_nationkey": pa.array([0, 1], pa.int32()),
             "n_name": pa.array(["ALGERIA", "BRAZIL"], pa.string()),
             "n_regionkey": pa.array([0, 0], pa.int32())}
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {"s_suppkey": pa.array([7], pa.int64()),
             "s_name": pa.array(["s7"], pa.string()),
             "s_nationkey": pa.array([1], pa.int32()),
             "s_acctbal": pa.array([0.0], pa.float64())}
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {"c_custkey": pa.array([1], pa.int64()),
             "c_name": pa.array(["a"], pa.string()),
             "c_nationkey": pa.array([0], pa.int32()),
             "c_acctbal": pa.array([0.0], pa.float64()),
             "c_mktsegment": pa.array(["BUILDING"], pa.string())}
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([10, 11], pa.int64()),
             # order 11's custkey has no customer row -> dropped
             "o_custkey": pa.array([1, 99], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 2, pa.string()),
             "o_totalprice": pa.array([1.0] * 2, pa.float64()),
             "o_orderdate": pa.array([_ts(0)] * 2, pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 2, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    d95 = dt.datetime(1995, 3, 1)
    d96 = dt.datetime(1996, 7, 1)
    d97 = dt.datetime(1997, 1, 1)  # outside [1995, 1996] -> dropped
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array([10, 10, 10, 11], pa.int64()),
             # third item: unknown suppkey -> inner-join drop
             "l_suppkey": pa.array([7, 7, 5, 7], pa.int64()),
             "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0],
                                         pa.float64()),
             "l_discount": pa.array([0.1, 0.0, 0.0, 0.0], pa.float64()),
             "l_shipdate": pa.array([d95, d96, d95, d95],
                                    pa.timestamp("us"))}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = ev.nation_pair_trade(str(tmp_path)).to_pylist()
    assert out == [
        {"supp_nation": "BRAZIL", "cust_nation": "ALGERIA",
         "l_year": 1995, "revenue_cents": 900},
        {"supp_nation": "BRAZIL", "cust_nation": "ALGERIA",
         "l_year": 1996, "revenue_cents": 2000},
    ]


def test_customer_dormant_cohorts_q22_semantics(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
             "c_name": pa.array(["a", "b", "c", "d"], pa.string()),
             "c_nationkey": pa.array([0] * 4, pa.int32()),
             # avg = 25.00: strictly-above keeps 30 and 40 only
             "c_acctbal": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
             "c_mktsegment": pa.array(["AUTO", "AUTO", "AUTO", "BUILD"],
                                      pa.string())}
        ),
        str(tmp_path / "customer.parquet"),
    )
    cutoff = dt.datetime(1998, 6, 1)
    old = dt.datetime(1997, 1, 1)
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([10, 11], pa.int64()),
             # cust 3: only an OLD order -> still dormant;
             # cust 4: an order ON the cutoff day -> active
             "o_custkey": pa.array([3, 4], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 2, pa.string()),
             "o_totalprice": pa.array([1.0] * 2, pa.float64()),
             "o_orderdate": pa.array([old, cutoff], pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 2, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = ev.customer_dormant_cohorts(str(tmp_path)).to_pylist()
    assert out == [{"c_mktsegment": "AUTO", "n_cust": 1,
                    "sum_acctbal_cents": 3000}]


def test_events_cusum_changepoint_semantics(ray_session, tmp_path):
    h = 60.0
    # type a: 5 quiet hours (1 event) then 3 loud hours (4 events);
    # hour 6 is empty -> densified as 0.  T=9 hours (global grid).
    rows = []
    eid = 0
    for hr in range(5):
        eid += 1
        rows.append((eid, 1, (hr + 0.5) * h, "a", 1.0))
    for hr in (5, 7, 8):
        for _ in range(4):
            eid += 1
            rows.append((eid, 1, (hr + 0.5) * h, "a", 1.0))
    sf = make_events(tmp_path, rows)
    out = ev.events_cusum_changepoint(sf).to_pylist()
    assert len(out) == 1
    r = out[0]
    # dense series: [1,1,1,1,1,4,0,4,4], N=17, T=9
    # D_t = 9*cum - (t+1)*17; |D| = [8,16,24,32,40,5,39,10,0] -> t=4
    assert r["n_hours"] == 9 and r["total_events"] == 17
    assert r["d_abs_max"] == 40
    base_hour = r["cp_hour"] - 4
    assert r["cp_hour"] == base_hour + 4
    # tie-break: two equal maxima pick the earliest hour
    rows2 = [(1, 1, 0.5 * h, "b", 1.0), (2, 1, 2.5 * h, "b", 1.0)]
    (tmp_path / "t2").mkdir()
    sf2 = make_events(tmp_path / "t2", rows2)
    out2 = ev.events_cusum_changepoint(sf2).to_pylist()
    # dense [1,0,1], N=2, T=3: D=[1,-1,0] -> |D| ties at t=0 and
    # t=1; the earliest hour (t=0) wins
    assert out2[0]["d_abs_max"] == 1 and out2[0]["n_hours"] == 3
    h0 = int(_ts(0.5 * h).timestamp() * 1_000_000) // 3_600_000_000
    assert out2[0]["cp_hour"] == h0


def test_events_type_hhi_exact(ray_session, tmp_path):
    rows = [
        (1, 1, 0.0, "a", 0.0), (2, 1, 1.0, "a", 0.0),
        (3, 1, 2.0, "a", 0.0), (4, 2, 3.0, "a", 0.0),
        (5, 9, 0.0, "b", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r for r in ev.events_type_hhi(sf).to_pylist()}
    # type a: c = [3, 1], n=4, s2=10 -> hhi = 10/16, eff = 16/10
    assert out["a"]["n_events"] == 4 and out["a"]["n_users"] == 2
    assert out["a"]["hhi_e6"] == 625000
    assert out["a"]["effective_users_e6"] == 1600000
    # singleton type: hhi = 1.0 exactly
    assert out["b"]["hhi_e6"] == 1000000


def test_events_type_jaccard_exact(ray_session, tmp_path):
    rows = [
        # u1: {a, b} (with a duplicated event -> set semantics)
        (1, 1, 0.0, "a", 0.0), (2, 1, 1.0, "a", 0.0), (3, 1, 2.0, "b", 0.0),
        # u2: {a}
        (4, 2, 0.0, "a", 0.0),
        # u3: {a, b, c}
        (5, 3, 0.0, "a", 0.0), (6, 3, 1.0, "b", 0.0), (7, 3, 2.0, "c", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {(r["type_a"], r["type_b"]): r
           for r in ev.events_type_jaccard(sf).to_pylist()}
    # A={1,2,3}, B={1,3}, C={3}
    assert out[("a", "b")]["n_common"] == 2
    assert out[("a", "b")]["jaccard_e6"] == 2 * 10**6 // 3
    assert out[("a", "c")]["jaccard_e6"] == 10**6 // 3
    assert out[("b", "c")]["jaccard_e6"] == 500000
    assert out[("a", "b")]["n_a"] == 3 and out[("a", "b")]["n_b"] == 2
    assert len(out) == 3


def test_nation_revenue_share_having(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"n_nationkey": pa.array([0, 1], pa.int32()),
             "n_name": pa.array(["A", "B"], pa.string()),
             "n_regionkey": pa.array([0, 0], pa.int32())}
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {"s_suppkey": pa.array([1, 2], pa.int64()),
             "s_name": pa.array(["s1", "s2"], pa.string()),
             "s_nationkey": pa.array([0, 1], pa.int32()),
             "s_acctbal": pa.array([0.0, 0.0], pa.float64())}
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array([1, 2, 3], pa.int64()),
             # nation A: 96.00; nation B: 4.00 -> exactly 4% of 100,
             # strict > drops it
             "l_suppkey": pa.array([1, 1, 2], pa.int64()),
             "l_extendedprice": pa.array([90.0, 6.0, 4.0], pa.float64()),
             "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = ev.nation_revenue_share(str(tmp_path)).to_pylist()
    assert out == [{"n_name": "A", "revenue_cents": 9600,
                    "share_e6": 960000}]


def test_customer_order_gaps_lag_semantics(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"c_custkey": pa.array([1, 2], pa.int64()),
             "c_name": pa.array(["a", "b"], pa.string()),
             "c_nationkey": pa.array([0, 0], pa.int32()),
             "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
             "c_mktsegment": pa.array(["AUTO", "AUTO"], pa.string())}
        ),
        str(tmp_path / "customer.parquet"),
    )
    d = dt.datetime
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
             "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 4, pa.string()),
             "o_totalprice": pa.array([1.0] * 4, pa.float64()),
             # cust 1: gaps 3 and 7 days; cust 2: single order, none
             "o_orderdate": pa.array(
                 [d(2024, 1, 1), d(2024, 1, 4), d(2024, 1, 11),
                  d(2024, 5, 1)], pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 4, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = ev.customer_order_gaps(str(tmp_path)).to_pylist()
    assert out == [{"c_mktsegment": "AUTO", "n_gaps": 2,
                    "sum_gap_days": 10, "max_gap_days": 7,
                    "mean_gap_days_e6": 5_000_000}]


def test_events_resample_lerp_semantics(ray_session, tmp_path):
    h = 60.0
    rows = [
        # type a observed at hours 0 (100c) and 3 (400c); hours 1-2
        # interpolate; type b observed only at hour 2 -> edges copy
        (1, 1, 0.5 * h, "a", 1.00),
        (2, 1, 3.5 * h, "a", 4.00),
        (3, 2, 2.5 * h, "b", 9.00),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_resample_lerp(sf).to_pylist()
    base = min(r["hour"] for r in out)
    got = {(r["event_type"], r["hour"] - base):
           (r["value_cents"], r["fill_kind"]) for r in out}
    assert got[("a", 0)] == (100, 0)
    assert got[("a", 1)] == (200, 1)   # 100 + 300*1//3
    assert got[("a", 2)] == (300, 1)
    assert got[("a", 3)] == (400, 0)
    assert got[("b", 2)] == (900, 0)
    assert got[("b", 0)] == (900, 2) and got[("b", 1)] == (900, 2)
    assert got[("b", 3)] == (900, 2)
    assert len(out) == 8

    # descending gap: truncating division toward zero (SQL semantics)
    rows2 = [(1, 1, 0.5 * h, "c", 4.00), (2, 1, 3.5 * h, "c", 0.01)]
    (tmp_path / "t2").mkdir()
    sf2 = make_events(tmp_path / "t2", rows2)
    out2 = ev.events_resample_lerp(sf2).to_pylist()
    base2 = min(r["hour"] for r in out2)
    got2 = {r["hour"] - base2: r["value_cents"] for r in out2}
    # d = 1-400 = -399: h1: 400 - trunc(399*1/3)=400-133=267
    assert got2[1] == 267 and got2[2] == 134 and got2[3] == 1


def test_events_seasonality_profile_exact(ray_session, tmp_path):
    h = 60.0
    # type a: 3 events at hod 0, 1 at hod 1 (next day) -> shares 3/4, 1/4
    rows = [
        (1, 1, 0.1 * h, "a", 0.0), (2, 1, 0.2 * h, "a", 0.0),
        (3, 1, 24.5 * h, "a", 0.0),  # next day, same hod 0
        (4, 1, 1.5 * h, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_seasonality_profile(sf).to_pylist()
    base = int(_ts(0.1 * h).timestamp() * 1_000_000) // 3_600_000_000 % 24
    got = {(r["event_type"], (r["hour_of_day"] - base) % 24): r
           for r in out}
    assert got[("a", 0)]["n_events"] == 3
    assert got[("a", 0)]["share_e6"] == 750000
    assert got[("a", 0)]["index_e6"] == 18_000_000
    assert got[("a", 1)]["share_e6"] == 250000
    assert len(out) == 2


def test_lineitem_fd_check_violations(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
             # key 1: {A, B} -> violation; key 2: {A}; key 3: {C}
             "l_returnflag": pa.array(["A", "B", "A", "A", "A", "C"],
                                      pa.string())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = ev.lineitem_fd_check(str(tmp_path)).to_pylist()
    assert out == [{"n_keys": 3, "n_violating_keys": 1,
                    "n_max_distinct": 2}]


def test_events_user_lifespan_histogram(ray_session, tmp_path):
    day = 1440.0
    rows = [
        # u1: 3-day span; u2: single event -> 0 days; u3: 3-day span
        (1, 1, 0.0, "a", 0.0), (2, 1, 3 * day, "a", 0.0),
        (3, 2, 5.0, "b", 0.0),
        (4, 3, day, "a", 0.0), (5, 3, 4 * day, "b", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_user_lifespan(sf).to_pylist()
    assert out == [{"lifespan_days": 0, "n_users": 1},
                   {"lifespan_days": 3, "n_users": 2}]


def test_orders_open_backlog_running_balance(ray_session, tmp_path):
    d = dt.datetime
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
             "o_custkey": pa.array([1, 1, 1], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 3, pa.string()),
             "o_totalprice": pa.array([1.0] * 3, pa.float64()),
             # opens: Jan, Jan, Feb
             "o_orderdate": pa.array(
                 [d(2024, 1, 5), d(2024, 1, 20), d(2024, 2, 1)],
                 pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 3, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array([1, 1, 2], pa.int64()),
             # order 1 closes at its LAST ship month (Mar, not Jan);
             # order 2 closes Feb; order 3 has no items -> never closes
             "l_shipdate": pa.array(
                 [d(2024, 1, 25), d(2024, 3, 2), d(2024, 2, 10)],
                 pa.timestamp("us"))}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = ev.orders_open_backlog(str(tmp_path)).to_pylist()
    m0 = (2024 - 1970) * 12  # Jan 2024
    assert out == [
        {"month": m0, "n_opened": 2, "n_closed": 0, "backlog": 2},
        {"month": m0 + 1, "n_opened": 1, "n_closed": 1, "backlog": 2},
        {"month": m0 + 2, "n_opened": 0, "n_closed": 1, "backlog": 1},
    ]


def test_events_burstiness_fano(ray_session, tmp_path):
    h = 60.0
    # type a: hours [3, 0, 1] over a 3-hour span (dense grid via
    # type b pinning the global bounds): sx=4, sx2=10, T=3
    rows = [
        (1, 1, 0.1 * h, "a", 0.0), (2, 1, 0.2 * h, "a", 0.0),
        (3, 1, 0.3 * h, "a", 0.0), (4, 1, 2.5 * h, "a", 0.0),
        (5, 2, 0.5 * h, "b", 0.0), (6, 2, 2.9 * h, "b", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r for r in ev.events_burstiness(sf).to_pylist()}
    # fano(a) = (3*10 - 16) / (3*4) = 14/12
    assert out["a"]["sum_x"] == 4 and out["a"]["sum_x2"] == 10
    assert out["a"]["n_hours"] == 3
    assert out["a"]["fano_e6"] == 10**6 * 14 // 12
    # b: one event in each of two hours over T=3: (3*2-4)/(3*2)=1/3
    assert out["b"]["fano_e6"] == 10**6 // 3


def test_events_ma_crossover_golden_and_death(ray_session, tmp_path):
    h = 60.0
    # 16-hour series for type a: 12 quiet hours (1/hr), then a 2-hour
    # burst, then 2 zero hours -> one golden cross when the burst
    # lifts MA(3) above MA(12), one death cross when it drains
    rows = []
    eid = 0
    for hr in range(12):
        eid += 1
        rows.append((eid, 1, (hr + 0.5) * h, "a", 0.0))
    for hr in (12, 13):
        for _ in range(10):
            eid += 1
            rows.append((eid, 1, (hr + 0.5) * h, "a", 0.0))
    eid += 1
    rows.append((eid, 1, 15.5 * h, "a", 0.0))  # pins span to 16 hours
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r
           for r in ev.events_ma_crossover(sf).to_pylist()}
    a = out["a"]
    assert a["n_golden"] >= 1
    assert a["first_cross_hour"] != -1
    # reference: same integer math in pure python
    dense = [1] * 12 + [10, 10, 0, 1]
    sgn, crosses, golden = [], 0, 0
    cs = [0]
    for x in dense:
        cs.append(cs[-1] + x)
    first = -1
    for t in range(11, 16):
        sf_ = cs[t + 1] - cs[t - 2]
        ss_ = cs[t + 1] - cs[t - 11]
        v = sf_ * 12 - ss_ * 3
        sgn.append(0 if v == 0 else (1 if v > 0 else -1))
    ng = nd = 0
    for i in range(1, len(sgn)):
        if sgn[i] > 0 and sgn[i - 1] <= 0:
            ng += 1
            if first == -1:
                first = 11 + i
        elif sgn[i] < 0 and sgn[i - 1] >= 0:
            nd += 1
            if first == -1:
                first = 11 + i
    base = min(r[2] for r in rows) / 60.0  # hours offset of first event
    assert a["n_golden"] == ng and a["n_death"] == nd


def test_orders_yoy_growth_sign_and_gap(ray_session, tmp_path):
    d = dt.datetime
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
             "o_custkey": pa.array([1] * 4, pa.int64()),
             "o_orderstatus": pa.array(["O"] * 4, pa.string()),
             # 2020: 100.00; 2021: 50.00 (-50%); 2023: 80.00 (gap ->
             # no comparison)
             "o_totalprice": pa.array([100.0, 50.0, 80.0, 0.5],
                                      pa.float64()),
             "o_orderdate": pa.array(
                 [d(2020, 6, 1), d(2021, 6, 1), d(2023, 6, 1),
                  d(2023, 7, 1)], pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 4, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = {r["o_year"]: r for r in ev.orders_yoy_growth(str(tmp_path))
           .to_pylist()}
    assert out[2020]["has_prev"] == 0 and out[2020]["yoy_e6"] == 0
    assert out[2021]["has_prev"] == 1
    assert out[2021]["yoy_e6"] == -500000
    assert out[2023]["has_prev"] == 0  # 2022 missing -> gap reset
    assert out[2023]["revenue_cents"] == 8050


def test_region_nation_share_of_parent(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"r_regionkey": pa.array([0, 1], pa.int32()),
             "r_name": pa.array(["EAST", "WEST"], pa.string())}
        ),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {"n_nationkey": pa.array([0, 1, 2], pa.int32()),
             "n_name": pa.array(["N0", "N1", "N2"], pa.string()),
             "n_regionkey": pa.array([0, 0, 1], pa.int32())}
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {"c_custkey": pa.array([1, 2, 3], pa.int64()),
             "c_name": pa.array(["a", "b", "c"], pa.string()),
             "c_nationkey": pa.array([0, 1, 2], pa.int32()),
             "c_acctbal": pa.array([0.0] * 3, pa.float64()),
             "c_mktsegment": pa.array(["S"] * 3, pa.string())}
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
             "o_custkey": pa.array([1, 2, 3], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 3, pa.string()),
             # EAST: N0 75.00 + N1 25.00; WEST: N2 10.00 (100%)
             "o_totalprice": pa.array([75.0, 25.0, 10.0], pa.float64()),
             "o_orderdate": pa.array([_ts(0)] * 3, pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 3, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = ev.region_nation_share(str(tmp_path)).to_pylist()
    assert out == [
        {"r_name": "EAST", "n_name": "N0", "revenue_cents": 7500,
         "share_e6": 750000},
        {"r_name": "EAST", "n_name": "N1", "revenue_cents": 2500,
         "share_e6": 250000},
        {"r_name": "WEST", "n_name": "N2", "revenue_cents": 1000,
         "share_e6": 1000000},
    ]


def test_events_linear_attribution_split(ray_session, tmp_path):
    h = 60.0
    rows = [
        # user 1: view at t=0h, click at t=1h, purchase at t=2h ->
        # 3 touches in the 24h window, each credited 333333
        (1, 1, 0.0 * h, "view", 0.0),
        (2, 1, 1.0 * h, "click", 0.0),
        (3, 1, 2.0 * h, "purchase", 0.0),
        # user 2: stale view 30h before purchase -> excluded; the
        # purchase credits only itself (1e6)
        (4, 2, 0.0 * h, "view", 0.0),
        (5, 2, 30.0 * h, "purchase", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r
           for r in ev.events_linear_attribution(sf).to_pylist()}
    assert out["view"] == {"event_type": "view", "n_touches": 1,
                           "credit_e6": 333333}
    assert out["click"]["credit_e6"] == 333333
    # purchases: user1's (1/3) + user2's (1/1)
    assert out["purchase"]["n_touches"] == 2
    assert out["purchase"]["credit_e6"] == 333333 + 1000000


def test_events_user_count_quantiles_exact(ray_session, tmp_path):
    # 10 users with counts 1..10: P50 = rank 5 -> 5, P90 -> 9,
    # P99 -> rank ceil(9.9)=10 -> 10
    rows = []
    eid = 0
    for u in range(1, 11):
        for _ in range(u):
            eid += 1
            rows.append((eid, u, eid * 1.0, "a", 0.0))
    sf = make_events(tmp_path, rows)
    out = {r["q_e2"]: r["value"]
           for r in ev.events_user_count_quantiles(sf).to_pylist()}
    assert out == {0: 1, 50: 5, 90: 9, 99: 10, 100: 10}


def test_events_user_type_algebra_masks(ray_session, tmp_path):
    rows = [
        # u1: click+purchase, no error -> match
        (1, 1, 0.0, "click", 0.0), (2, 1, 1.0, "purchase", 0.0),
        # u2: click+purchase but ALSO error -> excluded
        (3, 2, 0.0, "click", 0.0), (4, 2, 1.0, "purchase", 0.0),
        (5, 2, 2.0, "error", 0.0),
        # u3: click only -> excluded
        (6, 3, 0.0, "click", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_user_type_algebra(sf).to_pylist()
    assert out == [{"n_users_total": 3, "n_matching": 1,
                    "min_user_id": 1, "max_user_id": 1}]
    # empty-match path: forbid everything
    out2 = ev.events_user_type_algebra(
        sf, need=("click",), forbid=("click",)
    ).to_pylist()
    assert out2[0]["n_matching"] == 0
    assert out2[0]["min_user_id"] == -1


def test_events_session_stats_rollup(ray_session, tmp_path):
    rows = [
        # u1: two sessions -- [0, 10min] (2 events) and [60min] bounce
        (1, 1, 0.0, "a", 0.0), (2, 1, 10.0, "a", 0.0),
        (3, 1, 60.0, "a", 0.0),
        # u2: one bounce session
        (4, 2, 0.0, "b", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_session_stats(sf, gap_minutes=30).to_pylist()[0]
    assert out["n_sessions"] == 3 and out["n_bounce"] == 2
    assert out["bounce_e6"] == 666666
    assert out["sum_duration_us"] == 10 * 60 * 1_000_000
    assert out["max_duration_us"] == 10 * 60 * 1_000_000
    assert out["mean_duration_us"] == 10 * 60 * 1_000_000 // 3


def test_events_gap_histogram_bit_buckets(ray_session, tmp_path):
    us = 1 / 60_000_000  # minutes per microsecond for make_events
    rows = [
        # u1 gaps: 1us (bucket 1), 5us (bucket 3), 0us (bucket 0)
        (1, 1, 0.0, "a", 0.0),
        (2, 1, 1 * us, "a", 0.0),
        (3, 1, 6 * us, "a", 0.0),
        (4, 1, 6 * us, "a", 0.0),
        # u2: single event -> no gap
        (5, 2, 0.0, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["bucket"]: r["n_gaps"]
           for r in ev.events_gap_histogram(sf).to_pylist()}
    assert out == {0: 1, 1: 1, 3: 1}


def test_orders_skyline_layers_onion(ray_session, tmp_path):
    d = dt.datetime
    # points (price, day): staircase with interior points
    prices = [10.0, 9.0, 8.0, 9.5, 7.0, 10.0]
    days = [1, 3, 5, 1, 2, 1]
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array(range(1, 7), pa.int64()),
             "o_custkey": pa.array([1] * 6, pa.int64()),
             "o_orderstatus": pa.array(["O"] * 6, pa.string()),
             "o_totalprice": pa.array(prices, pa.float64()),
             "o_orderdate": pa.array(
                 [d(2024, 1, dd) for dd in days], pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 6, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = ev.orders_skyline_layers(str(tmp_path)).to_pylist()
    got = {(r["price_cents"], r["day"] % 100): r["layer"] for r in out}
    base_day = min(k[1] for k in got)
    rel = {(p, dd - base_day): l for (p, dd), l in got.items()}
    # layer 1 skyline: (1000,0) [2 orders, same point], (900,2),
    # (800,4); layer 2: (950,0), (700,1); nothing remains for 3
    assert rel[(1000, 0)] == 1 and rel[(900, 2)] == 1
    assert rel[(800, 4)] == 1
    assert rel[(950, 0)] == 2 and rel[(700, 1)] == 2
    assert len(rel) == 5
    n = {(r["price_cents"], r["layer"]): r["n_orders"] for r in out}
    assert n[(1000, 1)] == 2  # duplicate point aggregated


def test_events_minmax_normalize_scaling(ray_session, tmp_path):
    rows = [
        (1, 1, 0.0, "a", 1.00), (2, 1, 1.0, "a", 3.00),
        (3, 1, 2.0, "a", 2.00),
        (4, 2, 0.0, "b", 5.00),  # constant type -> z 0
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_id"]: r
           for r in ev.events_minmax_normalize(sf).to_pylist()}
    assert out[1]["z_e6"] == 0
    assert out[2]["z_e6"] == 1_000_000
    assert out[3]["z_e6"] == 500_000
    assert out[4]["z_e6"] == 0 and out[4]["value_cents"] == 500


def test_events_mann_whitney_exact(ray_session, tmp_path):
    rows = [
        # purchase values: 1.00, 3.00; click values: 2.00, 3.00, 0.00
        (1, 1, 0.0, "purchase", 1.00), (2, 1, 1.0, "purchase", 3.00),
        (3, 2, 0.0, "click", 2.00), (4, 2, 1.0, "click", 3.00),
        (5, 2, 2.0, "click", 0.00),
        (6, 3, 0.0, "view", 99.0),  # other types ignored
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_mann_whitney(sf).to_pylist()[0]
    # a>b pairs: (1>0), (3>2), (3>0) = 3; ties: (3,3) = 1
    assert out == {"n_a": 2, "n_b": 3, "u2_a": 2 * 3 + 1,
                   "u2_b": 2 * 2 * 3 - 7}


def test_events_type_cosine2_exact(ray_session, tmp_path):
    rows = [
        # vectors over users (1,2): a = (2,1), b = (1,1), c = (0,3)
        (1, 1, 0.0, "a", 0.0), (2, 1, 1.0, "a", 0.0),
        (3, 2, 0.0, "a", 0.0),
        (4, 1, 0.0, "b", 0.0), (5, 2, 0.0, "b", 0.0),
        (6, 2, 0.0, "c", 0.0), (7, 2, 1.0, "c", 0.0),
        (8, 2, 2.0, "c", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {(r["type_a"], r["type_b"]): r
           for r in ev.events_type_cosine2(sf).to_pylist()}
    # dot(a,b) = 2+1 = 3; |a|^2 = 5, |b|^2 = 2 -> cos2 = 9/10
    ab = out[("a", "b")]
    assert (ab["dot"], ab["norm2_a"], ab["norm2_b"]) == (3, 5, 2)
    assert ab["cos2_e6"] == 900000
    # dot(a,c) = 1*3 = 3; |c|^2 = 9 -> cos2 = 9/45 = 1/5
    assert out[("a", "c")]["cos2_e6"] == 200000
    # dot(b,c) = 3; 9/(2*9) = 1/2
    assert out[("b", "c")]["cos2_e6"] == 500000


def test_events_runs_test_exact(ray_session, tmp_path):
    h = 60.0
    # type a over 6 hours: [5,0,5,0,5,0] -> mean 2.5; above pattern
    # T,F,T,F,T,F -> 6 runs, 3 above, 3 below
    rows = []
    eid = 0
    for hr in (0, 2, 4):
        for _ in range(5):
            eid += 1
            rows.append((eid, 1, (hr + 0.5) * h, "a", 0.0))
    eid += 1
    rows.append((eid, 2, 5.5 * h, "b", 0.0))  # pins span to 6 hours
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r for r in ev.events_runs_test(sf).to_pylist()}
    assert out["a"] == {"event_type": "a", "n_above": 3, "n_below": 3,
                        "n_runs": 6}
    # b: [0,0,0,0,0,1], mean 1/6 -> above only at the last hour
    assert out["b"]["n_above"] == 1 and out["b"]["n_runs"] == 2


def test_events_hourly_acf_lags(ray_session, tmp_path):
    h = 60.0
    # period-2 series for type a over 6 hours: [3,0,3,0,3,0]
    rows = []
    eid = 0
    for hr in (0, 2, 4):
        for _ in range(3):
            eid += 1
            rows.append((eid, 1, (hr + 0.5) * h, "a", 0.0))
    eid += 1
    rows.append((eid, 2, 5.5 * h, "b", 0.0))  # pins span to 6
    sf = make_events(tmp_path, rows)
    out = {(r["event_type"], r["lag"]): r
           for r in ev.events_hourly_acf(sf, lags=(1, 2)).to_pylist()}
    # lag-1 on [3,0,3,0,3,0]: x=[3,0,3,0,3], y=[0,3,0,3,0]
    # m=5 sx=9 sy=6 sxy=0 sxx=27 -> phi = (0-54)/(135-81) = -1
    assert out[("a", 1)]["phi_e6"] == -1_000_000
    # lag-2: x=[3,0,3,0], y=[3,0,3,0] -> phi = +1
    assert out[("a", 2)]["phi_e6"] == 1_000_000
    assert out[("a", 2)]["m"] == 4


def test_events_ks_test_exact(ray_session, tmp_path):
    rows = [
        # purchase: values 1, 2; click: values 2, 3, 3
        (1, 1, 0.0, "purchase", 0.01), (2, 1, 1.0, "purchase", 0.02),
        (3, 2, 0.0, "click", 0.02), (4, 2, 1.0, "click", 0.03),
        (5, 2, 2.0, "click", 0.03),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_ks_test(sf).to_pylist()[0]
    # F_a = [1/2, 1, 1], F_b = [0, 1/3, 1] at v=1,2,3
    # |ca*nb - cb*na| = |1*3-0|=3, |2*3-1*2|=4, |2*3-3*2|=0 -> 4
    assert out == {"n_a": 2, "n_b": 3, "ks_num": 4,
                   "ks_e6": 10**6 * 4 // 6}


def test_events_benford_first_digit(ray_session, tmp_path):
    rows = [
        (1, 1, 0.0, "a", 1.23),    # 123 -> 1
        (2, 1, 1.0, "a", 0.95),    # 95 -> 9
        (3, 1, 2.0, "a", -1.07),   # -107 -> 1 (sign dropped)
        (4, 1, 3.0, "a", 0.0),     # zero excluded
        (5, 1, 4.0, "a", 0.05),    # 5 -> 5
    ]
    sf = make_events(tmp_path, rows)
    out = {r["digit"]: r for r in ev.events_benford(sf).to_pylist()}
    assert out[1]["n"] == 2 and out[1]["share_e6"] == 500000
    assert out[9]["n"] == 1 and out[5]["n"] == 1
    assert len(out) == 3


def test_customer_abc_classes_tie_safe(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array(range(1, 7), pa.int64()),
             # customer revenues: c1=80, c2=10, c3=10 (ties), c4=? no
             "o_custkey": pa.array([1, 1, 2, 3, 4, 5], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 6, pa.string()),
             # c1: 40+40=80; c2: 10; c3: 6; c4: 3; c5: 1 -> R=100
             "o_totalprice": pa.array([40.0, 40.0, 10.0, 6.0, 3.0, 1.0],
                                      pa.float64()),
             "o_orderdate": pa.array([_ts(0)] * 6, pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 6, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = {r["abc_class"]: r
           for r in ev.customer_abc_classes(str(tmp_path)).to_pylist()}
    # above(c1)=0 < 80 -> A; above(c2)=80, 8000 !< 8000 -> B;
    # above(c3)=90 < 95 -> B; above(c4)=96 -> C; above(c5)=99 -> C
    assert out["A"]["n_customers"] == 1
    assert out["A"]["revenue_cents"] == 8000
    assert out["B"]["n_customers"] == 2
    assert out["C"]["n_customers"] == 2
    assert out["C"]["revenue_cents"] == 400


def test_events_share_drift_halves(ray_session, tmp_path):
    rows = [
        # range [0, 100] min -> cut at 50 (inclusive to first half)
        (1, 1, 0.0, "a", 0.0), (2, 1, 50.0, "a", 0.0),
        (3, 1, 60.0, "a", 0.0),
        (4, 2, 40.0, "b", 0.0), (5, 2, 100.0, "b", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r
           for r in ev.events_share_drift(sf).to_pylist()}
    # first half (<= 50): a x2, b x1; second: a x1, b x1
    assert out["a"]["n_first"] == 2 and out["a"]["n_second"] == 1
    assert out["a"]["share_first_e6"] == 666666
    assert out["a"]["share_second_e6"] == 500000
    assert out["a"]["drift_e6"] == 500000 - 666666
    assert out["b"]["drift_e6"] == 500000 - 333333


def test_events_stickiness_dau_mau(ray_session, tmp_path):
    day = 1440.0
    rows = [
        # month 1: u1 active on days 0 and 1, u2 on day 0 ->
        # sum_dau = 2 + 1 = 3, n_active_days = 2, mau = 2
        (1, 1, 0.0, "a", 0.0), (2, 1, 0.5 * day, "a", 0.0),
        (3, 1, 1.0 * day, "a", 0.0),
        (4, 2, 0.2 * day, "a", 0.0),
        # a later month: u3 alone on one day -> stickiness 1.0
        (5, 3, 40 * day, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_stickiness(sf).to_pylist()
    assert len(out) == 2
    m1, m2 = out[0], out[1]
    assert (m1["n_active_days"], m1["sum_dau"], m1["mau"]) == (2, 3, 2)
    assert m1["stickiness_e6"] == 10**6 * 3 // 4
    assert m2["stickiness_e6"] == 10**6


def test_events_peak_concurrency_ties(ray_session, tmp_path):
    rows = [
        # u1 session [0, 10]; u2 session [10, 20] -- the boundary
        # instant 10 counts BOTH (end ties after start); u3 bounce
        # at minute 5 overlaps u1 -> peak 2 at minute 5... and then
        # 2 again at minute 10; earliest peak instant must win
        (1, 1, 0.0, "a", 0.0), (2, 1, 10.0, "a", 0.0),
        (3, 2, 10.0, "a", 0.0), (4, 2, 20.0, "a", 0.0),
        (5, 3, 5.0, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_peak_concurrency(sf).to_pylist()[0]
    assert out["n_sessions"] == 3
    assert out["peak_concurrency"] == 2
    assert out["peak_ts"] == _ts(5.0)


def test_events_spike_hours_trailing_window(ray_session, tmp_path):
    h = 60.0
    # 27 hours of baseline 1 event/hour; spikes of 10 at hours 25,26
    rows = []
    eid = 0
    for hr in range(25):
        eid += 1
        rows.append((eid, 1, (hr + 0.5) * h, "a", 0.0))
    for hr in (25, 26):
        for _ in range(10):
            eid += 1
            rows.append((eid, 1, (hr + 0.5) * h, "a", 0.0))
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r
           for r in ev.events_spike_hours(sf).to_pylist()}
    a = out["a"]
    # hour 24 baseline (1*240 !> 30*24); hour 25 spike (10*240 >
    # 30*24=720); hour 26 spike (trailing sum now 33 -> 2400 > 990)
    assert a["n_spike_hours"] == 2 and a["max_streak"] == 2
    assert a["first_spike_hour"] != -1


def test_referential_integrity_audit_orphans(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"c_custkey": pa.array([1], pa.int64()),
             "c_name": pa.array(["a"], pa.string()),
             "c_nationkey": pa.array([0], pa.int32()),
             "c_acctbal": pa.array([0.0], pa.float64()),
             "c_mktsegment": pa.array(["S"], pa.string())}
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([10, 11], pa.int64()),
             # order 11 -> custkey 9 has no customer row (orphan)
             "o_custkey": pa.array([1, 9], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 2, pa.string()),
             "o_totalprice": pa.array([1.0] * 2, pa.float64()),
             "o_orderdate": pa.array([_ts(0)] * 2, pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 2, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array([10, 10, 99], pa.int64()),
             "l_quantity": pa.array([1.0, 1.0, 1.0], pa.float64())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = {r["relation"]: r for r in
           ev.referential_integrity_audit(str(tmp_path)).to_pylist()}
    o = out["orders.o_custkey->customer"]
    assert (o["n_child_rows"], o["n_orphan_rows"]) == (2, 1)
    li = out["lineitem.l_orderkey->orders"]
    assert (li["n_child_rows"], li["n_orphan_rows"]) == (3, 1)


def test_orders_size_histogram_zero_kept(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
             "o_custkey": pa.array([1] * 3, pa.int64()),
             "o_orderstatus": pa.array(["O"] * 3, pa.string()),
             "o_totalprice": pa.array([1.0] * 3, pa.float64()),
             "o_orderdate": pa.array([_ts(0)] * 3, pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 3, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            # order 1: 2 items; order 2: 1 item; order 3: none;
            # orphan key 99 ignored (orders universe)
            {"l_orderkey": pa.array([1, 1, 2, 99], pa.int64()),
             "l_quantity": pa.array([1.0] * 4, pa.float64())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = ev.orders_size_histogram(str(tmp_path)).to_pylist()
    assert out == [
        {"n_items": 0, "n_orders": 1},
        {"n_items": 1, "n_orders": 1},
        {"n_items": 2, "n_orders": 1},
    ]


def test_events_conversion_latency_buckets(ray_session, tmp_path):
    day = 1440.0
    rows = [
        # u1: first event day 0, first purchase day 2 -> bucket 2
        (1, 1, 0.0, "view", 0.0), (2, 1, 2 * day, "purchase", 0.0),
        (3, 1, 5 * day, "purchase", 0.0),  # later conv ignored
        # u2: purchase IS the first event -> bucket 0
        (4, 2, 0.0, "purchase", 0.0),
        # u3: never converts -> bucket -1
        (5, 3, 0.0, "view", 0.0), (6, 3, 1 * day, "click", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["latency_days"]: r["n_users"]
           for r in ev.events_conversion_latency(sf).to_pylist()}
    assert out == {-1: 1, 0: 1, 2: 1}


def test_orders_diversified_topk_cap(ray_session, tmp_path):
    # customer 1 has the 4 highest orders; cap 2 forces customers
    # 2 and 3 into the answer
    prices = [100.0, 99.0, 98.0, 97.0, 50.0, 40.0]
    custs = [1, 1, 1, 1, 2, 3]
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array(range(1, 7), pa.int64()),
             "o_custkey": pa.array(custs, pa.int64()),
             "o_orderstatus": pa.array(["O"] * 6, pa.string()),
             "o_totalprice": pa.array(prices, pa.float64()),
             "o_orderdate": pa.array([_ts(0)] * 6, pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 6, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = ev.orders_diversified_topk(
        str(tmp_path), k=4, per_cust=2).to_pylist()
    assert [(r["o_orderkey"], r["o_custkey"]) for r in out] == [
        (1, 1), (2, 1), (5, 2), (6, 3)]


def test_customer_ltv_triangle_cohorts(ray_session, tmp_path):
    d = dt.datetime
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array(range(1, 6), pa.int64()),
             # c1: first 2020, orders 2020+2021; c2: first 2021 x2
             "o_custkey": pa.array([1, 1, 2, 2, 1], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 5, pa.string()),
             "o_totalprice": pa.array([10.0, 20.0, 5.0, 7.0, 30.0],
                                      pa.float64()),
             "o_orderdate": pa.array(
                 [d(2020, 1, 1), d(2021, 6, 1), d(2021, 2, 1),
                  d(2021, 9, 1), d(2020, 3, 1)], pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 5, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = {(r["cohort_year"], r["order_year"]): r
           for r in ev.customer_ltv_triangle(str(tmp_path)).to_pylist()}
    assert out[(2020, 2020)]["revenue_cents"] == 4000
    assert out[(2020, 2020)]["n_active_customers"] == 1
    assert out[(2020, 2021)]["revenue_cents"] == 2000
    assert out[(2021, 2021)]["revenue_cents"] == 1200
    assert out[(2021, 2021)]["n_active_customers"] == 1
    assert len(out) == 3


def test_events_tv_distance_exact(ray_session, tmp_path):
    rows = [
        # purchase: {1: 2}; click: {1: 1, 2: 1}
        (1, 1, 0.0, "purchase", 0.01), (2, 1, 1.0, "purchase", 0.01),
        (3, 2, 0.0, "click", 0.01), (4, 2, 1.0, "click", 0.02),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_tv_distance(sf).to_pylist()[0]
    # |2*2-1*2| + |0*2-1*2| = 2 + 2 = 4; TV = 4/(2*2*2) = 1/2
    assert out == {"n_a": 2, "n_b": 2, "tv_num": 4, "tv_e6": 500000}


def test_events_week_heatmap_calendar(ray_session, tmp_path):
    # make_events bases at a fixed timestamp; verify via the same
    # integer calendar math rather than hard-coding the weekday
    rows = [(1, 1, 0.0, "a", 0.0), (2, 1, 24 * 60.0, "a", 0.0),
            (3, 1, 0.0, "a", 0.0)]
    sf = make_events(tmp_path, rows)
    out = ev.events_week_heatmap(sf).to_pylist()
    ts0 = int(_ts(0).timestamp() * 1_000_000)
    dow0 = (ts0 // 86_400_000_000 + 4) % 7
    hod0 = (ts0 // 3_600_000_000) % 24
    got = {(r["dow"], r["hour_of_day"]): r for r in out}
    assert got[(dow0, hod0)]["n_events"] == 2
    assert got[(dow0, hod0)]["share_e6"] == 666666
    assert got[((dow0 + 1) % 7, hod0)]["n_events"] == 1
    assert len(out) == 2


def test_events_type_wjaccard_exact(ray_session, tmp_path):
    rows = [
        # counts over users (1,2): a = (2,1), b = (1,3)
        (1, 1, 0.0, "a", 0.0), (2, 1, 1.0, "a", 0.0),
        (3, 2, 0.0, "a", 0.0),
        (4, 1, 0.0, "b", 0.0),
        (5, 2, 0.0, "b", 0.0), (6, 2, 1.0, "b", 0.0),
        (7, 2, 2.0, "b", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_type_wjaccard(sf).to_pylist()
    assert len(out) == 1
    r = out[0]
    # sum_min = min(2,1) + min(1,3) = 2; T_a=3, T_b=4 -> 2/(7-2)
    assert (r["sum_min"], r["total_a"], r["total_b"]) == (2, 3, 4)
    assert r["wjaccard_e6"] == 10**6 * 2 // 5


def test_events_odds_ratio_cells(ray_session, tmp_path):
    rows = [
        (1, 1, 0.0, "purchase", 0.0), (2, 1, 1.0, "error", 0.0),  # both
        (3, 2, 0.0, "purchase", 0.0),                             # a only
        (4, 3, 0.0, "error", 0.0),                                # b only
        (5, 4, 0.0, "view", 0.0),                                 # neither
        (6, 5, 0.0, "view", 0.0),                                 # neither
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_odds_ratio(sf).to_pylist()[0]
    # OR = (1*2)/(1*1) = 2.0
    assert out == {"n_both": 1, "n_a_only": 1, "n_b_only": 1,
                   "n_neither": 2, "odds_ratio_e6": 2_000_000}


def test_events_churn_rate_weekly(ray_session, tmp_path):
    week = 7 * 1440.0
    rows = [
        # u1 active weeks 0,1,2; u2 active week 0 only; u3 week 1,2
        (1, 1, 0.0, "a", 0.0), (2, 1, 1 * week, "a", 0.0),
        (3, 1, 2 * week, "a", 0.0),
        (4, 2, 0.0, "a", 0.0),
        (5, 3, 1 * week, "a", 0.0), (6, 3, 2 * week, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_churn_rate(sf).to_pylist()
    base = min(r["week"] for r in out)
    got = {r["week"] - base: r for r in out}
    # week 0: active {u1,u2}, churned {u2} -> 1/2
    assert got[0]["n_active"] == 2 and got[0]["n_churned"] == 1
    assert got[0]["churn_e6"] == 500000
    # week 1: active {u1,u3}, both present in week 2 -> 0
    assert got[1]["n_churned"] == 0
    # week 2 (last) emits no row
    assert len(out) == 2


def test_events_winsorized_mean_clamping(ray_session, tmp_path):
    # 10 values 1..9 plus a 1000.00 outlier; p5 -> rank 1 (=1),
    # p95 -> rank ceil(9.5)=10 (=100000 cents? no: value 1000.00 ->
    # 100000 cents is rank 10) -- use 20/80 for a sharper clamp
    rows = [(i, 1, float(i), "a", float(i)) for i in range(1, 10)]
    rows.append((10, 1, 10.0, "a", 1000.0))
    sf = make_events(tmp_path, rows)
    out = ev.events_winsorized_mean(sf, lo_pct=20, hi_pct=80) \
        .to_pylist()[0]
    # cents: [100..900, 100000]; n=10; r_lo=2 -> 200; r_hi=8 -> 800
    assert (out["p_lo"], out["p_hi"]) == (200, 800)
    # clamped: [200,200,300,...,800,800,800] sum = 200*2+300+400+...
    clamped = [200, 200, 300, 400, 500, 600, 700, 800, 800, 800]
    assert out["wmean_e6"] == 10**6 * sum(clamped) // 10


def test_part_supplier_breadth_distincts(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {"p_partkey": pa.array([1, 2, 3], pa.int64()),
             "p_type": pa.array(["PROMO", "PROMO", "STANDARD"],
                                pa.string())}
        ),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            # PROMO: parts {1,2}, suppliers {7,8} (7 twice);
            # STANDARD: part 3, supplier 7; unknown part 99 dropped
            {"l_partkey": pa.array([1, 1, 2, 3, 99], pa.int64()),
             "l_suppkey": pa.array([7, 7, 8, 7, 9], pa.int64()),
             "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0, 5.0],
                                    pa.float64())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = {r["p_type"]: r
           for r in ev.part_supplier_breadth(str(tmp_path)).to_pylist()}
    assert out["PROMO"]["n_suppliers"] == 2
    assert out["PROMO"]["n_parts"] == 2
    assert out["PROMO"]["sum_qty_cents"] == 600
    assert out["STANDARD"]["n_suppliers"] == 1
    assert out["STANDARD"]["sum_qty_cents"] == 400


def test_events_first_touch_mix_witness(ray_session, tmp_path):
    rows = [
        # u1 first = view (ts tie broken by event_id: 1 < 2)
        (1, 1, 0.0, "view", 0.0), (2, 1, 0.0, "click", 0.0),
        # u2 first = signup
        (3, 2, 5.0, "signup", 0.0), (4, 2, 9.0, "view", 0.0),
        # u3 first = view
        (5, 3, 1.0, "view", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["event_type"]: r
           for r in ev.events_first_touch_mix(sf).to_pylist()}
    assert out["view"]["n_users"] == 2
    assert out["signup"]["n_users"] == 1
    assert out["view"]["share_e6"] == 666666
    assert "click" not in out


def test_events_growth_accounting_classes(ray_session, tmp_path):
    week = 7 * 1440.0
    rows = [
        # u1: weeks 0,1,3 -> new@0, retained@1, resurrected@3
        (1, 1, 0.0, "a", 0.0), (2, 1, 1 * week, "a", 0.0),
        (3, 1, 3 * week, "a", 0.0),
        # u2: week 1 only -> new@1
        (4, 2, 1 * week, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_growth_accounting(sf).to_pylist()
    base = min(r["week"] for r in out)
    got = {r["week"] - base: r for r in out}
    assert got[0]["n_new"] == 1
    assert got[1]["n_new"] == 1 and got[1]["n_retained"] == 1
    assert got[3]["n_resurrected"] == 1 and got[3]["n_new"] == 0
    assert len(out) == 3


def test_orders_month_profile_shares(ray_session, tmp_path):
    d = dt.datetime
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
             "o_custkey": pa.array([1] * 3, pa.int64()),
             "o_orderstatus": pa.array(["O"] * 3, pa.string()),
             # Jan: 30.00 (two years pooled), Jul: 10.00
             "o_totalprice": pa.array([10.0, 20.0, 10.0], pa.float64()),
             "o_orderdate": pa.array(
                 [d(2020, 1, 5), d(2021, 1, 9), d(2020, 7, 1)],
                 pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 3, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = {r["month_of_year"]: r
           for r in ev.orders_month_profile(str(tmp_path)).to_pylist()}
    assert out[1]["revenue_cents"] == 3000
    assert out[1]["share_e6"] == 750000
    assert out[7]["share_e6"] == 250000
    assert len(out) == 2


def test_events_power_users_cutoff(ray_session, tmp_path):
    # counts 1..10 over 10 users; p99 rank = ceil(9.9) = 10 -> cutoff
    # is the max count: only user 10 qualifies
    rows = []
    eid = 0
    for u in range(1, 11):
        for _ in range(u):
            eid += 1
            rows.append((eid, u, eid * 1.0, "a", 0.0))
    sf = make_events(tmp_path, rows)
    out = ev.events_power_users(sf).to_pylist()
    assert out == [{"user_id": 10, "n_events": 10}]
    # pct=80: cutoff = count at rank 8 (=8) -> users 8, 9, 10
    out80 = ev.events_power_users(sf, pct=80).to_pylist()
    assert [r["user_id"] for r in out80] == [10, 9, 8]


def test_events_rate_limit_audit_bursts(ray_session, tmp_path):
    m = 1.0
    rows = [
        # u1 minute 0: 4 events (over limit 3); u1 minute 1: 1;
        # u2 minute 0: 2
        (1, 1, 0.1 * m, "a", 0.0), (2, 1, 0.2 * m, "a", 0.0),
        (3, 1, 0.3 * m, "a", 0.0), (4, 1, 0.4 * m, "a", 0.0),
        (5, 1, 1.5 * m, "a", 0.0),
        (6, 2, 0.5 * m, "a", 0.0), (7, 2, 0.6 * m, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = ev.events_rate_limit_audit(sf).to_pylist()[0]
    assert out == {"n_user_minutes": 3, "n_over_limit": 1,
                   "max_per_minute": 4}


def test_orders_split_shipments_distinct_dates(ray_session, tmp_path):
    d = dt.datetime
    pq.write_table(
        pa.table(
            # order 1 ships on 2 dates (one date repeated); order 2
            # single date; order 3 three dates
            {"l_orderkey": pa.array([1, 1, 1, 2, 3, 3, 3], pa.int64()),
             "l_shipdate": pa.array(
                 [d(2024, 1, 1), d(2024, 1, 1), d(2024, 1, 5),
                  d(2024, 2, 1),
                  d(2024, 3, 1), d(2024, 3, 2), d(2024, 3, 3)],
                 pa.timestamp("us"))}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = ev.orders_split_shipments(str(tmp_path)).to_pylist()[0]
    assert out == {"n_orders": 3, "n_split": 2,
                   "split_e6": 666666, "max_ship_dates": 3}


def test_orders_fulfillment_latency_buckets(ray_session, tmp_path):
    d = dt.datetime
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
             "o_custkey": pa.array([1] * 3, pa.int64()),
             "o_orderstatus": pa.array(["O"] * 3, pa.string()),
             "o_totalprice": pa.array([1.0] * 3, pa.float64()),
             "o_orderdate": pa.array(
                 [d(2024, 1, 1), d(2024, 1, 1), d(2024, 1, 1)],
                 pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 3, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            # order 1: first ship day 3 (later day 9 ignored);
            # order 2: same-day; order 3: never ships -> -1
            {"l_orderkey": pa.array([1, 1, 2], pa.int64()),
             "l_shipdate": pa.array(
                 [d(2024, 1, 4), d(2024, 1, 10), d(2024, 1, 1)],
                 pa.timestamp("us"))}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = {r["latency_days"]: r["n_orders"]
           for r in ev.orders_fulfillment_latency(str(tmp_path))
           .to_pylist()}
    assert out == {-1: 1, 0: 1, 3: 1}


def test_events_streak_histogram_islands(ray_session, tmp_path):
    day = 1440.0
    rows = [
        # u1: days 0,1,2 then 5 -> longest 3
        (1, 1, 0.0, "a", 0.0), (2, 1, 1 * day, "a", 0.0),
        (3, 1, 2 * day, "a", 0.0), (4, 1, 5 * day, "a", 0.0),
        # u2: single day -> 1
        (5, 2, 0.0, "a", 0.0),
        # u3: days 3,4 -> 2
        (6, 3, 3 * day, "a", 0.0), (7, 3, 4 * day, "a", 0.0),
    ]
    sf = make_events(tmp_path, rows)
    out = {r["streak_days"]: r["n_users"]
           for r in ev.events_streak_histogram(sf).to_pylist()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_lineitem_tax_incidence_ratio_of_sums(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            # flag A: prices 100, 200 with tax 0.10, 0.05 ->
            # tax cents = 1000, 1000; rate = 2000/30000
            {"l_returnflag": pa.array(["A", "A", "B"], pa.string()),
             "l_extendedprice": pa.array([100.0, 200.0, 50.0],
                                         pa.float64()),
             "l_tax": pa.array([0.10, 0.05, 0.0], pa.float64())}
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = {r["l_returnflag"]: r
           for r in ev.lineitem_tax_incidence(str(tmp_path)).to_pylist()}
    a = out["A"]
    assert (a["sum_price_cents"], a["sum_tax_cents"]) == (30000, 2000)
    assert a["rate_e6"] == 10**6 * 2000 // 30000
    assert out["B"]["rate_e6"] == 0


def test_events_type_corr2_signed(ray_session, tmp_path):
    h = 60.0
    rows = []
    eid = 0
    # a and b perfectly anti-phased over 2 hours: a=[2,0], b=[0,2]
    for _ in range(2):
        eid += 1
        rows.append((eid, 1, 0.5 * h, "a", 0.0))
    for _ in range(2):
        eid += 1
        rows.append((eid, 1, 1.5 * h, "b", 0.0))
    # c tracks a exactly: c=[2,0]
    for _ in range(2):
        eid += 1
        rows.append((eid, 2, 0.5 * h, "c", 0.0))
    sf = make_events(tmp_path, rows)
    out = {(r["type_a"], r["type_b"]): r
           for r in ev.events_type_corr2(sf).to_pylist()}
    assert out[("a", "b")]["sign"] == -1
    assert out[("a", "b")]["corr2_e6"] == 1_000_000
    assert out[("a", "c")]["sign"] == 1
    assert out[("a", "c")]["corr2_e6"] == 1_000_000


def test_customer_quadrants_double_median(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            # balances 10,20,30; med=20. order counts 0,2,1; med=1
            {"c_custkey": pa.array([1, 2, 3], pa.int64()),
             "c_name": pa.array(["a", "b", "c"], pa.string()),
             "c_nationkey": pa.array([0] * 3, pa.int32()),
             "c_acctbal": pa.array([10.0, 20.0, 30.0], pa.float64()),
             "c_mktsegment": pa.array(["S"] * 3, pa.string())}
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
             "o_custkey": pa.array([2, 2, 3], pa.int64()),
             "o_orderstatus": pa.array(["O"] * 3, pa.string()),
             "o_totalprice": pa.array([1.0] * 3, pa.float64()),
             "o_orderdate": pa.array([_ts(0)] * 3, pa.timestamp("us")),
             "o_orderpriority": pa.array(["1"] * 3, pa.string())}
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = {r["quadrant"]: r["n_customers"]
           for r in ev.customer_quadrants(str(tmp_path)).to_pylist()}
    # c1: bal 10<=20, cnt 0<=1 -> ll; c2: 20<=20, 2>1 -> lh;
    # c3: 30>20, 1<=1 -> hl
    assert out == {"ll": 1, "lh": 1, "hl": 1}


def test_events_iqr_outliers_fences(ray_session, tmp_path):
    # values 1..8 plus outliers -100 and 100 -> n=10
    # Q1 = rank ceil(2.5)=3 -> 3rd smallest = 200c; Q3 = rank 8 ->
    # 700c; IQR=500; low fence -550c, high fence 1450c
    vals = [-100.0] + [float(i) for i in range(1, 9)] + [100.0]
    rows = [(i + 1, 1, float(i), "a", v) for i, v in enumerate(vals)]
    sf = make_events(tmp_path, rows)
    out = ev.events_iqr_outliers(sf).to_pylist()[0]
    assert (out["q1"], out["q3"]) == (200, 700)
    assert out["n_low"] == 1   # -10000c < -550c
    assert out["n_high"] == 1  # 10000c > 1450c


def test_events_running_total_sink_digest_and_resume(ray_session, tmp_path):
    # two users interleaved; values chosen so cum sums are distinct
    rows = [
        (1, 7, 0.0, "a", 1.00),
        (2, 8, 1.0, "a", 2.00),
        (3, 7, 2.0, "a", 3.00),
        (4, 8, 3.0, "a", 4.00),
        (5, 7, 4.0, "a", 5.00),
    ]
    sf = make_events(tmp_path, rows)
    out_dir = str(tmp_path / "runtot_sink")
    digest = ev.events_running_total_sink(sf, out_dir=out_dir)
    # sink content == the driver-table variant, row for row
    import os

    import pyarrow.compute as pc

    files = sorted(
        f for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    assert files, "sink wrote no part files"
    sunk = pa.concat_tables(
        [pq.read_table(os.path.join(out_dir, f)) for f in files]
    )
    sunk = sunk.take(pc.sort_indices(sunk, sort_keys=[("event_id", "ascending")]))
    whole = ev.events_running_total(sf)
    assert sunk.equals(whole)
    # digest: user 7 -> bucket 7 (rows 1,3,5; cums 100,400,900),
    # user 8 -> bucket 8 (rows 2,4; cums 200,600)
    d = {r["bucket"]: r for r in digest.to_pylist()}
    assert d[7]["n_rows"] == 3 and d[7]["sum_cum_cents"] == 1400
    assert d[7]["sum_event_id"] == 9
    assert d[8]["n_rows"] == 2 and d[8]["sum_cum_cents"] == 800
    assert d[8]["sum_event_id"] == 6
    # idempotent re-run: existing part files are not rewritten
    mtimes = {f: os.path.getmtime(os.path.join(out_dir, f)) for f in files}
    digest2 = ev.events_running_total_sink(sf, out_dir=out_dir)
    assert digest2.equals(digest)
    for f in files:
        assert os.path.getmtime(os.path.join(out_dir, f)) == mtimes[f]


def test_events_lag_delta_sink_matches_whole(ray_session, tmp_path):
    rows = [
        (1, 7, 0.0, "a", 1.00),
        (2, 8, 1.0, "a", 2.00),
        (3, 7, 2.5, "a", 3.00),
        (4, 8, 3.0, "a", 1.50),
        (5, 7, 4.0, "a", 5.00),
    ]
    sf = make_events(tmp_path, rows)
    out_dir = str(tmp_path / "lag_sink")
    digest = ev.events_lag_delta_sink(sf, out_dir=out_dir)
    import os

    import pyarrow.compute as pc

    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    sunk = pa.concat_tables(
        [pq.read_table(os.path.join(out_dir, f)) for f in files]
    )
    sunk = sunk.take(pc.sort_indices(sunk, sort_keys=[("event_id", "ascending")]))
    whole = ev.events_lag_delta(sf)
    assert sunk.equals(whole)
    d = {r["bucket"]: r for r in digest.to_pylist()}
    # user 7: gaps at rows 3 (150s) and 5 (90s); deltas +200c, +200c
    assert d[7]["n_rows"] == 3
    assert d[7]["sum_gap_seconds"] == 150 + 90
    assert d[7]["sum_delta_cents"] == 200 + 200
    # user 8: one gap 120s, delta -50c
    assert d[8]["sum_gap_seconds"] == 120
    assert d[8]["sum_delta_cents"] == -50
