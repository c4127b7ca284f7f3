"""Changelog compaction (pipelines/compaction.py + fold.fold_to_events).

The invariant under test: for ANY committed history and ANY base state,

    fold_final(base + history) == fold_final(base + compact(history))

where compact = fold_to_events (one replay-equivalent event per key),
plus the encode/decode round-trip that writes the compacted events back
into on-disk change-event form, and an end-to-end run over a
hand-built changelog with rollback / open-tail / delete+reinsert /
set-to-null shapes.  The driver-level gate (cdc_changelog_compaction)
proves the same on the full workload against the DuckDB oracle.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.stages import fold
from logminer_kafka_connect_ray.stages.decode import ChangeDecoder

SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)
DATA_COLS = ["warc_ts", "html", "text", "lang"]


def _flat(rows: list[dict]) -> pa.Table:
    """rows: [{key, scn, op, set: {col: value|None}}] -> flat events.

    ``set`` maps column -> after value (None = explicit SET NULL);
    absent columns are not in the SET mask.  commit_scn = scn (already
    resolved), before images null (the generator's shape).
    """
    flat_schema = schemas.flat_change_schema("url", SCHEMA)
    cols: dict = {f.name: [] for f in flat_schema}
    for r in rows:
        st_ = r.get("set", {})
        mask = 0
        for i, c in enumerate(DATA_COLS):
            mask |= (c in st_) << i
        if r["op"] in ("i", "r"):
            mask = (1 << len(DATA_COLS)) - 1
        if r["op"] == "d":
            mask = 0
        cols["scn"].append(r["scn"])
        cols["row_id"].append(f"R{r['scn']}")
        cols["commit_scn"].append(r.get("commit_scn", r["scn"]))
        cols["tx_id"].append("tx0")
        cols["op"].append(r["op"])
        cols["ts_ms"].append(None)
        cols["table"].append("WEB.PAGES")
        cols["url"].append(r["key"])
        cols["set_mask"].append(mask)
        for c in DATA_COLS:
            cols[f"a_{c}"].append(st_.get(c) if r["op"] != "d" else None)
            cols[f"b_{c}"].append(r.get("before", {}).get(c))
    return pa.table(cols, schema=flat_schema)


def _base(rows: list[dict]) -> pa.Table:
    """[{key, text, ...}] -> base pseudo-events at (commit 1, scn 1)."""
    lake = pa.table(
        {
            "url": pa.array([r["key"] for r in rows], pa.string()),
            "warc_ts": pa.array([r.get("warc_ts") for r in rows],
                                pa.timestamp("us", tz="UTC")),
            "html": pa.array([r.get("html") for r in rows], pa.binary()),
            "text": pa.array([r.get("text") for r in rows], pa.string()),
            "lang": pa.array([r.get("lang") for r in rows], pa.string()),
            "_commit_scn": pa.array([1] * len(rows), pa.int64()),
            "_scn": pa.array([1] * len(rows), pa.int64()),
        }
    )
    return fold.base_as_pseudo_events(lake, SCHEMA, "url")


def _final(base: pa.Table | None, ev: pa.Table) -> pa.Table:
    """fold_final over (base pseudo-events + events), url-sorted."""
    parts = ([base] if base is not None else []) + [ev]
    names = sorted({c for p in parts for c in p.column_names})
    norm = []
    for p in parts:
        cols = {}
        for c in names:
            if c in p.column_names:
                cols[c] = p.column(c)
            else:
                # base pseudo-events lack tx_id/ts_ms/table
                typ = (pa.string() if c in ("tx_id", "table")
                       else pa.timestamp("ms", tz="UTC"))
                cols[c] = pa.nulls(p.num_rows, typ)
        norm.append(pa.table(cols))
    allev = pa.concat_tables(norm, promote_options="permissive")
    out = fold.fold_final(allev, SCHEMA, "url")
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))


def _assert_state_equal(a: pa.Table, b: pa.Table):
    assert a.num_rows == b.num_rows
    for c in ["url"] + DATA_COLS + ["_commit_scn", "_scn"]:
        assert a.column(c).to_pylist() == b.column(c).to_pylist(), c


EDGE_HISTORIES = [
    # update chain on a base key, disjoint + overlapping set masks
    [
        {"key": "k0", "scn": 10, "op": "u", "set": {"text": "t1"}},
        {"key": "k0", "scn": 12, "op": "u", "set": {"lang": "l1"}},
        {"key": "k0", "scn": 14, "op": "u", "set": {"text": "t2"}},
    ],
    # explicit SET NULL must survive compaction (Issue14 semantics)
    [
        {"key": "k0", "scn": 10, "op": "u", "set": {"text": "t1", "lang": None}},
    ],
    # delete then reinsert then partial update
    [
        {"key": "k0", "scn": 10, "op": "d"},
        {"key": "k0", "scn": 12, "op": "i",
         "set": {"text": "new", "lang": "xx", "warc_ts": None, "html": None}},
        {"key": "k0", "scn": 14, "op": "u", "set": {"lang": "yy"}},
    ],
    # final delete folds to a tombstone
    [
        {"key": "k0", "scn": 10, "op": "u", "set": {"text": "t1"}},
        {"key": "k0", "scn": 12, "op": "d"},
    ],
    # delete with trailing overlays: row rebuilt from scratch
    [
        {"key": "k0", "scn": 10, "op": "d"},
        {"key": "k0", "scn": 12, "op": "u", "set": {"text": "t9"},
         "before": {"lang": "carried"}},
    ],
    # update to a key with NO base row (before-image fallback path)
    [
        {"key": "nobase", "scn": 10, "op": "u", "set": {"text": "t1"},
         "before": {"lang": "fb"}},
        {"key": "nobase", "scn": 12, "op": "u", "set": {"html": b"h"}},
    ],
]


@pytest.mark.parametrize("history", EDGE_HISTORIES)
@pytest.mark.parametrize("with_base", [True, False])
def test_fold_to_events_edge_equivalence(history, with_base):
    ev = _flat(history)
    base = _base([{"key": "k0", "text": "base", "lang": "b0"}]) if with_base else None
    compacted = fold.fold_to_events(ev, SCHEMA, "url")
    assert compacted.num_rows == len({r["key"] for r in history})
    _assert_state_equal(_final(base, ev), _final(base, compacted))


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_fold_to_events_random_equivalence(data):
    n_keys = data.draw(st.integers(1, 4))
    keys = [f"k{i}" for i in range(n_keys)]
    n_ev = data.draw(st.integers(1, 12))
    rows = []
    for j in range(n_ev):
        key = data.draw(st.sampled_from(keys))
        op = data.draw(st.sampled_from(["u", "u", "u", "i", "d"]))
        r = {"key": key, "scn": 10 + 2 * j, "op": op}
        if op == "u":
            ncols = data.draw(st.integers(1, 3))
            chosen = data.draw(
                st.lists(st.sampled_from(["text", "lang"]), min_size=ncols,
                         max_size=ncols, unique=True)
                if ncols <= 2 else st.just(["text", "lang"])
            )
            r["set"] = {
                c: data.draw(st.sampled_from([f"v{j}", None])) for c in chosen
            }
            if data.draw(st.booleans()):
                r["before"] = {"lang": f"b{j}"}
        elif op == "i":
            r["set"] = {"text": f"t{j}", "lang": f"l{j}",
                        "warc_ts": None, "html": None}
        rows.append(r)
    ev = _flat(rows)
    base_keys = data.draw(st.lists(st.sampled_from(keys), unique=True))
    base = _base(
        [{"key": k, "text": "base", "lang": "bb"} for k in base_keys]
    ) if base_keys else None
    compacted = fold.fold_to_events(ev, SCHEMA, "url")
    _assert_state_equal(_final(base, ev), _final(base, compacted))


def test_encode_decode_roundtrip():
    """encode_change_events -> ChangeDecoder reproduces the compacted
    flat rows exactly (op, set_mask incl. SET-NULL bits, values)."""
    from logminer_kafka_connect_ray.pipelines.compaction import (
        encode_change_events,
    )

    ev = _flat(
        [
            {"key": "a", "scn": 10, "op": "u",
             "set": {"text": "t", "lang": None}, "before": {"lang": "fb"}},
            {"key": "b", "scn": 12, "op": "i",
             "set": {"text": "x", "lang": "y", "warc_ts": None, "html": b"h"}},
            {"key": "c", "scn": 14, "op": "d"},
        ]
    )
    compacted = fold.fold_to_events(ev, SCHEMA, "url")
    enc = encode_change_events(compacted, SCHEMA, "url")
    assert enc.num_rows == 3
    # pre-resolved: original commit stamps kept, NO_TXN, no markers
    assert set(enc.column("tx_id").to_pylist()) == {schemas.NO_TXN}
    assert enc.column("commit_scn").null_count == 0
    dec = ChangeDecoder(SCHEMA, "url")(enc)
    assert dec.num_rows == 3
    got = dec.take(pc.sort_indices(dec, sort_keys=[("url", "ascending")]))
    want = compacted.take(
        pc.sort_indices(compacted, sort_keys=[("url", "ascending")])
    )
    for c in ("url", "op", "set_mask", "scn", "row_id", "commit_scn",
              "a_text", "a_lang", "a_html", "b_lang"):
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_compact_changelog_end_to_end(ray_session, tmp_path):
    """Hand-built log: committed txn, rolled-back txn, open tail txn.
    Compacted replay over a snapshot == full replay over the same
    snapshot; open/rolled-back events are excluded and accounted."""
    from logminer_kafka_connect_ray.config import EngineConfig
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )
    from logminer_kafka_connect_ray.pipelines.engine import Engine

    ev_schema = schemas.change_event_schema(SCHEMA)
    img = schemas.image_struct(SCHEMA)

    def event(scn, tx, op, key, text=None, lang=None, commit=None):
        after = None if op in ("d", "commit", "rollback") else {
            "url": key, "warc_ts": None, "html": None,
            "text": text, "lang": lang,
        }
        before = {"url": key, "warc_ts": None, "html": None,
                  "text": None, "lang": None} if op == "d" else None
        return {
            "scn": scn, "row_id": f"R{scn}", "commit_scn": commit,
            "tx_id": tx, "op": op, "ts_ms": None,
            "table": "WEB.PAGES", "username": None, "status": 0,
            "before": before, "after": after, "set_cols": None,
        }

    rows = [
        event(10, "t1", "i", "k1", text="one", lang="aa"),
        event(12, "t1", "u", "k1", text="one-v2"),
        event(14, "t1", "u", "k2", lang="zz"),      # base key update
        event(16, "t1", "d", "k3"),                  # base key delete
        event(18, "t2", "i", "kroll", text="never"),  # rolled back
        event(20, "t1", "commit", "", commit=20),
        event(22, "t2", "rollback", "", commit=22),
        event(24, "t3", "i", "kopen", text="still-open"),  # no marker -> carried verbatim
    ]
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    pq.write_table(
        pa.Table.from_pylist(rows, schema=ev_schema),
        os.path.join(log_dir, "batch-000000000010-000000000024.parquet"),
    )
    base = pa.table(
        {
            "url": pa.array(["k2", "k3"], pa.string()),
            "warc_ts": pa.nulls(2, pa.timestamp("us", tz="UTC")),
            "html": pa.nulls(2, pa.binary()),
            "text": pa.array(["b2", "b3"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)

    def replay(lake, changelog):
        eng = Engine(EngineConfig(lake_dir=lake, num_partitions=4))
        eng.snapshot(base_path, 5)
        eng.replay(changelog)
        t = eng.to_arrow(with_meta=True)
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    comp_dir = str(tmp_path / "compacted")
    metrics = compact_changelog(
        EngineConfig(lake_dir=str(tmp_path / "x"), num_partitions=4),
        log_dir, comp_dir, num_files=2,
    )
    assert metrics["events_out"] == 3       # k1 folded, k2, k3
    assert metrics["n_open_rows_carried"] == 1
    assert metrics["n_rolled_back_txns"] == 1
    assert metrics["n_files"] >= 1

    full = replay(str(tmp_path / "lake_full"), log_dir)
    comp = replay(str(tmp_path / "lake_comp"), comp_dir)
    assert full.column("url").to_pylist() == ["k1", "k2"]
    for c in ("url", "text", "lang", "_commit_scn", "_scn"):
        assert full.column(c).to_pylist() == comp.column(c).to_pylist(), c

    # double-compaction is a fixpoint: compacting the compacted log
    # changes nothing but the txn grouping
    comp2_dir = str(tmp_path / "compacted2")
    m2 = compact_changelog(
        EngineConfig(lake_dir=str(tmp_path / "y"), num_partitions=4),
        comp_dir, comp2_dir, num_files=2,
    )
    assert m2["events_out"] == 3
    comp2 = replay(str(tmp_path / "lake_comp2"), comp2_dir)
    for c in ("url", "text", "lang"):
        assert comp2.column(c).to_pylist() == full.column(c).to_pylist(), c


def test_compacted_bootstrap_then_tail_replay(ray_session, tmp_path):
    """The real deployment shape: compact BEHIND a watermark, bootstrap
    a new consumer from snapshot + compacted log, then let it tail the
    ORIGINAL log -- the tail txn (committed after the compaction
    watermark) must apply on top, and the final lake must equal a
    full-history replay bit-for-bit including lineage stamps."""
    from logminer_kafka_connect_ray.config import EngineConfig
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )
    from logminer_kafka_connect_ray.pipelines.engine import Engine

    ev_schema = schemas.change_event_schema(SCHEMA)

    def event(scn, tx, op, key, text=None, lang=None, commit=None):
        after = None if op in ("d", "commit", "rollback") else {
            "url": key, "warc_ts": None, "html": None,
            "text": text, "lang": lang,
        }
        before = {"url": key, "warc_ts": None, "html": None,
                  "text": None, "lang": None} if op == "d" else None
        return {
            "scn": scn, "row_id": f"R{scn}", "commit_scn": commit,
            "tx_id": tx, "op": op, "ts_ms": None,
            "table": "WEB.PAGES", "username": None, "status": 0,
            "before": before, "after": after, "set_cols": None,
        }

    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    file1 = [
        event(10, "t1", "i", "k1", text="one", lang="aa"),
        event(12, "t1", "u", "k1", text="one-v2"),
        event(14, "t1", "u", "k2", lang="zz"),
        event(16, "t1", "commit", "", commit=16),
        # t2 starts before the compaction watermark but commits after
        # it -> OPEN at compaction time, re-read from the tail
        event(18, "t2", "i", "k4", text="late-txn"),
    ]
    file2 = [
        event(22, "t2", "u", "k4", lang="l4"),
        event(24, "t2", "commit", "", commit=24),
        event(26, "t3", "u", "k1", text="one-v3"),
        event(28, "t3", "d", "k2"),
        event(30, "t3", "commit", "", commit=30),
    ]
    pq.write_table(
        pa.Table.from_pylist(file1, schema=ev_schema),
        os.path.join(log_dir, "batch-000000000010-000000000018.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(file2, schema=ev_schema),
        os.path.join(log_dir, "batch-000000000022-000000000030.parquet"),
    )
    base = pa.table(
        {
            "url": pa.array(["k2"], pa.string()),
            "warc_ts": pa.nulls(1, pa.timestamp("us", tz="UTC")),
            "html": pa.nulls(1, pa.binary()),
            "text": pa.array(["b2"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)

    comp_dir = str(tmp_path / "compacted")
    metrics = compact_changelog(
        EngineConfig(lake_dir=str(tmp_path / "x"), num_partitions=4),
        log_dir, comp_dir, num_files=2, scn_hi=18,
    )
    assert metrics["events_out"] == 2           # k1 folded, k2
    assert metrics["n_open_rows_carried"] == 1  # t2's first row, verbatim
    assert os.path.exists(os.path.join(comp_dir, "_compacted.json"))

    def final(lake, *logs):
        eng = Engine(EngineConfig(lake_dir=lake, num_partitions=4))
        eng.snapshot(base_path, 5)
        for lg in logs:
            eng.replay(lg)
        t = eng.to_arrow(with_meta=True)
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    full = final(str(tmp_path / "lake_full"), log_dir)
    boot = final(str(tmp_path / "lake_boot"), comp_dir, log_dir)
    assert full.column("url").to_pylist() == ["k1", "k4"]
    for c in ("url", "text", "lang", "_commit_scn", "_scn"):
        assert full.column(c).to_pylist() == boot.column(c).to_pylist(), c
    # the tail actually applied: k1 at v3, k4 present, k2 deleted
    assert boot.column("text").to_pylist()[0] == "one-v3"


def test_compaction_over_schema_evolution(ray_session, tmp_path):
    """Compact a log that contains a mid-stream column add
    (ChangingTableTest.kt:42-93 shape): the compacted replay must
    carry the evolved schema and match the full replay exactly --
    pre-evolution keys null for the new column, post-evolution values
    folded in."""
    from logminer_kafka_connect_ray.config import EngineConfig
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )
    from logminer_kafka_connect_ray.pipelines.engine import Engine
    from logminer_kafka_connect_ray.testing.gen import (
        ChangeGenConfig,
        gen_changes,
        gen_pages,
        write_event_batches,
    )

    pages = gen_pages(30, seed=31)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(
        pages,
        ChangeGenConfig(
            n_events=300, seed=31, evolution_at_scn=1150, leave_open=0
        ),
    )
    log_dir = str(tmp_path / "log")
    write_event_batches(events, log_dir, events_per_file=80)

    comp_dir = str(tmp_path / "compacted")
    metrics = compact_changelog(
        EngineConfig(lake_dir=str(tmp_path / "x"), num_partitions=4),
        log_dir, comp_dir, num_files=3,
    )
    assert metrics["events_out"] < metrics["events_in"]

    def final(lake, changelog):
        eng = Engine(EngineConfig(lake_dir=lake, num_partitions=4))
        eng.snapshot(pages_path, 999)
        m = eng.replay(changelog)
        t = eng.to_arrow(with_meta=True)
        return m, t.take(
            pc.sort_indices(t, sort_keys=[("url", "ascending")])
        )

    m_full, full = final(str(tmp_path / "lake_full"), log_dir)
    m_comp, comp = final(str(tmp_path / "lake_comp"), comp_dir)
    assert m_full.schema_version >= 1 and m_comp.schema_version >= 1
    assert "fetch_status" in full.column_names
    assert full.column_names == comp.column_names
    for c in full.column_names:
        assert full.column(c).to_pylist() == comp.column(c).to_pylist(), c


def test_streaming_bootstrap_from_compacted_log(ray_session, tmp_path):
    """A STREAMING consumer can bootstrap from a compacted log: the
    pre-resolved NO_TXN events auto-release with their ORIGINAL commit
    stamps (never buffered as open txns), and the streamed state
    equals the batch full-history replay."""
    from logminer_kafka_connect_ray.config import EngineConfig
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )
    from logminer_kafka_connect_ray.pipelines.engine import Engine
    from logminer_kafka_connect_ray.pipelines.streaming import (
        StreamingEngine,
    )
    from logminer_kafka_connect_ray.testing.gen import (
        ChangeGenConfig,
        gen_changes,
        gen_pages,
        write_event_batches,
    )

    pages = gen_pages(30, seed=33)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=300, seed=33, leave_open=0)
    )
    log_dir = str(tmp_path / "log")
    write_event_batches(events, log_dir, events_per_file=80)
    comp_dir = str(tmp_path / "compacted")
    compact_changelog(
        EngineConfig(lake_dir=str(tmp_path / "x"), num_partitions=4),
        log_dir, comp_dir, num_files=3,
    )

    eng_b = Engine(EngineConfig(lake_dir=str(tmp_path / "lake_b"),
                                num_partitions=4))
    eng_b.snapshot(pages_path, 999)
    eng_b.replay(log_dir)

    eng_s = Engine(EngineConfig(lake_dir=str(tmp_path / "lake_s"),
                                num_partitions=4))
    eng_s.snapshot(pages_path, 999)
    stream = StreamingEngine(eng_s, comp_dir, num_shards=2,
                             poll_interval=0.01)
    stream.run(max_polls=5)
    # nothing held open: every compacted event is pre-resolved
    assert stream.min_open_scn() is None
    stream.shutdown()

    def sorted_tbl(eng):
        t = eng.to_arrow(with_meta=True)
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    full, streamed = sorted_tbl(eng_b), sorted_tbl(eng_s)
    assert full.num_rows == streamed.num_rows
    for c in full.column_names:
        assert full.column(c).to_pylist() == streamed.column(c).to_pylist(), c


def test_compaction_respects_table_whitelist(ray_session, tmp_path):
    """A MIXED two-table log compacts per table: the whitelist keeps
    only the target table's events (the other table's are dropped like
    the engine's own decode filter does), and replaying the compacted
    log reproduces the whitelisted replay of the full log."""
    from logminer_kafka_connect_ray.config import EngineConfig
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )
    from logminer_kafka_connect_ray.pipelines.engine import Engine

    ev_schema = schemas.change_event_schema(SCHEMA)

    def event(scn, tx, op, key, table, text=None, commit=None):
        after = None if op in ("d", "commit", "rollback") else {
            "url": key, "warc_ts": None, "html": None,
            "text": text, "lang": None,
        }
        return {
            "scn": scn, "row_id": f"R{scn}", "commit_scn": commit,
            "tx_id": tx, "op": op, "ts_ms": None,
            "table": table, "username": None, "status": 0,
            "before": None, "after": after, "set_cols": None,
        }

    rows = [
        event(10, "t1", "i", "p1", "WEB.PAGES", text="page"),
        event(12, "t1", "i", "s1", "WEB.SUPPLIERS", text="supplier"),
        event(14, "t1", "u", "p1", "WEB.PAGES", text="page-v2"),
        event(16, "t1", "commit", "", "WEB.PAGES", commit=16),
    ]
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    pq.write_table(
        pa.Table.from_pylist(rows, schema=ev_schema),
        os.path.join(log_dir, "batch-000000000010-000000000016.parquet"),
    )
    comp_dir = str(tmp_path / "compacted")
    cfg = EngineConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=2,
        table_whitelist=("WEB.PAGES",),
    )
    metrics = compact_changelog(cfg, log_dir, comp_dir, num_files=1)
    assert metrics["events_out"] == 1  # p1 folded; s1 filtered out

    eng = Engine(cfg)
    eng.snapshot(
        _write_base(tmp_path), 5
    )
    eng.replay(comp_dir)
    t = eng.to_arrow()
    assert t.column("url").to_pylist() == ["p1"]
    assert t.column("text").to_pylist() == ["page-v2"]


def _write_base(tmp_path) -> str:
    base = SCHEMA.empty_table()
    path = str(tmp_path / "empty_base.parquet")
    pq.write_table(base, path)
    return path


def test_incremental_compaction_log_cleaner(ray_session, tmp_path):
    """The Kafka log-cleaner shape: compact segment 1, then compact
    [compacted1 + segment 2] -- the cleaner reads ~|keys| + tail, never
    the full history -- and the result replays to the same state (incl.
    lineage stamps) as compacting the whole log at once."""
    from logminer_kafka_connect_ray.config import EngineConfig
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )
    from logminer_kafka_connect_ray.pipelines.engine import Engine
    from logminer_kafka_connect_ray.testing.gen import (
        ChangeGenConfig,
        gen_changes,
        gen_pages,
        write_event_batches,
    )

    pages = gen_pages(25, seed=37)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=300, seed=37, leave_open=0)
    )
    # split at a txn-safe boundary: find a marker row and cut after it
    cut = next(
        i + 1 for i in range(len(events) // 2, len(events))
        if events[i]["op"] in ("commit", "rollback")
    )
    log1, log2 = str(tmp_path / "log1"), str(tmp_path / "log2")
    write_event_batches(events[:cut], log1, events_per_file=60)
    write_event_batches(events[cut:], log2, events_per_file=60)
    log_full = str(tmp_path / "log_full")
    write_event_batches(events, log_full, events_per_file=60)

    cfg = EngineConfig(lake_dir=str(tmp_path / "x"), num_partitions=4)
    c1 = str(tmp_path / "c1")
    ci = str(tmp_path / "c_incr")
    cf = str(tmp_path / "c_full")
    compact_changelog(cfg, log1, c1, num_files=2)
    m_incr = compact_changelog(cfg, [c1, log2], ci, num_files=2)
    m_full = compact_changelog(cfg, log_full, cf, num_files=2)
    # same per-key fold -> same event count
    assert m_incr["events_out"] == m_full["events_out"]

    def final(lake, changelog):
        eng = Engine(EngineConfig(lake_dir=lake, num_partitions=4))
        eng.snapshot(pages_path, 999)
        eng.replay(changelog)
        t = eng.to_arrow(with_meta=True)
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    want = final(str(tmp_path / "lake_orig"), log_full)
    got_i = final(str(tmp_path / "lake_incr"), ci)
    got_f = final(str(tmp_path / "lake_full"), cf)
    for c in want.column_names:
        assert want.column(c).to_pylist() == got_i.column(c).to_pylist(), c
        assert want.column(c).to_pylist() == got_f.column(c).to_pylist(), c


def test_snapshotless_bootstrap_from_compacted(ray_session, tmp_path):
    """The Kafka-consumer bootstrap shape: NO initial snapshot -- a new
    consumer reads the compacted topic alone (start_scn bootstrap; the
    table schema comes from the compacted files' image footers) and
    must reach the same state as a snapshot-less replay of the full
    history."""
    from logminer_kafka_connect_ray.config import EngineConfig
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )
    from logminer_kafka_connect_ray.pipelines.engine import Engine
    from logminer_kafka_connect_ray.testing.gen import (
        ChangeGenConfig,
        gen_changes,
        gen_pages,
        write_event_batches,
    )

    pages = gen_pages(25, seed=41)
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=250, seed=41, leave_open=0)
    )
    log_dir = str(tmp_path / "log")
    write_event_batches(events, log_dir, events_per_file=60)
    comp_dir = str(tmp_path / "compacted")
    compact_changelog(
        EngineConfig(lake_dir=str(tmp_path / "x"), num_partitions=4),
        log_dir, comp_dir, num_files=2,
    )

    def final(lake, changelog):
        eng = Engine(EngineConfig(lake_dir=lake, num_partitions=4,
                                  start_scn=1))
        eng.replay(changelog)
        t = eng.to_arrow(with_meta=True)
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    full = final(str(tmp_path / "lake_full"), log_dir)
    boot = final(str(tmp_path / "lake_boot"), comp_dir)
    assert full.num_rows > 0
    for c in full.column_names:
        assert full.column(c).to_pylist() == boot.column(c).to_pylist(), c


def test_compaction_of_redo_sql_log_and_mixed_incremental(
    ray_session, tmp_path
):
    """Redo-SQL input: compaction parses the statements with the
    engine's own decode path and emits STRUCT-form compacted events
    (replayable with changelog_format='struct').  The incremental
    log-cleaner loop then mixes formats: [prev_compacted (struct),
    redo tail] -- per-dir format detection feeds each through the
    right decoder.  Both must equal the full redo replay."""
    from logminer_kafka_connect_ray.config import EngineConfig
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )
    from logminer_kafka_connect_ray.pipelines.engine import Engine
    from logminer_kafka_connect_ray.testing.gen import (
        ChangeGenConfig,
        gen_changes,
        gen_pages,
        write_redo_sql_batches,
    )

    pages = gen_pages(25, seed=43)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=240, seed=43, leave_open=0)
    )
    cut = next(
        i + 1 for i in range(len(events) // 2, len(events))
        if events[i]["op"] in ("commit", "rollback")
    )
    log_full = str(tmp_path / "redo_full")
    log1, log2 = str(tmp_path / "redo1"), str(tmp_path / "redo2")
    write_redo_sql_batches(events, log_full, events_per_file=60)
    write_redo_sql_batches(events[:cut], log1, events_per_file=60)
    write_redo_sql_batches(events[cut:], log2, events_per_file=60)

    rcfg = dict(num_partitions=4, changelog_format="redo_sql")
    cf = str(tmp_path / "c_full")
    compact_changelog(
        EngineConfig(lake_dir=str(tmp_path / "x"), **rcfg), log_full, cf,
        num_files=2,
    )
    c1, ci = str(tmp_path / "c1"), str(tmp_path / "c_incr")
    compact_changelog(
        EngineConfig(lake_dir=str(tmp_path / "y"), **rcfg), log1, c1,
        num_files=2,
    )
    compact_changelog(
        EngineConfig(lake_dir=str(tmp_path / "z"), **rcfg), [c1, log2], ci,
        num_files=2,
    )

    def final(lake, changelog, fmt):
        eng = Engine(EngineConfig(lake_dir=lake, num_partitions=4,
                                  changelog_format=fmt))
        eng.snapshot(pages_path, 999)
        eng.replay(changelog)
        t = eng.to_arrow(with_meta=True)
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    want = final(str(tmp_path / "lake_full"), log_full, "redo_sql")
    got_f = final(str(tmp_path / "lake_cf"), cf, "struct")
    got_i = final(str(tmp_path / "lake_ci"), ci, "struct")
    assert want.num_rows > 0
    for c in want.column_names:
        assert want.column(c).to_pylist() == got_f.column(c).to_pylist(), c
        assert want.column(c).to_pylist() == got_i.column(c).to_pylist(), c
