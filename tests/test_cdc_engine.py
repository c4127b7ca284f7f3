"""End-to-end CDC engine correctness vs the dict oracle.

The scenario matrix mirrors the reference's integration tests
(SURVEY.md section 5): DMLOperationsTest (plain I/U/D + partial
updates), Issue14Test (update-to-null), OffsetIntegrationTest
(interleaved txns, resume, open txns), SourceTaskTest (snapshot->stream
handoff, restart), ChangingTableTest (schema evolution), plus skew and
duplicate-replay idempotence from the north rule.
"""

import os

import pyarrow.parquet as pq
import pytest

from logminer_kafka_connect_ray import EngineConfig
from logminer_kafka_connect_ray.pipelines.engine import Engine
from logminer_kafka_connect_ray.testing.compare import state_diff, table_to_state
from logminer_kafka_connect_ray.testing.gen import (
    ChangeGenConfig,
    smt_mark_text,
    gen_changes,
    gen_pages,
    write_event_batches,
)
from logminer_kafka_connect_ray.testing.oracle import replay_oracle

SNAPSHOT_SCN = 999


def build(tmp_path, pages, cfg_changes, lake_cfg=None, events_per_file=100):
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, final, evolved = gen_changes(pages, cfg_changes)
    changelog = str(tmp_path / "changelog")
    write_event_batches(events, changelog, events_per_file=events_per_file)
    cfg = lake_cfg or EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4)
    return Engine(cfg), pages_path, changelog, events


def base_state(pages):
    return {
        r["url"]: {k: v for k, v in r.items() if k != "url"} for r in pages.to_pylist()
    }


def run_and_compare(ray_session, tmp_path, gen_cfg, events_per_file=100, n_pages=50):
    pages = gen_pages(n_pages)
    eng, pages_path, changelog, events = build(tmp_path, pages, gen_cfg,
                                               events_per_file=events_per_file)
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    eng.replay(changelog)
    got = table_to_state(eng.to_arrow())
    want = replay_oracle(base_state(pages), events)
    diffs = state_diff(got, want)
    assert not diffs, diffs
    return eng, events, pages


def test_snapshot_only(ray_session, tmp_path):
    """Snapshot completeness (SelectSourceTest.kt:33-101)."""
    pages = gen_pages(40)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    eng = Engine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    m = eng.snapshot(pages_path, SNAPSHOT_SCN)
    assert m.phase == "snapshot"
    got = table_to_state(eng.to_arrow())
    want = base_state(pages)
    assert not state_diff(got, want)
    # snapshot rows carry the snapshot SCN (op='r' auto-commit)
    meta = eng.to_arrow(with_meta=True)
    assert set(meta.column("_scn").to_pylist()) == {SNAPSHOT_SCN}


def test_plain_iud(ray_session, tmp_path):
    """insert/update/delete with correct final state
    (DMLOperationsTest.kt:19-68)."""
    run_and_compare(ray_session, tmp_path, ChangeGenConfig(n_events=300, seed=11))


def test_partial_update_coalesce(ray_session, tmp_path):
    """UPDATE after-images are partial; missing columns coalesce from
    before/current row (ConnectSchemaFactory.kt:97-104)."""
    run_and_compare(
        ray_session, tmp_path,
        ChangeGenConfig(n_events=300, seed=12, p_insert=0.05, p_delete=0.05),
    )


def test_update_to_null(ray_session, tmp_path):
    """SET col = NULL must null the column (issues/Issue14Test.kt:93-116)."""
    pages = gen_pages(30)
    gen_cfg = ChangeGenConfig(n_events=200, seed=13, p_set_null=0.6)
    eng, events, _ = run_and_compare(ray_session, tmp_path, gen_cfg, n_pages=30)
    # the scenario actually exercised explicit set-to-null
    assert any(e.get("set_cols") for e in events)


def test_rollback_discard(ray_session, tmp_path):
    """Rolled-back txns never reach the lake
    (TransactionConsolidator.kt:42-45)."""
    eng, events, _ = run_and_compare(
        ray_session, tmp_path, ChangeGenConfig(n_events=300, seed=14, p_rollback=0.5)
    )
    assert any(e["op"] == "rollback" for e in events)


def test_unreadable_skip(ray_session, tmp_path):
    """status=2 rows skipped (LogminerSource.kt:96-115)."""
    eng, events, _ = run_and_compare(
        ray_session, tmp_path, ChangeGenConfig(n_events=300, seed=15, p_unreadable=0.15)
    )
    assert any(e["status"] == 2 for e in events)


def test_interleaved_txns_commit_order(ray_session, tmp_path):
    """Apply order is commit order, not change order
    (OffsetIntegrationTest.kt:29-44)."""
    run_and_compare(
        ray_session, tmp_path,
        ChangeGenConfig(n_events=400, seed=16, max_open_txns=6, p_new_txn=0.8),
        events_per_file=60,
    )


def test_open_txn_carryover(ray_session, tmp_path):
    """A txn spanning micro-batch files is applied only after its commit
    marker's batch; still-open txns at end-of-log are excluded but
    spilled for the next replay (TransactionConsolidator.kt:56-64)."""
    pages = gen_pages(50)
    gen_cfg = ChangeGenConfig(n_events=300, seed=17, leave_open=2, max_open_txns=5)
    eng, pages_path, changelog, events = build(tmp_path, pages, gen_cfg,
                                               events_per_file=40)
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    m = eng.replay(changelog)
    want = replay_oracle(base_state(pages), events)
    got = table_to_state(eng.to_arrow())
    assert not state_diff(got, want)
    committed_tx = {e["tx_id"] for e in events if e["op"] == "commit"}
    all_tx = {e["tx_id"] for e in events if e["op"] not in ("commit", "rollback")}
    rolled_tx = {e["tx_id"] for e in events if e["op"] == "rollback"}
    open_tx = all_tx - committed_tx - rolled_tx
    assert open_tx, "scenario must leave open txns"
    assert m.open_txn_spill is not None
    assert m.min_open_scn == min(
        e["scn"] for e in events if e["tx_id"] in open_tx and e["op"] not in ("commit", "rollback")
    )


def test_open_txn_commits_in_later_log(ray_session, tmp_path):
    """Handoff across replay() calls: an open txn's commit arriving in a
    later changelog file applies its buffered rows
    (OffsetIntegrationTest.kt:47-73)."""
    pages = gen_pages(50)
    gen_cfg = ChangeGenConfig(n_events=300, seed=18, leave_open=3, max_open_txns=5)
    eng, pages_path, changelog, events = build(tmp_path, pages, gen_cfg,
                                               events_per_file=50)
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    m = eng.replay(changelog)
    # now commit the open txns in a second changelog increment
    committed_tx = {e["tx_id"] for e in events if e["op"] in ("commit", "rollback")}
    open_tx = sorted(
        {e["tx_id"] for e in events if e["op"] not in ("commit", "rollback")}
        - committed_tx
    )
    assert open_tx
    next_scn = max(e["scn"] for e in events) + 1
    extra = []
    for i, tx in enumerate(open_tx):
        extra.append(
            {
                "scn": next_scn + i, "row_id": f"AAAx{next_scn + i:010d}",
                "commit_scn": next_scn + i, "url": None, "tx_id": tx,
                "op": "commit", "ts_ms": 0, "table": "WEB.PAGES",
                "username": "WEBCRAWL", "status": 0,
                "before": None, "after": None, "set_cols": None,
            }
        )
    write_event_batches(extra, changelog, events_per_file=50)
    m2 = eng.replay(changelog)
    assert m2.version > m.version
    assert m2.open_txn_spill is None
    got = table_to_state(eng.to_arrow())
    want = replay_oracle(base_state(pages), events + extra)
    assert not state_diff(got, want)


def test_duplicate_replay_idempotent(ray_session, tmp_path):
    """Re-running replay() applies nothing twice (exactly-once table
    state via the commit manifest)."""
    eng, events, pages = run_and_compare(
        ray_session, tmp_path, ChangeGenConfig(n_events=200, seed=19)
    )
    v = eng.store.latest_version()
    before = table_to_state(eng.to_arrow())
    eng.replay(str(tmp_path / "changelog"))
    assert eng.store.latest_version() == v
    assert table_to_state(eng.to_arrow()) == before


def test_resume_mid_replay(ray_session, tmp_path):
    """Crash between micro-batches: a fresh Engine resumes from the
    manifest and completes to the same state (Offset.kt semantics)."""
    pages = gen_pages(50)
    gen_cfg = ChangeGenConfig(n_events=400, seed=20)
    eng, pages_path, changelog, events = build(tmp_path, pages, gen_cfg,
                                               events_per_file=60)
    cfg = eng.config
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    # limit to tiny micro-batches so replay takes several versions;
    # simulate a crash by replaying only the first pending file
    from logminer_kafka_connect_ray.sources import changelog as cl

    files = cl.list_batch_files(changelog)
    first = files[0]
    m1 = eng._apply_cdc_batch(eng.store.load(), [first], SNAPSHOT_SCN, first.scn_max)
    assert m1.version == 2
    # fresh engine (new process analog) resumes and finishes
    eng2 = Engine(cfg)
    eng2.resume(changelog)
    got = table_to_state(eng2.to_arrow())
    want = replay_oracle(base_state(pages), events)
    assert not state_diff(got, want)


def test_schema_evolution(ray_session, tmp_path):
    """Column added mid-stream appears in subsequent rows; pre-evolution
    rows read back null for it (ChangingTableTest.kt:42-93)."""
    pages = gen_pages(40)
    gen_cfg = ChangeGenConfig(n_events=300, seed=21, evolution_at_scn=1150)
    eng, pages_path, changelog, events = build(tmp_path, pages, gen_cfg,
                                               events_per_file=80)
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    m = eng.replay(changelog)
    assert m.schema_version >= 1
    got_tbl = eng.to_arrow()
    assert "fetch_status" in got_tbl.column_names
    got = table_to_state(got_tbl)
    want = replay_oracle(base_state(pages), events)
    # oracle rows that predate evolution lack the column -> engine null
    for k, row in want.items():
        row.setdefault("fetch_status", None)
    assert not state_diff(got, want)


def test_skewed_hot_keys(ray_session, tmp_path):
    """Zipf-skewed url updates (F5) produce correct state; the
    dominance-pruning combiner keeps per-partition volume bounded."""
    run_and_compare(
        ray_session, tmp_path,
        ChangeGenConfig(n_events=500, seed=22, zipf_s=1.2, p_insert=0.02, p_delete=0.02),
        events_per_file=80, n_pages=30,
    )


def test_byte_identical_text(ray_session, tmp_path):
    """BASELINE.json per-row invariant: byte-identical extracted text
    per url vs the pure extraction function."""
    from logminer_kafka_connect_ray.functions.text import extract_text_one

    eng, events, pages = run_and_compare(
        ray_session, tmp_path, ChangeGenConfig(n_events=300, seed=23)
    )
    tbl = eng.to_arrow()
    for r in tbl.to_pylist():
        if r["html"] is not None and r["text"] is not None and not str(
            r["text"]
        ).startswith("updated text"):
            assert r["text"].encode() == extract_text_one(r["html"]).encode()


def test_lineage_and_metrics(ray_session, tmp_path):
    """Per-partition lineage (scn range, rows, version) recorded in the
    manifest (north rule)."""
    eng, events, pages = run_and_compare(
        ray_session, tmp_path, ChangeGenConfig(n_events=200, seed=24)
    )
    m = eng.store.load()
    assert m.metrics["events_applied"] > 0
    touched = [p for p in m.partitions if p.version == m.version]
    assert touched
    for p in touched:
        assert p.file and os.path.exists(f"{eng.config.lake_dir}/{p.file}")
        assert p.scn_lo is not None and p.scn_hi is not None and p.rows >= 0
    # copy-on-write: older version files still present for untouched parts
    assert all(p.file is None or os.path.exists(f"{eng.config.lake_dir}/{p.file}")
               for p in m.partitions)


def test_start_scn_without_snapshot(ray_session, tmp_path):
    """Snapshot-less start (reference `start.scn`,
    SourceConnectorConfig.kt:122-139; SourceTaskTest.kt:152-178
    'start.scn=1 reads history via CDC only'): replay() bootstraps an
    empty manifest at start_scn; final state matches the oracle over an
    empty base for keys touched at/after start_scn."""
    pages = gen_pages(30)
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=250, seed=61, p_insert=0.4)
    )
    changelog = str(tmp_path / "changelog")
    write_event_batches(events, changelog, events_per_file=60)

    # case 1: start at the very beginning -> full history, empty base
    eng = Engine(
        EngineConfig(lake_dir=str(tmp_path / "lake1"), num_partitions=4,
                     start_scn=1000)
    )
    m = eng.replay(changelog)
    assert m.phase in ("cdc", "start-scn")
    got = table_to_state(eng.to_arrow())
    want = replay_oracle({}, events)
    assert not state_diff(got, want), state_diff(got, want)

    # case 2: start mid-log -> only events with scn >= start_scn apply
    mid = 1120
    eng2 = Engine(
        EngineConfig(lake_dir=str(tmp_path / "lake2"), num_partitions=4,
                     start_scn=mid)
    )
    eng2.replay(changelog)
    got2 = table_to_state(eng2.to_arrow())
    want2 = replay_oracle({}, [e for e in events if e["scn"] >= mid])
    assert not state_diff(got2, want2), state_diff(got2, want2)


def test_salted_two_level_fold(ray_session, tmp_path):
    """salt_factor > 1 (north-rule salted repartitioning): Zipf-hot
    keys replay through the salted sub-shard exchange + combiner to the
    same final state as the direct path."""
    pages = gen_pages(30)
    gen_cfg = ChangeGenConfig(n_events=400, seed=62, zipf_s=1.2,
                              p_insert=0.05, p_delete=0.05)
    cfg = EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                       salt_factor=3)
    eng, pages_path, changelog, events = build(tmp_path, pages, gen_cfg,
                                               lake_cfg=cfg,
                                               events_per_file=80)
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    eng.replay(changelog)
    got = table_to_state(eng.to_arrow())
    want = replay_oracle(base_state(pages), events)
    assert not state_diff(got, want), state_diff(got, want)


def test_struct_null_key_routed_to_dead_letters(ray_session, tmp_path):
    """A struct-format change row whose images carry no key is
    undecodable: routed to lake/dead_letters/ with reason=missing_key
    (not silently filtered), and the replay still matches the oracle."""
    pages = gen_pages(15)
    pq.write_table(pages, str(tmp_path / "pages.parquet"))
    events, _, _ = gen_changes(pages, ChangeGenConfig(n_events=60, seed=67))
    hi = max(e["scn"] for e in events)
    cols = ["warc_ts", "html", "text", "lang"]
    bad = {
        "scn": hi + 1, "row_id": f"AAAx{hi+1:010d}", "commit_scn": None,
        "url": None, "tx_id": "txnk", "op": "u", "ts_ms": hi + 1,
        "table": "WEB.PAGES", "username": "X", "status": 0,
        "before": {c: None for c in cols},
        "after": {**{c: None for c in cols}, "text": "lost"},
        "set_cols": None,
    }
    commit = {
        "scn": hi + 2, "row_id": f"AAAx{hi+2:010d}", "commit_scn": hi + 2,
        "tx_id": "txnk", "op": "commit", "ts_ms": hi + 2,
        "table": "WEB.PAGES", "username": "X", "status": 0,
        "before": None, "after": None, "set_cols": None,
    }
    changelog = str(tmp_path / "clog")
    write_event_batches(events + [bad, commit], changelog, events_per_file=40)

    lake = str(tmp_path / "lake")
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=3))
    eng.snapshot(str(tmp_path / "pages.parquet"), SNAPSHOT_SCN)
    m = eng.replay(changelog)
    assert m.metrics["dead_letters"] == 1, m.metrics
    dead = eng.read_dead_letters().to_pandas()
    assert list(dead["reason"]) == ["missing_key"]
    assert dead.iloc[0]["scn"] == hi + 1
    got = table_to_state(eng.to_arrow())
    want = replay_oracle(base_state(pages), events)
    assert not state_diff(got, want), state_diff(got, want)


def test_all_open_micro_batch(ray_session, tmp_path):
    """A micro-batch whose rows ALL belong to still-open txns commits a
    no-rewrite manifest (no committed rows -> empty lineage) and the
    carryover applies them once their COMMIT arrives in a later batch;
    exercised with and without the salted fold."""
    pages = gen_pages(12)
    pq.write_table(pages, str(tmp_path / "pages.parquet"))
    url = pages.column("url")[0].as_py()
    cols = ["warc_ts", "html", "text", "lang"]

    def upd(scn, text):
        return {"scn": scn, "row_id": f"AAAx{scn:010d}", "commit_scn": None,
                "url": url, "tx_id": "txL", "op": "u", "ts_ms": scn,
                "table": "WEB.PAGES", "username": "X", "status": 0,
                "before": {c: None for c in cols},
                "after": {**{c: None for c in cols}, "text": text},
                "set_cols": None}

    events = [upd(1000 + i, f"t{i}") for i in range(60)]
    events.append({"scn": 1100, "row_id": "AAAx1100", "commit_scn": 1100,
                   "tx_id": "txL", "op": "commit", "ts_ms": 1100,
                   "table": "WEB.PAGES", "username": "X", "status": 0,
                   "before": None, "after": None, "set_cols": None})
    changelog = str(tmp_path / "clog")
    write_event_batches(events, changelog, events_per_file=20)

    for salt in (1, 3):
        lake = str(tmp_path / f"lake{salt}")
        eng = Engine(EngineConfig(
            lake_dir=lake, num_partitions=3,
            max_events_per_checkpoint=20,  # early batches: open rows only
            salt_factor=salt,
        ))
        eng.snapshot(str(tmp_path / "pages.parquet"), SNAPSHOT_SCN)
        eng.replay(changelog)
        got = table_to_state(eng.to_arrow())
        assert got[url]["text"] == "t59", (salt, got[url]["text"])



def test_smt_transform_hook(ray_session, tmp_path):
    """EngineConfig.transform (the reference's SMT analog, SURVEY.md
    section 2.10) rewrites decoded events exactly once between decode
    and merge: event-derived text is marked, snapshot-derived text is
    not, and the unmarked replay differs."""
    pages = gen_pages(30)
    gen_cfg = ChangeGenConfig(n_events=200, seed=21)
    eng, pages_path, changelog, events = build(
        tmp_path, pages, gen_cfg,
        lake_cfg=EngineConfig(
            lake_dir=str(tmp_path / "lake"), num_partitions=4,
            transform=smt_mark_text,
        ),
    )
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    eng.replay(changelog)
    got = table_to_state(eng.to_arrow())

    # oracle: apply the same marking to the event stream, then replay
    marked_events = []
    for e in events:
        e2 = dict(e)
        if e2.get("after") and e2["after"].get("text") is not None:
            a = dict(e2["after"])
            a["text"] = "smt:" + a["text"]
            e2["after"] = a
        marked_events.append(e2)
    want = replay_oracle(base_state(pages), marked_events)
    diffs = state_diff(got, want)
    assert not diffs, diffs
    # sanity: at least one surviving row actually carries the mark
    assert any(
        (v.get("text") or "").startswith("smt:") for v in got.values()
    )


def _state_to_pages(state: dict, schema, urls) -> "pq.pa.Table":
    import pyarrow as pa

    rows = [dict(url=u, **state[u]) for u in sorted(urls) if u in state]
    return pa.table(
        {f.name: pa.array([r.get(f.name) for r in rows], f.type)
         for f in schema},
        schema=schema,
    )


def test_chunked_snapshot_moving_db(ray_session, tmp_path):
    """DBLog-style chunked snapshot: two chunks read at DIFFERENT
    points of the change stream (one at base, one after roughly half
    the log has committed), then a full replay -- final state must
    equal the plain-path oracle.  Exercises chunk-vs-log arbitration:
    events older than a chunk's SCN are already inside its image and
    must lose the fold; newer ones must win."""
    import pyarrow as pa

    pages = gen_pages(60)
    eng, pages_path, changelog, events = build(
        tmp_path, pages, ChangeGenConfig(n_events=400, seed=23)
    )
    scns = sorted(e["scn"] for e in events)
    scn_mid = scns[len(scns) // 2]
    mid_state = replay_oracle(
        base_state(pages), [e for e in events if e["scn"] <= scn_mid]
    )
    assert mid_state != base_state(pages)  # the db really moved

    urls = sorted(set(base_state(pages)) | set(mid_state))
    bound = urls[len(urls) // 2]
    p0 = str(tmp_path / "chunk0.parquet")
    p1 = str(tmp_path / "chunk1.parquet")
    pq.write_table(
        _state_to_pages(base_state(pages), pages.schema,
                        [u for u in urls if u < bound]), p0)
    pq.write_table(
        _state_to_pages(mid_state, pages.schema,
                        [u for u in urls if u >= bound]), p1)

    eng.snapshot_chunked([(p0, SNAPSHOT_SCN), (p1, scn_mid)],
                         base_scn=SNAPSHOT_SCN)
    eng.replay(changelog)
    got = table_to_state(eng.to_arrow())
    want = replay_oracle(base_state(pages), events)
    diffs = state_diff(got, want)
    assert not diffs, diffs


def test_materialized_view_incremental(ray_session, tmp_path):
    """Materialized-view maintenance: per-lang (count, total text
    chars) accumulated from merge deltas across MANY micro-batch
    versions equals the aggregate of the final replayed state; a
    duplicate replay() changes nothing (exactly-once deltas)."""
    from collections import Counter

    pages = gen_pages(50)
    cfg = EngineConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        views=(("v", "lang", "text"),),
        max_events_per_checkpoint=50,
    )
    eng, pages_path, changelog, events = build(
        tmp_path, pages, ChangeGenConfig(n_events=300, seed=7),
        lake_cfg=cfg, events_per_file=60,
    )
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    m = eng.replay(changelog)
    assert m.version > 3  # deltas really accumulated across versions

    want_state = replay_oracle(base_state(pages), events)
    n, ch = Counter(), Counter()
    for r in want_state.values():
        n[r["lang"]] += 1
        ch[r["lang"]] += len(r["text"]) if r["text"] is not None else 0
    want = {g: (n[g], ch[g]) for g in n}
    got = {r["lang"]: (r["n_rows"], r["sum_text_chars"])
           for r in eng.view("v").to_pylist()}
    assert got == want

    eng.replay(changelog)  # no new files -> no new version, no drift
    got2 = {r["lang"]: (r["n_rows"], r["sum_text_chars"])
            for r in eng.view("v").to_pylist()}
    assert got2 == want


def test_lake_host_stats(ray_session, tmp_path):
    """Lake-analytics consumer: per-host stats computed by the
    distributed two-level aggregate over the replayed lake equal a
    dict-oracle recomputation over replay_oracle's final state."""
    from collections import Counter

    from logminer_kafka_connect_ray.pipelines.queries import host_stats
    from logminer_kafka_connect_ray.testing.compare import canon

    pages = gen_pages(60, n_hosts=7)
    eng, pages_path, changelog, events = build(
        tmp_path, pages, ChangeGenConfig(n_events=400, seed=13)
    )
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    eng.replay(changelog)

    want_state = replay_oracle(base_state(pages), events)
    n, ch, ts = Counter(), Counter(), {}
    for url, r in want_state.items():
        h = url.split("/")[2]
        n[h] += 1
        ch[h] += len(r["text"]) if r["text"] is not None else 0
        # oracle state mixes datetime (base rows) and int-us (events):
        # canonicalize both to int microseconds before taking the max
        w = canon(r["warc_ts"])
        ts.setdefault(h, None)
        if w is not None and (ts[h] is None or w > ts[h]):
            ts[h] = w
    got = {
        r["host"]: (r["n_pages"], r["sum_text_chars"], canon(r["max_warc_ts"]))
        for r in host_stats(
            eng.read_table(columns=["url", "warc_ts", "text"])
        ).to_pylist()
    }
    assert got == {h: (n[h], ch[h], ts[h]) for h in n}


def test_scd2_history(ray_session, tmp_path):
    """SCD2 version intervals: distributed helper output equals a dict
    oracle built from the committed events in commit order (base
    snapshot row = version 1, valid_to = next version's valid_from)."""
    import pyarrow as pa
    import ray.data as rd

    from logminer_kafka_connect_ray.pipelines.queries import scd2_history

    pages = gen_pages(40, n_hosts=5)
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=300, seed=23, p_rollback=0.2,
                               max_open_txns=4)
    )
    commit_scn = {
        e["tx_id"]: e["commit_scn"] for e in events if e["op"] == "commit"
    }
    committed_rows = [
        {
            "url": e["url"],
            "op": e["op"],
            "commit_scn": commit_scn[e["tx_id"]],
            "scn": e["scn"],
        }
        for e in events
        if e["op"] in ("i", "u", "d")
        and e["status"] == 0
        and e["tx_id"] in commit_scn
    ]
    snap = 500
    got = scd2_history(
        rd.from_arrow(pa.Table.from_pylist(committed_rows)),
        rd.from_arrow(pages.select(["url"])),
        snap_scn=snap,
        P=8,
    ).to_pylist()

    per_url = {r["url"]: [("r", snap)] for r in pages.to_pylist()}
    for e in sorted(committed_rows, key=lambda e: (e["commit_scn"], e["scn"])):
        per_url.setdefault(e["url"], []).append((e["op"], e["scn"]))
    want = []
    for url in sorted(per_url):
        vs = per_url[url]
        for i, (op, scn) in enumerate(vs):
            want.append(
                {
                    "url": url,
                    "ver": i + 1,
                    "op": op,
                    "valid_from_scn": scn,
                    "valid_to_scn": vs[i + 1][1] if i + 1 < len(vs) else None,
                }
            )
    assert got == want


def test_lake_diff(ray_session, tmp_path):
    """Engine.diff classification matches a dict oracle over the
    replayed state; identical versions diff to empty (copy-on-write
    file pruning)."""
    import pyarrow as pa

    from logminer_kafka_connect_ray.testing.compare import canon

    pages = gen_pages(40)
    eng, pages_path, changelog, events = build(
        tmp_path, pages, ChangeGenConfig(n_events=300, seed=29)
    )
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    m = eng.replay(changelog)

    base = base_state(pages)
    final = replay_oracle(base, events)
    cols = ("warc_ts", "html", "text", "lang")
    want = {}
    for url in set(base) | set(final):
        if url not in base:
            want[url] = "added"
        elif url not in final:
            want[url] = "removed"
        else:
            b = {c: canon(base[url].get(c)) for c in cols}
            f = {c: canon(final[url].get(c)) for c in cols}
            if b != f:
                want[url] = "modified"
    got = {
        r["url"]: r["change"]
        for r in pa.Table.from_pandas(
            eng.diff(1).to_pandas(), preserve_index=False
        ).to_pylist()
    }
    assert got == want
    assert want, "scenario must actually change rows"
    assert "removed" in set(want.values())

    # same version on both sides: every partition file identical ->
    # all pruned, empty result without reading anything
    assert eng.diff(m.version, m.version).count() == 0


def test_pit_lookup_asof_versions(ray_session, tmp_path):
    """AS-OF probe join: each probe SCN resolves the version valid at
    that point; urls inserted after a probe emit no row for it, and
    deletes surface as op='d' (explicit, not absent)."""
    import pyarrow as pa
    import ray.data as rd

    from logminer_kafka_connect_ray.pipelines.queries import pit_lookup

    committed_rows = [
        {"url": "A", "op": "u", "commit_scn": 650, "scn": 600},
        {"url": "A", "op": "d", "commit_scn": 750, "scn": 700},
        {"url": "C", "op": "i", "commit_scn": 850, "scn": 800},
    ]
    base = pa.table({"url": pa.array(["A", "B"], pa.string())})
    got = pit_lookup(
        rd.from_arrow(pa.Table.from_pylist(committed_rows)),
        rd.from_arrow(base),
        snap_scn=500,
        P=4,
        probe_scns=[550, 720, 900],
    ).to_pylist()
    want = [
        {"url": "A", "asof_scn": 550, "ver": 1, "op": "r"},
        {"url": "A", "asof_scn": 720, "ver": 3, "op": "d"},
        {"url": "A", "asof_scn": 900, "ver": 3, "op": "d"},
        {"url": "B", "asof_scn": 550, "ver": 1, "op": "r"},
        {"url": "B", "asof_scn": 720, "ver": 1, "op": "r"},
        {"url": "B", "asof_scn": 900, "ver": 1, "op": "r"},
        {"url": "C", "asof_scn": 900, "ver": 1, "op": "i"},
    ]
    assert got == want


def test_url_revision_churn_invariants(ray_session):
    """Per-url churn profile over the committed stream: structural
    invariants that pin the ordered-sweep semantics (the 3-scale SQL
    gate proves exact values; this pins the null-gap and segment
    bookkeeping on the real small workload)."""
    from logminer_kafka_connect_ray.pipelines.queries import (
        cdc_url_revision_churn,
    )

    rows = cdc_url_revision_churn("/root/testdata/sf0.001").to_pylist()
    assert rows, "expected committed urls at sf0.001"
    for r in rows:
        assert 0 <= r["n_text_revs"] <= r["n_committed"]
        assert r["first_scn"] <= r["last_scn"]
        if r["n_committed"] == 1:
            assert r["max_scn_gap"] is None
            assert r["first_scn"] == r["last_scn"]
        else:
            assert r["max_scn_gap"] is not None
            assert 0 < r["max_scn_gap"] <= r["last_scn"] - r["first_scn"]
