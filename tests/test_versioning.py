"""Time-travel reads and copy-on-write vacuum."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from logminer_kafka_connect_ray import EngineConfig
from logminer_kafka_connect_ray.pipelines.engine import Engine
from logminer_kafka_connect_ray.testing.compare import state_diff, table_to_state
from logminer_kafka_connect_ray.testing.gen import (
    ChangeGenConfig,
    gen_changes,
    gen_pages,
    write_event_batches,
)
from logminer_kafka_connect_ray.testing.oracle import replay_oracle


def build(tmp_path, n_batches=3):
    pages = gen_pages(40)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(pages, ChangeGenConfig(n_events=240, seed=61))
    changelog = str(tmp_path / "changelog")
    write_event_batches(events, changelog, events_per_file=110)
    eng = Engine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            num_partitions=4,
            max_events_per_checkpoint=120,  # several versions
        )
    )
    eng.snapshot(pages_path, 999)
    eng.replay(changelog)
    return eng, pages, events


def test_time_travel_reads(ray_session, tmp_path):
    eng, pages, events = build(tmp_path)
    latest = eng.store.latest_version()
    assert latest >= 3  # snapshot + >=2 cdc micro-batches

    # version 1 = snapshot state
    v1 = table_to_state(eng.to_arrow(version=1))
    base = {
        r["url"]: {k: v for k, v in r.items() if k != "url"}
        for r in pages.to_pylist()
    }
    assert not state_diff(v1, base)

    # intermediate version = oracle over the events applied so far
    m2 = eng.store.load(2)
    upto = [e for e in events if e["scn"] <= m2.watermark_scn]
    want2 = replay_oracle(base, upto)
    got2 = table_to_state(eng.to_arrow(version=2))
    assert not state_diff(got2, want2)


def test_vacuum_retention(ray_session, tmp_path):
    eng, pages, events = build(tmp_path)
    latest = eng.store.latest_version()
    parts_dir = os.path.join(eng.config.lake_dir, "parts")
    before_files = set(os.listdir(parts_dir))

    stats = eng.vacuum(keep_versions=1)
    assert stats["removed_manifests"] == latest - 1
    after_files = set(os.listdir(parts_dir))
    assert after_files < before_files

    # latest state untouched
    base = {
        r["url"]: {k: v for k, v in r.items() if k != "url"}
        for r in pages.to_pylist()
    }
    want = replay_oracle(base, events)
    got = table_to_state(eng.to_arrow())
    assert not state_diff(got, want)
    # old versions are gone
    assert eng.store.load(1) is None or latest == 1


def test_repartition_lake(ray_session, tmp_path):
    """Re-hashing the lake to a new partition count preserves state
    exactly, and subsequent replay works under the new layout."""
    pages = gen_pages(40)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events1, _, _ = gen_changes(pages, ChangeGenConfig(n_events=100, seed=71))
    changelog = str(tmp_path / "changelog")
    write_event_batches(events1, changelog, events_per_file=200)

    eng = Engine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.snapshot(pages_path, 999)
    eng.replay(changelog)
    before = table_to_state(eng.to_arrow())

    m = eng.repartition_lake(8)
    assert m.phase == "repartition"
    assert m.num_partitions == 8
    assert eng.config.num_partitions == 8
    assert table_to_state(eng.to_arrow()) == before
    touched = [p for p in m.partitions if p.file]
    assert all(p.version == m.version for p in touched)

    # replay continues under the new layout; the second log's
    # before-images must reflect post-events1 state (redo logs are
    # consistent -- the engine's M7 enrichment relies on it)
    import pyarrow as pa

    state1 = replay_oracle(
        {r["url"]: {k: v for k, v in r.items() if k != "url"}
         for r in pages.to_pylist()},
        events1,
    )
    pages_after1 = pa.Table.from_pylist(
        [{"url": u, **row} for u, row in sorted(state1.items())],
        schema=pages.schema,
    )
    events2, _, _ = gen_changes(
        pages_after1, ChangeGenConfig(n_events=100, seed=72, start_scn=90000,
                                      tx_prefix="tz")
    )
    write_event_batches(events2, changelog, events_per_file=200)
    eng.replay(changelog)
    base = {
        r["url"]: {k: v for k, v in r.items() if k != "url"}
        for r in pages.to_pylist()
    }
    want = replay_oracle(base, events1 + events2)
    got = table_to_state(eng.to_arrow())
    assert not state_diff(got, want)


def test_crash_debris_ignored_and_vacuumed(ray_session, tmp_path):
    """Partition files from a crashed/failed run (never referenced by a
    manifest) don't affect reads and are removed by vacuum."""
    eng, pages, events = build(tmp_path)
    before = table_to_state(eng.to_arrow())
    parts_dir = os.path.join(eng.config.lake_dir, "parts")
    # simulate a crashed future merge: orphan data file + stale tmp
    import shutil

    some = next(f for f in os.listdir(parts_dir) if f.endswith(".parquet"))
    shutil.copy(
        os.path.join(parts_dir, some),
        os.path.join(parts_dir, "p00099-v99999999.parquet"),
    )
    open(os.path.join(parts_dir, "p00001-v00000099.parquet.tmp-123"), "w").write("x")

    # reads are manifest-driven: state unchanged
    assert table_to_state(eng.to_arrow()) == before
    eng.vacuum(keep_versions=1)
    files = set(os.listdir(parts_dir))
    assert "p00099-v99999999.parquet" not in files
    assert table_to_state(eng.to_arrow()) == before


def test_gdpr_erase(ray_session, tmp_path):
    eng, pages, events = build(tmp_path)
    m_before = eng.store.load()
    state = table_to_state(eng.to_arrow())
    live = sorted(state)
    # erase two live keys + one absent key (no-op on the absent one)
    targets = [live[0], live[7], "https://absent.example/x"]
    m = eng.erase(targets)

    # final state == previous state minus the erased keys
    got = table_to_state(eng.to_arrow())
    want = {k: v for k, v in state.items() if k not in targets}
    assert not state_diff(got, want)

    # copy-on-write pruning: only the partitions holding a target key
    # were rewritten; untouched partitions carry the SAME file forward
    from logminer_kafka_connect_ray.functions.hashing import partition_ids
    import pyarrow as pa
    touched = set(
        partition_ids(pa.array(targets[:2]), eng.config.num_partitions)
    )
    assert m.metrics["partitions_rewritten"] <= len(touched)
    before = {p.part_id: p.file for p in m_before.partitions}
    after = {p.part_id: p.file for p in m.partitions}
    for pid, f in after.items():
        if pid not in touched:
            assert f == before[pid]

    # watermark unmoved; version advanced; vacuum completes the forget
    assert m.watermark_scn == m_before.watermark_scn
    assert m.version == m_before.version + 1
    eng.vacuum(keep_versions=1)
    got2 = table_to_state(eng.to_arrow())
    assert not state_diff(got2, want)

    # erasing only absent keys is a committed no-op version
    m2 = eng.erase(["https://absent.example/y"])
    assert m2.version == m.version + 1
    assert not state_diff(table_to_state(eng.to_arrow()), want)


def test_subbatch_resume_after_merge_crash(ray_session, tmp_path):
    """Sub-batch resume granularity (PartialLedger): a crash mid-merge
    loses only the in-flight partitions.  A prior attempt's completed
    partition merges are ledgered (``_partial/v{V}``) and the re-run of
    the SAME uncommitted version skips them -- their events never enter
    the exchange and their files are not rewritten -- while still
    producing the exact oracle state.  Reference analog: per-(scn,rowId)
    resume, Offset.kt:19-59, at distributed (per-partition) granularity."""
    import json

    import pytest

    pages = gen_pages(40)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(pages, ChangeGenConfig(n_events=240, seed=62))
    changelog = str(tmp_path / "changelog")
    write_event_batches(events, changelog, events_per_file=300)
    lake = str(tmp_path / "lake")

    def cfg(**extra):
        return EngineConfig(
            lake_dir=lake, num_partitions=4,
            max_events_per_checkpoint=1000,  # ONE cdc micro-batch (v2)
            extra=extra,
        )

    Engine(cfg()).snapshot(pages_path, 999)

    # crashed attempt: partition 0's merge task faults (after sleeping
    # so sibling merges complete and ledger their partitions)
    with pytest.raises(Exception, match="injected merge fault"):
        Engine(cfg(fault_merge_parts=(0,))).replay(changelog)

    ledger_dir = os.path.join(lake, "_partial", "v00000002")
    entries = sorted(os.listdir(ledger_dir))
    assert entries, "no sibling merge completed before the fault"
    assert "part-00000.json" not in entries  # the faulted partition
    done = [json.load(open(os.path.join(ledger_dir, e))) for e in entries]
    mtimes = {
        r["file"]: os.stat(os.path.join(lake, r["file"])).st_mtime_ns
        for r in done
    }

    # fresh process/engine resumes: same call, the manifest+ledger ARE
    # the offset
    m = Engine(cfg()).replay(changelog)
    assert m.version == 2
    assert m.metrics["partitions_resumed"] == len(done)
    # ledgered partitions were NOT rewritten (same inode content+mtime)
    for f, t in mtimes.items():
        assert os.stat(os.path.join(lake, f)).st_mtime_ns == t
    # ledger cleared after publish
    assert not os.path.isdir(ledger_dir)

    # final state is exact
    base = {
        r["url"]: {k: v for k, v in r.items() if k != "url"}
        for r in pages.to_pylist()
    }
    want = replay_oracle(base, events)
    got = table_to_state(Engine(cfg()).to_arrow())
    assert not state_diff(got, want)


def test_publish_cas_two_drivers(tmp_path):
    """Exactly-once fencing for TWO drivers racing the same version:
    ``ManifestStore.publish`` is an atomic create-if-absent
    (``os.link``), so exactly one writer wins; the loser gets False
    and must read the winner's manifest (engine.py does exactly that
    and discards its own merge)."""
    from logminer_kafka_connect_ray.state.checkpoint import (
        Manifest,
        ManifestStore,
    )

    store_a = ManifestStore(str(tmp_path))
    store_b = ManifestStore(str(tmp_path))  # a second driver process

    def mk(cp: str) -> Manifest:
        return Manifest(
            version=2, checkpoint_id=cp, watermark_scn=10,
            last_commit_scn=10, min_open_scn=None, phase="cdc",
            num_partitions=4, schema_version=1, schema=[],
            partitions=[],
        )

    assert store_a.publish(mk("winner")) is True
    # loser: same version, different checkpoint -- must NOT overwrite
    assert store_b.publish(mk("loser")) is False
    assert store_b.load(2).checkpoint_id == "winner"
    assert store_a.latest_version() == 2
    # idempotent re-publish by the winner is also fenced
    assert store_a.publish(mk("winner")) is False


def test_point_lookup_prunes_and_matches_scan(ray_session, tmp_path):
    """Engine.lookup reads only the hash-matched partition files and
    returns rows byte-identical to a full scan filtered to the same
    keys (including after schema evolution's lineage fill, which the
    lookup path shares with read_table)."""
    import pyarrow.compute as pc

    pages = gen_pages(60)
    events, _final, _ = gen_changes(pages, ChangeGenConfig(n_events=200, seed=7))
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    changelog = str(tmp_path / "changelog")
    write_event_batches(events, changelog, events_per_file=40)
    eng = Engine(EngineConfig(lake_dir=str(tmp_path / "lake"),
                              num_partitions=8))
    eng.snapshot(pages_path, 999)
    eng.replay(changelog)

    full = eng.to_arrow()
    urls = full.column("url").to_pylist()
    probes = [urls[0], urls[len(urls) // 2], urls[-1], "https://nope/x"]
    got = eng.lookup(probes)
    want = full.filter(pc.is_in(full.column("url"),
                                value_set=pa.array(sorted(set(probes)))))
    assert got.equals(want.combine_chunks().cast(got.schema))
    stats = eng.last_lookup_stats
    assert stats["keys_probed"] == 4
    assert 1 <= stats["partitions_read"] <= 4 < stats["partitions_total"]


def test_scan_stats_pruning(ray_session, tmp_path):
    """Engine.scan consults the manifest's per-partition host-Bloom +
    zonemap stats before opening any file: a planted NEEDLE host reads
    only the partitions its urls hash to, an absent host / impossible
    time window opens nothing, and every surviving row is byte-
    identical to the same predicate over a full scan (pruning is a
    superset test -- a Bloom false positive costs a read, never a row)."""
    import ray

    import pyarrow.compute as pc

    pages = gen_pages(60)
    # needle host: 2 pages on a host no other url uses -- they hash to
    # at most 2 of the 8 lake partitions
    ts0 = pages.column("warc_ts")[0]
    needle = pa.table(
        {
            "url": pa.array(
                [f"https://needle.example/d/{i}" for i in (0, 1)]
            ),
            "warc_ts": pa.array([ts0.as_py()] * 2, ts0.type),
            "html": pa.array([b"<html><body>n</body></html>"] * 2,
                             pa.binary()),
            "text": pa.array(["n", "n"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    pages = pa.concat_tables([pages, needle])
    events, _final, _ = gen_changes(pages, ChangeGenConfig(n_events=200,
                                                           seed=11))
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    changelog = str(tmp_path / "changelog")
    write_event_batches(events, changelog, events_per_file=50)
    eng = Engine(EngineConfig(lake_dir=str(tmp_path / "lake"),
                              num_partitions=8))
    eng.snapshot(pages_path, 999)
    eng.replay(changelog)
    full = eng.to_arrow()
    host_full = pc.list_element(pc.split_pattern(full.column("url"), "/"), 2)

    def collect(ds):
        tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not tbls:
            return None
        t = pa.concat_tables(tbls)
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    # (1) needle host: Bloom pruning opens <= 2 of 8 partitions, rows
    # exactly match the full-scan filter
    got = collect(eng.scan(hosts=["needle.example"]))
    st = eng.last_scan_stats
    assert st["partitions_read"] <= 2 < st["partitions_total"]
    assert st["pruned_by_bloom"] >= st["partitions_total"] - 2
    want = full.filter(pc.equal(host_full, "needle.example"))
    assert got is not None and got.equals(want.combine_chunks().cast(got.schema))

    # (2) absent host: every partition pruned, zero files opened
    got = collect(eng.scan(hosts=["ghost.example"]))
    st = eng.last_scan_stats
    assert got is None and st["partitions_read"] == 0

    # (3) zonemap: a time window beyond all data opens nothing
    hi_ts = pc.max(pc.cast(full.column("warc_ts"), pa.int64())).as_py()
    got = collect(eng.scan(ts_range=(hi_ts + 1_000_000, None)))
    st = eng.last_scan_stats
    assert got is None and st["partitions_read"] == 0
    assert st["pruned_by_zonemap"] == st["partitions_total"]

    # (4) an all-covering window reads everything and returns the
    # exact full state
    got = collect(eng.scan(ts_range=(0, hi_ts)))
    st = eng.last_scan_stats
    assert st["partitions_read"] == st["partitions_total"]
    assert got.equals(full.combine_chunks().cast(got.schema))

    # (5) dense host (present in most partitions): no pruning claimed,
    # rows still exact
    dense = host_full[0].as_py()
    got = collect(eng.scan(hosts=[dense]))
    want = full.filter(pc.equal(host_full, dense))
    assert got.equals(want.combine_chunks().cast(got.schema))


def test_repair_guards_and_idempotence(ray_session, tmp_path):
    """Engine.repair edge contracts: a second repair with the same
    corrections is a data no-op (compensating writes are stable),
    empty corrections publish nothing, and repair refuses to run when
    the base version it needs has been vacuumed (the PITR retention
    contract fails loudly, never silently mis-folds)."""
    import os as _os

    import pytest

    from logminer_kafka_connect_ray import workload

    sf = "/root/testdata/sf0.001"
    d = workload.ensure_workload(sf)
    corrupt = _os.path.join(d["root"], "changelog-corrupt")
    marker = _os.path.join(d["root"], "_ready_corrupt")
    if not _os.path.exists(marker):
        workload.derive_changelog_corrupt(sf, corrupt)
        open(marker, "w").write("ok")
    eng = Engine(EngineConfig(lake_dir=str(tmp_path / "lake"),
                              num_partitions=8))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(corrupt)
    import ray as _ray

    scns = sorted(
        s
        for t in _ray.get(eng.read_dead_letters().to_arrow_refs())
        if t.num_rows and "scn" in t.column_names
        for s in t.column("scn").to_pylist()
    )
    assert scns, "corruption fixture produced no dead letters"
    corr = workload.derive_corrections(sf, scns)

    m1 = eng.repair(corrupt, corr)
    assert eng.last_repair_stats["keys_targeted"] >= 1
    t1 = eng.to_arrow()
    # repair again: new version, identical data
    m2 = eng.repair(corrupt, corr)
    assert m2.version == m1.version + 1
    assert eng.to_arrow().equals(t1)
    # empty corrections: no-op, no new version
    assert eng.repair(corrupt, corr.slice(0, 0)).version == m2.version
    # vacuum away the snapshot base: repair must refuse, not mis-fold
    eng.vacuum(keep_versions=1)
    with pytest.raises(RuntimeError, match="not retained"):
        eng.repair(corrupt, corr)


def test_scan_column_pruning(ray_session, tmp_path):
    """Engine.scan(columns=...) prunes the parquet read but still
    evaluates host/ts predicates on the pruned-away key/ts columns,
    and the output projects exactly the requested columns."""
    import ray

    import pyarrow.compute as pc

    pages = gen_pages(40)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    eng = Engine(EngineConfig(lake_dir=str(tmp_path / "lake"),
                              num_partitions=4))
    eng.snapshot(pages_path, 999)

    host = pages.column("url")[0].as_py().split("/")[2]
    ds = eng.scan(hosts=[host], columns=["text", "lang"])
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    got = pa.concat_tables(tbls)
    assert got.column_names == ["text", "lang"]
    full = eng.to_arrow()
    h = pc.list_element(pc.split_pattern(full.column("url"), "/"), 2)
    want = full.filter(pc.equal(h, host)).select(["text", "lang"])
    assert (
        got.take(pc.sort_indices(got, sort_keys=[("text", "ascending")]))
        .equals(
            want.take(
                pc.sort_indices(want, sort_keys=[("text", "ascending")])
            ).combine_chunks().cast(got.schema)
        )
    )
