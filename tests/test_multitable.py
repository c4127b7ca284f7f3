"""Multi-table fan-out: one mixed changelog -> one lake per table
(reference topic-per-table + whitelist, SourceTask.kt:46-63)."""

import os

import pyarrow.parquet as pq

from logminer_kafka_connect_ray import EngineConfig
from logminer_kafka_connect_ray.pipelines.multitable import (
    MultiTableEngine,
    discover_tables,
)
from logminer_kafka_connect_ray.testing.compare import state_diff, table_to_state
from logminer_kafka_connect_ray.testing.gen import (
    ChangeGenConfig,
    gen_changes,
    gen_pages,
    write_event_batches,
)
from logminer_kafka_connect_ray.testing.oracle import replay_oracle


def test_multitable_replay(ray_session, tmp_path):
    pages_a = gen_pages(30, seed=1)
    pages_b = gen_pages(25, seed=2)
    pa_path = str(tmp_path / "a.parquet")
    pb_path = str(tmp_path / "b.parquet")
    pq.write_table(pages_a, pa_path)
    pq.write_table(pages_b, pb_path)

    ev_a, _, _ = gen_changes(
        pages_a, ChangeGenConfig(n_events=150, seed=3, start_scn=1000, table="WEB.PAGES")
    )
    ev_b, _, _ = gen_changes(
        pages_b, ChangeGenConfig(n_events=150, seed=4, start_scn=50000, table="WEB.ARCHIVE", tx_prefix="tb")
    )
    changelog = str(tmp_path / "changelog")
    write_event_batches(ev_a, changelog, events_per_file=60)
    write_event_batches(ev_b, changelog, events_per_file=60)

    assert discover_tables(changelog) == ["WEB.ARCHIVE", "WEB.PAGES"]

    mt = MultiTableEngine(
        str(tmp_path / "lakes"),
        EngineConfig(lake_dir="ignored", num_partitions=4),
    )
    mt.snapshot({"WEB.PAGES": pa_path, "WEB.ARCHIVE": pb_path}, snapshot_scn=999)
    manifests = mt.replay(changelog)
    assert set(manifests) == {"WEB.PAGES", "WEB.ARCHIVE"}

    # per-table lake dirs use sanitized names
    assert os.path.isdir(str(tmp_path / "lakes" / "lake.WEB.PAGES"))
    assert os.path.isdir(str(tmp_path / "lakes" / "lake.WEB.ARCHIVE"))

    for pages, events, table in [
        (pages_a, ev_a, "WEB.PAGES"),
        (pages_b, ev_b, "WEB.ARCHIVE"),
    ]:
        base = {
            r["url"]: {k: v for k, v in r.items() if k != "url"}
            for r in pages.to_pylist()
        }
        want = replay_oracle(base, events)
        got = table_to_state(mt.engine_for(table).to_arrow())
        assert not state_diff(got, want), (table, state_diff(got, want))


def test_whitelist_restricts_tables(ray_session, tmp_path):
    pages = gen_pages(20, seed=5)
    p = str(tmp_path / "p.parquet")
    pq.write_table(pages, p)
    ev, _, _ = gen_changes(pages, ChangeGenConfig(n_events=80, seed=6, table="WEB.PAGES"))
    ev2, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=80, seed=7, start_scn=90000, table="OTHER.STUFF", tx_prefix="to")
    )
    changelog = str(tmp_path / "clog")
    write_event_batches(ev, changelog, events_per_file=100)
    write_event_batches(ev2, changelog, events_per_file=100)

    mt = MultiTableEngine(
        str(tmp_path / "lakes"),
        EngineConfig(lake_dir="ignored", num_partitions=2, table_whitelist=("WEB",)),
    )
    mt.snapshot({"WEB.PAGES": p}, snapshot_scn=999)
    manifests = mt.replay(changelog)
    assert set(manifests) == {"WEB.PAGES"}  # OTHER.* filtered by whitelist


def test_multitable_streaming_fanout(ray_session, tmp_path):
    """The streaming variant of the fan-out: per-table poll loops over
    the SAME mixed changelog reach each table's oracle state, with
    foreign-table txn terminators as no-ops on a table's shards."""
    pages_a = gen_pages(20, seed=5)
    pages_b = gen_pages(15, seed=6)
    pa_path = str(tmp_path / "a.parquet")
    pb_path = str(tmp_path / "b.parquet")
    pq.write_table(pages_a, pa_path)
    pq.write_table(pages_b, pb_path)

    ev_a, _, _ = gen_changes(
        pages_a, ChangeGenConfig(n_events=100, seed=7, start_scn=1000, table="WEB.PAGES")
    )
    ev_b, _, _ = gen_changes(
        pages_b, ChangeGenConfig(n_events=100, seed=8, start_scn=50000, table="WEB.ARCHIVE", tx_prefix="tb")
    )
    changelog = str(tmp_path / "changelog")
    write_event_batches(ev_a, changelog, events_per_file=40)
    write_event_batches(ev_b, changelog, events_per_file=40)

    mt = MultiTableEngine(
        str(tmp_path / "lakes"),
        EngineConfig(lake_dir="ignored", num_partitions=4),
    )
    mt.snapshot({"WEB.PAGES": pa_path, "WEB.ARCHIVE": pb_path}, snapshot_scn=999)
    applied = mt.stream(changelog, max_polls=6, num_shards=2, poll_interval=0.01)
    assert set(applied) == {"WEB.PAGES", "WEB.ARCHIVE"}
    assert all(n > 0 for n in applied.values()), applied

    for pages, events, table in [
        (pages_a, ev_a, "WEB.PAGES"),
        (pages_b, ev_b, "WEB.ARCHIVE"),
    ]:
        base = {
            r["url"]: {k: v for k, v in r.items() if k != "url"}
            for r in pages.to_pylist()
        }
        want = replay_oracle(base, events)
        got = table_to_state(mt.engine_for(table).to_arrow())
        assert not state_diff(got, want), (table, state_diff(got, want))
