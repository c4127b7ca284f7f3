"""Giant-single-transaction stress (round-2 verdict #9).

The reference spills a transaction's buffered rows to a Chronicle
queue once it exceeds ``maxRecordsInMemory`` (``Transaction.kt:59-71``)
and holds the offset below the oldest open txn.  Here:

* batch mode: one txn spanning SEVERAL micro-batches rides the
  open-spill carryover (side-written parquet) until its COMMIT
  arrives, then applies exactly once;
* streaming mode: the same txn exceeds ``max_rows_in_memory`` by 10x,
  forcing shard-actor disk spill, with in-memory rows bounded by the
  budget throughout.
"""

import pyarrow.parquet as pq

from logminer_kafka_connect_ray import EngineConfig
from logminer_kafka_connect_ray.pipelines.engine import Engine
from logminer_kafka_connect_ray.pipelines.streaming import StreamingEngine
from logminer_kafka_connect_ray.testing.compare import state_diff, table_to_state
from logminer_kafka_connect_ray.testing.gen import EPOCH_US, gen_pages, write_event_batches
from logminer_kafka_connect_ray.testing.oracle import replay_oracle

SNAPSHOT_SCN = 999


def _giant_txn_events(pages, n_rows: int, tx_id: str = "gtx-1"):
    """One huge txn: n_rows full-image INSERT events cycling the urls,
    commit marker last.  Final value per url = its last event."""
    urls = [r["url"] for r in pages.to_pylist()]
    events = []
    scn = 1000
    for i in range(n_rows):
        url = urls[i % len(urls)]
        row = {
            "warc_ts": EPOCH_US + scn * 1_000_000,
            "html": f"<html><body>g{i}</body></html>".encode(),
            "text": f"g{i}",
            "lang": "xx",
        }
        events.append(
            {
                "scn": scn, "row_id": f"AAA{scn:09d}", "commit_scn": None,
                "url": url, "tx_id": tx_id, "op": "i",
                "ts_ms": (EPOCH_US + scn * 1_000_000) // 1000,
                "table": "WEBCRAWL.PAGES", "username": "WEBCRAWL",
                "status": 0, "before": None, "after": row, "set_cols": None,
            }
        )
        scn += 1
    events.append(
        {
            "scn": scn, "row_id": f"AAA{scn:09d}", "commit_scn": scn,
            "tx_id": tx_id, "op": "commit",
            "ts_ms": (EPOCH_US + scn * 1_000_000) // 1000,
            "table": "WEBCRAWL.PAGES", "username": "WEBCRAWL",
            "status": 0, "before": None, "after": None, "set_cols": None,
        }
    )
    return events


def _base_state(pages):
    return {
        r["url"]: {k: v for k, v in r.items() if k != "url"}
        for r in pages.to_pylist()
    }


def test_giant_txn_spans_micro_batches(ray_session, tmp_path):
    """3000-row txn vs max_events_per_checkpoint=500: six micro-batches
    carry the open spill forward; the commit in the last batch applies
    every row exactly once (exactly-once table state)."""
    pages = gen_pages(20)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events = _giant_txn_events(pages, 3000)
    changelog = str(tmp_path / "changelog")
    write_event_batches(events, changelog, events_per_file=250)

    eng = Engine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"), num_partitions=4,
            max_events_per_checkpoint=500,
        )
    )
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    m = eng.replay(changelog)

    # the txn stayed open across intermediate versions (spill carried)
    carried = [
        v for v in range(2, m.version)
        if eng.store.load(v).open_txn_spill is not None
    ]
    assert len(carried) >= 3, "expected multi-version open-spill carryover"
    # open-row volume grew with the txn until the commit batch
    mid = eng.store.load(2 + len(carried) // 2)
    assert mid.metrics["open_events"] > 0
    assert mid.min_open_scn == 1000
    # final manifest: nothing left open
    assert m.open_txn_spill is None

    got = table_to_state(eng.to_arrow())
    want = replay_oracle(_base_state(pages), events)
    diffs = state_diff(got, want)
    assert not diffs, diffs


def test_giant_txn_streaming_spill_bounded(ray_session, tmp_path):
    """Streaming: a 2000-row txn against max_rows_in_memory=200 (10x)
    must spill to disk, keep shard memory bounded, and still apply
    exactly once on commit."""
    pages = gen_pages(10)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events = _giant_txn_events(pages, 2000)
    body, commit = events[:-1], events[-1]
    changelog = str(tmp_path / "changelog")
    # body arrives first (no commit yet)
    write_event_batches(body, changelog, events_per_file=400)

    eng = Engine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    stream = StreamingEngine(
        eng, changelog, num_shards=2, poll_interval=0.01,
        max_rows_in_memory=200,
        # pin the TRICKLE regime: this test exercises the per-txn
        # disk-spill semantics (Transaction.kt:59-71); the bulk
        # catch-up path (plasma-block release) has its own test below
        bulk_file_threshold=100,
    )
    stream.run(max_polls=2)
    stats = stream.consolidator.stats()
    assert sum(s["spilled_txns"] for s in stats) >= 1, stats
    for s in stats:
        assert s["rows_in_memory"] <= 200, stats
    assert stream.consolidator.min_open_scn() == 1000
    # lake unchanged while the txn is open
    assert eng.store.load().version == 1

    # commit arrives; everything releases and applies
    write_event_batches([commit], changelog, events_per_file=10)
    stream.run(max_polls=4)
    stream.shutdown()

    got = table_to_state(eng.to_arrow())
    want = replay_oracle(_base_state(pages), events)
    diffs = state_diff(got, want)
    assert not diffs, diffs


def test_giant_txn_streaming_bulk_path(ray_session, tmp_path):
    """Bulk catch-up regime: the same giant open txn arrives as many
    files in one poll.  Rows must stay OUT of the shard actors (plasma
    blocks + metadata only), the watermark must still hold at the open
    txn's min scn, and the commit must release every row exactly once
    through the block release-filter."""
    pages = gen_pages(10)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events = _giant_txn_events(pages, 2000)
    body, commit = events[:-1], events[-1]
    changelog = str(tmp_path / "changelog")
    write_event_batches(body, changelog, events_per_file=400)

    eng = Engine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    stream = StreamingEngine(
        eng, changelog, num_shards=2, poll_interval=0.01,
        max_rows_in_memory=200, bulk_file_threshold=2,
    )
    stream.run(max_polls=2)
    stats = stream.consolidator.stats()
    # metadata-only: no rows buffered in actors, nothing spilled
    assert sum(s["rows_in_memory"] for s in stats) == 0, stats
    assert sum(s["spilled_txns"] for s in stats) == 0, stats
    # but the watermark still knows the open txn (bulk open-txn state
    # lives in the _open_txn_fold summary, not the actors)
    assert stream.min_open_scn() == 1000
    assert stream._open_blocks, "open rows must be retained as block refs"
    assert eng.store.load().version == 1  # lake unchanged while open

    write_event_batches([commit], changelog, events_per_file=10)
    stream.run(max_polls=4)
    assert not stream._open_blocks  # everything released
    stream.shutdown()

    got = table_to_state(eng.to_arrow())
    want = replay_oracle(_base_state(pages), events)
    diffs = state_diff(got, want)
    assert not diffs, diffs


def test_giant_txn_cross_regime(ray_session, tmp_path):
    """One txn whose rows arrive through BOTH regimes: the first chunk
    as a single file (trickle -> shard-actor buffers), the rest as
    many files in one poll (bulk -> plasma blocks + _open_txn_fold
    summary), commit last.  min_open_scn() must stay exact across the
    switch (min over the union of both open-txn stores), the lake must
    stay unchanged while the txn is open, and the commit must release
    the actor-buffered AND the block-resident rows exactly once."""
    pages = gen_pages(10)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events = _giant_txn_events(pages, 1200)
    body, commit = events[:-1], events[-1]
    changelog = str(tmp_path / "changelog")

    eng = Engine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    stream = StreamingEngine(
        eng, changelog, num_shards=2, poll_interval=0.01,
        bulk_file_threshold=3,
    )

    # poll 1: ONE file (trickle) -> rows buffer in the shard actors
    write_event_batches(body[:200], changelog, events_per_file=200)
    stream.run(max_polls=1)
    assert stream._actors_dirty
    assert stream.min_open_scn() == 1000
    assert sum(
        s["rows_in_memory"] for s in stream.consolidator.stats()
    ) == 200

    # poll 2: many files (bulk) -> the SAME txn continues into plasma
    # blocks; the fold summary and the actor store must both know it
    write_event_batches(body[200:], changelog, events_per_file=100)
    stream.run(max_polls=1)
    assert stream._open_blocks, "bulk rows must be block-resident"
    assert stream.min_open_scn() == 1000  # exact across both stores
    assert eng.store.load().version == 1  # nothing applied while open

    # commit arrives alone: releases actor buffers AND blocks
    write_event_batches([commit], changelog, events_per_file=10)
    applied = stream.run(max_polls=4)
    assert applied == 1200
    assert not stream._open_blocks
    assert stream.min_open_scn() is None
    stream.shutdown()

    got = table_to_state(eng.to_arrow())
    want = replay_oracle(_base_state(pages), events)
    diffs = state_diff(got, want)
    assert not diffs, diffs
