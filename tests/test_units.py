"""Unit tests for small operators: hashing, naming, text functions,
changelog-source pruning/gap detection, envelope emission."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.functions.hashing import (
    fnv1a_u64,
    hash_probe,
    partition_ids,
)
from logminer_kafka_connect_ray.functions.text import (
    extract_text_batch,
    extract_text_one,
)
from logminer_kafka_connect_ray.naming import TableRef, matches_whitelist, sanitize_name
from logminer_kafka_connect_ray.sources import changelog as cl


# --- hashing -----------------------------------------------------------
def test_fnv_matches_scalar_reference():
    def fnv_scalar(s: str) -> int:
        h = 0xCBF29CE484222325
        for b in s.encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    strings = ["", "a", "hello world", "https://site1.example/p/42", "éè☃"]
    got = fnv1a_u64(pa.array(strings))
    for s, g in zip(strings, got):
        assert int(g) == fnv_scalar(s)
    # python-list input path agrees with arrow input path
    got2 = fnv1a_u64(strings)
    assert (got == got2).all()


def test_partition_ids_stable_and_in_range():
    urls = [f"https://site{i % 7}.example/p/{i}" for i in range(100)]
    p1 = partition_ids(pa.array(urls), 16)
    p2 = partition_ids(pa.array(urls), 16)
    assert (p1 == p2).all()
    assert p1.min() >= 0 and p1.max() < 16
    assert hash_probe(16) == hash_probe(16)


# --- naming (SourceDatabaseNameService.kt / TableId.kt) ----------------
def test_sanitize_name():
    assert sanitize_name("db.OWNER.T$TAB LE") == "db.OWNER.T_TAB_LE"
    assert sanitize_name("a-b_c.9") == "a-b_c.9"


def test_table_ref():
    r = TableRef("WEB", "PAGES")
    assert r.full_name == "WEB.PAGES"
    assert r.output_name("lake") == "lake.WEB.PAGES"
    with pytest.raises(ValueError):
        TableRef("", "X")
    with pytest.raises(ValueError):
        TableRef("A B", "X")


def test_whitelist_semantics():
    """SourceConnectorConfig.kt:86-97: OWNER.TABLE exact, OWNER matches
    all tables of the owner; empty whitelist matches everything."""
    assert matches_whitelist("WEB.PAGES", ())
    assert matches_whitelist("WEB.PAGES", ("WEB.PAGES",))
    assert matches_whitelist("web.pages", ("WEB.PAGES",))
    assert matches_whitelist("WEB.PAGES", ("WEB",))
    assert not matches_whitelist("OTHER.PAGES", ("WEB",))
    assert not matches_whitelist("WEB.PAGES", ("WEB.OTHER",))


# --- text extraction (the byte-identical invariant function) -----------
def test_extract_batch_matches_scalar():
    htmls = [
        b"<html><body><h1>A</h1> <p>b  c</p></body></html>",
        b"plain   text\twith\nwhitespace",
        b"<a href='x'>link</a>trail",
        b"",
    ]
    batch = extract_text_batch(pa.array(htmls, pa.binary())).to_pylist()
    for h, got in zip(htmls, batch):
        assert got == extract_text_one(h)


# --- changelog source (LogminerSession / LogminerFetcher analogs) ------
def make_files(tmp_path, ranges):
    paths = []
    for lo, hi in ranges:
        t = pa.table({"scn": pa.array(list(range(lo, hi + 1)), pa.int64())})
        p = str(tmp_path / f"batch-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def test_scn_file_pruning(tmp_path):
    make_files(tmp_path, [(0, 10), (11, 20), (21, 30)])
    files = cl.list_batch_files(str(tmp_path))
    assert [(f.scn_min, f.scn_max) for f in files] == [(0, 10), (11, 20), (21, 30)]
    kept = cl.prune_files(files, scn_lo=10, scn_hi=25)
    assert [(f.scn_min, f.scn_max) for f in kept] == [(11, 20), (21, 30)]
    assert cl.prune_files(files, 30, None) == []


def test_gap_warning(tmp_path):
    """Deleted-archive-log analog: warn and continue
    (LogminerFetcher.kt:92-97)."""
    make_files(tmp_path, [(0, 10), (25, 30)])
    files = cl.list_batch_files(str(tmp_path))
    warnings = cl.check_contiguity(files, start_scn=None)
    assert len(warnings) == 1 and "gap" in warnings[0].lower()
    assert cl.check_contiguity(
        cl.list_batch_files(str(tmp_path))[:1], start_scn=None
    ) == []


def test_microbatch_planning(tmp_path):
    make_files(tmp_path, [(0, 10), (11, 20), (21, 30), (31, 40)])
    files = cl.list_batch_files(str(tmp_path))
    plan = cl.plan_microbatches(files, max_events=25)
    assert len(plan) == 2
    (f1, _, hi1), (f2, _, hi2) = plan
    assert hi1 == 20 and hi2 == 40
    assert len(f1) == 2 and len(f2) == 2


# --- envelope emission (ConnectSchemaFactory analog) -------------------
def test_envelope_and_tombstones():
    from logminer_kafka_connect_ray.stages.envelope import EnvelopeStage

    tschema = pa.schema([("url", pa.string()), ("text", pa.string())])
    flat = pa.table(
        {
            "scn": pa.array([1, 2, 3], pa.int64()),
            "row_id": pa.array(["a", "b", "c"]),
            "commit_scn": pa.array([5, 5, 6], pa.int64()),
            "tx_id": pa.array(["t1", "t1", "t2"]),
            "op": pa.array(["i", "u", "d"]),
            "ts_ms": pa.array([1000, 2000, 3000], pa.timestamp("ms", tz="UTC")),
            "table": pa.array(["WEB.PAGES"] * 3),
            "url": pa.array(["u1", "u2", "u3"]),
            "set_mask": pa.array([1, 1, 0], pa.int64()),
            "a_text": pa.array(["x", "y", None]),
            "b_text": pa.array([None, "old", "gone"]),
        }
    )
    stage = EnvelopeStage(schemas.schema_to_json(tschema), "url", emit_tombstones=True)
    out = stage(flat)
    rows = out.to_pylist()
    assert len(rows) == 4  # 3 events + 1 tombstone
    ins, upd, dele, tomb = rows
    assert ins["op"] == "i" and ins["before"] is None
    assert ins["after"] == {"url": "u1", "text": "x"}
    assert upd["before"] == {"url": "u2", "text": "old"}
    assert upd["after"] == {"url": "u2", "text": "y"}
    assert dele["after"] is None and dele["before"] == {"url": "u3", "text": "gone"}
    assert dele["source"]["connector"] == "logminer-kafka-connect-ray"
    assert dele["source"]["commit_scn"] == 6
    assert tomb["tombstone"] is True and tomb["key"] == "u3"
    assert tomb["before"] is None and tomb["after"] is None


def test_collect_txn_info_serial_fallback(tmp_path):
    """collect_txn_info without a Ray session (serial path) matches the
    semantics of the parallel path."""
    from logminer_kafka_connect_ray.stages.txn import collect_txn_info
    from logminer_kafka_connect_ray import schemas as sch

    rows = [
        {"scn": 1, "row_id": "a", "tx_id": "t1", "op": "i"},
        {"scn": 2, "row_id": "b", "tx_id": "t2", "op": "u"},
        {"scn": 3, "row_id": "c", "tx_id": "t1", "op": "commit", "commit_scn": 3},
        {"scn": 4, "row_id": "d", "tx_id": "t3", "op": "rollback", "commit_scn": 4},
    ]
    t = pa.Table.from_pylist(rows)
    p = str(tmp_path / "b1.parquet")
    pq.write_table(t, p)
    info = collect_txn_info([p], parallel=False)
    assert info.n_commit == 1
    assert info.n_rolled == 1
    assert info.n_open_rows == 1          # t2 has no terminator
    assert info.min_open_scn == 2


def test_engine_changelog_surface(ray_session, tmp_path):
    """Engine.changelog(): the reference's OUTPUT surface as a Dataset;
    config.emit_tombstones controls the (key, null) delete markers."""
    import pyarrow.parquet as pq

    from logminer_kafka_connect_ray import EngineConfig
    from logminer_kafka_connect_ray.pipelines.engine import Engine
    from logminer_kafka_connect_ray.testing.gen import (
        ChangeGenConfig,
        gen_changes,
        gen_pages,
        write_event_batches,
    )

    pages = gen_pages(20)
    pq.write_table(pages, str(tmp_path / "pages.parquet"))
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=80, seed=66, p_delete=0.3)
    )
    changelog = str(tmp_path / "clog")
    write_event_batches(events, changelog, events_per_file=40)

    committed = {e["tx_id"] for e in events if e["op"] == "commit"}
    n_committed = sum(
        1 for e in events
        if e["op"] not in ("commit", "rollback") and e["tx_id"] in committed
    )
    n_deletes = sum(
        1 for e in events
        if e["op"] == "d" and e["tx_id"] in committed
    )
    assert n_deletes > 0

    for tomb in (False, True):
        eng = Engine(
            EngineConfig(lake_dir=str(tmp_path / f"lake{tomb}"),
                         num_partitions=2, emit_tombstones=tomb)
        )
        eng.snapshot(str(tmp_path / "pages.parquet"), 999)
        env = eng.changelog(changelog).to_pandas()
        want = n_committed + (n_deletes if tomb else 0)
        assert len(env) == want, (tomb, len(env), want)
        assert env["tombstone"].sum() == (n_deletes if tomb else 0)
