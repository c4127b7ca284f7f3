"""Wide-seed differential fuzz campaign: engine vs single-process
oracle over randomized scenario mixes (same matrix as
tests/test_fuzz.py, arbitrary seed range).

Usage:
    python scripts/fuzz_campaign.py [seed_lo seed_hi] [--streaming]

Every seed draws a different mix of rollbacks, SET-to-null,
unreadable rows, open transactions, Zipf skew, schema evolution,
file-split sizes, partition counts and salt factors; the engine's
final lake state must equal the dict oracle for every one.  Exits
nonzero on the first mismatch with the seed named.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

import ray

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

SNAPSHOT_SCN = 999


def run_seed(seed: int, root: str) -> None:
    gen_cfg = ChangeGenConfig(
        n_events=220 + 40 * (seed % 7),
        seed=seed,
        p_rollback=0.05 * (seed % 4),
        p_set_null=0.1 if seed % 2 else 0.0,
        p_unreadable=0.05 if seed % 3 == 0 else 0.0,
        max_open_txns=2 + seed % 5,
        leave_open=seed % 3,
        zipf_s=1.2 if seed % 2 else None,
        evolution_at_scn=1100 if seed % 3 == 0 else None,
    )
    pages = gen_pages(20 + seed % 40, seed=seed)
    pages_path = f"{root}/pages.parquet"
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(pages, gen_cfg)
    changelog = f"{root}/changelog"
    write_event_batches(events, changelog, events_per_file=30 + 17 * (seed % 4))

    eng = Engine(
        EngineConfig(
            lake_dir=f"{root}/lake",
            num_partitions=2 + seed % 6,
            max_events_per_checkpoint=100 + 30 * (seed % 3),
            salt_factor=1 + seed % 3,
        )
    )
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    eng.replay(changelog)

    base = {
        r["url"]: {k: v for k, v in r.items() if k != "url"}
        for r in pages.to_pylist()
    }
    want = replay_oracle(base, events)

    def check(engine, leg: str) -> None:
        got_tbl = engine.to_arrow()
        w = want
        if "fetch_status" in got_tbl.column_names:
            w = {u: dict(r) for u, r in want.items()}
            for row in w.values():
                row.setdefault("fetch_status", None)
        diff = state_diff(table_to_state(got_tbl), w)
        if diff:
            raise AssertionError(f"seed {seed} [{leg}]: {diff}")

    check(eng, "replay")

    if seed % 2 == 0:
        _repair_leg(seed, root, pages_path, events, check)
    else:
        _compaction_leg(seed, root, pages_path, changelog, check)


def _compaction_leg(seed, root, pages_path, changelog, check) -> None:
    """Changelog-compaction leg: compact the same randomized log (one
    replay-equivalent event per key; open-at-tail txns carried
    verbatim, unresolved until their marker appears), replay the
    COMPACTED log into a fresh lake -- state must equal the same dict
    oracle."""
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )

    cfg = EngineConfig(
        lake_dir=f"{root}/lake_compact",
        num_partitions=2 + (seed // 2) % 5,
    )
    compact_changelog(
        cfg, changelog, f"{root}/compacted", num_files=1 + seed % 4
    )
    eng = Engine(cfg)
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    eng.replay(f"{root}/compacted")
    check(eng, "compaction")


def _repair_leg(seed, root, pages_path, events, check) -> None:
    """Corruption + dead-letter-repair leg: null the key of a
    deterministic subset of decodable change events, replay the
    corrupted log (rows dead-letter), then repair with corrections
    decoded from the ORIGINAL rows by the engine's own ChangeDecoder
    -- the repaired lake must equal the same uncorrupted oracle."""
    import copy

    from logminer_kafka_connect_ray import schemas
    from logminer_kafka_connect_ray.testing.gen import corrections_for

    cand = [
        e for e in events
        if e["op"] in ("i", "u", "d") and e.get("status", 0) != 2
    ]
    step = 3 + seed % 4
    corrupt = {e["scn"] for i, e in enumerate(cand) if i % step == 0}
    if not corrupt:
        return
    bad_events = []
    for e in events:
        if e["scn"] in corrupt and e["op"] in ("i", "u", "d"):
            e = copy.deepcopy(e)
            e["url"] = None
        bad_events.append(e)
    bad_dir = f"{root}/changelog-bad"
    write_event_batches(bad_events, bad_dir, events_per_file=40)

    eng = Engine(
        EngineConfig(lake_dir=f"{root}/lake-repair",
                     num_partitions=2 + seed % 5)
    )
    eng.snapshot(pages_path, SNAPSHOT_SCN)
    eng.replay(bad_dir)

    dead = {
        s
        for t in ray.get(eng.read_dead_letters().to_arrow_refs())
        if t.num_rows and "scn" in t.column_names
        for s in t.column("scn").to_pylist()
    }
    if not corrupt <= dead:
        raise AssertionError(
            f"seed {seed} [repair]: corrupt rows not all dead-lettered "
            f"(missing {sorted(corrupt - dead)[:5]})"
        )
    # corrections: re-decode the ORIGINAL rows of committed corrupt
    # events with the engine's own decoder (testing.gen.corrections_for;
    # rolled-back/open txns: nothing to fix)
    m = eng.store.load()
    flat = corrections_for(
        events, dead, schemas.schema_from_json(m.schema)
    )
    if flat.num_rows:
        eng.repair(bad_dir, flat)
    check(eng, "repair")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lo, hi = (int(args[0]), int(args[1])) if len(args) >= 2 else (100, 160)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    failures = []
    for seed in range(lo, hi):
        root = tempfile.mkdtemp(prefix=f"lkc-fuzz-{seed}-")
        try:
            run_seed(seed, root)
            print(f"seed {seed}: OK", flush=True)
        except AssertionError as e:
            failures.append(seed)
            print(f"seed {seed}: FAIL {e}", flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()
    if failures:
        print(f"FAILED seeds: {failures}")
        return 1
    print(f"all {hi - lo} seeds OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
