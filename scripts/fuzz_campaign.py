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
    got_tbl = eng.to_arrow()
    if "fetch_status" in got_tbl.column_names:
        for row in want.values():
            row.setdefault("fetch_status", None)
    got = table_to_state(got_tbl)
    diff = state_diff(got, want)
    if diff:
        raise AssertionError(f"seed {seed}: {diff}")


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
