"""Seeded fuzz matrix: randomized scenario mixes, engine vs oracle.

Each seed draws a different combination of rollbacks, set-to-null,
unreadable rows, interleaving, skew, open txns, schema evolution, file
splits and partition counts; the engine's final lake must equal the
single-process dict oracle for every one.
"""

import pyarrow.parquet as pq
import pytest

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


@pytest.mark.parametrize("seed", range(40, 48))
def test_fuzz_scenarios(ray_session, tmp_path, seed):
    gen_cfg = ChangeGenConfig(
        n_events=220,
        seed=seed,
        p_rollback=0.05 * (seed % 4),
        p_set_null=0.1 if seed % 2 else 0.0,
        p_unreadable=0.05 if seed % 3 == 0 else 0.0,
        max_open_txns=2 + seed % 5,
        leave_open=seed % 3,
        zipf_s=1.2 if seed % 2 else None,
        evolution_at_scn=1100 if seed % 3 == 0 else None,
    )
    pages = gen_pages(35, seed=seed)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(pages, gen_cfg)
    changelog = str(tmp_path / "changelog")
    write_event_batches(events, changelog, events_per_file=30 + 17 * (seed % 4))

    eng = Engine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            num_partitions=2 + seed % 6,
            max_events_per_checkpoint=120,  # force several micro-batches
            salt_factor=1 + seed % 3,  # exercise the salted fold too
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
    assert not state_diff(got, want), (seed, state_diff(got, want))
