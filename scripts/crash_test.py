"""Kill -9 crash-consistency harness: a replay subprocess is
SIGKILLed at a random point mid-replay, then a FRESH process resumes
from the manifest; the final lake state must equal the dict oracle.

This exercises the real durability contract (atomic tmp+rename
partition publish, idempotent versioned manifest, exactly-once
resume) under actual process death -- not a simulated interruption.

Usage:
    python scripts/crash_test.py [n_rounds] [seed0]

Each round: fresh lake + snapshot -> child process replays a
multi-micro-batch changelog -> parent SIGKILLs the child after a
random delay (sometimes letting it finish: clean-completion rounds
are valid too) -> a new process runs replay() again (resume is the
same call: the manifest IS the offset) -> state compared to the
oracle.  Exits nonzero on the first divergence.
"""

from __future__ import annotations

import os
import random
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = """
import sys
sys.path.insert(0, {root!r})
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from logminer_kafka_connect_ray import EngineConfig
from logminer_kafka_connect_ray.pipelines.engine import Engine
eng = Engine(EngineConfig(lake_dir={lake!r}, num_partitions=4,
                          max_events_per_checkpoint=60))
eng.replay({changelog!r})
ray.shutdown()
"""


def one_round(seed: int, repo_root: str) -> str:
    import pyarrow.parquet as pq

    from logminer_kafka_connect_ray import EngineConfig
    from logminer_kafka_connect_ray.pipelines.engine import Engine
    from logminer_kafka_connect_ray.testing.compare import (
        state_diff,
        table_to_state,
    )
    from logminer_kafka_connect_ray.testing.gen import (
        ChangeGenConfig,
        gen_changes,
        gen_pages,
        write_event_batches,
    )
    from logminer_kafka_connect_ray.testing.oracle import replay_oracle

    rng = random.Random(seed)
    work = tempfile.mkdtemp(prefix=f"lkc-crash-{seed}-")
    try:
        pages = gen_pages(30, seed=seed)
        pages_path = f"{work}/pages.parquet"
        pq.write_table(pages, pages_path)
        events, _, _ = gen_changes(
            pages,
            ChangeGenConfig(
                n_events=400, seed=seed, p_rollback=0.1,
                max_open_txns=4, leave_open=0,
            ),
        )
        changelog = f"{work}/changelog"
        write_event_batches(events, changelog, events_per_file=40)
        lake = f"{work}/lake"

        # snapshot in-process (the crash target is the replay)
        eng = Engine(EngineConfig(lake_dir=lake, num_partitions=4,
                                  max_events_per_checkpoint=60))
        eng.snapshot(pages_path, 999)

        script = CHILD.format(root=repo_root, lake=lake, changelog=changelog)
        child = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        delay = rng.uniform(2.0, 12.0)
        try:
            child.wait(timeout=delay)
            outcome = "completed-before-kill"
        except subprocess.TimeoutExpired:
            os.killpg(child.pid, signal.SIGKILL)
            child.wait()
            outcome = f"killed@{delay:.1f}s"

        # fresh process resumes; replay() is idempotent on complete lakes
        rc = subprocess.run(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode
        if rc != 0:
            return f"seed {seed}: RESUME FAILED rc={rc} ({outcome})"

        base = {
            r["url"]: {k: v for k, v in r.items() if k != "url"}
            for r in pages.to_pylist()
        }
        want = replay_oracle(base, events)
        got = table_to_state(
            Engine(
                EngineConfig(lake_dir=lake, num_partitions=4)
            ).to_arrow()
        )
        diff = state_diff(got, want)
        if diff:
            return f"seed {seed}: STATE DIVERGED ({outcome}): {diff}"
        return f"seed {seed}: OK ({outcome})"
    finally:
        shutil.rmtree(work, ignore_errors=True)


CHILD_REPAIR = """
import sys
sys.path.insert(0, {root!r})
import ray
import pyarrow.parquet as pq
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from logminer_kafka_connect_ray import EngineConfig
from logminer_kafka_connect_ray.pipelines.engine import Engine
eng = Engine(EngineConfig(lake_dir={lake!r}, num_partitions=4))
eng.repair({changelog!r}, pq.read_table({corrections!r}))
ray.shutdown()
"""


def repair_round(seed: int, repo_root: str) -> str:
    """Kill -9 DURING a dead-letter repair, then re-run the repair in
    a fresh process: the compensating-write path shares the atomic
    partition publish + versioned-manifest machinery with replay, so
    a crash at any point (before or after the repair manifest lands)
    must still converge to the uncorrupted oracle.  A post-publish
    re-run is a legitimate second repair of the same keys -- the
    compensating values are deterministic, so state is unchanged."""
    import copy

    import pyarrow.parquet as pq

    from logminer_kafka_connect_ray import EngineConfig, schemas
    from logminer_kafka_connect_ray.pipelines.engine import Engine
    from logminer_kafka_connect_ray.testing.compare import (
        state_diff,
        table_to_state,
    )
    from logminer_kafka_connect_ray.testing.gen import (
        ChangeGenConfig,
        corrections_for,
        gen_changes,
        gen_pages,
        write_event_batches,
    )
    from logminer_kafka_connect_ray.testing.oracle import replay_oracle

    rng = random.Random(seed)
    work = tempfile.mkdtemp(prefix=f"lkc-crash-rep-{seed}-")
    try:
        pages = gen_pages(30, seed=seed)
        pages_path = f"{work}/pages.parquet"
        pq.write_table(pages, pages_path)
        events, _, _ = gen_changes(
            pages,
            ChangeGenConfig(n_events=300, seed=seed, p_rollback=0.1,
                            max_open_txns=3, leave_open=0),
        )
        cand = [e for e in events
                if e["op"] in ("i", "u", "d") and e.get("status", 0) != 2]
        corrupt = {e["scn"] for i, e in enumerate(cand) if i % 4 == 0}
        bad_events = []
        for e in events:
            if e["scn"] in corrupt and e["op"] in ("i", "u", "d"):
                e = copy.deepcopy(e)
                e["url"] = None
            bad_events.append(e)
        bad_dir = f"{work}/changelog-bad"
        write_event_batches(bad_events, bad_dir, events_per_file=40)
        lake = f"{work}/lake"

        eng = Engine(EngineConfig(lake_dir=lake, num_partitions=4))
        eng.snapshot(pages_path, 999)
        eng.replay(bad_dir)
        import ray as _r

        dead = {
            s
            for t in _r.get(eng.read_dead_letters().to_arrow_refs())
            if t.num_rows and "scn" in t.column_names
            for s in t.column("scn").to_pylist()
        }
        m = eng.store.load()
        corr = corrections_for(events, dead,
                               schemas.schema_from_json(m.schema))
        corr_path = f"{work}/corrections.parquet"
        pq.write_table(corr, corr_path)

        script = CHILD_REPAIR.format(root=repo_root, lake=lake,
                                     changelog=bad_dir,
                                     corrections=corr_path)
        child = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        delay = rng.uniform(1.5, 8.0)
        try:
            child.wait(timeout=delay)
            outcome = "completed-before-kill"
        except subprocess.TimeoutExpired:
            os.killpg(child.pid, signal.SIGKILL)
            child.wait()
            outcome = f"killed@{delay:.1f}s"

        rc = subprocess.run(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode
        if rc != 0:
            return f"seed {seed}: REPAIR RESUME FAILED rc={rc} ({outcome})"

        base = {
            r["url"]: {k: v for k, v in r.items() if k != "url"}
            for r in pages.to_pylist()
        }
        want = replay_oracle(base, events)
        got = table_to_state(
            Engine(EngineConfig(lake_dir=lake, num_partitions=4)).to_arrow()
        )
        diff = state_diff(got, want)
        if diff:
            return f"seed {seed}: REPAIR STATE DIVERGED ({outcome}): {diff}"
        return f"seed {seed}: OK repair ({outcome})"
    finally:
        shutil.rmtree(work, ignore_errors=True)


CHILD_COMPACT = """
import sys
sys.path.insert(0, {root!r})
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from logminer_kafka_connect_ray import EngineConfig
from logminer_kafka_connect_ray.pipelines.compaction import compact_changelog
compact_changelog(
    EngineConfig(lake_dir={lake!r}, num_partitions=4),
    {changelog!r}, {out_dir!r}, num_files=3,
)
ray.shutdown()
"""


def compaction_round(seed: int, repo_root: str) -> str:
    """Kill -9 DURING changelog compaction, re-run compaction in a
    fresh process (it owns its output dir: stale batch files from the
    crashed attempt are cleared / atomically overwritten), then replay
    the compacted log over the snapshot -- the final state must equal
    the dict oracle of the FULL history."""
    import pyarrow.parquet as pq

    from logminer_kafka_connect_ray import EngineConfig
    from logminer_kafka_connect_ray.pipelines.engine import Engine
    from logminer_kafka_connect_ray.testing.compare import (
        state_diff,
        table_to_state,
    )
    from logminer_kafka_connect_ray.testing.gen import (
        ChangeGenConfig,
        gen_changes,
        gen_pages,
        write_event_batches,
    )
    from logminer_kafka_connect_ray.testing.oracle import replay_oracle

    rng = random.Random(seed)
    work = tempfile.mkdtemp(prefix=f"lkc-crash-compact-{seed}-")
    try:
        pages = gen_pages(30, seed=seed)
        pages_path = f"{work}/pages.parquet"
        pq.write_table(pages, pages_path)
        events, _, _ = gen_changes(
            pages,
            ChangeGenConfig(
                n_events=400, seed=seed, p_rollback=0.1,
                max_open_txns=4, leave_open=0,
            ),
        )
        changelog = f"{work}/changelog"
        write_event_batches(events, changelog, events_per_file=40)
        lake = f"{work}/lake"
        out_dir = f"{work}/compacted"

        script = CHILD_COMPACT.format(
            root=repo_root, lake=lake, changelog=changelog, out_dir=out_dir
        )
        child = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        delay = rng.uniform(2.0, 8.0)
        try:
            child.wait(timeout=delay)
            outcome = "completed-before-kill"
        except subprocess.TimeoutExpired:
            os.killpg(child.pid, signal.SIGKILL)
            child.wait()
            outcome = f"killed@{delay:.1f}s"

        rc = subprocess.run(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode
        if rc != 0:
            return f"seed {seed}: COMPACT RERUN FAILED rc={rc} ({outcome})"
        if not os.path.exists(f"{out_dir}/_compacted.json"):
            return f"seed {seed}: NO COMPLETENESS MANIFEST ({outcome})"

        eng = Engine(EngineConfig(lake_dir=lake, num_partitions=4))
        eng.snapshot(pages_path, 999)
        eng.replay(out_dir)
        base = {
            r["url"]: {k: v for k, v in r.items() if k != "url"}
            for r in pages.to_pylist()
        }
        want = replay_oracle(base, events)
        got = table_to_state(eng.to_arrow())
        diff = state_diff(got, want)
        if diff:
            return f"seed {seed}: STATE DIVERGED ({outcome}): {diff}"
        return f"seed {seed}: OK compaction ({outcome})"
    finally:
        shutil.rmtree(work, ignore_errors=True)


CHILD_SINK = """
import sys
sys.path.insert(0, {root!r})
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from logminer_kafka_connect_ray.pipelines.events import (
    events_running_total_sink,
)
events_running_total_sink({sf!r}, out_dir={out!r})
ray.shutdown()
"""


def sink_round(seed: int, repo_root: str, sf: str | None = None) -> str:
    """Kill -9 DURING a fused sweep-sink write (the round-5 machinery:
    ``sink_prepare`` parameter manifest + ``.tmp-*`` orphan cleanup +
    per-partition atomic publish + published-files-only read-back),
    re-run in a fresh process, and require the resumed sink's
    64-bucket digest to equal a clean single-run digest."""
    if sf is None:
        # same corpus override bench.py honors
        sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rng = random.Random(seed)
    work = tempfile.mkdtemp(prefix=f"lkc-crash-sink-{seed}-")
    try:
        out = f"{work}/sink"
        script = CHILD_SINK.format(root=repo_root, sf=sf, out=out)
        child = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        delay = rng.uniform(2.0, 7.0)
        try:
            child.wait(timeout=delay)
            outcome = "completed-before-kill"
        except subprocess.TimeoutExpired:
            os.killpg(child.pid, signal.SIGKILL)
            child.wait()
            outcome = f"killed@{delay:.1f}s"

        rc = subprocess.run(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode
        if rc != 0:
            return f"seed {seed}: SINK RERUN FAILED rc={rc} ({outcome})"

        import ray.data as rd

        from logminer_kafka_connect_ray.pipelines.dataops import (
            bucket_digest,
            sink_files,
        )
        from logminer_kafka_connect_ray.pipelines.events import (
            events_running_total_sink,
        )

        want = events_running_total_sink(sf, out_dir=f"{work}/ref")
        got = bucket_digest(
            rd.read_parquet(sink_files(out)), "user_id",
            {"sum_event_id": "event_id",
             "sum_cum_cents": "cum_value_cents"},
        )
        if not got.equals(want):
            return f"seed {seed}: SINK DIGEST DIVERGED ({outcome})"
        orphans = [f for f in os.listdir(out) if ".tmp-" in f]
        if orphans:
            return f"seed {seed}: ORPHANS SURVIVED {orphans} ({outcome})"
        return f"seed {seed}: OK sink ({outcome})"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    import ray

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 7000
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    failures = 0
    for i in range(n):
        # rotate the crash target: dead-letter REPAIR, changelog
        # COMPACTION, fused sweep SINK, plain replay (same durability
        # contract, four different write paths)
        fn = {0: repair_round, 1: compaction_round, 2: sink_round}.get(
            (seed0 + i) % 4, one_round
        )
        msg = fn(seed0 + i, repo_root)
        print(msg, flush=True)
        if "OK" not in msg:
            failures += 1
    ray.shutdown()
    print(f"{n - failures}/{n} rounds OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
