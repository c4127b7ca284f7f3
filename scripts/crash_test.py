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
        msg = one_round(seed0 + i, repo_root)
        print(msg, flush=True)
        if "OK" not in msg:
            failures += 1
    ray.shutdown()
    print(f"{n - failures}/{n} rounds OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
