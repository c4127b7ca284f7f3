"""One fresh-process flagship replay over the cached bench workload.

A/B harness for replay tuning under this sandbox's heavy CPU-steal
noise (identical runs vary 2-4x): run INTERLEAVED adjacent pairs of
two repo checkouts and compare pairwise, never from single runs.

    # derive/warm the workload once via `python bench.py`, then:
    PYTHONPATH=/root/repo python scripts/bench_replay_only.py /root/repo A
    PYTHONPATH=/some/worktree python scripts/bench_replay_only.py /some/worktree B
    # ... repeated alternately; add 'stats' for per-stage Ray Data stats
"""

import os
import shutil
import sys
import time

sys.path.insert(0, sys.argv[1] if len(sys.argv) > 1 else ".")
import ray

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from logminer_kafka_connect_ray import workload
from logminer_kafka_connect_ray.config import EngineConfig
from logminer_kafka_connect_ray.pipelines.engine import Engine

root = os.environ.get("BENCH_ROOT", "/tmp/lkc_bench/sf0.1-r50")
pages_path = f"{root}/pages.parquet"
changelog = f"{root}/changelog"
for f in os.listdir(changelog):  # warm page cache
    with open(f"{changelog}/{f}", "rb") as fh:
        fh.read()

lake = f"{root}/lake-ab"
shutil.rmtree(lake, ignore_errors=True)
_bs = int(os.environ.get("LKC_BATCH_SIZE", "0")) or None  # A/B knob
eng = Engine(EngineConfig(lake_dir=lake, num_partitions=64, batch_size=_bs))
eng.snapshot(pages_path, workload.SNAPSHOT_SCN)
t0 = time.monotonic()
m = eng.replay(changelog)
dt = time.monotonic() - t0
tag = sys.argv[2] if len(sys.argv) > 2 else "RUN"
print(f"REPLAY {tag} {dt:.3f} t_merge={m.metrics.get('t_merge_s')}")
ray.shutdown()
if "stats" in sys.argv[3:]:
    print(eng.last_stats or "<no stats>")
