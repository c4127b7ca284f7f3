"""Wide binary payload stress: multi-KB html rows through the full
engine (block sizing / batch sizing for wide rows, SURVEY.md 7.4.4)."""

import numpy as np
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
from logminer_kafka_connect_ray.functions.text import extract_text_one


def widen(pages: pa.Table, kb: int, seed: int = 9) -> pa.Table:
    """Pad each html with a deterministic ~kb-KB tag-wrapped blob (text
    extraction stays consistent)."""
    rng = np.random.default_rng(seed)
    htmls, texts = [], []
    for h in pages.column("html").to_pylist():
        pad = "".join(
            f"<span data-x=\"{rng.integers(0, 1 << 30)}\"></span>"
            for _ in range(kb * 1024 // 40)
        )
        wide = h[:-14] + pad.encode() + b"</body></html>"
        htmls.append(wide)
        texts.append(extract_text_one(wide))
    t = pages.set_column(
        pages.column_names.index("html"), "html", pa.array(htmls, pa.binary())
    )
    return t.set_column(
        t.column_names.index("text"), "text", pa.array(texts, pa.string())
    )


def test_wide_html_rows_end_to_end(ray_session, tmp_path):
    pages = widen(gen_pages(40), kb=24)          # ~24 KB html per row
    assert sum(len(x) for x in pages.column("html").to_pylist()) > 40 * 15_000
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(pages, ChangeGenConfig(n_events=120, seed=81))
    changelog = str(tmp_path / "changelog")
    write_event_batches(events, changelog, events_per_file=60)

    eng = Engine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            num_partitions=4,
            target_batch_bytes=2 * 1024 * 1024,  # force small row-count batches
        )
    )
    eng.snapshot(pages_path, 999)
    m = eng.replay(changelog)
    # auto batch sizing respected the byte target (24KB rows -> small batches)
    bs = eng._auto_batch_size(f"{changelog}/" + sorted(
        __import__("os").listdir(changelog))[0])
    assert bs <= 32_768

    base = {
        r["url"]: {k: v for k, v in r.items() if k != "url"}
        for r in pages.to_pylist()
    }
    want = replay_oracle(base, events)
    got = table_to_state(eng.to_arrow())
    assert not state_diff(got, want)
