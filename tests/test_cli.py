"""CLI surface test: the ray-job-submit entry drives the full lake
lifecycle (snapshot -> replay -> erase -> vacuum -> history/show)."""

import json
import os

import pyarrow.parquet as pq

from logminer_kafka_connect_ray import cli
from logminer_kafka_connect_ray.testing.gen import (
    ChangeGenConfig,
    gen_changes,
    gen_pages,
    write_event_batches,
)


def test_cli_lifecycle(ray_session, tmp_path, monkeypatch, capsys):
    # the session fixture owns Ray: the CLI's shutdown must not kill it
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)

    pages = gen_pages(20)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(pages, ChangeGenConfig(n_events=120, seed=9))
    changelog = str(tmp_path / "clog")
    write_event_batches(events, changelog, events_per_file=60)
    lake = str(tmp_path / "lake")

    assert cli.main(["snapshot", "--lake", lake, "--base", pages_path,
                     "--scn", "999", "--partitions", "3"]) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["version"] == 1 and out1["rows"] == 20

    assert cli.main(["replay", "--lake", lake, "--changelog", changelog,
                     "--partitions", "3"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["version"] >= 2

    # changelog compaction: lake-independent (no --lake needed)
    comp = str(tmp_path / "compacted")
    assert cli.main(["compact", "--changelog", changelog, "--out", comp,
                     "--partitions", "3"]) == 0
    outc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < outc["events_out"] <= outc["events_in"]
    assert os.path.exists(os.path.join(comp, "_compacted.json"))

    url = pages.column("url")[0].as_py()
    url2 = pages.column("url")[7].as_py()
    assert cli.main(["lookup", "--lake", lake,
                     "--keys", f"{url},{url2},https://nope/x",
                     "--partitions", "3"]) == 0
    outl = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert outl["keys_probed"] == 3
    assert 1 <= outl["partitions_read"] <= 3
    assert 0 <= outl["rows"] <= 2  # either url may have been deleted

    host = url.split("/")[2]
    assert cli.main(["scan", "--lake", lake, "--hosts",
                     f"{host},ghost.example", "--partitions", "3"]) == 0
    outs = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert outs["partitions_read"] <= outs["partitions_total"]
    assert outs["rows"] >= 1  # the host has pages in the lake

    # a time window beyond all data: zonemaps prune every partition
    assert cli.main(["scan", "--lake", lake, "--ts-lo",
                     str(10**18), "--partitions", "3"]) == 0
    outz = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert outz["partitions_read"] == 0 and outz["rows"] == 0

    assert cli.main(["erase", "--lake", lake, "--keys", url,
                     "--partitions", "3"]) == 0
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["phase"] == "erase"

    assert cli.main(["vacuum", "--lake", lake, "--keep", "1",
                     "--partitions", "3"]) == 0
    out4 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out4["removed_manifests"] == out3["version"] - 1

    assert cli.main(["history", "--lake", lake, "--partitions", "3"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 1 and lines[0]["version"] == out3["version"]

    assert cli.main(["show", "--lake", lake, "--partitions", "3"]) == 0
    shown = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert shown["version"] == out3["version"]
