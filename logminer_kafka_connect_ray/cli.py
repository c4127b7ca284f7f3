"""CLI entry point -- the ``ray job submit`` surface.

North-rule requirement: "run via ray job submit on a fixed-size
multi-node Ray cluster".  Usage:

    ray job submit -- python -m logminer_kafka_connect_ray.cli \\
        snapshot --lake /data/lake --base /data/pages --scn 999
    ray job submit -- python -m logminer_kafka_connect_ray.cli \\
        replay --lake /data/lake --changelog /data/changelog
    python -m logminer_kafka_connect_ray.cli stream --lake ... \\
        --changelog ... --polls 10

This module (not the library) owns the Ray session: inside ``ray job
submit`` the cluster is already initialised and ``ray.init()`` attaches;
standalone it starts local mode.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="logminer-kafka-connect-ray")
    p.add_argument(
        "command",
        choices=["snapshot", "replay", "stream", "show", "history",
                 "vacuum", "erase", "query", "lookup", "scan", "repair",
                 "compact"],
    )
    p.add_argument("--keep", type=int, default=2,
                   help="vacuum: versions to retain")
    p.add_argument("--keys", default="",
                   help="erase: comma-separated record keys (urls) to "
                        "delete as one copy-on-write version (GDPR "
                        "right-to-erasure; vacuum afterwards completes "
                        "the physical forget); lookup: keys to point-"
                        "read via hash-pruned partition probe")
    p.add_argument("--lake", help="lake dir (required except for query)")
    p.add_argument("--name", help="query: registered pipeline name "
                                  "(see __ray_entry__.queries())")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="query: input table directory")
    p.add_argument("--out", help="query: write result parquet here "
                                 "instead of printing a preview")
    p.add_argument("--base", help="base table parquet (snapshot)")
    p.add_argument("--scn", type=int, default=None,
                   help="snapshot SCN (snapshot; default 0) / compaction "
                        "watermark scn_hi (compact; default: unbounded)")
    p.add_argument("--changelog", help="change-event parquet dir")
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--max-events-per-checkpoint", type=int, default=50_000_000)
    p.add_argument("--table-whitelist", default="", help="comma-separated")
    p.add_argument("--polls", type=int, default=10, help="stream poll count")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--start-scn", type=int, default=0,
                   help="snapshot-less start: replay history from this "
                        "SCN with no initial snapshot (reference start.scn)")
    p.add_argument("--salt-factor", type=int, default=1,
                   help="salted two-level fold sub-shards per partition "
                        "(>1 adds an exchange; use for hot partitions)")
    p.add_argument("--changelog-format", default="struct",
                   choices=["struct", "redo_sql"])
    p.add_argument("--hosts", default="",
                   help="scan: comma-separated url hosts -- partitions "
                        "whose Bloom stats exclude all of them are "
                        "never opened")
    p.add_argument("--ts-lo", type=int, default=None,
                   help="scan: warc_ts window lower bound (int64 us)")
    p.add_argument("--ts-hi", type=int, default=None,
                   help="scan: warc_ts window upper bound (int64 us)")
    p.add_argument("--corrections", default=None,
                   help="repair: parquet of flat RESOLVED corrected "
                        "events (key, commit_scn, scn, row_id, op, "
                        "set_mask, a_*/b_*) from the repair tooling")
    p.add_argument("--base-version", type=int, default=1,
                   help="repair: retained lake version predating every "
                        "correction (PITR base)")
    p.add_argument("--transform", default=None, metavar="MODULE:FUNC",
                   help="user single-message transform: dotted path to "
                        "a module-level pa.Table -> pa.Table callable "
                        "(the reference's Kafka Connect SMT config "
                        "analog), e.g. mypkg.transforms:redact_pii")
    args = p.parse_args(argv)

    transform = None
    if args.transform:
        import importlib

        mod_name, _, fn_name = args.transform.partition(":")
        if not fn_name:
            p.error("--transform must be MODULE:FUNC")
        transform = getattr(importlib.import_module(mod_name), fn_name)

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    if args.command == "query":
        # run any registered pipeline from the driver contract surface
        # (one name = one Ray Data pipeline + one DuckDB-checkable
        # oracle; the ray job submit analog of queries())
        if not args.name:
            p.error("query requires --name")
        import importlib.util
        import os
        import sys

        entry = sys.modules.get("__ray_entry__")
        if entry is None:
            entry_path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "__ray_entry__.py")
            spec = importlib.util.spec_from_file_location(
                "__ray_entry__", entry_path
            )
            if spec is None or spec.loader is None or not os.path.exists(
                entry_path
            ):
                p.error(
                    "query requires the repo checkout: no __ray_entry__.py "
                    f"next to the package (looked at {entry_path})"
                )
            entry = importlib.util.module_from_spec(spec)
            # register BEFORE exec so a second loader (or a script doing
            # `import __ray_entry__`) reuses this module instead of
            # re-executing it
            sys.modules["__ray_entry__"] = entry
            spec.loader.exec_module(entry)
        qs = entry.queries()
        if args.name not in qs:
            p.error(f"unknown query {args.name!r}; known: {sorted(qs)}")
        res = qs[args.name](args.sf_dir)
        import pyarrow as pa

        if not isinstance(res, pa.Table):  # Dataset / pandas result
            res = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
        if args.out:
            import pyarrow.parquet as pq

            pq.write_table(res, args.out)
            print(json.dumps({"rows": res.num_rows, "out": args.out}))
        else:
            print(res.slice(0, 20).to_pandas().to_string())
            print(json.dumps({"rows": res.num_rows}))
        ray.shutdown()
        return 0

    if not args.lake:
        if args.command == "compact":
            # compaction is lake-independent (log in -> log out); the
            # config only supplies key/partitions/whitelist/format.
            # Use a private per-invocation scratch dir (not a fixed
            # world-shared /tmp name) so nothing can collide or be
            # symlink-planted even if a future Engine touches lake_dir.
            import tempfile

            args.lake = tempfile.mkdtemp(prefix="lkc-compact-")
        else:
            p.error(f"{args.command} requires --lake")

    from logminer_kafka_connect_ray.config import EngineConfig
    from logminer_kafka_connect_ray.pipelines.engine import Engine

    cfg = EngineConfig(
        lake_dir=args.lake,
        num_partitions=args.partitions,
        max_events_per_checkpoint=args.max_events_per_checkpoint,
        table_whitelist=tuple(
            x for x in args.table_whitelist.split(",") if x.strip()
        ),
        start_scn=args.start_scn,
        salt_factor=args.salt_factor,
        changelog_format=args.changelog_format,
        transform=transform,
    )
    eng = Engine(cfg)

    if args.command == "snapshot":
        if not args.base:
            p.error("snapshot requires --base")
        m = eng.snapshot(args.base, args.scn if args.scn is not None else 0)
    elif args.command == "replay":
        if not args.changelog:
            p.error("replay requires --changelog")
        m = eng.replay(args.changelog)
    elif args.command == "stream":
        if not args.changelog:
            p.error("stream requires --changelog")
        from logminer_kafka_connect_ray.pipelines.streaming import StreamingEngine

        stream = StreamingEngine(eng, args.changelog)
        applied = stream.run(max_polls=args.polls)
        stream.shutdown()
        m = eng.store.load()
        print(json.dumps({"applied_rows": applied, "version": m.version if m else None}))
        ray.shutdown()
        return 0
    elif args.command == "lookup":
        # hash-pruned point read: serve specific keys without a scan
        keys = [k for k in args.keys.split(",") if k]
        if not keys:
            p.error("lookup requires --keys")
        t = eng.lookup(keys)
        if args.out:
            import pyarrow.parquet as pq

            pq.write_table(t, args.out)
        else:
            print(t.to_pandas().to_string())
        print(json.dumps({"rows": t.num_rows, **eng.last_lookup_stats}))
        ray.shutdown()
        return 0
    elif args.command == "scan":
        # stats-pruned predicate scan: host Bloom + zonemap decide
        # which partition files are even opened
        hosts = [h for h in args.hosts.split(",") if h] or None
        ts_range = (
            (args.ts_lo, args.ts_hi)
            if args.ts_lo is not None or args.ts_hi is not None
            else None
        )
        if hosts is None and ts_range is None:
            p.error("scan requires --hosts and/or --ts-lo/--ts-hi")
        ds = eng.scan(hosts=hosts, ts_range=ts_range)
        if args.out:
            ds.write_parquet(args.out)
            n = None
        else:
            import pyarrow as pa

            tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
            n = sum(t.num_rows for t in tbls)
            if tbls:
                print(pa.concat_tables(tbls).slice(0, 20)
                      .to_pandas().to_string())
        print(json.dumps({"rows": n, **eng.last_scan_stats}))
        ray.shutdown()
        return 0
    elif args.command == "compact":
        if not args.changelog or not args.out:
            p.error("compact requires --changelog and --out")
        from logminer_kafka_connect_ray.pipelines.compaction import (
            compact_changelog,
        )

        # comma-separated dirs = incremental compaction
        # (prev compacted output + new tail segments)
        chlog = (args.changelog.split(",") if "," in args.changelog
                 else args.changelog)
        metrics = compact_changelog(
            cfg, chlog, args.out,
            # explicit `--scn 0` means "compact nothing above SCN 0",
            # not "unbounded" -- the argparse default is None, so no
            # falsy coercion is needed
            scn_hi=args.scn,
        )
        print(json.dumps(metrics))
        ray.shutdown()
        return 0
    elif args.command == "repair":
        if not args.changelog or not args.corrections:
            p.error("repair requires --changelog and --corrections")
        import pyarrow.parquet as pq

        m = eng.repair(
            args.changelog,
            pq.read_table(args.corrections),
            base_version=args.base_version,
        )
        print(json.dumps({"version": m.version, **eng.last_repair_stats}))
        ray.shutdown()
        return 0
    elif args.command == "history":
        latest = eng.store.latest_version()
        if latest is None:
            print(json.dumps({"error": "no manifest"}))
            ray.shutdown()
            return 1
        for v in range(1, latest + 1):
            mv = eng.store.load(v)
            if mv is None:
                continue  # vacuumed
            print(json.dumps({
                "version": mv.version, "phase": mv.phase,
                "watermark_scn": mv.watermark_scn,
                "schema_version": mv.schema_version,
                "rows": sum(x.rows for x in mv.partitions),
                "metrics": mv.metrics,
            }))
        ray.shutdown()
        return 0
    elif args.command == "vacuum":
        stats = eng.vacuum(keep_versions=args.keep)
        print(json.dumps(stats))
        ray.shutdown()
        return 0
    elif args.command == "erase":
        keys = [k for k in args.keys.split(",") if k]
        if not keys:
            p.error("erase requires --keys")
        m = eng.erase(keys)
    else:  # show
        m = eng.store.load()
        if m is None:
            print(json.dumps({"error": "no manifest"}))
            ray.shutdown()
            return 1

    print(
        json.dumps(
            {
                "version": m.version,
                "phase": m.phase,
                "watermark_scn": m.watermark_scn,
                "schema_version": m.schema_version,
                "rows": sum(x.rows for x in m.partitions),
                "partitions": len([x for x in m.partitions if x.file]),
                "metrics": m.metrics,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
