"""Driver-checkable query pipelines (SURVEY.md section 2 inventory).

Each function takes ``sf_dir`` (driver parquet tables) and returns a
Dataset / Arrow table whose columns match the corresponding
``oracle_sql()`` entry in ``__ray_entry__.py`` name-for-name.  The CDC
entries run the REAL engine over the derived workload
(``workload.py``), so the driver's DuckDB comparison is a full
end-to-end correctness gate for snapshot + txn consolidation + LWW
merge + manifest publish.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.compute as pc

from logminer_kafka_connect_ray import schemas, workload
from logminer_kafka_connect_ray.config import EngineConfig
from logminer_kafka_connect_ray.pipelines.engine import Engine
from logminer_kafka_connect_ray.sources import changelog as changelog_src
from logminer_kafka_connect_ray.stages.decode import ChangeDecoder
from logminer_kafka_connect_ray.stages.txn import CommitResolver, collect_txn_info


def _engine_cfg(d: dict[str, str], num_partitions: int = 16) -> EngineConfig:
    return EngineConfig(lake_dir=d["lake"], num_partitions=num_partitions)


def _digest_html(t: pa.Table) -> pa.Table:
    """Replace the raw ``html:binary`` column with ``html_md5:string``.

    The driver's canonicalizer sorts result columns with pandas, which
    cannot factorize ``bytearray`` values (DuckDB BLOB -> pandas), so
    binary payloads must be compared by digest.  Hash equality still
    enforces the byte-identity invariant (SURVEY.md section 1: byte-
    identical html/text per url).
    """
    import hashlib

    idx = t.schema.get_field_index("html")
    digests = [
        hashlib.md5(v).hexdigest() if v is not None else None
        for v in t.column("html").to_pylist()
    ]
    t = t.remove_column(idx)
    return t.add_column(idx, "html_md5", pa.array(digests, pa.string()))


def _fresh_lake(d: dict[str, str]):
    shutil.rmtree(d["lake"], ignore_errors=True)


# ---------------------------------------------------------------------------
# CDC engine end-to-end (S1-S5, T1-T3, M1-M9, J3, A4, D1-D2, O4)
# ---------------------------------------------------------------------------
def cdc_final_state(sf_dir: str) -> pa.Table:
    """Flagship: snapshot + full changelog replay -> final lake state."""
    d = workload.ensure_workload(sf_dir)
    _fresh_lake(d)
    eng = Engine(_engine_cfg(d))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    return _digest_html(eng.to_arrow())


def cdc_final_state_chunked(sf_dir: str) -> pa.Table:
    """DBLog-style chunked snapshot + full replay -> final lake state.

    Each snapshot chunk is read AS OF A DIFFERENT SCN (the simulated
    database keeps moving while the snapshot runs --
    ``workload.ensure_chunked_snapshot``), so this path exercises the
    chunk-vs-log watermark arbitration the plain snapshot never hits;
    the final state must still equal the single oracle.  A capability
    the reference does not have (its flashback snapshot is one
    consistent SCN, SelectSource.kt:9-104)."""
    d = workload.ensure_workload(sf_dir)
    chunks = workload.ensure_chunked_snapshot(sf_dir)
    lake = d["lake"] + "_chunked"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot_chunked(chunks, base_scn=workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    return _digest_html(eng.to_arrow())


def cdc_view_lang_stats(sf_dir: str) -> pa.Table:
    """Incrementally-maintained materialized view over the CDC stream:
    per-lang row count + total text chars, updated from per-partition
    merge DELTAS (old contribution out, new in) rather than rescanning
    the lake -- the downstream-aggregate half of a CDC pipeline.
    Replay runs in 4 micro-batches so the state genuinely accumulates
    across versions; the oracle recomputes the same aggregate from the
    final replayed state."""
    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "_views"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(
        lake_dir=lake, num_partitions=16,
        views=(("lang_stats", "lang", "text"),),
        # force several micro-batch versions: deltas must accumulate
        max_events_per_checkpoint=max(
            1, _n_events(sf_dir) // 4
        ),
    ))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    return eng.view("lang_stats")


def _n_events(sf_dir: str) -> int:
    import pyarrow.parquet as _pq
    import os as _os

    return _pq.ParquetFile(
        _os.path.join(sf_dir, "events.parquet")
    ).metadata.num_rows


def cdc_snapshot_state(sf_dir: str) -> pa.Table:
    """Initial snapshot only (SelectSource semantics, S1/S2)."""
    d = workload.ensure_workload(sf_dir)
    _fresh_lake(d)
    eng = Engine(_engine_cfg(d))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    return _digest_html(eng.to_arrow())


def _decoded_committed(sf_dir: str):
    """Shared: decoded + commit-resolved change stream (no merge)."""
    import ray
    import ray.data as rd

    d = workload.ensure_workload(sf_dir)
    files = changelog_src.list_batch_files(d["changelog"])
    paths = [f.path for f in files]
    ref = ray.put(collect_txn_info(paths))
    ds = rd.read_parquet(paths)
    decoded = ds.map_batches(
        ChangeDecoder(workload.PAGES_SCHEMA_NAIVE, "url"),
        batch_format="pyarrow",
    )
    return decoded, ref


def cdc_committed_events(sf_dir: str) -> pa.Table:
    """Committed change rows per op (T1 consolidation + D1 rollback
    discard), commit order resolved via broadcast markers."""
    decoded, ref = _decoded_committed(sf_dir)
    committed = decoded.map_batches(
        CommitResolver(ref, "committed"), batch_format="pyarrow"
    )
    out = committed.groupby("op").count()
    t = pa.Table.from_pandas(out.to_pandas())
    t = t.rename_columns(["op", "n_events"])
    return t.take(pc.sort_indices(t, sort_keys=[("op", "ascending")]))


def cdc_open_or_rolled_events(sf_dir: str) -> pa.Table:
    """Change rows NOT applied: rolled-back txns (D1).  The derived
    workload closes every txn, so open == rolled here."""
    decoded, ref = _decoded_committed(sf_dir)
    committed = decoded.map_batches(
        CommitResolver(ref, "committed"), batch_format="pyarrow"
    )
    n_all = decoded.count()
    n_committed = committed.count()
    return pa.table({"n_discarded": pa.array([n_all - n_committed], pa.int64())})


def cdc_scn_range_stats(sf_dir: str) -> pa.Table:
    """SCN-range pruning source stats (S3/S4 + M6 predicates): change
    rows with scn in (lo, hi], footer-stats file pruning + pushdown."""
    import ray.data as rd

    d = workload.ensure_workload(sf_dir)
    files = changelog_src.list_batch_files(d["changelog"])
    lo = workload.SCN0 + 2000
    hi = workload.SCN0 + 12000
    pruned = changelog_src.prune_files(files, lo, hi)
    if not pruned:
        # every log file pruned by footer stats (at tiny scales the
        # fixed window lies beyond the whole changelog): the correct
        # answer is empty stats, same as the oracle's WHERE over zero
        # rows -- not a zero-path read error
        return pa.table(
            {
                "n_rows": pa.array([0], pa.int64()),
                "min_scn": pa.array([None], pa.int64()),
                "max_scn": pa.array([None], pa.int64()),
            }
        )
    ds = rd.read_parquet([f.path for f in pruned])
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(
                    pc.greater(t.column("scn"), lo),
                    pc.less_equal(t.column("scn"), hi),
                ),
                pc.is_in(t.column("op"), value_set=pa.array(schemas.CHANGE_OPS)),
            )
        ).select(["scn"]),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count, Max, Min

    res = ds.aggregate(Count(), Min("scn"), Max("scn"))
    return pa.table(
        {
            "n_rows": pa.array([res["count()"]], pa.int64()),
            "min_scn": pa.array([res["min(scn)"]], pa.int64()),
            "max_scn": pa.array([res["max(scn)"]], pa.int64()),
        }
    )


def cdc_envelope_counts(sf_dir: str) -> pa.Table:
    """Debezium-envelope changelog emission (M7/M8) through the
    Engine-level output surface (``Engine.changelog``): committed
    change rows -> envelope records incl. delete tombstones; returns
    row counts per record kind."""
    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-env"
    eng = Engine(
        EngineConfig(lake_dir=lake, num_partitions=4, emit_tombstones=True)
    )
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    env = eng.changelog(d["changelog"])

    def kind(t: pa.Table) -> pa.Table:
        k = pc.if_else(t.column("tombstone"), "tombstone", t.column("op"))
        return pa.table({"kind": k})

    out = env.map_batches(kind, batch_format="pyarrow").groupby("kind").count()
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = t.rename_columns(["kind", "n_records"])
    return t.take(pc.sort_indices(t, sort_keys=[("kind", "ascending")]))


def cdc_lww_latest(sf_dir: str) -> pa.Table:
    """Per-key argmax (A4): latest committed change per url by
    (commit_scn, scn), two-level: block-local partial argmax inside
    map_batches (the combiner), then a groupby-final argmax."""
    decoded, ref = _decoded_committed(sf_dir)
    committed = decoded.map_batches(
        CommitResolver(ref, "committed"), batch_format="pyarrow"
    )

    def partial_argmax(t: pa.Table) -> pa.Table:
        t = t.select(["url", "commit_scn", "scn", "op"])
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("url", "ascending"),
                ("commit_scn", "descending"),
                ("scn", "descending"),
            ],
        )
        t = t.take(idx)
        import numpy as np

        urls = t.column("url").combine_chunks()
        n = len(urls)
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = pc.not_equal(
                urls.slice(1), urls.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(first))

    partials = committed.map_batches(partial_argmax, batch_format="pyarrow")
    # Final level: the combiner already reduced to <= 1 row per url per
    # block, so the remaining volume is O(result size) -- which this
    # query returns to the caller anyway.  One vectorized sorted-first-
    # per-key pass over the combined partials replaces the per-url
    # pandas map_groups dispatch (round-1 perf finding).
    t = pa.Table.from_pandas(partials.to_pandas(), preserve_index=False)
    t = partial_argmax(t)
    t = t.select(["url", "commit_scn", "scn", "op"]).rename_columns(
        ["url", "last_commit_scn", "last_scn", "last_op"]
    )
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def lake_point_lookup(sf_dir: str) -> pa.Table:
    """Point lookup with partition pruning (the 'serve one url from a
    100 TB lake' path): replay to final state, then probe a
    deterministic key set (first/early docs, the middle doc, the last
    doc, plus one key that never existed) through ``Engine.lookup`` --
    probe keys are hashed with the merge's own partitioner and ONLY
    those partition files are read.  The oracle filters the final
    replayed state to the same probe set, so row content (including
    the evolution lineage fill the lookup shares with full scans) is
    value-hash-checked against the full-replay oracle."""
    from logminer_kafka_connect_ray.pipelines.dataops import _table_meta

    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-lookup"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    n_docs, _ = _table_meta(sf_dir, "documents")
    ids = [0, 1, 2, 3, n_docs // 2, n_docs - 1]
    probes = [f"https://site{i % 20}.example/d/{i}" for i in ids]
    probes.append("https://site0.example/d/999999999")  # absent key
    t = eng.lookup(probes)
    stats = eng.last_lookup_stats
    if stats["partitions_read"] > len(set(probes)):
        raise RuntimeError(f"point lookup did not prune: {stats}")
    return _digest_html(t)


def lake_pruned_scan(sf_dir: str) -> pa.Table:
    """Predicate scan through the manifest's per-partition data-skipping
    stats (``Engine.scan``): replay to final state, then scan for two
    present hosts plus one that never existed.  Partition host-Bloom
    filters decide which files are even opened (needle hosts prune
    hard; the workload's dense hosts honestly saturate to a full read
    -- the pytest proves the pruning side on planted needles), and the
    surviving rows are exactly filtered and lineage-filled, so the
    value hash checks byte identity against the full-replay oracle
    filtered by the same ``split_part(url,'/',3)`` predicate."""
    import ray as _ray

    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-prunedscan"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    hosts = ["site3.example", "site17.example", "no-such.example"]
    ds = eng.scan(hosts=hosts)
    stats = eng.last_scan_stats
    if stats["partitions_read"] > stats["partitions_total"]:
        raise RuntimeError(f"scan telemetry inconsistent: {stats}")
    tbls = [t for t in _ray.get(ds.to_arrow_refs()) if t.num_rows]
    t = (
        pa.concat_tables(tbls)
        if tbls
        else ds.schema().base_schema.empty_table()
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
    return _digest_html(t)


def cdc_dead_letter_replay(sf_dir: str) -> pa.Table:
    """Dead-letter REPAIR gate: replay the corrupted changelog (every
    101st change event's key nulled -> routed to ``lake/dead_letters``),
    then repair -- the fixer re-selects the failed rows from the
    source of truth (``workload.derive_corrections``) and
    ``Engine.repair`` re-folds each affected key's full history
    (retained snapshot base + original log + corrections) into
    compensating full-image writes.  The oracle is the UNCORRUPTED
    full-replay final state, so the value hash proves the repaired
    lake is byte-identical to the universe where the corruption never
    happened -- including dead-lettered INSERTs buried under later
    partial updates (the case a naive late-event merge gets wrong)."""
    import os as _os

    import ray as _ray

    d = workload.ensure_workload(sf_dir)
    corrupt = _os.path.join(d["root"], "changelog-corrupt")
    marker = _os.path.join(d["root"], "_ready_corrupt")
    if not _os.path.exists(marker):
        workload.derive_changelog_corrupt(sf_dir, corrupt)
        open(marker, "w").write("ok")
    lake = d["lake"] + "-repair"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(corrupt)
    dl = eng.read_dead_letters()
    scns = sorted(
        s
        for t in _ray.get(dl.to_arrow_refs())
        if t.num_rows and "scn" in t.column_names
        for s in t.column("scn").to_pylist()
    )
    if not scns:
        raise RuntimeError("corruption fixture produced no dead letters")
    corr = workload.derive_corrections(sf_dir, scns)
    eng.repair(corrupt, corr)
    return _digest_html(eng.to_arrow())


def cdc_url_revision_churn(sf_dir: str) -> pa.Table:
    """Per-url revision-churn profile over the COMMITTED change stream
    (the crawl-ops question a CDC'd web lake answers: how hot is each
    url, how often does its text actually change, how bursty are its
    revisions).  Per url, in commit order ``(commit_scn, scn)``:
    ``n_committed``, ``n_text_revs`` (committed events that set the
    text column), ``first_scn`` / ``last_scn``, and ``max_scn_gap``
    (largest SCN gap between consecutive committed revisions; NULL for
    single-revision urls).

    Scale shape: decode + commit-resolution stream into a stamped
    single-pass combiner, ONE hash exchange on url (explicit
    boundaries, split-guarded -- max-gap needs every revision of a url
    in one ordered block), per-block ``reduceat`` sweeps with a
    sentinel-excluded gap array; only the per-url result rows leave
    the exchange."""
    import numpy as np

    from logminer_kafka_connect_ray.functions.hashing import partition_ids
    from logminer_kafka_connect_ray.pipelines.dataops import (
        _exchange_width,
        _finalize_guard,
        _guard_record,
        _new_guard_dir,
        _table_meta,
    )

    n_ev, _ = _table_meta(sf_dir, "events")
    P = _exchange_width(n_ev)
    gd = _new_guard_dir("urlchurn")
    decoded, ref = _decoded_committed(sf_dir)
    committed = decoded.map_batches(
        CommitResolver(ref, "committed"), batch_format="pyarrow"
    )

    def stamp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("url"),
                "cscn": t.column("commit_scn"),
                "scn": t.column("scn"),
                "has_text": pc.is_valid(t.column("a_text")),
                "_p": pa.array(partition_ids(t.column("url"), P)),
            }
        )

    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("n_committed", pa.int64()),
            ("n_text_revs", pa.int64()),
            ("first_scn", pa.int64()),
            ("last_scn", pa.int64()),
            ("max_scn_gap", pa.int64()),
        ]
    )
    SENT = np.iinfo(np.int64).min

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "p", t.column("_p").unique().to_numpy(zero_copy_only=False)
        )
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("url", "ascending"),
                    ("cscn", "ascending"),
                    ("scn", "ascending"),
                ],
            )
        )
        urls = t.column("url").combine_chunks()
        scn = t.column("scn").to_numpy(zero_copy_only=False).astype(np.int64)
        ht = t.column("has_text").to_numpy(zero_copy_only=False)
        n = len(scn)
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = pc.not_equal(
                urls.slice(1), urls.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, n))
        gaps = np.empty(n, np.int64)
        gaps[0] = SENT
        if n > 1:
            gaps[1:] = scn[1:] - scn[:-1]
        gaps[starts] = SENT  # no predecessor within the url
        maxgap = np.maximum.reduceat(gaps, starts)
        return pa.table(
            {
                "url": urls.take(pa.array(starts)),
                "n_committed": pa.array(counts.astype(np.int64)),
                "n_text_revs": pa.array(np.add.reduceat(ht.astype(np.int64), starts)),
                "first_scn": pa.array(np.minimum.reduceat(scn, starts)),
                "last_scn": pa.array(np.maximum.reduceat(scn, starts)),
                "max_scn_gap": pa.array(maxgap, pa.int64(), mask=counts == 1),
            },
            schema=out_schema,
        )

    out = (
        committed.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = _finalize_guard(gd, t)
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def cdc_final_state_streaming(sf_dir: str) -> pa.Table:
    """Same replay as cdc_final_state but through the STREAMING engine
    (poll loop + long-lived sharded consolidation actors + per-poll
    merge, SURVEY.md section 2.9) -- proving the stateful-actor path
    reaches the same final state under the same SQL oracle."""
    from logminer_kafka_connect_ray.pipelines.streaming import StreamingEngine

    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-stream"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    stream = StreamingEngine(
        eng, d["changelog"], num_shards=4, poll_interval=0.01
    )
    stream.run(max_polls=80)
    stream.shutdown()
    return _digest_html(eng.to_arrow())


def cdc_final_state_streaming_redo(sf_dir: str) -> pa.Table:
    """Streaming engine over the RAW REDO-SQL changelog: the
    reference's actual operating shape (a LogMiner statement stream
    consumed by a long-lived poll loop) -- statement parsing, CSF
    reassembly, dead-letter routing and the catalog-sidecar schema
    source all running inside the streaming decode tasks, verified
    against the same SQL oracle as every other flagship path."""
    import os

    from logminer_kafka_connect_ray.pipelines.streaming import StreamingEngine

    d = workload.ensure_workload(sf_dir)
    redo_dir = os.path.join(d["root"], "changelog-redo")
    marker = os.path.join(d["root"], "_ready_redo")
    if not os.path.exists(marker):
        workload.derive_changelog_redo_sql(sf_dir, redo_dir)
        open(marker, "w").write("ok")
    lake = d["lake"] + "-stream-redo"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(
        EngineConfig(
            lake_dir=lake, num_partitions=16, changelog_format="redo_sql"
        )
    )
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    stream = StreamingEngine(
        eng, redo_dir, num_shards=4, poll_interval=0.01
    )
    stream.run(max_polls=80)
    stream.shutdown()
    return _digest_html(eng.to_arrow())


def cdc_final_state_salted(sf_dir: str) -> pa.Table:
    """Same replay as cdc_final_state through the salted two-level
    fold (salt_factor > 1, the north rule's salted repartitioning) --
    the hot-partition escape hatch verified against the same oracle."""
    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-salted"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(
        EngineConfig(lake_dir=lake, num_partitions=16, salt_factor=3)
    )
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    return _digest_html(eng.to_arrow())


def _multitable_run(sf_dir: str):
    """Fan out ONE mixed two-table changelog to per-table lakes
    (pipelines/multitable.py; reference: one redo log, topic per table,
    SourceTask.kt:46-63 whitelist expansion).  Idempotent: committed
    manifests short-circuit on repeated calls."""
    from logminer_kafka_connect_ray.pipelines.multitable import MultiTableEngine

    d = workload.ensure_multitable(sf_dir)
    mt = MultiTableEngine(
        d["lake"] + "-mt", EngineConfig(num_partitions=8)
    )
    mt.snapshot(
        {workload.TABLE_NAME: d["pages"], workload.SUP_TABLE: d["sup_base"]},
        workload.SNAPSHOT_SCN,
    )
    mt.replay(d["mixed"])
    return mt


def cdc_multitable_suppliers(sf_dir: str) -> pa.Table:
    """Final state of the SECOND table after replaying the mixed log --
    proves the fan-out routes supplier events to the supplier lake."""
    mt = _multitable_run(sf_dir)
    return _digest_html(mt.engine_for(workload.SUP_TABLE).to_arrow())


def cdc_multitable_suppliers_streaming(sf_dir: str) -> pa.Table:
    """Streaming fan-out (MultiTableEngine.stream): per-table poll
    loops over the same mixed log must reach the identical supplier
    final state as the batch fan-out -- same SQL oracle."""
    from logminer_kafka_connect_ray.pipelines.multitable import MultiTableEngine

    d = workload.ensure_multitable(sf_dir)
    root = d["lake"] + "-mt-stream"
    shutil.rmtree(root, ignore_errors=True)
    mt = MultiTableEngine(root, EngineConfig(num_partitions=8))
    mt.snapshot(
        {workload.TABLE_NAME: d["pages"], workload.SUP_TABLE: d["sup_base"]},
        workload.SNAPSHOT_SCN,
    )
    mt.stream(d["mixed"], max_polls=40, num_shards=2, poll_interval=0.01)
    return _digest_html(mt.engine_for(workload.SUP_TABLE).to_arrow())


def cdc_multitable_pages(sf_dir: str) -> pa.Table:
    """Final PAGES state from the MIXED log must equal the single-table
    replay -- proves the S6 whitelist keeps the other table's events
    out of this lake."""
    mt = _multitable_run(sf_dir)
    return _digest_html(mt.engine_for(workload.TABLE_NAME).to_arrow())


def cdc_time_travel(sf_dir: str) -> pa.Table:
    """Time-travel read: after a FULL replay, reading lake version 1
    must still return the pristine snapshot state (copy-on-write
    partition files + versioned manifests; Engine.read_table/to_arrow
    with version=).  Verified against the snapshot SQL oracle."""
    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-tt"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    return _digest_html(eng.to_arrow(version=1))


def smt_upper_lang(t: pa.Table) -> pa.Table:
    """Example user SMT (reference manifest.json SingleMessageTransform
    analog): uppercase the lang column in both change images.  Module-
    level so it pickles to Ray workers."""
    for c in ("a_lang", "b_lang"):
        i = t.column_names.index(c)
        t = t.set_column(i, c, pc.utf8_upper(t.column(c)))
    return t


def cdc_final_state_transform(sf_dir: str) -> pa.Table:
    """Flagship replay with a user transform (SMT hook, SURVEY.md
    section 2.10) between decode and the combiner: event-derived lang
    values are uppercased before spill/merge; snapshot base rows are
    untouched (the SMT operates on the change stream, like the
    reference's per-record transforms)."""
    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-smt"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(
        EngineConfig(lake_dir=lake, num_partitions=16, transform=smt_upper_lang)
    )
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    return _digest_html(eng.to_arrow())


def cdc_final_state_redo_sql(sf_dir: str) -> pa.Table:
    """Same replay as cdc_final_state but from a RAW REDO-SQL changelog
    (M1 statement parsing + typed literal conversion), verifying the
    parser path against the same SQL oracle."""
    import os
    import shutil as _sh

    d = workload.ensure_workload(sf_dir)
    redo_dir = os.path.join(d["root"], "changelog-redo")
    marker = os.path.join(d["root"], "_ready_redo")
    if not os.path.exists(marker):
        workload.derive_changelog_redo_sql(sf_dir, redo_dir)
        open(marker, "w").write("ok")
    lake = d["lake"] + "-redo"
    _sh.rmtree(lake, ignore_errors=True)
    eng = Engine(
        EngineConfig(
            lake_dir=lake, num_partitions=16, changelog_format="redo_sql"
        )
    )
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(redo_dir)
    return _digest_html(eng.to_arrow())


def lake_host_stats(sf_dir: str) -> pa.Table:
    """Distributed analytics scan over the REPLAYED lake: per-host page
    count, total text volume, and freshest warc_ts.  The 'query the
    table you built' half of a CDC pipeline -- downstream consumers
    read the lake the merge produced, not the change stream.

    Scale shape: column-pruned parquet read of the lake partitions ->
    per-block vectorized partial aggregation (Arrow group_by inside
    map_batches, so only one tiny row per (block, host) reaches the
    shuffle) -> small global groupby-sum.  No full materialization; the
    final result is O(n_hosts)."""
    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-hoststats"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    return host_stats(eng.read_table(columns=["url", "warc_ts", "text"]))


def host_stats(ds) -> pa.Table:
    """Per-host (n_pages, sum_text_chars, max_warc_ts) over a Dataset
    with (url, warc_ts, text) columns; two-level vectorized aggregate
    (per-block Arrow group_by partial -> global groupby-sum/max)."""
    from ray.data.aggregate import Max, Sum

    def host_partial(t: pa.Table) -> pa.Table:
        host = pc.list_element(pc.split_pattern(t.column("url"), "/"), 2)
        chars = pc.fill_null(
            pc.cast(pc.utf8_length(t.column("text")), pa.int64()), 0
        )
        ts = pc.cast(t.column("warc_ts"), pa.int64())
        g = pa.table({"host": host, "chars": chars, "ts": ts}).group_by(
            "host"
        )
        p = g.aggregate([("chars", "sum"), ("ts", "max"), ("host", "count")])
        # select by the aggregate's generated names -- the position of
        # key vs aggregate columns is a pyarrow implementation detail
        return pa.table(
            {
                "host": p.column("host"),
                "chars": p.column("chars_sum"),
                "ts": p.column("ts_max"),
                "n": p.column("host_count"),
            }
        )

    agg = (
        ds.map_batches(host_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n"), Sum("chars"), Max("ts"))
    )
    t = pa.Table.from_pandas(agg.to_pandas())
    t = pa.table(
        {
            "host": t.column("host"),
            "n_pages": pc.cast(t.column("sum(n)"), pa.int64()),
            "sum_text_chars": pc.cast(t.column("sum(chars)"), pa.int64()),
            "max_warc_ts": pc.cast(t.column("max(ts)"), pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    return t.take(pc.sort_indices(t, sort_keys=[("host", "ascending")]))


def cdc_history_scd2(sf_dir: str) -> pa.Table:
    """SCD Type-2 history table over snapshot + committed change
    stream: one row per (url, version) with its validity interval
    ``[valid_from_scn, valid_to_scn)`` in COMMIT order -- the
    slowly-changing-dimension sink shape a CDC consumer materializes
    when it must keep every version, not just the latest (the
    reference stops at per-record Kafka emission; this is the history
    half of the J3 apply).  The base snapshot row is version 1
    (op='r', reference SelectSource's read op), each committed
    i/u/d appends a version, and a version's valid_to is the NEXT
    version's valid_from (NULL = current).

    Scale shape: committed-change stream (broadcast marker resolve)
    unioned with the snapshot key scan -> hash exchange on url
    (explicit boundaries, split-guarded) -> per-block vectorized
    sort + segment window (row_number + lead).  Per-url history must
    co-locate, which the url exchange guarantees; no driver loops."""
    import ray.data as rd

    from logminer_kafka_connect_ray.pipelines.dataops import _exchange_width

    d = workload.ensure_workload(sf_dir)
    decoded, ref = _decoded_committed(sf_dir)
    committed = decoded.map_batches(
        CommitResolver(ref, "committed"), batch_format="pyarrow"
    )
    base = rd.read_parquet(d["pages"], columns=["url"])
    return scd2_history(
        committed, base, workload.SNAPSHOT_SCN,
        _exchange_width(_n_events(sf_dir)),
    )


def scd2_history(committed, base, snap_scn: int, P: int) -> pa.Table:
    """Distributed SCD2 core: ``committed`` is a Dataset with
    (url, op, commit_scn, scn) columns, ``base`` a Dataset with a url
    column (the snapshot keys); returns the version-interval table."""
    import numpy as np

    from logminer_kafka_connect_ray.functions.hashing import partition_ids
    from logminer_kafka_connect_ray.pipelines.dataops import (
        _finalize_guard,
        _guard_record,
        _new_guard_dir,
    )

    vers_schema = pa.schema(
        [
            ("url", pa.string()),
            ("op", pa.string()),
            ("o1", pa.int64()),
            ("vscn", pa.int64()),
        ]
    )

    def ch_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pc.cast(t.column("url"), pa.string()),
                "op": pc.cast(t.column("op"), pa.string()),
                "o1": pc.cast(t.column("commit_scn"), pa.int64()),
                "vscn": pc.cast(t.column("scn"), pa.int64()),
            },
            schema=vers_schema,
        )

    def base_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "url": pc.cast(t.column("url"), pa.string()),
                "op": pa.array(["r"] * n, pa.string()),
                "o1": pa.array(np.full(n, snap_scn, np.int64)),
                "vscn": pa.array(np.full(n, snap_scn, np.int64)),
            },
            schema=vers_schema,
        )

    vers = committed.map_batches(ch_rows, batch_format="pyarrow").union(
        base.map_batches(base_rows, batch_format="pyarrow")
    )
    gd = _new_guard_dir("scd2")

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("url"), P))
        )

    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("ver", pa.int64()),
            ("op", pa.string()),
            ("valid_from_scn", pa.int64()),
            ("valid_to_scn", pa.int64()),
        ]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "scd2", t.column("_p").to_numpy(zero_copy_only=False)
        )
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("url", "ascending"),
                    ("o1", "ascending"),
                    ("vscn", "ascending"),
                ],
            )
        )
        urls = t.column("url").combine_chunks()
        n = len(urls)
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = pc.not_equal(
                urls.slice(1), urls.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        vscn = t.column("vscn").to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(first)
        seg = np.cumsum(first) - 1
        ver = np.arange(n, dtype=np.int64) - starts[seg] + 1
        last = np.empty(n, bool)
        last[:-1] = first[1:]
        last[-1] = True
        vto = np.zeros(n, np.int64)
        vto[:-1] = vscn[1:]
        return pa.table(
            {
                "url": urls,
                "ver": pa.array(ver),
                "op": t.column("op").combine_chunks(),
                "valid_from_scn": pa.array(vscn),
                "valid_to_scn": pa.array(vto, pa.int64(), mask=last),
            },
            schema=out_schema,
        )

    res = (
        vers.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False).cast(
        out_schema
    )
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("url", "ascending"), ("ver", "ascending")]
        )
    )
    return _finalize_guard(gd, t)


def lake_version_diff(sf_dir: str) -> pa.Table:
    """Reconciliation audit between lake versions: which urls changed
    between the pristine snapshot (version 1) and the fully replayed
    head, classified added / removed / modified (Engine.diff).

    Scale shape: partition-ALIGNED pairwise diff -- the stable
    hash(url) partitioning means partition i of both versions holds
    the same key range, so no shuffle happens at all; partitions whose
    file path is unchanged between the manifests are pruned unread
    (copy-on-write lineage).  Cost is proportional to churn, not to
    table size."""
    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-diff"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    t = pa.Table.from_pandas(
        eng.diff(1).to_pandas(), preserve_index=False
    )
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("url", "ascending"), ("change", "ascending")]
        )
    )


def cdc_final_state_repartitioned(sf_dir: str) -> pa.Table:
    """Flagship replay followed by a LIVE lake re-layout: grow the
    partition count 16 -> 24 via ``repartition_lake`` (full
    copy-on-write rewrite through the standard merge path at recorded
    ``(_commit_scn, _scn)``), then ``vacuum`` down to the head
    version.  The state read back after both maintenance operations
    must still match the same replay oracle byte-for-byte -- gating
    the two lake-maintenance operators (the scale levers that keep
    partitions ~1 GiB at 100 TB) at the driver level, not just in
    pytest."""
    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-repart"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    eng.repartition_lake(24)
    eng.vacuum(keep_versions=1)
    return _digest_html(eng.to_arrow())


def cdc_changelog_compaction(sf_dir: str) -> pa.Table:
    """Changelog COMPACTION (Kafka compacted-topic semantics -- the
    reference's output topics are PK-compacted, SURVEY.md section 7.0):
    rewrite the full committed changelog down to ONE replay-equivalent
    event per key (``pipelines/compaction.py``), then snapshot + replay
    the COMPACTED log into a fresh lake.  The oracle is the
    full-replay final state, so the driver's value hash proves a
    bootstrap consumer reading the compacted stream reaches the exact
    state a full-history consumer does -- deletes folded to tombstones,
    partial-update chains folded to one partial with the union SET
    mask, delete+reinsert chains folded to one full image."""
    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )

    d = workload.ensure_workload(sf_dir)
    comp_dir = d["lake"] + "-compacted-log"
    lake = d["lake"] + "-compact"
    shutil.rmtree(comp_dir, ignore_errors=True)
    shutil.rmtree(lake, ignore_errors=True)
    cfg = EngineConfig(lake_dir=lake, num_partitions=16)
    metrics = compact_changelog(cfg, d["changelog"], comp_dir)
    if metrics["events_out"] >= metrics["events_in"]:
        raise RuntimeError(f"compaction did not shrink the log: {metrics}")
    eng = Engine(cfg)
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(comp_dir)
    return _digest_html(eng.to_arrow())


def cdc_changelog_compaction_incremental(sf_dir: str) -> pa.Table:
    """INCREMENTAL compaction at the driver level (the Kafka
    log-cleaner loop): split the changelog into two segment sets,
    compact segment 1, then compact ``[compacted1, segment2]`` -- the
    cleaner reads ~|keys| pre-resolved events + the new tail, never
    the full history; transactions SPANNING the split are carried
    verbatim by the first pass and resolved by the second.  Replaying
    the incrementally-compacted log must reach the same final state as
    the full-history replay (same oracle as ``cdc_final_state``)."""
    import os

    from logminer_kafka_connect_ray.pipelines.compaction import (
        compact_changelog,
    )

    d = workload.ensure_workload(sf_dir)
    names = sorted(
        f for f in os.listdir(d["changelog"]) if f.endswith(".parquet")
    )
    half = max(1, len(names) // 2)
    root = d["lake"] + "-incr"
    src1, src2 = root + "-src1", root + "-src2"
    c1, c2 = root + "-c1", root + "-c2"
    lake = root + "-lake"
    for p in (src1, src2, c1, c2, lake):
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(src1)
    os.makedirs(src2)
    for i, n in enumerate(names):
        os.symlink(
            os.path.join(d["changelog"], n),
            os.path.join(src1 if i < half else src2, n),
        )
    cfg = EngineConfig(lake_dir=lake, num_partitions=16)
    compact_changelog(cfg, src1, c1)
    compact_changelog(cfg, [c1, src2], c2)
    eng = Engine(cfg)
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(c2)
    return _digest_html(eng.to_arrow())


#: doc_ids whose urls the GDPR gate erases -- shared between the Ray
#: query and the SQL oracle in __ray_entry__.py (urls follow
#: workload._urls: https://site{doc_id % 20}.example/d/{doc_id}).
GDPR_ERASE_DOC_IDS = (3, 17, 123)


def lake_gdpr_erasure(sf_dir: str) -> pa.Table:
    """GDPR right-to-erasure through the lake: flagship replay, then
    ``Engine.erase`` of three urls as one committed copy-on-write
    version, then ``vacuum`` so the pre-erasure partition files are
    physically gone.  Only the (<= 3) partitions holding a target key
    are rewritten -- the erase request rides the standard partition
    exchange, so the cost is O(touched partitions), not O(lake).  The
    state read back must equal the replay oracle minus the erased
    urls.  Keys absent at small scale factors (doc 123 below sf0.01)
    erase as no-ops on both sides."""
    d = workload.ensure_workload(sf_dir)
    lake = d["lake"] + "-gdpr"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["changelog"])
    eng.erase([workload.url_of(i) for i in GDPR_ERASE_DOC_IDS])
    eng.vacuum(keep_versions=1)
    return _digest_html(eng.to_arrow())


def cdc_dead_letters(sf_dir: str) -> pa.Table:
    """Dead-letter accounting gate (M4/M5): replay a changelog where
    every 101st change event's key is nulled (undecodable struct row).
    The engine must route EVERY corrupt row to ``lake/dead_letters``
    with reason ``missing_key`` -- skip-with-accounting, never a
    silent drop -- and the deduplicating reader's per-reason counts
    must equal the exact count DuckDB derives from the events table.
    Routing happens at decode, before commit resolution, so
    rolled-back txns' corrupt rows are counted too (they were still
    unreadable)."""
    import os as _os

    d = workload.ensure_workload(sf_dir)
    corrupt = _os.path.join(d["root"], "changelog-corrupt")
    marker = _os.path.join(d["root"], "_ready_corrupt")
    if not _os.path.exists(marker):
        workload.derive_changelog_corrupt(sf_dir, corrupt)
        open(marker, "w").write("ok")
    lake = d["lake"] + "-dead"
    shutil.rmtree(lake, ignore_errors=True)
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=16))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(corrupt)
    out = eng.read_dead_letters().groupby("reason").count()
    t = pa.Table.from_pandas(out.to_pandas())
    t = t.rename_columns(["reason", "n"])
    t = pa.table(
        {
            "reason": t.column("reason"),
            "n": pc.cast(t.column("n"), pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t, sort_keys=[("reason", "ascending")]))


def cdc_pit_lookup(sf_dir: str) -> pa.Table:
    """Point-in-time (AS OF) lookup join against the SCD2 history:
    for three deterministic probe SCNs spanning the change range
    (``2000 + n_ev // 2``, ``2000 + n_ev``, ``2000 + 2 * n_ev``),
    resolve the version of EVERY url valid at that SCN -- the
    temporal-join consumers run against a CDC history table
    ("what did the row look like when this fact happened"), probing
    many as-of points in one pass where `cdc_time_travel` rebuilds a
    single global snapshot.  Urls first inserted after a probe SCN
    emit no row for it."""
    import ray.data as rd

    from logminer_kafka_connect_ray.pipelines.dataops import _exchange_width

    d = workload.ensure_workload(sf_dir)
    decoded, ref = _decoded_committed(sf_dir)
    committed = decoded.map_batches(
        CommitResolver(ref, "committed"), batch_format="pyarrow"
    )
    base = rd.read_parquet(d["pages"], columns=["url"])
    n_ev = _n_events(sf_dir)
    probes = [2000 + n_ev // 2, 2000 + n_ev, 2000 + 2 * n_ev]
    return pit_lookup(
        committed, base, workload.SNAPSHOT_SCN,
        _exchange_width(n_ev), probes,
    )


def pit_lookup(
    committed, base, snap_scn: int, P: int, probe_scns: list[int]
) -> pa.Table:
    """Distributed PIT core: same version relation as `scd2_history`
    (committed change rows + snapshot 'r' rows, url-hash exchange,
    per-block (url, o1, vscn) sort), but instead of materializing
    intervals, each probe SCN resolves per url segment via one
    vectorized prefix count (#versions with vscn <= probe = the
    1-based version number; the workload's commit order makes vscn
    ascending within a url, the same monotonicity `scd2_history`'s
    lead() interval relies on).  Output is probe-bounded:
    |urls| x |probes| rows, never |changes|."""
    import numpy as np

    from logminer_kafka_connect_ray.functions.hashing import partition_ids
    from logminer_kafka_connect_ray.pipelines.dataops import (
        _finalize_guard,
        _guard_record,
        _new_guard_dir,
    )

    vers_schema = pa.schema(
        [
            ("url", pa.string()),
            ("op", pa.string()),
            ("o1", pa.int64()),
            ("vscn", pa.int64()),
        ]
    )

    def ch_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pc.cast(t.column("url"), pa.string()),
                "op": pc.cast(t.column("op"), pa.string()),
                "o1": pc.cast(t.column("commit_scn"), pa.int64()),
                "vscn": pc.cast(t.column("scn"), pa.int64()),
            },
            schema=vers_schema,
        )

    def base_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "url": pc.cast(t.column("url"), pa.string()),
                "op": pa.array(["r"] * n, pa.string()),
                "o1": pa.array(np.full(n, snap_scn, np.int64)),
                "vscn": pa.array(np.full(n, snap_scn, np.int64)),
            },
            schema=vers_schema,
        )

    vers = committed.map_batches(ch_rows, batch_format="pyarrow").union(
        base.map_batches(base_rows, batch_format="pyarrow")
    )
    gd = _new_guard_dir("pit")

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("url"), P))
        )

    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("asof_scn", pa.int64()),
            ("ver", pa.int64()),
            ("op", pa.string()),
        ]
    )
    probe_arr = np.asarray(sorted(probe_scns), np.int64)

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "pit", t.column("_p").to_numpy(zero_copy_only=False)
        )
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("url", "ascending"),
                    ("o1", "ascending"),
                    ("vscn", "ascending"),
                ],
            )
        )
        n = t.num_rows
        urls = t.column("url").combine_chunks()
        ue = pc.equal(urls.slice(1, n - 1), urls.slice(0, n - 1))
        first = np.concatenate(
            [[True], ~ue.to_numpy(zero_copy_only=False)]
        )
        vscn = t.column("vscn").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ops = t.column("op").combine_chunks()
        starts = np.flatnonzero(first)
        counts = np.r_[starts[1:], n] - starts
        out = []
        for s in probe_arr:
            # versions visible at s, per segment (prefix count)
            vis = (vscn <= s).astype(np.int64)
            k = np.add.reduceat(vis, starts)
            has = k > 0
            row = starts[has] + k[has] - 1
            out.append(
                pa.table(
                    {
                        "url": urls.take(pa.array(starts[has])),
                        "asof_scn": pa.array(
                            np.full(int(has.sum()), s, np.int64)
                        ),
                        "ver": pa.array(k[has]),
                        "op": ops.take(pa.array(row)),
                    },
                    schema=out_schema,
                )
            )
        return pa.concat_tables(out)

    res = (
        vers.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False).cast(
        out_schema
    )
    t = t.take(
        pc.sort_indices(
            t,
            sort_keys=[("url", "ascending"), ("asof_scn", "ascending")],
        )
    )
    return _finalize_guard(gd, t)


def cdc_schema_default_backfill(sf_dir: str) -> pa.Table:
    """ADD-COLUMN-WITH-DEFAULT evolution gate (ChangingTableTest.kt:
    42-93 + ColumnSchemaBuilder.kt:91-107): replay a redo changelog
    whose ``_catalog.json`` sidecar adds ``rating NUMBER(9) DEFAULT 7``
    and whose committed UPDATEs set it for some urls.  Every
    pre-existing row a committed update never touched must surface the
    DDL default (not null) in the final state.  Returns
    ``(url, lang, rating)`` with rating widened to int64 for the
    driver's dtype-stable compare."""
    import os as _os
    import shutil as _sh

    d = workload.ensure_evolution_workload(sf_dir)
    lake = d["lake"] + "-evolution"
    _sh.rmtree(lake, ignore_errors=True)
    eng = Engine(
        EngineConfig(
            lake_dir=lake, num_partitions=16, changelog_format="redo_sql"
        )
    )
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    eng.replay(d["evolution"])
    t = eng.to_arrow()
    return pa.table(
        {
            "url": t.column("url"),
            "lang": t.column("lang"),
            "rating": t.column("rating").cast(pa.int64()),
        }
    )


def cdc_schema_type_widening(sf_dir: str) -> pa.Table:
    """MID-STREAM TYPE-WIDENING evolution gate (SchemaService.kt:34-40
    refresh + ColumnSchemaBuilder.kt:201-257 NUMBER precision tiers):
    replay a struct changelog whose first file adds ``views`` as
    int32 and whose second file carries it as int64 with values >
    INT32_MAX.  The checkpoint budget is one file, so the engine must
    ADD int32 at micro-batch 1 (partition files on disk carry int32),
    then WIDEN to int64 at micro-batch 2 and cast the existing
    partitions on read -- asserted via TWO separate schema-version
    bumps, not one unified discovery.  Returns ``(url, lang, views)``
    with untouched rows NULL; any silent int32 truncation of the
    phase-2 values fails the value hash."""
    import shutil as _sh

    d = workload.ensure_widening_workload(sf_dir)
    lake = d["lake"] + "-widening"
    _sh.rmtree(lake, ignore_errors=True)
    eng = Engine(
        EngineConfig(
            lake_dir=lake, num_partitions=16,
            max_events_per_checkpoint=max(d["widening_info"]["phase_rows"]),
        )
    )
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    v0 = eng.store.load().schema_version
    eng.replay(d["widening"])
    m = eng.store.load()
    if m.schema_version < v0 + 2:
        raise AssertionError(
            "type widening was not applied MID-stream: expected two "
            f"schema bumps (add int32, widen int64), got "
            f"{m.schema_version - v0}"
        )
    t = eng.to_arrow()
    if t.schema.field("views").type != pa.int64():
        raise AssertionError(
            f"views not widened to int64: {t.schema.field('views').type}"
        )
    return pa.table(
        {
            "url": t.column("url"),
            "lang": t.column("lang"),
            "views": t.column("views"),
        }
    )
