"""Fused change-event processing stage (actor pool).

Chains decode -> resume-skip SCN filter -> commit resolution ->
combiner/partitioner into ONE ``map_batches`` callable class so the
whole per-event CPU path runs inside a single operator: no
inter-stage object-store hops, and the stateful setup (broadcast
TxnInfo fetch + commit hash-table build, schema resolution) happens
once per actor in ``__init__`` -- the actor-pool shape the reference's
single-threaded consolidator maps to at scale (SURVEY.md T1/T3).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.stages.decode import ChangeDecoder
from logminer_kafka_connect_ray.stages.merge import PreaggPartitioner
from logminer_kafka_connect_ray.stages.txn import CommitResolver


class ChangeEventProcessor:
    """decode + filter + resolve (+ combine/partition), optionally
    split into two pipelined stages.

    ``mode='committed'`` emits partition-stamped, combiner-pruned
    committed rows ready for the merge shuffle, and SIDE-WRITES the
    same pass's still-open rows to ``open_dir`` (single decode per
    micro-batch -- round-2 verdict #8; previously a second read+decode
    pass re-derived them).  ``mode='emit'`` emits committed rows
    without the combiner/partition stamp (envelope output surface).
    A retried task may rewrite its open-spill file under a new name;
    re-applied duplicate events are row-level no-ops in the LWW fold
    (same idempotence that covers resume re-reads).

    ``stage`` picks how much of the chain this instance runs:

    * ``'fused'`` -- the whole chain in one operator (no inter-stage
      object-store hop, but every worker's FIRST batch blocks on the
      broadcast TxnInfo ref, serializing decode behind the marker
      scan).
    * ``'decode'`` -- decode + SCN filter + dead-letter + SMT only; no
      marker dependency, so this stage streams concurrently WITH the
      marker-scan task tree.
    * ``'resolve'`` -- commit resolution + open-spill side-write +
      combiner/partitioner over already-flat rows; blocks on the
      marker ref only when its first block arrives, by which point the
      overlapped scan has had the whole decode phase to finish.
    """

    def __init__(
        self,
        markers_ref,
        table_schema_json: list[dict],
        key_column: str,
        whitelist: tuple[str, ...],
        scn_lo: int | None,
        scn_hi: int | None,
        num_partitions: int,
        mode: str = "committed",
        changelog_format: str = "struct",
        db_timezone: str = "UTC",
        dead_dir: str | None = None,
        version: int = 0,
        transform=None,
        open_dir: str | None = None,
        stage: str = "fused",
    ):
        from logminer_kafka_connect_ray.stages.decode import RedoSqlDecoder

        table_schema = schemas.schema_from_json(table_schema_json)
        self.stage = stage
        n_data_cols = len(schemas.data_columns_of(table_schema, key_column))
        if stage in ("fused", "decode"):
            if changelog_format == "redo_sql":
                # dead letters route only from the committed pass -- the
                # open pass re-decodes a subset of the same raw rows and
                # would duplicate them
                self.decoder = RedoSqlDecoder(
                    table_schema, key_column, whitelist, db_timezone,
                    dead_dir=dead_dir if mode == "committed" else None,
                    version=version, scn_lo=scn_lo, scn_hi=scn_hi,
                )
            else:
                self.decoder = ChangeDecoder(table_schema, key_column, whitelist)
        # mode 'emit' = committed rows WITHOUT the merge combiner /
        # partition stamp (the envelope-output surface needs every
        # committed event, not the dominance-pruned net set)
        if stage in ("fused", "resolve"):
            self.resolver = CommitResolver(markers_ref, "committed")
            self.partitioner = PreaggPartitioner(
                key_column, n_data_cols, num_partitions
            )
        self.open_dir = open_dir if mode == "committed" else None
        self.scn_lo = scn_lo
        self.scn_hi = scn_hi
        self.mode = mode
        self.key_column = key_column
        # struct-format null-key rows (both images keyless) are
        # undecodable: route them like the redo path's rejects instead
        # of the partitioner silently filtering them
        self.dead_dir = dead_dir if mode == "committed" else None
        self.version = version
        #: user SMT hook (reference manifest.json SingleMessageTransform
        #: declaration; SURVEY.md section 2.10): applied once per
        #: decoded event, before spill/emit/merge, in every mode --
        #: carryover rows were transformed when first decoded, so the
        #: CarryoverProcessor never reapplies it
        self.transform = transform

    def _decode(self, batch: pa.Table) -> pa.Table:
        t = self.decoder(batch)
        if self.scn_lo is not None or self.scn_hi is not None:
            cond = None
            if self.scn_lo is not None:
                cond = pc.greater(t.column("scn"), self.scn_lo)
            if self.scn_hi is not None:
                c2 = pc.less_equal(t.column("scn"), self.scn_hi)
                cond = c2 if cond is None else pc.and_(cond, c2)
            t = t.filter(cond)
        # missing-key routing runs AFTER the SCN-window filter so a
        # reject in a file spanning two micro-batches is attributed to
        # exactly one version (dead-letter metric stays exact)
        if self.dead_dir is not None:
            nk = pc.is_null(t.column(self.key_column))
            if pc.any(nk).as_py():
                from logminer_kafka_connect_ray.stages.decode import (
                    route_dead_rows,
                )

                bad = t.filter(nk).select(["scn", "row_id", "tx_id", "table"])
                rows = bad.to_pylist()
                route_dead_rows(
                    self.dead_dir, self.version, rows,
                    ["missing_key"] * len(rows),
                )
                t = t.filter(pc.invert(nk))
        if self.transform is not None:
            t2 = self.transform(t)
            if t2.schema != t.schema:
                raise RuntimeError(
                    "EngineConfig.transform must preserve the flat "
                    f"change schema; got {t2.schema.names} vs "
                    f"{t.schema.names}"
                )
            t = t2
        return t

    def _resolve(self, t: pa.Table) -> pa.Table:
        if self.mode == "committed":
            committed, open_rows = self.resolver.split(t)
            write_open_spill(self.open_dir, open_rows)
            return self.partitioner(committed)
        return self.resolver(t)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.stage == "resolve":
            return self._resolve(batch)
        t = self._decode(batch)
        if self.stage == "decode":
            return t
        return self._resolve(t)


def write_open_spill(open_dir: str | None, rows: pa.Table) -> None:
    """Side-write still-open rows to the carryover spill dataset
    (uuid-named file per batch; same at-least-once pattern as
    dead-letter routing -- duplicates from a retried task are absorbed
    by the fold's idempotent re-apply)."""
    if open_dir is None or rows.num_rows == 0:
        return
    import os
    import uuid

    import pyarrow.parquet as pq

    os.makedirs(open_dir, exist_ok=True)
    tmp = os.path.join(open_dir, f".tmp-{uuid.uuid4().hex}")
    pq.write_table(rows, tmp)
    os.rename(tmp, os.path.join(open_dir, f"open-{uuid.uuid4().hex[:12]}.parquet"))


#: per-worker-process processor cache.  Stateless *task* stages with a
#: module-level cache give the same once-per-worker setup amortization
#: as an actor pool, with better elasticity (no pool ramp-up, no
#: per-actor duplication of the broadcast fetch) -- measured faster
#: than ``concurrency=``-based actor pools for this stage.
_PROC_CACHE: dict = {}


def make_processor_fn(
    markers_ref,
    table_schema_json: list[dict],
    key_column: str,
    whitelist: tuple[str, ...],
    scn_lo: int | None,
    scn_hi: int | None,
    num_partitions: int,
    mode: str = "committed",
    carryover: bool = False,
    changelog_format: str = "struct",
    db_timezone: str = "UTC",
    dead_dir: str | None = None,
    version: int = 0,
    transform=None,
    open_dir: str | None = None,
    stage: str = "fused",
):
    """Build a pickle-able map_batches task fn with per-process reuse."""
    import json

    ref_key = markers_ref.hex() if hasattr(markers_ref, "hex") else str(id(markers_ref))
    tf_key = (
        f"{getattr(transform, '__module__', '')}."
        f"{getattr(transform, '__qualname__', repr(transform))}"
        if transform is not None
        else None
    )
    cache_key = (
        ref_key, json.dumps(table_schema_json), key_column, tuple(whitelist),
        scn_lo, scn_hi, num_partitions, mode, carryover, changelog_format,
        db_timezone, dead_dir, version, tf_key, open_dir, stage,
    )

    def fn(batch: pa.Table) -> pa.Table:
        proc = _PROC_CACHE.get(cache_key)
        if proc is None:
            if len(_PROC_CACHE) > 8:
                _PROC_CACHE.clear()
            if carryover:
                proc = CarryoverProcessor(
                    markers_ref, table_schema_json, key_column, num_partitions,
                    mode, open_dir,
                )
            else:
                proc = ChangeEventProcessor(
                    markers_ref, table_schema_json, key_column, whitelist,
                    scn_lo, scn_hi, num_partitions, mode,
                    changelog_format, db_timezone, dead_dir, version,
                    transform, open_dir, stage,
                )
            _PROC_CACHE[cache_key] = proc
        return proc(batch)

    fn.__name__ = f"{stage}_{mode}{'_carry' if carryover else ''}"
    return fn


class CarryoverProcessor:
    """Same tail of the pipeline for carryover spill rows, which are
    already in flat form (no decode, no re-transform): schema-align ->
    resolve -> combine/partition, with still-open rows side-written
    forward into the NEXT version's spill."""

    def __init__(
        self,
        markers_ref,
        table_schema_json: list[dict],
        key_column: str,
        num_partitions: int,
        mode: str = "committed",
        open_dir: str | None = None,
    ):
        from logminer_kafka_connect_ray.stages.evolve import align_flat

        table_schema = schemas.schema_from_json(table_schema_json)
        self.flat_schema = schemas.flat_change_schema(key_column, table_schema)
        self._align = align_flat
        self.resolver = CommitResolver(markers_ref, "committed")
        n_data = len(schemas.data_columns_of(table_schema, key_column))
        self.partitioner = PreaggPartitioner(key_column, n_data, num_partitions)
        self.mode = mode
        self.open_dir = open_dir if mode == "committed" else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self._align(batch, self.flat_schema)
        if self.mode == "committed":
            committed, open_rows = self.resolver.split(t)
            write_open_spill(self.open_dir, open_rows)
            return self.partitioner(committed)
        return self.resolver(t)
