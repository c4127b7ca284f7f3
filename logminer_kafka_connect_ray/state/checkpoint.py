"""Checkpoint / commit-manifest store.

Re-expresses the reference's offset model (``Offset.kt:19-59``:
``OracleLogOffset(scn, commitScn, isTransactionComplete)`` /
``SelectOffset(table, scn, rowId)`` serialized into Kafka Connect's
offset topic) as a versioned JSON manifest on shared storage, upgraded
from at-least-once to an exactly-once *table state*:

* one manifest per committed micro-batch, named by version
  (``manifest-v{version:08d}.json``), written atomically
  (temp file + ``os.rename``);
* a manifest lists, per lake partition, the current data file plus
  lineage (scn_lo, scn_hi, rows, checkpoint id) -- per-partition
  lineage + metrics per the north rule;
* replaying an already-committed micro-batch finds its manifest and
  skips => idempotent publish (reference analog: re-read suppression,
  ``logminer/LogminerFetcher.kt:19-41``, done at batch granularity);
* open (uncommitted) transactions at the end of a micro-batch are
  spilled to a parquet file referenced by the manifest -- the analog of
  the reference's conservative offset that never advances past the
  oldest open txn (``TransactionConsolidator.kt:56-64``): instead of
  re-reading those events, we carry them forward explicitly.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class PartitionEntry:
    """Lineage of one lake partition at one version."""

    part_id: int
    file: str | None          # relative path; None = empty partition
    rows: int = 0
    bytes: int = 0
    scn_lo: int | None = None  # scn range applied in the batch that wrote it
    scn_hi: int | None = None
    version: int = 0           # version whose merge last rewrote this partition
    schema_version: int = 0
    #: JSON data-skipping stats of the partition file content (host
    #: Bloom + numeric/timestamp zonemaps; stages/merge.py
    #: partition_stats_json).  "" = none (pre-stats manifests): scans
    #: must read the partition.
    stats: str = ""


@dataclass
class Manifest:
    version: int
    checkpoint_id: str
    #: offset semantics (reference Offset.kt): all events with
    #: scn <= watermark_scn from committed txns are fully applied.
    watermark_scn: int
    #: max commit scn applied (reference lastCommitScn,
    #: TransactionConsolidator.kt:24).
    last_commit_scn: int
    #: min scn over still-open txns (reference minOpenTransaction,
    #: TransactionConsolidator.kt:56-64); informational -- open events
    #: live in open_txn_spill, not re-read.
    min_open_scn: int | None
    phase: str                 # 'snapshot' | 'cdc'
    num_partitions: int
    schema_version: int
    schema: list[dict]         # serialized Arrow schema of the table
    partitions: list[PartitionEntry]
    open_txn_spill: str | None = None   # relative path of carryover parquet
    hash_probe: dict[str, int] = field(default_factory=dict)
    metrics: dict[str, Any] = field(default_factory=dict)
    #: DDL default literals per column (raw strings, typed on use):
    #: a column added with a DEFAULT backfills pre-existing rows with
    #: it (ChangingTableTest.kt:42-93) -- logically at read/merge time,
    #: physically at each partition's next copy-on-write rewrite
    defaults: dict[str, str] = field(default_factory=dict)
    #: DDL column renames (old -> new): rename policy is
    #: add-new+keep-old with lineage fill (stages/evolve.py
    #: catalog_renames doc); drops are ignored-but-accounted here
    renames: dict[str, str] = field(default_factory=dict)
    dropped: list[str] = field(default_factory=list)

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        d["partitions"] = [PartitionEntry(**p) for p in d["partitions"]]
        return Manifest(**d)


class PartialLedger:
    """Sub-batch resume ledger: per-partition completion records of an
    UNCOMMITTED micro-batch version, under ``{lake}/_partial/v{V:08d}``.

    The reference resumes at (scn, rowId) per record (``Offset.kt:19-59``);
    the distributed analog of that granularity is per lake partition:
    each :class:`~..stages.merge.PartitionMerger` task writes its lineage
    row here (temp + ``os.rename``, AFTER its partition parquet rename),
    so a driver crash mid-merge loses only the partitions still in
    flight.  The re-run of the same version loads the ledger, excludes
    completed partitions from the exchange entirely (their events are
    filtered before the shuffle and their files are not rewritten), and
    splices the recorded lineage into the manifest.  Entry content is
    deterministic (same changelog + same previous manifest), so a ledger
    row and a recomputation are interchangeable; the ledger is an
    optimization of the existing idempotent whole-batch re-run, not a
    new correctness dependency.  Cleared atomically-after the manifest
    publishes (a crash between publish and clear leaves a stale dir that
    the next merge sweeps: any ``_partial`` version <= the latest
    committed manifest is dead).
    """

    def __init__(self, lake_dir: str, version: int):
        self.lake_dir = lake_dir
        self.version = version
        self.dir = os.path.join(lake_dir, "_partial", f"v{version:08d}")

    def load(self) -> list[dict]:
        """All completed-partition lineage rows of this version."""
        if not os.path.isdir(self.dir):
            return []
        rows = []
        for f in sorted(os.listdir(self.dir)):
            if f.startswith("part-") and f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    rows.append(json.load(fh))
        return rows

    def clear(self) -> None:
        """Drop this version's ledger plus any stale (older) ones."""
        import shutil

        root = os.path.join(self.lake_dir, "_partial")
        if not os.path.isdir(root):
            return
        for d in os.listdir(root):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) <= self.version:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def write_ledger_entry(ledger_dir: str, row: dict) -> None:
    """Atomically record one completed partition merge (called from the
    merge task, after the partition parquet's own temp+rename).  A
    retried task rewrites the same deterministic content -- harmless."""
    os.makedirs(ledger_dir, exist_ok=True)
    path = os.path.join(ledger_dir, f"part-{row['part_id']:05d}.json")
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(row, f)
    os.rename(tmp, path)


class ManifestStore:
    """Versioned manifests under ``{lake_dir}/_manifests``."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.dir = os.path.join(lake_dir, "_manifests")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, version: int) -> str:
        return os.path.join(self.dir, f"manifest-v{version:08d}.json")

    def latest_version(self) -> int | None:
        versions = [
            int(f[len("manifest-v") : -len(".json")])
            for f in os.listdir(self.dir)
            if f.startswith("manifest-v") and f.endswith(".json")
        ]
        return max(versions) if versions else None

    def load(self, version: int | None = None) -> Manifest | None:
        if version is None:
            version = self.latest_version()
            if version is None:
                return None
        if not os.path.exists(self._path(version)):
            return None  # e.g. vacuumed-away old version
        with open(self._path(version)) as f:
            return Manifest.from_json(f.read())

    def exists(self, version: int) -> bool:
        return os.path.exists(self._path(version))

    def publish(self, m: Manifest) -> bool:
        """Atomically publish; returns False if the version already
        exists (idempotent re-run / concurrent-writer fencing).

        Uses ``os.link`` (fails with EEXIST instead of overwriting,
        unlike rename) so two drivers racing on the same version cannot
        both win -- the loser reads the winner's manifest and skips."""
        final = self._path(m.version)
        if os.path.exists(final):
            return False
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(m.to_json())
            try:
                os.link(tmp, final)  # atomic create-if-absent on POSIX
            except FileExistsError:
                return False
            return True
        finally:
            os.unlink(tmp)
