"""Changelog source: SCN-range-pruned reading of change-event files.

The analog of the reference's LogMiner session setup
(``logminer/LogminerSession.kt:203-316``): where the reference asks
V$ARCHIVED_LOG / V$LOG which redo-log files cover ``[start_scn, inf)``
and feeds exactly those to ``DBMS_LOGMNR.START_LOGMNR``, we list the
changelog directory's Parquet files and prune by their ``scn``
footer min/max statistics -- pure metadata, no data I/O.

Resume-skip (``logminer/LogminerFetcher.kt:74-101``: fast-forward past
the offset's (scn, rowId)) becomes a predicate pushed into the Parquet
scan.  Gap detection (``LogminerFetcher.kt:92-97``: archive log deleted
-> warn and continue) becomes an SCN-contiguity check over file stats.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

import pyarrow.compute as pc
import pyarrow.parquet as pq

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class BatchFile:
    path: str
    scn_min: int
    scn_max: int
    num_rows: int


def list_batch_files(changelog_dir: str) -> list[BatchFile]:
    """Footer-stats scan of the changelog directory (metadata only)."""
    out = []
    for name in sorted(os.listdir(changelog_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(changelog_dir, name)
        md = pq.ParquetFile(path).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema == "scn" and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is None:
            # no stats: read the scn column to compute the range
            t = pq.read_table(path, columns=["scn"])
            lo = pc.min(t.column("scn")).as_py()
            hi = pc.max(t.column("scn")).as_py()
        out.append(BatchFile(path, int(lo), int(hi), md.num_rows))
    return out


def prune_files(
    files: list[BatchFile], scn_lo: int | None, scn_hi: int | None
) -> list[BatchFile]:
    """Keep files whose [scn_min, scn_max] overlaps (scn_lo, scn_hi]."""
    kept = []
    for f in files:
        if scn_lo is not None and f.scn_max <= scn_lo:
            continue
        if scn_hi is not None and f.scn_min > scn_hi:
            continue
        kept.append(f)
    return kept


def check_contiguity(files: list[BatchFile], start_scn: int | None) -> list[str]:
    """Warn (never fail) on SCN gaps between consecutive batch files --
    the reference's deleted-archive-log handling
    (``logminer/LogminerFetcher.kt:92-97``)."""
    warnings = []
    prev_hi = start_scn
    for f in sorted(files, key=lambda x: x.scn_min):
        if prev_hi is not None and f.scn_min > prev_hi + 1:
            msg = (
                f"SCN gap in changelog: {prev_hi} -> {f.scn_min} "
                f"(file {os.path.basename(f.path)}); continuing from earliest available"
            )
            warnings.append(msg)
            log.warning(msg)
        prev_hi = max(prev_hi, f.scn_max) if prev_hi is not None else f.scn_max
    return warnings


def plan_microbatches(
    files: list[BatchFile], max_events: int
) -> list[tuple[list[BatchFile], int, int]]:
    """Group SCN-ordered batch files into micro-batches of at most
    ~max_events change rows.  Returns [(files, scn_lo_excl, scn_hi_incl)].

    Files are atomic units (their ranges don't interleave by
    construction of the log writer); the micro-batch boundary is the
    last file's scn_max, so a checkpoint always sits at a file edge.
    """
    files = sorted(files, key=lambda f: f.scn_min)
    batches = []
    cur: list[BatchFile] = []
    cur_rows = 0
    for f in files:
        if cur and cur_rows + f.num_rows > max_events:
            batches.append((cur, cur[0].scn_min - 1, cur[-1].scn_max))
            cur, cur_rows = [], 0
        cur.append(f)
        cur_rows += f.num_rows
    if cur:
        batches.append((cur, cur[0].scn_min - 1, cur[-1].scn_max))
    return batches
