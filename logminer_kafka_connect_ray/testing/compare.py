"""Canonical comparison helpers for engine-vs-oracle assertions."""

from __future__ import annotations

import datetime as _dt
import math


def canon(v):
    """Normalize a cell value for comparison: timestamps -> int
    microseconds since epoch (UTC); bytes stay bytes; NaN -> None."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if hasattr(v, "timestamp") and not isinstance(v, (int, float, str, bytes)):
        return int(v.timestamp() * 1_000_000)  # pd.Timestamp
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def canon_row(row: dict) -> dict:
    return {k: canon(v) for k, v in row.items()}


def table_to_state(table_or_rows, key: str = "url") -> dict[str, dict]:
    """Arrow table / list-of-dicts -> {key: canonical row dict}."""
    rows = (
        table_or_rows.to_pylist()
        if hasattr(table_or_rows, "to_pylist")
        else table_or_rows
    )
    return {
        r[key]: canon_row({k: v for k, v in r.items() if k != key and not k.startswith("_")})
        for r in rows
    }


def state_diff(got: dict[str, dict], want: dict[str, dict], limit: int = 5):
    """Human-readable diff between two {key: row} states."""
    want_c = {k: canon_row(v) for k, v in want.items()}
    diffs = []
    for k in sorted(set(got) | set(want_c)):
        g, w = got.get(k), want_c.get(k)
        if g != w:
            detail = {}
            for c in set(g or {}) | set(w or {}):
                gv, wv = (g or {}).get(c), (w or {}).get(c)
                if gv != wv:
                    detail[c] = (gv, wv)
            diffs.append((k, detail or ("missing" if g is None else "extra")))
        if len(diffs) >= limit:
            break
    return diffs


def assert_states_equal(got, want, limit: int = 5):
    diffs = state_diff(got, want, limit)
    assert not diffs, f"state mismatch ({len(diffs)}+ keys): {diffs}"
