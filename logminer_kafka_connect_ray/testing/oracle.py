"""Single-process replay oracle (FIXTURES.md F6).

Applies a change-event log to a python dict exactly the way the
reference's downstream state evolves: committed transactions only, in
``(commit_scn, scn, row_id)`` order (reference commit-order emission,
``TransactionConsolidator.kt:47-77`` + Kafka PK compaction), with

* INSERT/READ: full-image replace;
* UPDATE: per-column coalesce of the SET columns onto the current row
  (reference after-image enrichment, ``ConnectSchemaFactory.kt:97-104``),
  SET-to-NULL honored via ``set_cols`` (``issues/Issue14Test.kt``);
* DELETE: row removed;
* status=2 (unreadable) rows skipped (``LogminerSource.kt:96-115``);
* rolled-back / never-committed txns ignored
  (``TransactionConsolidator.kt:42-45``).

Used by the tests as the independent correctness oracle the engine's
merged Parquet lake is compared against.
"""

from __future__ import annotations


def replay_oracle(
    base: dict[str, dict],
    events: list[dict],
    include_open: bool = False,
) -> dict[str, dict]:
    """events: list of dicts in the generator's row shape (testing/gen.py)."""
    state = {k: dict(v) for k, v in base.items()}

    commit_scn: dict[str, int] = {}
    rolled: set[str] = set()
    for e in events:
        if e["op"] == "commit":
            commit_scn[e["tx_id"]] = e["scn"]
        elif e["op"] == "rollback":
            rolled.add(e["tx_id"])

    def key(e):
        return (commit_scn.get(e["tx_id"], e["scn"]), e["scn"], e["row_id"])

    applicable = []
    for e in events:
        if e["op"] in ("commit", "rollback"):
            continue
        if e.get("status", 0) == 2:
            continue
        tx = e["tx_id"]
        if tx in rolled:
            continue
        if e["op"] == "r" or tx == "NOT AVAILABLE" or tx is None:
            applicable.append(e)
        elif tx in commit_scn:
            applicable.append(e)
        elif include_open:
            applicable.append(e)

    for e in sorted(applicable, key=key):
        url = e["url"] if "url" in e else (e.get("after") or e.get("before"))["url"]
        if e["op"] == "d":
            state.pop(url, None)
        elif e["op"] in ("i", "r"):
            state[url] = {k: v for k, v in e["after"].items() if k != "url"}
        elif e["op"] == "u":
            after = {k: v for k, v in e["after"].items() if k != "url"}
            setc = e.get("set_cols")
            if setc is None:
                setc = [c for c, v in after.items() if v is not None]
            cur = state.get(url)
            if cur is None:
                cur = {k: v for k, v in (e.get("before") or {}).items() if k != "url"}
            newr = dict(cur)
            for c in setc:
                newr[c] = after.get(c)
            state[url] = newr
    return state
