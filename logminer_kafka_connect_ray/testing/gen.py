"""Deterministic synthetic fixtures (FIXTURES.md F1/F2/F3/F5).

Everything is seeded and pure -- no wall clock, no unseeded randomness --
so the dict oracle (``testing/oracle.py``) and the Ray engine can be
compared byte-for-byte.

The change-event generator mirrors the redo-log semantics the reference
consumes (SURVEY.md section 1.1):

* per-txn change rows carrying (scn, row_id, tx_id) + before/after
  images (reference ``logminer/LogminerRow.kt:21-44``);
* separate COMMIT / ROLLBACK marker rows; a txn's changes count only if
  a commit marker exists (``TransactionConsolidator.kt:32-45``);
* interleaved transactions: commit order != start order
  (``OffsetIntegrationTest.kt:29-44``); per-key serialization by commit
  order (Oracle row locks make concurrent same-key txns impossible);
* UPDATE: full before image, partial after image (only SET columns)
  (``DMLOperationsTest.kt:55-67``), including SET-to-NULL
  (``issues/Issue14Test.kt:93-116``) via the explicit ``set_cols`` list;
* snapshot READ rows: full after, tx_id='NOT AVAILABLE'
  (``initial/TableFetcher.kt:58-69``);
* unreadable rows (status=2) sprinkled in to exercise the skip path
  (``LogminerSource.kt:96-115``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.functions.text import extract_text_one

EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed

_HTML_TMPL = (
    "<html><head><title>page {i}</title></head><body>"
    "<h1>Doc {i}</h1><p>{body}</p><div class=\"f\">host {host}</div>"
    "</body></html>"
)
_WORDS = (
    "data web crawl page index query batch stream merge commit log scan "
    "table row key value shard block arrow ray lake delta text html"
).split()


def make_html(i: int, host: int, rng: np.random.Generator) -> bytes:
    body = " ".join(rng.choice(_WORDS, size=8 + int(rng.integers(0, 24))))
    return _HTML_TMPL.format(i=i, body=body, host=host).encode()


def make_url(i: int, n_hosts: int) -> str:
    return f"https://site{i % n_hosts}.example/p/{i}"


def gen_pages(n_rows: int, n_hosts: int = 20, seed: int = 42) -> pa.Table:
    """Base `pages` table (F1): url, warc_ts, html, text, lang."""
    rng = np.random.default_rng(seed)
    langs = ["en", "de", "fr", "es", "it"]
    urls, ts, htmls, texts, lang = [], [], [], [], []
    for i in range(n_rows):
        h = make_html(i, i % n_hosts, rng)
        urls.append(make_url(i, n_hosts))
        ts.append(EPOCH_US + i * 1_000_000)
        htmls.append(h)
        texts.append(extract_text_one(h))
        lang.append(langs[i % len(langs)])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
        }
    )


@dataclass
class ChangeGenConfig:
    n_events: int = 500
    seed: int = 42
    start_scn: int = 1000
    #: probability a new event starts a new txn (txn size ~ geometric)
    p_new_txn: float = 0.35
    #: max concurrently open txns (interleaving degree)
    max_open_txns: int = 4
    p_rollback: float = 0.1
    p_insert: float = 0.25
    p_delete: float = 0.15
    #: fraction of updates that SET a column to NULL explicitly
    p_set_null: float = 0.08
    #: fraction of change rows marked unreadable (status=2)
    p_unreadable: float = 0.0
    #: Zipf exponent for key choice; None = uniform (F5 uses ~1.2)
    zipf_s: float | None = None
    #: SCN at which schema evolution happens: events after it carry the
    #: extra `fetch_status:int32` column in their images (F3)
    evolution_at_scn: int | None = None
    #: leave this many txns open (uncommitted) at end-of-log
    leave_open: int = 0
    table: str = "WEB.PAGES"
    #: txn-id prefix; Oracle XIDs are database-global, so fixtures
    #: combining multiple generated logs must use distinct prefixes
    tx_prefix: str = "tx"
    n_hosts: int = 20


@dataclass
class _Txn:
    tx_id: str
    keys: set = field(default_factory=set)
    events: list = field(default_factory=list)  # pending effect rows
    start_scn: int = 0


def gen_changes(pages: pa.Table, cfg: ChangeGenConfig):
    """Generate a change-event log + the expected final state.

    Returns ``(events: list[dict], final_state: dict[url, row-dict],
    evolved: bool)``.  ``final_state`` reflects committed txns applied
    in commit order -- the generator maintains it as the ground truth.
    """
    rng = np.random.default_rng(cfg.seed)
    state: dict[str, dict] = {}
    for row in pages.to_pylist():
        state[row["url"]] = {k: v for k, v in row.items() if k != "url"}

    data_cols = ["warc_ts", "html", "text", "lang"]
    evolved_cols = data_cols + ["fetch_status"]
    known_urls = list(state.keys())
    next_new_i = len(known_urls) + 1_000_000
    scn = cfg.start_scn
    txn_seq = 0
    events: list[dict] = []
    open_txns: list[_Txn] = []
    evolved = False

    def claimed() -> set:
        return set().union(*(t.keys for t in open_txns)) if open_txns else set()

    def pick_key(existing: bool) -> str | None:
        nonlocal next_new_i
        if not existing:
            next_new_i += 1
            return make_url(next_new_i, cfg.n_hosts)
        avail = [u for u in known_urls if u in state and u not in claimed()]
        if not avail:
            return None
        if cfg.zipf_s:
            # deterministic zipf over index
            ranks = np.arange(1, len(avail) + 1, dtype=np.float64)
            p = ranks ** (-cfg.zipf_s)
            p /= p.sum()
            return avail[int(rng.choice(len(avail), p=p))]
        return avail[int(rng.integers(0, len(avail)))]

    def row_id(s: int) -> str:
        return f"AAAx{s:010d}"

    def img(row: dict | None, use_evolved: bool) -> dict | None:
        if row is None:
            return None
        cols = evolved_cols if use_evolved else data_cols
        return {c: row.get(c) for c in cols}

    n_emitted = 0
    while n_emitted < cfg.n_events:
        # maybe open a txn
        if open_txns and (len(open_txns) >= cfg.max_open_txns or rng.random() > cfg.p_new_txn):
            txn = open_txns[int(rng.integers(0, len(open_txns)))]
        else:
            txn_seq += 1
            txn = _Txn(tx_id=f"{cfg.tx_prefix}{txn_seq:06d}", start_scn=scn)
            open_txns.append(txn)

        use_evolved = cfg.evolution_at_scn is not None and scn >= cfg.evolution_at_scn
        evolved = evolved or use_evolved

        # txn-local view = committed state + txn's own pending effects
        view = dict(state)
        for eff in txn.events:
            if eff["op"] == "d":
                view.pop(eff["url"], None)
            else:
                view[eff["url"]] = eff["_new_row"]

        r = rng.random()
        ev: dict | None = None
        if r < cfg.p_insert:
            url = pick_key(existing=False)
            i = next_new_i
            h = make_html(i, i % cfg.n_hosts, rng)
            new_row = {
                "warc_ts": EPOCH_US + scn * 1_000_000,
                "html": h,
                "text": extract_text_one(h),
                "lang": ["en", "de", "fr"][i % 3],
            }
            if use_evolved:
                new_row["fetch_status"] = int(rng.integers(200, 500))
            ev = {
                "op": "i", "url": url, "before": None,
                "after": img(new_row, use_evolved), "set_cols": None,
                "_new_row": new_row,
            }
            txn.keys.add(url)
        elif r < cfg.p_insert + cfg.p_delete:
            url = pick_key(existing=True)
            if url is not None and url in view:
                ev = {
                    "op": "d", "url": url,
                    "before": img(view[url], use_evolved), "after": None,
                    "set_cols": None, "_new_row": None,
                }
                txn.keys.add(url)
        else:
            url = pick_key(existing=True)
            if url is not None and url in view:
                cur = view[url]
                n_set = int(rng.integers(1, 3))
                settable = ["text", "lang", "html"]
                if use_evolved:
                    settable.append("fetch_status")
                set_cols = sorted(
                    rng.choice(settable, size=min(n_set, len(settable)), replace=False)
                )
                new_row = dict(cur)
                if use_evolved and "fetch_status" not in new_row:
                    new_row["fetch_status"] = None
                after = {c: None for c in (evolved_cols if use_evolved else data_cols)}
                explicit_null = rng.random() < cfg.p_set_null
                # a re-crawl that updates html updates the extracted
                # text with it (keeps the text==extract(html) invariant
                # checkable end-to-end)
                if "html" in set_cols and "text" not in set_cols:
                    set_cols = sorted(set_cols + ["text"])
                for c in set_cols:
                    if explicit_null and c == "lang":
                        val = None
                    elif c == "html":
                        h = make_html(scn, scn % cfg.n_hosts, rng)
                        val = h
                        if "text" in set_cols:
                            after["text"] = extract_text_one(h)
                            new_row["text"] = after["text"]
                    elif c == "text":
                        if "html" in set_cols:
                            continue  # derived from the new html above
                        val = f"updated text scn={scn} " + " ".join(
                            rng.choice(_WORDS, size=5)
                        )
                    elif c == "lang":
                        val = ["en", "de", "fr", "es"][scn % 4]
                    else:
                        val = int(rng.integers(200, 500))
                    after[c] = val
                    new_row[c] = val
                ev = {
                    "op": "u", "url": url,
                    "before": img(cur, use_evolved), "after": after,
                    "set_cols": list(set_cols) if explicit_null else None,
                    "_new_row": new_row,
                }
                txn.keys.add(url)

        if ev is not None:
            status = 2 if rng.random() < cfg.p_unreadable else 0
            events.append(
                {
                    "scn": scn, "row_id": row_id(scn), "commit_scn": None,
                    "url": ev["url"], "tx_id": txn.tx_id, "op": ev["op"],
                    "ts_ms": (EPOCH_US + scn * 1_000_000) // 1000,
                    "table": cfg.table, "username": "WEBCRAWL",
                    "status": status,
                    "before": ev["before"], "after": ev["after"],
                    "set_cols": ev["set_cols"],
                }
            )
            txn.events.append({**ev, "scn": scn, "status": status})
            n_emitted += 1
            scn += 1

        # maybe close a txn (never below leave_open at the very end)
        close_roll = rng.random()
        if open_txns and (close_roll < 0.25 or n_emitted >= cfg.n_events):
            while open_txns and (
                close_roll < 0.25 or n_emitted >= cfg.n_events
            ):
                if n_emitted >= cfg.n_events and len(open_txns) <= cfg.leave_open:
                    break
                t = open_txns.pop(0)
                rolled = rng.random() < cfg.p_rollback
                events.append(
                    {
                        "scn": scn, "row_id": row_id(scn),
                        "commit_scn": scn,
                        "tx_id": t.tx_id,
                        "op": "rollback" if rolled else "commit",
                        "ts_ms": (EPOCH_US + scn * 1_000_000) // 1000,
                        "table": cfg.table, "username": "WEBCRAWL",
                        "status": 0, "before": None, "after": None,
                        "set_cols": None,
                    }
                )
                scn += 1
                if not rolled:
                    for eff in t.events:
                        if eff["status"] == 2:
                            continue  # unreadable rows are skipped
                        if eff["op"] == "d":
                            state.pop(eff["url"], None)
                        else:
                            prev = state.get(eff["url"])
                            if eff["op"] == "u":
                                newr = dict(prev) if prev else {
                                    k: v for k, v in (eff["before"] or {}).items()
                                }
                                setc = (
                                    eff["set_cols"]
                                    if eff["set_cols"] is not None
                                    else [k for k, v in eff["after"].items() if v is not None]
                                )
                                for c in setc:
                                    newr[c] = eff["after"][c]
                                state[eff["url"]] = newr
                            else:
                                state[eff["url"]] = dict(eff["after"])
                        if eff["url"] not in known_urls:
                            known_urls.append(eff["url"])
                if len(open_txns) <= cfg.leave_open and n_emitted >= cfg.n_events:
                    break
                close_roll = rng.random()

    return events, state, evolved


def events_to_table(events: list[dict], evolved: bool) -> pa.Table:
    """Rows -> Arrow table in the on-disk change-event schema (F2)."""
    table_schema = pa.schema(
        schemas.PAGES_FIELDS
        + ([("fetch_status", pa.int32())] if evolved else [])
    )
    ev_schema = schemas.change_event_schema(table_schema)

    def fix_img(img: dict | None, url: str | None) -> dict | None:
        if img is None:
            return None
        # the key lives inside the image structs, like the reference's
        # parsed column maps (LogminerRow.kt:63-96)
        out = {"url": url}
        for f in table_schema:
            if f.name == "url":
                continue
            out[f.name] = img.get(f.name)
        return out

    rows = []
    for e in events:
        r = dict(e)
        url = e.get("url")
        b, a = fix_img(e["before"], url), fix_img(e["after"], url)
        rows.append(
            {
                "scn": r["scn"], "row_id": r["row_id"],
                "commit_scn": r["commit_scn"], "tx_id": r["tx_id"],
                "op": r["op"], "ts_ms": r["ts_ms"], "table": r["table"],
                "username": r["username"], "status": r["status"],
                "before": b, "after": a, "set_cols": r["set_cols"],
            }
        )
    return pa.Table.from_pylist(rows, schema=ev_schema)


def write_event_batches(
    events: list[dict], out_dir: str, events_per_file: int = 200
) -> list[str]:
    """Write the change log as SCN-ordered micro-batch Parquet files.

    One file per SCN range with footer min/max stats on `scn` -- the
    analog of V$ARCHIVED_LOG SCN ranges used for log-file pruning
    (reference logminer/LogminerSession.kt:62-77).  When the schema
    evolves mid-log, files are split at the evolution point so each
    file has a single schema era (F3).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    chunk: list[dict] = []
    chunk_evolved: bool | None = None

    def flush():
        nonlocal chunk, chunk_evolved
        if not chunk:
            return
        tbl = events_to_table(chunk, bool(chunk_evolved))
        lo, hi = chunk[0]["scn"], chunk[-1]["scn"]
        p = os.path.join(out_dir, f"batch-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
        chunk, chunk_evolved = [], None

    for e in sorted(events, key=lambda x: (x["scn"], x["row_id"])):
        e_ev = bool(
            (e["before"] and "fetch_status" in e["before"])
            or (e["after"] and "fetch_status" in e["after"])
        )
        if chunk and (len(chunk) >= events_per_file or e_ev != chunk_evolved):
            flush()
        if not chunk:
            chunk_evolved = e_ev
        chunk.append(e)
    flush()
    return paths


# ---------------------------------------------------------------------------
# Redo-SQL changelog rendering (the reference's v$logmnr_contents shape)
# ---------------------------------------------------------------------------
REDO_SQL_SCHEMA = pa.schema(
    [
        ("scn", pa.int64()),
        ("row_id", pa.string()),
        ("commit_scn", pa.int64()),
        ("tx_id", pa.string()),
        ("op", pa.string()),
        ("ts_ms", pa.timestamp("ms", tz="UTC")),
        ("table", pa.string()),
        ("username", pa.string()),
        ("status", pa.int32()),
        ("csf", pa.int32()),
        ("sql_redo", pa.string()),
    ]
)


def _sql_literal(v) -> str:
    """Render a value as an Oracle-ish redo-SQL literal."""
    import datetime as _dt

    if v is None:
        return "NULL"
    if isinstance(v, bytes):
        return f"HEXTORAW('{v.hex()}')"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, int) and abs(v) > 10_000_000_000:  # us-epoch timestamp
        ts = _dt.datetime.fromtimestamp(v / 1_000_000, _dt.timezone.utc)
        return f"TO_TIMESTAMP('{ts.strftime('%Y-%m-%d %H:%M:%S.%f')}', 'YYYY-MM-DD HH24:MI:SS.FF6')"
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return f"TO_TIMESTAMP('{v.strftime('%Y-%m-%d %H:%M:%S.%f')}', 'YYYY-MM-DD HH24:MI:SS.FF6')"
    return str(v)


def event_to_redo_sql(e: dict, table_ident: str = '"WEB"."PAGES"') -> str | None:
    """One generator event -> its redo statement (change ops only)."""
    op = e["op"]
    if op in ("commit", "rollback"):
        return None

    def where_clause(img: dict) -> str:
        parts = [f'"url" = {_sql_literal(e["url"])}']
        for c, v in (img or {}).items():
            parts.append(
                f'"{c}" IS NULL' if v is None else f'"{c}" = {_sql_literal(v)}'
            )
        # real LogMiner WHERE clauses always carry the ROWID predicate
        parts.append(f"ROWID = '{e['row_id']}'")
        return " where " + " and ".join(parts)

    if op in ("i", "r"):
        cols = ["url"] + list(e["after"].keys())
        vals = [e["url"]] + list(e["after"].values())
        col_s = ",".join(f'"{c}"' for c in cols)
        val_s = ",".join(_sql_literal(v) for v in vals)
        return f"insert into {table_ident}({col_s}) values ({val_s})"
    if op == "u":
        set_cols = (
            e["set_cols"]
            if e.get("set_cols") is not None
            else [c for c, v in e["after"].items() if v is not None]
        )
        set_s = " , ".join(
            f'"{c}" = {_sql_literal(e["after"].get(c))}' for c in set_cols
        )
        return f"update {table_ident} set {set_s}{where_clause(e['before'])}"
    if op == "d":
        return f"delete from {table_ident}{where_clause(e['before'])}"
    raise ValueError(op)


def _infer_oracle_decl(values: list) -> str:
    """Infer an Oracle column declaration from sample Python values
    (the generator's stand-in for the real dictionary's type info)."""
    import datetime as _dt

    for v in values:
        if v is None:
            continue
        if isinstance(v, bool) or isinstance(v, int):
            # us-epoch timestamps ride as big ints in generator images
            return "TIMESTAMP(6)" if abs(v) > 10_000_000_000 else "NUMBER(9)"
        if isinstance(v, float):
            return "BINARY_DOUBLE"
        if isinstance(v, bytes):
            return "BLOB"
        if isinstance(v, _dt.datetime):
            return "TIMESTAMP(6)"
        if isinstance(v, _dt.date):
            return "DATE"
        return "VARCHAR2"
    return "VARCHAR2"


def write_redo_catalog(events: list[dict], out_dir: str) -> str:
    """Write the dictionary sidecar ``_catalog.json``: column name ->
    Oracle type declaration for every column appearing in any image.
    This is the redo-log analog of the reference's LogMiner dictionary
    (DictionaryStrategy / SchemaService.kt:30-108): the schema source
    the engine refreshes from when a statement references a column it
    does not know yet (ChangingTableTest.kt semantics)."""
    import json

    cols: dict[str, list] = {}
    for e in events:
        for img in (e.get("before"), e.get("after")):
            for c, v in (img or {}).items():
                cols.setdefault(c, []).append(v)
    catalog = {c: _infer_oracle_decl(vs) for c, vs in sorted(cols.items())}
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "_catalog.json")
    with open(path, "w") as f:
        json.dump({"columns": catalog}, f, indent=1)
    return path


def write_redo_sql_batches(
    events: list[dict],
    out_dir: str,
    events_per_file: int = 200,
    csf_fragment_len: int | None = None,
    with_catalog: bool = True,
) -> list[str]:
    """Write the change log in redo-SQL shape.  ``csf_fragment_len``
    splits long statements into CSF continuation rows (reference
    LongStatementsTest: >4000-byte statements arrive fragmented).
    ``with_catalog`` also writes the ``_catalog.json`` dictionary
    sidecar (see write_redo_catalog)."""
    os.makedirs(out_dir, exist_ok=True)
    if with_catalog:
        write_redo_catalog(events, out_dir)
    rows: list[dict] = []
    for e in sorted(events, key=lambda x: (x["scn"], x["row_id"])):
        sql = event_to_redo_sql(e)
        meta = {
            "scn": e["scn"], "row_id": e["row_id"],
            "commit_scn": e["commit_scn"], "tx_id": e["tx_id"], "op": e["op"],
            "ts_ms": e["ts_ms"], "table": e["table"],
            "username": e["username"], "status": e["status"],
        }
        if sql is None:
            rows.append({**meta, "csf": 0, "sql_redo": None})
        elif csf_fragment_len and len(sql) > csf_fragment_len:
            frags = [
                sql[i : i + csf_fragment_len]
                for i in range(0, len(sql), csf_fragment_len)
            ]
            for j, frag in enumerate(frags):
                rows.append(
                    {**meta, "csf": 1 if j < len(frags) - 1 else 0, "sql_redo": frag}
                )
        else:
            rows.append({**meta, "csf": 0, "sql_redo": sql})

    paths = []
    # never split a CSF run across files
    i = 0
    file_rows: list[dict] = []

    def flush():
        nonlocal file_rows
        if not file_rows:
            return
        tbl = pa.Table.from_pylist(file_rows, schema=REDO_SQL_SCHEMA)
        lo, hi = file_rows[0]["scn"], file_rows[-1]["scn"]
        p = os.path.join(out_dir, f"batch-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
        file_rows = []

    while i < len(rows):
        run = [rows[i]]
        while rows[i]["csf"] == 1 and i + 1 < len(rows):
            i += 1
            run.append(rows[i])
        i += 1
        if file_rows and len(file_rows) + len(run) > events_per_file:
            flush()
        file_rows.extend(run)
    flush()
    return paths


def smt_mark_text(t):
    """Module-level example SMT for tests (pickles to Ray workers):
    prefix every event-derived after-image text with 'smt:'."""
    import pyarrow as pa
    import pyarrow.compute as pc

    i = t.column_names.index("a_text")
    marked = pc.binary_join_element_wise(
        pa.array(["smt:"] * t.num_rows), t.column("a_text").cast(pa.string()), ""
    )
    return t.set_column(i, "a_text", pc.if_else(
        pc.is_valid(t.column("a_text")), marked, t.column("a_text")
    ))


def corrections_for(
    events: list[dict], dead_scns: set[int], table_schema: pa.Schema
) -> pa.Table:
    """Repair-tooling stand-in for generated workloads: re-decode the
    ORIGINAL rows of the dead-lettered events with the engine's own
    :class:`~..stages.decode.ChangeDecoder` (zero semantic drift --
    set_mask/validity/enrichment are the decoder's, not a re-
    implementation), then resolve ``commit_scn`` from the source's
    txn markers.  Rolled-back / never-committed txns are dropped:
    there is nothing to repair.  Output is the flat resolved shape
    ``Engine.repair`` takes."""
    import pyarrow.compute as pc

    from logminer_kafka_connect_ray.stages.decode import ChangeDecoder

    commit_scn_of = {
        e["tx_id"]: e["scn"] for e in events if e["op"] == "commit"
    }
    fix = [
        e for e in events
        if e["scn"] in dead_scns and e["op"] in ("i", "u", "d")
        and e["tx_id"] in commit_scn_of
    ]
    if not fix:
        return ChangeDecoder(table_schema, "url").out_schema.empty_table()
    evolved = "fetch_status" in table_schema.names and any(
        "fetch_status" in (e.get("after") or {}) for e in events
    )
    raw = events_to_table(fix, evolved)
    flat = ChangeDecoder(table_schema, "url")(raw)
    cscn = pa.array([commit_scn_of[e["tx_id"]] for e in fix], pa.int64())
    return flat.set_column(
        flat.schema.get_field_index("commit_scn"), "commit_scn", cscn
    )
