"""Derived CDC workload over the driver's synthetic tables.

The driver's correctness gate runs each ``queries()`` entry AND an
equivalent DuckDB SQL string over the same parquet tables.  The CDC
engine's native inputs (a web-page lake + a change-event log) are
therefore **derived deterministically** from the driver tables:

* base ``pages``    <- ``documents``  (one page per doc)
* change-event log  <- ``events``     (one change per event row)

Both derivations are simple enough to restate in ANSI SQL (see
``__ray_entry__.oracle_sql``), which makes the *full engine replay*
SQL-checkable:

    url        = 'https://site' || (doc_id % 20) || '.example/d/' || doc_id
    change key = url of doc (user_id % n_docs)
    scn        = 2000 + event_id * 2
    txn        = event_id // 5   (5 consecutive events per txn)
    commit scn = 2000 + (txn*5+4)*2 + 1;  txn % 11 == 7 -> ROLLBACK
    op         = error->DELETE, signup->INSERT(full image),
                 click/view->UPDATE SET text, purchase->UPDATE SET lang

UPDATE rows carry **no before image** (the reference's
missing-supplemental-logging shape, ``SourceTask.kt:133-141``) so the
merge's before-image fallback path is exercised: an update applied to a
deleted/absent key yields a row with only its SET columns.

Timestamps here are tz-naive (DuckDB has no tz) -- the engine adopts
whatever schema the base parquet carries.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from logminer_kafka_connect_ray import schemas

N_HOSTS = 20
SCN0 = 2000
TXN_SIZE = 5
ROLLBACK_MOD = 11
ROLLBACK_REM = 7
#: events per redo-derive generation chunk (txn-aligned; see
#: derive_changelog_redo_sql) -- patchable in tests
REDO_DERIVE_CHUNK_EVENTS = 1_000_000 - (1_000_000 % TXN_SIZE)
TABLE_NAME = "WEB.PAGES"
SNAPSHOT_SCN = SCN0 - 1

PAGES_SCHEMA_NAIVE = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)


def _const(s: str, n: int) -> pa.Array:
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, np.int32)), pa.array([s])
    ).cast(pa.string())


def _concat(*parts) -> pa.Array:
    n = next(len(p) for p in parts if not isinstance(p, str))
    arrays = [
        _const(p, n) if isinstance(p, str) else pc.cast(pa.array(p) if isinstance(p, np.ndarray) else p, pa.string())
        for p in parts
    ]
    out = pc.binary_join_element_wise(*arrays, "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _urls(doc_ids: np.ndarray) -> pa.Array:
    return _concat("https://site", doc_ids % N_HOSTS, ".example/d/", doc_ids)


def url_of(doc_id: int) -> str:
    """The url of one doc (scalar sibling of ``_urls``)."""
    return f"https://site{doc_id % N_HOSTS}.example/d/{doc_id}"


def derive_pages(sf_dir: str) -> pa.Table:
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    doc_ids = docs.column("doc_id").to_numpy()
    text = docs.column("text")
    html = pc.binary_join_element_wise(
        pa.array(["<html><body>"] * len(docs)),
        pc.cast(text, pa.string()),
        pa.array(["</body></html>"] * len(docs)),
        "",
    )
    return pa.table(
        {
            "url": _urls(doc_ids),
            "warc_ts": pa.array(_EPOCH_2024 + doc_ids * 1_000_000, pa.timestamp("us")),
            "html": pc.cast(html, pa.binary()),
            "text": text,
            "lang": docs.column("lang"),
        },
        schema=PAGES_SCHEMA_NAIVE,
    )


def derive_changelog(
    sf_dir: str,
    out_dir: str,
    events_per_file: int = 100_000,
    replicate: int = 1,
    skew: bool = False,
) -> list[str]:
    """Vectorized events-table -> change-event parquet files.

    ``replicate=R`` tiles the events table R times with disjoint
    event_id ranges (bench-only amplification; the SQL oracles assume
    R=1)."""
    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    n_docs = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    eid = ev.column("event_id").to_numpy()
    etype = ev.column("event_type").to_pandas().to_numpy()
    user = ev.column("user_id").to_numpy()
    ts_us = ev.column("ts").cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
    if replicate > 1:
        n0 = len(eid)
        reps = np.arange(replicate).repeat(n0)
        eid = np.tile(eid, replicate) + reps * n0
        etype = np.tile(etype, replicate)
        user = np.tile(user, replicate) + reps  # shift key mix per replica
        ts_us = np.tile(ts_us, replicate)

    doc = user % n_docs
    if skew:
        # hot-key variant (north rule: skewed hot urls): half of all
        # events hit just 10 keys
        doc = np.where(eid % 2 == 0, eid % 10, doc)
    url = _urls(doc)
    scn = SCN0 + eid * 2
    tx = eid // TXN_SIZE
    op_np = np.where(
        etype == "error", "d", np.where(etype == "signup", "i", "u")
    )
    op = op_np

    # after-image fields (all Arrow string kernels: C-speed concat)
    is_i = op_np == "i"
    is_text_u = (etype == "click") | (etype == "view")
    is_lang_u = etype == "purchase"
    i_arr = pa.array(is_i)
    text_val = pc.if_else(
        i_arr, _concat("signup:", eid), _concat("u:", eid)
    )
    text_valid = is_i | is_text_u
    lang_val = pc.if_else(
        i_arr, _concat("xx", eid % 5), _concat("p", eid % 5)
    )
    lang_valid = is_i | is_lang_u
    html_val = _concat("<html><body>signup:", eid, "</body></html>")

    def _one(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    # vectorized masked build: set invalid entries to null
    def arr_masked(values, valid, typ):
        a = values if isinstance(values, (pa.Array, pa.ChunkedArray)) else pa.array(values)
        return _one(pc.if_else(pa.array(valid), a.cast(typ), pa.nulls(len(valid), typ)))

    after = pa.StructArray.from_arrays(
        [
            _one(url),
            arr_masked(ts_us, is_i, pa.timestamp("us")),
            _one(pc.cast(arr_masked(html_val, is_i, pa.string()), pa.binary())),
            arr_masked(text_val, text_valid, pa.string()),
            arr_masked(lang_val, lang_valid, pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
        mask=pa.array(op == "d"),
    )
    n = len(eid)
    img_type = schemas.image_struct(PAGES_SCHEMA_NAIVE)
    # DELETE rows carry the key in the before image (reference DELETE:
    # full before, null after -- AbstractIntegrationTest.kt:68)
    before = pa.StructArray.from_arrays(
        [
            _one(url),
            pa.nulls(n, pa.timestamp("us")),
            pa.nulls(n, pa.binary()),
            pa.nulls(n, pa.string()),
            pa.nulls(n, pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
        mask=pa.array(op != "d"),
    )
    ev_schema = schemas.change_event_schema(PAGES_SCHEMA_NAIVE)

    changes = pa.table(
        {
            "scn": pa.array(scn, pa.int64()),
            "row_id": _concat("R", scn),
            "commit_scn": pa.nulls(n, pa.int64()),
            "tx_id": _concat("tx", tx),
            "op": pa.array(op),
            "ts_ms": pa.array(ts_us // 1000, pa.timestamp("ms", tz="UTC")),
            "table": pa.array([TABLE_NAME] * n),
            "username": pa.nulls(n, pa.string()),
            "status": pa.array(np.zeros(n, np.int32)),
            "before": before,
            "after": after,
            "set_cols": pa.nulls(n, pa.list_(pa.string())),
        },
        schema=ev_schema,
    )

    # marker rows: one per distinct txn
    txs = np.unique(tx)
    m_scn = SCN0 + (txs * TXN_SIZE + (TXN_SIZE - 1)) * 2 + 1
    m_op = np.where(txs % ROLLBACK_MOD == ROLLBACK_REM, "rollback", "commit")
    nm = len(txs)
    markers = pa.table(
        {
            "scn": pa.array(m_scn, pa.int64()),
            "row_id": _concat("R", m_scn),
            "commit_scn": pa.array(m_scn, pa.int64()),
            "tx_id": _concat("tx", txs),
            "op": pa.array(m_op),
            "ts_ms": pa.nulls(nm, pa.timestamp("ms", tz="UTC")),
            "table": pa.array([TABLE_NAME] * nm),
            "username": pa.nulls(nm, pa.string()),
            "status": pa.array(np.zeros(nm, np.int32)),
            "before": pa.nulls(nm, img_type),
            "after": pa.nulls(nm, img_type),
            "set_cols": pa.nulls(nm, pa.list_(pa.string())),
        },
        schema=ev_schema,
    )

    log_tbl = pa.concat_tables([changes, markers])
    log_tbl = log_tbl.take(pc.sort_indices(log_tbl, sort_keys=[("scn", "ascending")]))

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for off in range(0, log_tbl.num_rows, events_per_file):
        chunk = log_tbl.slice(off, events_per_file)
        lo = chunk.column("scn")[0].as_py()
        hi = chunk.column("scn")[-1].as_py()
        p = os.path.join(out_dir, f"batch-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(chunk, p)
        paths.append(p)
    return paths


#: second table for the multi-table fan-out gate (S6 whitelist +
#: pipelines/multitable.py): supplier-derived pages, same schema
SUP_TABLE = "WEB.SUPPLIERS"
#: supplier events sit in an SCN range far above the pages range so the
#: two tables' logs interleave without colliding
SUP_SCN0 = 10_000_000_000


def derive_suppliers(sf_dir: str) -> pa.Table:
    """Supplier-derived base table (same shape as pages)."""
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    key = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    name = sup.column("s_name").cast(pa.string())
    url = pc.binary_join_element_wise(
        pa.array(["https://sup.example/s/"] * len(key)),
        pc.cast(pa.array(key), pa.string()),
        "",
    )
    html = pc.binary_join_element_wise(
        pa.array(["<html><body>"] * len(key)),
        name,
        pa.array(["</body></html>"] * len(key)),
        "",
    )
    ts = _EPOCH_2024 + key * 1_000_000
    return pa.table(
        {
            "url": url.combine_chunks() if isinstance(url, pa.ChunkedArray) else url,
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pc.cast(html, pa.binary()),
            "text": name,
            "lang": pa.array(["xx"] * len(key), pa.string()),
        },
        schema=PAGES_SCHEMA_NAIVE,
    )


def derive_changelog_suppliers(sf_dir: str, out_dir: str) -> list[str]:
    """Supplier-table change events: one committed UPDATE (text only)
    per supplier with s_suppkey % 3 == 0, table=WEB.SUPPLIERS, tx ids
    prefixed 'sup' (Oracle XIDs are database-global)."""
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey"]
    )
    key = np.sort(
        sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    key = key[key % 3 == 0]
    n = len(key)
    k = np.arange(n, dtype=np.int64)
    scn = SUP_SCN0 + k * 2
    tx = k // TXN_SIZE
    url = pc.binary_join_element_wise(
        pa.array(["https://sup.example/s/"] * n),
        pc.cast(pa.array(key), pa.string()),
        "",
    )
    text = pc.binary_join_element_wise(
        pa.array(["sup:"] * n), pc.cast(pa.array(key), pa.string()), ""
    )
    img_type = schemas.image_struct(PAGES_SCHEMA_NAIVE)

    def _one(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    after = pa.StructArray.from_arrays(
        [
            _one(url),
            pa.nulls(n, pa.timestamp("us")),
            pa.nulls(n, pa.binary()),
            _one(text),
            pa.nulls(n, pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )
    ev_schema = schemas.change_event_schema(PAGES_SCHEMA_NAIVE)
    changes = pa.table(
        {
            "scn": pa.array(scn, pa.int64()),
            "row_id": _concat("S", scn),
            "commit_scn": pa.nulls(n, pa.int64()),
            "tx_id": _concat("sup", tx),
            "op": pa.array(["u"] * n),
            "ts_ms": pa.nulls(n, pa.timestamp("ms", tz="UTC")),
            "table": pa.array([SUP_TABLE] * n),
            "username": pa.nulls(n, pa.string()),
            "status": pa.array(np.zeros(n, np.int32)),
            "before": pa.nulls(n, img_type),
            "after": after,
            "set_cols": pa.nulls(n, pa.list_(pa.string())),
        },
        schema=ev_schema,
    )
    txs = np.unique(tx)
    m_scn = SUP_SCN0 + (txs * TXN_SIZE + (TXN_SIZE - 1)) * 2 + 1
    nm = len(txs)
    markers = pa.table(
        {
            "scn": pa.array(m_scn, pa.int64()),
            "row_id": _concat("S", m_scn),
            "commit_scn": pa.array(m_scn, pa.int64()),
            "tx_id": _concat("sup", txs),
            "op": pa.array(["commit"] * nm),
            "ts_ms": pa.nulls(nm, pa.timestamp("ms", tz="UTC")),
            "table": pa.array([SUP_TABLE] * nm),
            "username": pa.nulls(nm, pa.string()),
            "status": pa.array(np.zeros(nm, np.int32)),
            "before": pa.nulls(nm, img_type),
            "after": pa.nulls(nm, img_type),
            "set_cols": pa.nulls(nm, pa.list_(pa.string())),
        },
        schema=ev_schema,
    )
    log_tbl = pa.concat_tables([changes, markers])
    log_tbl = log_tbl.take(pc.sort_indices(log_tbl, sort_keys=[("scn", "ascending")]))
    os.makedirs(out_dir, exist_ok=True)
    lo = log_tbl.column("scn")[0].as_py()
    hi = log_tbl.column("scn")[-1].as_py()
    p = os.path.join(out_dir, f"batch-{lo:012d}-{hi:012d}.parquet")
    pq.write_table(log_tbl, p)
    return [p]


def ensure_multitable(sf_dir: str, root: str = "/tmp/lkc_workload") -> dict[str, str]:
    """Mixed two-table changelog (pages + suppliers in ONE log, the
    reference's single-redo-log-many-tables shape) + supplier base."""
    d = ensure_workload(sf_dir, root)
    mixed = os.path.join(d["root"], "changelog-mixed")
    sup_base = os.path.join(d["root"], "suppliers.parquet")
    marker = os.path.join(d["root"], "_ready_mixed")
    if not os.path.exists(marker):
        derive_changelog(sf_dir, mixed)
        derive_changelog_suppliers(sf_dir, mixed)
        pq.write_table(derive_suppliers(sf_dir), sup_base)
        with open(marker, "w") as f:
            f.write("ok")
    return {**d, "mixed": mixed, "sup_base": sup_base}


#: bump when the derivation semantics change -- invalidates any cached
#: /tmp workload from an older build
WORKLOAD_VERSION = 2


def workload_dirs(sf_dir: str, root: str = "/tmp/lkc_workload") -> dict[str, str]:
    """Deterministic scratch layout per sf_dir."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(root, f"{tag}-v{WORKLOAD_VERSION}")
    return {
        "root": base,
        "pages": os.path.join(base, "pages.parquet"),
        "changelog": os.path.join(base, "changelog"),
        "lake": os.path.join(base, "lake"),
    }


def ensure_workload(sf_dir: str, root: str = "/tmp/lkc_workload") -> dict[str, str]:
    """Idempotently materialize pages.parquet + changelog for sf_dir."""
    d = workload_dirs(sf_dir, root)
    os.makedirs(d["root"], exist_ok=True)
    marker = os.path.join(d["root"], "_ready")
    if not os.path.exists(marker):
        pq.write_table(derive_pages(sf_dir), d["pages"])
        derive_changelog(sf_dir, d["changelog"])
        with open(marker, "w") as f:
            f.write("ok")
    return d


def _hex_encode(sarr: pa.Array) -> pa.Array:
    """Vectorized lowercase hex of a string array (buffer-level numpy,
    the inverse of the decoder's HEXTORAW nibble pass)."""
    a = sarr.combine_chunks() if isinstance(sarr, pa.ChunkedArray) else sarr
    n = len(a)
    off = np.frombuffer(a.buffers()[1], np.int32)[a.offset : a.offset + n + 1]
    data = np.frombuffer(a.buffers()[2], np.uint8)[off[0] : off[-1]]
    off = off - off[0]
    hexd = np.frombuffer(b"0123456789abcdef", np.uint8)
    out = np.empty(len(data) * 2, np.uint8)
    out[0::2] = hexd[data >> 4]
    out[1::2] = hexd[data & 15]
    return pa.Array.from_buffers(
        pa.string(), n,
        [None, pa.py_buffer((off * 2).astype(np.int32).tobytes()),
         pa.py_buffer(out.tobytes())],
    )


def derive_changelog_redo_sql(
    sf_dir: str, out_dir: str, events_per_file: int = 100_000,
    replicate: int = 1,
) -> list[str]:
    """The SAME derived workload rendered as raw redo-SQL statements
    (the reference's v$logmnr_contents shape): exercises the M1 parser
    path end-to-end under the same SQL oracle as the struct form.

    Fully vectorized (Arrow concat kernels + buffer-level hex), so the
    bench can amplify it: ``replicate=R`` tiles the events table R
    times with disjoint event_id ranges exactly like
    ``derive_changelog`` (bench-only; the SQL oracles assume R=1)."""
    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    eid = ev.column("event_id").to_numpy()
    etype = ev.column("event_type").to_pandas().to_numpy()
    user = ev.column("user_id").to_numpy()
    ts_us = (
        ev.column("ts").cast(pa.timestamp("us")).to_numpy()
        .astype("datetime64[us]").astype(np.int64)
    )
    if replicate > 1:
        n0 = len(eid)
        reps = np.arange(replicate).repeat(n0)
        eid = np.tile(eid, replicate) + reps * n0
        etype = np.tile(etype, replicate)
        user = np.tile(user, replicate) + reps
        ts_us = np.tile(ts_us, replicate)

    # generate in txn-aligned chunks: one monolithic statement array at
    # replicate>=150 (18M events x ~250 B) overflows Arrow's 32-bit
    # string offsets (ArrowCapacityError at 2^31 bytes).  Event ids are
    # contiguous 0..N-1 in position order and a txn spans TXN_SIZE
    # consecutive ids, so chunking positions at a TXN_SIZE multiple
    # keeps every txn (and its commit/rollback marker) in one chunk;
    # with the chunk also a multiple of events_per_file the emitted
    # file layout is byte-identical to the monolithic build.
    CHUNK = REDO_DERIVE_CHUNK_EVENTS
    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    for c0 in range(0, len(eid), CHUNK):
        sl = slice(c0, c0 + CHUNK)
        paths += _redo_chunk_files(
            eid[sl], etype[sl], user[sl], ts_us[sl],
            n_docs, out_dir, events_per_file,
        )
    return paths


def _redo_chunk_files(
    eid, etype, user, ts_us, n_docs, out_dir, events_per_file
) -> list[str]:
    """One txn-aligned chunk of ``derive_changelog_redo_sql``: build
    the statement texts, interleave the chunk's markers in scn order,
    and write its parquet files."""
    doc = user % n_docs
    url = _urls(doc)
    scn = SCN0 + eid * 2
    tx = eid // TXN_SIZE
    rid = _concat("R", scn)

    # per-class statement text, all Arrow concat kernels
    del_sql = _concat(
        'delete from "WEB"."PAGES" where "url" = \'', url,
        "' and ROWID = '", rid, "'",
    )
    text_u = _concat(
        'update "WEB"."PAGES" set "text" = \'u:', eid,
        "' where \"url\" = '", url, "' and ROWID = '", rid, "'",
    )
    lang_u = _concat(
        'update "WEB"."PAGES" set "lang" = \'p', eid % 5,
        "' where \"url\" = '", url, "' and ROWID = '", rid, "'",
    )
    ts_str = pc.strftime(
        pa.array(ts_us).cast(pa.timestamp("us")),
        format="%Y-%m-%d %H:%M:%S",
    )
    html_hex = _hex_encode(_concat("<html><body>signup:", eid, "</body></html>"))
    ins_sql = _concat(
        'insert into "WEB"."PAGES"("url","warc_ts","html","text","lang")'
        " values ('", url, "', TO_TIMESTAMP('", ts_str,
        "', 'YYYY-MM-DD HH24:MI:SS.FF6'), HEXTORAW('", html_hex,
        "'), 'signup:", eid, "', 'xx", eid % 5, "')",
    )
    is_d = pa.array(etype == "error")
    is_i = pa.array(etype == "signup")
    is_lang = pa.array(etype == "purchase")
    sql = pc.if_else(
        is_d, del_sql,
        pc.if_else(is_i, ins_sql, pc.if_else(is_lang, lang_u, text_u)),
    )
    op = np.where(etype == "error", "d", np.where(etype == "signup", "i", "u"))

    from logminer_kafka_connect_ray.testing.gen import REDO_SQL_SCHEMA

    n = len(eid)
    events_tbl = pa.table(
        {
            "scn": pa.array(scn, pa.int64()),
            "row_id": rid,
            "commit_scn": pa.nulls(n, pa.int64()),
            "tx_id": _concat("tx", tx),
            "op": pa.array(op, pa.string()),
            "ts_ms": pa.array(ts_us // 1000).cast(pa.timestamp("ms", tz="UTC")),
            "table": pa.array([TABLE_NAME] * n, pa.string()),
            "username": pa.nulls(n, pa.string()),
            "status": pa.array(np.zeros(n, np.int32)),
            "csf": pa.array(np.zeros(n, np.int32)),
            "sql_redo": sql,
        },
        schema=REDO_SQL_SCHEMA,
    )
    txs = np.unique(tx)
    m_scn = SCN0 + (txs * TXN_SIZE + (TXN_SIZE - 1)) * 2 + 1
    m_op = np.where(
        txs % ROLLBACK_MOD == ROLLBACK_REM, "rollback", "commit"
    )
    nm = len(txs)
    markers_tbl = pa.table(
        {
            "scn": pa.array(m_scn, pa.int64()),
            "row_id": _concat("R", m_scn),
            "commit_scn": pa.array(m_scn, pa.int64()),
            "tx_id": _concat("tx", txs),
            "op": pa.array(m_op, pa.string()),
            "ts_ms": pa.nulls(nm, pa.timestamp("ms", tz="UTC")),
            "table": pa.array([TABLE_NAME] * nm, pa.string()),
            "username": pa.nulls(nm, pa.string()),
            "status": pa.array(np.zeros(nm, np.int32)),
            "csf": pa.array(np.zeros(nm, np.int32)),
            "sql_redo": pa.nulls(nm, pa.string()),
        },
        schema=REDO_SQL_SCHEMA,
    )
    combined = pa.concat_tables([events_tbl, markers_tbl])
    order = np.argsort(
        combined.column("scn").to_numpy(zero_copy_only=False), kind="stable"
    )
    combined = combined.take(pa.array(order)).combine_chunks()

    paths = []
    total = combined.num_rows
    for off in range(0, total, events_per_file):
        tbl = combined.slice(off, events_per_file)
        lo = tbl.column("scn")[0].as_py()
        hi = tbl.column("scn")[-1].as_py()
        p = os.path.join(out_dir, f"batch-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# Chunked-snapshot fixture (DBLog-style moving-database simulator)
# ---------------------------------------------------------------------------
def _simulate_state_at(sf_dir: str, scn_c: int) -> dict[str, dict]:
    """The 'live database' a chunk read observes: base pages with every
    COMMITTED change whose commit_scn <= scn_c applied, as a url-keyed
    dict.  Plain-Python single pass in eid order -- this is the input
    SIMULATOR for the chunked-snapshot gate, not engine code (the
    engine's own fold is what the gate checks against DuckDB); clarity
    over speed is deliberate here."""
    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    eid = ev.column("event_id").to_numpy()
    order = np.argsort(eid, kind="stable")
    eid = eid[order]
    etype = ev.column("event_type").to_pandas().to_numpy()[order]
    user = ev.column("user_id").to_numpy()[order]
    ts_us = (
        ev.column("ts").cast(pa.timestamp("us")).to_numpy()
        .astype("datetime64[us]").astype(np.int64)[order]
    )

    pages = derive_pages(sf_dir)
    state: dict[str, dict] = {}
    for r in pages.to_pylist():
        state[r["url"]] = r

    urls = _urls(user % n_docs).to_pylist()
    for i in range(len(eid)):
        e = int(eid[i])
        tx = e // TXN_SIZE
        if tx % ROLLBACK_MOD == ROLLBACK_REM:
            continue  # rolled back
        commit_scn = SCN0 + (tx * TXN_SIZE + (TXN_SIZE - 1)) * 2 + 1
        if commit_scn > scn_c:
            continue  # not yet committed at the chunk's read point
        et, url = etype[i], urls[i]
        if et == "error":  # DELETE
            state.pop(url, None)
        elif et == "signup":  # INSERT (full image)
            state[url] = {
                "url": url,
                "warc_ts": int(ts_us[i]),
                "html": f"<html><body>signup:{e}</body></html>".encode(),
                "text": f"signup:{e}",
                "lang": f"xx{e % 5}",
            }
        else:  # partial UPDATE
            row = state.get(url)
            if row is None:
                continue  # update of a deleted row: no-op on the image
            if et in ("click", "view"):
                row["text"] = f"u:{e}"
            elif et == "purchase":
                row["lang"] = f"p{e % 5}"
    return state


def chunk_scns(sf_dir: str, n_chunks: int) -> list[int]:
    """Inter-transaction SCNs spread across the changelog: odd values
    (event rows sit at even SCNs) that avoid the commit-marker form
    SCN0 + 2*(5t+4) + 1, so a chunk SCN never ties with any event scn
    or commit_scn (see Engine.snapshot_chunked)."""
    n_ev = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata.num_rows
    out = []
    for i in range(n_chunks):
        j = max(1, (i * n_ev) // n_chunks)  # chunk 0 starts near the log head
        if j % TXN_SIZE == 0:
            j += 1  # SCN0 + 2*(j-1) + 1 would be a commit marker
        out.append(SCN0 + 2 * (j - 1) + 1)
    return out


def ensure_chunked_snapshot(
    sf_dir: str, n_chunks: int = 4, root: str = "/tmp/lkc_workload"
) -> list[tuple[str, int]]:
    """Materialize ``n_chunks`` url-range chunk files, chunk ``i`` read
    AS OF its own SCN (the database keeps moving while the snapshot
    runs).  Returns ``[(parquet_path, chunk_scn), ...]`` for
    ``Engine.snapshot_chunked``.  Cached like ensure_workload."""
    d = workload_dirs(sf_dir, root)
    cdir = os.path.join(d["root"], "chunks")
    marker = os.path.join(d["root"], f"_ready_chunks{n_chunks}")
    scns = chunk_scns(sf_dir, n_chunks)
    paths = [os.path.join(cdir, f"chunk-{i:03d}.parquet") for i in range(n_chunks)]
    if os.path.exists(marker):
        return list(zip(paths, scns))
    os.makedirs(cdir, exist_ok=True)
    base_urls = sorted(derive_pages(sf_dir).column("url").to_pylist())
    bounds = [
        base_urls[(i * len(base_urls)) // n_chunks] for i in range(1, n_chunks)
    ] + [None]
    lo = None
    for i, (scn_c, path) in enumerate(zip(scns, paths)):
        hi = bounds[i]
        state = _simulate_state_at(sf_dir, scn_c)
        rows = [
            r for u, r in sorted(state.items())
            if (lo is None or u >= lo) and (hi is None or u < hi)
        ]
        t = pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [r["warc_ts"] for r in rows], pa.timestamp("us")
                ),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
            },
            schema=PAGES_SCHEMA_NAIVE,
        )
        pq.write_table(t, path)
        lo = hi
    with open(marker, "w") as f:
        f.write("ok")
    return list(zip(paths, scns))


def derive_changelog_corrupt(
    sf_dir: str, out_dir: str, every: int = 101
) -> list[str]:
    """The standard struct changelog with every ``every``-th change
    event's key (url) nulled -- a deterministic corruption fixture for
    the dead-letter gate (M4/M5): keyless struct rows are undecodable
    and must route to ``lake/dead_letters`` with reason
    ``missing_key``, never be silently dropped.  Corruption keys off
    ``event_id = (scn - SCN0) // 2``, so the DuckDB oracle can count
    the exact expected rejects from the events table."""
    tmp = out_dir + "-src"
    derive_changelog(sf_dir, tmp)
    os.makedirs(out_dir, exist_ok=True)

    def _null_key(col: pa.ChunkedArray, keep: pa.Array) -> pa.StructArray:
        # rebuild the before/after struct with url nulled where ~keep,
        # preserving the struct's own validity (marker rows are null)
        arr = col.combine_chunks()
        st = arr.type
        names = [st.field(i).name for i in range(st.num_fields)]
        children = [arr.field(i) for i in range(st.num_fields)]
        ui = names.index("url")
        children[ui] = pc.if_else(
            keep, children[ui], pa.scalar(None, pa.string())
        )
        return pa.StructArray.from_arrays(
            children, names=names, mask=pc.is_null(arr)
        )

    outs = []
    for f in sorted(os.listdir(tmp)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(tmp, f))
        scn = t.column("scn").to_numpy()
        op = t.column("op").to_pandas().to_numpy()
        eid = (scn - SCN0) // 2
        bad = (eid % every == 0) & np.isin(op, ("i", "u", "d"))
        keep = pa.array(~bad)
        for name in ("before", "after"):
            idx = t.schema.get_field_index(name)
            t = t.set_column(idx, name, _null_key(t.column(name), keep))
        dst = os.path.join(out_dir, f)
        pq.write_table(t, dst)
        outs.append(dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return outs


def derive_corrections(sf_dir: str, scns: list[int]) -> pa.Table:
    """Repair-tooling stand-in: rebuild the FLAT RESOLVED change events
    for the given dead-lettered SCNs by consulting the source of truth
    (the events table), exactly as an operator would re-select the
    rows a connector failed to parse.  Output shape is what
    ``Engine.repair`` takes: ``(url, commit_scn, scn, row_id, op,
    set_mask, a_*/b_*)``.

    Fidelity contract: values, validity and set_mask reproduce what
    the struct decoder would have produced for the uncorrupted rows
    (set_mask bit i = i-th data column in schema order: warc_ts=1,
    html=2, text=4, lang=8; INSERT sets all, DELETE none, UPDATE only
    the etype-driven columns -- before-images are null in this
    workload, so decoder UPDATE enrichment adds no bits).  Rolled-back
    txns are dropped: they never committed, so there is nothing to
    repair."""
    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    want_eids = np.array(sorted((s - SCN0) // 2 for s in set(scns)), np.int64)
    ev = ev.filter(
        pc.is_in(pc.cast(ev.column("event_id"), pa.int64()),
                 value_set=pa.array(want_eids))
    )
    eid = ev.column("event_id").to_numpy().astype(np.int64)
    etype = ev.column("event_type").to_pandas().to_numpy()
    user = ev.column("user_id").to_numpy()
    ts_us = (
        ev.column("ts").cast(pa.timestamp("us")).to_numpy()
        .astype("datetime64[us]").astype(np.int64)
    )
    tx = eid // TXN_SIZE
    committed = tx % ROLLBACK_MOD != ROLLBACK_REM
    eid, etype, user, ts_us, tx = (
        eid[committed], etype[committed], user[committed],
        ts_us[committed], tx[committed],
    )
    scn = SCN0 + eid * 2
    cscn = SCN0 + (tx * TXN_SIZE + (TXN_SIZE - 1)) * 2 + 1
    op = np.where(etype == "error", "d",
                  np.where(etype == "signup", "i", "u"))
    is_i = op == "i"
    is_d = op == "d"
    is_text = is_i | (etype == "click") | (etype == "view")
    is_lang = is_i | (etype == "purchase")
    # set_mask bits in schema data-column order (warc_ts, html, text,
    # lang); deletes set none
    mask = np.where(
        is_i, 15,
        (is_text & ~is_d) * 4 + (is_lang & ~is_d) * 8,
    ).astype(np.int64)

    def _masked(vals, valid, typ):
        a = vals if isinstance(vals, (pa.Array, pa.ChunkedArray)) else pa.array(vals)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        out = pc.if_else(pa.array(valid), a.cast(typ),
                         pa.nulls(len(valid), typ))
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    i_arr = pa.array(is_i)
    text_val = pc.if_else(i_arr, _concat("signup:", eid), _concat("u:", eid))
    lang_val = pc.if_else(i_arr, _concat("xx", eid % 5), _concat("p", eid % 5))
    html_val = _concat("<html><body>signup:", eid, "</body></html>")
    n = len(eid)
    cols = {
        "url": _urls(user % n_docs),
        "commit_scn": pa.array(cscn, pa.int64()),
        "scn": pa.array(scn, pa.int64()),
        "row_id": _concat("R", scn),
        "op": pa.array(op.astype(object), pa.string()),
        "set_mask": pa.array(mask),
        "a_warc_ts": _masked(ts_us, is_i, pa.timestamp("us")),
        "a_html": pc.cast(_masked(html_val, is_i, pa.string()), pa.binary()),
        "a_text": _masked(text_val, is_text & ~is_d, pa.string()),
        "a_lang": _masked(lang_val, is_lang & ~is_d, pa.string()),
        "b_warc_ts": pa.nulls(n, pa.timestamp("us")),
        "b_html": pa.nulls(n, pa.binary()),
        "b_text": pa.nulls(n, pa.string()),
        "b_lang": pa.nulls(n, pa.string()),
    }
    return pa.table(cols)


# ---------------------------------------------------------------------------
# Schema evolution with DDL DEFAULT (ChangingTableTest.kt:42-93)
# ---------------------------------------------------------------------------
#: the evolved column: added mid-stream with this default -- Oracle
#: gives every pre-existing row the default value
EVOLUTION_DEFAULT = 7


def derive_changelog_evolution(
    sf_dir: str, out_dir: str, events_per_file: int = 100_000
) -> list[str]:
    """Redo-SQL changelog exercising ADD-COLUMN-WITH-DEFAULT evolution:
    the ``_catalog.json`` dictionary sidecar declares a new
    ``rating NUMBER(9) DEFAULT 7`` column (the reference parses the
    catalog's DATA_DEFAULT, ``ColumnSchemaBuilder.kt:91-107``) and the
    statements are committed/rolled-back UPDATEs setting it from the
    ``purchase`` events; every page row a committed update never
    touched must surface the default after replay.

    Deterministic from the driver's events table, SQL-restatable:
    purchases ordered by event_id; txn = rank // TXN_SIZE with the
    standard rollback pattern; rating value = event_id % 100;
    scn = SCN0 + event_id*2, commit marker at last member scn + 1."""
    import json

    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type"],
    )
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    etype = ev.column("event_type").to_pandas().to_numpy()
    sel = etype == "purchase"
    eid = ev.column("event_id").to_numpy()[sel]
    user = ev.column("user_id").to_numpy()[sel]
    order = np.argsort(eid, kind="stable")
    eid, user = eid[order], user[order]
    urls = _urls(user % n_docs).to_pylist()
    scn = SCN0 + eid * 2
    tx = np.arange(len(eid)) // TXN_SIZE

    rows = []
    for i in range(len(eid)):
        u, e, s_ = urls[i], int(eid[i]), int(scn[i])
        sql = (
            f'update "WEB"."PAGES" set "rating" = {e % 100}'
            f" where \"url\" = '{u}' and ROWID = 'R{s_}'"
        )
        rows.append(
            {"scn": s_, "row_id": f"R{s_}", "commit_scn": None,
             "tx_id": f"etx{int(tx[i])}", "op": "u", "ts_ms": None,
             "table": TABLE_NAME, "username": None, "status": 0,
             "csf": 0, "sql_redo": sql}
        )
    # one marker per txn at (last member scn + 1): member eids strictly
    # increase, so markers interleave in global scn order
    txs = np.unique(tx)
    for t_ in txs:
        last = int(scn[tx == t_].max()) + 1
        rows.append(
            {"scn": last, "row_id": f"R{last}", "commit_scn": last,
             "tx_id": f"etx{int(t_)}",
             "op": "rollback" if t_ % ROLLBACK_MOD == ROLLBACK_REM
             else "commit",
             "ts_ms": None, "table": TABLE_NAME, "username": None,
             "status": 0, "csf": 0, "sql_redo": None}
        )
    rows.sort(key=lambda r: r["scn"])

    from logminer_kafka_connect_ray.testing.gen import REDO_SQL_SCHEMA

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for off in range(0, len(rows), events_per_file):
        chunk = rows[off : off + events_per_file]
        tbl = pa.Table.from_pylist(chunk, schema=REDO_SQL_SCHEMA)
        lo, hi = chunk[0]["scn"], chunk[-1]["scn"]
        p = os.path.join(out_dir, f"batch-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    with open(os.path.join(out_dir, "_catalog.json"), "w") as f:
        json.dump(
            {"columns": {"rating": {
                "type": "NUMBER(9)", "default": str(EVOLUTION_DEFAULT)
            }}},
            f,
        )
    return paths


def ensure_evolution_workload(
    sf_dir: str, root: str = "/tmp/lkc_workload"
) -> dict[str, str]:
    """Idempotently materialize pages + the evolution redo changelog."""
    d = ensure_workload(sf_dir, root)
    evo = os.path.join(d["root"], "changelog-evolution")
    marker = os.path.join(d["root"], "_ready_evolution")
    if not os.path.exists(marker):
        derive_changelog_evolution(sf_dir, evo)
        with open(marker, "w") as f:
            f.write("ok")
    return {**d, "evolution": evo}


#: int64-phase views values start above INT32_MAX so a silent int32
#: truncation can never masquerade as a pass
WIDEN_INT64_BASE = 3_000_000_000


def derive_changelog_widening(sf_dir: str, out_dir: str) -> dict:
    """Struct changelog exercising MID-STREAM TYPE WIDENING
    (SchemaService.kt:34-40 refresh + ColumnSchemaBuilder.kt:201-257
    NUMBER tiers): committed UPDATEs set a new ``views`` column, typed
    **int32** in the first half of the log (one batch file) and
    **int64 with values > INT32_MAX** in the second half (a second
    file).  Replayed with a per-file checkpoint budget, the engine
    must (1) ADD views:int32 at the first micro-batch plan, then
    (2) WIDEN it to int64 at the second -- two separate schema bumps,
    with partition files written as int32 in between cast on read.

    Deterministic from the driver's events table, SQL-restatable:
    purchases ordered by event_id, pidx = rank-1, txn = pidx //
    TXN_SIZE with the standard rollback pattern; phase boundary at the
    txn-aligned halfway point H = (n_purchases // 2 // TXN_SIZE) *
    TXN_SIZE; views = eid % 100000 (phase 1) or WIDEN_INT64_BASE + eid
    (phase 2); scn = SCN0 + eid*2, marker at last member scn + 1.

    Returns ``{"paths": [...], "h": H, "phase_rows": [n1, n2]}``."""
    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type"],
    )
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    etype = ev.column("event_type").to_pandas().to_numpy()
    sel = etype == "purchase"
    eid = ev.column("event_id").to_numpy()[sel]
    user = ev.column("user_id").to_numpy()[sel]
    order = np.argsort(eid, kind="stable")
    eid, user = eid[order], user[order]
    H = (len(eid) // 2 // TXN_SIZE) * TXN_SIZE

    os.makedirs(out_dir, exist_ok=True)
    paths, phase_rows = [], []
    for phase, (lo_i, hi_i) in enumerate([(0, H), (H, len(eid))]):
        p_eid, p_user = eid[lo_i:hi_i], user[lo_i:hi_i]
        n = len(p_eid)
        vtype = pa.int32() if phase == 0 else pa.int64()
        views = (p_eid % 100000 if phase == 0
                 else WIDEN_INT64_BASE + p_eid)
        t_schema = pa.schema(list(PAGES_SCHEMA_NAIVE)
                             + [pa.field("views", vtype)])
        img = schemas.image_struct(t_schema)
        ev_schema = schemas.change_event_schema(t_schema)
        url = _urls(p_user % n_docs)
        scn = SCN0 + p_eid * 2
        after = pa.StructArray.from_arrays(
            [
                url.combine_chunks() if isinstance(url, pa.ChunkedArray)
                else url,
                pa.nulls(n, pa.timestamp("us")),
                pa.nulls(n, pa.binary()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
                pa.array(views.astype(np.int64), pa.int64()).cast(vtype),
            ],
            names=[f.name for f in t_schema],
        )
        changes = pa.table(
            {
                "scn": pa.array(scn, pa.int64()),
                "row_id": _concat("R", scn),
                "commit_scn": pa.nulls(n, pa.int64()),
                "tx_id": _concat("wtx", (lo_i + np.arange(n)) // TXN_SIZE),
                "op": _const("u", n),
                "ts_ms": pa.nulls(n, pa.timestamp("ms", tz="UTC")),
                "table": _const(TABLE_NAME, n),
                "username": pa.nulls(n, pa.string()),
                "status": pa.array(np.zeros(n, np.int32)),
                "before": pa.nulls(n, img),
                "after": after,
                "set_cols": pa.nulls(n, pa.list_(pa.string())),
            },
            schema=ev_schema,
        )
        # one marker per txn at (last member scn + 1); H is txn-aligned
        # so every txn's rows AND marker live in the same phase file
        tx = (lo_i + np.arange(n)) // TXN_SIZE
        txs = np.unique(tx)
        m_scn = np.array(
            [int(scn[tx == t_].max()) + 1 for t_ in txs], np.int64
        )
        m_op = np.where(txs % ROLLBACK_MOD == ROLLBACK_REM,
                        "rollback", "commit")
        nm = len(txs)
        markers = pa.table(
            {
                "scn": pa.array(m_scn, pa.int64()),
                "row_id": _concat("R", m_scn),
                "commit_scn": pa.array(m_scn, pa.int64()),
                "tx_id": _concat("wtx", txs),
                "op": pa.array(m_op),
                "ts_ms": pa.nulls(nm, pa.timestamp("ms", tz="UTC")),
                "table": _const(TABLE_NAME, nm),
                "username": pa.nulls(nm, pa.string()),
                "status": pa.array(np.zeros(nm, np.int32)),
                "before": pa.nulls(nm, img),
                "after": pa.nulls(nm, img),
                "set_cols": pa.nulls(nm, pa.list_(pa.string())),
            },
            schema=ev_schema,
        )
        tbl = pa.concat_tables([changes, markers])
        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("scn", "ascending")]))
        lo = tbl.column("scn")[0].as_py()
        hi = tbl.column("scn")[-1].as_py()
        p = os.path.join(out_dir, f"batch-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
        phase_rows.append(tbl.num_rows)
    return {"paths": paths, "h": int(H), "phase_rows": phase_rows}


def ensure_widening_workload(
    sf_dir: str, root: str = "/tmp/lkc_workload"
) -> dict:
    """Idempotently materialize pages + the type-widening changelog."""
    import json

    d = ensure_workload(sf_dir, root)
    wid = os.path.join(d["root"], "changelog-widening")
    marker = os.path.join(d["root"], "_ready_widening")
    if not os.path.exists(marker):
        info = derive_changelog_widening(sf_dir, wid)
        with open(marker, "w") as f:
            json.dump(info, f)
    with open(marker) as f:
        info = json.load(f)
    return {**d, "widening": wid, "widening_info": info}
