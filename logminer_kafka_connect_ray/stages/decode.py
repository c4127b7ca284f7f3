"""Decode stage: on-disk change events -> flat pipeline form.

The per-event CPU stage of the pipeline -- the analog of the
reference's redo-SQL parse + typed conversion + envelope construction
(``logminer/LogminerRow.kt:63-118``, ``ConnectSchemaFactory.kt:56-163``).
Runs as ``map_batches(decoder, batch_format="pyarrow")`` -- fully
vectorized Arrow kernels, zero-copy struct-field extraction.

Responsibilities (reference file:line):

* drop unreadable rows, status=2      (LogminerSource.kt:96-115)
* drop txn marker rows (routed separately)  (LogminerRow.kt:25-33)
* table whitelist filter              (SourceConnectorConfig.kt:86-97)
* flatten before/after structs to b_*/a_* columns
* compute the SET-column bitmask (set_cols list, else after validity)
* UPDATE after-image enrichment: columns missing from the SET list are
  filled from the before image       (ConnectSchemaFactory.kt:97-104)
* key extraction: key = after.key ?? before.key
  (ConnectSchemaFactory.kt:62-74: record key from PK columns)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from logminer_kafka_connect_ray import schemas
from logminer_kafka_connect_ray.naming import matches_whitelist


def _struct_field(tbl: pa.Table, col: str, field: str, out_type: pa.DataType, n: int):
    """Extract struct field as a flat array; null column if absent."""
    if col not in tbl.column_names:
        return pa.nulls(n, out_type)
    c = tbl.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if not pa.types.is_struct(c.type):
        return pa.nulls(n, out_type)
    if c.type.get_field_index(field) < 0:
        # pre-evolution batch: column absent from this file's image
        # struct -> null (ChangingTableTest semantics)
        return pa.nulls(n, out_type)
    arr = pc.struct_field(c, field)
    # struct_field ignores the parent struct's null mask in some arrow
    # versions -> a null struct must yield null fields
    parent_null = pc.is_null(c)
    if pc.any(parent_null).as_py():
        arr = pc.if_else(parent_null, pa.nulls(n, arr.type), arr)
    if arr.type != out_type:
        arr = arr.cast(out_type)
    return arr


class ChangeDecoder:
    """Callable for ``map_batches``.

    Stateless per batch, but shipped as a class so per-worker setup
    (resolved schema, column index maps) happens once -- the
    map_batches analog of actor ``__init__`` setup.
    """

    def __init__(
        self,
        table_schema: pa.Schema,
        key_column: str = "url",
        whitelist: tuple[str, ...] = (),
    ):
        self.table_schema = table_schema
        self.key_column = key_column
        self.whitelist = tuple(whitelist)
        self.data_cols = schemas.data_columns_of(table_schema, key_column)
        self.full_mask = (1 << len(self.data_cols)) - 1
        self.out_schema = schemas.flat_change_schema(key_column, table_schema)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch
        # ---- filters (M3 status skip, marker drop, S6 whitelist) ----
        keep = pc.is_in(t.column("op"), value_set=pa.array(schemas.CHANGE_OPS))
        if "status" in t.column_names:
            ok = pc.fill_null(
                pc.not_equal(t.column("status"), schemas.STATUS_UNREADABLE), True
            )
            keep = pc.and_(keep, ok)
        t = t.filter(keep)
        if self.whitelist and "table" in t.column_names:
            tables = t.column("table").unique().to_pylist()
            allowed = [x for x in tables if x and matches_whitelist(x, self.whitelist)]
            t = t.filter(pc.is_in(t.column("table"), value_set=pa.array(allowed, pa.string())))
        n = t.num_rows

        key_type = self.table_schema.field(self.key_column).type
        a_key = _struct_field(t, "after", self.key_column, key_type, n)
        b_key = _struct_field(t, "before", self.key_column, key_type, n)
        key = pc.coalesce(a_key, b_key)

        op = t.column("op")
        is_u = pc.equal(op, "u")
        is_full_img = pc.is_in(op, value_set=pa.array(["i", "r"]))
        is_d = pc.equal(op, "d")

        a_cols, b_cols = {}, {}
        for c in self.data_cols:
            ftype = self.table_schema.field(c).type
            a_cols[c] = _struct_field(t, "after", c, ftype, n)
            b_cols[c] = _struct_field(t, "before", c, ftype, n)

        # ---- SET mask -------------------------------------------------
        mask = np.zeros(n, dtype=np.int64)
        for i, c in enumerate(self.data_cols):
            valid = pc.is_valid(a_cols[c]).to_numpy(zero_copy_only=False)
            mask |= valid.astype(np.int64) << i
        # explicit set_cols overrides validity-derived bits (Issue14:
        # SET col = NULL is a set, absent col is not)
        if "set_cols" in t.column_names:
            sc = t.column("set_cols")
            sc_valid = pc.is_valid(sc).to_numpy(zero_copy_only=False)
            if sc_valid.any():
                col_bit = {c: 1 << i for i, c in enumerate(self.data_cols)}
                idxs = np.flatnonzero(sc_valid)
                lists = sc.take(pa.array(idxs)).to_pylist()
                for j, lst in zip(idxs, lists):
                    m = 0
                    for c in lst or ():
                        m |= col_bit.get(c, 0)
                    mask[j] = m
        # full-image ops set every column; deletes set none
        is_full_np = pc.fill_null(is_full_img, False).to_numpy(zero_copy_only=False)
        is_d_np = pc.fill_null(is_d, False).to_numpy(zero_copy_only=False)
        mask[is_full_np] = self.full_mask
        mask[is_d_np] = 0

        # ---- UPDATE enrichment (M7) ----------------------------------
        is_u_np = pc.fill_null(is_u, False).to_numpy(zero_copy_only=False)
        for i, c in enumerate(self.data_cols):
            bit = ((mask >> i) & 1).astype(bool)
            b_valid = pc.is_valid(b_cols[c]).to_numpy(zero_copy_only=False)
            fill = is_u_np & ~bit & b_valid
            if fill.any():
                cond = pa.array(fill)
                a_cols[c] = pc.if_else(cond, b_cols[c], a_cols[c])
                mask |= fill.astype(np.int64) << i

        cols = {
            "scn": t.column("scn").cast(pa.int64()),
            "row_id": t.column("row_id").cast(pa.string()),
            "commit_scn": (
                t.column("commit_scn").cast(pa.int64())
                if "commit_scn" in t.column_names
                else pa.nulls(n, pa.int64())
            ),
            "tx_id": t.column("tx_id").cast(pa.string()),
            "op": op.cast(pa.string()),
            "ts_ms": (
                t.column("ts_ms").cast(pa.timestamp("ms", tz="UTC"))
                if "ts_ms" in t.column_names
                else pa.nulls(n, pa.timestamp("ms", tz="UTC"))
            ),
            "table": (
                t.column("table").cast(pa.string())
                if "table" in t.column_names
                else pa.nulls(n, pa.string())
            ),
            self.key_column: key,
            "set_mask": pa.array(mask),
        }
        for c in self.data_cols:
            cols[f"a_{c}"] = a_cols[c]
            cols[f"b_{c}"] = b_cols[c]
        return pa.table(cols, schema=self.out_schema)


def route_dead_rows(
    dead_dir: str | None, version: int, rows: list[dict], reasons: list[str]
) -> None:
    """Write rejected rows to the dead-letter dataset.  File names
    carry the manifest version so a re-run of the same micro-batch can
    be deduplicated on read by (scn, row_id)."""
    if not dead_dir or not rows:
        return
    import os
    import uuid

    import pyarrow.parquet as _pq

    os.makedirs(dead_dir, exist_ok=True)
    t = pa.table(
        {
            "scn": pa.array([r.get("scn") for r in rows], pa.int64()),
            "row_id": pa.array([r.get("row_id") for r in rows], pa.string()),
            "tx_id": pa.array([r.get("tx_id") for r in rows], pa.string()),
            "table": pa.array([r.get("table") for r in rows], pa.string()),
            "sql_redo": pa.array([r.get("sql_redo") for r in rows], pa.string()),
            "reason": pa.array(reasons, pa.string()),
        }
    )
    name = f"v{version:08d}-{uuid.uuid4().hex[:12]}.parquet"
    _pq.write_table(t, os.path.join(dead_dir, name))


class RedoSqlDecoder:
    """Decode a raw redo-SQL changelog: rows carry the statement TEXT
    (``sql_redo``) instead of before/after structs -- the reference's
    actual input shape (``v$logmnr_contents``).

    Pipeline per batch: CSF fragment reassembly
    (``LogminerFetcher.kt:144-153``; a safety net -- the engine's
    redo read path reassembles per FILE before batch slicing, see
    ``pipelines/engine.py``) -> VECTORIZED statement parse
    (``functions/redo_fast.py``: RE2 kernels over the whole batch,
    signature-specialized patterns cached per worker; the scalar
    parser ``functions/redo_sql.py`` -- the reference's parse-loop
    shape -- remains the fallback for non-canonical statements, with
    ``fast_rows``/``fallback_rows`` counters) -> flat pipeline form
    with M7 enrichment.  Unparseable
    statements, unknown columns and literal-conversion failures are
    dropped with accounting (``TransactionConsolidator.kt:66-70``,
    ``SourceTask.kt:133-141``) and -- when ``dead_dir`` is set --
    ROUTED to a queryable dead-letter Parquet dataset
    (scn, row_id, tx_id, table, sql_redo, reason), so at 100 TB the
    rejected rows are inspectable instead of a per-worker counter
    that dies with the worker.
    """

    def __init__(
        self,
        table_schema: pa.Schema,
        key_column: str = "url",
        whitelist: tuple[str, ...] = (),
        db_timezone: str = "UTC",
        dead_dir: str | None = None,
        version: int = 0,
        scn_lo: int | None = None,
        scn_hi: int | None = None,
    ):
        from logminer_kafka_connect_ray.types import column_type_for_arrow

        self.table_schema = table_schema
        self.key_column = key_column
        self.whitelist = tuple(whitelist)
        self.data_cols = schemas.data_columns_of(table_schema, key_column)
        self.full_mask = (1 << len(self.data_cols)) - 1
        self.out_schema = schemas.flat_change_schema(key_column, table_schema)
        self.column_types = {
            f.name: column_type_for_arrow(f.type, db_timezone) for f in table_schema
        }
        self.dead_letters = 0
        self.dead_dir = dead_dir
        self.version = version
        self.scn_lo = scn_lo
        self.scn_hi = scn_hi
        # vectorized fast path for canonical statement shapes; the
        # scalar parser remains the fallback (and the semantic oracle)
        import os as _os

        self.fast_rows = 0
        self.fallback_rows = 0
        self._fast = None
        if _os.environ.get("LKC_REDO_FAST", "1") == "1":
            from logminer_kafka_connect_ray.functions.redo_fast import (
                FastRedoParser,
            )

            self._fast = FastRedoParser(
                self.column_types, key_column, self.data_cols,
                self.out_schema, self.full_mask,
            )

    def _route_dead(self, rows: list[dict], reasons: list[str]) -> None:
        # attribute each reject to exactly ONE micro-batch: an event
        # file can span a micro-batch boundary and be re-read by the
        # next batch, so only rejects inside THIS batch's SCN window
        # are routed (the decode's own change rows get the same window
        # filter downstream in the processor)
        if self.scn_lo is not None or self.scn_hi is not None:
            kept = [
                (r, why)
                for r, why in zip(rows, reasons)
                if (self.scn_lo is None or (r.get("scn") or 0) > self.scn_lo)
                and (self.scn_hi is None or (r.get("scn") or 0) <= self.scn_hi)
            ]
            rows = [r for r, _ in kept]
            reasons = [w for _, w in kept]
        self.dead_letters += len(rows)
        route_dead_rows(self.dead_dir, self.version, rows, reasons)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from logminer_kafka_connect_ray.functions.redo_sql import reassemble_csf

        t = reassemble_csf(batch)
        keep = pc.is_in(t.column("op"), value_set=pa.array(schemas.CHANGE_OPS))
        if "status" in t.column_names:
            ok = pc.fill_null(
                pc.not_equal(t.column("status"), schemas.STATUS_UNREADABLE), True
            )
            if self.dead_dir is not None:
                bad = t.filter(pc.and_(keep, pc.invert(ok)))
                if bad.num_rows:
                    rows = bad.to_pylist()
                    self._route_dead(rows, ["unreadable"] * len(rows))
            keep = pc.and_(keep, ok)
        t = t.filter(keep)
        if self.whitelist and "table" in t.column_names:
            tables = t.column("table").unique().to_pylist()
            allowed = [x for x in tables if x and matches_whitelist(x, self.whitelist)]
            t = t.filter(
                pc.is_in(t.column("table"), value_set=pa.array(allowed, pa.string()))
            )

        if self._fast is not None:
            groups, fb_idx = self._fast.parse(t)
            self.fast_rows += t.num_rows - len(fb_idx)
            self.fallback_rows += len(fb_idx)
            if len(fb_idx) == 0:
                slow = None
            else:
                slow_rows = t.take(pa.array(fb_idx)).to_pylist()
                slow, kept = self._parse_rows_python(slow_rows)
                slow = slow.append_column(
                    "_oi", pa.array(fb_idx[kept], pa.int64())
                )
            parts = groups + ([slow] if slow is not None else [])
            if not parts:
                return self.out_schema.empty_table()
            merged = pa.concat_tables(parts)
            order = np.argsort(
                merged.column("_oi").to_numpy(zero_copy_only=False),
                kind="stable",
            )
            merged = merged.take(pa.array(order)).drop_columns(["_oi"])
            return merged.cast(self.out_schema)

        tbl, _ = self._parse_rows_python(t.to_pylist())
        return tbl

    def _parse_rows_python(
        self, rows: list[dict]
    ) -> tuple[pa.Table, np.ndarray]:
        """Scalar statement parse (the reference's per-row loop shape).
        Returns the decoded table plus the positions of ``rows`` that
        produced output (for original-order reassembly)."""
        from logminer_kafka_connect_ray.functions.redo_sql import (
            RedoSqlParseError,
            UnknownColumnError,
            parse_redo,
        )

        out: dict[str, list] = {
            k: []
            for k in (
                "scn", "row_id", "commit_scn", "tx_id", "op", "ts_ms", "table",
                self.key_column, "set_mask",
            )
        }
        for c in self.data_cols:
            out[f"a_{c}"] = []
            out[f"b_{c}"] = []
        col_bit = {c: 1 << i for i, c in enumerate(self.data_cols)}

        dead_rows: list[dict] = []
        dead_reasons: list[str] = []
        kept: list[int] = []
        for ri, r in enumerate(rows):
            sql = r.get("sql_redo")
            if not sql:
                dead_rows.append(r)
                dead_reasons.append("empty_sql")
                continue
            try:
                op, before, after = parse_redo(sql, self.column_types)
            except UnknownColumnError:
                dead_rows.append(r)
                dead_reasons.append("unknown_column")
                continue
            except RedoSqlParseError:
                dead_rows.append(r)  # M4 dead-letter skip
                dead_reasons.append("parse_error")
                continue
            except (ValueError, ArithmeticError):
                # literal conversion failures (decimal.InvalidOperation
                # for malformed numerics, ValueError from timestamp /
                # fromhex parsing) must skip-with-accounting, not crash
                # the stream (TransactionConsolidator.kt:66-70, M5)
                dead_rows.append(r)
                dead_reasons.append("convert_error")
                continue
            before = before or {}
            after = after or {}
            key = after.get(self.key_column, before.get(self.key_column))
            if key is None:
                dead_rows.append(r)
                dead_reasons.append("missing_key")
                continue
            if op == "i":
                mask = self.full_mask
            elif op == "d":
                mask = 0
            else:
                # SET columns are explicit in the statement (incl. SET
                # col = NULL, Issue14) ...
                mask = 0
                for c in after:
                    mask |= col_bit.get(c, 0)
                # ... then M7 enrichment from the WHERE/before image
                for c, v in before.items():
                    if c in col_bit and not (mask & col_bit[c]) and v is not None:
                        after[c] = v
                        mask |= col_bit[c]
            kept.append(ri)
            out["scn"].append(r["scn"])
            out["row_id"].append(r["row_id"])
            out["commit_scn"].append(r.get("commit_scn"))
            out["tx_id"].append(r.get("tx_id"))
            out["op"].append(op)
            out["ts_ms"].append(r.get("ts_ms"))
            out["table"].append(r.get("table"))
            out[self.key_column].append(key)
            out["set_mask"].append(mask)
            for c in self.data_cols:
                out[f"a_{c}"].append(after.get(c))
                out[f"b_{c}"].append(before.get(c))

        self._route_dead(dead_rows, dead_reasons)
        arrays = {
            name: pa.array(vals, self.out_schema.field(name).type)
            for name, vals in out.items()
        }
        return (
            pa.table(arrays, schema=self.out_schema),
            np.asarray(kept, np.int64),
        )
