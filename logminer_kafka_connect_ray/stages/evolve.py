"""Schema evolution: additive / widening unification.

Reference behavior being re-expressed (SURVEY.md section 7.0 invariant
5): schema is discovered per table, cached, and refreshed when a record
fails to convert (``SchemaService.kt:34-40``,
``TransactionConsolidator.kt:79-89``), at most once per transaction
(``Transaction.kt:93-100``); evolution is additive (column added with
default/nullable, ``ChangingTableTest.kt:42-93``) or widening
(NUMBER precision tiers, ``ColumnSchemaBuilder.kt:201-257``).

Here schemas are explicit in Parquet footers, so "refresh on conversion
failure" becomes *detection at plan time*: before each micro-batch the
driver unifies the after-image struct schemas of the batch's files with
the current table schema.  New columns append as nullable; type
conflicts resolve by widening promotion; anything else raises (the
reference's unsupported-type ``IllegalArgumentException``,
``ColumnSchemaBuilder.kt:253-255``).  Old partition files are cast on
read at merge time (``base_as_pseudo_events`` fills missing columns
with null), so evolution is applied per-partition with no table-wide
rewrite.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

_INT_TIER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_FLOAT_TIER = {pa.float32(): 0, pa.float64(): 1}


def widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Widening promotion of two column types (ColumnSchemaBuilder.kt
    NUMBER tiers: int8<int16<int32<int64<float64<decimal)."""
    if a == b:
        return a
    if a in _INT_TIER and b in _INT_TIER:
        return a if _INT_TIER[a] >= _INT_TIER[b] else b
    if a in _FLOAT_TIER and b in _FLOAT_TIER:
        return a if _FLOAT_TIER[a] >= _FLOAT_TIER[b] else b
    if (a in _INT_TIER and b in _FLOAT_TIER) or (a in _FLOAT_TIER and b in _INT_TIER):
        return pa.float64()
    if pa.types.is_decimal(a) and pa.types.is_decimal(b):
        scale = max(a.scale, b.scale)
        prec = max(a.precision - a.scale, b.precision - b.scale) + scale
        return pa.decimal256(prec, scale) if prec > 38 else pa.decimal128(prec, scale)
    if (pa.types.is_decimal(a) and b in _INT_TIER) or (
        pa.types.is_decimal(b) and a in _INT_TIER
    ):
        return a if pa.types.is_decimal(a) else b
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b) and a.tz == b.tz:
        order = {"s": 0, "ms": 1, "us": 2, "ns": 3}
        return a if order[a.unit] >= order[b.unit] else b
    if (pa.types.is_string(a) and pa.types.is_large_string(b)) or (
        pa.types.is_large_string(a) and pa.types.is_string(b)
    ):
        return pa.large_string()
    raise ValueError(f"unsupported schema evolution: {a} vs {b}")


def unify_with(current: pa.Schema, incoming_fields: list[pa.Field]) -> tuple[pa.Schema, bool]:
    """Unify the current table schema with incoming image fields.

    Returns ``(schema, changed)``.  Existing column order is preserved;
    new columns append at the end (matching ChangingTableTest: added
    column appears in subsequent records' schema).
    """
    by_name = {f.name: f for f in current}
    out = list(current)
    changed = False
    for f in incoming_fields:
        cur = by_name.get(f.name)
        if cur is None:
            out.append(pa.field(f.name, f.type, nullable=True))
            changed = True
        else:
            w = widen(cur.type, f.type)
            if w != cur.type:
                out[[x.name for x in out].index(f.name)] = pa.field(f.name, w, nullable=True)
                changed = True
    return pa.schema(out), changed


def discover_image_fields(paths: list[str]) -> list[pa.Field]:
    """Union of after/before struct fields across event files (footer
    metadata only -- the plan-time analog of the reference's schema
    refresh)."""
    fields: dict[str, pa.Field] = {}
    for p in paths:
        sch = pq.ParquetFile(p).schema_arrow
        for col in ("after", "before"):
            if col in sch.names:
                t = sch.field(col).type
                if pa.types.is_struct(t):
                    for i in range(t.num_fields):
                        f = t.field(i)
                        prev = fields.get(f.name)
                        if prev is None:
                            fields[f.name] = f
                        elif prev.type != f.type:
                            fields[f.name] = pa.field(f.name, widen(prev.type, f.type))
    return list(fields.values())


def catalog_fields(paths: list[str]) -> list[pa.Field]:
    """Dictionary-sidecar discovery for REDO-SQL changelogs.

    Statement text carries no type info, so the redo path's schema
    source is a ``_catalog.json`` next to the log files -- the analog
    of the reference's LogMiner dictionary (``DictionaryStrategy``,
    ``logminer/LogminerSession.kt:37-167``) that ``SchemaService``
    refreshes from on conversion failure (``SchemaService.kt:30-108``,
    ``ChangingTableTest.kt:42-93``).  Refresh happens at plan time:
    every micro-batch re-reads the sidecar, so a column added
    mid-stream evolves the table schema before its statements decode
    (instead of dead-lettering them).
    """
    import json
    import os

    from logminer_kafka_connect_ray.types import resolve_type

    fields: dict[str, pa.Field] = {}
    for d in {os.path.dirname(p) for p in paths}:
        cat = os.path.join(d, "_catalog.json")
        if not os.path.exists(cat):
            continue
        with open(cat) as f:
            doc = json.load(f)
        for name, decl in doc.get("columns", {}).items():
            ct = resolve_type(decl)
            prev = fields.get(name)
            t = widen(prev.type, ct.arrow) if prev is not None else ct.arrow
            fields[name] = pa.field(name, t, nullable=True)
    return list(fields.values())


def align_flat(t: pa.Table, flat_schema: pa.Schema) -> pa.Table:
    """Cast a flat event table (e.g. pre-evolution carryover spill) to
    the current flat schema: add missing columns as null, widen types."""
    cols = []
    for f in flat_schema:
        if f.name in t.column_names:
            c = t.column(f.name)
            cols.append(c.cast(f.type) if c.type != f.type else c)
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.table(cols, schema=flat_schema)
