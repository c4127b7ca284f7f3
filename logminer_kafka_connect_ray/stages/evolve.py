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
            as_string = False
            if isinstance(decl, dict):  # {"type": ..., "default": ...}
                # {"as_string": true} = lossless string-typed mapping
                # for numeric ranges Arrow decimals cannot carry (the
                # reference holds unqualified NUMBER as Decimal(79,40),
                # ColumnSchemaBuilder.kt:18-19/80-86; Oracle NUMBER
                # reaches ~1e126 -- decimal256 caps at precision 76).
                # The literal text lands verbatim in a string column:
                # no dead letter, no silently wrong value.
                as_string = bool(decl.get("as_string"))
                decl = decl["type"]
            ct = (pa.string() if as_string else resolve_type(decl).arrow)
            prev = fields.get(name)
            t = widen(prev.type, ct) if prev is not None else ct
            fields[name] = pa.field(name, t, nullable=True)
    return list(fields.values())


def catalog_defaults(paths: list[str]) -> dict[str, str]:
    """DDL default literals from the ``_catalog.json`` sidecar(s)
    (reference: ``ColumnSchemaBuilder.kt:91-107`` parses the catalog's
    DATA_DEFAULT into ``convertDefaultValue``; ``ChangingTableTest.kt:
    42-93`` adds a column WITH a default and expects pre-existing rows
    to carry it).  Two accepted shapes::

        {"columns": {"rating": {"type": "NUMBER(9)", "default": "7"}}}
        {"columns": {...}, "defaults": {"rating": "7"}}

    Returned literals are RAW (manifest-persisted as strings); typing
    happens against the unified schema via ``typed_defaults``."""
    import json
    import os

    out: dict[str, str] = {}
    for d in {os.path.dirname(p) for p in paths}:
        cat = os.path.join(d, "_catalog.json")
        if not os.path.exists(cat):
            continue
        with open(cat) as f:
            doc = json.load(f)
        for name, decl in doc.get("columns", {}).items():
            if isinstance(decl, dict) and decl.get("default") is not None:
                out[name] = str(decl["default"])
        for name, lit in doc.get("defaults", {}).items():
            if lit is not None:
                out[name] = str(lit)
    return out


def catalog_renames(paths: list[str]) -> dict[str, str]:
    """DDL column RENAMEs from the catalog sidecar, as ``old -> new``.

    POLICY (the reference tracks DDL in the redo dictionary,
    ``logminer/LogminerSession.kt:37-167``; this engine's evolution is
    additive, so):

    * ``RENAME COLUMN old TO new`` = ADD ``new`` (typed like ``old``)
      + KEEP ``old``.  Pre-existing rows surface their ``old`` value
      under ``new`` (lineage fill at read/merge time, physical at the
      partition's next copy-on-write rewrite); statements writing the
      new name decode normally; the old column stays queryable and is
      never destroyed.
    * Effective at the START of the micro-batch that discovers it:
      the sidecar carries no SCN, so the rename cannot interleave
      with that batch's own statements -- the lineage copy is the
      pre-batch value, and old-name writes (in that batch or later)
      update only the old column.
    * Sidecar shape: ``{"renames": {"old": "new"}}``.
    """
    import json
    import os

    out: dict[str, str] = {}
    for d in {os.path.dirname(p) for p in paths}:
        cat = os.path.join(d, "_catalog.json")
        if not os.path.exists(cat):
            continue
        with open(cat) as f:
            doc = json.load(f)
        for old, new in doc.get("renames", {}).items():
            out[str(old)] = str(new)
    return out


def catalog_dropped(paths: list[str]) -> list[str]:
    """DDL column DROPs from the catalog sidecar
    (``{"dropped": ["col"]}``).

    POLICY: drops are IGNORED-BUT-ACCOUNTED -- the column and its data
    stay in the table schema and lake files (dropping would be a
    destructive table-wide rewrite the CDC sink must never do on its
    own), the manifest records the intent in ``dropped`` so an
    operator-triggered compaction can remove it physically, and
    replaying a log that still contains statements on the column keeps
    working."""
    import json
    import os

    out: list[str] = []
    for d in {os.path.dirname(p) for p in paths}:
        cat = os.path.join(d, "_catalog.json")
        if not os.path.exists(cat):
            continue
        with open(cat) as f:
            doc = json.load(f)
        for c in doc.get("dropped", []):
            if c not in out:
                out.append(str(c))
    return out


def apply_renames(
    schema: pa.Schema, renames: dict[str, str]
) -> tuple[pa.Schema, bool]:
    """Ensure each rename TARGET exists in the schema, typed like its
    source (add-new+keep-old policy).  Unknown sources are ignored."""
    changed = False
    out = list(schema)
    names = {f.name for f in out}
    for old, new in renames.items():
        if new in names or old not in names:
            continue
        src = schema.field(old)
        out.append(pa.field(new, src.type, nullable=True))
        names.add(new)
        changed = True
    return pa.schema(out), changed


def typed_defaults(
    schema: pa.Schema, raw: dict[str, str], db_timezone: str = "UTC"
) -> dict[str, object]:
    """Raw default literals -> typed python values for columns present
    in ``schema`` (SYSDATE-family unresolvables drop to None and are
    omitted -- the reference's null-default behavior,
    ``ColumnSchemaBuilder.kt:97-107``)."""
    from logminer_kafka_connect_ray.types import column_type_for_arrow

    out: dict[str, object] = {}
    for name, lit in (raw or {}).items():
        if schema.get_field_index(name) < 0:
            continue
        ct = column_type_for_arrow(schema.field(name).type, db_timezone)
        try:
            v = ct.convert_default(lit)
        except (ValueError, ArithmeticError):
            v = None
        if v is not None:
            out[name] = v
    return out


def align_flat(
    t: pa.Table,
    flat_schema: pa.Schema,
    defaults: dict | None = None,
    fill_from: dict[str, str] | None = None,
) -> pa.Table:
    """Cast a flat event table (e.g. pre-evolution carryover spill) to
    the current flat schema: add missing columns as null, widen types.

    ``fill_from`` (``missing_col -> source_col``, the rename lineage)
    surfaces a renamed-into column's values from its source column;
    ``defaults`` (typed, per column name) backfills a MISSING column
    with its DDL default instead of null -- the lake-read analog of
    Oracle giving pre-existing rows an added column's default; old
    partition files stay valid until their next copy-on-write rewrite."""
    cols = []
    for f in flat_schema:
        if f.name in t.column_names:
            c = t.column(f.name)
            cols.append(c.cast(f.type) if c.type != f.type else c)
        elif (
            fill_from
            and f.name in fill_from
            and fill_from[f.name] in t.column_names
        ):
            c = t.column(fill_from[f.name])
            cols.append(c.cast(f.type) if c.type != f.type else c)
        elif defaults and f.name in defaults:
            cols.append(pa.repeat(pa.scalar(defaults[f.name], f.type), t.num_rows))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.table(cols, schema=flat_schema)
