"""Arrow data model.

Maps the reference's row-oriented model (``CdcRecord.kt:5-16``: scn,
rowId, table, timestamp, operation, transaction, username, before/after
maps) onto Arrow schemas (SURVEY.md section 1.3).

Two representations of a change event exist:

* **on-disk / envelope form** -- ``before`` / ``after`` are Arrow
  ``struct`` columns (the Debezium-style envelope the reference builds
  in ``ConnectSchemaFactory.kt:76-120``), plus ``set_cols``
  (list<string>) to distinguish "column set to NULL" from "column not
  in the SET list" (reference ``issues/Issue14Test.kt:93-116``: UPDATE
  to NULL must yield after.col == null, while columns absent from the
  SET clause are *enriched* from the before image,
  ``ConnectSchemaFactory.kt:97-104``).

* **flat pipeline form** -- after the decode stage, before/after fields
  are flattened to ``b_<col>`` / ``a_<col>`` columns plus an int64
  ``set_mask`` bitmask (bit i <=> data column i is in the SET list).
  Flat columns keep every downstream kernel vectorized and zero-copy.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Operations (reference Operation.kt:3-8, Debezium-compatible codes)
# ---------------------------------------------------------------------------
OP_READ = "r"       # snapshot row          (reference initial/TableFetcher.kt:58-69)
OP_INSERT = "i"
OP_UPDATE = "u"
OP_DELETE = "d"
OP_COMMIT = "commit"      # txn marker rows (reference logminer/LogminerRow.kt:25-33)
OP_ROLLBACK = "rollback"

CHANGE_OPS = (OP_READ, OP_INSERT, OP_UPDATE, OP_DELETE)
MARKER_OPS = (OP_COMMIT, OP_ROLLBACK)

#: tx_id used for snapshot READ rows, which have no transaction
#: (reference initial/TableFetcher.kt:58-69 sets "NOT AVAILABLE").
NO_TXN = "NOT AVAILABLE"

#: status value for unreadable redo rows which must be skipped with a
#: warning (reference LogminerSource.kt:96-115).
STATUS_UNREADABLE = 2

# ---------------------------------------------------------------------------
# Base table schema (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
PAGES_FIELDS = [
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
]
PAGES_SCHEMA = pa.schema(PAGES_FIELDS)

#: bookkeeping columns stored per lake row in addition to the data
#: columns: last-applied (commit_scn, scn) -- the row-level analog of the
#: reference's re-read suppression on resume
#: (logminer/LogminerFetcher.kt:19-41) that makes re-applying an already
#: applied event a no-op.
LAKE_META_COLUMNS = ("_commit_scn", "_scn")


def lake_schema(table_schema: pa.Schema) -> pa.Schema:
    """Schema of a lake partition file = data schema + bookkeeping."""
    return pa.schema(
        list(table_schema)
        + [pa.field("_commit_scn", pa.int64()), pa.field("_scn", pa.int64())]
    )


def image_struct(table_schema: pa.Schema) -> pa.StructType:
    """before/after image type: all table fields, each nullable."""
    return pa.struct([pa.field(f.name, f.type, nullable=True) for f in table_schema])


def change_event_schema(table_schema: pa.Schema) -> pa.Schema:
    """On-disk change-event schema (FIXTURES.md F2).

    Column-by-column analog of the reference's ``LogminerRow.Change`` +
    ``CdcRecord`` (logminer/LogminerRow.kt:21-44, CdcRecord.kt:5-16).
    """
    img = image_struct(table_schema)
    return pa.schema(
        [
            pa.field("scn", pa.int64(), nullable=False),
            pa.field("row_id", pa.string(), nullable=False),
            pa.field("commit_scn", pa.int64()),        # set on marker rows
            pa.field("tx_id", pa.string()),
            pa.field("op", pa.string(), nullable=False),
            pa.field("ts_ms", pa.timestamp("ms", tz="UTC")),
            pa.field("table", pa.string()),
            pa.field("username", pa.string()),
            pa.field("status", pa.int32()),
            pa.field("before", img),
            pa.field("after", img),
            # null => infer SET columns from after-field validity
            pa.field("set_cols", pa.list_(pa.string())),
        ]
    )


# ---------------------------------------------------------------------------
# Flat pipeline form helpers
# ---------------------------------------------------------------------------
META_FLAT_COLUMNS = ("scn", "row_id", "commit_scn", "tx_id", "op", "ts_ms", "table")


def flat_change_schema(key_column: str, table_schema: pa.Schema) -> pa.Schema:
    """Decoded (flattened) change schema used between pipeline stages."""
    fields = [
        pa.field("scn", pa.int64()),
        pa.field("row_id", pa.string()),
        pa.field("commit_scn", pa.int64()),
        pa.field("tx_id", pa.string()),
        pa.field("op", pa.string()),
        pa.field("ts_ms", pa.timestamp("ms", tz="UTC")),
        pa.field("table", pa.string()),
        pa.field(key_column, table_schema.field(key_column).type),
        pa.field("set_mask", pa.int64()),
    ]
    for f in table_schema:
        if f.name == key_column:
            continue
        fields.append(pa.field(f"a_{f.name}", f.type))
        fields.append(pa.field(f"b_{f.name}", f.type))
    return pa.schema(fields)


def data_columns_of(table_schema: pa.Schema, key_column: str) -> list[str]:
    return [f.name for f in table_schema if f.name != key_column]


def schema_to_json(schema: pa.Schema) -> list[dict]:
    """JSON-serializable schema description for manifests."""
    return [{"name": f.name, "type": str(f.type)} for f in schema]


_TYPE_PARSERS = None


def _type_from_string(s: str) -> pa.DataType:
    """Inverse of str(pa.DataType) for the types this engine uses."""
    import re

    simple = {
        "string": pa.string(),
        "large_string": pa.large_string(),
        "binary": pa.binary(),
        "large_binary": pa.large_binary(),
        "bool": pa.bool_(),
        "int8": pa.int8(),
        "int16": pa.int16(),
        "int32": pa.int32(),
        "int64": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "date32[day]": pa.date32(),
    }
    if s in simple:
        return simple[s]
    m = re.fullmatch(r"timestamp\[(\w+)(?:, tz=(.+))?\]", s)
    if m:
        return pa.timestamp(m.group(1), tz=m.group(2))
    m = re.fullmatch(r"decimal(128|256)\((\d+), (-?\d+)\)", s)
    if m:
        fn = pa.decimal128 if m.group(1) == "128" else pa.decimal256
        return fn(int(m.group(2)), int(m.group(3)))
    m = re.fullmatch(r"list<(?:element|item): (.+?)(?: not null)?>", s)
    if m:
        return pa.list_(_type_from_string(m.group(1)))
    raise ValueError(f"unsupported serialized type: {s!r}")


def schema_from_json(cols: list[dict]) -> pa.Schema:
    return pa.schema([pa.field(c["name"], _type_from_string(c["type"])) for c in cols])
