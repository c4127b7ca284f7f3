"""Initial-snapshot source.

Re-expresses the reference's consistent flashback snapshot
(``initial/SelectSource.kt:9-104``, ``initial/TableFetcher.kt:14-86``:
``SELECT t.*, ROWID, ORA_ROWSCN FROM <tbl> AS OF SCN <s> ORDER BY
ROWID`` emitted as op=READ records with tx_id='NOT AVAILABLE') as a
parallel Parquet scan: every base-table row becomes a full-after-image
READ event stamped with the snapshot SCN, feeding the exact same merge
path as CDC events.  Where the reference scans tables sequentially with
a single cursor and resumes at (table, rowId), Ray Data reads all
fragments in parallel, and resume is the engine's manifest (the whole
snapshot commits as one idempotent micro-batch version).
"""

from __future__ import annotations

import pyarrow as pa

from logminer_kafka_connect_ray import schemas


class SnapshotStamper:
    """``map_batches`` callable: base-table rows -> flat READ events."""

    def __init__(
        self,
        table_schema_json: list[dict],
        key_column: str,
        snapshot_scn: int,
        table_name: str = "WEB.PAGES",
    ):
        self.table_schema = schemas.schema_from_json(table_schema_json)
        self.key_column = key_column
        self.snapshot_scn = snapshot_scn
        self.table_name = table_name
        self.flat_schema = schemas.flat_change_schema(key_column, self.table_schema)
        self.data_cols = schemas.data_columns_of(self.table_schema, key_column)
        self.full_mask = (1 << len(self.data_cols)) - 1

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        key = t.column(self.key_column).cast(
            self.table_schema.field(self.key_column).type
        )
        cols = {
            "scn": pa.array([self.snapshot_scn] * n, pa.int64()),
            # ROWID analog: the key itself (unique per snapshot row,
            # deterministic ordering tiebreak)
            "row_id": key.cast(pa.string()),
            # READ rows auto-commit at the snapshot SCN
            "commit_scn": pa.array([self.snapshot_scn] * n, pa.int64()),
            "tx_id": pa.array([schemas.NO_TXN] * n, pa.string()),
            "op": pa.array(["r"] * n, pa.string()),
            "ts_ms": pa.nulls(n, pa.timestamp("ms", tz="UTC")),
            "table": pa.array([self.table_name] * n, pa.string()),
            self.key_column: key,
            "set_mask": pa.array([self.full_mask] * n, pa.int64()),
        }
        for c in self.data_cols:
            ftype = self.table_schema.field(c).type
            if c in t.column_names:
                col = t.column(c)
                cols[f"a_{c}"] = col.cast(ftype) if col.type != ftype else col
            else:
                cols[f"a_{c}"] = pa.nulls(n, ftype)
            cols[f"b_{c}"] = pa.nulls(n, ftype)
        return pa.table(cols, schema=self.flat_schema)
