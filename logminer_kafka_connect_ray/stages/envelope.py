"""Debezium-style change-event envelope emission (optional output).

The reference's actual output artifact is a Kafka ``SourceRecord`` with
value Struct ``{op, before, after, source{version, connector, ts_ms,
scn, txId, table, schema, user}, ts_ms}`` and key Struct from the PK
columns (``ConnectSchemaFactory.kt:13-54, 76-120``; key ``:62-74``),
plus an optional ``(key, null)`` tombstone after DELETE
(``ConnectSchemaFactory.kt:138-152``, config ``tombstones.on.delete``).

Our engine's primary sink is the materialized lake (deletes are row
removals), but pipelines that want a downstream changelog can emit the
same envelope as an Arrow dataset / Parquet changelog with this stage:
flat pipeline rows -> envelope rows (before/after as structs, source
metadata struct, tombstones appended).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from logminer_kafka_connect_ray import schemas

CONNECTOR_NAME = "logminer-kafka-connect-ray"
VERSION = "0.1.0"


def envelope_schema(table_schema: pa.Schema, key_column: str) -> pa.Schema:
    img = schemas.image_struct(table_schema)
    source = pa.struct(
        [
            ("version", pa.string()),
            ("connector", pa.string()),
            ("ts_ms", pa.timestamp("ms", tz="UTC")),
            ("scn", pa.int64()),
            ("commit_scn", pa.int64()),
            ("tx_id", pa.string()),
            ("table", pa.string()),
        ]
    )
    return pa.schema(
        [
            pa.field("key", table_schema.field(key_column).type),
            pa.field("op", pa.string()),
            pa.field("before", img),
            pa.field("after", img),
            pa.field("source", source),
            pa.field("ts_ms", pa.timestamp("ms", tz="UTC")),
            # tombstone rows: key present, everything else null
            pa.field("tombstone", pa.bool_()),
        ]
    )


class EnvelopeStage:
    """``map_batches`` callable: flat change rows -> envelope rows.

    With ``emit_tombstones=True``, each DELETE additionally yields a
    ``(key, null)`` tombstone row (the Kafka-compaction delete marker,
    SourceConnectorConfig.kt:118-119)."""

    def __init__(
        self,
        table_schema_json: list[dict],
        key_column: str,
        emit_tombstones: bool = False,
    ):
        self.table_schema = schemas.schema_from_json(table_schema_json)
        self.key_column = key_column
        self.emit_tombstones = emit_tombstones
        self.data_cols = schemas.data_columns_of(self.table_schema, key_column)
        self.out_schema = envelope_schema(self.table_schema, key_column)

    def _image(self, t: pa.Table, prefix: str, present: pa.Array) -> pa.StructArray:
        n = t.num_rows
        key_arr = t.column(self.key_column)
        if isinstance(key_arr, pa.ChunkedArray):
            key_arr = key_arr.combine_chunks()
        arrays = [key_arr]
        for c in self.data_cols:
            col = t.column(f"{prefix}_{c}")
            arrays.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        mask = pc.invert(present).combine_chunks() if isinstance(present, pa.ChunkedArray) else pc.invert(present)
        return pa.StructArray.from_arrays(
            arrays,
            names=[self.key_column] + self.data_cols,
            mask=mask,
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        op = t.column("op")
        has_before = pc.is_in(op, value_set=pa.array(["u", "d"]))
        has_after = pc.is_in(op, value_set=pa.array(["r", "i", "u"]))
        before = self._image(t, "b", has_before)
        after = self._image(t, "a", has_after)
        ts = t.column("ts_ms")
        source = pa.StructArray.from_arrays(
            [
                pa.array([VERSION] * n),
                pa.array([CONNECTOR_NAME] * n),
                (ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts),
                t.column("scn").combine_chunks(),
                t.column("commit_scn").combine_chunks(),
                t.column("tx_id").combine_chunks(),
                t.column("table").combine_chunks(),
            ],
            names=["version", "connector", "ts_ms", "scn", "commit_scn", "tx_id", "table"],
        )
        key = t.column(self.key_column)
        out = pa.table(
            {
                "key": key,
                "op": op,
                "before": before,
                "after": after,
                "source": source,
                "ts_ms": ts,
                "tombstone": pa.array([False] * n, pa.bool_()),
            },
            schema=self.out_schema,
        )
        if self.emit_tombstones:
            is_d = pc.equal(op, "d")
            dels = t.filter(is_d)
            if dels.num_rows:
                nd = dels.num_rows
                img_type = schemas.image_struct(self.table_schema)
                tomb = pa.table(
                    {
                        "key": dels.column(self.key_column),
                        "op": pa.nulls(nd, pa.string()),
                        "before": pa.nulls(nd, img_type),
                        "after": pa.nulls(nd, img_type),
                        "source": pa.nulls(nd, self.out_schema.field("source").type),
                        "ts_ms": pa.nulls(nd, pa.timestamp("ms", tz="UTC")),
                        "tombstone": pa.array([True] * nd, pa.bool_()),
                    },
                    schema=self.out_schema,
                )
                out = pa.concat_tables([out, tomb])
        return out
