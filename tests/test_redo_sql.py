"""Redo-SQL parsing + CSF reassembly + end-to-end redo-format replay.

Mirrors the reference's parse-layer tests: DMLOperationsTest (op +
before/after images from statements), Issue14Test (SET col = NULL),
LongStatementsTest (CSF-fragmented long statements), parse-failure
dead-lettering (TransactionConsolidator.kt:66-70)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from logminer_kafka_connect_ray import EngineConfig, schemas
from logminer_kafka_connect_ray.functions.redo_sql import (
    RedoSqlParseError,
    UnknownColumnError,
    parse_redo,
    reassemble_csf,
)
from logminer_kafka_connect_ray.pipelines.engine import Engine
from logminer_kafka_connect_ray.stages.decode import RedoSqlDecoder
from logminer_kafka_connect_ray.testing.compare import state_diff, table_to_state
from logminer_kafka_connect_ray.testing.gen import (
    ChangeGenConfig,
    gen_changes,
    gen_pages,
    write_redo_sql_batches,
)
from logminer_kafka_connect_ray.testing.oracle import replay_oracle
from logminer_kafka_connect_ray.types import column_type_for_arrow, resolve_type

TYPES = {
    "ID": resolve_type("NUMBER(8)"),
    "STRING": resolve_type("VARCHAR2"),
    "TS": resolve_type("TIMESTAMP"),
}


def test_parse_insert():
    op, before, after = parse_redo(
        """insert into "S"."T"("ID","STRING") values (42, 'it''s')""", TYPES
    )
    assert op == "i" and before is None
    assert after == {"ID": 42, "STRING": "it's"}


def test_parse_update_partial_with_null_set():
    """UPDATE: after = SET pairs only (partial), full before from WHERE;
    SET to NULL yields explicit None (Issue14Test.kt:93-116)."""
    op, before, after = parse_redo(
        """update "S"."T" set "STRING" = NULL where "ID" = 7 and "STRING" = 'x'""",
        TYPES,
    )
    assert op == "u"
    assert after == {"STRING": None}
    assert before == {"ID": 7, "STRING": "x"}


def test_parse_delete_and_is_null():
    op, before, after = parse_redo(
        """delete from "S"."T" where "ID" = 1 and "STRING" IS NULL""", TYPES
    )
    assert op == "d" and after is None
    assert before == {"ID": 1, "STRING": None}


def test_parse_to_timestamp_literal():
    import datetime as dt

    op, _, after = parse_redo(
        """insert into "S"."T"("ID","TS") values (1, """
        """TO_TIMESTAMP('2024-03-01 10:20:30.000000', 'YYYY-MM-DD HH24:MI:SS.FF6'))""",
        TYPES,
    )
    assert after["TS"] == dt.datetime(2024, 3, 1, 10, 20, 30, tzinfo=dt.timezone.utc)


def test_parse_errors():
    with pytest.raises(RedoSqlParseError):
        parse_redo("truncate table x", TYPES)
    with pytest.raises(UnknownColumnError):
        parse_redo("""insert into "S"."T"("NOPE") values (1)""", TYPES)
    with pytest.raises(RedoSqlParseError):
        parse_redo("""update "S"."T" set "ID" = 1 where "ID" > 3""", TYPES)


def test_csf_reassembly_unit():
    sql = """insert into "S"."T"("ID","STRING") values (5, 'abcdefghij')"""
    frags = [sql[:20], sql[20:40], sql[40:]]
    t = pa.table(
        {
            "scn": pa.array([1, 1, 1, 2], pa.int64()),
            "sql_redo": pa.array(frags + ["delete from x"], pa.string()),
            "csf": pa.array([1, 1, 0, 0], pa.int32()),
        }
    )
    out = reassemble_csf(t)
    assert out.num_rows == 2
    assert out.column("sql_redo")[0].as_py() == sql
    assert "csf" not in out.column_names


def test_redo_decoder_dead_letters():
    tschema = pa.schema([("url", pa.string()), ("text", pa.string())])
    dec = RedoSqlDecoder(tschema, "url")
    t = pa.Table.from_pylist(
        [
            {"scn": 1, "row_id": "a", "tx_id": "t1", "op": "i", "csf": 0,
             "sql_redo": 'insert into "T"("url","text") values (\'u1\', \'x\')'},
            {"scn": 2, "row_id": "b", "tx_id": "t1", "op": "i", "csf": 0,
             "sql_redo": "garbage %%% statement"},
            {"scn": 3, "row_id": "c", "tx_id": "t1", "op": "i", "csf": 0,
             "sql_redo": 'insert into "T"("url","unknown_col") values (\'u2\', 1)'},
        ]
    )
    out = dec(t)
    assert out.num_rows == 1
    assert dec.dead_letters == 2


@pytest.mark.parametrize("csf_len", [None, 120])
def test_redo_sql_end_to_end(ray_session, tmp_path, csf_len):
    """Full replay from a redo-SQL-shaped changelog (with and without
    CSF fragmentation) matches the dict oracle."""
    pages = gen_pages(40)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=250, seed=51, p_set_null=0.2)
    )
    changelog = str(tmp_path / "changelog")
    write_redo_sql_batches(events, changelog, events_per_file=80,
                           csf_fragment_len=csf_len)

    eng = Engine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            num_partitions=4,
            changelog_format="redo_sql",
        )
    )
    eng.snapshot(pages_path, 999)
    eng.replay(changelog)

    base = {
        r["url"]: {k: v for k, v in r.items() if k != "url"}
        for r in pages.to_pylist()
    }
    want = replay_oracle(base, events)
    got = table_to_state(eng.to_arrow())
    assert not state_diff(got, want), state_diff(got, want)
