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
    REDO_SQL_SCHEMA,
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


def test_csf_run_across_batch_boundary(ray_session, tmp_path):
    """A csf=1...csf=0 run that would straddle a map_batches slice must
    still parse: the engine reassembles per FILE in the read task
    before any batch slicing (reference reassembles over the continuous
    cursor before batching, LogminerFetcher.kt:144-153).  Tiny
    batch_size + heavy fragmentation forces many would-be splits."""
    pages = gen_pages(20)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(pages, ChangeGenConfig(n_events=60, seed=52))
    changelog = str(tmp_path / "changelog")
    # ~40-char fragments: every statement becomes a multi-row CSF run
    write_redo_sql_batches(events, changelog, events_per_file=500,
                           csf_fragment_len=40)

    eng = Engine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            num_partitions=2,
            changelog_format="redo_sql",
            batch_size=7,  # slices mid-run without per-file reassembly
        )
    )
    eng.snapshot(pages_path, 999)
    eng.replay(changelog)

    m = eng.store.load()
    assert m.metrics["dead_letters"] == 0, m.metrics
    base = {r["url"]: {k: v for k, v in r.items() if k != "url"}
            for r in pages.to_pylist()}
    want = replay_oracle(base, events)
    got = table_to_state(eng.to_arrow())
    assert not state_diff(got, want), state_diff(got, want)


def test_redo_schema_evolution_via_catalog(ray_session, tmp_path):
    """Replaying redo SQL across an ALTER TABLE ADD COLUMN: the
    _catalog.json dictionary sidecar supplies the new column's type, so
    statements referencing it evolve the schema instead of being
    dead-lettered (ChangingTableTest.kt:42-93 / SchemaService.kt:30-108
    refresh semantics on the statement-text path)."""
    pages = gen_pages(30)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=200, seed=54, evolution_at_scn=1080)
    )
    changelog = str(tmp_path / "changelog")
    write_redo_sql_batches(events, changelog, events_per_file=60)

    eng = Engine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            num_partitions=4,
            changelog_format="redo_sql",
        )
    )
    eng.snapshot(pages_path, 999)
    m = eng.replay(changelog)
    assert m.schema_version >= 1
    assert m.metrics["dead_letters"] == 0, m.metrics

    got_tbl = eng.to_arrow()
    assert "fetch_status" in got_tbl.column_names
    got = table_to_state(got_tbl)
    base = {r["url"]: {k: v for k, v in r.items() if k != "url"}
            for r in pages.to_pylist()}
    want = replay_oracle(base, events)
    for row in want.values():
        row.setdefault("fetch_status", None)
    assert not state_diff(got, want), state_diff(got, want)


def test_dead_letter_routing(ray_session, tmp_path):
    """Corrupt statements (parse error) and bad literals (conversion
    error) are routed to lake/dead_letters/ with reasons, counted in
    manifest metrics, and the replay still matches the oracle for the
    valid rows (SourceTask.kt:133-141 skip-with-accounting, upgraded
    to a queryable dataset)."""
    from logminer_kafka_connect_ray.testing.gen import REDO_SQL_SCHEMA

    pages = gen_pages(20)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(pages, ChangeGenConfig(n_events=80, seed=53))
    changelog = str(tmp_path / "changelog")
    write_redo_sql_batches(events, changelog, events_per_file=500)

    hi = max(e["scn"] for e in events)
    bad_rows = [
        {"scn": hi + 1, "row_id": f"AAAx{hi+1:010d}", "commit_scn": None,
         "tx_id": "txbad", "op": "u", "ts_ms": 0, "table": "WEB.PAGES",
         "username": "WEBCRAWL", "status": 0, "csf": 0,
         "sql_redo": "garbage %%% not sql at all"},
        {"scn": hi + 2, "row_id": f"AAAx{hi+2:010d}", "commit_scn": None,
         "tx_id": "txbad", "op": "i", "ts_ms": 0, "table": "WEB.PAGES",
         "username": "WEBCRAWL", "status": 0, "csf": 0,
         "sql_redo": 'insert into "WEB"."PAGES"("url","warc_ts") values '
                     "('u-bad', TO_TIMESTAMP('not-a-date', "
                     "'YYYY-MM-DD HH24:MI:SS.FF6'))"},
        {"scn": hi + 3, "row_id": f"AAAx{hi+3:010d}", "commit_scn": hi + 3,
         "tx_id": "txbad", "op": "commit", "ts_ms": 0, "table": "WEB.PAGES",
         "username": "WEBCRAWL", "status": 0, "csf": 0, "sql_redo": None},
    ]
    t = pa.Table.from_pylist(bad_rows, schema=REDO_SQL_SCHEMA)
    pq.write_table(
        t, f"{changelog}/batch-{hi+1:012d}-{hi+3:012d}.parquet"
    )

    lake = str(tmp_path / "lake")
    eng = Engine(
        EngineConfig(lake_dir=lake, num_partitions=2,
                     changelog_format="redo_sql")
    )
    eng.snapshot(pages_path, 999)
    eng.replay(changelog)

    m = eng.store.load()
    assert m.metrics["dead_letters"] == 2, m.metrics
    import glob

    dead = pa.concat_tables(
        [pq.read_table(p) for p in glob.glob(f"{lake}/dead_letters/*.parquet")]
    )
    reasons = dict(zip(dead.column("scn").to_pylist(),
                       dead.column("reason").to_pylist()))
    assert reasons[hi + 1] == "parse_error"
    assert reasons[hi + 2] == "convert_error"
    base = {r["url"]: {k: v for k, v in r.items() if k != "url"}
            for r in pages.to_pylist()}
    want = replay_oracle(base, events)
    got = table_to_state(eng.to_arrow())
    assert not state_diff(got, want), state_diff(got, want)


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


def test_read_dead_letters_deduped(ray_session, tmp_path):
    """Engine.read_dead_letters: queryable, deduped on (scn, row_id)
    even when a retried batch wrote the same rejects twice."""
    from logminer_kafka_connect_ray.testing.gen import REDO_SQL_SCHEMA

    pages = gen_pages(10)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(pages, ChangeGenConfig(n_events=30, seed=55))
    changelog = str(tmp_path / "changelog")
    write_redo_sql_batches(events, changelog, events_per_file=500)
    hi = max(e["scn"] for e in events)
    bad = [{"scn": hi + 1, "row_id": f"AAAx{hi+1:010d}", "commit_scn": None,
            "tx_id": "txbad", "op": "u", "ts_ms": 0, "table": "WEB.PAGES",
            "username": "WEBCRAWL", "status": 0, "csf": 0,
            "sql_redo": "not sql"}]
    pq.write_table(pa.Table.from_pylist(bad, schema=REDO_SQL_SCHEMA),
                   f"{changelog}/batch-{hi+1:012d}-{hi+1:012d}.parquet")

    lake = str(tmp_path / "lake")
    eng = Engine(EngineConfig(lake_dir=lake, num_partitions=2,
                              changelog_format="redo_sql"))
    eng.snapshot(pages_path, 999)
    eng.replay(changelog)
    # simulate a retry double-write: copy the dead-letter file
    import glob
    import shutil as _sh

    f = glob.glob(f"{lake}/dead_letters/*.parquet")[0]
    _sh.copy(f, f.replace(".parquet", "-retry.parquet"))
    dead = eng.read_dead_letters().to_pandas()
    assert len(dead) == 1
    assert dead.iloc[0]["reason"] == "parse_error"
    assert dead.iloc[0]["scn"] == hi + 1


def test_rowid_predicate_skipped():
    """Real LogMiner WHERE clauses carry `and ROWID = 'AAA…'`; it is
    row metadata, not a column -- consumed without schema lookup."""
    op, before, after = parse_redo(
        """update "S"."T" set "STRING" = 'x' where "ID" = 5 and ROWID = 'AAAb'""",
        TYPES,
    )
    assert op == "u" and before == {"ID": 5} and after == {"STRING": "x"}
    op, before, _ = parse_redo(
        """delete from "S"."T" where "ID" = 1 and "STRING" IS NULL and ROWID = 'AAAc'""",
        TYPES,
    )
    assert before == {"ID": 1, "STRING": None}


def test_redo_sql_streaming_end_to_end(ray_session, tmp_path):
    """The reference's actual operating shape: a redo-SQL statement
    stream consumed by the long-lived poll loop.  Statement parsing,
    CSF reassembly and dead-letter routing all run inside the
    streaming decode tasks; final state matches the dict oracle and
    the corrupt statement lands in lake/dead_letters."""
    from logminer_kafka_connect_ray.pipelines.streaming import StreamingEngine
    from logminer_kafka_connect_ray.testing.gen import REDO_SQL_SCHEMA

    pages = gen_pages(30)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    events, _, _ = gen_changes(
        pages, ChangeGenConfig(n_events=200, seed=57, p_set_null=0.2)
    )
    changelog = str(tmp_path / "changelog")
    write_redo_sql_batches(events, changelog, events_per_file=60,
                           csf_fragment_len=120)
    # one corrupt statement inside its own committed txn
    hi = max(e["scn"] for e in events)
    bad = [
        {"scn": hi + 1, "row_id": f"AAAx{hi+1:010d}", "commit_scn": None,
         "tx_id": "txbad", "op": "u", "ts_ms": 0, "table": "WEB.PAGES",
         "username": "WEBCRAWL", "status": 0, "csf": 0,
         "sql_redo": "garbage %%% not sql at all"},
        {"scn": hi + 2, "row_id": f"AAAx{hi+2:010d}", "commit_scn": hi + 2,
         "tx_id": "txbad", "op": "commit", "ts_ms": 0, "table": "WEB.PAGES",
         "username": "WEBCRAWL", "status": 0, "csf": 0, "sql_redo": None},
    ]
    pq.write_table(
        pa.Table.from_pylist(bad, schema=REDO_SQL_SCHEMA),
        f"{changelog}/batch-{hi+1:012d}-{hi+2:012d}.parquet",
    )

    eng = Engine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"), num_partitions=4,
            changelog_format="redo_sql",
        )
    )
    eng.snapshot(pages_path, 999)
    stream = StreamingEngine(eng, changelog, num_shards=2, poll_interval=0.01)
    stream.run(max_polls=10)
    stream.shutdown()

    base = {
        r["url"]: {k: v for k, v in r.items() if k != "url"}
        for r in pages.to_pylist()
    }
    want = replay_oracle(base, events)
    got = table_to_state(eng.to_arrow())
    assert not state_diff(got, want), state_diff(got, want)
    dead = eng.read_dead_letters().to_pandas()
    assert (dead["reason"] == "parse_error").sum() == 1, dead


# ---------------------------------------------------------------------------
# Vectorized fast path (functions/redo_fast.py): differential vs the
# scalar parser, which stays the semantic oracle
# ---------------------------------------------------------------------------
def _mixed_schema():
    return pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("n_int", pa.int64()),
            ("n_f", pa.float64()),
            ("n_dec", pa.decimal128(10, 2)),
            ("d", pa.date32()),
            ("text", pa.string()),
        ]
    )


_FAST_STMTS = [
    "insert into \"W\".\"T\"(\"url\",\"warc_ts\",\"html\",\"n_int\",\"n_f\","
    "\"n_dec\",\"d\",\"text\") values ('u1', TO_TIMESTAMP("
    "'2024-01-02 03:04:05.123456', 'YYYY-MM-DD HH24:MI:SS.FF6'),"
    " HEXTORAW('deadBEEF'), 42, 3.5, 12.345,"
    " TO_DATE('2023-05-06', 'YYYY-MM-DD'), 'hello')",
    "insert into T(\"url\",\"text\",\"n_int\") values ('it''s', '', NULL)",
    "update \"W\".\"T\" set \"text\" = 'a,b where c', \"n_int\" = -7 "
    "where \"url\" = 'u2' and \"text\" IS NULL and ROWID = 'R9'",
    "update T set \"text\" = NULL where \"url\" = 'u3' and ROWID = 'R1'",
    "update T set \"url\" = 'new' where \"url\" = 'old'",
    "delete from \"W\".\"T\" where \"url\" = 'u4' and \"n_int\" = 5 "
    "and \"d\" IS NULL",
    "delete from T where \"url\" = 'u5' and \"n_int\" = 1 and \"n_f\" = 2.5"
    " and \"text\" = 'x' and ROWID = 'R2'",
    # beyond MAX_WHERE_PAIRS -> scalar fallback, still correct
    "delete from T where \"url\" = 'u6' and \"n_int\" = 1 and \"n_f\" = 2"
    " and \"text\" = 'x' and \"d\" = TO_DATE('2020-01-01','YYYY-MM-DD')"
    " and ROWID = 'R3'",
    "update T set \"nope\" = '1' where \"url\" = 'u7'",  # unknown_column
    "update T set garbage",  # parse_error
    "update T set \"warc_ts\" = TO_TIMESTAMP('not-a-ts', 'X') "
    "where \"url\" = 'u8'",  # convert_error
    "update T set \"text\" = 'v' where \"n_int\" = 3",  # missing_key
    None,  # empty_sql
    "update T set \"n_dec\" = 1.999, \"n_f\" = -1.5e2 where \"url\" = 'u9'",
    "update T set \"warc_ts\" = TO_TIMESTAMP('2024-01-02 03:04:05.1', 'F'),"
    " \"d\" = TO_DATE('2023-05-06 10:00:00','X') where \"url\" = 'u10'",
    "delete from T where \"url\" = 'u11'",
    "update T set \"text\" = 123 where \"url\" = 'u12'",
    "update T set \"text\" = 'again' where \"url\" = 'u2' and ROWID = 'R10'",
]


def _redo_log_table(stmts):
    rows = []
    for i, sql in enumerate(stmts):
        op = "u"
        if sql and sql.lstrip().lower().startswith("insert"):
            op = "i"
        elif sql and sql.lstrip().lower().startswith("delete"):
            op = "d"
        rows.append(
            {"scn": 100 + i, "row_id": f"R{i}", "commit_scn": None,
             "tx_id": "tx1", "op": op, "ts_ms": 1700000000000 + i,
             "table": "W.T", "username": None, "status": 0, "csf": 0,
             "sql_redo": sql}
        )
    return pa.Table.from_pylist(rows, schema=REDO_SQL_SCHEMA)


def test_fast_redo_differential(tmp_path, monkeypatch):
    """Fast path == scalar path on every statement shape, including
    dead-letter routing, on both a cold and a warm (specialized
    pattern cache) pass."""
    t = _redo_log_table(_FAST_STMTS)
    tschema = _mixed_schema()
    dd_fast, dd_slow = str(tmp_path / "ddf"), str(tmp_path / "dds")
    dec_fast = RedoSqlDecoder(tschema, "url", dead_dir=dd_fast)
    monkeypatch.setenv("LKC_REDO_FAST", "0")
    dec_slow = RedoSqlDecoder(tschema, "url", dead_dir=dd_slow)
    monkeypatch.setenv("LKC_REDO_FAST", "1")
    assert dec_fast._fast is not None and dec_slow._fast is None
    for _pass in range(2):  # pass 2 exercises the specialized tier
        a, b = dec_fast(t), dec_slow(t)
        assert a.schema.equals(b.schema)
        assert a.equals(b), f"pass {_pass}"
    assert dec_fast.fast_rows > 0 and dec_fast.fallback_rows > 0

    import glob

    da = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(f"{dd_fast}/*")]
    ).sort_by("scn")
    db = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(f"{dd_slow}/*")]
    ).sort_by("scn")
    assert da.equals(db)
    reasons = set(zip(da.column("scn").to_pylist(),
                      da.column("reason").to_pylist()))
    assert (108, "unknown_column") in reasons
    assert (109, "parse_error") in reasons
    assert (110, "convert_error") in reasons
    assert (111, "missing_key") in reasons
    assert (112, "empty_sql") in reasons


def test_fast_redo_zero_fallback_on_canonical():
    """The workload generator's canonical statements never hit the
    scalar fallback (the fallback counter is the perf regression
    canary for the flagship redo route)."""
    tschema = schemas.PAGES_SCHEMA
    dec = RedoSqlDecoder(tschema, "url")
    if dec._fast is None:
        pytest.skip("fast path disabled via LKC_REDO_FAST")
    sqls = [
        "insert into \"WEB\".\"PAGES\"(\"url\",\"warc_ts\",\"html\",\"text\","
        "\"lang\") values ('http://a', TO_TIMESTAMP('2024-01-01 00:00:00.000001',"
        " 'YYYY-MM-DD HH24:MI:SS.FF6'), HEXTORAW('ab12'), 'x', 'en')",
        "update \"WEB\".\"PAGES\" set \"text\" = 'u:1' where \"url\" = 'http://a'"
        " and ROWID = 'R1'",
        "delete from \"WEB\".\"PAGES\" where \"url\" = 'http://a'"
        " and ROWID = 'R2'",
    ] * 50
    t = _redo_log_table(sqls)
    out = dec(t)
    assert out.num_rows == len(sqls)
    assert dec.fallback_rows == 0
    assert dec.fast_rows == len(sqls)


def test_fast_hex_decode_unit():
    import numpy as np

    from logminer_kafka_connect_ray.functions.redo_fast import _hex_decode

    arr = pa.array(["deadbeef", "", "AB", None, "abc", "zz", "0102"])
    out, bad = _hex_decode(arr)
    assert out.to_pylist() == [
        b"\xde\xad\xbe\xef", b"", b"\xab", None, None, None, b"\x01\x02"
    ]
    assert list(bad) == [False, False, False, False, True, True, False]


def test_schema_default_backfill_routes(ray_session, tmp_path):
    """ADD-COLUMN-WITH-DEFAULT evolution (ChangingTableTest.kt:42-93):
    batch replay, streaming replay, and a post-evolution repartition
    all surface the DDL default on rows no committed update touched."""
    from logminer_kafka_connect_ray import workload
    from logminer_kafka_connect_ray.pipelines.streaming import StreamingEngine

    sf = "/root/testdata/sf0.001"
    d = workload.ensure_evolution_workload(sf)

    lake_b = str(tmp_path / "lake-batch")
    eng_b = Engine(EngineConfig(
        lake_dir=lake_b, num_partitions=4, changelog_format="redo_sql"
    ))
    eng_b.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    m = eng_b.replay(d["evolution"])
    assert m.defaults == {"rating": str(workload.EVOLUTION_DEFAULT)}
    tb = eng_b.to_arrow()
    assert "rating" in tb.column_names
    ratings = tb.column("rating").to_pylist()
    assert None not in ratings  # default backfill, never null
    assert workload.EVOLUTION_DEFAULT in ratings  # untouched rows
    assert any(r != workload.EVOLUTION_DEFAULT for r in ratings)  # updated

    # streaming route reaches the identical state + manifest defaults
    lake_s = str(tmp_path / "lake-stream")
    eng_s = Engine(EngineConfig(
        lake_dir=lake_s, num_partitions=4, changelog_format="redo_sql"
    ))
    eng_s.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    stream = StreamingEngine(
        eng_s, d["evolution"], num_shards=2, poll_interval=0.01
    )
    stream.run(max_polls=40)
    stream.shutdown()
    assert eng_s.store.load().defaults == m.defaults
    assert eng_s.to_arrow().equals(tb)

    # repartition carries defaults forward (prev=None path) and
    # physically materializes them; state is unchanged
    m2 = eng_b.repartition_lake(6)
    assert m2.defaults == m.defaults
    assert eng_b.to_arrow().equals(tb)


def test_rename_drop_column_policy(ray_session, tmp_path):
    """DDL rename/drop policy (reference tracks DDL in the redo
    dictionary, LogminerSession.kt:37-167; this engine's documented
    policy in stages/evolve.py):

    * RENAME old->new = add-new + keep-old with lineage fill: rows a
      committed statement never touched surface their old value under
      the new name; the old column stays queryable.
    * DROP = ignored-but-accounted: data intact, manifest records it.
    * Replay over a log containing the change neither crashes nor
      corrupts untouched columns.
    """
    import json

    from logminer_kafka_connect_ray import workload

    sf = "/root/testdata/sf0.001"
    d = workload.ensure_workload(sf)
    pages = pq.read_table(d["pages"])
    urls = pages.column("url").to_pylist()

    log_dir = str(tmp_path / "changelog")
    import os

    os.makedirs(log_dir)
    rows = []
    scn = workload.SNAPSHOT_SCN + 1

    def add(sql, op, tx, commit=None):
        nonlocal scn
        rows.append(
            {"scn": scn, "row_id": f"R{scn}", "commit_scn": commit,
             "tx_id": tx, "op": op, "ts_ms": None,
             "table": workload.TABLE_NAME, "username": None, "status": 0,
             "csf": 0, "sql_redo": sql}
        )
        scn += 1

    # pre-rename: update text on url[0] (old name, old column)
    add(f'update "WEB"."PAGES" set "text" = \'pre\' where "url" = \'{urls[0]}\'',
        "u", "t1")
    add(None, "commit", "t1", commit=scn)
    # post-rename: update body (new name) on url[1]; old-name statement
    # on url[2] still decodes (keep-old policy)
    add(f'update "WEB"."PAGES" set "body" = \'post\' where "url" = \'{urls[1]}\'',
        "u", "t2")
    add(f'update "WEB"."PAGES" set "text" = \'old-name\' where "url" = \'{urls[2]}\'',
        "u", "t2")
    add(None, "commit", "t2", commit=scn)
    tbl = pa.Table.from_pylist(rows, schema=REDO_SQL_SCHEMA)
    pq.write_table(
        tbl, os.path.join(log_dir, f"batch-{rows[0]['scn']:012d}-{scn:012d}.parquet")
    )
    with open(os.path.join(log_dir, "_catalog.json"), "w") as f:
        json.dump({"renames": {"text": "body"}, "dropped": ["lang"]}, f)

    eng = Engine(EngineConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        changelog_format="redo_sql",
    ))
    eng.snapshot(d["pages"], workload.SNAPSHOT_SCN)
    m = eng.replay(log_dir)
    assert m.renames == {"text": "body"}
    assert m.dropped == ["lang"]

    t = eng.to_arrow()
    assert "body" in t.column_names and "text" in t.column_names
    assert "lang" in t.column_names  # drop is accounting-only
    state = {r["url"]: r for r in t.to_pylist()}
    base = {r["url"]: r for r in pages.to_pylist()}
    # untouched url[3]: body surfaces the old text value (lineage fill),
    # everything else byte-identical to base
    assert state[urls[3]]["body"] == base[urls[3]]["text"]
    assert state[urls[3]]["text"] == base[urls[3]]["text"]
    assert state[urls[3]]["lang"] == base[urls[3]]["lang"]
    assert state[urls[3]]["html"] == base[urls[3]]["html"]
    # url[0]: old-name update applied to text; the rename's lineage
    # copy is the value at the START of the discovering micro-batch
    # (catalog DDL has no SCN, so it cannot interleave with the
    # batch's own statements -- documented in catalog_renames)
    assert state[urls[0]]["text"] == "pre"
    assert state[urls[0]]["body"] == base[urls[0]]["text"]
    # url[1]: post-rename new-name update applied to body; text keeps
    # its old value (keep-old)
    assert state[urls[1]]["body"] == "post"
    assert state[urls[1]]["text"] == base[urls[1]]["text"]
    # url[2]: old-name statement post-rename still decodes
    assert state[urls[2]]["text"] == "old-name"
    # no corruption anywhere: lang column equals base for all rows
    assert all(state[u]["lang"] == base[u]["lang"] for u in urls)


def test_redo_derive_chunking_byte_identical(tmp_path, monkeypatch):
    """The txn-aligned chunked generation (32-bit-offset overflow fix
    for replicate>=150) emits byte-identical files to the monolithic
    build: same names, same per-file tables."""
    import pyarrow.parquet as _pq

    from logminer_kafka_connect_ray import workload

    sf = "/root/testdata/sf0.001"
    mono = str(tmp_path / "mono")
    chunked = str(tmp_path / "chunked")
    # small files so a run produces several; replicate=3 for >1 chunk
    workload.derive_changelog_redo_sql(
        sf, mono, events_per_file=500, replicate=3
    )
    # chunk = 10 files' worth, txn-aligned (5000 % TXN_SIZE == 0)
    monkeypatch.setattr(workload, "REDO_DERIVE_CHUNK_EVENTS", 5000)
    workload.derive_changelog_redo_sql(
        sf, chunked, events_per_file=500, replicate=3
    )
    import os as _os

    a, b = sorted(_os.listdir(mono)), sorted(_os.listdir(chunked))
    assert a == b and len(a) > 2
    for f in a:
        ta = _pq.read_table(f"{mono}/{f}")
        tb = _pq.read_table(f"{chunked}/{f}")
        assert ta.equals(tb), f


def test_number_as_string_catalog_mapping(ray_session, tmp_path):
    """The string-typed fallback for numeric ranges Arrow decimals
    cannot hold (reference carries unqualified NUMBER as Decimal(79,40)
    BigDecimal, ColumnSchemaBuilder.kt:18-19/80-86; Oracle NUMBER
    reaches ~1e126): a catalog column declared {"type": "NUMBER",
    "as_string": true} types as string, and a 41-digit literal lands
    VERBATIM in the final state with ZERO dead letters -- vs the
    default pinned behavior where magnitudes > 1e36 route to dead
    letters as convert_error."""
    import json

    from logminer_kafka_connect_ray.testing.gen import REDO_SQL_SCHEMA

    pages = gen_pages(10)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    url = pages.column("url")[0].as_py()
    big = "9" * 41  # far beyond decimal256(76, 40)'s 1e36 integer cap
    rows = [
        {"scn": 1001, "row_id": "AAAx1001", "commit_scn": None,
         "tx_id": "tx0", "op": "u", "ts_ms": 0, "table": "WEB.PAGES",
         "username": "WEBCRAWL", "status": 0, "csf": 0,
         "sql_redo": f'update "WEB"."PAGES" set "big" = {big} '
                     f"where \"url\" = '{url}' and ROWID = 'AAAx1001'"},
        {"scn": 1002, "row_id": "AAAx1002", "commit_scn": 1002,
         "tx_id": "tx0", "op": "commit", "ts_ms": 0, "table": "WEB.PAGES",
         "username": "WEBCRAWL", "status": 0, "csf": 0, "sql_redo": None},
    ]
    changelog = str(tmp_path / "changelog")
    import os

    os.makedirs(changelog)
    pq.write_table(
        pa.Table.from_pylist(rows, schema=REDO_SQL_SCHEMA),
        f"{changelog}/batch-000000001001-000000001002.parquet",
    )
    with open(f"{changelog}/_catalog.json", "w") as f:
        json.dump(
            {"columns": {"big": {"type": "NUMBER", "as_string": True}}}, f
        )

    eng = Engine(
        EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2,
                     changelog_format="redo_sql")
    )
    eng.snapshot(pages_path, 999)
    m = eng.replay(changelog)
    assert m.metrics["dead_letters"] == 0, m.metrics
    t = eng.to_arrow()
    assert t.schema.field("big").type == pa.string()
    got = {r["url"]: r["big"] for r in t.to_pylist()}
    assert got[url] == big
    assert all(v is None for u, v in got.items() if u != url)
