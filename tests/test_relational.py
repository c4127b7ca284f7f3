"""Schema genericity: the engine over a reference-shaped relational
table (FIXTURES.md F4, port of initTestTable.sql TEST_TAB) -- integer
primary key, decimal / date / timestamp columns -- not just the
web-page table.
"""

import datetime as dt
import decimal

import pyarrow as pa
import pyarrow.parquet as pq

from logminer_kafka_connect_ray import EngineConfig, schemas
from logminer_kafka_connect_ray.pipelines.engine import Engine

TEST_TAB = pa.schema(
    [
        ("id", pa.int32()),                      # NUMBER(8) PK
        ("time", pa.timestamp("us", tz="UTC")),  # TIMESTAMP
        ("string", pa.string()),                 # VARCHAR2(255)
        ("long", pa.int64()),                    # NUMBER(14)
        ("date", pa.date32()),                   # DATE
        ("big_decimal", pa.decimal128(20, 4)),   # NUMBER(20,4)
    ]
)

TS = lambda s: dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc)
DEC = lambda s: decimal.Decimal(s)


def base_rows():
    return [
        {"id": 1, "time": TS("2024-01-01T10:00:00"), "string": "one",
         "long": 100, "date": dt.date(2024, 1, 1), "big_decimal": DEC("1.5000")},
        {"id": 2, "time": TS("2024-01-02T10:00:00"), "string": "two",
         "long": 200, "date": dt.date(2024, 1, 2), "big_decimal": DEC("2.5000")},
        {"id": 3, "time": TS("2024-01-03T10:00:00"), "string": "three",
         "long": 300, "date": dt.date(2024, 1, 3), "big_decimal": DEC("3.5000")},
    ]


def make_events():
    """insert id=4; partial update id=2 (set string, big_decimal);
    delete id=3; rolled-back update of id=1."""
    img = lambda **kw: kw

    def ev(scn, op, tx, before=None, after=None, set_cols=None):
        return {
            "scn": scn, "row_id": f"R{scn:04d}", "commit_scn": None,
            "tx_id": tx, "op": op, "ts_ms": scn * 1000,
            "table": "S.TEST_TAB", "username": "U", "status": 0,
            "before": before, "after": after, "set_cols": set_cols,
        }

    def marker(scn, op, tx):
        m = ev(scn, op, tx)
        m["commit_scn"] = scn
        return m

    rows = [
        ev(1001, "i", "t1", after=img(
            id=4, time=TS("2024-02-01T00:00:00"), string="four",
            long=400, date=dt.date(2024, 2, 1), big_decimal=DEC("4.5000"))),
        ev(1002, "u", "t2",
           before=img(id=2, time=TS("2024-01-02T10:00:00"), string="two",
                      long=200, date=dt.date(2024, 1, 2),
                      big_decimal=DEC("2.5000")),
           after=img(id=2, time=None, string="TWO", long=None, date=None,
                     big_decimal=DEC("22.2200"))),
        ev(1003, "d", "t1",
           before=img(id=3, time=TS("2024-01-03T10:00:00"), string="three",
                      long=300, date=dt.date(2024, 1, 3),
                      big_decimal=DEC("3.5000"))),
        ev(1004, "u", "t3",  # rolled back -> must not apply
           before=img(id=1, time=TS("2024-01-01T10:00:00"), string="one",
                      long=100, date=dt.date(2024, 1, 1),
                      big_decimal=DEC("1.5000")),
           after=img(id=1, time=None, string="SHOULD NOT APPLY", long=None,
                     date=None, big_decimal=None)),
        marker(1005, "commit", "t1"),
        marker(1006, "commit", "t2"),
        marker(1007, "rollback", "t3"),
    ]
    return rows


def write_events(rows, path):
    ev_schema = schemas.change_event_schema(TEST_TAB)

    def fix(img):
        if img is None:
            return None
        return {f.name: img.get(f.name) for f in TEST_TAB}

    plain = [
        {**r, "before": fix(r["before"]), "after": fix(r["after"])}
        for r in rows
    ]
    pq.write_table(pa.Table.from_pylist(plain, schema=ev_schema), path)


def test_relational_table_replay(ray_session, tmp_path):
    base = pa.Table.from_pylist(base_rows(), schema=TEST_TAB)
    base_path = str(tmp_path / "test_tab.parquet")
    pq.write_table(base, base_path)
    changelog = str(tmp_path / "changelog")
    import os

    os.makedirs(changelog)
    write_events(make_events(), f"{changelog}/batch-000000001001-000000001007.parquet")

    eng = Engine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            num_partitions=3,
            key_column="id",
            data_columns=("time", "string", "long", "date", "big_decimal"),
        )
    )
    eng.snapshot(base_path, 999)
    eng.replay(changelog)
    got = {r["id"]: r for r in eng.to_arrow().to_pylist()}

    assert set(got) == {1, 2, 4}          # 3 deleted, 4 inserted
    # rolled-back txn not applied
    assert got[1]["string"] == "one" and got[1]["big_decimal"] == DEC("1.5000")
    # partial update: set columns changed, others coalesced
    assert got[2]["string"] == "TWO"
    assert got[2]["big_decimal"] == DEC("22.2200")
    assert got[2]["long"] == 200
    assert got[2]["time"] == TS("2024-01-02T10:00:00")
    assert got[2]["date"] == dt.date(2024, 1, 2)
    # insert fully typed
    assert got[4]["big_decimal"] == DEC("4.5000")
    assert got[4]["date"] == dt.date(2024, 2, 1)
    assert got[4]["time"] == TS("2024-02-01T00:00:00")
