"""Type-system conformance tests.

Mirror of the reference's unit suites: SchemaServiceTest.kt:89-197
(type-string -> schema mapping incl. defaults), BigDecimalTypeTest
.kt:18-52 (decimal scale normalization), TimezoneTest /
TimestampWith{,Local}TimezoneTest (the three timestamp flavors under a
non-UTC db timezone), issues/Issue8Test.kt:51-82 (unqualified NUMBER).
"""

import datetime as dt
import decimal

import pyarrow as pa
import pytest

from logminer_kafka_connect_ray.types import (
    UNQUALIFIED_NUMBER_PRECISION,
    UNQUALIFIED_NUMBER_SCALE,
    resolve_type,
)


# --- mapping table (SchemaServiceTest / ColumnSchemaBuilder dispatch) ---
@pytest.mark.parametrize(
    "decl,prec,scale,expected",
    [
        ("NUMBER(2)", None, None, pa.int8()),
        ("NUMBER(4)", None, None, pa.int16()),
        ("NUMBER(8)", None, None, pa.int32()),       # FIXTURES F4 id col
        ("NUMBER(9)", None, None, pa.int32()),
        ("NUMBER(14)", None, None, pa.int64()),
        ("NUMBER(18)", None, None, pa.int64()),
        ("NUMBER", 7, 0, pa.int32()),                # catalog-supplied p/s
        ("BINARY_FLOAT", None, None, pa.float32()),
        ("BINARY_DOUBLE", None, None, pa.float64()),
        ("NUMBER(10,2)", None, None, pa.float64()),  # p<19, s>0 -> double
        ("NUMBER(20,2)", None, None, pa.decimal128(20, 2)),
        ("NUMBER(38,10)", None, None, pa.decimal128(38, 10)),
        ("NUMBER(40,10)", None, None, pa.decimal256(40, 10)),
        # negative scale -84..0 with p<19 -> integer tier by precision
        # (ColumnSchemaBuilder.kt:214-231, e.g. NUMBER(5,-2) -> Int)
        ("NUMBER(10,-2)", None, None, pa.int64()),
        ("VARCHAR2", None, None, pa.string()),
        ("NVARCHAR2", None, None, pa.string()),
        ("CLOB", None, None, pa.string()),
        ("NCLOB", None, None, pa.string()),
        ("LONG", None, None, pa.string()),
        ("CHAR", None, None, pa.string()),
        ("DATE", None, None, pa.date32()),
        ("TIMESTAMP", None, None, pa.timestamp("us", tz="UTC")),
        ("TIMESTAMP(6)", None, None, pa.timestamp("us", tz="UTC")),
        ("TIMESTAMP(3) WITH TIME ZONE", None, None, pa.timestamp("us", tz="UTC")),
        ("TIMESTAMP WITH LOCAL TIME ZONE", None, None, pa.timestamp("us", tz="UTC")),
    ],
)
def test_type_mapping(decl, prec, scale, expected):
    assert resolve_type(decl, prec, scale).arrow == expected


def test_unqualified_number_is_wide_decimal():
    """Issue8Test: unqualified NUMBER survives as a big decimal."""
    t = resolve_type("NUMBER")
    assert t.arrow == pa.decimal256(
        UNQUALIFIED_NUMBER_PRECISION, UNQUALIFIED_NUMBER_SCALE
    )
    v = t.convert("123.5")
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        assert v == decimal.Decimal("123.5").quantize(
            decimal.Decimal(1).scaleb(-UNQUALIFIED_NUMBER_SCALE)
        )
    assert -v.as_tuple().exponent == UNQUALIFIED_NUMBER_SCALE


def test_unsupported_type_raises():
    with pytest.raises(ValueError):
        resolve_type("BFILE")


# --- literal conversion (SchemaType.convert) ---------------------------
def test_null_literal():
    assert resolve_type("VARCHAR2").convert("NULL") is None
    assert resolve_type("NUMBER(8)").convert(None) is None


def test_string_unquote():
    t = resolve_type("VARCHAR2")
    assert t.convert("'hello'") == "hello"
    assert t.convert("'it''s'") == "it's"


def test_int_conversion():
    assert resolve_type("NUMBER(8)").convert("42") == 42
    assert resolve_type("NUMBER(4)").convert("'7'") == 7


def test_decimal_scale_normalization():
    """BigDecimalTypeTest.kt:18-52: values rescale to the column scale."""
    t = resolve_type("NUMBER(20,4)")
    v = t.convert("12.5")
    assert v == decimal.Decimal("12.5000")
    assert -v.as_tuple().exponent == 4


def test_date_midnight():
    """ColumnSchemaBuilder.kt:109-128: DATE parses date and date-time
    forms, value is the date (midnight)."""
    t = resolve_type("DATE")
    assert t.convert("2024-03-05") == dt.date(2024, 3, 5)
    assert t.convert("'2024-03-05 13:45:00'") == dt.date(2024, 3, 5)


# --- the three timestamp flavors under a non-UTC db timezone -----------
def test_timestamp_without_tz_uses_db_timezone():
    """TimezoneTest: unzoned literal interpreted in db.timezone."""
    t = resolve_type("TIMESTAMP", db_timezone="Europe/Berlin")
    v = t.convert("2021-01-01 12:00:00")
    assert v == dt.datetime(2021, 1, 1, 11, 0, tzinfo=dt.timezone.utc)


def test_timestamp_with_tz_named_zone():
    """TimestampWithTimezoneTest: `... VV` form with a region zone."""
    t = resolve_type("TIMESTAMP WITH TIME ZONE")
    v = t.convert("2021-06-01 12:00:00 Europe/Berlin")
    assert v == dt.datetime(2021, 6, 1, 10, 0, tzinfo=dt.timezone.utc)


def test_timestamp_with_local_tz_offset():
    """TimestampWithLocalTimezoneTest: `... xxx` offset form."""
    t = resolve_type("TIMESTAMP WITH LOCAL TIME ZONE")
    v = t.convert("2021-06-01 12:00:00 +02:00")
    assert v == dt.datetime(2021, 6, 1, 10, 0, tzinfo=dt.timezone.utc)


def test_explicit_offset_wins_over_db_timezone():
    """An ISO-attached offset in the literal must NOT be overwritten by
    the configured db timezone -- even when the column resolved as
    unzoned (e.g. via column_type_for_arrow, which loses the Oracle
    flavor)."""
    from logminer_kafka_connect_ray.types import column_type_for_arrow

    t = column_type_for_arrow(pa.timestamp("us", tz="UTC"), db_timezone="UTC")
    assert not t.zoned
    v = t.convert("2020-09-24 10:11:26.684+02:00")
    assert v == dt.datetime(
        2020, 9, 24, 8, 11, 26, 684000, tzinfo=dt.timezone.utc
    )


def test_region_zone_with_abbreviation_on_unzoned_column():
    """The reference TimestampWithTimezone 'VV [zzz]' form
    ('... US/Pacific PDT') parses instead of crashing, on both zoned
    and unzoned-resolved columns."""
    from logminer_kafka_connect_ray.types import column_type_for_arrow

    want = dt.datetime(2020, 1, 27, 14, 0, 0, 640000, tzinfo=dt.timezone.utc)
    z = resolve_type("TIMESTAMP WITH TIME ZONE")
    assert z.convert("2020-01-27 06:00:00.640000 US/Pacific PDT") == want
    u = column_type_for_arrow(pa.timestamp("us", tz="UTC"))
    assert u.convert("2020-01-27 06:00:00.640000 US/Pacific PDT") == want


def test_convert_array_fractional_and_offset_fallback():
    """The vectorized timestamp path falls back to the tolerant scalar
    parser for fractional seconds / explicit offsets."""
    t = resolve_type("TIMESTAMP", db_timezone="UTC")
    arr = t.convert_array(
        pa.array(["2021-01-01 12:00:00.500", "2021-01-01 12:00:00+02:00", "NULL"])
    )
    got = arr.to_pylist()
    assert got[0] == dt.datetime(2021, 1, 1, 12, 0, 0, 500000, tzinfo=dt.timezone.utc)
    assert got[1] == dt.datetime(2021, 1, 1, 10, 0, tzinfo=dt.timezone.utc)
    assert got[2] is None


def test_negative_scale_number_maps_to_int_tier():
    """ColumnSchemaBuilder.kt:214-231: scale -84..0 with p<19 routes to
    the integer tier chosen by precision (NUMBER(5,-2) -> int32)."""
    assert resolve_type("NUMBER(5,-2)").arrow == pa.int32()
    assert resolve_type("NUMBER(2,-1)").arrow == pa.int8()
    assert resolve_type("NUMBER(18,-3)").arrow == pa.int64()
    # s < -84 or p >= 19 still lands in decimal
    assert resolve_type("NUMBER(20,-2)").kind == "decimal"


# --- default-literal conversion (convertDefaultValue) ------------------
def test_default_unwrapping():
    assert resolve_type("VARCHAR2").convert_default("'abc'") == "abc"
    assert resolve_type("NUMBER(8)").convert_default("0 ") == 0
    assert resolve_type("DATE").convert_default("DATE '2020-01-02'") == dt.date(2020, 1, 2)
    ts = resolve_type("TIMESTAMP").convert_default("TIMESTAMP '2020-01-02 03:04:05'")
    assert ts == dt.datetime(2020, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc)


@pytest.mark.parametrize(
    "expr", ["SYSDATE", "SYSTIMESTAMP", "CURRENT_TIMESTAMP", "sysdate "]
)
def test_unresolvable_datetime_defaults_null(expr):
    """ColumnSchemaBuilder.kt:23-29: SYSDATE-family defaults -> null."""
    assert resolve_type("DATE").convert_default(expr) is None
    assert resolve_type("TIMESTAMP").convert_default(expr) is None


# --- vectorized batch conversion --------------------------------------
def test_convert_array_matches_scalar():
    t = resolve_type("NUMBER(9)")
    arr = pa.array(["1", "NULL", "'3'", None])
    out = t.convert_array(arr)
    assert out.to_pylist() == [1, None, 3, None]

    ts = resolve_type("TIMESTAMP", db_timezone="Europe/Berlin")
    arr = pa.array(["2021-01-01 12:00:00", "NULL"])
    out = ts.convert_array(arr)
    assert out.type == pa.timestamp("us", tz="UTC")
    assert out[0].as_py() == dt.datetime(2021, 1, 1, 11, 0, tzinfo=dt.timezone.utc)
    assert out[1].as_py() is None


def test_decimal_overflow_pinned():
    """PINNED divergence vs the reference's Decimal(79,40)
    (ColumnSchemaBuilder.kt:18-19): Arrow decimal256 caps precision at
    76, so unqualified-NUMBER magnitudes above 1e36 raise
    decimal.InvalidOperation (an ArithmeticError) from the quantize --
    the decoder's M5 conversion-failure path routes them to dead
    letters as convert_error.  Explicit skip-with-accounting; the
    engine can never emit a silently wrong value for them."""
    import decimal

    t = resolve_type("NUMBER")
    assert t.arrow == pa.decimal256(76, 40)
    # at the cap: exact round-trip
    ok = t.convert(f"'{'9' * 36}'")
    assert str(ok).startswith("9" * 36)
    assert pa.array([ok], t.arrow)[0].as_py() == ok
    # above the cap: explicit error (caught as ArithmeticError by the
    # redo decoder -> dead letter), NOT a wrong value
    for bad in ("9" * 37, "-" + "9" * 37, "1E+40"):
        with pytest.raises(decimal.InvalidOperation):
            t.convert(f"'{bad}'")
    assert issubclass(decimal.InvalidOperation, ArithmeticError)
