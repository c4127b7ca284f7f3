"""Property-based tests (hypothesis): redo-literal round trips.

The M2 conversion path must invert the literal rendering the redo log
applies: render(value) -> convert(literal) == value for every type the
engine supports, across the value space -- the property the reference
pins with hand-picked cases (BigDecimalTypeTest, TimezoneTest,
Issue8/14) generalized.
"""

import datetime as dt
import decimal

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from logminer_kafka_connect_ray.testing.gen import _sql_literal
from logminer_kafka_connect_ray.types import resolve_type


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(10**17), max_value=10**17))
def test_int_literal_roundtrip(v):
    t = resolve_type("NUMBER(18)")
    assert t.convert(_sql_literal(v) if abs(v) <= 10_000_000_000 else str(v)) == v


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_string_literal_roundtrip(s):
    t = resolve_type("VARCHAR2")
    assert t.convert(_sql_literal(s)) == s


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_binary_hextoraw_roundtrip(b):
    t = resolve_type("BLOB")
    lit = _sql_literal(b)  # HEXTORAW('...')
    assert lit.startswith("HEXTORAW('")
    assert t.convert(lit[len("HEXTORAW('"):-2]) == b


@settings(max_examples=200, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(1970, 1, 2),
        max_value=dt.datetime(2100, 1, 1),
    )
)
def test_timestamp_literal_roundtrip(v):
    t = resolve_type("TIMESTAMP(6)")
    lit = v.strftime("%Y-%m-%d %H:%M:%S.%f")
    got = t.convert(lit)
    assert got == v.replace(tzinfo=dt.timezone.utc)


@settings(max_examples=200, deadline=None)
@given(
    st.decimals(
        min_value=decimal.Decimal("-99999.9999"),
        max_value=decimal.Decimal("99999.9999"),
        places=4,
        allow_nan=False,
        allow_infinity=False,
    )
)
def test_decimal_scale_roundtrip(v):
    t = resolve_type("NUMBER(24,4)")
    got = t.convert(str(v))
    assert got == v
    assert -got.as_tuple().exponent == 4


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(10**9), max_value=10**9))
def test_convert_array_matches_scalar_int(v):
    t = resolve_type("NUMBER(18)")
    arr = t.convert_array(pa.array([str(v), "NULL"]))
    assert arr.to_pylist() == [v, None]
