"""Column type system: source type declarations -> Arrow types +
literal converters.

Re-expresses the reference's ``SchemaType`` hierarchy
(``ColumnSchemaBuilder.kt:30-259``) -- the mapping from Oracle column
declarations to schema types, and the three scalar conversions each
type supports:

* ``convert(str)``        -- redo-SQL literal -> typed value  (:32)
* ``extract``             -- snapshot value -> typed value    (:33)
  (here: Arrow cast of a snapshot column)
* ``convert_default(str)``-- DDL default literal -> typed value (:34),
  with ``'...'`` / ``DATE '...'`` / ``TIMESTAMP '...'`` unwrapping and
  SYSDATE-family unresolvables -> None (:23-29, 97-107)

Type mapping parity (dispatch ``ColumnSchemaBuilder.kt:201-257``):

| Oracle                          | Arrow              | ref lines |
|---------------------------------|--------------------|-----------|
| NUMBER(p<=2, -84<=s<=0)         | int8               | :38-43    |
| NUMBER(p<=4, -84<=s<=0)         | int16              | :45-50    |
| NUMBER(p<=9, -84<=s<=0)         | int32              | :52-57    |
| NUMBER(p<=18, -84<=s<=0)        | int64              | :59-64    |
| BINARY_FLOAT                    | float32            | :66-71    |
| BINARY_DOUBLE / NUMBER(p<19,s>0)| float64            | :73-78    |
| NUMBER(p>=19)                   | decimal(p, s)      | :80-86    |
| NUMBER (unqualified)            | decimal256(76, 40)* | :18-19   |

*The reference uses Decimal(79, 40); Arrow decimal256 caps precision
at 76, so magnitudes above 1e36 (Oracle NUMBER reaches ~1e126 at 38
significant digits) overflow here -- an intentional, documented
divergence.
| CHAR/VARCHAR2/CLOB/...          | string             | :89-95    |
| DATE                            | date32 (midnight)  | :109-128  |
| TIMESTAMP(n)                    | timestamp[us, cfg tz] | :159-181 |
| TIMESTAMP WITH TIME ZONE        | timestamp[us, UTC] | :182-188  |
| TIMESTAMP WITH LOCAL TIME ZONE  | timestamp[us, UTC] | :189-194  |
| anything else                   | ValueError         | :253-255  |

Vectorized batch converters (Arrow kernels) are provided for the hot
path; scalar ``convert`` mirrors the reference's per-literal semantics
for tests and defaults.
"""

from __future__ import annotations

import datetime as dt
import decimal
import re
from dataclasses import dataclass
from zoneinfo import ZoneInfo

import pyarrow as pa
import pyarrow.compute as pc

#: reference UNRESOLVABLE_DATE_TIME_EXPRESSIONS (ColumnSchemaBuilder.kt:23-29)
UNRESOLVABLE_DATETIME_DEFAULTS = (
    "SYSDATE", "SYSTIMESTAMP", "CURRENT_DATE", "CURRENT_TIMESTAMP",
    "LOCALTIMESTAMP", "DBTIMESTAMP",
)

#: redo-SQL NULL literal sentinel (LogminerRow.kt:117-118,
#: LogminerSchema.NULL_VALUE)
NULL_LITERAL = "NULL"

#: unqualified NUMBER precision/scale.  The reference uses
#: Decimal(precision=79, scale=40) (ColumnSchemaBuilder.kt:18-19);
#: Arrow decimal256 caps precision at 76, so we clamp.  PINNED
#: divergence behavior (round-3; test_types.py::test_decimal_overflow
#: _pinned): with scale 40, integer magnitudes above 1e36 raise
#: ``decimal.InvalidOperation`` from the quantize (context precision
#: 76), which the redo decoder catches as a conversion failure and
#: ROUTES TO DEAD LETTERS (reason ``convert_error``) -- an explicit
#: skip-with-accounting, never a silently wrong value.  Values at or
#: below 1e36 round-trip exactly.  (Oracle NUMBER reaches ~1e126 at
#: 38 significant digits; a source actually using that range opts
#: into the lossless string-typed mapping: declare the column as
#: ``{"type": "NUMBER", "as_string": true}`` in the ``_catalog.json``
#: sidecar -- stages/evolve.py catalog_fields -- and the literal text
#: lands verbatim in a string column, no dead letter.)
UNQUALIFIED_NUMBER_PRECISION = 76
UNQUALIFIED_NUMBER_SCALE = 40

_STRING_ORACLE_TYPES = {
    "CHAR", "VARCHAR", "VARCHAR2", "NVARCHAR2", "CLOB", "NCLOB", "LONG", "NCHAR",
}

_TS_RE = re.compile(r"^TIMESTAMP(?:\((\d+)\))?( WITH(?: LOCAL)? TIME ZONE)?$")
_NUMBER_RE = re.compile(r"^NUMBER(?:\((\d+|\*)(?:\s*,\s*(-?\d+))?\))?$")


@dataclass(frozen=True)
class ColumnType:
    """A resolved column type: Arrow type + conversion semantics."""

    arrow: pa.DataType
    kind: str                    # int/float/decimal/string/date/timestamp
    scale: int | None = None
    precision: int | None = None
    #: timezone the *unzoned* literal is interpreted in (reference
    #: `db.timezone` config, TimestampWithoutTimezone,
    #: ColumnSchemaBuilder.kt:159-181)
    tz: str = "UTC"
    zoned: bool = False          # literal carries its own zone/offset

    # -- scalar conversions (reference SchemaType.convert) ------------
    def convert(self, literal: str | None):
        """Redo-SQL literal string -> typed python value."""
        if literal is None or literal == NULL_LITERAL:
            return None
        s = literal
        if self.kind == "string":
            return _unquote(s)
        s = _unquote(s)
        if self.kind == "int":
            return int(decimal.Decimal(s))
        if self.kind == "float":
            return float(s)
        if self.kind == "decimal":
            d = decimal.Decimal(s)
            # scale normalization (BigDecimalType, reference
            # BigDecimalTypeTest.kt:18-52: value rescaled to the
            # column scale)
            with decimal.localcontext() as ctx:
                ctx.prec = max(self.precision or 38, 50)
                return d.quantize(
                    decimal.Decimal(1).scaleb(-self.scale),
                    rounding=decimal.ROUND_HALF_UP,
                )
        if self.kind == "binary":
            # HEXTORAW('...') literals arrive as hex strings
            return bytes.fromhex(s)
        if self.kind == "date":
            # `yyyy-MM-dd[ HH:mm:ss]` -> date at midnight UTC
            # (ColumnSchemaBuilder.kt:109-128)
            return dt.datetime.strptime(s[:10], "%Y-%m-%d").date()
        if self.kind == "timestamp":
            return self._parse_ts(s)
        raise ValueError(f"unsupported kind {self.kind}")

    def _parse_ts(self, s: str) -> dt.datetime:
        """Timestamp literal -> aware UTC datetime.

        One tolerant parser for all three reference flavors
        (ColumnSchemaBuilder.kt:159-194): an explicit offset in the
        literal (TSTZ `...+02:00` / TSLTZ `xxx` form) always wins; a
        region-zone form (`... US/Pacific [PDT]`, the reference's
        `VV [zzz]` pattern) resolves via ZoneInfo; only a bare literal
        is interpreted in the configured db timezone.  The ``zoned``
        flag is a flavor hint, not a gate -- a TSTZ column replayed
        through an Arrow-derived schema (``column_type_for_arrow``
        loses the Oracle flavor) still converts correctly because the
        literal itself carries the zone.
        """
        try:
            base = dt.datetime.fromisoformat(s.replace(" ", "T", 1))
        except ValueError:
            base = None
        if base is not None:
            if base.tzinfo is None:
                # bare literal: interpret in db tz (never overwrite an
                # explicit offset -- fromisoformat already captured it)
                base = base.replace(tzinfo=ZoneInfo(self.tz))
            return base.astimezone(dt.timezone.utc)
        # `yyyy-MM-dd HH:mm:ss[.f] VV [zzz]` region form
        m = re.match(
            r"^(\d{4}-\d{2}-\d{2})[ T](\d{2}:\d{2}:\d{2}(?:\.\d+)?)\s+(.+)$", s
        )
        if not m:
            raise ValueError(f"bad timestamp literal: {s!r}")
        naive = dt.datetime.fromisoformat(f"{m.group(1)}T{m.group(2)}")
        zone = m.group(3).split()[0]
        if re.match(r"^[+-]\d{2}:\d{2}$", zone):
            sign = 1 if zone[0] == "+" else -1
            hh, mm = int(zone[1:3]), int(zone[4:6])
            off = dt.timezone(sign * dt.timedelta(hours=hh, minutes=mm))
            return naive.replace(tzinfo=off).astimezone(dt.timezone.utc)
        return naive.replace(tzinfo=ZoneInfo(zone)).astimezone(dt.timezone.utc)

    def convert_default(self, literal: str | None):
        """DDL default literal -> typed value (SchemaType
        .convertDefaultValue, ColumnSchemaBuilder.kt:91-107)."""
        if literal is None:
            return None
        s = literal.strip()
        if s.upper() == NULL_LITERAL:
            return None
        if self.kind in ("date", "timestamp"):
            for expr in UNRESOLVABLE_DATETIME_DEFAULTS:
                if expr in s.upper():
                    return None  # SYSDATE-style -> unresolvable -> null
            s = re.sub(r"^(DATE|TIMESTAMP)\s+", "", s, flags=re.I)
        return self.convert(s.strip())

    # -- vectorized conversion (the hot path) -------------------------
    def convert_array(self, arr: pa.Array | pa.ChunkedArray):
        """String array of literals -> typed Arrow array (batch analog
        of per-literal convert; pyarrow kernels)."""
        s = pc.cast(arr, pa.string())
        null_mask = pc.equal(s, NULL_LITERAL)
        s = pc.if_else(null_mask, pa.nulls(len(arr), pa.string()), s)
        s = pc.replace_substring_regex(s, pattern="^'(.*)'$", replacement=r"\1")
        if self.kind in ("int", "float", "decimal"):
            return pc.cast(s, self.arrow)
        if self.kind == "date":
            ts = pc.strptime(pc.utf8_slice_codeunits(s, 0, 10), format="%Y-%m-%d", unit="s")
            return pc.cast(ts, pa.date32())
        if self.kind == "timestamp" and not self.zoned:
            try:
                ts = pc.strptime(s, format="%Y-%m-%d %H:%M:%S", unit="us")
                ts = pc.assume_timezone(ts, self.tz)
                return pc.cast(ts, self.arrow)
            except pa.ArrowInvalid:
                # fractional seconds / explicit offsets / region zones:
                # per-value tolerant parser (_parse_ts)
                pass
        if self.kind == "string":
            return s
        # binary (hex) / zoned timestamps: scalar path
        return pa.array([self.convert(v) for v in s.to_pylist()], self.arrow)


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        return s[1:-1].replace("''", "'")
    return s


def resolve_type(
    decl: str,
    precision: int | None = None,
    scale: int | None = None,
    db_timezone: str = "UTC",
) -> ColumnType:
    """Oracle type declaration -> ColumnType.

    ``decl`` is the type name (e.g. ``NUMBER(8)``, ``TIMESTAMP(3) WITH
    TIME ZONE``, ``VARCHAR2``); precision/scale may also come from the
    catalog columns (SchemaService.kt:60-66).  Unsupported declarations
    raise ValueError (ColumnSchemaBuilder.kt:253-255).
    """
    d = decl.strip().upper()

    m = _NUMBER_RE.match(d)
    if m or d == "NUMBER":
        if m and m.group(1) and m.group(1) != "*":
            precision = int(m.group(1))
            scale = int(m.group(2)) if m.group(2) is not None else 0
        if precision is None:
            # unqualified NUMBER -> Decimal(79, 40)
            # (ColumnSchemaBuilder.kt:18-19, 209-213; Issue8Test)
            return ColumnType(
                pa.decimal256(UNQUALIFIED_NUMBER_PRECISION, UNQUALIFIED_NUMBER_SCALE),
                "decimal",
                scale=UNQUALIFIED_NUMBER_SCALE,
                precision=UNQUALIFIED_NUMBER_PRECISION,
            )
        scale = scale or 0
        if -84 <= scale <= 0 and precision <= 18:
            # integer tiers chosen by precision; the reference routes
            # NEGATIVE scale (-84..0) with p<19 here too, e.g.
            # NUMBER(5,-2) -> Int (ColumnSchemaBuilder.kt:214-231)
            if precision <= 2:
                return ColumnType(pa.int8(), "int")
            if precision <= 4:
                return ColumnType(pa.int16(), "int")
            if precision <= 9:
                return ColumnType(pa.int32(), "int")
            return ColumnType(pa.int64(), "int")
        if 0 < scale and precision < 19:
            # NUMBER(p<19, s>0) -> float64 (ColumnSchemaBuilder.kt:232)
            return ColumnType(pa.float64(), "float")
        # big / negative-scale decimals (ColumnSchemaBuilder.kt:234-240)
        eff_scale = max(scale, 0)
        eff_prec = precision + max(-scale, 0)
        arrow = (
            pa.decimal256(eff_prec, eff_scale)
            if eff_prec > 38
            else pa.decimal128(eff_prec, eff_scale)
        )
        return ColumnType(arrow, "decimal", scale=eff_scale, precision=eff_prec)

    if d == "BINARY_FLOAT":
        return ColumnType(pa.float32(), "float")
    if d == "BINARY_DOUBLE":
        return ColumnType(pa.float64(), "float")
    if d in _STRING_ORACLE_TYPES or d.startswith(("VARCHAR", "CHAR(", "NCHAR(")):
        return ColumnType(pa.string(), "string")
    if d == "DATE":
        return ColumnType(pa.date32(), "date")
    m = _TS_RE.match(d)
    if m:
        zoned = m.group(2) is not None
        return ColumnType(
            pa.timestamp("us", tz="UTC"),
            "timestamp",
            tz=db_timezone,
            zoned=zoned,
        )
    if d == "RAW" or d.startswith("RAW(") or d == "BLOB":
        return ColumnType(pa.binary(), "binary")
    raise ValueError(f"unsupported column type declaration: {decl!r}")


def column_type_for_arrow(t: pa.DataType, db_timezone: str = "UTC") -> ColumnType:
    """Arrow field type -> ColumnType (for parsing redo literals of an
    already-known Arrow table schema)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ColumnType(t, "string")
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ColumnType(t, "binary")
    if pa.types.is_integer(t):
        return ColumnType(t, "int")
    if pa.types.is_floating(t):
        return ColumnType(t, "float")
    if pa.types.is_decimal(t):
        return ColumnType(t, "decimal", scale=t.scale, precision=t.precision)
    if pa.types.is_date(t):
        return ColumnType(t, "date")
    if pa.types.is_timestamp(t):
        return ColumnType(t, "timestamp", tz=db_timezone, zoned=False)
    raise ValueError(f"no redo-literal conversion for arrow type {t}")
