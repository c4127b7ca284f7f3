"""Redo-SQL statement parser: SQL text -> typed before/after maps.

Re-expresses the reference's parse stage (``logminer/LogminerRow.kt:63-96``
using the external ``logminer-sql-parser`` dependency, plus the
``WhereVisitor`` at ``:120-128`` and literal extraction ``:133-141``):

* INSERT  -> after  = column list x VALUES list
* UPDATE  -> after  = SET pairs; before = WHERE equality / IS NULL pairs
* DELETE  -> before = WHERE pairs
* literal ``NULL`` -> None (LogminerSchema.NULL_VALUE)
* unknown column in the statement -> ``UnknownColumnError`` -- the
  trigger for a schema refresh (reference ``DataException`` ->
  ``SchemaService.refreshSchema``, ``TransactionConsolidator.kt:79-89``)
* unparseable statement -> ``RedoSqlParseError`` -- skipped with
  accounting, never crashes the stream
  (``TransactionConsolidator.kt:66-70``)

A hand-rolled tokenizer (quoted identifiers, ``''``-escaped string
literals, TO_DATE/TO_TIMESTAMP call literals) replaces the reference's
parser library; values convert through the column type system
(``types.ColumnType.convert``).

CSF reassembly (``logminer/LogminerFetcher.kt:144-153``): LogMiner
splits statements > 4000 bytes over continuation rows flagged ``csf=1``;
``reassemble_csf`` joins each run of csf=1 rows with its terminating
csf=0 row.  Fragments of one statement are adjacent in the log by
construction, and the changelog writer never splits them across files.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from logminer_kafka_connect_ray.types import ColumnType


class RedoSqlParseError(ValueError):
    pass


class UnknownColumnError(KeyError):
    """Column in the statement missing from the cached schema -> the
    caller refreshes the schema and retries (schema evolution)."""


_TOKEN_RE = re.compile(
    r"""
    \s*(
        '(?:[^']|'')*'            # string literal w/ '' escape
      | "(?:[^"])*"               # quoted identifier
      | [A-Za-z_][A-Za-z0-9_$#]*  # bare word
      | <>|!=|>=|<=|=|\(|\)|,|;|\.|\*
      | [-+]?[0-9]+(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?
    )""",
    re.X,
)


def _tokenize(sql: str) -> list[str]:
    out, pos = [], 0
    s = sql.strip().rstrip(";")
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise RedoSqlParseError(f"cannot tokenize at {pos}: {s[pos:pos+25]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


class _P:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise RedoSqlParseError("unexpected end of statement")
        self.i += 1
        return t

    def expect_kw(self, kw: str):
        t = self.next()
        if t.upper() != kw:
            raise RedoSqlParseError(f"expected {kw}, got {t!r}")

    def ident(self) -> str:
        t = self.next()
        if t.startswith('"') and t.endswith('"'):
            return t[1:-1]
        if re.match(r"^[A-Za-z_]", t):
            return t.upper()
        raise RedoSqlParseError(f"expected identifier, got {t!r}")

    def table_name(self) -> str:
        name = self.ident()
        while self.peek() == ".":
            self.next()
            name += "." + self.ident()
        return name

    def literal(self) -> str | None:
        """Return the literal as the raw convertible string (quotes
        kept for strings; function literals unwrapped), or None for
        NULL (LogminerRow.kt:117-118)."""
        t = self.next()
        up = t.upper()
        if up == "NULL":
            return None
        if up in ("TO_DATE", "TO_TIMESTAMP", "TO_TIMESTAMP_TZ", "HEXTORAW", "UNISTR"):
            # TO_DATE('2024-01-02 03:04:05', 'YYYY-MM-DD HH24:MI:SS')
            self.expect_kw("(")
            value = self.next()
            while self.peek() not in (")", None):
                self.next()  # skip format args
            self.expect_kw(")")
            return value
        return t


def parse_redo(
    sql: str, column_types: dict[str, ColumnType]
) -> tuple[str, dict | None, dict | None]:
    """Parse one redo statement -> ``(op, before, after)`` with typed
    values.  op in 'i'/'u'/'d'."""
    p = _P(_tokenize(sql))
    head = p.next().upper()

    def convert(col: str, raw: str | None):
        ct = column_types.get(col)
        if ct is None:
            raise UnknownColumnError(col)
        return ct.convert(raw)

    if head == "INSERT":
        p.expect_kw("INTO")
        p.table_name()
        p.expect_kw("(")
        cols = [p.ident()]
        while p.peek() == ",":
            p.next()
            cols.append(p.ident())
        p.expect_kw(")")
        kw = p.next().upper()
        if kw != "VALUES":
            raise RedoSqlParseError(f"expected VALUES, got {kw!r}")
        p.expect_kw("(")
        vals = [p.literal()]
        while p.peek() == ",":
            p.next()
            vals.append(p.literal())
        p.expect_kw(")")
        if len(cols) != len(vals):
            raise RedoSqlParseError("INSERT arity mismatch")
        after = {c: convert(c, v) for c, v in zip(cols, vals)}
        return "i", None, after

    if head == "UPDATE":
        p.table_name()
        p.expect_kw("SET")
        after: dict = {}
        while True:
            col = p.ident()
            p.expect_kw("=")
            after[col] = convert(col, p.literal())
            if p.peek() == ",":
                p.next()
                continue
            break
        before = _parse_where(p, convert)
        return "u", before, after

    if head == "DELETE":
        p.expect_kw("FROM")
        p.table_name()
        before = _parse_where(p, convert)
        return "d", before, None

    raise RedoSqlParseError(f"unsupported statement head {head!r}")


def _parse_where(p: _P, convert) -> dict | None:
    """WHERE col = lit AND col IS NULL AND ... (WhereVisitor analog:
    only equality / IS NULL conjunctions appear in redo WHERE clauses,
    LogminerRow.kt:120-128)."""
    t = p.peek()
    if t is None:
        return None
    if t.upper() != "WHERE":
        raise RedoSqlParseError(f"expected WHERE, got {t!r}")
    p.next()
    out: dict = {}
    while True:
        col = p.ident()
        nxt = p.next().upper()
        if nxt == "=":
            if col == "ROWID":
                # real LogMiner WHERE clauses carry `and ROWID = 'AAA…'`;
                # it is row metadata, not a table column -- consume and
                # drop (the engine's row_id rides as its own column)
                p.literal()
            else:
                out[col] = convert(col, p.literal())
        elif nxt == "IS":
            p.expect_kw("NULL")
            if col != "ROWID":
                out[col] = None
        else:
            raise RedoSqlParseError(f"unsupported WHERE operator {nxt!r}")
        if (p.peek() or "").upper() == "AND":
            p.next()
            continue
        break
    if p.peek() is not None:
        raise RedoSqlParseError(f"trailing tokens: {p.peek()!r}")
    return out


# ---------------------------------------------------------------------------
# CSF reassembly (continuation flag)
# ---------------------------------------------------------------------------
def reassemble_csf(t: pa.Table, sql_col: str = "sql_redo", csf_col: str = "csf") -> pa.Table:
    """Join each run of csf=1 rows with its terminating csf=0 row
    (LogminerFetcher.kt:144-153).  Metadata columns come from the run's
    FIRST row (the reference keeps the first row's identifiers)."""
    if csf_col not in t.column_names:
        return t
    csf = t.column(csf_col).to_numpy(zero_copy_only=False)
    if not csf.any():
        return t.drop_columns([csf_col])
    sqls = t.column(sql_col).to_pylist()
    keep_idx: list[int] = []
    joined: list[str] = []
    i = 0
    n = t.num_rows
    while i < n:
        if csf[i]:
            start = i
            frags = []
            while i < n and csf[i]:
                frags.append(sqls[i] or "")
                i += 1
            if i < n:  # terminating csf=0 fragment
                frags.append(sqls[i] or "")
                i += 1
            keep_idx.append(start)
            joined.append("".join(frags))
        else:
            keep_idx.append(i)
            joined.append(sqls[i] or "")
            i += 1
    out = t.take(pa.array(np.asarray(keep_idx, np.int64)))
    col_i = out.column_names.index(sql_col)
    out = out.set_column(col_i, sql_col, pa.array(joined, pa.string()))
    return out.drop_columns([csf_col])
