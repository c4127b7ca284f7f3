"""Vectorized redo-SQL fast path: batch statement parse via RE2 kernels.

The reference's operating shape is statement TEXT per change row
(``logminer/LogminerRow.kt:63-96``), so at 10^10 events the parse IS
the engine's throughput.  ``functions/redo_sql.py`` mirrors the
reference's per-statement parse loop (kept as the semantic oracle and
the fallback); this module parses the CANONICAL statement shapes that
LogMiner and the workload generator actually emit with
``pyarrow.compute`` kernels -- zero Python per row.

Three tiers, fastest first:

1. **Signature-specialized patterns** -- for every (op, column-list)
   signature seen so far, a cached anchored RE2 pattern with the
   column names inlined as literals and ONLY the value slots as
   capture groups (~5x faster than the generic pattern: mostly
   literal matching).  A CDC stream has a handful of signatures
   (one per table x statement shape), so after the first batch per
   worker, virtually every row takes this tier.
2. **Generic bounded pattern** -- up to ``MAX_SET_PAIRS`` SET
   assignments and ``MAX_WHERE_PAIRS`` WHERE equality / IS NULL
   conjuncts (plus LogMiner's trailing ``and ROWID = '...'``), column
   names captured, rows grouped by signature.  Each new signature is
   registered as a tier-1 pattern for subsequent batches.
3. **Scalar parser fallback** (``redo_sql.parse_redo``) -- anything
   wider / exotic, plus all reject accounting (parse_error /
   unknown_column / convert_error / missing_key dead letters keep
   their exact per-reason semantics).

Every value region is matched by a closed literal alternation (quoted
string with ``''`` escapes, NULL, TO_DATE / TO_TIMESTAMP / HEXTORAW /
UNISTR call, number), never a lazy ``.*?`` -- a statement either
matches unambiguously or falls back, so the fast path can never
mis-parse.  Literal conversion is vectorized per slot (cast /
strptime / buffer-level hex decode); rows whose conversion the
kernels cannot reproduce exactly divert to tier 3.
"""

from __future__ import annotations

import re as _re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from logminer_kafka_connect_ray.types import ColumnType

MAX_SET_PAIRS = 3
MAX_WHERE_PAIRS = 4
#: cap on cached specialized patterns per op class -- a workload with
#: more signatures than this still works (tier 2), it just shuffles
#: which ones get tier-1 treatment
MAX_SPECIALIZED = 12

_SIG_SEP = "\x1f"

#: rows of a cold batch the generic tier probes to discover
#: signatures before the specialized tier takes over (parse())
_PROBE_ROWS = 4096

#: literal token alternation -- mirrors the scalar tokenizer's accepted
#: literal forms exactly (redo_sql._TOKEN_RE + _P.literal)
_FUNCS = "TO_DATE|TO_TIMESTAMP_TZ|TO_TIMESTAMP|HEXTORAW|UNISTR"
_LIT_BODY = (
    r"NULL|'(?:[^']|'')*'"
    rf"|(?:{_FUNCS})\(\s*'(?:[^']|'')*'[^)]*\)"
    r"|[-+]?[0-9]+(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?"
)
_LIT_NC = rf"(?:{_LIT_BODY})"
_IDT = r'(?:"[^"]+"|[A-Za-z_][A-Za-z0-9_$#]*)'
_TBL = rf"{_IDT}(?:\s*\.\s*{_IDT})?"
_ROWID_TAIL = r"(?:\s+and\s+ROWID\s*=\s*'[^']*')?"


def _lit(name: str) -> str:
    """Literal capture with NESTED content groups: ``<name>`` is the
    whole token, ``<name>q`` the inside of a quoted literal, ``<name>f``
    the first quoted argument of a function literal -- so the unwrap
    needs no second regex pass over the values."""
    return (
        rf"(?P<{name}>NULL|'(?P<{name}q>(?:[^']|'')*)'"
        rf"|(?:{_FUNCS})\(\s*'(?P<{name}f>(?:[^']|'')*)'[^)]*\)"
        r"|[-+]?[0-9]+(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?)"
    )


#: single-char starters of numeric literals (for form dispatch)
_NUM_START = pa.array(list("0123456789+-"), pa.string())
_NUM_START_EMPTY = pa.array(list("0123456789+-") + [""], pa.string())


def _slot_content(ex, name: str, n: int, is_null_overlay=None) -> pa.Array:
    """Resolve a slot's captured triple (token, quoted-content,
    func-content) to the literal CONTENT string array: null for
    NULL / absent, unquoted+unescaped text for quoted and function
    forms, the raw token for numbers.  The ``q``/``f`` subgroups may
    be absent (typed specialized patterns omit impossible forms)."""
    names = set(ex.type.field(i).name for i in range(ex.type.num_fields))

    def field_or_empty(nm):
        if nm in names:
            return pc.struct_field(ex, nm)
        return pa.nulls(n, pa.string())

    v = pc.struct_field(ex, name)
    q = field_or_empty(f"{name}q")
    f = field_or_empty(f"{name}f")
    first = pc.utf8_slice_codeunits(pc.fill_null(v, ""), 0, 1)
    quoted = pc.equal(first, "'")
    numeric = pc.is_in(first, value_set=_NUM_START)
    isnull = pc.fill_null(pc.equal(v, "NULL"), True)
    content = pc.if_else(
        quoted, q, pc.if_else(numeric, v, f)
    )
    content = pc.if_else(isnull, pa.nulls(n, pa.string()), content)
    if is_null_overlay is not None:
        content = pc.if_else(
            is_null_overlay, pa.nulls(n, pa.string()), content
        )
    return pc.replace_substring(content, pattern="''", replacement="'")


def _set_pair(i: int) -> str:
    return rf'"(?P<s{i}c>[^"]+)"\s*=\s*{_lit(f"s{i}v")}'


def _where_pair(i: int) -> str:
    return (
        rf'"(?P<w{i}c>[^"]+)"\s*'
        rf"(?:=\s*{_lit(f'w{i}v')}|(?P<w{i}n>IS\s+NULL))"
    )


def _update_pattern() -> str:
    sets = _set_pair(0) + "".join(
        rf"(?:\s*,\s*{_set_pair(i)})?" for i in range(1, MAX_SET_PAIRS)
    )
    wheres = _where_pair(0) + "".join(
        rf"(?:\s+and\s+{_where_pair(i)})?" for i in range(1, MAX_WHERE_PAIRS)
    )
    return (
        rf"(?is)^\s*update\s+{_TBL}\s+set\s+{sets}"
        rf"\s+where\s+{wheres}{_ROWID_TAIL}\s*;?\s*$"
    )


def _delete_pattern() -> str:
    wheres = _where_pair(0) + "".join(
        rf"(?:\s+and\s+{_where_pair(i)})?" for i in range(1, MAX_WHERE_PAIRS)
    )
    return (
        rf"(?is)^\s*delete\s+from\s+{_TBL}"
        rf"\s+where\s+{wheres}{_ROWID_TAIL}\s*;?\s*$"
    )


def _insert_pattern() -> str:
    return (
        rf"(?is)^\s*insert\s+into\s+{_TBL}\s*\(\s*"
        r'(?P<cols>"[^"]+"(?:\s*,\s*"[^"]+")*)\s*\)\s*'
        rf"values\s*\(\s*(?P<vals>{_LIT_NC}(?:\s*,\s*{_LIT_NC})*)\s*\)\s*;?\s*$"
    )


def _values_pattern(k: int) -> str:
    body = r"\s*,\s*".join(_lit(f"v{i}") for i in range(k))
    return rf"(?s)^{body}$"


# -- specialized (tier-1) patterns: column names inlined as literals --
def _spec_update(
    s_names: list[str], w_names: list[str],
    s_kinds: list[str], w_kinds: list[str],
) -> str:
    sets = r"\s*,\s*".join(
        rf'"{_re.escape(c)}"\s*=\s*{_typed_lit(f"s{i}v", k)}'
        for i, (c, k) in enumerate(zip(s_names, s_kinds))
    )
    wheres = r"\s+and\s+".join(
        rf'"{_re.escape(c)}"\s*'
        rf"(?:=\s*{_typed_lit(f'w{i}v', k)}|(?P<w{i}n>IS\s+NULL))"
        for i, (c, k) in enumerate(zip(w_names, w_kinds))
    )
    return (
        rf"(?is)^\s*update\s+{_TBL}\s+set\s+{sets}"
        rf"\s+where\s+{wheres}{_ROWID_TAIL}\s*;?\s*$"
    )


def _spec_insert(names: list[str], kinds: list[str]) -> str:
    """Specialized insert: column list inlined as literals, one
    TYPE-NARROWED value capture per position."""
    cols = r"\s*,\s*".join(rf'"{_re.escape(c)}"' for c in names)
    vals = r"\s*,\s*".join(
        _typed_lit(f"v{i}", kind) for i, kind in enumerate(kinds)
    )
    return (
        rf"(?is)^\s*insert\s+into\s+{_TBL}\s*\(\s*{cols}\s*\)\s*"
        rf"values\s*\(\s*{vals}\s*\)\s*;?\s*$"
    )


def _spec_delete(w_names: list[str], w_kinds: list[str]) -> str:
    wheres = r"\s+and\s+".join(
        rf'"{_re.escape(c)}"\s*'
        rf"(?:=\s*{_typed_lit(f'w{i}v', k)}|(?P<w{i}n>IS\s+NULL))"
        for i, (c, k) in enumerate(zip(w_names, w_kinds))
    )
    return (
        rf"(?is)^\s*delete\s+from\s+{_TBL}"
        rf"\s+where\s+{wheres}{_ROWID_TAIL}\s*;?\s*$"
    )


def _typed_lit(name: str, kind: str) -> str:
    """TYPE-NARROWED literal capture for specialized insert patterns:
    only the literal forms the column's kind can actually receive,
    so RE2 does far less alternation work per value position (a value
    in an unexpected form simply fails the specialized match and takes
    the generic tier, which accepts every form)."""
    q = rf"'(?P<{name}q>(?:[^']|'')*)'"
    f = rf"(?:{_FUNCS})\(\s*'(?P<{name}f>(?:[^']|'')*)'[^)]*\)"
    num = r"[-+]?[0-9]+(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?"
    if kind == "string":
        body = rf"NULL|{q}"
    elif kind in ("timestamp", "date", "binary"):
        body = rf"NULL|{q}|{f}"
    else:  # int / float / decimal
        body = rf"NULL|{num}"
    return rf"(?P<{name}>{body})"


# -- vectorized literal conversion ------------------------------------
_HEX_NIBBLE = np.full(256, 255, np.uint8)
for _c in b"0123456789":
    _HEX_NIBBLE[_c] = _c - ord("0")
for _c in b"abcdef":
    _HEX_NIBBLE[_c] = _c - ord("a") + 10
for _c in b"ABCDEF":
    _HEX_NIBBLE[_c] = _c - ord("A") + 10


def _hex_decode(s: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Vectorized HEXTORAW hex -> binary via the string array's data
    buffer (no per-row Python).  Returns (binary array, bad mask)."""
    n = len(s)
    nulls = pc.is_null(s).to_numpy(zero_copy_only=False)
    ok = pc.fill_null(
        pc.and_(
            pc.equal(pc.bit_wise_and(pc.utf8_length(s), 1), 0),
            pc.match_substring_regex(s, "^[0-9A-Fa-f]*$"),
        ),
        True,
    ).to_numpy(zero_copy_only=False)
    bad = ~ok & ~nulls
    clean = pc.fill_null(pc.if_else(pa.array(ok), s, ""), "")
    if isinstance(clean, pa.ChunkedArray):
        clean = clean.combine_chunks()
    if clean.type != pa.string():
        clean = clean.cast(pa.string())
    off = np.frombuffer(clean.buffers()[1], np.int32)[
        clean.offset : clean.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(clean.buffers()[2], np.uint8)[off[0] : off[-1]]
    nib = _HEX_NIBBLE[data]
    decoded = ((nib[0::2] << 4) | nib[1::2]).tobytes()
    new_off = ((off - off[0]) // 2).astype(np.int32)
    validity = None
    if nulls.any() or bad.any():
        valid = ~(nulls | bad)
        validity = pa.array(valid).buffers()[1]
    out = pa.Array.from_buffers(
        pa.binary(), n,
        [validity, pa.py_buffer(new_off.tobytes()), pa.py_buffer(decoded)],
    )
    return out, bad


def _convert_slot(
    ct: ColumnType, val: pa.Array
) -> tuple[pa.Array, np.ndarray]:
    """Literal CONTENT string array (from ``_slot_content``: already
    unwrapped / unescaped, null for NULL and IS NULL) -> typed array +
    per-row bad mask (True = row must take the scalar fallback)."""
    n = len(val)
    bad = np.zeros(n, bool)
    nulls_np = pc.is_null(val).to_numpy(zero_copy_only=False)

    kind = ct.kind
    try:
        if kind == "string":
            return pc.cast(val, ct.arrow), bad
        if kind == "int":
            okm = pc.fill_null(
                pc.match_substring_regex(val, r"^[-+]?[0-9]+$"), True
            ).to_numpy(zero_copy_only=False)
            bad = ~okm & ~nulls_np
            gated = pc.if_else(pa.array(okm | nulls_np), val,
                               pa.nulls(n, pa.string()))
            return pc.cast(gated, ct.arrow), bad
        if kind == "float":
            return pc.cast(val, ct.arrow), bad
        if kind == "binary":
            return _hex_decode(val)
        if kind == "date":
            okm = pc.fill_null(
                pc.match_substring_regex(val, r"^\d{4}-\d{2}-\d{2}"), True
            ).to_numpy(zero_copy_only=False)
            bad = ~okm & ~nulls_np
            gated = pc.if_else(pa.array(okm | nulls_np), val,
                               pa.nulls(n, pa.string()))
            ts = pc.strptime(
                pc.utf8_slice_codeunits(gated, 0, 10), format="%Y-%m-%d",
                unit="s",
            )
            return pc.cast(ts, ct.arrow), bad
        if kind == "timestamp" and not ct.zoned:
            ex = pc.extract_regex(
                val,
                pattern=(
                    r"^(?P<b>\d{4}-\d{2}-\d{2})[ T]"
                    r"(?P<t>\d{2}:\d{2}:\d{2})(?:\.(?P<f>\d{1,6}))?$"
                ),
            )
            okm = pc.is_valid(ex).to_numpy(zero_copy_only=False)
            bad = ~okm & ~nulls_np
            datep = pc.struct_field(ex, "b")
            timep = pc.struct_field(ex, "t")
            frac = pc.struct_field(ex, "f")
            joined = pc.binary_join_element_wise(datep, timep, " ")
            ts = pc.strptime(joined, format="%Y-%m-%d %H:%M:%S", unit="us")
            us = pc.cast(
                pc.utf8_rpad(pc.fill_null(frac, ""), 6, padding="0"),
                pa.int64(),
            )
            ts = pc.cast(
                pc.add(pc.cast(ts, pa.int64()), pc.fill_null(us, 0)),
                pa.timestamp("us"),
            )
            ts = pc.assume_timezone(ts, ct.tz)
            return pc.cast(ts, ct.arrow), bad
        if kind == "decimal":
            # exact half-up quantize semantics: per-value Decimal --
            # decimal columns are rare (pages/suppliers have none) and
            # this still skips the statement re-parse
            vals, out = val.to_pylist(), []
            for i, v in enumerate(vals):
                try:
                    out.append(None if v is None else ct.convert(f"'{v}'"))
                except (ValueError, ArithmeticError):
                    out.append(None)
                    bad[i] = True
            return pa.array(out, ct.arrow), bad
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError):
        return pa.nulls(n, ct.arrow), ~nulls_np
    # zoned timestamps / anything else: scalar path
    return pa.nulls(n, ct.arrow), ~nulls_np


class FastRedoParser:
    """Batch redo-SQL parse.  ``parse(t)`` returns
    ``(group_tables, fallback_idx)`` where each group table is in the
    decoder's flat output schema plus an ``_oi`` original-row-index
    column, and ``fallback_idx`` indexes rows of ``t`` the scalar
    parser must handle (non-canonical, unknown column, conversion
    edge, missing key, empty sql)."""

    def __init__(
        self,
        column_types: dict[str, ColumnType],
        key_column: str,
        data_cols: list[str],
        out_schema: pa.Schema,
        full_mask: int,
    ):
        self.column_types = column_types
        self.key_column = key_column
        self.data_cols = list(data_cols)
        self.col_bit = {c: 1 << i for i, c in enumerate(data_cols)}
        self.out_schema = out_schema
        self.full_mask = full_mask
        self.pat_u = _update_pattern()
        self.pat_d = _delete_pattern()
        self.pat_i = _insert_pattern()
        self._values_pats: dict[int, str] = {}
        #: tier-1 cache: op -> {sig: [pattern, s_names, w_names, hits]}
        self._spec: dict[str, dict[str, list]] = {"u": {}, "d": {}, "i": {}}

    # -- signature registration (tier 2 -> tier 1 promotion) -----------
    def _register(self, op: str, sig: str, s_names, w_names) -> None:
        cache = self._spec[op]
        if sig in cache or len(cache) >= MAX_SPECIALIZED:
            return
        s_kinds = [self.column_types[c].kind for c in s_names]
        w_kinds = [self.column_types[c].kind for c in w_names]
        if op == "u":
            pat = _spec_update(s_names, w_names, s_kinds, w_kinds)
        elif op == "d":
            pat = _spec_delete(w_names, w_kinds)
        else:
            pat = _spec_insert(s_names, s_kinds)
        cache[sig] = [pat, list(s_names), list(w_names), 0]

    # -- helpers -------------------------------------------------------
    def _meta_cols(self, t: pa.Table, idx: np.ndarray) -> dict[str, pa.Array]:
        g = t.take(pa.array(idx))
        n = len(idx)

        def col(name, typ):
            if name in g.column_names:
                return g.column(name).cast(typ).combine_chunks()
            return pa.nulls(n, typ)

        f = self.out_schema.field
        return {
            "scn": col("scn", f("scn").type),
            "row_id": col("row_id", f("row_id").type),
            "commit_scn": col("commit_scn", f("commit_scn").type),
            "tx_id": col("tx_id", f("tx_id").type),
            "ts_ms": col("ts_ms", f("ts_ms").type),
            "table": col("table", f("table").type),
        }

    def _emit_group(
        self,
        t: pa.Table,
        idx: np.ndarray,
        op: str,
        mask: np.ndarray,
        key: pa.Array,
        a_arrays: dict[str, pa.Array],
        b_arrays: dict[str, pa.Array],
        bad: np.ndarray,
        fallback: list[np.ndarray],
    ) -> pa.Table | None:
        """Assemble one signature group's out-schema table; rows with
        ``bad`` or a null key divert to the scalar fallback."""
        keynull = pc.is_null(key).to_numpy(zero_copy_only=False)
        divert = bad | keynull
        if divert.any():
            fallback.append(idx[divert])
            good = ~divert
            if not good.any():
                return None
            sel = pa.array(np.flatnonzero(good))
            idx = idx[good]
            mask = mask[good]
            key = key.take(sel)
            a_arrays = {c: a.take(sel) for c, a in a_arrays.items()}
            b_arrays = {c: a.take(sel) for c, a in b_arrays.items()}
        n = len(idx)
        cols = self._meta_cols(t, idx)
        cols["op"] = pa.array([op] * n, pa.string())
        cols[self.key_column] = key
        cols["set_mask"] = pa.array(mask, pa.int64())
        for c in self.data_cols:
            ftype = self.out_schema.field(f"a_{c}").type
            cols[f"a_{c}"] = a_arrays.get(c, pa.nulls(n, ftype))
            cols[f"b_{c}"] = b_arrays.get(c, pa.nulls(n, ftype))
        out = {name: cols[name] for name in self.out_schema.names}
        tbl = pa.table(out, schema=self.out_schema)
        return tbl.append_column("_oi", pa.array(idx, pa.int64()))

    def _group_by_signature(
        self, fields: list[pa.Array]
    ) -> list[tuple[str, np.ndarray]]:
        if len(fields) == 1:
            sig = pc.fill_null(fields[0], "\x00")
        else:
            sig = pc.binary_join_element_wise(
                *[pc.fill_null(f, "\x00") for f in fields], _SIG_SEP
            )
        enc = sig.dictionary_encode()
        ind = enc.indices.to_numpy(zero_copy_only=False)
        out = []
        for di, s in enumerate(enc.dictionary.to_pylist()):
            out.append((s, np.flatnonzero(ind == di)))
        return out

    # -- unified assembly ------------------------------------------------
    def _assemble_ud(
        self,
        t: pa.Table,
        gidx: np.ndarray,
        op: str,
        s_names: list[str],
        w_names: list[str],
        sv: list[pa.Array],
        wv: list[pa.Array],
        tables: list[pa.Table],
        fallback: list[np.ndarray],
    ) -> None:
        """UPDATE/DELETE group: slot value arrays (IS NULL already
        resolved to null) -> flat out rows with M7 enrichment."""
        ng = len(gidx)
        bad = np.zeros(ng, bool)
        a_arrays: dict[str, pa.Array] = {}
        b_arrays: dict[str, pa.Array] = {}
        a_key = b_key = None
        base_mask = 0
        for c, raw in zip(s_names, sv):
            arr, b = _convert_slot(self.column_types[c], raw)
            bad |= b
            if c == self.key_column:
                a_key = arr
            else:
                a_arrays[c] = arr
                base_mask |= self.col_bit[c]
        mask = np.full(ng, base_mask, np.int64)
        for c, raw in zip(w_names, wv):
            arr, b = _convert_slot(self.column_types[c], raw)
            bad |= b
            if c == self.key_column:
                b_key = arr
            else:
                b_arrays[c] = arr
                bit = self.col_bit[c]
                if op == "u" and not (base_mask & bit):
                    # M7 enrichment: non-null before fills after
                    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                    a_arrays[c] = arr
                    mask |= valid.astype(np.int64) * bit
        key_type = self.out_schema.field(self.key_column).type
        key = pc.coalesce(
            a_key if a_key is not None else pa.nulls(ng, key_type),
            b_key if b_key is not None else pa.nulls(ng, key_type),
        )
        g = self._emit_group(
            t, gidx, op, mask, key, a_arrays, b_arrays, bad, fallback
        )
        if g is not None:
            tables.append(g)

    def _assemble_insert(
        self,
        t: pa.Table,
        gidx: np.ndarray,
        names: list[str],
        values: list[pa.Array],
        tables: list[pa.Table],
        fallback: list[np.ndarray],
    ) -> None:
        ng = len(gidx)
        bad = np.zeros(ng, bool)
        a_arrays: dict[str, pa.Array] = {}
        a_key = None
        for c, raw in zip(names, values):
            arr, b = _convert_slot(self.column_types[c], raw)
            bad |= b
            if c == self.key_column:
                a_key = arr
            else:
                a_arrays[c] = arr
        key_type = self.out_schema.field(self.key_column).type
        key = a_key if a_key is not None else pa.nulls(ng, key_type)
        mask = np.full(ng, self.full_mask, np.int64)
        g = self._emit_group(
            t, gidx, "i", mask, key, a_arrays, {}, bad, fallback
        )
        if g is not None:
            tables.append(g)

    @staticmethod
    def _where_content(ex, i: int, n: int) -> pa.Array:
        """Where-slot content with IS NULL conjuncts resolved to null."""
        overlay = pc.not_equal(
            pc.fill_null(pc.struct_field(ex, f"w{i}n"), ""), ""
        )
        return _slot_content(ex, f"w{i}v", n, is_null_overlay=overlay)

    def _names_ok(self, names: list[str]) -> bool:
        return all(c in self.column_types for c in names) and len(
            set(names)
        ) == len(names)

    # -- tier 1: specialized patterns -----------------------------------
    def _try_specialized(
        self,
        t: pa.Table,
        sql: pa.Array,
        idx: np.ndarray,
        op: str,
        tables: list[pa.Table],
        fallback: list[np.ndarray],
    ) -> np.ndarray:
        """Run cached specialized patterns; returns indices still
        unmatched (for the generic tier)."""
        cache = self._spec[op]
        if not cache:
            return idx
        for entry in sorted(cache.values(), key=lambda e: -e[3]):
            if len(idx) == 0:
                break
            pat, s_names, w_names, _ = entry
            sub = sql.take(pa.array(idx))
            ex = pc.extract_regex(sub, pattern=pat)
            m = pc.is_valid(ex).to_numpy(zero_copy_only=False)
            if not m.any():
                continue
            entry[3] += int(m.sum())
            sel = pa.array(np.flatnonzero(m))
            gex = ex.take(sel)
            gidx = idx[m]
            ngl = len(gidx)
            if op == "i":
                vals = [
                    _slot_content(gex, f"v{i}", ngl)
                    for i in range(len(s_names))
                ]
                self._assemble_insert(
                    t, gidx, s_names, vals, tables, fallback
                )
                idx = idx[~m]
                continue
            sv = [
                _slot_content(gex, f"s{i}v", ngl)
                for i in range(len(s_names))
            ]
            wv = [
                self._where_content(gex, i, ngl)
                for i in range(len(w_names))
            ]
            self._assemble_ud(
                t, gidx, op, s_names, w_names, sv, wv, tables, fallback
            )
            idx = idx[~m]
        return idx

    # -- tier 2: generic bounded patterns --------------------------------
    def _parse_update_delete(
        self,
        t: pa.Table,
        sql: pa.Array,
        idx: np.ndarray,
        op: str,
        tables: list[pa.Table],
        fallback: list[np.ndarray],
    ) -> None:
        sub = sql.take(pa.array(idx))
        ex = pc.extract_regex(
            sub, pattern=self.pat_u if op == "u" else self.pat_d
        )
        matched = pc.is_valid(ex).to_numpy(zero_copy_only=False)
        if not matched.all():
            fallback.append(idx[~matched])
            if not matched.any():
                return
            sel = pa.array(np.flatnonzero(matched))
            ex = ex.take(sel)
            idx = idx[matched]

        n_set = MAX_SET_PAIRS if op == "u" else 0
        set_c = [pc.struct_field(ex, f"s{i}c") for i in range(n_set)]
        whr_c = [pc.struct_field(ex, f"w{i}c") for i in range(MAX_WHERE_PAIRS)]
        n_m = len(idx)
        whr_v = [self._where_content(ex, i, n_m) for i in range(MAX_WHERE_PAIRS)]
        set_v = [_slot_content(ex, f"s{i}v", n_m) for i in range(n_set)]

        for sig, gpos in self._group_by_signature(set_c + whr_c):
            names = sig.split(_SIG_SEP) if len(set_c + whr_c) > 1 else [sig]
            s_all, w_all = names[:n_set], names[n_set:]
            s_names = [x for x in s_all if x]
            w_names = [x for x in w_all if x]
            gidx = idx[gpos]
            if not (self._names_ok(s_names) and self._names_ok(w_names)):
                fallback.append(gidx)
                continue
            sel = pa.array(gpos)
            sv = [set_v[i].take(sel) for i, x in enumerate(s_all) if x]
            wv = [
                whr_v[i].take(sel) for i, x in enumerate(w_all) if x
            ]
            self._assemble_ud(
                t, gidx, op, s_names, w_names, sv, wv, tables, fallback
            )
            self._register(op, sig, s_names, w_names)

    def _parse_insert(
        self,
        t: pa.Table,
        sql: pa.Array,
        idx: np.ndarray,
        tables: list[pa.Table],
        fallback: list[np.ndarray],
    ) -> None:
        sub = sql.take(pa.array(idx))
        ex = pc.extract_regex(sub, pattern=self.pat_i)
        matched = pc.is_valid(ex).to_numpy(zero_copy_only=False)
        if not matched.all():
            fallback.append(idx[~matched])
            if not matched.any():
                return
            sel = pa.array(np.flatnonzero(matched))
            ex = ex.take(sel)
            idx = idx[matched]
        cols_str = pc.struct_field(ex, "cols")
        vals_str = pc.struct_field(ex, "vals")

        for sig, gpos in self._group_by_signature([cols_str]):
            # quoted identifiers keep their case (scalar _P.ident parity)
            names = _re.findall(r'"([^"]+)"', sig)
            gidx = idx[gpos]
            k = len(names)
            if not self._names_ok(names):
                fallback.append(gidx)
                continue
            pat = self._values_pats.get(k)
            if pat is None:
                pat = self._values_pats[k] = _values_pattern(k)
            gvals = vals_str.take(pa.array(gpos))
            vex = pc.extract_regex(gvals, pattern=pat)
            vok = pc.is_valid(vex).to_numpy(zero_copy_only=False)
            if not vok.all():
                # arity mismatch (k columns, != k literals)
                fallback.append(gidx[~vok])
                if not vok.any():
                    continue
                vsel = pa.array(np.flatnonzero(vok))
                vex = vex.take(vsel)
                gidx = gidx[vok]
            vals = [_slot_content(vex, f"v{i}", len(gidx)) for i in range(k)]
            self._assemble_insert(t, gidx, names, vals, tables, fallback)
            self._register("i", sig, names, [])

    # -- entry ----------------------------------------------------------
    def parse(self, t: pa.Table) -> tuple[list[pa.Table], np.ndarray]:
        n = t.num_rows
        if n == 0 or "sql_redo" not in t.column_names:
            return [], np.arange(n, dtype=np.int64)
        sql = t.column("sql_redo")
        if isinstance(sql, pa.ChunkedArray):
            sql = sql.combine_chunks()
        head = pc.utf8_lower(
            pc.utf8_slice_codeunits(pc.fill_null(sql, ""), 0, 7)
        )
        is_i = pc.equal(head, "insert ").to_numpy(zero_copy_only=False)
        is_u = pc.equal(head, "update ").to_numpy(zero_copy_only=False)
        is_d = pc.equal(head, "delete ").to_numpy(zero_copy_only=False)
        tables: list[pa.Table] = []
        fallback: list[np.ndarray] = [
            np.flatnonzero(~(is_i | is_u | is_d)).astype(np.int64)
        ]
        for op, m in (("u", is_u), ("d", is_d), ("i", is_i)):
            idx = np.flatnonzero(m).astype(np.int64)
            if not len(idx):
                continue
            idx = self._try_specialized(t, sql, idx, op, tables, fallback)
            if not len(idx):
                continue
            # cold-start probe: the generic tiered pattern is ~3x the
            # kernel cost of a specialized one, and every worker
            # process pays it on its first batch.  Run the generic
            # tier on a bounded PROBE slice only -- it registers the
            # signatures it sees -- then re-run the (now warm)
            # specialized tier over the remainder; the generic tier
            # sweeps only what still doesn't match (novel signatures
            # past the probe).
            if len(idx) > _PROBE_ROWS:
                probe, rest = idx[:_PROBE_ROWS], idx[_PROBE_ROWS:]
                if op == "i":
                    self._parse_insert(t, sql, probe, tables, fallback)
                else:
                    self._parse_update_delete(
                        t, sql, probe, op, tables, fallback
                    )
                idx = self._try_specialized(
                    t, sql, rest, op, tables, fallback
                )
                if not len(idx):
                    continue
            if op == "i":
                self._parse_insert(t, sql, idx, tables, fallback)
            else:
                self._parse_update_delete(t, sql, idx, op, tables, fallback)
        fb = (
            np.sort(np.concatenate(fallback))
            if fallback
            else np.empty(0, np.int64)
        )
        return tables, fb
