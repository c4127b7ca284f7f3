"""Text functions over web-page content.

``extract_text`` is THE per-row invariant function of this engine:
BASELINE.json requires byte-identical extracted text per url after
replay, so it must be pure and deterministic.  It plays the role the
redo-SQL parser plays in the reference (the heavy per-event CPU stage,
``logminer/LogminerRow.kt:63-96``): payload bytes -> structured value.

The remaining functions are the training-data text-analysis toolkit
(language id, quality scoring, token counting, fingerprinting) used by
``pipelines/dataops.py``.  All are vectorized over Arrow/pandas batches;
compiled regexes live at module level (compiled once per worker
process, the map_batches analog of doing setup in an actor __init__).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TAG = re.compile(rb"<[^>]*>")
_WS = re.compile(rb"\s+")


def extract_text_one(html: bytes) -> str:
    """Pure deterministic html -> text: strip tags, collapse whitespace.

    The fixed function f such that pages.text == f(pages.html) row-wise
    (FIXTURES.md F1).
    """
    no_tags = _TAG.sub(b" ", html)
    collapsed = _WS.sub(b" ", no_tags).strip()
    return collapsed.decode("utf-8", errors="replace")


def extract_text_batch(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized extract over an Arrow binary column.

    Uses Arrow's compiled regex/utf8 kernels end-to-end: cast the
    binary to string, regex-strip tags, collapse whitespace, trim.
    Semantics match ``extract_text_one`` for utf-8 payloads.
    """
    s = pc.cast(html, pa.large_string())
    s = pc.replace_substring_regex(s, pattern="<[^>]*>", replacement=" ")
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    s = pc.utf8_trim_whitespace(s)
    out = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    return pc.cast(out, pa.string())


# ---------------------------------------------------------------------------
# Language id (n-gram/stopword heuristic) -- no external models.
# ---------------------------------------------------------------------------
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it for was with are have this".split()),
    "de": frozenset("der die und das ist nicht ich ein mit sich auf für den von".split()),
    "fr": frozenset("le la les et des est une pour que dans qui pas sur vous".split()),
    "es": frozenset("el la los las y de que en un una es por para con del".split()),
    "it": frozenset("il la che di e un una per non sono con del alla più".split()),
}
_WORD_RE = re.compile(r"[a-zà-ÿ]+")


def lang_id_batch(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Language id over an Arrow string column.

    Deliberately per-row under the hood: tokenize-once + frozenset
    intersection is one O(len) pass per doc, and measured 3x FASTER
    than the "vectorized" alternative of ~70 whole-column regex
    presence scans (one per marker word) at web-page document sizes
    (0.07s vs 0.24s over 5k docs).  Compiled regex + marker sets are
    module-level (once per worker process).
    """
    vals = texts.to_pylist() if hasattr(texts, "to_pylist") else list(texts)
    return pa.array(
        lang_id_series(pd.Series(vals, dtype=object)).tolist(), pa.string()
    )


def lang_id_series(texts: pd.Series) -> pd.Series:
    """Heuristic language id: argmax stopword-hit rate over markers.

    Returns 'und' (undetermined) when no marker hits.
    Deterministic tie-break: language-code sort order.
    """
    def one(t) -> str:
        if not isinstance(t, str) or not t:
            return "und"
        words = _WORD_RE.findall(t.lower())
        if not words:
            return "und"
        ws = set(words)
        best, best_hits = "und", 0
        for lang in sorted(_LANG_MARKERS):
            hits = len(ws & _LANG_MARKERS[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    return texts.map(one)


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------
def quality_features(texts: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Vectorized quality features over a string column.

    n_chars, n_tokens (whitespace tokens), alpha_ratio, punct_ratio,
    mean_token_len -- pure Arrow kernels.
    """
    t = pc.cast(texts, pa.large_string())
    n_chars = pc.utf8_length(t)
    n_tokens = pc.count_substring_regex(t, pattern=r"\S+")
    n_alpha = pc.count_substring_regex(t, pattern=r"[A-Za-z]")
    n_punct = pc.count_substring_regex(t, pattern=r"[.,;:!?]")
    nc = pc.cast(n_chars, pa.float64())
    safe_nc = pc.max_element_wise(nc, pa.scalar(1.0))
    safe_nt = pc.max_element_wise(pc.cast(n_tokens, pa.float64()), pa.scalar(1.0))
    return {
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "alpha_ratio": pc.divide(pc.cast(n_alpha, pa.float64()), safe_nc),
        "punct_ratio": pc.divide(pc.cast(n_punct, pa.float64()), safe_nc),
        "mean_token_len": pc.divide(nc, safe_nt),
    }


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish subword regex)
# ---------------------------------------------------------------------------
#: GPT-2-style pretokenizer fragment: words, numbers, punctuation runs.
_BPEISH = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"


def token_counts(texts: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    t = pc.cast(texts, pa.large_string())
    return {
        "ws_tokens": pc.cast(pc.count_substring_regex(t, pattern=r"\S+"), pa.int64()),
        "bpeish_tokens": pc.cast(pc.count_substring_regex(t, pattern=_BPEISH), pa.int64()),
    }


# ---------------------------------------------------------------------------
# Document fingerprint (rolling polynomial hash of the whole text)
# ---------------------------------------------------------------------------
_FP_BASE = np.uint64(1000003)
_FP_SEED = np.uint64(14695981039346656037)


def fingerprint_series(texts: pd.Series | pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit rolling-hash fingerprint per document (deterministic).

    Vectorized like ``hashing.fnv1a_u64``: byte position j is processed
    across all rows at once over the Arrow string buffers -- O(max_len)
    numpy passes instead of a per-byte Python loop (~10^6 x fewer
    interpreter ops on KB-sized documents).  Null/non-string -> 0.
    """
    if isinstance(texts, pd.Series):
        arr = pa.array(
            [t if isinstance(t, str) else None for t in texts], pa.string()
        )
    else:
        arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    arr = arr.cast(pa.large_string())
    n = len(arr)
    valid = np.ones(n, bool)
    if arr.null_count:
        valid = ~np.asarray(arr.is_null())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    starts = offsets[:-1]
    lengths = (offsets[1:] - starts).astype(np.int64)
    lengths = np.where(valid, lengths, 0)
    h = np.full(n, _FP_SEED, dtype=np.uint64)
    max_len = int(lengths.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(max_len):
            alive = lengths > j
            idx = starts[alive] + j
            h[alive] = h[alive] * _FP_BASE + data[idx].astype(np.uint64)
    h[~valid] = 0
    return h
