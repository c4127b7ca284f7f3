"""Training-data pipeline operations over the document / embedding
tables (the operations a 100 TB web-text lake needs beyond CDC).

All pipelines are Ray-Data-native: vectorized ``map_batches`` over
Arrow/pandas/numpy batches, partial aggregation before any shuffle,
broadcast small sides via ``ray.put``.  Determinism: every hash is
seeded FNV/md5 -- no Python ``hash()``, no randomness.

Operators:

* exact dedup              -- content-hash partition + min-id keeper
* MinHash + LSH near-dup   -- shingle -> minhash -> band buckets ->
                              candidate pairs -> exact Jaccard verify
* SimHash near-dup         -- 64-bit simhash, segment-LSH buckets,
                              Hamming verify
* n-gram Jaccard           -- the verify kernel, exposed standalone
* embedding similarity     -- brute-force cosine top-k vs broadcast
                              query matrix (baseline) and an
                              LSH-bucketed variant (scale path)
* embedding near-dup       -- cosine >= tau pairs via random-hyperplane
                              LSH buckets
* text analysis            -- language id, quality features, token
                              counts, fingerprints
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from logminer_kafka_connect_ray.functions import text as textfn
from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64, partition_ids


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _read_dim(sf_dir: str, table: str, columns=None) -> pd.DataFrame:
    """Driver-side read of a small DIMENSION table destined for a
    broadcast map (nation/region/supplier/part...).  A Ray Dataset
    read + ``to_pandas()`` on a 20k-row dim measured ~2 s of pure
    plan/execute overhead per call; the dim is driver-materialized
    either way, so read it directly."""
    import pyarrow.parquet as _pq

    return _pq.read_table(
        f"{sf_dir}/{table}.parquet", columns=columns
    ).to_pandas()


def _table_meta(sf_dir: str, table: str) -> tuple[int, int]:
    """(num_rows, uncompressed_bytes) from parquet footer metadata --
    a free size probe (no data read) used to derive exchange widths."""
    import pyarrow.parquet as _pq

    md = _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata
    raw = sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
    return md.num_rows, raw


def _exchange_width(
    n_rows: int, rows_per_block: int = 2_000_000, lo: int = 8, hi: int = 4096
) -> int:
    """Partition count for a candidate-pair / join exchange, derived
    from the estimated row volume flowing through it (the same policy
    ``repartition_lake`` applies to lake partitions): each explicit
    range partition must arrive as ONE block in a worker, so width
    grows with the data instead of being a constant that silently
    overflows a block at 100x the input."""
    import math

    need = max(1, -(-n_rows // rows_per_block))  # ceil
    return max(lo, min(hi, 1 << math.ceil(math.log2(need))))


def _segment_starts(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Segment boundaries of an ALREADY-SORTED key array: returns
    ``(starts, counts)`` -- each group's first index and size.  The
    reduceat feed every per-block group partial shares."""
    n = len(sorted_keys)
    if n == 0:
        return np.array([], np.int64), np.array([], np.int64)
    starts = np.flatnonzero(
        np.concatenate([[True], sorted_keys[1:] != sorted_keys[:-1]])
    )
    return starts, np.diff(np.append(starts, n))


def _group_segments(
    keys: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stable sort-by-key segmentation: ``(order, starts, counts)``
    with ``keys[order]`` grouped, ``starts`` indexing each group's
    first sorted row.  The shared 'sort by key, find segment starts,
    reduce per segment' primitive behind every per-block partial
    (moments, props, centroids, tf-idf, ranks)."""
    order = np.argsort(keys, kind="stable")
    starts, counts = _segment_starts(keys[order])
    return order, starts, counts


def _named_agg(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Name a Ray groupby-aggregate result's columns, tolerating the
    EMPTY case: an aggregate over zero rows comes back from Ray as a
    zero-COLUMN frame (no schema), where a plain ``df.columns = cols``
    raises.  Found by the text-op differential fuzz on a corpus with
    no duplicated grams."""
    if df.empty and len(df.columns) != len(cols):
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in cols}
        )
    df = df.copy()
    df.columns = cols
    return df


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def md5_hash_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Add a deterministic md5 content hash column (hex string).

    Hashes straight off the Arrow string column's data buffer via
    memoryview slices -- no ``to_pylist`` round-trip, no per-row str
    objects or ``.encode`` copies (the bytes are already UTF-8 in the
    buffer).  md5 itself is per-value by definition; everything around
    it is buffer arithmetic."""
    c = t.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if pa.types.is_large_string(c.type):
        c = c.cast(pa.string())
    n = len(c)
    # account for a sliced array: offsets index into the shared buffer
    offs = np.frombuffer(c.buffers()[1], dtype=np.int32, count=n + 1 + c.offset)[
        c.offset :
    ]
    data = memoryview(c.buffers()[2]) if c.buffers()[2] is not None else memoryview(b"")
    valid = np.ones(n, bool)
    if c.null_count:
        valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
    _md5 = hashlib.md5
    hashes = [
        _md5(data[offs[i] : offs[i + 1]]).hexdigest() if valid[i] else None
        for i in range(n)
    ]
    return t.append_column("content_hash", pa.array(hashes, pa.string()))


def dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup on md5(text): keep the smallest doc_id per hash.

    Two-level: per-batch local argmin (combiner) -> groupby(hash) min.
    Returns the surviving doc ids, sorted.
    """
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def local_min(t: pa.Table) -> pa.Table:
        t = md5_hash_batch(t)
        t = t.select(["content_hash", "doc_id"])
        idx = pc.sort_indices(
            t, sort_keys=[("content_hash", "ascending"), ("doc_id", "ascending")]
        )
        t = t.take(idx)
        h = t.column("content_hash").combine_chunks()
        n = len(h)
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        return t.filter(pa.array(first))

    partial = ds.map_batches(local_min, batch_format="pyarrow")
    final = partial.groupby("content_hash").min("doc_id")
    t = pa.Table.from_pandas(final.to_pandas(), preserve_index=False)
    t = t.rename_columns(["content_hash", "doc_id"]).select(["doc_id"])
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) dedup: Bloom prefilter + exact confirm
# ---------------------------------------------------------------------------
def md5_digest_u64(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """md5 of each string as an ``(n, 2)`` uint64 array (the two
    64-bit halves of the digest).  Buffer-slice variant of
    :func:`md5_hash_batch`: hashes straight off the Arrow data buffer,
    no per-row str/encode copies.  Caller must have dropped nulls."""
    c = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    if pa.types.is_large_string(c.type):
        c = c.cast(pa.string())
    n = len(c)
    if n == 0:
        return np.empty((0, 2), np.uint64)
    offs = np.frombuffer(
        c.buffers()[1], dtype=np.int32, count=n + 1 + c.offset
    )[c.offset:]
    data = (
        memoryview(c.buffers()[2])
        if c.buffers()[2] is not None
        else memoryview(b"")
    )
    _md5 = hashlib.md5
    buf = bytearray(16 * n)
    for i in range(n):
        buf[16 * i : 16 * i + 16] = _md5(data[offs[i] : offs[i + 1]]).digest()
    return np.frombuffer(bytes(buf), dtype=np.uint64).reshape(n, 2)


def _bloom_positions(dig: np.ndarray, m: int, k: int) -> np.ndarray:
    """Double-hashing Bloom positions ``(n, k)`` from digest halves:
    ``pos_j = (h1 + j*h2) mod m`` (Kirsch-Mitzenmacher)."""
    h1 = dig[:, 0] % np.uint64(m)
    h2 = dig[:, 1] | np.uint64(1)
    j = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return (h1[:, None] + j * h2[:, None]) % np.uint64(m)


def _incr_split_old(t: pa.Table) -> pa.Table:
    t = t.select(["doc_id", "text"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return t.filter(pa.array(ids % 3 != 0))


def _incr_mk_new(t: pa.Table) -> pa.Table:
    """The 'new crawl': every ``doc_id % 3 == 0`` doc, plus planted
    re-crawls of old-corpus docs (``doc_id % 97 == 1``) re-ingested
    under ``10_000_000 + doc_id`` -- guaranteed cross-corpus duplicates
    at every scale, constructed identically by the SQL oracle."""
    t = t.select(["doc_id", "text"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    base = t.filter(pa.array(ids % 3 == 0))
    pl = t.filter(pa.array((ids % 3 != 0) & (ids % 97 == 1)))
    pl = pl.set_column(
        0, "doc_id",
        pc.add(pc.cast(pl.column("doc_id"), pa.int64()), 10_000_000),
    )
    base = base.set_column(0, "doc_id", pc.cast(base.column("doc_id"), pa.int64()))
    return pa.concat_tables([base, pl])


class _BloomProbe:
    """Probe the broadcast old-corpus Bloom filter: emits
    ``(doc_id, h1, h2, cand)`` -- ``cand=False`` rows are PROVABLY
    novel (Bloom has no false negatives); ``cand=True`` rows are the
    rare maybe-duplicates that go through the exact confirm."""

    def __init__(self, bits_ref, m: int, k: int):
        self.bits_ref = bits_ref
        self.m, self.k = m, k
        self._bits = None

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        if self._bits is None:  # once per worker: zero-copy from plasma
            self._bits = np.frombuffer(ray.get(self.bits_ref), np.uint8)
        t = t.filter(pc.is_valid(t.column("text")))
        dig = md5_digest_u64(t.column("text"))
        if len(dig) == 0:
            cand = np.zeros(0, bool)
        else:
            pos = _bloom_positions(dig, self.m, self.k)
            byte = (pos >> np.uint64(3)).astype(np.int64)
            bit = (
                np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
            )
            cand = ((self._bits[byte] & bit) == bit).all(axis=1)
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "h1": pa.array(dig[:, 0]),
                "h2": pa.array(dig[:, 1]),
                "cand": pa.array(cand),
            }
        )


def dedup_incremental(
    sf_dir: str, bloom_bits: int = 1 << 20, n_hashes: int = 7
) -> pa.Table:
    """Incremental cross-snapshot exact dedup: drop from a NEW crawl
    every doc whose text already exists in the previously-ingested OLD
    corpus -- the "dedup this month's crawl against the corpus so far"
    primitive (CCNet/Dolma shape), WITHOUT shuffling the old corpus.

    Corpus split (mirrored exactly by the SQL oracle): old =
    ``doc_id % 3 != 0``; new = ``doc_id % 3 == 0`` plus planted
    re-crawls (see :func:`_incr_mk_new`).

    Scale shape, in three bounded moves:

    1. ONE column-pruned pass over the old corpus builds per-block
       Bloom partials (``m`` bits each), OR-reduced driver-side --
       bounded by n_blocks x m/8 bytes, never by corpus size (at
       100 TB: shard the filter by hash prefix and tree-reduce the
       ORs).  In a production lake the stored ``content_hash`` column
       feeds this pass; here it is recomputed from text.
    2. The new crawl probes the broadcast filter (``ray.put`` once,
       zero-copy read per worker).  Bloom-negative docs are PROVABLY
       novel (no false negatives) and never shuffle anywhere.
    3. Only the candidate set (true dups + false positives -- rare by
       construction, ~1% FP at 10 bits/element) is broadcast BACK for
       one exact hash-match confirm scan over the old corpus, making
       the result exact, not probabilistic.  No all-to-all exchange
       ever carries corpus-sized data.

    Returns the novel (kept) new-crawl doc_ids, sorted.
    """
    import ray

    m, k = bloom_bits, n_hashes
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    old = docs.map_batches(_incr_split_old, batch_format="pyarrow")
    new = docs.map_batches(_incr_mk_new, batch_format="pyarrow")

    # (1) per-block Bloom partials over the old corpus, OR-reduce
    def bloom_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("text")))
        arr = np.zeros(m // 8, np.uint8)
        dig = md5_digest_u64(t.column("text"))
        if len(dig):
            pos = _bloom_positions(dig, m, k)
            byte = (pos >> np.uint64(3)).astype(np.int64).ravel()
            bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)).ravel()
            np.bitwise_or.at(arr, byte, bit)
        return pa.table({"bits": pa.array([arr.tobytes()], pa.binary())})

    partials = old.map_batches(
        bloom_partial, batch_format="pyarrow"
    ).take_all()
    bits = np.zeros(m // 8, np.uint8)
    for p in partials:
        bits |= np.frombuffer(p["bits"], np.uint8)
    bits_ref = ray.put(bits.tobytes())

    # (2) probe: negatives are novel, positives are candidates
    probed = new.map_batches(
        _BloomProbe(bits_ref, m, k), batch_format="pyarrow"
    ).materialize()
    cand = probed.map_batches(
        lambda t: t.filter(t.column("cand")), batch_format="pyarrow"
    ).to_pandas()

    # (3) exact confirm: broadcast the candidate digest set, scan the
    # old corpus once for actual matches (output bounded by candidates)
    matched: set[tuple[int, int]] = set()
    if len(cand):
        cd = ray.put(
            np.unique(
                np.stack(
                    [cand["h1"].to_numpy(np.uint64),
                     cand["h2"].to_numpy(np.uint64)], axis=1
                ), axis=0,
            )
        )

        def confirm_scan(t: pa.Table, _ref=cd) -> pa.Table:
            want = ray.get(_ref)  # (c, 2) uint64, sorted rows
            t = t.filter(pc.is_valid(t.column("text")))
            dig = md5_digest_u64(t.column("text"))
            if len(dig) == 0 or len(want) == 0:
                return pa.table(
                    {"h1": pa.array([], pa.uint64()),
                     "h2": pa.array([], pa.uint64())}
                )
            # pack (h1, h2) -> void view for row-wise set membership
            hit = np.isin(
                np.ascontiguousarray(dig).view("V16").ravel(),
                np.ascontiguousarray(want).view("V16").ravel(),
            )
            got = np.unique(dig[hit], axis=0)
            return pa.table(
                {"h1": pa.array(got[:, 0]), "h2": pa.array(got[:, 1])}
            )

        for r in old.map_batches(
            confirm_scan, batch_format="pyarrow"
        ).take_all():
            matched.add((int(r["h1"]), int(r["h2"])))

    kept_cand = [
        int(i)
        for i, a, b in zip(cand["doc_id"], cand["h1"], cand["h2"])
        if (int(a), int(b)) not in matched
    ] if len(cand) else []
    novel = probed.map_batches(
        lambda t: t.filter(pc.invert(t.column("cand"))).select(["doc_id"]),
        batch_format="pyarrow",
    ).to_pandas()
    novel_ids = (
        novel["doc_id"].to_numpy(np.int64)
        if "doc_id" in novel.columns  # empty Dataset -> column-less frame
        else np.empty(0, np.int64)
    )
    ids = np.sort(
        np.concatenate([novel_ids, np.asarray(kept_cand, np.int64)])
    )
    return pa.table({"doc_id": pa.array(ids)})


# ---------------------------------------------------------------------------
# Shingles / MinHash / LSH
# ---------------------------------------------------------------------------
_WORD = re.compile(r"[a-z0-9]+")

N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
_MERSENNE = np.uint64((1 << 61) - 1)
_rng = np.random.default_rng(42)
_A = _rng.integers(1, (1 << 61) - 1, size=N_HASHES, dtype=np.uint64)
_B = _rng.integers(0, (1 << 61) - 1, size=N_HASHES, dtype=np.uint64)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Word k-gram shingles -> uint64 hashes (deterministic)."""
    words = _WORD.findall(text.lower())
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.empty(0, np.uint64)
    return np.unique(fnv1a_u64(grams))


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """64 permutation-min hashes ((a*x+b) mod 2^61-1 family)."""
    if len(sh) == 0:
        return np.full(N_HASHES, np.uint64(_MERSENNE), np.uint64)
    x = sh.astype(np.uint64) % _MERSENNE
    with np.errstate(over="ignore"):
        vals = (x[None, :] * _A[:, None] + _B[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


class MinHashStage:
    """Actor-pool stage: doc text -> minhash signature + LSH band keys.

    Emits one row per (doc, band): ``(band, bucket, doc_id)`` ready for
    the band-bucket groupby (SNIPPETS/ray guide near-dup pattern).

    Per-doc numpy (64 x n_shingles, L1-resident) measured FASTER than a
    whole-batch (64 x total_shingles) matrix + reduceat formulation
    (2.1s vs 9.2s on 5k docs) -- the per-doc loop stays deliberately.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.rows_per_band = N_HASHES // N_BANDS

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_pylist()
        texts = t.column(self.text_col).to_pylist()
        sigs = np.stack(
            [minhash_signature(shingle_hashes(s or "")) for s in texts]
        )  # (n, 64)
        n = len(ids)
        bands = sigs.reshape(n, N_BANDS, self.rows_per_band)
        # bucket = fnv over the band's 4 values (deterministic)
        with np.errstate(over="ignore"):
            bucket = np.full((n, N_BANDS), np.uint64(0xCBF29CE484222325), np.uint64)
            for j in range(self.rows_per_band):
                bucket = (bucket ^ bands[:, :, j]) * np.uint64(0x100000001B3)
        out_band = np.repeat(np.arange(N_BANDS, dtype=np.int32), n)
        out_bucket = bucket.T.reshape(-1)
        out_id = np.tile(np.asarray(ids, dtype=np.int64), N_BANDS)
        return pa.table(
            {
                "band": pa.array(out_band),
                "bucket": pa.array(out_bucket.astype(np.int64)),
                "doc_id": pa.array(out_id),
            }
        )


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = shingle_hashes(a, k), shingle_hashes(b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


#: in-bucket all-pairs cap.  Buckets past the cap are NOT dropped:
#: they star-pair against the bucket representative (min doc_id), so a
#: giant duplicate cluster is still fully discovered (every member
#: pairs with the rep) at O(n) pairs instead of O(n^2), with a logged
#: overflow count.
MAX_BUCKET_PAIRING = 200
log = __import__("logging").getLogger(__name__)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (byte-view + unpackbits)."""
    if len(x) == 0:
        return np.empty(0, np.int64)
    by = x.astype(np.uint64).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(by, axis=1).sum(axis=1).astype(np.int64)


def _bucket_pairs(ids: np.ndarray, cap: int = MAX_BUCKET_PAIRING,
                  what: str = "lsh",
                  ovf: list | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pairs of one bucket: all-pairs under the cap, star
    pairs to the representative above it (never silent dropping).
    Overflowed bucket sizes are appended to ``ovf`` so callers can
    surface them as DATA (guard side-channel), not just a log line."""
    n = len(ids)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if n > cap:
        log.warning(
            "%s bucket overflow: %d members > cap %d; star-pairing to "
            "representative %s", what, n, cap, ids[0],
        )
        if ovf is not None:
            ovf.append(n)
        return np.full(n - 1, ids[0], np.int64), ids[1:].astype(np.int64)
    ia, ib = np.triu_indices(n, k=1)
    return ids[ia].astype(np.int64), ids[ib].astype(np.int64)


# ---------------------------------------------------------------------------
# Exchange guard side-channel (ADVICE r2): every explicit-boundary
# exchange assumes each stamp range arrives as ONE whole block.  Blocks
# record (tag, stamp set, overflow sizes) to a scratch dir; the driver
# finalize fails LOUDLY if any (tag, stamp) was delivered by two
# distinct blocks (pairs would have been silently lost) and attaches
# star-pair overflow totals to the result's schema metadata so the
# verify harness can see when the 'exact kernel' label no longer holds.
# Record file names are keyed by (Ray task id, per-task call index):
# stable across task RETRIES (a re-executed task replays the same call
# sequence under the same task id, so it overwrites its own records)
# but distinct across the two map_batches calls a SPLIT range would
# produce -- even when both halves carry an identical stamp set, the
# two calls write two files and finalize sees the duplicate.  (A pure
# content hash -- the previous scheme -- deduped that exact case.)  At
# multi-node scale, point guard dirs at shared storage (same assumption
# the lake dir makes).
# ---------------------------------------------------------------------------
def _new_guard_dir(what: str) -> str:
    import tempfile

    return tempfile.mkdtemp(prefix=f"lkc-exguard-{what}-")


#: per-worker-process map: (task id, attempt) -> number of
#: _guard_record calls so far in that attempt (a retry replays the
#: same sequence from 0; see note above)
_GUARD_CALLS: dict[tuple[str, int], int] = {}


def _guard_record(
    guard_dir: str | None, tag: str, stamps, ovf_sizes: list | tuple = ()
) -> None:
    if guard_dir is None:
        return
    import json
    import os

    stamp_list = sorted({int(s) for s in stamps}) if len(stamps) else []
    if not stamp_list and not ovf_sizes:
        return
    rec = {"tag": tag, "stamps": stamp_list, "ovf": [int(x) for x in ovf_sizes]}
    body = json.dumps(rec, sort_keys=True)
    tid, attempt = "", 0
    try:
        import ray

        ctx = ray.get_runtime_context()
        tid = ctx.get_task_id() or ""
        # counter resets per ATTEMPT where Ray exposes it (2.49 does
        # not); without it, the one uncovered case is a retry landing
        # on the SAME still-live worker (lineage reconstruction --
        # normal retries follow a process death, which resets the
        # dict), and that case fails LOUDLY as a spurious split, never
        # silently.
        get_attempt = getattr(ctx, "get_attempt_number", None)
        attempt = int(get_attempt()) if (tid and get_attempt) else 0
    except Exception:
        pass
    seq = _GUARD_CALLS.get((tid, attempt), 0)
    _GUARD_CALLS[(tid, attempt)] = seq + 1
    key = fnv1a_u64([f"{tid}\x00{seq}\x00{body}"])[0]
    os.makedirs(guard_dir, exist_ok=True)
    path = os.path.join(guard_dir, f"{tag}-{key:016x}.json")
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(body)
    os.replace(tmp, path)


def _finalize_guard(guard_dir: str | None, t: pa.Table) -> pa.Table:
    """Driver-side guard check + overflow surfacing (see above)."""
    if guard_dir is None:
        return t
    import json
    import os
    import shutil

    seen: dict[tuple[str, int], int] = {}
    ovf_buckets = 0
    ovf_members = 0
    if os.path.isdir(guard_dir):
        for name in sorted(os.listdir(guard_dir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(guard_dir, name)) as f:
                rec = json.load(f)
            for s in rec["stamps"]:
                k = (rec["tag"], s)
                seen[k] = seen.get(k, 0) + 1
            ovf_buckets += len(rec["ovf"])
            ovf_members += sum(rec["ovf"])
        shutil.rmtree(guard_dir, ignore_errors=True)
    dups = sorted(k for k, n in seen.items() if n > 1)
    if dups:
        raise RuntimeError(
            "exchange delivered a stamp range split across blocks "
            f"(pairs would be silently lost): {dups[:5]}; raise the "
            "exchange width (_exchange_width rows_per_block) or "
            "DataContext.target_max_block_size"
        )
    meta = dict(t.schema.metadata or {})
    meta[b"overflow_buckets"] = str(ovf_buckets).encode()
    meta[b"overflow_members"] = str(ovf_members).encode()
    return t.replace_schema_metadata(meta)


def _exchange_join_docs(
    left_ds,
    left_schema: pa.Schema,
    key: str,
    right_ds,
    right_schema: pa.Schema,
    rename: dict,
    num_partitions: int = 8,
    guard_dir: str | None = None,
    tag: str = "join",
):
    """Distributed inner hash-join of ``left_ds[key]`` against a
    doc-keyed right dataset (key column ``doc_id``).

    Engine-style exchange: both sides stamp ``_jp = fnv(key) % P``,
    union under one padded schema, range-partition on ``_jp`` with
    explicit boundaries (one partition per block), then a per-block
    pyarrow hash join.  Used instead of ``Dataset.join``, which builds
    schema-less empty tables for partitions that receive no left rows
    and crashes in Acero ('no match for key field').  Assumes one join
    partition fits a block -- size ``num_partitions`` to the data like
    the lake merge does.
    """
    union = pa.schema(
        [("_side", pa.int8()), ("_jp", pa.int64())]
        + list(left_schema)
        + [f for f in right_schema if f.name != "doc_id"]
        + [pa.field("doc_id", pa.int64())]
    )

    def pad(side: int, keycol: str):
        def f(t: pa.Table) -> pa.Table:
            part = partition_ids(t.column(keycol), num_partitions)
            cols = []
            for fld in union:
                if fld.name == "_side":
                    cols.append(pa.array(np.full(t.num_rows, side, np.int8)))
                elif fld.name == "_jp":
                    cols.append(pa.array(part))
                elif fld.name in t.column_names:
                    c = t.column(fld.name)
                    cols.append(c.cast(fld.type) if c.type != fld.type else c)
                else:
                    cols.append(pa.nulls(t.num_rows, fld.type))
            return pa.table(cols, schema=union)

        return f

    lt = left_ds.map_batches(pad(0, key), batch_format="pyarrow")
    rt = right_ds.map_batches(pad(1, "doc_id"), batch_format="pyarrow")
    ex = lt.union(rt).sort("_jp", boundaries=list(range(1, num_partitions)))
    left_names = [f.name for f in left_schema]
    right_names = [f.name for f in right_schema]
    out_names = left_names + [
        rename.get(n, n) for n in right_names if n != "doc_id"
    ]

    left_t = pa.schema([union.field(n) for n in left_names])
    right_t = pa.schema([union.field(n) for n in right_names])

    def join_block(t: pa.Table) -> pa.Table:
        _guard_record(
            guard_dir, tag,
            t.column("_jp").to_numpy(zero_copy_only=False)
            if t.num_rows else np.empty(0),
        )
        side = t.column("_side")
        # a block whose padded column is ALL null can come back from
        # the sort re-inferred as null-typed -- cast restores the
        # declared types before the Acero join
        lp = t.filter(pc.equal(side, 0)).select(left_names).cast(left_t)
        rp = t.filter(pc.equal(side, 1)).select(right_names).cast(right_t)
        j = lp.join(rp, keys=[key], right_keys=["doc_id"], join_type="inner")
        j = j.select(left_names + [n for n in right_names if n != "doc_id"])
        return j.rename_columns(out_names)

    return ex.map_batches(join_block, batch_size=None, batch_format="pyarrow")


_PAIR_P = 32


def _bucket_block_pairs(t: pa.Table, group_cols: list[str],
                        cap: int = MAX_BUCKET_PAIRING,
                        what: str = "lsh",
                        pair_p: int = _PAIR_P,
                        guard_dir: str | None = None,
                        tag: str = "jp",
                        stamps=None) -> pa.Table:
    """All bucket groups of one exchange block -> candidate pair rows
    with a dedup-exchange stamp.  Fully vectorized sweep (lexsort +
    triu) -- one numpy pass instead of one pandas dispatch per group
    (per-group map_groups measured ~50x slower on many-bucket LSH)."""
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "_dp": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    keys = [
        t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
        for c in group_cols
    ]
    order = np.lexsort((ids, *reversed(keys)))
    ids = ids[order]
    keys = [k[order] for k in keys]
    change = np.zeros(len(ids), bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    sizes = np.diff(np.append(starts, len(ids)))
    out_a, out_b = [], []
    ovf: list[int] = []
    for s, sz in zip(starts, sizes):
        if sz < 2:
            continue
        gi = np.unique(ids[s : s + sz])
        if len(gi) < 2:
            continue
        a, b = _bucket_pairs(gi, cap=cap, what=what, ovf=ovf)
        if len(a):
            out_a.append(a)
            out_b.append(b)
    _guard_record(
        guard_dir, tag, stamps if stamps is not None else np.empty(0), ovf
    )
    if not out_a:
        return empty
    da = np.concatenate(out_a)
    db = np.concatenate(out_b)
    dp = ((da * 1000003 + db) % pair_p).astype(np.int64)
    return pa.table(
        {"doc_a": pa.array(da), "doc_b": pa.array(db), "_dp": pa.array(dp)}
    )


def _pop_stamp(t: pa.Table, col: str):
    """(stamps, table-without-stamp-col) for guard recording."""
    if col not in t.column_names:
        return np.empty(0, np.int64), t
    stamps = t.column(col).to_numpy(zero_copy_only=False)
    return stamps, t.drop_columns([col])


def _dedup_pair_blocks(pairs, pair_p: int = _PAIR_P,
                       guard_dir: str | None = None, tag: str = "dp"):
    """Exchange on the pair stamp, then first-per-(doc_a, doc_b) via a
    vectorized lexsort sweep per block."""

    def block_dedup(t: pa.Table) -> pa.Table:
        stamps, t = _pop_stamp(t, "_dp")
        _guard_record(guard_dir, tag, stamps)
        if t.num_rows == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64())}
            )
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return pa.table({"doc_a": pa.array(a[first]), "doc_b": pa.array(b[first])})

    return (
        pairs.sort("_dp", boundaries=list(range(1, pair_p)))
        .map_batches(block_dedup, batch_size=None, batch_format="pyarrow")
    )


def _count_pair_blocks(pairs, pair_p: int = _PAIR_P,
                       guard_dir: str | None = None, tag: str = "dp"):
    """Exchange on the pair stamp, then COUNT per (doc_a, doc_b) via a
    run-length sweep per block (the inverted-index intersection size)."""

    def block_count(t: pa.Table) -> pa.Table:
        stamps, t = _pop_stamp(t, "_dp")
        _guard_record(guard_dir, tag, stamps)
        if t.num_rows == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64()),
                 "n_common": pa.array([], pa.int64())}
            )
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(a)))
        return pa.table(
            {"doc_a": pa.array(a[starts]), "doc_b": pa.array(b[starts]),
             "n_common": pa.array(counts.astype(np.int64))}
        )

    return (
        pairs.sort("_dp", boundaries=list(range(1, pair_p)))
        .map_batches(block_count, batch_size=None, batch_format="pyarrow")
    )


def _stamped_bucket_pairs(rows, key_cols: list[str], cap: int, what: str,
                          width: int = _PAIR_P, pair_p: int = _PAIR_P,
                          guard_dir: str | None = None):
    """rows (group keys + doc_id) -> candidate pair rows with _dp,
    via the group-key exchange + vectorized block sweep.  ``width``
    (bucket-row exchange) and ``pair_p`` (pair stamp) are data-derived
    by callers via ``_exchange_width`` so a 100x input grows the
    exchange instead of overflowing a block."""

    def stamp(t: pa.Table) -> pa.Table:
        keys = [
            t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in key_cols
        ]
        acc = np.zeros(len(t), np.int64)
        for k in keys:
            with np.errstate(over="ignore"):
                acc = acc * 1000003 + k
        return t.append_column("_jp", pa.array(np.abs(acc) % width))

    def sweep(t: pa.Table) -> pa.Table:
        stamps, t = _pop_stamp(t, "_jp")
        return _bucket_block_pairs(
            t, key_cols, cap=cap, what=what, pair_p=pair_p,
            guard_dir=guard_dir, tag=f"{what}:jp", stamps=stamps,
        )

    return (
        rows.map_batches(stamp, batch_format="pyarrow")
        .sort("_jp", boundaries=list(range(1, width)))
        .map_batches(sweep, batch_size=None, batch_format="pyarrow")
    )


def _candidate_pairs(band_rows, key_cols: list[str], width: int = _PAIR_P,
                     pair_p: int = _PAIR_P, guard_dir: str | None = None):
    """bucket groups -> candidate pair rows -> DISTRIBUTED dedup.
    Explicit-boundary exchanges + vectorized block sweeps end-to-end:
    no per-group pandas dispatch, no driver-side materialization of the
    pair set (unbounded at 100 TB)."""
    pairs = _stamped_bucket_pairs(
        band_rows, key_cols, cap=MAX_BUCKET_PAIRING, what="minhash-lsh",
        width=width, pair_p=pair_p, guard_dir=guard_dir,
    )
    return _dedup_pair_blocks(
        pairs, pair_p=pair_p, guard_dir=guard_dir, tag="minhash-lsh:dp"
    )


def dedup_minhash_lsh(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """MinHash+LSH near-duplicate pairs verified by exact n-gram
    Jaccard >= threshold.  Returns (doc_a, doc_b, jaccard) sorted.

    Fully distributed: shingle->minhash->band rows (map_batches) ->
    groupby(band, bucket) -> candidate pairs -> groupby-pair dedup ->
    two hash joins against documents for the texts -> per-batch exact
    Jaccard verify.  No pair set or text dict ever materializes on the
    driver (the round-1 scale-killer); only the verified result does.
    """
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs, _raw = _table_meta(sf_dir, "documents")
    band_w = _exchange_width(n_docs * N_BANDS)
    pair_p = _exchange_width(n_docs * 4)
    join_p = _exchange_width(n_docs)
    gd = _new_guard_dir("minhash")
    # stateless stage: task fn (no actor-pool spin-up per execution)
    band_rows = docs.map_batches(MinHashStage(), batch_format="pyarrow")
    cand = _candidate_pairs(band_rows, ["band", "bucket"],
                            width=band_w, pair_p=pair_p, guard_dir=gd)

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    doc_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    j = _exchange_join_docs(cand, pair_schema, "doc_a", docs, doc_schema,
                            {"text": "text_a"}, num_partitions=join_p,
                            guard_dir=gd, tag="join_a")
    j = _exchange_join_docs(
        j, pa.schema(list(pair_schema) + [pa.field("text_a", pa.string())]),
        "doc_b", docs, doc_schema, {"text": "text_b"}, num_partitions=join_p,
        guard_dir=gd, tag="join_b",
    )

    def verify(t: pa.Table) -> pa.Table:
        ta = t.column("text_a").to_pylist()
        tb = t.column("text_b").to_pylist()
        jac = np.round([ngram_jaccard(a or "", b or "") for a, b in zip(ta, tb)], 6)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": t.column("doc_a").to_numpy(zero_copy_only=False)[keep],
                "doc_b": t.column("doc_b").to_numpy(zero_copy_only=False)[keep],
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    out = j.map_batches(verify, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["doc_a", "doc_b"], ignore_index=True)
    for c in ("doc_a", "doc_b"):
        out[c] = out[c].astype("int64")
    return _finalize_guard(gd, pa.Table.from_pandas(out, preserve_index=False))


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.7, k: int = 5) -> pa.Table:
    """EXACT all-pairs n-gram Jaccard >= threshold -- the near-dup
    verify kernel as a standalone, SQL-checkable correctness gate for
    the LSH family (the approximate paths must be a subset of this).

    Distributed inverted-index join: gram rows (doc_id, gram) ->
    groupby(gram) pair expansion -> groupby(pair) count = |A n B| ->
    joins against per-doc gram counts -> jaccard filter.  Docs with no
    grams (empty text) never pair.  Hot grams shared by > cap docs are
    star-paired with a logged warning (exactness holds while every
    gram bucket fits the cap -- true by construction on the driver
    tables; the cap is the documented scale guard)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs, raw_bytes = _table_meta(sf_dir, "documents")
    if n_docs > EXACT_KERNEL_MAX_ROWS:
        raise ValueError(
            f"dedup_ngram_jaccard is the exact VERIFY kernel (pair "
            f"expansion can go quadratic on near-duplicate-heavy "
            f"corpora) and is bounded at {EXACT_KERNEL_MAX_ROWS} docs "
            f"({n_docs} given); use dedup_minhash_lsh (banded-LSH scale "
            "path) for full corpora, or raise "
            "dataops.EXACT_KERNEL_MAX_ROWS explicitly"
        )
    # gram-row volume ~ one row per ~6 raw text bytes (avg word)
    gram_w = _exchange_width(max(n_docs, raw_bytes // 6))
    pair_p = _exchange_width(n_docs * 8)
    join_p = _exchange_width(n_docs)
    gd = _new_guard_dir("ngram")

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out_id, out_g = [], []
        for i, s in zip(ids, texts):
            sh = shingle_hashes(s or "", k)
            out_id.append(np.full(len(sh), i, np.int64))
            out_g.append(sh.astype(np.int64))
        # typed empties: a zero-row batch must not emit a null-typed
        # (schema-less) block into the grams dataset
        e = np.empty(0, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id) if out_id else e),
                "gram": pa.array(np.concatenate(out_g) if out_g else e),
            }
        )

    grams = docs.map_batches(gram_rows, batch_format="pyarrow")

    def _renamed(ds, src: str, dst: str, keys: list[str]):
        schema = pa.schema([(k, pa.int64()) for k in keys] + [(dst, pa.int64())])

        def canon(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or src not in t.column_names:
                return schema.empty_table()
            t = t.select(keys + [src]).rename_columns(keys + [dst])
            return t.cast(schema)

        return ds.map_batches(canon, batch_format="pyarrow")

    sizes = _renamed(grams.groupby("doc_id").count(), "count()", "n_grams",
                     ["doc_id"])

    # inverted-index pair expansion + per-pair intersection count, all
    # via exchanges + vectorized block sweeps (no per-gram dispatch)
    inter = _count_pair_blocks(
        _stamped_bucket_pairs(
            grams, ["gram"], cap=2000, what="ngram-inverted-index",
            width=gram_w, pair_p=pair_p, guard_dir=gd,
        ),
        pair_p=pair_p, guard_dir=gd, tag="ngram:dp",
    )
    inter_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_common", pa.int64())]
    )
    size_schema = pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64())])
    j = _exchange_join_docs(inter, inter_schema, "doc_a", sizes, size_schema,
                            {"n_grams": "n_grams_a"}, num_partitions=join_p,
                            guard_dir=gd, tag="join_a")
    j = _exchange_join_docs(
        j, pa.schema(list(inter_schema) + [pa.field("n_grams_a", pa.int64())]),
        "doc_b", sizes, size_schema, {"n_grams": "n_grams_b"},
        num_partitions=join_p, guard_dir=gd, tag="join_b",
    )

    def jac(t: pa.Table) -> pa.Table:
        i = t.column("n_common").to_numpy(zero_copy_only=False).astype(np.float64)
        na = t.column("n_grams_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t.column("n_grams_b").to_numpy(zero_copy_only=False).astype(np.float64)
        v = i / (na + nb - i)
        keep = v >= threshold
        return pa.table(
            {
                "doc_a": t.column("doc_a").to_numpy(zero_copy_only=False)[keep],
                "doc_b": t.column("doc_b").to_numpy(zero_copy_only=False)[keep],
                "jaccard": pa.array(np.round(v[keep], 6), pa.float64()),
            }
        )

    out = j.map_batches(jac, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["doc_a", "doc_b"], ignore_index=True)
    for c in ("doc_a", "doc_b"):
        out[c] = out[c].astype("int64")
    return _finalize_guard(gd, pa.Table.from_pandas(out, preserve_index=False))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash64(text: str) -> int:
    """64-bit SimHash over word unigram hashes (deterministic)."""
    words = _WORD.findall((text or "").lower())
    if not words:
        return 0
    hashes = fnv1a_u64(list(set(words)))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


class SimHashStage:
    def __call__(self, t: pa.Table) -> pa.Table:
        sims = [simhash64(s) for s in t.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "simhash": pa.array(np.array(sims, dtype=np.uint64).astype(np.int64)),
            }
        )


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup pairs: 4-segment LSH (a pair within Hamming<=3
    must share at least one 16-bit segment) + exact Hamming verify."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs, _raw = _table_meta(sf_dir, "documents")
    sims = docs.map_batches(SimHashStage(), batch_format="pyarrow")

    def explode_segments(t: pa.Table) -> pa.Table:
        h = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        segs, seg_ids, seg_no = [], [], []
        for s in range(4):
            segs.append(((h >> np.uint64(16 * s)) & np.uint64(0xFFFF)).astype(np.int64))
            seg_ids.append(ids)
            seg_no.append(np.full(len(ids), s, np.int32))
        return pa.table(
            {
                "seg_no": pa.array(np.concatenate(seg_no)),
                "seg_val": pa.array(np.concatenate(segs)),
                "doc_id": pa.array(np.concatenate(seg_ids)),
                "simhash": pa.array(np.tile(h.astype(np.int64), 4)),
            }
        )

    seg_rows = sims.map_batches(explode_segments, batch_format="pyarrow")

    # Two explicit-boundary exchanges with fully VECTORIZED block
    # sweeps -- a clustered corpus can emit near-quadratic hamming<=3
    # output, and per-group pandas dispatch (groupby.map_groups) plus a
    # hash-aggregate dedup measured 490 s where this takes seconds.
    # Width derived from data size (4 segment rows per doc).
    P = _exchange_width(n_docs * 4)
    gd = _new_guard_dir("simhash")

    def stamp_bucket(t: pa.Table) -> pa.Table:
        seg_no = t.column("seg_no").to_numpy(zero_copy_only=False).astype(np.int64)
        seg_val = t.column("seg_val").to_numpy(zero_copy_only=False)
        jp = ((seg_val * 4 + seg_no) * 1000003) % P
        return t.append_column("_jp", pa.array(jp))

    def block_pairs(t: pa.Table) -> pa.Table:
        """All (seg_no, seg_val) groups of this block (whole groups by
        the exchange): per group, capped all-pairs + hamming filter."""
        stamps, t = _pop_stamp(t, "_jp")
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64()), "_dp": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            _guard_record(gd, "simhash:jp", stamps)
            return empty
        seg_no = t.column("seg_no").to_numpy(zero_copy_only=False).astype(np.int64)
        seg_val = t.column("seg_val").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hs = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        key = seg_no * (1 << 16) + seg_val
        order = np.lexsort((ids, key))
        key, ids, hs = key[order], ids[order], hs[order]
        change = np.concatenate([[True], key[1:] != key[:-1]])
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(key)))
        out_a, out_b, out_h = [], [], []
        ovf: list[int] = []
        for s, sz in zip(starts, sizes):
            if sz < 2:
                continue
            gi, gh = ids[s : s + sz], hs[s : s + sz]
            # higher cap than the text-verify LSH: the in-bucket check
            # is one vectorized xor+popcount, cheap into the thousands
            a, b = _bucket_pairs(gi, cap=4096, what="simhash", ovf=ovf)
            if not len(a):
                continue
            ia, ib = np.triu_indices(sz, k=1) if sz <= 4096 else (None, None)
            if ia is None:  # star fallback indices
                xa = np.repeat(gh[0], sz - 1)
                xb = gh[1:]
            else:
                xa, xb = gh[ia], gh[ib]
            hd = _popcount64(xa ^ xb)
            keep = hd <= max_hamming
            out_a.append(a[keep])
            out_b.append(b[keep])
            out_h.append(hd[keep])
        _guard_record(gd, "simhash:jp", stamps, ovf)
        if not out_a:
            return empty
        da = np.concatenate(out_a)
        db = np.concatenate(out_b)
        dh = np.concatenate(out_h)
        dp = ((da * 1000003 + db) % P).astype(np.int64)
        return pa.table(
            {"doc_a": pa.array(da), "doc_b": pa.array(db),
             "hamming": pa.array(dh), "_dp": pa.array(dp)}
        )

    def block_dedup(t: pa.Table) -> pa.Table:
        stamps, t = _pop_stamp(t, "_dp")
        _guard_record(gd, "simhash:dp", stamps)
        if t.num_rows == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        h = t.column("hamming").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, h = a[order], b[order], h[order]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return pa.table(
            {"doc_a": pa.array(a[first]), "doc_b": pa.array(b[first]),
             "hamming": pa.array(h[first].astype(np.int64))}
        )

    pairs = (
        seg_rows.map_batches(stamp_bucket, batch_format="pyarrow")
        .sort("_jp", boundaries=list(range(1, P)))
        .map_batches(block_pairs, batch_size=None, batch_format="pyarrow")
        .sort("_dp", boundaries=list(range(1, P)))
        .map_batches(block_dedup, batch_size=None, batch_format="pyarrow")
    )
    dd = pairs.to_pandas()
    dd = dd.sort_values(["doc_a", "doc_b"], ignore_index=True)
    for c in ("doc_a", "doc_b", "hamming"):
        dd[c] = dd[c].astype("int64")
    return _finalize_guard(gd, pa.Table.from_pandas(dd, preserve_index=False))


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------
def _embedding_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, float64 matrix) from a list<float> column, zero-copy
    off the Arrow value buffer (reshape, no per-row pylist)."""
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    emb = t.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    n = len(emb)
    if pa.types.is_fixed_size_list(emb.type):
        vals = emb.values.to_numpy(zero_copy_only=False)
        return ids, vals.reshape(n, emb.type.list_size).astype(np.float64)
    offsets = emb.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if n and emb.null_count == 0 and (widths == widths[0]).all():
        dim = int(widths[0])
        # flatten() honors the array's offset/slice into the buffer
        vals = emb.flatten().to_numpy(zero_copy_only=False)
        return ids, vals.reshape(n, dim).astype(np.float64)
    return ids, np.asarray(emb.to_pylist(), dtype=np.float64)  # ragged fallback


class CosineTopK:
    """Actor-pool stage: per-batch brute-force cosine vs the broadcast
    query matrix, emitting each batch's local top-k per query (the
    partial aggregate; final top-k is a tiny driver-side merge)."""

    def __init__(self, queries_ref, k: int):
        import ray

        q_ids, q = (
            ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        )
        self.q_ids = q_ids
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.q = qn
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(t)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        sims = self.q @ mat.T  # (Q, n)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            out_q.append(np.full(k, self.q_ids[qi], np.int64))
            out_v.append(ids[top[qi]])
            out_s.append(sims[qi, top[qi]])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


#: per-worker-process stage cache (same pattern as stages/process.py):
#: a cached task fn amortizes broadcast fetch + setup once per worker
#: WITHOUT the per-dataset-execution actor-pool spin-up that dominated
#: these sub-second queries (measured: ~2 s/call of pure pool startup).
_STAGE_CACHE: dict = {}


def _cached_stage(key, factory):
    def fn(batch):
        stage = _STAGE_CACHE.get(key)
        if stage is None:
            if len(_STAGE_CACHE) > 8:
                _STAGE_CACHE.clear()
            stage = factory()
            _STAGE_CACHE[key] = stage
        return stage(batch)

    fn.__name__ = f"stage_{key[0] if isinstance(key, tuple) else key}"
    return fn


def _query_vectors(sf_dir: str, n_queries: int):
    """Query matrix via parquet predicate pushdown (row-group pruning;
    only the tiny query set leaves storage)."""
    import pyarrow.parquet as _pq

    head = _pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    return _embedding_matrix(head)


def ann_cosine_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pa.Table:
    """Brute-force cosine top-k: the first ``n_queries`` vectors are the
    query set (broadcast once); candidates stream through map_batches.

    Returns (query_id, vec_id, sim) -- sim rounded to 6 dp; ranking by
    (sim desc, vec_id asc); self-matches excluded.
    """
    import ray

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_ids, q_mat = _query_vectors(sf_dir, n_queries)
    ref = ray.put((q_ids, q_mat))

    partial = emb.map_batches(
        _cached_stage(
            ("topk", ref.hex(), k), lambda: CosineTopK(ref, k + 1)
        ),
        batch_format="pyarrow",
    )
    df = partial.to_pandas()
    df = df[~(df["query_id"] == df["vec_id"])]
    df["sim_r"] = np.round(df["sim"], 6)
    df = df.sort_values(
        ["query_id", "sim_r", "vec_id"], ascending=[True, False, True]
    )
    out = df.groupby("query_id", sort=True).head(k)
    out = out[["query_id", "vec_id", "sim_r"]].reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


#: planted vec_ids start here (far above any driver-table id)
PLANT_BASE = 10_000_000


def _planted_neighbor_rows(sf_dir: str, n_queries: int, k: int) -> pa.Table:
    """The planted-fixture oracle input for the approximate ANN paths
    (VERDICT r2 #2): ``k`` scalar multiples of each query vector at
    ``vec_id = PLANT_BASE + q*16 + j``, scaled by 2^(j+1).

    Power-of-two scaling is EXACT in IEEE float, so each planted row
    has bit-identical direction to its query: identical hyperplane
    signs in every LSH band and identical nearest-centroid assignment
    in IVF.  Recall of the planted top-k is therefore provable (not
    probabilistic), cosine is exactly 1.0 after 6-dp rounding, and the
    expected output is a pure-SQL statement over the embeddings table
    (see __ray_entry__._ANN_PLANTED_SQL)."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    emb_type = t.schema.field("embedding").type
    ids, rows = [], []
    for q, vec in zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()):
        arr = np.asarray(vec, dtype=np.float32)
        for j in range(k):
            ids.append(PLANT_BASE + q * 16 + j)
            rows.append((arr * np.float32(2.0 ** (j + 1))).tolist())
    return pa.table(
        {"vec_id": pa.array(ids, pa.int64()), "embedding": pa.array(rows, emb_type)}
    )


def ann_cosine_topk_lsh(sf_dir: str, n_queries: int = 5, k: int = 10,
                        n_planes: int = 12,
                        plant_neighbors: bool = False) -> pa.Table:
    """Scale-path ANN: random-hyperplane LSH buckets prune candidates;
    only vectors sharing a bucket (original or 1-bit-flip probe) with a
    query are scored.  Approximate by construction on arbitrary data;
    with ``plant_neighbors`` the input is unioned with exact scalar
    multiples of the queries (see ``_planted_neighbor_rows``) whose
    recall is provable, giving the query an exact SQL oracle."""
    import ray

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if plant_neighbors:
        import ray.data as rd

        emb = emb.union(rd.from_arrow(_planted_neighbor_rows(sf_dir, n_queries, k)))
    q_ids, q_mat = _query_vectors(sf_dir, n_queries)
    dim = q_mat.shape[1]
    planes = np.random.default_rng(7).standard_normal((n_planes, dim))

    def sig(mat: np.ndarray) -> np.ndarray:
        return ((mat @ planes.T) > 0) @ (1 << np.arange(n_planes))

    q_sig = sig(q_mat)
    # multi-probe: original signature + all 1-bit flips
    probes = set()
    for s in q_sig:
        probes.add(int(s))
        for b in range(n_planes):
            probes.add(int(s) ^ (1 << b))
    probes_arr = np.array(sorted(probes), dtype=np.int64)
    ref = ray.put((q_ids, q_mat, probes_arr))

    class Stage:
        def __init__(self):
            ids, q, pr = ray.get(ref)
            self.inner = CosineTopK((ids, q), k + 1)
            self.probes = pr

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _embedding_matrix(t)
            s = sig(mat)
            keep = np.isin(s, self.probes)
            if not keep.any():
                return pa.table(
                    {"query_id": pa.array([], pa.int64()),
                     "vec_id": pa.array([], pa.int64()),
                     "sim": pa.array([], pa.float64())}
                )
            return self.inner(t.filter(pa.array(keep)))

    partial = emb.map_batches(
        _cached_stage(("annlsh", ref.hex(), k), Stage), batch_format="pyarrow"
    )
    df = partial.to_pandas()
    if df.empty:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "sim_r": pa.array([], pa.float64())})
    df = df[~(df["query_id"] == df["vec_id"])]
    df["sim_r"] = np.round(df["sim"], 6)
    df = df.sort_values(["query_id", "sim_r", "vec_id"], ascending=[True, False, True])
    out = df.groupby("query_id", sort=True).head(k)[["query_id", "vec_id", "sim_r"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def _kmeans_fit(sample: np.ndarray, k: int, iters: int = 8, seed: int = 17) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (IVF coarse
    quantizer).  Normalized vectors, cosine via dot product."""
    rng = np.random.default_rng(seed)
    sample = sample / np.clip(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12, None)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cent[c] = v / n
    return cent


def ann_cosine_topk_ivf(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    train_sample: int = 20_000,
    plant_neighbors: bool = False,
) -> pa.Table:
    """IVF scale-path ANN: a coarse k-means quantizer (fit on a
    driver-side sample, centroids broadcast) prunes candidates to the
    ``n_probe`` nearest clusters of each query; exact cosine only
    inside probed clusters.  Approximate by construction on arbitrary
    data; with ``plant_neighbors`` the input carries exact scalar
    multiples of the queries (bit-identical direction -> identical
    nearest-centroid assignment -> always inside the probed cluster),
    so recall of the planted top-k is provable and the query gets an
    exact SQL oracle (see ``_planted_neighbor_rows``)."""
    import ray

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if plant_neighbors:
        import ray.data as rd

        emb = emb.union(rd.from_arrow(_planted_neighbor_rows(sf_dir, n_queries, k)))
    sample_tbl = pa.Table.from_pylist(emb.take(train_sample))
    _, sample = _embedding_matrix(sample_tbl)
    cent = _kmeans_fit(sample, n_clusters)

    q_ids, q_mat = _query_vectors(sf_dir, n_queries)
    qn = q_mat / np.clip(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12, None)
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]   # (Q, n_probe)
    probe_set = np.unique(probes)
    ref = ray.put((q_ids, q_mat, cent, probes, probe_set))

    class Stage:
        def __init__(self):
            ids, q, c, pr, ps = ray.get(ref)
            self.inner = CosineTopK((ids, q), k + 1)
            self.cent = c
            self.q_probes = {int(qid): set(map(int, row)) for qid, row in zip(ids, pr)}
            self.probe_set = ps

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _embedding_matrix(t)
            matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
            assign = np.argmax(matn @ self.cent.T, axis=1)
            keep = np.isin(assign, self.probe_set)
            if not keep.any():
                return pa.table(
                    {"query_id": pa.array([], pa.int64()),
                     "vec_id": pa.array([], pa.int64()),
                     "sim": pa.array([], pa.float64()),
                     "cluster": pa.array([], pa.int64())}
                )
            sub = t.filter(pa.array(keep))
            scored = self.inner(sub)
            # tag candidate cluster so per-query probe filtering works
            cl = dict(zip(ids[keep].tolist(), assign[keep].tolist()))
            clusters = [cl[v] for v in scored.column("vec_id").to_pylist()]
            return scored.append_column("cluster", pa.array(clusters, pa.int64()))

    partial = emb.map_batches(
        _cached_stage(("annivf", ref.hex(), k), Stage), batch_format="pyarrow"
    )
    df = partial.to_pandas()
    if df.empty:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "sim_r": pa.array([], pa.float64())})
    # keep only candidates inside each query's probed clusters
    probes_by_q = {int(qid): set(map(int, row)) for qid, row in zip(q_ids, probes)}
    df = df[
        [c in probes_by_q[q] for q, c in zip(df["query_id"], df["cluster"])]
    ]
    df = df[~(df["query_id"] == df["vec_id"])].copy()
    df["sim_r"] = np.round(df["sim"], 6)
    df = df.sort_values(["query_id", "sim_r", "vec_id"], ascending=[True, False, True])
    out = df.groupby("query_id", sort=True).head(k)[["query_id", "vec_id", "sim_r"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def embedding_near_dup_exact(sf_dir: str, tau: float = 0.95) -> pa.Table:
    """EXACT all-pairs cosine >= tau -- the embedding near-dup verify
    kernel as a standalone SQL-checkable gate (the LSH path's recall is
    measured against this; same role dedup_ngram_jaccard plays for the
    MinHash family).

    Candidates stream through map_batches against the full normalized
    matrix broadcast once via ray.put (batch x all matmul, upper
    triangle by vec_id).  O(N^2/batch) work by definition -- the
    correctness kernel, not the scale path; at scale, tile the
    broadcast side into column chunks."""
    import ray

    n_vecs, _ = _table_meta(sf_dir, "embeddings")
    if n_vecs > EXACT_KERNEL_MAX_ROWS:
        raise ValueError(
            f"embedding_near_dup_exact is the O(n^2) VERIFY kernel and is "
            f"bounded at {EXACT_KERNEL_MAX_ROWS} vectors ({n_vecs} given); "
            "use embedding_near_dup (banded-LSH scale path) for full "
            "corpora, or raise dataops.EXACT_KERNEL_MAX_ROWS explicitly "
            "if you really want the quadratic pass"
        )
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    import pyarrow.parquet as _pq

    full = _pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    all_ids, all_mat = _embedding_matrix(full)
    all_n = all_mat / np.clip(
        np.linalg.norm(all_mat, axis=1, keepdims=True), 1e-12, None
    )
    ref = ray.put((all_ids.astype(np.int64), all_n))

    class Stage:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _embedding_matrix(t)
            ids = ids.astype(np.int64)
            matn = mat / np.clip(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None
            )
            sims = matn @ self.mat.T  # (batch, N)
            ia, ib = np.nonzero(
                (sims >= tau) & (ids[:, None] < self.ids[None, :])
            )
            return pa.table(
                {
                    "vec_a": pa.array(ids[ia]),
                    "vec_b": pa.array(self.ids[ib]),
                    "sim_r": pa.array(np.round(sims[ia, ib], 6), pa.float64()),
                }
            )

    out = emb.map_batches(
        _cached_stage(("embexact", ref.hex(), tau), Stage),
        batch_format="pyarrow",
    ).to_pandas()
    out = out.sort_values(["vec_a", "vec_b"], ignore_index=True)
    for c in ("vec_a", "vec_b"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def near_dup_bands_for(n_vectors: int, n_planes: int = 8) -> int:
    """Banding config sized to data scale: expected bucket occupancy is
    n / 2^n_planes per band, so recall is recovered by adding
    independent bands (OR-construction) as n grows -- each band is an
    independent chance for a near-dup pair to collide.  ~log2(n) bands
    keeps the per-pair miss probability roughly flat as n scales
    (documented recall/cost trade; see test_embedding_near_dup_recall).
    """
    return max(2, min(16, int(np.ceil(np.log2(max(n_vectors, 2))) - 6)))


#: in-bucket all-pairs cap for the embedding near-dup sweep; the
#: in-bucket check is one matmul, cheap into the thousands
EMB_BUCKET_CAP = 4096


def embedding_near_dup(
    sf_dir: str,
    tau: float = 0.95,
    n_planes: int = 8,
    n_bands: int | None = None,
    plant_copies: bool = False,
) -> pa.Table:
    """Embedding-cosine near-dup pairs (sim >= tau) via banded
    hyperplane-LSH: ``n_bands`` independent 2^n_planes bucketings
    (OR-construction for recall), groupby(band, bucket), in-bucket
    exact cosine; oversized buckets star-pair against the bucket
    representative (never silently dropped).  Pair dedup across bands
    is a distributed groupby.

    ``plant_copies`` unions the input with exact x2 scalar copies of
    every ``vec_id % 7 == 0`` vector at ``PLANT_BASE + vec_id``.  A x2
    copy has bit-identical direction (power-of-two float scaling is
    exact), so it collides with its original in EVERY band -- recall
    of the planted pairs is provable, and with tau above the data's
    max natural cosine the expected output is exactly the planted
    pairs, restated in SQL over a derived-table CTE
    (__ray_entry__._EMBED_ND_PLANTED_SQL).  The oracle recomputes the
    full exact all-pairs sweep, so if the no-natural-pair assumption
    ever broke, the gate would fail loudly rather than silently
    trusting the LSH."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n_vec, _raw = _table_meta(sf_dir, "embeddings")
    if plant_copies:
        import pyarrow.parquet as _pq

        etype = (
            _pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
            .schema_arrow.field("embedding")
            .type
        )

        def mk_copies(t: pa.Table, _etype=etype) -> pa.Table:
            empty = pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "embedding": pa.array([], _etype)}
            )
            if t.num_rows == 0:
                return empty
            ids, mat = _embedding_matrix(t)
            keep = (ids % 7) == 0
            if not keep.any():
                return empty
            sub_ids = ids[keep].astype(np.int64) + PLANT_BASE
            vals = (mat[keep] * 2.0).astype(np.float32)
            n, dim = vals.shape
            arr = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
                pa.array(vals.reshape(-1)),
            )
            return pa.table(
                {"vec_id": pa.array(sub_ids), "embedding": arr.cast(_etype)}
            )

        emb = emb.union(emb.map_batches(mk_copies, batch_format="pyarrow"))
    if n_bands is None:
        n_bands = near_dup_bands_for(n_vec, n_planes)
    # band rows carry the embedding payload -> budget fewer rows/block
    pair_w = _exchange_width(n_vec * n_bands, rows_per_block=500_000)
    gd = _new_guard_dir("embnd")
    dim = len(pa.Table.from_pylist(emb.take(1)).column("embedding")[0])
    planes = [
        np.random.default_rng(11 + band).standard_normal((n_planes, dim))
        for band in range(n_bands)
    ]

    def bucketize(t: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(t)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        matn = mat / norms
        n = len(ids)
        bands, buckets, out_ids, emb_idx = [], [], [], []
        for band, pl in enumerate(planes):
            s = (((matn @ pl.T) > 0) @ (1 << np.arange(n_planes))).astype(np.int64)
            bands.append(np.full(n, band, np.int32))
            buckets.append(s)
            out_ids.append(ids.astype(np.int64))
            emb_idx.append(np.arange(n))
        take = pa.array(np.concatenate(emb_idx))
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "bucket": pa.array(np.concatenate(buckets)),
                "vec_id": pa.array(np.concatenate(out_ids)),
                "embedding": t.column("embedding").take(take),
            }
        )

    # exchange on (band, bucket) + vectorized block sweep (same pattern
    # as the minhash/simhash candidate paths: no per-bucket dispatch)
    def stamp(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = t.column("bucket").to_numpy(zero_copy_only=False)
        jp = np.abs((bucket * 1000003 + band)) % pair_w
        return t.append_column("_jp", pa.array(jp.astype(np.int64)))

    def block_pairs(t: pa.Table) -> pa.Table:
        stamps, t = _pop_stamp(t, "_jp")
        empty = pa.table(
            {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
             "sim_r": pa.array([], pa.float64()), "_dp": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            _guard_record(gd, "embnd:jp", stamps)
            return empty
        ids, mat = _embedding_matrix(t)
        ids = ids.astype(np.int64)
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = t.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        key = bucket * np.int64(len(planes)) + band
        order = np.lexsort((ids, key))
        ids, key, mat = ids[order], key[order], mat[order]
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        change = np.concatenate([[True], key[1:] != key[:-1]])
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(ids)))
        out_a, out_b, out_s = [], [], []
        ovf: list[int] = []
        for s, sz in zip(starts, sizes):
            if sz < 2:
                continue
            gi, gm = ids[s : s + sz], matn[s : s + sz]
            if sz > EMB_BUCKET_CAP:
                log.warning(
                    "embedding near-dup bucket overflow: %d members; "
                    "star-verifying against representative %s", sz, gi[0],
                )
                ovf.append(int(sz))
                sims = gm[1:] @ gm[0]
                keep = sims >= tau
                out_a.append(np.full(int(keep.sum()), gi[0], np.int64))
                out_b.append(gi[1:][keep])
                out_s.append(np.round(sims[keep], 6))
                continue
            sims = gm @ gm.T
            ia, ib = np.triu_indices(sz, k=1)
            keep = sims[ia, ib] >= tau
            out_a.append(gi[ia[keep]])
            out_b.append(gi[ib[keep]])
            out_s.append(np.round(sims[ia[keep], ib[keep]], 6))
        _guard_record(gd, "embnd:jp", stamps, ovf)
        if not out_a:
            return empty
        va = np.concatenate(out_a)
        vb = np.concatenate(out_b)
        vs = np.concatenate(out_s)
        dp = ((va * 1000003 + vb) % pair_w).astype(np.int64)
        return pa.table(
            {"vec_a": pa.array(va), "vec_b": pa.array(vb),
             "sim_r": pa.array(vs, pa.float64()), "_dp": pa.array(dp)}
        )

    def block_dedup(t: pa.Table) -> pa.Table:
        stamps, t = _pop_stamp(t, "_dp")
        _guard_record(gd, "embnd:dp", stamps)
        if t.num_rows == 0:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
                 "sim_r": pa.array([], pa.float64())}
            )
        a = t.column("vec_a").to_numpy(zero_copy_only=False)
        b = t.column("vec_b").to_numpy(zero_copy_only=False)
        s = t.column("sim_r").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, s = a[order], b[order], s[order]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return pa.table(
            {"vec_a": pa.array(a[first]), "vec_b": pa.array(b[first]),
             "sim_r": pa.array(s[first], pa.float64())}
        )

    pairs = (
        emb.map_batches(bucketize, batch_format="pyarrow")
        .map_batches(stamp, batch_format="pyarrow")
        .sort("_jp", boundaries=list(range(1, pair_w)))
        .map_batches(block_pairs, batch_size=None, batch_format="pyarrow")
        .sort("_dp", boundaries=list(range(1, pair_w)))
        .map_batches(block_dedup, batch_size=None, batch_format="pyarrow")
    )
    dd = pairs.to_pandas()
    empty = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
         "sim_r": pa.array([], pa.float64())}
    )
    if dd.empty:
        return _finalize_guard(gd, empty)
    dd = dd.sort_values(["vec_a", "vec_b"], ignore_index=True)
    for c in ("vec_a", "vec_b"):
        dd[c] = dd[c].astype("int64")
    return _finalize_guard(gd, pa.Table.from_pandas(dd, preserve_index=False))


def corpus_curation(
    sf_dir: str,
    lang: str = "en",
    min_tokens: int = 5,
    min_alpha: float = 0.45,
) -> pa.Table:
    """End-to-end training-corpus curation in ONE streaming pass:
    language-id filter -> quality filter (token count, alpha ratio)
    -> exact dedup (keep min doc_id per content hash) -> per-doc
    token stats.  The composition a real data pipeline applies before
    tokenization, expressed as a single Dataset so each stage's
    output never materializes: lang/quality/hash compute fuses into
    one map_batches, survivors flow through one hash exchange for the
    exact dedup (same combiner -> boundary-exchange -> sweep shape as
    ``dedup_exact``), and only the curated stats reach the caller."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs, _ = _table_meta(sf_dir, "documents")
    P = _exchange_width(n_docs)
    gd = _new_guard_dir("curation")

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("bpeish_tokens", pa.int64()),
        ]
    )

    def stage1(t: pa.Table) -> pa.Table:
        lang_pred = textfn.lang_id_batch(t.column("text"))
        q = textfn.quality_features(t.column("text"))
        tok = textfn.token_counts(t.column("text"))
        keep = pc.and_(
            pc.equal(lang_pred, lang),
            pc.and_(
                pc.greater_equal(q["n_tokens"], min_tokens),
                pc.greater_equal(q["alpha_ratio"], min_alpha),
            ),
        )
        t2 = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
                "n_tokens": q["n_tokens"],
                "bpeish_tokens": tok["bpeish_tokens"],
            }
        ).filter(keep)
        t2 = md5_hash_batch(t2)
        t2 = t2.drop_columns(["text"])
        # block-local first-per-hash combiner (bounds shuffle volume)
        idx = pc.sort_indices(
            t2,
            sort_keys=[("content_hash", "ascending"), ("doc_id", "ascending")],
        )
        t2 = t2.take(idx)
        h = t2.column("content_hash").combine_chunks()
        n = len(h)
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        t2 = t2.filter(pa.array(first))
        if t2.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "bpeish_tokens": pa.array([], pa.int64()),
                    "content_hash": pa.array([], pa.string()),
                    "_p": pa.array([], pa.int64()),
                }
            )
        return t2.append_column(
            "_p", pa.array(partition_ids(t2.column("content_hash"), P))
        )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "cur", t.column("_p").to_numpy(zero_copy_only=False)
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[("content_hash", "ascending"), ("doc_id", "ascending")],
        )
        t = t.take(idx)
        h = t.column("content_hash").combine_chunks()
        n = len(h)
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        return (
            t.filter(pa.array(first))
            .select(["doc_id", "n_tokens", "bpeish_tokens"])
            .cast(out_schema)
        )

    res = (
        ds.map_batches(stage1, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    return _finalize_guard(gd, t)


def word_freq_topk(sf_dir: str, k: int = 50) -> pa.Table:
    """Corpus vocabulary: top-k word frequencies over documents.text.

    Two-level aggregation: per-batch ``np.unique`` word counts (the
    combiner -- each batch ships at most |vocab_batch| rows, not
    |words|) -> ``groupby(word).sum`` -> top-k by (n desc, word asc).
    The distributed groupby carries vocabulary-sized data (bounded by
    distinct words, not corpus size), so this shape holds at 100 TB.
    """
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        words: list[str] = []
        for s in t.column("text").to_pylist():
            words.extend(_WORD.findall((s or "").lower()))
        if not words:
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(words, dtype=object), return_counts=True)
        return pa.table(
            {"word": pa.array(list(uniq), pa.string()),
             "n": pa.array(counts.astype(np.int64))}
        )

    agg = ds.map_batches(partial_counts, batch_format="pyarrow").groupby(
        "word"
    ).sum("n")
    df = agg.to_pandas()
    df = df.rename(columns={"sum(n)": "n"})
    df["n"] = df["n"].astype("int64")
    df = df.sort_values(["n", "word"], ascending=[False, True], ignore_index=True)
    return pa.Table.from_pandas(df.head(k), preserve_index=False)


def word_bigram_topk(sf_dir: str, k: int = 40) -> pa.Table:
    """Collocation mining: the top-``k`` word BIGRAMS across
    ``documents.text`` (within-document adjacent token pairs, shared
    tokenizer), each with its pair count AND both unigram marginals
    -- the integer ingredients of every association score (PMI,
    lift, chi-square), kept as exact counts so the gate needs no
    transcendental arithmetic.  Returns ``(w1, w2, n_pair, n_w1,
    n_w2)`` ordered by ``(n_pair desc, w1, w2)``.

    Distributed shape: ONE documents pass emits both gram kinds into
    one tagged partial relation (``b:`` bigrams / ``u:`` unigrams,
    NUL-joined -- the token alphabet excludes NUL), per-batch
    ``np.unique`` combiners bound each block's output by its distinct
    grams, one ``groupby.sum`` merges them, and the top-k is a
    DISTRIBUTED sort+limit over the gram-vocabulary-sized aggregate
    -- the driver only ever holds the k winners plus their <=2k
    marginal lookups (probed from the same aggregate with a broadcast
    membership filter), never the vocabulary."""
    ds = _read(sf_dir, "documents", columns=["text"])
    gram_schema = pa.schema([("g", pa.string()), ("n", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        grams: list[str] = []
        for s in t.column("text").to_pylist():
            toks = _WORD.findall((s or "").lower())
            grams.extend("u:" + w for w in toks)
            grams.extend(
                "b:" + a + "\x00" + b for a, b in zip(toks, toks[1:])
            )
        if not grams:
            return gram_schema.empty_table()
        uniq, counts = np.unique(np.asarray(grams, dtype=object),
                                 return_counts=True)
        return pa.table(
            {"g": pa.array(list(uniq), pa.string()),
             "n": pa.array(counts.astype(np.int64))},
            schema=gram_schema,
        )

    agg = ds.map_batches(partials, batch_format="pyarrow").groupby("g").sum("n")

    def only_pairs(t: pa.Table) -> pa.Table:
        return t.filter(pc.starts_with(t.column("g"), "b:"))

    top = (
        agg.map_batches(only_pairs, batch_format="pyarrow")
        .sort(["sum(n)", "g"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    pairs = [g[2:].split("\x00") for g in top["g"]]
    need = sorted({w for p in pairs for w in p})

    def probe(t: pa.Table, _need=frozenset("u:" + w for w in need)) -> pa.Table:
        mask = pc.is_in(
            t.column("g"), value_set=pa.array(list(_need), pa.string())
        )
        return t.filter(mask)

    uni = agg.map_batches(probe, batch_format="pyarrow").to_pandas()
    un = {g[2:]: int(n) for g, n in zip(uni["g"], uni["sum(n)"])}
    return pa.table(
        {
            "w1": pa.array([p[0] for p in pairs], pa.string()),
            "w2": pa.array([p[1] for p in pairs], pa.string()),
            "n_pair": pa.array(
                top["sum(n)"].astype("int64").to_numpy(), pa.int64()
            ),
            "n_w1": pa.array([un[p[0]] for p in pairs], pa.int64()),
            "n_w2": pa.array([un[p[1]] for p in pairs], pa.int64()),
        }
    )


class _UnigramScorer:
    """Actor-pool stage for ``doc_lm_score``: holds the broadcast
    (sorted vocab, micro-nat log-prob) arrays, scores each batch's
    documents with searchsorted + int64 sums (no per-token Python
    beyond the shared tokenizer)."""

    def __init__(self, model_ref):
        import ray

        vocab, lp, oov_lp = (
            ray.get(model_ref)
            if not isinstance(model_ref, tuple) else model_ref
        )
        self.vocab = vocab    # sorted object array of words
        self.lp = lp          # int64 micro-nats, aligned with vocab
        self.oov_lp = oov_lp  # None (uncapped: OOV = drift, raise)

    def __call__(self, t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
             ("sum_lp_micro", pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids, n_tok, sums = [], [], []
        for did, s in zip(ids, t.column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            if not toks:
                continue  # no model evaluation for empty docs (= SQL join)
            w = np.asarray(toks, dtype=object)
            pos = np.clip(np.searchsorted(self.vocab, w), 0,
                          len(self.vocab) - 1)
            hit = self.vocab[pos] == w
            if not bool(np.all(hit)) and self.oov_lp is None:
                raise ValueError(
                    "doc_lm_score: token absent from the pass-1 vocabulary "
                    "(tokenizer drift between passes)"
                )
            tok_lp = np.where(hit, self.lp[pos],
                              np.int64(self.oov_lp or 0))
            doc_ids.append(int(did))
            n_tok.append(len(toks))
            sums.append(int(tok_lp.sum()))
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "n_tokens": pa.array(n_tok, pa.int64()),
             "sum_lp_micro": pa.array(sums, pa.int64())},
            schema=out_schema,
        )


def _doc_lm_scored(sf_dir: str, vocab_cap: int | None = None):
    """Shared body of ``doc_lm_score`` / ``doc_lm_score_sink``: trains
    the unigram model (pass 1) and returns the LAZY scored Dataset of
    ``(doc_id, n_tokens, sum_lp_micro)`` rows (pass 2) -- the caller
    decides the finisher (driver table at gate scale, partitioned
    Parquet sink at corpus scale)."""
    import ray

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        words: list[str] = []
        for s in t.column("text").to_pylist():
            words.extend(_WORD.findall((s or "").lower()))
        if not words:
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(
            np.asarray(words, dtype=object), return_counts=True
        )
        return pa.table(
            {"word": pa.array(list(uniq), pa.string()),
             "n": pa.array(counts.astype(np.int64))}
        )

    freq = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("word").sum("n").to_pandas()
    )
    counts = freq["sum(n)"].to_numpy().astype(np.int64)
    vocab = freq["word"].to_numpy().astype(object)
    order = np.argsort(vocab, kind="stable")
    vocab, counts = vocab[order], counts[order]
    total = int(counts.sum())
    capped = vocab_cap is not None and len(vocab) > vocab_cap
    if capped:
        keep = np.argsort(-counts, kind="stable")[:vocab_cap]
        mask = np.zeros(len(vocab), bool)
        mask[keep] = True
        vocab, counts = vocab[mask], counts[mask]
    # total stays the FULL corpus token count even when capped, so
    # retained-word probabilities are unchanged by the cap
    lp = np.floor(1e6 * np.log(counts.astype(np.float64) / total)).astype(
        np.int64
    )
    oov_lp = int(lp.min()) if capped else None
    model_ref = ray.put((vocab, lp, oov_lp))

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _cached_stage(
            ("lmscore", model_ref.hex()), lambda: _UnigramScorer(model_ref)
        ),
        batch_format="pyarrow",
    )


def doc_lm_score(sf_dir: str, vocab_cap: int | None = None) -> pa.Table:
    """Per-document unigram language-model score -- the CCNet/KenLM
    perplexity-filter shape every web-corpus pipeline runs before
    training, restated as an exactly-checkable unigram model over the
    corpus itself (public method: Wenzek et al., "CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data", 2020).

    Pass 1 trains: corpus-wide word counts via the same
    vocabulary-bounded two-level aggregate as ``word_freq_topk``
    (per-block ``np.unique`` combiner -> ``groupby.sum``; the exchange
    carries |vocab| rows, never |tokens|).  The driver quantizes each
    DISTINCT word's log-probability to integer micro-nats --
    ``floor(1e6 * ln(n_w / n_total))``, one double op per vocab entry,
    restated verbatim in the DuckDB oracle -- and broadcasts the
    (sorted vocab, lp) arrays once via ``ray.put``.

    Pass 2 scores: stateless searchsorted lookup + int64 sums per
    batch (``_UnigramScorer``).  All cross-engine arithmetic after the
    per-word quantization is integer, so scores match the oracle
    bit-for-bit; zero-token docs are dropped on both sides.

    Scale: pass 1 is the proven vocab-bounded shape; pass 2 is
    embarrassingly parallel.  At 100 TB pass vocab_cap to clamp the
    broadcast model to the top-V words (OOV scored at the rarest
    retained word's lp); the gate runs uncapped so the oracle is the
    full exact model.

    This finisher returns the PER-DOCUMENT table (gate-scale exact
    row check); at corpus scale use :func:`doc_lm_score_sink`, which
    streams the same rows to a resumable partitioned-Parquet sink and
    returns only a bounded digest."""
    scored = _doc_lm_scored(sf_dir, vocab_cap)
    df = scored.to_pandas().sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def sink_prepare(out_dir: str, key_col: str, num_partitions: int) -> set:
    """Open (or begin) a resumable sink dir.  Three duties shared by
    every sink writer (review findings, round 5):

    1. parameter manifest ``_sink.json`` is written BEFORE any part
       file (tmp+rename), so even a crashed first attempt records how
       it was partitioned; a re-run with DIFFERENT ``key_col`` /
       ``num_partitions`` fails loudly instead of silently mixing two
       partitionings (file-presence resume alone cannot detect that);
    2. ``.tmp-*`` orphans of crashed attempts are removed -- Ray's
       ``read_parquet(dir)`` has no extension filter and would read a
       complete orphan BACK as duplicate rows (empirically verified);
    3. returns the set of already-published partition ids.
    """
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    man_path = os.path.join(out_dir, "_sink.json")
    params = {"key_col": key_col, "num_partitions": int(num_partitions)}
    done = {
        int(f[5:10])
        for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    }
    if os.path.exists(man_path):
        with open(man_path) as f:
            prev = json.load(f)
        if prev != params:
            raise ValueError(
                f"sink dir {out_dir!r} was started with {prev}, now asked "
                f"for {params}; resuming would mix two partitionings -- "
                "use a fresh directory"
            )
    else:
        if done:
            raise ValueError(
                f"sink dir {out_dir!r} holds part files but no _sink.json "
                "parameter manifest; cannot prove they used the same "
                "partitioning -- use a fresh directory"
            )
        tmp = man_path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, man_path)
    for f in os.listdir(out_dir):
        if ".tmp-" in f:
            os.unlink(os.path.join(out_dir, f))
    return done


def publish_part(out_dir: str, p: int, table: pa.Table) -> bool:
    """Atomic (tmp+rename) publish of one partition file; returns
    False when the final file already exists (idempotent resume)."""
    import os

    import pyarrow.parquet as pq_

    final = os.path.join(out_dir, f"part-{int(p):05d}.parquet")
    if os.path.exists(final):
        return False
    tmp = final + f".tmp-{os.getpid()}"
    pq_.write_table(table, tmp)
    os.replace(tmp, final)
    return True


def sink_files(out_dir: str) -> list:
    """Only PUBLISHED part files, for read-back -- never manifests or
    ``.tmp-*`` orphans (Ray's read_parquet(dir) would read those)."""
    import os

    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )


def sink_hash_partitioned(
    ds, out_dir: str, key_col: str, num_partitions: int,
    sort_keys: list | None = None, out_schema: pa.Schema | None = None,
) -> dict:
    """Generic resumable hash-partitioned Parquet sink for a Dataset
    whose output is input-sized (``curate_to_parquet`` and the
    sink-variant gates run on this): stamp ``_part = hash(key) % P``,
    ONE explicit-boundary exchange, one writer task per partition
    publishing ``part-{p:05d}.parquet`` via tmp+rename.  Partitions
    whose final file already exists are pruned at PLAN time (their
    rows never enter the exchange), so a crashed run resumes by
    paying only for missing partitions; ``sink_prepare`` guards
    against parameter drift and cleans crashed-attempt orphans.
    Returns ``{"written": [...], "skipped": [...], "rows": {p: n}}``.
    """
    import os

    done = sink_prepare(out_dir, key_col, num_partitions)
    todo = sorted(set(range(num_partitions)) - done)
    result: dict = {"written": [], "skipped": sorted(done), "rows": {}}
    if not todo:
        return result
    todo_np = np.asarray(todo, np.int64)

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_part", pa.array([], pa.int64()))
        parts = partition_ids(t.column(key_col), num_partitions)
        t = t.append_column("_part", pa.array(parts))
        return t.filter(pa.array(np.isin(parts, todo_np)))

    lineage_schema = pa.schema([("part_id", pa.int64()), ("rows", pa.int64())])
    if out_schema is None:
        out_schema = pa.schema([f for f in ds.schema().base_schema])
    sk = sort_keys or [(key_col, "ascending")]

    def write_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return lineage_schema.empty_table()
        out = []
        for p in pc.unique(t.column("_part")).to_pylist():
            g = t.filter(pc.equal(t.column("_part"), p)).drop(["_part"])
            g = g.take(pc.sort_indices(g, sort_keys=sk))
            publish_part(out_dir, int(p), g)
            out.append({"part_id": int(p), "rows": g.num_rows})
        return pa.Table.from_pylist(out, schema=lineage_schema)

    lineage = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_part", boundaries=list(range(1, num_partitions)))
        .map_batches(write_part, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    for r in lineage.to_dict("records"):
        result["written"].append(int(r["part_id"]))
        result["rows"][int(r["part_id"])] = int(r["rows"])
    # empty partitions still publish a typed empty file so a resume
    # run can tell "done" from "missing"
    for p in todo:
        if p not in result["rows"]:
            publish_part(out_dir, p, out_schema.empty_table())
            result["written"].append(p)
            result["rows"][p] = 0
    result["written"].sort()
    return result


def bucket_digest(
    ds, id_col: str, sum_cols: dict[str, str], n_buckets: int = 64,
    count_col: str = "n_rows",
) -> pa.Table:
    """Bounded integer digest of an input-sized Dataset: group rows by
    ``id % n_buckets`` and emit per-bucket row count + exact int64
    sums of ``sum_cols`` (``{out_name: src_col}``).  The partial
    aggregation happens inside ``map_batches`` (``np.add.at`` on an
    int64 accumulator -- exact, unlike float ``bincount`` weights), so
    the exchange carries ``n_buckets`` rows per block and the driver
    sees ``<= n_buckets`` rows total regardless of corpus size."""
    out_names = [count_col] + list(sum_cols)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 **{n: pa.array([], pa.int64()) for n in out_names}}
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = ids % n_buckets
        cols = {"bucket": pa.array(np.arange(n_buckets, dtype=np.int64))}
        cols[count_col] = pa.array(
            np.bincount(b, minlength=n_buckets).astype(np.int64)
        )
        for name, src in sum_cols.items():
            # null-safe: SQL sum() skips nulls == summing null-as-0
            col = pc.fill_null(t.column(src).combine_chunks(), 0)
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            acc = np.zeros(n_buckets, np.int64)
            np.add.at(acc, b, v)
            cols[name] = pa.array(acc)
        return pa.table(cols)

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket").sum(out_names).to_pandas()
    )
    df = df.rename(columns={f"sum({n})": n for n in out_names})
    df = df[df[count_col] > 0].sort_values("bucket", ignore_index=True)
    return pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema([("bucket", pa.int64())]
                  + [(n, pa.int64()) for n in out_names])
    )


def doc_lm_score_sink(
    sf_dir: str, out_dir: str | None = None, num_partitions: int = 16
) -> pa.Table:
    """Corpus-scale finisher for :func:`doc_lm_score`: the per-document
    score table (one row per input doc -- the one output that CANNOT
    come back to the driver at 10^10 docs) streams straight into a
    resumable hash-partitioned Parquet sink, and the gate returns a
    64-bucket integer digest computed by READING THE SINK BACK with a
    streaming partial aggregate -- so the digest certifies what was
    actually written, not what the pipeline intended to write.  All
    post-quantization arithmetic is int64, so the digest matches the
    DuckDB oracle (same model restated over ``documents``, outer
    GROUP BY ``doc_id % 64``) bit-for-bit.

    With ``out_dir=None`` (the gate/bench path) the sink is a scratch
    mkdtemp REMOVED after the digest materializes -- repeated
    evidence sweeps must not grow /tmp; pass ``out_dir`` to keep the
    sink."""
    import shutil
    import tempfile

    import ray.data as rd

    scratch = out_dir is None
    if scratch:
        out_dir = tempfile.mkdtemp(prefix="lkc-lmscore-sink-")
    try:
        sink_hash_partitioned(
            _doc_lm_scored(sf_dir), out_dir, "doc_id", num_partitions
        )
        # read back only PUBLISHED part files (never .tmp orphans)
        return bucket_digest(
            rd.read_parquet(sink_files(out_dir)),
            "doc_id",
            {"sum_n_tokens": "n_tokens", "sum_lp_micro": "sum_lp_micro"},
            count_col="n_docs",
        )
    finally:
        if scratch:
            shutil.rmtree(out_dir, ignore_errors=True)


def label_centroids(sf_dir: str) -> pa.Table:
    """Per-label embedding CENTROID sums -- the distributed
    mean-pooling / cluster-centroid aggregate (k-means M-step, IVF
    coarse-quantizer training, class prototypes) over the
    ``embeddings`` table's ``list<float>`` column.

    Components are quantized to integer micro-units
    (``floor(v * 1e6)`` -- float32->float64 widening and the scale
    are both exactly reproducible in SQL) BEFORE summation, so the
    sums carry no float summation-order divergence between engines;
    the caller derives the float centroid as ``sum_q / (n * 1e6)`` in
    one deterministic division per component.

    Scale shape: per-block zero-copy matrix extraction
    (`_embedding_matrix`) + one ``np.add.reduceat`` per block gives
    label-count-bounded partials (labels x dim rows per block, never
    row-count); a single dim-bounded ``groupby.sum`` merges them."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

    part_schema = pa.schema(
        [("label", pa.int64()), ("dim", pa.int64()),
         ("n", pa.int64()), ("sum_q", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _, mat = _embedding_matrix(t)
        q = np.floor(mat * 1e6).astype(np.int64)
        lbl = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        order, starts, counts = _group_segments(lbl)
        lbl, q = lbl[order], q[order]
        sums = np.add.reduceat(q, starts, axis=0)  # (n_labels, dim)
        n_lab, dim = sums.shape
        return pa.table(
            {"label": pa.array(np.repeat(lbl[starts], dim)),
             "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                     n_lab)),
             "n": pa.array(np.repeat(counts.astype(np.int64), dim)),
             "sum_q": pa.array(sums.reshape(-1))},
            schema=part_schema,
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .sum(["n", "sum_q"])
        .to_pandas()
    )
    merged.columns = ["label", "dim", "n", "sum_q"]
    out = pa.table(
        {"label": pa.array(merged["label"].astype(np.int64)),
         "dim": pa.array(merged["dim"].astype(np.int64)),
         "n": pa.array(merged["n"].astype(np.int64)),
         "sum_q": pa.array(merged["sum_q"].astype(np.int64))}
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("label", "ascending"), ("dim", "ascending")]
        )
    )


def contamination_check(sf_dir: str) -> pa.Table:
    """Benchmark-contamination scan: flag documents containing any of
    a set of verbatim "test-set" snippets -- the decontamination
    primitive every training-data pipeline runs before a corpus
    ships.  The snippet list here derives deterministically from the
    corpus itself (32-char substrings of every ``doc_id % 97 == 0``
    document) so the gate needs no external data; a real run passes
    its benchmark strings instead.

    Scale shape: the needle set is dimension-sized -> collected once
    on the driver from a column-pruned read and closed over (the
    broadcast-small-side pattern); the corpus-side scan is K
    ``pc.match_substring`` Arrow kernel sweeps per batch (vectorized
    literal search over the whole column -- no per-row Python), with
    per-doc hit counts summed across needles.  Output is
    contaminated-docs-only, so the driver sees hits, not the corpus."""
    def pick_needles(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.utf8_length(t.column("text")).to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array((ids % 97 == 0) & (lens >= 52)))
        return pa.table(
            {"doc_id": pc.cast(sub.column("doc_id"), pa.int64()),
             "needle": pc.utf8_slice_codeunits(
                 sub.column("text"), start=20, stop=52
             )}
        )

    needle_src = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(pick_needles, batch_format="pyarrow")
        .to_pandas()
    )
    needles = [
        (int(r.doc_id), str(r.needle)) for r in needle_src.itertuples()
    ]
    out_schema = pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())])
    if not needles:
        return out_schema.empty_table()
    pats = [n for _, n in needles]

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        col = t.column("text")
        hits = np.zeros(t.num_rows, np.int64)
        for pat in pats:
            m = pc.match_substring(col, pattern=pat)
            hits += m.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = hits > 0
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()).filter(
                pa.array(keep)
             ),
             "n_hits": pa.array(hits[keep])},
            schema=out_schema,
        )

    res = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow"
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def tfidf_topk(sf_dir: str, k: int = 5) -> pa.Table:
    """Top-k TF-IDF terms per document over ``documents.text`` -- the
    canonical corpus-weighting primitive for training-data curation
    (keyword extraction, topical dedup, quality filters).

    Scoring uses the integer-exact inverse-document-frequency variant
    ``score = tf / df`` (one IEEE double division -- correctly
    rounded, so Ray and the SQL oracle order identically; a log-based
    idf is NOT correctly rounded across engines and can flip
    near-ties).  The global document count N scales every doc's
    scores by the same constant under idf = 1/df, so ranking needs no
    N at all.  Output carries only integers + the term (never the
    float score) so the value-hash compare is exact.

    Distributed shape (two exchanges, both data-derived widths):
    1. One tokenize pass emits each doc's distinct (doc_id, term, tf)
       rows -- the per-block ``np.unique`` combiner bounds a block's
       output by its vocabulary, not its token count.
    2. Exchange by hash(term): each term's rows co-locate, a numpy
       sweep counts df = rows per term (each row IS one distinct doc)
       and attaches it.
    3. Exchange by hash(doc_id): each doc's rows co-locate, a lexsort
       sweep ranks by (tf/df desc, term asc) and keeps rank <= k.
    Tokenization is per-row by necessity (same measured-justified
    call as ``lang_id``); everything after is vectorized."""
    n_docs, _ = _table_meta(sf_dir, "documents")
    # each doc contributes at most its distinct-term count; 64 is a
    # generous per-doc vocabulary estimate for width sizing only
    # both exchanges carry the same ~64-terms-per-doc row volume
    P_term = P_doc = _exchange_width(n_docs * 64)
    gd = _new_guard_dir("tfidf")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    tf_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
    )

    def doc_term_tf(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tf_schema.empty_table()
        dids, terms, tfs = [], [], []
        doc_ids = t.column("doc_id").to_pylist()
        for did, s in zip(doc_ids, t.column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            if not toks:
                continue
            uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                     return_counts=True)
            dids.append(np.full(len(uniq), did, np.int64))
            terms.extend(uniq)
            tfs.append(counts.astype(np.int64))
        if not dids:
            return tf_schema.empty_table()
        return pa.table(
            {"doc_id": pa.array(np.concatenate(dids)),
             "term": pa.array(terms, pa.string()),
             "tf": pa.array(np.concatenate(tfs))},
            schema=tf_schema,
        )

    def stamp_term(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("term"), P_term))
        )

    df_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()),
         ("tf", pa.int64()), ("df", pa.int64())]
    )

    def attach_df(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return df_schema.empty_table()
        _guard_record(gd, "term", t.column("_p").to_numpy(zero_copy_only=False))
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        order, starts, sizes = _group_segments(terms)
        inv = np.empty(len(terms), np.int64)
        inv[order] = np.arange(len(terms))
        # df per sorted row -> back to original order; each row is one
        # distinct (doc, term), so group size IS the document frequency
        df_sorted = np.repeat(sizes.astype(np.int64), sizes)
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "term": t.column("term"),
             "tf": t.column("tf"),
             "df": pa.array(df_sorted[inv])},
            schema=df_schema,
        )

    def stamp_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int64()))
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("doc_id"), P_doc))
        )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()),
         ("tf", pa.int64()), ("df", pa.int64()), ("rnk", pa.int64())]
    )

    def topk_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "doc", t.column("_p").to_numpy(zero_copy_only=False))
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        dfv = t.column("df").to_numpy(zero_copy_only=False)
        score = tf.astype(np.float64) / dfv.astype(np.float64)
        order = np.lexsort((terms, -score, did))
        did, terms, tf, dfv = did[order], terms[order], tf[order], dfv[order]
        starts, counts = _segment_starts(did)
        rnk = (
            np.arange(len(did), dtype=np.int64)
            - np.repeat(starts, counts) + 1
        )
        keep = rnk <= k
        return pa.table(
            {"doc_id": pa.array(did[keep]),
             "term": pa.array(list(terms[keep]), pa.string()),
             "tf": pa.array(tf[keep]),
             "df": pa.array(dfv[keep]),
             "rnk": pa.array(rnk[keep])},
            schema=out_schema,
        )

    res = (
        ds.map_batches(doc_term_tf, batch_format="pyarrow")
        .map_batches(stamp_term, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P_term)))
        .map_batches(attach_df, batch_format="pyarrow", batch_size=None)
        .map_batches(stamp_doc, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P_doc)))
        .map_batches(topk_sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = t.cast(out_schema)
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("rnk", "ascending")]
        )
    )
    return _finalize_guard(gd, t)


_CC_REL = pa.schema([("node", pa.int64()), ("lbl", pa.int64())])


def cc_canonical_labels(
    edges,
    num_partitions: int | None = None,
    max_rounds: int = 50,
) -> pa.Table:
    """Distributed connected components: label every node of an edge
    list with the MIN node id reachable from it.

    Hash-to-min expressed as Ray Data exchange rounds (Rastogi et al.,
    "Finding Connected Components in Map-Reduce in Logarithmic
    Rounds"): the state is a ``(node, lbl)`` relation seeded with both
    edge directions; each round stamps ``fnv(node) % P``,
    range-partitions with explicit boundaries, and a per-block numpy
    sweep computes ``m = min(lbls of node ∪ node)`` per group and
    emits ``(node, m)`` plus ``(lbl, m)`` for every non-min label --
    the min propagates one hop outward per round, converging in
    O(log n) rounds for typical near-dup graphs (O(diameter) worst
    case).  The relation stays edge-sized (block-local dedup per
    sweep) and lives in the object store between rounds.

    Correctness does NOT depend on the exchange delivering each node's
    group as one block: min is associative/commutative, so a split
    group just emits two partial-min rows that meet again next round
    -- a block-size overflow here delays convergence instead of
    silently corrupting labels (unlike the pairing exchanges, which
    need the `_guard_record` side-channel).

    Convergence is detected by a per-round (row-count, order-free
    checksum) signature: labels only decrease, so a stable signature
    means a stable relation.  ``edges`` is a Dataset or Table with
    int64 ``doc_a``/``doc_b``; the returned label table (one row per
    distinct node, component roots map to themselves) is
    output-sized, fetched to the caller like every other dataops
    result."""
    import ray.data as rd

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "canonical_id": pa.array([], pa.int64())}
    )
    if isinstance(edges, pa.Table):
        if edges.num_rows == 0:
            return empty
        n_edges = edges.num_rows
        edges_ds = rd.from_arrow(edges.select(["doc_a", "doc_b"]))
    else:
        edges_ds = edges
        n_edges = edges_ds.count()
        if n_edges == 0:
            return empty
    P = num_partitions or _exchange_width(n_edges * 2)

    def seed(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": pa.array(np.concatenate([a, b])),
             "lbl": pa.array(np.concatenate([b, a]))},
            schema=_CC_REL,
        )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()),
                 "lbl": pa.array([], pa.int64()),
                 "_p": pa.array([], pa.int64())}
            )
        return t.append_column(
            "_p", pa.array(partition_ids(t.column("node"), P))
        )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CC_REL.empty_table()
        node = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = t.column("lbl").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(node, kind="stable")
        ns, ls = node[order], lbl[order]
        first = np.concatenate([[True], ns[1:] != ns[:-1]])
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(ns)))
        m = np.minimum(np.minimum.reduceat(ls, starts), ns[starts])
        m_row = np.repeat(m, counts)
        keep = ls != m_row
        gu = ns[starts] != m
        # hash-to-min emissions, BOTH halves: every member of u's set
        # (and u itself) learns the min, AND the min node receives the
        # whole set -- dropping the second half severs reverse
        # reachability and strands chains at local minima (the min
        # node would never learn who points at it)
        out_node = np.concatenate(
            [ns[starts], ls[keep], m_row[keep], m[gu]]
        )
        out_lbl = np.concatenate(
            [m, m_row[keep], ls[keep], ns[starts][gu]]
        )
        # block-local dedup keeps the relation edge-sized across rounds
        o2 = np.lexsort((out_lbl, out_node))
        onn, oll = out_node[o2], out_lbl[o2]
        fdist = np.concatenate(
            [[True], (onn[1:] != onn[:-1]) | (oll[1:] != oll[:-1])]
        )
        return pa.table(
            {"node": pa.array(onn[fdist]), "lbl": pa.array(oll[fdist])},
            schema=_CC_REL,
        )

    def sig_block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            cs = 0
        else:
            x = (
                t.column("node").to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0x100000001B3)
                + t.column("lbl").to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            with np.errstate(over="ignore"):
                cs = int((x * np.uint64(0x9E3779B97F4A7C15)).sum())
        return pa.table({"n": pa.array([n], pa.int64()),
                         "cs": pa.array([cs], pa.uint64())})

    rel = edges_ds.map_batches(seed, batch_format="pyarrow")
    prev_sig = None
    for _ in range(max_rounds):
        rel = (
            rel.map_batches(stamp, batch_format="pyarrow")
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(sweep, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        sigs = pa.Table.from_pandas(
            rel.map_batches(sig_block, batch_format="pyarrow").to_pandas()
        )
        n_rows = int(pc.sum(sigs.column("n")).as_py() or 0)
        cs = int(
            np.sum(
                sigs.column("cs").to_numpy(zero_copy_only=False).astype(np.uint64),
                dtype=np.uint64,
            )
        )
        sig = (n_rows, cs)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} "
            "hash-to-min rounds (pathological graph diameter?)"
        )
    # fixpoint relation: every node holds {component min}, the min
    # node holds its whole component (the hash-to-min invariant; a
    # root's row set is component-sized, same bound as the output),
    # plus possible duplicates from split groups; output-sized final
    # reduce
    star = pa.Table.from_pandas(rel.to_pandas())
    node = star.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    lbl = star.column("lbl").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(node, kind="stable")
    ns, ls = node[order], lbl[order]
    first = np.concatenate([[True], ns[1:] != ns[:-1]])
    starts = np.flatnonzero(first)
    canon = np.minimum(np.minimum.reduceat(ls, starts), ns[starts])
    return pa.table(
        {"doc_id": pa.array(ns[starts]), "canonical_id": pa.array(canon)}
    )


def dedup_cluster_canonical(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """Connected-components canonicalization over the near-dup pair
    graph: every document appearing in an exact n-gram-Jaccard pair
    (>= threshold) maps to the MIN doc_id of its connected component
    -- the "keep one canonical doc per duplicate cluster" primitive a
    dedup pipeline actually applies.

    The pair graph is the output of the distributed
    ``dedup_ngram_jaccard`` sweep; components are resolved by
    ``cc_canonical_labels`` -- hash-to-min label propagation run as
    Ray Data exchange rounds, so the propagation itself is distributed
    (the round-2 driver-local dict iteration is gone) and the same
    code path serves a 100 TB pair graph."""
    pairs = dedup_ngram_jaccard(sf_dir, threshold=threshold)
    return cc_canonical_labels(pairs)


# ---------------------------------------------------------------------------
# Multimodal plumbing gate
# ---------------------------------------------------------------------------
class MediaPipelineStage:
    """Actor-pool stage driving the full multimodal plumbing on REAL
    containers end-to-end: per doc, a deterministic 24-bpp BI_RGB
    bitmap (BMP), an uncompressed AVI of that frame repeated, and a
    16-bit PCM WAV (all dims/counts are pure functions of doc_id, so
    the driver's SQL oracle can restate them).  The batch flows
    decode -> resize -> re-decode, AVI demux -> frame-sample -> BMP
    re-encode, and WAV feature extraction through the actual
    byte-level codecs (stages/multimodal.{encode,decode}_{bmp,avi,wav}).
    Codec state (the stage objects) builds once per actor in __init__."""

    def __init__(self):
        from logminer_kafka_connect_ray.stages.multimodal import (
            AudioFeatureStage,
            FrameSampleStage,
            ImageDecodeStage,
            ImageResizeStage,
        )

        self.decode = ImageDecodeStage()
        self.resize = ImageResizeStage(8, 8)
        self.frames = FrameSampleStage(every_k=2)
        self.audio = AudioFeatureStage()

    def __call__(self, t: pa.Table) -> pa.Table:
        from logminer_kafka_connect_ray.stages.multimodal import (
            encode_avi,
            encode_bmp,
            encode_png,
            encode_wav,
        )

        from logminer_kafka_connect_ray.stages.multimodal import (
            encode_png_palette,
        )

        from logminer_kafka_connect_ray.stages.jpeg import encode_jpeg

        ids = t.column("doc_id").to_pylist()
        # rotate REAL containers per doc: BMP / palette PNG (indices
        # through a 16-color PLTE) / truecolor PNG / baseline JPEG
        # (4:2:0 + restart markers, the crawl shape) -- one oracle
        # covers all four codecs AND the stages' format
        # auto-detection; the palette doc's pixels come FROM its
        # palette, and the oracle checks only dims/counts, so JPEG's
        # lossy pixels leave every formula unchanged
        pxs, img = [], []
        for i in ids:
            rng = np.random.default_rng(i)
            hw = (16 + i % 32, 16 + i % 48)
            if i % 4 == 1:
                pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
                idx = rng.integers(0, 16, hw, dtype=np.uint8)
                pxs.append(pal[idx])
                img.append(encode_png_palette(idx, pal))
            else:
                px = rng.integers(0, 256, size=hw + (3,), dtype=np.uint8)
                pxs.append(px)
                img.append(
                    encode_png(px) if i % 4 == 2
                    else encode_jpeg(px, quality=85, subsample=True,
                                     restart_interval=2) if i % 4 == 3
                    else encode_bmp(px)
                )
        vid = [encode_avi([px] * (1 + i % 4)) for i, px in zip(ids, pxs)]
        wav = [
            encode_wav(
                np.random.default_rng(i).integers(
                    -32768, 32767, size=800 + (i % 5) * 200, dtype=np.int16
                ),
                16000,
            )
            for i in ids
        ]
        media = pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "payload": pa.array(img, pa.binary())}
        )
        dec = self.decode(media)
        resized = self.resize(media)
        rdec = self.decode(resized)
        vmedia = pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "payload": pa.array(vid, pa.binary())}
        )
        sampled = self.frames(vmedia)
        counts = pd.Series(sampled.column("media_id").to_pylist()).value_counts()
        amedia = pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "payload": pa.array(wav, pa.binary())}
        )
        adec = self.audio(amedia)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": dec.column("width").cast(pa.int64()),
                "height": dec.column("height").cast(pa.int64()),
                "channels": dec.column("channels").cast(pa.int64()),
                "resized_w": rdec.column("width").cast(pa.int64()),
                "resized_h": rdec.column("height").cast(pa.int64()),
                "n_frames": pa.array([1 + i % 4 for i in ids], pa.int64()),
                "n_sampled": pa.array(
                    [int(counts.get(i, 0)) for i in ids], pa.int64()
                ),
                "audio_rate": adec.column("sample_rate").cast(pa.int64()),
                "audio_n": adec.column("n_samples").cast(pa.int64()),
            }
        )


def media_pipeline(sf_dir: str) -> pa.Table:
    """Multimodal pipeline end-to-end (stages/multimodal.py) over REAL
    BMP / uncompressed-AVI / PCM-WAV containers derived
    deterministically from documents.doc_id; the SQL oracle restates
    the dimension/count arithmetic, so the codecs, schema, batch
    sizing and actor wiring are all driver-verified byte-for-byte."""
    from logminer_kafka_connect_ray.stages.multimodal import MEDIA_BATCH_SIZE

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    # the JPEG leg made this stage entropy-coder-bound (per-symbol
    # Python in encode; LUT probes in decode) -- scale the actor pool
    # with the host so the wall tracks per-doc cost / n_actors
    out = ds.map_batches(
        MediaPipelineStage,
        concurrency=(1, 8),
        batch_size=MEDIA_BATCH_SIZE,
        batch_format="pyarrow",
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.take(pc.sort_indices(t, sort_keys=[("media_id", "ascending")]))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
def text_quality(sf_dir: str) -> pa.Table:
    """Quality features + token counts per document (Arrow kernels)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        q = textfn.quality_features(t.column("text"))
        tok = textfn.token_counts(t.column("text"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": q["n_chars"],
                "n_tokens": q["n_tokens"],
                "alpha_ratio": q["alpha_ratio"],
                "punct_ratio": q["punct_ratio"],
                "bpeish_tokens": tok["bpeish_tokens"],
            }
        )

    t = pa.Table.from_pandas(
        ds.map_batches(feats, batch_format="pyarrow").to_pandas(), preserve_index=False
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def doc_repetition(sf_dir: str) -> pa.Table:
    """Repetition / lexical-diversity signals per document -- the
    Gopher-style repetition filters (Rae et al. 2021, section A1.1:
    duplicate-word and duplicate-n-gram fractions flag boilerplate and
    spam) in integer-exact form: token count, distinct-token count,
    top-token multiplicity, and the bigram versions.  The caller
    derives the fractions (dup_fraction = 1 - n_distinct/n_tokens,
    top_fraction = top_token_n/n_tokens) with one division each.

    Embarrassingly parallel map_batches; per-doc counting is
    np.unique over the token array (same tokenize-once-per-row shape
    as lang_id, with the same measured justification).  Zero-token
    docs are dropped on both sides (no repetition is defined for
    them)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("n_distinct", pa.int64()), ("top_token_n", pa.int64()),
         ("n_bigrams", pa.int64()), ("n_distinct_bigrams", pa.int64())]
    )

    def feats(t: pa.Table) -> pa.Table:
        cols = {n: [] for n in out_schema.names}
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        for did, s in zip(ids, t.column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            if not toks:
                continue
            w = np.asarray(toks, dtype=object)
            _, counts = np.unique(w, return_counts=True)
            big = w[:-1] + "\x00" + w[1:] if len(w) > 1 else np.array([], object)
            cols["doc_id"].append(int(did))
            cols["n_tokens"].append(len(w))
            cols["n_distinct"].append(len(counts))
            cols["top_token_n"].append(int(counts.max()))
            cols["n_bigrams"].append(len(big))
            cols["n_distinct_bigrams"].append(len(np.unique(big)) if len(big) else 0)
        return pa.table(
            {n: pa.array(cols[n], pa.int64()) for n in out_schema.names},
            schema=out_schema,
        )

    df = ds.map_batches(feats, batch_format="pyarrow").to_pandas()
    df = df.sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def lang_id(sf_dir: str) -> pa.Table:
    """Heuristic language id per document (stopword-marker argmax),
    vectorized: one regex presence scan per marker word."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def li(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang_pred": textfn.lang_id_batch(t.column("text")),
            }
        )

    t = pa.Table.from_pandas(
        ds.map_batches(li, batch_format="pyarrow").to_pandas(), preserve_index=False
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def doc_fingerprints(sf_dir: str) -> pa.Table:
    """64-bit rolling-hash fingerprint per document."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": textfn.fingerprint_series(df["text"]).astype(np.int64),
            }
        )

    t = pa.Table.from_pandas(
        ds.map_batches(fp, batch_format="pandas").to_pandas(), preserve_index=False
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# PII redaction (web-pipeline scrub pass)
# ---------------------------------------------------------------------------
#: RE2-compatible patterns evaluated identically by pyarrow (RE2) and
#: the DuckDB oracle (also RE2): keep these in sync with _PII_SQL in
#: __ray_entry__.py.
_PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_PII_PHONE_RE = r"\b555-[0-9]{4}\b"


def pii_redaction(sf_dir: str) -> pa.Table:
    """PII scrub pass over the document corpus -- the redaction step a
    web-text pipeline runs before training (emails / phone numbers ->
    sentinel tokens), with per-document match accounting.

    The synthetic corpus contains no organic PII, so the operator
    first plants a deterministic, data-dependent contact trailer
    (``doc_id % 3`` e-mail addresses and ``doc_id % 2`` phone
    numbers, values derived from ``doc_id``) and then redacts it by
    regex -- the oracle replants the identical trailer in SQL and
    redacts with DuckDB's ``regexp_replace(..., 'g')``.  Both engines
    execute the same RE2 patterns (pyarrow binds RE2; DuckDB bundles
    RE2), so the redacted text is compared byte-for-byte, not just
    counted.

    Scale shape: embarrassingly parallel single-pass ``map_batches``
    (zero shuffle); every kernel is an Arrow compute call
    (``binary_repeat`` / ``binary_join_element_wise`` /
    ``count_substring_regex`` / ``replace_substring_regex``), no
    per-row Python.  Reference parity: the reference ships records
    through Kafka Connect SMTs for exactly this class of value scrub
    (manifest.json SingleMessageTransforms); this is the corpus-side
    equivalent."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.int64())
        dn = did.combine_chunks().to_numpy(zero_copy_only=False)
        s = pa.scalar
        did_s = pc.cast(did, pa.string())
        email_unit = pc.binary_join_element_wise(
            s("mail user"), did_s, s("@mail-"),
            pc.cast(pa.array(dn % 20), pa.string()), s(".example "), ""
        )
        phone_unit = pc.binary_join_element_wise(
            s("tel 555-"),
            pc.utf8_lpad(
                pc.cast(pa.array((dn * 7) % 10000), pa.string()), 4, "0"
            ),
            s(" "), "",
        )
        contact = pc.binary_join_element_wise(
            t.column("text"),
            pc.binary_repeat(email_unit, pa.array(dn % 3, pa.int32())),
            pc.binary_repeat(phone_unit, pa.array(dn % 2, pa.int32())),
            " ",
        )
        n_emails = pc.count_substring_regex(contact, _PII_EMAIL_RE)
        n_phones = pc.count_substring_regex(contact, _PII_PHONE_RE)
        red = pc.replace_substring_regex(
            pc.replace_substring_regex(contact, _PII_EMAIL_RE, "<EMAIL>"),
            _PII_PHONE_RE,
            "<PHONE>",
        )
        return pa.table(
            {
                "doc_id": did,
                "redacted": red,
                "n_emails": pc.cast(n_emails, pa.int64()),
                "n_phones": pc.cast(n_phones, pa.int64()),
            }
        )

    t = pa.Table.from_pandas(
        ds.map_batches(scrub, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# Document chunking (training-sequence windowing)
# ---------------------------------------------------------------------------
def doc_chunking(sf_dir: str, chunk: int = 32, overlap: int = 4) -> pa.Table:
    """Split every document into fixed-size word windows with overlap
    -- the chunking step an embedding / training pipeline applies to
    long documents (stride = ``chunk - overlap``; a window starts at
    every stride multiple that still contains at least one word
    beyond the previous window's overlap region, so
    ``n_chunks = max(1, ceil((n_words - overlap) / stride))``).
    Returns one row per chunk: ``(doc_id, chunk_idx, n_words,
    chunk_text)``.

    Scale shape: embarrassingly parallel ``map_batches``; the
    variable fan-out is vectorized per chunk ORDINAL, not per row --
    iteration ``j`` slices window ``j`` out of every still-long-enough
    document at once (``list_slice`` + ``binary_join``), so the
    per-batch Python loop runs ``max_chunks_in_batch`` times (a few
    iterations for web-scale docs), never ``n_rows``.  split/rejoin
    with the same separator is segment-exact, so ``chunk_text``
    matches the SQL ``array_to_string(ws[a:b], ' ')`` byte-for-byte
    even through repeated separators."""
    if overlap >= chunk:
        raise ValueError("doc_chunking: overlap must be < chunk")
    stride = chunk - overlap
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_idx", pa.int64()),
            ("n_words", pa.int64()),
            ("chunk_text", pa.large_string()),
        ]
    )

    def chunks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        text = pc.cast(t.column("text").combine_chunks(), pa.large_string())
        ls = pc.split_pattern(text, " ")
        n = pc.list_value_length(ls).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        did = pc.cast(t.column("doc_id"), pa.int64()).combine_chunks()
        n_chunks = np.maximum(1, (n - overlap + stride - 1) // stride)
        pieces = []
        for j in range(int(n_chunks.max())):
            sel = n_chunks > j
            idx = pa.array(np.flatnonzero(sel))
            sub = ls.take(idx)
            s = j * stride
            sliced = pc.list_slice(sub, s, s + chunk)
            pieces.append(
                pa.table(
                    {
                        "doc_id": did.take(idx),
                        "chunk_idx": pa.array(
                            np.full(len(idx), j, np.int64)
                        ),
                        "n_words": pa.array(np.minimum(chunk, n[sel] - s)),
                        "chunk_text": pc.binary_join(
                            sliced, pa.scalar(" ", pa.large_string())
                        ),
                    },
                    schema=out_schema,
                )
            )
        return pa.concat_tables(pieces)

    t = pa.Table.from_pandas(
        ds.map_batches(chunks, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    return t.take(
        pc.sort_indices(
            t,
            sort_keys=[("doc_id", "ascending"), ("chunk_idx", "ascending")],
        )
    )


# ---------------------------------------------------------------------------
# Resumable partitioned corpus writer
# ---------------------------------------------------------------------------
def curate_to_parquet(
    sf_dir: str, out_dir: str, num_partitions: int = 16
) -> dict:
    """Resumable partitioned-Parquet sink for the curation pipeline:
    curated docs (lang='en', >= 5 tokens) flow through the shared
    :func:`sink_hash_partitioned` machinery -- hash-partition on
    ``doc_id`` into ``part-{p:05d}.parquet`` files written tmp+rename
    (a reader never sees a torn file); a partition whose final file
    ALREADY EXISTS is pruned at PLAN time, so a crashed run resumes
    by paying only for the missing partitions, and ``sink_prepare``
    guards parameter drift + cleans crashed-attempt ``.tmp-*``
    orphans.  This is the dataops side of the resumable-output
    contract the CDC lake implements with manifests (never one giant
    output file).

    Returns ``{"written": [...], "skipped": [...], "rows": {p: n}}``.
    Scale shape: the curation filter fuses into one map_batches ahead
    of the sink's stamp, one explicit-boundary exchange, one writer
    task per partition."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def curate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        lang_pred = textfn.lang_id_batch(t.column("text"))
        q = textfn.quality_features(t.column("text"))
        keep = pc.and_(
            pc.equal(lang_pred, "en"), pc.greater_equal(q["n_tokens"], 5)
        )
        return t.filter(keep)

    return sink_hash_partitioned(
        ds.map_batches(curate, batch_format="pyarrow"),
        out_dir,
        "doc_id",
        num_partitions,
        out_schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()),
             ("lang", pa.string())]
        ),
    )


# ---------------------------------------------------------------------------
# PageRank (scatter-gather graph iterations, exact integer ranks)
# ---------------------------------------------------------------------------
_PR_SCALE = 10**12


def doc_pagerank(sf_dir: str, iters: int = 2) -> pa.Table:
    """PageRank over a deterministic doc-link graph -- the
    scatter-gather graph-analytics pattern (emit shares along edges
    -> exchange on destination -> gather-sum -> damped update) with
    EXACT integer ranks, so the SQL oracle reproduces every rank
    bit-for-bit: ranks live at scale 1e12, shares are ``r // 3``
    (every node has out-degree 3: ``d -> (7d+1, 13d+5, 31d+11) mod
    N``, multi-edges kept), and the damped update is
    ``(15 * (R//N)) // 100 + (85 * in_sum) // 100`` -- all floor
    integer ops, identical in numpy and DuckDB.

    Scale shape: each iteration is one ``map_batches`` over the rank
    table (emits 3 share rows + a zero self-row per doc, so sinks
    keep their base rank), one explicit-boundary exchange on the
    destination hash, and a per-block segment-sum sweep -- the rank
    state never touches the driver; ``iters`` chained stages execute
    as one streaming pipeline."""
    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    R = _PR_SCALE
    base = (15 * (R // n_docs)) // 100
    P = _exchange_width(n_docs * 4)
    r0 = R // n_docs

    rank_schema = pa.schema([("doc_id", pa.int64()), ("r", pa.int64())])
    share_schema = pa.schema(
        [("dst", pa.int64()), ("share", pa.int64()), ("_p", pa.int64())]
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "r": pa.array(np.full(t.num_rows, r0, np.int64))},
            schema=rank_schema,
        ),
        batch_format="pyarrow",
    )

    guards = []
    for it in range(iters):
        gd = _new_guard_dir(f"pagerank{it}")
        guards.append(gd)

        def shares(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return share_schema.empty_table()
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            r = t.column("r").to_numpy(zero_copy_only=False)
            sh = r // 3
            dst = np.concatenate(
                [(7 * d + 1) % n_docs, (13 * d + 5) % n_docs,
                 (31 * d + 11) % n_docs, d]
            )
            share = np.concatenate([sh, sh, sh, np.zeros(len(d), np.int64)])
            return pa.table(
                {"dst": pa.array(dst), "share": pa.array(share),
                 "_p": pa.array(partition_ids(pa.array(dst), P))},
                schema=share_schema,
            )

        def gather(t: pa.Table, _gd=gd, _it=it) -> pa.Table:
            if t.num_rows == 0:
                return rank_schema.empty_table()
            _guard_record(
                _gd, f"pr{_it}",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            share = t.column("share").to_numpy(zero_copy_only=False)
            order = np.argsort(dst, kind="stable")
            dst, share = dst[order], share[order]
            n = len(dst)
            starts = np.flatnonzero(
                np.concatenate([[True], dst[1:] != dst[:-1]])
            )
            sums = np.add.reduceat(share, starts)
            return pa.table(
                {"doc_id": pa.array(dst[starts]),
                 "r": pa.array(base + (85 * sums) // 100)},
                schema=rank_schema,
            )

        ds = (
            ds.map_batches(shares, batch_format="pyarrow")
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(gather, batch_format="pyarrow", batch_size=None)
        )

    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    t = t.cast(rank_schema)
    for gd in guards:
        t = _finalize_guard(gd, t)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# Weighted deterministic sampling (hash-threshold, probability ∝ size)
# ---------------------------------------------------------------------------
def docs_weighted_sample(sf_dir: str, rate_per_char: int = 500) -> pa.Table:
    """Deterministic WEIGHTED sampling: keep each document with
    probability proportional to its length --
    ``fmix64(doc_id) % 1e6 < min(999999, n_chars * rate_per_char)``
    -- the size-biased sampling a corpus-inspection pipeline uses
    (longer docs are likelier picks), reproducible across runs and
    engines because the coin is a hash, not an RNG.  Completes the
    sampling family: uniform hash (``events_sample_hash``),
    stratified per-class (``events_stratified_sample``), weighted
    (this).

    Embarrassingly parallel one-pass filter; the mixer is murmur3's
    fmix64 (shared with the HLL/KMV sketches), restated in UHUGEINT
    arithmetic by the oracle."""
    from logminer_kafka_connect_ray.functions.hashing import fmix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def pick(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.int64())
        h = fmix64(
            did.combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        coin = (h % np.uint64(1_000_000)).astype(np.int64)
        nch = pc.cast(t.column("n_chars"), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        thr = np.minimum(999_999, nch * rate_per_char)
        keep = coin < thr
        return pa.table(
            {
                "doc_id": pa.array(
                    did.combine_chunks().to_numpy(
                        zero_copy_only=False
                    )[keep]
                ),
                "n_chars": pa.array(nch[keep]),
                "coin": pa.array(coin[keep]),
            }
        )

    t = pa.Table.from_pandas(
        ds.map_batches(pick, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    t = pa.table(
        {
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "n_chars": pc.cast(t.column("n_chars"), pa.int64()),
            "coin": pc.cast(t.column("coin"), pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# BFS hop distance (bounded frontier min-propagation)
# ---------------------------------------------------------------------------
def doc_bfs_levels(sf_dir: str, hops: int = 3) -> pa.Table:
    """Hop distance from the seed set ``{doc_id < 3}`` over the same
    deterministic 3-out-degree link graph ``doc_pagerank`` walks --
    the bounded-iteration MIN-propagation pattern (BFS / shortest
    path / reachability) that complements PageRank's sum-propagation:
    each round every node sends ``dist + 1`` along its out-edges, the
    gather keeps the MIN of incoming offers and its own distance, and
    nodes unreached after ``hops`` rounds report ``-1``.

    Returns ``(doc_id, dist)`` with ``dist in {0..hops, -1}``.

    Scale shape: identical to ``doc_pagerank`` -- per round one
    ``map_batches`` (3 offers + a keep-self row per node), one
    explicit-boundary exchange on the destination hash, one
    per-block segment-min sweep; state never on the driver, rounds
    chain as one streaming pipeline."""
    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    P = _exchange_width(n_docs * 4)
    INF = np.int64(1 << 40)

    dist_schema = pa.schema([("doc_id", pa.int64()), ("dist", pa.int64())])
    offer_schema = pa.schema(
        [("dst", pa.int64()), ("offer", pa.int64()), ("_p", pa.int64())]
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "dist": pa.array(
                    np.where(
                        pc.cast(t.column("doc_id"), pa.int64())
                        .to_numpy(zero_copy_only=False) < 3,
                        np.int64(0), INF,
                    )
                ),
            },
            schema=dist_schema,
        ),
        batch_format="pyarrow",
    )

    guards = []
    for it in range(hops):
        gd = _new_guard_dir(f"bfs{it}")
        guards.append(gd)

        def offers(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return offer_schema.empty_table()
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            dist = t.column("dist").to_numpy(zero_copy_only=False)
            dst = np.concatenate(
                [(7 * d + 1) % n_docs, (13 * d + 5) % n_docs,
                 (31 * d + 11) % n_docs, d]
            )
            # offers along edges are dist+1 (INF stays INF); the self
            # row keeps the node's own distance in the gather
            out_offer = np.minimum(dist + 1, INF)
            offer = np.concatenate([out_offer, out_offer, out_offer, dist])
            return pa.table(
                {"dst": pa.array(dst), "offer": pa.array(offer),
                 "_p": pa.array(partition_ids(pa.array(dst), P))},
                schema=offer_schema,
            )

        def gather(t: pa.Table, _gd=gd, _it=it) -> pa.Table:
            if t.num_rows == 0:
                return dist_schema.empty_table()
            _guard_record(
                _gd, f"bfs{_it}",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            offer = t.column("offer").to_numpy(zero_copy_only=False)
            order = np.argsort(dst, kind="stable")
            dst, offer = dst[order], offer[order]
            starts = np.flatnonzero(
                np.concatenate([[True], dst[1:] != dst[:-1]])
            )
            return pa.table(
                {"doc_id": pa.array(dst[starts]),
                 "dist": pa.array(np.minimum.reduceat(offer, starts))},
                schema=dist_schema,
            )

        ds = (
            ds.map_batches(offers, batch_format="pyarrow")
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(gather, batch_format="pyarrow", batch_size=None)
        )

    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    t = t.cast(dist_schema)
    for gd in guards:
        t = _finalize_guard(gd, t)
    dist = t.column("dist").to_numpy(zero_copy_only=False)
    t = t.set_column(
        1, "dist", pa.array(np.where(dist >= INF, np.int64(-1), dist))
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd iterations, exact integer grid)
# ---------------------------------------------------------------------------
_KM_SCALE = float(1 << 20)


def _km_assign(m: np.ndarray, cent: np.ndarray):
    """Quantize a float block to the k-means integer grid and assign
    each row to its nearest centroid (exact int64 distances; argmin
    takes the FIRST min -> lowest cluster id on ties)."""
    X = np.floor(m * _KM_SCALE).astype(np.int64)
    d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return X, np.argmin(d2, axis=1)


def _kmeans_centroids(sf_dir: str, k: int, iters: int) -> np.ndarray:
    """The Lloyd fit shared by ``embedding_kmeans`` (stats surface)
    and ``semantic_dedup`` (SemDeDup pruning): init = the first ``k``
    vectors on the integer grid, ``iters`` broadcast-assign /
    partial-sum-reduce rounds, emptied clusters keep their previous
    centroid.  Returns the (k, d) int64 centroid matrix."""
    import pyarrow.parquet as _pq

    head = _pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    )
    ids0, m0 = _embedding_matrix(head)
    order0 = np.argsort(ids0)
    C = np.floor(m0[order0] * _KM_SCALE).astype(np.int64)  # (k, d)
    d = C.shape[1]

    for _ in range(iters):
        cent = C.copy()

        def partial(t: pa.Table, _c=cent) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"blob": pa.array([], pa.binary())})
            _, m = _embedding_matrix(t)
            X, a = _km_assign(m, _c)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, a, X)
            return pa.table(
                {"blob": pa.array(
                    [counts.tobytes() + sums.tobytes()], pa.binary()
                )}
            )

        tot_n = np.zeros(k, np.int64)
        tot_s = np.zeros((k, d), np.int64)
        for b in (
            _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
            .map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            for blob in b.column("blob").to_pylist():
                tot_n += np.frombuffer(blob[: k * 8], np.int64)
                tot_s += np.frombuffer(blob[k * 8 :], np.int64).reshape(k, d)
        nz = tot_n > 0
        upd = np.floor(
            tot_s[nz].astype(np.float64) / tot_n[nz, None]
        ).astype(np.int64)
        C = C.copy()
        C[nz] = upd  # emptied clusters keep the previous centroid
    return C


def embedding_kmeans(sf_dir: str, k: int = 4, iters: int = 2) -> pa.Table:
    """Distributed Lloyd's k-means over the embedding table with an
    EXACTLY-mirrored oracle -- the iterative-ML pattern (broadcast
    model -> parallel assign -> partial-sum reduce -> driver update
    -> repeat) made bit-deterministic: points quantize once to an
    integer grid (``floor(v * 2^20)``; float32 -> double is exact),
    distances are exact int64 sums of squares, ties go to the lowest
    cluster id, and each centroid update re-quantizes to the grid
    via ``floor(double(sum) / n)`` (sums stay far below 2^53, so the
    one double division is the same IEEE op on both engines; an
    emptied cluster keeps its previous centroid).  Init: the first
    ``k`` vectors.  After ``iters`` updates a final assignment pass
    reports per-cluster stats.

    Returns one row per (cluster, dim): ``(cluster, dim_idx,
    centroid_scaled, n_assigned, sum_vec_ids)``.

    Scale shape: centroids broadcast into every task (k x d int64 --
    tiny); each block emits ONE mergeable partial (count vector +
    sum-matrix bytes, same driver-merge pattern as the histogram
    ops); the driver touches only O(k x d) state per iteration.
    ``iters + 1`` streaming scans total."""
    C = _kmeans_centroids(sf_dir, k, iters)
    d = C.shape[1]

    # final assignment pass with the final centroids
    centF = C.copy()

    def final_partial(t: pa.Table, _c=centF) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"blob": pa.array([], pa.binary())})
        ids, m = _embedding_matrix(t)
        _, a = _km_assign(m, _c)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        idsum = np.zeros(k, np.int64)
        np.add.at(idsum, a, ids.astype(np.int64))
        return pa.table(
            {"blob": pa.array([counts.tobytes() + idsum.tobytes()],
                              pa.binary())}
        )

    n_fin = np.zeros(k, np.int64)
    id_fin = np.zeros(k, np.int64)
    for b in (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(final_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for blob in b.column("blob").to_pylist():
            n_fin += np.frombuffer(blob[: k * 8], np.int64)
            id_fin += np.frombuffer(blob[k * 8 :], np.int64)

    cl = np.repeat(np.arange(k, dtype=np.int64), d)
    return pa.table(
        {
            "cluster": pa.array(cl),
            "dim_idx": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "centroid_scaled": pa.array(C.reshape(-1)),
            "n_assigned": pa.array(np.repeat(n_fin, d)),
            "sum_vec_ids": pa.array(np.repeat(id_fin, d)),
        }
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup inside k-means clusters
# ---------------------------------------------------------------------------
#: within-cluster all-pairs bound -- SemDeDup's cost model assumes
#: cluster sizes ~ n/k; a run that exceeds this must raise k, not
#: silently go quadratic
SEMDEDUP_MAX_CLUSTER_ROWS = 500_000
#: dedup-compare quantization grid (coarser than the k-means grid so
#: every int64 product below stays exact: |q| <= 2^10 * max|v|)
_SD_SCALE = float(1 << 10)


def semantic_dedup(
    sf_dir: str, k: int = 4, iters: int = 2,
    tau_sq_num: int = 81, tau_sq_den: int = 100,
    plant_copies: bool = True,
) -> pa.Table:
    """SemDeDup ("SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", Abbas et al. 2023): k-means the
    embedding space, then inside each cluster drop every vector that
    has a LOWER-id neighbor with cosine >= tau -- near-duplicate
    semantics cheaper than all-pairs because candidates only meet
    within a cluster.  tau is passed as an exact rational tau^2 =
    ``tau_sq_num / tau_sq_den`` (default 81/100 -> tau = 0.9) and the
    prune test is pure int64 arithmetic on a ``floor(v * 2^10)`` grid
    (``den * dot^2 >= num * |u|^2 |v|^2`` with ``dot > 0``), so the
    Ray kernel and the DuckDB oracle decide identically -- no float
    threshold skew.  Returns one row per vector: ``(vec_id, cluster,
    kept)``.

    ``plant_copies`` (the same provable-recall device the
    ``embedding_near_dup`` gate uses) unions the assignment input
    with EXACT copies of every ``vec_id % 7 == 0`` vector at
    ``PLANT_BASE + vec_id``: an exact copy has the identical
    quantized row, hence provably the same cluster, cosine 1, and a
    higher id -- every planted copy must come back ``kept = 0`` and
    every original ``kept = 1`` (the synthetic table's max natural
    cosine is ~0.58, below tau).  The centroid FIT runs on the raw
    table only, in both engines.

    Scale shape: the exact-integer Lloyd fit is shared with
    ``embedding_kmeans`` (broadcast centroids, one mergeable partial
    per block, O(k x d) driver state); the assignment pass stamps
    ``_p = cluster`` and ONE explicit-boundary exchange co-locates
    each cluster, where the prune is one int64 Gram matmul per
    cluster block (bounded by ``SEMDEDUP_MAX_CLUSTER_ROWS`` -- fail
    loudly, raise ``k``).  At 10^10 vectors k grows so n/k stays
    block-sized; the exchange volume is one quantized int16-scale
    row per vector, not pairs."""
    C = _kmeans_centroids(sf_dir, k, iters)
    d = C.shape[1]
    gd = _new_guard_dir("semdedup")

    out_schema = pa.schema(
        [("vec_id", pa.int64()), ("cluster", pa.int64()),
         ("q", pa.binary()), ("_p", pa.int64())]
    )

    def assign(t: pa.Table, _c=C) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids, m = _embedding_matrix(t)
        _, a = _km_assign(m, _c)
        Q = np.floor(m.astype(np.float64) * _SD_SCALE).astype(np.int64)
        # |q| <= 2^11 keeps den * (q . q)^2 <= 100 * (64 * 2^22)^2 <
        # 2^63: every product in the prune test stays exact int64
        assert np.abs(Q).max(initial=0) <= (1 << 11), (
            "semantic_dedup int64-exactness assumes |v| <= 2.0"
        )
        return pa.table(
            {"vec_id": pa.array(ids.astype(np.int64)),
             "cluster": pa.array(a.astype(np.int64)),
             "q": pa.array([r.astype(np.int32).tobytes() for r in Q],
                           pa.binary()),
             "_p": pa.array(a.astype(np.int64))},
            schema=out_schema,
        )

    res_schema = pa.schema(
        [("vec_id", pa.int64()), ("cluster", pa.int64()),
         ("kept", pa.int64())]
    )

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return res_schema.empty_table()
        _guard_record(
            gd, "sd", t.column("_p").to_numpy(zero_copy_only=False)
        )
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        cl = t.column("cluster").to_numpy(zero_copy_only=False)
        Q = np.frombuffer(
            b"".join(t.column("q").to_pylist()), np.int32
        ).reshape(len(ids), d).astype(np.int64)
        kept = np.ones(len(ids), bool)
        for c in np.unique(cl):
            m = cl == c
            n_c = int(m.sum())
            if n_c > SEMDEDUP_MAX_CLUSTER_ROWS:
                raise ValueError(
                    f"semantic_dedup cluster {c} holds {n_c} vectors "
                    f"(> {SEMDEDUP_MAX_CLUSTER_ROWS}); raise k so "
                    "clusters stay block-sized"
                )
            cid, cq = ids[m], Q[m]
            order = np.argsort(cid)
            cid, cq = cid[order], cq[order]
            G = cq @ cq.T  # exact int64 (|q| <= 2^12, d = 64)
            n2 = np.diag(G)
            lhs = tau_sq_den * G * G
            rhs = tau_sq_num * n2[:, None] * n2[None, :]
            dup = (G > 0) & (lhs >= rhs)
            # kept iff no LOWER-id neighbor marks it (strict upper
            # triangle: j pruned by i < j)
            pruned = np.triu(dup, 1).any(axis=0)
            kk = np.ones(n_c, bool)
            kk[pruned] = False
            out = np.flatnonzero(m)[order]
            kept[out] = kk
        return pa.table(
            {"vec_id": pa.array(ids), "cluster": pa.array(cl),
             "kept": pa.array(kept.astype(np.int64))},
            schema=res_schema,
        )

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if plant_copies:
        import pyarrow.parquet as _pq

        etype = (
            _pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
            .schema_arrow.field("embedding")
            .type
        )

        def mk_copies(t: pa.Table, _etype=etype) -> pa.Table:
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            sel = pa.array(np.flatnonzero(ids % 7 == 0))
            g = t.take(sel)
            return pa.table(
                {"vec_id": pc.add(g.column("vec_id"), PLANT_BASE),
                 "embedding": g.column("embedding").cast(_etype)}
            )

        emb = emb.union(
            _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
            .map_batches(mk_copies, batch_format="pyarrow")
        )
    res = (
        emb
        .map_batches(assign, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, k)))
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    t = pa.Table.from_pandas(res, preserve_index=False).cast(res_schema)
    t = _finalize_guard(gd, t)
    return t.take(pc.sort_indices(t, sort_keys=[("vec_id", "ascending")]))


# ---------------------------------------------------------------------------
# Embedding int8 quantization (ANN index build step)
# ---------------------------------------------------------------------------
def embedding_quantize(sf_dir: str) -> pa.Table:
    """Symmetric int8 quantization of the embedding table -- the
    compression step an ANN index build applies before storing
    vectors (scale = max|x| per vector, ``q = floor(x * 127 / scale
    + 0.5)``).  Every arithmetic step is IEEE-double-identical
    between numpy and the DuckDB oracle (float32 -> float64 casts are
    exact; multiply-then-divide order fixed; ``floor(.. + 0.5)``
    instead of ``round`` because numpy rounds half-even while DuckDB
    rounds half-away).  Returns integer per-vector summaries the
    driver can hash -- ``(vec_id, scale_micro, sum_q, sum_q_sq,
    n_sat, n_dims)`` with ``n_sat`` counting saturated ``|q| = 127``
    lanes; all-zero vectors quantize to zeros with ``scale_micro =
    0``.

    Scale shape: embarrassingly parallel ``map_batches``; the matrix
    comes off the Arrow value buffer zero-copy
    (``_embedding_matrix``), quantization is three whole-matrix numpy
    ops."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    out_schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("scale_micro", pa.int64()),
            ("sum_q", pa.int64()),
            ("sum_q_sq", pa.int64()),
            ("n_sat", pa.int64()),
            ("n_dims", pa.int64()),
        ]
    )

    def quant(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids, m = _embedding_matrix(t)
        s = np.abs(m).max(axis=1)
        safe = np.where(s == 0.0, 1.0, s)
        q = np.floor(m * 127.0 / safe[:, None] + 0.5)
        q[s == 0.0] = 0.0
        qi = q.astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64)),
                "scale_micro": pa.array(
                    np.floor(s * 1_000_000.0).astype(np.int64)
                ),
                "sum_q": pa.array(qi.sum(axis=1)),
                "sum_q_sq": pa.array((qi * qi).sum(axis=1)),
                "n_sat": pa.array(
                    (np.abs(qi) == 127).sum(axis=1).astype(np.int64)
                ),
                "n_dims": pa.array(
                    np.full(len(ids), m.shape[1], np.int64)
                ),
            },
            schema=out_schema,
        )

    t = pa.Table.from_pandas(
        ds.map_batches(quant, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    return t.take(pc.sort_indices(t, sort_keys=[("vec_id", "ascending")]))


# ---------------------------------------------------------------------------
# Budget-constrained corpus selection (quality-ranked global prefix)
# ---------------------------------------------------------------------------
def corpus_budget_select(
    sf_dir: str, budget_num: int = 2, budget_den: int = 5
) -> pa.Table:
    """Select the best documents until a GLOBAL token budget is
    filled -- the data-mixing primitive of corpus curation ("keep the
    top-quality 40% of tokens"): rank all docs by
    ``(score DESC, doc_id ASC)`` where ``score`` is the distinct-token
    count (lexical diversity), and keep the exact prefix whose
    cumulative token count stays within
    ``budget = total_tokens * budget_num // budget_den`` (the doc
    that would cross the budget, and everything after it, is out --
    strict prefix, no back-filling).

    Distributed shape -- a global ordered prefix sum WITHOUT a global
    sort: the score domain is small (bounded by words-per-doc), so
    (1) one scan emits per-block ``(score -> token-total)`` partials,
    driver-merged into the exact descending cumulative -- this pins
    the boundary score ``s*`` and the exact token mass above it;
    (2) only the boundary COHORT (docs with ``score == s*``) ships
    ``(doc_id, n_tokens)`` to the driver to fix the cutoff doc_id
    (cohort-sized, never corpus-sized; raises loudly past a cap
    instead of silently truncating); (3) a streaming filter pass
    emits the selected docs.  Per-doc distinct counting is one
    Arrow multi-key sort + neighbor mask + ``reduceat`` per block --
    no per-row Python."""
    ds = lambda: _read(sf_dir, "documents", columns=["doc_id", "text"])  # noqa: E731

    score_schema = pa.schema(
        [("doc_id", pa.int64()), ("score", pa.int64()),
         ("n_tokens", pa.int64())]
    )

    def scores_of(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return score_schema.empty_table()
        text = pc.cast(t.column("text").combine_chunks(), pa.large_string())
        ls = pc.split_pattern(text, " ")
        n_tok = pc.list_value_length(ls).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(ls)
        parent = pc.list_parent_indices(ls)
        pairs = pa.table({"p": parent, "w": flat})
        idx = pc.sort_indices(
            pairs, sort_keys=[("p", "ascending"), ("w", "ascending")]
        )
        p = parent.take(idx).to_numpy(zero_copy_only=False)
        w = flat.take(idx)
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        m = len(p)
        new = np.ones(m, bool)
        if m > 1:
            same_p = p[1:] == p[:-1]
            same_w = pc.equal(w.slice(1), w.slice(0, m - 1)).to_numpy(
                zero_copy_only=False
            )
            new[1:] = ~(same_p & same_w)
        starts = np.flatnonzero(np.concatenate([[True], p[1:] != p[:-1]]))
        n_dist = np.add.reduceat(new.astype(np.int64), starts)
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "score": pa.array(n_dist),
                "n_tokens": pa.array(n_tok),
            },
            schema=score_schema,
        )

    # --- pass 1: per-score token totals (small-domain histogram) -----
    def score_hist(t: pa.Table) -> pa.Table:
        s = scores_of(t)
        sc = s.column("score").to_numpy(zero_copy_only=False)
        tok = s.column("n_tokens").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(sc, return_inverse=True)
        return pa.table(
            {"score": pa.array(uniq),
             "tok": pa.array(np.bincount(inv, weights=tok).astype(np.int64))}
        )

    hist = (
        ds().map_batches(score_hist, batch_format="pyarrow").to_pandas()
        .groupby("score", as_index=False)["tok"].sum()
        .sort_values("score", ascending=False, ignore_index=True)
    )
    total = int(hist["tok"].sum())
    budget = total * budget_num // budget_den  # floor, mirrors the SQL
    cum = hist["tok"].cumsum()
    over = cum > budget
    if not over.any():
        s_star, t_hi = None, 0  # everything fits
    else:
        i = int(over.idxmax())
        s_star = int(hist["score"][i])
        t_hi = int(cum[i - 1]) if i > 0 else 0

    # --- pass 2: boundary cohort -> exact cutoff doc_id --------------
    cutoff = None
    if s_star is not None:
        def boundary(t: pa.Table) -> pa.Table:
            s = scores_of(t)
            return s.filter(
                pc.equal(s.column("score"), pa.scalar(s_star, pa.int64()))
            ).select(["doc_id", "n_tokens"])

        coh = pa.Table.from_pandas(
            ds().map_batches(boundary, batch_format="pyarrow").to_pandas(),
            preserve_index=False,
        )
        if coh.num_rows > 5_000_000:
            raise RuntimeError(
                f"corpus_budget_select: boundary cohort ({coh.num_rows} "
                "docs share the cutoff score) exceeds the driver cap; "
                "add a secondary range split on doc_id"
            )
        coh = coh.take(pc.sort_indices(coh, sort_keys=[("doc_id", "ascending")]))
        ctok = np.cumsum(
            coh.column("n_tokens").to_numpy(zero_copy_only=False)
        ) + t_hi
        ok = np.flatnonzero(ctok <= budget)
        cutoff = (
            int(coh.column("doc_id")[int(ok[-1])].as_py()) if len(ok) else -1
        )

    # --- pass 3: streaming selection filter ---------------------------
    def select(t: pa.Table) -> pa.Table:
        s = scores_of(t)
        if s_star is None:
            return s
        sc = s.column("score")
        keep = pc.greater(sc, pa.scalar(s_star, pa.int64()))
        at = pc.and_(
            pc.equal(sc, pa.scalar(s_star, pa.int64())),
            pc.less_equal(
                s.column("doc_id"), pa.scalar(cutoff, pa.int64())
            ),
        )
        return s.filter(pc.or_(keep, at))

    t = pa.Table.from_pandas(
        ds().map_batches(select, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk across documents)
# ---------------------------------------------------------------------------
def seq_packing(sf_dir: str, seq_len: int = 64) -> pa.Table:
    """GPT-style sequence packing: conceptually concatenate every
    document's words in ``doc_id`` order and cut the stream into
    fixed ``seq_len`` training sequences; report, for every document,
    which sequences it lands in and how many of its words each one
    takes -- ``(doc_id, seq_idx, words_in_seq)``.  The core of it is
    an EXACT GLOBAL PREFIX SUM of per-document word counts, computed
    distributed:

    1. Offset pass: each block bins its docs into ``P`` contiguous
       ``doc_id`` ranges and emits the per-range word totals (a
       ``P``-counter vector, merged by elementwise sum on the driver
       -- no exchange); exclusive cumsum gives each range's exact
       base word offset.
    2. Packing pass: blocks stamp ``(doc_id, n_words, _p)`` -- the
       TEXT never crosses the exchange -- one explicit-boundary
       exchange co-locates each range, and a per-block sweep sorts by
       ``doc_id``, adds the local exclusive cumsum to the range base,
       and expands each doc's span ``[off, off+n)`` into its
       overlapping sequences with one ``repeat``/``arange`` fan-out.

    Same range-partition + exact-base-offset shape as
    ``events_global_rank``; ranges are doc_id-disjoint so offsets are
    globally exact."""
    n_docs, _ = _table_meta(sf_dir, "documents")
    P = _exchange_width(n_docs)
    rng_w = max(1, -(-(n_docs) // P))  # ceil: doc_ids per range
    gd = _new_guard_dir("packing")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _range_of(did: np.ndarray) -> np.ndarray:
        return np.minimum(did // rng_w, P - 1).astype(np.int64)

    # --- pass 1: per-range word totals -> exact base offsets ---------
    def block_words(t: pa.Table) -> pa.Table:
        counts = np.zeros(P, np.int64)
        if t.num_rows:
            text = pc.cast(
                t.column("text").combine_chunks(), pa.large_string()
            )
            n = pc.list_value_length(pc.split_pattern(text, " ")).to_numpy(
                zero_copy_only=False
            )
            did = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            np.add.at(counts, _range_of(did), n.astype(np.int64))
        return pa.table({"counts": pa.array([counts.tobytes()])})

    range_words = np.zeros(P, np.int64)
    for b in ds.map_batches(
        block_words, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for buf in b.column("counts").to_pylist():
            range_words += np.frombuffer(buf, np.int64)
    base = np.concatenate([[np.int64(0)], np.cumsum(range_words)[:-1]])

    # --- pass 2: stamp (doc_id, n_words, _p), exchange, sweep ---------
    stamp_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_words", pa.int64()),
         ("_p", pa.int64())]
    )

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return stamp_schema.empty_table()
        text = pc.cast(t.column("text").combine_chunks(), pa.large_string())
        n = pc.list_value_length(pc.split_pattern(text, " ")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        did = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"doc_id": pa.array(did), "n_words": pa.array(n),
             "_p": pa.array(_range_of(did))},
            schema=stamp_schema,
        )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("seq_idx", pa.int64()),
         ("words_in_seq", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        p = t.column("_p").to_numpy(zero_copy_only=False)
        _guard_record(gd, "packing", p)
        if not (p == p[0]).all():
            raise RuntimeError(
                "seq_packing sweep got a mixed-range block; base offset "
                "would be wrong (exchange merged partitions?)"
            )
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n_words").to_numpy(zero_copy_only=False)
        order = np.argsort(did, kind="stable")
        did, n = did[order], n[order]
        off = base[p[0]] + np.concatenate(
            [[np.int64(0)], np.cumsum(n)[:-1]]
        )
        k_lo = off // seq_len
        k_hi = (off + n - 1) // seq_len
        reps = (k_hi - k_lo + 1).astype(np.int64)
        rep_idx = np.repeat(np.arange(len(did)), reps)
        # within-doc sequence ordinal: 0..reps-1 per doc
        csum = np.concatenate([[np.int64(0)], np.cumsum(reps)[:-1]])
        ordinal = np.arange(reps.sum()) - csum[rep_idx]
        k = k_lo[rep_idx] + ordinal
        lo = np.maximum(k * seq_len, off[rep_idx])
        hi = np.minimum((k + 1) * seq_len, off[rep_idx] + n[rep_idx])
        return pa.table(
            {"doc_id": pa.array(did[rep_idx]), "seq_idx": pa.array(k),
             "words_in_seq": pa.array(hi - lo)},
            schema=out_schema,
        )

    packed = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    t = pa.Table.from_pandas(packed.to_pandas(), preserve_index=False)
    t = _finalize_guard(gd, t)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("seq_idx", "ascending")]
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-frontier normalization)
# ---------------------------------------------------------------------------
def url_canonicalize(sf_dir: str) -> pa.Table:
    """Crawl-frontier URL canonicalization -- the normalization a
    web pipeline applies before url-level dedup (Common Crawl dedups
    on canonical URL): lowercase scheme+host, strip the fragment,
    strip the default ``:443`` port, strip tracking-only query
    strings (``?utm_*``).

    The corpus has no dirty URLs, so each document first derives a
    deterministic dirty variant of its canonical url (``doc_id % 4``
    selects UPPERCASED scheme+host / explicit ``:443`` / ``#frag`` /
    ``?utm_source=`` trailer) and the canonicalizer must recover the
    clean form; the oracle replants the identical variants in SQL and
    canonicalizes with the same RE2 patterns (DuckDB's regexp
    functions are RE2, including ``\\1`` rewrite backrefs, so every
    step is engine-identical).

    Scale shape: embarrassingly parallel single-pass ``map_batches``;
    every kernel is an Arrow regex/string call (``extract_regex`` +
    ``replace_substring_regex``), no per-row Python."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def canon(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.int64())
        dn = did.combine_chunks().to_numpy(zero_copy_only=False)
        s = pa.scalar
        host = pc.cast(pa.array(dn % 20), pa.string())
        path = pc.cast(did, pa.string())
        base = pc.binary_join_element_wise(
            s("https://site"), host, s(".example/d/"), path, ""
        )
        v = dn % 4
        upper = pc.binary_join_element_wise(
            s("HTTPS://SITE"), host, s(".EXAMPLE/d/"), path, ""
        )
        ported = pc.binary_join_element_wise(
            s("https://site"), host, s(".example:443/d/"), path, ""
        )
        fragged = pc.binary_join_element_wise(
            base,
            pc.binary_join_element_wise(
                s("#sec"), pc.cast(pa.array(dn % 7), pa.string()), ""
            ),
            "",
        )
        tracked = pc.binary_join_element_wise(
            base,
            pc.binary_join_element_wise(
                s("?utm_source=t"), pc.cast(pa.array(dn % 5), pa.string()), ""
            ),
            "",
        )
        raw = pc.if_else(
            pa.array(v == 1), upper,
            pc.if_else(
                pa.array(v == 2), ported,
                pc.if_else(pa.array(v == 3), fragged, tracked),
            ),
        )
        # --- the canonicalizer (order matters; mirrored in _URL_SQL) ---
        u = pc.replace_substring_regex(raw, r"#.*$", "")
        u = pc.replace_substring_regex(u, r"\?utm_[a-z]+=[A-Za-z0-9_-]*$", "")
        u = pc.replace_substring_regex(
            u, r"^([a-zA-Z]+://[^/:]+):443(/.*)?$", r"\1\2"
        )
        ex = pc.extract_regex(u, r"^(?P<pre>[a-zA-Z]+://[^/]+)(?P<rest>.*)$")
        u = pc.binary_join_element_wise(
            pc.utf8_lower(pc.struct_field(ex, "pre")),
            pc.struct_field(ex, "rest"),
            "",
        )
        return pa.table(
            {"doc_id": did, "raw_url": raw, "canon_url": u}
        )

    t = pa.Table.from_pandas(
        ds.map_batches(canon, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# HTML main-text extraction (the north-rule per-row invariant)
# ---------------------------------------------------------------------------
def _escape_html_text(text: pa.Array | pa.ChunkedArray):
    """Entity-escape body text for embedding in HTML (& first, so the
    escape/unescape pair is an exact inverse for ANY input text)."""
    e = pc.replace_substring(text, "&", "&amp;")
    e = pc.replace_substring(e, "<", "&lt;")
    return pc.replace_substring(e, ">", "&gt;")


def _build_dirty_html(dn: np.ndarray, text) -> pa.Array:
    """Deterministic Common-Crawl-style page build: the document text
    entity-escaped inside ``<p>``, wrapped in head/title/script, nav,
    an HTML comment and a footer -- the boilerplate a real extraction
    pass must strip.  Pure Arrow kernels, no per-row Python."""
    s = pa.scalar
    did_s = pc.cast(pa.array(dn, pa.int64()), pa.string())
    return pc.binary_join_element_wise(
        s("<html><head><title>doc "), did_s,
        s("</title><script>var p="),
        pc.cast(pa.array(dn % 97), pa.string()),
        s(";</script></head><body><nav>site"),
        pc.cast(pa.array(dn % 20), pa.string()),
        s(" | home | about</nav><p>"),
        _escape_html_text(text),
        s("</p><!-- crawl "),
        pc.cast(pa.array(dn % 7), pa.string()),
        s(" --><footer>&copy; site"),
        pc.cast(pa.array(dn % 20), pa.string()),
        s("</footer></body></html>"),
        "",
    )


def _extract_main_text(html):
    """Main-content extraction from page HTML (trafilatura shape):
    drop head / nav / footer blocks and comments, strip remaining
    tags, unescape entities.  All RE2 kernels (pyarrow binds RE2;
    non-greedy ``.*?`` is supported); order matters and is the exact
    inverse of :func:`_build_dirty_html`."""
    x = pc.cast(html, pa.string())
    x = pc.replace_substring_regex(x, r"<head>.*?</head>", "")
    x = pc.replace_substring_regex(x, r"<nav>.*?</nav>", "")
    x = pc.replace_substring_regex(x, r"<footer>.*?</footer>", "")
    x = pc.replace_substring_regex(x, r"<!--.*?-->", "")
    x = pc.replace_substring_regex(x, r"<[^>]*>", "")
    x = pc.replace_substring(x, "&lt;", "<")
    x = pc.replace_substring(x, "&gt;", ">")
    return pc.replace_substring(x, "&amp;", "&")


def html_text_extract(sf_dir: str) -> pa.Table:
    """The north rule's per-row invariant, gated directly: extract
    main text from the ``html:binary`` page column and prove it is
    **byte-identical** to the reference text per url.

    The corpus ships clean text, so stage 1 builds the dirty page the
    crawler would have stored (:func:`_build_dirty_html`: head with
    title+script, nav, comment, footer, entity-escaped body) and
    emits ONLY ``(doc_id, html:binary)``; stage 2 -- the operator
    under test -- sees nothing but the html bytes and must recover
    the text (:func:`_extract_main_text`).  The oracle is simply
    ``SELECT doc_id, text, octet_length(text) FROM documents``: the
    driver's value-hash match IS the byte-identity proof (no replant
    on the SQL side -- extraction must invert the build exactly).

    Scale shape: two embarrassingly parallel ``map_batches`` passes,
    zero shuffle, every kernel an Arrow RE2/string call; binary html
    stays zero-copy in the object store between stages."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def build(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.int64())
        dn = did.combine_chunks().to_numpy(zero_copy_only=False)
        html = _build_dirty_html(dn, t.column("text"))
        return pa.table({"doc_id": did, "html": pc.cast(html, pa.binary())})

    def extract(t: pa.Table) -> pa.Table:
        txt = _extract_main_text(t.column("html"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "extracted_text": txt,
                "n_bytes": pc.cast(pc.binary_length(txt), pa.int64()),
            }
        )

    t = pa.Table.from_pandas(
        ds.map_batches(build, batch_format="pyarrow")
        .map_batches(extract, batch_format="pyarrow")
        .to_pandas(),
        preserve_index=False,
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# HTML outlink extraction -> inlink stats (web-graph construction)
# ---------------------------------------------------------------------------
def html_outlinks(sf_dir: str) -> pa.Table:
    """Anchor extraction from the ``html:binary`` column -- the first
    step of web-graph construction (PageRank / spam scoring / crawl
    frontier expansion all start from ``<a href>`` edges).

    Each page plants ``1 + doc_id % 4`` deterministic anchors
    (``dst = (doc_id*7 + 13*j) % n_docs``) alongside its text; the
    operator under test sees only html bytes, splits out every
    ``<a href="..."`` occurrence with Arrow list kernels (no per-row
    Python: ``split_pattern`` -> ``list_flatten`` +
    ``list_parent_indices``, first-of-list prefixes masked out via a
    ``reduceat``-free arange trick), parses the destination doc id
    with one RE2 ``extract_regex``, and aggregates inlink stats per
    destination: ``n_inlinks`` and ``n_src_hosts`` (distinct source
    hosts, host = ``site{src%20}``).  The oracle replants the same
    edge set with ``unnest(range(...))`` and aggregates in SQL.

    Scale shape: single-pass extraction fused with a packed-key
    combiner (``key = dst*32 + src_host``, ``np.unique`` partials per
    batch) -> ONE ``groupby(key).sum`` exchange over pre-aggregated
    (key, cnt) rows (volume bounded by distinct (dst, host) pairs,
    NOT by edge count) -> an output-sized unpack/finish (the result
    table itself is one row per linked-to doc)."""
    from ray.data.aggregate import Sum

    n_docs, _ = _table_meta(sf_dir, "documents")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    build = _build_linked_html(n_docs)

    def extract_combine(t: pa.Table) -> pa.Table:
        src = (
            pc.cast(t.column("doc_id"), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        flat, parent_m, _ = _anchor_tails(t.column("html"))
        srcs = src[parent_m]
        ex = pc.extract_regex(
            flat, r'^https://site[0-9]+\.example/d/(?P<id>[0-9]+)"'
        )
        ids = pc.struct_field(ex, "id")
        if ids.null_count:
            raise ValueError("html_outlinks: unparseable anchor href")
        dst = pc.cast(ids, pa.int64()).to_numpy(zero_copy_only=False)
        key, cnt = np.unique(dst * 32 + (srcs % 20), return_counts=True)
        return pa.table(
            {"key": pa.array(key), "cnt": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        ds.map_batches(build, batch_format="pyarrow")
        .map_batches(extract_combine, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt"))
        .to_pandas()
    )
    agg = _named_agg(agg, ["key", "cnt"])
    key = agg["key"].to_numpy(dtype=np.int64)
    cnt = agg["cnt"].to_numpy(dtype=np.int64)
    order = np.argsort(key, kind="stable")
    key, cnt = key[order], cnt[order]
    dst = key >> 5
    # output-sized finish: one row per linked-to doc
    uniq, idx = np.unique(dst, return_index=True)
    n_inlinks = np.add.reduceat(cnt, idx) if len(cnt) else np.array([], np.int64)
    n_src_hosts = np.diff(np.append(idx, len(dst)))
    return pa.table(
        {
            "dst_doc": pa.array(uniq.astype(np.int64)),
            "n_inlinks": pa.array(n_inlinks.astype(np.int64)),
            "n_src_hosts": pa.array(n_src_hosts.astype(np.int64)),
        }
    )


def _anchor_tails(html_col):
    """Shared ``<a href="`` splitter for every anchor extractor
    (:func:`html_outlinks`, :func:`web_pagerank`,
    :func:`web_crawl_frontier`, :func:`web_anchor_text`): returns
    ``(tails, parent, lens)`` -- the flat string tails following each
    anchor open (per-row list prefixes masked out via the
    arange-ordinal trick), each tail's parent row index, and each
    row's raw split length (anchor count = ``lens - 1``)."""
    h = (html_col.combine_chunks()
         if isinstance(html_col, pa.ChunkedArray) else html_col)
    h = pc.cast(h, pa.large_string())
    parts = pc.split_pattern(h, '<a href="')
    lens = pc.list_value_length(parts).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    starts = np.cumsum(lens) - lens
    ordin = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)
    mask = ordin > 0
    return flat.filter(pa.array(mask)), parent[mask], lens


def _build_linked_html(
    n_docs: int, universe: int | None = None, anchor_terms: bool = False
):
    """Page builder shared by :func:`html_outlinks`,
    :func:`web_pagerank`, :func:`web_crawl_frontier` and
    :func:`web_anchor_text`: each page plants ``1 + doc_id % 4``
    deterministic anchors (``dst = (doc_id*7 + 13*j) % universe``,
    ``universe`` defaults to ``n_docs``) around its escaped text -- the
    operators under test then see only html bytes.

    ``universe > n_docs`` plants links whose targets are NOT in the
    corpus (the crawl-frontier shape).  ``anchor_terms=True`` gives
    each anchor a deterministic text token ``w{(src + dst + j) % 11}``
    instead of the constant ``l`` (the inbound-anchor-text shape); the
    href grammar is unchanged either way, so every extractor kernel
    works on every variant."""
    uni = universe or n_docs

    def build(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.int64())
        dn = did.combine_chunks().to_numpy(zero_copy_only=False)
        s = pa.scalar
        parts = [s("<html><body>")]
        for j in range(1, 5):
            dst = (dn * 7 + 13 * j) % uni
            if anchor_terms:
                term = pc.binary_join_element_wise(
                    s("w"), pc.cast(pa.array((dn + dst + j) % 11), pa.string()),
                    "",
                )
            else:
                term = s("l")
            anchor = pc.binary_join_element_wise(
                s('<a href="https://site'),
                pc.cast(pa.array(dst % 20), pa.string()),
                s(".example/d/"),
                pc.cast(pa.array(dst), pa.string()),
                s('">'),
                term,
                s("</a>"),
                "",
            )
            parts.append(
                pc.if_else(pa.array(dn % 4 >= j - 1), anchor, s(""))
            )
        parts += [s("<p>"), _escape_html_text(t.column("text")),
                  s("</p></body></html>")]
        html = pc.binary_join_element_wise(*parts, "")
        return pa.table({"doc_id": did, "html": pc.cast(html, pa.binary())})

    return build


def web_pagerank(sf_dir: str, iters: int = 3) -> pa.Table:
    """PageRank over the REAL extracted web graph: edges come out of
    the ``html:binary`` bytes with the same anchor kernels as
    :func:`html_outlinks` (split_pattern -> list_flatten/parent,
    extract_regex), out-degree comes from the page itself (its anchor
    count), and the damped iteration runs with EXACT int64 ranks so
    the SQL oracle reproduces every rank bit-for-bit: ranks at scale
    1e12, per-edge share ``r // outdeg``, update ``base +
    (85 * in_sum) // 100`` with ``base = (15 * (R // N)) // 100`` --
    all floor ops, identical in numpy and DuckDB.  Unlike
    :func:`doc_pagerank` (fixed synthetic out-degree 3, no edge
    table), this is the full scatter-gather shape a real crawl graph
    needs: variable out-degree, an edge TABLE that must be co-located
    with the rank state.

    Scale shape: edges are extracted ONCE and materialized already
    stamped with ``_p = hash(src)`` (object-store blocks, reused
    every iteration -- html is never re-parsed); each iteration is
    (1) a union of the tagged rank table (same partitioner) with the
    edge blocks and ONE exchange on ``_p`` so every src's rank and
    its out-edges land in one block, (2) a vectorized searchsorted
    share expansion (rank-not-found doubles as the split guard),
    (3) ONE exchange on ``hash(dst)`` and a reduceat gather-sum.
    Rank state never touches the driver until the output-sized
    finish."""
    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    R = _PR_SCALE
    base = (15 * (R // n_docs)) // 100
    r0 = R // n_docs
    P = _exchange_width(n_docs * 4)

    tag_schema = pa.schema(
        [("k1", pa.int64()), ("k2", pa.int64()), ("k3", pa.int64()),
         ("kind", pa.int64()), ("_p", pa.int64())]
    )
    share_schema = pa.schema(
        [("dst", pa.int64()), ("share", pa.int64()), ("_p", pa.int64())]
    )
    rank_schema = pa.schema([("doc_id", pa.int64()), ("r", pa.int64())])

    def edges_extract(t: pa.Table) -> pa.Table:
        """build() output -> tagged edge rows (src, dst, outdeg)."""
        if t.num_rows == 0:
            return tag_schema.empty_table()
        src = (
            pc.cast(t.column("doc_id"), pa.int64())
            .combine_chunks().to_numpy(zero_copy_only=False)
        )
        flat, parent_m, lens = _anchor_tails(t.column("html"))
        srcs = src[parent_m]
        outdeg = (lens - 1)[parent_m]
        ex = pc.extract_regex(
            flat, r'^https://site[0-9]+\.example/d/(?P<id>[0-9]+)"'
        )
        ids = pc.struct_field(ex, "id")
        if ids.null_count:
            raise ValueError("web_pagerank: unparseable anchor href")
        dst = pc.cast(ids, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"k1": pa.array(srcs), "k2": pa.array(dst),
             "k3": pa.array(outdeg),
             "kind": pa.array(np.ones(len(dst), np.int64)),
             "_p": pa.array(partition_ids(pa.array(srcs), P))},
            schema=tag_schema,
        )

    def tag_ranks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tag_schema.empty_table()
        doc = pc.cast(t.column("doc_id"), pa.int64())
        n = t.num_rows
        return pa.table(
            {"k1": doc, "k2": t.column("r"),
             "k3": pa.array(np.zeros(n, np.int64)),
             "kind": pa.array(np.zeros(n, np.int64)),
             "_p": pa.array(partition_ids(doc, P))},
            schema=tag_schema,
        )

    # page build shared with html_outlinks (same planted anchors);
    # extract once, keep the stamped edge blocks in the object store
    edges_ds = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_build_linked_html(n_docs), batch_format="pyarrow")
        .map_batches(edges_extract, batch_format="pyarrow")
        .materialize()
    )

    ranks = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: tag_ranks(
            pa.table(
                {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                 "r": pa.array(np.full(t.num_rows, r0, np.int64))},
                schema=rank_schema,
            )
        ),
        batch_format="pyarrow",
    )

    guards = []
    for it in range(iters):
        gd = _new_guard_dir(f"wpr{it}")
        guards.append(gd)

        def join_block(t: pa.Table, _gd=gd, _it=it) -> pa.Table:
            if t.num_rows == 0:
                return share_schema.empty_table()
            _guard_record(
                _gd, f"wprj{_it}",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            kind = t.column("kind").to_numpy(zero_copy_only=False)
            k1 = t.column("k1").to_numpy(zero_copy_only=False)
            k2 = t.column("k2").to_numpy(zero_copy_only=False)
            k3 = t.column("k3").to_numpy(zero_copy_only=False)
            is_r = kind == 0
            rdoc, rr = k1[is_r], k2[is_r]
            order = np.argsort(rdoc, kind="stable")
            rdoc, rr = rdoc[order], rr[order]
            esrc, edst, edeg = k1[~is_r], k2[~is_r], k3[~is_r]
            pos = np.searchsorted(rdoc, esrc)
            if len(esrc) and (
                (pos >= len(rdoc)).any() or (rdoc[pos] != esrc).any()
            ):
                raise RuntimeError(
                    "web_pagerank: edge src without co-located rank "
                    "(exchange split a partition across blocks)"
                )
            sh = rr[pos] // edeg if len(esrc) else esrc
            dst = np.concatenate([edst, rdoc])
            share = np.concatenate([sh, np.zeros(len(rdoc), np.int64)])
            return pa.table(
                {"dst": pa.array(dst), "share": pa.array(share),
                 "_p": pa.array(partition_ids(pa.array(dst), P))},
                schema=share_schema,
            )

        def gather(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return tag_schema.empty_table()
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            share = t.column("share").to_numpy(zero_copy_only=False)
            order = np.argsort(dst, kind="stable")
            dst, share = dst[order], share[order]
            starts = np.flatnonzero(
                np.concatenate([[True], dst[1:] != dst[:-1]])
            )
            sums = np.add.reduceat(share, starts)
            return tag_ranks(
                pa.table(
                    {"doc_id": pa.array(dst[starts]),
                     "r": pa.array(base + (85 * sums) // 100)},
                    schema=rank_schema,
                )
            )

        ranks = (
            ranks.union(edges_ds)
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(join_block, batch_format="pyarrow", batch_size=None)
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(gather, batch_format="pyarrow", batch_size=None)
        )

    t = pa.Table.from_pandas(ranks.to_pandas(), preserve_index=False)
    t = pa.table(
        {"doc_id": t.column("k1"), "r": t.column("k2")}, schema=rank_schema
    )
    for gd in guards:
        t = _finalize_guard(gd, t)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# Crawl-frontier discovery (outlink anti-join against the crawled set)
# ---------------------------------------------------------------------------
def web_crawl_frontier(sf_dir: str) -> pa.Table:
    """Frontier expansion -- the step after outlink extraction in a
    crawler: which link targets are NOT yet in the corpus, and how
    often / from how many hosts were they discovered (discovery count
    drives crawl prioritization).

    Pages are built with a link universe of ``2 * n_docs`` (same
    planted grammar as :func:`html_outlinks`, ``universe`` knob), so
    roughly half the anchor targets point outside the corpus.  The
    operator sees only html bytes + the corpus's own ``doc_id`` set:
    it extracts every href, pre-aggregates ``(dst, src_host)`` pairs
    per block, and anti-joins against the crawled ids.

    Scale shape: candidates are combined to distinct ``(dst, host)``
    pairs per block BEFORE anything shuffles; the crawled side ships
    only its ids.  Both sides take ONE explicit-boundary exchange on
    ``hash(dst)`` (kind-tagged union, the repo's standard co-partition
    join); each block then resolves membership with one searchsorted
    sweep and emits only uncrawled targets -- output is bounded by
    distinct frontier urls, never by edge count.  A guard sentinel per
    block (crawled-id count per partition, summed and uniqueness-
    checked on the driver) makes a split partition -- which could
    surface a crawled url as frontier -- fail loudly."""
    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    build = _build_linked_html(n_docs, universe=2 * n_docs)
    P = _exchange_width(n_docs * 4)
    u_schema = pa.schema(
        [("key", pa.int64()), ("cnt", pa.int64()),
         ("kind", pa.int64()), ("_p", pa.int64())]
    )

    def extract_candidates(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return u_schema.empty_table()
        src = (
            pc.cast(t.column("doc_id"), pa.int64())
            .combine_chunks().to_numpy(zero_copy_only=False)
        )
        flat, parent_m, _ = _anchor_tails(t.column("html"))
        srcs = src[parent_m]
        ex = pc.extract_regex(
            flat, r'^https://site[0-9]+\.example/d/(?P<id>[0-9]+)"'
        )
        ids = pc.struct_field(ex, "id")
        if ids.null_count:
            raise ValueError("web_crawl_frontier: unparseable anchor href")
        dst = pc.cast(ids, pa.int64()).to_numpy(zero_copy_only=False)
        key, cnt = np.unique(dst * 32 + (srcs % 20), return_counts=True)
        return pa.table(
            {"key": pa.array(key), "cnt": pa.array(cnt.astype(np.int64)),
             "kind": pa.array(np.zeros(len(key), np.int64)),
             "_p": pa.array(partition_ids(pa.array(key >> 5), P))},
            schema=u_schema,
        )

    def tag_crawled(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return u_schema.empty_table()
        did = pc.cast(t.column("doc_id"), pa.int64())
        n = t.num_rows
        return pa.table(
            {"key": did, "cnt": pa.array(np.zeros(n, np.int64)),
             "kind": pa.array(np.ones(n, np.int64)),
             "_p": pa.array(partition_ids(did, P))},
            schema=u_schema,
        )

    def anti_join(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("dst_doc", pa.int64()), ("n_discoveries", pa.int64()),
             ("n_src_hosts", pa.int64()), ("_guard_part", pa.int64()),
             ("_guard_crawled", pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        kind = t.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        key = t.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").combine_chunks().to_numpy(zero_copy_only=False)
        crawled = np.sort(key[kind == 1])
        ckey, ccnt = key[kind == 0], cnt[kind == 0]
        dst = ckey >> 5
        pos = np.searchsorted(crawled, dst)
        pos_c = np.minimum(pos, max(len(crawled) - 1, 0))
        known = (crawled[pos_c] == dst) if len(crawled) else np.zeros(
            len(dst), bool
        )
        # merge duplicate (dst, host) keys arriving from DIFFERENT
        # extract blocks before counting: n_src_hosts is a DISTINCT
        # count, so per-block-deduped rows must be re-deduped here
        keep_key, keep_cnt = ckey[~known], ccnt[~known]
        ukey, inv = np.unique(keep_key, return_inverse=True)
        ucnt = np.zeros(len(ukey), np.int64)
        np.add.at(ucnt, inv, keep_cnt)
        dst = ukey >> 5  # ukey sorted -> dst nondecreasing
        uniq, idx = np.unique(dst, return_index=True)
        n_disc = (np.add.reduceat(ucnt, idx) if len(ucnt)
                  else np.array([], np.int64))
        n_hosts = np.diff(np.append(idx, len(dst)))
        # data rows + one guard sentinel per partition present in the
        # block (crawled-id count; driver sums + uniqueness-checks)
        g, parts = len(uniq), pc.unique(t.column("_p")).to_pylist()
        return pa.table(
            {
                "dst_doc": pa.array(
                    np.concatenate([uniq, np.full(len(parts), -1)])
                    .astype(np.int64)
                ),
                "n_discoveries": pa.array(
                    np.concatenate([n_disc, np.zeros(len(parts))])
                    .astype(np.int64)
                ),
                "n_src_hosts": pa.array(
                    np.concatenate([n_hosts, np.zeros(len(parts))])
                    .astype(np.int64)
                ),
                "_guard_part": pa.array(
                    np.concatenate([np.full(g, -1), np.array(parts)])
                    .astype(np.int64)
                ),
                "_guard_crawled": pa.array(
                    np.concatenate([np.full(g, -1),
                                    np.full(len(parts), len(crawled))])
                    .astype(np.int64)
                ),
            },
            schema=out_schema,
        )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cands = docs.map_batches(build, batch_format="pyarrow").map_batches(
        extract_candidates, batch_format="pyarrow"
    )
    crawled_ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        tag_crawled, batch_format="pyarrow"
    )
    t = pa.Table.from_pandas(
        cands.union(crawled_ds)
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(anti_join, batch_size=None, batch_format="pyarrow")
        .to_pandas(),
        preserve_index=False,
    )
    guards = t.filter(pc.greater_equal(t.column("_guard_part"), 0))
    gparts = guards.column("_guard_part").to_pylist()
    if len(gparts) != len(set(gparts)):
        raise RuntimeError(
            "web_crawl_frontier: exchange split a partition across "
            "blocks; a crawled url could leak into the frontier"
        )
    n_seen = sum(guards.column("_guard_crawled").to_pylist())
    n_docs_actual, _ = _table_meta(sf_dir, "documents")
    if n_seen != n_docs_actual:
        raise RuntimeError(
            f"web_crawl_frontier: crawled-side rows lost in the "
            f"exchange ({n_seen} != {n_docs_actual})"
        )
    t = t.filter(pc.equal(t.column("_guard_part"), -1)).drop_columns(
        ["_guard_part", "_guard_crawled"]
    )
    return t.take(pc.sort_indices(t, sort_keys=[("dst_doc", "ascending")]))


# ---------------------------------------------------------------------------
# Inbound anchor-text aggregation (the classic web-search signal)
# ---------------------------------------------------------------------------
def web_anchor_text(sf_dir: str) -> pa.Table:
    """Per-target inbound ANCHOR TEXT profile: for every linked-to doc,
    total inbound anchors, distinct anchor terms, and the most frequent
    term (ties -> numerically smallest term id, mirrored by the
    oracle's ``ORDER BY c DESC, tid ASC``) -- the signal search
    engines index a page under (anchor text of inbound links describes
    the target better than the target itself).

    Pages plant anchors with deterministic text ``w{(src+dst+j)%11}``
    (:func:`_build_linked_html` ``anchor_terms``); the operator sees
    only html bytes, extracts ``(dst, term)`` with one RE2 kernel over
    the split anchor tails, and pre-aggregates packed
    ``key = dst*16 + term_id`` counts per block.

    Scale shape: one ``groupby(key).sum`` exchange over pre-aggregated
    rows (volume bounded by distinct (target, term) pairs -- with a
    bounded anchor vocabulary this is O(targets), not O(edges)); the
    finish is output-sized: unpack, ``lexsort`` per target, first-row
    argmax with the tie-break baked into the sort key."""
    from ray.data.aggregate import Sum

    n_docs, _ = _table_meta(sf_dir, "documents")
    build = _build_linked_html(n_docs, anchor_terms=True)

    def extract_terms(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("key", pa.int64()), ("cnt", pa.int64())]
            ).empty_table()
        flat, _, _ = _anchor_tails(t.column("html"))
        ex = pc.extract_regex(
            flat,
            r'^https://site[0-9]+\.example/d/(?P<id>[0-9]+)">w(?P<tid>[0-9]+)</a>',
        )
        ids = pc.struct_field(ex, "id")
        tids = pc.struct_field(ex, "tid")
        if ids.null_count or tids.null_count:
            raise ValueError("web_anchor_text: unparseable anchor")
        dst = pc.cast(ids, pa.int64()).to_numpy(zero_copy_only=False)
        tid = pc.cast(tids, pa.int64()).to_numpy(zero_copy_only=False)
        if tid.max(initial=0) >= 16:
            raise ValueError("web_anchor_text: term id overflows the pack")
        key, cnt = np.unique(dst * 16 + tid, return_counts=True)
        return pa.table(
            {"key": pa.array(key), "cnt": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(build, batch_format="pyarrow")
        .map_batches(extract_terms, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt"))
        .to_pandas()
    )
    agg = _named_agg(agg, ["key", "cnt"])
    key = agg["key"].to_numpy(dtype=np.int64)
    cnt = agg["cnt"].to_numpy(dtype=np.int64)
    dst, tid = key >> 4, key & 15
    # per-target finish: count desc, term asc -- first row per dst wins
    order = np.lexsort((tid, -cnt, dst))
    dst, tid, cnt = dst[order], tid[order], cnt[order]
    uniq, idx = np.unique(dst, return_index=True)
    n_anchors = np.add.reduceat(cnt, idx) if len(cnt) else np.array([], np.int64)
    n_terms = np.diff(np.append(idx, len(dst)))
    top_tid, top_cnt = tid[idx], cnt[idx]
    top_term = pc.binary_join_element_wise(
        pa.array(["w"] * len(uniq)),
        pc.cast(pa.array(top_tid.astype(np.int64)), pa.string()),
        "",
    )
    return pa.table(
        {
            "dst_doc": pa.array(uniq.astype(np.int64)),
            "n_anchors": pa.array(n_anchors.astype(np.int64)),
            "n_terms": pa.array(n_terms.astype(np.int64)),
            "top_term": top_term,
            "top_cnt": pa.array(top_cnt.astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# Line-level exact dedup (C4 / RefinedWeb shape)
# ---------------------------------------------------------------------------
def line_dedup(sf_dir: str) -> pa.Table:
    """Cross-corpus exact LINE dedup (the C4 / RefinedWeb curation
    step: drop every line whose exact text already occurred anywhere
    earlier in the corpus).  An occurrence is kept iff it is the
    globally FIRST occurrence of that line, ordered by
    ``(doc_id, line_ordinal)``; later repeats -- including within the
    same document -- are dropped.  Returns per-document
    ``(n_lines, n_kept, kept_chars)``.

    Scale shape: Arrow-native line explosion (``split_pattern`` +
    ``list_flatten``/``list_parent_indices``, no per-row Python) ->
    hash exchange on the line text (explicit boundaries,
    split-guarded, so every occurrence of one line lands in ONE
    block) -> per-block vectorized first-of-segment sweep + per-doc
    ``reduceat`` partials -> small ``groupby(doc_id).sum``.  Only
    (line, doc_id, ord) triples cross the exchange; the winner
    arbitration never leaves the block."""
    from ray.data.aggregate import Sum

    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    # ~tens of lines per web document; size the exchange for the
    # exploded row count, not the doc count
    P = _exchange_width(n_docs * 32)
    gd = _new_guard_dir("linededup")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    exploded_schema = pa.schema(
        [
            ("line", pa.string()),
            ("doc_id", pa.int64()),
            ("ord", pa.int64()),
            ("_p", pa.int64()),
        ]
    )

    def line_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return exploded_schema.empty_table()
        text = t.column("text").combine_chunks()
        ls = pc.split_pattern(text, "\n")
        flat = pc.cast(pc.list_flatten(ls), pa.string())
        parent = pc.list_parent_indices(ls)
        doc = pc.cast(t.column("doc_id").take(parent), pa.int64())
        lens = (
            pc.fill_null(pc.list_value_length(ls), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ordv = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        if len(flat) == 0:
            return exploded_schema.empty_table()
        return pa.table(
            {
                "line": flat,
                "doc_id": doc,
                "ord": pa.array(ordv),
                "_p": pa.array(partition_ids(flat, P)),
            },
            schema=exploded_schema,
        )

    partial_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_lines", pa.int64()),
            ("n_kept", pa.int64()),
            ("kept_chars", pa.int64()),
        ]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return partial_schema.empty_table()
        _guard_record(
            gd, "linededup", t.column("_p").to_numpy(zero_copy_only=False)
        )
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("line", "ascending"),
                    ("doc_id", "ascending"),
                    ("ord", "ascending"),
                ],
            )
        )
        lines = t.column("line").combine_chunks()
        n = len(lines)
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = pc.not_equal(
                lines.slice(1), lines.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        chars = (
            pc.utf8_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        order, starts, counts = _group_segments(doc)
        kept = first[order].astype(np.int64)
        kept_chars = (chars * first)[order]
        return pa.table(
            {
                "doc_id": pa.array(doc[order][starts]),
                "n_lines": pa.array(counts.astype(np.int64)),
                "n_kept": pa.array(np.add.reduceat(kept, starts)),
                "kept_chars": pa.array(np.add.reduceat(kept_chars, starts)),
            },
            schema=partial_schema,
        )

    res = (
        ds.map_batches(line_rows, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .aggregate(Sum("n_lines"), Sum("n_kept"), Sum("kept_chars"))
    )
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    t = pa.table(
        {
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "n_lines": pc.cast(t.column("sum(n_lines)"), pa.int64()),
            "n_kept": pc.cast(t.column("sum(n_kept)"), pa.int64()),
            "kept_chars": pc.cast(t.column("sum(kept_chars)"), pa.int64()),
        }
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    return _finalize_guard(gd, t)


# ---------------------------------------------------------------------------
# Cross-document duplicated n-gram density (substring-dedup family)
# ---------------------------------------------------------------------------
def doc_dup_ngrams(sf_dir: str, n: int = 8) -> pa.Table:
    """Per-document duplicated word-``n``-gram density: for every
    document, how many of its word 8-grams occur >= 2 times anywhere
    in the corpus (including other occurrences in the same document).
    This is the map-reduce variant of the exact-substring dedup step
    in "Deduplicating Training Data Makes Language Models Better"
    (Lee et al. 2022): where they build a corpus suffix array, a
    cluster pipeline ships each fixed-width gram to the partition
    that owns it and counts occurrences there -- the same exchange
    the ``line_dedup`` / ``dedup_ngram_jaccard`` operators use.
    ``doc_repetition`` is the intra-document sibling; this one is
    cross-document.

    Returns one row per document: ``(doc_id, n_grams, n_dup_grams)``
    (documents shorter than ``n`` words report ``0, 0``).

    Scale shape: Arrow-native gram construction (``split_pattern`` +
    ``binary_join_element_wise`` over ``n`` shifted zero-copy slices
    of the flattened word array -- no per-row Python) -> hash
    exchange on the gram STRING (explicit boundaries, split-guarded:
    every occurrence of one gram lands in ONE block, and arbitration
    is exact on strings, not hashes) -> per-block segment-count sweep
    + per-doc ``reduceat`` partials -> small ``groupby(doc_id).sum``.
    Only (gram, doc_id) pairs cross the exchange; gram counting never
    leaves the block."""
    from ray.data.aggregate import Sum

    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    # ~50-100 words per synthetic web document; size the exchange for
    # the exploded gram count, not the doc count
    P = _exchange_width(n_docs * 64)
    gd = _new_guard_dir("dupngrams")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    gram_schema = pa.schema(
        [("gram", pa.large_string()), ("doc_id", pa.int64()),
         ("_p", pa.int64())]
    )

    def gram_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return gram_schema.empty_table()
        text = pc.cast(t.column("text").combine_chunks(), pa.large_string())
        ls = pc.split_pattern(text, " ")
        flat = pc.list_flatten(ls)
        parent = pc.list_parent_indices(ls).to_numpy(zero_copy_only=False)
        m = len(flat) - n + 1
        if m <= 0:
            return gram_schema.empty_table()
        shifted = [flat.slice(j, m) for j in range(n)]
        grams = pc.binary_join_element_wise(
            *shifted, pa.scalar(" ", pa.large_string())
        )
        # a window is a real gram only when all n words share a doc
        valid = parent[:m] == parent[n - 1 : n - 1 + m]
        doc = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )[parent[:m]]
        grams = grams.filter(pa.array(valid))
        doc = doc[valid]
        if len(grams) == 0:
            return gram_schema.empty_table()
        return pa.table(
            {"gram": grams, "doc_id": pa.array(doc),
             "_p": pa.array(partition_ids(grams, P))},
            schema=gram_schema,
        )

    dup_schema = pa.schema([("doc_id", pa.int64()), ("n_dup", pa.int64())])

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return dup_schema.empty_table()
        _guard_record(
            gd, "dupngrams", t.column("_p").to_numpy(zero_copy_only=False)
        )
        t = t.take(pc.sort_indices(t, sort_keys=[("gram", "ascending")]))
        grams = t.column("gram").combine_chunks()
        nrow = len(grams)
        brk = np.ones(nrow, bool)
        if nrow > 1:
            brk[1:] = pc.not_equal(
                grams.slice(1), grams.slice(0, nrow - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, nrow))
        dup = np.repeat(counts >= 2, counts).astype(np.int64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order, dstarts, dcounts = _group_segments(doc)
        return pa.table(
            {"doc_id": pa.array(doc[order][dstarts]),
             "n_dup": pa.array(np.add.reduceat(dup[order], dstarts))},
            schema=dup_schema,
        )

    dup = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .aggregate(Sum("n_dup"))
        .to_pandas()
    )
    dup = _named_agg(dup, ["doc_id", "n_dup_grams"])

    # total gram count per doc: one cheap vectorized pass, no exchange
    def totals(t: pa.Table) -> pa.Table:
        words = pc.add(
            pc.count_substring(t.column("text"), " "), pa.scalar(1)
        )
        ng = pc.max_element_wise(
            pc.cast(pc.subtract(words, pa.scalar(n - 1)), pa.int64()),
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "n_grams": ng}
        )

    tot = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(totals, batch_format="pyarrow")
        .to_pandas()
    )
    out = tot.merge(dup, on="doc_id", how="left").fillna({"n_dup_grams": 0})
    t = pa.table(
        {"doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
         "n_grams": pa.array(out["n_grams"].to_numpy(), pa.int64()),
         "n_dup_grams": pa.array(
             out["n_dup_grams"].to_numpy().astype(np.int64)
         )}
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    return _finalize_guard(gd, t)


def inverted_index_topdocs(
    sf_dir: str, n_words: int = 30, k: int = 10
) -> pa.Table:
    """Search-index construction: for the ``n_words`` highest
    document-frequency words, the head of the word's POSTING LIST --
    the first ``k`` containing ``doc_id``s ascending, comma-joined --
    plus the full document frequency.  Returns ``(word, df,
    postings)`` ordered by ``(df desc, word)``; the artifact shape an
    inverted-index build job writes per term shard.

    Distributed shape: each documents block emits its per-doc
    DISTINCT ``(word, doc_id)`` pairs (globally distinct for free --
    a document lives in exactly one block), one word-hash exchange
    co-locates each term's postings, and the per-block sweep computes
    df + the capped ascending posting prefix with the segment-gather
    + ``binary_join`` layout `events_user_path` uses -- then emits
    only its LOCAL top-``n_words``, so the driver merges P x n rows,
    never the vocabulary."""
    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    # pair volume ~ tokens-per-doc x docs; words dominate the exchange
    P = _exchange_width(n_docs * 64)
    gd = _new_guard_dir("invidx")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    pair_schema = pa.schema(
        [("word", pa.string()), ("doc_id", pa.int64()), ("_p", pa.int64())]
    )

    def pairs(t: pa.Table) -> pa.Table:
        words: list[str] = []
        docs: list[int] = []
        ids = t.column("doc_id").to_pylist()
        for did, s in zip(ids, t.column("text").to_pylist()):
            uniq = set(_WORD.findall((s or "").lower()))
            words.extend(uniq)
            docs.extend([did] * len(uniq))
        if not words:
            return pair_schema.empty_table()
        warr = pa.array(words, pa.string())
        return pa.table(
            {"word": warr,
             "doc_id": pa.array(docs, pa.int64()),
             "_p": pa.array(partition_ids(warr, P))},
            schema=pair_schema,
        )

    out_schema = pa.schema(
        [("word", pa.large_string()), ("df", pa.int64()),
         ("postings", pa.large_string())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(
            gd, "invidx", t.column("_p").to_numpy(zero_copy_only=False)
        )
        w = np.asarray(t.column("word").to_pylist(), dtype=object)
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, w))
        w, d = w[order], d[order]
        starts = np.flatnonzero(np.concatenate([[True], w[1:] != w[:-1]]))
        df = np.diff(np.append(starts, len(w))).astype(np.int64)
        # capped ascending posting prefix per segment
        cap = np.minimum(df, k)
        rep = np.repeat(starts, cap)
        within = np.arange(cap.sum()) - np.repeat(
            np.concatenate([[0], np.cumsum(cap)[:-1]]), cap
        )
        gathered = d[rep + within]
        values = pc.cast(pa.array(gathered), pa.large_string())
        offsets = pa.array(np.concatenate([[0], np.cumsum(cap)]), pa.int64())
        lists = pa.LargeListArray.from_arrays(offsets, values)
        postings = pc.binary_join(lists, pa.scalar(",", pa.large_string()))
        words_out = pa.array(list(w[starts]), pa.large_string())
        # local top-n by (df desc, word asc): complete per word here,
        # so the global top-n is contained in the union of local ones
        neg = -df
        top = np.lexsort((np.asarray(w[starts], dtype=object), neg))[:n_words]
        idx = pa.array(top)
        return pa.table(
            {"word": words_out.take(idx),
             "df": pa.array(df, pa.int64()).take(idx),
             "postings": postings.take(idx)},
            schema=out_schema,
        )

    res = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )
    cand = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    cand = cand.cast(out_schema)
    wv = np.asarray(cand.column("word").to_pylist(), dtype=object)
    dfv = cand.column("df").to_numpy()
    top = np.lexsort((wv, -dfv))[:n_words]
    out = cand.take(pa.array(top)).cast(
        pa.schema([("word", pa.string()), ("df", pa.int64()),
                   ("postings", pa.string())])
    )
    return _finalize_guard(gd, out)


def _ed_is_1(a: str, b: str) -> bool:
    """Exact edit-distance==1 check for candidate pairs whose lengths
    differ by at most 1 (guaranteed by the deletion-key generator)."""
    if len(a) == len(b):
        return sum(x != y for x, y in zip(a, b)) == 1
    if len(a) > len(b):
        a, b = b, a
    i = 0
    while i < len(a) and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def vocab_fuzzy_join(sf_dir: str) -> pa.Table:
    """Edit-distance-1 fuzzy self-join over the corpus vocabulary
    (FastSS deletion neighborhoods, Bocek et al. 2007): every pair of
    distinct words within one insert/delete/substitute of each other
    -- the spelling-variant miner behind query correction and OCR /
    typo normalization.  The driver corpus draws from a ~31-word list
    with no natural ed-1 pairs, so (pii_redaction precedent) a typo
    variant is PLANTED identically on both sides: docs with ``doc_id
    % 5 == 0`` contribute their first token minus its first character
    as an extra vocabulary word; the oracle restates the plant and
    then computes the exact join, so incidental pairs are covered
    either way.

    Distributed shape: three bounded exchanges, no driver loops.
    (1) per-block DISTINCT words (len 3..20) emit (key, word) rows
    for key = the word itself plus each single-character deletion,
    stamped by key hash; (2) per delivered block, bucket words by
    key and pair within buckets -- a deletion-key bucket is bounded
    by the ALPHABET (at most ~37*(L+1) insertions map to one key),
    never by vocabulary size, so the quadratic stays constant-sized;
    candidate pairs are verified with the exact two-pointer ed==1
    check (shared-key is necessary, not sufficient: del(w1,i) ==
    del(w2,j), i != j can be ed 2); (3) verified pairs exchange on
    the pair hash for global dedup (one pair is discoverable under
    several shared keys).  Exchange widths derive from corpus size
    via `_exchange_width`; the block-split guard fails loudly."""
    n_rows, _ = _table_meta(sf_dir, "documents")
    P = _exchange_width(n_rows)
    gd = _new_guard_dir("fuzzy")

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    key_schema = pa.schema(
        [("k", pa.string()), ("w", pa.string()), ("_p", pa.int64())]
    )

    def del_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return key_schema.empty_table()
        low = pc.utf8_lower(t.column("text").combine_chunks())
        words: set[str] = set()
        for s in low.to_pylist():
            words.update(_WORD.findall(s or ""))
        # the planted typo stream: first token minus first char for
        # doc_id % 5 == 0 (restated verbatim in the SQL oracle)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(did % 5 == 0)
        if len(sel):
            first = pc.extract_regex(
                low.take(pa.array(sel)), r"(?P<w>[a-z0-9]+)"
            )
            for item in first.to_pylist():
                if item and item["w"]:
                    words.add(item["w"][1:])
        ks, ws = [], []
        for w in words:
            if not (3 <= len(w) <= 20):
                continue
            ks.append(w)
            ws.append(w)
            for i in range(len(w)):
                ks.append(w[:i] + w[i + 1 :])
                ws.append(w)
        karr = pa.array(ks, pa.string())
        return pa.table(
            {"k": karr, "w": pa.array(ws, pa.string()),
             "_p": pa.array(partition_ids(karr, P))},
            schema=key_schema,
        )

    pair_schema = pa.schema(
        [("word1", pa.string()), ("word2", pa.string()),
         ("_p", pa.int64())]
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        _guard_record(gd, "fuzzy-key",
                      t.column("_p").to_numpy(zero_copy_only=False))
        ks = np.asarray(t.column("k").to_pylist(), dtype=object)
        ws = np.asarray(t.column("w").to_pylist(), dtype=object)
        # dedup (key, word): the same pair arrives from every block
        # that saw the word
        kw = np.char.add(np.char.add(ks.astype(str), "\x00"),
                         ws.astype(str))
        _, first = np.unique(kw, return_index=True)
        ks, ws = ks[first], ws[first]
        order = np.argsort(ks, kind="stable")
        ks, ws = ks[order], ws[order]
        starts, counts = _segment_starts(ks)
        p1, p2 = [], []
        for s, c in zip(starts, counts):
            if c < 2:
                continue
            bucket = sorted(ws[s : s + c])
            for i in range(len(bucket) - 1):
                for j in range(i + 1, len(bucket)):
                    a, b = bucket[i], bucket[j]
                    if a != b and _ed_is_1(a, b):
                        p1.append(a)
                        p2.append(b)
        if not p1:
            return pair_schema.empty_table()
        a1 = pa.array(p1, pa.string())
        a2 = pa.array(p2, pa.string())
        return pa.table(
            {"word1": a1, "word2": a2,
             "_p": pa.array(partition_ids(
                 pc.binary_join_element_wise(a1, a2, "\x00"), P))},
            schema=pair_schema,
        )

    out_schema = pa.schema(
        [("word1", pa.string()), ("word2", pa.string())]
    )

    def dedup_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "fuzzy-pair",
                      t.column("_p").to_numpy(zero_copy_only=False))
        w1 = np.asarray(t.column("word1").to_pylist(), dtype=object)
        w2 = np.asarray(t.column("word2").to_pylist(), dtype=object)
        comb = np.char.add(np.char.add(w1.astype(str), "\x00"),
                           w2.astype(str))
        _, first = np.unique(comb, return_index=True)
        return pa.table(
            {"word1": pa.array(list(w1[first]), pa.string()),
             "word2": pa.array(list(w2[first]), pa.string())},
            schema=out_schema,
        )

    df = (
        ds.map_batches(del_keys, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(bucket_pairs, batch_format="pyarrow", batch_size=None)
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(dedup_pairs, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    df = df.sort_values(["word1", "word2"], ignore_index=True)
    out = pa.table(
        {"word1": pa.array(list(df["word1"]), pa.string()),
         "word2": pa.array(list(df["word2"]), pa.string())}
    )
    return _finalize_guard(gd, out)


def doc_triangles(sf_dir: str) -> pa.Table:
    """Distributed triangle counting over the deterministic doc-link
    graph (ring + chord: ``u -> (u+1, u+2, 7u+1) mod N``, undirected,
    deduped, self-loops dropped) -- the classic two-round MapReduce
    graph pattern (Suri & Vassilvitskii 2011) completing the graph
    family next to `doc_pagerank` (scatter-gather) and
    `doc_bfs_levels` (frontier propagation).  Returns one witness row
    ``(n_edges, n_wedges, n_triangles)``; with every edge oriented
    low->high, each triangle x<y<z is found exactly once (wedge at x
    = (y,z), closed by edge (y,z)).

    Distributed shape: three explicit-boundary exchanges.  (1) raw
    generator edges dedup on the edge hash (the same undirected edge
    arises from both endpoints' generators); (2) unique edges
    co-locate on the LOW endpoint, per-block adjacency pairing emits
    wedges -- bounded by sum(deg^2), degree <= 6 here by
    construction; (3) wedges union edges, co-located on the (x,y)
    pair hash, one sorted-membership sweep counts closures.  Only
    three counters reach the driver."""
    n_docs, _ = _table_meta(sf_dir, "documents")
    N = np.int64(n_docs)
    P = _exchange_width(n_docs * 3)
    gd = _new_guard_dir("tri")

    edge_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("_p", pa.int64())]
    )

    def _pair_stamp(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # packed int key (b < N) -> canonical string inside
        # partition_ids; fully vectorized
        return partition_ids(pa.array(a * (N + 1) + b), P)

    def gen_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_schema.empty_table()
        u = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([u, u, u])
        dst = np.concatenate(
            [(u + 1) % N, (u + 2) % N, (7 * u + 1) % N]
        )
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b),
             "_p": pa.array(_pair_stamp(a, b))},
            schema=edge_schema,
        )

    def dedup_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_schema.empty_table()
        _guard_record(gd, "tri-edge",
                      t.column("_p").to_numpy(zero_copy_only=False))
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        comb = a * (N + 1) + b
        _, first = np.unique(comb, return_index=True)
        a, b = a[first], b[first]
        # restamp by the low endpoint for the adjacency exchange
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b),
             "_p": pa.array(partition_ids(
                 pa.array(a.astype(str), pa.string()), P))},
            schema=edge_schema,
        )

    # kind 0 = edge (x,y); kind 1 = wedge needing closure edge (x,y)
    mix_schema = pa.schema(
        [("x", pa.int64()), ("y", pa.int64()), ("kind", pa.int64()),
         ("_p", pa.int64())]
    )

    def wedges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mix_schema.empty_table()
        _guard_record(gd, "tri-adj",
                      t.column("_p").to_numpy(zero_copy_only=False))
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts, counts = _segment_starts(a)
        wx, wy = [], []
        for s, c in zip(starts, counts):
            if c < 2:
                continue
            nb = b[s : s + c]  # ascending within the group
            for i in range(len(nb) - 1):
                wx.extend([nb[i]] * (len(nb) - 1 - i))
                wy.extend(nb[i + 1 :])
        wx_arr = np.asarray(wx, np.int64)
        wy_arr = np.asarray(wy, np.int64)
        x = np.concatenate([a, wx_arr])
        y = np.concatenate([b, wy_arr])
        kind = np.concatenate(
            [np.zeros(len(a), np.int64), np.ones(len(wx_arr), np.int64)]
        )
        return pa.table(
            {"x": pa.array(x), "y": pa.array(y), "kind": pa.array(kind),
             "_p": pa.array(_pair_stamp(x, y))},
            schema=mix_schema,
        )

    out_schema = pa.schema(
        [("n_edges", pa.int64()), ("n_wedges", pa.int64()),
         ("n_triangles", pa.int64())]
    )

    def close_count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        _guard_record(gd, "tri-close",
                      t.column("_p").to_numpy(zero_copy_only=False))
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        comb = x * (N + 1) + y
        edges = np.unique(comb[kind == 0])
        wedge = comb[kind == 1]
        closed = int(np.isin(wedge, edges).sum())
        return pa.table(
            {"n_edges": pa.array([int(len(edges))]),
             "n_wedges": pa.array([int(len(wedge))]),
             "n_triangles": pa.array([closed])},
            schema=out_schema,
        )

    df = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(gen_edges, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(dedup_edges, batch_format="pyarrow", batch_size=None)
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(wedges, batch_format="pyarrow", batch_size=None)
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(close_count, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = pa.table(
        {c: pa.array([int(df[c].sum())], pa.int64())
         for c in ("n_edges", "n_wedges", "n_triangles")}
    )
    return _finalize_guard(gd, out)


# ---------------------------------------------------------------------------
# Connected components (min-label propagation + pointer jumping)
# ---------------------------------------------------------------------------
def _cc_block_edges(d: np.ndarray, n: int, B: int = 64):
    """Deterministic sparse multi-component graph over doc ids:
    within each ``B``-block (size ``m = min(B, n - blk*B)``) node
    ``i = d % B`` links to ``(3i+7) % m`` always and to ``(i+13) % m``
    when ``i % 5 == 2``; self-loops dropped.  Block-bounded components
    keep the oracle's reachability closure O(n * B) while the ids
    still hash-scatter across every exchange partition."""
    blk = d // B
    base = blk * B
    m = np.minimum(B, n - base)
    i = d - base
    v1 = base + (3 * i + 7) % m
    u = [d[v1 != d]]
    v = [v1[v1 != d]]
    sel = i % 5 == 2
    v2 = base[sel] + (i[sel] + 13) % m[sel]
    keep = v2 != d[sel]
    u.append(d[sel][keep])
    v.append(v2[keep])
    uu = np.concatenate(u)
    vv = np.concatenate(v)
    # undirected: both directions
    return np.concatenate([uu, vv]), np.concatenate([vv, uu])


#: rounds used by the last doc_connected_components call (telemetry)
_CC_LAST_ROUNDS = 0

#: doc_connected_components switches to the single-block fast finish
#: when the whole message volume (self + edge rows) fits one exchange
#: block; above it, the iterative pointer-jump rounds are the path
CC_FAST_FINISH_ROWS = 2_000_000

#: loud input bound for the deliberately-exact O(n^2)-shaped VERIFY
#: kernels (embedding_near_dup_exact, dedup_ngram_jaccard): they exist
#: to oracle-check the LSH scale paths, never to run on a full corpus
EXACT_KERNEL_MAX_ROWS = 250_000


def doc_connected_components(sf_dir: str, max_rounds: int = 40) -> pa.Table:
    """Exact connected components of the deterministic in-block link
    graph (``_cc_block_edges``): every doc gets ``comp`` = the MINIMUM
    doc_id reachable from it.  The classic PRAM/MapReduce recipe
    (Shiloach-Vishkin style label propagation accelerated by pointer
    jumping, the same convergence trick as the Kiveris et al. 2014
    star-contraction family): each round

    1. RELAX -- two exchanges: scatter each node's label along its
       out-edges (join labels to the static edge list on the source
       id), then gather ``L1(d) = min(L(d), min of offered neighbor
       labels)``;
    2. JUMP -- one exchange: every node asks the node its label points
       at for THAT node's label (``L2(d) = L1(L1(d))``), which halves
       pointer chains and turns the O(diameter) propagation into
       O(log n) rounds.

    Labels are monotone non-increasing and always name a node inside
    the same component, so ``changed == 0`` (an exact per-round
    aggregate, not a heuristic) is the true fixpoint: per-edge label
    equality => per-component constant => the component minimum.

    with each round's RELAX strengthened to a BLOCK-LOCAL TRANSITIVE
    CLOSURE: the scatter block holds a whole subgraph (every edge
    whose source hashed here plus those sources' labels), so instead
    of one min-sweep it iterates edge-relax + pointer-jump over the
    block's numpy arrays to a local fixpoint and offers each local id
    its CLOSED minimum.  Cross-partition chains are the only thing
    left for global rounds, which bounds the exchange-round count to
    ~O(log P-hops) -- 2-3 rounds on the sf graphs vs ~12 for plain
    per-edge relax (round-3 verdict item 5).

    Scale shape: per-round state is one (node, label) row per doc,
    ``materialize()``d into the object store between rounds (same
    footprint as ``doc_pagerank``'s rank vector); the static edge
    message stream is materialized ONCE (not re-derived per round);
    every sweep is a lexsort + reduceat/repeat numpy pass; the driver
    sees only the per-round changed COUNT.  Rounds are bounded by
    ``max_rounds`` with a loud failure, never a silent partial
    answer."""
    global _CC_LAST_ROUNDS

    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    P = _exchange_width(n_docs * 3)

    msg_schema = pa.schema(
        [("key", pa.int64()), ("tag", pa.int64()), ("val", pa.int64()),
         ("aux", pa.int64()), ("_p", pa.int64())]
    )
    lab_schema = pa.schema(
        [("node", pa.int64()), ("lab", pa.int64()), ("old0", pa.int64()),
         ("chg", pa.int64())]
    )

    def _stamp(key: np.ndarray) -> pa.Array:
        return pa.array(partition_ids(pa.array(key.astype(np.int64)), P))

    # round 0 labels: L(d) = d
    def init_labels(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        z = np.zeros(len(did), np.int64)
        return pa.table(
            {"node": pa.array(did), "lab": pa.array(did),
             "old0": pa.array(did), "chg": pa.array(z)},
            schema=lab_schema,
        )

    labels = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(init_labels, batch_format="pyarrow")
        .materialize()
    )

    def _local_closure(
        ids: np.ndarray, val: np.ndarray, iu: np.ndarray, iv: np.ndarray
    ) -> np.ndarray:
        """Exact min-label fixpoint of the block-local subgraph:
        alternate edge relax (group-min over in-edges) and pointer
        jump (follow a label that names a local id) until stable.
        Monotone non-increasing, so the fixpoint is exact; iteration
        count is O(log local-diameter), loudly bounded."""
        for _ in range(64):
            new = val.copy()
            if len(iu):
                order = np.argsort(iv, kind="stable")
                g, o = iv[order], val[iu][order]
                starts, _ = _segment_starts(g)
                tgt = g[starts]
                new[tgt] = np.minimum(
                    new[tgt], np.minimum.reduceat(o, starts)
                )
            pos = np.clip(np.searchsorted(ids, new), 0, len(ids) - 1)
            hit = ids[pos] == new
            new = np.minimum(new, np.where(hit, new[pos], new))
            if np.array_equal(new, val):
                return val
            val = new
        raise RuntimeError("cc local closure did not converge (bug)")

    def edges_stream(t: pa.Table) -> pa.Table:
        did = pc.cast(t.column("doc_id"), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        eu, ev = _cc_block_edges(did, n_docs)
        z = np.zeros(len(eu), np.int64)
        return pa.table(
            {"key": pa.array(eu), "tag": pa.array(z + 1),
             "val": pa.array(ev), "aux": pa.array(z), "_p": _stamp(eu)},
            schema=msg_schema,
        )

    def self_stream(t: pa.Table, reset_old0: bool) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        lab = t.column("lab").to_numpy(zero_copy_only=False)
        old0 = lab if reset_old0 else t.column("old0").to_numpy(
            zero_copy_only=False
        )
        z = np.zeros(len(node), np.int64)
        return pa.table(
            {"key": pa.array(node), "tag": pa.array(z),
             "val": pa.array(lab), "aux": pa.array(old0),
             "_p": _stamp(node)},
            schema=msg_schema,
        )

    def _grouped(t: pa.Table):
        key = t.column("key").to_numpy(zero_copy_only=False)
        tag = t.column("tag").to_numpy(zero_copy_only=False)
        val = t.column("val").to_numpy(zero_copy_only=False)
        aux = t.column("aux").to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, key))
        key, tag, val, aux = key[order], tag[order], val[order], aux[order]
        starts, lens = _segment_starts(key)
        if tag[starts].any():
            raise RuntimeError(
                "cc sweep group without its tag-0 self row "
                "(exchange split a key across blocks?)"
            )
        return key, tag, val, aux, starts, lens

    edge_msgs = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(edges_stream, batch_format="pyarrow")
        .materialize()
    )

    # -- two-level fast finish (Kiveris-style local contraction +
    # centralized remainder): when the whole message volume
    # (n_docs self rows + ~3*n_docs edge rows) provably fits ONE
    # exchange block, a single task closes the union-find exactly --
    # 1 coalesce instead of O(log n) x 3 exchanges.  Above the bound
    # the iterative pointer-jump rounds below are the scale path.
    if n_docs * 4 <= CC_FAST_FINISH_ROWS:
        def finish(t: pa.Table) -> pa.Table:
            tag = t.column("tag").to_numpy(zero_copy_only=False)
            key = t.column("key").to_numpy(zero_copy_only=False)
            val = t.column("val").to_numpy(zero_copy_only=False)
            sm = tag == 0
            if int(sm.sum()) != n_docs:
                raise RuntimeError(
                    "cc fast finish did not receive every self row "
                    f"({int(sm.sum())} != {n_docs}); block split?"
                )
            em = ~sm
            u_nodes, u_lab = key[sm], val[sm]
            eu, ev = key[em], val[em]
            ids = np.unique(np.concatenate([u_nodes, u_lab, eu, ev]))
            cval = ids.copy()
            upos = np.searchsorted(ids, u_nodes)
            cval[upos] = np.minimum(cval[upos], u_lab)
            lpos = np.searchsorted(ids, u_lab)
            iu = np.concatenate([np.searchsorted(ids, eu), upos, lpos])
            iv = np.concatenate([np.searchsorted(ids, ev), lpos, upos])
            cval = _local_closure(ids, cval, iu, iv)
            order = np.argsort(u_nodes, kind="stable")
            return pa.table(
                {"doc_id": pa.array(u_nodes[order]),
                 "comp": pa.array(cval[upos][order])}
            )

        _CC_LAST_ROUNDS = 1
        out_t = (
            labels.map_batches(
                lambda t: self_stream(t, reset_old0=True),
                batch_format="pyarrow",
            )
            .union(edge_msgs)
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow", batch_size=None)
        )
        t = pa.Table.from_pandas(out_t.to_pandas(), preserve_index=False)
        out = pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "comp": pc.cast(t.column("comp"), pa.int64())}
        )
        return out.take(
            pc.sort_indices(out, sort_keys=[("doc_id", "ascending")])
        )

    guard_dirs: list[str] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        gd1 = _new_guard_dir(f"cc_scatter{rounds}")
        gd2 = _new_guard_dir(f"cc_gather{rounds}")
        gd3 = _new_guard_dir(f"cc_jump{rounds}")

        def scatter(t: pa.Table, _gd=gd1) -> pa.Table:
            if t.num_rows == 0:
                return msg_schema.empty_table()
            _guard_record(
                _gd, "cc_scatter",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            key, tag, val, aux, starts, lens = _grouped(t)
            # block-local transitive closure over every id this block
            # sees (edge endpoints + sources' labels): offer each id
            # its CLOSED minimum, so only cross-partition chains
            # remain for the global rounds
            sm = tag == 0
            em = tag == 1
            u_nodes, u_lab = key[sm], val[sm]
            eu, ev = key[em], val[em]
            ids = np.unique(np.concatenate([u_nodes, u_lab, eu, ev]))
            cval = ids.copy()
            upos = np.searchsorted(ids, u_nodes)
            cval[upos] = np.minimum(cval[upos], u_lab)
            # (node, label) pairs are union EDGES too (star-contraction
            # hook): if a label id also lives in this block, the two
            # local component fragments merge here instead of waiting
            # a global round
            lpos = np.searchsorted(ids, u_lab)
            iu = np.concatenate(
                [np.searchsorted(ids, eu), upos, lpos]
            )
            iv = np.concatenate(
                [np.searchsorted(ids, ev), lpos, upos]
            )
            cval = _local_closure(ids, cval, iu, iv)
            z = np.zeros(len(ids), np.int64)
            offers = {"key": ids, "tag": z + 1, "val": cval, "aux": z}
            selfs = {
                "key": key[starts], "tag": np.zeros(len(starts), np.int64),
                "val": val[starts], "aux": aux[starts],
            }
            out = {
                k: np.concatenate([selfs[k], offers[k]])
                for k in ("key", "tag", "val", "aux")
            }
            return pa.table(
                {**{k: pa.array(v) for k, v in out.items()},
                 "_p": _stamp(out["key"])},
                schema=msg_schema,
            )

        def gather(t: pa.Table, _gd=gd2) -> pa.Table:
            if t.num_rows == 0:
                return lab_schema.empty_table()
            _guard_record(
                _gd, "cc_gather",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            key, tag, val, aux, starts, lens = _grouped(t)
            new_lab = np.minimum.reduceat(val, starts)
            z = np.zeros(len(starts), np.int64)
            return pa.table(
                {"node": pa.array(key[starts]), "lab": pa.array(new_lab),
                 "old0": pa.array(aux[starts]), "chg": pa.array(z)},
                schema=lab_schema,
            )

        l1 = (
            labels.map_batches(
                lambda t: self_stream(t, reset_old0=True),
                batch_format="pyarrow",
            )
            .union(edge_msgs)
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(scatter, batch_format="pyarrow", batch_size=None)
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(gather, batch_format="pyarrow", batch_size=None)
            .materialize()
        )

        def req_stream(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False)
            lab = t.column("lab").to_numpy(zero_copy_only=False)
            old0 = t.column("old0").to_numpy(zero_copy_only=False)
            z = np.zeros(len(node), np.int64)
            return pa.table(
                {"key": pa.array(lab), "tag": pa.array(z + 1),
                 "val": pa.array(node), "aux": pa.array(old0),
                 "_p": _stamp(lab)},
                schema=msg_schema,
            )

        def jump(t: pa.Table, _gd=gd3) -> pa.Table:
            if t.num_rows == 0:
                return lab_schema.empty_table()
            _guard_record(
                _gd, "cc_jump",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            key, tag, val, aux, starts, lens = _grouped(t)
            la_row = np.repeat(val[starts], lens)
            rm = tag == 1  # request rows: d = val, old0 = aux
            node = val[rm]
            lab2 = la_row[rm]
            old0 = aux[rm]
            return pa.table(
                {"node": pa.array(node), "lab": pa.array(lab2),
                 "old0": pa.array(old0),
                 "chg": pa.array((lab2 != old0).astype(np.int64))},
                schema=lab_schema,
            )

        labels = (
            l1.map_batches(
                lambda t: self_stream(t, reset_old0=False),
                batch_format="pyarrow",
            )
            .union(l1.map_batches(req_stream, batch_format="pyarrow"))
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(jump, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        changed = int(labels.sum("chg"))
        guard_dirs.extend((gd1, gd2, gd3))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"doc_connected_components did not converge in "
            f"{max_rounds} rounds"
        )
    # round-count telemetry (each round = 3 exchanges): tests assert
    # the local-closure relax keeps this small
    _CC_LAST_ROUNDS = rounds

    t = pa.Table.from_pandas(labels.to_pandas(), preserve_index=False)
    out = pa.table(
        {"doc_id": pc.cast(t.column("node"), pa.int64()),
         "comp": pc.cast(t.column("lab"), pa.int64())}
    )
    for gdx in guard_dirs:
        out = _finalize_guard(gdx, out)
    return out.take(
        pc.sort_indices(out, sort_keys=[("doc_id", "ascending")])
    )


# ---------------------------------------------------------------------------
# Weighted shortest path (bounded Bellman-Ford relaxation)
# ---------------------------------------------------------------------------
def doc_shortest_path(sf_dir: str, hops: int = 3) -> pa.Table:
    """Weighted single-source-set shortest path, the Bellman-Ford
    sibling of ``doc_bfs_levels``: same deterministic 3-out-degree
    link graph and seed set (``doc_id < 3`` at distance 0), but each
    edge ``u -> v`` carries integer weight ``1 + (u + 2*v) % 7`` and
    every round relaxes ``dist(v) = min(dist(v), dist(u) + w(u,v))``.
    After ``hops`` rounds the result is exactly the cheapest path
    using at most ``hops`` edges (the bounded-relaxation semantic a
    k-unrolled SQL oracle states verbatim); unreached nodes report
    ``-1``.

    Scale shape: identical to ``doc_bfs_levels`` -- per round one
    ``map_batches`` (3 weighted offers + a keep-self row per node),
    one explicit-boundary exchange on the destination hash, one
    per-block segment-min sweep; rounds chain as one lazy streaming
    pipeline and state never lands on the driver."""
    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    P = _exchange_width(n_docs * 4)
    INF = np.int64(1 << 40)

    dist_schema = pa.schema([("doc_id", pa.int64()), ("dist", pa.int64())])
    offer_schema = pa.schema(
        [("dst", pa.int64()), ("offer", pa.int64()), ("_p", pa.int64())]
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "dist": pa.array(
                    np.where(
                        pc.cast(t.column("doc_id"), pa.int64())
                        .to_numpy(zero_copy_only=False) < 3,
                        np.int64(0), INF,
                    )
                ),
            },
            schema=dist_schema,
        ),
        batch_format="pyarrow",
    )

    guards = []
    for it in range(hops):
        gd = _new_guard_dir(f"sssp{it}")
        guards.append(gd)

        def offers(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return offer_schema.empty_table()
            d_ = t.column("doc_id").to_numpy(zero_copy_only=False)
            dist = t.column("dist").to_numpy(zero_copy_only=False)
            dsts = [(7 * d_ + 1) % n_docs, (13 * d_ + 5) % n_docs,
                    (31 * d_ + 11) % n_docs]
            outs = [np.minimum(dist + 1 + (d_ + 2 * dv) % 7, INF)
                    for dv in dsts]
            dst = np.concatenate(dsts + [d_])
            offer = np.concatenate(outs + [dist])
            return pa.table(
                {"dst": pa.array(dst), "offer": pa.array(offer),
                 "_p": pa.array(partition_ids(pa.array(dst), P))},
                schema=offer_schema,
            )

        def gather(t: pa.Table, _gd=gd, _it=it) -> pa.Table:
            if t.num_rows == 0:
                return dist_schema.empty_table()
            _guard_record(
                _gd, f"sssp{_it}",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            offer = t.column("offer").to_numpy(zero_copy_only=False)
            order = np.argsort(dst, kind="stable")
            dst, offer = dst[order], offer[order]
            starts = np.flatnonzero(
                np.concatenate([[True], dst[1:] != dst[:-1]])
            )
            return pa.table(
                {"doc_id": pa.array(dst[starts]),
                 "dist": pa.array(np.minimum.reduceat(offer, starts))},
                schema=dist_schema,
            )

        ds = (
            ds.map_batches(offers, batch_format="pyarrow")
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(gather, batch_format="pyarrow", batch_size=None)
        )

    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    t = t.cast(dist_schema)
    for gd in guards:
        t = _finalize_guard(gd, t)
    dist = t.column("dist").to_numpy(zero_copy_only=False)
    t = t.set_column(
        1, "dist", pa.array(np.where(dist >= INF, np.int64(-1), dist))
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# ---------------------------------------------------------------------------
# k-core decomposition (bounded-round iterative peel)
# ---------------------------------------------------------------------------
#: (multiplier, offset, min src%5) per generated edge family; the last
#: four are the dense ring chords (src % 10 == 0 -> src + 10..40) that
#: keep a nontrivial core alive after the sparse periphery peels.
_KCORE_EDGE_FAMILIES = ((7, 1, 0), (13, 5, 1), (31, 11, 2),
                        (17, 3, 3), (23, 9, 4))


def _kcore_edges(d: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Out-edges generated locally from node ids ``d``: variable
    out-degree 1..5 (family i active when ``w % 5 >= i``) plus 4 ring
    chords for ``w % 10 == 0``; self-loops dropped.  Returns
    ``(src_idx, dst)`` with src_idx indexing into ``d`` so the caller
    can gather per-source state (act) with one vectorized take."""
    all_idx = np.arange(len(d), dtype=np.int64)
    idxs, dsts = [], []
    for mul, off, lvl in _KCORE_EDGE_FAMILIES:
        m = (d % 5) >= lvl
        idxs.append(all_idx[m])
        dsts.append((mul * d[m] + off) % n)
    ring_m = d % 10 == 0
    for step in (10, 20, 30, 40):
        idxs.append(all_idx[ring_m])
        dsts.append((d[ring_m] + step) % n)
    src_idx = np.concatenate(idxs)
    u = np.concatenate(dsts)
    keep = d[src_idx] != u
    return src_idx[keep], u[keep]


def doc_kcore(sf_dir: str, k: int = 6, rounds: int = 5) -> pa.Table:
    """Bounded-round k-core peel over a deterministic variable-degree
    multigraph on the documents (undirected degree = in + out edge
    instances, self-loops removed, parallel edges counted): each round
    drops every still-active node whose degree AMONG ACTIVE nodes is
    below ``k``; after ``rounds`` rounds (>= the fixpoint depth on
    the driver tables, asserted by the oracle equality) the survivors
    are the k-core.  This is the iterative peel family (k-core /
    degeneracy ordering) -- propagation ops (BFS/SSSP/CC/PageRank)
    push values OUT along edges, a peel needs each node to learn the
    CURRENT state of both endpoints of every incident edge.

    Scale shape, per round: node states emit locally-generatable edge
    rows (the in-contribution ``act(w)`` rides along, the
    out-contribution is a query for ``act(u)``), exchange 1 keyed by
    the out-neighbor resolves queries against its state row and
    pre-sums in-contributions, exchange 2 keyed by the asker gathers
    both contribution streams and applies ``act AND deg >= k``.  Two
    explicit-boundary exchanges of O(edges) rows per round, one
    vectorized sweep each, state never on the driver."""
    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    P = _exchange_width(n_docs * 18)

    st_schema = pa.schema([("doc_id", pa.int64()), ("act", pa.int64())])
    # kind 0 = state row (key=node, c=act); kind 1 = edge row
    # (key=u, other=w, c=act_w); kind 2 = degree contribution
    # (key=node, c=count)
    msg_schema = pa.schema(
        [("key", pa.int64()), ("other", pa.int64()), ("c", pa.int64()),
         ("kind", pa.int64()), ("_p", pa.int64())]
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "act": pa.array(
                 np.ones(t.num_rows, dtype=np.int64))},
            schema=st_schema,
        ),
        batch_format="pyarrow",
    )

    guards = []
    for it in range(rounds):
        gd_a = _new_guard_dir(f"kcore{it}a")
        gd_b = _new_guard_dir(f"kcore{it}b")
        guards += [gd_a, gd_b]

        def emit(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return msg_schema.empty_table()
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            act = t.column("act").to_numpy(zero_copy_only=False)
            src_idx, u = _kcore_edges(d, n_docs)
            w = d[src_idx]
            act_w = act[src_idx]
            key = np.concatenate([d, u])
            other = np.concatenate([np.full(len(d), -1, dtype=np.int64), w])
            c = np.concatenate([act, act_w])
            kind = np.concatenate(
                [np.zeros(len(d), dtype=np.int64),
                 np.ones(len(u), dtype=np.int64)]
            )
            return pa.table(
                {"key": pa.array(key), "other": pa.array(other),
                 "c": pa.array(c), "kind": pa.array(kind),
                 "_p": pa.array(partition_ids(pa.array(key), P))},
                schema=msg_schema,
            )

        def resolve(t: pa.Table, _gd=gd_a, _it=it) -> pa.Table:
            if t.num_rows == 0:
                return msg_schema.empty_table()
            _guard_record(
                _gd, f"kca{_it}",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            key = t.column("key").to_numpy(zero_copy_only=False)
            other = t.column("other").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            kind = t.column("kind").to_numpy(zero_copy_only=False)
            order = np.lexsort((kind, key))  # state row first per key
            key, other, c, kind = (key[order], other[order], c[order],
                                   kind[order])
            starts, lens = _segment_starts(key)
            if not (kind[starts] == 0).all():
                raise RuntimeError("kcore: key missing its state row")
            seg_id = np.repeat(np.arange(len(starts)), lens)
            act_u = c[starts][seg_id]  # state act broadcast to rows
            edge = kind == 1
            # in-contribution partial per key: sum of act_w over edges
            deg_in = np.zeros(len(starts), dtype=np.int64)
            np.add.at(deg_in, seg_id[edge], c[edge])
            out_key = np.concatenate(
                [key[starts], key[starts], other[edge]]
            )
            out_c = np.concatenate([c[starts], deg_in, act_u[edge]])
            out_kind = np.concatenate(
                [np.zeros(len(starts), dtype=np.int64),
                 np.full(len(starts), 2, dtype=np.int64),
                 np.full(int(edge.sum()), 2, dtype=np.int64)]
            )
            return pa.table(
                {"key": pa.array(out_key),
                 "other": pa.array(np.full(len(out_key), -1, dtype=np.int64)),
                 "c": pa.array(out_c), "kind": pa.array(out_kind),
                 "_p": pa.array(partition_ids(pa.array(out_key), P))},
                schema=msg_schema,
            )

        def gather(t: pa.Table, _gd=gd_b, _it=it, _k=k) -> pa.Table:
            if t.num_rows == 0:
                return st_schema.empty_table()
            _guard_record(
                _gd, f"kcb{_it}",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            key = t.column("key").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            kind = t.column("kind").to_numpy(zero_copy_only=False)
            order = np.lexsort((kind, key))
            key, c, kind = key[order], c[order], kind[order]
            starts, lens = _segment_starts(key)
            if not (kind[starts] == 0).all():
                raise RuntimeError("kcore: node missing its state row")
            seg_id = np.repeat(np.arange(len(starts)), lens)
            deg = np.zeros(len(starts), dtype=np.int64)
            contrib = kind == 2
            np.add.at(deg, seg_id[contrib], c[contrib])
            act = c[starts]
            return pa.table(
                {"doc_id": pa.array(key[starts]),
                 "act": pa.array(
                     ((act == 1) & (deg >= _k)).astype(np.int64))},
                schema=st_schema,
            )

        ds = (
            ds.map_batches(emit, batch_format="pyarrow")
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(resolve, batch_format="pyarrow", batch_size=None)
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(gather, batch_format="pyarrow", batch_size=None)
        )

    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    t = t.cast(st_schema).rename_columns(["doc_id", "in_core"])
    for gd in guards:
        t = _finalize_guard(gd, t)
    return t.take(
        pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])
    )


# ---------------------------------------------------------------------------
# BM25 query scoring (exact-rational variant)
# ---------------------------------------------------------------------------
def bm25_topdocs(
    sf_dir: str, terms: tuple[str, ...] = ("query", "join", "window"),
    k: int = 10, k1_x10: int = 12, b_x100: int = 75,
) -> pa.Table:
    """Top-``k`` documents for a fixed query under EXACT-rational
    BM25: per query term, ``idf * tf*(k1+1) / (tf + k1*(1-b +
    b*dl/avgdl))`` with the rational idf ``(N-df+1)/(df+1)`` (a
    log idf is not correctly rounded across engines; the rational
    form preserves BM25's rare-term boost exactly).  ``k1 = k1_x10 /
    10`` and ``b = b_x100/100``; clearing denominators makes every
    term contribution a ratio of integers, emitted as
    ``floor(1e6 * contribution)`` and summed per doc -- bit-equal on
    any engine.  Returns ``(doc_id, bm25_e6)``, score desc / doc_id
    asc.

    Distributed shape: ONE tokenize pass per block emits (a)
    candidate rows ``(doc_id, dl, tf_0..tf_q)`` for docs matching any
    term -- a combiner, candidates are df-bounded -- and (b) one
    per-block scalar partial ``(n_docs, total_tokens, df_0..df_q)``.
    The driver folds P partials into scalars (N, L, df) and
    broadcasts them; a second map_batches over the CANDIDATES scores
    with arbitrary-precision ints (exact at any corpus size where
    int64 would overflow) and emits its local top-k; the driver
    merges P*k rows.  Documents are tokenized once; raw docs never
    shuffle."""
    q = len(terms)
    out_schema = pa.schema([("doc_id", pa.int64()), ("bm25_e6", pa.int64())])
    cand_schema = pa.schema(
        [("kind", pa.int8()), ("doc_id", pa.int64()), ("dl", pa.int64())]
        + [(f"tf{j}", pa.int64()) for j in range(q)]
    )
    term_set = {t: j for j, t in enumerate(terms)}

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scan(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        total_tokens = 0
        dfs = [0] * q
        rows: list[tuple] = []
        for did, s in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            total_tokens += len(toks)
            tf = [0] * q
            hit = False
            for w in toks:
                j = term_set.get(w)
                if j is not None:
                    tf[j] += 1
                    hit = True
            if hit:
                rows.append((did, len(toks), *tf))
                for j in range(q):
                    if tf[j]:
                        dfs[j] += 1
        cols: dict[str, list] = {
            "kind": [0] * len(rows) + [1],
            "doc_id": [r[0] for r in rows] + [n_docs],
            "dl": [r[1] for r in rows] + [total_tokens],
        }
        for j in range(q):
            cols[f"tf{j}"] = [r[2 + j] for r in rows] + [dfs[j]]
        return pa.table(
            {c: pa.array(v, cand_schema.field(c).type)
             for c, v in cols.items()},
            schema=cand_schema,
        )

    both = ds.map_batches(scan, batch_format="pyarrow").materialize()

    # -- fold the per-block scalar partials on the driver -------------
    import pyarrow.compute as _pc

    scal = both.map_batches(
        lambda t: t.filter(_pc.equal(t.column("kind"), 1)),
        batch_format="pyarrow",
    ).to_pandas()
    N = int(scal["doc_id"].sum())
    L = int(scal["dl"].sum())
    df = [int(scal[f"tf{j}"].sum()) for j in range(q)]
    K1, B = int(k1_x10), int(b_x100)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(_pc.equal(t.column("kind"), 0))
        if t.num_rows == 0:
            return out_schema.empty_table()
        dids = t.column("doc_id").to_pylist()
        dls = t.column("dl").to_pylist()
        tfs = [t.column(f"tf{j}").to_pylist() for j in range(q)]
        scores = []
        for i, (did, dl) in enumerate(zip(dids, dls)):
            s = 0
            for j in range(q):
                tf = tfs[j][i]
                if tf == 0 or df[j] == 0:
                    continue
                num = 10**6 * (N - df[j] + 1) * tf * (K1 + 10) * 100 * L
                den = (df[j] + 1) * (
                    1000 * L * tf + K1 * (100 - B) * L + K1 * B * dl * N
                )
                s += num // den
            scores.append(s)
        sc = np.array(scores, dtype=np.int64)
        di = np.array(dids, dtype=np.int64)
        top = np.lexsort((di, -sc))[:k]
        return pa.table(
            {"doc_id": pa.array(di[top]), "bm25_e6": pa.array(sc[top])},
            schema=out_schema,
        )

    cand = both.map_batches(score, batch_format="pyarrow")
    merged = pa.Table.from_pandas(cand.to_pandas(), preserve_index=False)
    merged = merged.cast(out_schema)
    sc = merged.column("bm25_e6").to_numpy()
    di = merged.column("doc_id").to_numpy()
    top = np.lexsort((di, -sc))[:k]
    return merged.take(pa.array(top))


# ---------------------------------------------------------------------------
# HITS hubs & authorities (exact integer fixed-point)
# ---------------------------------------------------------------------------
def doc_hits(sf_dir: str, iters: int = 2) -> pa.Table:
    """HITS hubs-and-authorities over the same deterministic doc-link
    graph as ``doc_pagerank`` (``d -> (7d+1, 13d+5, 31d+11) mod N``,
    multi-edges kept), with EXACT integer scores the SQL oracle
    reproduces bit-for-bit.  Each round: authority = gather-sum of
    hub mass along in-edges, sum-normalize to scale 1e12; hub =
    gather-sum of authority mass along out-edges, sum-normalize.
    Sum-normalization (not L2) keeps everything rational; the
    normalize ``floor(x * 1e12 / s)`` is computed int64-safely as
    ``q*1e6 + (r*1e6)//s`` with ``q, r = divmod(x*1e6, s)`` -- exact
    (``x*1e12`` itself would overflow int64; DuckDB uses HUGEINT).

    Scale shape per round: (1) hub scatter along forward edges (3
    share rows + a zero self-row per doc so sinks stay present), one
    dst-hash exchange, segment-sum; a driver SCALAR (the sum) is the
    only thing leaving the cluster; (2) hub gather needs in-edges,
    which are not derivable from the target id, so edges join the
    authority table in one v-hash exchange and the ``(u, a_v)`` rows
    fold in one u-hash exchange.  Returns ``(doc_id, auth, hub)``."""
    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    SCALE = _PR_SCALE
    HALF = 10**6  # SCALE = HALF * HALF, the int64-safe split
    P = _exchange_width(n_docs * 4)
    s0 = SCALE // n_docs

    score_schema = pa.schema([("doc_id", pa.int64()), ("r", pa.int64())])
    share_schema = pa.schema(
        [("dst", pa.int64()), ("share", pa.int64()), ("_p", pa.int64())]
    )

    def _out_edges(d: np.ndarray) -> np.ndarray:
        return np.concatenate(
            [(7 * d + 1) % n_docs, (13 * d + 5) % n_docs,
             (31 * d + 11) % n_docs]
        )

    def _normalized(ds_raw, s: int):
        def norm(t: pa.Table) -> pa.Table:
            x = t.column("r").to_numpy(zero_copy_only=False)
            y = x * HALF
            qq, rr = y // s, y % s
            return pa.table(
                {"doc_id": t.column("doc_id"),
                 "r": pa.array(qq * HALF + (rr * HALF) // s)},
                schema=score_schema,
            )

        return ds_raw.map_batches(norm, batch_format="pyarrow")

    guards = []

    def _gather(shares_ds, tag: str):
        gd = _new_guard_dir(f"hits_{tag}")
        guards.append(gd)

        def gather(t: pa.Table, _gd=gd, _tag=tag) -> pa.Table:
            if t.num_rows == 0:
                return score_schema.empty_table()
            _guard_record(
                _gd, _tag, t.column("_p").to_numpy(zero_copy_only=False)
            )
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            share = t.column("share").to_numpy(zero_copy_only=False)
            order = np.argsort(dst, kind="stable")
            dst, share = dst[order], share[order]
            starts = np.flatnonzero(
                np.concatenate([[True], dst[1:] != dst[:-1]])
            )
            return pa.table(
                {"doc_id": pa.array(dst[starts]),
                 "r": pa.array(np.add.reduceat(share, starts))},
                schema=score_schema,
            )

        return (
            shares_ds.sort("_p", boundaries=list(range(1, P)))
            .map_batches(gather, batch_format="pyarrow", batch_size=None)
            .materialize()
        )

    hub = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "r": pa.array(np.full(t.num_rows, s0, np.int64))},
            schema=score_schema,
        ),
        batch_format="pyarrow",
    ).materialize()
    auth = None

    for it in range(iters):
        # -- authority: scatter hub mass along forward edges --------
        def h_shares(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return share_schema.empty_table()
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            r = t.column("r").to_numpy(zero_copy_only=False)
            dst = np.concatenate([_out_edges(d), d])
            share = np.concatenate([r, r, r, np.zeros(len(d), np.int64)])
            return pa.table(
                {"dst": pa.array(dst), "share": pa.array(share),
                 "_p": pa.array(partition_ids(pa.array(dst), P))},
                schema=share_schema,
            )

        a_raw = _gather(hub.map_batches(h_shares, batch_format="pyarrow"),
                        f"a{it}")
        s_a = int(a_raw.sum("r"))
        auth = _normalized(a_raw, s_a).materialize()

        # -- hub: edges join the authority table on v, fold on u ----
        # join rows: side 0 = authority score at v, side 1 = edge
        # (v <- u); both exchange on v's hash
        j_schema = pa.schema(
            [("_v", pa.int64()), ("_side", pa.int8()), ("_u", pa.int64()),
             ("_r", pa.int64()), ("_p", pa.int64())]
        )

        def a_rows(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return j_schema.empty_table()
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            r = t.column("r").to_numpy(zero_copy_only=False)
            return pa.table(
                {"_v": pa.array(d),
                 "_side": pa.array(np.zeros(len(d), np.int8)),
                 "_u": pa.array(np.zeros(len(d), np.int64)),
                 "_r": pa.array(r),
                 "_p": pa.array(partition_ids(pa.array(d), P))},
                schema=j_schema,
            )

        def edge_rows(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return j_schema.empty_table()
            d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            v = _out_edges(d)
            u = np.concatenate([d, d, d])
            # zero self-rows keep every u present in the hub fold
            v = np.concatenate([v, d])
            u = np.concatenate([u, d])
            side = np.concatenate(
                [np.ones(3 * len(d), np.int8), np.full(len(d), 2, np.int8)]
            )
            return pa.table(
                {"_v": pa.array(v), "_side": pa.array(side),
                 "_u": pa.array(u),
                 "_r": pa.array(np.zeros(len(v), np.int64)),
                 "_p": pa.array(partition_ids(pa.array(v), P))},
                schema=j_schema,
            )

        gdj = _new_guard_dir(f"hits_j{it}")
        guards.append(gdj)

        def edge_join(t: pa.Table, _gd=gdj, _it=it) -> pa.Table:
            if t.num_rows == 0:
                return share_schema.empty_table()
            _guard_record(
                _gd, f"hj{_it}",
                t.column("_p").to_numpy(zero_copy_only=False),
            )
            v = t.column("_v").to_numpy(zero_copy_only=False)
            side = t.column("_side").to_numpy(zero_copy_only=False)
            u = t.column("_u").to_numpy(zero_copy_only=False)
            r = t.column("_r").to_numpy(zero_copy_only=False)
            is_a = side == 0
            bk, br = v[is_a], r[is_a]
            bo = np.argsort(bk, kind="stable")
            bk, br = bk[bo], br[bo]
            is_e = side == 1
            pk, pu = v[is_e], u[is_e]
            pos = np.searchsorted(bk, pk)
            hit = (pos < len(bk)) & (bk[np.clip(pos, 0, len(bk) - 1)] == pk)
            dst = np.concatenate([pu[hit], u[side == 2]])
            share = np.concatenate(
                [br[pos[hit]], np.zeros(int((side == 2).sum()), np.int64)]
            )
            return pa.table(
                {"dst": pa.array(dst), "share": pa.array(share),
                 "_p": pa.array(partition_ids(pa.array(dst), P))},
                schema=share_schema,
            )

        docs_ds = _read(sf_dir, "documents", columns=["doc_id"])
        h_raw = _gather(
            auth.map_batches(a_rows, batch_format="pyarrow")
            .union(docs_ds.map_batches(edge_rows, batch_format="pyarrow"))
            .sort("_p", boundaries=list(range(1, P)))
            .map_batches(edge_join, batch_format="pyarrow",
                         batch_size=None),
            f"h{it}",
        )
        s_h = int(h_raw.sum("r"))
        hub = _normalized(h_raw, s_h).materialize()

    adf = auth.to_pandas().rename(columns={"r": "auth"})
    hdf = hub.to_pandas().rename(columns={"r": "hub"})
    m = adf.merge(hdf, on="doc_id").sort_values("doc_id",
                                                ignore_index=True)
    out = pa.table(
        {"doc_id": pa.array(m["doc_id"].to_numpy(dtype=np.int64)),
         "auth": pa.array(m["auth"].to_numpy(dtype=np.int64)),
         "hub": pa.array(m["hub"].to_numpy(dtype=np.int64))}
    )
    for gd in guards:
        out = _finalize_guard(gd, out)
    return out


# ---------------------------------------------------------------------------
# PCA dominant direction: exact integer power iteration
# ---------------------------------------------------------------------------
def embedding_pca_power(sf_dir: str, iters: int = 3) -> pa.Table:
    """Dominant principal direction of the embedding cloud via EXACT
    integer power iteration -- the distributed-PCA building block
    (whitening, spectral outlier screens) with a bit-reproducible
    answer.  Embeddings quantize to ``q = floor(1e3 * x)`` (float64
    multiply then floor: identical on every engine); the centered
    scatter matrix is the integer ``C = N * sum(q q^T) - (sum q)(sum
    q)^T`` (N^2-scaled covariance, no float mean); ``iters`` rounds
    of ``v <- C v`` renormalize to scale 1e6 by the max-|component|
    with EXPLICIT sign/abs (``sign(w) * (|w| * 1e6 // max|w|)``) --
    floor-vs-truncate division of negatives differs between Python
    and SQL engines, sign/abs does not.  Returns ``(i, v)``, the
    64-dim direction.

    Scale shape: ONE map_batches pass emits per-block moment partials
    (the 64 sums + the 64x64 Gram) as a single packed-bytes row --
    an int64 numpy matmul per block, additive across blocks; the
    driver folds P blobs and runs the O(dim^2) iteration in
    arbitrary-precision ints.  Row data never shuffles; nothing
    driver-side scales with N."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    dim_holder: list[int] = []

    def moments(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if t.num_rows == 0:
            return pa.table({"blob": pa.array([], pa.binary()),
                             "n": pa.array([], pa.int64())})
        lst = col.cast(pa.list_(pa.float64()))
        dim = len(lst[0])
        flat = np.asarray(lst.values.to_numpy(zero_copy_only=False))
        q = np.floor(flat * 1000.0).astype(np.int64).reshape(-1, dim)
        s1 = q.sum(axis=0)
        s2 = q.T @ q  # int64 matmul: exact
        blob = s1.tobytes() + s2.tobytes()
        return pa.table({"blob": pa.array([blob], pa.binary()),
                         "n": pa.array([q.shape[0]], pa.int64())})

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n_total = int(parts["n"].sum())
    first = np.frombuffer(parts["blob"].iloc[0], np.int64)
    # dim from blob layout: dim + dim^2 int64s
    dim = int((np.sqrt(4 * len(first) + 1) - 1) / 2)
    s1 = np.zeros(dim, object)
    s2 = np.zeros((dim, dim), object)
    for blob in parts["blob"]:
        arr = np.frombuffer(blob, np.int64)
        s1 += arr[:dim].astype(object)
        s2 += arr[dim:].reshape(dim, dim).astype(object)

    C = [[int(n_total) * int(s2[i][j]) - int(s1[i]) * int(s1[j])
          for j in range(dim)] for i in range(dim)]
    SC = 10**6
    v = [SC] * dim
    for _ in range(iters):
        w = [sum(C[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [(1 if x >= 0 else -1) * (abs(x) * SC // m) for x in w]
    return pa.table(
        {"i": pa.array(range(dim), pa.int64()),
         "v": pa.array(v, pa.int64())}
    )


# ---------------------------------------------------------------------------
# Word co-occurrence lift (PMI without the log) top-k
# ---------------------------------------------------------------------------
def word_pmi_topk(sf_dir: str, min_df: int = 50, k: int = 30) -> pa.Table:
    """Top-``k`` co-occurring word pairs by EXACT lift -- ``lift =
    P(a,b) / (P(a) P(b)) = c_ab * N / (df_a * df_b)`` over document-
    level sets (PMI is ``log lift``; the log is monotone, so ranking
    by the rational lift ranks by PMI with zero float error) --
    emitted as ``floor(1e6 * lift)``.  Only words with ``df >=
    min_df`` participate (rare-word pairs have degenerate lift).
    Returns ``(term_a, term_b, n_common, df_a, df_b, lift_e6)``.

    Distributed shape: pass 1 folds per-block (term -> doc count)
    partials into the df table (dim-bounded), filters to the vocab,
    and broadcasts it once via ``ray.put``; pass 2 re-tokenizes each
    doc, intersects with the vocab, and emits per-block COMBINED
    pair-count partials (np.unique on packed id pairs -- a doc's
    pairs fold inside the block); one pair ``groupby.sum`` then
    per-block local top-k caps what the driver merges at P*k."""
    import ray

    out_schema = pa.schema(
        [("term_a", pa.string()), ("term_b", pa.string()),
         ("n_common", pa.int64()), ("df_a", pa.int64()),
         ("df_b", pa.int64()), ("lift_e6", pa.int64())]
    )
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs, _ = _table_meta(sf_dir, "documents")

    df_schema = pa.schema([("term", pa.string()), ("nd", pa.int64())])

    def df_partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t.column("text").to_pylist():
            for w in set(_WORD.findall((s or "").lower())):
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {"term": pa.array(list(counts.keys()), pa.string()),
             "nd": pa.array(list(counts.values()), pa.int64())},
            schema=df_schema,
        )

    df = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term").sum("nd").to_pandas()
    )
    df.columns = ["term", "nd"]
    df = df[df["nd"] >= min_df].sort_values("term", ignore_index=True)
    terms = df["term"].tolist()
    dfs = df["nd"].to_numpy(dtype=np.int64)
    vocab = {t: i for i, t in enumerate(terms)}
    M = len(terms)
    vocab_ref = ray.put(vocab)

    pair_schema = pa.schema([("key", pa.int64()), ("c", pa.int64())])

    def pair_partial(t: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        keys: list[int] = []
        for s in t.column("text").to_pylist():
            ids = sorted(
                {v[w] for w in set(_WORD.findall((s or "").lower()))
                 if w in v}
            )
            m = len(ids)
            for i in range(m - 1):
                base = ids[i] * M
                for j in range(i + 1, m):
                    keys.append(base + ids[j])
        if not keys:
            return pair_schema.empty_table()
        arr = np.asarray(keys, np.int64)
        uk, uc = np.unique(arr, return_counts=True)
        return pa.table(
            {"key": pa.array(uk), "c": pa.array(uc.astype(np.int64))},
            schema=pair_schema,
        )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        key = t.column("key").to_numpy(zero_copy_only=False)
        c = t.column("sum(c)").to_numpy(zero_copy_only=False)
        a, b = key // M, key % M
        lift = np.array(
            [10**6 * int(cc) * n_docs // (int(dfs[i]) * int(dfs[j]))
             for cc, i, j in zip(c, a, b)], np.int64)
        ta = np.asarray([terms[i] for i in a], dtype=object)
        tb = np.asarray([terms[j] for j in b], dtype=object)
        top = np.lexsort((tb, ta, -lift))[:k]
        return pa.table(
            {"term_a": pa.array(list(ta[top]), pa.string()),
             "term_b": pa.array(list(tb[top]), pa.string()),
             "n_common": pa.array(c[top]),
             "df_a": pa.array(dfs[a[top]]),
             "df_b": pa.array(dfs[b[top]]),
             "lift_e6": pa.array(lift[top])},
            schema=out_schema,
        )

    cand = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("key").sum("c")
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    merged = pa.Table.from_pandas(cand, preserve_index=False).cast(out_schema)
    lift = merged.column("lift_e6").to_numpy()
    ta = merged.column("term_a").to_numpy(zero_copy_only=False)
    tb = merged.column("term_b").to_numpy(zero_copy_only=False)
    top = np.lexsort((tb, ta, -lift))[:k]
    return merged.take(pa.array(top))


# ---------------------------------------------------------------------------
# Lexical diversity: type-token ratio + hapax rate per doc
# ---------------------------------------------------------------------------
def doc_lexical_diversity(sf_dir: str) -> pa.Table:
    """Lexical-diversity quality metrics per document -- the
    curation filters that catch boilerplate and keyword stuffing:
    token count, distinct-type count, hapax count (words occurring
    exactly once IN the doc), exact ``ttr_e6 = floor(1e6 *
    n_types / n_tokens)`` and ``hapax_e6 = floor(1e6 * n_hapax /
    n_types)`` (0 for empty docs).  Returns ``(doc_id, n_tokens,
    n_types, n_hapax, ttr_e6, hapax_e6)``.

    Scale shape: embarrassingly parallel -- one tokenize pass, all
    metrics per-doc; no shuffle at all (the same
    tokenize-once-per-row call measured for ``lang_id``)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("n_types", pa.int64()), ("n_hapax", pa.int64()),
         ("ttr_e6", pa.int64()), ("hapax_e6", pa.int64())]
    )

    def metrics(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        dids = t.column("doc_id").to_pylist()
        rows = []
        for did, s in zip(dids, t.column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            n = len(toks)
            if n == 0:
                rows.append((did, 0, 0, 0, 0, 0))
                continue
            counts: dict[str, int] = {}
            for w in toks:
                counts[w] = counts.get(w, 0) + 1
            ty = len(counts)
            hap = sum(1 for v in counts.values() if v == 1)
            rows.append((did, n, ty, hap,
                         10**6 * ty // n, 10**6 * hap // ty))
        return pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
             "n_types": pa.array([r[2] for r in rows], pa.int64()),
             "n_hapax": pa.array([r[3] for r in rows], pa.int64()),
             "ttr_e6": pa.array([r[4] for r in rows], pa.int64()),
             "hapax_e6": pa.array([r[5] for r in rows], pa.int64())},
            schema=out_schema,
        )

    res = ds.map_batches(metrics, batch_format="pyarrow").to_pandas()
    res = res.sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(res, preserve_index=False).cast(out_schema)


# ---------------------------------------------------------------------------
# N-gram novelty: what fraction of a doc's shingles is first-seen?
# ---------------------------------------------------------------------------
def doc_ngram_novelty(sf_dir: str, n: int = 3) -> pa.Table:
    """Corpus-order novelty per document: the fraction of its
    DISTINCT word ``n``-grams whose FIRST appearance (by ascending
    ``doc_id``) is this document -- the dedup-adjacent curation
    metric that scores incremental crawls ("how much of this doc is
    new text?").  Returns ``(doc_id, n_grams, n_novel,
    novelty_e6)``; docs shorter than ``n`` words emit 0/0/0.

    Scale shape: one tokenize pass emits per-doc DISTINCT gram rows;
    a gram-level ``groupby.min`` finds each gram's first owner and a
    doc-level count of owned grams gives novel counts, while a
    doc-level count of the gram rows gives totals -- both exchanges
    bounded by distinct grams, never raw token count; the final
    merge is output-sized (one row per doc)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    gram_schema = pa.schema(
        [("gram", pa.string()), ("doc_id", pa.int64())]
    )

    def doc_grams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return gram_schema.empty_table()
        gs, dids = [], []
        for did, s in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            grams = {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
            gs.extend(grams)
            dids.extend([did] * len(grams))
        return pa.table(
            {"gram": pa.array(gs, pa.string()),
             "doc_id": pa.array(dids, pa.int64())},
            schema=gram_schema,
        )

    grams = ds.map_batches(doc_grams, batch_format="pyarrow").materialize()

    totals = grams.groupby("doc_id").count().to_pandas()
    totals = _named_agg(totals, ["doc_id", "n_grams"])

    owners = grams.groupby("gram").min("doc_id")

    def owner_count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_novel", pa.int64())]
            ).empty_table()
        d = t.column("min(doc_id)").to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        ds_ = d[order]
        starts, lens = _segment_starts(ds_)
        return pa.table(
            {"doc_id": pa.array(ds_[starts]),
             "n_novel": pa.array(lens.astype(np.int64))}
        )

    novel = (
        owners.map_batches(owner_count, batch_format="pyarrow")
        .groupby("doc_id").sum("n_novel").to_pandas()
    )
    novel = _named_agg(novel, ["doc_id", "n_novel"])

    docs = _read_dim(sf_dir, "documents", columns=["doc_id"])
    m = docs.merge(totals, on="doc_id", how="left") \
        .merge(novel, on="doc_id", how="left").fillna(0)
    m = m.sort_values("doc_id", ignore_index=True)
    ng = m["n_grams"].to_numpy(dtype=np.int64)
    nv = m["n_novel"].to_numpy(dtype=np.int64)
    nov = np.array(
        [10**6 * int(b) // int(a) if a else 0 for a, b in zip(ng, nv)],
        np.int64)
    return pa.table(
        {"doc_id": pa.array(m["doc_id"].to_numpy(dtype=np.int64)),
         "n_grams": pa.array(ng),
         "n_novel": pa.array(nv),
         "novelty_e6": pa.array(nov)}
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split + inverse-size source weights
# ---------------------------------------------------------------------------
def corpus_split_assign(sf_dir: str) -> pa.Table:
    """Deterministic dataset splitting: every document lands in
    train/val/test by ``fnv1a(decimal_string(doc_id)) % 100`` (<80 ->
    train, <90 -> val, else test) -- reproducible across runs,
    cluster sizes and block layouts, unlike any RNG split; the same
    predicate reselects the same split in every derived pipeline.
    Returns the split-balance audit ``(split, lang, n_docs)``
    ordered by (split, lang) -- what a curation run checks before
    training.

    Scale shape: stateless vectorized hash filter per block +
    (split, lang) count partials -> dimension-sized groupby."""
    from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    part_schema = pa.schema(
        [("split", pa.string()), ("lang", pa.string()),
         ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        h = fnv1a_u64(pc.cast(t.column("doc_id"), pa.string()))
        bucket = (h % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < 80, "train",
                         np.where(bucket < 90, "val", "test"))
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        key = np.asarray([f"{s}\x00{lg}" for s, lg in zip(split, lang)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"split": pa.array(list(split[order][starts]), pa.string()),
             "lang": pa.array(list(lang[order][starts]), pa.string()),
             "n": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["split", "lang"]).sum("n").to_pandas()
    )
    agg.columns = ["split", "lang", "n_docs"]
    agg = agg.sort_values(["split", "lang"], ignore_index=True)
    return pa.table(
        {"split": pa.array(agg["split"], pa.string()),
         "lang": pa.array(agg["lang"], pa.string()),
         "n_docs": pa.array(agg["n_docs"].to_numpy(dtype=np.int64))}
    )


def corpus_source_weights(sf_dir: str) -> pa.Table:
    """Inverse-size sampling weights per source -- the mixture
    rebalancer that upweights small sources so each contributes
    equally: with ``k`` sources and ``N`` docs, ``weight_e6 =
    floor(1e6 * N / (k * n_source))`` (1e6 = source already at
    parity).  Returns ``(source, n_docs, weight_e6)`` ordered by
    source.

    Scale shape: per-block source counts -> dimension-sized groupby
    -> O(sources) exact driver math."""
    ds = _read(sf_dir, "documents", columns=["source"])

    part_schema = pa.schema([("source", pa.string()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        order, starts, counts = _group_segments(src)
        return pa.table(
            {"source": pa.array(list(src[order][starts]), pa.string()),
             "n": pa.array(counts.astype(np.int64))},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source").sum("n").to_pandas()
    )
    agg.columns = ["source", "n"]
    agg = agg.sort_values("source", ignore_index=True)
    n_total = int(agg["n"].sum())
    k = len(agg)
    w = [10**6 * n_total // (k * int(c)) for c in agg["n"]]
    return pa.table(
        {"source": pa.array(agg["source"], pa.string()),
         "n_docs": pa.array(agg["n"].to_numpy(dtype=np.int64)),
         "weight_e6": pa.array(w, pa.int64())}
    )


# ---------------------------------------------------------------------------
# Contrastive hard-negative mining
# ---------------------------------------------------------------------------
class _LabelAwareTopK:
    """CosineTopK with a label mask: only candidates whose label
    DIFFERS from the query's survive -- hard negatives for
    contrastive training (closest wrong-class items)."""

    def __init__(self, queries_ref, k: int):
        import ray

        q_ids, q, q_labels = (
            ray.get(queries_ref)
            if not isinstance(queries_ref, tuple) else queries_ref
        )
        self.q_ids = q_ids
        self.q_labels = q_labels
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.q = qn
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()),
             ("label", pa.int64()), ("sim", pa.float64())]
        )
        ids, mat = _embedding_matrix(t)
        labels = t.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        sims = self.q @ mat.T  # (Q, n)
        out_q, out_v, out_l, out_s = [], [], [], []
        for qi in range(sims.shape[0]):
            mask = labels != self.q_labels[qi]
            if not mask.any():
                continue
            s = sims[qi][mask]
            vid = ids[mask]
            lab = labels[mask]
            k = min(self.k, len(s))
            top = np.argpartition(-s, k - 1)[:k]
            out_q.append(np.full(k, self.q_ids[qi], np.int64))
            out_v.append(vid[top].astype(np.int64))
            out_l.append(lab[top])
            out_s.append(s[top])
        if not out_q:
            return out_schema.empty_table()
        return pa.table(
            {"query_id": pa.array(np.concatenate(out_q)),
             "vec_id": pa.array(np.concatenate(out_v)),
             "label": pa.array(np.concatenate(out_l)),
             "sim": pa.array(np.concatenate(out_s))},
            schema=out_schema,
        )


def hard_negative_mining(
    sf_dir: str, n_queries: int = 5, k: int = 5
) -> pa.Table:
    """Contrastive hard negatives: for each of the first
    ``n_queries`` embeddings, the ``k`` MOST-similar vectors with a
    DIFFERENT label -- the pairs that sharpen a contrastive loss the
    most.  Returns ``(query_id, vec_id, label, sim_r)`` ranked by
    (sim desc, vec_id), sim rounded to 6 dp (the ``ann_cosine_topk``
    float convention: one correctly-rounded cosine per pair).

    Scale shape: identical to ``ann_cosine_topk`` -- queries +
    their labels broadcast once via ``ray.put``, per-batch numpy
    matmul with the label mask, local top-k partials, and a P*k
    driver merge."""
    import pyarrow.parquet as _pq
    import ray

    emb = _read(sf_dir, "embeddings",
                columns=["vec_id", "embedding", "label"])
    qt = _pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", n_queries)],
    )
    q_ids = np.asarray(qt.column("vec_id").to_pylist(), np.int64)
    q_mat = np.asarray(
        [np.asarray(v, np.float64) for v in
         qt.column("embedding").to_pylist()])
    q_labels = np.asarray(qt.column("label").to_pylist(), np.int64)
    ref = ray.put((q_ids, q_mat, q_labels))

    partial = emb.map_batches(
        _cached_stage(
            ("hardneg", ref.hex(), k), lambda: _LabelAwareTopK(ref, k + 1)
        ),
        batch_format="pyarrow",
    )
    df = partial.to_pandas()
    df = df[~(df["query_id"] == df["vec_id"])]
    df["sim_r"] = np.round(df["sim"], 6)
    df = df.sort_values(
        ["query_id", "sim_r", "vec_id"], ascending=[True, False, True]
    )
    out = df.groupby("query_id", sort=True).head(k)
    out = out[["query_id", "vec_id", "label", "sim_r"]].reset_index(
        drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# Embedding norm**2 distribution (un-normalized-vector audit)
# ---------------------------------------------------------------------------
def embedding_norm2_quantiles(sf_dir: str) -> pa.Table:
    """Distribution audit of embedding magnitudes: exact order
    statistics (min, lower-median, p90, p99, max) of the QUANTIZED
    squared norm ``sum(floor(1e3*x)^2)`` per vector -- the
    preprocessing check that catches un-normalized or degenerate
    vectors before cosine math silently mis-ranks them.  Returns
    ``(q_e2, value)`` rows 0/50/90/99/100 (lower quantile = rank
    ``ceil(q * n)``).

    Scale shape: per-block (norm2 -> count) HISTOGRAM partials (one
    int64 row per distinct magnitude per block) -> value
    ``groupby.sum`` -> exact driver quantile walk; vectors never
    shuffle."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    hist_schema = pa.schema([("n2", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if t.num_rows == 0:
            return hist_schema.empty_table()
        lst = col.cast(pa.list_(pa.float64()))
        dim = len(lst[0])
        flat = np.asarray(lst.values.to_numpy(zero_copy_only=False))
        q = np.floor(flat * 1000.0).astype(np.int64).reshape(-1, dim)
        n2 = (q * q).sum(axis=1)
        order = np.argsort(n2, kind="stable")
        s = n2[order]
        starts, lens = _segment_starts(s)
        return pa.table(
            {"n2": pa.array(s[starts]),
             "n": pa.array(lens.astype(np.int64))},
            schema=hist_schema,
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n2").sum("n").to_pandas()
    )
    hist.columns = ["n2", "n"]
    hist = hist.sort_values("n2", ignore_index=True)
    vals = hist["n2"].to_numpy(dtype=np.int64)
    cnts = hist["n"].to_numpy(dtype=np.int64)
    total = int(cnts.sum())
    cum = np.cumsum(cnts)

    def q_at(rank: int) -> int:
        return int(vals[np.searchsorted(cum, rank, side="left")])

    rows = [(0, int(vals[0])),
            (50, q_at(-(-total * 50 // 100))),
            (90, q_at(-(-total * 90 // 100))),
            (99, q_at(-(-total * 99 // 100))),
            (100, int(vals[-1]))]
    return pa.table(
        {"q_e2": pa.array([r[0] for r in rows], pa.int64()),
         "value": pa.array([r[1] for r in rows], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Positional proximity search (two terms within a window)
# ---------------------------------------------------------------------------
def phrase_proximity_search(
    sf_dir: str, term_a: str = "merge", term_b: str = "sort",
    window: int = 5,
) -> pa.Table:
    """Positional-index proximity query: documents where ``term_a``
    and ``term_b`` occur within ``window`` word positions, with the
    exact minimum distance -- the IR primitive behind phrase and
    NEAR() operators that a plain inverted index (df/tf only)
    cannot answer.  Returns ``(doc_id, n_a, n_b, min_dist)`` for
    matching docs ordered by doc_id.

    Scale shape: embarrassingly parallel -- one tokenize pass; per
    doc the two sorted position lists merge in O(n_a + n_b) via
    searchsorted (never the n_a * n_b pair space).  No shuffle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64()),
         ("min_dist", pa.int64())]
    )

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        rows = []
        for did, s in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            pa_ = [i for i, w in enumerate(toks) if w == term_a]
            pb_ = [i for i, w in enumerate(toks) if w == term_b]
            if not pa_ or not pb_:
                continue
            a = np.asarray(pa_, np.int64)
            b = np.asarray(pb_, np.int64)
            # nearest b for each a via binary search on sorted b
            pos = np.searchsorted(b, a)
            best = np.int64(1 << 60)
            right = pos < len(b)
            if right.any():
                best = min(best, int((b[pos[right]] - a[right]).min()))
            left = pos > 0
            if left.any():
                best = min(best, int((a[left] - b[pos[left] - 1]).min()))
            if best <= window:
                rows.append((did, len(a), len(b), int(best)))
        if not rows:
            return out_schema.empty_table()
        return pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "n_a": pa.array([r[1] for r in rows], pa.int64()),
             "n_b": pa.array([r[2] for r in rows], pa.int64()),
             "min_dist": pa.array([r[3] for r in rows], pa.int64())},
            schema=out_schema,
        )

    res = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    if len(res) == 0:
        return out_schema.empty_table()
    res = res.sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(res, preserve_index=False).cast(out_schema)


# ---------------------------------------------------------------------------
# Duplication rate per source (curation yield report)
# ---------------------------------------------------------------------------
def dedup_rate_by_source(sf_dir: str) -> pa.Table:
    """Curation yield per source: how much of each source survives
    exact text dedup -- ``(source, n_docs, n_unique_texts,
    dup_rate_e6)`` with ``dup_rate = 1 - unique/docs`` as
    ``floor(1e6 * (n_docs - n_unique) / n_docs)``.  Unique = distinct
    md5(text) WITHIN the source (cross-source repeats count for each
    source: the report answers "how much would deduping THIS source
    alone save?").

    Scale shape: per-block md5 + per-block distinct (source, hash)
    combiner -> pair-level ``groupby`` (bounded by distinct pairs)
    -> per-block per-source distinct counts -> tiny source fold;
    doc totals ride a separate dimension-sized count."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    pair_schema = pa.schema(
        [("source", pa.string()), ("h", pa.string()), ("n", pa.int64())]
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        hashed = md5_hash_batch(t, col="text")
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        h = np.asarray(hashed.column("content_hash").to_pylist(),
                       dtype=object)
        key = np.asarray([f"{s}\x00{hh}" for s, hh in zip(src, h)],
                         dtype=object)
        order, starts, counts = _group_segments(key)
        return pa.table(
            {"source": pa.array(list(src[order][starts]), pa.string()),
             "h": pa.array(list(h[order][starts]), pa.string()),
             "n": pa.array(counts.astype(np.int64))},
            schema=pair_schema,
        )

    folded = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["source", "h"])
        .sum("n")
        .to_pandas()
    )
    folded.columns = ["source", "h", "n"]
    agg = folded.groupby("source", sort=True).agg(
        n_docs=("n", "sum"), n_unique=("h", "count")).reset_index()
    nd = agg["n_docs"].to_numpy(dtype=np.int64)
    nu = agg["n_unique"].to_numpy(dtype=np.int64)
    rate = np.array(
        [10**6 * (int(a) - int(b)) // int(a) for a, b in zip(nd, nu)],
        np.int64)
    return pa.table(
        {"source": pa.array(agg["source"], pa.string()),
         "n_docs": pa.array(nd),
         "n_unique_texts": pa.array(nu),
         "dup_rate_e6": pa.array(rate)}
    )


# ---------------------------------------------------------------------------
# Emerging vocabulary: word-share drift between corpus halves
# ---------------------------------------------------------------------------
def word_share_drift_topk(
    sf_dir: str, k: int = 20, min_count: int = 20
) -> pa.Table:
    """Emerging-terms report: the ``k`` words whose share of all
    tokens GREW most between the first and second half of the corpus
    (split at the doc_id boundary ``(n_docs - 1) // 2``, ids dense
    from 0 -- deterministic, no clock).  Ranking is EXACT: with half totals
    ``T1, T2`` and word counts ``n1, n2``, share growth orders by
    the integer ``d = n2 * T1 - n1 * T2`` (the common-denominator
    numerator of ``s2 - s1``); emitted as ``drift_e6 = floor(1e6 *
    n2 / T2) - floor(1e6 * n1 / T1)`` alongside the raw counts.
    Words below ``min_count`` total occurrences are noise and drop.

    Scale shape: per-block (word, half) count partials -> word-level
    ``groupby.sum`` (the only exchange) -> per-block local top-k by
    the exact integer key with broadcast (T1, T2) -> P*k driver
    merge."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs, _ = _table_meta(sf_dir, "documents")
    cut = (n_docs - 1) // 2  # docs with id > cut form the second half

    part_schema = pa.schema(
        [("w", pa.string()), ("n1", pa.int64()), ("n2", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        c1: dict[str, int] = {}
        c2: dict[str, int] = {}
        for did, s in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            tgt = c2 if did > cut else c1
            for w in _WORD.findall((s or "").lower()):
                tgt[w] = tgt.get(w, 0) + 1
        words = sorted(set(c1) | set(c2))
        return pa.table(
            {"w": pa.array(words, pa.string()),
             "n1": pa.array([c1.get(w, 0) for w in words], pa.int64()),
             "n2": pa.array([c2.get(w, 0) for w in words], pa.int64())},
            schema=part_schema,
        )

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("w").sum(["n1", "n2"]).materialize()
    tot = counts.sum(["sum(n1)", "sum(n2)"])
    T1, T2 = int(tot["sum(sum(n1))"]), int(tot["sum(sum(n2))"])

    out_schema = pa.schema(
        [("word", pa.string()), ("n_first", pa.int64()),
         ("n_second", pa.int64()), ("drift_e6", pa.int64())]
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        w = np.asarray(t.column("w").to_pylist(), dtype=object)
        n1 = t.column("sum(n1)").to_numpy(zero_copy_only=False)
        n2 = t.column("sum(n2)").to_numpy(zero_copy_only=False)
        keep = (n1 + n2) >= min_count
        if not keep.any():
            return out_schema.empty_table()
        w, n1, n2 = w[keep], n1[keep], n2[keep]
        d = n2.astype(object) * T1 - n1.astype(object) * T2
        order = sorted(range(len(w)), key=lambda i: (-d[i], w[i]))[:k]
        idx = np.asarray(order, np.int64)
        drift = np.asarray(
            [10**6 * int(b) // T2 - 10**6 * int(a) // T1
             for a, b in zip(n1[idx], n2[idx])], np.int64)
        return pa.table(
            {"word": pa.array(list(w[idx]), pa.string()),
             "n_first": pa.array(n1[idx]),
             "n_second": pa.array(n2[idx]),
             "drift_e6": pa.array(drift)},
            schema=out_schema,
        )

    cand = counts.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas()
    if len(cand) == 0:
        return out_schema.empty_table()
    d = (cand["n_second"].astype(object) * T1
         - cand["n_first"].astype(object) * T2)
    cand = cand.assign(_d=d)
    cand = cand.sort_values(["_d", "word"], ascending=[False, True],
                            ignore_index=True).head(k)
    return pa.Table.from_pandas(
        cand[["word", "n_first", "n_second", "drift_e6"]],
        preserve_index=False).cast(out_schema)


class _DsirScorer:
    """Actor-pool stage for ``dsir_select``: holds the broadcast
    (sorted feature vocab, micro-nat importance delta) arrays; per
    batch scores every document with searchsorted + int64 sums and
    emits the BLOCK-LOCAL top-k rows (driver merges P x k)."""

    def __init__(self, model_ref, k: int, strict: bool = True):
        import ray

        feats, delta = (
            ray.get(model_ref)
            if not isinstance(model_ref, tuple) else model_ref
        )
        self.feats = feats    # sorted object array of feature strings
        self.delta = delta    # int64 micro-nats lp_target - lp_raw
        self.k = k
        self.strict = strict  # uncapped: any OOV feature = drift, raise

    def __call__(self, t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()),
             ("n_feats", pa.int64()), ("score_micro", pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        langs = t.column("lang").to_pylist()
        rows = []
        for did, lang, s in zip(ids, langs, t.column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            if not toks:
                continue  # featureless docs drop on both sides (SQL join)
            fs = toks + [
                toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
            ]
            w = np.asarray(fs, dtype=object)
            pos = np.clip(np.searchsorted(self.feats, w), 0,
                          len(self.feats) - 1)
            hit = self.feats[pos] == w
            if self.strict and not bool(np.all(hit)):
                raise ValueError(
                    "dsir_select: feature absent from the pass-1 vocabulary "
                    "(tokenizer drift between passes)"
                )
            rows.append((int(did), lang, len(fs),
                         int(self.delta[pos][hit].sum())))
        if not rows:
            return out_schema.empty_table()
        rows.sort(key=lambda r: (-r[3], r[0]))
        rows = rows[: self.k]
        return pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "lang": pa.array([r[1] for r in rows], pa.string()),
             "n_feats": pa.array([r[2] for r in rows], pa.int64()),
             "score_micro": pa.array([r[3] for r in rows], pa.int64())},
            schema=out_schema,
        )


def dsir_select(
    sf_dir: str, target_lang: str = "en", k: int = 100,
    vocab_cap: int | None = None,
) -> pa.Table:
    """DSIR-style importance selection ("Data Selection for Language
    Models via Importance Resampling", Xie et al. 2023): fit two
    bag-of-n-gram unigram models -- the TARGET distribution p (here:
    ``lang == target_lang`` documents, the formal-text stand-in) and
    the RAW distribution q (the whole corpus) -- over unigram+bigram
    features, then score every document by its importance log-weight
    ``sum_f c_f * (ln p_f - ln q_f)`` and keep the top-``k``.
    Add-one smoothing over the joint feature space V; each model's
    log-prob is quantized to integer micro-nats exactly like
    ``doc_lm_score`` (``floor(1e6 * ln((n_f + 1) / (T + |V|)))``), so
    all cross-engine arithmetic after the per-feature quantization is
    int64 and the DuckDB oracle matches bit-for-bit.

    Scale shape: pass 1 is the vocab-bounded two-level aggregate
    (per-block ``np.unique`` partials over unigrams+bigrams ->
    ``groupby.aggregate(Sum, Sum)``; the exchange carries |V| rows,
    never |tokens|); the model broadcasts ONCE via ``ray.put``; pass
    2 is embarrassingly parallel searchsorted scoring with per-block
    top-k and a P x k driver merge (output-bounded, no full score
    table on the driver).  The paper's feature HASHING is an
    orthogonal memory bound: at 100 TB pass ``vocab_cap`` to clamp
    the broadcast to the top-V features by raw count (the gate runs
    uncapped so the oracle is the full exact model)."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    part_schema = pa.schema(
        [("feat", pa.string()), ("n_t", pa.int64()), ("n_r", pa.int64())]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        all_f: list[str] = []
        tgt_f: list[str] = []
        for lang, s in zip(t.column("lang").to_pylist(),
                           t.column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            fs = toks + [
                toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
            ]
            all_f.extend(fs)
            if lang == target_lang:
                tgt_f.extend(fs)
        if not all_f:
            return part_schema.empty_table()
        uniq, n_r = np.unique(np.asarray(all_f, dtype=object),
                              return_counts=True)
        n_t = np.zeros(len(uniq), np.int64)
        if tgt_f:
            ut, ct = np.unique(np.asarray(tgt_f, dtype=object),
                               return_counts=True)
            n_t[np.searchsorted(uniq, ut)] = ct
        return pa.table(
            {"feat": pa.array(list(uniq), pa.string()),
             "n_t": pa.array(n_t), "n_r": pa.array(n_r.astype(np.int64))},
            schema=part_schema,
        )

    freq = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("feat").aggregate(Sum("n_t"), Sum("n_r")).to_pandas()
    )
    feats = freq["feat"].to_numpy().astype(object)
    n_t = freq["sum(n_t)"].to_numpy().astype(np.int64)
    n_r = freq["sum(n_r)"].to_numpy().astype(np.int64)
    order = np.argsort(feats, kind="stable")
    feats, n_t, n_r = feats[order], n_t[order], n_r[order]
    V = len(feats)
    T_t, T_r = int(n_t.sum()), int(n_r.sum())
    if vocab_cap is not None and V > vocab_cap:
        keep = np.zeros(V, bool)
        keep[np.argsort(-n_r, kind="stable")[:vocab_cap]] = True
        feats, n_t, n_r = feats[keep], n_t[keep], n_r[keep]
        # V, T_t, T_r stay the FULL-space values so retained-feature
        # probabilities are unchanged by the cap (doc_lm_score rule)
    lp_t = np.floor(
        1e6 * np.log((n_t + 1).astype(np.float64) / (T_t + V))
    ).astype(np.int64)
    lp_r = np.floor(
        1e6 * np.log((n_r + 1).astype(np.float64) / (T_r + V))
    ).astype(np.int64)
    model_ref = ray.put((feats, lp_t - lp_r))

    cand = (
        _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
        .map_batches(
            _cached_stage(
                ("dsir", model_ref.hex(), k, vocab_cap is None),
                lambda: _DsirScorer(model_ref, k, strict=vocab_cap is None),
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cand = cand.sort_values(
        ["score_micro", "doc_id"], ascending=[False, True],
        ignore_index=True,
    ).head(k)
    return pa.Table.from_pandas(cand, preserve_index=False)


def benchmark_decontam(
    sf_dir: str, n: int = 8, bench_mod: int = 97,
    plant_copies: bool = True,
) -> pa.Table:
    """Benchmark n-gram decontamination (the GPT-3 appendix-C /
    open-LM-eval shape: drop any training document sharing an
    ``n``-gram with the held-out benchmark): documents with
    ``doc_id % bench_mod == 0`` stand in for the benchmark suite;
    every OTHER document is flagged with the count of its DISTINCT
    word ``n``-grams that appear anywhere in the benchmark.  Returns
    contaminated rows only: ``(doc_id, n_hit)`` ordered by doc_id.
    Distinct from ``contamination_check`` (substring needles): this
    is set-of-shingles semantics, robust to the needle crossing
    token boundaries.

    ``plant_copies``: the synthetic corpus draws tokens at random, so
    natural 8-gram collisions are ~impossible; the gate unions in one
    provably-contaminated document per benchmark doc (``PLANT_BASE +
    doc_id``, text = ``'qq qq ' + first-8-gram + ' qq'``) -- each
    must come back with ``n_hit = 1`` (its other shingles contain the
    out-of-vocabulary ``qq`` filler).  Both engines construct the
    identical union.

    Scale shape: a benchmark suite is MBs by nature, so this is the
    broadcast-needle pattern (``ray.put`` the distinct benchmark
    shingle set once, hash-set probe per block), not an exchange;
    the scan emits only contaminated rows (output-bounded).  A
    corpus-vs-corpus variant is ``doc_dup_ngrams`` (gram exchange)."""
    import ray

    PLANT_BASE = 10_000_000
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    bench_schema = pa.schema(
        [("gram", pa.string()),
         ("plant_id", pa.int64()), ("plant_text", pa.string())]
    )

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % bench_mod == 0) & (ids < PLANT_BASE)
        if not mask.any():
            return bench_schema.empty_table()
        gs, pids, ptxt = [], [], []
        for did, s in zip(ids[mask],
                          t.filter(pa.array(mask)).column("text").to_pylist()):
            toks = _WORD.findall((s or "").lower())
            grams = {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
            gs.extend(grams)
            pids.extend([-1] * len(grams))
            ptxt.extend([""] * len(grams))
            if plant_copies and len(toks) >= n:
                gs.append("")
                pids.append(PLANT_BASE + int(did))
                ptxt.append("qq qq " + " ".join(toks[:n]) + " qq")
        return pa.table(
            {"gram": pa.array(gs, pa.string()),
             "plant_id": pa.array(pids, pa.int64()),
             "plant_text": pa.array(ptxt, pa.string())},
            schema=bench_schema,
        )

    bdf = ds.map_batches(bench_grams, batch_format="pyarrow").to_pandas()
    bench_set = frozenset(bdf.loc[bdf["plant_id"] < 0, "gram"])
    planted = bdf[bdf["plant_id"] >= 0]
    needles_ref = ray.put(bench_set)

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_hit", pa.int64())])

    def scan(t: pa.Table) -> pa.Table:
        needles = ray.get(needles_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        dids, hits = [], []
        for did, s in zip(ids, t.column("text").to_pylist()):
            if did % bench_mod == 0 and did < PLANT_BASE:
                continue  # benchmark docs are not training candidates
            toks = _WORD.findall((s or "").lower())
            grams = {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
            n_hit = len(grams & needles)
            if n_hit:
                dids.append(int(did))
                hits.append(n_hit)
        if not dids:
            return out_schema.empty_table()
        return pa.table(
            {"doc_id": pa.array(dids, pa.int64()),
             "n_hit": pa.array(hits, pa.int64())},
            schema=out_schema,
        )

    scan_in = ds
    if len(planted):
        import ray.data as rd

        scan_in = ds.union(rd.from_arrow(pa.table(
            {"doc_id": pa.array(planted["plant_id"].to_numpy(np.int64)),
             "text": pa.array(list(planted["plant_text"]), pa.string())}
        )))
    df = (
        scan_in.map_batches(scan, batch_format="pyarrow")
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False).cast(out_schema)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
# ---------------------------------------------------------------------------
#: polynomial gram-hash combiner constants, shared bit-for-bit with the
#: DuckDB oracle (_WINNOW_SQL inlines the same literals): gram hash =
#: sum_j wordhash[i+j] * WINNOW_POW[j] mod 2^64 with WINNOW_POW[j] =
#: C^(k-1-j) mod 2^64, C = the golden-ratio odd constant 0x9E3779B97F4A7C15
WINNOW_K = 4   # words per gram
WINNOW_W = 5   # grams per winnowing window (density ~ 2/(w+1))
WINNOW_POW = (
    6938460308862072877,
    16088033396387240377,
    11400714819323198485,
    1,
)


def winnowing_fingerprints(sf_dir: str) -> pa.Table:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 -- the MOSS selection rule): hash every word ``k``-gram, slide
    a window of ``w`` consecutive gram hashes over each document, and
    keep each window's MINIMUM as a fingerprint.  The guarantee: any
    shared run of at least ``w + k - 1`` words between two documents
    yields at least one shared fingerprint, at ~``2/(w+1)`` the volume
    of the exhaustive gram exchange (``doc_dup_ngrams`` is that
    exhaustive sibling at the same detection threshold: k=4, w=5 ->
    8-word runs).  Documents with at least one gram but fewer than
    ``w`` keep one fingerprint, the minimum over all their grams (the
    whole short document is one window).

    Returns one row per document: ``(doc_id, n_grams, n_fp,
    n_shared)`` where ``n_fp`` counts the document's DISTINCT
    fingerprints and ``n_shared`` how many of those appear in >= 2
    distinct documents corpus-wide.

    Scale shape: word hashes via the vectorized buffer-level FNV-1a
    (``fnv1a_u64`` -- the identical byte fold the oracle reproduces
    per DISTINCT word with a vocab-bounded recursive CTE), gram hashes
    via k shifted uint64 multiply-adds, window minima via one
    ``sliding_window_view`` min per block (short-doc minima via one
    ``minimum.reduceat``) -- no per-row Python anywhere.  Only the
    winnowed (fingerprint, doc_id) pairs cross the hash exchange
    (explicit boundaries, split-guarded), so the wide step moves
    ~2/(w+1) of what ``doc_dup_ngrams`` ships; sharing arbitration is
    a per-block segment sweep and per-doc counts return through a
    dimension-bounded ``groupby(doc_id).sum``."""
    from numpy.lib.stride_tricks import sliding_window_view

    from ray.data.aggregate import Sum

    from logminer_kafka_connect_ray.functions.hashing import (
        fnv1a_u64,
        partition_ids,
    )

    k, w = WINNOW_K, WINNOW_W
    pw = np.array(WINNOW_POW, dtype=np.uint64)
    n_docs, _ = _table_meta(sf_dir, "documents")
    # fingerprints ~ 2/(w+1) of grams (~100 words/doc in this corpus)
    P = _exchange_width(n_docs * 32)
    gd = _new_guard_dir("winnow")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    fp_schema = pa.schema(
        [("fp", pa.uint64()), ("doc_id", pa.int64()), ("_p", pa.int64())]
    )

    def fp_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return fp_schema.empty_table()
        text = pc.cast(t.column("text").combine_chunks(), pa.large_string())
        ls = pc.split_pattern(text, " ")
        flat = pc.list_flatten(ls)
        lens = (
            pc.fill_null(pc.list_value_length(ls), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        doc_ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        wh = fnv1a_u64(flat)
        # per-doc gram counts; grams never span documents because the
        # shifted sums below are gathered per doc via its own offsets
        g = np.maximum(lens - k + 1, 0)
        if int(g.sum()) == 0:
            return fp_schema.empty_table()
        # gram hash at flat position p: sum_j wh[p+j] * pw[j] (uint64
        # wrap == mod 2^64); positions crossing a doc boundary are
        # computed but never gathered
        m = len(wh) - k + 1
        with np.errstate(over="ignore"):
            gh = wh[:m] * pw[0]
            for j in range(1, k):
                gh = gh + wh[j : j + m] * pw[j]
        # gather each doc's grams into one contiguous array
        doc_off = np.cumsum(lens) - lens          # doc start in flat
        gstart = np.cumsum(g) - g                 # doc start in gathered
        total_g = int(g.sum())
        gather = (
            np.arange(total_g, dtype=np.int64)
            - np.repeat(gstart, g)
            + np.repeat(doc_off, g)
        )
        gh_doc = gh[gather]                       # per-doc contiguous
        # full windows per doc (+ one whole-doc window for short docs)
        f = np.maximum(g - w + 1, 0)
        total_f = int(f.sum())
        fps_parts: list[np.ndarray] = []
        doc_parts: list[np.ndarray] = []
        if total_f:
            sw = sliding_window_view(gh_doc, w).min(axis=1)
            fstart = np.cumsum(f) - f
            idx = (
                np.arange(total_f, dtype=np.int64)
                - np.repeat(fstart, f)
                + np.repeat(gstart, f)
            )
            fps_parts.append(sw[idx])
            doc_parts.append(np.repeat(doc_ids, f))
        short = (g > 0) & (g < w)
        if short.any():
            nz = g > 0
            red = np.minimum.reduceat(gh_doc, gstart[nz])
            fps_parts.append(red[short[nz]])
            doc_parts.append(doc_ids[short])
        fp = np.concatenate(fps_parts)
        doc = np.concatenate(doc_parts)
        # distinct (doc, fp) within the batch (docs live in one batch)
        order = np.lexsort((fp, doc))
        fp, doc = fp[order], doc[order]
        keep = np.ones(len(fp), bool)
        if len(fp) > 1:
            keep[1:] = (fp[1:] != fp[:-1]) | (doc[1:] != doc[:-1])
        fp, doc = fp[keep], doc[keep]
        fpa = pa.array(fp)
        return pa.table(
            {
                "fp": fpa,
                "doc_id": pa.array(doc),
                "_p": pa.array(partition_ids(fpa, P)),
            },
            schema=fp_schema,
        )

    part_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_fp", pa.int64()),
         ("n_shared", pa.int64())]
    )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        _guard_record(
            gd, "winnow", t.column("_p").to_numpy(zero_copy_only=False)
        )
        fp = t.column("fp").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(fp, kind="stable")
        fp_s = fp[order]
        n = len(fp_s)
        brk = np.ones(n, bool)
        if n > 1:
            brk[1:] = fp_s[1:] != fp_s[:-1]
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, n))
        shared = np.repeat(counts >= 2, counts).astype(np.int64)
        # back to row order, then per-doc partials
        shared_rows = np.empty(n, np.int64)
        shared_rows[order] = shared
        dorder, dstarts, dcounts = _group_segments(doc)
        return pa.table(
            {
                "doc_id": pa.array(doc[dorder][dstarts]),
                "n_fp": pa.array(dcounts.astype(np.int64)),
                "n_shared": pa.array(
                    np.add.reduceat(shared_rows[dorder], dstarts)
                ),
            },
            schema=part_schema,
        )

    agg = (
        ds.map_batches(fp_rows, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .aggregate(Sum("n_fp"), Sum("n_shared"))
        .to_pandas()
    )
    agg = _named_agg(agg, ["doc_id", "n_fp", "n_shared"])

    # total gram count per doc: cheap vectorized pass, no exchange
    def totals(t: pa.Table) -> pa.Table:
        words = pc.add(
            pc.count_substring(t.column("text"), " "), pa.scalar(1)
        )
        ng = pc.max_element_wise(
            pc.cast(pc.subtract(words, pa.scalar(k - 1)), pa.int64()),
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "n_grams": ng}
        )

    tot = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(totals, batch_format="pyarrow")
        .to_pandas()
    )
    out = tot.merge(agg, on="doc_id", how="left").fillna(
        {"n_fp": 0, "n_shared": 0}
    )
    t = pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "n_grams": pa.array(out["n_grams"].to_numpy(), pa.int64()),
            "n_fp": pa.array(out["n_fp"].to_numpy().astype(np.int64)),
            "n_shared": pa.array(
                out["n_shared"].to_numpy().astype(np.int64)
            ),
        }
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    return _finalize_guard(gd, t)


def doc_dup_span_removal(sf_dir: str, n: int = 8) -> pa.Table:
    """Exact-substring dedup as a TRANSFORM (the removal step of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022 -- where ``doc_dup_ngrams`` only counts, this masks):
    every occurrence of a corpus-duplicated word ``n``-gram EXCEPT the
    globally first one (ordered by ``(doc_id, position)``) is masked,
    and a masked occurrence at position ``i`` covers words
    ``i..i+n-1``; overlapping covers union.  Returns per document
    ``(doc_id, n_words, n_masked, n_kept)`` with ``n_masked`` the
    count of covered word positions -- the exact size of the text the
    removal pass would cut.

    Scale shape: gram exchange as in ``doc_dup_ngrams`` (Arrow-native
    gram construction, split-guarded explicit boundaries) but the
    block sweep emits only the MASKED occurrences (first-of-segment
    survives -- the ``line_dedup`` arbitration at gram granularity),
    so the second exchange carries only duplicate volume; coverage
    union per doc is one vectorized diff-array (+1 at ``i``, -1 at
    ``i+n``, cumsum>0) inside a doc-keyed exchange block."""
    from ray.data.aggregate import Sum

    from logminer_kafka_connect_ray.functions.hashing import partition_ids

    n_docs, _ = _table_meta(sf_dir, "documents")
    P = _exchange_width(n_docs * 64)
    P2 = _exchange_width(n_docs)
    gd = _new_guard_dir("dupspan")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    gram_schema = pa.schema(
        [("gram", pa.large_string()), ("doc_id", pa.int64()),
         ("pos", pa.int64()), ("_p", pa.int64())]
    )

    def gram_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return gram_schema.empty_table()
        text = pc.cast(t.column("text").combine_chunks(), pa.large_string())
        ls = pc.split_pattern(text, " ")
        flat = pc.list_flatten(ls)
        parent = pc.list_parent_indices(ls).to_numpy(zero_copy_only=False)
        m = len(flat) - n + 1
        if m <= 0:
            return gram_schema.empty_table()
        shifted = [flat.slice(j, m) for j in range(n)]
        grams = pc.binary_join_element_wise(
            *shifted, pa.scalar(" ", pa.large_string())
        )
        valid = parent[:m] == parent[n - 1 : n - 1 + m]
        lens = (
            pc.fill_null(pc.list_value_length(ls), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # word position of each gram within its own document (0-based)
        doc_start = (np.cumsum(lens) - lens)[parent[:m]]
        pos = np.arange(m, dtype=np.int64) - doc_start
        doc = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )[parent[:m]]
        grams = grams.filter(pa.array(valid))
        if len(grams) == 0:
            return gram_schema.empty_table()
        return pa.table(
            {"gram": grams, "doc_id": pa.array(doc[valid]),
             "pos": pa.array(pos[valid]),
             "_p": pa.array(partition_ids(grams, P))},
            schema=gram_schema,
        )

    masked_schema = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()), ("_p", pa.int64())]
    )

    def mask_sweep(t: pa.Table) -> pa.Table:
        """Whole gram groups by the exchange: every occurrence except
        the (doc_id, pos)-first of a duplicated gram is masked."""
        if t.num_rows == 0:
            return masked_schema.empty_table()
        _guard_record(
            gd, "dupspan:gram", t.column("_p").to_numpy(zero_copy_only=False)
        )
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("gram", "ascending"), ("doc_id", "ascending"),
            ("pos", "ascending"),
        ]))
        grams = t.column("gram").combine_chunks()
        nrow = len(grams)
        first = np.ones(nrow, bool)
        if nrow > 1:
            first[1:] = pc.not_equal(
                grams.slice(1), grams.slice(0, nrow - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, nrow))
        dup = np.repeat(counts >= 2, counts)
        masked = dup & ~first
        if not masked.any():
            return masked_schema.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)[masked]
        pos = t.column("pos").to_numpy(zero_copy_only=False)[masked]
        return pa.table(
            {"doc_id": pa.array(doc.astype(np.int64)),
             "pos": pa.array(pos.astype(np.int64)),
             "_p": pa.array(
                 partition_ids(pa.array(doc.astype(np.int64)), P2)
             )},
            schema=masked_schema,
        )

    cover_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_masked", pa.int64())]
    )

    def cover_sweep(t: pa.Table) -> pa.Table:
        """Doc-keyed blocks: union the [pos, pos+n) covers per doc via
        one diff-array cumsum."""
        if t.num_rows == 0:
            return cover_schema.empty_table()
        _guard_record(
            gd, "dupspan:doc", t.column("_p").to_numpy(zero_copy_only=False)
        )
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        pos = t.column("pos").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order, starts, counts_ = _group_segments(doc)
        doc_s, pos_s = doc[order], pos[order]
        # pack every doc's cover range into ONE diff array: doc d gets
        # a disjoint window of (max_pos_d + n + 1) slots, so a single
        # add.at + cumsum unions every doc's intervals at once
        ends = np.append(starts[1:], len(pos_s))
        maxpos = np.maximum.reduceat(pos_s, starts)
        width = maxpos + n + 1
        base = np.cumsum(width) - width
        gp = pos_s + np.repeat(base, counts_)
        total = int(width.sum())
        diff = np.zeros(total + 1, np.int64)
        np.add.at(diff, gp, 1)
        np.add.at(diff, gp + n, -1)
        covered = (np.cumsum(diff)[:total] > 0).astype(np.int64)
        n_masked = np.add.reduceat(covered, base)
        return pa.table(
            {"doc_id": pa.array(doc_s[starts]),
             "n_masked": pa.array(n_masked)},
            schema=cover_schema,
        )

    masked = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .sort("_p", boundaries=list(range(1, P)))
        .map_batches(mask_sweep, batch_format="pyarrow", batch_size=None)
        .sort("_p", boundaries=list(range(1, P2)))
        .map_batches(cover_sweep, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .aggregate(Sum("n_masked"))
        .to_pandas()
    )
    masked = _named_agg(masked, ["doc_id", "n_masked"])

    def totals(t: pa.Table) -> pa.Table:
        words = pc.add(
            pc.count_substring(t.column("text"), " "), pa.scalar(1)
        )
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "n_words": pc.cast(words, pa.int64())}
        )

    tot = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(totals, batch_format="pyarrow")
        .to_pandas()
    )
    out = tot.merge(masked, on="doc_id", how="left").fillna({"n_masked": 0})
    t = pa.table(
        {"doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
         "n_words": pa.array(out["n_words"].to_numpy(), pa.int64()),
         "n_masked": pa.array(out["n_masked"].to_numpy().astype(np.int64)),
         "n_kept": pa.array(
             (out["n_words"] - out["n_masked"]).to_numpy().astype(np.int64)
         )}
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    return _finalize_guard(gd, t)
