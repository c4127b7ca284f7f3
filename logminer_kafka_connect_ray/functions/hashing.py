"""Stable, vectorized key hashing for lake partitioning.

The lake's partition assignment (partition id = hash(url) % P) must be
identical across runs and processes for the lifetime of a lake --
events are shuffled TO the partition that holds their key's rows
(SURVEY.md section 7.2 step 4: "events shuffle, base rows stay put").

We use a vectorized FNV-1a over UTF-8 bytes implemented with numpy on
the Arrow string buffers: fully deterministic, no dependence on
pandas/pyarrow hash implementations that may change between versions.
The commit manifest stores probe values (``hash_probe``) so a lake
opened by a different build fails loudly instead of silently
mis-partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_u64(strings: pa.ChunkedArray | pa.Array | np.ndarray | list) -> np.ndarray:
    """Vectorized FNV-1a 64-bit hash of an array of strings.

    Processes byte-position j across all rows at once: for each j,
    update only the rows whose string is at least j+1 bytes long.
    Cost O(max_len * n) numpy ops -- urls are short, so this is fast
    and allocation-light versus a per-row Python loop.
    """
    if isinstance(strings, (pa.ChunkedArray, pa.Array)):
        arr = strings.combine_chunks() if isinstance(strings, pa.ChunkedArray) else strings
        arr = arr.cast(pa.large_string())
        buf_offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        starts = buf_offsets[:-1]
        lengths = (buf_offsets[1:] - starts).astype(np.int64)
    else:
        pylist = [s.encode() if isinstance(s, str) else bytes(s) for s in strings]
        lengths = np.array([len(b) for b in pylist], dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
        data = np.frombuffer(b"".join(pylist), dtype=np.uint8) if pylist else np.empty(0, np.uint8)

    n = len(lengths)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    max_len = int(lengths.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(max_len):
            alive = lengths > j
            idx = starts[alive] + j
            h[alive] = (h[alive] ^ data[idx].astype(np.uint64)) * _FNV_PRIME
    return h


def partition_ids(keys, num_partitions: int) -> np.ndarray:
    """partition id in [0, num_partitions) for each key.

    Non-string key columns (int PKs etc.) are cast to their canonical
    string form first so the mapping stays type-stable across schema
    widenings (int32 id == int64 id)."""
    if isinstance(keys, (pa.ChunkedArray, pa.Array)) and not (
        pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)
    ):
        import pyarrow.compute as pc

        keys = pc.cast(keys, pa.string())
    return (fnv1a_u64(keys) % np.uint64(num_partitions)).astype(np.int64)


def hash_probe(num_partitions: int) -> dict[str, int]:
    """Probe values persisted in the manifest to detect hash drift."""
    probes = ["", "a", "https://example.com/p/0", "éè☃"]
    return {s: int(partition_ids([s], num_partitions)[0]) for s in probes}


# ---------------------------------------------------------------------------
# Bloom filter (shuffle-pruning semi-join prefilter)
# ---------------------------------------------------------------------------
#: 2^23 bits = 1 MiB per filter -- constant regardless of build-side
#: cardinality (the point of a bloom vs an exact key set); ~0.06%
#: false positives at 100k distinct keys / ~5% at 1M with 2
#: independent probes, 0 false negatives.
BLOOM_BITS = 1 << 23
_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _bloom_idx(keys) -> tuple[np.ndarray, np.ndarray]:
    """Two independent bit positions per key (same string
    canonicalization as ``partition_ids`` so both join sides agree).

    The second index takes the HIGH 23 bits of the mixed hash: low
    bits of ``h * odd`` mod 2^64 are a pure function of the low bits
    of ``h``, so a low-bits second index would collide exactly when
    the first does (measured 50x worse FPR) -- the shift is what
    makes the two probes independent."""
    if isinstance(keys, (pa.ChunkedArray, pa.Array)) and not (
        pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)
    ):
        import pyarrow.compute as pc

        keys = pc.cast(keys, pa.string())
    h = fnv1a_u64(keys)
    with np.errstate(over="ignore"):
        h2 = (h * _BLOOM_MIX) >> np.uint64(64 - 23)
    m = np.uint64(BLOOM_BITS)
    return (h % m).astype(np.int64), (h2 % m).astype(np.int64)


def bloom_block(keys) -> bytes:
    """One block's keys -> a packed uint64 bloom bitmap (bytes).
    Merge bitmaps with ``np.bitwise_or`` -- associative, order-free,
    BLOOM_BITS/8 bytes per block regardless of row count."""
    words = np.zeros(BLOOM_BITS // 64, np.uint64)
    i1, i2 = _bloom_idx(keys)
    for idx in (i1, i2):
        np.bitwise_or.at(
            words, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64)
        )
    return words.tobytes()


def bloom_probe(words: np.ndarray, keys) -> np.ndarray:
    """Membership mask (True = POSSIBLY present; False = definitely
    absent -- safe to drop before a shuffle)."""
    i1, i2 = _bloom_idx(keys)
    def bit(idx):
        return (
            words[idx >> 6] >> (idx & 63).astype(np.uint64)
        ).astype(np.uint64) & np.uint64(1)
    return (bit(i1) & bit(i2)).astype(bool)


def fmix64(h: np.ndarray) -> np.ndarray:
    """murmur3's 64-bit finalizer over a uint64 array: FNV-1a's high
    bits avalanche poorly on short keys (sequential decimal-int
    strings cluster), which breaks any consumer that relies on hash
    ORDER STATISTICS or top bits -- the HLL registers and the KMV
    k-minimum-values sketch both finalize through this mixer."""
    with np.errstate(over="ignore"):
        h = h.astype(np.uint64).copy()
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h
