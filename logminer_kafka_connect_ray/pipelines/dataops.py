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
from logminer_kafka_connect_ray.functions.hashing import fnv1a_u64


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def md5_hash_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Add a deterministic md5 content hash column (hex string)."""
    texts = t.column(col).to_pylist()
    hashes = [
        hashlib.md5(s.encode("utf-8")).hexdigest() if isinstance(s, str) else None
        for s in texts
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
    the band-bucket groupby (SNIPPETS/ray guide near-dup pattern)."""

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


def dedup_minhash_lsh(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """MinHash+LSH near-duplicate pairs verified by exact n-gram
    Jaccard >= threshold.  Returns (doc_a, doc_b, jaccard) sorted.

    shingle->minhash->band rows (map_batches, actor pool) ->
    groupby(band, bucket) -> candidate pairs -> broadcast-text verify.
    """
    import ray

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    band_rows = docs.map_batches(MinHashStage, concurrency=(1, 4), batch_format="pyarrow")

    def pairs_of(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].unique().tolist())
        if len(ids) < 2 or len(ids) > 200:  # degenerate bucket guard
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand = (
        band_rows.groupby(["band", "bucket"])
        .map_groups(pairs_of, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if cand.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    # verify: broadcast candidate texts (small side) and compute exact
    # jaccard distributed over candidate pairs
    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    texts_tbl = (
        docs.map_batches(
            lambda t, ids=set(need): t.filter(
                pc.is_in(t.column("doc_id"), value_set=pa.array(list(ids)))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    text_by_id = dict(zip(texts_tbl["doc_id"], texts_tbl["text"]))
    ref = ray.put(text_by_id)
    import ray.data as rd

    cand_ds = rd.from_pandas(cand.reset_index(drop=True))

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            jac = [
                ngram_jaccard(self.texts.get(a, ""), self.texts.get(b, ""))
                for a, b in zip(df["doc_a"], df["doc_b"])
            ]
            df = df.copy()
            df["jaccard"] = np.round(jac, 6)
            return df[df["jaccard"] >= threshold]

    out = cand_ds.map_batches(Verify, concurrency=(1, 4), batch_format="pandas").to_pandas()
    out = out.sort_values(["doc_a", "doc_b"], ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


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
    sims = docs.map_batches(SimHashStage, concurrency=(1, 4), batch_format="pyarrow")

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

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2 or len(g) > 200:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            hd = np.array([bin(v).count("1") for v in x])
            for j, d in enumerate(hd):
                out["doc_a"].append(ids[i])
                out["doc_b"].append(ids[i + 1 + j])
                out["hamming"].append(int(d))
        return pd.DataFrame(out)

    pairs = (
        seg_rows.groupby(["seg_no", "seg_val"])
        .map_groups(pairs_of, batch_format="pandas")
        .to_pandas()
    )
    pairs = pairs[pairs["hamming"] <= max_hamming].drop_duplicates(
        ["doc_a", "doc_b"]
    )
    pairs = pairs.sort_values(["doc_a", "doc_b"], ignore_index=True)
    pairs["doc_a"] = pairs["doc_a"].astype("int64")
    pairs["doc_b"] = pairs["doc_b"].astype("int64")
    pairs["hamming"] = pairs["hamming"].astype("int64")
    return pa.Table.from_pandas(pairs, preserve_index=False)


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------
def _embedding_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    emb = t.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    mat = np.asarray(emb.to_pylist(), dtype=np.float64)
    return ids, mat


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


def ann_cosine_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pa.Table:
    """Brute-force cosine top-k: the first ``n_queries`` vectors are the
    query set (broadcast once); candidates stream through map_batches.

    Returns (query_id, vec_id, sim) -- sim rounded to 6 dp; ranking by
    (sim desc, vec_id asc); self-matches excluded.
    """
    import ray

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # query set = vec_id < n_queries (explicit, SQL-restatable)
    head = pa.Table.from_pylist(
        emb.map_batches(
            lambda t: t.filter(pc.less(t.column("vec_id"), n_queries)),
            batch_format="pyarrow",
        ).take_all()
    )
    q_ids, q_mat = _embedding_matrix(head)
    ref = ray.put((q_ids, q_mat))

    partial = emb.map_batches(
        CosineTopK, fn_constructor_args=(ref, k + 1), concurrency=(1, 4),
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


def ann_cosine_topk_lsh(sf_dir: str, n_queries: int = 5, k: int = 10,
                        n_planes: int = 12) -> pa.Table:
    """Scale-path ANN: random-hyperplane LSH buckets prune candidates;
    only vectors sharing a bucket (original or 1-bit-flip probe) with a
    query are scored.  Approximate by construction -- no SQL oracle."""
    import ray

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = pa.Table.from_pylist(emb.take(n_queries))
    q_ids, q_mat = _embedding_matrix(head)
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

    partial = emb.map_batches(Stage, concurrency=(1, 4), batch_format="pyarrow")
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
) -> pa.Table:
    """IVF scale-path ANN: a coarse k-means quantizer (fit on a
    driver-side sample, centroids broadcast) prunes candidates to the
    ``n_probe`` nearest clusters of each query; exact cosine only
    inside probed clusters.  Approximate by construction -- no SQL
    oracle; recall verified against brute force in tests."""
    import ray

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample_tbl = pa.Table.from_pylist(emb.take(train_sample))
    _, sample = _embedding_matrix(sample_tbl)
    cent = _kmeans_fit(sample, n_clusters)

    head = pa.Table.from_pylist(
        emb.map_batches(
            lambda t: t.filter(pc.less(t.column("vec_id"), n_queries)),
            batch_format="pyarrow",
        ).take_all()
    )
    q_ids, q_mat = _embedding_matrix(head)
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

    partial = emb.map_batches(Stage, concurrency=(1, 4), batch_format="pyarrow")
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


def embedding_near_dup(sf_dir: str, tau: float = 0.95) -> pa.Table:
    """Embedding-cosine near-dup pairs (sim >= tau) via hyperplane-LSH
    bucket groupby + in-bucket exact cosine."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dim = len(pa.Table.from_pylist(emb.take(1)).column("embedding")[0])
    planes = np.random.default_rng(11).standard_normal((8, dim))

    def bucketize(t: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(t)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        matn = mat / norms
        s = (((matn @ planes.T) > 0) @ (1 << np.arange(8))).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(s), "vec_id": pa.array(ids.astype(np.int64)),
             "embedding": t.column("embedding")}
        )

    def in_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > 500:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "sim_r": []})
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = np.asarray(g["embedding"].tolist(), dtype=np.float64)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        sims = matn @ matn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= tau
        return pd.DataFrame(
            {"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]],
             "sim_r": np.round(sims[ia[keep], ib[keep]], 6)}
        )

    pairs = (
        emb.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(in_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    empty = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
         "sim_r": pa.array([], pa.float64())}
    )
    if pairs.empty or "vec_a" not in pairs.columns:
        return empty
    pairs = pairs.drop_duplicates(["vec_a", "vec_b"]).sort_values(
        ["vec_a", "vec_b"], ignore_index=True
    )
    for c in ("vec_a", "vec_b"):
        pairs[c] = pairs[c].astype("int64")
    return pa.Table.from_pandas(pairs, preserve_index=False)


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


def lang_id(sf_dir: str) -> pa.Table:
    """Heuristic language id per document (stopword-marker argmax)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def li(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang_pred": textfn.lang_id_series(df["text"])}
        )

    t = pa.Table.from_pandas(
        ds.map_batches(li, batch_format="pandas").to_pandas(), preserve_index=False
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
