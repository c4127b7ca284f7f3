"""Differential fuzz for the text/document operators: random small
corpora (duplicate runs, exact-copy docs, shared 8-grams, short docs,
empty-ish docs, skewed vocab) run through BOTH the Ray pipeline and
its DuckDB oracle; results must match exactly (the check_oracle
canonicalizer).  The three-scale gates prove the ops on the driver's
fixed corpus; this proves them on corpora they were never tuned on.

Usage:
    python scripts/fuzz_textops.py [seed_lo seed_hi]
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as entrymod

#: ops exercised: everything reading ONLY the documents table whose
#: semantics the random generator can stress (dup structure, grams,
#: vocab skew).  dsir needs lang; the generator emits one.
OPS = [
    "dedup_exact",
    "line_dedup",
    "doc_dup_ngrams",
    "doc_dup_span_removal",
    "winnowing_fingerprints",
    "word_freq_topk",
    "word_bigram_topk",
    "doc_repetition",
    "doc_lexical_diversity",
    "dsir_select",
    "doc_lm_score",
    # html build->extract roundtrip: oracle is the raw text, so any
    # mismatch = a body the extraction failed to invert byte-for-byte
    "html_text_extract",
    "html_outlinks",
    "web_crawl_frontier",
    "web_anchor_text",
]

#: embedding-table ops fuzzed alongside (random integer-grid vectors;
#: the planted-fixture oracles derive their plants from the data on
#: both sides, so they hold on any table)
EMB_OPS = [
    "embedding_norm2_quantiles",
    "embedding_quantize",
    "embedding_kmeans",
    "ann_cosine_topk",
    "semantic_dedup",
]

qs = entrymod.queries()
sqls = entrymod.oracle_sql()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c], utc=True).astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def gen_corpus(rng: random.Random, out_dir: str) -> None:
    vocab = [f"w{i}" for i in range(rng.randint(5, 40))]
    # mixed-case and punctuated tokens stress the two tokenization
    # contracts: split-on-space ops must treat "W1." as one token on
    # BOTH engines, regex+lower ops must split it the same way on both
    vocab += [f"W{i}" for i in range(rng.randint(0, 5))]
    vocab += [f"w{i}." for i in range(rng.randint(0, 4))]
    vocab += [f"a-{i}" for i in range(rng.randint(0, 3))]
    # entity- and tag-shaped tokens stress the html escape/unescape
    # roundtrip (html_text_extract) and the symbol handling of every
    # shared tokenization contract
    vocab += [f"&e{i};" for i in range(rng.randint(0, 3))]
    vocab += [f"<t{i}>" for i in range(rng.randint(0, 2))]
    vocab += ["&amp;"] * rng.randint(0, 1)
    n = rng.randint(8, 120)
    texts: list[str] = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.15 and texts:
            texts.append(rng.choice(texts))          # exact copy
        elif kind < 0.3 and texts:
            # share a run of >= 8 words with an earlier doc
            src = rng.choice(texts).split(" ")
            if len(src) >= 9:
                s = rng.randint(0, len(src) - 9)
                run = src[s : s + 8 + rng.randint(0, 2)]
                pre = [rng.choice(vocab) for _ in range(rng.randint(0, 6))]
                post = [rng.choice(vocab) for _ in range(rng.randint(0, 6))]
                texts.append(" ".join(pre + run + post))
                continue
            texts.append(" ".join(rng.choices(vocab, k=12)))
        elif kind < 0.4:
            texts.append(" ".join(rng.choices(vocab, k=rng.randint(1, 4))))
        else:
            # zipf-ish repeats inside the doc
            k = rng.randint(8, 60)
            ws = rng.choices(vocab[: max(3, len(vocab) // 2)], k=k)
            if rng.random() < 0.4:  # force intra-doc repetition
                ws += ws[: rng.randint(1, min(10, k))]
            texts.append(" ".join(ws))
    langs = [rng.choice(["en", "en", "de", "xx"]) for _ in texts]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                [rng.choice(["cc", "web", "book"]) for _ in texts]
            ),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))
    # embeddings: values on the same integer grid the generator uses
    # (floor(v * 2^10) exactness assumptions hold)
    nv = rng.randint(16, 200)
    dim = rng.choice([8, 16, 64])
    vecs = [
        [rng.randint(-512, 512) / 1024.0 for _ in range(dim)]
        for _ in range(nv)
    ]
    et = pa.table(
        {
            "vec_id": pa.array(range(nv), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(
                [rng.randint(0, 4) for _ in range(nv)], pa.int32()
            ),
        }
    )
    pq.write_table(et, os.path.join(out_dir, "embeddings.parquet"))


def run_seed(seed: int) -> list[str]:
    rng = random.Random(seed)
    d = tempfile.mkdtemp(prefix=f"textfuzz-{seed}-")
    fails: list[str] = []
    try:
        gen_corpus(rng, d)
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'"
        )
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{d}/embeddings.parquet'"
        )
        for op in OPS + EMB_OPS:
            got = qs[op](d)
            want = con.sql(sqls[op]).df()
            g = canon(
                got.to_pandas() if hasattr(got, "to_pandas") else got
            )
            w = canon(want)
            if len(g) != len(w):
                fails.append(f"{op}: rows {len(g)} != {len(w)}")
                continue
            g2 = g.reset_index(drop=True).astype(str)
            w2 = w.reset_index(drop=True).astype(str)
            if not g2.equals(w2):
                bad = (g2 != w2).any(axis=1)
                fails.append(
                    f"{op}: {int(bad.sum())} mismatched rows, first:\n"
                    f"  ray   {g2[bad].head(2).to_dict('records')}\n"
                    f"  oracle{w2[bad].head(2).to_dict('records')}"
                )
        con.close()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return fails


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_bad = 0
    for seed in range(lo, hi):
        fails = run_seed(seed)
        if fails:
            n_bad += 1
            print(f"seed {seed}: FAIL")
            for f in fails:
                print("  " + f)
        else:
            print(f"seed {seed}: OK")
    print(f"{'ALL OK' if not n_bad else f'{n_bad} BAD SEEDS'} "
          f"({hi - lo} seeds x {len(OPS) + len(EMB_OPS)} ops)")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
