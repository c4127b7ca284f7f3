"""Local stand-in for the driver's correctness gate: run each
queries() entry and its oracle_sql() side by side at a given sf and
compare row counts + values (order-insensitive, column-name-sorted).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import duckdb
import pandas as pd

import __ray_entry__ as entrymod

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def to_pandas(x):
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    return pd.DataFrame(x)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Mirror the driver's canonicalizer: sort columns by name, then
    # multi-column sort_values with NO bytes coercion -- a bytearray
    # (DuckDB BLOB) in any column must fail here like it fails there.
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c], utc=True).astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


qs = entrymod.queries()
sqls = entrymod.oracle_sql()
only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
if only:
    unknown = only - set(qs)
    assert not unknown, f"unknown queries: {unknown}"
    qs = {k: v for k, v in qs.items() if k in only}
fails = 0
for name, fn in qs.items():
    try:
        raw = fn(sf_dir)
        # ADVICE r2: star-pair overflow means an "exact kernel" no
        # longer is -- surface it next to the verdict instead of
        # letting a mismatch appear causeless (or an OK be trusted
        # on data where the cap bit).
        ovf = 0
        meta = getattr(getattr(raw, "schema", None), "metadata", None)
        if meta and b"overflow_buckets" in meta:
            ovf = int(meta[b"overflow_buckets"])
        got = canon(to_pandas(raw))
        if ovf:
            print(f"{name}: WARNING {ovf} overflowed bucket(s) star-paired; "
                  "exact-oracle comparison is DEGRADED on this input")
        if name in sqls:
            want = canon(con.sql(sqls[name]).df())
            same_cols = list(got.columns) == list(want.columns)
            same_n = len(got) == len(want)
            same_vals = same_cols and same_n and got.equals(want)
            status = "OK" if same_vals else "MISMATCH"
            if not same_vals:
                fails += 1
            print(f"{name}: {status} rows={len(got)}/{len(want)} cols_match={same_cols}")
            if not same_vals and same_cols and same_n:
                neq = ~((got == want) | (got.isna() & want.isna())).all(axis=1)
                print("  first diffs:")
                print(pd.concat([got[neq].head(3), want[neq].head(3)], keys=["got", "want"]))
            elif not same_cols:
                print("  got cols:", list(got.columns), "want cols:", list(want.columns))
        else:
            print(f"{name}: rows-only check rows={len(got)}")
    except Exception as e:
        fails += 1
        import traceback

        print(f"{name}: ERROR {type(e).__name__}: {e}")
        traceback.print_exc()
ray.shutdown()
sys.exit(1 if fails else 0)
