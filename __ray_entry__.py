"""Driver contract for the graft builder (Ray Data target).

``queries()`` entries run the REAL CDC engine (snapshot + txn
consolidation + LWW merge + manifest) over a workload derived
deterministically from the driver's parquet tables (see
``logminer_kafka_connect_ray/workload.py``), so the DuckDB
``oracle_sql()`` comparison is an end-to-end correctness gate.

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/shutdown() here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------------------
# Shared SQL fragments: the workload derivation (MUST mirror
# logminer_kafka_connect_ray/workload.py constants)
# ---------------------------------------------------------------------------
_BASE_CTE = """
base AS (
  SELECT 'https://site' || (doc_id % 20)::VARCHAR || '.example/d/' || doc_id::VARCHAR AS url,
         TIMESTAMP '2024-01-01' + doc_id * INTERVAL 1 SECOND AS warc_ts,
         encode('<html><body>' || text || '</body></html>') AS html,
         text, lang
  FROM documents
)
"""

_CH_CTE = """
n AS (SELECT count(*) AS n_docs FROM documents),
ch AS (
  SELECT e.event_id AS eid,
         2000 + e.event_id * 2 AS scn,
         e.event_id // 5 AS tx,
         CASE e.event_type WHEN 'error' THEN 'd'
                           WHEN 'signup' THEN 'i'
                           ELSE 'u' END AS op,
         e.event_type AS etype,
         'https://site' || ((e.user_id % n.n_docs) % 20)::VARCHAR
             || '.example/d/' || (e.user_id % n.n_docs)::VARCHAR AS url,
         e.ts
  FROM events e CROSS JOIN n
),
comm AS (
  SELECT ch.*, 2000 + (tx*5 + 4)*2 + 1 AS cscn
  FROM ch WHERE tx % 11 <> 7
)
"""

_FINAL_STATE_SQL = f"""
WITH {_BASE_CTE.strip().rstrip()},
{_CH_CTE.strip()},
seq AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY cscn, scn) AS rn
  FROM comm
),
b AS (
  SELECT url, coalesce(max(CASE WHEN op IN ('i','d') THEN rn END), 0) AS brn
  FROM seq GROUP BY url
),
j AS (SELECT s.*, b.brn FROM seq s JOIN b USING (url)),
agg AS (
  SELECT url,
    any_value(brn) AS brn,
    bool_or(op = 'd' AND rn = brn) AS b_is_del,
    bool_or(op = 'u' AND rn > brn) AS has_overlay,
    arg_max(CASE WHEN op = 'i' THEN 'signup:' || eid::VARCHAR
                 ELSE 'u:' || eid::VARCHAR END, rn)
      FILTER (WHERE rn >= brn AND (op = 'i' OR etype IN ('click','view'))) AS text_v,
    count(*) FILTER (WHERE rn >= brn AND (op = 'i' OR etype IN ('click','view'))) AS text_n,
    arg_max(CASE WHEN op = 'i' THEN 'xx' || (eid % 5)::VARCHAR
                 ELSE 'p' || (eid % 5)::VARCHAR END, rn)
      FILTER (WHERE rn >= brn AND (op = 'i' OR etype = 'purchase')) AS lang_v,
    count(*) FILTER (WHERE rn >= brn AND (op = 'i' OR etype = 'purchase')) AS lang_n,
    arg_max(ts, rn) FILTER (WHERE rn >= brn AND op = 'i') AS warc_v,
    count(*) FILTER (WHERE rn >= brn AND op = 'i') AS i_n,
    arg_max(encode('<html><body>signup:' || eid::VARCHAR || '</body></html>'), rn)
      FILTER (WHERE rn >= brn AND op = 'i') AS html_v
  FROM j GROUP BY url
),
merged AS (
  SELECT coalesce(a.url, base.url) AS url,
    CASE WHEN a.url IS NULL THEN base.warc_ts
         WHEN a.i_n > 0 THEN a.warc_v
         WHEN a.brn = 0 THEN base.warc_ts END AS warc_ts,
    CASE WHEN a.url IS NULL THEN base.html
         WHEN a.i_n > 0 THEN a.html_v
         WHEN a.brn = 0 THEN base.html END AS html,
    CASE WHEN a.url IS NULL THEN base.text
         WHEN a.text_n > 0 THEN a.text_v
         WHEN a.brn = 0 THEN base.text END AS text,
    CASE WHEN a.url IS NULL THEN base.lang
         WHEN a.lang_n > 0 THEN a.lang_v
         WHEN a.brn = 0 THEN base.lang END AS lang,
    CASE WHEN a.url IS NOT NULL AND a.b_is_del AND NOT a.has_overlay
         THEN 1 ELSE 0 END AS deleted
  FROM agg a FULL OUTER JOIN base ON a.url = base.url
)
SELECT url, warc_ts, md5(html::VARCHAR) AS html_md5, text, lang
FROM merged WHERE deleted = 0 ORDER BY url
"""

_SNAPSHOT_SQL = (
    f"WITH {_BASE_CTE.strip()} "
    "SELECT url, warc_ts, md5(html::VARCHAR) AS html_md5, text, lang "
    "FROM base ORDER BY url"
)

_COMMITTED_SQL = f"""
WITH {_CH_CTE.strip()}
SELECT op, count(*) AS n_events FROM comm GROUP BY op ORDER BY op
"""

_DISCARDED_SQL = f"""
WITH {_CH_CTE.strip()}
SELECT count(*) AS n_discarded FROM ch WHERE tx % 11 = 7
"""

_SCN_RANGE_SQL = f"""
WITH {_CH_CTE.strip()}
SELECT count(*) AS n_rows, min(scn) AS min_scn, max(scn) AS max_scn
FROM ch WHERE scn > 4000 AND scn <= 14000
"""

_ENVELOPE_SQL = f"""
WITH {_CH_CTE.strip()},
k AS (
  SELECT op AS kind FROM comm
  UNION ALL
  SELECT 'tombstone' AS kind FROM comm WHERE op = 'd'
)
SELECT kind, count(*) AS n_records FROM k GROUP BY kind ORDER BY kind
"""

_LWW_SQL = f"""
WITH {_CH_CTE.strip()}
SELECT url, cscn AS last_commit_scn, scn AS last_scn, op AS last_op
FROM comm
QUALIFY row_number() OVER (PARTITION BY url ORDER BY cscn DESC, scn DESC) = 1
ORDER BY url
"""


# ---------------------------------------------------------------------------
# Data-ops oracles (documents / embeddings tables)
# ---------------------------------------------------------------------------
_DEDUP_EXACT_SQL = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1 ORDER BY doc_id
"""

_TEXT_QUALITY_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       length(regexp_extract_all(text, '\\S+')) AS n_tokens,
       length(regexp_extract_all(text, '[A-Za-z]'))::DOUBLE
           / greatest(length(text), 1) AS alpha_ratio,
       length(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE
           / greatest(length(text), 1) AS punct_ratio,
       length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+'))
           AS bpeish_tokens
FROM documents ORDER BY doc_id
"""

_ANN_SQL = """
SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS sim_r
FROM embeddings q, embeddings c
WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
QUALIFY row_number() OVER (PARTITION BY q.vec_id
    ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
             c.vec_id) <= 10
ORDER BY query_id, sim_r DESC, vec_id
"""


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full CDC replay."""
    from logminer_kafka_connect_ray.pipelines import queries as q

    return q.cdc_final_state("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from logminer_kafka_connect_ray.pipelines import dataops as d
    from logminer_kafka_connect_ray.pipelines import queries as q

    return {
        # CDC engine (SURVEY.md section 2: S1-S5, M1-M9, T1-T3, J3,
        # A1-A4, O1-O4, D1-D3)
        "cdc_final_state": q.cdc_final_state,
        "cdc_final_state_redo_sql": q.cdc_final_state_redo_sql,
        "cdc_snapshot_state": q.cdc_snapshot_state,
        "cdc_committed_events": q.cdc_committed_events,
        "cdc_rolled_back_events": q.cdc_open_or_rolled_events,
        "cdc_scn_range_stats": q.cdc_scn_range_stats,
        "cdc_lww_latest": q.cdc_lww_latest,
        "cdc_envelope_counts": q.cdc_envelope_counts,
        # training-data ops (dedup / similarity / text analysis)
        "dedup_exact": d.dedup_exact,
        "dedup_minhash_lsh": d.dedup_minhash_lsh,     # rows-only (LSH)
        "dedup_simhash": d.dedup_simhash,             # rows-only (LSH)
        # tau=0.4: the driver's synthetic embeddings top out at ~0.51
        # pairwise cosine, so the near-dup default (0.95) would be
        # vacuous on this data
        "embedding_near_dup": (lambda sf: d.embedding_near_dup(sf, tau=0.4)),  # rows-only (LSH)
        "ann_cosine_topk": d.ann_cosine_topk,
        "ann_cosine_topk_lsh": d.ann_cosine_topk_lsh,  # rows-only (approx)
        "ann_cosine_topk_ivf": d.ann_cosine_topk_ivf,  # rows-only (approx)
        "text_quality": d.text_quality,
        "lang_id": d.lang_id,                          # rows-only (heuristic)
        "doc_fingerprints": d.doc_fingerprints,        # rows-only (custom hash)
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_final_state": _FINAL_STATE_SQL,
        "cdc_final_state_redo_sql": _FINAL_STATE_SQL,
        "cdc_snapshot_state": _SNAPSHOT_SQL,
        "cdc_committed_events": _COMMITTED_SQL,
        "cdc_rolled_back_events": _DISCARDED_SQL,
        "cdc_scn_range_stats": _SCN_RANGE_SQL,
        "cdc_lww_latest": _LWW_SQL,
        "cdc_envelope_counts": _ENVELOPE_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "text_quality": _TEXT_QUALITY_SQL,
        "ann_cosine_topk": _ANN_SQL,
    }
