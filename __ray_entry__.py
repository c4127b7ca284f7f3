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

# Point-lookup gate: the final replayed state filtered to the same
# deterministic probe set Engine.lookup receives (the absent probe key
# simply matches nothing on either side).
# Stats-pruned predicate scan: the Ray side consults per-partition
# host Bloom filters + zonemaps before opening files, then exactly
# filters; the oracle is the full final state filtered by the same
# split_part host contract (Engine.scan's exact filter), so the value
# hash proves pruning never dropped or altered a row.
_PRUNED_SCAN_SQL = f"""
WITH f AS ({_FINAL_STATE_SQL.replace("ORDER BY url", "")})
SELECT f.* FROM f
WHERE split_part(url, '/', 3) IN
      ('site3.example', 'site17.example', 'no-such.example')
ORDER BY url
"""

_POINT_LOOKUP_SQL = f"""
WITH f AS ({_FINAL_STATE_SQL.replace("ORDER BY url", "")}),
nn AS (SELECT count(*) AS nd FROM documents),
probes AS (
  SELECT DISTINCT 'https://site' || (i % 20)::VARCHAR
         || '.example/d/' || i::VARCHAR AS url
  FROM (SELECT unnest([0, 1, 2, 3, nd // 2, nd - 1]) AS i FROM nn)
)
SELECT f.* FROM f JOIN probes USING (url) ORDER BY url
"""

# ADD-COLUMN-WITH-DEFAULT evolution gate: replay the purchase-driven
# `rating` update stream (workload.derive_changelog_evolution --
# txn = purchase-rank // TXN_SIZE, standard rollback pattern, rating
# value = event_id % 100, LWW by event_id since commit/scn order ==
# eid order); rows never touched by a committed update carry the DDL
# default 7 (workload.EVOLUTION_DEFAULT).
_DEFAULT_BACKFILL_SQL = f"""
WITH {_BASE_CTE.strip().rstrip()},
n AS (SELECT count(*) AS n_docs FROM documents),
p AS (
  SELECT event_id AS eid, user_id,
         row_number() OVER (ORDER BY event_id) - 1 AS pidx
  FROM events WHERE event_type = 'purchase'
),
k AS (SELECT eid, user_id FROM p WHERE (pidx // 5) % 11 != 7),
r AS (
  SELECT 'https://site' || ((k.user_id % n.n_docs) % 20)::VARCHAR ||
         '.example/d/' || (k.user_id % n.n_docs)::VARCHAR AS url,
         arg_max(k.eid % 100, k.eid) AS rating
  FROM k, n GROUP BY 1
)
SELECT base.url, base.lang,
       CAST(coalesce(r.rating, 7) AS BIGINT) AS rating
FROM base LEFT JOIN r USING (url)
ORDER BY url
"""

# Mid-stream type-widening gate: committed purchase UPDATEs set
# `views`, int32-typed (eid % 100000) below the txn-aligned halfway
# point H, int64-typed (3e9 + eid, > INT32_MAX) from H on; LWW per
# url = arg_max by eid.  H = (n_purchases // 2 // 5) * 5.
_TYPE_WIDENING_SQL = f"""
WITH {_BASE_CTE.strip().rstrip()},
n AS (SELECT count(*) AS n_docs FROM documents),
p AS (
  SELECT event_id AS eid, user_id,
         row_number() OVER (ORDER BY event_id) - 1 AS pidx
  FROM events WHERE event_type = 'purchase'
),
h AS (SELECT ((count(*) // 2) // 5) * 5 AS hb FROM p),
k AS (SELECT eid, user_id, pidx FROM p WHERE (pidx // 5) % 11 != 7),
r AS (
  SELECT 'https://site' || ((k.user_id % n.n_docs) % 20)::VARCHAR ||
         '.example/d/' || (k.user_id % n.n_docs)::VARCHAR AS url,
         arg_max(CASE WHEN k.pidx < h.hb THEN k.eid % 100000
                      ELSE 3000000000 + k.eid END, k.eid) AS views
  FROM k, n, h GROUP BY 1
)
SELECT base.url, base.lang, CAST(r.views AS BIGINT) AS views
FROM base LEFT JOIN r USING (url)
ORDER BY url
"""

# GDPR erasure gate: the replay oracle minus the erased urls (doc_ids
# 3, 17, 123 -- queries.GDPR_ERASE_DOC_IDS; url pattern from
# workload._urls).  Keys absent at a given scale factor erase as
# no-ops on both sides.
_GDPR_SQL = f"""
SELECT * FROM ({_FINAL_STATE_SQL.replace("ORDER BY url", "")})
WHERE url NOT IN ('https://site3.example/d/3',
                  'https://site17.example/d/17',
                  'https://site3.example/d/123')
ORDER BY url
"""

# Materialized-view gate: the maintained per-lang aggregate must equal
# the same aggregate recomputed over the fully replayed final state.
_VIEW_LANG_SQL = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(length(text)), 0) AS BIGINT) AS sum_text_chars
FROM ({_FINAL_STATE_SQL.replace("ORDER BY url", "")})
GROUP BY lang ORDER BY lang
"""

# Lake-analytics gate: per-host stats over the replayed final state
# (the 'query the table you built' consumer path).
_HOST_STATS_SQL = f"""
SELECT split_part(url, '/', 3) AS host,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(COALESCE(SUM(length(text)), 0) AS BIGINT) AS sum_text_chars,
       max(warc_ts) AS max_warc_ts
FROM ({_FINAL_STATE_SQL.replace("ORDER BY url", "")})
GROUP BY host ORDER BY host
"""

# SCD Type-2 gate: per-url version intervals in COMMIT order.  The
# base snapshot row (op='r', scn 1999 = workload.SNAPSHOT_SCN) is
# version 1; every committed i/u/d appends one; valid_to = next
# version's valid_from (NULL = current).
_SCD2_SQL = f"""
WITH {_BASE_CTE.strip()},
{_CH_CTE.strip()},
vers AS (
  SELECT url, 'r' AS op, 1999 AS vscn, 1999 AS o1 FROM base
  UNION ALL
  SELECT url, op, scn AS vscn, cscn AS o1 FROM comm
)
SELECT url, CAST(row_number() OVER w AS BIGINT) AS ver, op,
       CAST(vscn AS BIGINT) AS valid_from_scn,
       CAST(lead(vscn) OVER w AS BIGINT) AS valid_to_scn
FROM vers
WINDOW w AS (PARTITION BY url ORDER BY o1, vscn)
ORDER BY url, ver
"""

# Point-in-time (AS OF) lookup against the SCD2 history: per probe
# SCN, each url's version valid at that SCN (interval containment
# over the same version relation as _SCD2_SQL).
_PIT_SQL = f"""
WITH {_BASE_CTE.strip()},
{_CH_CTE.strip()},
vers AS (
  SELECT url, 'r' AS op, 1999 AS vscn, 1999 AS o1 FROM base
  UNION ALL
  SELECT url, op, scn AS vscn, cscn AS o1 FROM comm
),
iv AS (
  SELECT url, CAST(row_number() OVER w AS BIGINT) AS ver, op,
         CAST(vscn AS BIGINT) AS vfrom,
         CAST(lead(vscn) OVER w AS BIGINT) AS vto
  FROM vers
  WINDOW w AS (PARTITION BY url ORDER BY o1, vscn)
),
probes AS (
  SELECT unnest([2000 + ne // 2, 2000 + ne, 2000 + 2 * ne]) AS s
  FROM (SELECT count(*) AS ne FROM events)
)
SELECT iv.url, CAST(p.s AS BIGINT) AS asof_scn, iv.ver, iv.op
FROM probes p
JOIN iv ON iv.vfrom <= p.s AND (iv.vto IS NULL OR p.s < iv.vto)
ORDER BY iv.url, asof_scn
"""

# Dead-letter accounting gate: the corrupt changelog nulls the key of
# every 101st change event (workload.derive_changelog_corrupt); each
# such row must appear in dead_letters exactly once as missing_key.
# Routing runs at decode, before commit resolution, so rolled-back
# txns' corrupt rows count too -- hence ch, not comm.
_DEAD_LETTERS_SQL = f"""
WITH {_CH_CTE.strip()}
SELECT 'missing_key' AS reason, CAST(count(*) AS BIGINT) AS n
FROM ch WHERE eid % 101 = 0
"""

# Lake reconciliation gate: urls whose row changed between the
# snapshot (lake version 1) and the replayed head, classified.
_LAKE_DIFF_SQL = f"""
WITH {_BASE_CTE.strip()},
b AS (
  SELECT url, warc_ts, md5(html::VARCHAR) AS html_md5, text, lang FROM base
),
f AS ({_FINAL_STATE_SQL.replace("ORDER BY url", "")})
SELECT COALESCE(b.url, f.url) AS url,
       CASE WHEN b.url IS NULL THEN 'added'
            WHEN f.url IS NULL THEN 'removed'
            ELSE 'modified' END AS change
FROM b FULL OUTER JOIN f ON b.url = f.url
WHERE b.url IS NULL OR f.url IS NULL
   OR b.warc_ts IS DISTINCT FROM f.warc_ts
   OR b.html_md5 IS DISTINCT FROM f.html_md5
   OR b.text IS DISTINCT FROM f.text
   OR b.lang IS DISTINCT FROM f.lang
ORDER BY url, change
"""

# SMT gate: the engine-side transform uppercases event-derived lang
# values (a_lang/b_lang) before merge; base rows are untouched.  The
# oracle restates that by uppercasing the event-derived lang literals.
_FINAL_STATE_TRANSFORM_SQL = _FINAL_STATE_SQL.replace(
    "THEN 'xx' || (eid % 5)::VARCHAR", "THEN 'XX' || (eid % 5)::VARCHAR"
).replace(
    "ELSE 'p' || (eid % 5)::VARCHAR", "ELSE 'P' || (eid % 5)::VARCHAR"
)
assert _FINAL_STATE_TRANSFORM_SQL != _FINAL_STATE_SQL

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

# Per-url revision churn in commit order; has_text mirrors the
# decoder's a_text validity (set on INSERT and click/view UPDATEs,
# null on DELETE and lang-only UPDATEs).
_URL_CHURN_SQL = f"""
WITH {_CH_CTE.strip()},
g AS (
  SELECT url, scn,
         (op = 'i' OR etype IN ('click', 'view')) AS has_text,
         scn - lag(scn) OVER (PARTITION BY url ORDER BY cscn, scn) AS gap
  FROM comm
)
SELECT url,
       count(*)::BIGINT AS n_committed,
       (count(*) FILTER (WHERE has_text))::BIGINT AS n_text_revs,
       min(scn)::BIGINT AS first_scn,
       max(scn)::BIGINT AS last_scn,
       max(gap)::BIGINT AS max_scn_gap
FROM g GROUP BY url ORDER BY url
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

# Incremental cross-snapshot dedup: the 'new crawl' (doc_id % 3 == 0
# plus planted re-crawls of old docs with doc_id % 97 == 1, re-ingested
# as 10_000_000 + doc_id) deduped against the 'old corpus'
# (doc_id % 3 != 0) on exact text equality.  The planted rows guarantee
# cross-corpus duplicates at every scale.
_DEDUP_INCR_SQL = """
WITH old AS (
  SELECT text FROM documents WHERE doc_id % 3 <> 0
),
newc AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 10000000 + doc_id AS doc_id, text FROM documents
  WHERE doc_id % 3 <> 0 AND doc_id % 97 = 1
)
SELECT n.doc_id AS doc_id FROM newc n
WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.text = n.text)
ORDER BY doc_id
"""

# Line-level exact dedup gate (C4/RefinedWeb): an occurrence is kept
# iff it is the globally first occurrence of that exact line by
# (doc_id, ordinal); per-doc totals.
_LINE_DEDUP_SQL = """
WITH l AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS ord
  FROM documents
),
r AS (
  SELECT doc_id, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, ord) AS rn
  FROM l
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(length(line)) FILTER (WHERE rn = 1), 0) AS BIGINT)
           AS kept_chars
FROM r GROUP BY doc_id ORDER BY doc_id
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


_NGRAM_JACCARD_SQL = """
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 5 THEN array_to_string(w[s.i:s.i+4], ' ')
              ELSE array_to_string(w, ' ') END AS gram
  FROM words, LATERAL unnest(generate_series(1,
       CASE WHEN len(w) >= 5 THEN len(w) - 4 ELSE 1 END)) AS s(i)
  WHERE len(w) > 0
),
gd AS (SELECT DISTINCT doc_id, gram FROM g),
sz AS (SELECT doc_id, count(*) AS n FROM gd GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM gd a JOIN gd b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(i.i::DOUBLE / (sa.n + sb.n - i.i), 6) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.doc_a
JOIN sz sb ON sb.doc_id = i.doc_b
WHERE i.i::DOUBLE / (sa.n + sb.n - i.i) >= 0.7
ORDER BY doc_a, doc_b
"""

_WORD_FREQ_SQL = """
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
)
SELECT word, count(*) AS n FROM w GROUP BY word
ORDER BY n DESC, word LIMIT 50
"""

# Gopher-style repetition signals: integer counts only (the caller
# derives dup/top fractions with one division); bigrams via DuckDB
# list lambdas, unigrams via the shared token CTE.
_DOC_REPETITION_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
),
per AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word),
uni AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS top_token_n
  FROM per GROUP BY doc_id
),
bl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id,
         list_transform(range(1, len(ws)), i -> ws[i] || chr(0) || ws[i+1])
           AS bigrams
  FROM bl WHERE len(ws) > 0
)
SELECT u.doc_id, u.n_tokens, u.n_distinct, u.top_token_n,
       CAST(len(b.bigrams) AS BIGINT) AS n_bigrams,
       CAST(len(list_distinct(b.bigrams)) AS BIGINT) AS n_distinct_bigrams
FROM uni u JOIN bg b USING (doc_id)
ORDER BY u.doc_id
"""

# Unigram LM scoring (CCNet-style quality filter): per-word
# log-probabilities quantized to integer micro-nats with ONE double op
# per DISTINCT word -- floor(1e6 * ln(n_w / n_total)) -- identically
# on both sides, then integer-summed per document, so the comparison
# carries no float-summation-order risk.
_DOC_LM_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
),
freq AS (SELECT word, count(*) AS n FROM tok GROUP BY word),
tot AS (SELECT count(*) AS total FROM tok),
lp AS (
  SELECT f.word,
         CAST(floor(1e6 * ln(f.n::DOUBLE / t.total)) AS BIGINT) AS lp_micro
  FROM freq f, tot t
)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(lp.lp_micro) AS BIGINT) AS sum_lp_micro
FROM tok JOIN lp USING (word)
GROUP BY tok.doc_id
ORDER BY tok.doc_id
"""

# Sink-variant digest: same per-doc model, outer GROUP BY doc_id % 64
# -- the Ray side computes this by reading back the partitioned
# parquet it just wrote, so the oracle certifies the on-disk rows.
_DOC_LM_SINK_SQL = f"""
WITH scored AS ({_DOC_LM_SQL})
SELECT CAST(doc_id % 64 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_n_tokens,
       CAST(sum(sum_lp_micro) AS BIGINT) AS sum_lp_micro
FROM scored GROUP BY bucket ORDER BY bucket
"""

# DSIR importance selection (Xie et al. 2023): target model p = the
# lang='en' slice, raw model q = the whole corpus, unigram+bigram
# features with add-one smoothing over the joint feature space; each
# model's log-prob is quantized to integer micro-nats per DISTINCT
# feature (the _DOC_LM_SQL device), so the per-document importance
# weight sum is pure int64 on both sides.  Top-100 by (score desc,
# doc_id) -- output-bounded.
_DSIR_SQL = """
WITH base AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
uni AS (SELECT doc_id, lang, unnest(ws) AS feat FROM base),
big AS (
  SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS feat
  FROM base CROSS JOIN (
    SELECT unnest(range(1, 100000))::BIGINT AS i
  ) u
  WHERE i + 1 <= len(ws)
),
feats AS (
  SELECT * FROM uni UNION ALL SELECT * FROM big
),
cnt AS (
  SELECT feat,
         count(*) FILTER (WHERE lang = 'en') AS n_t,
         count(*) AS n_r
  FROM feats GROUP BY feat
),
tot AS (
  SELECT sum(n_t) AS t_t, sum(n_r) AS t_r, count(*) AS v FROM cnt
),
delta AS (
  SELECT feat,
         CAST(floor(1e6 * ln((c.n_t + 1)::DOUBLE / (t.t_t + t.v)))
              AS BIGINT)
         - CAST(floor(1e6 * ln((c.n_r + 1)::DOUBLE / (t.t_r + t.v)))
                AS BIGINT) AS d
  FROM cnt c, tot t
),
score AS (
  SELECT f.doc_id, any_value(f.lang) AS lang,
         CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(d.d) AS BIGINT) AS score_micro
  FROM feats f JOIN delta d USING (feat)
  GROUP BY f.doc_id
)
SELECT doc_id, lang, n_feats, score_micro
FROM score ORDER BY score_micro DESC, doc_id LIMIT 100
"""

# Benchmark 8-gram decontamination: docs with doc_id % 97 == 0 stand
# in for the held-out benchmark; any other doc sharing a distinct
# word 8-gram with it is flagged.  The corpus draws tokens at random
# (natural 8-gram collisions ~impossible), so one provably
# contaminated doc per benchmark doc is planted identically on both
# sides ('qq qq ' + first-8-gram + ' qq' at 10_000_000 + doc_id);
# each must return n_hit = 1.
_DECONTAM_SQL = """
WITH real_toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
planted AS (
  SELECT 10000000 + doc_id AS doc_id,
         regexp_extract_all(
           'qq qq ' || array_to_string(ws[1:8], ' ') || ' qq',
           '[a-z0-9]+') AS ws
  FROM real_toks WHERE doc_id % 97 = 0 AND len(ws) >= 8
),
toks AS (
  SELECT * FROM real_toks UNION ALL SELECT * FROM planted
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i + 7], ' ') AS gram
  FROM toks CROSS JOIN (
    SELECT unnest(range(1, 100000))::BIGINT AS i
  ) u
  WHERE i + 7 <= len(ws)
),
bench AS (
  SELECT DISTINCT gram FROM grams
  WHERE doc_id % 97 = 0 AND doc_id < 10000000
)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hit
FROM grams g JOIN bench b USING (gram)
WHERE NOT (g.doc_id % 97 = 0 AND g.doc_id < 10000000)
GROUP BY g.doc_id
ORDER BY g.doc_id
"""

# Exact-substring dedup as a transform (Lee et al. 2022 removal
# step): every occurrence of a corpus-duplicated word 8-gram except
# the globally (doc_id, pos)-first is masked; a masked occurrence at
# position i covers words i..i+7, covers union per doc.
_DUP_SPAN_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT w.doc_id, r.i AS i, array_to_string(ws[r.i:r.i+7], ' ') AS gram
  FROM w CROSS JOIN (SELECT unnest(range(1, 100000))::BIGINT AS i) r
  WHERE r.i + 7 <= len(ws)
),
ranked AS (
  SELECT doc_id, i,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn,
         count(*)    OVER (PARTITION BY gram) AS cnt
  FROM g
),
cover AS (
  SELECT DISTINCT doc_id, i + u.j AS p
  FROM ranked CROSS JOIN (SELECT unnest(range(0, 8))::BIGINT AS j) u
  WHERE cnt >= 2 AND rn > 1
),
agg AS (SELECT doc_id, count(*) AS n_masked FROM cover GROUP BY doc_id)
SELECT w.doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(COALESCE(a.n_masked, 0) AS BIGINT) AS n_masked,
       CAST(len(ws) - COALESCE(a.n_masked, 0) AS BIGINT) AS n_kept
FROM w LEFT JOIN agg a USING (doc_id)
ORDER BY w.doc_id
"""

# Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
# rule): per-word FNV-1a (the _SIMHASH_SQL recursive byte fold,
# vocab-bounded), polynomial word-4-gram hashes mod 2^64 with the
# engine's golden-ratio power constants inlined as literals, window
# minima of w=5 consecutive gram hashes per doc (short docs with
# 1..4 grams keep one whole-doc minimum), then per-doc distinct
# fingerprint and shared-fingerprint counts.  All arithmetic is
# UHUGEINT % 2^64 == numpy uint64 wraparound, so the match is exact.
_WINNOW_SQL = """
WITH RECURSIVE w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
vocab AS (SELECT DISTINCT unnest(ws) AS word FROM w),
vb AS (SELECT word, hex(encode(word)) AS hx,
              octet_length(encode(word)) AS n FROM vocab),
fnv AS (
  SELECT word, n, 0 AS i,
         CAST('14695981039346656037' AS UHUGEINT) AS h FROM vb
  UNION ALL
  SELECT f.word, f.n, f.i + 1,
         (xor(f.h, CAST(CAST('0x' || substr(vb.hx, 2*f.i+1, 2) AS INT)
                        AS UHUGEINT))
          * CAST(1099511628211 AS UHUGEINT))
           % CAST('18446744073709551616' AS UHUGEINT)
  FROM fnv f JOIN vb ON vb.word = f.word WHERE f.i < f.n
),
wh AS (SELECT word, h FROM fnv WHERE i = n),
pos AS (
  SELECT w.doc_id, r.i, ws[r.i] AS word, len(ws) AS m
  FROM w CROSS JOIN (SELECT unnest(range(1, 100000))::BIGINT AS i) r
  WHERE r.i <= len(ws)
),
harr AS (
  SELECT p.doc_id, any_value(p.m) AS m, list(wh.h ORDER BY p.i) AS hs
  FROM pos p JOIN wh USING (word) GROUP BY p.doc_id
),
grams AS (
  SELECT doc_id, r.i, m - 3 AS n_g,
         CAST((  (hs[r.i]   * CAST('6938460308862072877'  AS UHUGEINT))
                 % CAST('18446744073709551616' AS UHUGEINT)
               + (hs[r.i+1] * CAST('16088033396387240377' AS UHUGEINT))
                 % CAST('18446744073709551616' AS UHUGEINT)
               + (hs[r.i+2] * CAST('11400714819323198485' AS UHUGEINT))
                 % CAST('18446744073709551616' AS UHUGEINT)
               + hs[r.i+3]
              ) % CAST('18446744073709551616' AS UHUGEINT) AS UBIGINT)
           AS gh
  FROM harr CROSS JOIN (SELECT unnest(range(1, 100000))::BIGINT AS i) r
  WHERE r.i + 3 <= m
),
wins AS (
  SELECT doc_id, i, n_g,
         min(gh) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
  FROM grams
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM wins
  WHERE i <= greatest(n_g - 4, 1)
),
sh AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) >= 2),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
         CAST(count(*) FILTER (WHERE fp IN (SELECT fp FROM sh))
              AS BIGINT) AS n_shared
  FROM fps GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(greatest(len(ws) - 3, 0) AS BIGINT) AS n_grams,
       COALESCE(a.n_fp, 0) AS n_fp,
       COALESCE(a.n_shared, 0) AS n_shared
FROM w LEFT JOIN agg a USING (doc_id)
ORDER BY w.doc_id
"""

# Connected components over the exact near-dup pair graph via
# recursive transitive closure; canonical = min reachable doc_id.
_CLUSTER_SQL = f"""
WITH RECURSIVE p AS (
  SELECT doc_a, doc_b FROM ({_NGRAM_JACCARD_SQL.replace("ORDER BY doc_a, doc_b", "")})
),
e AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u
)
SELECT u AS doc_id, least(u, min(v)) AS canonical_id
FROM reach GROUP BY u ORDER BY doc_id
"""

_LANG_ID_SQL = """
WITH m AS (
  SELECT * FROM (VALUES
    ('en', 'the and of to in is you that it for was with are have this'),
    ('de', 'der die und das ist nicht ich ein mit sich auf für den von'),
    ('fr', 'le la les et des est une pour que dans qui pas sur vous'),
    ('es', 'el la los las y de que en un una es por para con del'),
    ('it', 'il la che di e un una per non sono con del alla più')
  ) AS t(lang, ws)
),
mk AS (SELECT lang, unnest(string_split(ws, ' ')) AS word FROM m),
w AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_extract_all(lower(text), '[a-zà-ÿ]+'))) AS word
  FROM documents
),
hits AS (
  SELECT w.doc_id, mk.lang, count(*) AS c
  FROM w JOIN mk USING (word) GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rn
  FROM hits WHERE c > 0
)
SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
ORDER BY d.doc_id
"""

# SimHash in SQL: fnv1a per distinct word (recursive byte fold with
# 128-bit modular arithmetic), sign-summed bits, then ALL pairs with
# Hamming <= 3.  The Ray path's 4-segment LSH is LOSSLESS for
# max_hamming=3 (pigeonhole: <= 3 differing bits leave at least one
# 16-bit segment identical), so exact SQL is a valid oracle.
_SIMHASH_SQL = """
WITH RECURSIVE w AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS word
  FROM documents
),
wb AS (SELECT doc_id, word, hex(encode(word)) AS hx,
              octet_length(encode(word)) AS n FROM w),
fnv AS (
  SELECT doc_id, word, n, 0 AS i,
         CAST('14695981039346656037' AS UHUGEINT) AS h FROM wb
  UNION ALL
  SELECT f.doc_id, f.word, f.n, f.i + 1,
         (xor(f.h, CAST(CAST('0x' || substr(wb.hx, 2*f.i+1, 2) AS INT)
                        AS UHUGEINT))
          * CAST(1099511628211 AS UHUGEINT))
           % CAST('18446744073709551616' AS UHUGEINT)
  FROM fnv f JOIN wb ON wb.doc_id = f.doc_id AND wb.word = f.word
  WHERE f.i < f.n
),
wh AS (
  SELECT doc_id,
         CAST(h % CAST('18446744073709551616' AS UHUGEINT) AS UBIGINT) AS h
  FROM fnv WHERE i = n
),
pw2(j, p) AS (
  SELECT 0, CAST(1 AS UBIGINT) UNION ALL SELECT j+1, p*2 FROM pw2 WHERE j < 63
),
bits AS (
  SELECT wh.doc_id, pw2.j,
         sum(CASE WHEN (wh.h >> pw2.j) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM wh, pw2 GROUP BY 1, 2
),
sh0 AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0
             THEN (SELECT p FROM pw2 WHERE pw2.j = bits.j)
             ELSE 0 END)::UBIGINT AS simhash
  FROM bits GROUP BY doc_id
),
sh AS (
  SELECT d.doc_id, coalesce(s.simhash, CAST(0 AS UBIGINT)) AS simhash
  FROM documents d LEFT JOIN sh0 s ON s.doc_id = d.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""

# rolling polynomial hash h = fold(h*B + byte) mod 2^64 restated as a
# power sum: h = seed*B^n + sum(byte_i * B^(n-i)) mod 2^64, with the
# B^k table from a tiny recursive CTE and 128-bit modular arithmetic.
_FPM = "CAST('18446744073709551616' AS HUGEINT)"
_FPMU = "CAST('18446744073709551616' AS UHUGEINT)"
_FINGERPRINT_SQL = f"""
WITH RECURSIVE pw(k, p) AS (
  SELECT 0, CAST(1 AS UHUGEINT)
  UNION ALL
  SELECT k+1, (p * CAST(1000003 AS UHUGEINT)) % {_FPMU}
  FROM pw WHERE k < (SELECT coalesce(max(octet_length(encode(text))), 0)
                     FROM documents)
),
b AS (
  SELECT doc_id, s.i AS i, octet_length(encode(text)) AS n,
         CAST(CAST('0x' || substr(hex(encode(text)), 2*s.i-1, 2) AS INT)
              AS UHUGEINT) AS byte
  FROM documents,
       LATERAL unnest(generate_series(1, octet_length(encode(text)))) AS s(i)
),
acc AS (
  SELECT b.doc_id, any_value(b.n) AS n,
         sum(CAST((b.byte * pw.p) % {_FPMU} AS HUGEINT)) % {_FPM} AS tail
  FROM b JOIN pw ON pw.k = b.n - b.i
  GROUP BY b.doc_id
),
fp AS (
  SELECT d.doc_id,
         (CAST((CAST('14695981039346656037' AS UHUGEINT)
            * (SELECT p FROM pw WHERE k = coalesce(a.n, 0))) % {_FPMU}
               AS HUGEINT)
          + coalesce(a.tail, CAST(0 AS HUGEINT))) % {_FPM} AS v
  FROM documents d LEFT JOIN acc a ON a.doc_id = d.doc_id
)
SELECT doc_id,
  CAST(CASE WHEN v >= CAST('9223372036854775808' AS HUGEINT)
       THEN v - {_FPM} ELSE v END AS BIGINT) AS fingerprint
FROM fp ORDER BY doc_id
"""


_EMBED_EXACT_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS sim_r
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= 0.4
ORDER BY vec_a, vec_b
"""

# Planted-fixture oracles for the approximate paths (VERDICT r2 #2).
# The Ray queries union the embeddings with power-of-two scalar
# multiples of planted rows: exact float scaling means bit-identical
# direction, hence identical hyperplane signs in EVERY LSH band and
# identical nearest-centroid assignment in IVF -- recall of the
# planted structure is provable, not probabilistic, so the expected
# output is pure SQL.  (dataops._planted_neighbor_rows /
# embedding_near_dup(plant_copies=True) document the derivation.)
_ANN_PLANTED_SQL = """
SELECT q.vec_id AS query_id,
       10000000 + q.vec_id * 16 + s.j AS vec_id,
       CAST(1.0 AS DOUBLE) AS sim_r
FROM embeddings q, LATERAL unnest(generate_series(0, 9)) AS s(j)
WHERE q.vec_id < 5
ORDER BY query_id, vec_id
"""

# The near-dup oracle RECOMPUTES the exact all-pairs sweep over the
# same derived table (original + x2 copies of vec_id % 7 = 0), so if
# the planted assumption (no natural pair >= tau) ever broke on new
# driver data, the gate would fail loudly instead of silently trusting
# the LSH.
_EMBED_ND_PLANTED_SQL = """
WITH derived AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT 10000000 + vec_id AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x * 2.0) AS e
  FROM embeddings WHERE vec_id % 7 = 0
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS sim_r
FROM derived a JOIN derived b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.95
ORDER BY vec_a, vec_b
"""

_SUPPLIERS_SQL = """
SELECT 'https://sup.example/s/' || s_suppkey::VARCHAR AS url,
       TIMESTAMP '2024-01-01' + s_suppkey * INTERVAL 1 SECOND AS warc_ts,
       md5('<html><body>' || s_name || '</body></html>') AS html_md5,
       CASE WHEN s_suppkey % 3 = 0 THEN 'sup:' || s_suppkey::VARCHAR
            ELSE s_name END AS text,
       'xx' AS lang
FROM supplier ORDER BY url
"""

_MEDIA_SQL = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(16 + doc_id % 48 AS BIGINT) AS width,
       CAST(16 + doc_id % 32 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels,
       CAST(8 AS BIGINT) AS resized_w,
       CAST(8 AS BIGINT) AS resized_h,
       CAST(1 + doc_id % 4 AS BIGINT) AS n_frames,
       CAST((1 + doc_id % 4 + 1) // 2 AS BIGINT) AS n_sampled,
       CAST(16000 AS BIGINT) AS audio_rate,
       CAST(800 + (doc_id % 5) * 200 AS BIGINT) AS audio_n
FROM documents ORDER BY media_id
"""


# Event-time relational operators (pipelines/events.py).  Aggregates
# are integer cents (floor(value*100)) on both sides: float sum order
# differs between engines, integer sums are exact.  CASTs pin DuckDB's
# HUGEINT sum back to the engine's int64.
_SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM o
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM s GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""

_WINDOW_STATS_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

# Left as-of join restated as a merge-union + IGNORE NULLS forward
# fill (deterministic tie-break: at equal ts, events sort before the
# probe -- ts <= o_orderdate is inclusive -- and max event_id wins).
_ASOF_SQL = """
WITH rel AS (
  SELECT user_id AS k, ts AS t, 0 AS probe, event_id AS eid,
         event_type AS etype, NULL::BIGINT AS okey
  FROM events
  UNION ALL
  SELECT o_custkey, o_orderdate, 1, NULL::BIGINT, NULL::VARCHAR, o_orderkey
  FROM orders
), w AS (
  SELECT *,
         last_value(eid IGNORE NULLS) OVER win AS m_eid,
         last_value(CASE WHEN probe = 0 THEN t END IGNORE NULLS) OVER win
           AS m_ts,
         last_value(etype IGNORE NULLS) OVER win AS m_etype
  FROM rel
  WINDOW win AS (PARTITION BY k ORDER BY t, probe, eid
                 ROWS UNBOUNDED PRECEDING)
)
SELECT okey AS o_orderkey, k AS o_custkey, t AS o_orderdate,
       m_eid AS asof_event_id, m_ts AS asof_ts, m_etype AS asof_event_type
FROM w WHERE probe = 1 ORDER BY o_orderkey
"""

_RANGE_JOIN_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(count(e.ts) AS BIGINT) AS n_events_w,
       CAST(coalesce(sum(CAST(floor(e.value * 100) AS BIGINT)), 0) AS BIGINT)
         AS sum_value_cents_w
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >  o.o_orderdate - INTERVAL 24 HOUR
 AND e.ts <= o.o_orderdate
GROUP BY 1, 2, 3 ORDER BY o_orderkey
"""

# End-to-end curation composition: lang filter -> quality filter ->
# exact dedup -> token stats, restated over the same lang-id marker
# CTEs the lang_id oracle uses.
_CURATION_SQL = """
WITH m AS (
  SELECT * FROM (VALUES
    ('en', 'the and of to in is you that it for was with are have this'),
    ('de', 'der die und das ist nicht ich ein mit sich auf für den von'),
    ('fr', 'le la les et des est une pour que dans qui pas sur vous'),
    ('es', 'el la los las y de que en un una es por para con del'),
    ('it', 'il la che di e un una per non sono con del alla più')
  ) AS t(lang, ws)
),
mk AS (SELECT lang, unnest(string_split(ws, ' ')) AS word FROM m),
w AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_extract_all(lower(text), '[a-zà-ÿ]+'))) AS word
  FROM documents
),
hits AS (
  SELECT w.doc_id, mk.lang, count(*) AS c
  FROM w JOIN mk USING (word) GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rn
  FROM hits WHERE c > 0
),
feat AS (
  SELECT d.doc_id, d.text,
         length(regexp_extract_all(d.text, '\\S+')) AS n_tokens,
         length(regexp_extract_all(d.text, '[A-Za-z]'))::DOUBLE
             / greatest(length(d.text), 1) AS alpha_ratio,
         length(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+'))
             AS bpeish_tokens
  FROM documents d JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
  WHERE b.lang = 'en'
),
filt AS (
  SELECT * FROM feat WHERE n_tokens >= 5 AND alpha_ratio >= 0.45
),
ded AS (
  SELECT doc_id, n_tokens, bpeish_tokens,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM filt
)
SELECT doc_id, n_tokens, bpeish_tokens
FROM ded WHERE rn = 1 ORDER BY doc_id
"""

_SLIDING_SQL = """
WITH hop AS (SELECT unnest(range(0, 4)) AS i),
e AS (
  SELECT event_type,
         epoch_us(ts) // 900000000 * 900000000 AS last_w,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
x AS (
  SELECT event_type, last_w - i * 900000000 AS w, cents
  FROM e, hop WHERE last_w - i * 900000000 >= 0
)
SELECT event_type, make_timestamp(w) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_value_cents
FROM x GROUP BY 1, 2 ORDER BY 1, 2
"""

_NATION_ORDER_SQL = """
SELECT CAST(n.n_nationkey AS BIGINT) AS n_nationkey, n.n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1, 2 ORDER BY n_nationkey
"""

# Semi/anti join: LEFT JOIN against the distinct fact keys restates
# the engine's EXISTS-probe (distributed distinct + broadcast bitmap).
_SEMI_ANTI_SQL = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(o.k) AS BIGINT) AS n_with_orders,
       CAST(COUNT(*) - COUNT(o.k) AS BIGINT) AS n_without_orders
FROM customer
LEFT JOIN (SELECT DISTINCT o_custkey AS k FROM orders) o ON o.k = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

# Deterministic hash sample: the recursive CTE folds FNV-1a 64-bit
# over the decimal-string bytes of event_id (same fold the engine's
# vectorized fnv1a_u64 computes), so sample MEMBERSHIP is SQL-exact.
_SAMPLE_HASH_SQL = """
WITH RECURSIVE eb AS (
  SELECT event_id, hex(encode(CAST(event_id AS VARCHAR))) AS hx,
         octet_length(encode(CAST(event_id AS VARCHAR))) AS n
  FROM events
),
fnv AS (
  SELECT event_id, n, 0 AS i,
         CAST('14695981039346656037' AS UHUGEINT) AS h FROM eb
  UNION ALL
  SELECT f.event_id, f.n, f.i + 1,
         (xor(f.h, CAST(CAST('0x' || substr(eb.hx, 2*f.i+1, 2) AS INT)
                        AS UHUGEINT))
          * CAST(1099511628211 AS UHUGEINT))
           % CAST('18446744073709551616' AS UHUGEINT)
  FROM fnv f JOIN eb ON eb.event_id = f.event_id
  WHERE f.i < f.n
)
SELECT e.event_id, e.user_id, e.event_type,
       CAST(floor(e.value * 100) AS BIGINT) AS value_cents
FROM events e JOIN fnv ON fnv.event_id = e.event_id AND fnv.i = fnv.n
WHERE CAST(fnv.h % CAST('18446744073709551616' AS UHUGEINT) AS UBIGINT)
      % 20 = 0
ORDER BY e.event_id
"""

_SET_OPS_SQL = """
WITH e AS (SELECT DISTINCT user_id AS k FROM events),
     o AS (SELECT DISTINCT o_custkey AS k FROM orders),
     j AS (SELECT e.k AS ek, o.k AS ok FROM e FULL OUTER JOIN o ON e.k = o.k)
SELECT CAST(COUNT(CASE WHEN ok IS NULL THEN 1 END) AS BIGINT) AS n_only_events,
       CAST(COUNT(CASE WHEN ek IS NULL THEN 1 END) AS BIGINT) AS n_only_orders,
       CAST(COUNT(CASE WHEN ek IS NOT NULL AND ok IS NOT NULL THEN 1 END)
            AS BIGINT) AS n_both
FROM j
"""

_TYPE_QUANTILES_SQL = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents FROM events
)
SELECT event_type, 0.5 AS q,
       CAST(quantile_disc(cents, 0.5) AS BIGINT) AS value_cents
FROM c GROUP BY event_type
UNION ALL
SELECT event_type, 0.9 AS q,
       CAST(quantile_disc(cents, 0.9) AS BIGINT) AS value_cents
FROM c GROUP BY event_type
ORDER BY event_type, q
"""

_LAG_DELTA_SQL = """
WITH w AS (
  SELECT event_id, user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
         CAST(floor(value * 100) AS BIGINT) - LAG(
             CAST(floor(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS dlt
  FROM events
)
SELECT event_id, user_id,
       CAST(gap_us // 1000000 AS BIGINT) AS gap_seconds,
       CAST(dlt AS BIGINT) AS delta_value_cents
FROM w ORDER BY event_id
"""

# Sink-variant digest of the LAG offsets: SQL sum() skips the
# first-event nulls, matching the Ray digest's null-as-0 partial.
_LAG_DELTA_SINK_SQL = f"""
WITH lg AS ({_LAG_DELTA_SQL})
SELECT CAST(user_id % 64 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(sum(gap_seconds), 0) AS BIGINT) AS sum_gap_seconds,
       CAST(COALESCE(sum(delta_value_cents), 0) AS BIGINT)
         AS sum_delta_cents
FROM lg GROUP BY bucket ORDER BY bucket
"""

_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term
         ) AS rnk
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(rnk AS BIGINT) AS rnk
FROM scored WHERE rnk <= 5
ORDER BY doc_id, rnk
"""

# Word co-occurrence lift (rank-equivalent to PMI, zero float error):
# exact c_ab * N / (df_a * df_b), doc-level sets, df >= 50 vocab.
_WORD_PMI_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
    FROM documents
  )
),
df AS (
  SELECT term, count(*)::BIGINT AS df FROM toks
  GROUP BY 1 HAVING count(*) >= 50
),
n AS (SELECT count(*)::BIGINT AS nd FROM documents),
pairs AS (
  SELECT a.term AS ta, b.term AS tb, count(*)::BIGINT AS c
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND a.term < b.term
  JOIN df da ON da.term = a.term
  JOIN df db ON db.term = b.term
  GROUP BY 1, 2
)
SELECT p.ta AS term_a, p.tb AS term_b, p.c AS n_common,
       da.df AS df_a, db.df AS df_b,
       CAST(1000000 * p.c * n.nd // (da.df * db.df) AS BIGINT) AS lift_e6
FROM pairs p
JOIN df da ON da.term = p.ta
JOIN df db ON db.term = p.tb
CROSS JOIN n
ORDER BY lift_e6 DESC, term_a, term_b
LIMIT 30
"""

# Exact-rational BM25 (k1=1.2, b=0.75; rational idf (N-df+1)/(df+1)):
# every term contribution is floor(1e6 * int-ratio) in HUGEINT, so
# Ray's arbitrary-precision scoring reproduces it bit-for-bit.
_BM25_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*)::HUGEINT AS dl FROM toks GROUP BY 1),
scal AS (
  SELECT (SELECT count(*) FROM documents)::HUGEINT AS n,
         (SELECT count(*) FROM toks)::HUGEINT AS l
),
q(term) AS (VALUES ('query'), ('join'), ('window')),
tf AS (
  SELECT t.doc_id, t.term, count(*)::HUGEINT AS tf
  FROM toks t JOIN q USING (term) GROUP BY 1, 2
),
df AS (SELECT term, count(*)::HUGEINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id,
         (1000000 * (s.n - df.df + 1) * tf.tf * 2200 * s.l)
           // ((df.df + 1) * (1000 * s.l * tf.tf + 300 * s.l
                              + 900 * dl.dl * s.n)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN scal s
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY 1)
SELECT doc_id, CAST(score AS BIGINT) AS bm25_e6
FROM scored
ORDER BY score DESC, doc_id
LIMIT 10
"""

_STRATIFIED_SQL = """
WITH RECURSIVE eb AS (
  SELECT event_id, event_type,
         hex(encode(CAST(event_id AS VARCHAR))) AS hx,
         octet_length(encode(CAST(event_id AS VARCHAR))) AS n
  FROM events
),
fnv AS (
  SELECT event_id, n, 0 AS i,
         CAST('14695981039346656037' AS UHUGEINT) AS h FROM eb
  UNION ALL
  SELECT f.event_id, f.n, f.i + 1,
         (xor(f.h, CAST(CAST('0x' || substr(eb.hx, 2*f.i+1, 2) AS INT)
                        AS UHUGEINT))
          * CAST(1099511628211 AS UHUGEINT))
           % CAST('18446744073709551616' AS UHUGEINT)
  FROM fnv f JOIN eb ON eb.event_id = f.event_id
  WHERE f.i < f.n
),
r AS (
  SELECT eb.event_type, eb.event_id,
         ROW_NUMBER() OVER (
           PARTITION BY eb.event_type
           ORDER BY CAST(fnv.h % CAST('18446744073709551616' AS UHUGEINT)
                         AS UBIGINT), eb.event_id
         ) AS rnk
  FROM eb JOIN fnv ON fnv.event_id = eb.event_id AND fnv.i = fnv.n
)
SELECT event_type, event_id, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 50
ORDER BY event_type, rnk
"""

_HASH_JOIN_LEFT_SQL = """
SELECT o.o_orderkey, o.o_custkey, e.event_id,
       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS o_total_cents,
       CAST(floor(e.value * 100) AS BIGINT) AS value_cents
FROM orders o LEFT JOIN events e ON e.user_id = o.o_custkey
ORDER BY o.o_orderkey, e.event_id
"""

_LABEL_CENTROIDS_SQL = """
SELECT CAST(e.label AS BIGINT) AS label, CAST(t.dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(CAST(t.v AS DOUBLE) * 1000000) AS BIGINT))
            AS BIGINT) AS sum_q
FROM embeddings AS e, LATERAL (
  SELECT unnest(e.embedding) AS v,
         generate_subscripts(e.embedding, 1) AS dim
) t
GROUP BY e.label, t.dim
ORDER BY e.label, t.dim
"""

_TYPE_MOMENTS_SQL = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(CAST(cents AS HUGEINT) * cents) AS BIGINT) AS sum_sq_cents
FROM c GROUP BY event_type ORDER BY event_type
"""

# Grouped OLS trend: exact integer sufficient statistics + HUGEINT
# floor-division slope/intercept (DuckDB // truncates toward zero, so
# negative numerators need the explicit floor CASE; denominators are
# positive).  x = hours since _TREND_H0 (473000), y = floor-cents.
_TYPE_TREND_SQL = """
WITH b AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000 - 473000)::BIGINT AS x,
         CAST(floor(value * 100) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT event_type,
         count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sum_x,
         sum(y)::BIGINT AS sum_y,
         sum(x::HUGEINT * y) AS sxy,
         sum(x::HUGEINT * x) AS sxx
  FROM b GROUP BY event_type
),
d AS (
  SELECT *,
         (n::HUGEINT * sxy - sum_x::HUGEINT * sum_y) AS num,
         (n::HUGEINT * sxx - sum_x::HUGEINT * sum_x) AS den,
         (sum_y::HUGEINT * sxx - sum_x::HUGEINT * sxy) AS inum
  FROM s
)
SELECT event_type, n, sum_x, sum_y,
       sxy::BIGINT AS sum_xy, sxx::BIGINT AS sum_xx,
       (CASE WHEN den = 0 THEN 0
             WHEN (num * 1000000000) % den <> 0 AND num < 0
               THEN (num * 1000000000) // den - 1
             ELSE (num * 1000000000) // den END)::BIGINT AS slope_e9,
       (CASE WHEN den = 0 THEN 0
             WHEN (inum * 1000000) % den <> 0 AND inum < 0
               THEN (inum * 1000000) // den - 1
             ELSE (inum * 1000000) // den END)::BIGINT AS intercept_e6
FROM d ORDER BY event_type
"""

# Grouped MODE with deterministic tie-break (count desc, type asc).
_USER_MODE_SQL = """
WITH c AS (
  SELECT user_id::BIGINT AS user_id, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY user_id ORDER BY n DESC, event_type ASC
         ) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_type, n AS mode_n
FROM r WHERE rn = 1 ORDER BY user_id
"""

def _build_kcore_sql(k: int = 6, rounds: int = 5) -> str:
    """Unrolled k-core peel oracle: same variable-degree multigraph
    (5 hash families gated by src%5, 4 ring chords on src%10==0,
    self-loops dropped, parallel edges counted), ``rounds`` rounds of
    'drop active nodes whose active-degree < k'.  rounds=5 >= the
    fixpoint depth on the driver tables (measured: 4), so the bounded
    peel equals the true k-core here."""
    head = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
docs AS (SELECT doc_id::BIGINT AS doc_id FROM documents),
e0 AS (
  SELECT doc_id AS src, ((7*doc_id+1) % n)::BIGINT AS dst, 0 AS i
  FROM docs CROSS JOIN nn
  UNION ALL SELECT doc_id, ((13*doc_id+5) % n)::BIGINT, 1
  FROM docs CROSS JOIN nn
  UNION ALL SELECT doc_id, ((31*doc_id+11) % n)::BIGINT, 2
  FROM docs CROSS JOIN nn
  UNION ALL SELECT doc_id, ((17*doc_id+3) % n)::BIGINT, 3
  FROM docs CROSS JOIN nn
  UNION ALL SELECT doc_id, ((23*doc_id+9) % n)::BIGINT, 4
  FROM docs CROSS JOIN nn
  UNION ALL SELECT doc_id, ((doc_id+10) % n)::BIGINT, 10
  FROM docs CROSS JOIN nn WHERE doc_id % 10 = 0
  UNION ALL SELECT doc_id, ((doc_id+20) % n)::BIGINT, 11
  FROM docs CROSS JOIN nn WHERE doc_id % 10 = 0
  UNION ALL SELECT doc_id, ((doc_id+30) % n)::BIGINT, 12
  FROM docs CROSS JOIN nn WHERE doc_id % 10 = 0
  UNION ALL SELECT doc_id, ((doc_id+40) % n)::BIGINT, 13
  FROM docs CROSS JOIN nn WHERE doc_id % 10 = 0
),
ee AS (
  SELECT src, dst FROM e0 WHERE src <> dst AND (i >= 10 OR (src % 5) >= i)
),
a0 AS (SELECT doc_id, 1::BIGINT AS act FROM docs)"""
    rounds_sql = []
    for r in range(rounds):
        rounds_sql.append(f""",
d{r + 1} AS (
  SELECT x.id, sum(x.c)::BIGINT AS deg FROM (
    SELECT ee.src AS id, a.act AS c FROM ee JOIN a{r} a ON a.doc_id = ee.dst
    UNION ALL
    SELECT ee.dst, a.act FROM ee JOIN a{r} a ON a.doc_id = ee.src
  ) x GROUP BY x.id
),
a{r + 1} AS (
  SELECT d.doc_id,
         (CASE WHEN a.act = 1 AND coalesce(g.deg, 0) >= {k}
               THEN 1 ELSE 0 END)::BIGINT AS act
  FROM docs d JOIN a{r} a USING (doc_id)
  LEFT JOIN d{r + 1} g ON g.id = d.doc_id
)""")
    tail = f"""
SELECT doc_id, act AS in_core FROM a{rounds} ORDER BY doc_id"""
    return head + "".join(rounds_sql) + tail


_KCORE_SQL = _build_kcore_sql()


def _build_hits_sql(iters: int = 2) -> str:
    """HITS mirror of dataops.doc_hits: sum-normalized integer
    fixed-point at scale 1e12; HUGEINT keeps x*1e12 exact (the Ray
    side uses the q*1e6 + (r*1e6)//s int64-safe split, proven equal
    to floor(x*1e12/s))."""
    S = 10**12
    parts = [f"""
WITH n AS (SELECT count(*)::BIGINT AS nn FROM documents),
docs AS (SELECT doc_id FROM documents),
e AS (
  SELECT doc_id AS src, ((7 * doc_id + 1) % nn)::BIGINT AS dst
  FROM docs CROSS JOIN n
  UNION ALL
  SELECT doc_id, ((13 * doc_id + 5) % nn)::BIGINT FROM docs CROSS JOIN n
  UNION ALL
  SELECT doc_id, ((31 * doc_id + 11) % nn)::BIGINT FROM docs CROSS JOIN n
),
h0 AS (SELECT doc_id, ({S} // nn)::HUGEINT AS r FROM docs CROSS JOIN n)"""]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(f""",
a{i}raw AS (
  SELECT d.doc_id, COALESCE(s.s, 0)::HUGEINT AS r
  FROM docs d LEFT JOIN (
    SELECT e.dst AS doc_id, sum({prev_h}.r)::HUGEINT AS s
    FROM e JOIN {prev_h} ON {prev_h}.doc_id = e.src GROUP BY e.dst
  ) s ON s.doc_id = d.doc_id
),
a{i} AS (
  SELECT doc_id,
         (r * {S} // (SELECT sum(r) FROM a{i}raw))::HUGEINT AS r
  FROM a{i}raw
),
h{i}raw AS (
  SELECT d.doc_id, COALESCE(s.s, 0)::HUGEINT AS r
  FROM docs d LEFT JOIN (
    SELECT e.src AS doc_id, sum(a{i}.r)::HUGEINT AS s
    FROM e JOIN a{i} ON a{i}.doc_id = e.dst GROUP BY e.src
  ) s ON s.doc_id = d.doc_id
),
h{i} AS (
  SELECT doc_id,
         (r * {S} // (SELECT sum(r) FROM h{i}raw))::HUGEINT AS r
  FROM h{i}raw
)""")
        prev_h = f"h{i}"
    parts.append(f"""
SELECT d.doc_id, CAST(a{iters}.r AS BIGINT) AS auth,
       CAST(h{iters}.r AS BIGINT) AS hub
FROM docs d
JOIN a{iters} ON a{iters}.doc_id = d.doc_id
JOIN h{iters} ON h{iters}.doc_id = d.doc_id
ORDER BY d.doc_id
""")
    return "".join(parts)


_HITS_SQL = _build_hits_sql()


def _build_pca_sql(iters: int = 3, dim: int = 64) -> str:
    """SQL mirror of dataops.embedding_pca_power: integer scatter
    matrix in HUGEINT, power iteration with explicit sign/abs (DuckDB
    ``//`` truncates negatives toward zero, Python floors -- sign/abs
    makes both compute the same non-negative division)."""
    S = 10**6
    parts = [f"""
WITH idx AS (SELECT unnest(range(0, {dim}))::BIGINT AS i),
q AS (
  SELECT e.vec_id, idx.i,
         CAST(floor(list_extract(e.embedding, idx.i + 1)::DOUBLE * 1000)
              AS BIGINT) AS qv
  FROM embeddings e CROSS JOIN idx
),
s1 AS (SELECT i, sum(qv)::HUGEINT AS s FROM q GROUP BY i),
s2 AS (
  SELECT a.i AS i, b.i AS j, sum(a.qv * b.qv)::HUGEINT AS s
  FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2
),
nn AS (SELECT count(*)::HUGEINT AS n FROM embeddings),
c AS (
  SELECT s2.i, s2.j,
         (nn.n * s2.s - s1a.s * s1b.s)::HUGEINT AS c
  FROM s2 CROSS JOIN nn
  JOIN s1 s1a ON s1a.i = s2.i
  JOIN s1 s1b ON s1b.i = s2.j
),
v0 AS (SELECT i, {S}::HUGEINT AS v FROM idx)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
w{t} AS (
  SELECT c.i, sum(c.c * v{t-1}.v)::HUGEINT AS w
  FROM c JOIN v{t-1} ON v{t-1}.i = c.j GROUP BY c.i
),
m{t} AS (SELECT max(abs(w)) AS m FROM w{t}),
v{t} AS (
  SELECT i,
         (CASE WHEN w < 0 THEN -1 ELSE 1 END)
           * ((abs(w) * {S}) // m{t}.m) AS v
  FROM w{t} CROSS JOIN m{t}
)""")
    parts.append(f"""
SELECT i, CAST(v AS BIGINT) AS v FROM v{iters} ORDER BY i
""")
    return "".join(parts)


_PCA_SQL = _build_pca_sql()

# TPC-H Q18 shape: grouped-sum HAVING over lineitem quantity (exact
# floor-cents), join back to orders + customer, top-k by value.
_Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       CAST(sum(CAST(floor(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4, 5
HAVING sum(CAST(floor(l.l_quantity * 100) AS BIGINT)) > 25000
ORDER BY totalprice_cents DESC, o.o_orderkey
LIMIT 100
"""

# TPC-H Q7 shape: nation-pair trade volume by ship year; year filter
# in SQL mirrors the engine's year extraction (no BETWEEN-midnight
# edge), revenue in exact per-row floor-cents.
_Q7_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE year(l.l_shipdate) BETWEEN 1995 AND 1996
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

# TPC-H Q22 shape: above-global-average balance (exact integer
# cross-multiply, no float average) + anti-join on recent orders.
_Q22_SQL = """
WITH tot AS (
  SELECT sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS s,
         count(*) AS n
  FROM customer
)
SELECT c.c_mktsegment,
       count(*)::BIGINT AS n_cust,
       CAST(sum(CAST(floor(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS sum_acctbal_cents
FROM customer c, tot
WHERE CAST(floor(c.c_acctbal * 100) AS BIGINT) * tot.n > tot.s
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1998-06-01'
  )
GROUP BY 1
ORDER BY 1
"""

# Tukey IQR fences via doubled comparisons (no half-integer fence).
_IQR_SQL = """
WITH x AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
),
r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM x
),
qq AS (
  SELECT event_type,
         max(CASE WHEN rn = (n * 25 + 99) // 100 THEN v END) AS q1,
         max(CASE WHEN rn = (n * 75 + 99) // 100 THEN v END) AS q3
  FROM r GROUP BY 1
)
SELECT q.event_type, q.q1, q.q3,
       (SELECT count(*) FROM x
        WHERE x.event_type = q.event_type
          AND 2 * x.v < 2 * q.q1 - 3 * (q.q3 - q.q1))::BIGINT AS n_low,
       (SELECT count(*) FROM x
        WHERE x.event_type = q.event_type
          AND 2 * x.v > 2 * q.q3 + 3 * (q.q3 - q.q1))::BIGINT AS n_high
FROM qq q ORDER BY q.event_type
"""

# Double-median quadrants: balance x order count, lower medians.
_QUADRANTS_SQL = """
WITH pc AS (
  SELECT c.c_custkey, CAST(floor(c.c_acctbal * 100) AS BIGINT) AS bal,
         count(o.o_orderkey)::BIGINT AS cnt
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
mb AS (
  SELECT bal AS v FROM (
    SELECT bal, row_number() OVER (ORDER BY bal) AS rn,
           count(*) OVER () AS n FROM pc
  ) WHERE rn = (n + 1) // 2
),
mc AS (
  SELECT cnt AS v FROM (
    SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn,
           count(*) OVER () AS n FROM pc
  ) WHERE rn = (n + 1) // 2
),
q AS (
  SELECT (CASE WHEN pc.bal > mb.v THEN 'h' ELSE 'l' END)
         || (CASE WHEN pc.cnt > mc.v THEN 'h' ELSE 'l' END) AS quadrant
  FROM pc CROSS JOIN mb CROSS JOIN mc
)
SELECT quadrant, count(*)::BIGINT AS n_customers
FROM q GROUP BY 1 ORDER BY 1
"""

# Signed squared Pearson correlation between type series (no sqrt).
_TYPE_CORR2_SQL = """
WITH b AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour
  FROM events
),
g AS (SELECT event_type, hour, count(*)::BIGINT AS c FROM b GROUP BY 1, 2),
bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM b),
types AS (SELECT DISTINCT event_type FROM b),
grid AS (
  SELECT t.event_type, bo.lo + u.i AS hour
  FROM types t CROSS JOIN bounds bo
  CROSS JOIN (
    SELECT unnest(range(0, (SELECT hi - lo + 1 FROM bounds)))::BIGINT AS i
  ) u
),
dense AS (
  SELECT grid.event_type, grid.hour, coalesce(g.c, 0)::BIGINT AS c
  FROM grid LEFT JOIN g USING (event_type, hour)
),
p AS (
  SELECT a.event_type AS ta, b2.event_type AS tb,
         count(*)::HUGEINT AS t,
         sum(a.c)::HUGEINT AS sa, sum(b2.c)::HUGEINT AS sb,
         sum(a.c::HUGEINT * b2.c) AS sxy,
         sum(a.c::HUGEINT * a.c) AS saa,
         sum(b2.c::HUGEINT * b2.c) AS sbb
  FROM dense a JOIN dense b2
    ON a.hour = b2.hour AND a.event_type < b2.event_type
  GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b,
       CAST(CASE WHEN (t*saa - sa*sa) * (t*sbb - sb*sb) = 0 THEN 0
                 ELSE sign(t*sxy - sa*sb) END AS BIGINT) AS sign,
       CAST(CASE WHEN (t*saa - sa*sa) * (t*sbb - sb*sb) = 0 THEN 0
                 ELSE (1000000 * (t*sxy - sa*sb) * (t*sxy - sa*sb))
                      // ((t*saa - sa*sa) * (t*sbb - sb*sb))
            END AS BIGINT) AS corr2_e6
FROM p ORDER BY 1, 2
"""

# Effective tax incidence: ratio of sums in exact cents.
_TAX_INCIDENCE_SQL = """
WITH x AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(floor(l_extendedprice * l_tax * 100) AS BIGINT) AS tc
  FROM lineitem
),
g AS (
  SELECT l_returnflag, sum(pc)::BIGINT AS price, sum(tc)::BIGINT AS tax
  FROM x GROUP BY 1
)
SELECT l_returnflag, price AS sum_price_cents, tax AS sum_tax_cents,
       CAST(1000000 * tax::HUGEINT // price AS BIGINT) AS rate_e6
FROM g ORDER BY l_returnflag
"""

# Fulfillment latency histogram (first ship date, -1 = never ships).
_FULFILL_SQL = """
WITH s AS (
  SELECT l_orderkey, min(epoch_us(l_shipdate)) AS first_ship
  FROM lineitem GROUP BY 1
),
d AS (
  SELECT CASE WHEN s.first_ship IS NULL THEN -1
              ELSE (s.first_ship - epoch_us(o.o_orderdate))
                   // 86400000000
         END::BIGINT AS latency_days
  FROM orders o LEFT JOIN s ON s.l_orderkey = o.o_orderkey
)
SELECT latency_days, count(*)::BIGINT AS n_orders
FROM d GROUP BY 1 ORDER BY 1
"""

# Longest consecutive-day activity streak per user (gaps-and-islands).
_STREAK_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
  FROM events
),
isl AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS g
  FROM ud
),
runs AS (
  SELECT user_id, count(*)::BIGINT AS len
  FROM isl GROUP BY user_id, g
),
best AS (SELECT user_id, max(len) AS streak FROM runs GROUP BY 1)
SELECT streak::BIGINT AS streak_days, count(*)::BIGINT AS n_users
FROM best GROUP BY 1 ORDER BY 1
"""

# Rate-limit audit over per-(user, minute) burst counts.
_RATE_LIMIT_SQL = """
WITH um AS (
  SELECT user_id, epoch_us(ts) // 60000000 AS minute,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_user_minutes,
       (count(*) FILTER (WHERE c > 3))::BIGINT AS n_over_limit,
       max(c)::BIGINT AS max_per_minute
FROM um
"""

# Split shipments: orders with > 1 distinct ship date.
_SPLIT_SHIP_SQL = """
WITH od AS (
  SELECT l_orderkey,
         count(DISTINCT epoch_us(l_shipdate) // 86400000000)::BIGINT
           AS nd
  FROM lineitem GROUP BY 1
)
SELECT count(*)::BIGINT AS n_orders,
       (count(*) FILTER (WHERE nd > 1))::BIGINT AS n_split,
       CAST(1000000 * (count(*) FILTER (WHERE nd > 1)) // count(*)
            AS BIGINT) AS split_e6,
       max(nd)::BIGINT AS max_ship_dates
FROM od
"""

# Annual month-of-year revenue profile.
_MONTH_PROFILE_SQL = """
WITH o AS (
  SELECT month(o_orderdate)::BIGINT AS moy,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
g AS (SELECT moy, sum(cents)::BIGINT AS cents FROM o GROUP BY 1),
t AS (SELECT sum(cents)::BIGINT AS total FROM g)
SELECT g.moy AS month_of_year, g.cents AS revenue_cents,
       CAST(1000000 * g.cents // t.total AS BIGINT) AS share_e6
FROM g CROSS JOIN t ORDER BY 1
"""

# Power users: count >= the P99 lower-quantile cutoff.
_POWER_USERS_SQL = """
WITH uc AS (SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY 1),
r AS (
  SELECT c, row_number() OVER (ORDER BY c) AS rn,
         count(*) OVER () AS n
  FROM uc
),
cut AS (SELECT c FROM r WHERE rn = (n * 99 + 99) // 100)
SELECT u.user_id, u.c AS n_events
FROM uc u CROSS JOIN cut
WHERE u.c >= cut.c
ORDER BY u.c DESC, u.user_id
"""

# Growth accounting: new / retained / resurrected per epoch week.
_GROWTH_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         ((epoch_us(ts) // 86400000000) // 7)::BIGINT AS w
  FROM events
),
f AS (SELECT user_id, min(w) AS fw FROM uw GROUP BY 1),
c AS (
  SELECT a.w,
    CASE WHEN a.w = f.fw THEN 'new'
         WHEN EXISTS (SELECT 1 FROM uw b
                      WHERE b.user_id = a.user_id AND b.w = a.w - 1)
           THEN 'ret'
         ELSE 'res' END AS cls
  FROM uw a JOIN f ON f.user_id = a.user_id
)
SELECT w AS week,
       (count(*) FILTER (WHERE cls = 'new'))::BIGINT AS n_new,
       (count(*) FILTER (WHERE cls = 'ret'))::BIGINT AS n_retained,
       (count(*) FILTER (WHERE cls = 'res'))::BIGINT AS n_resurrected
FROM c GROUP BY 1 ORDER BY 1
"""

# First-touch mix: each user's first event type by (ts, event_id).
_FIRST_TOUCH_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
f AS (SELECT event_type FROM r WHERE rn = 1),
g AS (SELECT event_type, count(*)::BIGINT AS n FROM f GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS total FROM g)
SELECT g.event_type, g.n AS n_users,
       CAST(1000000 * g.n // t.total AS BIGINT) AS share_e6
FROM g CROSS JOIN t ORDER BY g.event_type
"""

# Assortment coverage per part type (inner join drops unknown parts).
_PART_BREADTH_SQL = """
WITH li AS (
  SELECT p.p_type, l.l_suppkey, l.l_partkey,
         CAST(floor(l.l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT p_type, count(DISTINCT l_suppkey)::BIGINT AS n_suppliers,
       count(DISTINCT l_partkey)::BIGINT AS n_parts,
       sum(qc)::BIGINT AS sum_qty_cents
FROM li GROUP BY 1 ORDER BY 1
"""

# Winsorized mean: clamp at lower-quantile ranks ceil(q*n), sign-
# safe truncating mean division.
_WINSOR_SQL = """
WITH x AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
),
r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM x
),
cuts AS (
  SELECT event_type,
         max(CASE WHEN rn = (n * 5 + 99) // 100 THEN v END) AS p_lo,
         max(CASE WHEN rn = (n * 95 + 99) // 100 THEN v END) AS p_hi,
         max(n) AS n
  FROM r GROUP BY 1
),
w AS (
  SELECT x.event_type,
         least(greatest(x.v, c.p_lo), c.p_hi)::HUGEINT AS cv,
         c.p_lo, c.p_hi, c.n
  FROM x JOIN cuts c USING (event_type)
),
s AS (
  SELECT event_type, sum(cv) AS ws, max(p_lo) AS p_lo,
         max(p_hi) AS p_hi, max(n) AS n
  FROM w GROUP BY 1
)
SELECT event_type, n::BIGINT AS n, p_lo, p_hi,
       CAST((CASE WHEN ws < 0 THEN -1 ELSE 1 END)
            * ((1000000 * abs(ws)) // n) AS BIGINT) AS wmean_e6
FROM s ORDER BY event_type
"""

# Weekly churn: active in week w but absent in w+1; last week omitted.
_CHURN_SQL = """
WITH um AS (
  SELECT DISTINCT user_id,
         ((epoch_us(ts) // 86400000000) // 7)::BIGINT AS m
  FROM events
),
last_m AS (SELECT max(m) AS lm FROM um),
j AS (
  SELECT a.m, count(*)::BIGINT AS n_active,
         (count(*) FILTER (WHERE NOT EXISTS (
            SELECT 1 FROM um b
            WHERE b.user_id = a.user_id AND b.m = a.m + 1)))::BIGINT
           AS n_churned
  FROM um a CROSS JOIN last_m
  WHERE a.m < last_m.lm
  GROUP BY 1
)
SELECT m AS week, n_active, n_churned,
       CAST(1000000 * n_churned // n_active AS BIGINT) AS churn_e6
FROM j ORDER BY week
"""

# 2x2 odds ratio: (n11*n00)/(n10*n01), -1 on zero denominator.
_ODDS_RATIO_SQL = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ha,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS hb
  FROM events GROUP BY 1
),
c AS (
  SELECT (count(*) FILTER (WHERE ha = 1 AND hb = 1))::BIGINT AS n11,
         (count(*) FILTER (WHERE ha = 1 AND hb = 0))::BIGINT AS n10,
         (count(*) FILTER (WHERE ha = 0 AND hb = 1))::BIGINT AS n01,
         (count(*) FILTER (WHERE ha = 0 AND hb = 0))::BIGINT AS n00
  FROM u
)
SELECT n11 AS n_both, n10 AS n_a_only, n01 AS n_b_only,
       n00 AS n_neither,
       CAST(CASE WHEN n10 * n01 = 0 THEN -1
                 ELSE (1000000::HUGEINT * n11 * n00) // (n10 * n01)
            END AS BIGINT) AS odds_ratio_e6
FROM c
"""

# Weekly heatmap: integer calendar math, dow = (epoch_day + 4) % 7.
_WEEK_HEATMAP_SQL = """
WITH e AS (
  SELECT ((epoch_us(ts) // 86400000000 + 4) % 7)::BIGINT AS dow,
         ((epoch_us(ts) // 3600000000) % 24)::BIGINT AS hod
  FROM events
),
g AS (SELECT dow, hod, count(*)::BIGINT AS n FROM e GROUP BY 1, 2),
t AS (SELECT sum(n)::BIGINT AS total FROM g)
SELECT g.dow, g.hod AS hour_of_day, g.n AS n_events,
       CAST(1000000 * g.n // t.total AS BIGINT) AS share_e6
FROM g CROSS JOIN t ORDER BY g.dow, g.hod
"""

# Weighted Jaccard: sum min / (T_a + T_b - sum min) over co-users.
_TYPE_WJACCARD_SQL = """
WITH cu AS (
  SELECT event_type, user_id, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
mins AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         sum(least(a.c, b.c))::BIGINT AS sum_min
  FROM cu a JOIN cu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
tot AS (SELECT event_type, sum(c)::BIGINT AS t FROM cu GROUP BY 1)
SELECT m.ta AS type_a, m.tb AS type_b, m.sum_min,
       xa.t AS total_a, xb.t AS total_b,
       CAST(1000000 * m.sum_min // (xa.t + xb.t - m.sum_min)
            AS BIGINT) AS wjaccard_e6
FROM mins m
JOIN tot xa ON xa.event_type = m.ta
JOIN tot xb ON xb.event_type = m.tb
ORDER BY 1, 2
"""

# Total-variation distance over the value histogram (KS's sibling).
_TV_SQL = """
WITH u AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS v,
         (event_type = 'purchase') AS isa
  FROM events WHERE event_type IN ('purchase', 'click')
),
g AS (
  SELECT v, sum(CASE WHEN isa THEN 1 ELSE 0 END)::BIGINT AS na,
         sum(CASE WHEN isa THEN 0 ELSE 1 END)::BIGINT AS nb
  FROM u GROUP BY v
),
t AS (SELECT sum(na)::HUGEINT AS n_a, sum(nb)::HUGEINT AS n_b FROM g),
s AS (
  SELECT sum(abs(g.na::HUGEINT * t.n_b - g.nb::HUGEINT * t.n_a))
           AS tv_num
  FROM g CROSS JOIN t
)
SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       CAST(s.tv_num AS BIGINT) AS tv_num,
       CAST(1000000 * s.tv_num // (2 * t.n_a * t.n_b) AS BIGINT)
         AS tv_e6
FROM s CROSS JOIN t
"""

# LTV cohort triangle: cohort = first order year per customer.
_LTV_SQL = """
WITH o AS (
  SELECT o_custkey, year(o_orderdate)::BIGINT AS y,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
c AS (SELECT o_custkey, min(y) AS cohort FROM o GROUP BY 1)
SELECT c.cohort AS cohort_year, o.y AS order_year,
       sum(o.cents)::BIGINT AS revenue_cents,
       count(DISTINCT o.o_custkey)::BIGINT AS n_active_customers
FROM o JOIN c USING (o_custkey)
GROUP BY 1, 2 ORDER BY 1, 2
"""

# Diversified top-k == per-customer rank filter then global top-k
# (the greedy rank-then-cap scan picks exactly rows with per-cust
# rank <= cap).
_DIVERSIFIED_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS c,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC,
                    o_orderkey) AS rc
  FROM orders
)
SELECT o_orderkey, o_custkey, c AS totalprice_cents
FROM o WHERE rc <= 2
ORDER BY c DESC, o_orderkey
LIMIT 10
"""

# Emerging vocabulary: share growth ranked by the exact common-
# denominator numerator n2*T1 - n1*T2 (ties by word).
_WORD_DRIFT_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
h AS (
  SELECT w,
         CASE WHEN doc_id > (SELECT (count(*) - 1) // 2 FROM documents)
              THEN 1 ELSE 0 END AS half
  FROM toks
),
g AS (
  SELECT w, sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(half)::BIGINT AS n2
  FROM h GROUP BY 1
),
t AS (SELECT sum(n1)::HUGEINT AS t1, sum(n2)::HUGEINT AS t2 FROM g),
f AS (SELECT w, n1, n2 FROM g WHERE n1 + n2 >= 20),
s AS (
  SELECT f.w, f.n1, f.n2,
         (f.n2::HUGEINT * t.t1 - f.n1::HUGEINT * t.t2) AS d,
         CAST(1000000 * f.n2 // t.t2 AS BIGINT)
           - CAST(1000000 * f.n1 // t.t1 AS BIGINT) AS drift_e6
  FROM f CROSS JOIN t
)
SELECT w AS word, n1 AS n_first, n2 AS n_second,
       CAST(drift_e6 AS BIGINT) AS drift_e6
FROM s ORDER BY d DESC, w LIMIT 20
"""

# Conversion latency histogram: first event -> first purchase days,
# -1 bucket for users who never convert.
_CONV_LATENCY_SQL = """
WITH u AS (
  SELECT user_id, min(epoch_us(ts)) AS first_ts,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) END) AS first_conv
  FROM events GROUP BY 1
),
d AS (
  SELECT CASE WHEN first_conv IS NULL THEN -1
              ELSE (first_conv - first_ts) // 86400000000
         END::BIGINT AS latency_days
  FROM u
)
SELECT latency_days, count(*)::BIGINT AS n_users
FROM d GROUP BY 1 ORDER BY 1
"""

# Duplication rate per source: distinct md5(text) within source.
_DEDUP_RATE_SQL = """
WITH d AS (SELECT source, md5(text) AS h FROM documents),
agg AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         count(DISTINCT h)::BIGINT AS n_unique
  FROM d GROUP BY 1
)
SELECT source, n_docs, n_unique AS n_unique_texts,
       CAST(1000000 * (n_docs - n_unique) // n_docs AS BIGINT)
         AS dup_rate_e6
FROM agg ORDER BY source
"""

# Order-size histogram over the orders universe (0-item orders kept).
_SIZE_HIST_SQL = """
WITH s AS (
  SELECT o.o_orderkey, count(l.l_orderkey)::BIGINT AS n_items
  FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
)
SELECT n_items, count(*)::BIGINT AS n_orders
FROM s GROUP BY 1 ORDER BY 1
"""

# Spike hours: x * 240 > k_x10 * trailing-24h-sum (strictly-before
# window, full 24 required), gaps-and-islands for the max streak.
_SPIKE_SQL = """
WITH b AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour
  FROM events
),
g AS (SELECT event_type, hour, count(*)::BIGINT AS x FROM b GROUP BY 1, 2),
bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM b),
types AS (SELECT DISTINCT event_type FROM b),
grid AS (
  SELECT t.event_type, bo.lo + u.i AS hour
  FROM types t CROSS JOIN bounds bo
  CROSS JOIN (
    SELECT unnest(range(0, (SELECT hi - lo + 1 FROM bounds)))::BIGINT AS i
  ) u
),
dense AS (
  SELECT grid.event_type, grid.hour, COALESCE(g.x, 0)::BIGINT AS x
  FROM grid LEFT JOIN g
    ON g.event_type = grid.event_type AND g.hour = grid.hour
),
w AS (
  SELECT event_type, hour, x,
    sum(x) OVER (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s24,
    row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
  FROM dense
),
sp AS (
  SELECT event_type, hour FROM w
  WHERE rn >= 25 AND x * 240 > 30 * s24
),
isl AS (
  SELECT event_type, hour,
         hour - row_number() OVER (PARTITION BY event_type
                                   ORDER BY hour) AS grp
  FROM sp
),
streaks AS (
  SELECT event_type, count(*)::BIGINT AS len
  FROM isl GROUP BY event_type, grp
),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n, min(hour)::BIGINT AS f
  FROM sp GROUP BY 1
),
stk AS (SELECT event_type, max(len)::BIGINT AS mx FROM streaks GROUP BY 1)
SELECT t.event_type,
       COALESCE(a.n, 0)::BIGINT AS n_spike_hours,
       COALESCE(a.f, -1)::BIGINT AS first_spike_hour,
       COALESCE(k.mx, 0)::BIGINT AS max_streak
FROM types t
LEFT JOIN agg a USING (event_type)
LEFT JOIN stk k USING (event_type)
ORDER BY t.event_type
"""

# Referential-integrity orphan audit over the two FK relations.
_RI_AUDIT_SQL = """
SELECT * FROM (
  SELECT 'orders.o_custkey->customer' AS relation,
         (SELECT count(*) FROM orders)::BIGINT AS n_child_rows,
         (SELECT count(*) FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c
            WHERE c.c_custkey = o.o_custkey))::BIGINT AS n_orphan_rows
  UNION ALL
  SELECT 'lineitem.l_orderkey->orders',
         (SELECT count(*) FROM lineitem)::BIGINT,
         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey))::BIGINT
)
ORDER BY relation
"""

# Positional proximity query: min |pos_a - pos_b| within a window.
_PROXIMITY_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
pos AS (
  SELECT doc_id, u.i - 1 AS p, ws[u.i] AS w
  FROM toks CROSS JOIN (
    SELECT unnest(range(1, 100000))::BIGINT AS i
  ) u
  WHERE u.i <= len(ws) AND ws[u.i] IN ('merge', 'sort')
),
a AS (SELECT doc_id, p FROM pos WHERE w = 'merge'),
b AS (SELECT doc_id, p FROM pos WHERE w = 'sort'),
m AS (
  SELECT a.doc_id, min(abs(a.p - b.p))::BIGINT AS min_dist
  FROM a JOIN b USING (doc_id) GROUP BY 1
),
ca AS (SELECT doc_id, count(*)::BIGINT AS n_a FROM a GROUP BY 1),
cb AS (SELECT doc_id, count(*)::BIGINT AS n_b FROM b GROUP BY 1)
SELECT m.doc_id, ca.n_a, cb.n_b, m.min_dist
FROM m JOIN ca USING (doc_id) JOIN cb USING (doc_id)
WHERE m.min_dist <= 5
ORDER BY m.doc_id
"""

# Peak session concurrency: gap sessions -> +1/-1 boundary scan
# (+1 first at equal instants), window cumsum max, earliest peak t.
_PEAK_CONCURRENCY_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events),
f AS (
  SELECT user_id, t, event_id,
    CASE WHEN lag(t) OVER w IS NULL
              OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
s AS (
  SELECT user_id, t,
    sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
),
g AS (
  SELECT user_id, sid, min(t) AS lo, max(t) AS hi FROM s GROUP BY 1, 2
),
bnd AS (
  SELECT lo AS t, 1 AS d FROM g
  UNION ALL
  SELECT hi, -1 FROM g
),
c AS (
  SELECT t, d,
         sum(d) OVER (ORDER BY t, d DESC
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM bnd
),
mx AS (SELECT max(cum) AS m FROM c)
SELECT (SELECT count(*) FROM g)::BIGINT AS n_sessions,
       CAST(mx.m AS BIGINT) AS peak_concurrency,
       make_timestamp((SELECT min(t) FROM c WHERE cum = mx.m))
         AS peak_ts
FROM mx
"""

# DAU/MAU stickiness per month over distinct (user, day) pairs.
_STICKINESS_SQL = """
WITH du AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
),
d2 AS (
  SELECT user_id, day,
         ((year(DATE '1970-01-01' + day * INTERVAL 1 DAY) - 1970) * 12
          + month(DATE '1970-01-01' + day * INTERVAL 1 DAY) - 1)::BIGINT
           AS m
  FROM du
),
dau AS (SELECT m, day, count(*)::BIGINT AS n FROM d2 GROUP BY 1, 2),
mau AS (SELECT m, count(DISTINCT user_id)::BIGINT AS mau FROM d2
        GROUP BY 1),
agg AS (
  SELECT m, count(*)::BIGINT AS n_active_days, sum(n)::BIGINT AS sum_dau
  FROM dau GROUP BY 1
)
SELECT a.m AS month, a.n_active_days, a.sum_dau, mau.mau,
       CAST(1000000 * a.sum_dau // (a.n_active_days * mau.mau)
            AS BIGINT) AS stickiness_e6
FROM agg a JOIN mau USING (m) ORDER BY month
"""

# Embedding norm^2 order statistics over the quantized magnitudes.
_NORM2_Q_SQL = """
WITH q AS (
  SELECT vec_id,
         sum(CAST(floor(x.v::DOUBLE * 1000) AS BIGINT)
             * CAST(floor(x.v::DOUBLE * 1000) AS BIGINT))::BIGINT AS n2
  FROM embeddings, unnest(embedding) AS x(v)
  GROUP BY vec_id
),
r AS (
  SELECT n2, row_number() OVER (ORDER BY n2) AS rn,
         count(*) OVER () AS n
  FROM q
)
SELECT 0::BIGINT AS q_e2, min(n2)::BIGINT AS value FROM q
UNION ALL
SELECT 50, n2 FROM r WHERE rn = (n * 50 + 99) // 100
UNION ALL
SELECT 90, n2 FROM r WHERE rn = (n * 90 + 99) // 100
UNION ALL
SELECT 99, n2 FROM r WHERE rn = (n * 99 + 99) // 100
UNION ALL
SELECT 100, max(n2)::BIGINT FROM q
ORDER BY q_e2
"""

# Type-share drift between time halves (split at the us midpoint,
# first half inclusive of the boundary).
_SHARE_DRIFT_SQL = """
WITH b AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
),
e AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) > (b.lo + b.hi) // 2
              THEN 1 ELSE 0 END AS half
  FROM events CROSS JOIN b
),
g AS (SELECT event_type, half, count(*)::BIGINT AS n FROM e GROUP BY 1, 2),
t AS (SELECT half, sum(n)::BIGINT AS tot FROM g GROUP BY 1),
types AS (SELECT DISTINCT event_type FROM e),
j AS (
  SELECT ty.event_type,
         COALESCE(g0.n, 0)::BIGINT AS n_first,
         COALESCE(g1.n, 0)::BIGINT AS n_second,
         (SELECT tot FROM t WHERE half = 0) AS t0,
         (SELECT tot FROM t WHERE half = 1) AS t1
  FROM types ty
  LEFT JOIN g g0 ON g0.event_type = ty.event_type AND g0.half = 0
  LEFT JOIN g g1 ON g1.event_type = ty.event_type AND g1.half = 1
)
SELECT event_type, n_first, n_second,
       CAST(COALESCE(1000000 * n_first // t0, 0) AS BIGINT)
         AS share_first_e6,
       CAST(COALESCE(1000000 * n_second // t1, 0) AS BIGINT)
         AS share_second_e6,
       CAST(COALESCE(1000000 * n_second // t1, 0)
            - COALESCE(1000000 * n_first // t0, 0) AS BIGINT) AS drift_e6
FROM j ORDER BY event_type
"""

# ABC Pareto classes: the class test uses revenue strictly ABOVE the
# customer's tier (tie-safe, no within-tie order), exact integers.
_ABC_SQL = """
WITH cr AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS rev
  FROM orders GROUP BY 1
),
tot AS (SELECT sum(rev)::HUGEINT AS r FROM cr),
above AS (
  SELECT c.o_custkey, c.rev,
         COALESCE((SELECT sum(c2.rev) FROM cr c2 WHERE c2.rev > c.rev),
                  0)::HUGEINT AS g
  FROM cr c
),
cls AS (
  SELECT rev,
         CASE WHEN g * 100 < 80 * tot.r THEN 'A'
              WHEN g * 100 < 95 * tot.r THEN 'B'
              ELSE 'C' END AS abc_class
  FROM above CROSS JOIN tot
)
SELECT abc_class, count(*)::BIGINT AS n_customers,
       sum(rev)::BIGINT AS revenue_cents
FROM cls GROUP BY 1 ORDER BY 1
"""


def _build_acf_sql(lags=(1, 24)) -> str:
    """ACF at several lags: the _HOURLY_AR1_SQL machinery per lag
    (including its negative-numerator floor adjustment -- DuckDB //
    truncates, the engine floors), plus the span<=lag zero rows the
    engine emits."""
    head = """
WITH b AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour
  FROM events
),
g AS (SELECT event_type, hour, count(*)::BIGINT AS c FROM b GROUP BY 1, 2),
bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM b),
types AS (SELECT DISTINCT event_type FROM b),
grid AS (
  SELECT t.event_type, bo.lo + u.i AS hour
  FROM types t CROSS JOIN bounds bo
  CROSS JOIN (
    SELECT unnest(range(0, (SELECT hi - lo + 1 FROM bounds)))::BIGINT AS i
  ) u
),
dense AS (
  SELECT grid.event_type, grid.hour, coalesce(g.c, 0)::BIGINT AS c
  FROM grid LEFT JOIN g USING (event_type, hour)
)"""
    blocks, selects = [], []
    for lag in lags:
        blocks.append(f""",
pairs{lag} AS (
  SELECT d1.event_type, d1.c AS x, d2.c AS y
  FROM dense d1 JOIN dense d2
    ON d2.event_type = d1.event_type AND d2.hour = d1.hour + {lag}
),
s{lag} AS (
  SELECT t.event_type, {lag}::BIGINT AS lag,
         coalesce(p.m, 0)::BIGINT AS m,
         coalesce(p.sum_x, 0)::BIGINT AS sum_x,
         coalesce(p.sum_y, 0)::BIGINT AS sum_y,
         coalesce(p.sxy, 0)::HUGEINT AS sxy,
         coalesce(p.sxx, 0)::HUGEINT AS sxx
  FROM types t LEFT JOIN (
    SELECT event_type, count(*)::BIGINT AS m, sum(x)::BIGINT AS sum_x,
           sum(y)::BIGINT AS sum_y, sum(x::HUGEINT * y) AS sxy,
           sum(x::HUGEINT * x) AS sxx
    FROM pairs{lag} GROUP BY 1
  ) p USING (event_type)
)""")
        selects.append(f"""
SELECT event_type, lag, m, sum_x, sxy::BIGINT AS sum_xy,
       (CASE WHEN (m::HUGEINT * sxx - sum_x::HUGEINT * sum_x) = 0 THEN 0
             WHEN ((m::HUGEINT * sxy - sum_x::HUGEINT * sum_y) * 1000000)
                  % (m::HUGEINT * sxx - sum_x::HUGEINT * sum_x) <> 0
              AND (m::HUGEINT * sxy - sum_x::HUGEINT * sum_y) < 0
               THEN ((m::HUGEINT * sxy - sum_x::HUGEINT * sum_y) * 1000000)
                    // (m::HUGEINT * sxx - sum_x::HUGEINT * sum_x) - 1
             ELSE ((m::HUGEINT * sxy - sum_x::HUGEINT * sum_y) * 1000000)
                  // (m::HUGEINT * sxx - sum_x::HUGEINT * sum_x) END
       )::BIGINT AS phi_e6
FROM s{lag}""")
    return (head + "".join(blocks)
            + "\nSELECT * FROM (" + "\nUNION ALL".join(selects)
            + ")\nORDER BY event_type, lag\n")


_ACF_SQL = _build_acf_sql()

# Two-sample KS distance via histogram cumulative cross-multiplies.
_KS_SQL = """
WITH u AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS v,
         (event_type = 'purchase') AS isa
  FROM events WHERE event_type IN ('purchase', 'click')
),
g AS (
  SELECT v, sum(CASE WHEN isa THEN 1 ELSE 0 END)::BIGINT AS na,
         sum(CASE WHEN isa THEN 0 ELSE 1 END)::BIGINT AS nb
  FROM u GROUP BY v
),
c AS (
  SELECT v,
         sum(na) OVER (ORDER BY v)::HUGEINT AS ca,
         sum(nb) OVER (ORDER BY v)::HUGEINT AS cb
  FROM g
),
t AS (SELECT sum(na)::HUGEINT AS n_a, sum(nb)::HUGEINT AS n_b FROM g)
SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       CAST(max(abs(c.ca * t.n_b - c.cb * t.n_a)) AS BIGINT) AS ks_num,
       CAST(1000000 * max(abs(c.ca * t.n_b - c.cb * t.n_a))
            // (t.n_a * t.n_b) AS BIGINT) AS ks_e6
FROM c CROSS JOIN t
GROUP BY t.n_a, t.n_b
"""

# Benford first-digit audit: integer decimation (no float log10).
_BENFORD_SQL = """
WITH RECURSIVE cc AS (
  SELECT abs(CAST(floor(value * 100) AS BIGINT)) AS c
  FROM events WHERE CAST(floor(value * 100) AS BIGINT) <> 0
),
dig AS (
  SELECT c FROM cc
  UNION ALL
  SELECT c // 10 FROM dig WHERE c >= 10
),
first_d AS (SELECT c AS digit FROM dig WHERE c < 10),
agg AS (SELECT digit, count(*)::BIGINT AS n FROM first_d GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS total FROM agg)
SELECT a.digit::BIGINT AS digit, a.n,
       CAST(1000000 * a.n // t.total AS BIGINT) AS share_e6
FROM agg a CROSS JOIN t ORDER BY a.digit
"""

# Contrastive hard negatives: ann_cosine_topk's float convention
# (round 6 dp) with a label-mismatch mask.
_HARD_NEG_SQL = """
SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       CAST(c.label AS BIGINT) AS label,
       round(list_cosine_similarity(q.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]), 6) AS sim_r
FROM embeddings q, embeddings c
WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id AND c.label <> q.label
QUALIFY row_number() OVER (PARTITION BY q.vec_id
    ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) DESC,
             c.vec_id) <= 5
ORDER BY query_id, sim_r DESC, vec_id
"""

# Deterministic split audit: FNV-1a(doc_id string) % 100 buckets,
# recomputed byte-by-byte in a recursive CTE like _SAMPLE_HASH_SQL.
_SPLIT_ASSIGN_SQL = """
WITH RECURSIVE eb AS (
  SELECT doc_id, hex(encode(CAST(doc_id AS VARCHAR))) AS hx,
         octet_length(encode(CAST(doc_id AS VARCHAR))) AS n
  FROM documents
),
fnv AS (
  SELECT doc_id, n, 0 AS i,
         CAST('14695981039346656037' AS UHUGEINT) AS h FROM eb
  UNION ALL
  SELECT f.doc_id, f.n, f.i + 1,
         (xor(f.h, CAST(CAST('0x' || substr(eb.hx, 2*f.i+1, 2) AS INT)
                        AS UHUGEINT))
          * CAST(1099511628211 AS UHUGEINT))
           % CAST('18446744073709551616' AS UHUGEINT)
  FROM fnv f JOIN eb ON eb.doc_id = f.doc_id
  WHERE f.i < f.n
),
b AS (
  SELECT d.doc_id, d.lang,
         CAST(fnv.h AS UBIGINT) % 100 AS bucket
  FROM documents d JOIN fnv ON fnv.doc_id = d.doc_id AND fnv.i = fnv.n
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       lang, count(*)::BIGINT AS n_docs
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""

# Inverse-size source weights: floor(1e6 * N / (k * n_source)).
_SOURCE_WEIGHTS_SQL = """
WITH s AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS k FROM s)
SELECT s.source, s.n AS n_docs,
       CAST(1000000 * t.total // (t.k * s.n) AS BIGINT) AS weight_e6
FROM s CROSS JOIN t ORDER BY s.source
"""

# Runs test: binarize the dense hourly series against its own mean
# (exact x*T > total), count maximal same-side runs.
_RUNS_TEST_SQL = """
WITH b AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour
  FROM events
),
g AS (SELECT event_type, hour, count(*)::BIGINT AS x FROM b GROUP BY 1, 2),
bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM b),
types AS (SELECT DISTINCT event_type FROM b),
grid AS (
  SELECT t.event_type, bo.lo + u.i AS hour
  FROM types t CROSS JOIN bounds bo
  CROSS JOIN (
    SELECT unnest(range(0, (SELECT hi - lo + 1 FROM bounds)))::BIGINT AS i
  ) u
),
dense AS (
  SELECT grid.event_type, grid.hour, COALESCE(g.x, 0)::BIGINT AS x,
         (SELECT hi - lo + 1 FROM bounds)::BIGINT AS t
  FROM grid LEFT JOIN g
    ON g.event_type = grid.event_type AND g.hour = grid.hour
),
tot AS (SELECT event_type, sum(x)::BIGINT AS s FROM dense GROUP BY 1),
ab AS (
  SELECT d.event_type, d.hour,
         CASE WHEN d.x * d.t > tot.s THEN 1 ELSE 0 END AS above
  FROM dense d JOIN tot USING (event_type)
),
w AS (
  SELECT event_type, above,
         lag(above) OVER (PARTITION BY event_type ORDER BY hour) AS pa
  FROM ab
)
SELECT event_type,
       sum(above)::BIGINT AS n_above,
       (count(*) - sum(above))::BIGINT AS n_below,
       (1 + sum(CASE WHEN pa IS NOT NULL AND above != pa
                     THEN 1 ELSE 0 END))::BIGINT AS n_runs
FROM w GROUP BY 1 ORDER BY 1
"""

# N-gram novelty by corpus order: a gram is novel to its min(doc_id).
_NGRAM_NOVELTY_SQL = """
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS gram
  FROM toks CROSS JOIN (
    SELECT unnest(range(1, 100000))::BIGINT AS i
  ) u
  WHERE i + 2 <= len(ws)
),
own AS (SELECT gram, min(doc_id) AS owner FROM grams GROUP BY 1),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM grams GROUP BY 1),
nov AS (SELECT owner AS doc_id, count(*)::BIGINT AS n_novel
        FROM own GROUP BY 1)
SELECT d.doc_id, COALESCE(t.n_grams, 0)::BIGINT AS n_grams,
       COALESCE(v.n_novel, 0)::BIGINT AS n_novel,
       COALESCE(CAST(1000000 * v.n_novel // t.n_grams AS BIGINT), 0)
         AS novelty_e6
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN nov v USING (doc_id)
ORDER BY d.doc_id
"""

# Squared cosine between per-user count vectors of two types:
# dot^2 / (|a|^2 |b|^2) stays an exact integer ratio (no sqrt).
_TYPE_COSINE2_SQL = """
WITH cu AS (
  SELECT event_type, user_id, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
dots AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         sum(a.c * b.c)::HUGEINT AS dot
  FROM cu a JOIN cu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
norms AS (
  SELECT event_type, sum(c * c)::HUGEINT AS n2 FROM cu GROUP BY 1
)
SELECT d.ta AS type_a, d.tb AS type_b, CAST(d.dot AS BIGINT) AS dot,
       CAST(na.n2 AS BIGINT) AS norm2_a, CAST(nb.n2 AS BIGINT) AS norm2_b,
       CAST(1000000 * d.dot * d.dot // (na.n2 * nb.n2) AS BIGINT)
         AS cos2_e6
FROM dots d
JOIN norms na ON na.event_type = d.ta
JOIN norms nb ON nb.event_type = d.tb
ORDER BY 1, 2
"""

# Row-level min-max feature scaling per type (constant types -> 0).
_MINMAX_SQL = """
WITH mm AS (
  SELECT event_type,
         min(CAST(floor(value * 100) AS BIGINT)) AS lo,
         max(CAST(floor(value * 100) AS BIGINT)) AS hi
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       CAST(floor(e.value * 100) AS BIGINT) AS value_cents,
       CAST(CASE WHEN mm.hi > mm.lo THEN
              (1000000 * (CAST(floor(e.value * 100) AS BIGINT) - mm.lo))
                // (mm.hi - mm.lo)
            ELSE 0 END AS BIGINT) AS z_e6
FROM events e JOIN mm USING (event_type)
ORDER BY e.event_id
"""

# Mann-Whitney U (doubled for tie half-credit) via the rank-sum
# identity over the value histogram -- no pair join materializes.
_MANN_WHITNEY_SQL = """
WITH u AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS v,
         (event_type = 'purchase') AS isa
  FROM events WHERE event_type IN ('purchase', 'click')
),
g AS (
  SELECT v, count(*)::BIGINT AS c,
         sum(CASE WHEN isa THEN 1 ELSE 0 END)::BIGINT AS ca
  FROM u GROUP BY v
),
r AS (
  SELECT v, c, ca,
         sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS below
  FROM g
),
s AS (
  SELECT sum(ca * (2 * COALESCE(below, 0) + c + 1))::BIGINT AS r2a,
         sum(ca)::BIGINT AS n_a, sum(c - ca)::BIGINT AS n_b
  FROM r
)
SELECT n_a, n_b,
       CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       CAST(2 * n_a * n_b - (r2a - n_a * (n_a + 1)) AS BIGINT) AS u2_b
FROM s
"""


def _build_skyline_layers_sql(layers: int = 3) -> str:
    """Onion peel unrolled: per layer, the orders_skyline window
    formulation (price-group max day + strict-suffix max), then
    EXCEPT the layer out and repeat."""
    parts = ["""
WITH o AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
),
pts AS (
  SELECT price_cents, day, count(*)::BIGINT AS n_orders,
         min(o_orderkey) AS min_orderkey
  FROM o GROUP BY 1, 2
),
s1 AS (SELECT price_cents, day FROM pts)"""]
    for i in range(1, layers + 1):
        parts.append(f""",
pm{i} AS (SELECT price_cents, max(day) AS day FROM s{i} GROUP BY 1),
sky{i} AS (
  SELECT price_cents, day,
         max(day) OVER (ORDER BY price_cents DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS best_prev
  FROM pm{i}
),
l{i} AS (
  SELECT price_cents, day FROM sky{i}
  WHERE best_prev IS NULL OR day > best_prev
),
s{i + 1} AS (
  SELECT price_cents, day FROM s{i}
  EXCEPT SELECT price_cents, day FROM l{i}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {i}::BIGINT AS layer, price_cents, day FROM l{i}"
        for i in range(1, layers + 1)
    )
    parts.append(f""",
lay AS ({unions})
SELECT lay.layer, lay.price_cents, lay.day, pts.n_orders,
       pts.min_orderkey
FROM lay JOIN pts USING (price_cents, day)
ORDER BY lay.layer, lay.price_cents DESC, lay.day
""")
    return "".join(parts)


_SKYLINE_LAYERS_SQL = _build_skyline_layers_sql()

# Inter-event gap histogram: exact log2 buckets via bit length
# (length(bin(x)) in DuckDB == int.bit_length in the engine).
_GAP_HIST_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_id FROM events
),
g AS (
  SELECT t - lag(t) OVER (PARTITION BY user_id
                          ORDER BY t, event_id) AS gap
  FROM e
),
b AS (
  SELECT CASE WHEN gap = 0 THEN 0
              ELSE length(bin(gap)) END::BIGINT AS bucket
  FROM g WHERE gap IS NOT NULL
)
SELECT bucket, count(*)::BIGINT AS n_gaps
FROM b GROUP BY 1 ORDER BY 1
"""

# Lexical diversity: TTR + hapax rate per doc, empty docs zeroed.
_LEX_DIVERSITY_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tc AS (SELECT doc_id, term, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
per AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         (count(*) FILTER (WHERE c = 1))::BIGINT AS n_hapax
  FROM tc GROUP BY 1
)
SELECT d.doc_id, COALESCE(p.n_tokens, 0)::BIGINT AS n_tokens,
       COALESCE(p.n_types, 0)::BIGINT AS n_types,
       COALESCE(p.n_hapax, 0)::BIGINT AS n_hapax,
       COALESCE(CAST(1000000 * p.n_types // p.n_tokens AS BIGINT), 0)
         AS ttr_e6,
       COALESCE(CAST(1000000 * p.n_hapax // p.n_types AS BIGINT), 0)
         AS hapax_e6
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY d.doc_id
"""

# Session-level rollup: the SQL reconstructs the gap sessions with
# the same (ts, event_id) tie order the engine's lexsort uses.
_SESSION_STATS_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events),
f AS (
  SELECT user_id, t, event_id,
    CASE WHEN lag(t) OVER w IS NULL
              OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
s AS (
  SELECT user_id, t,
    sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
),
g AS (
  SELECT user_id, sid, count(*)::BIGINT AS n, min(t) AS lo, max(t) AS hi
  FROM s GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_sessions,
  (count(*) FILTER (WHERE n = 1))::BIGINT AS n_bounce,
  CAST(1000000 * (count(*) FILTER (WHERE n = 1)) // count(*) AS BIGINT)
    AS bounce_e6,
  sum(hi - lo)::BIGINT AS sum_duration_us,
  max(hi - lo)::BIGINT AS max_duration_us,
  CAST(sum(hi - lo) // count(*) AS BIGINT) AS mean_duration_us
FROM g
"""

# Bitmap-index audience algebra: click AND purchase AND NOT error.
_TYPE_ALGEBRA_SQL = """
WITH um AS (
  SELECT user_id,
    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_c,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p,
    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_e
  FROM events GROUP BY 1
),
m AS (
  SELECT user_id FROM um WHERE has_c = 1 AND has_p = 1 AND has_e = 0
)
SELECT (SELECT count(*) FROM um)::BIGINT AS n_users_total,
       count(*)::BIGINT AS n_matching,
       COALESCE(min(user_id), -1)::BIGINT AS min_user_id,
       COALESCE(max(user_id), -1)::BIGINT AS max_user_id
FROM m
"""

# Linear multi-touch attribution: each purchase splits 1e6 micro-
# credits equally (floor) over the user's touches in the prior 24h,
# window membership by the engine's (ts, event_id) sort order.
_LINEAR_ATTR_SQL = """
WITH conv AS (
  SELECT user_id, epoch_us(ts) AS cts, event_id AS cid
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, epoch_us(ts) AS tts, event_id AS tid, event_type
  FROM events
),
pairs AS (
  SELECT c.cid, t.event_type
  FROM conv c JOIN touch t ON t.user_id = c.user_id
  WHERE t.tts >= c.cts - 86400000000
    AND (t.tts < c.cts OR (t.tts = c.cts AND t.tid <= c.cid))
),
counts AS (SELECT cid, count(*)::BIGINT AS n FROM pairs GROUP BY 1)
SELECT p.event_type, count(*)::BIGINT AS n_touches,
       sum(1000000 // c.n)::BIGINT AS credit_e6
FROM pairs p JOIN counts c USING (cid)
GROUP BY 1 ORDER BY 1
"""

# Power-user thresholds: exact lower quantiles (rank ceil(q*n)) of
# the per-user event-count distribution.
_USER_COUNT_Q_SQL = """
WITH uc AS (
  SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY 1
),
r AS (
  SELECT c, row_number() OVER (ORDER BY c) AS rn,
         count(*) OVER () AS n
  FROM uc
)
SELECT 0::BIGINT AS q_e2, min(c)::BIGINT AS value FROM uc
UNION ALL
SELECT 50, c FROM r WHERE rn = (n * 50 + 99) // 100
UNION ALL
SELECT 90, c FROM r WHERE rn = (n * 90 + 99) // 100
UNION ALL
SELECT 99, c FROM r WHERE rn = (n * 99 + 99) // 100
UNION ALL
SELECT 100, max(c)::BIGINT FROM uc
ORDER BY q_e2
"""

# Moving-average crossover: MA_f vs MA_s compared by exact integer
# cross-multiplication (sum_f*slow vs sum_s*fast) on the dense grid.
_MA_CROSS_SQL = """
WITH b AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour
  FROM events
),
g AS (SELECT event_type, hour, count(*)::BIGINT AS x FROM b GROUP BY 1, 2),
bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM b),
types AS (SELECT DISTINCT event_type FROM b),
grid AS (
  SELECT t.event_type, bo.lo + u.i AS hour
  FROM types t CROSS JOIN bounds bo
  CROSS JOIN (
    SELECT unnest(range(0, (SELECT hi - lo + 1 FROM bounds)))::BIGINT AS i
  ) u
),
dense AS (
  SELECT grid.event_type, grid.hour, COALESCE(g.x, 0)::BIGINT AS x
  FROM grid LEFT JOIN g
    ON g.event_type = grid.event_type AND g.hour = grid.hour
),
w AS (
  SELECT event_type, hour,
    sum(x) OVER (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sf,
    sum(x) OVER (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS ss,
    row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
  FROM dense
),
s AS (
  SELECT event_type, hour, sign(sf * 12 - ss * 3)::BIGINT AS sgn,
         lag(sign(sf * 12 - ss * 3)::BIGINT) OVER (
           PARTITION BY event_type ORDER BY hour) AS psgn
  FROM w WHERE rn >= 12
),
c AS (
  SELECT event_type, hour,
    CASE WHEN psgn IS NOT NULL AND sgn > 0 AND psgn <= 0
         THEN 1 ELSE 0 END AS gold,
    CASE WHEN psgn IS NOT NULL AND sgn < 0 AND psgn >= 0
         THEN 1 ELSE 0 END AS death
  FROM s
),
agg AS (
  SELECT event_type, sum(gold)::BIGINT AS n_golden,
         sum(death)::BIGINT AS n_death,
         COALESCE(min(CASE WHEN gold = 1 OR death = 1 THEN hour END),
                  -1)::BIGINT AS first_cross_hour
  FROM c GROUP BY 1
)
SELECT t.event_type, COALESCE(a.n_golden, 0)::BIGINT AS n_golden,
       COALESCE(a.n_death, 0)::BIGINT AS n_death,
       COALESCE(a.first_cross_hour, -1)::BIGINT AS first_cross_hour
FROM types t LEFT JOIN agg a USING (event_type)
ORDER BY t.event_type
"""

# Year-over-year growth: sign-safe exact percentage vs the previous
# CALENDAR year only (gap years reset the comparison).
_YOY_SQL = """
WITH a AS (
  SELECT year(o_orderdate)::BIGINT AS y,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1
),
w AS (
  SELECT y, cents, lag(y) OVER (ORDER BY y) AS py,
         lag(cents) OVER (ORDER BY y) AS pc
  FROM a
)
SELECT y AS o_year, cents AS revenue_cents,
  CAST(CASE WHEN py = y - 1 AND pc != 0 THEN 1 ELSE 0 END AS BIGINT)
    AS has_prev,
  CAST(CASE WHEN py = y - 1 AND pc != 0 THEN
         (CASE WHEN cents < pc THEN -1 ELSE 1 END)
           * ((1000000 * abs(cents - pc)) // pc)
       ELSE 0 END AS BIGINT) AS yoy_e6
FROM w ORDER BY y
"""

# Share-of-parent rollup: nation revenue within its region.
_REGION_SHARE_SQL = """
WITH nr AS (
  SELECT c.c_nationkey AS nat,
         sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
),
j AS (
  SELECT r.r_name, n.n_name, nr.cents, r.r_regionkey
  FROM nr
  JOIN nation n ON n.n_nationkey = nr.nat
  JOIN region r ON r.r_regionkey = n.n_regionkey
),
t AS (SELECT r_regionkey, sum(cents)::BIGINT AS tot FROM j GROUP BY 1)
SELECT j.r_name, j.n_name, j.cents AS revenue_cents,
       CAST(1000000 * j.cents // t.tot AS BIGINT) AS share_e6
FROM j JOIN t USING (r_regionkey)
ORDER BY j.r_name, share_e6 DESC, j.n_name
"""

# Event-sourced open-order backlog: +1 at order month, -1 at the
# order's LAST ship month, dense month grid, window running total.
_BACKLOG_SQL = """
WITH op AS (
  SELECT ((year(o_orderdate) - 1970) * 12
          + month(o_orderdate) - 1)::BIGINT AS month,
         count(*)::BIGINT AS n_opened
  FROM orders GROUP BY 1
),
cl0 AS (SELECT l_orderkey, max(l_shipdate) AS d FROM lineitem GROUP BY 1),
cl AS (
  SELECT ((year(d) - 1970) * 12 + month(d) - 1)::BIGINT AS month,
         count(*)::BIGINT AS n_closed
  FROM cl0 GROUP BY 1
),
b AS (
  SELECT min(month) AS lo, max(month) AS hi
  FROM (SELECT month FROM op UNION ALL SELECT month FROM cl)
),
grid AS (
  SELECT b.lo + u.i AS month
  FROM b CROSS JOIN (
    SELECT unnest(range(0, (SELECT hi - lo + 1 FROM b)))::BIGINT AS i
  ) u
),
j AS (
  SELECT g.month, COALESCE(op.n_opened, 0)::BIGINT AS n_opened,
         COALESCE(cl.n_closed, 0)::BIGINT AS n_closed
  FROM grid g LEFT JOIN op USING (month) LEFT JOIN cl USING (month)
)
SELECT month, n_opened, n_closed,
       (sum(n_opened - n_closed) OVER (ORDER BY month))::BIGINT AS backlog
FROM j ORDER BY month
"""

# Fano factor over the dense hourly grid: exact integer
# (T*sum(x^2) - (sum x)^2) / (T * sum x), zero hours free.
_BURSTINESS_SQL = """
WITH b AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour
  FROM events
),
g AS (SELECT event_type, hour, count(*)::BIGINT AS x FROM b GROUP BY 1, 2),
bounds AS (SELECT (max(hour) - min(hour) + 1)::HUGEINT AS t FROM b),
agg AS (
  SELECT event_type, sum(x)::HUGEINT AS sx, sum(x * x)::HUGEINT AS sx2
  FROM g GROUP BY 1
)
SELECT event_type, CAST(t AS BIGINT) AS n_hours,
       CAST(sx AS BIGINT) AS sum_x, CAST(sx2 AS BIGINT) AS sum_x2,
       CAST(1000000 * (t * sx2 - sx * sx) // (t * sx) AS BIGINT)
         AS fano_e6
FROM agg CROSS JOIN bounds ORDER BY event_type
"""

# Diurnal seasonality profile: exact shares + flat-profile index.
_SEASONALITY_SQL = """
WITH c AS (
  SELECT event_type,
         ((epoch_us(ts) // 3600000000) % 24)::BIGINT AS hod,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, sum(n)::BIGINT AS t FROM c GROUP BY 1)
SELECT c.event_type, c.hod AS hour_of_day, c.n AS n_events,
       CAST(1000000 * c.n // tot.t AS BIGINT) AS share_e6,
       CAST(1000000 * 24 * c.n // tot.t AS BIGINT) AS index_e6
FROM c JOIN tot USING (event_type)
ORDER BY 1, 2
"""

# Functional-dependency violation profile: l_orderkey -> l_returnflag.
_FD_CHECK_SQL = """
WITH kd AS (
  SELECT l_orderkey, count(DISTINCT l_returnflag)::BIGINT AS nd
  FROM lineitem GROUP BY 1
)
SELECT count(*)::BIGINT AS n_keys,
       (count(*) FILTER (WHERE nd > 1))::BIGINT AS n_violating_keys,
       max(nd)::BIGINT AS n_max_distinct
FROM kd
"""

# User lifespan histogram: two-level derived aggregate.
_USER_LIFESPAN_SQL = """
WITH u AS (
  SELECT user_id,
         ((epoch_us(max(ts)) - epoch_us(min(ts))) // 86400000000)::BIGINT
           AS d
  FROM events GROUP BY 1
)
SELECT d AS lifespan_days, count(*)::BIGINT AS n_users
FROM u GROUP BY 1 ORDER BY 1
"""

# Linear-interpolation gap fill on the dense hourly grid: sign-safe
# truncating division (DuckDB // truncates negatives), edge copy.
_RESAMPLE_LERP_SQL = """
WITH b AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
g AS (SELECT event_type, hour, sum(cents)::BIGINT AS x FROM b GROUP BY 1, 2),
bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM b),
types AS (SELECT DISTINCT event_type FROM b),
grid AS (
  SELECT t.event_type, bo.lo + u.i AS hour
  FROM types t CROSS JOIN bounds bo
  CROSS JOIN (
    SELECT unnest(range(0, (SELECT hi - lo + 1 FROM bounds)))::BIGINT AS i
  ) u
),
dense AS (
  SELECT grid.event_type, grid.hour, g.x
  FROM grid LEFT JOIN g
    ON g.event_type = grid.event_type AND g.hour = grid.hour
),
w AS (
  SELECT event_type, hour, x,
    last_value(x IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN x IS NOT NULL THEN hour END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(x IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN x IS NOT NULL THEN hour END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM dense
)
SELECT event_type, hour,
  CAST(CASE WHEN x IS NOT NULL THEN x
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (CASE WHEN nv < pv THEN -1 ELSE 1 END)
                   * ((abs(nv - pv) * (hour - ph)) // (nh - ph))
       END AS BIGINT) AS value_cents,
  CAST(CASE WHEN x IS NOT NULL THEN 0
            WHEN pv IS NULL OR nv IS NULL THEN 2
            ELSE 1 END AS BIGINT) AS fill_kind
FROM w ORDER BY event_type, hour
"""

# TPC-H Q11 shape: global-fraction HAVING via exact integer
# cross-multiplication (rev * 10000 > bp * total), HUGEINT-safe.
_Q11_SQL = """
WITH nr AS (
  SELECT s.s_nationkey AS nat,
         sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT))::HUGEINT AS rev
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1
),
tot AS (SELECT sum(rev)::HUGEINT AS t FROM nr)
SELECT n.n_name, CAST(nr.rev AS BIGINT) AS revenue_cents,
       CAST(1000000 * nr.rev // tot.t AS BIGINT) AS share_e6
FROM nr JOIN nation n ON n.n_nationkey = nr.nat CROSS JOIN tot
WHERE nr.rev * 10000 > 400 * tot.t
ORDER BY revenue_cents DESC, n.n_name
"""

# Repeat-purchase cadence: LAG window gaps in whole days
# (microsecond floor-div, not calendar date_diff), per-segment rollup.
_ORDER_GAPS_SQL = """
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) AS d,
         lag(epoch_us(o_orderdate)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS pd
  FROM orders
),
g AS (
  SELECT c.c_mktsegment, (o.d - o.pd) // 86400000000 AS gap
  FROM o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.pd IS NOT NULL
)
SELECT c_mktsegment, count(*)::BIGINT AS n_gaps,
       sum(gap)::BIGINT AS sum_gap_days,
       max(gap)::BIGINT AS max_gap_days,
       CAST(1000000 * sum(gap)::HUGEINT // count(*) AS BIGINT)
         AS mean_gap_days_e6
FROM g GROUP BY 1 ORDER BY 1
"""

# Simpson/HHI concentration: exact rationals floor(1e6 * sum(c^2)/n^2)
# and the reciprocal effective-user count, HUGEINT on the SQL side.
_TYPE_HHI_SQL = """
WITH cu AS (
  SELECT event_type, user_id, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type, sum(c)::HUGEINT AS n, sum(c * c)::HUGEINT AS s2,
         count(*)::BIGINT AS n_users
  FROM cu GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_events, n_users,
       CAST(1000000 * s2 // (n * n) AS BIGINT) AS hhi_e6,
       CAST(1000000 * n * n // s2 AS BIGINT) AS effective_users_e6
FROM agg ORDER BY event_type
"""

# Type-pair audience Jaccard: exact |A∩B| / (|A|+|B|-|A∩B|).
_TYPE_JACCARD_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tc AS (SELECT event_type, count(*)::BIGINT AS n FROM ut GROUP BY 1),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         count(*)::BIGINT AS n_common
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.ta AS type_a, p.tb AS type_b, ca.n AS n_a, cb.n AS n_b,
       p.n_common,
       CAST(1000000 * p.n_common // (ca.n + cb.n - p.n_common)
            AS BIGINT) AS jaccard_e6
FROM pairs p
JOIN tc ca ON ca.event_type = p.ta
JOIN tc cb ON cb.event_type = p.tb
ORDER BY 1, 2
"""

# CUSUM change-point: integer deviation D_t = T*cumsum - t*N over the
# dense hourly grid; argmax |D_t|, earliest hour on ties.
_CUSUM_SQL = """
WITH bounds AS (
  SELECT min(epoch_us(ts) // 3600000000) AS h_lo,
         max(epoch_us(ts) // 3600000000) AS h_hi
  FROM events
),
counts AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT t.event_type, b.h_lo + u.i AS h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN bounds b
  CROSS JOIN (
    SELECT unnest(range(0, (SELECT h_hi - h_lo + 1 FROM bounds)))::BIGINT AS i
  ) u
),
dense AS (
  SELECT g.event_type, g.h, COALESCE(c.c, 0)::BIGINT AS x
  FROM grid g LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.h = g.h
),
cums AS (
  SELECT event_type, h,
         sum(x) OVER (PARTITION BY event_type ORDER BY h) AS cum,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         sum(x) OVER (PARTITION BY event_type) AS tot,
         count(*) OVER (PARTITION BY event_type) AS span
  FROM dense
),
d AS (
  SELECT event_type, h,
         abs(span * cum - rn * tot)::BIGINT AS dabs,
         span, tot,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY abs(span * cum - rn * tot) DESC, h ASC) AS pick
  FROM cums
)
SELECT event_type, h AS cp_hour, dabs AS d_abs_max,
       span::BIGINT AS n_hours, tot::BIGINT AS total_events
FROM d WHERE pick = 1
ORDER BY event_type
"""

# Decile lift: exact NTILE(10) by (shifted acctbal cents, custkey),
# responder = EXISTS order, exact integer response rates.
_DECILE_LIFT_SQL = """
WITH resp AS (
  SELECT c_custkey,
         CAST(floor(c_acctbal * 100) AS BIGINT) + 100000 AS score,
         CASE WHEN EXISTS (
           SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
         ) THEN 1 ELSE 0 END AS r
  FROM customer c
),
rk AS (
  SELECT *, ntile(10) OVER (ORDER BY score, c_custkey) AS decile FROM resp
)
SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_cust,
       sum(r)::BIGINT AS n_resp,
       (sum(r)::HUGEINT * 1000000 // count(*)::HUGEINT)::BIGINT
         AS resp_rate_e6
FROM rk GROUP BY decile ORDER BY decile
"""

# AR(1) over the densified hourly count series: dense grid via
# range-unnest, lag pairs by hour+1 self-join, exact HUGEINT
# sufficient sums, floor-division slope with the trunc/floor CASE.
_HOURLY_AR1_SQL = """
WITH b AS (
  SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour
  FROM events
),
g AS (SELECT event_type, hour, count(*)::BIGINT AS c FROM b GROUP BY 1, 2),
bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM b),
types AS (SELECT DISTINCT event_type FROM b),
grid AS (
  SELECT t.event_type, bo.lo + u.i AS hour
  FROM types t CROSS JOIN bounds bo
  CROSS JOIN (
    SELECT unnest(range(0, (SELECT hi - lo + 1 FROM bounds)))::BIGINT AS i
  ) u
),
dense AS (
  SELECT grid.event_type, grid.hour, coalesce(g.c, 0)::BIGINT AS c
  FROM grid LEFT JOIN g USING (event_type, hour)
),
pairs AS (
  SELECT d1.event_type, d1.c AS x, d2.c AS y
  FROM dense d1 JOIN dense d2
    ON d2.event_type = d1.event_type AND d2.hour = d1.hour + 1
),
s AS (
  SELECT event_type, count(*)::BIGINT AS m, sum(x)::BIGINT AS sum_x,
         sum(y)::BIGINT AS sum_y, sum(x::HUGEINT * y) AS sxy,
         sum(x::HUGEINT * x) AS sxx
  FROM pairs GROUP BY 1
)
SELECT event_type, m, sum_x, sxy::BIGINT AS sum_xy,
       (CASE WHEN (m::HUGEINT * sxx - sum_x::HUGEINT * sum_x) = 0 THEN 0
             WHEN ((m::HUGEINT * sxy - sum_x::HUGEINT * sum_y) * 1000000)
                  % (m::HUGEINT * sxx - sum_x::HUGEINT * sum_x) <> 0
              AND (m::HUGEINT * sxy - sum_x::HUGEINT * sum_y) < 0
               THEN ((m::HUGEINT * sxy - sum_x::HUGEINT * sum_y) * 1000000)
                    // (m::HUGEINT * sxx - sum_x::HUGEINT * sum_x) - 1
             ELSE ((m::HUGEINT * sxy - sum_x::HUGEINT * sum_y) * 1000000)
                  // (m::HUGEINT * sxx - sum_x::HUGEINT * sum_x) END
       )::BIGINT AS phi_e6
FROM s ORDER BY event_type
"""

# Exact Gini over the per-type value histogram: rank sums close to
# v*((C+c)(C+c+1)-C(C+1))/2 per distinct value (consecutive-integer
# products are even -> // 2 exact); numerator nonnegative so HUGEINT
# truncating // equals floor.
_TYPE_GINI_SQL = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT event_type, cents, count(*)::BIGINT AS c FROM c GROUP BY 1, 2
),
w AS (
  SELECT event_type, cents, c,
         (sum(c) OVER (PARTITION BY event_type ORDER BY cents)
          - c)::HUGEINT AS cb,
         sum(c) OVER (PARTITION BY event_type)::HUGEINT AS n,
         sum(c * cents) OVER (PARTITION BY event_type)::HUGEINT AS sumx
  FROM g
),
t AS (
  SELECT event_type, n, sumx,
         sum(cents::HUGEINT
             * ((cb + c) * (cb + c + 1) - cb * (cb + 1)) // 2)
           AS two_sum_ix
  FROM w GROUP BY event_type, n, sumx
)
SELECT event_type, n::BIGINT AS n, sumx::BIGINT AS sum_cents,
       (CASE WHEN sumx = 0 THEN 0
             ELSE (2 * two_sum_ix - (n + 1) * sumx) * 1000000
                  // (n * sumx) END)::BIGINT AS gini_e6
FROM t ORDER BY event_type
"""

# UNPIVOT: four measures to long form, uniform floor(v*1e4)
# fixed-point, deterministic 1-in-31 orderkey sample.
_MELT_SQL = """
WITH f AS (SELECT * FROM lineitem WHERE l_orderkey % 31 = 0)
SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
       'quantity' AS measure,
       CAST(floor(l_quantity * 10000) AS BIGINT) AS value_e4 FROM f
UNION ALL
SELECT l_orderkey, l_linenumber::BIGINT, 'extendedprice',
       CAST(floor(l_extendedprice * 10000) AS BIGINT) FROM f
UNION ALL
SELECT l_orderkey, l_linenumber::BIGINT, 'discount',
       CAST(floor(l_discount * 10000) AS BIGINT) FROM f
UNION ALL
SELECT l_orderkey, l_linenumber::BIGINT, 'tax',
       CAST(floor(l_tax * 10000) AS BIGINT) FROM f
ORDER BY l_orderkey, l_linenumber, measure
"""

# Equi-width histogram: bin = min(floor(value/50), 9), nonempty bins.
_VALUE_HIST_SQL = """
SELECT event_type,
       least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin,
       count(*)::BIGINT AS n_obs
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

# Grouped weighted lower median: smallest cents whose cumulative
# quantity-weight reaches half the group total.
_WMEDIAN_SQL = """
WITH c AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(floor(l_quantity) AS BIGINT) AS w
  FROM lineitem
),
g AS (
  SELECT l_returnflag, cents, sum(w)::BIGINT AS w
  FROM c GROUP BY 1, 2
),
cw AS (
  SELECT l_returnflag, cents,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents)::BIGINT
           AS cum,
         sum(w) OVER (PARTITION BY l_returnflag)::BIGINT AS tot
  FROM g
)
SELECT l_returnflag, tot AS total_w,
       min(cents)::BIGINT AS wmedian_cents
FROM cw WHERE 2 * cum >= tot
GROUP BY l_returnflag, tot ORDER BY l_returnflag
"""

# Windowed stream-stream self-join: ordered same-user event pairs
# within 5 minutes, (ts, event_id)-lexicographic so ties pair in one
# deterministic direction and rows never pair with themselves.
_COOCCUR_SQL = """
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*)::BIGINT AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
GROUP BY 1, 2 ORDER BY 1, 2
"""

# Chi-square contingency cells: exact integer-scaled contribution
# floor(1e6 * (O*N - R*C)^2 / (R*C*N)); every term nonnegative, so
# truncating HUGEINT // equals floor.
_HOUR_CHI2_SQL = """
WITH c AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000 % 24)::BIGINT AS hour,
         count(*)::BIGINT AS n_obs
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT c.*,
         sum(n_obs) OVER ()::HUGEINT AS total,
         sum(n_obs) OVER (PARTITION BY event_type)::HUGEINT AS row_tot,
         sum(n_obs) OVER (PARTITION BY hour)::HUGEINT AS col_tot
  FROM c
)
SELECT event_type, hour, n_obs,
       (((n_obs * total - row_tot * col_tot)
         * (n_obs * total - row_tot * col_tot) * 1000000)
        // (row_tot * col_tot * total))::BIGINT AS chi2_cell_e6
FROM t ORDER BY event_type, hour
"""

_CONTAMINATION_SQL = """
WITH needles AS (
  SELECT doc_id AS src_id, substr(text, 21, 32) AS needle
  FROM documents
  WHERE doc_id % 97 = 0 AND length(text) >= 52
)
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM documents d JOIN needles n ON position(n.needle IN d.text) > 0
GROUP BY d.doc_id
ORDER BY d.doc_id
"""

# NOTE: the oracle restates the ENGINE's extraction semantics -- first
# regex match of "k": <int> anywhere in the payload string (nested keys
# count; a float's integer prefix is taken) -- not json_extract('$.k'),
# so both sides agree by construction on ANY payload shape, not just
# the flat '{"k": N}' the current generator emits.
_PROPS_STATS_SQL = r"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(k_str) AS BIGINT) AS n_with_k,
       CAST(COALESCE(SUM(CAST(k_str AS BIGINT)), 0) AS BIGINT) AS sum_k
FROM (
    SELECT event_type,
           NULLIF(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1), '') AS k_str
    FROM events
)
GROUP BY event_type
ORDER BY event_type
"""

_HASH_JOIN_FULL_SQL = """
SELECT o.o_orderkey,
       COALESCE(o.o_custkey, e.user_id) AS o_custkey,
       e.event_id,
       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS o_total_cents,
       CAST(floor(e.value * 100) AS BIGINT) AS value_cents
FROM orders o FULL OUTER JOIN events e ON e.user_id = o.o_custkey
ORDER BY o_custkey, o.o_orderkey, e.event_id
"""

_GLOBAL_RANK_SQL = """
SELECT event_id,
       CAST(floor(value * 100) AS BIGINT) AS value_cents,
       CAST(ROW_NUMBER() OVER (
            ORDER BY CAST(floor(value * 100) AS BIGINT) DESC, event_id
       ) AS BIGINT) AS rnk
FROM events
ORDER BY rnk
"""

_HASH_JOIN_SQL = """
SELECT o.o_orderkey, o.o_custkey, e.event_id,
       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS o_total_cents,
       CAST(floor(e.value * 100) AS BIGINT) AS value_cents
FROM orders o JOIN events e ON e.user_id = o.o_custkey
ORDER BY o.o_orderkey, e.event_id
"""

_CUBE_SQL = """
SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events
GROUP BY CUBE(event_type, CAST(user_id % 10 AS BIGINT))
ORDER BY event_type NULLS LAST, user_bucket NULLS LAST
"""

_ROLLUP_SQL = """
SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events
GROUP BY ROLLUP(event_type, CAST(user_id % 10 AS BIGINT))
ORDER BY event_type NULLS LAST, user_bucket NULLS LAST
"""

_RUNNING_TOTAL_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS cum_value_cents
FROM events ORDER BY event_id
"""

# Sink-variant digest: same window function, outer GROUP BY
# user_id % 64 -- the Ray side digests the parquet sink read-back.
_RUNNING_TOTAL_SINK_SQL = f"""
WITH rt AS ({_RUNNING_TOTAL_SQL})
SELECT CAST(user_id % 64 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS sum_event_id,
       CAST(sum(cum_value_cents) AS BIGINT) AS sum_cum_cents
FROM rt GROUP BY bucket ORDER BY bucket
"""

_TYPE_PIVOT_SQL = """
SELECT user_id,
       CAST(COUNT(CASE WHEN event_type='click' THEN 1 END) AS BIGINT) AS n_click,
       CAST(COUNT(CASE WHEN event_type='error' THEN 1 END) AS BIGINT) AS n_error,
       CAST(COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS BIGINT)
         AS n_purchase,
       CAST(COUNT(CASE WHEN event_type='signup' THEN 1 END) AS BIGINT) AS n_signup,
       CAST(COUNT(CASE WHEN event_type='view' THEN 1 END) AS BIGINT) AS n_view,
       CAST(COALESCE(SUM(CASE WHEN event_type='purchase'
                     THEN CAST(floor(value*100) AS BIGINT) END), 0) AS BIGINT)
         AS purchase_cents
FROM events GROUP BY user_id ORDER BY user_id
"""

_GROUP_TOPK_SQL = """
WITH r AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rank
  FROM events
)
SELECT user_id, CAST(rank AS BIGINT) AS rank, event_id, ts, value
FROM r WHERE rank <= 3 ORDER BY user_id, rank
"""

_QUANTILES_SQL = """
WITH c AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
l AS (SELECT quantile_disc(cents, [0.25, 0.5, 0.75, 0.9, 0.99]) AS v FROM c)
SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
       CAST(unnest(v) AS BIGINT) AS value_cents FROM l
"""


_USER_DISTINCT_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""

# KMV distinct sketch: the estimator is DETERMINISTIC given the hash
# function, so the oracle reproduces the engine's k-minimum-values
# estimate bit-for-bit -- the same recursive FNV-1a fold as
# _SAMPLE_HASH_SQL over DISTINCT user_ids, then murmur3's fmix64
# finalizer restated in UHUGEINT mod-2^64 arithmetic (>>33 is integer
# division by 2^33), then the k-th smallest distinct finalized hash
# per type feeds floor((k-1)*2^64 / h_k) (exact count when a type has
# fewer than k distinct hashes).
_KMV_K = 64
_USER_KMV_SQL = f"""
WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events),
ub AS (
  SELECT user_id, hex(encode(CAST(user_id AS VARCHAR))) AS hx,
         octet_length(encode(CAST(user_id AS VARCHAR))) AS n
  FROM u
),
fnv AS (
  SELECT user_id, n, 0 AS i,
         CAST('14695981039346656037' AS UHUGEINT) AS h FROM ub
  UNION ALL
  SELECT f.user_id, f.n, f.i + 1,
         (xor(f.h, CAST(CAST('0x' || substr(ub.hx, 2*f.i+1, 2) AS INT)
                        AS UHUGEINT))
          * CAST(1099511628211 AS UHUGEINT))
           % CAST('18446744073709551616' AS UHUGEINT)
  FROM fnv f JOIN ub ON ub.user_id = f.user_id
  WHERE f.i < f.n
),
m0 AS (SELECT user_id, h FROM fnv WHERE i = n),
m1 AS (SELECT user_id, xor(h, h // CAST(8589934592 AS UHUGEINT)) AS h FROM m0),
m2 AS (SELECT user_id,
              (h * CAST('18397679294719823053' AS UHUGEINT))
                % CAST('18446744073709551616' AS UHUGEINT) AS h FROM m1),
m3 AS (SELECT user_id, xor(h, h // CAST(8589934592 AS UHUGEINT)) AS h FROM m2),
m4 AS (SELECT user_id,
              (h * CAST('14181476777654086739' AS UHUGEINT))
                % CAST('18446744073709551616' AS UHUGEINT) AS h FROM m3),
uh AS (SELECT user_id, xor(h, h // CAST(8589934592 AS UHUGEINT)) AS h FROM m4),
pairs AS (
  SELECT DISTINCT e.event_type, uh.h
  FROM events e JOIN uh ON uh.user_id = e.user_id
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r,
         count(*) OVER (PARTITION BY event_type) AS c
  FROM pairs
),
est AS (
  -- NB: greatest()/least() on UHUGEINT return DOUBLE in DuckDB 1.0
  -- (a cast would then ROUND, not floor) -- stay in UHUGEINT via CASE
  SELECT event_type,
         CASE WHEN c < {_KMV_K} THEN CAST(c AS UHUGEINT)
              ELSE (CAST({_KMV_K - 1} AS UHUGEINT)
                    * CAST('18446744073709551616' AS UHUGEINT))
                   // (CASE WHEN h = CAST(0 AS UHUGEINT)
                            THEN CAST(1 AS UHUGEINT) ELSE h END)
         END AS e
  FROM ranked WHERE r = least(c, {_KMV_K})
)
SELECT event_type,
       CAST(CASE WHEN e > CAST(9223372036854775807 AS UHUGEINT)
                 THEN CAST(9223372036854775807 AS UHUGEINT)
                 ELSE e END AS BIGINT) AS n_users_kmv
FROM est
ORDER BY event_type
"""

# Cross-document duplicated 8-gram density (the map-reduce restating
# of exact-substring dedup): a gram occurrence is duplicated iff its
# exact word-8-gram string occurs >= 2 times corpus-wide.
# Weighted deterministic sampling: fmix64(doc_id) restated in
# UHUGEINT arithmetic (same idiom as the KMV oracle), kept iff
# coin < min(999999, n_chars * 500).
_WEIGHTED_SAMPLE_SQL = """
WITH m0 AS (SELECT doc_id, n_chars, CAST(doc_id AS UHUGEINT) AS h
            FROM documents),
m1 AS (SELECT doc_id, n_chars,
              xor(h, h // CAST(8589934592 AS UHUGEINT)) AS h FROM m0),
m2 AS (SELECT doc_id, n_chars,
              (h * CAST('18397679294719823053' AS UHUGEINT))
                % CAST('18446744073709551616' AS UHUGEINT) AS h FROM m1),
m3 AS (SELECT doc_id, n_chars,
              xor(h, h // CAST(8589934592 AS UHUGEINT)) AS h FROM m2),
m4 AS (SELECT doc_id, n_chars,
              (h * CAST('14181476777654086739' AS UHUGEINT))
                % CAST('18446744073709551616' AS UHUGEINT) AS h FROM m3),
m5 AS (SELECT doc_id, n_chars,
              xor(h, h // CAST(8589934592 AS UHUGEINT)) AS h FROM m4)
SELECT doc_id, n_chars::BIGINT AS n_chars,
       CAST(h % CAST(1000000 AS UHUGEINT) AS BIGINT) AS coin
FROM m5
WHERE CAST(h % CAST(1000000 AS UHUGEINT) AS BIGINT)
        < least(999999, n_chars * 500)
ORDER BY doc_id
"""

# BFS hop distance from seeds {doc_id < 3}, 3 bounded min-propagation
# rounds over the same 3-out-degree graph; INF = 2^40, unreached -> -1.
_BFS_SQL = """
WITH n AS (SELECT count(*)::BIGINT AS nn FROM documents),
docs AS (SELECT doc_id FROM documents),
e AS (
  SELECT doc_id AS src, ((7 * doc_id + 1) % nn)::BIGINT AS dst
  FROM docs CROSS JOIN n
  UNION ALL
  SELECT doc_id, ((13 * doc_id + 5) % nn)::BIGINT FROM docs CROSS JOIN n
  UNION ALL
  SELECT doc_id, ((31 * doc_id + 11) % nn)::BIGINT FROM docs CROSS JOIN n
),
d0 AS (
  SELECT doc_id,
         CASE WHEN doc_id < 3 THEN 0 ELSE 1099511627776 END AS dist
  FROM docs
),
o1 AS (
  SELECT e.dst AS doc_id, min(least(d0.dist + 1, 1099511627776)) AS mo
  FROM e JOIN d0 ON d0.doc_id = e.src GROUP BY e.dst
),
d1 AS (
  SELECT d0.doc_id, least(d0.dist, COALESCE(o1.mo, 1099511627776)) AS dist
  FROM d0 LEFT JOIN o1 USING (doc_id)
),
o2 AS (
  SELECT e.dst AS doc_id, min(least(d1.dist + 1, 1099511627776)) AS mo
  FROM e JOIN d1 ON d1.doc_id = e.src GROUP BY e.dst
),
d2 AS (
  SELECT d1.doc_id, least(d1.dist, COALESCE(o2.mo, 1099511627776)) AS dist
  FROM d1 LEFT JOIN o2 USING (doc_id)
),
o3 AS (
  SELECT e.dst AS doc_id, min(least(d2.dist + 1, 1099511627776)) AS mo
  FROM e JOIN d2 ON d2.doc_id = e.src GROUP BY e.dst
),
d3 AS (
  SELECT d2.doc_id, least(d2.dist, COALESCE(o3.mo, 1099511627776)) AS dist
  FROM d2 LEFT JOIN o3 USING (doc_id)
)
SELECT doc_id,
       (CASE WHEN dist >= 1099511627776 THEN -1 ELSE dist END)::BIGINT
         AS dist
FROM d3 ORDER BY doc_id
"""

# PageRank, 2 scatter-gather iterations over the deterministic
# 3-out-degree link graph, exact integer ranks (scale 1e12; damped
# update (15*(R//N))//100 + (85*in_sum)//100, all floor ops).
_PAGERANK_SQL = """
WITH n AS (SELECT count(*)::BIGINT AS nn FROM documents),
docs AS (SELECT doc_id FROM documents),
r0 AS (
  SELECT doc_id, (1000000000000 // nn)::BIGINT AS r
  FROM docs CROSS JOIN n
),
e AS (
  SELECT doc_id AS src, ((7 * doc_id + 1) % nn)::BIGINT AS dst
  FROM docs CROSS JOIN n
  UNION ALL
  SELECT doc_id, ((13 * doc_id + 5) % nn)::BIGINT FROM docs CROSS JOIN n
  UNION ALL
  SELECT doc_id, ((31 * doc_id + 11) % nn)::BIGINT FROM docs CROSS JOIN n
),
s1 AS (
  SELECT e.dst AS doc_id, sum(r0.r // 3)::BIGINT AS s
  FROM e JOIN r0 ON r0.doc_id = e.src GROUP BY e.dst
),
r1 AS (
  SELECT d.doc_id,
         ((15 * (1000000000000 // n.nn)) // 100
            + (85 * COALESCE(s1.s, 0)) // 100)::BIGINT AS r
  FROM docs d CROSS JOIN n LEFT JOIN s1 ON s1.doc_id = d.doc_id
),
s2 AS (
  SELECT e.dst AS doc_id, sum(r1.r // 3)::BIGINT AS s
  FROM e JOIN r1 ON r1.doc_id = e.src GROUP BY e.dst
),
r2 AS (
  SELECT d.doc_id,
         ((15 * (1000000000000 // n.nn)) // 100
            + (85 * COALESCE(s2.s, 0)) // 100)::BIGINT AS r
  FROM docs d CROSS JOIN n LEFT JOIN s2 ON s2.doc_id = d.doc_id
)
SELECT doc_id, r FROM r2 ORDER BY doc_id
"""

# Distributed k-means, 2 Lloyd iterations on an exact integer grid
# (floor(v*2^20) points; centroid update floor(double(sum)/n) -- one
# IEEE double division on sums << 2^53; ties to the lowest cluster;
# emptied clusters keep their previous centroid).
_KMEANS_SQL = """
WITH x AS (
  SELECT e.vec_id, s.j AS dim,
         floor(e.embedding[s.j + 1]::DOUBLE * 1048576.0)::BIGINT AS xq
  FROM embeddings e, LATERAL unnest(range(len(e.embedding))) AS s(j)
),
c0 AS (SELECT vec_id AS cluster, dim, xq AS cq FROM x WHERE vec_id < 4),
d1 AS (
  SELECT x.vec_id, c.cluster,
         sum((x.xq - c.cq) * (x.xq - c.cq)) AS d2
  FROM x JOIN c0 c ON x.dim = c.dim GROUP BY x.vec_id, c.cluster
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)
             AS rn
    FROM d1) WHERE rn = 1
),
u1 AS (
  SELECT a.cluster, x.dim,
         floor(CAST(sum(x.xq) AS DOUBLE) / count(*))::BIGINT AS cq
  FROM x JOIN a1 a USING (vec_id) GROUP BY a.cluster, x.dim
),
c1 AS (
  SELECT c0.cluster, c0.dim, COALESCE(u1.cq, c0.cq) AS cq
  FROM c0 LEFT JOIN u1 ON u1.cluster = c0.cluster AND u1.dim = c0.dim
),
e2 AS (
  SELECT x.vec_id, c.cluster,
         sum((x.xq - c.cq) * (x.xq - c.cq)) AS d2
  FROM x JOIN c1 c ON x.dim = c.dim GROUP BY x.vec_id, c.cluster
),
a2 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)
             AS rn
    FROM e2) WHERE rn = 1
),
u2 AS (
  SELECT a.cluster, x.dim,
         floor(CAST(sum(x.xq) AS DOUBLE) / count(*))::BIGINT AS cq
  FROM x JOIN a2 a USING (vec_id) GROUP BY a.cluster, x.dim
),
c2 AS (
  SELECT c1.cluster, c1.dim, COALESCE(u2.cq, c1.cq) AS cq
  FROM c1 LEFT JOIN u2 ON u2.cluster = c1.cluster AND u2.dim = c1.dim
),
e3 AS (
  SELECT x.vec_id, c.cluster,
         sum((x.xq - c.cq) * (x.xq - c.cq)) AS d2
  FROM x JOIN c2 c ON x.dim = c.dim GROUP BY x.vec_id, c.cluster
),
a3 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)
             AS rn
    FROM e3) WHERE rn = 1
),
st AS (
  SELECT cluster, count(*)::BIGINT AS n_assigned,
         sum(vec_id)::BIGINT AS sum_vec_ids
  FROM a3 GROUP BY cluster
)
SELECT c2.cluster AS cluster, c2.dim AS dim_idx,
       c2.cq AS centroid_scaled,
       COALESCE(st.n_assigned, 0)::BIGINT AS n_assigned,
       COALESCE(st.sum_vec_ids, 0)::BIGINT AS sum_vec_ids
FROM c2 LEFT JOIN st ON st.cluster = c2.cluster
ORDER BY c2.cluster, dim_idx
"""

# SemDeDup oracle: the same exact-integer k-means CTE chain (c0..a3,
# 2 Lloyd iterations) + a within-cluster integer-cosine prune on a
# floor(v * 2^10) grid; kept = no LOWER-id same-cluster neighbor with
# 100 * dot^2 >= 81 * |u|^2 |v|^2 and dot > 0 (tau = 0.9 as an exact
# rational -- identical arithmetic to dataops.semantic_dedup).
_SEMDEDUP_SQL = """
WITH x AS (
  SELECT e.vec_id, s.j AS dim,
         floor(e.embedding[s.j + 1]::DOUBLE * 1048576.0)::BIGINT AS xq
  FROM embeddings e, LATERAL unnest(range(len(e.embedding))) AS s(j)
),
xp AS (
  SELECT vec_id, dim, xq FROM x
  UNION ALL
  SELECT 10000000 + vec_id AS vec_id, dim, xq FROM x WHERE vec_id % 7 = 0
),
c0 AS (SELECT vec_id AS cluster, dim, xq AS cq FROM x WHERE vec_id < 4),
d1 AS (
  SELECT x.vec_id, c.cluster,
         sum((x.xq - c.cq) * (x.xq - c.cq)) AS d2
  FROM x JOIN c0 c ON x.dim = c.dim GROUP BY x.vec_id, c.cluster
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)
             AS rn
    FROM d1) WHERE rn = 1
),
u1 AS (
  SELECT a.cluster, x.dim,
         floor(CAST(sum(x.xq) AS DOUBLE) / count(*))::BIGINT AS cq
  FROM x JOIN a1 a USING (vec_id) GROUP BY a.cluster, x.dim
),
c1 AS (
  SELECT c0.cluster, c0.dim, COALESCE(u1.cq, c0.cq) AS cq
  FROM c0 LEFT JOIN u1 ON u1.cluster = c0.cluster AND u1.dim = c0.dim
),
e2 AS (
  SELECT x.vec_id, c.cluster,
         sum((x.xq - c.cq) * (x.xq - c.cq)) AS d2
  FROM x JOIN c1 c ON x.dim = c.dim GROUP BY x.vec_id, c.cluster
),
a2 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)
             AS rn
    FROM e2) WHERE rn = 1
),
u2 AS (
  SELECT a.cluster, x.dim,
         floor(CAST(sum(x.xq) AS DOUBLE) / count(*))::BIGINT AS cq
  FROM x JOIN a2 a USING (vec_id) GROUP BY a.cluster, x.dim
),
c2 AS (
  SELECT c1.cluster, c1.dim, COALESCE(u2.cq, c1.cq) AS cq
  FROM c1 LEFT JOIN u2 ON u2.cluster = c1.cluster AND u2.dim = c1.dim
),
e3 AS (
  SELECT xp.vec_id, c.cluster,
         sum((xp.xq - c.cq) * (xp.xq - c.cq)) AS d2
  FROM xp JOIN c2 c ON xp.dim = c.dim GROUP BY xp.vec_id, c.cluster
),
a3 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)
             AS rn
    FROM e3) WHERE rn = 1
),
q0 AS (
  SELECT e.vec_id, s.j AS dim,
         floor(e.embedding[s.j + 1]::DOUBLE * 1024.0)::BIGINT AS q
  FROM embeddings e, LATERAL unnest(range(len(e.embedding))) AS s(j)
),
q10 AS (
  SELECT vec_id, dim, q FROM q0
  UNION ALL
  SELECT 10000000 + vec_id AS vec_id, dim, q FROM q0 WHERE vec_id % 7 = 0
),
nrm AS (SELECT vec_id, sum(q * q)::BIGINT AS n2 FROM q10 GROUP BY vec_id),
pr AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, sum(qa.q * qb.q)::BIGINT AS dot
  FROM a3 a JOIN a3 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN q10 qa ON qa.vec_id = a.vec_id
  JOIN q10 qb ON qb.vec_id = b.vec_id AND qb.dim = qa.dim
  GROUP BY a.vec_id, b.vec_id
),
dup AS (
  SELECT DISTINCT pr.vb AS vec_id
  FROM pr JOIN nrm na ON na.vec_id = pr.va
       JOIN nrm nb ON nb.vec_id = pr.vb
  WHERE pr.dot > 0 AND 100 * pr.dot * pr.dot >= 81 * na.n2 * nb.n2
)
SELECT a3.vec_id AS vec_id, a3.cluster AS cluster,
       (CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS kept
FROM a3 LEFT JOIN dup USING (vec_id)
ORDER BY a3.vec_id
"""


# Embedding int8 quantization: scale = max|x| per vector,
# q = floor(x*127/scale + 0.5); float32->DOUBLE casts are exact and
# the multiply-then-divide order matches numpy, so the integer
# summaries are bit-deterministic.
_EMBED_QUANT_SQL = """
WITH x AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v FROM embeddings
),
s AS (SELECT vec_id, max(abs(v)) AS sc FROM x GROUP BY vec_id),
q AS (
  SELECT x.vec_id, s.sc,
         CASE WHEN s.sc = 0 THEN 0
              ELSE floor(v * 127.0 / s.sc + 0.5) END AS q
  FROM x JOIN s USING (vec_id)
)
SELECT vec_id,
       floor(any_value(sc) * 1000000)::BIGINT AS scale_micro,
       sum(q)::BIGINT AS sum_q,
       sum(q * q)::BIGINT AS sum_q_sq,
       (count(*) FILTER (WHERE abs(q) = 127))::BIGINT AS n_sat,
       count(*)::BIGINT AS n_dims
FROM q GROUP BY vec_id ORDER BY vec_id
"""

# Budget-constrained corpus selection: docs ranked (score DESC,
# doc_id), kept while the running token total stays within 2/5 of the
# corpus total (strict prefix; the crossing doc is out).
_BUDGET_SELECT_SQL = """
WITH q AS (
  SELECT doc_id,
         len(list_distinct(string_split(text, ' ')))::BIGINT AS score,
         len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
o AS (
  SELECT *, sum(n_tokens) OVER (ORDER BY score DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
  FROM q
)
SELECT doc_id, score, n_tokens
FROM o
WHERE cum <= (SELECT sum(n_tokens) * 2 // 5 FROM q)
ORDER BY doc_id
"""

# Time-series densification: hourly counts resampled onto the full
# global hour range per type, zeros on gap hours, running cumulative.
_RESAMPLE_SQL = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour FROM events
),
b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN b, LATERAL unnest(range(b.lo, b.hi + 1)) AS g(hour)
),
c AS (
  SELECT event_type, hour, count(*)::BIGINT AS n FROM h GROUP BY 1, 2
)
SELECT grid.event_type, grid.hour,
       COALESCE(c.n, 0)::BIGINT AS n_events,
       (sum(COALESCE(c.n, 0)) OVER (
          PARTITION BY grid.event_type ORDER BY grid.hour))::BIGINT
         AS cum_events
FROM grid LEFT JOIN c USING (event_type, hour)
ORDER BY event_type, hour
"""

# ANALYZE-style table statistics over events: exact per-column
# row/null/NDV/min/max on the canonical domain (ints raw, ts as
# epoch-us, doubles as floor-cents, strings raw).
_PROFILE_SQL = """
WITH c AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents, props
  FROM events
)
SELECT 'event_id' AS "column", count(*)::BIGINT AS n_rows,
       CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
       count(DISTINCT event_id)::BIGINT AS n_distinct,
       min(event_id)::BIGINT AS min_num, max(event_id)::BIGINT AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM c
UNION ALL
SELECT 'ts', count(*)::BIGINT, CAST(count(*) - count(ts_us) AS BIGINT),
       count(DISTINCT ts_us)::BIGINT, min(ts_us)::BIGINT,
       max(ts_us)::BIGINT, NULL, NULL
FROM c
UNION ALL
SELECT 'user_id', count(*)::BIGINT, CAST(count(*) - count(user_id) AS BIGINT),
       count(DISTINCT user_id)::BIGINT, min(user_id)::BIGINT,
       max(user_id)::BIGINT, NULL, NULL
FROM c
UNION ALL
SELECT 'value', count(*)::BIGINT, CAST(count(*) - count(cents) AS BIGINT),
       count(DISTINCT cents)::BIGINT, min(cents)::BIGINT,
       max(cents)::BIGINT, NULL, NULL
FROM c
UNION ALL
SELECT 'event_type', count(*)::BIGINT,
       CAST(count(*) - count(event_type) AS BIGINT),
       count(DISTINCT event_type)::BIGINT, NULL, NULL,
       min(event_type), max(event_type)
FROM c
UNION ALL
SELECT 'props', count(*)::BIGINT, CAST(count(*) - count(props) AS BIGINT),
       count(DISTINCT props)::BIGINT, NULL, NULL, min(props), max(props)
FROM c
ORDER BY "column"
"""

# Edit-distance-1 fuzzy vocabulary self-join (FastSS deletion
# neighborhoods).  The plant (first token minus first char on
# doc_id % 5 == 0 docs) is restated verbatim; the deletion-key
# candidate generation is complete for ed<=1 (substitution shares
# the deletion at the mismatch position; insert/delete shares the
# shorter word itself), so filtering candidates by exact
# levenshtein == 1 equals the full quadratic join.
_FUZZY_JOIN_SQL = """
WITH base AS (SELECT doc_id, lower(text) AS t FROM documents),
tok AS (
  SELECT unnest(regexp_extract_all(t, '[a-z0-9]+')) AS w FROM base
  UNION ALL
  SELECT substr(regexp_extract(t, '[a-z0-9]+'), 2) AS w
  FROM base WHERE doc_id % 5 = 0
),
v AS (SELECT DISTINCT w FROM tok WHERE length(w) BETWEEN 3 AND 20),
dels AS (
  SELECT w, w AS k FROM v
  UNION
  SELECT w, substr(w, 1, i) || substr(w, i + 2) AS k
  FROM v, LATERAL unnest(range(0, length(w))) AS t(i)
),
cand AS (
  SELECT DISTINCT a.w AS word1, b.w AS word2
  FROM dels a JOIN dels b ON a.k = b.k AND a.w < b.w
)
SELECT word1, word2 FROM cand
WHERE levenshtein(word1, word2) = 1
ORDER BY word1, word2
"""

# 2-D Pareto frontier over orders: keep (price, day) points not
# dominated (>= both dims, > one) by any other order.  Window form:
# per-price max day, then a strictly-greater-price suffix-max test
# (prices in pm are distinct, so the DESC frame is exactly "strictly
# greater prices") -- O(n log n), matching the engine's suffix-max
# kernel instead of the O(n^2) NOT EXISTS restatement.
_SKYLINE_SQL = """
WITH o AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
),
pm AS (SELECT price_cents, max(day) AS day FROM o GROUP BY 1),
sky AS (
  SELECT price_cents, day,
         max(day) OVER (ORDER BY price_cents DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS best_prev
  FROM pm
)
SELECT s.price_cents, s.day, count(*)::BIGINT AS n_orders,
       min(o.o_orderkey) AS min_orderkey
FROM sky s
JOIN o ON o.price_cents = s.price_cents AND o.day = s.day
WHERE s.best_prev IS NULL OR s.day > s.best_prev
GROUP BY 1, 2
ORDER BY s.price_cents DESC
"""

# Triangle counting over the deterministic ring+chord doc graph:
# low->high orientation finds each triangle x<y<z exactly once
# (wedge at x, closing edge (y,z)).
_TRIANGLES_SQL = """
WITH n AS (SELECT count(*)::BIGINT AS nn FROM documents),
d AS (SELECT doc_id AS u FROM documents),
raw AS (
  SELECT u, (u + 1) % nn AS v FROM d, n
  UNION ALL SELECT u, (u + 2) % nn FROM d, n
  UNION ALL SELECT u, (7 * u + 1) % nn FROM d, n
),
e AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM raw WHERE u <> v
)
SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
       (SELECT count(*) FROM e e1
        JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b)::BIGINT AS n_wedges,
       (SELECT count(*) FROM e e1
        JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)::BIGINT AS n_triangles
"""

# Count-Min sketch over per-user event counts: the seed-prefixed
# FNV-1a row hashes restated via the recursive byte fold (the
# events_sample_hash precedent), counters as collision sums, the
# estimate as the min over depth rows -- hash-deterministic, so the
# sketch's overcount reproduces bit-for-bit.
_USER_CMS_SQL = """
WITH RECURSIVE users AS (SELECT DISTINCT user_id FROM events),
su AS (
  SELECT s.seed, u.user_id,
         CAST(s.seed AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR) AS st
  FROM (SELECT unnest(range(0, 4)) AS seed) s, users u
),
eb AS (
  SELECT seed, user_id, hex(encode(st)) AS hx,
         octet_length(encode(st)) AS n
  FROM su
),
fnv AS (
  SELECT seed, user_id, n, 0 AS i,
         CAST('14695981039346656037' AS UHUGEINT) AS h FROM eb
  UNION ALL
  SELECT f.seed, f.user_id, f.n, f.i + 1,
         (xor(f.h, CAST(CAST('0x' || substr(eb.hx, 2*f.i+1, 2) AS INT)
                        AS UHUGEINT))
          * CAST(1099511628211 AS UHUGEINT))
           % CAST('18446744073709551616' AS UHUGEINT)
  FROM fnv f JOIN eb ON eb.seed = f.seed AND eb.user_id = f.user_id
  WHERE f.i < f.n
),
hb AS (
  SELECT seed, user_id, CAST(h % 64 AS BIGINT) AS bucket
  FROM fnv WHERE i = n
),
counts AS (SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY 1),
counters AS (
  SELECT hb.seed, hb.bucket, CAST(sum(c.n) AS BIGINT) AS cnt
  FROM hb JOIN counts c USING (user_id) GROUP BY 1, 2
),
est AS (
  SELECT hb.user_id, min(ct.cnt) AS cms
  FROM hb JOIN counters ct ON ct.seed = hb.seed AND ct.bucket = hb.bucket
  GROUP BY 1
)
SELECT c.user_id, c.n AS n_events, CAST(e.cms AS BIGINT) AS cms_estimate
FROM counts c JOIN est e USING (user_id)
WHERE c.user_id % 13 = 0
ORDER BY c.user_id
"""

# Interval-union coverage: per user, microseconds covered by the
# union of [ts, ts+300s) windows (gaps-and-islands shifted-max).
_ACTIVE_TIME_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
  FROM events
),
w AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS pe
  FROM e
)
SELECT user_id,
       CAST(sum(greatest(e - greatest(s, COALESCE(pe, s)), 0))
            AS BIGINT) AS active_us
FROM w GROUP BY 1 ORDER BY 1
"""

# Bounded-frame window aggregate: trailing 3-row COUNT/SUM/MAX of
# cents per user (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW).
_FRAME_AGG_SQL = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       count(*) OVER w AS n_in_frame,
       CAST(sum(cents) OVER w AS BIGINT) AS frame_sum_cents,
       max(cents) OVER w AS frame_max_cents
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

# Last-touch attribution: purchases credited to the most recent
# strictly-preceding non-purchase event type of the same user.
_LAST_TOUCH_SQL = """
WITH w AS (
  SELECT event_type,
         last_value(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS src
  FROM events
)
SELECT COALESCE(src, 'none') AS src_event_type,
       count(*)::BIGINT AS n_purchases
FROM w WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
"""

# Z-order clustering layout: the Morton interleave restated as a
# 32-term bit expression (even positions = custkey bits, odd =
# epoch-day bits), generated programmatically below.
_Z_X = " + ".join(f"(((cx >> {i}) & 1) << {2 * i})" for i in range(16))
_Z_Y = " + ".join(f"(((dy >> {i}) & 1) << {2 * i + 1})" for i in range(16))
_ZORDER_SQL = f"""
WITH raw AS (
  SELECT o_custkey AS c,
         epoch_us(o_orderdate) // 86400000000 AS d
  FROM orders
),
b AS (
  SELECT min(c) AS lc, max(c) AS hc, min(d) AS ld, max(d) AS hd FROM raw
),
o AS (
  SELECT ((c - lc) * 65535) // greatest(hc - lc, 1) AS cx,
         ((d - ld) * 65535) // greatest(hd - ld, 1) AS dy
  FROM raw, b
),
z AS (SELECT cx, dy, ({_Z_X} + {_Z_Y}) AS morton FROM o)
SELECT (morton >> 28)::BIGINT AS zbucket, count(*)::BIGINT AS n_orders,
       min(cx)::BIGINT AS min_cx, max(cx)::BIGINT AS max_cx,
       min(dy)::BIGINT AS min_dy, max(dy)::BIGINT AS max_dy,
       min(morton)::BIGINT AS min_z, max(morton)::BIGINT AS max_z
FROM z GROUP BY 1 ORDER BY 1
"""

# Sliding-window COUNT DISTINCT: per epoch day, exact distinct
# users active that day (dau) and in the trailing 7 days (wau);
# forward expansion over the per-user distinct-day relation.
_WAU_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
expand AS (
  SELECT DISTINCT user_id, day + i AS day
  FROM ud, LATERAL unnest(range(0, 7)) AS t(i)
),
wau AS (SELECT day, count(*)::BIGINT AS wau FROM expand GROUP BY 1),
dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1)
SELECT w.day, COALESCE(d.dau, 0)::BIGINT AS dau, w.wau
FROM wau w LEFT JOIN dau d USING (day)
WHERE w.day <= (SELECT max(day) FROM ud)
ORDER BY w.day
"""

# Inverted-index build: per top-df word, the capped ascending
# posting-list prefix (comma-joined) + full document frequency.
_INVIDX_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
),
wd AS (SELECT DISTINCT word, doc_id FROM tok),
df AS (SELECT word, count(*)::BIGINT AS df FROM wd GROUP BY 1),
top AS (SELECT word, df FROM df ORDER BY df DESC, word LIMIT 30),
pk AS (
  SELECT word, doc_id,
         row_number() OVER (PARTITION BY word ORDER BY doc_id) AS rn
  FROM wd
),
post AS (
  SELECT word,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
  FROM pk WHERE rn <= 10 GROUP BY word
)
SELECT t.word, t.df, p.postings
FROM top t JOIN post p USING (word)
ORDER BY t.df DESC, t.word
"""

# TPC-H Q4 shape: fact-vs-fact EXISTS semi-join -- orders with at
# least one line item shipped > 90 days after the order date.
_Q4_SQL = """
SELECT o.o_orderpriority,
       count(*)::BIGINT AS n_orders,
       CAST(sum(CASE WHEN EXISTS (
         SELECT 1 FROM lineitem l
         WHERE l.l_orderkey = o.o_orderkey
           AND epoch_us(l.l_shipdate) >
               epoch_us(o.o_orderdate) + 7776000000000
       ) THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM orders o GROUP BY 1 ORDER BY 1
"""

# Robust anomaly screen: exact lower-median + MAD per type, strict
# k*MAD outlier counts; rank = ceil(n/2) on both sides.
_MAD_SQL = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents FROM events
),
s AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
),
med AS (
  SELECT event_type, cents AS med FROM s
  WHERE rn = CAST(ceil(n * 0.5) AS BIGINT)
),
d AS (
  SELECT c.event_type, abs(c.cents - m.med) AS dev, m.med
  FROM c JOIN med m USING (event_type)
),
ds_ AS (
  SELECT event_type, dev, med,
         row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (
  SELECT event_type, med, dev AS mad FROM ds_
  WHERE rn = CAST(ceil(n * 0.5) AS BIGINT)
)
SELECT m.event_type, m.med AS median_cents, m.mad AS mad_cents,
       CAST(sum(CASE WHEN abs(c.cents - m.med) > 3 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       count(*)::BIGINT AS n_events
FROM c JOIN mad m USING (event_type)
GROUP BY 1, 2, 3 ORDER BY 1
"""

# TPC-H Q14 shape: promo vs total revenue per ship month; the part
# dimension folds to a broadcast bit per (dense) partkey on the Ray
# side, so the oracle's LEFT JOIN mirrors the probe exactly even for
# lineitem rows whose partkey has no part row.
_Q14_SQL = """
SELECT CAST((date_part('year', l.l_shipdate) - 1970) * 12
            + date_part('month', l.l_shipdate) - 1 AS BIGINT) AS ship_month,
       CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS total_cents,
       count(*)::BIGINT AS n_items
FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1 ORDER BY 1
"""

# TPC-H Q5 shape: region <- nation <- customer dimension chain
# collapsed to one broadcast custkey -> region lookup; orders stream
# through a single pass (inner-join semantics: unmatched keys drop).
_Q5_SQL = """
SELECT r.r_name,
       count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_total_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY 1 ORDER BY 1
"""

# Collocation mining: top-k adjacent word bigrams with both unigram
# marginals (exact integer PMI/lift ingredients, no transcendentals).
_BIGRAM_SQL = """
WITH ws AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
),
bg AS (
  SELECT unnest(
    list_transform(range(1, len(w)), i -> w[i] || chr(0) || w[i+1])
  ) AS p
  FROM ws WHERE len(w) > 1
),
pairs AS (
  SELECT split_part(p, chr(0), 1) AS w1, split_part(p, chr(0), 2) AS w2,
         count(*)::BIGINT AS n_pair
  FROM bg GROUP BY 1, 2
),
uc AS (
  SELECT word, count(*)::BIGINT AS n
  FROM (SELECT unnest(w) AS word FROM ws) GROUP BY 1
)
SELECT w1, w2, n_pair, u1.n AS n_w1, u2.n AS n_w2
FROM pairs JOIN uc u1 ON u1.word = w1 JOIN uc u2 ON u2.word = w2
ORDER BY n_pair DESC, w1, w2
LIMIT 40
"""

# TPC-H Q3 shape: broadcast dim filter + partitioned fact-fact hash
# join + per-block final aggregate + distributed top-k.  Revenue in
# exact per-row floor-cents so both engines sum identical integers.
_Q3_SQL = """
SELECT o.o_orderkey, o.o_orderdate,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, o.o_orderkey
LIMIT 10
"""

# First-order Markov transition matrix over per-user journeys:
# consecutive same-user pairs in (ts, event_id) order; integer
# counts plus the per-source denominator (no float probabilities).
_MARKOV_SQL = """
WITH ord AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
),
pairs AS (
  SELECT event_type AS src_type, nxt AS dst_type,
         count(*)::BIGINT AS n_pairs
  FROM ord WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT src_type, dst_type, n_pairs,
       (sum(n_pairs) OVER (PARTITION BY src_type))::BIGINT AS n_from_src
FROM pairs ORDER BY src_type, dst_type
"""

# Hourly OHLC bars per event type: open/close are value-at-first /
# value-at-last by (ts, event_id); all values in exact floor-cents.
_OHLC_SQL = """
SELECT event_type,
       epoch_us(ts) // 3600000000 AS hour,
       first(CAST(floor(value * 100) AS BIGINT) ORDER BY ts, event_id)
         AS open_cents,
       max(CAST(floor(value * 100) AS BIGINT)) AS high_cents,
       min(CAST(floor(value * 100) AS BIGINT)) AS low_cents,
       last(CAST(floor(value * 100) AS BIGINT) ORDER BY ts, event_id)
         AS close_cents,
       count(*)::BIGINT AS n_events
FROM events
GROUP BY 1, 2
ORDER BY event_type, hour
"""

# Window-throttle dedup: drop an event when the same (user, type)
# occurred within the last 10 minutes (previous occurrence, kept or
# not; strictly-greater gaps survive).
_DEDUP_WINDOW_SQL = """
WITH r AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS gap_us
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n_events,
       (count(*) FILTER (WHERE gap_us IS NULL OR gap_us > 600000000))::BIGINT
         AS n_kept
FROM r GROUP BY event_type ORDER BY event_type
"""

# Per-user journey path: ordered string_agg of the first 20 event
# types per user, '>'-joined, plus the uncapped event count.
_USER_PATH_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
)
SELECT user_id,
       count(*)::BIGINT AS n_events,
       string_agg(event_type, '>' ORDER BY rn)
         FILTER (WHERE rn <= 20) AS path
FROM r
GROUP BY user_id
ORDER BY user_id
"""

# Continuous (interpolated) quartiles, integer-exact via the x4
# representation: h=(n-1)k/4=m+r/4 -> 4*v[m] + r*(v[m+1]-v[m]).
_QUANT_CONT_SQL = """
WITH c AS (SELECT floor(value * 100)::BIGINT AS cents FROM events),
n AS (SELECT count(*)::BIGINT AS nn FROM c),
o AS (SELECT cents, row_number() OVER (ORDER BY cents) - 1 AS pos FROM c),
pick AS (
  SELECT k, ((nn - 1) * k) // 4 AS m, ((nn - 1) * k) % 4 AS r, nn
  FROM (SELECT unnest([1, 2, 3]) AS k) CROSS JOIN n
)
SELECT (pick.k * 25)::BIGINT AS q_pct,
       (4 * lo.cents + pick.r * (hi.cents - lo.cents))::BIGINT AS cont_x4
FROM pick
JOIN o lo ON lo.pos = pick.m
JOIN o hi ON hi.pos = least(pick.m + 1, pick.nn - 1)
ORDER BY q_pct
"""

# Cohort retention: epoch-week cohorts (floor(epoch_days/7), no
# calendar ambiguity), distinct cohort users active per weeks-since.
_COHORT_SQL = """
WITH w AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
),
f AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id),
a AS (SELECT DISTINCT user_id, wk FROM w)
SELECT f.cw AS cohort_week,
       (a.wk - f.cw)::BIGINT AS weeks_since,
       count(*)::BIGINT AS n_users
FROM a JOIN f USING (user_id)
GROUP BY f.cw, weeks_since
ORDER BY cohort_week, weeks_since
"""

# Conversion funnel: furthest signup -> click -> purchase stage per
# user, each stage strictly after the user's FIRST completion of the
# previous one in (ts, event_id) order.
_FUNNEL_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
),
a AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN rn END) AS fs
  FROM r GROUP BY user_id
),
b AS (
  SELECT r.user_id, min(rn) AS fc
  FROM r JOIN a USING (user_id)
  WHERE r.event_type = 'click' AND a.fs IS NOT NULL AND r.rn > a.fs
  GROUP BY r.user_id
),
c AS (
  SELECT r.user_id, min(rn) AS fp
  FROM r JOIN b USING (user_id)
  WHERE r.event_type = 'purchase' AND r.rn > b.fc
  GROUP BY r.user_id
)
SELECT u.user_id,
       (CASE WHEN c.user_id IS NOT NULL THEN 3
             WHEN b.user_id IS NOT NULL THEN 2
             WHEN a.fs IS NOT NULL THEN 1
             ELSE 0 END)::BIGINT AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN a ON u.user_id = a.user_id
LEFT JOIN b ON u.user_id = b.user_id
LEFT JOIN c ON u.user_id = c.user_id
ORDER BY u.user_id
"""

# Sequence packing: exact global prefix sum of word counts in doc_id
# order, each doc's word span [off, off+n) expanded into the 64-word
# training sequences it overlaps.
_SEQ_PACKING_SQL = """
WITH w AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n FROM documents
),
o AS (
  SELECT doc_id, n,
         COALESCE(sum(n) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS off
  FROM w
)
SELECT doc_id,
       s.k AS seq_idx,
       (least((s.k + 1) * 64, off + n)
          - greatest(s.k * 64, off))::BIGINT AS words_in_seq
FROM o, LATERAL unnest(range(off // 64, (off + n - 1) // 64 + 1)) AS s(k)
ORDER BY doc_id, seq_idx
"""

# Document chunking: windows of 32 words, overlap 4, stride 28;
# n_chunks = max(1, ceil((n_words - 4) / 28)).  DuckDB list slicing
# is 1-based inclusive with clamping, so window j (0-based word s =
# j*28) is ws[s+1 : s+32].
_DOC_CHUNK_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, len(ws) AS n,
         greatest(1, (len(ws) - 4 + 27) // 28) AS n_chunks, ws
  FROM w
)
SELECT doc_id,
       s.j AS chunk_idx,
       least(32, n - s.j * 28)::BIGINT AS n_words,
       array_to_string(ws[s.j*28 + 1 : s.j*28 + 32], ' ') AS chunk_text
FROM c, LATERAL unnest(range(0, n_chunks)) AS s(j)
ORDER BY doc_id, chunk_idx
"""

# URL canonicalization: replant the identical dirty variants
# (doc_id % 4 selects the flaw) and canonicalize with the SAME RE2
# steps in the same order (fragment -> utm query -> :443 -> lowercase
# scheme+host); DuckDB regexp_replace supports the \1 rewrite
# backrefs RE2 defines, so every step is engine-identical.
# html_text_extract: deliberately NO replant on the SQL side -- the
# engine builds the dirty page (head/script/nav/comment/footer +
# entity-escaped body) and must invert it exactly; comparing against
# the raw documents.text makes the driver's value hash a direct
# byte-identity proof of the north rule's per-row invariant.
_HTML_EXTRACT_SQL = r"""
SELECT doc_id, text AS extracted_text,
       strlen(text)::BIGINT AS n_bytes
FROM documents
ORDER BY doc_id
"""

# html_outlinks: replant the deterministic anchor set (1 + doc_id%4
# links, dst = (doc_id*7 + 13*j) % n_docs) and aggregate inlink stats
# per destination in SQL; the engine side actually extracts the hrefs
# from the html bytes with Arrow list/RE2 kernels.
_HTML_OUTLINKS_SQL = r"""
WITH n AS (SELECT count(*) AS nd FROM documents),
links AS (
  SELECT d.doc_id AS src,
         ((d.doc_id * 7 + 13 * j) % nd.nd) AS dst
  FROM documents d, n nd,
       unnest(range(1, 2 + (d.doc_id % 4))) AS t(j)
)
SELECT dst AS dst_doc,
       count(*)::BIGINT AS n_inlinks,
       count(DISTINCT src % 20)::BIGINT AS n_src_hosts
FROM links
GROUP BY dst
ORDER BY dst
"""

# PageRank over the replanted edge set with the engine's exact integer
# recurrence: share = r // outdeg per edge, update = base +
# (85 * in_sum) // 100, base = (15 * (R // N)) // 100, R = 1e12 -- all
# floor integer ops, so every rank matches bit-for-bit after 3 rounds.
_WEB_PAGERANK_SQL = r"""
WITH n AS (SELECT count(*)::BIGINT AS nn FROM documents),
docs AS (SELECT doc_id FROM documents),
e AS (
  SELECT d.doc_id AS src,
         ((d.doc_id * 7 + 13 * j) % nd.nn)::BIGINT AS dst,
         (1 + d.doc_id % 4)::BIGINT AS deg
  FROM documents d, n nd,
       unnest(range(1, 2 + (d.doc_id % 4))) AS t(j)
),
r0 AS (
  SELECT doc_id, (1000000000000 // nn)::BIGINT AS r
  FROM docs CROSS JOIN n
),
s1 AS (
  SELECT e.dst AS doc_id, sum(r0.r // e.deg)::BIGINT AS s
  FROM e JOIN r0 ON r0.doc_id = e.src GROUP BY e.dst
),
r1 AS (
  SELECT d.doc_id,
         ((15 * (1000000000000 // n.nn)) // 100
            + (85 * COALESCE(s1.s, 0)) // 100)::BIGINT AS r
  FROM docs d CROSS JOIN n LEFT JOIN s1 ON s1.doc_id = d.doc_id
),
s2 AS (
  SELECT e.dst AS doc_id, sum(r1.r // e.deg)::BIGINT AS s
  FROM e JOIN r1 ON r1.doc_id = e.src GROUP BY e.dst
),
r2 AS (
  SELECT d.doc_id,
         ((15 * (1000000000000 // n.nn)) // 100
            + (85 * COALESCE(s2.s, 0)) // 100)::BIGINT AS r
  FROM docs d CROSS JOIN n LEFT JOIN s2 ON s2.doc_id = d.doc_id
),
s3 AS (
  SELECT e.dst AS doc_id, sum(r2.r // e.deg)::BIGINT AS s
  FROM e JOIN r2 ON r2.doc_id = e.src GROUP BY e.dst
),
r3 AS (
  SELECT d.doc_id,
         ((15 * (1000000000000 // n.nn)) // 100
            + (85 * COALESCE(s3.s, 0)) // 100)::BIGINT AS r
  FROM docs d CROSS JOIN n LEFT JOIN s3 ON s3.doc_id = d.doc_id
)
SELECT doc_id, r FROM r3 ORDER BY doc_id
"""

# web_crawl_frontier: pages are built with a link universe of
# 2*n_docs (half the targets are outside the corpus); replant the edge
# set and anti-join against the crawled doc_id set in SQL -- the engine
# side extracts hrefs from html bytes and anti-joins in ONE kind-tagged
# hash(dst) exchange with a split guard.
_WEB_FRONTIER_SQL = r"""
WITH n AS (SELECT count(*) AS nd FROM documents),
links AS (
  SELECT d.doc_id AS src,
         ((d.doc_id * 7 + 13 * j) % (2 * nd.nd)) AS dst
  FROM documents d, n nd,
       unnest(range(1, 2 + (d.doc_id % 4))) AS t(j)
)
SELECT dst AS dst_doc,
       count(*)::BIGINT AS n_discoveries,
       count(DISTINCT src % 20)::BIGINT AS n_src_hosts
FROM links
WHERE dst NOT IN (SELECT doc_id FROM documents)
GROUP BY dst
ORDER BY dst
"""

# web_anchor_text: anchors carry deterministic text w{(src+dst+j)%11};
# replant (dst, term) in SQL and take per-target totals + the modal
# term with the engine's tie-break (count desc, term id asc).
_WEB_ANCHOR_SQL = r"""
WITH n AS (SELECT count(*) AS nd FROM documents),
links AS (
  SELECT d.doc_id AS src,
         ((d.doc_id * 7 + 13 * j) % nd.nd) AS dst,
         ((d.doc_id + ((d.doc_id * 7 + 13 * j) % nd.nd) + j) % 11) AS tid
  FROM documents d, n nd,
       unnest(range(1, 2 + (d.doc_id % 4))) AS t(j)
),
pt AS (SELECT dst, tid, count(*)::BIGINT AS c FROM links GROUP BY dst, tid),
ranked AS (
  SELECT dst, tid, c,
         row_number() OVER (PARTITION BY dst ORDER BY c DESC, tid ASC) AS rn
  FROM pt
)
SELECT dst AS dst_doc,
       sum(c)::BIGINT AS n_anchors,
       count(*)::BIGINT AS n_terms,
       max(CASE WHEN rn = 1 THEN 'w' || tid::VARCHAR END) AS top_term,
       max(CASE WHEN rn = 1 THEN c END)::BIGINT AS top_cnt
FROM ranked
GROUP BY dst
ORDER BY dst_doc
"""

_URL_CANON_SQL = r"""
WITH raw AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 1 THEN 'HTTPS://SITE' || (doc_id % 20)::VARCHAR
                    || '.EXAMPLE/d/' || doc_id::VARCHAR
      WHEN 2 THEN 'https://site' || (doc_id % 20)::VARCHAR
                    || '.example:443/d/' || doc_id::VARCHAR
      WHEN 3 THEN 'https://site' || (doc_id % 20)::VARCHAR
                    || '.example/d/' || doc_id::VARCHAR
                    || '#sec' || (doc_id % 7)::VARCHAR
      ELSE 'https://site' || (doc_id % 20)::VARCHAR
             || '.example/d/' || doc_id::VARCHAR
             || '?utm_source=t' || (doc_id % 5)::VARCHAR
    END AS raw_url
  FROM documents
),
s1 AS (SELECT doc_id, raw_url,
              regexp_replace(raw_url, '#.*$', '') AS u FROM raw),
s2 AS (SELECT doc_id, raw_url,
              regexp_replace(u, '\?utm_[a-z]+=[A-Za-z0-9_-]*$', '') AS u
       FROM s1),
s3 AS (SELECT doc_id, raw_url,
              regexp_replace(u, '^([a-zA-Z]+://[^/:]+):443(/.*)?$', '\1\2')
                AS u
       FROM s2)
SELECT doc_id, raw_url,
       lower(regexp_extract(u, '^([a-zA-Z]+://[^/]+)', 1))
         || regexp_extract(u, '^[a-zA-Z]+://[^/]+(.*)$', 1) AS canon_url
FROM s3
ORDER BY doc_id
"""

# PII redaction: replant the identical deterministic contact trailer
# (doc_id % 3 emails, doc_id % 2 phone numbers) and redact with the
# SAME RE2 patterns the engine runs (dataops._PII_EMAIL_RE /
# _PII_PHONE_RE); DuckDB's regexp functions are RE2 too, so the
# redacted text compares byte-for-byte.
_PII_SQL = r"""
WITH c AS (
  SELECT doc_id,
         text || ' '
           || repeat('mail user' || doc_id::VARCHAR || '@mail-'
                       || (doc_id % 20)::VARCHAR || '.example ',
                     (doc_id % 3)::INT)
           || ' '
           || repeat('tel 555-'
                       || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0')
                       || ' ',
                     (doc_id % 2)::INT) AS contact
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(contact,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
         '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(contact,
                              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+'))::BIGINT
         AS n_emails,
       len(regexp_extract_all(contact, '\b555-[0-9]{4}\b'))::BIGINT
         AS n_phones
FROM c
ORDER BY doc_id
"""

_DUP_NGRAMS_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT w.doc_id, array_to_string(ws[r.i:r.i+7], ' ') AS gram
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 6)) AS i) r
  WHERE len(ws) >= 8
),
c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram),
d AS (
  SELECT g.doc_id, count(*) AS n_dup
  FROM g JOIN c USING (gram) WHERE c.cnt >= 2
  GROUP BY g.doc_id
)
SELECT w.doc_id,
       CAST(greatest(len(ws) - 7, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_grams
FROM w LEFT JOIN d USING (doc_id)
ORDER BY w.doc_id
"""

# TPC-H Q1 pricing-summary shape in exact integer arithmetic: every
# sum is an int64 of cents (x100 per discount/tax factor), so float
# summation order cannot diverge between the engines.
# Pearson-correlation base with a second moment that exceeds int64:
# sum(price_cents^2) restated via DuckDB's HUGEINT sum, split into the
# same base-2^62 limbs the engine's two-limb partial reassembles.
_QP_CORR_SQL = """
WITH c AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity) AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS sum_qty,
       CAST(sum(q * q) AS BIGINT) AS sum_qty_sq,
       CAST(sum(p) AS BIGINT) AS sum_price_cents,
       CAST(sum(q * p) AS BIGINT) AS sum_qp_cents,
       CAST(sum(p * p) // 4611686018427387904 AS BIGINT) AS sum_price_sq_hi,
       CAST(sum(p * p) % 4611686018427387904 AS BIGINT) AS sum_price_sq_lo
FROM c
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

_LINEITEM_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_base_cents,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS sum_disc_cents_x100,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100) AS BIGINT))
                * (100 + CAST(floor(l_tax * 100) AS BIGINT)))
            AS BIGINT) AS sum_charge_cents_x10k
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 23:59:59.999999'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# Market-basket association rules: baskets = orders, items =
# l_partkey % 97 classes, deduped within basket; pair/item/basket
# counts are exact BIGINTs and every float metric is ONE IEEE
# division of those ints (bit-identical on both engines).
_BASKET_RULES_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, (l_partkey % 97)::BIGINT AS item
  FROM lineitem
),
n AS (SELECT count(DISTINCT ok)::BIGINT AS n_orders FROM li),
ic AS (SELECT item, count(*)::BIGINT AS n_item FROM li GROUP BY item),
pr AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS pair_count
  FROM li a JOIN li b ON a.ok = b.ok AND a.item < b.item
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b, p.pair_count,
       ia.n_item AS n_a, ib.n_item AS n_b,
       p.pair_count::DOUBLE / n.n_orders::DOUBLE AS support,
       p.pair_count::DOUBLE / ia.n_item::DOUBLE AS conf_ab,
       p.pair_count::DOUBLE / ib.n_item::DOUBLE AS conf_ba,
       (p.pair_count * n.n_orders)::DOUBLE
         / (ia.n_item * ib.n_item)::DOUBLE AS lift
FROM pr p
JOIN ic ia ON ia.item = p.item_a
JOIN ic ib ON ib.item = p.item_b
CROSS JOIN n
WHERE p.pair_count >= 5
ORDER BY p.item_a, p.item_b
"""

# RFM segmentation: recency days vs the corpus-max order date,
# frequency, exact cents monetary, each NTILE(4)-scored under
# (metric, custkey) order — all-integer, so the gate is exact.
_RFM_SQL = """
WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
base AS (
  SELECT o_custkey AS custkey,
         ((epoch_us((SELECT m FROM mx)) - epoch_us(max(o_orderdate)))
            // 86400000000)::BIGINT AS r_days,
         count(*)::BIGINT AS freq,
         sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS monet_cents
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT custkey, r_days, freq, monet_cents,
         ntile(4) OVER (ORDER BY r_days, custkey)::BIGINT AS r_quart,
         ntile(4) OVER (ORDER BY freq, custkey)::BIGINT AS f_quart,
         ntile(4) OVER (ORDER BY monet_cents, custkey)::BIGINT AS m_quart
  FROM base
)
SELECT custkey, r_days, freq, monet_cents, r_quart, f_quart, m_quart,
       (r_quart * 100 + f_quart * 10 + m_quart)::BIGINT AS rfm_code
FROM scored ORDER BY custkey
"""

# Connected components of the deterministic in-block link graph
# (_cc_block_edges): comp = MIN doc_id reachable in the undirected
# closure, restated as a recursive CTE (components are block-bounded,
# so the reachability set stays O(n * 64)).
_CC_SQL = """
WITH RECURSIVE
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
d AS (SELECT doc_id AS id FROM documents),
e0 AS (
  SELECT id AS u,
         ((id // 64) * 64
          + ((3 * (id % 64) + 7) % least(64, n - (id // 64) * 64)))::BIGINT
           AS v
  FROM d CROSS JOIN nn
  UNION ALL
  SELECT id,
         ((id // 64) * 64
          + (((id % 64) + 13) % least(64, n - (id // 64) * 64)))::BIGINT
  FROM d CROSS JOIN nn
  WHERE (id % 64) % 5 = 2
),
e1 AS (SELECT u, v FROM e0 WHERE u <> v),
e AS (SELECT u, v FROM e1 UNION SELECT v, u FROM e1),
r AS (
  SELECT id, id AS lab FROM d
  UNION
  SELECT e.v AS id, r.lab FROM r JOIN e ON e.u = r.id
)
SELECT id AS doc_id, min(lab)::BIGINT AS comp
FROM r GROUP BY id ORDER BY doc_id
"""

# Weighted shortest path: 3 Bellman-Ford relaxation rounds over the
# 3-out-degree graph, edge weight 1 + (src + 2*dst) % 7, INF-capped
# exactly like the engine (cheapest path using <= 3 edges).
_SSSP_SQL = """
WITH n AS (SELECT count(*)::BIGINT AS nn FROM documents),
docs AS (SELECT doc_id FROM documents),
e AS (
  SELECT doc_id AS src, ((7 * doc_id + 1) % nn)::BIGINT AS dst
  FROM docs CROSS JOIN n
  UNION ALL
  SELECT doc_id, ((13 * doc_id + 5) % nn)::BIGINT FROM docs CROSS JOIN n
  UNION ALL
  SELECT doc_id, ((31 * doc_id + 11) % nn)::BIGINT FROM docs CROSS JOIN n
),
ew AS (SELECT src, dst, (1 + (src + 2 * dst) % 7)::BIGINT AS w FROM e),
d0 AS (
  SELECT doc_id,
         CASE WHEN doc_id < 3 THEN 0 ELSE 1099511627776 END AS dist
  FROM docs
),
o1 AS (
  SELECT ew.dst AS doc_id, min(least(d0.dist + ew.w, 1099511627776)) AS mo
  FROM ew JOIN d0 ON d0.doc_id = ew.src GROUP BY ew.dst
),
d1 AS (
  SELECT d0.doc_id, least(d0.dist, COALESCE(o1.mo, 1099511627776)) AS dist
  FROM d0 LEFT JOIN o1 USING (doc_id)
),
o2 AS (
  SELECT ew.dst AS doc_id, min(least(d1.dist + ew.w, 1099511627776)) AS mo
  FROM ew JOIN d1 ON d1.doc_id = ew.src GROUP BY ew.dst
),
d2 AS (
  SELECT d1.doc_id, least(d1.dist, COALESCE(o2.mo, 1099511627776)) AS dist
  FROM d1 LEFT JOIN o2 USING (doc_id)
),
o3 AS (
  SELECT ew.dst AS doc_id, min(least(d2.dist + ew.w, 1099511627776)) AS mo
  FROM ew JOIN d2 ON d2.doc_id = ew.src GROUP BY ew.dst
),
d3 AS (
  SELECT d2.doc_id, least(d2.dist, COALESCE(o3.mo, 1099511627776)) AS dist
  FROM d2 LEFT JOIN o3 USING (doc_id)
)
SELECT doc_id,
       (CASE WHEN dist >= 1099511627776 THEN -1 ELSE dist END)::BIGINT
         AS dist
FROM d3 ORDER BY doc_id
"""


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full CDC replay."""
    from logminer_kafka_connect_ray.pipelines import queries as q

    return q.cdc_final_state("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from logminer_kafka_connect_ray.pipelines import dataops as d
    from logminer_kafka_connect_ray.pipelines import events as ev
    from logminer_kafka_connect_ray.pipelines import queries as q

    return {
        # CDC engine (SURVEY.md section 2: S1-S5, M1-M9, T1-T3, J3,
        # A1-A4, O1-O4, D1-D3)
        "cdc_final_state": q.cdc_final_state,
        "cdc_final_state_redo_sql": q.cdc_final_state_redo_sql,
        "cdc_final_state_streaming": q.cdc_final_state_streaming,
        "cdc_final_state_streaming_redo": q.cdc_final_state_streaming_redo,
        "cdc_final_state_salted": q.cdc_final_state_salted,
        "cdc_final_state_transform": q.cdc_final_state_transform,  # SMT hook
        # DBLog-style chunked snapshot: per-chunk as-of SCNs, chunk-vs-
        # log arbitration via the (commit_scn, scn, row_id) LWW fold
        "cdc_final_state_chunked": q.cdc_final_state_chunked,
        # compacted-changelog bootstrap == full-history replay
        "cdc_changelog_compaction": q.cdc_changelog_compaction,
        # log-cleaner loop: compact(prev_compacted + tail) == same state
        "cdc_changelog_compaction_incremental":
            q.cdc_changelog_compaction_incremental,
        # ADD-COLUMN-WITH-DEFAULT evolution: catalog sidecar adds
        # `rating NUMBER(9) DEFAULT 7`; untouched pre-existing rows
        # must surface the DDL default, not null
        "cdc_schema_default_backfill": q.cdc_schema_default_backfill,
        # mid-stream int32 -> int64 type widening (two separate schema
        # bumps asserted; phase-2 values > INT32_MAX so truncation
        # cannot pass the value hash)
        "cdc_schema_type_widening": q.cdc_schema_type_widening,
        # lake maintenance gate: repartition_lake (16->24 live
        # re-layout) + vacuum, state must survive byte-identical
        "cdc_final_state_repartitioned": q.cdc_final_state_repartitioned,
        # GDPR right-to-erasure: targeted copy-on-write delete of
        # <= 3 urls (only their partitions rewrite) + vacuum
        "lake_gdpr_erasure": q.lake_gdpr_erasure,
        # dead-letter accounting gate: planted keyless rows must all
        # route to lake/dead_letters with exact per-reason counts
        "cdc_dead_letters": q.cdc_dead_letters,
        # incrementally-maintained materialized view (per-partition
        # merge deltas -> cumulative sidecar; no lake rescan)
        "cdc_view_lang_stats": q.cdc_view_lang_stats,
        # lake-analytics consumer: distributed scan of the replayed
        # lake (column-pruned read -> per-block Arrow group_by partial
        # -> small global groupby)
        "lake_host_stats": q.lake_host_stats,
        # SCD Type-2 history sink: every version with its validity
        # interval (url-hash exchange -> per-block segment window)
        "cdc_history_scd2": q.cdc_history_scd2,
        # temporal AS-OF probe join against the SCD2 history
        "cdc_pit_lookup": q.cdc_pit_lookup,
        # partition-aligned zero-shuffle reconciliation diff between
        # lake versions (copy-on-write pruning: unchanged files unread)
        "lake_version_diff": q.lake_version_diff,
        "cdc_snapshot_state": q.cdc_snapshot_state,
        "cdc_time_travel": q.cdc_time_travel,
        "cdc_multitable_suppliers": q.cdc_multitable_suppliers,
        "cdc_multitable_suppliers_streaming": q.cdc_multitable_suppliers_streaming,
        "cdc_multitable_pages": q.cdc_multitable_pages,
        "cdc_committed_events": q.cdc_committed_events,
        "cdc_rolled_back_events": q.cdc_open_or_rolled_events,
        "cdc_scn_range_stats": q.cdc_scn_range_stats,
        "cdc_lww_latest": q.cdc_lww_latest,
        # per-url revision-churn profile in commit order (counts,
        # text-rev counts, SCN span, max inter-revision SCN gap)
        "cdc_url_revision_churn": q.cdc_url_revision_churn,
        # hash-pruned point lookup: probe keys read only the partition
        # files the merge's partitioner maps them to
        "lake_point_lookup": q.lake_point_lookup,
        # stats-pruned predicate scan: per-partition host Bloom +
        # zonemap stats in the manifest decide which files are opened
        "lake_pruned_scan": q.lake_pruned_scan,
        # dead-letter REPAIR: re-fold affected keys' full history into
        # compensating writes; oracle = the never-corrupted replay
        "cdc_dead_letter_replay": q.cdc_dead_letter_replay,
        "cdc_envelope_counts": q.cdc_envelope_counts,
        # training-data ops (dedup / similarity / text analysis)
        "dedup_exact": d.dedup_exact,
        # incremental cross-snapshot dedup: new crawl vs already-
        # ingested corpus -- broadcast Bloom prefilter (old corpus
        # never shuffles) + exact hash-confirm of the rare candidates
        "dedup_incremental": d.dedup_incremental,
        # C4/RefinedWeb line-level exact dedup (line-hash exchange;
        # first-global-occurrence wins)
        "line_dedup": d.line_dedup,
        "dedup_ngram_jaccard": d.dedup_ngram_jaccard,  # exact verify kernel
        "dedup_cluster_canonical": d.dedup_cluster_canonical,  # CC canonicalization (SQL)
        "word_freq_topk": d.word_freq_topk,  # vocabulary top-k (SQL)
        # collocation mining: top-k bigrams + unigram marginals via
        # one tagged gram relation and a distributed sort+limit
        "word_bigram_topk": d.word_bigram_topk,
        # inverted-index build: word-hash exchange, per-block df +
        # capped posting prefix, local top-n -> P*n driver merge
        "inverted_index_topdocs": d.inverted_index_topdocs,
        # edit-distance-1 fuzzy vocabulary self-join (FastSS deletion
        # neighborhoods; alphabet-bounded buckets, exact ed verify)
        "vocab_fuzzy_join": d.vocab_fuzzy_join,
        # unigram LM quality score (CCNet-shape perplexity filter;
        # integer micro-nat arithmetic -> exact SQL gate)
        "doc_lm_score": d.doc_lm_score,
        # corpus-scale finisher: per-doc scores stream to a resumable
        # hash-partitioned parquet sink, gate hashes a 64-bucket
        # integer digest computed by reading the sink BACK
        "doc_lm_score_sink": d.doc_lm_score_sink,
        # corpus-scale finishers for the input-sized window functions
        # (registered here, inside the driver's first-checked window):
        # the sweep writes its own key-co-located output block straight
        # to part files -- no second exchange -- and the gate digests
        # the sink READ-BACK; lag masks first-event nulls (null-as-0
        # partial == SQL's null-skipping sum)
        "events_running_total_sink": ev.events_running_total_sink,
        "events_lag_delta_sink": ev.events_lag_delta_sink,
        # multimodal pipeline over REAL BMP / palette-PNG / truecolor-
        # PNG / 4:2:0-JPEG containers (dims + counts are pure
        # functions of doc_id -> SQL-checked)
        "media_pipeline": d.media_pipeline,
        # DSIR importance selection (target=en vs raw corpus;
        # integer micro-nat importance weights, P*k top-k merge)
        "dsir_select": d.dsir_select,
        # benchmark 8-gram decontamination (broadcast shingle set,
        # planted provably-contaminated docs)
        "benchmark_decontam": d.benchmark_decontam,
        # winnowing fingerprints (MOSS selection rule; sampled
        # sibling of doc_dup_ngrams at the same 8-word threshold)
        "winnowing_fingerprints": d.winnowing_fingerprints,
        # exact-substring dedup REMOVAL transform (mask all but the
        # first occurrence of each duplicated 8-gram; Lee et al. 2022)
        "doc_dup_span_removal": d.doc_dup_span_removal,
        # Gopher-style repetition/diversity counts (dup-word and
        # dup-bigram filter base; integer-exact SQL gate)
        "doc_repetition": d.doc_repetition,
        "dedup_minhash_lsh": d.dedup_minhash_lsh,  # SQL-checked vs exact kernel
        "dedup_simhash": d.dedup_simhash,          # SQL-checked (lossless LSH)
        # tau=0.4: the driver's synthetic embeddings top out at ~0.51
        # pairwise cosine, so the near-dup default (0.95) would be
        # vacuous on this data
        "embedding_near_dup_exact": (
            lambda sf: d.embedding_near_dup_exact(sf, tau=0.4)
        ),  # exact verify kernel (SQL)
        # planted-fixture gates (VERDICT r2 #2): exact power-of-two
        # scalar multiples -> provable LSH/IVF recall -> SQL-checked.
        # The un-planted approximate behavior stays recall-tested in
        # pytest (test_dataops).
        "embedding_near_dup": (
            lambda sf: d.embedding_near_dup(sf, tau=0.95, plant_copies=True)
        ),
        "ann_cosine_topk": d.ann_cosine_topk,
        "ann_cosine_topk_lsh": (
            lambda sf: d.ann_cosine_topk_lsh(sf, plant_neighbors=True)
        ),
        "ann_cosine_topk_ivf": (
            lambda sf: d.ann_cosine_topk_ivf(sf, plant_neighbors=True)
        ),
        "corpus_curation": d.corpus_curation,  # lang+quality+dedup composition
        "text_quality": d.text_quality,
        "lang_id": d.lang_id,                    # SQL-checked (marker argmax)
        "doc_fingerprints": d.doc_fingerprints,  # SQL-checked (power-sum hash)
        # event-time relational operators (as-of join, session
        # windows, tumbling windows -- pipelines/events.py)
        "events_sessionize": ev.events_sessionize,
        "events_window_stats": ev.events_window_stats,
        "orders_asof_events": ev.orders_asof_events,
        "events_group_topk": ev.events_group_topk,
        "events_value_quantiles": ev.events_value_quantiles,
        "orders_range_join_events": ev.orders_range_join_events,
        "nation_order_stats": ev.nation_order_stats,  # broadcast join
        "events_window_sliding": ev.events_window_sliding,  # hopping windows
        # semi/anti join: EXISTS-probe of the dim stream against the
        # fact stream's distributed distinct-key set
        "customer_order_presence": ev.customer_order_presence,
        # deterministic bernoulli-by-key sampling; membership itself is
        # SQL-checked via the recursive FNV-1a fold
        "events_sample_hash": ev.events_sample_hash,
        # cumulative window function (running total per key); its
        # sink variant is registered up in the first-checked window
        "events_running_total": ev.events_running_total,
        # pivot / wide aggregation (one column per category)
        "events_type_pivot": ev.events_type_pivot,
        # fact-vs-fact INTERSECT/EXCEPT cardinalities (both sides
        # distributed; only the 3-row class table reaches the driver)
        "user_custkey_set_ops": ev.user_custkey_set_ops,
        # ROLLUP(event_type, user_bucket) grouping-sets aggregate
        "events_rollup": ev.events_rollup,
        # CUBE grouping sets (rollup + the bucket-only marginal)
        "events_cube": ev.events_cube,
        # time-series densification (gap-fill resample + running
        # cumulative per series)
        "events_resample_ffill": ev.events_resample_ffill,
        # first-order Markov transition matrix over user journeys
        # (user-hash exchange + neighbor-shift bincount sweep)
        "events_markov_transitions": ev.events_markov_transitions,
        # hourly OHLC bars (value-at-first/last per bucket; pure
        # combiner aggregation, dim-bounded partials, no exchange)
        "events_ohlc": ev.events_ohlc,
        # TPC-H Q3 shape: broadcast dim + fact-fact hash join +
        # per-block final aggregate + P*k top-k merge
        "customer_revenue_topk": ev.customer_revenue_topk,
        # TPC-H Q14 shape: broadcast promo bitmap over a dense key
        # domain; month-bounded partials
        "part_promo_revenue": ev.part_promo_revenue,
        # TPC-H Q5 shape: three-dim broadcast chain, zero shuffles
        "region_orders_rollup": ev.region_orders_rollup,
        # robust median/MAD anomaly screen (one histogram pass;
        # deviation histogram derived driver-side)
        "events_anomaly_mad": ev.events_anomaly_mad,
        # TPC-H Q4 shape: fact-vs-fact EXISTS (late shipments);
        # only (order, any_late) bits leave the sweep
        "orders_late_shipment": ev.orders_late_shipment,
        # 2-D Pareto frontier (skyline): local per-block frontiers,
        # transitive-dominance merge in one single-block sweep
        "orders_skyline": ev.orders_skyline,
        # Z-order (Morton) clustering layout with per-Z-file
        # dimension min/max -- the OPTIMIZE ZORDER primitive
        "orders_zorder_layout": ev.orders_zorder_layout,
        # sliding-window exact COUNT DISTINCT (trailing-7d actives)
        "events_wau": ev.events_wau,
        # ANALYZE-style stats collection: exact NDV/min/max/null per
        # column in one pass (pair exchange = the NDV combiner)
        "table_profile": ev.table_profile,
        # fact-to-fact shuffle hash join (general case: neither side
        # broadcastable; partitioned searchsorted+repeat sweep)
        "orders_events_join": ev.orders_events_join,
        # left-outer variant: unmatched build rows emitted with NULL
        # probe columns (exact per block -- keys are co-located)
        "orders_events_join_left": lambda sf: ev.orders_events_join(
            sf, how="left"
        ),
        # full-outer: unmatched rows from BOTH sides, NULL-filled
        "orders_events_join_full": lambda sf: ev.orders_events_join(
            sf, how="full"
        ),
        # exact global ROW_NUMBER: histogram-balanced value ranges +
        # exact prefix offsets (distributed total-order sort pattern)
        "events_global_rank": ev.events_global_rank,
        # distributed TF-IDF: two-exchange (term-df attach, per-doc
        # top-k) with integer-exact 1/df idf ordering
        "tfidf_topk": d.tfidf_topk,
        # exact-rational BM25 query scoring (combiner candidates +
        # broadcast corpus scalars + P*k top-k merge)
        "bm25_topdocs": d.bm25_topdocs,
        # HITS hubs/authorities: exact integer fixed-point, scatter/
        # gather exchanges, only normalization scalars reach the driver
        "doc_hits": d.doc_hits,
        # exact-integer distributed PCA: packed moment partials +
        # O(dim^2) driver power iteration
        "embedding_pca_power": d.embedding_pca_power,
        # word co-occurrence lift (PMI-rank-equivalent, exact)
        "word_pmi_topk": d.word_pmi_topk,
        # benchmark decontamination: broadcast needle set, vectorized
        # match_substring sweeps, contaminated-docs-only output
        "contamination_check": d.contamination_check,
        # distributed centroid / mean-pooling aggregate (k-means
        # M-step shape) with integer-quantized component sums
        "label_centroids": d.label_centroids,
        # offset window function (LAG deltas per key)
        "events_lag_delta": ev.events_lag_delta,
        # bounded-frame window aggregate (trailing 3-row sum/max)
        "events_frame_agg": ev.events_frame_agg,
        # last-touch attribution (latest preceding non-purchase src)
        "events_last_touch": ev.events_last_touch,
        # Count-Min sketch (mergeable counter partials; the KMV
        # precedent: deterministic, so the estimate gates exactly)
        "events_user_cms": ev.events_user_cms,
        # interval-union coverage (gaps-and-islands merge)
        "events_active_time": ev.events_active_time,
        # market-basket association rules (a-priori pair counting;
        # support/confidence/lift from exact int64 counts)
        "basket_pair_rules": ev.basket_pair_rules,
        # RFM segmentation: three exact distributed NTILE(4) passes
        # (histogram range planner, no global sort)
        "customer_rfm_segments": ev.customer_rfm_segments,
        # exact per-group quantiles (grouped distributed counting sort)
        "events_type_quantiles": ev.events_type_quantiles,
        # per-class deterministic capped sampling (combiner-bounded)
        "events_stratified_sample": ev.events_stratified_sample,
        # semi-structured JSON field extraction + aggregate (one
        # vectorized extract_regex kernel, no per-row json.loads)
        "events_props_stats": ev.events_props_stats,
        # distributive integer moments (variance/stddev/corr base)
        "events_type_moments": ev.events_type_moments,
        # grouped OLS trend from exact two-limb sufficient statistics
        "events_type_trend": ev.events_type_trend,
        # grouped MODE with deterministic tie-break (exchange+argmax)
        "events_user_mode": ev.events_user_mode,
        # chi-square contingency cells, exact integer-scaled
        "events_hour_chi2": ev.events_hour_chi2,
        # windowed stream-stream self-join (bounded theta join)
        "events_cooccurrence": ev.events_cooccurrence,
        # grouped weighted lower median (order statistic under weights)
        "lineitem_weighted_median": ev.lineitem_weighted_median,
        # UNPIVOT reshape (wide measures -> long form)
        "lineitem_melt": ev.lineitem_melt,
        # grouped equi-width histogram (fixed-bin counts)
        "events_value_histogram": ev.events_value_histogram,
        # exact Gini concentration index over the value histogram
        "events_type_gini": ev.events_type_gini,
        # AR(1) persistence over the densified hourly series
        "events_hourly_ar1": ev.events_hourly_ar1,
        # score-decile lift table (exact NTILE + response rates)
        "customer_decile_lift": ev.customer_decile_lift,
        # TPC-H Q18 shape: HAVING-on-grouped-sum then join-back
        # (combiner partials -> one orderkey exchange -> survivor-
        # sized customer exchange -> P*k driver merge)
        "customer_large_orders": ev.customer_large_orders,
        # TPC-H Q7 shape: two chained fact exchanges (custkey then
        # orderkey), broadcast supplier/nation dims, combiner partials
        "nation_pair_trade": ev.nation_pair_trade,
        # TPC-H Q22 shape: exact-rational global-average scalar +
        # anti-join exchange (NOT EXISTS) + segment rollup
        "customer_dormant_cohorts": ev.customer_dormant_cohorts,
        # exact integer CUSUM change-point over the dense hourly grid
        "events_cusum_changepoint": ev.events_cusum_changepoint,
        # Simpson/HHI audience-concentration index per type
        "events_type_hhi": ev.events_type_hhi,
        # type-pair user-set Jaccard (set-similarity join)
        "events_type_jaccard": ev.events_type_jaccard,
        # TPC-H Q11 shape: global-fraction HAVING, combiner partials
        "nation_revenue_share": ev.nation_revenue_share,
        # LAG-window order gaps -> per-segment cadence rollup
        "customer_order_gaps": ev.customer_order_gaps,
        # gap-fill resample, LINEAR interpolation (ffill's sibling)
        "events_resample_lerp": ev.events_resample_lerp,
        # diurnal seasonality profile (exact shares + index)
        "events_seasonality_profile": ev.events_seasonality_profile,
        # functional-dependency violation profiling
        "lineitem_fd_check": ev.lineitem_fd_check,
        # two-level derived aggregate: lifespan histogram
        "events_user_lifespan": ev.events_user_lifespan,
        # event-sourced open-order backlog running balance
        "orders_open_backlog": ev.orders_open_backlog,
        # Fano-factor burstiness over the dense hourly series
        "events_burstiness": ev.events_burstiness,
        # MA-crossover signal (exact cross-multiplied comparison)
        "events_ma_crossover": ev.events_ma_crossover,
        # sign-safe YoY growth with calendar-gap reset
        "orders_yoy_growth": ev.orders_yoy_growth,
        # share-of-parent hierarchical rollup (nation within region)
        "region_nation_share": ev.region_nation_share,
        # linear multi-touch attribution (last_touch's sibling)
        "events_linear_attribution": ev.events_linear_attribution,
        # exact quantiles of the DERIVED per-user count distribution
        "events_user_count_quantiles": ev.events_user_count_quantiles,
        # bitmap-index audience algebra (ALL-of / NONE-of masks)
        "events_user_type_algebra": ev.events_user_type_algebra,
        # lexical diversity (TTR + hapax) curation metrics
        "doc_lexical_diversity": d.doc_lexical_diversity,
        # session rollup composed over the sessionizer
        "events_session_stats": ev.events_session_stats,
        # exact log2-bucket inter-event gap histogram
        "events_gap_histogram": ev.events_gap_histogram,
        # onion peeling: first-3 Pareto layers (local-peel candidates
        # + exact global re-peel; subset-monotone layer argument)
        "orders_skyline_layers": ev.orders_skyline_layers,
        # row-preserving per-type min-max normalization
        "events_minmax_normalize": ev.events_minmax_normalize,
        # exact Mann-Whitney U from value-histogram cumulative sums
        "events_mann_whitney": ev.events_mann_whitney,
        # weighted audience similarity: exact squared cosine
        "events_type_cosine2": ev.events_type_cosine2,
        # Wald-Wolfowitz runs test on the dense hourly series
        "events_runs_test": ev.events_runs_test,
        # corpus-order n-gram novelty (incremental-crawl scoring)
        "doc_ngram_novelty": d.doc_ngram_novelty,
        # deterministic hash train/val/test split audit
        "corpus_split_assign": d.corpus_split_assign,
        # inverse-size source mixture weights
        "corpus_source_weights": d.corpus_source_weights,
        # contrastive hard-negative mining (label-masked top-k)
        "hard_negative_mining": d.hard_negative_mining,
        # ACF at lags 1 and 24 (persistence + daily seasonality)
        "events_hourly_acf": ev.events_hourly_acf,
        # exact two-sample Kolmogorov-Smirnov distance
        "events_ks_test": ev.events_ks_test,
        # Benford first-digit data-quality audit
        "events_benford": ev.events_benford,
        # ABC Pareto-class revenue segmentation
        "customer_abc_classes": ev.customer_abc_classes,
        # type-share drift between time halves (drift monitor)
        "events_share_drift": ev.events_share_drift,
        # embedding magnitude audit (exact norm^2 order statistics)
        "embedding_norm2_quantiles": d.embedding_norm2_quantiles,
        # DAU/MAU stickiness (distinct-pair two-level engagement)
        "events_stickiness": ev.events_stickiness,
        # peak session concurrency via parallel prefix-max
        "events_peak_concurrency": ev.events_peak_concurrency,
        # positional-index NEAR() proximity query
        "phrase_proximity_search": d.phrase_proximity_search,
        # trailing-window spike alert screen (exact cross-multiply)
        "events_spike_hours": ev.events_spike_hours,
        # FK orphan audit across the two child->parent relations
        "referential_integrity_audit": ev.referential_integrity_audit,
        # per-source dedup yield (distinct md5 within source)
        "dedup_rate_by_source": d.dedup_rate_by_source,
        # items-per-order histogram (0-item orders kept)
        "orders_size_histogram": ev.orders_size_histogram,
        # conversion-latency histogram (never-converted bucket -1)
        "events_conversion_latency": ev.events_conversion_latency,
        # emerging vocabulary (exact share-growth ranking)
        "word_share_drift_topk": d.word_share_drift_topk,
        # diversified top-k (per-customer result cap)
        "orders_diversified_topk": ev.orders_diversified_topk,
        # LTV revenue cohort triangle (one exchange, derived cohort)
        "customer_ltv_triangle": ev.customer_ltv_triangle,
        # exact total-variation distribution distance
        "events_tv_distance": ev.events_tv_distance,
        # weekly dow x hod traffic heatmap (integer calendar)
        "events_week_heatmap": ev.events_week_heatmap,
        # weighted (multiset) Jaccard audience similarity
        "events_type_wjaccard": ev.events_type_wjaccard,
        # 2x2 behavioral odds-ratio association screen
        "events_odds_ratio": ev.events_odds_ratio,
        # week-over-week churn (user-week anti-join)
        "events_churn_rate": ev.events_churn_rate,
        # winsorized (clamped-quantile) robust mean
        "events_winsorized_mean": ev.events_winsorized_mean,
        # assortment coverage per part type (broadcast dim map)
        "part_supplier_breadth": ev.part_supplier_breadth,
        # acquisition mix: per-user first event type (witness fold)
        "events_first_touch_mix": ev.events_first_touch_mix,
        # weekly growth accounting (new/retained/resurrected)
        "events_growth_accounting": ev.events_growth_accounting,
        # month-of-year revenue seasonality profile
        "orders_month_profile": ev.orders_month_profile,
        # power-user roster at the exact P99 activity cutoff
        "events_power_users": ev.events_power_users,
        # per-minute burst ceilings (abuse screen)
        "events_rate_limit_audit": ev.events_rate_limit_audit,
        # fulfillment fragmentation (distinct ship dates per order)
        "orders_split_shipments": ev.orders_split_shipments,
        # order -> first-shipment latency histogram
        "orders_fulfillment_latency": ev.orders_fulfillment_latency,
        # longest consecutive-day streak histogram
        "events_streak_histogram": ev.events_streak_histogram,
        # ratio-of-sums effective tax rate per return flag
        "lineitem_tax_incidence": ev.lineitem_tax_incidence,
        # co-movement matrix: signed corr^2 between type series
        "events_type_corr2": ev.events_type_corr2,
        # double-median quadrant segmentation
        "customer_quadrants": ev.customer_quadrants,
        # Tukey IQR boxplot outlier screen
        "events_iqr_outliers": ev.events_iqr_outliers,
        # exact per-group COUNT(DISTINCT) via pair-hash exchange
        # (events_distinct_users_hll is the approximate sibling)
        "events_user_distinct": ev.events_user_distinct,
        # mergeable KMV distinct sketch: approximate BY DESIGN yet
        # hash-deterministic, so the SQL oracle reproduces the
        # estimate bit-for-bit (unlike HLL, which stays pytest-gated)
        "events_user_kmv_distinct": ev.events_user_kmv_distinct,
        # TPC-H Q1 pricing summary in exact integer cents over the
        # lineitem fact table (pre-aggregated wide aggregate)
        "lineitem_pricing": ev.lineitem_pricing,
        # correlation base with an int64-exceeding second moment:
        # two-limb (base-2^25 partial, base-2^62 output) exact
        # sum(price_cents^2), the widening events_type_moments
        # documents for beyond-int64 domains
        "lineitem_qp_corr": ev.lineitem_qp_corr,
        # cross-document duplicated 8-gram density: the map-reduce
        # variant of exact-substring dedup (Lee et al. 2022)
        "doc_dup_ngrams": d.doc_dup_ngrams,
        # PII scrub pass (email/phone -> sentinel, RE2 on both sides;
        # the data-dependent contact trailer is planted identically
        # by engine and oracle, then redacted byte-for-byte)
        "pii_redaction": d.pii_redaction,
        # crawl-frontier URL canonicalization (fragment / utm /
        # default-port / case normalization, RE2 on both sides)
        "url_canonicalize": d.url_canonicalize,
        # the north rule's per-row invariant gated directly: main-text
        # extraction from html:binary must be BYTE-IDENTICAL to the
        # reference text (oracle = documents.text, no replant -- the
        # value hash is the byte-identity proof)
        "html_text_extract": d.html_text_extract,
        # <a href> anchor extraction from html:binary -> per-dst
        # inlink stats (web-graph construction step)
        "html_outlinks": d.html_outlinks,
        # PageRank over the REAL extracted link graph (variable
        # out-degree edge table co-partitioned with the rank state)
        "web_pagerank": d.web_pagerank,
        # outlink anti-join against the crawled set (frontier expansion)
        "web_crawl_frontier": d.web_crawl_frontier,
        # inbound anchor-text profile per target (modal term + counts)
        "web_anchor_text": d.web_anchor_text,
        # training-sequence chunking: fixed word windows with
        # overlap, fan-out vectorized per chunk ordinal
        "doc_chunking": d.doc_chunking,
        # GPT-style concat-and-chunk packing: exact distributed
        # global prefix sum (range partition + base offsets)
        "seq_packing": d.seq_packing,
        # global quality-ranked selection under a token budget
        # (ordered prefix sum without a global sort)
        "corpus_budget_select": d.corpus_budget_select,
        # symmetric int8 quantization of the embedding table
        # (ANN index build step, bit-deterministic summaries)
        "embedding_quantize": d.embedding_quantize,
        # iterative ML: 2 Lloyd iterations, broadcast centroids,
        # mergeable partials, exact integer-grid arithmetic
        "embedding_kmeans": d.embedding_kmeans,
        # SemDeDup (Abbas et al. 2023): k-means clusters, then drop
        # vectors with a lower-id within-cluster neighbor at
        # cosine >= 0.9 (exact int64 rational-threshold test)
        "semantic_dedup": d.semantic_dedup,
        # graph analytics: 2 PageRank scatter-gather iterations,
        # exact integer ranks
        "doc_pagerank": d.doc_pagerank,
        # BFS hop distance (bounded min-propagation, the graph
        # family's frontier sibling)
        "doc_bfs_levels": d.doc_bfs_levels,
        # triangle counting (two-round MR wedges + closure join)
        "doc_triangles": d.doc_triangles,
        # connected components (min-label propagation + pointer
        # jumping, exact fixpoint detection)
        "doc_connected_components": d.doc_connected_components,
        # weighted shortest path (bounded Bellman-Ford relaxation)
        "doc_shortest_path": d.doc_shortest_path,
        # k-core peel (iterative active-degree removal, 2-exchange
        # message passing per round)
        "doc_kcore": d.doc_kcore,
        # size-biased deterministic sampling (hash coin, weighted)
        "docs_weighted_sample": d.docs_weighted_sample,
        # sequential-pattern funnel (signup -> click -> purchase,
        # strictly ordered) per user
        "events_funnel": ev.events_funnel,
        # cohort retention matrix (epoch-week cohorts, exact
        # distinct users per cell)
        "events_cohort_retention": ev.events_cohort_retention,
        # per-user ordered journey path (capped string_agg)
        "events_user_path": ev.events_user_path,
        # streaming-ETL window-throttle dedup accounting
        "events_dedup_window": ev.events_dedup_window,
        # exact interpolated quartiles (percentile_cont, x4 ints)
        "events_value_quantiles_cont": ev.events_value_quantiles_cont,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_final_state": _FINAL_STATE_SQL,
        "cdc_final_state_redo_sql": _FINAL_STATE_SQL,
        "cdc_final_state_streaming": _FINAL_STATE_SQL,
        "cdc_final_state_streaming_redo": _FINAL_STATE_SQL,
        "cdc_final_state_salted": _FINAL_STATE_SQL,
        "cdc_final_state_transform": _FINAL_STATE_TRANSFORM_SQL,
        "cdc_final_state_chunked": _FINAL_STATE_SQL,
        "cdc_changelog_compaction": _FINAL_STATE_SQL,
        "cdc_changelog_compaction_incremental": _FINAL_STATE_SQL,
        "cdc_schema_default_backfill": _DEFAULT_BACKFILL_SQL,
        "cdc_schema_type_widening": _TYPE_WIDENING_SQL,
        "cdc_final_state_repartitioned": _FINAL_STATE_SQL,
        "lake_gdpr_erasure": _GDPR_SQL,
        "cdc_dead_letters": _DEAD_LETTERS_SQL,
        "cdc_view_lang_stats": _VIEW_LANG_SQL,
        "lake_host_stats": _HOST_STATS_SQL,
        "cdc_history_scd2": _SCD2_SQL,
        "cdc_pit_lookup": _PIT_SQL,
        "lake_version_diff": _LAKE_DIFF_SQL,
        "cdc_snapshot_state": _SNAPSHOT_SQL,
        "cdc_time_travel": _SNAPSHOT_SQL,
        "cdc_multitable_suppliers": _SUPPLIERS_SQL,
        "cdc_multitable_suppliers_streaming": _SUPPLIERS_SQL,
        # pages state from the MIXED two-table log == single-table replay
        "cdc_multitable_pages": _FINAL_STATE_SQL,
        "cdc_committed_events": _COMMITTED_SQL,
        "cdc_rolled_back_events": _DISCARDED_SQL,
        "cdc_scn_range_stats": _SCN_RANGE_SQL,
        "cdc_lww_latest": _LWW_SQL,
        "cdc_url_revision_churn": _URL_CHURN_SQL,
        "lake_point_lookup": _POINT_LOOKUP_SQL,
        "lake_pruned_scan": _PRUNED_SCAN_SQL,
        # repair converges to the state where corruption never happened
        "cdc_dead_letter_replay": _FINAL_STATE_SQL,
        "cdc_envelope_counts": _ENVELOPE_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_incremental": _DEDUP_INCR_SQL,
        "line_dedup": _LINE_DEDUP_SQL,
        "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
        # LSH at 16 bands x 4 rows finds every pair the exact kernel
        # finds on this data (all true pairs have jaccard >= 0.87;
        # per-pair miss probability (1 - j^4)^16 < 1e-4, and the
        # banding is seed-deterministic), so the exact-Jaccard SQL is
        # a valid oracle for the LSH path as well.
        "dedup_minhash_lsh": _NGRAM_JACCARD_SQL,
        "dedup_cluster_canonical": _CLUSTER_SQL,
        "word_freq_topk": _WORD_FREQ_SQL,
        "doc_lm_score": _DOC_LM_SQL,
        "doc_lm_score_sink": _DOC_LM_SINK_SQL,
        "dsir_select": _DSIR_SQL,
        "benchmark_decontam": _DECONTAM_SQL,
        "winnowing_fingerprints": _WINNOW_SQL,
        "doc_dup_span_removal": _DUP_SPAN_SQL,
        "doc_repetition": _DOC_REPETITION_SQL,
        "dedup_simhash": _SIMHASH_SQL,
        "embedding_near_dup_exact": _EMBED_EXACT_SQL,
        "embedding_near_dup": _EMBED_ND_PLANTED_SQL,
        "corpus_curation": _CURATION_SQL,
        "text_quality": _TEXT_QUALITY_SQL,
        "ann_cosine_topk": _ANN_SQL,
        "ann_cosine_topk_lsh": _ANN_PLANTED_SQL,
        "ann_cosine_topk_ivf": _ANN_PLANTED_SQL,
        "lang_id": _LANG_ID_SQL,
        "doc_fingerprints": _FINGERPRINT_SQL,
        "media_pipeline": _MEDIA_SQL,
        "events_sessionize": _SESSIONIZE_SQL,
        "events_window_stats": _WINDOW_STATS_SQL,
        "orders_asof_events": _ASOF_SQL,
        "events_group_topk": _GROUP_TOPK_SQL,
        "events_value_quantiles": _QUANTILES_SQL,
        "orders_range_join_events": _RANGE_JOIN_SQL,
        "nation_order_stats": _NATION_ORDER_SQL,
        "events_window_sliding": _SLIDING_SQL,
        "customer_order_presence": _SEMI_ANTI_SQL,
        "events_sample_hash": _SAMPLE_HASH_SQL,
        "events_running_total": _RUNNING_TOTAL_SQL,
        "events_running_total_sink": _RUNNING_TOTAL_SINK_SQL,
        "events_type_pivot": _TYPE_PIVOT_SQL,
        "user_custkey_set_ops": _SET_OPS_SQL,
        "events_rollup": _ROLLUP_SQL,
        "events_cube": _CUBE_SQL,
        "events_resample_ffill": _RESAMPLE_SQL,
        "events_markov_transitions": _MARKOV_SQL,
        "events_ohlc": _OHLC_SQL,
        "customer_revenue_topk": _Q3_SQL,
        "word_bigram_topk": _BIGRAM_SQL,
        "part_promo_revenue": _Q14_SQL,
        "region_orders_rollup": _Q5_SQL,
        "events_anomaly_mad": _MAD_SQL,
        "orders_late_shipment": _Q4_SQL,
        "inverted_index_topdocs": _INVIDX_SQL,
        "vocab_fuzzy_join": _FUZZY_JOIN_SQL,
        "orders_skyline": _SKYLINE_SQL,
        "orders_zorder_layout": _ZORDER_SQL,
        "events_wau": _WAU_SQL,
        "table_profile": _PROFILE_SQL,
        "orders_events_join": _HASH_JOIN_SQL,
        "orders_events_join_left": _HASH_JOIN_LEFT_SQL,
        "orders_events_join_full": _HASH_JOIN_FULL_SQL,
        "events_global_rank": _GLOBAL_RANK_SQL,
        "tfidf_topk": _TFIDF_SQL,
        "bm25_topdocs": _BM25_SQL,
        "doc_hits": _HITS_SQL,
        "embedding_pca_power": _PCA_SQL,
        "word_pmi_topk": _WORD_PMI_SQL,
        "contamination_check": _CONTAMINATION_SQL,
        "label_centroids": _LABEL_CENTROIDS_SQL,
        "events_lag_delta": _LAG_DELTA_SQL,
        "events_lag_delta_sink": _LAG_DELTA_SINK_SQL,
        "events_frame_agg": _FRAME_AGG_SQL,
        "events_last_touch": _LAST_TOUCH_SQL,
        "events_user_cms": _USER_CMS_SQL,
        "events_active_time": _ACTIVE_TIME_SQL,
        "basket_pair_rules": _BASKET_RULES_SQL,
        "customer_rfm_segments": _RFM_SQL,
        "doc_connected_components": _CC_SQL,
        "doc_shortest_path": _SSSP_SQL,
        "doc_kcore": _KCORE_SQL,
        "events_type_quantiles": _TYPE_QUANTILES_SQL,
        "events_stratified_sample": _STRATIFIED_SQL,
        "events_props_stats": _PROPS_STATS_SQL,
        "events_type_moments": _TYPE_MOMENTS_SQL,
        "events_type_trend": _TYPE_TREND_SQL,
        "events_user_mode": _USER_MODE_SQL,
        "events_hour_chi2": _HOUR_CHI2_SQL,
        "events_cooccurrence": _COOCCUR_SQL,
        "lineitem_weighted_median": _WMEDIAN_SQL,
        "lineitem_melt": _MELT_SQL,
        "events_value_histogram": _VALUE_HIST_SQL,
        "events_type_gini": _TYPE_GINI_SQL,
        "events_hourly_ar1": _HOURLY_AR1_SQL,
        "customer_decile_lift": _DECILE_LIFT_SQL,
        "customer_large_orders": _Q18_SQL,
        "nation_pair_trade": _Q7_SQL,
        "customer_dormant_cohorts": _Q22_SQL,
        "events_cusum_changepoint": _CUSUM_SQL,
        "events_type_hhi": _TYPE_HHI_SQL,
        "events_type_jaccard": _TYPE_JACCARD_SQL,
        "nation_revenue_share": _Q11_SQL,
        "customer_order_gaps": _ORDER_GAPS_SQL,
        "events_resample_lerp": _RESAMPLE_LERP_SQL,
        "events_seasonality_profile": _SEASONALITY_SQL,
        "lineitem_fd_check": _FD_CHECK_SQL,
        "events_user_lifespan": _USER_LIFESPAN_SQL,
        "orders_open_backlog": _BACKLOG_SQL,
        "events_burstiness": _BURSTINESS_SQL,
        "events_ma_crossover": _MA_CROSS_SQL,
        "orders_yoy_growth": _YOY_SQL,
        "region_nation_share": _REGION_SHARE_SQL,
        "events_linear_attribution": _LINEAR_ATTR_SQL,
        "events_user_count_quantiles": _USER_COUNT_Q_SQL,
        "events_user_type_algebra": _TYPE_ALGEBRA_SQL,
        "doc_lexical_diversity": _LEX_DIVERSITY_SQL,
        "events_session_stats": _SESSION_STATS_SQL,
        "events_gap_histogram": _GAP_HIST_SQL,
        "orders_skyline_layers": _SKYLINE_LAYERS_SQL,
        "events_minmax_normalize": _MINMAX_SQL,
        "events_mann_whitney": _MANN_WHITNEY_SQL,
        "events_type_cosine2": _TYPE_COSINE2_SQL,
        "events_runs_test": _RUNS_TEST_SQL,
        "doc_ngram_novelty": _NGRAM_NOVELTY_SQL,
        "corpus_split_assign": _SPLIT_ASSIGN_SQL,
        "corpus_source_weights": _SOURCE_WEIGHTS_SQL,
        "hard_negative_mining": _HARD_NEG_SQL,
        "events_hourly_acf": _ACF_SQL,
        "events_ks_test": _KS_SQL,
        "events_benford": _BENFORD_SQL,
        "customer_abc_classes": _ABC_SQL,
        "events_share_drift": _SHARE_DRIFT_SQL,
        "embedding_norm2_quantiles": _NORM2_Q_SQL,
        "events_stickiness": _STICKINESS_SQL,
        "events_peak_concurrency": _PEAK_CONCURRENCY_SQL,
        "phrase_proximity_search": _PROXIMITY_SQL,
        "events_spike_hours": _SPIKE_SQL,
        "referential_integrity_audit": _RI_AUDIT_SQL,
        "dedup_rate_by_source": _DEDUP_RATE_SQL,
        "orders_size_histogram": _SIZE_HIST_SQL,
        "events_conversion_latency": _CONV_LATENCY_SQL,
        "word_share_drift_topk": _WORD_DRIFT_SQL,
        "orders_diversified_topk": _DIVERSIFIED_SQL,
        "customer_ltv_triangle": _LTV_SQL,
        "events_tv_distance": _TV_SQL,
        "events_week_heatmap": _WEEK_HEATMAP_SQL,
        "events_type_wjaccard": _TYPE_WJACCARD_SQL,
        "events_odds_ratio": _ODDS_RATIO_SQL,
        "events_churn_rate": _CHURN_SQL,
        "events_winsorized_mean": _WINSOR_SQL,
        "part_supplier_breadth": _PART_BREADTH_SQL,
        "events_first_touch_mix": _FIRST_TOUCH_SQL,
        "events_growth_accounting": _GROWTH_SQL,
        "orders_month_profile": _MONTH_PROFILE_SQL,
        "events_power_users": _POWER_USERS_SQL,
        "events_rate_limit_audit": _RATE_LIMIT_SQL,
        "orders_split_shipments": _SPLIT_SHIP_SQL,
        "orders_fulfillment_latency": _FULFILL_SQL,
        "events_streak_histogram": _STREAK_SQL,
        "lineitem_tax_incidence": _TAX_INCIDENCE_SQL,
        "events_type_corr2": _TYPE_CORR2_SQL,
        "customer_quadrants": _QUADRANTS_SQL,
        "events_iqr_outliers": _IQR_SQL,
        "events_user_distinct": _USER_DISTINCT_SQL,
        "events_user_kmv_distinct": _USER_KMV_SQL,
        "lineitem_pricing": _LINEITEM_PRICING_SQL,
        "lineitem_qp_corr": _QP_CORR_SQL,
        "doc_dup_ngrams": _DUP_NGRAMS_SQL,
        "pii_redaction": _PII_SQL,
        "url_canonicalize": _URL_CANON_SQL,
        "html_text_extract": _HTML_EXTRACT_SQL,
        "html_outlinks": _HTML_OUTLINKS_SQL,
        "web_pagerank": _WEB_PAGERANK_SQL,
        "web_crawl_frontier": _WEB_FRONTIER_SQL,
        "web_anchor_text": _WEB_ANCHOR_SQL,
        "doc_chunking": _DOC_CHUNK_SQL,
        "seq_packing": _SEQ_PACKING_SQL,
        "corpus_budget_select": _BUDGET_SELECT_SQL,
        "embedding_quantize": _EMBED_QUANT_SQL,
        "embedding_kmeans": _KMEANS_SQL,
        "semantic_dedup": _SEMDEDUP_SQL,
        "doc_pagerank": _PAGERANK_SQL,
        "doc_bfs_levels": _BFS_SQL,
        "doc_triangles": _TRIANGLES_SQL,
        "docs_weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "events_funnel": _FUNNEL_SQL,
        "events_cohort_retention": _COHORT_SQL,
        "events_user_path": _USER_PATH_SQL,
        "events_dedup_window": _DEDUP_WINDOW_SQL,
        "events_value_quantiles_cont": _QUANT_CONT_SQL,
    }
