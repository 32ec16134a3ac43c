"""DuckDB oracle SQL — one ANSI statement per entry in queries.QUERIES.

Each statement runs against the driver's pre-registered parquet views and
must reproduce the Spark result exactly (names, types aligned, floats
rounded at the contract boundary).  Dialect notes: DuckDB lists are
1-indexed (Spark arrays 0-indexed), sum(BIGINT) is HUGEINT (cast back),
regexp_replace needs the 'g' flag (Spark replaces all by default).
"""

from __future__ import annotations

from .analysis.filters import ENGLISH_STOP_WORDS
from .queries import (ANN_K, ANN_N_QUERIES, BM25_QUERIES, BOOL_QUERIES,
                      DECONTAM_BENCH, DECONTAM_N, FUZZY_QUERIES, LSH_BANDS,
                      LSH_MIN_JACCARD, LSH_N_HASHES, HIGHLIGHT_QUERIES,
                      HIGHLIGHT_WINDOW, MLT_DOCS, MLT_K, MLT_MAX_TERMS,
                      PHRASE_QUERIES, SLOPPY_QUERIES, SUGGEST_K,
                      SUGGEST_QUERIES)

_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS)) + ")"

_TOK = """
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
)"""

_TF = """
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2)"""

_QVALUES = ", ".join(
    f"('{qid}', '{t}')" for qid, ts in BM25_QUERIES.items() for t in ts)

ORACLES: dict[str, str] = {}

ORACLES["content_sha"] = """
SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id LIMIT 200
"""

ORACLES["tf"] = f"""
WITH {_TOK}, {_TF}
SELECT doc_id, term, tf FROM tf
"""

ORACLES["doc_stats"] = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''))::BIGINT AS dl,
       sha256(text) AS content_sha256
FROM documents
"""

ORACLES["term_stats"] = f"""
WITH {_TOK}, {_TF}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf GROUP BY 1
"""

ORACLES["term_dict"] = f"""
WITH {_TOK}, {_TF},
ts AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
       FROM tf GROUP BY 1)
SELECT row_number() OVER (ORDER BY term)::BIGINT AS term_id, term, df, cf
FROM ts
"""

ORACLES["bm25_topk"] = f"""
WITH {_TOK}, {_TF},
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
q(qid, term) AS (VALUES {_QVALUES}),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf
        WHERE term IN (SELECT term FROM q) GROUP BY 1),
scores AS (
  SELECT q.qid, tf.doc_id,
         round(sum(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))),
               4) AS score
  FROM q JOIN tf USING (term) JOIN dfq USING (term)
         JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY 1, 2)
SELECT qid, rank, doc_id, score FROM (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::BIGINT AS rank
  FROM scores) WHERE rank <= 10
"""

ORACLES["text_quality"] = f"""
WITH {_TOK}
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       round(avg(length(term)), 4) AS avg_token_len,
       round(sum(CASE WHEN term IN {_STOP_SQL} THEN 1 ELSE 0 END)::BIGINT
             / count(*)::BIGINT, 4) AS stop_ratio,
       (sum(CASE WHEN term IN {_STOP_SQL} THEN 1 ELSE 0 END)::BIGINT
        / count(*)::BIGINT) > 0.05 AS is_english
FROM tok GROUP BY 1
"""

ORACLES["fingerprint"] = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""

ORACLES["dedup_exact"] = """
SELECT sha256(text) AS h, count(*)::BIGINT AS n,
       min(doc_id)::BIGINT AS keeper
FROM documents GROUP BY 1
"""

ORACLES["minhash"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 3 THEN
           list_transform(generate_series(1, len(t) - 2),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
           ELSE []::VARCHAR[] END) AS s
  FROM toks)
SELECT doc_id,
       min(md5('0:' || s)) AS h0, min(md5('1:' || s)) AS h1,
       min(md5('2:' || s)) AS h2, min(md5('3:' || s)) AS h3
FROM sh GROUP BY 1
"""

# --- simhash: rebuild the operator's 64 bit-sums in SQL.  The per-term
# hash bridge: operators/dedup.py::_md5_u64 (first 8 md5 digest bytes,
# little-endian) == DuckDB md5_number_upper.  Sign bit handled by
# assembling in HUGEINT and wrapping to int64.
_SIMHASH_SUMS = ",\n       ".join(
    f"sum(tf * (((h >> {b}) & 1)::BIGINT * 2 - 1)) AS s{b}"
    for b in range(64))
_SIMHASH_ASSEMBLE = "\n         + ".join(
    f"(CASE WHEN s{b} > 0 THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
    for b in range(64))

ORACLES["simhash"] = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf,
              md5_number_upper(term) AS h
       FROM tok GROUP BY 1, 2),
bits AS (SELECT doc_id,
       {_SIMHASH_SUMS}
       FROM tf GROUP BY 1),
fp AS (SELECT doc_id, ({_SIMHASH_ASSEMBLE}) AS u FROM bits)
SELECT d.doc_id,
       coalesce(CASE WHEN fp.u >= 9223372036854775808::HUGEINT
                     THEN (fp.u - 18446744073709551616::HUGEINT)::BIGINT
                     ELSE fp.u::BIGINT END, 0) AS simhash
FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
"""

# --- lsh_pairs: identical md5 min-hash signatures, band keys, bucket
# self-join and estimated Jaccard as queries.q_lsh_pairs.
_LSH_MINS = ", ".join(f"min(md5('{i}:' || s))" for i in range(LSH_N_HASHES))
_LSH_RPB = LSH_N_HASHES // LSH_BANDS
_LSH_KEY = " || '|' || ".join(
    f"sig[{_LSH_RPB}*b.b + {r + 1}]" for r in range(_LSH_RPB))
_LSH_BAND_LIST = "[" + ", ".join(str(b) for b in range(LSH_BANDS)) + "]"

ORACLES["lsh_pairs"] = f"""
WITH t AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
           FROM documents),
sh AS (SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE []::VARCHAR[] END) AS s
       FROM t),
sig AS (SELECT doc_id, [{_LSH_MINS}] AS sig FROM sh GROUP BY 1),
bands AS (SELECT doc_id, sig, b.b, {_LSH_KEY} AS key
          FROM sig CROSS JOIN (SELECT unnest({_LSH_BAND_LIST}) AS b) b),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
         FROM bands a JOIN bands c ON a.b = c.b AND a.key = c.key
                                  AND a.doc_id < c.doc_id),
est AS (SELECT doc_a, doc_b,
          round(list_sum(list_transform(generate_series(1, {LSH_N_HASHES}),
            i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
            / {float(LSH_N_HASHES)}, 4) AS est_jaccard
        FROM cand JOIN sig sa ON sa.doc_id = doc_a
                  JOIN sig sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, est_jaccard FROM est
WHERE est_jaccard >= {LSH_MIN_JACCARD}
"""


def _phrase_arm(qid: str, phrase: str) -> str:
    terms = [t for t in phrase.lower().split() if t]
    n = len(terms)
    conds = " AND ".join(
        f"toks[i+{j}] = '{t}'" for j, t in enumerate(terms))
    return f"""
  SELECT '{qid}' AS qid, doc_id,
         coalesce(list_sum(list_transform(
           generate_series(1, len(toks) - {n - 1}),
           i -> CASE WHEN {conds} THEN 1 ELSE 0 END)), 0)::BIGINT
           AS n_matches
  FROM t WHERE len(toks) >= {n}"""


ORACLES["phrase_match"] = f"""
WITH t AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
           FROM documents),
m AS ({" UNION ALL ".join(_phrase_arm(q, p)
                          for q, p in PHRASE_QUERIES.items())})
SELECT qid, doc_id, n_matches FROM m WHERE n_matches > 0
"""

def _sloppy_arm(qid: str, phrase: str, slop: int) -> str:
    """One SLOPPY_QUERIES arm: Lucene SloppyPhraseScorer accounting in
    pure SQL — per phrase position i a stream of adjusted positions
    (p - i), occurrence tuples joined per doc with spread <= slop, and
    n_matches = count of windows minimal under containment (the
    kernel's counting convention).  Repeat-free phrases only (no
    distinctness bookkeeping — see queries.SLOPPY_QUERIES)."""
    terms = [t for t in phrase.lower().split() if t]
    streams = ", ".join(
        f"""s{i} AS (SELECT doc_id,
           unnest(list_filter(generate_series(1, len(toks)),
                              x -> toks[x] = '{t}')) - {i} AS v
         FROM t)""" for i, t in enumerate(terms))
    joins = " ".join(f"JOIN s{i} ON s{i}.doc_id = s0.doc_id"
                     for i in range(1, len(terms)))
    vs = ", ".join(f"s{i}.v" for i in range(len(terms)))
    return f"""
  SELECT '{qid}' AS qid, doc_id, count(*)::BIGINT AS n_matches FROM (
    WITH {streams},
    wins AS (
      SELECT DISTINCT s0.doc_id AS doc_id,
             least({vs}) AS lo, greatest({vs}) AS hi
      FROM s0 {joins}
      WHERE greatest({vs}) - least({vs}) <= {slop})
    SELECT w1.doc_id FROM wins w1
    WHERE NOT EXISTS (SELECT 1 FROM wins w2 WHERE w2.doc_id = w1.doc_id
      AND w2.lo >= w1.lo AND w2.hi <= w1.hi
      AND (w2.lo <> w1.lo OR w2.hi <> w1.hi))
  ) GROUP BY doc_id"""


ORACLES["phrase_sloppy"] = f"""
WITH t AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
           FROM documents)
{" UNION ALL ".join(_sloppy_arm(q, p, s)
                    for q, (p, s) in SLOPPY_QUERIES.items())}
"""

ORACLES["decontaminate"] = f"""
WITH t AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
           FROM documents),
sh AS (SELECT doc_id,
         unnest(CASE WHEN len(toks) >= {DECONTAM_N} THEN
           list_transform(generate_series(1, len(toks) - {DECONTAM_N - 1}),
             i -> array_to_string(toks[i:i+{DECONTAM_N - 1}], ' '))
           ELSE []::VARCHAR[] END) AS s
       FROM t),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < {DECONTAM_BENCH})
SELECT doc_id, count(DISTINCT s)::BIGINT AS n_hits
FROM sh WHERE doc_id >= {DECONTAM_BENCH} AND s IN (SELECT s FROM bench)
GROUP BY 1
"""

ORACLES["jaccard_adjacent"] = f"""
WITH {_TOK},
d AS (SELECT DISTINCT doc_id, term FROM tok),
c AS (SELECT doc_id, count(*)::BIGINT AS c FROM d GROUP BY 1),
inter AS (
  SELECT a.doc_id, count(*)::BIGINT AS inter
  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 AND b.term = a.term
  GROUP BY 1)
SELECT i.doc_id, i.inter,
       round(i.inter / (ca.c + cb.c - i.inter), 4) AS jaccard
FROM inter i
JOIN c ca ON ca.doc_id = i.doc_id
JOIN c cb ON cb.doc_id = i.doc_id + 1
"""

ORACLES["ann_cosine"] = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {ANN_N_QUERIES}),
pairs AS (
  SELECT q.qid, b.vec_id,
         list_sum(list_transform(generate_series(1, len(b.embedding)),
                  i -> q.qe[i]::DOUBLE * b.embedding[i]::DOUBLE)) AS dot,
         sqrt(list_sum(list_transform(generate_series(1, len(q.qe)),
                  i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) AS nq,
         sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
                  i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))) AS nb
  FROM embeddings b, q WHERE b.vec_id <> q.qid)
SELECT qid, rank, vec_id, cosine FROM (
  SELECT qid, vec_id, round(dot / (nq * nb), 4) AS cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(dot / (nq * nb), 4) DESC,
                                     vec_id)::BIGINT AS rank
  FROM pairs) WHERE rank <= {ANN_K}
"""

ORACLES["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["top_revenue"] = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
       count(*)::BIGINT AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY revenue DESC, n_name LIMIT 10
"""

ORACLES["events_json"] = """
SELECT event_type, count(*)::BIGINT AS n,
       sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
       round(avg(CAST(props->>'$.k' AS BIGINT)), 6) AS avg_k,
       min(CAST(props->>'$.k' AS BIGINT))::BIGINT AS min_k,
       max(CAST(props->>'$.k' AS BIGINT))::BIGINT AS max_k
FROM events GROUP BY 1
"""

ORACLES["prefix_terms"] = f"""
WITH {_TOK}, {_TF},
ts AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
       FROM tf GROUP BY 1),
td AS (SELECT row_number() OVER (ORDER BY term)::BIGINT AS term_id, term, df
       FROM ts)
SELECT term_id, term, df FROM td
WHERE term LIKE 's%' OR regexp_matches(term, '^.a.+r$')
"""

_FUZZY_ARMS = " UNION ALL ".join(
    f"""
  SELECT '{qid}' AS qid, term, df, levenshtein(term, '{q}')::BIGINT AS dist
  FROM ts WHERE length(term) BETWEEN {len(q) - d} AND {len(q) + d}
    AND levenshtein(term, '{q}') <= {d}"""
    for qid, (q, d) in FUZZY_QUERIES.items())

ORACLES["fuzzy_terms"] = f"""
WITH {_TOK}, {_TF},
ts AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
{_FUZZY_ARMS}
"""

_SUGGEST_ARMS = " UNION ALL ".join(
    f"""
  SELECT * FROM (
    SELECT '{qid}' AS qid, term, df,
           levenshtein(term, '{q}')::BIGINT AS dist
    FROM ts WHERE length(term) BETWEEN {len(q) - 2} AND {len(q) + 2}
      AND term LIKE '{q[0]}%'
      AND levenshtein(term, '{q}') <= 2
    ORDER BY dist ASC, df DESC, term ASC LIMIT {SUGGEST_K})"""
    for qid, q in SUGGEST_QUERIES.items())

ORACLES["suggest"] = f"""
WITH {_TOK}, {_TF},
ts AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
{_SUGGEST_ARMS}
"""

_HL_VALUES = ", ".join(
    f"('{qid}', '{t}')" for qid, ts in HIGHLIGHT_QUERIES.items() for t in ts)

ORACLES["highlight"] = f"""
WITH dt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents),
hq(qid, term) AS (VALUES {_HL_VALUES}),
anchors AS (
  SELECT hq.qid, dt.doc_id, dt.toks,
         min(nullif(list_position(dt.toks, hq.term), 0)) AS min_pos
  FROM hq CROSS JOIN dt
  GROUP BY 1, 2, 3)
SELECT qid, doc_id, (min_pos - 1)::BIGINT AS first_pos,
       array_to_string(
         toks[greatest(min_pos - {HIGHLIGHT_WINDOW}, 1)
              : least(min_pos + {HIGHLIGHT_WINDOW}, len(toks))],
         ' ') AS snippet
FROM anchors WHERE min_pos IS NOT NULL
"""

_MLT_DOCS_SQL = ", ".join(str(d) for d in MLT_DOCS)

ORACLES["mlt"] = f"""
WITH {_TOK}, {_TF},
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
src AS (SELECT doc_id AS src_doc, term, tf FROM tf
        WHERE doc_id IN ({_MLT_DOCS_SQL})),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf
        WHERE term IN (SELECT term FROM src) GROUP BY 1),
seed AS (
  SELECT src_doc, term FROM (
    SELECT src.src_doc, src.term,
           round(src.tf * round(ln(1.0 + (stats.n - dfs.df + 0.5)
                                   / (dfs.df + 0.5)), 4), 4) AS tscore,
           row_number() OVER (
             PARTITION BY src.src_doc
             ORDER BY round(src.tf * round(ln(1.0 + (stats.n - dfs.df + 0.5)
                                          / (dfs.df + 0.5)), 4), 4) DESC,
                      src.term) AS r
    FROM src JOIN dfs USING (term), stats)
  WHERE r <= {MLT_MAX_TERMS}),
scores AS (
  SELECT seed.src_doc, tf.doc_id,
         round(sum(ln(1.0 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1.0 - 0.75
                                     + 0.75 * dl.dl / stats.avgdl))),
               4) AS score
  FROM seed JOIN tf USING (term)
       JOIN dfs USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id, stats
  WHERE tf.doc_id <> seed.src_doc
  GROUP BY 1, 2)
SELECT src_doc, rank, doc_id, score FROM (
  SELECT src_doc, doc_id, score,
         row_number() OVER (PARTITION BY src_doc
                            ORDER BY score DESC, doc_id)::BIGINT AS rank
  FROM scores) WHERE rank <= {MLT_K}
"""

ORACLES["facet_source"] = f"""
WITH {_TOK}, {_TF},
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
q(qid, term) AS (VALUES {_QVALUES}),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf
        WHERE term IN (SELECT term FROM q) GROUP BY 1),
per_doc AS (
  SELECT q.qid, tf.doc_id,
         round(sum(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1.0 - 0.75
                                     + 0.75 * dl.dl / stats.avgdl))),
               4) AS score
  FROM q JOIN tf USING (term) JOIN dfq USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY 1, 2)
SELECT per_doc.qid, d.source, count(*)::BIGINT AS n_docs,
       max(per_doc.score) AS max_score
FROM per_doc JOIN documents d ON per_doc.doc_id = d.doc_id
GROUP BY 1, 2
"""

_BOOL_CLAUSES = ", ".join(
    f"('{qid}', '{t}', '{role}')"
    for qid, c in BOOL_QUERIES.items()
    for role, ts in (("m", c["must"]), ("s", c["should"]),
                     ("n", c["must_not"]))
    for t in ts)
_BOOL_REQS = ", ".join(
    f"('{qid}', {len(c['must'])}, "
    f"{c['msm'] if c['must'] else max(c['msm'], 1)})"
    for qid, c in BOOL_QUERIES.items())

ORACLES["boolean"] = f"""
WITH {_TOK}, {_TF},
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
cl(qid, term, role) AS (VALUES {_BOOL_CLAUSES}),
req(qid, n_must, msm) AS (VALUES {_BOOL_REQS}),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf
        WHERE term IN (SELECT term FROM cl WHERE role <> 'n') GROUP BY 1),
per AS (
  SELECT cl.qid, tf.doc_id,
         round(sum(CASE WHEN cl.role = 'n' THEN 0
                   ELSE ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (1.0 - 0.75
                                          + 0.75 * dl.dl / stats.avgdl))
                   END), 4) AS score,
         count(DISTINCT CASE WHEN cl.role = 'm' THEN cl.term END)::BIGINT
           AS must_hit,
         count(DISTINCT CASE WHEN cl.role = 's' THEN cl.term END)::BIGINT
           AS should_hit,
         max(CASE WHEN cl.role = 'n' THEN 1 ELSE 0 END) AS not_hit
  FROM cl JOIN tf USING (term)
       LEFT JOIN dfq USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY 1, 2)
SELECT qid, rank, doc_id, score FROM (
  SELECT per.qid, doc_id, score,
         row_number() OVER (PARTITION BY per.qid
                            ORDER BY score DESC, doc_id)::BIGINT AS rank
  FROM per JOIN req ON per.qid = req.qid
  WHERE must_hit = n_must AND should_hit >= msm AND not_hit = 0)
WHERE rank <= 10
"""

ORACLES["quality_score"] = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       round(len(list_distinct(toks)) / greatest(len(toks), 1), 4)
         AS uniq_ratio,
       round(length(regexp_replace(text, '[\\w\\s]', '', 'g'))
             / greatest(length(text), 1), 4) AS punct_ratio,
       round(len(list_intersect(toks, {list(sorted(ENGLISH_STOP_WORDS))!r}))
             / greatest(len(toks), 1), 4) AS stop_hint,
       round((CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0
              ELSE 0.3 END)
             * (0.5 * (len(list_distinct(toks)) / greatest(len(toks), 1))
                + 0.5 * (1.0 - length(regexp_replace(text, '[\\w\\s]', '', 'g'))
                         / greatest(length(text), 1))), 4) AS quality
FROM t
"""

ORACLES["token_count"] = r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
  FROM documents)
SELECT doc_id, len(ws)::BIGINT AS ws_tokens,
       ceil(length(text) / 4.0)::BIGINT AS bpe_est,
       greatest(len(ws), ceil(length(text) / 4.0)::BIGINT)::BIGINT
         AS token_budget
FROM t
"""

ORACLES["sessionize"] = """
WITH g AS (
  SELECT user_id, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
              ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, sum(new_sess)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS total_value
FROM g GROUP BY 1
"""

# ---------------------------------------------------------------- round 4

from .queries import GBOOL_CLAUSES, RANGE_QUERIES  # noqa: E402

# ---- full-chain WAND scorer oracle (r5, VERDICT item 9) -------------
# The Spark side (queries.q_wand_fullchain_sql) dumps the full-chain
# token table to parquet; this SQL recomputes BM25 top-10 from it.
# Query terms are the FULL CHAIN's analysis of the query strings,
# computed here in Python (the same chain) and embedded as literals —
# tokenization is Spark-verified upstream (tf/term_stats oracles);
# what this row value-checks is the SCORER.  The driver's correctness
# gate runs at sf0.01, so the path is pinned to that sf.
from .analysis import analyze as _fc_analyze  # noqa: E402
from .queries import FULLCHAIN_WAND_QUERIES, fullchain_dump_path  # noqa: E402

_FC_QVALUES = ", ".join(
    f"('{qid}', '{t}')"
    for qid, q in FULLCHAIN_WAND_QUERIES.items()
    for t in sorted({tok.term for tok in _fc_analyze(q)}))
_FC_PATH = fullchain_dump_path("/root/testdata/sf0.01") + "/*.parquet"

ORACLES["wand_fullchain_sql"] = f"""
WITH t AS (SELECT doc_id, term, tf, dl
           FROM read_parquet('{_FC_PATH}')),
stats AS (SELECT count(DISTINCT doc_id)::BIGINT AS n,
                 sum(tf)::DOUBLE / count(DISTINCT doc_id) AS avgdl
          FROM t),
q(qid, term) AS (VALUES {_FC_QVALUES}),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM t
        WHERE term IN (SELECT term FROM q) GROUP BY 1),
scores AS (
  SELECT q.qid, t.doc_id,
         round(sum(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                   * t.tf * 2.2
                   / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dl / stats.avgdl))),
               4) AS score
  FROM q JOIN t USING (term) JOIN dfq USING (term), stats
  GROUP BY 1, 2)
SELECT qid, rank, doc_id, score FROM (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id)::BIGINT AS rank
  FROM scores) WHERE rank <= 10
"""

_GBOOL_CLAUSES = ", ".join(
    f"('{qid}', {gid}, '{t}', '{role}')"
    for qid, groups in GBOOL_CLAUSES.items()
    for role, gid, ts in groups
    for t in ts)
_GBOOL_REQS = ", ".join(
    f"('{qid}', {sum(1 for r, _, _ in g if r == 'm')}, "
    f"{0 if any(r == 'm' for r, _, _ in g) else 1})"
    for qid, g in GBOOL_CLAUSES.items())

# Grouped BooleanQuery (queries.GBOOL_QUERIES via the round-4 tree
# kernel).  Candidates: every MUST group has >= 1 present term, >= msm
# SHOULD groups hit, no 'n' term present; score: BM25 sum over the
# PRESENT positive terms (clause terms are disjoint within a query, so
# per-clause scoring == per-present-term scoring).  n/avgdl use ALL
# documents (zero-token docs count — the engine's n_docs = corpus row
# count); both engines rank the 4dp-ROUNDED score with doc_id asc.
ORACLES["boolean_grouped"] = f"""
WITH {_TOK}, {_TF},
dla AS (SELECT doc_id,
               len(list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> ''))::BIGINT AS dl
        FROM documents),
stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dla),
cl(qid, gid, term, role) AS (VALUES {_GBOOL_CLAUSES}),
req(qid, n_must, msm) AS (VALUES {_GBOOL_REQS}),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf
        WHERE term IN (SELECT term FROM cl WHERE role <> 'n') GROUP BY 1),
per AS (
  SELECT cl.qid, tf.doc_id,
         round(sum(CASE WHEN cl.role = 'n' THEN 0
                   -- parenthesized exactly as the tree kernel
                   -- associates: w * (tf*(k1+1)) / denom — float
                   -- multiplication is not associative and the 4dp
                   -- round must see the identical double
                   ELSE ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                        * (tf.tf * 2.2)
                        / (tf.tf + 1.2 * (1.0 - 0.75
                                          + 0.75 * dla.dl / stats.avgdl))
                   END), 4) AS score,
         count(DISTINCT CASE WHEN cl.role = 'm' THEN cl.gid END)::BIGINT
           AS must_hit,
         count(DISTINCT CASE WHEN cl.role = 's' THEN cl.gid END)::BIGINT
           AS should_hit,
         max(CASE WHEN cl.role = 'n' THEN 1 ELSE 0 END) AS not_hit
  FROM cl JOIN tf USING (term)
       LEFT JOIN dfq USING (term)
       JOIN dla ON tf.doc_id = dla.doc_id, stats
  GROUP BY 1, 2)
SELECT qid, rank, doc_id, score FROM (
  SELECT per.qid, doc_id, score,
         row_number() OVER (PARTITION BY per.qid
                            ORDER BY score DESC, doc_id)::BIGINT AS rank
  FROM per JOIN req ON per.qid = req.qid
  WHERE must_hit = n_must AND should_hit >= msm AND not_hit = 0)
WHERE rank <= 10
"""

_RANGE_PREDS = " UNION ALL ".join(
    "SELECT '{qid}' AS qid, term_id, term, df FROM td WHERE {conds}".format(
        qid=qid,
        conds=" AND ".join(
            ([f"term >{'=' if incl_lo else ''} '{lo}'"] if lo is not None
             else [])
            + ([f"term <{'=' if incl_hi else ''} '{hi}'"] if hi is not None
               else []))
        or "TRUE")
    for qid, (lo, hi, incl_lo, incl_hi) in RANGE_QUERIES.items())

ORACLES["range_terms"] = f"""
WITH {_TOK}, {_TF},
ts AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
       FROM tf GROUP BY 1),
td AS (SELECT row_number() OVER (ORDER BY term)::BIGINT AS term_id,
              term, df FROM ts)
{_RANGE_PREDS}
"""

_HL_VALUES = ", ".join(
    f"('{qid}', '{t}')"
    for qid, ts in HIGHLIGHT_QUERIES.items() for t in ts)

# Char-offset highlighting (queries.q_snippet_offsets — the offsets-
# enabled positional index).  The corpus text is single-space-joined
# lowercase tokens, so the char start of token i is the cumulative
# length of the preceding tokens plus one separator each; the engine
# reads the SAME numbers back from its stored offset blobs.
ORACLES["snippet_offsets"] = f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
           FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term,
               generate_subscripts(toks, 1)::BIGINT AS ord
        FROM t),
pref AS (SELECT doc_id, term, ord,
                COALESCE(sum(length(term) + 1) OVER (
                    PARTITION BY doc_id ORDER BY ord
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS off_start
         FROM tok WHERE term <> ''),
q(qid, term) AS (VALUES {_HL_VALUES}),
hit AS (SELECT q.qid, p.doc_id, p.ord, p.off_start, p.term,
               row_number() OVER (PARTITION BY q.qid, p.doc_id
                                  ORDER BY p.ord) AS rn
        FROM q JOIN pref p USING (term))
SELECT h.qid, h.doc_id, (h.ord - 1)::BIGINT AS first_pos,
       h.off_start,
       (h.off_start + length(h.term))::BIGINT AS off_end,
       substring(t.text, (h.off_start + 1)::INT,
                 length(h.term)::INT) AS snippet
FROM hit h JOIN t ON h.doc_id = t.doc_id
WHERE h.rn = 1
"""
