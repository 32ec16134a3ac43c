"""Boolean query evaluation over the posting blocks (Lucene BooleanQuery).

The reference ships the analysis side of Lucene; its query layer (which
this engine re-creates Spark-first, SURVEY §2-C) owes users Lucene's
BooleanQuery semantics: MUST clauses all match (AND), SHOULD clauses
score and at least ``minimum_should_match`` of them match, MUST_NOT
clauses exclude (and never score) — Lucene's BooleanQuery /
MinShouldMatchSumScorer roles, re-expressed over this engine's block
postings instead of a doc-at-a-time scorer tree.

Distribution model — identical to WAND's (operators/wand.py): posting
blocks live in doc-disjoint ``rbucket`` ranges, so every doc's full term
membership is visible inside one bucket.  One applyInPandas pass per
bucket evaluates every clause vectorized (NumPy set algebra over the
decoded doc arrays — conjunctions/counts via ``np.unique``, exclusions
via ``np.isin``), emits the bucket's top-k, and a global
TakeOrderedAndProject finishes.  Per-bucket work is bounded by the build
partition size; nothing is all-pairs and nothing funnels through one
task.

Unlike WAND (top-k pruning, document-at-a-time cursors), boolean
evaluation wants the MATCHING SET, whose candidates are bounded by the
rarest MUST term's postings inside each bucket — full-block decode +
vectorized set ops beats cursor hopping in a batch engine, and keeps the
whole kernel NumPy (no per-doc Python).

Float contract: per-doc scores accumulate clause contributions in
term-lexicographic order (the same rule as the exhaustive scorer and
WAND), so results are bit-identical at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.codec import delta_decode, vbyte_decode
from .fulltext import B, K1, idf as bm25_idf
from .wand import _filter_terms, _topk_cut

_EMPTY_SCHEMA = "doc_id long, score double"


def _decode_term(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray,
                                              np.ndarray]:
    """Concatenate one term's blocks -> (docs, tfs, dls), doc-ascending.

    Blocks of one term are doc-disjoint and first_doc-ordered by
    construction (see _TermCursor in wand.py), so concatenation in
    first_doc order IS global doc order."""
    rows = rows.sort_values("first_doc")
    docs = np.concatenate([
        delta_decode(vbyte_decode(bb)).astype(np.int64)
        for bb in rows["doc_blob"]])
    tfs = np.concatenate([
        vbyte_decode(bb).astype(np.float64) for bb in rows["tf_blob"]])
    dls = np.concatenate([
        vbyte_decode(bb).astype(np.float64) for bb in rows["dl_blob"]])
    return docs, tfs, dls


def _bool_bucket(pdf: pd.DataFrame, scoring_meta: list[tuple[str, float]],
                 must: set[str], not_terms: set[str], n_must: int,
                 msm: int, k: int, avgdl: float, k1: float,
                 b: float) -> pd.DataFrame:
    """Evaluate the boolean query inside ONE doc-range bucket."""
    decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for term, g in pdf.groupby("term"):
        decoded[term] = _decode_term(g)

    # ---- candidate set by clause algebra (doc ids only, no scoring yet)
    must_in_bucket = [t for t in sorted(must) if t in decoded]
    if n_must and len(must_in_bucket) < n_must:
        # a MUST term has no postings in this doc range -> no doc here
        # can satisfy the conjunction (buckets are doc-disjoint)
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    # per-bucket doc arrays of the SHOULD clauses (shared by both msm
    # paths below — keep one definition so they cannot diverge)
    should_docs = [decoded[t][0] for t, _ in scoring_meta
                   if t in decoded and t not in must]
    if n_must:
        cand = decoded[must_in_bucket[0]][0]
        for t in must_in_bucket[1:]:
            cand = np.intersect1d(cand, decoded[t][0], assume_unique=True)
            if cand.size == 0:
                break
    elif not should_docs:
        cand = np.empty(0, dtype=np.int64)
    elif msm <= 1:
        cand = np.unique(np.concatenate(should_docs))
    else:
        u, c = np.unique(np.concatenate(should_docs), return_counts=True)
        cand = u[c >= msm]
    if cand.size == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})

    if n_must and msm:
        if len(should_docs) < msm:
            cand = np.empty(0, dtype=np.int64)
        else:
            allc = np.concatenate(should_docs)
            hits = allc[np.isin(allc, cand, assume_unique=False)]
            u, c = np.unique(hits, return_counts=True)
            cand = u[c >= msm]
        if cand.size == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})

    for t in sorted(not_terms):
        if t in decoded:
            cand = cand[~np.isin(cand, decoded[t][0], assume_unique=True)]
    if cand.size == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})

    # ---- score survivors: term-lex accumulation (float contract)
    scores = np.zeros(cand.size, dtype=np.float64)
    for term, tidf in scoring_meta:  # scoring_meta is term-sorted
        if term not in decoded:
            continue
        docs, tfs, dls = decoded[term]
        pos = np.searchsorted(docs, cand)
        pos_ok = pos < docs.size
        hit = np.zeros(cand.size, dtype=bool)
        hit[pos_ok] = docs[pos[pos_ok]] == cand[pos_ok]
        p = pos[hit]
        contrib = (tidf * tfs[p] * (k1 + 1.0)
                   / (tfs[p] + k1 * (1.0 - b + b * dls[p] / avgdl)))
        scores[hit] += contrib

    d, s = _topk_cut(cand, scores, k)
    return pd.DataFrame({"doc_id": d, "score": s})


def boolean_topk(postings: DataFrame, tstats: DataFrame, n_docs: int,
                 avgdl: float, must: list[str] | None = None,
                 should: list[str] | None = None,
                 must_not: list[str] | None = None, msm: int = 0,
                 k: int = 10, k1: float = K1, b: float = B) -> DataFrame:
    """Boolean top-k -> (doc_id, score) over a built postings index.

    Semantics (Lucene BooleanQuery):
      * every ``must`` term matches (a must term absent from the corpus
        empties the result — AND over a non-existent posting list);
      * at least ``msm`` of the ``should`` terms match; with no must
        clauses the effective minimum is ``max(msm, 1)`` (a pure-SHOULD
        BooleanQuery requires one matching clause);
      * no ``must_not`` term matches; must_not never scores;
      * score = BM25 sum over matched must+should terms.
    """
    spark = postings.sparkSession
    must_s = sorted(set(must or []))
    should_s = sorted(set(should or []) - set(must_s))
    not_s = sorted(set(must_not or []))
    eff_msm = msm if must_s else max(msm, 1)
    scoring = sorted(set(must_s) | set(should_s))
    if not scoring:
        return spark.createDataFrame([], _EMPTY_SCHEMA)

    meta_rows = (_filter_terms(tstats, scoring)
                 .select("term", "df").orderBy("term").collect())
    dfs = {r["term"]: int(r["df"]) for r in meta_rows}
    if any(t not in dfs for t in must_s):
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    should_alive = [t for t in should_s if t in dfs]
    if eff_msm > len(should_alive):
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    scoring_meta = [(t, bm25_idf(n_docs, dfs[t]))
                    for t in scoring if t in dfs]

    all_terms = sorted(set(t for t, _ in scoring_meta) | set(not_s))
    matched = _filter_terms(postings, all_terms)  # pushed / semi-join
    must_set, not_set = set(must_s), set(not_s)
    n_must = len(must_s)
    local = matched.groupBy("rbucket").applyInPandas(
        lambda pdf: _bool_bucket(pdf, scoring_meta, must_set, not_set,
                                 n_must, eff_msm, k, avgdl, k1, b),
        schema=_EMPTY_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
