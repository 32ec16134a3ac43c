"""Positional postings + phrase matching.

The reference's chain defines token POSITIONS (pos_inc/pos_len graph,
TokenStream.php attributes; stop filters leave holes, WDGF stacks parts)
— this operator materializes them into a positional index so phrase
queries evaluate with true Lucene position semantics (a stopword hole
breaks exact adjacency, a WDGF part shares its original's position).

Schema: one row per (term, doc) carrying a delta+VByte position blob,
bucketed by the same doc-range ``rbucket`` scheme as the BM25 blocks
(phrase evaluation groups by rbucket, so per-task work stays bounded).
At 100 TB the rows pack into 128-doc blocks exactly like postings.py;
the per-(term,doc) row form is kept here for clarity since phrase
evaluation is doc-at-a-time anyway.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..analysis import analyze
from ..functions.codec import delta_decode, delta_encode, vbyte_decode, vbyte_encode

POS_SCHEMA = ("term string, rbucket long, doc_id long, tf int, "
              "pos_blob binary")


def positional_postings(docs_with_ids: DataFrame, id_col: str = "doc_id",
                        text_col: str = "content") -> DataFrame:
    """Fused analyze (FULL chain, graph positions) -> positional rows.
    Requires doc-range-partitioned input (with_doc_ids output)."""

    def build(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            for did, text in zip(pdf[id_col].to_numpy(), pdf[text_col]):
                pos = -1
                acc: dict[str, list[int]] = defaultdict(list)
                for t in analyze(text or ""):
                    pos += t.pos_inc
                    acc[t.term].append(pos)
                for term in sorted(acc):
                    ps = np.asarray(sorted(set(acc[term])), dtype=np.uint64)
                    rows.append((term, pid, int(did), int(ps.size),
                                 vbyte_encode(delta_encode(ps))))
        yield pd.DataFrame(rows, columns=["term", "rbucket", "doc_id",
                                          "tf", "pos_blob"])

    return docs_with_ids.select(id_col, text_col).mapInPandas(
        build, schema=POS_SCHEMA)


def _phrase_terms(phrase: str) -> list[tuple[str, int]]:
    """(term, position) pairs of the analyzed phrase — stopword holes
    widen the required gap, exactly like Lucene's PhraseQuery with
    position increments."""
    out = []
    pos = -1
    for t in analyze(phrase):
        pos += t.pos_inc
        if t.pos_inc > 0 or not out:
            out.append((t.term, pos))
        # pos_inc==0 stacked tokens (WDGF originals/parts) — keep the
        # first at each position; phrase matching uses one term/position
    return out


def phrase_match(pos_postings: DataFrame, phrase: str) -> DataFrame:
    """Docs containing the exact phrase -> (doc_id, n_matches).

    Per rbucket: intersect the phrase terms' doc sets, then verify
    position alignment (p_i - p_0 == gap_i for some start p_0) with
    NumPy set intersections over decoded position arrays.
    """
    spark = pos_postings.sparkSession
    terms = _phrase_terms(phrase)
    if not terms:
        return spark.createDataFrame([], "doc_id long, n_matches int")
    base_pos = terms[0][1]
    gaps = [(t, p - base_pos) for t, p in terms]
    term_list = [t for t, _ in gaps]

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, dict[int, np.ndarray]] = {}
        for term, g in pdf.groupby("term"):
            per_term[term] = {
                int(d): delta_decode(vbyte_decode(b)).astype(np.int64)
                for d, b in zip(g["doc_id"], g["pos_blob"])}
        first = per_term.get(term_list[0], {})
        out = []
        for doc, starts in first.items():
            cand = starts
            ok = True
            for term, gap in gaps[1:]:
                plist = per_term.get(term, {}).get(doc)
                if plist is None:
                    ok = False
                    break
                cand = cand[np.isin(cand + gap, plist)]
                if cand.size == 0:
                    ok = False
                    break
            if ok and cand.size:
                out.append((doc, int(cand.size)))
        return pd.DataFrame(out, columns=["doc_id", "n_matches"])

    matched = pos_postings.filter(F.col("term").isin(term_list))
    return (matched.groupBy("rbucket")
            .applyInPandas(lambda pdf: bucket(pdf),
                           schema="doc_id long, n_matches int")
            .orderBy("doc_id"))
