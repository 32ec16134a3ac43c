"""Block-max WAND top-k over the posting blocks (SURVEY.md §2-C).

Distribution model: posting blocks are already salted into contiguous
doc-ranges (``rbucket``, operators/postings.py), so query evaluation
groups the matched terms' blocks by rbucket — every bucket holds all query
terms' postings for one doc-id range — runs document-at-a-time WAND with
block-max skipping inside the bucket (applyInPandas), and the per-bucket
top-k candidates meet in a global TakeOrderedAndProject
(orderBy(score desc, doc_id asc).limit(k)).  Each bucket's work is bounded
by bucket_span regardless of term df, so heavy terms cannot create a
straggler task.

Float contract: per-doc scores sum contributions in term_id (== term
lexicographic) order, mirroring the exhaustive scorer's sort_array +
aggregate — bit-identical results at any parallelism.

Catalyst cannot express document-at-a-time pruning (SURVEY §4), hence the
pandas kernel; everything around it (pruned scan on term_id, grouping,
global top-k) is declarative.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..analysis import analyze
from ..functions.codec import delta_decode, vbyte_decode
from .fulltext import B, K1


class _TermCursor:
    """Doc-ordered cursor over one term's block rows (decode-on-demand)."""

    __slots__ = ("idf", "ub", "first", "last", "maximp", "blobs", "tf_blobs",
                 "dl_blobs", "bi", "wi", "docs", "tfs", "dls", "cur",
                 "k1", "b", "avgdl")

    def __init__(self, idf: float, rows: pd.DataFrame, avgdl: float,
                 k1: float, b: float):
        rows = rows.sort_values(["rbucket", "block_no"])
        self.idf = idf
        self.first = rows["first_doc"].to_numpy()
        self.last = rows["last_doc"].to_numpy()
        self.maximp = rows["max_impact"].to_numpy()
        self.blobs = rows["doc_blob"].tolist()
        self.tf_blobs = rows["tf_blob"].tolist()
        self.dl_blobs = rows["dl_blob"].tolist()
        self.ub = idf * (k1 + 1.0) * float(self.maximp.max()) if len(rows) else 0.0
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.bi = -1
        self.docs = self.tfs = self.dls = None
        self.wi = 0
        self.cur = -1
        self._next_block()

    def _load(self, bi: int) -> None:
        self.bi = bi
        self.docs = delta_decode(vbyte_decode(self.blobs[bi])).astype(np.int64)
        self.tfs = vbyte_decode(self.tf_blobs[bi]).astype(np.float64)
        self.dls = vbyte_decode(self.dl_blobs[bi]).astype(np.float64)
        self.wi = 0
        self.cur = int(self.docs[0])

    def _next_block(self) -> None:
        if self.bi + 1 < len(self.blobs):
            self._load(self.bi + 1)
        else:
            self.cur = 1 << 62  # exhausted sentinel

    def block_max_score(self) -> float:
        """Upper bound of the CURRENT block (block-max refinement)."""
        if self.bi < len(self.maximp):
            return self.idf * (self.k1 + 1.0) * float(self.maximp[self.bi])
        return 0.0

    def block_last(self) -> int:
        return int(self.last[self.bi]) if self.bi < len(self.last) else 1 << 62

    def advance_to(self, target: int) -> None:
        """Skip to the first doc >= target, hopping whole blocks via
        (first_doc, last_doc) metadata without decoding."""
        if self.cur >= target:
            return
        if self.bi < len(self.last) and int(self.last[self.bi]) < target:
            nb = int(np.searchsorted(self.last, target, side="left"))
            if nb >= len(self.blobs):
                self.cur = 1 << 62
                return
            self._load(nb)
        self.wi = int(np.searchsorted(self.docs, target, side="left"))
        if self.wi >= self.docs.size:
            self._next_block()
            if self.cur < target:
                self.advance_to(target)
        else:
            self.cur = int(self.docs[self.wi])

    def score_current(self) -> float:
        tf = self.tfs[self.wi]
        dl = self.dls[self.wi]
        return (self.idf * (tf * (self.k1 + 1.0))
                / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)))

    def step(self) -> None:
        self.wi += 1
        if self.wi >= self.docs.size:
            self._next_block()
        else:
            self.cur = int(self.docs[self.wi])


def _wand_bucket(pdf: pd.DataFrame, term_meta: list[tuple[int, float]],
                 k: int, avgdl: float, k1: float, b: float) -> pd.DataFrame:
    """WAND over one rbucket. term_meta = [(term_id, idf)] in term order."""
    cursors: list[_TermCursor] = []
    for term_id, idf in term_meta:
        rows = pdf[pdf["term_id"] == term_id]
        if len(rows):
            cursors.append(_TermCursor(idf, rows, avgdl, k1, b))
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
    theta = float("-inf")
    big = 1 << 62
    while True:
        live = [c for c in cursors if c.cur < big]
        if not live:
            break
        live.sort(key=lambda c: c.cur)
        # WAND pivot: smallest prefix whose Σ term-ub can beat θ
        acc = 0.0
        pivot = -1
        for i, c in enumerate(live):
            acc += c.ub
            if acc > theta or len(heap) < k:
                pivot = i
                break
        if pivot < 0:
            break
        pivot_doc = live[pivot].cur
        if live[0].cur == pivot_doc:
            # block-max check: tighter bound from the CURRENT blocks
            bm = sum(c.block_max_score() for c in live
                     if c.cur <= pivot_doc <= c.block_last())
            if len(heap) >= k and bm <= theta:
                # Skip the doc range where the involved blocks stay current:
                # capped at the shortest involved block's end AND at the
                # first not-yet-involved cursor position, so every skipped
                # doc's true score is bounded by bm.
                boundary = min(c.block_last() for c in live
                               if c.cur <= pivot_doc <= c.block_last()) + 1
                nxt = min((c.cur for c in live if c.cur > pivot_doc),
                          default=1 << 62)
                boundary = min(boundary, nxt)
                for c in live:
                    if c.cur < boundary:
                        c.advance_to(boundary)
                continue
            # full evaluation, contributions in term order (cursors were
            # built in term_id order; 'live' is re-sorted, so gather first)
            score = 0.0
            for c in cursors:
                if c.cur == pivot_doc:
                    score += c.score_current()
            item = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
                if len(heap) == k:
                    theta = heap[0][0]
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
                theta = heap[0][0]
            for c in cursors:
                if c.cur == pivot_doc:
                    c.step()
        else:
            # advance the leading cursors up to the pivot doc
            for c in live[:pivot]:
                c.advance_to(pivot_doc)
    rows = [(-nd, s) for s, nd in heap]
    return pd.DataFrame(rows, columns=["doc_id", "score"])


def wand_topk(postings: DataFrame, tdict: DataFrame, n_docs: int,
              avgdl: float, query: str, k: int = 10,
              k1: float = K1, b: float = B) -> DataFrame:
    """Block-max WAND top-k for one query string -> (doc_id, score)."""
    import math

    spark = postings.sparkSession
    terms = sorted({t.term for t in analyze(query)})
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    meta_rows = (tdict.filter(F.col("term").isin(terms))
                 .select("term", "term_id", "df").orderBy("term").collect())
    if not meta_rows:
        return spark.createDataFrame([], "doc_id long, score double")
    term_meta = [
        (int(r["term_id"]),
         math.log(1.0 + (float(n_docs) - r["df"] + 0.5) / (r["df"] + 0.5)))
        for r in meta_rows]
    ids = [tid for tid, _ in term_meta]
    matched = postings.filter(F.col("term_id").isin(ids))  # pushed to scan
    local = matched.groupBy("rbucket").applyInPandas(
        lambda pdf: _wand_bucket(pdf, term_meta, k, avgdl, k1, b),
        schema="doc_id long, score double")
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
