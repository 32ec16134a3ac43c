"""Posting-list construction: delta-gap + VByte blocks with block-max skip
metadata, built with an ORDER-PRESERVING salted shuffle.

SURVEY.md §2-C "Posting-list build" / "Segment merge".  The classic Zipf
problem: one heavy term ("the", or ``i`` in code) can hold a multi-percent
share of all postings; a plain groupBy(term) would hand one reducer the
whole list.  Here the salt is ``rbucket = doc_id // bucket_span`` — a
CONTIGUOUS doc range.  Each (term_id, rbucket) group builds blocks that are
doc-sorted internally and, because buckets partition the doc-id space, the
per-term block sequence ordered by (rbucket, block_no) is already the
merged posting list.  The "segment merge" phase therefore costs zero
shuffles: heavy terms are split across as many tasks as they have buckets,
and no single reducer ever sees a full heavy-term posting list.

Posting schema (one row per 128-doc block — bounded row size, parallel
scan, and the WAND reader prunes whole rows by (first_doc, last_doc,
max_impact)):

    term_id long, rbucket long, block_no int, n int,
    first_doc long, last_doc long, max_tf int, max_impact double,
    doc_blob binary (delta+VByte), tf_blob binary, dl_blob binary
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.codec import delta_encode, vbyte_encode
from .fulltext import B, K1

BLOCK_SIZE = 128

POSTINGS_SCHEMA = (
    "term_id long, rbucket long, block_no int, n int, first_doc long, "
    "last_doc long, max_tf int, max_impact double, doc_blob binary, "
    "tf_blob binary, dl_blob binary"
)


def _build_blocks(pdf: pd.DataFrame, avgdl: float,
                  k1: float = K1, b: float = B) -> pd.DataFrame:
    """One (term_id, rbucket) group -> block rows. Vectorized NumPy."""
    term_id = int(pdf["term_id"].iloc[0])
    rbucket = int(pdf["rbucket"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    docs = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.uint64)
    dls = pdf["dl"].to_numpy()[order].astype(np.uint64)
    impacts = tfs.astype(np.float64) / (
        tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl))
    rows = []
    for blk, s in enumerate(range(0, docs.size, BLOCK_SIZE)):
        e = min(s + BLOCK_SIZE, docs.size)
        rows.append((
            term_id, rbucket, blk, e - s, int(docs[s]), int(docs[e - 1]),
            int(tfs[s:e].max()), float(impacts[s:e].max()),
            vbyte_encode(delta_encode(docs[s:e])),
            vbyte_encode(tfs[s:e]), vbyte_encode(dls[s:e]),
        ))
    return pd.DataFrame(rows, columns=[
        "term_id", "rbucket", "block_no", "n", "first_doc", "last_doc",
        "max_tf", "max_impact", "doc_blob", "tf_blob", "dl_blob"])


def build_postings(tdf: DataFrame, tdict: DataFrame, avgdl: float,
                   bucket_span: int = 1 << 20) -> DataFrame:
    """(doc_id, term, tf, dl) x term_dict -> posting block rows.

    ``bucket_span`` bounds the postings any single task handles for one
    term (tune so span * max_df_density fits executor memory; 2^20 docs
    per bucket => a full-density term contributes ~1M postings ≈ 24 MB raw
    per task).  The term_dict join is a plain equi-join on ``term`` —
    broadcast when the dict is small, sort-merge at vocabulary scale
    (Catalyst/AQE decides; both sides are already term-keyed).
    """
    with_ids = tdf.join(tdict.select("term", "term_id"), "term")
    salted = with_ids.withColumn(
        "rbucket", (F.col("doc_id") / F.lit(bucket_span)).cast("long"))
    return (salted
            .repartition("term_id", "rbucket")
            .groupBy("term_id", "rbucket")
            .applyInPandas(
                lambda pdf: _build_blocks(pdf, avgdl=avgdl),
                schema=POSTINGS_SCHEMA))


def write_postings(postings: DataFrame, path: str) -> None:
    """Persist sorted by (term_id, rbucket, block_no) so parquet row-group
    min/max stats prune term lookups (the sorted-FST role, SURVEY §1.4)."""
    (postings.repartitionByRange("term_id")
     .sortWithinPartitions("term_id", "rbucket", "block_no")
     .write.mode("overwrite").parquet(path))
