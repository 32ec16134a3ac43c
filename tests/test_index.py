"""Index correctness (SURVEY.md §5.4-5.5): brute-force pandas BM25 oracle ==
DataFrame engine == block-max WAND, including exact float equality and
rank identity at different parallelism levels."""

import math
from collections import Counter

import pandas as pd
import pytest

import pyspark.sql.functions as F

from php_lucene_analyzer_spark.analysis import analyze
from php_lucene_analyzer_spark.operators import fulltext as ft
from php_lucene_analyzer_spark.operators.postings import build_postings
from php_lucene_analyzer_spark.operators.wand import wand_topk

QUERIES = [
    "fast merge join",
    "window order sort",
    "the spark stream",
    "vector column batch data",
    "dup",
]


@pytest.fixture(scope="module")
def index(spark, docs):
    tdf = ft.term_doc_freqs(docs, "doc_id", "text").cache()
    n, avgdl = ft.corpus_stats(tdf)
    tstats = ft.term_stats(tdf).cache()
    tdict = ft.term_dict(tstats).cache()
    # small bucket span so multiple rbuckets exist at 500 docs
    postings = build_postings(tdf, tdict, avgdl, bucket_span=100).cache()
    return dict(tdf=tdf, n=n, avgdl=avgdl, tstats=tstats, tdict=tdict,
                postings=postings)


def _pandas_bm25_oracle(docs_pdf: pd.DataFrame, query: str, k: int = 10):
    """Brute-force reference: pure pandas, no Spark. Same analyzer chain."""
    k1, b = ft.K1, ft.B
    per_doc = {}
    dls = {}
    for _, row in docs_pdf.iterrows():
        toks = analyze(row["text"])
        per_doc[row["doc_id"]] = Counter(t.term for t in toks)
        dls[row["doc_id"]] = len(toks)
    n = len(per_doc)
    avgdl = sum(dls.values()) / n
    qterms = sorted({t.term for t in analyze(query)})
    df = {t: sum(1 for c in per_doc.values() if t in c) for t in qterms}
    scores = {}
    for d, counts in per_doc.items():
        s = 0.0
        for t in qterms:  # term-asc order: the engine's float contract
            if t in counts and df[t]:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                tf = float(counts[t])
                s += (idf * (tf * (k1 + 1.0))
                      / (tf + k1 * (1.0 - b + b * dls[d] / avgdl)))
        if s > 0.0:
            scores[d] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return top


@pytest.mark.parametrize("query", QUERIES)
def test_exhaustive_bm25_matches_pandas_oracle(spark, docs, index, query):
    got = ft.bm25_topk(index["tdf"], index["tstats"], index["n"],
                       index["avgdl"], query).collect()
    want = _pandas_bm25_oracle(docs.toPandas(), query)
    assert [(r["doc_id"], r["score"]) for r in got] == want


@pytest.mark.parametrize("query", QUERIES)
def test_wand_matches_exhaustive_bit_identical(spark, index, query):
    exh = ft.bm25_topk(index["tdf"], index["tstats"], index["n"],
                       index["avgdl"], query).collect()
    wnd = wand_topk(index["postings"], index["tdict"], index["n"],
                    index["avgdl"], query).collect()
    assert [(r["doc_id"], r["score"]) for r in wnd] \
        == [(r["doc_id"], r["score"]) for r in exh]


def test_doc_ids_deterministic_across_partitioning(spark, docs):
    a = ft.with_doc_ids(docs.repartition(7), ["doc_id"], partitions=3)
    b = ft.with_doc_ids(docs.repartition(2), ["doc_id"], partitions=5)
    pa = {r["doc_id"]: r["doc_id"] for r in a.collect()}
    got_a = sorted((r["doc_id"],) for r in a.select("doc_id").collect())
    got_b = sorted((r["doc_id"],) for r in b.select("doc_id").collect())
    assert got_a == got_b
    # dense 0..N-1
    n = docs.count()
    assert got_a == [(i,) for i in range(n)]


def test_rank_identity_across_parallelism(docs):
    """Same query, different shuffle partitioning -> identical (doc, score)
    lists (the N vs 4N cluster-size contract, BASELINE.json north_rule)."""
    from php_lucene_analyzer_spark.session import get_spark
    results = []
    for parts in (2, 8):
        spark = get_spark(app=f"rank-{parts}", cpus=4, shuffle_partitions=parts)
        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        tdf = ft.term_doc_freqs(d, "doc_id", "text")
        n, avgdl = ft.corpus_stats(tdf)
        tstats = ft.term_stats(tdf)
        got = ft.bm25_topk(tdf, tstats, n, avgdl, QUERIES[0]).collect()
        results.append([(r["doc_id"], r["score"]) for r in got])
    assert results[0] == results[1]


def test_postings_roundtrip_covers_all_docs(spark, index):
    """Decoded postings == the (doc,term,tf) stream they were built from."""
    import numpy as np

    from php_lucene_analyzer_spark.functions.codec import (
        delta_decode, vbyte_decode)

    rows = index["postings"].filter(F.col("term_id") == 1).collect()
    tdict_row = index["tdict"].filter(F.col("term_id") == 1).collect()[0]
    docs_decoded = []
    for r in sorted(rows, key=lambda r: (r["rbucket"], r["block_no"])):
        docs_decoded.extend(
            delta_decode(vbyte_decode(bytes(r["doc_blob"]))).tolist())
    expected = [r["doc_id"] for r in index["tdf"]
                .filter(F.col("term") == tdict_row["term"])
                .orderBy("doc_id").collect()]
    assert docs_decoded == expected
    assert docs_decoded == sorted(docs_decoded)
