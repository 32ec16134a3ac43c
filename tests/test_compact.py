"""Segment compaction (operators/postings.py::compact_postings — the
TieredMergePolicy role): bit-identical query results over a rebuilt
physical layout, Σ-preserved stats, and real fragmentation reduction."""

import pytest

import numpy as np
import pyspark.sql.functions as F

from php_lucene_analyzer_spark.operators import fulltext as ft
from php_lucene_analyzer_spark.operators.postings import (
    BLOCK_SIZE, build_postings, compact_postings, term_stats_from_postings)
from php_lucene_analyzer_spark.operators.wand import wand_topk

QUERIES = ["fast merge join", "window order sort", "dup", "the spark stream"]


@pytest.fixture(scope="module")
def fragmented(spark, docs):
    """Heavily fragmented build: 25-doc buckets -> 20 buckets, most
    blocks holding a handful of docs."""
    tdf = ft.term_doc_freqs(docs, "doc_id", "text").cache()
    n, avgdl = ft.corpus_stats(tdf)
    tstats = ft.term_stats(tdf).cache()
    postings = build_postings(tdf, bucket_span=25).cache()
    return dict(n=n, avgdl=avgdl, tstats=tstats, postings=postings)


@pytest.fixture(scope="module")
def compacted(fragmented):
    return compact_postings(fragmented["postings"]).cache()


def test_compaction_reduces_fragmentation(fragmented, compacted):
    before = fragmented["postings"]
    n_buckets_before = before.select("rbucket").distinct().count()
    n_buckets_after = compacted.select("rbucket").distinct().count()
    assert n_buckets_after < n_buckets_before
    assert n_buckets_after == 1  # 500 docs fit one target group
    # physical rows shrink; logical postings are identical
    assert compacted.count() < before.count()
    assert compacted.agg(F.sum("n")).collect()[0][0] \
        == before.agg(F.sum("n")).collect()[0][0]
    assert compacted.agg(F.max("n")).collect()[0][0] <= BLOCK_SIZE


def test_compaction_preserves_term_stats(fragmented, compacted):
    a = {r["term"]: (r["df"], r["cf"])
         for r in term_stats_from_postings(fragmented["postings"]).collect()}
    b = {r["term"]: (r["df"], r["cf"])
         for r in term_stats_from_postings(compacted).collect()}
    assert a == b


@pytest.mark.parametrize("query", QUERIES)
def test_wand_bit_identical_after_compaction(fragmented, compacted, query):
    f = fragmented
    a = wand_topk(f["postings"], f["tstats"], f["n"], f["avgdl"],
                  query).collect()
    b = wand_topk(compacted, f["tstats"], f["n"], f["avgdl"],
                  query).collect()
    assert [(r["doc_id"], r["score"]) for r in a] \
        == [(r["doc_id"], r["score"]) for r in b]


def test_compaction_is_stable(fragmented, compacted):
    """Compacting a compact index changes nothing material."""
    again = compact_postings(compacted)
    assert again.agg(F.sum("n")).collect()[0][0] \
        == compacted.agg(F.sum("n")).collect()[0][0]
    assert again.count() == compacted.count()


def test_small_target_packs_multiple_groups(fragmented):
    """A small target yields multiple doc-disjoint groups in range
    order."""
    cp = compact_postings(fragmented["postings"], target_postings=2000)
    ext = (cp.groupBy("rbucket")
           .agg(F.min("first_doc").alias("lo"),
                F.max("last_doc").alias("hi"))
           .orderBy("lo").collect())
    assert len(ext) > 1
    for prev, cur in zip(ext, ext[1:]):
        assert prev["hi"] < cur["lo"]  # disjoint, ordered ranges
