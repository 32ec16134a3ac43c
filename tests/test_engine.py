"""FulltextIndex façade: build/search/search_many/phrase/save/load all
delegate to the tested operators with identical results."""

import pytest

from php_lucene_analyzer_spark.corpus import synthetic_corpus
from php_lucene_analyzer_spark.engine import FulltextIndex
from php_lucene_analyzer_spark.operators import fulltext as ft


@pytest.fixture(scope="module")
def idx(spark):
    docs = synthetic_corpus(spark, 400, partitions=4).cache()
    return docs, FulltextIndex.build(spark, docs, ["repo", "path"],
                                     positional=True)


def test_search_matches_exhaustive(spark, idx):
    docs, index = idx
    ids = ft.with_doc_ids(docs, ["repo", "path"])
    tdf = ft.term_doc_freqs(ids, "doc_id", "content").cache()
    n, avgdl = ft.corpus_stats(tdf)
    tstats = ft.term_stats(tdf)
    for q in ("parseToken buildIndex", "merge", "config parser option"):
        got = [(r["doc_id"], r["score"]) for r in
               index.search(q, k=8).collect()]
        want = [(r["doc_id"], r["score"]) for r in
                ft.bm25_topk(tdf, tstats, n, avgdl, q, k=8).collect()]
        assert got == want and got


def test_search_many_matches_search(idx):
    _, index = idx
    qs = {"a": "parse token", "b": "merge stream", "c": "zzz-nothing"}
    many = index.search_many(qs, k=5).collect()
    by_q = {}
    for r in many:
        by_q.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for qid, q in qs.items():
        per = [(r["doc_id"], r["score"]) for r in
               index.search(q, k=5).collect()]
        got = sorted(by_q.get(qid, []), key=lambda t: (-t[1], t[0]))
        assert got == per


def test_phrase_and_save_load(spark, idx, tmp_path):
    _, index = idx
    ph = index.phrase("parse token").collect()
    assert ph and all(r["n_matches"] >= 1 for r in ph)

    path = str(tmp_path / "saved")
    index.save(path)
    re = FulltextIndex.load(spark, path)
    assert (re.n_docs, re.avgdl) == (index.n_docs, index.avgdl)
    q = "parseToken buildIndex"
    assert [(r["doc_id"], r["score"]) for r in re.search(q).collect()] \
        == [(r["doc_id"], r["score"]) for r in index.search(q).collect()]
    assert {(r["doc_id"], r["n_matches"])
            for r in re.phrase("parse token").collect()} \
        == {(r["doc_id"], r["n_matches"]) for r in ph}


def test_search_prefix_matches_operator(spark, idx):
    """Engine prefix search == the prefix_topk operator directly."""
    import pyspark.sql.functions as F

    from php_lucene_analyzer_spark.operators.wand import prefix_topk

    _, index = idx
    some_term = index.tstats.orderBy(F.desc("df")).first()["term"]
    pre = some_term[:2]
    got = [(r["doc_id"], r["score"]) for r in
           index.search_prefix(pre, k=5).collect()]
    want = [(r["doc_id"], r["score"]) for r in
            prefix_topk(index.postings, index.tstats, index.n_docs,
                        index.avgdl, pre, 5).collect()]
    assert got == want and got


def test_fuzzy_expand_and_search(spark, idx):
    """fuzzy_expand finds the edit-distance neighborhood (the automaton
    package's FuzzyQuery role) and search_fuzzy == WAND over the
    expanded OR-set."""
    import pyspark.sql.functions as F

    from php_lucene_analyzer_spark.operators.fulltext import fuzzy_expand
    from php_lucene_analyzer_spark.operators.wand import wand_topk_terms

    _, index = idx
    # a real vocabulary term matches itself at distance 0
    some_term = index.tstats.orderBy(F.desc("df")).first()["term"]
    hits = {r["term"]: r["dist"]
            for r in fuzzy_expand(index.tstats, some_term,
                                  max_edits=1).collect()}
    assert hits.get(some_term) == 0
    # every hit is within the band and actually within distance
    for t, d in hits.items():
        assert d <= 1 and abs(len(t) - len(some_term)) <= 1

    # misspelling: drop the last char -> distance 1 still finds it
    missp = some_term[:-1]
    hits2 = {r["term"] for r in
             fuzzy_expand(index.tstats, missp, max_edits=1).collect()}
    assert some_term in hits2

    # search_fuzzy == wand over the union of expansions
    expanded = sorted(
        {r["term"] for r in fuzzy_expand(index.tstats, missp,
                                         max_edits=1).collect()})
    want = [(r["doc_id"], r["score"]) for r in
            wand_topk_terms(index.postings, index.tstats, index.n_docs,
                            index.avgdl, expanded, 5).collect()]
    # bypass the analyzer for the comparison (it may stem the misspelling
    # differently); call the operator path directly through the engine
    got_df = index.search_fuzzy(missp, k=5, max_edits=1)
    got = [(r["doc_id"], r["score"]) for r in got_df.collect()]
    # engine analyzes the query first; if the analyzed form differs the
    # sets may differ — assert the direct-operator identity instead
    direct = sorted(
        {r["term"] for r in fuzzy_expand(
            index.tstats, index._terms(missp)[0], 1).collect()})
    want2 = [(r["doc_id"], r["score"]) for r in
             wand_topk_terms(index.postings, index.tstats, index.n_docs,
                             index.avgdl, direct, 5).collect()]
    assert got == want2
    assert want  # the un-analyzed expansion is non-trivial too

    # prefix_len prunes to the shared prefix (Lucene prefixLength)
    pref = {r["term"] for r in
            fuzzy_expand(index.tstats, some_term, 1, prefix_len=3)
            .collect()}
    assert all(t.startswith(some_term[:3]) for t in pref)


def test_custom_analyzer_roundtrip(spark):
    """A custom chain (no stemming, no stopwords) flows through build and
    both query paths symmetrically."""
    from php_lucene_analyzer_spark.analysis.analyzers import Analyzer

    an = Analyzer(stemmer=None, stop_words=None)
    docs = synthetic_corpus(spark, 150, partitions=2)
    index = FulltextIndex.build(spark, docs, ["repo", "path"], analyzer=an)
    # "the" survives this chain (no stop list) — must be queryable
    assert index.tstats.filter("term = 'the'").count() == 1
    got = index.search("the", k=5).collect()
    assert got
    many = index.search_many({"q": "the"}, k=5).collect()
    assert {(r["doc_id"], r["score"]) for r in many} \
        == {(r["doc_id"], r["score"]) for r in got}
