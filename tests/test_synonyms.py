"""SynonymGraphFilter semantics (analysis/filters.py::synonyms +
Analyzer(synonyms=...)): stacked positions, stop/stem interplay, and
index-time synonym search end-to-end."""

import pytest

from php_lucene_analyzer_spark.analysis.analyzers import Analyzer


def test_synonym_stacks_at_same_position():
    a = Analyzer(stemmer=None, synonyms={"fast": ("quick", "rapid")})
    toks = a.tokens("Fast car")
    assert [(t.term, t.pos_inc) for t in toks] == \
        [("fast", 1), ("quick", 0), ("rapid", 0), ("car", 1)]
    # synonyms carry the original's offsets (they highlight the source)
    assert toks[1].start == toks[0].start and toks[1].end == toks[0].end
    assert toks[1].pos_len == toks[0].pos_len


def test_synonyms_feed_the_stemmer():
    """Rules fire pre-stem, so both sides stem (the Lucene chain order)."""
    a = Analyzer(synonyms={"automobile": ("cars",)})
    assert a.terms("automobile") == ["automobil", "car"]


def test_stopword_cannot_trigger_synonyms():
    a = Analyzer(stemmer=None, synonyms={"the": ("zzz",)})
    assert a.terms("the car") == ["car"]


def test_terms_path_matches_tokens_path():
    a = Analyzer(synonyms={"fast": ("quick",)})
    text = "Fast merge of the fast stream"
    assert a.terms(text) == [t.term for t in a.tokens(text)]


def test_index_time_synonyms_searchable(spark, docs):
    """Docs containing 'fast' become hits for 'quick' when indexed with
    the synonym analyzer — the end-to-end point of the filter."""
    from php_lucene_analyzer_spark.engine import FulltextIndex

    a = Analyzer(synonyms={"fast": ("quickzz",)})
    sub = docs.filter("doc_id < 60").select("doc_id", "text")
    with FulltextIndex.build(spark, sub, ["doc_id"], text_col="text",
                             analyzer=a) as idx:
        hits = {r["doc_id"] for r in idx.search("quickzz", k=100).collect()}
        fast_docs = {r["doc_id"] for r in sub.collect()
                     if "fast" in (r["text"] or "").lower().split()}
        assert hits and hits == fast_docs
