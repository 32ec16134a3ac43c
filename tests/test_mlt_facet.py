"""More-like-this (engine facade + seed-term selection) and facet
contract-query sanity.  The oracle-parity of `mlt` / `facet_source` runs
in test_oracle_parity.py; here the engine path is checked against a
driver-side re-derivation of the seed and the WAND core."""

from collections import Counter

import pytest

from php_lucene_analyzer_spark.analysis import analyze
from php_lucene_analyzer_spark.engine import FulltextIndex
from php_lucene_analyzer_spark.operators import fulltext as ft
from php_lucene_analyzer_spark.operators.wand import wand_topk_terms


@pytest.fixture(scope="module")
def idx(spark, docs):
    i = FulltextIndex.build(spark, docs.select("doc_id", "text"),
                            ["doc_id"], text_col="text")
    yield i
    i.close()


@pytest.fixture(scope="module")
def doc3_text(docs):
    return docs.filter("doc_id = 3").collect()[0]["text"]


def test_mlt_matches_rederived_seed(idx, doc3_text):
    got = idx.more_like_this(doc3_text, k=5, max_terms=4,
                             exclude_doc=3).collect()
    # re-derive the seed exactly as documented: top max_terms by tf*idf,
    # tie-break term asc, df from the index's term stats
    cnt = Counter(t.term for t in analyze(doc3_text))
    dfs = {r["term"]: int(r["df"])
           for r in idx.tstats.collect() if r["term"] in cnt}
    ranked = sorted(((t, cnt[t] * ft.idf(idx.n_docs, dfs[t]))
                     for t in dfs), key=lambda x: (-x[1], x[0]))
    seed = sorted(t for t, _ in ranked[:4])
    want = [(r["doc_id"], r["score"]) for r in
            wand_topk_terms(idx.postings, idx.tstats, idx.n_docs,
                            idx.avgdl, seed, 6).collect()
            if r["doc_id"] != 3][:5]
    assert [(r["doc_id"], r["score"]) for r in got] == want
    assert all(r["doc_id"] != 3 for r in got)


def test_mlt_without_exclusion_ranks_source_first(idx, doc3_text):
    got = idx.more_like_this(doc3_text, k=3, max_terms=8).collect()
    # the source document is its own best match under tf·idf seeding
    assert got and got[0]["doc_id"] == 3


def test_mlt_empty_text_is_empty(idx):
    assert idx.more_like_this("", k=5).count() == 0
    assert idx.more_like_this("the and of", k=5).count() == 0


def test_first_match_vs_bruteforce(spark, docs):
    """first_match over the real positional index == per-doc min token
    index of any query term (simplified tokenization)."""
    import re

    from php_lucene_analyzer_spark.operators.positional import (
        first_match, positional_postings)

    pat = re.compile("[^a-z0-9]+")

    def simple_terms(text):
        return [t for t in pat.split((text or "").lower()) if t]

    sub = docs.filter("doc_id < 120").select("doc_id", "text")
    pos = positional_postings(sub.repartitionByRange(4, "doc_id"),
                              "doc_id", "text", terms_fn=simple_terms)
    terms = ["merge", "join", "stream"]  # raw forms: simple_terms no-stem
    got = {r["doc_id"]: r["first_pos"]
           for r in first_match(pos, terms).collect()}
    want = {}
    for row in sub.collect():
        toks = simple_terms(row["text"])
        hits = [i for i, t in enumerate(toks) if t in terms]
        if hits:
            want[row["doc_id"]] = min(hits)
    assert got == want


def test_suggest_matches_bruteforce(idx):
    """suggest == (dist asc, df desc, term asc) over the dictionary."""
    word = "stram"
    got = [(r["term"], r["df"], r["dist"])
           for r in idx.suggest(word, max_edits=2, k=4).collect()]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cand = [(r["term"], int(r["df"]), lev(r["term"], word))
            for r in idx.tstats.collect()
            if r["term"].startswith(word[0])
            and abs(len(r["term"]) - len(word)) <= 2]
    cand = [c for c in cand if c[2] <= 2]
    cand.sort(key=lambda c: (c[2], -c[1], c[0]))
    assert got == cand[:4]
    assert idx.suggest("", k=3).count() == 0
    assert idx.suggest("the", k=3).count() == 0  # stopword


def test_search_regex_equals_prefix_expansion(idx):
    """A '^p.*' regex == the prefix query over the same expansion."""
    import pyspark.sql.functions as F
    pref = idx.tstats.filter(F.col("term").startswith("s")) \
        .count()
    if pref == 0:
        return
    a = [(r["doc_id"], r["score"])
         for r in idx.search_regex("^s.*", k=5, max_expansions=32).collect()]
    b = [(r["doc_id"], r["score"])
         for r in idx.search_prefix("s", k=5, max_expansions=32).collect()]
    assert a == b


def test_search_regex_is_whole_term_anchored(idx):
    """RegexpQuery semantics: the pattern matches the WHOLE term — a
    bare fragment must not hit terms merely containing it."""
    from php_lucene_analyzer_spark.operators.wand import wand_topk_terms
    got = [(r["doc_id"], r["score"])
           for r in idx.search_regex("merg", k=5).collect()]
    want = [(r["doc_id"], r["score"])
            for r in wand_topk_terms(idx.postings, idx.tstats, idx.n_docs,
                                     idx.avgdl, ["merg"], 5).collect()]
    assert got == want and got


def test_suggest_targets_first_stream_token(idx):
    """Multi-token input: the suggestion target is the FIRST analyzed
    token in stream order, not the alphabetically smallest."""
    a = [(r["term"], r["dist"])
         for r in idx.suggest("value stram", k=3).collect()]
    b = [(r["term"], r["dist"])
         for r in idx.suggest("value", k=3).collect()]
    assert a == b and a  # 'valu' (stream-first), never 'stram'


def test_stats_counters(idx):
    s = idx.stats()
    assert s["n_docs"] > 0 and s["avgdl"] > 0
    assert s["n_terms"] == idx.tstats.count()
    assert s["n_blocks"] == idx.postings.count()
    assert s["has_positional"] is False


def test_first_match_empty_terms(spark, docs):
    from php_lucene_analyzer_spark.operators.positional import (
        first_match, positional_postings)
    sub = docs.filter("doc_id < 10").select("doc_id", "text")
    pos = positional_postings(sub.repartitionByRange(2, "doc_id"),
                              "doc_id", "text",
                              terms_fn=lambda t: t.lower().split())
    assert first_match(pos, []).count() == 0
    assert first_match(pos, ["zzzznothere"]).count() == 0
