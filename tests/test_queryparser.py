"""Query-string parser (queryparser.py) and FulltextIndex.query:
clause extraction, and execution equivalence against the individually
verified primitives (boolean kernel, prefix/fuzzy expansion, phrases)."""

import pytest

from php_lucene_analyzer_spark.engine import FulltextIndex
from php_lucene_analyzer_spark.queryparser import Clause, parse


# ---------------------------------------------------------------- parser
def test_parse_all_clause_kinds():
    got = parse('+fast -slow stream "merge join" +"a b" -"c d" '
                'stram~ valu~1 mer* /st.*m/')
    assert got == [
        Clause("+", "term", "fast"),
        Clause("-", "term", "slow"),
        Clause("", "term", "stream"),
        Clause("", "phrase", "merge join"),
        Clause("+", "phrase", "a b"),
        Clause("-", "phrase", "c d"),
        Clause("", "fuzzy", "stram", 2),
        Clause("", "fuzzy", "valu", 1),
        Clause("", "prefix", "mer"),
        Clause("", "regex", "st.*m"),
    ]


def test_parse_edge_cases():
    with pytest.raises(ValueError):
        parse('broken "quote')
    assert parse("+ -") == []          # dangling modifiers
    assert parse('""') == []           # empty phrase
    assert parse("a*b") == [Clause("", "term", "a*b")]  # mid-token *
    assert parse("*") == [Clause("", "term", "*")]


# ------------------------------------------------------------- execution
@pytest.fixture(scope="module")
def idx(spark, docs):
    i = FulltextIndex.build(spark, docs.select("doc_id", "text"),
                            ["doc_id"], text_col="text", positional=True)
    yield i
    i.close()


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_query_must_equals_search_boolean(idx):
    assert _rows(idx.query("+fast +stream", k=8)) \
        == _rows(idx.search_boolean(must=["fast", "stream"], k=8))


def test_query_should_and_not(idx):
    assert _rows(idx.query("fast stream -slow", k=8)) \
        == _rows(idx.search_boolean(should=["fast", "stream"],
                                    must_not=["slow"], k=8))


def test_query_prefix_equals_prefix_topk(idx):
    got = _rows(idx.query("mer*", k=6))
    want = _rows(idx.search_prefix("mer", k=6))
    assert got == want and got


def test_query_fuzzy_equals_search_fuzzy(idx):
    got = _rows(idx.query("stram~", k=6))
    want = _rows(idx.search_fuzzy("stram", k=6, max_edits=2))
    assert got == want and got


def test_query_regex_equals_search_regex(idx):
    got = _rows(idx.query("/st.*m/", k=6))
    want = _rows(idx.search_regex("st.*m", k=6))
    assert got == want and got


def test_query_pure_phrase_ranks_by_matches(idx, docs):
    import re
    toks = [t for t in re.split(r"[^a-zA-Z0-9]+",
                                docs.filter("doc_id = 3")
                                .collect()[0]["text"]) if t][:2]
    phrase = " ".join(toks)
    got = idx.query(f'+"{phrase}"', k=50).collect()
    want = {r["doc_id"]: r["n_matches"]
            for r in idx.phrase(phrase).collect()}
    assert got and {r["doc_id"] for r in got} <= set(want)
    for r in got:
        assert r["score"] == float(want[r["doc_id"]])


def test_query_phrase_filters_term_results(idx, docs):
    import re
    toks = [t for t in re.split(r"[^a-zA-Z0-9]+",
                                docs.filter("doc_id = 3")
                                .collect()[0]["text"]) if t][:2]
    phrase = " ".join(toks)
    got = _rows(idx.query(f'+value +"{phrase}"', k=50))
    phrase_docs = {r["doc_id"] for r in idx.phrase(phrase).collect()}
    base = _rows(idx.search_boolean(must=["value"], k=10_000))
    want = [(d, s) for d, s in base if d in phrase_docs][:50]
    # same docs, same scores, same order
    assert got == sorted(want, key=lambda x: (-x[1], x[0]))
    assert all(d in phrase_docs for d, _ in got)


def test_query_should_phrase_raises(idx):
    with pytest.raises(ValueError):
        idx.query('"fast merge" value')


def test_query_unknown_must_expansion_is_empty(idx):
    assert idx.query("+zzzqqq* fast", k=5).count() == 0
    assert idx.query("+zzzqqqnotaterm", k=5).count() == 0


def test_query_empty_or_stopwords_is_empty(idx):
    assert idx.query("", k=5).count() == 0
    assert idx.query("the and of", k=5).count() == 0
