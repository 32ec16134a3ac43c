"""Positional index + phrase matching vs a brute-force position oracle."""

import pytest

from php_lucene_analyzer_spark.analysis import analyze
from php_lucene_analyzer_spark.operators.positional import (
    _phrase_terms, phrase_match, positional_postings)

PHRASES = [
    "fast merge join",
    "merge join",
    "the spark stream",     # leading stopword -> hole widens the gap
    "window order",
    "dup dup",
]


@pytest.fixture(scope="module")
def pos_index(spark, docs):
    # documents table already carries dense sorted doc_id; partitions after
    # repartitionByRange on doc_id are doc-contiguous
    ranged = docs.repartitionByRange(4, "doc_id")
    return positional_postings(ranged, "doc_id", "text").cache()


def _oracle(docs_rows, phrase):
    terms = _phrase_terms(phrase)
    base = terms[0][1]
    gaps = [(t, p - base) for t, p in terms]
    out = {}
    for row in docs_rows:
        pos = -1
        positions = {}
        for t in analyze(row["text"]):
            pos += t.pos_inc
            positions.setdefault(t.term, set()).add(pos)
        starts = positions.get(gaps[0][0], set())
        n = 0
        for s in starts:
            if all(s + g in positions.get(t, ()) for t, g in gaps[1:]):
                n += 1
        if n:
            out[row["doc_id"]] = n
    return out


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_match_equals_oracle(spark, docs, pos_index, phrase):
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_match(pos_index, phrase).collect()}
    want = _oracle(docs.collect(), phrase)
    assert got == want
    if phrase == "merge join":
        assert got  # sanity: the corpus does contain this bigram


def test_stopword_hole_semantics(spark, pos_index, docs):
    """'the spark' requires spark at the stopword hole's position, i.e.
    gap 2 from a preceding anchor — equivalently the phrase positions
    honor pos_inc holes rather than collapsing them."""
    terms = _phrase_terms("the spark stream")
    # 'the' is removed by the chain; first surviving term anchors at its
    # post-hole position
    assert [t for t, _ in terms] == ["spark", "stream"]
    gaps = [p for _, p in terms]
    assert gaps[1] - gaps[0] == 1
