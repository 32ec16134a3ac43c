"""Query-string parser (queryparser.py) and FulltextIndex.query:
classic-Lucene grammar (occur algebra, grouping, fields, ranges,
boosts), and execution equivalence against the individually verified
primitives (boolean kernel, prefix/fuzzy expansion, phrases)."""

import pytest

from php_lucene_analyzer_spark.engine import FulltextIndex
from php_lucene_analyzer_spark.queryparser import (
    Atom, Bool, MUST, MUST_NOT, SHOULD, parse_query, wildcard_to_regex)


def _occ_kinds(tree):
    return [(occ, c.kind if isinstance(c, Atom) else "bool", getattr(
        c, "value", None)) for occ, c in tree.clauses]


# ---------------------------------------------------------------- parser
def test_parse_all_clause_kinds():
    t = parse_query('+fast -slow stream "merge join" +"a b" -"c d" '
                    'stram~ valu~1 mer* /st.*m/ te?t [m TO q} x^2')
    assert _occ_kinds(t) == [
        (MUST, "term", "fast"),
        (MUST_NOT, "term", "slow"),
        (SHOULD, "term", "stream"),
        (SHOULD, "phrase", "merge join"),
        (MUST, "phrase", "a b"),
        (MUST_NOT, "phrase", "c d"),
        (SHOULD, "fuzzy", "stram"),
        (SHOULD, "fuzzy", "valu"),
        (SHOULD, "prefix", "mer"),
        (SHOULD, "regex", "st.*m"),
        (SHOULD, "wildcard", "te?t"),
        (SHOULD, "range", ""),
        (SHOULD, "term", "x"),
    ]
    fuzz = [c for _, c in t.clauses if c.kind == "fuzzy"]
    assert [f.edits for f in fuzz] == [2, 1]
    rng = next(c for _, c in t.clauses if c.kind == "range")
    assert (rng.lo, rng.hi, rng.incl_lo, rng.incl_hi) \
        == ("m", "q", True, False)
    assert t.clauses[-1][1].boost == 2.0


def test_parse_occur_algebra_lucene():
    # the classic gotcha: with default OR, AND promotes its left
    # neighbor — a AND b OR c == +a +b c
    t = parse_query("a AND b OR c")
    assert [(o, c.value) for o, c in t.clauses] \
        == [(MUST, "a"), (MUST, "b"), (SHOULD, "c")]
    t = parse_query("a OR b AND c")
    assert [(o, c.value) for o, c in t.clauses] \
        == [(SHOULD, "a"), (MUST, "b"), (MUST, "c")]
    t = parse_query("a AND NOT b")
    assert [(o, c.value) for o, c in t.clauses] \
        == [(MUST, "a"), (MUST_NOT, "b")]
    t = parse_query("NOT a")
    assert [(o, c.value) for o, c in t.clauses] == [(MUST_NOT, "a")]
    t = parse_query("a && b || !c")
    assert [(o, c.value) for o, c in t.clauses] \
        == [(MUST, "a"), (MUST, "b"), (MUST_NOT, "c")]
    # keywords are case-sensitive: lowercase 'and' is a term
    t = parse_query("a and b")
    assert [(o, c.value) for o, c in t.clauses] \
        == [(SHOULD, "a"), (SHOULD, "and"), (SHOULD, "b")]


def test_parse_default_operator_and():
    t = parse_query("a b", default_operator="AND")
    assert [(o, c.value) for o, c in t.clauses] \
        == [(MUST, "a"), (MUST, "b")]
    t = parse_query("a OR b", default_operator="AND")
    assert [(o, c.value) for o, c in t.clauses] \
        == [(SHOULD, "a"), (SHOULD, "b")]


def test_parse_grouping_fields_boosts():
    t = parse_query('title:(a OR b^2)^3 AND body.x:c')
    (o1, g), (o2, c) = t.clauses
    assert o1 == MUST and isinstance(g, Bool) and g.boost == 3.0
    assert [(o, a.field, a.value, a.boost) for o, a in g.clauses] \
        == [(SHOULD, "title", "a", 1.0), (SHOULD, "title", "b", 2.0)]
    assert o2 == MUST and c.field == "body.x" and c.value == "c"
    # nested parens
    t = parse_query("((a OR b) AND c) d")
    (o1, g), (o2, d) = t.clauses
    assert o1 == SHOULD and isinstance(g, Bool)
    inner = g.clauses[0][1]
    assert isinstance(inner, Bool) and g.clauses[0][0] == MUST


def test_parse_errors_and_edges():
    with pytest.raises(ValueError):
        parse_query('broken "quote')
    t = parse_query('"a b"~2')           # slop parses (round 4)
    assert t.clauses[0][1].kind == "phrase" \
        and t.clauses[0][1].edits == 2
    with pytest.raises(ValueError):
        parse_query("(a OR b")           # unbalanced paren
    with pytest.raises(ValueError):
        parse_query("a) b")
    assert parse_query("+ -").clauses == ()
    assert parse_query('""').clauses == ()
    t = parse_query("a*b")               # mid-token * is a wildcard now
    assert t.clauses[0][1].kind == "wildcard"
    assert wildcard_to_regex("a*b?c.") == "a.*b.c\\."
    assert parse_query("*").clauses[0][1].kind == "term"


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


def test_query_and_operator_equals_must(idx):
    assert _rows(idx.query("fast AND stream", k=8)) \
        == _rows(idx.query("+fast +stream", k=8))


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


def test_query_wildcard_equals_regex(idx):
    got = _rows(idx.query("st?eam", k=6))
    want = _rows(idx.search_regex("st.eam", k=6))
    assert got == want and got


def test_query_pure_phrase_scores_weighted(idx, docs):
    """'+"<phrase>"': a required phrase SCORES (r5 Lucene parity —
    BooleanScorer sums required-clause scores): contribution =
    Σidf(phrase terms) x BM25 saturation of the match count.  Earlier
    rounds ranked pure-phrase queries by raw match count."""
    import re
    from php_lucene_analyzer_spark.operators.fulltext import K1, idf
    toks = [t for t in re.split(r"[^a-zA-Z0-9]+",
                                docs.filter("doc_id = 3")
                                .collect()[0]["text"]) if t][:2]
    phrase = " ".join(toks)
    got = idx.query(f'+"{phrase}"', k=50).collect()
    want = {r["doc_id"]: r["n_matches"]
            for r in idx.phrase(phrase).collect()}
    assert got and {r["doc_id"] for r in got} <= set(want)
    dfs = {r["term"]: r["df"] for r in idx.tstats.collect()}
    w_p = sum(idf(idx.n_docs, dfs[t]) for t in idx._terms(phrase)
              if t in dfs)
    for r in got:
        n = want[r["doc_id"]]
        assert r["score"] == pytest.approx(
            w_p * n * (K1 + 1.0) / (n + K1), rel=1e-12)


def test_query_phrase_filters_term_results(idx, docs):
    """'+value +"<phrase>"': the phrase bounds the candidate set AND
    adds its weighted contribution to every surviving doc (r5)."""
    import re
    from php_lucene_analyzer_spark.operators.fulltext import K1, idf
    toks = [t for t in re.split(r"[^a-zA-Z0-9]+",
                                docs.filter("doc_id = 3")
                                .collect()[0]["text"]) if t][:2]
    phrase = " ".join(toks)
    got = _rows(idx.query(f'+value +"{phrase}"', k=50))
    pm = {r["doc_id"]: r["n_matches"]
          for r in idx.phrase(phrase).collect()}
    base = _rows(idx.search_boolean(must=["value"], k=10_000))
    dfs = {r["term"]: r["df"] for r in idx.tstats.collect()}
    w_p = sum(idf(idx.n_docs, dfs[t]) for t in idx._terms(phrase)
              if t in dfs)
    want = [(d, s + w_p * pm[d] * (K1 + 1.0) / (pm[d] + K1))
            for d, s in base if d in pm][:50]
    want = sorted(want, key=lambda x: (-x[1], x[0]))
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d, s), (_, ws) in zip(got, want):
        assert s == pytest.approx(ws, rel=1e-12)
    assert all(d in pm for d, _ in got)


def test_query_should_phrase_scores_and_counts(idx, docs):
    """SHOULD phrases participate in scoring + msm (round-4: replaces
    the r3 hard error).  Contribution = Σidf(phrase terms) x BM25
    saturation of the match count (documented formula)."""
    import math
    import re
    toks = [t for t in re.split(r"[^a-zA-Z0-9]+",
                                docs.filter("doc_id = 3")
                                .collect()[0]["text"]) if t][:2]
    phrase = " ".join(toks)
    from php_lucene_analyzer_spark.operators.fulltext import K1, idf
    got = {r["doc_id"]: r["score"]
           for r in idx.query(f'"{phrase}" value', k=10_000).collect()}
    pm = {r["doc_id"]: r["n_matches"]
          for r in idx.phrase(phrase).collect()}
    base = dict(_rows(idx.search_boolean(should=["value"], k=10_000)))
    dfs = {r["term"]: r["df"] for r in idx.tstats.collect()}
    w_p = sum(idf(idx.n_docs, dfs[t]) for t in idx._terms(phrase)
              if t in dfs)
    want = {}
    for d in set(base) | set(pm):
        s = base.get(d, 0.0)
        if d in pm:
            n = pm[d]
            s = s + w_p * n * (K1 + 1.0) / (n + K1)
        want[d] = s
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    # msm=2 requires BOTH the phrase and the term
    strict = {r["doc_id"] for r in
              idx.query(f'"{phrase}" value', k=10_000, msm=2).collect()}
    assert strict == {d for d in pm if d in base}


def test_query_unknown_must_expansion_is_empty(idx):
    assert idx.query("+zzzqqq* fast", k=5).count() == 0
    assert idx.query("+zzzqqqnotaterm", k=5).count() == 0


def test_query_empty_or_stopwords_is_empty(idx):
    assert idx.query("", k=5).count() == 0
    assert idx.query("the and of", k=5).count() == 0


def test_query_unknown_field_raises(idx):
    with pytest.raises(ValueError):
        idx.query("title:fast", k=5)


def test_query_one_expansion_job(idx, monkeypatch):
    """EVERY dictionary expansion of a query runs in ONE Spark job
    (r3 VERDICT item 2: round trips dominate serving latency)."""
    import php_lucene_analyzer_spark.operators.fulltext as ftmod
    calls = []
    real = ftmod.expand_specs

    def counting(*a, **kw):
        calls.append(len(a[1]))
        return real(*a, **kw)

    monkeypatch.setattr(ftmod, "expand_specs", counting)
    idx.query("stram~ mer* /st.*m/ [m TO n] -zz* +value", k=5).collect()
    assert len(calls) == 1          # one job for all five expansions
    assert calls[0] == 5


def test_phrase_slop_parses_and_filters(idx, docs):
    """"a b"~n no longer raises: it parses with the slop in `edits` and
    executes as a sloppy-phrase filter via phrase(slop=...) — both
    paths share the default slop_mode (lucene, r5)."""
    from php_lucene_analyzer_spark.queryparser import parse_query
    from php_lucene_analyzer_spark.operators.fulltext import K1, idf
    t = parse_query('+"fast join"~4 value')
    ph = next(c for _, c in t.clauses if c.kind == "phrase")
    assert ph.edits == 4
    got = _rows(idx.query('+"fast join"~4 +value', k=10_000))
    pm = {r["doc_id"]: r["n_matches"]
          for r in idx.phrase("fast join", slop=4).collect()}
    base = _rows(idx.search_boolean(must=["value"], k=10_000))
    dfs = {r["term"]: r["df"] for r in idx.tstats.collect()}
    w_p = sum(idf(idx.n_docs, dfs[t_]) for t_ in idx._terms("fast join")
              if t_ in dfs)
    want = sorted([(d, s + w_p * pm[d] * (K1 + 1.0) / (pm[d] + K1))
                   for d, s in base if d in pm],
                  key=lambda x: (-x[1], x[0]))
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d, s), (_, ws) in zip(got, want):
        assert s == pytest.approx(ws, rel=1e-12)
    assert got  # non-vacuous


def test_must_phrase_with_should_phrase_not_empty(idx, docs):
    """Review fix: '+\"p1\" \"p2\"' (required phrase + optional phrase,
    no term clauses) must return the p1 docs scored by p2 — the r4.0
    left-join against the empty term-kernel base made it always
    empty."""
    import re
    toks = [t for t in re.split(r"[^a-zA-Z0-9]+",
                                docs.filter("doc_id = 3")
                                .collect()[0]["text"]) if t][:4]
    from php_lucene_analyzer_spark.operators.fulltext import K1, idf
    p1, p2 = " ".join(toks[:2]), " ".join(toks[2:4])
    got = {r["doc_id"]: r["score"]
           for r in idx.query(f'+"{p1}" "{p2}"', k=10_000).collect()}
    p1m = {r["doc_id"]: r["n_matches"] for r in idx.phrase(p1).collect()}
    assert set(got) == set(p1m) and got
    # r5: both phrases score — p1-only docs carry exactly the required
    # phrase's contribution, p2-matchers add the optional phrase's
    p2m = {r["doc_id"]: r["n_matches"] for r in idx.phrase(p2).collect()}
    dfs = {r["term"]: r["df"] for r in idx.tstats.collect()}

    def w(ph):
        return sum(idf(idx.n_docs, dfs[t]) for t in idx._terms(ph)
                   if t in dfs)

    def sat(w_p, n):
        return w_p * n * (K1 + 1.0) / (n + K1)

    w1, w2 = w(p1), w(p2)
    for d, s in got.items():
        want = sat(w1, p1m[d]) + (sat(w2, p2m[d]) if d in p2m else 0.0)
        assert s == pytest.approx(want, rel=1e-12), d
        assert s > 0


def test_multitoken_fuzzy_stays_one_group(idx):
    """Review fix: a fuzzy atom whose analysis emits several tokens
    (WDGF camelCase) compiles to ONE any-of group — '+fastMerge~1' must
    not require an expansion of EVERY subword fragment."""
    import pyspark.sql.functions as F

    from php_lucene_analyzer_spark.operators.fulltext import expand_specs
    from php_lucene_analyzer_spark.operators.wand import wand_topk_terms

    got = _rows(idx.query("+fastMerge~1", k=10))
    base = idx._terms("fastMerge")
    assert len(base) > 1     # the atom really is multi-token
    specs = [{"kind": "fuzzy", "value": t, "edits": 1, "field": None,
              "cap": 64} for t in base]
    exp = expand_specs(idx.tstats, specs)
    union = sorted({t for lst in exp for t, _, _ in lst})
    want = _rows(wand_topk_terms(idx.postings, idx.tstats, idx.n_docs,
                                 idx.avgdl, union, 10))
    assert got == want and got
