"""Property tests for the r5 vectorized phrase kernels — pure NumPy,
no Spark: random corpora over a small alphabet, every result checked
against independent brute-force evaluators (exact: scan all start
positions; sloppy: enumerate all minimal multiset-covering windows)."""

import itertools

import numpy as np
from hypothesis import given, settings, strategies as st

from php_lucene_analyzer_spark.operators.positional import (
    _exact_phrase_bucket, _lucene_sloppy_bucket, _sloppy_phrase_bucket)

ALPHABET = ["a", "b", "c", "d"]


def _flat_from_docs(docs_tokens):
    """{term: (docs, freqs, flat_pos)} built from a list of token
    lists — the kernel's input layout (doc-ascending, per-doc
    position-ascending)."""
    flat = {}
    for t in ALPHABET:
        ds, fs, ps = [], [], []
        for d, toks in enumerate(docs_tokens):
            pos = [i for i, x in enumerate(toks) if x == t]
            if pos:
                ds.append(d)
                fs.append(len(pos))
                ps.extend(pos)
        if ds:
            flat[t] = (np.asarray(ds, dtype=np.int64),
                       np.asarray(fs, dtype=np.int64),
                       np.asarray(ps, dtype=np.int64))
    return flat


def _brute_exact(toks, gaps):
    n = 0
    for start in range(len(toks)):
        if all(0 <= start + g < len(toks) and toks[start + g] == t
               for t, g in gaps):
            n += 1
    return n


def _brute_sloppy(toks, req, slop):
    occ = [(p, t) for p, t in enumerate(toks) if t in req]
    nreq = sum(req.values())
    wins = set()
    for combo in itertools.combinations(range(len(occ)), nreq):
        cnt = {}
        for i in combo:
            cnt[occ[i][1]] = cnt.get(occ[i][1], 0) + 1
        if cnt != req:
            continue
        lo, hi = occ[combo[0]][0], occ[combo[-1]][0]
        if (hi - lo) - (nreq - 1) <= slop:
            wins.add((lo, hi))
    return len({(lo, hi) for lo, hi in wins
                if not any(l2 >= lo and h2 <= hi and (l2, h2) != (lo, hi)
                           for l2, h2 in wins)})


docs_strategy = st.lists(
    st.lists(st.sampled_from(ALPHABET), min_size=0, max_size=14),
    min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(docs=docs_strategy,
       phrase=st.lists(st.sampled_from(ALPHABET), min_size=2,
                       max_size=3))
def test_exact_kernel_matches_bruteforce(docs, phrase):
    gaps = [(t, i) for i, t in enumerate(phrase)]
    d, c = _exact_phrase_bucket(_flat_from_docs(docs), gaps)
    got = dict(zip(d.tolist(), c.tolist()))
    want = {}
    for did, toks in enumerate(docs):
        n = _brute_exact(toks, gaps)
        if n:
            want[did] = n
    assert got == want


@settings(max_examples=150, deadline=None)
@given(docs=docs_strategy,
       phrase=st.lists(st.sampled_from(ALPHABET), min_size=2,
                       max_size=4),
       slop=st.integers(min_value=0, max_value=6))
def test_sloppy_kernel_matches_bruteforce(docs, phrase, slop):
    req = {}
    for t in phrase:
        req[t] = req.get(t, 0) + 1
    d, c = _sloppy_phrase_bucket(_flat_from_docs(docs), req, slop)
    got = dict(zip(d.tolist(), c.tolist()))
    want = {}
    for did, toks in enumerate(docs):
        n = _brute_sloppy(toks, req, slop)
        if n:
            want[did] = n
    assert got == want


def _brute_lucene(toks, qpos, slop):
    """Lucene SloppyPhraseScorer accounting by exhaustive assignment:
    one occurrence per phrase position (DISTINCT raw positions per
    repeated term), adjusted spread max(p-o) - min(p-o) <= slop; count
    globally minimal (containment) windows over adjusted values."""
    occ = {}
    for i, t in enumerate(toks):
        occ.setdefault(t, []).append(i)
    if any(t not in occ for t, _ in qpos):
        return 0
    valid = set()
    for combo in itertools.product(*[occ[t] for t, _ in qpos]):
        by_term = {}
        ok = True
        for (t, _o), p in zip(qpos, combo):
            s = by_term.setdefault(t, set())
            if p in s:
                ok = False
                break
            s.add(p)
        if not ok:
            continue
        adj = [p - o for (t, o), p in zip(qpos, combo)]
        if max(adj) - min(adj) <= slop:
            valid.add((min(adj), max(adj)))
    return len({(lo, hi) for lo, hi in valid
                if not any(l2 >= lo and h2 <= hi and (l2, h2) != (lo, hi)
                           for l2, h2 in valid)})


@settings(max_examples=150, deadline=None)
@given(docs=docs_strategy,
       phrase=st.lists(st.sampled_from(ALPHABET), min_size=1,
                       max_size=4),
       gaps=st.lists(st.integers(min_value=1, max_value=2), min_size=3,
                     max_size=3),
       slop=st.integers(min_value=0, max_value=6))
def test_lucene_kernel_matches_bruteforce(docs, phrase, gaps, slop):
    """_lucene_sloppy_bucket == exhaustive distinct-assignment brute
    force — repeats exercise the per-doc exact path, gaps > 1 model
    stopword holes (enablePositionIncrements)."""
    pos = 0
    qpos = []
    for i, t in enumerate(phrase):
        qpos.append((t, pos))
        pos += gaps[i % len(gaps)]
    d, c = _lucene_sloppy_bucket(_flat_from_docs(docs), qpos, slop)
    got = dict(zip(d.tolist(), c.tolist()))
    want = {}
    for did, toks in enumerate(docs):
        n = _brute_lucene(toks, qpos, slop)
        if n:
            want[did] = n
    assert got == want
