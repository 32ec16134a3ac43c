#!/usr/bin/env python
"""Kernel-stage microbench: r5 vectorized phrase kernels vs the r4
per-candidate-doc Python loops, on a production-size bucket (the r4
VERDICT item-1 scenario: a phrase of two COMMON terms over a 10^5-doc
bucket — at sf0.1 end-to-end the Spark job overhead hides the kernel,
so this measures the kernel alone on synthetic in-memory buckets).

The r4 loops are reproduced inline from this repo's own git history
(operators/positional.py @ a0228ff: exact = per-doc np.isin chain,
slop = per-doc pure-Python two-pointer sweep).  Both implementations
run on identical inputs; results are asserted equal before timing.

Usage: python BENCH/phrase_kernel_bench.py [n_docs=100000]
Writes BENCH/phrase_kernel_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from php_lucene_analyzer_spark.operators.positional import (  # noqa: E402
    _exact_phrase_bucket, _lucene_sloppy_bucket, _sloppy_phrase_bucket)


# ---- r4 kernels (git history a0228ff), per-candidate-doc loops ------
def r4_exact(per_term: dict, gaps):
    first = per_term.get(gaps[0][0], {})
    out = []
    for doc, starts in first.items():
        cand = starts
        ok = True
        for term, gap in gaps[1:]:
            plist = per_term.get(term, {}).get(doc)
            if plist is None:
                ok = False
                break
            cand = cand[np.isin(cand + gap, plist)]
            if cand.size == 0:
                ok = False
                break
        if ok and cand.size:
            out.append((doc, int(cand.size)))
    return out


def r4_sloppy_windows(plists, slop):
    k = len(plists)
    pos = np.concatenate(plists)
    tid = np.concatenate([np.full(p.size, i, dtype=np.int64)
                          for i, p in enumerate(plists)])
    order = np.argsort(pos, kind="stable")
    pos, tid = pos[order], tid[order]
    counts = np.zeros(k, dtype=np.int64)
    covered = 0
    left = 0
    n = 0
    for right in range(pos.size):
        t = tid[right]
        counts[t] += 1
        if counts[t] == 1:
            covered += 1
        if covered < k:
            continue
        while counts[tid[left]] > 1:
            counts[tid[left]] -= 1
            left += 1
        if (pos[right] - pos[left]) - (k - 1) <= slop:
            n += 1
        counts[tid[left]] -= 1
        covered -= 1
        left += 1
    return n


def r4_sloppy(per_term: dict, uterms, slop):
    first = min(per_term.values(), key=len)
    out = []
    for doc in first:
        pls = []
        ok = True
        for t in uterms:
            pl = per_term[t].get(doc)
            if pl is None:
                ok = False
                break
            pls.append(pl)
        if not ok:
            continue
        nm = r4_sloppy_windows(pls, slop)
        if nm:
            out.append((doc, nm))
    return out


def make_bucket(n_docs: int, seed: int = 7):
    """Two common terms, ~8 occurrences each per doc, doc length ~400.
    Positions are DISTINCT across terms within a doc (two tokens can't
    share a position — the late-r5 generator fix; the earlier
    independent sampling produced impossible ties where the r4 loop
    and the globally-minimal window count legitimately differ).
    Returns both layouts: r4's {term: {doc: positions}} and r5's
    {term: (docs, freqs, flat_pos)}."""
    rng = np.random.default_rng(seed)
    per_term4 = {"a": {}, "b": {}}
    acc = {"a": ([], [], []), "b": ([], [], [])}
    for d in range(n_docs):
        fa = int(rng.integers(4, 12))
        fb = int(rng.integers(4, 12))
        both = rng.choice(400, size=fa + fb, replace=False).astype(
            np.int64)
        for term, p in (("a", np.sort(both[:fa])),
                        ("b", np.sort(both[fa:]))):
            per_term4[term][d] = p
            docs_l, freqs_l, pos_l = acc[term]
            docs_l.append(d)
            freqs_l.append(p.size)
            pos_l.append(p)
    flat = {term: (np.asarray(docs_l, dtype=np.int64),
                   np.asarray(freqs_l, dtype=np.int64),
                   np.concatenate(pos_l))
            for term, (docs_l, freqs_l, pos_l) in acc.items()}
    return per_term4, flat


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    per_term4, flat = make_bucket(n_docs)
    gaps = [("a", 0), ("b", 1)]
    req = {"a": 1, "b": 1}
    slop = 8
    out = {"n_docs": n_docs}

    # correctness cross-check before timing
    d5, c5 = _exact_phrase_bucket(flat, gaps)
    r4e = dict(r4_exact(per_term4, gaps))
    assert dict(zip(d5.tolist(), c5.tolist())) == r4e
    d5s, c5s = _sloppy_phrase_bucket(flat, req, slop)
    r4s = dict(r4_sloppy(per_term4, ["a", "b"], slop))
    assert dict(zip(d5s.tolist(), c5s.tolist())) == r4s

    for name, fn in (
            ("exact_r5", lambda: _exact_phrase_bucket(flat, gaps)),
            ("exact_r4", lambda: r4_exact(per_term4, gaps)),
            ("slop_r5", lambda: _sloppy_phrase_bucket(flat, req, slop)),
            ("slop_r4", lambda: r4_sloppy(per_term4, ["a", "b"], slop)),
            # late-r5 Lucene accounting: one adjusted stream per phrase
            # position (same sweep; dedup pass extra)
            ("slop_lucene", lambda: _lucene_sloppy_bucket(
                flat, gaps, slop))):
        fn()
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        out[name] = round(sorted(ts)[1], 4)
    out["exact_speedup"] = round(out["exact_r4"] / out["exact_r5"], 1)
    out["slop_speedup"] = round(out["slop_r4"] / out["slop_r5"], 1)
    with open(os.path.join(REPO, "BENCH", "phrase_kernel_r5.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
