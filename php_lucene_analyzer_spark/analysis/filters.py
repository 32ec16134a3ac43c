"""Lowercase + stop filters.

* lowercase — semantics of /root/reference/src/analyses/LowerCaseFilter.php:12-25
  (Unicode lowercase of the term text; offsets/positions untouched).
* stop — semantics of StopFilter.php:12-35 over FilteringTokenFilter.php:12-47:
  dropped tokens accumulate their pos_inc into the NEXT kept token
  (FilteringTokenFilter.php:33-42), leaving a position hole.

The default 33-word English stop set is the reference's
(StopFilter.php:16-22, Lucene's ENGLISH_STOP_WORDS_SET).  The reference's
``isset`` keying quirk (SURVEY.md §7.6) means callers pass word-keyed maps;
here a frozenset carries the same contract.
"""

from __future__ import annotations

from .tokenizer import Token

ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)


def lowercase(tokens: list[Token]) -> list[Token]:
    return [t._replace(term=t.term.lower()) for t in tokens]


def synonyms(tokens: list[Token],
             syn_map: dict[str, tuple[str, ...]]) -> list[Token]:
    """SynonymGraphFilter semantics for single-token rules (Lucene's
    keepOrig=true form): each synonym of a matched term is STACKED at
    the same position — pos_inc 0, original offsets/pos_len — exactly
    the mechanics MorphologyFilter uses for lemma stacks
    (/root/reference/src/analyses/morphology/analyzer/
    MorphologyFilter.php:36,59-63), so phrase queries see the synonym at
    the original's position.  Multi-token rules (graph insertion with
    pos_len > 1) are out of scope — single-token rules are the common
    production case and behave identically to Lucene's filter."""
    out: list[Token] = []
    for t in tokens:
        out.append(t)
        for s in syn_map.get(t.term, ()):
            out.append(t._replace(term=s, pos_inc=0))
    return out


def synonym_graph(tokens: list[Token],
                  rules: dict[tuple, list[tuple]]) -> list[Token]:
    """SynonymGraphFilter + index-time FlattenGraphFilter semantics for
    MULTI-TOKEN rules (keepOrig=true): ``rules`` maps an input term
    SEQUENCE to output term sequences, e.g.
    ``{("usa",): [("united", "states")],
       ("united", "states"): [("usa",)]}``.

    Matching is greedy longest-first over the stream's main path (the
    first token at each position; WDGF/lemma stacks don't participate),
    adjacency by stream order.  Lucene's graph output is flattened the
    way index-time Lucene flattens it: output token j of a match
    starting at position p lands at position p+j with pos_len 1 and the
    MATCH SPAN's char offsets — for n(out) <= m(in) this is exactly the
    flattened graph; for n > m the extra tokens overlap the following
    positions (Lucene's documented index-time "sausage", what
    FlattenGraphFilter produces).  Original tokens are never moved, so
    phrase queries keep working against the original text.  No
    re-matching inside a replaced span (Lucene).

    Single-token rules degrade to exactly ``synonyms()`` stacking."""
    if not tokens or not rules:
        return tokens
    pos_abs = []
    p = -1
    for t in tokens:
        p += t.pos_inc
        pos_abs.append(p)
    main = [i for i, t in enumerate(tokens)
            if t.pos_inc > 0 or i == 0]
    max_len = max(len(k) for k in rules)
    inserts: list[tuple[int, Token]] = []
    i = 0
    while i < len(main):
        hit = None
        for m in range(min(max_len, len(main) - i), 0, -1):
            key = tuple(tokens[main[i + j]].term for j in range(m))
            if key in rules:
                hit = (m, rules[key])
                break
        if hit is None:
            i += 1
            continue
        m, outs = hit
        p0 = pos_abs[main[i]]
        st = tokens[main[i]].start
        en = tokens[main[i + m - 1]].end
        for out_seq in outs:
            for j, s in enumerate(out_seq):
                inserts.append((p0 + j, Token(s, st, en, 0, 1,
                                              tokens[main[i]].type)))
        i += m
    if not inserts:
        return tokens
    merged = [(pos_abs[i], 0, i, t) for i, t in enumerate(tokens)]
    merged += [(p0, 1, j, t) for j, (p0, t) in enumerate(inserts)]
    merged.sort(key=lambda x: (x[0], x[1], x[2]))
    out: list[Token] = []
    prev = -1
    for p0, _k, _j, t in merged:
        out.append(t._replace(pos_inc=p0 - prev))
        prev = p0
    return out


def compile_synonym_rules(rules: dict) -> dict[tuple, list[tuple]]:
    """User-facing rule map -> synonym_graph form: keys/values are
    whitespace-split ("united states" -> ("united", "states")); values
    may be a single string or an iterable of strings.  Rule TERMS must
    already be in post-tokenize/lower/stop form (the chain applies the
    filter after stop, before stemming)."""
    out: dict[tuple, list[tuple]] = {}
    for k, v in (rules or {}).items():
        key = tuple(k.split())
        if isinstance(v, str):
            v = (v,)
        out[key] = [tuple(s.split()) for s in v]
    return out


def stop(tokens: list[Token], stop_words: frozenset[str] = ENGLISH_STOP_WORDS) -> list[Token]:
    out: list[Token] = []
    hole = 0
    for t in tokens:
        if t.term in stop_words:
            hole += t.pos_inc
            continue
        if hole:
            t = t._replace(pos_inc=t.pos_inc + hole)
            hole = 0
        out.append(t)
    return out
