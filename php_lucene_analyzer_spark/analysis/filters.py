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
