"""Lucene-style query string parser (classic QueryParser subset).

A user of the reference's ecosystem types Lucene query syntax; this
module compiles the common subset onto this engine's verified
primitives (boolean group kernel, fuzzy/prefix/regex expansion, packed
positional phrases):

    +term           MUST        -term          MUST_NOT
    term            SHOULD      "exact phrase" phrase (positional index)
    term~  term~1   fuzzy (default 2 edits)
    prefi*          prefix      /rege.x/       whole-term regex

Whitespace separates clauses; modifiers bind to the immediately
following atom.  Execution semantics (documented divergences from
classic QueryParser in FulltextIndex.query):

* a bare term is analyzed; a MUST term whose analysis emits several
  tokens (WDGF camelCase) becomes the conjunction of all of them,
  a SHOULD term becomes ONE any-of group (so msm counts words, not
  subword fragments);
* fuzzy/prefix/regex clauses expand against the term dictionary
  (bounded, df-descending for prefix/regex — Lucene's top-terms
  rewrite) and form one any-of group;
* phrases are FILTER clauses (+"..." required, -"..." excluded);
  a SHOULD phrase raises — scoring msm over phrase sets needs doc-set
  counting the group kernel does not do (explicit beats silent);
* scoring: BM25 over every matched term clause; a pure-phrase query
  ranks by total phrase match count.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_CLAUSE = re.compile(
    r'(?P<mod>[+-]?)'
    r'(?:"(?P<phrase>[^"]*)"'
    r'|/(?P<regex>[^/]+)/'
    r'|(?P<body>\S+))')

_FUZZY = re.compile(r'^(?P<t>.+?)~(?P<d>[0-2])?$')


@dataclass(frozen=True)
class Clause:
    mod: str        # '' (SHOULD) | '+' (MUST) | '-' (MUST_NOT)
    kind: str       # 'term' | 'phrase' | 'fuzzy' | 'prefix' | 'regex'
    value: str
    edits: int = 0


def parse(query: str) -> list[Clause]:
    """Query string -> clause list.  Unterminated quotes raise."""
    if query.count('"') % 2:
        raise ValueError(f"unbalanced quotes in query: {query!r}")
    out: list[Clause] = []
    for m in _CLAUSE.finditer(query):
        mod = m.group("mod")
        if m.group("phrase") is not None:
            if m.group("phrase").strip():
                out.append(Clause(mod, "phrase", m.group("phrase").strip()))
            continue
        if m.group("regex") is not None:
            out.append(Clause(mod, "regex", m.group("regex")))
            continue
        body = m.group("body")
        if body in ("+", "-"):          # dangling modifier
            continue
        fz = _FUZZY.match(body)
        if fz:
            d = fz.group("d")
            out.append(Clause(mod, "fuzzy", fz.group("t"),
                              int(d) if d else 2))
        elif body.endswith("*") and len(body) > 1 and "*" not in body[:-1]:
            out.append(Clause(mod, "prefix", body[:-1]))
        else:
            out.append(Clause(mod, "term", body))
    return out
