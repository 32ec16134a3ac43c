r"""Lucene classic QueryParser — grammar-complete subset, AST output.

The reference ships Lucene's ANALYSIS side only (grep-verified: no query
code anywhere under /root/reference/src); the query-string contract this
module honors is Lucene's classic QueryParser syntax, which every user
of the reference's ecosystem types on day one:

    +term  -term  term          required / prohibited / optional
    a AND b   a OR b   NOT a    conjunction operators (also && || !)
    (a OR b) AND c              parenthesized sub-queries
    field:term  field:(a b)     field-scoped atoms (multi-field index)
    "exact phrase"              phrase (positional index)
    term~  term~1               fuzzy (Levenshtein, default 2 edits)
    prefi*  te?t  t*st          wildcard (trailing-* fast path; ?/* map
                                to a whole-term regex over the dict)
    /rege.x/                    whole-term regex
    [a TO b]  {a TO b}          term range (inclusive / exclusive; * =
                                open end)
    term^2  "a b"^0.5  (...)^3  boosts

AND/OR/NOT binding follows Lucene's QueryParserBase.addClause exactly
(public Lucene source): with the default OR operator, ``a AND b OR c``
yields ``+a +b c`` — AND promotes its left neighbor to MUST; OR leaves
occurs unchanged.  With default_operator="AND" a bare clause is MUST and
OR demotes its left neighbor to SHOULD.  Keywords are CASE-SENSITIVE
(``and`` is a term, ``AND`` an operator) — Lucene semantics.

Documented divergences (execution, see FulltextIndex.query):
* phrase slop (``"a b"~2``) executes with Lucene's SloppyPhraseScorer
  accounting (r5): order-sensitive adjusted-position spread <= slop,
  distinct occurrences per repeated term
  (operators/positional.py::phrase_match, slop_mode="lucene"); the
  remaining divergence is COUNTING only — n_matches counts minimal
  qualifying windows where Lucene's phraseFreq sums 1/(1+matchLength)
  over its greedy match enumeration (scoring weight, not matching);
  SpanNearQuery(inOrder=false) window semantics stay available via
  slop_mode="span";
* fuzzy/prefix/regex/range clauses expand against the term dictionary
  (positive clauses bounded df-descending — Lucene's top-terms rewrite;
  NEGATIVE clauses expand unbounded, since exclusion needs the full
  match set — Lucene's constant-score rewrite role).

Backslash escaping (r5): ``\`` escapes the next character anywhere in a
term-ish token — Lucene's escape set (``\+ \- \! \( \) \: \^ \[ \] \"
\{ \} \~ \* \? \\ \/`` and any other char) — so ``path\:to/file`` is
one term, ``foo\-bar`` survives a leading minus, ``te\*t`` matches a
literal ``*``.  Escaped chars never classify (an escaped ``*``/``?``
is not a wildcard, an escaped trailing ``~`` is not fuzzy) and the
stored Atom value is unescaped (wildcard atoms keep their escapes so
the regex rewrite can distinguish literal from wildcard chars).  A
detached boost (``a ^2``) or a trailing lone backslash is a parse
error, as in Lucene.  Escapes inside field NAMES are not supported
(field charset is identifier-only; documented).

The parser produces a tree of ``Bool`` / ``Atom`` nodes; compilation
onto the engine kernels lives in engine.FulltextIndex.query.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield

MUST = "MUST"
SHOULD = "SHOULD"
MUST_NOT = "MUST_NOT"


@dataclass(frozen=True)
class Atom:
    """A leaf query: one term-ish unit.

    kind: 'term' | 'phrase' | 'fuzzy' | 'prefix' | 'wildcard' | 'regex'
          | 'range'
    value: the text (term / phrase / regex source / prefix); for
           'range', ``lo``/``hi`` hold the bounds (None = open end).
    """
    kind: str
    value: str = ""
    field: str | None = None
    edits: int = 0
    lo: str | None = None
    hi: str | None = None
    incl_lo: bool = True
    incl_hi: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class Bool:
    """A boolean node: (occur, child) clauses, Lucene BooleanQuery."""
    clauses: tuple = ()          # tuple[(occur, Atom|Bool), ...]
    boost: float = 1.0


_TOKEN = re.compile(r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-(?=\S))
  | (?P<field>[A-Za-z_][A-Za-z0-9_.]*:(?!\s))
  | (?P<phrase>"(?:\\.|[^"\\])*"(?:~(?P<slop>\d+))?)
  | (?P<regex>/(?:[^/\\]|\\.)+/)
  | (?P<range>[\[{][^\[\]{}]*?\s+TO\s+[^\[\]{}]*?[\]}])
  | (?P<boost>\^(?P<bval>\d+(?:\.\d+)?))
  | (?P<word>(?:\\.|[^\s()"^\\])+)
""", re.X)

_RANGE_INNER = re.compile(
    r"^(?P<open>[\[{])\s*(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\s*(?P<close>[\]}])$")


def _lex(q: str) -> list[tuple[str, str, bool]]:
    """-> [(kind, text, ws_before)] — ``ws_before`` marks tokens
    preceded by whitespace (or start of input), so a detached boost
    ``a ^2`` can be rejected (Lucene parse error) while ``a^2``
    binds."""
    out, i = [], 0
    ws = True
    while i < len(q):
        m = _TOKEN.match(q, i)
        if m is None:
            raise ValueError(f"cannot tokenize query at {q[i:]!r}"
                             + (' (unbalanced quote?)' if q[i] == '"'
                                else ""))
        i = m.end()
        kind = None
        for k in ("ws", "lparen", "rparen", "and", "or", "not", "plus",
                  "minus", "field", "phrase", "regex", "range", "boost",
                  "word"):
            if m.group(k) is not None:
                kind = k
                break
        if kind == "ws":
            ws = True
            continue
        out.append((kind, m.group(0), ws))
        ws = False
    return out


def _split_escapes(v: str) -> list[tuple[str, bool]]:
    """Token text -> [(char, was_escaped)], resolving ``\\x`` pairs."""
    out, i = [], 0
    while i < len(v):
        if v[i] == "\\" and i + 1 < len(v):
            out.append((v[i + 1], True))
            i += 2
        else:
            out.append((v[i], False))
            i += 1
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, str, bool]],
                 default_operator: str):
        self.toks = toks
        self.i = 0
        self.op_and = default_operator.upper() == "AND"

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t[0], t[1]

    # ---- Lucene QueryParserBase.addClause occur algebra ----
    def add_clause(self, clauses: list, conj: str | None,
                   mods: str | None, node) -> None:
        if clauses and conj == "AND":
            occ, prev = clauses[-1]
            if occ != MUST_NOT:
                clauses[-1] = (MUST, prev)
        if clauses and self.op_and and conj == "OR":
            occ, prev = clauses[-1]
            if occ != MUST_NOT:
                clauses[-1] = (SHOULD, prev)
        if node is None:
            return
        if not self.op_and:
            prohibited = mods == "NOT"
            required = mods == "REQ" or (conj == "AND" and not prohibited)
        else:
            prohibited = mods == "NOT"
            required = not prohibited and conj != "OR"
        occ = MUST_NOT if prohibited else (MUST if required else SHOULD)
        clauses.append((occ, node))

    def parse_bool(self, depth: int = 0) -> Bool:
        clauses: list = []
        while True:
            k = self.peek()
            if k is None:
                break
            if k == "rparen":
                if depth == 0:
                    raise ValueError("unbalanced ')' in query")
                break
            conj = None
            if k in ("and", "or"):
                conj = "AND" if k == "and" else "OR"
                self.take()
                k = self.peek()
            mods = None
            while k in ("not", "plus", "minus"):
                mods = "NOT" if k in ("not", "minus") else "REQ"
                self.take()
                k = self.peek()
            if k is None or k == "rparen":
                # dangling modifier / trailing conjunction: ignored
                if k == "rparen":
                    break
                break
            node = self.parse_atom(depth)
            self.add_clause(clauses, conj, mods, node)
        return Bool(tuple(clauses))

    def parse_atom(self, depth: int):
        fld = None
        k, v = self.take()
        if k == "field":
            fld = v[:-1]
            if self.peek() is None:
                return None
            k, v = self.take()
        if k == "lparen":
            sub = self.parse_bool(depth + 1)
            if self.peek() != "rparen":
                raise ValueError("unbalanced '(' in query")
            self.take()
            sub = self._with_boost(sub)
            if fld is not None:
                sub = _scope_field(sub, fld)
            return sub if sub.clauses else None
        if k == "phrase":
            m = re.match(
                r'^"(?P<p>(?:\\.|[^"\\])*)"(?:~(?P<slop>\d+))?$', v)
            p = "".join(ch for ch, _e in
                        _split_escapes(m.group("p"))).strip()
            if not p:
                return None
            slop = int(m.group("slop") or 0)
            # slop rides in `edits` (one int slot per leaf); execution
            # maps "..."~n to SloppyPhraseScorer accounting — see
            # operators/positional.py::phrase_match(slop_mode="lucene")
            return self._with_boost(Atom("phrase", p, field=fld,
                                         edits=slop))
        if k == "regex":
            return self._with_boost(Atom("regex", v[1:-1], field=fld))
        if k == "range":
            m = _RANGE_INNER.match(v)
            if not m:
                raise ValueError(f"cannot parse range {v!r}")
            lo = None if m.group("lo") == "*" else m.group("lo").lower()
            hi = None if m.group("hi") == "*" else m.group("hi").lower()
            return self._with_boost(Atom(
                "range", field=fld, lo=lo, hi=hi,
                incl_lo=m.group("open") == "[",
                incl_hi=m.group("close") == "]"))
        if k == "word":
            if v in ("-", "+"):
                return None         # dangling modifier: ignored
            # escape-aware classification: only UNESCAPED specials
            # classify (``te\*t`` is a literal term, ``te*t`` a
            # wildcard); stored values are unescaped except wildcard
            # atoms, which keep escapes for the regex rewrite
            pairs = _split_escapes(v)
            raw = "".join(ch for ch, _ in pairs)
            stars = any(ch == "*" and not esc for ch, esc in pairs)
            quests = any(ch == "?" and not esc for ch, esc in pairs)
            body, fz_edits = None, None
            if len(pairs) >= 2 and pairs[-1] == ("~", False):
                body, fz_edits = pairs[:-1], 2
            elif (len(pairs) >= 3 and pairs[-1][0] in "012"
                  and not pairs[-1][1] and pairs[-2] == ("~", False)):
                body, fz_edits = pairs[:-2], int(pairs[-1][0])
            if fz_edits is not None and not stars and not quests:
                return self._with_boost(Atom(
                    "fuzzy", "".join(ch for ch, _ in body), field=fld,
                    edits=fz_edits))
            if (pairs[-1] == ("*", False) and len(pairs) > 1
                    and not any(ch == "*" and not esc
                                for ch, esc in pairs[:-1])
                    and not quests):
                return self._with_boost(Atom(
                    "prefix", "".join(ch for ch, _ in pairs[:-1]),
                    field=fld))
            if (stars or quests) and raw not in ("*", "?"):
                return self._with_boost(Atom("wildcard", v, field=fld))
            return self._with_boost(Atom("term", raw, field=fld))
        raise ValueError(f"unexpected {v!r} in query")

    def _with_boost(self, node):
        # a boost binds only when it IMMEDIATELY follows its atom —
        # ``a ^2`` is a Lucene parse error, not a boost on ``a``
        # (the unconsumed boost token raises in parse_atom)
        if self.peek() == "boost" and not self.toks[self.i][2]:
            _, v = self.take()
            b = float(v[1:])
            if isinstance(node, Atom):
                return Atom(node.kind, node.value, node.field, node.edits,
                            node.lo, node.hi, node.incl_lo, node.incl_hi,
                            node.boost * b)
            return Bool(node.clauses, node.boost * b)
        return node


def _scope_field(node, fld: str):
    """Apply ``field:(...)`` scoping: every default-field leaf inside the
    group gets the field (explicit inner fields win — Lucene)."""
    if isinstance(node, Atom):
        if node.field is None:
            return Atom(node.kind, node.value, fld, node.edits, node.lo,
                        node.hi, node.incl_lo, node.incl_hi, node.boost)
        return node
    return Bool(tuple((occ, _scope_field(c, fld)) for occ, c in
                      node.clauses), node.boost)


def parse_query(q: str, default_operator: str = "OR") -> Bool:
    """Query string -> ``Bool`` AST.  Raises ValueError on unbalanced
    quotes/parens, a detached boost, or untokenizable input.  Escaped
    quotes (``\\"``) don't count toward balance."""
    if re.sub(r"\\.", "", q).count('"') % 2:
        raise ValueError(f"unbalanced quotes in query: {q!r}")
    p = _Parser(_lex(q), default_operator)
    tree = p.parse_bool(0)
    if p.peek() is not None:
        raise ValueError("unbalanced ')' in query")
    return tree


def wildcard_to_regex(pattern: str) -> str:
    """Lucene WildcardQuery -> whole-term regex source: ``*`` -> ``.*``,
    ``?`` -> ``.``, everything else literal.  Backslash-escaped chars
    (``\\*`` etc.) are always literal — wildcard atoms keep their
    escapes exactly so this rewrite can tell them apart."""
    out = []
    for ch, esc in _split_escapes(pattern):
        if ch == "*" and not esc:
            out.append(".*")
        elif ch == "?" and not esc:
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def tree_stats(node) -> dict:
    """Structural facts the compiler fast-path needs: depth, boosts,
    fields, phrase placement."""
    stats = {"max_depth": 0, "has_boost": False, "fields": set(),
             "nested_phrase": False}

    def walk(n, depth):
        stats["max_depth"] = max(stats["max_depth"], depth)
        if isinstance(n, Atom):
            if n.boost != 1.0:
                stats["has_boost"] = True
            if n.field is not None:
                stats["fields"].add(n.field)
            if n.kind == "phrase" and depth > 1:
                stats["nested_phrase"] = True
            return
        if n.boost != 1.0 and depth > 0:
            stats["has_boost"] = True
        for _, c in n.clauses:
            walk(c, depth + 1)

    walk(node, 0)
    return stats
