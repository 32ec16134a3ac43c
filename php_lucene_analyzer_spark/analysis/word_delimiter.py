"""Word-delimiter graph filter (camelCase / snake_case / product-code splitter).

Reimplements the output contract of the reference's
WordDelimiterGraphFilter + WordDelimiterIterator
(/root/reference/src/analyses/WordDelimiterGraphFilter.php:64-655,
WordDelimiterIterator.php:11-408) with the flag set the reference's
constructor FORCES regardless of the caller's argument
(WordDelimiterGraphFilter.php:182-220):

    GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE |
    SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE | PRESERVE_ORIGINAL

Break rules (WordDelimiterIterator::isBreak :214-236):
* at any non-alphanumeric delimiter char (consumed, not emitted);
* at a lower->UPPER case change;
* at a letter<->digit transition;
* inside an UPPER run followed by lower, before the last UPPER
  ("HTTPServer" -> HTTP | Server);
* a trailing ``'s`` is stripped from subwords (:278-286).

Graph semantics: when a token splits, the ORIGINAL is emitted first at the
incoming position spanning pos_len = #parts; parts follow at +0, +1, ...
increments (PositionSorter contract, WordDelimiterGraphFilter.php:615-655).
A token that yields exactly itself passes through unchanged.
"""

from __future__ import annotations

import unicodedata

from .tokenizer import TYPE_ALPHANUM, TYPE_NUM, Token

_LOWER, _UPPER, _DIGIT, _DELIM = 0, 1, 2, 3


def _char_class(ch: str) -> int:
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return _UPPER
    if cat == "Nd" or cat == "Nl":
        return _DIGIT
    if cat.startswith("L") or cat.startswith("M"):
        return _LOWER  # lower/title/modifier/other letters + marks -> ALPHA
    return _DELIM


def split_word(term: str) -> list[tuple[str, int, int]]:
    """Return subword parts as (text, rel_start, rel_end) after delimiter
    removal, case/numeric splits, and possessive stripping."""
    n = len(term)
    cls = [_char_class(c) for c in term]
    parts: list[tuple[str, int, int]] = []
    i = 0
    while i < n:
        if cls[i] == _DELIM:
            i += 1
            continue
        j = i + 1
        while j < n and cls[j] != _DELIM:
            prev_c, cur_c = cls[j - 1], cls[j]
            if (prev_c == _LOWER and cur_c == _UPPER):
                break  # case change
            if (prev_c == _DIGIT) != (cur_c == _DIGIT):
                break  # letter <-> digit
            if (prev_c == _UPPER and cur_c == _UPPER
                    and j + 1 < n and cls[j + 1] == _LOWER):
                break  # ACRONYMWord: break before final upper
            j += 1
        s, e = i, j
        if e - s > 0:
            parts.append((term[s:e], s, e))
        # possessive stripping after EVERY subword, not only the last:
        # a subword followed by 's + (end | delimiter) swallows the 's
        # (WordDelimiterIterator::next :158-160 sets skipPossessive;
        # endsWithPossessive :278-286 — ASCII apostrophe only)
        if (e + 1 < n and term[e] == "'" and term[e + 1] in ("s", "S")
                and (e + 2 == n or cls[e + 2] == _DELIM)):
            i = e + 2
        else:
            i = j
    return parts


class _SplitCache(dict):
    """Per-process memo of term -> parts (the vocabulary is tiny vs the
    token stream; mirrors the reference's char-class cache idea,
    WordDelimiterIterator.php:295-304)."""

    def __missing__(self, term: str) -> list[tuple[str, int, int]]:
        v = split_word(term)
        if len(self) < 1_000_000:
            self[term] = v
        return v


_CACHE = _SplitCache()


def word_delimiter_graph(tokens: list[Token]) -> list[Token]:
    out: list[Token] = []
    for tok in tokens:
        if tok.type not in (TYPE_ALPHANUM, TYPE_NUM):
            out.append(tok)
            continue
        parts = _CACHE[tok.term]
        if len(parts) == 1 and parts[0][0] == tok.term:
            out.append(tok)
            continue
        if not parts:
            # nothing generable (pure-delimiter term cannot reach here from
            # the tokenizer, but keep the original to be safe)
            out.append(tok)
            continue
        # PRESERVE_ORIGINAL: original first, spanning all part positions
        out.append(Token(tok.term, tok.start, tok.end, tok.pos_inc,
                         len(parts), tok.type))
        for k, (text, rs, re_) in enumerate(parts):
            out.append(Token(text, tok.start + rs, tok.start + re_,
                             0 if k == 0 else 1, 1, tok.type))
    return out
