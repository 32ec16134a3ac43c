"""UAX#29 word-break tokenizer (Lucene StandardTokenizer semantics).

Reimplements the *behavior* of the reference's JFlex-generated DFA
(/root/reference/src/analyses/StandardTokenizer.php:15-1069) as a
vectorized NumPy pass over codepoint class arrays — not a table port.

Semantics reproduced:

* token types ALPHANUM / NUM / SOUTHEAST_ASIAN / IDEOGRAPHIC / HIRAGANA /
  KATAKANA / HANGUL (StandardTokenizer.php:60-89);
* Han + Hiragana emit one token per character, Katakana / Hangul /
  Southeast-Asian emit runs (Lucene's UAX29 grammar);
* MidLetter (' ’ :) joins letter.letter, MidNum (, ;) joins digit.digit,
  MidNumLet (.) joins like-sided pairs, ExtendNumLet (_) joins everything
  — so ``O'Neil's``, ``snake_case``, ``3.1415`` are single tokens;
* tokens longer than 255 chars are dropped but the skipped position is
  counted into the next token's pos_inc (StandardTokenizer.php:916-927);
* combining marks / format chars are transparent (attach to the run).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import chars as C

MAX_TOKEN_LEN = 255  # StandardTokenizer.php:97 (StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH)

TYPE_ALPHANUM = "<ALPHANUM>"
TYPE_NUM = "<NUM>"
TYPE_SEA = "<SOUTHEAST_ASIAN>"
TYPE_IDEOGRAPHIC = "<IDEOGRAPHIC>"
TYPE_HIRAGANA = "<HIRAGANA>"
TYPE_KATAKANA = "<KATAKANA>"
TYPE_HANGUL = "<HANGUL>"


class Token(NamedTuple):
    term: str
    start: int
    end: int
    pos_inc: int
    pos_len: int
    type: str


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """[(start, end)) spans of consecutive True in a bool array."""
    if mask.size == 0:
        return []
    padded = np.concatenate(([False], mask, [False]))
    edges = np.flatnonzero(np.diff(padded.astype(np.int8)))
    return list(zip(edges[0::2].tolist(), edges[1::2].tolist()))


import re as _re

# ASCII fast path: one compiled regex reproducing the word-break rules for
# pure-ASCII text (the overwhelmingly common case for source code):
# [A-Za-z0-9_] word chars; ' : . join letter-letter; . , ; join
# digit-digit — single mid chars only, enforced by the lookarounds.
# Equivalence with the codepoint-class path is property-tested
# (tests/test_analysis.py::test_ascii_fast_path_equivalence).
_ASCII_TOKEN = _re.compile(
    r"[A-Za-z0-9_]+"
    r"(?:(?:(?<=[A-Za-z])[':.](?=[A-Za-z])"
    r"|(?<=[0-9])[.,;](?=[0-9]))[A-Za-z0-9_]+)*")
_HAS_ALPHA = _re.compile(r"[A-Za-z]")
_HAS_ALNUM = _re.compile(r"[A-Za-z0-9]")


def _ascii_spans(text: str) -> list[tuple[int, int, str]]:
    out = []
    for m in _ASCII_TOKEN.finditer(text):
        s = m.group()
        if _HAS_ALPHA.search(s):
            out.append((m.start(), m.end(), TYPE_ALPHANUM))
        elif _HAS_ALNUM.search(s):
            out.append((m.start(), m.end(), TYPE_NUM))
        # else: bare connector run ("___") emits nothing
    return out


def token_spans(text: str) -> list[tuple[int, int, str]]:
    """(start, end, type) spans — the vectorized core shared by the full
    token-graph path and the fast term-vector path."""
    if text.isascii():
        return _ascii_spans(text)
    cps = C.to_codepoints(text)
    n = cps.size
    if n == 0:
        return []
    cls = C.classify(cps)

    # format/combining chars are transparent: inherit previous char's class
    ext = cls == C.EXTEND  # original EXTEND positions (kept for CJK below)
    if ext.any():
        idx = np.arange(n)
        src = np.where(ext, 0, idx)
        np.maximum.accumulate(src, out=src)
        cls = cls[src]
        cls[ext & (np.arange(n) == src)] = C.OTHER  # leading extends

    wordish = (cls == C.ALPHA) | (cls == C.DIGIT) | (cls == C.EXTENDNUMLET)

    # absorb single mid chars with eligible neighbors (UAX#29 WB6/7/11/12)
    prev = np.concatenate(([C.OTHER], cls[:-1]))
    nxt = np.concatenate((cls[1:], [C.OTHER]))
    both_alpha = (prev == C.ALPHA) & (nxt == C.ALPHA)
    both_digit = (prev == C.DIGIT) & (nxt == C.DIGIT)
    mid = ((cls == C.MIDLETTER) & both_alpha) \
        | ((cls == C.MIDNUM) & both_digit) \
        | ((cls == C.MIDNUMLET) & (both_alpha | both_digit))
    word_mask = wordish | mid

    spans: list[tuple[int, int, str]] = []
    runs = _runs(word_mask)
    if runs:
        # vectorized per-span ALPHA/DIGIT presence via prefix sums
        ps_alpha = np.concatenate(([0], np.cumsum(cls == C.ALPHA)))
        ps_digit = np.concatenate(([0], np.cumsum(cls == C.DIGIT)))
        for s, e in runs:
            if ps_alpha[e] - ps_alpha[s] > 0:
                spans.append((s, e, TYPE_ALPHANUM))
            elif ps_digit[e] - ps_digit[s] > 0:
                spans.append((s, e, TYPE_NUM))
            # else: bare connector run ("___") emits nothing

    if cls.max() >= C.HIRAGANA:  # CJK/SEA classes are all >= HIRAGANA
        for klass, ttype in ((C.KATAKANA, TYPE_KATAKANA),
                             (C.HANGUL, TYPE_HANGUL), (C.SEA, TYPE_SEA)):
            for s, e in _runs(cls == klass):
                spans.append((s, e, ttype))
        for klass, ttype in ((C.HAN, TYPE_IDEOGRAPHIC),
                             (C.HIRAGANA, TYPE_HIRAGANA)):
            # one token per character, but trailing combining/format
            # chars ATTACH to the preceding ideograph (a bare mark must
            # not become its own token with its own position) — base
            # chars are the non-inherited positions
            for i in np.flatnonzero((cls == klass) & ~ext).tolist():
                j = i + 1
                while j < n and ext[j]:
                    j += 1
                spans.append((i, j, ttype))
        spans.sort()
    return spans


def standard_tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    skipped = 0
    for s, e, ttype in token_spans(text):
        if e - s > MAX_TOKEN_LEN:  # drop overlong, count the hole
            skipped += 1
            continue
        out.append(Token(text[s:e], s, e, 1 + skipped, 1, ttype))
        skipped = 0
    return out
