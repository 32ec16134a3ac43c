"""Codepoint classification for the UAX#29 tokenizer.

Replaces the reference's packed JFlex character-map tables
(/root/reference/src/analyses/StandardTokenizer.php:134-312, unpacked
lazily at :604-608) with a NumPy lookup table over the BMP built once per
process from ``unicodedata`` categories, plus range checks for the
supplementary planes.  The table is module-level so every Arrow batch in a
pandas UDF reuses it (same idea as the reference's lazy static unpack).
"""

from __future__ import annotations

import sys
import unicodedata

import numpy as np

# class codes (token-relevant word-break properties)
OTHER = 0       # break / discard
ALPHA = 1       # ALetter-ish: letters, marks, connector-joined word chars
DIGIT = 2       # Numeric
MIDLETTER = 3   # ' ’ : — joins ALPHA . ALPHA  (UAX#29 MidLetter)
MIDNUM = 4      # , ; — joins DIGIT . DIGIT          (UAX#29 MidNum)
MIDNUMLET = 5   # . ․ — joins like-sided pairs  (UAX#29 MidNumLet)
EXTENDNUMLET = 6  # _ and other Pc — joins everything (UAX#29 ExtendNumLet)
HIRAGANA = 7
KATAKANA = 8
HAN = 9
HANGUL = 10
SEA = 11        # Thai/Lao/Myanmar/Khmer — SOUTHEAST_ASIAN runs
EXTEND = 12     # combining marks / format chars: transparent (attach to run)

_MIDLETTER_CPS = (0x27, 0x2019, 0x3A)          # ' ’ :
_MIDNUM_CPS = (0x2C, 0x3B)                     # , ;
_MIDNUMLET_CPS = (0x2E, 0x2024)                # . ․

_BMP = 0x10000


def _classify_cp(cp: int) -> int:
    """Slow-path single-codepoint classification (used to build the BMP
    table and for supplementary codepoints)."""
    if cp in _MIDLETTER_CPS:
        return MIDLETTER
    if cp in _MIDNUM_CPS:
        return MIDNUM
    if cp in _MIDNUMLET_CPS:
        return MIDNUMLET
    # script blocks first (they override the letter category)
    if 0x3041 <= cp <= 0x309F or 0x1B001 == cp:
        return HIRAGANA
    if 0x30A0 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF or 0xFF66 <= cp <= 0xFF9D:
        return KATAKANA
    if (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
            or 0xF900 <= cp <= 0xFAFF or 0x20000 <= cp <= 0x2FA1F
            or cp == 0x3005 or cp == 0x3007):
        return HAN
    if 0xAC00 <= cp <= 0xD7A3 or 0x1100 <= cp <= 0x11FF or 0x3130 <= cp <= 0x318F:
        return HANGUL
    if (0x0E00 <= cp <= 0x0E7F or 0x0E80 <= cp <= 0x0EFF      # Thai, Lao
            or 0x1000 <= cp <= 0x109F or 0x1780 <= cp <= 0x17FF):  # Myanmar, Khmer
        return SEA
    cat = unicodedata.category(chr(cp))
    if cat == "Pc":                      # connector punctuation: _ etc.
        return EXTENDNUMLET
    if cat in ("Mn", "Mc", "Me", "Cf"):  # combining marks / format: transparent
        return EXTEND
    if cat == "Nd":
        return DIGIT
    if cat.startswith("L") or cat in ("Nl",):
        return ALPHA
    return OTHER


_TABLE: np.ndarray | None = None


def bmp_table() -> np.ndarray:
    global _TABLE
    if _TABLE is None:
        t = np.empty(_BMP, dtype=np.uint8)
        for cp in range(_BMP):
            t[cp] = _classify_cp(cp)
        _TABLE = t
    return _TABLE


def classify(cps: np.ndarray) -> np.ndarray:
    """Vectorized class lookup for an array of codepoints (any plane)."""
    table = bmp_table()
    out = np.zeros(cps.shape, dtype=np.uint8)
    bmp = cps < _BMP
    out[bmp] = table[cps[bmp]]
    if not bmp.all():
        # supplementary plane: rare; classify the few unique cps
        supp = cps[~bmp]
        uniq = np.unique(supp)
        mapping = {int(cp): _classify_cp(int(cp)) for cp in uniq}
        out[~bmp] = np.array([mapping[int(cp)] for cp in supp], dtype=np.uint8)
    return out


def to_codepoints(text: str) -> np.ndarray:
    """UTF-32 view of a Python str as an int64 codepoint array."""
    if not text:
        return np.empty(0, dtype=np.int64)
    # dtype must be LE unconditionally — the encoding above is explicit LE
    # (keying on sys.byteorder would byte-swap every codepoint on BE hosts)
    return np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.int64)
