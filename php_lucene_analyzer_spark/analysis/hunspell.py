"""Hunspell dictionary loader + affix-stripping stemmer (SURVEY §2 A12-A14).

From-scratch reimplementation of the BEHAVIOR of the reference's
Hunspell stack (/root/reference/src/analyses/hunspell/Dictionary.php:12-1371,
Stemmer.php:9-699, HunspellStemFilter.php:14-90) in plain Python data
structures — not a port of its byte-packed affix records / FST machinery
(those exist to save memory in PHP; here dicts + broadcast do the job,
and the stemmer runs per UNIQUE vocabulary term inside pandas UDFs, never
per token).

Supported .aff features (the set the reference parses): SET encoding,
FLAG long|num|UTF-8 strategies (Dictionary.php:903-921), PFX/SFX with
cross-product, strip, append, condition patterns, continuation classes on
the append (`ive/XY`), AF flag aliases (:1204-1225), ICONV/OCONV greedy
longest-match rewrites (:760-826, 1332-1370), IGNORE chars (:482-489),
KEEPCASE / NEEDAFFIX / ONLYINCOMPOUND / FORBIDDENWORD gates
(Stemmer.php:173-207).

Stemming semantics (Stemmer.php): case-variant union (exact / title /
lower, :89-151); dictionary hits filtered by gate flags; one prefix and
up to two suffixes stripped recursively with cross-product and
continuation-class checks (:296-685); conditions checked on
strip+remainder (:542-583); results deduped preserving first-seen order
(:216-232).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Affix:
    flag: str
    cross: bool
    strip: str
    append: str
    cont_flags: frozenset[str]
    cond: re.Pattern | None  # None == '.' (always true)


@dataclass
class Dictionary:
    words: dict[str, list[frozenset[str]]] = field(default_factory=dict)
    prefixes: dict[str, list[Affix]] = field(default_factory=dict)  # by append
    suffixes: dict[str, list[Affix]] = field(default_factory=dict)  # by append
    iconv: list[tuple[str, str]] = field(default_factory=list)
    oconv: list[tuple[str, str]] = field(default_factory=list)
    flag_aliases: list[frozenset[str]] = field(default_factory=list)
    # word -> st: stem exception (Stemmer::newStem returns the exception
    # instead of the matched form, Stemmer.php:234-274)
    stem_exceptions: dict[str, str] = field(default_factory=dict)
    ignore: str = ""
    keepcase: str | None = None
    needaffix: str | None = None
    onlyincompound: str | None = None
    forbidden: str | None = None
    ignore_case: bool = False

    def lookup(self, word: str) -> list[frozenset[str]] | None:
        return self.words.get(word)


class _FlagParser:
    """single-char (default) / `long` 2-char / `num` comma-int flags
    (Dictionary.php:1377-1479)."""

    def __init__(self, mode: str = "char"):
        self.mode = mode

    def parse(self, s: str) -> frozenset[str]:
        s = s.strip()
        if not s:
            return frozenset()
        if self.mode == "num":
            return frozenset(x.strip() for x in s.split(",") if x.strip())
        if self.mode == "long":
            return frozenset(s[i:i + 2] for i in range(0, len(s) - 1, 2))
        return frozenset(s)


class _ConvTable:
    """Greedy longest-match character conversion (applyMappings
    Dictionary.php:1332-1370) with a first-char index — built once per
    table instead of scanning all pairs at every character (uk_UA: 64
    ICONV pairs x 126k dictionary words)."""

    def __init__(self, pairs: list[tuple[str, str]]):
        self.by_first: dict[str, list[tuple[str, str]]] = {}
        for src, dst in pairs:
            self.by_first.setdefault(src[0], []).append((src, dst))
        for lst in self.by_first.values():
            lst.sort(key=lambda p: -len(p[0]))  # longest match first

    def apply(self, word: str) -> str:
        if not self.by_first:
            return word
        out = []
        i = 0
        while i < len(word):
            for src, dst in self.by_first.get(word[i], ()):
                if word.startswith(src, i):
                    out.append(dst)
                    i += len(src)
                    break
            else:
                out.append(word[i])
                i += 1
        return "".join(out)


def _apply_conv(word: str, table: list[tuple[str, str]]) -> str:
    """Compat wrapper over _ConvTable (hot paths build the table once)."""
    return _ConvTable(table).apply(word) if table else word


def parse_affix_file(text: str) -> tuple[Dictionary, _FlagParser]:
    d = Dictionary()
    flags = _FlagParser()
    aliases: list[frozenset[str]] = []
    af_seen_count = False
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        parts = lines[i].split("#")[0].split()
        i += 1
        if not parts:
            continue
        key = parts[0]
        if key == "FLAG" and len(parts) > 1:
            flags = _FlagParser({"long": "long", "num": "num"}.get(
                parts[1], "char"))
        elif key == "AF":
            # POSITIONAL, like parseAlias (Dictionary.php:1204-1225): the
            # FIRST AF line is the count, every later one is alias data —
            # a numeric alias under FLAG num must not reset the table,
            # and an AF line with no flags maps to the empty set
            if not af_seen_count:
                af_seen_count = True
                aliases = []
            else:
                aliases.append(flags.parse(parts[1])
                               if len(parts) > 1 else frozenset())
        elif key == "IGNORE" and len(parts) > 1:
            d.ignore = parts[1]
        elif key in ("ICONV", "OCONV") and len(parts) == 2 and parts[1].isdigit():
            pass  # count line
        elif key in ("ICONV", "OCONV") and len(parts) >= 3:
            (d.iconv if key == "ICONV" else d.oconv).append(
                (parts[1], parts[2]))
        elif key == "KEEPCASE" and len(parts) > 1:
            d.keepcase = parts[1]
        elif key == "NEEDAFFIX" and len(parts) > 1:
            d.needaffix = parts[1]
        elif key == "ONLYINCOMPOUND" and len(parts) > 1:
            d.onlyincompound = parts[1]
        elif key == "FORBIDDENWORD" and len(parts) > 1:
            d.forbidden = parts[1]
        elif key in ("PFX", "SFX") and len(parts) >= 4 and parts[3].isdigit() \
                and len(parts) == 4:
            # header: PFX flag cross_product count
            flag, cross, count = parts[1], parts[2] == "Y", int(parts[3])
            for _ in range(count):
                while i < len(lines):
                    sub = lines[i].split("#")[0].split()
                    i += 1
                    if sub:
                        break
                else:
                    break
                # rule: PFX flag strip append [condition]
                strip = "" if sub[2] == "0" else sub[2]
                append_raw = sub[3]
                if "/" in append_raw:
                    app, cont_s = append_raw.split("/", 1)
                    if cont_s.isdigit() and aliases:
                        cont = aliases[int(cont_s) - 1]
                    else:
                        cont = flags.parse(cont_s)
                else:
                    app, cont = append_raw, frozenset()
                app = "" if app == "0" else app
                cond_s = sub[4] if len(sub) > 4 else "."
                if key == "PFX":
                    cond = None if cond_s == "." else re.compile(
                        "^" + cond_s)
                    d.prefixes.setdefault(app, []).append(
                        Affix(flag, cross, strip, app, cont, cond))
                else:
                    cond = None if cond_s == "." else re.compile(
                        cond_s + "$")
                    d.suffixes.setdefault(app, []).append(
                        Affix(flag, cross, strip, app, cont, cond))
    d.flag_aliases = aliases
    return d, flags


def parse_dic_file(text: str, d: Dictionary, flags: _FlagParser) -> None:
    conv = _ConvTable(d.iconv)
    lines = text.splitlines()
    for line in lines[1:]:  # first line = word count
        raw_fields = line.strip().split()
        if not raw_fields or raw_fields[0].startswith("#"):
            continue
        line = raw_fields[0]
        # morph fields after the word: st:<stem> is the stem exception
        st_exc = next((f[3:] for f in raw_fields[1:]
                       if f.startswith("st:")), None)
        if "/" in line:
            word, fs = line.split("/", 1)
            fs = fs.split()[0] if fs.split() else ""
            # with AF aliases defined, a dic flag field is an alias
            # ORDINAL (readDictionaryFiles resolves it the same way the
            # affix continuation `/N` does)
            if d.flag_aliases and fs.isdigit():
                ordn = int(fs)
                fset = (d.flag_aliases[ordn - 1]
                        if 0 < ordn <= len(d.flag_aliases) else frozenset())
            else:
                fset = flags.parse(fs) if fs else frozenset()
        else:
            word, fset = line.split()[0] if line.split() else line, frozenset()
        word = conv.apply(word)
        if d.ignore:
            word = "".join(c for c in word if c not in d.ignore)
        if not word:
            continue
        if d.ignore_case:
            word = word.lower()
        d.words.setdefault(word, []).append(fset)
        if st_exc:
            d.stem_exceptions[word] = st_exc


def load(aff_text: str, dic_texts: list[str],
         ignore_case: bool = False) -> Dictionary:
    d, flags = parse_affix_file(aff_text)
    d.ignore_case = ignore_case
    for t in dic_texts:
        parse_dic_file(t, d, flags)
    return d


# charset aliases the reference maps (Dictionary.php:867-870)
_CHARSET_ALIASES = {"microsoft-cp1251": "windows-1251",
                    "TIS620-2533": "TIS-620"}


def detect_encoding(raw: bytes) -> str:
    """getDictionaryEncoding parity (Dictionary.php:838-879, pattern
    :827): scan for the first `(BOM?)SET <enc>` line, skipping blank and
    `#` lines.  (Divergence noted: the PHP port concatenates non-matching
    lines into one growing buffer before retrying the anchored regex — a
    port bug that only works because SET is the first line in practice;
    we scan per line.)"""
    import re as _re

    for line in raw.split(b"\n"):
        line = line.rstrip(b"\r")
        if not line.strip() or line.startswith(b"#"):
            continue
        m = _re.match(rb"^(\xef\xbb\xbf)?SET[ \t]+", line)
        if m:
            enc = line[m.end():].decode("ascii", "ignore").strip()
            return _CHARSET_ALIASES.get(enc, enc)
    raise ValueError("no SET line found in affix file")


def load_files(aff_path: str, dic_paths: list[str],
               ignore_case: bool = False) -> Dictionary:
    """Load raw .aff/.dic FILES: encoding comes from the affix SET line
    (both files decode with it, exactly like the reference ctor
    Dictionary.php:171-244)."""
    raw = open(aff_path, "rb").read()
    enc = detect_encoding(raw)
    aff = raw.decode(enc).lstrip("﻿")
    dics = [open(p, "rb").read().decode(enc).lstrip("﻿")
            for p in dic_paths]
    return load(aff, dics, ignore_case=ignore_case)


class Stemmer:
    """uniqueStems per the reference's Stemmer.php contract."""

    def __init__(self, d: Dictionary, longest_only: bool = False):
        self.d = d
        self.longest_only = longest_only
        self._iconv = _ConvTable(d.iconv)
        self._oconv = _ConvTable(d.oconv)
        self._cache: dict[str, list[str]] = {}

    # -- public ------------------------------------------------------------
    def unique_stems(self, word: str) -> list[str]:
        got = self._cache.get(word)
        if got is not None:
            return got
        # input cleaning FIRST, like the reference (Stemmer.php:91-97 ->
        # Dictionary::cleanInput :1271-1306): ICONV rewrites + IGNORE
        # removal — a Ukrainian word with a combining stress mark must
        # stem like its clean form, since the .dic side was cleaned too
        cleaned = self._iconv.apply(word)
        if self.d.ignore:
            cleaned = "".join(c for c in cleaned if c not in self.d.ignore)
        seen: list[str] = []
        exc = self.d.stem_exceptions
        if cleaned:
            for variant, forbid_keepcase in self._case_variants(cleaned):
                for s in self._stem(variant, forbid_keepcase):
                    # st: stem exception, then OCONV output cleaning —
                    # newStem order (Stemmer.php:234-274)
                    s = exc.get(s, s)
                    s = self._oconv.apply(s)
                    if s not in seen:
                        seen.append(s)
        if self.longest_only and seen:
            seen = [max(seen, key=len)]
        if len(self._cache) < 1_000_000:
            self._cache[word] = seen
        return seen

    # -- internals ----------------------------------------------------------
    def _case_variants(self, w: str):
        """Case-variant union per caseOf/stemWord2 (Stemmer.php:89-151):
        UPPER -> exact + title fold + lower fold; TITLE -> exact + lower
        fold; mixed/lower -> exact only.  Folded variants reject
        KEEPCASE-flagged entries."""
        yield w, False
        if len(w) > 1 and w.isupper():
            yield w[0] + w[1:].lower(), True
            yield w.lower(), True
        elif w[:1].isupper() and w[1:] == w[1:].lower():
            yield w.lower(), True

    def _entry_ok(self, fsets: list[frozenset[str]], affix_flag: str | None,
                  forbid_keepcase: bool) -> bool:
        d = self.d
        for fs in fsets:
            if d.forbidden and d.forbidden in fs:
                continue
            if d.onlyincompound and d.onlyincompound in fs:
                continue
            if forbid_keepcase and d.keepcase and d.keepcase in fs:
                continue
            if affix_flag is None:
                if d.needaffix and d.needaffix in fs:
                    continue  # bare form requires an affix
                return True
            if affix_flag in fs:
                return True
        return False

    def _stem(self, word: str, forbid_keepcase: bool) -> list[str]:
        out: list[str] = []
        entry = self.d.lookup(word)
        if entry and self._entry_ok(entry, None, forbid_keepcase):
            out.append(word)
        out.extend(self._strip(word, forbid_keepcase, prefix_depth=0,
                               suffix_depth=0))
        return out

    def _candidates(self, word: str, table: dict[str, list[Affix]],
                    is_prefix: bool):
        """All affix rules whose append matches word's edge — INCLUDING
        the zero-length append (strip-only rules like 'SFX V й 0 [їі]й'
        in the shipped ru_RU/uk_UA dictionaries; the reference's suffix
        loop tries the empty suffix first, Stemmer.php:412-425)."""
        for ln in range(0, len(word)):
            edge = word[:ln] if is_prefix else word[len(word) - ln:] \
                if ln else ""
            for a in table.get(edge, ()):
                yield a

    def _strip(self, word: str, forbid_keepcase: bool, prefix_depth: int,
               suffix_depth: int) -> list[str]:
        """Remove one affix and validate/recurse (Stemmer::stem/applyAffix
        :296-685, depth-limited exactly like Lucene: 1 prefix, 2 suffixes)."""
        out: list[str] = []
        d = self.d
        if prefix_depth == 0:
            for a in self._candidates(word, d.prefixes, True):
                rest = a.strip + word[len(a.append):]
                if a.cond and not a.cond.search(rest):
                    continue
                entry = d.lookup(rest)
                if entry and self._entry_ok(entry, a.flag, forbid_keepcase):
                    out.append(rest)
                # cross-product: allow suffix stripping after this prefix,
                # requiring suffix rules flagged on the same entry
                if a.cross:
                    for s in self._strip(rest, forbid_keepcase,
                                         prefix_depth=1,
                                         suffix_depth=suffix_depth):
                        # validate the prefix flag against the final entry
                        fsets = d.lookup(s)
                        if fsets and self._entry_ok(fsets, a.flag,
                                                    forbid_keepcase):
                            out.append(s)
        if suffix_depth < 2:
            for a in self._candidates(word, d.suffixes, False):
                rest = word[: len(word) - len(a.append)] + a.strip
                if a.cond and not a.cond.search(rest):
                    continue
                entry = d.lookup(rest)
                if entry and self._entry_ok(entry, a.flag, forbid_keepcase):
                    out.append(rest)
                # double suffix via continuation classes: the outer
                # suffix's flag must appear in the INNER rule's cont set
                if suffix_depth == 0:
                    for b in self._candidates(rest, d.suffixes, False):
                        if a.flag not in b.cont_flags:
                            continue
                        rest2 = rest[: len(rest) - len(b.append)] + b.strip
                        if b.cond and not b.cond.search(rest2):
                            continue
                        entry2 = d.lookup(rest2)
                        if entry2 and self._entry_ok(entry2, b.flag,
                                                     forbid_keepcase):
                            out.append(rest2)
        return out


def hunspell_stem_series(terms, stemmer: Stemmer, dedup: bool = True):
    """Vocabulary-level mapping helper for pandas UDFs: term ->
    first stem (or the term itself when the dictionary has no answer) —
    HunspellStemFilter semantics with dedup=True (:34-39)."""
    out = []
    for t in terms:
        stems = stemmer.unique_stems(t)
        out.append(stems[0] if stems else t)
    return out
