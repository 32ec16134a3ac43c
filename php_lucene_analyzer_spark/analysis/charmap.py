"""NormalizeCharMap — pre-tokenization character-sequence rewriting
(SURVEY §2 A16).

Reimplements the contract of the reference's NormalizeCharMapBuilder /
NormalizeCharMap (/root/reference/src/analyses/charfilter/
NormalizeCharMapBuilder.php:15-58, NormalizeCharMap.php:14-47 — Lucene's
MappingCharFilter map): ordered (match -> replacement) pairs applied with
GREEDY LONGEST-MATCH at each position; empty matches and duplicate keys
rejected at build time (:31-40).  The reference stores the map as a
SimpleFST labeled trie; here a plain dict-of-first-char index does the
same prefix dispatch (the trie is a memory trick, not semantics).

Offset note: like the reference (whose TokenStream::correctOffset is a
stub, TokenStream.php:49-53), rewrites happen BEFORE tokenization and
offsets refer to the rewritten text.
"""

from __future__ import annotations


class NormalizeCharMapBuilder:
    def __init__(self) -> None:
        self._pairs: dict[str, str] = {}

    def add(self, match: str, replacement: str) -> "NormalizeCharMapBuilder":
        if not match:
            raise ValueError("cannot match the empty string")
        if match in self._pairs:
            raise ValueError(f"match {match!r} was already added")
        self._pairs[match] = replacement
        return self

    def build(self) -> "NormalizeCharMap":
        return NormalizeCharMap(dict(self._pairs))


class NormalizeCharMap:
    def __init__(self, pairs: dict[str, str]):
        self.pairs = pairs
        self._by_first: dict[str, list[tuple[str, str]]] = {}
        for m, r in pairs.items():
            self._by_first.setdefault(m[0], []).append((m, r))
        for lst in self._by_first.values():
            lst.sort(key=lambda p: -len(p[0]))  # longest match first

    def apply(self, text: str) -> str:
        if not self._by_first:
            return text
        out: list[str] = []
        i = 0
        n = len(text)
        while i < n:
            cands = self._by_first.get(text[i])
            if cands:
                for m, r in cands:
                    if text.startswith(m, i):
                        out.append(r)
                        i += len(m)
                        break
                else:
                    out.append(text[i])
                    i += 1
            else:
                out.append(text[i])
                i += 1
        return "".join(out)
