"""Deterministic synthetic source-code corpus (BASELINE.json ``input_hint``).

Schema: (repo string, path string, commit string, lang string,
content string) — the Iceberg source table shape the north rule names.
Generated DISTRIBUTED (spark.range -> mapInPandas), never on the driver:
each row's content is a pure function of its index, so the corpus is
identical at any parallelism / partitioning — a precondition for the
rank-identity-across-cluster-sizes contract.

Content is synthetic source code engineered to exercise every analyzer
branch (camelCase, snake_case, SCREAMING_CASE, digit-mixed ids, possessives,
stopword-rich comments) with Zipf-distributed identifier frequencies so the
salted-merge skew path is actually exercised.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_LANGS = ["java", "py", "php", "go", "js"]
_EXT = {"java": "java", "py": "py", "php": "php", "go": "go", "js": "js"}

_IDENT_STEMS = [
    "parse", "build", "run", "merge", "split", "index", "token", "stream",
    "filter", "query", "score", "rank", "count", "batch", "shard", "block",
    "codec", "hash", "node", "arc", "term", "doc", "post", "list", "cache",
    "read", "write", "flush", "open", "close", "init", "load", "store",
    "util", "helper", "manager", "handler", "factory", "builder", "visitor",
    "buffer", "cursor", "offset", "length", "state", "config", "option",
]
_SUFFIXES = ["", "Impl", "Base", "Util", "2", "64", "V2", "Buf"]
_KEYWORDS = ["if", "else", "for", "while", "return", "function", "class",
             "def", "var", "let", "const", "public", "static", "void",
             "import", "package", "new", "try", "catch", "throw"]
_COMMENT_WORDS = [
    "the", "a", "an", "of", "to", "and", "is", "this", "that", "with",
    "for", "on", "in", "returns", "value", "given", "input", "output",
    "running", "parsing", "merged", "indexed", "quickly", "slowly",
    "caches", "buffers", "tokens", "documents", "queries", "scores",
]


def _make_vocab() -> list[str]:
    vocab = []
    for i, s in enumerate(_IDENT_STEMS):
        for j, t in enumerate(_IDENT_STEMS):
            if len(vocab) >= 1500:
                break
            suf = _SUFFIXES[(i + j) % len(_SUFFIXES)]
            style = (i * 7 + j) % 4
            if style == 0:
                vocab.append(s + t.capitalize() + suf)          # camelCase
            elif style == 1:
                vocab.append(f"{s}_{t}{suf.lower()}")           # snake_case
            elif style == 2:
                vocab.append((s + "_" + t).upper())             # SCREAMING
            else:
                vocab.append(s.capitalize() + t.capitalize() + suf)  # Pascal
    return vocab


_VOCAB = _make_vocab()


def _make_big_vocab(size: int) -> list[str]:
    """Extended vocabulary for realistic-skew experiments: lowercase
    stem-triples ("parsemergetoken") — single tokens that WDGF does NOT
    split, so the post-analysis term vocabulary really is ``size``-large
    (the default corpus's camel/snake identifiers all collapse to ~50
    subword stems, which makes every term ubiquitous at 50k+ docs)."""
    out = list(_VOCAB)
    n = len(_IDENT_STEMS)
    i = 0
    while len(out) < size and i < n ** 3:
        a, b, c = i % n, (i // n) % n, (i // (n * n)) % n
        out.append(_IDENT_STEMS[a] + _IDENT_STEMS[b] + _IDENT_STEMS[c])
        i += 1
    i = 0
    while len(out) < size:  # 4-stem tuples past n^3 (no duplicate terms)
        if i >= n ** 4:
            raise ValueError(f"vocab_size {size} exceeds generatable terms")
        a, b, c, e = (i % n, (i // n) % n,
                      (i // (n * n)) % n, (i // (n ** 3)) % n)
        out.append(_IDENT_STEMS[a] + _IDENT_STEMS[b]
                   + _IDENT_STEMS[c] + _IDENT_STEMS[e])
        i += 1
    return out[:size]


# Zipf-distributed identifier choice: heavy head terms appear everywhere
def _zipf_cdf(n_vocab: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n_vocab + 1) ** s
    return np.cumsum(w / w.sum())


_ZIPF_CDF = _zipf_cdf(len(_VOCAB))


def _gen_content(idx: int, vocab: list[str] | None = None,
                 cdf: np.ndarray | None = None) -> str:
    _VOCAB = vocab if vocab is not None else globals()["_VOCAB"]
    _ZIPF_CDF = cdf if cdf is not None else globals()["_ZIPF_CDF"]
    rng = np.random.default_rng(42 + idx)
    n_lines = int(rng.integers(5, 40))
    # one batched draw per doc instead of per line (rng calls dominate)
    kinds = rng.integers(0, 10, size=n_lines)
    kws = rng.integers(0, len(_KEYWORDS), size=n_lines)
    nids = rng.integers(2, 6, size=n_lines)
    rets = rng.integers(0, 9999, size=n_lines)
    ncw = rng.integers(4, 12, size=n_lines)
    ids_all = np.searchsorted(_ZIPF_CDF, rng.random(int(nids.sum())))
    cw_all = rng.integers(0, len(_COMMENT_WORDS), size=int(ncw.sum()))
    lines = []
    ip = cp = 0
    for li in range(n_lines):
        if kinds[li] < 2:  # comment line — stopword-rich English
            k = int(ncw[li])
            words = [_COMMENT_WORDS[j] for j in cw_all[cp:cp + k]]
            cp += k
            lines.append("// " + " ".join(words))
        else:
            k = int(nids[li])
            ids = ids_all[ip:ip + k]
            ip += k
            args = ", ".join(_VOCAB[j] for j in ids[1:])
            lines.append(f"{_KEYWORDS[kws[li]]} {_VOCAB[ids[0]]}({args})"
                         f" {{ return {rets[li]}; }}")
    return "\n".join(lines)


def synthetic_corpus(spark: SparkSession, n_docs: int,
                     partitions: int | None = None,
                     vocab_size: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` synthetic source files.

    ``vocab_size``: None (default) keeps the original 1500-identifier
    vocabulary — byte-identical corpus to round-1 baselines.  A value
    switches to the extended non-splitting vocabulary (realistic Zipf
    term skew for pruning/skew experiments)."""
    import hashlib

    def gen(batches):
        vocab = _make_big_vocab(vocab_size) if vocab_size else None
        cdf = _zipf_cdf(vocab_size) if vocab_size else None
        for pdf in batches:
            idxs = pdf["id"].to_numpy()
            repos, paths, commits, langs, contents = [], [], [], [], []
            for idx in idxs:
                idx = int(idx)
                lang = _LANGS[idx % len(_LANGS)]
                repo = f"org{idx % 97}/repo{(idx // 97) % 50}"
                path = f"src/mod{idx % 13}/file_{idx}.{_EXT[lang]}"
                commits.append(hashlib.sha1(f"{repo}/{path}:42".encode()).hexdigest())
                repos.append(repo)
                paths.append(path)
                langs.append(lang)
                contents.append(_gen_content(idx, vocab, cdf))
            yield pd.DataFrame({"repo": repos, "path": paths, "commit": commits,
                                "lang": langs, "content": contents})

    base = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return base.mapInPandas(
        gen, schema="repo string, path string, commit string, lang string, content string")
