"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, rolling-hash fingerprinting.

The oracle-matched SQL forms live in queries.py (text_quality,
fingerprint); these are the richer engine-side variants (full analyzer
chain, n-gram language model, Rabin-Karp shingles) — Arrow-batched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..analysis.filters import ENGLISH_STOP_WORDS

# tiny trigram profiles (hand-picked high-frequency trigrams; public
# linguistic knowledge) — heuristic language ID without external models
_PROFILES = {
    "en": ("the", "and", "ing", "ion", "ent", "for", "tio", "ate"),
    "es": ("que", "ión", "los", "ent", "ado", "con", "par", "cia"),
    "fr": ("les", "ion", "ent", "que", "des", "eur", "ait", "our"),
    "de": ("der", "ein", "ich", "sch", "und", "die", "che", "gen"),
}


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, lang_guess, lang_score) — trigram-profile heuristic with a
    CJK/Cyrillic script fast path.

    Vectorized: one ``Series.str.count`` pass per language (a lookahead
    alternation ``(?=(?:the|and|...))`` counts trigram START positions, so
    it equals the sum of overlapping per-trigram counts — at most one
    profile trigram starts at any position) instead of O(len·profiles)
    interpreted Python per doc."""
    import re

    lang_names = list(_PROFILES)
    pats = {lang: "(?=(?:" + "|".join(re.escape(p) for p in prof) + "))"
            for lang, prof in _PROFILES.items()}

    def gen(batches):
        for pdf in batches:
            t = pdf[text_col].fillna("").astype(str).str.lower()
            ln = t.str.len().to_numpy(dtype=np.int64)
            cjk = t.str.count("[\u4e00-\u9fff]").to_numpy(dtype=np.int64)
            cyr = t.str.count("[\u0400-\u04ff]").to_numpy(dtype=np.int64)
            n = np.maximum(ln - 2, 1).astype(np.float64)
            # (langs, docs) score matrix; argmax's first-wins tie-break
            # matches the scalar loop's strict-greater update in
            # _PROFILES order
            scores = np.stack([
                t.str.count(pats[lang]).to_numpy(dtype=np.float64) / n
                for lang in lang_names])
            best_i = np.argmax(scores, axis=0)
            cols = np.arange(len(t))
            bs = scores[best_i, cols]
            langs = np.where(bs > 0, np.array(lang_names,
                                              dtype=object)[best_i], "und")
            out_score = np.round(bs, 4)
            # script fast paths (evaluated before trigrams in the scalar
            # form) and the empty-doc sentinel override
            zh = cjk > ln * 0.2
            ru = ~zh & (cyr > ln * 0.2)
            with np.errstate(divide="ignore", invalid="ignore"):
                zh_score = np.round(cjk / np.maximum(ln, 1), 4)
                ru_score = np.round(cyr / np.maximum(ln, 1), 4)
            langs = np.where(zh, "zh", np.where(ru, "ru", langs))
            out_score = np.where(zh, zh_score,
                                 np.where(ru, ru_score, out_score))
            empty = ln == 0
            langs = np.where(empty, "und", langs)
            out_score = np.where(empty, 0.0, out_score)
            yield pd.DataFrame({"doc_id": pdf[id_col].to_numpy(),
                                "lang_guess": langs.astype(object),
                                "lang_score": out_score})

    from ..plans.parallel import spread_input
    return spread_input(docs.select(id_col, text_col)).mapInPandas(
        gen, schema="doc_id long, lang_guess string, lang_score double")


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  ascii_only: bool = True) -> DataFrame:
    """Length / punctuation / stopword / repetition heuristics -> one
    quality double in [0,1] plus its components.  Pure JVM expressions.

    ``ascii_only=True`` (default) matches the DuckDB oracle exactly
    (q_quality_score); pass False for Unicode letter/digit classes — a
    clean Russian or CJK document otherwise tokenizes to nothing and
    scores as punctuation spam (~0), silently discarding every non-Latin
    corpus from a quality-filtered pipeline."""
    tok_split = r"[^a-z0-9]+" if ascii_only else r"[^\p{L}\p{N}]+"
    punct_cls = r"[\w\s]" if ascii_only else r"[\p{L}\p{N}\s_]"
    from ..plans.parallel import spread_input
    docs = spread_input(docs)
    toks = F.split(F.lower(F.col(text_col)), tok_split)
    toks = F.array_remove(toks, "")
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    uniq_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    punct_ratio = (F.length(F.regexp_replace(F.col(text_col),
                                             punct_cls, ""))
                   / F.greatest(F.length(text_col), F.lit(1)))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.3)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(uniq_ratio, 4).alias("uniq_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round((n_stop / F.greatest(n_tok, F.lit(1))), 4).alias("stop_hint"),
        F.round(len_ok * (0.5 * uniq_ratio + 0.5 * (1.0 - punct_ratio)), 4)
         .alias("quality"))


def rolling_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", window: int = 32,
                         keep_mod: int = 16) -> DataFrame:
    """Rabin-Karp rolling-hash document fingerprints (winnowing-style
    0-mod-p selection): (doc_id, fp) rows — the containment/plagiarism
    primitive; two docs sharing many fps share long char runs."""
    base = 1000003
    # base is odd -> invertible mod 2^64: the whole rolling-hash sequence
    # vectorizes as a weighted prefix sum (the per-byte Python loop this
    # replaces cost ~1M numpy-scalar iterations per MB of text):
    #   h_i = Σ_j b[i+j]·base^(w-1-j)
    #       = base^(w-1) · base^i · Σ_m∈[i,i+w) b[m]·inv^m   (mod 2^64)
    inv = pow(base, -1, 1 << 64)

    def _window_hashes(arr: np.ndarray, w: int) -> np.ndarray:
        n = arr.size
        powb = np.ones(n, dtype=np.uint64)
        powb[1:] = np.uint64(base)
        np.cumprod(powb, out=powb)                   # base^i (wraps mod 2^64)
        powi = np.ones(n, dtype=np.uint64)
        powi[1:] = np.uint64(inv)
        np.cumprod(powi, out=powi)                   # inv^i
        pq = np.cumsum(arr * powi, dtype=np.uint64)  # Σ b[m]·inv^m
        s = pq[w - 1:].copy()
        s[1:] -= pq[:n - w]
        return np.uint64(base) ** np.uint64(w - 1) * powb[:n - w + 1] * s

    def gen(batches):
        old = np.seterr(over="ignore")  # mod-2^64 wraparound is the point
        try:
            for pdf in batches:
                ids_out, fps_out = [], []
                for did, text in zip(pdf[id_col], pdf[text_col]):
                    b = (text or "").encode("utf-8", "ignore")
                    if len(b) < window:
                        continue
                    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                    hs = _window_hashes(arr, window)
                    sel = np.unique(hs[hs % np.uint64(keep_mod) == 0])
                    ids_out.extend([int(did)] * sel.size)
                    fps_out.extend(sel.astype(np.int64).tolist())
                yield pd.DataFrame({"doc_id": ids_out, "fp": fps_out})
        finally:
            np.seterr(**old)

    from ..plans.parallel import spread_input
    return spread_input(docs.select(id_col, text_col)).mapInPandas(
        gen, schema="doc_id long, fp long")


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish subword count estimate, JVM-side: tokens plus
    an extra count per 4 chars of long tokens (the BPE length heuristic)."""
    from ..plans.parallel import spread_input
    docs = spread_input(docs)
    toks = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    ws = F.size(toks)
    chars = F.length(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        F.ceil(chars / 4.0).cast("long").alias("bpe_est"),
        F.greatest(ws, F.ceil(chars / 4.0)).cast("long").alias("token_budget"))
