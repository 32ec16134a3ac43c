"""User-facing façade: build once, query many.

The operators (fulltext/postings/wand/positional) are the engine; this
class is the ergonomic surface a reference user reaches for first:

    from php_lucene_analyzer_spark.engine import FulltextIndex

    idx = FulltextIndex.build(spark, docs, order_cols=["repo", "path"])
    idx.search("parse token stream", k=10)          # DataFrame(doc_id, score)
    idx.search_many({"a": "...", "b": "..."})       # one Spark job
    idx.phrase("merge join")                        # needs positional=True
    idx.save("/path/idx"); FulltextIndex.load(spark, "/path/idx")

Everything delegates to the tested operators — same semantics, same
bit-identical rank contract.  The spark-submit CLIs (scripts/) remain
the cluster entrypoints; save()/load() share their on-disk layout
concepts (sorted postings parquet + stats.json).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .analysis import analyze
from .operators import fulltext as ft
from .operators.positional import phrase_match, positional_postings
from .operators.postings import (corpus_stats_from_postings, index_corpus,
                                 term_stats_from_postings, write_postings)
from .operators.wand import (_filter_terms, prefix_topk, wand_topk_many,
                             wand_topk_terms)


class FulltextIndex:
    def __init__(self, spark: SparkSession, postings: DataFrame,
                 tstats: DataFrame, n_docs: int, avgdl: float,
                 analyzer=None, positional: DataFrame | None = None):
        self.spark = spark
        self.postings = postings
        self.tstats = tstats
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.analyzer = analyzer
        self.positional = positional

    # ------------------------------------------------------------- build
    @classmethod
    def build(cls, spark: SparkSession, docs: DataFrame,
              order_cols: list[str], text_col: str = "content",
              analyzer=None, positional: bool = False,
              partitions: int | None = None) -> "FulltextIndex":
        """Deterministic doc ids -> fused posting-block build (one
        shuffle total); optional packed positional index (uses the
        flagship chain — phrase semantics are defined by it)."""
        ids = ft.with_doc_ids(docs, order_cols, partitions).cache()
        n_docs = ids.count()
        postings = index_corpus(ids, "doc_id", text_col,
                                analyzer=analyzer).cache()
        tstats = term_stats_from_postings(postings).cache()
        avgdl = corpus_stats_from_postings(postings, n_docs)
        pos = None
        if positional:
            pos = positional_postings(ids, "doc_id", text_col).cache()
        idx = cls(spark, postings, tstats, n_docs, avgdl, analyzer, pos)
        idx._cached = [ids, postings, tstats] + ([pos] if pos is not None
                                                 else [])
        return idx

    def close(self) -> None:
        """Release every DataFrame ``build`` cached.  Idempotent; a loaded
        index (nothing cached) is a no-op.  Without this, repeated
        build/drop cycles accumulate persisted RDDs until eviction
        thrash — the same leak class fixed in the dedup operators."""
        for df in getattr(self, "_cached", []):
            df.unpersist()
        self._cached = []

    def __enter__(self) -> "FulltextIndex":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------- query
    def _terms(self, query: str) -> list[str]:
        if self.analyzer is not None:
            return sorted(set(self.analyzer.terms(query)))
        return sorted({t.term for t in analyze(query)})

    def search(self, query: str, k: int = 10) -> DataFrame:
        """Block-max WAND top-k -> DataFrame(doc_id, score), total order
        (score desc, doc_id asc) — bit-identical to the exhaustive
        scorer."""
        return wand_topk_terms(self.postings, self.tstats, self.n_docs,
                               self.avgdl, self._terms(query), k)

    def search_many(self, queries: dict[str, str], k: int = 10) -> DataFrame:
        """Whole query set in ONE Spark job -> (qid, doc_id, score)."""
        terms_fn = (self.analyzer.terms if self.analyzer is not None
                    else None)
        return wand_topk_many(self.postings, self.tstats, self.n_docs,
                              self.avgdl, queries, k, terms_fn=terms_fn)

    def search_prefix(self, prefix: str, k: int = 10,
                      max_expansions: int = 64) -> DataFrame:
        """Wildcard `p*` query (the automaton package's PrefixQuery role):
        range scan on the sorted term dictionary, bounded df-descending
        expansion (Lucene's top-terms rewrite), WAND over the union."""
        return prefix_topk(self.postings, self.tstats, self.n_docs,
                           self.avgdl, prefix, k, max_expansions)

    def search_fuzzy(self, query: str, k: int = 10, max_edits: int = 2,
                     prefix_len: int = 0) -> DataFrame:
        """Lucene FuzzyQuery's role: expand each analyzed query term to
        its Levenshtein neighborhood over the term dictionary
        (operators/fulltext.py::fuzzy_expand — length-band prune + JVM
        levenshtein, no DFA), then block-max WAND over the expanded
        OR-set.  Scoring note: Lucene downweights fuzzy matches by
        (1 - dist/len); this engine scores plain BM25 over the expanded
        set — documented divergence, same candidate semantics.  The
        collect is bounded: an edit-distance neighborhood is tiny."""
        from .operators.fulltext import fuzzy_expand
        expanded: set[str] = set()
        for t in self._terms(query):
            expanded.update(
                r["term"] for r in
                fuzzy_expand(self.tstats, t, max_edits,
                             prefix_len).collect())
        if not expanded:
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        return wand_topk_terms(self.postings, self.tstats, self.n_docs,
                               self.avgdl, sorted(expanded), k)

    def search_boolean(self, must: list[str] | None = None,
                       should: list[str] | None = None,
                       must_not: list[str] | None = None, msm: int = 0,
                       k: int = 10) -> DataFrame:
        """Lucene BooleanQuery semantics over the index
        (operators/boolean.py::boolean_topk): every ``must`` string's
        analyzed terms all match, at least ``msm`` of the ``should``
        terms match (pure-SHOULD queries require one), no ``must_not``
        term matches; BM25-scored over the matched must+should set.

        Divergence note: a must string whose analysis produces a token
        GRAPH (e.g. WDGF camelCase expansion ``parseSplit`` ->
        [parsesplit, pars, split]) collapses to the conjunction of ALL
        emitted terms — Lucene would build a synonym/graph query
        (original OR adjacent-parts).  Indexed docs containing the
        literal word carry every expansion term, so results agree
        whenever the word occurs as written."""
        from .operators.boolean import boolean_topk
        expand = lambda qs: [t for q in (qs or []) for t in self._terms(q)]
        return boolean_topk(self.postings, self.tstats, self.n_docs,
                            self.avgdl, expand(must), expand(should),
                            expand(must_not), msm, k)

    def more_like_this(self, text: str, k: int = 10, max_terms: int = 25,
                       exclude_doc: int | None = None) -> DataFrame:
        """Lucene MoreLikeThis role: analyze ``text`` driver-side, rank
        its terms by tf·idf against the index's df table, seed a
        disjunctive WAND query with the top ``max_terms``, optionally
        excluding a source doc id.

        Scale note: term selection happens on the driver from the query
        TEXT (tf counted in Python over one document's tokens, df fetched
        for just those terms) — the postings are never scanned to
        reconstruct a document, which a term-major index cannot do
        cheaply."""
        from collections import Counter
        # raw token stream, NOT _terms (which dedupes for query-term
        # sets) — MLT ranks by tf·idf, so duplicates carry signal
        if self.analyzer is not None:
            cnt = Counter(self.analyzer.terms(text))
        else:
            cnt = Counter(t.term for t in analyze(text))
        if not cnt:
            return self.spark.createDataFrame([], "doc_id long, score double")
        rows = (_filter_terms(self.tstats, sorted(cnt))
                .select("term", "df").collect())
        dfs = {r["term"]: int(r["df"]) for r in rows}
        ranked = sorted(
            ((t, cnt[t] * ft.idf(self.n_docs, dfs[t])) for t in dfs),
            key=lambda x: (-x[1], x[0]))
        seed = sorted(t for t, _ in ranked[:max_terms])
        out = wand_topk_terms(
            self.postings, self.tstats, self.n_docs, self.avgdl, seed,
            k + (1 if exclude_doc is not None else 0))
        if exclude_doc is not None:
            out = (out.filter(F.col("doc_id") != exclude_doc)
                   .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
        return out

    def query(self, q: str, k: int = 10, msm: int = 0,
              max_expansions: int = 64) -> DataFrame:
        """Execute a Lucene-style query STRING (queryparser.py — classic
        QueryParser subset: ``+must -not "phrase" fuzzy~2 prefi* /re.x/``)
        -> (doc_id, score).

        Compilation: term/fuzzy/prefix/regex clauses become clause
        GROUPS for the boolean kernel (operators/boolean.py::
        boolean_groups_topk — a group matches when any of its expansion
        terms does); phrases are filter clauses evaluated on the packed
        positional index and joined in (semi for ``+"..."``, anti for
        ``-"..."``) BEFORE the global top-k, with the kernel's
        per-bucket cut disabled so the filter cannot drop survivors.
        See queryparser.py's module docstring for the documented
        divergences from classic QueryParser."""
        from .operators.boolean import boolean_groups_topk
        from .operators.fulltext import fuzzy_expand
        from .queryparser import parse

        must_g, should_g, not_terms = [], [], []
        phr_must, phr_not = [], []
        for c in parse(q):
            if c.kind == "phrase":
                if c.mod == "+":
                    phr_must.append(c.value)
                elif c.mod == "-":
                    phr_not.append(c.value)
                else:
                    raise ValueError(
                        f'SHOULD phrase "{c.value}" unsupported — phrases '
                        f'are filter clauses, write +"{c.value}" or '
                        f'-"{c.value}"')
                continue
            if c.kind == "term":
                terms = self._terms(c.value)
                if not terms:
                    continue
                if c.mod == "+":
                    must_g.extend([t] for t in terms)  # conjunction
                elif c.mod == "-":
                    not_terms.extend(terms)
                else:
                    should_g.append(terms)  # one any-of group per word
                continue
            # dictionary-expanded clauses -> one any-of group
            if c.kind == "fuzzy":
                base = self._terms(c.value)
                terms = sorted({
                    r["term"] for t in base for r in
                    fuzzy_expand(self.tstats, t, c.edits).collect()})
            elif c.kind == "prefix":
                terms = [r["term"] for r in
                         (self.tstats.filter(
                             F.col("term").startswith(c.value.lower()))
                          .orderBy(F.desc("df"), F.asc("term"))
                          .limit(max_expansions).collect())]
            else:  # regex, whole-term anchored
                terms = [r["term"] for r in
                         (self.tstats.filter(
                             F.col("term").rlike(f"^(?:{c.value})$"))
                          .orderBy(F.desc("df"), F.asc("term"))
                          .limit(max_expansions).collect())]
            if not terms:
                terms = ["\x00-unmatchable"]  # unmatchable: a MUST
                # clause with an empty expansion must empty the result,
                # not silently vanish
            if c.mod == "+":
                must_g.append(terms)
            elif c.mod == "-":
                not_terms.extend(terms)
            else:
                should_g.append(terms)

        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not (must_g or should_g):
            if not phr_must:
                return empty
            # pure-phrase query: rank by total match count
            out = None
            for p in phr_must:
                m = self.phrase(p).select(
                    "doc_id", F.col("n_matches").cast("double").alias("s"))
                out = m if out is None else \
                    out.join(m.select("doc_id",
                                      F.col("s").alias("s2")), "doc_id") \
                       .select("doc_id", (F.col("s") + F.col("s2"))
                               .alias("s"))
            for p in phr_not:
                out = out.join(self.phrase(p).select("doc_id"), "doc_id",
                               "left_anti")
            return (out.select("doc_id", F.col("s").alias("score"))
                    .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))

        filtered = bool(phr_must or phr_not)
        res = boolean_groups_topk(
            self.postings, self.tstats, self.n_docs, self.avgdl,
            must_g, should_g, not_terms, msm,
            None if filtered else k)
        if filtered:
            for p in phr_must:
                res = res.join(self.phrase(p).select("doc_id"), "doc_id",
                               "left_semi")
            for p in phr_not:
                res = res.join(self.phrase(p).select("doc_id"), "doc_id",
                               "left_anti")
            res = res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return res

    def suggest(self, word: str, max_edits: int = 2, k: int = 5,
                prefix_len: int = 1) -> DataFrame:
        """Did-you-mean candidates for a (possibly misspelled) word ->
        (term, df, dist), DirectSpellChecker ranking (dist asc, df desc,
        term asc) over the term dictionary
        (operators/fulltext.py::suggest_terms).  The word is analyzed
        first so suggestions live in the index's stemmed vocabulary; the
        FIRST token of the analyzed stream is the suggestion target
        (DirectSpellChecker is per-term — callers suggest per word); an
        all-stopword/empty word returns no rows."""
        from .operators.fulltext import suggest_terms
        if self.analyzer is not None:
            stream = self.analyzer.terms(word)
        else:
            stream = [t.term for t in analyze(word)]
        if not stream:
            return self.spark.createDataFrame(
                [], "term string, df long, dist long")
        return suggest_terms(self.tstats, stream[0], max_edits, k,
                             prefix_len)

    def search_regex(self, pattern: str, k: int = 10,
                     max_expansions: int = 64) -> DataFrame:
        """RegexpQuery role: match the term dictionary with Spark's
        native ``rlike`` (the automaton package's regex runner maps to
        the JVM regex engine — SURVEY A19), expand df-descending like
        Lucene's top-terms rewrite (bounded), WAND the union.

        The pattern is anchored to the WHOLE term (``^(?:...)$``) —
        Lucene RegexpQuery semantics; a bare ``rlike`` would match
        substrings ('cat' hitting 'concatenate')."""
        terms = [r["term"] for r in
                 (self.tstats.filter(
                     F.col("term").rlike(f"^(?:{pattern})$"))
                  .orderBy(F.desc("df"), F.asc("term"))
                  .limit(max_expansions).collect())]
        return wand_topk_terms(self.postings, self.tstats, self.n_docs,
                               self.avgdl, sorted(terms), k)

    def compact(self) -> "FulltextIndex":
        """Rewrite fragmented posting blocks — and the positional index,
        when present — into full-size ones (operators/postings.py::
        compact_postings + operators/positional.py::compact_positional,
        Lucene's TieredMergePolicy role; bit-identical query results).
        Returns a NEW index over the compacted, eagerly-materialized
        layout with its derived term stats cached (queries must not
        re-aggregate the postings per call); the original index is
        untouched (close() it to release its caches)."""
        from .operators.positional import compact_positional
        from .operators.postings import compact_postings
        cp = compact_postings(self.postings).localCheckpoint(eager=True)
        ts = term_stats_from_postings(cp).cache()
        pos = None
        if self.positional is not None:
            pos = compact_positional(self.positional) \
                .localCheckpoint(eager=True)
        idx = FulltextIndex(self.spark, cp, ts, self.n_docs, self.avgdl,
                            self.analyzer, pos)
        idx._cached = [ts]
        return idx

    def stats(self) -> dict:
        """Index statistics (Lucene IndexReader counters): n_docs,
        avgdl, n_terms, n_blocks, has_positional."""
        return {
            "n_docs": self.n_docs,
            "avgdl": self.avgdl,
            "n_terms": self.tstats.count(),
            "n_blocks": self.postings.count(),
            "has_positional": self.positional is not None,
        }

    def highlight_anchors(self, query: str) -> DataFrame:
        """(doc_id, first_pos): earliest position of any analyzed query
        term per matching doc (operators/positional.py::first_match) —
        the highlighter anchor.  Requires ``build(..., positional=True)``
        or a loaded positional dir.  Positions are the chain's GRAPH
        positions; snippet text needs char offsets, which the positional
        codec doesn't store — the contract query `highlight` slices
        token arrays under the simplified tokenization instead."""
        from .operators.positional import first_match
        if self.positional is None:
            raise ValueError("highlight_anchors needs a positional index "
                             "(build(..., positional=True))")
        return first_match(self.positional, self._terms(query))

    def phrase(self, phrase: str) -> DataFrame:
        """Exact-phrase docs -> (doc_id, n_matches); needs
        ``build(..., positional=True)`` or a loaded positional dir."""
        if self.positional is None:
            raise ValueError("index built without positional=True")
        return phrase_match(self.positional, phrase)

    # --------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        """Sorted-by-term postings parquet (row-group min/max prune term
        lookups) + optional positional blocks + stats.json — all stamped
        with format headers (functions/header.py, the CodecUtil role) so
        a stale-layout load fails with a versioned error."""
        from .functions.header import (INDEX_WORKDIR_CODEC,
                                       INDEX_WORKDIR_VERSION,
                                       POSITIONAL_CODEC, POSITIONAL_VERSION,
                                       header_fields, write_dir_header)
        write_postings(self.postings, os.path.join(path, "postings"))
        if self.positional is not None:
            pdir = os.path.join(path, "positional")
            (self.positional.repartitionByRange("term")
             .sortWithinPartitions("term", "rbucket", "block_no")
             .write.mode("overwrite").parquet(pdir))
            write_dir_header(pdir, POSITIONAL_CODEC, POSITIONAL_VERSION)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "stats.json"), "w") as f:
            json.dump({**header_fields(INDEX_WORKDIR_CODEC,
                                       INDEX_WORKDIR_VERSION),
                       "n_docs": self.n_docs, "avgdl": self.avgdl,
                       "has_positional": self.positional is not None}, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             analyzer=None) -> "FulltextIndex":
        """Reopen a saved index; the caller must supply the SAME analyzer
        the index was built with (chains are code, not data).  Format
        headers are checked before any decode."""
        from .functions.header import (INDEX_WORKDIR_CODEC,
                                       INDEX_WORKDIR_VERSION,
                                       POSITIONAL_CODEC, POSITIONAL_VERSION,
                                       check_dir_header, check_fields)
        from .operators.postings import read_postings
        with open(os.path.join(path, "stats.json")) as f:
            stats = json.load(f)
        check_fields(stats, INDEX_WORKDIR_CODEC, INDEX_WORKDIR_VERSION,
                     INDEX_WORKDIR_VERSION, f"{path}/stats.json")
        postings = read_postings(spark, os.path.join(path, "postings"))
        tstats = term_stats_from_postings(postings)
        pos = None
        if stats.get("has_positional"):
            pdir = os.path.join(path, "positional")
            # verify the format header BEFORE any decode (a stale/foreign
            # positional layout must fail at open, not mid-query) —
            # mirrors read_postings
            check_dir_header(pdir, POSITIONAL_CODEC, POSITIONAL_VERSION,
                             POSITIONAL_VERSION)
            pos = spark.read.parquet(pdir)
        return cls(spark, postings, tstats, int(stats["n_docs"]),
                   float(stats["avgdl"]), analyzer, pos)
