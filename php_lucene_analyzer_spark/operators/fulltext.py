"""Fulltext index build + exhaustive BM25 — the DataFrame skeleton.

This is the declarative core: Catalyst plans every stage (scan -> project
(analyze UDF) -> explode -> partial/final hash agg -> broadcast join ->
TakeOrderedAndProject).  The blob/WAND physical layer builds on top of the
same intermediate (operators/postings.py, operators/wand.py).

Scale notes (100 TB / 10^12 docs):
* doc ids are assigned by a two-phase range-partition scheme (sort by key,
  per-partition counts -> prefix offsets), NOT a single global window —
  deterministic at any parallelism because ids = global rank of a unique
  sort key, independent of partition boundaries;
* term frequencies are pre-aggregated per document INSIDE the analyzer UDF
  (map-side combine before any shuffle — the (doc,term,tf) stream is ~100x
  smaller than the raw token stream);
* BM25 per-doc score sums run over sort_array'ed per-term contributions so
  float addition order is fixed at any cluster size (rank identity).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..analysis import analyze

K1 = 1.2
B = 0.75

# multi-field indexes store non-default-field terms as
# "<field>\x1f<term>" (unit separator — no analyzer emits it); the
# default field stays bare, so single-field indexes and every existing
# facade are layout-identical to round 3
FIELD_SEP = "\x1f"


# below this row count the single-partition windowed rank beats the
# two-phase scheme's 3 extra jobs on measured hardware (BENCH/
# vocab_bench.py: window wins at 10M terms, two-phase 2.2x at 40M);
# chosen well under the crossover so the windowed sort stays trivially
# in one task's memory
SMALL_RANK_THRESHOLD = 5_000_000


def dense_rank_ids(df: DataFrame, order_cols: list[str], id_col: str,
                   partitions: int | None = None, start: int = 0,
                   precache: bool = False,
                   small_threshold: int = 0) -> DataFrame:
    """Dense, deterministic int64 ``id_col`` = ``start`` + global rank of
    ``order_cols`` (which must be a unique key).

    Two-phase: range-partition + local sort, count per partition, prefix-sum
    offsets (driver-side over #partitions integers), then offset + local
    row_number.  Equivalent to row_number() over a global window but without
    the single-partition bottleneck — safe at any cardinality (doc ids over
    10^12 docs, term ids over 10^9-term vocabularies alike).  Deterministic
    at any parallelism because ids depend only on the key's global rank,
    never on partition boundaries.

    ``precache``: persist the INPUT for the two passes that need it (the
    range partitioner's sampling job + the checkpoint materialization) and
    unpersist before returning (the checkpoint holds the data by then).
    Use for inputs that are themselves expensive aggregations but small
    relative to the corpus (term-stats tables); leave off for raw-corpus
    doc ids, where a parquet re-scan beats materializing 100 TB.

    ``small_threshold`` (adaptive mode, 0 = off): count the input first
    and, below the threshold, assign ids with a single-partition window
    instead — IDENTICAL ids by construction (both are the global rank of
    the unique key), but one sort job instead of the two-phase scheme's
    sampling + checkpoint + counts jobs, which dominate latency on small
    vocabularies (BENCH/vocab_bench.py).  The windowed result is eagerly
    checkpointed (bounded by the threshold) so the precached input can be
    released; above the threshold the extra count costs one cached-scan
    job and the scale-safe two-phase path runs unchanged.
    """
    spark = df.sparkSession
    if precache:
        from pyspark import StorageLevel
        # never touch a persistence level the CALLER chose — unpersisting
        # below would silently evict their cache (same rule as
        # postings.write_postings)
        precache = df.storageLevel == StorageLevel.NONE
    if precache:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if small_threshold:
        if df.count() < small_threshold:
            out = df.withColumn(
                id_col,
                (F.row_number().over(Window.orderBy(*order_cols))
                 - 1 + start).cast("long"))
            out = out.localCheckpoint(eager=True)
            if precache:
                df.unpersist()
            return out
    n_part = partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_part, *order_cols) \
               .withColumn("_pid", F.spark_partition_id()) \
               .withColumn("_rn", F.row_number().over(
                   Window.partitionBy("_pid").orderBy(*order_cols)))
    ranged = ranged.localCheckpoint(eager=False)  # pin partitioning for both passes
    # this action materializes EVERY checkpoint partition (full lineage
    # runs once); afterwards downstream reads come from the checkpoint
    counts = ranged.groupBy("_pid").count().collect()
    if precache:
        df.unpersist()
    offsets, acc = [], start
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["count"]
    off_df = spark.createDataFrame(offsets or [(0, start)], "_pid int, _off long")
    return (ranged.join(F.broadcast(off_df), "_pid", "left")
            .withColumn(id_col,
                        (F.col("_rn") - 1 + F.coalesce("_off", F.lit(start))).cast("long"))
            .drop("_pid", "_rn", "_off"))


def with_doc_ids(docs: DataFrame, order_cols: list[str],
                 partitions: int | None = None) -> DataFrame:
    """Dense, deterministic int64 ``doc_id`` = global rank of ``order_cols``
    — the SURVEY.md §2-C "DocID assignment" operator (see dense_rank_ids)."""
    return dense_rank_ids(docs, order_cols, "doc_id", partitions)


def content_invariant_violations(src: DataFrame, derived: DataFrame,
                                 key_cols: list[str],
                                 text_col: str = "content") -> DataFrame:
    """Per-row content-sha256 invariant (input_hint): rows of a derived
    table must carry byte-identical content to the source row with the
    same key.  Returns the violating keys (empty == invariant holds):
    keys missing from either side, or present with differing sha256.

    Full-outer join on the key with JVM-side sha2 — one shuffle, no
    Python; run as a build audit (scripts/build_index.py --audit).
    NULL content is legal and equal to NULL content (null-safe compare
    with explicit presence markers — sha2(NULL) is NULL, so NULLness
    cannot stand in for \"key missing\")."""
    a = src.select(*key_cols, F.sha2(F.col(text_col), 256).alias("_sha_src"),
                   F.lit(True).alias("_in_src"))
    b = derived.select(*key_cols,
                       F.sha2(F.col(text_col), 256).alias("_sha_der"),
                       F.lit(True).alias("_in_der"))
    j = a.join(b, key_cols, "full_outer")
    return (j.filter(F.col("_in_src").isNull()
                     | F.col("_in_der").isNull()
                     | ~F.col("_sha_src").eqNullSafe(F.col("_sha_der")))
            .select(*key_cols, "_sha_src", "_sha_der"))


def term_doc_freqs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "content") -> DataFrame:
    """(doc_id, term, tf, dl) — one row per distinct term per doc.

    mapInPandas emitting FLAT columns: term frequencies are aggregated
    per document inside the Python worker (map-side combine — no groupBy
    over raw tokens ever exists), and the output is four plain Arrow
    columns.  An array<struct> + JVM explode variant benchmarked ~2x
    slower (list-of-tuples construction in Python + nested Arrow
    encoding dominate).
    """
    import numpy as np
    from collections import Counter

    from ..analysis.chain import analyze_terms

    spark = docs.sparkSession
    min_par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < min_par:
        # a single parquet file scans as 1 split; spread the Python
        # analyzer across all cores (prod inputs have many splits)
        docs = docs.repartition(min_par)

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            texts = pdf[text_col]
            terms: list[str] = []
            tfs: list[int] = []
            nkeys = np.empty(len(ids), dtype=np.int64)
            dls = np.empty(len(ids), dtype=np.int64)
            for i, text in enumerate(texts):
                toks = analyze_terms(text or "")
                c = Counter(toks)
                ks = sorted(c)
                terms.extend(ks)
                tfs.extend(c[k] for k in ks)
                nkeys[i] = len(ks)
                dls[i] = len(toks)
            yield pd.DataFrame({
                "doc_id": np.repeat(ids, nkeys),
                "dl": np.repeat(dls, nkeys),
                "term": terms,
                "tf": np.asarray(tfs, dtype=np.int32),
            })

    return docs.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        gen, schema="doc_id long, dl int, term string, tf int")


def corpus_stats(tdf: DataFrame) -> tuple[int, float]:
    """(N docs, avg doc length) in ONE map-side-combined agg pass.

    dl == Σtf within a doc, so avgdl = Σtf / N exactly (integer sums are
    exact; the single double division matches the per-doc-average form
    bit-for-bit).  Docs that analyze to zero terms have no tdf rows and
    are excluded — matching the pandas oracle's definition.
    """
    row = tdf.agg(F.count_distinct("doc_id").alias("n"),
                  F.sum("tf").alias("total")).collect()[0]
    n = int(row["n"] or 0)
    return n, (float(row["total"]) / n if n else 0.0)


def term_stats(tdf: DataFrame) -> DataFrame:
    """(term, df, cf) — partial+final hash agg, JVM-side."""
    return tdf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf"))


def term_dict(tstats: DataFrame) -> DataFrame:
    """Sorted term dictionary with dense 1-based ids (the FST's role,
    SURVEY §1.4) via the same two-phase range-rank as doc ids — a
    10^8-10^9-term code vocabulary never funnels through one partition
    (a global orderBy window would); stored sorted so prefix/range
    queries prune by min/max.  Adaptive: below SMALL_RANK_THRESHOLD terms
    the single-partition windowed rank runs instead (identical ids,
    fewer jobs — BENCH/vocab_bench.py's measured crossover)."""
    return dense_rank_ids(tstats, ["term"], "term_id", start=1,
                          precache=True,
                          small_threshold=SMALL_RANK_THRESHOLD)


def fuzzy_expand(tstats: DataFrame, query_term: str, max_edits: int = 2,
                 prefix_len: int = 0) -> DataFrame:
    """Terms within ``max_edits`` Levenshtein distance of ``query_term``
    -> (term, df, dist) — the reference automaton package's remaining
    role (fuzzy queries; RegExp/RunAutomaton at
    /root/reference/src/util/automaton/ back Lucene's FuzzyQuery).

    Spark-first substitution: instead of compiling a Levenshtein DFA,
    prune with necessary conditions that push into the scan — length
    band (|len(t)-len(q)| <= d) and an optional shared prefix, Lucene
    FuzzyQuery's prefixLength — then evaluate the built-in
    ``levenshtein`` (JVM codegen) on the survivors.  Embarrassingly
    parallel over the term dictionary; no shuffle, no UDF."""
    q = query_term
    cond = (F.length("term") >= len(q) - max_edits) & \
           (F.length("term") <= len(q) + max_edits)
    if prefix_len > 0:
        cond = cond & F.col("term").startswith(q[:prefix_len])
    return (tstats.filter(cond)
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
            .filter(F.col("dist") <= max_edits)
            .select("term", "df", "dist"))


class OversizedExpansion:
    """Marker for a negative expansion too large to collect: iterates
    as EMPTY (so plan.finalize drops it from the in-kernel term list)
    and carries ``terms_df`` — the matched dictionary terms AS A
    DATAFRAME — for the doc-set anti-join path (engine.query): matched
    terms -> postings semi-join -> anti-join the doc ids.  The term
    list never reaches the driver or a task closure (r4 VERDICT item
    4: a ``-license*`` clause over a 40M-term vocabulary must not ship
    millions of terms through one collect)."""

    def __init__(self, sid: int, n_terms: int, terms_df: DataFrame):
        self.sid = sid
        self.n_terms = n_terms
        self.terms_df = terms_df

    def __iter__(self):
        return iter(())


def expand_specs(tstats: DataFrame, specs: list[dict],
                 default_field: str | None = None,
                 neg_collect_max: int | None = None,
                 neg_docset_sids: set | None = None) -> list:
    """Expand EVERY dictionary-expansion clause of a query in ONE Spark
    job -> per-spec ``[(term, df, dist), ...]`` lists (terms AS STORED,
    i.e. field-prefixed for non-default fields), each sorted by term.

    Round-3 ran one job per fuzzy/prefix/regex clause
    (engine.py:127-131/244-258) — a 5-clause query paid 5 driver round
    trips before WAND started; per-query latency at serving scale is
    round-trip-dominated (r3 VERDICT item 2).  Here all clause
    predicates evaluate in one scan pass: each spec contributes a
    condition column, matches explode to (spec_id, term, df, dist)
    rows, per-spec caps apply through ONE window partitioned by spec_id
    (partitions are per-clause — never global), and a single collect
    returns every expansion.

    spec keys:
      kind: 'fuzzy' | 'prefix' | 'regex' | 'range'   (wildcards compile
            to 'regex' upstream — queryparser.wildcard_to_regex)
      value: query term / prefix / regex source
      edits: fuzzy max edits;  prefix_len: fuzzy shared-prefix length
      lo/hi/incl_lo/incl_hi: range bounds (None = open)
      field: None = default field
      cap: int max expansions (df-descending, Lucene's top-terms
           rewrite) or None = UNBOUNDED — required for negative clauses,
           where exclusion needs the full match set (Lucene's
           constant-score rewrite for multi-term queries in negative
           context; r3 ADVICE item 2)

    ``neg_collect_max`` (r5): uncapped specs listed in
    ``neg_docset_sids`` whose match COUNT exceeds this return an
    ``OversizedExpansion`` (terms stay distributed as a DataFrame; the
    caller anti-joins the doc set) instead of a collected list — one
    cheap per-sid count agg decides, and the oversized sids are
    filtered OUT of the collect.  None (default) keeps the full
    collect for everything.
    """
    from functools import reduce
    from operator import or_

    if not specs:
        return []
    conds, dists, caps = [], [], []
    for sp in specs:
        fld = sp.get("field") or default_field
        if fld is not None and fld != default_field:
            prefix = fld + FIELD_SEP
            in_field = F.col("term").startswith(prefix)
            mt = F.substring(F.col("term"), len(prefix) + 1, 1 << 24)
        else:
            in_field = ~F.col("term").contains(FIELD_SEP)
            mt = F.col("term")
        dist = F.lit(0)
        if sp["kind"] == "fuzzy":
            q = sp["value"]
            d = int(sp.get("edits", 2))
            cond = (F.length(mt) >= len(q) - d) \
                & (F.length(mt) <= len(q) + d)
            pl = int(sp.get("prefix_len", 0))
            if pl > 0:
                cond = cond & mt.startswith(q[:pl])
            dist = F.levenshtein(mt, F.lit(q))
            cond = cond & (dist <= d)
        elif sp["kind"] == "prefix":
            cond = mt.startswith(sp["value"])
        elif sp["kind"] == "regex":
            cond = mt.rlike(f"^(?:{sp['value']})$")
        elif sp["kind"] == "range":
            cond = F.lit(True)
            lo, hi = sp.get("lo"), sp.get("hi")
            if lo is not None:
                cond = cond & (mt >= lo if sp.get("incl_lo", True)
                               else mt > lo)
            if hi is not None:
                cond = cond & (mt <= hi if sp.get("incl_hi", True)
                               else mt < hi)
        else:
            raise ValueError(f"unknown expansion kind {sp['kind']!r}")
        conds.append(cond & in_field)
        dists.append(dist)
        caps.append(sp.get("cap"))
    hits = F.array(*[
        F.when(c, F.struct(F.lit(i).alias("sid"), d.alias("dist")))
        for i, (c, d) in enumerate(zip(conds, dists))])
    cap_expr = None
    if any(c is not None for c in caps):
        pairs = []
        for i, c in enumerate(caps):
            pairs += [F.lit(i), F.lit(int(c) if c is not None else 1 << 31)]
        cap_expr = F.element_at(F.create_map(*pairs), F.col("sid"))
    matched = (tstats
               .filter(reduce(or_, conds))       # scan-level pruning
               .select("term", "df", F.explode(hits).alias("h"))
               .filter(F.col("h").isNotNull())
               .select(F.col("h.sid").alias("sid"), "term", "df",
                       F.col("h.dist").alias("dist")))
    if cap_expr is not None:
        w = Window.partitionBy("sid").orderBy(F.desc("df"), F.asc("term"))
        matched = (matched.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") <= cap_expr).drop("_rn"))
    out: list = [[] for _ in specs]
    oversized: dict[int, int] = {}
    if neg_collect_max is not None and neg_docset_sids:
        check = sorted(s for s in neg_docset_sids
                       if caps[s] is None)
        if check:
            # localCheckpoint: the count probe and the collect (and any
            # later doc-set joins) reuse one evaluation of the scan
            matched = matched.localCheckpoint(eager=False)
            counts = {int(r["sid"]): int(r["n"]) for r in
                      matched.filter(F.col("sid").isin(check))
                      .groupBy("sid").agg(F.count("*").alias("n"))
                      .collect()}
            oversized = {s: n for s, n in counts.items()
                         if n > neg_collect_max}
            if oversized:
                for s, n in oversized.items():
                    out[s] = OversizedExpansion(
                        s, n,
                        matched.filter(F.col("sid") == s)
                        .select("term"))
                matched = matched.filter(
                    ~F.col("sid").isin(sorted(oversized)))
    for r in matched.collect():
        out[int(r["sid"])].append(
            (r["term"], int(r["df"]), int(r["dist"])))
    for lst in out:
        if isinstance(lst, list):
            lst.sort()
    return out


def suggest_terms(tstats: DataFrame, term: str, max_edits: int = 2,
                  k: int = 5, prefix_len: int = 1) -> DataFrame:
    """Spell-correction candidates (Lucene DirectSpellChecker role) ->
    (term, df, dist), ranked the way DirectSpellChecker does: smaller
    edit distance first, then higher df (a more frequent word is the
    likelier intended one), term asc as the deterministic tie-break.
    ``prefix_len`` defaults to 1 — DirectSpellChecker's default; typos
    rarely break the first letter and the shared-prefix predicate is
    scan-prunable on the sorted dictionary."""
    return (fuzzy_expand(tstats, term, max_edits, prefix_len)
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(k))


def idf(n_docs: int, df: int) -> float:
    """Lucene BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)).

    Computed in PYTHON (driver-side, query terms only): java.lang.Math.log
    and libm can disagree by 1 ulp, which breaks the bit-identical
    rank-identity contract between the JVM scorer, the WAND pandas kernel
    and the pure-pandas oracle.  Shipping idf as a literal keeps the JVM
    side to exact IEEE +,*,/ only.
    """
    import math
    return math.log(1.0 + (float(n_docs) - df + 0.5) / (df + 0.5))


def bm25_scores(tdf: DataFrame, tstats: DataFrame, n_docs: int, avgdl: float,
                query_terms: list[str], k1: float = K1, b: float = B) -> DataFrame:
    """Exhaustive BM25 over all matching docs -> (doc_id, score).

    Query terms (tiny) are broadcast; per-term contributions are summed in
    term order via sort_array + aggregate so the float result is identical
    at any parallelism (SURVEY §4 "rank identity" engineering note).
    """
    spark = tdf.sparkSession
    terms = sorted(set(query_terms))
    dfs = {r["term"]: r["df"] for r in
           tstats.filter(F.col("term").isin(terms)).select("term", "df").collect()}
    qt = spark.createDataFrame(
        [(t, idf(n_docs, dfs[t])) for t in terms if t in dfs],
        "term string, idf double")
    if qt.isEmpty():
        return spark.createDataFrame([], "doc_id long, score double")
    scored = (tdf.join(F.broadcast(qt), "term")
              .withColumn(
                  "contrib",
                  F.col("idf") * (F.col("tf") * (k1 + 1.0))
                  / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / float(avgdl)))))
    return (scored.groupBy("doc_id")
            .agg(F.sort_array(F.collect_list(F.struct("term", "contrib")))
                 .alias("parts"))
            .select("doc_id",
                    F.aggregate("parts", F.lit(0.0),
                                lambda acc, x: acc + x["contrib"]).alias("score")))


def bm25_topk(tdf: DataFrame, tstats: DataFrame, n_docs: int, avgdl: float,
              query: str, k: int = 10) -> DataFrame:
    """Analyze the query with the SAME chain as indexing, then top-k with a
    total tie-break (score desc, doc_id asc) -> TakeOrderedAndProject."""
    terms = [t.term for t in analyze(query)]
    if not terms:
        return tdf.sparkSession.createDataFrame([], "doc_id long, score double")
    scores = bm25_scores(tdf, tstats, n_docs, avgdl, terms)
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
