"""Posting-list construction: delta-gap + VByte blocks with block-max skip
metadata (SURVEY.md §2-C "Posting-list build" / "Segment merge").

Two build paths, one storage schema:

``index_corpus``  (the scale path, used by bench + entry):
    ONE pass: the documents are already range-partitioned by doc_id
    (with_doc_ids), so each partition is a disjoint contiguous doc range —
    the Lucene *segment* model.  mapInPandas fuses analyzer + posting
    builder: per partition it accumulates term -> (docs, tfs, dls) and
    emits finished block rows.  NO raw (doc,term,tf) row ever crosses the
    wire; the only shuffle in the whole index build is the one that
    assigned doc ids.  "Segment merge" costs zero: blocks are doc-sorted
    within a partition and partitions are doc-disjoint, so the per-term
    global posting list is just the rows ordered by (rbucket, block_no).
    Zipf skew: a heavy term's postings are split across ALL partitions —
    no reducer ever holds a full heavy-term list.

``build_postings``  (the composable path over an existing
    (doc_id, term, tf, dl) DataFrame): order-preserving salted shuffle on
    (term, rbucket = doc_id // bucket_span), then applyInPandas per group.
    Same output schema; used when term frequencies come from elsewhere.

Term statistics FALL OUT of the block metadata (df = Σ n, cf = Σ sum_tf,
Σdl = Σ cf over all terms) — no separate corpus-wide aggregation pass.

Block-max metadata stores (max_tf, min_dl) rather than a precomputed
impact: BM25 impact is monotone increasing in tf and decreasing in dl, so
idf·(k1+1)·max_tf/(max_tf + k1(1−b+b·min_dl/avgdl)) is a valid upper
bound computable at query time with the final avgdl — this is what lets
the build stay single-pass (avgdl is unknown while blocks are written).

Schema (one row per ≤128-doc block — bounded row size, parallel scan,
WAND prunes whole rows by (first_doc, last_doc, max_tf, min_dl)):

    term string, rbucket long, block_no int, n int,
    first_doc long, last_doc long, max_tf int, min_dl int, sum_tf long,
    doc_blob binary (delta+VByte), tf_blob binary, dl_blob binary
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


BLOCK_SIZE = 128

# index_corpus flushes its per-partition accumulator to finished block
# rows every ~FLUSH_POSTINGS postings: bounds the working set to ~12 MB
# of array('q') per worker regardless of partition size (32 workers on
# one box otherwise contend for DRAM bandwidth as partitions grow — the
# measured 1M-doc scaling gap, BENCH/BASELINE.md).  Each flush gets its
# own rbucket: a doc's postings all land in one flush (docs are analyzed
# whole), so every rbucket still holds ALL postings of a disjoint doc
# set — the WAND-bucket invariant.  RBUCKET_STRIDE leaves room for 2^10
# flushes per partition (a flush covers >= 0.5M postings, so hitting the
# stride would need a >500M-posting input split — two orders beyond
# spark.sql.files.maxPartitionBytes).
FLUSH_POSTINGS = 1 << 19
RBUCKET_STRIDE = 1 << 10

POSTINGS_SCHEMA = (
    "term string, rbucket long, block_no int, n int, first_doc long, "
    "last_doc long, max_tf int, min_dl int, sum_tf long, "
    "doc_blob binary, tf_blob binary, dl_blob binary"
)

_COLS = ["term", "rbucket", "block_no", "n", "first_doc", "last_doc",
         "max_tf", "min_dl", "sum_tf", "doc_blob", "tf_blob", "dl_blob"]


def tile_blocks(term_offsets: np.ndarray, block_size: int
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tile per-term slices into <= block_size-doc blocks (shared by the
    BM25 and positional builders): -> (term_idx, block_no, bstarts,
    bends), all in the concatenated doc-index space."""
    counts = np.diff(term_offsets)
    nblocks = (counts + block_size - 1) // block_size
    term_idx = np.repeat(np.arange(len(counts)), nblocks)
    block_no = (np.concatenate([np.arange(b) for b in nblocks])
                if len(counts) else np.empty(0, dtype=np.int64))
    bstarts = term_offsets[term_idx] + block_no * block_size
    bends = np.minimum(bstarts + block_size, term_offsets[term_idx + 1])
    return term_idx, block_no, bstarts, bends


def _block_rows(terms: list[str], term_offsets: np.ndarray,
                docs: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                rbucket: int) -> pd.DataFrame:
    """Vectorized block-row construction for a whole bucket/partition.

    ``terms``: per-term strings; ``term_offsets``: len(terms)+1 start
    offsets into the concatenated ``docs``/``tfs``/``dls`` arrays, each
    term's slice doc-ascending.  ONE VByte pass encodes everything; block
    stats come from np.*.reduceat — no per-term small-array overhead.
    """
    from ..functions.codec import vbyte_encode_slices

    n = docs.size
    if n == 0:
        return pd.DataFrame(columns=_COLS)
    term_idx, block_no, bstarts, bends = tile_blocks(term_offsets,
                                                     BLOCK_SIZE)
    # delta-gap with reset at block starts (first doc absolute per block)
    gaps = docs.astype(np.uint64).copy()
    gaps[1:] -= docs[:-1].astype(np.uint64)
    gaps[bstarts] = docs[bstarts]
    doc_blobs = vbyte_encode_slices(gaps, bstarts)
    tf_blobs = vbyte_encode_slices(tfs, bstarts)
    dl_blobs = vbyte_encode_slices(dls, bstarts)
    max_tf = np.maximum.reduceat(tfs, bstarts)
    min_dl = np.minimum.reduceat(dls, bstarts)
    sum_tf = np.add.reduceat(tfs, bstarts)
    return pd.DataFrame({
        "term": np.asarray(terms, dtype=object)[term_idx],
        "rbucket": np.full(bstarts.size, rbucket, dtype=np.int64),
        "block_no": block_no.astype(np.int32),
        "n": (bends - bstarts).astype(np.int32),
        "first_doc": docs[bstarts].astype(np.int64),
        "last_doc": docs[bends - 1].astype(np.int64),
        "max_tf": max_tf.astype(np.int32),
        "min_dl": min_dl.astype(np.int32),
        "sum_tf": sum_tf.astype(np.int64),
        "doc_blob": doc_blobs,
        "tf_blob": tf_blobs,
        "dl_blob": dl_blobs,
    })


def index_corpus(docs_with_ids: DataFrame, id_col: str = "doc_id",
                 text_col: str = "content", analyzer=None,
                 rbucket_base: int = 0,
                 flush_postings: int = FLUSH_POSTINGS,
                 fields: list[str] | None = None) -> DataFrame:
    """Fused analyze + posting-block build, one pass, zero extra shuffle.

    ``docs_with_ids`` must be partitioned into disjoint doc_id ranges
    (with_doc_ids output is).  Partition memory is bounded by
    ``flush_postings`` (the accumulator spills finished doc sets to block
    rows incrementally — see FLUSH_POSTINGS), NOT by partition or term
    df size — the heavy-term problem is structurally absent and the
    working set stays cache-friendly at any input split size.

    ``analyzer``: optional analysis.analyzers.Analyzer (custom chain —
    hunspell/morphology stemmers, char maps, custom stop sets); defaults
    to the reference flagship chain.  Queries must use the same analyzer.

    ``rbucket_base``: offset added to the partition id — multi-segment
    builders (chunked/resumable, streaming epochs) pass a per-segment
    base so rbuckets stay globally unique (better bucket balance at query
    time; correctness never depends on it since WAND orders blocks by
    first_doc).  Emitted rbuckets are
    (rbucket_base + partition_id) * RBUCKET_STRIDE + flush_no.

    ``fields``: MULTI-FIELD mode — a list of text columns indexed in
    the SAME pass (``text_col`` is ignored).  fields[0] is the default
    field, stored bare; other fields' terms are stored as
    "<field>\\x1f<term>" (fulltext.FIELD_SEP), so per-field df/cf fall
    out of the ordinary term stats and dl is the FIELD length (Lucene's
    per-field norms).  One pass matters beyond the scan cost: a doc's
    postings across ALL its fields land in the same flush, hence the
    same rbucket — the per-bucket boolean/WAND kernels see a doc's
    complete cross-field membership (two per-field passes would flush
    independently and break that invariant).
    """
    from .fulltext import FIELD_SEP

    if analyzer is not None:
        terms_of = analyzer.terms
    else:
        from ..analysis.chain import analyze_terms as terms_of

    field_list = list(fields) if fields else [text_col]
    prefixes = [""] + [f + FIELD_SEP for f in field_list[1:]]

    def build(batches):
        from array import array

        from pyspark import TaskContext

        base = rbucket_base + TaskContext.get().partitionId()
        # array('q') accumulators: ~4x less memory than Python int lists
        # (the per-partition working set is what pressures the DRAM bus
        # under 32 workers — see BENCH/BASELINE.md scaling notes)
        acc: dict[str, tuple] = {}
        state = {"pending": 0, "flush_no": 0}

        def flush() -> pd.DataFrame | None:
            if not acc:
                return None
            terms = sorted(acc)
            sizes = np.array([len(acc[t][0]) for t in terms], dtype=np.int64)
            offsets = np.concatenate(([0], np.cumsum(sizes)))
            total = int(offsets[-1])
            docs_a = np.empty(total, dtype=np.uint64)
            tfs_a = np.empty(total, dtype=np.uint64)
            dls_a = np.empty(total, dtype=np.uint64)
            for i, term in enumerate(terms):
                s, e = offsets[i], offsets[i + 1]
                d, t, l = acc[term]
                docs_a[s:e] = d
                tfs_a[s:e] = t
                dls_a[s:e] = l
                if e - s > 1 and not (docs_a[s + 1:e] >= docs_a[s:e - 1]).all():
                    order = np.argsort(docs_a[s:e], kind="stable")
                    docs_a[s:e] = docs_a[s:e][order]
                    tfs_a[s:e] = tfs_a[s:e][order]
                    dls_a[s:e] = dls_a[s:e][order]
            rb = base * RBUCKET_STRIDE + state["flush_no"]
            acc.clear()
            state["pending"] = 0
            state["flush_no"] += 1
            return _block_rows(terms, offsets, docs_a, tfs_a, dls_a, rb)

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            field_vals = [pdf[f].tolist() for f in field_list]
            for ri, did in enumerate(ids):
                # all fields of a doc accumulate BEFORE the flush check:
                # a doc's postings never straddle flushes (the rbucket
                # doc-disjointness invariant, now per doc across fields)
                for prefix, vals in zip(prefixes, field_vals):
                    toks = terms_of(vals[ri] or "")
                    dl = len(toks)
                    c = Counter(toks)
                    for t, tf in c.items():
                        key = prefix + t if prefix else t
                        e = acc.get(key)
                        if e is None:
                            e = acc[key] = (array("q"), array("q"),
                                            array("q"))
                        e[0].append(did)
                        e[1].append(tf)
                        e[2].append(dl)
                    state["pending"] += len(c)
                if state["pending"] >= flush_postings:
                    out = flush()
                    if out is not None:
                        yield out
        out = flush()
        if out is not None:
            yield out

    return docs_with_ids.select(id_col, *field_list).mapInPandas(
        build, schema=POSTINGS_SCHEMA)


def build_postings(tdf: DataFrame, bucket_span: int = 1 << 20) -> DataFrame:
    """(doc_id, term, tf, dl) rows -> posting blocks via an
    ORDER-PRESERVING salted shuffle.

    The salt ``rbucket = doc_id // bucket_span`` is a contiguous doc
    range: per-term block sequences ordered by (rbucket, block_no) are
    already globally doc-sorted, so the merge phase is free, and a heavy
    term is split across as many tasks as it spans buckets.

    Span note (r6 NEGATIVE result): deriving the span adaptively
    (~2 buckets per core, so a sub-1M-doc corpus gets multi-task query
    kernels instead of one bucket) was built and MEASURED SLOWER at
    sf1.0 — bm25_batch100 5.4 -> 9.3 s, wand_fullchain_sql 3.3 ->
    6.8 s: the postings table is small enough that AQE coalesces the
    kernel shuffle back to a few tasks, so the extra per-group
    pandas/Arrow overhead (buckets x queries kernel launches, 49x the
    groupBy groups at build) is pure loss.  The fixed 2^20 span stands;
    at >= 10^9 docs it already yields thousands of buckets and the
    kernel parallelism problem does not exist.
    """
    salted = tdf.select(
        "term",
        (F.col("doc_id") / F.lit(bucket_span)).cast("long").alias("rbucket"),
        "doc_id", "tf", "dl")

    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        rbucket = int(pdf["rbucket"].iloc[0])
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        docs_a = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
        tfs_a = pdf["tf"].to_numpy()[order].astype(np.uint64)
        dls_a = pdf["dl"].to_numpy()[order].astype(np.uint64)
        offsets = np.array([0, docs_a.size], dtype=np.int64)
        return _block_rows([term], offsets, docs_a, tfs_a, dls_a, rbucket)

    return (salted.repartition("term", "rbucket")
            .groupBy("term", "rbucket")
            .applyInPandas(build_group, schema=POSTINGS_SCHEMA))


def pack_bucket_groups(stats: DataFrame, target: int) -> DataFrame:
    """Bucket-extent stats ``(rbucket, lo, w)`` -> ``(rbucket, _gid)``:
    contiguous doc-range runs of ~``target`` total weight, in ``lo``
    order — the compaction pack assignment, computed DISTRIBUTIVELY.

    The round-3 implementation collected one stats row per bucket and
    packed greedily on the driver — metadata-only, but ~10^6-10^7 rows
    through the driver per compaction at 10^12-doc scale.  This version
    computes the exclusive weighted cumsum with the same two-phase
    scheme as ``fulltext.dense_rank_ids`` (range partition on ``lo``,
    per-partition window, driver-side prefix offsets over #partitions
    integers) and assigns ``_gid = floor(cum_excl / target)`` — groups
    are still contiguous runs of doc-disjoint ranges (the WAND/boolean
    bucket invariant survives), only the exact pack boundaries differ
    from the greedy rule (physical layout, never results).  ``lo`` is a
    unique key: buckets are doc-set disjoint, so two buckets cannot
    share a minimum doc id."""
    from pyspark.sql import Window

    spark = stats.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    ranged = (stats.repartitionByRange(n_part, "lo")
              .withColumn("_pid", F.spark_partition_id())
              .withColumn("_cum", F.sum("w").over(
                  Window.partitionBy("_pid").orderBy("lo")))
              .localCheckpoint(eager=False))
    totals = ranged.groupBy("_pid").agg(F.sum("w").alias("t")).collect()
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += int(row["t"])
    off = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    return (ranged.join(F.broadcast(off), "_pid", "left")
            .withColumn("_gid",
                        ((F.col("_cum") - F.col("w")
                          + F.coalesce("_off", F.lit(0)))
                         / F.lit(target)).cast("long"))
            .select("rbucket", "_gid"))


def compact_postings(postings: DataFrame,
                     target_postings: int = FLUSH_POSTINGS) -> DataFrame:
    """Segment compaction — Lucene's TieredMergePolicy role.

    Chunked, resumed, streamed, or flush-bounded builds leave MANY small
    doc-range buckets, each with fragmented (often 1-doc) blocks per
    term: query-time block metadata scans and per-bucket kernel launches
    grow with fragment count, not data size.  Compaction rewrites the
    index into full-size blocks:

    1. per-rbucket extent stats (one row per bucket) are packed, in
       doc-range order, into groups of ~``target_postings`` postings by
       ``pack_bucket_groups`` — a distributed prefix-sum assignment (no
       full driver collect; the driver sees #partitions integers).
       Buckets are doc-disjoint by construction, and packing only merges
       ADJACENT ranges, so every group is again a contiguous, disjoint
       doc range — the WAND/boolean bucket invariant survives;
    2. one applyInPandas pass per group decodes each term's blocks
       (first_doc order == global doc order), concatenates, and rebuilds
       through the same ``_block_rows`` vectorized encoder the builders
       use.

    Results are BIT-IDENTICAL for every consumer (same postings, same
    per-bucket evaluation; term_stats/corpus_stats are Σ-preserved);
    only the physical block/bucket layout changes.  Shuffle cost: one
    groupBy over the postings rows — no corpus re-scan, no re-tokenize.
    """
    stats = postings.groupBy("rbucket").agg(
        F.min("first_doc").alias("lo"), F.sum("n").alias("w"))
    mapping = pack_bucket_groups(stats, target_postings)

    def compact_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.codec import delta_decode, vbyte_decode
        gid_v = int(pdf["_gid"].iloc[0])
        terms, offsets = [], [0]
        d_parts, t_parts, l_parts = [], [], []
        total = 0
        for term, g in pdf.groupby("term", sort=True):
            g = g.sort_values("first_doc")
            td = [delta_decode(vbyte_decode(db)).astype(np.uint64)
                  for db in g["doc_blob"]]
            tt = [vbyte_decode(tb).astype(np.uint64) for tb in g["tf_blob"]]
            tl = [vbyte_decode(lb).astype(np.uint64) for lb in g["dl_blob"]]
            docs_t = np.concatenate(td)
            tfs_t = np.concatenate(tt)
            dls_t = np.concatenate(tl)
            # doc-order guard: buckets are doc-SET disjoint, not doc-RANGE
            # disjoint (index_corpus tolerates doc-unordered partition
            # input, so two flushes of one partition can interleave doc
            # ranges) — first_doc-sorted concatenation is then
            # non-monotonic and the uint64 gap encode in _block_rows
            # would silently wrap.  Re-sort the term's postings like the
            # builder's flush guard does.
            if docs_t.size > 1 and not (docs_t[1:] >= docs_t[:-1]).all():
                order = np.argsort(docs_t, kind="stable")
                docs_t, tfs_t, dls_t = (docs_t[order], tfs_t[order],
                                        dls_t[order])
            d_parts.append(docs_t)
            t_parts.append(tfs_t)
            l_parts.append(dls_t)
            total += docs_t.size
            terms.append(term)
            offsets.append(total)
        return _block_rows(terms, np.asarray(offsets, dtype=np.int64),
                           np.concatenate(d_parts),
                           np.concatenate(t_parts),
                           np.concatenate(l_parts), gid_v)

    return (postings.join(F.broadcast(mapping), "rbucket")
            .groupBy("_gid")
            .applyInPandas(compact_group, schema=POSTINGS_SCHEMA))


def matched_doc_ids(postings: DataFrame,
                    terms_df: DataFrame) -> DataFrame:
    """Distinct doc ids carrying ANY term of ``terms_df`` ->
    (doc_id) — the doc-set form of a huge negative expansion
    (engine.query's anti-join fallback, r4 VERDICT item 4): the term
    set stays a DATAFRAME end to end (semi-join prunes the block scan;
    blobs decode in a mapInPandas; distinct dedupes doc ids).  Nothing
    term-shaped ever reaches the driver or a task closure."""
    from ..functions.codec import delta_decode, vbyte_decode

    sel = (postings.join(terms_df.select("term").distinct(), "term",
                         "left_semi")
           .select("doc_blob"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = [delta_decode(vbyte_decode(bb)).astype(np.int64)
                    for bb in pdf["doc_blob"]]
            yield pd.DataFrame({"doc_id": np.unique(
                np.concatenate(arrs))})

    return sel.mapInPandas(gen, schema="doc_id long").distinct()


def term_stats_from_postings(postings: DataFrame) -> DataFrame:
    """(term, df, cf) derived from block metadata — no corpus re-scan."""
    return postings.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"))


def term_dict_from_postings(postings: DataFrame) -> DataFrame:
    """Sorted term dictionary with dense ids (the FST role, SURVEY §1.4).
    Two-phase range rank — no single-partition window at vocab scale."""
    from .fulltext import dense_rank_ids
    return dense_rank_ids(
        term_stats_from_postings(postings), ["term"], "term_id", start=1,
        precache=True)


def corpus_stats_from_postings(postings: DataFrame, n_docs: int) -> float:
    """avgdl from block metadata: Σ sum_tf == Σ dl over docs."""
    total = postings.agg(F.sum("sum_tf")).collect()[0][0] or 0
    return float(total) / n_docs if n_docs else 0.0


def read_postings(spark, path: str) -> DataFrame:
    """Open a write_postings directory with its format header checked
    (functions/header.py — CodecUtil's role): a stale or foreign layout
    fails HERE with a versioned message, not mid-decode."""
    from ..functions.header import (POSTINGS_CODEC, POSTINGS_VERSION,
                                    check_dir_header)
    check_dir_header(path, POSTINGS_CODEC, 2, POSTINGS_VERSION)
    return spark.read.parquet(path)


def write_postings(postings: DataFrame, path: str) -> None:
    """Persist range-partitioned + sorted by term so parquet row-group
    min/max statistics prune term lookups (the sorted-FST role).
    Stamps a _FORMAT.json header (codec + version, functions/header.py)
    so a reader against a stale layout fails cleanly.

    The blocks are persisted across the two passes the range partitioner
    needs (boundary sampling + the real shuffle) — otherwise the sampling
    job silently RE-RUNS the whole upstream index build (measured: 2x
    build cost on a 1M-doc corpus).  A DataFrame the CALLER already
    persisted is left persisted (unpersisting here would silently evict
    the caller's cache — persist/unpersist key on the plan, not on this
    reference)."""
    from pyspark import StorageLevel

    already = postings.storageLevel != StorageLevel.NONE

    def write(df):
        from ..functions.header import (POSTINGS_CODEC, POSTINGS_VERSION,
                                        write_dir_header)
        (df.repartitionByRange("term")
         .sortWithinPartitions("term", "rbucket", "block_no")
         .write.mode("overwrite").parquet(path))
        write_dir_header(path, POSTINGS_CODEC, POSTINGS_VERSION)

    if already:
        write(postings)
        return
    p = postings.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        write(p)
    finally:
        p.unpersist()
