"""Positional postings + phrase matching — block-packed storage.

The reference's chain defines token POSITIONS (pos_inc/pos_len graph,
/root/reference/src/analyses/TokenStream.php:16-22 attributes; stop
filters leave holes, WDGF stacks parts) — this operator materializes them
into a positional index so phrase queries evaluate with true Lucene
position semantics (a stopword hole breaks exact adjacency, a WDGF part
shares its original's position).

Storage packs exactly like the BM25 blocks (postings.py): ONE row per
(term, rbucket, ≤128-doc block), not one row per (term, doc) — at
10^12-file scale a row per (term, doc) pair is ~10^11 rows of per-row
parquet/shuffle overhead, while block rows cut that 128x and keep row
sizes bounded.  Per block:

    doc_blob  — delta-gap + VByte doc ids (gap reset at block start);
    freq_blob — VByte per-doc position counts (the .pos "tf");
    pos_blob  — VByte position gaps, delta RESET AT EACH DOC (first
                position in a doc absolute) — Lucene's .pos layout, so a
                block's positions split per doc by cumsum(freqs) without
                any extra length table.

Blocks split on doc boundaries, so a doc's positions never straddle
blocks and every blob slices independently.  Phrase evaluation groups
matched terms' blocks by the doc-range ``rbucket`` (same scheme as
postings.py), so per-task work stays bounded by the build partition size
regardless of term df.
"""

from __future__ import annotations

from array import array

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..analysis import analyze
from ..functions.codec import vbyte_decode, vbyte_encode_slices

POS_BLOCK_SIZE = 128

POS_SCHEMA = ("term string, rbucket long, block_no int, n int, "
              "first_doc long, last_doc long, sum_tf long, "
              "doc_blob binary, freq_blob binary, pos_blob binary, "
              "ostart_blob binary, olen_blob binary")

_COLS = ["term", "rbucket", "block_no", "n", "first_doc", "last_doc",
         "sum_tf", "doc_blob", "freq_blob", "pos_blob",
         "ostart_blob", "olen_blob"]


def _pos_block_rows(terms: list[str], term_offsets: np.ndarray,
                    docs: np.ndarray, freqs: np.ndarray, pos: np.ndarray,
                    rbucket: int, ostart: np.ndarray | None = None,
                    olen: np.ndarray | None = None) -> pd.DataFrame:
    """Vectorized block-row construction for a whole partition.

    ``term_offsets``: len(terms)+1 offsets into ``docs``/``freqs`` (each
    term's slice doc-ascending); ``pos``: flat positions, per-doc runs
    ascending, doc boundaries at cumsum(freqs).  ONE VByte pass per blob
    kind encodes everything (vbyte_encode_slices).

    ``ostart``/``olen``: optional CHAR OFFSETS aligned 1:1 with ``pos``
    (the token stream's offsetAttribute, reference
    src/analyses/TokenStream.php:16-22): start encodes like positions
    (gaps reset per doc — starts ascend with positions), token length
    encodes raw.  Without them the offset blobs are NULL (layout
    backward/forward compatible)."""
    if docs.size == 0:
        return pd.DataFrame(columns=_COLS)
    from .postings import tile_blocks

    term_idx, block_no, bstarts, bends = tile_blocks(term_offsets,
                                                     POS_BLOCK_SIZE)
    # doc gaps with reset at block starts (first doc absolute per block)
    dgaps = docs.astype(np.uint64).copy()
    dgaps[1:] -= docs[:-1].astype(np.uint64)
    dgaps[bstarts] = docs[bstarts]
    doc_blobs = vbyte_encode_slices(dgaps, bstarts)
    freq_blobs = vbyte_encode_slices(freqs, bstarts)
    # positions: gaps reset at each DOC start (Lucene .pos layout)
    pdoc = np.concatenate(([0], np.cumsum(freqs))).astype(np.int64)
    pgaps = pos.astype(np.uint64).copy()
    pgaps[1:] -= pos[:-1].astype(np.uint64)
    pgaps[pdoc[:-1]] = pos[pdoc[:-1]]
    pos_blobs = vbyte_encode_slices(pgaps, pdoc[bstarts])
    if ostart is not None:
        ogaps = ostart.astype(np.uint64).copy()
        ogaps[1:] -= ostart[:-1].astype(np.uint64)
        ogaps[pdoc[:-1]] = ostart[pdoc[:-1]]
        ostart_blobs = vbyte_encode_slices(ogaps, pdoc[bstarts])
        olen_blobs = vbyte_encode_slices(olen.astype(np.uint64),
                                         pdoc[bstarts])
    else:
        ostart_blobs = [None] * bstarts.size
        olen_blobs = [None] * bstarts.size
    sum_tf = np.add.reduceat(freqs, bstarts)
    return pd.DataFrame({
        "term": np.asarray(terms, dtype=object)[term_idx],
        "rbucket": np.full(bstarts.size, rbucket, dtype=np.int64),
        "block_no": block_no.astype(np.int32),
        "n": (bends - bstarts).astype(np.int32),
        "first_doc": docs[bstarts].astype(np.int64),
        "last_doc": docs[bends - 1].astype(np.int64),
        "sum_tf": sum_tf.astype(np.int64),
        "doc_blob": doc_blobs,
        "freq_blob": freq_blobs,
        "pos_blob": pos_blobs,
        "ostart_blob": ostart_blobs,
        "olen_blob": olen_blobs,
    })


FLUSH_POSITIONS = 1 << 19


def positional_postings(docs_with_ids: DataFrame, id_col: str = "doc_id",
                        text_col: str = "content",
                        rbucket_base: int = 0, terms_fn=None,
                        flush_positions: int = FLUSH_POSITIONS,
                        store_offsets: bool = False,
                        spans_fn=None) -> DataFrame:
    """Fused analyze (FULL chain, graph positions) -> positional blocks.
    Requires doc-range-partitioned input (with_doc_ids output) — same
    segment model as postings.index_corpus: zero extra shuffle, heavy
    terms split across all partitions.  ``rbucket_base``: per-segment
    offset for multi-segment builders (see postings.index_corpus).

    ``terms_fn``: optional text -> list[str]; positions become the token
    indices (no graph holes).  This is the SQL-expressible tokenization
    mode the driver oracle verifies (oracles.py::phrase_match); the
    default (None) keeps the full chain's pos_inc/pos_len graph.

    Like postings.index_corpus, the per-partition accumulator flushes to
    finished block rows every ``flush_positions`` stored positions (the
    positional working set is the BM25 one plus the flat position
    arrays, so the bound matters even more here); each flush gets its
    own rbucket and holds all positions of a disjoint doc set, so
    phrase evaluation per rbucket still sees complete documents.

    ``store_offsets``: also store each kept occurrence's CHAR OFFSETS
    (start, token length) — the reference token stream's
    offsetAttribute, what real highlighting needs (engine.snippets).
    Offsets come from the full chain's Token.start/end, or from
    ``spans_fn`` (text -> [(term, start, end)], the simplified-
    tokenization mode).  Stacked tokens at one position keep the FIRST
    offset (the original's, Lucene WDGF convention)."""
    from .postings import RBUCKET_STRIDE

    with_off = store_offsets

    def build(batches):
        from pyspark import TaskContext

        base = rbucket_base + TaskContext.get().partitionId()
        # per-term accumulators: docs, per-doc counts, flat positions
        # (+ flat offset starts/lengths when with_off)
        acc: dict[str, tuple] = {}
        state = {"pending": 0, "flush_no": 0}

        def flush() -> pd.DataFrame | None:
            if not acc:
                return None
            terms = sorted(acc)
            dsizes = np.array([len(acc[t][0]) for t in terms],
                              dtype=np.int64)
            offsets = np.concatenate(([0], np.cumsum(dsizes)))
            psizes = np.array([len(acc[t][2]) for t in terms],
                              dtype=np.int64)
            poffs = np.concatenate(([0], np.cumsum(psizes)))
            docs_a = np.empty(int(offsets[-1]), dtype=np.uint64)
            freqs_a = np.empty(int(offsets[-1]), dtype=np.uint64)
            pos_a = np.empty(int(poffs[-1]), dtype=np.uint64)
            os_a = np.empty(int(poffs[-1]), dtype=np.uint64) \
                if with_off else None
            ol_a = np.empty(int(poffs[-1]), dtype=np.uint64) \
                if with_off else None
            for i, term in enumerate(terms):
                t = acc[term]
                d, f, p = t[0], t[1], t[2]
                s, e = offsets[i], offsets[i + 1]
                ps, pe = poffs[i], poffs[i + 1]
                docs_a[s:e] = d
                freqs_a[s:e] = f
                pos_a[ps:pe] = p
                if with_off:
                    os_a[ps:pe] = t[3]
                    ol_a[ps:pe] = t[4]
                # doc-order guard (same as postings.index_corpus): range
                # partitioning does NOT sort within partitions, so input
                # rows can arrive doc-unordered — re-sort docs AND gather
                # each doc's position slice along
                if e - s > 1 and not (docs_a[s + 1:e] >= docs_a[s:e - 1]).all():
                    order = np.argsort(docs_a[s:e], kind="stable")
                    fl = freqs_a[s:e].astype(np.int64)
                    starts = ps + np.concatenate(
                        ([0], np.cumsum(fl)))[:-1]
                    gather = np.concatenate(
                        [np.arange(starts[j], starts[j] + fl[j])
                         for j in order])
                    docs_a[s:e] = docs_a[s:e][order]
                    freqs_a[s:e] = freqs_a[s:e][order]
                    pos_a[ps:pe] = pos_a[gather]
                    if with_off:
                        os_a[ps:pe] = os_a[gather]
                        ol_a[ps:pe] = ol_a[gather]
            rb = base * RBUCKET_STRIDE + state["flush_no"]
            acc.clear()
            state["pending"] = 0
            state["flush_no"] += 1
            return _pos_block_rows(terms, offsets, docs_a, freqs_a,
                                   pos_a, rb, os_a, ol_a)

        for pdf in batches:
            for did, text in zip(pdf[id_col].to_numpy(), pdf[text_col]):
                # pos -> (start, len) per term; first token at a
                # position wins (stacked WDGF parts share the original's
                # offsets)
                per_term: dict[str, dict[int, tuple[int, int]]] = {}
                if spans_fn is not None:
                    for pos, (term, st, en) in enumerate(
                            spans_fn(text or "")):
                        per_term.setdefault(term, {}) \
                            .setdefault(pos, (st, en - st))
                elif terms_fn is not None:
                    for pos, term in enumerate(terms_fn(text or "")):
                        per_term.setdefault(term, {}) \
                            .setdefault(pos, (0, 0))
                else:
                    pos = -1
                    for t in analyze(text or ""):
                        pos += t.pos_inc
                        per_term.setdefault(t.term, {}) \
                            .setdefault(pos, (t.start, t.end - t.start))
                did = int(did)
                for term, pmap in per_term.items():
                    ps = sorted(pmap)
                    e = acc.get(term)
                    if e is None:
                        e = acc[term] = (array("q"), array("q"),
                                         array("q"), array("q"),
                                         array("q"))
                    e[0].append(did)
                    e[1].append(len(ps))
                    e[2].extend(ps)
                    if with_off:
                        e[3].extend(pmap[p][0] for p in ps)
                        e[4].extend(pmap[p][1] for p in ps)
                    state["pending"] += len(ps)
                if state["pending"] >= flush_positions:
                    out = flush()
                    if out is not None:
                        yield out
        out = flush()
        if out is not None:
            yield out

    if store_offsets and terms_fn is not None and spans_fn is None:
        raise ValueError("store_offsets needs spans_fn (or the default "
                         "full chain) — a terms_fn carries no offsets")
    return docs_with_ids.select(id_col, text_col).mapInPandas(
        build, schema=POS_SCHEMA)


def _decode_block(doc_blob: bytes, freq_blob: bytes,
                  pos_blob: bytes) -> tuple[np.ndarray, np.ndarray, list]:
    """-> (docs, freqs, per-doc absolute position arrays)."""
    docs = np.cumsum(vbyte_decode(doc_blob), dtype=np.uint64).astype(np.int64)
    freqs = vbyte_decode(freq_blob).astype(np.int64)
    gaps = vbyte_decode(pos_blob)
    starts = np.concatenate(([0], np.cumsum(freqs)))[:-1].astype(np.int64)
    # absolute positions from per-doc-reset gaps: global cumsum, then
    # subtract each doc's carry-in (the cumsum just before its start)
    cs = np.cumsum(gaps, dtype=np.uint64)
    carry = np.zeros(len(starts), dtype=np.uint64)
    carry[1:] = cs[starts[1:] - 1]
    abs_pos = (cs - np.repeat(carry, freqs)).astype(np.int64)
    return docs, freqs, np.split(abs_pos, np.cumsum(freqs)[:-1])


def _decode_offsets(ostart_blob: bytes, olen_blob: bytes,
                    freqs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (absolute starts, token lengths), flat, aligned with the
    block's position entries (starts are per-doc delta-encoded like
    positions)."""
    og = vbyte_decode(ostart_blob)
    ol = vbyte_decode(olen_blob).astype(np.int64)
    starts_idx = np.concatenate(([0], np.cumsum(freqs)))[:-1].astype(
        np.int64)
    cs = np.cumsum(og, dtype=np.uint64)
    carry = np.zeros(len(starts_idx), dtype=np.uint64)
    carry[1:] = cs[starts_idx[1:] - 1]
    abs_os = (cs - np.repeat(carry, freqs)).astype(np.int64)
    return abs_os, ol


def _phrase_terms(phrase: str) -> list[tuple[str, int]]:
    """(term, position) pairs of the analyzed phrase — stopword holes
    widen the required gap, exactly like Lucene's PhraseQuery with
    position increments."""
    out = []
    pos = -1
    for t in analyze(phrase):
        pos += t.pos_inc
        if t.pos_inc > 0 or not out:
            out.append((t.term, pos))
        # pos_inc==0 stacked tokens (WDGF originals/parts) — keep the
        # first at each position; phrase matching uses one term/position
    return out


def _sloppy_windows(plists: list[np.ndarray], slop: int) -> int:
    """Number of MINIMAL windows covering one occurrence of every term
    with span excess <= slop: a window [lo, hi] qualifies when
    (hi - lo) - (k - 1) <= slop (k = #distinct terms, order-free).
    This is SpanNearQuery(inOrder=false) semantics — the documented
    mapping for ``"..."~n`` (Lucene's classic SloppyPhraseScorer
    edit-distance accounting differs for reordered matches; the span
    interpretation is the one with a clean set-algebra definition).

    Classic two-pointer sweep over the merged (position, term) stream;
    a minimal window is counted when no left-shrink preserves
    coverage.  O(total positions) per doc."""
    k = len(plists)
    pos = np.concatenate(plists)
    tid = np.concatenate([np.full(p.size, i, dtype=np.int64)
                          for i, p in enumerate(plists)])
    order = np.argsort(pos, kind="stable")
    pos, tid = pos[order], tid[order]
    counts = np.zeros(k, dtype=np.int64)
    covered = 0
    left = 0
    n = 0
    for right in range(pos.size):
        t = tid[right]
        counts[t] += 1
        if counts[t] == 1:
            covered += 1
        if covered < k:
            continue
        # shrink to the minimal window ending at `right`
        while counts[tid[left]] > 1:
            counts[tid[left]] -= 1
            left += 1
        if (pos[right] - pos[left]) - (k - 1) <= slop:
            n += 1
        # drop the left endpoint so the next minimal window differs
        counts[tid[left]] -= 1
        covered -= 1
        left += 1
    return n


def phrase_match(pos_postings: DataFrame, phrase: str,
                 terms_fn=None, slop: int = 0) -> DataFrame:
    """Docs containing the phrase -> (doc_id, n_matches).

    ``slop=0`` (default): EXACT adjacency — per rbucket, decode the
    phrase terms' blocks, intersect doc sets, verify position alignment
    (p_i - p_0 == gap_i for some start p_0) with NumPy set
    intersections over the per-doc position arrays.

    ``slop>0``: span-near semantics (SpanNearQuery(inOrder=false)) —
    the doc matches when every DISTINCT phrase term occurs within a
    window whose span excess <= slop; n_matches counts minimal
    qualifying windows (_sloppy_windows).  Duplicate phrase terms
    collapse to one requirement and stopword holes don't widen the
    requirement in slop mode (documented divergences from Lucene's
    SloppyPhraseScorer; candidates agree for slop >= the classic
    measure).

    ``terms_fn`` must match the one the index was built with (None =
    full chain; a tokenizer function = sequential positions).
    """
    spark = pos_postings.sparkSession
    if terms_fn is not None:
        terms = [(t, i) for i, t in enumerate(terms_fn(phrase))]
    else:
        terms = _phrase_terms(phrase)
    if not terms:
        return spark.createDataFrame([], "doc_id long, n_matches int")
    if slop > 0:
        uterms = sorted({t for t, _ in terms})

        def sl_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            per_term: dict[str, dict[int, np.ndarray]] = {}
            for term, g in pdf.groupby("term"):
                dmap: dict[int, np.ndarray] = {}
                g = g.sort_values(["first_doc", "block_no"])
                for db, fb, pb in zip(g["doc_blob"], g["freq_blob"],
                                      g["pos_blob"]):
                    docs, _, plists = _decode_block(db, fb, pb)
                    for d, pl in zip(docs, plists):
                        dmap[int(d)] = pl
                per_term[term] = dmap
            if len(per_term) < len(uterms):
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "n_matches": pd.Series(dtype="int32")})
            first = min(per_term.values(), key=len)
            out = []
            for doc in first:
                pls = []
                ok = True
                for t in uterms:
                    pl = per_term[t].get(doc)
                    if pl is None:
                        ok = False
                        break
                    pls.append(pl)
                if not ok:
                    continue
                nm = _sloppy_windows(pls, slop)
                if nm:
                    out.append((doc, nm))
            return pd.DataFrame(out, columns=["doc_id", "n_matches"])

        matched = pos_postings.filter(F.col("term").isin(uterms))
        return (matched.groupBy("rbucket")
                .applyInPandas(lambda pdf: sl_bucket(pdf),
                               schema="doc_id long, n_matches int")
                .orderBy("doc_id"))
    base_pos = terms[0][1]
    gaps = [(t, p - base_pos) for t, p in terms]
    term_list = [t for t, _ in gaps]

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, dict[int, np.ndarray]] = {}
        for term, g in pdf.groupby("term"):
            dmap: dict[int, np.ndarray] = {}
            g = g.sort_values("block_no")
            for db, fb, pb in zip(g["doc_blob"], g["freq_blob"],
                                  g["pos_blob"]):
                docs, _, plists = _decode_block(db, fb, pb)
                for d, pl in zip(docs, plists):
                    dmap[int(d)] = pl
            per_term[term] = dmap
        first = per_term.get(term_list[0], {})
        out = []
        for doc, starts in first.items():
            cand = starts
            ok = True
            for term, gap in gaps[1:]:
                plist = per_term.get(term, {}).get(doc)
                if plist is None:
                    ok = False
                    break
                cand = cand[np.isin(cand + gap, plist)]
                if cand.size == 0:
                    ok = False
                    break
            if ok and cand.size:
                out.append((doc, int(cand.size)))
        return pd.DataFrame(out, columns=["doc_id", "n_matches"])

    matched = pos_postings.filter(F.col("term").isin(term_list))
    return (matched.groupBy("rbucket")
            .applyInPandas(lambda pdf: bucket(pdf),
                           schema="doc_id long, n_matches int")
            .orderBy("doc_id"))


def compact_positional(pos_postings: DataFrame,
                       target_positions: int = FLUSH_POSITIONS
                       ) -> DataFrame:
    """Segment compaction for the positional index — the same
    TieredMergePolicy role as postings.compact_postings, over the .pos
    layout: distributed packing of adjacent doc-range buckets into
    ~``target_positions``-position groups (postings.pack_bucket_groups
    — no full driver collect), then one applyInPandas pass per group
    that decodes each term's blocks, concatenates docs/freqs/positions
    (re-sorting if bucket doc ranges interleave), and re-encodes
    through _pos_block_rows.  Phrase/first_match results are
    bit-identical; only the physical layout changes."""
    from .postings import pack_bucket_groups

    stats = pos_postings.groupBy("rbucket").agg(
        F.min("first_doc").alias("lo"), F.sum("sum_tf").alias("w"))
    mapping = pack_bucket_groups(stats, target_positions)

    def compact_group(pdf: pd.DataFrame) -> pd.DataFrame:
        gid_v = int(pdf["_gid"].iloc[0])
        has_off = ("ostart_blob" in pdf.columns
                   and pdf["ostart_blob"].iloc[0] is not None)
        terms, offsets = [], [0]
        d_parts, f_parts, p_parts = [], [], []
        os_parts, ol_parts = [], []
        total = 0
        for term, g in pdf.groupby("term", sort=True):
            g = g.sort_values("first_doc")
            t_docs, t_freqs, t_plists = [], [], []
            t_oslices, t_olslices = [], []
            for _, row in g.iterrows():
                docs, freqs, plists = _decode_block(
                    row["doc_blob"], row["freq_blob"], row["pos_blob"])
                t_docs.append(docs)
                t_freqs.append(freqs)
                t_plists.extend(plists)
                if has_off:
                    abs_os, ol = _decode_offsets(
                        row["ostart_blob"], row["olen_blob"], freqs)
                    bounds = np.cumsum(freqs)[:-1]
                    t_oslices.extend(np.split(abs_os, bounds))
                    t_olslices.extend(np.split(ol, bounds))
            docs_t = np.concatenate(t_docs)
            freqs_t = np.concatenate(t_freqs)
            # doc-order guard (same as compact_postings): buckets are
            # doc-SET disjoint only — interleaved doc ranges across
            # flushes make first_doc-sorted concatenation non-monotonic
            # and the gap encode would wrap.  Re-sort docs and gather
            # each doc's position (and offset) slice along (the
            # builder's flush-guard pattern).
            if docs_t.size > 1 and not (docs_t[1:] >= docs_t[:-1]).all():
                order = np.argsort(docs_t, kind="stable")
                docs_t = docs_t[order]
                freqs_t = freqs_t[order]
                t_plists = [t_plists[j] for j in order]
                if has_off:
                    t_oslices = [t_oslices[j] for j in order]
                    t_olslices = [t_olslices[j] for j in order]
            d_parts.append(docs_t.astype(np.uint64))
            f_parts.append(freqs_t.astype(np.uint64))
            p_parts.append(np.concatenate(t_plists).astype(np.uint64)
                           if t_plists else np.empty(0, dtype=np.uint64))
            if has_off:
                os_parts.append(
                    np.concatenate(t_oslices).astype(np.uint64)
                    if t_oslices else np.empty(0, dtype=np.uint64))
                ol_parts.append(
                    np.concatenate(t_olslices).astype(np.uint64)
                    if t_olslices else np.empty(0, dtype=np.uint64))
            total += docs_t.size
            terms.append(term)
            offsets.append(total)
        return _pos_block_rows(
            terms, np.asarray(offsets, dtype=np.int64),
            np.concatenate(d_parts), np.concatenate(f_parts),
            np.concatenate(p_parts), gid_v,
            np.concatenate(os_parts) if has_off else None,
            np.concatenate(ol_parts) if has_off else None)

    return (pos_postings.join(F.broadcast(mapping), "rbucket")
            .groupBy("_gid")
            .applyInPandas(compact_group, schema=POS_SCHEMA))


def first_match_span(pos_postings: DataFrame,
                     terms: list[str]) -> DataFrame:
    """Earliest occurrence of ANY of ``terms`` per matching doc WITH its
    char offsets -> (doc_id, first_pos, start, end) — real highlighter
    anchors (requires an index built with ``store_offsets=True``; raises
    on one without offsets).  Per rbucket: each (term, doc) run's first
    entry is its earliest position (runs ascend); min-reduce across
    terms by (position, start)."""
    spark = pos_postings.sparkSession
    uterms = sorted(set(terms))
    schema = "doc_id long, first_pos long, start long, end long"
    if not uterms:
        return spark.createDataFrame([], schema)

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "first_pos": [], "start": [], "end": []}
        for _, r in pdf.iterrows():
            if r["ostart_blob"] is None:
                raise ValueError(
                    "first_match_span needs an offsets index "
                    "(positional_postings(store_offsets=True))")
            # one VByte decode per blob: each doc's FIRST entry is its
            # run start (per-doc gap reset makes the first gap the
            # absolute value — no cumsum/carry or per-doc split needed
            # in this serving path; review fix)
            docs = np.cumsum(vbyte_decode(r["doc_blob"]),
                             dtype=np.uint64).astype(np.int64)
            freqs = vbyte_decode(r["freq_blob"]).astype(np.int64)
            starts_idx = np.concatenate(
                ([0], np.cumsum(freqs)))[:-1].astype(np.int64)
            firsts = vbyte_decode(r["pos_blob"])[starts_idx] \
                .astype(np.int64)
            ostarts = vbyte_decode(r["ostart_blob"])[starts_idx] \
                .astype(np.int64)
            olens = vbyte_decode(r["olen_blob"])[starts_idx] \
                .astype(np.int64)
            rows["doc_id"].append(docs)
            rows["first_pos"].append(firsts)
            rows["start"].append(ostarts)
            rows["end"].append(ostarts + olens)
        if not rows["doc_id"]:
            return pd.DataFrame({k: pd.Series(dtype="int64")
                                 for k in rows})
        df = pd.DataFrame({k: np.concatenate(v)
                           for k, v in rows.items()})
        # earliest position per doc; starts break position ties
        df = df.sort_values(["doc_id", "first_pos", "start"])
        return df.groupby("doc_id", as_index=False).first()

    matched = pos_postings.filter(F.col("term").isin(uterms))
    return matched.groupBy("rbucket").applyInPandas(bucket, schema=schema)


def first_match(pos_postings: DataFrame, terms: list[str]) -> DataFrame:
    """Earliest position of ANY of ``terms`` per matching doc ->
    (doc_id, first_pos) — the highlighter's anchor (Lucene's highlight
    package finds the first scoring passage; this engine stores
    positions, not char offsets, so the anchor is a token position and
    the snippet is sliced from the token array relationally — see
    engine/queries highlight paths).

    Per rbucket: decode only the query terms' blocks; a doc's first
    position per term is the first entry of its position run (positions
    are ascending by construction), min-reduced across terms with one
    groupby — no per-doc Python loops over position lists."""
    spark = pos_postings.sparkSession
    uterms = sorted(set(terms))
    if not uterms:
        return spark.createDataFrame([], "doc_id long, first_pos long")

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        all_docs, all_firsts = [], []
        for db, fb, pb in zip(pdf["doc_blob"], pdf["freq_blob"],
                              pdf["pos_blob"]):
            docs = np.cumsum(vbyte_decode(db),
                             dtype=np.uint64).astype(np.int64)
            freqs = vbyte_decode(fb).astype(np.int64)
            gaps = vbyte_decode(pb)
            starts = np.concatenate(
                ([0], np.cumsum(freqs)))[:-1].astype(np.int64)
            cs = np.cumsum(gaps, dtype=np.uint64)
            carry = np.zeros(len(starts), dtype=np.uint64)
            carry[1:] = cs[starts[1:] - 1]
            # first position of each doc = absolute position at its
            # run start (runs are ascending; no split needed)
            firsts = (cs[starts] - carry).astype(np.int64)
            all_docs.append(docs)
            all_firsts.append(firsts)
        if not all_docs:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "first_pos": pd.Series(dtype="int64")})
        return (pd.DataFrame({"doc_id": np.concatenate(all_docs),
                              "first_pos": np.concatenate(all_firsts)})
                .groupby("doc_id", as_index=False)["first_pos"].min())

    matched = pos_postings.filter(F.col("term").isin(uterms))
    return matched.groupBy("rbucket").applyInPandas(
        bucket, schema="doc_id long, first_pos long")
