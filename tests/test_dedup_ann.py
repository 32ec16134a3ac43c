"""Dedup (exact / MinHash-LSH / SimHash), ANN, multimodal plumbing, and
text-analysis operator tests."""

import pytest

import pyspark.sql.functions as F

from php_lucene_analyzer_spark.operators import ann, dedup, multimodal, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddocs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # add exact + near duplicates with known ids
    src = base.filter(F.col("doc_id") < 50).select("doc_id", "text")
    exact = src.filter(F.col("doc_id") < 10) \
        .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    near = src.filter(F.col("doc_id") < 10) \
        .select((F.col("doc_id") + 20000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" extra tail token")).alias("text"))
    return src.unionAll(exact).unionAll(near).cache()


def test_exact_dedup(spark, ddocs):
    res = dedup.exact_dedup(ddocs, "doc_id", "text")
    m = {r["doc_id"]: r["keeper"] for r in res.collect()}
    for i in range(10):
        assert m[i + 10000] == i  # exact copy resolves to the original
        assert m[i] == i
    assert m[20001] == 20001  # near-dup is NOT an exact dup


def test_minhash_lsh_finds_near_dups(spark, ddocs):
    pairs = dedup.minhash_lsh_pairs(ddocs, "doc_id", "text",
                                    n_hashes=64, bands=16,
                                    min_jaccard=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # exact copies collide with estimated jaccard 1.0
    for i in range(10):
        assert (i, i + 10000) in found
    est = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs}
    for i in range(10):
        assert est[(i, i + 10000)] == 1.0
    # near duplicates (one appended token) are found with high est_jaccard
    near_found = sum(1 for i in range(10) if (i, i + 20000) in found)
    assert near_found >= 8


def test_simhash_near_dups(spark, ddocs):
    sh = dedup.simhash64(ddocs, "doc_id", "text").collect()
    by_id = {r["doc_id"]: r["simhash"] for r in sh}
    for i in range(10):
        assert by_id[i] == by_id[i + 10000]  # identical text -> same hash
    pairs = dedup.simhash_near_dups(ddocs, "doc_id", "text",
                                    max_hamming=3).collect()
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    for i in range(10):
        assert found[(i, i + 10000)] == 0


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_cosine_topk_matches_bruteforce(spark, emb):
    import numpy as np
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    queries = emb.filter(F.col("vec_id") < 3)
    got = ann.cosine_topk(emb, queries, k=5).collect()
    for qid in range(3):
        qv = m[ids == qid][0]
        sims = m @ qv
        sims[ids == qid] = -np.inf
        order = np.lexsort((ids, -sims))[:5]
        want = [int(ids[j]) for j in order]
        mine = [r["vec_id"] for r in got if r["qid"] == qid]
        assert mine == want


def test_lsh_ann_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    exact = ann.cosine_topk(emb, queries, k=5).collect()
    approx = ann.lsh_cosine_topk(emb, queries, k=5, bits=4,
                                 probe_flips=2).collect()
    ex = {(r["qid"], r["vec_id"]) for r in exact}
    ap = {(r["qid"], r["vec_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    # these embeddings are near-random (neighbors only mildly closer than
    # noise), the hardest case for sign sketches; 4 bits + 2-bit probes
    # scans ~11/16 buckets -> recall must clear 0.5
    assert recall >= 0.5, recall
    # and the candidates it does return are correctly ranked (exact rerank)
    ap_by_q = {}
    for r in approx:
        ap_by_q.setdefault(r["qid"], []).append((r["rank"], r["cosine"]))
    for q, rows in ap_by_q.items():
        ranks = [x[0] for x in sorted(rows)]
        assert ranks == list(range(1, len(ranks) + 1))


def test_multimodal_plumbing(spark):
    media = multimodal.synthetic_media(spark, 60, partitions=3)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["features"]
             for r in multimodal.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)
    # strict mode surfaces the stub boundary
    import php_lucene_analyzer_spark.operators.multimodal as mm
    if not mm._real_decoder_available():
        with pytest.raises(NotImplementedError):
            mm.extract_features(media, strict=True)
    plan = multimodal.frame_sample_plan(media, every_ms=500)
    assert plan.count() > 0


def test_textstats(spark, ddocs):
    lid = textstats.language_id(ddocs, "doc_id", "text").collect()
    assert all(r["lang_guess"] for r in lid)
    qs = textstats.quality_score(ddocs, "doc_id", "text").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in qs)
    tc = textstats.token_count(ddocs, "doc_id", "text").collect()
    assert all(r["token_budget"] >= r["ws_tokens"] for r in tc)
    fps = textstats.rolling_fingerprints(ddocs, "doc_id", "text")
    # identical docs share all fingerprints
    a = {r["fp"] for r in fps.filter(F.col("doc_id") == 5).collect()}
    b = {r["fp"] for r in fps.filter(F.col("doc_id") == 10005).collect()}
    assert a == b and len(a) > 0


def test_embedding_near_dups(spark, emb):
    import pyspark.sql.functions as F
    # plant near-duplicates: copy of vec 0-4 with tiny perturbation
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 90000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
        "label")
    both = emb.unionByName(planted)
    pairs = dedup.multi_table_embedding_near_dups(
        both, n_tables=4, min_cosine=0.99)
    found = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in pairs.collect()}
    hits = sum(1 for i in range(5) if (i, i + 90000) in found)
    assert hits >= 4  # multi-table LSH recall on near-identical vectors
    for (a, b), c in found.items():
        assert c >= 0.99


def test_minhash_short_docs_not_all_duplicates(spark):
    """Docs shorter than the shingle size must NOT share a sentinel
    signature: different short docs differ, identical short docs match,
    empty docs stay out of LSH entirely."""
    from php_lucene_analyzer_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_signatures)

    rows = [(1, "red car"), (2, "blue sky"), (3, "red car"),
            (4, ""), (5, None), (6, "completely different text here okay")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in
            minhash_signatures(docs, n_hashes=16, shingle_k=3).collect()}
    assert sigs[1] == sigs[3]          # identical short docs
    assert sigs[1] != sigs[2]          # different short docs
    assert sigs[4] == sigs[5] == tuple([-1] * 16)  # no-signature sentinel
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             minhash_lsh_pairs(docs, n_hashes=16, bands=4,
                               min_jaccard=0.9).collect()}
    assert pairs == {(1, 3)}           # only the true duplicate pair


def test_quality_score_unicode_mode(spark):
    """ascii_only=False scores clean non-Latin text as text, not as
    punctuation spam (the ASCII default tokenizes Cyrillic to nothing)."""
    rows = [(1, "хороший русский текст про поиск и индексы " * 4),
            (2, "a clean english document about search indexes " * 4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r["doc_id"]: r for r in
           textstats.quality_score(docs, "doc_id", "text",
                                   ascii_only=False).collect()}
    assert uni[1]["n_tokens"] > 10 and uni[1]["quality"] > 0.3
    assert uni[2]["quality"] > 0.3
    asc = {r["doc_id"]: r for r in
           textstats.quality_score(docs, "doc_id", "text").collect()}
    assert asc[1]["n_tokens"] == 0          # the documented ASCII limit
    assert asc[2]["quality"] == uni[2]["quality"]  # latin text unaffected


def test_ivf_ann_recall_and_scan_fraction(spark, emb):
    """IVF-flat: recall vs exact at nprobe=4/nlist=8 (the embeddings are
    near-random — the hard case), nprobe=nlist degenerates to exact, and
    the candidate scan is bounded by the probed lists."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = ann.cosine_topk(emb, queries, k=5).collect()
    ex = {(r["qid"], r["vec_id"]) for r in exact}

    approx = ann.ivf_cosine_topk(emb, queries, k=5, nlist=8,
                                 nprobe=4).collect()
    ap = {(r["qid"], r["vec_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, recall
    for r in approx:  # exact rerank inside candidates -> true cosines
        assert -1.0 <= r["cosine"] <= 1.0

    # probing EVERY list must reproduce the exact result set + order
    full = ann.ivf_cosine_topk(emb, queries, k=5, nlist=8,
                               nprobe=8).collect()
    assert [(r["qid"], r["rank"], r["vec_id"]) for r in full] \
        == [(r["qid"], r["rank"], r["vec_id"]) for r in exact]

    # assignment covers every vector exactly once, lists are bounded
    from php_lucene_analyzer_spark.operators.ann import _kmeans, ivf_assign
    import numpy as np
    sample = np.array([r[0] for r in emb.select("embedding").collect()],
                      dtype=np.float64)
    cent = _kmeans(sample, 8)
    assigned = ivf_assign(emb, cent)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    sizes = [r["c"] for r in assigned.groupBy("list_id")
             .agg(F.count("*").alias("c")).collect()]
    assert sum(sizes) == n and len(sizes) <= 8


def test_ngram_decontaminate(spark):
    """Docs sharing a word 13-gram with the benchmark are flagged with
    the distinct-collision count; clean docs are absent; the hashed
    variant agrees (collision-free at this scale)."""
    import pandas as pd
    from php_lucene_analyzer_spark.operators.dedup import (
        ngram_decontaminate)

    span = " ".join(f"w{i}" for i in range(13))          # one 13-gram
    bench = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0], "text": [f"intro {span} outro"]}))
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": [f"copied {span} tail",                  # contaminated
                 "totally different words " * 5,         # clean
                 span]}))                                # exact 13 tokens
    got = {r["doc_id"]: r["n_hits"]
           for r in ngram_decontaminate(docs, bench).collect()}
    assert got == {10: 1, 12: 1}
    hashed = {r["doc_id"]: r["n_hits"]
              for r in ngram_decontaminate(docs, bench,
                                           hash_shingles=True).collect()}
    assert hashed == got


def test_simhash_vectorized_equals_scalar_reference(spark, ddocs):
    """The batch-vocab vectorized simhash (np.add.at scatter, one digest
    per unique term) is bit-identical to the per-doc scalar definition."""
    import numpy as np

    from php_lucene_analyzer_spark.operators.dedup import (_md5_u64,
                                                           _stable_u64)

    for hasher, th in (("blake2b", _stable_u64), ("md5", _md5_u64)):
        got = {r["doc_id"]: r["simhash"] for r in
               dedup.simhash64(ddocs, "doc_id", "text",
                               hasher=hasher).collect()}
        for row in ddocs.collect():
            toks = (row["text"] or "").lower().split()
            if not toks:
                assert got[row["doc_id"]] == 0
                continue
            uniq, counts = np.unique(np.array(toks, dtype=object),
                                     return_counts=True)
            hs = np.fromiter((th(t.encode()) for t in uniq),
                             dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64))
                    & np.uint64(1)).astype(np.int64)
            acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            want = int(np.bitwise_or.reduce(
                (acc > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).astype(np.int64))
            assert got[row["doc_id"]] == want


def test_minhash_fold_equals_scalar_fold():
    """_fold_min_signatures == the legacy per-doc fold given the same
    base hashes (the vectorization changes no math, only the loop)."""
    import numpy as np

    from php_lucene_analyzer_spark.operators.dedup import \
        _fold_min_signatures

    rng = np.random.default_rng(7)
    lens = [0, 1, 5, 200, 0, 33]
    offsets = np.concatenate(([0], np.cumsum(lens)))
    flat = rng.integers(0, 2**63, size=int(offsets[-1]),
                        dtype=np.int64).astype(np.uint64)
    got = _fold_min_signatures(flat, offsets, 16)
    mults = (np.arange(1, 17, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1))
    for i in range(len(lens)):
        seg = flat[offsets[i]:offsets[i + 1]]
        for hi in range(16):
            if seg.size == 0:
                assert got[i, hi] == np.iinfo(np.uint64).max
            else:
                v = seg * mults[hi]
                v ^= v >> np.uint64(31)
                assert got[i, hi] == v.min()


def test_lsh_bucket_cap_bounds_boilerplate_skew(spark):
    """Planted boilerplate: 2000 identical docs form ONE hot bucket per
    band (O(m²) ~ 2M pairs per band uncapped).  With the cap the hot
    cluster contributes linear STAR candidates (each member paired to
    the anchor = min doc_id — the cluster stays connected instead of
    silently vanishing), the oversized buckets are enumerable via
    lsh_oversized_buckets, and true pairs in DISTINCT small buckets
    still surface."""
    import pyspark.sql.functions as F

    boiler = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.lit("licensed under the apache license version two point oh "
              "see the license file for details").alias("text"))
    real = spark.createDataFrame(
        [(100001, "completely unique text about spark window functions"),
         (100002, "completely unique text about spark window functions"),
         (100003, "unrelated document describing parquet row groups")],
        "doc_id long, text string")
    docs = boiler.unionAll(real)
    pairs = dedup.minhash_lsh_pairs(docs, n_hashes=16, bands=4,
                                    min_jaccard=0.9,
                                    max_bucket=100).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (100001, 100002) in found      # small buckets still pair
    # hot-cluster pairs are STAR-shaped (anchor 0), never all-pairs
    boiler = [(a, b) for a, b in found if a < 100000 and b < 100000]
    assert boiler and all(a == 0 for a, b in boiler)
    assert len(boiler) == 1999            # every member linked once
    # the drop is recorded, not silent
    sigs = dedup.minhash_signatures(docs, n_hashes=16)
    bands = 4
    rpb = 4
    band_cols = [
        F.struct(F.lit(bi).alias("band"),
                 F.xxhash64(*[F.col("sig")[bi * rpb + r]
                              for r in range(rpb)]).alias("bh"))
        for bi in range(bands)]
    buckets = (sigs.select("doc_id",
                           F.explode(F.array(*band_cols)).alias("b"))
               .select("doc_id", F.col("b.band").alias("band"),
                       F.col("b.bh").alias("bh")))
    over = dedup.lsh_oversized_buckets(buckets, ["band", "bh"], 100)
    rows = over.collect()
    assert rows and all(r["n"] == 2000 for r in rows)
    # uncapped (max_bucket=None) on the same input would enumerate
    # ~2000²/2 pairs per band — asserted structurally: the capped
    # candidate count stays LINEAR in the cluster size
    assert len(pairs) < 2100


def test_simhash_bucket_cap(spark):
    boiler = spark.range(1500).select(
        F.col("id").alias("doc_id"),
        F.lit("same boilerplate header everywhere forever").alias("text"))
    uniq = spark.createDataFrame(
        [(200001, "an actual document body with its own words"),
         (200002, "an actual document body with its own words")],
        "doc_id long, text string")
    pairs = dedup.simhash_near_dups(boiler.unionAll(uniq),
                                    max_hamming=3,
                                    max_bucket=100).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (200001, 200002) in found
    bpairs = [(a, b) for a, b in found if a < 200000 and b < 200000]
    assert bpairs and all(a == 0 for a, b in bpairs)   # star, not m²
    assert len(bpairs) == 1499


def test_minhash_oph_scheme_finds_planted_pairs(spark, ddocs):
    """One-permutation hashing (scheme="oph") detects the same planted
    exact/near duplicates as the k-fold scheme; exact copies still
    estimate jaccard 1.0 (identical shingle sets densify identically)."""
    pairs = dedup.minhash_lsh_pairs(ddocs, "doc_id", "text",
                                    n_hashes=64, bands=16,
                                    min_jaccard=0.5,
                                    scheme="oph").collect()
    found = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs}
    for i in range(10):
        assert found[(i, i + 10000)] == 1.0
    near = sum(1 for i in range(10) if (i, i + 20000) in found)
    assert near >= 8


def test_oph_signature_properties():
    """_oph_signatures: filled bins hold the true per-bin min; empty
    bins densify from the next non-empty bin (cyclic, xor-mixed);
    empty docs keep the sentinel."""
    import numpy as np

    from php_lucene_analyzer_spark.operators.dedup import _oph_signatures

    rng = np.random.default_rng(3)
    lens = [0, 2000, 3]
    offsets = np.concatenate(([0], np.cumsum(lens)))
    flat = rng.integers(0, 2**63, size=int(offsets[-1]),
                        dtype=np.int64).astype(np.uint64) << np.uint64(1)
    sig = _oph_signatures(flat, offsets, 16)
    assert (sig[0] == np.iinfo(np.uint64).max).all()
    # dense doc: every bin filled with the exact per-bin min
    seg = flat[offsets[1]:offsets[2]]
    bins = (seg >> np.uint64(60)).astype(np.int64)
    for b in range(16):
        vals = seg[bins == b]
        if vals.size:
            assert sig[1, b] == vals.min()
    # sparse doc (3 hashes): no sentinel survives densification
    assert (sig[2] != np.iinfo(np.uint64).max).all()


def test_simhash64_jvm_matches_python_reconstruction(spark):
    """simhash64_jvm (all-JVM scale path, r5): fingerprints equal a
    Python reconstruction from the same per-term xxhash64 values (the
    only Spark dependency in the reconstruction is xxhash64 itself),
    and empty/NULL docs fingerprint to 0."""
    import pyspark.sql.functions as F

    from php_lucene_analyzer_spark.operators.dedup import simhash64_jvm

    rows = [(0, "alpha beta alpha gamma"),
            (1, "beta beta delta"),
            (2, ""),
            (3, None),
            (4, "alpha beta alpha gamma"),     # dup of 0
            (5, "  spaced\tout\nwords  ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"]
           for r in simhash64_jvm(docs).collect()}

    vocab = sorted({t for _d, x in rows for t in (x or "").lower().split()})
    hs = {r["term"]: r["h"] & 0xFFFFFFFFFFFFFFFF for r in
          spark.createDataFrame([(t,) for t in vocab], "term string")
          .select("term", F.xxhash64("term").alias("h")).collect()}

    def fp(text):
        toks = (text or "").lower().split()
        if not toks:
            return 0
        acc = [0] * 64
        for t in toks:
            h = hs[t]
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        v = 0
        for b in range(64):
            if acc[b] > 0:
                v |= 1 << b
        return v - (1 << 64) if v >= 1 << 63 else v

    for d, text in rows:
        assert got[d] == fp(text), (d, got[d], fp(text))
    assert got[0] == got[4]
    assert got[2] == 0 and got[3] == 0


def test_simhash_near_dups_jvm_hasher(spark):
    from php_lucene_analyzer_spark.operators.dedup import simhash_near_dups

    rows = [(0, "the quick brown fox jumps over the lazy dog " * 5),
            (1, "the quick brown fox jumps over the lazy cat " * 5),
            (2, "completely different content about spark engines")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             simhash_near_dups(docs, max_hamming=12,
                               hasher="xxhash64").collect()}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
