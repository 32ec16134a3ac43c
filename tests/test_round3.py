"""Round-3 hardening tests (VERDICT r2 items 2-7 + ADVICE):

* no driver-side collect inside any contract query body;
* repeated dedup/phrase operator calls leak no persistent storage
  (the .cache()-without-unpersist class);
* FulltextIndex.close() releases every build cache;
* adaptive dense_rank_ids: windowed small path == two-phase ids;
* IVF build/query split: one assignment reused, deterministic
  corpus-wide sample, empty-corpus guard;
* vectorized language_id == the scalar reference implementation;
* FulltextIndex.load verifies the positional format header.
"""

import gc
import inspect
import time

import pytest

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------- contract-query hygiene

def test_no_collect_in_contract_query_bodies():
    """A .collect() inside a contract query is a driver-side scale
    killer (VERDICT r2 item 2) — the whole suite must return lazy
    DataFrames.  Source-level check over every QUERIES entry."""
    from php_lucene_analyzer_spark import queries as qmod

    for name, fn in qmod.QUERIES.items():
        src = inspect.getsource(fn)
        assert ".collect(" not in src, \
            f"contract query {name} collects to the driver"
        assert ".toPandas(" not in src, \
            f"contract query {name} collects to the driver (toPandas)"


# ------------------------------------------------------- storage hygiene

def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _wait_for_release(spark, baseline: int, timeout: float = 30.0) -> int:
    """localCheckpoint RDDs are GC-released by the ContextCleaner —
    asynchronously.  Poke both GCs and poll."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        if _persistent_rdd_count(spark) <= baseline:
            return _persistent_rdd_count(spark)
        time.sleep(0.5)
    return _persistent_rdd_count(spark)


@pytest.mark.parametrize("op", ["minhash", "simhash", "phrase"])
def test_repeated_calls_leak_no_storage(spark, op):
    """Each operator called twice; after dropping the results, persistent
    storage returns to baseline (VERDICT r2 item 3 — the .cache() leak
    accumulated until eviction thrash)."""
    from php_lucene_analyzer_spark.operators import dedup
    from php_lucene_analyzer_spark.queries import q_phrase_match

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < 120)

    def run():
        if op == "minhash":
            return dedup.minhash_lsh_pairs(docs, n_hashes=16,
                                           bands=4).collect()
        if op == "simhash":
            return dedup.simhash_near_dups(docs).collect()
        return q_phrase_match(spark, SF_DIR).collect()

    baseline = _wait_for_release(spark, 0, timeout=10.0)
    r1 = run()
    r2 = run()
    assert r1 is not None and r2 is not None
    # ContextCleaner releases checkpointed RDDs asynchronously; under a
    # loaded full-suite session the 30s default window is marginal —
    # poll longer before declaring a leak (the REAL leak this guards
    # against never releases, so a longer window cannot mask it)
    after = _wait_for_release(spark, baseline, timeout=120.0)
    assert after <= baseline, \
        f"{op}: persistent RDDs grew {baseline} -> {after} after 2 calls"


def test_fulltext_index_close_releases_caches(spark):
    from pyspark import StorageLevel

    from php_lucene_analyzer_spark.corpus import synthetic_corpus
    from php_lucene_analyzer_spark.engine import FulltextIndex

    docs = synthetic_corpus(spark, 80, partitions=2)
    idx = FulltextIndex.build(spark, docs, ["repo", "path"],
                              positional=True)
    assert idx.search("parse token", k=3).collect() is not None
    cached = list(idx._cached)
    assert cached and all(df.storageLevel != StorageLevel.NONE
                          for df in cached)
    idx.close()
    assert all(df.storageLevel == StorageLevel.NONE for df in cached)
    idx.close()  # idempotent

    # context-manager form
    with FulltextIndex.build(spark, docs, ["repo", "path"]) as idx2:
        held = list(idx2._cached)
        assert held
    assert all(df.storageLevel == StorageLevel.NONE for df in held)


# ------------------------------------------------- adaptive dense ranks

def test_dense_rank_adaptive_ids_identical(spark):
    """Below small_threshold the windowed path must produce EXACTLY the
    ids of the two-phase path (both are the global rank of the key)."""
    from php_lucene_analyzer_spark.corpus import synthetic_corpus
    from php_lucene_analyzer_spark.operators.fulltext import dense_rank_ids

    df = synthetic_corpus(spark, 150, partitions=3).select("repo", "path")
    two_phase = {(r["repo"], r["path"]): r["xid"]
                 for r in dense_rank_ids(df, ["repo", "path"],
                                         "xid", start=7).collect()}
    windowed = {(r["repo"], r["path"]): r["xid"]
                for r in dense_rank_ids(df, ["repo", "path"], "xid",
                                        start=7, precache=True,
                                        small_threshold=10**9).collect()}
    assert windowed == two_phase

    # above the threshold the scale-safe two-phase plan runs (no
    # single-partition exchange)
    big = dense_rank_ids(df, ["repo", "path"], "xid", small_threshold=10)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_term_dict_small_path_still_orderly(spark):
    """q_term_dict (adaptive) keeps dense 1-based ids in term order."""
    from php_lucene_analyzer_spark.queries import q_term_dict

    rows = sorted(q_term_dict(spark, SF_DIR).collect(),
                  key=lambda r: r["term_id"])
    assert [r["term_id"] for r in rows] == list(range(1, len(rows) + 1))
    terms = [r["term"] for r in rows]
    assert terms == sorted(terms)


# --------------------------------------------------------- IVF lifecycle

def test_ivf_build_query_split(spark):
    from php_lucene_analyzer_spark.operators import ann

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)

    idx = ann.ivf_build(emb, nlist=8)
    assert idx is not None
    r1 = ann.ivf_query(idx, queries, k=5, nprobe=8).collect()
    r2 = ann.ivf_query(idx, queries, k=5, nprobe=8).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]

    # the assignment table is built once per index (localCheckpoint):
    # the query plan scans an RDD, it does not re-run the k-means/assign
    plan = idx.with_lists._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan \
        or "Checkpoint" in plan

    # deterministic: rebuilding yields identical centroids (the sample is
    # hash-ordered corpus-wide, not first-partitions)
    import numpy as np
    idx2 = ann.ivf_build(emb, nlist=8)
    assert np.array_equal(idx.centroids, idx2.centroids)

    # nprobe=nlist == exact (unchanged recall contract)
    exact = ann.cosine_topk(emb, queries, k=5).collect()
    assert [(r["qid"], r["rank"], r["vec_id"]) for r in r1] \
        == [(r["qid"], r["rank"], r["vec_id"]) for r in exact]


def test_ivf_empty_corpus(spark):
    from php_lucene_analyzer_spark.operators import ann

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>")
    assert ann.ivf_build(empty) is None
    out = ann.ivf_cosine_topk(empty, empty, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] \
        == ["qid", "rank", "vec_id", "cosine"]


# ------------------------------------------------- language_id vectorized

def _language_id_scalar(text):
    """The pre-round-3 per-char/per-trigram scalar form — kept here as
    the reference for the vectorized implementation."""
    from php_lucene_analyzer_spark.operators.textstats import _PROFILES

    t = (text or "").lower()
    if not t:
        return ("und", 0.0)
    cjk = sum(1 for c in t if 0x4E00 <= ord(c) <= 0x9FFF)
    cyr = sum(1 for c in t if 0x0400 <= ord(c) <= 0x04FF)
    if cjk > len(t) * 0.2:
        return ("zh", round(cjk / len(t), 4))
    if cyr > len(t) * 0.2:
        return ("ru", round(cyr / len(t), 4))
    tri = [t[i:i + 3] for i in range(len(t) - 2)]
    best, bs = "und", 0.0
    n = max(len(tri), 1)
    for lang, prof in _PROFILES.items():
        s = sum(tri.count(p) for p in prof) / n
        if s > bs:
            best, bs = lang, s
    return (best if bs > 0 else "und", round(bs, 4))


def test_language_id_vectorized_matches_scalar(spark):
    from php_lucene_analyzer_spark.operators.textstats import language_id

    rows = [
        (0, "the quick brown fox jumping over the lazy dog again and again"),
        (1, "que los con para ado ción entre nada ado que los"),
        (2, "der ein ich schauen und die che gen der ein"),
        (3, "хороший русский текст про поиск и индексы " * 3),
        (4, "这是一个中文测试文档内容很多" * 3),
        (5, ""),
        (6, None),
        (7, "xy"),                      # shorter than a trigram
        (8, "zzzz qqqq wwww vvvv"),     # no profile hits -> und
        (9, "les des eur ait our ion ent que"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["lang_guess"], r["lang_score"])
           for r in language_id(docs, "doc_id", "text").collect()}
    for did, text in rows:
        assert got[did] == _language_id_scalar(text), \
            f"doc {did}: {got[did]} != {_language_id_scalar(text)}"


# -------------------------------------------------- positional header

def test_load_checks_positional_header(spark, tmp_path):
    import os

    from php_lucene_analyzer_spark.corpus import synthetic_corpus
    from php_lucene_analyzer_spark.engine import FulltextIndex
    from php_lucene_analyzer_spark.functions.header import FormatError

    docs = synthetic_corpus(spark, 60, partitions=2)
    with FulltextIndex.build(spark, docs, ["repo", "path"],
                             positional=True) as idx:
        path = str(tmp_path / "idx")
        idx.save(path)
    os.remove(os.path.join(path, "positional", "_FORMAT.json"))
    with pytest.raises(FormatError):
        FulltextIndex.load(spark, path)
