"""Iceberg-backed index storage (sources/iceberg.py).

The runtime jars are not in this image, so the integration test runs
ONLY when ``iceberg_available`` is true (e.g. pytest under a session
launched with --packages org.apache.iceberg:iceberg-spark-runtime-*);
otherwise it SKIPS — the directory-protocol tests
(tests/test_resume_streaming.py) cover the same contract on parquet.
The pure-Python pieces (chunk math, lineage schema, snapshot-read
option plumbing) are asserted unconditionally."""

import tempfile

import pytest

from php_lucene_analyzer_spark.sources.iceberg import (
    IcebergResumableIndexBuild, LINEAGE_COLS, ensure_hadoop_catalog)
from php_lucene_analyzer_spark.sources.tables import iceberg_available


def test_probe_and_guard(spark):
    """Without the runtime, the catalog helper must refuse loudly (not
    half-configure a session)."""
    if iceberg_available(spark):
        pytest.skip("runtime present; covered by the integration test")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        ensure_hadoop_catalog(spark, "plas", "/tmp/nowhere")


def test_lineage_schema_superset_of_directory_protocol():
    """The Iceberg lineage carries everything the directory protocol's
    rows carry (minus storage-specific bytes) PLUS the snapshot id that
    scopes resume reads."""
    cols = [c.split()[0] for c in LINEAGE_COLS.split(", ")]
    assert cols == ["chunk", "first_doc", "last_doc", "n_docs",
                    "snapshot_id", "wall_sec", "finished_at"]


@pytest.mark.skipif("not config.getoption('--run-iceberg', default=False)",
                    reason="needs iceberg-spark-runtime on the classpath")
def test_iceberg_resumable_build_roundtrip(spark):
    """Runs iff the session has the Iceberg runtime: chunked build into
    an Iceberg table, kill/resume skips committed chunks, snapshot-pinned
    reads see the pre-crash state."""
    from php_lucene_analyzer_spark.corpus import synthetic_corpus

    assert iceberg_available(spark)
    with tempfile.TemporaryDirectory() as wh:
        ensure_hadoop_catalog(spark, "plas", wh)
        docs = synthetic_corpus(spark, 120, partitions=2)
        b = IcebergResumableIndexBuild(spark, "plas", "db", chunk_docs=50)
        with pytest.raises(RuntimeError, match="injected crash"):
            b.run(docs, ["repo", "path"], fail_after_chunks=1)
        done_before = b.completed_chunks()
        assert done_before == {0}
        sid = int(b.lineage().collect()[0]["snapshot_id"])
        pinned = b.postings(snapshot_id=sid).count()
        full = b.run(docs, ["repo", "path"])
        assert b.completed_chunks() == {0, 1, 2}
        assert full.count() > pinned  # later chunks invisible to the pin
        assert b.postings(snapshot_id=sid).count() == pinned


@pytest.mark.skipif("not config.getoption('--run-iceberg', default=False)",
                    reason="needs iceberg-spark-runtime on the classpath")
def test_iceberg_resume_idempotent_across_orphan_window(spark):
    """A crash BETWEEN the postings append and its lineage append leaves
    an orphan snapshot; resume must roll it back and re-run the chunk
    exactly once (no duplicate posting blocks — duplicates would inflate
    df/tf and WAND scores)."""
    import tempfile as tf

    from php_lucene_analyzer_spark.corpus import synthetic_corpus

    assert iceberg_available(spark)
    with tf.TemporaryDirectory() as wh:
        ensure_hadoop_catalog(spark, "plas2", wh)
        docs = synthetic_corpus(spark, 120, partitions=2)
        b = IcebergResumableIndexBuild(spark, "plas2", "db", chunk_docs=50)
        # crash in the orphan window of chunk 1 (chunk 0 commits fully)
        with pytest.raises(RuntimeError, match="between appends"):
            b.run(docs, ["repo", "path"], fail_between_appends=2)
        assert b.completed_chunks() == {0}
        orphaned = b.postings().count()  # chunk 1's orphan rows visible
        full = b.run(docs, ["repo", "path"]).collect()
        assert b.completed_chunks() == {0, 1, 2}
        # every (term, rbucket, block_no) key appears exactly once
        from collections import Counter
        keys = Counter((r["term"], r["rbucket"], r["block_no"])
                       for r in full)
        assert keys and max(keys.values()) == 1, \
            "duplicate posting blocks after orphan-window resume"
        assert len(keys) >= orphaned - 50  # sanity: index is complete

        # crash in chunk 0's window (no lineage at all) -> delete-all path
        b2 = IcebergResumableIndexBuild(spark, "plas2", "db0",
                                        chunk_docs=200)
        with pytest.raises(RuntimeError, match="between appends"):
            b2.run(docs, ["repo", "path"], fail_between_appends=1)
        full2 = b2.run(docs, ["repo", "path"]).collect()
        keys2 = Counter((r["term"], r["rbucket"], r["block_no"])
                        for r in full2)
        assert keys2 and max(keys2.values()) == 1
