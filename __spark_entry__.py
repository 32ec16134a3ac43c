"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship: full Lucene-parity analysis chain -> posting
                 blocks -> block-max WAND BM25 top-10, on sf0.001.
``queries``    — operator coverage per SURVEY.md §2; each callable takes
                 (spark, sf_dir) and returns a DataFrame.
``oracle_sql`` — DuckDB-runnable ANSI SQL equivalents (same column names,
                 types aligned, floats rounded at the contract boundary).

Entries present in ``queries`` but not ``oracle_sql`` are the genuinely
non-SQL-expressible ones (the full analyzer chain + WAND engine — its SQL
oracle cannot tokenize with WDGF/Porter2); those are validated instead by
golden vectors and a pure-pandas oracle in tests/ (rows-only check here).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

FLAGSHIP_QUERY = "fast merge join order"


def _fullchain_wand(spark: SparkSession, sf_dir: str,
                    queries: dict[str, str]) -> DataFrame:
    """Full-chain engine: analyze -> postings -> WAND topk per query."""
    from php_lucene_analyzer_spark.operators import fulltext as ft
    from php_lucene_analyzer_spark.operators.postings import build_postings
    from php_lucene_analyzer_spark.operators.wand import wand_topk_many

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tdf = ft.term_doc_freqs(docs, "doc_id", "text").cache()
    n, avgdl = ft.corpus_stats(tdf)
    tstats = ft.term_stats(tdf).cache()
    postings = build_postings(tdf).cache()
    # whole query set in ONE Spark job (bit-identical to per-query WAND);
    # materialize, then UNPERSIST the build caches — the driver calls
    # these entries repeatedly and each call mints fresh plans, so
    # leaked caches would accumulate until eviction thrash
    res = wand_topk_many(postings, tstats, n, avgdl, queries, k=10)
    rows = res.collect()
    schema = res.schema
    for df in (tdf, tstats, postings):
        df.unpersist()
    return spark.createDataFrame(rows, schema)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _fullchain_wand(spark, "/root/testdata/sf0.001",
                           {"flagship": FLAGSHIP_QUERY})


def _wand_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fullchain_wand(spark, sf_dir, {
        "w1": FLAGSHIP_QUERY,
        "w2": "the spark stream batch",
        "w3": "window sort vector",
    })


def _phrase_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase matching over the positional index (full-chain
    positions incl. stopword holes — not SQL-expressible; verified
    against a brute-force position oracle in tests/test_positional.py)."""
    import pyspark.sql.functions as F

    from php_lucene_analyzer_spark.operators.positional import (
        phrase_match, positional_postings)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pos = positional_postings(
        docs.repartitionByRange(4, "doc_id"), "doc_id", "text").cache()
    out = None
    for qid, phrase in (("p1", "merge join"), ("p2", "fast merge join"),
                        ("p3", "the spark stream")):
        m = phrase_match(pos, phrase).select(
            F.lit(qid).alias("qid"), "doc_id", "n_matches")
        out = m if out is None else out.unionAll(m)
    # materialize + free the positional cache (same leak shape as
    # _fullchain_wand: the driver invokes this repeatedly)
    rows = out.collect()
    schema = out.schema
    pos.unpersist()
    return spark.createDataFrame(rows, schema)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from php_lucene_analyzer_spark.queries import QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(QUERIES)
    out["wand_fullchain"] = _wand_suite  # rows-only: non-SQL-expressible
    out["phrase_match"] = _phrase_suite  # rows-only: non-SQL-expressible
    return out


def oracle_sql() -> dict[str, str]:
    from php_lucene_analyzer_spark.oracles import ORACLES

    return dict(ORACLES)
