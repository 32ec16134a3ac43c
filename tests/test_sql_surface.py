"""spark.sql surface: the analysis chain as registered SQL functions."""

import pyspark.sql.functions as F

from php_lucene_analyzer_spark.functions.sql import register_sql_functions


def test_sql_functions_match_python_chain(spark, docs):
    from php_lucene_analyzer_spark.analysis.chain import analyze_terms

    names = register_sql_functions(spark)
    assert names == ["plas_stem", "plas_terms", "plas_tokens"]

    row = spark.sql(
        "SELECT plas_terms('The FastMergeJoin runs quickly') AS t, "
        "plas_stem('running') AS s").collect()[0]
    assert row["t"] == analyze_terms("The FastMergeJoin runs quickly")
    assert row["s"] == "run"

    toks = spark.sql(
        "SELECT inline(plas_tokens('O''Neil''s SD500'))").collect()
    assert [t["term"] for t in toks][:2] and all(
        t["end"] >= t["start"] for t in toks)

    # a pure-SQL tf query over a real table == the Python-API tf
    docs.createOrReplaceTempView("sqldocs")
    got = spark.sql("""
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, explode(plas_terms(text)) AS term
              FROM sqldocs)
        GROUP BY doc_id, term""")
    from php_lucene_analyzer_spark.operators.fulltext import term_doc_freqs
    want = term_doc_freqs(docs, "doc_id", "text").select(
        "doc_id", "term", "tf")
    a = {(r["doc_id"], r["term"]): r["tf"] for r in got.collect()}
    b = {(r["doc_id"], r["term"]): r["tf"] for r in want.collect()}
    assert a == b and a
