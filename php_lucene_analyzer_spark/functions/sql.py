"""SQL surface: register the analysis chain as Spark SQL functions so
``spark.sql`` users can call the engine without the Python API — the
"complete standalone repo" contract (a reference user writes SELECTs).

    from php_lucene_analyzer_spark.functions.sql import register_sql_functions
    register_sql_functions(spark)
    spark.sql("SELECT doc_id, explode(plas_terms(text)) AS term FROM docs")

All functions are Arrow-batched pandas UDFs (no per-row Python), reusing
the memoized chain (analysis/chain.py).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import SparkSession

from ..analysis.chain import TOKEN_SCHEMA, _analyze_series, analyze_terms
from ..analysis.porter2 import stem


def _terms_series(texts: pd.Series) -> pd.Series:
    return pd.Series([analyze_terms(t or "") for t in texts])


def _stem_series(words: pd.Series) -> pd.Series:
    return pd.Series([stem(w or "") for w in words])


def register_sql_functions(spark: SparkSession,
                           prefix: str = "plas") -> list[str]:
    """Register the chain under ``<prefix>_*``; returns the names.

    * ``<prefix>_terms(text) -> array<string>`` — final analyzed terms
      (tokenize -> WDGF -> lower -> stop -> Porter2), the indexing stream;
    * ``<prefix>_tokens(text) -> array<struct<term,start,end,pos,...>>``
      — the full token graph with offsets/positions;
    * ``<prefix>_stem(word) -> string`` — Porter2 of one token.
    """
    names = {
        f"{prefix}_terms": F.pandas_udf(
            _terms_series, T.ArrayType(T.StringType())),
        f"{prefix}_tokens": F.pandas_udf(_analyze_series, TOKEN_SCHEMA),
        f"{prefix}_stem": F.pandas_udf(_stem_series, T.StringType()),
    }
    for name, udf in names.items():
        spark.udf.register(name, udf)
    return sorted(names)
