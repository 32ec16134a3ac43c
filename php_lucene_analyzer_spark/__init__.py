"""php_lucene_analyzer_spark — a PySpark-native fulltext engine.

From-scratch reimplementation of the capabilities of
``gilberg-vrn/php-lucene-analyzer`` (a pure-PHP port of the Apache Lucene
analyzer stack) plus the inverted-index build + BM25 query engine the
north rule requires, expressed Spark-first:

* analysis chain (UAX#29 tokenizer -> word-delimiter-graph -> lowercase ->
  stop -> Porter2 stem) as ONE fused, Arrow-vectorized pandas UDF
  (``analysis/``) — semantics per the reference, NOT a code port
  (reference: /root/reference/src/analyses/*.php, cited per-module);
* index build: deterministic doc ids, map-side term-frequency
  pre-aggregation, salted shuffle keyed by term for Zipf skew,
  delta-gap + VByte posting blocks with block-max metadata
  (``operators/postings.py``, ``functions/codec.py``);
* BM25 scoring (Lucene formula) exhaustively and via block-max WAND
  (``operators/bm25.py``, ``operators/wand.py``);
* training-data pipeline ops: exact/MinHash/SimHash dedup, ANN cosine
  top-k, language-ID / quality / fingerprint text analysis
  (``operators/dedup.py``, ``operators/ann.py``, ``operators/textstats.py``).

Everything is DataFrame-first; Python work happens only inside
Arrow-batched pandas UDFs (no per-row ``F.udf`` anywhere).
"""

__version__ = "0.1.0"
