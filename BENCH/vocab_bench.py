#!/usr/bin/env python
"""Vocabulary-scale microbench for term-id assignment (round-2 roadmap:
"distributed vocabulary handling past broadcast size").

Generates an N-term synthetic vocabulary entirely JVM-side (Catalyst
expressions, no Python row path) and times dense term-id assignment:

  windowed   — row_number() OVER (ORDER BY term): the textbook form; Spark
               plans it as a SINGLE-partition window, so one task sorts and
               ranks the whole vocabulary (the thing that cannot scale);
  two_phase  — fulltext.dense_rank_ids: range partition + local rank +
               driver prefix offsets (32 integers) — every stage parallel.

Run:  python BENCH/vocab_bench.py [N_TERMS] [CPUS]
Prints one JSON line; results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window


def synth_vocab(spark, n: int):
    # distinct terms by construction: hex of the id, prefixed; shuffled
    # ordering via a hash so the range partitioner actually samples
    return (spark.range(n)
            .select(F.concat(F.lit("t"),
                             F.lower(F.hex(F.xxhash64("id"))),
                             F.lpad(F.col("id").cast("string"), 12, "0")
                             ).alias("term"),
                    (F.xxhash64("id") % 1000).alias("df")))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from php_lucene_analyzer_spark.operators.fulltext import dense_rank_ids
    from php_lucene_analyzer_spark.session import get_spark

    spark = get_spark(app="vocab_bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    vocab = synth_vocab(spark, n).cache()
    vocab.count()  # materialize input off the clock

    t0 = time.time()
    two = dense_rank_ids(vocab, ["term"], "term_id", start=1)
    two_cnt = two.agg(F.max("term_id"), F.count("*")).collect()[0]
    t_two = time.time() - t0
    assert int(two_cnt[0]) == n == int(two_cnt[1]), two_cnt

    t0 = time.time()
    w = Window.orderBy("term")
    win = vocab.withColumn("term_id", F.row_number().over(w).cast("long"))
    win_cnt = win.agg(F.max("term_id"), F.count("*")).collect()[0]
    t_win = time.time() - t0
    assert int(win_cnt[0]) == n == int(win_cnt[1]), win_cnt

    print(json.dumps({
        "metric": "term_id_assignment",
        "n_terms": n, "cpus": cpus, "unit": "sec",
        "two_phase_sec": round(t_two, 2),
        "windowed_single_partition_sec": round(t_win, 2),
        "speedup": round(t_win / t_two, 2) if t_two else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
