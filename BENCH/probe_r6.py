#!/usr/bin/env python
"""Round-6 stage-isolation probes (guide §1.4: noop sink, labelled jobs).

Times the sub-stages of the heaviest sf1.0 queries so optimization
targets the measured cost, not the guessed one.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    from php_lucene_analyzer_spark.session import get_spark
    from php_lucene_analyzer_spark import queries as Q

    spark = get_spark(app="probe_r6")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out = {}

    def timed(name, fn, warm=True):
        sc.setJobDescription(name)
        if warm:
            fn()
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        print(name, out[name], flush=True)

    docs = Q._docs(spark, sf_dir)
    n_part = docs.rdd.getNumPartitions()
    print("docs partitions:", n_part, flush=True)

    # --- raw tokenize+explode cost (feeds tf/term_stats/bm25/boolean...)
    timed("tok_rows_noop", lambda: noop(Q._tok_rows(spark, sf_dir)))
    timed("tok_rows_repart_noop", lambda: noop(
        Q._docs(spark, sf_dir).repartition(32)
        .select("doc_id", F.explode(F.split(F.lower(F.col("text")),
                                            "[^a-z0-9]+")).alias("term"))
        .filter(F.col("term") != "")))

    # --- shingles (feeds minhash + lsh_pairs)
    timed("shingle_rows_noop", lambda: noop(Q._shingle_rows(spark, sf_dir)))

    # --- lsh_pairs stage split
    def lsh_sigs():
        sh = Q._shingle_rows(spark, sf_dir)
        sigs = (sh.groupBy("doc_id").agg(*[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"h{i}")
            for i in range(Q.LSH_N_HASHES)]))
        noop(sigs)
    timed("lsh_sigs_noop", lsh_sigs)
    timed("lsh_full_noop", lambda: noop(Q.q_lsh_pairs(spark, sf_dir)))

    # --- minhash (4 md5 mins)
    timed("minhash_noop", lambda: noop(Q.q_minhash(spark, sf_dir)))

    # --- decontaminate stage split
    from php_lucene_analyzer_spark.operators.dedup import ngram_decontaminate
    bench_docs = docs.filter(F.col("doc_id") < Q.DECONTAM_BENCH)
    corpus_docs = docs.filter(F.col("doc_id") >= Q.DECONTAM_BENCH)

    def corp_grams():
        toks = F.array_remove(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), "")
        t = F.col("_toks")
        n = Q.DECONTAM_N
        sh = F.when(
            F.size(t) >= n,
            F.transform(F.sequence(F.lit(0), F.size(t) - n),
                        lambda i: F.concat_ws(
                            " ", *[F.element_at(t, i + j + 1)
                                   for j in range(n)]))
        ).otherwise(F.array().cast("array<string>"))
        noop(corpus_docs.withColumn("_toks", toks)
             .select("doc_id", F.explode(sh).alias("s")))
    timed("decontam_corpus_grams_noop", corp_grams)
    timed("decontam_full_noop", lambda: noop(
        ngram_decontaminate(corpus_docs, bench_docs, n=Q.DECONTAM_N)))

    # --- events_json
    timed("events_json_noop", lambda: noop(Q.q_events_json(spark, sf_dir)))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    timed("events_json_repart_noop", lambda: noop(
        ev.repartition(32).select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"),
             F.round(F.avg("k"), 6).alias("avg_k"),
             F.min("k").alias("min_k"), F.max("k").alias("max_k"))))

    # --- simhash / ann
    timed("simhash_noop", lambda: noop(Q.q_simhash(spark, sf_dir)))
    timed("ann_cosine_noop", lambda: noop(Q.q_ann_cosine(spark, sf_dir)))

    # --- jaccard
    timed("jaccard_noop", lambda: noop(Q.q_jaccard_adjacent(spark, sf_dir)))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
