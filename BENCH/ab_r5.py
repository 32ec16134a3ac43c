#!/usr/bin/env python
"""Same-window A/B: HEAD(r4) vs r3 (f9c3814) on the five stages whose
BENCH_r04 numbers drifted >1.2x with no code change (r4 VERDICT item 8).

Method: a git worktree at the r3 commit; one fresh subprocess per
(version, rep) running ALL five stages; versions ALTERNATE (A B A B ...)
inside one session window so any governor drift hits both sides equally;
cpu_control probes bracket the whole run and each rep pair.  Output:
BENCH/ab_r5.json with per-stage medians + the probe series.

Stages (sf0.1): boolean, phrase_match, decontaminate (oracle-suite
queries, 1 warmup + 1 timed each, bench.py's shape), bm25_p95 (postings
built untimed, 3 reps x 5 wand queries), synth_build (20k-doc corpus
from the shared .bench_cache).

Usage: python BENCH/ab_r5.py [reps=3]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_SHA = "f9c3814"
R4_SHA = "a0228ff"          # round-4 HEAD (the BENCH_r04 code)
WT = os.path.join("/tmp", "ab_r3_worktree")
WT4 = os.path.join("/tmp", "ab_r4_worktree")

_RUNNER = r"""
import json, math, os, sys, time
sys.path.insert(0, os.getcwd())
from php_lucene_analyzer_spark.operators import fulltext as ft
from php_lucene_analyzer_spark.operators.postings import (
    build_postings, corpus_stats_from_postings, index_corpus,
    term_stats_from_postings)
from php_lucene_analyzer_spark.operators.wand import wand_topk
from php_lucene_analyzer_spark.queries import QUERIES
from php_lucene_analyzer_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
cache_dir = sys.argv[1]
out = {}
spark = get_spark(app="ab", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

for name in ("boolean", "phrase_match", "decontaminate"):
    fn = QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)

docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
n_docs = docs.count()
tdf = ft.term_doc_freqs(docs, "doc_id", "text").cache()
n, avgdl = ft.corpus_stats(tdf)
tstats = ft.term_stats(tdf).cache()
postings = build_postings(tdf).cache()
postings.count(); tstats.count()
wq = ["fast merge join order", "the spark stream batch",
      "window sort vector", "slow customer value", "dup big row column"]
lat = []
for _ in range(3):
    for q in wq:
        t0 = time.time()
        wand_topk(postings, tstats, n, avgdl, q, k=10).collect()
        lat.append(time.time() - t0)
lat.sort()
out["bm25_p95"] = round(lat[min(len(lat) - 1,
                                math.ceil(len(lat) * 0.95) - 1)], 4)
tdf.unpersist(); tstats.unpersist(); postings.unpersist(); docs.unpersist()

t0 = time.time()
corpus = spark.read.parquet(cache_dir)
sdocs = ft.with_doc_ids(corpus.select("repo", "path", "content"),
                        ["repo", "path"])
sp = index_corpus(sdocs, "doc_id", "content").cache()
sn = int(sp.agg({"last_doc": "max"}).collect()[0][0]) + 1
corpus_stats_from_postings(sp, sn)
term_stats_from_postings(sp).write.format("noop").mode("overwrite").save()
sp.unpersist()
out["synth_build"] = round(time.time() - t0, 3)
print("ABJSON " + json.dumps(out))
spark.stop()
"""


def probe() -> float:
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "BENCH", "cpu_control.py"),
                        "1200"], capture_output=True, text=True)
    return json.loads(r.stdout.strip().splitlines()[-1])[
        "agg_scaling_32_vs_8"]


def run_side(cwd: str, cache_dir: str) -> dict:
    r = subprocess.run([sys.executable, "-c", _RUNNER, cache_dir],
                       capture_output=True, text=True, cwd=cwd)
    for line in r.stdout.splitlines():
        if line.startswith("ABJSON "):
            return json.loads(line[7:])
    raise RuntimeError(f"no ABJSON from {cwd}: {r.stderr[-2000:]}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cache_dir = os.path.join(REPO, ".bench_cache", "corpus_20000")
    for wt, sha in ((WT, R3_SHA), (WT4, R4_SHA)):
        if not os.path.exists(wt):
            subprocess.run(["git", "worktree", "add", "--detach", wt, sha],
                           cwd=REPO, check=True)
    results = {"head": [], "r3": []}
    probes = [("open", probe())]
    for i in range(reps):
        # alternate, swapping who goes first each rep to cancel
        # within-pair drift ("head" = the pinned r4 commit, not the
        # session's working tree)
        order = [("head", WT4), ("r3", WT)] if i % 2 == 0 else \
            [("r3", WT), ("head", WT4)]
        for name, cwd in order:
            results[name].append(run_side(cwd, cache_dir))
        probes.append((f"after_rep{i}", probe()))
    stages = sorted(results["head"][0])
    summary = {}
    for st in stages:
        h = [r[st] for r in results["head"]]
        r3 = [r[st] for r in results["r3"]]
        summary[st] = {
            "head_median": statistics.median(h),
            "r3_median": statistics.median(r3),
            "head_over_r3": round(statistics.median(h)
                                  / statistics.median(r3), 3),
            "head_all": h, "r3_all": r3,
        }
    out = {"summary": summary, "probes": probes, "reps": reps,
           "r3_sha": R3_SHA}
    with open(os.path.join(REPO, "BENCH", "ab_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"summary": summary, "probes": probes}))


if __name__ == "__main__":
    main()
