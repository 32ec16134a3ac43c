#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8
between N and 4N executors; sandbox stand-in per driver instruction:
local[8] vs local[32] on the SAME input).

Runs the full index build (read parquet corpus -> deterministic doc ids
-> fused analyze+posting-block mapInPandas -> term stats) in a FRESH
subprocess per (cpus, rep): one in-process warmup then one timed run,
median of REPS.  Writes BENCH/scaling_results.json.

Usage: python BENCH/scaling.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_RUNNER = r"""
import json, sys, time
from php_lucene_analyzer_spark.session import get_spark
from php_lucene_analyzer_spark.operators import fulltext as ft
from php_lucene_analyzer_spark.operators.postings import (
    index_corpus, term_stats_from_postings)

cpus, cache_dir = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app=f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")

def build():
    corpus = spark.read.parquet(cache_dir).select("repo", "path", "content")
    ids = ft.with_doc_ids(corpus, ["repo", "path"])
    sp = index_corpus(ids, "doc_id", "content")
    term_stats_from_postings(sp).write.format("noop").mode("overwrite").save()

build()  # warmup: JIT, codegen, python workers
t0 = time.time()
build()
print(json.dumps({"sec": time.time() - t0}))
"""


def run_once(cpus: int, cache_dir: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, str(cpus), cache_dir],
        capture_output=True, text=True, cwd=REPO, check=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)})
    return json.loads(out.stdout.strip().splitlines()[-1])["sec"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cache_dir = os.path.join(REPO, ".bench_cache", f"corpus_{n_docs}")
    if not os.path.exists(os.path.join(cache_dir, "_SUCCESS")):
        from php_lucene_analyzer_spark.corpus import synthetic_corpus
        from php_lucene_analyzer_spark.session import get_spark
        spark = get_spark(app="gen", cpus=32)
        spark.sparkContext.setLogLevel("ERROR")
        synthetic_corpus(spark, n_docs).write.mode("overwrite").parquet(cache_dir)
        spark.stop()

    levels = tuple(int(x) for x in
                   os.environ.get("CPU_LEVELS", "8,32").split(","))
    results = {}
    # INTERLEAVE the levels per rep (8,32,8,32,...): this VM throttles
    # aggregate CPU after sustained load, so sequential blocks would bias
    # whichever level runs later — interleaving exposes both levels to
    # the same drift and the efficiency RATIO stays meaningful
    samples: dict[int, list[float]] = {c: [] for c in levels}
    for _ in range(reps):
        for cpus in levels:
            samples[cpus].append(run_once(cpus, cache_dir))
    for cpus in levels:
        times = samples[cpus]
        med = statistics.median(times)
        results[f"local[{cpus}]"] = {
            "times_sec": [round(t, 2) for t in times],
            "median_sec": round(med, 2),
            "docs_per_sec": round(n_docs / med, 1),
        }
        print(f"local[{cpus}]: {times} -> median {med:.2f}s "
              f"({n_docs / med:.0f} docs/s)", flush=True)
    lo, hi = levels[0], levels[-1]
    tn = results[f"local[{lo}]"]["docs_per_sec"]
    t4n = results[f"local[{hi}]"]["docs_per_sec"]
    results["n_docs"] = n_docs
    results["levels"] = list(levels)
    key = f"scaling_efficiency_{hi}_vs_{hi // lo}x{lo}"
    results[key] = round(t4n / ((hi // lo) * tn), 3)
    print("efficiency:", results[key])
    out_name = os.environ.get("SCALING_OUT", "scaling_results.json")
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
