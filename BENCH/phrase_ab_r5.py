#!/usr/bin/env python
"""Phrase-kernel A/B: r5 vectorized whole-bucket kernels vs the r4
per-candidate-doc Python loop (r4 VERDICT item 1 "done" criterion:
>=5x on the kernel stage for a common-term phrase at sf0.1).

One subprocess per side (r4 = the pinned worktree at /tmp/ab_r4_worktree,
r5 = this repo), same input: positional index over sf0.1 documents
(built untimed), then the 2 most frequent corpus terms as an exact
phrase and as a slop=8 span-near — warm run + median of 3 timed runs
each.  Output: BENCH/phrase_ab_r5.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WT4 = "/tmp/ab_r4_worktree"

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import pyspark.sql.functions as F
from php_lucene_analyzer_spark.operators.positional import (
    phrase_match, positional_postings)
from php_lucene_analyzer_spark.session import get_spark

spark = get_spark(app="phrase-ab", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
pos = positional_postings(
    docs.select("doc_id", "text").repartitionByRange(32, "doc_id"),
    "doc_id", "text").localCheckpoint(eager=True)
from php_lucene_analyzer_spark.analysis import analyze
top = (pos.groupBy("term").agg(F.sum("sum_tf").alias("cf"))
       .orderBy(F.desc("cf"), "term").limit(2).collect())
phrase = " ".join(r["term"] for r in top)
out = {"phrase": phrase}
# slop stage pinned to span semantics on both sides: the r5 repo's
# default slop_mode is "lucene" (late r5), the pinned r4 worktree has
# no such parameter — without the pin the A/B would time different
# algorithms over different match sets
import inspect
_slop_kw = {"slop": 8}
if "slop_mode" in inspect.signature(phrase_match).parameters:
    _slop_kw["slop_mode"] = "span"
for name, kw in (("exact", {}), ("slop8", _slop_kw)):
    pm = lambda: phrase_match(pos, phrase, **kw).count()
    n = pm()                      # warm (JIT, shuffles)
    ts = []
    for _ in range(3):
        t0 = time.time(); pm(); ts.append(time.time() - t0)
    ts.sort()
    out[name] = {"median_sec": round(ts[1], 3), "all": [round(t, 3) for t in ts],
                 "n_docs_matched": n}
print("ABJSON " + json.dumps(out))
spark.stop()
"""


def run_side(cwd: str) -> dict:
    r = subprocess.run([sys.executable, "-c", _RUNNER],
                       capture_output=True, text=True, cwd=cwd)
    for line in r.stdout.splitlines():
        if line.startswith("ABJSON "):
            return json.loads(line[7:])
    raise RuntimeError(f"no ABJSON from {cwd}: {r.stderr[-2000:]}")


def main() -> None:
    res = {}
    # alternate r5/r4/r5/r4 so window drift hits both sides
    runs = {"r5": [], "r4": []}
    for i in range(2):
        runs["r5"].append(run_side(REPO))
        runs["r4"].append(run_side(WT4))
    for stage in ("exact", "slop8"):
        r5 = statistics.median(x[stage]["median_sec"] for x in runs["r5"])
        r4 = statistics.median(x[stage]["median_sec"] for x in runs["r4"])
        res[stage] = {"r5_median": r5, "r4_median": r4,
                      "speedup": round(r4 / r5, 2) if r5 else None,
                      "n_docs": runs["r5"][0][stage]["n_docs_matched"]}
    res["phrase"] = runs["r5"][0]["phrase"]
    res["raw"] = runs
    with open(os.path.join(REPO, "BENCH", "phrase_ab_r5.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "raw"}))


if __name__ == "__main__":
    main()
