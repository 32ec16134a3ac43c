#!/usr/bin/env python
"""Regenerate tests/fixtures/wand_fullchain_golden.json — the frozen
(qid, doc_id, round(score, 4)) top-10 lists the driver-facing
``wand_fullchain`` entry asserts against (__spark_entry__._check_wand_golden).

Run after any INTENTIONAL analysis-chain or scoring change:

    python scripts/freeze_wand_golden.py [sf_dir ...]

Defaults to sf0.001 and sf0.01 (the driver's correctness scale).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry_mod
    from php_lucene_analyzer_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001",
                               "/root/testdata/sf0.01"]
    spark = get_spark(app="freeze-wand-golden")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, list] = {}
    for sf_dir in sf_dirs:
        key = os.path.basename(os.path.normpath(sf_dir))
        res = entry_mod._fullchain_wand(spark, sf_dir, {
            "w1": entry_mod.FLAGSHIP_QUERY,
            "w2": "the spark stream batch",
            "w3": "window sort vector",
        })
        rows = sorted((r["qid"], int(r["doc_id"]),
                       round(float(r["score"]), 4)) for r in res.collect())
        out[key] = [list(r) for r in rows]
        print(f"{key}: {len(rows)} rows frozen")
    path = os.path.join(REPO, "tests", "fixtures",
                        "wand_fullchain_golden.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
