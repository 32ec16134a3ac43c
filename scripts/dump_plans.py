#!/usr/bin/env python
"""Dump .explain("formatted") for every declared query to plans/<tag>/.

Usage: python scripts/dump_plans.py <out_dir> [suffix] [names...]
Captures the optimization-round plan evidence (guide §1: plan shape —
Exchange count, join strategy, PushedFilters, Python eval nodes).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from php_lucene_analyzer_spark.queries import QUERIES
    from php_lucene_analyzer_spark.session import get_spark

    spark = get_spark(app="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as e:  # pragma: no cover - diagnostics only
            plan = f"ERROR: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
