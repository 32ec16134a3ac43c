"""Skew measurement + salting advisor (SURVEY §4 item 1).

The posting build handles Zipf skew structurally (doc-range salting);
this module provides the MEASUREMENT side — how skewed a key column is,
and what salt fan-out a plain groupBy/join on it would need — for
pipelines that must shuffle on a hot key (e.g. the band-bucket joins in
dedup.py under adversarial near-dup clusters).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def key_skew_report(df: DataFrame, key: str, top: int = 10) -> dict:
    """{total, distinct, p_max, top:[(key, n)]} — one aggregation pass."""
    counts = df.groupBy(key).count()
    agg = counts.agg(F.sum("count").alias("total"),
                     F.count("*").alias("distinct"),
                     F.max("count").alias("max")).collect()[0]
    heavy = [(r[key], r["count"]) for r in
             counts.orderBy(F.desc("count")).limit(top).collect()]
    total = agg["total"] or 0
    return {
        "total": int(total),
        "distinct": int(agg["distinct"] or 0),
        "p_max": (int(agg["max"]) / total) if total else 0.0,
        "top": heavy,
    }


def suggest_salt(report: dict, target_rows_per_task: int = 1_000_000) -> int:
    """Salt fan-out K so the heaviest key splits into ~target-sized tasks
    (two-phase agg: groupBy(key, salt) then groupBy(key))."""
    if not report["total"]:
        return 1
    heaviest = max((n for _, n in report["top"]), default=0)
    return max(1, -(-heaviest // target_rows_per_task))


def salted(df: DataFrame, key: str, k: int) -> DataFrame:
    """Attach the salt column: pmod(xxhash64(all cols), k) keeps it
    deterministic row-wise (never rand() — rank identity)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(k)))
