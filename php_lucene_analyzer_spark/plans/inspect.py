"""Physical-plan inspection helpers.

The engine's scale guarantees are plan properties (filters reach the
scan, projections prune, small sides broadcast, Python appears only where
intended); these helpers make them assertable in tests and auditable in
notebooks (SURVEY §4).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\](?:,|\n)", explain_str(df)):
        out.extend(re.findall(r"\w+\([^)]*\)", m.group(1)))
    return out


def read_schema(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each scan (pruning evidence)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        out.append({c.split(":")[0] for c in m.group(1).split(",") if c})
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of DATA shuffles (hash/range/single-partition Exchange).
    BroadcastExchange is excluded — it ships a small table, not the
    stream.  The index build budget is exactly ONE (doc-id range)."""
    plan = explain_str(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def assert_no_python_eval(df: DataFrame) -> None:
    """Fail if row-at-a-time Python evaluation appears anywhere; Arrow
    nodes (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are the
    only sanctioned Python operators."""
    plan = explain_str(df)
    if "BatchEvalPython" in plan:
        raise AssertionError("row-at-a-time Python UDF in plan:\n" + plan)
