"""Pre-runs the driver's correctness gate: every queries() entry with an
oracle must match DuckDB on sf0.01 — row count, column names, and
order-insensitive values (SURVEY.md §5.7)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = [r.asDict() for r in sdf.collect()]

    pdf = duck.execute(entry_mod.oracle_sql()[name]).df()
    duck_cols = sorted(pdf.columns.tolist())
    assert spark_cols == duck_cols, f"{name}: column names differ"
    duck_rows = pdf.to_dict("records")

    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


def test_every_query_has_oracle_or_is_flagged():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    rows_only = set(qs) - set(os_)
    # only the genuinely non-SQL-expressible op may skip the oracle
    assert rows_only <= {"wand_fullchain"}
