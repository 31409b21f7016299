"""Driver-contract rehearsal (SURVEY.md §5.5): run every queries() entry at
sf0.01 and compare row count + column names + order-insensitive values
against its oracle_sql() DuckDB twin — the same check the driver applies.
Non-SQL entries get the weaker rows>=0 + stable-schema check."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif str(out[c].dtype).startswith("datetime"):
            out[c] = out[c].astype(str)
        elif out[c].dtype.kind == "f":
            out[c] = out[c].map(lambda v: round(v, 6) if not math.isnan(v) else None)
        elif out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
    return out.sort_values(list(out.columns), ignore_index=True)


SQL_KEYS = sorted(entry_mod.oracle_sql().keys())
ALL_KEYS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", SQL_KEYS)
def test_sql_twinned_query(spark, ddb, name):
    q = entry_mod.queries()[name]
    got = _normalize(q(spark, SF).toPandas())
    want = _normalize(ddb.execute(entry_mod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, atol=1e-6)


@pytest.mark.parametrize(
    "name", [k for k in ALL_KEYS if k not in SQL_KEYS] or ["<none>"]
)
def test_rows_only_query(spark, name):
    """Entries without a SQL twin (genuinely non-SQL-expressible ops) get
    the driver's weaker rows>=0 + stable-schema check."""
    if name == "<none>":
        pytest.skip("every queries() entry currently has a SQL twin")
    df = entry_mod.queries()[name](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
    assert len(df.schema.fields) >= 2


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(c.name for c in df.schema.fields) == {"url", "cluster_id"}
