"""Replicates the driver's correctness gate locally at sf0.001: every
SQL-expressible queries() entry must match its DuckDB oracle on column
names, row count, and values (order-insensitive)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _entry():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


QUERIES, ORACLES = _entry()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF).toPandas()
    ddf = duck.sql(ORACLES[name]).df()
    s = sdf.reindex(sorted(sdf.columns), axis=1)
    d = ddf.reindex(sorted(ddf.columns), axis=1)
    assert list(s.columns) == list(d.columns), "column names diverge"
    assert len(s) == len(d), f"row count {len(s)} vs {len(d)}"
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    for c in s.columns:
        if s[c].dtype.kind == "f" or d[c].dtype.kind == "f":
            # The driver's value-hash canonicalizes by pandas dtype, so
            # int-on-one-side / float-on-the-other (e.g. a DuckDB
            # HUGEINT sum materializing as float64) hash-mismatches even
            # when values are identical. Mirror that strictness here.
            assert s[c].dtype.kind == d[c].dtype.kind, (
                f"{c}: dtype kind {s[c].dtype} vs {d[c].dtype} — "
                "driver hash would mismatch")
            assert np.allclose(s[c].astype(float), d[c].astype(float),
                               rtol=0, atol=1e-9, equal_nan=True), c
        else:
            assert (s[c].astype(str) == d[c].astype(str)).all(), c


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF)
        assert df.count() >= 0 and len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
