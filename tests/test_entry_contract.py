"""Replicates the driver's correctness gate locally: every queries() entry vs
its oracle_sql() DuckDB run at sf0.01 — row count, schema, order-insensitive
value equality."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


def _duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for path in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(path).replace(".parquet", "")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(list(out.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # Spark-only operator: driver records rows-only; assert it runs
        pdf = q(spark, SF_DIR).toPandas()
        assert len(pdf) >= 0
        return
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(_duck_run(sql))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            np.testing.assert_allclose(
                g.to_numpy(float), w.to_numpy(float), rtol=1e-9, atol=1e-9,
                err_msg=f"{name}.{c}",
            )
        else:
            pd.testing.assert_series_equal(
                g, w, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert "total" in pdf.columns
