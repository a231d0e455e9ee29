"""Local twin of the driver's correctness gate: run every
``queries()`` entry on Spark AND its ``oracle_sql()`` twin on DuckDB at
sf0.001, compare row count, column names, and order-insensitive values.
(The driver does the same at sf0.01.)
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF0001
from text_extraction_evaluation_spark.plans.queries import SQL_CHECKED
from text_extraction_evaluation_spark.sources.readers import TABLES


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF0001}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical frame for cross-engine comparison. Float columns are
    compared BITWISE (IEEE-754 bits of the float64 value, NaN
    canonicalized) — the driver's value-hash is exact, so a round-9
    tolerance here would hide exactly the last-bit drift that turns a
    locally-green query into an official red row (round 3's q19)."""
    import numpy as np

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif pdf[c].dtype.kind == "f":
            a = pdf[c].astype(np.float64).to_numpy()
            pdf[c] = np.where(
                np.isnan(a), np.int64(-1), a.view(np.int64)
            )
        elif pdf[c].dtype.kind in "iu":
            pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype.kind == "b":
            pdf[c] = pdf[c].astype(bool)
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(SQL_CHECKED))
def test_query_matches_duckdb(name, spark, duck):
    fn, sql = SQL_CHECKED[name]
    got = fn(spark, SF0001).toPandas()
    want = duck.sql(sql).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    g = normalize(got)
    w = normalize(want)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False)
    except AssertionError as exc:
        raise AssertionError(f"{name}: value mismatch\n{exc}") from exc
