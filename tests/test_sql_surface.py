"""The spark.sql() surface returns the same rows as the DataFrame
plans — the two API halves are interchangeable."""

from __future__ import annotations

from tests.conftest import SF0001


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_spark_sql_matches_dataframe_plans(spark):
    """EVERY entry in SPARK_SQL_QUERIES is compared against the
    registry DataFrame plan of the same name — no unverified SQL."""
    from text_extraction_evaluation_spark.plans.queries import SQL_CHECKED
    from text_extraction_evaluation_spark.sources.sql_views import (
        SPARK_SQL_QUERIES,
        sql,
    )

    assert set(SPARK_SQL_QUERIES) <= set(SQL_CHECKED)
    for name, query in SPARK_SQL_QUERIES.items():
        fn, _oracle = SQL_CHECKED[name]
        got = _rows(sql(spark, SF0001, query))
        want = _rows(fn(spark, SF0001))
        assert got == want, name


def test_sql_view_registration_covers_all_tables(spark):
    from text_extraction_evaluation_spark.sources.readers import TABLES
    from text_extraction_evaluation_spark.sources.sql_views import register_views

    register_views(spark, SF0001)
    for t in TABLES:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {t}").first()["n"] > 0
