"""The spark.sql() surface returns the same rows as the DataFrame
plans — the two API halves are interchangeable."""

from __future__ import annotations

from tests.conftest import SF0001


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_spark_sql_matches_dataframe_plans(spark):
    from text_extraction_evaluation_spark.plans.queries import (
        lang_distribution,
        q_events_hourly,
        q_nation_revenue,
    )
    from text_extraction_evaluation_spark.sources.sql_views import (
        SPARK_SQL_QUERIES,
        sql,
    )

    for name, fn in [
        ("q_nation_revenue", q_nation_revenue),
        ("q_events_hourly", q_events_hourly),
        ("lang_distribution", lang_distribution),
    ]:
        got = _rows(sql(spark, SF0001, SPARK_SQL_QUERIES[name]))
        want = _rows(fn(spark, SF0001))
        assert got == want, name


def test_sql_view_registration_covers_all_tables(spark):
    from text_extraction_evaluation_spark.sources.readers import TABLES
    from text_extraction_evaluation_spark.sources.sql_views import register_views

    register_views(spark, SF0001)
    for t in TABLES:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {t}").first()["n"] > 0
