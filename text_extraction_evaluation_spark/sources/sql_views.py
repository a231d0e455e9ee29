"""spark.sql() surface: register the fixture tables as temp views so
every registry query is also reachable as an ANSI-SQL string — the
second half of the DataFrame-or-SQL API contract (a reference user who
thinks in SQL runs the same engine through ``spark.sql``).

The DuckDB oracle strings in plans/queries.py are written in DuckDB's
dialect (list lambdas, ``//``, ``::`` casts) and are NOT expected to
run on Spark verbatim; the Spark-SQL strings here are the Spark-dialect
equivalents for the common relational shapes, checked against the
DataFrame formulations by tests/test_sql_surface.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .readers import TABLES


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """CREATE OR REPLACE TEMP VIEW for every fixture table."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a Spark-SQL string against the registered fixture views."""
    register_views(spark, sf_dir)
    return spark.sql(query)


# Spark-dialect SQL twins of representative registry queries — same
# names, same output columns (the test asserts equality with the
# DataFrame plans).
SPARK_SQL_QUERIES: dict[str, str] = {
    "q_nation_revenue": """
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q_events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n_events,
               ROUND(AVG(value), 6) AS avg_value,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\\\\s+', ' '))) AS fingerprint
        FROM documents
    """,
    "lang_distribution": """
        SELECT lang, COUNT(*) AS n_docs,
               ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
               COUNT(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang
    """,
}
