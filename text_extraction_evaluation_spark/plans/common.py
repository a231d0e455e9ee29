"""Shared helpers for the plans.q_* query modules: fixture readers
(_t, _docs_par), the cross-engine DECIMAL cast (_dec), and the
stopword list in Python + SQL-literal form. The query registry itself
lives in the topic modules and is merged in plans.queries (the stable
import surface / driver contract docs live there)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..algo.stoplists import _SYNTH_STOPWORDS


STOPWORDS_SORTED = sorted(_SYNTH_STOPWORDS)
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_SORTED)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, spread across cores. The fixture is one small parquet
    file => one input split; the lambda-heavy shingle/hash queries are
    CPU-bound per row, so give them all cores. (Real corpora arrive in
    many splits and skip this.)"""
    return _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def _dec(col, prec="decimal(18,2)"):
    return F.col(col).cast(prec) if isinstance(col, str) else col.cast(prec)


