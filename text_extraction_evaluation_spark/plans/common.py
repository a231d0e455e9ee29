"""Oracle-checked query registry (driver contract, __spark_entry__.py).

Every SQL-expressible operator from SURVEY.md §2 — plus the
training-data-pipeline operators (dedup exact/MinHash-LSH/SimHash/
n-gram-Jaccard, similarity search, text quality/token stats,
fingerprinting) — gets a Spark DataFrame implementation here AND an
ANSI-SQL twin the driver runs through DuckDB at sf0.01.

Cross-engine determinism rules used throughout:
* money/quantity sums go through DECIMAL casts (exact partial-agg-order
  -independent arithmetic) and are cast to DOUBLE at the end;
* double averages are ``round(x, 6)``;
* hash primitives are md5-hex-prefix -> bigint (identical in both
  engines), never xxhash64/murmur (engine-specific);
* every computed column is aliased identically on both sides (the
  driver's value-hash sorts columns by name).

Scale notes are attached per query: broadcast hints on dimension
tables, aggregate-before-join where legal, and no driver-side loops.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    MINHASH_BANDS,
    MINHASH_ROWS_PER_BAND,
    MINHASH_SEEDS,
    SIMHASH_BITS,
    md5_int,
    minhash_signature,
    tokens_col,
    word_shingles,
)
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


