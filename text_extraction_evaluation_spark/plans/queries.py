"""Oracle-checked query registry (driver contract, __spark_entry__.py).

Every SQL-expressible operator from SURVEY.md §2 — plus the
training-data-pipeline operators (dedup exact/MinHash-LSH/SimHash/
n-gram-Jaccard, similarity search, text quality/token stats,
fingerprinting) — gets a Spark DataFrame implementation AND an
ANSI-SQL twin the driver runs through DuckDB at sf0.01. The
implementations live in the topic modules (each query function
directly above/below its SQL twin, so the pair stays in sync):

* ``plans.common``       — shared helpers (_t, _docs_par, stopword SQL)
* ``plans.q_relational`` — star-schema battery (SURVEY.md §2.2/2.4-2.7)
* ``plans.q_corpus``     — text stats + every dedup tier
* ``plans.q_embedding``  — ANN/similarity, specialty joins, TPC-H tail
* ``plans.q_extraction`` — extraction-family gates + profiling/pivot

Cross-engine determinism rules used throughout:
* money/quantity sums go through DECIMAL casts (exact partial-agg-order
  -independent arithmetic) and are cast to DOUBLE at the end;
* double averages are ``round(x, 6)``;
* hash primitives are md5-hex-prefix -> bigint (identical in both
  engines), never xxhash64/murmur (engine-specific);
* every computed column is aliased identically on both sides (the
  driver's value-hash sorts columns by name).

This module is the stable import surface: it re-exports every query
function and merges the per-module registries into ``SQL_CHECKED``.
"""

from __future__ import annotations

from .common import (  # noqa: F401 — back-compat re-exports
    STOPWORDS_SORTED,
    _STOP_SQL,
    _dec,
    _docs_par,
    _t,
)
from .q_corpus import *  # noqa: F401,F403
from .q_embedding import *  # noqa: F401,F403
from .q_extraction import *  # noqa: F401,F403
from .q_lm import *  # noqa: F401,F403
from .q_relational import *  # noqa: F401,F403
from .q_webtext import *  # noqa: F401,F403
from . import q_corpus, q_embedding, q_extraction, q_lm, q_relational, q_webtext

SQL_CHECKED = {
    **q_relational._REGISTRY,
    **q_corpus._REGISTRY,
    **q_embedding._REGISTRY,
    **q_extraction._REGISTRY,
    **q_webtext._REGISTRY,
    **q_lm._REGISTRY,
}
