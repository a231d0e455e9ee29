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
* ``plans.q_nlp``        — BM25/TF-IDF/TextRank/BPE, decontamination,
  mixtures, phrase/trigram/bitmap indexes
* ``plans.q_embedding``  — ANN/similarity, specialty joins, TPC-H tail
* ``plans.q_extraction`` — extraction-family gates + profiling/pivot
* ``plans.q_hostgraph``  — host graph (PageRank/LPA/triangles/BFS) +
  URL/crawl ops (canonical dedup, domain cap, budget allocation)
* ``plans.q_webtext``    — crawl/host/URL/layout operators
* ``plans.q_lm``         — perplexity, DSIR, packing, curation funnel

Cross-engine determinism rules used throughout:
* money/quantity aggregates leave the query as exact integer units
  (cents / scale-4 / ppm BIGINTs) wherever a consumer can rescale;
  a raw ``cast("double")`` aggregate output is banned — round 3's one
  exception (q19) was the round's one driver hash mismatch;
* the DOUBLE columns that remain are quotients/ratios pinned with
  ``round(x, 6)`` of exact-integer numerators/denominators, and the
  oracle gates (pytest at sf0.001, scripts/sweep_oracle.py at sf0.01)
  compare ALL float columns bitwise (IEEE-754 bits), so any
  engine-order drift fails locally before the driver sees it;
* SQL twins cast HUGEINT-producing outputs (DuckDB SUM/MIN/MAX over
  integers) back to BIGINT so both engines agree on column kind;
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
from .q_hostgraph import *  # noqa: F401,F403
from .q_lm import *  # noqa: F401,F403
from .q_nlp import *  # noqa: F401,F403
from .q_relational import *  # noqa: F401,F403
from .q_webtext import *  # noqa: F401,F403
from . import (
    q_corpus,
    q_embedding,
    q_extraction,
    q_hostgraph,
    q_lm,
    q_nlp,
    q_relational,
    q_webtext,
)

_MERGED = {
    **q_relational._REGISTRY,
    **q_corpus._REGISTRY,
    **q_embedding._REGISTRY,
    **q_extraction._REGISTRY,
    **q_hostgraph._REGISTRY,
    **q_webtext._REGISTRY,
    **q_lm._REGISTRY,
    **q_nlp._REGISTRY,
}

# Driver-coverage ordering. The external correctness driver samples the
# FIRST 50 entries of ``queries()`` per round (CORRECTNESS_r03's keys are
# exactly the first 50 of the round-3 dict, in order). Rounds 1-3 covered
# 93 unique entries; the entries below have never had an official
# CORRECTNESS row, so they are listed first — the round-3 red
# ``q19_disjunctive_revenue`` re-check at position 0, then the backlog in
# priority order (the five carried since round 2, the two remaining
# kernel surfaces, then the heavyweight ANN / dedup / perplexity /
# graph / curation families). Entries past the first 50 drain next round.
#
# ROUND-5 ROTATION (do this at round start, BEFORE any other work): the
# round-4 driver sampled _DRIVER_FIRST[:50] at round end, so rotate
# _DRIVER_FIRST[50:] (the 36 still-unsampled entries, from
# "pca_project_census" onward — page_byte_census displaced it from the
# round-4 window) to the front, and fill the remaining 14 slots of the
# 50-entry window with re-checks of anything red in CORRECTNESS_r04
# followed by high-value earlier greens (extract_report_exact,
# q19_disjunctive_revenue, q1_pricing_summary, dedup_minhash_lsh,
# ann_cosine_topk, ...). After that rotation every registry entry has
# had an official CORRECTNESS row.
_DRIVER_FIRST = [
    "q19_disjunctive_revenue",
    # -- carried since round 2, never sampled --
    "extract_report_exact",
    "lang_source_pivot",
    "ann_quality_filtered_topk",
    "q_events_props_map",
    "q_events_range_join",
    # -- kernel surfaces (cogroup/align + raw-Arrow mapInArrow) --
    "span_churn_census",
    "page_byte_census",
    # -- ANN tiers --
    "ann_pq_adc_topk",
    "ann_ivfpq_topk",
    "ann_ivf_recall",
    "ann_dim_truncation_recall",
    "embedding_sq8_census",
    # -- curation / quality / perplexity --
    "curation_funnel",
    "lm_perplexity_score",
    "ppl_bucket_census",
    "quality_ppl_contingency",
    "quality_classifier_score",
    "quality_repetition",
    "dsir_importance_weights",
    # -- dedup families --
    "dup_span_census",
    "dup_span_clean",
    "line_dedup_clean",
    "boilerplate_line_census",
    "semantic_dedup_census",
    "dedup_jaccard_prefix",
    "dedup_keep_census",
    "dedup_keep_best_census",
    "dedup_cluster_histogram",
    "dedup_threshold_sweep",
    "dedup_banding_sweep",
    # -- graph --
    "host_pagerank",
    "host_label_propagation",
    "host_triangle_census",
    "host_bfs_depth",
    # -- extractors / eval --
    "bte_text_fingerprint",
    "extractor_sign_test",
    "extractor_bootstrap_ci",
    # -- decontamination / splits --
    "benchmark_decontamination",
    "decontamination_clean",
    "leakage_safe_split_census",
    "hard_negative_mining",
    # -- mixture / packing / sharding --
    "corpus_mixture_weights",
    "mixture_temperature_plan",
    "doc_shard_assignment",
    "sequence_packing",
    # -- distributed training loops --
    "bpe_train_merges",
    "bpe_encode_census",
    "bpe_pair_census",
    "pca_power_iteration",
    # ---- 50-entry driver window ends here; round-5 backlog follows ----
    "pca_project_census",
    "linear_probe_train",
    "tfidf_top_terms",
    "textrank_keywords",
    "heavy_hitters_cms",
    "readability_census",
    "bm25_topk",
    "bm25_mrr_eval",
    "source_overlap_matrix",
    "vocab_growth_census",
    "token_entropy_census",
    "phrase_search_census",
    "stopword_discovery",
    "langid_confusion",
    "doc_sample_group_topk",
    "doc_sample_weighted",
    "quantile_sample_audit",
    "table_profile_census",
    "crawl_budget_allocation",
    "host_skew_census",
    "url_canonical_dedup",
    "host_domain_cap",
    "anchor_text_census",
    "page_encoding_census",
    "pii_redaction",
    "unicode_nfc_census",
    "outlink_path_census",
    "template_shape_census",
    "crawl_novel_shingles",
    "url_blocklist_filter",
    "crawl_content_diff",
    "crawl_bloom_novelty",
    "scd2_page_history",
    "scd2_incremental_census",
    "passage_chunk_census",
    "bigram_lift_topk",
]

assert set(_DRIVER_FIRST) <= set(_MERGED), sorted(
    set(_DRIVER_FIRST) - set(_MERGED)
)
SQL_CHECKED = {k: _MERGED[k] for k in _DRIVER_FIRST}
SQL_CHECKED.update(
    (k, v) for k, v in _MERGED.items() if k not in SQL_CHECKED
)
