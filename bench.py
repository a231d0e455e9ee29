"""Benchmark harness (driver contract: one JSON line to stdout).

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. The flagship extraction pipeline is run over
a replicated page corpus (REPLICATE x documents, distinct urls) so the
Arrow kernel dominates the measurement rather than fixed overheads.

Output: {"metric": "...", "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": <sf>, ...extras}
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time


def _noop_write(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _host_capacity(seconds: float = 2.0) -> float:
    """Host-capacity probe (same burn as scripts/scaling_bench.py):
    aggregate ops/s of an N-process pure-Python loop (N = machine
    cores, capped at 32 to stay comparable with the scaling bench's
    32-process probe), run in a clean subprocess (no Spark state).
    This sandbox is co-tenant virtualized hardware whose capacity
    oscillates on a ~10-minute timescale; the probe result is the
    noise DENOMINATOR for cross-round comparisons of the absolute
    throughput numbers below — a bench run taken in a degraded epoch
    shows a proportionally lower probe value. Identical code across
    rounds, so probe ratios == capacity ratios. Returns -1.0 (and
    prints the reason to stderr) if the probe cannot run."""
    import subprocess

    procs = min(32, os.cpu_count() or 1)
    code = r"""
import multiprocessing as mp, time, sys
def burn(sec):
    t0 = time.time(); c = 0
    while time.time() - t0 < sec:
        x = 0
        for i in range(20000): x += i * i
        c += 20000
    return c
if __name__ == '__main__':
    sec = float(sys.argv[1]); procs = int(sys.argv[2])
    with mp.Pool(procs) as p:
        total = sum(p.map(burn, [sec] * procs))
    print(total / sec)
"""
    cmd = [sys.executable, "-c", code, str(seconds), str(procs)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{procs - 1}"] + cmd
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        return round(float(out.stdout.strip().splitlines()[-1]), 0)
    except Exception as ex:
        print(f"host-capacity probe failed: {ex!r}", file=sys.stderr)
        return -1.0


# Headline analytics benched per round (every name must be a
# registered SQL_CHECKED entry; tests/test_bench_list.py guards it).
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q_nation_revenue",
    "q_top_customers",
    "q_events_hourly",
    "text_quality",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_components",
    "dedup_simhash",
    "doc_rolling_fingerprints",
    "ann_cosine_topk",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "q_events_asof_join",
    "quality_filter",
    "doc_sample_stratified",
    "doc_containment",
    "tfidf_top_terms",
    "quality_repetition",
    "host_pagerank",
    "host_domain_cap",
    "pii_redaction",
    "boilerplate_line_census",
    "crawl_content_diff",
    "scd2_page_history",
    "lm_perplexity_score",
    "dsir_importance_weights",
    "sequence_packing",
    "line_dedup_clean",
    "curation_funnel",
    "semantic_dedup_census",
    "crawl_bloom_novelty",
    "quality_classifier_score",
    "bm25_topk",
    "bpe_train_merges",
    "bpe_encode_census",
    "heavy_hitters_cms",
    "unicode_nfc_census",
    "doc_sample_weighted",
    "pca_power_iteration",
    "pca_project_census",
    "leakage_safe_split_census",
    "outlink_path_census",
    "template_shape_census",
    "crawl_novel_shingles",
    "readability_census",
    "ann_ivf_recall",
    "decontamination_clean",
    "linear_probe_train",
    "vocab_growth_census",
    "token_entropy_census",
    "bigram_lift_topk",
    "anchor_text_census",
    "page_encoding_census",
    "hard_negative_mining",
    "embedding_sq8_census",
    "phrase_search_census",
    "quality_ppl_contingency",
    "mixture_temperature_plan",
    "q_event_funnel",
    "q_retention_cohorts",
    "ann_pq_adc_topk",
    "ann_ivfpq_topk",
    "zorder_layout_census",
    "dedup_jaccard_prefix",
    "dedup_threshold_sweep",
    "stopword_discovery",
    "bm25_mrr_eval",
    "ann_dim_truncation_recall",
    "passage_chunk_census",
    "dedup_banding_sweep",
    "span_churn_census",
    "q18_large_orders",
    "q_events_rolling_window",
    "hll_distinct_census",
    "q_events_variant",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "q_events_gapfill",
    "dedup_minhash_calibration",
    "host_label_propagation",
    "q16_parts_supplier",
    "q_integrity_audit",
    "q_price_ntile",
    "q_events_interpolate",
    "trigram_index_search",
    "crawl_budget_allocation",
    "langid_confusion",
    "q_events_out_of_order",
    "q_events_percent_rank",
    "source_length_trend",
    "source_median_chars",
    "source_trimmed_mean",
    "host_bfs_depth",
    "q_events_pit_state",
    "dedup_edit_distance",
    "token_source_bitmap",
    "q_grouping_sets",
    "q_lineitem_unpivot",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # The flagship extraction pipeline runs at a LARGE replication:
    # the pipeline carries ~2 s of fixed per-job overhead (synth stage
    # launch, window shuffle barrier, task-tail at 32 cores) that at
    # replicate=32 (160k docs, ~4 s) is half the wall clock and at
    # replicate=128 (640k docs) amortizes to ~15% — the sustained rate
    # a long 100 TB run actually sees, and the number comparable to
    # scripts/scaling_bench.py (also replicate>=128).
    replicate_flagship = int(os.environ.get("SPARK_GRAFT_REPLICATE_FLAGSHIP", "128"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from text_extraction_evaluation_spark.operators.extract import (
        extract_pages,
        extracted_clean,
        latest_crawl,
    )
    from text_extraction_evaluation_spark.operators.report import ranked_report
    from text_extraction_evaluation_spark.operators.score import score_extracted
    from text_extraction_evaluation_spark.plans.queries import SQL_CHECKED
    from text_extraction_evaluation_spark.sources.readers import (
        get_spark,
        gold_df,
        pages_df,
    )

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # host noise denominator: capacity before any Spark work starts
    extras["host_ops_before"] = _host_capacity()
    # Reference numerator for epoch normalization: the PINNED all-time
    # clean-epoch capacity of the reference host (same constant as
    # scripts/scaling_bench.py CLEAN_EPOCH_REF_OPS, same probe code).
    # Deliberately NOT read from BENCH/scaling.json: that file's
    # calibrations change whenever the scaling headline is replaced,
    # which would silently change the normalization denominator between
    # rounds — the exact confound the *_epoch_normalized fields exist
    # to remove.
    extras["host_ops_peak_ref"] = 5.35e8

    spark = get_spark(
        "bench",
        cores=cpus,
        shuffle_partitions=max(32, cpus),
        # same GC shape scripts/scaling_bench.py measured most stable
        # next to the Python worker pool
        extra_java_options=(
            f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, cpus // 4)}"
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- warm-up (uncounted, reported): first-use costs are session
    # fixtures, not operator costs — JVM whole-stage codegen compile,
    # Python worker pool spawn, Arrow channel setup, broadcast-thread
    # start. BENCH/BASELINE.md's scaling numbers exclude warmup the
    # same way, so steady-state timings stay comparable.
    t0 = time.time()
    _noop_write(
        extracted_clean(
            extract_pages(latest_crawl(pages_df(spark, sf_dir, n_partitions=cpus)))
        )
    )
    fn, _sql = SQL_CHECKED["q_nation_revenue"]
    _noop_write(fn(spark, sf_dir))
    extras["warmup_sec"] = round(time.time() - t0, 3)

    # -- flagship: synth -> dedup -> extract -> score -> report -------------
    n_parts = cpus * 3
    pages = pages_df(spark, sf_dir, n_partitions=n_parts, replicate=replicate_flagship)
    latest = latest_crawl(pages)
    extracted = extracted_clean(extract_pages(latest))
    gold = gold_df(spark, sf_dir, replicate=replicate_flagship)

    # Persist the extraction output: the scoring stage consumes the
    # materialized extracted table (in production it reads the catalog
    # table the extract job wrote), not a re-run of the Arrow kernel.
    # Best of two timed runs: the shared virtualized host has ~10-min
    # co-tenancy epochs that can double a single run's wall time (see
    # BENCH/BASELINE.md); both runs are reported.
    t0 = time.time()
    n_docs = extract_pages(latest).count()
    run1 = time.time() - t0
    extracted = extracted.persist()
    t0 = time.time()
    n_docs = extracted.count()
    run2 = time.time() - t0
    t_extract = min(run1, run2)
    timings["extract_pipeline"] = round(t_extract, 3)
    extras["extract_runs"] = [round(run1, 3), round(run2, 3)]
    extras["extraction_docs"] = n_docs
    extras["extraction_docs_per_sec"] = round(n_docs / t_extract, 1)

    score_runs = []
    for _ in range(2):
        t0 = time.time()
        ranked_report(score_extracted(extracted, gold)).collect()
        score_runs.append(round(time.time() - t0, 3))
    timings["score_report"] = min(score_runs)
    extras["score_runs"] = score_runs
    extracted.unpersist()

    # second extractor (densometric rules) over the same replicated pages
    from text_extraction_evaluation_spark.operators.extract import (
        extract_pages_density,
    )

    t0 = time.time()
    n_dens = extract_pages_density(latest).count()
    t_dens = time.time() - t0
    timings["extract_density_pipeline"] = round(t_dens, 3)
    extras["density_docs_per_sec"] = round(n_dens / t_dens, 1)

    # third extractor (BTE maximum-subarray window) over the same pages
    from text_extraction_evaluation_spark.operators.extract import (
        extract_pages_bte,
    )

    t0 = time.time()
    n_bte = extract_pages_bte(latest).count()
    t_bte = time.time() - t0
    timings["extract_bte_pipeline"] = round(t_bte, 3)
    extras["bte_docs_per_sec"] = round(n_bte / t_bte, 1)

    # -- headline analytics ---------------------------------------------------
    bench_queries = BENCH_QUERIES
    # best of two runs per query: the shared virtualized host has
    # co-tenancy epochs that can multiply a single run's wall time
    # (measured 12x once on an unchanged plan); the min of two runs
    # a few seconds apart is a far more stable point estimate.
    for name in bench_queries:
        fn, _sql = SQL_CHECKED[name]
        runs = []
        for _ in range(2):
            t0 = time.time()
            _noop_write(fn(spark, sf_dir))
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)

    spark.stop()
    # capacity again after the run: a mid-run co-tenancy epoch shows up
    # as before/after disagreement (run AFTER spark.stop so the probe
    # measures the host, not contention with executor threads)
    extras["host_ops_after"] = _host_capacity()

    total = round(sum(timings.values()), 3)
    # Epoch normalization (round-4 verdict item 5): the host's delivered
    # capacity swings between rounds (co-tenant epochs, node
    # migrations), so raw cross-round per-query deltas confound plan
    # changes with epoch changes. Scale each timing by this run's
    # capacity fraction (mean of the before/after probes over the
    # all-time clean reference) to get the seconds the query would take
    # at reference capacity — the number to compare across rounds.
    # a failed probe returns the -1.0 sentinel — exclude it (it would
    # halve or negate the normalized numbers)
    probes = [
        extras[k]
        for k in ("host_ops_before", "host_ops_after")
        if extras[k] > 0
    ]
    epoch_frac = (
        (sum(probes) / len(probes)) / extras["host_ops_peak_ref"]
        if probes
        else None
    )
    full = {
        "metric": "headline_queries_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "replicate_flagship": replicate_flagship,
        **extras,
    }
    if epoch_frac is not None:
        full["epoch_capacity_frac"] = round(epoch_frac, 3)
        full["value_epoch_normalized"] = round(total * epoch_frac, 3)
        full["queries_epoch_normalized"] = {
            k: round(v * epoch_frac, 3) for k, v in timings.items()
        }
    # Full per-query payload goes to a file; the driver's stdout capture
    # keeps only the LAST 2000 characters, so the final printed line must
    # be compact (round 3's official BENCH record lost its headline to a
    # tail-truncated JSON line). Print the full dict first (humans /
    # local logs), then the compact driver line LAST.
    out_dir = pathlib.Path(__file__).resolve().parent / "BENCH"
    out_path = None
    try:
        out_dir.mkdir(exist_ok=True)
        out_path = out_dir / f"bench_full_{time.strftime('%m%d_%H%M%S')}.json"
        out_path.write_text(json.dumps(full, indent=1))
    except OSError as exc:  # read-only checkout: keep benching
        print(f"bench: could not write full payload: {exc!r}", file=sys.stderr)
    print(json.dumps(full), file=sys.stderr)
    flagship = {
        k: timings[k]
        for k in (
            "extract_pipeline",
            "score_report",
            "extract_density_pipeline",
            "extract_bte_pipeline",
        )
        if k in timings
    }
    compact = {
        "metric": "headline_queries_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": flagship,
        "sf": sf,
        "cpus": cpus,
        "n_queries": len(timings),
        "replicate_flagship": replicate_flagship,
        "extraction_docs": extras.get("extraction_docs"),
        "extraction_docs_per_sec": extras.get("extraction_docs_per_sec"),
        "density_docs_per_sec": extras.get("density_docs_per_sec"),
        "bte_docs_per_sec": extras.get("bte_docs_per_sec"),
        "host_ops_before": extras.get("host_ops_before"),
        "host_ops_after": extras.get("host_ops_after"),
        "epoch_capacity_frac": (
            round(epoch_frac, 3) if epoch_frac is not None else None
        ),
        "value_epoch_normalized": (
            round(total * epoch_frac, 3) if epoch_frac is not None else None
        ),
        "full_results": str(out_path) if out_path else None,
    }
    line = json.dumps(compact)
    assert len(line) < 1900, f"compact bench line too long: {len(line)}"
    print(line)


if __name__ == "__main__":
    sys.exit(main())
