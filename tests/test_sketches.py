"""Approximate-sketch operators, bounds-checked against exact twins.

At 100 TB the exact forms of these queries are the expensive path
(count-distinct shuffles every key; exact percentiles sort); the
sketches are the production tool, so they get first-class coverage —
pytest-bounded rather than driver-SQL-checked because approximate
values are engine-specific by construction (DuckDB's HLL and Spark's
HLL++ legitimately disagree within their error bounds).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet").cache()


def test_hll_distinct_within_rsd(spark):
    """approx_count_distinct (HLL++) on the synthesized url corpus:
    within the requested relative standard deviation of the exact
    count (4 sigma — deterministic for a fixed fixture + seed)."""
    from text_extraction_evaluation_spark.sources.readers import pages_df

    pages = pages_df(spark, SF0001, n_partitions=8)
    rsd = 0.02
    row = pages.agg(
        F.approx_count_distinct("url", rsd).alias("approx"),
        F.countDistinct("url").alias("exact"),
    ).collect()[0]
    assert row.exact == 500
    assert abs(row.approx - row.exact) <= 4 * rsd * row.exact


def test_hll_partial_merge_equals_single_pass(spark, docs):
    """The sketch must be mergeable (the property that makes it work
    across 1000 executors): the same estimate must come out of a
    pre-aggregated two-level rollup as out of one flat aggregate."""
    flat = docs.agg(F.approx_count_distinct("text", 0.02).alias("a")).collect()[0].a
    # force a different partial-aggregation topology
    two_level = (
        docs.repartition(16, "source")
        .agg(F.approx_count_distinct("text", 0.02).alias("a"))
        .collect()[0]
        .a
    )
    assert flat == two_level


def test_approx_percentile_rank_error(spark, docs):
    """percentile_approx (KLL-style quantile sketch) vs the exact
    percentile: the returned value's true rank must sit within
    1/accuracy of the requested rank."""
    accuracy = 1000
    qs = [0.5, 0.9, 0.99]
    n = docs.count()
    approx = docs.agg(
        F.percentile_approx("n_chars", qs, accuracy).alias("p")
    ).collect()[0].p
    vals = sorted(r.n_chars for r in docs.select("n_chars").collect())
    for q, a in zip(qs, approx, strict=True):
        true_rank = sum(1 for v in vals if v <= a) / n
        assert abs(true_rank - q) <= 1.0 / accuracy + 1.0 / n, (q, a, true_rank)


def test_bloom_filter_membership(spark):
    """Seen-URL Bloom filter — the broadcastable membership sketch an
    incremental crawl uses to skip already-fetched urls without a
    shuffle join against history. Built distributed (bit_or-merged
    partials), probed as a JVM column; FPP bounded, and zero false
    negatives by construction."""
    from text_extraction_evaluation_spark.functions.sketch import (
        bloom_build,
        bloom_might_contain,
        bloom_params,
    )
    from text_extraction_evaluation_spark.sources.readers import pages_df

    pages = pages_df(spark, SF0001, n_partitions=8).select("url").distinct()
    fpp = 0.01
    m, k = bloom_params(500, fpp)
    bitmap = bloom_build(pages, "url", m, k)
    hits = pages.filter(
        bloom_might_contain(F.col("url"), bitmap, m, k)
    ).count()
    assert hits == pages.count()  # no false negatives
    probes = spark.range(2000).select(
        F.concat(F.lit("http://unseen"), "id", F.lit(".example/x")).alias("url")
    )
    fp = probes.filter(bloom_might_contain(F.col("url"), bitmap, m, k)).count()
    # 2000 probes at fpp=0.01 -> expect ~20; allow generous slack
    assert fp <= 2000 * fpp * 5


def test_count_min_heavy_hitter(spark):
    """Count-min sketch over the synthesized page hosts — the
    fixed-size frequency sketch that finds hot domains without a full
    (host, count) aggregate. Built by Spark's distributed
    count_min_sketch aggregate (partial sketches merged across
    partitions), read back through the JVM sketch, and checked for
    the CMS contract: never under-counts, over-counts bounded by
    eps * stream size."""
    from text_extraction_evaluation_spark.sources.readers import pages_df

    pages = pages_df(spark, SF0001, n_partitions=8).select(
        F.regexp_extract("url", r"^http://([^/]+)", 1).alias("host")
    )
    eps, conf = 0.01, 0.99
    blob = pages.agg(
        F.count_min_sketch("host", F.lit(eps), F.lit(conf), F.lit(42)).alias("s")
    ).collect()[0].s
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(blob)
    )
    exact = {r.host: r.n for r in pages.groupBy("host").count().withColumnRenamed("count", "n").collect()}
    total = sum(exact.values())
    for host, n in exact.items():
        est = cms.estimateCount(host)
        assert est >= n, (host, est, n)
        assert est <= n + eps * total * 3, (host, est, n)
    # the synth corpus plants a hot host: the sketch must rank it first
    hot = max(exact, key=exact.get)
    assert cms.estimateCount(hot) == max(
        cms.estimateCount(h) for h in exact
    )


def test_bloom_build_merge_associativity(spark):
    """The word bitmap must be topology-independent: the same filter
    must come out of an 8-partition build and a 2-partition build of
    the same rows (the property that makes the build a valid partial
    aggregate across executors)."""
    from text_extraction_evaluation_spark.functions.sketch import (
        bloom_build,
        bloom_params,
    )
    from text_extraction_evaluation_spark.sources.readers import pages_df

    pages = pages_df(spark, SF0001, n_partitions=8).select("url").distinct()
    m, k = bloom_params(500, 0.01)
    assert bloom_build(pages, "url", m, k) == bloom_build(
        pages.coalesce(2), "url", m, k
    )


def test_bloom_in_plan_md5_variant_matches_collected_build(spark):
    """The collect-free build (bloom_words_df + one-row map probe, the
    form registered queries compose) must agree with the driver-collect
    build on every probe, for the md5 position family; and the md5
    family keeps the no-false-negative guarantee."""
    from text_extraction_evaluation_spark.functions.sketch import (
        _bit_mask,
        bloom_might_contain,
        bloom_positions_md5,
        bloom_words_df,
    )
    from text_extraction_evaluation_spark.sources.readers import pages_df

    pages = pages_df(spark, SF0001, n_partitions=8).select("url").distinct()
    m, k = 4096, 3
    # driver-collect build, md5 positions via monkey-free param threading
    words = bloom_words_df(pages, "url", m, k, positions=bloom_positions_md5)
    rows = {int(r.w): int(r.bits) for r in words.collect()}
    bitmap = [rows.get(i, 0) for i in range(m // 64)]

    wm = words.groupBy().agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("bits")).alias("wm")
    )
    probes = pages.unionByName(
        spark.range(500).select(
            F.concat(F.lit("http://unseen"), "id", F.lit(".example/x")).alias("url")
        )
    )
    in_plan = F.forall(
        bloom_positions_md5(F.col("url"), m, k),
        lambda p: (
            F.coalesce(
                F.try_element_at(F.col("wm"), (p / 64).cast("long")),
                F.lit(0).cast("long"),
            ).bitwiseAND(_bit_mask(p))
            != 0
        ),
    )
    got = (
        probes.join(F.broadcast(wm))
        .select("url", in_plan.alias("maybe"))
        .toPandas()
    )
    import pandas as pd

    want = probes.select(
        "url",
        bloom_might_contain(
            F.col("url"), bitmap, m, k, positions=bloom_positions_md5
        ).alias("maybe"),
    ).toPandas()
    merged = got.merge(want, on="url", suffixes=("_plan", "_collect"))
    assert (merged["maybe_plan"] == merged["maybe_collect"]).all()
    # no false negatives on the seen set
    seen = pages.count()
    hits = (
        pages.join(F.broadcast(wm))
        .filter(in_plan)
        .count()
    )
    assert hits == seen
