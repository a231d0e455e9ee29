"""Semantic invariants for the SCD-2 temporal-table builders and the
per-group top-k sampler — beyond the DuckDB twins (which pin values),
these assert the INTERVAL ALGEBRA the operators promise:

* scd2_page_history — every url ends with exactly one open version;
  closed intervals exist iff the url was recrawled with changed bytes,
  and on the fixtures each closed interval spans exactly the 86400 s
  between the two synthetic crawls.
* q_user_state_scd2 — each user owns exactly one open run (their
  current state), so the per-state open counts sum to the number of
  distinct users in the stream.
* doc_sample_group_topk — the salted two-stage top-k returns exactly
  the same rows as the naive single-stage rank (the salt is a pure
  parallelism lever), with contiguous ranks 1..min(k, |group|).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from tests.conftest import SF0001


def test_scd2_page_history_interval_algebra(spark):
    from text_extraction_evaluation_spark.plans.q_webtext import scd2_page_history
    from text_extraction_evaluation_spark.sources.synth import (
        SECOND_CRAWL_MOD,
        SECOND_CRAWL_REM,
    )

    hist = scd2_page_history(spark, SF0001).collect()
    n_urls = sum(r.n_urls for r in hist)
    n_current = sum(r.n_current for r in hist)
    n_closed = sum(r.n_closed for r in hist)
    n_versions = sum(r.n_versions for r in hist)
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    n_docs = docs.count()
    n_recrawled = docs.filter(
        F.col("doc_id") % SECOND_CRAWL_MOD == SECOND_CRAWL_REM
    ).count()
    assert n_urls == n_docs
    assert n_current == n_urls  # one open version per url
    assert n_closed == n_recrawled  # template rotation = raw change
    assert n_versions == n_current + n_closed
    # each closed interval spans exactly the synthetic 1-day recrawl gap
    assert sum(r.closed_duration_sec for r in hist) == 86400 * n_closed


def test_user_state_scd2_one_open_run_per_user(spark):
    from text_extraction_evaluation_spark.plans.q_relational import q_user_state_scd2

    census = q_user_state_scd2(spark, SF0001).collect()
    ev = spark.read.parquet(f"{SF0001}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_open for r in census) == n_users
    assert sum(r.n_runs for r in census) >= n_users
    # dwell time only accrues on closed runs; it is non-negative
    assert all(r.closed_dwell_sec >= 0 for r in census)


def _log_df(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [
            ("h.example", url, dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), h)
            for url, t, h in rows
        ],
        "host string, url string, warc_ts timestamp, raw_h string",
    )


def test_scd2_merge_equals_rebuild_multi_change(spark):
    from text_extraction_evaluation_spark.operators.temporal import (
        build_scd2,
        merge_scd2_increment,
    )

    # url A: 4 crawls, hash pattern h1 h1 h2 h3 (one no-op recrawl, two
    # changes); url B: single crawl; url C: born inside the increment
    # with an immediate change
    log = [
        ("A", 0, "h1"), ("A", 1, "h1"), ("A", 2, "h2"), ("A", 3, "h3"),
        ("B", 0, "hb"),
        ("C", 5, "hc1"), ("C", 6, "hc2"),
    ]
    full = _log_df(spark, log)
    first = _log_df(spark, [r for r in log if r[1] == 0])
    delta = _log_df(spark, [r for r in log if r[1] > 0])

    rebuilt = {tuple(r) for r in build_scd2(full).collect()}
    merged_df = merge_scd2_increment(build_scd2(first), delta)
    merged = {tuple(r) for r in merged_df.collect()}
    assert merged == rebuilt
    # spot-check the interval algebra: A has 3 versions, the no-op
    # recrawl at t=1 created none; C's first version is closed
    a = sorted(r for r in merged if r[1] == "A")
    assert [v[2] for v in a] == [1, 2, 3]
    assert a[0][5] is not None and a[2][5] is None
    c = sorted(r for r in merged if r[1] == "C")
    assert len(c) == 2 and c[0][5] is not None and c[1][5] is None


def test_scd2_merge_equals_rebuild_randomized(spark):
    """Property check, 200 independent url histories in ONE Spark run
    (each url group is its own case): random hash sequences (runs of
    repeats, changes, alternations), random history depth 1..8, and a
    random per-url seed/increment SPLIT POINT — merge(build(seed),
    delta) must equal build(full) for every url."""
    import random

    from text_extraction_evaluation_spark.operators.temporal import (
        build_scd2,
        merge_scd2_increment,
    )

    rng = random.Random(42)
    log, seed_rows, delta_rows = [], [], []
    for u in range(200):
        url = f"u{u}"
        depth = rng.randint(1, 8)
        # first `split` crawls seed the history; split=0 => the url is
        # born inside the increment, split=depth => untouched pass-through
        split = rng.randint(0, depth)
        h = rng.randint(1, 3)
        for t in range(depth):
            # 50% chance the recrawl changed bytes
            if t and rng.random() < 0.5:
                h = h + 1 if rng.random() < 0.7 else h - 1
            row = (url, t, f"h{h}")
            log.append(row)
            (seed_rows if t < split else delta_rows).append(row)

    rebuilt = {tuple(r) for r in build_scd2(_log_df(spark, log)).collect()}
    merged = merge_scd2_increment(
        build_scd2(_log_df(spark, seed_rows)), _log_df(spark, delta_rows)
    )
    assert {tuple(r) for r in merged.collect()} == rebuilt


def test_scd2_merge_drops_late_arrivals(spark):
    from text_extraction_evaluation_spark.operators.temporal import (
        build_scd2,
        merge_scd2_increment,
    )

    hist = build_scd2(_log_df(spark, [("A", 5, "h1")]))
    late = _log_df(spark, [("A", 2, "h0"), ("A", 5, "h1b")])
    merged = merge_scd2_increment(hist, late).collect()
    # both increment rows are at-or-before the open version -> no-op
    assert {tuple(r) for r in merged} == {tuple(r) for r in hist.collect()}


def test_group_topk_salt_is_semantics_free(spark):
    from text_extraction_evaluation_spark.plans.q_embedding import (
        GSAMPLE_K,
        doc_sample_group_topk,
    )

    got = doc_sample_group_topk(spark, SF0001)
    rows = {(r.doc_id, r.lang, r.rank) for r in got.collect()}

    # naive single-stage rank over the same deterministic priorities
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("gsample:"), F.col("doc_id").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h + 1).cast("double") / F.lit(float(1 << 48))
    lnq = F.round(F.log(u) * 1e9).cast("bigint")
    pri = (-lnq).cast("double") / F.greatest("n_chars", F.lit(1)).cast("double")
    w = Window.partitionBy("lang").orderBy(F.asc("priority"), F.asc("doc_id"))
    naive = (
        docs.withColumn("priority", pri)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= GSAMPLE_K)
    )
    want = {(r.doc_id, r.lang, r.rank) for r in naive.collect()}
    assert rows == want

    # contiguous ranks 1..min(k, |group|) in every language
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_lang: dict[str, list[int]] = {}
    for doc_id, lang, rank in rows:
        per_lang.setdefault(lang, []).append(rank)
    for lang, ranks in per_lang.items():
        assert sorted(ranks) == list(range(1, min(GSAMPLE_K, sizes[lang]) + 1))
