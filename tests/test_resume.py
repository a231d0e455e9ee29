"""Resume/lineage tests (SURVEY.md §5.2 item 4; BASELINE.json:6,14):
kill after k chunk commits, re-run, assert the final table equals a
single-run table with no url extracted twice, and that lineage rows
cover every partition."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def pages(spark):
    from text_extraction_evaluation_spark.operators.extract import latest_crawl
    from text_extraction_evaluation_spark.sources.readers import pages_df

    return latest_crawl(pages_df(spark, SF0001, n_partitions=8)).cache()


def _texts(spark, root):
    from text_extraction_evaluation_spark.plans.jobs import read_extracted

    df = read_extracted(spark, root)
    return {r["url"]: r["text"] for r in df.collect()}


def test_resume_after_injected_failure(spark, pages, tmp_path_factory):
    from text_extraction_evaluation_spark.plans.jobs import (
        ChunkFailure,
        run_extraction_job,
    )
    from text_extraction_evaluation_spark.sources.catalog import LocalCatalog

    root_a = str(tmp_path_factory.mktemp("run_resumed"))
    root_b = str(tmp_path_factory.mktemp("run_single"))

    with pytest.raises(ChunkFailure):
        run_extraction_job(spark, pages, root_a, n_buckets=8,
                           buckets_per_chunk=2, fail_after_chunks=2)
    cat = LocalCatalog(root_a)
    n_after_fail = len(cat.committed_chunks("extracted"))
    assert n_after_fail == 2

    # resume: completes the remaining chunks, skips committed ones
    run_extraction_job(spark, pages, root_a, n_buckets=8, buckets_per_chunk=2)
    assert len(cat.committed_chunks("extracted")) == 4

    run_extraction_job(spark, pages, root_b, n_buckets=8, buckets_per_chunk=2)

    a = _texts(spark, root_a)
    b = _texts(spark, root_b)
    assert a == b  # byte-identical resumed vs single-run output

    # no url extracted twice
    from text_extraction_evaluation_spark.plans.jobs import read_extracted

    df = read_extracted(spark, root_a)
    assert df.count() == df.select("url").distinct().count() == pages.count()


def test_concurrent_chunks_resume_and_match_serial(spark, pages, tmp_path_factory):
    """Chunk-parallel orchestration (thread pool, >=2 chunks in flight):
    injected failure mid-run, concurrent resume, output byte-identical
    to the serial single run and no url extracted twice."""
    from text_extraction_evaluation_spark.plans.jobs import (
        ChunkFailure,
        read_extracted,
        run_extraction_job,
    )
    from text_extraction_evaluation_spark.sources.catalog import LocalCatalog

    root_p = str(tmp_path_factory.mktemp("run_parallel"))
    root_s = str(tmp_path_factory.mktemp("run_serial2"))

    with pytest.raises(ChunkFailure):
        run_extraction_job(spark, pages, root_p, n_buckets=8, buckets_per_chunk=2,
                           fail_after_chunks=2, max_concurrent_chunks=3)
    cat = LocalCatalog(root_p)
    # under concurrency, in-flight chunks past the failure may still
    # commit — at least the k counted ones are in the manifest
    assert len(cat.committed_chunks("extracted")) >= 2

    run_extraction_job(spark, pages, root_p, n_buckets=8, buckets_per_chunk=2,
                       max_concurrent_chunks=3)
    assert len(cat.committed_chunks("extracted")) == 4

    run_extraction_job(spark, pages, root_s, n_buckets=8, buckets_per_chunk=2)
    assert _texts(spark, root_p) == _texts(spark, root_s)

    df = read_extracted(spark, root_p)
    assert df.count() == df.select("url").distinct().count() == pages.count()


def test_rerun_is_idempotent_noop(spark, pages, tmp_path_factory):
    from text_extraction_evaluation_spark.plans.jobs import run_extraction_job
    from text_extraction_evaluation_spark.sources.catalog import LocalCatalog

    root = str(tmp_path_factory.mktemp("run_idem"))
    run_extraction_job(spark, pages, root, n_buckets=4, buckets_per_chunk=2)
    cat = LocalCatalog(root)
    before = cat.committed_chunks("extracted")
    run_extraction_job(spark, pages, root, n_buckets=4, buckets_per_chunk=2)
    after = cat.committed_chunks("extracted")
    assert before == after  # same commits, same timestamps: nothing re-ran


def test_time_travel_reads_commit_prefix(spark, pages, tmp_path_factory):
    """read(as_of=k) sees exactly the first k commits — the
    LocalCatalog analogue of Iceberg VERSION AS OF."""
    from text_extraction_evaluation_spark.plans.jobs import run_extraction_job
    from text_extraction_evaluation_spark.sources.catalog import LocalCatalog

    root = str(tmp_path_factory.mktemp("run_tt"))
    run_extraction_job(spark, pages, root, n_buckets=8, buckets_per_chunk=2)
    cat = LocalCatalog(root)
    full = cat.read(spark, "extracted").count()
    counts = [cat.read(spark, "extracted", as_of=k).count() for k in range(1, 5)]
    assert counts[-1] == full
    assert all(a < b for a, b in zip(counts, counts[1:]))  # strictly growing
    assert cat.read(spark, "extracted", as_of=0) is None
    # as_of=k row set == union of the first k committed chunk files
    ordered = sorted(
        cat.committed_chunks("extracted").values(),
        key=lambda c: c["committed_at_unix"],
    )
    two = spark.read.parquet(*[c["path"] for c in ordered[:2]]).count()
    assert cat.read(spark, "extracted", as_of=2).count() == two


def test_run_metrics_lineage(spark, pages, tmp_path_factory):
    from text_extraction_evaluation_spark.plans.jobs import run_extraction_job
    from text_extraction_evaluation_spark.sources.catalog import LocalCatalog

    root = str(tmp_path_factory.mktemp("run_metrics"))
    run_extraction_job(spark, pages, root, n_buckets=4, buckets_per_chunk=2)
    cat = LocalCatalog(root)
    rm = cat.read(spark, "run_metrics").collect()
    assert rm, "no lineage rows"
    total_docs = sum(r["n_docs"] for r in rm)
    assert total_docs == pages.count()
    buckets = {r["url_bucket"] for r in rm}
    assert buckets == set(range(4))
    for r in rm:
        assert r["n_ok"] + r["n_err"] <= r["n_docs"]
        assert r["bytes_in"] > 0
        assert r["t_end"] >= r["t_start"]


def test_four_in_flight_failure_manifest_consistent(spark, pages, tmp_path_factory):
    """>=4 chunks in flight with an injected mid-flight failure: the
    manifest must stay consistent (unique commit seqs, every committed
    path readable), fail-fast must cancel the queued tail, and a
    concurrent resume must complete to the exact single-run output."""
    from text_extraction_evaluation_spark.plans.jobs import (
        ChunkFailure,
        read_extracted,
        run_extraction_job,
    )
    from text_extraction_evaluation_spark.sources.catalog import LocalCatalog

    root = str(tmp_path_factory.mktemp("run_par4"))
    with pytest.raises(ChunkFailure):
        run_extraction_job(spark, pages, root, n_buckets=16, buckets_per_chunk=2,
                           fail_after_chunks=3, max_concurrent_chunks=4)
    cat = LocalCatalog(root)
    committed = cat.committed_chunks("extracted")
    # the 3 counted commits are durable; fail-fast cancelled the queued
    # tail (in-flight chunks may still land — never all 8)
    assert 3 <= len(committed) < 8
    seqs = [c["seq"] for c in committed.values()]
    assert len(set(seqs)) == len(seqs)  # commit sequence has no ties
    for c in committed.values():
        assert spark.read.parquet(c["path"]).count() > 0  # no torn chunk

    run_extraction_job(spark, pages, root, n_buckets=16, buckets_per_chunk=2,
                       max_concurrent_chunks=4)
    assert len(cat.committed_chunks("extracted")) == 8
    df = read_extracted(spark, root)
    assert df.count() == df.select("url").distinct().count() == pages.count()


def test_vacuum_reclaims_orphan_staging_only(spark, pages, tmp_path_factory):
    """vacuum() removes staging dirs orphaned by hard-killed commit
    attempts and never touches committed chunks; a failed (exception)
    commit cleans its own staging dir without vacuum."""
    import os

    from text_extraction_evaluation_spark.plans.jobs import run_extraction_job
    from text_extraction_evaluation_spark.sources.catalog import LocalCatalog

    root = str(tmp_path_factory.mktemp("vacuum"))
    run_extraction_job(spark, pages, root, n_buckets=4, buckets_per_chunk=2)
    cat = LocalCatalog(root)
    before = set(cat.committed_chunks("extracted"))
    assert before

    # a failed attempt must not leak staging (finally-cleanup)
    class Boom(Exception):
        pass

    class _Exploding:
        write = property(lambda self: (_ for _ in ()).throw(Boom()))

    with pytest.raises(Boom):
        cat.commit_append(_Exploding(), "extracted", "bZZZZ-ZZZZ")
    tdir = os.path.join(root, "extracted")
    assert not [p for p in os.listdir(tdir) if ".staging-" in p]

    # simulate a hard-killed attempt: orphan staging dir on disk
    orphan = os.path.join(tdir, "chunk=b9999-9999.staging-deadbeef")
    os.makedirs(orphan)
    removed = cat.vacuum("extracted")
    assert removed == [orphan]
    assert not os.path.exists(orphan)
    assert set(cat.committed_chunks("extracted")) == before
    for c in cat.committed_chunks("extracted").values():
        assert spark.read.parquet(c["path"]).count() > 0


def test_read_diff_is_incremental_append_scan(spark, pages, tmp_path_factory):
    """read_diff(from, to) == the rows added in that commit window:
    diffs partition the table (prefix + diff == larger prefix), the
    full-range diff equals the full table, and empty/invalid windows
    return None — the change-data feed a downstream consumer tails."""
    from text_extraction_evaluation_spark.plans.jobs import run_extraction_job
    from text_extraction_evaluation_spark.sources.catalog import LocalCatalog

    root = str(tmp_path_factory.mktemp("run_diff"))
    run_extraction_job(spark, pages, root, n_buckets=8, buckets_per_chunk=2)
    cat = LocalCatalog(root)
    n_commits = len(cat.committed_chunks("extracted"))
    assert n_commits >= 3
    full = cat.read(spark, "extracted").count()

    assert cat.read_diff(spark, "extracted", 0, n_commits).count() == full
    for k in range(1, n_commits):
        prefix = cat.read(spark, "extracted", as_of=k).count()
        nxt = cat.read(spark, "extracted", as_of=k + 1).count()
        assert cat.read_diff(spark, "extracted", k, k + 1).count() == nxt - prefix
    assert cat.read_diff(spark, "extracted", 2, 2) is None
    assert cat.read_diff(spark, "extracted", 3, 2) is None
    assert cat.read_diff(spark, "extracted", n_commits, n_commits + 5) is None
