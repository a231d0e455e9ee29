"""The resumable curation job (plans.mix_jobs): failure-injected
resume converges to the single-shot result, corpus-level artifacts are
computed once, the chunked job equals the one-plan funnel census, and
the committed pack index is loader-consistent."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def single_shot(spark, tmp_path_factory):
    from text_extraction_evaluation_spark.plans.mix_jobs import run_curation_job

    out = str(tmp_path_factory.mktemp("mix_single"))
    cat = run_curation_job(spark, SF0001, out)
    return cat


def test_job_matches_funnel_census(spark, single_shot):
    """The chunked job must keep EXACTLY the docs the one-plan funnel
    keeps: total curated count == the funnel's final n_out, and the
    summed per-chunk lineage reproduces every stage total."""
    from text_extraction_evaluation_spark.plans.q_lm import curation_funnel

    funnel = {
        r.stage: (r.n_in, r.n_out)
        for r in curation_funnel(spark, SF0001).collect()
    }
    curated = single_shot.read(spark, "curated")
    assert curated.count() == funnel["ppl_tail"][1]
    m = single_shot.read(spark, "curation_metrics").agg(
        *[
            F.sum(c).alias(c)
            for c in [
                "n_in", "n_exact", "n_quality", "n_repetition",
                "n_near_dup", "n_kept",
            ]
        ]
    ).collect()[0]
    assert m.n_in == funnel["exact_dedup"][0]
    assert m.n_exact == funnel["exact_dedup"][1]
    assert m.n_quality == funnel["quality"][1]
    assert m.n_repetition == funnel["repetition"][1]
    assert m.n_near_dup == funnel["near_dup"][1]
    assert m.n_kept == funnel["ppl_tail"][1]


def test_resume_converges_and_reuses_artifacts(spark, tmp_path, single_shot):
    """Fail after 1 chunk, re-run: the final curated doc set equals
    the single-shot run (no doc lost, none kept twice), and the
    artifact tables carry exactly one committed chunk (not rebuilt by
    the resume)."""
    from text_extraction_evaluation_spark.plans.jobs import ChunkFailure
    from text_extraction_evaluation_spark.plans.mix_jobs import run_curation_job

    out = str(tmp_path / "mix_resume")
    with pytest.raises(ChunkFailure):
        run_curation_job(spark, SF0001, out, fail_after_chunks=1)
    cat = run_curation_job(spark, SF0001, out)
    got = sorted(
        r.doc_id for r in cat.read(spark, "curated").select("doc_id").collect()
    )
    want = sorted(
        r.doc_id
        for r in single_shot.read(spark, "curated").select("doc_id").collect()
    )
    assert got == want
    assert len(got) == len(set(got))
    for artifact in ("exact_drops", "near_dup_drops", "ppl_drops"):
        assert list(cat.committed_chunks(artifact)) == ["full"]


def test_pack_index_covers_curated_exactly(spark, single_shot):
    """Every curated doc has exactly one loader coordinate; offsets
    sit inside the budget."""
    from text_extraction_evaluation_spark.plans.q_lm import PACK_SEQ_LEN

    curated = single_shot.read(spark, "curated").select("doc_id")
    pack = single_shot.read(spark, "pack_index")
    assert pack.count() == curated.count()
    assert pack.select("doc_id").distinct().count() == curated.count()
    assert pack.join(curated, "doc_id", "left_anti").count() == 0
    assert (
        pack.filter(
            (F.col("seq_offset") < 0) | (F.col("seq_offset") >= PACK_SEQ_LEN)
        ).count()
        == 0
    )
