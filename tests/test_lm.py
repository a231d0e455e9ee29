"""Semantic properties of the LM-curation stages (plans.q_lm) that the
value-matching DuckDB twins cannot express: construction invariants of
the perplexity LM, the DSIR weight direction, packing geometry, and
funnel monotonicity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def ppl(spark):
    from text_extraction_evaluation_spark.plans.q_lm import lm_perplexity_score

    return lm_perplexity_score(spark, SF0001).cache()


def test_reference_docs_have_zero_oov(ppl):
    """Every reference-slice doc contributed its own bigrams to the LM,
    so none of its bigrams can be unseen — n_oov == 0 by construction.
    (A violation means the LM was trained on a different slice than
    the is_ref flag claims.)"""
    assert ppl.filter(F.col("is_ref") & (F.col("n_oov") > 0)).count() == 0


def test_oov_docs_score_worse(ppl):
    """Smoothed unseen bigrams carry the maximum NLL for their context,
    so among non-ref docs, those with more OOV mass must average a
    higher NLL than fully-covered ones."""
    rows = (
        ppl.filter(~F.col("is_ref"))
        .groupBy((F.col("n_oov") * 2 > F.col("n_bigrams")).alias("mostly_oov"))
        .agg(F.avg("avg_nll").alias("m"))
        .collect()
    )
    m = {r.mostly_oov: r.m for r in rows}
    if True in m and False in m:
        assert m[True] > m[False]


def test_dsir_weights_favor_target(spark):
    """Importance weights exist to up-rank target-like docs: the mean
    log-weight of the target slice must exceed the raw remainder's
    (target docs' features are, by construction, counted in
    p_target)."""
    from text_extraction_evaluation_spark.plans.q_lm import (
        dsir_importance_weights,
    )

    rows = (
        dsir_importance_weights(spark, SF0001)
        .groupBy("is_target")
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    )
    m = {r.is_target: r.m for r in rows}
    assert m[True] > m[False]


def test_sequence_packing_geometry(spark):
    """Packing coordinates must be loader-consistent: offsets inside
    the budget, spans_boundary exactly when offset + n_tokens
    overflows it, and each shard's sequence count bounded by its
    token mass."""
    from text_extraction_evaluation_spark.plans.q_lm import (
        PACK_SEQ_LEN,
        sequence_packing,
    )

    d = sequence_packing(spark, SF0001).cache()
    assert (
        d.filter(
            (F.col("seq_offset") < 0) | (F.col("seq_offset") >= PACK_SEQ_LEN)
        ).count()
        == 0
    )
    bad_span = d.filter(
        F.col("spans_boundary")
        != (F.col("seq_offset") + F.col("n_tokens") > PACK_SEQ_LEN)
    )
    assert bad_span.count() == 0
    per_shard = d.groupBy("shard").agg(
        F.max("seq_idx").alias("max_seq"), F.sum("n_tokens").alias("tok")
    )
    assert (
        per_shard.filter(
            F.col("max_seq") > F.col("tok") / PACK_SEQ_LEN
        ).count()
        == 0
    )
    d.unpersist()


def test_funnel_is_monotone_and_chained(spark):
    """The census must be a true funnel: n_out <= n_in at every stage
    and stage k's intake is exactly stage k-1's survivors."""
    from text_extraction_evaluation_spark.plans.q_lm import curation_funnel

    rows = sorted(
        curation_funnel(spark, SF0001).collect(), key=lambda r: r.stage_ord
    )
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_out <= r.n_in
        assert r.n_dropped == r.n_in - r.n_out
    for prev, cur in zip(rows, rows[1:], strict=False):
        assert cur.n_in == prev.n_out


def test_passage_chunk_census_matches_pandas_recompute(spark):
    """Chunk geometry is pure integer math on token counts — recompute
    it doc-by-doc in pandas and assert the census equals it exactly."""
    import pandas as pd

    from tests.conftest import SF0001
    from text_extraction_evaluation_spark.plans.queries import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        passage_chunk_census,
    )

    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    want = {}
    for _, r in docs.iterrows():
        n = len(r["text"].strip().split())
        starts = list(range(0, max(n, 1), CHUNK_STRIDE))
        d = want.setdefault(r["lang"], [0, 0, 0, 0])
        d[0] += 1
        d[1] += len(starts)
        d[2] += sum(min(CHUNK_TOKENS, n - s) for s in starts)
        d[3] += n
    got = {r["lang"]: r for r in passage_chunk_census(spark, SF0001).collect()}
    assert set(got) == set(want)
    for lang, (n_docs, n_chunks, ctok, dtok) in want.items():
        g = got[lang]
        assert (g["n_docs"], g["n_chunks"]) == (n_docs, n_chunks)
        assert (g["sum_chunk_tokens"], g["sum_doc_tokens"]) == (ctok, dtok)
        assert g["expansion_ratio"] == round(ctok / dtok, 6)
        # stride < window => overlap => strictly more chunk tokens
        assert ctok > dtok
