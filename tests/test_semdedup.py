"""SemDeDup (semantic_dedup_census) semantics on a planted corpus.

The cross-engine value check lives in test_queries_oracle (the query
is in SQL_CHECKED); here we pin the SURVIVOR RULE itself — keep the
member with the lowest (centroid_sim, vec_id) — on a tiny corpus with
planted exact duplicates, plus the census invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from text_extraction_evaluation_spark.plans.q_extraction import (
    semantic_dedup_census,
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """12 vectors in 2 obvious blobs; vec 10 == vec 11 (exact dup) in
    the second blob. k-means init takes vec_id < k, so keep k=8 happy
    by making the first 8 vectors spread across both blobs."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(12):
        blob = i % 2
        base = np.full(64, 10.0 if blob == 0 else -10.0)
        v = base + rng.normal(0, 0.05, 64)
        rows.append((i, v.astype(np.float32), blob))
    # exact duplicate: vec 11 := vec 10
    rows[11] = (11, rows[10][1].copy(), rows[10][2])
    d = tmp_path_factory.mktemp("semdedup")
    pd.DataFrame(
        [(i, list(map(float, v)), b) for i, v, b in rows],
        columns=["vec_id", "embedding", "label"],
    ).to_parquet(d / "embeddings.parquet")
    return str(d)


def test_census_invariants_and_planted_dup(spark, planted_dir):
    pdf = (
        semantic_dedup_census(spark, planted_dir, k=2, iters=2, tau=0.99)
        .toPandas()
        .sort_values("cid")
    )
    # invariants
    assert (pdf["n_kept"] == pdf["n_members"] - pdf["n_dropped"]).all()
    assert (pdf["n_dropped"] <= pdf["n_members"]).all()
    assert int(pdf["n_members"].sum()) == 12
    # the planted exact-dup pair is the only cosine >= 0.99 relation
    # with distinct keys guaranteed to exceed tau; at least that one
    # drop must happen, in exactly one cluster
    assert int(pdf["n_dropped"].sum()) >= 1
    assert int(pdf["n_dup_pairs"].sum()) >= 1


def test_tau_one_point_one_drops_nothing(spark, planted_dir):
    """tau > 1 makes every pair fail the threshold: census rows still
    appear (one per non-empty cluster) with zero drops — the
    empty-duplicate-set path."""
    pdf = semantic_dedup_census(
        spark, planted_dir, k=2, iters=2, tau=1.1
    ).toPandas()
    assert (pdf["n_dropped"] == 0).all()
    assert (pdf["n_dup_pairs"] == 0).all()
    assert (pdf["n_kept"] == pdf["n_members"]).all()
    assert int(pdf["n_members"].sum()) == 12
