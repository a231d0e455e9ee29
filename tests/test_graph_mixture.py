"""Semantic tests for the round-3 corpus operators: host PageRank
invariants on a planted star graph, repetition-filter flag rules on
planted spam, mixture-weight cap behavior, and the decontamination
hot-shingle cap (the oracle sweep in test_queries_oracle checks
cross-engine equality; these check the operators MEAN what they say)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_pagerank_dangling_source_and_mass(spark, tmp_path):
    """Planted graph: the hot host (source=src0 docs) fans out to many
    dst hosts but receives NO inlinks (the edge rule is a bijection of
    doc_id mod N_HOSTS, and skew.example is outside its range), so
    after any iteration its rank must be EXACTLY the damping base
    (15% jump mass, integer-truncated). Total mass stays within
    truncation loss of PR_SCALE, every rank is >= base, and the top
    host must be one receiving the hot host's extra inflow."""
    from text_extraction_evaluation_spark.plans.queries import (
        PR_EDGE_ADD,
        PR_EDGE_MULT,
        PR_ITERS,
        PR_SCALE,
        host_pagerank,
    )
    from text_extraction_evaluation_spark.sources.synth import (
        HOT_HOST_SOURCE,
        N_HOSTS,
    )

    # norm docs cover every host class, so every node has an outlink
    # (no dangling receivers — mass only leaks to DIV truncation);
    # hot docs add skew.example as a pure source fanning out
    hot = [(100 + d, "filler text", "en", HOT_HOST_SOURCE) for d in range(20)]
    norm = [(d, "filler text", "en", "src1") for d in range(N_HOSTS)]
    sf_dir = _write_docs(spark, tmp_path, hot + norm)

    ranks = {r["host"]: r["rank_e12"] for r in host_pagerank(spark, sf_dir).collect()}
    n = len(ranks)
    assert n == N_HOSTS + 1
    base = (15 * (PR_SCALE // n)) // 100
    assert ranks["skew.example"] == base
    assert all(v >= base for v in ranks.values())
    total = sum(ranks.values())
    # truncation loss: < 1 unit per DIV — per iteration that is one per
    # edge (contrib) + two per node (jump base, damping), plus the
    # initial n-way split
    n_edges = N_HOSTS + 20
    max_loss = (2 * n + n_edges) * (PR_ITERS + 1)
    assert PR_SCALE - max_loss <= total <= PR_SCALE
    # every host the hot host links to has strictly more than the
    # no-inlink floor
    skew_targets = {
        f"host{((100 + d) * PR_EDGE_MULT + PR_EDGE_ADD) % N_HOSTS}.example"
        for d in range(20)
    }
    assert all(ranks[h] > base for h in skew_targets)


def test_repetition_flags_planted_spam(spark, tmp_path):
    """A doc that is one token repeated must trip every rule; a doc of
    all-distinct tokens must trip none and have zero dup counts."""
    from text_extraction_evaluation_spark.plans.queries import quality_repetition

    spam = " ".join(["buy"] * 60)
    clean = " ".join(f"w{i}" for i in range(60))
    sf_dir = _write_docs(
        spark, tmp_path,
        [(1, spam, "en", "src1"), (2, clean, "en", "src1")],
    )
    out = {r["doc_id"]: r for r in quality_repetition(spark, sf_dir).collect()}
    assert out[1]["repetitive"] == 1
    assert out[1]["top_token_cnt"] == 60
    assert out[1]["dup_2gram_cnt"] == 58  # 59 bigrams, 1 distinct
    assert out[2]["repetitive"] == 0
    assert out[2]["dup_2gram_cnt"] == 0
    assert out[2]["dup_3gram_cnt"] == 0


def test_mixture_weights_inverse_to_share_and_capped(spark, tmp_path):
    """A tiny cell must get the capped maximum weight; a dominant cell
    must get a sub-1.0 (down-sampling) weight; shares sum to ~1e6."""
    from text_extraction_evaluation_spark.plans.queries import (
        MIXTURE_MAX_WEIGHT_E6,
        corpus_mixture_weights,
    )

    big = [(i, " ".join(["tok"] * 200), "en", "srcA") for i in range(50)]
    tiny = [(100, "one two three", "en", "srcB")]
    sf_dir = _write_docs(spark, tmp_path, big + tiny)
    out = {r["source"]: r for r in corpus_mixture_weights(spark, sf_dir).collect()}
    assert out["srcB"]["weight_e6"] == MIXTURE_MAX_WEIGHT_E6
    assert out["srcB"]["capped"] == 1
    assert out["srcA"]["weight_e6"] < 1_000_000  # down-sample the giant
    assert out["srcA"]["capped"] == 0
    share_sum = sum(r["share_e6"] for r in out.values())
    assert 1_000_000 - len(out) <= share_sum <= 1_000_000


def test_decontam_hot_shingle_capped(spark, tmp_path):
    """A shingle shared by more than DECONTAM_MAX_DF docs is boilerplate
    and must not create contamination hits on its own; a genuine
    bench-corpus copy through cold shingles must still be flagged."""
    from text_extraction_evaluation_spark.plans.queries import (
        DECONTAM_MAX_DF,
        DECONTAM_SHINGLE_N,
        benchmark_decontamination,
    )

    boiler = " ".join(f"b{i}" for i in range(DECONTAM_SHINGLE_N))
    # > cap docs all sharing ONE hot shingle, split across both sides
    # (sources src0-9 = corpus, src10+ = benchmark in the fixture rule)
    n_hot = DECONTAM_MAX_DF + 20
    rows = [
        (i, boiler, "en", "src1" if i % 2 == 0 else "src11")
        for i in range(n_hot)
    ]
    leak = " ".join(f"c{i}" for i in range(DECONTAM_SHINGLE_N + 4))
    rows += [(9_000, leak, "en", "src2"), (9_001, leak, "en", "src12")]
    sf_dir = _write_docs(spark, tmp_path, rows)

    out = {r["doc_id"]: r for r in benchmark_decontamination(spark, sf_dir).collect()}
    assert 9_000 in out  # the real leak is caught through cold shingles
    assert out[9_000]["n_bench_docs"] == 1
    assert all(d == 9_000 for d in out)  # hot-shingle clique suppressed


def test_canonical_url_idempotent_and_edge_cases(spark):
    """canonical(canonical(u)) == canonical(u) for adversarial urls,
    plus spot checks of each normalization rule."""
    from pyspark.sql import functions as F

    from text_extraction_evaluation_spark.functions.text import canonical_url

    urls = [
        "http://HOST3.example:80/12/?utm_source=x&id=5&utm_b=2#frag",
        "http://a.example/p//",
        "http://a.example//",
        "http://a.example",
        "http://a.example/x?b=2&a=1",
        "http://a.example/x?utm_only=1",
        "http://a.example/x?",
        "http://Skew.Example:80/7#s",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select("url", canonical_url(F.col("url")).alias("c1"))
    twice = once.select("url", "c1", canonical_url(F.col("c1")).alias("c2"))
    rows = {r["url"]: (r["c1"], r["c2"]) for r in twice.collect()}
    for u, (c1, c2) in rows.items():
        assert c1 == c2, f"not idempotent for {u!r}: {c1!r} -> {c2!r}"
    # rule-by-rule expectations
    assert rows["http://HOST3.example:80/12/?utm_source=x&id=5&utm_b=2#frag"][0] \
        == "http://host3.example/12?id=5"
    assert rows["http://a.example/p//"][0] == "http://a.example/p"
    assert rows["http://a.example//"][0] == "http://a.example"
    assert rows["http://a.example"][0] == "http://a.example"
    assert rows["http://a.example/x?b=2&a=1"][0] == "http://a.example/x?a=1&b=2"
    assert rows["http://a.example/x?utm_only=1"][0] == "http://a.example/x"
    assert rows["http://a.example/x?"][0] == "http://a.example/x"
    assert rows["http://Skew.Example:80/7#s"][0] == "http://skew.example/7"
