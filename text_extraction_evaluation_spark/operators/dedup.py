"""Deduplication operators for the training-data pipeline.

Exact dedup = hash groupBy (pure JVM). Near-dup = MinHash + LSH:
signatures are computed in an Arrow-vectorized numpy kernel
(``mapInArrow``) because a 16-seed signature as Catalyst higher-order
functions costs ~8 us per interpreted lambda eval — measured ~20x
slower than the kernel — while the shuffle-side (band buckets, pair
generation, jaccard verification) stays JVM-side. The kernel computes
EXACTLY the engine-portable hash family of the SQL formulation
(md5-hex-prefix -> int, xor seeds), so results are byte-equal to the
DuckDB oracle and to the pure-JVM reference implementation
(tests/test_dedup.py asserts both).

Scale shape (100 TB): signatures are a map-only pass over docs; the
only shuffle is (doc_id, band_key) — tiny; bucket pair-generation is
quadratic only within an LSH bucket (bounded by construction; cap
pathological buckets before exploding). Candidate verification joins
shingle sets back for exact jaccard on CANDIDATES only, never all
pairs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    MINHASH_BANDS,
    MINHASH_ROWS_PER_BAND,
    MINHASH_SEEDS,
    tokens_col,
    word_shingles,
)

_SEEDS_ARR = np.array(MINHASH_SEEDS, dtype=np.int64)

BAND_SCHEMA = "doc_id long, band int, band_key string"


def _shingle_set(text: str, n: int = 3) -> list[str]:
    w = text.split()
    if len(w) < n:
        return []
    seen: dict[str, None] = {}
    for i in range(len(w) - n + 1):
        seen[" ".join(w[i : i + n])] = None
    return list(seen)


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def minhash_band_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, text) -> one row per (id, band, band_key). Arrow kernel."""
    pruned = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            doc_ids = batch.column(names.index("doc_id")).to_pylist()
            texts = batch.column(names.index("text")).to_pylist()
            ids: list[int] = []
            bands: list[int] = []
            keys: list[str] = []
            for doc_id, text in zip(doc_ids, texts, strict=True):
                sh = _shingle_set(text or "")
                if not sh:
                    continue
                h = np.array([_md5_int(s) for s in sh], dtype=np.int64)
                sig = np.bitwise_xor(h[None, :], _SEEDS_ARR[:, None]).min(axis=1)
                for b in range(MINHASH_BANDS):
                    part = sig[b * MINHASH_ROWS_PER_BAND : (b + 1) * MINHASH_ROWS_PER_BAND]
                    key = hashlib.md5(
                        ",".join(str(int(v)) for v in part).encode("ascii")
                    ).hexdigest()
                    ids.append(int(doc_id))
                    bands.append(b)
                    keys.append(key)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(bands, pa.int32()),
                    pa.array(keys, pa.string()),
                ],
                names=["doc_id", "band", "band_key"],
            )

    return pruned.mapInArrow(kernel, BAND_SCHEMA)


def candidate_pairs(bands: DataFrame, max_bucket_size: int = 1000) -> DataFrame:
    """LSH band rows -> distinct candidate (doc_id_a < doc_id_b) pairs.
    Bucket-local pair generation: shuffles only (doc_id, band_key).

    Skew guard: a bucket larger than ``max_bucket_size`` (a degenerate
    band — boilerplate shared by millions of crawls) would emit O(n^2)
    pairs and overflow a single executor's collect_list. Oversized
    buckets are star-reduced instead: every member pairs with the
    bucket's min doc_id only — O(n) pairs, computed without ever
    materializing the member array, and connected-components grouping
    still links the whole bucket through the hub. (The documented
    approximation: pairwise verification can miss an a-b link whose hub
    fails verification — acceptable for degenerate buckets, which are
    near-identical by construction.) Bucket size/min come from one
    window over (band, band_key); the small-bucket groupBy reuses that
    exchange, so the guard adds no extra shuffle.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "band_key")
    sized = (
        bands.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("min_id", F.min("doc_id").over(w))
        .filter(F.col("n") > 1)
    )

    buckets = (
        sized.filter(F.col("n") <= max_bucket_size)
        .groupBy("band", "band_key")
        .agg(F.collect_list("doc_id").alias("ids"))
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                "ids",
                lambda x: F.transform(
                    F.col("ids"), lambda y: F.struct(x.alias("a"), y.alias("b"))
                ),
            )
        ),
        lambda s: s["a"] < s["b"],
    )
    all_small = (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("doc_id_a"), F.col("p.b").alias("doc_id_b"))
    )
    star_big = (
        sized.filter((F.col("n") > max_bucket_size) & (F.col("doc_id") != F.col("min_id")))
        .select(F.col("min_id").alias("doc_id_a"), F.col("doc_id").alias("doc_id_b"))
    )
    return all_small.unionByName(star_big).distinct()


def verified_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidates verified with exact 3-gram Jaccard —
    the production near-dup operator: linear signature pass + tiny
    candidate join, never an all-pairs comparison."""
    cands = candidate_pairs(minhash_band_rows(docs, id_col, text_col))
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(tokens_col(text_col)).alias("sh"),
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    # threshold on the UNROUNDED jaccard (like the oracle SQL's WHERE);
    # rounding is display-only
    return (
        cands.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .filter(jac >= threshold)
        .select("doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list -> one row per
    node: (doc_id, component) with component = min node id reachable.

    Iterative min-label propagation WITH pointer jumping: each round a
    node adopts the minimum label in its closed neighborhood, then
    labels compress through the label graph (comp := comp[comp]) —
    plain propagation is O(diameter) rounds, the jumping step makes it
    O(log n) (a 40-node path converges in ~7 rounds, tested). TWO
    propagation rounds run per driver round-trip (lineage truncated
    with one localCheckpoint); convergence is detected by the label
    sum reaching a fixpoint — labels only shrink elementwise, so an
    unchanged sum(comp) is exactly "no label changed", one tiny
    aggregate instead of a join + count per check. Driver round-trips
    dominate wall time on small graphs; halving them matters.
    """
    edges = pairs.select(
        F.col(a_col).cast("long").alias("a"), F.col(b_col).cast("long").alias("b")
    )
    # Materialize the edge list ONCE: upstream `pairs` is typically the
    # whole MinHash+verify pipeline, and without this every propagation
    # round would re-run it from scratch (measured 8s -> ~2s at sf0.1).
    sym = (
        edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    def one_round(lbl: DataFrame) -> DataFrame:
        neigh_min = (
            sym.join(lbl, sym.b == lbl.id)
            .groupBy("a")
            .agg(F.min("comp").alias("neigh_comp"))
        )
        propagated = lbl.join(neigh_min, lbl.id == neigh_min.a, "left").select(
            "id",
            F.least(
                F.col("comp"), F.coalesce(F.col("neigh_comp"), F.col("comp"))
            ).alias("mid_comp"),
        )
        # pointer jumping: comp := comp[comp] (labels only shrink)
        jump = propagated.select(
            F.col("id").alias("jid"), F.col("mid_comp").alias("jcomp")
        )
        return propagated.join(jump, propagated.mid_comp == jump.jid, "left").select(
            "id",
            F.least(
                F.col("mid_comp"), F.coalesce(F.col("jcomp"), F.col("mid_comp"))
            ).alias("comp"),
        )

    prev_sum = None
    for _ in range((max_iter + 1) // 2):
        labels = one_round(one_round(labels)).localCheckpoint()
        cur_sum = labels.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))


def dedup_keep_list(
    docs: DataFrame, threshold: float = 0.8, method: str = "components"
) -> DataFrame:
    """Near-dup removal: returns the surviving (deduplicated) documents.

    ``method='components'`` (default): connected components over the
    verified pair graph, keep exactly one doc per component (the min
    id) — transitive chains a~b~c collapse to one survivor even when
    a and c were never directly compared. ``method='greedy'``: the
    cheaper pairwise policy (drop the larger id of every verified
    pair; no CC iterations) — may keep >1 member of a transitive
    chain, the documented tradeoff when driver round-trips are too
    expensive for a tiny tail of chains."""
    pairs = verified_near_dup_pairs(docs, threshold)
    if method == "greedy":
        drops = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
    elif method == "components":
        comp = connected_components(pairs)
        drops = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    else:
        raise ValueError(f"unknown method {method!r}; use 'components' or 'greedy'")
    return docs.join(drops, "doc_id", "left_anti")
