"""ANN index lifecycle: persist the learned IVF coarse quantizer once,
reload it for any number of probe queries.

At 100 TB the k-means training pass over 10^9+ vectors is orders of
magnitude more expensive than a probe; production systems train once,
commit the centroid table, and every query-side job loads it instead
of re-running Lloyd iterations. LocalCatalog gives the same
atomic-commit/idempotent-build semantics as the extraction tables (the
Iceberg seam), so a crashed index build never publishes a partial
quantizer and a re-build with the same id is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import LocalCatalog

INDEX_TABLE = "ivf_centroids"


def build_kmeans_index(
    spark: SparkSession,
    sf_dir: str,
    cat_root: str,
    k: int = 8,
    iters: int = 3,
) -> bool:
    """Train the integer-exact Lloyd quantizer and commit it. Returns
    False if an index with the same (k, iters) is already committed
    (idempotent re-build, same contract as chunk commits)."""
    from ..plans.q_extraction import _kmeans_centroids

    cent = _kmeans_centroids(spark, sf_dir, k, iters)
    cat = LocalCatalog(cat_root)
    return cat.commit_append(
        cent, INDEX_TABLE, chunk_id=f"k{k}-i{iters}",
        meta={"k": k, "iters": iters, "sf_dir": sf_dir},
    )


def load_kmeans_index(spark: SparkSession, cat_root: str) -> DataFrame | None:
    """Committed quantizer (cid, cq: array<bigint>, n_members), or None
    if no build has been committed."""
    return LocalCatalog(cat_root).read(spark, INDEX_TABLE)


def ivf_topk_with_index(
    spark: SparkSession,
    sf_dir: str,
    cat_root: str,
    nprobe: int = 2,
    topk: int = 3,
    n_queries: int = 10,
) -> DataFrame:
    """The query-side IVF probe against a PERSISTED quantizer — the
    same dequantize + map-side-argmin probe as ann_ivf_kmeans_topk but
    loading centroids from the catalog instead of re-training."""
    from ..plans.q_embedding import _emb_with_norm, _ivf_probe

    cent_q = load_kmeans_index(spark, cat_root)
    if cent_q is None:
        raise ValueError(f"no committed {INDEX_TABLE} under {cat_root}")
    cv = F.transform("cq", lambda x: x / F.lit(1e6))
    cent = cent_q.select("cid", cv.alias("cv"))
    cn = F.sqrt(
        F.aggregate(
            F.transform("cv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    cent = cent.withColumn("cn", cn)
    base = _emb_with_norm(spark, sf_dir)
    return _ivf_probe(base, cent, nprobe=nprobe, topk=topk, n_queries=n_queries)


# -- incremental MinHash-LSH index maintenance -------------------------------

MINHASH_INDEX_TABLE = "minhash_bands"


def append_minhash_chunk(
    spark: SparkSession,
    docs: DataFrame,
    cat_root: str,
    chunk_id: str,
    max_bucket_size: int = 1000,
) -> DataFrame | None:
    """Incremental near-dup maintenance: given only the NEW documents
    of a rolling crawl, emit every new candidate pair — new-vs-index
    (an equi-join of the new band rows against the committed band
    table) plus new-vs-new (`candidate_pairs` over the new rows only)
    — then commit the new band rows so the index grows. This is the
    change-data-feed consumer `LocalCatalog.read_diff` exists for: per
    increment the work is O(|new| * bucket occupancy), never a re-scan
    of the historical corpus, and old-vs-old pairs are never re-derived.

    The probe side carries the same degenerate-bucket guard as
    `candidate_pairs`: an index bucket larger than ``max_bucket_size``
    contributes only its min doc_id as a hub pair (O(|new|) rows, CC
    connectivity preserved through the hub) instead of its full
    membership (O(|new| * k) rows).

    Returns the candidate-pair DataFrame (doc_id_a < doc_id_b), or
    None when ``chunk_id`` is already committed (idempotent re-run —
    its pairs were emitted by the original run)."""
    from pyspark.sql.window import Window

    from .dedup import candidate_pairs, minhash_band_rows

    cat = LocalCatalog(cat_root)
    if cat.is_committed(MINHASH_INDEX_TABLE, chunk_id):
        return None
    bands_new = minhash_band_rows(docs)
    pairs = candidate_pairs(bands_new, max_bucket_size=max_bucket_size)
    existing = cat.read(spark, MINHASH_INDEX_TABLE)
    if existing is not None:
        w = Window.partitionBy("band", "band_key")
        old = (
            existing.withColumn("n_old", F.count(F.lit(1)).over(w))
            .withColumn("min_old", F.min("doc_id").over(w))
            .select(
                F.col("doc_id").alias("old_id"), "band", "band_key",
                "n_old", "min_old",
            )
        )
        probe = bands_new.select("doc_id", "band", "band_key")
        cross_small = (
            probe.join(old.filter(F.col("n_old") <= max_bucket_size),
                       ["band", "band_key"])
            .select("doc_id", F.col("old_id").alias("other"))
        )
        cross_big = (
            probe.join(
                old.filter(F.col("n_old") > max_bucket_size)
                .select("band", "band_key", "min_old").distinct(),
                ["band", "band_key"],
            )
            .select("doc_id", F.col("min_old").alias("other"))
        )
        cross = (
            cross_small.unionByName(cross_big)
            .filter(F.col("doc_id") != F.col("other"))
            .select(
                F.least("doc_id", "other").alias("doc_id_a"),
                F.greatest("doc_id", "other").alias("doc_id_b"),
            )
        )
        pairs = pairs.unionByName(cross).distinct()
    cat.commit_append(
        bands_new, MINHASH_INDEX_TABLE, chunk_id, meta={"kind": "minhash_bands"}
    )
    return pairs
