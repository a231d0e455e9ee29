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
