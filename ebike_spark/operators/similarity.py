"""Similarity search over an embedding column (array<float>).

Not present in the reference (no array types at all, SURVEY §1.3);
Spark-native extension operators:

- brute-force cosine top-k: the exactness baseline. Distributed as a
  map-side cosine + TakeOrderedAndProject (per-partition top-k, then a
  k-row merge on the driver) — no shuffle of the corpus.
- LSH-bucketed ANN: random-hyperplane signatures (sign of dot with
  seeded Gaussian directions) → probe the query's bucket (multi-probe
  over hamming-1 neighbors) → exact rerank. At 100 TB the bucket join
  touches ~corpus/2^bits vectors instead of all of them.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ebike_spark.functions.textfns import cosine_sim, dot
from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table

TOP_K = 10
QUERY_VEC_ID = 0
LSH_PLANES = 12  # 2^12 buckets
# Multi-probe radius. Probability a true neighbor at angle θ flips one
# sign bit is θ/π; this corpus' nearest neighbors sit near cos≈0.5
# (θ≈60°, p≈1/3), so E[flips]≈4 of 12 — probing hamming ≤ 4 yields
# ~0.7 expected recall while touching Σ C(12,0..4)/4096 ≈ 19% of
# buckets. Tighter-clustered corpora (cos ≥ 0.9 dups) would use radius
# 1-2 and probe <1%.
LSH_PROBE_HAMMING = 4
_DIM = 64


def _query_vec(spark: SparkSession, sf: str) -> list[float]:
    """Fetch the query vector (single driver-side row — O(1), not a
    collect of the corpus)."""
    row = (
        load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .first()
    )
    return list(row["v"])


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 4) AS cos
    FROM embeddings, q
    WHERE vec_id != {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) DESC, vec_id
    LIMIT {TOP_K}
    """,
    tags=("similarity", "ann", "topk"),
)
def ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-k to a fixed query vector. The cosine is a pure
    Catalyst higher-order-function expression (zip_with + aggregate), so
    the scan+score stage is one codegen'd pass; orderBy+limit compiles to
    per-partition top-k."""
    qv = F.lit(_query_vec(spark, sf)).cast("array<double>")
    e = load_table(spark, sf, "embeddings").where(F.col("vec_id") != QUERY_VEC_ID)
    cos = cosine_sim(F.col("embedding").cast("array<double>"), qv)
    return (
        e.select("vec_id", cos.alias("_c"))
        .orderBy(F.desc("_c"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("_c", 4).alias("cos"))
    )


def hyperplanes(dim: int = _DIM, planes: int = LSH_PLANES) -> np.ndarray:
    """Deterministic Gaussian hyperplane directions (seeded)."""
    return np.random.RandomState(42).standard_normal((planes, dim))


def lsh_bucket(vec_col, planes: np.ndarray):
    """Bucket id = sign bits of dot(vec, plane_i) — built-in exprs only."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pl = F.lit([float(x) for x in p]).cast("array<double>")
        bucket = bucket + F.when(dot(vec_col, pl) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


IVF_CLUSTERS = 16
IVF_PROBES = 4


@register(
    "ann_ivf_topk",
    oracle=None,  # approximate by design → rows-only; recall vs exact unit-tested
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN: k-means coarse quantizer (pyspark.ml KMeans, seeded) →
    assign every vector to its nearest centroid → probe the query's
    {IVF_PROBES} nearest cells → exact cosine rerank.

    Learned centroids adapt to the data distribution, which sign-LSH
    cannot (see ann_lsh_topk's docstring math for why this corpus is
    the hard regime). At scale: train on a sample, store the cell id as
    a partition/cluster column, probe reads ~{IVF_PROBES}/{IVF_CLUSTERS}
    of the corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    feat = e.select("vec_id", "v", array_to_vector("v").alias("features"))
    km = KMeans(k=IVF_CLUSTERS, seed=42, maxIter=10, featuresCol="features", predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select("vec_id", "v", "cell")

    qv_list = _query_vec(spark, sf)
    import numpy as np

    centers = model.clusterCenters()
    q = np.asarray(qv_list)
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centers]
    probe_cells = [int(i) for i in np.argsort(dists)[:IVF_PROBES]]

    qv = F.lit(qv_list).cast("array<double>")
    cos = cosine_sim(F.col("v"), qv)
    return (
        assigned.where(F.col("cell").isin(probe_cells) & (F.col("vec_id") != QUERY_VEC_ID))
        .select("vec_id", cos.alias("_c"))
        .orderBy(F.desc("_c"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("_c", 4).alias("cos"))
    )


RANGE_TAU = 0.3


@register(
    "ann_range_search",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 4) AS cos
    FROM embeddings, q
    WHERE vec_id != {QUERY_VEC_ID}
      AND list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) >= {RANGE_TAU}
    """,
    tags=("similarity", "ann", "range"),
)
def ann_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """Range query: ALL vectors within cosine ≥ {RANGE_TAU} of the query
    — the radius-based retrieval mode (top-k's dual) used for
    near-duplicate harvesting around a probe point. Same single
    codegen'd scan as ann_cosine_topk but with a filter instead of
    TakeOrderedAndProject: the predicate evaluates map-side and only
    matches leave the executors, so the result (not the corpus) bounds
    the transfer. With a stored LSH-bucket/IVF-cell column the same
    predicate composes with bucket pruning (see ann_lsh_topk)."""
    qv = F.lit(_query_vec(spark, sf)).cast("array<double>")
    e = load_table(spark, sf, "embeddings").where(F.col("vec_id") != QUERY_VEC_ID)
    cos = cosine_sim(F.col("embedding").cast("array<double>"), qv)
    return (
        e.select("vec_id", cos.alias("_c"))
        .where(F.col("_c") >= RANGE_TAU)
        .select("vec_id", F.round("_c", 4).alias("cos"))
    )


@register(
    "ann_lsh_topk",
    oracle=None,  # approximate by design → rows-only check; recall vs exact is unit-tested
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """ANN via random-hyperplane LSH: score only vectors whose bucket is
    within hamming ≤ LSH_PROBE_HAMMING of the query's bucket, then
    exact-rerank. At scale the bucket filter is a pushable integer
    predicate over a column that would be precomputed/partitioned-on in
    the stored corpus."""
    planes = hyperplanes()
    qv_list = _query_vec(spark, sf)
    q_bucket = int(
        sum((1 << i) for i, p in enumerate(planes) if float(np.dot(qv_list, p)) > 0)
    )
    e = load_table(spark, sf, "embeddings").where(F.col("vec_id") != QUERY_VEC_ID)
    v = F.col("embedding").cast("array<double>")
    with_bucket = e.select("vec_id", v.alias("v"), lsh_bucket(v, planes).alias("bucket"))
    near = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(q_bucket))) <= LSH_PROBE_HAMMING
    qv = F.lit(qv_list).cast("array<double>")
    cos = cosine_sim(F.col("v"), qv)
    return (
        with_bucket.where(near)
        .select("vec_id", cos.alias("_c"))
        .orderBy(F.desc("_c"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("_c", 4).alias("cos"))
    )
