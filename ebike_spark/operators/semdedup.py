"""SemDeDup-style semantic deduplication: near-duplicate pairs found
WITHIN embedding clusters (cluster id as the blocking key).

The third blocking strategy for embedding near-dup, next to sign-LSH
tables (operators/dedup.embedding near-dup pipeline) and IVF cells
(operators/similarity): assign every vector to its nearest seed
centroid (operators/clustering), then score pairs only inside each
cluster — the SemDeDup recipe (Abbas et al. 2023): semantic duplicates
land in the same cell, so the quadratic pair scan is confined to
cluster-sized blocks.

Blocking is part of the operator's CONTRACT here (within-cluster pairs
only), which makes the result exactly SQL-expressible — the DuckDB
oracle recomputes the identical assignment and the identical pair set;
no recall hedging.

Scale shape: assignment is the map-side GEMM stage (zero shuffle);
pair scoring shuffles each vector ONCE (to its cluster's partition)
and runs one dense V·Vᵀ per cluster in an Arrow batch. Cluster size
bounds memory: real deployments pick K ≈ √N so blocks stay ~√N (and
split oversized/skewed cells by re-clustering within them), exactly
the knob SemDeDup uses. Nothing all-pairs ever crosses clusters.

Registered AFTER the streaming family so the externally-checked
registry prefix keeps the families that lack driver rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ebike_spark.operators.clustering import N_SEEDS, _best_seed, _seed_cte
from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table

SEM_TAU = 0.4  # within-cluster cosine threshold for a near-dup pair


def _make_pair_scorer(tau: float):
    """Closure factory: one cluster's (vec_id, v) rows → all pairs with
    cosine ≥ tau, via a normalized GEMM and an upper-triangle mask.
    Everything bound locally — executors never import this package."""
    import numpy as _np

    def score(pdf):
        import pandas as pd

        if not len(pdf):  # Spark may hand a group-less empty batch
            return pd.DataFrame(
                {"cluster_id": [], "v1": [], "v2": [], "cos": []}
            ).astype({"cluster_id": "int32", "v1": "int64", "v2": "int64", "cos": "float64"})
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy(dtype="int64")
        V = _np.array(list(pdf["v"]), dtype=_np.float64)
        Vn = V / _np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        iu, ju = _np.triu_indices(len(ids), k=1)
        hit = S[iu, ju] >= tau
        return pd.DataFrame(
            {
                "cluster_id": pdf["cluster_id"].iloc[0] if len(pdf) else 0,
                "v1": ids[iu[hit]],
                "v2": ids[ju[hit]],
                "cos": S[iu, ju][hit],
            }
        )

    return score


@register(
    "embed_semantic_dedup",
    oracle=f"""
    WITH {_seed_cte()},
    member AS (
      SELECT b.vec_id, b.cluster_id, CAST(e.embedding AS DOUBLE[]) AS v
      FROM best b JOIN embeddings e ON e.vec_id = b.vec_id),
    pairs AS (
      SELECT a.cluster_id, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.v, b.v) AS c
      FROM member a JOIN member b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id)
    SELECT cluster_id, v1, v2, ROUND(c, 4) AS cos
    FROM pairs WHERE c >= {SEM_TAU}
    """,
    tags=("dedup", "embeddings", "semdedup", "clustering"),
)
def embed_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Within-cluster near-duplicate pairs (cos ≥ {SEM_TAU}), blocking
    on the deterministic seed-centroid assignment ({N_SEEDS} cells).
    One shuffle (vector → its cluster), one Arrow-batched GEMM per
    cluster; pair output sorted ids (v1 < v2) for determinism."""
    assigned = _best_seed(spark, sf).select("vec_id", "cluster_id")
    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    member = assigned.join(e, "vec_id")
    return (
        member.groupBy("cluster_id")
        .applyInPandas(
            _make_pair_scorer(SEM_TAU), "cluster_id int, v1 long, v2 long, cos double"
        )
        .select("cluster_id", "v1", "v2", F.round("cos", 4).alias("cos"))
    )
