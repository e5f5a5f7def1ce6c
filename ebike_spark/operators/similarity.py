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

import weakref

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ebike_spark.functions.local_frames import local_df
from ebike_spark.functions.textfns import cosine_sim, dot
from ebike_spark.plans.registry import register, sf_bound
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


def _exact_topk_ids(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-{TOP_K} vec_ids — the recall baseline the
    ANN verdict queries compare against (same plan as ann_cosine_topk,
    ids only)."""
    qv = F.lit(_query_vec(spark, sf)).cast("array<double>")
    e = load_table(spark, sf, "embeddings").where(F.col("vec_id") != QUERY_VEC_ID)
    cos = cosine_sim(F.col("embedding").cast("array<double>"), qv)
    return (
        e.select("vec_id", cos.alias("_c"))
        .orderBy(F.desc("_c"), "vec_id")
        .limit(TOP_K)
        .select("vec_id")
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
IVF_TRAIN_FRACTION = 0.5
# centroids per (session, sf_dir): the trained quantizer is index
# state, not query state — one KMeans fit per corpus per session.
# WeakKey so stopped sessions don't pin forever (same pattern as
# dedup._persist_pool — review r10)
_ivf_centers_pool: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _sq_l2(a, b):
    """Squared L2 distance of two array<double> — sequential built-in
    HOF accumulation (codegen, same order both engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _ivf_index(spark: SparkSession, sf: str):
    """Offline IVF index build — at 100 TB this is the ingest-time
    training/assignment job, NEVER the query path (VERDICT-r9 task 2:
    the first cut trained the quantizer inside the benched query).

    - TRAIN once per (session, corpus): pyspark.ml KMeans on a seeded
      SAMPLE of the corpus, drawn and fitted on a single pinned
      partition so both sample membership and k-means|| init are
      reproducible regardless of the session's parallelism.
    - ASSIGN the full corpus its cell id as a pure built-in expression
      (argmin of {IVF_CLUSTERS} squared-L2 HOF distances over centroid
      literals) — map-side, whole-stage codegen, no ML model object on
      the scan; cached session-scoped exactly like a stored
      partition/cluster column would be.

    Returns (centers, assigned DF[vec_id, v, cell])."""
    from ebike_spark.operators.dedup import _persist_scoped

    pool = _ivf_centers_pool.setdefault(spark, {})
    centers = pool.get(sf)
    if centers is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        # coalesce to one partition BEFORE sampling: .sample seeds its
        # RNG per partition, so sample MEMBERSHIP depends on the file
        # split planning (defaultParallelism) unless the partitioning
        # is pinned first (review r10); one partition also makes the
        # k-means|| init reproducible. The sample is small by
        # construction — at production scale it's ~0.1% of the corpus;
        # a quantizer has no business seeing every row. ADVICE-r10
        # scale note: coalesce(1) funnels the TRAINING SAMPLE (not the
        # corpus) through one task, fine while the sample is
        # driver-sized; at production sample sizes pin determinism by
        # WRITING the sample once to a stored table at ingest and
        # training from that (repartitioning freely once membership is
        # frozen on disk) instead of coalescing the live sample
        # (mirrored in SCALE.md).
        train = (
            load_table(spark, sf, "embeddings")
            .coalesce(1)
            .sample(fraction=IVF_TRAIN_FRACTION, seed=7)
            .select(
                array_to_vector(
                    F.col("embedding").cast("array<double>")
                ).alias("features")
            )
        )
        km = KMeans(
            k=IVF_CLUSTERS,
            seed=42,
            maxIter=10,
            featuresCol="features",
            predictionCol="cell",
        )
        centers = [[float(x) for x in c] for c in km.fit(train).clusterCenters()]
        pool[sf] = centers

    def _assigned():
        e = load_table(spark, sf, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        darr = F.array(
            *[_sq_l2(F.col("v"), F.lit(c).cast("array<double>")) for c in centers]
        )
        # first-min-wins argmin, matching numpy (array_position
        # returns the FIRST equal element, 1-based)
        cell = (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
        return e.select("vec_id", "v", cell.alias("cell"))

    assigned = _persist_scoped(spark, "ivf_assigned", _assigned, key=sf)
    return centers, assigned


def _ivf_topk_ids(spark: SparkSession, sf: str) -> DataFrame:
    """The IVF QUERY path (top-{TOP_K} vec_ids): rank the stored
    centroids against the query vector driver-side (k floats — O(1)),
    prune the stored cell column to the {IVF_PROBES} nearest cells,
    exact cosine rerank of the survivors."""
    centers, assigned = _ivf_index(spark, sf)
    qv_list = _query_vec(spark, sf)
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
        .select("vec_id")
    )


# Per-fixture measured recall of the SAMPLE-trained quantizer (r10:
# 0.6 / 0.9 / 0.6 at sf0.001/0.01/0.1 — deterministic: seeded sample,
# single-partition seeded k-means|| init), asserted with a one-hit
# (0.1) margin so the boolean actually bites (VERDICT-r9 task 4 — the
# old global 0.4 floor was loose against measured 0.9). Unknown
# corpora fall back to the conservative global floor.
IVF_RECALL_BOUNDS = {"sf0.001": 0.5, "sf0.01": 0.8, "sf0.1": 0.5}
IVF_RECALL_FLOOR = 0.4


@register(
    "ann_ivf_topk",
    # The retrieved SET is approximation-specific, so the externally
    # checked output is a bounds-checked verdict: recall-vs-brute-force
    # against the PER-FIXTURE measured bound (IVF_RECALL_BOUNDS) and
    # the probed fraction. The oracle is trivially exact — the same
    # constants and TRUEs. A quantizer regression (bad seed plumbing,
    # probe-count drift, broken rerank, centroid-cache staleness)
    # drops recall below measured-minus-one-hit, flips the boolean,
    # and fails the hash compare.
    oracle=f"""
    SELECT 'ivf' AS method, {TOP_K} AS k,
           {IVF_PROBES} AS cells_probed, {IVF_CLUSTERS} AS cells_total,
           TRUE AS recall_ge_sf_bound, TRUE AS probe_frac_le_half
    """,
    tags=("similarity", "ann", "ivf", "kmeans", "verdict"),
)
def ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN verdict: probe-and-rerank against the OFFLINE-built
    index (_ivf_index: sample-trained quantizer + stored cell column,
    both session-cached — the query path never trains), compare its
    top-{TOP_K} against the exact brute-force top-{TOP_K}, and emit
    one bounds-checked row — recall ≥ the per-fixture measured bound
    and probed fraction ≤ 1/2.

    Learned centroids adapt to the data distribution, which sign-LSH
    cannot (see ann_lsh_topk's docstring math for why this corpus is
    the hard regime). At scale: the quantizer trains on a ~0.1%
    sample at ingest, the cell id is a partition/cluster column, and
    a query reads ~{IVF_PROBES}/{IVF_CLUSTERS} of the corpus. The
    recall join is k-row-sized; the only driver scalar is the bounded
    hit count."""
    exact = _exact_topk_ids(spark, sf)
    approx = _ivf_topk_ids(spark, sf)
    hits = exact.join(approx, "vec_id", "inner").count()
    recall = hits / TOP_K
    bound = sf_bound(sf, IVF_RECALL_BOUNDS, IVF_RECALL_FLOOR)
    return local_df(
        spark,
        [
            (
                "ivf",
                TOP_K,
                IVF_PROBES,
                IVF_CLUSTERS,
                recall >= bound,
                IVF_PROBES / IVF_CLUSTERS <= 0.5,
            )
        ],
        "method string, k int, cells_probed int, cells_total int, "
        "recall_ge_sf_bound boolean, probe_frac_le_half boolean",
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


def _lsh_probe(spark: SparkSession, sf: str):
    """The LSH probe pipeline: (top-{TOP_K} ids DataFrame, 1-row
    counts DataFrame with `probed`/`total`) — shared by the registered
    verdict query and the recall unit tests."""
    planes = hyperplanes()
    qv_list = _query_vec(spark, sf)
    # sequential left-to-right accumulation, NOT np.dot: with the r10
    # exact-set oracle the query bucket is load-bearing, and BLAS
    # pairwise summation could flip the sign of a near-zero plane dot
    # relative to the sequential fold both engines run (review r10)
    q_bucket = 0
    for i, p in enumerate(planes):
        acc = 0.0
        for a, b in zip(qv_list, p):
            acc += a * float(b)
        if acc > 0:
            q_bucket |= 1 << i
    from ebike_spark.operators.dedup import _persist_scoped

    def _bucketed():
        # the stored-bucket-column shape: at scale this column is
        # precomputed at ingest; here it is built + cached once per
        # (session, corpus). Caching also amortizes the ~1 s of
        # DRIVER time constructing/canonicalizing the 12-plane HOF
        # expression tree (measured r10 — the plan build, not the
        # scan, dominated this query's bench row).
        e = load_table(spark, sf, "embeddings").where(
            F.col("vec_id") != QUERY_VEC_ID
        )
        v = F.col("embedding").cast("array<double>")
        return e.select(
            "vec_id", v.alias("v"), lsh_bucket(v, planes).alias("bucket")
        )

    with_bucket = _persist_scoped(spark, "lsh_buckets", _bucketed, key=sf)
    near = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(q_bucket))) <= LSH_PROBE_HAMMING
    qv = F.lit(qv_list).cast("array<double>")
    cos = cosine_sim(F.col("v"), qv)
    topk = (
        with_bucket.where(near)
        .select("vec_id", cos.alias("_c"))
        .orderBy(F.desc("_c"), "vec_id")
        .limit(TOP_K)
    )
    # probed/total in ONE pass over the bucketed frame (the bucket is
    # {LSH_PLANES} HOF dot products per row — the expensive expression;
    # two separate counts would evaluate it twice more)
    counts = with_bucket.agg(
        F.count("*").alias("total"),
        F.sum(near.cast("long")).alias("probed"),
    )
    return topk, counts


def _lsh_bucket_sql() -> str:
    """The seeded hyperplane bucket as a DuckDB expression over `v`
    (DOUBLE[]): the {LSH_PLANES} plane directions inline as literals,
    sign bits via list_dot_product. Bit-identical to the Spark side —
    both engines run the same sequential double dot product, so the
    sign comparisons agree exactly (parity probed over every vector at
    all three fixture SFs, r10)."""
    planes = hyperplanes()
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ",".join(repr(float(x)) for x in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "ann_lsh_topk",
    # FULL exact oracle (r10, superseding the r6 verdict shape): the
    # entire LSH pipeline is deterministic — seeded hyperplanes,
    # integer bucket math, exact cosine rerank — and DuckDB can
    # recompute ALL of it with the plane directions inlined as
    # literals. The former boolean row (recall/probed-fraction
    # invariants) lives on in test_lsh_ann_recall_beats_random; the
    # externally hash-checked output is now the retrieved set itself.
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    b AS (SELECT vec_id, v, {{bucket}} AS bucket FROM e),
    q AS (SELECT bucket AS qb, v AS qv FROM b
          WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id,
           ROUND(list_cosine_similarity(v, qv), 4) AS cos
    FROM b, q
    WHERE vec_id != {QUERY_VEC_ID}
      AND bit_count(xor(bucket, qb)) <= {LSH_PROBE_HAMMING}
    ORDER BY list_cosine_similarity(v, qv) DESC, vec_id
    LIMIT {TOP_K}
    """.replace("{bucket}", _lsh_bucket_sql()),
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """ANN via random-hyperplane LSH: score only vectors whose bucket
    is within hamming ≤ {LSH_PROBE_HAMMING} of the query's bucket,
    exact cosine rerank, return the top-{TOP_K} (vec_id, cos). In
    this corpus the true neighbors sit at cos≈0.5 — barely above
    background, the hardest regime for sign-LSH — so absolute recall
    is modest by construction; the enrichment invariant (recall >
    probed fraction > 0) is asserted in the unit suite over the same
    _lsh_probe pipeline.

    At scale the bucket filter is a pushable integer predicate over a
    column precomputed/partitioned-on in the stored corpus, so the
    probe reads ~Σ C({LSH_PLANES},0..{LSH_PROBE_HAMMING})/2^{LSH_PLANES}
    of it; the rerank is map-side cosine + TakeOrderedAndProject. No
    brute-force audit twin runs here (the exact oracle IS the audit)."""
    topk, _ = _lsh_probe(spark, sf)
    return topk.select("vec_id", F.round("_c", 4).alias("cos"))


# ------------------------------------------------- product quantization

PQ_M = 8  # subspaces
PQ_K = 8  # codewords per subspace = embeddings of vec_id 0..PQ_K-1
PQ_SUBD = _DIM // PQ_M

# Shared oracle CTE block: subvector slices for every vector, the seed
# codebook (subvectors of vec_id < PQ_K), and each vector's per-subspace
# nearest codeword (squared L2, ties to the lowest codeword id — the
# same first-min-wins rule numpy's argmin applies).
_PQ_CTE = f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sub AS (SELECT vec_id, m, v[m*{PQ_SUBD}+1 : m*{PQ_SUBD}+{PQ_SUBD}] AS sv
            FROM e, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) ms),
    cw AS (SELECT m, vec_id AS k, sv AS cv FROM sub WHERE vec_id < {PQ_K}),
    scored AS (
      SELECT s.vec_id, s.m, c.k, POWER(list_distance(s.sv, c.cv), 2) AS d2,
             ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                ORDER BY list_distance(s.sv, c.cv), c.k) AS rn
      FROM sub s JOIN cw c ON s.m = c.m),
    best AS (SELECT vec_id, m, k, d2 FROM scored WHERE rn = 1)
"""


def _pq_codebook(spark: SparkSession, sf: str) -> np.ndarray:
    """(PQ_M, PQ_K, PQ_SUBD) codebook from the seed vectors — a bounded
    O(K·dim) driver fetch, reusing the clustering seed cache."""
    from ebike_spark.operators.clustering import _seed_centroids

    seeds = sorted(_seed_centroids(spark, sf))  # PQ_K == N_SEEDS == 8
    S = np.array([v for _, v in seeds], dtype=np.float64)  # (K, dim)
    # C[m, k, :] = seed k's m-th subvector
    return np.transpose(S.reshape(PQ_K, PQ_M, PQ_SUBD), (1, 0, 2)).copy()


def _make_pq_mapper(codebook: np.ndarray, lut_row: np.ndarray | None):
    """Closure factory for the Arrow-batched PQ stage. With
    ``lut_row=None`` emits (vec_id, pq_code, recon_err): packed 3-bit
    codes + total squared reconstruction error. With a (M, K) query
    LUT, emits (vec_id, adc_dist): the asymmetric-distance sum
    LUT[m][code_m] — the ADC scan. All local bounds; executors never
    import this package."""
    import numpy as _np

    C = codebook.copy()
    lut = None if lut_row is None else lut_row.copy()
    shifts = _np.arange(PQ_M, dtype=_np.int64) * 3

    def run(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            V = _np.array(list(pdf["v"]), dtype=_np.float64).reshape(-1, PQ_M, PQ_SUBD)
            # (B, M, K): squared L2 from each subvector to each codeword
            d2 = ((V[:, :, None, :] - C[None, :, :, :]) ** 2).sum(-1)
            codes = d2.argmin(axis=2)  # first-min wins = lowest k on ties
            out = {"vec_id": pdf["vec_id"].astype("int64")}
            if lut is None:
                out["pq_code"] = (codes << shifts[None, :]).sum(axis=1)
                out["recon_err"] = _np.take_along_axis(
                    d2, codes[:, :, None], axis=2
                )[:, :, 0].sum(axis=1)
            else:
                out["adc_dist"] = _np.take_along_axis(
                    lut[None, :, :], codes[:, :, None], axis=2
                )[:, :, 0].sum(axis=1)
            yield pd.DataFrame(out)

    return run


@register(
    "embed_pq_encode",
    oracle=f"""
    WITH {_PQ_CTE}
    SELECT vec_id,
           CAST(SUM(k << (3 * m)) AS BIGINT) AS pq_code,
           ROUND(SUM(d2), 4) AS recon_err
    FROM best GROUP BY vec_id
    """,
    tags=("embeddings", "pq", "quantization", "ann"),
)
def embed_pq_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Product quantization: each vector encoded as {PQ_M} × 3-bit
    nearest-codeword ids (packed into one BIGINT) against a
    deterministic seed codebook, plus its reconstruction error — the
    memory side of the PQ ANN path: 64 doubles become 3 bytes, so a
    100 TB embedding corpus compresses to ~0.5% for in-memory ADC
    scanning (Jégou et al. 2011 layout; deterministic seed codewords
    instead of trained k-means keep the result exactly SQL-checkable,
    same trade as clustering.py).

    One Arrow-batched stage (subspace distance tensor + argmin per
    batch), zero shuffle — encode is embarrassingly parallel."""
    cb = _pq_codebook(spark, sf)
    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    enc = e.mapInPandas(
        _make_pq_mapper(cb, None), "vec_id long, pq_code long, recon_err double"
    )
    return enc.select("vec_id", "pq_code", F.round("recon_err", 4).alias("recon_err"))


@register(
    "ann_pq_adc_topk",
    oracle=f"""
    WITH {_PQ_CTE},
    qsub AS (SELECT m, sv AS qv FROM sub WHERE vec_id = {QUERY_VEC_ID}),
    lut AS (SELECT c.m, c.k, POWER(list_distance(q.qv, c.cv), 2) AS qd
            FROM cw c JOIN qsub q ON q.m = c.m),
    adc AS (SELECT b.vec_id, SUM(l.qd) AS adc_d
            FROM best b JOIN lut l ON l.m = b.m AND l.k = b.k
            WHERE b.vec_id != {QUERY_VEC_ID} GROUP BY 1)
    SELECT vec_id, ROUND(adc_d, 4) AS adc_dist
    FROM adc ORDER BY adc_d, vec_id LIMIT {TOP_K}
    """,
    tags=("similarity", "ann", "pq", "adc"),
)
def ann_pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """ANN top-{TOP_K} by PQ asymmetric distance: the query builds a
    {PQ_M}×{PQ_K} LUT of squared subspace distances driver-side (tiny),
    every vector's approximate distance is {PQ_M} table lookups summed
    — no float vector is touched at scan time in a deployed layout
    (codes are precomputed by embed_pq_encode; here the encode fuses
    into the same single map stage). orderBy+limit compiles to
    per-partition top-k, so only k rows per partition leave the
    executors. Deterministic codes ⇒ exactly oracle-checkable, unlike
    the recall-bounded IVF/LSH variants."""
    cb = _pq_codebook(spark, sf)
    q = np.asarray(_query_vec(spark, sf), dtype=np.float64).reshape(PQ_M, PQ_SUBD)
    lut = ((q[:, None, :] - cb) ** 2).sum(-1)  # (M, K)
    e = load_table(spark, sf, "embeddings").where(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scored = e.mapInPandas(_make_pq_mapper(cb, lut), "vec_id long, adc_dist double")
    return (
        scored.orderBy("adc_dist", "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("adc_dist", 4).alias("adc_dist"))
    )


# ------------------------------------------------------------- kNN join

# Batch kNN join: EVERY query in a query set gets its exact top-k from
# the corpus — the retrieval workhorse (RAG indexing, semdedup seeding,
# eval-set contamination by embedding). The single-query ops above
# broadcast one vector; this broadcasts the query MATRIX and computes
# per-partition partial top-k, the distributed-kNN shape.
N_QUERIES = 8
KNN_SLACK = 8  # per-partition over-keep so numpy pruning can never
# evict an exact top-k member (prune and refine use the same double
# arithmetic to ~1e-15; slack 8 covers any boundary reordering)


def _query_matrix(spark: SparkSession, sf: str) -> list[tuple[int, list[float]]]:
    """The query set (vec_id < N_QUERIES) as driver-side rows — bounded
    by the constant query-set size, not the corpus."""
    rows = (
        load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    return sorted((r["vec_id"], list(r["v"])) for r in rows)


def _make_knn_pruner(queries: list[tuple[int, list[float]]], k_keep: int):
    """Closure factory (executors never import this package): one
    (batch × queries) cosine GEMM per Arrow batch, keep the top
    ``k_keep`` corpus rows PER QUERY per batch. Output is
    (query_id, vec_id, v) candidates — the corpus vector rides along
    so the exact refine stage needs no re-join against the table."""
    import numpy as _np

    qids = [q for q, _ in queries]
    Q = _np.array([v for _, v in queries], dtype=_np.float64)
    Qn = Q / _np.linalg.norm(Q, axis=1, keepdims=True)

    def prune(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            V = _np.array(list(pdf["v"]), dtype=_np.float64)
            Vn = V / _np.linalg.norm(V, axis=1, keepdims=True)
            sims = Vn @ Qn.T  # (B, Q)
            keep = min(k_keep, len(pdf))
            idx = _np.argpartition(-sims, keep - 1, axis=0)[:keep]  # (keep, Q)
            frames = []
            for j, qid in enumerate(qids):
                rows = idx[:, j]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": _np.full(len(rows), qid, dtype="int64"),
                            "vec_id": pdf["vec_id"].to_numpy()[rows].astype("int64"),
                            "v": pdf["v"].to_numpy()[rows],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return prune


@register(
    "ann_knn_join",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    s AS (SELECT q.query_id, e.vec_id,
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS c
          FROM embeddings e, q WHERE e.vec_id >= {N_QUERIES}),
    r AS (SELECT query_id, vec_id, c,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, vec_id) AS rn
          FROM s)
    SELECT query_id, vec_id, ROUND(c, 4) AS cos FROM r WHERE rn <= {TOP_K}
    """,
    tags=("similarity", "ann", "knn-join"),
)
def ann_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """Exact batch kNN join: top-{TOP_K} cosine neighbors for each of
    the {N_QUERIES} query vectors against the rest of the corpus.

    Scale shape: the query matrix is broadcast inside an Arrow
    mapInPandas closure — ONE (batch × queries) GEMM per partition
    (never a row-at-a-time UDF, never an N×Q crossJoin through the
    optimizer), emitting only top-(k+{KNN_SLACK}) candidates per query
    per partition. The global refine re-scores that bounded candidate
    set with the sequential-sum Catalyst cosine (bit-comparable to the
    oracle's list arithmetic) and takes ROW_NUMBER ≤ k per query — a
    window over partitions × queries × (k+slack) rows, not the corpus.
    At 1000 executors the shuffle is a few thousand rows per query,
    independent of corpus size; a larger query set tiles the GEMM
    (queries stream in blocks through the same closure)."""
    from pyspark.sql import Window

    queries = _query_matrix(spark, sf)
    e = (
        load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") >= N_QUERIES)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    cand = e.mapInPandas(
        _make_knn_pruner(queries, TOP_K + KNN_SLACK),
        "query_id long, vec_id long, v array<double>",
    )
    qdf = local_df(
        spark, [(qid, qv) for qid, qv in queries], "query_id long, qv array<double>"
    )
    scored = cand.join(F.broadcast(qdf), "query_id").select(
        "query_id", "vec_id", cosine_sim(F.col("v"), F.col("qv")).alias("_c")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_c"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", F.round("_c", 4).alias("cos"))
    )


# --------------------------------------------- random projection (JL)

RP_DIMS = 8  # output dimensionality
RP_QUANT = 1_000_000  # fixed-point quantization: exact integer sums


def _rp_sign(j: int, k: int) -> int:
    """±1 from md5(j_k) — the same formula the DuckDB oracle spells, so
    the projection matrix is reproducible anywhere (1-based j)."""
    import hashlib

    return int(hashlib.md5(f"{j}_{k}".encode()).hexdigest()[:14], 16) % 2 * 2 - 1


def _rp_oracle() -> str:
    return f"""
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS j, unnest(embedding) AS e
      FROM embeddings),
    q AS (SELECT vec_id, j, CAST(ROUND(e * {RP_QUANT}) AS BIGINT) AS qe FROM flat),
    proj AS (
      SELECT vec_id, k.k,
             CAST(SUM(qe * (CAST('0x' || substr(md5(j::VARCHAR || '_' || k.k::VARCHAR), 1, 14) AS BIGINT) % 2 * 2 - 1)) AS BIGINT) AS p
      FROM q CROSS JOIN (SELECT UNNEST(range({RP_DIMS})) AS k) k
      GROUP BY 1, 2)
    SELECT vec_id, k AS dim, p FROM proj
    """


@register(
    "embed_random_projection",
    oracle=_rp_oracle(),
    tags=("embedding", "random-projection", "jl"),
)
def embed_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection to {RP_DIMS} dims
    (Achlioptas-style ±1 matrix), on fixed-point-quantized components so
    every sum is integer-EXACT — the oracle aggregates in arbitrary
    order, Spark folds sequentially, and the results still match bit
    for bit (float sums would differ in the last ulp).

    Scale shape: ZERO shuffle — the ±1 matrix is baked into the plan as
    literals (computed driver-side with the same md5 formula the oracle
    spells), and each output dim is one JVM-side aggregate() fold over
    the embedding array; the explode+groupBy form the oracle uses would
    shuffle rows × dims. The projection is the cheap front half of
    LSH/sketch pipelines; downstream consumers bucket or band these
    coordinates."""
    emb = load_table(spark, sf, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]
    projections = []
    for k in range(RP_DIMS):
        signs = ", ".join(str(_rp_sign(j, k)) for j in range(1, dim + 1))
        p = F.expr(
            f"aggregate(zip_with(embedding, sequence(1, {dim}), (e, j) -> "
            f"struct(e AS e, j AS j)), 0L, (acc, s) -> acc + "
            f"CAST(ROUND(s.e * {RP_QUANT}) AS BIGINT) * element_at(array({signs}), s.j))"
        )
        projections.append(F.struct(F.lit(k).alias("dim"), p.alias("p")))
    return emb.select(
        "vec_id", F.explode(F.array(*projections)).alias("kp")
    ).select("vec_id", "kp.dim", "kp.p")


ANN_FILTER_LABEL = 3


@register(
    "ann_filtered_topk",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 4) AS cos
    FROM embeddings, q
    WHERE vec_id != {QUERY_VEC_ID} AND label = {ANN_FILTER_LABEL}
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) DESC, vec_id
    LIMIT {TOP_K}
    """,
    tags=("similarity", "ann", "filtered", "topk"),
)
def ann_filtered_topk(spark: SparkSession, sf: str) -> DataFrame:
    """FILTERED vector search: top-k cosine restricted to a metadata
    predicate (label = {ANN_FILTER_LABEL}) — the retrieval shape every
    RAG/vector store actually serves (filter + similarity, not
    similarity alone). The predicate is a plain parquet column filter,
    so it evaluates BEFORE any scoring: Catalyst pushes it to the scan
    (PushedFilters, plan-asserted) and the cosine HOF runs only on
    survivors — pre-filtering, not the post-filter-then-hope-k-survive
    mistake. Cost scales with the filtered subset.

    Scale shape: same single codegen'd scan + TakeOrderedAndProject as
    ann_cosine_topk; with the corpus partitioned/bucketed on the label
    column the filter also prunes whole files. Composes with the
    LSH/IVF pruners: their bucket predicate ANDs with this one."""
    qv = F.lit(_query_vec(spark, sf)).cast("array<double>")
    e = load_table(spark, sf, "embeddings").where(
        (F.col("vec_id") != QUERY_VEC_ID) & (F.col("label") == ANN_FILTER_LABEL)
    )
    cos = cosine_sim(F.col("embedding").cast("array<double>"), qv)
    return (
        e.select("vec_id", cos.alias("_c"))
        .orderBy(F.desc("_c"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("_c", 4).alias("cos"))
    )


DRIFT_SCALE = 1_000_000  # fixed-point quantum for exact per-dim sums


@register(
    "embed_drift_by_dim",
    oracle=f"""
    WITH e AS (
      SELECT vec_id % 2 AS s, unnest(range(len(embedding))) AS dim,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
    f AS (
      SELECT s, dim,
             CAST(FLOOR(v[CAST(dim + 1 AS BIGINT)] * {DRIFT_SCALE}) AS BIGINT) AS q
      FROM e),
    g AS (
      SELECT CAST(dim AS BIGINT) AS dim,
             CAST(COUNT(*) FILTER (WHERE s = 0) AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (WHERE s = 1) AS BIGINT) AS n_b,
             CAST(SUM(q) FILTER (WHERE s = 0) AS BIGINT) AS sum_a,
             CAST(SUM(q) FILTER (WHERE s = 1) AS BIGINT) AS sum_b
      FROM f GROUP BY 1)
    SELECT dim, n_a, n_b, sum_a, sum_b,
           sum_a / n_a - sum_b / n_b AS drift_scaled
    FROM g
    """,
    tags=("embedding", "drift", "monitoring"),
)
def embed_drift_by_dim(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-distribution drift monitor: the corpus is split into
    two slices (vec_id parity standing in for time windows / model
    versions) and the per-DIMENSION mean shift between slices is
    emitted — the input a drift alert thresholds on (a retrained
    encoder or upstream content shift moves per-dim means long before
    topline metrics notice). Components quantize to fixed-point
    ({DRIFT_SCALE} quantum) BEFORE summation, so every aggregate is an
    exact BIGINT — no float-sum partition-order sensitivity anywhere —
    and the drift itself is two exact-int divisions and one subtraction
    of deterministic doubles (house integer-exact rule).

    Scale shape: posexplode fans each vector into D rows and the
    groupBy(dim) shuffle carries map-side partial sums — the exchange
    moves O(partitions × D) partial rows, not corpus × D; output is
    D rows regardless of corpus size. The same frame extends to
    variance (sum q²) without changing shape."""
    e = load_table(spark, sf, "embeddings").select(
        (F.col("vec_id") % 2).alias("s"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"),
    )
    f = e.select(
        "s", F.col("dim").cast("long").alias("dim"),
        F.floor(F.col("v") * DRIFT_SCALE).cast("long").alias("q"),
    )
    g = f.groupBy("dim").agg(
        F.count(F.when(F.col("s") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("s") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("s") == 0, F.col("q"))).alias("sum_a"),
        F.sum(F.when(F.col("s") == 1, F.col("q"))).alias("sum_b"),
    )
    return g.select(
        "dim", "n_a", "n_b", "sum_a", "sum_b",
        (F.col("sum_a") / F.col("n_a") - F.col("sum_b") / F.col("n_b")).alias(
            "drift_scaled"
        ),
    )


NORM_BUCKETS = 10  # decibucket width on the fixed-point L2 norm


@register(
    "embed_norm_histogram",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, len(embedding) AS d
      FROM embeddings),
    n AS (
      SELECT vec_id,
             CAST(FLOOR(sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum'))
                        * {NORM_BUCKETS}) AS BIGINT) AS bucket
      FROM e)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM n GROUP BY bucket
    """,
    tags=("embedding", "quality", "histogram"),
)
def embed_norm_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """L2-norm distribution of the embedding corpus — the first QC
    chart after any encoder run (collapsed or exploding norms mean a
    broken checkpoint; un-normalized vectors break cosine≈dot
    shortcuts). The norm is sqrt of the HOF-folded sum of squares —
    both engines fold IN ARRAY ORDER (Spark F.aggregate and DuckDB
    list_aggregate are sequential left folds), so the double is
    bit-identical and the floor-bucketing cannot straddle an ulp.

    Scale shape: pure per-row projection + a {NORM_BUCKETS}-ary
    groupBy with map-side partials — scan-bound at any corpus size."""
    e = load_table(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    ssq = F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
    bucket = F.floor(F.sqrt(ssq) * NORM_BUCKETS).cast("long")
    return (
        e.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )
