"""Scale probe: replicate the sf0.1 tables ~10× (keys shifted per
replica so join cardinalities scale linearly; document texts perturbed
per replica so near-dup structure replicates rather than cross-links)
and measure Spark vs DuckDB on the data-proportional query shapes.

This extends BENCH_NOTES.md's crossover measurement beyond the driver's
largest fixture: the point is how each engine's time GROWS, not the
absolute floor. Usage: python tools/scale_probe.py [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import duckdb  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from ebike_spark.session import get_spark  # noqa: E402
from ebike_spark.sources.registry import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
KEY_SHIFT = 10_000_000


def build(spark, out: str, replicas: int) -> None:
    if os.path.exists(out):
        shutil.rmtree(out)
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    docs = load_table(spark, SF, "documents")
    reps = spark.range(replicas).select(F.col("id").alias("r"))

    def shifted(df, keys, extra=None):
        x = df.crossJoin(reps)
        for k in keys:
            x = x.withColumn(k, F.col(k) + F.col("r") * KEY_SHIFT)
        if extra is not None:
            x = extra(x)
        return x.drop("r")

    shifted(li, ["l_orderkey"]).write.parquet(f"{out}/lineitem")
    shifted(o, ["o_orderkey", "o_custkey"]).write.parquet(f"{out}/orders")
    shifted(c, ["c_custkey"]).write.parquet(f"{out}/customer")
    shifted(
        docs,
        ["doc_id"],
        extra=lambda x: x.withColumn("text", F.concat_ws(" ", "text", F.concat(F.lit("rep"), F.col("r")))),
    ).write.parquet(f"{out}/documents")
    emb = load_table(spark, SF, "embeddings")
    # vectors unchanged per replica: cluster occupancy replicates, so
    # assignment work scales linearly with no cross-replica structure
    shifted(emb, ["vec_id"]).write.parquet(f"{out}/embeddings")
    ev = load_table(spark, SF, "events")
    # user_id shifted per replica: funnels/cohorts replicate instead of
    # merging across replicas
    shifted(ev, ["event_id", "user_id"]).write.parquet(f"{out}/events")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = f"/tmp/ebike_scale_x{replicas}"
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build(spark, out, replicas)

    li = spark.read.parquet(f"{out}/lineitem")
    o = spark.read.parquet(f"{out}/orders")
    c = spark.read.parquet(f"{out}/customer")
    docs = spark.read.parquet(f"{out}/documents")
    n_li = li.count()
    print(f"# scale probe: {replicas}× → lineitem {n_li/1e6:.1f}M rows")

    emb = spark.read.parquet(f"{out}/embeddings")

    ev = spark.read.parquet(f"{out}/events")

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "documents", "embeddings", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}/*.parquet'")

    def spark_time(df) -> float:
        df.count()
        t0 = time.perf_counter()
        df.count()
        return time.perf_counter() - t0

    def duck_time(sql: str) -> float:
        con.execute(sql).fetchall()
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - t0

    cases = []
    cases.append((
        "agg (Q1 shape)",
        spark_time(li.groupBy("l_returnflag", "l_linestatus").agg(
            F.count("*"), F.sum("l_quantity"), F.avg("l_extendedprice"))),
        duck_time("SELECT l_returnflag,l_linestatus,count(*),sum(l_quantity),avg(l_extendedprice) "
                  "FROM lineitem GROUP BY 1,2"),
    ))
    cases.append((
        "join chain + agg (Q5 shape)",
        spark_time(
            c.join(o, c.c_custkey == o.o_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .groupBy("c_mktsegment")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        ),
        duck_time("SELECT c_mktsegment, SUM(l_extendedprice*(1-l_discount)) FROM customer c "
                  "JOIN orders o ON c.c_custkey=o.o_custkey "
                  "JOIN lineitem l ON l.l_orderkey=o.o_orderkey GROUP BY 1"),
    ))
    cases.append((
        "window rank per key",
        spark_time(_window_rank(o)),
        duck_time("SELECT count(*) FROM (SELECT o_orderkey, ROW_NUMBER() OVER "
                  "(PARTITION BY o_custkey ORDER BY o_totalprice DESC) rn FROM orders) WHERE rn <= 3"),
    ))
    cases.append((
        "distinct count",
        spark_time(o.agg(F.count_distinct("o_custkey"))),
        duck_time("SELECT count(DISTINCT o_custkey) FROM orders"),
    ))
    cases.append((
        "shingle dedup ground truth (capped exact path)",
        spark_time(_dedup(spark, docs)),
        duck_time(_DEDUP_SQL),
    ))
    cases.append((
        "minhash-LSH dedup, same ground truth",
        spark_time(_dedup_lsh(spark, docs)),
        float("nan"),
    ))
    cases.append((
        "centroid assign (GEMM mapInPandas)",
        spark_time(_cluster_assign(spark, emb)),
        duck_time(_ASSIGN_SQL),
    ))
    cases.append((
        "per-domain cap (window over source)",
        spark_time(_domain_cap(docs)),
        duck_time(_DOMAIN_SQL),
    ))
    cases.append((
        "funnel (single-pass scan vs nested-min joins)",
        spark_time(_funnel(ev)),
        duck_time(_FUNNEL_SQL),
    ))
    cases.append((
        "retention cohort matrix",
        spark_time(_retention(ev)),
        duck_time(_RETENTION_SQL),
    ))
    cases.append((
        "PQ ADC top-k (LUT scan)",
        spark_time(_pq_adc(spark, emb)),
        duck_time(_PQ_ADC_SQL),
    ))
    cases.append((
        "semantic dedup (blocked within-cluster GEMM)",
        spark_time(_semdedup(spark, emb)),
        duck_time(_SEMDEDUP_SQL),
    ))
    cases.append((
        "batch kNN join (GEMM prune + exact refine)",
        spark_time(_knn_join(spark, emb)),
        duck_time(_KNN_SQL),
    ))
    cases.append((
        "incremental dedup (corpus × batch pair join)",
        spark_time(_incremental(spark, docs)),
        duck_time(_INCREMENTAL_SQL),
    ))
    cases.append((
        "anomaly z-score (broadcast stats, no window)",
        spark_time(_anomaly(ev)),
        duck_time(_ANOMALY_SQL),
    ))
    cases.append((
        "gap-fill + LOCF (grid broadcast + window)",
        spark_time(_gapfill(ev)),
        duck_time(_GAPFILL_SQL),
    ))
    cases.append((
        "hierarchical rollup (partials reagg vs 3 rescans)",
        spark_time(_rollup(ev)),
        duck_time(_ROLLUP_SQL),
    ))
    cases.append((
        "concurrency sweep line (distributed prefix sum vs global window)",
        spark_time(_concurrency(ev)),
        duck_time(_CONCURRENCY_SQL),
    ))
    cases.append((
        "dq expectation suite (1 scan vs 5-scan UNION)",
        spark_time(_dq(li)),
        duck_time(_DQ_SQL),
    ))
    print("| shape | Spark s | DuckDB s | ratio |")
    print("|---|---|---|---|")
    for name, ts, td in cases:
        print(f"| {name} | {ts:.2f} | {td:.2f} | {ts/td:.2f}× |")


def _window_rank(o):
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return o.select("o_orderkey", F.row_number().over(w).alias("rn")).where(F.col("rn") <= 3).groupBy().count()


_DEDUP_SQL = """
WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks WHERE len(w) >= 3),
sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS s FROM idx),
sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id d1, b.doc_id d2, count(*) c FROM sh a JOIN sh b
          ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
SELECT count(*) FROM inter JOIN sizes sa ON sa.doc_id=d1 JOIN sizes sb ON sb.doc_id=d2
WHERE c*1.0/(sa.n+sb.n-c) >= 0.8
"""


def _probe_shingles(spark, docs):
    """Distinct 3-gram shingles of the probe corpus (registered-path
    shape, but over the probe's raw parquet rather than the registry)."""
    from pyspark.sql import Window

    tok = docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("i", "w"))
    win = Window.partitionBy("doc_id").orderBy("i")
    return (
        tok.select(
            "doc_id",
            F.concat_ws(" ", "w", F.lead("w", 1).over(win), F.lead("w", 2).over(win)).alias("s"),
            F.lead("w", 2).over(win).alias("_t"),
        )
        .where(F.col("_t").isNotNull())
        .drop("_t")
        .distinct()
    )


def _dedup(spark, docs):
    """The registered exact path: stop-shingle-capped jaccard_pairs."""
    from ebike_spark.operators.dedup import JACCARD_DF_CAP, jaccard_pairs

    sh = _probe_shingles(spark, docs).persist()
    return jaccard_pairs(sh, 0.8, df_cap=JACCARD_DF_CAP).groupBy().count()


def _dedup_lsh(spark, docs):
    """The registered scale path: fused minhash banding + exact verify."""
    from ebike_spark.operators.dedup import fused_lsh_candidates, verify_jaccard

    sh = _probe_shingles(spark, docs).persist()
    return verify_jaccard(sh, fused_lsh_candidates(sh), 0.8).groupBy().count()


def _cluster_assign(spark, emb):
    """Registered-path shape over the probe's embeddings: GEMM argmax
    against the base corpus' 8 seed centroids, then the K-row audit."""
    from ebike_spark.operators.clustering import _make_assigner, _seed_centroids

    seeds = _seed_centroids(spark, SF)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return (
        e.mapInPandas(_make_assigner(seeds), "vec_id long, cluster_id int, cos double")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n"), F.avg("cos").alias("a"))
    )


_ASSIGN_SQL = """
WITH seeds AS (SELECT vec_id cid, CAST(embedding AS DOUBLE[]) cv
               FROM embeddings WHERE vec_id < 8),
scored AS (SELECT e.vec_id, s.cid,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cv) cos,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cv) DESC,
                        s.cid) rn
           FROM embeddings e CROSS JOIN seeds s)
SELECT cid, count(*), avg(cos) FROM scored WHERE rn = 1 GROUP BY cid
"""


def _domain_cap(docs):
    from pyspark.sql import Window

    from ebike_spark.functions.textfns import md5_long

    h = md5_long(F.col("doc_id").cast("string"))
    rn = F.row_number().over(Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc()))
    return (
        docs.select("source", "doc_id").withColumn("rn", rn)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum((F.col("rn") <= 15).cast("long")).alias("kept"))
    )


_DOMAIN_SQL = """
WITH ranked AS (SELECT source, doc_id,
  ROW_NUMBER() OVER (PARTITION BY source
    ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT), doc_id) rn
  FROM documents)
SELECT source, count(*), SUM(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) FROM ranked GROUP BY source
"""


def _funnel(ev):
    from ebike_spark.plans.analytics import funnel_counts

    return funnel_counts(ev)


_FUNNEL_SQL = """
WITH f1 AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type='view' GROUP BY 1),
f2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN f1 ON e.user_id=f1.user_id
       WHERE e.event_type='click' AND e.ts > f1.t1 GROUP BY 1),
f3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN f2 ON e.user_id=f2.user_id
       WHERE e.event_type='purchase' AND e.ts > f2.t2 GROUP BY 1)
SELECT (SELECT count(*) FROM f1), (SELECT count(*) FROM f2), (SELECT count(*) FROM f3)
"""


def _retention(ev):
    from ebike_spark.plans.analytics import retention_matrix

    return retention_matrix(ev)


_RETENTION_SQL = """
WITH fa AS (SELECT user_id, CAST(epoch(date_trunc('day', MIN(ts))) AS BIGINT) d0
            FROM events GROUP BY 1),
act AS (SELECT DISTINCT user_id, CAST(epoch(date_trunc('day', ts)) AS BIGINT) d FROM events)
SELECT d0, (d - d0) // 86400 AS o, count(*) FROM act JOIN fa USING (user_id)
WHERE (d - d0) // 86400 IN (0, 1, 7, 14) GROUP BY 1, 2
"""


def _pq_adc(spark, emb):
    """Registered-path shape over probe embeddings: codebook + query
    from the BASE corpus (constant), ADC LUT scan + top-k over the
    replicated vectors."""
    import numpy as np

    from ebike_spark.operators.similarity import (
        PQ_M,
        PQ_SUBD,
        TOP_K,
        _make_pq_mapper,
        _pq_codebook,
        _query_vec,
    )

    cb = _pq_codebook(spark, SF)
    q = np.asarray(_query_vec(spark, SF), dtype=np.float64).reshape(PQ_M, PQ_SUBD)
    lut = ((q[:, None, :] - cb) ** 2).sum(-1)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    scored = e.mapInPandas(_make_pq_mapper(cb, lut), "vec_id long, adc_dist double")
    return scored.orderBy("adc_dist", "vec_id").limit(TOP_K)


_PQ_ADC_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
base AS (SELECT vec_id, v FROM e WHERE vec_id < 8),
sub AS (SELECT vec_id, m, v[m*8+1 : m*8+8] sv FROM e,
        (SELECT unnest(generate_series(0,7)) m) ms),
cw AS (SELECT m, vec_id k, v[m*8+1 : m*8+8] cv FROM base,
       (SELECT unnest(generate_series(0,7)) m) ms),
scored AS (SELECT s.vec_id, s.m, c.k, POWER(list_distance(s.sv, c.cv),2) d2,
             ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                ORDER BY list_distance(s.sv, c.cv), c.k) rn
           FROM sub s JOIN cw c ON s.m=c.m),
best AS (SELECT vec_id, m, k, d2 FROM scored WHERE rn=1),
qsub AS (SELECT m, sv qv FROM sub WHERE vec_id = 0),
lut AS (SELECT c.m, c.k, POWER(list_distance(q.qv, c.cv),2) qd
        FROM cw c JOIN qsub q ON q.m=c.m),
adc AS (SELECT b.vec_id, SUM(l.qd) ad FROM best b JOIN lut l ON l.m=b.m AND l.k=b.k
        WHERE b.vec_id != 0 GROUP BY 1)
SELECT vec_id, ad FROM adc ORDER BY ad, vec_id LIMIT 10
"""


def _semdedup(spark, emb):
    """Blocked within-cluster pair scan over probe embeddings, seeds
    from the base corpus. block=1024 so 10× clusters (~2500 vectors)
    split into 3 chunks — the multi-chunk path is what's measured, not
    the single-GEMM degenerate case."""
    from ebike_spark.operators.clustering import _make_assigner, _seed_centroids
    from ebike_spark.operators.semdedup import SEM_TAU, _make_block_scorer, tag_chunk_pairs

    SEM_BLOCK = 1024

    seeds = _seed_centroids(spark, SF)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    member = e.mapInPandas(
        _make_assigner(seeds, carry_v=True),
        "vec_id long, cluster_id int, cos double, v array<double>",
    ).select("vec_id", "cluster_id", "v")
    tagged = tag_chunk_pairs(member, SEM_BLOCK)
    return (
        tagged.groupBy("cluster_id", "ca", "cb")
        .applyInPandas(_make_block_scorer(SEM_TAU), "cluster_id int, v1 long, v2 long, cos double")
        .groupBy()
        .count()
    )


_SEMDEDUP_SQL = """
WITH seeds AS (SELECT vec_id cid, CAST(embedding AS DOUBLE[]) cv
               FROM embeddings WHERE vec_id < 8),
scored AS (SELECT e.vec_id, s.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cv) DESC,
                        s.cid) rn
           FROM embeddings e CROSS JOIN seeds s),
member AS (SELECT m.vec_id, m.cid, CAST(e.embedding AS DOUBLE[]) v
           FROM (SELECT vec_id, cid FROM scored WHERE rn=1) m
           JOIN embeddings e ON e.vec_id = m.vec_id)
SELECT count(*) FROM member a JOIN member b
ON a.cid=b.cid AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4
"""




def _knn_join(spark, emb):
    """Registered-path shape over probe embeddings: query matrix from
    the BASE corpus (constant size), GEMM prune + exact refine over the
    replicated corpus."""
    from pyspark.sql import Window

    from ebike_spark.functions.textfns import cosine_sim
    from ebike_spark.operators.similarity import (
        KNN_SLACK,
        N_QUERIES,
        TOP_K,
        _make_knn_pruner,
        _query_matrix,
    )

    queries = _query_matrix(spark, SF)
    e = emb.where(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cand = e.mapInPandas(
        _make_knn_pruner(queries, TOP_K + KNN_SLACK),
        "query_id long, vec_id long, v array<double>",
    )
    qdf = spark.createDataFrame(list(queries), "query_id long, qv array<double>")
    scored = cand.join(F.broadcast(qdf), "query_id").select(
        "query_id", "vec_id", cosine_sim(F.col("v"), F.col("qv")).alias("_c")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_c"), "vec_id")
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= TOP_K)


_KNN_SQL = """
WITH q AS (SELECT vec_id query_id, CAST(embedding AS DOUBLE[]) qv
           FROM embeddings WHERE vec_id < 8),
s AS (SELECT q.query_id, e.vec_id,
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) c
      FROM embeddings e, q WHERE e.vec_id >= 8),
r AS (SELECT query_id, vec_id, c,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) rn FROM s)
SELECT count(*) FROM r WHERE rn <= 10
"""


def _incremental(spark, docs):
    """Incremental near-dup dedup over the probe corpus: batch = top
    20% of the (shifted) id space — the last two replicas at 10×."""
    import math

    from ebike_spark.operators.dedup import (
        INCREMENT_FRACTION,
        JACCARD_DF_CAP,
        JACCARD_THRESHOLD,
        jaccard_pairs,
    )

    sh = _probe_shingles(spark, docs)
    mx = docs.agg(F.max("doc_id")).first()[0]
    cutoff = int(math.ceil((1.0 - INCREMENT_FRACTION) * (mx + 1)))
    dup = (
        jaccard_pairs(sh, JACCARD_THRESHOLD, df_cap=JACCARD_DF_CAP, batch_min_id=cutoff)
        .select("d2")
        .distinct()
    )
    return (
        docs.where(F.col("doc_id") >= cutoff)
        .join(dup, docs["doc_id"] == dup["d2"], "left_anti")
        .groupBy()
        .count()
    )


_INCREMENTAL_SQL = """
WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks WHERE len(w) >= 3),
sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS s FROM idx),
sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
cut AS (SELECT CAST(ceil(0.8 * (MAX(doc_id)+1)) AS BIGINT) cv FROM documents),
inter AS (SELECT a.doc_id d1, b.doc_id d2, count(*) c
          FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id, cut
          WHERE b.doc_id >= cut.cv GROUP BY 1,2),
dup AS (SELECT DISTINCT d2 FROM inter JOIN sizes sa ON sa.doc_id=d1
        JOIN sizes sb ON sb.doc_id=d2 WHERE c*1.0/(sa.n+sb.n-c) >= 0.8)
SELECT count(*) FROM documents d, cut
WHERE d.doc_id >= cut.cv AND d.doc_id NOT IN (SELECT d2 FROM dup)
"""


def _anomaly(ev):
    from ebike_spark.plans.analytics import anomaly_zscore

    return anomaly_zscore(ev)


_ANOMALY_SQL = """
WITH s AS (SELECT event_type, AVG(value) m, STDDEV_SAMP(value) sd
           FROM events GROUP BY 1)
SELECT count(*) FROM events e JOIN s USING (event_type)
WHERE ABS((e.value - s.m) / s.sd) >= 3.0
"""


def _gapfill(ev):
    from ebike_spark.plans.timeseries import gapfill_locf

    return gapfill_locf(ev)


_GAPFILL_SQL = """
WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) lo, date_trunc('hour', MAX(ts)) hi FROM events),
spine AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) h FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
agg AS (SELECT date_trunc('hour', ts) h, event_type, COUNT(*) n, SUM(value) total
        FROM events GROUP BY 1, 2)
SELECT count(*) FROM (
  SELECT LAST_VALUE(a.total IGNORE NULLS) OVER (
           PARTITION BY t.event_type ORDER BY s.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) v
  FROM spine s CROSS JOIN types t
  LEFT JOIN agg a ON a.h = s.h AND a.event_type = t.event_type)
"""


def _rollup(ev):
    from ebike_spark.plans.timeseries import hierarchical_rollup

    return hierarchical_rollup(ev)


_ROLLUP_SQL = """
SELECT count(*) FROM (
  SELECT date_trunc('minute', ts) b, event_type, COUNT(*) n, SUM(value) t FROM events GROUP BY 1,2
  UNION ALL
  SELECT date_trunc('hour', ts), event_type, COUNT(*), SUM(value) FROM events GROUP BY 1,2
  UNION ALL
  SELECT date_trunc('day', ts), event_type, COUNT(*), SUM(value) FROM events GROUP BY 1,2)
"""


def _concurrency(ev):
    from ebike_spark.plans.timeseries import concurrency_sweep

    return concurrency_sweep(ev)


_CONCURRENCY_SQL = """
WITH deltas AS (
  SELECT epoch_us(ts) t, 1 d, event_id FROM events
  UNION ALL SELECT epoch_us(ts) + 1800000000, -1, event_id FROM events),
run AS (SELECT t, SUM(d) OVER (ORDER BY t, d, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) conc FROM deltas)
SELECT t // 3600000000 * 3600, MAX(conc), COUNT(*) FROM run GROUP BY 1
"""


def _dq(li):
    from ebike_spark.operators.profiling import dq_report

    return dq_report(li)


_DQ_SQL = """
SELECT * FROM (
  SELECT 'a', SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END), COUNT(*) FROM lineitem
  UNION ALL SELECT 'b', SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END), COUNT(*) FROM lineitem
  UNION ALL SELECT 'c', SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END), COUNT(*) FROM lineitem
  UNION ALL SELECT 'd', SUM(CASE WHEN l_extendedprice < 0 OR l_tax < 0 THEN 1 ELSE 0 END), COUNT(*) FROM lineitem
  UNION ALL SELECT 'e', SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END), COUNT(*) FROM lineitem)
"""


if __name__ == "__main__":
    main()
