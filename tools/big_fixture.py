"""Build a larger SPARK_GRAFT_SF_DIR-compatible fixture by replicating
the sf0.1 tables N× (VERDICT-r13 task 3: demonstrate the §2/§3 rewrites
where compute dominates, not at the sf0.1 scheduling floor).

Layout matches the driver fixtures (``{out}/{table}.parquet``, readable
by sources.registry.load_table), so any registry query runs against it
via ``SPARK_GRAFT_SF_DIR``. Replication rules:

- lineitem/orders/customer/events/embeddings: keys shifted per replica
  (join/group cardinalities scale linearly, structures replicate).
- documents: doc_id shifted AND every token suffixed with the replica
  tag (``the cat`` → ``ther3 catr3``): shingle/term SETS are disjoint
  across replicas, so near-dup pairs/candidates scale LINEARLY with N.
  (tools/scale_probe.py's older append-one-token perturbation leaves
  cross-replica jaccard ≈ 0.9 — every base doc's replicas would form
  an N-clique and pair counts would grow quadratically, which is a
  different corpus, not a bigger one.)
- region/nation/supplier/part: copied as-is (dimension tables; lineitem
  part/supp keys are not shifted, so joins stay valid).

Usage: python tools/big_fixture.py [replicas] [out_dir]
Default: 10 replicas → /tmp/ebike_sfbig_x10
"""

from __future__ import annotations

import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pyspark.sql.functions as F  # noqa: E402

from ebike_spark.session import get_spark  # noqa: E402
from ebike_spark.sources.registry import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
KEY_SHIFT = 10_000_000


def build(spark, out: str, replicas: int) -> None:
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    reps = spark.range(replicas).select(F.col("id").alias("r"))

    def shifted(df, keys, extra=None):
        x = df.crossJoin(reps)
        for k in keys:
            x = x.withColumn(k, F.col(k) + F.col("r") * KEY_SHIFT)
        if extra is not None:
            x = extra(x)
        return x.drop("r")

    def write(df, name):
        df.write.parquet(os.path.join(out, f"{name}.parquet"))

    write(shifted(load_table(spark, SF, "lineitem"), ["l_orderkey"]), "lineitem")
    write(
        shifted(load_table(spark, SF, "orders"), ["o_orderkey", "o_custkey"]),
        "orders",
    )
    write(shifted(load_table(spark, SF, "customer"), ["c_custkey"]), "customer")
    # per-token replica suffix: disjoint shingle/term space per replica
    tag = F.concat(F.lit("r"), F.col("r").cast("string"))
    perturb = F.array_join(
        F.transform(F.split("text", " "), lambda t: F.concat(t, tag)), " "
    )
    write(
        shifted(
            load_table(spark, SF, "documents"),
            ["doc_id"],
            extra=lambda x: x.withColumn("text", perturb),
        ),
        "documents",
    )
    write(shifted(load_table(spark, SF, "embeddings"), ["vec_id"]), "embeddings")
    write(
        shifted(load_table(spark, SF, "events"), ["event_id", "user_id"]),
        "events",
    )
    for t in ("region", "nation", "supplier", "part"):
        shutil.copy(
            os.path.join(SF, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/ebike_sfbig_x{replicas}"
    spark = get_spark("big_fixture")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, out, replicas)
    docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
    print(f"built {out}: documents={docs.count()} rows")


if __name__ == "__main__":
    main()
