"""Regression guard for the executor-pickling bug class (bit twice):
any function shipped to Python workers (mapInPandas / applyInPandas /
pandas_udf) that references a module-level name pickles by module
reference and crashes executors that don't have ``ebike_spark`` on
PYTHONPATH — which is exactly the driver's situation.

pytest runs with cwd=repo (workers inherit it on sys.path), hiding the
bug; this test executes the Python-UDF queries in a SUBPROCESS from a
neutral cwd, the way the driver does.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from tests.conftest import REPO, SF_DIR

pytestmark = pytest.mark.slow  # >5s drives; full suite remains the pre-commit gate

SCRIPT = f"""
import sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ebike_spark.plans.registry import all_queries
qs = all_queries()
# every query family whose plan ships Python to executors: mapInPandas
# feature extraction, the fused minhash/embedding LSH banders (closure
# factories in dedup.py — the exact 'bit twice' bug class), mapInPandas
# PCA partials + broadcast-model projection, pyspark.ml + closure
# assignment
for name in ["mm_feature_extract", "dedup_minhash_lsh", "dedup_embedding_cosine", "embed_pca_audit", "embed_kmeans_lloyd"]:
    n = qs[name](spark, {SF_DIR!r}).count()
    print(name, "rows", n)
print("PICKLING_OK")
"""


def test_python_udf_queries_run_from_neutral_cwd():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "PICKLING_OK" in proc.stdout, proc.stderr[-3000:]
