"""Engine DML at volume: the set-oriented rewrite path (INSERT...SELECT,
UPDATE, DELETE) over the sf0.1 lineitem (~600k rows) — the reference's
row-at-a-time KV DML could not do this in test-able time; here each
statement is a handful of Spark jobs regardless of row count."""

from __future__ import annotations

import os
import uuid

import pytest

from ebike_spark.engine import Engine

pytestmark = pytest.mark.slow  # >5s drives; full suite remains the pre-commit gate

SF01 = "/root/testdata/sf0.1"


@pytest.fixture()
def eng(spark):
    e = Engine(spark)
    db = f"vol_{uuid.uuid4().hex[:8]}"
    e.execute(f"CREATE DATABASE {db}")
    e.execute(f"USE {db}")
    yield e
    e.execute(f"DROP DATABASE IF EXISTS {db}")


def test_bulk_dml_roundtrip(eng, spark):
    path = os.path.join(SF01, "lineitem.parquet")
    spark.read.parquet(path).createOrReplaceTempView("li_src")
    eng.execute("CREATE TABLE li (okey INT, qty FLOAT, price FLOAT, flag CHAR)")
    # bulk load through the INSERT...SELECT passthrough (beyond the
    # reference, which only implements VALUES)
    eng.execute(
        "INSERT INTO li SELECT l_orderkey, l_quantity, l_extendedprice, l_returnflag FROM li_src"
    )
    n = eng.execute("SELECT COUNT(*) AS c FROM li").rows()[0]["c"]
    assert n > 500_000

    # predicate UPDATE over the full table: one rewrite, not n point-writes
    r = eng.execute("UPDATE li SET price = price * 1.1 WHERE flag = 'R'")
    assert r.affected > 10_000
    got = eng.execute(
        "SELECT ROUND(SUM(price), 0) AS s FROM li WHERE flag = 'R'"
    ).rows()[0]["s"]
    want = spark.sql(
        "SELECT ROUND(SUM(l_extendedprice * 1.1), 0) AS s FROM li_src WHERE l_returnflag = 'R'"
    ).collect()[0]["s"]
    assert got == want

    # bulk DELETE
    r = eng.execute("DELETE FROM li WHERE qty < 10")
    assert r.affected > 50_000
    assert eng.execute("SELECT MIN(qty) AS m FROM li").rows()[0]["m"] >= 10
    assert (
        eng.execute("SELECT COUNT(*) AS c FROM li").rows()[0]["c"] == n - r.affected
    )
