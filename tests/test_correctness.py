"""Driver-mirror correctness: every registered query vs its DuckDB
oracle on the same parquet tables — row count, column names, and
order-insensitive values (the same contract CORRECTNESS_r{N}.json
grades)."""

from __future__ import annotations

import math

import pytest

from ebike_spark.plans.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


def _normalize(rows, ncols):
    """Rows → sorted list of tuples with NaN/None canonicalized."""
    out = []
    for r in rows:
        vals = []
        for v in r:
            if v is None:
                vals.append(("null",))
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append(("null",))
                else:
                    vals.append(("f", round(v, 9)))
            elif isinstance(v, bool):
                vals.append(("b", v))
            elif isinstance(v, int):
                vals.append(("i", v))
            else:
                vals.append(("s", str(v)))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name, spark, oracle):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    scols = sorted(sdf.columns)
    srows = [[row[c] for c in scols] for row in sdf.collect()]

    ores = oracle.execute(spec.oracle)
    ocols_all = [d[0] for d in ores.description]
    odata = ores.fetchall()
    ocols = sorted(ocols_all)
    idx = [ocols_all.index(c) for c in ocols]
    orows = [[r[i] for i in idx] for r in odata]

    assert scols == ocols, f"{name}: column names differ: {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    sn, on = _normalize(srows, len(scols)), _normalize(orows, len(ocols))
    mismatches = [(a, b) for a, b in zip(sn, on) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, spark):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
    df = e.entry(spark)
    assert df.count() > 0
