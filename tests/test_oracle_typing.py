"""Oracle-typing gate.

The external driver's value-hash is type-sensitive: a DuckDB column
typed HUGEINT (the default result of SUM over any integer type) hashes
differently from Spark's BIGINT even when every value is identical.
This bug class shipped red driver rows twice (r02: corpus_pack_sequences
and corpus_mix_weights; r04: nine new oracles) despite a code comment
warning about it — so it is now a hard gate: every registered oracle is
DESCRIBEd through DuckDB (no execution, schema only) and no result
column may be HUGEINT/UHUGEINT. The fix at the offending site is always
``CAST(SUM(...) AS BIGINT)``.
"""

from __future__ import annotations

import duckdb
import pytest

from ebike_spark.plans.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR
from ebike_spark.sources.registry import TABLES

_load_all()

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)

# DuckDB types the driver's hash cannot align with any Spark type.
FORBIDDEN = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def typecheck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_has_no_unhashable_types(name, typecheck_con):
    spec = REGISTRY[name]
    # DESCRIBE plans the query and reports the result schema without
    # executing it — cheap even for the heavy dedup pipelines.
    rows = typecheck_con.execute(f"DESCRIBE {spec.oracle}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(f in typ.upper() for f in FORBIDDEN)
    ]
    assert not bad, (
        f"{name}: oracle columns {bad} are typed "
        f"{'/'.join(FORBIDDEN)} in DuckDB — the driver's value-hash "
        f"can't align these with Spark; wrap the aggregate in "
        f"CAST(... AS BIGINT)"
    )
