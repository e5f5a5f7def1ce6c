"""Shared engine session/global state (split out of engine.py in r10
— VERDICT-r9 task 7): system-variable defaults, the process-global
SET GLOBAL overlay, the system-schema freshness epoch + lock, and the
result/prepared-statement dataclasses. One module so the Engine and
its DDL/DML/prepared mixins share state without an import cycle."""

from __future__ import annotations

import threading
from dataclasses import dataclass

from pyspark.sql import DataFrame


DEFAULT_SYS_VARS: dict[str, object] = {
    # mirrors the global-variables table the reference serves
    # (/root/reference/src/meta/def/performance_schema.rs, initial.rs:1113)
    "version": "8.0.26-ebike-spark-0.1",
    "version_comment": "ebike_spark (PySpark-native)",
    "autocommit": "ON",
    "sql_mode": "ONLY_FULL_GROUP_BY",
    "character_set_client": "utf8mb4",
    "character_set_connection": "utf8mb4",
    "character_set_results": "utf8mb4",
    "collation_connection": "utf8mb4_0900_ai_ci",
    "max_allowed_packet": 67108864,
    "lower_case_table_names": 1,
    "transaction_isolation": "REPEATABLE-READ",
    "wait_timeout": 28800,
    "interactive_timeout": 28800,
    # LOAD DATA path gate (MySQL --secure-file-priv): '' = any
    # server-readable path (a real MySQL configuration and this
    # engine's default); a directory restricts loads to it. READ-ONLY
    # at runtime, exactly like MySQL (SET -> 1238): if it were
    # session-settable, any wire client could lift the fence and read
    # any server-readable file. Fix it at Engine/server construction.
    "secure_file_priv": "",
}

# Variables MySQL refuses to SET at runtime (ER 1238). secure_file_priv
# is the security-load-bearing one: the LOAD DATA fence must be fixed
# at server start, not liftable over the wire.
READ_ONLY_SYS_VARS = frozenset({"secure_file_priv", "version", "version_comment"})

# SET GLOBAL scope: shared across every Engine (session) on this
# process, seeding new sessions — MySQL's global-variable semantics
# (the reference keeps one process-wide GlobalContext the same way,
# /root/reference/src/core/global_context.rs). SESSION scope lives on
# each Engine's sys_vars.
GLOBAL_VARS: dict[str, object] = {}

# Process-global freshness epoch for the SHARED system-schema physical
# tables (information_schema / mysql / performance_schema). They are
# one set of parquet tables per process, but Engines are
# one-per-connection under the wire server — so a DDL on connection A
# must invalidate connection B's targeted-refresh cache, or B serves
# stale information_schema indefinitely. Any mutation bumps the epoch;
# each Engine rebuilds its referenced tables when its seen epoch lags.
# The lock also serializes the rebuilds themselves: two connections
# racing overwrite-rebuilds of the same system table would otherwise
# collide in the metastore.
_SYS_SCHEMA_LOCK = threading.RLock()
_SYS_SCHEMA_EPOCH = [0]
# performance_schema.global_variables is rebuilt from the BUILDING
# engine's session vars — shared physical table, per-session content.
# Track who built it last so a DIFFERENT engine's read always rebuilds
# with its own vars (without this, connection B could serve A's
# session values while fresh at the same epoch).
_SYS_VARS_TABLE = "performance_schema.global_variables"
_SYS_VARS_BUILDER = [0]  # serial of the Engine that last rebuilt it
_ENGINE_SERIAL = [0]  # monotone: id() could be reused after a GC
# Concurrency note: system-schema SELECTs are eagerly materialized to
# a local relation while still holding the lock (_select), so a reader
# can neither observe another session's vars nor hit file-missing
# errors from an interleaved INSERT OVERWRITE rebuild of the shared
# physical table — the lazy-scan-after-release race is closed.


# Row cap for pinning system-schema SELECT results to a local
# relation inside the lock (see _select): every pure metadata query is
# far below it; a hybrid join against a big user table stays lazy.
_SYS_PIN_CAP = 100_000


def _bump_sys_schema_epoch() -> None:
    with _SYS_SCHEMA_LOCK:
        _SYS_SCHEMA_EPOCH[0] += 1



@dataclass
class EngineResult:
    kind: str  # 'rows' | 'count' | 'ok'
    df: DataFrame | None = None
    affected: int = 0

    def rows(self):
        return self.df.collect() if self.df is not None else []


@dataclass
class _Prepared:
    sql: str
    n_params: int

