"""The Engine: ebike's logical surface over Spark.

One object = one client session (the reference's per-connection state:
current schema, variables, prepared-statement cache —
/root/reference/src/core/session_context.rs:7-12,
/root/reference/src/core/execution.rs:790-880). ``execute(sql)``
plays the role of COM_QUERY dispatch
(/root/reference/src/core/execution.rs:894-1279): statements the engine
owns (DDL/DML/SHOW/USE/SET) are implemented here; SELECT/EXPLAIN/CTE/
VALUES pass through to Spark SQL exactly as the reference hands them to
DataFusion. No wire protocol — that's transport, not semantics.
"""

from __future__ import annotations

import re
import threading
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ebike_spark.engine import dml, show
from ebike_spark.engine.catalog import Catalog, bq
from ebike_spark.engine.errors import EbikeError, parse_error, unsupported
from ebike_spark.engine.parser import (
    map_unquoted,
    parse_create_table,
    parse_delete,
    parse_insert,
    parse_update,
    rewrite_group_concat,
    sql_literal,
    strip_comments,
    substitute_vars,
    unquote_ident,
)

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


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        default_db: str = "default",
        secure_file_priv: str | None = None,
    ):
        self.spark = spark
        self.catalog = Catalog(spark)
        self.current_db = default_db
        # new sessions see defaults overlaid with any SET GLOBAL values
        self.sys_vars = {**DEFAULT_SYS_VARS, **GLOBAL_VARS}
        self._secure_file_priv = secure_file_priv
        if secure_file_priv is not None:
            # construction-time only — the single place the LOAD DATA
            # fence can be set (SET rejects it with 1238 below)
            self.sys_vars["secure_file_priv"] = secure_file_priv
        self.user_vars: dict[str, object] = {}
        self.last_insert_id = 0
        self._stmts: dict[int, _Prepared] = {}
        self._next_stmt_id = 1
        # system tables this Engine has rebuilt at the CURRENT epoch
        # (see _select); -1 forces the first system-schema read to
        # rebuild whatever it references. _local_sys_dirty covers
        # SESSION-scoped SETs: they change only this engine's rebuild
        # of the variables views, so they invalidate THIS cache without
        # bumping the shared epoch. Documented caveat: the variables
        # views are shared PHYSICAL tables rebuilt with the READING
        # engine's session vars — two connections interleaving reads
        # see last-rebuilder-wins content for session-scoped rows,
        # inherent to one shared table (global/DDL-driven content is
        # epoch-correct).
        self._seen_sys_epoch = -1
        self._local_sys_dirty = False
        self._fresh_sys_tables: set[str] = set()
        with _SYS_SCHEMA_LOCK:
            _ENGINE_SERIAL[0] += 1
            self._serial = _ENGINE_SERIAL[0]

    def reset_session(self) -> None:
        """COM_RESET_CONNECTION surface (mysql_reset_connection):
        session state returns to the just-authenticated baseline
        WITHOUT re-auth — user variables and prepared statements drop,
        session system variables return to defaults overlaid with the
        current SET GLOBAL values, LAST_INSERT_ID() returns 0. The
        construction-time secure_file_priv fence SURVIVES (it is a
        server start option, not session state). The current database
        is preserved here (documented choice — this engine has no
        transactions, locks, or temp tables to roll back)."""
        self.sys_vars = {**DEFAULT_SYS_VARS, **GLOBAL_VARS}
        if self._secure_file_priv is not None:
            self.sys_vars["secure_file_priv"] = self._secure_file_priv
        self.user_vars = {}
        self.last_insert_id = 0
        self._stmts = {}
        # the variables views must rebuild with the reset session vars
        self._local_sys_dirty = True

    # ------------------------------------------------------------ dispatch

    def execute(self, sql: str) -> EngineResult:
        try:
            return self._execute(sql)
        except EbikeError:
            raise
        except Exception as e:
            # strict-cast guards (dml.guarded_cast_*) raise inside the
            # JVM with a marker message — translate to MySQL 1366.
            # Keyed off the exception CLASS, not a message prefix: an
            # AnalysisException's plan dump also CONTAINS the marker
            # text (the guard expressions), and matching it would
            # mistranslate an unresolved-column error into a false
            # 1366 naming the wrong column — but only analysis-family
            # errors embed plan dumps, so excluding them (rather than
            # requiring the [USER_RAISED_EXCEPTION] prefix, which not
            # every PySpark version's runtime message carries) keeps
            # the translation robust across versions.
            from pyspark.errors import AnalysisException

            if isinstance(e, AnalysisException):
                raise
            msg = str(e)
            rm = re.search(
                re.escape(dml.BADCAST_MARK)
                + r"(.*?)"
                + re.escape(dml.BADCAST_END),
                msg,
                re.S,
            )
            if rm:
                col = rm.group(1)
                raise EbikeError(
                    1366,
                    f"Incorrect value for column '{col}' "
                    "(out of range or not convertible to the declared type)",
                ) from e
            raise

    def _execute(self, sql: str) -> EngineResult:
        sql = strip_comments(sql).strip().rstrip(";").strip()
        if not sql:
            return EngineResult("ok")
        head = sql.split(None, 2)
        kw = head[0].upper()
        kw2 = head[1].upper() if len(head) > 1 else ""

        if kw in ("SELECT", "WITH", "VALUES", "TABLE", "EXPLAIN"):
            return self._select(sql)
        if kw == "USE":
            return self._use(head[1])
        if kw == "SHOW":
            return self._show(sql)
        if kw in ("DESCRIBE", "DESC") and kw2 not in ("SELECT", "TABLE", "QUERY", "EXTENDED"):
            # MySQL `DESCRIBE t` ≡ SHOW COLUMNS FROM t
            return self._show(f"SHOW COLUMNS FROM {head[1]}")
        if kw == "SET":
            return self._set(sql)
        if kw == "CREATE" and kw2 in ("DATABASE", "SCHEMA"):
            return self._create_db(sql)
        if kw == "DROP" and kw2 in ("DATABASE", "SCHEMA"):
            return self._drop_db(sql)
        if kw == "CREATE" and kw2 == "TABLE":
            return self._create_table(sql)
        if kw == "CREATE" and kw2 == "MATERIALIZED":
            return self._create_matview(sql)
        if kw == "REFRESH" and kw2 == "MATERIALIZED":
            return self._refresh_matview(sql)
        if kw == "DROP" and kw2 == "MATERIALIZED":
            return self._drop_matview(sql)
        if kw == "CREATE" and kw2 in ("INDEX", "UNIQUE"):
            # CREATE INDEX = range clustering; CREATE UNIQUE INDEX =
            # retroactive UNIQUE constraint (_add_unique)
            return self._create_index(sql)
        if kw == "DROP" and kw2 == "INDEX":
            return self._drop_index(sql)
        if (kw, kw2) in (("CREATE", "VIEW"), ("CREATE", "OR"), ("DROP", "VIEW")):
            # views — beyond the reference (its dispatcher 1105s them,
            # execution.rs:894-1279); Spark-native passthrough
            self.spark.catalog.setCurrentDatabase(self.current_db)
            self.spark.sql(sql)
            _bump_sys_schema_epoch()
            return EngineResult("count", affected=0)
        if kw == "DROP" and kw2 == "TABLE":
            return self._drop_table(sql)
        if kw == "ALTER" and kw2 == "TABLE":
            return self._alter_table(sql)
        if kw == "INSERT":
            return self._insert(sql)
        if kw == "REPLACE":
            # REPLACE INTO: MySQL delete-then-insert upsert (the
            # reference 1105s it; handled by the insert path's flag)
            return self._insert(sql)
        if kw == "UPDATE":
            return self._update(sql)
        if kw == "DELETE":
            return self._delete(sql)
        if kw == "TRUNCATE":
            return self._truncate(sql)
        if (
            kw in ("CHECK", "ANALYZE", "OPTIMIZE")
            and kw2 == "TABLE"
            # MySQL maintenance shape only (bare table list); Spark's
            # own ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS]
            # keeps its native passthrough below
            and not re.search(r"\b(COMPUTE|FOR|PARTITION|NOSCAN)\b", sql, re.I)
        ):
            return self._maintain_table(kw, sql)
        if kw == "LOAD" and kw2 == "DATA":
            # LOAD DATA [LOCAL] INFILE — bulk CSV load (reference 1105s it)
            from ebike_spark.engine import dml as _dml

            state: dict = {
                "secure_file_priv": self.sys_vars.get("secure_file_priv", "")
            }
            n = _dml.load_data(self.spark, self.catalog, sql, self.current_db, state)
            if "last_insert_id" in state:
                self.last_insert_id = state["last_insert_id"]
            return EngineResult("count", affected=n)
        if kw == "RENAME" and kw2 == "TABLE":
            return self._rename_tables(sql)
        if kw == "COMMIT":
            # autocommit semantics: accepted no-op (execution.rs:1265-1267)
            return EngineResult("ok")
        if kw == "BEGIN" or (kw == "START" and kw2 == "TRANSACTION"):
            # autocommit world: transactions open as no-ops (COMMIT is the
            # accepted close; ROLLBACK still 1105s like the reference) —
            # the mysqldump --single-transaction preamble
            return EngineResult("ok")
        if kw in ("LOCK", "UNLOCK") and kw2 in ("TABLES", "TABLE"):
            # mysqldump wraps each table in LOCK/UNLOCK TABLES; parquet
            # snapshots need no locks — acknowledged no-op
            return EngineResult("ok")
        if kw in ("ANALYZE", "CACHE", "UNCACHE", "REFRESH"):
            # Spark-native admin statements (beyond the reference's
            # surface): ANALYZE TABLE feeds CBO statistics — the stats
            # the reference's scan never provides (SURVEY §4.1
            # 'Statistics::default()'); CACHE pins hot tables columnar.
            self.spark.catalog.setCurrentDatabase(self.current_db)
            self.spark.sql(sql)
            return EngineResult("ok")
        # GRANT / ROLLBACK / CREATE INDEX / ... → MySQL 1105, like the
        # reference's dispatcher fallthrough.
        raise unsupported(sql.split(None, 1)[0])

    def execute_script(self, script: str) -> list[EngineResult]:
        """Execute a ;-separated statement script (client-session parity:
        the wire protocol delivers one statement per COM_QUERY, but every
        MySQL client tool batches scripts this way). Statements run in
        order; the first error aborts the rest."""
        from ebike_spark.engine.parser import split_top_level

        results = []
        for stmt in split_top_level(strip_comments(script), ";"):
            if stmt.strip():
                results.append(self.execute(stmt))
        return results

    # ------------------------------------------------------------ SELECT

    def _fix_dml_scalars(self, sql: str) -> str:
        """Rewrite session-scalar MySQL functions usable anywhere a value
        expression is (the canonical idiom is ``INSERT INTO child VALUES
        (LAST_INSERT_ID(), ...)``), quote-aware so literals pass through.
        MySQL %-format datetime functions rewrite here too — they appear
        in DML value expressions as readily as in SELECTs."""
        from ebike_spark.engine.parser import (
            map_unquoted,
            rewrite_mysql_datetime_fns,
        )

        if re.search(r"\b(?:DATE_FORMAT|STR_TO_DATE)\s*\(", sql, re.I):
            try:
                sql = rewrite_mysql_datetime_fns(sql)
            except ValueError as e:
                raise parse_error(str(e)) from e

        def fix(seg: str, first: bool, last: bool) -> str:
            return re.sub(
                r"\bLAST_INSERT_ID\s*\(\s*\)",
                str(getattr(self, "last_insert_id", 0)),
                seg,
                flags=re.I,
            )

        return map_unquoted(sql, fix)

    def _fix_select(self, sql: str, datetime_fns: bool = True) -> str:
        """``datetime_fns=False`` is for callers whose text already went
        through _fix_dml_scalars: the %-format rewrite is NOT idempotent
        (a second pass re-reads the emitted java pattern as MySQL
        %-format — 'yyyy-MM' would re-quote, 'dd%' would raise a
        spurious dangling-%), so it must run exactly once per text."""
        sql = substitute_vars(sql, self.sys_vars, self.user_vars, GLOBAL_VARS)
        # MySQL GROUP_CONCAT → Spark listagg (quote/paren-aware pass —
        # the construct spans quoted separators, so it can't run inside
        # the segment-wise map_unquoted rewrites below)
        if re.search(r"\bGROUP_CONCAT\s*\(", sql, re.I):
            try:
                sql = rewrite_group_concat(sql)
            except ValueError as e:
                raise parse_error(str(e)) from e
        # MySQL %-specifier datetime formats → java patterns (also a
        # quote-spanning construct: the format lives inside a literal)
        if datetime_fns and re.search(
            r"\b(?:DATE_FORMAT|STR_TO_DATE)\s*\(", sql, re.I
        ):
            from ebike_spark.engine.parser import rewrite_mysql_datetime_fns

            try:
                sql = rewrite_mysql_datetime_fns(sql)
            except ValueError as e:
                raise parse_error(str(e)) from e
        # MySQL FIELD() → array_position emulation (idempotent — the
        # emitted text contains no FIELD token — so no datetime_fns-
        # style re-application guard is needed)
        if re.search(r"\bFIELD\s*\(", sql, re.I):
            from ebike_spark.engine.parser import rewrite_field_fn

            try:
                sql = rewrite_field_fn(sql)
            except ValueError as e:
                raise parse_error(str(e)) from e

        # All rewrites run segment-wise OUTSIDE quoted spans so a string
        # literal containing e.g. "from dual" passes through untouched.
        def fix(seg: str, first: bool, last: bool) -> str:
            # MySQL's database() → Spark's current_database()
            seg = re.sub(r"\bdatabase\s*\(\s*\)", "current_database()", seg, flags=re.I)
            # MySQL LAST_INSERT_ID() → this session's last minted auto id
            seg = re.sub(
                r"\bLAST_INSERT_ID\s*\(\s*\)",
                str(getattr(self, "last_insert_id", 0)),
                seg,
                flags=re.I,
            )
            # `FROM dual` → no-FROM (Spark supports SELECT without FROM
            # natively; the reference injects a 1-row dual MemTable,
            # core_util.rs:463-479)
            seg = re.sub(r"\bFROM\s+dual\b", "", seg, flags=re.I)
            if first:
                # EXPLAIN dialect mapping (reference: explain.rs:41-101
                # supports VERBOSE/ANALYZE via DataFusion; Spark spells
                # these differently)
                seg = re.sub(r"^\s*EXPLAIN\s+VERBOSE\b", "EXPLAIN EXTENDED", seg, flags=re.I)
                seg = re.sub(r"^\s*EXPLAIN\s+ANALYZE\b", "EXPLAIN COST", seg, flags=re.I)
            if last:
                # MySQL `LIMIT offset, count` → Spark `LIMIT count OFFSET offset`
                seg = re.sub(
                    r"\bLIMIT\s+(\d+)\s*,\s*(\d+)(\s*)$",
                    r"LIMIT \2 OFFSET \1\3",
                    seg,
                    flags=re.I,
                )
            return seg

        return map_unquoted(sql, fix)

    @staticmethod
    def _mentions_rowid(sql: str) -> bool:
        """Does the query text name ``rowid`` as an identifier — bare OR
        identifier-quoted (`rowid` / "rowid")? Single-quoted string
        literals don't count. Governs whether the hidden rowid column is
        surfaced (reference: projection-time special case,
        core_util.rs:451-461)."""
        from ebike_spark.engine.parser import _skip_quoted

        i, n = 0, len(sql)
        while i < n:
            ch = sql[i]
            if ch == "'":
                i = _skip_quoted(sql, i)  # string literal: not an identifier
                continue
            if ch in "`\"":
                j = _skip_quoted(sql, i)
                if sql[i + 1 : j - 1].strip().lower() == "rowid":
                    return True  # explicitly projected quoted identifier
                i = j
                continue
            if re.match(r"\browid\b", sql[i:], re.I) and (i == 0 or not re.match(r"[\w$]", sql[i - 1])):
                return True
            i += 1
        return False

    def _drop_hidden_rowid(self, df: DataFrame) -> DataFrame:
        """Drop hidden rowid columns by PROVENANCE, not by name: only
        output attributes whose exprId traces back to the rowid attribute
        of a hidden-rowid table scan (ebike.rowid property) are removed.
        A user-declared column that happens to be named rowid — e.g. from
        the other side of a join — keeps flowing through (round-2 advice;
        the reference surfaces rowid whenever projected,
        core_util.rs:451-461). Positional rename → select keeps Catalyst
        free to prune the hidden column out of the scan."""
        analyzed = df._jdf.queryExecution().analyzed()
        hidden_ids: set[int] = set()
        leaves = analyzed.collectLeaves()
        for li in range(leaves.size()):
            leaf = leaves.apply(li)
            m = re.match(r"Relation (?:spark_catalog\.)?([\w.]+)\[", leaf.toString())
            if not m:
                continue
            try:
                if not self.catalog.has_rowid(m.group(1)):
                    continue
            except Exception:  # temp views etc. have no TBLPROPERTIES
                continue
            out = leaf.output()
            for oi in range(out.size()):
                attr = out.apply(oi)
                if attr.name().lower() == "rowid":
                    hidden_ids.add(attr.exprId().id())
        if not hidden_ids:
            return df
        out = analyzed.output()
        drop_pos = {
            i
            for i in range(out.size())
            if out.apply(i).name().lower() == "rowid" and out.apply(i).exprId().id() in hidden_ids
        }
        if not drop_pos:
            return df
        tmp = [f"__ebike_c{i}" for i in range(len(df.columns))]
        kept = [t for i, t in enumerate(tmp) if i not in drop_pos]
        names = [c for i, c in enumerate(df.columns) if i not in drop_pos]
        return df.toDF(*tmp).select(*kept).toDF(*names)

    def _select(self, sql: str) -> EngineResult:
        # Targeted system-schema refresh: rebuild ONLY the system tables
        # this SELECT references (each rebuild is a Spark write job +
        # metastore round-trips — rebuilding all nine info-schema tables
        # plus mysql/performance_schema for a query that reads one was
        # the dominant cost of the engine test family). Freshness is
        # tracked per table at a PROCESS-GLOBAL epoch: any DDL (on any
        # Engine/connection — the tables are shared) bumps the epoch,
        # invalidating every Engine's set on its next system-schema read.
        refs = {
            f"{s.lower()}.{t.lower()}"
            for s, t in re.findall(
                r"\b(information_schema|performance_schema|mysql)`?\s*\.\s*`?(\w+)",
                sql,
                re.I,
            )
        }
        if refs:
            with _SYS_SCHEMA_LOCK:
                if (
                    self._seen_sys_epoch != _SYS_SCHEMA_EPOCH[0]
                    or self._local_sys_dirty
                ):
                    self._fresh_sys_tables = set()
                    self._seen_sys_epoch = _SYS_SCHEMA_EPOCH[0]
                    self._local_sys_dirty = False
                if (
                    _SYS_VARS_TABLE in refs
                    and _SYS_VARS_BUILDER[0] != self._serial
                ):
                    # another engine rebuilt the variables view last —
                    # its content embeds THAT session's vars; rebuild
                    # with ours regardless of epoch freshness
                    self._fresh_sys_tables.discard(_SYS_VARS_TABLE)
                need = refs - self._fresh_sys_tables
                info_need = {
                    st.split(".", 1)[1]
                    for st in need
                    if st.startswith("information_schema.")
                }
                if info_need:
                    self.catalog.refresh_information_schema(only=info_need)
                if any(
                    st.startswith(("mysql.", "performance_schema.")) for st in need
                ):
                    self.catalog.refresh_system_schemas(self.sys_vars)
                    need |= {"mysql.users", _SYS_VARS_TABLE}
                    _SYS_VARS_BUILDER[0] = self._serial
                self._fresh_sys_tables |= need
                # Materialize the resultset BEFORE releasing the lock:
                # a lazily-scanned shared system table can otherwise be
                # INSERT-OVERWRITten by a concurrent connection's
                # rebuild mid-scan — the reader would see the OTHER
                # session's vars or hit file-missing errors on the
                # swapped-out parquet. System-schema resultsets are
                # metadata-sized, so pinning rows to a local relation
                # is cheap — but the query may JOIN a system table to
                # an arbitrarily large USER table, so the pin is
                # size-bounded: beyond the cap the lazy frame is kept
                # (the server then streams it) and only the documented
                # concurrent-rebuild residual remains for that rare
                # hybrid shape. The cap also bounds how long this
                # Spark job holds the schema lock.
                res = self._run_select(sql)
                if res.df is not None:
                    rows = res.df.limit(_SYS_PIN_CAP + 1).collect()
                    if len(rows) <= _SYS_PIN_CAP:
                        res.df = self.spark.createDataFrame(
                            rows, res.df.schema
                        )
                return res
        return self._run_select(sql)

    def _run_select(self, sql: str) -> EngineResult:
        self.spark.catalog.setCurrentDatabase(self.current_db)
        try:
            df = self.spark.sql(self._fix_select(sql))
            # `SELECT *` (or any projection that picked up the hidden
            # rowid without naming it) hides row identity; dropping it
            # here lets Catalyst prune the column out of the scan. A
            # user-DECLARED rowid column is not hidden — the drop is by
            # provenance (only attributes originating from a table
            # carrying the ebike.rowid property).
            if "rowid" in df.columns and not self._mentions_rowid(sql):
                df = self._drop_hidden_rowid(df)
            return EngineResult("rows", df=df)
        except Exception as ex:  # map missing relations to MySQL 1146
            # (the reference's table-existence check, core_util.rs:143-221)
            if "TABLE_OR_VIEW_NOT_FOUND" in str(ex):
                m = re.search(r"`([\w.]+)`", str(ex))
                from ebike_spark.engine.errors import table_not_exists

                raise table_not_exists(m.group(1) if m else "?") from ex
            raise

    # ------------------------------------------------------------ session

    def _use(self, db: str) -> EngineResult:
        name = unquote_ident(db.rstrip(";"))
        if not self.catalog.database_exists(name):
            from ebike_spark.engine.errors import unknown_database

            raise unknown_database(name)
        self.current_db = name
        self.spark.catalog.setCurrentDatabase(name)
        return EngineResult("ok")

    def _set(self, sql: str) -> EngineResult:
        body = sql.split(None, 1)[1].strip()
        if re.match(r"NAMES\b", body, re.I):
            return EngineResult("ok")  # execution.rs:884-886: acknowledged
        if re.match(r"(?:GLOBAL\s+|SESSION\s+)?TRANSACTION\b", body, re.I):
            # SET [SESSION] TRANSACTION ISOLATION LEVEL ... — acknowledged
            # no-op (single-writer parquet engine; mysqldump preamble)
            return EngineResult("ok")
        from ebike_spark.engine.parser import split_top_level

        for assign in split_top_level(body, ","):
            m = re.match(
                r"\s*(?:(@@?)(?:(GLOBAL|SESSION)\.)?|(GLOBAL|SESSION)\s+)?"
                r"([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.*)$",
                assign.strip(),
                re.I | re.S,
            )
            if not m:
                raise parse_error(f"near SET: {assign!r}")
            sigil = m.group(1) or ""
            scope = (m.group(2) or m.group(3) or "").lower()
            name, raw = m.group(4).lower(), m.group(5).strip()
            if (sigil != "@" or scope) and name in READ_ONLY_SYS_VARS:
                # MySQL ER_INCORRECT_GLOBAL_LOCAL_VAR-adjacent 1238:
                # the fence must not be liftable at runtime (GLOBAL
                # scope included — it would seed every NEW session)
                raise EbikeError(
                    1238, f"Variable '{name}' is a read only variable"
                )
            value = self._eval_scalar(raw)
            if sigil == "@" and not scope:
                self.user_vars[name] = value
            elif scope == "global":
                # MySQL: SET GLOBAL affects NEW sessions (and @@GLOBAL.x
                # reads), not this session's @@x. Globals feed every
                # session's view of the variables tables — bump the
                # SHARED epoch.
                GLOBAL_VARS[name] = value
                _bump_sys_schema_epoch()  # global_variables view
            else:  # SESSION / bare @@var / bare var
                # Session vars feed only THIS engine's rebuild of the
                # variables view — mark the engine locally dirty
                # instead of invalidating every connection's cache
                # (a per-connection `SET autocommit` must not trigger
                # O(connections x tables) rebuild storms).
                self.sys_vars[name] = value
                self._local_sys_dirty = True
        return EngineResult("ok")

    def _eval_scalar(self, raw: str):
        raw = raw.strip()
        if re.match(r"^-?\d+$", raw):
            return int(raw)
        if re.match(r"^-?\d*\.\d+$", raw):
            return float(raw)
        m = re.match(r"^'(.*)'$|^\"(.*)\"$", raw, re.S)
        if m:
            return (m.group(1) if m.group(1) is not None else m.group(2)).replace("''", "'")
        if raw.upper() in ("ON", "OFF", "TRUE", "FALSE"):
            return raw.upper()
        # expression (e.g. SET @x = 1 + 2): evaluate via Spark
        row = self.spark.sql(
            f"SELECT ({substitute_vars(raw, self.sys_vars, self.user_vars, GLOBAL_VARS)}) AS v"
        ).first()
        return row["v"]

    # ------------------------------------------------------------ SHOW

    def _show(self, sql: str) -> EngineResult:
        body = sql.split(None, 1)[1].strip()
        up = body.upper()
        spark = self.spark

        def rows(df: DataFrame) -> EngineResult:
            return EngineResult("rows", df=df)

        if up.startswith("DATABASES") or up.startswith("SCHEMAS"):
            return rows(show.show_databases(spark))
        m = re.match(r"(?:FULL\s+)?TABLES(?:\s+(?:FROM|IN)\s+([\w`\"]+))?\s*$", body, re.I)
        if m:
            db = unquote_ident(m.group(1)) if m.group(1) else self.current_db
            return rows(show.show_tables(spark, db))
        m = re.match(r"(?:FULL\s+)?(?:COLUMNS|FIELDS)\s+(?:FROM|IN)\s+([\w.`\"]+)(?:\s+(?:FROM|IN)\s+([\w`\"]+))?\s*$", body, re.I)
        if m:
            t = unquote_ident(m.group(1))
            if m.group(2):
                t = f"{unquote_ident(m.group(2))}.{t}"
            return rows(show.show_columns(spark, self.catalog, self.catalog.qualify(t, self.current_db)))
        m = re.match(r"CREATE\s+TABLE\s+([\w.`\"]+)\s*$", body, re.I)
        if m:
            q = self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
            return rows(show.show_create_table(spark, self.catalog, q))
        m = re.match(r"CREATE\s+(?:DATABASE|SCHEMA)\s+([\w`\"]+)\s*$", body, re.I)
        if m:
            db = unquote_ident(m.group(1))
            if db.lower() not in {d.name.lower() for d in spark.catalog.listDatabases()}:
                raise EbikeError(1049, f"Unknown database '{db}'")
            ddl = (
                f"CREATE DATABASE `{db}` /*!40100 DEFAULT CHARACTER SET "
                "utf8mb4 COLLATE utf8mb4_0900_ai_ci */"
            )
            return rows(
                spark.createDataFrame(
                    [(db, ddl)], "`Database` string, `Create Database` string"
                )
            )
        m = re.match(r"(?:INDEX|INDEXES|KEYS)\s+(?:FROM|IN)\s+([\w.`\"]+)\s*$", body, re.I)
        if m:
            q = self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
            return rows(show.show_index(spark, self.catalog, q))
        m = re.match(r"(?:(GLOBAL)\s+|SESSION\s+)?VARIABLES(?:\s+LIKE\s+'([^']*)')?\s*$", body, re.I)
        if m:
            # GLOBAL scope = defaults overlaid with SET GLOBAL values;
            # SESSION (default) = this session's variables
            scope = {**DEFAULT_SYS_VARS, **GLOBAL_VARS} if m.group(1) else self.sys_vars
            return rows(show.show_variables(spark, scope, m.group(2)))
        m = re.match(r"COUNT\(\*\)\s+(WARNINGS|ERRORS)", up)
        if m:
            # single-row single-int-column shape (clients read row[0][0])
            kind = "warning" if m.group(1) == "WARNINGS" else "error"
            return rows(show.show_warning_count(spark, kind))
        if up.startswith("WARNINGS") or up.startswith("ERRORS"):
            return rows(show.show_warnings(spark))
        if up.startswith("ENGINES"):
            return rows(show.show_engines(spark))
        if up.startswith("CHARACTER SET") or up.startswith("CHARSET"):
            return rows(show.show_charset(spark))
        if up.startswith("COLLATION"):
            return rows(show.show_collation(spark))
        m = re.match(r"TABLE\s+STATUS(?:\s+(?:FROM|IN)\s+([\w`\"]+))?\s*$", body, re.I)
        if m:
            db = unquote_ident(m.group(1)) if m.group(1) else self.current_db
            return rows(show.show_table_status(spark, self.catalog, db))
        if up.startswith("PROCESSLIST") or up.startswith("FULL PROCESSLIST"):
            return rows(show.show_processlist(spark, self.current_db))
        if up.startswith("GRANTS"):
            return rows(show.show_grants(spark))
        if up.startswith("PRIVILEGES"):
            return rows(show.show_privileges(spark))
        raise unsupported(f"SHOW {body}")

    # ------------------------------------------------------------ DDL

    def _create_db(self, sql: str) -> EngineResult:
        m = re.match(r"CREATE\s+(?:DATABASE|SCHEMA)\s+(IF\s+NOT\s+EXISTS\s+)?([\w`\"]+)\s*$", sql, re.I)
        if not m:
            raise parse_error("near CREATE DATABASE")
        self.catalog.create_database(unquote_ident(m.group(2)), bool(m.group(1)))
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=1)

    def _drop_db(self, sql: str) -> EngineResult:
        m = re.match(r"DROP\s+(?:DATABASE|SCHEMA)\s+(IF\s+EXISTS\s+)?([\w`\"]+)\s*$", sql, re.I)
        if not m:
            raise parse_error("near DROP DATABASE")
        self.catalog.drop_database(unquote_ident(m.group(2)), bool(m.group(1)))
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=0)

    def _create_table(self, sql: str) -> EngineResult:
        m = re.match(
            r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.`\"]+)\s+AS\s+(\(?\s*SELECT\b[\s\S]*)$",
            sql,
            re.I,
        )
        if m:
            return self._ctas(bool(m.group(1)), unquote_ident(m.group(2)), m.group(3))
        m = re.match(
            r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.`\"]+)\s+"
            r"(?:LIKE\s+([\w.`\"]+)|\(\s*LIKE\s+([\w.`\"]+)\s*\))\s*$",
            sql,
            re.I,
        )
        if m:
            # MySQL CREATE TABLE ... LIKE (both spellings): structure +
            # keys copy, data does not
            dst = self.catalog.qualify(unquote_ident(m.group(2)), self.current_db)
            src = self.catalog.qualify(
                unquote_ident(m.group(3) or m.group(4)), self.current_db
            )
            if self.catalog.table_exists(dst):
                if m.group(1):
                    return EngineResult("count", affected=0)
                raise EbikeError(1050, f"Table '{m.group(2)}' already exists")
            self.catalog.create_table_like(src, dst)
            _bump_sys_schema_epoch()
            return EngineResult("count", affected=0)
        try:
            ct = parse_create_table(sql)
        except ValueError as e:
            raise parse_error(str(e)) from e
        self.catalog.create_table(ct, self.current_db)
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=0)

    def _ctas(self, if_not_exists: bool, table: str, select_sql: str) -> EngineResult:
        """CREATE TABLE ... AS SELECT (MySQL CTAS; beyond the reference,
        whose CREATE only takes a column list). The result schema is the
        SELECT's schema; no PK/UNIQUE/rowid metadata (as in MySQL, where
        CTAS copies data but not indexes). Affected-rows = rows written,
        MySQL-style."""
        q = self.catalog.qualify(table, self.current_db)
        if self.catalog.table_exists(q):
            if if_not_exists:
                return EngineResult("count", affected=0)
            raise EbikeError(1050, f"Table '{table}' already exists")
        self.spark.catalog.setCurrentDatabase(self.current_db)
        src = self.spark.sql(self._fix_select(select_sql))
        # same invariant as the SELECT path: the hidden rowid must not
        # become a visible user column of the new table
        if "rowid" in src.columns and not self._mentions_rowid(select_sql):
            src = self._drop_hidden_rowid(src)
        self.catalog._ensure_fresh_location(q)
        src.write.format("parquet").saveAsTable(q)
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=self.spark.table(q).count())

    # A materialized view is a managed parquet table whose defining
    # SELECT is stored (base64, to dodge DDL string escaping) in table
    # properties; REFRESH re-runs it through the same staged-swap path
    # DML uses. The OLAP-engine face of the hierarchical-rollup pattern
    # (plans/timeseries.py): materialize once, re-serve cheaply,
    # recompute on demand. Beyond the reference (1105s there).
    _PROP_MATVIEW = "ebike.matview.sql"

    def _create_matview(self, sql: str) -> EngineResult:
        m = re.match(
            r"CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w.`\"]+)\s+AS\s+(\(?\s*SELECT\b[\s\S]*)$",
            sql,
            re.I,
        )
        if not m:
            raise parse_error("near CREATE MATERIALIZED VIEW")
        import base64

        q = self.catalog.qualify(unquote_ident(m.group(2)), self.current_db)
        if self.catalog.table_exists(q):
            # IF NOT EXISTS: no-op, and do NOT claim the existing
            # object as a matview; otherwise 1050 via the CTAS path
            return self._ctas(bool(m.group(1)), unquote_ident(m.group(2)), m.group(3))
        res = self._ctas(bool(m.group(1)), unquote_ident(m.group(2)), m.group(3))
        enc = base64.b64encode(m.group(3).strip().encode()).decode()
        try:
            self.spark.sql(
                f"ALTER TABLE {bq(q)} SET TBLPROPERTIES ('{self._PROP_MATVIEW}' = '{enc}')"
            )
        except Exception:
            # CTAS + marker must be atomic: without the property the
            # object is a plain table that REFRESH/DROP MATERIALIZED
            # VIEW reject with 1347 and DROP MATERIALIZED VIEW refuses
            # to clean up — roll the CTAS back instead of leaking it
            self.spark.sql(f"DROP TABLE IF EXISTS {bq(q)}")
            raise
        return res

    _PROP_CLUSTER = "ebike.cluster."

    def _create_index(self, sql: str) -> EngineResult:
        """CREATE INDEX — the Spark-first reinterpretation of a
        secondary index: a columnar engine has no B-tree to build, so
        the index becomes PHYSICAL RANGE CLUSTERING on the key columns.
        The table is rewritten repartitionByRange + sortWithinPartitions
        on the index columns, which makes parquet row-group min/max
        statistics (zone maps) selective for predicates on those
        columns — the scan skips row groups the way the reference's
        sled index-range seek skips keys
        (/root/reference/src/core/execution.rs index-seek path; the
        reference's own CREATE INDEX statement falls through to 1105).
        The index is recorded in table properties; SHOW INDEX lists it
        with Index_type CLUSTERED. One clustering order per table can
        be physically dominant — creating a second index re-clusters
        (documented; MySQL's secondary B-trees have no such coupling)."""
        m = re.match(
            r"CREATE\s+(UNIQUE\s+)?INDEX\s+([\w`\"]+)\s+ON\s+([\w.`\"]+)\s*\(([^)]+)\)\s*$",
            sql,
            re.I,
        )
        if not m:
            raise parse_error("near CREATE INDEX")
        from ebike_spark.engine.parser import split_top_level

        if m.group(1):
            # CREATE UNIQUE INDEX = retroactive UNIQUE constraint: the
            # existing data is checked for duplicates, then the key is
            # recorded and enforced by every subsequent INSERT/upsert
            name = unquote_ident(m.group(2))
            q = self.catalog.qualify(unquote_ident(m.group(3)), self.current_db)
            cols = [unquote_ident(c) for c in split_top_level(m.group(4))]
            return self._add_unique(q, name, cols)
        name = unquote_ident(m.group(2))
        if not re.fullmatch(r"\w+", name):
            raise parse_error(f"bad index name '{name}'")
        q = self.catalog.qualify(unquote_ident(m.group(3)), self.current_db)
        self.catalog.require_table(q)
        cols = [unquote_ident(c) for c in split_top_level(m.group(4))]
        known = {c for c, _ in self.catalog.column_types(q)}
        for c in cols:
            if c not in known:
                raise EbikeError(1072, f"Key column '{c}' doesn't exist in table")
        if any(n == name for n, _ in self.catalog.cluster_indexes(q)):
            raise EbikeError(1061, f"Duplicate key name '{name}'")
        t = self.spark.table(q)
        from ebike_spark.engine import dml

        dml._rewrite(
            self.spark, q, t.repartitionByRange(*cols).sortWithinPartitions(*cols)
        )
        self.spark.sql(
            f"ALTER TABLE {bq(q)} SET TBLPROPERTIES "
            f"('{self._PROP_CLUSTER}{name}' = '{','.join(cols)}')"
        )
        return EngineResult("count", affected=0)

    def _drop_index(self, sql: str) -> EngineResult:
        m = re.match(r"DROP\s+INDEX\s+([\w`\"]+)\s+ON\s+([\w.`\"]+)\s*$", sql, re.I)
        if not m:
            raise parse_error("near DROP INDEX")
        return self._drop_index_named(
            self.catalog.qualify(unquote_ident(m.group(2)), self.current_db),
            unquote_ident(m.group(1)),
        )

    def _drop_index_named(self, q: str, name: str) -> EngineResult:
        from ebike_spark.engine.catalog import PROP_UNIQUE_PREFIX

        self.catalog.require_table(q)
        if any(n == name for n, _ in self.catalog.cluster_indexes(q)):
            # metadata-only: the physical clustering stays (harmless —
            # it is just a row order) but stops being advertised or
            # maintained
            self.spark.sql(
                f"ALTER TABLE {bq(q)} UNSET TBLPROPERTIES ('{self._PROP_CLUSTER}{name}')"
            )
            _bump_sys_schema_epoch()
            return EngineResult("count", affected=0)
        if any(n == name for n, _ in self.catalog.unique_keys(q)):
            # dropping a UNIQUE index stops its constraint enforcement
            self.spark.sql(
                f"ALTER TABLE {bq(q)} UNSET TBLPROPERTIES ('{PROP_UNIQUE_PREFIX}{name}')"
            )
            _bump_sys_schema_epoch()
            return EngineResult("count", affected=0)
        raise EbikeError(1091, f"Can't DROP '{name}'; check that column/key exists")

    def _add_unique(self, q: str, name: str, cols: list[str]) -> EngineResult:
        """Retroactive UNIQUE key: reject if the existing data already
        violates it (one bounded LIMIT-1 duplicate probe — rows with a
        NULL in any key column are exempt, MySQL semantics), then record
        the key; the INSERT/upsert paths enforce it from then on."""
        from ebike_spark.engine.catalog import PROP_UNIQUE_PREFIX

        self.catalog.require_table(q)
        if not re.fullmatch(r"\w+", name):
            raise parse_error(f"bad index name '{name}'")
        known = {c for c, _ in self.catalog.column_types(q)}
        for c in cols:
            if c not in known:
                raise EbikeError(1072, f"Key column '{c}' doesn't exist in table")
        taken = {n for n, _ in self.catalog.unique_keys(q)}
        taken.update(n for n, _ in self.catalog.cluster_indexes(q))
        if name in taken:
            raise EbikeError(1061, f"Duplicate key name '{name}'")
        t = self.spark.table(q)
        non_null = t
        for c in cols:
            non_null = non_null.where(F.col(c).isNotNull())
        dup = (
            non_null.groupBy(*[F.col(c) for c in cols])
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            vals = "-".join(str(dup[0][c]) for c in cols)
            raise EbikeError(1062, f"Duplicate entry '{vals}' for key '{name}'")
        self.spark.sql(
            f"ALTER TABLE {bq(q)} SET TBLPROPERTIES "
            f"('{PROP_UNIQUE_PREFIX}{name}' = '{','.join(cols)}')"
        )
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=0)

    def _add_primary_key(self, q: str, cols: list[str]) -> EngineResult:
        """Retroactive PRIMARY KEY: existing NULLs are 1138, existing
        duplicates 1062; the key columns join the NOT NULL set."""
        from ebike_spark.engine.catalog import PROP_NOT_NULL, PROP_PK

        self.catalog.require_table(q)
        if self.catalog.primary_key(q):
            raise EbikeError(1068, "Multiple primary key defined")
        known = {c for c, _ in self.catalog.column_types(q)}
        for c in cols:
            if c not in known:
                raise EbikeError(1072, f"Key column '{c}' doesn't exist in table")
        t = self.spark.table(q)
        import functools as _ft
        import operator as _op

        any_null = _ft.reduce(_op.or_, [F.col(c).isNull() for c in cols])
        if t.where(any_null).limit(1).collect():
            raise EbikeError(1138, "Invalid use of NULL value in key column")
        dup = (
            t.groupBy(*[F.col(c) for c in cols])
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            vals = "-".join(str(dup[0][c]) for c in cols)
            raise EbikeError(1062, f"Duplicate entry '{vals}' for key 'PRIMARY'")
        nn = self.catalog.not_null_cols(q)
        nn.extend(c for c in cols if c not in nn)
        self.spark.sql(
            f"ALTER TABLE {bq(q)} SET TBLPROPERTIES "
            f"('{PROP_PK}' = '{','.join(cols)}', '{PROP_NOT_NULL}' = '{','.join(nn)}')"
        )
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=0)

    def _drop_primary_key(self, q: str) -> EngineResult:
        from ebike_spark.engine.catalog import PROP_PK

        self.catalog.require_table(q)
        if not self.catalog.primary_key(q):
            raise EbikeError(1091, "Can't DROP 'PRIMARY'; check that column/key exists")
        # MySQL keeps the NOT NULL attribute on former PK columns
        self.spark.sql(f"ALTER TABLE {bq(q)} UNSET TBLPROPERTIES ('{PROP_PK}')")
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=0)

    def _matview_sql(self, q: str) -> str:
        import base64

        enc = self.catalog.properties(q).get(self._PROP_MATVIEW)
        if enc is None:
            raise EbikeError(1347, f"'{q}' is not a MATERIALIZED VIEW")
        return base64.b64decode(enc).decode()

    def _refresh_matview(self, sql: str) -> EngineResult:
        m = re.match(r"REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`\"]+)\s*$", sql, re.I)
        if not m:
            raise parse_error("near REFRESH MATERIALIZED VIEW")
        q = self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
        self.catalog.require_table(q)
        stored = self._matview_sql(q)
        self.spark.catalog.setCurrentDatabase(self.current_db)
        src = self.spark.sql(self._fix_select(stored))
        cur = self.spark.table(q)
        if [f.dataType for f in src.schema.fields] != [
            f.dataType for f in cur.schema.fields
        ]:
            raise unsupported("REFRESH with a changed result schema")
        dml._rewrite(self.spark, q, src)
        return EngineResult("count", affected=self.spark.table(q).count())

    def _drop_matview(self, sql: str) -> EngineResult:
        m = re.match(
            r"DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`\"]+)\s*$", sql, re.I
        )
        if not m:
            raise parse_error("near DROP MATERIALIZED VIEW")
        q = self.catalog.qualify(unquote_ident(m.group(2)), self.current_db)
        if not m.group(1):
            self.catalog.require_table(q)
        # IF EXISTS only suppresses the missing-object error; an
        # existing object must still be a materialized view (1347),
        # never a plain table silently dropped with its data
        if self.catalog.table_exists(q):
            self._matview_sql(q)  # 1347 if it's a plain table
            self.catalog.drop_table(q, True)
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=0)

    def _truncate(self, sql: str) -> EngineResult:
        """TRUNCATE [TABLE] t — MySQL fast-delete-all (affected 0).
        Spark's native TRUNCATE drops the managed table's data files,
        the same O(files) operation MySQL's handler performs."""
        m = re.match(r"TRUNCATE\s+(?:TABLE\s+)?([\w.`\"]+)\s*$", sql, re.I)
        if not m:
            raise parse_error("near TRUNCATE")
        q = self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
        self.catalog.require_table(q)
        self.spark.sql(f"TRUNCATE TABLE {bq(q)}")
        return EngineResult("count", affected=0)

    def _maintain_table(self, kw: str, sql: str) -> EngineResult:
        """MySQL maintenance statements, each mapped to its real Spark
        counterpart (the reference 1105s all three):

        - CHECK TABLE → a full integrity audit: PK/UNIQUE uniqueness and
          NOT NULL re-validated set-orientedly against the stored data
          (the checks DML enforces, re-run at rest — detects corruption
          introduced by external writers). Reports MySQL's row shape.
        - ANALYZE TABLE → ANALYZE TABLE COMPUTE STATISTICS (row counts /
          sizes into the catalog — what feeds join-strategy choices).
        - OPTIMIZE TABLE → compact the table's data files: one staged
          rewrite through the DML swap path (the io_compact_small_files
          maintenance shape applied to an engine table).

        All three accept a comma list and return one (Table, Op,
        Msg_type, Msg_text) row per table, MySQL-style."""
        from ebike_spark.engine.parser import split_top_level

        m = re.match(rf"{kw}\s+TABLE\s+([\s\S]+?)\s*;?\s*$", sql, re.I)
        if not m:
            raise parse_error(f"near {kw} TABLE")
        rows = []
        for tok in split_top_level(m.group(1)):
            q = self.catalog.qualify(unquote_ident(tok.strip()), self.current_db)
            self.catalog.require_table(q)
            disp = q.split(".", 1)[1] if "." in q else q
            if kw == "ANALYZE":
                self.spark.sql(f"ANALYZE TABLE {bq(q)} COMPUTE STATISTICS")
                rows.append((disp, "analyze", "status", "OK"))
                continue
            if kw == "OPTIMIZE":
                t = self.spark.table(q)
                dml._rewrite(
                    self.spark, q, t.coalesce(max(1, t.rdd.getNumPartitions() // 8))
                )
                rows.append((disp, "optimize", "status", "OK"))
                continue
            # CHECK TABLE: re-validate declared constraints at rest
            # through the SAME probe the UPDATE post-image re-check
            # uses (dml.duplicate_key_probe — one 'duplicate' semantics)
            t = self.spark.table(q)
            msgs = []
            for col in self.catalog.not_null_cols(q):
                if t.where(F.col(col).isNull()).limit(1).count() > 0:
                    msgs.append(f"column '{col}' contains NULL")
            for key_name, _dup in dml.duplicate_key_probe(
                t, dml.declared_keys(self.catalog, q)
            ):
                msgs.append(f"duplicate entries in key '{key_name}'")
            if msgs:
                rows.append((disp, "check", "error", "; ".join(msgs)))
            else:
                rows.append((disp, "check", "status", "OK"))
        df = self.spark.createDataFrame(
            rows, "`Table` string, Op string, Msg_type string, Msg_text string"
        )
        return EngineResult("rows", df=df)

    def _rename_tables(self, sql: str) -> EngineResult:
        """RENAME TABLE a TO b [, c TO d ...] — metadata-only move.
        Cross-database renames are refused (Spark's v1 session catalog
        renames within a database; MySQL allows the move — 1105 keeps
        the failure explicit rather than silently copying data)."""
        from ebike_spark.engine.parser import split_top_level

        body = re.match(r"RENAME\s+TABLE\s+([\s\S]+)$", sql, re.I).group(1)
        # MySQL applies pairs left-to-right on the evolving namespace
        # (chains `a TO b, b TO c` and swaps `a TO tmp, b TO a` are
        # legal), so validation simulates that evolution: `gone` holds
        # sources already renamed away, `made` the targets created so
        # far. Checking every pair against the simulated state first
        # keeps the common failure modes (missing source, existing
        # target) all-or-nothing before any ALTER runs.
        pairs = []
        gone: set = set()
        made: set = set()
        for part in split_top_level(body):
            pm = re.match(r"\s*([\w.`\"]+)\s+TO\s+([\w.`\"]+)\s*$", part, re.I)
            if not pm:
                raise parse_error("near RENAME TABLE")
            src = self.catalog.qualify(unquote_ident(pm.group(1)), self.current_db)
            dst = self.catalog.qualify(unquote_ident(pm.group(2)), self.current_db)
            if src not in made and (src in gone or not self.catalog.table_exists(src)):
                raise EbikeError(1146, f"Table '{pm.group(1)}' doesn't exist")
            if dst in made or (dst not in gone and self.catalog.table_exists(dst)):
                raise EbikeError(1050, f"Table '{pm.group(2)}' already exists")
            if src.rpartition(".")[0] != dst.rpartition(".")[0]:
                raise unsupported("cross-database RENAME TABLE")
            gone.add(src)
            made.discard(src)
            gone.discard(dst)
            made.add(dst)
            pairs.append((src, dst))
        for src, dst in pairs:
            self.spark.sql(f"ALTER TABLE {bq(src)} RENAME TO {bq(dst)}")
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=0)

    def _drop_table(self, sql: str) -> EngineResult:
        m = re.match(r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.`\"]+)\s*$", sql, re.I)
        if not m:
            raise parse_error("near DROP TABLE")
        q = self.catalog.qualify(unquote_ident(m.group(2)), self.current_db)
        self.catalog.drop_table(q, bool(m.group(1)))
        _bump_sys_schema_epoch()
        return EngineResult("count", affected=0)

    def _alter_table(self, sql: str) -> EngineResult:
        """ALTER TABLE dispatch. MySQL allows a comma-separated clause
        list in one statement (``ADD COLUMN a INT, DROP COLUMN b, ADD
        KEY k (a)``) applied atomically; the reference's dispatcher
        handles only single-clause ALTERs (execution.rs:894-1279), so
        the multi-clause path is beyond-reference dialect surface."""
        from ebike_spark.engine.parser import split_top_level

        m = re.match(r"ALTER\s+TABLE\s+([\w.`\"]+)\s+([\s\S]+?)\s*$", sql, re.I)
        if m:
            rest = m.group(2)
            if rest.rstrip().endswith(","):
                # a trailing comma is a dangling empty clause, not a
                # licence to ignore it (recurring review-bug shape)
                raise parse_error("near ',' (empty ALTER TABLE clause)")
            clauses = split_top_level(rest)
            if len(clauses) > 1:
                return self._alter_table_multi(m.group(1), clauses)
        return self._alter_table_single(sql)

    def _alter_table_multi(self, tbl_tok: str, clauses: list[str]) -> EngineResult:
        """Comma-separated ALTER TABLE, atomic like MySQL 8.0: every
        clause is applied to a staged copy of the table (data + ebike.*
        properties), and only a fully-successful run swaps the stage
        into place — a failing clause leaves the original untouched.
        A RENAME [TO|AS] clause is applied last (MySQL processes the
        rename with the rebuild; other clauses name the old table).

        The copy cost is acceptable at engine-table scale: any ALTER
        list containing a column clause rewrites the data anyway, and
        the engine's managed tables are the OLTP-ish surface, not the
        100 TB analytics parquet."""
        import uuid as _uuid

        q = self.catalog.qualify(unquote_ident(tbl_tok), self.current_db)
        self.catalog.require_table(q)
        rename_to: str | None = None
        body: list[str] = []
        for cl in clauses:
            if not cl:
                raise parse_error("near ',' (empty ALTER TABLE clause)")
            rm = re.match(r"RENAME\s+(?:TO\s+|AS\s+)?([\w.`\"]+)\s*$", cl, re.I)
            if rm:
                if rename_to is not None:
                    raise parse_error("multiple RENAME clauses in one ALTER TABLE")
                rename_to = rm.group(1)
                continue
            if not re.match(r"(?:ADD|DROP|MODIFY|CHANGE)\b", cl, re.I):
                # reject garbage clauses before paying for the stage copy
                raise parse_error(f"near '{cl.split()[0]}'")
            body.append(cl)
        if rename_to is not None:
            # pre-check the rename target so a late 1050/unsupported
            # can't strand an already-applied clause list
            dst = self.catalog.qualify(unquote_ident(rename_to), self.current_db)
            src_db, _, _ = q.rpartition(".")
            dst_db, _, _ = dst.rpartition(".")
            if dst_db != src_db:
                raise unsupported("cross-database RENAME TABLE")
            if self.catalog.table_exists(dst):
                raise EbikeError(1050, f"Table '{dst}' already exists")
        db, _, _ = q.rpartition(".")
        # "__ebike_stage" prefix: the SHOW/information_schema filters hide
        # internal staging tables by that literal prefix, so a crash leak
        # stays invisible to users (review finding: a distinct prefix
        # bypassed all three filters)
        stage = f"{db}.__ebike_stage_alter_{_uuid.uuid4().hex[:12]}"
        self.spark.table(q).write.saveAsTable(stage)
        props = {
            k: v for k, v in self.catalog.properties(q).items() if k.startswith("ebike.")
        }
        try:
            # phase 1 — build the altered copy; the original is untouched,
            # so rollback here is simply dropping the stage
            if props:
                props_ddl = ", ".join(f"'{k}' = '{v}'" for k, v in props.items())
                self.spark.sql(f"ALTER TABLE {bq(stage)} SET TBLPROPERTIES ({props_ddl})")
            for cl in body:
                self._alter_table_single(f"ALTER TABLE {stage} {cl}")
        except Exception:
            self.spark.sql(f"DROP TABLE IF EXISTS {bq(stage)}")
            _bump_sys_schema_epoch()
            raise
        # phase 2 — swap (same crash window as _recreate_table's,
        # documented). Once the original is dropped the stage is the ONLY
        # copy of the data: a failed RENAME must PRESERVE it, never drop
        # it (review finding: the old single rollback handler deleted the
        # survivor on a transient rename failure — total data loss).
        try:
            self.spark.sql(f"DROP TABLE {bq(q)}")
            try:
                self.spark.sql(f"ALTER TABLE {bq(stage)} RENAME TO {bq(q)}")
            except Exception as exc:
                raise EbikeError(
                    1105,
                    f"ALTER TABLE swap failed after dropping '{q}'; the fully-"
                    f"altered data is preserved in '{stage}' — rename it back "
                    f"manually ({exc})",
                ) from exc
        finally:
            _bump_sys_schema_epoch()
        if rename_to is not None:
            return self._rename_tables(f"RENAME TABLE {tbl_tok} TO {rename_to}")
        return EngineResult("count", affected=0)

    def _alter_table_single(self, sql: str) -> EngineResult:
        m = re.match(
            r"ALTER\s+TABLE\s+([\w.`\"]+)\s+ADD\s+(?:COLUMN\s+)?([\w`\"]+)\s+(\w+)"
            r"(?:\s*\(\s*(\d+)(?:\s*,\s*(\d+))?\s*\))?\s*$",
            sql,
            re.I,
        )
        if m:
            q = self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
            self.catalog.alter_add_column(
                q,
                unquote_ident(m.group(2)),
                m.group(3).upper(),
                precision=int(m.group(4)) if m.group(4) else None,
                scale=int(m.group(5)) if m.group(5) else None,
            )
            _bump_sys_schema_epoch()
            return EngineResult("count", affected=0)
        m = re.match(r"ALTER\s+TABLE\s+([\w.`\"]+)\s+DROP\s+(?:COLUMN\s+)?([\w`\"]+)\s*$", sql, re.I)
        if m:
            return self._drop_column(
                self.catalog.qualify(unquote_ident(m.group(1)), self.current_db),
                unquote_ident(m.group(2)),
            )
        m = re.match(
            r"ALTER\s+TABLE\s+([\w.`\"]+)\s+RENAME\s+(?:TO\s+|AS\s+)?([\w.`\"]+)\s*$", sql, re.I
        )
        if m:
            # MySQL's second rename spelling — same path as RENAME TABLE
            return self._rename_tables(f"RENAME TABLE {m.group(1)} TO {m.group(2)}")
        m = re.match(
            r"ALTER\s+TABLE\s+([\w.`\"]+)\s+ADD\s+PRIMARY\s+KEY\s*\(([^)]+)\)\s*$", sql, re.I
        )
        if m:
            from ebike_spark.engine.parser import split_top_level

            q = self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
            return self._add_primary_key(
                q, [unquote_ident(c) for c in split_top_level(m.group(2))]
            )
        m = re.match(
            r"ALTER\s+TABLE\s+([\w.`\"]+)\s+ADD\s+UNIQUE\s*(?:\b(?:INDEX|KEY)\b\s*)?"
            r"(?:([\w`\"]+)\s*)?\(([^)]+)\)\s*$",
            sql,
            re.I,
        )
        if m:
            from ebike_spark.engine.parser import split_top_level

            q = self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
            cols = [unquote_ident(c) for c in split_top_level(m.group(3))]
            name = unquote_ident(m.group(2)) if m.group(2) else None
            if name is None:
                # MySQL auto-names an anonymous key after its first
                # column, deduping with _2, _3, ... on collision
                taken = {n for n, _ in self.catalog.unique_keys(q)}
                taken.update(n for n, _ in self.catalog.cluster_indexes(q))
                name, k = cols[0], 2
                while name in taken:
                    name, k = f"{cols[0]}_{k}", k + 1
            return self._add_unique(q, name, cols)
        m = re.match(
            r"ALTER\s+TABLE\s+([\w.`\"]+)\s+ADD\s+(?:INDEX|KEY)\s+([\w`\"]+)\s*\(([^)]+)\)\s*$",
            sql,
            re.I,
        )
        if m:
            # same path as CREATE INDEX (physical range clustering)
            return self._create_index(
                f"CREATE INDEX {m.group(2)} ON {m.group(1)} ({m.group(3)})"
            )
        m = re.match(r"ALTER\s+TABLE\s+([\w.`\"]+)\s+DROP\s+PRIMARY\s+KEY\s*$", sql, re.I)
        if m:
            return self._drop_primary_key(
                self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
            )
        m = re.match(
            r"ALTER\s+TABLE\s+([\w.`\"]+)\s+DROP\s+(?:INDEX|KEY)\s+([\w`\"]+)\s*$", sql, re.I
        )
        if m:
            return self._drop_index_named(
                self.catalog.qualify(unquote_ident(m.group(1)), self.current_db),
                unquote_ident(m.group(2)),
            )
        # display widths (INT(11), FLOAT(10,2)) accepted-and-ignored,
        # matching parse_create_table's column grammar (ADVICE r5)
        m = re.match(
            r"ALTER\s+TABLE\s+([\w.`\"]+)\s+MODIFY\s+(?:COLUMN\s+)?([\w`\"]+)\s+(\w+)"
            r"(?:\s*\(\s*(\d+)(?:\s*,\s*(\d+))?\s*\))?"
            r"(\s+NOT\s+NULL)?\s*$",
            sql,
            re.I,
        )
        if m:
            q = self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
            col = unquote_ident(m.group(2))
            return self._modify_column(
                q, col, col, m.group(3).upper(), bool(m.group(6)),
                precision=int(m.group(4)) if m.group(4) else None,
                scale=int(m.group(5)) if m.group(5) else None,
            )
        m = re.match(
            r"ALTER\s+TABLE\s+([\w.`\"]+)\s+CHANGE\s+(?:COLUMN\s+)?([\w`\"]+)\s+([\w`\"]+)"
            r"\s+(\w+)(?:\s*\(\s*(\d+)(?:\s*,\s*(\d+))?\s*\))?(\s+NOT\s+NULL)?\s*$",
            sql,
            re.I,
        )
        if m:
            q = self.catalog.qualify(unquote_ident(m.group(1)), self.current_db)
            return self._modify_column(
                q,
                unquote_ident(m.group(2)),
                unquote_ident(m.group(3)),
                m.group(4).upper(),
                bool(m.group(7)),
                precision=int(m.group(5)) if m.group(5) else None,
                scale=int(m.group(6)) if m.group(6) else None,
            )
        raise parse_error(
            "near ALTER TABLE (only ADD/DROP/MODIFY/CHANGE COLUMN, "
            "ADD/DROP INDEX|UNIQUE|PRIMARY KEY, RENAME)"
        )

    def _drop_column(self, qualified: str, col: str) -> EngineResult:
        """Parquet v1 tables can't ALTER DROP COLUMN in place → recreate
        (schema-evolved rewrite, the ALTER path the reference implements
        as meta-table surgery, /root/reference/src/execute_impl/drop_column.rs:37-131)."""
        self.catalog.require_table(qualified)
        t = self.spark.table(qualified)
        if col not in t.columns or (col == "rowid" and self.catalog.has_rowid(qualified)):
            # the hidden rowid is not a user column — not droppable
            raise EbikeError(1091, f"Can't DROP '{col}'; check that column/key exists")
        kept = t.drop(col)
        keep_props = {
            k: ",".join(c for c in v.split(",") if c != col)
            for k, v in self.catalog.properties(qualified).items()
            if k.startswith("ebike.")
        }
        # a UNIQUE/cluster key whose LAST column was dropped disappears
        # with it (MySQL drops the index; an empty key list would crash
        # the next keyed INSERT's conjunction builder)
        keep_props = {
            k: v
            for k, v in keep_props.items()
            if v or not k.startswith(("ebike.unique.", "ebike.cluster."))
        }
        self._recreate_table(qualified, kept, keep_props)
        return EngineResult("count", affected=0)

    def _recreate_table(self, qualified: str, df: DataFrame, ebike_props: dict[str, str]) -> None:
        """Stage-swap recreate for schema evolution parquet v1 can't do
        in place (type/order change, column drop): write the new shape
        to a stage table, drop, recreate with the given ebike.*
        properties, reload, drop the stage. Shared by DROP/MODIFY/
        CHANGE COLUMN."""
        db, _, _ = qualified.rpartition(".")
        import uuid as _uuid

        stage = f"{db}.__ebike_stage_{_uuid.uuid4().hex[:12]}"
        df.write.saveAsTable(stage)
        try:
            self.spark.sql(f"DROP TABLE {qualified}")
            cols_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
            props_ddl = ", ".join(f"'{k}' = '{v}'" for k, v in ebike_props.items()) or "'ebike.not_null' = ''"
            self.spark.sql(
                f"CREATE TABLE {qualified} ({cols_ddl}) USING parquet TBLPROPERTIES ({props_ddl})"
            )
            self.spark.table(stage).write.insertInto(qualified, overwrite=True)
        finally:
            self.spark.sql(f"DROP TABLE IF EXISTS {stage}")
        _bump_sys_schema_epoch()

    def _modify_column(
        self,
        qualified: str,
        old: str,
        new: str,
        sql_type: str,
        not_null: bool,
        precision: int | None = None,
        scale: int | None = None,
    ) -> EngineResult:
        """ALTER TABLE MODIFY/CHANGE COLUMN: retype (strict-mode cast —
        a non-NULL value that doesn't convert is 1366, as MySQL strict),
        optionally rename, via the stage-swap recreate. Key/cluster/
        auto-increment markers follow the rename. Divergence from
        MySQL's full-redefinition semantics, documented: attributes not
        restated in the clause (AUTO_INCREMENT, key membership) are
        PRESERVED rather than dropped; nullability follows the clause
        (absent NOT NULL → nullable, except PK columns, which stay NOT
        NULL as in MySQL)."""
        from ebike_spark.engine.catalog import (
            PROP_AUTO_INCREMENT,
            PROP_NOT_NULL,
            resolve_sql_type,
        )

        self.catalog.require_table(qualified)
        spark_t = resolve_sql_type(sql_type, precision, scale)
        t = self.spark.table(qualified)
        hidden_rowid = self.catalog.has_rowid(qualified)
        if old not in t.columns or (old == "rowid" and hidden_rowid):
            raise EbikeError(1054, f"Unknown column '{old}' in 'field list'")
        if new != old and new in t.columns:
            raise EbikeError(1060, f"Duplicate column name '{new}'")
        if self.catalog.auto_increment_col(qualified) == old and spark_t != "BIGINT":
            raise EbikeError(1063, f"Incorrect column specifier for column '{old}'")
        src = F.col(old)
        if spark_t == "BIGINT":
            # MySQL ROUNDS fractional→int; a bare cast truncates. The
            # shared helper routes through double only for fractional
            # values, so big exact integers keep full precision.
            cast = dml._rounding_bigint_cast_col(src)
        else:
            cast = src.cast(spark_t.lower())
        bad_pred = src.isNotNull() & cast.isNull()
        if spark_t == "BIGINT":
            # the non-ANSI double→long cast SATURATES at Long.Max
            # instead of nulling — out-of-range magnitudes must raise
            # 1366 here too, never silently store Long.Max (review r9)
            dbl = src.cast("double")
            bad_pred = bad_pred | (
                dbl.isNotNull() & (F.abs(dbl) > F.expr(dml._LONG_MAX_D))
            )
        bad = t.where(bad_pred).count()
        if bad:
            raise EbikeError(
                1366, f"Incorrect {sql_type.lower()} value for column '{old}' ({bad} rows)"
            )
        if not_null and t.where(src.isNull()).count():
            raise EbikeError(1138, f"Invalid use of NULL value for column '{old}'")
        new_df = t.select(
            *[cast.alias(new) if c == old else F.col(c) for c in t.columns]
        )
        pk_cols = self.catalog.primary_key(qualified)

        def ren(v: str) -> str:
            return ",".join(new if c == old else c for c in v.split(","))

        props = {
            k: ren(v)
            for k, v in self.catalog.properties(qualified).items()
            if k.startswith("ebike.")
        }
        nn = [c for c in props.get(PROP_NOT_NULL, "").split(",") if c]
        if not_null:
            if new not in nn:
                nn.append(new)
        elif old not in pk_cols:
            nn = [c for c in nn if c != new]
        props[PROP_NOT_NULL] = ",".join(nn)
        self._recreate_table(qualified, new_df, props)
        return EngineResult("count", affected=0)

    # ------------------------------------------------------------ DML

    def _insert(self, sql: str) -> EngineResult:
        fixed = self._fix_dml_scalars(
            substitute_vars(sql, self.sys_vars, self.user_vars, GLOBAL_VARS)
        )
        # MySQL `INSERT INTO t SET a = 1, b = 'x'` → column-list VALUES
        m = re.match(
            r"\s*(INSERT(?:\s+IGNORE)?|REPLACE)\s+INTO\s+([\w.`\"]+)\s+SET\s+([\s\S]+?)"
            r"(\s+ON\s+DUPLICATE\s+KEY\s+UPDATE\s+[\s\S]+?)?;?\s*$",
            fixed,
            re.I,
        )
        if m:
            from ebike_spark.engine.parser import split_top_level

            cols, vals = [], []
            for a in split_top_level(m.group(3)):
                am = re.match(r"\s*([\w`\"]+)\s*=\s*([\s\S]+)$", a)
                if not am:
                    raise parse_error(f"near INSERT ... SET: {a!r}")
                cols.append(unquote_ident(am.group(1)))
                vals.append(am.group(2).strip())
            fixed = (
                f"{m.group(1)} INTO {m.group(2)} ({', '.join(cols)}) "
                f"VALUES ({', '.join(vals)}){m.group(4) or ''}"
            )
        # INSERT [IGNORE] INTO ... SELECT / REPLACE INTO ... SELECT:
        # build the casted source frame and route it through the SAME
        # set-oriented constraint / duplicate handling as the VALUES
        # path (beyond-reference — the reference only implements
        # VALUES, insert.rs:48-224 — and a round-7 upgrade over the
        # earlier raw passthrough, which enforced no PK/UNIQUE/NOT NULL
        # on SELECT sources). All checks are joins/aggregates, so they
        # scale to any source volume. Detected STRUCTURALLY (SELECT
        # right after the table/column list) — a bare \bVALUES\b probe
        # would misroute `... SELECT ... ON DUPLICATE KEY UPDATE
        # v = VALUES(v)` into the VALUES-clause parser.
        m = re.match(
            r"\s*(?:INSERT(\s+IGNORE)?|(REPLACE))\s+INTO\s+([\w.`\"]+)\s*"
            r"(?:\(([^)]*)\)\s*)?(SELECT\b[\s\S]*)$",
            fixed,
            re.I,
        )
        if m:
            self.spark.catalog.setCurrentDatabase(self.current_db)
            q = self.catalog.qualify(unquote_ident(m.group(3)), self.current_db)
            if self.catalog.table_exists(q):
                return self._insert_from_select(
                    q,
                    col_list=m.group(4),
                    select_sql=m.group(5),
                    ignore=bool(m.group(1)),
                    replace=bool(m.group(2)),
                )
        if not re.search(r"\bVALUES\b", fixed, re.I):
            # remaining non-VALUES forms (e.g. INSERT INTO ... TABLE
            # src) pass through to Spark untouched
            self.spark.catalog.setCurrentDatabase(self.current_db)
            self.spark.sql(fixed)
            return EngineResult("count", affected=-1)
        try:
            ins = parse_insert(fixed)
        except ValueError as e:
            raise parse_error(str(e)) from e
        state: dict = {}
        n = dml.insert(self.spark, self.catalog, ins, self.current_db, session=state)
        if "last_insert_id" in state:
            self.last_insert_id = state["last_insert_id"]
        return EngineResult("count", affected=n)

    def _insert_from_select(
        self,
        qualified: str,
        col_list: str | None,
        select_sql: str,
        ignore: bool,
        replace: bool,
    ) -> EngineResult:
        """INSERT [IGNORE] / REPLACE ... SELECT: cast the source frame
        to the target's declared types (listed or all columns
        positionally, unlisted columns NULL), mint AUTO_INCREMENT and
        hidden rowids, and hand off to the same dml helpers the VALUES
        path uses — so PK/UNIQUE/NOT NULL, duplicate accounting, and
        REPLACE/IGNORE semantics are identical whatever the row
        source. Every check is a join/aggregate (no driver-side row
        loop), so a 10⁸-row SELECT source costs the same plan shape as
        a 3-row one."""
        import pyspark.sql.functions as F

        from ebike_spark.engine import dml as _dml
        from ebike_spark.engine.parser import split_tail_clauses, split_top_level

        # INSERT ... SELECT ... ON DUPLICATE KEY UPDATE: the upsert
        # clause rides after the SELECT; split it off top-level
        # (quote/paren-aware — an ON inside the SELECT's joins never
        # matches the full four-word phrase)
        try:
            select_sql, tail_clauses = split_tail_clauses(
                select_sql, ("ON DUPLICATE KEY UPDATE",)
            )
        except ValueError as e:
            raise parse_error(str(e)) from e
        on_dup: list[tuple[str, str]] | None = None
        if "ON DUPLICATE KEY UPDATE" in tail_clauses:
            if ignore or replace:
                raise parse_error(
                    "ON DUPLICATE KEY UPDATE cannot combine with IGNORE/REPLACE"
                )
            on_dup = []
            for a in split_top_level(tail_clauses["ON DUPLICATE KEY UPDATE"]):
                am = re.match(r"\s*([\w`\"]+)\s*=\s*([\s\S]+)$", a)
                if not am:
                    raise parse_error(f"near ON DUPLICATE KEY UPDATE: {a!r}")
                on_dup.append((unquote_ident(am.group(1)), am.group(2).strip()))

        # hidden rowids of SOURCE tables never travel (SELECT * from a
        # rowid table must behave as if the column didn't exist)
        src = self._drop_hidden_rowid(
            self.spark.sql(self._fix_select(select_sql, datetime_fns=False))
        )
        cols = self.catalog.column_types(qualified)
        types = dict(cols)
        listed = (
            [unquote_ident(c) for c in split_top_level(col_list)]
            if col_list
            else [n for n, _ in cols]
        )
        unknown = [c for c in listed if c not in types]
        if unknown:
            raise EbikeError(1054, f"Unknown column '{unknown[0]}' in 'field list'")
        if len(src.columns) != len(listed):
            raise EbikeError(1136, "Column count doesn't match value count")
        pos = {c: i for i, c in enumerate(listed)}
        # source columns go through the same strict+rounding cast as
        # the VALUES path (1366 on unconvertible values, MySQL integer
        # rounding); unlisted target columns are typed NULLs
        df = src.select(
            *[
                (
                    _dml.guarded_cast_col(src[src.columns[pos[n]]], t, n)
                    if n in pos
                    else F.lit(None).cast(t)
                ).alias(n)
                for n, t in cols
            ]
        )
        ai = self.catalog.auto_increment_col(qualified)
        if ai is not None:
            df, first_id = _dml._mint_auto_increment(
                self.spark, qualified, df, ai, types[ai]
            )
            if first_id is not None:
                self.last_insert_id = first_id
        class _LazyRows:
            """len() = source row count, computed only if a dml helper
            actually reads it — _upsert consults len(rows) solely on
            its no-unique-key fallback, so the common keyed upsert
            never pays an extra pass over the SELECT source."""

            _n: int | None = None

            def __len__(self) -> int:
                if self._n is None:
                    self._n = df.count()
                return self._n

        if on_dup is not None:

            class _UShim:  # _upsert reads on_dup_update + len(rows)
                rows = _LazyRows()
                on_dup_update = on_dup

            n = _dml._upsert(self.spark, self.catalog, qualified, df, _UShim())
            return EngineResult("count", affected=n)
        if replace:

            class _Shim:  # _replace reads only len(ins.rows)
                rows = _LazyRows()

            n = _dml._replace(self.spark, self.catalog, qualified, df, _Shim())
            return EngineResult("count", affected=n)
        if ignore:
            n = _dml._insert_ignore(self.spark, self.catalog, qualified, df)
            return EngineResult("count", affected=n)
        _dml._check_constraints(self.spark, self.catalog, qualified, df)
        # affected-rows counts the pre-rowid frame (column-pruned pass)
        n_src = df.count()
        if self.catalog.has_rowid(qualified):
            df = df.withColumn(_dml.ROWID, F.expr("uuid()")).select(
                *self.spark.table(qualified).columns
            )
        df.write.insertInto(qualified, overwrite=False)
        return EngineResult("count", affected=n_src)

    # FROM-clause keywords that can precede an alias token without
    # being the aliased table (multi-table DML alias resolution)
    _JOIN_KEYWORDS = {
        "JOIN", "ON", "AND", "OR", "INNER", "LEFT", "RIGHT", "CROSS",
        "OUTER", "STRAIGHT_JOIN", "USING", "WHERE", "NATURAL", "AS",
    }

    def _from_aliases(self, frm: str) -> list[tuple[str, str]]:
        """Enumerate (alias-or-name token, qualified table) for every
        table in a multi-table-DML FROM clause. Segments split on
        top-level JOIN keywords (quote/paren-aware); each segment's
        leading token is the table, the next word its alias unless it
        is a clause keyword."""
        from ebike_spark.engine.parser import (
            find_top_level_keywords,
            split_top_level,
        )

        spans = find_top_level_keywords(frm, ("JOIN",))
        segs, prev = [], 0
        for _, s0, s1 in spans:
            segs.append(frm[prev:s0])
            prev = s1
        segs.append(frm[prev:])
        # MySQL's comma form mixes freely with JOINs (`t1 a, t2 b JOIN
        # t3 c ON ...`): each JOIN segment may itself list several
        # comma-separated table factors
        segs = [part for seg in segs for part in split_top_level(seg, ",")]
        out: list[tuple[str, str]] = []
        for seg in segs:
            m = re.match(r"\s*([\w.`\"]+)(?:\s+(?:AS\s+)?([\w`\"]+))?", seg)
            if not m:
                continue
            tbl = unquote_ident(m.group(1))
            if tbl.upper() in self._JOIN_KEYWORDS:
                continue
            alias = unquote_ident(m.group(2)) if m.group(2) else None
            if alias and alias.upper() in self._JOIN_KEYWORDS:
                alias = None
            out.append((alias or tbl, self.catalog.qualify(tbl, self.current_db)))
        return out

    def _resolve_alias_table(self, tgt: str, frm: str) -> str:
        """Resolve a multi-table-DML target token (alias or table name)
        to its underlying table within a FROM clause."""
        m = re.search(
            rf"([\w.`\"]+)\s+(?:AS\s+)?{re.escape(tgt)}\b", frm, re.I
        )
        if m and unquote_ident(m.group(1)).upper() not in self._JOIN_KEYWORDS:
            return unquote_ident(m.group(1))
        return tgt

    def _update(self, sql: str) -> EngineResult:
        fixed = self._fix_dml_scalars(
            substitute_vars(sql, self.sys_vars, self.user_vars, GLOBAL_VARS)
        )
        # Multi-table form detection must be quote/paren-aware: a SET /
        # JOIN / WHERE inside a string literal or subquery must not
        # split the statement (find_top_level_keywords skips both).
        from ebike_spark.engine.parser import (
            find_top_level_keywords,
            split_tail_clauses,
            split_top_level,
        )

        body_m = re.match(r"\s*UPDATE\s+([\s\S]+?)\s*;?\s*$", fixed, re.I)
        if body_m:
            body = body_m.group(1)
            set_spans = find_top_level_keywords(body, ("SET",))
            if set_spans:
                frm = body[: set_spans[0][1]].strip()
                # JOIN form or MySQL's comma form (`UPDATE t1, t2 SET
                # ...`) — both are the multi-table statement
                if find_top_level_keywords(frm, ("JOIN",)) or len(
                    split_top_level(frm, ",")
                ) > 1:
                    tail = body[set_spans[0][2] :]
                    try:
                        set_clause, clauses = split_tail_clauses(tail, ("WHERE",))
                    except ValueError as e:
                        raise parse_error(str(e)) from e
                    return self._update_join(
                        frm, set_clause, clauses.get("WHERE")
                    )
        try:
            upd = parse_update(fixed)
        except ValueError as e:
            raise parse_error(str(e)) from e
        n = dml.update(self.spark, self.catalog, upd, self.current_db)
        return EngineResult("count", affected=n)

    def _update_join(self, frm: str, set_clause: str, where: str | None) -> EngineResult:
        """Multi-table UPDATE (MySQL `UPDATE t1 JOIN t2 ON ... SET
        t1.c = <expr over both>, t2.d = ... [WHERE ...]`): the
        assignments may read the joined tables' columns — the classic
        enrich-in-place statement — and may target SEVERAL of the
        joined tables in one statement (MySQL parity). No ORDER BY /
        LIMIT (MySQL also disallows them in the multi-table form).

        Set-oriented plan: ONE join computes (rowid, new values) for
        every matched row of every assigned table against the shared
        PRE-image; the frame is snapshotted via localCheckpoint so
        rewriting the first target cannot leak its post-image into the
        second target's values — MySQL processes rows one at a time and later
        rows CAN observe earlier in-statement writes, an
        order-dependent behavior with no deterministic set-oriented
        equivalent; this engine pins snapshot semantics (every
        assignment sees the statement's start state), the same
        divergence documented for single-table UPDATE self-references.
        A row matched more than once keeps the smallest new-value
        tuple (MySQL's result there is processing-order-dependent —
        this pins a deterministic representative); the same table
        assigned through TWO aliases merges into one post-image
        (last assignment in statement order wins per column where
        both aliases match — see the grouping comment below); each
        post-image lands via the same staged rewrite, changed-row
        accounting, and key re-check as the single-table path. No
        driver-side row loop at any join size."""
        from functools import reduce
        from operator import or_ as _or

        from pyspark.sql import Window

        from ebike_spark.engine.parser import split_top_level

        assigns: list[tuple[str | None, str, str]] = []  # (alias, col, rhs)
        for a in split_top_level(set_clause):
            am = re.match(
                r"\s*(?:([\w`\"]+)\s*\.\s*)?([\w`\"]+)\s*=\s*([\s\S]+)$", a
            )
            if not am:
                raise parse_error(f"near UPDATE ... SET: {a!r}")
            assigns.append(
                (
                    unquote_ident(am.group(1)) if am.group(1) else None,
                    unquote_ident(am.group(2)),
                    am.group(3).strip(),
                )
            )
        # Unqualified assignments resolve the MySQL way: the column is
        # looked up in EVERY joined table — exactly one owner targets
        # that table (even one never otherwise assigned); several
        # owners is 1052 ambiguous; none is 1054. No guessing from
        # which aliases happen to be assigned.
        from_tables = self._from_aliases(frm)
        col_owner_cache: dict[str, list[tuple[str, str]]] = {}

        def owners_of(col: str) -> list[tuple[str, str]]:
            if col not in col_owner_cache:
                found = []
                for alias, qtbl in from_tables:
                    try:
                        cols_of = dict(self.catalog.column_types(qtbl))
                    except EbikeError:
                        continue
                    if col in cols_of:
                        found.append((alias, qtbl))
                col_owner_cache[col] = found
            return col_owner_cache[col]

        # group assignments by target alias, preserving statement order
        by_tgt: dict[str, list[tuple[int, str, str]]] = {}
        for i, (alias, col, rhs) in enumerate(assigns):
            if alias is None:
                owners = owners_of(col)
                if len(owners) > 1:
                    raise EbikeError(
                        1052, f"Column '{col}' in field list is ambiguous"
                    )
                if not owners:
                    raise EbikeError(
                        1054, f"Unknown column '{col}' in 'field list'"
                    )
                alias = owners[0][0]
            by_tgt.setdefault(alias, []).append((i, col, rhs))
        targets: list[dict] = []
        for tgt, items in by_tgt.items():
            base = self._resolve_alias_table(tgt, frm)
            qualified = self.catalog.qualify(base, self.current_db)
            self.catalog.require_table(qualified)
            if not self.catalog.has_rowid(qualified):
                raise unsupported(
                    "multi-table UPDATE on a table without the hidden rowid"
                )
            types = dict(self.catalog.column_types(qualified))
            for _, col, _ in items:
                if col not in types:
                    raise EbikeError(
                        1054, f"Unknown column '{col}' in 'field list'"
                    )
            targets.append(
                {"tgt": tgt, "qualified": qualified, "types": types, "items": items}
            )
        self.spark.catalog.setCurrentDatabase(self.current_db)
        rid_exprs = ", ".join(
            f"{bq(t['tgt'])}.`{dml.ROWID}` AS __rid{k}"
            for k, t in enumerate(targets)
        )
        val_exprs = ", ".join(
            f"({rhs}) AS __v{i}"
            for t in targets
            for i, _, rhs in t["items"]
        )
        sel = (
            f"SELECT {rid_exprs}, {val_exprs} FROM {frm}"
            + (f" WHERE {where}" if where else "")
        )
        src = self.spark.sql(self._fix_select(sel, datetime_fns=False))
        if len(targets) > 1:
            # snapshot the pre-image join BEFORE any table rewrites.
            # localCheckpoint (eager), not persist(): rewriting the
            # first target refreshes its table, and Spark invalidates
            # every CACHED plan that reads a refreshed table — a
            # persisted frame would silently recompute the second
            # target's values from the first target's POST-image.
            # Checkpointing cuts the lineage entirely, so the snapshot
            # cannot be recomputed from anything. Bounded by matched
            # rows x assigned columns, spread across executor storage.
            src = src.localCheckpoint(eager=True)
        total = 0
        # Aliases of the SAME physical table merge into ONE staged
        # post-image: MySQL permits `UPDATE t a JOIN t b ... SET
        # a.x=..., b.y=...` but its row-level outcome is processing-
        # order-dependent; this engine pins a deterministic rule —
        # every assignment sees the statement-start snapshot, and when
        # a row is reached through several aliases (or several matches
        # of one alias), the LAST assignment in statement order whose
        # alias matched wins per column (the per-alias tie already
        # picks the smallest value tuple). Last-wins matches the
        # single-alias behavior this code always had for repeated
        # `SET c = ..., c = ...` on one alias.
        groups: list[tuple[str, list[tuple[int, dict]]]] = []
        gindex: dict[str, int] = {}
        for k, t in enumerate(targets):
            if t["qualified"] not in gindex:
                gindex[t["qualified"]] = len(groups)
                groups.append((t["qualified"], []))
            groups[gindex[t["qualified"]]][1].append((k, t))
        staged = []  # (qualified, new_df) per PHYSICAL table
        for qualified, members in groups:
            tb = self.spark.table(qualified)
            types = members[0][1]["types"]
            joined = tb
            for k, t in members:
                idxs = [i for i, _, _ in t["items"]]
                w = Window.partitionBy(f"__rid{k}").orderBy(
                    *[F.col(f"__v{i}") for i in idxs]
                )
                vals = (
                    src.where(F.col(f"__rid{k}").isNotNull())
                    .withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1)
                    .select(f"__rid{k}", *[f"__v{i}" for i in idxs])
                )
                joined = joined.join(
                    vals, tb[dml.ROWID] == vals[f"__rid{k}"], "left"
                )
            # per-column candidates in statement order; the guard
            # (1366) fires only where that alias matched — __v is NULL
            # on unmatched rows, exactly like the single-table path
            candidates: dict[str, list[tuple] ] = {}
            for i, col, k in sorted(
                (i, col, k) for k, t in members for i, col, _ in t["items"]
            ):
                candidates.setdefault(col, []).append(
                    (
                        F.col(f"__rid{k}").isNotNull(),
                        dml.guarded_cast_col(
                            F.col(f"__v{i}"), types[col], col
                        ),
                    )
                )
            new_vals = {}
            for col, cands in candidates.items():
                expr = None
                for cond, val in reversed(cands):  # last in statement wins
                    expr = (
                        F.when(cond, val)
                        if expr is None
                        else expr.when(cond, val)
                    )
                new_vals[col] = expr.otherwise(F.col(col))
            changed = reduce(
                _or,
                [~new_vals[c].eqNullSafe(F.col(c)) for c in new_vals],
            )
            affected = joined.where(changed).count()
            if affected == 0:
                continue
            total += affected
            out_cols = [
                new_vals[name].alias(name)
                if name in new_vals
                else tb[name].alias(name)
                for name in tb.columns
            ]
            new_df = joined.select(*out_cols)
            dml.recheck_keys_after_update(
                self.spark, self.catalog, qualified, new_df, set(new_vals)
            )
            staged.append((qualified, new_df))
        # All key re-checks passed against pre-images. Two-phase land:
        # STAGE every post-image first (the data-sized writes — every
        # pre-image read completes before anything commits), then swap
        # each target from its durable stage. Residual window: a crash
        # BETWEEN swaps leaves earlier targets committed — the
        # cross-table analogue of the documented single-table
        # stage-swap window (a parquet engine has no multi-table
        # transaction to close it); the stages being durable tables
        # means no snapshot recompute is ever needed to finish a swap.
        staged_tables: list[tuple[str, str]] = []
        try:
            for qualified, new_df in staged:
                staged_tables.append(
                    (qualified, dml._stage(self.spark, qualified, new_df))
                )
            for qualified, stage in staged_tables:
                dml._swap(self.spark, qualified, stage)
        finally:
            for _, stage in staged_tables:
                dml._drop_stage(self.spark, stage)
        return EngineResult("count", affected=total)

    def _delete(self, sql: str) -> EngineResult:
        fixed = self._fix_dml_scalars(
            substitute_vars(sql, self.sys_vars, self.user_vars, GLOBAL_VARS)
        )
        m = re.match(
            r"\s*DELETE\s+(?:FROM\s+)?([\w`\"]+)(?:\.\*)?\s+(?:FROM|USING)\s+"
            r"([\s\S]+?)\s*;?\s*$",
            fixed,
            re.I,
        )
        if m:
            # the WHERE tail splits quote/paren-aware (a literal
            # containing ' WHERE ' in the ON clause must not split)
            from ebike_spark.engine.parser import split_tail_clauses

            try:
                frm, clauses = split_tail_clauses(m.group(2), ("WHERE",))
            except ValueError as e:
                raise parse_error(str(e)) from e
            return self._delete_join(m.group(1), frm, clauses.get("WHERE"))
        try:
            dele = parse_delete(fixed)
        except ValueError as e:
            raise parse_error(str(e)) from e
        n = dml.delete(self.spark, self.catalog, dele, self.current_db)
        return EngineResult("count", affected=n)

    def _delete_join(self, tgt_tok: str, frm: str, where: str | None) -> EngineResult:
        """Multi-table DELETE (MySQL `DELETE t1 FROM t1 JOIN t2 ON ...
        [WHERE ...]` and the `DELETE FROM t1 USING ...` spelling): remove
        the target's rows that participate in the join — the classic
        purge-by-reference statement.

        Set-oriented plan: one join projects the DISTINCT doomed hidden
        rowids, then one anti-join rewrites the target — two shuffles
        at any size, no row loop. Affected-rows = distinct target rows
        matched, exactly MySQL's accounting (a row matched by several
        join partners still deletes once)."""
        tgt = unquote_ident(tgt_tok)
        base = self._resolve_alias_table(tgt, frm)
        qualified = self.catalog.qualify(base, self.current_db)
        self.catalog.require_table(qualified)
        if not self.catalog.has_rowid(qualified):
            raise unsupported(
                "multi-table DELETE on a table without the hidden rowid"
            )
        self.spark.catalog.setCurrentDatabase(self.current_db)
        sel = f"SELECT {bq(tgt)}.`{dml.ROWID}` AS __del_rid FROM {frm}" + (
            f" WHERE {where}" if where else ""
        )
        doomed = self.spark.sql(
            self._fix_select(sel, datetime_fns=False)
        ).distinct()
        affected = doomed.count()
        if affected == 0:
            return EngineResult("count", affected=0)
        t = self.spark.table(qualified)
        dml._rewrite(
            self.spark,
            qualified,
            t.join(doomed, t[dml.ROWID] == doomed["__del_rid"], "left_anti"),
        )
        return EngineResult("count", affected=affected)

    # ------------------------------------------------------------ UDFs

    def register_function(self, name: str, fn, return_type: str = "string") -> None:
        """Register a scalar Python UDF callable from this session's SQL
        (the reference registers exactly one UDF this way — database(),
        /root/reference/src/core/execution.rs:133-155; this exposes the
        same create_udf-style surface to users). Row-at-a-time Python:
        fine for scalar helpers, never for the hot path — use
        mapInPandas/pandas_udf there (see operators/multimodal.py)."""
        self.spark.udf.register(name, fn, return_type)

    # ------------------------------------------------------------ prepared

    def prepare(self, sql: str) -> int:
        """COM_STMT_PREPARE analogue (execution.rs:866-880): parse-count
        '?' placeholders outside quotes, cache, return handle."""
        clean = strip_comments(sql)
        n = 0
        i = 0
        while i < len(clean):
            if clean[i] in "'\"`":
                from ebike_spark.engine.parser import _skip_quoted

                i = _skip_quoted(clean, i)
                continue
            if clean[i] == "?":
                n += 1
            i += 1
        sid = self._next_stmt_id
        self._next_stmt_id += 1
        self._stmts[sid] = _Prepared(sql=clean, n_params=n)
        return sid

    def execute_prepared(self, stmt_id: int, params: list[object] | None = None) -> EngineResult:
        """COM_STMT_EXECUTE analogue: splice literal params into the
        cached text (the reference splices decoded binary params into the
        cached AST, core_util.rs:32-107) and run the normal dispatch."""
        st = self._stmts.get(stmt_id)
        if st is None:
            raise EbikeError(1243, f"Unknown prepared statement handler ({stmt_id})")
        params = params or []
        if len(params) != st.n_params:
            raise EbikeError(1210, "Incorrect arguments to EXECUTE")
        return self.execute(self._splice_placeholders(st.sql, params))

    @staticmethod
    def _splice_placeholders(sql: str, params: list[object]) -> str:
        """Replace each '?' outside quotes with the next param as a SQL
        literal (the reference splices decoded binary params into the
        cached AST, core_util.rs:32-107)."""
        out: list[str] = []
        it = iter(params)
        i = 0
        while i < len(sql):
            if sql[i] in "'\"`":
                from ebike_spark.engine.parser import _skip_quoted

                j = _skip_quoted(sql, i)
                out.append(sql[i:j])
                i = j
                continue
            if sql[i] == "?":
                out.append(sql_literal(next(it)))
            else:
                out.append(sql[i])
            i += 1
        return "".join(out)

    def prepared_result_schema(self, stmt_id: int) -> list[tuple[str, str]] | None:
        """Result-set column metadata at PREPARE time. The wire server's
        COM_STMT_PREPARE response advertises num_columns + column defs
        (the reference returns real metadata, handle.rs:221-233, and
        connectors call mysql_stmt_result_metadata / JDBC getMetaData
        BEFORE any execute). Each '?' splices as NULL and the statement
        runs through the normal dispatch — for the SELECT family that
        is ANALYSIS ONLY (the returned DataFrame is lazy; no job runs).
        Returns None for statements that produce no resultset (DML/DDL)
        and for the rare parameterized shape NULL-splicing cannot
        analyze (e.g. LIMIT ?), where the caller falls back to
        advertising zero columns."""
        st = self._stmts.get(stmt_id)
        if st is None:
            raise EbikeError(1243, f"Unknown prepared statement handler ({stmt_id})")
        kw = st.sql.split(None, 1)[0].upper() if st.sql.split() else ""
        if kw not in ("SELECT", "WITH", "VALUES", "TABLE"):
            return None
        if kw == "WITH":
            # Spark supports CTE-prefixed DML (WITH v AS (...) INSERT
            # INTO ...), and spark.sql() runs commands EAGERLY — a
            # dispatch here would mutate data at PREPARE time. Only a
            # pure query may be analyzed; DML FORMS at the TOP level
            # (quote/paren-aware — CTE bodies live inside parens, so
            # their SELECTs never match) disqualify the statement.
            # Matching full forms, not bare words: REPLACE(...) and
            # INSERT(...) are string FUNCTIONS that legitimately appear
            # at depth 0 in a SELECT list, and a bare-word match would
            # wrongly advertise num_columns=0 for such pure queries.
            # The forms listed are exactly the CTE-DML heads Spark SQL
            # parses (MySQL-only spellings like INSERT IGNORE never
            # reach spark.sql as CTE-DML — they fail its parser).
            from ebike_spark.engine.parser import find_top_level_keywords

            if find_top_level_keywords(
                st.sql,
                (
                    "INSERT INTO",
                    "INSERT OVERWRITE",
                    "UPDATE",
                    "DELETE FROM",
                    "MERGE INTO",
                    "REPLACE INTO",
                ),
            ):
                return None
        try:
            res = self.execute(
                self._splice_placeholders(st.sql, [None] * st.n_params)
            )
        except Exception:
            return None
        if res.kind != "rows" or res.df is None:
            return None
        return [(f.name, f.dataType.simpleString()) for f in res.df.schema.fields]

    def close_prepared(self, stmt_id: int) -> None:
        self._stmts.pop(stmt_id, None)  # COM_STMT_CLOSE (execution.rs:790-795)

    def prepared_param_count(self, stmt_id: int) -> int:
        """Placeholder count of a prepared statement (the wire server's
        COM_STMT_PREPARE response needs it; public so the server never
        reaches into _stmts)."""
        st = self._stmts.get(stmt_id)
        if st is None:
            raise EbikeError(1243, f"Unknown prepared statement handler ({stmt_id})")
        return st.n_params
