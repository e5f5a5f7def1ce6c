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

from pyspark.sql import DataFrame, SparkSession

from ebike_spark.engine import dml, show
from ebike_spark.engine.catalog import Catalog
from ebike_spark.engine.errors import EbikeError, parse_error, unsupported
from ebike_spark.engine.parser import (
    map_unquoted,
    rewrite_group_concat,
    strip_comments,
    substitute_vars,
    unquote_ident,
)

# Shared session/global state + result types moved to session_state.py
# (r10 split); re-exported here so existing imports keep working.
from ebike_spark.engine.ddl_exec import DdlExecMixin
from ebike_spark.engine.dml_exec import DmlExecMixin
from ebike_spark.engine.prepared import PreparedMixin
from ebike_spark.engine.session_state import (  # noqa: F401
    DEFAULT_SYS_VARS,
    GLOBAL_VARS,
    READ_ONLY_SYS_VARS,
    _SYS_PIN_CAP,
    _SYS_SCHEMA_EPOCH,
    _SYS_SCHEMA_LOCK,
    _SYS_VARS_BUILDER,
    _SYS_VARS_TABLE,
    _ENGINE_SERIAL,
    EngineResult,
    _Prepared,
    _bump_sys_schema_epoch,
)



class Engine(DdlExecMixin, DmlExecMixin, PreparedMixin):
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
        # SHOW PROCESSLIST rows, if something owns the connection view
        # (the wire server wires its registry in; None = bare engine)
        self.processlist_provider = None
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
            return rows(
                show.show_processlist(
                    spark, self.current_db, self.processlist_provider
                )
            )
        if up.startswith("GRANTS"):
            return rows(show.show_grants(spark))
        if up.startswith("PRIVILEGES"):
            return rows(show.show_privileges(spark))
        raise unsupported(f"SHOW {body}")

    # ------------------------------------------------------------ DDL

    def register_function(self, name: str, fn, return_type: str = "string") -> None:
        """Register a scalar Python UDF callable from this session's SQL
        (the reference registers exactly one UDF this way — database(),
        /root/reference/src/core/execution.rs:133-155; this exposes the
        same create_udf-style surface to users). Row-at-a-time Python:
        fine for scalar helpers, never for the hot path — use
        mapInPandas/pandas_udf there (see operators/multimodal.py)."""
        self.spark.udf.register(name, fn, return_type)

    # ------------------------------------------------------------ prepared

