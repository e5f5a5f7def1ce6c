"""SHOW-command emulation (MySQL-shaped result sets).

The reference implements eleven SHOW statements as SELECTs against its
persisted information_schema or synthesized constant batches
(/root/reference/src/core/execution.rs:1098-1264,
/root/reference/src/execute_impl/show_*.rs). Here each one is a small
DataFrame constructor reading Spark's catalog — driver-side metadata,
no cluster work.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ebike_spark.engine.catalog import SQL_TYPE_NAME, Catalog


def _like_to_regex(pat: str) -> str:
    return "^" + re.escape(pat).replace("%", ".*").replace("_", ".") + "$"


def show_databases(spark: SparkSession) -> DataFrame:
    dbs = sorted(d.name for d in spark.catalog.listDatabases())
    return spark.createDataFrame([(d,) for d in dbs], "Database string")


def show_tables(spark: SparkSession, db: str) -> DataFrame:
    names = sorted(
        t.name
        for t in spark.catalog.listTables(db)
        if t.tableType != "TEMPORARY" and not t.name.startswith("__ebike_stage")
    )
    return spark.createDataFrame([(n,) for n in names], f"`Tables_in_{db}` string")


def show_columns(spark: SparkSession, catalog: Catalog, qualified: str) -> DataFrame:
    catalog.require_table(qualified)
    nn = set(catalog.not_null_cols(qualified))
    pk = set(catalog.primary_key(qualified))
    uniq = {c for _, cols in catalog.unique_keys(qualified) for c in cols}
    ai = catalog.auto_increment_col(qualified)
    rows = []
    for name, typ in catalog.column_types(qualified):
        key = "PRI" if name in pk else ("UNI" if name in uniq else "")
        extra = "auto_increment" if name == ai else ""
        rows.append((name, SQL_TYPE_NAME.get(typ, typ), "NO" if name in nn else "YES", key, None, extra))
    return spark.createDataFrame(
        rows, "Field string, Type string, Null string, Key string, Default string, Extra string"
    )


def show_create_table(spark: SparkSession, catalog: Catalog, qualified: str) -> DataFrame:
    ddl = catalog.show_create_table(qualified)
    _, _, name = qualified.rpartition(".")
    return spark.createDataFrame([(name, ddl)], "Table string, `Create Table` string")


def show_variables(spark: SparkSession, sys_vars: dict[str, object], like: str | None) -> DataFrame:
    items = sorted(sys_vars.items())
    if like:
        rx = re.compile(_like_to_regex(like), re.I)
        items = [(k, v) for k, v in items if rx.match(k)]
    return spark.createDataFrame(
        [(k, str(v)) for k, v in items] or [("", "")],
        "Variable_name string, Value string",
    )


def show_engines(spark: SparkSession) -> DataFrame:
    rows = [("parquet", "DEFAULT", "Columnar parquet tables planned by Catalyst", "NO", "NO", "NO")]
    return spark.createDataFrame(
        rows,
        "Engine string, Support string, Comment string, Transactions string, XA string, Savepoints string",
    )


def show_charset(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("utf8mb4", "UTF-8 Unicode", "utf8mb4_0900_ai_ci", 4)],
        "Charset string, Description string, `Default collation` string, Maxlen long",
    )


def show_collation(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("utf8mb4_0900_ai_ci", "utf8mb4", 255, "Yes", "Yes", 0)],
        "Collation string, Charset string, Id long, Default string, Compiled string, Sortlen long",
    )


def show_table_status(spark: SparkSession, catalog: Catalog, db: str) -> DataFrame:
    rows = []
    for t in spark.catalog.listTables(db):
        if t.tableType == "TEMPORARY" or t.name.startswith("__ebike_stage"):
            continue
        n = spark.table(f"{db}.{t.name}").count()
        rows.append((t.name, "parquet", n, "utf8mb4_0900_ai_ci"))
    return spark.createDataFrame(
        rows or [("", "", 0, "")],
        "Name string, Engine string, Rows long, Collation string",
    )


def show_index(spark: SparkSession, catalog: Catalog, qualified: str) -> DataFrame:
    """SHOW INDEX FROM t — MySQL-shaped rows over the declared
    PRIMARY/UNIQUE keys (the reference serves these from its persisted
    information_schema.statistics)."""
    catalog.require_table(qualified)
    _, _, tname = qualified.rpartition(".")
    rows = []
    keys = []
    pk = catalog.primary_key(qualified)
    if pk:
        keys.append(("PRIMARY", pk))
    keys.extend(catalog.unique_keys(qualified))
    for kname, cols in keys:
        for seq, c in enumerate(cols, start=1):
            rows.append((tname, 0, kname, seq, c, "BTREE"))
    # secondary indexes = physical range clustering (zone-map pruning);
    # advertised with their real mechanism, not a fake BTREE
    for kname, cols in catalog.cluster_indexes(qualified):
        for seq, c in enumerate(cols, start=1):
            rows.append((tname, 1, kname, seq, c, "CLUSTERED"))
    return spark.createDataFrame(
        rows or [("", 0, "", 0, "", "")],
        "Table string, Non_unique long, Key_name string, Seq_in_index long, "
        "Column_name string, Index_type string",
    )


def show_processlist(
    spark: SparkSession, current_db: str, provider=None
) -> DataFrame:
    """Live wire connections when a ``provider`` is wired in (the
    server installs one backed by its connection registry, so the Ids
    shown here are the SAME ids COM_PROCESS_KILL addresses — r11
    review); a bare Engine with no server shows its single session."""
    if provider is None:
        # no server wired in: a bare Engine IS the single session
        rows = [
            (
                1,
                "root",
                "localhost",
                current_db,
                "Query",
                0,
                "executing",
                "SHOW PROCESSLIST",
            )
        ]
    else:
        # an EMPTY provider result renders an empty processlist — a
        # fabricated Id=1 here could shadow/collide with the real
        # connection ids COM_PROCESS_KILL addresses (ADVICE-r11)
        rows = list(provider())
    return spark.createDataFrame(
        rows,
        "Id long, User string, Host string, db string, Command string, "
        "Time long, State string, Info string",
    )


def show_grants(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("GRANT ALL PRIVILEGES ON *.* TO 'root'@'%'",)],
        "`Grants for root@%` string",
    )


def show_privileges(spark: SparkSession) -> DataFrame:
    rows = [("Select", "Tables", "To retrieve rows from table"),
            ("Insert", "Tables", "To insert data into tables"),
            ("Update", "Tables", "To update existing rows"),
            ("Delete", "Tables", "To delete existing rows"),
            ("Create", "Databases,Tables", "To create new databases and tables"),
            ("Drop", "Databases,Tables", "To drop databases and tables")]
    return spark.createDataFrame(rows, "Privilege string, Context string, Comment string")


def show_warnings(spark: SparkSession) -> DataFrame:
    """SHOW WARNINGS / SHOW ERRORS: always the empty set — the engine
    raises hard errors instead of accumulating warnings (strict-mode
    stance: failed casts are 1366/1048, never silent coercion + warning),
    so the diagnostics area is empty by construction. Clients and ORMs
    poll this after most statements; answering the empty set keeps them
    functional."""
    return spark.createDataFrame([], "Level string, Code int, Message string")


def show_warning_count(spark: SparkSession, kind: str = "warning") -> DataFrame:
    """SHOW COUNT(*) WARNINGS / ERRORS: MySQL returns ONE row with a
    single integer column (clients parse row[0][0] after statements),
    named like the @@session counter it mirrors — always 0 here, since
    the engine raises hard errors instead of accumulating warnings."""
    col = f"@@session.{kind}_count"
    return spark.createDataFrame([(0,)], f"`{col}` int")
