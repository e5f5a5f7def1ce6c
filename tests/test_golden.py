"""Golden pretty-printed outputs mirroring the reference's own test
assertions (/root/reference/src/test/base_sql.rs) — same table layout,
same DML flow, same affected-row counts."""

from __future__ import annotations

import uuid

import pytest

from ebike_spark.engine import Engine
from ebike_spark.engine.format import format_table


@pytest.fixture()
def eng(spark):
    e = Engine(spark)
    db = f"g_{uuid.uuid4().hex[:10]}"
    e.execute(f"CREATE DATABASE {db}")
    e.execute(f"USE {db}")
    yield e
    e.execute(f"DROP DATABASE IF EXISTS {db}")


def test_golden_insert_select(eng):
    # base_sql.rs:115-147: create, insert (1 row affected), golden table
    eng.execute("create table user (id int, name char, PRIMARY KEY(id, name))")
    r = eng.execute("insert into user values (1, 'lucy')")
    assert r.affected == 1
    out = format_table(eng.execute("select * from user").df)
    assert out == "\n".join(
        [
            "+----+------+",
            "| id | name |",
            "+----+------+",
            "| 1  | lucy |",
            "+----+------+",
        ]
    )


def test_golden_delete_count(eng):
    # base_sql.rs:205-230: delete affects 1, count(*) golden = 0
    eng.execute("create table user (id int, name char, PRIMARY KEY(id, name))")
    eng.execute("insert into user values (1, 'lucy')")
    r = eng.execute("delete from user")
    assert r.affected == 1
    out = format_table(eng.execute("select count(*) AS `COUNT(*)` from user").df)
    assert out == "\n".join(
        [
            "+----------+",
            "| COUNT(*) |",
            "+----------+",
            "| 0        |",
            "+----------+",
        ]
    )


def test_golden_show_tables(eng):
    # base_sql.rs:35-92 shape: listing the created table
    eng.execute("create table user1 (id int, name char, PRIMARY KEY(id, name))")
    df = eng.execute("SHOW TABLES").df
    out = format_table(df)
    col = f"Tables_in_{eng.current_db}"
    assert f"| {col} |" in out
    assert "| user1" in out


def test_cli_runs_script(spark, capsys):
    from ebike_spark.cli import run_statement

    e = Engine(spark)
    db = f"c_{uuid.uuid4().hex[:8]}"
    for sql in (f"CREATE DATABASE {db}", f"USE {db}"):
        e.execute(sql)
    try:
        run_statement(e, "CREATE TABLE t (a INT)")
        run_statement(e, "INSERT INTO t VALUES (1), (2)")
        run_statement(e, "SELECT a FROM t ORDER BY a")
        run_statement(e, "SELECT * FROM missing_table")
        out = capsys.readouterr().out
        assert "Query OK, 2 row(s) affected" in out
        assert "| a |" in out and "2 row(s) in set" in out
        assert "ERROR 1146" in out
    finally:
        e.execute(f"DROP DATABASE IF EXISTS {db}")


def test_golden_replace_and_auto_increment(eng):
    eng.execute("create table seq (id int auto_increment, name char, primary key(id))")
    eng.execute("insert into seq (name) values ('a'), ('b')")
    r = eng.execute("replace into seq values (1, 'A')")
    assert r.affected == 2  # 1 deleted + 1 inserted
    out = format_table(eng.execute("select * from seq order by id").df)
    assert out == "\n".join(
        [
            "+----+------+",
            "| id | name |",
            "+----+------+",
            "| 1  | A    |",
            "| 2  | b    |",
            "+----+------+",
        ]
    )


def test_golden_matview_truncate_flow(eng):
    eng.execute("create table t (id int, v float, primary key(id))")
    eng.execute("insert into t values (1, 10.0), (2, 20.0)")
    eng.execute("create materialized view big as select id from t where v > 15")
    out = format_table(eng.execute("select * from big").df)
    assert out == "\n".join(
        [
            "+----+",
            "| id |",
            "+----+",
            "| 2  |",
            "+----+",
        ]
    )
    eng.execute("truncate table t")
    assert eng.execute("refresh materialized view big").affected == 0
    out = format_table(eng.execute("select count(*) AS `COUNT(*)` from big").df)
    assert "| 0" in out
