"""Interactive SQL shell — the user-facing surface of the engine.

The reference's UX is the stock ``mysql`` CLI against its wire server
(/root/reference/README.md:23-28); the transport is out of scope here
(SURVEY §7 non-goals), so the equivalent experience is this REPL:

    python -m ebike_spark.cli            # interactive
    echo "SHOW DATABASES;" | python -m ebike_spark.cli   # piped script

Same statement surface, same MySQL-shaped errors, same pretty tables.
"""

from __future__ import annotations

import sys

from ebike_spark.engine import EbikeError, Engine
from ebike_spark.engine.format import format_table
from ebike_spark.session import get_spark


def run_statement(engine: Engine, sql: str, out=sys.stdout) -> None:
    try:
        res = engine.execute(sql)
    except EbikeError as e:
        print(str(e), file=out)
        return
    if res.kind == "rows" and res.df is not None:
        print(format_table(res.df), file=out)
        print(f"{res.df.count()} row(s) in set", file=out)
    elif res.kind == "count":
        print(f"Query OK, {res.affected} row(s) affected", file=out)
    else:
        print("Query OK", file=out)


def main() -> None:
    spark = get_spark("ebike_cli")
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine(spark)
    interactive = sys.stdin.isatty()
    buffer = ""
    if interactive:
        print("ebike_spark SQL shell — end statements with ';', exit with \\q")
    while True:
        if interactive:
            sys.stdout.write("ebike> " if not buffer else "    -> ")
            sys.stdout.flush()
        line = sys.stdin.readline()
        if not line:
            break
        if line.strip() in ("\\q", "exit", "quit"):
            break
        buffer += line
        while ";" in buffer:
            # split on the first top-level ';'
            from ebike_spark.engine.parser import split_top_level

            parts = split_top_level(buffer, ";")
            if len(parts) <= 1 and not buffer.rstrip().endswith(";"):
                break
            stmt, rest = parts[0], ";".join(parts[1:])
            buffer = rest
            if stmt.strip():
                run_statement(engine, stmt)
    # trailing statement without ';'
    if buffer.strip():
        run_statement(engine, buffer)


if __name__ == "__main__":
    main()
