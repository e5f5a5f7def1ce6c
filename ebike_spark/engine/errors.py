"""MySQL-compatible error surface.

The reference reports MySQL error codes over the wire; the ones it
actually raises (and we mirror) are:

- 1062 duplicate entry  (/root/reference/src/execute_impl/insert.rs:197-220)
- 1146 table doesn't exist (/root/reference/src/core/core_util.rs:143-221)
- 1049 unknown database
- 1105 unknown/unsupported statement
  (/root/reference/src/core/execution.rs:894-1279 fallthrough)
- 1064 parse error
"""

from __future__ import annotations


class EbikeError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(f"ERROR {code}: {message}")
        self.code = code
        self.message = message


def duplicate_entry(value: str, key: str) -> EbikeError:
    return EbikeError(1062, f"Duplicate entry '{value}' for key '{key}'")


def table_not_exists(name: str) -> EbikeError:
    return EbikeError(1146, f"Table '{name}' doesn't exist")


def unknown_database(name: str) -> EbikeError:
    return EbikeError(1049, f"Unknown database '{name}'")


def unsupported(what: str) -> EbikeError:
    return EbikeError(1105, f"Unknown error: unsupported statement: {what}")


def parse_error(detail: str) -> EbikeError:
    return EbikeError(1064, f"You have an error in your SQL syntax: {detail}")
