"""Result-set formatting: the Arrow pretty-table layout the reference's
tests golden-match (`assert_batches_eq` ASCII tables,
/root/reference/src/test/base_sql.rs:141-147) and the wire path renders
(/root/reference/src/mysql/handle.rs:280-301). Left-aligned cells,
`+---+` borders, NULL rendered as empty — DataFusion's arrow::util::
pretty conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _cell(v: object) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v) if v != int(v) else f"{v:.1f}"
    return str(v)


def format_table(df: DataFrame, limit: int = 1000) -> str:
    cols = df.columns
    rows = [[_cell(v) for v in row] for row in df.limit(limit).collect()]
    widths = [len(c) for c in cols]
    for r in rows:
        for i, v in enumerate(r):
            widths[i] = max(widths[i], len(v))
    border = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [border, "| " + " | ".join(c.ljust(w) for c, w in zip(cols, widths)) + " |", border]
    for r in rows:
        out.append("| " + " | ".join(v.ljust(w) for v, w in zip(r, widths)) + " |")
    out.append(border)
    return "\n".join(out)
