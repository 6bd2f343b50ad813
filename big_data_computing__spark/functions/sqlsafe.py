"""Escaping for string literals injected into generated SQL.

Several operators parameterize generated SQL (Spark ``F.expr`` CASE
arms and their DuckDB twins) with caller-supplied strings — stratum
names, split labels, KMV set labels. A value containing a single
quote would otherwise break both engines' parsers (or worse, change
the query). Every interpolation site routes through :func:`sql_str`
so the literal is always well-formed; identifiers are NOT covered
(column/expr parameters remain the caller's trusted input, the same
contract as Spark's own ``F.expr``).
"""

from __future__ import annotations


def sql_str(value: str) -> str:
    """Render ``value`` as a single-quoted ANSI SQL string literal,
    doubling embedded quotes (identical semantics in Spark SQL and
    DuckDB)."""
    return "'" + str(value).replace("'", "''") + "'"
