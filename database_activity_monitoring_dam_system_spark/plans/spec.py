"""QuerySpec — one registry entry per implemented operator.

``fn(spark, sf_dir) -> DataFrame`` is the Spark plan; ``oracle`` is the
equivalent ANSI SQL DuckDB runs on the same parquet tables (None for
genuinely non-SQL-expressible ops → the driver records a rows-only
check). Column names/aliases MUST match between the two — the driver
sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    description: str = ""
    # Rows-only entries (oracle=None) must still be pinned: declared
    # output columns, an inclusive (min, max) row-count band (max=None
    # for unbounded), and optionally a DuckDB scalar query whose single
    # value is the EXACT expected row count.  test_oracle_parity
    # enforces these so an oracle-less query can't silently regress.
    expect_columns: tuple[str, ...] | None = None
    expect_rows: tuple[int, int | None] | None = None
    rows_oracle: str | None = None


def sql_values(rows: list[tuple], alias: str, columns: list[str]) -> str:
    """Render a literal VALUES table for oracle SQL (escapes quotes)."""

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"

    body = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    return f"(VALUES {body}) AS {alias}({', '.join(columns)})"
