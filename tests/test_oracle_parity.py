"""Replicates the driver's t2 gate locally: every registry query runs
on Spark AND its oracle SQL runs on DuckDB over the same parquet, then
row counts + column names + canonicalized values must match exactly.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from database_activity_monitoring_dam_system_spark.plans.registry import all_queries
from database_activity_monitoring_dam_system_spark.sources.testdata import (
    TESTDATA_TABLES,
)

from .conftest import SF_SMOKE

_SPECS = all_queries()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(rows, columns):
    """Order-insensitive canonical form: sort columns by name, stringify
    values (timestamps → isoformat, floats via repr), sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if isinstance(v, bool):
            return str(bool(v))
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_parity(spark, name):
    spec = _SPECS[name]
    sdf = spec.fn(spark, SF_SMOKE)
    s_cols = sdf.columns
    # NEVER a DecimalType output: the driver's value canonicalizer
    # renders DECIMAL differently per client library (round-7
    # table_checksum flagged hash-red despite value-identical digests
    # at three scale factors), while this harness's str(v) canon is
    # Decimal-transparent and stays green. Keep decimal accumulators
    # internal; emit strings or BIGINTs.
    decimal_cols = [(c, t) for c, t in sdf.dtypes if "decimal" in t.lower()]
    assert not decimal_cols, (
        f"{name}: gate outputs DecimalType columns {decimal_cols} — "
        "driver-unstable rendering; emit string/bigint instead"
    )
    s_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        # Rows-only entries still pin declared schema + row-count
        # bounds (and, where expressible, an exact count via a DuckDB
        # scalar) so they can't silently regress between rounds.
        assert spec.expect_columns is not None, (
            f"{name}: rows-only query must declare expect_columns"
        )
        assert tuple(s_cols) == spec.expect_columns, (
            f"{name}: columns {s_cols} != declared {spec.expect_columns}"
        )
        assert spec.expect_rows is not None, (
            f"{name}: rows-only query must declare expect_rows"
        )
        lo, hi = spec.expect_rows
        assert len(s_rows) >= lo and (hi is None or len(s_rows) <= hi), (
            f"{name}: {len(s_rows)} rows outside declared band [{lo}, {hi}]"
        )
        if spec.rows_oracle is not None:
            expected = _duck(SF_SMOKE).execute(spec.rows_oracle).fetchone()[0]
            assert len(s_rows) == expected, (
                f"{name}: {len(s_rows)} rows != rows_oracle {expected}"
            )
        return

    con = _duck(SF_SMOKE)
    res = con.execute(spec.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch {s_cols} vs {o_cols}"
    )

    # schema parity (driver compares schemas too): normalized dtypes
    # must agree column-for-column
    def _norm(t: str) -> str:
        t = str(t).lower()
        return {
            "bigint": "i64", "integer": "i32", "int": "i32",
            "hugeint": "i128", "double": "f64", "float": "f32",
            "varchar": "str", "string": "str", "boolean": "bool",
            "timestamp": "ts", "date": "date",
        }.get(t, t)

    s_types = {f: _norm(t) for f, t in sdf.dtypes}
    rel = con.sql(spec.oracle)
    o_types = dict(zip(rel.columns, [_norm(t) for t in rel.types]))
    mismatched_types = {
        c: (s_types[c], o_types[c])
        for c in s_types
        if c in o_types and s_types[c] != o_types[c]
    }
    assert not mismatched_types, f"{name}: dtype mismatch {mismatched_types}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    )
    sc, oc = _canon(s_rows, s_cols), _canon(o_rows, o_cols)
    mismatches = [
        (a, b) for a, b in zip(sc, oc) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
