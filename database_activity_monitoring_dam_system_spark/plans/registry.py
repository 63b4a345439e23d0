"""Merged query registry backing __spark_entry__.py.

Every implemented operator from SURVEY.md §2 (and the §7 extensions)
has exactly one entry; oracle coverage per the driver contract.
"""

from __future__ import annotations

from dataclasses import replace

from . import dam, extensions, relational, scalars
from .spec import QueryFn, QuerySpec


def _pin_utc(fn: QueryFn) -> QueryFn:
    """Wrap a query fn to pin the session timezone to UTC.

    The driver runs queries with ITS OWN SparkSession; hour()/date_trunc/
    date_format are session-TZ-dependent and the DuckDB oracle is
    TZ-naive (UTC-equivalent), so a non-UTC session would silently skew
    every time-derived column (verified: breaks parity under
    America/New_York)."""

    def wrapped(spark, sf_dir):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate clones each explode's (heavy)
        # generator expression into an inferred size()>0 filter that
        # lands on the scan, where it runs interpreted — measured 5×
        # slowdown on the shingle pipelines, and our generator arrays
        # are never empty by construction. Same setting as session.py.
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        return fn(spark, sf_dir)

    return wrapped


def all_queries() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in (relational, dam, scalars, extensions):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return {
        name: replace(spec, fn=_pin_utc(spec.fn)) for name, spec in merged.items()
    }
