"""Severity ENUM ordering helpers (SURVEY.md C19).

The reference orders severities Low < Medium < High < Critical
(app.py:364-402). Spark has no ENUM; we map label↔rank with chained
`when`s so comparisons stay in codegen.

NOTE the reference's rule battery is NOT a pure lattice-max: rules 1/2
and the injection rule assign severity unconditionally (a blacklist
"Critical" can be overwritten to "High" by the guest-write rule,
app.py:357-359) while other rules only upgrade from "Low". The exact
sequential semantics live in operators/rules.py; these helpers serve
the places that DO want a monotone max (e.g. alert rollups).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import SEVERITY_ORDER

_RANK = {label: i for i, label in enumerate(SEVERITY_ORDER)}


def severity_rank(label: Column) -> Column:
    expr = None
    for name, rank in _RANK.items():
        cond = label == name
        expr = F.when(cond, rank) if expr is None else expr.when(cond, rank)
    return expr.otherwise(F.lit(None).cast("int"))


def severity_label(rank: Column) -> Column:
    expr = None
    for name, r in _RANK.items():
        cond = rank == r
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(F.lit(None).cast("string"))


def severity_greatest(*labels: Column) -> Column:
    """Monotone max over the severity lattice (ignores NULLs)."""
    return severity_label(F.greatest(*[severity_rank(c) for c in labels]))
