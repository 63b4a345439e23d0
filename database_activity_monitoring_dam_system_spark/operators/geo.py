"""Geo enrichment (SURVEY.md A10, GeoTracker app.py:709-731).

The reference resolves IPs one at a time over HTTP with an in-memory
cache — sequential, non-deterministic, unreplayable. The engine form
is a precomputed ip→geo DIMENSION joined broadcast-style (SURVEY.md
§2.10 'preferred: deterministic, testable'): at 100 TB the lookup is a
map-side join against a GeoIP snapshot table, refreshed out-of-band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def geo_enrich(
    activity: DataFrame, geo_dim: DataFrame, *, ip_col: str = "ip_address"
) -> DataFrame:
    """Left broadcast join against the ip→geo dimension; unresolved IPs
    keep NULL geo columns (the reference skips failed lookups)."""
    return activity.join(F.broadcast(geo_dim), on=ip_col, how="left")


def top_countries(
    activity: DataFrame,
    geo_dim: DataFrame,
    *,
    k: int = 10,
    ip_col: str = "ip_address",
) -> DataFrame:
    """Counter.most_common(10) equivalent (app.py:726-731): group-count
    + deterministic top-k (count desc, country asc)."""
    return (
        geo_enrich(activity, geo_dim, ip_col=ip_col)
        .filter(F.col("country").isNotNull())
        .groupBy("country")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("country"))
        .limit(k)
    )
