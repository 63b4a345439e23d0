"""Geo enrichment (SURVEY.md A10, GeoTracker app.py:709-731).

The reference resolves IPs one at a time over HTTP with an in-memory
cache — sequential, non-deterministic, unreplayable. The engine form
is a precomputed ip→geo DIMENSION joined broadcast-style (SURVEY.md
§2.10 'preferred: deterministic, testable'): at 100 TB the lookup is a
map-side join against a GeoIP snapshot table, refreshed out-of-band.
For the long tail where no snapshot exists, geo_enrich_external ships
the enrichment-from-external-service pattern itself: Arrow-batched
mapInPandas with a per-partition resolver cache.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


def geo_enrich_external(
    activity: DataFrame,
    *,
    ip_col: str = "ip_address",
    resolver: Callable[[str], dict | None] | None = None,
) -> DataFrame:
    """Enrichment from an EXTERNAL lookup service, distributed form of
    the reference's per-row HTTP GeoTracker (app.py:709-731): an
    Arrow-batched mapInPandas stage where each partition keeps a local
    resolver cache, so a hot IP resolves once per partition — and the
    external service sees bounded concurrency (one in-flight resolver
    per partition), not a per-row thundering herd.

    ``resolver(ip) -> {"country": ..., "city": ...} | None``; None and
    resolver exceptions leave NULL geo columns (the reference skips
    failed lookups).  The default resolver is a deterministic offline
    fake (md5-derived), so tests and air-gapped runs never touch the
    network; plug a MaxMind/ip-api client in production — the Spark
    plumbing (schema, batching, caching, partition-inherited
    parallelism, no shuffle) is identical.

    Prefer geo_enrich's broadcast dimension join whenever a snapshot
    table CAN be materialized — this operator is for lookups that
    genuinely must happen inline.
    """
    out_schema = T.StructType(
        list(activity.schema.fields)
        + [
            T.StructField("country", T.StringType(), True),
            T.StructField("city", T.StringType(), True),
        ]
    )
    cols = [f.name for f in activity.schema.fields]

    def batches(it: Iterator) -> Iterator:
        import hashlib

        def default_resolver(ip: str) -> dict | None:
            h = hashlib.md5(ip.encode("utf-8")).digest()
            countries = (
                "US", "DE", "IN", "BR", "JP", "GB", "FR", "AU",
                "CA", "NL", "SG", "KR",
            )
            return {
                "country": countries[h[0] % len(countries)],
                "city": f"city-{h[1:3].hex()}",
            }

        resolve = resolver or default_resolver
        cache: dict[str, tuple[str | None, str | None]] = {}

        def lookup(ip) -> tuple[str | None, str | None]:
            if ip is None:
                return (None, None)
            ip = str(ip)
            if ip not in cache:
                # the .get calls stay inside the try: a resolver that
                # returns a non-dict (contract violation) degrades to
                # NULL geo like a resolver that raises, instead of
                # failing the task
                try:
                    geo = resolve(ip)
                    pair = (
                        (geo.get("country"), geo.get("city"))
                        if geo is not None
                        else (None, None)
                    )
                except Exception:
                    pair = (None, None)
                cache[ip] = pair
            return cache[ip]

        for pdf in it:
            resolved = [lookup(ip) for ip in pdf[ip_col]]
            out = pdf[cols].copy()
            out["country"] = [r[0] for r in resolved]
            out["city"] = [r[1] for r in resolved]
            yield out

    return activity.mapInPandas(batches, schema=out_schema)
