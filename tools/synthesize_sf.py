"""Synthesize a larger scale factor from existing testdata.

``python tools/synthesize_sf.py SRC_DIR DST_DIR [FACTOR]`` replicates
the driver-generated tables FACTOR× (default 10) with key offsets that
preserve the FK structure — the sf1 probe data for BASELINE.md when the
driver only ships sf0.1.  /root/testdata is read-only; write DST under
/tmp.

Scaling model (TPC-H-flavoured):
- region/nation: fixed-size dims, copied as-is.
- customer/supplier/part/orders/lineitem: FACTOR× with per-copy key
  offsets applied consistently to PKs and FKs, so join fan-outs stay
  constant and row counts scale linearly.
- events: FACTOR× with offset event_id AND user_id (more users at the
  same per-user volume, the same ts range 10× denser — time buckets
  keep their width, windows keep their per-key size).
- documents: FACTOR× with offset doc_id; every token of a copy is
  suffixed with the copy tag so vocabularies are disjoint across
  copies — near-dup structure replicates per copy instead of every
  doc gaining FACTOR−1 identical twins (which would blow candidate
  generation quadratically and measure a different workload).
  The optional BOILER_EVERY argument then appends one UNTAGGED
  boilerplate sentence to every BOILER_EVERY-th original doc in
  every copy: those shingles are shared corpus-wide, so their
  document frequency grows linearly with the corpus — the df mass
  real web/legal corpora carry and the `max_df` containment cap
  exists for, which the default disjoint-vocabulary scaling cannot
  produce (BASELINE.md round-10 caveat).
- embeddings: FACTOR× with offset vec_id and deterministic hash-based
  perturbation — copies decorrelate, ANN/near-dup candidate volumes
  scale linearly.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, functions as F


KEY_OFFSETS: dict[str, list[str]] = {
    # table -> columns that get the per-copy offset of that ID SPACE
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# which table owns each key column's id space (offset = that table's
# max key + 1, so copies never collide)
KEY_SPACE: dict[str, str] = {
    "c_custkey": "customer", "o_custkey": "customer",
    "s_suppkey": "supplier", "l_suppkey": "supplier",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "orders", "l_orderkey": "orders",
    "event_id": "events", "user_id": "events",
    "doc_id": "documents", "vec_id": "embeddings",
}


# fixed boilerplate sentence (never copy-tagged → shared corpus-wide;
# 8 tokens = 6 trigram shingles of linearly-growing df)
BOILERPLATE = (
    "all rights reserved terms of service apply here"
)


def _copy(
    df: DataFrame,
    table: str,
    i: int,
    spans: dict[str, int],
    boiler_every: int | None = None,
) -> DataFrame:
    if i == 0 and not (table == "documents" and boiler_every):
        return df
    out = df
    if i > 0:
        for col in KEY_OFFSETS.get(table, []):
            out = out.withColumn(col, (F.col(col) + i * spans[col]).cast(
                dict(df.dtypes)[col]
            ))
    if table == "documents":
        if i > 0:
            tag = f"_{i}"
            out = out.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(t, F.lit(tag)),
                    ),
                ),
            )
        if boiler_every:
            # selection keys on the PRE-offset id so the same original
            # docs carry the block in every copy (fraction preserved)
            orig = F.col("doc_id") - i * spans["doc_id"]
            out = out.withColumn(
                "text",
                F.when(
                    orig % boiler_every == 0,
                    F.concat(F.col("text"), F.lit(" " + BOILERPLATE)),
                ).otherwise(F.col("text")),
            )
        out = out.withColumn("n_chars", F.length("text").cast("bigint"))
    if table == "embeddings":
        out = out.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, j) -> CAST(x + "
                f"(pmod(hash(vec_id, j, {i}), 1000) / 1000.0 - 0.5) * 0.5 "
                "AS FLOAT))"
            ),
        )
    return out


def synthesize(
    spark,
    src_dir: str,
    dst_dir: str,
    factor: int = 10,
    boiler_every: int | None = None,
    tables: list[str] | None = None,
) -> None:
    from database_activity_monitoring_dam_system_spark.sources.testdata import (
        TESTDATA_TABLES,
        load_table,
    )

    # one span per id space = max of the OWNING table's own key + 1
    owner_max: dict[str, int] = {}
    for owner in set(KEY_SPACE.values()):
        own_key = KEY_OFFSETS[owner][0]
        owner_max[owner] = int(
            load_table(spark, src_dir, owner).agg(F.max(own_key)).collect()[0][0]
        ) + 1
    spans = {col: owner_max[owner] for col, owner in KEY_SPACE.items()}
    # user_id's span comes from events.user_id, not event_id
    ev = load_table(spark, src_dir, "events")
    spans["user_id"] = int(ev.agg(F.max("user_id")).collect()[0][0]) + 1

    for table in TESTDATA_TABLES:
        if tables is not None and table not in tables:
            continue
        src = load_table(spark, src_dir, table)
        if table in ("region", "nation"):
            out = src
        else:
            parts = [
                _copy(src, table, i, spans, boiler_every=boiler_every)
                for i in range(factor)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst_dir}/{table}.parquet")
        print(f"{table}: {out.count()} rows")


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    boiler = int(sys.argv[4]) if len(sys.argv) > 4 else None
    tables = sys.argv[5].split(",") if len(sys.argv) > 5 else None

    from database_activity_monitoring_dam_system_spark.session import get_spark

    synthesize(
        get_spark(), src, dst, factor, boiler_every=boiler, tables=tables
    )
