"""Round-14 stamp-verification hardening: the column-metadata fast
path must NOT trust a union of differently-stamped tables (a union
inherits the FIRST child's metadata — the advisor-demonstrated trap),
while every library flow keeps its zero-job fast path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark.operators import (
    similarity,
)


def _emb(spark, ids, bump=0.0):
    rows = [
        (i, [float(i % 7) + bump, float(i % 5), 1.0, 0.5]) for i in ids
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _cents(seed):
    import math

    raw = [
        (0, [1.0 + seed, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0 + seed, 0.0, 0.0]),
    ]
    return [
        (cid, v, math.sqrt(sum(x * x for x in v))) for cid, v in raw
    ]


def test_union_of_differently_stamped_assignments_raises(spark):
    emb = _emb(spark, range(20))
    c_a, c_b = _cents(0.0), _cents(0.25)
    a = similarity.stamp_ivf_assignments(
        similarity.ivf_assignments(emb, c_a), c_a
    )
    b = similarity.stamp_ivf_assignments(
        similarity.ivf_assignments(emb, c_b), c_b
    )
    mixed = a.unionByName(b)  # carries a's metadata over b's rows
    with pytest.raises(ValueError, match="stamped"):
        similarity._verify_assign_stamp(mixed, c_a, caller="test")


def test_fold_restamped_output_keeps_fast_path(spark):
    # ivf_update_assignments re-stamps ABOVE its carry-union: the
    # union does not output the stamp column, so the metadata fast
    # path stays trusted (no plan demotion)
    old = _emb(spark, range(20))
    new = _emb(spark, range(4, 24))
    cents = _cents(0.0)
    folded = similarity.ivf_update_assignments(
        similarity.stamp_ivf_assignments(
            similarity.ivf_assignments(old, cents), cents
        ),
        old, new, cents, cache_classification=False,
    )
    assert not similarity._union_carries(
        folded, similarity.IVF_ASSIGN_STAMP
    )
    out = similarity._verify_assign_stamp(folded, cents, caller="test")
    assert similarity.IVF_ASSIGN_STAMP not in out.columns
    assert out.count() == 20  # == len(new ids)


def test_union_of_differently_stamped_codes_raises(spark):
    books_a = [[[0.0, 0.0], [1.0, 1.0]], [[0.5, 0.5], [2.0, 2.0]]]
    books_b = [[[0.1, 0.0], [1.0, 1.0]], [[0.5, 0.5], [2.0, 2.0]]]
    emb = _emb(spark, range(10))
    a = similarity.stamp_index(
        similarity.pq_encode(emb, books_a, dim=4), codebooks=books_a
    )
    b = similarity.stamp_index(
        similarity.pq_encode(emb, books_b, dim=4), codebooks=books_b
    )
    mixed = a.unionByName(b)
    with pytest.raises(ValueError, match="encoded under different"):
        similarity.verify_index_stamp(
            mixed, codebooks=books_a, caller="test"
        )


def test_arr_sql_non_finite_literals(spark):
    nan, inf = float("nan"), float("inf")
    sql = similarity._arr_sql([1.5, nan, inf, -inf])
    row = spark.range(1).selectExpr(f"{sql} AS a").first()
    got = row["a"]
    assert got[0] == 1.5
    assert got[1] != got[1]  # NaN
    assert got[2] == inf and got[3] == -inf


def test_working_column_clash_guard(spark):
    from database_activity_monitoring_dam_system_spark.operators import (
        dedup,
        textops,
    )

    docs = spark.createDataFrame(
        [(1, "a b c", "x")], "doc_id long, text string, _w string"
    )
    for fn in (
        lambda: dedup.token_arrays(docs),
        lambda: dedup.distinct_tokens(docs),
        lambda: textops.repetition_signals(docs),
        lambda: textops.winnow_fingerprints(docs),
    ):
        with pytest.raises(ValueError, match="_w"):
            fn()
