"""Property-based tests (hypothesis) against pure-Python models.

One Spark job per example is slow, so each property generates a BATCH
of cases, runs them through Spark as one frame, and checks every row
against the model — hypothesis shrinks over batch contents as usual.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from database_activity_monitoring_dam_system_spark.operators import asof, dedup

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_ts = st.integers(min_value=0, max_value=120).map(
    lambda s: dt.datetime(2026, 8, 1, 10, 0, 0) + dt.timedelta(seconds=s)
)


@st.composite
def _asof_case(draw):
    keys = draw(st.lists(st.integers(1, 3), min_size=1, max_size=3, unique=True))
    left = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), _ts), min_size=1, max_size=8
        )
    )
    right = draw(
        st.lists(
            st.tuples(
                st.sampled_from(keys),
                _ts,
                st.one_of(st.none(), st.integers(0, 100)),
            ),
            min_size=0,
            max_size=8,
        )
    )
    return left, right


def _model_asof(left, right):
    """Pure-Python as-of backward with the pinned tie rule: inclusive,
    greatest (ts, value) right row ≤ left ts wins; NULL values sort
    below non-NULL (struct comparison, nulls-first asc). A matched row
    with NULL value carries (ts, NULL) atomically."""
    out = {}
    for li, (k, lts) in enumerate(left):
        cands = [(rts, v) for (rk, rts, v) in right if rk == k and rts <= lts]
        if not cands:
            out[li] = None
        else:
            out[li] = max(
                cands, key=lambda c: (c[0], c[1] is not None, c[1] or 0)
            )
    return out


@settings(**_SETTINGS)
@given(_asof_case())
def test_asof_matches_model(spark, case):
    left, right = case
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "row_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, ts, float(v) if v is not None else None) for (k, ts, v) in right],
        "user_id long, ts timestamp, value double",
    ) if right else spark.createDataFrame([], "user_id long, ts timestamp, value double")
    got = {
        r.row_id: (
            (r.ts_asof, r.value_asof) if r.ts_asof is not None else None
        )
        for r in asof.asof_join_backward(
            ldf, rdf, on=["user_id"], ts_col="ts", carry_cols=["value"]
        ).collect()
    }
    model = _model_asof(left, right)
    assert set(got) == set(model)
    for i, expected in model.items():
        if expected is None:
            assert got[i] is None
        else:
            want_v = float(expected[1]) if expected[1] is not None else None
            assert got[i] == (expected[0], want_v)


_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon"])


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(_word, min_size=1, max_size=8).map(" ".join),
        min_size=2,
        max_size=6,
    )
)
def test_jaccard_matches_model(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, threshold=0.0).collect()
    }
    sets = [set(t.split()) for t in texts]
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in got  # pairs only form on shared tokens
                continue
            j = inter / len(sets[a] | sets[b])
            assert got[(a, b)] == round(j, 4)


@st.composite
def _interval_case(draw):
    events = draw(
        st.lists(_ts, min_size=1, max_size=12)
    )
    intervals = draw(
        st.lists(
            st.tuples(_ts, st.integers(0, 90)),  # (start, length seconds)
            min_size=1,
            max_size=6,
        )
    )
    bin_seconds = draw(st.sampled_from([7, 30, 60]))
    return events, intervals, bin_seconds


@settings(**_SETTINGS)
@given(_interval_case())
def test_interval_join_matches_model(spark, case):
    """Bin-bucketed rewrite == half-open containment model, for
    arbitrary overlapping/empty/zero-length intervals and bin widths
    that do and don't divide the interval lengths."""
    from database_activity_monitoring_dam_system_spark.operators import (
        rangejoin,
    )

    events, intervals, bin_seconds = case
    edf = spark.createDataFrame(
        [(i, ts) for i, ts in enumerate(events)],
        "event_id long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [
            (j, start, start + dt.timedelta(seconds=length))
            for j, (start, length) in enumerate(intervals)
        ],
        "window_id int, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r.event_id, r.window_id)
        for r in rangejoin.interval_join(
            edf, idf, ts_col="ts", bin_seconds=bin_seconds
        ).collect()
    }
    model = {
        (i, j)
        for i, ts in enumerate(events)
        for j, (start, length) in enumerate(intervals)
        if start <= ts < start + dt.timedelta(seconds=length)
    }
    assert got == model


def _model_repetition(toks: list[str]):
    """Pure-Python model of textops.repetition_signals at operator
    defaults (HALF_UP rounding to match Spark's round())."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def r4(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))

    text = " ".join(toks)
    n_chars = len(text)
    rep = r4(1.0 - len(set(toks)) / len(toks))
    bigrams = Counter(
        " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
    )
    if bigrams:
        top_cnt = max(bigrams.values())
        top = min(g for g, c in bigrams.items() if c == top_cnt)
        top_frac = r4(top_cnt * len(top) / n_chars)
    else:
        top, top_frac = "", 0.0
    trigrams = Counter(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )
    dup = sum(c * len(g) for g, c in trigrams.items() if c >= 2)
    dup_frac = r4(min(1.0, dup / n_chars))
    verdict = (
        "bigram_loop" if top_frac > 0.08
        else "trigram_dup" if dup_frac > 0.60
        else "keep"
    )
    return rep, top, top_frac, dup_frac, verdict


_rep_tok = st.sampled_from(["a", "b", "ab", "ba", "x"])


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(_rep_tok, min_size=1, max_size=14),
        min_size=1,
        max_size=5,
    )
)
def test_repetition_signals_match_model(spark, tok_lists):
    """The sorted-array run-length folds agree with a straightforward
    Counter model on arbitrary token sequences — mode tie-breaks,
    overlap double-counting, the 1.0 cap, and the verdict chain."""
    from database_activity_monitoring_dam_system_spark.operators import textops

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(tok_lists)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in textops.repetition_signals(docs).collect()}
    for i, toks in enumerate(tok_lists):
        rep, top, top_frac, dup_frac, verdict = _model_repetition(toks)
        r = got[i]
        assert r.repeated_token_frac == rep, (i, toks)
        assert r.top_bigram == top, (i, toks)
        assert r.top_bigram_frac == top_frac, (i, toks)
        assert r.dup_trigram_frac == dup_frac, (i, toks)
        assert r.verdict == verdict, (i, toks)


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=60))
def test_hll_md5_registers_match_hashlib_model(spark, values):
    """The Spark-side md5 bit derivation (bucket nibbles, leading-zero
    rho, exact scaled harmonic sum) agrees with a hashlib reference —
    the same bits any engine's md5 must produce."""
    import hashlib

    from database_activity_monitoring_dam_system_spark.operators import sketches

    regs: dict[int, int] = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        bucket = int(h[:2], 16)
        tail = h[2:10]
        lead = len(tail) - len(tail.lstrip("0"))
        if lead >= 8:
            rho = 33
        else:
            nib = int(tail[lead], 16)
            nibble_lead = 0 if nib >= 8 else 1 if nib >= 4 else 2 if nib >= 2 else 3
            rho = 4 * lead + nibble_lead + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    harmonic = sum(1 << (33 - r) for r in regs.values()) + (256 - len(regs)) * (
        1 << 33
    )
    df = spark.createDataFrame(
        [("g", v) for v in values], "grp string, id long"
    )
    [row] = sketches.hll_md5_distinct(df, ["grp"], "id").collect()
    assert row.harmonic_scaled == harmonic, values
    assert row.zero_registers == 256 - len(regs), values


@st.composite
def _chunk_case(draw):
    n_tokens = draw(st.integers(0, 40))
    chunk_size = draw(st.integers(1, 12))
    stride = draw(st.integers(1, 12))
    return n_tokens, chunk_size, stride


def _model_chunks(n_tokens, chunk_size, stride):
    """Pure-Python model of chunk_documents window layout over a doc
    of n_tokens distinct tokens."""
    n = max(n_tokens, 1)  # split('') yields [''] — one empty token
    if n <= chunk_size:
        n_chunks = 1
    else:
        n_chunks = -(-(n - chunk_size) // stride) + 1
    out = []
    for i in range(n_chunks):
        start = i * stride
        length = min(chunk_size, n - start)
        if length > 0:  # sampling mode (stride > size) clips the tail
            out.append((i, start, length))
    return out


@given(st.lists(_chunk_case(), min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_chunk_layout_matches_model(spark, cases):
    from database_activity_monitoring_dam_system_spark.operators import packing

    for case_id, (n_tokens, chunk_size, stride) in enumerate(cases):
        text = " ".join(f"w{j}" for j in range(n_tokens))
        docs = spark.createDataFrame(
            [(case_id, text)], "doc_id long, text string"
        )
        rows = sorted(
            packing.chunk_documents(
                docs, chunk_size=chunk_size, stride=stride
            ).collect(),
            key=lambda r: r.chunk_idx,
        )
        got = [(r.chunk_idx, r.start_tok, r.chunk_tokens) for r in rows]
        assert got == _model_chunks(n_tokens, chunk_size, stride), (
            f"n={n_tokens} size={chunk_size} stride={stride}"
        )
        # with stride <= size windows tile the doc: every token
        # covered, none invented (stride > size is sampling mode —
        # gaps are the point)
        if stride <= chunk_size:
            covered = set()
            for _, start, ln in got:
                covered.update(range(start, start + ln))
            assert covered == set(range(max(n_tokens, 1)))


@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 60)),
        min_size=1,
        max_size=24,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 64),
    st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_pack_offsets_matches_running_model(spark, docs_spec, budget, shards):
    from database_activity_monitoring_dam_system_spark.operators import packing

    frame = spark.createDataFrame(
        [(i, n) for i, n in docs_spec], "doc_id long, n_tokens long"
    )
    rows = packing.pack_offsets(
        frame, budget=budget, n_shards=shards, tokens_col="n_tokens"
    ).collect()
    assert len(rows) == len(docs_spec)
    # model: running offset per shard in doc_id order
    running: dict[int, int] = {}
    for doc_id, n in sorted(docs_spec):
        shard = doc_id % shards
        before = running.get(shard, 0)
        row = next(r for r in rows if r.doc_id == doc_id)
        assert row.shard_id == shard
        assert row.pack_id == before // budget
        assert row.offset_in_pack == before % budget
        running[shard] = before + n


@given(
    st.lists(
        st.lists(
            # quantized to 6 dp: components are 0 or >= 1e-6, so the
            # float32 storage schema can't underflow them to zero
            # under the smallest factor (hypothesis found the real
            # counterexample: a subnormal-float32 component times
            # 0.25 rounds to 0, max|x| collapses, and the scaled
            # vector is dropped — scale invariance genuinely holds
            # only away from the subnormal floor)
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
            ).map(lambda x: round(x, 6)),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([0.25, 4.0, 32.0]),
)
@settings(**_SETTINGS)
def test_int8_quantization_scale_invariant(spark, vecs, factor):
    """Cosine (and therefore the int8 codes, which divide by the
    per-vector max) is scale-invariant: multiplying every vector by a
    positive constant must leave the quantized codes bit-identical.

    Factors are powers of two ON PURPOSE: they rescale doubles exactly
    (exponent shift), so x*f/max(|x|*f) is bit-identical to x/max|x|.
    An arbitrary factor perturbs the ratio by an ulp, which flips
    codes sitting exactly on the floor(+0.5) half-integer boundary —
    mathematically the property holds, in floating point only the
    power-of-two form does."""
    from database_activity_monitoring_dam_system_spark.operators import (
        similarity,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    scaled = [(i, [float(x) * factor for x in v]) for i, v in enumerate(vecs)]
    schema = "vec_id long, embedding array<float>"
    q1 = {
        r.vec_id: list(r.qvec)
        for r in similarity.quantize_int8(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    q2 = {
        r.vec_id: list(r.qvec)
        for r in similarity.quantize_int8(
            spark.createDataFrame(scaled, schema)
        ).collect()
    }
    assert q1 == q2


def _model_asof_directional(left, right, direction, tol):
    """Pure-Python model for asof_join across directions with
    tolerance: per side, inclusive; greatest (ts, value) among
    equal-ts rights; nearest picks the closer side, exact tie →
    backward; tolerance disqualifies per side BEFORE comparison."""
    out = {}
    for li, (k, lts) in enumerate(left):
        def best(cands, pick_max):
            if not cands:
                return None
            key_ts = max(c[0] for c in cands) if pick_max else min(
                c[0] for c in cands
            )
            at = [c for c in cands if c[0] == key_ts]
            return max(at, key=lambda c: (c[1] is not None, c[1] or 0))

        bw = best(
            [
                (rts, v) for (rk, rts, v) in right
                if rk == k and rts <= lts
                and (tol is None or (lts - rts).total_seconds() <= tol)
            ],
            pick_max=True,
        )
        fw = best(
            [
                (rts, v) for (rk, rts, v) in right
                if rk == k and rts >= lts
                and (tol is None or (rts - lts).total_seconds() <= tol)
            ],
            pick_max=False,
        )
        if direction == "backward":
            out[li] = bw
        elif direction == "forward":
            out[li] = fw
        elif bw is None or fw is None:
            out[li] = bw if fw is None else fw
        else:
            d_b = (lts - bw[0]).total_seconds()
            d_f = (fw[0] - lts).total_seconds()
            out[li] = bw if d_b <= d_f else fw
    return out


@settings(**_SETTINGS)
@given(
    _asof_case(),
    st.sampled_from(["backward", "forward", "nearest"]),
    st.one_of(st.none(), st.integers(0, 60)),
)
def test_asof_directions_match_model(spark, case, direction, tol):
    left, right = case
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "row_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, ts, float(v) if v is not None else None) for (k, ts, v) in right],
        "user_id long, ts timestamp, value double",
    ) if right else spark.createDataFrame(
        [], "user_id long, ts timestamp, value double"
    )
    got = {
        r.row_id: (
            (r.ts_asof, r.value_asof) if r.ts_asof is not None else None
        )
        for r in asof.asof_join(
            ldf, rdf, on=["user_id"], ts_col="ts", carry_cols=["value"],
            direction=direction,
            tolerance_seconds=float(tol) if tol is not None else None,
        ).collect()
    }
    model = _model_asof_directional(left, right, direction, tol)
    assert set(got) == set(model)
    for i, expected in model.items():
        if expected is None:
            assert got[i] is None, (i, got[i])
        else:
            ets, ev = expected
            assert got[i] == (ets, float(ev) if ev is not None else None), (
                i, got[i], expected
            )


@st.composite
def _containment_fold_case(draw):
    vocab = [f"w{i}" for i in range(12)]
    def doc():
        return " ".join(
            draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=6))
        )
    n_old = draw(st.integers(2, 6))
    old = [(i, doc()) for i in range(n_old)]
    new = []
    for i, text in old:
        verdict = draw(st.sampled_from(["keep", "change", "remove"]))
        if verdict == "keep":
            new.append((i, text))
        elif verdict == "change":
            new.append((i, doc()))
    n_add = draw(st.integers(0, 2))
    new += [(100 + j, doc()) for j in range(n_add)]
    return old, new


@settings(**_SETTINGS)
@given(_containment_fold_case(), st.sampled_from([0.6, 0.8, 1.0]))
def test_containment_fold_equals_rebuild_property(spark, case, t):
    """update_containment_pairs ≡ fresh rebuild on randomized corpora
    across every delta mix hypothesis can shrink to — the durable
    form of the review pass's randomized oracle."""
    old_rows, new_rows = case
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(
        new_rows, "doc_id long, text string"
    ) if new_rows else spark.createDataFrame([], "doc_id long, text string")
    old_pairs = dedup.containment_prefix_pairs(old, threshold=t, shingle=1)
    folded = dedup.update_containment_pairs(
        old_pairs, old, new, threshold=t, shingle=1
    )
    fresh = dedup.containment_prefix_pairs(new, threshold=t, shingle=1)
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(folded) == canon(fresh)


# ------------------------------------------------ streaming funnel lateness

_FUNNEL_STEPS = ["login", "query", "export"]


@st.composite
def _funnel_interleave_case(draw):
    """Randomized out-of-order arrival of funnel (and decoy) events:
    each event gets an event time AND an independent arrival batch,
    so hypothesis explores cross-batch disorder, duplicate steps,
    pre-login steps, re-labeling late arrivals, and — when the drawn
    watermark delay is shorter than the disorder — genuinely late
    events that the watermark must DROP."""
    users = [1, 2, 3]
    n = draw(st.integers(min_value=1, max_value=16))
    events = [
        (
            draw(st.sampled_from(users)),
            draw(st.sampled_from(_FUNNEL_STEPS + ["other"])),
            draw(st.integers(min_value=0, max_value=240)),
        )
        for _ in range(n)
    ]
    arrival = [draw(st.integers(0, 4)) for _ in range(n)]
    delay_s = draw(st.sampled_from([30, 90, 600]))
    return events, arrival, delay_s


class _FakeGroupState:
    """Just enough of pyspark GroupState for _funnel_fn: exists/get/
    update plus the per-batch watermark the protocol feeds it."""

    def __init__(self):
        self._v = None
        self.wm_ms = 0

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def getCurrentWatermarkMs(self):
        return self.wm_ms


def _epoch_us(sec_offset: int) -> int:
    base = dt.datetime(2024, 3, 1, 10, 0, 0, tzinfo=dt.timezone.utc)
    return int(
        (base + dt.timedelta(seconds=sec_offset)).timestamp() * 1_000_000
    )


@settings(**_SETTINGS)
@given(_funnel_interleave_case())
def test_funnel_stream_state_fn_matches_batch_property(spark, case):
    """The per-user funnel state fold (journey_stream._funnel_fn)
    driven through an emulated micro-batch watermark protocol — the
    same protocol funnel_stream runs under: per batch, rows older
    than the CURRENT watermark are dropped, the state fn folds the
    survivors under that watermark, and the watermark then advances
    to max-event-time-so-far minus the delay. The final emitted row
    per user must equal journeys.funnel_steps over exactly the
    surviving events — for ANY interleaving hypothesis can shrink
    to, in all three delay regimes (everything-buffered, mixed
    finalize/buffer, aggressive dropping)."""
    from database_activity_monitoring_dam_system_spark.operators import journeys
    from database_activity_monitoring_dam_system_spark.streaming import (
        journey_stream,
    )
    import pandas as pd

    events, arrival, delay_s = case
    fn = journey_stream._funnel_fn(_FUNNEL_STEPS, "user_id")
    states: dict[int, _FakeGroupState] = {}
    last_row: dict[int, tuple] = {}
    survivors: list[tuple] = []
    wm_ms = 0
    for b in range(max(arrival) + 1):
        batch = [
            (u, tp, ts)
            for (u, tp, ts), ab in zip(events, arrival)
            if ab == b and tp in _FUNNEL_STEPS  # pre-state step filter
        ]
        if not batch:
            continue
        kept = [e for e in batch if _epoch_us(e[2]) // 1000 >= wm_ms]
        survivors.extend(kept)
        by_user: dict[int, list] = {}
        for u, tp, ts in kept:
            by_user.setdefault(u, []).append((tp, ts))
        for u, evs in by_user.items():
            state = states.setdefault(u, _FakeGroupState())
            state.wm_ms = wm_ms
            pdf = pd.DataFrame(
                {
                    "_ts_us": [_epoch_us(ts) for _, ts in evs],
                    "_type": [tp for tp, _ in evs],
                }
            )
            for out in fn((u,), iter([pdf]), state):
                for r in out.itertuples(index=False):
                    last_row[u] = tuple(r)
        # watermark advances AFTER the batch, from max event time of
        # everything that arrived (including rows the NEXT batch's
        # filter would have dropped — they still flowed through the
        # watermark node)
        batch_max_ms = max(_epoch_us(e[2]) // 1000 for e in batch)
        wm_ms = max(wm_ms, batch_max_ms - delay_s * 1000)

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    sdf = spark.createDataFrame(
        [
            (u, tp, base + dt.timedelta(seconds=ts))
            for u, tp, ts in survivors
        ]
        or [(None, None, None)],
        "user_id long, event_type string, ts timestamp",
    )
    if not survivors:
        sdf = sdf.filter("user_id IS NOT NULL")
    want = {
        r.user_id: (r.t_login, r.t_query, r.t_export, r.step_reached)
        for r in journeys.funnel_steps(sdf, _FUNNEL_STEPS).collect()
    }
    got = {u: row[1:] for u, row in last_row.items()}
    assert got == want


@settings(**_SETTINGS)
@given(
    _containment_fold_case(),
    st.sampled_from([0.5, 0.8, 1.0]),
    st.sampled_from([4, 1000]),
    st.sampled_from(["md5", "xxhash64"]),
    st.sampled_from([None, 2]),
)
def test_containment_sketch_fold_equals_rebuild_property(
    spark, case, t, k, fam, max_df
):
    """update_containment_sketch_pairs ≡ fresh containment_sketch_pairs
    on randomized corpora across every delta mix — in BOTH sketch
    regimes (k=4 genuinely sampling, k=1000 degenerate-exact), both
    hash families, and with/without the df cap. The sketch has no
    global df order, so the fold must be exact (not merely
    approximate) relative to the rebuild; under max_df the 12-word
    vocabulary makes cap-membership flips frequent, stressing the
    flipped-token dirtying rule."""
    old_rows, new_rows = case
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(
        new_rows, "doc_id long, text string"
    ) if new_rows else spark.createDataFrame([], "doc_id long, text string")
    kw = dict(k=k, threshold=t, shingle=1, hash_family=fam, max_df=max_df)
    old_pairs = dedup.containment_sketch_pairs(old, **kw)
    folded = dedup.update_containment_sketch_pairs(
        old_pairs, old, new, **kw
    )
    fresh = dedup.containment_sketch_pairs(new, **kw)
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(folded) == canon(fresh)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    channels=st.sampled_from([1, 3]),
    quality=st.integers(30, 100),
    subsampling=st.sampled_from(["444", "420"]),
    restart=st.integers(0, 3),
    seed=st.integers(0, 2**31),
)
def test_jpeg_roundtrip_properties(
    w, h, channels, quality, subsampling, restart, seed
):
    """The baseline JPEG codec is total over its declared envelope:
    any (size, channels, quality, subsampling, restart-interval)
    combination encodes to a well-formed stream (SOI..EOI) that
    decodes back to the exact dimensions, and the decode is CLOSE —
    per-pixel error bounded by the coarsest quantizer plausible at
    the chosen quality (flat-field images, being DC-only, bound the
    error by half a DC step).  This is the no-crash/no-skew
    net under the exactness anchors (flat-gray identity, direct
    DCT-III pin) in test_extensions."""
    import numpy as np

    from database_activity_monitoring_dam_system_spark.operators import (
        jpegcodec,
    )

    rng = np.random.default_rng(seed)
    # flat field + mild noise: keeps an analytic error bound while
    # still exercising AC coefficients and both chroma planes
    base = rng.integers(30, 226, size=(1, 1, channels))
    img = np.clip(
        base + rng.integers(-6, 7, size=(h, w, channels)), 0, 255
    ).astype(np.uint8)
    data = jpegcodec.encode_jpeg(
        w, h, img.tobytes(), channels=channels, quality=quality,
        subsampling=subsampling, restart_interval=restart,
    )
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    got_w, got_h, got_ch, pix = jpegcodec.decode_jpeg(data)
    assert (got_w, got_h, got_ch) == (w, h, channels)
    dec = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, channels)
    err = np.abs(dec.astype(int) - img.astype(int)).max()
    # ±6 noise around a flat field: every DCT coefficient is small,
    # so the reconstruction error is bounded by a few quantizer
    # steps even at quality 30 (empirical ceiling ~40 incl. chroma
    # rounding); the bound exists to catch sign/scale bugs (which
    # produce errors ~128+), not to certify rate-distortion
    assert err <= 64, err


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    channels=st.sampled_from([1, 3]),
    quality=st.integers(30, 100),
    subsampling=st.sampled_from(["444", "420"]),
    restart=st.integers(0, 3),
    seed=st.integers(0, 2**31),
)
def test_jpeg_progressive_equals_baseline_property(
    w, h, channels, quality, subsampling, restart, seed
):
    """Progressive ≡ baseline decode over the whole declared
    envelope: both encoders share the quantized coefficients, so for
    ANY (size, channels, quality, subsampling, restart) the two
    streams must decode to byte-identical pixels — the property that
    pins every G.2 scan path (spectral bands, DC/AC successive
    approximation, EOB runs with buffered correction bits, per-scan
    restart resync) against the already-anchored baseline path."""
    import numpy as np

    from database_activity_monitoring_dam_system_spark.operators import (
        jpegcodec,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, channels)).astype(np.uint8)
    base = jpegcodec.encode_jpeg(
        w, h, img.tobytes(), channels=channels, quality=quality,
        subsampling=subsampling, restart_interval=restart,
    )
    prog = jpegcodec.encode_jpeg_progressive(
        w, h, img.tobytes(), channels=channels, quality=quality,
        subsampling=subsampling, restart_interval=restart,
    )
    assert jpegcodec.decode_jpeg(prog) == jpegcodec.decode_jpeg(base)
