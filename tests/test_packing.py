"""Semantic tests for sequence assembly (operators/packing.py) and
int8 embedding quantization (operators/similarity.py).

The oracle-parity gates pin cross-engine value equality; these pin the
SEMANTICS — coverage/overlap invariants for chunking, conservation and
budget invariants for packing, balance for sharding, and recall vs the
exact baseline for quantization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_activity_monitoring_dam_system_spark.operators import (
    packing,
    similarity,
)
from database_activity_monitoring_dam_system_spark.sources.testdata import (
    load_table,
)

from .conftest import SF_SMOKE


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestChunking:
    def test_short_doc_single_chunk(self, spark):
        out = packing.chunk_documents(
            _mkdocs(spark, ["a b c"]), chunk_size=4, stride=2
        ).collect()
        assert len(out) == 1
        assert out[0].chunk_idx == 0
        assert out[0].start_tok == 0
        assert out[0].chunk_tokens == 3

    def test_window_layout(self, spark):
        # 10 tokens, size 4, stride 3 → windows at 0,3,6 cover tokens
        # 0-3, 3-6, 6-9: every token seen, no empty tail emitted.
        text = " ".join(f"t{i}" for i in range(10))
        out = sorted(
            packing.chunk_documents(
                _mkdocs(spark, [text]), chunk_size=4, stride=3
            ).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert [r.start_tok for r in out] == [0, 3, 6]
        assert [r.chunk_tokens for r in out] == [4, 4, 4]
        # 11 tokens → one more stride lands a short tail window [9, 10].
        text11 = " ".join(f"t{i}" for i in range(11))
        out11 = sorted(
            packing.chunk_documents(
                _mkdocs(spark, [text11]), chunk_size=4, stride=3
            ).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert [r.start_tok for r in out11] == [0, 3, 6, 9]
        assert [r.chunk_tokens for r in out11] == [4, 4, 4, 2]

    def test_every_token_covered_and_boundary_exact(self, spark):
        # Tokens at chunk starts must appear: start positions cover
        # [0, n) with stride gaps < chunk_size, so union of windows
        # covers every token index.
        n, size, stride = 23, 8, 5
        text = " ".join(f"t{i}" for i in range(n))
        rows = packing.chunk_documents(
            _mkdocs(spark, [text]), chunk_size=size, stride=stride
        ).collect()
        covered = set()
        for r in rows:
            covered.update(range(r.start_tok, r.start_tok + r.chunk_tokens))
        assert covered == set(range(n))

    def test_exact_multiple_no_empty_tail(self, spark):
        # n == size + k*stride must NOT emit an empty extra window.
        text = " ".join(f"t{i}" for i in range(4 + 2 * 3))
        rows = packing.chunk_documents(
            _mkdocs(spark, [text]), chunk_size=4, stride=3
        ).collect()
        assert all(r.chunk_tokens > 0 for r in rows)
        assert len(rows) == 3

    def test_invalid_params(self, spark):
        with pytest.raises(ValueError):
            packing.chunk_documents(_mkdocs(spark, ["x"]), chunk_size=0)
        with pytest.raises(ValueError):
            packing.chunk_documents(_mkdocs(spark, ["x"]), stride=-1)


class TestPacking:
    def test_conservation_and_invariants(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        budget, shards = 512, 4
        assigned = packing.pack_offsets(docs, budget=budget, n_shards=shards)
        rows = assigned.collect()
        # Every document assigned exactly once.
        assert len(rows) == docs.count()
        assert len({r.doc_id for r in rows}) == len(rows)
        for r in rows:
            assert 0 <= r.shard_id < shards
            assert 0 <= r.offset_in_pack < budget
            assert r.shard_id == r.doc_id % shards

    def test_pack_token_mass(self, spark):
        # Within a shard, every pack except the last must carry at
        # least... precisely: a pack's mass is >= budget - (max doc
        # overhang) is loose; the tight invariant of offset packing is
        # that pack boundaries are cuts of the running stream: the
        # total stream length equals sum of pack masses, and a pack's
        # FIRST doc starts inside [pack_id*budget, (pack_id+1)*budget).
        docs = load_table(spark, SF_SMOKE, "documents")
        budget = 512
        assigned = packing.pack_offsets(docs, budget=budget, n_shards=2)
        rows = sorted(assigned.collect(), key=lambda r: (r.shard_id, r.doc_id))
        running: dict[int, int] = {}
        for r in rows:
            before = running.get(r.shard_id, 0)
            assert r.pack_id == before // budget
            assert r.offset_in_pack == before % budget
            running[r.shard_id] = before + r.n_tokens

    def test_manifest_matches_offsets(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        manifest = packing.pack_manifest(docs, budget=512, n_shards=2)
        total = manifest.agg(
            F.sum("n_docs").alias("d"), F.sum("pack_tokens").alias("t")
        ).collect()[0]
        assigned = packing.pack_offsets(docs, budget=512, n_shards=2)
        assert total.d == assigned.count()
        assert total.t == assigned.agg(F.sum("n_tokens")).collect()[0][0]


class TestShardManifest:
    def test_partition_of_corpus(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        m = packing.shard_manifest(docs, n_shards=16).collect()
        assert sum(r.n_docs for r in m) == docs.count()
        assert all(0 <= r.shard_id < 16 for r in m)

    def test_md5_key_balances_sequential_ids(self, spark):
        # Sequential ids under the md5 key spread near-uniformly: no
        # shard more than 3× the mean on 500+ docs.
        docs = load_table(spark, SF_SMOKE, "documents")
        m = packing.shard_manifest(docs, n_shards=8).collect()
        mean = sum(r.n_docs for r in m) / len(m)
        assert max(r.n_docs for r in m) < 3 * mean


class TestQuantization:
    def test_codes_in_int8_range(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        q = similarity.quantize_int8(emb)
        bad = q.filter(
            F.exists("qvec", lambda x: (x > 127) | (x < -127))
        ).count()
        assert bad == 0
        # Max-magnitude component always quantizes to ±127.
        at_max = q.filter(
            F.array_max(F.transform("qvec", F.abs)) == 127
        ).count()
        assert at_max == q.count()

    def test_recall_vs_exact(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        qids = [0, 1, 2, 3, 4]
        exact = similarity.cosine_topk(emb, qids, k=10)
        quant = similarity.quantized_topk(emb, qids, k=10)
        hits = exact.join(quant, ["query_id", "neighbor_id"]).count()
        recall = hits / exact.count()
        # int8 keeps ~1% relative score error; on 64-dim random data
        # top-10 overlap stays high. 0.7 is a loose determinism floor.
        assert recall >= 0.7, f"quantized recall {recall:.2f} < 0.7"


class TestBestKeep:
    def test_largest_wins_ties_to_lowest_id(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import dedup

        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)],
            "doc_id long, cluster_id long",
        )
        docs = spark.createDataFrame(
            [(1, 10), (2, 99), (3, 50), (5, 7), (6, 7), (9, 1000)],
            "doc_id long, n_chars long",
        )
        out = {
            r.cluster_id: r
            for r in dedup.best_keep_representatives(clusters, docs).collect()
        }
        assert set(out) == {1, 5}  # doc 9 is a singleton, never enters
        assert out[1].keep_id == 2 and out[1].keep_size == 99
        assert out[1].n_members == 3
        # equal sizes -> lowest id kept
        assert out[5].keep_id == 5 and out[5].n_members == 2


class TestEpochPlan:
    def test_permille_cap_and_defaults(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            sampling,
        )

        # 'en': 100 chars -> 25 est tokens; 'xx' has no target; NULL
        # stratum keyed explicitly.
        docs = spark.createDataFrame(
            [(1, "a" * 100, "en"), (2, "b" * 40, "xx"), (3, "c" * 20, None)],
            "doc_id long, text string, lang string",
        )
        out = {
            r.stratum: r
            for r in sampling.epoch_plan(
                docs, {"en": 50, "xx": 1_000_000, None: 5}
            ).collect()
        }
        # en: 50*1000 div 25 = 2000 permille, uncapped
        assert out["en"].available_tokens == 25
        assert out["en"].epochs_permille == 2000 and not out["en"].capped
        # xx: would be 100M permille -> capped at 4000
        assert out["xx"].epochs_permille == 4000 and out["xx"].capped
        # NULL stratum uses its explicit key: 5*1000 div 5 = 1000
        assert out[None].available_tokens == 5
        assert out[None].epochs_permille == 1000 and not out[None].capped

    def test_absent_target_reports_zero(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            sampling,
        )

        docs = spark.createDataFrame(
            [(1, "hello world", "de")], "doc_id long, text string, lang string"
        )
        [row] = sampling.epoch_plan(docs, {"en": 100}).collect()
        assert row.stratum == "de"
        assert row.target_tokens == 0 and row.epochs_permille == 0
        assert not row.capped


class TestCorpusCard:
    def test_census_and_entropy(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            textops,
        )

        keep_text = "the fast key of a sort and merge to the scan plan is here"
        docs = spark.createDataFrame(
            [
                # s0: two langs 50/50 -> entropy exactly 1 bit
                (1, keep_text, "en", "s0"),
                (2, "xy", "de", "s0"),  # too_short -> dropped
                # s1: single lang -> entropy 0
                (3, keep_text, "en", "s1"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        out = {r.source: r for r in textops.corpus_card(docs).collect()}
        assert out["s0"].n_docs == 2 and out["s0"].n_langs == 2
        assert out["s0"].lang_entropy_bits == 1.0
        assert out["s0"].keep_permille == 500
        assert out["s1"].n_langs == 1 and out["s1"].lang_entropy_bits == -0.0
        assert out["s1"].keep_permille == 1000
        # token census matches the ceil(chars/4) estimate
        assert out["s1"].est_tokens == -(-len(keep_text) // 4)


class TestReviewRegressions:
    """Regressions surfaced by the round-5 self-review."""

    def test_score_documents_accepts_documents_schema(self, spark):
        # The documents table carries an n_chars column; the corpus
        # filter's intermediate names must not collide with it.
        from database_activity_monitoring_dam_system_spark.streaming import (
            corpus_filter,
        )

        docs = load_table(spark, SF_SMOKE, "documents")
        out = corpus_filter.score_documents(docs)
        assert out.count() == docs.count()
        assert "verdict" in out.columns and "n_chars" in out.columns

    def test_score_documents_rejects_output_clash(self, spark):
        from database_activity_monitoring_dam_system_spark.streaming import (
            corpus_filter,
        )

        docs = spark.createDataFrame(
            [(1, "some text", "keep")], "doc_id long, text string, verdict string"
        )
        with pytest.raises(ValueError, match="verdict"):
            corpus_filter.score_documents(docs)

    def test_greyscale_stats_null_absent_channels(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            imagecodec,
            multimodal,
        )

        px = bytes(range(16))  # 4x4 greyscale
        png = imagecodec.encode_png(4, 4, px, channels=1)
        media = spark.createDataFrame(
            [(1, bytearray(png), ("image/png", 4, 4, len(png)))],
            multimodal.MEDIA_SCHEMA,
        )
        [row] = multimodal.decode_image_features(media).collect()
        assert row.channels == 1
        assert row.r_sum == sum(px) and row.r_min == 0 and row.r_max == 15
        assert row.g_sum is None and row.b_sum is None
        assert row.b_min is None and row.g_max is None

    def test_extract_features_stub_without_meta(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            multimodal,
        )

        frame = spark.createDataFrame(
            [(1, bytearray(b"\x10\x20\x30"))],
            "media_id long, payload binary",
        )
        [row] = multimodal.extract_features(frame, decode_stub=True).collect()
        assert row.n_bytes == 3
        assert row.feature[0] == 0x10 / 255.0

    def test_epoch_plan_zero_available_reports_zero(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            sampling,
        )

        docs = spark.createDataFrame(
            [(1, "", "yy")], "doc_id long, text string, lang string"
        )
        [row] = sampling.epoch_plan(docs, {"yy": 1000}).collect()
        assert row.available_tokens == 0
        assert row.epochs_permille == 0 and row.capped is False

    def test_shard_manifest_without_label_col(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            packing as pk,
        )

        chunks = pk.chunk_documents(
            _mkdocs(spark, [" ".join(f"w{i}" for i in range(100))])
        )
        m = pk.shard_manifest(
            chunks, n_shards=4, id_col="doc_id",
            size_col="chunk_tokens", label_col=None,
        ).collect()
        assert sum(r.n_docs for r in m) == chunks.count()
        assert all(r.n_langs == 0 for r in m)

    def test_geo_resolver_contract_violation_degrades_to_null(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import geo

        frame = spark.createDataFrame(
            [(1, "1.2.3.4")], "activity_id long, ip_address string"
        )
        out = geo.geo_enrich_external(
            frame, resolver=lambda ip: ("US", "nyc")  # non-dict return
        ).collect()
        assert out[0].country is None and out[0].city is None


class TestDocumentIngestion:
    def test_jsonl_quarantine_split(self, spark, tmp_path):
        from database_activity_monitoring_dam_system_spark.sources import (
            documents as docsrc,
        )

        p = tmp_path / "corpus.jsonl"
        p.write_text(
            '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0"}\n'
            'this line is not json at all\n'
            '{"doc_id": 2, "text": "zweite zeile", "lang": "de", "source": "s1"}\n'
            '{"doc_id": 3, "text": "truncated...\n'
            '{"unrelated": "fields only"}\n'
        )
        clean, quarantine, _raw = docsrc.read_documents_jsonl(spark, str(p))
        crows = {r.doc_id: r for r in clean.collect()}
        # drifted-but-valid JSON is clean (all-NULL fields), not corrupt
        assert set(crows) == {1, 2, None}
        assert crows[1].text == "hello world"
        assert "_corrupt_record" not in clean.columns
        qrows = [r.raw_line for r in quarantine.collect()]
        assert len(qrows) == 2
        assert any("not json" in ln for ln in qrows)
        assert any(ln.startswith('{"doc_id": 3') for ln in qrows)
        rep = docsrc.ingest_report(
            docsrc.read_documents_jsonl(spark, str(p))
        )
        assert rep == {
            "rows_clean": 3,
            "rows_quarantined": 2,
            "malformed_permille": 400,
        }

    def test_clean_frame_feeds_operators(self, spark, tmp_path):
        from database_activity_monitoring_dam_system_spark.operators import (
            textops,
        )
        from database_activity_monitoring_dam_system_spark.sources import (
            documents as docsrc,
        )

        p = tmp_path / "c.jsonl"
        p.write_text(
            '{"doc_id": 1, "text": "the quick brown fox of the field and a dog to", "lang": "en", "source": "s0"}\n'
            'garbage\n'
        )
        clean = docsrc.read_documents_jsonl(spark, str(p)).clean
        out = textops.quality_scores(clean).collect()
        assert len(out) == 1 and out[0].verdict == "keep"

    def test_csv_quarantine(self, spark, tmp_path):
        from database_activity_monitoring_dam_system_spark.sources import (
            documents as docsrc,
        )

        p = tmp_path / "corpus.csv"
        p.write_text(
            "doc_id,text,lang,source\n"
            "1,hello,en,s0\n"
            "not_a_number,broken,de,s1\n"
        )
        clean, quarantine, _raw = docsrc.read_documents_csv(spark, str(p))
        assert [r.doc_id for r in clean.collect()] == [1]
        assert len(quarantine.collect()) == 1


class TestPackedShardWriter:
    def test_layout_order_and_fidelity(self, spark, tmp_path):
        docs = load_table(spark, SF_SMOKE, "documents")
        out = str(tmp_path / "shards")
        packing.write_packed_shards(docs, out, budget=512, n_shards=4)
        expect = packing.pack_offsets(docs, budget=512, n_shards=4)
        back = spark.read.parquet(out)
        # the shards carry the DOCUMENTS, not just the assignment
        assert set(docs.columns) <= set(back.columns)
        texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
        assert all(r.text == texts[r.doc_id] for r in back.select("doc_id", "text").collect())
        # fidelity: every assignment row survives the write exactly
        cols = sorted(expect.columns)
        assert sorted(tuple(r) for r in back.select(*cols).collect()) == (
            sorted(tuple(r) for r in expect.select(*cols).collect())
        )
        # layout: one directory per shard, prunable by shard predicate
        import os

        dirs = {d for d in os.listdir(out) if d.startswith("shard_id=")}
        assert dirs == {f"shard_id={k}" for k in range(4)}
        one = spark.read.parquet(out).filter(F.col("shard_id") == 2)
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # order: within a shard's files, packs stream in order
        for k in range(4):
            rows = (
                spark.read.parquet(f"{out}/shard_id={k}")
                .select("pack_id", "doc_id")
                .collect()
            )
            assert rows == sorted(rows, key=lambda r: (r.pack_id, r.doc_id))

    def test_read_side_roundtrip(self, spark, tmp_path):
        """write → read_packed_shards → pack_sequences reconstructs
        the loader view exactly: per-pack token conservation against
        the pack_offsets manifest, document order ≡ offset order, and
        the shard_id type survives partition-column inference."""
        docs = load_table(spark, SF_SMOKE, "documents")
        out = str(tmp_path / "shards")
        packing.write_packed_shards(docs, out, budget=512, n_shards=4)

        back = packing.read_packed_shards(spark, out)
        assert dict(back.dtypes)["shard_id"] == "bigint"

        seqs = {
            (r.shard_id, r.pack_id): r
            for r in packing.pack_sequences(back).collect()
        }
        manifest = {
            (r.shard_id, r.pack_id): r
            for r in packing.pack_manifest(
                docs, budget=512, n_shards=4
            ).collect()
        }
        assert seqs.keys() == manifest.keys()
        expect_order = {}
        for r in packing.pack_offsets(docs, budget=512, n_shards=4).collect():
            expect_order.setdefault((r.shard_id, r.pack_id), []).append(
                (r.offset_in_pack, r.doc_id, r.n_tokens)
            )
        for key, row in seqs.items():
            # conservation: counts and token mass match the manifest
            assert row.n_docs == manifest[key].n_docs
            assert row.pack_tokens == manifest[key].pack_tokens
            # order: the seq array IS the offset-sorted document list
            got = [(s.offset_in_pack, s.doc_id, s.n_tokens) for s in row.seq]
            assert got == sorted(expect_order[key])
            # offsets are the running sum of the tokens before them
            run = got[0][0]
            for off, _, n in got:
                assert off == run
                run += n

    def test_streaming_ingest_quarantine(self, spark, tmp_path):
        import os

        from database_activity_monitoring_dam_system_spark.sources import (
            documents as docsrc,
        )

        src = tmp_path / "src"
        os.makedirs(src)
        (src / "a.jsonl").write_text(
            '{"doc_id": 1, "text": "first", "lang": "en", "source": "s"}\n'
            "broken line one\n"
        )
        (src / "b.jsonl").write_text(
            '{"doc_id": 2, "text": "second", "lang": "de", "source": "s"}\n'
        )
        q = docsrc.start_document_ingest(
            spark, str(src),
            clean_dir=str(tmp_path / "clean"),
            quarantine_dir=str(tmp_path / "quar"),
            checkpoint_dir=str(tmp_path / "ck"),
            available_now=True,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        clean = spark.read.parquet(str(tmp_path / "clean"))
        assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
        quar = spark.read.parquet(str(tmp_path / "quar"))
        assert [r.raw_line for r in quar.collect()] == ["broken line one"]


class TestLshTuning:
    def test_auto_band_bits_tracks_corpus_growth(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            similarity,
        )

        # constant bucket occupancy: 10x corpus -> +log2(10) ~ 3 bits
        b_small = similarity.auto_band_bits(2_000)
        b_big = similarity.auto_band_bits(20_000)
        assert b_big - b_small in (3, 4)
        # clamps
        assert similarity.auto_band_bits(10) == 4
        assert similarity.auto_band_bits(10**12) == 16
        assert similarity.auto_band_bits(10**12, planes=8, max_bits=32) == 8
        with pytest.raises(ValueError):
            similarity.auto_band_bits(0)
        # the sf1 probe's manual findings are reproduced: ~5k vectors
        # at bucket ~8 -> 9-bit bands (probe showed 8 degenerated,
        # 12 recovered)
        assert 8 <= similarity.auto_band_bits(5_000) <= 12

    def test_minhash_params_knee(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            similarity,
        )

        # knee (1/b)^(1/r): 32 hashes, t=0.6 -> b=8, r=4 (knee .595)
        assert similarity.minhash_params_for_threshold(0.6) == (8, 4)
        # high threshold -> fewer, longer bands
        b_hi, r_hi = similarity.minhash_params_for_threshold(0.95)
        b_lo, r_lo = similarity.minhash_params_for_threshold(0.3)
        assert r_hi > r_lo and b_hi < b_lo
        with pytest.raises(ValueError):
            similarity.minhash_params_for_threshold(1.0)


class TestBigramLmTrainApply:
    def test_self_scoring_matches_one_pass_form(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            textops,
        )

        docs = load_table(spark, SF_SMOKE, "documents").limit(50)
        one_pass = {
            r.doc_id: (r.n_bigrams, r.avg_logp)
            for r in textops.bigram_logprob_scores(docs).collect()
        }
        model = textops.bigram_lm_train(docs)
        split = {
            r.doc_id: (r.n_bigrams, r.avg_logp)
            for r in textops.bigram_lm_score(docs, model).collect()
        }
        assert split == one_pass

    def test_out_of_domain_scores_lower(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            textops,
        )

        ref = _mkdocs(
            spark,
            ["the cat sat on the mat and the cat ran to the mat again"] * 3,
        )
        model = textops.bigram_lm_train(ref)
        probe = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),          # in-domain
                (2, "zyx wvu tsr qpo nml kji"),          # unseen tokens
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.avg_logp for r in textops.bigram_lm_score(probe, model).collect()}
        assert out[1] > out[2]

    def test_min_count_prunes_model(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            textops,
        )

        ref = _mkdocs(spark, ["a b a b c d"])  # "a b" x2, others once
        pruned = textops.bigram_lm_train(ref, min_count=2)
        assert [r.bg for r in pruned["bigrams"].collect()] == ["a b"]


class TestCorpusDiff:
    def test_all_four_verdicts(self, spark):
        from database_activity_monitoring_dam_system_spark.operators import (
            dedup,
        )

        old = spark.createDataFrame(
            [(1, "same text"), (2, "will change"), (3, "gone soon")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "  SAME   text "),  # normalization: not a change
             (2, "did change"), (4, "brand new")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.verdict for r in dedup.corpus_diff(old, new).collect()}
        assert out == {
            1: "unchanged", 2: "changed", 3: "removed", 4: "added"
        }

    def test_null_text_presence(self, spark):
        # Presence comes from per-side row markers, not fingerprint
        # nullness: a doc with NULL text on BOTH sides is unchanged
        # (not 'added'), and NULL→text / text→NULL read as changed.
        from database_activity_monitoring_dam_system_spark.operators import (
            dedup,
        )

        old = spark.createDataFrame(
            [(1, None), (2, None), (3, "had text")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, None), (2, "grew text"), (3, None), (4, None)],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.verdict for r in dedup.corpus_diff(old, new).collect()}
        assert out == {
            1: "unchanged", 2: "changed", 3: "changed", 4: "added"
        }
