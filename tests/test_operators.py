"""Unit tests for the LLM-pipeline operators on crafted in-memory data
(the fixtures contain no true near-duplicates, so we synthesize them
here to assert the operators actually find what they claim to find).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from libcolumnfile_spark.operators import dedup, multimodal, similarity, text
from libcolumnfile_spark.operators.udfs import zscore_by_group

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun near the garden"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate of 1
        (3, BASE.replace("afternoon", "morning")),  # near-dup of 1
        (4, "completely different text about databases and distributed query engines and shuffles"),
        (5, "short one"),
        (6, ""),  # empty doc must not crash any operator
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestExactDedup:
    def test_groups_exact_duplicates(self, docs):
        out = dedup.exact_dedup(docs, ["text"], "doc_id")
        rows = {r["doc_id"]: r["dup_count"] for r in out.collect()}
        assert rows[1] == 2  # docs 1 and 2 collapse; min id survives
        assert 2 not in rows
        assert rows[3] == 1


class TestMinHashLSH:
    def test_finds_exact_and_near_dups(self, docs):
        pairs = dedup.minhash_lsh_dedup(docs, threshold=0.5)
        got = {(r["id_a"], r["id_b"]): r["jaccard_sim"] for r in pairs.collect()}
        assert got.get((1, 2)) == 1.0  # identical -> jaccard 1
        assert (1, 3) in got and got[(1, 3)] >= 0.5  # near-dup found
        assert not any({a, b} & {4, 5} and {a, b} & {1, 2, 3} for a, b in got)

    def test_signature_deterministic(self, spark):
        df = spark.createDataFrame([(1, BASE)], ["doc_id", "text"])
        sig_col = dedup.minhash_signature(dedup.shingles(F.col("text")), n_hashes=8)
        a = df.select(sig_col.alias("s")).first()["s"]
        b = df.select(sig_col.alias("s")).first()["s"]
        assert a == b
        assert len(a) == 8
        assert all(0 <= v < (1 << 31) - 1 for v in a)


class TestSimHash:
    def test_identical_docs_same_signature(self, docs):
        groups = dedup.simhash_dedup(docs)
        rows = groups.collect()
        assert any({"1", "2"} <= set(r["ids_csv"].split(",")) for r in rows)

    def test_near_dup_signatures_close(self, spark):
        df = spark.createDataFrame([(1, BASE), (3, BASE.replace("afternoon", "morning"))], ["doc_id", "text"])
        tokens = F.split(F.lower(F.col("text")), r"\s+")
        sigs = [r["s"] for r in df.select(dedup.simhash64(tokens).alias("s")).collect()]
        hamming = bin((sigs[0] ^ sigs[1]) & ((1 << 64) - 1)).count("1")
        assert hamming <= 16  # one-word change flips few bits


class TestHammingPairs:
    def test_seeded_bit_flips(self, spark):
        """k or fewer flipped bits MUST pair (pigeonhole recall is 1);
        k+1 flips across distinct blocks must NOT."""
        base = 0x0123456789ABCDEF
        rows = [
            (0, base),
            (1, base ^ 1),                      # 1 flip
            (2, base ^ (1 | 1 << 20)),          # 2 flips
            (3, base ^ (1 | 1 << 20 | 1 << 40)),  # 3 flips
            (4, base ^ (1 | 1 << 20 | 1 << 40 | 1 << 60)),  # 4 flips: out vs 0
            (5, -(1 << 63) | 5),                # negative sig must not crash
        ]
        df = spark.createDataFrame(rows, ["id", "sig"])
        got = {(r.id_a, r.id_b): r.hamming for r in dedup.hamming_pairs(df, k=3).collect()}
        assert got[(0, 1)] == 1 and got[(0, 2)] == 2 and got[(0, 3)] == 3
        assert (0, 4) not in got  # distance 4 > k
        assert (3, 4) in got and got[(3, 4)] == 1  # 3 vs 4 differ by 1 bit

    def test_matches_brute_force(self, spark):
        """Operator output == brute-force all-pairs popcount filter (the
        pigeonhole banding loses nothing)."""
        import itertools
        import random

        rng = random.Random(7)
        us = [rng.getrandbits(64) for _ in range(60)]
        # plant close pairs (unsigned domain, then convert to int64)
        us[10] = us[0] ^ 0b101
        us[11] = us[1] ^ (1 << 63)  # flip sign bit
        sigs = [u - (1 << 64) if u >= (1 << 63) else u for u in us]
        df = spark.createDataFrame(list(enumerate(sigs)), ["id", "sig"])
        got = {(r.id_a, r.id_b) for r in dedup.hamming_pairs(df, k=3).collect()}
        want = {
            (a, b)
            for (a, sa), (b, sb) in itertools.combinations(enumerate(sigs), 2)
            if bin((sa ^ sb) & ((1 << 64) - 1)).count("1") <= 3
        }
        assert got == want

    def test_simhash_hamming_dedup_finds_near_dups(self, docs):
        pairs = dedup.simhash_hamming_dedup(docs, k=3)
        got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
        assert got.get((1, 2)) == 0  # identical docs: distance 0


class TestNgramJaccard:
    def test_blocked_pairs(self, docs):
        d = docs.withColumn("lang", F.lit("en"))
        pairs = dedup.ngram_jaccard_pairs(d, block_col="lang", threshold=0.5)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got and (1, 3) in got


class TestSimilarity:
    def test_topk_self_similarity(self, spark):
        # vec 0 IS the query vector -> must rank first with cos 1.0
        q = similarity.deterministic_query_vector(8, seed=3)
        rows = [(0, [float(x) for x in q]), (1, [float(-x) for x in q]), (2, [1.0] * 8)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        top = similarity.brute_force_topk(df, q, k=2).collect()
        assert top[0]["vec_id"] == 0 and top[0]["cos_sim"] == 1.0
        assert top[1]["cos_sim"] < 1.0

    def test_lsh_recall_on_fixture(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = similarity._QUERY_VEC
        exact = similarity.brute_force_topk(emb, q, k=10).collect()
        approx = similarity.lsh_topk(emb, q, k=10, n_planes=1).collect()
        # random fixture embeddings are near-orthogonal, so SRP recall is
        # modest; assert the semantic guarantees: full k returned, scores
        # bounded by the exact optimum, and non-trivial overlap at 1 plane
        # (~half the corpus in-bucket).
        assert len(approx) == 10
        assert approx[0]["cos_sim"] <= exact[0]["cos_sim"]
        overlap = {r["vec_id"] for r in exact} & {r["vec_id"] for r in approx}
        assert len(overlap) >= 2

    def test_ivf_topk_semantics(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = similarity._QUERY_VEC
        exact = similarity.brute_force_topk(emb, q, k=10).collect()
        approx = similarity.ivf_topk(emb, q, k=10, n_lists=8, n_probe=4).collect()
        # full k returned; scores bounded by the exact optimum; probing
        # half the lists on near-random embeddings must recover a
        # non-trivial share of the true top-k
        assert len(approx) == 10
        assert approx[0]["cos_sim"] <= exact[0]["cos_sim"]
        overlap = {r["vec_id"] for r in exact} & {r["vec_id"] for r in approx}
        assert len(overlap) >= 3

    def test_ivf_full_probe_is_exact(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = similarity._QUERY_VEC
        exact = [r["vec_id"] for r in similarity.brute_force_topk(emb, q, k=5).collect()]
        full = [
            r["vec_id"]
            for r in similarity.ivf_topk(emb, q, k=5, n_lists=8, n_probe=8).collect()
        ]
        assert full == exact  # probing every list degenerates to brute force

    def test_near_pairs_symmetric_dup(self, spark):
        v = [1.0, 2.0, 3.0, 4.0]
        df = spark.createDataFrame([(1, v), (2, v), (3, [-x for x in v])], ["vec_id", "embedding"])
        pairs = similarity.cosine_near_pairs(df, threshold=0.99, n_planes=2)
        got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in pairs.collect()}
        assert got.get((1, 2)) == 1.0
        assert (1, 3) not in got

    def test_multi_probe_recall_superset(self, spark):
        """probes=1 must find every same-bucket pair probes=0 finds,
        plus all pairs whose buckets differ in exactly one sign bit —
        and nothing with bucket distance > 1."""
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        base = similarity.cosine_near_pairs(emb, threshold=0.1, n_planes=8)
        probed = similarity.cosine_near_pairs(emb, threshold=0.1, n_planes=8, probes=1)
        got0 = {(r.id_a, r.id_b) for r in base.collect()}
        got1 = {(r.id_a, r.id_b) for r in probed.collect()}
        assert got0 <= got1
        assert len(got1) > len(got0)  # probing reaches 1-bit neighbors
        # no duplicate pairs from the probe explosion (asymmetric design)
        rows = probed.collect()
        assert len(rows) == len({(r.id_a, r.id_b) for r in rows})

    def test_adaptive_n_planes_formula(self):
        """Plane count tracks corpus size: ceil(log2(n^2/target)),
        clamped — so candidate pairs stay ~target regardless of n."""
        assert similarity.adaptive_n_planes(100) == 4  # clamp lo
        assert similarity.adaptive_n_planes(2_000) == 4
        n = 200_000
        p = similarity.adaptive_n_planes(n)
        # expected same-bucket pairs back under ~2x target after bucketing
        assert n * n / (1 << p) <= 2 * 500_000
        assert similarity.adaptive_n_planes(10**9) == 24  # clamp hi

    def test_adaptive_near_pairs_recall_vs_fixed(self, spark):
        """n_planes=None (self-tuned, multi-probe) must keep every pair
        the oracle-pinned fixed-plane configuration finds at this SF."""
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        fixed = similarity.cosine_near_pairs(emb, threshold=0.2, n_planes=6)
        auto = similarity.cosine_near_pairs(emb, threshold=0.2, n_planes=None)
        got_f = {(r.id_a, r.id_b) for r in fixed.collect()}
        got_a = {(r.id_a, r.id_b) for r in auto.collect()}
        # at 200 vectors the tuner picks the lo clamp (4 planes) with
        # probing, which reaches at least the fixed-6 pair set
        assert got_f <= got_a

    def test_multi_probe_finds_one_plane_straddlers(self, spark):
        """A near-identical pair that lands one hyperplane apart is the
        exact miss multi-probe exists to recover."""
        planes = similarity._hyperplanes(4, 4, 13)
        v = [0.5, 0.5, 0.5, 0.5]
        # nudge until the pair straddles exactly one plane
        import itertools

        def bucket(vec):
            b = 0
            for i, p in enumerate(planes):
                if sum(x * y for x, y in zip(vec, p)) >= 0:
                    b |= 1 << i
            return b

        w = None
        for eps in [0.02 * k for k in range(1, 200)]:
            cand = [v[0], v[1], v[2], v[3] - eps]
            d = bucket(v) ^ bucket(cand)
            if d and bin(d).count("1") == 1:
                w = cand
                break
        assert w is not None, "fixture construction failed"
        df = spark.createDataFrame([(1, v), (2, w)], ["vec_id", "embedding"])
        miss = similarity.cosine_near_pairs(df, threshold=0.5, n_planes=4)
        hit = similarity.cosine_near_pairs(df, threshold=0.5, n_planes=4, probes=1)
        assert not miss.collect()
        assert {(r.id_a, r.id_b) for r in hit.collect()} == {(1, 2)}


class TestText:
    def test_perplexity_split_quantile_matches_ntile_anchor(self, spark):
        """The 100 TB quantile-threshold split must agree with the
        oracle-checked ntile anchor: identical monotone semantics (every
        head NLL <= every middle NLL <= every tail NLL per language),
        tercile sizes within interpolation slack, >=95% identical
        labels (exact-boundary rows may differ by construction)."""
        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        a = text.perplexity_split(docs, method="ntile").withColumnRenamed(
            "split", "s_a"
        )
        b = text.perplexity_split(docs, method="quantile").withColumnRenamed(
            "split", "s_b"
        )
        j = a.join(b.select("doc_id", "s_b"), "doc_id")
        n = j.count()
        agree = j.filter(F.col("s_a") == F.col("s_b")).count()
        assert agree / n >= 0.95, f"label agreement {agree}/{n}"
        # monotone consistency of the quantile labels per language
        order = {"head": 0, "middle": 1, "tail": 2}
        rows = b.collect()
        by_lang: dict = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append((r["avg_nll"], order[r["s_b"]]))
        from collections import Counter

        for lang, vals in by_lang.items():
            vals.sort()
            labels = [t for _, t in vals]
            assert labels == sorted(labels), f"{lang}: non-monotone split"
            # tercile sizes within n/3 +- max(2, largest tie group):
            # thresholds put a whole boundary tie group on one side by
            # design, so the slack must scale with tie size, not a
            # constant (fixture regeneration could densify duplicates)
            c = Counter(labels)
            third = len(labels) / 3.0
            biggest_tie = max(Counter(nll for nll, _ in vals).values())
            slack = max(2, biggest_tie)
            assert all(abs(c[t] - third) <= slack for t in (0, 1, 2)), (lang, c)

    def test_perplexity_split_partitions_corpus_with_edge_docs(self, spark):
        """Empty/whitespace docs route to tail with NULL NLL; NULL-lang
        docs form their own group; BOTH methods output every input row
        exactly once."""
        rows = [
            (1, "the quick brown fox jumps high", "en"),
            (2, "a slower red fox naps today", "en"),
            (3, "many tokens for the third doc here", "en"),
            (4, "", "en"),            # unscorable -> tail, NULL nll
            (5, "   ", "en"),         # unscorable -> tail
            (6, "nul lang doc with words", None),
            (7, "another nul lang doc entirely", None),
            (8, "third null lang doc words here", None),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
        for method in ("ntile", "quantile"):
            out = {r["doc_id"]: r for r in text.perplexity_split(df, method=method).collect()}
            assert sorted(out) == [1, 2, 3, 4, 5, 6, 7, 8], method
            assert out[4]["split"] == "tail" and out[4]["avg_nll"] is None
            assert out[5]["split"] == "tail"
            # null-lang docs were ranked (not dropped) and span terciles
            null_lang_splits = {out[i]["split"] for i in (6, 7, 8)}
            assert null_lang_splits == {"head", "middle", "tail"}, method

    def test_token_count_and_stats(self, spark):
        df = spark.createDataFrame([(1, "a bb ccc"), (2, ""), (3, "   ")], ["doc_id", "text"])
        out = df.select("doc_id", text.token_count(F.col("text")).alias("n"))
        got = {r["doc_id"]: r["n"] for r in out.collect()}
        assert got == {1: 3, 2: 0, 3: 0}

    def test_lang_id_accuracy_on_fixture(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = docs.select("lang", text.lang_id(F.col("text")).alias("guess"))
        agg = out.groupBy().agg(
            F.sum(F.when(F.col("lang") == F.col("guess"), 1).otherwise(0)).alias("hit"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        # fixture text is synthetic word soup: just assert the operator
        # runs on all rows and yields only known labels
        labels = {r["guess"] for r in out.select("guess").distinct().collect()}
        assert labels <= set(text._LANG_MARKERS) | {"und"}
        assert agg["n"] == docs.count()

    def test_lang_id_frame_matches_column_form(self, spark):
        # the staged-projection frame form must produce byte-identical
        # guesses to the single-Column form it optimizes
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        col_form = {
            r["doc_id"]: r["g"]
            for r in docs.select("doc_id", text.lang_id(F.col("text")).alias("g")).collect()
        }
        frame_form = {
            r["doc_id"]: r["lang_guess"]
            for r in text.lang_id_frame(docs).select("doc_id", "lang_guess").collect()
        }
        assert col_form == frame_form

    def test_quality_bounds(self, spark):
        df = spark.createDataFrame([(1, "Normal sentence here."), (2, "!!!???;;;"), (3, "")], ["doc_id", "text"])
        out = {r["doc_id"]: r for r in text.quality_features(df).collect()}
        assert 0.0 <= out[1]["quality"] <= 1.0
        assert out[2]["punct_ratio"] > 0.5
        assert out[3]["n_tokens"] == 0

    def test_fingerprint_normalization(self, spark):
        df = spark.createDataFrame([(1, "Hello  World"), (2, "hello world "), (3, "other")], ["doc_id", "text"])
        out = {r["doc_id"]: r["fp"] for r in df.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()}
        assert out[1] == out[2]
        assert out[1] != out[3]


class TestMultimodal:
    def test_decode_features_roundtrip(self, spark):
        media = multimodal.synthesize_media(spark, n=30)
        feats = multimodal.decode_features(media)
        rows = feats.collect()
        assert len(rows) == 30
        assert all(len(r["sha256"]) == 64 and r["n_bytes"] == 128 for r in rows)
        # deterministic: same payload -> same sha
        again = {r["media_id"]: r["sha256"] for r in multimodal.decode_features(media).collect()}
        assert all(again[r["media_id"]] == r["sha256"] for r in rows)

    def test_frame_sample_counts(self, spark):
        media = multimodal.synthesize_media(spark, n=9)
        frames = multimodal.frame_sample(media, every_ms=250)
        per_video = frames.groupBy("media_id").count().collect()
        assert all(r["count"] == 5 for r in per_video)  # 0..1000 step 250


class TestApplyInPandas:
    def test_zscore_by_group(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)], ["g", "v"]
        )
        out = zscore_by_group(df, "g", "v").collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r["zscore"])
        assert sorted(round(z, 4) for z in by_g["a"]) == [-1.2247, 0.0, 1.2247]
        assert by_g["b"] == [0.0]


class TestPackSequences:
    def test_contiguous_fill_semantics(self, spark):
        from libcolumnfile_spark.operators.pipeline import pack_sequences

        # one group (n_groups=1) so the fill order is just doc_id order
        rows = [(i, "w " * 100) for i in range(1, 11)]  # 100 tokens each
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = pack_sequences(df, budget=250, n_groups=1).orderBy("doc_id").collect()
        # cumulative offsets 0,100,200,300,... -> packs 0,0,0,1,1,2,2,(700)2,3,3
        assert [r.pack_id for r in out] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
        assert all(r.n_tokens == 100 for r in out)

    def test_oversized_doc_starts_own_pack(self, spark):
        from libcolumnfile_spark.operators.pipeline import pack_sequences

        df = spark.createDataFrame(
            [(1, "w " * 600), (2, "w " * 10)], ["doc_id", "text"]
        )
        out = {r.doc_id: r.pack_id for r in pack_sequences(df, budget=256, n_groups=1).collect()}
        assert out[1] == 0  # starts at offset 0, overflows its pack
        assert out[2] == 2  # next doc starts at offset 600 -> pack 2

    def test_deterministic_across_runs(self, spark):
        from libcolumnfile_spark.operators.pipeline import pack_sequences

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(tuple(r) for r in pack_sequences(d).collect())
        b = sorted(tuple(r) for r in pack_sequences(d).collect())
        assert a == b


class TestContamination:
    def test_benchmark_doc_fully_contaminated(self, spark, docs):
        from libcolumnfile_spark.operators.pipeline import contamination_screen

        bench = docs.filter(F.col("doc_id") == 1)
        out = {r.doc_id: r for r in contamination_screen(docs, bench).collect()}
        assert out[1].contamination == 1.0  # doc 1 IS the benchmark
        assert out[2].contamination == 1.0  # exact duplicate of it
        assert 0 < out[3].contamination < 1  # near-dup: partial overlap
        assert 4 not in out and 5 not in out  # unrelated docs: no row

    def test_clean_corpus_empty(self, spark, docs):
        from libcolumnfile_spark.operators.pipeline import contamination_screen

        bench = spark.createDataFrame(
            [(99, "zzz qqq xxx yyy vvv www")], ["doc_id", "text"]
        )
        out = contamination_screen(docs, bench).filter(F.col("doc_id") != 99)
        assert out.count() == 0


class TestRepetition:
    def test_degenerate_repetition_flagged(self, spark):
        from libcolumnfile_spark.operators.text import repetition_stats

        df = spark.createDataFrame(
            [(1, "spam spam spam spam spam"), (2, "all words here are unique")],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in repetition_stats(df).collect()}
        assert out[1].dup_token_frac == 0.8 and out[1].top_token_share == 1.0
        assert out[2].dup_token_frac == 0.0 and out[2].top_token_share == 0.2


class TestWinnowFingerprint:
    def _prints(self, spark, docs):
        df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], ["doc_id", "text"])
        kernel = text.winnow_prints_kernel()
        rows = df.select("doc_id", kernel(F.col("text")).alias("p")).collect()
        return {r["doc_id"]: set(r["p"]) for r in rows}

    def test_identical_docs_identical_prints(self, spark):
        p = self._prints(spark, ["the quick brown fox jumps over the dog"] * 2)
        assert p[0] == p[1] and len(p[0]) > 0

    def test_shared_substring_guarantees_shared_print(self, spark):
        # winnowing guarantee (Schleimer et al.): any shared substring of
        # length >= k + w - 1 (= 11 chars) produces at least one shared
        # fingerprint, regardless of surrounding text
        shared = "abcdefghijklmnopqrstuvwxyz"  # 26 >= 11
        p = self._prints(
            spark,
            [f"XXXX {shared} YYYY", f"completely different prefix {shared} and suffix"],
        )
        assert p[0] & p[1]

    def test_disjoint_docs_disjoint_prints(self, spark):
        p = self._prints(spark, ["aaaaaaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbbbbbb"])
        assert not (p[0] & p[1])

    def test_short_and_empty_docs(self, spark):
        p = self._prints(spark, ["", "tiny", "exactly11ch"])
        assert p[0] == set() and p[1] == set()
        assert len(p[2]) == 1  # 11 chars = k+w-1 -> exactly one window

    def test_flat_batch_matches_scalar_reference(self, spark):
        # golden parity for the r11 flat-batch kernel: one concatenated
        # codepoint array per Arrow batch, with gram windows straddling
        # document boundaries computed but never sliced into any doc's
        # output. The reference below is an independent pure-Python
        # per-doc implementation of the same winnowing definition —
        # adjacent docs are chosen so that boundary-straddling windows
        # WOULD collide with real prints if the slicing were off by one.
        k, w, b, p_mod = (
            text._WINNOW_K,
            text._WINNOW_W,
            text._WINNOW_B,
            text._WINNOW_P,
        )

        def ref(s):
            cps = [ord(c) for c in s]
            n = len(cps) - (k - 1)
            if n <= 0:
                return []
            g = [
                sum(cps[i + j] * b**j for j in range(k)) % p_mod
                for i in range(n)
            ]
            m = n - (w - 1)
            if m <= 0:
                return []
            return sorted({min(g[i : i + w]) for i in range(m)})

        docs = [
            None,
            "",
            "ab",
            "abcdefgh",          # n=1, m<=0
            "abcdefghij",        # m=0 boundary
            "abcdefghijk",       # m=1
            "héllo wörld ünïcode text",
            "abcdefghijkabcdefghijk",  # internal repeat
            "kjihgfedcba",       # reversed: boundary with the previous doc
            "zzzzzzzzzzzzzzzz",
            "the quick brown fox jumps over the lazy dog",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
        )
        kernel = text.winnow_prints_kernel()
        got = {
            r["doc_id"]: list(r["p"])
            for r in df.select(
                "doc_id", kernel(F.col("text")).alias("p")
            ).collect()
        }
        for i, s in enumerate(docs):
            assert got[i] == ref(s or ""), f"doc {i}: {got[i]} != {ref(s or '')}"


class TestPassageDedup:
    def test_repeated_passage_kept_once(self, spark):
        # 8-token boilerplate chunk shared by docs 1 and 2 at chunk 0
        boiler = "one two three four five six seven eight"
        rows = [
            (1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
            (2, boiler + " iota kappa lambda mu nu xi omicron pi"),
            (3, "unique words only in this document here now"),
        ]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in dedup.passage_dedup(d).collect()}
        # doc 1 keeps both chunks; doc 2 loses the boilerplate chunk
        assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
        assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
        assert out[2]["clean_text"] == "iota kappa lambda mu nu xi omicron pi"
        assert out[3]["n_kept"] == 1

    def test_fully_duplicate_doc_dropped(self, spark):
        t = "a b c d e f g h"
        d = spark.createDataFrame([(1, t), (2, t)], ["doc_id", "text"])
        out = {r["doc_id"]: r for r in dedup.passage_dedup(d).collect()}
        assert 1 in out and 2 not in out  # doc 2 keeps zero passages

    def test_reassembly_preserves_order(self, spark):
        toks = [f"w{i}" for i in range(24)]  # 3 chunks, all unique
        d = spark.createDataFrame([(7, " ".join(toks))], ["doc_id", "text"])
        out = dedup.passage_dedup(d).collect()[0]
        assert out["clean_text"] == " ".join(toks)


class TestKnnJoin:
    def test_matches_brute_force_per_query(self, spark):
        import numpy as np

        rng = [similarity.deterministic_query_vector(8, seed=s) for s in range(30)]
        d = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(rng)],
            "vec_id: bigint, embedding: array<float>",
        )
        q = d.filter(F.col("vec_id") < 3)
        c = d.filter(F.col("vec_id") >= 3)
        got = similarity.knn_join(q, c, k=4).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["q_id"], []).append((r["rn"], r["c_id"], r["cos_sim"]))
        assert set(by_q) == {0, 1, 2}
        for q_id, lst in by_q.items():
            assert sorted(r[0] for r in lst) == [1, 2, 3, 4]
            # cross-check against the single-query brute force path
            qv = rng[q_id]
            brute = similarity.brute_force_topk(c, qv, k=4).collect()
            assert [r["vec_id"] for r in brute] == [
                c_id for _, c_id, _ in sorted(lst)
            ]


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        from datetime import datetime, timedelta

        from libcolumnfile_spark.operators.relational import sessionize

        t0 = datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, t0, 1.0),
            (1, t0 + timedelta(minutes=10), 2.0),
            (1, t0 + timedelta(minutes=50), 4.0),  # 40-min gap -> new session
            (2, t0, 8.0),
        ]
        d = spark.createDataFrame(rows, "user_id: bigint, ts: timestamp, value: double")
        out = {(r["user_id"], r["session_idx"]): r for r in sessionize(d).collect()}
        assert out[(1, 1)]["n_events"] == 2 and out[(1, 1)]["total_value"] == 3.0
        assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["total_value"] == 4.0
        assert out[(2, 1)]["n_events"] == 1

    def test_exact_gap_boundary_same_session(self, spark):
        from datetime import datetime, timedelta

        from libcolumnfile_spark.operators.relational import sessionize

        t0 = datetime(2024, 1, 1)
        rows = [(1, t0, 1.0), (1, t0 + timedelta(minutes=30), 1.0)]
        d = spark.createDataFrame(rows, "user_id: bigint, ts: timestamp, value: double")
        out = sessionize(d).collect()
        assert len(out) == 1 and out[0]["n_events"] == 2  # gap is strict >


class TestTfidfIndex:
    def test_tfidf_ranks_rare_terms_higher(self, spark):
        rows = [
            (1, "common rare"),
            (2, "common common common common"),
            (3, "common other other"),
        ]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        out = text.tfidf_topk(d, k=1).collect()
        top = {r["doc_id"]: r["tok"] for r in out}
        assert top[1] == "rare"  # equal tf: df=1 beats df=3
        assert top[3] == "other"

    def test_inverted_index_caps_postings(self, spark):
        rows = [(i, "shared unique%d" % i) for i in range(30)]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["tok"]: r for r in text.inverted_index(d, postings_cap=5).collect()}
        assert out["shared"]["df"] == 30
        assert out["shared"]["postings_head"] == "0,1,2,3,4"
        assert out["unique7"]["df"] == 1 and out["unique7"]["postings_head"] == "7"


class TestSimhashVerified:
    def test_identical_docs_group(self, spark):
        rows = [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "totally different words here"),
        ]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        out = dedup.simhash_verified_dedup(d).collect()
        assert len(out) == 1
        assert out[0]["group_size"] == 2 and out[0]["ids_csv"] == "1,2"

    def test_token_order_and_dup_invariant(self, spark):
        # SimHash over DISTINCT tokens: permutations and repeats of the
        # same token set share a signature
        rows = [
            (1, "alpha beta gamma delta"),
            (2, "delta gamma beta alpha alpha alpha"),
        ]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        out = dedup.simhash_verified_dedup(d).collect()
        assert len(out) == 1 and out[0]["ids_csv"] == "1,2"


class TestPairStrategyEquivalence:
    def test_kernel_and_join_paths_identical(self, spark):
        """The size-based strategy switch must be invisible: kernel and
        join paths produce the exact same (id_a, id_b, cos_sim) rows."""
        vecs = [similarity.deterministic_query_vector(16, seed=s) for s in range(120)]
        d = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id: bigint, embedding: array<float>",
        )
        kw = dict(threshold=0.2, n_planes=2)
        join_rows = sorted(
            map(tuple, similarity.cosine_near_pairs(d, kernel_min_pairs=10**12, **kw).collect())
        )
        kernel_rows = sorted(
            map(tuple, similarity.cosine_near_pairs(d, kernel_min_pairs=1, **kw).collect())
        )
        assert len(join_rows) > 5
        assert join_rows == kernel_rows


class TestIvfSeeded:
    def test_full_probe_equals_brute_force(self, spark, monkeypatch):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = similarity._QUERY_VEC
        monkeypatch.setattr(similarity, "_IVF_V_PROBE", similarity._IVF_V_LISTS)
        full = [r["vec_id"] for r in similarity.ivf_seeded_topk(emb, q, k=5).collect()]
        exact = [r["vec_id"] for r in similarity.brute_force_topk(emb, q, k=5).collect()]
        assert full == exact  # probing every list = exact search

    def test_partial_probe_bounded_by_exact(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = similarity._QUERY_VEC
        approx = similarity.ivf_seeded_topk(emb, q, k=10).collect()
        exact = similarity.brute_force_topk(emb, q, k=10).collect()
        assert len(approx) == 10
        assert approx[0]["cos_sim"] <= exact[0]["cos_sim"]
        assert all(r["list_id"] >= 0 for r in approx)


class TestTpchQ21Decorrelation:
    """q_tpch_q21's hand decorrelation (aggregate + window) must be
    row-identical to the literal EXISTS / NOT EXISTS formulation run by
    Spark itself — a second, independent check beside the DuckDB oracle
    (same SQL text, different engine)."""

    def test_equivalent_to_exists_formulation(self, spark):
        from libcolumnfile_spark.operators.tpch import _Q21_BODY
        from libcolumnfile_spark.registry import REGISTRY
        from libcolumnfile_spark.tables import load_table

        sf = "/root/testdata/sf0.001"
        for t in ("lineitem", "orders", "supplier", "nation"):
            load_table(spark, sf, t).createOrReplaceTempView(f"q21eq_{t}")
        literal = spark.sql(
            _Q21_BODY.format(
                supplier="q21eq_supplier",
                lineitem="q21eq_lineitem",
                orders="q21eq_orders",
                nation="q21eq_nation",
                day="DAYS",
            )
        )
        ours = REGISTRY["q_tpch_q21"].spark_fn(spark, sf)
        assert sorted(map(tuple, ours.collect())) == sorted(
            map(tuple, literal.collect())
        )


class TestBpe:
    """Distributed BPE trainer vs an independent single-node reference."""

    @staticmethod
    def _reference_bpe(texts, num_merges, min_count=2):
        """Plain-Python reference: same semantics, no Spark."""
        from collections import Counter

        words = Counter()
        for t in texts:
            for w in (t or "").strip().lower().split():
                if w:
                    words[w] += 1
        syms = {w: tuple(list(w) + ["</w>"]) for w in words}
        merges = []
        for rank in range(num_merges):
            pairs = Counter()
            for w, cnt in words.items():
                s = syms[w]
                for i in range(len(s) - 1):
                    pairs[(s[i], s[i + 1])] += cnt
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            (left, right), cnt = best
            if cnt < min_count:
                break
            merges.append((rank, left, right, cnt))
            from libcolumnfile_spark.operators.bpe import merge_word

            syms = {w: tuple(merge_word(list(s), left, right)) for w, s in syms.items()}
        return merges

    def test_train_matches_reference(self, spark):
        from libcolumnfile_spark.operators import bpe

        texts = [r["text"] for r in
                 spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                 .select("text").collect()]
        ref = self._reference_bpe(texts, num_merges=8)
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = bpe.train_bpe(df, num_merges=8)
        assert got == ref, (got[:3], ref[:3])

    def test_driver_and_distributed_paths_equal(self, spark):
        """The count-gated driver fast path and the distributed merge
        loop must produce the identical merge table."""
        from libcolumnfile_spark.operators import bpe

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        # 20 merges: deep enough that un-truncated lineage would OOM
        # (the union references syms twice per round), so this also pins
        # the per-round localCheckpoint + coalesce discipline
        fast = bpe.train_bpe(df, num_merges=20)
        dist = bpe.train_bpe(df, num_merges=20, driver_vocab_threshold=0)
        assert fast == dist

    def test_train_deterministic(self, spark):
        from libcolumnfile_spark.operators import bpe

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = bpe.train_bpe(df, num_merges=5)
        b = bpe.train_bpe(df, num_merges=5)
        assert a == b and len(a) == 5

    def test_merge_word_greedy_leftmost(self):
        from libcolumnfile_spark.operators.bpe import merge_word

        # non-overlapping leftmost-first: "aaa" with (a,a) -> ["aa","a"]
        assert merge_word(["a", "a", "a"], "a", "a") == ["aa", "a"]
        assert merge_word(["x", "a", "b", "a", "b"], "a", "b") == ["x", "ab", "ab"]
        assert merge_word(["q"], "a", "b") == ["q"]

    def test_segment_applies_merges_in_order(self, spark):
        from libcolumnfile_spark.operators import bpe

        df = spark.createDataFrame(
            [(1, "low lower lowest low")], ["doc_id", "text"]
        )
        merges = bpe.train_bpe(df, num_merges=4, min_count=1)
        seg = bpe.segment(df, merges).select("bpe_tokens").first()["bpe_tokens"]
        # segmentation must reproduce the trainer's end-state for a word
        # seen in training: rebuild "low</w>" via the reference path
        symbols = list("low") + ["</w>"]
        for _, l, r, _ in sorted(merges):
            symbols = bpe.merge_word(symbols, l, r)
        # tokens of the first "low" occurrence == trainer end-state
        assert seg[: len(symbols)] == symbols

    def test_query_entries_run(self, spark):
        from libcolumnfile_spark.registry import REGISTRY

        m = REGISTRY["q_bpe_train"].spark_fn(spark, "/root/testdata/sf0.001")
        rows = m.collect()
        assert 1 <= len(rows) <= 12
        assert rows[0]["rank"] == 0
        s = REGISTRY["q_bpe_segment"].spark_fn(spark, "/root/testdata/sf0.001")
        out = s.collect()
        assert len(out) == 500 and all(r["n_bpe_tokens"] > 0 for r in out)


class TestPq:
    """Product-quantization ANN: determinism, compression, recall."""

    def test_encode_shape_and_determinism(self, spark):
        from libcolumnfile_spark.operators import pq

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = pq.train_codebooks(emb, iters=2)
        assert cb.shape == (8, 16, 8)
        cb2 = pq.train_codebooks(emb, iters=2)
        import numpy as np

        assert np.array_equal(cb, cb2)
        codes = pq.pq_encode(emb, cb).collect()
        assert all(len(r["codes"]) == 8 for r in codes)
        assert all(0 <= c < 16 for r in codes for c in r["codes"])

    def test_adc_topk_recall_vs_brute(self, spark):
        from libcolumnfile_spark.operators import pq, similarity

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = similarity._QUERY_VEC
        cb = pq.train_codebooks(emb, iters=3)
        codes = pq.pq_encode(emb, cb)
        approx = pq.pq_topk(codes, cb, q, k=10).collect()
        exact = similarity.brute_force_topk(emb, q, k=10).collect()
        assert len(approx) == 10
        # ADC on 16x-compressed codes over near-random embeddings:
        # non-trivial overlap with the true top-k
        overlap = {r["vec_id"] for r in approx} & {r["vec_id"] for r in exact}
        assert len(overlap) >= 2, [r["vec_id"] for r in approx]

    def test_adc_reconstruction_bound(self, spark):
        """Scoring a vector that IS a reconstructed centroid combination
        must be exact: ADC(codes(v)) == dot(q, reconstruct(codes(v)))."""
        import numpy as np
        from libcolumnfile_spark.operators import pq

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = pq.train_codebooks(emb, iters=1)
        row = pq.pq_encode(emb, cb).first()
        q = [0.5] * 64
        got = pq.pq_topk(
            pq.pq_encode(emb, cb).filter(F.col("vec_id") == row["vec_id"]), cb, q, k=1
        ).first()["adc_score"]
        recon = np.concatenate([cb[i, row["codes"][i]] for i in range(8)])
        want = round(float(recon @ np.array(q)), 6)
        assert got == want

    def test_query_entry_runs(self, spark):
        from libcolumnfile_spark.registry import REGISTRY

        out = REGISTRY["q_sim_pq"].spark_fn(spark, "/root/testdata/sf0.001").collect()
        assert len(out) == 10

    def test_seeded_pq_matches_driver_reference(self, spark):
        """q_sim_pq_seeded's fused encode+ADC kernel vs a pure-numpy
        driver-side reference over the same seeded codebooks: identical
        codes and scores for the top-k (the DuckDB oracle re-proves this
        independently at the correctness gate; this pins the kernel
        against plan/partitioning changes without needing DuckDB)."""
        import numpy as np
        from libcolumnfile_spark.operators import pq, similarity

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = similarity._QUERY_VEC
        got = pq.pq_seeded_topk(emb, q, k=10).collect()
        assert len(got) == 10

        rows = [
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
            for r in emb.collect()
            if r["embedding"] is not None
        ]
        cb = pq._seeded_codebooks(64, pq._PQ_V_M, pq._PQ_V_KSUB, pq._PQ_V_SEED)
        lut = pq._pq_lut(cb, q)
        ref = []
        for vid, v in rows:
            score, codes = 0.0, []
            for i in range(pq._PQ_V_M):
                sub = 64 // pq._PQ_V_M
                best_d, best_c = float("inf"), 0
                for c in range(pq._PQ_V_KSUB):
                    acc = 0.0
                    for p in range(sub):
                        d = v[i * sub + p] - cb[i, c, p]
                        acc += d * d
                    if acc < best_d:
                        best_d, best_c = acc, c
                codes.append(best_c)
                score += lut[i][best_c]
            ref.append((vid, "-".join(map(str, codes)), round(score, 6)))
        ref.sort(key=lambda t: (-t[2], t[0]))
        want = ref[:10]
        assert [(r["vec_id"], r["codes_str"], r["adc_score"]) for r in got] == want


class TestCorpusCleaning:
    def test_boilerplate_dropped_everywhere(self, spark):
        """A chunk shared by >= min_df docs must vanish from ALL of them
        (vs passage_dedup's keep-first), and per-doc counts must agree."""
        from libcolumnfile_spark.operators.text import boilerplate_removal

        boiler = "copyright acme corp all rights reserved navigation menu"
        rows = [(i, f"{boiler} unique{i} body text number {i} words here pad pad pad pad pad{i}") for i in range(6)]
        rows.append((99, "a fully unique document with no shared chunks at all present"))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in boilerplate_removal(df, min_df=5).collect()}
        for i in range(6):
            assert out[i]["n_boiler"] >= 1, out[i]
            assert "copyright" not in out[i]["clean_text"]
            assert f"unique{i}" in out[i]["clean_text"]
        assert out[99]["n_boiler"] == 0
        assert out[99]["clean_text"].startswith("a fully unique")

    def test_gopher_rules_flags(self, spark):
        from libcolumnfile_spark.operators.text import gopher_rules

        rows = [
            (1, "the cat and the dog ran to the house in the garden today"),  # keep
            (2, "short text"),                            # too few tokens
            (3, " ".join(["word"] * 50)),                 # unique_frac fails
            (4, " ".join("supercalifragilisticexpialidocious" for _ in range(20))),  # mean len + unique fail
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
        assert out[1]["keep"] is True
        assert out[2]["ok_count"] is False and out[2]["keep"] is False
        assert out[3]["ok_unique"] is False and out[3]["keep"] is False
        assert out[4]["ok_len"] is False and out[4]["keep"] is False


class TestCountMinSketch:
    def test_one_sided_error_and_exact_on_unique_cells(self, spark):
        """CMS guarantee: est >= true for every queried item; with a
        width comfortably above the distinct-item count the estimates
        are exact (no collisions to inflate them)."""
        from libcolumnfile_spark.operators.aggregates import (
            cms_estimate,
            count_min_sketch,
        )

        rows = [(w,) for w, n in [("a", 50), ("b", 30), ("c", 7), ("d", 1)] for _ in range(n)]
        items = spark.createDataFrame(rows, "item string")
        sketch = count_min_sketch(items, "item", depth=3, width=512)
        q = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("zz",)], "item string")
        est = {r["item"]: r["cms_est"] for r in cms_estimate(sketch, q, "item", 3, 512).collect()}
        true = {"a": 50, "b": 30, "c": 7, "d": 1, "zz": 0}
        for k, t in true.items():
            assert est[k] >= t, (k, est[k], t)
        # 4 distinct items in 512 buckets: collisions vanish, est exact
        assert est == true

    def test_collisions_inflate_never_deflate(self, spark):
        """Squeeze 64 distinct items into width=4: heavy collisions —
        every estimate must still dominate its true count."""
        from libcolumnfile_spark.operators.aggregates import (
            cms_estimate,
            count_min_sketch,
        )

        rows = [(f"w{i}",) for i in range(64) for _ in range(i % 5 + 1)]
        items = spark.createDataFrame(rows, "item string")
        sketch = count_min_sketch(items, "item", depth=3, width=4)
        q = spark.createDataFrame([(f"w{i}",) for i in range(64)], "item string")
        est = {r["item"]: r["cms_est"] for r in cms_estimate(sketch, q, "item", 3, 4).collect()}
        for i in range(64):
            assert est[f"w{i}"] >= i % 5 + 1

    def test_sketch_size_bounded(self, spark):
        """The sketch never exceeds depth*width rows no matter the
        input cardinality — the bounded-shuffle contract."""
        from libcolumnfile_spark.operators.aggregates import count_min_sketch

        rows = [(f"tok{i}",) for i in range(2000)]
        items = spark.createDataFrame(rows, "item string")
        assert count_min_sketch(items, "item", depth=3, width=16).count() <= 3 * 16


class TestSemDedup:
    """semdedup must agree with a brute-force evaluation of its own rule:
    remove v iff some smaller-id vector in v's cluster has
    round(cos, 6) >= threshold."""

    def test_matches_brute_force_rule(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = emb.select("vec_id", "embedding").collect()
        import numpy as np

        cents = similarity._ivf_seeded_centroids(len(rows[0]["embedding"]))
        C = np.asarray(cents, dtype=np.float64)
        vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
        assign = {i: int(np.argmax(C @ v)) for i, v in vecs.items()}
        unit = {
            i: (v / np.linalg.norm(v) if np.linalg.norm(v) > 0 else v * 0.0)
            for i, v in vecs.items()
        }
        tau = 0.2
        expected = set()
        for i in vecs:
            dominated = any(
                j < i
                and assign[j] == assign[i]
                and round(float(unit[i] @ unit[j]), 6) >= tau
                for j in vecs
            )
            if not dominated:
                expected.add(i)
        got = {
            r["vec_id"]: r["list_id"]
            for r in similarity.semdedup(emb, threshold=tau).collect()
        }
        assert set(got) == expected
        assert all(got[i] == assign[i] for i in got)

    def test_threshold_one_keeps_everything_distinct(self, spark):
        # cos >= 1.0 only for (near-)identical unit vectors; the fixture
        # has none, so nothing is removed
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        n = emb.count()
        assert similarity.semdedup(emb, threshold=1.0).count() == n

    def test_removes_planted_duplicate(self, spark):
        base = [1.0, 0.0, 0.0, 0.5]
        near = [0.99, 0.01, 0.0, 0.5]
        far = [-1.0, 0.5, 0.2, -0.3]
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)],
            "vec_id BIGINT, embedding ARRAY<FLOAT>",
        )
        kept = {r["vec_id"] for r in similarity.semdedup(df, threshold=0.95).collect()}
        assert 1 in kept and 3 in kept
        # 2 is near-identical to 1; removed iff they share a cluster
        # (they do for these vectors: same argmax centroid)
        assert 2 not in kept


    def test_auto_cluster_count_scales_with_corpus(self, spark):
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        n = emb.count()
        auto = similarity.semdedup(emb, threshold=0.2, n_lists=None).collect()
        # ~sqrt(N) clusters: every assigned list id stays within range,
        # and survivors obey the same brute-force rule under that count
        n_lists = max(1, int(np.sqrt(n)))
        assert all(0 <= r["list_id"] < n_lists for r in auto)
        cents = similarity._ivf_seeded_centroids(
            len(emb.first()["embedding"]), n_lists
        )
        C = np.asarray(cents, dtype=np.float64)
        vecs = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()
        }
        assign = {i: int(np.argmax(C @ v)) for i, v in vecs.items()}
        unit = {i: v / np.linalg.norm(v) for i, v in vecs.items()}
        expected = {
            i
            for i in vecs
            if not any(
                j < i and assign[j] == assign[i]
                and round(float(unit[i] @ unit[j]), 6) >= 0.2
                for j in vecs
            )
        }
        assert {r["vec_id"] for r in auto} == expected

    def test_chain_semantics_not_transitive_closure(self, spark):
        """SemDeDup's rule is 'exists an EARLIER near-dup', not connected
        components: in a chain A~B, B~C, C!~A (same cluster), B is
        removed by A and C is removed by B even though B itself was
        removed — only A survives. Pinning this distinguishes the
        operator from q_dedup_embedding's transitive clustering.

        Construction: centroid 0 of the dim-8 seeded quantizer with a
        fixed orthogonal axis whose 0/35/70-degree arc stays inside one
        argmax cell (searched offline, asserted below); cos(35) ~ 0.819
        >= 0.8 links the chain, cos(70) ~ 0.342 < 0.8 breaks A~C."""
        import numpy as np

        dim = 8
        cents = similarity._ivf_seeded_centroids(dim, 16)
        C = np.asarray(cents)
        c0 = C[0] / np.linalg.norm(C[0])
        rng = np.random.RandomState(9)
        o = rng.randn(dim)
        o -= (o @ c0) * c0
        o /= np.linalg.norm(o)

        def rot(deg):
            t = np.deg2rad(deg)
            return (np.cos(t) * c0 + np.sin(t) * o).tolist()

        vecs = {1: rot(0), 2: rot(35), 3: rot(70)}
        # premise: one arc, one cell
        assert len({int(np.argmax(C @ np.asarray(v))) for v in vecs.values()}) == 1
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        )
        kept = {r["vec_id"] for r in similarity.semdedup(df, threshold=0.8).collect()}
        assert kept == {1}

    def test_null_and_empty_corpora(self, spark):
        # null-first row must not poison the dim probe; all-null and
        # empty corpora return an empty result instead of crashing
        rows = [(1, None), (2, [1.0, 0.0, 0.0, 0.5]), (3, [-1.0, 0.5, 0.2, -0.3])]
        df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
        kept = {r["vec_id"] for r in similarity.semdedup(df, threshold=0.99).collect()}
        assert kept == {2, 3}  # null dropped, dissimilar pair survives
        empty = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<FLOAT>")
        assert similarity.semdedup(empty).count() == 0
        allnull = spark.createDataFrame([(1, None)], "vec_id BIGINT, embedding ARRAY<FLOAT>")
        assert similarity.semdedup(allnull).count() == 0


class TestClassifierFilter:
    def test_score_is_mean_bucket_weight(self, spark):
        import hashlib

        w = text._clf_weights()

        def bucket(tok: str) -> int:
            return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % text._CLF_DIM

        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "Alpha  ALPHA alpha")],
            "doc_id BIGINT, text STRING",
        )
        got = {
            r["doc_id"]: r["s"]
            for r in df.select(
                "doc_id", text.classifier_score(F.col("text")).alias("s")
            ).collect()
        }
        for doc_id, raw in [(1, "alpha beta gamma"), (2, "alpha alpha alpha")]:
            toks = raw.lower().split()
            expected = round(sum(w[bucket(t)] for t in toks) / len(toks), 6)
            assert got[doc_id] == pytest.approx(expected, abs=1e-9)

    def test_custom_weights_select_known_docs(self, spark):
        # an all-positive weight vector keeps everything; all-negative none
        df = spark.createDataFrame(
            [(1, "some words here"), (2, "other words")],
            "doc_id BIGINT, text STRING",
        )
        pos = df.filter(
            text.classifier_score(F.col("text"), weights=[1.0] * text._CLF_DIM) >= 0
        )
        neg = df.filter(
            text.classifier_score(F.col("text"), weights=[-1.0] * text._CLF_DIM) >= 0
        )
        assert pos.count() == 2 and neg.count() == 0


class TestQuantizeInt8:
    def test_error_bounded_by_half_scale(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = similarity.quantize_int8_stats(emb).collect()
        assert len(rows) == emb.count()
        for r in rows:
            # nearest-code reconstruction error is at most scale/2
            # (both values carry round(6), so allow one 1e-6 quantum)
            assert r["max_abs_err"] <= r["scale"] / 2 + 1e-6
            assert 0 <= r["rmse"] <= r["max_abs_err"] + 1e-6

    def test_matches_numpy_reference(self, spark):
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        got = {r["vec_id"]: r for r in similarity.quantize_int8_stats(emb).collect()}
        for r in emb.limit(20).collect():
            v = np.asarray(r["embedding"], dtype=np.float64)
            amax = np.abs(v).max()
            scale = amax / 127.0 if amax > 0 else 1.0
            err = v - np.floor(v / scale + 0.5) * scale
            g = got[r["vec_id"]]
            assert g["scale"] == pytest.approx(round(scale, 6), abs=1e-9)
            assert g["max_abs_err"] == pytest.approx(round(float(np.abs(err).max()), 6), abs=1e-9)
            assert g["rmse"] == pytest.approx(round(float(np.sqrt((err**2).sum() / len(v))), 6), abs=1e-9)


class TestLmPerplexity:
    def test_rare_tokens_score_higher(self, spark):
        rows = [(i, "common common common") for i in range(1, 9)] + [
            (9, "zzyzx qwfpgj vbnmk")  # three singleton tokens
        ]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        got = {r["doc_id"]: r["avg_nll"] for r in text.lm_nll_scores(df).collect()}
        assert got[9] > got[1]  # out-of-distribution doc scores worse
        assert all(got[i] == got[1] for i in range(2, 9))  # identical docs tie

    def test_matches_python_reference(self, spark):
        import math
        from collections import Counter

        rows = [(1, "a b b"), (2, "b c"), (3, "a a a a")]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        toks = {i: t.split() for i, t in rows}
        cnt = Counter(tok for ts in toks.values() for tok in ts)
        N, V = sum(cnt.values()), len(cnt)
        expected = {
            i: round(
                sum(-math.log((cnt[t] + 1.0) / (N + V)) for t in ts) / len(ts), 6
            )
            for i, ts in toks.items()
        }
        got = {r["doc_id"]: r["avg_nll"] for r in text.lm_nll_scores(df).collect()}
        assert got == {i: pytest.approx(v, abs=1e-9) for i, v in expected.items()}


class TestSpanDedup:
    def _pairs(self, spark, rows, **kw):
        from libcolumnfile_spark.operators.text import span_dedup_pairs

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            (r.doc_a, r.doc_b): r.coverage
            for r in span_dedup_pairs(df, **kw).collect()
        }

    def test_copied_span_pairs_documents(self, spark):
        # docs 1 and 2 share a long copied span (>> k+w-1 chars) that
        # dominates the smaller doc's print set; doc 3 is unrelated
        span = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, span),
            (2, span + " with a short unique suffix"),
            (3, "entirely different content with no overlap whatsoever here"),
        ]
        out = self._pairs(spark, rows)
        assert (1, 2) in out and out[(1, 2)] >= 0.5
        assert all(3 not in p for p in out)

    def test_stop_print_suppression_bounds_pairs(self, spark):
        # the same text in max_df+2 docs: every print's posting list
        # exceeds max_df, so NO pairs emerge (boilerplate suppression) —
        # with a higher cap the clique appears
        rows = [(i, "shared boilerplate license header text here") for i in range(6)]
        assert self._pairs(spark, rows, max_df=4) == {}
        dense = self._pairs(spark, rows, max_df=16)
        assert len(dense) == 6 * 5 // 2
        assert all(c == 1.0 for c in dense.values())

    def test_pair_ordering_canonical(self, spark):
        span = "a long enough shared sentence for winnowing fingerprints"
        out = self._pairs(spark, [(9, span), (2, span)])
        assert list(out) == [(2, 9)]


class TestIncrementalDedup:
    def test_store_screen_and_batch_collapse(self, spark):
        from libcolumnfile_spark.operators.dedup import incremental_dedup

        store = spark.createDataFrame(
            [
                (100, "the quick brown fox jumps over the lazy dog"),
                (101, "an unrelated historical document lives here"),
            ],
            ["doc_id", "text"],
        )
        batch = spark.createDataFrame(
            [
                # exact duplicate of store doc 100 -> dropped (hash screen)
                (1, "the quick brown fox jumps over the lazy dog"),
                # two exact copies + novel -> one survivor, dup_count 2
                (2, "a genuinely new document about spark engines"),
                (3, "a genuinely new document about spark engines"),
                # novel singleton
                (4, "completely fresh content never seen before"),
            ],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in incremental_dedup(batch, store).collect()}
        assert set(out) == {2, 4}
        assert out[2].dup_count == 2 and out[4].dup_count == 1

    def test_short_doc_exact_dup_caught_by_hash_screen(self, spark):
        from libcolumnfile_spark.operators.dedup import incremental_dedup

        # short docs (< shingle_n tokens) carry per-id signature keys, so
        # only the content-hash screen can catch their exact duplicates
        store = spark.createDataFrame([(50, "tiny doc")], ["doc_id", "text"])
        batch = spark.createDataFrame(
            [(1, "tiny doc"), (2, "other tiny")], ["doc_id", "text"]
        )
        out = [r.doc_id for r in incremental_dedup(batch, store).collect()]
        assert out == [2]


class TestPageRank:
    def _ranks(self, spark, edges, **kw):
        from libcolumnfile_spark.operators.graph import pagerank

        df = spark.createDataFrame(edges, ["src", "dst", "w"])
        return {r.node: r.rank for r in pagerank(df, **kw).collect()}

    def test_mass_conserved(self, spark):
        # dangling redistribution keeps total rank mass at exactly 1
        edges = [("a", "b", 1), ("b", "c", 2), ("a", "c", 1)]  # c dangles
        r = self._ranks(spark, edges)
        assert abs(sum(r.values()) - 1.0) < 1e-4
        # c receives from both a and b (and dangles its own mass back)
        assert r["c"] > r["b"] > 0

    def test_symmetric_cycle_uniform(self, spark):
        # a 3-cycle with equal weights is rank-uniform at every iteration
        edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
        r = self._ranks(spark, edges, n_iter=5)
        assert r["a"] == r["b"] == r["c"] == round(1 / 3, 6)

    def test_weight_bias(self, spark):
        # b's inbound weight dominates c's -> b outranks c
        edges = [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
        r = self._ranks(spark, edges)
        assert r["b"] > r["c"]

    def test_sparse_checkpoints_release_every_round_cache(self, spark):
        # checkpoint_every=2 with n_iter=3: rounds 1 and 3 persist a
        # contrib frame that is NOT immediately checkpointed — all of
        # them (batch-released at the round-2 checkpoint, tail-flushed
        # at return) must leave the CacheManager by the time pagerank
        # returns, or back-to-back queries accumulate entries until
        # bench's assert_cache_hygiene fires
        cm = spark._jsparkSession.sharedState().cacheManager()
        before = cm.cachedData().size()
        edges = [("a", "b", 1), ("b", "c", 2), ("a", "c", 1)]
        r = self._ranks(spark, edges, n_iter=3, checkpoint_every=2)
        assert abs(sum(r.values()) - 1.0) < 1e-4
        assert cm.cachedData().size() == before


class TestContainmentDedup:
    def _pairs(self, spark, rows, **kw):
        from libcolumnfile_spark.operators.dedup import containment_pairs

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(df, **kw).collect()
        }

    def test_subset_doc_contained_in_superset(self, spark):
        short = "alpha beta gamma delta epsilon zeta"
        rows = [
            (1, short),
            (2, short + " plus much longer trailing content here now with extra words"),
            (3, "completely unrelated text with different tokens entirely present"),
        ]
        out = self._pairs(spark, rows)
        # full subset: every gram of 1 is in 2 -> containment 1.0; the
        # asymmetric direction (2 in 1) fails the length prefilter
        assert out[(1, 2)] == 1.0
        assert (2, 1) not in out
        assert all(3 not in p for p in out)

    def test_jaccard_blind_containment_caught(self, spark):
        # low-Jaccard high-containment pair: |A|=4 grams inside |B|=30+
        a = "one two three four five six"
        filler = " ".join(f"w{i}" for i in range(40))
        out = self._pairs(spark, [(1, a), (2, a + " " + filler)])
        assert out[(1, 2)] == 1.0

    def test_threshold_gates_partial_overlap(self, spark):
        # ~0.4 of A's grams in B: always below the 0.8 cut. (At lower
        # thresholds recall is the DECLARED probabilistic >= t anchor
        # bound, not a certainty — only containment -> 1 pairs are
        # guaranteed, which tests 1-2 pin.)
        a = "p q r s t u v w x y"           # grams over these tokens
        b = "p q r s t filler1 filler2 filler3 filler4 filler5 filler6"
        out8 = self._pairs(spark, [(1, a), (2, b)])
        assert (1, 2) not in out8


class TestVocabCoverage:
    def test_oov_counts(self, spark):
        from libcolumnfile_spark.operators.pipeline import vocab_coverage

        # vocab k=2 -> {"a", "b"} (a x4, b x3); "zz"/"q" are OOV
        rows = [
            (1, "a a b zz"),
            (2, "a b q"),
            (3, "a b a"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
            for r in vocab_coverage(df, k=2).collect()
        }
        assert out[1] == (4, 1, 0.25)
        assert out[2] == (3, 1, round(1 / 3, 6))
        assert out[3] == (3, 0, 0.0)

    def test_vocab_cut_is_deterministic_on_count_ties(self, spark):
        from libcolumnfile_spark.operators.pipeline import vocab_coverage

        # four tokens with count 1 each, k=2: (cnt desc, token asc)
        # keeps {"a", "b"}; "c"/"d" are OOV regardless of input order
        df = spark.createDataFrame([(1, "d c b a")], ["doc_id", "text"])
        (r,) = vocab_coverage(df, k=2).collect()
        assert (r.n_tokens, r.n_oov) == (4, 2)


class TestRRFFuse:
    def _fuse(self, spark, a_rows, b_rows, **kw):
        from libcolumnfile_spark.operators.text import rrf_fuse

        a = spark.createDataFrame(a_rows, ["doc_id", "sa"])
        b = spark.createDataFrame(b_rows, ["doc_id", "sb"])
        return {
            r.doc_id: r.rrf for r in rrf_fuse([(a, "sa"), (b, "sb")], **kw).collect()
        }

    def test_consensus_beats_single_list_head(self, spark):
        # doc 1 tops list A only; doc 2 is #2 in BOTH -> doc 2 wins
        out = self._fuse(
            spark,
            [(1, 10.0), (2, 5.0), (3, 1.0)],
            [(4, 9.0), (2, 8.0), (5, 7.0)],
            k_const=1.0,
        )
        # doc2: 1/(1+2) + 1/(1+2) = 2/3; doc1: 1/(1+1) = 1/2
        assert out[2] == round(2 / 3, 6)
        assert out[1] == 0.5
        assert out[2] > out[1] > out[3]

    def test_absent_list_contributes_zero(self, spark):
        out = self._fuse(spark, [(1, 1.0)], [(2, 1.0)], k_const=1.0)
        # both docs are rank 1 in exactly one list
        assert out[1] == out[2] == 0.5

    def test_rank_ties_break_by_id(self, spark):
        # equal scores: doc 3 must rank ahead of doc 7 by id tie-break
        out = self._fuse(spark, [(7, 1.0), (3, 1.0)], [(3, 1.0)], k_const=1.0)
        assert out[3] > out[7]


class TestANNRecall:
    def test_zero_planes_is_full_probe_recall_one(self, spark):
        # with no hyperplanes every vector lands in bucket 0, the
        # approximate arm degenerates to exact brute force, and recall
        # must be exactly 1.0 for every query — the same identity the
        # IVF full-probe test pins
        from libcolumnfile_spark.operators.similarity import ann_recall

        emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        out = ann_recall(
            emb.filter("vec_id < 4"),
            emb.filter("vec_id >= 4"),
            k=5,
            n_planes=0,
        ).collect()
        assert len(out) == 4
        assert all(r.recall == 1.0 and r.n_hit == r.n_exact == 5 for r in out)

    def test_recall_bounded_and_counts_consistent(self, spark):
        from libcolumnfile_spark.operators.similarity import ann_recall

        emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        for r in ann_recall(
            emb.filter("vec_id < 8"), emb.filter("vec_id >= 8")
        ).collect():
            assert 0.0 <= r.recall <= 1.0
            assert r.n_hit <= min(r.n_exact, r.n_approx)


class TestRandomProjection:
    def test_one_hot_vector_reads_matrix_row(self, spark):
        # projecting a one-hot vector must return exactly the (scaled)
        # j-th plane's component at the hot index — pins the matrix
        # derivation and the fold arithmetic in one identity
        import math

        from libcolumnfile_spark.operators.similarity import (
            _PROJ_SEED,
            deterministic_query_vector,
            random_projection,
        )

        dim, out_dim, hot = 16, 4, 3
        onehot = [0.0] * dim
        onehot[hot] = 1.0
        df = spark.createDataFrame([(1, onehot)], ["vec_id", "embedding"])
        got = {
            r.j: r.comp
            for r in random_projection(df, out_dim=out_dim, dim=dim).collect()
        }
        scale = 1.0 / math.sqrt(out_dim)
        for j in range(out_dim):
            plane = deterministic_query_vector(dim, seed=_PROJ_SEED * 1000 + j)
            assert got[j] == round(plane[hot] * scale, 6)


class TestRound9Profiling:
    def test_dup_cluster_stats_counts(self, spark):
        from libcolumnfile_spark.operators.dedup import dup_cluster_stats

        rows = (
            [(i, "unique text %d" % i) for i in range(6)]
            + [(10 + i, "twice") for i in range(2)]
            + [(20 + i, "thrice") for i in range(3)]
        )
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["cluster_size"]: r for r in dup_cluster_stats(df).collect()}
        assert out[1]["n_clusters"] == 6 and out[1]["redundant_docs"] == 0
        assert out[2]["n_clusters"] == 1 and out[2]["redundant_docs"] == 1
        assert out[3]["n_clusters"] == 1 and out[3]["redundant_docs"] == 2
        assert sum(r["n_docs"] for r in out.values()) == 11

    def test_ngram_novelty_shared_vs_unique(self, spark):
        from libcolumnfile_spark.operators.text import ngram_novelty

        shared = "alpha beta gamma delta epsilon"  # one 5-gram, in both docs
        rows = [
            (1, shared + " zeta eta theta iota kappa"),
            (2, shared),
            (3, "mu nu xi omicron pi rho"),
            (4, "too short"),  # < 5 tokens: excluded
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
        assert set(out) == {1, 2, 3}
        # doc 2 IS the shared gram: 1 gram, 0 novel
        assert out[2]["n_grams"] == 1 and out[2]["n_novel"] == 0
        # doc 3 is fully novel
        assert out[3]["novelty"] == 1.0
        # doc 1: 6 grams, only the first (shared with doc 2) not novel
        assert out[1]["n_grams"] == 6 and out[1]["n_novel"] == 5

    def test_embedding_drift_identical_groups_cos_one(self, spark):
        from libcolumnfile_spark.operators.similarity import embedding_drift

        emb = spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0]) for i in range(4)],
            ["vec_id", "embedding"],
        )
        docs = spark.createDataFrame(
            [(i, "en" if i % 2 else "fr") for i in range(4)],
            ["doc_id", "lang"],
        )
        out = {r["grp"]: r for r in embedding_drift(emb, docs).collect()}
        # every vector identical: both group centroids == global centroid
        assert out["en"]["cos_to_global"] == 1.0
        assert out["fr"]["cos_to_global"] == 1.0
        assert out["en"]["n_vecs"] == 2


class TestRound9Analytics:
    def test_minhash_collapse_same_and_cross_pairs(self, spark):
        """Gram-set collapse must not change the emitted pair set:
        exact clones pair at jaccard 1.0 (the cheap identity arm), and
        near-dups with DIFFERENT gram sets still go through the real
        verify with the member-level jaccard value."""
        from libcolumnfile_spark.operators.dedup import minhash_exact_dedup

        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, base),
            (2, base),                     # exact clone of 1
            (3, base + " iota"),           # near-dup, different gram set
            (4, "one two three four five six seven eight nine"),  # unrelated
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            (r["id_a"], r["id_b"]): r["jaccard_sim"]
            for r in minhash_exact_dedup(df, threshold=0.0).collect()
        }
        assert out[(1, 2)] == 1.0  # identity arm
        # cross-set arm: (1,3) and (2,3) only exist if their SIGNATURES
        # match (one band over the whole signature); whatever subset
        # appears must carry the true member-level jaccard, and both
        # clones must agree with each other
        if (1, 3) in out or (2, 3) in out:
            assert out.get((1, 3)) == out.get((2, 3))
            assert 0 < out[(1, 3)] < 1.0
        assert (1, 4) not in out and (2, 4) not in out

    def test_hits_mutual_reinforcement(self, spark):
        """A node pointed at by every hub must out-score authorities with
        a single in-edge; scores L1-normalize; pure hubs have auth 0."""
        from libcolumnfile_spark.operators.graph import hits

        edges = [
            ("h1", "star", 1), ("h2", "star", 1), ("h3", "star", 1),
            ("h1", "minor", 1),
        ]
        df = spark.createDataFrame(edges, ["src", "dst", "w"])
        out = {r["node"]: r for r in hits(df).collect()}
        assert out["star"]["auth"] > out["minor"]["auth"] > 0
        assert out["star"]["hub"] == 0.0 and out["h2"]["auth"] == 0.0
        assert abs(sum(r["auth"] for r in out.values()) - 1.0) < 1e-4
        assert abs(sum(r["hub"] for r in out.values()) - 1.0) < 1e-4
        # h1 points at both authorities: strictly the best hub
        assert out["h1"]["hub"] > out["h2"]["hub"]

    def test_topic_words_distinctive_terms(self, spark):
        from libcolumnfile_spark.operators.text import topic_words

        rows = [(i, "srcA", "common filler tokens apple apple apple apple apple") for i in range(3)]
        rows += [(10 + i, "srcB", "common filler tokens banana banana banana banana banana") for i in range(3)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = topic_words(df, topk=1, min_count=3).collect()
        top = {r["source"]: r["token"] for r in out}
        assert top == {"srcA": "apple", "srcB": "banana"}
        assert all(r["rnk"] == 1 for r in out)

    def test_langid_confusion_diagonal_recall(self, spark):
        from libcolumnfile_spark.operators.text import langid_confusion

        rows = [
            (1, "en", "the quick brown fox and the lazy dog with a the and"),
            (2, "en", "xyzzy qwerty plugh"),  # no markers -> und
        ]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        out = {(r["lang"], r["lang_guess"]): r for r in langid_confusion(df).collect()}
        assert out[("en", "en")]["n_docs"] == 1
        assert out[("en", "und")]["n_docs"] == 1
        assert out[("en", "en")]["frac"] == 0.5


class TestSparseSim:
    def test_cosine_matches_dense_reference(self, spark):
        """sparse_cosine_pairs vs a driver-side dense TF-IDF cosine over
        the same tokenization: identical pair set and values (df_cap set
        above every df so capping doesn't hide pairs)."""
        import math
        from collections import Counter

        from libcolumnfile_spark.operators.text import sparse_cosine_pairs

        rows = [
            (1, "apple banana cherry apple"),
            (2, "apple banana durian"),
            (3, "elderberry fig grape"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in sparse_cosine_pairs(df, df_cap=100, threshold=0.0).collect()
        }

        docs = {i: Counter(t.split()) for i, t in rows}
        n = len(rows)
        dfreq = Counter(tok for c in docs.values() for tok in c)
        vecs = {
            i: {t: tf * math.log(n / dfreq[t]) for t, tf in c.items()}
            for i, c in docs.items()
        }
        def cos(a, b):
            dot = sum(va * vecs[b].get(t, 0.0) for t, va in vecs[a].items())
            na = math.sqrt(sum(v * v for v in vecs[a].values()))
            nb = math.sqrt(sum(v * v for v in vecs[b].values()))
            return round(dot / (na * nb), 6)

        # only pairs sharing a token appear (docs 1,2 share; 3 is disjoint)
        assert set(got) == {(1, 2)}
        assert abs(got[(1, 2)] - cos(1, 2)) < 2e-6

    def test_df_cap_drops_stop_token_pairs(self, spark):
        from libcolumnfile_spark.operators.text import sparse_cosine_pairs

        # "the" appears in all docs; with df_cap=2 it can't generate pairs
        rows = [(i, f"the unique{i} word{i}") for i in range(4)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = sparse_cosine_pairs(df, df_cap=2, threshold=0.0).collect()
        assert out == []


class TestCdcApply:
    def _apply(self, spark, changelog_rows):
        from libcolumnfile_spark.operators.pipeline import cdc_apply

        snap = spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
            ["k", "price", "status"],
        )
        log = spark.createDataFrame(
            changelog_rows, ["k", "op", "seq", "price", "status"]
        )
        out = cdc_apply(snap, log, "k")
        return {r["k"]: (r["last_op"], r["price"], r["status"]) for r in out.collect()}

    def test_update_delete_insert_semantics(self, spark):
        got = self._apply(
            spark,
            [
                (2, "U", 1, 21.0, "b2"),   # update wins over snapshot
                (3, "D", 1, None, None),   # delete removes the key
                (4, "I", 1, 40.0, "d"),    # fresh insert appears
            ],
        )
        assert got == {
            1: ("I", 10.0, "a"),
            2: ("U", 21.0, "b2"),
            4: ("I", 40.0, "d"),
        }

    def test_delete_then_reinsert_resurrects(self, spark):
        got = self._apply(
            spark,
            [(1, "D", 1, None, None), (1, "I", 2, 11.0, "a2")],
        )
        assert got[1] == ("I", 11.0, "a2")
        assert set(got) == {1, 2, 3}

    def test_highest_seq_wins_among_updates(self, spark):
        got = self._apply(
            spark,
            [(2, "U", 1, 21.0, "b1"), (2, "U", 3, 23.0, "b3"), (2, "U", 2, 22.0, "b2")],
        )
        assert got[2] == ("U", 23.0, "b3")


class TestAttributionLastTouch:
    def _run(self, spark, rows):
        from libcolumnfile_spark.operators.relational import attribution_last_touch

        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value"]
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = attribution_last_touch(df)
        return {r["channel"]: (r["n_conversions"], r["revenue"]) for r in out.collect()}

    def test_latest_touch_within_lookback_wins(self, spark):
        got = self._run(
            spark,
            [
                (1, "2024-01-01 00:00:00", 7, "click", None),
                (2, "2024-01-02 00:00:00", 7, "view", None),
                (3, "2024-01-03 00:00:00", 7, "purchase", 5.0),
            ],
        )
        assert got == {"view": (1, 5.0)}

    def test_stale_and_absent_touches_fall_to_none(self, spark):
        got = self._run(
            spark,
            [
                (1, "2024-01-01 00:00:00", 7, "click", None),
                (2, "2024-01-20 00:00:00", 7, "purchase", 3.0),  # 19d stale
                (3, "2024-01-05 00:00:00", 8, "purchase", 4.0),  # no touch
            ],
        )
        assert got == {"none": (2, 7.0)}

    def test_touches_do_not_cross_users(self, spark):
        got = self._run(
            spark,
            [
                (1, "2024-01-01 00:00:00", 7, "click", None),
                (2, "2024-01-02 00:00:00", 8, "purchase", 2.0),
            ],
        )
        assert got == {"none": (1, 2.0)}


class TestSoftDedup:
    def test_weights_inverse_cluster_size(self, spark):
        from libcolumnfile_spark.operators.dedup import soft_dedup_weights

        df = spark.createDataFrame(
            [(1, "same text"), (2, "same text"), (3, "unique")],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: (r["cluster_size"], r["weight"])
            for r in soft_dedup_weights(df, ["text"], "doc_id").collect()
        }
        assert got == {1: (2, 0.5), 2: (2, 0.5), 3: (1, 1.0)}
        # expected corpus contribution of each distinct content is 1
        assert sum(w for _, w in got.values()) == 2.0


class TestLabelPropagation:
    def test_components_converge_to_min_label(self, spark):
        from libcolumnfile_spark.operators.graph import label_propagation

        # path a-b-c (diameter 2) + isolated pair x-y
        edges = spark.createDataFrame(
            [("b", "a"), ("c", "b"), ("y", "x")], ["src", "dst"]
        )
        got = {
            r["node"]: r["community"]
            for r in label_propagation(edges, n_iter=3).collect()
        }
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_fixed_rounds_bound_propagation_radius(self, spark):
        from libcolumnfile_spark.operators.graph import label_propagation

        # chain a-b-c-d-e: after ONE synchronous round, e sees only d's
        # initial label; min-label 'a' is 4 hops away
        edges = spark.createDataFrame(
            [("b", "a"), ("c", "b"), ("d", "c"), ("e", "d")], ["src", "dst"]
        )
        got = {
            r["node"]: r["community"]
            for r in label_propagation(edges, n_iter=1).collect()
        }
        assert got["e"] == "d"
        assert got["a"] == "a"


class TestKmeansStep:
    def test_means_match_numpy_reference(self, spark):
        import numpy as np

        from libcolumnfile_spark.operators.similarity import (
            _ivf_seeded_centroids,
            kmeans_step,
        )

        rng = [
            [float((i * 7 + j * 3) % 5 - 2) for j in range(4)] for i in range(12)
        ]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(rng)], ["vec_id", "embedding"]
        )
        out = kmeans_step(df, n_lists=2)
        rows = out.collect()
        cents = np.array(_ivf_seeded_centroids(4, 2))
        M = np.array(rng)
        assign = np.argmax(M @ cents.T, axis=1)
        for r in rows:
            members = M[assign == r["list_id"]]
            assert r["n"] == len(members)
            assert abs(r["centroid_val"] - round(float(members[:, r["dim"]].mean()), 6)) < 1e-9
        # every vector is accounted for exactly once per dimension
        assert sum({r["list_id"]: r["n"] for r in rows}.values()) == 12


class TestCorpusDrift:
    def test_identical_slices_zero_divergence(self, spark):
        from libcolumnfile_spark.operators.text import corpus_drift

        df = spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha beta")], ["doc_id", "text"]
        )
        out = corpus_drift(df, F.col("doc_id") % 2).collect()
        assert out and all(r["js_contrib"] == 0.0 for r in out)

    def test_slice_exclusive_token_ranks_first(self, spark):
        from libcolumnfile_spark.operators.text import corpus_drift

        df = spark.createDataFrame(
            [(0, "shared shifted"), (1, "shared shared")], ["doc_id", "text"]
        )
        out = corpus_drift(df, F.col("doc_id") % 2).collect()
        assert out[0]["token"] == "shifted"
        assert out[0]["js_contrib"] > 0.0


class TestBootstrapCi:
    def test_constant_column_degenerate_interval(self, spark):
        from libcolumnfile_spark.operators.aggregates import bootstrap_ci_mean

        df = spark.createDataFrame([(i, 7.0) for i in range(50)], ["id", "x"])
        r = bootstrap_ci_mean(df, "x", "id").collect()[0]
        assert r["n_boot"] == 32
        assert r["boot_mean"] == 7.0
        assert r["ci_lo"] == 7.0 and r["ci_hi"] == 7.0

    def test_interval_brackets_mean_and_tightens_with_n(self, spark):
        from libcolumnfile_spark.operators.aggregates import bootstrap_ci_mean

        small = spark.createDataFrame(
            [(i, float(i % 10)) for i in range(40)], ["id", "x"]
        )
        big = spark.createDataFrame(
            [(i, float(i % 10)) for i in range(4000)], ["id", "x"]
        )
        rs = bootstrap_ci_mean(small, "x", "id").collect()[0]
        rb = bootstrap_ci_mean(big, "x", "id").collect()[0]
        for r in (rs, rb):
            assert r["ci_lo"] <= r["boot_mean"] <= r["ci_hi"]
        assert (rb["ci_hi"] - rb["ci_lo"]) < (rs["ci_hi"] - rs["ci_lo"])


class TestWelchTtest:
    def test_known_values(self, spark):
        from libcolumnfile_spark.operators.aggregates import welch_ttest

        rows = [("a", v) for v in (1.0, 2.0, 3.0)] + [("b", v) for v in (4.0, 5.0, 6.0)]
        df = spark.createDataFrame(rows, ["g", "x"])
        r = welch_ttest(df, "g", "x", "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"]) == (3, 3)
        assert (r["mean_a"], r["mean_b"]) == (2.0, 5.0)
        # hand-computed: t = -3 / sqrt(2/3), Welch-Satterthwaite df = 4
        assert abs(r["t_stat"] - (-3.6742)) < 1e-4
        assert abs(r["df"] - 4.0) < 1e-9

    def test_identical_groups_t_zero(self, spark):
        from libcolumnfile_spark.operators.aggregates import welch_ttest

        rows = [(g, v) for g in ("a", "b") for v in (1.0, 2.0, 9.0)]
        df = spark.createDataFrame(rows, ["g", "x"])
        r = welch_ttest(df, "g", "x", "a", "b").collect()[0]
        assert r["t_stat"] == 0.0


class TestReadability:
    def test_hand_computed_flesch(self, spark):
        from libcolumnfile_spark.operators.text import readability

        df = spark.createDataFrame([(1, "Hello world.")], ["doc_id", "text"])
        r = readability(df).collect()[0]
        # hello -> e,o (2 groups), world -> o (1): 3 syllables, 2 words, 1 sentence
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (2, 1, 3)
        assert abs(r["flesch"] - (206.835 - 1.015 * 2.0 - 84.6 * 1.5)) < 1e-9

    def test_sentence_floor_and_empty_filter(self, spark):
        from libcolumnfile_spark.operators.text import readability

        df = spark.createDataFrame(
            [(1, "no terminal punctuation here"), (2, "   ")], ["doc_id", "text"]
        )
        rows = readability(df).collect()
        assert [r["doc_id"] for r in rows] == [1]
        assert rows[0]["n_sentences"] == 1


class TestMannWhitney:
    def test_known_u_and_direction(self, spark):
        from libcolumnfile_spark.operators.aggregates import mann_whitney_u

        # a = {1,2,3}, b = {4,5,6}: no (a > b) pairs, no ties -> U_a = 0
        rows = [("a", v) for v in (1.0, 2.0, 3.0)] + [("b", v) for v in (4.0, 5.0, 6.0)]
        r = mann_whitney_u(
            spark.createDataFrame(rows, ["g", "x"]), "g", "x", "a", "b"
        ).collect()[0]
        assert (r["n_a"], r["n_b"], r["u_stat"]) == (3, 3, 0.0)
        assert r["z"] < 0

    def test_ties_count_half(self, spark):
        from libcolumnfile_spark.operators.aggregates import mann_whitney_u

        # all values equal: U = n_a * n_b / 2, z = 0/0 guarded by ties...
        # use one tie pair among distinct values instead
        rows = [("a", 1.0), ("a", 3.0), ("b", 3.0), ("b", 5.0)]
        r = mann_whitney_u(
            spark.createDataFrame(rows, ["g", "x"]), "g", "x", "a", "b"
        ).collect()[0]
        # pairs: (1<3), (1<5) -> 0; (3 ties 3) -> 0.5; (3<5) -> 0  => U = 0.5
        assert r["u_stat"] == 0.5


class TestChi2Independence:
    def test_independent_table_chi2_zero(self, spark):
        from libcolumnfile_spark.operators.aggregates import chi2_independence

        rows = [(a, b) for a in ("x", "y") for b in ("p", "q") for _ in range(5)]
        r = chi2_independence(
            spark.createDataFrame(rows, ["a", "b"]), "a", "b"
        ).collect()[0]
        assert (r["n"], r["dof"], r["chi2"]) == (20, 1, 0.0)

    def test_perfect_association(self, spark):
        from libcolumnfile_spark.operators.aggregates import chi2_independence

        rows = [("x", "p")] * 5 + [("y", "q")] * 5
        r = chi2_independence(
            spark.createDataFrame(rows, ["a", "b"]), "a", "b"
        ).collect()[0]
        # 2x2 perfect association: chi2 = n
        assert (r["n"], r["dof"], r["chi2"]) == (10, 1, 10.0)


class TestCalibrationBins:
    def test_bins_partition_and_rates(self, spark):
        from libcolumnfile_spark.operators.text import calibration_bins

        rows = [(float(i) / 100.0, 1 if i >= 50 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, ["score", "label"])
        out = {r["bin"]: r for r in calibration_bins(df, "score", "label").collect()}
        assert sum(r["n"] for r in out.values()) == 100
        assert set(out) == set(range(10))
        # labels flip exactly at the bin-5 boundary: perfectly calibrated tails
        assert out[0]["pos_rate"] == 0.0 and out[9]["pos_rate"] == 1.0

    def test_degenerate_scores_single_bin(self, spark):
        from libcolumnfile_spark.operators.text import calibration_bins

        df = spark.createDataFrame([(0.5, 1), (0.5, 0)], ["score", "label"])
        out = calibration_bins(df, "score", "label").collect()
        assert len(out) == 1 and out[0]["bin"] == 0 and out[0]["n"] == 2


class TestKsTest:
    def test_identical_distributions_d_zero(self, spark):
        from libcolumnfile_spark.operators.aggregates import ks_test

        rows = [(g, v) for g in ("a", "b") for v in (1.0, 2.0, 3.0)]
        r = ks_test(spark.createDataFrame(rows, ["g", "x"]), "g", "x", "a", "b").collect()[0]
        assert r["ks_d"] == 0.0

    def test_disjoint_supports_d_one(self, spark):
        from libcolumnfile_spark.operators.aggregates import ks_test

        rows = [("a", v) for v in (1.0, 2.0)] + [("b", v) for v in (5.0, 6.0, 7.0)]
        r = ks_test(spark.createDataFrame(rows, ["g", "x"]), "g", "x", "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"], r["ks_d"]) == (2, 3, 1.0)

    def test_known_partial_overlap(self, spark):
        from libcolumnfile_spark.operators.aggregates import ks_test

        # a = {1,2}, b = {2,3}: ECDFs at v=1: 0.5 vs 0; v=2: 1 vs 0.5; v=3: 1 vs 1
        rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
        r = ks_test(spark.createDataFrame(rows, ["g", "x"]), "g", "x", "a", "b").collect()[0]
        assert r["ks_d"] == 0.5


class TestEquidepthHistogram:
    def test_uniform_values_equal_buckets(self, spark):
        from libcolumnfile_spark.operators.aggregates import equidepth_histogram

        df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
        out = {r["bucket"]: r for r in equidepth_histogram(df, "x").collect()}
        assert set(out) == set(range(10))
        assert all(r["n"] == 10 for r in out.values())
        # buckets tile the range in order
        assert out[0]["lo"] == 0.0 and out[9]["hi"] == 99.0
        for i in range(9):
            assert out[i]["hi"] < out[i + 1]["lo"]

    def test_skew_still_balanced(self, spark):
        from libcolumnfile_spark.operators.aggregates import equidepth_histogram

        # heavy right skew: equi-depth keeps counts near-equal where
        # equi-width would collapse into one hot bucket
        df = spark.createDataFrame([(float(i) ** 3,) for i in range(100)], ["x"])
        counts = [r["n"] for r in equidepth_histogram(df, "x").collect()]
        assert max(counts) - min(counts) <= 2


class TestDailyAutocorr:
    def test_alternating_series_negative(self, spark):
        from libcolumnfile_spark.operators.relational import daily_autocorr

        rows = []
        eid = 0
        for day in range(1, 11):
            n = 10 if day % 2 == 0 else 2
            for _ in range(n):
                rows.append((eid, f"2024-01-{day:02d} 12:00:00"))
                eid += 1
        df = spark.createDataFrame(rows, ["event_id", "ts"]).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        r = daily_autocorr(df).collect()[0]
        assert r["n_days"] == 10
        assert r["autocorr_1"] < -0.9  # perfectly alternating volume


class TestReciprocity:
    def test_counts_mutual_pairs_only(self, spark):
        from libcolumnfile_spark.operators.graph import reciprocity

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b")],
            ["src", "dst"],
        )
        r = reciprocity(edges).collect()[0]
        # distinct self-loop-free edges: ab, ba, ac -> reciprocal: ab, ba
        assert (r["n_edges"], r["n_reciprocal"]) == (3, 2)
        assert abs(r["reciprocity"] - round(2 / 3, 6)) < 1e-9


class TestSourceOverlap:
    def test_jaccard_hand_checked(self, spark):
        from libcolumnfile_spark.operators.text import source_vocab_overlap

        df = spark.createDataFrame(
            [
                ("s1", "alpha beta gamma"),
                ("s2", "beta gamma delta"),
                ("s3", "zeta"),
            ],
            ["source", "text"],
        )
        out = {(r["src_a"], r["src_b"]): r for r in source_vocab_overlap(df).collect()}
        r12 = out[("s1", "s2")]
        assert (r12["n_common"], r12["n_union"]) == (2, 4)
        assert r12["jaccard"] == 0.5
        # disjoint vocabularies never pair (inner join on shared tokens)
        assert ("s1", "s3") not in out and ("s2", "s3") not in out


class TestGini:
    def test_even_and_concentrated(self, spark):
        from libcolumnfile_spark.operators.pipeline import gini_concentration

        even = spark.createDataFrame(
            [(g, i) for g in ("a", "b", "c", "d") for i in range(5)], ["g", "x"]
        )
        r = gini_concentration(even, "g").collect()[0]
        assert (r["n_groups"], r["n_rows"], r["gini"]) == (4, 20, 0.0)

        skew = spark.createDataFrame(
            [("a", i) for i in range(97)] + [("b", 0), ("c", 0), ("d", 0)],
            ["g", "x"],
        )
        r2 = gini_concentration(skew, "g").collect()[0]
        assert r2["gini"] > 0.7


class TestCoverageCurve:
    def test_monotone_and_exact_shares(self, spark):
        from libcolumnfile_spark.operators.text import vocab_coverage_curve

        df = spark.createDataFrame(
            [(1, "x x x x y y z"), (2, "x y z w")], ["doc_id", "text"]
        )
        rows = sorted(
            vocab_coverage_curve(df).collect(), key=lambda r: r["rank"]
        )
        # freq: x=5, y=3, z=2, w=1 (total 11)
        assert [r["tok"] for r in rows] == ["x", "y", "z", "w"]
        assert rows[0]["cum_coverage"] == round(5 / 11, 6)
        assert rows[-1]["cum_coverage"] == 1.0
        assert all(
            rows[i]["cum_coverage"] <= rows[i + 1]["cum_coverage"]
            for i in range(len(rows) - 1)
        )


class TestSeasonalAnomaly:
    def test_flags_only_the_broken_weekday(self, spark):
        from libcolumnfile_spark.operators.relational import seasonal_anomaly

        from datetime import date, timedelta

        rows, eid = [], 0
        # 6 weeks of Mondays at 10/day (one at 100) + flat Tuesdays
        for wk in range(6):
            mon = date(2024, 1, 1) + timedelta(weeks=wk)  # 2024-01-01 is a Monday
            n = 100 if wk == 3 else 10
            for _ in range(n):
                rows.append((eid, f"{mon} 09:00:00")); eid += 1
            for _ in range(5):
                rows.append((eid, f"{mon + timedelta(days=1)} 09:00:00")); eid += 1
        df = spark.createDataFrame(rows, ["event_id", "ts"]).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = seasonal_anomaly(df).collect()
        assert len(out) == 1
        assert out[0]["cnt"] == 100 and out[0]["z"] > 1.5


class TestPrefixDedup:
    def test_groups_by_opening_tokens_only(self, spark):
        from libcolumnfile_spark.operators.dedup import prefix_dedup_groups

        head = "terms of service apply to this mirrored page"
        df = spark.createDataFrame(
            [
                (1, head + " unique body one"),
                (5, head + " totally different body"),
                (9, "an original opening longer than eight tokens here"),
                (3, "short text"),  # < 8 tokens: excluded
            ],
            ["doc_id", "text"],
        )
        out = prefix_dedup_groups(df).collect()
        assert len(out) == 1
        assert (out[0]["n_docs"], out[0]["rep_id"]) == (2, 1)


class TestCorrMatrix:
    def test_perfect_positive_and_negative(self, spark):
        from libcolumnfile_spark.operators.aggregates import corr_matrix

        rows = [(float(i), 2.0 * i, -1.0 * i) for i in range(1, 11)]
        df = spark.createDataFrame(rows, ["x", "y", "z"])
        out = {(r["col_a"], r["col_b"]): r["r"] for r in corr_matrix(df, ["x", "y", "z"]).collect()}
        assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
        assert out[("x", "y")] == 1.0
        assert out[("x", "z")] == -1.0
        assert out[("y", "z")] == -1.0

    def test_uncorrelated_orthogonal(self, spark):
        from libcolumnfile_spark.operators.aggregates import corr_matrix

        # x alternates independently of y's period-4 pattern: corr = 0
        rows = [(float(i % 2), float((i // 2) % 2)) for i in range(8)]
        df = spark.createDataFrame(rows, ["x", "y"])
        out = corr_matrix(df, ["x", "y"]).collect()
        assert len(out) == 1 and out[0]["r"] == 0.0


class TestSpearman:
    def test_monotone_nonlinear_is_one(self, spark):
        from libcolumnfile_spark.operators.aggregates import spearman_rho

        rows = [(float(i), float(i) ** 3) for i in range(1, 9)]
        r = spearman_rho(spark.createDataFrame(rows, ["x", "y"]), "x", "y").collect()[0]
        assert (r["n"], r["rho"]) == (8, 1.0)

    def test_reversed_is_minus_one(self, spark):
        from libcolumnfile_spark.operators.aggregates import spearman_rho

        rows = [(float(i), float(10 - i)) for i in range(1, 9)]
        r = spearman_rho(spark.createDataFrame(rows, ["x", "y"]), "x", "y").collect()[0]
        assert r["rho"] == -1.0

    def test_tie_averaged_ranks(self, spark):
        from libcolumnfile_spark.operators.aggregates import spearman_rho

        # x = (1,2,2,3), y = (1,2,3,4): x-ranks (1, 2.5, 2.5, 4)
        # pearson((1,2.5,2.5,4),(1,2,3,4)) = 2.25/sqrt(4.5*5) ~ 0.9487
        rows = [(1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0)]
        r = spearman_rho(spark.createDataFrame(rows, ["x", "y"]), "x", "y").collect()[0]
        assert abs(r["rho"] - 0.9487) < 1e-9


class TestBenford:
    def test_digit_extraction_and_zero_fill(self, spark):
        from libcolumnfile_spark.operators.aggregates import benford_digits

        # 9.99 must land on digit 9 (floor, not round-to-10); 0.5 dropped
        df = spark.createDataFrame(
            [(9.99,), (123.0,), (19.0,), (1.0,), (0.5,)], ["x"]
        )
        out = {r["digit"]: r for r in benford_digits(df, "x").collect()}
        assert set(out) == set(range(1, 10))
        assert out[9]["n_obs"] == 1
        assert out[1]["n_obs"] == 3
        assert out[2]["n_obs"] == 0 and out[2]["obs_pct"] == 0.0

    def test_expected_shares_sum_to_one(self, spark):
        from libcolumnfile_spark.operators.aggregates import benford_digits

        df = spark.createDataFrame([(float(d),) for d in range(1, 10)], ["x"])
        rows = benford_digits(df, "x").collect()
        assert abs(sum(r["exp_pct"] for r in rows) - 1.0) < 1e-4


class TestCusumChangepoint:
    def test_constant_series_all_zero(self, spark):
        import datetime

        from libcolumnfile_spark.operators.relational import cusum_changepoint

        rows = [
            (datetime.datetime(2024, 1, d + 1, h),)
            for d in range(6)
            for h in (1, 2, 3)
        ]
        out = cusum_changepoint(spark.createDataFrame(rows, ["ts"]), top_k=10).collect()
        assert all(r["cusum"] == 0.0 for r in out)

    def test_level_shift_peaks_at_boundary(self, spark):
        import datetime

        from libcolumnfile_spark.operators.relational import cusum_changepoint

        # 5 days at 1/day then 5 days at 3/day: |CUSUM| peaks on day 5
        rows = [(datetime.datetime(2024, 1, d + 1, 1),) for d in range(5)]
        rows += [
            (datetime.datetime(2024, 1, d + 6, h),)
            for d in range(5)
            for h in (1, 2, 3)
        ]
        out = cusum_changepoint(spark.createDataFrame(rows, ["ts"]), top_k=1).collect()
        assert out[0]["day"] == datetime.date(2024, 1, 5)
        assert out[0]["cusum"] == -5.0


class TestJsDivergence:
    def test_identical_distributions_zero(self, spark):
        from libcolumnfile_spark.operators.text import source_js_divergence

        df = spark.createDataFrame(
            [("s1", "a b c"), ("s2", "a b c")], ["source", "text"]
        )
        out = source_js_divergence(df).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["src_a"], r["src_b"], r["n_common"], r["js"]) == ("s1", "s2", 3, 0.0)

    def test_half_disjoint_mass(self, spark):
        from libcolumnfile_spark.operators.text import source_js_divergence

        # p = {a:.5, b:.5}, q = {a:.5, c:.5}: JS = 0.5*KL terms -> known
        # common token a contributes 0 (equal p), disjoint mass 0.5 each
        # side -> js = 0.5*(0.5) + 0.5*(0.5) = 0.5
        df = spark.createDataFrame(
            [("s1", "a b"), ("s2", "a c")], ["source", "text"]
        )
        r = source_js_divergence(df).collect()[0]
        assert r["n_common"] == 1 and r["js"] == 0.5

    def test_fully_disjoint_pair_omitted(self, spark):
        from libcolumnfile_spark.operators.text import source_js_divergence

        # documented: pairs sharing zero tokens never reach the inner
        # join, so they are absent (JS would be exactly 1)
        df = spark.createDataFrame(
            [("s1", "a b"), ("s2", "c d")], ["source", "text"]
        )
        assert source_js_divergence(df).count() == 0


class TestDsirWeights:
    def test_target_like_docs_rank_first(self, spark):
        from libcolumnfile_spark.operators.text import dsir_weights

        rows = [
            (1, "tgt", "alpha alpha beta"),
            (2, "raw", "alpha alpha beta"),   # looks like target
            (3, "raw", "gamma gamma delta"),  # does not
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = dsir_weights(df, target_source="tgt", top_k=3).collect()
        ids = [r["doc_id"] for r in out]
        assert set(ids) == {1, 2, 3}
        # the two target-like docs outrank the off-domain one
        assert ids.index(3) == 2
        w = {r["doc_id"]: r["weight"] for r in out}
        assert w[3] < w[2]
        assert out[0]["n_tok"] == 3


class TestAdamicAdar:
    def test_path_predicts_endpoints(self, spark):
        from libcolumnfile_spark.operators.graph import adamic_adar_topk

        import math

        # path 1-2-3: only candidate pair (1,3) via center 2 (deg 2)
        e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
        out = adamic_adar_topk(e).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["a"], r["b"], r["n_common"]) == (1, 3, 1)
        assert abs(r["score"] - round(1.0 / math.log(2.0), 6)) < 1e-9

    def test_existing_edges_excluded_and_hub_capped(self, spark):
        from libcolumnfile_spark.operators.graph import adamic_adar_topk

        # triangle 1-2-3 plus star center 9 linked to 4..8: the triangle
        # pairs all exist (anti-joined away); with deg_cap=3 the star
        # center (deg 5) may not serve as a center, so no star pairs
        edges = [(1, 2), (2, 3), (1, 3)] + [(9, i) for i in range(4, 9)]
        e = spark.createDataFrame(edges, ["src", "dst"])
        out = adamic_adar_topk(e, deg_cap=3).collect()
        assert out == []


class TestSilhouette:
    def test_vectors_at_centroids_score_one(self, spark):
        from libcolumnfile_spark.operators.similarity import (
            _ivf_seeded_centroids,
            silhouette_simplified,
        )

        cents = _ivf_seeded_centroids(4)
        rows = [(1, [float(x) for x in cents[0]]), (2, [float(x) for x in cents[3]])]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = {r["list_id"]: r for r in silhouette_simplified(df).collect()}
        assert set(out) == {0, 3}
        for r in out.values():
            assert r["n"] == 1 and r["mean_a"] == 0.0 and r["mean_sil"] == 1.0

    def test_null_embeddings_filtered(self, spark):
        from libcolumnfile_spark.operators.similarity import silhouette_simplified

        from pyspark.sql import types as Ty

        schema = Ty.StructType(
            [
                Ty.StructField("vec_id", Ty.LongType()),
                Ty.StructField("embedding", Ty.ArrayType(Ty.FloatType())),
            ]
        )
        df = spark.createDataFrame([(1, None)], schema)
        assert silhouette_simplified(df).count() == 0


class TestLshRecallEval:
    def test_planted_dup_is_found(self, spark):
        from libcolumnfile_spark.operators.dedup import lsh_recall_eval

        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [(1, base), (2, base + " iota"), (3, "one two three four five six")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["probe_id"]: r for r in lsh_recall_eval(df, n_probes=3).collect()}
        assert set(out) == {1, 2, 3}
        # docs 1/2 share most 3-grams: each is the other's ground truth,
        # and identical min-hashes on the shared grams make them band
        # candidates -> recall 1
        assert out[1]["n_true"] == 1 and out[1]["recall"] == 1.0
        assert out[2]["n_true"] == 1
        # doc 3 has nothing to find and nothing proposed — still a row
        assert (out[3]["n_true"], out[3]["n_cand"]) == (0, 0)
        assert out[3]["recall"] is None

    def test_probe_count_bounds_output(self, spark):
        from libcolumnfile_spark.operators.dedup import lsh_recall_eval

        rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = lsh_recall_eval(df, n_probes=4).collect()
        assert [r["probe_id"] for r in out] == [0, 1, 2, 3]


class TestNormalizedDedup:
    def test_formatting_variants_collapse(self, spark):
        from libcolumnfile_spark.operators.dedup import normalized_dedup

        rows = [
            (1, "Hello,   World!"),
            (2, "hello world"),
            (3, "HELLO WORLD?!"),
            (4, "goodbye world"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = normalized_dedup(df).collect()
        assert len(out) == 1
        assert (out[0]["n_docs"], out[0]["keep_id"]) == (3, 1)

    def test_distinct_content_not_collapsed(self, spark):
        from libcolumnfile_spark.operators.dedup import normalized_dedup

        df = spark.createDataFrame([(1, "a b"), (2, "a c")], ["doc_id", "text"])
        assert normalized_dedup(df).count() == 0


class TestRecordLinkage:
    def test_blocking_and_edit_distance(self, spark):
        from libcolumnfile_spark.operators.dedup import record_linkage

        rows = [
            (1, "red widget", "widget", 5),
            (2, "red widgets", "widget", 6),   # lev 1, size diff 1 -> match
            (3, "red widget", "gadget", 5),    # different block -> no
            (4, "blue bolt", "widget", 5),     # lev 9 -> no
            (5, "red widget", "widget", 9),    # size diff 4 -> no
        ]
        df = spark.createDataFrame(rows, ["id", "name", "blk", "size"])
        out = record_linkage(df, "id", "name", "blk", "size").collect()
        assert [(r["key_a"], r["key_b"], r["lev"]) for r in out] == [(1, 2, 1)]

    def test_pair_met_exactly_once(self, spark):
        from libcolumnfile_spark.operators.dedup import record_linkage

        # same block, same size: the neighborhood replication must not
        # produce the pair twice
        rows = [(1, "x y", "b", 3), (2, "x y", "b", 3)]
        df = spark.createDataFrame(rows, ["id", "name", "blk", "size"])
        out = record_linkage(df, "id", "name", "blk", "size").collect()
        assert len(out) == 1 and out[0]["lev"] == 0


class TestEventLift:
    def test_perfect_cooccurrence_lift(self, spark):
        from libcolumnfile_spark.operators.relational import event_lift

        # 2 users, both have {a, b}: lift = n_ab * N / (ca * cb) = 2*2/(2*2) = 1
        rows = [(u, t) for u in (1, 2) for t in ("a", "b")]
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        out = event_lift(df).collect()
        assert len(out) == 1
        assert (out[0]["type_a"], out[0]["type_b"], out[0]["n_ab"], out[0]["lift"]) == ("a", "b", 2, 1.0)

    def test_association_raises_lift(self, spark):
        from libcolumnfile_spark.operators.relational import event_lift

        # a and b only ever together (users 1,2); c alone (users 3,4):
        # lift(a,b) = 2*4/(2*2) = 2
        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "c"), (4, "c")]
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        out = {(r["type_a"], r["type_b"]): r["lift"] for r in event_lift(df).collect()}
        assert out == {("a", "b"): 2.0}

    def test_duplicate_events_counted_once(self, spark):
        from libcolumnfile_spark.operators.relational import event_lift

        rows = [(1, "a"), (1, "a"), (1, "b")]
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        out = event_lift(df).collect()
        assert out[0]["n_ab"] == 1


class TestRollingStats:
    def test_spike_scored_against_prior_window(self, spark):
        import datetime

        from libcolumnfile_spark.operators.relational import rolling_daily_stats

        # 1/day for 9 days except day 5 has 3 and day 9 has 5:
        # day 9's window (days 2-8) has mean>1 from day 5's spike
        counts = {5: 3, 9: 5}
        rows = [
            (datetime.datetime(2024, 1, d, h + 1),)
            for d in range(1, 10)
            for h in range(counts.get(d, 1))
        ]
        df = spark.createDataFrame(rows, ["ts"])
        out = {r["day"]: r for r in rolling_daily_stats(df, window_days=7).collect()}
        # only days 8 and 9 have a full 7-day prior window; day 8's
        # window (1-7) contains the day-5 spike
        assert set(out) == {datetime.date(2024, 1, 8), datetime.date(2024, 1, 9)}
        d9 = out[datetime.date(2024, 1, 9)]
        assert d9["cnt"] == 5 and d9["z"] > 0

    def test_constant_series_filtered_by_zero_sd(self, spark):
        import datetime

        from libcolumnfile_spark.operators.relational import rolling_daily_stats

        rows = [(datetime.datetime(2024, 1, d, 1),) for d in range(1, 12)]
        df = spark.createDataFrame(rows, ["ts"])
        assert rolling_daily_stats(df, window_days=7).count() == 0


class TestSplitLeakage:
    def test_cross_split_dup_detected(self, spark):
        from libcolumnfile_spark.operators.dedup import split_leakage
        from libcolumnfile_spark.operators.pipeline import split_assign
        from pyspark.sql import functions as F

        base = "alpha beta gamma delta epsilon zeta"
        # find two ids landing in different splits, give them identical text
        probe = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
        splits = {
            r["doc_id"]: r["s"]
            for r in probe.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
        }
        train_id = next(i for i, s in splits.items() if s == "train")
        test_id = next(i for i, s in splits.items() if s == "test")
        rows = [(train_id, base), (test_id, base)]
        out = split_leakage(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["split_a"], r["split_b"], r["n_pairs"], r["n_docs_affected"]) == ("test", "train", 1, 2)

    def test_same_split_dups_not_leakage(self, spark):
        from libcolumnfile_spark.operators.dedup import split_leakage
        from libcolumnfile_spark.operators.pipeline import split_assign
        from pyspark.sql import functions as F

        probe = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
        splits = {
            r["doc_id"]: r["s"]
            for r in probe.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
        }
        a, b = [i for i, s in splits.items() if s == "train"][:2]
        rows = [(a, "one two three four"), (b, "one two three four")]
        assert split_leakage(spark.createDataFrame(rows, ["doc_id", "text"])).count() == 0


class TestKAnonymity:
    def test_small_classes_reported(self, spark):
        from libcolumnfile_spark.operators.pipeline import kanonymity_audit

        rows = [("en", "a")] * 6 + [("en", "b")] * 2 + [("fr", "a")]
        df = spark.createDataFrame(rows, ["lang", "src"])
        out = {(r["lang"], r["src"]): r["n"] for r in kanonymity_audit(df, ["lang", "src"], k=5).collect()}
        assert out == {("en", "b"): 2, ("fr", "a"): 1}


class TestDpCounts:
    def test_noise_bounded_and_deterministic(self, spark):
        from libcolumnfile_spark.operators.pipeline import dp_noisy_counts

        rows = [(g,) for g in ("a", "b", "c") for _ in range(100)]
        df = spark.createDataFrame(rows, ["src"])
        out1 = {r["grp"]: r["n_noisy"] for r in dp_noisy_counts(df, "src").collect()}
        out2 = {r["grp"]: r["n_noisy"] for r in dp_noisy_counts(df, "src").collect()}
        assert out1 == out2  # seeded: reproducible
        for g, v in out1.items():
            assert v != 100  # noise applied
            assert abs(v - 100) < 25  # Laplace(1) tail at md5 uniforms

    def test_epsilon_scales_noise(self, spark):
        from libcolumnfile_spark.operators.pipeline import dp_noisy_counts

        df = spark.createDataFrame([("a",)] * 10, ["src"])
        tight = dp_noisy_counts(df, "src", epsilon=10.0).collect()[0]["n_noisy"]
        loose = dp_noisy_counts(df, "src", epsilon=0.1).collect()[0]["n_noisy"]
        assert abs(tight - 10) * 10 <= abs(loose - 10) + 1e-9


class TestRfmSegments:
    def test_grid_partitions_customers(self, spark):
        import datetime

        from libcolumnfile_spark.operators.pipeline import rfm_segments

        rows = []
        for c in range(10):
            # customer c: c+1 orders of value 100*(c+1), last order day c+1
            for k in range(c + 1):
                rows.append((c, datetime.datetime(2024, 1, c + 1), 100.0 * (c + 1)))
        df = spark.createDataFrame(rows, ["o_custkey", "o_orderdate", "o_totalprice"])
        out = rfm_segments(df).collect()
        assert sum(r["n_customers"] for r in out) == 10
        # customer 9: most recent, most frequent, highest spend -> (5,5,5)
        top = [r for r in out if (r["r_score"], r["f_score"], r["m_score"]) == (5, 5, 5)]
        assert len(top) == 1 and top[0]["n_customers"] >= 1
        # scores stay in 1..5
        for r in out:
            for c_ in ("r_score", "f_score", "m_score"):
                assert 1 <= r[c_] <= 5

    def test_exact_money_totals(self, spark):
        import datetime

        from libcolumnfile_spark.operators.pipeline import rfm_segments

        rows = [(1, datetime.datetime(2024, 1, 1), 0.1)] * 3
        df = spark.createDataFrame(rows, ["o_custkey", "o_orderdate", "o_totalprice"])
        out = rfm_segments(df).collect()
        assert len(out) == 1
        # 0.1+0.1+0.1 sums exactly as DECIMAL: 0.30, not 0.30000000000000004
        assert out[0]["total_monetary"] == 0.3


class TestThresholdSweep:
    def test_monotone_and_bounded(self, spark):
        from libcolumnfile_spark.operators.text import threshold_sweep

        rows = [(i, f"doc{i} word{i % 7} token{i % 13} filler{i % 3}") for i in range(50)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = sorted(threshold_sweep(df).collect(), key=lambda r: r["threshold"])
        assert len(out) == 9
        kept = [r["n_kept"] for r in out]
        assert kept == sorted(kept, reverse=True)  # higher cut keeps fewer
        for r in out:
            assert 0.0 <= r["frac_docs"] <= 1.0
            assert 0.0 <= r["frac_tokens"] <= 1.0


class TestWinsorize:
    def test_outliers_clipped_to_fences(self, spark):
        from libcolumnfile_spark.operators.aggregates import winsorize_stats

        # 98 values of 10.0 + two extremes: fences land at 10, so the
        # winsorized mean is exactly 10 while the raw mean is pulled up
        rows = [(10.0,)] * 98 + [(0.0,), (1000.0,)]
        df = spark.createDataFrame(rows, ["x"])
        r = winsorize_stats(df, "x").collect()[0]
        assert (r["n"], r["n_low"], r["n_high"]) == (100, 1, 1)
        assert r["lo"] == 10.0 and r["hi"] == 10.0
        assert r["mean_winsorized"] == 10.0
        assert r["mean_raw"] > 10.0

    def test_no_outliers_means_equal(self, spark):
        from libcolumnfile_spark.operators.aggregates import winsorize_stats

        df = spark.createDataFrame([(float(i),) for i in range(1, 11)], ["x"])
        r = winsorize_stats(df, "x", lo_q=0.0, hi_q=1.0).collect()[0]
        assert r["n_low"] == 0 and r["n_high"] == 0
        assert r["mean_raw"] == r["mean_winsorized"] == 5.5


class TestMixturePlan:
    def test_rates_and_epochs(self, spark):
        from libcolumnfile_spark.operators.pipeline import mixture_plan

        rows = [("a", "w " * 100), ("b", "w " * 10)]
        df = spark.createDataFrame(rows, ["source", "text"])
        out = {r["source"]: r for r in mixture_plan(df, {"a": 0.5, "b": 0.5}, 40).collect()}
        # a has 100 tokens, needs 20 -> rate 0.2, epochs 0.2
        assert out["a"]["available_tokens"] == 100
        assert out["a"]["target_tokens"] == 20
        assert out["a"]["rate"] == 0.2 and out["a"]["epochs"] == 0.2
        # b has 10 tokens, needs 20 -> rate capped at 1, epochs 2
        assert out["b"]["rate"] == 1.0 and out["b"]["epochs"] == 2.0

    def test_sources_outside_mix_excluded(self, spark):
        from libcolumnfile_spark.operators.pipeline import mixture_plan

        rows = [("a", "w w"), ("c", "w w")]
        df = spark.createDataFrame(rows, ["source", "text"])
        out = mixture_plan(df, {"a": 1.0}, 10).collect()
        assert [r["source"] for r in out] == ["a"]


class TestRollingStatsCalendarGaps:
    def test_gap_in_window_drops_row(self, spark):
        import datetime

        from libcolumnfile_spark.operators.relational import rolling_daily_stats

        # days 1-9 with day 4 missing entirely: no day has a COMPLETE
        # 7-calendar-day prior window, so nothing is scored (a ROWS
        # frame would wrongly stretch past the gap and emit day 9)
        counts = {9: 3}
        rows = [
            (datetime.datetime(2024, 1, d, h + 1),)
            for d in range(1, 10)
            if d != 4
            for h in range(counts.get(d, 1))
        ]
        df = spark.createDataFrame(rows, ["ts"])
        assert rolling_daily_stats(df, window_days=7).count() == 0


class TestAucRoc:
    def test_perfect_and_random(self, spark):
        from libcolumnfile_spark.operators.aggregates import auc_roc

        # perfect separation: every positive scores above every negative
        rows = [(float(i), "pos") for i in range(10, 20)] + [
            (float(i), "neg") for i in range(10)
        ]
        df = spark.createDataFrame(rows, ["score", "label"])
        r = auc_roc(df, "score", F.col("label") == "pos").collect()[0]
        assert r["auc"] == 1.0 and r["gini"] == 1.0

    def test_all_tied_is_half(self, spark):
        from libcolumnfile_spark.operators.aggregates import auc_roc

        rows = [(1.0, "pos")] * 5 + [(1.0, "neg")] * 5
        df = spark.createDataFrame(rows, ["score", "label"])
        r = auc_roc(df, "score", F.col("label") == "pos").collect()[0]
        assert r["auc"] == 0.5 and r["gini"] == 0.0


class TestTrendOls:
    def test_exact_line(self, spark):
        import datetime

        from libcolumnfile_spark.operators.aggregates import trend_ols

        # y = 2x + 3 exactly: day x has 2x+3 events
        rows = []
        for x in range(1, 6):
            d = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=x)
            rows += [("g", d)] * (2 * x + 3)
        df = spark.createDataFrame(rows, ["event_type", "ts"])
        r = trend_ols(df, "event_type", "ts").collect()[0]
        assert r["slope"] == 2.0 and r["intercept"] == 3.0 and r["r2"] == 1.0

    def test_single_day_degenerate(self, spark):
        import datetime

        from libcolumnfile_spark.operators.aggregates import trend_ols

        df = spark.createDataFrame(
            [("g", datetime.datetime(2024, 1, 5))] * 3, ["event_type", "ts"]
        )
        r = trend_ols(df, "event_type", "ts").collect()[0]
        assert r["slope"] is None and r["r2"] is None


class TestKaplanMeier:
    def test_hand_computed_curve(self, spark):
        import datetime

        from libcolumnfile_spark.operators.aggregates import (
            kaplan_meier_conversion,
        )

        t0 = datetime.datetime(2024, 1, 1)

        def h(n):
            return t0 + datetime.timedelta(hours=n)

        # A converts at +1h, B and C at +2h, D never (censored at +5h)
        rows = [
            ("A", t0, "view"), ("A", h(1), "purchase"),
            ("B", t0, "view"), ("B", h(2), "purchase"),
            ("C", t0, "view"), ("C", h(2), "purchase"),
            ("D", t0, "view"), ("D", h(5), "view"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        out = {
            r["t_hours"]: r
            for r in kaplan_meier_conversion(
                df, "user_id", "ts", F.col("event_type") == "purchase"
            ).collect()
        }
        # t=1: 4 at risk, 1 converts -> S = 0.75
        assert out[1]["n_risk"] == 4 and out[1]["d_events"] == 1
        assert out[1]["surv"] == 0.75
        # t=2: 3 at risk, 2 convert -> S = 0.75 * (1/3) = 0.25
        assert out[2]["n_risk"] == 3 and out[2]["d_events"] == 2
        assert out[2]["surv"] == 0.25
        # censored user D contributes risk mass but no curve row
        assert set(out) == {1, 2}


class TestAssocRules:
    def test_support_confidence_lift(self, spark):
        from libcolumnfile_spark.operators.relational import association_rules

        baskets = spark.createDataFrame(
            [
                (1, 1, "a"), (1, 1, "b"),
                (1, 2, "a"), (1, 2, "b"),
                (2, 1, "a"),
                (2, 2, "b"),
            ],
            ["user_id", "session_idx", "item"],
        )
        out = {
            (r["antecedent"], r["consequent"]): r
            for r in association_rules(baskets, min_both=2).collect()
        }
        r = out[("a", "b")]
        # 4 baskets; a in 3, b in 3, both in 2
        assert r["n_both"] == 2
        assert r["support"] == 0.5
        assert r["confidence"] == round(2 / 3, 6)
        assert r["lift"] == round(2 * 4 / 9, 6)
        # symmetric pair counts, asymmetric confidence base
        assert out[("b", "a")]["n_both"] == 2


class TestIntervalOverlapJoin:
    def test_overlap_semantics(self, spark):
        import datetime

        from libcolumnfile_spark.operators.relational import (
            interval_overlap_join,
        )

        t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

        def m(n):
            return t0 + datetime.timedelta(minutes=n)

        sessions = spark.createDataFrame(
            [
                # spans 10:30-11:30 -> overlaps hour 10 AND hour 11
                (1, 1, m(30), m(90)),
                # ends exactly AT 11:00 -> still overlaps hour 11 (>=)
                (2, 1, m(0), m(60)),
                # entirely inside hour 9 -> no overlap with incidents
                (3, 1, m(-50), m(-40)),
            ],
            ["user_id", "session_idx", "session_start", "session_end"],
        )
        incidents = spark.createDataFrame(
            [(t0 + datetime.timedelta(hours=1), 7)], ["win_start", "n_err"]
        )
        out = interval_overlap_join(sessions, incidents).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_sessions"] == 2 and r["n_users"] == 2 and r["n_err"] == 7


class TestLocalClustering:
    def test_triangle_and_path(self, spark):
        from libcolumnfile_spark.operators.graph import local_clustering

        # triangle 1-2-3 (cc=1 for all three) + pendant path 3-4-5
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["src", "dst"]
        )
        out = {r["cc_bucket"]: r for r in local_clustering(edges).collect()}
        # nodes 1,2 (deg 2, 1 triangle): cc=1 -> bucket 10
        # node 3 (deg 3, 1 triangle): cc=1/3 -> bucket 3
        # node 4 (deg 2, 0 triangles): cc=0 -> bucket 0
        # node 5 has deg 1: excluded
        assert out[10]["n_nodes"] == 2 and out[10]["mean_cc"] == 1.0
        assert out[3]["n_nodes"] == 1 and out[3]["mean_cc"] == round(1 / 3, 6)
        assert out[0]["n_nodes"] == 1 and out[0]["mean_cc"] == 0.0


class TestClusterPurity:
    def test_majority_and_purity(self, spark):
        from libcolumnfile_spark.operators.similarity import (
            _ivf_seeded_centroids,
            cluster_purity,
        )

        cents = _ivf_seeded_centroids(4, 2)
        rows = [
            (1, cents[0], 0),
            (2, cents[0], 0),
            (3, cents[0], 1),  # minority label in cluster 0
            (4, cents[1], 1),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = {
            r["list_id"]: r for r in cluster_purity(df, n_lists=2).collect()
        }
        assert out[0]["n"] == 3 and out[0]["majority_label"] == 0
        assert out[0]["purity"] == round(2 / 3, 6)
        assert out[1]["n"] == 1 and out[1]["purity"] == 1.0


class TestFisherDims:
    def test_separating_dim_scores_high(self, spark):
        from libcolumnfile_spark.operators.similarity import (
            fisher_separability,
        )

        # dim 0 separates labels; dim 1 is identically distributed
        rows = [
            (1, [0.0, 5.0], 0), (2, [1.0, 6.0], 0),
            (3, [10.0, 5.0], 1), (4, [11.0, 6.0], 1),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = {r["dim"]: r for r in fisher_separability(df).collect()}
        assert out[0]["between_var"] == 25.0 and out[0]["within_var"] == 0.25
        assert out[0]["fisher"] == 100.0
        assert out[1]["between_var"] == 0.0 and out[1]["fisher"] == 0.0


class TestNdcg:
    def test_monotone_ranking_is_ideal(self, spark):
        from libcolumnfile_spark.operators.text import ndcg_eval

        # same doc length, tf 3/2/1: BM25 is monotone in tf at fixed dl,
        # so the ranking matches the relevance order -> NDCG = 1
        docs = spark.createDataFrame(
            [
                (1, "t t t x x x"),
                (2, "t t x x x x"),
                (3, "t x x x x x"),
                (4, "y y y y y y"),
            ],
            ["doc_id", "text"],
        )
        out = {r["term"]: r for r in ndcg_eval(docs, ("t",)).collect()}
        assert out["t"]["ndcg"] == 1.0
        assert out["t"]["dcg"] == out["t"]["idcg"] > 0


class TestFilterAblation:
    def test_unique_fail_attribution(self, spark):
        from libcolumnfile_spark.operators.text import filter_ablation

        rows = [
            (False, True, True, True),   # fails count ONLY
            (False, False, True, True),  # fails count AND len
            (True, True, True, True),    # passes all
            (True, True, True, True),
        ]
        flags = spark.createDataFrame(
            rows, ["ok_count", "ok_len", "ok_stop", "ok_unique"]
        )
        out = {r["rule"]: r for r in filter_ablation(flags).collect()}
        assert out["count"]["n_fail"] == 2 and out["count"]["n_fail_only"] == 1
        assert out["len"]["n_fail"] == 1 and out["len"]["n_fail_only"] == 0
        assert out["stop"]["n_fail"] == 0
        assert out["count"]["fail_frac"] == 0.5


class TestWoeIv:
    def test_mirrored_buckets_antisymmetric(self, spark):
        from libcolumnfile_spark.operators.pipeline import woe_iv

        rows = [("A", "g")] * 9 + [("A", "b")] * 1 + [("B", "g")] * 1 + [
            ("B", "b")
        ] * 9
        df = spark.createDataFrame(rows, ["bucket", "y"])
        out = {
            r["bucket"]: r
            for r in woe_iv(df, "bucket", F.col("y") == "g").collect()
        }
        assert out["A"]["woe"] > 0 > out["B"]["woe"]
        assert out["A"]["woe"] == -out["B"]["woe"]  # mirrored counts
        assert out["A"]["iv_term"] == out["B"]["iv_term"] > 0


class TestCurriculumOrder:
    def test_quintiles_and_positions(self, spark):
        from libcolumnfile_spark.operators.pipeline import curriculum_order

        df = spark.createDataFrame(
            [(i, i) for i in range(1, 11)], ["doc_id", "n_chars"]
        )
        out = {r["doc_id"]: r for r in curriculum_order(df).collect()}
        # exact quintile cuts of 1..10 at (2.8, 4.6, 6.4, 8.2)
        assert [out[i]["bucket"] for i in range(1, 11)] == [
            0, 0, 1, 1, 2, 2, 3, 3, 4, 4
        ]
        assert all(out[i]["pos"] == 1 for i in (1, 3, 5, 7, 9))
        assert all(out[i]["pos"] == 2 for i in (2, 4, 6, 8, 10))


class TestEwmaForecast:
    def test_constant_series_is_exact(self, spark):
        import datetime

        from libcolumnfile_spark.operators.aggregates import ewma_forecast

        rows = []
        for x in range(5):
            d = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=x)
            rows += [("g", d)] * 7
        df = spark.createDataFrame(rows, ["event_type", "ts"])
        r = ewma_forecast(df, "event_type", "ts").collect()[0]
        # EWMA of a constant series is the constant; zero residual
        assert r["ewma"] == 7.0 and r["resid"] == 0.0 and r["last_y"] == 7

    def test_recursion_matches_closed_form(self, spark):
        import datetime

        from libcolumnfile_spark.operators.aggregates import ewma_forecast

        ys = [10, 4, 8, 1]
        rows = []
        for x, y in enumerate(ys):
            d = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=x)
            rows += [("g", d)] * y
        df = spark.createDataFrame(rows, ["event_type", "ts"])
        r = ewma_forecast(df, "event_type", "ts", alpha=0.3).collect()[0]
        s = ys[0]
        for y in ys[1:]:
            s = 0.3 * y + 0.7 * s
        assert abs(r["ewma"] - s) < 1e-6


class TestPropZtest:
    def test_counts_partition_and_z_sign(self, spark):
        from libcolumnfile_spark.operators.aggregates import (
            two_proportion_ztest,
        )

        rows = [(i, "purchase" if i % 3 == 0 else "view") for i in range(200)]
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        r = two_proportion_ztest(
            df, "user_id", F.col("event_type") == "purchase", F.lit(True)
        ).collect()[0]
        assert r["n_a"] + r["n_b"] == 200
        assert r["x_a"] + r["x_b"] == len([i for i in range(200) if i % 3 == 0])
        # z sign matches the rate difference
        assert (r["z"] > 0) == (r["p_a"] > r["p_b"])


class TestHllSeeded:
    def test_estimate_within_theory(self, spark):
        from libcolumnfile_spark.operators.aggregates import hll_seeded

        df = spark.createDataFrame([(i,) for i in range(20000)], ["k"])
        r = hll_seeded(df, "k").collect()[0]
        assert r["n_exact"] == 20000
        # 5 sigma of the 6.5% std err
        assert abs(r["rel_err"]) < 0.33

    def test_linear_counting_small_range(self, spark):
        from libcolumnfile_spark.operators.aggregates import hll_seeded

        df = spark.createDataFrame([(i,) for i in range(30)], ["k"])
        r = hll_seeded(df, "k").collect()[0]
        # small cardinality: linear-counting branch, near-exact
        assert r["v_empty"] > 0
        assert abs(r["rel_err"]) < 0.2

    def test_duplicates_do_not_inflate(self, spark):
        from libcolumnfile_spark.operators.aggregates import hll_seeded

        df = spark.createDataFrame([(i % 50,) for i in range(5000)], ["k"])
        r = hll_seeded(df, "k").collect()[0]
        assert r["n_exact"] == 50
        assert abs(r["rel_err"]) < 0.2


class TestHardNegatives:
    def test_excludes_same_label_and_ranks(self, spark):
        from libcolumnfile_spark.operators.similarity import hard_negatives

        q = spark.createDataFrame(
            [(1, [1.0, 0.0], 0)], ["vec_id", "embedding", "label"]
        )
        c = spark.createDataFrame(
            [
                (10, [1.0, 0.0], 0),    # same label: excluded despite cos=1
                (11, [1.0, 0.1], 1),    # hardest negative
                (12, [0.0, 1.0], 1),    # orthogonal negative
                (13, [-1.0, 0.0], 2),   # opposite
            ],
            ["vec_id", "embedding", "label"],
        )
        out = hard_negatives(q, c, k=2).collect()
        got = [(r["c_id"], r["rn"]) for r in sorted(out, key=lambda r: r["rn"])]
        assert got == [(11, 1), (12, 2)]
        assert all(r["c_label"] != r["q_label"] for r in out)


class TestNegativeSample:
    def test_k_per_doc_never_self(self, spark):
        from libcolumnfile_spark.operators.pipeline import negative_sample

        df = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
        out = negative_sample(df, k=3).collect()
        assert len(out) == 60
        assert all(r["neg_id"] != r["doc_id"] for r in out)
        per = {}
        for r in out:
            per.setdefault(r["doc_id"], set()).add(r["slot"])
        assert all(v == {0, 1, 2} for v in per.values())

    def test_deterministic(self, spark):
        from libcolumnfile_spark.operators.pipeline import negative_sample

        df = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
        a = sorted(map(tuple, negative_sample(df).collect()))
        b = sorted(map(tuple, negative_sample(df).collect()))
        assert a == b


class TestModularity:
    def test_two_cliques_with_bridge(self, spark):
        from libcolumnfile_spark.operators.graph import modularity

        # two triangles joined by one bridge edge; communities = cliques
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
            ["src", "dst"],
        )
        labels = spark.createDataFrame(
            [(v, 0) for v in (1, 2, 3)] + [(v, 1) for v in (4, 5, 6)],
            ["node", "community"],
        )
        r = modularity(edges, labels).collect()[0]
        assert r["n_communities"] == 2 and r["n_edges"] == 7
        # 6 of 7 edges internal
        assert r["internal_frac"] == round(6 / 7, 6)
        # Q = sum(e_i/m - (d_i/2m)^2) = 2*(3/7 - (7/14)^2) = 6/7 - 1/2
        assert r["modularity"] == round(6 / 7 - 0.5, 6)

    def test_single_community_zero(self, spark):
        from libcolumnfile_spark.operators.graph import modularity

        edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], ["node", "community"]
        )
        r = modularity(edges, labels).collect()[0]
        # everything internal, one community: Q = 1 - 1 = 0
        assert r["modularity"] == 0.0 and r["internal_frac"] == 1.0


class TestSeqTrigrams:
    def test_consecutive_triples(self, spark):
        import datetime

        from libcolumnfile_spark.operators.relational import sequence_trigrams

        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        # user 1: a b c a b c  -> triples: abc, bca, cab, abc
        for i, e in enumerate("abcabc"):
            rows.append((1, eid, t0 + datetime.timedelta(minutes=i), e))
            eid += 1
        df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
        out = {
            (r["e1"], r["e2"], r["e3"]): (r["n"], r["support"])
            for r in sequence_trigrams(df, min_count=1).collect()
        }
        assert out[("a", "b", "c")][0] == 2
        assert out[("b", "c", "a")][0] == 1
        assert out[("c", "a", "b")][0] == 1
        assert out[("a", "b", "c")][1] == 0.5  # 2 of 4 triples


class TestPsi:
    def test_identical_halves_near_zero(self, spark):
        import datetime

        from libcolumnfile_spark.operators.pipeline import psi_drift

        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        # same value distribution in both halves -> psi ~ 0
        for half in range(2):
            for i in range(100):
                rows.append(
                    (t0 + datetime.timedelta(days=half * 10, minutes=i),
                     float(i % 10))
                )
        df = spark.createDataFrame(rows, ["ts", "value"])
        out = psi_drift(df, "value", "ts").collect()
        assert abs(sum(r["psi_term"] for r in out)) < 1e-6

    def test_shifted_half_flags(self, spark):
        import datetime

        from libcolumnfile_spark.operators.pipeline import psi_drift

        t0 = datetime.datetime(2024, 1, 1)
        rows = [(t0 + datetime.timedelta(minutes=i), float(i % 10))
                for i in range(100)]
        rows += [(t0 + datetime.timedelta(days=10, minutes=i),
                  float(i % 10) + 50.0) for i in range(100)]
        df = spark.createDataFrame(rows, ["ts", "value"])
        psi = sum(r["psi_term"] for r in psi_drift(df, "value", "ts").collect())
        assert psi > 0.2  # canonical retrain alarm fires


class TestAssortativity:
    def test_star_is_disassortative(self, spark):
        from libcolumnfile_spark.operators.graph import degree_assortativity

        # star + one peripheral edge: hubs link to leaves -> r < 0
        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 6)] + [(1, 2)], ["src", "dst"]
        )
        r = degree_assortativity(edges).collect()[0]
        assert r["n_edges"] == 6 and r["r"] < 0

    def test_regular_graph_degenerate(self, spark):
        from libcolumnfile_spark.operators.graph import degree_assortativity

        # 4-cycle: all degrees equal -> zero variance -> NULL r
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
        )
        r = degree_assortativity(edges).collect()[0]
        assert r["r"] is None


class TestGroupKfold:
    def test_groups_never_split(self, spark):
        from libcolumnfile_spark.operators.pipeline import group_kfold
        from pyspark.sql import functions as F

        rows = [(f"s{i % 7}", 100 + i) for i in range(70)]
        df = spark.createDataFrame(rows, ["source", "n_chars"])
        out = group_kfold(df).collect()
        assert sum(r["n_docs"] for r in out) == 70
        assert sum(r["n_groups"] for r in out) == 7  # each source in ONE fold
        assert abs(sum(r["doc_frac"] for r in out) - 1.0) < 1e-6


class TestHeavyHitters:
    def test_exact_above_threshold(self, spark):
        from libcolumnfile_spark.operators.text import heavy_hitters

        # 'a' 60x, 'b' 30x, 40 singletons: n=130, n/k at k=50 -> 2.6
        text_a = " ".join(["a"] * 60)
        text_b = " ".join(["b"] * 30)
        text_c = " ".join(f"w{i}" for i in range(40))
        df = spark.createDataFrame(
            [(1, text_a), (2, text_b), (3, text_c)], ["doc_id", "text"]
        )
        out = {r["token"]: r["n"] for r in heavy_hitters(df, k=50).collect()}
        assert out == {"a": 60, "b": 30}

    def test_mg_summary_never_misses(self, spark):
        from libcolumnfile_spark.operators.text import heavy_hitters

        # adversarial: many distinct fillers to churn the MG counters,
        # one true heavy hitter just over threshold
        filler = " ".join(f"x{i}" for i in range(500))
        hot = " ".join(["hot"] * 30)
        df = spark.createDataFrame(
            [(1, filler), (2, hot)], ["doc_id", "text"]
        )
        # n = 530, k=50 -> threshold 10.6; 'hot' (30) must be found
        out = {r["token"] for r in heavy_hitters(df, k=50).collect()}
        assert "hot" in out


class TestInterarrival:
    def test_known_gaps(self, spark):
        import datetime

        from libcolumnfile_spark.operators.relational import interarrival_stats

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (1, 0, t0, "view"),
            (1, 1, t0 + datetime.timedelta(seconds=10), "click"),
            (1, 2, t0 + datetime.timedelta(seconds=40), "click"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
        out = {r["event_type"]: r for r in interarrival_stats(df).collect()}
        assert "view" not in out  # first event has no gap
        assert out["click"]["n_gaps"] == 2
        assert out["click"]["p50_s"] == 20.0  # median of 10 and 30


class TestGainsCurve:
    def test_perfect_targeting(self, spark):
        from libcolumnfile_spark.operators.aggregates import gains_curve

        # 10 users: ids 0-1 are high-score converters, rest never convert
        rows = []
        for u in range(10):
            n = 20 - u  # score strictly decreasing in user id
            for i in range(n):
                rows.append((u, "purchase" if u < 2 and i == 0 else "view"))
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        out = {r["decile"]: r for r in gains_curve(
            df, "user_id", F.count(F.lit(1)),
            F.col("event_type") == "purchase").collect()}
        # top two deciles capture both converters
        assert out[1]["n_pos"] == 1 and out[2]["n_pos"] == 1
        assert out[2]["cum_capture"] == 1.0
        assert out[10]["n_pos"] == 0
        # lift of a perfect decile = 1/pos_rate_overall = 1/(2/10) = 5
        assert out[1]["lift"] == 5.0
