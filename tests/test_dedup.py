"""Structural tests for the near-dup operators: planted duplicates
must be found; unrelated docs must not pair."""

from __future__ import annotations

import random

import pytest

from tia_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from pyspark.sql import functions as F


def _docs(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    base = " ".join(rng.choice(vocab) for _ in range(120))
    near = base.replace("w1", "w199", 3)  # a few token edits
    far = " ".join(rng.choice(vocab) for _ in range(120))
    rows = [(1, base), (2, base), (3, near), (4, far), (5, "short text"), (6, "")]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_collapses_identical(spark):
    got = exact_dedup(_docs(spark), "text", "doc_id")
    # 1 and 2 are byte-identical → one hash bucket, min id survives
    ids = sorted(r["doc_id"] for r in got.collect())
    assert ids == [1, 3, 4, 5, 6]


def test_minhash_finds_planted_near_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(_docs(spark), "text", "doc_id", threshold=0.5).collect()
    }
    assert (1, 2) in pairs  # identical
    assert (1, 3) in pairs and (2, 3) in pairs  # near-dup
    assert all({a, b} <= {1, 2, 3} for a, b in pairs), f"false positives: {pairs}"


def test_ngram_jaccard_exact_pairs(spark):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), "text", "doc_id", threshold=0.4).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.4 <= got[(1, 3)] < 1.0
    assert all({a, b} <= {1, 2, 3} for a, b in got)


def test_simhash_identical_docs_same_fingerprint(spark):
    fp = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark), "text", "doc_id").collect()}
    assert fp[1] == fp[2]
    # near-dup hamming distance small; far doc large
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(fp[1], fp[3]) <= 8
    assert ham(fp[1], fp[4]) > 8
    # empty doc drops out (no tokens)
    assert 6 not in fp


def test_word_shingles_short_docs(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c"), (3, "")], "id int, t string")
    got = {
        r["id"]: r["s"]
        for r in df.select("id", word_shingles(F.col("t"), 3).alias("s")).collect()
    }
    assert got[1] == [] and got[3] == []
    assert got[2] == ["a b c"]


def test_minhash_portable_path_finds_planted_near_dups(spark):
    """The md5-portable hash family must still find planted near-dups
    (same banding math, different shingle hash), and both paths must
    agree on the high-estimate pairs for identical planted content."""
    from tia_data_pipeline_spark.operators.dedup import minhash_near_duplicates

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep green forest to hide from every single hunter nearby"
    )
    rows = [(1, base), (2, base + " tonight"), (3, "completely different words " * 8)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for portable in (False, True):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in minhash_near_duplicates(
                df, "text", "doc_id", threshold=0.5, portable=portable
            ).collect()
        }
        assert (1, 2) in pairs, f"portable={portable} missed the planted near-dup"
        assert all(3 not in p for p in pairs)


class TestSubstringOverlap:
    def _frame(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_planted_shared_block_found_alignment_independent(self, spark):
        import random

        from tia_data_pipeline_spark.operators.dedup import substring_overlap_pairs

        rng = random.Random(7)

        def noise(n):
            return "".join(rng.choice("abcdefghij ") for _ in range(n))

        block = "".join(rng.choice("KLMNOPQRST") for _ in range(400))
        rows = [
            (1, noise(100) + block + noise(50)),      # block at offset 100
            (2, noise(37) + block + noise(200)),      # block at offset 37
            (3, noise(600)),                          # unrelated
            (4, noise(500)),                          # unrelated
        ]
        pairs = substring_overlap_pairs(
            self._frame(spark, rows), "text", "doc_id", k=32, mod=16, min_shared=2
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in found, "shared 400-char block missed"
        assert all(p == (1, 2) for p in found), f"false pairs: {found}"
        shared = {(r["id_a"], r["id_b"]): r["shared"] for r in pairs}[(1, 2)]
        # ~(400-31)/16 ≈ 23 expected shared samples; allow wide slack
        assert shared >= 5

    def test_short_docs_sketch_empty(self, spark):
        from tia_data_pipeline_spark.operators.dedup import (
            char_kmer_sketch,
            substring_overlap_pairs,
        )

        df = self._frame(spark, [(1, "tiny"), (2, "tiny"), (3, None)])
        sk = df.select(char_kmer_sketch(F.col("text"), k=32).alias("s")).collect()
        assert [r["s"] for r in sk][:2] == [[], []]
        assert (
            substring_overlap_pairs(df.filter(F.col("text").isNotNull()), "text", "doc_id").count()
            == 0
        )

    def test_hot_kmer_cap_excludes_mass_duplication(self, spark):
        from tia_data_pipeline_spark.operators.dedup import substring_overlap_pairs

        block = "Z" * 40 + "QWERTYUIOPASDFGHJKLZXCVBNMqwertyuiopasdf" * 5
        rows = [(i, f"prefix{i} " + block) for i in range(1, 31)]
        pairs = substring_overlap_pairs(
            self._frame(spark, rows), "text", "doc_id", max_df=20
        )
        # 30 docs share every k-mer -> df=30 > cap -> no quadratic pairs
        assert pairs.count() == 0

    def test_bad_args(self, spark):
        from tia_data_pipeline_spark.operators.dedup import char_kmer_sketch

        with pytest.raises(ValueError):
            char_kmer_sketch(F.col("text"), k=1)
        with pytest.raises(ValueError):
            char_kmer_sketch(F.col("text"), mod=0)


def test_hot_shingle_10k_df_dropped_before_any_list(spark):
    """Round-7 hostile fixture (VERDICT r6 #1): a corpus-stop shingle
    shared by 10,000 documents must be dropped by the two-pass cap's
    COUNT pre-filter — it never reaches a collect_list buffer (pinned
    structurally in test_plans.py::test_bucket_collects_are_semi_join_
    capped) and contributes no candidate pairs — while a planted true
    near-dup pair sharing many sub-cap shingles still surfaces."""
    hot = [(i, f"hot common shingle u{i} v{i} w{i}") for i in range(1, 10_001)]
    base = " ".join(f"tok{j}" for j in range(60))
    planted = [(20_001, base), (20_002, base + " extra")]
    df = spark.createDataFrame(hot + planted, "doc_id bigint, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.5, max_df=20
        ).collect()
    }
    assert pairs == {(20_001, 20_002)}
