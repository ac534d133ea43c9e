"""Structural tests for the near-dup operators: planted duplicates
must be found; unrelated docs must not pair."""

from __future__ import annotations

import random

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
