"""ANN structure tests: multi-probe recall dominates single-probe;
IVF finds planted-cluster neighbors that brute force confirms."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tia_data_pipeline_spark.operators.similarity import (
    brute_force_top_k,
    ivf_top_k,
    lsh_top_k,
    projection_matrix,
)


def _clustered_corpus(spark, n_clusters=8, per_cluster=40, dim=16, seed=5):
    """Gaussian blobs: IVF's favorable geometry (the test data's random
    embeddings are isotropic, adversarial for any ANN)."""
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in c]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_ivf_matches_brute_force_on_clusters(spark):
    corpus = _clustered_corpus(spark)
    probe = corpus.filter(F.col("vec_id") == 0)
    rest = corpus.filter(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in brute_force_top_k(rest, probe, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_top_k(rest, probe, k=10, n_lists=8, n_probe=2).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9, f"IVF recall {recall} on clustered data (exact={exact}, ivf={approx})"


def test_multiprobe_recall_dominates_single_probe(spark):
    corpus = _clustered_corpus(spark, n_clusters=4, per_cluster=60)
    probe = corpus.filter(F.col("vec_id") == 0)
    rest = corpus.filter(F.col("vec_id") != 0)
    proj = projection_matrix(bits=8, dim=16, seed=7)
    exact = {r["vec_id"] for r in brute_force_top_k(rest, probe, k=10).collect()}
    single = {r["vec_id"] for r in lsh_top_k(rest, probe, k=10, proj=proj).collect()}
    multi = {
        r["vec_id"]
        for r in lsh_top_k(rest, probe, k=10, proj=proj, hamming_probe=1).collect()
    }
    assert len(multi & exact) >= len(single & exact)
    assert len(multi) >= len(single)
