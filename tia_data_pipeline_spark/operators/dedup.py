"""Deduplication operators (exact + near-duplicate).

Extension tier (SURVEY §2.4): the reference's PK conflict-skip
(``posts_pipeline.py:57``) generalized to content-level dedup for
LLM-training pipelines. Everything is expression-level Spark — hashing,
shingling, MinHash, SimHash all run inside whole-stage codegen; no
Python UDFs.

Scale posture (100 TB):
- exact dedup shuffles 32-byte digests, never documents;
- MinHash-LSH bounds candidate pairs via banding, and a document-
  frequency cap keeps degenerate shingles from quadratic blowup;
- signatures are fixed-width arrays (k·8 bytes/doc), so the LSH
  self-join shuffles signatures, not text.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tia_data_pipeline_spark.functions.text import portable_round, tokens

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def content_hash(col: Column) -> Column:
    """sha256 hex digest of a text column (matches DuckDB ``sha256``)."""
    return F.sha2(col, 256)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One survivor per distinct content hash (lowest id wins).

    Group-by on the digest: map-side partial min, 32-byte shuffle keys.
    """
    return (
        df.select(content_hash(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup detection
# ---------------------------------------------------------------------------

# Deterministic hash family h_i(x) = (a_i * x + b_i) mod P over
# x = pmod(xxhash64(shingle), 2^31). a_i < 2^31 keeps products < 2^62
# (no ANSI overflow); P is a Mersenne prime.
_MINHASH_P = (1 << 61) - 1
_X_MOD = 1 << 31


def _hash_family(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _X_MOD), rng.randrange(0, _X_MOD)) for _ in range(k)]


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM-side:
    split → sliding-window via sequence/transform → distinct).

    Guarded for short docs: Spark ``sequence(1, 0)`` would *descend*
    ([1,0]), so < n tokens returns an empty array explicitly.
    """
    toks = tokens(col)
    n_sh = F.size(toks) - (n - 1)
    return F.when(n_sh < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
            )
        )
    )


def minhash_signature(col: Column, k: int = 32, seed: int = 42, shingle_n: int = 3) -> Column:
    """k-component MinHash signature (array<bigint>) of a text column."""
    xs = F.transform(
        word_shingles(col, shingle_n), lambda s: F.pmod(F.xxhash64(s), F.lit(_X_MOD))
    )
    comps = [
        F.array_min(F.transform(xs, lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(_MINHASH_P)))
        for a, b in _hash_family(k, seed)
    ]
    return F.array(*comps)


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding.

    shingle → k minhashes → b bands of r=k/b rows → bucket-join within
    (band, bucket) → estimate Jaccard as matching-component fraction →
    filter ≥ threshold. Returns (id_a, id_b, est_jaccard), id_a < id_b.

    The candidate join keys on (band_idx, band_hash): only documents
    agreeing on a whole band collide, so the shuffle fan-out is bounded
    by the banding probability curve, not |docs|².
    """
    assert k % bands == 0, "k must divide into equal bands"
    r = k // bands
    sig = df.select(
        F.col(id_col).alias("_id"), minhash_signature(F.col(text_col), k, seed).alias("_sig")
    ).filter(F.element_at("_sig", 1).isNotNull())  # drop docs with zero shingles

    banded = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(F.slice("_sig", i * r + 1, r)).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_sig", "bb.band", "bb.bucket")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._sig").alias("sig_a"),
            F.col("r._sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(float(k))
    )
    return (
        cand.withColumn("est_jaccard", portable_round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted-index form — SQL-expressible oracle)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int = 100,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs via inverted index.

    explode shingles → drop shingles appearing in > max_df docs (the
    standard hot-key guard: a stop-shingle would otherwise induce a
    quadratic self-join) → count shared shingles per pair →
    |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold. Returns (id_a, id_b, jaccard).
    """
    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(word_shingles(F.col(text_col), n)).alias("sh")
    )
    rare = sh.join(
        sh.groupBy("sh").agg(F.count("*").alias("df_")).filter(F.col("df_") <= max_df),
        "sh",
    ).select("_id", "sh")
    # Jaccard is defined over the capped shingle sets (sizes and overlap
    # must use the same universe or the ratio can exceed 1).
    doc_sizes = rare.groupBy("_id").agg(F.count("*").alias("n_sh"))
    a = rare.alias("a")
    b = rare.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    ja = (
        shared.join(doc_sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(doc_sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn(
            "jaccard",
            portable_round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return ja


# ---------------------------------------------------------------------------
# SimHash (portable md5-bit construction — see plans/llm.py for oracle)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def _md5_bit_expr(tok: str, j: int) -> str:
    """SQL fragment (valid in BOTH Spark SQL and DuckDB) for bit j of a
    token's 32-bit md5-derived hash: hex digit j//4, bit j%4."""
    digit = f"(instr('0123456789abcdef', substr(md5({tok}), {j // 4 + 1}, 1)) - 1)"
    return f"(CAST(floor({digit} / {1 << (j % 4)}) AS INT) % 2)"


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash fingerprint per document.

    Classic construction: each distinct token votes ±1 on every bit of
    its hash; fingerprint bit j is 1 iff the vote sum is positive. The
    token hash is md5-derived so the DuckDB oracle can reproduce it
    bit-for-bit (``plans/llm.py::q_simhash``).
    """
    toked = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    votes = [
        F.expr(f"sum(2 * {_md5_bit_expr('tok', j)} - 1)").alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    scored = toked.groupBy("_id").agg(*votes)
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp + term
    return scored.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash_oracle_sql(table: str, text_tokens_sql: str, id_col: str) -> str:
    """DuckDB SQL mirroring :func:`simhash` (same md5 bit construction,
    same tie rule score>0)."""
    votes = ", ".join(
        f"sum(2 * {_md5_bit_expr('tok', j)} - 1) AS v{j}" for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(SIMHASH_BITS)
    )
    return (
        f"SELECT _id AS {id_col}, {fp} AS simhash FROM ("
        f"  SELECT _id, {votes} FROM ("
        f"    SELECT {id_col} AS _id, unnest(list_distinct({text_tokens_sql})) AS tok "
        f"    FROM {table}) GROUP BY _id)"
    )
