"""Distributed Bloom-filter membership pre-test.

The broadcast membership joins in `q_decontaminate` / `q_boilerplate`
assume the key set fits a broadcast. When it outgrows that (a very
large benchmark suite, a blocklist of billions of fingerprints), the
standard move is a Bloom filter IN FRONT of the exact join: the probe
side drops almost everything cheaply, and the surviving sliver pays
the exact (shuffle) join. This module builds that filter as a
DATAFRAME — never a driver-side object:

- **Build**: each key hashes to ``k`` bit positions in an ``m``-bit
  space; positions fold into 64-bit words by ``bit_or`` aggregation.
  The filter IS a tiny DataFrame ``(idx, bits)`` with at most m/64
  rows — built distributed, broadcast to probes. (Contrast
  ``DataFrame.stat.bloomFilter``, which collects the filter into the
  driver; at engine scale the build side itself is a big frame.)
- **Probe**: ``k`` BROADCAST hash joins (one per hash function — k is
  small, the relation is the same tiny word table), each checking one
  bit. No shuffle ever touches the probe side, no row explodes: each
  join adds one column. Rows where all ``k`` bits are set are
  *possible* members (false-positive rate ≈ (1-e^{-kn/m})^k); rows
  failing any bit are DEFINITELY absent — zero false negatives, so
  exact-join semantics are preserved by construction when composed as
  ``bloom_prefilter(...) ⋈_exact keys``.

Reference scope: the reference has no membership tier at all (it
re-inserts every page, posts_pipeline.py:52-58); this is the SURVEY
§2.4 scale path for membership against sets beyond broadcast reach.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_params",
    "bloom_build",
    "bloom_prefilter",
    "bloom_semi_join",
    "bloom_anti_join",
]

_BLOOM_SEED = 0x51ED


def bloom_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Classic sizing: ``m = -n ln p / (ln 2)^2`` bits (rounded up to a
    64-bit word), ``k = (m/n) ln 2`` hashes. Returns ``(m_bits,
    k_hashes)``."""
    if n_keys < 1:
        raise ValueError("n_keys must be >= 1")
    if not 0 < fp_rate < 1:
        raise ValueError("fp_rate must be in (0, 1)")
    m = math.ceil(-n_keys * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """The k bit positions of a key: independent xxhash64 seeds."""
    return [
        F.pmod(F.xxhash64(key, F.lit(_BLOOM_SEED + i)), F.lit(m_bits))
        for i in range(k_hashes)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, *, m_bits: int, k_hashes: int
) -> DataFrame:
    """Aggregate the key set into a word table ``(idx int, bits
    bigint)`` of at most ``m_bits/64`` rows. One keyed shuffle of
    (idx, partial-or) pairs — partial aggregation collapses each map
    partition to <= m/64 rows before the wire regardless of key
    count."""
    if m_bits < 64 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k_hashes))).alias("pos")
    return (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """Rows of ``df`` whose key is POSSIBLY in the set the filter was
    built from (definitely-absent rows are dropped; no false
    negatives). The probe plan is ``k`` broadcast joins on the word
    index — the probe side never shuffles and never widens by more
    than one bitmap word per hash.

    MATERIALIZE the filter before probing (``persist()`` + an action,
    or write it to parquet and read it back — it is a <= m/64-row
    table, so storage is trivial): the probe references the filter
    once per hash function, and Spark's exchange reuse does not
    collapse the k alias-projected copies of an unmaterialized build
    plan, so the build aggregate would re-run k times. The parquet
    round-trip probe plan is exactly k broadcasts of a tiny scan and
    ZERO keyed exchanges (pinned in tests/test_membership.py)."""
    if m_bits < 64 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    out = df
    key = F.col(key_col)
    for i, pos in enumerate(_positions(key, m_bits, k_hashes)):
        b = bloom.select(
            F.col("idx").alias(f"_b{i}_idx"), F.col("bits").alias(f"_b{i}_bits")
        )
        out = (
            out.withColumn(f"_b{i}_pos", pos)
            .join(
                F.broadcast(b),
                (F.col(f"_b{i}_pos") / 64).cast("int") == F.col(f"_b{i}_idx"),
                "left",
            )
            .filter(
                F.coalesce(F.col(f"_b{i}_bits"), F.lit(0).cast("bigint")).bitwiseAND(
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(_b{i}_pos, 64) AS INT))"
                    )
                )
                != 0
            )
        )
    return out.drop(
        *[c for i in range(k_hashes) for c in (f"_b{i}_idx", f"_b{i}_bits", f"_b{i}_pos")]
    )


def bloom_semi_join(
    df: DataFrame,
    key_col: str,
    keys: DataFrame,
    keys_col: str,
    bloom: DataFrame,
    *,
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """Rows of ``df`` whose key IS in ``keys`` — exact semantics, Bloom
    cost profile. The pre-test (zero false negatives) drops the bulk of
    ``df`` before any shuffle; only the surviving sliver pays the exact
    semi-join against the full key set. ``bloom`` must be the
    materialized output of :func:`bloom_build` over
    ``keys[keys_col]``."""
    sliver = bloom_prefilter(df, key_col, bloom, m_bits=m_bits, k_hashes=k_hashes)
    rhs = keys.select(F.col(keys_col).alias("_bloom_k")).distinct()
    return sliver.join(rhs, F.col(key_col) == F.col("_bloom_k"), "left_semi")


def bloom_anti_join(
    df: DataFrame,
    key_col: str,
    keys: DataFrame,
    keys_col: str,
    bloom: DataFrame,
    *,
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """Rows of ``df`` whose key is NOT in ``keys`` — the blocklist /
    decontamination verb. Definitely-absent rows (the overwhelming
    majority against a sparse blocklist) pass WITHOUT touching a
    shuffle: only Bloom-possible rows are re-checked exactly, and the
    confirmed hits subtract via an anti-join on the (tiny) confirmed
    key set, never on the full blocklist. ``confirmed`` carries a
    broadcast hint: it is tiny by construction (bloom-possible keys
    that ARE in the set), but Spark has no size stats for the derived
    plan and would otherwise fall back to a sort-merge anti-join that
    shuffles the full probe side (pinned by
    tests/test_membership.py::test_anti_join_probe_side_is_broadcast)."""
    possible = bloom_prefilter(df, key_col, bloom, m_bits=m_bits, k_hashes=k_hashes)
    rhs = keys.select(F.col(keys_col).alias("_bloom_k")).distinct()
    confirmed = (
        possible.select(F.col(key_col).alias("_bloom_hit"))
        .distinct()
        .join(rhs, F.col("_bloom_hit") == F.col("_bloom_k"), "left_semi")
    )
    return df.join(
        F.broadcast(confirmed), F.col(key_col) == F.col("_bloom_hit"), "left_anti"
    )
