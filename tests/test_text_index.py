"""Persisted inverted text index: serving ≡ the full-scan q_bm25
query, and the bucket predicate prunes partitions like the IVF index."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.operators.text_index import (
    _INDEX_SEED,
    bm25_search_indexed,
    build_text_index,
)


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tidx") / "index")
    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    build_text_index(docs, path)
    return path


def test_indexed_serving_equals_full_scan_query(spark, index_path):
    """The strongest possible check: the index serve path must
    reproduce q_bm25's top-20 EXACTLY (same terms, same integer
    arithmetic, same tiebreak) — build denormalization and pruning are
    invisible in the result."""
    from tia_data_pipeline_spark.plans.llm import _BM25_TERMS, q_bm25

    expect = [tuple(r) for r in q_bm25(spark, SMOKE_SF).collect()]
    got = [
        tuple(r)
        for r in bm25_search_indexed(spark, index_path, list(_BM25_TERMS), k=20).collect()
    ]
    assert got == expect and len(got) == 20


def test_serve_scan_is_partition_pruned(spark, index_path):
    """The _bucket IN predicate must reach the scan as a
    PartitionFilter, and only the query buckets' files open."""
    df = bm25_search_indexed(spark, index_path, ["spark"], k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters" in p and "_bucket" in p

    bucket = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("spark"), F.lit(_INDEX_SEED)), F.lit(16)).alias("b")
    ).collect()[0]["b"]
    read_files = {
        r[0]
        for r in spark.read.parquet(index_path)
        .filter(F.col("_bucket") == int(bucket))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    all_files = set(spark.read.parquet(index_path).inputFiles())
    assert read_files and read_files < all_files
    assert all(f"/_bucket={int(bucket)}/" in f for f in read_files)


def test_df_denormalized_consistently(spark, index_path):
    """Every posting of a term carries the same df, equal to the
    term's distinct-doc count — the build-time window is coherent."""
    post = spark.read.parquet(index_path)
    bad = (
        post.groupBy("tok")
        .agg(
            F.count("*").alias("n_docs_actual"),
            F.min("df").alias("df_min"),
            F.max("df").alias("df_max"),
        )
        .filter(
            (F.col("df_min") != F.col("df_max"))
            | (F.col("df_min") != F.col("n_docs_actual"))
        )
        .count()
    )
    assert bad == 0


def test_bucket_modulus_persists_with_index(spark, tmp_path):
    """Review r5: the serve path must take n_buckets from the index
    itself — a non-default build modulus previously needed the caller
    to repeat it, and a mismatch silently pruned away the partitions
    holding the terms."""
    from tia_data_pipeline_spark.plans.llm import _BM25_TERMS, q_bm25

    path = str(tmp_path / "idx8")
    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    build_text_index(docs, path, n_buckets=8)
    got = [
        tuple(r)
        for r in bm25_search_indexed(spark, path, list(_BM25_TERMS), k=20).collect()
    ]
    expect = [tuple(r) for r in q_bm25(spark, SMOKE_SF).collect()]
    assert got == expect


def test_bad_args(spark, index_path):
    with pytest.raises(ValueError):
        bm25_search_indexed(spark, index_path, [])
    with pytest.raises(ValueError):
        build_text_index(
            load_table(spark, SMOKE_SF, "documents").select("doc_id", "text"),
            index_path,
            n_buckets=0,
        )
