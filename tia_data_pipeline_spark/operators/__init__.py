"""Relational + LLM-pipeline operators.

Composable DataFrame→DataFrame operators. Everything is built from
declarative Spark primitives (the physical strategy — broadcast vs
sort-merge, partial aggregation, AQE skew handling — stays Catalyst's
call); Python only orchestrates plan construction.
"""

from tia_data_pipeline_spark.operators.dedup import (
    cut_duplicated_spans,
    duplicated_spans,
    exact_dedup,
    minhash_dedup_incremental,
    minhash_index_append,
    minhash_index_compact,
    minhash_near_duplicates,
    minhash_signature_frame,
    minhash_write_index,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup_incremental,
    simhash_index_append,
    simhash_index_compact,
    simhash_write_index,
    substring_overlap_pairs,
    word_shingles,
)
from tia_data_pipeline_spark.operators.features import zscore, zscore_pandas
from tia_data_pipeline_spark.operators.graph import (
    connected_components,
    connected_components_twophase,
    dedup_components,
    thread_closure,
)
from tia_data_pipeline_spark.operators.incremental import (
    dedup_batch,
    incremental_append,
    merge_upsert_plan,
)
from tia_data_pipeline_spark.operators.multimodal import (
    attach_payload,
    decode_payloads,
    resize_images,
    sample_frames,
)
from tia_data_pipeline_spark.operators.sampling import hash_sample, stratified_hash_sample
from tia_data_pipeline_spark.operators.scale import (
    compact_partitioned_index,
    partitioned_index_stats,
    salted_group_count,
    salted_join,
    write_bucketed,
)
from tia_data_pipeline_spark.operators.similarity import (
    brute_force_top_k,
    embedding_dedup_incremental,
    embedding_index_append,
    embedding_index_compact,
    embedding_near_duplicates,
    embedding_write_index,
    ivf_build_index,
    ivf_search_batch,
    ivf_search_indexed,
    ivf_top_k,
    ivf_write_index,
    projection_bits_for,
    knn_join,
    knn_join_bucketed,
    lsh_top_k,
    semantic_dedup_pairs,
)
from tia_data_pipeline_spark.operators.windows import (
    daily_window,
    sessionize,
    sliding_window,
)

__all__ = [
    "exact_dedup",
    "duplicated_spans",
    "cut_duplicated_spans",
    "substring_overlap_pairs",
    "minhash_write_index",
    "minhash_dedup_incremental",
    "minhash_index_append",
    "minhash_index_compact",
    "simhash_write_index",
    "simhash_dedup_incremental",
    "simhash_index_append",
    "simhash_index_compact",
    "embedding_write_index",
    "embedding_dedup_incremental",
    "embedding_index_append",
    "embedding_index_compact",
    "ivf_search_batch",
    "semantic_dedup_pairs",
    "compact_partitioned_index",
    "partitioned_index_stats",
    "connected_components",
    "connected_components_twophase",
    "dedup_components",
    "minhash_near_duplicates",
    "minhash_signature_frame",
    "ngram_jaccard_pairs",
    "simhash",
    "word_shingles",
    "zscore",
    "zscore_pandas",
    "thread_closure",
    "incremental_append",
    "dedup_batch",
    "merge_upsert_plan",
    "attach_payload",
    "decode_payloads",
    "resize_images",
    "sample_frames",
    "hash_sample",
    "stratified_hash_sample",
    "salted_join",
    "salted_group_count",
    "write_bucketed",
    "brute_force_top_k",
    "embedding_near_duplicates",
    "ivf_build_index",
    "ivf_search_indexed",
    "ivf_top_k",
    "ivf_write_index",
    "projection_bits_for",
    "knn_join",
    "knn_join_bucketed",
    "lsh_top_k",
    "daily_window",
    "sessionize",
    "sliding_window",
]
