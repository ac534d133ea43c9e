"""Column-level functions.

Everything here is a Catalyst expression builder (JVM-side, codegen'd) —
no Python UDFs in any hot path. Where a function backs a declared query
(SURVEY.md §2.6), the matching DuckDB SQL fragment lives next to the
Column builder so the engine and the oracle share one pinned semantic.
"""

from tia_data_pipeline_spark.functions.text import (
    WS_CLASS,
    bpe_token_count,
    canonicalize,
    doc_fingerprint,
    json_serialize_nested,
    lang_id,
    money_sum,
    normalize_iso_timestamp,
    parse_iso_timestamp,
    portable_round,
    quality_score,
    strip_ws,
    tokens,
    word_count,
)
from tia_data_pipeline_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "WS_CLASS",
    "word_count",
    "tokens",
    "strip_ws",
    "canonicalize",
    "normalize_iso_timestamp",
    "parse_iso_timestamp",
    "json_serialize_nested",
    "bpe_token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "portable_round",
    "money_sum",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
