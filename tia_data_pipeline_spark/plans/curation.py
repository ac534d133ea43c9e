"""Training-data curation tier — corpus composition, split assignment,
benchmark decontamination, and embedding compression (SURVEY §2.4
extensions; no reference analogue — these are the operations a
100 TB pre-training pipeline runs between ingest and training).

Every query here follows the contract rules: built-in JVM expressions
only (no Python UDFs), every computed column aliased identically to
the DuckDB oracle, doubles rounded via the portable floor form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.functions import text as TX
from tia_data_pipeline_spark.functions.vectors import cosine_sql, cosine_similarity
from tia_data_pipeline_spark.operators import sampling as SMP
from tia_data_pipeline_spark.operators.dedup import word_shingles
from tia_data_pipeline_spark.operators.similarity import _sign_bits
from tia_data_pipeline_spark.plans.contract import contract_query
from tia_data_pipeline_spark.plans.llm import _DOC_TOKENS_SQL, _PROJ, _bucket_sql, _docs

# ---------------------------------------------------------------------------
# q_source_mix — training-mixture composition report
# ---------------------------------------------------------------------------


@contract_query(
    "q_source_mix",
    oracle=(
        "WITH per AS (SELECT source, lang, {wc} AS n_tok FROM documents), "
        "grp AS (SELECT source, lang, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens "
        "  FROM per GROUP BY source, lang), "
        "tot AS (SELECT sum(n_tokens)::DOUBLE AS total FROM grp) "
        "SELECT source, lang, n_docs, n_tokens, "
        f"  {TX.portable_round_sql('n_tokens / total', 6)} AS token_share "
        "FROM grp CROSS JOIN tot"
    ).format(wc=TX.word_count_sql("text")),
    covers="training-data curation (mixture composition: per-source/lang token share)",
)
def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture composition: per (source, lang) document and token
    counts plus each cell's share of the corpus token budget — the
    report that drives mixture re-weighting decisions.

    Scale shape: the token count is ``size(split(...))`` — a narrow
    per-row projection, no explode — so the only shuffle is the partial
    → final aggregate on (source, lang), whose cardinality is the
    number of mixture cells (tiny). The corpus total joins back in as a
    broadcast scalar computed FROM the grouped frame (AQE reuses the
    exchange for the diamond), never a driver-side collect."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select("source", "lang", TX.word_count(F.col("text")).alias("n_tok"))
    grp = per.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    tot = grp.agg(F.sum("n_tokens").cast("double").alias("total"))
    return grp.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        TX.portable_round(F.col("n_tokens").cast("double") / F.col("total"), 6).alias(
            "token_share"
        ),
    )


# ---------------------------------------------------------------------------
# q_split_assign — deterministic train/val/test assignment
# ---------------------------------------------------------------------------

_TRAIN_BUCKETS = 12  # 12/16 train, 2/16 val, 2/16 test
_VAL_BUCKETS = 14


def _split_case_sql(bucket_expr: str) -> str:
    return (
        f"CASE WHEN {bucket_expr} < {_TRAIN_BUCKETS} THEN 'train' "
        f"WHEN {bucket_expr} < {_VAL_BUCKETS} THEN 'val' ELSE 'test' END"
    )


@contract_query(
    "q_split_assign",
    oracle=(
        "WITH a AS (SELECT lang, {split} AS split FROM documents), "
        "g AS (SELECT lang, split, count(*) AS n_docs FROM a GROUP BY lang, split) "
        "SELECT lang, split, n_docs, "
        f"  {TX.portable_round_sql('n_docs::DOUBLE / sum(n_docs) OVER (PARTITION BY lang)', 6)} "
        "  AS lang_share "
        "FROM g"
    ).format(split=_split_case_sql(SMP.hash_bucket_sql("doc_id"))),
    covers="training-data curation (deterministic train/val/test split assignment)",
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive, disjoint train/val/test assignment (12/2/2 of 16
    id-hash buckets) with the per-language composition report.

    Unlike :func:`~...sampling.hash_sample` (a *filter*), this labels
    every row — the property that matters is the assignment is a pure
    function of the id: stable across reruns, repartitioning, engine
    swaps, and corpus growth (a doc never migrates between splits when
    other docs are added). The report aggregates to (lang, split) —
    one partial→final shuffle on a tiny key space — then the
    within-language share is a window over the already-aggregated
    frame (rows = #langs × 3, so the window exchange is negligible)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = SMP.hash_bucket("doc_id")
    split = (
        F.when(bucket < _TRAIN_BUCKETS, F.lit("train"))
        .when(bucket < _VAL_BUCKETS, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    g = (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )
    lang_total = F.sum("n_docs").over(Window.partitionBy("lang"))
    return g.select(
        "lang",
        "split",
        "n_docs",
        TX.portable_round(F.col("n_docs").cast("double") / lang_total, 6).alias("lang_share"),
    )


# ---------------------------------------------------------------------------
# q_decontaminate — benchmark n-gram decontamination
# ---------------------------------------------------------------------------

_BENCH_MOD = 17  # doc_id % 17 == 0 plays the held-out benchmark set


@contract_query(
    "q_decontaminate",
    oracle=(
        "WITH sh AS (SELECT doc_id, unnest(list_distinct("
        "    [array_to_string(tk[i:i+2], ' ') "
        "     FOR i IN range(1, greatest(len(tk) - 2, 0) + 1)])) AS sh "
        f"  FROM (SELECT doc_id, {_DOC_TOKENS_SQL} AS tk FROM documents)), "
        f"b AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {_BENCH_MOD} = 0), "
        f"c AS (SELECT doc_id, sh FROM sh WHERE doc_id % {_BENCH_MOD} <> 0), "
        "a AS (SELECT c.doc_id, count(*) AS n_shingles, count(b.sh) AS n_hits "
        "  FROM c LEFT JOIN b ON c.sh = b.sh GROUP BY c.doc_id) "
        "SELECT doc_id, n_shingles, n_hits, "
        f"  {TX.portable_round_sql('n_hits::DOUBLE / n_shingles', 6)} AS overlap "
        "FROM a WHERE n_hits > 0"
    ),
    covers="training-data curation (benchmark n-gram decontamination)",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for every training document, the
    fraction of its distinct word-3-grams that appear anywhere in the
    held-out benchmark set (docs with ``doc_id % 17 == 0`` stand in for
    the eval suite). Docs with any overlap are reported; a pipeline
    drops rows above a threshold before training.

    Scale shape: the benchmark side of a real pipeline is a few eval
    suites — megabytes against a 100 TB corpus — so its distinct
    shingle set is built once and BROADCAST; the corpus side streams
    through explode → broadcast hash join → partial-agg, with the only
    shuffle the (doc_id) aggregate. No shuffle ever carries the corpus
    shingles to a join exchange, and the quadratic pair-join of the
    dedup family never appears (membership, not similarity). At even
    larger benchmark sets the broadcast degrades gracefully to a
    bloom-filter pre-test in front of the same plan."""
    docs = _docs(spark, sf_dir, fan=False)
    sh = docs.select("doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("sh"))
    bench = (
        sh.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("sh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
    agg = (
        corpus.join(F.broadcast(bench), "sh", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shingles"), F.count("hit").alias("n_hits"))
    )
    return agg.filter(F.col("n_hits") > 0).select(
        "doc_id",
        "n_shingles",
        "n_hits",
        TX.portable_round(F.col("n_hits").cast("double") / F.col("n_shingles"), 6).alias(
            "overlap"
        ),
    )


# ---------------------------------------------------------------------------
# q_embed_quantize — int8 embedding quantization error report
# ---------------------------------------------------------------------------


@contract_query(
    "q_embed_quantize",
    oracle=(
        "WITH prepped AS (SELECT label, embedding::DOUBLE[] AS v, "
        "    greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 1e-12) "
        "      / 127.0 AS s "
        "  FROM embeddings), "
        "q AS (SELECT label, "
        "  floor(list_reduce(list_prepend(0.0, "
        "     list_transform(v, x -> (x - floor(x / s + 0.5) * s) "
        "                         * (x - floor(x / s + 0.5) * s))), "
        "     (acc, x) -> acc + x) / len(v) * 1000000000.0 + 0.5)::BIGINT AS sqerr_n "
        "  FROM prepped) "
        "SELECT label, count(*) AS n_vecs, "
        f"  {TX.portable_round_sql('sum(sqerr_n)::DOUBLE / count(*)', 3)} AS mean_sqerr_n "
        "FROM q GROUP BY label"
    ),
    covers="training-data curation (int8 embedding quantization: reconstruction error)",
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization quality report: quantize
    each embedding with scale = max|x|/127, dequantize, and aggregate
    the mean squared reconstruction error per label (nano-units, so the
    per-vector value is integered BEFORE the aggregate and the group
    mean is order-independent — same trick as q_embed_stats).

    Why it's an engine op: int8 storage is 4× less scan volume for the
    ANN/k-NN family at 100 TB, and the decision to ship quantized
    vectors hinges on exactly this report. All arithmetic is a fixed
    left-to-right double fold (F.aggregate ≡ list_reduce) with
    floor-form rounding, so the oracle matches bit-for-bit. The scale
    column is computed in a projection BEFORE the fold so the lambda
    captures a cheap column ref, not a re-evaluated array_max (HOF
    bodies re-run captured subexpressions per element)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    prepped = emb.select(
        "label",
        v.alias("v"),
        (
            F.greatest(F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12))
            / F.lit(127.0)
        ).alias("s"),
    )
    diff = lambda x: x - F.floor(x / F.col("s") + F.lit(0.5)) * F.col("s")  # noqa: E731
    sqerr = F.aggregate(
        F.transform(F.col("v"), diff), F.lit(0.0), lambda acc, d: acc + d * d
    ) / F.size(F.col("v"))
    sqerr_n = F.floor(sqerr * F.lit(1_000_000_000.0) + F.lit(0.5)).cast("bigint")
    return (
        prepped.select("label", sqerr_n.alias("sqerr_n"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            TX.portable_round(F.sum("sqerr_n").cast("double") / F.count("*"), 3).alias(
                "mean_sqerr_n"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_ann_recall — ANN index quality evaluation (recall@k vs exact)
# ---------------------------------------------------------------------------

_RECALL_K = 10
_N_PROBES = 8


@contract_query(
    "q_ann_recall",
    oracle=(
        "WITH b AS (SELECT vec_id, embedding, "
        f"  {{bucket}} AS bucket FROM embeddings), "
        "probes AS (SELECT vec_id AS probe_id, embedding AS probe_vec, bucket AS pbucket "
        f"  FROM b WHERE vec_id < {_N_PROBES}), "
        "scored AS (SELECT p.probe_id, c.vec_id, "
        f"  {{score}} AS score, "
        "  CASE WHEN c.bucket = p.pbucket THEN 1 ELSE 0 END AS mflag "
        f"  FROM b c CROSS JOIN probes p WHERE c.vec_id >= {_N_PROBES}), "
        "ranked AS (SELECT probe_id, vec_id, mflag, "
        "  row_number() OVER (PARTITION BY probe_id "
        "    ORDER BY score DESC, vec_id ASC) AS exact_rank, "
        "  row_number() OVER (PARTITION BY probe_id "
        "    ORDER BY mflag DESC, score DESC, vec_id ASC) AS ann_rank "
        "  FROM scored) "
        "SELECT probe_id, "
        f"  sum(CASE WHEN exact_rank <= {_RECALL_K} THEN 1 ELSE 0 END)::BIGINT AS n_exact, "
        f"  sum(CASE WHEN exact_rank <= {_RECALL_K} AND mflag = 1 "
        f"      AND ann_rank <= {_RECALL_K} THEN 1 ELSE 0 END)::BIGINT AS n_hit, "
        "  {recall} AS recall "
        "FROM ranked GROUP BY probe_id"
    ).format(
        bucket=_bucket_sql("embedding", _PROJ),
        score=TX.portable_round_sql(cosine_sql("c.embedding", "p.probe_vec"), 6),
        recall=TX.portable_round_sql(
            f"sum(CASE WHEN exact_rank <= {_RECALL_K} AND mflag = 1 "
            f"    AND ann_rank <= {_RECALL_K} THEN 1 ELSE 0 END)::DOUBLE "
            f"/ sum(CASE WHEN exact_rank <= {_RECALL_K} THEN 1 ELSE 0 END)",
            6,
        ),
    ),
    covers="training-data curation (ANN index evaluation: recall@k vs exact top-k)",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the single-probe sign-LSH candidate generator
    against exact cosine top-10, per probe — the measure-don't-guess
    op behind every 'is the ANN index good enough?' decision. The same
    report runs over any candidate generator (multi-probe, IVF) by
    swapping the match flag.

    One pass over the corpus: probes (tiny) broadcast; each corpus row
    scores once; the exact rank and the ANN rank are two row_numbers
    over the SAME probe_id partitioning (ann_rank orders the bucket
    matches first, so rank<=k under mflag=1 is rank within the
    candidate set) — one shuffle, two sorts, and the final aggregate
    reuses the window's partitioning (no extra exchange; pinned).
    Reduce parallelism = n_probes, the knn_join caveat: evaluation
    batches are small by construction (a sample, not the corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = _sign_bits(F.col("embedding"), _PROJ)
    probes = emb.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        bucket.alias("pbucket"),
    )
    corpus = emb.filter(F.col("vec_id") >= _N_PROBES).select(
        "vec_id", "embedding", bucket.alias("bucket")
    )
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "vec_id",
        TX.portable_round(
            cosine_similarity(F.col("embedding"), F.col("probe_vec")), 6
        ).alias("score"),
        F.when(F.col("bucket") == F.col("pbucket"), F.lit(1)).otherwise(F.lit(0)).alias(
            "mflag"
        ),
    )
    w_exact = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    w_ann = Window.partitionBy("probe_id").orderBy(
        F.col("mflag").desc(), F.col("score").desc(), F.col("vec_id").asc()
    )
    ranked = scored.select(
        "probe_id",
        "mflag",
        F.row_number().over(w_exact).alias("exact_rank"),
        F.row_number().over(w_ann).alias("ann_rank"),
    )
    in_exact = F.col("exact_rank") <= _RECALL_K
    in_ann = (F.col("mflag") == 1) & (F.col("ann_rank") <= _RECALL_K)
    n_exact = F.sum(F.when(in_exact, 1).otherwise(0)).cast("bigint")
    n_hit = F.sum(F.when(in_exact & in_ann, 1).otherwise(0)).cast("bigint")
    return ranked.groupBy("probe_id").agg(
        n_exact.alias("n_exact"),
        n_hit.alias("n_hit"),
        TX.portable_round(
            F.sum(F.when(in_exact & in_ann, 1).otherwise(0)).cast("double")
            / F.sum(F.when(in_exact, 1).otherwise(0)),
            6,
        ).alias("recall"),
    )
