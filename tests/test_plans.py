"""Physical-plan invariants — the scale guarantees, pinned.

Correctness says the answer is right at sf0.01; these say the *plan*
is the one that survives 100 TB: pruned scans, pushed predicates,
broadcast dimension joins, partial top-k, one shuffle where one
suffices. A regression here is a performance bug even while results
stay green.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from tests.conftest import SMOKE_SF
from tia_data_pipeline_spark import plans


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plans.REGISTRY[name].build(spark, SMOKE_SF).explain("formatted")
    return buf.getvalue()


def test_scan_project_prunes_columns(spark):
    p = plan_of(spark, "q_scan_project")
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_extendedprice:double>" in p


def test_filter_range_pushes_predicates(spark):
    p = plan_of(spark, "q_filter_range")
    assert "GreaterThanOrEqual(o_orderdate" in p and "LessThan(o_orderdate" in p


def test_word_count_reads_only_needed_columns(spark):
    p = plan_of(spark, "q_word_count")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_join_enrich_broadcasts_dims(spark):
    # tree renders each join once as "BroadcastHashJoin Inner BuildRight"
    assert plan_of(spark, "q_join_enrich").count("BroadcastHashJoin Inner") == 2


def test_revenue_pushes_filter_below_join(spark):
    p = plan_of(spark, "q_revenue_by_segment")
    # the date range must reach the orders parquet scan, not sit above the join
    assert "GreaterThanOrEqual(o_orderdate,1996-01-01" in p


def test_topk_avoids_total_sort(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "q_topk_latest")


def test_topk_per_group_partial_limit(spark):
    # WindowGroupLimit both before and after the shuffle: per-partition
    # top-k first, so the exchange carries k rows per group, not all.
    assert plan_of(spark, "q_topk_per_group").count("WindowGroupLimit (") == 2


def test_dedup_latest_partial_limit_single_exchange(spark):
    """rn=1 latest-per-key must keep the map-side rank limit: one row
    per key crosses the shuffle (WindowGroupLimit Partial before the
    exchange, Final after), and exactly one exchange total. Flagged
    `weak` in VERDICT r03 on a 2.7x bench drift — the plan property
    holds (isolated runs are ~0.42s at sf0.1); pinned so a real
    regression can't hide behind noise again."""
    p = plan_of(spark, "q_dedup_latest")
    assert p.count("WindowGroupLimit (") == 2
    assert p.count("Exchange (") == 1


def test_semi_and_anti_join_shapes(spark):
    assert "LeftSemi" in plan_of(spark, "q_semi_join")
    assert "LeftAnti" in plan_of(spark, "q_antijoin_incr")


def test_sim_topk_broadcasts_probe(spark):
    p = plan_of(spark, "q_sim_topk")
    assert "BroadcastNestedLoopJoin" in p  # one-row probe broadcast
    assert "TakeOrderedAndProject" in p  # global top-k without sort


def test_session_window_single_shuffle(spark):
    # lag-flag window, cumsum window, and the session aggregate must all
    # reuse ONE hash partitioning on user_id.
    p = plan_of(spark, "q_session_window")
    shuffles = [l for l in p.splitlines() if l.strip().startswith("(") and "Exchange" in l]
    assert len(shuffles) == 1, f"expected 1 exchange, plan has {len(shuffles)}"


def test_join_degrades_to_sortmerge_without_broadcast(spark):
    """When dims outgrow the broadcast threshold the same declared plan
    falls back to shuffle joins — graceful degradation, not failure
    (SCALE.md 'local-vs-cluster deltas')."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, "q_join_enrich")
        assert "BroadcastHashJoin" not in p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# The one deliberate pandas-UDF surface (SURVEY §2.4 ext-udf-surface):
# multimodal codecs genuinely cannot be expressions. Must be
# Arrow-batched mapInPandas — row-at-a-time BatchEvalPython is always a
# bug.
PANDAS_UDF_SURFACE = {"q_resize_meta"}


@pytest.mark.parametrize("name", list(plans.REGISTRY))
def test_no_python_udfs_in_contract_plans(spark, name):
    # Every other declared query must stay JVM-side (pandas/Python UDFs
    # would show as BatchEvalPython / ArrowEvalPython / MapInPandas).
    # Parametrized per query so one broken build costs one red dot, not
    # the whole invariant.
    p = plan_of(spark, name)
    if name in PANDAS_UDF_SURFACE:
        assert "MapInPandas" in p, f"{name} should cross via Arrow mapInPandas"
        assert "BatchEvalPython" not in p, f"{name} fell back to row-at-a-time"
    else:
        assert "EvalPython" not in p and "InPandas" not in p, f"{name} leaves the JVM"


# Tail queries past the driver's 50-row CORRECTNESS cap must each be a
# redundant variant of an operator already driver-verified by a named
# earlier slot (see plans/__init__.py CONTRACT_ORDER).
TAIL_COVERED_BY = {
    # round-12 rotation: head = six re-promoted r8 singles + the full
    # r9-stale backlog + the r12 plan-changed q_takedown and its
    # ADVICE-touched family partner q_index_delete + r10-stale fills;
    # every demoted r11-green anchors to a same-family head slot:
    "q_agg_count": "q_count_distinct",
    "q_ann_multiprobe": "q_ann_lsh",
    "q_anomaly": "q_mad_outliers",
    "q_approx_distinct": "q_count_distinct",
    "q_approx_quantiles": "q_winsorize",
    "q_autocorr": "q_ewma",
    "q_bm25_batch": "q_bm25",
    "q_boilerplate": "q_containment",
    "q_bpe_train": "q_tok_fertility",
    "q_burstiness": "q_session_window",
    "q_canonicalize": "q_json_ser",
    "q_changepoint": "q_jsd_mix",
    "q_chunking": "q_tok_fertility",
    "q_cohort_retention": "q_stickiness",
    "q_collocations": "q_mutual_info",
    "q_const_probe": "q_filter_range",
    "q_cooccur_lift": "q_mutual_info",
    "q_decontaminate": "q_semi_join",
    "q_dedup_components": "q_containment",
    "q_dedup_incremental": "q_index_delete",
    "q_dedup_latest": "q_dedup_batch",
    "q_doc_fingerprint": "q_containment",
    "q_dsir_weights": "q_jsd_mix",
    "q_dup_graph_degree": "q_containment",
    "q_edit_distance": "q_dup_spans",
    "q_embed_quantize": "q_embed_dedup",
    "q_exists_guard": "q_semi_join",
    "q_feature_hash": "q_hash_sample",
    "q_funnel": "q_markov",
    "q_fuzzy_dedup": "q_index_delete",
    "q_gap_fill": "q_daily_window",
    "q_gini": "q_pareto_abc",
    "q_gopher_quality": "q_lang_id",
    "q_group_sample": "q_hash_sample",
    "q_heavy_hitters": "q_pareto_abc",
    "q_histogram": "q_winsorize",
    "q_interarrival": "q_session_window",
    "q_ivf_append": "q_takedown",
    "q_knn_join": "q_knn_bucketed",
    "q_ks_drift": "q_jsd_mix",
    "q_lm_perplexity": "q_mutual_info",
    "q_merge_upsert": "q_antijoin_incr",
    "q_mix_temperature": "q_jsd_mix",
    "q_multimodal_meta": "q_resize_meta",
    "q_new_users": "q_stickiness",
    "q_ngram_jaccard": "q_containment",
    "q_ntile": "q_topk_per_group",
    "q_pack_sequences": "q_tok_fertility",
    "q_pagerank": "q_thread_closure",
    "q_pii_redact": "q_json_ser",
    "q_pivot_status": "q_cube",
    "q_profile": "q_benford",
    "q_quality_linear": "q_lang_id",
    "q_quantiles": "q_winsorize",
    "q_range_join": "q_asof_join",
    "q_revenue_by_segment": "q_join_enrich",
    "q_rfm": "q_stickiness",
    "q_rolling_actives": "q_daily_window",
    "q_rollup": "q_children_rollup",
    "q_scan_project": "q_filter_range",
    "q_scd2": "q_antijoin_incr",
    "q_seasonality": "q_ewma",
    "q_self_join": "q_asof_join",
    "q_semantic_dedup": "q_embed_dedup",
    "q_set_ops": "q_jsd_mix",
    "q_sim_topk": "q_knn_bucketed",
    "q_simhash": "q_simhash_incremental",
    "q_skew_keys": "q_cluster_sizes",
    "q_sliding_window": "q_daily_window",
    "q_source_mix": "q_jsd_mix",
    "q_source_overlap": "q_jsd_mix",
    "q_span_cut": "q_dup_spans",
    "q_spearman": "q_ewma",
    "q_split_assign": "q_hash_sample",
    "q_star_join": "q_join_enrich",
    "q_streaks": "q_markov",
    "q_substring_dedup": "q_dup_spans",
    "q_text_tokens": "q_tok_fertility",
    "q_tfidf": "q_bm25_indexed",
    "q_token_bpe": "q_tok_fertility",
    "q_token_entropy": "q_word_freq",
    "q_topk_latest": "q_dedup_batch",
    "q_triangles": "q_asof_join",
    "q_vocab_coverage": "q_tok_fertility",
    "q_word_count": "q_tok_fertility",
    "q_zipf_fit": "q_word_freq",
    "q_zscore": "q_mad_outliers",
}


def test_contract_order_matches_registry():
    assert list(plans.REGISTRY) == plans.CONTRACT_ORDER


def test_driver_cap_tail_is_redundant_coverage():
    head = plans.CONTRACT_ORDER[: plans.DRIVER_ROW_CAP]
    tail = plans.CONTRACT_ORDER[plans.DRIVER_ROW_CAP :]
    assert set(tail) == set(TAIL_COVERED_BY), (
        "tail changed: update TAIL_COVERED_BY with the earlier slot covering each"
    )
    for q, covered_by in TAIL_COVERED_BY.items():
        assert covered_by in head, f"{q} claims coverage by {covered_by}, not in first 50"


def test_every_oracle_query_reaches_a_hostile_sweep():
    """Sweep-selection guard: the hostile-corpus suites promise that
    new queries 'inherit the check automatically', so the SELECTION
    logic itself needs a pin — a query that silently falls through
    every family/relational sweep gets zero hostile coverage (exactly
    what happened to q_lm_perplexity when family matching was a raw
    substring test: 'split_part' contains 'part'). Every oracle query
    must land in at least one single-family, pair-family, or relational
    sweep; the only admissible exceptions are table-free probes, which
    the all-query empty-tables and single-row sweeps still cover."""
    from tests.oracle import family_queries, pair_family_queries, sql_mentions_table
    from tia_data_pipeline_spark.catalog import TABLES

    rel = [t for t in TABLES if t not in ("documents", "events", "embeddings")]
    covered = set()
    for fam in ("documents", "events", "embeddings"):
        covered |= set(family_queries(fam))
    # multi-family composites (q_takedown): swept on the combined
    # documents+embeddings hostile corpus
    covered |= set(pair_family_queries("documents", "embeddings"))
    covered |= {
        n
        for n, q in plans.REGISTRY.items()
        if q.oracle is not None
        and any(sql_mentions_table(t, q.oracle) for t in rel)
    }
    fall_through = {
        n for n, q in plans.REGISTRY.items() if q.oracle is not None
    } - covered
    table_free = {
        n
        for n in fall_through
        if not any(
            sql_mentions_table(t, plans.REGISTRY[n].oracle) for t in TABLES
        )
    }
    assert fall_through == table_free, (
        f"queries with zero hostile-sweep coverage: {sorted(fall_through - table_free)}"
    )


def test_tail_entries_have_driver_history():
    """Policy guard (VERDICT r03 'What's wrong' #1): a query may only sit
    below the driver's 50-row cap if it ALREADY has at least one
    driver-green CORRECTNESS row from a past round. Never-yet-verified
    queries must occupy head slots so the next driver run records them.
    This test was red on the round-3 ordering (ten round-3 queries were
    parked in the tail with zero driver rows) and guards the recurrence."""
    tail = plans.CONTRACT_ORDER[plans.DRIVER_ROW_CAP :]
    unverified = [q for q in tail if not plans.DRIVER_GREEN_HISTORY.get(q)]
    assert not unverified, (
        f"tail entries with no historical driver row: {unverified} — "
        "rotate them into the first 50 slots (demote multi-green rows)"
    )


def test_driver_history_only_names_registered_queries():
    unknown = set(plans.DRIVER_GREEN_HISTORY) - set(plans.REGISTRY)
    assert not unknown, f"DRIVER_GREEN_HISTORY has stale entries: {sorted(unknown)}"


def test_dedup_batch_is_one_pass_hash_aggregate(spark):
    """Whole-row dedup must stay the one-pass HashAggregate plan:
    partial aggregation collapses co-located duplicates before the
    exchange, and no SortAggregate sneaks in (a digest-grouped variant
    with first() survivors was measured 1.5x slower — see the
    q_dedup_batch docstring)."""
    import re

    p = plan_of(spark, "q_dedup_batch")
    # detail section renders each node once as "(N) <name>"
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) == 2  # partial + final
    assert "SortAggregate" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_knn_join_broadcast_probes_partial_topk(spark):
    """Batch k-NN: probes must broadcast (corpus never shuffles for the
    join) and the per-probe top-k must run map-side (WindowGroupLimit
    both below AND above the single exchange)."""
    p = plan_of(spark, "q_knn_join")
    assert "BroadcastNestedLoopJoin" in p
    assert p.count("WindowGroupLimit") >= 2
    # the valid-vector precondition's IsNotNull(embedding) pushes to
    # the scan alongside the probe-id range (the element-validity HOF
    # itself is not pushable and evaluates post-scan)
    assert "PushedFilters: [IsNotNull(vec_id), IsNotNull(embedding), LessThan(vec_id,5)]" in p


def test_quantiles_folds_value_domain_not_rows(spark):
    """Exact per-group percentiles must pre-collapse to
    (event_type, value, count) with a map-side partial count BEFORE the
    percentile fold: the ObjectHashAggregate then buffers the bounded
    cent-quantized value domain, not every raw row (VERDICT r03 'What's
    wrong' #2 — the raw fold was a 5-reduce-task straggler by
    construction). Plan shape: HashAggregate partial+final around the
    first exchange, then the percentile ObjectHashAggregate pair."""
    import re

    p = plan_of(spark, "q_quantiles")
    # detail section renders each node once as "(N) <name>"
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) == 2  # (type, value) pre-collapse
    assert len(re.findall(r"\(\d+\) ObjectHashAggregate", p)) == 2  # percentile fold
    assert "ReadSchema: struct<event_type:string,value:double>" in p


def test_knn_bucketed_shuffles_on_bucket_no_broadcast(spark):
    """Large-probe-batch k-NN must NOT broadcast either side and must
    NOT degenerate to a cross product: the candidate join is a hash
    shuffle equi-join on the LSH bucket id (declared SHUFFLE_HASH —
    this operator exists precisely because probes outgrow a broadcast),
    and the per-probe top-k stays map-side limited."""
    p = plan_of(spark, "q_knn_bucketed")
    assert "ShuffledHashJoin" in p
    assert "BroadcastHashJoin" not in p and "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("WindowGroupLimit") >= 2


def test_funnel_windows_share_one_shuffle(spark):
    """The 3 conditional stage-windows must all reuse ONE hash
    partitioning on user_id (one Sort, three Window nodes); only the
    distinct adds a second exchange. A join-chain funnel would show 3+
    exchanges."""
    import re

    p = plan_of(spark, "q_funnel")
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 3
    assert len(re.findall(r"\(\d+\) Sort\b", p)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2


# Round-4 fan-out decisions, measured by interleaved A/B at sf0.1 (see
# plans/llm.py::_docs and operators/dedup.py::simhash docstrings): the
# explicit repartition is a WIN only where the map side is CPU-heavy —
# per-row scoring regexes and n-gram ZIP ASSEMBLY (slice×n+zip+concat,
# no codegen) fan out; bare-token explodes feeding an aggregate don't.
FAN_OUT_EXPECTED = {
    "q_lang_id",
    "q_repetition",
    "q_ngram_jaccard",
    # n-gram zip assembly before the first exchange (A/B at sf0.1:
    # 3.48→0.84, 1.93→0.79, 1.48→0.85, 1.18→1.03)
    "q_boilerplate",
    "q_lm_perplexity",
    "q_decontaminate",
    "q_collocations",
    # partial WindowGroupLimit SORTS each input partition — a 3-split
    # scan serializes the sort (A/B at sf0.1: 1.23→0.86)
    "q_topk_per_group",
    # round-8: per-position md5 anchors are the same CPU-heavy map
    # shape as q_substring_dedup's portable path (measured there:
    # md5-per-position dominates); both new queries fan the scan out
    "q_dup_spans",
    "q_dedup_incremental",
    # simhash's 32-vote md5-bit aggregate is the borderline case: the
    # standalone q_simhash shape measures NEUTRAL (0.52 vs 0.51, so it
    # stays unfanned — the shuffle buys nothing), but inside
    # q_edit_distance, where the fingerprints feed a join +
    # collect_list + Levenshtein pipeline, widening the vote aggregate
    # wins consistently (interleaved min-of-4: 1.20→1.10; isolated
    # operator 0.72→0.59). Both sides pinned so drift is visible.
    "q_edit_distance",
}
NO_FAN_OUT_EXPECTED = {
    "q_word_freq",
    "q_tfidf",
    "q_feature_hash",
    "q_simhash",
    "q_vocab_coverage",
    # round-7: q_dsir_weights' per-token md5 bucket is the q_simhash
    # borderline case — measured NEUTRAL (interleaved min-of-4 at
    # sf0.1: fan 0.463 vs no-fan 0.497 on the isolated dbc→cr leg), so
    # it stays unfanned per the rule; q_bpe_train is a bare-token
    # explode into the vocab aggregate (the canonical no-fan shape).
    "q_dsir_weights",
    "q_bpe_train",
}


@pytest.mark.parametrize("name", sorted(FAN_OUT_EXPECTED | NO_FAN_OUT_EXPECTED))
def test_fan_out_decision_pinned(spark, name):
    p = plan_of(spark, name)
    if name in FAN_OUT_EXPECTED:
        assert "RoundRobinPartitioning" in p, f"{name} lost its fan-out widening"
    else:
        assert "RoundRobinPartitioning" not in p, f"{name} regained a redundant repartition"


# --- round-8 additions -----------------------------------------------------


def test_heavy_hitters_candidates_broadcast_before_exact_shuffle(spark):
    """The sample-then-verify contract's scale property: the exact
    (full-corpus) count must semi-join to the BROADCAST candidate set
    before its aggregate, so the wide exchange carries only candidate
    tokens — a sort-merge here would shuffle the whole vocabulary,
    exactly what the sample pass exists to avoid."""
    p = plan_of(spark, "q_heavy_hitters")
    assert "BroadcastHashJoin LeftSemi" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_span_cut_intervals_broadcast_onto_corpus(spark):
    """The surgery join must build on the (small) merged-interval side
    and stream the corpus scan — shuffling the corpus text column to
    meet a handful of cut ranges is the 100 TB failure mode. The text
    scan stays 2 columns."""
    p = plan_of(spark, "q_span_cut")
    assert "BroadcastHashJoin Inner" in p
    assert "CartesianProduct" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


# --- round-4 curation tier -------------------------------------------------


def test_decontaminate_broadcast_membership_two_shuffles(spark):
    """The benchmark shingle set must arrive at the corpus side as a
    BROADCAST hash join (membership test, never a shuffle join on the
    corpus shingles), leaving exactly two shuffles: the benchmark
    distinct and the per-doc aggregate. A sort-merge or cartesian here
    would move the whole exploded corpus — the 100 TB failure mode."""
    import re

    p = plan_of(spark, "q_decontaminate")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    # exactly two KEYED shuffles (benchmark distinct + per-doc agg);
    # the fan-out widening adds round-robin exchanges that carry only
    # the narrowed 2-column scan, not the exploded shingle stream
    assert p.count("hashpartitioning(") == 2
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_source_mix_no_explode_narrow_tokens(spark):
    """Token counting must stay a narrow per-row projection — no
    Generate (explode) anywhere: the only wide ops are the tiny
    (source, lang) aggregate and the broadcast scalar total."""
    p = plan_of(spark, "q_source_mix")
    assert "Generate" not in p
    assert "BroadcastNestedLoopJoin" in p  # 1-row total as broadcast scalar
    assert "ReadSchema: struct<text:string,lang:string,source:string>" in p


def test_split_assign_single_group_shuffle(spark):
    """Split assignment is a pure per-row projection; the report is one
    (lang, split) aggregate plus a window over the already-aggregated
    frame — two exchanges, both over rows = #langs x 3."""
    import re

    p = plan_of(spark, "q_split_assign")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in p


def test_embed_quantize_partial_agg_no_python(spark):
    """Quantization error folds entirely JVM-side (HashAggregate with a
    map-side partial over integered per-vector errors — no
    ObjectHashAggregate buffering, no Python runner)."""
    import re

    p = plan_of(spark, "q_embed_quantize")
    assert "ObjectHashAggregate" not in p
    assert "Python" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "ReadSchema: struct<embedding:array<float>,label:int>" in p


def test_ann_recall_single_shuffle_shared_partitioning(spark):
    """Recall evaluation scores the corpus ONCE: probes broadcast, both
    row_number ranks AND the final per-probe aggregate share a single
    probe_id exchange (the aggregate reuses the window's
    partitioning)."""
    import re

    p = plan_of(spark, "q_ann_recall")
    assert "BroadcastNestedLoopJoin" in p
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 2
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_pack_sequences_parallel_prefix_sum(spark):
    """Sequence packing must be a SHARDED prefix sum: exactly one
    exchange, hash-partitioned on shard (never the global
    single-partition running total — the canonical scale anti-pattern),
    and the packed-window aggregate reuses that partitioning (shard is
    a subset of the grouping keys, so no second shuffle). Only
    (doc_id, n_tok) crosses the wire — never text."""
    import re

    p = plan_of(spark, "q_pack_sequences")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "hashpartitioning(shard" in p
    assert "SinglePartition" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_boilerplate_broadcast_membership(spark):
    """The corpus-derived boilerplate set joins back as a BROADCAST
    membership probe — the exploded corpus shingle stream must never
    shuffle to a join exchange (sort-merge here moves the whole shingle
    stream twice: the 100 TB failure mode). Two shuffles total: the
    shingle df-aggregate and the per-doc aggregate."""
    import re

    p = plan_of(spark, "q_boilerplate")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    # two KEYED shuffles (shingle df-agg + per-doc agg); round-robin
    # fan-out exchanges move only the narrowed pre-explode scan
    assert p.count("hashpartitioning(") == 2


def test_mix_temperature_single_corpus_scan(spark):
    """Both normalizing scalars (corpus total, weight total) must be
    window sums over the ALREADY-AGGREGATED per-source frame: one
    corpus scan, one narrow aggregate exchange. The broadcast-scalar
    alternative re-planned the corpus aggregate per consumer (measured:
    4 scans, zero exchange reuse)."""
    import re

    p = plan_of(spark, "q_mix_temperature")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert "Generate" not in p  # token count stays a narrow projection


def test_token_entropy_integer_aggregates_pruned_scan(spark):
    """Entropy terms are integered before every cross-row sum (exact
    BIGINT aggregation — no order-dependent double folds) and the scan
    reads only (doc_id, lang, text)."""
    p = plan_of(spark, "q_token_entropy")
    assert "ObjectHashAggregate" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string,lang:string>" in p


def test_group_sample_partial_rank_limit(spark):
    """Exact-k per-group sampling must keep the map-side rank cut:
    WindowGroupLimit before AND after the single exchange, so the
    shuffle carries O(groups x k) rows, never the corpus."""
    import re

    p = plan_of(spark, "q_group_sample")
    assert p.count("WindowGroupLimit (") == 2
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in p


def test_vocab_coverage_partial_topk(spark):
    """The top-k vocabulary cut must plan as TakeOrderedAndProject
    (per-partition top-k merge) — never a full sort of the vocabulary —
    and the corpus token total must come from the narrow no-explode
    scan (exactly one Generate in the whole plan: the vocab explode)."""
    import re

    p = plan_of(spark, "q_vocab_coverage")
    assert "TakeOrderedAndProject" in p
    assert len(re.findall(r"\(\d+\) Generate", p)) == 1


def test_edit_distance_no_self_join(spark):
    """Candidate pairs expand in-expression from capped bucket lists:
    no self-join (which re-plans the 32-vote simhash subtree per side —
    measured 3 redundant corpus scans and ~10x runtime), no sort-merge
    join, no cartesian product; exactly three corpus scans
    (fingerprints + prefixes + the two-pass cap's count leg, which
    re-reads fingerprints so a hot bucket never reaches a list
    buffer)."""
    import re

    p = plan_of(spark, "q_edit_distance")
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    # 2 scans: the cached fingerprint subtree (printed once; the
    # two-pass cap's count + pair legs both read the cache) + prefixes
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2
    assert "InMemoryTableScan" in p  # the persisted 16-byte simhash frame


def test_mad_outliers_single_exchange(spark):
    """Both rank windows, both median max-over-partition windows, and
    the final aggregate must share ONE hash partitioning on source —
    a single exchange for the whole query (the sessionize discipline)."""
    p = plan_of(spark, "q_mad_outliers")
    shuffles = [l for l in p.splitlines() if l.strip().startswith("(") and "Exchange" in l]
    assert len(shuffles) == 1, f"expected 1 exchange, plan has {len(shuffles)}"


def test_substring_dedup_no_self_join_single_scan(spark):
    """The portable char-k-mer overlap query must generate candidate
    pairs by in-expression bucket expansion, never a corpus self-join
    (the oracle's formulation): no sort-merge join, no cartesian, ONE
    corpus scan feeding the persisted (h, id) sample frame, and both
    two-pass-cap legs reading the cache (positions explode from the
    pruned text scan; the 1/mod sampling filter runs before any
    exchange)."""
    import re

    p = plan_of(spark, "q_substring_dedup")
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # ONE corpus scan: the md5-per-position sample frame persists, so
    # the two-pass cap's count leg and the pair leg both read the
    # cache instead of re-hashing the corpus.
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert "InMemoryTableScan" in p


def test_lm_perplexity_model_join_no_cartesian(spark):
    """Bigram LM scoring joins the corpus stream to the model frame on
    the bigram key — an equi-join, never a cartesian — and the
    continuation total is a window over the MODEL frame (vocabulary-
    sized), not a second corpus aggregate. Round 11: the bigram stream
    PERSISTS (see q_lm_perplexity), so exactly ONE Generate (the cached
    zip assembly) feeds both the model build and the score stream via
    two InMemoryTableScans, from a pruned (doc_id, text) scan."""
    import re

    p = plan_of(spark, "q_lm_perplexity")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert len(re.findall(r"\(\d+\) Generate", p)) == 1
    assert len(re.findall(r"\(\d+\) InMemoryTableScan", p)) == 2
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_cluster_sizes_digest_only_shuffle(spark):
    """The first-level aggregate must group on the 32-byte digest (text
    itself never shuffles) and the histogram level is a partial-agg over
    (size, count) pairs — two exchanges total."""
    import re

    p = plan_of(spark, "q_cluster_sizes")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2
    assert "sha2" in p


# --- round-5 additions ------------------------------------------------------


def test_pagerank_iterations_broadcast_state_not_edges(spark):
    """Each of the 5 iterations must join the (tiny) rank state to the
    edge list as a BROADCAST — 2 broadcast joins per iteration (state
    onto edges, contribs onto nodes); the edge list itself never plans
    a per-iteration sort-merge join."""
    p = plan_of(spark, "q_pagerank")
    assert p.count("BroadcastHashJoin") >= 10
    # the only acceptable non-broadcast joins are in the one-time edge
    # build (orders x lineitem before AQE converts it)
    iter_smj = [l for l in p.splitlines() if "SortMergeJoin LeftOuter" in l]
    assert not iter_smj, "rank-state joins must broadcast:\n" + p


def test_ks_drift_windows_over_collapsed_grid(spark):
    """The unpartitioned cumulative window must run over the collapsed
    distinct-value grid (post-aggregate), never the raw corpus: the
    (val) aggregate appears below the single-partition exchange."""
    p = plan_of(spark, "q_ks_drift")
    assert "SinglePartition" in p  # the tiny grid window + final agg
    assert "hashpartitioning(n_chars" in p  # grid collapse first
    assert "ReadSchema: struct<source:string,n_chars:bigint>" in p


def test_jsd_mix_single_vocab_aggregate(spark):
    """One (tok) aggregate collapses the corpus to its vocabulary; the
    totals ride back as a broadcast scalar (nested-loop of a 1-row
    frame), and nothing else shuffles the token stream."""
    p = plan_of(spark, "q_jsd_mix")
    # two static copies of the (tok) aggregate — the totals diamond;
    # AQE reuses the exchange at runtime (CLAUDE.md diamond rule)
    assert p.count("hashpartitioning(tok") == 2
    assert "BroadcastNestedLoopJoin" in p
    assert "ReadSchema: struct<text:string,source:string>" in p


def test_tok_fertility_no_explode_narrow_scan(spark):
    """Fertility counts are per-row counters — no Generate anywhere;
    scan reads exactly (lang, text) and the only keyed exchange is the
    per-lang aggregate."""
    p = plan_of(spark, "q_tok_fertility")
    assert "Generate" not in p
    assert "ReadSchema: struct<text:string,lang:string>" in p
    assert p.count("hashpartitioning(lang") == 1


def test_bm25_literal_term_filter_no_term_join(spark):
    """The query-term filter must be an IN literal on the exploded
    stream (terms never arrive via a join); the only joins are the
    3-row df broadcast, the doc-length join over the matched subset,
    and the broadcast scalar; top-k is TakeOrderedAndProject."""
    p = plan_of(spark, "q_bm25")
    assert "TakeOrderedAndProject" in p
    assert "tok IN (" in p or "tok#" in p  # literal IN reaches the filter
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_winsorize_shares_group_partitioning(spark):
    """Rank window and clamp re-aggregation hash-partition on
    event_type; the 6-row bounds table joins back as a broadcast."""
    p = plan_of(spark, "q_winsorize")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "ReadSchema: struct<event_type:string,value:double>" in p


def test_ols_trend_window_and_agg_share_partitioning(spark):
    """The per-group min-x window and the moment aggregate must share
    ONE (event_type) hash partitioning; moments are decimal(38,0)
    HashAggregate, not an Object buffer."""
    p = plan_of(spark, "q_ols_trend")
    assert p.count("hashpartitioning(event_type") == 1
    assert "ObjectHashAggregate" not in p
    assert "ReadSchema: struct<ts:timestamp,event_type:string,value:double>" in p


def test_gini_window_and_agg_share_partitioning(spark):
    """Rank window and moment aggregate share one (source)
    partitioning; no explode anywhere (token count is a narrow
    projection)."""
    p = plan_of(spark, "q_gini")
    assert p.count("hashpartitioning(source") == 1
    assert "Generate" not in p


def test_benford_pruned_scan_and_broadcasts(spark):
    """q_benford must read ONLY o_totalprice from orders (the digit
    derives from cents), and both the 9-row expectation table and the
    one-row total must arrive as broadcasts — no shuffle join on a
    9-row side."""
    p = plan_of(spark, "q_benford")
    assert "ReadSchema: struct<o_totalprice:double>" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_ewma_equijoin_no_range_expansion(spark):
    """The trailing window must be the exploded-offset EQUI-join on the
    row index, never a range join: no BroadcastNestedLoopJoin (the
    physical shape a BETWEEN join would take) anywhere in the plan."""
    p = plan_of(spark, "q_ewma")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_interarrival_pruned_scan(spark):
    """The gap pipeline reads only (ts, user_id, event_id); the
    percentile grid work happens after the corpus collapses."""
    p = plan_of(spark, "q_interarrival")
    assert "ReadSchema: struct<event_id:bigint,ts:timestamp,user_id:bigint>" in p


def test_rfm_pruned_scan_single_corpus_aggregate(spark):
    """q_rfm reads only (o_custkey, o_totalprice, o_orderdate) and
    collapses orders to customers in ONE corpus-sized aggregate; the
    three quartile pipelines and the segment rollup run on collapsed
    grids, with thresholds re-entering as broadcasts (no shuffle join
    back onto customers)."""
    p = plan_of(spark, "q_rfm")
    assert (
        "ReadSchema: struct<o_custkey:bigint,o_totalprice:double,o_orderdate:timestamp>"
        in p
    )
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_triangles_edge_list_persisted_once(spark):
    """The corpus-sized inverted-index pair pipeline must materialize
    ONCE: all four edge-list consumers (three triangle-join scans + the
    degree census) read the cached edges, and inside the edge-cache
    definition the capped shingle-incidence frame (`surv`, persisted
    round 11 — the sort-shuffle-writer fix flipped the old
    recompute-beats-persist measurement, see _shingle_overlap_frames)
    feeds its three consumers (pair collect, doc_sizes, and the
    pair-leg re-reference) from cache too: exactly 4 + 3
    InMemoryTableScans. The corpus parquet itself appears at most
    twice (the surv derivation's count + survivor legs); an uncached
    edge consumer or a third corpus scan would push past the bounds."""
    p = plan_of(spark, "q_triangles")
    scans = [
        l
        for l in p.splitlines()
        if l.strip().startswith("(") and "InMemoryTableScan" in l
    ]
    assert len(scans) == 7, f"expected 4 edge + 3 surv cached scans, got {len(scans)}"
    pq = [
        l for l in p.splitlines() if l.strip().startswith("(") and "Scan parquet" in l
    ]
    assert len(pq) <= 2, f"corpus re-scanned outside the cache: {len(pq)} scans"


def test_cooccur_lift_single_user_partitioning(spark):
    """The pair join self-joins the collapsed (user, type) set on
    user_id; per-type counts and the user total re-enter as broadcasts
    (no shuffle join on a |types|-row side)."""
    p = plan_of(spark, "q_cooccur_lift")
    # BOTH per-type count joins must broadcast (dropping either one
    # regresses a |types|-row side to a shuffle join)
    assert p.count("BroadcastHashJoin") >= 2


def test_markov_lag_partitioned_by_user_and_pruned_scan(spark):
    """The transition lag must ride a (user_id) hash partitioning —
    never a global-order window — and the events scan must prune to
    the four columns the query reads."""
    p = plan_of(spark, "q_markov")
    assert "hashpartitioning(user_id" in p
    assert (
        "ReadSchema: struct<event_id:bigint,ts:timestamp,user_id:bigint,event_type:string>"
        in p
    )


def test_pareto_abc_prefix_sum_is_bucket_partitioned(spark):
    """The customer-scale cumulative window must be partitioned by the
    revenue bucket (the distributed two-level prefix sum); only the
    bucket GRID (bounded by the revenue range) and one-row scalars may
    cross a SinglePartition exchange."""
    p = plan_of(spark, "q_pareto_abc")
    assert "hashpartitioning(bucket" in p
    assert p.count("Exchange SinglePartition") <= 2
    assert "ReadSchema: struct<o_custkey:bigint,o_totalprice:double>" in p


def test_mutual_info_grid_joins_broadcast(spark):
    """Marginals and scalars join the cell grid as broadcasts (no
    shuffle join on the tiny grids), off a two-column pruned scan."""
    p = plan_of(spark, "q_mutual_info")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "ReadSchema: struct<o_orderstatus:string,o_orderpriority:string>" in p


def test_stickiness_pruned_scan_no_global_window(spark):
    """Both monthly views are plain aggregates (no window at all) over
    a three-column pruned events scan."""
    p = plan_of(spark, "q_stickiness")
    assert "Window" not in p
    assert "ReadSchema: struct<ts:timestamp,user_id:bigint,event_type:string>" in p


def test_seasonality_single_column_scan_no_window(spark):
    """The weekday profile is pure aggregates over a ONE-column scan
    (ts only); no window operator, no join except the scalar
    broadcast."""
    p = plan_of(spark, "q_seasonality")
    assert "ReadSchema: struct<ts:timestamp>" in p
    assert "Window" not in p and "SortMergeJoin" not in p


def test_rolling_actives_broadcast_semi_over_collapsed_set(spark):
    """The 7-day WAU fan-out runs on the collapsed (day, user) set
    with the day grid broadcast into the semi-join and the final
    DAU-WAU grid join hint-broadcast (scale-independent) — no
    sort-merge join, no range/window operator over raw events,
    two-column pruned scan."""
    p = plan_of(spark, "q_rolling_actives")
    assert "ReadSchema: struct<ts:timestamp,user_id:bigint>" in p
    assert "BroadcastHashJoin LeftSemi" in p
    assert "BroadcastHashJoin Inner" in p
    assert "SortMergeJoin" not in p and "Window" not in p


def test_skew_keys_pruned_scan_topk_no_shuffle_join(spark):
    """q_skew_keys reads ONLY user_id; the global top-10 must be
    TakeOrderedAndProject (per-partition heaps, never a global sort of
    the key census) and the scalar totals join as a broadcast — no
    shuffle join anywhere."""
    p = plan_of(spark, "q_skew_keys")
    assert "ReadSchema: struct<user_id:bigint>" in p
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_anomaly_equijoin_no_range_expansion(spark):
    """q_anomaly's trailing window must be the exploded-offset
    EQUI-join on the row index (the q_ewma shape): no
    BroadcastNestedLoopJoin / CartesianProduct, and the scan reads
    only ts."""
    p = plan_of(spark, "q_anomaly")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "ReadSchema: struct<ts:timestamp>" in p


def test_streaks_pruned_scan_per_user_islands_topk(spark):
    """q_streaks reads only (ts, user_id); the island window is
    partitioned BY USER (never a global sort over the corpus) and the
    global top-20 is TakeOrderedAndProject (per-partition heaps). The
    only single-partition window is the final rank over <= 20 rows."""
    p = plan_of(spark, "q_streaks")
    assert "ReadSchema: struct<ts:timestamp,user_id:bigint>" in p
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_spearman_windows_over_collapsed_grid(spark):
    """q_spearman's ranking windows run on the collapsed day grid (one
    grouped aggregate upstream), not on raw events, and the query has
    no join at all — a pure aggregate -> window -> aggregate chain
    over a two-column pruned scan."""
    p = plan_of(spark, "q_spearman")
    assert "ReadSchema: struct<ts:timestamp,user_id:bigint>" in p
    assert "SortMergeJoin" not in p and "Join" not in p


def test_new_users_broadcast_day_grid_join(spark):
    """q_new_users joins two |days|-sized grids: the new-users side
    broadcasts via an explicit hint (scale-independent — a static size
    estimate would fall to SortMergeJoin once the child scan outgrows
    the threshold), and the scan reads only (ts, user_id)."""
    p = plan_of(spark, "q_new_users")
    assert "ReadSchema: struct<ts:timestamp,user_id:bigint>" in p
    assert "BroadcastHashJoin LeftOuter" in p
    assert "SortMergeJoin" not in p


def test_source_overlap_broadcast_intersections_no_corpus_pairs(spark):
    """q_source_overlap's post-vocabulary stages run on #sources-sized
    grids: the intersection table joins back as an explicit broadcast
    (never a corpus-scale shuffle join), and the one nested-loop join
    is the deliberate #sources x #sources pair grid over per-source
    aggregates. The scan reads only (text, source)."""
    p = plan_of(spark, "q_source_overlap")
    assert "ReadSchema: struct<text:string,source:string>" in p
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin LeftOuter" in p
    assert "CartesianProduct" not in p


# --- round-7: two-pass bucket caps ----------------------------------------

# Every bucket-membership collect in the dedup/similarity family must
# apply its size cap two-pass: count per key → semi-join survivors →
# only then collect the member list. One-pass
# `collect_list(...).filter(size(mem) <= cap)` materializes a hot
# bucket (corpus-stop shingle, million-copy boilerplate LSH bucket) in
# a single non-spillable aggregation buffer BEFORE the filter drops it
# — single-task OOM at 100 TB. See operators/dedup.py::
# capped_bucket_members.
BUCKET_CAPPED_QUERIES = [
    "q_fuzzy_dedup",
    "q_ngram_jaccard",
    "q_containment",
    "q_substring_dedup",
    "q_edit_distance",
    # round-8: the span extractor buckets (id, pos) anchor structs by
    # k-mer hash through the same capped helper
    "q_dup_spans",
    # q_semantic_dedup / q_embed_dedup are cap-checked separately:
    # VECTOR-payload buckets pair via a cell-equi self-join (member
    # arrays carrying two full vectors per pair are quadratic in
    # vector bytes — measured 17x at an 8x corpus), so they have no
    # collect at all — see test_vector_pair_join_shape.
]


@pytest.mark.parametrize("name", BUCKET_CAPPED_QUERIES)
def test_bucket_collects_are_semi_join_capped(spark, name):
    from tests.conftest import SMOKE_SF

    df = plans.REGISTRY[name].build(spark, SMOKE_SF)
    lp = df._jdf.queryExecution().optimizedPlan().toString()
    lines = lp.splitlines()
    collect_idx = [
        i for i, l in enumerate(lines) if "collect_list" in l or "collect_set" in l
    ]
    semi_idx = [i for i, l in enumerate(lines) if "LeftSemi" in l]
    assert collect_idx, f"{name}: no member-list aggregate found in plan"
    assert semi_idx, f"{name}: bucket cap lost its semi-join pre-filter"
    # parents print before children in the logical tree: the cap's
    # semi-join must sit BELOW the collect aggregate (i.e., later in
    # the printed tree), so hot keys are dropped before the list forms
    assert min(semi_idx) > min(collect_idx), (
        f"{name}: semi-join is not below the member-list aggregate"
    )


@pytest.mark.parametrize("name", ["q_semantic_dedup", "q_embed_dedup"])
def test_vector_pair_join_shape(spark, name):
    """Vector-payload bucket queries pair via a cell-equi self-join,
    never member arrays (a collect_list pair expansion carries two
    full vectors per pair struct — quadratic in vector bytes; measured
    11.3s vs 1.1s at sf0.1 for semantic, 17x at an 8x-duplicated
    corpus for embed): no collect aggregate anywhere, the two-pass
    hot-cluster cap's semi-joins present, the pair-cosine stream side
    fanned to full parallelism (a broadcast cell join would otherwise
    inherit the single-file scan's one split), and no cartesian
    product."""
    p = plan_of(spark, name)
    assert "collect_list" not in p and "collect_set" not in p
    assert "LeftSemi" in p
    assert "RoundRobinPartitioning" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_dsir_weights_cached_feature_table_broadcast_weights(spark):
    """q_dsir_weights materializes the (doc, bucket, count) feature
    table ONCE (persisted — its three consumers' differing pushed
    filters defeat exchange reuse) and joins the 256-row weight table
    back by broadcast; the 1-row scalar offset enters as the accepted
    broadcast cross join. The corpus scan reads only (doc_id, text,
    lang)."""
    p = plan_of(spark, "q_dsir_weights")
    assert "InMemoryTableScan" in p  # persisted feature table
    assert "BroadcastHashJoin Inner" in p  # weight table join
    assert "SortMergeJoin" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string,lang:string>" in p


def test_bpe_train_vocab_side_pair_assembly(spark):
    """q_bpe_train's corpus-sized leg is ONE bare-token explode into
    the vocab aggregate (fan=False per the pinned rule); char-pair
    assembly runs on the VOCAB, so exactly one corpus scan, no joins
    anywhere, and the global top-20 is TakeOrderedAndProject (partial
    heaps, never a total sort)."""
    import re

    p = plan_of(spark, "q_bpe_train")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert "Join" not in p
    assert "TakeOrderedAndProject" in p
    assert "ReadSchema: struct<text:string>" in p


def test_approx_quantiles_sketch_plan_no_sort_no_window(spark):
    """q_approx_quantiles' whole point is ORDER STATISTICS WITHOUT A
    SORT: the sketch aggregate + a 1-row broadcast back for rank
    counts. Pin the shape — a Sort or Window sneaking in would turn
    the scale path back into the exact path, and the 1-row crossJoin
    must stay a broadcast nested loop, never a cartesian shuffle."""
    p = plan_of(spark, "q_approx_quantiles")
    assert "Sort (" not in p and "Window (" not in p
    assert "BroadcastNestedLoopJoin" in p  # the 1-row sketch broadcast
    assert "CartesianProduct" not in p
    # both scans read ONLY the measured column
    assert "ReadSchema: struct<l_extendedprice:double>" in p


def test_index_delete_probe_stays_pruned_and_broadcasts_tombstones(spark):
    """q_index_delete's probe plan keeps the two 100 TB properties the
    deletion layer must not break: the index scan still plans
    non-empty (band, bshard) PartitionFilters (tombstone masking is an
    anti-join AFTER the pruned scan, never a reason to widen it), and
    the tombstone anti-join broadcasts (the tombstone table is
    request-sized — a shuffled anti-join would re-key the whole pruned
    index side against a few ids)."""
    p = plan_of(spark, "q_index_delete")
    scans = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert any(
        "band" in ln and "bshard" in ln and "[]" not in ln.split("PartitionFilters:")[1][:10]
        for ln in scans
    ), f"index scan lost its partition filters: {scans}"
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, (
        "tombstone masking must be a broadcast anti-join"
    )


def test_ivf_append_census_reads_with_explicit_schema(spark):
    """q_ivf_append's census reads the index back through the meta's
    explicit schema (no inference job) and prunes to the three columns
    the census needs — a full-width read of the payload would scale
    with whatever the corpus carries, not with the census."""
    p = plan_of(spark, "q_ivf_append")
    assert "ReadSchema: struct<embedding:" in p, "census must prune to (embedding, _cell)"
