"""Physical-plan quality gates: the scale properties claimed in
docstrings must be visible in the executed plans, not just asserted
in prose.  Each test pins one optimizer behavior; a regression that
silently de-optimizes a plan (lost pushdown, join degrading to a
cartesian product, window sort reappearing) fails here even though
results stay correct.
"""

from __future__ import annotations

import pytest

from downloader_spark.plans.registry import registry
from tests.conftest import SF_DIR

_SPECS = registry()


_PLAN_CACHE: dict[str, str] = {}
_FINAL_PLAN_CACHE: dict[str, str] = {}


def plan_of(spark, name: str) -> str:
    plan = _PLAN_CACHE.get(name)
    if plan is None:
        df = _SPECS[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        _PLAN_CACHE[name] = plan
    return plan


@pytest.fixture(scope="module", autouse=True)
def _prewarm_plans(spark):
    """Build every gated key's plan ONCE, concurrently, before the
    per-test asserts read the cache.  Plan construction is driver
    latency (analysis + the operators' eager localCheckpoints), so a
    driver thread pool overlaps it (guide §2.6) — the sequential
    per-test builds were ~150 s of the suite's wall.  A key that
    fails to build here is left out of the cache so its own test
    rebuilds it sequentially and reports the real error."""
    import re
    from concurrent.futures import ThreadPoolExecutor

    with open(__file__) as f:
        src = f.read()
    keys = sorted(set(re.findall(r'plan_of\(spark, "([a-z0-9_]+)"\)', src)))
    final_keys = sorted(
        set(re.findall(r'final_plan_of\(spark, "([a-z0-9_]+)"\)', src))
    )

    def warm(fn, k):
        try:
            fn(spark, k)
        except Exception:  # noqa: BLE001 — rebuilt in the owning test
            pass

    with ThreadPoolExecutor(max_workers=12) as pool:
        futs = [pool.submit(warm, plan_of, k) for k in keys]
        futs += [pool.submit(warm, final_plan_of, k) for k in final_keys]
        for fu in futs:
            fu.result()


def test_filter_watermark_pushes_predicate_to_scan(spark):
    plan = plan_of(spark, "filter_watermark")
    assert "PushedFilters: [" in plan
    assert "GreaterThan(event_id" in plan


def test_scan_project_prunes_columns(spark):
    plan = plan_of(spark, "scan_project")
    # the scan must not read every lineitem column
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_comment" not in read_schema and "l_shipinstruct" not in read_schema


def test_join_inner_broadcasts_dimension_side(spark):
    plan = plan_of(spark, "join_inner")
    assert "BroadcastHashJoin" in plan


def test_join_range_is_not_cartesian(spark):
    plan = plan_of(spark, "join_range")
    assert "CartesianProduct" not in plan
    # the range predicate rides on an equi key -> hash-partitioned join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_agg_basic_has_mapside_partial_aggregation(spark):
    plan = plan_of(spark, "agg_basic")
    # two-phase hash aggregation: partial before the exchange, final after
    assert plan.count("HashAggregate") >= 2


def test_latest_per_key_is_partial_aggregated_not_windowed(spark):
    plan = plan_of(spark, "latest_per_key")
    assert "Window" not in plan
    # struct-max plans as SortAggregate with a MAP-SIDE partial: the
    # shuffle carries one combiner row per key per partition, and the
    # only sort is by the grouping key (not the ordering column)
    assert "partial_max" in plan


def test_top1_per_group_is_partial_aggregated_not_windowed(spark):
    plan = plan_of(spark, "top1_per_group")
    assert "Window" not in plan
    assert "partial_max" in plan


def test_window_rank_prunes_with_salted_local_topk(spark):
    plan = plan_of(spark, "window_rank")
    # three window NODES: salted local top-k, then the global ranking
    # (Spark splits the tie-broken and price-only orderings into two
    # nodes over one exchange)
    assert plan.count("Window [") == 3
    assert "pmod" in plan


def test_sim_search_broadcasts_query_vectors(spark):
    plan = plan_of(spark, "sim_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_stream_late_filter_broadcasts_watermark_scalar(spark):
    plan = plan_of(spark, "stream_late_filter")
    assert "Broadcast" in plan


def test_no_plan_contains_cartesian_product(spark):
    offenders = []
    for name in sorted(_SPECS):
        try:
            if "CartesianProduct" in plan_of(spark, name):
                offenders.append(name)
        except Exception as e:  # pragma: no cover - surface analysis errors
            pytest.fail(f"{name}: plan analysis failed: {e}")
    assert offenders == [], f"cartesian products in: {offenders}"


def test_dedup_exact_hash_is_partial_aggregated_not_windowed(spark):
    plan = plan_of(spark, "dedup_exact_hash")
    assert "Window" not in plan
    assert "partial_min" in plan


def test_dedup_scoped_is_partial_aggregated_not_windowed(spark):
    plan = plan_of(spark, "dedup_scoped")
    assert "Window" not in plan
    assert "partial_min" in plan


def test_agg_grouping_sets_expands_then_partial_aggregates(spark):
    plan = plan_of(spark, "agg_grouping_sets")
    # Expand (one row per grouping set) feeding two-phase aggregation:
    # partials BEFORE the exchange so each set combines map-side
    assert "Expand" in plan
    assert "partial_count" in plan and "partial_sum" in plan
    assert plan.index("Expand") > plan.index("Exchange")  # Expand below it


def test_unpivot_is_shuffle_free(spark):
    plan = plan_of(spark, "unpivot_long")
    assert "Expand" in plan
    assert "Exchange" not in plan  # melt is a map-side row expansion


def test_multiprobe_broadcasts_probes_never_cartesian(spark):
    plan = plan_of(spark, "sim_search_multiprobe")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the corpus side joins the (tiny) probe table via broadcast: the
    # corpus itself is never shuffled for scoring
    assert "BroadcastHashJoin" in plan


def test_pipeline_corpus_gates_before_dedup_shuffle(spark):
    plan = plan_of(spark, "pipeline_corpus")
    # the quality gate's own predicate (the 400000-ppm threshold, a
    # literal that appears nowhere else) must sit BELOW the dedup
    # Exchange in the plan text: only gate survivors are shuffled.
    # (A bare "Filter after Exchange" check is vacuous — scan-level
    # isnotnull filters always print below the first Exchange.)
    assert "Exchange" in plan
    first_exchange = plan.index("Exchange")
    assert "400000" in plan[first_exchange:], "gate must sit below the shuffle"
    assert "400000" not in plan[:first_exchange], "gate leaked above the shuffle"
    assert "CartesianProduct" not in plan


def test_events_funnel_is_single_aggregation_pass(spark):
    plan = plan_of(spark, "events_funnel")
    # conditional-MIN shape: partial aggregates before the user_id
    # exchange, and NO window/sort operators anywhere
    assert "partial_min" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_contamination_broadcasts_benchmark_set(spark):
    plan = plan_of(spark, "text_contamination")
    # the benchmark shingle set joins the corpus via broadcast: the
    # corpus postings are never shuffled for the semi-join
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_url_is_single_aggregation(spark):
    plan = plan_of(spark, "dedup_url")
    # canonicalize map-side, one combined shuffle on the canonical URL
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan and "partial_min" in plan


def test_dedup_simhash_single_exchange_on_doc_id(spark):
    plan = plan_of(spark, "dedup_simhash")
    # ONE exchange of the raw docs, hashed on doc_id: doc_id is a
    # subset of both downstream grouping keys ((doc_id, tok) distinct
    # and the vote groupBy), so neither may re-shuffle.  The 3-exchange
    # round-robin form scattered each doc's tokens across every live
    # partition and the 60-column vote partial-aggregate then grew
    # super-linearly with scale (24x shuffle for 10x docs, PERF.md r9).
    assert plan.count("Exchange") == 1
    assert "Exchange hashpartitioning(doc_id" in plan


def test_join_interval_overlap_is_grid_equi_join(spark):
    """The no-equi-key interval join must run as a hash equi-join on
    the grid cell — never the BroadcastNestedLoopJoin a raw theta
    join plans — and the exactly-once pair accounting must be the
    overlap-start-cell filter, not a dedup: no distinct/dedup
    aggregation over the pair stream exists in the plan (the only
    aggregate is the final per-error rollup)."""
    plan = plan_of(spark, "join_interval_overlap")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "cell" in plan  # the equi key
    # one partial+final rollup pair, nothing else aggregating
    assert plan.count("HashAggregate") == 2


def test_agg_sketch_rollup_prunes_both_levels(spark):
    """Both sketch levels must be WindowGroupLimit-pruned (each
    partition discards all but its k smallest hashes BEFORE the
    exchange — the sketch merge is the shuffle combiner), and every
    join must broadcast a dimension side (nation/region are tiny; the
    fact side never sort-merge-joins)."""
    plan = plan_of(spark, "agg_sketch_rollup")
    assert plan.count("WindowGroupLimit") >= 2
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_text_window_keys_shuffle_docs_not_tokens(spark):
    """text_repetition / text_winnow / text_hashvec: exactly one
    exchange, hashed on doc_id, and it sits BELOW the explode
    (Generate prints above it) — i.e. the shuffle carries compact
    (doc_id, text) rows, never the exploded token/gram stream."""
    for key in ("text_repetition", "text_winnow", "text_hashvec"):
        plan = plan_of(spark, key)
        assert plan.count("Exchange") == 1, key
        assert "Exchange hashpartitioning(doc_id" in plan, key
        assert plan.index("Generate") < plan.index("Exchange"), key


def test_shingle_core_never_shuffles_token_stream(spark):
    """The shared shingle core (minhash / ngram-jaccard / containment)
    must co-locate on doc_id at the RAW-DOCS stage: one exchange of
    compact (doc_id, text) rows, one of the hashed shingle rows — the
    exploded token stream itself (the fat intermediate) never
    shuffles.  Round-robin + window + distinct planned 4 exchanges
    with the token stream shuffling twice."""
    from downloader_spark.io import load_table
    from downloader_spark.operators.llm_dedup import shingle_sets

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    plan = (
        shingle_sets(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2
    assert "Exchange hashpartitioning(doc_id" in plan


def test_join_ip_prefix_broadcasts_prefixes_single_equi_join(spark):
    """LPM must stay a broadcast equi-join on (start, plen): no range
    predicate, no cartesian, and the prefix dimension on the build
    side — the property that keeps per-IP work O(ladder) at 100 TB."""
    plan = plan_of(spark, "join_ip_prefix")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_join_ip_prefix6_broadcasts_prefixes_single_equi_join(spark):
    """v6 LPM must keep the v4 shape at 4 ladder levels: one broadcast
    equi-join on (start_hi, plen), no range predicate, no cartesian —
    lo never participates in matching, so no 128-bit comparisons."""
    plan = plan_of(spark, "join_ip_prefix6")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_join_bloom_prune_broadcasts_filter_words(spark):
    """The runtime-filter pattern only pays off if the filter ships to
    the probe side: both word lookups and the exactness join must be
    broadcasts — any shuffle of the probe side defeats the point."""
    plan = plan_of(spark, "join_bloom_prune")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_dedup_incremental_broadcasts_new_batch_never_cartesian(spark):
    """The bipartite LSH join must broadcast the (small) new batch and
    join on the bucket key — a cartesian or a shuffled corpus-side
    sort would defeat the incremental-ingest shape."""
    plan = plan_of(spark, "dedup_incremental")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_join_scd2_is_broadcast_equi_join_not_range(spark):
    """SCD2 must plan as a broadcast equi-join on the supplier key
    with the validity filter riding on it — no range-join machinery,
    no cartesian, no shuffled sort-merge of the fact side."""
    plan = plan_of(spark, "join_scd2")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------- round 6


def test_sql_q5_broadcasts_dimensions(spark):
    plan = plan_of(spark, "sql_q5_join6")
    # region/nation/supplier are dimension sides: at least two of the
    # five joins must be broadcast, and none may be cartesian
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_sql_q5_pushes_orderdate_range_to_scan(spark):
    plan = plan_of(spark, "sql_q5_join6")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("o_orderdate" in ln for ln in pushed)


def test_pack_sequences_single_window_no_text_shuffle(spark):
    plan = plan_of(spark, "pack_sequences")
    # one window pass over (lang, shard); the raw text column must be
    # projected away before the exchange (only the token COUNT moves)
    assert plan.count("Window [") == 1
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1
    assert "text" not in exchanges[0]


def test_text_chunk_is_shuffle_free(spark):
    plan = plan_of(spark, "text_chunk")
    assert "Exchange" not in plan
    assert "Generate explode" in plan  # map-side explode, no Window


def test_embed_quantize_is_shuffle_free_projection(spark):
    plan = plan_of(spark, "embed_quantize")
    assert "Exchange" not in plan
    assert "Window" not in plan


def test_sample_mixture_broadcasts_rate_table(spark):
    plan = plan_of(spark, "sample_mixture")
    # the |langs|-row rate table broadcasts; the corpus never
    # hash-shuffles (the only exchange feeds the tiny count agg)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_agg_bitmap_distinct_avoids_expand(spark):
    plan = plan_of(spark, "agg_bitmap_distinct")
    # the bitmap rewrite must NOT plan the expand-based distinct:
    # both aggregations are plain two-phase hash aggs
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 4


def test_events_transitions_single_data_shuffle(spark):
    plan = plan_of(spark, "events_transitions")
    # events shuffle once for the per-user window; later exchanges
    # only move the <= |types|^2 pair aggregates
    assert plan.count("Window [") == 2  # lead window + ppm-total window
    assert "CartesianProduct" not in plan


def test_ts_interpolate_broadcasts_grid(spark):
    plan = plan_of(spark, "ts_interpolate")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_events_spike_aggregates_before_window(spark):
    plan = plan_of(spark, "events_spike")
    # the event scan partial-aggregates to hourly counts BEFORE the
    # trailing-frame window runs over the tiny series
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Window [") == 1


def test_table_diff_is_key_colocated_join(spark):
    plan = plan_of(spark, "table_diff")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_agg_argmax_is_partial_aggregated_not_windowed(spark):
    plan = plan_of(spark, "agg_argmax")
    assert "Window" not in plan
    assert "partial_max" in plan


def test_agg_histogram_eqdepth_window_is_partitioned(spark):
    plan = plan_of(spark, "agg_histogram_eqdepth")
    # the ntile window partitions by priority class — a global
    # single-partition sort would be a scale-killer
    assert "SinglePartition" not in plan
    assert plan.count("Window [") == 1


def test_scalar_higher_order_is_shuffle_free(spark):
    plan = plan_of(spark, "scalar_higher_order")
    assert "Exchange" not in plan
    # no Python workers: lambda functions stay JVM-side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_hashvec_needs_no_vocabulary_join(spark):
    plan = plan_of(spark, "text_hashvec")
    # the hashing trick's whole point: no join against a vocab table
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_join_spatial_grid_candidates_join_on_cell(spark):
    plan = plan_of(spark, "join_spatial_grid")
    # candidates must equi-join on the cell id, never distance-cross
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
    # nearest = struct-min aggregation, not a ranking window
    assert "partial_min" in plan and "Window" not in plan


def test_multimodal_chunks_is_shuffle_free(spark):
    plan = plan_of(spark, "multimodal_chunks")
    assert "Exchange" not in plan
    assert "Generate explode" in plan


def test_text_bm25_never_explodes_tokens(spark):
    plan = plan_of(spark, "text_bm25")
    # tf comes from JVM-side size(filter(...)) lambdas in the scan
    # projection; exploding the token stream here would shuffle it
    assert "Generate explode" not in plan
    # top-10 must be per-partition heaps + k-row merge, not a global sort
    assert "TakeOrderedAndProject" in plan
    # corpus stats broadcast back as one row
    assert "Broadcast" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_winnow_window_is_doc_partitioned(spark):
    plan = plan_of(spark, "text_winnow")
    # the selection window partitions by doc_id — never a global sort
    assert "SinglePartition" not in plan
    assert plan.count("Window [") == 1


def test_agg_ohlc_is_one_aggregation_no_window(spark):
    plan = plan_of(spark, "agg_ohlc")
    # open/close are struct-extrema: associative agg, map-side partials
    assert "Window" not in plan
    assert "partial_min" in plan and "partial_max" in plan


def test_events_concurrency_sweep_is_partitioned(spark):
    plan = plan_of(spark, "events_concurrency")
    # every window partitions by user_id or day; a global sweep would
    # serialize the whole endpoint stream through one partition
    assert "SinglePartition" not in plan


def test_ts_ewma_is_single_window_node(spark):
    plan = plan_of(spark, "ts_ewma")
    # all 8 lag taps + row_number fold into ONE Window node
    assert plan.count("Window [") == 1
    assert "SinglePartition" not in plan


def test_agg_winsorize_broadcasts_thresholds(spark):
    plan = plan_of(spark, "agg_winsorize")
    assert "BroadcastHashJoin" in plan


def test_agg_skyline_windows_stay_band_local(spark):
    plan = plan_of(spark, "agg_skyline")
    # the only single-partition window is over the TINY band-stats
    # table (bands, not rows); data windows partition by band/cents.
    # Assert the band stats ride a broadcast join back to the data.
    assert "BroadcastHashJoin" in plan


def test_scalar_zorder_is_shuffle_free_codegen(spark):
    plan = plan_of(spark, "scalar_zorder")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_table_merge_output_is_churn_sized(spark):
    plan = plan_of(spark, "table_merge")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_dq_checks_fuses_single_table_expectations(spark):
    plan = plan_of(spark, "dq_checks")
    # all four orders checks live in ONE aggregation over one scan +
    # the FK anti-join: at most 2 scans of orders (agg + anti-join
    # build side), never one scan per check
    assert plan.count("FileScan parquet") <= 3


def test_agg_gini_is_two_chained_aggregations(spark):
    plan = plan_of(spark, "agg_gini")
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 3  # partials + finals


def test_sample_bootstrap_is_one_scan_all_replicates(spark):
    plan = plan_of(spark, "sample_bootstrap")
    # all B pseudo-samples evaluate as columns of ONE aggregation
    assert plan.count("FileScan parquet") == 1
    assert "Window" not in plan


def test_events_paths_is_one_window_plus_topk(spark):
    plan = plan_of(spark, "events_paths")
    assert plan.count("Window [") == 1
    assert "TakeOrderedAndProject" in plan


def test_multimodal_dedup_chunks_first_occurrence_is_aggregated(spark):
    plan = plan_of(spark, "multimodal_dedup_chunks")
    # first occurrence per digest = struct/position min aggregation,
    # never a window over the global chunk stream
    assert "Window" not in plan
    assert "partial_min" in plan


def test_sql_q2_corr_subquery_is_decorrelated(spark):
    plan = plan_of(spark, "sql_q2_corr")
    # hand-decorrelated shape (round 8): a per-part min aggregate
    # joined back — no subquery nodes, no cartesian, and the size
    # filter reaches the part scan so the fact is pruned BEFORE the
    # min aggregate
    assert "Subquery" not in plan
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("p_size" in ln for ln in pushed)


def test_sql_q1_is_single_two_phase_aggregation(spark):
    plan = plan_of(spark, "sql_q1_pricing")
    # one hash-agg pair (partial + final), one exchange, no join/window
    assert plan.count("HashAggregate") == 2
    assert "Join" not in plan and "Window" not in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed)


def test_sql_q10_pushes_both_fact_filters_and_preaggregates(spark):
    plan = plan_of(spark, "sql_q10_returns")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    assert "o_orderdate" in pushed       # quarter range -> orders scan
    assert "l_returnflag" in pushed      # returns flag -> lineitem scan
    assert "TakeOrderedAndProject" in plan  # top-20, never a full sort
    # aggregate-first: the per-order revenue partial agg sits BELOW
    # the orders join (the fact joins as one decimal per order)
    assert "partial_sum" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # customer + nation


def test_sql_q16_not_in_is_broadcast_anti_join(spark):
    plan = plan_of(spark, "sql_q16_variety")
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_sql_q18_aggregates_lineitem_exactly_once(spark):
    plan = plan_of(spark, "sql_q18_toporders")
    # aggregate-once: the per-order sum is both the HAVING filter and
    # the reported value — exactly ONE lineitem scan (the oracle's
    # IN-subquery form scans/aggregates it twice)
    scans = [
        ln for ln in plan.splitlines() if "Scan parquet" in ln
    ]
    assert sum("lineitem" in ln for ln in scans) == 1
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # customer onto the tiny set


def test_sql_q19_single_scan_no_union_expansion(spark):
    plan = plan_of(spark, "sql_q19_disjuncts")
    # the OR-of-conjunctions must NOT expand into a union of scans:
    # exactly one lineitem scan and one part scan survive
    assert plan.count("Scan parquet") == 2
    assert "Union" not in plan
    assert "BroadcastHashJoin" in plan
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    # the quantity range union [1, 30] pushes to the fact scan
    assert "l_quantity" in pushed


def test_graph_triangles_broadcasts_degrees_no_cartesian(spark):
    plan = plan_of(spark, "graph_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # degree table onto edges


def test_curriculum_order_never_single_partition_sorts(spark):
    plan = plan_of(spark, "curriculum_order")
    # the whole point: NO global range-partitioned sort of the docs;
    # ranking runs per (band, bucket) hash partition
    assert "rangepartitioning" not in plan.lower()
    assert "Window" in plan


def test_text_bpe_pairs_topk_is_heap_not_sort(spark):
    plan = plan_of(spark, "text_bpe_pairs")
    assert "TakeOrderedAndProject" in plan


def test_dq_schema_drift_is_one_scan(spark):
    plan = plan_of(spark, "dq_schema_drift")
    # both halves' metrics fuse into one pass over one events scan
    assert plan.count("Scan parquet") == 1


def test_sample_negative_broadcasts_bucket_minima(spark):
    plan = plan_of(spark, "sample_negative")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_multimodal_frames_is_shuffle_free(spark):
    plan = plan_of(spark, "multimodal_frames")
    assert "Exchange" not in plan


def test_pipeline_pretrain_text_never_shuffles(spark):
    plan = plan_of(spark, "pipeline_pretrain")
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchanges and all("text" not in ln for ln in exchanges)


def test_sql_q6_pushes_all_three_predicates(spark):
    plan = plan_of(spark, "sql_q6_selective")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed
    assert "Join" not in plan


def test_text_repetition_is_single_exchange(spark):
    plan = plan_of(spark, "text_repetition")
    real = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert len(real) == 1 and "doc_id" in real[0]


def test_embed_pq_broadcasts_codebook_never_cartesian(spark):
    plan = plan_of(spark, "embed_pq")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_agg_decay_sum_broadcasts_scalar_anchor(spark):
    plan = plan_of(spark, "agg_decay_sum")
    # the max-day anchor is a 1-row broadcast, then one two-phase agg
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Scan parquet") == 2  # fact + anchor lineage
    assert "Window" not in plan


def test_sql_q8_broadcasts_dimension_chain(spark):
    plan = plan_of(spark, "sql_q8_share")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_sql_q17_computes_cap_as_window_single_fact_scan(spark):
    plan = plan_of(spark, "sql_q17_avgqty")
    # the per-part 20%-of-average cap is an unordered window over the
    # partkey partition: ONE lineitem scan + one exchange, never a
    # second fact scan joined back and never a per-row correlated
    # re-aggregation (the oracle keeps the aggregate-then-join form
    # as the differential)
    assert "Window" in plan
    assert plan.count("Scan parquet") == 2  # lineitem + part, once each
    assert "CartesianProduct" not in plan


def test_sql_q3_pushes_filters_and_top10_is_heap(spark):
    plan = plan_of(spark, "sql_q3_cte")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    # all three single-table predicates reach their scans
    assert "GreaterThan(l_shipdate" in pushed
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed
    assert "LessThan(o_orderdate" in pushed
    # ORDER BY + LIMIT 10 plans per-partition heaps, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_sql_q13_prunes_orders_at_scan_keeps_left_join(spark):
    plan = plan_of(spark, "sql_q13_custdist")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    # the join-predicate non-key filter prunes orders BEFORE the join
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in pushed
    # zero-order customers must survive to the k=0 bucket
    assert "LeftOuter" in plan
    # two chained two-phase aggregations (per-customer, count-of-counts)
    assert plan.count("HashAggregate") >= 4


def test_sql_q14_is_one_broadcast_join_one_aggregation(spark):
    plan = plan_of(spark, "sql_q14_promo")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_shipdate" in pushed
    assert "BroadcastHashJoin" in plan
    # conditional + total sums fuse into ONE two-phase aggregation:
    # a single hashpartitioning exchange on the group key
    real = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(real) == 1


def test_sql_q22_plans_anti_join_and_scalar_broadcast(spark):
    plan = plan_of(spark, "sql_q22_prospects")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    # the dormancy cutoff prunes orders at the scan feeding the anti join
    assert "GreaterThanOrEqual(o_orderdate" in pushed
    assert "LeftAnti" in plan
    # the scalar threshold broadcasts (never a row-expanding join)
    assert "IdentityBroadcastMode" in plan
    assert "CartesianProduct" not in plan


def test_sql_q4_decorelates_exists_to_one_fact_agg(spark):
    plan = plan_of(spark, "sql_q4_late_orders")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    # the order-date window reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in pushed
    # the EXISTS became a per-order aggregate + join, never a
    # correlated probe: two two-phase aggs, no window, no cartesian
    assert plan.count("HashAggregate") >= 4
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_sql_q7_filters_nations_before_broadcast(spark):
    plan = plan_of(spark, "sql_q7_nation_flows")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    # the two target nations prune the dimension AT ITS SCAN
    assert "In(n_name" in pushed
    assert plan.count("BroadcastHashJoin") >= 4
    # one data shuffle: the final group-by exchange
    real = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(real) == 1


def test_sql_q9_prunes_part_dimension_at_scan(spark):
    plan = plan_of(spark, "sql_q9_part_profit")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    # the LIKE filter lands on the part scan feeding the broadcast
    assert "StringContains(p_name,red)" in pushed
    assert plan.count("BroadcastHashJoin") >= 3
    real = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(real) == 1


def test_sql_q11_materializes_value_table_once(spark):
    plan = plan_of(spark, "sql_q11_key_parts")
    # both consumers (rows + total) read the checkpointed aggregate:
    # the final plan touches NO parquet — the fact scanned exactly
    # once, inside the materialization job
    assert plan.count("Scan parquet") == 0
    assert plan.count("Scan ExistingRDD") == 2
    # the global total broadcasts as a 1-row nested-loop filter
    assert "BroadcastNestedLoopJoin" in plan


def test_sql_q15_broadcasts_scalar_max_onto_materialized_rev(spark):
    plan = plan_of(spark, "sql_q15_top_supplier")
    assert plan.count("Scan ExistingRDD") == 2  # rev rows + max(rev)
    # only the supplier dimension still reads parquet here
    scans = [ln for ln in plan.splitlines() if "Scan parquet" in ln]
    assert len(scans) == 1 and "s_name" in scans[0]
    assert "CartesianProduct" not in plan


def test_sql_q20_chains_aggregates_and_semi_joins(spark):
    plan = plan_of(spark, "sql_q20_excess_share")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    # ship-date window pushed into the fact feeding the aggregate
    assert "StartsWith(p_name,small)" in pushed
    assert "LeftSemi" in plan
    assert plan.count("Scan ExistingRDD") == 2  # pq reused for tot
    assert "CartesianProduct" not in plan


def test_sql_q21_no_correlated_probe_no_cartesian(spark):
    plan = plan_of(spark, "sql_q21_last_shipper")
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    # status + nation filters prune at their scans
    assert "EqualTo(o_orderstatus,F)" in pushed
    assert "EqualTo(n_name," in pushed
    # the EXISTS/NOT-EXISTS pair became order statistics: smax
    # materialized once, three consumers, everything equi-joined
    assert plan.count("Scan ExistingRDD") == 3
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_dedup_semantic_learned_prunes_without_window(spark):
    plan = plan_of(spark, "dedup_semantic_learned")
    # the keep decision is one struct-max aggregation per cluster —
    # no window sort over data, no cartesian anywhere
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_substring_spans_capped_postings_materialized(spark):
    plan = plan_of(spark, "dedup_substring_spans")
    # both self-join sides read the ONE materialized capped posting
    # table (explode + md5 + df-cap ran once); candidate generation
    # is the equi join on the gram hash — never a cartesian
    assert plan.count("Scan ExistingRDD") == 2
    assert "CartesianProduct" not in plan
    # the only window left in the final plan is the run numbering
    assert plan.count("Window") == 1


def test_sample_importance_is_pure_map(spark):
    plan = plan_of(spark, "sample_importance")
    # deterministic hash-gated sampling: no shuffle, no join, no
    # window — membership computed entirely in the scan projection
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_text_lm_score_shuffles_token_stream_once(spark):
    plan = plan_of(spark, "text_lm_score")
    # the exploded bigram stream reduces to per-doc counts once and is
    # materialized; corpus count tables and the scoring join all read
    # the checkpointed RDD — the fact-sized stream never re-shuffles
    assert plan.count("Scan ExistingRDD") == 3
    assert "CartesianProduct" not in plan


# ----------------------------------------------------------- round 7


def test_text_oov_rate_vocab_is_topk_heap_and_broadcast(spark):
    plan = plan_of(spark, "text_oov_rate")
    # vocab = global top-k via per-partition heaps (never a full
    # vocabulary sort), then broadcast against the token stream
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_prefix_is_single_scan_single_exchange(spark):
    plan = plan_of(spark, "dedup_prefix")
    # exact-dedup shape on a derived key: one scan, one
    # hash-partitioned aggregation, zero joins
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_graph_degree_reuses_distinct_edge_exchange(spark):
    plan = plan_of(spark, "graph_degree")
    # both degree sides read the ONE materialized distinct-edge table
    assert plan.count("Scan ExistingRDD") == 2
    assert "Join" not in plan


def test_events_cooccurrence_is_equi_join_on_baskets(spark):
    plan = plan_of(spark, "events_cooccurrence")
    # both self-join sides read the materialized distinct-basket
    # table; candidate generation is keyed on user_id — never a
    # cartesian (the 1-row total is the only nested-loop join)
    assert plan.count("Scan ExistingRDD") == 2
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_agg_mad_two_pass_no_extra_shuffles(spark):
    plan = plan_of(spark, "agg_mad")
    # textbook two-pass MAD: each pass is one fact scan + one
    # exchange on event_type; the median table joins back broadcast
    assert plan.count("Scan parquet") == 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_events_seasonality_single_agg_broadcast_total(spark):
    plan = plan_of(spark, "events_seasonality")
    # one map-side-combinable aggregation into <= 168 cells + a 1-row
    # broadcast total — no window, no sort-merge machinery
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ts_seasonal_window_runs_over_daily_aggregate(spark):
    plan = plan_of(spark, "ts_seasonal")
    # the ROWS window must sit ABOVE the per-day aggregation (a
    # |days|-row series), never over the raw event stream: the text
    # below the Window node must still contain the day-keyed
    # aggregation that feeds it
    assert plan.count("Scan parquet") == 1
    assert plan.count("Window [") == 1
    below_window = plan[plan.index("Window ["):]
    assert "HashAggregate(keys=[day" in below_window


def test_sample_reservoir_gets_rank_limit_pushdown(spark):
    plan = plan_of(spark, "sample_reservoir")
    # per-type rank with rank <= k: Spark 4 plans WindowGroupLimit —
    # a PARTIAL per-partition top-k BEFORE the exchange, so only
    # ~k rows per (type, partition) shuffle; losing this pushdown
    # (e.g. by ranking with a non-prefix predicate) re-shuffles the
    # full stream
    assert plan.count("Window [") == 1
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan


def test_embed_norm_profile_no_window_no_join(spark):
    plan = plan_of(spark, "embed_norm_profile")
    # bounded per-row fold + one scalar-row aggregation
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_events_rfm_ntiles_run_over_per_user_table(spark):
    plan = plan_of(spark, "events_rfm")
    # the event stream reduces to one row per user BEFORE the ntile
    # windows, and the |users|-row aggregate is materialized once so
    # the anchor + scoring consumers never re-scan the raw events
    assert plan.count("Scan ExistingRDD") == 2
    assert "Scan parquet" not in plan
    assert "Window [" in plan
    assert "CartesianProduct" not in plan


def test_agg_dispersion_is_two_chained_aggregations(spark):
    plan = plan_of(spark, "agg_dispersion")
    # (type, day) counts -> per-type moment sums, both map-side
    # combinable; no window, no join
    assert plan.count("HashAggregate") >= 4  # 2 aggs x partial+final
    assert "Window" not in plan
    assert "Join" not in plan


def test_stream_dedup_is_struct_min_not_windowed(spark):
    plan = plan_of(spark, "stream_dedup")
    # first-occurrence via struct-min: map-side partial_min, never a
    # per-group window sort
    assert "Window" not in plan
    assert "partial_min" in plan
    assert "Join" not in plan


def test_graph_pagerank_materializes_edges_once(spark):
    plan = plan_of(spark, "graph_pagerank")
    # the orders⋈lineitem distinct-edge join must never appear in the
    # final iteration plan: every edge/degree/node reference reads the
    # materialized tables (ExistingRDD), so the fact shuffle ran once
    assert "Scan parquet" not in plan
    assert plan.count("Scan ExistingRDD") >= 2
    assert "CartesianProduct" not in plan


def test_pipeline_dedup_single_corpus_pass_text_never_shuffles(spark):
    plan = plan_of(spark, "pipeline_dedup")
    # both dedup keys computed in ONE map pass, materialized once:
    # the final plan reads only the keyed table (no parquet re-scan),
    # and no shuffle carries the text column
    assert "Scan parquet" not in plan
    assert plan.count("Scan ExistingRDD") >= 2
    assert "text#" not in plan  # only (doc_id, source, hashes) move
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_text_readability_is_shuffle_free(spark):
    plan = plan_of(spark, "text_readability")
    # three regexp counters + the score are one map projection
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_agg_topk_freq_gets_rank_limit_pushdown(spark):
    plan = plan_of(spark, "agg_topk_freq")
    # fact reduces to the (brand, supplier) count table first, then
    # the rank <= 3 prefix plans WindowGroupLimit partial top-k
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sample_class_balance_broadcasts_scalar_cutoff(spark):
    plan = plan_of(spark, "sample_class_balance")
    # the min-count cutoff is a 1-row broadcast; one rank window per
    # class; never a shuffled join of the doc stream
    assert plan.count("Window [") == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_embed_ann_recall_broadcasts_queries_no_cartesian_blowup(spark):
    plan = plan_of(spark, "embed_ann_recall")
    # both searches broadcast the 5 query vectors; only the exact
    # baseline is a (bounded: 5 x corpus) nested-loop; the IVF side
    # joins on label and the recall join is k-rows-per-query tiny
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in plan


def test_text_novelty_reuses_shingle_table(spark):
    plan = plan_of(spark, "text_novelty")
    # the hashed shingle set is materialized once; both the
    # first-occurrence aggregation and the score join read it
    assert plan.count("Scan ExistingRDD") == 2
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan


def test_embed_label_outliers_broadcast_centroids_rank_pushdown(spark):
    plan = plan_of(spark, "embed_label_outliers")
    # |labels| x dims centroid table broadcasts onto the long-format
    # component rows; the rank <= k prefix plans WindowGroupLimit
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_layout_compaction_window_runs_over_manifest(spark):
    plan = plan_of(spark, "layout_compaction")
    # the prefix-sum window runs over the one-row-per-file manifest
    assert plan.count("Window [") == 1
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_events_user_overlap_reuses_basket_exchange(spark):
    plan = plan_of(spark, "events_user_overlap")
    # distinct baskets materialized once; sizes broadcast onto the
    # bounded pair table; never a cartesian
    assert plan.count("Scan ExistingRDD") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_events_dau_wau_range_joins_grid_not_events(spark):
    plan = plan_of(spark, "events_dau_wau")
    # the event stream reduces to distinct (user, day) ONCE; the
    # 7-day range join runs grid-vs-user-days (bounded fan), never
    # over raw events
    assert plan.count("Scan ExistingRDD") == 2
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan


def test_events_new_returning_reuses_user_day_exchange(spark):
    plan = plan_of(spark, "events_new_returning")
    assert plan.count("Scan ExistingRDD") == 2
    assert "Scan parquet" not in plan
    assert "Window" not in plan


def test_agg_kmv_distinct_sketch_gets_rank_pushdown(spark):
    plan = plan_of(spark, "agg_kmv_distinct")
    # k-smallest per group is a rank prefix: WindowGroupLimit keeps
    # only ~k hashes per partition before the exchange — the sketch
    # merge IS the combiner
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_text_vocab_drift_single_token_reduction(spark):
    plan = plan_of(spark, "text_vocab_drift")
    # one distinct (doc, half, token) reduction feeds both consumers
    assert plan.count("Scan ExistingRDD") >= 2
    assert "Scan parquet" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ts_anomaly_mad_runs_over_daily_aggregate(spark):
    plan = plan_of(spark, "ts_anomaly_mad")
    # medians and the flag filter all run over the materialized
    # |types|x|days| daily table — the event stream reduces once
    assert plan.count("Scan ExistingRDD") >= 2
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan


def test_ts_forecast_baseline_trains_on_daily_aggregate(spark):
    plan = plan_of(spark, "ts_forecast_baseline")
    # the daily table is materialized once; horizon/train/test all
    # read it, and train broadcasts onto the grid-sized test rows
    assert plan.count("Scan ExistingRDD") >= 3
    assert "Scan parquet" not in plan
    assert "SortMergeJoin" not in plan


def test_filter_subquery_is_semi_plus_anti_join(spark):
    plan = plan_of(spark, "filter_subquery")
    # the hand-decorrelated form: one semi, one anti, and the
    # correlated quantity filter pushed to the lineitem scan
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    pushed = "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    assert "l_quantity" in pushed
    assert "c_acctbal" in pushed


def _hint_subtrees(spark, name: str) -> list[str]:
    """Return one string per ResolvedHint node in the key's ANALYZED
    logical plan, holding the hint's child subtree.  Hints are
    consumed during physical planning, so the analyzed plan is the
    only place a pinned build side is still visible — and the only
    honest gate: at test SF, AQE may legitimately auto-broadcast a
    side that would be hinted-OOM at 100 TB."""
    df = _SPECS[name].fn(spark, SF_DIR)
    lines = df._jdf.queryExecution().analyzed().toString().splitlines()

    def marker(ln: str) -> int:
        for tok in ("+- ", ":- "):
            i = ln.find(tok)
            if i >= 0:
                return i
        return -1  # root line: depth above every drawn node

    out = []
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln:
            continue
        d = marker(ln)
        sub = []
        for nxt in lines[i + 1:]:
            if 0 <= marker(nxt) <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


@pytest.mark.parametrize(
    "key,n_hints",
    [("join_inner", 1), ("sql_q10_returns", 1), ("sql_q18_toporders", 0)],
)
def test_customer_side_carries_no_broadcast_hint(spark, key, n_hints):
    """The round-8 fix removed the customer-side broadcast hints from
    these three keys (customer is the unbounded ~15 B-row dimension at
    100 TB — a pinned build side is a guaranteed OOM; AQE picks
    broadcast at test SF from runtime stats, which is fine).  The fix
    was only a REMOVED hint, so a future edit re-adding it would ship
    silently: pin the hint inventory — only the 25-row nation may be
    hinted, never customer."""
    subtrees = _hint_subtrees(spark, key)
    assert len(subtrees) == n_hints, (
        f"{key}: expected {n_hints} broadcast hint(s), found "
        f"{len(subtrees)}"
    )
    for sub in subtrees:
        assert "c_custkey" not in sub, (
            f"{key}: a broadcast hint pins the customer side — "
            "unbounded dimension, OOM at scale"
        )
        assert "n_nationkey" in sub  # the only legitimately hinted dim


# --------------------------------------------------- round-9b gates


def test_text_gopher_rules_is_shuffle_free(spark):
    plan = plan_of(spark, "text_gopher_rules")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_code_detect_is_shuffle_free(spark):
    plan = plan_of(spark, "text_code_detect")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_agg_moments_partial_aggregates_mapside(spark):
    plan = plan_of(spark, "agg_moments")
    # algebraic power sums: partial before the exchange, final after
    assert plan.count("HashAggregate") >= 2
    assert "Window" not in plan


def test_ts_robust_trend_pairs_via_equi_join_not_nested_loop(spark):
    # the lag-explode turns the bounded-lag pair generation into an
    # equi-join; a range/theta formulation would plan a nested loop
    plan = plan_of(spark, "ts_robust_trend")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_ts_holt_linear_folds_jvm_side(spark):
    # the recursive fold is a SQL higher-order function — no Python
    # evaluation node may appear in the hot path
    plan = plan_of(spark, "ts_holt_linear")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sample_temperature_broadcasts_quota_table(spark):
    plan = plan_of(spark, "sample_temperature")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_events_concentration_broadcasts_total_row(spark):
    plan = plan_of(spark, "events_concentration")
    # the 1-row totals side must broadcast; the |users| count table
    # must partial-aggregate map-side before its exchange
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_dedup_lines_joins_on_line_hash_not_text(spark):
    plan = plan_of(spark, "dedup_lines")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # the frequency join key is the md5 hash column
    assert "lh" in plan


def test_embed_bucket_profile_buckets_codegen_side(spark):
    plan = plan_of(spark, "embed_bucket_profile")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_window_topk_hop_prunes_with_window_group_limit(spark):
    # rank <= k over the bounded count table: Spark 4 must plan
    # WindowGroupLimit (partial per-partition top-k before the
    # exchange), and the fat event stream must partial-aggregate
    # before any window
    plan = plan_of(spark, "window_topk_hop")
    assert "WindowGroupLimit" in plan
    assert plan.count("HashAggregate") >= 2


def test_scalar_struct_is_shuffle_free(spark):
    plan = plan_of(spark, "scalar_struct")
    assert "Exchange" not in plan


def test_agg_rate_ci_partial_aggregates_mapside(spark):
    plan = plan_of(spark, "agg_rate_ci")
    assert plan.count("HashAggregate") >= 2
    assert "Window" not in plan


def test_dq_freshness_broadcasts_anchor_row(spark):
    plan = plan_of(spark, "dq_freshness")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_multimodal_wav_energy_is_single_arrow_stage(spark):
    # real decode work must run in ONE Arrow mapInPandas stage over
    # the pruned doc_id column — no shuffle before the Python stage
    plan = plan_of(spark, "multimodal_wav_energy")
    assert "MapInPandas" in plan
    idx = plan.index("MapInPandas")
    assert "Exchange" not in plan[idx:], "shuffle below the Arrow stage"
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read_schema, "doc text must be pruned from the scan"


def test_embed_triplet_mining_joins_on_batch_key(spark):
    # pair generation must be an equi-join on the md5 batch key,
    # never a cartesian/nested-loop over the corpus
    plan = plan_of(spark, "embed_triplet_mining")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_window_nth_single_exchange_single_sort(spark):
    # both window specs share (user_id, (ts, event_id)) — Catalyst
    # must plan ONE exchange and ONE sort for all five functions
    plan = plan_of(spark, "window_nth")
    assert plan.count("Exchange hashpartitioning") == 1


def test_pipeline_split_hygiene_reduces_train_to_distinct_set(spark):
    # train side must collapse to a distinct hash set before the
    # join; the join is an integer-key equi join, never doc x doc
    plan = plan_of(spark, "pipeline_split_hygiene")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_text_vocab_coverage_ranks_compact_table_only(spark):
    # the token stream must reduce to the |vocab| count table before
    # any window; the cutoffs and total must broadcast
    plan = plan_of(spark, "text_vocab_coverage")
    assert plan.count("HashAggregate") >= 2
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


# --------------------------------------------------- round-10 gates


def test_agg_quantile_sketch_rollup_touches_raw_rows_once(spark):
    # raw customer rows feed exactly ONE scan; both join sides that
    # carry dimensions broadcast; level-1 partials aggregate map-side
    plan = plan_of(spark, "agg_quantile_sketch_rollup")
    assert plan.count("customer.parquet") == 1
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_events_type_diversity_two_level_hash_aggs_no_window(spark):
    plan = plan_of(spark, "events_type_diversity")
    assert plan.count("HashAggregate") >= 4  # partial+final at both levels
    assert "Window" not in plan and "Sort [" not in plan


def test_text_char_classes_is_shuffle_free(spark):
    plan = plan_of(spark, "text_char_classes")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ts_paa_single_sort_for_both_windows(spark):
    # row_number and the per-type length share one (event_type)
    # exchange and one sort; day reduction partial-aggregates mapside
    plan = plan_of(spark, "ts_paa")
    assert plan.count("Sort [") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("HashAggregate") >= 4


def test_embed_dim_profile_partial_aggregates_exploded_stream(spark):
    # the posexplode stream must partial-aggregate in its own stage:
    # exactly one exchange, carrying |dims| combiner rows, no Python
    plan = plan_of(spark, "embed_dim_profile")
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2
    assert "Generate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sample_systematic_single_exchange_single_sort(spark):
    plan = plan_of(spark, "sample_systematic")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort [") == 1


def test_multimodal_png_stats_parallelizes_codec_work(spark):
    # ONE Arrow stage fed by a round-robin repartition of the 8-byte
    # key column (CPU-dense codec work must spread across cores; the
    # exchange moves doc_ids, never pixels) over a text-pruned scan
    plan = plan_of(spark, "multimodal_png_stats")
    assert "MapInPandas" in plan
    idx = plan.index("MapInPandas")
    below = plan[idx:]
    assert below.count("Exchange") == 1
    assert "roundrobin" in below.lower()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read_schema, "doc text must be pruned from the scan"


def test_multimodal_png_resize_parallelizes_codec_work(spark):
    plan = plan_of(spark, "multimodal_png_resize")
    assert "MapInPandas" in plan
    idx = plan.index("MapInPandas")
    below = plan[idx:]
    assert below.count("Exchange") == 1
    assert "roundrobin" in below.lower()


def test_dedup_bloom_prefilter_broadcasts_bit_set(spark):
    # the <= 4096-row bit set and the md5 membership set broadcast;
    # nothing plans corpus x batch
    plan = plan_of(spark, "dedup_bloom_prefilter")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_graph_clustering_coeff_closes_wedges_with_equi_joins(spark):
    plan = plan_of(spark, "graph_clustering_coeff")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
    assert plan.count("HashAggregate") >= 2


def test_dedup_minhash_incremental_is_banded_never_all_pairs(spark):
    # candidate generation must join on the band hash (equi), and the
    # new-batch filter must reach both band-side scans of the
    # checkpointed signature table
    plan = plan_of(spark, "dedup_minhash_incremental")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "band" in plan


def test_events_survival_curve_broadcasts_day_grid(spark):
    plan = plan_of(spark, "events_survival_curve")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_multimodal_wav_decimate_is_single_arrow_stage(spark):
    plan = plan_of(spark, "multimodal_wav_decimate")
    assert "MapInPandas" in plan
    idx = plan.index("MapInPandas")
    assert "Exchange" not in plan[idx:]


def test_graph_degree_assortativity_single_pass_over_edges(spark):
    # edge list touched once; moment sums partial-aggregate map-side;
    # driver sees one row
    plan = plan_of(spark, "graph_degree_assortativity")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert plan.count("HashAggregate") >= 2


def test_pipeline_gate_funnel_is_one_scan(spark):
    # all cumulative gate counts fuse into ONE aggregation over ONE
    # scan of documents; the 3-row funnel is a broadcast expansion
    plan = plan_of(spark, "pipeline_gate_funnel")
    assert plan.count("documents.parquet") == 1
    assert plan.count("HashAggregate") >= 2


def test_agg_ttest_ab_is_one_pass_one_row(spark):
    plan = plan_of(spark, "agg_ttest_ab")
    assert plan.count("events.parquet") == 1
    assert plan.count("HashAggregate") >= 2
    assert "Window" not in plan


def test_dedup_rate_by_source_reduces_text_to_md5_in_scan_stage(spark):
    # the shuffle must carry (source, 32-hex md5), never raw text
    plan = plan_of(spark, "dedup_rate_by_source")
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_dedup_lsh_tuning_stays_banded_per_config(spark):
    plan = plan_of(spark, "dedup_lsh_tuning")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # the self-join key includes both cfg and band
    assert "cfg" in plan and "band" in plan


def test_multimodal_phash_dedup_shuffles_signatures_not_pixels(spark):
    # the Arrow stage emits (doc_id, 64-char ahash); the cluster
    # window's exchange moves those rows, never pixel data
    plan = plan_of(spark, "multimodal_phash_dedup")
    assert "MapInPandas" in plan
    assert "ahash" in plan
    assert "CartesianProduct" not in plan


def test_text_lang_confusion_is_langs_squared_aggregation(spark):
    plan = plan_of(spark, "text_lang_confusion")
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_agg_spearman_single_exchange_drives_both_rank_windows(spark):
    # both rank windows and the tie-count window share the event_type
    # partitioning: one hash exchange total
    plan = plan_of(spark, "agg_spearman")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2


def test_multimodal_video_luma_parallelizes_codec_work(spark):
    plan = plan_of(spark, "multimodal_video_luma")
    assert "MapInPandas" in plan
    idx = plan.index("MapInPandas")
    below = plan[idx:]
    assert below.count("Exchange") == 1
    assert "roundrobin" in below.lower()


# ------------------------------------------------------------------
# Exchange-reuse gates for the shared-scan fan-out keys (r10 verdict
# item 2): the shared tables must PROVABLY compute once.  These keys
# finalize under AQE, where ReusedExchange/checkpoint leaves only
# appear in the post-execution plan — so collect first, then inspect.
# ------------------------------------------------------------------


def final_plan_of(spark, name: str) -> str:
    """Post-execution (AQE-final) physical plan."""
    plan = _FINAL_PLAN_CACHE.get(name)
    if plan is None:
        df = _SPECS[name].fn(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        _FINAL_PLAN_CACHE[name] = plan
    return plan


def test_lsh_tuning_band_configs_share_one_signature_computation(spark):
    """The 4 band configs of dedup_lsh_tuning fan out of ONE MinHash
    signature table: every leaf must be a checkpointed-artifact scan
    (zero parquet re-reads of documents), and the banded self-join
    plus verification joins must reuse exchanges rather than
    recompute them per config."""
    plan = final_plan_of(spark, "dedup_lsh_tuning")
    assert plan.count("Scan parquet") == 0, "documents re-scanned past ckpt"
    assert plan.count("Scan ExistingRDD") >= 8  # sigs shared by 4 configs x 2 sides
    assert plan.count("ReusedExchange") >= 1
    assert "CartesianProduct" not in plan


def test_minhash_family_reuses_exchanges_and_never_rescans_text(spark):
    """dedup_minhash / dedup_minhash_incremental: the checkpointed
    shingle table feeds signatures, sizes, and both verification join
    sides — all leaves are RDD scans, and at least one exchange is
    reused between the twin posting sides."""
    for key in ("dedup_minhash", "dedup_minhash_incremental"):
        plan = final_plan_of(spark, key)
        assert plan.count("Scan parquet") == 0, f"{key} re-scans documents"
        assert plan.count("ReusedExchange") >= 1, f"{key} lost exchange reuse"


def test_inverted_index_self_join_sides_share_the_h_exchange(spark):
    """dedup_ngram_jaccard / dedup_containment keep the df-cap window's
    hashpartitioning(h) so the posting self-join's two sides resolve
    to ONE exchange + ReusedExchange (the design note in
    llm_dedup.py's jaccard core; a localCheckpoint variant was
    A/B-measured at sf0.1 in r11 and is a wash — the reuse already
    dedupes the heavy work, so the lineage form stays)."""
    for key in ("dedup_ngram_jaccard", "dedup_containment"):
        plan = final_plan_of(spark, key)
        assert plan.count("ReusedExchange") >= 1, f"{key} lost exchange reuse"
        assert "CartesianProduct" not in plan


def test_cluster_stats_final_plan_is_checkpoint_rooted(spark):
    """dedup_cluster_stats composes iterative label propagation; the
    final aggregation must read ONLY the checkpointed label/cluster
    artifacts (lineage truncated each round), never re-derive them."""
    plan = final_plan_of(spark, "dedup_cluster_stats")
    assert plan.count("Scan parquet") == 0
    assert plan.count("Scan ExistingRDD") >= 1


def test_multimodal_jpeg_keys_parallelize_codec_work(spark):
    """Round-11 JPEG keys: the Arrow codec stage must sit above a
    round-robin repartition of the 8-byte key column (one parquet
    file would otherwise serialize the whole DCT/Huffman work into a
    single Python worker — the round-10 PNG lesson), and the sweep's
    aggregate must be partial before its exchange."""
    for key in ("multimodal_jpeg_stats", "multimodal_jpeg_quality_sweep"):
        plan = plan_of(spark, key)
        assert "MapInPandas" in plan
        idx = plan.index("MapInPandas")
        below = plan[idx:]
        assert "roundrobin" in below.lower(), f"{key} codec not spread"
        assert "CartesianProduct" not in plan
    sweep = plan_of(spark, "multimodal_jpeg_quality_sweep")
    assert sweep.count("HashAggregate") >= 2  # map-side partial


def test_resource_alloc_broadcasts_degree_and_avoids_cartesian(spark):
    """graph_resource_alloc: the intermediate-node degree attaches by
    a BROADCAST equi-join (|nodes|-sized table against the shared-
    neighbor fan-out), and candidate generation stays the bounded
    adjacency self-join — never a cartesian product."""
    plan = plan_of(spark, "graph_resource_alloc")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial on (u,v)


def test_minhash_estimate_error_reads_only_checkpointed_artifacts(spark):
    """dedup_minhash_estimate_error fans the checkpointed shingle and
    signature tables into candidates, exact intersections, sizes, and
    the 12-column agreement compare — no consumer may re-derive them
    from the documents scan."""
    plan = final_plan_of(spark, "dedup_minhash_estimate_error")
    assert plan.count("Scan parquet") == 0
    assert plan.count("Scan ExistingRDD") >= 5
    assert "CartesianProduct" not in plan


def test_hll_registers_are_partial_aggregated(spark):
    """agg_hll_distinct: register construction must be a two-phase
    hash aggregation (map-side max-rank combine before the (type,
    bucket) exchange) — at 100 TB the shuffle carries one combiner
    row per register per partition, never raw hashes."""
    plan = plan_of(spark, "agg_hll_distinct")
    assert plan.count("HashAggregate") >= 4  # regs fold + exact count
    assert "CartesianProduct" not in plan


def test_markov_stationary_iterations_broadcast_the_matrix(spark):
    """events_markov_stationary: each power-iteration step joins the
    |types|-row vector to the |types|^2 matrix — all three joins must
    be broadcasts (iteration cost independent of corpus size), and
    the matrix computes once behind a checkpoint."""
    plan = plan_of(spark, "events_markov_stationary")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan  # checkpointed transition matrix


def test_jpeg_color_key_parallelizes_codec_work(spark):
    plan = plan_of(spark, "multimodal_jpeg_color_stats")
    assert "MapInPandas" in plan
    below = plan[plan.index("MapInPandas"):]
    assert "roundrobin" in below.lower()
    assert "CartesianProduct" not in plan


def test_rake_topk_is_take_ordered_not_global_sort(spark):
    """text_keyword_rake: the corpus top-40 must plan as
    TakeOrderedAndProject (per-partition heaps), never a global sort
    of the full phrase table."""
    plan = plan_of(spark, "text_keyword_rake")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_bot_detection_scans_events_once(spark):
    """events_bot_detection: the run-length and gap-regularity rollups
    both read the ONE checkpointed windowed pass — without it, column
    pruning specialized the two subtrees and the plan paid two full
    event scans + two window shuffles."""
    plan = final_plan_of(spark, "events_bot_detection")
    assert plan.count("Scan parquet") == 0
    assert plan.count("Scan ExistingRDD") >= 2
    assert "CartesianProduct" not in plan


def test_pipeline_multimodal_shuffles_signatures_not_pixels(spark):
    """pipeline_multimodal: pixels stay inside the Arrow stage — the
    keep-list window and the per-source rollup move only (doc_id,
    source, 64-char ahash) rows."""
    plan = plan_of(spark, "pipeline_multimodal")
    assert "MapInPandas" in plan
    assert "ahash" in plan
    below = plan[plan.index("MapInPandas"):]
    assert "roundrobin" in below.lower()
    assert "CartesianProduct" not in plan


def test_group_split_assignment_is_shuffle_free_and_audit_broadcasts(spark):
    """sample_group_split: fold assignment is a stateless row-local
    hash (no exchange between scan and the partial aggregates), and
    the 1-row leakage audit attaches by broadcast."""
    plan = plan_of(spark, "sample_group_split")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # both rollups partial


def test_jpeg_420_key_parallelizes_codec_work(spark):
    """multimodal_jpeg_420_stats: same posture as the 4:4:4 sibling —
    the Arrow codec stage sits above a round-robin repartition of the
    8-byte key column so the subsample/DCT/Huffman work spreads over
    every core; pixels never cross an exchange."""
    plan = plan_of(spark, "multimodal_jpeg_420_stats")
    assert "MapInPandas" in plan
    below = plan[plan.index("MapInPandas"):]
    assert "roundrobin" in below.lower()
    assert "CartesianProduct" not in plan


def test_suffix_spans_resolves_locally_and_reuses_the_python_stage(spark):
    """dedup_suffix_spans: the suffix-array Python stage runs ONCE
    behind a checkpoint (three consumers: candidates, adverts, local
    intervals — without it, column pruning would re-run the SA per
    consumer), candidates sit above a round-robin spread of the slim
    (doc_id, text) columns, and reconciliation is a gram hash join —
    never a cartesian product."""
    plan = final_plan_of(spark, "dedup_suffix_spans")
    assert plan.count("Scan parquet") == 0  # all consumers read the ckpt
    assert plan.count("Scan ExistingRDD") >= 3
    assert "CartesianProduct" not in plan


def test_udtf_lateral_uses_arrow_eval_mode(spark):
    """udtf_lateral: the table function must plan as the Arrow-
    vectorized UDTF evaluator (ArrowEvalPythonUDTF), not the pickled
    row-at-a-time BatchEvalPythonUDTF, and the lateral expansion is
    map-only — no join, no exchange."""
    plan = plan_of(spark, "udtf_lateral")
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange" not in plan  # pure lateral map, no shuffle


def test_jpeg_restart_key_parallelizes_codec_work(spark):
    """multimodal_jpeg_restart_stats: JPEG-family posture — Arrow
    codec stage above a round-robin spread of the key column."""
    plan = plan_of(spark, "multimodal_jpeg_restart_stats")
    assert "MapInPandas" in plan
    below = plan[plan.index("MapInPandas"):]
    assert "roundrobin" in below.lower()
    assert "CartesianProduct" not in plan


def test_cdc_chunks_shuffles_hashes_not_text(spark):
    """text_cdc_chunks: the chunk table computes once behind a
    checkpoint (two consumers: the per-hash distinct-doc count and
    the per-doc rollup), md5 happens BEFORE the exchange so shuffles
    carry 32-hex + longs, and both aggregations are map-side
    partial."""
    plan = final_plan_of(spark, "text_cdc_chunks")
    assert plan.count("Scan parquet") == 0
    assert plan.count("Scan ExistingRDD") >= 2
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4


def test_bfs_levels_reuses_checkpointed_edges_and_avoids_cartesian(spark):
    """graph_bfs_levels: every level's hop join and anti-join read
    checkpointed artifacts (edge list + accumulating visited set) —
    the lineitem scan happens once at edge build, never per level."""
    plan = final_plan_of(spark, "graph_bfs_levels")
    assert plan.count("Scan parquet") == 0
    assert plan.count("Scan ExistingRDD") >= 1
    assert "CartesianProduct" not in plan


def test_bpe_encode_is_one_pass_jvm(spark):
    """text_bpe_encode: tokenizer application must be pure codegen'd
    string rewriting — no Python eval nodes, no join, exactly one
    exchange (the final per-doc partial aggregation)."""
    plan = plan_of(spark, "text_bpe_encode")
    assert "Python" not in plan  # no UDF/UDTF/mapInPandas nodes
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2  # map-side partial


def test_adpcm_key_parallelizes_codec_work(spark):
    """multimodal_adpcm_roundtrip: codec-family posture — Arrow stage
    above a round-robin spread of the key column, no shuffle of
    samples."""
    plan = plan_of(spark, "multimodal_adpcm_roundtrip")
    assert "MapInPandas" in plan
    below = plan[plan.index("MapInPandas"):]
    assert "roundrobin" in below.lower()
    assert "CartesianProduct" not in plan


def test_mulaw_key_parallelizes_codec_work(spark):
    plan = plan_of(spark, "multimodal_mulaw_roundtrip")
    assert "MapInPandas" in plan
    below = plan[plan.index("MapInPandas"):]
    assert "roundrobin" in below.lower()
    assert "CartesianProduct" not in plan


def test_alaw_key_parallelizes_codec_work(spark):
    plan = plan_of(spark, "multimodal_alaw_roundtrip")
    assert "MapInPandas" in plan
    below = plan[plan.index("MapInPandas"):]
    assert "roundrobin" in below.lower()
    assert "CartesianProduct" not in plan


def test_embed_ann_graph_no_global_window(spark):
    """Graph-ANN addressing must never rank the whole corpus: every
    Window node in the plan is partitioned (per-src kNN, per-query
    top-k), and the candidate joins stay hash/broadcast."""
    plan = plan_of(spark, "embed_ann_graph")
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Window [" in line:
            # physical Window prints 'windowspecdefinition(<partition
            # cols>, <order>...' — a global window has no partition col
            assert "windowspecdefinition(query_id" in line or (
                "windowspecdefinition(src" in line
            ), f"unpartitioned window: {line.strip()[:120]}"


def test_dedup_unicode_fold_arrow_fold_then_partial_agg(spark):
    """The fold must run Arrow-batched (never row-at-a-time Python)
    and the keep-first group-by must partial-aggregate map-side, the
    dedup_exact_hash posture."""
    plan = plan_of(spark, "dedup_unicode_fold")
    assert "ArrowEvalPython" in plan
    assert "partial_min" in plan
    assert "Window" not in plan


def test_multimodal_pframe_is_map_only_arrow(spark):
    """The PFV codec key: one Arrow map stage over the repartitioned
    key column — pixels never cross an exchange, so the only
    exchanges are the input repartition and the stat-row aggregation
    (none: output is per-frame rows, no group-by)."""
    plan = plan_of(spark, "multimodal_pframe_stats")
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1  # the explicit repartition only


def test_gif_inflate_gzip_keys_are_map_only_arrow(spark):
    """The round-13b codec keys share the PFV posture: one Arrow map
    stage over the repartitioned key column; payload bytes never
    cross an exchange."""
    for key in (
        "multimodal_gif_stats",
        "multimodal_inflate_stats",
        "multimodal_gzip_members",
        "multimodal_zip_entries",
        "multimodal_tar_members",
        "multimodal_warc_records",
        "multimodal_http_chunked",
    ):
        plan = plan_of(spark, key)
        assert "MapInPandas" in plan, key
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, key
        assert plan.count("Exchange") == 1, key  # the input repartition only


def test_theta_intersect_sketch_rank_pushdown_and_broadcasts(spark):
    plan = plan_of(spark, "agg_theta_intersect")
    # the k-smallest prefix gets the same per-partition pre-truncation
    # as agg_kmv_distinct, and both the sketch-sketch join and the
    # reference-cohort semi-join broadcast their tiny sides
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_exp_histogram_single_value_shuffle(spark):
    plan = plan_of(spark, "agg_exp_histogram")
    # raw values reduce once to (type, bucket) with a map-side partial
    # aggregate; every window runs over the tiny bucket table
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "Scan parquet" in plan


def test_scalar_varint_zero_exchange_codegen(spark):
    plan = plan_of(spark, "scalar_varint")
    # encode+decode are pure projections: no exchange, no Python
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Scan parquet" in plan


def test_filter_zorder_range_scan_side_prefilter(spark):
    plan = plan_of(spark, "filter_zorder_range")
    # the covering z-interval and the exact residual both evaluate
    # scan-side: one stage, no exchange, no join
    assert "Exchange" not in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    # the interval literals are baked in as constants
    assert "Filter" in plan


def test_dq_skew_profile_single_key_reduction(spark):
    plan = plan_of(spark, "dq_skew_profile")
    # per-key counts reduce once with a map-side partial; the windows
    # and percentile walk run over the (type, count) distribution
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_theta_union_broadcast_merge(spark):
    plan = plan_of(spark, "agg_theta_union")
    # the reference sketch is broadcast onto each group's sketch; no
    # users-x-users pass anywhere
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_text_html_strip_zero_exchange_codegen(spark):
    plan = plan_of(spark, "text_html_strip")
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan



def test_parquet_footer_binaryfile_map_only(spark):
    plan = plan_of(spark, "multimodal_parquet_footer")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert plan.count("Exchange") == 1  # the explicit repartition only


# --- round 16 -----------------------------------------------------------


def test_sim_search_ivfpq_broadcasts_everything_small(spark):
    """IVF-PQ: the codebook, the per-query LUT and the truth queries
    are all broadcast — the corpus never sits on the build side and
    no candidate path degrades to a cartesian product."""
    plan = plan_of(spark, "sim_search_ivfpq")
    assert "CartesianProduct" not in plan
    # The three broadcast attachments (codebook, LUT, truth queries)
    # surface as BroadcastHashJoin for the equi-joins and
    # BroadcastNestedLoopJoin for the condition-less tiny-frame
    # expansions — the split between the two varies with SF/stats, so
    # gate on their SUM (every small side broadcast, corpus never on
    # a build side) rather than a per-strategy count.
    n_bcast = plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    )
    assert n_bcast >= 3, plan
    # ADC scoring shuffles only (query_id, vec_id, adc) triples: the
    # aggregate over candidates must have a map-side partial
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_multimodal_parquet_prune_and_struct_map_only(spark):
    """The prune and struct keys are map-only Arrow stages over tiny
    shard dims: no joins, no sorts, one mergeable aggregation at
    most — page/file bytes never cross an exchange."""
    for key in ("multimodal_parquet_prune", "multimodal_parquet_struct"):
        plan = plan_of(spark, key)
        assert "MapInPandas" in plan, key
        assert "CartesianProduct" not in plan, key
        assert "SortMergeJoin" not in plan, key


def test_table_checkpoint_read_partials_merge_mapside(spark):
    """Checkpoint-resolved scan: per-(version, file) partials merge
    through a partial-aggregation pair, and the fold itself is
    driver-side metadata (no join in the plan)."""
    plan = plan_of(spark, "table_checkpoint_read")
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_dedup_containment_df_cap_is_aggregate_not_window(spark):
    """The round-16 weak-flag clear must hold: the stop-shingle df
    cap is a hash aggregate + join, never a count window (the window
    sorts the full Heaps-law posting list — the adjudicated sf1
    bottleneck)."""
    plan = plan_of(spark, "dedup_containment")
    # No COUNT window anywhere: the df cap must be the hash aggregate.
    # (The shingling stage's lead() windows over (doc_id, pos) are a
    # different, legitimate window — gate on the aggregate-function
    # window the weak flag was about, not on WindowExec existing.)
    assert "count(1) windowspecdefinition" not in plan
    assert "count(*) windowspecdefinition" not in plan
    assert "HashAggregate" in plan
