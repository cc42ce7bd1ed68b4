"""The official correctness gate verifies the FIRST 50 registered catalog
entries (driver behavior, registration order == queries() dict order).
Pin that the first 50 slots cover every SURVEY §2 operator family plus the
flagship pipeline operators, and that GATE_ORDER and the registry agree.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velostream_spark.registry import GATE_ORDER, all_queries

#: Flagship pipeline/codec/streaming entries that MUST hold official slots
#: (updated per rotation batch — displaced near-twins move to the mirror,
#: their coverage carried by the entries noted in registry.GATE_ORDER).
FLAGSHIPS = {
    "span_dedup",
    "ngram_jaccard_pairs",
    "streaming_bloom_dedup",
    "dedup_canonical",
    "repetition_filter",
    "curation_pipeline",
    "corpus_mix",
    "ann_ivf_pq_residual_topk",
    "protobuf_roundtrip",
    "confluent_roundtrip",
    "dialect_tumbling_changes_stream",
    "streaming_rows_window",
    "streaming_pii_gate",
    "streaming_decontam_gate",
    "dialect_asof_groupby_stream",
    "heavy_hitters_cms",
}

#: THIS round's first-time-official entrants: rotation batch 12 (round 15)
#: — the r14 EMIT CHANGES dialect flagships, the three remaining sketch
#: twins converted to exact driver-checkable oracles in r14, the two
#: measured-winner auto-routers, and the last never-gated curation entry.
#: Every displaced near-twin holds an official r14 record (CORRECTNESS_r14
#: was 50/50 green) and stays in the catalog + parity mirror + bench;
#: displacement map in registry.GATE_ORDER's ROTATION batch 12 block.
ROTATED_IN = {
    "dialect_groupby_changes_stream",
    "dialect_tumbling_changes_stream",
    "corpus_stats_approx",
    "hypertable_rollup_approx",
    "approx_count_distinct",
    "tfidf_topk_terms_auto",
    "bigram_lm_auto",
    "repetition_filter",
}


def test_rotated_entries_hold_official_slots():
    first50 = set(list(all_queries())[:50])
    assert ROTATED_IN <= first50


def test_gate_order_is_the_first_50():
    names = list(all_queries())
    assert len(GATE_ORDER) == 50
    assert names[:50] == GATE_ORDER


def test_flagship_pipeline_entries_hold_official_slots():
    first50 = set(list(all_queries())[:50])
    assert FLAGSHIPS <= first50


#: Gate entries whose oracle is rows-only BY DESIGN: none since batch 6 —
#: the round-8 verdict established that an oracle-less gate slot gives the
#: driver zero signal (err: "no_oracle"). Round 14 converted the sketch
#: twins (grid-rebuild / within_bound shapes); round 15 converted the
#: LAST three rows-only entries (ann_ivf_trained_topk, bpe_train_merges,
#: sequence_packing_ffd) to validation oracles — every catalog entry now
#: carries a driver-checkable oracle.
ROWS_ONLY_BY_DESIGN: set[str] = set()


def test_every_gate_entry_has_an_oracle():
    catalog = all_queries()
    missing = [
        n
        for n in GATE_ORDER
        if not catalog[n].oracle and n not in ROWS_ONLY_BY_DESIGN
    ]
    assert not missing, f"gate entries without DuckDB oracle: {missing}"


def test_displaced_entries_still_registered():
    # Rotation must not drop operators from the catalog — displaced entries
    # stay available for bench + the 94-entry parity mirror.
    names = set(all_queries())
    for kept in (
        "union_all",
        "union_distinct",
        "intersect_except",
        "exists_subquery",
        "not_exists_subquery",
        "in_subquery",
        "not_in_subquery",
        "value_functions",
        "distribution_functions",
        "select_wildcard",
        "unixtime_functions",
        "approx_count_distinct",
        # rotated out in round 5
        "select_distinct",
        "group_by_having",
        "conditional_functions",
        "interval_arithmetic",
        "value_distribution_functions",
        "delta_function",
        "first_last_aggs",
        "string_agg",
        "avro_roundtrip",
        "correlated_scalar_subquery",
        # rotated out in round-5 batch 2
        "grouping_sets_rollup",
        "range_frame",
        "semi_anti_join",
        "session_join",
        # rotated out in round-6 batch 3
        "scalar_subquery",
        "exists_not_exists_subquery",
        "lm_quality_score",
        "simhash_pairs",
        "neardup_components",
        "decontaminate",
        "full_outer_join",
        "windowed_join",
        "sliding_window",
        "math_functions",
        "agg_over_rows_frame",
        # rotated out in round-7 batch 4 (all official r6)
        "ann_brute_force_topk",
        "ann_lsh_topk",
        "any_all_subquery",
        "minhash_lsh_pairs",
        "multimodal_frame_sample",
        "rolling_fingerprint",
        "streaming_tumbling_final",
        "streaming_group_by_changes",
        "streaming_dedup",
        # rotated out in round-8 batch 5 (official r6)
        "cast_semantics",
        "text_analysis",
        # rotated out in round-9 batch 6 (all official r8)
        "dedup_exact",
        "stratified_sample",
        "sequence_packing",
        "ann_ivf_trained_topk",
        "streaming_group_by_final",
        "collection_functions",
        "embedding_near_dup",
    ):
        assert kept in names


#: Batch-8 rotation (EXECUTED round 11): every entrant holds a gate slot,
#: and every DISPLACED near-twin stays in the catalog + mirror with its
#: exact oracle intact (their coverage map lives in registry.GATE_ORDER's
#: ROTATION batch 8 block; each holds an official r9/r10 record).
BATCH8_DISPLACED = {
    "ann_ivf_pq_topk",
    "ann_pq_adc_topk",
    "pq_code_dedup",
    "json_functions",
    "pii_scrub",
    "interval_join",
    "dialect_quantified_comparisons",
    "window_with_having",
}


def test_batch8_executed_and_displaced_stay_mirrored():
    catalog = all_queries()
    first50 = set(GATE_ORDER)
    assert ROTATED_IN <= first50
    for n in BATCH8_DISPLACED:
        assert n in catalog and catalog[n].oracle, n
        assert n not in first50, n


#: Batch-9 rotation (EXECUTED round 12): every entrant holds a gate slot,
#: and every DISPLACED near-twin stays in the catalog + mirror with its
#: exact oracle intact (each holds an official r11 record; coverage map
#: in registry.GATE_ORDER's ROTATION batch 9 block).
BATCH9_DISPLACED = {
    "bigram_lm_score",
    "string_functions",
    "asof_join",
    "range_join",
    "global_shuffle",
    "streaming_sliding_final",
    "streaming_interval_join",
    "streaming_session_join",
}


def test_batch9_executed_and_displaced_stay_mirrored():
    catalog = all_queries()
    first50 = set(GATE_ORDER)
    assert ROTATED_IN <= first50
    for n in BATCH9_DISPLACED:
        assert n in catalog and catalog[n].oracle, n
        assert n not in first50, n


#: Batch-10 rotation (EXECUTED round 13): every entrant holds a gate
#: slot, and every DISPLACED near-twin stays in the catalog + mirror with
#: its exact oracle intact (each holds an official r12 record; coverage
#: map in registry.GATE_ORDER's ROTATION batch 10 block).
BATCH10_DISPLACED = {
    "dialect_asof_select",
    "streaming_asof_ss",
    "streaming_range_join",
    "pq_encode",
    "cross_dedup_bloom",
    "semdedup",
    "streaming_classifier_gate",
}


def test_batch10_executed_and_displaced_stay_mirrored():
    catalog = all_queries()
    first50 = set(GATE_ORDER)
    assert ROTATED_IN <= first50
    for n in BATCH10_DISPLACED:
        assert n in catalog and catalog[n].oracle, n
        assert n not in first50, n


#: Batch-11 rotation (EXECUTED round 14): every entrant holds a gate
#: slot, and every DISPLACED near-twin stays in the catalog + mirror with
#: its exact oracle intact (each holds an official record, r13 or
#: earlier; coverage map in registry.GATE_ORDER's ROTATION batch 11
#: block).
BATCH11_DISPLACED = {
    "dialect_asof_stream",
    "dialect_asof_stream_ss",
    "streaming_cms_gate",
    "dialect_range_stream",
    "tfidf_topk_terms",
    "corpus_stats",
    "heavy_hitters",
    "percentile_aggs",
    "bpe_encode",
    "quality_classifier_score",
}


def test_batch11_executed_and_displaced_stay_mirrored():
    catalog = all_queries()
    first50 = set(GATE_ORDER)
    assert ROTATED_IN <= first50
    for n in BATCH11_DISPLACED:
        assert n in catalog and catalog[n].oracle, n
        assert n not in first50, n


def test_auto_regime_twins_share_oracles_verbatim():
    """The auto-routing entries (r13 verdict task 5) must keep their
    window twins' oracles VERBATIM — identical result by construction,
    so the parity mirror verifies the router's both outcomes."""
    catalog = all_queries()
    assert (
        catalog["tfidf_topk_terms_auto"].oracle
        == catalog["tfidf_topk_terms"].oracle
    )
    assert catalog["bigram_lm_auto"].oracle == catalog["bigram_lm_score"].oracle


#: Batch-12 rotation (EXECUTED round 15): every entrant holds a gate
#: slot, and every DISPLACED near-twin stays in the catalog + mirror with
#: its exact oracle intact (each holds an official r14 record; coverage
#: map in registry.GATE_ORDER's ROTATION batch 12 block).
BATCH12_DISPLACED = {
    "dialect_tumbling_select",
    "streaming_tumbling_changes",
    "statistical_aggs",
    "hypertable_rollup",
    "count_distinct",
    "tfidf_topk_terms_join",
    "bigram_lm_grouped",
    "gopher_quality_filter",
}


def test_batch12_executed_and_displaced_stay_mirrored():
    catalog = all_queries()
    first50 = set(GATE_ORDER)
    assert ROTATED_IN <= first50
    for n in BATCH12_DISPLACED:
        assert n in catalog and catalog[n].oracle, n
        assert n not in first50, n


#: Batch-13 rotation plan (round 16, registry.GATE_ORDER doc): every
#: planned entrant must already exist in the catalog WITH an exact oracle
#: — this pin keeps the documented plan executable (a renamed or
#: oracle-less entrant would silently break the next round's rotation).
#: The three are the r15 validation-oracle conversions (the last
#: formerly-rows-only entries).
BATCH13_PLANNED = {
    "sequence_packing_ffd",
    "bpe_train_merges",
    "ann_ivf_trained_topk",
}


def test_batch13_entrants_exist_with_oracles():
    catalog = all_queries()
    missing = [n for n in BATCH13_PLANNED if n not in catalog]
    assert not missing, missing
    no_oracle = [n for n in BATCH13_PLANNED if not catalog[n].oracle]
    assert not no_oracle, no_oracle
    # and none of them currently hold a gate slot (they are entrants)
    first50 = set(GATE_ORDER)
    assert not (BATCH13_PLANNED & first50), BATCH13_PLANNED & first50
