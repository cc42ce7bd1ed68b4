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
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "dedup_canonical",
    "text_analysis",
    "sequence_packing",
    "stratified_sample",
    "ann_lsh_topk",
    "protobuf_roundtrip",
    "confluent_roundtrip",
    "streaming_tumbling_final",
    "streaming_rows_window",
}

#: Rotation batches: first-time-official entries per round — see
#: registry.GATE_ORDER for the displaced-coverage map.
ROTATED_IN = {
    "window_with_having",
    # (neardup_components, batch-1 entrant, displaced again in batch 3 by
    # dedup_canonical which is built on its output)
    "ann_lsh_topk",
    "protobuf_roundtrip",
    "confluent_roundtrip",
    "dialect_tumbling_select",
    "streaming_group_by_changes",
    "streaming_rows_window",
    # batch 2
    "multimodal_image_stats",
    "embedding_near_dup",
    "dialect_ctas_stream_table_join",
    "streaming_session_join",
    # batch 3 (round 6) — 11 first-time-official entries
    "scalar_exists_subquery",
    "streaming_interval_join",
    "streaming_dedup",
    "streaming_group_by_final",
    "dialect_rows_window_over",
    "dialect_functions_select",
    "ngram_jaccard_pairs",
    "dedup_canonical",
    "rolling_fingerprint",
    "multimodal_frame_sample",
    "ann_brute_force_topk",
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


def test_every_gate_entry_has_an_oracle():
    catalog = all_queries()
    missing = [n for n in GATE_ORDER if not catalog[n].oracle]
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
    ):
        assert kept in names
