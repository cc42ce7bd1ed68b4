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

#: Flagship pipeline/codec/streaming entries that MUST hold official slots.
FLAGSHIPS = {
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "text_analysis",
    "lm_quality_score",
    "decontaminate",
    "sequence_packing",
    "stratified_sample",
    "neardup_components",
    "ann_lsh_topk",
    "protobuf_roundtrip",
    "confluent_roundtrip",
    "streaming_tumbling_final",
    "streaming_rows_window",
}

#: Round-5 rotation: first-time-official entries (never gated in r1-r4).
#: Batch 2 swapped grouping_sets_rollup/range_frame (both still mirror-
#: gated) for four more never-official entries — see registry.GATE_ORDER.
ROTATED_IN = {
    "window_with_having",
    "neardup_components",
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
    ):
        assert kept in names
