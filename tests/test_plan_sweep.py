"""Catalog-WIDE physical-plan anti-pattern sweep.

tests/test_plans.py pins the plans of ~45 specific entries in detail; this
sweep asserts the three anti-patterns that must hold for EVERY batch
catalog entry, so a new or refactored entry can never silently ship with:

- a ``CartesianProduct`` (an unkeyed shuffled cross join — corpus² rows at
  scale; the one legitimate all-pairs baseline, ann_brute_force_topk, is a
  BROADCAST nested-loop, which is a different node);
- a ``BatchEvalPython`` (row-at-a-time Python UDF — the 10-100× slow path
  this repo bans; Python is allowed only as Arrow-batched MapInPandas /
  FlatMapGroupsInPandas / ArrowEvalPython);
- an un-adaptive shuffle (any plan CONTAINING an Exchange must be wrapped
  in ``AdaptiveSparkPlan`` so AQE can re-plan skew/size at runtime —
  guards against an entry accidentally pinning a config that disables it;
  shuffle-less plans legitimately have no AQE node, and several entries
  are DESIGNED shuffle-free: corpus_mix's zero-shuffle explode,
  minhash_signature's single scan, the scan-side function entries).

Streaming-tagged entries are exercised by their own harness (their
``fn`` executes a query to completion and returns materialized RESULTS,
whose plan is a local scan — sweeping it would assert nothing), so the
sweep covers every batch entry.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from tests.conftest import SF_SMOKE

from velostream_spark.registry import all_queries


def _batch_entries():
    return sorted(
        n for n, e in all_queries().items() if "streaming" not in e.tags
    )


@pytest.mark.parametrize("name", _batch_entries())
def test_no_plan_antipatterns(spark, name):
    from velostream_spark.registry import _PLAN_MEMO

    _PLAN_MEMO.clear()
    df = all_queries()[name].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, (name, plan)
    assert "BatchEvalPython" not in plan, (name, plan)
    if ") Exchange" in plan:
        assert "AdaptiveSparkPlan" in plan, (name, plan)
