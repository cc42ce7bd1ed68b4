"""Scale-up spot check for the corpus-curation operators (PERF.md table).

Replicates sf0.1 `documents` / `embeddings` R× into a multi-file /dev/shm
layout and re-times the curation entries steady-state. Replication rules
differ from bench.py's key-shift pool because these operators key on
CONTENT, not ids:

- documents: doc_id shifts by R*max; text gets a per-replica suffix token
  (" repN") so content is unique ACROSS replicas while every intra-replica
  duplicate relationship (exact dups, shared spans) is preserved — the
  dedup work scales linearly instead of collapsing 16 replicas into one
  survivor set.
- embeddings (semdedup): vec_id shifts; vectors are kept identical, and
  n_centroids scales WITH the corpus (K ≈ R×K0, the production rule
  K≈√N applied to a replicated corpus) so per-cell candidate sets — and
  therefore the O(cell²) Gram work per cell — stay constant-sized. At
  fixed K a 16× corpus would mean 256× Gram FLOPs, which is a scaling
  ANTI-pattern, not a measurement.

Usage: python tools/scale_spot.py [reps ...]   (default: 1 4 16)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def replicate_docs(spark, sf_dir: str, rep: int, root: str) -> str:
    """documents ×rep with shifted ids + content-perturbing suffix; every
    other table symlinked at 1× so catalog entries resolve them."""
    from velostream_spark.session import TABLE_NAMES, load_tables

    d = os.path.join(root, f"sf_docs_x{rep}")
    os.makedirs(d)
    dfs = load_tables(spark, sf_dir, register_views=False)
    docs = dfs["documents"]
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    out = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * max_id).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
        "lang",
        "source",
        F.col("n_chars"),
    )
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    # events ×rep: shift user_id and event_id per replica (keys stay
    # within-replica — more users with the same per-user history, the
    # bench AMORTIZED convention), timestamps unchanged so time windows
    # and as-of spines carry rep× the rows per bucket
    ev = dfs["events"]
    max_eid, max_uid = ev.agg(F.max("event_id"), F.max("user_id")).first()
    ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("rep") * (max_eid + 1)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * (max_uid + 1)).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    emb = dfs["embeddings"]
    max_vid = emb.agg(F.max("vec_id")).first()[0] + 1
    # Perturb per replica so vectors are distinct ACROSS replicas —
    # identical vectors would pile every copy into the same IVF cell
    # (cells R× bigger → R²× Gram work: the mega-cell stress case, now
    # handled by the blocked sweep but not a linear-scaling measurement).
    # Circular dimension rotation + sign flip: norm-preserving, keeps the
    # within-replica similarity structure intact, and spreads replicas
    # over different cells (an additive dim-0 drift was tried first and
    # itself CREATED a 40k-row mega-cell — big-dim-0 vectors all look
    # alike to cosine). Unique for rep < 2·dim = 128.
    emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep") * max_vid).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST("
            "(1 - 2 * ((rep div 64) % 2)) * "
            "element_at(embedding, CAST(((i + rep) % 64) + 1 AS INT)) AS FLOAT))"
        ).alias("embedding"),
        "label",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    for t in TABLE_NAMES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if t not in ("documents", "embeddings", "events") and os.path.exists(src):
            os.symlink(src, os.path.join(d, f"{t}.parquet"))
    return d


def _materialize(df) -> None:
    # noop write, like bench.py: materializes EVERY output column.
    # A count() here would let Catalyst prune projection-only work (e.g.
    # bpe_encode's replace chain, corpus_stats' percentile buffers) and
    # time a bare row-count scan instead — measured 0.19 s vs the real
    # 3.9 s at 128× for bpe_encode.
    df.write.format("noop").mode("overwrite").save()


def steady_min(build, runs: int = 3) -> float:
    _materialize(build())  # warm (also pays one-time memo/index derivation)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _materialize(build())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from velostream_spark.registry import all_queries, memo_plan
    from velostream_spark.session import get_session
    from velostream_spark.operators import similarity

    spark = get_session("scale-spot")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="vs-scale-spot-", dir=shm)
    qs = all_queries()
    entries = [
        "span_dedup",
        "curation_pipeline",
        "pii_scrub",
        "gopher_quality_filter",
        "dedup_exact",
        "cross_dedup_bloom",
        "global_shuffle",
        "streaming_curation",
        # PQ family: fixed 16-centroid codebook/cells, corpus R× — work is
        # one Arrow pass ∝ R with a constant-size index, so the expected
        # curve is flat-until-floor-amortizes then linear, like the
        # single-stage curation ops.
        "pq_encode",
        "ann_pq_adc_topk",
        "ann_ivf_pq_topk",
        "ann_ivf_pq_residual_topk",
        "ann_ivf_pq_refine_topk",
        "pq_code_dedup",
        # round-9 text entries (documents-table scaling)
        "bpe_encode",
        "doc_chunking",
        "corpus_stats",
        # (percentile_aggs_approx reads lineitem, which this tool symlinks
        # at 1x — its scale behavior is its exact twin's single
        # aggregation, covered by bench.py's lineitem layout pool)
        "corpus_stats_approx",
        "heavy_hitters",
        "heavy_hitters_cms",
        "quality_classifier_score",
        "dataset_split",
        "tfidf_topk_terms",
        "tfidf_topk_terms_join",
        "tfidf_topk_terms_auto",
        "bigram_lm_score",
        "bigram_lm_grouped",
        "bigram_lm_auto",
        # time-series family (events-table scaling: rep× users, same
        # per-user history — keys stay within-replica)
        "asof_join",
        "range_join",
        "hypertable_rollup",
        "hypertable_rollup_approx",
        # round-12 entries (events-table scaling): the CMS gate streams
        # rep× events through the literal-grid probe after a rep×-sized
        # grid build; the dialect streaming-asof entries run their whole
        # streaming job (incl. scratch materialization) per invocation
        "streaming_cms_gate",
        "dialect_asof_stream",
        "dialect_asof_stream_ss",
        "dialect_range_stream",
        "dialect_interval_stream",
        "streaming_bloom_dedup",
        "streaming_decontam_gate",
        # round-13: the composed ASOF+GROUP BY statements run BOTH their
        # streaming jobs (enrichment + windowed aggregation) per call
        "dialect_asof_groupby_stream",
        "dialect_groupby_changes_stream",
        "dialect_tumbling_changes_stream",
        "dialect_asof_groupby_stream_ss",
        # round-13: gate family's 5th member (scan-side regex chain)
        "streaming_pii_gate",
    ]
    # SCALE_SPOT_ENTRIES=a,b,c restricts the sweep (e.g. the 512x/1024x
    # composed-pipeline run, where re-timing every 1x-flat entry would
    # dominate the wall for no information). "semdedup" selects the
    # K-scaled semdedup block.
    sel = os.environ.get("SCALE_SPOT_ENTRIES")
    run_semdedup = True
    if sel:
        chosen = [s.strip() for s in sel.split(",") if s.strip()]
        run_semdedup = "semdedup" in chosen
        known = set(entries) | {"semdedup"}
        unknown = [c for c in chosen if c not in known]
        if unknown:
            # a typo'd sweep must not read as "nothing regressed"
            raise SystemExit(
                f"SCALE_SPOT_ENTRIES names not in the preset list: {unknown} "
                f"(known: {sorted(known)})"
            )
        entries = [e for e in entries if e in chosen]
    try:
        dirs = {r: replicate_docs(spark, sf_dir, r, root) for r in reps}
        print(f"{'query':24s} " + " ".join(f"{r:>2d}x_wall" for r in reps))
        for name in entries:
            walls = [steady_min(lambda d=dirs[r]: qs[name].fn(spark, d)) for r in reps]
            print(f"{name:24s} " + " ".join(f"{w:7.3f}" for w in walls))
        # semdedup with K scaled alongside the corpus (see module doc)
        if not run_semdedup:
            return
        walls = []
        for r in reps:
            from velostream_spark.session import load_tables

            emb = load_tables(spark, dirs[r], register_views=False)["embeddings"]
            walls.append(
                steady_min(
                    lambda e=emb, r=r: memo_plan(
                        spark,
                        ("scale-spot-semdedup", r),
                        lambda: similarity.semdedup(
                            e, "embedding", "vec_id", threshold=0.3, n_centroids=8 * r
                        ),
                    )
                )
            )
        print(f"{'semdedup (K=8R)':24s} " + " ".join(f"{w:7.3f}" for w in walls))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
