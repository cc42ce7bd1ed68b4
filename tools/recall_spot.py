"""ANN quality/cost spot check: recall@10 vs brute force, and steady wall,
for every ANN path in the catalog family — LSH, IVF (fixture + k-means
trained), PQ-ADC, IVF-PQ — over the same query set. The numbers land in
PERF.md's tradeoff table; correctness of each path is oracle-gated
elsewhere (this tool measures QUALITY of the approximation, which no
exact oracle can: recall is a property of the index design).

Usage: python tools/recall_spot.py [n_queries]   (default 50, sf from
$SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from velostream_spark.operators import pq, similarity
    from velostream_spark.session import get_session, load_tables

    spark = get_session("recall-spot")
    emb = load_tables(spark, sf_dir, register_views=False)["embeddings"]
    q = emb.orderBy("vec_id").limit(n_queries)

    def truth():
        got = defaultdict(set)
        for r in similarity.brute_force_topk(emb, q, k=10).collect():
            got[r["query_id"]].add(r["neighbor_id"])
        return got

    cb = pq.pq_codebook(emb)
    trained = similarity.ivf_train_centroids(emb, n_centroids=16, seed=42)
    methods = {
        "brute_force (exact)": lambda: similarity.brute_force_topk(emb, q, k=10),
        "lsh (6 planes)": lambda: similarity.lsh_topk(
            emb, q, k=10, n_planes=6, dim=64, seed=42
        ),
        "ivf (16 cells, nprobe 4)": lambda: similarity.ivf_topk(
            emb, q, k=10, n_centroids=16, nprobe=4
        ),
        "ivf trained (k-means)": lambda: similarity.ivf_topk(
            emb, q, k=10, n_centroids=16, nprobe=4, centroids=trained
        ),
        "pq adc (8x16 codes)": lambda: pq.pq_adc_topk(emb, q, cb, k=10),
        "pq adc trained (k-means)": lambda: pq.pq_adc_topk(
            emb, q, pq.pq_train_codebook(emb), k=10
        ),
        "ivf-pq (nprobe 4)": lambda: pq.ivf_pq_topk(
            emb, q, cb, k=10, n_centroids=16, nprobe=4
        ),
    }
    exact = truth()
    print(f"{'method':28s} {'recall@10':>9s} {'wall_s':>7s}   (n_queries={n_queries}, {sf_dir})")
    for name, build in methods.items():
        df = build()
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        got = defaultdict(set)
        for r in df.collect():
            got[r["query_id"]].add(r["neighbor_id"])
        recalls = [len(got[k] & exact[k]) / 10 for k in exact]
        print(f"{name:28s} {sum(recalls) / len(recalls):9.3f} {best:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
