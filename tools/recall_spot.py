"""ANN quality/cost spot check: recall@10 vs brute force, and steady wall,
for every ANN path in the catalog family — LSH, IVF (fixture + k-means
trained), PQ-ADC, IVF-PQ — over the same query set, on TWO corpora:

- the driver's parquet embeddings (random gaussian — the designed WORST
  case for any clustering index: there are no clusters to find, so a
  trained codebook can only tighten quantization, not discover structure);
- a seeded mixture-of-gaussians set (``clustered_embeddings``) — the
  realistic case, where real corpora live: k-means recovers the mixture
  components and the trained-vs-fixture gap shows the index's true value.

The numbers land in PERF.md's tradeoff table; correctness of each path is
oracle-gated elsewhere (this tool measures QUALITY of the approximation,
which no exact oracle can: recall is a property of the index design).

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


def clustered_embeddings(spark, n: int = 2000, k: int = 16, dim: int = 64,
                         seed: int = 7):
    """Seeded mixture-of-gaussians corpus in the embeddings-table schema
    (vec_id long, embedding array<float>, label int). Centers ~ N(0, I)
    (expected pairwise separation ~sqrt(2·dim)), points ~ N(center,
    0.15² I) — well-separated clusters, the structure k-means indexes are
    built for. Deterministic for a given seed, so pytest pins and the
    spot table see the same corpus."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (k, dim))
    label = rng.integers(0, k, n)
    pts = centers[label] + rng.normal(0.0, 0.15, (n, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in pts],
            "label": label.astype(np.int32),
        }
    )
    return spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    )


def report(spark, emb, corpus_label: str, n_queries: int) -> None:
    from velostream_spark.operators import pq, similarity

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
        "ivf-pq residual (anchors)": lambda: pq.ivf_pq_residual_topk(
            emb, q, cb, k=10, n_centroids=16, nprobe=4
        ),
        "ivf-pq residual trained": lambda: pq.ivf_pq_residual_topk(
            emb,
            q,
            k=10,
            n_centroids=16,
            nprobe=4,
            residual_codebook=pq.pq_train_residual_codebook(
                emb, similarity.ivf_centroids(emb, n_centroids=16)
            ),
        ),
        # FAISS's production default: 8-bit sub-quantizers (256 codes per
        # subspace) — still 8 B of code per vector, 16x the resolution
        "pq adc trained (8-bit)": lambda: pq.pq_adc_topk(
            emb, q, pq.pq_train_codebook(emb, n_codes=256), k=10
        ),
        "ivf-pq res trained (8-bit)": lambda: pq.ivf_pq_residual_topk(
            emb,
            q,
            k=10,
            n_centroids=16,
            nprobe=4,
            residual_codebook=pq.pq_train_residual_codebook(
                emb, similarity.ivf_centroids(emb, n_centroids=16), n_codes=256
            ),
        ),
        # refine (FAISS IndexRefineFlat): ADC keeps top-50, exact cosine
        # re-ranks — recall ceiling is IVF's probed-cell coverage
        "ivf-pq refine r=50 (anchors)": lambda: pq.ivf_pq_residual_topk(
            emb, q, cb, k=10, n_centroids=16, nprobe=4, refine_r=50
        ),
        "ivf-pq refine trained (8-bit)": lambda: pq.ivf_pq_residual_topk(
            emb,
            q,
            k=10,
            n_centroids=16,
            nprobe=4,
            refine_r=50,
            residual_codebook=pq.pq_train_residual_codebook(
                emb, similarity.ivf_centroids(emb, n_centroids=16), n_codes=256
            ),
        ),
        # fully-trained production stack: k-means coarse cells + k-means
        # residual 8-bit codebook + refine
        "ivf-pq full trained + refine": lambda: pq.ivf_pq_residual_topk(
            emb,
            q,
            k=10,
            n_centroids=16,
            nprobe=4,
            refine_r=50,
            centroids=trained,
            residual_codebook=pq.pq_train_residual_codebook(
                emb, trained, n_codes=256
            ),
        ),
    }
    exact = truth()

    def measure(df):
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        got = defaultdict(set)
        for r in df.collect():
            got[r["query_id"]].add(r["neighbor_id"])
        recall = sum(len(got[k] & exact[k]) / 10 for k in exact) / len(exact)
        return recall, best

    print(
        f"\n== {corpus_label} ==\n"
        f"{'method':28s} {'recall@10':>9s} {'wall_s':>7s}   (n_queries={n_queries})"
    )
    for name, build in methods.items():
        recall, best = measure(build())
        print(f"{name:28s} {recall:9.3f} {best:7.3f}")

    # nprobe sweep on the fully-trained stack — THE production knob: each
    # +nprobe step scans nprobe/16 more of the corpus and raises the
    # probed-cell recall ceiling; the sweep shows where it saturates
    rcb8 = pq.pq_train_residual_codebook(emb, trained, n_codes=256)
    print(f"{'nprobe sweep (full trained + refine r=50)':42s}")
    for np_ in (1, 2, 4, 8, 16):
        recall, best = measure(
            pq.ivf_pq_residual_topk(
                emb,
                q,
                k=10,
                n_centroids=16,
                nprobe=np_,
                refine_r=50,
                centroids=trained,
                residual_codebook=rcb8,
            )
        )
        print(f"  nprobe={np_:<3d} {recall:9.3f} {best:7.3f}")


def main() -> None:
    import tempfile

    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from velostream_spark.session import get_session, load_tables

    spark = get_session("recall-spot")
    emb = load_tables(spark, sf_dir, register_views=False)["embeddings"]
    report(spark, emb, f"random gaussian ({sf_dir})", n_queries)

    # clustered twin, same row count, parquet-backed so scan cost matches
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="vs-recall-clustered-", dir=shm)
    n = emb.count()
    clustered_embeddings(spark, n=n).repartition(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "embeddings.parquet"))
    cl = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    report(spark, cl, f"clustered MoG (k=16, n={n}, seed=7)", n_queries)
    spark.stop()


if __name__ == "__main__":
    main()
