"""Multimodal plumbing + IVF ANN quality tests: the parts the DuckDB oracle
can't see — numpy feature math, Arrow batch shape, codec gating, recall."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from velostream_spark.operators import multimodal, similarity
from velostream_spark.session import load_tables


def _docs(spark):
    return load_tables(spark, SF_SMOKE, register_views=False)["documents"]


def test_image_stats_match_numpy(spark):
    media = multimodal.attach_media(_docs(spark), "text")
    got = multimodal.image_stats(media).toPandas().set_index("doc_id")
    src = _docs(spark).select("doc_id", "text").toPandas()
    assert len(got) == len(src)
    for _, row in src.head(25).iterrows():
        b = row["text"].encode("utf-8")
        arr = np.frombuffer(b, dtype=np.uint8)
        g = got.loc[row["doc_id"]]
        assert g["size_bytes"] == len(b)
        assert g["payload_md5"] == hashlib.md5(b).hexdigest()
        assert abs(g["mean_byte"] - arr.mean()) < 1e-9
        assert abs(g["std_byte"] - arr.std()) < 1e-9
        assert g["distinct_bytes"] == len(np.unique(arr))


def test_audio_energy_matches_numpy(spark):
    media = multimodal.attach_media(_docs(spark), "text")
    got = multimodal.audio_chunk_energy(media, chunk_bytes=256).toPandas()
    src = _docs(spark).select("doc_id", "text").toPandas()
    by_doc = {d: g.sort_values("chunk_idx") for d, g in got.groupby("doc_id")}
    checked = 0
    for _, row in src.head(25).iterrows():
        arr = np.frombuffer(row["text"].encode(), dtype=np.uint8).astype(float)
        n = len(arr) // 256
        if n == 0:
            assert row["doc_id"] not in by_doc
            continue
        want = np.sqrt((arr[: n * 256].reshape(n, 256) ** 2).mean(axis=1))
        g = by_doc[row["doc_id"]]
        assert len(g) == n
        assert np.allclose(g["energy"].to_numpy(), want)
        checked += 1
    assert checked > 0


def test_frame_sample_covers_payload(spark):
    media = multimodal.attach_media(_docs(spark), "text")
    frames = multimodal.sample_frames(media).toPandas()
    meta = (
        media.select(
            "doc_id",
            F.col("media.n_frames").alias("nf"),
            (F.length("text") / F.col("media.n_frames")).cast("int").alias("flen"),
        )
        .toPandas()
        .set_index("doc_id")
    )
    counts = frames.groupby("doc_id").size()
    for doc_id, n in counts.items():
        assert n == meta.loc[doc_id, "nf"]
    # every frame has the computed slice length
    merged = frames.merge(meta, left_on="doc_id", right_index=True)
    assert (merged["frame_bytes"] == merged["flen"]).all()


def test_resize_stub_rewrites_metadata(spark):
    media = multimodal.attach_media(_docs(spark), "text")
    out = multimodal.resize_stub(media, 224, 224)
    row = out.select("media.*").first()
    assert row["width"] == 224 and row["height"] == 224
    assert row["mime"].endswith(";resized")


def test_real_decode_gated(spark):
    try:
        import PIL  # type: ignore  # noqa: F401

        pytest.skip("Pillow present; real decode path active")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n")


def test_ivf_recall_vs_brute_force(spark):
    emb = load_tables(spark, SF_SMOKE, register_views=False)["embeddings"]
    queries = emb.orderBy("vec_id").limit(15)
    exact = similarity.brute_force_topk(emb, queries, k=10).toPandas()
    approx = similarity.ivf_topk(
        emb, queries, k=10, n_centroids=16, nprobe=4
    ).toPandas()
    exact_sets = {
        q: set(g["neighbor_id"]) for q, g in exact.groupby("query_id")
    }
    approx_sets = {
        q: set(g["neighbor_id"]) for q, g in approx.groupby("query_id")
    }
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # 4/16 probes: expect well above the 25%-of-corpus-scanned floor
    assert mean_recall >= 0.5, f"IVF mean recall too low: {mean_recall:.3f}"
    # probing every cell = exact: recall must be 1.0
    full = similarity.ivf_topk(
        emb, queries, k=10, n_centroids=8, nprobe=8
    ).toPandas()
    full_sets = {q: set(g["neighbor_id"]) for q, g in full.groupby("query_id")}
    assert all(full_sets[q] == exact_sets[q] for q in exact_sets)


def test_approx_count_distinct_error_bound(spark):
    """approx_count_distinct (HLL — better than the reference's
    'approximate' fn that is secretly exact, accumulator.rs:212-220):
    relative error within the configured rsd against the exact count."""
    ev = load_tables(spark, SF_SMOKE, register_views=False)["events"]
    row = ev.select(
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).first()
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel_err <= 0.06, (row["approx"], row["exact"])


def test_ivf_trained_centroids_recall(spark):
    """K-means-trained IVF index (MLlib, seeded): same probe/re-rank path,
    trained centroids; recall vs brute force must clear the same bar, and
    training must be reproducible (same seed → same centroids)."""
    emb = load_tables(spark, SF_SMOKE, register_views=False)["embeddings"]
    queries = emb.orderBy("vec_id").limit(15)
    c1 = similarity.ivf_train_centroids(emb, n_centroids=8, seed=42)
    c2 = similarity.ivf_train_centroids(emb, n_centroids=8, seed=42)
    assert c1.shape == (8, 64)
    assert np.allclose(np.sort(c1, axis=0), np.sort(c2, axis=0))
    exact = similarity.brute_force_topk(emb, queries, k=10).toPandas()
    approx = similarity.ivf_topk(
        emb, queries, k=10, n_centroids=8, nprobe=4, centroids=c1
    ).toPandas()
    exact_sets = {q: set(g["neighbor_id"]) for q, g in exact.groupby("query_id")}
    approx_sets = {q: set(g["neighbor_id"]) for q, g in approx.groupby("query_id")}
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5


def test_semdedup_greedy_by_id_rule(spark):
    """Hand-built case pinning the survivor semantics: a doc is dropped
    iff an EARLIER-id doc in the SAME cell has cosine >= tau; kept docs
    carry max_prior_sim = NULL, dropped docs the max over their earlier
    in-cell neighbors (rounded to 6 first)."""
    import math

    vecs = {
        1: [1.0, 0.0],      # cell 0, first -> kept
        2: [0.99, 0.14],    # cell 0, cos(1,2) ~ 0.990 -> dropped
        3: [0.0, 1.0],      # cell 1, first -> kept
        4: [0.1, 0.995],    # cell 1, cos(3,4) ~ 0.995 -> dropped
        5: [-1.0, 0.2],     # cell 1, far from 3 and 4 -> kept
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    out = {
        r["vec_id"]: r
        for r in similarity.semdedup(
            df, threshold=0.9, centroids=cents
        ).collect()
    }
    assert {i: out[i]["kept"] for i in vecs} == {
        1: True, 2: False, 3: True, 4: False, 5: True
    }
    assert {i: out[i]["cell"] for i in vecs} == {1: 0, 2: 0, 3: 1, 4: 1, 5: 1}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        n = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        return round(d / n, 6)

    assert out[1]["max_prior_sim"] is None and out[5]["max_prior_sim"] is None
    assert out[2]["max_prior_sim"] == pytest.approx(cos(vecs[1], vecs[2]), abs=1e-9)
    assert out[4]["max_prior_sim"] == pytest.approx(cos(vecs[3], vecs[4]), abs=1e-9)


def test_semdedup_blocked_sweep_matches_full_gram(spark):
    """A cell WIDER than _DEDUP_BLOCK (forced tiny here) must produce
    bit-equal verdicts to the one-shot full-Gram formulation — including
    duplicate vectors (the boilerplate mega-cell case the blocking exists
    for), zero-norm rows, and the None/max_prior_sim boundary."""
    import numpy as np

    from velostream_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    n, dim = 200, 8
    v = rng.normal(size=(n, dim))
    v[50] = v[10]          # exact duplicate of an earlier id
    v[120] = 0.0           # zero-norm row
    v[130] = v[125] * 2.0  # scaled copy: cosine exactly 1 with id 125
    rows = [(i, [float(x) for x in v[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.zeros((1, dim))  # one cell: everything lands together

    # reference: one full Gram, same rounding/tie rules
    norms = np.sqrt((v * v).sum(axis=1))
    s = np.round(v @ v.T / np.maximum(np.outer(norms, norms), 1e-300), 6)
    zero = norms == 0.0
    s[zero, :] = 0.0
    s[:, zero] = 0.0
    upper = np.triu(np.ones_like(s, dtype=bool), k=1)
    thr = 0.5
    want_prior = (upper & (s >= thr)).any(axis=0)
    want_maxp = np.where(upper, s, -np.inf).max(axis=0, initial=-np.inf)

    old = sim._DEDUP_BLOCK
    sim._DEDUP_BLOCK = 16  # force many blocks over the 200-row cell
    try:
        out = {
            r["vec_id"]: r
            for r in sim.semdedup(df, threshold=thr, centroids=cents).collect()
        }
    finally:
        sim._DEDUP_BLOCK = old
    for i in range(n):
        assert out[i]["kept"] == (not want_prior[i]), i
        if want_prior[i]:
            assert out[i]["max_prior_sim"] == float(want_maxp[i]), i
        else:
            assert out[i]["max_prior_sim"] is None, i
    assert not out[50]["kept"] and out[50]["max_prior_sim"] == 1.0
    assert not out[130]["kept"] and out[130]["max_prior_sim"] == 1.0


def test_streaming_decontam_gate_drops_known_contaminant(spark, tmp_path):
    """Hand-built unit pin for the decontamination gate's verdict logic,
    complementing the corpus-level parity: a stream vector IDENTICAL to a
    benchmark vector in its cell is dropped; an orthogonal one survives."""
    import numpy as np
    from pyspark.sql import functions as F

    from velostream_spark.operators import similarity
    from velostream_spark.streaming.runner import run_available_now

    dim = 8
    e0 = [1.0] + [0.0] * (dim - 1)
    e1 = [0.0, 1.0] + [0.0] * (dim - 2)
    bench = spark.createDataFrame(
        [(100, e0)], "vec_id int, embedding array<float>"
    )
    cents = np.asarray([e0, e1], dtype=np.float64)
    b = similarity.ivf_assign(
        bench, cents, out_id="b_id", out_vec="b_v"
    ).withColumnsRenamed({"_cell": "b_cell"})

    def norm_of(vc):
        return F.sqrt(
            F.aggregate(
                F.col(vc), F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )

    b = b.withColumn("b_norm", norm_of("b_v"))
    src = str(tmp_path / "stream_in")
    spark.createDataFrame(
        [(1, e0), (2, e1)], "vec_id int, embedding array<float>"
    ).write.parquet(src)
    sdf = spark.readStream.schema("vec_id int, embedding array<float>").parquet(src)
    a = similarity.ivf_assign(
        sdf, cents, out_id="vec_id", out_vec="a_v"
    ).withColumn("a_norm", norm_of("a_v"))
    dot = F.aggregate(
        F.zip_with("a_v", "b_v", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(
        F.when(F.col("a_norm") * F.col("b_norm") > 0,
               dot / (F.col("a_norm") * F.col("b_norm"))).otherwise(0.0), 6,
    )
    hit = (F.col("_cell") == F.col("b_cell")) & (cos >= F.lit(0.9))
    out = run_available_now(
        a.join(F.broadcast(b), hit, "left_anti").select("vec_id"),
        "append",
        "decontam_unit",
    )
    assert sorted(r["vec_id"] for r in out.collect()) == [2]


def test_decontam_gate_shuffled_fallback_matches_broadcast(spark, monkeypatch):
    """r12 verdict task 7: past the measured benchmark-set broadcast
    ceiling the gate falls back to the shuffled cell-equi-join. Forcing
    the fallback (ceiling=0) must produce the IDENTICAL verdict set as
    the broadcast form at the same scale — only the exchange strategy
    may differ."""
    import velostream_spark.queries.multimodal_queries as mm

    sf = "/root/testdata/sf0.001"
    base = mm.streaming_decontam_gate(spark, sf)
    want = sorted((r["vec_id"], r["cell"]) for r in base.collect())
    monkeypatch.setattr(mm, "DECONTAM_BROADCAST_MAX_ROWS", 0)
    fb = mm.streaming_decontam_gate(spark, sf)
    got = sorted((r["vec_id"], r["cell"]) for r in fb.collect())
    assert got == want and len(got) > 0
