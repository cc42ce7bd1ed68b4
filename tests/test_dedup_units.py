"""Pure-Python pinning tests for the dedup operators: reimplement MinHash /
SimHash / Jaccard from their definitions (seeded-md5 min over shingles;
md5-nibble majority vote) and check the Catalyst expressions bit-for-bit.
These cover what the DuckDB oracle can't reach (simhash_pairs is rows-only)
and pin the exact hash definitions against accidental drift."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from velostream_spark.operators import dedup
from velostream_spark.session import load_tables


# -- pure-python reimplementations (from the operator docstrings) ------------


def py_normalize(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip().lower())


def py_words(text: str) -> list[str]:
    return py_normalize(text).split(" ")


def py_shingles(text: str, n: int = 3) -> list[str]:
    w = py_words(text)
    if len(w) >= n:
        grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    else:
        grams = [" ".join(w)]
    seen, out = set(), []
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def py_minhash(text: str, num_hashes: int = 8, shingle_n: int = 3) -> list[str]:
    sh = py_shingles(text, shingle_n)
    return [
        min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in sh)
        for k in range(num_hashes)
    ]


def py_simhash(text: str, bits: int = 64) -> str:
    w = py_words(text)
    votes = [0] * bits
    for word in w:
        h = hashlib.md5(word.encode()).hexdigest()
        for j in range(bits):
            nib = int(h[j // 4], 16)
            votes[j] += (nib >> (j % 4)) & 1
    return "".join("1" if v * 2 > len(w) else "0" for v in votes)


def py_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(py_shingles(a, n)), set(py_shingles(b, n))
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


# -- pinning tests ------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    return (
        load_tables(spark, SF_SMOKE, register_views=False)["documents"]
        .select("doc_id", "text")
        .limit(30)
        .toPandas()
    )


def test_minhash_signature_matches_python(spark, docs):
    df = spark.createDataFrame(docs)
    got = (
        df.select(
            "doc_id", dedup.minhash_signature(F.col("text"), 8, 3).alias("sig")
        )
        .toPandas()
        .set_index("doc_id")["sig"]
    )
    for _, row in docs.iterrows():
        assert list(got.loc[row["doc_id"]]) == py_minhash(row["text"]), row["doc_id"]


def test_simhash_signatures_match_python(spark, docs):
    df = spark.createDataFrame(docs)
    got = (
        dedup.simhash_signatures(df, "text", "doc_id", 64)
        .toPandas()
        .set_index("doc_id")["simhash"]
    )
    for _, row in docs.iterrows():
        assert got.loc[row["doc_id"]] == py_simhash(row["text"]), row["doc_id"]


def test_jaccard_verification_matches_python(spark, docs):
    df = spark.createDataFrame(docs)
    pairs = dedup.minhash_lsh_pairs(
        df, "text", "doc_id", num_hashes=8, num_bands=4, shingle_n=3, threshold=0.0
    )
    got = pairs.toPandas()
    texts = docs.set_index("doc_id")["text"]
    assert len(got) > 0, "no candidate pairs at threshold 0 on 30 docs"
    for _, r in got.iterrows():
        want = round(py_jaccard(texts.loc[r["id_a"]], texts.loc[r["id_b"]]), 6)
        assert abs(r["jacc"] - want) < 1e-6, (r["id_a"], r["id_b"])


def test_simhash_pairs_hamming_is_correct(spark, docs):
    df = spark.createDataFrame(docs)
    pairs = dedup.simhash_pairs(
        df, "text", "doc_id", bits=64, num_bands=4, max_hamming=64
    ).toPandas()
    sigs = {r["doc_id"]: py_simhash(r["text"]) for _, r in docs.iterrows()}
    assert len(pairs) > 0
    for _, r in pairs.iterrows():
        sa, sb = sigs[r["id_a"]], sigs[r["id_b"]]
        ham = sum(x != y for x, y in zip(sa, sb))
        assert r["hamming"] == ham, (r["id_a"], r["id_b"])
        # candidates must share at least one exact 16-bit band
        assert any(
            sa[k * 16 : (k + 1) * 16] == sb[k * 16 : (k + 1) * 16]
            for k in range(4)
        )


def test_asof_join_semantics(spark):
    """Operator contract: inclusive rt <= t match, latest-wins, NULLs
    when nothing precedes, left rows always preserved."""
    from velostream_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 9, "b"), (1, 4, "early"), (2, 3, "c")],
        "k int, t int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 10.0), (1, 7, 20.0), (2, 8, 30.0)],
        "k int, rt int, v double",
    )
    got = {
        (r["k"], r["t"]): r["asof_v"]
        for r in asof_join(left, right, "k", "t", "rt", ["v"]).collect()
    }
    assert got == {
        (1, 5): 10.0,   # inclusive: rt == t matches
        (1, 9): 20.0,   # latest preceding wins
        (1, 4): None,   # nothing precedes
        (2, 3): None,
    }


def test_range_join_exact_and_duplicate_free(spark):
    """Bucketized range join == naive BETWEEN join exactly: overlapping
    ranges multi-match, boundary values respect inclusivity, and no
    (point, range) pair is emitted twice even when a range spans many
    buckets."""
    from velostream_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 25.0), (4, 99.5), (5, -3.0)],
        "pid int, v double",
    )
    rng = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 5.0, 30.0), (300, -50.0, 100.0)],
        "rid int, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["rid"])
        for r in range_join(pts, rng, "v", "lo", "hi", bucket_width=7.0).collect()
    )
    want = sorted(
        (r["pid"], r["rid"])
        for r in pts.crossJoin(rng)
        .where((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
        .collect()
    )
    assert got == want
    assert len(got) == len(set(got))  # duplicate-free
    assert (2, 100) in got and (2, 200) in got  # overlapping multi-match
    assert (1, 100) in got  # inclusive boundaries


def test_asof_and_range_join_null_and_inverted_edges(spark):
    """asof: a NULL-timestamp right row must match nothing (SQL comparison
    semantics), even though it would sort first in the fill-forward
    window; range: inverted and NULL-bounded ranges match nothing."""
    from velostream_spark.operators.asof import asof_join
    from velostream_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [(1, None, "nl"), (1, 3, "a"), (None, 3, "nk")], "k int, t int, tag string"
    )
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 2, 5.0), (None, 1, 77.0)], "k int, rt int, v double"
    )
    got = {r["tag"]: r["asof_v"] for r in asof_join(left, right, "k", "t", "rt", ["v"]).collect()}
    # "nk": NULL = NULL never matches in SQL — a NULL-key left row must get
    # NULL payload even though a NULL-key right row (77.0) precedes it,
    # matching DuckDB ASOF LEFT JOIN (Window.partitionBy would otherwise
    # group the NULL keys together and fill-forward 77.0).
    assert got == {"nl": None, "a": 5.0, "nk": None}

    pts = spark.createDataFrame([(1, 5.0)], "pid int, v double")
    rng = spark.createDataFrame(
        [(1, 10.0, 0.0), (2, None, 9.0), (3, 0.0, 9.0)], "rid int, lo double, hi double"
    )
    hits = sorted(r["rid"] for r in range_join(pts, rng, "v", "lo", "hi", 4.0).collect())
    assert hits == [3]


def test_hypertable_rollup_approx_within_hll_tolerance(spark):
    """The HLL continuous-aggregate twin must agree with the exact rollup:
    identical plain aggregates on every grouping-set row, and
    n_users_approx within a loose 5-sigma band of the exact per-stratum
    user cardinality (rsd=0.01 sketch)."""
    from tests.conftest import SF_SMOKE
    from velostream_spark.registry import all_queries

    qs = all_queries()
    exact = {
        (r["bucket_hour"], r["event_type"]): r.asDict()
        for r in qs["hypertable_rollup"].fn(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["bucket_hour"], r["event_type"]): r.asDict()
        for r in qs["hypertable_rollup_approx"].fn(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx) and len(exact) > 2
    for key, e in exact.items():
        a = approx[key]
        # r14: the twin recomputes exact n_users in-query and carries the
        # in-row HLL within_bound validation the driver's oracle checks
        for col in ("n_events", "total_value", "avg_value", "n_users"):
            assert a[col] == e[col], (key, col, a[col], e[col])
        assert a["users_within_bound"] is True, key
