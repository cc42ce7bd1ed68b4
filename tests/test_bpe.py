"""BPE training exactness pins (operators/bpe.py).

The merge loop has no SQL oracle (iterative state), so correctness is
pinned three ways: the published paper example, agreement of the first
merge with the exact-oracle-gated bpe_pair_counts entry, and the
max-frequency monotonicity invariant (merging can only create pairs no
more frequent than the pair just merged)."""

from __future__ import annotations

from velostream_spark.operators.bpe import bpe_merges_from_counts, bpe_train


def test_paper_example_merge_sequence():
    # Sennrich et al. 2016 §3.2 example dictionary (end-of-word marker
    # omitted — this module's convention): the most frequent pair of
    # {'low':5,'lower':2,'newest':6,'widest':3} is ('e','s') freq 9,
    # then ('es','t') freq 9, then ('l','o') freq 7, ('lo','w') freq 7.
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_merges_from_counts(counts, 4)
    assert merges == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
    ]


def test_overlapping_pairs_counted_like_reference():
    # 'aaaa' contributes THREE (a,a) pairs to the statistics but a
    # left-to-right merge pass collapses it to two 'aa' symbols — the
    # reference learn_bpe behavior (overlap-counting stats, non-overlap
    # replacement)
    merges = bpe_merges_from_counts([("aaaa", 1)], 2)
    assert merges[0] == ("a", "a", 3)
    assert merges[1] == ("aa", "aa", 1)


def test_tie_breaks_lexicographic():
    # 'ab' and 'ba' both appear twice -> 'ab' merges first
    merges = bpe_merges_from_counts([("aba", 1), ("bab", 1)], 1)
    assert merges[0][:2] == ("a", "b")


def test_max_frequency_never_increases():
    counts = [("banana", 4), ("bandana", 3), ("cabana", 2), ("análisis", 5)]
    merges = bpe_merges_from_counts(counts, 10)
    freqs = [n for _, _, n in merges]
    assert freqs == sorted(freqs, reverse=True)


def test_first_merge_matches_gated_pair_counts(spark):
    # round 1 of the merge loop over UNCAPPED word counts computes exactly
    # the statistic bpe_pair_counts (exact DuckDB oracle) ranks — the two
    # paths must agree on the argmax pair and its frequency
    from tests.conftest import SF_SMOKE
    from velostream_spark.registry import all_queries
    from velostream_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    # vocab_cap=None = uncapped (NEVER fake it with a huge limit: Spark's
    # takeOrdered allocates a 2k-slot selector per partition — a 10**9 cap
    # OOM-killed the whole JVM in the full-suite run)
    merges = bpe_train(docs, "text", n_merges=1, vocab_cap=None)
    top = all_queries()["bpe_pair_counts"].fn(spark, SF_SMOKE).first()
    assert merges[0][0] + merges[0][1] == top["pair"]
    assert merges[0][2] == top["n"]


def test_merges_independent_of_dictionary_order():
    # dict/Counter iteration order must not leak into the merge sequence
    # (ties break on min(pair), not first-seen)
    import random

    counts = [("banana", 4), ("bandana", 3), ("cabana", 2), ("abba", 7), ("baab", 7)]
    want = bpe_merges_from_counts(counts, 8)
    rng = random.Random(13)
    for _ in range(5):
        shuffled = counts[:]
        rng.shuffle(shuffled)
        assert bpe_merges_from_counts(shuffled, 8) == want


def test_merges_stop_when_no_pairs_remain():
    # single-char words have no pairs: loop terminates early, no padding
    assert bpe_merges_from_counts([("a", 5), ("b", 3)], 10) == []
    # one two-char word: exactly one merge possible
    assert bpe_merges_from_counts([("ab", 2)], 10) == [("a", "b", 2)]


# ---------------------------------------------------------------------------
# bpe_encode: distributed application of a trained merge table


def test_encode_matches_tuple_walk_reference(spark):
    """The sentinel-wrap + string-replace encoding must produce the SAME
    segmentation as the independent tuple-walk greedy merge (the scan the
    training loop uses) — per word, for the pinned table and for adversarial
    tables (overlap runs, symbol-substring-of-symbol)."""
    from pyspark.sql import functions as F

    from velostream_spark.operators import bpe

    cases = [
        ("the cat sat on the mat", None),
        ("aaaa aaa aa a", [("a", "a"), ("aa", "aa")]),  # overlap runs
        ("gab ab c ab", [("a", "b"), ("ab", "c")]),  # substring symbol
        ("join partition hash merge", None),
        ("", None),
    ]
    for text, merges in cases:
        df = spark.createDataFrame([(text,)], "text string")
        enc = df.select(bpe.bpe_encode_expr(F.col("text"), merges).alias("e")).first()["e"]
        got = [
            sym for sym in enc.replace("\x02", "").split("\x01") if sym
        ]
        want: list[str] = []
        for w in text.split():
            if want:
                want.append(" ")
            want.extend(bpe.bpe_encode_ref(w, merges))
        if not text:
            want = []
        assert got == want, (text, got, want)


def test_encode_null_text_consistent(spark):
    """NULL text coalesces to '' (empty encoding) on both twins."""
    import duckdb
    import pandas as pd

    from velostream_spark.operators import bpe
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, None), (2, "lower newest")], "doc_id long, text string")
    got = {
        r["doc_id"]: r["e"]
        for r in df.select("doc_id", bpe.bpe_encode_expr(F.col("text")).alias("e")).collect()
    }
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"doc_id": [1, 2], "text": [None, "lower newest"]}))
    want = dict(con.execute(f"SELECT doc_id, {bpe.bpe_encode_sql('text')} FROM d").fetchall())
    assert got == want
    assert got[1] == ""


def test_encode_plan_zero_shuffle_codegen(spark):
    """bpe_encode is scan-side: no Exchange, no Python stage — one
    whole-stage-codegen span over the parquet scan."""
    import contextlib
    import io

    from tests.conftest import SF_SMOKE
    from velostream_spark.registry import all_queries

    df = all_queries()["bpe_encode"].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "[codegen id : 1]" in plan, plan  # one whole-stage span
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_encode_map_path_matches_expr_path(spark):
    """The production mapInPandas encode (rank-priority scan, table-size-
    independent) is bit-equal to the exact-oracle-gated replace chain on
    training-produced tables — over the real corpus, fixture table."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from velostream_spark.operators import bpe
    from velostream_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    both = bpe.bpe_encode_map(docs.select("doc_id", "text")).select(
        "doc_id",
        "enc",
        bpe.bpe_encode_expr(F.col("text")).alias("enc_chain"),
    )
    diff = both.where(~F.col("enc").eqNullSafe(F.col("enc_chain"))).count()
    assert diff == 0
    assert both.count() > 0

    # trained-table precondition holds for the pinned fixture: every
    # merged pair's constituents are single chars or earlier-rank outputs
    produced = set()
    for a, b in bpe.ENCODE_MERGES:
        assert (len(a) == 1 or a in produced) and (len(b) == 1 or b in produced)
        produced.add(a + b)


def test_encode_roundtrip_property():
    """Lossless segmentation: concatenating the encoded symbols of any
    word reproduces the word — for the fixture table and for freshly
    trained tables over hypothesis-generated corpora."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from velostream_spark.operators import bpe

    WORD = st.text(alphabet="abcdeft h", min_size=0, max_size=24)

    @settings(max_examples=150, deadline=None)
    @given(words=st.lists(WORD, min_size=1, max_size=8))
    def check(words):
        corpus = [(w.replace(" ", ""), 1 + i % 3) for i, w in enumerate(words)]
        corpus = [(w, c) for w, c in corpus if w]
        trained = [(a, b) for a, b, _n in bpe.bpe_merges_from_counts(corpus, 6)]
        for table in (None, trained):
            for w, _c in corpus:
                assert "".join(bpe.bpe_encode_ref(w, table)) == w

    check()


def test_encode_map_plan_single_python_stage(spark):
    """bpe_encode_map is ONE mapInPandas stage over the scan — no shuffle,
    no extra Python stages (the rank table rides in the function closure)."""
    import contextlib
    import io

    from tests.conftest import SF_SMOKE
    from velostream_spark.operators import bpe
    from velostream_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    df = bpe.bpe_encode_map(docs.select("doc_id", "text"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    # formatted mode names each node twice (tree line + detail header)
    assert plan.count("MapInPandas") == 2, plan


def test_encode_paths_equal_on_large_trained_table(spark):
    """Chain and map paths stay bit-equal on a LARGE freshly-trained table
    (128 merges over the corpus) — the trained-table equivalence claim,
    exercised far past the 16-rank fixture (the measured chain-vs-map
    crossover sits at ~64 merges, PERF.md)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from velostream_spark.operators import bpe
    from velostream_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"].select(
        "doc_id", "text"
    )
    merges = [(a, b) for a, b, _n in bpe.bpe_train(docs, "text", n_merges=128)]
    # the sf0.001 corpus exhausts its pair statistics before 128 merges;
    # anything past the measured ~64-merge crossover exercises the claim
    assert len(merges) >= 64, len(merges)
    both = bpe.bpe_encode_map(docs, "text", merges).select(
        "doc_id",
        "enc",
        bpe.bpe_encode_expr(F.col("text"), merges).alias("enc_chain"),
    )
    assert both.where(~F.col("enc").eqNullSafe(F.col("enc_chain"))).count() == 0


def test_encode_map_memo_bit_equal_to_unmemoized(spark, monkeypatch):
    """The per-task word→encoding memo must be a pure transparency: the
    memoized run (normal cap, repeats served from the dict) is bit-equal
    to a fully-unmemoized run (cap forced to 0, every occurrence re-runs
    the merge scan) over the real corpus — which is Zipf enough that the
    memo path actually fires on most occurrences."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from velostream_spark.operators import bpe
    from velostream_spark.session import load_tables

    docs = load_tables(spark, SF_SMOKE, register_views=False)["documents"]
    memoized = bpe.bpe_encode_map(docs.select("doc_id", "text")).select(
        "doc_id", F.col("enc").alias("enc_memo")
    )
    monkeypatch.setattr(bpe, "ENCODE_MEMO_CAP", 0)
    plain = bpe.bpe_encode_map(docs.select("doc_id", "text")).select(
        "doc_id", F.col("enc").alias("enc_plain")
    )
    both = memoized.join(plain, "doc_id")
    diff = both.where(~F.col("enc_memo").eqNullSafe(F.col("enc_plain"))).count()
    assert diff == 0
    assert both.count() > 0
