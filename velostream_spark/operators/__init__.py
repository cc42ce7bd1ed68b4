"""Operator library: the data-processing operators a 100-TB training-data
pipeline needs, built Spark-first (declarative array/aggregate expressions
where possible, Arrow-batched Pandas UDFs only where built-ins cannot express
the semantics).

Modules:
- ``textops``   — normalization, tokenization, language-ID, quality scoring,
                  fingerprinting (whole-stage-codegen expressions, no UDFs).
- ``dedup``     — exact, n-gram Jaccard, MinHash+LSH, SimHash near-dup.
- ``similarity``— embedding cosine brute-force top-k + LSH-bucketed ANN +
                  IVF (even-spaced fixture or k-means-trained index) +
                  semdedup (cluster-bounded blocked-Gram cosine dedup).
- ``pq``        — product quantization: encode/ADC/IVF-PQ, residual
                  encoding, refine re-rank, trained codebooks (Jégou 2011;
                  the FAISS-style production ANN stack, exact oracles for
                  every deterministic-fixture path).
- ``bloom``     — Catalyst-native Bloom filter (bit_or bitmap aggregation,
                  codegen literal probe) + exact bloom-prefiltered
                  anti-join for cross-corpus dedup.
- ``bpe``       — distributed BPE training + encode (replace-chain exact
                  path and rank-priority memoized production twin).
- ``curation``  — corpus-global span dedup (C4-style).
- ``sampling``  — deterministic/stratified sampling, FFD sequence packing.
- ``skew``      — salted aggregation/joins, bucketed-table writes.
- ``multimodal``— binary media columns: typed metadata, decode/feature
                  plumbing via mapInPandas (decode kernels stubbed — the
                  image/audio libs aren't in this container).
- ``asof``      — LEFT as-of join: union + fill-forward window, one keyed
                  exchange (oracle: DuckDB's native ASOF LEFT JOIN).

None of these exist in the reference (SURVEY §7 Phase 4 — 'beyond the
reference'); they are the Phase-4 extensions the north star asks for.
"""
