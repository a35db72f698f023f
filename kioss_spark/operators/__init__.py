"""LLM-data-pipeline operators: deduplication families, similarity search,
text analysis, multimodal column plumbing (the 100 TB north star beyond the
reference's surface — SURVEY.md §7 step 7).

Submodules:
- ``text`` — tokenize/shingle/hash/quality/lang-ID column algebra
- ``dedup`` — exact, n-gram-Jaccard, MinHash-LSH, SimHash
- ``similarity`` — brute-force + IVF cosine top-k, embedding near-dup
- ``multimodal`` — binary payload plumbing, Arrow-batched decode stubs
- ``skew`` — salted agg/join, bucketed-table layout helpers
- ``asof`` — generic as-of join (union + running-last window; no pair blowup)
- ``curation`` — deterministic sampling/splits, token budgeting, packing,
  DSIR importance, shard shuffle
- ``contamination`` — benchmark n-gram decontamination (broadcast semi-join)
- ``privacy`` — PII scan/redaction (JVM regex, zero-shuffle)
- ``rangejoin`` — chunked interval join (equi-join on overlap chunks)
- ``fuzzy`` — FastSS deletion-neighborhood edit-distance joins
- ``bpe`` — BPE tokenizer-merge training (one corpus scan, then
  vocabulary-table iterations)
- ``sketch`` — mergeable sketches: KMV distinct-count (oracle-exact),
  theta set algebra, two-level HLL rollup, KLL quantiles
- ``timeseries`` — dense-grid gap-fill + LOCF regularization
"""

from kioss_spark.operators import (  # noqa: F401
    asof,
    bpe,
    contamination,
    curation,
    dedup,
    fuzzy,
    multimodal,
    privacy,
    rangejoin,
    similarity,
    sketch,
    skew,
    text,
    timeseries,
)
