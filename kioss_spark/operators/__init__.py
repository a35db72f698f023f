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
- ``timeseries`` — dense-grid gap-fill + LOCF regularization, per-key
  rate-anomaly scoring
- ``graph`` — integerized PageRank over near-dup graphs

Round-5 additions inside existing submodules: ``text.gopher_flags``
(rule-battery quality gate), ``dedup.minhash_signatures`` (persistent
signature artifact), ``similarity.hard_negatives`` (contrastive mining),
``curation.class_balance_weights`` / ``curation.quantile_strata_sample``,
``multimodal.frame_dedup`` / ``multimodal.image_resize``.
"""

from kioss_spark.operators import (  # noqa: F401
    asof,
    bpe,
    contamination,
    curation,
    dedup,
    fuzzy,
    graph,
    multimodal,
    privacy,
    rangejoin,
    similarity,
    sketch,
    skew,
    text,
    timeseries,
)
