"""Text-analysis operators for LLM-data pipelines — tokenization, shingling,
deterministic hashing, quality scoring, language-ID, fingerprinting.

Everything here is pure ``pyspark.sql.functions`` column algebra: JVM-side,
whole-stage-codegen'd, no Python UDFs — the only way these ops survive a
100 TB corpus (a per-row Python tokenizer would be the bottleneck).

Cross-engine determinism: every hash is derived from ``md5`` (identical
bytes-in/hex-out in Spark and DuckDB), truncated to 60 bits so it fits a
signed int64 in both engines. This makes even the *approximate* operators
(MinHash-LSH, SimHash) exactly reproducible by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "shingles",
    "h60",
    "quality_metrics",
    "gopher_flags",
    "chunk_windows",
    "LANG_MARKERS",
]


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (array<string>)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def shingles(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles of a token array (array<string>).

    Built as ``arrays_zip`` of ``n`` shifted ``slice``s (each slice is one
    native array copy; the per-element lambda is only a ``concat_ws`` over
    the pre-zipped struct). The earlier form — ``transform(sequence(...))``
    with a ``slice`` + ``array_join`` per element — re-sliced the token
    array once per shingle position inside the interpreted higher-order
    eval, measured ~2.5x slower on the sf0.1 corpus.

    Fewer than ``n`` tokens -> empty array (``greatest(size-n+1, 0)`` makes
    every slice empty, so the zip is empty — matching DuckDB's empty
    ``range(1,1)``). A NULL token array also yields an empty array (the
    ``coalesce``): direct ``size()``/array consumers see 0, not -1, matching
    the oracle's empty-list convention.
    """
    width = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, width) for i in range(n)])
    sh = F.transform(
        zipped, lambda z: F.concat_ws(" ", *[z[str(i)] for i in range(n)])
    )
    sh = F.coalesce(sh, F.array().cast("array<string>"))
    return F.array_distinct(sh) if distinct else sh


def h60(col: Column) -> Column:
    """Deterministic 60-bit hash shared with the DuckDB oracle:
    first 15 hex chars of md5, parsed base-16.

    DuckDB equivalent: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def salted_h60(col: Column, salt: int) -> Column:
    """Hash family member i — md5 of ``'{salt}|' || value``."""
    return h60(F.concat(F.lit(f"{salt}|"), col))


#: deterministic per-language marker tokens for the n-gram-profile language
#: heuristic. On a real corpus these are the top character/word n-grams per
#: language; the synthetic `documents` fixture shares one vocabulary across
#: langs, so prediction accuracy is data-limited — the operator shape (pure
#: column algebra, one pass, no shuffle) is what carries to 100 TB.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "row", "table"),
    "es": ("data", "query", "scan", "group"),
    "de": ("agg", "hash", "sort", "key"),
    "fr": ("join", "merge", "stream", "filter"),
    "zh": ("spark", "window", "batch", "column"),
}


def marker_score(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens (with multiplicity) in the marker set — one array
    traversal, no shuffle."""
    return F.size(F.filter(toks, lambda x: _isin(x, markers)))


def _isin(x: Column, markers: tuple[str, ...]) -> Column:
    pred = x == F.lit(markers[0])
    for m in markers[1:]:
        pred = pred | (x == F.lit(m))
    return pred


def chunk_windows(toks: Column, window: int = 32, stride: int = 24) -> Column:
    """Overlapping token-window chunks (the retrieval/RAG chunking shape):
    array of structs (chunk_idx, n_tok, chunk_text), windows of ``window``
    tokens every ``stride`` tokens (overlap = window - stride), last window
    ragged, empty token array -> empty result.

    Pure column algebra — ``sequence`` over chunk starts, one ``slice`` per
    chunk — so chunking is narrow codegen that partitions exactly like the
    parent scan; at 100 TB the chunk stream inherits the corpus layout.
    Chunk count uses integer-exact float division (values << 2^53), so the
    DuckDB oracle reproduces the boundaries bit-for-bit.
    """
    n = F.size(toks)
    n_chunks = (
        F.lit(1).cast("long")
        + F.floor((F.greatest(n - F.lit(window), F.lit(0)) + F.lit(stride - 1))
                  / F.lit(float(stride))).cast("long")
    )
    idxs = F.when(n > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1)).otherwise(
        F.array().cast("array<long>")
    )
    return F.transform(
        idxs,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.size(F.slice(toks, i * stride + 1, window)).cast("long").alias("n_tok"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, window)).alias("chunk_text"),
        ),
    )


def gopher_flags(toks: Column):
    """Gopher-style document-quality rule flags (Rae et al. 2021, §A1.1 —
    the repetition-independent subset; fixture-scaled bounds): the
    boolean-gate filter battery every web-corpus pipeline runs before
    dedup. Returns the column tuple ``(n_tok, flag_len, flag_mean_len,
    flag_stop, flag_uniq, flag_alpha)``:

    - ``flag_len``: 5 <= n_tok <= 1000 (Gopher: 50..100k words, scaled to
      the fixture's ~30-160-token docs)
    - ``flag_mean_len``: mean token length in [2, 10] chars — compared as
      ``2*n_tok <= total_chars <= 10*n_tok`` (pure integer, no division)
    - ``flag_stop``: at least one stop word (Gopher requires >= 2 of a
      fixed set; the fixture vocabulary carries exactly this set)
    - ``flag_uniq``: distinct-token ratio >= 0.2 (``5*n_uniq >= n_tok``)
    - ``flag_alpha``: >= 90% of tokens contain a letter, case-insensitive
      (``10*n_alpha >= 9*n_tok``; Gopher: 80% "alphabetic" words — an
      uppercase-only token like "NASA" counts as alphabetic)

    All comparisons are integer-rational, so a DuckDB oracle reproduces
    every flag bit-for-bit. Pure column algebra: zero shuffle, narrow,
    whole-stage-codegen'd — the filter costs one corpus scan at any
    scale. An empty/NULL token array fails ``flag_len`` and passes the
    vacuous ratio flags (0 >= 0), mirroring the SQL semantics exactly.
    """
    n_tok, n_uniq, stop, tok_chars = quality_metrics(toks)
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("(?i)[a-z]")))
    flag_len = (n_tok >= 5) & (n_tok <= 1000)
    flag_mean_len = (tok_chars >= 2 * n_tok) & (tok_chars <= 10 * n_tok)
    flag_stop = stop >= 1
    flag_uniq = n_uniq * 5 >= n_tok
    flag_alpha = n_alpha * 10 >= n_tok * 9
    return n_tok, flag_len, flag_mean_len, flag_stop, flag_uniq, flag_alpha


def quality_metrics(toks: Column):
    """(n_tok, uniq_ratio, stop_ratio, mean_tok_len) column tuple.

    Ratios are int/int divisions — bit-identical across engines; the
    composite score is assembled by callers with a fixed operation order so
    Spark and DuckDB produce the same doubles.
    """
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    stop = F.size(F.filter(toks, lambda x: _isin(x, ("the", "a", "of", "and", "to"))))
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return n_tok, n_uniq, stop, tok_chars


#: 2x2 chi-square drift score over per-token epoch counts (n_a, n_b) and
#: epoch totals (ta, tb), e3-floored.  ONE expression string used VERBATIM
#: by both the Spark engine (F.expr) and the DuckDB oracle: every operand
#: is a pure scalar function of exact integer counts, so with an identical
#: IEEE expression tree the doubles — and the floor — match bit-for-bit
#: (the quality_metrics fixed-op-order discipline).  The CASE guard keeps
#: the engines in lockstep on degenerate slices (an empty epoch, or a
#: token present in every doc of both): the raw division would yield
#: NaN/Inf, which Spark's non-ANSI CAST(NaN AS BIGINT) maps to 0 while
#: DuckDB's cast raises — guarded, both return 0.
CHI2_SQL = (
    "CASE WHEN ta = 0 OR tb = 0 OR (n_a + n_b) = 0"
    " OR (ta - n_a + tb - n_b) = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(floor("
    "(CAST(ta + tb AS DOUBLE)"
    " * (CAST(n_a AS DOUBLE) * CAST(tb - n_b AS DOUBLE)"
    "    - CAST(n_b AS DOUBLE) * CAST(ta - n_a AS DOUBLE))"
    " * (CAST(n_a AS DOUBLE) * CAST(tb - n_b AS DOUBLE)"
    "    - CAST(n_b AS DOUBLE) * CAST(ta - n_a AS DOUBLE)))"
    " / (CAST(n_a + n_b AS DOUBLE) * CAST(ta - n_a + tb - n_b AS DOUBLE)"
    "    * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))"
    " * 1000) AS BIGINT) END"
)


def vocab_drift(
    docs, epoch: Column, text_col: str = "text", top_k: int = 50
):
    """Token-distribution drift between two corpus slices — the corpus-
    health monitor a pipeline runs between crawl snapshots or training
    epochs (did the vocabulary shift? which tokens drive it?). Per token,
    the 2x2 chi-square statistic of (count in epoch A, count in epoch B)
    against the epoch totals: the standard keyword/burst detector
    (Dunning-style association, kept log-free as pure rational+IEEE
    arithmetic — the collocations_pmi discipline — so a SQL oracle
    reproduces every score exactly).

    Returns the ``top_k`` most-drifted tokens as (w, n_a, n_b, chi2_e3).
    Plan: one explode + one token-keyed agg (map-side combined), a 1-row
    totals aggregate broadcast back, and the final top-k sort — the keyed
    shuffle carries the vocabulary, not the corpus, and the only
    single-partition exchange is the |vocab|->top_k final. Scale shape:
    identical to vocab_top_terms at any corpus size.
    """
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("w"), epoch.alias("e"))
    counts = tok.groupBy("w").agg(
        F.sum(F.when(F.col("e") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("e") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    totals = counts.agg(
        F.sum("n_a").cast("long").alias("ta"), F.sum("n_b").cast("long").alias("tb")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select("w", "n_a", "n_b", F.expr(CHI2_SQL).alias("chi2_e3"))
        .orderBy(F.col("chi2_e3").desc(), "w")
        .limit(top_k)
    )
