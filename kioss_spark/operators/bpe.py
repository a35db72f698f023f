"""Tokenizer induction — byte-pair-encoding merge training on the corpus.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"): repeatedly merge the most frequent adjacent
symbol pair. The 100 TB-relevant property is that after ONE corpus scan
(word counts), every training iteration operates on the WORD-COUNT TABLE
(vocabulary-sized, sublinear in corpus) — the corpus is never touched
again. Per merge: one explode of adjacent pairs weighted by word
frequency (keyed agg, map-side combine), one TakeOrdered(1) for the top
pair (deterministic tiebreak: count desc, then pair lexicographic), and
one vocabulary rewrite. The rewrite is an Arrow-batched pass over the
vocab table — Python on vocabulary-sized data is the right trade (the
fold is awkward as pure column algebra and the table is tiny relative to
the corpus); everything corpus-sized stays JVM-side.

APPLICATION (the corpus-sized pass) also has a pure-column form: encode
each word's symbols as chr(30)+sym+chr(31) concatenated, then each merge
(a, b) in order is one ``replace(s, enc(a)+enc(b), enc(ab))``. Because
every symbol carries its own boundary brackets, a substring match is
exact (no suffix/prefix false positives, no shared-boundary skips), and
plain left-to-right non-overlapping ``replace`` reproduces the greedy
merge scan exactly (fuzzed against ``segment_word`` over 20k random
word x merge-list cases). ``queries/llm.py:bpe_segment_corpus`` uses this
form — zero Python on the corpus path, and the same chain runs verbatim
in the DuckDB oracle.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kioss_spark.operators.text import tokens

__all__ = ["word_counts", "train_bpe", "segment_word", "apply_bpe"]

_VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("tf", T.LongType()),
        T.StructField("syms", T.ArrayType(T.StringType())),
    ]
)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> (word, tf) — the only corpus-sized job in BPE
    training. Keyed agg with map-side combine."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def _merge_pass(a: str, b: str):
    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                merged, i = [], 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            yield pd.DataFrame({"tf": pdf["tf"], "syms": out})

    return apply


def train_bpe(
    docs: DataFrame, text_col: str = "text", n_merges: int = 10
) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list ``[(a, b), ...]``. Deterministic: ties on pair frequency
    break lexicographically, so two runs (and a single-process reference
    implementation) agree exactly. Training is an action by design
    (like ``train_ivf`` — computed once, then broadcast/applied).

    Lineage discipline: each iteration's vocab state is a LAZY
    ``localCheckpoint`` materialized by a FULL count (one job/iteration,
    plan truncated to a LogicalRDD — the dedup/graph iterative-loop rule).
    A persist-chain is NOT equivalent here: once the parent is unpersisted
    its InMemoryRelation dissolves and the child's analyzed plan re-expands
    the whole mapInPandas chain — at ~20 merges the nested-AQE explain
    string alone OOMed an 8 GiB driver. Checkpoint blocks normally outlive
    ``DataFrame.unpersist``, so each superseded state's RDD blocks are
    released explicitly by id (scoped diff of the session's persistent-RDD
    set) — ``train_bpe`` leaves the session cache exactly as it found it.

    The scoped release rides a py4j-private surface
    (``sc._jsc.getPersistentRDDs``); a capability probe degrades to the
    documented fallback — same lazy-checkpoint lineage truncation, no
    scoped release — if a Spark upgrade removes it. The fallback leaks
    checkpoint blocks for the session's lifetime, but each is vocab-sized
    (sublinear in corpus), so training stays correct and bounded.
    """
    sc = docs.sparkSession.sparkContext

    try:  # capability probe: py4j private surface, may vanish across versions
        sc._jsc.getPersistentRDDs()
        _scoped = True
    except Exception:  # pragma: no cover - exercised only on future Sparks
        _scoped = False

    def _persisted_ids() -> set:
        if not _scoped:
            return set()
        return set(sc._jsc.getPersistentRDDs().keySet().toArray())

    def _release(ids: set) -> None:
        if not _scoped:
            return
        live = sc._jsc.getPersistentRDDs()
        for rid in ids:
            rdd = live.get(rid)
            if rdd is not None:
                rdd.unpersist(True)

    before = _persisted_ids()
    vocab = (
        word_counts(docs, text_col)
        .select(
            "tf",
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.substring(F.col("w"), i, F.lit(1)),
            ).alias("syms"),
        )
        .localCheckpoint(eager=False)
    )
    vocab.count()  # FULL count: materializes the lazy checkpoint
    own = _persisted_ids() - before
    merges: List[Tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            idx = F.when(
                F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
            ).otherwise(F.array().cast("array<int>"))
            pairs = vocab.select(
                "tf",
                F.explode(
                    F.transform(
                        idx,
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("a"),
                            F.element_at(F.col("syms"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            top = (
                pairs.groupBy(
                    F.col("p.a").alias("a"), F.col("p.b").alias("b")
                )
                .agg(F.sum("tf").cast("long").alias("n"))
                .orderBy(F.col("n").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < 2:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            pre = _persisted_ids()
            new_vocab = vocab.mapInPandas(
                _merge_pass(a, b), schema=_VOCAB_SCHEMA
            ).localCheckpoint(eager=False)
            new_vocab.count()  # materialize child before releasing parent
            new_ids = _persisted_ids() - pre
            _release(own)
            own = new_ids
            vocab = new_vocab
    finally:
        _release(own)
    return merges


def segment_word(word: str, merges: List[Tuple[str, str]]) -> List[str]:
    """Apply a learned merge list to one word (driver-side reference
    application; the distributed form would broadcast ``merges`` into the
    same fold inside mapInPandas)."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


_SEG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("n_subwords", T.LongType()),
    ]
)


def apply_bpe(
    docs: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed application of a learned merge list: per document,
    whitespace words segmented by the merges, reporting word and subword
    counts — the token-accounting pass a training run does with its real
    tokenizer. The merge list is tiny and ships inside the Arrow task
    closure (the broadcast pattern); the pass is a single narrow
    mapInPandas over the corpus — one scan, zero shuffles."""
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nw, ns = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in (text or "").split(" ") if w]
                total = 0
                for w in words:
                    total += len(segment_word(w, merges))
                ids.append(doc_id)
                nw.append(len(words))
                ns.append(total)
            yield pd.DataFrame({"doc_id": ids, "n_words": nw, "n_subwords": ns})

    return src.mapInPandas(seg, schema=_SEG_SCHEMA)
