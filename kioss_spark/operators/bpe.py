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
    (like ``train_ivf`` — computed once, then broadcast/applied)."""
    # vocabulary-sized — the one materialization of corpus-derived data.
    # persist (not localCheckpoint): checkpoint RDDs outlive
    # DataFrame.unpersist and would leak session cache; persisted frames
    # release cleanly, and each iteration reads its cached parent so the
    # corpus-sized word_counts job runs exactly once
    from pyspark import StorageLevel

    vocab = word_counts(docs, text_col).select(
        "tf",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.substring(F.col("w"), i, F.lit(1)),
        ).alias("syms"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    merges: List[Tuple[str, str]] = []
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
        new_vocab = vocab.mapInPandas(_merge_pass(a, b), schema=_VOCAB_SCHEMA).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        new_vocab.count()  # materialize child before releasing parent
        vocab.unpersist(blocking=True)
        vocab = new_vocab
    vocab.unpersist(blocking=True)
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
