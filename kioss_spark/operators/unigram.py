"""Unigram-LM tokenizer (SentencePiece-style) — training + Viterbi segmentation.

Kudo 2018 ("Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates") / SentencePiece: a fixed piece
vocabulary with log-probability scores; a word's segmentation is the
Viterbi path maximizing the sum of piece scores.  This is the OTHER
production tokenizer family next to BPE (T5 / Llama / XLM-R pipelines),
and the corpus-accounting analog of the reference's per-element
transformation pass (reference: kioss _util/_exec map pipeline — the
reference has no tokenizer; this belongs to the large-scale
training-data-pipeline surface the brief requires beyond it).

TRAINING here is the hard-EM (Viterbi-EM) variant: seed piece counts from
tf-weighted substring frequencies, then iterate [segment every word under
the current scores -> re-estimate scores from piece usage -> prune to the
vocab budget].  The 100 TB-relevant property mirrors ``train_bpe``: ONE
corpus scan (word counts, keyed agg with map-side combine), then every EM
iteration runs driver-side on the BOUNDED top-``max_words`` word-count
table (Zipf: the top of the vocabulary carries ~all token mass) — the
corpus is never touched again.  Training is an action by design (the
train_ivf / train_bpe pattern: computed once offline, served as plan
literals).

SERVING is exact integer column algebra shared verbatim by Spark and the
DuckDB oracle.  Scores are integers (log-prob * 1e3) and the DP state is
PACKED into one BIGINT:  p = total_score_e3 * 1024 + (1023 - n_pieces),
so integer ``greatest`` is the lexicographic (max score, then fewest
pieces) tie-break and the recurrence is pure ``+``/``greatest`` — no
floats, no libm, hash-identical across engines.  Piece lookup appends one
extra slot to the score array and redirects position-0 misses there
(single-char miss -> the UNK penalty, multi-char miss -> a -2^58 step
sentinel that always loses), because ``element_at(arr, NULL)`` inside
``coalesce`` constant-folds to NULL on Spark 4 — the whole expression is
null-free by construction.  Spark evaluates the recurrence as ONE
``aggregate()`` fold over word positions (any word length); the oracle
unrolls it to ``lmax`` nested subquery layers (bounded word length), and
both sides route words longer than ``lmax`` through the same
char-per-piece UNK fallback so the engines agree on every input.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kioss_spark.operators.bpe import word_counts

__all__ = [
    "train_unigram",
    "viterbi_segment",
    "unigram_packed_expr",
    "spark_extract_k",
    "spark_extract_s",
    "duck_dp_subquery",
    "duck_extract_k",
    "duck_extract_s",
    "UNK_MARGIN_E3",
    "PACK",
]

#: pieces-per-word packing radix: p = score_e3 * PACK + (PACK - 1 - k).
#: Bounds k (pieces per word) to PACK-1; words longer than the serving
#: ``lmax`` never reach the packed path (char-fallback CASE), so the
#: bound holds by construction.
PACK = 1024

#: UNK chars score this far below the worst in-vocab piece (e3 units), so
#: an in-vocab segmentation always beats one that spells through UNK.
UNK_MARGIN_E3 = 5000

#: an invalid multi-char step must always lose to any valid path but
#: never underflow int64 when added to a running total
_STEP_SENTINEL = -(1 << 58)

#: the ``i < piece_len`` guard branch (no valid predecessor)
_SENTINEL = -(1 << 60)


def viterbi_segment(
    word: str,
    scores_e3: Dict[str, int],
    unk_e3: int,
    max_piece_len: int = 4,
) -> Tuple[int, int, List[str]]:
    """Reference (driver-side) Viterbi under the packed-integer semantics
    the distributed expressions implement — the parity oracle for tests
    and the E-step of ``train_unigram``.  Returns ``(n_pieces,
    total_score_e3, pieces)``; on score ties the shorter piece list wins
    (the packed encoding), and among equal-(score, count) paths the
    backpointer prefers the SHORTEST final piece — piece identity is only
    used for EM counts, the (k, s) outputs are tie-invariant."""
    n = len(word)
    best = [PACK - 1] + [_SENTINEL] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for length in range(1, min(max_piece_len, i) + 1):
            piece = word[i - length : i]
            v = scores_e3.get(piece)
            if v is None:
                if length > 1:
                    continue
                v = unk_e3
            cand = best[i - length] + v * PACK - 1
            if cand > best[i]:
                best[i] = cand
                back[i] = length
    pieces: List[str] = []
    i = n
    while i > 0:
        pieces.append(word[i - back[i] : i])
        i -= back[i]
    pieces.reverse()
    p = best[n]
    k = (PACK - 1) - (p % PACK)
    s = (p - (p % PACK)) // PACK
    return k, s, pieces


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    max_piece_len: int = 4,
    iters: int = 4,
    max_words: int = 100_000,
) -> Tuple[List[Tuple[str, int]], int]:
    """Learn a unigram-LM piece vocabulary from the corpus; returns
    ``(sorted [(piece, score_e3)], unk_e3)``.  Deterministic: pruning
    sorts by (usage desc, piece asc) and scores are ``round(1000*ln p)``
    on exact integer counts, so two runs agree bit-for-bit.

    One corpus-scale job (``word_counts``), then a BOUNDED collect of the
    top ``max_words`` (tf desc, word asc) — the train_bpe vocabulary
    pattern — and driver-side Viterbi-EM on that table.  Every single
    character observed in the kept words stays in the vocabulary (the
    SentencePiece character-coverage floor), so segmentation never needs
    UNK on training-distribution text."""
    rows = (
        word_counts(docs, text_col)
        .orderBy(F.col("tf").desc(), "w")
        .limit(max_words)
        .collect()
    )
    words = [(r["w"], int(r["tf"])) for r in rows]
    chars = sorted({ch for w, _ in words for ch in w})

    def _scores(counts: Dict[str, int]) -> Dict[str, int]:
        tot = sum(counts.values())
        return {
            p: round(1000 * math.log(c / tot))
            for p, c in counts.items()
            if c > 0
        }

    seed: Counter = Counter()
    for w, tf in words:
        for i in range(len(w)):
            for length in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + length]] += tf
    scores = _scores(dict(seed))
    unk = min(scores.values()) - UNK_MARGIN_E3 if scores else -UNK_MARGIN_E3

    for _ in range(iters):
        usage: Counter = Counter()
        for w, tf in words:
            _, _, pieces = viterbi_segment(w, scores, unk, max_piece_len)
            for p in pieces:
                usage[p] += tf
        for ch in chars:  # character-coverage floor
            usage[ch] = max(usage[ch], 1)
        multi = sorted(
            (p for p in usage if len(p) > 1), key=lambda p: (-usage[p], p)
        )
        keep = set(chars) | set(multi[: max(0, vocab_size - len(chars))])
        scores = _scores({p: usage[p] for p in keep})
        unk = min(scores.values()) - UNK_MARGIN_E3 if scores else -UNK_MARGIN_E3

    return sorted(scores.items()), unk


# ---------------------------------------------------------------------------
# serving codegen — Spark fold dialect
# ---------------------------------------------------------------------------


def _spark_idx(pc_sql: str, n1: int, sub: str) -> str:
    pos = f"array_position({pc_sql}, {sub})"
    return f"CAST(CASE WHEN {pos} = 0 THEN {n1} ELSE {pos} END AS INT)"


def unigram_packed_expr(
    vocab: Sequence[Tuple[str, int]],
    unk_e3: int,
    col: str = "w",
    max_piece_len: int = 4,
) -> str:
    """Spark SQL for the packed Viterbi total of ``col`` — one
    ``aggregate()`` fold over word positions (renders as ONE expr string:
    the plan-BUILD discipline).  Evaluate once per DISTINCT word (the
    ``_bpe_wordcounts_with_k`` seam), never per occurrence."""
    pieces = [p for p, _ in vocab]
    pc_sql = "array(" + ",".join("'%s'" % p.replace("'", "''") for p in pieces) + ")"
    s1 = [s * PACK - 1 for _, s in vocab] + [unk_e3 * PACK - 1]
    sk = [s * PACK - 1 for _, s in vocab] + [_STEP_SENTINEL]
    s1_sql = "array(" + ",".join(f"{v}L" for v in s1) + ")"
    sk_sql = "array(" + ",".join(f"{v}L" for v in sk) + ")"
    n1 = len(pieces) + 1
    terms = []
    for length in range(1, max_piece_len + 1):
        sub = f"substr({col}, i - {length - 1}, {length})"
        if length == 1:
            terms.append(
                f"element_at(acc, i) + element_at({s1_sql}, "
                f"{_spark_idx(pc_sql, n1, sub)})"
            )
        else:
            terms.append(
                f"CASE WHEN i >= {length} THEN element_at(acc, i - {length - 1})"
                f" + element_at({sk_sql}, {_spark_idx(pc_sql, n1, sub)})"
                f" ELSE {_SENTINEL}L END"
            )
    return (
        "aggregate("
        f"CASE WHEN length({col}) >= 1 THEN sequence(1, length({col})) "
        "ELSE CAST(array() AS array<int>) END, "
        f"array({PACK - 1}L), "
        f"(acc, i) -> array_append(acc, greatest({', '.join(terms)})), "
        f"acc -> element_at(acc, length({col}) + 1))"
    )


def spark_extract_k(col: str, p: str, lmax: int) -> str:
    """pieces count from the packed total, char-fallback past ``lmax``
    (matches the oracle's unroll bound, so the engines agree everywhere)."""
    return (
        f"CASE WHEN length({col}) <= {lmax} THEN {PACK - 1} - pmod({p}, {PACK}) "
        f"ELSE length({col}) END"
    )


def spark_extract_s(col: str, p: str, lmax: int, unk_e3: int) -> str:
    return (
        f"CASE WHEN length({col}) <= {lmax} "
        f"THEN ({p} - pmod({p}, {PACK})) DIV {PACK} "
        f"ELSE length({col}) * {unk_e3} END"
    )


# ---------------------------------------------------------------------------
# serving codegen — DuckDB unrolled dialect (the oracle)
# ---------------------------------------------------------------------------


def _duck_idx(n1: int, sub: str) -> str:
    # coalesce: duckdb 1.0 returns 0 for a list_position miss, newer
    # versions return NULL — normalize both to the sentinel redirect.
    pos = f"coalesce(list_position(pc, {sub}), 0)"
    return f"(CASE WHEN {pos} = 0 THEN {n1} ELSE {pos} END)"


def duck_dp_subquery(
    vocab: Sequence[Tuple[str, int]],
    unk_e3: int,
    lmax: int,
    source_sql: str,
    col: str = "w",
    max_piece_len: int = 4,
) -> str:
    """Nested-subquery unroll of the DP over ``source_sql`` (a relation
    producing ``col``): each level adds one ``b{i}`` column referencing
    the PREVIOUS LEVEL'S COLUMNS, yielding ``({col}, p)``.  NOT lateral
    column aliases: DuckDB implements those by textual substitution, so
    a recurrence with branching factor ``max_piece_len`` over ``lmax``
    levels expands to ~4^16 expression nodes and OOMs the binder.  A
    subquery layer per level keeps the tree linear."""
    pieces = [p for p, _ in vocab]
    pc_l = "[" + ",".join("'%s'" % p.replace("'", "''") for p in pieces) + "]"
    s1 = [s * PACK - 1 for _, s in vocab] + [unk_e3 * PACK - 1]
    sk = [s * PACK - 1 for _, s in vocab] + [_STEP_SENTINEL]
    s1_l = "[" + ",".join(f"CAST({v} AS BIGINT)" for v in s1) + "]"
    sk_l = "[" + ",".join(f"CAST({v} AS BIGINT)" for v in sk) + "]"
    n1 = len(pieces) + 1
    q = (
        f"(SELECT {col}, {pc_l} AS pc, {s1_l} AS s1, {sk_l} AS sk, "
        f"CAST({PACK - 1} AS BIGINT) AS b0 FROM {source_sql})"
    )
    for i in range(1, lmax + 1):
        terms = []
        for length in range(1, min(max_piece_len, i) + 1):
            sub = f"substr({col}, {i - length + 1}, {length})"
            arr = "s1" if length == 1 else "sk"
            terms.append(f"b{i - length} + {arr}[{_duck_idx(n1, sub)}]")
        expr = terms[0] if len(terms) == 1 else f"greatest({', '.join(terms)})"
        q = f"(SELECT *, {expr} AS b{i} FROM {q})"
    pcase = " ".join(f"WHEN {i} THEN b{i}" for i in range(0, lmax + 1))
    return f"(SELECT {col}, CASE length({col}) {pcase} END AS p FROM {q})"


def duck_extract_k(col: str, p: str, lmax: int) -> str:
    return (
        f"CASE WHEN length({col}) <= {lmax} "
        f"THEN {PACK - 1} - (({p} % {PACK}) + {PACK}) % {PACK} "
        f"ELSE length({col}) END"
    )


def duck_extract_s(col: str, p: str, lmax: int, unk_e3: int) -> str:
    return (
        f"CASE WHEN length({col}) <= {lmax} "
        f"THEN ({p} - ((({p} % {PACK}) + {PACK}) % {PACK})) // {PACK} "
        f"ELSE length({col}) * {unk_e3} END"
    )
