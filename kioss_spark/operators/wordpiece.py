"""WordPiece tokenizer (BERT-style) — likelihood-scored merge training +
greedy longest-match-first segmentation.

The THIRD production tokenizer family next to BPE (operators/bpe.py,
Sennrich 2016) and unigram-LM (operators/unigram.py, Kudo 2018): WordPiece
(Schuster & Nakajima 2012; Wu et al. 2016, GNMT; Devlin et al. 2018, BERT)
trains like BPE but scores candidate merges by the LIKELIHOOD RATIO
``count(ab) / (count(a) * count(b))`` instead of raw pair frequency, and
serves by greedy longest-match-first over the learned vocabulary with the
``##`` continuation convention (word-initial and word-internal pieces are
distinct vocab entries).

TRAINING mirrors ``train_unigram``'s bounded-collect pattern: ONE
corpus-scale job (word counts, keyed agg with map-side combine), then the
merge loop runs driver-side on the top-``max_words`` word table (Zipf: the
head carries ~all token mass) — the corpus is never touched again, and the
model ships as plan literals (the train_ivf / train_bpe / train_unigram
rule: training is an action, computed once, served as literals).  The
likelihood score is integerized as ``pair * 1e12 DIV (left * right)`` with
ties broken lexicographically, so two runs agree bit-for-bit.

SERVING is exact integer column algebra shared by Spark and the DuckDB
oracle.  Greedy longest-match is a LINEAR scan (unlike unigram's DP it
needs only the previous state), so the whole segmentation is one packed
state machine:  ``state = pos * 128 + k * 2 + fail`` — Spark folds it with
ONE ``aggregate()`` over ``lmax`` steps per DISTINCT word; the oracle
unrolls the same recurrence into nested subquery layers
(the duck_dp_subquery lesson: NOT lateral aliases).  Both engines route
words longer than ``lmax`` through the same char-per-piece fallback, and a
position with no vocabulary match makes the WHOLE word a single [UNK]
(k = 1, the BERT convention) on both sides.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kioss_spark.operators.bpe import word_counts

__all__ = [
    "train_wordpiece",
    "greedy_segment",
    "wordpiece_packed_expr",
    "spark_extract_k",
    "spark_extract_unk",
    "duck_wp_subquery",
    "duck_extract_k",
    "duck_extract_unk",
    "STATE0",
]

#: packed serving state: pos * 128 + k * 2 + fail  (pos is 1-based;
#: k < 64 pieces and pos <= lmax + 1 <= 64 hold because the packed path
#: only serves words of length <= lmax)
STATE0 = 1 * 128  # pos = 1, k = 0, fail = 0

#: integerized likelihood score scale: score = pair * 1e12 DIV (l * r)
_SCORE_SCALE = 10**12


def _symbols(word: str) -> List[str]:
    """BERT symbol seeding: first char bare, the rest ##-prefixed."""
    return [word[0]] + ["##" + c for c in word[1:]]


def train_wordpiece(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 24,
    max_piece_len: int = 4,
    max_words: int = 100_000,
) -> Tuple[List[str], List[str]]:
    """Learn a WordPiece vocabulary; returns ``(heads, conts)`` — sorted
    word-initial pieces and (##-stripped) continuation pieces.  Merges
    longer than ``max_piece_len`` raw chars are skipped so the serving
    CASE cascade stays bounded.  Deterministic: the integerized
    likelihood score ties break on the pair's lexicographic order."""
    rows = (
        word_counts(docs, text_col)
        .orderBy(F.col("tf").desc(), "w")
        .limit(max_words)
        .collect()
    )
    words: List[Tuple[List[str], int]] = [
        (_symbols(r["w"]), int(r["tf"])) for r in rows if r["w"]
    ]

    def _raw_len(sym: str) -> int:
        return len(sym) - 2 if sym.startswith("##") else len(sym)

    for _ in range(n_merges):
        pair_n: Counter = Counter()
        sym_n: Counter = Counter()
        for syms, tf in words:
            for s in syms:
                sym_n[s] += tf
            for a, b in zip(syms, syms[1:]):
                pair_n[(a, b)] += tf
        best, best_key = None, None
        for (a, b), p in pair_n.items():
            if p < 2:
                continue
            merged = a + b[2:]
            if _raw_len(merged) > max_piece_len:
                continue
            score = (p * _SCORE_SCALE) // (sym_n[a] * sym_n[b])
            # max score; ties break on the LEX-SMALLEST pair
            if (
                best_key is None
                or score > best_key
                or (score == best_key and (a, b) < best)
            ):
                best, best_key = (a, b), score
        if best is None:
            break
        a, b = best
        merged = a + b[2:]
        new_words = []
        for syms, tf in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, tf))
        words = new_words

    vocab = {s for syms, _ in words for s in syms}
    # character-coverage floor: every observed char in both positions
    for syms, _ in words:
        for s in syms:
            raw = s[2:] if s.startswith("##") else s
            for c in raw:
                vocab.add(c)
                vocab.add("##" + c)
    heads = sorted(s for s in vocab if not s.startswith("##"))
    conts = sorted(s[2:] for s in vocab if s.startswith("##"))
    return heads, conts


def greedy_segment(
    word: str,
    heads: Sequence[str],
    conts: Sequence[str],
    max_piece_len: int = 4,
) -> Tuple[int, int]:
    """Reference (driver-side) greedy longest-match under the packed
    semantics — the parity oracle for tests.  Returns ``(k, fail)``:
    ``fail = 1`` means no match at some position, in which case the whole
    word is one [UNK] and ``k == 1`` (the BERT convention)."""
    hs, cs = set(heads), set(conts)
    n, pos, k = len(word), 0, 0
    while pos < n:
        vocab = hs if pos == 0 else cs
        for length in range(min(max_piece_len, n - pos), 0, -1):
            if word[pos : pos + length] in vocab:
                pos += length
                k += 1
                break
        else:
            return 1, 1
    return k, 0


def _arr(pieces: Sequence[str]) -> str:
    return (
        "array(" + ",".join("'%s'" % p.replace("'", "''") for p in pieces) + ")"
    )


def wordpiece_packed_expr(
    heads: Sequence[str],
    conts: Sequence[str],
    col: str = "w",
    max_piece_len: int = 4,
    lmax: int = 16,
) -> str:
    """Spark SQL for the packed greedy state of ``col`` — one
    ``aggregate()`` fold of ``lmax`` steps (renders as ONE expr string:
    the plan-BUILD discipline).  Evaluate once per DISTINCT word (the
    shared tokenizer seam), never per occurrence."""
    h_sql, c_sql = _arr(heads), _arr(conts)
    n = f"length({col})"
    pos = "(acc DIV 128)"
    # longest-match CASE cascade, head/cont vocab chosen by position
    branches = []
    for length in range(max_piece_len, 0, -1):
        sub = f"substr({col}, {pos}, {length})"
        hit = (
            f"array_position(CASE WHEN {pos} = 1 THEN {h_sql} "
            f"ELSE {c_sql} END, {sub}) > 0"
        )
        guard = f"{pos} + {length - 1} <= {n} AND {hit}"
        branches.append(f"WHEN {guard} THEN acc + {length} * 128 + 2")
    step = (
        f"CASE WHEN acc % 2 = 1 OR {pos} > {n} THEN acc "
        + " ".join(branches)
        + " ELSE acc + 1 END"
    )
    return (
        f"aggregate(sequence(1, {lmax}), {STATE0}L, (acc, i) -> {step})"
    )


def spark_extract_k(col: str, p: str, lmax: int) -> str:
    """pieces count from the packed state; [UNK] words count 1; words
    longer than ``lmax`` char-fallback (matches the oracle's unroll
    bound, so the engines agree everywhere)."""
    return (
        f"CASE WHEN length({col}) > {lmax} THEN length({col}) "
        f"WHEN {p} % 2 = 1 THEN 1 "
        f"ELSE ({p} % 128) DIV 2 END"
    )


def spark_extract_unk(col: str, p: str, lmax: int) -> str:
    return (
        f"CASE WHEN length({col}) <= {lmax} AND {p} % 2 = 1 "
        f"THEN 1 ELSE 0 END"
    )


# ---------------------------------------------------------------------------
# serving codegen — DuckDB unrolled dialect (the oracle)
# ---------------------------------------------------------------------------


def duck_wp_subquery(
    heads: Sequence[str],
    conts: Sequence[str],
    lmax: int,
    source_sql: str,
    col: str = "w",
    max_piece_len: int = 4,
) -> str:
    """Nested-subquery unroll of the greedy scan over ``source_sql`` (a
    relation producing ``col``): level i computes state ``s{i}`` from
    ``s{i-1}`` only (a linear chain — same reason as
    unigram.duck_dp_subquery: lateral aliases expand in the binder),
    yielding ``({col}, p)``."""
    h_l = "[" + ",".join("'%s'" % p.replace("'", "''") for p in heads) + "]"
    c_l = "[" + ",".join("'%s'" % p.replace("'", "''") for p in conts) + "]"
    n = f"length({col})"
    q = (
        f"(SELECT {col}, {h_l} AS hv, {c_l} AS cv, "
        f"CAST({STATE0} AS BIGINT) AS s0 FROM {source_sql})"
    )
    for i in range(1, lmax + 1):
        pos = f"(s{i - 1} // 128)"
        branches = []
        for length in range(max_piece_len, 0, -1):
            sub = f"substr({col}, CAST({pos} AS INTEGER), {length})"
            hit = (
                f"coalesce(list_position("
                f"CASE WHEN {pos} = 1 THEN hv ELSE cv END, {sub}), 0) > 0"
            )
            guard = f"{pos} + {length - 1} <= {n} AND {hit}"
            branches.append(
                f"WHEN {guard} THEN s{i - 1} + {length} * 128 + 2"
            )
        step = (
            f"CASE WHEN s{i - 1} % 2 = 1 OR {pos} > {n} THEN s{i - 1} "
            + " ".join(branches)
            + f" ELSE s{i - 1} + 1 END"
        )
        q = f"(SELECT *, {step} AS s{i} FROM {q})"
    return f"(SELECT {col}, s{lmax} AS p FROM {q})"


def duck_extract_k(col: str, p: str, lmax: int) -> str:
    return (
        f"CASE WHEN length({col}) > {lmax} THEN length({col}) "
        f"WHEN {p} % 2 = 1 THEN 1 "
        f"ELSE ({p} % 128) // 2 END"
    )


def duck_extract_unk(col: str, p: str, lmax: int) -> str:
    return (
        f"CASE WHEN length({col}) <= {lmax} AND {p} % 2 = 1 "
        f"THEN 1 ELSE 0 END"
    )
