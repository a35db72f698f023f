"""BPE merge training: exact agreement with a single-process reference
implementation (same count-desc/lex tiebreak), determinism, edge cases."""

from collections import Counter

from kioss_spark.operators.bpe import segment_word, train_bpe, word_counts


def _ref_bpe(word_tf: dict, n_merges: int):
    """Reference single-process BPE (Sennrich alg.) with the same tiebreak."""
    vocab = {tuple(w): tf for w, tf in word_tf.items()}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, tf in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += tf
        if not counts:
            break
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if top[1] < 2:
            break
        (a, b) = top[0]
        merges.append((a, b))
        new = {}
        for syms, tf in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + tf
        vocab = new
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider wider new new",
]


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = train_bpe(docs, n_merges=8)
    tf = Counter(w for line in CORPUS for w in line.split())
    want = _ref_bpe(dict(tf), 8)
    assert got == want, (got, want)


def test_train_bpe_deterministic(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    assert train_bpe(docs, n_merges=5) == train_bpe(docs, n_merges=5)


def test_segment_word_applies_merges_in_order(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    merges = train_bpe(docs, n_merges=8)
    seg = segment_word("newest", merges)
    assert "".join(seg) == "newest"
    assert len(seg) < len("newest")  # some merges applied


def test_word_counts_single_scan_shape(spark):
    docs = spark.createDataFrame([("a a b",), ("b c",)], ["text"])
    got = {r["w"]: r["tf"] for r in word_counts(docs).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_apply_bpe_counts(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    merges = train_bpe(docs, n_merges=8)
    from kioss_spark.operators.bpe import apply_bpe

    got = {r["doc_id"]: (r["n_words"], r["n_subwords"]) for r in apply_bpe(docs, merges).collect()}
    for i, line in enumerate(CORPUS):
        words = line.split()
        want_sub = sum(len(segment_word(w, merges)) for w in words)
        assert got[i] == (len(words), want_sub)
    # merges compress: subwords strictly fewer than characters
    assert all(ns < sum(len(w) for w in CORPUS[i].split()) for i, (_, ns) in got.items())


# --- replace-chain equivalence fuzz ----------------------------------------
# bpe_segment_corpus (queries/llm.py) computes segmentation as a chain of
# plain left-to-right non-overlapping string replaces over bracket-encoded
# symbols (chr(30)+sym+chr(31)); its DuckDB oracle runs the SAME chain, so
# the driver gate proves Spark==DuckDB but not chain==greedy-BPE.  This fuzz
# is the independent check: the chain must equal segment_word exactly.

_ENC_L, _ENC_R = "\x1e", "\x1f"


def _enc(sym: str) -> str:
    return _ENC_L + sym + _ENC_R


def _chain_segment(word: str, merges) -> list:
    """The bracket-encoded replace chain, driver-side (str.replace is
    left-to-right non-overlapping — the same semantics as Spark's
    ``F.replace`` and DuckDB's ``replace``)."""
    s = "".join(_enc(c) for c in word)
    for a, b in merges:
        s = s.replace(_enc(a) + _enc(b), _enc(a + b))
    return [p[:-1] for p in s.split(_ENC_L)[1:]]


def test_chain_segment_fuzz_matches_segment_word():
    import random

    rng = random.Random(20260814)
    alphabet = "abcde"
    n_cases = 0
    for trial in range(400):
        # BPE-like merge list: each merge pairs symbols from the growing
        # pool (incl. self-pairs like (a,a) and products of prior merges —
        # the structure train_bpe actually emits)
        pool = list(alphabet)
        merges = []
        for _ in range(rng.randrange(0, 12)):
            a, b = rng.choice(pool), rng.choice(pool)
            if len(a) + len(b) > 8:
                continue
            merges.append((a, b))
            pool.append(a + b)
        for _ in range(12):
            word = "".join(
                rng.choice(alphabet) for _ in range(rng.randrange(0, 14))
            )
            got = _chain_segment(word, merges)
            want = segment_word(word, merges)
            assert got == want, (word, merges, got, want)
            assert "".join(got) == word
            n_cases += 1
    # adversarial: fully random merges NOT derived from the pool (prefix/
    # suffix-overlapping symbols, unreachable merges)
    for trial in range(400):
        merges = [
            (
                "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 4))),
                "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 4))),
            )
            for _ in range(rng.randrange(1, 8))
        ]
        for _ in range(8):
            word = "".join(
                rng.choice(alphabet) for _ in range(rng.randrange(0, 12))
            )
            got = _chain_segment(word, merges)
            want = segment_word(word, merges)
            assert got == want, (word, merges, got, want)
            n_cases += 1
    assert n_cases >= 5000


def test_chain_segment_self_pair_runs():
    # greedy left-to-right on runs: "aaa" under ("a","a") -> ["aa","a"]
    assert _chain_segment("aaa", [("a", "a")]) == segment_word("aaa", [("a", "a")])
    assert segment_word("aaa", [("a", "a")]) == ["aa", "a"]
    assert _chain_segment("aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]
