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
