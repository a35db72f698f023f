"""Generate the synthetic 10x corpus behind SCALE_CURVE.md's extension
section: 50k documents / 20k embeddings with the same vocabulary, length
distribution, source/lang mix, and injected exact/near-dup rates as the
driver's sf0.1 fixture, at 10x the rows.

Deterministic (seeded numpy); writes documents.parquet + embeddings.parquet
to the target directory (default /tmp/sfsyn1 — scratch, never the repo).
These tables measure wall-time GROWTH one decade past the largest driver
fixture; they are not driver data and carry no oracle correctness claims.

Usage: python tools/gen_synthetic.py [out_dir] [n_docs] [n_vecs] [vocab_mult]
(defaults 50000 / 20000 / 1 -> sfsyn1; sfsyn2 = 500000 / 50000 / 1 keeps the
fixture's 31-word vocabulary — the SATURATED-shingle regime where pair
candidates grow quadratically in docs-per-shingle, a fixture artifact the
curve must call out; sfsyn2v = 500000 / 50000 / 32 scales the vocabulary
with the corpus (Heaps-law-ish, the regime real crawls live in) so the
pair-pipeline decade measures the DESIGN, not the artifact.)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REF = "/root/testdata/sf0.1/documents.parquet"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfsyn1"
    vocab = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT unnest(string_split(text,' ')) AS w FROM '{REF}' ORDER BY 1"
        ).fetchall()
    ]
    rng = np.random.default_rng(42)
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    vmult = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    if vmult > 1:
        # suffix variants multiply the vocabulary while keeping the word
        # shape/length distribution; drawn uniformly like the base words
        vocab = [f"{w}{k}" for w in vocab for k in range(vmult)]
    langs = ["en", "es", "de", "fr", "zh"]
    p_lang = [0.44, 0.15, 0.14, 0.13, 0.14]
    words = np.array(vocab)
    texts: list[str] = []
    for i in range(n):
        if i > 100 and rng.random() < 0.025:
            # near-dup of an earlier doc: perturb ~15% of words
            j = int(rng.integers(0, i))
            toks = [
                w if rng.random() > 0.15 else words[rng.integers(0, len(words))]
                for w in texts[j].split(" ")
            ]
            texts.append(" ".join(toks))
        elif i > 100 and rng.random() < 0.002:
            texts.append(texts[int(rng.integers(0, i))])  # exact dup
        else:
            length = int(rng.integers(10, 101))
            texts.append(" ".join(words[rng.integers(0, len(words), length)]))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(langs, n, p=p_lang),
            "source": [f"src{int(x)}" for x in rng.integers(0, 20, n)],
        }
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    os.makedirs(out, exist_ok=True)
    df.to_parquet(f"{out}/documents.parquet", index=False)

    m = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    emb = rng.standard_normal((m, 64)).astype(np.float32)
    for _ in range(m // 100):  # ~1% near-identical copies
        a, b = rng.integers(0, m, 2)
        emb[b] = emb[a] + rng.standard_normal(64).astype(np.float32) * 0.01
    pd.DataFrame(
        {
            "vec_id": np.arange(m, dtype=np.int64),
            "embedding": list(emb),
            "label": rng.integers(0, 10, m).astype("int32"),
        }
    ).to_parquet(f"{out}/embeddings.parquet", index=False)
    print(f"wrote {n} docs / {m} vectors to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
