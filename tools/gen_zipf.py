"""Seeded Zipf-vocabulary corpus for max-score pruning scale rows.

The fixture documents table has a ~31-word near-UNIFORM vocabulary (and
tools/gen_synthetic.py deliberately preserves that), so MaxScore/WAND
pruning — whose whole premise is vocabulary skew (rare essential lists
bounding theta above common-term bound sums) — can never engage on it
beyond the single 'dup' term.  This generator emits a documents.parquet
with a Zipf(s=1.0) vocabulary of 400 words so the pruning regime is
measurable at two scales.

Usage: python tools/gen_zipf.py [out_dir] [n_docs] [vocab]
  e.g.  python tools/gen_zipf.py /tmp/sfzipf1 5000
        python tools/gen_zipf.py /tmp/sfzipf2 50000         # constant vocab
        python tools/gen_zipf.py /tmp/sfzipf2v 50000 1265   # Heaps-law
  (vocab ~ sqrt(docs) is the repo's vocab-scaled decade protocol, the
  sfsyn2v precedent: rare-tier df stays ~constant as docs grow, which
  is what makes pruned scored-posting counts sub-linear)

Schema matches /root/testdata/sf*/documents.parquet (doc_id, text,
lang, source, n_chars) so registered queries run on the directory
unchanged.  Seeded: same (out_dir-independent) content per n_docs.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfzipf1"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    rng = np.random.default_rng(20260816)
    v = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    ranks = np.arange(1, v + 1, dtype=np.float64)
    p = (1.0 / ranks) / np.sum(1.0 / ranks)
    vocab = np.array([f"w{i:03d}" for i in range(v)])
    texts = []
    for _ in range(n_docs):
        length = int(rng.integers(40, 200))
        texts.append(" ".join(vocab[rng.choice(v, size=length, p=p)]))
    langs = rng.choice(np.array(["en", "de", "fr"]), size=n_docs)
    sources = np.array([f"src{i % 20}" for i in range(n_docs)])
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    import os

    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"wrote {out}/documents.parquet ({n_docs} docs, vocab {v})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
