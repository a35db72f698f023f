"""Semantic teeth for quality_linear_probe: the committed weight literals
must actually predict the fixture labels above chance.  The driver gate
hash-compares Spark vs DuckDB running the SAME weights, so zeroed or
corrupted literals would still pass it — this test is the independent
check (numpy reproduction of the exact integer arithmetic)."""

import numpy as np
import pandas as pd

from kioss_spark.queries.llm import _PROBE_B_E6, _PROBE_W_E3


def _score(sf_dir: str):
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = np.round(x * 1000).astype(np.int64)
    score = q @ np.array(_PROBE_W_E3, dtype=np.int64) + _PROBE_B_E6
    truth = df["label"].to_numpy() >= 5
    return score, truth


def test_probe_weights_match_embedding_dim():
    df = pd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    assert len(df["embedding"].iloc[0]) == len(_PROBE_W_E3) == 64


def test_probe_accuracy_above_chance_on_train_set():
    # trained on sf0.01 (label >= 5 target); measured train accuracy 64.0%
    # vs a 50.8% majority class.  A zeroed weight vector scores everything
    # bias-negative (keep none -> 49.2%) and fails here.
    score, truth = _score("/root/testdata/sf0.01")
    acc = ((score > 0) == truth).mean()
    majority = max(truth.mean(), 1 - truth.mean())
    assert acc >= 0.60
    assert acc > majority + 0.05
