"""gapfill_locf: dense grid, zero-fill vs LOCF semantics, gap flags."""

from pyspark.sql import functions as F

from kioss_spark.operators.timeseries import gapfill_locf


def _per(spark):
    rows = [
        ("u1", 0, 2, 10),
        ("u1", 7200, 1, 30),   # gap at 3600
        ("u2", 3600, 5, 99),   # single observation -> no gaps
    ]
    return spark.createDataFrame(
        rows, "user_id string, bucket long, n_events long, sum_value_e2 long"
    )


def test_gapfill_dense_grid_and_locf(spark):
    out = gapfill_locf(
        _per(spark), keys=["user_id"], step=3600,
        zero_cols=["n_events"], locf_cols=["sum_value_e2"],
    )
    got = {(r["user_id"], r["bucket"]): r for r in out.collect()}
    assert set(got) == {("u1", 0), ("u1", 3600), ("u1", 7200), ("u2", 3600)}
    gap = got[("u1", 3600)]
    assert gap["n_events"] == 0 and gap["is_gap"] is True
    assert gap["sum_value_e2"] == 10  # carried forward from bucket 0
    assert got[("u1", 7200)]["sum_value_e2"] == 30 and not got[("u1", 7200)]["is_gap"]
    assert got[("u2", 3600)]["n_events"] == 5 and not got[("u2", 3600)]["is_gap"]


def test_gapfill_requires_a_fill_column(spark):
    try:
        gapfill_locf(_per(spark), keys=["user_id"])
    except ValueError as e:
        assert "zero_col" in str(e)
    else:
        raise AssertionError("expected ValueError")
