"""Round-15 optimization pins (manifest memo hardening).

- ``_FILELIST`` is bounded by TOTAL retained file rows (driver heap at
  millions-of-files manifests), not just entry count; the entry just
  inserted always survives eviction (its consumer needs it regardless).
- Memo hits validate the seq against the caller's FRESH committed-dir
  listing: version dirs deleted by a FOREIGN process's vacuum (which
  never runs this session's ``_invalidate_manifest_memos``) stop
  answering from memory — time travel raises the not-committed error
  instead of serving a stale plan over deleted files.
"""

import pytest
from pyspark.sql import functions as F


def _mk(spark, n=600, batches=6):
    return spark.range(n).select(
        (F.col("id") % 64).alias("u"),
        F.col("id").alias("payload"),
        (F.col("id") % batches).alias("b"),
    )


def test_filelist_memo_row_bound(monkeypatch):
    """Eviction honours BOTH caps (entries and total rows) and never
    evicts the entry just inserted, even when it alone exceeds the row
    bound."""
    from collections import OrderedDict

    from kioss_spark.operators import skew

    monkeypatch.setattr(skew, "_FILELIST", OrderedDict())
    monkeypatch.setattr(skew, "_FILELIST_MAX", 128)
    monkeypatch.setattr(skew, "_FILELIST_MAX_ROWS", 10)

    def rows(n):
        return tuple({"file_path": f"f{i}"} for i in range(n))

    for seq in range(5):
        skew._filelist_put(("app", "dir", seq), rows(4))
    kept = list(skew._FILELIST)
    # 5 entries x 4 rows = 20 > 10: oldest evicted until <= 10 rows,
    # newest kept (LRU order), so exactly the last two entries survive
    assert kept == [("app", "dir", 3), ("app", "dir", 4)]
    assert sum(len(v) for v in skew._FILELIST.values()) == 8

    # a single oversized list is returned to its consumer either way —
    # it must survive as the sole entry rather than thrash to empty
    skew._filelist_put(("app", "dir", 99), rows(50))
    assert list(skew._FILELIST) == [("app", "dir", 99)]


def test_foreign_vacuum_invalidates_memo_hits(spark, tmp_path):
    """A vacuum run by ANOTHER process deletes version dirs this session
    has memoized.  The zero-I/O staleness guard (`seq in complete`, the
    fresh listing every caller just took) must refuse the memo hit and
    raise the normal not-committed error; the retained head stays
    readable and exact."""
    from kioss_spark.operators import skew
    from kioss_spark.operators.skew import (
        _hadoop_fs,
        manifest_sink,
        read_manifest,
        read_via_manifest,
    )

    data, man = str(tmp_path / "d"), str(tmp_path / "m")
    nb = skew._CHECKPOINT_INTERVAL + 1  # v0 ckpt, deltas, v{I} ckpt
    df = _mk(spark, n=50 * nb, batches=nb)
    sink = manifest_sink(data, man, ["u"])
    for b in range(nb):
        sink(df.where(F.col("b") == b).drop("b"), b)

    # populate the memos for an old seq through the public read path
    assert read_manifest(spark, man, snapshot=1).count() > 0
    app = spark.sparkContext.applicationId
    assert (app, man, 1) in skew._RESOLVED

    # foreign vacuum: delete every version below the head checkpoint
    # directly on the filesystem — no in-process invalidation runs
    P, fs = _hadoop_fs(spark, man)
    for s in range(skew._CHECKPOINT_INTERVAL):
        assert fs.delete(P(f"{man}/v{s}"), True)
    assert (app, man, 1) in skew._RESOLVED  # stale entry still cached

    with pytest.raises(ValueError, match="not committed"):
        read_manifest(spark, man, snapshot=1)

    # the retained head (a fresh checkpoint) still reads exactly
    got = read_via_manifest(spark, man)
    assert got.count() == 50 * nb
