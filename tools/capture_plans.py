"""Capture .explain('formatted') output for named queries to files.

Usage: python tools/capture_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt with the formatted physical plan of
the query's DataFrame built at $SPARK_GRAFT_SF_DIR (default sf0.01 — plan
shape, not timing).  Run from the repo checkout whose code should be
captured (repo root = this file's parent's parent).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kioss_spark.queries import load_all  # noqa: E402
from kioss_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("kioss_capture_plans")
    registry = load_all()
    rc = 0
    for name in names:
        q = registry.get(name)
        if q is None:
            print(f"SKIP {name}: not registered")
            rc = 1
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"ERR {name}: {exc}")
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"WROTE {path} ({len(plan)} chars)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
