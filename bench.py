"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced to full materialization through the `noop` datasource
(no sink cost, no column-pruning shortcut a count() would allow).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kioss_spark.queries import load_all  # noqa: E402
from kioss_spark.session import get_spark  # noqa: E402

#: headline set — relational + facade + (as they land) LLM-data operators
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "asof_last_signup",
    "sessionize_events",
    "top3_customers_per_segment",
    "op_map_revenue",
    "op_flatten_tokens",
    "op_catch_replacement",
    # LLM-data headliners (kioss_spark.queries.llm / kioss_spark.operators)
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("kioss_spark_bench")
    registry = load_all()
    # warm the JVM + parquet footers so q1 doesn't pay session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float | None] = {}
    missing: list[str] = []
    for name in HEADLINE:
        q = registry.get(name)
        if q is None:
            # fail loudly: a missing headliner must not silently shrink the total
            timings[name] = None
            missing.append(name)
            continue
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(v for v in timings.values() if v is not None), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    if missing:
        out["missing"] = missing
    print(json.dumps(out))


if __name__ == "__main__":
    main()
