"""Per-job profile of one or more registered queries.

Runs each named query exactly like bench.py (build -> noop write) on a
get_spark-shaped session but with the UI enabled, then dumps every Spark
job's (duration, callsite, stages, tasks) from the status REST API so the
time sinks inside multi-job lifecycles (manifest commits, iterative graph
loops, index bootstraps) are attributable line-by-line.

Usage: python tools/profile_query.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kioss_spark.queries import load_all  # noqa: E402


def get_spark_ui(app_name: str = "kioss_profile"):
    import tempfile

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "kioss_spark_warehouse"),
        )
        .getOrCreate()
    )


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4049/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    registry = load_all()
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId
    # warm the JVM the way bench.py does so job 0 isn't codegen warmup
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    df.groupBy("k").count().write.mode("overwrite").format("noop").save()
    spark.range(100).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.mode("overwrite").format("noop").save()

    for name in names:
        q = registry[name]
        jobs_before = {j["jobId"] for j in rest(f"applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        out = q.fn(spark, sf_dir)
        t1 = time.perf_counter()
        out.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        jobs = [
            j
            for j in rest(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: total {t2-t0:.2f}s (build {t1-t0:.2f}s, "
              f"serve {t2-t1:.2f}s), {len(jobs)} jobs ===")
        total_job = 0.0
        for j in jobs:
            st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            en = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # sub-second resolution from the GMT strings' .mmm suffix
            ms_s = float(j["submissionTime"][19:23].lstrip(".") or 0) / 1000
            ms_e = float(j["completionTime"][19:23].lstrip(".") or 0) / 1000
            dur = (time.mktime(en) + ms_e) - (time.mktime(st) + ms_s)
            total_job += dur
            print(
                f"  job {j['jobId']:>4} {dur:7.3f}s  tasks={j['numTasks']:>4} "
                f"stages={len(j['stageIds'])}  {j['name'][:95]}"
            )
        print(f"  sum(job durations) = {total_job:.2f}s; "
              f"gap (driver/py4j) = {t2 - t0 - total_job:.2f}s")


if __name__ == "__main__":
    main()
