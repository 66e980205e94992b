"""Per-job wall-clock attribution for one bench query (round-8 probe).

Runs bench.py's query fn REPEAT times after the standard warmup, then
dumps every Spark job of the LAST rep from the UI REST API: job id,
duration, call site. Reveals which action inside a composed pipeline
(sizing collects, checkpoints, final count) owns the wall clock —
finer than bench_extra's eager-stage marks and without perturbing the
lazy plan.

The session mirrors segment_rtree_spark.session.get_spark exactly,
plus the UI endpoint the profiler reads (bench runs with the UI off;
the listener's overhead is negligible next to the queries measured).

Usage: python tools/profile_jobs.py <query> [repeat]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ui_session(cores: int):
    from pyspark.sql import SparkSession

    driver_mem = os.environ.get("SPARK_DRIVER_MEM", f"{max(8, cores // 2)}g")
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.executorEnv.NUMPY_MADVISE_HUGEPAGE", "0")
        .appName("profile_jobs")
        .config("spark.sql.shuffle.partitions", str(max(32, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m"
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", driver_mem)
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("PROFILE_MIN_PARTITION_SIZE", "1m"),
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.ui.retainedJobs", "4000")
        .getOrCreate()
    )


def main():
    name = sys.argv[1]
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = ui_session(cores)
    spark.sparkContext.setLogLevel("ERROR")

    import bench as B
    import bench_extra as BX

    queries, imgs = B.bench_queries(spark, sf_dir, {name})
    imgs.count()
    BX.warmup(spark, imgs, cores)
    fn = queries[name]

    sc = spark.sparkContext
    for i in range(repeat):
        sc.setJobGroup(f"rep{i}", "")  # empty desc -> call-site names show
        t0 = time.time()
        fn()
        print(f"rep {i}: {time.time() - t0:.3f}s", flush=True)
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    last = [j for j in jobs if j.get("jobGroup") == f"rep{repeat-1}"]
    last.sort(key=lambda j: j["jobId"])
    total = 0.0

    def ts(s):
        return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")

    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    sinfo = {s["stageId"]: s for s in stages}
    for j in last:
        dur = (ts(j["completionTime"]) - ts(j["submissionTime"])).total_seconds()
        total += dur
        desc = (j.get("description") or j["name"])[:110]
        print(
            f"job {j['jobId']:4d}  {dur:7.3f}s  "
            f"stages={len(j['stageIds']):2d}  {desc}"
        )
        for sid in sorted(j["stageIds"]):
            s = sinfo.get(sid)
            if not s:
                continue
            sdur = s.get("executorRunTime", 0) / 1000.0
            print(
                f"    stage {sid:4d}  run={sdur:8.3f}s(cpu-sum) "
                f"tasks={s.get('numCompleteTasks', 0):4d}  "
                f"{s['name'][:90]}"
            )
    print(f"sum of job durations: {total:.3f}s  (n={len(last)})")
    spark.stop()


if __name__ == "__main__":
    main()
