"""Dump .explain('formatted') for registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [name ...]
Writes plans/<outdir>/<name>_<tag>.txt where outdir comes from
$PLAN_DIR (default r08). Uses sf0.01 so operator-build jobs (sizing
collects, label propagation) stay cheap; the plan SHAPE is scale-
independent.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    outdir = os.path.join("plans", os.environ.get("PLAN_DIR", "r08"))
    os.makedirs(outdir, exist_ok=True)

    from segment_rtree_spark.plans.entry_queries import REGISTRY
    from segment_rtree_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names or REGISTRY.keys():
        fn, _ = REGISTRY[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # surface, keep going
            plan = f"ERROR building {name}: {type(e).__name__}: {e}"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
