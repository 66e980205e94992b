"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship spatial query (synthetic image table PIP-
                 joined to a polygon layer) at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops); callables take (spark, sf_dir).
oracle_sql()   — DuckDB-runnable ANSI SQL equivalents for every
                 SQL-expressible query (same column names/types;
                 doubles are bit-exact by construction — see
                 segment_rtree_spark/plans/entry_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from segment_rtree_spark.plans.entry_queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["images_pip"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    out = {}
    for name, (_, oracle) in REGISTRY.items():
        if oracle is not None:
            out[name] = oracle()
    return out
