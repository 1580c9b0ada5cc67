"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query on sf0.001; `queries()` exposes one
callable per implemented operator from SURVEY.md §2 (implementations live in
`neumann_spark/`); `oracle_sql()` gives the DuckDB-equivalent SQL for every
SQL-expressible query (same column names, deterministic float handling — see
`neumann_spark/sqlutil.py`).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neumann_spark.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q5-shaped multi-join revenue rollup (SURVEY.md §2.3 —
    lifts the reference's one-join-per-query limit) on sf0.001."""
    from neumann_spark.operators.joins import join_multi_q5

    return join_multi_q5(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each SQL-expressible query."""
    return all_oracles()
