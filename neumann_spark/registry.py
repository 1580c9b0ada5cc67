"""Central registry of (query, oracle) pairs — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers:
  * a callable (spark, sf_dir) -> DataFrame   — the Spark-first implementation
  * optionally an ANSI-SQL string DuckDB can run on the same parquet views
    (order-insensitive value-hash comparison; column names must match).

Queries whose semantics aren't SQL-expressible (approximate ANN, sampled
algorithms) register without an oracle → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _import_all() -> None:
    """Import every query-bearing module (side effect: registration).

    Order = driver execution order, cheapest modules first: the driver's
    correctness budget should cover as many queries as possible before it
    reaches the iterative graph algorithms, which dominate wall-time at
    fixture scale (per-job overhead, not data volume)."""
    from neumann_spark.pipeline import curation, text_queries  # noqa: F401
    from neumann_spark.sources import formats  # noqa: F401
    from neumann_spark.functions import geo, vector  # noqa: F401
    from neumann_spark.streaming import windows as stream_windows  # noqa: F401
    from neumann_spark.operators import asof, dml, facade, joins, mutations, relational, windows  # noqa: F401
    from neumann_spark.pipeline import ann, dedup, multimodal  # noqa: F401
    from neumann_spark.unified import entities  # noqa: F401
    from neumann_spark.pipeline import fulltext  # noqa: F401
    from neumann_spark.graph import queries, traversal  # noqa: F401
    from neumann_spark.graph import algorithms  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _import_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _import_all()
    return dict(_ORACLES)
