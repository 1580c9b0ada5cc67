"""Determinism helpers for the DuckDB-oracle differential tests.

Floating-point SUM is order-dependent; Spark's partition-parallel sums and
DuckDB's sums would disagree in the last ULPs, which breaks value-hash
comparison. Two strategies, used consistently on BOTH sides:

1. `dsum` — exact accumulation: cast each double to DECIMAL(18,s) (exact for
   the fixture's 2-4 decimal money columns), sum decimals exactly, cast the
   exact total back to double. Bit-identical in Spark and DuckDB regardless
   of partitioning. Use for large sums (revenue over 600k rows).
2. `round to 6-8 dp` — for small-relative-error quantities (averages, unit
   vector dot products, PageRank mass): the FP disagreement is ~1e-13
   relative while the rounding grid is 1e-6..1e-8, so the rounded values
   match with overwhelming probability. Use where decimal casting is
   awkward (division chains, sqrt, trig).

These helpers exist for *differential testing determinism*, not semantics —
on a production cluster you'd just `F.sum(col)`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Deterministic SUM of a double column via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic AVG = exact-decimal SUM (as double) / COUNT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side mirror of `dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB-side mirror of `davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
