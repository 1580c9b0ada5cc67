"""Local replica of the driver's DuckDB-oracle differential check.

Runs every registered query on Spark and its oracle SQL on DuckDB against the
same parquet fixtures, then compares row count, sorted column names, and an
order-insensitive canonical value hash. Exact equality here implies any
reasonable driver-side hash also matches.

Usage:
    python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime

import duckdb
import pandas as pd


def _canon_value(v) -> str:
    """Canonical string for one cell, tolerant of numpy/pyarrow/duckdb types."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 5.0 and 5 hash alike (double vs bigint drift)
        return repr(v)
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (datetime, pd.Timestamp)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        rows.append("|".join(_canon_value(v) for v in rec))
    rows.sort()
    return rows


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for row in canon_rows(df):
        h.update(row.encode())
        h.update(b"\n")
    return h.hexdigest()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# Output types whose canonical form drifts from Spark's BIGINT/DOUBLE:
# DuckDB widens a bare integer SUM to HUGEINT and keeps DECIMAL scales that
# Spark rounds away — this exact class caused red driver rows in three
# separate rounds, so it is now a hard audit failure.
FORBIDDEN_ORACLE_TYPES = (
    "HUGEINT", "DECIMAL", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
)


def audit_oracle_types(con, oracles: dict) -> dict[str, list[str]]:
    """DESCRIBE every oracle (planning only, no execution) and flag any
    output column with a forbidden type. Returns {query: [col:type, ...]}."""
    bad: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 — unplannable oracle = failure
            bad[name] = [f"DESCRIBE failed: {repr(e)[:200]}"]
            continue
        viols = [
            f"{r[0]}:{r[1]}"
            for r in rows
            if any(t in str(r[1]).upper() for t in FORBIDDEN_ORACLE_TYPES)
        ]
        if viols:
            bad[name] = viols
    return bad


def compare_one(name, fn, sql, spark, con, sf_dir):
    t0 = time.time()
    sdf = fn(spark, sf_dir).toPandas()
    t1 = time.time()
    if sql is None:
        return {
            "name": name, "status": "rows_only", "rows": len(sdf),
            "spark_s": round(t1 - t0, 2),
        }
    ddf = con.execute(sql).fetchdf()
    issues = []
    if len(sdf) != len(ddf):
        issues.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
    if sorted(sdf.columns) != sorted(ddf.columns):
        issues.append(f"cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
    elif value_hash(sdf) != value_hash(ddf):
        a, b = canon_rows(sdf), canon_rows(ddf)
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        extra_a = [x for x in a if x not in set(b)][:2]
        issues.append(f"hash mismatch; first diffs={diff or extra_a}")
    return {
        "name": name,
        "status": "ok" if not issues else "FAIL",
        "rows": len(sdf),
        "spark_s": round(t1 - t0, 2),
        "issues": issues,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    from neumann_spark.registry import all_oracles, all_queries
    from neumann_spark.session import get_spark

    queries, oracles = all_queries(), all_oracles()
    spark = get_spark("selfcheck")
    con = make_duck(sf_dir)
    failed = 0
    results: dict[str, dict] = {}

    # typing audit first: a forbidden oracle output type is a failure even
    # if today's values happen to hash-match
    audit_scope = {n: s for n, s in oracles.items() if not only or n in only}
    type_viols = audit_oracle_types(con, audit_scope)
    for name, viols in sorted(type_viols.items()):
        print(f"[T] {name:<34} forbidden oracle types: {'; '.join(viols)}",
              flush=True)
        results[name] = {"status": "TYPE_FAIL", "issues": viols}
        failed += 1

    for name, fn in queries.items():
        if (only and name not in only) or name in type_viols:
            continue
        try:
            res = compare_one(name, fn, oracles.get(name), spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "status": "ERROR", "issues": [repr(e)[:500]]}
        flag = {"ok": ".", "rows_only": "~", "FAIL": "F", "ERROR": "E"}[res["status"]]
        print(f"[{flag}] {res['name']:<34} rows={res.get('rows','?'):>7} "
              f"{res.get('spark_s','')}s {'; '.join(res.get('issues', []))}",
              flush=True)
        if res["status"] in ("FAIL", "ERROR"):
            failed += 1
        results[name] = {k: v for k, v in res.items() if k != "name"}

    out_path = os.environ.get("SELFCHECK_OUT")
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(results),
                    "n_failing": failed,
                    "oracle_type_audit": "clean" if not type_viols else type_viols,
                    "results": results,
                },
                fh,
                indent=1,
            )
    print(f"\n{'PASS' if failed == 0 else 'FAIL'}: {failed} failing of "
          f"{len(only) if only else len(queries)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
