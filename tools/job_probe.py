"""Job-count probe: run one registered query and attribute every Spark job
to the repo call site that triggered it.

Wall time on this box swings ±30-50% run to run, but driver action / Spark
job counts are contention-insensitive — each job is a scheduling-floor
payment locally and a sequential barrier at 100 TB scale — so job counts
are the primary optimization metric for action-dominated queries
(guide §1/§5).

Usage:
    python tools/job_probe.py <query_name> [sf_dir]

Prints: total jobs, total traced driver actions, and a per-call-site table
(repo file:line -> actions, jobs attributed).
"""

from __future__ import annotations

import functools
import os
import sys
import traceback
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from neumann_spark.registry import all_queries
    from neumann_spark.session import get_spark

    queries = all_queries()
    spark = get_spark("job_probe")
    sc = spark.sparkContext

    def n_jobs() -> int:
        # DAGScheduler.nextJobId is the monotonically increasing job counter
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    site_actions: Counter[str] = Counter()
    site_jobs: Counter[str] = Counter()

    def repo_site() -> str:
        stack = traceback.extract_stack()
        # innermost repo frame that is not this file / the patch wrappers
        for fr in reversed(stack):
            fn = fr.filename
            if "/root/repo/" in fn and "job_probe" not in fn:
                rel = fn.split("/root/repo/")[-1]
                return f"{rel}:{fr.lineno}"
        return "<outside-repo>"

    def wrap(cls, meth: str) -> None:
        orig = getattr(cls, meth)

        @functools.wraps(orig)
        def patched(*a, **kw):
            before = n_jobs()
            out = orig(*a, **kw)
            after = n_jobs()
            site = repo_site() + f" [{meth}]"
            site_actions[site] += 1
            site_jobs[site] += after - before
            return out

        setattr(cls, meth, patched)

    from pyspark.sql.classic.dataframe import DataFrame as CDF
    from pyspark.sql.readwriter import DataFrameWriter

    for m in ("collect", "count", "head", "take", "localCheckpoint",
              "checkpoint", "toPandas", "first", "tail", "foreach",
              "foreachPartition"):
        if hasattr(CDF, m):
            wrap(CDF, m)
    for m in ("save", "parquet", "csv", "json", "orc", "saveAsTable", "text"):
        wrap(DataFrameWriter, m)

    base = n_jobs()
    df = queries[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    total = n_jobs() - base

    print(f"\nquery={name} sf_dir={sf_dir}")
    print(f"TOTAL spark jobs: {total}")
    print(f"traced driver actions: {sum(site_actions.values())}, "
          f"jobs attributed: {sum(site_jobs.values())}")
    width = max((len(s) for s in site_actions), default=10)
    for site, acts in sorted(site_actions.items(),
                             key=lambda kv: -site_jobs[kv[0]]):
        print(f"{site:<{width}}  actions={acts:>4}  jobs={site_jobs[site]:>4}")
    spark.stop()


if __name__ == "__main__":
    main()
