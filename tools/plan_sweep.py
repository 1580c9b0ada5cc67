"""Plan audit across EVERY registered query: dump each query's formatted
physical plan and summarize the scale-relevant shape signals —

  * Exchange count (shuffles) and what partitioning each uses
  * join strategies (Broadcast/ShuffledHash/SortMerge/Cartesian/BNL)
  * Python-boundary nodes (BatchEvalPython / ArrowEvalPython / MapInPandas
    / MapInArrow) — row-at-a-time BatchEvalPython is the §4 anti-pattern
  * parquet scans whose PushedFilters is empty while the query filters
  * ReadSchema width per scan (column pruning evidence)

Writes one plan file per query under --out (default /tmp/plan_sweep) and a
single-line-per-query summary to stdout, sorted so the smelliest shapes
(cartesian, BatchEvalPython, most exchanges) lead.

Usage: python tools/plan_sweep.py [sf_dir] [--out DIR] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# match the numbered detail headers ("(12) Exchange") so each physical
# node counts exactly once (formatted mode also shows it in the tree)
PATTERNS = {
    "exchange": re.compile(r"^\(\d+\) Exchange", re.M),
    "bhj": re.compile(r"^\(\d+\) BroadcastHashJoin", re.M),
    "shj": re.compile(r"^\(\d+\) ShuffledHashJoin", re.M),
    "smj": re.compile(r"^\(\d+\) SortMergeJoin", re.M),
    "bnlj": re.compile(r"^\(\d+\) BroadcastNestedLoopJoin", re.M),
    "cartesian": re.compile(r"^\(\d+\) CartesianProduct", re.M),
    "batch_py": re.compile(r"^\(\d+\) BatchEvalPython", re.M),
    "arrow_py": re.compile(r"^\(\d+\) (ArrowEvalPython|MapInPandas|MapInArrow|"
                           r"FlatMapGroupsInPandas)", re.M),
    "scan": re.compile(r"^\(\d+\) Scan parquet", re.M),
}


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_dir = "/tmp/plan_sweep"
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from neumann_spark.registry import all_queries
    from neumann_spark.session import get_spark

    spark = get_spark("plan_sweep")
    spark.conf.set("spark.sql.ui.explainMode", "formatted")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    os.makedirs(out_dir, exist_ok=True)

    rows = []
    for name, fn in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            rows.append((name, {"error": repr(e)[:120]}, ""))
            continue
        with open(f"{out_dir}/{name}.txt", "w") as f:
            f.write(plan)
        sig = {k: len(p.findall(plan)) for k, p in PATTERNS.items()}
        # pushdown evidence: a scan with filters in the plan but an empty
        # PushedFilters list is worth eyeballing (may be legit: derived col)
        empty_pushed = len(re.findall(r"PushedFilters: \[\]", plan))
        filters = len(re.findall(r"\bFilter \(", plan))
        sig["scans_nopush"] = empty_pushed if filters else 0
        rows.append((name, sig, plan))

    def smell(sig: dict) -> tuple:
        return (
            sig.get("cartesian", 0) + sig.get("bnlj", 0),
            sig.get("batch_py", 0),
            sig.get("exchange", 0),
            sig.get("smj", 0),
        )

    rows.sort(key=lambda r: smell(r[1]), reverse=True)
    hdr = ("query", "exch", "bhj", "shj", "smj", "bnlj", "cart",
           "pyrow", "pyarrow", "scans", "nopush")
    print(("%-36s" + " %6s" * 10) % hdr)
    for name, sig, _ in rows:
        if "error" in sig:
            print(f"{name:<36} ERROR {sig['error']}")
            continue
        print(("%-36s" + " %6d" * 10) % (
            name, sig["exchange"], sig["bhj"], sig["shj"], sig["smj"],
            sig["bnlj"], sig["cartesian"], sig["batch_py"], sig["arrow_py"],
            sig["scan"], sig["scans_nopush"]))


if __name__ == "__main__":
    main()
