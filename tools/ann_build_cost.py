"""Fit the graph-ANN build-cost scaling law — VERDICT r10 item 3.

Collects every measured (N, build_sec) point from ANN_RECALL.json
`scale_runs` (recorded by tools/ann_scale_recall.py on FRESH builds;
reload runs carry build_sec null and are skipped), fits the wall-clock
exponent by least squares on log-log, and publishes a `build_cost`
block — the capacity-planning number a 100 TB deployment needs next to
the rebuild trigger (docs/DESIGN.md): the NN-descent build is
O(N·(2M)²) candidate PAIRS per round by design, so the fitted
wall-clock exponent should sit near 1 (pairs linear in N at fixed M);
materially super-linear means a seeding/shuffle stage is quadratic and
needs fixing.

Usage: python tools/ann_build_cost.py
Prints the block and merges it into ANN_RECALL.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "ANN_RECALL.json")
    with open(path) as f:
        doc = json.load(f)

    pts = sorted(
        {(int(r["n_vectors"]), float(r["build_sec"]))
         for r in doc.get("scale_runs", [])
         if r.get("build_sec") is not None
         # the law is for the SHIPPED build path: auto warm-K policy
         # only (override contrast runs measure a different pipeline —
         # mixing the r10 20K/warm_k=45 override point in would corrupt
         # the fit with a 2.8x-slower historical build)
         and r.get("warm_k_policy") == "auto"},
    )
    if len(pts) < 3:
        print(f"only {len(pts)} measured build points: {pts} — need >= 3",
              file=sys.stderr)
        sys.exit(1)

    ns = np.array([n for n, _ in pts], dtype=float)
    secs = np.array([s for _, s in pts], dtype=float)
    slope, intercept = np.polyfit(np.log(ns), np.log(secs), 1)
    fit = np.exp(intercept) * ns ** slope
    resid = float(np.max(np.abs(np.log(fit) - np.log(secs))))
    # adjacent-segment local exponents: a single global fit hides a
    # regime change (a clean sub-linear law through one range, a knee
    # past it) — publish both so the capacity plan uses the right slope
    # for its N
    local = [
        {"from_n": int(ns[i]), "to_n": int(ns[i + 1]),
         "exponent": round(float(
             np.log(secs[i + 1] / secs[i]) / np.log(ns[i + 1] / ns[i])), 2)}
        for i in range(len(ns) - 1)
    ]

    churn = [
        {"n_vectors": r["n_vectors"], "wall_sec": r.get("churn_wall_s")}
        for r in doc.get("churn_scale_runs", []) if r.get("churn_wall_s")
    ]
    block = {
        "points": [{"n_vectors": n, "build_sec": s} for n, s in pts],
        "wall_clock_exponent": round(float(slope), 3),
        "log_fit_max_residual": round(resid, 3),
        "local_exponents": local,
        "design_bound": "O(N·(2M)^2) candidate pairs per NN-descent "
                        "round (M frozen at 32) — pairs linear in N",
        "churn_cycle_wall": churn,
        "note": "fresh local[32] builds through the registered "
                "knn_graph_index path at r13 HEAD (auto warm-K, "
                "grouped pair-distance kernel with the <=512-member "
                "group shard, two-level super-centroid warm/seed "
                "assignment — O(N*sqrt(K)) candidate rows); reload "
                "runs excluded",
    }
    doc["build_cost"] = block
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(block, indent=2))


if __name__ == "__main__":
    main()
