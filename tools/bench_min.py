#!/usr/bin/env python3
"""Merge N bench artifacts (BENCH_FULL/BENCH_LAST format) into one
per-query-MINIMUM record — the repo's cross-round comparison policy
(README "Ledger discipline"): single-run totals confound surface
growth, GC growth and environment drift; the min over >=3 quiet runs
is the defensible per-query cost.

Usage: bench_min.py run1.json run2.json [...] > merged.json
Evidence entries (sentinels, stage builds, counters, _hot reruns) are
taken from the run whose headline total is smallest, so the merged
record still carries one coherent sentinel story; query entries are
per-key minimums over all CLEAN runs (a contended input is refused).
"""
import json, sys


def is_evidence(k: str) -> bool:
    return (k.endswith("_files_read") or k.endswith("_rows_scanned")
            or k.endswith("_hot") or k.startswith("bench_sentinel")
            or k.startswith("bench_stage_"))


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        if d.get("contended"):
            sys.exit(f"refusing contended input {p} — the merged record "
                     "must be a clean-runs minimum")
        runs.append((p, d))
    base = min(runs, key=lambda r: r[1]["value"])[1]
    qs = {}
    for k, v in base["queries"].items():
        if is_evidence(k):
            qs[k] = v
    for _, d in runs:
        for k, v in d["queries"].items():
            if is_evidence(k) or v < 0:
                continue
            qs[k] = v if k not in qs else min(qs[k], v)
    total = round(sum(v for k, v in qs.items()
                      if not is_evidence(k) and v >= 0), 3)
    out = {"metric": "total", "value": total, "unit": "sec",
           "contended": False, "merged_runs": len(runs),
           "queries": qs, "errors": base.get("errors", {}),
           "sf": base.get("sf", "")}
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
