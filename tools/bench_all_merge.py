"""Merge N BENCH_ALL takes into the per-query noise floor.

BENCH_ALL.json is the retime guard's REFERENCE table (bench.py): what
matters is each query's steady-state floor, not any single run's
ambient. run_all gives each query one cold + one steady reading with
no retime defense, so a co-tenant burst can own a row (observed r16:
dedup_simhash_salted 75.3 s in one take vs 3.4 s in the other, under
1.99% interval steal). The fix mirrors the headline bench's min-of-N
methodology across WHOLE RUNS: per query, keep the MIN steady (and
that run's cold), and record every take's calibration block under
``calibration.merged_from`` so the provenance stays auditable.

    python tools/bench_all_merge.py out.json take1.json take2.json [...]
"""

from __future__ import annotations

import json
import sys


def main():
    out_path, *takes = sys.argv[1:]
    arts = [json.load(open(p)) for p in takes]
    base = arts[-1]  # newest take carries metric/sf/shape
    names = set()
    for a in arts:
        names |= set(a["queries"])
    queries = {}
    for n in sorted(names):
        rows = [(p, a["queries"][n]) for p, a in zip(takes, arts) if n in a["queries"]]
        src, row = min(rows, key=lambda pr: pr[1]["steady_s"])
        queries[n] = dict(row)
        queries[n]["take"] = src
    errors = {}
    for a in arts:  # an error only survives if NO take timed the query
        for n, e in a.get("errors", {}).items():
            if n not in names:
                errors[n] = e
    out = {
        "metric": base["metric"],
        "value": round(sum(r["steady_s"] for r in queries.values()), 4),
        "unit": base["unit"],
        "sf": base["sf"],
        "n_queries": len(queries),
        "errors": errors,
        "calibration": {
            **base["calibration"],
            "merged_from": {
                p: a["calibration"] for p, a in zip(takes, arts)
            },
            "merge_rule": "per-query min steady across takes",
        },
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {k: out[k] for k in ("metric", "value", "sf", "n_queries")}
        )
    )


if __name__ == "__main__":
    main()
