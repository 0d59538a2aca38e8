"""Combine an sf0.1 and an sf1 bench run into SCALE_BENCH data-plane
ratios.

Usage: python tools/sf1_report.py <bench_sf01.json> <bench_sf1.json> [out]

Each input is one bench.py JSON line. Output: a JSON object with per-query
wall times at both SFs and the sf1/sf0.1 ratio (data grows 10x, so ratio
~<=10 means at-worst-linear scaling; fixed-overhead-dominated queries sit
well below). A markdown table goes to stderr for SCALE.md.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    with open(a_path) as f:
        a = json.loads(f.read().strip().splitlines()[-1])
    with open(b_path) as f:
        b = json.loads(f.read().strip().splitlines()[-1])
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in qa:
        if name in qb and qa[name] > 0:
            rows.append((name, qa[name], qb[name],
                         round(qb[name] / qa[name], 2)))
    rows.sort(key=lambda r: -r[3])
    out = {
        "metric": "sf01_to_sf1_scaling",
        "sf_small": a.get("sf"), "sf_big": b.get("sf"),
        "total_small_sec": a["value"], "total_big_sec": b["value"],
        "total_ratio": round(b["value"] / a["value"], 2),
        "queries": {n: {"sf01_sec": x, "sf1_sec": y, "ratio": r}
                    for n, x, y, r in rows},
    }
    line = json.dumps(out)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)
    print("| query | sf0.1 s | sf1 s | ratio (10x data) |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for n, x, y, r in rows:
        print(f"| {n} | {x:.3f} | {y:.3f} | {r:.2f}x |", file=sys.stderr)


if __name__ == "__main__":
    main()
