"""Summarize an ab_interleave run: per-query pairwise wins and min-over-
pairs for the base vs head JSON-lines files.

    python tools/ab_report.py OUT_base.json OUT_head.json
"""
from __future__ import annotations

import json
import sys


def load(path: str) -> list[dict]:
    runs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                runs.append(json.loads(line))
    return runs


def main() -> None:
    base_runs, head_runs = load(sys.argv[1]), load(sys.argv[2])
    n = min(len(base_runs), len(head_runs))
    qs = sorted(base_runs[0]["queries"])
    print(f"{'query':38s} {'base(min)':>9s} {'head(min)':>9s} {'ratio':>6s} wins  pairs(base->head)")
    tot_b = tot_h = 0.0
    for q in qs:
        b = [r["queries"].get(q) for r in base_runs[:n]]
        h = [r["queries"].get(q) for r in head_runs[:n]]
        if any(v is None for v in b + h):
            continue
        wins = sum(1 for x, y in zip(b, h) if y < x)
        mb, mh = min(b), min(h)
        tot_b += mb
        tot_h += mh
        pairs = " ".join(f"{x:.2f}->{y:.2f}" for x, y in zip(b, h))
        print(f"{q:38s} {mb:9.3f} {mh:9.3f} {mh/max(mb,0.01):6.2f} {wins}/{n}   {pairs}")
    print(f"{'TOTAL(min-over-pairs)':38s} {tot_b:9.3f} {tot_h:9.3f} {tot_h/max(tot_b,0.01):6.2f}")
    for i, (rb, rh) in enumerate(zip(base_runs, head_runs)):
        eb, eh = rb.get("env", {}), rh.get("env", {})
        print(f"# pair {i+1}: base load={eb.get('load_avg_1m')} mark={eb.get('cpu_mark_ms')} | "
              f"head load={eh.get('load_avg_1m')} mark={eh.get('cpu_mark_ms')}")


if __name__ == "__main__":
    main()
