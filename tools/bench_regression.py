"""Per-query bench regression guard.

Compares a fresh bench JSON (file path or '-' for stdin) against a stored
baseline round's BENCH_r{N}.json and flags queries slower than
``--threshold`` (default 1.5x).  Also lists queries present only on one
side so renames/removals are visible.

Usage:
    python bench.py > /tmp/bench_now.json
    python tools/bench_regression.py /tmp/bench_now.json            # vs newest BENCH_r*.json
    python tools/bench_regression.py /tmp/bench_now.json BENCH_r01.json --threshold 1.5

Exit code 1 iff any regression exceeds the threshold — wire it into the
round loop so a slowdown fails loudly instead of surfacing one VERDICT
later.  Sub-100ms baselines are noise-dominated at local scale; they are
compared against max(baseline, 0.1s) to avoid flagging JVM jitter.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

_NOISE_FLOOR_S = 0.1


def _load(path: str) -> dict:
    if path == "-":
        return json.loads(sys.stdin.read())
    with open(path) as f:
        return json.load(f)


def _queries(doc: dict) -> dict:
    """Extract {query: seconds} from a bench JSON or a driver BENCH_r*.json
    record (which wraps bench stdout: parsed JSON, or a truncated 'tail'
    string when the line outgrew the driver's buffer)."""
    if isinstance(doc.get("queries"), dict):
        return doc["queries"]
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"]
    tail = doc.get("tail")
    if isinstance(tail, str):
        import re

        return {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"(q\d+_\w+)":\s*([0-9.]+)', tail)
        }
    return {}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("current", help="fresh bench JSON file, or - for stdin")
    ap.add_argument("baseline", nargs="?", help="baseline JSON (default: newest BENCH_r*.json)")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    base_path = args.baseline
    if base_path is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cands = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
        if not cands:
            print("no BENCH_r*.json baseline found", file=sys.stderr)
            return 2
        base_path = cands[-1]

    cur = _queries(_load(args.current))
    base = _queries(_load(base_path))

    regressions = []
    for q in sorted(set(cur) & set(base)):
        denom = max(base[q], _NOISE_FLOOR_S)
        ratio = cur[q] / denom
        if ratio > args.threshold:
            regressions.append((q, base[q], cur[q], ratio))

    added = sorted(set(cur) - set(base))
    removed = sorted(set(base) - set(cur))

    print(f"baseline: {base_path}  ({len(base)} queries)")
    print(f"current:  {args.current}  ({len(cur)} queries)")
    if added:
        print(f"new queries (no baseline): {', '.join(added)}")
    if removed:
        print(f"missing vs baseline: {', '.join(removed)}")
    if regressions:
        print(f"\nREGRESSIONS (> {args.threshold}x):")
        for q, b, c, r in regressions:
            print(f"  {q}: {b:.3f}s -> {c:.3f}s  ({r:.2f}x)")
        return 1
    print(f"\nno regressions > {args.threshold}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
