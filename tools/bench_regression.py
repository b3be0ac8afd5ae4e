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

Trend mode:
    python tools/bench_regression.py --trend                 # all BENCH_r*.json
    python tools/bench_regression.py --trend /tmp/now.json   # + a fresh run

Prints a per-query table across every stored round (records with no
usable query timings — e.g. a crashed round — are skipped) and flags
**cumulative creep**: queries whose latest/earliest ratio exceeds the
threshold even though no single round-over-round step did — the slow
drift a per-round 1.5x guard structurally misses (e.g. q49 0.19→0.29s
over two rounds).
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


def _trend(extra_path: str | None, threshold: float) -> int:
    """Per-query trend across every stored BENCH_r*.json (+ optionally a
    fresh run).  Flags cumulative latest/earliest creep > threshold."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    series: list[tuple[str, dict]] = []
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            qs = _queries(_load(path))
        except (OSError, json.JSONDecodeError, ValueError):
            qs = {}
        if qs:  # crashed rounds (rc!=0) carry no timings — skip, keep column out
            label = os.path.basename(path).replace("BENCH_", "").replace(".json", "")
            series.append((label, qs))
    if extra_path:
        series.append(("now", _queries(_load(extra_path))))
    if len(series) < 2:
        print("need at least two rounds with timings for a trend", file=sys.stderr)
        return 2

    all_qs = sorted({q for _, qs in series for q in qs})
    width = max(len(q) for q in all_qs)
    header = " ".join(f"{label:>7}" for label, _ in series)
    print(f"{'query':<{width}} {header}   first->last")
    creep = []
    for q in all_qs:
        cells = []
        vals = []
        for _label, qs in series:
            if q in qs:
                cells.append(f"{qs[q]:>7.2f}")
                vals.append(qs[q])
            else:
                cells.append(f"{'-':>7}")
        ratio = None
        if len(vals) >= 2:
            ratio = vals[-1] / max(vals[0], _NOISE_FLOOR_S)
        tailnote = f"{ratio:>6.2f}x" if ratio is not None else ""
        flag = ""
        if ratio is not None and ratio > threshold and vals[-1] >= _NOISE_FLOOR_S:
            flag = "  << CREEP"
            creep.append((q, vals[0], vals[-1], ratio))
        print(f"{q:<{width}} {' '.join(cells)}  {tailnote}{flag}")

    if creep:
        print(f"\nCUMULATIVE CREEP (> {threshold}x first->last):")
        for q, first, last, r in sorted(creep, key=lambda t: -t[3]):
            print(f"  {q}: {first:.3f}s -> {last:.3f}s  ({r:.2f}x)")
        return 1
    print(f"\nno cumulative creep > {threshold}x")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "current", nargs="?",
        help="fresh bench JSON file, or - for stdin (optional with --trend)",
    )
    ap.add_argument("baseline", nargs="?", help="baseline JSON (default: newest BENCH_r*.json)")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--trend", action="store_true",
        help="per-query table across all BENCH_r*.json; flags cumulative creep",
    )
    args = ap.parse_args()

    if args.trend:
        return _trend(args.current, args.threshold)
    if args.current is None:
        ap.error("current bench JSON required unless --trend")

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
