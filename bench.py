"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action that forces full
evaluation without collecting results to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from stock_ops_spark.session import get_spark  # noqa: E402


def _env_snapshot() -> dict:
    """One-line machine-state record (r8 VERDICT #5): the r8 round spent
    a session adjudicating 1.5x flags that turned out to be box
    contention, because nothing recorded what else the machine was doing
    at bench time.  Taken BEFORE the bench's own JVM starts, so
    ``concurrent_jvms`` counts the OTHER Spark/Java work sharing the
    box — the single biggest pollution source measured (5x phantom
    regressions, STATUS r8)."""
    snap: dict = {}
    try:
        snap["load_avg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        mem = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                mem[k.strip()] = int(v.strip().split()[0])  # kB
        snap["mem_available_gb"] = round(
            mem.get("MemAvailable", 0) / 1048576, 1
        )
        snap["page_cache_gb"] = round(mem.get("Cached", 0) / 1048576, 1)
    except (OSError, ValueError):
        pass
    # calibrated single-core mark: makes box drift a NUMBER instead of
    # a forensic reconstruction — it both exposes a genuinely loaded box
    # and, r9's lesson, refutes a false "slow box" reading (idle ~65 ms
    # on the r9 machine; a polluted ad-hoc control had suggested 5x
    # that — see STATUS r9)
    t0 = time.perf_counter()
    s = 0
    for i in range(1_000_000):
        s += i * i
    snap["cpu_mark_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    try:
        n = 0
        for pid in os.listdir("/proc"):
            if pid.isdigit():
                try:
                    with open(f"/proc/{pid}/comm") as f:
                        if f.read().strip() == "java":
                            n += 1
                except OSError:
                    continue
        snap["concurrent_jvms"] = n
    except OSError:
        pass
    return snap


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    env = _env_snapshot()
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    # optional subset (adjudication runs): bench.py q88_max_drawdown ...
    # — same warmup/timing context, just fewer queries; the driver's
    # no-argument invocation is unchanged.  --exclude a,b,c drops named
    # queries (the sf1 baseline uses it for the three adjudicated
    # output-quadratic queries whose inline runtime is their output
    # size, not a plan property — see BENCH_SF1.json "excluded").
    args = sys.argv[1:]
    excluded: list[str] = []
    # --min-of N (r10, VERDICT #6): time each query N times and keep
    # the minimum — the adjudication protocol's defense against the
    # sub-second job-floor jitter that produced 1.3-1.7x phantom flags
    # across r8/r9.  The driver's no-argument run stays single-pass for
    # wall-clock, but the regression guard below re-times ONLY flagged
    # queries once more and drops flags that do not survive min-of-2,
    # so a driver record never reports single-run noise as a regression.
    min_of = 1
    if "--min-of" in args:
        i = args.index("--min-of")
        min_of = max(1, int(args[i + 1]))
        args = args[:i] + args[i + 2:]
    if "--exclude" in args:
        i = args.index("--exclude")
        excluded = [x for x in args[i + 1].split(",") if x]
        args = args[:i] + args[i + 2:]
        unknown = [x for x in excluded if x not in qs]
        if unknown:
            print(f"unknown excluded queries: {unknown}", file=sys.stderr)
            sys.exit(2)
        qs = {k: v for k, v in qs.items() if k not in excluded}
    if args:
        unknown = [a for a in args if a not in qs]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            sys.exit(2)
        qs = {k: qs[k] for k in args}
    # untimed warmup: pay JVM startup, parquet footer reads and first-use
    # codegen once so per-query timings measure steady-state execution.
    # Full count (not limit(1)) so every stage's generated code compiles.
    for name in sorted(qs):
        try:
            qs[name](spark, sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            print(f"# warmup {name} failed: {ex}", file=sys.stderr)

    def _time_query(name: str) -> float:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        return dt

    timings: dict[str, float] = {}
    for name in sorted(qs):
        best = min(_time_query(name) for _ in range(min_of))
        timings[name] = round(best, 3)

    # min-of-2 confirmation of regression flags (advisory path): a
    # flagged query gets exactly one more timed run; the min replaces
    # its recorded timing, so only flags that SURVIVE min-of-2 reach
    # the emitted record and the stderr report.
    if min_of == 1:
        try:
            flagged = _find_slow(timings, sf)
        except Exception:  # noqa: BLE001 — advisory
            flagged = None
        if flagged:
            label, slow = flagged
            for q in sorted(slow):
                print(f"# drift re-check (min-of-2) vs {label}: {q}",
                      file=sys.stderr)
                try:
                    timings[q] = round(min(timings[q], _time_query(q)), 3)
                except Exception as ex:  # noqa: BLE001
                    print(f"# re-check {q} failed: {ex}", file=sys.stderr)

    total = sum(timings.values())
    doc = {
        "metric": "sum_query_latency",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "env": env,
    }
    if min_of > 1:
        doc["min_of"] = min_of
    if excluded:
        doc["excluded"] = sorted(excluded)
    print(json.dumps(doc))
    if env.get("concurrent_jvms", 0) > 0 or env.get("load_avg_1m", 0) > 4:
        print(
            f"# BENCH POLLUTION RISK: {env} — treat regressions below as"
            " suspect (drift protocol: a flagged query with zero git diff"
            " gets one clean dedicated re-run before it counts)",
            file=sys.stderr,
        )
    _regression_report(timings, sf)


def _regression_report(timings: dict[str, float], sf: float) -> None:
    """Inline regression guard: compare this run against the newest
    BENCH_r*.json driver record AT THE SAME SF and flag >1.5x slowdowns
    on stderr — the drift surfaces in the same run that produced it, not
    one VERDICT later.  Advisory only: stdout stays one JSON line and
    the exit code is untouched (the driver treats nonzero as a failed
    bench).

    Drift protocol (r8 adjudication, codified per VERDICT r8 #5): a
    flagged query with ZERO git diff since the baseline record gets ONE
    clean dedicated re-run (`python bench.py <query>` on an idle box —
    check the emitted `env` snapshot) before it counts as a regression;
    sub-second queries sit at the local job floor where round-to-round
    variance alone produces 1.5-2x phantom flags (r8 adjudicated five
    such flags back to their round-5 levels this way)."""
    try:
        _regression_report_inner(timings, sf)
    except Exception as ex:  # noqa: BLE001 — advisory path must never alter rc
        print(f"# regression guard skipped (record parse error: {ex})", file=sys.stderr)


def _find_slow(
    timings: dict[str, float], sf: float
) -> tuple[str, dict] | None:
    """(baseline label, {query: (base, t)}) of >1.5x slowdowns vs the
    same-SF baseline record, or None — the shared detector behind both
    the stderr report and main()'s min-of-2 drift re-check."""
    found: list = []

    def probe(t, b, label):
        s = _slow_set(t, b)
        if s is not None:
            found.append((label, s))

    _walk_baselines(timings, sf, probe)
    if not found:
        return None
    label, s = found[0]
    return (label, s) if s else None


def _regression_report_inner(timings: dict[str, float], sf: float) -> None:
    def probe(t, b, label):
        _flag_slow(t, b, label)

    _walk_baselines(timings, sf, probe)


def _walk_baselines(timings: dict[str, float], sf: float, probe) -> None:
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    # The committed sf1.0 baseline (BENCH_SF1.json, raw bench shape)
    # extends the guard past the driver's sf0.1 point, where most of the
    # registry sits at the ~0.2 s local job floor and a plan regression
    # hides under noise (VERDICT r6 #2).  Checked first when the sf
    # matches; the driver BENCH_r*.json records remain the sf0.1 gate.
    sf1 = os.path.join(here, "BENCH_SF1.json")
    if os.path.exists(sf1):
        try:
            with open(sf1) as f:
                doc = json.load(f)
            if float(doc.get("sf", -2)) == sf and isinstance(
                doc.get("queries"), dict
            ):
                probe(timings, doc["queries"], os.path.basename(sf1))
                return
        except (OSError, json.JSONDecodeError, ValueError):
            pass
    records = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    for path in reversed(records):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if doc.get("rc") not in (0, None) or float(doc.get("sf", -2)) != sf:
            continue
        base = {}
        parsed = doc.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            base = parsed["queries"]
        elif isinstance(doc.get("tail"), str):
            base = {
                m.group(1): float(m.group(2))
                for m in re.finditer(r'"(q\d+_\w+)": ([0-9.]+)', doc["tail"])
            }
        if not base:
            continue
        probe(timings, base, os.path.basename(path))
        return


def _slow_set(
    timings: dict[str, float], base: dict[str, float]
) -> dict:
    return {
        q: (base[q], t)
        for q, t in timings.items()
        if q in base and t > 1.5 * max(base[q], 0.1)  # sub-100ms = jitter
    }


def _flag_slow(
    timings: dict[str, float], base: dict[str, float], label: str
) -> None:
    slow = _slow_set(timings, base)
    if slow:
        for q, (b, t) in sorted(slow.items(), key=lambda kv: -kv[1][1]):
            print(
                f"# REGRESSION vs {label}: "
                f"{q} {b:.2f}s -> {t:.2f}s ({t / max(b, 0.1):.1f}x)",
                file=sys.stderr,
            )
    else:
        print(
            f"# regression guard: no query >1.5x vs {label}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
