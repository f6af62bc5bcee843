#!/usr/bin/env python3
"""Diff two Bench artifacts (BENCH_LOCAL.json / BENCH_10X.json schema).

Usage: python3 tools/benchdiff.py <baseline.json> <candidate.json> \
           [threshold] [--allow-gone=q1,q2]

Prints per-query candidate/baseline time ratios (medians), sorted worst
first, plus total/median summary lines and any queries that failed or
appeared/disappeared. Exit code 1 if any shared query regressed by more
than `threshold` (default 1.5x), OR if a baseline query is MISSING from
the candidate — a silently dropped query is the exact disappearance the
gate exists to catch. Intentional removals must be named explicitly via
--allow-gone.

Spread-aware: a "regression" whose candidate median still lies inside
the baseline's [min,max] spread is flagged as variance, not a
regression — the r5 lesson that single-run deltas lie. (One-directional
on purpose: a symmetric or interval-overlap test is maskable by a wide
candidate spread that merely touches the baseline range.)

CPU-aware: when BOTH artifacts carry taskMetrics.<q>.cpuNs (the
load-invariant executor CPU time, recorded since r14), a wall-ratio
breach is judged on the CPU ratio instead — machine load inflates wall
clock near-uniformly across the suite (the r14 1.24x cluster) while
executor CPU stays put, so cpu_ratio <= threshold reclassifies the
breach as load variance and cpu_ratio > threshold confirms a real
regression regardless of the spread test. Wall-only artifacts keep the
spread-based verdict unchanged.

Suite-level load normalizer: executor CPU itself is NOT fully
load-invariant on an oversubscribed box (cache pressure, frequency
scaling, hyper-sibling contention inflate cpuNs suite-wide — the r15
driver run's noisyCount=62 cluster). The normalizer is the MEDIAN
cpu ratio across all shared queries: when it exceeds 1.1x, every
per-query cpu ratio is divided by it before the verdict, so a uniform
suite-wide cpu inflation reads as the load it is while a genuinely
regressed query still stands out against its peers. The raw and
normalized ratios are both printed so nothing is hidden.

WALL-ONLY warning (never gates): a wall breach whose cpu stayed flat
AND whose candidate median lies outside the baseline spread is printed
as 'WALL-ONLY breach' — lost parallelism, stage serialization, and
I/O waits inflate wall at constant cpuNs, and silently classifying
them as variance would hide a real non-CPU regression.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(base_path, cand_path, threshold=1.5, allow_gone=()):
    base, cand = load(base_path), load(cand_path)
    bq, cq = base["queries"], cand["queries"]
    bs, cs = base.get("spread", {}), cand.get("spread", {})
    bm, cm = base.get("taskMetrics", {}), cand.get("taskMetrics", {})

    def cpu_ratio(k):
        b = bm.get(k, {}).get("cpuNs", 0)
        c = cm.get(k, {}).get("cpuNs", 0)
        return (c / b) if b > 0 and c > 0 else None
    shared = sorted(set(bq) & set(cq))
    # suite-level load normalizer: median cpu ratio over every shared
    # query — a uniform suite-wide cpu inflation (oversubscribed box:
    # cache pressure, frequency scaling) is load, not regression.
    # Clamped below at 1.0: a FASTER suite must never inflate per-query
    # ratios, and only applied when the suite moved by > 10%.
    all_cr = sorted(r for r in (cpu_ratio(k) for k in shared)
                    if r is not None)
    raw_load = all_cr[len(all_cr) // 2] if all_cr else 1.0
    # a "load factor" at or beyond the gate threshold is not load — it is
    # a uniform suite-wide cpu regression (a shared fixture/codegen/
    # harness change slowing MOST queries would inflate the median and,
    # unbounded, let the normalizer absolve every per-query ratio). Do
    # not normalize in that regime; gate on the suite itself instead.
    suite_regressed = raw_load > threshold
    load_f = raw_load if (1.1 < raw_load <= threshold) else 1.0
    if suite_regressed:
        print(f"SUITE-WIDE CPU REGRESSION: median cpu ratio {raw_load:.2f}x "
              f"exceeds threshold {threshold}x over {len(all_cr)} queries — "
              f"refusing to treat it as load; gating")
    elif load_f > 1.0:
        print(f"suite load normalizer: median cpu ratio {load_f:.2f}x over "
              f"{len(all_cr)} queries — per-query cpu ratios divided by it")
    gone, new = sorted(set(bq) - set(cq)), sorted(set(cq) - set(bq))
    rows = []
    for k in shared:
        b, c = bq[k], cq[k]
        if c <= 0:
            # candidate failure always gates
            rows.append((float("inf"), k, b, c, "FAILED"))
            continue
        if b <= 0:
            # baseline had failed, candidate now passes: an improvement,
            # not a gate — a stale failed baseline must not wedge the
            # gate closed forever
            rows.append((0.0, k, b, c, "fixed (baseline had failed)"))
            continue
        ratio = c / b
        note = ""
        if ratio > threshold:
            cr = cpu_ratio(k)
            if cr is not None:
                # the load-invariant verdict: executor CPU moved (or
                # not) regardless of how loaded the box was during
                # either run — normalized by the suite-level load
                # factor, overriding the spread test in both directions
                ncr = cr / load_f
                if ncr > threshold:
                    note = f"REGRESSION (cpu {cr:.2f}x, norm {ncr:.2f}x)"
                else:
                    blo, bhi = bs.get(k, [b, b])
                    # cpu flat but wall moved beyond the baseline's own
                    # spread: a non-CPU regression (lost parallelism,
                    # I/O wait) would look exactly like this — warn,
                    # don't silently absorb it as variance
                    if not (blo <= c <= bhi):
                        note = (f"WALL-ONLY breach (cpu {cr:.2f}x flat, "
                                f"wall outside baseline spread)")
                    else:
                        note = (f"variance (cpu {cr:.2f}x — wall "
                                f"inflated by load)")
            else:
                blo, bhi = bs.get(k, [b, b])
                # variance only if the CANDIDATE MEDIAN lies inside the
                # baseline's observed spread — one-directional on
                # purpose: both interval overlap and the symmetric
                # median test are maskable by a wide candidate spread
                # that merely touches the baseline range
                variance = blo <= c <= bhi
                note = ("variance (candidate median within baseline"
                        " spread)" if variance else "REGRESSION")
        rows.append((ratio, k, b, c, note))
    rows.sort(reverse=True)
    width = max((len(k) for k in shared), default=10)
    for ratio, k, b, c, note in rows:
        r = f"{ratio:6.2f}x" if 0 < ratio != float("inf") else "   --  "
        print(f"{k:{width}s} {b:8.3f} -> {c:8.3f}  {r}  {note}")
    bt, ct = base.get("value", -1), cand.get("value", -1)
    print(f"\ntotal: {bt:.1f} -> {ct:.1f} s "
          f"({ct / bt:.2f}x)" if bt > 0 and ct > 0 else "\ntotal: n/a")
    finite = [r for r, *_ in rows if 0 < r != float("inf")]
    if finite:
        mid = sorted(finite)[len(finite) // 2]
        print(f"median per-query ratio: {mid:.2f}x over {len(finite)} queries")
    if gone:
        print("missing from candidate:", ", ".join(gone))
        allowed = [k for k in gone if k in allow_gone]
        if allowed:
            print("  allowed removals:", ", ".join(allowed))
    if new:
        print("new in candidate:", ", ".join(new))
    bad = [k for _, k, _, _, note in rows
           if note == "FAILED" or note.startswith("REGRESSION")]
    bad += [k for k in gone if k not in allow_gone]
    if suite_regressed:
        bad.append(f"<suite median cpu {raw_load:.2f}x>")
    if bad:
        print(f"\n{len(bad)} regression(s)/failure(s): {', '.join(bad)}")
        return 1
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    allow = ()
    for a in sys.argv[1:]:
        if a.startswith("--allow-gone="):
            allow = tuple(x for x in a.split("=", 1)[1].split(",") if x)
    if len(args) < 2:
        print(__doc__)
        sys.exit(2)
    thr = float(args[2]) if len(args) > 2 else 1.5
    sys.exit(main(args[0], args[1], thr, allow))
