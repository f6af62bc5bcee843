#!/usr/bin/env python3
"""Diff two Bench artifacts (BENCH_LOCAL.json / BENCH_10X.json schema).

Usage: python3 tools/benchdiff.py <baseline.json> <candidate.json> [threshold]

Prints per-query candidate/baseline time ratios (medians), sorted worst
first, plus total/median summary lines and any queries that failed or
appeared/disappeared. Exit code 1 if any shared query regressed by more
than `threshold` (default 1.5x) — usable as a round-over-round gate.

Spread-aware: a "regression" whose candidate median still lies inside
the baseline's [min,max] spread (or vice versa) is flagged as variance,
not a regression — the r5 lesson that single-run deltas lie.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(base_path, cand_path, threshold=1.5):
    base, cand = load(base_path), load(cand_path)
    bq, cq = base["queries"], cand["queries"]
    bs, cs = base.get("spread", {}), cand.get("spread", {})
    shared = sorted(set(bq) & set(cq))
    gone, new = sorted(set(bq) - set(cq)), sorted(set(cq) - set(bq))
    rows = []
    for k in shared:
        b, c = bq[k], cq[k]
        if b <= 0 or c <= 0:
            rows.append((float("inf"), k, b, c, "FAILED"))
            continue
        ratio = c / b
        note = ""
        if ratio > threshold:
            blo, bhi = bs.get(k, [b, b])
            clo, chi = cs.get(k, [c, c])
            # overlap of spreads => the medians are not distinguishable
            note = ("variance (spreads overlap)"
                    if clo <= bhi and blo <= chi else "REGRESSION")
        rows.append((ratio, k, b, c, note))
    rows.sort(reverse=True)
    width = max((len(k) for k in shared), default=10)
    for ratio, k, b, c, note in rows:
        r = f"{ratio:6.2f}x" if ratio != float("inf") else "  FAIL "
        print(f"{k:{width}s} {b:8.3f} -> {c:8.3f}  {r}  {note}")
    bt, ct = base.get("value", -1), cand.get("value", -1)
    print(f"\ntotal: {bt:.1f} -> {ct:.1f} s "
          f"({ct / bt:.2f}x)" if bt > 0 and ct > 0 else "\ntotal: n/a")
    finite = [r for r, *_ in rows if r != float("inf")]
    if finite:
        mid = sorted(finite)[len(finite) // 2]
        print(f"median per-query ratio: {mid:.2f}x over {len(finite)} queries")
    if gone:
        print("missing from candidate:", ", ".join(gone))
    if new:
        print("new in candidate:", ", ".join(new))
    bad = [k for _, k, _, _, note in rows if note in ("REGRESSION", "FAILED")]
    if bad:
        print(f"\n{len(bad)} regression(s)/failure(s): {', '.join(bad)}")
        return 1
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], thr))
