#!/usr/bin/env python3
"""Fold the complete bench artifact into a driver round artifact.

Usage: python3 tools/foldbench.py <BENCH_rN.json> <BENCH_LOCAL.json> [out]

The driver's per-round BENCH_r{N}.json keeps only a bounded stdout tail;
since r6 the Bench stdout line is a parse-safe summary carrying the
sha256 of the complete artifact (BENCH_LOCAL.json: full-precision
medians, [min,max] spread, per-query task metrics). This script makes
ONE authoritative file: it parses the summary out of the round
artifact's tail, verifies the committed full artifact hashes to the
summary's `artifact_sha256` (tamper-evidence), and writes the round
artifact with a `full` key holding the verified complete map.

Exit 1 if the hash does not match or no summary line parses — a
mismatch means the committed BENCH_LOCAL.json is NOT the run the round
artifact observed, which is exactly the r5 artifact-integrity failure
this pipeline exists to prevent.
"""
import hashlib
import json
import re
import sys


def main(round_path, full_path, out_path=None):
    rnd = json.load(open(round_path))
    raw = open(full_path, "rb").read()
    sha = hashlib.sha256(raw).hexdigest()
    summary = rnd.get("parsed")
    if not summary:
        # recover the summary from the tail (the driver may have stored
        # parsed=null if anything trailed the JSON line)
        m = re.search(r'\{"metric":.*?"artifact_sha256":"[0-9a-f]{64}"\}',
                      rnd.get("tail", ""))
        if not m:
            print("no parseable bench summary in round artifact", file=sys.stderr)
            return 1
        summary = json.loads(m.group(0))
    want = summary.get("artifact_sha256")
    if want != sha:
        print(f"sha mismatch: summary says {want}, {full_path} hashes to "
              f"{sha} — the committed full artifact is NOT the run the "
              f"round artifact observed", file=sys.stderr)
        return 1
    rnd["parsed"] = summary
    rnd["full"] = json.loads(raw)
    rnd["full_sha256"] = sha
    out = out_path or round_path
    with open(out, "w") as f:
        json.dump(rnd, f)
    print(f"folded: {out} now carries the verified complete map "
          f"({len(rnd['full'].get('queries', {}))} queries, sha {sha[:12]}…)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(*sys.argv[1:4]))
