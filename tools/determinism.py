#!/usr/bin/env python3
"""Cross-run determinism check: compare two graft.Verify dumps cell-by-cell.

Usage: python3 tools/determinism.py <outDirA> <outDirB>

Run graft.Verify twice — ideally with DIFFERENT SPARK_GRAFT_CPUS so the
partition count (and thus aggregation merge order) differs — and compare
every query's parquet output after a canonical sort. Any diff is a query
whose result depends on execution order (the r2 `q_skew_join` failure
class: double sums accumulate in partition order; the decimal-sum
migration is what makes this check pass).
"""
import sys, os
import duckdb


def main(a_dir, b_dir):
    con = duckdb.connect()
    ok = bad = 0
    for name in sorted(os.listdir(a_dir)):
        da, db = os.path.join(a_dir, name), os.path.join(b_dir, name)
        if not os.path.isdir(da):
            continue
        if not os.path.isdir(db):
            print(f"  {name}: MISSING in {b_dir}")
            bad += 1
            continue
        a = con.execute(f"SELECT * FROM '{da}/*.parquet'").fetchdf()
        b = con.execute(f"SELECT * FROM '{db}/*.parquet'").fetchdf()
        a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
        b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
        if a.equals(b):
            ok += 1
        else:
            print(f"  {name}: DIFFERS between runs")
            bad += 1
    print(f"== {ok} identical, {bad} differ ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
