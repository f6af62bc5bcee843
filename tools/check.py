#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [jsonOut]

For each <outDir>/<name> parquet dir with an entry in oracle_sql.json:
run the oracle in DuckDB (views named after tables over <sfDir> parquet),
sort columns by name, sort rows, compare cell-by-cell. Reports match /
mismatch with diff details. Queries without oracle entries → rows-only.
With jsonOut, also writes a per-query {match, rows, detail} JSON summary
(the committed large-scale sweep artifact).
"""
import sys, json, glob, os
import duckdb

def connect(sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main(sf_dir, out_dir, json_out=None):
    summary = {}
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # FRESH connection per query: at the 10x scale a single
        # connection accumulates buffer-pool blocks across 150+ heavy
        # oracles (recursive CTEs, triple self-joins) until DuckDB's
        # own limit trips — isolation costs milliseconds of view setup
        con = connect(sf_dir)
        files = glob.glob(f"{d}/*.parquet")
        def record(match, rows, detail):
            summary[name] = {"match": match, "rows": rows, "detail": detail}
        if not files:
            print(f"  {name}: NO OUTPUT FILES"); bad += 1
            record(False, 0, "no output files"); continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(got)} rows)"
                  + (" EMPTY!" if len(got) == 0 else ""))
            ok += 1 if len(got) else 0
            bad += 0 if len(got) else 1
            record(len(got) > 0, len(got), "rows-only")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  {name}: ORACLE ERROR {type(e).__name__}: "
                  f"{str(e)[:160]}")
            bad += 1
            record(False, len(got), f"oracle error: {str(e)[:160]}")
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"  {name}: COLUMN MISMATCH got={list(got.columns)} exp={list(exp.columns)}")
            bad += 1; record(False, len(got), "column mismatch"); continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if len(gs) != len(es):
            print(f"  {name}: ROWCOUNT got={len(gs)} exp={len(es)}")
            bad += 1
            record(False, len(gs), f"rowcount got={len(gs)} exp={len(es)}")
            continue
        diffs = []
        for c in gs.columns:
            a, b = gs[c], es[c]
            try:
                neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"{c}[{i}]: got={a[i]!r} exp={b[i]!r} "
                             f"(n={int(neq.sum())})")
        if diffs:
            print(f"  {name}: VALUE MISMATCH " + "; ".join(diffs[:4]))
            bad += 1
            record(False, len(gs), "value mismatch: " + "; ".join(diffs[:4]))
        else:
            print(f"  {name}: ok ({len(gs)} rows)")
            ok += 1
            record(True, len(gs), "exact")
    print(f"== {ok} ok, {bad} bad ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "ok": ok, "bad": bad,
                       "queries": summary}, f, indent=1, sort_keys=True)
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
