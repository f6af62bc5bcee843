#!/usr/bin/env python3
"""Output-TYPE audit — the guard the last two rounds' only red rows needed.

The driver's hash compare canonicalizes by VALUE AND TYPE: a query whose
oracle emits a type the Spark parquet doesn't (r7: raw DECIMAL(38,0);
r8: DuckDB HUGEINT from an uncast `sum(CASE…)`) fails `hash_match` even
when every cell is value-identical — and `tools/check.py` compares cells
numerically, so it structurally cannot catch this class. This tool can:

For each oracle in <outDir>/oracle_sql.json:
  1. DESCRIBE the oracle (LIMIT-0 — no execution cost) in DuckDB.
  2. DESCRIBE the Spark output parquet for the same query.
  3. FAIL if any column's type (either side) is outside the PROVEN set
     {BIGINT, INTEGER, DOUBLE, VARCHAR, BOOLEAN} — every type that has
     ever appeared in a driver-green query, surveyed over all 154 rows
     of CORRECTNESS_r08 — or if the two sides disagree outside the one
     proven-harmless equivalence class {BIGINT, INTEGER} (the q1
     family's rnk has diverged BIGINT-vs-INTEGER since round 1, green
     throughout).

Usage:
  python3 tools/typecheck.py <sfDir> <outDir> [jsonOut]   # audit a run
  python3 tools/typecheck.py --selftest                   # prove the tool
The selftest feeds a deliberately-uncast `sum(CASE…)` (DuckDB: HUGEINT)
and asserts it is flagged — the exact fixture that slipped through in r8.
"""
import sys, json, os
from contextlib import closing
import duckdb

ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN"}
# proven-harmless cross-engine divergence (same pandas int64 canonical form)
INT_CLASS = {"BIGINT", "INTEGER"}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def audit_types(om, sm):
    """Return a list of problems for one query's (oracle, spark) schemas."""
    problems = []
    if set(om) != set(sm):
        problems.append(f"column sets differ: oracle-only="
                        f"{sorted(set(om) - set(sm))} spark-only="
                        f"{sorted(set(sm) - set(om))}")
        return problems
    for c in sorted(om):
        o, s = om[c], sm[c]
        if o not in ALLOWED:
            problems.append(f"{c}: oracle type {o} outside proven set")
        if s not in ALLOWED:
            problems.append(f"{c}: spark type {s} outside proven set")
        if o != s and not (o in INT_CLASS and s in INT_CLASS):
            problems.append(f"{c}: type mismatch oracle={o} spark={s}")
    return problems


def main(sf_dir, out_dir, json_out=None, skip_missing=False):
    """Audit every oracle's and Spark dump's output types.

    skip_missing: tolerate queries with no Spark output dir (for
    check.py's embedded invocation on TARGETED verify runs, where only a
    subset of queries was dumped — completeness-vs-declared is
    surveycheck's job, not this tool's). The standalone CLI keeps the
    strict behavior: a full sweep with a missing dump fails loudly.
    """
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    summary, ok, bad = {}, 0, 0
    with closing(connect(sf_dir)) as con:
        for name, sql in sorted(oracles.items()):
            d = f"{out_dir}/{name}"
            if skip_missing and not os.path.isdir(d):
                continue
            try:
                om = {r[0]: r[1] for r in con.execute(
                    f"DESCRIBE SELECT * FROM ({sql}) _t").fetchall()}
            except Exception as e:
                summary[name] = {"ok": False,
                                 "problems": [f"oracle DESCRIBE error: "
                                              f"{str(e)[:160]}"]}
                print(f"  {name}: ORACLE DESCRIBE ERROR"); bad += 1
                continue
            if not os.path.isdir(d):
                summary[name] = {"ok": False,
                                 "problems": ["no spark output dir"]}
                print(f"  {name}: NO SPARK OUTPUT"); bad += 1
                continue
            sm = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM '{d}/*.parquet'").fetchall()}
            problems = audit_types(om, sm)
            summary[name] = {"ok": not problems, "problems": problems}
            if problems:
                print(f"  {name}: " + "; ".join(problems)); bad += 1
            else:
                ok += 1
    print(f"== typecheck: {ok} ok, {bad} bad ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "ok": ok, "bad": bad,
                       "queries": summary}, f, indent=1, sort_keys=True)
    return 1 if bad else 0


def selftest():
    con = duckdb.connect()
    # the r8 failure shape: uncast sum(CASE…) is HUGEINT in DuckDB
    om = {r[0]: r[1] for r in con.execute(
        "DESCRIBE SELECT sum(CASE WHEN 1=1 THEN 1 ELSE 0 END) AS n "
        "FROM range(5)").fetchall()}
    assert om["n"] == "HUGEINT", f"fixture didn't produce HUGEINT: {om}"
    problems = audit_types(om, {"n": "BIGINT"})
    assert problems, "uncast sum(CASE…) fixture was NOT flagged"
    # the fix shape passes
    om2 = {r[0]: r[1] for r in con.execute(
        "DESCRIBE SELECT CAST(sum(CASE WHEN 1=1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n FROM range(5)").fetchall()}
    assert not audit_types(om2, {"n": "BIGINT"}), "cast fixture flagged"
    # the proven BIGINT/INTEGER divergence passes
    assert not audit_types({"rnk": "BIGINT"}, {"rnk": "INTEGER"})
    # r7 failure shape: raw DECIMAL flagged
    assert audit_types({"x": "DECIMAL(38,0)"}, {"x": "DECIMAL(38,0)"})
    print("selftest: all assertions passed")
    return 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
