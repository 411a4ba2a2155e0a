#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir> [--json out]

Loads each <name>.parquet the Verify main dumped, runs the matching oracle
SQL from oracle_sql.json in DuckDB (with the fixture tables registered as
views), sorts columns by name, and compares row-by-row. With --json it
also writes a per-query machine-readable result map (the repo commits one
as CORRECTNESS_SELF.json each round, so per-query correctness evidence
survives even if the driver-side compare produces nothing).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(out_dir, sf_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = 0

    def fail(name, reason, detail=""):
        nonlocal n_fail
        print(f"FAIL {name}: {reason}")
        if detail:
            print(detail)
        results[name] = {"status": "fail", "reason": reason}
        n_fail += 1

    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}.parquet'").fetchdf()
        except Exception as e:
            fail(name, f"cannot read spark output: {e}")
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            fail(name, f"oracle sql error: {str(e).splitlines()[0]}")
            continue
        g = got.reindex(sorted(got.columns), axis=1)
        e = exp.reindex(sorted(exp.columns), axis=1)
        if list(g.columns) != list(e.columns):
            fail(name, f"columns {list(g.columns)} != {list(e.columns)}")
            continue
        if len(g) != len(e):
            fail(name, f"rows {len(g)} != {len(e)}")
            continue
        gv = [[canon(v) for v in row] for row in g.itertuples(index=False)]
        ev = [[canon(v) for v in row] for row in e.itertuples(index=False)]
        if gv != ev:
            bad = next(i for i in range(len(gv)) if gv[i] != ev[i])
            fail(name, f"first diff at row {bad}",
                 f"   spark:  {gv[bad]}\n   duckdb: {ev[bad]}")
            continue
        print(f"PASS {name} ({len(g)} rows)")
        results[name] = {"status": "pass", "rows": int(len(g)),
                         "cols": list(g.columns)}
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail,
                       "queries": results}, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


USAGE = "usage: compare_oracle.py <verify_out_dir> <sf_dir> [--json out]"

if __name__ == "__main__":
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit(USAGE)
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 2:
        sys.exit(USAGE)
    sys.exit(main(argv[0], argv[1], json_out))
