#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each <outDir>/<name> parquet result, runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB over the same sf tables, and compares
(schema-insensitively: columns sorted by name, rows sorted by all
columns, values hashed). Exit 0 iff every query matches.

Local dev tooling only — the Scala library has no Python dependency.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cell(v):
    import datetime
    try:
        if v is None or pd.isna(v):  # None, float NaN, pandas NaT
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays etc. — not null
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # full precision — we aim for bit-identical
    if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()  # DATE == midnight TIMESTAMP
    return str(v)

def table_hash(df: pd.DataFrame):
    import hashlib
    h = hashlib.sha256()
    for _, row in df.iterrows():
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main(sf_dir: str, out_dir: str, json_out: str = None, only=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        unknown = set(only) - set(oracle)
        if unknown:
            sys.exit(f"--only names not in oracle_sql.json: {sorted(unknown)}")
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    report = {}
    def rec(name, ok, rows, why=""):
        report[name] = {"ok": ok, "rows": rows} | ({"err": why} if why else {})
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})"); failures += 1
            rec(name, False, -1, "spark output missing"); continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); failures += 1
            rec(name, False, len(got), "oracle SQL error"); continue
        got_c, want_c = canon(got), canon(want)
        if list(got_c.columns) != list(want_c.columns):
            print(f"FAIL {name}: columns {list(got_c.columns)} != {list(want_c.columns)}")
            failures += 1; rec(name, False, len(got_c), "schema mismatch"); continue
        if len(got_c) != len(want_c):
            print(f"FAIL {name}: rows {len(got_c)} != {len(want_c)}")
            failures += 1; rec(name, False, len(got_c), "row count mismatch"); continue
        hg, hw = table_hash(got_c), table_hash(want_c)
        if hg != hw:
            print(f"FAIL {name}: hash mismatch ({len(got_c)} rows)")
            # show first differing row for debugging
            for i in range(len(got_c)):
                rg = [cell(v) for v in got_c.iloc[i]]
                rw = [cell(v) for v in want_c.iloc[i]]
                if rg != rw:
                    print(f"  row {i}:\n   spark={rg}\n   duck ={rw}")
                    break
            failures += 1
            rec(name, False, len(got_c), "hash mismatch")
        else:
            print(f"OK   {name} ({len(got_c)} rows)")
            rec(name, True, len(got_c))
    print(f"{len(oracle) - failures}/{len(oracle)} queries match")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf": sf_dir, "passed": len(oracle) - failures,
                       "total": len(oracle), "queries": report}, f, indent=1)
    return 1 if failures else 0

if __name__ == "__main__":
    # dev-only filter for filtered Verify runs (the driver always passes
    # at most 3 positional args, so its full-surface gate is unchanged):
    #   check_oracle.py <sf> <out> [json] --only q_a,q_b
    argv, only = list(sys.argv[1:]), None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out = argv[1] if len(argv) > 1 else "/tmp/verify_out"
    jo = argv[2] if len(argv) > 2 else None
    sys.exit(main(sf, out, jo, only))
