#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Verify parquet dumps
(columns sorted by name, values stringified, rows compared both as-given
and row-sorted)."""
import json, sys, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df, sort_rows):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)]
    if sort_rows:
        rows = sorted(rows)
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); bad += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); bad += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        ec, er = canon(exp, False)
        gc, gr = canon(got, False)
        if ec != gc:
            print(f"FAIL {name}: columns {gc} != {ec}"); bad += 1; continue
        edt = {c: str(exp.dtypes[c]) for c in exp.columns}
        gdt = {c: str(got.dtypes[c]) for c in got.columns}
        if edt != gdt:
            diff = {c: (gdt[c], edt[c]) for c in edt if edt[c] != gdt[c]}
            print(f"FAIL {name}: dtypes differ (spark, oracle): {diff}"); bad += 1; continue
        if len(er) != len(gr):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}"); bad += 1; continue
        if er != gr:
            if sorted(er) == sorted(gr):
                print(f"WARN {name}: values match only after row sort")
                ok += 1
                continue
            n = sum(1 for a, b in zip(er, gr) if a != b)
            print(f"FAIL {name}: {n}/{len(er)} rows differ")
            for a, b in list(zip(er, gr)):
                if a != b:
                    print(f"  oracle: {a}\n  spark : {b}")
                    break
            bad += 1
            continue
        ok += 1
        print(f"OK   {name} ({len(gr)} rows)")
    print(f"\n{ok} ok, {bad} fail")
    return bad

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
