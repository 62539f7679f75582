#!/usr/bin/env python3
"""Generate a DuckDB VALUES-literal oracle from a Verify parquet dump.

The emit/DDL driver gates (q350/q351/q352) return DETERMINISTIC statement
text (pinned `now`, fixed schema, fresh workspace per call), so their
oracle is the enumerated row set itself — the same contract as the golden
strings in EmitSinkSpec/DdlDialectsSpec, but DuckDB-checkable. This tool
renders the Spark output as `SELECT * FROM (VALUES ...) AS t(cols) ORDER
BY ...` with types pinned to match the parquet dtypes, for pasting into
Queries.scala as the oracleSql entry.

Usage: gen_values_oracle.py <verify_out_dir> <query_name> <order_by_cols...>
"""
import glob
import sys

import duckdb


def sql_str(s):
    return "'" + s.replace("'", "''") + "'"


def main(out_dir, name, order_cols):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    assert files, f"no parquet under {out_dir}/{name}"
    df = duckdb.sql(f"SELECT * FROM read_parquet({files!r})").df()
    cols = list(df.columns)
    dtypes = {c: str(df.dtypes[c]) for c in cols}

    def render(v, c):
        dt = dtypes[c]
        if dt == "object":
            return sql_str(str(v))
        if dt in ("int32",):
            return f"CAST({v} AS INTEGER)"
        if dt in ("int64",):
            return f"CAST({v} AS BIGINT)"
        raise SystemExit(f"unhandled dtype {dt} for column {c}")

    rows = []
    for r in df.itertuples(index=False, name=None):
        rows.append("(" + ", ".join(render(v, c) for v, c in zip(r, cols)) + ")")
    body = ",\n".join(rows)
    order = ", ".join(order_cols)
    sql = (f"SELECT * FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"
           f" ORDER BY {order}")
    sys.stdout.write(sql)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
