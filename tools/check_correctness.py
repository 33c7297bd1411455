#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet under OUTDIR, run the oracle SQL from oracle_sql.json in DuckDB
over the same sf tables and compare rows / schema / values.

Usage: check_correctness.py OUTDIR SFDIR
"""
import json
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # sort columns by name, then rows by all values → order-insensitive
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            results[name] = {"error": "no spark output"}
            continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            continue
        g, w = canon(got), canon(want)
        rows = len(g) == len(w)
        schema = list(g.columns) == list(w.columns)
        try:
            match = schema and rows and g.equals(w)
            if not match and schema and rows:
                # tolerate dtype-only diffs (int32 vs int64)
                match = all(
                    (g[c].astype(str).values == w[c].astype(str).values).all()
                    for c in g.columns)
        except Exception:
            match = False
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": bool(match),
                         "n_spark": len(g), "n_oracle": len(w)}
        if not match:
            results[name]["spark_cols"] = list(g.columns)
            results[name]["oracle_cols"] = list(w.columns)
    ok = sum(1 for r in results.values() if r.get("hash_match"))
    print(json.dumps(results, indent=1, default=str))
    print(f"== {ok}/{len(results)} hash-match", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
