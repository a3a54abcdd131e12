#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify.scala output
(parquet per query + oracle_sql.json), registers the sf tables as DuckDB views,
runs each oracle, and compares (schema-insensitive: columns sorted by name,
rows sorted, values compared exactly after normalization).

Usage: python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    import pandas as pd
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            bad.append((name, f"oracle SQL error: {e}"))
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            bad.append((name, f"spark result missing: {e}"))
            continue
        if sorted(got.columns) != sorted(exp.columns):
            bad.append((name, f"columns differ: spark={sorted(got.columns)} "
                              f"oracle={sorted(exp.columns)}"))
            continue
        g, e = normalize(got), normalize(exp)
        if len(g) != len(e):
            bad.append((name, f"row count: spark={len(g)} oracle={len(e)}"))
            continue
        diffs = []
        for c in g.columns:
            if not g[c].equals(e[c]):
                neq = (g[c] != e[c]) & ~(g[c].isna() & e[c].isna())
                n = int(neq.sum())
                if n:
                    i = neq.idxmax()
                    diffs.append(f"{c}: {n} diffs, first@{i} "
                                 f"spark={g[c][i]!r} oracle={e[c][i]!r}")
        if diffs:
            bad.append((name, "; ".join(diffs)))
        else:
            ok.append(name)
    for n in ok:
        print(f"  OK   {n}")
    for n, msg in bad:
        print(f"  FAIL {n}: {msg[:500]}")
    print(f"{len(ok)}/{len(ok) + len(bad)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
