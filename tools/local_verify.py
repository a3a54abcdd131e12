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
            rel = con.sql(sql)
            exp_types = {c: str(t).upper()
                         for c, t in zip(rel.columns, rel.types)}
            exp = rel.df()
        except Exception as e:
            bad.append((name, f"oracle SQL error: {e}"))
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_types = {c: str(t).upper()
                         for c, t in zip(got_rel.columns, got_rel.types)}
            got = got_rel.df()
        except Exception as e:
            bad.append((name, f"spark result missing: {e}"))
            continue
        if sorted(got.columns) != sorted(exp.columns):
            bad.append((name, f"columns differ: spark={sorted(got.columns)} "
                              f"oracle={sorted(exp.columns)}"))
            continue
        # The driver's hasher is TYPE-sensitive: an oracle column typed
        # HUGEINT (DuckDB's sum(<int>) default) or unsigned will hash-mismatch
        # a Spark BIGINT even when every value is identical. Fail loudly here
        # so an un-CAST aggregate can never pass locally and fail the driver.
        banned = [(c, t) for c, t in exp_types.items()
                  if "HUGEINT" in t or t.startswith("U")]
        if banned:
            bad.append((name, "oracle type not Spark-representable (CAST it): "
                              + ", ".join(f"{c}:{t}" for c, t in banned)))
            continue
        # Widths inside a family collapse to one pandas dtype (INTEGER and
        # BIGINT both become int64), so only FAMILY mismatches (int vs float
        # vs decimal vs str ...) can change the driver's hash input.
        def family(t):
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            if t.startswith("DECIMAL"):
                return "decimal"
            if t.startswith("TIMESTAMP"):
                return "timestamp"
            return t
        tmism = [(c, got_types[c], exp_types[c]) for c in exp_types
                 if family(got_types.get(c, "")) != family(exp_types[c])]
        if tmism:
            bad.append((name, "result type family differs (changes the "
                              "driver's hash input): "
                              + ", ".join(f"{c}: spark={g} oracle={o}"
                                          for c, g, o in tmism)))
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
