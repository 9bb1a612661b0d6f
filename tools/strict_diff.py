#!/usr/bin/env python3
"""Exact-match diff for specific queries: mimics the driver's hash compare
(no float tolerance). Usage: strict_diff.py <out_dir> <sf_dir> [names...]"""
import json
import struct
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                import decimal
                if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                    df[c] = df[c].astype(float)
            except Exception:
                pass
    return df


def bits(x):
    if isinstance(x, float):
        return struct.pack("<d", x).hex()
    return repr(x)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    if not names:
        names = sorted(oracle)
    for name in names:
        if name not in oracle:
            print(f"{name}: no oracle")
            continue
        s = canon(pd.read_parquet(f"{out_dir}/{name}"))
        d = canon(con.execute(oracle[name]).fetchdf())
        if list(s.columns) != list(d.columns):
            print(f"{name}: COLS spark={list(s.columns)} duck={list(d.columns)}")
            continue
        if len(s) != len(d):
            print(f"{name}: ROWS spark={len(s)} duck={len(d)}")
            continue
        # driver hashes value reprs: int64 vs float64 ("500" vs "500.0")
        # breaks the hash even when values compare equal — flag kind diffs.
        kind_bad = [c for c in s.columns
                    if (s[c].dtype.kind in "fc") != (d[c].dtype.kind in "fc")
                    or (s[c].dtype.kind == "b") != (d[c].dtype.kind == "b")]
        if kind_bad:
            print(f"{name}: DTYPE-KIND mismatch on {[(c, str(s[c].dtype), str(d[c].dtype)) for c in kind_bad]}")
            continue
        nbad = 0
        for c in s.columns:
            sv, dv = s[c].tolist(), d[c].tolist()
            for i, (x, y) in enumerate(zip(sv, dv)):
                if hasattr(x, "__len__") and not isinstance(x, str):
                    eq = list(x) == list(y)
                elif isinstance(x, float) and isinstance(y, float):
                    eq = struct.pack("<d", x) == struct.pack("<d", y)
                else:
                    eq = (x == y) or (x is None and y is None)
                    try:
                        if pd.isna(x) and pd.isna(y):
                            eq = True
                    except (TypeError, ValueError):
                        pass
                if not eq:
                    nbad += 1
                    if nbad <= 5:
                        print(f"{name}: col={c} row={i} spark={x!r}[{bits(x)}] duck={y!r}[{bits(y)}]")
        print(f"{name}: {'EXACT-PASS' if nbad == 0 else f'{nbad} mismatching cells'}")


if __name__ == "__main__":
    main()
