#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads each <out>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf tables,
sorts columns by name on both sides, and compares values exactly
(with a small float report on mismatch).
"""
import json
import math
import pathlib
import py_compile
import re
import subprocess
import sys
import tempfile

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
        # duckdb DECIMAL -> object(Decimal); normalize numerics to float
        if df[c].dtype == object:
            try:
                import decimal
                if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                    df[c] = df[c].astype(float)
            except Exception:
                pass
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
            if math.isnan(af) and math.isnan(bf):
                return True
            return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
        except (TypeError, ValueError):
            return False
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    import numpy as np
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b or str(a) == str(b)


def shape_lint(name: str, spark_raw: pd.DataFrame, duck_raw: pd.DataFrame) -> int:
    """Oracle-SHAPE lint (VERDICT r11 item 2). The driver's hash compare is
    dtype-sensitive: a numerically identical result still fails when the
    oracle SQL returns a wider type pandas renders differently (r10:
    emb_quantize_int8 array column; r11: event_markov — DuckDB sum() is
    HUGEINT, so integer division reached pandas as float64 against Spark's
    int64). Flag any shared column where one engine yields an integral
    dtype and the other does not — the fix is always a CAST in the oracle
    SQL (or an explicit .cast in the Spark plan), never a value change.
    Returns the number of flagged columns (counted as structural failures).
    """
    n = 0
    for c in spark_raw.columns:
        if c not in duck_raw.columns:
            continue  # column-set mismatch is reported by the main compare
        s, d = str(spark_raw[c].dtype), str(duck_raw[c].dtype)
        s_int = s.startswith(("int", "uint", "Int", "UInt"))
        d_int = d.startswith(("int", "uint", "Int", "UInt"))
        if s_int != d_int:
            print(f"SHAPE {name}: col={c} spark dtype={s} oracle dtype={d} "
                  f"- dtype-sensitive driver hash WILL diverge; add a CAST")
            n += 1
    return n


def structural_checks(out_dir: str, oracle: dict) -> int:
    """Doc-drift + deployment-artifact lint (VERDICT r8 items 2 and 7).

    Returns the number of failures (0 = clean). The inventory counts in
    SURVEY.md's `**Inventory size**` block must equal what the engine
    actually registers — the add-an-operator-forget-the-docs bug class
    recurred four rounds running; this makes the fifth mechanically
    impossible. Registered count = one Verify result dir per query.
    """
    fails = 0
    repo = pathlib.Path(__file__).resolve().parent.parent
    m = re.search(
        r"\*\*Inventory size\*\*: (\d+) keyed operators.*?"
        r"(\d+) entries registered in `SparkEntry\.queries`, (\d+) of them oracled",
        (repo / "SURVEY.md").read_text(), re.S)
    if not m:
        print("DRIFT: SURVEY.md '**Inventory size**' block missing or reshaped")
        fails += 1
    else:
        n_ops, n_reg, n_orc = map(int, m.groups())
        n_dirs = sum(1 for p in pathlib.Path(out_dir).iterdir() if p.is_dir())
        if n_reg != n_dirs:
            print(f"DRIFT: SURVEY.md says {n_reg} registered entries; "
                  f"SparkEntry.queries produced {n_dirs} Verify results")
            fails += 1
        if n_ops != n_reg - 1:  # §2 operators + flagship = registered
            print(f"DRIFT: SURVEY.md operator count {n_ops} != registered {n_reg} - 1")
            fails += 1
        if n_orc != len(oracle):
            print(f"DRIFT: SURVEY.md says {n_orc} oracled; oracle_sql.json has {len(oracle)}")
            fails += 1
    for dag in sorted((repo / "dags").glob("*.py")):
        try:
            with tempfile.NamedTemporaryFile(suffix=".pyc") as tmp:
                py_compile.compile(str(dag), cfile=tmp.name, doraise=True)
        except py_compile.PyCompileError as e:
            print(f"DAGLINT: {dag.name} does not compile: {e.msg[:200]}")
            fails += 1
    # structural lane (r15 item 2): execute the DAG against Airflow API
    # stubs and assert task ids / groups / dependency chain — syntax-only
    # compile lets renamed tasks and broken chains rot silently
    r = subprocess.run([sys.executable, str(repo / "tools" / "dag_check.py")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout.strip() or r.stderr.strip()[:400])
        fails += 1
    return fails


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    # optional 4th arg: comma-separated key subset (local dev loop only —
    # skips the structural lane, which needs the full inventory)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
        n_structural = 0
    else:
        n_structural = structural_checks(out_dir, oracle)

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_raw = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            fails.append(name)
            continue
        try:
            duck_raw = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            fails.append(name)
            continue
        n_structural += shape_lint(name, spark_raw, duck_raw)
        spark_df, duck_df = canon(spark_raw), canon(duck_raw)
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            fails.append(name)
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            fails.append(name)
            continue
        bad = None
        for c in spark_df.columns:
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (x, y) in enumerate(zip(sv, dv)):
                if not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} spark={x!r} duck={y!r}")
            n_fail += 1
            fails.append(name)
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {fails}" if fails else "")
          + (f" ({n_structural} structural/drift failures)" if n_structural else ""))
    sys.exit(1 if (n_fail or n_structural) else 0)


if __name__ == "__main__":
    main()
