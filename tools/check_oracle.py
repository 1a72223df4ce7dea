#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads every <name>/ parquet result written by graft.Verify plus
oracle_sql.json, registers the sfDir parquet tables as DuckDB views, runs each
oracle, and compares: row count, column names (sorted), and values (rows
sorted, per-cell with float tolerance... no — exact match, since the Spark
side is written to be bit-deterministic). Reports per-query PASS/FAIL.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    import decimal
    if isinstance(a, decimal.Decimal):
        a = float(a)
    if isinstance(b, decimal.Decimal):
        b = float(b)
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    try:
        return bool(a == b)
    except Exception:
        return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        res_dir = Path(out_dir) / name
        got = pd.read_parquet(res_dir)
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        gc, ec = canon(got), canon(exp)
        if list(gc.columns) != list(ec.columns):
            print(f"✗ {name}: columns {list(gc.columns)} != {list(ec.columns)}")
            n_fail += 1
            continue
        if len(gc) != len(ec):
            print(f"✗ {name}: rows {len(gc)} != {len(ec)}")
            n_fail += 1
            continue
        bad = None
        for col in gc.columns:
            av, bv = gc[col].tolist(), ec[col].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                if not cells_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"✗ {name}: value mismatch col={col} row={i}: spark={x!r} duck={y!r}"
                  f" (types {type(x).__name__}/{type(y).__name__})")
            n_fail += 1
        else:
            # also flag dtype drift, which the driver's schema check may catch
            dt = [(c, str(gc[c].dtype), str(ec[c].dtype)) for c in gc.columns
                  if str(gc[c].dtype) != str(ec[c].dtype)]
            note = f" dtype-drift={dt}" if dt else ""
            print(f"✓ {name}: rows={len(gc)}{note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
