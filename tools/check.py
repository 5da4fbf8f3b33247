#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over views named after the
parquet tables in <sfDir>, sorts columns by name and rows by all columns,
and compares cell-by-cell (1e-6 relative tolerance on floats).
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
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(cells_equal(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main():
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rows_only = 0
    for d in sorted(out_dir.iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        got = canon(pd.read_parquet(d))
        if name not in oracles:
            status = "ROWS_ONLY" if len(got) > 0 else "ROWS_ONLY_EMPTY!"
            n_rows_only += 1
            print(f"{status:>16}  {name}  rows={len(got)}")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as e:
            n_fail += 1
            print(f"{'ORACLE_ERR':>16}  {name}  {e}")
            continue
        if list(got.columns) != list(exp.columns):
            n_fail += 1
            print(f"{'COLS_MISMATCH':>16}  {name}  got={list(got.columns)} exp={list(exp.columns)}")
            continue
        if len(got) != len(exp):
            n_fail += 1
            print(f"{'ROWS_MISMATCH':>16}  {name}  got={len(got)} exp={len(exp)}")
            continue
        bad = []
        for i in range(len(got)):
            for c in got.columns:
                if not cells_equal(got.at[i, c], exp.at[i, c]):
                    bad.append((i, c, got.at[i, c], exp.at[i, c]))
                    break
            if len(bad) >= 5:
                break
        if bad:
            n_fail += 1
            print(f"{'VALUE_MISMATCH':>16}  {name}  {len(bad)}+ rows differ; first samples:")
            for i, c, g, e in bad:
                print(f"{'':>16}    row={i} col={c} got={g!r} exp={e!r}")
        else:
            n_pass += 1
            print(f"{'PASS':>16}  {name}  rows={len(got)}")

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
