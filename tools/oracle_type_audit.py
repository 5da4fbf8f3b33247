#!/usr/bin/env python3
"""Oracle dtype audit — keeps the HUGEINT artifact class dead.

The driver's correctness gate hashes STRING RENDERINGS of result cells, so
a DuckDB column that reaches pandas as float64 (e.g. anything derived from
DuckDB's HUGEINT `sum()`) renders `86206.0` against Spark's int64 `86206`
and hash-fails even when every value is equal — this cost rounds 7 AND 8
a red gate row each. This audit runs every oracle SQL in DuckDB and
compares its dtype CLASS (int vs float vs other) per column against the
Spark result parquet written by graft.Verify; any mismatch is the next
hash-fail waiting to happen.

Usage: python tools/oracle_type_audit.py <sfDir> <verifyOutDir>
Exit code 1 on any mismatch.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(dtype: str) -> str:
    if dtype.startswith(("int", "uint")):
        return "int"
    if dtype.startswith("float"):
        return "float"
    return "other"


def main() -> int:
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name, sql in sorted(oracles.items()):
        spark_path = out_dir / name
        if not spark_path.exists():
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # oracle must at least run
            bad.append((name, "<oracle>", f"ORACLE_ERROR: {str(e)[:120]}"))
            continue
        sp = pd.read_parquet(spark_path)
        for c in sp.columns:
            if c not in odf.columns:
                bad.append((name, c, f"missing in oracle (has {list(odf.columns)})"))
                continue
            sc, oc = type_class(str(sp[c].dtype)), type_class(str(odf[c].dtype))
            if sc != oc:
                bad.append((name, c, f"spark={sp[c].dtype} oracle={odf[c].dtype}"))
    for name, col, why in bad:
        print(f"TYPE-DRIFT  {name}.{col}: {why}")
    print(f"== {len(bad)} type mismatches across {len(oracles)} oracles ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
