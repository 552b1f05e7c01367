#!/usr/bin/env python3
"""Fleet-wide negative-zero audit (VERDICT r12 item 2).

The graph_modularity r12 hash-fail class: DuckDB's round() returns
-0.0 for tiny-negative doubles while Spark's returns +0.0 — equal as
values, different as bytes, so the driver's hash gate fails while
rows/values pass. This tool finds every query that EMITS a -0.0 bit
pattern in either engine, at a given SF, before the driver does.

Usage:
  python3 tools/negzero_audit.py <sfDir> <oracle_sql.json> [verifyOutDir]

- Replays every oracle SQL in DuckDB over <sfDir>'s parquet tables and
  scans all float columns for signbit-set zeros.
- If <verifyOutDir> is given, also scans each Spark output parquet.
- Exit 0 iff no -0.0 anywhere.
"""
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def neg_zero_cols(df: pd.DataFrame):
    hits = []
    for c in df.columns:
        s = df[c]
        if not pd.api.types.is_float_dtype(s):
            continue
        v = s.to_numpy(dtype="float64", copy=False)
        nz = int(((v == 0.0) & np.signbit(v)).sum())
        if nz > 0:
            hits.append((c, nz))
    return hits


def main():
    sf_dir = sys.argv[1]
    oracle = json.loads(Path(sys.argv[2]).read_text())
    out_dir = Path(sys.argv[3]) if len(sys.argv) > 3 else None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad = 0
    for name in sorted(oracle):
        try:
            df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ERR  duck {name}: {e}")
            bad += 1
            continue
        for c, n in neg_zero_cols(df):
            print(f"NEGZ duck  {name}.{c}: {n} rows")
            bad += 1
        if out_dir is not None and (out_dir / name).exists():
            sdf = pd.read_parquet(out_dir / name)
            for c, n in neg_zero_cols(sdf):
                print(f"NEGZ spark {name}.{c}: {n} rows")
                bad += 1
    print(f"\n{'CLEAN' if bad == 0 else f'{bad} -0.0 findings'} "
          f"over {len(oracle)} oracle queries at {sf_dir}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
