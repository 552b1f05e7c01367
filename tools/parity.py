#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY.md §5.2.1).

Usage:
  python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
replays <verifyOutDir>/oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, sorts columns by name (as the driver does), and
compares row counts, schemas (dtype kinds), and exact values.

Exit 0 iff every oracle-backed query matches.
"""
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        out[c] = s
    return pd.DataFrame(out)


def values_equal(a: pd.Series, b: pd.Series) -> bool:
    if len(a) != len(b):
        return False
    if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
        # BYTE-faithful, like the driver's hash: -0.0 != +0.0 (the
        # graph_modularity r12 lesson — np.array_equal passed what the
        # driver failed). Compare the RAW int64 bit patterns — no NaN
        # canonicalization, because the driver hash is byte-faithful
        # and would fail on differing NaN sign/payload bytes too. When
        # the ONLY difference is NaN payloads, say so explicitly (it
        # is diagnosable, not silently passed).
        av = a.to_numpy(dtype="float64", copy=True)
        bv = b.to_numpy(dtype="float64", copy=True)
        if np.array_equal(av.view(np.int64), bv.view(np.int64)):
            return True
        ac, bc = av.copy(), bv.copy()
        ac[np.isnan(ac)] = np.nan
        bc[np.isnan(bc)] = np.nan
        if np.array_equal(ac.view(np.int64), bc.view(np.int64)):
            print("  note: NaN-payload-only bit difference "
                  "(byte-faithful driver hash fails this too)")
        return False
    try:
        am, bm = a.isna(), b.isna()
        if not am.equals(bm):
            return False
        return bool((a[~am].to_numpy() == b[~bm].to_numpy()).all()) if (~am).any() else True
    except Exception:
        return a.astype(str).equals(b.astype(str))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    names = [n for n in sorted(oracle) if not only or n in only]
    for name in names:
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            failures.append((name, "spark output missing (query threw?)"))
            print(f"FAIL {name}: spark output missing (query threw?)")
            continue
        try:
            got = norm(pd.read_parquet(spark_path))
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            failures.append((name, f"load/oracle error: {e}"))
            print(f"FAIL {name}: load/oracle error: {e}")
            continue
        probs = []
        if list(got.columns) != list(want.columns):
            probs.append(f"columns spark={list(got.columns)} duck={list(want.columns)}")
        elif len(got) != len(want):
            probs.append(f"rows spark={len(got)} duck={len(want)}")
        else:
            for c in got.columns:
                if str(got[c].dtype) != str(want[c].dtype):
                    probs.append(f"dtype[{c}] spark={got[c].dtype} duck={want[c].dtype}")
                if not values_equal(got[c], want[c]):
                    idx = None
                    try:
                        neq = ~(got[c].fillna("§NA§").astype(str)
                                == want[c].fillna("§NA§").astype(str))
                        idx = int(np.argmax(neq.to_numpy()))
                    except Exception:
                        pass
                    detail = ""
                    if idx is not None:
                        detail = f" first-diff row {idx}: spark={got[c].iloc[idx]!r} duck={want[c].iloc[idx]!r}"
                    probs.append(f"values[{c}] differ.{detail}")
        if probs:
            failures.append((name, "; ".join(probs)))
            print(f"FAIL {name}: {failures[-1][1]}")
        else:
            print(f"OK   {name} ({len(got)} rows)")

    # queries without an oracle: rows-only check
    for name in sorted(set(p.name for p in Path(out_dir).iterdir()
                           if p.is_dir()) - set(oracle)):
        if only and name not in only:
            continue
        try:
            n = len(pd.read_parquet(Path(out_dir, name)))
            print(f"OK   {name} (no-oracle, {n} rows)" if n > 0
                  else f"FAIL {name}: no-oracle query returned 0 rows")
            if n == 0:
                failures.append((name, "0 rows"))
        except Exception as e:
            failures.append((name, f"read error: {e}"))
            print(f"FAIL {name}: read error: {e}")

    print(f"\n{len(names) - sum(1 for f in failures if f[0] in set(names))}/{len(names)} oracle queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
