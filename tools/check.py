#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's t2 gate: run graft.Verify,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare values (columns sorted by name). Not part of the shipped library.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd
from pathlib import Path

def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    if hasattr(a, "__len__") and not isinstance(a, str):
        return list(a) == list(b)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in Path(sf_dir).glob("*.parquet"):
        con.sql(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got_path = Path(out_dir, name)
        if not got_path.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm_df(pq.read_table(str(got_path)).to_pandas())
            want = norm_df(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        sch_g = {c: str(got[c].dtype) for c in got.columns}
        sch_w = {c: str(want[c].dtype) for c in want.columns}
        bad = None
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c], want[c])):
                if not cmp_cell(a, b):
                    bad = (c, i, a, b); break
            if bad: break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={c} row={i}: spark={a!r} duck={b!r}")
            n_fail += 1
        elif sch_g != sch_w:
            print(f"WARN {name}: dtype diff {sch_g} vs {sch_w} (values match)")
            n_pass += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
