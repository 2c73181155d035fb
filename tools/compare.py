#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on outDir/oracle_sql.json against the sfDir parquet tables and
compares each oracle result with the Spark result parquet at outDir/<name>/.

Usage: compare.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize datetimes to ns for cross-engine dtype comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(con.execute(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if want.shape != got.shape:
            print(f"FAIL {name}: shape want={want.shape} got={got.shape}")
            n_fail += 1
            continue
        bad = []
        for c in want.columns:
            w, g = want[c], got[c]
            # The driver's hash is dtype-sensitive: an int64 Spark column vs a
            # float64 oracle column (e.g. uncast DuckDB HUGEINT arithmetic)
            # fails there even when every value agrees. Be STRICTER here and
            # require full dtype equality (width included) — the driver has
            # been observed to tolerate int32-vs-int64, but width mismatches
            # are exactly the near-miss class worth catching locally.
            if str(w.dtype) != str(g.dtype):
                bad.append(f"{c} (dtype mismatch: oracle={w.dtype} spark={g.dtype})")
                continue
            if w.dtype.kind == "f" or g.dtype.kind == "f":
                eq = (w.astype("float64").fillna(-1.23e300) == g.astype("float64").fillna(-1.23e300)).all()
                if not eq:
                    d = (w.astype("float64") - g.astype("float64")).abs().max()
                    bad.append(f"{c} (float, maxdiff={d!r})")
            else:
                if not w.fillna("\x00NULL").equals(g.fillna("\x00NULL")) and not (w == g).all():
                    bad.append(c)
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}")
            n_fail += 1
        else:
            print(f"OK   {name}: {want.shape[0]} rows x {want.shape[1]} cols")
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'} ({len(oracles)} oracle queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
