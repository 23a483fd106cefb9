#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (NOT part of the engine).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - loads each <outDir>/<name> parquet (Spark result)
  - runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
    with tables registered as views over <sfDir>/*.parquet
  - compares schema / row count / value hash (columns sorted by name,
    rows sorted by all columns) and prints a per-query verdict.
"""
import json, os, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def frame_repr(df: pd.DataFrame):
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]


def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # a Verify run filtered with its `only` arg dumps a subset; names
        # it skipped are not failures of the subset under test
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
            want = canon(con.execute(sql).fetchdf())
            g, w = frame_repr(got), frame_repr(want)
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                n_fail += 1
            elif len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
            elif g != w:
                bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
                print(f"FAIL {name}: first diff at sorted-row {bad}:\n  spark={g[bad]}\n  duck ={w[bad]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    skipped = f" ({n_skip} not dumped)" if n_skip else ""
    print(f"\n{n_pass} pass / {n_fail} fail{skipped}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
