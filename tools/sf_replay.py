#!/usr/bin/env python3
"""Cross-scale oracle replay → CORRECTNESS_SF01_r{N}.json.

The driver's correctness gate runs at sf0.01 only; the bench runs at
sf0.1. This tool replays the DuckDB oracle compare at ANY scale over a
`graft.Verify <sfDir> <outDir>` dump and writes the driver-format
artifact (per-query rows/schema/hash match), so the benched scale is
itself hash-gated for every family whose semantics are scale-exact.

Inclusion rule (documented, not cherry-picked): every oracle-checkable
entry EXCEPT those on the float-order exclusion list below. Exact
integers, DECIMAL arithmetic, md5-byte rebuilds and integer-ppm shares
are independent of partitioning and summation order, so they must
replay bit-identically at every scale — a red row here is a bug, never
"expected float noise". Entries whose output includes a raw DOUBLE
aggregate (sum/avg/corr of floats) are excluded by construction: their
cross-engine agreement is only guaranteed at the rounding points the
sf0.01 gate pins, not under sf0.1's different summation trees.

Usage: python3 tools/sf_replay.py <sfDir> <outDir> <artifact.json>
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from selfcheck import TABLES, canon, frame_repr  # noqa: E402

# Entries whose OUTPUT rounds a DOUBLE-derived quantity that lands
# within ~1 ulp of a rounding half-way point at sf0.1 (the engines'
# decimal-sum ladders and double-rounding functions differ in the last
# bit). Derived EMPIRICALLY, not guessed: the full replay at sf0.1 was
# run with this list EMPTY and exactly three entries diverged — each by
# one unit in the last rounded digit on a handful of rows (p109 3/1025,
# p12 6/920, q54 4/3600). q54 was then FIXED (its gap-filled average
# moved to exact integer e4 units — round 11) and left the list; the
# two cosine entries remain excluded because making them scale-exact
# would mean changing the shared dec_cosine kernel's documented
# per-add (38,17) ladder under dozens of green consumers. Their
# correctness stays pinned by the sf0.01/sf0.001 gates, where no value
# straddles a rounding point.
FLOAT_ORDER_SENSITIVE = {
    # round(double cosine, 6): sf0.1 puts a few pairs a half-ulp from
    # the 1e-6 boundary
    "p12_embedding_neardup",
    # exact_c6 companion column: same 1e-6 cosine boundary class
    "p109_ivf_batch_bitext",
}


def main(sf_dir: str, out_dir: str, artifact: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    report = {}
    n_green = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            got = canon(con.execute(
                "SELECT * FROM read_parquet("
                f"'{out_dir}/{name}/*.parquet')").fetchdf())
            want = canon(con.execute(sql).fetchdf())
            row["spark_rows"] = len(got)
            row["oracle_rows"] = len(want)
            row["rows_match"] = len(got) == len(want)
            row["schema_match"] = list(got.columns) == list(want.columns)
            row["hash_match"] = (row["rows_match"] and row["schema_match"]
                                 and frame_repr(got) == frame_repr(want))
        except Exception as e:  # noqa: BLE001 — recorded, not raised
            row["err"] = f"{type(e).__name__}: {e}"
        if name in FLOAT_ORDER_SENSITIVE:
            # measured anyway; recorded under a separate key so the
            # headline set stays the scale-exact contract
            report.setdefault("_float_order_sensitive", {})[name] = row
        else:
            report[name] = row
            if row["hash_match"]:
                n_green += 1
    body = {k: v for k, v in report.items() if not k.startswith("_")}
    red = [k for k, v in body.items() if not v["hash_match"]]
    with open(artifact, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"{n_green}/{len(body)} scale-exact entries green at {sf_dir}"
          + (f"; RED: {red}" if red else ""))
    extra = report.get("_float_order_sensitive", {})
    if extra:
        xg = sum(1 for v in extra.values() if v["hash_match"])
        print(f"float-order-sensitive (excluded from the contract): "
              f"{xg}/{len(extra)} green anyway")
    return 1 if red else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
