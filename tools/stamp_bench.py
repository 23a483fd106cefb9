#!/usr/bin/env python3
"""Gate the committed full-precision bench artifact on machine idleness.

Round 8's committed bench-full-r08.json was itself recorded under load
(its own "load1":[2.88,4.03] says so) — the numbers were contention-
tainted even though the self-documentation caught it. This script is
the round-close step: it copies target/bench-full-rNN.json to the repo
root ONLY if the run's own load1 samples (before AND after) are below
the threshold, so the round's committed record is always a clean run.

Usage: python3 tools/stamp_bench.py [round] [--max-load 1.5]
"""
import json
import glob
import shutil
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_load = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--max-load"):
            max_load = float(a.split("=", 1)[1])
    if args:
        src = f"target/bench-full-r{int(args[0]):02d}.json"
    else:
        cands = sorted(glob.glob("target/bench-full-r*.json"))
        if not cands:
            print("no target/bench-full-r*.json found — run graft.Bench first")
            return 1
        src = cands[-1]
    with open(src) as f:
        j = json.load(f)
    load1 = j.get("load1")
    if not load1 or len(load1) != 2:
        print(f"REFUSED: {src} carries no load1 samples")
        return 1
    # gate on the BEFORE sample only: it is taken before the Spark
    # session exists, so it measures external contention; the after
    # sample necessarily includes the bench's own 32 threads (a fully
    # self-loaded run on an idle box reads ~[0.2, 4-6])
    if load1[0] >= max_load:
        print(f"REFUSED: {src} load1={load1} (before-sample >= {max_load})"
              " — the box was not idle; re-run the bench on an idle window")
        return 1
    dst = src.split("/")[-1]
    shutil.copy(src, dst)
    qs = j.get("queries", {})
    total = sum(v.get("sec", 0.0) for v in qs.values()) \
        if qs and isinstance(next(iter(qs.values())), dict) \
        else sum(qs.values())
    print(f"stamped {dst} (load1={load1}, n={len(qs)}, "
          f"total={total:.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
