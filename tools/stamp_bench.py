#!/usr/bin/env python3
"""Gate the committed full-precision bench artifact on machine idleness.

Rounds 7-9 each committed a headline number that needed git forensics
to interpret: r8's artifact was recorded under load outright, r9's
before/after loadavg gate passed a run whose MIDDLE ran under an
external spike (the 1-min EMA endpoints structurally cannot see it).
Round 10 closes the hole: graft.Bench now samples NON-SELF CPU
(Δ/proc/stat busy − Δ/proc/self CPU, in cores) inside every query's
timed bracket and records the max as `ext_cpu_max`. This script is the
round-close step: it copies target/bench-full-rNN.json to the repo
root ONLY if the in-run contention evidence is VALID and clean:

  1. ext_cpu_max exists, is non-negative (the -1.0 sentinel means no
     query ran >=1s or /proc sampling failed — no evidence, so no
     stamp), and is below --max-ext cores (no external work competed
     with ANY timed window), AND
  2. ext_cpu_avg, when present, is valid and below --max-ext/3
     (no sustained external CPU across the run).

The before-sample load1 check (--max-load) is ADVISORY ONLY: it
false-positives on 1-min-EMA residue from a just-finished prior run of
our own and false-negatives on mid-run spikes, so it prints a note but
never gates — the in-run samples are strictly better evidence.

On rejection it re-runs the bench once via sbt (disable with
--no-retry) and re-checks the fresh artifact, so an unattended
round-close self-heals from a transient spike.

Usage: python3 tools/stamp_bench.py [round] [--max-load=1.5]
           [--max-ext=1.5] [--no-retry]
"""
import json
import glob
import os
import shutil
import subprocess
import sys


def newest(round_arg):
    if round_arg is not None:
        return f"target/bench-full-r{int(round_arg):02d}.json"
    cands = sorted(glob.glob("target/bench-full-r*.json"))
    return cands[-1] if cands else None


def check(src, max_load, max_ext):
    """Returns None if clean, else a human-readable rejection reason."""
    with open(src) as f:
        j = json.load(f)
    load1 = j.get("load1")
    if not load1 or len(load1) != 2:
        return f"{src} carries no load1 samples"
    # before-sample loadavg is ADVISORY only now: it false-positives on
    # EMA residue from a just-finished prior run of our own (the box is
    # provably idle per the in-run samples), and it false-negatives on
    # mid-run spikes. The in-run non-self-CPU samples are strictly
    # better evidence and carry the gate.
    if load1[0] >= max_load:
        print(f"note: before-sample load1={load1[0]} >= {max_load} — "
              "1-min EMA residue or pre-run load; gating on in-run "
              "samples instead")
    ext = j.get("ext_cpu_max")
    if ext is None:
        return (f"{src} carries no ext_cpu_max — re-run with the r10+ "
                "graft.Bench (in-run sampling)")
    # -1.0 is Bench's explicit NO-EVIDENCE sentinel (no query >=1s, or
    # /proc sampling failed). It must REFUSE, not pass: an artifact with
    # zero valid in-run samples cannot be stamped as provably clean.
    if ext < 0:
        return (f"{src} ext_cpu_max={ext} — no valid in-run samples "
                "(sentinel); cannot certify the run as uncontended")
    if ext >= max_ext:
        worst = sorted(
            ((q, v.get("ext_cpu", -1.0), v.get("sec", 0.0))
             for q, v in j.get("queries", {}).items()
             if isinstance(v, dict)),
            key=lambda t: -t[1])[:5]
        tail = ", ".join(f"{q}={e:.2f}c/{s:.1f}s" for q, e, s in worst)
        return (f"{src} ext_cpu_max={ext} >= {max_ext} — an external "
                f"process competed with a timed window (worst: {tail})")
    # run-wide duration-weighted average: catches a spike that landed
    # only on sub-second queries (excluded from the max for jiffy-noise
    # robustness). Threshold = max_ext / 3: sustained 0.5-core external
    # work inflates a 32-thread suite measurably.
    avg = j.get("ext_cpu_avg")
    if avg is not None and avg < 0:
        return (f"{src} ext_cpu_avg={avg} — no valid in-run samples "
                "(sentinel); cannot certify the run as uncontended")
    if avg is not None and avg >= max_ext / 3:
        return (f"{src} ext_cpu_avg={avg} >= {max_ext / 3:.2f} — "
                "sustained external CPU across the run")
    return None


def rerun(src):
    """Re-run graft.Bench once so the same round artifact is refreshed."""
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = src.rsplit("-r", 1)[1].split(".")[0]
    env["SPARK_GRAFT_ROUND"] = str(int(rnd))
    print(f"retrying: sbt runMain graft.Bench (round {int(rnd)}) ...")
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env)
    return r.returncode == 0


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_load, max_ext, retry = 1.5, 1.5, True
    for a in sys.argv[1:]:
        if a.startswith("--max-load"):
            max_load = float(a.split("=", 1)[1])
        elif a.startswith("--max-ext"):
            max_ext = float(a.split("=", 1)[1])
        elif a == "--no-retry":
            retry = False
    src = newest(args[0] if args else None)
    if not src or not os.path.exists(src):
        print("no target/bench-full-r*.json found — run graft.Bench first")
        return 1
    reason = check(src, max_load, max_ext)
    if reason and retry:
        print(f"REFUSED (will retry once): {reason}")
        if not rerun(src):
            print("retry run failed; not stamped")
            return 1
        reason = check(src, max_load, max_ext)
    if reason:
        print(f"REFUSED: {reason}")
        return 1
    with open(src) as f:
        j = json.load(f)
    dst = src.split("/")[-1]
    shutil.copy(src, dst)
    qs = j.get("queries", {})
    total = sum(v.get("sec", 0.0) for v in qs.values()) \
        if qs and isinstance(next(iter(qs.values())), dict) \
        else sum(qs.values())
    print(f"stamped {dst} (load1={j['load1']}, "
          f"ext_cpu_max={j.get('ext_cpu_max')}, n={len(qs)}, "
          f"total={total:.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
