"""Canary-gated matched-scale grid (VERDICT r12 item 4).

Round 12 had no committed artifact demonstrating the within-2×-of-
baseline bar at N=10k: the committed grid ran on a host measured at
0.37× reference all-core speed, so its raw ratios were ~2.7× inflated
and the ≈0.97× normalized median was inference, not evidence. This
tool runs the SAME matched grid bench.py runs (run_matched), but in a
retry loop that only ACCEPTS a window proven quiet by the calibration
pair now embedded in the grid block (host_over_ref_all ≥ 0.8 at both
ends, end/start drift within 1.1). Each attempt is a fresh JVM — the
round-11 audit showed a JVM that had just built other tiers inflates
Spark-job rows.

Usage:
  python tools/matched_quiet_grid.py [out.json]           # the loop
  python tools/matched_quiet_grid.py --once attempt.json  # one attempt

Env: MATCHED_QUIET_ATTEMPTS (default 6), MATCHED_QUIET_SLEEP (default
120 s between attempts — throttle windows on this box last minutes),
plus bench.py's own knobs (BENCH_MATCHED_N etc.).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _once(dst: str) -> None:
    from bench import run_matched
    from lab_1806_vec_db_spark import get_spark

    spark = get_spark("matched_quiet", cpus=32)
    out = run_matched(spark)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out.get(k) for k in (
        "median_ratio_vs_baseline", "median_ratio_at_matched_recall",
        "host_over_ref_all_start", "host_over_ref_all_end",
        "window_quiet")}), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--once":
        _once(sys.argv[2])
        return
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/matched_quiet_grid.json"
    attempts = int(os.environ.get("MATCHED_QUIET_ATTEMPTS", "6"))
    sleep_s = float(os.environ.get("MATCHED_QUIET_SLEEP", "120"))
    best = None  # fallback: the attempt with the quietest window
    for i in range(attempts):
        tmp = f"{dst}.attempt{i}"
        rc = subprocess.call([sys.executable, os.path.abspath(__file__),
                              "--once", tmp])
        if rc != 0:
            print(f"attempt {i}: rc={rc}", flush=True)
            continue
        with open(tmp) as f:
            out = json.load(f)
        out["attempt"] = i
        quiet = out.get("window_quiet")
        print(f"attempt {i}: quiet={quiet} "
              f"start={out.get('host_over_ref_all_start')} "
              f"end={out.get('host_over_ref_all_end')}", flush=True)
        score = min(out.get("host_over_ref_all_start", 0.0),
                    out.get("host_over_ref_all_end", 0.0))
        if best is None or score > best[0]:
            best = (score, out)
        if quiet:
            break
        if i + 1 < attempts:
            time.sleep(sleep_s)
    if best is None:
        sys.exit("no attempt completed")
    with open(dst, "w") as f:
        json.dump(best[1], f, indent=1)
    print("wrote", dst, "window_quiet =", best[1].get("window_quiet"))


if __name__ == "__main__":
    main()
