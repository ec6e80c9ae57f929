"""Interleaved fresh-JVM A/B of ONE sf-suite bench row against an
arbitrary commit's worktree (VERDICT r13 item 1: re-adjudicate
ivf_probe50pct vs the round-12 code on a calibrated window).

Reuses bench.py's committed leg runner (`_ab_leg` — this harness is
copied into the other worktree so both legs share the timing loop) and
embeds start/end host calibration so the window quality is part of the
artifact.

Usage:
    python tools/ab_row_vs_commit.py --row ivf_probe50pct \
        --commit 6932a6b [--pairs 3] [--leg-runs 2] [--out docs/X.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REF_ALL = bench._REF_STAMP["sort1m_per_sec_all"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", required=True)
    ap.add_argument("--commit", required=True)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--leg-runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--label", default=None)
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cal_start = bench.host_calibration()
    wt = tempfile.mkdtemp(prefix="ab_row_wt_")
    legs: dict = {"prev": [], "head": []}
    try:
        subprocess.run(
            ["git", "worktree", "add", "--force", "--detach", wt, args.commit],
            cwd=here, check=True, capture_output=True, timeout=120,
        )
        shutil.copy2(os.path.join(here, "bench.py"), os.path.join(wt, "bench.py"))
        for _ in range(args.pairs):
            for side, repo in (("prev", wt), ("head", here)):
                t = bench._ab_leg(repo, args.row, args.leg_runs)
                print(f"leg {side}: {t}", flush=True)
                if t is not None:
                    legs[side].append(t)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=here, capture_output=True, timeout=120)
        shutil.rmtree(wt, ignore_errors=True)
    cal_end = bench.host_calibration()
    prev_best = min(legs["prev"]) if legs["prev"] else None
    head_best = min(legs["head"]) if legs["head"] else None
    ratio = (head_best / prev_best) if prev_best and head_best else None
    s = cal_start["sort1m_per_sec_all"] / REF_ALL
    e = cal_end["sort1m_per_sec_all"] / REF_ALL
    out = {
        "row": args.row,
        "vs_commit": args.commit,
        "label": args.label,
        "pairs": args.pairs,
        "leg_runs": args.leg_runs,
        "legs": legs,
        "prev_best": prev_best,
        "head_best": head_best,
        "ab_ratio": round(ratio, 3) if ratio else None,
        "verdict": bench._ab_verdict(ratio) if ratio else "ab_failed",
        "calibration_start": cal_start,
        "calibration_end": cal_end,
        "host_over_ref_all_start": round(s, 4),
        "host_over_ref_all_end": round(e, 4),
        "window_quiet": bool(min(s, e) >= 0.7
                             and max(s, e) / max(min(s, e), 1e-9) <= 1.1),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
