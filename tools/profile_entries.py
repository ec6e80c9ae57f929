"""Per-entry profiler for the declared-query registry (guide §1).

Times every ``QUERIES[name]`` at a given SF dir through the noop sink
(so the computation is timed, not the sink — guide §1.4), labels each
job (guide §1.5), and captures ``explain("formatted")`` for each entry
into a plans directory so plan-shape claims are auditable offline.

Usage:
    python tools/profile_entries.py [--sf-dir DIR] [--plans-dir DIR]
        [--out JSON] [--runs N] [--only name1,name2] [--skip-plans]

Writes one JSON: {"sf_dir": ..., "entries": {name: {"sec": best,
"runs": [...], "error": ...}}, ordered slowest-first}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab_1806_vec_db_spark.plans.entry_queries import QUERIES  # noqa: E402
from lab_1806_vec_db_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None,
                    help="capture explain('formatted') per entry here")
    ap.add_argument("--plans-suffix", default="before")
    ap.add_argument("--out", default="/tmp/profile_entries.json")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = get_spark("profile_entries")
    only = set(args.only.split(",")) if args.only else None
    results: dict[str, dict] = {}
    names = [n for n in QUERIES if only is None or n in only]
    for i, name in enumerate(names):
        fn = QUERIES[name]
        row: dict = {}
        try:
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            row["build_sec"] = round(time.perf_counter() - t0, 3)
            if args.plans_dir:
                os.makedirs(args.plans_dir, exist_ok=True)
                with open(os.path.join(
                        args.plans_dir, f"{name}_{args.plans_suffix}.txt"),
                        "w") as f:
                    f.write(explain_formatted(df))
            times = []
            for r in range(args.runs):
                spark.sparkContext.setJobDescription(f"profile:{name}#{r}")
                # every run builds its own DataFrame inside the timed
                # window, so run 0 and runs >=1 measure the same work
                # (plan construction + execution) and min(times) is not
                # biased toward a prebuilt-plan run
                t0 = time.perf_counter()
                df2 = fn(spark, args.sf_dir)
                df2.write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            row["runs"] = times
            row["sec"] = min(times)
        except Exception as e:  # noqa: BLE001 — record and continue
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = row
        done = row.get("sec", row.get("error", "?"))
        print(f"[{i + 1}/{len(names)}] {name}: {done}", flush=True)

    ordered = dict(sorted(
        results.items(),
        key=lambda kv: -(kv[1].get("sec") or 0.0)))
    with open(args.out, "w") as f:
        json.dump({"sf_dir": args.sf_dir, "runs": args.runs,
                   "entries": ordered}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
