"""SEIRD ex1a warm-process wall series (VERDICT r4 next #9).

Runs `gpboi seird 90 90 0.10 360 --ndraws 600` N times, each in a fresh
process (the deployment-relevant regime: all persistent caches warm),
serialized, and reports the full wall distribution plus the per-stage
breakdown parsed from each run's stdout. The round-4 claim quoted the
minimum of 8 walls because the loopback TPU relay stalls fresh
processes for minutes at connect time (docs/tunnel_variance.md); the
round-5 goal is a beat at the MEDIAN after the data-gen fix
(host-NumPy draws) and stage trims.

Usage: python scripts/seird_wall_series.py [--runs 8] [--out /tmp/x.json]
"""

import argparse
import json
import re
import statistics
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--out", default="/tmp/seird_wall_series.json")
    args = ap.parse_args()

    stage_pat = re.compile(r"done in ([0-9.]+) s")
    rows = []
    for i in range(args.runs):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "gp_bayesopinf_tpu.pipeline.cli",
             "seird", "90", "90", "0.10", "360",
             "--ndraws", "600", "--noopen", "--nolog"],
            capture_output=True, text=True, timeout=3600,
        )
        wall = time.time() - t0
        stages = [float(m) for m in stage_pat.findall(proc.stdout)]
        row = {
            "run": i,
            "wall_s": round(wall, 1),
            "rc": proc.returncode,
            "stage_walls": stages,
            "stage_total": round(sum(stages), 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if proc.returncode:
            print(proc.stderr[-2000:], file=sys.stderr)

    walls = [r["wall_s"] for r in rows if r["rc"] == 0]
    stot = [r["stage_total"] for r in rows if r["rc"] == 0]
    summary = {
        "runs_ok": len(walls),
        "wall_min": min(walls),
        "wall_median": statistics.median(walls),
        "wall_max": max(walls),
        "stage_total_median": statistics.median(stot),
        "cpu_baseline_s": 41.2,  # scripts/cpu_baselines.py, BASELINE.md
    }
    print("\n== summary ==")
    print(json.dumps(summary))
    with open(args.out, "w") as fh:
        json.dump({"rows": rows, "summary": summary}, fh, indent=1)


if __name__ == "__main__":
    sys.exit(main())
