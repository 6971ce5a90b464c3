"""Training-log analyzer — reference tools/analyze_logs.py equivalent.

Reads a workdir's train_log.jsonl and prints per-key statistics, slowest
iterations, and average training speed.

Usage: python tools/analyze_logs.py <workdir or log.jsonl> [--keys loss ...]
"""
import argparse
import json
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--keys", nargs="*", default=None)
    p.add_argument("--interval", type=int, default=1,
                   help="subsample records for the curve printout")
    args = p.parse_args()

    path = args.path
    if os.path.isdir(path):
        path = os.path.join(path, "train_log.jsonl")
    recs = [json.loads(l) for l in open(path) if l.strip()]
    if not recs:
        print("empty log")
        return
    keys = args.keys or [k for k in recs[-1] if k not in ("step",)]

    steps = [r["step"] for r in recs]
    print(f"{len(recs)} records, steps {steps[0]}..{steps[-1]}")
    if "steps_per_s" in recs[-1]:
        sps = [r["steps_per_s"] for r in recs if "steps_per_s" in r][1:]
        if sps:
            avg = sum(sps) / len(sps)
            print(f"avg speed: {avg:.3f} steps/s "
                  f"(min {min(sps):.3f}, max {max(sps):.3f})")
    for k in keys:
        vals = [(r["step"], r[k]) for r in recs if k in r]
        if not vals:
            continue
        vs = [v for _, v in vals]
        best_step, best = min(vals, key=lambda t: t[1])
        print(f"{k:>24}: first {vs[0]:.5g}  last {vs[-1]:.5g}  "
              f"min {best:.5g}@{best_step}  max {max(vs):.5g}")


if __name__ == "__main__":
    main()
