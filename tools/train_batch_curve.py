"""Full train-step batch/microbatch curve on the real chip (VERDICT r5
lever b: apply the b8-cliff program-split lesson to TRAINING).

Times bench.bench_train (window decoder, bf16 policy, 512²) across
per-chip batch sizes and microbatch splits. The r4 published point is
b4 monolithic = 4.76 steps/s (19.0 img/s); the question is whether
smaller live working sets (microbatched chunks under the ~65k-token
cliff) or bigger batches (amortizing fixed cost) raise img/s/chip.

Usage: python tools/train_batch_curve.py [case ...]
  cases: b2 b4 b4mb2 b8mb2 b8mb4 b8 (default: b2 b4mb2 b8mb2)
Writes/merges work_dirs/train_batch_curve.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

CASES = {
    "b1": dict(batch=1),
    "b2": dict(batch=2),
    "b4": dict(batch=4),
    "b4mb2": dict(batch=4, microbatch=2),
    "b8": dict(batch=8),
    "b8mb2": dict(batch=8, microbatch=2),
    "b8mb4": dict(batch=8, microbatch=4),
    "b16mb4": dict(batch=16, microbatch=4),
    # r5 decoder shape probe winner (decoder_microbench: -29% decoder train)
    "b4_w16h4": dict(batch=4, window=16, heads=4),
    "b4mb2_w16h4": dict(batch=4, microbatch=2, window=16, heads=4),
    "b8mb2_w16h4": dict(batch=8, microbatch=2, window=16, heads=4),
    # CE-cost bracket: quarter mode = everything except the full-res loss
    "b4_quarter": dict(batch=4, loss_at="quarter"),
    "b4_quarter_w16h4": dict(batch=4, loss_at="quarter", window=16, heads=4),
}


def main():
    names = sys.argv[1:] or ["b2", "b4mb2", "b8mb2"]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "work_dirs", "train_batch_curve.json")
    out = {}
    if os.path.exists(path):
        out = json.load(open(path))
    import jax

    out["chip"] = jax.devices()[0].device_kind
    for name in names:
        kw = CASES[name]
        print(f"=== {name}: {kw} ===", flush=True)
        try:
            row = bench.bench_train(size=512, attn="window", **kw)
            out[name] = row
            print(json.dumps({name: row}), flush=True)
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name} ERROR: {type(e).__name__}: {e}", flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
