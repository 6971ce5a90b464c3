"""Bisect the msda train-step TPU-worker crash (VERDICT r3 missing #1).

Round-3 finding: compiling the remat'd msda (window-gather) train backward
reproducibly crashes the v5e TPU worker (libtpu fault at compile, not OOM),
so the reference's default decoder could not take a single optimizer step on
the target chip.

Each candidate config runs in its OWN subprocess on the real TPU so a worker
crash is contained and recorded instead of killing the harness. Candidates
bisect along three axes:
  impl   — window (single 2x2-block lax.gather) vs xla (4 corner
           take_along_axis gathers): isolates whether the vmap'd
           lax.gather's backward (scatter) is the faulting op
  remat  — per-layer jax.checkpoint on vs off: isolates the
           remat-recompute interaction
  batch  — 1/2/4: isolates size thresholds (un-remat'd b4 needs ~41G so
           only b1 is attempted un-remat'd)

Usage: python tools/bisect_msda_train.py [--quick] [--out msda_train_notes]
Writes ddp_tpu/ops/pallas/msda_train_notes.md + a JSON table.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER_CODE = r"""
import json, os, sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "@REPO@")
import bench

impl = os.environ.get("DDP_MSDA_IMPL", "auto")
batch = int(os.environ["BISECT_BATCH"])
remat = os.environ["BISECT_REMAT"] == "1"
size = int(os.environ.get("BISECT_SIZE", "512"))

raw_step, state, batch_dev = bench._build_train(size, batch, "msda", remat)

@jax.jit
def train_n(state, batch, n):
    def body(i, st):
        st2, _ = raw_step(st, batch)
        return st2
    st = jax.lax.fori_loop(0, n, body, state)
    return jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), st.params,
        jnp.float32(0))

t0 = time.perf_counter()
c = float(train_n(state, batch_dev, 1))
compile_s = time.perf_counter() - t0
t0 = time.perf_counter(); float(train_n(state, batch_dev, 2))
t_small = time.perf_counter() - t0
t0 = time.perf_counter(); float(train_n(state, batch_dev, 5))
t_big = time.perf_counter() - t0
per = max((t_big - t_small) / 3, 1e-9)
print("RESULT " + json.dumps(dict(
    ok=True, compile_s=round(compile_s, 1),
    steps_per_s=round(1.0 / per, 4), checksum_finite=c == c)))
"""


def run_case(impl, batch, remat, size=512, timeout=2400):
    env = dict(os.environ)
    env.update({"DDP_MSDA_IMPL": impl, "BISECT_BATCH": str(batch),
                "BISECT_REMAT": "1" if remat else "0",
                "BISECT_SIZE": str(size)})
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, "-u", "-c", WORKER_CODE.replace("@REPO@", REPO)],
            capture_output=True, text=True, timeout=timeout, cwd=REPO,
            env=env)
    except subprocess.TimeoutExpired:
        return {"ok": False, "fail": "timeout", "wall_s": round(timeout, 0)}
    wall = round(time.perf_counter() - t0, 1)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["wall_s"] = wall
            return r
    tail = (out.stderr or out.stdout).strip().splitlines()[-8:]
    return {"ok": False, "fail": f"rc={out.returncode}", "wall_s": wall,
            "tail": tail}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="run the minimal 4-case matrix")
    p.add_argument("--cases", nargs="*", default=None,
                   help="explicit impl:batch:remat triples")
    args = p.parse_args()

    if args.cases:
        cases = []
        for c in args.cases:
            impl, b, r = c.split(":")
            cases.append((impl, int(b), r == "1"))
    elif args.quick:
        cases = [("window", 2, True), ("xla", 2, True)]
    else:
        cases = [
            ("window", 2, True),   # r3 crash repro
            ("xla", 2, True),      # different gather formulation
            ("window", 1, False),  # no remat at all
            ("xla", 4, True),      # the bench target batch
            ("window", 4, True),
        ]

    results = {}
    for impl, batch, remat in cases:
        key = f"{impl}_b{batch}_remat{int(remat)}"
        print(f"=== {key} ===", flush=True)
        r = run_case(impl, batch, remat)
        results[key] = {"impl": impl, "batch": batch, "remat": remat, **r}
        print(json.dumps(results[key]), flush=True)
        # give a crashed worker time to restart before the next case
        if not r.get("ok"):
            time.sleep(30)

    out_json = os.path.join(REPO, "ddp_tpu", "ops", "pallas",
                            "msda_train_bisect.json")
    json.dump(results, open(out_json, "w"), indent=1)
    print(f"wrote {out_json}", flush=True)


if __name__ == "__main__":
    main()
