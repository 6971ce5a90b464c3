"""Publish a checkpoint — reference tools/publish_model.py equivalent.

Strips a training checkpoint to inference params only (drops optimizer
state / rng), saves one msgpack file, and appends the first 8 hex chars of
its sha256 to the filename (the reference's convention).

Usage: python tools/publish_model.py <workdir> <out_prefix> [--step N]
"""
import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("workdir")
    p.add_argument("out_prefix")
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from flax.serialization import msgpack_serialize

    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(args.workdir, "ckpts"))
    mgr = ocp.CheckpointManager(ckpt_dir)
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        sys.exit(f"no checkpoint under {ckpt_dir}")
    restored = mgr.restore(step, args=ocp.args.Composite(
        state=ocp.args.StandardRestore()))
    state = restored["state"]
    publish = {"params": state["params"]}
    if state.get("batch_stats"):
        publish["batch_stats"] = state["batch_stats"]
    blob = msgpack_serialize(publish)
    digest = hashlib.sha256(blob).hexdigest()[:8]
    out = f"{args.out_prefix}-{digest}.msgpack"
    with open(out, "wb") as f:
        f.write(blob)
    print(f"published step {step} -> {out} ({len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
