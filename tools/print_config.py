"""Print the fully-resolved config of a preset (reference tools/print_config.py).

Usage: python tools/print_config.py <preset> [--set k=v ...]
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("preset", nargs="?", default=None)
    p.add_argument("--set", nargs="*", default=[], metavar="K=V")
    p.add_argument("--list", action="store_true", help="list preset names")
    args = p.parse_args()

    from ddp_tpu.config import PRESETS, apply_overrides, get_config

    if args.list or args.preset is None:
        for name in sorted(PRESETS):
            print(name)
        return
    cfg = get_config(args.preset)
    if args.set:
        cfg = apply_overrides(cfg, dict(kv.split("=", 1) for kv in args.set))

    def to_dict(obj):
        if dataclasses.is_dataclass(obj):
            return {f.name: to_dict(getattr(obj, f.name))
                    for f in dataclasses.fields(obj)}
        if isinstance(obj, (list, tuple)):
            return [to_dict(v) for v in obj]
        if isinstance(obj, dict):
            return {k: to_dict(v) for k, v in obj.items()}
        return obj

    print(json.dumps(to_dict(cfg), indent=2, default=str))


if __name__ == "__main__":
    main()
