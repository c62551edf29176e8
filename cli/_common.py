"""Shared CLI plumbing.

The reference's "CLI" is a hand-edited config dict per entry script
(README.md:28,43).  These scripts keep that shape — a `config` dict in
main() with `# edit` comments — but also accept `--config some.json`
(merged over the defaults) and `--set key=value` overrides, so runs are
scriptable without editing source.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_yolov3_tpu.config import Config  # noqa: E402
from bayesian_yolov3_tpu.utils import setup_logging  # noqa: E402, F401


def parse_value(raw: str):
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def build_config(defaults: dict, argv=None) -> Config:
    p = argparse.ArgumentParser()
    p.add_argument("--config", help="JSON file merged over the script defaults")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override a single config key (dotted keys allowed)")
    args, _ = p.parse_known_args(argv)
    merged = dict(defaults)
    if args.config:
        with open(args.config) as f:
            merged.update(json.load(f))
    for kv in args.set:
        key, _, raw = kv.partition("=")
        target = merged
        parts = key.split(".")
        for part in parts[:-1]:
            target = target.setdefault(part, {})
        target[parts[-1]] = parse_value(raw)
    return Config.from_dict(merged)
