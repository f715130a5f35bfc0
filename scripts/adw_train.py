#!/usr/bin/env python
"""Train the ADW velocity field (reference entry: python adw/train.py).

Usage: python scripts/adw_train.py [--config path.json] [--key value ...]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

from ti_tpu.config import ADWConfig, load_config


def parse(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    known, rest = ap.parse_known_args(argv)
    overrides = {}
    it = iter(rest)
    for k in it:
        overrides[k.lstrip("-")] = next(it)
    if known.config:
        return load_config(known.config, ADWConfig, **overrides)
    cfg = ADWConfig()
    for k, v in overrides.items():
        cur = getattr(cfg, k)
        setattr(cfg, k, type(cur)(v) if not isinstance(cur, list) else json.loads(v))
    return cfg


if __name__ == "__main__":
    from ti_tpu.train.adw import train_adw

    cfg = parse(sys.argv[1:])
    train_adw(cfg)
