#!/usr/bin/env python
"""Train the MDQM9 ambient (T0->T1) cPaiNN model
(reference: python mdqm9/train_ambient.py).

Usage: python scripts/mdqm9_train_ambient.py --preset 00031:300
   or: python scripts/mdqm9_train_ambient.py --config path.json
"""
import argparse
import sys

sys.path.insert(0, ".")

from ti_tpu.config import MDQM9Config, ambient_preset, load_config


def parse(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--preset", default=None, help="mol:leave_out_T, e.g. 00031:300")
    known, rest = ap.parse_known_args(argv)
    overrides = {}
    it = iter(rest)
    for k in it:
        overrides[k.lstrip("-")] = next(it)
    if known.config:
        return load_config(known.config, MDQM9Config, **overrides)
    if known.preset:
        mol, t = known.preset.split(":")
        return ambient_preset(mol, int(t), **overrides)
    cfg = MDQM9Config()
    for k, v in overrides.items():
        cur = getattr(cfg, k)
        setattr(cfg, k, type(cur)(v) if not isinstance(cur, list) else eval(v))
    return cfg


if __name__ == "__main__":
    from ti_tpu.train.ambient import train_ambient

    train_ambient(parse(sys.argv[1:]))
