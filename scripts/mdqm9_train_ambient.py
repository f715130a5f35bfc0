#!/usr/bin/env python
"""Train the MDQM9 ambient (T0->T1) cPaiNN model
(reference: python mdqm9/train_ambient.py).

Usage: python scripts/mdqm9_train_ambient.py --preset 00031:300
   or: python scripts/mdqm9_train_ambient.py --config path.json
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

from ti_tpu.config import MDQM9Config, ambient_preset, fast_profile, load_config


def parse(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--preset", default=None, help="mol:leave_out_T, e.g. 00031:300")
    ap.add_argument("--fast_profile", action="store_true",
                    help="apply the physics-qualified throughput profile "
                         "(rk4 + GL-8 dlogp, bf16_agg, hutchinson with the "
                         "scale-qualified probe count — config.fast_profile)")
    known, rest = ap.parse_known_args(argv)
    overrides = {}
    it = iter(rest)
    for k in it:
        overrides[k.lstrip("-")] = next(it)
    if known.config:
        cfg = load_config(known.config, MDQM9Config, **overrides)
    elif known.preset:
        mol, t = known.preset.split(":")
        cfg = ambient_preset(mol, int(t), **overrides)
    else:
        cfg = MDQM9Config()
        for k, v in overrides.items():
            cur = getattr(cfg, k)
            setattr(cfg, k, type(cur)(v) if not isinstance(cur, list) else json.loads(v))
    if known.fast_profile:
        # explicit flags already applied above stay (re-passed as overrides)
        cfg = fast_profile(cfg, **{
            k: getattr(cfg, k) for k in overrides if hasattr(cfg, k)
        })
    return cfg


if __name__ == "__main__":
    from ti_tpu.train.ambient import train_ambient

    train_ambient(parse(sys.argv[1:]))
