#!/usr/bin/env python
"""Train the MDQM9 latent Boltzmann generator
(reference: python mdqm9/train_latent.py)."""
import argparse
import sys

sys.path.insert(0, ".")

from ti_tpu.config import MDQM9Config, latent_preset, load_config


def parse(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--preset", default=None, help="mol[:T], e.g. 00031 or 00031:800")
    known, rest = ap.parse_known_args(argv)
    overrides = {}
    it = iter(rest)
    for k in it:
        overrides[k.lstrip("-")] = next(it)
    if known.config:
        return load_config(known.config, MDQM9Config, **overrides)
    if known.preset:
        parts = known.preset.split(":")
        Ts = [int(parts[1])] if len(parts) > 1 else None
        return latent_preset(parts[0], Ts=Ts, **overrides)
    cfg = MDQM9Config()
    for k, v in overrides.items():
        cur = getattr(cfg, k)
        setattr(cfg, k, type(cur)(v) if not isinstance(cur, list) else eval(v))
    return cfg


if __name__ == "__main__":
    from ti_tpu.train.latent import train_latent

    train_latent(parse(sys.argv[1:]))
