#!/usr/bin/env python
"""Train the MDQM9 latent Boltzmann generator
(reference: python mdqm9/train_latent.py)."""
import argparse
import json
import sys

sys.path.insert(0, ".")

from ti_tpu.config import MDQM9Config, fast_profile, latent_preset, load_config


def parse(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--preset", default=None, help="mol[:T], e.g. 00031 or 00031:800")
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
        parts = known.preset.split(":")
        Ts = [int(parts[1])] if len(parts) > 1 else None
        cfg = latent_preset(parts[0], Ts=Ts, **overrides)
    else:
        cfg = MDQM9Config()
        for k, v in overrides.items():
            cur = getattr(cfg, k)
            setattr(cfg, k, type(cur)(v) if not isinstance(cur, list) else json.loads(v))
    if known.fast_profile:
        cfg = fast_profile(cfg, family="latent", **{
            k: getattr(cfg, k) for k in overrides if hasattr(cfg, k)
        })
    return cfg


if __name__ == "__main__":
    from ti_tpu.train.latent import train_latent

    train_latent(parse(sys.argv[1:]))
