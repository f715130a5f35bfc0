#!/usr/bin/env python
"""MDQM9 results report (reference: mdqm9/analysis/results_00031.py).

Consumes the sampling artifacts (samples/dlogps/latent_*) and the
energy-stage artifacts (E0s/E1s) and writes the ESS/dF/marginal arrays.

Usage:
  python scripts/mdqm9_results.py --sdf data/mols/mdqm9.sdf --mol_index 31 \
      --data_dir generated_data/ambient --tag 00031_no_300_1000to300K \
      [--energy_dir energies/] [--k 100] [--out results/]
"""
import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from ti_tpu.analysis.results import generate_report
from ti_tpu.data.sdf import parse_sdf_v2000

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sdf", required=True)
    ap.add_argument("--mol_index", type=int, required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--energy_dir", default=None)
    ap.add_argument("--k", type=float, default=100.0)
    ap.add_argument("--n_bootstrap", type=int, default=1000)
    ap.add_argument("--out", default="results")
    args = ap.parse_args()

    mol = parse_sdf_v2000(args.sdf, args.mol_index)
    adjacency = mol.adjacency() | mol.adjacency().T

    samples = np.load(os.path.join(args.data_dir, f"samples_{args.tag}.npy"))
    final = samples[:, -1] if samples.ndim == 4 else samples
    dlogps = np.load(os.path.join(args.data_dir, f"dlogps_{args.tag}.npy"))

    def opt(name):
        p = os.path.join(args.data_dir, f"{name}_{args.tag}.npy")
        return np.load(p) if os.path.exists(p) else None

    latent_z = opt("latent_noises")
    latent_dlogps = opt("latent_dlogps")

    E0s = E1s = None
    if args.energy_dir:
        E0s = np.load(os.path.join(args.energy_dir, f"E0s_{args.tag}.npy"))
        E1s = np.load(os.path.join(args.energy_dir, f"E1s_{args.tag}.npy"))

    report = generate_report(
        adjacency, final,
        # the saved dlogps array IS the analysis layer's neg_dlogps — the
        # reference loads it unmodified (results_00031.py:180-190)
        neg_dlogps_ti=dlogps,
        E0s=E0s, E1s=E1s,
        latent_z=latent_z,
        neg_dlogps_bg=latent_dlogps,
        k=args.k, n_bootstrap=args.n_bootstrap,
        save_path=args.out, tag=args.tag,
    )
    for name in ("dF_tfep_md_ti", "ess_md_ti", "ess_bg_ti"):
        if name in report:
            val, (lo, hi) = report[name]
            print(f"{name}: {val:.4f} [{lo:.4f}, {hi:.4f}]")
    print(f"saved arrays under {args.out}/")
