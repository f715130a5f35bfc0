#!/usr/bin/env python
"""ADW kinetics figure: λ₂ vs β with bootstrap CIs, TI-reweighted vs the
direct Boltzmann-reweighting baseline (the reference's ADW results figure;
consumes the npz written by scripts/adw_reweight_gedmd.py).

Usage:
  python scripts/adw_plots.py --reweighted gedmd.npz [--direct gedmd_direct.npz]
      [--ev_index 2] [--out adw_lambda2.png]
"""
import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reweighted", required=True, help="adw_reweight_gedmd.py npz")
    ap.add_argument("--direct", default=None, help="--direct baseline npz")
    ap.add_argument("--ev_index", type=int, default=2,
                    help="eigenvalue index (2 = lambda_2 in the nev=4 layout)")
    ap.add_argument("--out", default="adw_lambda2.png")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(4.2, 3.2))

    def draw(path, label, color, offset):
        d = np.load(path)
        betas = d["betas"] + offset
        i = args.ev_index
        mean = d["eigenvalues_mean"][:, i]
        lo, hi = d["lower"][:, i], d["upper"][:, i]
        ax.errorbar(
            betas, mean, yerr=[mean - lo, hi - mean], fmt="o-", ms=4,
            capsize=3, lw=1.2, label=label, color=color,
        )

    draw(args.reweighted, "TI reweighted", "C0", 0.0)
    if args.direct:
        draw(args.direct, "direct Boltzmann", "C1", 0.01)
    ax.set_xlabel(r"target $\beta$")
    ax.set_ylabel(rf"$-\lambda_{args.ev_index}$ (decay rate)")
    ax.set_yscale("log")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
