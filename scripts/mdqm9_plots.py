#!/usr/bin/env python
"""Render the paper figures from results arrays (reference:
mdqm9/plots/*.ipynb — marginal histograms with reweighting and the TICA
projection). The notebooks become a CLI over the artifact pipeline:

  python scripts/mdqm9_results.py ... --out results --tag run     # arrays
  python scripts/mdqm9_plots.py --results_dir results --tag run \
      [--ref_tag md]            # MD-reference arrays under the same dir
      [--data_dir out --energy_dir energies]   # -> reweighting weights
      [--lag 10] [--out figures]

Writes torsions/bond_angles/bond_lengths marginal grids (PNG) and, when a
reference ensemble is given, the MD-vs-generated TICA plane.
"""
import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from ti_tpu.analysis.plots import plot_marginals, plot_tica
from ti_tpu.analysis.weights import calc_ti_weights, weights_filter_iqr


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results_dir", required=True,
                    help="dir with torsions_/bond_angles_/bond_lengths_<tag>.npy")
    ap.add_argument("--tag", required=True, help="generated-ensemble tag")
    ap.add_argument("--ref_tag", default=None,
                    help="reference (MD) ensemble tag in the same results_dir")
    ap.add_argument("--data_dir", default=None,
                    help="sampling artifacts dir (dlogps_<tag>.npy) for weights")
    ap.add_argument("--energy_dir", default=None,
                    help="energy artifacts dir (E0s_/E1s_<tag>.npy) for weights")
    ap.add_argument("--lag", type=int, default=10, help="TICA lag (frames)")
    ap.add_argument("--out", default="figures")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)

    def arr(dirname, name, tag, required=True):
        p = os.path.join(dirname, f"{name}_{tag}.npy")
        if not os.path.exists(p):
            if required:
                raise FileNotFoundError(p)
            return None
        return np.load(p)

    weights = None
    if args.data_dir and args.energy_dir:
        dlogps = arr(args.data_dir, "dlogps", args.tag)
        e0 = arr(args.energy_dir, "E0s", args.tag)
        e1 = arr(args.energy_dir, "E1s", args.tag)
        w = calc_ti_weights(e0, e1, dlogps)
        keep = weights_filter_iqr(w)  # boolean IQR mask over the weights
        weights = np.where(keep, w, 0.0)
        print(f"reweighting with {np.count_nonzero(keep)} / {len(w)} "
              "IQR-kept weights")

    written = []
    loaded = {}
    for kind in ("torsions", "bond_angles", "bond_lengths"):
        gen = loaded[kind, args.tag] = arr(args.results_dir, kind, args.tag)
        ref = loaded[kind, args.ref_tag] = (
            arr(args.results_dir, kind, args.ref_tag, required=False)
            if args.ref_tag else None
        )
        out_path = os.path.join(args.out, f"{kind}_{args.tag}.png")
        plot_marginals(
            gen, reference=ref, weights=weights,
            kind="torsion" if kind == "torsions" else kind,
            out_path=out_path,
        )
        written.append(out_path)

    md_t = loaded.get(("torsions", args.ref_tag)) if args.ref_tag else None
    if md_t is not None:
        out_path = os.path.join(args.out, f"tica_{args.tag}.png")
        plot_tica(md_t, loaded["torsions", args.tag], lag=args.lag, out_path=out_path)
        written.append(out_path)

    for p in written:
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
