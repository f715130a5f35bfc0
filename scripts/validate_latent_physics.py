#!/usr/bin/env python
"""Latent (Boltzmann-generator) end-to-end physics validation.

Synthetic frames are exact Boltzmann samples of an isotropic harmonic well
CENTERED AT THE ORIGIN (u = |center(x)|^2 / (2 sigma_T^2), sigma_T =
jitter*sqrt(T/300), COM-projected), so the BG absolute free energy is
closed-form. The potential must be ROTATION-INVARIANT: cPaiNN is
SE(3)-equivariant, so the ODE from isotropic noise can only generate
rotation-invariant densities — exactly like the reference, whose BG
weights use rotation-invariant GAFF energies (mdqm9/analysis/utils/
ess.py:13-23). A fixed-orientation target is unlearnable BY SYMMETRY
(verified: training plateaus and ESS collapses). With z ~ N(0, I) COM-projected (3(N-1) effective
dims) transported to x by the learned ODE with dlogp, the generator
density is log q(x) = log p_z(z) + dlogp and the importance weight
w = exp(-u(x))/q(x) satisfies E_q[w] = Z = (2 pi sigma_T^2)^{3(N-1)/2}
EXACTLY, regardless of generator quality (only the variance depends on
it). This script trains the REAL latent stack (train_latent +
sample_latent, reference mdqm9/train_latent.py + sample_latent.py) at
TPU-sized capacity and prints the oracle comparison as one JSON line; the
pytest variant (tests/test_mdqm9_physics.py::test_latent_bg_*) runs a
CPU-sized version.

Usage: python scripts/validate_latent_physics.py [--epochs 400]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--atoms", type=int, default=4)
    ap.add_argument("--jitter", type=float, default=0.25)
    ap.add_argument("--T", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--t_distr", default="uniform")
    ap.add_argument("--n_gen", type=int, default=2048)
    ap.add_argument("--align", type=int, default=1)
    ap.add_argument("--out_dir", default="/tmp/latent_physics")
    ap.add_argument("--n_steps", type=int, default=64,
                    help="rk4 trajectory steps for the generator transport")
    ap.add_argument("--compute_dtype", choices=["f32", "bf16", "bf16_agg"],
                    default="f32",
                    help="sampling-path compute dtype (the latent fast "
                         "profile is rk4-64 + bf16, CLAUDE.md)")
    ap.add_argument("--quad_dlogp", action="store_true",
                    help="Gauss-Legendre quadrature-decoupled dlogp instead "
                         "of the stage-coupled exact dlogp (the bench path; "
                         "REQUIRED at 10506 capacity — stage-coupled exact "
                         "at F=256/29 atoms exceeds the tunnel dispatch "
                         "deadline and HBM)")
    ap.add_argument("--gl_points", type=int, default=8)
    ap.add_argument("--divergence", choices=["exact", "hutchinson"],
                    default="exact")
    ap.add_argument("--num_probes", type=int, default=16)
    ap.add_argument("--probe_mode", choices=["rademacher", "orthogonal"],
                    default="rademacher")
    ap.add_argument("--sample_batch", type=int, default=512,
                    help="generator chain batch (HBM bound: lower at "
                         "F=256 / 29 atoms with exact divergence)")
    ap.add_argument("--reuse", action="store_true",
                    help="reload out_dir/oracle_params from a previous run "
                         "instead of retraining (profile studies on the "
                         "same trained generator)")
    ap.add_argument("--train_impl", choices=["edge", "dense"], default="edge",
                    help="training forward impl (dense+bf16_agg is the "
                         "qualified fast training profile, BASELINE.md — "
                         "the BG partition identity holds regardless of "
                         "generator quality, so the training profile "
                         "cannot bias the oracle, only the ESS)")
    ap.add_argument("--train_compute_dtype",
                    choices=["f32", "bf16", "bf16_agg"], default="f32")
    args = ap.parse_args(argv)

    from ti_tpu.config import MDQM9Config
    from ti_tpu.data.mdqm9 import MDQM9LatentDataset, make_synthetic_molecule
    from ti_tpu.sampling.drivers import sample_latent
    from ti_tpu.train.latent import train_latent

    T, N = args.T, args.atoms
    sigma = args.jitter * np.sqrt(T / 300.0)
    d_eff = 3 * (N - 1)

    mol = make_synthetic_molecule(n_atoms=N, seed=0)
    rng = np.random.default_rng(7)
    frames = sigma * rng.standard_normal((args.frames, N, 3)).astype(np.float32)
    frames -= frames.mean(axis=1, keepdims=True)

    cfg = MDQM9Config(
        n_features=args.features, score_layers=args.layers, batch_size=args.batch,
        n_epochs=args.epochs, learning_rate=args.lr, t_distr=args.t_distr,
        scale_trajs=False, T=[T], sampling_T=T,
        solver_type="rk4", n_steps=args.n_steps, return_dlogp=True,
        divergence=args.divergence, num_probes=args.num_probes,
        probe_mode=args.probe_mode,
        train_impl=args.train_impl,
        train_compute_dtype=args.train_compute_dtype,
        compute_dtype=args.compute_dtype,
        dlogp_quad_points=args.gl_points if args.quad_dlogp else 0,
        dlogp_quad="gauss",
        steps_per_dispatch=16,
        model_save_path=f"{args.out_dir}/models", data_save_path=f"{args.out_dir}/out",
        use_wandb=False,
    )
    ds = MDQM9LatentDataset.from_arrays(
        frames, np.full(len(frames), float(T)), mol, t_cond=0, align=bool(args.align)
    )

    import os

    from ti_tpu.train import common as train_common
    from ti_tpu.train.latent import build_latent_model

    params_path = os.path.join(args.out_dir, "oracle_params")
    if args.reuse and os.path.exists(params_path):
        print(f"reusing trained params from {params_path}", file=sys.stderr)
        model = build_latent_model(cfg)
        # cross-backend restores are handled inside load_checkpoint
        params = train_common.load_checkpoint(params_path)["params"]
        res = {"model": model, "params": params, "template": ds.template}
    else:
        res = train_latent(cfg, ds)
        print("final train losses:",
              [f"{x:.3f}" for x in res["history"]["train_loss"][-3:]],
              file=sys.stderr)
        train_common.save_checkpoint(params_path, {"params": res["params"]})

    out = sample_latent(
        cfg, res["model"], res["params"], res["template"],
        n_samples=args.n_gen, save=False,
        batch_size=min(args.n_gen, args.sample_batch),
    )
    z = out["samples"][:, 0]
    x = out["samples"][:, -1]
    dlogp = out["dlogps"]

    xc = x - x.mean(axis=1, keepdims=True)
    width = float(np.sqrt(np.sum(xc ** 2, axis=(1, 2)).mean() / d_eff))

    u = np.sum(xc ** 2, axis=(1, 2)) / (2.0 * sigma**2)
    log_pz = -0.5 * np.sum(z**2, axis=(1, 2)) - 0.5 * d_eff * np.log(2 * np.pi)
    log_w = -u - log_pz - dlogp
    mx = log_w.max()
    neg_log_Z_est = float(-(mx + np.log(np.mean(np.exp(log_w - mx)))))
    neg_log_Z_exact = float(-0.5 * d_eff * np.log(2 * np.pi * sigma**2))
    w = np.exp(log_w - mx)
    ess = float(np.square(w.sum()) / np.sum(np.square(w)))

    print(json.dumps({
        "width": width, "width_target": sigma,
        "neg_log_Z_est": neg_log_Z_est, "neg_log_Z_exact": neg_log_Z_exact,
        "abs_err": abs(neg_log_Z_est - neg_log_Z_exact),
        "ess": ess, "n": len(x),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
