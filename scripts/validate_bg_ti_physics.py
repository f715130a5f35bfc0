#!/usr/bin/env python
"""Composed BG->TI end-to-end physics validation (the reference's BG-TFEP
route: latent generator -> ambient transport -> combined importance weights,
mdqm9/sample_latent.py + sample_ambient.py + analysis/utils/ess.py:13-23).

Both stages train on exact Boltzmann samples of origin-centered isotropic
harmonic wells (u_T = |center(x)|^2 / (2 sigma_T^2), sigma_T =
jitter*sqrt(T/300), COM-projected; rotation-invariant as the BG stage
requires — see validate_latent_physics.py). The composed generator density
of x1 = TI(BG(z)) is log q(x1) = log p_z(z) + dlogp_bg + dlogp_ti, so the
reference's BG importance weight w = exp(-u_T1(x1)) / q(x1) satisfies
E_q[w] = Z_T1 = (2 pi sigma_T1^2)^{3(N-1)/2} EXACTLY regardless of model
quality (only the weight variance/ESS depends on it). This script trains
the REAL latent + ambient stacks, composes them through the drivers'
latent-passthrough path, evaluates the weights with the analysis layer's
own calc_importance_weights, and prints one JSON line.

Usage: python scripts/validate_bg_ti_physics.py [--latent_epochs 300]
    [--ambient_epochs 120] [--atoms 4] ...
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--latent_epochs", type=int, default=300)
    ap.add_argument("--ambient_epochs", type=int, default=120)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--atoms", type=int, default=4)
    ap.add_argument("--jitter", type=float, default=0.25)
    ap.add_argument("--T0", type=int, default=500)
    ap.add_argument("--T1", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--n_gen", type=int, default=1024)
    ap.add_argument("--gl_points", type=int, default=8)
    ap.add_argument("--out_dir", default="/tmp/bg_ti_physics")
    ap.add_argument("--compute_dtype", choices=["f32", "bf16", "bf16_agg"],
                    default="f32",
                    help="sampling compute dtype for BOTH stages (the "
                         "qualified latent fast profile is bf16)")
    ap.add_argument("--latent_quad", action="store_true",
                    help="use the GL quadrature-decoupled dlogp for the "
                         "LATENT stage too (stage 2 always uses it) — "
                         "REQUIRED at 10506 capacity where stage-coupled "
                         "exact dlogp exceeds HBM / the dispatch deadline")
    ap.add_argument("--sample_batch", type=int, default=512,
                    help="chain batch for both sampling stages")
    ap.add_argument("--divergence", choices=["exact", "hutchinson"],
                    default="exact",
                    help="divergence estimator for BOTH stages' dlogp "
                         "(hutchinson num_probes=32 is the qualified "
                         "10506-capacity profile — exact's 3N lanes at "
                         "F=256/29 atoms need sample_batch <= 16)")
    ap.add_argument("--num_probes", type=int, default=32)
    ap.add_argument("--probe_mode", choices=["rademacher", "orthogonal"],
                    default="rademacher")
    ap.add_argument("--train_impl", choices=["edge", "dense"], default="edge",
                    help="training forward impl for BOTH stages (dense+"
                         "bf16_agg is the qualified fast training profile; "
                         "the composed partition identity holds regardless "
                         "of model quality, so this only moves the ESS)")
    ap.add_argument("--train_compute_dtype",
                    choices=["f32", "bf16", "bf16_agg"], default="f32")
    ap.add_argument("--probe_debias", action="store_true",
                    help="record both stages' hutchinson probe-noise "
                         "variance (cfg.return_dlogp_var) and ALSO report "
                         "the log-normal-debiased identity row (log_w -= "
                         "(var_bg + var_ti)/2 — removes the ~var/2 bias "
                         "per stage; analysis.free_energy.debias_phis "
                         "mechanism)")
    args = ap.parse_args(argv)

    from ti_tpu.analysis.weights import calc_ess, calc_importance_weights
    from ti_tpu.config import MDQM9Config
    from ti_tpu.data.mdqm9 import (
        MDQM9AmbientDataset,
        MDQM9LatentDataset,
        make_synthetic_molecule,
    )
    from ti_tpu.sampling.drivers import sample_ambient, sample_latent
    from ti_tpu.train.ambient import train_ambient
    from ti_tpu.train.latent import train_latent

    T0, T1, N = args.T0, args.T1, args.atoms
    d_eff = 3 * (N - 1)

    def sigma(T):
        return args.jitter * np.sqrt(T / 300.0)

    mol = make_synthetic_molecule(n_atoms=N, seed=0)
    rng = np.random.default_rng(7)

    def well_frames(T, n):
        f = sigma(T) * rng.standard_normal((n, N, 3)).astype(np.float32)
        return f - f.mean(axis=1, keepdims=True)

    frames = {T: well_frames(T, args.frames) for T in (T0, T1)}

    # ---- stage 1: latent BG at T0 (single-T, unconditioned) ----
    lat_cfg = MDQM9Config(
        n_features=args.features, score_layers=args.layers, batch_size=args.batch,
        n_epochs=args.latent_epochs, learning_rate=args.lr,
        scale_trajs=False, T=[T0], sampling_T=T0,
        solver_type="rk4", n_steps=64, return_dlogp=True,
        divergence=args.divergence, num_probes=args.num_probes,
        probe_mode=args.probe_mode,
        train_impl=args.train_impl,
        train_compute_dtype=args.train_compute_dtype,
        steps_per_dispatch=16, compute_dtype=args.compute_dtype,
        dlogp_quad_points=args.gl_points if args.latent_quad else 0,
        dlogp_quad="gauss",
        return_dlogp_var=bool(
            args.probe_debias and args.latent_quad
            and args.divergence == "hutchinson"
        ),
        model_save_path=f"{args.out_dir}/models_lat",
        data_save_path=f"{args.out_dir}/out_lat", use_wandb=False,
    )
    lat_ds = MDQM9LatentDataset.from_arrays(
        frames[T0], np.full(args.frames, float(T0)), mol, t_cond=0, align=True
    )
    lat = train_latent(lat_cfg, lat_ds)
    print("latent losses:", [f"{x:.3f}" for x in lat["history"]["train_loss"][-3:]],
          file=sys.stderr)
    lat_out = sample_latent(
        lat_cfg, lat["model"], lat["params"], lat["template"],
        n_samples=args.n_gen, save=False,
        batch_size=min(args.n_gen, args.sample_batch),
    )
    z = lat_out["samples"][:, 0]
    x0 = lat_out["samples"][:, -1]
    dlogp_bg = lat_out["dlogps"]

    # ---- stage 2: ambient TI T0 -> T1 (two-sided, (T0,T1)-conditioned) ----
    stack = np.concatenate([frames[T0], frames[T1]])
    temps = np.concatenate(
        [np.full(args.frames, float(T0)), np.full(args.frames, float(T1))]
    )
    amb_cfg = MDQM9Config(
        n_features=args.features, score_layers=args.layers, batch_size=args.batch,
        n_epochs=args.ambient_epochs, learning_rate=args.lr, gamma="brownian", a=0.1,
        scale_trajs=False, T0s=[T0, T1], T1s=[T0, T1],
        sampling_T0=T0, sampling_T1=T1,
        solver_type="rk4", n_steps=64, return_dlogp=True,
        divergence=args.divergence, num_probes=args.num_probes,
        probe_mode=args.probe_mode,
        train_impl=args.train_impl,
        train_compute_dtype=args.train_compute_dtype,
        steps_per_dispatch=16, dlogp_quad_points=args.gl_points, dlogp_quad="gauss",
        compute_dtype=args.compute_dtype,
        return_dlogp_var=bool(
            args.probe_debias and args.divergence == "hutchinson"
        ),
        model_save_path=f"{args.out_dir}/models_amb",
        data_save_path=f"{args.out_dir}/out_amb", use_wandb=False,
    )
    amb_ds = MDQM9AmbientDataset.from_arrays(stack, temps, mol)
    amb = train_ambient(amb_cfg, amb_ds, amb_ds)
    print("ambient losses:", [f"{x:.3f}" for x in amb["history"]["train_loss"][-3:]],
          file=sys.stderr)

    out = sample_ambient(
        amb_cfg, amb["model"], amb["params"], amb["template"],
        x0, latent_z=z, latent_dlogp=dlogp_bg, save=False,
        batch_size=min(args.n_gen, 256, args.sample_batch),
    )
    x1 = out["samples"][:, -1]
    dlogp_ti = out["dlogps"]

    # ---- composed identity: E_q[exp(-u1)/q] = Z_T1 ----
    x1c = x1 - x1.mean(axis=1, keepdims=True)
    width = float(np.sqrt(np.sum(x1c**2, axis=(1, 2)).mean() / d_eff))
    E1 = np.sum(x1c**2, axis=(1, 2)) / (2.0 * sigma(T1) ** 2)

    # the analysis layer's own weight computation (ess.py:13-23 parity).
    # Our z is COM-PROJECTED (3(N-1) effective dims; the reference draws
    # full-dimensional noise), so express it in an orthonormal zero-COM
    # basis first — calc_importance_weights' N(0, I) normalization then
    # uses the correct dimensionality and |Q^T z| = |z|.
    q, _ = np.linalg.qr(np.eye(N) - 1.0 / N)  # columns span the zero-COM subspace
    z_sub = np.einsum("ij,njc->nic", q[:, : N - 1].T, z)  # (n, N-1, 3)
    log_pz = -0.5 * np.sum(z**2, axis=(1, 2)) - 0.5 * d_eff * np.log(2 * np.pi)
    log_w = -E1 - log_pz - dlogp_bg - dlogp_ti
    mx = log_w.max()
    w_ref = calc_importance_weights(
        z_sub.reshape(len(z), -1), E1 + mx, neg_dlogps_bg=dlogp_bg, neg_dlogps_ti=dlogp_ti
    )
    np.testing.assert_allclose(w_ref, np.exp(log_w - mx), rtol=1e-4)

    neg_log_Z_est = float(-(mx + np.log(np.mean(np.exp(log_w - mx)))))
    neg_log_Z_exact = float(-0.5 * d_eff * np.log(2 * np.pi * sigma(T1) ** 2))
    ess = calc_ess(np.exp(log_w - mx))

    debias_report = {}
    if args.probe_debias and "dlogp_vars" in out:
        # both stages' probe noise is independent of the sample: the
        # log-normal debias subtracts (var_bg + var_ti)/2 from log w
        v = np.asarray(out["dlogp_vars"])
        if "dlogp_vars" in lat_out:
            v = v + np.asarray(lat_out["dlogp_vars"])
        log_w_c = log_w - 0.5 * v
        mx_c = log_w_c.max()
        est_c = float(-(mx_c + np.log(np.mean(np.exp(log_w_c - mx_c)))))
        debias_report = {
            "neg_log_Z_est_debiased": est_c,
            "abs_err_debiased": abs(est_c - neg_log_Z_exact),
            "ess_frac_debiased": calc_ess(np.exp(log_w_c - mx_c)) / len(x1),
            "dlogp_var_mean": float(v.mean()),
        }

    print(json.dumps({
        "width": width, "width_target": sigma(T1), "width_bg_stage": sigma(T0),
        "neg_log_Z_est": neg_log_Z_est, "neg_log_Z_exact": neg_log_Z_exact,
        "abs_err": abs(neg_log_Z_est - neg_log_Z_exact),
        "ess": ess, "ess_frac": ess / len(x1), "n": len(x1),
        **debias_report,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
