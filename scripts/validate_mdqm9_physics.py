#!/usr/bin/env python
"""Molecular end-to-end physics validation against closed-form oracles.

Synthetic frames are exact Boltzmann samples of an isotropic harmonic well
(sigma_T = jitter*sqrt(T/300), COM-centered), so the TFEP free-energy
difference and the mean dlogp are closed-form (see
tests/test_mdqm9_physics.py). This script trains the REAL ambient stack at
production-like capacity (fast on TPU) and prints the oracle comparison as
one JSON line; the pytest variant runs a CPU-sized version of the same
check.

Usage: python scripts/validate_mdqm9_physics.py [--epochs 300] [--features 64]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--atoms", type=int, default=4)
    ap.add_argument("--jitter", type=float, default=0.4)
    ap.add_argument("--T0", type=int, default=1000)
    ap.add_argument("--T1", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--gamma", default="brownian")
    ap.add_argument("--a", type=float, default=0.1)
    ap.add_argument("--single_direction", action="store_true",
                    help="train only T0->T1 pairs (conditioning ablation)")
    ap.add_argument("--train_temps", type=lambda s: [int(v) for v in s.split(",")],
                    default=None,
                    help="comma list of training temperatures (leave-one-out "
                         "extrapolation oracle: exclude T1, e.g. "
                         "--train_temps 300,400,500,700,800,900,1000 --T1 600 "
                         "— the reference's no_XXX experiment shape)")
    ap.add_argument("--temp_length", type=float, default=100.0,
                    help="temperature positional-encoding length scale; the "
                         "production value 100 is tuned for F=128 — smaller "
                         "models need a shorter scale for usable T contrast")
    ap.add_argument("--out_dir", default="/tmp/mdqm9_physics")
    ap.add_argument("--eval_batch", type=int, default=0,
                    help="transport-evaluation chain batch (0 = all 1024 at "
                         "once; set e.g. 64 for production-capacity models "
                         "where 1024 chains x 3N tangent lanes exceed HBM)")
    ap.add_argument("--reuse", action="store_true",
                    help="load the trained params saved by a previous run of "
                         "this script (out_dir/oracle_params) instead of "
                         "retraining — for cheap quadrature/dtype studies on "
                         "the SAME field")
    ap.add_argument("--eval_steps", type=lambda s: [int(v) for v in s.split(",")],
                    default=[64], help="comma list; first = headline, rest = step study")
    ap.add_argument("--solver", choices=["euler", "heun", "rk4"], default="rk4",
                    help="fixed-step trajectory solver for the transport "
                         "(solver-order study on the trained field)")
    ap.add_argument("--quad_dlogp", action="store_true",
                    help="use the bench's Gauss-Legendre dlogp path")
    ap.add_argument("--traj_impl",
                    choices=["default", "pair_kernel", "pair_kernel_bf16"],
                    default="default",
                    help="trajectory-segment drift for the gauss path "
                         "(requires --quad_dlogp): the fused pair-layer "
                         "Pallas kernel in f32 or the bf16 VMEM profile "
                         "drives the velocity-only trajectory while the "
                         "divergence nodes keep the XLA forward — the "
                         "qualification knob for cfg.traj_forward_impl")
    ap.add_argument("--div_impl",
                    choices=["default", "pair_tangent", "pair_tangent_bf16"],
                    default="default",
                    help="divergence-node estimator impl for the gauss path "
                         "(requires --quad_dlogp): the pair-tangent Pallas "
                         "kernel carries the Hutchinson probe lanes through "
                         "the message layers in VMEM (f32 or the bf16-VMEM "
                         "profile) — the qualification knob for "
                         "cfg.div_forward_impl. With --divergence exact the "
                         "kernel runs the full orthogonal tangent frame "
                         "(mathematically the exact trace)")
    ap.add_argument("--gl_points", type=int, default=10)
    ap.add_argument("--divergence", choices=["exact", "hutchinson", "hutchpp"], default="exact",
                    help="divergence estimator for the dlogp integrand "
                         "(hutchinson: num_probes Rademacher JVP lanes "
                         "instead of the 3N exact tangent basis)")
    ap.add_argument("--num_probes", type=int, default=8,
                    help="Hutchinson probe count (with --divergence hutchinson)")
    ap.add_argument("--probe_mode", choices=["rademacher", "orthogonal"],
                    default="rademacher",
                    help="hutchinson probe distribution (orthogonal: Haar "
                         "frame, exact at num_probes=3N; ops/divergence.py)")
    ap.add_argument("--probe_debias", action="store_true",
                    help="record the per-sample probe-noise variance of the "
                         "hutchinson dlogp (gauss path only) and ALSO report "
                         "the log-normal-debiased oracle row (phi += var/2 "
                         "removes the ~var/2 bias in -log E[w] — the "
                         "documented h-K dF offset at 10506 capacity, "
                         "BASELINE.md probe rows)")
    ap.add_argument("--probe_crn", action="store_true",
                    help="share the stochastic-divergence probes across chains "
                         "(common random numbers: the common component of the "
                         "dlogp noise cancels in self-normalized weights)")
    ap.add_argument("--probe_sweep", default=None,
                    help="comma list of mode:K:seed combos (mode = "
                         "rademacher|orthogonal|exact) evaluated IN THIS "
                         "PROCESS after the headline row, one JSON line "
                         "each on stdout — batching a probe qualification "
                         "sweep into one process pays the tunnel's "
                         "backend-init stall once instead of per run "
                         "(e.g. --probe_sweep "
                         "rademacher:16:0,orthogonal:16:0,orthogonal:8:1)")
    ap.add_argument("--eval_seed", type=int, default=0,
                    help="PRNG seed for the transport evaluation (stochastic-"
                         "divergence probe draws): repeat runs at different "
                         "seeds measure the oracle's own scatter")
    ap.add_argument("--sde_g", type=lambda s: [float(v) for v in s.split(",")],
                    default=None,
                    help="comma list of SDE noise scales g: also transport "
                         "with Euler-Maruyama (velocity drift + g dW, no "
                         "dlogp — the bench SDE path) and report the final "
                         "marginal width and the KS statistic of the "
                         "target-energy distribution vs its closed form "
                         "Gamma(3(N-1)/2, 1) — the SDE-marginal "
                         "qualification (no score model is trained, so "
                         "g>0 biases the marginal O(g^2); this measures "
                         "the bias on the trained field)")
    ap.add_argument("--sde_steps", type=int, default=100,
                    help="Euler-Maruyama step count for --sde_g")
    ap.add_argument("--train_impl", choices=["edge", "dense"], default="edge",
                    help="training forward impl (dense = the sampling hot "
                         "path's batched pair formulation)")
    ap.add_argument("--train_compute_dtype", choices=["f32", "bf16", "bf16_agg"],
                    default="f32",
                    help="training compute dtype (requires --train_impl dense)")
    ap.add_argument("--compute_dtype", choices=["f32", "bf16", "bf16_agg", "both", "all"], default="f32",
                    help="sampling-path compute dtype (bf16 = mixed-precision "
                         "pair-grid compute, ROADMAP item 2; training stays "
                         "f32). 'both' evaluates f32 AND bf16 transport on the "
                         "same trained field and reports both oracle errors")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ti_tpu.config import MDQM9Config
    from ti_tpu.data.mdqm9 import MDQM9AmbientDataset, make_synthetic_frames, make_synthetic_molecule
    from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of
    from ti_tpu.train.ambient import train_ambient

    T0, T1, N = args.T0, args.T1, args.atoms

    def sigma(T):
        return args.jitter * np.sqrt(T / 300.0)

    mol = make_synthetic_molecule(n_atoms=N, seed=0)
    # leave-one-out extrapolation: train only on --train_temps (which must
    # exclude T1 for a true held-out target); the temperature-encoding
    # normalization stays the model's full default grid, matching the
    # reference exactly (cPaiNN default temperatures=[300..1000] even in
    # no_XXX runs, mdqm9/train_ambient.py:47-51)
    train_T = args.train_temps or [T0, T1]
    frames = {
        T: make_synthetic_frames(mol, args.frames, T, seed=T, jitter=args.jitter)
        for T in sorted(set(train_T) | {T0, T1})
    }
    stack = np.concatenate([frames[T] for T in train_T])
    temps = np.concatenate([np.full(args.frames, float(T)) for T in train_T])

    t0_list = [T0] if args.single_direction else train_T
    t1_list = [T1] if args.single_direction else train_T
    cfg = MDQM9Config(
        n_features=args.features, score_layers=args.layers, batch_size=args.batch,
        n_epochs=args.epochs, learning_rate=args.lr, gamma=args.gamma, a=args.a,
        temp_length=args.temp_length,
        train_impl=args.train_impl, train_compute_dtype=args.train_compute_dtype,
        scale_trajs=False, T0s=t0_list, T1s=t1_list,
        model_save_path=f"{args.out_dir}/models", data_save_path=f"{args.out_dir}/out",
        use_wandb=False,
    )
    ds0 = MDQM9AmbientDataset.from_arrays(frames[T0], np.full(args.frames, float(T0)), mol)         if args.single_direction else MDQM9AmbientDataset.from_arrays(stack, temps, mol)
    ds1 = MDQM9AmbientDataset.from_arrays(frames[T1], np.full(args.frames, float(T1)), mol)         if args.single_direction else MDQM9AmbientDataset.from_arrays(stack, temps, mol)

    from ti_tpu.train import common as train_common
    from ti_tpu.train.ambient import build_ambient_model

    params_path = os.path.join(args.out_dir, "oracle_params")
    # arch flags that shape the checkpoint — recorded on save, asserted on
    # --reuse so a mismatched rerun fails with the flag diff instead of an
    # opaque flax shape error (ADVICE r1)
    arch = {
        "features": args.features, "layers": args.layers,
        "temp_length": args.temp_length, "atoms": args.atoms,
    }
    if args.reuse and os.path.exists(params_path):
        ckpt = train_common.load_checkpoint(params_path)
        saved_arch = ckpt.get("arch")
        diff = {}
        if saved_arch is not None:  # orbax may restore scalars as 0-d arrays
            diff = {
                k: (saved_arch.get(k), arch[k])
                for k in arch
                if saved_arch.get(k) is None
                or float(np.asarray(saved_arch[k])) != float(arch[k])
            }
        if diff:
            raise SystemExit(
                f"--reuse architecture mismatch vs {params_path}: "
                f"{diff} (saved, requested). Re-run without --reuse or "
                "match the flags the checkpoint was trained with."
            )
        model = build_ambient_model(cfg)
        template = ds0.template
        res = {"model": model, "params": ckpt["params"], "template": template}
        print(f"reusing trained params from {params_path}", file=sys.stderr)
    else:
        res = train_ambient(cfg, ds0, ds1)
        print("final train losses:", [f"{x:.3f}" for x in res["history"]["train_loss"][-3:]],
              file=sys.stderr)
        train_common.save_checkpoint(params_path, {"params": res["params"], "arch": arch})

    x0 = make_synthetic_frames(mol, 1024, T0, seed=999, jitter=args.jitter)

    def v_fn_of_dtype(name):
        cd = {"f32": None, "bf16": jnp.bfloat16, "bf16_agg": "bf16_agg"}[name]
        return molecular_v_fn_of(
            res["model"], res["params"], res["template"], compute_dtype=cd,
        )

    temps_v = jnp.tile(jnp.array([float(T0), float(T1)]), (len(x0), 1))

    traj_drift = None
    if args.traj_impl != "default":
        if not args.quad_dlogp:
            raise SystemExit("--traj_impl requires --quad_dlogp (the gauss "
                             "quadrature-dlogp path, see make_ode_sampler)")
        from ti_tpu.ops.pair_layer_kernel import pair_kernel_drift

        traj_drift = pair_kernel_drift(
            res["model"], res["params"], res["template"],
            compute_dtype="bf16_agg" if args.traj_impl.endswith("bf16") else None,
            interpret=jax.devices()[0].platform not in ("tpu", "axon"),
        )

    if args.div_impl != "default" and not args.quad_dlogp:
        raise SystemExit("--div_impl requires --quad_dlogp (the gauss "
                         "quadrature-dlogp path, see make_ode_sampler)")

    def div_drift_for(div, k, pm):
        if args.div_impl == "default":
            return None
        from ti_tpu.ops.pair_tangent_kernel import pair_tangent_div_fn

        if div == "exact":
            k, pm = 3 * N, "orthogonal"  # full frame = exact trace
        return pair_tangent_div_fn(
            res["model"], res["params"], res["template"],
            num_probes=k, probe_mode=pm,
            compute_dtype="bf16_agg" if args.div_impl.endswith("bf16") else None,
            interpret=jax.devices()[0].platform not in ("tpu", "axon"),
        )

    debias = bool(args.probe_debias)
    if debias and not args.quad_dlogp:
        raise SystemExit("--probe_debias requires --quad_dlogp (the gauss "
                         "quadrature-dlogp path)")

    def transport(n_steps, quad, dtype_name="f32", divergence=None,
                  num_probes=None, probe_mode=None, seed=None):
        div = divergence or args.divergence
        kk = num_probes or args.num_probes
        pm = probe_mode or args.probe_mode
        want_var = debias and quad and div == "hutchinson"
        dd = div_drift_for(div, kk, pm) if quad else None
        if dd is not None and want_var:
            # rebuild with the (div, var) contract
            from ti_tpu.ops.pair_tangent_kernel import pair_tangent_div_fn

            dd = pair_tangent_div_fn(
                res["model"], res["params"], res["template"],
                num_probes=kk, probe_mode=pm,
                compute_dtype="bf16_agg" if args.div_impl.endswith("bf16") else None,
                interpret=jax.devices()[0].platform not in ("tpu", "axon"),
                return_var=True,
            )
        sampler = make_ode_sampler(
            v_fn_of_dtype(dtype_name), solver=args.solver, n_steps=n_steps, n_save=2,
            return_dlogp=True, divergence=div,
            num_probes=kk, steps_per_dispatch=16,
            dlogp_quad_points=(args.gl_points if quad else None),
            dlogp_quad="gauss", probe_crn=args.probe_crn,
            probe_mode=pm,
            traj_drift=traj_drift if quad else None,
            div_drift=dd,
            return_dlogp_var=want_var,
        )
        bs = args.eval_batch or len(x0)
        xs, lps, lpvars = [], [], []
        for i in range(0, len(x0), bs):
            sol = sampler(
                jnp.asarray(x0[i : i + bs]), temps_v[i : i + bs],
                jax.random.PRNGKey(args.eval_seed if seed is None else seed),
            )
            xs.append(np.asarray(sol.xs[:, -1]))
            lps.append(np.asarray(sol.dlogp[:, -1]))
            if want_var:
                lpvars.append(np.asarray(sol.dlogp_var[:, -1]))
        if want_var:
            transport.last_var = np.concatenate(lpvars)
        else:
            transport.last_var = None
        return np.concatenate(xs), np.concatenate(lps)

    headline_dtype = (
        args.compute_dtype if args.compute_dtype in ("bf16", "bf16_agg") else "f32"
    )
    x1, dlogp = transport(args.eval_steps[0], args.quad_dlogp, headline_dtype)
    dlogp_var = transport.last_var
    # step-count study on the SAME trained field (bench-config GL-10 path):
    # report the oracle error per step count (stderr; headline uses [0])
    extra = {}
    for ns in args.eval_steps[1:]:
        extra[ns] = transport(ns, args.quad_dlogp, headline_dtype)

    p_eq = (mol.positions - mol.positions.mean(0)).astype(np.float32)
    x1c = x1 - x1.mean(1, keepdims=True)
    width = float(np.sqrt(np.sum((x1c - p_eq) ** 2, axis=(1, 2)).mean() / (3 * (N - 1))))

    e0 = np.sum((x0 - x0.mean(1, keepdims=True) - p_eq) ** 2, axis=(1, 2)) / (2 * sigma(T0) ** 2)
    e1 = np.sum((x1c - p_eq) ** 2, axis=(1, 2)) / (2 * sigma(T1) ** 2)
    phis = e1 - e0 + dlogp  # phi = u1 - u0 + dlogp_saved (reference convention)
    mx = (-phis).max()
    dF_est = float(-(mx + np.log(np.mean(np.exp(-phis - mx)))))
    dF_exact = float(-3 * (N - 1) * np.log(sigma(T1) / sigma(T0)))
    w_tfep = np.exp(-phis - mx)
    ess = float(np.square(w_tfep.sum()) / np.sum(np.square(w_tfep)))

    def oracle_err(x1_a, dlogp_a):
        x1c_a = x1_a - x1_a.mean(1, keepdims=True)
        e1_a = np.sum((x1c_a - p_eq) ** 2, axis=(1, 2)) / (2 * sigma(T1) ** 2)
        phis_a = e1_a - e0 + dlogp_a
        mx_a = (-phis_a).max()
        return abs(float(-(mx_a + np.log(np.mean(np.exp(-phis_a - mx_a))))) - dF_exact)

    for ns, (x1_s, dlogp_s) in extra.items():
        print(
            f"[step-study] n_steps={ns}: dF_abs_err={oracle_err(x1_s, dlogp_s):.2e}, "
            f"dlogp_mean_shift={float(np.mean(dlogp_s - dlogp)):.2e}",
            file=sys.stderr,
        )

    dtype_report = {}
    study = {"both": ["bf16"], "all": ["bf16", "bf16_agg"]}.get(args.compute_dtype, [])
    for name in study:
        x1_b, dlogp_b = transport(args.eval_steps[0], args.quad_dlogp, name)
        dtype_report.update({
            f"dF_abs_err_{name}": oracle_err(x1_b, dlogp_b),
            f"dlogp_mean_shift_{name}": float(np.mean(dlogp_b - dlogp)),
            f"dlogp_rms_shift_{name}": float(np.sqrt(np.mean((dlogp_b - dlogp) ** 2))),
            f"x1_rms_shift_{name}": float(np.sqrt(np.mean((x1_b - x1) ** 2))),
        })

    def oracle_row(x1_a, dlogp_a):
        x1c_a = x1_a - x1_a.mean(1, keepdims=True)
        e1_a = np.sum((x1c_a - p_eq) ** 2, axis=(1, 2)) / (2 * sigma(T1) ** 2)
        phis_a = e1_a - e0 + dlogp_a
        mx_a = (-phis_a).max()
        dF_a = float(-(mx_a + np.log(np.mean(np.exp(-phis_a - mx_a)))))
        w_a = np.exp(-phis_a - mx_a)
        ess_a = float(np.square(w_a.sum()) / np.sum(np.square(w_a))) / len(x1_a)
        return abs(dF_a - dF_exact), ess_a

    if args.probe_sweep:
        for combo in args.probe_sweep.split(","):
            mode, k, seed = combo.split(":")
            div = "exact" if mode == "exact" else "hutchinson"
            x1_s, dlogp_s = transport(
                args.eval_steps[0], args.quad_dlogp, headline_dtype,
                divergence=div, num_probes=int(k),
                probe_mode=mode if div == "hutchinson" else None,
                seed=int(seed),
            )
            err_s, ess_s = oracle_row(x1_s, dlogp_s)
            print(json.dumps({
                "sweep_mode": mode, "K": int(k), "seed": int(seed),
                "dF_abs_err": err_s, "ess_frac": ess_s,
            }), flush=True)

    sde_report = {}
    if args.sde_g:
        from scipy import stats

        from ti_tpu.sampling.drivers import sample_molecular_sde

        # closed form: with COM removed, e1 = |x1c - p_eq|^2 / (2 sigma1^2)
        # is a sum of 3(N-1) squared standard normals / 2 ~ Gamma(3(N-1)/2, 1)
        gamma_shape = 3 * (N - 1) / 2.0
        cd = {"f32": None, "bf16": jnp.bfloat16, "bf16_agg": "bf16_agg"}[headline_dtype]
        for gval in args.sde_g:
            bs = args.eval_batch or len(x0)
            outs = []
            for i in range(0, len(x0), bs):
                out = sample_molecular_sde(
                    res["model"], res["params"], res["template"],
                    jnp.asarray(x0[i : i + bs]), temps_v[i : i + bs],
                    jax.random.PRNGKey(7 + i), g_fn=gval,
                    n_steps=args.sde_steps, compute_dtype=cd,
                )
                outs.append(np.asarray(out[:, -1]))
            x1_sde = np.concatenate(outs)
            x1c_s = x1_sde - x1_sde.mean(1, keepdims=True)
            w_s = float(np.sqrt(
                np.sum((x1c_s - p_eq) ** 2, axis=(1, 2)).mean() / (3 * (N - 1))
            ))
            e1_s = np.sum((x1c_s - p_eq) ** 2, axis=(1, 2)) / (2 * sigma(T1) ** 2)
            ks = float(stats.kstest(e1_s, stats.gamma(gamma_shape).cdf).statistic)
            tag = f"{gval:g}"
            sde_report[f"sde_g{tag}_width"] = w_s
            sde_report[f"sde_g{tag}_ks_energy"] = ks
            print(f"[sde-study] g={gval:g} steps={args.sde_steps}: "
                  f"width={w_s:.4f} (target {sigma(T1):.4f}), KS(e1)={ks:.4f}",
                  file=sys.stderr)
        # ODE-route yardstick on the same samples (what "at the floor" means)
        e1_o = np.sum((x1c - p_eq) ** 2, axis=(1, 2)) / (2 * sigma(T1) ** 2)
        sde_report["ode_ks_energy"] = float(
            stats.kstest(e1_o, stats.gamma(gamma_shape).cdf).statistic
        )

    debias_report = {}
    if dlogp_var is not None:
        # log-normal probe-noise debias: phi_corr = phi + var/2 makes
        # E[e^{-phi_corr}] unbiased for E[e^{-phi_true}] when the probe
        # noise is ~N(0, var) independent of the sample
        phis_c = phis + 0.5 * dlogp_var
        mx_c = (-phis_c).max()
        dF_c = float(-(mx_c + np.log(np.mean(np.exp(-phis_c - mx_c)))))
        w_c = np.exp(-phis_c - mx_c)
        ess_c = float(np.square(w_c.sum()) / np.sum(np.square(w_c)))
        debias_report = {
            "dF_abs_err_debiased": abs(dF_c - dF_exact),
            "ess_frac_debiased": ess_c / len(x1),
            "dlogp_var_mean": float(dlogp_var.mean()),
        }

    print(json.dumps({
        "width": width, "width_target": sigma(T1), "width_start": sigma(T0),
        "dlogp_mean": float(dlogp.mean()),
        "dlogp_expected": float(3 * (N - 1) * np.log(sigma(T0) / sigma(T1))),
        "dF_est": dF_est, "dF_exact": dF_exact,
        "dF_abs_err": abs(dF_est - dF_exact),
        "ess": ess, "ess_frac": ess / len(x1),
        "eval_steps": args.eval_steps[0],
        "solver": args.solver,
        "quad_dlogp": bool(args.quad_dlogp),
        "traj_impl": args.traj_impl,
        "div_impl": args.div_impl,
        "divergence": args.divergence,
        "compute_dtype": headline_dtype,
        "train_temps": train_T,
        "extrapolated_T1": T1 not in train_T,
        **dtype_report,
        **sde_report,
        **debias_report,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
