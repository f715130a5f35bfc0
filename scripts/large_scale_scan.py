#!/usr/bin/env python
"""Microbenchmark: 10506-scale ODE+dlogp throughput over chains x probes x
trajectory impl.

The large-molecule regime (29 atoms, cPaiNN F=256 x 5 — the capacity of
the reference's 10506 configs, mdqm9/config/ambient/10506_settings_no_300
.json) is where the reference's 3N-backward-pass divergence hurts most
(mdqm9/thermo/ambient/models/ode_wrapper.py:60-91). This scan measures the
qualified 10506 profile (RK4-16 trajectory + Gauss-Legendre-8 decoupled
Hutchinson dlogp, bf16_agg) across:

  - chain batch (HBM-bound: 16 was the round-2/3 unchunked sweet spot),
  - Hutchinson probe count (physics-qualified count is 32; see the
    BASELINE.md 10506 probe-study rows before changing),
  - trajectory impl: `default` (XLA dense-pair forward) vs the fused
    pair-layer Pallas kernel in f32 (`pair_kernel`) or the bf16-VMEM
    profile (`pair_kernel_bf16`) driving the velocity-only trajectory
    segments via `make_ode_sampler(traj_drift=...)` — at F=256/29 atoms
    only the bf16 variant fits VMEM (ROADMAP round-4 closures).

Timing follows the repo convention (BASELINE.md methodology): whole
rollout in jitted dispatches fenced by a scalar host readback; best-of-N
reps (tunnel-load wobble inflates means). Throughput only — the matching
physics (dF err / ESS) comes from `validate_mdqm9_physics.py --reuse
--probe_sweep` on the trained 10506-capacity oracle; combine ESS with
these rates for the effective-samples/s frontier.

Usage:
    python scripts/large_scale_scan.py                      # full grid
    python scripts/large_scale_scan.py --chains 16 --probes 32 \
        --impls default,pair_kernel_bf16
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
from ti_tpu.models.cpainn import CPaiNN
from ti_tpu.ops.pair_layer_kernel import pair_kernel_drift
from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--atoms", type=int, default=29)
    p.add_argument("--features", type=int, default=256)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--steps", type=int, default=16, help="RK4 trajectory steps")
    p.add_argument("--gl_points", type=int, default=8)
    p.add_argument("--probe_mode", default="rademacher",
                   help="rademacher is the qualified 10506 mode "
                        "(orthogonal measured no-benefit at d=87)")
    p.add_argument("--compute_dtype", choices=["f32", "bf16", "bf16_agg"],
                   default="bf16_agg")
    p.add_argument("--steps_per_dispatch", type=int, default=25)
    p.add_argument("--reps", type=int, default=2, help="best-of-N timed reps")
    p.add_argument("--chains", default="16,24,32",
                   help="comma-separated chain batch sizes")
    p.add_argument("--probes", default="24,32,48",
                   help="comma-separated Hutchinson probe counts")
    p.add_argument("--impls", default="default,pair_kernel_bf16",
                   help="comma subset of {default,pair_kernel,pair_kernel_bf16}")
    p.add_argument("--div_impls", default="default",
                   help="comma subset of {default,pair_tangent,"
                        "pair_tangent_bf16}: divergence-NODE estimator impl "
                        "(ops/pair_tangent_kernel.py — the probe lanes ride "
                        "the message layers in VMEM); crossed with --impls")
    args = p.parse_args(argv)

    impls = [s for s in args.impls.split(",") if s]
    known = {"default", "pair_kernel", "pair_kernel_bf16"}
    unknown = [i for i in impls if i not in known]
    if unknown:
        p.error(f"unknown impls {unknown}; choose from {sorted(known)}")
    div_impls = [s for s in args.div_impls.split(",") if s]
    known_d = {"default", "pair_tangent", "pair_tangent_bf16"}
    unknown = [i for i in div_impls if i not in known_d]
    if unknown:
        p.error(f"unknown div_impls {unknown}; choose from {sorted(known_d)}")

    mol = make_synthetic_molecule(n_atoms=args.atoms, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=args.features, score_layers=args.layers,
                   temp_length=100.0, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    # repo dtype convention (sde_scan._DTYPES / drivers._compute_dtype)
    cd = {"f32": None, "bf16": jnp.bfloat16, "bf16_agg": "bf16_agg"}[
        args.compute_dtype]
    v_fn_of = molecular_v_fn_of(model, params, template, compute_dtype=cd)

    drifts = {"default": None}
    if "pair_kernel" in impls:
        drifts["pair_kernel"] = pair_kernel_drift(model, params, template)
    if "pair_kernel_bf16" in impls:
        drifts["pair_kernel_bf16"] = pair_kernel_drift(
            model, params, template, compute_dtype="bf16_agg")

    key = jax.random.PRNGKey(42)
    chain_list = [int(c) for c in args.chains.split(",")]
    probe_list = [int(k) for k in args.probes.split(",")]

    def div_drift_for(dimpl, probes):
        if dimpl == "default":
            return None
        from ti_tpu.ops.pair_tangent_kernel import pair_tangent_div_fn

        return pair_tangent_div_fn(
            model, params, template, num_probes=probes,
            probe_mode=args.probe_mode,
            compute_dtype="bf16_agg" if dimpl.endswith("bf16") else None,
        )

    for impl in impls:
      for dimpl in div_impls:
        for probes in probe_list:
            sampler = make_ode_sampler(
                v_fn_of, solver="rk4", n_steps=args.steps, n_save=2,
                return_dlogp=True, divergence="hutchinson",
                num_probes=probes, probe_mode=args.probe_mode,
                dlogp_quad_points=args.gl_points, dlogp_quad="gauss",
                steps_per_dispatch=args.steps_per_dispatch,
                traj_drift=drifts[impl],
                div_drift=div_drift_for(dimpl, probes),
            )
            for chains in chain_list:
                x0 = 0.1 * jax.random.normal(key, (chains, args.atoms, 3),
                                             jnp.float32)
                x0 = x0 - x0.mean(axis=1, keepdims=True)
                tl = jnp.tile(jnp.array([1000.0, 300.0], jnp.float32),
                              (chains, 1))
                try:
                    sol = sampler(x0, tl, key)  # compile + warm
                    float(jnp.sum(sol.xs))
                    best = 0.0
                    for i in range(args.reps):
                        t0 = time.perf_counter()
                        sol = sampler(x0, tl, jax.random.fold_in(key, i + 1))
                        float(jnp.sum(sol.xs))
                        best = max(best, chains / (time.perf_counter() - t0))
                except Exception as e:
                    print(json.dumps({"impl": impl, "div_impl": dimpl,
                                      "probes": probes, "chains": chains,
                                      "error": f"{type(e).__name__}: {e}"[:200]}))
                    continue
                print(json.dumps({
                    "impl": impl, "div_impl": dimpl, "probes": probes,
                    "chains": chains, "samples_per_sec": round(best, 3),
                }))
                sys.stdout.flush()


if __name__ == "__main__":
    main()
