#!/usr/bin/env python
"""Step-count study: fixed-step RK4 vs adaptive dopri5@1e-5 (ROADMAP #3).

The reference integrates with torchdiffeq dopri5 at atol=rtol=1e-5
(mdqm9/config/ambient/00031_settings_no_300.json:34-36; adw/config). Our
production path is fixed-step RK4 + quadrature dlogp. This study trains
the real ADW stack, then measures, per RK4 step count, the endpoint and
dlogp error against our in-repo dopri5 at the reference tolerances —
answering "how many RK4 steps buy reference-tolerance accuracy" with NFE
counts for the cost comparison.

Run on CPU or TPU: JAX_PLATFORMS=cpu python scripts/step_count_study.py
Prints one JSON line per step count + a summary line.
"""
import argparse
import json
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--n_samples", type=int, default=40_000)
    ap.add_argument("--n_eval", type=int, default=1000)
    ap.add_argument("--steps", type=int, nargs="*", default=[8, 16, 32, 64, 128, 256])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ti_tpu.analysis.potentials import AsymmetricDoubleWell, BoltzmannDensity1D
    from ti_tpu.config import ADWConfig
    from ti_tpu.data.adw import make_synthetic_adw_csv
    from ti_tpu.sampling.integrators import (
        sample_ode,
        sample_ode_dopri5,
        sample_ode_gauss_dlogp,
    )
    from ti_tpu.train.adw import train_adw

    BETA0, BETA1 = 1.0, 1.25
    tmp = tempfile.mkdtemp()
    make_synthetic_adw_csv(f"{tmp}/samples.csv", betas=[BETA0, BETA1], n_samples=args.n_samples)
    cfg = ADWConfig(
        n_samples=args.n_samples, hidden_size=64, num_layers=3, epochs=args.epochs,
        lr=1e-3, wd=0.0, batch_size=1024, a=0.9, traj_path=tmp,
        model_save_path=f"{tmp}/models", data_save_path=f"{tmp}/out",
    )
    result = train_adw(cfg)
    model, params = result["model"], result["params"]

    def v(x, t):
        xt = x[None, :]
        tt = jnp.full((1, 1), t, dtype=x.dtype)
        b0 = jnp.full((1, 1), BETA0, dtype=x.dtype)
        b1 = jnp.full((1, 1), BETA1, dtype=x.dtype)
        return model.apply(params, xt, tt, b0, b1)[0]

    x0 = BoltzmannDensity1D(BETA0, AsymmetricDoubleWell()).sample(123, args.n_eval)
    x0j = jnp.asarray(x0.astype(np.float32))[:, None]

    # reference-tolerance adaptive solve (the reference's solver settings)
    ref = jax.jit(
        lambda xs: jax.vmap(
            lambda x: sample_ode_dopri5(v, x, atol=1e-5, rtol=1e-5, divergence="exact")
        )(xs)
    )(x0j)
    x_ref = np.asarray(ref.xs[:, -1, 0])
    lp_ref = np.asarray(ref.dlogp[:, -1])
    nfe_ref = int(np.max(np.asarray(ref.nfe)))
    print(f"[ref] dopri5@1e-5: nfe={nfe_ref}", file=sys.stderr)

    rows = []
    for n_steps in args.steps:
        sol = jax.jit(
            lambda xs, ns=n_steps: jax.vmap(
                lambda x: sample_ode(v, x, n_steps=ns, method="rk4", divergence="exact")
            )(xs)
        )(x0j)
        xe = np.abs(np.asarray(sol.xs[:, -1, 0]) - x_ref)
        le = np.abs(np.asarray(sol.dlogp[:, -1]) - lp_ref)
        row = {
            "rk4_steps": n_steps,
            "nfe": int(np.max(np.asarray(sol.nfe))),
            "x_err_p99": float(np.percentile(xe, 99)),
            "dlogp_err_p99": float(np.percentile(le, 99)),
            "dlogp_err_max": float(le.max()),
        }
        # production path: same trajectory, Gauss-10 decoupled dlogp
        if n_steps >= 16:
            g = jax.jit(
                lambda xs, ns=n_steps: jax.vmap(
                    lambda x: sample_ode_gauss_dlogp(
                        v, x, n_steps=ns, gl_points=10, method="rk4"
                    )
                )(xs)
            )(x0j)
            row["gauss10_dlogp_err_p99"] = float(
                np.percentile(np.abs(np.asarray(g.dlogp[:, -1]) - lp_ref), 99)
            )
            row["gauss10_nfe"] = int(np.max(np.asarray(g.nfe)))
        rows.append(row)
        print(json.dumps(row))

    # smallest step count whose p99 dlogp error is within 2x of the best
    best = min(r["dlogp_err_p99"] for r in rows)
    pick = next(r for r in rows if r["dlogp_err_p99"] <= 2 * best)
    print(json.dumps({
        "summary": "min RK4 steps at reference-tolerance dlogp accuracy",
        "rk4_steps": pick["rk4_steps"],
        "speedup_vs_dopri5_nfe": nfe_ref / pick.get("gauss10_nfe", pick["nfe"]),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
