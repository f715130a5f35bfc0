"""ADW f64-vs-f32 trained-field parity study (VERDICT-r2 task 6).

The reference trains ADW in float64 (adw/train.py:29); ti_tpu defaults to
f32 because TPUs have no native f64 (ADWConfig.dtype docstring). This study
quantifies what the dtype choice costs on the PHYSICS, not just on paper:
train the same config/seed in both dtypes (f64 via ``ADWConfig.dtype="f64"``
-> jax_enable_x64, CPU-only), transport the same exact-Boltzmann test split
with stage-coupled exact dlogp, and report per-dtype

- quadrature-oracle TFEP dF error (|dF_est - dF_quadrature|),
- marginal KS distance vs the beta1 Boltzmann density,
- TFEP ESS,

plus the cross-dtype endpoint deltas (x1, dlogp) from transporting the SAME
x0 through both trained fields. Results belong in BASELINE.md (the
ADWConfig.dtype docstring points there).

Run from the repo root (CPU):
    JAX_PLATFORMS=cpu python scripts/adw_f64_study.py [--epochs 120] [--n 4000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

# f64 needs x64 enabled before tracing; do it up front so BOTH runs share one
# jax config (the f32 run keeps explicit float32 arrays throughout).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--n_train", type=int, default=40_000)
    ap.add_argument("--n", type=int, default=4000, help="test chains")
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--out", default="/tmp/adw_f64_study")
    args = ap.parse_args()

    import os

    from ti_tpu.analysis.potentials import (
        AsymmetricDoubleWell,
        BoltzmannDensity1D,
        delta_f_quadrature,
    )
    from ti_tpu.analysis.weights import calc_ess
    from ti_tpu.config import ADWConfig
    from ti_tpu.data.adw import make_synthetic_adw_csv
    from ti_tpu.sampling.integrators import sample_ode
    from ti_tpu.train.adw import train_adw

    beta0, beta1 = 1.0, 1.25
    pot = AsymmetricDoubleWell()
    os.makedirs(args.out, exist_ok=True)
    csv = make_synthetic_adw_csv(
        os.path.join(args.out, "samples.csv"), betas=[beta0, beta1],
        n_samples=args.n_train,
    )
    del csv

    # shared exact test draw at beta0 (f64; cast per-dtype below)
    x0 = BoltzmannDensity1D(beta0, pot).sample(123, args.n)
    dF_exact = delta_f_quadrature(beta0, beta1, pot)

    dens1 = BoltzmannDensity1D(beta1, pot)
    xs_grid = np.linspace(-4, 4, 4000)
    pdf = dens1.pdf(xs_grid)
    cdf_target = np.cumsum(pdf)
    cdf_target /= cdf_target[-1]
    ks_grid = np.linspace(-2.0, 2.0, 201)
    cdf_t = np.interp(ks_grid, xs_grid, cdf_target)

    results = {}
    endpoints = {}
    for dtype in ("f32", "f64"):
        cfg = ADWConfig(
            n_samples=args.n_train, hidden_size=args.hidden,
            num_layers=args.layers, epochs=args.epochs, lr=1e-3, wd=0.0,
            batch_size=1024, a=0.9, dtype=dtype, traj_path=args.out,
            model_save_path=os.path.join(args.out, f"models_{dtype}"),
            data_save_path=os.path.join(args.out, f"out_{dtype}"),
        )
        t0 = time.time()
        res = train_adw(cfg)
        t_train = time.time() - t0
        model, params = res["model"], res["params"]
        dt = jnp.float64 if dtype == "f64" else jnp.float32

        def v(x, t, _m=model, _p=params, _dt=dt):
            xt = x[None, :]
            tt = jnp.full((1, 1), t, dtype=_dt)
            b0 = jnp.full((1, 1), beta0, dtype=_dt)
            b1 = jnp.full((1, 1), beta1, dtype=_dt)
            return _m.apply(_p, xt, tt, b0, b1)[0]

        @jax.jit
        def run(x0s, _v=v):
            return jax.vmap(
                lambda x: sample_ode(
                    _v, x, n_steps=args.steps, method="rk4", divergence="exact"
                )
            )(x0s)

        t0 = time.time()
        sol = run(jnp.asarray(x0, dt)[:, None])
        x1 = np.asarray(sol.xs[:, -1, 0], np.float64)
        dlogp = np.asarray(sol.dlogp[:, -1], np.float64)
        t_sample = time.time() - t0
        endpoints[dtype] = (x1, dlogp)

        e0 = np.asarray(pot(x0))
        e1 = np.asarray(pot(x1))
        log_w = beta0 * e0 - beta1 * e1 - dlogp
        mx = log_w.max()
        dF_est = -(mx + np.log(np.mean(np.exp(log_w - mx))))
        ess = float(calc_ess(np.exp(log_w - mx))) / args.n
        cdf_emp = np.searchsorted(np.sort(x1), ks_grid) / len(x1)
        ks = float(np.max(np.abs(cdf_emp - cdf_t)))
        results[dtype] = {
            "dF_est": float(dF_est),
            "dF_err": float(abs(dF_est - dF_exact)),
            "ks": ks,
            "ess_frac": ess,
            "final_val_loss": res["history"]["val_loss"][-1],
            "train_s": round(t_train, 1),
            "sample_s": round(t_sample, 1),
        }
        print(f"[{dtype}] {json.dumps(results[dtype])}", file=sys.stderr, flush=True)

    x1_32, dl_32 = endpoints["f32"]
    x1_64, dl_64 = endpoints["f64"]
    cross = {
        "x1_rms_delta": float(np.sqrt(np.mean((x1_32 - x1_64) ** 2))),
        "dlogp_rms_delta": float(np.sqrt(np.mean((dl_32 - dl_64) ** 2))),
        "dlogp_mean_delta": float(np.mean(dl_32 - dl_64)),
    }
    print(json.dumps({"dF_exact": float(dF_exact), "f32": results["f32"],
                      "f64": results["f64"], "cross": cross}))


if __name__ == "__main__":
    main()
