"""Microbenchmark/study: Hutchinson probe distributions on the velocity field.

Compares the stochastic-divergence estimators per probe budget at states
along a short transport trajectory of the bench-scale cPaiNN field:

  - rademacher  : iid +-1 probes (the classic Hutchinson draw; production)
  - orthogonal  : Haar-orthonormal probe frame scaled by d/K — unbiased for
                  any J, EXACT at K = dim (ops/divergence.py::_probe_block)

For each (mode, K) it reports the per-node estimator std across keys and
the implied per-sample dlogp noise scale (std / sqrt(K-budget) aggregated
over quadrature nodes is what lands in the importance weights — the ESS
driver, BASELINE.md probe-study rows). The exact trace is the ground truth
at every node.

Run on CPU (random-init field; ratios indicative) or on the chip with a
TRAINED oracle (--params <out_dir>/oracle_params from
scripts/validate_mdqm9_physics.py — the qualification-grade comparison;
random-init fields overstate errors, CLAUDE.md bf16 rule applies to probe
studies too).

Usage:
    python scripts/probe_mode_study.py --keys 32 --probes 8,16,32
    python scripts/probe_mode_study.py --params /tmp/prod_oracle/oracle_params \
        --atoms 19 --features 128 --layers 5
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--atoms", type=int, default=19)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--params", default=None,
                    help="orbax checkpoint dir holding {'params': ...} "
                    "(oracle_params from validate_mdqm9_physics.py)")
    ap.add_argument("--keys", type=int, default=32,
                    help="independent probe draws per (mode, K, node)")
    ap.add_argument("--probes", default="8,16,32",
                    help="comma-separated probe budgets K")
    ap.add_argument("--nodes", type=int, default=4,
                    help="trajectory states (quadrature-node stand-ins)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.ops.divergence import divergence_exact, divergence_hutchinson
    from ti_tpu.sampling.drivers import molecular_v_fn_of
    from ti_tpu.sampling.integrators import sample_ode

    mol = make_synthetic_molecule(n_atoms=args.atoms, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=args.features, score_layers=args.layers,
                   temp_length=100.0, conditioning="ambient")
    if args.params:
        from ti_tpu.train import common as train_common

        like = {"params": model.init(jax.random.PRNGKey(0), template)}
        ckpt = train_common.load_checkpoint(args.params)
        params = ckpt["params"] if isinstance(ckpt, dict) and "params" in ckpt else ckpt
        del like
        field = "trained"
    else:
        params = model.init(jax.random.PRNGKey(0), template)
        field = "random-init"

    v_of = molecular_v_fn_of(model, params, template)
    cond = jnp.array([1000.0, 300.0], jnp.float32)
    v = v_of(cond)

    key = jax.random.PRNGKey(args.seed)
    x0 = 0.1 * jax.random.normal(key, (args.atoms, 3), jnp.float32)
    x0 = x0 - x0.mean(axis=0, keepdims=True)
    # states along a short velocity-only rollout = realistic quadrature nodes
    sol = sample_ode(v, x0, n_steps=args.nodes * 2, n_save=args.nodes + 1,
                     method="rk4", return_dlogp=False)
    xs = sol.xs[1:]  # skip the (synthetic) start state
    ts = jnp.linspace(0.0, 1.0, args.nodes + 1)[1:]

    d = args.atoms * 3
    probe_list = [int(k) for k in args.probes.split(",")]
    print(f"probe-mode study: {args.atoms} atoms (d={d}), F={args.features} x "
          f"{args.layers}, {field} field, {args.keys} keys x {args.nodes} nodes",
          file=sys.stderr, flush=True)

    @jax.jit
    def exact_at(x, t):
        return divergence_exact(lambda y: v(y, t), x)[1]

    def est_fn(mode, k):
        @jax.jit
        def one(x, t, key):
            return divergence_hutchinson(
                lambda y: v(y, t), x, key, num_probes=k, probe_mode=mode
            )[1]
        return one

    exact = np.array([float(exact_at(xs[i], ts[i])) for i in range(args.nodes)])
    print(f"exact div per node: {np.array2string(exact, precision=3)}",
          file=sys.stderr, flush=True)

    rows = []
    for mode in ("rademacher", "orthogonal"):
        for k in probe_list:
            if mode == "orthogonal" and k > d:
                continue
            one = est_fn(mode, k)
            errs = []
            for i in range(args.nodes):
                vals = np.array([
                    float(one(xs[i], ts[i], jax.random.fold_in(key, 1000 * i + r)))
                    for r in range(args.keys)
                ])
                errs.append(vals - exact[i])
            errs = np.concatenate(errs)
            rows.append({
                "mode": mode, "K": k,
                "rms_err": float(np.sqrt(np.mean(errs ** 2))),
                "bias": float(np.mean(errs)),
            })
            print(f"{mode:11s} K={k:3d}: rms err {rows[-1]['rms_err']:8.4f} "
                  f"(bias {rows[-1]['bias']:+.4f})", flush=True)

    # headline ratio at each shared budget
    for k in probe_list:
        r = {x["mode"]: x for x in rows if x["K"] == k}
        if len(r) == 2 and r["orthogonal"]["rms_err"] > 0:
            print(f"K={k:3d}: orthogonal/rademacher rms ratio = "
                  f"{r['orthogonal']['rms_err'] / max(r['rademacher']['rms_err'], 1e-12):.3f}",
                  flush=True)
    print("rows: " + json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
