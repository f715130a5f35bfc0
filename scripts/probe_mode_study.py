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


def _oracle_study(args):
    """End-to-end ESS/dF comparison on a TRAINED harmonic-well oracle
    (the tests/test_mdqm9_physics.py fixture, CPU-sized): train the
    transport field, then sample with GL-quadrature hutchinson dlogp per
    (probe_mode, K) and report TFEP dF error vs the closed form and the
    Kish ESS — the product metric the probe noise actually degrades."""
    from ti_tpu.analysis.free_energy import calc_phis_tfep, calc_tfep_dF
    from ti_tpu.analysis.weights import calc_ess
    from ti_tpu.config import MDQM9Config
    from ti_tpu.data.mdqm9 import (
        MDQM9AmbientDataset,
        make_synthetic_frames,
        make_synthetic_molecule,
    )
    from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of
    from ti_tpu.train.ambient import train_ambient

    T0, T1, jitter = 1000, 300, 0.4
    sig = lambda T: jitter * np.sqrt(T / 300.0)
    n = args.atoms
    d = 3 * n
    mol = make_synthetic_molecule(n_atoms=n, seed=0)
    p_eq = (mol.positions - mol.positions.mean(axis=0, keepdims=True)).astype(np.float32)

    def energy(x, T):
        xc = x - x.mean(axis=-2, keepdims=True)
        return np.sum((xc - p_eq) ** 2, axis=(-2, -1)) / (2.0 * sig(T) ** 2)

    frames = {T: make_synthetic_frames(mol, 1024, T, seed=T, jitter=jitter)
              for T in (T0, T1)}
    stack = np.concatenate([frames[T0], frames[T1]])
    temps = np.concatenate([np.full(1024, float(T0)), np.full(1024, float(T1))])
    cfg = MDQM9Config(
        n_features=args.features, score_layers=args.layers, batch_size=64,
        n_epochs=args.train_epochs, learning_rate=2e-3, gamma="brownian",
        a=0.1, temp_length=8.0, scale_trajs=False, T0s=[T0, T1], T1s=[T0, T1],
        model_save_path="/tmp/probe_mode_oracle/models",
        data_save_path="/tmp/probe_mode_oracle/out",
    )
    # --reuse: the oracle is deterministic in (atoms, features, layers,
    # epochs), so cache the trained params — on a flaky TPU tunnel the
    # qualification sweep can then iterate on (mode, K) without paying the
    # training run again after a stall/retry.
    import os

    from ti_tpu.train import common as train_common
    from ti_tpu.train.ambient import build_ambient_model

    dataset = MDQM9AmbientDataset.from_arrays(stack, temps, mol)
    ckpt = os.path.abspath(
        f"/tmp/probe_mode_oracle/ckpt_a{n}_f{args.features}"
        f"_l{args.layers}_e{args.train_epochs}"
    )
    if args.reuse and os.path.exists(ckpt):
        print(f"reusing the trained oracle at {ckpt}", file=sys.stderr, flush=True)
        model = build_ambient_model(cfg)
        # cross-backend restores (a chip-saved oracle reopened under
        # JAX_PLATFORMS=cpu) are handled inside load_checkpoint
        params = train_common.load_checkpoint(ckpt)["params"]
        res = {"model": model, "params": params,
               "template": dataset.template}
    else:
        print(f"training the harmonic oracle: {n} atoms (d={d}), "
              f"F={args.features} x {args.layers}, {args.train_epochs} epochs",
              file=sys.stderr, flush=True)
        res = train_ambient(cfg, dataset, dataset)
        if args.reuse:
            train_common.save_checkpoint(ckpt, {"params": res["params"]})
    v_of = molecular_v_fn_of(res["model"], res["params"], res["template"])

    n_chains = args.chains
    x0 = make_synthetic_frames(mol, n_chains, T0, seed=999, jitter=jitter)
    tt = jnp.tile(jnp.array([float(T0), float(T1)]), (n_chains, 1))
    dF_exact = -3 * (n - 1) * np.log(sig(T1) / sig(T0))
    key = jax.random.PRNGKey(args.seed)

    def run(divergence, k=None, mode="rademacher", crn=False):
        sampler = make_ode_sampler(
            v_of, solver="rk4", n_steps=16, n_save=2, return_dlogp=True,
            divergence=divergence, num_probes=k or 8, probe_mode=mode,
            probe_crn=crn, dlogp_quad_points=8, dlogp_quad="gauss",
        )
        sol = sampler(jnp.asarray(x0), tt, key)
        x1 = np.asarray(sol.xs[:, -1])
        dlogp = np.asarray(sol.dlogp[:, -1])
        phis, _ = calc_phis_tfep(energy(x0, T0), energy(x1, T1), dlogp)
        log_w = -phis
        w = np.exp(log_w - log_w.max())
        return (float(abs(calc_tfep_dF(phis) - dF_exact)),
                100.0 * float(calc_ess(w)) / n_chains,
                float(np.std(dlogp)))

    err, ess, _ = run("exact")
    print(f"exact       : dF err {err:7.4f}  ESS {ess:5.1f}%  (dF_exact={dF_exact:.3f})",
          flush=True)
    rows = [{"mode": "exact", "K": d, "dF_err": err, "ess_pct": ess}]
    for k in [int(s) for s in args.probes.split(",")]:
        for mode in ("rademacher", "orthogonal"):
            if mode == "orthogonal" and k > d:
                continue
            for crn in ((False, True) if args.crn else (False,)):
                err, ess, sd = run("hutchinson", k, mode, crn)
                tag = f"{mode}{'+crn' if crn else ''}"
                rows.append({"mode": tag, "K": k, "dF_err": err, "ess_pct": ess})
                print(f"{tag:15s} K={k:3d}: dF err {err:7.4f}  ESS {ess:5.1f}%  "
                      f"dlogp std {sd:6.3f}", flush=True)
    print("rows: " + json.dumps(rows), flush=True)


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
    ap.add_argument("--oracle", action="store_true",
                    help="train the CPU-sized harmonic oracle and compare "
                    "end-to-end TFEP dF/ESS per probe mode instead of raw "
                    "estimator rms")
    ap.add_argument("--train_epochs", type=int, default=60)
    ap.add_argument("--reuse", action="store_true",
                    help="(--oracle) cache/reload the trained oracle params "
                    "under /tmp/probe_mode_oracle keyed on the arch flags — "
                    "lets a qualification sweep survive tunnel stalls "
                    "without retraining")
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--crn", action="store_true",
                    help="(--oracle) also report probe_crn=True rows — the "
                    "common-random-numbers interplay per probe mode")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.oracle:
        if args.params:
            ap.error(
                "--oracle trains its own closed-form harmonic field and "
                "cannot evaluate an external checkpoint; for the trained "
                "production oracle use validate_mdqm9_physics.py --reuse "
                "--probe_mode ... (end-to-end) or this script's --params "
                "mode (raw estimator rms)."
            )
        _oracle_study(args)
        return

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.ops.divergence import divergence_exact, divergence_hutchinson
    from ti_tpu.sampling.drivers import molecular_v_fn_of
    from ti_tpu.sampling.integrators import sample_ode

    atoms, features, layers, temp_length = (
        args.atoms, args.features, args.layers, 100.0
    )
    ckpt = None
    if args.params:
        from ti_tpu.train import common as train_common

        # read the recorded architecture (the validate_mdqm9_physics 'arch'
        # dict) and honor it over the CLI flags — temp_length changes no
        # param shapes, so a silent mismatch would garble the temperature
        # conditioning. Cross-backend restores (a chip-saved oracle opened
        # under JAX_PLATFORMS=cpu) are handled inside load_checkpoint.
        ckpt = train_common.load_checkpoint(args.params)
        arch = ckpt.get("arch") if isinstance(ckpt, dict) else None
        if arch is not None:
            atoms = int(np.asarray(arch["atoms"]))
            features = int(np.asarray(arch["features"]))
            layers = int(np.asarray(arch["layers"]))
            temp_length = float(np.asarray(arch["temp_length"]))
            if (atoms, features, layers) != (args.atoms, args.features, args.layers):
                print(f"[probe_mode_study] using the checkpoint's arch "
                      f"(atoms={atoms}, F={features}, layers={layers}, "
                      f"temp_length={temp_length:g}) over the CLI flags",
                      file=sys.stderr, flush=True)

    mol = make_synthetic_molecule(n_atoms=atoms, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=features, score_layers=layers,
                   temp_length=temp_length, conditioning="ambient")
    if ckpt is not None:
        params = ckpt["params"] if isinstance(ckpt, dict) and "params" in ckpt else ckpt
        field = "trained"
    else:
        params = model.init(jax.random.PRNGKey(0), template)
        field = "random-init"
    args.atoms = atoms  # downstream shapes follow the resolved arch

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
    print(f"probe-mode study: {atoms} atoms (d={d}), F={features} x "
          f"{layers}, {field} field, {args.keys} keys x {args.nodes} nodes",
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
