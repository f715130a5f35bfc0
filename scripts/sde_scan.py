"""Microbenchmark: SDE (Euler-Maruyama) sampling throughput, chains x dtype.

The SDE path (SURVEY.md north-star: "MDQM9 ambient SDE sampling"; the
reference has NO SDE sampler — its rollout is ODE-through-torchdiffeq
only, mdqm9/thermo/ambient/integrators.py:8-68) has no dlogp, so its
cost is n_steps batched dense-pair forwards — throughput scales with the
chain batch until HBM saturates. This scan finds the per-chip sweet spot
over (chains, compute_dtype) at the bench config.

Timing follows the repo convention (BASELINE.md methodology): the whole
rollout is one jitted dispatch fenced by a scalar host readback; report
best-of-N reps (tunnel-load wobble inflates means). The round-trip latency
(~30 ms) is negligible at these multi-second rollouts.

Usage (defaults = the pending round-2 scan):
    python scripts/sde_scan.py
    python scripts/sde_scan.py --chains 512,2048,4096 --dtypes f32,bf16_agg
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
from ti_tpu.sampling.drivers import sample_molecular_sde

_DTYPES = {"f32": None, "bf16": jnp.bfloat16, "bf16_agg": "bf16_agg"}


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--atoms", type=int, default=19)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--g", type=float, default=0.1)
    p.add_argument("--reps", type=int, default=3, help="best-of-N timed reps")
    p.add_argument(
        "--chains", type=str, default="512,1024,2048,4096",
        help="comma-separated chain batch sizes",
    )
    p.add_argument(
        "--dtypes", type=str, default="f32,bf16,bf16_agg",
        help=f"comma-separated subset of {sorted(_DTYPES)}",
    )
    p.add_argument(
        "--impls", type=str, default="dense",
        help="comma-separated subset of {dense,pair_kernel}; pair_kernel "
        "(the fused pair-layer Pallas kernel) supports f32 and bf16_agg "
        "(the bf16 VMEM profile), so plain-bf16 is skipped for it",
    )
    p.add_argument(
        "--chain_blocks", type=str, default="1",
        help="comma-separated chains-per-grid-step for pair_kernel "
        "(ops/pair_layer_kernel.py chain_block; dense ignores it — the "
        "VERDICT-r4 MXU-occupancy axis)",
    )
    args = p.parse_args()

    chain_list = [int(c) for c in args.chains.split(",")]
    dtype_list = args.dtypes.split(",")
    unknown = [d for d in dtype_list if d not in _DTYPES]
    if unknown:
        p.error(f"unknown dtypes {unknown}; choose from {sorted(_DTYPES)}")
    impl_list = args.impls.split(",")
    unknown = [i for i in impl_list if i not in ("dense", "pair_kernel")]
    if unknown:
        p.error(f"unknown impls {unknown}; choose from ['dense', 'pair_kernel']")
    cb_list = [int(cb) for cb in args.chain_blocks.split(",")]

    mol = make_synthetic_molecule(n_atoms=args.atoms, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(
        n_features=args.features,
        score_layers=args.layers,
        temp_length=100.0,
        conditioning="ambient",
    )
    params = model.init(jax.random.PRNGKey(0), template)
    key = jax.random.PRNGKey(1)
    print(
        f"SDE scan: {args.atoms} atoms, F={args.features} x {args.layers}, "
        f"{args.steps} steps, g={args.g}, best-of-{args.reps}",
        file=sys.stderr,
        flush=True,
    )

    results = []
    for chains in chain_list:
        x0 = 0.1 * jax.random.normal(key, (chains, args.atoms, 3), jnp.float32)
        x0 = x0 - x0.mean(axis=1, keepdims=True)
        temps = jnp.tile(jnp.array([1000.0, 300.0], jnp.float32), (chains, 1))
        for impl in impl_list:
          for cb in (cb_list if impl == "pair_kernel" else [1]):
            for dname in dtype_list:
                if impl == "pair_kernel" and dname not in ("f32", "bf16_agg"):
                    continue
                cd = _DTYPES[dname]
                tag = f"{dname}/{impl}" if len(impl_list) > 1 else dname
                if cb != 1:
                    tag += f"/cb{cb}"

                def run(k):
                    out = sample_molecular_sde(
                        model, params, template, x0, temps, k,
                        g_fn=args.g, n_steps=args.steps, compute_dtype=cd,
                        forward_impl=impl, chain_block=cb,
                    )
                    return float(jnp.sum(out))  # scalar readback fence

                try:
                    t0 = time.perf_counter()
                    run(key)
                    print(
                        f"  chains={chains} {tag}: warmup "
                        f"{time.perf_counter() - t0:.1f}s",
                        file=sys.stderr,
                        flush=True,
                    )
                    best = 0.0
                    for i in range(args.reps):
                        t0 = time.perf_counter()
                        run(jax.random.fold_in(key, i))
                        best = max(best, chains / (time.perf_counter() - t0))
                except Exception as e:  # OOM at large chain counts is a data point
                    print(
                        f"chains={chains:5d} {tag:14s}: FAILED "
                        f"({type(e).__name__}: {str(e)[:120]})",
                        flush=True,
                    )
                    continue
                results.append(
                    {"chains": chains, "dtype": dname, "impl": impl,
                     "chain_block": cb, "samples_per_s": best}
                )
                print(
                    f"chains={chains:5d} {tag:14s}: {best:9.1f} samples/s",
                    flush=True,
                )

    if results:
        top = max(results, key=lambda r: r["samples_per_s"])
        print("best: " + json.dumps(top), flush=True)


if __name__ == "__main__":
    main()
