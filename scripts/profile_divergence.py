"""Microbenchmark: where does the divergence-node time go on the TPU?

Times, for the dense-pair cPaiNN at the bench config (19 atoms, F=128 x 5):
  1. primal forward (batched over chains)
  2. one exact-divergence node via linearize + vmapped tangent basis
     (the current production path, per-chain vmap)
  3. the velocity-only RK4 trajectory cost per sample

This bounds what a fused Pallas tangent kernel can buy: if (2) is close to
57x the tangent-FLOP cost of (1), we are compute-bound and fusion buys
little; if it is many times that, we are HBM-bound on tangent intermediates.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
from ti_tpu.models.cpainn import CPaiNN
from ti_tpu.models.cpainn_dense import apply_dense
from ti_tpu.ops.divergence import divergence_exact
from ti_tpu.sampling.drivers import molecular_v_fn_of


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    n_atoms = 19
    chains = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mol = make_synthetic_molecule(n_atoms=n_atoms, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=128, score_layers=5, temp_length=100.0, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    key = jax.random.PRNGKey(1)

    x = 0.1 * jax.random.normal(key, (chains, n_atoms, 3), dtype=jnp.float32)
    temps = jnp.tile(jnp.array([1000.0, 300.0], jnp.float32), (chains, 1))
    t = jnp.full((chains,), 0.5, jnp.float32)

    # 1. primal forward, batched
    fwd = jax.jit(
        lambda xx: apply_dense(model, params, xx, t, temps, template.atom_ids, template.edges)
    )
    t_fwd = timed(fwd, x)
    print(f"primal fwd   batch={chains}: {t_fwd*1e3:8.2f} ms  ({t_fwd/chains*1e6:7.1f} us/chain)")

    # 2. one divergence node (current path): vmap over chains of
    #    linearize + 57 tangent lanes
    v_fn_of = molecular_v_fn_of(model, params, template)

    def div_node(xc, tempc):
        f = v_fn_of(tempc)
        return divergence_exact(lambda xx: f(xx, 0.5), xc, chunk=16)[1]

    div_b = jax.jit(jax.vmap(div_node))
    t_div = timed(div_b, x, temps)
    d = 3 * n_atoms
    print(
        f"div node     batch={chains}: {t_div*1e3:8.2f} ms  "
        f"(= {t_div/t_fwd:6.1f}x primal; ideal-tangent ~{d}x primal-ish)"
    )
    # no-chunk variant
    def div_node_nc(xc, tempc):
        f = v_fn_of(tempc)
        return divergence_exact(lambda xx: f(xx, 0.5), xc, chunk=None)[1]

    t_div_nc = timed(jax.jit(jax.vmap(div_node_nc)), x, temps)
    print(f"div nochunk  batch={chains}: {t_div_nc*1e3:8.2f} ms")

    # 3. bf16 primal
    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )
    fwd_bf = jax.jit(
        lambda xx: apply_dense(
            model, params_bf16, xx.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
            temps.astype(jnp.bfloat16), template.atom_ids, template.edges,
        )
    )
    t_fwd_bf = timed(fwd_bf, x)
    print(f"primal bf16  batch={chains}: {t_fwd_bf*1e3:8.2f} ms  ({t_fwd/t_fwd_bf:.2f}x vs f32)")

    full_cost = 400 * t_fwd / chains + 21 * t_div / chains
    print(
        f"\nimplied full-bench cost/sample: {full_cost*1e3:.1f} ms "
        f"-> {1/full_cost:.2f} samples/s/chip "
        f"(traj {400*t_fwd/chains*1e3:.1f} ms, dlogp {21*t_div/chains*1e3:.1f} ms)"
    )


if __name__ == "__main__":
    main()
