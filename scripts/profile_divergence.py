"""Microbenchmark: where does the divergence-node time go on the TPU?

Times, for the dense-pair cPaiNN at the bench config (19 atoms, F=128 x 5):
  1. primal forward (batched over chains), unfused vs Pallas-fused
  2. one exact-divergence node (linearize + vmapped tangent basis),
     unfused vs fused custom-JVP tangent kernels
  3. implied full-bench cost

Timing method: the axon tunnel's ``block_until_ready`` is unreliable
(enqueue-ack rather than completion in some paths) and a host read costs
~30 ms round trip. So every measurement wraps ``reps`` evaluations in a
device-side ``lax.scan`` with a scalar accumulator and is forced by ONE
scalar host read; the measured round-trip latency is subtracted.
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


from ti_tpu.utils.timing import device_time as timed, host_round_trip_latency


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

    print(f"round-trip latency: {host_round_trip_latency()*1e3:.1f} ms")

    def fwd(fused):
        def f(xx, i):
            return apply_dense(
                model, params, xx + 1e-3 * i, t, temps,
                template.atom_ids, template.edges, fused=fused,
            )
        return f

    # Pallas kernels only lower on TPU — skip the fused rows elsewhere so
    # the stochastic/exact comparisons still run on a CPU dev box
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")

    t_fwd = timed(fwd(False), x, reps=32)
    print(f"primal fwd    batch={chains}: {t_fwd*1e3:8.2f} ms  ({t_fwd/chains*1e6:7.1f} us/chain)")
    t_fwd_fused = t_fwd
    if on_tpu:
        t_fwd_fused = timed(fwd(True), x, reps=16)
        print(f"primal fused  batch={chains}: {t_fwd_fused*1e3:8.2f} ms  ({t_fwd/t_fwd_fused:.2f}x vs unfused)")

    def div(impl, chunk, compute_dtype=None):
        v_fn_of = molecular_v_fn_of(
            model, params, template, impl=impl, compute_dtype=compute_dtype
        )

        def f(xx, i):
            def one(xc, tempc):
                g = v_fn_of(tempc)
                return divergence_exact(lambda y: g(y, 0.5), xc + 1e-3 * i, chunk=chunk)[1]

            return jax.vmap(one)(xx, temps)

        return f

    t_div = timed(div("dense", 16), x, reps=4)
    print(f"div chunk16   batch={chains}: {t_div*1e3:8.2f} ms  (= {t_div/t_fwd:6.1f}x primal)")
    t_div_nc = timed(div("dense", None), x, reps=4)
    print(f"div nochunk   batch={chains}: {t_div_nc*1e3:8.2f} ms")
    t_div_bf = timed(div("dense", None, jnp.bfloat16), x, reps=4)
    print(f"div bf16      batch={chains}: {t_div_bf*1e3:8.2f} ms  ({t_div_nc/t_div_bf:.2f}x vs f32; headline path)")
    t_div_agg = timed(div("dense", None, "bf16_agg"), x, reps=4)
    print(f"div bf16agg   batch={chains}: {t_div_agg*1e3:8.2f} ms  ({t_div_bf/t_div_agg:.2f}x vs bf16; bf16 dot outputs)")
    t_div_f = t_div_nc
    if on_tpu:
        t_div_f = timed(div("dense_fused", None), x, reps=4)
        print(f"div fused     batch={chains}: {t_div_f*1e3:8.2f} ms  ({t_div_nc/t_div_f:.2f}x vs nochunk)")

    # stochastic nodes at the qualified probe counts: rademacher vs the
    # orthogonal Haar frame (same lane count + one (d, K) QR — measures
    # whether the QR costs anything per node on-chip; ROADMAP open lever)
    from ti_tpu.ops.divergence import divergence_hutchinson

    def div_hutch(k, mode, compute_dtype=None):
        v_fn_of = molecular_v_fn_of(
            model, params, template, impl="dense", compute_dtype=compute_dtype
        )

        def f(xx, i):
            def one(xc, tempc):
                g = v_fn_of(tempc)
                return divergence_hutchinson(
                    lambda y: g(y, 0.5), xc + 1e-3 * i,
                    jax.random.fold_in(key, jnp.int32(i)), num_probes=k,
                    probe_mode=mode,
                )[1]

            return jax.vmap(one)(xx, temps)

        return f

    for k in (16, 32):
        t_r = timed(div_hutch(k, "rademacher"), x, reps=4)
        t_o = timed(div_hutch(k, "orthogonal"), x, reps=4)
        print(f"div hutch-{k:2d}  batch={chains}: rademacher {t_r*1e3:8.2f} ms | "
              f"orthogonal {t_o*1e3:8.2f} ms ({t_r/max(t_o,1e-9):.2f}x)")

    from ti_tpu.ops.dense_divergence import dense_divergence

    def div_hand(chunk):
        def f(xx, i):
            def one(xc, tempc):
                return dense_divergence(
                    model, params, xc + 1e-3 * i, jnp.asarray(0.5), tempc,
                    template.atom_ids, template.edges, lane_chunk=chunk,
                )[1]

            return jax.vmap(one)(xx, temps)

        return f

    t_div_h = timed(div_hand(None), x, reps=4)
    print(f"div hand-jvp  batch={chains}: {t_div_h*1e3:8.2f} ms  ({t_div_nc/t_div_h:.2f}x vs nochunk)")
    t_div_h8 = timed(div_hand(19), x, reps=4)
    print(f"div hand c19  batch={chains}: {t_div_h8*1e3:8.2f} ms")

    best_div = min(t_div, t_div_nc, t_div_f, t_div_h, t_div_h8)
    best_fwd = min(t_fwd, t_fwd_fused)
    full_cost = 400 * best_fwd / chains + 10 * best_div / chains  # GL-10 nodes
    print(
        f"\nimplied full-bench cost/sample (best paths): {full_cost*1e3:.1f} ms "
        f"-> {1/full_cost:.2f} samples/s/chip "
        f"(traj {400*best_fwd/chains*1e3:.1f} ms, dlogp {10*best_div/chains*1e3:.1f} ms)"
    )


if __name__ == "__main__":
    main()
