"""Sampling drivers: batched transport with dlogp + .npy artifact output.

Counterparts of the reference entry scripts (adw/sample.py,
mdqm9/sample_ambient.py, mdqm9/sample_latent.py). The artifact-oriented
pipeline shape is kept — initial_samples/samples/dlogps .npy files written
incrementally after every batch so a crash loses at most one batch
(mdqm9/sample_ambient.py:85-101) — but the integration itself is a single
jitted vmap-of-scan per batch: thousands of chains per dispatch instead of
the reference's one adaptive torchdiffeq solve per PyG batch.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ti_tpu.config import ADWConfig, MDQM9Config
from ti_tpu.models.cpainn import MolGraph
from ti_tpu.sampling.integrators import ODESolution, sample_ode, sample_ode_dopri5

Array = jax.Array


def _compute_dtype(cfg):
    """Map the config's compute_dtype string to a jnp dtype (None = f32
    default). bf16 is the opt-in mixed-precision sampling path
    (models/cpainn_dense.apply_dense; ROADMAP item 2)."""
    name = getattr(cfg, "compute_dtype", "f32")
    if name in ("f32", "float32", ""):
        return None
    if name in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if name == "bf16_agg":
        # aggressive profile: bf16 dot outputs too (models/cpainn_dense)
        return "bf16_agg"
    raise ValueError(f"unknown compute_dtype {name!r} (use f32, bf16 or bf16_agg)")


def _chain_keys(key, n, crn: bool):
    """Per-chain PRNG keys; with ``crn`` every chain gets the SAME key
    (common random numbers). For stochastic divergences the probe noise in
    dlogp then correlates across chains — self-normalized importance
    weights are invariant to the COMMON component of that noise, so CRN
    recovers part of the ESS the independent draws give away
    (BASELINE.md probe-study rows). No effect on exact divergence."""
    if crn:
        return jnp.broadcast_to(key, (n,) + jnp.shape(key))
    return jax.random.split(key, n)


def make_ode_sampler(
    v_fn_of: Callable,
    *,
    solver: str = "dopri5",
    n_steps: int = 100,
    n_save: int = 2,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    return_dlogp: bool = True,
    divergence: str = "exact",
    div_chunk=None,
    t0: float = 0.0,
    t1: float = 1.0,
    steps_per_dispatch: Optional[int] = None,
    max_steps: int = 1024,
    dlogp_quad_points: Optional[int] = None,
    dlogp_quad: str = "simpson",
    num_probes: int = 8,
    div_axis: Optional[str] = None,
    probe_crn: bool = False,
    probe_mode: str = "rademacher",
    node_batch: Optional[int] = None,
    traj_drift: Optional[Callable] = None,
    div_drift: Optional[Callable] = None,
    return_dlogp_var: bool = False,
):
    """Build a batched transport sampler.

    ``v_fn_of(cond) -> v(x, t)`` builds the per-chain velocity closure from
    per-chain conditioning (a pytree; e.g. (T0, T1) scalars). Returns
    ``sampler(x0s, conds, key) -> ODESolution`` batched over axis 0.

    ``traj_drift`` (quadrature-decoupled gauss path with
    ``steps_per_dispatch`` only): a BATCHED drift ``(xs, t, conds) -> vs``
    used for the velocity-only TRAJECTORY segments in place of
    vmap(v_fn_of(cond)) — the divergence nodes keep ``v_fn_of`` (they need
    ``jax.linearize``, which a custom forward like the fused pair-layer
    Pallas kernel does not support). Same RK tableau, so the trajectories
    agree to fp reordering (tests/test_pair_layer_kernel.py).

    ``div_drift`` (same gauss path as ``traj_drift``): a BATCHED
    divergence-node estimator ``(xs (B,N,3), t, conds, key) -> (B,)`` used
    in place of the per-chain ``jax.linearize`` + probe-lane vmap — e.g.
    ``ops.pair_tangent_kernel.pair_tangent_div_fn``, which carries the
    Hutchinson tangent lanes through the message layers in VMEM (the
    HBM-bound cost center of the dlogp headline, BASELINE.md). The
    estimator's probe DRAWS differ from ``divergence_hutchinson`` (other
    key schedule), so use the physics oracle for qualification.

    ``return_dlogp_var`` (gauss quadrature path, divergence='hutchinson'
    only) fills ``ODESolution.dlogp_var`` with the accumulated plug-in
    variance of the probe noise in dlogp — the debias input for
    exp(-phi) consumers (phi += dlogp_var/2 removes the ~var/2 bias in
    -log E[w]; ops.divergence.hutchinson_var_estimate). With
    ``div_drift`` the callable must then return (div, var) per batch
    (``pair_tangent_div_fn(return_var=True)``).

    ``steps_per_dispatch`` bounds the number of integrator steps per DEVICE
    DISPATCH: the integration is resumed across multiple jitted calls (one
    compile; start time / dlogp are carried). This keeps each dispatch under
    execution deadlines and enables host-side progress/checkpointing on very
    long rollouts. None = the whole rollout in one dispatch.

    ``dlogp_quad_points`` (fixed-step solvers only) switches to the
    quadrature-decoupled dlogp path: the trajectory is integrated with cheap
    velocity-only steps and the divergence is integrated over few nodes —
    ~(3N·n_stages·n_steps)/(3N·K) ≈ 15-40x cheaper at parity-level accuracy
    for smooth trained fields (accuracy quantified in
    tests/test_integrators.py and tests/test_adw_physics.py).
    ``dlogp_quad`` selects the rule: "simpson" (composite, dlogp_quad_points
    odd total nodes; integrators.sample_ode_quad_dlogp) or "gauss"
    (Gauss-Legendre, dlogp_quad_points nodes PER SAVE INTERVAL — typically
    8 nodes match Simpson-21+; integrators.sample_ode_gauss_dlogp).

    ``node_batch`` (quadrature paths only) evaluates the divergence nodes
    in vmapped groups of this size instead of strictly sequentially — the
    per-node results are identical (tests/test_integrators.py::
    test_node_batch_matches_sequential). MEASURED DEAD END on v5e at both
    production scales (ROADMAP.md): the divergence node is HBM-bound, so
    batching nodes only multiplies live tangent buffers — 00031/128-chain
    headline 125->111 samples/s at node_batch=4 (OOM at 8), 10506/16-chain
    14.0->12.4 (OOM at 8); exact divergence OOMs at node_batch=2. Kept as
    the experiment record; leave at None.
    """

    if return_dlogp and divergence == "hutchpp" and div_axis is not None:
        raise NotImplementedError(
            "div_axis lane sharding is not implemented for "
            "divergence='hutchpp' (the sketch QR needs the full query "
            "basis); every lane shard would redundantly compute the full "
            "estimator. Use divergence='exact' or 'hutchinson' with "
            "div_axis, or drop div_axis."
        )

    # deadline warnings are conditioned on divergence='exact': hutchinson
    # runs one tangent lane and sits far from any dispatch deadline
    if return_dlogp and dlogp_quad_points is None and divergence == "exact":
        import sys

        if solver == "dopri5" and steps_per_dispatch is None:
            # with steps_per_dispatch set, _segmented_dopri5_sampler bounds
            # every dispatch via max_steps — no warning needed there
            print(
                "[ti_tpu] WARNING: dopri5 with exact dlogp runs an UNBOUNDED "
                "adaptive NFE count (full divergence per RHS eval) in one "
                "device dispatch. On remote/tunneled TPUs set "
                "steps_per_dispatch= (the resumable segmented dopri5 bounds "
                "each dispatch), or prefer a fixed-step solver with the "
                "quadrature-decoupled dlogp (solver='rk4', "
                "dlogp_quad_points=8, dlogp_quad='gauss' — the benchmarked "
                "fast path), or divergence='hutchinson'.",
                file=sys.stderr,
            )
        elif steps_per_dispatch is None and n_steps > 32:
            print(
                "[ti_tpu] WARNING: stage-coupled exact-dlogp transport with "
                f"n_steps={n_steps} runs the full divergence inside EVERY "
                "solver stage in ONE device dispatch — on remote/tunneled "
                "TPUs this can exceed the execution deadline and crash the "
                "worker. Set steps_per_dispatch= to bound each dispatch, or "
                "use the quadrature-decoupled dlogp (dlogp_quad_points=8, "
                "dlogp_quad='gauss' — the benchmarked fast path).",
                file=sys.stderr,
            )

    if (traj_drift is not None or div_drift is not None) and not (
        dlogp_quad_points is not None and return_dlogp
        and dlogp_quad == "gauss" and steps_per_dispatch is not None
    ):
        raise ValueError(
            "traj_drift/div_drift require the segmented gauss "
            "quadrature-dlogp path (dlogp_quad='gauss', dlogp_quad_points=, "
            "steps_per_dispatch=)"
        )
    if return_dlogp_var and not (
        dlogp_quad_points is not None and return_dlogp and dlogp_quad == "gauss"
    ):
        raise ValueError(
            "return_dlogp_var requires the gauss quadrature-dlogp path "
            "(dlogp_quad='gauss', dlogp_quad_points=, return_dlogp=True)"
        )
    if dlogp_quad_points is not None and return_dlogp:
        if solver == "dopri5":
            raise ValueError("dlogp_quad_points requires a fixed-step solver")
        if dlogp_quad == "gauss":
            return _gauss_dlogp_sampler(
                v_fn_of, solver=solver, t0=t0, t1=t1, n_steps=n_steps,
                n_save=n_save, gl_points=dlogp_quad_points,
                divergence=divergence, div_chunk=div_chunk,
                steps_per_dispatch=steps_per_dispatch, num_probes=num_probes,
                div_axis=div_axis, probe_crn=probe_crn, probe_mode=probe_mode,
                node_batch=node_batch, traj_drift=traj_drift,
                div_drift=div_drift, return_dlogp_var=return_dlogp_var,
            )
        return _quad_dlogp_sampler(
            v_fn_of, solver=solver, t0=t0, t1=t1, n_steps=n_steps,
            n_save=n_save, div_points=dlogp_quad_points,
            divergence=divergence, div_chunk=div_chunk,
            steps_per_dispatch=steps_per_dispatch, num_probes=num_probes,
            div_axis=div_axis, probe_crn=probe_crn, probe_mode=probe_mode,
            node_batch=node_batch,
        )

    if steps_per_dispatch is None:

        def one(x0, cond, key):
            v = v_fn_of(cond)
            if solver == "dopri5":
                return sample_ode_dopri5(
                    v, x0, t0=t0, t1=t1, n_save=n_save, atol=atol, rtol=rtol,
                    max_steps=max_steps, return_dlogp=return_dlogp,
                    divergence=divergence, key=key, div_chunk=div_chunk,
                    num_probes=num_probes, div_axis=div_axis,
                    probe_mode=probe_mode,
                )
            return sample_ode(
                v, x0, t0=t0, t1=t1, n_steps=n_steps, n_save=n_save, method=solver,
                return_dlogp=return_dlogp, divergence=divergence, key=key,
                div_chunk=div_chunk, num_probes=num_probes, div_axis=div_axis,
                probe_mode=probe_mode,
            )

        @jax.jit
        def sampler(x0s, conds, key):
            keys = _chain_keys(key, x0s.shape[0], probe_crn)
            return jax.vmap(one)(x0s, conds, keys)

        return sampler

    if solver == "dopri5":
        return _segmented_dopri5_sampler(
            v_fn_of, t0=t0, t1=t1, n_save=n_save, atol=atol, rtol=rtol,
            return_dlogp=return_dlogp, divergence=divergence,
            div_chunk=div_chunk, steps_per_dispatch=steps_per_dispatch,
        )
    return _segmented_fixed_sampler(
        v_fn_of, solver=solver, t0=t0, t1=t1, n_steps=n_steps, n_save=n_save,
        return_dlogp=return_dlogp, divergence=divergence, div_chunk=div_chunk,
        steps_per_dispatch=steps_per_dispatch, num_probes=num_probes,
        div_axis=div_axis, probe_crn=probe_crn, probe_mode=probe_mode,
    )


def _segments_per_interval(per_save: int, steps_per_dispatch: int) -> int:
    """Smallest q dividing per_save with per_save/q <= steps_per_dispatch."""
    q = max(1, -(-per_save // steps_per_dispatch))
    while per_save % q:
        q += 1
    return q


def _segmented_fixed_sampler(
    v_fn_of, *, solver, t0, t1, n_steps, n_save, return_dlogp, divergence,
    div_chunk, steps_per_dispatch, num_probes=8, div_axis=None,
    probe_crn=False, probe_mode="rademacher",
):
    per_save = n_steps // (n_save - 1)
    q = _segments_per_interval(per_save, steps_per_dispatch)
    sub_steps = per_save // q
    seg_span = (t1 - t0) / (n_steps // sub_steps)
    n_stages = {"euler": 1, "heun": 2, "rk4": 4}[solver]

    @jax.jit
    def seg(x, lp, conds, keys, t_start):
        def one(x0, lp0, cond, key):
            sol = sample_ode(
                v_fn_of(cond), x0, t0=t_start, t1=t_start + seg_span,
                n_steps=sub_steps, n_save=2, method=solver, dlogp0=lp0,
                return_dlogp=return_dlogp, divergence=divergence, key=key,
                div_chunk=div_chunk, num_probes=num_probes, div_axis=div_axis,
                probe_mode=probe_mode,
            )
            return sol.xs[-1], sol.dlogp[-1]

        return jax.vmap(one)(x, lp, conds, keys)

    def sampler(x0s, conds, key):
        c = x0s.shape[0]
        x = jnp.asarray(x0s)
        lp = jnp.zeros((c,), x.dtype)
        xs_saves, lp_saves = [x], [lp]
        n_segments = (n_save - 1) * q
        for si in range(n_segments):
            keys = _chain_keys(jax.random.fold_in(key, si), c, probe_crn)
            t_start = jnp.asarray(t0 + si * seg_span, x.dtype)
            x, lp = seg(x, lp, conds, keys, t_start)
            if (si + 1) % q == 0:
                xs_saves.append(x)
                lp_saves.append(lp)
        nfe = jnp.asarray(n_steps * n_stages, jnp.int32)
        return ODESolution(
            xs=jnp.stack(xs_saves, axis=1), dlogp=jnp.stack(lp_saves, axis=1), nfe=nfe
        )

    return sampler


def _quad_dlogp_sampler(
    v_fn_of, *, solver, t0, t1, n_steps, n_save, div_points, divergence,
    div_chunk, steps_per_dispatch, num_probes=8, div_axis=None,
    probe_crn=False, probe_mode="rademacher", node_batch=None,
):
    """Driver-level quadrature-decoupled dlogp: velocity-only transport
    saving the div grid (optionally segmented into bounded dispatches),
    then ONE bounded divergence dispatch per grid node."""
    from ti_tpu.ops.divergence import (
        divergence_exact,
        divergence_hutchinson,
        divergence_hutchpp,
    )
    from ti_tpu.sampling.integrators import sample_ode_quad_dlogp

    m = div_points - 1
    if div_points < 3 or div_points % 2 == 0 or n_steps % m != 0:
        raise ValueError("div_points must be odd >= 3 and (div_points-1) | n_steps")
    if (n_save - 1) <= 0 or m % (n_save - 1) != 0 or (m // (n_save - 1)) % 2 != 0:
        raise ValueError("n_save-1 must divide div_points-1 with even quotient")

    if steps_per_dispatch is None:
        # single-dispatch: the integrator-level implementation end to end
        @jax.jit
        def sampler_single(x0s, conds, key):
            keys = _chain_keys(key, x0s.shape[0], probe_crn)
            return jax.vmap(
                lambda x, c, k: sample_ode_quad_dlogp(
                    v_fn_of(c), x, t0=t0, t1=t1, n_steps=n_steps,
                    div_points=div_points, n_save=n_save, method=solver,
                    divergence=divergence, key=k, div_chunk=div_chunk,
                    num_probes=num_probes, div_axis=div_axis,
                    probe_mode=probe_mode, node_batch=node_batch,
                )
            )(x0s, conds, keys)

        return sampler_single

    # segmented: velocity transport via the bounded-dispatch machinery
    traj_sampler = _segmented_fixed_sampler(
        v_fn_of, solver=solver, t0=t0, t1=t1, n_steps=n_steps,
        n_save=div_points, return_dlogp=False, divergence=divergence,
        div_chunk=div_chunk, steps_per_dispatch=steps_per_dispatch,
    )

    @jax.jit
    def div_all(xs_grid, conds, ts, key):
        """(C, P, ...) trajectory grid -> (C, P) divergences. Sequential
        lax.map over the P nodes (one divergence trace, bounded memory),
        vmapped over chains."""

        def one_chain(xs_p, cond, k):
            def node(args):
                x, t, i = args
                f = lambda y: v_fn_of(cond)(y, t)
                if divergence == "exact":
                    return divergence_exact(
                        f, x, chunk=div_chunk, axis_name=div_axis
                    )[1]
                if divergence == "hutchpp":
                    return divergence_hutchpp(
                        f, x, jax.random.fold_in(k, i), num_queries=num_probes
                    )[1]
                return divergence_hutchinson(
                    f, x, jax.random.fold_in(k, i), num_probes=num_probes,
                    axis_name=div_axis, probe_mode=probe_mode,
                )[1]

            return jax.lax.map(
                node, (xs_p, ts, jnp.arange(xs_p.shape[0])),
                batch_size=node_batch,
            )

        keys = _chain_keys(key, xs_grid.shape[0], probe_crn)
        return jax.vmap(one_chain)(xs_grid, conds, keys)

    n_stages = {"euler": 1, "heun": 2, "rk4": 4}[solver]
    ts_np = np.linspace(t0, t1, div_points)

    def sampler(x0s, conds, key):
        sol = traj_sampler(x0s, conds, key)  # xs (C, div_points, ...)
        divs = div_all(
            sol.xs, conds, jnp.asarray(ts_np, x0s.dtype),
            jax.random.fold_in(key, 10_000),
        )  # (C, div_points)
        h = (t1 - t0) / m
        pair = (h / 3.0) * (divs[:, :-2:2] + 4.0 * divs[:, 1:-1:2] + divs[:, 2::2])
        cum = jnp.concatenate(
            [jnp.zeros((divs.shape[0], 1), divs.dtype), jnp.cumsum(pair, axis=1)], axis=1
        )
        dlogp_grid = -cum
        stride = m // (n_save - 1)
        out_idx = np.arange(n_save) * stride
        return ODESolution(
            xs=sol.xs[:, out_idx],
            dlogp=dlogp_grid[:, out_idx // 2],
            nfe=jnp.asarray(n_steps * n_stages + div_points, jnp.int32),
        )

    return sampler


def _gauss_dlogp_sampler(
    v_fn_of, *, solver, t0, t1, n_steps, n_save, gl_points, divergence,
    div_chunk, steps_per_dispatch, num_probes=8, div_axis=None,
    probe_crn=False, probe_mode="rademacher", node_batch=None,
    traj_drift=None, div_drift=None, return_dlogp_var=False,
):
    """Driver-level Gauss-Legendre-decoupled dlogp.

    Phase 1 integrates gap by gap (gap = interval between consecutive
    quadrature/save boundaries) with ONE jitted velocity-only segment
    reused for every gap (start/end times are traced), so each device
    dispatch is bounded by the per-gap step count. Phase 2 is one bounded
    divergence dispatch over all nodes, then the weighted sum.
    """
    from ti_tpu.ops.divergence import (
        divergence_exact,
        divergence_hutchinson,
        divergence_hutchpp,
    )
    from ti_tpu.sampling.integrators import sample_ode, sample_ode_gauss_dlogp

    if gl_points < 1:
        raise ValueError("gl_points must be >= 1")

    if steps_per_dispatch is None:

        @jax.jit
        def sampler_single(x0s, conds, key):
            keys = _chain_keys(key, x0s.shape[0], probe_crn)
            return jax.vmap(
                lambda x, c, k: sample_ode_gauss_dlogp(
                    v_fn_of(c), x, t0=t0, t1=t1, n_steps=n_steps,
                    gl_points=gl_points, n_save=n_save, method=solver,
                    divergence=divergence, key=k, div_chunk=div_chunk,
                    num_probes=num_probes, div_axis=div_axis,
                    probe_mode=probe_mode, node_batch=node_batch,
                )
            )(x0s, conds, keys)

        return sampler_single

    # static quadrature bookkeeping: per save interval, gap boundaries are
    # [save_j, GL nodes..., save_{j+1}]
    gl_x, gl_w = np.polynomial.legendre.leggauss(gl_points)
    saves = np.linspace(t0, t1, n_save)
    bounds = [t0]
    node_w = np.zeros((n_save - 1, gl_points))
    for j in range(n_save - 1):
        lo, hi = saves[j], saves[j + 1]
        half = 0.5 * (hi - lo)
        bounds.extend((lo + half * (gl_x + 1.0)).tolist())
        bounds.append(hi)
        node_w[j] = gl_w * half
    bounds = np.asarray(bounds)  # len = 1 + (n_save-1)*(gl_points+1)
    gaps_per_interval = gl_points + 1
    # equal sub-step count per gap -> a single jitted segment function
    m = max(1, -(-n_steps // ((n_save - 1) * gaps_per_interval)))
    m = min(m, steps_per_dispatch)
    n_stages = {"euler": 1, "heun": 2, "rk4": 4}[solver]

    if traj_drift is not None:
        # batched trajectory segments through the provided drift (e.g. the
        # fused pair-layer kernel) — same explicit RK tableau as sample_ode
        from ti_tpu.sampling.integrators import _tableau

        cc, aa, bb = _tableau(solver)

        @jax.jit
        def seg(x, conds, ta, tb):
            dt = (tb - ta) / m

            def step(xx, i):
                t = ta + i * dt
                ks = []
                for si in range(len(bb)):
                    yi = xx
                    for sj in range(si):
                        if aa[si][sj]:
                            yi = yi + (dt * aa[si][sj]) * ks[sj]
                    ks.append(traj_drift(yi, t + cc[si] * dt, conds))
                out = xx
                for si in range(len(bb)):
                    out = out + (dt * bb[si]) * ks[si]
                return out, None

            x, _ = jax.lax.scan(step, x, jnp.arange(m, dtype=x.dtype))
            return x

    else:

        @jax.jit
        def seg(x, conds, ta, tb):
            def one(x0, cond):
                sol = sample_ode(
                    v_fn_of(cond), x0, t0=ta, t1=tb, n_steps=m, n_save=2,
                    method=solver, return_dlogp=False,
                )
                return sol.xs[-1]

            return jax.vmap(one)(x, conds)

    if return_dlogp_var and divergence != "hutchinson":
        raise ValueError(
            "return_dlogp_var requires divergence='hutchinson' (the "
            "probe-noise variance of the stochastic estimator; exact has "
            "none)"
        )
    if return_dlogp_var and steps_per_dispatch is None:
        raise ValueError(
            "return_dlogp_var requires the segmented gauss path "
            "(steps_per_dispatch=)"
        )

    if div_drift is not None:
        # batched estimator (e.g. the pair-tangent kernel): one lax.map
        # over the quadrature nodes, the whole chain batch per node.
        # With return_dlogp_var the div_drift must return a (div, var)
        # tuple per batch (pair_tangent_div_fn(return_var=True)).
        @jax.jit
        def div_all(xs_nodes, conds, ts_nodes, key):
            xs_nt = jnp.swapaxes(xs_nodes, 0, 1)  # (n_nodes, C, N, 3)

            def node(args):
                xb, t, i = args
                out = div_drift(xb, t, conds, jax.random.fold_in(key, i))
                if return_dlogp_var:
                    return out  # (div (C,), var (C,))
                return out

            out = jax.lax.map(
                node, (xs_nt, ts_nodes, jnp.arange(xs_nt.shape[0])),
            )  # (n_nodes, C) or tuple of two
            if return_dlogp_var:
                return tuple(jnp.swapaxes(o, 0, 1) for o in out)
            return jnp.swapaxes(out, 0, 1)

    else:

        @jax.jit
        def div_all(xs_nodes, conds, ts_nodes, key):
            def one_chain(xs_p, cond, k):
                def node(args):
                    x, t, i = args
                    f = lambda y: v_fn_of(cond)(y, t)
                    if divergence == "exact":
                        return divergence_exact(
                            f, x, chunk=div_chunk, axis_name=div_axis
                        )[1]
                    if divergence == "hutchpp":
                        return divergence_hutchpp(
                            f, x, jax.random.fold_in(k, i), num_queries=num_probes
                        )[1]
                    res = divergence_hutchinson(
                        f, x, jax.random.fold_in(k, i), num_probes=num_probes,
                        axis_name=div_axis, probe_mode=probe_mode,
                        return_var=return_dlogp_var,
                    )
                    return res[1:] if return_dlogp_var else res[1]

                return jax.lax.map(
                    node, (xs_p, ts_nodes, jnp.arange(xs_p.shape[0])),
                    batch_size=node_batch,
                )

            keys = _chain_keys(key, xs_nodes.shape[0], probe_crn)
            return jax.vmap(one_chain)(xs_nodes, conds, keys)

    # node positions within `bounds`: every index except save boundaries
    save_pos = np.arange(n_save) * gaps_per_interval
    node_pos = np.setdiff1d(np.arange(len(bounds)), save_pos)

    def sampler(x0s, conds, key):
        x = jnp.asarray(x0s)
        states = [x]
        for gi in range(len(bounds) - 1):
            x = seg(
                x, conds,
                jnp.asarray(bounds[gi], x.dtype), jnp.asarray(bounds[gi + 1], x.dtype),
            )
            states.append(x)
        stacked = jnp.stack(states, axis=1)  # (C, len(bounds), ...)
        xs_nodes = stacked[:, node_pos]
        divs = div_all(
            xs_nodes, conds, jnp.asarray(bounds[node_pos], x.dtype),
            jax.random.fold_in(key, 10_000),
        )  # (C, (n_save-1)*gl_points), optionally with per-node variances
        dvars = None
        if return_dlogp_var:
            divs, dvars = divs
        divs = divs.reshape(divs.shape[0], n_save - 1, gl_points)
        w = jnp.asarray(node_w, x.dtype)
        per_interval = -jnp.sum(w[None] * divs, axis=2)
        dlogp = jnp.concatenate(
            [jnp.zeros((divs.shape[0], 1), x.dtype), jnp.cumsum(per_interval, axis=1)],
            axis=1,
        )
        dlogp_var = None
        if dvars is not None:
            # independent probe draws per node: Var(dlogp) = sum w^2 var
            dvars = dvars.reshape(dvars.shape[0], n_save - 1, gl_points)
            var_interval = jnp.sum((w ** 2)[None] * dvars, axis=2)
            dlogp_var = jnp.concatenate(
                [jnp.zeros((dvars.shape[0], 1), x.dtype),
                 jnp.cumsum(var_interval, axis=1)],
                axis=1,
            )
        nfe = jnp.asarray(
            (len(bounds) - 1) * m * n_stages + len(node_pos), jnp.int32
        )
        return ODESolution(
            xs=stacked[:, save_pos], dlogp=dlogp, nfe=nfe, dlogp_var=dlogp_var
        )

    return sampler


def _segmented_dopri5_sampler(
    v_fn_of, *, t0, t1, n_save, atol, rtol, return_dlogp, divergence,
    div_chunk, steps_per_dispatch,
):
    if divergence != "exact":
        raise NotImplementedError(
            "segmented dopri5 supports exact divergence only (parity mode)"
        )
    from ti_tpu.sampling.integrators import dopri5_stepper

    def init_one(x0, cond):
        init, _ = dopri5_stepper(
            v_fn_of(cond), jnp.shape(x0), jnp.result_type(x0), t0=t0, t1=t1,
            atol=atol, rtol=rtol, max_steps=steps_per_dispatch,
            return_dlogp=return_dlogp, divergence=divergence, div_chunk=div_chunk,
        )
        return init(x0)

    def adv_one(carry, x_like, cond, t_target):
        _, advance = dopri5_stepper(
            v_fn_of(cond), jnp.shape(x_like), jnp.result_type(x_like), t0=t0, t1=t1,
            atol=atol, rtol=rtol, max_steps=steps_per_dispatch,
            return_dlogp=return_dlogp, divergence=divergence, div_chunk=div_chunk,
        )
        return advance(carry, t_target)

    init_j = jax.jit(jax.vmap(init_one))
    adv_j = jax.jit(jax.vmap(adv_one, in_axes=(0, 0, 0, None)))

    def sampler(x0s, conds, key):
        shape = x0s.shape[1:]
        d = int(np.prod(shape))
        carry = init_j(x0s, conds)
        save_ts = np.linspace(0.0, abs(t1 - t0), n_save)
        ys = [carry[1]]
        for i in range(1, n_save):
            target = jnp.asarray(save_ts[i], x0s.dtype)
            # repeat bounded dispatches until every chain reaches the target
            for _ in range(64):  # hard backstop
                carry, y = adv_j(carry, x0s, conds, target)
                if bool(jnp.all(carry[0] >= target - 1e-6)):
                    break
            ys.append(y)
        ys = jnp.stack(ys, axis=1)  # (B, n_save, d+1)
        return ODESolution(
            xs=jnp.reshape(ys[..., :d], x0s.shape[:1] + (n_save,) + shape),
            dlogp=ys[..., d],
            nfe=jnp.max(carry[3]),
        )

    return sampler


# ---------------------------------------------------------------------------
# ADW (reference adw/sample.py:14-88)
# ---------------------------------------------------------------------------

def sample_adw(
    cfg: ADWConfig,
    model,
    params,
    x0: np.ndarray,
    beta0: np.ndarray,
    save: bool = True,
) -> Dict[str, np.ndarray]:
    """Transport test samples from beta0 to cfg.beta1s[0] with dlogp.

    x0: (n, 1) initial samples at beta0; returns/saves
    initial_samples/samples/dlogps arrays. samples has shape
    (n_save, n) like the reference's reshaped output (adw/sample.py:63-69).
    """
    assert len(cfg.beta1s) == 1, "sampling expects a single (beta0, beta1) pair"
    beta1 = float(cfg.beta1s[0])
    n_save = cfg.n_step if cfg.solver_type == "dopri5" else 2

    def v_fn_of(cond):
        b0, b1 = cond

        def v(x, t):
            xt = x[None, :]
            tt = jnp.full((1, 1), t, dtype=x.dtype)
            return model.apply(params, xt, tt, b0[None, None], b1[None, None])[0]

        return v

    sampler = make_ode_sampler(
        v_fn_of,
        solver=cfg.solver_type,
        n_steps=cfg.n_step,
        n_save=n_save,
        atol=cfg.atol,
        rtol=cfg.rtol,
        return_dlogp=cfg.return_dlogp,
        divergence=cfg.divergence,
        steps_per_dispatch=cfg.steps_per_dispatch or None,
        dlogp_quad_points=getattr(cfg, "dlogp_quad_points", 0) or None,
        dlogp_quad=getattr(cfg, "dlogp_quad", "simpson"),
        num_probes=getattr(cfg, "num_probes", 8),
        probe_mode=getattr(cfg, "probe_mode", "rademacher"),
        probe_crn=bool(getattr(cfg, "probe_crn", False)),
    )

    # f64 parity mode follows the trained params (ADWConfig.dtype; CPU-only
    # — see ti_tpu/train/adw.py::_adw_dtype)
    dt = jnp.float32
    if getattr(cfg, "dtype", "f32") in ("f64", "float64"):
        jax.config.update("jax_enable_x64", True)
        dt = jnp.float64
    x0j = jnp.asarray(x0, dt)
    b0j = jnp.asarray(beta0, dt).reshape(-1)
    b1j = jnp.full_like(b0j, beta1)
    sol = sampler(x0j, (b0j, b1j), jax.random.PRNGKey(cfg.seed))

    samples = np.asarray(sol.xs)[:, :, 0].T  # (n_save, n)
    dlogps = np.asarray(sol.dlogp).T  # (n_save, n)
    out = {
        "initial_samples": np.asarray(x0).reshape(-1),
        "samples": samples,
        "dlogps": dlogps,
        "nfe": int(np.max(np.asarray(sol.nfe))),
    }
    if save:
        out_dir = os.path.join(
            cfg.data_save_path, cfg.model_save_name,
            f"beta_{cfg.beta0s[0]}_to_{beta1}",
        )
        os.makedirs(out_dir, exist_ok=True)
        tag = f"epoch_{cfg.sampling_epoch}"
        if getattr(cfg, "num_shards", 1) > 1:  # fan-out (parallel/fanout.py)
            tag += f"_shard{cfg.shard}of{cfg.num_shards}"
        np.save(os.path.join(out_dir, f"initial_samples_{tag}.npy"), out["initial_samples"])
        np.save(os.path.join(out_dir, f"samples_{tag}.npy"), out["samples"])
        if cfg.return_dlogp:
            np.save(os.path.join(out_dir, f"dlogps_{tag}.npy"), out["dlogps"])
    return out


# ---------------------------------------------------------------------------
# MDQM9 ambient (reference mdqm9/sample_ambient.py:18-121)
# ---------------------------------------------------------------------------

def molecular_v_fn_of(
    model, params, template: MolGraph, impl: str = "dense", compute_dtype=None
):
    """Per-chain velocity closure builder for molecular transport.

    impl="dense" (default) uses the gather-free dense-pair forward
    (models/cpainn_dense.py — measured 1.7x faster forward and 2.15x faster
    exact-divergence evaluation than the edge formulation on v5e, same
    parameters, parity-tested); impl="dense_fused" additionally routes the
    per-pair message MLPs through the Pallas fused kernel + custom-JVP
    tangent kernel (forward-mode only — fine for sampling/dlogp, not for
    reverse-mode training); impl="edge" is the flax module apply.
    """
    if impl in ("dense", "dense_fused"):
        from ti_tpu.models.cpainn_dense import apply_dense

        fused = impl == "dense_fused"

        def v_fn_of(temps):
            def v(x, t):
                return apply_dense(
                    model, params, x[None], jnp.asarray(t)[None], temps[None],
                    template.atom_ids, template.edges, fused=fused,
                    compute_dtype=compute_dtype,
                )[0]

            return v

        return v_fn_of

    def v_fn_of(temps):
        def v(x, t):
            g = MolGraph(
                x=x, atom_ids=template.atom_ids, t=jnp.asarray(t),
                temps=temps, edges=template.edges,
            )
            return model.apply(params, g)

        return v

    return v_fn_of


def _traj_drift_of(cfg, model, params, template):
    """Batched trajectory drift for ``make_ode_sampler(traj_drift=)`` from
    ``cfg.traj_forward_impl``.

    "default" (or empty) -> None: trajectory segments run vmap(v_fn).
    "pair_kernel" / "pair_kernel_bf16" -> the fused pair-layer Pallas
    kernel (f32 / bf16-VMEM profile) drives the velocity-only trajectory
    segments of the Gauss quadrature-dlogp path — the divergence nodes
    keep the differentiable XLA forward (they need jax.linearize). Off-TPU
    the kernel runs in interpret mode so CPU pipelines stay usable."""
    impl = getattr(cfg, "traj_forward_impl", "default")
    if impl in ("", "default"):
        return None
    from ti_tpu.ops.pair_layer_kernel import pair_kernel_drift

    try:
        cd = {"pair_kernel": None, "pair_kernel_bf16": "bf16_agg"}[impl]
    except KeyError:
        raise ValueError(
            f"unknown traj_forward_impl {impl!r} "
            "(default | pair_kernel | pair_kernel_bf16)"
        ) from None
    if not (
        getattr(cfg, "dlogp_quad", "") == "gauss"
        and getattr(cfg, "dlogp_quad_points", 0)
        and getattr(cfg, "steps_per_dispatch", 0)
        and cfg.return_dlogp
    ):
        raise ValueError(
            "traj_forward_impl needs the segmented gauss quadrature-dlogp "
            "path: set dlogp_quad='gauss', dlogp_quad_points and "
            "steps_per_dispatch (see make_ode_sampler traj_drift)"
        )
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    return pair_kernel_drift(
        model, params, template, compute_dtype=cd, interpret=interpret
    )


def _div_drift_of(cfg, model, params, template):
    """Batched divergence-node estimator for ``make_ode_sampler(div_drift=)``
    from ``cfg.div_forward_impl``.

    "default" (or empty) -> None: divergence nodes run jax.linearize of the
    XLA forward with vmapped probe lanes. "pair_tangent" /
    "pair_tangent_bf16" -> the pair-tangent Pallas kernel
    (ops/pair_tangent_kernel.py) carries the probe lanes through the
    message layers in VMEM (f32 / bf16-VMEM profile). The probe count and
    mode follow cfg.num_probes / cfg.probe_mode when cfg.divergence ==
    "hutchinson"; with cfg.divergence == "exact" the kernel runs the FULL
    orthogonal tangent frame (num_probes = 3N), which is mathematically
    the exact trace (tests/test_pair_tangent_kernel.py)."""
    impl = getattr(cfg, "div_forward_impl", "default")
    if impl in ("", "default"):
        return None
    from ti_tpu.ops.pair_tangent_kernel import pair_tangent_div_fn

    try:
        cd = {"pair_tangent": None, "pair_tangent_bf16": "bf16_agg"}[impl]
    except KeyError:
        raise ValueError(
            f"unknown div_forward_impl {impl!r} "
            "(default | pair_tangent | pair_tangent_bf16)"
        ) from None
    if not (
        getattr(cfg, "dlogp_quad", "") == "gauss"
        and getattr(cfg, "dlogp_quad_points", 0)
        and getattr(cfg, "steps_per_dispatch", 0)
        and cfg.return_dlogp
    ):
        raise ValueError(
            "div_forward_impl needs the segmented gauss quadrature-dlogp "
            "path: set dlogp_quad='gauss', dlogp_quad_points and "
            "steps_per_dispatch (see make_ode_sampler div_drift)"
        )
    if cfg.divergence == "hutchinson":
        num_probes = getattr(cfg, "num_probes", 16)
        probe_mode = getattr(cfg, "probe_mode", "rademacher")
    elif cfg.divergence == "exact":
        num_probes = 3 * int(template.atom_ids.shape[0])
        probe_mode = "orthogonal"
    else:
        raise ValueError(
            f"div_forward_impl does not support divergence={cfg.divergence!r} "
            "(exact | hutchinson)"
        )
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    return pair_tangent_div_fn(
        model, params, template, num_probes=num_probes, probe_mode=probe_mode,
        compute_dtype=cd, interpret=interpret,
    )


def sample_ambient(
    cfg: MDQM9Config,
    model,
    params,
    template: MolGraph,
    x0: np.ndarray,
    latent_z: Optional[np.ndarray] = None,
    latent_dlogp: Optional[np.ndarray] = None,
    save: bool = True,
    batch_size: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Transport conformations x0 (n, N, 3) from sampling_T0 to sampling_T1.

    Optional latent_z/latent_dlogp are passed through for BG→TI composition
    bookkeeping (reference MDQM9SamplerDataset latent passthrough,
    mdqm9/data/mdqm9_ambient.py:110-170)."""
    n = len(x0)
    bs = batch_size or cfg.batch_size
    n_save = cfg.n_steps if cfg.solver_type == "dopri5" else max(2, cfg.n_steps // 50 + 1)

    sampler = make_ode_sampler(
        molecular_v_fn_of(model, params, template, compute_dtype=_compute_dtype(cfg)),
        solver=cfg.solver_type,
        n_steps=cfg.n_steps,
        n_save=n_save,
        atol=cfg.atol,
        rtol=cfg.rtol,
        return_dlogp=cfg.return_dlogp,
        divergence=cfg.divergence,
        steps_per_dispatch=cfg.steps_per_dispatch or None,
        dlogp_quad_points=getattr(cfg, "dlogp_quad_points", 0) or None,
        dlogp_quad=getattr(cfg, "dlogp_quad", "simpson"),
        num_probes=getattr(cfg, "num_probes", 8),
        probe_mode=getattr(cfg, "probe_mode", "rademacher"),
        probe_crn=bool(getattr(cfg, "probe_crn", False)),
        traj_drift=_traj_drift_of(cfg, model, params, template),
        div_drift=_div_drift_of(cfg, model, params, template),
        return_dlogp_var=bool(getattr(cfg, "return_dlogp_var", False)),
    )

    if latent_z is None:
        latent_z = np.zeros_like(x0)
    if latent_dlogp is None:
        latent_dlogp = np.zeros(n, dtype=np.float32)

    temps_full = np.broadcast_to(
        np.array([cfg.sampling_T0, cfg.sampling_T1], dtype=np.float32), (n, 2)
    )

    os.makedirs(cfg.data_save_path, exist_ok=True) if save else None
    all_samples, all_dlogps, all_dvars, nfe = [], [], [], 0
    key = jax.random.PRNGKey(cfg.seed)
    for i in range(0, n, bs):
        key, sub = jax.random.split(key)
        xb, tb = x0[i : i + bs], temps_full[i : i + bs]
        take = len(xb)
        if take < bs:  # pad the tail batch; same compiled sampler, slice back
            pad = bs - take
            xb = np.concatenate([xb, np.repeat(xb[-1:], pad, axis=0)])
            tb = np.concatenate([tb, np.repeat(tb[-1:], pad, axis=0)])
        sol = sampler(jnp.asarray(xb), jnp.asarray(tb), sub)
        all_samples.append(np.asarray(sol.xs)[:take])  # (B, n_save, N, 3)
        all_dlogps.append(np.asarray(sol.dlogp[:take, -1]))  # final dlogp/chain
        if sol.dlogp_var is not None:
            all_dvars.append(np.asarray(sol.dlogp_var[:take, -1]))
        nfe = max(nfe, int(np.max(np.asarray(sol.nfe))))
        if save:  # incremental checkpointing (sample_ambient.py:88-101)
            _save_ambient(cfg, all_samples, all_dlogps, latent_z, latent_dlogp,
                          i + take, all_dvars)

    samples = np.concatenate(all_samples, axis=0)
    dlogps = np.concatenate(all_dlogps, axis=0)
    out = {
        "samples": samples,
        "dlogps": dlogps,
        "latent_noises": latent_z[: len(samples)],
        "latent_dlogps": latent_dlogp[: len(samples)],
        "nfe": nfe,
    }
    if all_dvars:
        out["dlogp_vars"] = np.concatenate(all_dvars, axis=0)
    if save:
        _save_ambient(cfg, all_samples, all_dlogps, latent_z, latent_dlogp,
                      len(samples), all_dvars)
    return out


def _save_ambient(cfg, samples_list, dlogps_list, latent_z, latent_dlogp,
                  n_done, dvars_list=()):
    base = cfg.data_save_path
    name = cfg.data_save_name
    np.save(os.path.join(base, f"samples_{name}.npy"), np.concatenate(samples_list, axis=0))
    np.save(os.path.join(base, f"dlogps_{name}.npy"), np.concatenate(dlogps_list, axis=0))
    np.save(os.path.join(base, f"latent_noises_{name}.npy"), latent_z[:n_done])
    np.save(os.path.join(base, f"latent_dlogps_{name}.npy"), latent_dlogp[:n_done])
    if dvars_list:
        # probe-noise variance of each chain's dlogp (cfg.return_dlogp_var):
        # exp(-phi) consumers debias with phi += var/2
        # (analysis.free_energy.calc_tfep_dF dlogp_var=)
        np.save(os.path.join(base, f"dlogp_vars_{name}.npy"),
                np.concatenate(dvars_list, axis=0))


# ---------------------------------------------------------------------------
# MDQM9 latent / Boltzmann generator (reference mdqm9/sample_latent.py:20-99)
# ---------------------------------------------------------------------------

def sample_latent(
    cfg: MDQM9Config,
    model,
    params,
    template: MolGraph,
    n_samples: Optional[int] = None,
    save: bool = True,
    batch_size: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Generate conformations at cfg.sampling_T from COM-free noise."""
    n = n_samples or cfg.n_latent_samples
    bs = batch_size or cfg.batch_size
    n_atoms = template.edges.n_nodes
    n_save = cfg.n_steps if cfg.solver_type == "dopri5" else max(2, cfg.n_steps // 50 + 1)
    n_temp_cond = template.temps.shape[0]

    sampler = make_ode_sampler(
        molecular_v_fn_of(model, params, template, compute_dtype=_compute_dtype(cfg)),
        solver=cfg.solver_type,
        n_steps=cfg.n_steps,
        n_save=n_save,
        atol=cfg.atol,
        rtol=cfg.rtol,
        return_dlogp=cfg.return_dlogp,
        divergence=cfg.divergence,
        steps_per_dispatch=cfg.steps_per_dispatch or None,
        dlogp_quad_points=getattr(cfg, "dlogp_quad_points", 0) or None,
        dlogp_quad=getattr(cfg, "dlogp_quad", "simpson"),
        num_probes=getattr(cfg, "num_probes", 8),
        probe_mode=getattr(cfg, "probe_mode", "rademacher"),
        probe_crn=bool(getattr(cfg, "probe_crn", False)),
        traj_drift=_traj_drift_of(cfg, model, params, template),
        div_drift=_div_drift_of(cfg, model, params, template),
        return_dlogp_var=bool(getattr(cfg, "return_dlogp_var", False)),
    )

    key = jax.random.PRNGKey(cfg.seed)
    all_samples, all_dlogps, all_dvars, nfe = [], [], [], 0
    if save:
        os.makedirs(cfg.data_save_path, exist_ok=True)
    for i in range(0, n, bs):
        take = min(bs, n - i)  # tail batch runs padded, sliced back
        key, zk, sk = jax.random.split(key, 3)
        z = jax.random.normal(zk, (bs, n_atoms, 3), dtype=jnp.float32)
        z = z - z.mean(axis=1, keepdims=True)
        temps = jnp.full((bs, n_temp_cond), float(cfg.sampling_T), dtype=jnp.float32)
        sol = sampler(z, temps, sk)
        all_samples.append(np.asarray(sol.xs)[:take])
        all_dlogps.append(np.asarray(sol.dlogp[:take, -1]))
        if sol.dlogp_var is not None:
            all_dvars.append(np.asarray(sol.dlogp_var[:take, -1]))
        nfe = max(nfe, int(np.max(np.asarray(sol.nfe))))
        if save:
            name = cfg.data_save_name
            np.save(
                os.path.join(cfg.data_save_path, f"samples_{name}_forward.npy"),
                np.concatenate(all_samples, axis=0),
            )
            np.save(
                os.path.join(cfg.data_save_path, f"dlogps_{name}_forward.npy"),
                np.concatenate(all_dlogps, axis=0),
            )
            if all_dvars:
                np.save(
                    os.path.join(cfg.data_save_path,
                                 f"dlogp_vars_{name}_forward.npy"),
                    np.concatenate(all_dvars, axis=0),
                )
    out = {
        "samples": np.concatenate(all_samples, axis=0),
        "dlogps": np.concatenate(all_dlogps, axis=0),
        "nfe": nfe,
    }
    if all_dvars:
        out["dlogp_vars"] = np.concatenate(all_dvars, axis=0)
    return out


# ---------------------------------------------------------------------------
# SDE sampling (Euler–Maruyama over the learned drift)
# ---------------------------------------------------------------------------

def sample_molecular_sde(
    model,
    params,
    template: MolGraph,
    x0: Array,
    temps: Array,
    key: Array,
    *,
    g_fn=0.0,
    n_steps: int = 100,
    n_save: int = 2,
    compute_dtype=None,
    forward_impl: str = "dense",
    chain_block: int = 1,
):
    """Batched Euler–Maruyama transport (no dlogp); noise is COM-projected
    to stay on the zero-COM manifold the GNN was trained on.

    The drift is the dense-pair forward evaluated on the WHOLE chain batch
    per step (one (C, N, 3) -> (C, N, 3) call) rather than a vmap of
    per-chain closures — one big batched graph per step keeps the MLP rows
    at C*N^2 and avoids per-chain RNG key trees. Returns (C, n_save, N, 3).

    ``forward_impl="pair_kernel"`` routes the drift through the fused
    pair-layer Pallas kernel (ops/pair_layer_kernel.py): every pair-grid
    intermediate stays in VMEM, pair geometry + positional encodings are
    recomputed in-kernel — the HBM-traffic cut for this no-autodiff path.
    ``compute_dtype`` must then be None (f32) or "bf16_agg" (the bf16 VMEM
    kernel profile — the dependable variant at 10506 capacity, where the
    f32 working set sits near the VMEM ceiling and has failed the remote
    compile under load). ``chain_block`` (pair_kernel only) processes that
    many chains per Pallas grid step (ops/pair_layer_kernel.py).
    """
    from ti_tpu.models.cpainn_dense import dense_velocity_fn

    if n_save < 2 or n_steps % (n_save - 1) != 0:
        raise ValueError("n_steps must be a positive multiple of (n_save - 1)")
    if forward_impl == "pair_kernel":
        from ti_tpu.ops.pair_layer_kernel import pair_kernel_drift

        drift = pair_kernel_drift(
            model, params, template, compute_dtype=compute_dtype,
            chain_block=chain_block,
        )
    elif forward_impl == "dense":
        drift = dense_velocity_fn(model, params, template, compute_dtype=compute_dtype)
    else:
        raise ValueError(f"unknown forward_impl {forward_impl!r}")
    from ti_tpu.sampling.integrators import sample_sde

    @jax.jit
    def run(x0s, conds, k):
        # ONE Euler–Maruyama core (integrators.sample_sde): the batched
        # (C, N, 3) state goes through it whole — the drift closes over
        # the conditioning, the COM projection is sample_sde's axis(-2)
        # zero-mean (identical for batched and per-chain layouts)
        xs = sample_sde(
            lambda x, t: drift(x, t, conds).astype(x0s.dtype), x0s, k,
            g_fn=g_fn, n_steps=n_steps, n_save=n_save,
            project_zero_mean=True,
        )  # (n_save, C, N, 3)
        return jnp.moveaxis(xs, 0, 1)

    return run(jnp.asarray(x0), jnp.asarray(temps), key)
