"""Benchmark: MDQM9-ambient transport throughput on one TPU chip.

Headline metric: samples/sec/chip for the throughput-critical path of the
reference (mdqm9/sample_ambient.py — probability-flow transport WITH the
dlogp/divergence ODE, SURVEY.md §3.4), on the 00031-scale config
(19 atoms, cPaiNN F=128 x 5 layers).

value        = TPU-first path: fixed-step RK4-8 trajectory + the
               quadrature-decoupled dlogp (Gauss-Legendre over 8
               divergence nodes, Hutchinson trace with 16 ORTHOGONAL
               Haar-frame probes — round-3 adoption, QR measured free,
               ESS at the exact floor), bf16 mixed-precision compute (params f32, f32 MXU
               accumulation — physics-qualified, see BASELINE.md),
               vmapped over a chain batch. Accuracy evidence, all on the
               TRAINED production-capacity 19-atom oracle field: GL-10
               sits at the same trajectory-limited error floor as
               Simpson-21/33 (tests/test_adw_physics.py); the TFEP oracle
               error is flat from 100 down to 8 RK4 steps
               (scripts/validate_mdqm9_physics.py --eval_steps); and the
               EXACT bench combo (hutchinson-16 + RK4-16 + bf16_agg)
               reproduces the exact-divergence physics at its statistical
               floor — dF err 0.066/0.070 / ESS 17.1/17.2% at RK4-16/8
               vs exact 0.093 / 15.6% on dF=32.5 (round-2 probe study,
               BASELINE.md: probes
               16/24/32 all at the floor at this scale; at 10506-scale
               29 atoms the ESS penalty appears and probes=32 is the
               documented profile). The exact-divergence path (the
               reference's estimator, 57 tangent lanes) is measured each
               run as a stderr context line; dopri5@1e-5 itself needs
               ~1022 NFE for the same global accuracy
               (scripts/step_count_study.py).
vs_baseline  = value / (reference-algorithm shape on the SAME chip):
               adaptive dopri5 at atol=rtol=1e-5 (the reference's solver
               settings, 00031_settings_no_300.json:34-36) at the
               reference's batch size 12. The reference publishes no
               absolute numbers (BASELINE.md), so the denominator is the
               reference's *algorithmic* shape run on identical hardware.

Prints ONE JSON line. Extra context goes to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _probe_backend(timeout_s: float = 240.0) -> None:
    """Fail fast if the TPU tunnel is stalled instead of hanging the bench.

    The axon tunnel can stall outright: backend init / the first device op
    hangs for 10+ minutes at ~zero CPU (CLAUDE.md gotcha). Backend init
    happens in native code, so it cannot be timed out in-process — run the
    canonical probe (a tiny matmul + scalar readback) in a child process
    with a bounded wall clock, and exit with a clear diagnostic if it never
    comes back.

    The probe runs unconditionally (opt-out: TI_TPU_BENCH_NO_PROBE=1):
    the JAX_PLATFORMS env var is NOT a reliable platform signal here —
    the driver's sitecustomize re-pins ``jax_platforms`` through
    ``jax.config.update`` at interpreter start, overriding the env var, so
    an env-pinned "cpu" process still initializes the tunnel backend. The
    child inherits this process's env and imports ti_tpu first — exactly
    like the bench main below — so it resolves the same backend the bench
    itself will use (ti_tpu's import re-asserts explicit non-TPU env pins,
    ti_tpu/utils/platform.py); on a genuinely-CPU backend it completes in
    seconds.
    """
    if os.environ.get("TI_TPU_BENCH_NO_PROBE"):
        return
    probe = (
        "import ti_tpu, jax, jax.numpy as jnp; "
        "print(float(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))"
    )
    # The stall clears on its own, sometimes within minutes — and the
    # driver runs this bench exactly once per round, so a bounded retry
    # window (default 3 attempts, 120 s apart) is cheap insurance against
    # losing the round's number to a transient. TI_TPU_BENCH_PROBE_RETRIES
    # / TI_TPU_BENCH_PROBE_WAIT_S tune it; retries=1 restores fail-fast.
    retries = int(os.environ.get("TI_TPU_BENCH_PROBE_RETRIES", "3"))
    wait_s = float(os.environ.get("TI_TPU_BENCH_PROBE_WAIT_S", "120"))
    for attempt in range(1, retries + 1):
        try:
            res = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=timeout_s,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        except subprocess.TimeoutExpired:
            if attempt < retries:
                print(
                    f"[bench] backend probe attempt {attempt}/{retries} timed "
                    f"out after {timeout_s:.0f}s (tunnel stall) — retrying in "
                    f"{wait_s:.0f}s.",
                    file=sys.stderr,
                )
                time.sleep(wait_s)
                continue
            print(
                f"[bench] FATAL: backend probe did not complete within "
                f"{timeout_s:.0f}s on any of {retries} attempts — the TPU "
                f"tunnel looks stalled (backend init hangs at ~zero CPU; it "
                f"clears on its own — retry later, or set "
                f"TI_TPU_BENCH_NO_PROBE=1 to bypass the guard).",
                file=sys.stderr,
            )
            sys.exit(3)
        if res.returncode != 0:
            print(
                f"[bench] FATAL: backend probe exited {res.returncode} — the "
                f"device backend is broken (run the probe manually for the "
                f"traceback: python -c {probe!r}).",
                file=sys.stderr,
            )
            sys.exit(3)
        return


def main(quick: bool = False):
    _probe_backend()

    import jax
    import jax.numpy as jnp

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    n_atoms = 19
    mol = make_synthetic_molecule(n_atoms=n_atoms, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=128, score_layers=5, temp_length=100.0, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)

    # dense-pair impl, aggressive bf16 compute ("bf16_agg": bf16 operands
    # AND bf16 dot outputs, f32 MXU accumulation + f32 LN stats) — 1.29x
    # on the divergence node vs the round-1 bf16 profile (232->180 ms at
    # 64 chains), physics-qualified on a trained field: dF oracle err
    # 0.0172 vs 0.0154 f32 (same statistical floor), dlogp mean shift
    # +1.2e-3, rms 3.7e-3 (validate_mdqm9_physics --reuse
    # --compute_dtype all). Round-1 profile notes follow:
    # dense-pair impl, bf16 mixed-precision compute (params f32, f32 dot
    # accumulation): physics-qualified on a trained field — dF oracle error
    # 8.7e-3 bf16 vs 8.3e-3 f32 (same statistical floor), dlogp rms shift
    # 3e-3 (scripts/validate_mdqm9_physics.py --compute_dtype both); 1.20x
    # on the divergence node (ROADMAP item 2, BASELINE.md)
    v_fn_of = molecular_v_fn_of(model, params, template, compute_dtype="bf16_agg")
    # reference-shape denominator keeps the reference's per-edge
    # gather/scatter formulation (impl="edge")
    v_fn_of_edge = molecular_v_fn_of(model, params, template, impl="edge")
    key = jax.random.PRNGKey(1)

    def make_batch(c):
        x0 = 0.1 * jax.random.normal(key, (c, n_atoms, 3), dtype=jnp.float32)
        x0 = x0 - x0.mean(axis=1, keepdims=True)
        temps = jnp.tile(jnp.array([1000.0, 300.0], jnp.float32), (c, 1))
        return x0, temps

    def timed(sampler, c, n_rep):
        # NOTE: under the axon tunnel, block_until_ready can ack enqueue
        # rather than completion — a host transfer is the only reliable
        # fence, so each measurement ends with a scalar readback (~30 ms,
        # negligible vs the multi-second workloads here). Each rep is
        # fenced and timed individually and the BEST rep is reported:
        # wall-clock under the shared tunnel wobbles up to ~25% with
        # concurrent load (BASELINE.md timing note), and the max of a few
        # reps estimates the chip's actual capability far more stably
        # than a single draw.
        x0, temps = make_batch(c)
        sol = sampler(x0, temps, key)  # compile + warmup
        float(jnp.sum(sol.xs))
        best = 0.0
        for i in range(n_rep):
            t0 = time.perf_counter()
            sol = sampler(x0, temps, jax.random.fold_in(key, i))
            float(jnp.sum(sol.xs))
            best = max(best, c / (time.perf_counter() - t0))
        return best, int(np.max(np.asarray(sol.nfe)))

    # --- optimized TPU-first path: RK4 trajectory + quadrature dlogp ---
    # cost = 4*n_steps cheap velocity evals + div_points expensive
    # (1 + 3N-tangent) divergence evals, vs the reference formulation's
    # 4*n_steps*(1+3N). steps_per_dispatch bounds each device call
    # (long single dispatches hit the tunnel's execution deadline);
    # div_chunk bounds HBM for the tangent lanes.
    # 128 chains (round 2): bf16_agg freed enough HBM that 128 beats 64
    # by ~8% (39.9 -> 43.0 samples/s/chip measured); 256 fails the remote
    # compile (helper OOM) — 128 is the sweet spot.
    chains = 32 if quick else 128
    reps = 2 if quick else 3
    # RK4-8 trajectory (round 2): the trained-field step study shows
    # 8/16/32/64 steps all sit at the same dF error floor (0.017-0.018,
    # dlogp mean shifts <2e-4; validate_mdqm9_physics --reuse
    # --eval_steps 64,32,16,8), and the full bench combo holds it at 8
    # steps (dF err 0.070 / ESS 17.2% vs 0.066 / 17.1% at 16). RK4-8
    # was rejected while the exact dlogp dominated (it bought ~5%);
    # with hutchinson-16 the trajectory is >half the cost and 8 steps
    # buy 14% (110 -> 125 samples/s idle-chip).
    # Hutchinson-16 divergence (round 2): at 19 atoms the probe study on
    # the trained production oracle shows NO physics penalty vs the exact
    # 57-lane trace (dF err 0.066 / ESS 17.1% vs 0.093 / 15.6%, probes
    # 16/24/32 all at the floor) for 2.4x throughput; the exact path is
    # measured below as context.
    # Probe mode (round 3): ORTHOGONAL-16 — the Haar probe frame's QR is
    # measured free at production lane counts and its ESS sits at the
    # exact-divergence floor on both qualification seeds (21.8% vs
    # rademacher-16's 21.0-21.4, exact 22.2 — BASELINE.md round-3 probe
    # study; at 10506 scale orthogonal shows no benefit and rademacher-32
    # stays that profile).
    opt_kw = dict(
        solver="rk4", n_steps=10 if quick else 8, n_save=2,
        return_dlogp=True, divergence="hutchinson", num_probes=16,
        probe_mode="orthogonal", steps_per_dispatch=25,
        dlogp_quad_points=4 if quick else 8, dlogp_quad="gauss",
    )
    opt_sampler = make_ode_sampler(v_fn_of, **opt_kw)
    opt_rate, opt_nfe = timed(opt_sampler, chains, reps)
    print(f"[bench] optimized rk4+quad-dlogp (orthogonal-16): {opt_rate:.3f} samples/s (nfe={opt_nfe})", file=sys.stderr)

    # pair-kernel trajectory segments (round 4): the fused pair-layer
    # Pallas kernel drives the velocity-only TRAJECTORY of the same gauss
    # quadrature-dlogp sampler (traj_drift hook; the divergence nodes keep
    # the XLA bf16_agg forward). The f32 kernel replaces the bf16_agg dense
    # trajectory — physics can only improve (f32 > bf16 trajectory;
    # qualified on the trained oracle via validate_mdqm9_physics
    # --traj_impl pair_kernel, BASELINE.md round-4 row).
    try:
        from ti_tpu.ops.pair_layer_kernel import pair_kernel_drift

        pk_traj_sampler = make_ode_sampler(
            v_fn_of, traj_drift=pair_kernel_drift(model, params, template),
            **opt_kw,
        )
        pk_traj_rate, pk_nfe = timed(pk_traj_sampler, chains, reps)
        print(
            f"[bench] optimized + pair-kernel trajectory: {pk_traj_rate:.3f} "
            f"samples/s (nfe={pk_nfe}, {pk_traj_rate / max(opt_rate, 1e-9):.2f}x)",
            file=sys.stderr,
        )
        opt_rate = max(opt_rate, pk_traj_rate)
        # bf16-VMEM kernel variant: HEADLINE-ELIGIBLE since round 5 — the
        # full 00031-capacity physics qualification ran on the trained
        # oracle (dF err 0.131 / ESS 19.8% vs the default trajectory's
        # 0.136 / 19.8%, same seed — BASELINE.md round-5 00031 rows; the
        # ADVICE r4 gate, closed with the measurement it asked for).
        pk16_traj_sampler = make_ode_sampler(
            v_fn_of,
            traj_drift=pair_kernel_drift(
                model, params, template, compute_dtype="bf16_agg"),
            **opt_kw,
        )
        pk16_traj_rate, _ = timed(pk16_traj_sampler, chains, reps)
        print(
            f"[bench] optimized + pair-kernel-bf16 trajectory: "
            f"{pk16_traj_rate:.3f} samples/s "
            f"({pk16_traj_rate / max(opt_rate, 1e-9):.2f}x)",
            file=sys.stderr,
        )
        opt_rate = max(opt_rate, pk16_traj_rate)
    except Exception as e:
        print(f"[bench] pair-kernel trajectory unavailable: {e}", file=sys.stderr)

    # pair-TANGENT divergence kernel (round 5): the probe lanes ride the
    # message layers in VMEM, lane-blocked 4/step (ops/pair_tangent_kernel
    # .py) — the direct attack on the headline's dominant cost center (the
    # divergence nodes are HBM-bound on per-lane tangent reads,
    # BASELINE.md). HEADLINE-ELIGIBLE: physics-qualified on the round-5
    # trained oracle at the full bench combo — dF err 0.130 / ESS 17.1%
    # (seed 1: 0.134 / 18.6%) vs the default path's 0.136 / 19.8% same
    # seed (probe-draw scatter band), f32 kernel control identical to 3
    # digits, and the kernel's FULL orthogonal frame reproduces the true
    # exact-divergence floor (0.0813/20.3% vs 0.0808/20.4%) — BASELINE.md
    # round-5 00031 rows. Measured 1.70x (122.3 -> 208.1) idle-chip.
    try:
        from ti_tpu.ops.pair_layer_kernel import pair_kernel_drift
        from ti_tpu.ops.pair_tangent_kernel import pair_tangent_div_fn

        dt_sampler = make_ode_sampler(
            v_fn_of,
            traj_drift=pair_kernel_drift(model, params, template),
            div_drift=pair_tangent_div_fn(
                model, params, template, num_probes=16,
                probe_mode="orthogonal", compute_dtype="bf16_agg",
            ),
            **opt_kw,
        )
        dt_rate, _ = timed(dt_sampler, chains, reps)
        print(
            f"[bench] optimized + pair-tangent-bf16 divergence + "
            f"pair-kernel trajectory: {dt_rate:.3f} samples/s "
            f"({dt_rate / max(opt_rate, 1e-9):.2f}x)",
            file=sys.stderr,
        )
        opt_rate = max(opt_rate, dt_rate)
    except Exception as e:
        print(f"[bench] pair-tangent divergence unavailable: {e}", file=sys.stderr)

    # exact-divergence context line (the reference's estimator — all 3N
    # tangent lanes; the round-1/2a headline path)
    exact_sampler = make_ode_sampler(
        v_fn_of, solver="rk4", n_steps=10 if quick else 16, n_save=2,
        return_dlogp=True, divergence="exact", steps_per_dispatch=25,
        dlogp_quad_points=4 if quick else 8, dlogp_quad="gauss",
    )
    exact_rate, _ = timed(exact_sampler, chains, reps)
    print(f"[bench] exact-divergence context: {exact_rate:.3f} samples/s", file=sys.stderr)

    # --- multi-chip context: chain-shard the same sampler over all chips ---
    # (jit partitions the embarrassingly parallel chain axis; correctness of
    # this path is asserted on the virtual mesh in
    # tests/test_parallel.py::test_headline_sampler_chain_sharded). The
    # headline JSON stays per-chip, single-chip.
    n_dev = len(jax.devices())
    if n_dev > 1 and not quick:
        try:
            from ti_tpu.parallel.mesh import make_mesh, shard_batch

            mesh = make_mesh(n_dev)
            xs, ts = make_batch(chains * n_dev)
            xs, ts = shard_batch(xs, mesh), shard_batch(ts, mesh)
            sol = opt_sampler(xs, ts, key)
            float(jnp.sum(sol.xs))
            t0 = time.perf_counter()
            sol = opt_sampler(xs, ts, jax.random.fold_in(key, 5))
            float(jnp.sum(sol.xs))
            agg = chains * n_dev / (time.perf_counter() - t0)
            print(
                f"[bench] chain-sharded over {n_dev} chips: {agg:.3f} samples/s "
                f"aggregate = {agg / n_dev:.3f}/chip ({agg / max(opt_rate, 1e-9):.2f}x scaling)",
                file=sys.stderr,
            )
        except Exception as e:  # context metric only - never fail the bench
            print(f"[bench] multi-chip context failed: {e}", file=sys.stderr)

    # --- reference-algorithm shape on the same chip ---
    # The reference solves dopri5 at atol=rtol=1e-5 in batches of 12 with an
    # exact divergence per RHS eval (sample_ambient.py:55-63). Its cost is
    # (RHS evals) x (per-eval cost at batch 12); dopri5's eval count on an
    # untrained random field is unbounded, so we measure the per-eval cost
    # directly (euler steps = pure RHS evals) and price the reference shape
    # at REF_NFE = 500 evals — a representative dopri5@1e-5 count for a
    # trained smooth field (the reference prints ~this order via its
    # n_steps counter, mdqm9/sample_ambient.py:107).
    REF_NFE = 500
    probe_evals = 16 if quick else 64
    ref_probe = make_ode_sampler(
        v_fn_of_edge, solver="euler", n_steps=probe_evals, n_save=2,
        return_dlogp=True, divergence="exact", steps_per_dispatch=64,
    )
    probe_rate, _ = timed(ref_probe, 12, 1)  # samples/s at probe_evals evals
    t_eval = 1.0 / (probe_rate / 12) / probe_evals  # sec per eval (batch 12)
    ref_rate = 12.0 / (REF_NFE * t_eval)
    print(
        f"[bench] reference-shape: {t_eval*1e3:.1f} ms/eval @ batch 12 -> "
        f"{ref_rate:.3f} samples/s at {REF_NFE} evals",
        file=sys.stderr,
    )

    # --- SDE (Euler–Maruyama, no dlogp): the north-star surface ---
    # Config from the round-3 chains×dtype scan (scripts/sde_scan.py,
    # BASELINE.md SDE rows): 4096 chains + bf16_agg is the per-chip sweet
    # spot (141.5 measured; f32@2048 was the round-2 context line at
    # ~112-117). Marginal qualification on the trained production oracle
    # (validate_mdqm9_physics --reuse --sde_g): g<=0.1 holds the ODE
    # route's trained-field KS floor (0.23-0.29 vs ODE 0.247); g>=0.2
    # degrades. The fused pair-layer kernel (forward_impl='pair_kernel')
    # is tried as well and the best rate is reported.
    sde_rate, sde_ref_rate = 0.0, 0.0
    sde_steps = 25 if quick else 100
    try:
        from ti_tpu.sampling.drivers import sample_molecular_sde

        # 8192 chains (round 5): the kernel SDE keeps scaling past the
        # round-3 4096 sweet spot — 282.1/296.2/301.2 samples/s at
        # 4096/8192/16384 (BASELINE.md round-5 SDE rows); 8192 is the
        # knee, 16384 buys +1.7% (wobble-level) for 2x the batch memory
        c_sde = 512 if quick else 8192
        x0, temps = make_batch(c_sde)

        def timed_sde(impl, cd, cb=1):
            out = sample_molecular_sde(
                model, params, template, x0, temps, key, g_fn=0.1,
                n_steps=sde_steps, compute_dtype=cd, forward_impl=impl,
                chain_block=cb,
            )
            float(jnp.sum(out))
            best = 0.0
            for i in range(2 if quick else 3):
                t0 = time.perf_counter()
                out = sample_molecular_sde(
                    model, params, template, x0, temps,
                    jax.random.fold_in(key, 9 + i), g_fn=0.1,
                    n_steps=sde_steps, compute_dtype=cd, forward_impl=impl,
                    chain_block=cb,
                )
                float(jnp.sum(out))
                best = max(best, c_sde / (time.perf_counter() - t0))
            return best

        sde_rate = timed_sde("dense", "bf16_agg")
        print(f"[bench] SDE dense bf16_agg: {sde_rate:.1f} samples/s",
              file=sys.stderr)

        def fwd_gflop(n, f, layers):
            # analytic cPaiNN dense-forward cost: message MLPs (phi 8F² +
            # w 7F² MACs/row on N² pair rows) dominate; update MLP 6F²
            # MACs on N rows; aggregation einsums are O(N²F), negligible
            return layers * (n * n * 15 + n * 6) * f * f * 2 / 1e9
        try:
            pk_rate = timed_sde("pair_kernel", None)
            print(f"[bench] SDE pair_kernel f32: {pk_rate:.1f} samples/s",
                  file=sys.stderr)
            sde_rate = max(sde_rate, pk_rate)
            pk16_rate = timed_sde("pair_kernel", "bf16_agg")
            print(f"[bench] SDE pair_kernel bf16: {pk16_rate:.1f} samples/s",
                  file=sys.stderr)
            sde_rate = max(sde_rate, pk16_rate)
            # chain-blocked grid (round 5): C chains per Pallas step —
            # parity-tested scheduling change (test_pair_layer_kernel), so
            # it joins the max() directly; the marginal qualification is
            # about g, not the forward impl (BASELINE.md SDE rows)
            if not quick:
                pk16_cb = timed_sde("pair_kernel", "bf16_agg", cb=4)
                print(f"[bench] SDE pair_kernel bf16 chain_block=4: "
                      f"{pk16_cb:.1f} samples/s", file=sys.stderr)
                sde_rate = max(sde_rate, pk16_cb)
        except Exception as e:
            print(f"[bench] SDE pair_kernel unavailable: {e}", file=sys.stderr)

        # reference shape for the SDE: the reference would run its per-edge
        # forward per Euler step at batch 12 (same priced-step convention
        # as the dlogp denominator; 100 steps)
        fwd_probe = make_ode_sampler(
            v_fn_of_edge, solver="euler", n_steps=probe_evals, n_save=2,
            return_dlogp=False, steps_per_dispatch=64,
        )
        fwd_rate, _ = timed(fwd_probe, 12, 1)
        t_fwd = 1.0 / (fwd_rate / 12) / probe_evals
        sde_ref_rate = 12.0 / (sde_steps * t_fwd)  # same step count as ours
        print(
            f"[bench] SDE reference-shape: {t_fwd*1e3:.2f} ms/fwd @ batch 12 "
            f"-> {sde_ref_rate:.3f} samples/s at {sde_steps} steps "
            f"({sde_rate / max(sde_ref_rate, 1e-9):.1f}x)",
            file=sys.stderr,
        )
        # absolute utilization: SDE cost = n_steps forwards/sample; v5e
        # bf16 peak ~197 TFLOP/s — the gap is HBM-bandwidth-bound pair
        # traffic, which is exactly what the pair kernel / bf16-VMEM
        # profile attack (VERDICT r3 weak #2)
        eff_tflops = sde_rate * sde_steps * fwd_gflop(n_atoms, 128, 5) / 1e3
        print(
            f"[bench] SDE effective compute: {eff_tflops:.1f} TFLOP/s "
            f"(~{100 * eff_tflops / 197:.0f}% of v5e bf16 peak)",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover
        print(f"[bench] SDE path failed: {e}", file=sys.stderr)

    # --- 10506-scale context (VERDICT r3 weak #7): the large-molecule
    # regime measured EVERY round, not only in one-off studies. 29 atoms,
    # F=256 x 5 layers, 16 chains (the measured unchunked sweet spot),
    # RK4-16 + GL-8 + hutchinson-32 rademacher + bf16_agg — the
    # scale-qualified 10506 profile (BASELINE.md probe-study rows).
    large_rate = 0.0
    if not quick:
        try:
            from ti_tpu.ops.pair_layer_kernel import pair_kernel_drift

            mol_l = make_synthetic_molecule(n_atoms=29, seed=0)
            template_l = graph_template(mol_l, t_cond=2)
            model_l = CPaiNN(n_features=256, score_layers=5,
                             temp_length=100.0, conditioning="ambient")
            params_l = model_l.init(jax.random.PRNGKey(0), template_l)
            v_l = molecular_v_fn_of(model_l, params_l, template_l,
                                    compute_dtype="bf16_agg")
            large_kw = dict(
                solver="rk4", n_steps=16, n_save=2, return_dlogp=True,
                divergence="hutchinson", num_probes=32, steps_per_dispatch=25,
                dlogp_quad_points=8, dlogp_quad="gauss",
            )
            large_sampler = make_ode_sampler(v_l, **large_kw)

            def timed_large(sampler):
                c = 16
                x0 = 0.1 * jax.random.normal(key, (c, 29, 3), jnp.float32)
                x0 = x0 - x0.mean(axis=1, keepdims=True)
                tl = jnp.tile(jnp.array([1000.0, 300.0], jnp.float32), (c, 1))
                sol = sampler(x0, tl, key)
                float(jnp.sum(sol.xs))
                best = 0.0
                for i in range(2):
                    t0 = time.perf_counter()
                    sol = sampler(x0, tl, jax.random.fold_in(key, 20 + i))
                    float(jnp.sum(sol.xs))
                    best = max(best, c / (time.perf_counter() - t0))
                return best

            large_rate = timed_large(large_sampler)
            print(f"[bench] 10506-scale context (29 atoms, F=256, h-32): "
                  f"{large_rate:.3f} samples/s", file=sys.stderr)
            try:
                pk_l = make_ode_sampler(
                    v_l,
                    traj_drift=pair_kernel_drift(
                        model_l, params_l, template_l, compute_dtype="bf16_agg"
                    ),
                    **large_kw,
                )
                pk_l_rate = timed_large(pk_l)
                print(f"[bench] 10506-scale + pair-kernel-bf16 trajectory: "
                      f"{pk_l_rate:.3f} samples/s "
                      f"({pk_l_rate / max(large_rate, 1e-9):.2f}x)",
                      file=sys.stderr)
                large_rate = max(large_rate, pk_l_rate)
            except Exception as e:
                print(f"[bench] 10506 pair-kernel trajectory unavailable: {e}",
                      file=sys.stderr)
        except Exception as e:  # context metric only — never fail the bench
            print(f"[bench] 10506-scale context failed: {e}", file=sys.stderr)

    out = {
        "metric": "mdqm9_ambient_transport_with_dlogp_samples_per_sec_per_chip",
        "value": round(opt_rate, 4),
        "unit": "samples/s/chip",
        "vs_baseline": round(opt_rate / ref_rate, 4),
    }
    if sde_rate:
        out["sde_samples_per_sec"] = round(sde_rate, 4)
        if sde_ref_rate:
            out["sde_vs_baseline"] = round(sde_rate / sde_ref_rate, 4)
    if large_rate:
        out["large_scale_samples_per_sec"] = round(large_rate, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
