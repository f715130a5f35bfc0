"""Divergence estimators, graph aggregation, Kabsch alignment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.ops.divergence import divergence_exact, divergence_hutchinson, value_and_divergence
from ti_tpu.ops.graph import complete_graph_edges, edge_aggregate, make_edge_table
from ti_tpu.ops.kabsch import kabsch_align


def test_divergence_exact_linear_field():
    a = jax.random.normal(jax.random.PRNGKey(0), (5, 5))
    f = lambda x: a @ x
    x = jax.random.normal(jax.random.PRNGKey(1), (5,))
    vel, div = divergence_exact(f, x)
    np.testing.assert_allclose(np.asarray(vel), np.asarray(a @ x), rtol=1e-5)
    np.testing.assert_allclose(float(div), float(jnp.trace(a)), rtol=1e-5)


def test_divergence_exact_nonlinear_matches_jacfwd():
    def f(x):
        return jnp.sin(x) * x[::-1] + 0.1 * x**3

    x = jax.random.normal(jax.random.PRNGKey(2), (7,))
    _, div = divergence_exact(f, x)
    jac = jax.jacfwd(f)(x)
    np.testing.assert_allclose(float(div), float(jnp.trace(jac)), rtol=1e-5)


def test_divergence_exact_structured_shape():
    # (N, 3) shaped state, like molecules
    w = jax.random.normal(jax.random.PRNGKey(3), (12, 12))

    def f(x):
        return (w @ x.reshape(-1)).reshape(4, 3)

    x = jax.random.normal(jax.random.PRNGKey(4), (4, 3))
    vel, div = divergence_exact(f, x)
    assert vel.shape == (4, 3)
    np.testing.assert_allclose(float(div), float(jnp.trace(w)), rtol=1e-5)


def test_hutchinson_unbiased_linear():
    # Rademacher probes give the exact trace for linear fields in expectation;
    # with many probes the variance is small
    a = jax.random.normal(jax.random.PRNGKey(5), (6, 6))
    f = lambda x: a @ x
    x = jnp.zeros(6)
    _, div = divergence_hutchinson(f, x, jax.random.PRNGKey(6), num_probes=4096)
    assert abs(float(div) - float(jnp.trace(a))) < 0.35


def test_orthogonal_probes_exact_at_full_rank():
    # K = dim: the Haar frame spans R^d, QQᵀ = I, and (d/K)·Σ qᵀJq = tr(J)
    # IDENTICALLY — the orthogonal mode interpolates to the exact trace
    a = jax.random.normal(jax.random.PRNGKey(7), (6, 6))
    f = lambda x: a @ x
    for seed in range(3):
        _, div = divergence_hutchinson(
            f, jnp.zeros(6), jax.random.PRNGKey(seed), num_probes=6,
            probe_mode="orthogonal",
        )
        np.testing.assert_allclose(float(div), float(jnp.trace(a)), rtol=1e-4)


def test_orthogonal_probes_unbiased_and_bounded():
    # K < dim: unbiased (E[QQᵀ] = K/d · I for Haar frames); check the
    # key-averaged estimate converges to the trace
    a = jax.random.normal(jax.random.PRNGKey(8), (8, 8))
    f = lambda x: a @ x
    ests = [
        float(divergence_hutchinson(
            f, jnp.zeros(8), jax.random.PRNGKey(s), num_probes=4,
            probe_mode="orthogonal",
        )[1])
        for s in range(400)
    ]
    assert abs(np.mean(ests) - float(jnp.trace(a))) < 0.6

    with pytest.raises(ValueError):  # more probes than dims is meaningless
        divergence_hutchinson(
            f, jnp.zeros(8), jax.random.PRNGKey(0), num_probes=9,
            probe_mode="orthogonal",
        )
    with pytest.raises(ValueError):
        divergence_hutchinson(
            f, jnp.zeros(8), jax.random.PRNGKey(0), probe_mode="nope"
        )


def test_orthogonal_probe_sampler_matches_exact_dlogp():
    # at num_probes = dim the sampler's hutchinson-orthogonal dlogp equals
    # the exact-divergence dlogp (not just statistically — identically)
    from ti_tpu.sampling.drivers import make_ode_sampler

    A = jnp.asarray(np.random.RandomState(1).randn(4, 4).astype(np.float32)) * 0.2
    f_of = lambda c: (lambda x, t: c * (A @ x))

    def run(**kw):
        s = make_ode_sampler(
            f_of, solver="rk4", n_steps=4, return_dlogp=True,
            dlogp_quad_points=4, dlogp_quad="gauss", **kw,
        )
        sol = s(jnp.ones((2, 4)), jnp.ones(2), jax.random.PRNGKey(0))
        return np.asarray(sol.dlogp[:, -1])

    exact = run(divergence="exact")
    orth = run(divergence="hutchinson", num_probes=4, probe_mode="orthogonal")
    np.testing.assert_allclose(orth, exact, rtol=1e-4)


def test_hutchpp_low_rank_exact_and_unbiased():
    from ti_tpu.ops.divergence import divergence_hutchpp

    # rank-2 Jacobian + sketch 2 -> the residual projector annihilates J
    # and the trace is exact (up to f32 QR roundoff)
    w = np.zeros((6, 6), np.float32)
    w[:2, :] = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 6)))
    f = lambda x: jnp.asarray(w) @ x
    x = jnp.ones(6)
    _, d = divergence_hutchpp(f, x, jax.random.PRNGKey(1), num_queries=5, sketch=2)
    np.testing.assert_allclose(float(d), float(np.trace(w)), rtol=5e-3)

    # full-rank linear field: unbiased, converges with the query budget
    a = jax.random.normal(jax.random.PRNGKey(5), (6, 6))
    f = lambda x: a @ x
    ests = [
        float(divergence_hutchpp(f, jnp.zeros(6), jax.random.PRNGKey(i), num_queries=12)[1])
        for i in range(64)
    ]
    assert abs(float(np.mean(ests)) - float(jnp.trace(a))) < 0.5

    with pytest.raises(ValueError):
        divergence_hutchpp(f, jnp.zeros(6), jax.random.PRNGKey(0), num_queries=4, sketch=2)


def test_hutchpp_sampler_mode_runs():
    from ti_tpu.sampling.integrators import sample_ode

    # rank-1 diagonal field: the 1-column sketch captures range(J) exactly,
    # the projected residual vanishes, and dlogp = -∫div dt = 0.5 exactly
    mask = jnp.array([1.0, 0.0, 0.0, 0.0])
    f = lambda x, t: -0.5 * x * mask
    sol = sample_ode(
        f, jnp.ones(4), n_steps=4, return_dlogp=True,
        divergence="hutchpp", key=jax.random.PRNGKey(0), num_probes=4,
    )
    np.testing.assert_allclose(float(sol.dlogp[-1]), 0.5, rtol=1e-4)


def test_value_and_divergence_dispatch():
    f = lambda x: 2.0 * x
    x = jnp.ones(3)
    _, d1 = value_and_divergence(f, x, mode="exact")
    assert float(d1) == pytest.approx(6.0, rel=1e-6)
    _, d2 = value_and_divergence(f, x, mode="hutchinson", key=jax.random.PRNGKey(0))
    assert float(d2) == pytest.approx(6.0, rel=1e-4)  # exact for Rademacher + diagonal J
    with pytest.raises(ValueError):
        value_and_divergence(f, x, mode="hutchinson")
    # hutchpp: exact on a rank-1 diagonal J (sketch spans range(J))
    f1 = lambda x: x * jnp.array([2.0, 0.0, 0.0])
    _, d3 = value_and_divergence(
        f1, x, mode="hutchpp", key=jax.random.PRNGKey(0), num_probes=4
    )
    assert float(d3) == pytest.approx(2.0, rel=1e-4)
    with pytest.raises(ValueError):
        value_and_divergence(f, x, mode="nope")
    # hutchpp cannot shard lanes (the sketch QR needs the full query
    # basis): asking for axis_name must fail loudly, not silently
    # replicate the full estimator on every lane shard
    with pytest.raises(NotImplementedError):
        value_and_divergence(
            f, x, mode="hutchpp", key=jax.random.PRNGKey(0), axis_name="lanes"
        )


def test_hutchpp_div_axis_rejected_everywhere():
    from ti_tpu.sampling.drivers import make_ode_sampler
    from ti_tpu.sampling.integrators import sample_ode

    f_of = lambda c: (lambda x, t: -0.5 * x)
    with pytest.raises(NotImplementedError):
        make_ode_sampler(
            f_of, solver="rk4", n_steps=4, return_dlogp=True,
            divergence="hutchpp", div_axis="lanes",
        )
    with pytest.raises(NotImplementedError):
        sample_ode(
            lambda x, t: -0.5 * x, jnp.ones(4), n_steps=4, return_dlogp=True,
            divergence="hutchpp", key=jax.random.PRNGKey(0), div_axis="lanes",
        )
    # velocity-only rollouts never evaluate the divergence: a shared config
    # carrying hutchpp+div_axis must still build when return_dlogp=False
    make_ode_sampler(
        f_of, solver="rk4", n_steps=4, return_dlogp=False,
        divergence="hutchpp", div_axis="lanes",
    )
    sample_ode(
        lambda x, t: -0.5 * x, jnp.ones(4), n_steps=4, return_dlogp=False,
        divergence="hutchpp", div_axis="lanes",
    )


def test_complete_graph_edges_dst_major():
    src, dst = complete_graph_edges(4)
    assert len(src) == 12
    # dst-major grouping
    np.testing.assert_array_equal(dst, np.repeat(np.arange(4), 3))
    for d in range(4):
        grp = src[dst == d]
        assert set(grp.tolist()) == set(range(4)) - {d}


def test_edge_table_bond_types():
    bond_index = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    bond_types = np.array([2, 2, 1, 1])
    et = make_edge_table(3, bond_index, bond_types)
    src, dst, typ = np.asarray(et.src), np.asarray(et.dst), np.asarray(et.edge_type)
    lookup = {(s, d): t for s, d, t in zip(src, dst, typ)}
    assert lookup[(0, 1)] == 2 and lookup[(1, 0)] == 2
    assert lookup[(1, 2)] == 1 and lookup[(2, 1)] == 1
    assert lookup[(0, 2)] == 0 and lookup[(2, 0)] == 0


def test_edge_aggregate_matches_segment_sum():
    et = make_edge_table(5)
    msgs = jax.random.normal(jax.random.PRNGKey(7), (20, 8, 3))
    dense = edge_aggregate(msgs, et)
    seg = jax.ops.segment_sum(msgs, et.dst, num_segments=5)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(seg), rtol=1e-5, atol=1e-6)


def test_kabsch_recovers_rotation():
    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (10, 3))
    x = x - x.mean(0)
    # random rotation via QR
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.fold_in(key, 1), (3, 3)))
    q = q * jnp.sign(jnp.linalg.det(q))  # proper rotation
    target = x @ q.T
    aligned = kabsch_align(x, target)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(target), atol=1e-4)


def test_kabsch_improves_rmsd_on_noisy():
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (16, 3))
    x = x - x.mean(0)
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.fold_in(key, 1), (3, 3)))
    q = q * jnp.sign(jnp.linalg.det(q))
    target = x @ q.T + 0.05 * jax.random.normal(jax.random.fold_in(key, 2), (16, 3))
    target = target - target.mean(0)
    before = float(jnp.sqrt(jnp.mean((x - target) ** 2)))
    after = float(jnp.sqrt(jnp.mean((kabsch_align(x, target) - target) ** 2)))
    assert after <= before


def test_timing_utility():
    """device_time returns a sane positive per-rep time; Stopwatch fences."""
    import jax
    import jax.numpy as jnp

    from ti_tpu.utils.timing import Stopwatch, device_time

    # the workload must dominate readback-latency noise on a loaded host:
    # a 64x64 matmul once measured NEGATIVE here (mean-latency subtraction
    # exceeded the timed call under contention) — device_time now floors
    # at 0.0 and uses min-based latency, and the test uses a heavier op
    a = jnp.ones((256, 256))
    t = device_time(lambda x, i: (x + i) @ x, a, reps=4)
    assert t > 0
    assert t < 10.0  # sanity: well under the fenced whole-loop scale

    sw = Stopwatch()
    with sw("mm"):
        out = a @ a
        sw.fence(out)
    assert sw.times["mm"] > 0
    assert "mm" in sw.report()


class TestHutchinsonVar:
    """Probe-noise variance estimate + the log-normal debias contract
    (ops.divergence.hutchinson_var_estimate; BASELINE.md 10506 probe-bias
    rows — the h-K dF offset is ~var/2)."""

    def _quad_field(self):
        import jax.numpy as jnp

        a = jnp.array([[2.0, 0.3], [0.3, -1.0]])
        return lambda x: a @ x + 0.1 * x * x, 2

    def test_orthogonal_full_frame_var_is_zero(self):
        import jax
        import jax.numpy as jnp

        from ti_tpu.ops.divergence import divergence_hutchinson

        f, d = self._quad_field()
        x = jnp.array([0.4, -0.2])
        _, div, var = divergence_hutchinson(
            f, x, jax.random.PRNGKey(0), num_probes=d,
            probe_mode="orthogonal", return_var=True,
        )
        assert float(var) == pytest.approx(0.0, abs=1e-10)
        # full frame = exact trace
        assert float(div) == pytest.approx(2.0 - 1.0 + 0.2 * float(x.sum()), rel=1e-5)

    def test_rademacher_var_calibrated(self):
        """Across seeds, the observed scatter of the estimator must match
        the mean plug-in variance (the whole debias premise)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ti_tpu.ops.divergence import divergence_hutchinson

        d = 12
        a = jax.random.normal(jax.random.PRNGKey(3), (d, d)) / np.sqrt(d)
        f = lambda x: a @ x
        x = jnp.zeros((d,))
        divs, vars_ = [], []
        for s in range(200):
            _, dv, vr = divergence_hutchinson(
                f, x, jax.random.PRNGKey(s), num_probes=4, return_var=True
            )
            divs.append(float(dv))
            vars_.append(float(vr))
        emp = np.var(divs)
        plug = np.mean(vars_)
        assert emp == pytest.approx(plug, rel=0.35)  # 200-seed statistics

    def test_sampler_dlogp_var_plumbed(self):
        """make_ode_sampler(return_dlogp_var=True) fills ODESolution.
        dlogp_var: nonnegative, cumulative, and ~the dlogp scatter across
        probe seeds."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
        from ti_tpu.models.cpainn import CPaiNN
        from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of

        mol = make_synthetic_molecule(n_atoms=4, seed=0)
        template = graph_template(mol, t_cond=2)
        model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
        params = model.init(jax.random.PRNGKey(0), template)
        v_of = molecular_v_fn_of(model, params, template)
        sampler = make_ode_sampler(
            v_of, solver="rk4", n_steps=4, n_save=3, return_dlogp=True,
            divergence="hutchinson", num_probes=4, dlogp_quad_points=2,
            dlogp_quad="gauss", steps_per_dispatch=4, return_dlogp_var=True,
        )
        x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (3, 4, 3))
        temps = jnp.tile(jnp.array([700.0, 300.0]), (3, 1))
        sol = sampler(x0, temps, jax.random.PRNGKey(2))
        v = np.asarray(sol.dlogp_var)
        assert v.shape == np.asarray(sol.dlogp).shape
        assert np.all(v >= 0)
        assert np.all(np.diff(v, axis=1) >= -1e-12)  # cumulative
        # scatter across probe seeds ~ sqrt(mean plug-in var)
        finals = [
            np.asarray(sampler(x0, temps, jax.random.PRNGKey(10 + s)).dlogp[:, -1])
            for s in range(30)
        ]
        emp_var = np.var(np.stack(finals), axis=0).mean()
        assert emp_var == pytest.approx(v[:, -1].mean(), rel=0.6)
