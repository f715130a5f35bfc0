"""Sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti_tpu.parallel.mesh import (
    batch_sharded,
    make_mesh,
    parallel_sampler,
    parallel_update,
    replicated,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual CPU devices"
    return make_mesh(8)


def test_shard_batch_places_on_mesh(mesh):
    x = jnp.arange(64.0).reshape(64, 1)
    xs = shard_batch(x, mesh)
    assert xs.sharding == batch_sharded(mesh)


def test_parallel_update_matches_single_device(mesh):
    """DP gradient step == single-device step (psum-of-means identity)."""
    from ti_tpu.train import common

    def loss_fn(params, key, x, y):
        pred = x @ params["w"] + params["b"]
        return jnp.mean((pred - y) ** 2)

    params = {"w": jnp.ones((4, 1)), "b": jnp.zeros((1,))}
    tx = common.make_optimizer(weight_decay=0.0, clip=1.0)
    state = common.init_train_state(params, tx, 0.1)
    update = common.make_update_step(loss_fn, tx)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, 4))
    y = jax.random.normal(jax.random.fold_in(key, 1), (64, 1))

    # single device
    s1, l1 = jax.jit(update)(state, key, x, y)

    # data parallel
    pupdate = parallel_update(update, mesh)
    s8, l8 = pupdate(state, key, shard_batch(x, mesh), shard_batch(y, mesh))

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_parallel_sampler_shards_chains(mesh):
    from ti_tpu.sampling.integrators import sample_ode

    def sampler(x0s, conds, key):
        return jax.vmap(
            lambda x, c: sample_ode(
                lambda y, t: -c * y, x, n_steps=8, return_dlogp=False
            ).xs[-1]
        )(x0s, conds)

    psampler = parallel_sampler(sampler, mesh)
    x0 = jnp.ones((16, 3))
    conds = jnp.ones((16,))
    out = psampler(
        shard_batch(x0, mesh), shard_batch(conds, mesh), jax.random.PRNGKey(0)
    )
    assert out.shape == (16, 3)
    np.testing.assert_allclose(np.asarray(out), np.exp(-1.0), rtol=1e-4)


def test_chain_rng_independent_of_sharding(mesh):
    """fold_in per-chain RNG: same draws regardless of device layout."""
    key = jax.random.PRNGKey(7)

    def draws(x0s):
        return jax.vmap(
            lambda i: jax.random.normal(jax.random.fold_in(key, i), (3,))
        )(jnp.arange(x0s.shape[0]))

    plain = jax.jit(draws)(jnp.zeros((16,)))
    sharded = jax.jit(draws, in_shardings=batch_sharded(mesh), out_shardings=batch_sharded(mesh))(
        shard_batch(jnp.zeros((16,)), mesh)
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), rtol=1e-6)


def test_fanout_shard_slice_and_config():
    from ti_tpu.config import MDQM9Config
    from ti_tpu.parallel.fanout import shard_config, shard_slice

    # contiguous, disjoint, exhaustive
    slices = [shard_slice(10, i, 3) for i in range(3)]
    assert slices == [(0, 4), (4, 7), (7, 10)]
    cfg = MDQM9Config(seed=5, data_save_name="run")
    c0 = shard_config(cfg, 0, 4)
    c1 = shard_config(cfg, 1, 4)
    assert c0.seed != c1.seed != cfg.seed
    assert c0.data_save_name == "run_shard0of4"
    assert shard_config(cfg, 0, 1) is cfg
    import pytest as _pytest

    with _pytest.raises(ValueError):
        shard_slice(10, 3, 3)


def test_fanout_merge_artifacts(tmp_path):
    """Sharded sampling artifacts merge back to the unsharded layout,
    including the ADW time-major 2-D case; a missing shard raises."""
    from ti_tpu.parallel.fanout import merge_shards

    d = tmp_path
    # molecular-style: (n, n_save, N, 3) + 1-D dlogps... named differently
    for i, n in enumerate((3, 2)):
        np.save(d / f"samples_run_shard{i}of2.npy", np.full((n, 2, 4, 3), i, np.float32))
        np.save(d / f"dlogps_run_shard{i}of2.npy", np.full((2, n), i, np.float32))  # ADW 2-D
        np.save(d / f"latent_dlogps_run_shard{i}of2.npy", np.full((n,), i, np.float32))
    merged = merge_shards(str(d), 2)
    assert len(merged) == 3
    s = np.load(d / "samples_run.npy")
    assert s.shape == (5, 2, 4, 3) and s[0, 0, 0, 0] == 0 and s[4, 0, 0, 0] == 1
    dl = np.load(d / "dlogps_run.npy")
    assert dl.shape == (2, 5)  # ADW layout merged on the chain axis
    ld = np.load(d / "latent_dlogps_run.npy")
    assert ld.shape == (5,)

    import pytest as _pytest

    (d / "samples_run_shard1of2.npy").unlink()
    with _pytest.raises(FileNotFoundError):
        merge_shards(str(d), 2)


@pytest.mark.slow
def test_fanout_driver_launch_and_merge(tmp_path):
    """scripts/fanout_driver.py: spawns one process per shard (appending
    --shard/--num_shards), streams logs, merges; a failing shard aborts the
    merge with per-shard diagnostics."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stub = tmp_path / "stub_sampler.py"
    stub.write_text(
        "import argparse, os, sys\n"
        "import numpy as np\n"
        "ap = argparse.ArgumentParser()\n"
        "ap.add_argument('--out', required=True)\n"
        "ap.add_argument('--fail_shard', type=int, default=-1)\n"
        "ap.add_argument('--shard', type=int, required=True)\n"
        "ap.add_argument('--num_shards', type=int, required=True)\n"
        "a = ap.parse_args()\n"
        "if a.shard == a.fail_shard:\n"
        "    print('boom'); sys.exit(3)\n"
        "print('env marker:', os.environ.get('TI_FANOUT_TEST'))\n"
        "# ADW time-major layout (n_save, n_chains): chain axis is 1\n"
        "np.save(os.path.join(a.out, f'samples_run_shard{a.shard}of{a.num_shards}.npy'),\n"
        "        np.full((2, a.shard + 1), a.shard, np.float32))\n"
    )
    out = tmp_path / "out"
    out.mkdir()

    def drive(extra):
        return subprocess.run(
            [sys.executable, "scripts/fanout_driver.py", "--num_shards", "3",
             "--data_dir", str(out), "--env", "TI_FANOUT_TEST=yes", "--max_parallel", "2",
             "--", sys.executable, str(stub), "--out", str(out)] + extra,
            cwd=repo, capture_output=True, text=True, timeout=120,
        )

    r = drive([])
    assert r.returncode == 0, r.stdout + r.stderr
    merged = np.load(out / "samples_run.npy")
    assert merged.shape == (2, 6)
    np.testing.assert_array_equal(merged[0], [0, 1, 1, 2, 2, 2])
    log = (out / "fanout_logs" / "shard_2.log").read_text()
    assert "env marker: yes" in log

    r = drive(["--fail_shard", "1"])
    assert r.returncode == 1
    assert "FAILED shard 1" in r.stderr


@pytest.mark.slow
def test_fanout_driver_fail_fast(tmp_path):
    """--fail_fast: the first nonzero shard exit abandons pending shards
    and kills running ones instead of letting the fan-out run to
    completion (ADVICE r1)."""
    import os
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stub = tmp_path / "stub.py"
    stub.write_text(
        "import argparse, sys, time, pathlib\n"
        "ap = argparse.ArgumentParser()\n"
        "ap.add_argument('--out', required=True)\n"
        "ap.add_argument('--shard', type=int, required=True)\n"
        "ap.add_argument('--num_shards', type=int, required=True)\n"
        "a = ap.parse_args()\n"
        "if a.shard == 0:\n"
        "    sys.exit(3)\n"
        "time.sleep(30)\n"
        "pathlib.Path(a.out, f'finished_{a.shard}').touch()\n"
    )
    out = tmp_path / "out"
    out.mkdir()
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "scripts/fanout_driver.py", "--num_shards", "3",
         "--data_dir", str(out), "--max_parallel", "2", "--fail_fast",
         "--no_merge",
         "--", sys.executable, str(stub), "--out", str(out)],
        cwd=repo, capture_output=True, text=True, timeout=120,
    )
    elapsed = time.time() - t0
    assert r.returncode == 1
    assert "FAILED shard 0" in r.stderr
    assert "--fail_fast" in r.stderr
    assert elapsed < 20, f"fan-out ran to completion anyway ({elapsed:.0f}s)"
    assert not list(out.glob("finished_*")), "healthy shards were not killed"


@pytest.mark.slow
def test_fanout_end_to_end_sampling(tmp_path):
    """Two sharded sample_ambient runs + merge == artifact layout of one
    unsharded run (shapes; disjoint RNG streams)."""
    from ti_tpu.config import MDQM9Config
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.parallel.fanout import merge_shards, shard_config, shard_slice
    from ti_tpu.sampling.drivers import sample_ambient

    mol = make_synthetic_molecule(n_atoms=4, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    x0 = 0.2 * np.random.default_rng(0).standard_normal((8, 4, 3)).astype(np.float32)

    cfg = MDQM9Config(
        n_features=8, score_layers=1, batch_size=4, n_steps=4, solver_type="rk4",
        data_save_path=str(tmp_path), data_save_name="fan",
        sampling_T0=500, sampling_T1=400,
    )
    outs = []
    for i in range(2):
        lo, hi = shard_slice(len(x0), i, 2)
        ci = shard_config(cfg, i, 2)
        outs.append(sample_ambient(ci, model, params, template, x0[lo:hi]))
    merge_shards(str(tmp_path), 2)
    merged = np.load(tmp_path / "samples_fan.npy")
    assert merged.shape[0] == 8
    np.testing.assert_allclose(merged[:4], outs[0]["samples"])
    np.testing.assert_allclose(merged[4:], outs[1]["samples"])
    # different RNG streams per shard (hutchinson keys etc. must not repeat)
    assert not np.allclose(np.load(tmp_path / "dlogps_fan.npy")[:4],
                           np.load(tmp_path / "dlogps_fan.npy")[4:])


def test_headline_sampler_chain_sharded(mesh):
    """The bench's gauss-dlogp sampler partitions over the chain axis of an
    8-device mesh transparently (jit + sharded inputs), with results equal
    to the unsharded run — the multi-chip story of the headline path."""
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of

    mol = make_synthetic_molecule(n_atoms=4, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    sampler = make_ode_sampler(
        molecular_v_fn_of(model, params, template),
        solver="rk4", n_steps=8, n_save=2, return_dlogp=True,
        divergence="exact", dlogp_quad_points=4, dlogp_quad="gauss",
    )
    key = jax.random.PRNGKey(1)
    x0 = 0.2 * jax.random.normal(key, (16, 4, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (16, 1))

    plain = sampler(x0, temps, key)
    sharded = sampler(shard_batch(x0, mesh), shard_batch(temps, mesh), key)
    assert len(sharded.xs.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(plain.xs), np.asarray(sharded.xs), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(plain.dlogp), np.asarray(sharded.dlogp), rtol=2e-5, atol=2e-6
    )


def test_parallel_update_dense_molecular_loss(mesh):
    """DP step with the dense-pair training impl (train_impl='dense')
    == single-device: the batched (N x N) loss partitions over the data
    mesh, including its global batch mean-centering (a cross-shard mean
    XLA lowers to a collective)."""
    from ti_tpu import interpolants
    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.losses import molecular_velocity_loss
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.train import common

    mol = make_synthetic_molecule(n_atoms=4, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    interp = interpolants.linear(a=1.0, gamma="sin2")

    class Cfg:
        train_impl = "dense"
        train_compute_dtype = "f32"

    batched = common.make_batched_apply(Cfg, model, template)

    def loss_fn(p, k, x0, x1, temps):
        return molecular_velocity_loss(
            model.apply, p, k, template, x0, x1, temps, interp,
            batched_apply_fn=batched,
        )

    tx = common.make_optimizer(weight_decay=0.0, clip=1.0)
    state = common.init_train_state(params, tx, 1e-3)
    update = common.make_update_step(loss_fn, tx)

    key = jax.random.PRNGKey(3)
    x0 = 0.3 * jax.random.normal(key, (16, 4, 3))
    x1 = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (16, 4, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (16, 1))

    s1, l1 = jax.jit(update)(state, key, x0, x1, temps)
    pupdate = parallel_update(update, mesh)
    s8, l8 = pupdate(
        state, key, shard_batch(x0, mesh), shard_batch(x1, mesh),
        shard_batch(temps, mesh),
    )
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def _toy_field(x):
    """Nonlinear toy velocity field with a dense Jacobian."""
    return jnp.sin(x) * jnp.roll(x, 1) + 0.3 * x**2


def test_lane_sharded_divergence_matches(mesh):
    """Exact divergence with tangent lanes sharded over the mesh == the
    unsharded trace, including d not divisible by n (zero-padded lanes) and
    per-device chunking."""
    from jax.sharding import PartitionSpec as P

    from ti_tpu.ops.divergence import divergence_exact

    with mesh:
        for d, chunk in [(7, None), (16, None), (16, 1)]:
            x = jax.random.normal(jax.random.PRNGKey(d), (d,))
            y_ref, div_ref = divergence_exact(_toy_field, x)

            body = lambda xx, c=chunk: divergence_exact(
                _toy_field, xx, chunk=c, axis_name="data"
            )
            y_sh, div_sh = jax.jit(
                jax.shard_map(
                    body, mesh=mesh, in_specs=P(), out_specs=(P(), P()),
                    check_vma=False,
                )
            )(x)
            np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), rtol=1e-6)
            np.testing.assert_allclose(float(div_sh), float(div_ref), rtol=1e-5)


def test_lane_sharded_hutchinson_unbiased(mesh):
    """Probe-sharded Hutchinson stays an unbiased trace estimator: with many
    probes it converges to the exact divergence (different draws than the
    unsharded estimator by design)."""
    from jax.sharding import PartitionSpec as P

    from ti_tpu.ops.divergence import divergence_exact, divergence_hutchinson

    x = jax.random.normal(jax.random.PRNGKey(0), (6,))
    _, div_ref = divergence_exact(_toy_field, x)

    body = lambda xx: divergence_hutchinson(
        _toy_field, xx, jax.random.PRNGKey(42), num_probes=4096, axis_name="data"
    )
    _, est = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=P(), out_specs=(P(), P()), check_vma=False
        )
    )(x)
    assert abs(float(est) - float(div_ref)) < 0.15 * max(1.0, abs(float(div_ref)))

    # orthogonal probe frames, orthogonalized PER SHARD (the sketch is
    # local): 8 devices x 6 probes of d=6 means every shard's frame spans
    # R^6 — each shard's estimate is exact, so the psum mean is too
    body_o = lambda xx: divergence_hutchinson(
        _toy_field, xx, jax.random.PRNGKey(7), num_probes=48,
        axis_name="data", probe_mode="orthogonal",
    )
    _, est_o = jax.jit(
        jax.shard_map(
            body_o, mesh=mesh, in_specs=P(), out_specs=(P(), P()), check_vma=False
        )
    )(x)
    np.testing.assert_allclose(float(est_o), float(div_ref), rtol=1e-4)


def test_lane_parallel_sampler_matches(mesh):
    """The headline gauss-dlogp sampler with div_axis='lanes' over an
    8-device lane mesh reproduces the unsharded rollout: same trajectory
    (velocity transport is replicated compute) and same dlogp (the lane
    psum completes the same trace)."""
    from jax.sharding import Mesh

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.parallel.mesh import lane_parallel_sampler
    from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of

    mol = make_synthetic_molecule(n_atoms=4, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    v_of = molecular_v_fn_of(model, params, template)

    common = dict(
        solver="rk4", n_steps=8, n_save=2, return_dlogp=True,
        divergence="exact", dlogp_quad_points=4, dlogp_quad="gauss",
    )
    plain_sampler = make_ode_sampler(v_of, **common)
    lane_sampler = make_ode_sampler(v_of, div_axis="lanes", **common)

    key = jax.random.PRNGKey(1)
    x0 = 0.2 * jax.random.normal(key, (2, 4, 3))  # 12 lanes over 8 devices
    temps = jnp.tile(jnp.array([700.0, 300.0]), (2, 1))

    plain = plain_sampler(x0, temps, key)
    lanes_mesh = Mesh(np.array(jax.devices()[:8]), ("lanes",))
    sharded = lane_parallel_sampler(lane_sampler, lanes_mesh)(x0, temps, key)

    np.testing.assert_allclose(
        np.asarray(plain.xs), np.asarray(sharded.xs), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(plain.dlogp), np.asarray(sharded.dlogp), rtol=2e-5, atol=1e-5
    )


def test_chain_lane_2d_sampler_matches(mesh):
    """2-D (chains x lanes) mesh: chains split over 'data', tangent lanes
    over 'lanes' — the full multi-chip layout of the headline sampler."""
    from jax.sharding import Mesh

    from ti_tpu.data.mdqm9 import graph_template, make_synthetic_molecule
    from ti_tpu.models.cpainn import CPaiNN
    from ti_tpu.parallel.mesh import lane_parallel_sampler
    from ti_tpu.sampling.drivers import make_ode_sampler, molecular_v_fn_of

    mol = make_synthetic_molecule(n_atoms=4, seed=0)
    template = graph_template(mol, t_cond=2)
    model = CPaiNN(n_features=8, score_layers=1, conditioning="ambient")
    params = model.init(jax.random.PRNGKey(0), template)
    v_of = molecular_v_fn_of(model, params, template)

    common = dict(
        solver="rk4", n_steps=8, n_save=2, return_dlogp=True,
        divergence="exact", dlogp_quad_points=4, dlogp_quad="gauss",
    )
    plain_sampler = make_ode_sampler(v_of, **common)
    lane_sampler = make_ode_sampler(v_of, div_axis="lanes", **common)

    key = jax.random.PRNGKey(2)
    x0 = 0.2 * jax.random.normal(key, (4, 4, 3))
    temps = jnp.tile(jnp.array([700.0, 300.0]), (4, 1))

    plain = plain_sampler(x0, temps, key)
    mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "lanes"))
    sharded = lane_parallel_sampler(lane_sampler, mesh2d, chain_axis="data")(
        x0, temps, key
    )

    assert sharded.xs.shape == plain.xs.shape
    np.testing.assert_allclose(
        np.asarray(plain.xs), np.asarray(sharded.xs), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(plain.dlogp), np.asarray(sharded.dlogp), rtol=2e-5, atol=1e-5
    )
