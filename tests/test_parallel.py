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
