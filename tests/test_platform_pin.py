"""JAX_PLATFORMS env-pin restoration (ti_tpu/utils/platform.py).

The driver's sitecustomize pins ``jax_platforms`` through ``jax.config``
at interpreter start, silently overriding the JAX_PLATFORMS env var — so
``JAX_PLATFORMS=cpu python scripts/...`` would initialize (and, when the
tunnel stalls, hang on) the TPU backend. ``honor_env_platforms`` runs at
``ti_tpu`` import and re-asserts explicit non-TPU env pins.
"""

import jax
import pytest

from ti_tpu.utils import platform


@pytest.fixture
def restore_platforms():
    before = jax.config.jax_platforms
    yield
    jax.config.update("jax_platforms", before)


def test_env_pin_beats_config_override(monkeypatch, restore_platforms):
    jax.config.update("jax_platforms", "cpu,tpu")  # sitecustomize-style pin
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    platform.honor_env_platforms()
    assert jax.config.jax_platforms == "cpu"


def test_tpu_env_pin_left_alone(monkeypatch, restore_platforms):
    # When the env itself asks for the tunnel, the sitecustomize config
    # ("axon,cpu") is already right — do not rewrite it.
    jax.config.update("jax_platforms", "cpu,tpu")
    for pin in ("axon", "tpu", "axon,cpu"):
        monkeypatch.setenv("JAX_PLATFORMS", pin)
        platform.honor_env_platforms()
        assert jax.config.jax_platforms == "cpu,tpu"


def test_unset_env_left_alone(monkeypatch, restore_platforms):
    jax.config.update("jax_platforms", "cpu,tpu")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    platform.honor_env_platforms()
    assert jax.config.jax_platforms == "cpu,tpu"
