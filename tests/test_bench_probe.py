"""bench.py backend stall guard.

The axon tunnel can stall during backend init (CLAUDE.md gotcha); the
driver runs ``python bench.py`` unattended at round end, so a stall must
become a fast, diagnosable exit instead of an indefinite hang. These tests
pin the guard's three paths without touching any real backend.
"""

import subprocess
import sys

import pytest

import bench


def test_probe_runs_even_when_env_pins_cpu(monkeypatch):
    # JAX_PLATFORMS=cpu must NOT skip the probe: the driver's
    # sitecustomize overrides the env var via jax.config.update, so an
    # env-pinned process still initializes (and can hang on) the tunnel.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("TI_TPU_BENCH_NO_PROBE", raising=False)
    calls = []
    monkeypatch.setattr(
        subprocess,
        "run",
        lambda cmd, **k: calls.append(cmd) or subprocess.CompletedProcess(cmd, 0),
    )
    bench._probe_backend()
    assert len(calls) == 1


def test_probe_skipped_on_opt_out(monkeypatch):
    monkeypatch.setenv("TI_TPU_BENCH_NO_PROBE", "1")

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("probe subprocess must not launch when opted out")

    monkeypatch.setattr(subprocess, "run", boom)
    bench._probe_backend()


def test_probe_timeout_exits_3(monkeypatch, capsys):
    monkeypatch.delenv("TI_TPU_BENCH_NO_PROBE", raising=False)

    def stall(cmd, timeout, **k):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", stall)
    with pytest.raises(SystemExit) as exc:
        bench._probe_backend(timeout_s=1.0)
    assert exc.value.code == 3
    assert "stalled" in capsys.readouterr().err


def test_probe_child_failure_exits_3(monkeypatch, capsys):
    monkeypatch.delenv("TI_TPU_BENCH_NO_PROBE", raising=False)
    monkeypatch.setattr(
        subprocess,
        "run",
        lambda cmd, **k: subprocess.CompletedProcess(cmd, 7),
    )
    with pytest.raises(SystemExit) as exc:
        bench._probe_backend()
    assert exc.value.code == 3
    assert "exited 7" in capsys.readouterr().err


def test_probe_healthy_backend_returns(monkeypatch):
    monkeypatch.delenv("TI_TPU_BENCH_NO_PROBE", raising=False)
    monkeypatch.setattr(
        subprocess,
        "run",
        lambda cmd, **k: subprocess.CompletedProcess(cmd, 0),
    )
    bench._probe_backend()
