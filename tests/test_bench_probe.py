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
    # retries=1 restores fail-fast; without it the default retry schedule
    # (3 attempts, 120 s apart) would sleep ~4 real minutes in this test
    monkeypatch.setenv("TI_TPU_BENCH_PROBE_RETRIES", "1")

    def stall(cmd, timeout, **k):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", stall)
    with pytest.raises(SystemExit) as exc:
        bench._probe_backend(timeout_s=1.0)
    assert exc.value.code == 3
    assert "stalled" in capsys.readouterr().err


def test_probe_retries_then_exits_3(monkeypatch, capsys):
    # the retry schedule runs all attempts (waiting between them) before
    # declaring the tunnel stalled — and a mid-schedule recovery succeeds
    monkeypatch.delenv("TI_TPU_BENCH_NO_PROBE", raising=False)
    monkeypatch.setenv("TI_TPU_BENCH_PROBE_RETRIES", "3")
    monkeypatch.setenv("TI_TPU_BENCH_PROBE_WAIT_S", "0")

    attempts = []

    def stall(cmd, timeout, **k):
        attempts.append(1)
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", stall)
    with pytest.raises(SystemExit) as exc:
        bench._probe_backend(timeout_s=1.0)
    assert exc.value.code == 3 and len(attempts) == 3
    assert "retrying" in capsys.readouterr().err

    # recovery on the second attempt: no exit
    attempts.clear()

    def flaky(cmd, timeout, **k):
        attempts.append(1)
        if len(attempts) == 1:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", flaky)
    bench._probe_backend(timeout_s=1.0)
    assert len(attempts) == 2


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
