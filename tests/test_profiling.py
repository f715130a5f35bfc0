"""Offline jax.profiler trace summary (utils/profiling.py, SURVEY.md §5.1)."""

import subprocess
import sys
import os

import jax
import jax.numpy as jnp

from ti_tpu.utils.profiling import (
    find_trace_file,
    load_trace,
    summarize,
    summarize_lanes,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _capture_trace(logdir):
    with jax.profiler.trace(str(logdir)):
        x = jnp.ones((256, 256))
        y = x
        for _ in range(3):
            y = jnp.tanh(y @ x)
        y.block_until_ready()


def test_trace_summary_end_to_end(tmp_path):
    _capture_trace(tmp_path)
    path = find_trace_file(str(tmp_path))
    assert path.endswith(".trace.json.gz")

    lanes = summarize_lanes(load_trace(str(tmp_path)))
    assert lanes, "no timeline lanes parsed"
    # the XLA executor lane must show the matmul with a sane aggregate
    all_ops = {o.name: o for l in lanes for o in l.ops}
    dots = [o for n, o in all_ops.items() if "dot" in n.lower()]
    assert dots and dots[0].count >= 1 and dots[0].total_us > 0
    assert dots[0].avg_us == dots[0].total_us / dots[0].count

    text = summarize(str(tmp_path), top=5)
    assert "busy over" in text and "dot" in text.lower()
    # lane filter narrows the report
    filtered = summarize(str(tmp_path), top=5, lane_filter="no-such-lane")
    assert filtered.strip() == ""


def test_profile_summary_cli(tmp_path):
    _capture_trace(tmp_path)
    r = subprocess.run(
        [sys.executable, "scripts/profile_summary.py", str(tmp_path), "--top", "3"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "busy over" in r.stdout


def test_busy_time_merges_nested_spans():
    """Nested host TraceMe spans must not double-count busy time."""
    trace = {
        "traceEvents": [
            {"ph": "M", "pid": 1, "name": "process_name", "args": {"name": "/host:CPU"}},
            {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name", "args": {"name": "python"}},
            {"ph": "X", "pid": 1, "tid": 2, "name": "parent", "ts": 0.0, "dur": 100.0},
            {"ph": "X", "pid": 1, "tid": 2, "name": "child", "ts": 10.0, "dur": 20.0},
            {"ph": "X", "pid": 1, "tid": 2, "name": "late", "ts": 150.0, "dur": 50.0},
        ]
    }
    (lane,) = summarize_lanes(trace)
    assert lane.busy_us == 150.0  # union of [0,100] and [150,200]
    assert lane.span_us == 200.0
    # inclusive per-op totals are still reported
    assert {o.name: o.total_us for o in lane.ops} == {
        "parent": 100.0, "child": 20.0, "late": 50.0
    }


def test_load_trace_uncompressed_direct_path(tmp_path):
    """find_trace_file accepts a direct file path that may be plain JSON;
    load_trace sniffs the gzip magic instead of crashing with BadGzipFile
    (ADVICE r1)."""
    import json

    from ti_tpu.utils.profiling import load_trace

    p = tmp_path / "run.trace.json"
    payload = {"traceEvents": [{"ph": "X", "pid": 1, "tid": 1,
                                "name": "op", "ts": 0.0, "dur": 5.0}]}
    p.write_text(json.dumps(payload))
    assert load_trace(str(p)) == payload


def test_metric_logger_print_fallback(capsys):
    """MetricLogger without wandb prints one line per log call (the
    reference's use_wandb-else-print convention, adw/train.py:88-91)."""
    from ti_tpu.utils.logging import MetricLogger

    lg = MetricLogger(use_wandb=False)
    lg.log({"loss": 0.123456789, "epoch": 3}, step=7)
    lg.log({"note": "plain"})
    lg.finish()  # no wandb: must be a no-op, not an AttributeError
    out = capsys.readouterr().out
    assert "[step 7] loss=0.123457 epoch=3" in out
    assert "note=plain" in out


def test_profile_trace_noop_without_logdir():
    from ti_tpu.utils.logging import profile_trace

    with profile_trace(None):
        pass  # must not start the jax profiler
    with profile_trace(""):
        pass
