#!/usr/bin/env python
"""Summarize a jax.profiler trace offline (no TensorBoard/xprof needed).

Usage:
  python scripts/profile_summary.py <logdir-or-trace.json.gz> [--top N]
      [--lane SUBSTR]

<logdir> is whatever was passed to jax.profiler.trace / profile_trace —
the newest run under logdir/plugins/profile/ is summarized. ``--lane``
filters timeline lanes by substring (e.g. --lane TPU to show only device
lanes). See ti_tpu/utils/profiling.py.
"""
import argparse
import sys

sys.path.insert(0, ".")

from ti_tpu.utils.profiling import summarize

if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--lane", default="")
    args = ap.parse_args()
    print(summarize(args.logdir, top=args.top, lane_filter=args.lane))
