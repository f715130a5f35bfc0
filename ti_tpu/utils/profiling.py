"""Offline summarizer for jax.profiler traces (SURVEY.md §5.1; ROADMAP #10).

The reference ships no profiling at all (its only instrumentation is an RHS
counter, mdqm9/thermo/ambient/models/ode_wrapper.py:45). Our samplers can
wrap regions in ``jax.profiler`` traces (utils/logging.profile_trace), but
this image has no TensorBoard/xprof to view them — so this module parses the
Chrome-trace JSON (``*.trace.json.gz``) that every trace emits and reduces
it to the table that actually matters for kernel work: per-op total device
time, call counts, and the device-busy fraction of the traced span.

Pure stdlib (json + gzip): works in any environment, including the bench
harness on the real chip and the CPU test mesh.
"""

from __future__ import annotations

import glob
import gzip
import json
import os

from collections import defaultdict
from typing import Dict, List, NamedTuple


class OpStat(NamedTuple):
    name: str
    count: int
    total_us: float

    @property
    def avg_us(self) -> float:
        return self.total_us / max(self.count, 1)


class LaneSummary(NamedTuple):
    """One timeline lane: a (process, thread) pair of the trace."""

    process: str
    thread: str
    ops: List[OpStat]          # sorted by total (inclusive) time, descending
    busy_us: float             # union of event intervals (nested spans merged)
    span_us: float             # last end - first start on this lane


def find_trace_file(logdir: str) -> str:
    """Newest ``*.trace.json.gz`` under logdir/plugins/profile/<run>/."""
    pattern = os.path.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")
    files = sorted(glob.glob(pattern), key=os.path.getmtime)
    if not files:
        # accept a direct file path or a dir holding the gz
        if os.path.isfile(logdir):
            return logdir
        direct = sorted(glob.glob(os.path.join(logdir, "*.trace.json.gz")))
        if direct:
            return direct[-1]
        raise FileNotFoundError(f"no *.trace.json.gz under {logdir!r}")
    return files[-1]


def load_trace(path_or_logdir: str) -> dict:
    path = (
        path_or_logdir
        if os.path.isfile(path_or_logdir)
        else find_trace_file(path_or_logdir)
    )
    # find_trace_file accepts direct paths that may be uncompressed
    # .trace.json files — sniff the gzip magic instead of trusting the name
    with open(path, "rb") as f:
        is_gz = f.read(2) == b"\x1f\x8b"
    opener = gzip.open if is_gz else open
    with opener(path, "rt") as f:
        return json.load(f)


def summarize_lanes(trace: dict) -> List[LaneSummary]:
    """Aggregate complete ("ph": "X") events per (process, thread) lane."""
    proc_names: Dict[int, str] = {}
    thread_names: Dict[tuple, str] = {}
    events = trace.get("traceEvents", [])
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e.get("args", {}).get("name", str(e["pid"]))
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e.get("args", {}).get(
                "name", str(e.get("tid"))
            )

    agg: Dict[tuple, Dict[str, List[float]]] = defaultdict(
        lambda: defaultdict(lambda: [0, 0.0])
    )
    intervals: Dict[tuple, List[tuple]] = defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e["pid"], e.get("tid"))
        dur = float(e.get("dur", 0.0))
        ts = float(e.get("ts", 0.0))
        cell = agg[key][e.get("name", "?")]
        cell[0] += 1
        cell[1] += dur
        intervals[key].append((ts, ts + dur))

    lanes = []
    for key, by_name in agg.items():
        ops = sorted(
            (OpStat(n, int(c), t) for n, (c, t) in by_name.items()),
            key=lambda o: -o.total_us,
        )
        # busy time = UNION of the lane's intervals: host lanes nest TraceMe
        # spans (parent + children overlap), so summing durations would
        # double-count and report >100% busy
        ivs = sorted(intervals[key])
        busy = 0.0
        cur_lo, cur_hi = ivs[0]
        for lo, hi in ivs[1:]:
            if lo > cur_hi:
                busy += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        busy += cur_hi - cur_lo
        lanes.append(
            LaneSummary(
                process=proc_names.get(key[0], str(key[0])),
                thread=thread_names.get(key, str(key[1])),
                ops=ops,
                busy_us=busy,
                span_us=max(hi for _, hi in ivs) - ivs[0][0],
            )
        )
    lanes.sort(key=lambda l: -l.busy_us)
    return lanes


def format_summary(
    lanes: List[LaneSummary], top: int = 15, lane_filter: str = ""
) -> str:
    """Human-readable per-lane op tables (filter by substring on
    'process/thread'; device lanes sort first by busy time)."""
    out = []
    for lane in lanes:
        label = f"{lane.process} / {lane.thread}"
        if lane_filter and lane_filter.lower() not in label.lower():
            continue
        busy_pct = 100.0 * lane.busy_us / lane.span_us if lane.span_us else 0.0
        out.append(
            f"== {label}: {lane.busy_us/1e3:.2f} ms busy over "
            f"{lane.span_us/1e3:.2f} ms span ({busy_pct:.0f}%), "
            f"{len(lane.ops)} distinct ops"
        )
        out.append(f"{'total ms':>10} {'count':>7} {'avg us':>9}  op")
        for op in lane.ops[:top]:
            out.append(
                f"{op.total_us/1e3:10.3f} {op.count:7d} {op.avg_us:9.1f}  {op.name[:90]}"
            )
        rest = lane.ops[top:]
        if rest:
            out.append(
                f"{sum(o.total_us for o in rest)/1e3:10.3f} {sum(o.count for o in rest):7d}"
                f" {'':>9}  (+{len(rest)} more ops)"
            )
        out.append("")
    return "\n".join(out)


def summarize(logdir: str, top: int = 15, lane_filter: str = "") -> str:
    return format_summary(summarize_lanes(load_trace(logdir)), top, lane_filter)
