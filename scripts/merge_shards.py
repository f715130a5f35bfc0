#!/usr/bin/env python
"""Merge sharded sampling artifacts back into the unsharded filenames.

Usage: python scripts/merge_shards.py <data_dir> <num_shards> [--delete]
See ti_tpu/parallel/fanout.py for the fan-out launch shape.
"""
import sys

sys.path.insert(0, ".")

from ti_tpu.parallel.fanout import merge_shards

if __name__ == "__main__":
    data_dir, k = sys.argv[1], int(sys.argv[2])
    merged = merge_shards(data_dir, k, delete="--delete" in sys.argv)
    for out, parts in merged.items():
        print(f"{out} <- {len(parts)} shards")
