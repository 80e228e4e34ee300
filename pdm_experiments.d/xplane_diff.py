#!/usr/bin/env python
"""Diff two jax.profiler xplane traces by op kind (TPU device plane).

Usage: python pdm_experiments.d/xplane_diff.py /tmp/tax_homog /tmp/tax_flat

While-loop events nest their body ops (durations double-count), so only
RELATIVE per-kind diffs between two traces of the same program shape are
meaningful — never absolute sums (see memory notes).
"""

import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load(space_dir):
    paths = glob.glob(os.path.join(space_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {space_dir}")
    sp = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        sp.ParseFromString(f.read())
    return sp


def kind_of(name):
    """Collapse op names to kinds: fusion.123 -> fusion, etc."""
    base = name.split(".")[0]
    base = re.sub(r"[_\d]+$", "", base)
    return base


def per_kind(space_dir):
    sp = load(space_dir)
    out = collections.Counter()
    for plane in sp.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            meta = plane.event_metadata
            for ev in line.events:
                nm = meta[ev.metadata_id].name
                out[kind_of(nm)] += ev.duration_ps / 1e9   # -> ms
    return out


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    a, b = per_kind(a_dir), per_kind(b_dir)
    keys = sorted(set(a) | set(b),
                  key=lambda k: -(b.get(k, 0) - a.get(k, 0)))
    ta, tb = sum(a.values()), sum(b.values())
    print(f"{'op kind':40s} {'A ms':>10s} {'B ms':>10s} {'diff':>10s}")
    for k in keys:
        da, db = a.get(k, 0.0), b.get(k, 0.0)
        if max(da, db) < 0.05:
            continue
        print(f"{k:40s} {da:10.2f} {db:10.2f} {db - da:+10.2f}")
    print(f"{'TOTAL (nested, indicative only)':40s} {ta:10.2f} {tb:10.2f} "
          f"{tb - ta:+10.2f}")


if __name__ == "__main__":
    main()
