"""Aggregate device-op time from a jax.profiler trace (.xplane.pb).

The tensorboard_plugin_profile converter is broken in this sandbox
(protobuf/_pywrap mismatch), so this parses the xplane directly with
jaxlib's ProfileData: events on the "XLA Ops" line are summed per op
name (async copy/slice lines overlap compute and are skipped; module
spans live on "XLA Modules" and are reported separately).

Usage:
  python scripts/probes/xplane_top.py TRACE_DIR [TOP_N]
  python scripts/probes/xplane_top.py TRACE_A TRACE_B [TOP_N]   # diff

TRACE_* is the directory passed to jax.profiler.start_trace (the
.xplane.pb is found recursively). With two traces, prints per-op totals
side by side sorted by |delta| — the tool for "which op got slower".
Op names are canonicalized (fusion.123 -> fusion.*) so the same
computation matches across compiles with different HLO numbering is NOT
attempted; instead ops aggregate by their full name, and the diff also
prints per-category rollups (pallas / fusion / conv / copy / other)
which are stable across numbering changes.
"""
import glob
import os
import re
import sys
from collections import defaultdict


def _xplane(path):
    pbs = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                           recursive=True))
    if not pbs:
        sys.exit(f"no .xplane.pb under {path}")
    return pbs[-1]


def load_ops(trace_dir):
    """{op_name: total_ms} from the 'XLA Ops' line + n_steps estimate."""
    from jax.profiler import ProfileData

    pd = ProfileData.from_serialized_xspace(
        open(_xplane(trace_dir), "rb").read())
    ops = defaultdict(float)
    module_ms = []
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Ops":
                for ev in line.events:
                    ops[ev.name] += ev.duration_ns / 1e6
            elif line.name == "XLA Modules":
                for ev in line.events:
                    module_ms.append(ev.duration_ns / 1e6)
    return dict(ops), module_ms


_CATS = (
    # control containers (while/cond) span their whole body: their children
    # are ALSO reported individually, so keep them out of the op rollup
    ("control", re.compile(r"^%?(while|conditional)[.\d]*\s*=")),
    ("pallas", re.compile(r"gcl|pallas|custom-call", re.I)),
    ("conv", re.compile(r"conv", re.I)),
    ("copy", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("dot", re.compile(r"dot|matmul", re.I)),
    ("fusion", re.compile(r"fusion|multiply|add|subtract|reduce", re.I)),
)


def _cat(name):
    for cat, rx in _CATS:
        if rx.search(name):
            return cat
    return "other"


def show(trace_dir, top_n):
    ops, mods = load_ops(trace_dir)
    tot = sum(ops.values())
    print(f"== {trace_dir}: {len(ops)} ops, {tot:.1f} ms total on "
          f"'XLA Ops'; modules: {[round(m, 1) for m in sorted(mods)[-4:]]}")
    for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {ms:9.3f} ms  {_cat(name):7s}  {name[:100]}")
    cats = defaultdict(float)
    for name, ms in ops.items():
        cats[_cat(name)] += ms
    print("  rollup:", {k: round(v, 1)
                        for k, v in sorted(cats.items(), key=lambda kv: -kv[1])})


def diff(dir_a, dir_b, top_n):
    ops_a, mods_a = load_ops(dir_a)
    ops_b, mods_b = load_ops(dir_b)
    print(f"== A={dir_a} ({sum(ops_a.values()):.1f} ms) vs "
          f"B={dir_b} ({sum(ops_b.values()):.1f} ms)")
    print(f"   modules A: {[round(m, 1) for m in sorted(mods_a)[-4:]]}  "
          f"B: {[round(m, 1) for m in sorted(mods_b)[-4:]]}")
    names = set(ops_a) | set(ops_b)
    rows = [(ops_b.get(n, 0.0) - ops_a.get(n, 0.0), ops_a.get(n, 0.0),
             ops_b.get(n, 0.0), n) for n in names]
    print("   top |B-A| per op:")
    for d, a, b, n in sorted(rows, key=lambda r: -abs(r[0]))[:top_n]:
        print(f"  {d:+9.3f} ms  (A {a:8.3f} -> B {b:8.3f})  "
              f"{_cat(n):7s}  {n[:90]}")
    cats = defaultdict(lambda: [0.0, 0.0])
    for n in names:
        cats[_cat(n)][0] += ops_a.get(n, 0.0)
        cats[_cat(n)][1] += ops_b.get(n, 0.0)
    print("   rollup (A -> B):")
    for k, (a, b) in sorted(cats.items(), key=lambda kv: -abs(kv[1][1]
                                                              - kv[1][0])):
        print(f"  {k:7s}  {a:8.1f} -> {b:8.1f}  ({b - a:+.1f})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    top_n = int(args.pop()) if args and args[-1].isdigit() else 25
    if len(args) == 1:
        show(args[0], top_n)
    elif len(args) == 2:
        diff(args[0], args[1], top_n)
    else:
        sys.exit(__doc__)
