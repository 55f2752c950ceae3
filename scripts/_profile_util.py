"""Shared per-fusion device-time attribution for the bench scripts.

Methodology (DESIGN.md round 2b/3): run the compiled program a few times
inside a jax.profiler trace window (compile + settle OUTSIDE the window),
sum device-op durations from the trace, then join each op against the
optimized HLO's op_name metadata so every fusion is attributed to the
model layer (jax.named_scope) that produced it. Optionally dump the HLO
bodies of the slowest fusions (DUMP_FUSIONS=N) — that is how the round-3
attribution found the dual-output bf16 writes and the 14-lane head-conv
layout trap.
"""

import collections
import glob
import gzip
import json
import os
import re
import tempfile
import textwrap

# trace rows that are host-side bookkeeping, not device ops
_HOST_MARKERS = ("np.", "PjitFunction", "DevicePut", "jit(", "jit_",
                 "block_until", "$", "Thunk", "TransferTo")


def collect_device_durations(jax, run_once, settle, iters=3):
    """Trace `iters` dispatches of run_once() (then settle() to drain) and
    return {device op name: total us across iters}."""
    settle(run_once())  # compile + settle outside the trace window
    trace_dir = tempfile.mkdtemp(prefix="prof_")
    jax.profiler.start_trace(trace_dir)
    out = None
    for _ in range(iters):
        out = run_once()
    settle(out)
    jax.profiler.stop_trace()
    traces = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
    with gzip.open(traces[-1]) as fh:
        trace = json.load(fh)
    durs = collections.Counter()
    for e in trace.get("traceEvents", []):
        name = e.get("name", "")
        if (e.get("ph") == "X" and "dur" in e
                and not any(m in name for m in _HOST_MARKERS)):
            durs[name] += e["dur"]
    return durs


def hlo_op_info(hlo_text):
    """{instruction name: (result shape, op_name metadata)} from optimized
    HLO — joins trace rows back to jax.named_scope layer names."""
    info = {}
    head = re.compile(r"%(\S+) = (\S+) (?:[a-z\-]*fusion|copy|"
                      r"convolution)\(")
    op_re = re.compile(r"op_name=\"([^\"]*)\"")
    for line in hlo_text.splitlines():
        m = head.search(line)
        if m:
            op = op_re.search(line)
            info[m.group(1)] = (m.group(2), op.group(1) if op else "?")
    return info


def print_attribution(durs, hlo_text, iters=3, top=70, tail_parts=4):
    """Per-layer device-time table, slowest first."""
    info = hlo_op_info(hlo_text)
    total = sum(durs.values()) / iters / 1e3
    print(f"\ndevice total: {total:.2f} ms/step")
    by_layer = collections.Counter()
    shape_of = {}
    for name, d in durs.items():
        shape, layer = info.get(name, ("?", name))
        key = ("/".join(layer.split("/")[-tail_parts:])
               if layer != "?" else name)
        by_layer[key] += d
        shape_of[key] = shape
    for key, d in by_layer.most_common(top):
        print(f"{d / iters / 1e3:8.3f} ms/step  "
              f"{shape_of.get(key, '?')[:44]:44s} {key[:90]}")
    return by_layer


def dump_slow_fusions(durs, hlo_text, ndump, iters=3):
    """Print the HLO bodies of the ndump slowest device ops."""
    slow = [name for name, _ in durs.most_common(ndump)]
    comps = {}  # computation name -> [lines]
    cur = None
    for line in hlo_text.splitlines():
        if line.startswith("%") or line.startswith("ENTRY"):
            cur = line.split()[0].lstrip("%")
            comps[cur] = []
        elif cur is not None and line.strip():
            comps[cur].append(line.rstrip())
    for name in slow:
        print(f"\n===== {name}  ({durs[name] / iters / 1e3:.3f} ms/step)"
              f" =====")
        for cname, lines in comps.items():
            for line in lines:
                if (f"%{name} = " in line
                        or f"{name} = " in line.lstrip()):
                    print(textwrap.shorten(line.strip(), 400))
                    m = re.search(r"(?:calls|fusion)=%?([\w\.\-]+)", line)
                    if m and m.group(1) in comps:
                        for bl in comps[m.group(1)]:
                            print("   ", bl.strip()[:240])
                    break
