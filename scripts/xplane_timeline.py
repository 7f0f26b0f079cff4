"""Exclusive-time accounting for a TPU xplane trace.

Per-op duration sums over-count: async DMA events (slice-start/copy-start)
carry their full start->done window, which overlaps compute. This tool
sweeps each TPU trace line, attributes each instant to the innermost
running event, and prints (a) exclusive us/iter by op-name bucket and
(b) total busy vs gap time per line.

Usage: python scripts/xplane_timeline.py <trace_dir> <iters> [top_n] [--ops]

``--ops`` attributes to INDIVIDUAL op names (no family bucketing) — for
itemizing which concrete stack/copy/slice ops carry a family's time.
"""

import glob
import re
import sys

BY_OP = "--ops" in sys.argv


def bucket(name: str) -> str:
    """Collapse %op.N names into families."""
    if BY_OP:
        return name
    m = re.match(r"%?([a-zA-Z_\-]+)", name)
    fam = m.group(1) if m else name
    for key in ("sliding_window_attention_packed_bwd",
                "sliding_window_attention_packed_fwd",
                "transpose_jvp", "jvp"):
        if key in name:
            return key
    return fam


def main():
    trace_dir = sys.argv[1]
    iters = int(sys.argv[2])
    args = [a for a in sys.argv[3:] if not a.startswith("--")]
    top_n = int(args[0]) if args else 30

    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if not line.events:
                    continue
                evs = sorted(
                    ((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                      ev_meta.get(ev.metadata_id, "?"))
                     for ev in line.events), key=lambda t: (t[0], -t[1]))
                # innermost-running attribution via a sweep with a stack
                points = []
                for s, e, name in evs:
                    points.append((s, 0, e, name))
                    points.append((e, 1, e, name))
                points.sort(key=lambda t: (t[0], t[1]))
                stack = []  # (end, name)
                excl = {}
                busy0 = min(s for s, _, _ in evs)
                busyN = max(e for _, e, _ in evs)
                last_t = busy0
                for t, kind, e, name in points:
                    if t > last_t and stack:
                        # innermost = last pushed still active
                        active = [x for x in stack if x[0] >= t]
                        if active:
                            b = bucket(active[-1][1])
                            excl[b] = excl.get(b, 0.0) + (t - last_t)
                    last_t = t
                    if kind == 0:
                        stack.append((e, name))
                    else:
                        stack = [x for x in stack if not (x[0] == e and x[1] == name)] \
                            if (e, name) in stack else stack[:-1] if stack else stack
                span = busyN - busy0
                total_excl = sum(excl.values())
                print(f"-- line '{line.name}' span {span/1e6/iters:.1f} us/iter, "
                      f"attributed {total_excl/1e6/iters:.1f}, "
                      f"gap {(span-total_excl)/1e6/iters:.1f}")
                for name, ps in sorted(excl.items(), key=lambda kv: -kv[1])[:top_n]:
                    if ps / 1e6 / iters < 1.0:
                        break
                    print(f"   {ps/1e6/iters:9.2f} us/iter  {name[:90]}")


if __name__ == "__main__":
    main()
