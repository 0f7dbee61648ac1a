"""Parse a jax.profiler xplane.pb trace into per-op device self-times.

The tensorboard_plugin_profile wrapper is broken in this environment; the
raw proto parse (tensorflow.tsl protobuf, pure-python impl) works fine.

Usage (as a library):
    from xplane_util import device_op_times
    rows = device_op_times("/tmp/trace_x")   # [(total_us, occurrences, name)]

or as a script:
    python scripts/xplane_util.py /tmp/trace_x [top_n]
"""
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def _load_spaces(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    spaces = []
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        spaces.append(xs)
    return spaces


def device_op_times(logdir, line_filter=("XLA Ops",)):
    """Aggregate per-op SELF time on device-plane lines.

    Events on a TPU "XLA Ops" line nest (a while/fusion wrapper spans its
    body's events), so raw duration double-counts. Self-time = duration
    minus the time covered by directly-nested child events (stack sweep
    over events sorted by start time).

    Returns [(total_self_us, count, name)] sorted descending.
    """
    agg = {}
    for xs in _load_spaces(logdir):
        for plane in xs.planes:
            if not ("TPU" in plane.name or "device:" in plane.name.lower()):
                continue
            emeta = plane.event_metadata
            for line in plane.lines:
                if line_filter and line.name not in line_filter:
                    continue
                evs = sorted(
                    ((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                      emeta[ev.metadata_id].name) for ev in line.events),
                    key=lambda e: (e[0], -e[1]))
                stack = []  # [start_ps, end_ps, name, child_cover_ps]

                def _close(fr, upto):
                    while fr and fr[-1][1] <= upto:
                        s, e, name, cover = fr.pop()
                        self_us = max(0.0, (e - s) - cover) / 1e6
                        t, c = agg.get(name, (0.0, 0))
                        agg[name] = (t + self_us, c + 1)
                        if fr:
                            fr[-1][3] += e - s

                for s, e, name in evs:
                    _close(stack, s)
                    stack.append([s, e, name, 0])
                _close(stack, float("inf"))
    rows = [(t, c, n) for n, (t, c) in agg.items()]
    rows.sort(reverse=True)
    return rows


def line_names(logdir):
    out = []
    for xs in _load_spaces(logdir):
        for plane in xs.planes:
            out.append((plane.name, [ln.name for ln in plane.lines]))
    return out


def _norm(name):
    """%_matmul_kb32.5612 = f32[...] ... -> _matmul_kb32"""
    import re

    head = name.split(" = ")[0].strip().lstrip("%")
    return re.sub(r"[.\d]+$", "", head)


def grouped(rows):
    agg = {}
    for t, c, name in rows:
        g = _norm(name)
        tt, cc = agg.get(g, (0.0, 0))
        agg[g] = (tt + t, cc + c)
    out = [(t, c, n) for n, (t, c) in agg.items()]
    out.sort(reverse=True)
    return out


def print_report(logdir, top=40, line_filter=("XLA Ops",), group=True):
    rows = device_op_times(logdir, line_filter=line_filter)
    tot = sum(t for t, _, _ in rows)
    print(f"device total {tot/1e3:.2f} ms over trace ({len(rows)} distinct ops)")
    view = grouped(rows) if group else rows
    for t, c, name in view[:top]:
        print(f"{t/1e3:9.3f} ms {100*t/tot:5.1f}% x{c:<6d} {name[:100]}")
    return rows


if __name__ == "__main__":
    logdir = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    if not glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True):
        print("planes/lines:", line_names(logdir))
    print_report(logdir, top)
