"""Device-time measurement via the JAX profiler's XPlane traces.

The reference times with raw ``__rdtsc`` deltas (dbde_util_test.cpp:234-364);
on TPU, wall-clock timing is treacherous — dispatch is async, the runtime can
elide duplicate executions, and host-side chain ops pollute the measurement.
This module runs a function under ``jax.profiler.trace`` and extracts the
*device* execution time of its kernels from the emitted ``*.xplane.pb``
(parsed with a minimal self-contained protobuf walker — no tensorflow
dependency).
"""

from __future__ import annotations

import glob
import shutil
import tempfile
from collections import defaultdict

import jax


def _read_varint(buf: bytes, i: int):
    v = 0
    sh = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << sh
        if not (b & 0x80):
            return v, i
        sh += 7


def _parse_msg(buf: bytes):
    out = []
    i, n = 0, len(buf)
    while i < n:
        try:
            tag, i = _read_varint(buf, i)
        except (IndexError, OverflowError):
            return None
        f, wt = tag >> 3, tag & 7
        if wt == 0:
            try:
                v, i = _read_varint(buf, i)
            except (IndexError, OverflowError):
                return None
            out.append((f, 0, v))
        elif wt == 2:
            try:
                ln, i = _read_varint(buf, i)
            except (IndexError, OverflowError):
                return None
            if ln < 0 or i + ln > n:
                return None
            out.append((f, 2, buf[i : i + ln]))
            i += ln
        elif wt == 5:
            if i + 4 > n:
                return None
            out.append((f, 5, buf[i : i + 4]))
            i += 4
        elif wt == 1:
            if i + 8 > n:
                return None
            out.append((f, 1, buf[i : i + 8]))
            i += 8
        else:
            return None
    return out


def device_event_times(trace_dir: str, device_prefix: bytes = b"/device:TPU") -> dict:
    """Parse the newest xplane.pb under ``trace_dir`` → {event_name:
    (total_us, count)} for events on the device timeline."""
    pbs = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))
    if not pbs:
        return {}
    data = open(pbs[-1], "rb").read()
    top = _parse_msg(data) or []
    tot = defaultdict(int)
    cnt = defaultdict(int)
    for f, wt, v in top:
        if wt != 2:
            continue
        plane = _parse_msg(v) or []
        pname = [x[2] for x in plane if x[0] == 2 and x[1] == 2]
        if not pname or not pname[0].startswith(device_prefix):
            continue
        names = {}
        for f2, wt2, v2 in plane:
            if f2 == 4 and wt2 == 2:  # event_metadata map entry
                ent = _parse_msg(v2) or []
                k = [x[2] for x in ent if x[0] == 1 and x[1] == 0]
                md = [x[2] for x in ent if x[0] == 2 and x[1] == 2]
                if md and k:
                    m = _parse_msg(md[0]) or []
                    nm = [x[2] for x in m if x[1] == 2]
                    if nm:
                        names[k[0]] = nm[0].decode("utf-8", "ignore")
        for f2, wt2, v2 in plane:
            if f2 == 3 and wt2 == 2:  # XLine
                line = _parse_msg(v2) or []
                for f3, wt3, v3 in line:
                    if f3 == 4 and wt3 == 2:  # XEvent
                        ev = _parse_msg(v3)
                        if not ev:
                            continue
                        mid = [x[2] for x in ev if x[0] == 1 and x[1] == 0]
                        dur = [x[2] for x in ev if x[0] == 3 and x[1] == 0]
                        if mid and dur:
                            nm = names.get(mid[0], f"id{mid[0]}")
                            tot[nm] += dur[0]
                            cnt[nm] += 1
    return {k: (t / 1e6, cnt[k]) for k, t in tot.items()}


def measure_device_seconds(fn, *args, reps: int = 4, match: str | None = None) -> float | None:
    """Run ``fn(*args)`` ``reps`` times under the profiler → seconds per
    execution of the dominant (or ``match``-named) device event.  Returns
    None when no device trace is available (e.g. CPU backend)."""
    out = jax.block_until_ready(fn(*args))  # compile + warm
    d = tempfile.mkdtemp(prefix="dbde_prof_")
    try:
        with jax.profiler.trace(d):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
        times = device_event_times(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    if not times:
        return None
    if match is not None:
        times = {k: v for k, v in times.items() if match in k} or times
    # dominant event family: jit-level entries duplicate HLO entries, pick max
    name, (us, n) = max(times.items(), key=lambda kv: kv[1][0])
    if n == 0:
        return None
    return us / n / 1e6
