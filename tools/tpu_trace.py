"""Capture a device trace of a jitted function and print per-HLO time.

Wraps ``jax.profiler.trace`` + xprof's xplane→``hlo_stats`` converter so
perf work can see where a program's device time actually goes (the HLO
cost-model estimates in compiled text are off by >10x for gathers and
relayouts on this chip — only the trace settles arguments).

Library use:
    from tools.tpu_trace import profile_call
    rows = profile_call(lambda: np.asarray(fn(x)))   # returns hlo_stats rows

CLI: profile the FLAC rice probe —
    python tools/tpu_trace.py [lanes] [codes_per_lane] [codes_per_step]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile


def profile_call(thunk, top: int = 25, keep_dir: str | None = None):
    """Run ``thunk`` under a JAX profiler trace; return hlo_stats rows
    sorted by total self time (and print the top ones)."""
    import jax

    tracedir = keep_dir or tempfile.mkdtemp(prefix="tputrace_")
    with jax.profiler.trace(tracedir):
        thunk()
    planes = sorted(glob.glob(os.path.join(tracedir, "**/*.xplane.pb"),
                              recursive=True))
    if not planes:
        raise RuntimeError(f"no xplane.pb under {tracedir}")
    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([planes[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)  # gviz table: cols + rows of {"c":[{"v":..}]}
    ids = [c["id"] for c in table["cols"]]
    rows = [{i: (cell or {}).get("v") for i, cell in zip(ids, r["c"])}
            for r in table["rows"]]
    rows.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    total = sum(float(r.get("total_self_time") or 0) for r in rows)
    print(f"[trace] {len(rows)} HLO rows, total self time {total:.1f} us")
    for r in rows[:top]:
        t = float(r.get("total_self_time") or 0)
        print(f"  {t:>10.1f} us  x{int(r.get('occurrences') or 0):>5}  "
              f"{(r.get('category') or ''):<22} "
              f"{(r.get('hlo_op_name') or '')[:70]}")
    if keep_dir is None:
        shutil.rmtree(tracedir, ignore_errors=True)
    return rows


def main() -> None:
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import flac_rice_probe as P

    P.LANES = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    P.CODES_PER_LANE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    P.CODES_PER_STEP = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rng = np.random.default_rng(0)
    truth, words = P.synth_stream(rng, P.LANES, P.CODES_PER_LANE)
    decode = P.make_decoder(P.CODES_PER_LANE)
    import jax

    dwords = jax.device_put(jnp.asarray(words))
    np.asarray(decode(dwords))  # compile + warm
    profile_call(lambda: np.asarray(decode(dwords)))


if __name__ == "__main__":
    main()
