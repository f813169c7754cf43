"""bench.py robustness contract (the r4 postmortem, VERDICT r4 #1).

The driver runs ``python bench.py`` cold and records ONE JSON line; r4
produced no measurement because a tunnel stall landed under the first
blocking fetch with nothing recorded.  These tests pin the hardened
harness's two promises on the CPU backend (structural, no chip):

  * a normal run emits exactly one parseable line whose headline value
    is a real measured throughput (> 0), with the attribution probes
    riding along;
  * a run whose deadline fires before anything could be measured exits
    non-zero WITHOUT fabricating a number on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _run(env_extra: dict, timeout: float) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({"BENCH_PLATFORM": "cpu", "BENCH_N_MP3": "0",
                "BENCH_N_WAV": "2", "BENCH_SECONDS": "1",
                "BENCH_SKIP_EXTRAS": "1"}, **env_extra)
    return subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=timeout, env=env)


@pytest.mark.slow
def test_bench_emits_measured_line():
    p = _run({"BENCH_DEADLINE_S": "240", "BENCH_MEASURE_S": "2"},
             timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, p.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "decode_throughput_mixed"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == rec["value"]
    assert rec["unit"] == "audio_sec/sec/chip"
    # the attribution preamble rides the line (r4's wedge was blind)
    assert "probe_first_fetch_s" in rec
    assert "probe_dispatch_ms" in rec


@pytest.mark.slow
def test_bench_forced_stall_is_honest():
    # deadline fires during/before warmup: either a real (slow, compile-
    # inclusive) measurement made it out, or stdout stays empty and the
    # exit code says failure — never a fabricated number.
    p = _run({"BENCH_DEADLINE_S": "6"}, timeout=120)
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    if p.returncode == 0:
        rec = json.loads(lines[0])
        assert rec["value"] > 0
    else:
        assert lines == []
        assert "no measurement completed" in p.stderr
