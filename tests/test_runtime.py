"""Runtime loop, native SPSC ring, sink, and CLI surface.

Everything renders into an in-memory/null sink — no audio hardware
(SURVEY §4: the reference's hard ALSA coupling made its tests unrunnable;
the sink abstraction here is the fix).
"""

import os
import tempfile

import numpy as np
import pytest

from audio_decoder_tpu.engine import state as ES
from audio_decoder_tpu.runtime.loop import EngineLoop, PERIOD
from audio_decoder_tpu.runtime.native import CmdRing, Sink, available


def test_spsc_ring_roundtrip():
    ring = CmdRing(8)
    assert ring.try_pop() is None
    for i in range(7):  # capacity - 1 usable, like the reference
        assert ring.try_push(f"cmd{i}")
    assert not ring.try_push("overflow")
    got = []
    while (c := ring.try_pop()) is not None:
        got.append(c)
    assert got == [f"cmd{i}" for i in range(7)]


def test_native_runtime_built():
    # the toolchain exists in this image; the native ring must be in use
    assert available()


def _loop_with_tone():
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(44100) / 44100)).astype(
        np.float32
    )[:, None]
    tracks = tone[None, :, :]
    st = ES.empty_state(tracks, [44100], [1], out_channels=1)
    reg = ES.HostRegistry(["tone"])
    sink = Sink("default", 44100, 1, capture=True, realtime=False)
    return EngineLoop(st, reg, 44100, 1, sink=sink), sink


def test_engine_loop_commands_flow_through_ring():
    loop, sink = _loop_with_tone()
    assert loop.submit("load tone")
    assert loop.submit("start -v tone")
    audio = loop.run_blocks(8, collect=True)
    assert audio.shape == (8 * PERIOD, 1)
    assert np.abs(audio).max() > 0.3
    assert loop.submit("stop -v tone")
    audio2 = loop.run_blocks(2, collect=True)
    assert np.all(audio2 == 0)
    assert len(sink.capture) == 10


def test_engine_loop_reports_bad_commands():
    loop, _ = _loop_with_tone()
    assert not loop.submit("load ghost")
    assert "ghost" in loop.errors[-1]
    assert not loop.submit("blorp")


def test_quit_sets_term_flag():
    loop, _ = _loop_with_tone()
    assert loop.submit("quit")
    assert loop.term.is_set()


def test_cli_decode_and_repl_offline():
    from audio_decoder_tpu import cli
    from .synth import make_wav

    rng = np.random.default_rng(7)
    d = tempfile.mkdtemp(prefix="cli_assets_")
    pcm = np.clip(rng.standard_normal((2048, 2)) * 8000, -32768, 32767).astype(
        np.int16
    )
    with open(os.path.join(d, "kick.wav"), "wb") as f:
        f.write(make_wav(pcm, 44100))
    rc = cli.main(["decode", "--assets", d])
    assert rc == 0

    # scripted REPL session against the offline sink
    loop, rate, ch = cli._build_engine(d, resample=False, realtime=False,
                                       device="default")
    assert rate == 44100 and ch == 2
    loop.sink.capture = []
    assert loop.submit("load kick")
    assert loop.submit("start -v kick")
    audio = loop.run_blocks(4, collect=True)
    ref = pcm[: 4 * PERIOD].astype(np.float32) / 32768.0
    np.testing.assert_allclose(audio, ref, atol=2e-4)


def test_spsc_ring_threaded_stress():
    """Producer/consumer race: no loss, no reorder, no duplication."""
    import threading

    ring = CmdRing(64)
    n = 20000
    got = []
    done = threading.Event()

    def producer():
        i = 0
        while i < n:
            if ring.try_push(str(i)):
                i += 1
        done.set()

    def consumer():
        while not (done.is_set() and len(got) >= n):
            c = ring.try_pop()
            if c is not None:
                got.append(int(c))
            if len(got) >= n:
                return

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t1.start(); t2.start()
    t1.join(timeout=30); t2.join(timeout=30)
    assert got == list(range(n))


def test_engine_checkpoint_resume_sample_exact():
    """Stop mid-performance, reload, and the audio continues bit-for-bit."""
    from audio_decoder_tpu.engine.checkpoint import load_state, save_state

    loop, _ = _loop_with_tone()
    loop.submit("load tone")
    loop.submit("start -v tone")
    loop.run_blocks(3)

    path = tempfile.mktemp(prefix="ckpt_")
    save_state(path, loop.state, loop.reg)

    ref = loop.run_blocks(4, collect=True)  # the future from the original session

    st2, reg2 = load_state(path)
    sink2 = Sink("default", 44100, 1, capture=True, realtime=False)
    loop2 = EngineLoop(st2, reg2, 44100, 1, sink=sink2)
    got = loop2.run_blocks(4, collect=True)
    np.testing.assert_array_equal(got, ref)
    # the registry round-trips: names still resolve
    assert loop2.submit("pause -v tone")


def test_apply_errors_never_kill_the_render_loop():
    """An apply-time CmdErr surfaces in loop.errors and rendering
    continues (a dead audio thread with a live REPL was the old
    failure mode)."""
    loop, _ = _loop_with_tone()
    loop.submit("load tone")
    # voice seq without any tempo → apply raises CmdErr on the render side
    assert loop.submit("seq tone -p 4 -s 0")
    audio = loop.run_blocks(3, collect=True)
    assert audio.shape == (3 * PERIOD, 1)  # still rendering
    assert any("requires a tempo" in e for e in loop.errors)
    # loop still functional
    assert loop.submit("start -v tone")
    audio = loop.run_blocks(2, collect=True)
    assert np.abs(audio).max() > 0.3


def test_queue_full_rejects_before_registry_mutation():
    """A full queue rejects the command BEFORE parse's registry side
    effects, so names never diverge from engine state."""
    loop, _ = _loop_with_tone()
    loop.submit("load tone")
    # fill the pending queue artificially
    for _ in range(250):
        loop._pending.append(None)
    assert not loop.submit("unload tone")
    assert "full" in loop.errors[-1]
    loop._pending.clear()
    # 'tone' must still be loaded/resolvable — the reject left it intact
    assert loop.submit("start -v tone")


def test_render_block_channel_contract():
    """render_block honors [frames, out_channels] even when out_channels
    exceeds the stored track channel count (last channel repeats)."""
    from audio_decoder_tpu.engine.render import render_block

    tone = (0.4 * np.sin(2 * np.pi * 220 * np.arange(4410) / 44100)).astype(
        np.float32
    )[:, None]
    st = ES.empty_state(tone[None], [4410], [1], out_channels=2)
    import dataclasses

    st = dataclasses.replace(
        st,
        v_used=st.v_used.at[0].set(True),
        v_active=st.v_active.at[0].set(True),
        v_gain=st.v_gain.at[0].set(1.0),
        v_vel=st.v_vel.at[0].set(1.0),
    )
    blk, _ = render_block(st, frames=64, out_channels=2)
    assert blk.shape == (64, 2)
    # mono fan-out: both channels identical and nonzero
    b = np.asarray(blk)
    assert np.abs(b).max() > 0.01
    np.testing.assert_array_equal(b[:, 0], b[:, 1])


def test_stream_decode_prefetch():
    """Chunked streaming decode yields the same results as one-shot."""
    import numpy as np
    from audio_decoder_tpu.codecs.registry import decode_paths
    from audio_decoder_tpu.io.stream import stream_decode
    from .synth import make_wav

    rng = np.random.default_rng(21)
    d = tempfile.mkdtemp(prefix="stream_")
    paths = []
    refs = {}
    for i in range(7):
        pcm = np.clip(rng.standard_normal((512 + 64 * i, 2)) * 8000,
                      -32768, 32767).astype(np.int16)
        p = os.path.join(d, f"t{i}.wav")
        with open(p, "wb") as f:
            f.write(make_wav(pcm, 44100))
        paths.append(p)
        refs[f"t{i}"] = pcm
    got = {}
    for chunk, batch in stream_decode(paths, files_per_batch=3):
        for j, name in enumerate(batch.names):
            got[name] = batch.file(j)
    assert set(got) == set(refs)
    for name, pcm in refs.items():
        f = got[name]
        assert f.err == 0
        np.testing.assert_array_equal(
            np.round(f.pcm * 32768.0).astype(np.int16), pcm)


def test_stream_decode_thousand_file_scan():
    """BASELINE config 5: a 1000-file asset scan decodes completely via the
    chunked streaming path — every file accounted for, correct, in order,
    with a bounded number of compiled shapes (same-size chunks reuse one
    program)."""
    import numpy as np
    from audio_decoder_tpu.io.assets import scan_assets
    from audio_decoder_tpu.io.stream import stream_decode
    from .synth import make_wav

    rng = np.random.default_rng(31)
    d = tempfile.mkdtemp(prefix="scan1k_")
    pcm = np.clip(rng.standard_normal((256, 2)) * 8000, -32768, 32767).astype(
        np.int16
    )
    blob = make_wav(pcm, 44100)
    for i in range(1000):
        with open(os.path.join(d, f"f{i:04d}.wav"), "wb") as f:
            f.write(blob)
    paths = scan_assets(d)
    assert len(paths) == 1000
    n = 0
    for chunk, batch in stream_decode(paths, files_per_batch=128):
        assert (np.asarray(batch.err) == 0).all()
        assert (np.asarray(batch.valid_frames) == 256).all()
        n += len(batch.names)
    assert n == 1000


def test_cli_inspect_navigator(monkeypatch, capsys):
    """The skiparound-style byte navigator parses syncs and moves."""
    import io
    from audio_decoder_tpu import cli
    from . import codec_refs as CR

    if not CR.have_lame():
        pytest.skip("lame unavailable")
    rng = np.random.default_rng(5)
    s = 0.3 * rng.standard_normal(4410)
    pcm = np.clip(np.stack([s, s], 1) * 30000, -32768, 32767).astype(np.int16)
    path = tempfile.mktemp(suffix=".mp3")
    with open(path, "wb") as f:
        f.write(CR.lame_encode(pcm, 44100, 128, mode=1))
    monkeypatch.setattr("sys.stdin", io.StringIO("f\nn\n+5\n-2\nq\n"))
    rc = cli.main(["inspect", path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "<sync:" in out and "128kbps" in out


def test_cli_render_script_to_wav():
    """Offline render: command script + assets → WAV, round-tripped
    through our own decoder."""
    from audio_decoder_tpu import cli
    from audio_decoder_tpu.codecs.registry import decode_paths
    from .synth import make_wav

    d = tempfile.mkdtemp(prefix="render_")
    rng = np.random.default_rng(5)
    pcm = np.clip(rng.standard_normal((4096, 2)) * 8000,
                  -32768, 32767).astype(np.int16)
    with open(os.path.join(d, "kick.wav"), "wb") as f:
        f.write(make_wav(pcm, 44100))
    script = os.path.join(d, "s.txt")
    with open(script, "w") as f:
        f.write("load kick\nstart -v kick\n@0.05\nstop -v kick\n")
    out = os.path.join(d, "out.wav")
    rc = cli.main(["render", "--assets", d, "--script", script,
                   "--seconds", "0.01", "--out", out])
    assert rc == 0
    got = decode_paths([out]).file(0)
    assert got.err == 0 and got.sample_rate == 44100
    n = min(got.pcm.shape[0], 2048)
    ref = pcm[:n].astype(np.float32) / 32768.0
    np.testing.assert_allclose(got.pcm[:n], ref, atol=2e-4)


def test_tab_completion():
    from audio_decoder_tpu.engine.state import HostRegistry
    from audio_decoder_tpu.runtime.loop import complete_line

    reg = HostRegistry(["kick", "kick2", "snare"])
    reg.voices = {"kick": 0}
    reg.groups = {"drums": 0}

    def comp(s, cur=None):
        buf = list(s)
        new, nc = complete_line(reg, buf, len(buf) if cur is None else cur)
        return "".join(new)

    assert comp("lo") == "load "           # unique verb → trailing space
    assert comp("s") == "s"                # ambiguous: start/stop/seq/snare? (verbs only)
    assert comp("st") == "st"              # start vs stop: common prefix kept
    assert comp("sta") == "start "
    assert comp("load ki") == "load kick"  # names: kick vs kick2
    assert comp("load sn") == "load snare "
    assert comp("start -") == "start -"    # flags ambiguous
    assert comp("start -v dr") == "start -v drums "
    assert comp("load zz") == "load zz"    # no candidates → unchanged


def test_engine_loop_status_snapshot():
    import numpy as np
    from audio_decoder_tpu.engine import state as ES
    from audio_decoder_tpu.runtime.loop import EngineLoop
    from audio_decoder_tpu.runtime.native import Sink

    tracks = np.zeros((1, 64, 1), np.float32)
    st = ES.empty_state(tracks, [64], [1], out_channels=1)
    reg = ES.HostRegistry(["t"])
    loop = EngineLoop(
        st, reg, 1000, 1, sink=Sink("default", 1000, 1, realtime=False)
    )
    loop.submit("load t")
    loop.submit("start -v t")
    loop.run_blocks(4)
    assert loop.status["voices"] == 1
    assert loop.status["clock_s"] > 0.4


def test_piped_eof_with_running_sequencer_exits():
    """A piped script that leaves a sequencer running and ends without
    `quit` must not hang the REPL at EOF: sequenced voices never
    auto-clear (render keeps retriggering them), so the play-out drain
    excludes them and is wall-clock bounded."""
    import io
    import time
    from audio_decoder_tpu.runtime.loop import repl

    loop, _ = _loop_with_tone()
    script = io.StringIO(
        "load tone -t s:100\nseq tone -t s:100 -p 2 -s 0,1\nstart -v tone\n"
    )
    t0 = time.monotonic()
    repl(loop, infile=script, outfile=io.StringIO(), drain_timeout=2.0)
    assert time.monotonic() - t0 < 15.0  # used to hang forever
    assert loop.term.is_set()


def test_piped_eof_drains_plain_voice_to_completion():
    """The EOF drain still lets a plain (non-sequenced) voice play out:
    the render thread keeps producing blocks until the voice deactivates."""
    import io
    from audio_decoder_tpu.runtime.loop import repl

    loop, sink = _loop_with_tone()
    script = io.StringIO("load tone\nstart -v tone\n")
    repl(loop, infile=script, outfile=io.StringIO(), drain_timeout=20.0)
    # 1 s tone at 44.1 kHz = ~345 blocks of 128; the drain must have kept
    # rendering well past the first run_blocks batch
    assert len(sink.capture) >= 345
    assert loop.status.get("draining", 1) == 0


def test_decode_trace_counters():
    from audio_decoder_tpu.utils.trace import TRACE
    from audio_decoder_tpu.codecs.registry import decode_assets
    from audio_decoder_tpu.io.assets import Asset
    from .synth import make_wav

    TRACE.reset()
    pcm = np.zeros((4410, 1), np.int16)
    batch = decode_assets(
        [Asset(path="a", name="a", ext="wav", data=make_wav(pcm, 44100))]
    )
    s = TRACE.stats["decode/wav"]
    assert s.calls == 1 and s.seconds > 0
    assert abs(s.items - 0.1) < 1e-6  # 4410 frames @ 44.1 kHz
    assert "decode/wav" in TRACE.report()


# ---------------------------------------------------------------- ALSA sink
# Device-path tests against a scriptable fake libasound (tests/alsastub.c,
# injected via BLAST_ALSA_LIB) — the xrun/zero-write/mmap paths run
# without hardware, unlike the reference whose hw:0,0 coupling made its
# tests unrunnable (SURVEY §4).


def _stub_lib():
    import ctypes as C
    import os
    import subprocess

    d = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(d, "alsastub.c")
    so = os.path.join(d, "libalsastub.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(["gcc", "-O2", "-fPIC", "-shared", src, "-o", so],
                       check=True, capture_output=True, timeout=120)
    lib = C.CDLL(so)
    lib.stub_captured_samples.restype = C.c_long
    lib.stub_read_capture.argtypes = [C.POINTER(C.c_int16), C.c_long]
    return so, lib


@pytest.fixture()
def alsa_stub(monkeypatch):
    so, lib = _stub_lib()
    monkeypatch.setenv("BLAST_ALSA_LIB", so)
    lib.stub_reset()
    yield lib


def _stub_capture(lib) -> np.ndarray:
    import ctypes as C

    n = int(lib.stub_captured_samples())
    out = np.zeros(n, np.int16)
    lib.stub_read_capture(out.ctypes.data_as(C.POINTER(C.c_int16)), n)
    return out


def test_sink_mmap_geometry_and_data(alsa_stub):
    """Auto mode selects mmap on a capable device, applies the
    reference's explicit geometry (period 128, buffer 4x, stop=boundary,
    start=avail_min=period; runtime.rs:267-315), and the committed
    samples are bit-identical to the blocks written."""
    import ctypes as C

    sink = Sink("hw:0,0", 44100, 2)
    assert sink.mode == "mmap"
    lib = alsa_stub
    assert C.c_long.in_dll(lib, "stub_hw_period").value == 128
    assert C.c_long.in_dll(lib, "stub_hw_buffer").value == 512
    assert C.c_int.in_dll(lib, "stub_hw_access").value == 0  # MMAP_INTERLEAVED
    assert C.c_int.in_dll(lib, "stub_hw_format").value == 2  # S16_LE
    boundary = C.c_ulong.in_dll(lib, "stub_boundary_value").value
    assert C.c_ulong.in_dll(lib, "stub_sw_stop").value == boundary
    assert C.c_ulong.in_dll(lib, "stub_sw_start").value == 128
    assert C.c_ulong.in_dll(lib, "stub_sw_avail").value == 128
    rng = np.random.default_rng(3)
    blocks = [rng.uniform(-0.5, 0.5, (333, 2)).astype(np.float32)
              for _ in range(5)]
    for b in blocks:
        sink.write(b)
    got = _stub_capture(lib)
    want = np.concatenate([
        np.clip(np.round(b * 32767.0), -32768, 32767).astype(np.int16)
        for b in blocks
    ]).reshape(-1)
    np.testing.assert_array_equal(got, want)
    assert C.c_int.in_dll(lib, "stub_start_calls").value >= 1
    sink.close()


def test_sink_mmap_xrun_recovery(alsa_stub):
    """-EPIPE from avail_update recovers (snd_pcm_recover + prepare,
    runtime.rs:331-339) and the write still completes with no data
    loss."""
    import ctypes as C

    sink = Sink("hw:0,0", 44100, 2)
    assert sink.mode == "mmap"
    lib = alsa_stub
    C.c_int.in_dll(lib, "stub_inject_epipe_avail").value = 2
    block = np.full((256, 2), 0.25, np.float32)
    sink.write(block)
    assert C.c_int.in_dll(lib, "stub_recover_calls").value == 2
    assert len(_stub_capture(lib)) == 256 * 2
    sink.close()


def test_sink_writei_zero_write_backoff_and_recovery(alsa_stub):
    """The writei fallback path: zero-frame accepts back off and retry;
    -EPIPE recovers; all frames land exactly once."""
    import ctypes as C

    sink = Sink("hw:0,0", 44100, 2, mode="writei")
    assert sink.mode == "writei"
    lib = alsa_stub
    C.c_int.in_dll(lib, "stub_inject_zero_writes").value = 3
    C.c_int.in_dll(lib, "stub_inject_epipe_writes").value = 1
    rng = np.random.default_rng(5)
    block = rng.uniform(-0.5, 0.5, (200, 2)).astype(np.float32)
    sink.write(block)
    assert C.c_int.in_dll(lib, "stub_recover_calls").value == 1
    got = _stub_capture(lib)
    want = np.clip(np.round(block * 32767.0), -32768, 32767).astype(
        np.int16).reshape(-1)
    np.testing.assert_array_equal(got, want)
    sink.close()


def test_sink_mode_flags(alsa_stub):
    """mode="mmap" requires mmap; mode="writei" never uses it; auto
    prefers mmap when the device supports it."""
    assert Sink("hw:0,0", 44100, 2, mode="mmap").mode == "mmap"
    assert Sink("hw:0,0", 44100, 2, mode="writei").mode == "writei"
    assert Sink("hw:0,0", 44100, 2, mode="auto").mode == "mmap"


def test_piped_eof_with_paused_group_exits_promptly():
    """A script that pauses a group and ends without `quit` must not
    stall the EOF drain: paused-group members are not sounding and never
    deactivate, so `draining` excludes them (the renderer's group mask)."""
    import io
    import time
    from audio_decoder_tpu.runtime.loop import repl

    loop, _ = _loop_with_tone()
    script = io.StringIO(
        "load tone\ngroup g -v tone\nstart -g g\npause -g g\n"
    )
    t0 = time.monotonic()
    repl(loop, infile=script, outfile=io.StringIO(), drain_timeout=25.0)
    # used to sit out the full drain timeout; now exits on the first
    # post-command snapshot
    assert time.monotonic() - t0 < 20.0


def test_speculative_lookahead_bit_identical(monkeypatch):
    """Speculative render lookahead is a pure latency optimization: with
    commands landing mid-stream (forcing speculation discards), the sunk
    audio must be bit-identical at every depth — including depth 0
    (speculation disabled), the semantics baseline."""
    from audio_decoder_tpu.runtime import loop as loop_mod

    def run(depth):
        monkeypatch.setattr(loop_mod, "SPEC_DEPTH", depth)
        loop, _ = _loop_with_tone()
        loop.submit("load tone")
        loop.submit("start -v tone")
        a = loop.run_blocks(6, collect=True)
        # mid-stream command: every speculated block beyond the next sunk
        # one must be discarded, or the velocity change lands D blocks late
        assert loop.submit("velocity tone 2.0")
        b = loop.run_blocks(6, collect=True)
        loop.submit("stop -v tone")
        c = loop.run_blocks(3, collect=True)
        return np.concatenate([a, b, c])

    base = run(0)
    assert np.abs(base).max() > 0.3
    for depth in (1, 4):
        assert np.array_equal(run(depth), base), f"depth {depth} diverged"


def test_speculative_lookahead_command_latency(monkeypatch):
    """A command submitted while the lookahead is full still takes effect
    on the very next sunk block (not SPEC_DEPTH blocks later): the tone
    must go silent on the first block after `stop`."""
    from audio_decoder_tpu.runtime import loop as loop_mod

    monkeypatch.setattr(loop_mod, "SPEC_DEPTH", 4)
    loop, _ = _loop_with_tone()
    loop.submit("load tone")
    loop.submit("start -v tone")
    a = loop.run_blocks(4, collect=True)  # ramp 1→2→4: 3 blocks ahead now
    assert np.abs(a[-PERIOD:]).max() > 0.3
    assert loop._spec, "lookahead empty — the discard path would not run"
    loop.submit("stop -v tone")
    b = loop.run_blocks(1, collect=True)
    assert np.all(b == 0)


def test_speculative_lookahead_ramp_bounds_discards(monkeypatch):
    """Command-dense input (one command per sunk block — the workload
    speculation cannot help) must not render SPEC_DEPTH-and-discard
    every iteration: the burst depth resets to 1 on each command, so
    the render count stays ~1 per sunk block, while idle streaks still
    ramp back up to full depth."""
    from audio_decoder_tpu.runtime import loop as loop_mod

    calls = {"n": 0}
    real = loop_mod.render_block

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(loop_mod, "render_block", counting)
    monkeypatch.setattr(loop_mod, "SPEC_DEPTH", 8)
    loop, _ = _loop_with_tone()
    loop.submit("load tone")
    loop.submit("start -v tone")
    loop.run_blocks(1)
    calls["n"] = 0
    for v in (0.5, 1.5, 0.75, 1.25, 1.0, 0.9, 1.1, 0.8):
        loop.submit(f"velocity tone {v}")
        loop.run_blocks(1)
    # one render per sunk block (ramp reset each time), not 8
    assert calls["n"] == 8, calls
    # idle streak ramps 1,2,4,8,8... -> 16 blocks cost 5 refills
    calls["n"] = 0
    loop.run_blocks(16)
    assert calls["n"] <= 1 + 2 + 4 + 8 + 8, calls


def test_speculative_lookahead_fuzz_equivalence(monkeypatch):
    """Randomized command streams (start/stop/velocity/seq/trem/group/
    tempo, interleaved with render batches of random length) produce
    bit-identical audio at depth 0 and depth 8 — covers the
    RNG-dependent paths (seq chance + jitter, trem) where a
    mis-continued speculation chain would fork the threefry stream."""
    import random
    from audio_decoder_tpu.runtime import loop as loop_mod

    rng = random.Random(0xB1A57)
    cmds = ["load tone", "start -v tone", "tc t s:40",
            "seq tone -t s:40 -p 4 -s 0,2 -c a:0.7 -j a:0.5",
            "trem tone -t s:40 -d 0.8", "velocity tone -1.5",
            "velocity tone 1.0", "group g -v tone", "pause -g g",
            "resume -g g", "stop -v tone", "start -v tone"]
    script = [(rng.choice(cmds), rng.randint(1, 5)) for _ in range(40)]

    def run(depth):
        monkeypatch.setattr(loop_mod, "SPEC_DEPTH", depth)
        loop, _ = _loop_with_tone()
        chunks = []
        for cmd, n in script:
            loop.submit(cmd)
            chunks.append(loop.run_blocks(n, collect=True))
        return np.concatenate(chunks)

    base = run(0)
    assert np.abs(base).max() > 0  # something actually sounded
    assert np.array_equal(run(8), base)
