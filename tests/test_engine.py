"""Engine: command grammar, block renderer, voices/groups/tempo/seq.

Renders into an in-memory sink — the reference's own tests were
unrunnable precisely because its engine is welded to ALSA `hw:0,0`
(SURVEY §4); here the renderer is a pure jitted function.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_decoder_tpu.engine import commands as EC
from audio_decoder_tpu.engine import state as ES
from audio_decoder_tpu.engine.render import render_block, render_seconds

RATE = 1000  # tiny fake rate keeps tests fast


def _engine(track_arrays):
    """track_arrays: dict name -> [S, C] f32."""
    names = list(track_arrays)
    S = max(a.shape[0] for a in track_arrays.values())
    C = max(a.shape[1] for a in track_arrays.values())
    tracks = np.zeros((len(names), S, C), np.float32)
    lens, chs = [], []
    for i, n in enumerate(names):
        a = track_arrays[n]
        tracks[i, : a.shape[0], : a.shape[1]] = a
        lens.append(a.shape[0])
        chs.append(a.shape[1])
    st = ES.empty_state(tracks, lens, chs, out_channels=C)
    reg = ES.HostRegistry(names)
    proc = EC.CmdProcessor(reg, RATE)
    return st, reg, proc


def _run(st, reg, proc, lines):
    for line in lines:
        cmd = proc.parse(line)
        st = EC.apply(st, reg, cmd)
    return st


def test_load_start_renders_track():
    ramp = np.linspace(0.0, 0.5, 256, dtype=np.float32)[:, None]
    st, reg, proc = _engine({"ramp": ramp})
    st = _run(st, reg, proc, ["load ramp", "start -v ramp"])
    block, st = render_block(st, frames=128, out_channels=1)
    np.testing.assert_allclose(np.asarray(block)[:, 0], ramp[:128, 0], atol=1e-6)
    block2, st = render_block(st, frames=128, out_channels=1)
    np.testing.assert_allclose(np.asarray(block2)[:, 0], ramp[128:, 0], atol=1e-6)
    # ran off the end -> silent + deactivated
    block3, st = render_block(st, frames=128, out_channels=1)
    assert np.all(np.asarray(block3) == 0)


def test_pause_resume_stop():
    ramp = np.arange(512, dtype=np.float32)[:, None] / 1024.0
    st, reg, proc = _engine({"r": ramp})
    st = _run(st, reg, proc, ["load r", "start -v r"])
    b1, st = render_block(st, frames=64, out_channels=1)
    st = _run(st, reg, proc, ["pause -v r"])
    b2, st = render_block(st, frames=64, out_channels=1)
    assert np.all(np.asarray(b2) == 0)
    st = _run(st, reg, proc, ["resume -v r"])
    b3, st = render_block(st, frames=64, out_channels=1)
    # resumes where it paused (position held at 64 + 64 paused frames? no —
    # paused voices do not advance)
    assert np.asarray(b3)[0, 0] == pytest.approx(64 / 1024.0, abs=1e-6)
    st = _run(st, reg, proc, ["stop -v r"])
    b4, st = render_block(st, frames=64, out_channels=1)
    assert np.all(np.asarray(b4) == 0)


def test_velocity_reverse_play():
    ramp = np.arange(256, dtype=np.float32)[:, None] / 512.0
    st, reg, proc = _engine({"r": ramp})
    st = _run(st, reg, proc, ["load r", "velocity r -1.0", "start -v r"])
    block, st = render_block(st, frames=64, out_channels=1)
    got = np.asarray(block)[:, 0]
    want = ramp[255:191:-1, 0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fractional_velocity_interpolates():
    ramp = np.arange(64, dtype=np.float32)[:, None] / 64.0
    st, reg, proc = _engine({"r": ramp})
    st = _run(st, reg, proc, ["load r", "velocity r 0.5", "start -v r"])
    block, st = render_block(st, frames=32, out_channels=1)
    got = np.asarray(block)[:, 0]
    want = (np.arange(32) * 0.5) / 64.0  # linear interp of a ramp is exact
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mono_fanout_to_stereo():
    mono = np.full((128, 1), 0.25, np.float32)
    stereo = np.zeros((128, 2), np.float32)
    st, reg, proc = _engine({"m": mono, "s": stereo})
    st = _run(st, reg, proc, ["load m", "start -v m"])
    block, st = render_block(st, frames=32, out_channels=2)
    assert np.allclose(np.asarray(block), 0.25)


def test_mix_clamps():
    loud = np.full((128, 1), 0.9, np.float32)
    st, reg, proc = _engine({"a": loud, "b": loud.copy()})
    st = _run(st, reg, proc, ["load a", "load b", "start -v a", "start -v b"])
    block, st = render_block(st, frames=16, out_channels=1)
    assert np.all(np.asarray(block) <= 1.0)  # 1.8 clamps to 1.0


def test_seq_retriggers_on_tempo_grid():
    decay = np.zeros((1000, 1), np.float32)
    decay[0] = 1.0  # click at trigger
    st, reg, proc = _engine({"click": decay})
    st = _run(st, reg, proc, [
        "load click -t s:100",          # own tempo: every 100 samples
        "seq click -p 4 -s 0,2",        # steps 0 and 2 of a 4-step cycle
        "start -v click",
    ])
    audio, st = render_seconds(st, 1.0, RATE, 1, block=128)
    clicks = np.nonzero(audio[:, 0] >= 0.99)[0]
    # triggers at step numbers 0,2,4,6,... x interval -> samples 0,200,400,...
    assert list(clicks[:4]) == [0, 200, 400, 600]


def test_seq_chance_zero_never_triggers():
    decay = np.zeros((1000, 1), np.float32)
    decay[0] = 1.0
    st, reg, proc = _engine({"click": decay})
    st = _run(st, reg, proc, [
        "load click -t s:50",
        "seq click -p 2 -s 0,1 -c a:0.0",
        "start -v click",
    ])
    audio, st = render_seconds(st, 0.5, RATE, 1, block=128)
    assert np.count_nonzero(audio[:, 0] >= 0.99) <= 1  # only the start click


def test_group_transport_cascades():
    a = np.full((64, 1), 0.1, np.float32)
    b = np.full((64, 1), 0.2, np.float32)
    st, reg, proc = _engine({"a": a, "b": b})
    st = _run(st, reg, proc, [
        "load a", "load b",
        "group duo -v a,b",
        "start -g duo",
    ])
    block, st = render_block(st, frames=16, out_channels=1)
    assert np.allclose(np.asarray(block), 0.3, atol=1e-6)
    st = _run(st, reg, proc, ["stop -g duo"])
    block, st = render_block(st, frames=16, out_channels=1)
    assert np.all(np.asarray(block) == 0)


def test_unload_frees_name_and_silences():
    a = np.full((64, 1), 0.5, np.float32)
    st, reg, proc = _engine({"a": a})
    st = _run(st, reg, proc, ["load a", "start -v a", "unload a"])
    block, st = render_block(st, frames=16, out_channels=1)
    assert np.all(np.asarray(block) == 0)
    st = _run(st, reg, proc, ["load a"])  # name reusable after unload


def test_parser_errors():
    st, reg, proc = _engine({"a": np.zeros((8, 1), np.float32)})
    for bad in [
        "blorp", "load nope", "start -v ghost", "velocity a",
        "seq a -p 4", "group g1", "tc t1 x:10",
    ]:
        with pytest.raises(EC.CmdErr):
            cmd = proc.parse(bad)
    # duplicate load rejected (≙ main.rs:82-88 duplicate-name skip)
    proc.parse("load a")
    with pytest.raises(EC.CmdErr):
        proc.parse("load a")
    # duplicate group/tc names are CmdErr, not a raw registry KeyError
    # (submit() only catches CmdErr — anything else kills the REPL)
    proc.parse("group g1 -v a")
    with pytest.raises(EC.CmdErr):
        proc.parse("group g1 -v a")
    proc.parse("tc t1 s:100")
    with pytest.raises(EC.CmdErr):
        proc.parse("tc t1 s:100")
    with pytest.raises(EC.CmdErr):
        proc.parse("tc t2 s:nope")
    # non-finite and non-integer selectors are CmdErr too, not
    # ValueError/OverflowError leaking through submit()
    for bad in [
        "tc t2 s:inf", "tc t2 m:nan", "tc t2 b:inf",
        "seq a -p 4 -s 0,2 -c x:0.5", "seq a -p 4 -s 0,2 -c 1-z:0.5",
        "seq a -t s:100 -p 4 -s 0,2 -j y:0.5",
    ]:
        with pytest.raises(EC.CmdErr):
            proc.parse(bad)
    # an absurd selector range must not spin the parse thread: the
    # -s list is iterated, never the user-typed range
    cmd = proc.parse("seq a -t s:100 -p 4 -s 0,2 -c 0-99999999999:1.0")
    assert cmd.verb == "seq"


def test_tempo_units():
    assert EC.convert_interval("s", 441, 44100) == 441
    assert EC.convert_interval("m", 500, 44100) == 22050
    assert EC.convert_interval("b", 120, 44100) == 22050
    with pytest.raises(EC.CmdErr):
        EC.convert_interval("x", 1, 44100)


def test_group_sequencer_retriggers_members_together():
    """A group-level seq (≙ Group's Process chain, engine.rs:451-543)
    drives all member voices on the group tempo with a SHARED chance roll."""
    click_a = np.zeros((1000, 1), np.float32)
    click_a[0] = 0.5
    click_b = np.zeros((1000, 1), np.float32)
    click_b[0] = 0.25
    st, reg, proc = _engine({"a": click_a, "b": click_b})
    st = _run(st, reg, proc, [
        "load a", "load b",
        "group duo -v a,b",
        "seq duo -t s:100 -p 2 -s 0,1 -c a:0.5",  # coin-flip per step
        "start -g duo",
    ])
    audio, st = render_seconds(st, 2.0, RATE, 1, block=128)
    # triggers land only on the 100-sample grid, and when they land BOTH
    # voices fire together (shared roll): amplitude is 0.75, never 0.5/0.25
    hits = np.nonzero(audio[:, 0] > 0.1)[0]
    assert len(hits) > 2
    assert all(h % 100 == 0 for h in hits)
    vals = {round(float(audio[h, 0]), 3) for h in hits}
    assert vals == {0.75}, vals
    # chance 0.5 actually skips some steps
    assert len(hits) < 2.0 * RATE / 100


def test_group_seq_requires_group_tempo():
    a = np.zeros((64, 1), np.float32)
    st, reg, proc = _engine({"a": a})
    st = _run(st, reg, proc, ["load a", "group g1 -v a"])
    with pytest.raises(EC.CmdErr):
        EC.apply(st, reg, proc.parse("seq g1 -p 2 -s 0"))


def test_seq_jitter_delays_triggers_within_step():
    decay = np.zeros((1000, 1), np.float32)
    decay[0] = 1.0  # click at trigger
    st, reg, proc = _engine({"click": decay})
    st = _run(st, reg, proc, [
        "load click -t s:100",
        "seq click -p 2 -s 0,1 -j a:1.0",   # full-interval jitter, all steps
        "start -v click",
    ])
    audio, st = render_seconds(st, 1.0, RATE, 1, block=128)
    clicks = np.nonzero(audio[:, 0] >= 0.99)[0]
    # drop the plain `start` playback click at frame 0 (not a trigger)
    trig = [int(c) for c in clicks if c > 0]
    # at most one trigger per 100-sample step window, delayed inside it
    assert len(trig) >= 8
    windows = [c // 100 for c in trig]
    assert len(set(windows)) == len(windows)
    # and it actually jitters: not every trigger on the nominal boundary
    assert any(c % 100 != 0 for c in trig)


def test_seq_jitter_zero_matches_unjittered_grid():
    decay = np.zeros((1000, 1), np.float32)
    decay[0] = 1.0
    st, reg, proc = _engine({"click": decay})
    st = _run(st, reg, proc, [
        "load click -t s:100",
        "seq click -p 4 -s 0,2 -j a:0.0",
        "start -v click",
    ])
    audio, st = render_seconds(st, 1.0, RATE, 1, block=128)
    clicks = np.nonzero(audio[:, 0] >= 0.99)[0]
    assert list(clicks[:4]) == [0, 200, 400, 600]


def test_seq_jitter_stable_across_block_sizes():
    # the jitter hash is keyed by absolute step number, so the rendered
    # audio must be identical whether the stretch renders as 128- or
    # 64-frame blocks (a delayed trigger may cross a block edge)
    decay = np.zeros((1000, 1), np.float32)
    decay[:4] = [[1.0], [0.7], [0.4], [0.2]]
    cmds = [
        "load click -t s:64",
        "seq click -p 2 -s 0,1 -j a:0.9",
        "start -v click",
    ]
    outs = []
    for block in (128, 64):
        st, reg, proc = _engine({"click": decay})
        st = _run(st, reg, proc, cmds)
        audio, st = render_seconds(st, 1.0, RATE, 1, block=block)
        outs.append(audio)
    n = min(len(outs[0]), len(outs[1]))  # whole blocks only: 896 vs 960
    assert np.array_equal(outs[0][:n], outs[1][:n])


def test_trem_modulates_gain_on_tempo_grid():
    """PROC_TREM: a tempo-synced raised-cosine gain LFO — unity at the
    lane's phase 0, dipping to 1-depth mid-cycle (the second process
    kind on the chain axis of processes.rs:12-50)."""
    const = np.full((4000, 1), 0.5, np.float32)
    st, reg, proc = _engine({"c": const})
    # interval 100 samples, LFO period 4 steps -> 400-sample cycle
    st = _run(st, reg, proc, [
        "load c -t s:100",
        "trem c -p 4 -d 0.8",
        "start -v c",
    ])
    audio, st = render_seconds(st, 2.0, RATE, 1, block=128)
    a = audio[:, 0]
    # phase 0: unity gain
    assert abs(a[0] - 0.5) < 1e-5
    # mid-cycle (200 samples in): gain dips to 1-depth = 0.2
    assert abs(a[200] - 0.5 * 0.2) < 1e-3
    # full cycle (400): back to unity
    assert abs(a[400] - 0.5) < 1e-3
    # periodicity
    np.testing.assert_allclose(a[:400], a[400:800], atol=1e-4)


def test_seq_and_trem_together_on_one_voice():
    """Two process kinds active on ONE voice: the sequencer retriggers
    clicks on the tempo grid while the tremolo scales their gain — the
    chain evaluates every slot (processes.rs:69's per-process walk)."""
    click = np.zeros((1000, 1), np.float32)
    click[0] = 1.0
    st, reg, proc = _engine({"k": click})
    st = _run(st, reg, proc, [
        "load k -t s:100",
        "seq k -p 1 -s 0",          # every 100-sample step
        "trem k -p 4 -d 1.0",       # 400-sample LFO, full depth
        "start -v k",
    ])
    import numpy as _np
    kinds = _np.asarray(st.p_kind[int(reg.voices["k"])])
    assert sorted(k for k in kinds if k) == [ES.PROC_SEQ, ES.PROC_TREM]
    audio, st = render_seconds(st, 1.2, RATE, 1, block=128)
    hits = np.nonzero(np.abs(audio[:, 0]) > 1e-6)[0]
    # clicks still land on the 100-sample sequencer grid (the mid-cycle
    # clicks vanish entirely: full-depth trem dips them to exactly 0)
    assert len(hits) >= 9 and all(h % 100 == 0 for h in hits)
    vals = audio[hits, 0]
    # trem scales each click by the LFO: step 0 -> 1.0, step 2 (mid) -> 0.0
    assert abs(vals[0] - 1.0) < 1e-3
    assert abs(audio[200, 0]) < 1e-3  # mid-cycle click fully dipped
    assert abs(audio[400, 0] - 1.0) < 1e-3  # next cycle back to unity


def test_proc_slot_reuse_and_exhaustion():
    """Re-issuing `seq` reconfigures the existing SEQ slot; exhausting
    MAX_PROCS distinct kinds errors cleanly."""
    click = np.zeros((100, 1), np.float32)
    st, reg, proc = _engine({"k": click})
    st = _run(st, reg, proc, ["load k -t s:50", "seq k -p 2 -s 0"])
    v = reg.voices["k"]
    st2 = _run(st, reg, proc, ["seq k -p 4 -s 1"])  # reuse, not new slot
    kinds = np.asarray(st2.p_kind[v])
    assert (kinds == ES.PROC_SEQ).sum() == 1
    assert int(st2.p_period[v, 0]) == 4
    # fill every slot: 1 seq + 3 trems... trem also reuses its own slot,
    # so force exhaustion by hand-filling the chain
    import dataclasses
    full = dataclasses.replace(
        st, p_kind=st.p_kind.at[v].set(
            jnp.full((ES.MAX_PROCS,), ES.PROC_TREM, jnp.int32))
    )
    with pytest.raises(EC.CmdErr, match="free process slot"):
        EC.apply(full, reg, proc.parse("seq k -p 2 -s 0"))


def test_checkpoint_v1_migrates_to_process_chains(tmp_path):
    """A version-1 checkpoint (single s_* sequencer arrays) loads via the
    migration chain: the sequencer lands in slot 0 as PROC_SEQ."""
    import json
    from audio_decoder_tpu.engine import checkpoint as CK

    click = np.zeros((200, 1), np.float32)
    st, reg, proc = _engine({"k": click})
    st = _run(st, reg, proc, ["load k -t s:100", "seq k -p 2 -s 0,1 -c a:0.5"])
    path = str(tmp_path / "ck")
    CK.save_state(path, st, reg)
    # rewrite as a v1 checkpoint: p_* -> s_* slot-0 views
    z = dict(np.load(path + ".npz"))
    v1 = {k: v for k, v in z.items() if not k.startswith("p_")}
    v1["s_on"] = (z["p_kind"][:, 0] == ES.PROC_SEQ)
    v1["s_period"] = z["p_period"][:, 0]
    v1["s_stepmask"] = z["p_stepmask"][:, 0]
    v1["s_chance"] = z["p_chance"][:, 0]
    v1["s_jitter"] = z["p_jitter"][:, 0]
    np.savez_compressed(path + ".npz", **v1)
    meta = json.load(open(path + ".json"))
    meta["version"] = 1
    json.dump(meta, open(path + ".json", "w"))

    st2, reg2 = CK.load_state(path)
    np.testing.assert_array_equal(np.asarray(st2.p_kind), np.asarray(st.p_kind))
    np.testing.assert_array_equal(np.asarray(st2.p_chance),
                                  np.asarray(st.p_chance))
    assert reg2.voices == reg.voices


def test_checkpoint_v1_without_jitter_field(tmp_path):
    """The v1 mid-version default (s_jitter) still applies through the
    general defaulting rule before migration."""
    import json
    from audio_decoder_tpu.engine import checkpoint as CK

    click = np.zeros((200, 1), np.float32)
    st, reg, proc = _engine({"k": click})
    st = _run(st, reg, proc, ["load k -t s:100", "seq k -p 2 -s 0"])
    path = str(tmp_path / "ck")
    CK.save_state(path, st, reg)
    z = dict(np.load(path + ".npz"))
    v1 = {k: v for k, v in z.items() if not k.startswith("p_")}
    v1["s_on"] = (z["p_kind"][:, 0] == ES.PROC_SEQ)
    v1["s_period"] = z["p_period"][:, 0]
    v1["s_stepmask"] = z["p_stepmask"][:, 0]
    v1["s_chance"] = z["p_chance"][:, 0]
    np.savez_compressed(path + ".npz", **v1)  # NO s_jitter
    meta = json.load(open(path + ".json"))
    meta["version"] = 1
    json.dump(meta, open(path + ".json", "w"))
    st2, _ = CK.load_state(path)
    assert not np.asarray(st2.p_jitter).any()
    np.testing.assert_array_equal(np.asarray(st2.p_kind), np.asarray(st.p_kind))


def test_checkpoint_stripped_optional_fields_load(tmp_path):
    """Every optional (defaultable) field can be missing from the npz and
    the checkpoint still loads with its documented default — the general
    version-keyed rule, not a per-field special case."""
    from audio_decoder_tpu.engine import checkpoint as CK

    click = np.zeros((200, 1), np.float32)
    st, reg, proc = _engine({"k": click})
    st = _run(st, reg, proc, ["load k"])
    path = str(tmp_path / "ck")
    CK.save_state(path, st, reg)
    z = dict(np.load(path + ".npz"))
    for name in ("p_kind", "p_period", "p_stepmask", "p_chance",
                 "p_jitter", "p_depth"):
        z.pop(name)
    np.savez_compressed(path + ".npz", **z)
    st2, _ = CK.load_state(path)
    assert not np.asarray(st2.p_kind).any()
    assert np.asarray(st2.p_period).shape == (ES.MAX_VOICES, ES.MAX_PROCS)


def test_render_four_channel_tracks():
    """Tracks with more than 2 channels render via the element-gather
    branch (the 8-wide row window only fits 2C <= 4); review finding:
    a 4-channel WAV used to crash render_block."""
    rng = np.random.default_rng(9)
    quad = (rng.standard_normal((512, 4)) * 0.1).astype(np.float32)
    st, reg, proc = _engine({"q": quad})
    st = _run(st, reg, proc, ["load q", "start -v q"])
    block, st = render_block(st, frames=128, out_channels=4)
    b = np.asarray(block)
    assert b.shape == (128, 4)
    np.testing.assert_allclose(b, quad[:128], atol=1e-6)


def test_seq_and_trem_malformed_numbers_raise_cmderr():
    """Malformed -p/-s values surface as CmdErr (the REPL catches those),
    not ValueError (which would kill the session)."""
    click = np.zeros((100, 1), np.float32)
    st, reg, proc = _engine({"k": click})
    st = _run(st, reg, proc, ["load k -t s:50"])
    for bad in ("seq k -p abc -s 0", "seq k -p 1.5 -s 0",
                "seq k -p 4 -s 0,x", "trem k -p abc -d 0.5",
                "trem k -p 4 -d oops"):
        with pytest.raises(EC.CmdErr):
            proc.parse(bad)


def test_env_decay_envelope_and_three_kind_chain(rng):
    """The env process (third kind): per-cycle exponential decay gated
    by the tempo, exact against the closed form; and a voice running
    seq + trem + env simultaneously exercises three enum-dispatched
    slots of the process chain (the reference's processes! axis holds
    ONE kind, processes.rs:52-99)."""
    import numpy as np

    from audio_decoder_tpu.engine import commands as EC
    from audio_decoder_tpu.engine import render as ER
    from audio_decoder_tpu.engine import state as ES

    tracks = np.ones((1, 2048, 1), np.float32) * 0.5
    st = ES.empty_state(tracks, [2048], [1], out_channels=1)
    reg = ES.HostRegistry(["t"])
    proc = EC.CmdProcessor(reg, 44100)
    # interval 64 samples, env cycles over 4 steps = 256 frames
    for line in ["load t -t s:64", "env t -p 4 -d 0.75", "start -v t"]:
        st = EC.apply(st, reg, proc.parse(line))
    block, st2 = ER.render_block(st, frames=512, out_channels=1)
    got = np.asarray(block)[:, 0]
    k = np.arange(512)
    ph = (k % 256) / 256.0
    expect = 0.5 * (0.25 + 0.75 * np.exp(np.float32(-6.9077554) * ph))
    # the envelope multiplies the constant 0.5 track exactly
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # cycle restart: frame 256 back at (near) unity
    assert got[256] == got[0]

    # three kinds on one voice: seq retriggers, trem + env shape gain
    st = ES.empty_state(tracks, [2048], [1], out_channels=1)
    reg = ES.HostRegistry(["t"])
    proc = EC.CmdProcessor(reg, 44100)
    for line in ["load t -t s:64", "seq t -p 4 -s 0,2",
                 "trem t -p 8 -d 0.5", "env t -p 2 -d 0.9",
                 "start -v t"]:
        st = EC.apply(st, reg, proc.parse(line))
    kinds = sorted(int(x) for x in np.asarray(st.p_kind[0]) if x)
    assert kinds == [ES.PROC_SEQ, ES.PROC_TREM, ES.PROC_ENV]
    block, _ = ER.render_block(st, frames=256, out_channels=1)
    b = np.asarray(block)[:, 0]
    assert np.abs(b).max() > 0.01  # audible
    # trem*env modulation present: gain at frame 1 differs from frame 65
    assert not np.isclose(b[1] / 0.5, b[65] / 0.5)


def test_env_reissue_reconfigures_same_slot(rng):
    import numpy as np

    from audio_decoder_tpu.engine import commands as EC
    from audio_decoder_tpu.engine import state as ES

    tracks = np.ones((1, 256, 1), np.float32)
    st = ES.empty_state(tracks, [256], [1], out_channels=1)
    reg = ES.HostRegistry(["t"])
    proc = EC.CmdProcessor(reg, 44100)
    st = EC.apply(st, reg, proc.parse("load t -t s:32"))
    st = EC.apply(st, reg, proc.parse("env t -p 2 -d 0.5"))
    st = EC.apply(st, reg, proc.parse("env t -p 6 -d 0.9"))
    kinds = np.asarray(st.p_kind[0])
    assert (kinds == ES.PROC_ENV).sum() == 1  # reconfigured, not stacked
    slot = int(np.nonzero(kinds == ES.PROC_ENV)[0][0])
    assert int(st.p_period[0, slot]) == 6
    assert float(st.p_depth[0, slot]) == pytest.approx(0.9)


def test_render_chain_bit_identical_to_sequential(rng):
    """render_chain (one lax.scan dispatch for D blocks — the playback
    loop's burst refill) must be BIT-identical to D sequential
    render_block calls, and its (v_active, v_pos, clock) outputs must
    fully reconstruct every intermediate state: rendering advances only
    those three fields (render_block's st2 contract — this test is the
    tripwire if that ever changes)."""
    import dataclasses

    from audio_decoder_tpu.engine import state as ES
    from audio_decoder_tpu.engine import render as ER

    tracks = (rng.standard_normal((3, 4096, 2)) * 0.2).astype(np.float32)
    st = ES.empty_state(tracks, [4096, 3000, 4096], [2, 2, 2],
                        out_channels=2)
    reg = ES.HostRegistry(["a", "b", "c"])
    proc = EC.CmdProcessor(reg, 44100)
    for line in ["load a -t s:64", "seq a -p 4 -s 0,2 -c a:0.7 -j a:0.5",
                 "load b -t s:80", "velocity b -0.8", "trem b -p 8 -d 0.4",
                 "load c -t s:96", "env c -p 4 -d 0.6",
                 "start -v a", "start -v b", "start -v c"]:
        st = EC.apply(st, reg, proc.parse(line))

    D, F = 6, 128
    seq_blocks, seq_states = [], []
    cur = st
    for _ in range(D):
        blk, cur = ER.render_block(cur, frames=F, out_channels=2)
        seq_blocks.append(np.asarray(blk))
        seq_states.append(cur)

    blks, acts, poss, clocks = ER.render_chain(
        st, frames=F, out_channels=2, depth=D)
    np.testing.assert_array_equal(np.asarray(blks),
                                  np.stack(seq_blocks))
    for i in range(D):
        rec = dataclasses.replace(st, v_active=acts[i], v_pos=poss[i],
                                  clock=clocks[i])
        for f in dataclasses.fields(ES.EngineArrays):
            if f.metadata.get("static"):
                continue
            np.testing.assert_array_equal(
                np.asarray(getattr(rec, f.name)),
                np.asarray(getattr(seq_states[i], f.name)),
                err_msg=f"block {i}: {f.name}")
        # and the reconstructed state continues identically
        nb, _ = ER.render_block(rec, frames=F, out_channels=2)
        want = (seq_blocks[i + 1] if i + 1 < D
                else np.asarray(ER.render_block(
                    seq_states[-1], frames=F, out_channels=2)[0]))
        np.testing.assert_array_equal(np.asarray(nb), want)
