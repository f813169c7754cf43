import time, functools, numpy as np
import jax, jax.numpy as jnp
from jax import lax
from audio_decoder_tpu.codecs.flac import frontend, decoder
from audio_decoder_tpu.codecs.flac import device as D
from audio_decoder_tpu.codecs.flac.encode import encode_flac

rate, seconds, n = 44100, 30, 16
frames = rate * seconds
rng = np.random.default_rng(7)
t = np.arange(frames) / rate
m = np.zeros(frames)
for f0, a in ((110.0, 0.35), (220.5, 0.2), (331.1, 0.12)):
    m += a * np.sin(2 * np.pi * f0 * t) * np.exp(-0.2 * t)
m += 0.002 * rng.standard_normal(frames)
mus = np.clip(np.stack([m, 0.8 * m], 1) * 20000, -32768, 32767).astype(np.float32) / 2.0 ** 15
blob = encode_flac(mus, rate, bits=16)
analyses = [frontend.analyze(blob) for _ in range(n)]
args, statics = decoder.pack_group(analyses)
for a in args: a.block_until_ready()

channels, nmax, smax = statics["channels"], statics["nmax"], statics["smax"]
rice_steps, fw_imax = statics["rice_steps"], statics["fw_imax"]

def body(stage, *a):
    (bytes_u8, file_bits,
     rl_file, rl_sub, rl_bitpos, rl_count, rl_param, rl_dest,
     fw_file, fw_sub, fw_bitpos, fw_count, fw_width, fw_dest,
     dv_sub, dv_dest, dv_val,
     sub_kind, sub_order, sub_shift, sub_wasted, sub_coeffs,
     fr_file, fr_start, fr_n, fr_mode, fr_scale) = a
    words = D._be_words(bytes_u8)
    rows8 = D._overlap_rows(words)
    limit = jnp.minimum(file_bits, words.shape[1] * 32 - D.K_MAX - 256)
    Ls = sub_kind.shape[0]
    F = fr_file.shape[0]
    vals_flat = jnp.zeros((Ls * (nmax + 1),), jnp.int32)
    oob = np.int32(2**31 - 256)
    fwv = D._fixed_width(rows8, fw_file, fw_bitpos, fw_width, limit[fw_file], fw_imax)
    fi = jnp.arange(fw_imax, dtype=jnp.int32)[None, :]
    fvalid = fi < fw_count[:, None]
    fdst = jnp.where(fvalid, fw_sub[:, None] * (nmax + 1) + fw_dest[:, None] + fi, oob)
    rv, ovf_l = D._rice_scan(rows8, rl_file, rl_bitpos, rl_count, rl_param,
                             limit[rl_file], rice_steps)
    if stage == "scan":
        return rv.sum() + fwv.sum()
    ri = jnp.arange(rice_steps * D.K_CODES, dtype=jnp.int32)[None, :]
    rvalid = ri < rl_count[:, None]
    rdst = jnp.where(rvalid, rl_sub[:, None] * (nmax + 1) + rl_dest[:, None] + ri, oob)
    vals_flat = vals_flat.at[jnp.concatenate([
        fdst.reshape(-1), rdst.reshape(-1), dv_sub * (nmax + 1) + dv_dest])].set(
        jnp.concatenate([
            jnp.where(fvalid, fwv, 0).reshape(-1),
            jnp.where(rvalid, rv, 0).reshape(-1), dv_val]),
        mode="drop", unique_indices=True)
    vals = vals_flat.reshape(Ls, nmax + 1)[:, :nmax]
    if stage == "vals":
        return vals.sum()
    s = D._predict(vals, sub_kind, sub_order, sub_shift, sub_wasted, sub_coeffs, nmax)
    if stage == "predict":
        return s.sum()
    sub_pcm = D._stereo(s.reshape(F, channels, nmax), fr_mode, channels)
    pcm_f = sub_pcm.astype(jnp.float32) * fr_scale[:, None, None]
    out = jnp.zeros((B_out := bytes_u8.shape[0]) * smax * channels, jnp.float32)
    si = jnp.arange(nmax, dtype=jnp.int32)[None, :]
    svalid = si < fr_n[:, None]
    base = fr_file * (smax * channels)
    didx = (base[:, None] + (fr_start[:, None] + si) * channels)
    didx = jnp.where(svalid, didx, oob)
    didx3 = didx[:, None, :] + jnp.arange(channels, dtype=jnp.int32)[None, :, None]
    out = out.at[didx3.reshape(-1)].set(pcm_f.reshape(-1), mode="drop", unique_indices=True)
    return out.sum()

for stage in ("scan", "vals", "predict", "full"):
    fn = jax.jit(functools.partial(body, stage))
    r = fn(*args); r.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{stage:8s}: {best*1000:.0f} ms")
