"""Sub-stage TPU timing inside d4c_requiem and cheaptrick on the fixture."""
import numpy as np
from scipy.io import wavfile

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def timed(fn, *args, label=""):
    from tools.axon_timing import device_time
    per_call, out = device_time(fn, *args, k=8, label=label, verbose=True)
    return out


def main():
    from world_tpu.aperiodicity import common as C
    from world_tpu.spectral.cheaptrick import _cheaptrick_core, default_fft_size
    from world_tpu.f0.harvest import _harvest_core

    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    fs = int(fs)
    x = jnp.asarray((x_int16 / (2 ** 15 - 1)).astype(np.float32))
    sig_len = x.shape[0]
    frame_period = 5
    n_bands = int(np.ceil(np.log2((800 * 1.1) / (71 * 0.9)) * 40))
    max_candidates = int(n_bands / 10 + 0.5)

    hv = jax.jit(lambda x: _harvest_core(x, fs, 71.0, 800.0, 5.0,
                                         max_candidates, 256, sig_len))(x)
    f0, vuv, tp = hv["f0"], hv["vuv"], hv["temporal_positions"]
    f0_d4c = jnp.where(vuv == 0, 0.0, f0)
    fp_ms = float(frame_period)
    dtype = x.dtype

    # ---- d4c_requiem internals -------------------------------------------
    fft_req = int(2 ** np.ceil(np.log2(3 * fs / 47 + 1)))
    n_ap = int(np.floor(min(15000, fs / 2 - 3000) / 3000))
    window = C.band_window(fs, fft_req, 3000.0)
    max_half_lt = int(1.5 * fs / 40.0 + 0.5)
    max_half = int(2.0 * fs / 47.0 + 0.5)
    fft_lt = C.love_train_fft_size(fs)

    lt_fn = jax.jit(lambda x, f0: C.love_train_vuv(
        x, fs, f0, tp, 0.85, max_half_lt, fft_lt, fp_ms))
    timed(lt_fn, x, f0_d4c, label="d4c.love_train")

    cur_f0 = jnp.maximum(47.0, f0_d4c)
    cen_fn = jax.jit(lambda x, f0: C.static_centroid_half(
        x, fs, f0, tp.astype(dtype), max_half, fft_req, dtype, fp_ms))
    centroid = timed(cen_fn, x, cur_f0, label="d4c.centroid_pair")

    sps_fn = jax.jit(lambda x, f0: C.smoothed_power_spectrum_half(
        x, fs, f0, tp.astype(dtype), max_half, fft_req, dtype, fp_ms))
    spsh = timed(sps_fn, x, cur_f0, label="d4c.smoothed_power")

    gd_fn = jax.jit(lambda c, s, f0: C.static_group_delay_half(
        c, s, fs, f0, fft_req, dtype))
    gd = timed(gd_fn, centroid, spsh, cur_f0, label="d4c.group_delay(2 smooth)")

    ca_fn = jax.jit(lambda gd: C.coarse_aperiodicity(
        gd, float(fs), fft_req, 3000.0, n_ap, window, dtype))
    timed(ca_fn, gd, label="d4c.coarse_ap(bands+topk)")

    # isolate the top_k inside coarse_aperiodicity
    wlen = len(window)
    boundary = int(fft_req / wlen * 8 + 0.5)
    hw = wlen // 2
    from world_tpu.dsp.minphase import mirror_full
    from world_tpu.dsp import fftmm

    gd_full = mirror_full(gd)
    segs = [gd_full[..., int(np.floor(3000.0 * (i + 1) / (fs / fft_req)))
                    - hw : int(np.floor(3000.0 * (i + 1) / (fs / fft_req)))
                    + hw + 1] for i in range(n_ap)]
    seg = jnp.stack(segs, axis=-2) * jnp.asarray(window, dtype=dtype)
    pw_fn = jax.jit(lambda seg: jnp.abs(fftmm.rfft(seg, fft_req)) ** 2)
    power = timed(pw_fn, seg, label="d4c.band_rfft_power")
    tk_fn = jax.jit(lambda p: jnp.sum(jax.lax.top_k(p, boundary + 1)[0], -1))
    timed(tk_fn, power, label="d4c.top_k")

    # ---- cheaptrick internals --------------------------------------------
    fft_ct = default_fft_size(fs)
    f0_ct = jnp.where(vuv == 0, 500.0, f0)
    ct_fn = jax.jit(lambda x, f0: _cheaptrick_core(
        x, fs, f0, tp, fft_ct, -0.15, fp_ms))
    timed(ct_fn, x, f0_ct, label="cheaptrick FULL")


if __name__ == "__main__":
    main()
