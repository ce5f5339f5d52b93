"""Sub-stage TPU timing inside _harvest_core on the BASELINE fixture."""
import time
from functools import partial

import numpy as np
from scipy.io import wavfile

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def timed(fn, *args, repeats=5, label=""):
    from tools.axon_timing import device_time
    per_call, out = device_time(fn, *args, k=8, label=label, verbose=True)
    return out


def main():
    import importlib
    H = importlib.import_module("world_tpu.f0.harvest")

    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    fs = int(fs)
    x = jnp.asarray((x_int16 / (2 ** 15 - 1)).astype(np.float32))
    signal_length = x.shape[0]
    f0_floor, f0_ceil, frame_period = 71.0, 800.0, 5.0
    n_bands = int(np.ceil(np.log2((f0_ceil * 1.1) / (f0_floor * 0.9)) * 40))
    max_candidates = int(n_bands / 10 + 0.5)
    max_sections = 256

    target_fs = 8000
    num_samples = int(1000 * signal_length / fs + 1)
    basic_tp = jnp.asarray(np.arange(num_samples) / 1000, dtype=x.dtype)
    adj_floor, adj_ceil = f0_floor * 0.9, f0_ceil * 1.1
    boundary_f0_list = adj_floor * 2.0 ** (
        (np.arange(np.ceil(np.log2(adj_ceil / adj_floor) * 40)) + 1) / 40)

    ds_fn = jax.jit(lambda x: H.downsample(x, fs, target_fs))
    y, actual_fs = timed(ds_fn, x, label="downsample")
    actual_fs = float(actual_fs)
    y_len = y.shape[0]
    fft_size = int(2 ** np.ceil(np.log2(y_len + int(fs / adj_floor * 4 + 0.5) + 1)))
    duration = y_len / actual_fs
    capacity = int(duration * boundary_f0_list[-1] * 1.5) + 64

    raw_fn = jax.jit(lambda y: H.raw_band_candidates(
        y, actual_fs, boundary_f0_list, basic_tp, f0_floor, f0_ceil,
        fft_size, capacity))
    raw = timed(raw_fn, y, label="raw_band_candidates")

    det_fn = jax.jit(lambda raw: H.detect_candidates(raw, max_candidates))
    cands0, n_det = timed(det_fn, raw, label="detect_candidates")

    ov_fn = jax.jit(lambda c: H.overlap_candidates(c, max_candidates))
    cands1 = timed(ov_fn, cands0, label="overlap_candidates")

    max_half = int(np.ceil(3 * actual_fs / f0_floor / 2))
    C2 = min(48, cands1.shape[0])

    from world_tpu.dsp.scanops import count_less_rows, select_rows_small

    C = cands1.shape[0]

    @jax.jit
    def compact_fn(cands1):
        nzT = (cands1 != 0).T
        rankT = jnp.cumsum(nzT.astype(jnp.int32), axis=1)
        pos = count_less_rows(rankT, jnp.arange(1, C2 + 1, dtype=jnp.int32))
        slot_valid = jnp.arange(1, C2 + 1)[None, :] <= rankT[:, -1:]
        compact = jnp.where(
            slot_valid, select_rows_small(cands1.T, jnp.minimum(pos, C - 1)),
            0.0).T
        return compact, nzT, rankT
    compact, nzT, rankT = timed(compact_fn, cands1, label="compaction")

    ref_fn = jax.jit(lambda y, compact: H.refine_candidates(
        y, actual_fs, basic_tp, compact, f0_floor, f0_ceil, max_half,
        stride_samples=actual_fs * 0.001))
    ref_c, score_c = timed(ref_fn, y, compact, label="refine_candidates")

    @jax.jit
    def scatter_fn(ref_c, score_c, nzT, rankT):
        back_ok = nzT & (rankT <= C2)
        slot_idx = jnp.clip(rankT - 1, 0, C2 - 1)
        c2 = jnp.where(back_ok, select_rows_small(ref_c.T, slot_idx), 0.0).T
        s2 = jnp.where(back_ok, select_rows_small(score_c.T, slot_idx), 0.0).T
        return c2, s2
    cands2, scores2 = timed(scatter_fn, ref_c, score_c, nzT, rankT,
                            label="scatter-back")

    ru_fn = jax.jit(H.remove_unreliable)
    cands3, scores3 = timed(ru_fn, cands2, scores2, label="remove_unreliable")

    base_fn = jax.jit(H.search_f0_base)
    f0_base = timed(base_fn, cands3, scores3, label="search_f0_base")
    s1_fn = jax.jit(lambda f: H.fix_step1(f, 0.008))
    f0_step1 = timed(s1_fn, f0_base, label="fix_step1")
    s2_fn = jax.jit(lambda f: H.fix_step2(f, 6))
    f0_step2 = timed(s2_fn, f0_step1, label="fix_step2")
    s3_fn = jax.jit(lambda f, c, s: H.fix_step3(f, c, s, 0.18,
                                                max_sections=max_sections))
    f0_step3 = timed(s3_fn, f0_step2, cands3, scores3, label="fix_step3")
    s4_fn = jax.jit(lambda f: H.fix_step4(f, 9))
    f0_step4 = timed(s4_fn, f0_step3, label="fix_step4")
    sm_fn = jax.jit(lambda f: H.smooth_f0(f, max_sections=max_sections))
    timed(sm_fn, f0_step4, label="smooth_f0")


if __name__ == "__main__":
    main()
