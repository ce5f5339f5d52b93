"""Fused Harvest-refinement kernel: windows -> DFT -> bins -> refined f0.

GetRefinedF0 (/root/reference/world/harvest.py:169-211) reads <=6 harmonic
bins of two per-(candidate, frame) FFTs whose size depends on the candidate
f0.  Because every per-candidate fft_size is a power of two dividing S (the
f0_floor size), bin ``b`` of a size-``s`` DFT equals bin ``K = b*(S/s)`` of
ONE size-S DFT — so the whole refinement fan-out is a (rows, W) x (W, S+2)
matmul against a static cos/sin basis plus a 6-bin select per row.

The Pallas kernel fuses ALL stages per (frame-block, candidate) tile
entirely in VMEM: the Blackman main/derivative windows (cos(4x) via the
double-angle identity — transcendentals are the single largest cost), the
MXU DFT, per-harmonic one-hot bin selects in a layout-friendly (BLK, nb)
shape, and the instantaneous-frequency -> refined-f0/score math, so only
(C, B, 2) results ever touch HBM.  The XLA twin below (CPU backends / test
oracle) materializes the same math stage by stage.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import on_tpu, prod_diff

_BLK = 128


def dft_basis(W: int, nb: int, dtype):
    """Static cos/sin basis (W, 2*nb) with angles (-2*pi*k/S)*n, S=2*(nb-1).

    Computed HOST-SIDE in float64 and baked in as a constant: every entry is
    then correct to one target-dtype ulp.  Tracing this on device in f32
    (round 2) put ~1.2e-4 rad of angle rounding plus the accelerator's
    large-argument trig error into the basis (|theta| reaches ~pi*W ~ 2e3
    rad), which dominated the refinement's score noise on TPU — measured
    8x more base-stage octave flips vs the f64 reference than the same f32
    math on CPU (51 vs 6 at 16 kHz).  The reference's FFT
    (/root/reference/world/harvest.py:184-193) is all-f64, so the constant
    basis is also the closer parity match.
    """
    S = 2 * (nb - 1)
    theta = np.arange(W, dtype=np.float64)[:, None] * (
        (-2.0 * np.pi) * np.arange(nb, dtype=np.float64)[None, :] / S)
    basis = np.concatenate([np.cos(theta), np.sin(theta)], axis=1)
    return jnp.asarray(basis, dtype)


def _windows(phase, f0, actual_fs, max_half, base_abs, fast_cos=False):
    """Blackman main window + centered-difference derivative window
    (harvest.py:175-193), for one (rows, W) block."""
    dtype = phase.dtype
    half = jnp.ceil(3 * actual_fs / f0 / 2)[..., None]
    wlt = (2 * half + 1) / actual_fs
    mask = base_abs <= half
    common = jnp.pi * phase / wlt
    if fast_cos and dtype == jnp.float32:
        from . import cos_reduced
        # direct evaluation at both arguments (|2*common| <= ~1.1*pi,
        # |4*common| <= ~2.2*pi — inside cos_reduced's range): a double-angle
        # step would amplify the c2 error ~4x, and that window noise was
        # measured to drive the 16 kHz TPU-vs-f64 candidate-score flips
        c2 = cos_reduced(2 * common)
        c4 = cos_reduced(4 * common)
    elif fast_cos:
        c2 = jnp.cos(2 * common)
        c4 = 2.0 * c2 * c2 - 1.0
    else:
        c2 = jnp.cos(2 * common)
        c4 = jnp.cos(4 * common)
    mw = 0.42 + 0.5 * c2 + 0.08 * c4
    mw = jnp.where(mask, mw, jnp.zeros((), dtype))
    right = jnp.pad(mw[..., 1:], [(0, 0)] * (mw.ndim - 1) + [(0, 1)])
    left = jnp.pad(mw[..., :-1], [(0, 0)] * (mw.ndim - 1) + [(1, 0)])
    dw = jnp.where(mask, -(right - left) / 2, jnp.zeros((), dtype))
    return mw, dw


def _refine_math(picked, bins, fft_size, f0, hmask, n_harm, harmonics,
                 actual_fs, f0_floor, f0_ceil):
    """picked (…, 4, 6) harmonic-bin spectra -> (refined f0, score), the
    tail of GetRefinedF0 (harvest.py:194-211)."""
    dtype = picked.dtype
    re_s, im_s = picked[..., 0, :], picked[..., 1, :]
    re_d, im_d = picked[..., 2, :], picked[..., 3, :]
    # compensated in f32: near-tied candidate scores must not flip on
    # numerator cancellation noise (see ops.prod_diff)
    numerator = prod_diff(re_s, im_d, im_s, re_d)
    power = re_s ** 2 + im_s ** 2
    inst_freq = (bins / fft_size[..., None]
                 + numerator / jnp.maximum(power, jnp.finfo(dtype).tiny)
                 / 2 / jnp.pi) * actual_fs
    amp = jnp.sqrt(power) * hmask
    refined = (jnp.sum(amp * inst_freq, axis=-1)
               / jnp.maximum(jnp.sum(amp * harmonics, axis=-1),
                             jnp.finfo(dtype).tiny))
    variation = jnp.abs((inst_freq / harmonics - f0[..., None])
                        / f0[..., None])
    score = 1.0 / (0.000000000001
                   + jnp.sum(jnp.where(hmask, variation, 0.0), axis=-1)
                   / jnp.maximum(n_harm, 1.0))
    ok = ((refined >= f0_floor) & (refined <= f0_ceil) & (score >= 2.5)
          & (f0 > 1e-6))
    return jnp.where(ok, refined, 0.0), jnp.where(ok, score, 0.0)


def _harmonic_meta(f0, actual_fs, nb, dtype):
    """(fft_size, n_harm, hmask (.., 6), bins (.., 6)) per candidate-frame:
    harvest.py:174-199's data-dependent sizes as scalars."""
    half = jnp.ceil(3 * actual_fs / f0 / 2)
    fft_size = 2.0 ** jnp.ceil(jnp.log2(half * 2 + 1) + 1)
    # int iota then cast: Mosaic has no float iota
    harmonics = jnp.arange(1, 7, dtype=jnp.int32).astype(dtype)
    shape = (1,) * f0.ndim + (6,)
    harmonics = harmonics.reshape(shape)
    n_harm = jnp.minimum(jnp.floor(actual_fs / 2 / f0), 6.0)
    hmask = harmonics <= n_harm[..., None]
    bins = jnp.trunc(f0[..., None] * fft_size[..., None] / actual_fs
                     * harmonics + 0.5)
    return fft_size, n_harm, hmask, bins, harmonics


def _kernel(seg_ref, phase_ref, f0_ref, basis_ref, out_ref, *,
            actual_fs, max_half, nb, f0_floor, f0_ceil):
    dtype = seg_ref.dtype
    f0 = f0_ref[0, :, 0]                               # (BLK,)
    out_ref[0] = jnp.zeros(out_ref.shape[1:], dtype)
    # the compaction ranks candidates per frame, so high candidate slots are
    # empty for most frame blocks — skip those tiles entirely (masked
    # candidates produce (0, 0) either way)
    @pl.when(jnp.any(f0 > 1e-6))
    def _body():
        _kernel_body(seg_ref, phase_ref, f0, basis_ref, out_ref,
                     actual_fs=actual_fs, max_half=max_half, nb=nb,
                     f0_floor=f0_floor, f0_ceil=f0_ceil)


def _kernel_body(seg_ref, phase_ref, f0, basis_ref, out_ref, *,
                 actual_fs, max_half, nb, f0_floor, f0_ceil):
    dtype = seg_ref.dtype
    seg = seg_ref[:]                                   # (BLK, W)
    W = seg.shape[1]
    S = 2 * (nb - 1)
    base = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) - max_half
    base_abs = jnp.abs(base).astype(dtype)
    mw, dw = _windows(phase_ref[:], f0, actual_fs, max_half, base_abs,
                      fast_cos=True)
    basis = basis_ref[:]
    # HIGHEST: the instantaneous-frequency numerator is a cancellation-prone
    # difference of products, and with DEFAULT Mosaic picks per-shape f32
    # algorithms — accurate at the full (W=313, S=1024) size but visibly
    # lossy at the small bucketed sizes (vuv agreement collapsed 99.6->96.3%
    # with DEFAULT bucket dots).  The f0-bucketing saves ~3x the flops, which
    # more than pays for the exact f32 passes.
    P = jax.lax.Precision.HIGHEST
    spec_m = jnp.dot(seg * mw, basis, preferred_element_type=dtype,
                     precision=P)
    spec_d = jnp.dot(seg * dw, basis, preferred_element_type=dtype,
                     precision=P)

    fft_size, n_harm, hmask, bins, _ = _harmonic_meta(f0, actual_fs, nb,
                                                      dtype)
    K = jnp.clip(bins * (S / fft_size[..., None]), 0, S // 2)
    K = K.astype(jnp.int32)                            # (BLK, 6)

    kcol = jax.lax.broadcasted_iota(jnp.int32, (_BLK, nb), 1)
    tiny = jnp.finfo(dtype).tiny
    num_acc = jnp.zeros((_BLK,), dtype)
    den_acc = jnp.zeros((_BLK,), dtype)
    var_acc = jnp.zeros((_BLK,), dtype)
    for h in range(6):
        oh = (kcol == K[:, h][:, None]).astype(dtype)  # (BLK, nb)
        re_s = jnp.sum(oh * spec_m[:, :nb], axis=1)
        im_s = jnp.sum(oh * spec_m[:, nb:], axis=1)
        re_d = jnp.sum(oh * spec_d[:, :nb], axis=1)
        im_d = jnp.sum(oh * spec_d[:, nb:], axis=1)
        numerator = prod_diff(re_s, im_d, im_s, re_d)
        power = re_s * re_s + im_s * im_s
        inst = (bins[:, h] / fft_size
                + numerator / jnp.maximum(power, tiny) / 2 / jnp.pi
                ) * actual_fs
        hm = hmask[:, h]
        amp = jnp.sqrt(power) * hm
        num_acc = num_acc + amp * inst
        den_acc = den_acc + amp * (h + 1.0)
        var_acc = var_acc + jnp.where(hm, jnp.abs((inst / (h + 1.0) - f0)
                                                  / f0), 0.0)
    refined = num_acc / jnp.maximum(den_acc, tiny)
    score = 1.0 / (0.000000000001 + var_acc / jnp.maximum(n_harm, 1.0))
    ok = ((refined >= f0_floor) & (refined <= f0_ceil) & (score >= 2.5)
          & (f0 > 1e-6))
    out_ref[0] = jnp.stack([jnp.where(ok, refined, 0.0),
                            jnp.where(ok, score, 0.0)], axis=1)


@partial(jax.jit, static_argnames=("actual_fs", "max_half", "nb", "f0_floor",
                                   "f0_ceil", "interpret"))
def _refine_pallas(seg, phase, f0, basis, actual_fs, max_half, nb,
                   f0_floor, f0_ceil, interpret=False):
    C, B = f0.shape
    W = seg.shape[1]
    pad = (-B) % _BLK
    if pad:
        seg = jnp.pad(seg, ((0, pad), (0, 0)))
        phase = jnp.pad(phase, ((0, pad), (0, 0)))
        f0 = jnp.pad(f0, ((0, 0), (0, pad)))   # 0-pad: rides the tile skip
    Bp = B + pad
    kernel = partial(_kernel, actual_fs=actual_fs, max_half=max_half, nb=nb,
                     f0_floor=f0_floor, f0_ceil=f0_ceil)
    # grid order (frame-block, candidate): the candidate axis iterates
    # fastest, so the seg/phase/basis block DMAs are skipped for C-1 of every
    # C steps (their index maps do not depend on j)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // _BLK, C),
        in_specs=[
            pl.BlockSpec((_BLK, W), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, W), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, 1), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 2 * nb), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLK, 2), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Bp, 2), seg.dtype),
        interpret=interpret,
    )(seg, phase, f0[..., None], basis)
    return out[:, :B, 0], out[:, :B, 1]


def refine_full_xla(seg, phase, f0, basis, actual_fs, max_half, nb,
                    f0_floor, f0_ceil):
    """Pure-XLA twin (CPU path / test oracle): same math, materialized."""
    from ..dsp.scanops import select_rows_small

    dtype = seg.dtype
    W = seg.shape[1]
    C, B = f0.shape
    S = 2 * (nb - 1)
    base_index = jnp.arange(-max_half, max_half + 1, dtype=dtype)
    mw, dw = _windows(phase[None], f0, actual_fs, max_half,
                      jnp.abs(base_index)[None, None, :])
    X = jnp.concatenate([(seg[None] * mw).reshape(-1, W),
                         (seg[None] * dw).reshape(-1, W)])
    # HIGHEST: inert on CPU (DEFAULT is already f32 there), but the twin must
    # not silently run a bf16 pass if ever dispatched on a TPU backend
    spec = jnp.dot(X, basis, preferred_element_type=dtype,
                   precision=jax.lax.Precision.HIGHEST)  # (2CB, 2nb)
    quads = jnp.stack([spec[: C * B, :nb], spec[: C * B, nb:],
                       spec[C * B :, :nb], spec[C * B :, nb:]], axis=1)

    fft_size, n_harm, hmask, bins, harmonics = _harmonic_meta(
        f0, actual_fs, nb, dtype)
    K = jnp.clip(bins * (S / fft_size[..., None]), 0, S // 2)
    picked = select_rows_small(quads, K.astype(jnp.int32).reshape(C * B, 1, 6))
    picked = picked.reshape(C, B, 4, 6)
    return _refine_math(picked, bins, fft_size, f0, hmask, n_harm, harmonics,
                        actual_fs, f0_floor, f0_ceil)


def _refine_pallas_batchable(actual_fs, max_half, nb, f0_floor, f0_ceil,
                             interpret=False):
    """custom_vmap wrapper over the Pallas kernel: an utterance-batch axis is
    folded into the frame-row axis B (utterance-major) and the SAME kernel
    runs once over N*B rows.  This sidesteps pallas auto-batching (an extra
    leading grid dim) and makes every batched row bitwise identical to its
    single-stream result — rows are independent, so tile regrouping cannot
    change the math."""
    from jax.custom_batching import custom_vmap

    statics = (actual_fs, max_half, nb, f0_floor, f0_ceil)

    @custom_vmap
    def fn(seg, phase, f0, basis):
        return _refine_pallas(seg, phase, f0, basis, *statics,
                              interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, seg, phase, f0, basis):
        sb, pb, fb, bb = in_batched
        if bb:  # basis is a static constant; any batch copies are identical
            basis = basis[0]

        def bcast(a, batched):
            return a if batched else jnp.broadcast_to(
                a[None], (axis_size,) + a.shape)

        seg = bcast(seg, sb)
        phase = bcast(phase, pb)
        f0 = bcast(f0, fb)
        N, B, W = seg.shape
        C = f0.shape[1]
        r, s = fn(seg.reshape(N * B, W), phase.reshape(N * B, W),
                  jnp.moveaxis(f0, 0, 1).reshape(C, N * B), basis)
        r = jnp.moveaxis(r.reshape(C, N, B), 1, 0)
        s = jnp.moveaxis(s.reshape(C, N, B), 1, 0)
        return (r, s), (True, True)

    return fn


def refine_full(seg, phase, f0, actual_fs, max_half, nb, f0_floor, f0_ceil):
    """(refined_f0, score) (C, B) for every (candidate, frame) — the full
    GetRefinedF0 grid (harvest.py:131-150) as one fused pass."""
    W = seg.shape[1]
    basis = dft_basis(W, nb, seg.dtype)
    args = (float(actual_fs), int(max_half), int(nb), float(f0_floor),
            float(f0_ceil))
    if on_tpu():
        return _refine_pallas_batchable(*args)(seg, phase, f0, basis)
    return refine_full_xla(seg, phase, f0, basis, *args)
