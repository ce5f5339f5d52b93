"""Fused Harvest-refinement kernel: window-build -> DFT matmul -> bin select.

GetRefinedF0 (/root/reference/world/harvest.py:169-211) reads <=6 harmonic
bins of two per-(candidate, frame) FFTs whose size depends on the candidate
f0.  Because every per-candidate fft_size is a power of two dividing S (the
f0_floor size), bin ``b`` of a size-``s`` DFT equals bin ``K = b*(S/s)`` of
ONE size-S DFT — so the whole refinement fan-out is a (rows, W) x (W, S+2)
matmul against a static cos/sin basis plus a 6-bin select per row.

The Pallas kernel fuses the three stages per (frame-block, candidate) tile
entirely in VMEM: the Blackman main/derivative windows, the MXU DFT, and the
equality-masked bin select.  Nothing bigger than (C, B, 24) ever touches
HBM — the XLA twin below (used on CPU backends and as the test oracle)
materializes ~4 GB of windowed segments and spectra for the same math.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import on_tpu

_BLK = 128


def dft_basis(W: int, nb: int, dtype):
    """Static cos/sin basis (W, 2*nb) with angles (-2*pi*k/S)*n, S=2*(nb-1).

    The angle arithmetic order matches the reference's
    (-2*pi*bins/fft_size)*n bit-for-bit (K/S == bins/fft_size exactly).
    """
    S = 2 * (nb - 1)
    k_idx = jnp.arange(nb, dtype=dtype)
    ang = ((-2.0 * jnp.pi) * k_idx) / S
    n_idx = jnp.arange(W, dtype=dtype)
    theta = n_idx[:, None] * ang[None, :]
    return jnp.concatenate([jnp.cos(theta), jnp.sin(theta)], axis=1)


def _windows(phase, f0, actual_fs, max_half, base_abs):
    """Blackman main window + centered-difference derivative window
    (harvest.py:175-193), for one (rows, W) block."""
    dtype = phase.dtype
    half = jnp.ceil(3 * actual_fs / f0 / 2)[..., None]
    wlt = (2 * half + 1) / actual_fs
    mask = base_abs <= half
    common = jnp.pi * phase / wlt
    mw = 0.42 + 0.5 * jnp.cos(2 * common) + 0.08 * jnp.cos(4 * common)
    mw = jnp.where(mask, mw, jnp.zeros((), dtype))
    right = jnp.pad(mw[..., 1:], [(0, 0)] * (mw.ndim - 1) + [(0, 1)])
    left = jnp.pad(mw[..., :-1], [(0, 0)] * (mw.ndim - 1) + [(1, 0)])
    dw = jnp.where(mask, -(right - left) / 2, jnp.zeros((), dtype))
    return mw, dw


def _kernel(seg_ref, phase_ref, f0_ref, k_ref, basis_ref, out_ref, *,
            actual_fs, max_half, nb):
    dtype = seg_ref.dtype
    seg = seg_ref[:]                                   # (BLK, W)
    W = seg.shape[1]
    base = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) - max_half
    base_abs = jnp.abs(base).astype(dtype)
    mw, dw = _windows(phase_ref[:], f0_ref[0, :, 0], actual_fs, max_half,
                      base_abs)
    basis = basis_ref[:]
    # NB: Mosaic's native f32 dot beats a manual 3-pass bf16 split here
    # (measured 19.8 vs 27.9 ms for the full stage)
    spec_m = jnp.dot(seg * mw, basis, preferred_element_type=dtype)
    spec_d = jnp.dot(seg * dw, basis, preferred_element_type=dtype)
    K = k_ref[0]                                       # (BLK, 6)
    kk = jax.lax.broadcasted_iota(jnp.int32, K.shape + (nb,), 2)
    oh = (K[:, :, None] == kk).astype(dtype)           # (BLK, 6, nb)
    parts = [jnp.sum(oh * sl[:, None, :], axis=-1)
             for spec in (spec_m, spec_d)
             for sl in (spec[:, :nb], spec[:, nb:])]
    out_ref[0] = jnp.concatenate(parts, axis=-1)       # (BLK, 24)


@partial(jax.jit, static_argnames=("actual_fs", "max_half", "nb", "interpret"))
def _refine_pallas(seg, phase, f0, K, basis, actual_fs, max_half, nb,
                   interpret=False):
    C, B = f0.shape
    W = seg.shape[1]
    pad = (-B) % _BLK
    if pad:
        seg = jnp.pad(seg, ((0, pad), (0, 0)))
        phase = jnp.pad(phase, ((0, pad), (0, 0)))
        f0 = jnp.pad(f0, ((0, 0), (0, pad)), constant_values=1.0)
        K = jnp.pad(K, ((0, 0), (0, pad), (0, 0)))
    Bp = B + pad
    kernel = partial(_kernel, actual_fs=actual_fs, max_half=max_half, nb=nb)
    # grid order (frame-block, candidate): the candidate axis iterates
    # fastest, so the seg/phase/basis block DMAs are skipped for 47 of every
    # 48 steps (their index maps do not depend on j)
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
            pl.BlockSpec((1, _BLK, 6), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 2 * nb), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLK, 24), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Bp, 24), seg.dtype),
        interpret=interpret,
    )(seg, phase, f0[..., None], K, basis)
    return out[:, :B].reshape(C, B, 4, 6)


def refine_dft_select_xla(seg, phase, f0, K, basis, actual_fs, max_half, nb):
    """Pure-XLA twin (CPU path / test oracle): same math, materialized."""
    from ..dsp.scanops import select_rows_small

    dtype = seg.dtype
    W = seg.shape[1]
    C, B = f0.shape
    base_index = jnp.arange(-max_half, max_half + 1, dtype=dtype)
    mw, dw = _windows(phase[None], f0, actual_fs, max_half,
                      jnp.abs(base_index)[None, None, :])
    X = jnp.concatenate([(seg[None] * mw).reshape(-1, W),
                         (seg[None] * dw).reshape(-1, W)])
    spec = jnp.dot(X, basis, preferred_element_type=dtype)  # (2CB, 2nb)
    quads = jnp.stack([spec[: C * B, :nb], spec[: C * B, nb:],
                       spec[C * B :, :nb], spec[C * B :, nb:]], axis=1)
    picked = select_rows_small(quads, K.reshape(C * B, 1, 6))
    return picked.reshape(C, B, 4, 6)


def refine_dft_select(seg, phase, f0, K, actual_fs, max_half, nb):
    """(re_s, im_s, re_d, im_d) at the 6 harmonic bins K for every
    (candidate, frame): returns (C, B, 4, 6)."""
    W = seg.shape[1]
    basis = dft_basis(W, nb, seg.dtype)
    if on_tpu():
        return _refine_pallas(seg, phase, f0, K, basis,
                              float(actual_fs), int(max_half), int(nb))
    return refine_dft_select_xla(seg, phase, f0, K, basis,
                                 float(actual_fs), int(max_half), int(nb))
