"""Fused zero-crossing interval interpolation (the dio/harvest event engine).

The XLA path (f0.events.batched_interval_interp) builds 9 dense
"k-th previous / next crossing" arrays per signal row via blocked running-max
scans — ~18 full-size HBM passes per call.  This kernel runs the whole
pipeline per (8-row, full-length) VMEM tile:

    crossing mask + sub-sample edge positions
    -> 4 previous-edge + 5 next-edge running-max/min chains (log-doubling
       rolls, entirely in VMEM)
    -> static rational-stride frame sampling (reshape + column selects)
    -> interval selection + linear interp/extrapolation at the frame grid

HBM traffic: read the signals once, write (S, Q) + (S, 1) — nothing else.
Semantics match batched_interval_interp exactly (same order of max/min
reductions, same sampling indices, same selection arithmetic).
"""
from fractions import Fraction
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import on_tpu

_BLK = 8
_N_PREV = 4
_N_NEXT = 5


def _shift_fwd(v, s, fill):
    """v shifted right by s along the last axis, first s columns = fill."""
    rolled = pltpu.roll(v, s, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col < s, fill, rolled)


def _shift_rev(v, s, fill):
    n = v.shape[-1]
    rolled = pltpu.roll(v, -s, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col >= n - s, fill, rolled)


def _cummax(v, neg, reverse=False):
    n = v.shape[-1]
    s = 1
    while s < n:
        v = jnp.maximum(v, _shift_rev(v, s, neg) if reverse
                        else _shift_fwd(v, s, neg))
        s *= 2
    return v


def _sample(dense, margin, A, pnum, qden, Q):
    """dense[clip(floor(q*pnum/qden) - margin, edges)] for q < Q, via a
    reshape + static column selects (no gathers; identical indices to
    f0.events._strided_sample)."""
    blk, n = dense.shape
    need = A * pnum
    left = jnp.broadcast_to(dense[:, :1], (blk, margin))
    fill = need - margin - n
    right = jnp.broadcast_to(dense[:, -1:], (blk, fill))
    dp = jnp.concatenate([left, dense, right], axis=1)
    r3 = dp.reshape(blk, A, pnum)
    cols = [r3[:, :, (r * pnum) // qden] for r in range(qden)]
    grid = jnp.stack(cols, axis=-1).reshape(blk, A * qden)
    return grid[:, :Q]


def _kernel(x_ref, tq_ref, out_ref, m_ref, *, fs, pnum, qden, Q, A):
    dtype = x_ref.dtype
    x = x_ref[:]                                         # (BLK, n)
    n = x.shape[1]
    neg = jnp.asarray(-np.inf, dtype)
    pos = jnp.asarray(np.inf, dtype)
    x_next = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    mask = (x_next * x < 0) & (x_next < x)
    col1 = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + 1).astype(dtype)
    den = x_next - x
    fine = col1 - x / jnp.where(den == 0, jnp.ones((), dtype), den)

    samp = []
    cur = _cummax(jnp.where(mask, fine, neg), neg)
    prev_chain = [cur]
    for _ in range(_N_PREV - 1):
        cur = _cummax(jnp.where(mask, _shift_fwd(cur, 1, neg), neg), neg)
        prev_chain.append(cur)
    for e in prev_chain[::-1]:                           # ascending P4..P1
        samp.append(_sample(e, 2, A, pnum, qden, Q))
    cur = -_cummax(jnp.where(mask, -fine, neg), neg, reverse=True)
    samp.append(_sample(cur, 1, A, pnum, qden, Q))
    for _ in range(_N_NEXT - 1):
        at_cross = jnp.where(mask, _shift_rev(cur, 1, pos), pos)
        cur = -_cummax(-at_cross, neg, reverse=True)
        samp.append(_sample(cur, 1, A, pnum, qden, Q))

    E = jnp.stack(samp, axis=-1)                         # (BLK, Q, 9)
    valid = jnp.isfinite(E)
    T = (tq_ref[0] * fs)[None, :, None]                  # (1, Q, 1)
    mids = (E[..., :-1] + E[..., 1:]) / 2.0
    diffs = E[..., 1:] - E[..., :-1]
    f0s = fs / jnp.where(diffs <= 0, jnp.ones((), dtype), diffs)
    mid_valid = valid[..., :-1] & valid[..., 1:]
    left_invalid = jnp.sum((~valid[..., :_N_PREV]).astype(jnp.int32), axis=-1)
    v_count = jnp.sum(mid_valid.astype(jnp.int32), axis=-1)
    raw_cnt = (jnp.sum((mid_valid & (mids <= T)).astype(jnp.int32), axis=-1)
               + left_invalid)
    hi_v = left_invalid + jnp.maximum(v_count, 2) - 1
    j = jnp.clip(raw_cnt - 1, left_invalid, hi_v - 1)

    def sel(arr, jj):
        out = arr[..., 0]
        for i in range(1, arr.shape[-1]):
            out = jnp.where(jj == i, arr[..., i], out)
        return out

    tq = tq_ref[0][None, :]
    x0 = sel(mids, j) / fs
    x1 = sel(mids, j + 1) / fs
    y0 = sel(f0s, j)
    y1 = sel(f0s, j + 1)
    dx = x1 - x0
    out_ref[:] = y0 + (y1 - y0) / jnp.where(dx == 0, jnp.ones((), dtype),
                                            dx) * (tq - x0)
    n_edges = jnp.sum(mask.astype(jnp.int32), axis=-1, keepdims=True)
    m_ref[:] = jnp.maximum(n_edges - 1, 0)


@partial(jax.jit, static_argnames=("fs", "pnum", "qden", "Q", "interpret"))
def _interval_interp_pallas(x, tq, fs, pnum, qden, Q, interpret=False):
    S, n = x.shape
    pad = (-S) % _BLK
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Sp = S + pad
    A = Q // qden + 2
    while A * pnum < n + 2:
        A += 1
    kernel = partial(_kernel, fs=fs, pnum=pnum, qden=qden, Q=Q, A=A)
    out, m = pl.pallas_call(
        kernel,
        grid=(Sp // _BLK,),
        in_specs=[
            pl.BlockSpec((_BLK, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BLK, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Sp, Q), x.dtype),
                   jax.ShapeDtypeStruct((Sp, 1), jnp.int32)],
        interpret=interpret,
    )(x, tq[None, :])
    return out[:S], m[:S, 0]


def interval_interp(signals, fs, t_frames, stride_samples: float):
    """(f0 (S, Q), n_intervals (S,)) — crossing intervals linearly
    interpolated at the uniform frame grid.  Dispatches to the fused Pallas
    kernel on TPU, to f0.events.batched_interval_interp elsewhere."""
    if on_tpu():
        frac = Fraction(float(stride_samples)).limit_denominator(1000)
        return _interval_interp_pallas(signals, t_frames, float(fs),
                                       int(frac.numerator),
                                       int(frac.denominator),
                                       int(t_frames.shape[0]))
    from ..f0.events import batched_interval_interp

    return batched_interval_interp(signals, fs, t_frames, stride_samples)
