"""Fused zero-crossing interval extraction (the dio/harvest event engine).

The XLA path (f0.events.batched_interval_interp) builds 9 dense
"k-th previous / next crossing" arrays per signal row via blocked running-max
scans — ~18 full-size HBM passes per call.  This module runs the pipeline as
two small Pallas kernels plus a shared XLA tail:

1. **chains kernel** — per (8-row, full-length) VMEM tile: crossing mask +
   sub-sample edge positions -> 4 previous-edge + 5 next-edge running
   max/min chains via log-doubling rolls, entirely in VMEM.  HBM sees the
   signals once in and the 9 chains once out (the XLA scans re-read and
   re-write them ~18 times).

2. **sampling kernel** — the chains must be read at the uniform frame grid
   (rational stride ``pnum/qden`` samples per frame).  Mosaic cannot lower
   the 2D->3D reshape a strided column-select needs, and a per-block unroll
   of windowed dots blows up compile time, so the blocking happens in the
   grid: with ``QB`` a multiple of ``qden``, consecutive QB-frame blocks
   advance by exactly ``adv = QB*pnum/qden`` samples; XLA stacks the
   (128-aligned) per-block chain windows once, and each grid step is ONE
   (128, advp) x (advp, 2*QB) one-hot matmul against a host-precomputed
   selection matrix.  Missing edges travel through the matmul as finite
   +-1e30 sentinels (inf * 0 = nan would poison the dot; the 3-pass bf16
   decomposition in ops.dot_exact_b reconstructs every picked f32 value
   exactly) and are restored to +-inf afterwards.

3. the interval selection / linear interp tail is shared with the XLA twin
   (f0.events.interval_select) — bitwise the same arithmetic.

Semantics match batched_interval_interp exactly (same chain reductions, same
sampling indices ``floor(q*pnum/qden) - margin`` with edge clipping, same
selection arithmetic).
"""
from fractions import Fraction
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dot_exact_b, on_tpu

_BLK = 8            # signal rows per chains-kernel tile
_RBLK = 128         # packed chain rows per sampling-kernel tile (MXU M dim)
_N_PREV = 4
_N_NEXT = 5
_NCH = _N_PREV + _N_NEXT
_BIG = 1e30         # finite missing-edge sentinel (matmul-safe)


def _shift_fwd(v, s, fill):
    """v shifted right by s along the last axis, first s columns = fill."""
    rolled = pltpu.roll(v, s, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col < s, fill, rolled)


def _shift_rev(v, s, fill):
    n = v.shape[-1]
    rolled = pltpu.roll(v, n - s, axis=1)    # circular left-shift by s
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


def _chains_kernel(x_ref, out_ref, m_ref):
    """9 edge chains for a (BLK, n) tile -> out (NCH, BLK, n+2), each chain
    left-padded with two copies of its first value (the sampler's margin-2 /
    margin-1 left clip becomes a plain lookup)."""
    dtype = x_ref.dtype
    x = x_ref[:]                                         # (BLK, n)
    neg = jnp.asarray(-_BIG, dtype)
    pos = jnp.asarray(_BIG, dtype)
    x_next = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    mask = (x_next * x < 0) & (x_next < x)
    col1 = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + 1).astype(dtype)
    den = x_next - x
    fine = col1 - x / jnp.where(den == 0, jnp.ones((), dtype), den)

    cur = _cummax(jnp.where(mask, fine, neg), neg)
    prev_chain = [cur]
    for _ in range(_N_PREV - 1):
        cur = _cummax(jnp.where(mask, _shift_fwd(cur, 1, neg), neg), neg)
        prev_chain.append(cur)
    chains = prev_chain[::-1]                            # ascending P4..P1
    cur = -_cummax(jnp.where(mask, -fine, neg), neg, reverse=True)
    chains.append(cur)
    for _ in range(_N_NEXT - 1):
        at_cross = jnp.where(mask, _shift_rev(cur, 1, pos), pos)
        cur = -_cummax(-at_cross, neg, reverse=True)
        chains.append(cur)

    for c, ch in enumerate(chains):
        out_ref[c] = jnp.concatenate([ch[:, :1], ch[:, :1], ch], axis=1)
    n_edges = jnp.sum(mask.astype(jnp.int32), axis=-1, keepdims=True)
    m_ref[:] = jnp.maximum(n_edges - 1, 0)


def _sample_kernel(win_ref, oh_ref, isprev_ref, out_ref):
    full = dot_exact_b(win_ref[0], oh_ref[0])            # (RBLK, 2*QB)
    qb = out_ref.shape[2]
    out_ref[0] = jnp.where(isprev_ref[:] != 0, full[:, :qb], full[:, qb:])


def _selection_matrix(pnum, qden, Q, QB, adv, advp):
    """Host-precomputed (nB, advp, 2*QB) one-hot sampling matrix.

    Block b, local frame j (global q = b*QB + j < Q), g = (q*pnum)//qden:
    prev chains read padded index g (== chain[g-2] after the left pad,
    clipped at the start), next chains read g+1.  Columns for q >= Q stay
    all-zero so out-of-range grid blocks never touch padding garbage."""
    nB = -(-Q // QB)
    oh = np.zeros((nB, advp, 2 * QB), np.float32)
    for q in range(Q):
        b, j = divmod(q, QB)
        g = (q * pnum) // qden
        r = g - b * adv          # <= advp - 2 by the width assert; the right
        oh[b, r, j] = 1.0        # clip at chain end rides the edge padding
        oh[b, r + 1, QB + j] = 1.0
    return oh


@partial(jax.jit, static_argnames=("fs", "pnum", "qden", "Q", "interpret"))
def _interval_interp_pallas(x, tq, fs, pnum, qden, Q, interpret=False):
    from ..f0.events import interval_select

    S, n = x.shape
    dtype = x.dtype
    pad = (-S) % _BLK
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Sp = S + pad
    L = n + 2

    chains, m = pl.pallas_call(
        _chains_kernel,
        grid=(Sp // _BLK,),
        in_specs=[
            pl.BlockSpec((_BLK, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_NCH, _BLK, L), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((_NCH, Sp, L), dtype),
                   jax.ShapeDtypeStruct((Sp, 1), jnp.int32)],
        # the (9, 8, n) chains tile + working set tops the default 16M
        # scoped-vmem budget; v5e has 128M of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(x)

    # QB a multiple of qden => consecutive QB-frame blocks advance by exactly
    # adv samples; each block reads a width-advp 128-aligned chain window
    QB = qden * max(1, -(-128 // qden))
    adv = (QB * pnum) // qden
    nB = -(-Q // QB)
    width = ((QB - 1) * pnum) // qden + 4   # > max one-hot row index + 1
    advp = -(-width // 128) * 128

    R = _NCH * Sp
    packed = chains.reshape(R, L)
    rpad = (-R) % _RBLK
    if rpad:
        packed = jnp.pad(packed, ((0, rpad), (0, 0)))
    Rp = R + rpad
    lpad = (nB - 1) * adv + advp - L
    if lpad > 0:
        packed = jnp.pad(packed, ((0, 0), (0, lpad)), mode="edge")
    # (nB, Rp, advp) stacked per-block windows — nB static XLA slices
    windows = jnp.stack([jax.lax.slice(packed, (0, b * adv),
                                       (Rp, b * adv + advp))
                         for b in range(nB)])

    oh = jnp.asarray(_selection_matrix(pnum, qden, Q, QB, adv, advp),
                     dtype=dtype)
    is_prev = np.zeros((Rp, 1), np.float32)
    is_prev[: _N_PREV * Sp] = 1.0
    is_prev = jnp.asarray(is_prev, dtype=dtype)

    sampled = pl.pallas_call(
        _sample_kernel,
        grid=(nB, Rp // _RBLK),
        in_specs=[
            pl.BlockSpec((1, _RBLK, advp), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, advp, 2 * QB), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RBLK, 1), lambda b, r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _RBLK, QB), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nB, Rp, QB), dtype),
        interpret=interpret,
    )(windows, oh, is_prev)

    E = (sampled.transpose(1, 0, 2).reshape(Rp, nB * QB)[:R, :Q]
         .reshape(_NCH, Sp, Q).transpose(1, 2, 0)[:S])
    E = jnp.where(E <= -1e29, jnp.asarray(-np.inf, dtype),
                  jnp.where(E >= 1e29, jnp.asarray(np.inf, dtype), E))
    out = interval_select(E, tq, fs, _N_PREV)
    return out, m[:S, 0]


def interval_interp(signals, fs, t_frames, stride_samples: float):
    """(f0 (S, Q), n_intervals (S,)) — crossing intervals linearly
    interpolated at the uniform frame grid.  Dispatches to the fused Pallas
    kernels on TPU, to f0.events.batched_interval_interp elsewhere."""
    frac = Fraction(float(stride_samples)).limit_denominator(1000)
    if on_tpu() and float(stride_samples) >= 4.0:
        return _interval_interp_pallas(signals, t_frames, float(fs),
                                       int(frac.numerator),
                                       int(frac.denominator),
                                       int(t_frames.shape[0]))
    from ..f0.events import batched_interval_interp

    return batched_interval_interp(signals, fs, t_frames, stride_samples)
