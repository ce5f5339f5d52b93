"""Fused zero-crossing interval extraction (the dio/harvest event engine).

The XLA path (f0.events.batched_interval_interp) builds 9 dense
"k-th previous / next crossing" arrays per signal row via blocked running-max
scans — ~18 full-size HBM passes per call.  This module runs the WHOLE
pipeline as ONE Pallas kernel per (row-tile, full-length) VMEM tile:

1. **chains** — crossing mask + sub-sample edge positions -> 4 previous-edge
   + 5 next-edge running max/min chains via log-doubling rolls, entirely in
   VMEM.  Each chain is a two-level scan: log2(_LB) local doubling rounds
   plus a cross-block prefix on per-block maxima obtained by a lane-dim
   reshape + max-reduce (exact — max is order-independent).

2. **sampling** — the chains are read at the uniform frame grid (rational
   stride ``pnum/qden`` samples per frame).  With ``QB`` a multiple of
   ``qden``, consecutive QB-frame blocks advance by exactly
   ``adv = QB*pnum/qden`` samples, so sampling block ``b`` is a STATIC
   window slice of the packed chains followed by one
   (NCH*blk, advp) x (advp, 2*QB) one-hot matmul against a host-precomputed
   selection matrix.  Missing edges travel through the matmul as finite
   +-1e30 sentinels (inf * 0 = nan would poison the dot; the 3-pass bf16
   decomposition in ops.dot_exact_b reconstructs every picked f32 value
   exactly) and are restored to +-inf afterwards.

3. **interval selection / linear interp** — same arithmetic as the XLA twin
   (f0.events.interval_select), evaluated per block while the samples are
   still in VMEM.

Fusing all three stages means HBM only ever sees the input signals
(~signal-size) and the per-frame interpolants (~rows x frames) — an earlier
two-kernel split materialized every per-block chain window (~100x the
input) between the kernels and was HBM-bound.

Semantics match batched_interval_interp exactly (same chain reductions, same
sampling indices ``floor(q*pnum/qden) - margin`` with edge clipping, same
selection arithmetic).
"""
import os
from fractions import Fraction
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dot_exact_b, on_tpu

_BLK = 8            # fallback signal rows per chains-kernel tile (see _pick_blk)
_RBLK = 128         # packed chain rows per sampling-kernel tile (MXU M dim)
_N_PREV = 4
_N_NEXT = 5
_NCH = _N_PREV + _N_NEXT
_BIG = 1e30         # finite missing-edge sentinel (matmul-safe)


def _shift_fwd(v, s, fill, col):
    """v shifted right by s along the last axis, first s columns = fill.

    roll + masked select; a concatenate-based shift (head fill + static
    slice) was tried r5 and crashes Mosaic on unaligned widths ("offset
    mismatch on non-concat dimension")."""
    rolled = pltpu.roll(v, s, axis=1)
    return jnp.where(col < s, fill, rolled)


def _shift_rev(v, s, fill, col):
    n = v.shape[-1]
    rolled = pltpu.roll(v, n - s, axis=1)    # circular left-shift by s
    return jnp.where(col >= n - s, fill, rolled)


def _cummax(v, neg, col, reverse=False):
    n = v.shape[-1]
    s = 1
    while s < n:
        v = jnp.maximum(v, _shift_rev(v, s, neg, col) if reverse
                        else _shift_fwd(v, s, neg, col))
        s *= 2
    return v


# lane-block size of the two-level cummax and frames-per-sampling-block
# target.  Both knobs are bitwise-neutral (block maxima are exact max
# reorderings; sampling picks exactly one window entry per column), so the
# env overrides exist for on-device tuning sweeps (tools/
# profile_event_kernel.py) without perturbing results.
_LB = int(os.environ.get("WORLD_TPU_EVENT_LB", "512"))


def _cummax_2l(v, neg, col, col2, reverse=False):
    """Running max via local doubling rounds (window _LB) + a tiny
    cross-block prefix: block maxima come from a lane-dim reshape +
    max-reduce of the RAW input (max over a block is direction- and
    order-independent, so this is bitwise-identical to scanning), the
    exclusive cross-block prefix runs on the small (R, n_blocks) array,
    and the broadcast back to lanes is a reshape of a minor-dim broadcast.

    An earlier version extracted/re-broadcast the block array with exact
    one-hot MXU matmuls — at R = blk = 16 rows those dots ran the 128x128
    systolic array at ~12% utilization and dominated the kernel's gap to
    its VPU roofline; the reshape path never touches the MXU."""
    n = v.shape[-1]
    if n <= _LB:
        return _cummax(v, neg, col, reverse)
    R = v.shape[0]
    nb2 = col2.shape[1]          # 128-lane-aligned block-array width
    padw = nb2 * _LB - n
    vp = v if not padw else jnp.concatenate(
        [v, jnp.broadcast_to(neg, (R, padw)).astype(v.dtype)], axis=1)
    blocks = jnp.max(vp.reshape(R, nb2, _LB), axis=-1)   # (R, nb2)
    s = 1
    while s < _LB:
        v = jnp.maximum(v, _shift_rev(v, s, neg, col) if reverse
                        else _shift_fwd(v, s, neg, col))
        s *= 2
    pre = _cummax(blocks, neg, col2, reverse)
    pre = (_shift_rev(pre, 1, neg, col2) if reverse  # exclusive: P_{k-1}/S_{k+1}
           else _shift_fwd(pre, 1, neg, col2))
    back = jnp.broadcast_to(pre[:, :, None], (R, nb2, _LB)) \
        .reshape(R, nb2 * _LB)[:, :n]
    return jnp.maximum(v, back)


def _select_from_samples(full, tq, fs, blk, qb):
    """Interval selection / linear interp (f0.events.interval_select,
    restated over a 9-list) on one sampled block.

    full: (NCH*blk, 2*qb) one-hot-matmul samples (prev chains valid in
    columns [0:qb], next chains in [qb:2*qb]); tq: (1, qb).  Returns
    (blk, qb) interpolated f0."""
    dtype = full.dtype
    pos_inf = jnp.asarray(np.inf, dtype)
    neg_inf = jnp.asarray(-np.inf, dtype)
    E = []
    for c in range(_NCH):
        sl = full[c * blk : (c + 1) * blk]
        e = sl[:, :qb] if c < _N_PREV else sl[:, qb:]
        e = jnp.where(e <= -1e29, neg_inf,
                      jnp.where(e >= 1e29, pos_inf, e))  # sentinel -> inf
        E.append(e)

    T = tq * fs
    valid = [jnp.isfinite(e) for e in E]
    one = jnp.ones((), dtype)
    mids, f0s, mid_valid = [], [], []
    for i in range(_NCH - 1):
        mids.append((E[i] + E[i + 1]) / 2.0)
        d = E[i + 1] - E[i]
        f0s.append(fs / jnp.where(d <= 0, one, d))
        mid_valid.append(valid[i] & valid[i + 1])

    def isum(parts):
        acc = parts[0].astype(jnp.int32)
        for p in parts[1:]:
            acc = acc + p.astype(jnp.int32)
        return acc

    left_invalid = isum([~v for v in valid[:_N_PREV]])
    v_count = isum(mid_valid)
    raw_cnt = isum([mv & (m <= T) for mv, m in zip(mid_valid, mids)]) \
        + left_invalid
    hi_v = left_invalid + jnp.maximum(v_count, 2) - 1
    j = jnp.clip(raw_cnt - 1, left_invalid, hi_v - 1)

    def sel(parts, jj):
        out = parts[0]
        for i in range(1, len(parts)):
            out = jnp.where(jj == i, parts[i], out)
        return out

    x0 = sel(mids, j) / fs
    x1 = sel(mids, j + 1) / fs
    y0 = sel(f0s, j)
    y1 = sel(f0s, j + 1)
    dx = x1 - x0
    return y0 + (y1 - y0) / jnp.where(dx == 0, one, dx) * (tq - x0)


def _event_kernel(x_ref, oh_ref, tq_ref,
                  out_ref, m_ref, *, fs, nB, adv, advp):
    """The full event engine for a (blk, n) signal tile: 9 edge chains, then
    per frame-block one-hot sampling + interval interp, all in VMEM.  Each
    chain is left-padded with two copies of its first value (the sampler's
    margin-2 / margin-1 left clip becomes a plain lookup) and
    right-edge-padded so window reads past the end see the final chain value
    (the right clip)."""
    dtype = x_ref.dtype
    x = x_ref[:]                                         # (blk, n)
    blk = x.shape[0]
    neg = jnp.asarray(-_BIG, dtype)
    pos = jnp.asarray(_BIG, dtype)
    x_next = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    mask = (x_next * x < 0) & (x_next < x)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)  # hoisted: the
    col1 = (col + 1).astype(dtype)    # shift edge masks reuse one iota
    den = x_next - x
    fine = col1 - x / jnp.where(den == 0, jnp.ones((), dtype), den)

    # cross-block array width: pad up to a 128-lane multiple once it spans
    # more than one vreg — Mosaic compiles rolls on odd multi-vreg widths
    # pathologically slowly (the r4 "_LB < 512 crash"); the pad blocks are
    # neg-filled so they never perturb real lanes
    nb2 = -(-x.shape[1] // _LB)
    if nb2 > 128:
        nb2 = -(-nb2 // 128) * 128
    col2 = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], nb2), 1)

    def cmx(v, reverse=False):
        return _cummax_2l(v, neg, col, col2, reverse=reverse)

    cur = cmx(jnp.where(mask, fine, neg))
    prev_chain = [cur]
    for _ in range(_N_PREV - 1):
        cur = cmx(jnp.where(mask, _shift_fwd(cur, 1, neg, col), neg))
        prev_chain.append(cur)
    chains = prev_chain[::-1]                            # ascending P4..P1
    cur = -cmx(jnp.where(mask, -fine, neg), reverse=True)
    chains.append(cur)
    for _ in range(_N_NEXT - 1):
        at_cross = jnp.where(mask, _shift_rev(cur, 1, pos, col), pos)
        cur = -cmx(-at_cross, reverse=True)
        chains.append(cur)

    n = x.shape[1]
    L = n + 2
    lpad = max(0, (nB - 1) * adv + advp - L)
    packed = jnp.concatenate(
        [jnp.concatenate([ch[:, :1], ch[:, :1], ch], axis=1)
         for ch in chains], axis=0)                      # (NCH*blk, L)
    if lpad:
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(packed[:, -1:], (packed.shape[0],
                                                       lpad))], axis=1)
    qb = out_ref.shape[2]
    for b in range(nB):
        win = packed[:, b * adv : b * adv + advp]        # static slice
        full = dot_exact_b(win, oh_ref[b])               # (NCH*blk, 2*qb)
        out_ref[b] = _select_from_samples(full, tq_ref[b, :1, :], fs, blk, qb)
    n_edges = jnp.sum(mask.astype(jnp.int32), axis=-1, keepdims=True)
    m_ref[:] = jnp.maximum(n_edges - 1, 0)


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


def _vmem_estimate(blk, n, nB, advp, qb):
    """Conservative fused-kernel VMEM footprint (bytes): dense per-row
    arrays + packed chains + the full bf16 selection matrix + per-block
    sampling/selection temporaries."""
    dense = 14 * 4 * n * blk
    packed = _NCH * 4 * blk * (n + 2)
    oh = nB * advp * 2 * qb * 2
    outblk = 2 * nB * blk * qb * 4
    samp = 8 * _NCH * blk * 2 * qb * 4
    return dense + packed + oh + outblk + samp


def _pick_blk(n, nB, advp, qb):
    """Largest tile height whose footprint fits v5e's 128M VMEM (with
    headroom); None -> caller should use the XLA path."""
    for blk in (16, 8):
        if _vmem_estimate(blk, n, nB, advp, qb) <= 115 * 2 ** 20:
            return blk
    return None


_QBT = int(os.environ.get("WORLD_TPU_EVENT_QBT", "64"))


def _qb_params(pnum, qden, Q):
    """Sampling-block geometry.  QB must be a multiple of qden so every
    block advances by an integral adv samples; the one-hot matmul's flop
    count is ~ Q * stride * QB (the window K-dim advp grows with QB), so
    QB is kept near _QBT rather than maximized — 2*QB >= 128 keeps the MXU
    N-dim full.  Changing QB is bitwise-neutral: each output column picks
    exactly one window entry per chain (plus exact zeros), so block
    geometry never perturbs a sampled value."""
    QB = qden * max(1, -(-_QBT // qden))
    adv = (QB * pnum) // qden
    nB = -(-Q // QB)
    width = ((QB - 1) * pnum) // qden + 4   # > max one-hot row index + 1
    advp = -(-width // 128) * 128
    return QB, adv, nB, advp


@partial(jax.jit, static_argnames=("fs", "pnum", "qden", "Q", "blk",
                                   "interpret"))
def _interval_interp_pallas(x, tq, fs, pnum, qden, Q, blk=_BLK,
                            interpret=False):
    S, n = x.shape
    dtype = x.dtype
    pad = (-S) % blk
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Sp = S + pad

    QB, adv, nB, advp = _qb_params(pnum, qden, Q)

    mdt = jnp.bfloat16 if dtype == jnp.float32 else dtype
    oh = jnp.asarray(_selection_matrix(pnum, qden, Q, QB, adv, advp),
                     dtype=mdt)
    # frame-grid blocks with replicated sublanes: (nB, 8, QB) keeps the
    # block shape aligned for Mosaic
    tq_b = jnp.broadcast_to(
        jnp.pad(tq, (0, nB * QB - Q)).reshape(nB, 1, QB), (nB, 8, QB))
    event_kernel = partial(_event_kernel, fs=fs, nB=nB, adv=adv, advp=advp)
    sampled, m = pl.pallas_call(
        event_kernel,
        grid=(Sp // blk,),
        in_specs=[
            pl.BlockSpec((blk, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nB, advp, 2 * QB), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nB, 8, QB), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nB, blk, QB), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nB, Sp, QB), dtype),
                   jax.ShapeDtypeStruct((Sp, 1), jnp.int32)],
        # full-length chains + the selection matrix top the default 16M
        # scoped-vmem budget; v5e has 128M of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(x, oh, tq_b)

    out = sampled.transpose(1, 0, 2).reshape(Sp, nB * QB)[:S, :Q]
    return out, m[:S, 0]


def interval_interp(signals, fs, t_frames, stride_samples: float):
    """(f0 (S, Q), n_intervals (S,)) — crossing intervals linearly
    interpolated at the uniform frame grid.  Dispatches to the fused Pallas
    kernels on TPU, to f0.events.batched_interval_interp elsewhere."""
    frac = Fraction(float(stride_samples)).limit_denominator(1000)
    if on_tpu() and float(stride_samples) >= 4.0:
        pnum, qden = int(frac.numerator), int(frac.denominator)
        Q = int(t_frames.shape[0])
        n = int(signals.shape[1])
        QB, _, nB, advp = _qb_params(pnum, qden, Q)
        blk = _pick_blk(n, nB, advp, QB)
        if blk is not None:
            return _interval_interp_pallas(signals, t_frames, float(fs),
                                           pnum, qden, Q, blk=blk)
    from ..f0.events import batched_interval_interp

    return batched_interval_interp(signals, fs, t_frames, stride_samples)
