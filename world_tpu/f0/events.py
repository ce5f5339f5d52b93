"""Zero-crossing interval extraction + interpolation, batched & gather-free.

Replaces the per-band ZeroCrossingEngine + scipy interp1d pipeline of
dio/harvest (/root/reference/world/dio.py:137-185, harvest.py:265-271,
499-529).  TPU v5e executes arbitrary gathers at only ~60M elem/s, so this
path uses none:

  * crossing sub-sample edges are dense elementwise arrays;
  * "k-th previous / next edge around a sample" uses the monotonicity of
    edge positions: neighboring edges come from blocked cummax scans
    (log-round shift-max inside blocks — XLA's stock cummax is slow);
  * sampling the dense arrays at the uniform frame grid exploits the
    rational frame stride (samples/frame = num/den): it decomposes into
    `den` static strided slices — pure slicing, no gather;
  * the exact interpolation interval is selected from 9 candidate edges by
    comparing their midpoints to the query (windowed correction, exact even
    under ±1 rounding slop of the sample positions).

Matches interp1d(locations, interval_f0, fill_value='extrapolate') on the
reference's event lists.
"""
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np


def _blocked_cummax(x, block: int = 256, reverse: bool = False):
    """Inclusive running max along the last axis via in-block shift-max
    rounds + a tiny cross-block prefix."""
    if reverse:
        return _blocked_cummax(x[..., ::-1], block)[..., ::-1]
    n = x.shape[-1]
    pad = (-n) % block
    neg = jnp.asarray(-np.inf, x.dtype)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=neg)
    nb = xp.shape[-1] // block
    b = xp.reshape(x.shape[:-1] + (nb, block))
    s = 1
    while s < block:
        shifted = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(s, 0)],
                          constant_values=neg)[..., :block]
        b = jnp.maximum(b, shifted)
        s *= 2
    totals = b[..., -1]
    offsets = jax.lax.cummax(totals, axis=totals.ndim - 1)
    offsets = jnp.concatenate([jnp.full(offsets.shape[:-1] + (1,), neg, x.dtype),
                               offsets[..., :-1]], axis=-1)
    return jnp.maximum(b, offsets[..., None]).reshape(xp.shape)[..., :n]


def _shift_right(x, fill):
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]], axis=-1)


def _shift_left(x, fill):
    return jnp.concatenate(
        [x[..., 1:], jnp.full(x.shape[:-1] + (1,), fill, x.dtype)], axis=-1)


def _strided_sample(dense, stride_samples: float, n_frames: int,
                    left_margin: int):
    """dense[..., max(0, floor(q * stride) - left_margin)] for q=0..Q-1 via
    static strided slices (the stride is rational with a small denominator)."""
    n = dense.shape[-1]
    frac = Fraction(stride_samples).limit_denominator(1000)
    pnum, qden = frac.numerator, frac.denominator
    a_count = n_frames // qden + 2
    max_idx = (a_count - 1) * pnum + (qden - 1) * pnum // qden + 1
    pad_right = max(0, max_idx + left_margin + 2 - n)
    dp = jnp.pad(dense, [(0, 0)] * (dense.ndim - 1)
                 + [(left_margin, pad_right)], mode="edge")
    cols = []
    for bres in range(qden):
        c_b = (bres * pnum) // qden
        sl = dp[..., c_b : c_b + a_count * pnum : pnum][..., :a_count]
        cols.append(sl)
    grid = jnp.stack(cols, axis=-1)             # (..., a_count, qden)
    flat = grid.reshape(dense.shape[:-1] + (a_count * qden,))
    return flat[..., :n_frames]


def batched_interval_interp(signals, fs, t_frames, stride_samples: float,
                            n_prev: int = 4, n_next: int = 5):
    """For each row: negative-going crossings -> interval (location, f0)
    lists -> linear interp (with end-slope extrapolation) at ``t_frames``
    (a uniform grid with ``stride_samples`` samples per frame).
    Returns (f0 (S, Q), n_intervals (S,)).
    """
    x = signals
    S, n = x.shape
    dtype = x.dtype
    neg = jnp.asarray(-np.inf, dtype)
    pos_inf = jnp.asarray(np.inf, dtype)
    n_frames = t_frames.shape[0]

    x_next = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    mask = (x_next * x < 0) & (x_next < x)
    idx1 = jnp.arange(1, n + 1, dtype=dtype)
    den = x_next - x
    fine = idx1[None, :] - x / jnp.where(den == 0, 1.0, den)

    # previous edges (P1 = last edge at pos <= p, P2 one before, ...):
    # fine is strictly increasing over crossings -> running max
    P = []
    cur = _blocked_cummax(jnp.where(mask, fine, neg))
    P.append(cur)
    for _ in range(n_prev - 1):
        at_cross = jnp.where(mask, _shift_right(cur, neg), neg)
        cur = _blocked_cummax(at_cross)
        P.append(cur)
    # next edges via reverse running min (== -max of negated)
    Nn = []
    cur = -_blocked_cummax(jnp.where(mask, -fine, neg), reverse=True)
    Nn.append(cur)
    for _ in range(n_next - 1):
        at_cross = jnp.where(mask, _shift_left(cur, pos_inf), pos_inf)
        cur = -_blocked_cummax(-at_cross, reverse=True)
        Nn.append(cur)

    # sample the dense edge arrays: P side at p = floor(q*w)-2 (crossings at
    # pos <= p), N side at p+1 (strictly after p — both scans are inclusive)
    samp = ([_strided_sample(e, stride_samples, n_frames, 2)
             for e in P[::-1]]                 # ascending: P4..P1
            + [_strided_sample(e, stride_samples, n_frames, 1)
               for e in Nn])                   # N1..N5
    E = jnp.stack(samp, axis=-1)               # (S, Q, n_prev+n_next)
    out = interval_select(E, t_frames, fs, n_prev)

    n_edges = jnp.sum(mask, axis=-1)
    m = jnp.maximum(n_edges - 1, 0)
    return out, m


def interval_select(E, t_frames, fs, n_prev: int = 4):
    """Pick the crossing interval containing each query and linearly
    interpolate/extrapolate its f0 — shared tail of both the XLA path above
    and the fused Pallas event engine (ops.edge_interp).

    ``E`` is (S, Q, n_prev+n_next) ascending candidate edge positions in
    1-based sample units, +-inf where no such edge exists."""
    valid = jnp.isfinite(E)
    tq = t_frames[None, :]
    T = (tq * fs)[..., None]                   # query in 1-based fine units

    mids = (E[..., :-1] + E[..., 1:]) / 2.0    # (S, Q, n_mid)
    diffs = E[..., 1:] - E[..., :-1]
    f0s = fs / jnp.where(diffs <= 0, 1.0, diffs)
    mid_valid = valid[..., :-1] & valid[..., 1:]

    left_invalid = jnp.sum(~valid[..., :n_prev], axis=-1)
    v_count = jnp.sum(mid_valid, axis=-1)
    raw_cnt = jnp.sum(mid_valid & (mids <= T), axis=-1) + left_invalid
    hi_v = left_invalid + jnp.maximum(v_count, 2) - 1
    j = jnp.clip(raw_cnt - 1, left_invalid, hi_v - 1)

    def sel(arr, jj):
        out = arr[..., 0]
        for i in range(1, arr.shape[-1]):
            out = jnp.where(jj == i, arr[..., i], out)
        return out

    x0 = sel(mids, j) / fs
    x1 = sel(mids, j + 1) / fs
    y0 = sel(f0s, j)
    y1 = sel(f0s, j + 1)
    dx = x1 - x0
    return y0 + (y1 - y0) / jnp.where(dx == 0, 1.0, dx) * (tq - x0)


def four_event_interp(filtered, fs, t_frames, stride_samples: float):
    """The dio/harvest 4-event-type candidate mean for a batch of bands.

    filtered: (B, n) band-filtered signals.  Returns (mean_f0 (B, Q),
    deviation (B, Q), usable (B,)) matching get_f0_candidates /
    GetF0Candidates (dio.py:156-185, harvest.py:499-529).
    """
    from ..ops.edge_interp import interval_interp

    B, n = filtered.shape
    d = jnp.diff(filtered, axis=1)
    # pad the diff rows to length n by repeating the last value: the repeat
    # can never be a crossing (x_next == x there), every chain value and
    # every sampled index is unchanged, and all four event types become ONE
    # batched call (one fused kernel launch on TPU)
    d_pad = jnp.concatenate([d, d[:, -1:]], axis=1)
    interp, m = interval_interp(
        jnp.concatenate([filtered, -filtered, d_pad, -d_pad], axis=0),
        fs, t_frames, stride_samples)
    interps = jnp.stack([interp[:B], interp[B : 2 * B], interp[2 * B : 3 * B],
                         interp[3 * B :]])
    counts = jnp.stack([m[:B], m[B : 2 * B], m[2 * B : 3 * B], m[3 * B :]])
    usable = jnp.all(counts >= 3, axis=0)
    mean_f0 = jnp.mean(interps, axis=0)
    dev = jnp.std(interps, axis=0, ddof=1)
    zero = jnp.zeros_like(mean_f0)
    return (jnp.where(usable[:, None], mean_f0, zero),
            jnp.where(usable[:, None], dev, zero + 1000.0),
            usable)
