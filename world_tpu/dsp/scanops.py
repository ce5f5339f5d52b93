"""TPU-fast scan/search primitives.

XLA's stock lowerings for cumsum (sequential/reduce-window) and
jnp.searchsorted ('scan' loop) are pathologically slow on TPU.  These
replacements map the same math onto what the hardware likes:

  * matmul_cumsum: blocked prefix sum — within-block prefix via a lower-
    triangular matmul (MXU), across-block offsets via a tiny cumsum.
  * searchsorted_rows: batched binary search with statically-unrolled steps
    and FLAT 1-D gathers (arbitrary 1-D gathers are fast; take_along_axis
    and lax.scan-based searches are not).
"""
import jax
import jax.numpy as jnp
import numpy as np


def matmul_cumsum(x, block: int = 256):
    """Inclusive cumsum along the last axis via triangular matmuls.

    Exact for integer-valued inputs below the dtype's integer range; for
    floats the summation order differs from sequential cumsum by blocked
    association (same class of reordering XLA's own tree cumsum performs).
    Integer inputs are computed in f32 when safe (counts < 2^24) or f64.
    """
    x = jnp.asarray(x)
    orig_dtype = x.dtype
    if jnp.issubdtype(orig_dtype, jnp.integer) or orig_dtype == jnp.bool_:
        compute = jnp.float32 if x.shape[-1] < (1 << 24) else jnp.float64
        x = x.astype(compute)
    n = x.shape[-1]
    pad = (-n) % block
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    nb = (n + pad) // block
    blocks = xp.reshape(x.shape[:-1] + (nb, block))
    tri = jnp.asarray(np.tril(np.ones((block, block))), dtype=x.dtype)
    # HIGHEST: prefix sums feed threshold decisions (d4c cumulative power,
    # candidate compaction); a DEFAULT bf16 pass here makes the batched
    # (vmapped) program drift from the single-stream one
    within = jnp.einsum("...k,jk->...j", blocks, tri,
                        preferred_element_type=x.dtype,
                        precision=jax.lax.Precision.HIGHEST)
    block_tot = within[..., -1]
    offsets = jnp.cumsum(block_tot, axis=-1) - block_tot  # tiny: nb elements
    out = (within + offsets[..., None]).reshape(xp.shape)[..., :n]
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = out.astype(orig_dtype)
    elif orig_dtype == jnp.bool_:
        out = out.astype(jnp.int32)
    return out


def searchsorted_rows(a, v, side: str = "left", n_steps: int = None):
    """Row-wise searchsorted: a (R, N) sorted rows, v (R, Q) or (Q,) queries.

    Returns (R, Q) insertion indices, identical to
    vmap(jnp.searchsorted)(a, v) but via an unrolled binary search with flat
    gathers.
    """
    a = jnp.asarray(a)
    v = jnp.asarray(v)
    R, N = a.shape
    if v.ndim == 1:
        v = jnp.broadcast_to(v[None, :], (R, v.shape[0]))
    flat = a.reshape(-1)
    row_off = (jnp.arange(R) * N)[:, None]
    if n_steps is None:
        n_steps = int(np.ceil(np.log2(N + 1)))
    lo = jnp.zeros(v.shape, jnp.int32)           # lower bound (insertion >= lo)
    hi = jnp.full(v.shape, N, jnp.int32)         # upper bound
    for _ in range(n_steps):
        mid = (lo + hi) // 2
        am = jnp.take(flat, row_off + jnp.minimum(mid, N - 1))
        go_right = (am < v) if side == "left" else (am <= v)
        go_right = go_right & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, jnp.minimum(mid, hi))
    return lo


def count_less_rows(a, q, side: str = "left"):
    """Row-wise searchsorted for SHORT rows via a compare-reduce.

    a: (R, N) sorted rows with small N; q: (Q,) or (R, Q) queries.  Counting
    elements < q (or <= q for side='right') costs R*N*Q fused compares —
    far cheaper than binary-search gathers on TPU when N is small.
    """
    a = jnp.asarray(a)
    q = jnp.asarray(q)
    if q.ndim == 1:
        q = q[None, :]
    if side == "left":
        hits = a[:, :, None] < q[:, None, :]
    else:
        hits = a[:, :, None] <= q[:, None, :]
    return jnp.sum(hits, axis=1).astype(jnp.int32)


def shift_select_rows(slab, shift, max_shift: int, width: int, radix: int = 16):
    """out[r, j] = slab[r, shift[r] + j] for per-row integer shifts in
    [0, max_shift], via a two-level radix select over static slices (a
    per-row gather would serialize on TPU).

    slab: (R, W) with W >= max_shift + width.
    """
    n_coarse = (max_shift // radix) + 1
    coarse = shift // radix
    fine = shift - coarse * radix
    mid_w = width + radix - 1
    need = (n_coarse - 1) * radix + mid_w
    if need > slab.shape[1]:
        slab = jnp.pad(slab, ((0, 0), (0, need - slab.shape[1])))
    out = slab[:, 0:mid_w]
    for c in range(1, n_coarse):
        sel = (coarse == c)[:, None]
        out = jnp.where(sel, slab[:, c * radix : c * radix + mid_w], out)
    res = out[:, 0:width]
    for fshift in range(1, radix):
        sel = (fine == fshift)[:, None]
        res = jnp.where(sel, out[:, fshift : fshift + width], res)
    return res


def select_rows_small(y, idx):
    """take_along_axis(y, idx, axis=-1) via an equality-masked sum.

    y: (..., N); idx: (..., Q) int32.  Gather-free: costs N*Q fused
    compare-select-adds per row, which beats TPU's serialized gathers
    whenever N is small (<= a few thousand).  Exact (no arithmetic on y).
    """
    y = jnp.asarray(y)
    n = y.shape[-1]
    k = jnp.arange(n, dtype=jnp.int32)
    onehot = idx[..., :, None] == k  # (..., Q, N), fused into the reduce
    return jnp.sum(jnp.where(onehot, y[..., None, :], 0), axis=-1)


def take_rows(y, idx):
    """take_along_axis(y, idx, axis=-1) via a flat 1-D gather (TPU-fast).

    y: (..., N); idx: (..., Q) int32 indices into the last axis.
    """
    y = jnp.asarray(y)
    n = y.shape[-1]
    lead = y.shape[:-1]
    flat = y.reshape(-1)
    row_off = (jnp.arange(int(np.prod(lead))) * n).reshape(lead)[..., None]
    return jnp.take(flat, row_off + idx)
