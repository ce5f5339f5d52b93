"""Overlap-add as gathers (TPU-fast) instead of scatter-adds.

The synthesizers place ~10^3-10^4 windowed responses at irregular positions
(/root/reference/world/synthesis.py:67-81, synthesisRequiem.py:59-61,99-100).
A scatter-add serializes on TPU; instead each OUTPUT sample gathers from the
(small, bounded) set of responses overlapping it: response start positions
are nondecreasing, so the overlapping set is a contiguous run of at most K
responses found with one binary search — K static, derived from the minimum
response spacing.
"""
import jax.numpy as jnp

from .scanops import searchsorted_rows


def gather_ola(responses, starts, y_length: int, K: int):
    """y[i] = sum_p responses[p, i - starts[p]] over p with 0 <= i-starts[p] < W.

    responses: (P, W); starts: (P,) int32, NONDECREASING 0-based output
    positions (invalid/padded responses must carry starts >= y_length + W and
    zero content).  K bounds how many responses can overlap one sample;
    overflow beyond K is dropped (callers size K from the minimum possible
    response spacing).  Out-of-range parts of a response are dropped (the
    reference clamps them onto the edge samples; divergence limited to the
    first/last window).
    """
    P, W = responses.shape
    i = jnp.arange(y_length, dtype=jnp.int32)
    # first response index whose window can still cover sample i
    lo = searchsorted_rows(starts[None, :], (i - W + 1)[None, :],
                           side="left")[0]
    flat = responses.reshape(-1)
    acc = jnp.zeros(y_length, responses.dtype)
    for k in range(K):
        p = jnp.minimum(lo + k, P - 1)
        s = jnp.take(starts, p)
        off = i - s
        valid = (off >= 0) & (off < W) & (lo + k < P)
        idx = p * W + jnp.clip(off, 0, W - 1)
        acc = acc + jnp.where(valid, jnp.take(flat, idx), 0.0)
    return acc
