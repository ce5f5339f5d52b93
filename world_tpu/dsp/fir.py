"""FIR filtering as im2col matmuls (MXU path).

The reference implements its band filters as full-signal-length FFT products
(/root/reference/world/dio.py:87, harvest.py:259-261).  On TPU, XLA's large
1-D FFTs are slow while matmuls are nearly free, and the filters are short
(<= ~500 taps): the exact same linear convolution is an (n, L) x (L, B)
matmul over statically-sliced shifted copies of the signal.
"""
import jax
import jax.numpy as jnp
import numpy as np


def fir_bank_full(y, bank):
    """Full linear convolution of ``y`` with every row of ``bank``.

    y: (n,); bank: (B, L) [host or device].  Returns (B, n+L-1) with
    out[b, k] = sum_j bank[b, j] * y[k - j]  — identical to the reference's
    zero-padded FFT products on their linear-convolution support.
    """
    y = jnp.asarray(y)
    bank = jnp.asarray(bank, dtype=y.dtype)
    n = y.shape[0]
    L = bank.shape[1]
    ypad = jnp.pad(y, (L - 1, L - 1))
    # cols[k, j] = y[k - j] for k in [0, n+L-1)
    cols = jnp.stack([ypad[L - 1 - j : L - 1 - j + n + L - 1]
                      for j in range(L)], axis=1)
    # HIGHEST: under vmap XLA otherwise picks a reduced-precision batched
    # matmul (measured 2e-2 drift vs the single-stream result, which
    # perturbs zero-crossing times and cascades into the F0 candidates)
    return jnp.einsum("kj,bj->bk", cols, bank,
                      preferred_element_type=y.dtype,
                      precision=jax.lax.Precision.HIGHEST)
