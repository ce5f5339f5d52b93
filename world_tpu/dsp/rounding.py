"""MATLAB-compatible rounding primitives.

The reference implements half-away-from-zero rounding as a numba kernel
copy-pasted into 8 modules (e.g. /root/reference/world/harvest.py:154-165);
here it is one vectorized jnp expression shared by everything.
"""
import jax.numpy as jnp


def matlab_round_half(x):
    """The reference's round_matlab verbatim semantics: x+0.5 (x>0) / x-0.5.

    NB the reference's kernel does NOT truncate (harvest.py:154-165) — callers
    truncate via astype(int) where they index, but several sites use the
    half-offset FLOAT directly (stonemask window times, harvest GetRefinedF0
    window times, seed periods).  Use this where bit-parity with those sites
    matters; use :func:`round_matlab` where the value is immediately
    truncated to an index.
    """
    x = jnp.asarray(x)
    return jnp.where(x > 0, x + 0.5, x - 0.5)


def round_matlab(x):
    """Round half away from zero, returning an integer-valued float array.

    Matches ``round_matlab(x).astype(int)`` in the reference (the reference
    returns x±0.5 and lets callers truncate; floor(x+0.5) for x>0 and
    ceil(x-0.5) for x<=0 are identical to that truncation).
    """
    x = jnp.asarray(x)
    return jnp.where(x > 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def round_half_even_decimals(x, decimals):
    """float("{:.Nf}".format(x)) equivalent: round to N decimals, ties-to-even.

    Used by dio's contour fixer (/root/reference/world/dio.py:243) and
    stonemask's base-time quantization (/root/reference/world/stonemask.py:38).
    """
    s = 10.0 ** decimals
    return jnp.round(jnp.asarray(x) * s) / s
