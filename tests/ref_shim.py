"""Compatibility shim to run the NumPy reference (/root/reference) on a modern stack.

The reference pins numpy 1.14 / scipy 1.1 / numba 0.37 / cython 0.27
(reference requirements.txt) and uses APIs removed since then.  This module
installs identity-decorator stand-ins and missing aliases, then imports the
reference package.  Algorithms are untouched; this exists ONLY so golden
outputs can be generated for parity tests.  None of this code ships in the
framework itself.
"""
import sys
import types

import numpy as np
import scipy.signal as _ss

_installed = False


def install():
    global _installed
    if _installed:
        return
    _installed = True

    # --- fake numba (identity jit) -------------------------------------
    numba = types.ModuleType("numba")

    def _jit(*args, **kwargs):
        # used as @numba.jit((sig,), nopython=True, cache=True)
        def deco(f):
            return f

        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return deco

    class _TypeStub:
        def __getitem__(self, item):
            return self

        def __call__(self, *a, **k):
            return self

    numba.jit = _jit
    numba.njit = _jit
    numba.float64 = _TypeStub()
    numba.int64 = _TypeStub()
    sys.modules.setdefault("numba", numba)

    # --- fake cython ----------------------------------------------------
    cython = types.ModuleType("cython")

    def _locals(**kwargs):
        def deco(f):
            return f

        return deco

    cython.locals = _locals
    cython.int = int
    cython.boundscheck = _locals
    cython.wraparound = _locals
    sys.modules.setdefault("cython", cython)

    # --- removed numpy/scipy aliases -----------------------------------
    if not hasattr(np, "int"):
        np.int = int  # np.int removed in numpy 1.24
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(_ss, "hanning"):
        _ss.hanning = _ss.windows.hann  # removed in scipy 1.13
    import numpy.matlib  # noqa: F401  (deprecated; used by swipe)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def reference_world():
    """Import and return the shimmed reference `world` package."""
    install()
    import world  # noqa

    return world


def sequential_refine(harvest_mod):
    """Monkeypatch harvest.RefineCandidates to skip the mp.Pool (1-CPU box).

    Identical math — the reference keeps the sequential branch dead at
    harvest.py:144-149; we use that path to avoid fork/pickle overhead.
    """
    import numpy as _np

    def RefineCandidates(x, fs, temporal_positions, f0_candidates, f0_floor, f0_ceil):
        N, f = f0_candidates.shape
        new_f0 = _np.zeros((N, f))
        score = _np.zeros((N, f))
        for i in range(f):
            for j in range(N):
                new_f0[j, i], score[j, i] = harvest_mod.GetRefinedF0(
                    x, fs, temporal_positions[i], f0_candidates[j, i], f0_floor, f0_ceil
                )
        return new_f0, score

    harvest_mod.RefineCandidates = RefineCandidates
