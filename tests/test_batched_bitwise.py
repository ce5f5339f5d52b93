"""Batched-vs-single-stream determinism: vmapping the pipeline must not
change any row's DECISIONS, and the decimator — the one recurrence whose
drift could flip them — must be bitwise shape-stable.

Round 2 measured ~1-ulp drift between the (n,) and (B, n) programs (FMA
contraction placement is shape- and context-dependent under the
environment-pinned --xla_allow_excess_precision=true), which flipped zero
crossings sitting within 1 ulp of 0 and grew into whole voiced-section
changes.  Round 4 fixed the root: `linear_recurrence` runs every batch row
through the SAME barrier-isolated program shape the single-stream call
compiles (dsp/iir.py custom_vmap rule), making the decimators bitwise
identical under vmap.  Downstream stages still carry last-ulp VALUE noise
from batched-vs-plain dot_general association on CPU; the assertions below
pin what correctness requires: bitwise-equal decisions (vuv), bitwise
decimators, and f0 values equal to ~1 ulp with no voicing flips.
"""
import jax
import jax.numpy as jnp
import numpy as np


def test_decimators_batched_bitwise(mwm):
    from world_tpu.dsp.iir import decimate_matlab, decimate_world

    fs, x = mwm
    x = x[: int(fs)].astype(np.float32)
    xj = jnp.asarray(x)
    xb = jnp.asarray(np.stack([x] * 3))
    for name, fn in (("harvest decimator (cheby1 filtfilt, q=2)",
                      lambda z: decimate_matlab(z, 2)),
                     ("dio decimator (WORLD IIR, r=5)",
                      lambda z: decimate_world(z, 5))):
        s = np.asarray(jax.jit(fn)(xj))
        b = np.asarray(jax.jit(jax.vmap(fn))(xb))
        for i in range(3):
            n_diff = int(np.sum(s != b[i]))
            assert n_diff == 0, f"{name}: row {i} differs in {n_diff} elems"


def test_encode_decode_batched_decisions_equal(mwm):
    from world_tpu.parallel.batch import _encode_decode_one
    from world_tpu.synth.seeds import get_seeds_signals

    fs, x = mwm
    fs = int(fs)
    x = x[:fs].astype(np.float32)  # 1 s slice keeps CPU compile bounded

    seeds = get_seeds_signals(fs)
    pulse = jnp.asarray(np.asarray(seeds["pulse"], np.float32))
    noise = jnp.asarray(np.asarray(seeds["noise"], np.float32))
    n_bands = int(np.ceil(np.log2((800 * 1.1) / (71 * 0.9)) * 40))
    mc = int(n_bands / 10 + 0.5)

    def one(xi):
        return _encode_decode_one(xi, pulse, noise, fs=fs, frame_period=5,
                                  max_pulses=2048, max_candidates=mc,
                                  max_sections=256)

    single = jax.jit(one)(jnp.asarray(x))
    xb = jnp.asarray(np.stack([x] * 3))
    batched = jax.jit(jax.vmap(one))(xb)

    s_vuv = np.asarray(single["vuv"])
    s_f0 = np.asarray(single["f0"], np.float64)
    s_y = np.asarray(single["y"], np.float64)
    for i in range(3):
        # decisions: bitwise
        assert (s_vuv == np.asarray(batched["vuv"][i])).all(), \
            f"row {i}: vuv decisions flipped under vmap"
        b_f0 = np.asarray(batched["f0"][i], np.float64)
        assert ((s_f0 > 0) == (b_f0 > 0)).all(), f"row {i}: f0 voicing flips"
        # values: last-ulp dot-association noise only
        d = np.abs(s_f0 - b_f0)
        assert d.max() < 1e-3, f"row {i}: f0 drift {d.max():.2e} Hz"
        # waveform: a 1-ulp f0 difference can move a synthesis pulse
        # boundary by one sample (pulse placement is a step function of
        # the f0 cumsum), so pointwise drift is spiky by construction —
        # bound the relative energy of the difference instead
        # the bar is a smoke bound, not a precision claim: each shifted
        # pulse contributes ~one pulse of energy to the difference, so a
        # handful of boundary flips lands ~1e-2 (measured 1.14e-2 on this
        # fixture after r5's window change — benign, decisions above are
        # bitwise); 3e-2 still catches real divergence (wrong pulses
        # everywhere measures O(1))
        dy = s_y - np.asarray(batched["y"][i], np.float64)
        rel = np.sqrt(np.sum(dy ** 2) / max(np.sum(s_y ** 2), 1e-30))
        assert rel < 3e-2, f"row {i}: waveform rel-L2 drift {rel:.2e}"
