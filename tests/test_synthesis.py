"""Golden parity tests for classic synthesis.

The golden waveform was generated with the reference's deterministic-noise
variant (noise = const 0.1, whose mean-removal zeroes the aperiodic part),
making the periodic path bit-comparable.  The stochastic path is covered by
a statistical test.
"""
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def dat():
    src = np.load(GOLDEN / "source_dio.npz")
    ct = np.load(GOLDEN / "cheaptrick.npz")
    d4 = np.load(GOLDEN / "d4c.npz")
    return {
        "f0": d4["f0_after_mutation"],
        "vuv": src["vuv"],
        "temporal_positions": src["temporal_positions"],
        "spectrogram": ct["spectrogram"],
        "aperiodicity": d4["aperiodicity"],
        "fs": 22050,
    }


def test_pulse_positions_match(dat):
    from world_tpu.synth.classic import _time_base, _synthesis_core  # noqa
    import jax.numpy as jnp
    from world_tpu.dsp.interp import interp1_extrap  # noqa

    g = np.load(GOLDEN / "synthesis.npz")
    fs = dat["fs"]
    tp = dat["temporal_positions"]
    y_len = len(np.arange(tp[0], tp[-1] + 1 / fs, 1 / fs))
    time_axis = jnp.arange(y_len, dtype=jnp.float64) / fs + tp[0]
    pl, pli, shift, vuv_i, count, _raw = _time_base(
        jnp.asarray(tp), jnp.asarray(dat["f0"]), jnp.asarray(dat["vuv"]),
        float(fs), time_axis, 500.0, 4096)
    cnt = int(count)
    # XLA's cumsum is a tree reduction (1e-14 relative vs numpy's sequential
    # sum), so a small fraction of phase-wrap boundaries can shift by one
    # sample — accepted divergence, checked to be rare and tiny here.
    assert abs(cnt - len(g["pulse_locations"])) <= 2
    m = min(cnt, len(g["pulse_locations"]))
    dloc = np.abs(np.asarray(pl)[:m] - g["pulse_locations"][:m])
    assert (dloc < 1e-12).mean() > 0.97, f"exact pulse agreement {(dloc<1e-12).mean()}"
    assert dloc.max() <= 1.5 / fs, f"max pulse offset {dloc.max()*fs} samples"
    didx = np.abs(np.asarray(pli)[:m] - g["pulse_locations_index"][:m])
    assert didx.max() <= 2


def test_deterministic_waveform_matches(dat):
    from world_tpu.synth.classic import synthesis

    g = np.load(GOLDEN / "synthesis.npz")
    y = np.asarray(synthesis(dat, dat, noise_mode="constant"))
    ref = g["y_det"]
    assert y.shape == ref.shape
    err = np.abs(y - ref)
    scale = np.abs(ref).max()
    # bitwise parity except near the ~2% of pulses whose phase-wrap sample
    # shifts by one under XLA's tree cumsum (see test_pulse_positions_match)
    frac_exact = (err < 1e-9 * max(scale, 1.0)).mean()
    assert frac_exact > 0.90, f"sample-exact fraction {frac_exact}"
    corr = np.corrcoef(y, ref)[0, 1]
    assert corr > 0.995, f"waveform correlation {corr}"


def test_gaussian_noise_statistics(dat):
    """Unvoiced-region energy should match the reference statistically."""
    from world_tpu.synth.classic import synthesis
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    import ref_shim
    ref_shim.reference_world()
    from world import synthesis as SY

    y_mine = np.asarray(synthesis(dat, dat, noise_mode="gaussian"))
    np.random.seed(0)
    d = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in dat.items()}
    y_ref = SY.synthesis(d, d)
    # compare short-time energy envelopes
    n = min(len(y_mine), len(y_ref))
    w = 1024
    e_mine = np.array([np.mean(y_mine[i:i + w] ** 2) for i in range(0, n - w, w)])
    e_ref = np.array([np.mean(y_ref[i:i + w] ** 2) for i in range(0, n - w, w)])
    ratio = (e_mine + 1e-10) / (e_ref + 1e-10)
    assert np.median(np.abs(np.log10(ratio))) < 0.2, "energy envelope mismatch"
