"""Golden parity tests for the Requiem path (d4cRequiem + synthesisRequiem)."""
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def src():
    s = np.load(GOLDEN / "source_harvest.npz")
    return {k: s[k] for k in s.files}


def test_d4c_requiem_matches(mwm, src):
    from world_tpu.aperiodicity.d4c_requiem import d4c_requiem
    from world_tpu.spectral.cheaptrick import cheaptrick

    fs, x = mwm
    g = np.load(GOLDEN / "d4c_requiem.npz")
    ct = cheaptrick(x, fs, src)
    srcd = dict(src)
    srcd["f0"] = ct["f0_effective"]
    out = d4c_requiem(x, fs, srcd)
    got = np.asarray(out["aperiodicity"])
    ref = g["band_aperiodicity"]
    assert got.shape == ref.shape
    agree = np.isclose(got, ref, rtol=1e-4, atol=1e-3)
    assert agree.mean() > 0.99, f"band ap agreement {agree.mean()}"


def test_synthesis_requiem_matches(mwm, src):
    """Full waveform parity given the REFERENCE's seeds (deterministic)."""
    from world_tpu.spectral.cheaptrick import cheaptrick
    from world_tpu.synth.requiem import synthesis_requiem

    fs, x = mwm
    g = np.load(GOLDEN / "requiem_synthesis.npz")
    gb = np.load(GOLDEN / "d4c_requiem.npz")
    ct = cheaptrick(x, fs, src)
    dat = dict(src)
    dat["aperiodicity"] = gb["band_aperiodicity"]
    dat["spectrogram"] = np.asarray(ct["spectrogram"])
    dat["fs"] = fs
    seeds = {"pulse": g["pulse_seed"], "noise": g["noise_seed"]}
    y = np.asarray(synthesis_requiem(dat, dat, seeds))
    ref = g["y"]
    assert y.shape == ref.shape
    err = np.abs(y - ref)
    scale = np.abs(ref).max()
    # envelope smoothing runs through an FFT row-shift (1e-7-relative noise)
    # and XLA's tree cumsum can move a pulse boundary by one sample
    frac_close = (err < 1e-6 * max(scale, 1e-9)).mean()
    assert frac_close > 0.99, f"sample-close fraction {frac_close}"
    corr = np.corrcoef(y, ref)[0, 1]
    assert corr > 0.999, f"waveform correlation {corr}"


def test_seed_generation_statistics():
    """Our seeded velvet noise must match the reference's statistically and
    the deterministic pulse seeds bitwise."""
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    import ref_shim
    ref_shim.reference_world()
    import random as pyrandom

    import world.get_seeds_signals as GS

    from world_tpu.synth.seeds import get_seeds_signals

    fs = 22050
    pyrandom.seed(3)
    np.random.seed(3)
    ref = GS.get_seeds_signals(fs)
    mine = get_seeds_signals(fs, seed=3)
    get_seeds_signals.cache_clear()
    p_m = np.asarray(mine["pulse"])
    p_r = ref["pulse"]
    assert p_m.shape == p_r.shape
    # bands 1..n are deterministic transforms -> bitwise-close
    np.testing.assert_allclose(p_m[:, 1:], p_r[:, 1:], atol=1e-12)
    np.testing.assert_allclose(p_m[:, 0], p_r[:, 0], atol=1e-12)
    n_m = np.asarray(mine["noise"])
    n_r = ref["noise"]
    assert n_m.shape == n_r.shape
    # velvet noise: different RNG stream -> compare band energies
    e_m = np.sqrt(np.mean(n_m ** 2, axis=0))
    e_r = np.sqrt(np.mean(n_r ** 2, axis=0))
    np.testing.assert_allclose(e_m, e_r, rtol=0.25)


@pytest.mark.slow
def test_end_to_end_requiem_api(mwm):
    from world_tpu import World

    fs, x = mwm
    vocoder = World()
    dat = vocoder.encode(fs, x, f0_method="harvest", is_requiem=True)
    assert dat["aperiodicity"].shape[0] == 4  # n_ap + 2 at 22.05 kHz
    assert dat["is_requiem"]
    dat = vocoder.decode(dat)
    y = dat["out"]
    assert np.all(np.isfinite(y))
    assert 0.01 < np.abs(y).max() <= 1.0
    n = min(len(y), len(x))
    w = 512
    e_y = np.array([np.mean(y[i:i + w] ** 2) for i in range(0, n - w, w)])
    e_x = np.array([np.mean(x[i:i + w] ** 2) for i in range(0, n - w, w)])
    corr = np.corrcoef(np.log10(e_y + 1e-9), np.log10(e_x + 1e-9))[0, 1]
    assert corr > 0.8, f"energy envelope correlation {corr}"
