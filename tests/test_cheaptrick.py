"""Golden parity tests for CheapTrick."""
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def ct(mwm):
    from world_tpu.spectral.cheaptrick import cheaptrick

    fs, x = mwm
    src = np.load(GOLDEN / "source_dio.npz")
    return cheaptrick(x, fs, {k: src[k] for k in src.files})


def test_spectrogram_matches(ct):
    g = np.load(GOLDEN / "cheaptrick.npz")
    ref = g["spectrogram"]
    got = np.asarray(ct["spectrogram"])
    assert got.shape == ref.shape
    # log-spectral distortion per frame (dB)
    lsd = np.sqrt(np.mean((10 * np.log10(got) - 10 * np.log10(ref)) ** 2, axis=0))
    assert np.median(lsd) < 0.01, f"median LSD {np.median(lsd)} dB"
    assert lsd.max() < 0.3, f"max LSD {lsd.max()} dB"


def test_f0_mutation_contract(ct):
    g = np.load(GOLDEN / "cheaptrick.npz")
    np.testing.assert_allclose(np.asarray(ct["f0_effective"]), g["f0_after_mutation"])


def test_ps_spectrogram_matches(ct):
    g = np.load(GOLDEN / "cheaptrick.npz")
    ref = g["ps_spectrogram_abs"]
    got = np.abs(np.asarray(ct["ps spectrogram"])).astype(np.float32)
    assert got.shape == ref.shape
    denom = np.maximum(np.abs(ref), 1e-6)
    rel = np.abs(got - ref) / denom
    assert np.median(rel) < 1e-3
