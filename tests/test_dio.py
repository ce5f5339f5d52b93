"""Golden parity tests for the DIO F0 estimator + StoneMask refinement."""
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def dio_out(mwm):
    from world_tpu.f0 import dio

    fs, x = mwm
    return {k: np.asarray(v) for k, v in dio(x, fs).items()}


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN / "dio.npz")


def test_raw_candidates_match(dio_out, g):
    ref = g["raw_f0_candidate"]
    got = dio_out["raw_f0_candidates"]
    assert got.shape == ref.shape
    # same nonzero pattern and close values
    agree = np.isclose(got, ref, rtol=1e-6, atol=1e-4)
    frac = agree.mean()
    assert frac > 0.999, f"raw candidate agreement {frac}"


def test_stability_matches(dio_out, g):
    ref = g["raw_stability"]
    got = dio_out["_raw_stability"]
    agree = np.isclose(got, ref, rtol=1e-5, atol=1e-6)
    assert agree.mean() > 0.999


def test_sorted_candidates_match(dio_out, g):
    ref = g["f0_candidates"]
    got = dio_out["f0_candidates"]
    agree = np.isclose(got, ref, rtol=1e-6, atol=1e-4)
    assert agree.mean() > 0.995  # ties in stability may permute rows


def test_final_f0_matches(dio_out, g):
    ref_f0, ref_vuv = g["f0"], g["vuv"]
    got_f0, got_vuv = dio_out["f0"], dio_out["vuv"]
    vuv_agree = (got_vuv == ref_vuv).mean()
    assert vuv_agree > 0.99, f"vuv agreement {vuv_agree}"
    both = (got_vuv == 1) & (ref_vuv == 1)
    rmse = np.sqrt(np.mean((got_f0[both] - ref_f0[both]) ** 2))
    assert rmse < 0.1, f"voiced F0 RMSE {rmse} Hz"


def test_stonemask_matches(mwm, g):
    from world_tpu.f0 import stonemask

    fs, x = mwm
    sm = np.load(GOLDEN / "stonemask.npz")
    refined = np.asarray(stonemask(x, fs, g["temporal_positions"], sm["f0_in"]))
    ref = sm["refined_f0"]
    close = np.isclose(refined, ref, rtol=2e-3, atol=0.05)
    assert close.mean() > 0.98, f"stonemask agreement {close.mean()}"
    voiced = ref != 0
    rmse = np.sqrt(np.mean((refined[voiced] - ref[voiced]) ** 2))
    assert rmse < 1.0, f"stonemask RMSE {rmse} Hz"
