"""Golden parity tests for D4C (classic)."""
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def d4c_out(mwm):
    from world_tpu.aperiodicity.d4c import d4c

    fs, x = mwm
    src = np.load(GOLDEN / "source_dio.npz")
    srcd = {k: src[k] for k in src.files}
    # encode order: cheaptrick mutates f0 (unvoiced->500) before d4c; d4c
    # re-zeroes by vuv, so the d4c input contract only needs f0+vuv
    g_ct = np.load(GOLDEN / "cheaptrick.npz")
    srcd["f0"] = g_ct["f0_after_mutation"]
    return d4c(x, fs, srcd)


def test_coarse_ap_matches(d4c_out):
    g = np.load(GOLDEN / "d4c.npz")
    ref = g["coarse_ap"]
    got = np.asarray(d4c_out["coarse_ap"])
    assert got.shape == ref.shape
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-3)
    assert close.mean() > 0.99, f"coarse ap agreement {close.mean()}"


def test_aperiodicity_matches(d4c_out):
    g = np.load(GOLDEN / "d4c.npz")
    ref = g["aperiodicity"]
    got = np.asarray(d4c_out["aperiodicity"])
    assert got.shape == ref.shape
    err = np.abs(got - ref)
    assert np.median(err) < 1e-6
    assert (err < 1e-2).mean() > 0.999, f"ap max err {err.max()}"
