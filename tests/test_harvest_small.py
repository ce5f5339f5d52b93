"""Default-tier harvest golden on a small fixture (1 s @ 16 kHz).

The full-fixture parity suite (tests/test_harvest.py) is slow-tier — ~8 min
of XLA-CPU compile per program on a 1-core box — so a cold default run never
exercised the centerpiece estimator end-to-end until this file.  Oracle:
tools/make_goldens.py::gen_harvest_small (the shimmed NumPy reference,
/root/reference/world/harvest.py:17-54, on the first second of the 16 kHz
resampled fixture).
"""
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN / "harvest_small.npz")


@pytest.fixture(scope="module")
def hv(g):
    from world_tpu.f0.harvest import harvest

    # Smaller static tables than the API defaults (15 candidates / 256
    # sections) to keep the cold XLA-CPU compile cheap; the fixture detects
    # 5 candidates and a handful of sections, so both still have headroom
    # (asserted by test_small_fixture_no_overflow).
    return {k: np.asarray(v)
            for k, v in harvest(np.asarray(g["x"]), int(g["fs"]),
                                max_candidates=8, max_sections=64,
                                debug_outputs=True).items()}


def test_small_fixture_no_overflow(hv):
    assert not bool(hv["_refine_overflow"])
    assert not bool(hv["_section_overflow"])


def test_small_fixture_refined_candidates(hv, g):
    ref = g["f0_candidates_refined"]
    mc_ref = ref.shape[0] // 7
    got = hv["_cands_refined"]
    mc = got.shape[0] // 7
    for i in range(7):
        blk_ref = ref[i * mc_ref:(i + 1) * mc_ref]
        blk_got = got[i * mc:i * mc + mc_ref]
        agree = np.isclose(blk_got, blk_ref, rtol=1e-5, atol=1e-3)
        assert agree.mean() > 0.995, f"refine block {i}: {agree.mean()}"


def test_small_fixture_contour_steps(hv, g):
    for stage, key in [("_f0_base", "f0_base"), ("_f0_step2", "f0_step2"),
                       ("_f0_step4", "f0_step4")]:
        ref = g[key]
        got = hv[stage]
        agree = np.isclose(got, ref, rtol=1e-5, atol=1e-3)
        assert agree.mean() > 0.99, f"{stage} agreement {agree.mean()}"


def test_small_fixture_final_f0(hv, g):
    vuv = hv["vuv"] > 0
    gvuv = np.asarray(g["vuv"]) > 0
    agree = float(np.mean(vuv == gvuv))
    assert agree > 0.99, f"vuv agreement {agree}"
    both = vuv & gvuv
    rmse = float(np.sqrt(np.mean((hv["f0"][both] - g["f0"][both]) ** 2)))
    assert rmse < 0.1, f"voiced F0 RMSE {rmse}"
