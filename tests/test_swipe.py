"""Parity tests for SWIPE' (computed against the live shimmed reference)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))


def test_swipe_matches_reference(mwm):
    import ref_shim
    ref_shim.reference_world()
    from world import swipe as RS

    from world_tpu.f0.swipe import swipe

    fs, x = mwm
    ref = RS.swipe(fs, x, [71, 800], 0.005, 0.3)
    got = swipe(fs, x, plim=(71, 800), sTHR=0.3)
    f0_r = ref["f0"]
    f0_m = np.asarray(got["f0"])
    assert f0_m.shape == f0_r.shape
    vuv_agree = ((f0_m > 0) == (f0_r > 0)).mean()
    assert vuv_agree > 0.97, f"swipe vuv agreement {vuv_agree}"
    both = (f0_m > 0) & (f0_r > 0)
    rel = np.abs(f0_m[both] - f0_r[both]) / f0_r[both]
    assert np.median(rel) < 1e-4, f"median rel err {np.median(rel)}"
    assert (rel < 0.01).mean() > 0.97, f"1% agreement {(rel<0.01).mean()}"


def test_swipe_through_api(mwm):
    from world_tpu import World

    fs, x = mwm
    tp, f0, vuv = World().get_f0(fs, x, f0_method="swipe")
    assert f0.shape == vuv.shape == tp.shape
    assert (f0[vuv == 1] >= 71).all() and (f0[vuv == 1] <= 800 * 1.01).all()
