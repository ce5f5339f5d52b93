"""End-to-end API tests: encode/decode round trip + feature codecs vs reference."""
import sys
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"
sys.path.insert(0, str(Path(__file__).parent))


def test_encode_decode_dio_roundtrip(mwm):
    from world_tpu import World

    fs, x = mwm
    vocoder = World()
    dat = vocoder.encode(fs, x, f0_method="dio")
    assert dat["spectrogram"].shape[0] == 513
    assert dat["aperiodicity"].shape == dat["spectrogram"].shape
    assert dat["f0"].shape == dat["vuv"].shape

    g = np.load(GOLDEN / "d4c.npz")
    np.testing.assert_allclose(dat["f0"], g["f0_after_mutation"], atol=1e-6)

    dat = vocoder.decode(dat)
    y = dat["out"]
    assert np.all(np.isfinite(y))
    assert 0.01 < np.abs(y).max() <= 1.0
    # voiced-region envelope should correlate with the input
    n = min(len(y), len(x))
    w = 512
    e_y = np.array([np.mean(y[i:i + w] ** 2) for i in range(0, n - w, w)])
    e_x = np.array([np.mean(x[i:i + w] ** 2) for i in range(0, n - w, w)])
    corr = np.corrcoef(np.log10(e_y + 1e-9), np.log10(e_x + 1e-9))[0, 1]
    assert corr > 0.8, f"energy envelope correlation {corr}"


def test_modification_ops(mwm):
    from world_tpu import World

    fs, x = mwm
    vocoder = World()
    dat = vocoder.encode(fs, x, f0_method="dio")
    f0_before = dat["f0"].copy()
    vocoder.scale_pitch(dat, 1.5)
    np.testing.assert_allclose(dat["f0"], f0_before * 1.5)
    tp_before = dat["temporal_positions"].copy()
    vocoder.scale_duration(dat, 2.0)
    np.testing.assert_allclose(dat["temporal_positions"], tp_before * 2.0)
    spec_before = dat["spectrogram"].copy()
    vocoder.warp_spectrum(dat, 1.1)
    assert dat["spectrogram"].shape == spec_before.shape
    assert not np.allclose(dat["spectrogram"], spec_before)
    with pytest.raises(NotImplementedError):
        vocoder.set_pitch(dat, None, None)


def test_feature_codecs_match_reference():
    import ref_shim
    ref_shim.reference_world()
    from world import main as ref_main

    from world_tpu import World

    ref = ref_main.World()
    mine = World()

    fb_r = ref.get_filterbanks(20, 512, 16000)
    fb_m = mine.get_filterbanks(20, 512, 16000)
    np.testing.assert_allclose(fb_m, fb_r, atol=1e-10)

    g = np.load(GOLDEN / "cheaptrick.npz")
    spec = g["spectrogram"].T[:100]  # (frames, bins)

    lf_r = ref.encode_lfbank(spec.copy(), fs=22050)
    lf_m = mine.encode_lfbank(spec, fs=22050)
    np.testing.assert_allclose(lf_m, lf_r, rtol=1e-6, atol=1e-8)

    mc_r = ref.encode_mcep(spec.copy(), n0=40, fs=22050, highhz=11025)
    mc_m = mine.encode_mcep(spec, n0=40, fs=22050, highhz=11025)
    np.testing.assert_allclose(mc_m, mc_r, rtol=1e-6, atol=1e-8)

    dm_r = ref.decode_mcep(mc_r, 1024)
    dm_m = mine.decode_mcep(mc_m, 1024)
    np.testing.assert_allclose(dm_m, dm_r, rtol=1e-5, atol=1e-8)

    ctx_r = ref.get_context(mc_r, w=5)
    ctx_m = mine.get_context(mc_m, w=5)
    np.testing.assert_allclose(ctx_m, ctx_r, rtol=1e-6, atol=1e-8)


def test_mcep_roundtrip_lsd():
    """MCEP-40 round-trip LSD on the golden spectrogram; the reference
    records 5.23 dB on its 16 kHz feature demo (test/spectralFeatures.py:34)."""
    from world_tpu import World

    def lsd(A, B):
        return np.mean(np.sqrt(np.mean((20 * np.log10(A / B)) ** 2, axis=1)))

    g = np.load(GOLDEN / "cheaptrick.npz")
    spec = np.sqrt(g["spectrogram"].T)  # magnitude
    mine = World()
    mc = mine.encode_mcep(spec, n0=40, fs=22050, highhz=11025)
    rec = mine.decode_mcep(mc, 1024)
    val = lsd(spec, rec)
    assert val < 8.0, f"MCEP-40 round-trip LSD {val} dB"


@pytest.mark.slow
def test_encode_16khz_matches_reference():
    """Full harvest+requiem encode at 16 kHz: different static band counts,
    FFT sizes and aperiodicity shapes than the 22.05 kHz fixture."""
    import numpy as np

    from world_tpu import World

    g = np.load("tests/golden/harvest_16k.npz")
    x = np.asarray(g["x16"])
    fs = int(g["fs"])
    dat = World().encode(fs, x, f0_method="harvest", is_requiem=True)
    f0 = np.asarray(dat["f0"])
    vuv = np.asarray(dat["vuv"]) > 0
    gvuv = np.asarray(g["vuv"]) > 0
    agree = np.mean(vuv == gvuv)
    both = vuv & gvuv
    rmse = np.sqrt(np.mean((f0[both] - g["f0"][both]) ** 2))
    assert agree > 0.99, agree
    assert rmse < 1.0, rmse
    spec = np.asarray(dat["spectrogram"])
    assert spec.shape == g["spectrogram"].shape
    lsd = np.sqrt(np.mean((10 * np.log10(spec[:, both] + 1e-12)
                           - 10 * np.log10(g["spectrogram"][:, both]
                                           + 1e-12)) ** 2))
    assert lsd < 1.0, lsd
    bap = np.asarray(dat["aperiodicity"])
    assert bap.shape == g["band_aperiodicity"].shape
    ap_err = np.max(np.abs(bap[:, both] - g["band_aperiodicity"][:, both]))
    assert ap_err < 1.0, ap_err
