"""Auxiliary subsystem tests: parallel batch, persistence, VAE loader, IO,
profiling utilities, graft entry points."""
import os
from pathlib import Path

import numpy as np
import pytest


@pytest.mark.slow
def test_batch_encode_decode_multichip_cpu():
    import jax

    from world_tpu.parallel.batch import batch_encode_decode, make_mesh

    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(jax.devices()[:n_dev])
    fs, n = 22050, 8192
    t = np.arange(n) / fs
    base = np.sin(2 * np.pi * 150 * t) + 0.3 * np.sin(2 * np.pi * 300 * t)
    rng = np.random.RandomState(0)
    xs = np.stack([base * (0.5 + 0.1 * i) + 0.01 * rng.randn(n)
                   for i in range(2 * n_dev)]).astype(np.float32)
    out = batch_encode_decode(xs, fs, mesh=mesh)
    y = np.asarray(out["y"])
    assert y.shape[0] == 2 * n_dev
    assert np.all(np.isfinite(y))
    # all utterances carry the same 150 Hz tone at different gains: voiced
    # frames should find ~150 Hz
    f0 = np.asarray(out["f0"])
    voiced = f0 > 0
    assert voiced.any()
    assert abs(np.median(f0[voiced]) - 150) < 5


def test_frame_sharded_cheaptrick_collective():
    import jax
    import jax.numpy as jnp

    from world_tpu.parallel.batch import frame_sharded_cheaptrick, make_mesh
    from world_tpu.spectral.cheaptrick import cheaptrick

    mesh = make_mesh(jax.devices()[: min(4, len(jax.devices()))])
    fs, n = 22050, 8192
    t = np.arange(n) / fs
    x = (np.sin(2 * np.pi * 200 * t)).astype(np.float64)
    n_frames = int(1000 * n / fs / 5 + 1)
    tp = np.arange(n_frames) * 5 / 1000
    f0 = np.full(n_frames, 200.0)
    vuv = np.ones(n_frames)
    env, tot = frame_sharded_cheaptrick(jnp.asarray(x), jnp.asarray(f0),
                                        jnp.asarray(vuv), jnp.asarray(tp),
                                        fs, mesh)
    ref = cheaptrick(x, fs, dict(f0=f0, vuv=vuv, temporal_positions=tp))
    # compare in dB with a floor: a pure tone's noise-floor bins amplify the
    # fp differences between the two compilations
    a = 10 * np.log10(np.asarray(env) + 1e-7)
    b = 10 * np.log10(np.asarray(ref["spectrogram"]).T + 1e-7)
    assert np.abs(a - b).max() < 0.2, f"max dB diff {np.abs(a-b).max()}"
    assert np.isfinite(float(tot))


def test_warn_batch_capacity_plumbing():
    """The batch path must surface per-utterance overflow flags as the same
    RuntimeWarning the single-utterance harvest()/decode() raise (the real
    saturating program runs in the slow tier below — compile cost)."""
    import warnings

    from world_tpu.parallel.batch import _warn_batch_capacity

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _warn_batch_capacity(np.array([False, False]), 256, 512)
    assert not rec
    with pytest.warns(RuntimeWarning, match=r"utterance\(s\) \[1, 3\]"):
        _warn_batch_capacity(np.array([False, True, False, True]), 4, 256)


@pytest.mark.slow
def test_batch_encode_decode_overflow_warns_end_to_end():
    """A real batched program whose voiced-section table genuinely saturates:
    three tone bursts -> >=3 sections vs max_sections=2 (tiny shapes keep the
    XLA-CPU compile affordable)."""
    from world_tpu.parallel.batch import batch_encode_decode

    fs, n = 12000, 3072
    rng = np.random.RandomState(0)
    t = np.arange(n) / fs
    # noise floor keeps RemoveUnreliableCandidates from wiping the bursts
    # (on a pure stationary tone the reference itself keeps ~2 frames)
    x = np.sin(2 * np.pi * 150 * t) + 0.01 * rng.randn(n)
    gate = np.zeros(n)
    for s in (0.0, 0.09, 0.18):  # three ~60 ms bursts
        gate[int(s * fs): int((s + 0.06) * fs)] = 1.0
    xs = np.stack([x * gate, x * gate * 0.5]).astype(np.float32)
    with pytest.warns(RuntimeWarning, match="saturated for utterance"):
        out = batch_encode_decode(xs, fs, frame_period=10, max_pulses=256,
                                  max_candidates=8, max_sections=2)
    assert np.all(np.isfinite(np.asarray(out["y"])))


def test_save_load_roundtrip(tmp_path):
    from world_tpu import World

    dat = {"f0": np.arange(5.0), "vuv": np.ones(5), "fs": 22050,
           "is_requiem": True}
    p = tmp_path / "analysis.npz"
    World.save(dat, p)
    back = World.load(p)
    np.testing.assert_array_equal(back["f0"], dat["f0"])
    assert back["fs"] == 22050 and back["is_requiem"] is True


def test_vae_loader_matches_manifold_weights():
    from world_tpu.features.vae import load_manifold_vae

    enc, dec = load_manifold_vae(
        "/root/reference/manifold/timit_vae_encoder_0001",
        "/root/reference/manifold/timit_vae_decoder_0001")
    x = np.random.RandomState(0).randn(4, 39).astype(np.float32)
    z = enc.predict(x)
    assert z.shape == (4, 12)
    y = dec.predict(z)
    assert y.shape == (4, 39)
    # manual forward through raw h5 weights must agree exactly
    import h5py

    with h5py.File("/root/reference/manifold/timit_vae_encoder_0001") as f:
        mw = f["model_weights"]
        h = x
        for name in ["dense_1", "dense_2", "dense_3", "dense_4"]:
            g = mw[name][name]
            h = h @ np.asarray(g["kernel:0"]) + np.asarray(g["bias:0"])
            if name != "dense_4":
                h = np.maximum(h, 0)
    np.testing.assert_allclose(z, h, rtol=1e-5, atol=1e-5)


def test_encode_vae_through_api():
    from world_tpu import World
    from world_tpu.features.vae import load_manifold_vae

    enc, dec = load_manifold_vae(
        "/root/reference/manifold/timit_vae_encoder_0001",
        "/root/reference/manifold/timit_vae_decoder_0001")
    vocoder = World()
    n0, window = 14, 1  # (2*1+1)*(14-1) = 39 = model input dim
    rng = np.random.RandomState(1)
    Xc = rng.randn(50, n0 - 1)
    energy = rng.randn(50)
    Zc, Yc = vocoder.encode_vae(Xc.copy(), energy, enc, dec, window, n0,
                                batch_size=16, mean=0.0)
    assert Zc.shape == (50, 12)
    assert Yc.shape == (50, n0)
    np.testing.assert_array_equal(Yc[:, 0], energy)


def test_wav_io_roundtrip(tmp_path):
    from world_tpu.io.wav import read_wav, write_wav

    y = np.sin(np.linspace(0, 100, 4000)) * 0.5
    p = tmp_path / "t.wav"
    write_wav(p, 16000, y)
    fs, back = read_wav(p)
    assert fs == 16000
    np.testing.assert_allclose(back, y, atol=1e-4)


def test_xrt_meter():
    import time

    from world_tpu.utils.profiling import XrtMeter, timed

    m = XrtMeter()
    with m.measure(1.0, "stage_a"):
        time.sleep(0.01)
    assert m.xrt > 0 and "stage_a" in m.report()

    import jax.numpy as jnp

    dt, out = timed(lambda a: a * 2, jnp.ones(8))
    assert dt >= 0 and np.all(np.asarray(out) == 2)


def test_graft_entry_single_chip():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))


def test_native_wav_io(tmp_path):
    from world_tpu.io import native
    from world_tpu.io.wav import read_wav as scipy_read

    if not native.available():
        pytest.skip("native IO library not built")
    fs, x = native.read_wav("/root/reference/test/test-mwm.wav")
    fs2, x2 = scipy_read("/root/reference/test/test-mwm.wav")
    assert fs == fs2
    np.testing.assert_array_equal(x, x2)
    p = tmp_path / "n.wav"
    native.write_wav(p, fs, x[:2000])
    fs3, x3 = native.read_wav(p)
    assert fs3 == fs
    np.testing.assert_allclose(x3, x[:2000], atol=1e-4)


def test_ragged_batch_rows_match_single_runs():
    """batch_encode_decode_ragged must give, row for row, EXACTLY what a
    separate call with only that utterance gives (same bucket length =>
    same program => bitwise decisions, the dsp/iir.py determinism
    contract), across a mixed-length batch spanning two buckets."""
    from world_tpu.parallel.batch import batch_encode_decode_ragged

    fs = 12000
    rng = np.random.RandomState(0)

    def chirp(n, f_lo, scale):
        t = np.arange(n) / fs
        f0_true = f_lo + 40.0 * t / t[-1]
        ph = 2 * np.pi * np.cumsum(f0_true) / fs
        base = sum((0.6 ** k) * np.sin((k + 1) * ph) for k in range(4))
        return (base * scale * (0.4 + 0.25 * np.sin(2 * np.pi * 1.7 * t) ** 2)
                + 0.01 * rng.randn(n)).astype(np.float32)

    xs = [chirp(2500, 130.0, 0.8), chirp(4000, 150.0, 0.7),
          chirp(2900, 170.0, 0.9)]
    # quantum 3072/fs: buckets 3072 (rows 0 and 2) and 6144 (row 1)
    q = 3072 / fs
    mixed = batch_encode_decode_ragged(xs, fs, frame_period=10,
                                       bucket_quantum_s=q)
    for i, x in enumerate(xs):
        single = batch_encode_decode_ragged([x], fs, frame_period=10,
                                            bucket_quantum_s=q)[0]
        nf = int(1000 * len(x) / fs / 10 + 1)
        assert mixed[i]["f0"].shape == (nf,)
        # the repo's batched-vs-single contract (test_batched_bitwise):
        # decisions bitwise, values ulp-tight, waveform energy-bounded
        np.testing.assert_array_equal(mixed[i]["vuv"], single["vuv"])
        assert np.abs(mixed[i]["f0"] - single["f0"]).max() < 1e-3
        rel = (np.linalg.norm(mixed[i]["y"] - single["y"])
               / max(np.linalg.norm(single["y"]), 1e-30))
        assert rel < 1e-2, f"row {i}: waveform rel-L2 {rel:.2e}"
        ddb = np.abs(10 * np.log10(mixed[i]["spectrogram"] + 1e-12)
                     - 10 * np.log10(single["spectrogram"] + 1e-12)).max()
        assert ddb < 0.05, f"row {i}: envelope drift {ddb:.3f} dB"
    # content sanity: each row's own voiced fraction and f0 glide found
    for i, f_lo in ((0, 130.0), (1, 150.0), (2, 170.0)):
        f0 = mixed[i]["f0"]
        assert (f0 > 0).mean() > 0.3, i
        med = np.median(f0[f0 > 0])
        assert f_lo - 10 < med < f_lo + 50, (i, med)
