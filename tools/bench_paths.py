"""xRT benchmark for every BASELINE.md config on the real TPU — golden-gated.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_paths.py \
           [out.json]

Measures per-chip throughput (audio-seconds per wall second) for:
  * dio+stonemask+cheaptrick+d4c encode      (BASELINE config 1, ref 2.79 s)
  * classic round-trip encode+decode          (BASELINE config 2, ref 3.40 s)
  * harvest+cheaptrick+d4cRequiem encode+decode (BASELINE configs 3/6,
    ref 27.2 s + 0.32 s — the bench.py headline)
  * swipe get_f0                              (BASELINE config 7, ref 0.56 s)

Every path carries a golden GATE (bench.py:68-85 discipline): the f0 output
of the timed program must meet its f64-reference golden bar ON DEVICE, or the
path's number is reported with gate: FAIL.  A number without a parity check
is a number, not a result.

Timing discipline per tools/axon_timing.py: enqueue K calls back-to-back,
pay ONE checksum fetch (block_until_ready does not sync through the axon
tunnel).  Prints a JSON table at the end (and writes it to ``out.json`` when
given).
"""
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from scipy.io import wavfile

from world_tpu.f0.swipe import _static_config, _swipe_core
from world_tpu.parallel.batch import (_encode_classic_one,
                                      _encode_decode_classic_one,
                                      _encode_decode_one)
from world_tpu.synth.seeds import get_seeds_signals


def checksum(out):
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    acc = 0.0
    for l in leaves:
        acc = acc + jnp.sum(jnp.abs(l.astype(jnp.float32)))
    return acc


def throughput(fn, args, audio_seconds, utts=1, K=16, reps=3):
    out = fn(*args)
    float(checksum(out))  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = []
        for _ in range(K):
            acc.append(checksum(fn(*args)))
        float(jnp.sum(jnp.stack(acc)))
        wall = time.perf_counter() - t0
        best = wall if best is None else min(best, wall)
    per_call = best / K
    return audio_seconds * utts / per_call, per_call, out


def gate_f0_vs(f0, golden_f0, vuv_bar, rmse_bar, trim=False):
    """verify_tpu.py's f0 bar: vuv agreement + voiced RMSE vs an f64 golden.

    ``trim``: gate the 99%-trimmed RMSE instead of the full RMSE (the dio+
    stonemask path's full RMSE is a backend-independent f32 decision-boundary
    tail — CPU-f32 measures the same 1.95 Hz; see verify_tpu.py's dio bars)."""
    f0 = np.asarray(f0, np.float64)
    vp, vg = f0 > 0, np.asarray(golden_f0) > 0
    agree = float(np.mean(vp == vg))
    both = vp & vg
    d = np.abs(f0[both] - np.asarray(golden_f0)[both])
    rmse = float(np.sqrt(np.mean(d ** 2)))
    gated = rmse
    detail = {"vuv_agree": round(agree, 4), "f0_rmse_hz": round(rmse, 3),
              "bars": f"vuv>{vuv_bar}, rmse<{rmse_bar}Hz"}
    if trim:
        gated = float(np.sqrt(np.mean(np.sort(d)[: max(1, int(0.99 * d.size))]
                                      ** 2)))
        detail["f0_trimmed99_rmse_hz"] = round(gated, 3)
        detail["bars"] = f"vuv>{vuv_bar}, trimmed99-rmse<{rmse_bar}Hz"
    ok = agree > vuv_bar and gated < rmse_bar
    return ("PASS" if ok else "FAIL", detail)


def main():
    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    fs = int(fs)
    x = (x_int16 / (2 ** 15 - 1)).astype(np.float32)
    audio_s = len(x) / fs
    xj = jnp.asarray(x)
    key = jax.random.PRNGKey(0)

    g_sm = np.load("/root/repo/tests/golden/stonemask.npz")
    g_hv = np.load("/root/repo/tests/golden/harvest.npz")
    g_sw = np.load("/root/repo/tests/golden/swipe.npz")

    results = {}

    # --- config 1: dio+stonemask encode ---------------------------------
    enc = jax.jit(lambda x: _encode_classic_one(x, fs=fs, frame_period=5))
    t0 = time.perf_counter()
    xrt, per, out = throughput(enc, (xj,), audio_s)
    gate, detail = gate_f0_vs(out["f0"], g_sm["refined_f0"], 0.98, 1.0, trim=True)
    results["dio_encode"] = {"xrt": round(xrt, 1),
                             "ms_per_call": round(per * 1000, 2),
                             "ref_s": 2.79,
                             "speedup": round(xrt / (audio_s / 2.79), 1),
                             "gate": gate, "gate_detail": detail}
    print(f"dio encode        {xrt:9.1f} xRT  ({per*1000:6.1f} ms)  "
          f"gate {gate} {detail}  "
          f"[{time.perf_counter()-t0:.0f}s incl compile]", flush=True)

    # --- config 2: classic round-trip ------------------------------------
    rt = jax.jit(lambda x, k: _encode_decode_classic_one(x, k, fs=fs,
                                                         frame_period=5))
    t0 = time.perf_counter()
    xrt, per, out = throughput(rt, (xj, key), audio_s)
    gate, detail = gate_f0_vs(out["f0"], g_sm["refined_f0"], 0.98, 1.0, trim=True)
    y = np.asarray(out["y"], np.float64)
    rms = float(np.sqrt(np.mean(y ** 2)))
    if not (np.all(np.isfinite(y)) and 0.03 < rms < 0.3):
        gate = "FAIL"
    detail["y_rms"] = round(rms, 4)
    results["classic_roundtrip"] = {"xrt": round(xrt, 1),
                                    "ms_per_call": round(per * 1000, 2),
                                    "ref_s": 2.79 + 0.61,
                                    "speedup": round(xrt / (audio_s / 3.40), 1),
                                    "gate": gate, "gate_detail": detail}
    print(f"classic roundtrip {xrt:9.1f} xRT  ({per*1000:6.1f} ms)  "
          f"gate {gate} {detail}  "
          f"[{time.perf_counter()-t0:.0f}s incl compile]", flush=True)

    # --- configs 3/6: harvest + requiem round-trip ------------------------
    seeds = get_seeds_signals(fs)
    pulse = jnp.asarray(np.asarray(seeds["pulse"], np.float32))
    noise = jnp.asarray(np.asarray(seeds["noise"], np.float32))
    n_bands = int(np.ceil(np.log2((800 * 1.1) / (71 * 0.9)) * 40))
    max_candidates = int(n_bands / 10 + 0.5)
    hv = jax.jit(lambda x, p, n: _encode_decode_one(
        x, p, n, fs=fs, frame_period=5, max_pulses=8192,
        max_candidates=max_candidates, max_sections=256))
    t0 = time.perf_counter()
    xrt, per, out = throughput(hv, (xj, pulse, noise), audio_s)
    gate, detail = gate_f0_vs(out["f0"], g_hv["f0"], 0.99, 1.0)
    y = np.asarray(out["y"], np.float64)
    rms = float(np.sqrt(np.mean(y ** 2)))
    if not (np.all(np.isfinite(y)) and 0.03 < rms < 0.3):
        gate = "FAIL"
    detail["y_rms"] = round(rms, 4)
    results["harvest_requiem_roundtrip"] = {
        "xrt": round(xrt, 1), "ms_per_call": round(per * 1000, 2),
        "ref_s": 27.2 + 0.32, "speedup": round(xrt / (audio_s / 27.52), 1),
        "gate": gate, "gate_detail": detail}
    print(f"harvest roundtrip {xrt:9.1f} xRT  ({per*1000:6.1f} ms)  "
          f"gate {gate} {detail}  "
          f"[{time.perf_counter()-t0:.0f}s incl compile]", flush=True)

    # --- config 7: swipe get_f0 -------------------------------------------
    cfg = _static_config(fs, (71, 800), 1 / 96, 0.1, 2)
    num_samples = int(1000 * len(x) / fs / 5 + 1)
    t = jnp.asarray(np.arange(num_samples) * 0.005, jnp.float32)
    sw = jax.jit(lambda x: _swipe_core(x, cfg, float(fs), t, 0.3))
    t0 = time.perf_counter()
    xrt, per, out = throughput(sw, (xj,), audio_s)
    f0s = np.asarray(out["f0"], np.float64)
    f0g = np.asarray(g_sw["f0"], np.float64)
    vp, vg = f0s > 0, f0g > 0
    vuv_agree = float(np.mean(vp == vg))
    both = vp & vg
    rel = np.abs(f0s[both] - f0g[both]) / f0g[both]
    med = float(np.median(rel))
    pct1 = float(np.mean(rel < 0.01))
    # tests/test_swipe.py's CPU bars, with the median widened 10x for f32
    gate = ("PASS" if vuv_agree > 0.97 and med < 1e-3 and pct1 > 0.97
            else "FAIL")
    detail = {"vuv_agree": round(vuv_agree, 4), "median_rel": f"{med:.2e}",
              "pct_within_1pct": round(pct1, 4),
              "bars": "vuv>0.97, med<1e-3, 1pct>0.97"}
    results["swipe_f0"] = {"xrt": round(xrt, 1),
                           "ms_per_call": round(per * 1000, 2),
                           "ref_s": 0.56,
                           "speedup": round(xrt / (audio_s / 0.56), 1),
                           "gate": gate, "gate_detail": detail}
    print(f"swipe get_f0      {xrt:9.1f} xRT  ({per*1000:6.1f} ms)  "
          f"gate {gate} {detail}  "
          f"[{time.perf_counter()-t0:.0f}s incl compile]", flush=True)

    doc = {
        "hardware": f"1x {jax.devices()[0].device_kind} "
                    f"({jax.default_backend()} backend)",
        "fixture": "/root/reference/test/test-mwm.wav "
                   f"({fs} Hz, {audio_s:.3f} s)",
        "timing": "best of 3 reps of 16 back-to-back enqueues, "
                  "one checksum fetch",
        "gates": "per-path f64-reference golden bars evaluated on the timed "
                 "program's own device outputs",
        "paths": results,
    }
    print(json.dumps(doc, indent=2))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(doc, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
