"""Benchmark: harvest + requiem encode/decode xRT on the BASELINE fixture.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): the NumPy reference runs harvest encode in 27.2 s +
requiem-style decode ~0.65 s on the same 4.644 s clip => 0.1667x realtime.
"""
import json
import time

import numpy as np


def main():
    from scipy.io import wavfile

    import jax

    # persistent jit cache: the pipeline programs are large and the remote
    # tunnel makes first compiles minutes-long; repeated bench runs hit disk
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from world_tpu.parallel.batch import _encode_decode_one
    from world_tpu.synth.seeds import get_seeds_signals

    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    x = (x_int16 / (2 ** 15 - 1)).astype(np.float32)
    audio_seconds = len(x) / fs

    import jax.numpy as jnp

    seeds = get_seeds_signals(int(fs))
    pulse = jnp.asarray(np.asarray(seeds["pulse"], dtype=np.float32))
    noise = jnp.asarray(np.asarray(seeds["noise"], dtype=np.float32))
    xj = jnp.asarray(x)

    n_bands = int(np.ceil(np.log2((800 * 1.1) / (71 * 0.9)) * 40))
    max_candidates = int(n_bands / 10 + 0.5)

    @jax.jit
    def step(x, pulse_seed, noise_seed):
        return _encode_decode_one(x, pulse_seed, noise_seed, fs=int(fs),
                                  frame_period=5, max_pulses=8192,
                                  max_candidates=max_candidates,
                                  max_sections=256)

    # compile + warmup (sync via a device-side checksum: block_until_ready
    # on a dict proved unreliable through the remote-device tunnel)
    out = step(xj, pulse, noise)
    float(jnp.sum(out["y"]))

    # steady-state throughput: enqueue K analysis+synthesis rounds back-to-back
    # and pay ONE host sync at the end (through the remote-device tunnel a
    # host fetch costs ~28 ms; per-call sync would measure the tunnel, not
    # the vocoder).  The checksum consumes every output so no round is dead.
    def checksum(out):
        return (jnp.sum(out["y"]) + jnp.sum(out["f0"])
                + jnp.sum(out["spectrogram"])
                + jnp.sum(out["band_aperiodicity"]))

    out = step(xj, pulse, noise)
    float(checksum(out))  # warm the checksum program too

    import sys

    golden = np.load("/root/repo/tests/golden/harvest.npz")

    def golden_gate(f0_arr, tag):
        """A reported headline must be a verified headline: the path's f0
        must meet the f64-reference golden bar (vuv agreement > 99%, voiced
        F0 RMSE < 1 Hz) or it is excluded from the reported number."""
        f0_p = np.asarray(f0_arr, np.float64)
        vuv_p = f0_p > 0
        vuv_g = golden["vuv"] > 0.5
        agree = float(np.mean(vuv_p == vuv_g))
        both = vuv_p & vuv_g
        rmse = float(np.sqrt(np.mean((f0_p[both] - golden["f0"][both]) ** 2)))
        ok = agree > 0.99 and rmse < 1.0
        if not ok:
            print(f"bench: {tag} path FAILED the reference golden bar "
                  f"(vuv agree {agree:.4f}, f0 rmse {rmse:.3f} Hz)",
                  file=sys.stderr)
        return ok

    single_ok = golden_gate(out["f0"], "single-stream")

    def throughput(fn, arg, per_call_utts, K):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            acc = []
            for _ in range(K):
                acc.append(checksum(fn(arg, pulse, noise)))
            float(jnp.sum(jnp.stack(acc)))
            wall_k = time.perf_counter() - t0
            best = wall_k if best is None else min(best, wall_k)
        return audio_seconds * per_call_utts / (best / K)

    xrt = throughput(step, xj, 1, 16) if single_ok else 0.0

    # production serving runs batched: a 4-utterance vmap fills the chip
    # better than a single stream.  Both paths are held to the SAME
    # f64-reference golden bar (golden_gate above); a failing path is
    # excluded from the reported number with a loud stderr warning.
    try:
        B = 4
        xb = jnp.asarray(np.stack([x] * B))

        @jax.jit
        def step_b(xb, pulse_seed, noise_seed):
            return jax.vmap(
                lambda xi: _encode_decode_one(
                    xi, pulse_seed, noise_seed, fs=int(fs), frame_period=5,
                    max_pulses=8192, max_candidates=max_candidates,
                    max_sections=256))(xb)

        out_b = step_b(xb, pulse, noise)
        float(checksum(out_b))
        if golden_gate(out_b["f0"][0], "batched"):
            xrt = max(xrt, throughput(step_b, xb, B, 4))
    except Exception as e:
        print(f"bench: batched path raised ({e!r}); reporting single-stream "
              f"only", file=sys.stderr)

    baseline_xrt = 4.644 / (27.2 + 0.65)  # measured reference (BASELINE.md)
    print(json.dumps({
        "metric": "harvest+requiem encode+decode per-chip throughput "
                  "xRT (audio-s/s; best of single-stream / gated 4-batch)",
        "value": round(xrt, 2),
        "unit": "x realtime",
        "vs_baseline": round(xrt / baseline_xrt, 1),
    }))


if __name__ == "__main__":
    main()
