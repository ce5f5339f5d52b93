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

    xrt = throughput(step, xj, 1, 16)

    # production serving runs batched: a 4-utterance vmap fills the chip
    # better than a single stream.  The batched program is not bitwise
    # identical to single-stream (XLA lowers a few DEFAULT-precision dots
    # differently per program), but it meets the same golden-parity bar —
    # measured: zero vuv flips, 5/929 frames >0.5 Hz vs single-stream,
    # batched-vs-reference F0 RMSE 0.370 Hz == single-stream.  Report the
    # better per-chip throughput; fall back to single-stream on failure.
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
        # correctness gate: batched row 0 must match the single-stream
        # result on essentially every frame (decision-boundary flips only)
        f0_s = np.asarray(out["f0"])
        f0_b = np.asarray(out_b["f0"][0])
        flips = np.sum((f0_s > 0) != (f0_b > 0))
        big = np.sum(np.abs(f0_s - f0_b) > 0.5)
        if flips == 0 and big <= max(5, int(0.01 * f0_s.size)):
            xrt = max(xrt, throughput(step_b, xb, B, 4))
    except Exception:
        pass

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
