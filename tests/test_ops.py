"""Pallas kernel parity: each TPU kernel must match its pure-XLA twin.

The kernels run in interpreter mode here (tests run on the CPU backend);
on TPU the same kernel code compiles via Mosaic.
"""
import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.smoke


def test_refine_dft_pallas_matches_xla():
    from world_tpu.ops.refine_dft import (_refine_pallas, dft_basis,
                                          refine_full_xla)

    rng = np.random.RandomState(0)
    C, B, W = 5, 200, 45                      # B not a multiple of the block
    nb = 33                                   # S = 64
    actual_fs = 7350.0
    max_half = (W - 1) // 2
    seg = jnp.asarray(rng.randn(B, W))
    phase = jnp.asarray(rng.randn(B, W) * 1e-3)
    f0 = jnp.asarray(rng.rand(C, B) * 700 + 80)
    # a few "invalid candidate" rows exercising the huge-half masked path
    f0 = f0.at[0, :7].set(1e-12)
    basis = dft_basis(W, nb, seg.dtype)
    got_f0, got_sc = _refine_pallas(seg, phase, f0, basis, actual_fs,
                                    max_half, nb, 71.0, 800.0, interpret=True)
    want_f0, want_sc = refine_full_xla(seg, phase, f0, basis, actual_fs,
                                       max_half, nb, 71.0, 800.0)
    # the kernel's double-angle cos(4x) and accumulated harmonic sums round
    # differently at the last ulp; the score's reciprocal near the ok=2.5
    # threshold could in principle flip a borderline candidate, which random
    # data here does not produce
    np.testing.assert_allclose(np.asarray(got_f0), np.asarray(want_f0),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_sc), np.asarray(want_sc),
                               rtol=1e-9, atol=1e-12)


def test_refine_dft_custom_vmap_folds_batch():
    """vmap over an utterance batch must fold into the frame-row axis and
    reproduce each example's unbatched kernel result exactly (rows are
    independent, so tile regrouping cannot change the math)."""
    import jax

    from world_tpu.ops.refine_dft import (_refine_pallas_batchable, dft_basis)

    rng = np.random.RandomState(3)
    N, C, B, W = 3, 4, 150, 45
    nb = 33
    actual_fs = 7350.0
    max_half = (W - 1) // 2
    seg = jnp.asarray(rng.randn(N, B, W))
    phase = jnp.asarray(rng.randn(B, W) * 1e-3)       # unbatched (shared grid)
    f0 = jnp.asarray(rng.rand(N, C, B) * 700 + 80)
    f0 = f0.at[:, 0, :5].set(1e-12)
    basis = dft_basis(W, nb, seg.dtype)
    fn = _refine_pallas_batchable(actual_fs, max_half, nb, 71.0, 800.0,
                                  interpret=True)
    got_f0, got_sc = jax.vmap(fn, in_axes=(0, None, 0, None))(seg, phase, f0,
                                                              basis)
    for i in range(N):
        want_f0, want_sc = fn(seg[i], phase, f0[i], basis)
        np.testing.assert_array_equal(np.asarray(got_f0[i]),
                                      np.asarray(want_f0))
        np.testing.assert_array_equal(np.asarray(got_sc[i]),
                                      np.asarray(want_sc))


def test_refine_bucketed_matches_single_block():
    """The f0-bucketed refinement fan-out must reproduce the single-bucket
    result exactly: smaller bases share the bin angles (K/S == bins/fft) and
    dropped columns are masked-zero window samples."""
    from world_tpu.f0.harvest import (_bucket_caps, _refine_block,
                                      _refine_bucketed)

    rng = np.random.RandomState(11)
    actual_fs = 7350.0
    max_half = int(np.ceil(3 * actual_fs / 71.0 / 2))
    W = 2 * max_half + 1
    C2, F = 12, 300
    assert len(_bucket_caps(max_half)) >= 3
    seg = jnp.asarray(rng.randn(F, W))
    t_c = jnp.asarray(np.arange(F) / 1000.0)
    f0 = rng.rand(C2, F) * 720 + 75
    f0[rng.rand(C2, F) < 0.5] = 0.0          # sparse slots
    f0[0, :4] = 1e-12                        # degenerate rows stay masked
    cands = jnp.asarray(f0)
    want = _refine_block(seg, t_c, cands, actual_fs, 71.0, 800.0, max_half)
    got = _refine_bucketed(seg, t_c, cands, actual_fs, 71.0, 800.0, max_half)
    # exact on the MXU (sequential-K accumulation); the CPU dot may re-block
    # the sum, so allow last-ulp noise here
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-9, atol=1e-12)


def test_refine_dft_pallas_at_bucket_shapes():
    """The fused kernel must stay correct at every production bucket size
    (the f0-bucketed fan-out instantiates it at shrinking (W, S); the full
    size is covered by the golden e2e tests, the small ones only here)."""
    from world_tpu.f0.harvest import _bucket_caps
    from world_tpu.ops.refine_dft import (_refine_pallas, dft_basis,
                                          refine_full_xla)

    actual_fs = 7350.0
    rng = np.random.RandomState(7)
    full = int(np.ceil(3 * actual_fs / 71.0 / 2))
    for cap in _bucket_caps(full):
        W = 2 * cap + 1
        S = int(2 ** np.ceil(np.log2(W) + 1))
        nb = S // 2 + 1
        C, B = 4, 150
        # only candidates whose window fits this cap are routed to it
        f0_min = 3.0 * actual_fs / (2.0 * cap)
        seg = jnp.asarray(rng.randn(B, W))
        phase = jnp.asarray(rng.randn(B, W) * 1e-3)
        f0 = jnp.asarray(rng.rand(C, B) * (790 - f0_min) + f0_min)
        f0 = f0.at[0, :6].set(1e-12)
        basis = dft_basis(W, nb, seg.dtype)
        got = _refine_pallas(seg, phase, f0, basis, actual_fs, cap, nb,
                             71.0, 800.0, interpret=True)
        want = refine_full_xla(seg, phase, f0, basis, actual_fs, cap, nb,
                               71.0, 800.0)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   rtol=1e-9, atol=1e-12,
                                   err_msg=f"cap={cap}")
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   rtol=1e-9, atol=1e-12,
                                   err_msg=f"cap={cap}")


def test_edge_interp_pallas_matches_xla():
    from fractions import Fraction

    from world_tpu.f0.events import batched_interval_interp
    from world_tpu.ops.edge_interp import _interval_interp_pallas

    rng = np.random.RandomState(1)
    fs = 7350.0
    n = 3000
    Q = 400
    stride = fs * 0.001
    t = np.arange(n) / fs
    rows = []
    for f in (80.0, 125.0, 333.0, 707.0):
        rows.extend([np.sin(2 * np.pi * f * t + rng.rand() * 6)
                     + 0.05 * rng.randn(n) for _ in range(3)])
    rows.append(np.zeros(n))                  # edgeless row (all +-inf chains)
    rows.append(rng.randn(n) * 1e-6)          # near-noise row
    x = jnp.asarray(np.stack(rows))
    tq = jnp.asarray(np.arange(Q) / 1000.0)

    frac = Fraction(float(stride)).limit_denominator(1000)
    want_f0, want_m = batched_interval_interp(x, fs, tq, stride)
    for blk in (8, 16):                  # both tile heights _pick_blk can use
        got_f0, got_m = _interval_interp_pallas(x, tq, fs, frac.numerator,
                                                frac.denominator, Q, blk=blk,
                                                interpret=True)
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
        gf, wf = np.asarray(got_f0), np.asarray(want_f0)
        both_nan = np.isnan(gf) & np.isnan(wf)
        np.testing.assert_allclose(np.where(both_nan, 0.0, gf),
                                   np.where(both_nan, 0.0, wf),
                                   rtol=1e-10, atol=1e-10)


def test_edge_interp_pallas_f32_split_dot_exact():
    """The f32 path samples through 3 bf16 MXU passes (ops.dot_exact_b).
    The decomposition reconstructs picked values exactly, so kernel-vs-twin
    disagreement is bounded by ordinary f32 evaluation-order noise in the
    surrounding chain/interp arithmetic (measured: kernel and twin are each
    ~5e-5 relative from the f64 ground truth, and 1.4e-5 from each other)."""
    from fractions import Fraction

    from world_tpu.f0.events import batched_interval_interp
    from world_tpu.ops.edge_interp import _interval_interp_pallas

    rng = np.random.RandomState(7)
    fs = 7350.0
    n = 2000
    Q = 250
    stride = fs * 0.001
    t = np.arange(n) / fs
    rows = [np.sin(2 * np.pi * f * t + rng.rand() * 6)
            + 0.05 * rng.randn(n)
            for f in (90.0, 180.0, 440.0)] + [np.zeros(n)]
    x = jnp.asarray(np.stack(rows), dtype=jnp.float32)
    tq = jnp.asarray(np.arange(Q) / 1000.0, dtype=jnp.float32)

    frac = Fraction(float(stride)).limit_denominator(1000)
    got_f0, got_m = _interval_interp_pallas(x, tq, fs, frac.numerator,
                                            frac.denominator, Q,
                                            interpret=True)
    want_f0, want_m = batched_interval_interp(x, fs, tq, stride)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
    gf, wf = np.asarray(got_f0), np.asarray(want_f0)
    both_nan = np.isnan(gf) & np.isnan(wf)
    np.testing.assert_allclose(np.where(both_nan, 0.0, gf),
                               np.where(both_nan, 0.0, wf),
                               rtol=5e-5, atol=1e-6)


def test_prod_diff_compensated_f32():
    """ops.prod_diff must beat naive f32 a*b-c*d by >=100x on cancellation-
    heavy inputs and pass through f64 untouched (the CPU golden path)."""
    import jax

    from world_tpu.ops import prod_diff

    rng = np.random.RandomState(0)
    a64 = rng.randn(50000) * 10
    b64 = rng.randn(50000) * 10
    c64 = a64 * (1 + rng.randn(50000) * 1e-6)
    d64 = b64 * (1 + rng.randn(50000) * 1e-6)
    a, b, c, d = (jnp.asarray(v, jnp.float32) for v in (a64, b64, c64, d64))
    exact = (np.asarray(a, np.float64) * np.asarray(b, np.float64)
             - np.asarray(c, np.float64) * np.asarray(d, np.float64))
    scale = np.abs(a64 * b64) + 1e-30
    naive = np.asarray(jax.jit(lambda a, b, c, d: a * b - c * d)(a, b, c, d))
    comp = np.asarray(jax.jit(prod_diff)(a, b, c, d))
    err_naive = np.max(np.abs(naive - exact) / scale)
    err_comp = np.max(np.abs(comp - exact) / scale)
    assert err_comp * 100 < err_naive, (err_comp, err_naive)

    a, b, c, d = (jnp.asarray(v) for v in (a64, b64, c64, d64))
    want = np.asarray(jax.jit(lambda a, b, c, d: a * b - c * d)(a, b, c, d))
    got = np.asarray(jax.jit(prod_diff)(a, b, c, d))
    assert np.array_equal(want, got)


def test_cos_reduced_f32_cos_grade():
    """ops.cos_reduced must hold f32-cos-grade accuracy (<= 3e-7 abs) over
    both window-argument ranges (|u| <= 1.15*pi for the Blackman c2 term,
    |u| <= 2.3*pi for c4) — the predecessor bounded polynomial's real f32
    error was ~2e-6 (and ~7e-6 after double-angle), which drove the 16 kHz
    TPU-vs-f64 candidate-score flips."""
    import jax

    from world_tpu.ops import cos_reduced

    for span in (1.15 * np.pi, 2.3 * np.pi):
        u64 = np.linspace(-span, span, 200001)
        u = jnp.asarray(u64, jnp.float32)
        got = np.asarray(jax.jit(cos_reduced)(u), np.float64)
        want = np.cos(np.asarray(u, np.float64))
        assert np.abs(got - want).max() < 3e-7, span
