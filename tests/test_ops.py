"""Pallas kernel parity: each TPU kernel must match its pure-XLA twin.

The kernels run in interpreter mode here (tests run on the CPU backend);
on TPU the same kernel code compiles via Mosaic.
"""
import numpy as np

import jax.numpy as jnp


def test_refine_dft_pallas_matches_xla():
    from world_tpu.ops.refine_dft import (_refine_pallas, dft_basis,
                                          refine_dft_select_xla)

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
    K = jnp.asarray(rng.randint(0, nb, (C, B, 6)).astype(np.int32))
    basis = dft_basis(W, nb, seg.dtype)
    got = _refine_pallas(seg, phase, f0, K, basis, actual_fs, max_half, nb,
                         interpret=True)
    want = refine_dft_select_xla(seg, phase, f0, K, basis, actual_fs,
                                 max_half, nb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-9, atol=1e-12)
