"""Split interval_interp cost: chains kernel vs sampler kernel vs tail."""
from fractions import Fraction
from functools import partial

import numpy as np
from scipy.io import wavfile

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    import importlib
    import os
    H = importlib.import_module("world_tpu.f0.harvest")
    E = importlib.import_module("world_tpu.ops.edge_interp")
    from tools.axon_timing import device_time

    blk_env = int(os.environ.get("BLK", "0"))
    if blk_env:
        E._BLK = blk_env
    local_only = bool(int(os.environ.get("LOCAL_ONLY", "0")))
    if local_only:
        # timing-only variant: skip the cross-block prefix (wrong results,
        # isolates the roll cost from the one-hot dot cost)
        def _local(v, neg, col, col2, ext, expm, reverse=False):
            s = 1
            while s < E._LB:
                v = jnp.maximum(v, E._shift_rev(v, s, neg, col) if reverse
                                else E._shift_fwd(v, s, neg, col))
                s *= 2
            return v
        E._cummax_2l = _local
    print("BLK", E._BLK, "local_only", local_only)

    fs, x_int16 = wavfile.read("/root/reference/test/test-mwm.wav")
    fs = int(fs)
    x = jnp.asarray((x_int16 / (2 ** 15 - 1)).astype(np.float32))
    signal_length = x.shape[0]
    f0_floor, f0_ceil = 71.0, 800.0
    num_samples = int(1000 * signal_length / fs + 1)
    basic_tp = jnp.asarray(np.arange(num_samples) / 1000, dtype=x.dtype)
    adj_floor, adj_ceil = f0_floor * 0.9, f0_ceil * 1.1
    boundary_f0_list = adj_floor * 2.0 ** (
        (np.arange(np.ceil(np.log2(adj_ceil / adj_floor) * 40)) + 1) / 40)

    y, actual_fs = jax.jit(lambda x: H.downsample(x, fs, 8000))(x)
    actual_fs = float(actual_fs)
    y_len = y.shape[0]
    bank, bias = H._band_filter_bank(np.asarray(boundary_f0_list), actual_fs)

    from world_tpu.dsp.fir import fir_bank_full

    @jax.jit
    def sig4_fn(y):
        conv = fir_bank_full(y, bank)
        filtered = jnp.stack([conv[b, int(s): int(s) + y_len]
                              for b, s in enumerate(bias)])
        d = jnp.diff(filtered, axis=1)
        d_pad = jnp.concatenate([d, d[:, -1:]], axis=1)
        return jnp.concatenate([filtered, -filtered, d_pad, -d_pad], axis=0)
    sig4 = sig4_fn(y)

    stride = actual_fs * 0.001
    frac = Fraction(float(stride)).limit_denominator(1000)
    pnum, qden = int(frac.numerator), int(frac.denominator)
    Q = int(basic_tp.shape[0])
    S, n = sig4.shape
    dtype = sig4.dtype
    print("S", S, "n", n, "Q", Q, "pnum/qden", pnum, qden)

    _BLK, _NCH, _LB = E._BLK, E._NCH, E._LB
    pad = (-S) % _BLK
    xp = jnp.pad(sig4, ((0, pad), (0, 0))) if pad else sig4
    Sp = S + pad
    RB = _NCH * _BLK
    QB = qden * max(1, -(-128 // qden))
    adv = (QB * pnum) // qden
    nB = -(-Q // QB)
    width = ((QB - 1) * pnum) // qden + 4
    advp = -(-width // 128) * 128
    print("QB", QB, "adv", adv, "nB", nB, "advp", advp)

    nb2 = -(-n // _LB)
    ends = np.minimum(np.arange(nb2) * _LB + _LB - 1, n - 1)
    extf_np = np.zeros((n, nb2), np.float32)
    extf_np[ends, np.arange(nb2)] = 1.0
    extr_np = np.zeros((n, nb2), np.float32)
    extr_np[np.arange(nb2) * _LB, np.arange(nb2)] = 1.0
    expm_np = np.zeros((nb2, n), np.float32)
    expm_np[np.minimum(np.arange(n) // _LB, nb2 - 1), np.arange(n)] = 1.0
    mdtype = jnp.bfloat16
    extf = jnp.asarray(extf_np, mdtype)
    extr = jnp.asarray(extr_np, mdtype)
    expm = jnp.asarray(expm_np, mdtype)

    chains_kernel = partial(E._chains_kernel, nB=nB, adv=adv, advp=advp)

    @jax.jit
    def chains_fn(xp):
        return pl.pallas_call(
            chains_kernel,
            grid=(Sp // _BLK,),
            in_specs=[
                pl.BlockSpec((_BLK, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, nb2), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, nb2), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nB, RB, advp), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLK, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((nB, _NCH * Sp, advp), dtype),
                       jax.ShapeDtypeStruct((Sp, 1), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(os.environ.get("VMEM_MB", "100")) * 2 ** 20),
        )(xp, extf, extr, expm)

    windows, m = device_time(chains_fn, xp, k=8, label="chains kernel")[1]

    oh = jnp.asarray(E._selection_matrix(pnum, qden, Q, QB, adv, advp), dtype)
    tq_b = jnp.broadcast_to(
        jnp.pad(basic_tp, (0, nB * QB - Q)).reshape(nB, 1, QB), (nB, 8, QB))
    select_kernel = partial(E._select_kernel, fs=actual_fs)

    @jax.jit
    def sampler_fn(windows, tq_b):
        return pl.pallas_call(
            select_kernel,
            grid=(nB, Sp // _BLK),
            in_specs=[
                pl.BlockSpec((1, RB, advp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, advp, 2 * QB), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, QB), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _BLK, QB), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nB, Sp, QB), dtype),
        )(windows, oh, tq_b)

    sampled = device_time(sampler_fn, windows, tq_b, k=8, label="sampler kernel")[1]

    @jax.jit
    def tail_fn(sampled):
        return sampled.transpose(1, 0, 2).reshape(Sp, nB * QB)[:S, :Q]
    device_time(tail_fn, sampled, k=8, label="transpose tail")


if __name__ == "__main__":
    main()
