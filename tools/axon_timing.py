"""Accurate device timing through the axon remote tunnel.

``jax.block_until_ready`` does NOT synchronize through the axon tunnel (it
returns immediately), and any host fetch costs a ~28 ms round trip.  The only
reliable way to time device work is to enqueue K calls back-to-back and pay
ONE fetch at the end; per-call device time = (wall - RTT) / K.
"""
import time

import jax
import jax.numpy as jnp


def _checksum(out):
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype")]
    total = 0.0
    for l in leaves:
        v = jnp.sum(jnp.abs(l.astype(jnp.float32))) if l.dtype != jnp.bool_ \
            else jnp.sum(l)
        total = total + v.astype(jnp.float32)
    return float(total)


def device_time(fn, *args, k: int = 16, label: str = "", verbose: bool = True):
    """Median-free pipelined timing: K queued calls, one sync."""
    out = fn(*args)
    _checksum(out)  # compile + warm both fn and the checksum programs
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    _checksum(out)
    wall = time.perf_counter() - t0
    per_call = (wall - 0.028) / k
    if verbose:
        print(f"{label:32s} {per_call*1000:9.2f} ms/call   (K={k}, wall {wall*1000:.1f} ms)")
    return per_call, out
