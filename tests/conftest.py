"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

The golden tests compare against the NumPy reference (float64), so tests run
with ``jax_enable_x64``.  The library itself is dtype-polymorphic: on TPU the
same code paths run in float32 (see bench.py).
"""
import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the pipeline cores are large programs and
# recompiling them every pytest run dominates suite wall time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def mwm():
    """The reference fixture waveform (22050 Hz mono float64 in [-1, 1))."""
    from scipy.io import wavfile

    fs, x = wavfile.read("/root/reference/test/test-mwm.wav")
    # normalization used by the reference's own scripts (example/prosody.py:13)
    return fs, x.astype(np.float64) / (2 ** 15 - 1)
