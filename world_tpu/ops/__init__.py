"""Pallas TPU kernels for the flop-dense, memory-local hot stages.

Each kernel has a pure-XLA twin used on CPU backends (and as the oracle in
tests); the Pallas path activates on TPU-class backends only.
"""
import jax


def on_tpu() -> bool:
    """True when the default backend compiles Pallas/Mosaic kernels."""
    return jax.default_backend() in ("tpu", "axon")
