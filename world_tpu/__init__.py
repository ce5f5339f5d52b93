"""world_tpu — a TPU-native (JAX/XLA/Pallas) speech vocoder framework.

A from-scratch rebuild of the WORLD vocoder with the same capabilities as
tuanad121/Python-WORLD: F0 estimation (DIO / Harvest / SWIPE'), StoneMask
refinement, CheapTrick spectral envelope, D4C / D4C-Requiem aperiodicity,
classic and Requiem synthesis, and feature codecs — redesigned for TPU:
batched fixed-shape masked compute under jit, vmap over frames/candidates,
associative-scan IIRs, and sharded multi-utterance batches over a device
mesh.
"""

__version__ = "0.1.0"

from .api import World  # noqa: E402

__all__ = ["World", "__version__"]
