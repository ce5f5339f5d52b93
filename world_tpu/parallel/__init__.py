from .batch import (
    make_mesh,
    batch_encode_decode,
    frame_sharded_cheaptrick,
)

__all__ = ["make_mesh", "batch_encode_decode", "frame_sharded_cheaptrick"]
