from . import codecs
from .codecs import (hz2mel, mel2hz, get_filterbanks, encode_lfbank,
                     encode_mcep, decode_mcep, get_context, encode_vae)

__all__ = ["codecs", "hz2mel", "mel2hz", "get_filterbanks", "encode_lfbank",
           "encode_mcep", "decode_mcep", "get_context", "encode_vae"]
