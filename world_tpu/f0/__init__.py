from .dio import dio
from .stonemask import stonemask

__all__ = ["dio", "stonemask"]
