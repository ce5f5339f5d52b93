from .dio import dio
from .stonemask import stonemask
from .harvest import harvest
from .swipe import swipe

__all__ = ["dio", "stonemask", "harvest", "swipe"]
