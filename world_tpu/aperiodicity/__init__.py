from .d4c import d4c
from .d4c_requiem import d4c_requiem

__all__ = ["d4c", "d4c_requiem"]
