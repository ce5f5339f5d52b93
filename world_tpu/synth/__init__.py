from .classic import synthesis, synthesis_a
from .requiem import synthesis_requiem
from .seeds import get_seeds_signals

__all__ = ["synthesis", "synthesis_a", "synthesis_requiem", "get_seeds_signals"]
