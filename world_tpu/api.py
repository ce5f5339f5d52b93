"""Public API facade (the `World` class).

Mirrors the reference surface (/root/reference/world/main.py:26-384) with the
same method names and dict contract: numpy in / numpy out at the boundary,
jit-compiled JAX pipelines inside.  Grows as subsystems land.
"""


class World:
    pass
