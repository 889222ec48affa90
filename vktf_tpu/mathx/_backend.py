"""Array-namespace dispatch: numpy for host math, jax.numpy inside jit.

Math primitives (quaternion/AABB/frustum) are used both host-side (camera
state updates, asset load) and inside jitted frame steps. Dispatching on the
argument type keeps host paths free of per-op JAX dispatch overhead while the
same code traces under jit.
"""

from __future__ import annotations

import numpy as np


def xp_for(*args):
    """Return jax.numpy if any argument is a JAX type (incl. tracers), else numpy."""
    for a in args:
        if a is None or isinstance(a, (np.ndarray, np.generic, float, int, list, tuple)):
            continue
        # Anything array-like that isn't numpy (jax arrays, tracers) -> jnp.
        import jax.numpy as jnp

        return jnp
    return np
