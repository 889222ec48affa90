"""Trustworthy device timing over the axon tunnel.

block_until_ready is optimistic on tunneled devices; the only reliable sync
is materializing (a tiny slice of) the result to host. We chain a tiny
sum-dependent fetch after each call and subtract the measured no-op roundtrip.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    return np.asarray(jnp.sum(leaves[0].ravel()[-8:]))


_roundtrip = None


def roundtrip_ms() -> float:
    global _roundtrip
    if _roundtrip is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8,), jnp.float32)
        _sync(f(x))
        t0 = time.perf_counter()
        for _ in range(20):
            _sync(f(x))
        _roundtrip = (time.perf_counter() - t0) / 20
    return _roundtrip * 1e3


def timeit(fn, *args, n=10, warmup=2, label="", jit=True):
    f = jax.jit(fn) if jit else fn
    for _ in range(warmup):
        out = f(*args)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
        _sync(out)
    dt = (time.perf_counter() - t0) / n - roundtrip_ms() / 1e3
    if label:
        print(f"{label:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt
