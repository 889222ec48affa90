#!/usr/bin/env python
"""A/B the raster chunk-binning hit-list construction.

Production builds each tile's ordered hit-chunk list with a stable bool
argsort (`argsort(~overlap)` — carries an iota payload through the sort).
Since chunk ids are unique per row, `sort(where(overlap, id, INT_MAX))`
is the same list with HALF the sort data and i32 keys. raster_split.py
measured binning at ~7 ms standalone (510 tiles x ~1056 chunks at 1080p
sponza) — worth shaving.

MEASURED: the keyed sort wins standalone (median 4.9 vs 6.6 ms here) but
LOSES inside the full raster stage (tools/binning_frame_ab.py: median
29.9 vs 24.7 ms, argsort faster in 5/6 interleaved reps, bit-equal).
NEGATIVE at the level that matters — production keeps the stable bool
argsort (raster_pallas._BIN_ARGSORT_FORM).

    python tools/binning_ab.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp


def main() -> int:
    rng = np.random.default_rng(0)
    num_tiles, n_chunks = 510, 1056
    # realistic sparsity: ~11 hits/tile mean (raster_split.py print), with
    # Morton locality -> contiguous-ish runs
    overlap_np = np.zeros((num_tiles, n_chunks), bool)
    for i in range(num_tiles):
        k = max(1, int(rng.poisson(11)))
        start = rng.integers(0, n_chunks - k)
        overlap_np[i, start:start + k] = True
        # plus a few strays
        overlap_np[i, rng.integers(0, n_chunks, 3)] = True
    overlap = jnp.asarray(overlap_np)

    def argsort_form(ov):
        hit_list = jnp.argsort(~ov, axis=1, stable=True).astype(jnp.int32)
        hit_counts = jnp.sum(ov, axis=1).astype(jnp.int32)
        return hit_counts, hit_list

    def sort_form(ov):
        ids = jnp.arange(ov.shape[1], dtype=jnp.int32)[None, :]
        keyed = jnp.where(ov, ids, jnp.int32(2**31 - 1))
        hit_list = jnp.sort(keyed, axis=1)
        hit_counts = jnp.sum(ov, axis=1).astype(jnp.int32)
        return hit_counts, hit_list

    ja = jax.jit(argsort_form)
    js = jax.jit(sort_form)

    # equality in the counted prefix (tails differ: argsort yields
    # non-hit ids, sort yields INT_MAX — the kernel reads only the prefix)
    ca, la = jax.tree.map(np.asarray, ja(overlap))
    cs, ls = jax.tree.map(np.asarray, js(overlap))
    assert np.array_equal(ca, cs)
    ok = all(
        np.array_equal(la[i, : ca[i]], ls[i, : cs[i]])
        for i in range(num_tiles)
    )
    print(f"prefix equal: {ok}", flush=True)

    def device_time(fn, reps=30):
        acc = jnp.zeros((), jnp.int32)

        def probe(a):
            c, l = fn(overlap)
            return a + c[0] + l[0, 0]

        acc = probe(acc)
        np.asarray(acc)
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = probe(acc)
        np.asarray(acc)
        return (time.perf_counter() - t0) / reps * 1000.0

    res = {"argsort": [], "sort": []}
    for rep in range(5):
        for name, fn in (("argsort", ja), ("sort", js)):
            ms = device_time(fn)
            res[name].append(ms)
            print(f"rep{rep} {name:8s} {ms:6.2f} ms", flush=True)
    for name, v in res.items():
        print(f"median {name:8s} {np.median(v):6.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
