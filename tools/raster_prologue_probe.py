#!/usr/bin/env python
"""Decompose the PRODUCTION raster stage (packed setup + cached perm +
sort="none") into XLA prologue vs kernel — the round-5 follow-up to
tools/copyout_layout_probe.py, which showed the skeleton probes'
"init_only 5.5 ms floor" cannot be kernel init/copy-out (the identical
init work alone measures ~1 ms synthetically).

Suspect: the prologue that runs INSIDE the raster program every frame —
perm gathers tri_data[:, perm] (24 rows) + bbox_rows[:, perm] (4 rows),
the group-safe reduce + row rewrite, group/chunk bbox reductions, and the
per-bin hit-list binning (overlap matrix + argsort + counts).

Cells (production args throughout, same-process interleaved):
  full        production raster stage (anchor; ~20-21 ms round 5)
  empty       _PROBE_BODY="empty" (prologue + kernel minus window bodies)
  init_only   _PROBE_BODY="init_only" (prologue + kernel init/copy-out)
  prologue    _RETURN_KERNEL_INPUTS=True (NO kernel at all)
  prol_noperm prologue with perm=None (timing-only: drops the 28-row
              permute gathers; binning shapes identical)

Attribution: prologue - prol_noperm = the permute; init_only - prologue =
kernel launch+init+copy-out (should match the synthetic ~1 ms);
prologue - (group/bin half) sizes what a fused/precomputed form can win.

    python tools/raster_prologue_probe.py > /tmp/raster_prologue.log 2>&1
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from vktf_tpu.config import RenderConfig
from vktf_tpu.mathx import Camera, ViewFrustumParams
from vktf_tpu.models.scenes import build_preset
from vktf_tpu.scene.flatten import flatten_assets
from vktf_tpu.ops.pipeline import PallasFrameProgram
from vktf_tpu.ops import raster_pallas as rp
from vktf_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()
config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                      backend="pallas")
scene, meta, _aux = flatten_assets(build_preset("sponza"))
camera = Camera((-9.0, 1.7, 0.0), (1.0, 0.05, 0.0),
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam = camera.view_projection_transform, camera.position
ph, pw = config.padded_height, config.padded_width
layers = config.resolved_peel_layers(meta.peel_layers)

prog = PallasFrameProgram(meta, config)
setup, _lights = jax.jit(prog._prepare)(scene, vp, cam)
setup = jax.tree.map(jax.block_until_ready, setup)
perm = jax.block_until_ready(jax.jit(prog._perm_fn)(setup))
print(f"tris={meta.num_triangles} layers={layers} "
      f"interleave={config.resolved_interleave()}", flush=True)


def raster_call(su, pm):
    return rp.rasterize_pallas(
        su, ph, pw, tile_shape=config.tile_shape,
        msaa_samples=config.msaa_samples, chunk=config.pallas_chunk,
        sort="none", perm=pm,
        layers=layers, window_rows=config.raster_window_rows,
        group_size=config.raster_group_size,
        interleave=config.resolved_interleave(),
        columns=config.raster_columns, assemble=False,
    )


fns = {}
for name, body, kin, use_perm in (
    ("full", "full", False, True),
    ("empty", "empty", False, True),
    ("init_only", "init_only", False, True),
    ("prologue", "full", True, True),
    ("prol_noperm", "full", True, False),
):
    rp._PROBE_BODY = body
    rp._RETURN_KERNEL_INPUTS = kin
    t0 = time.time()
    if use_perm:
        fns[name] = jax.jit(raster_call).lower(setup, perm).compile()
        fns[name] = (fns[name], (setup, perm))
    else:
        f = jax.jit(lambda su: raster_call(su, None)).lower(setup).compile()
        fns[name] = (f, (setup,))
    print(f"compiled {name} in {time.time() - t0:.1f} s", flush=True)
rp._PROBE_BODY = "full"
rp._RETURN_KERNEL_INPUTS = False

rpcs = []
for _ in range(6):
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
    rpcs.append(time.time() - t0)
rpc_s = min(rpcs)
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

N = 10
results = {m: [] for m in fns}
for rep in range(4):
    for m, (f, a) in fns.items():
        acc = jnp.zeros((), jnp.float32)
        np.asarray(acc)
        t0 = time.time()
        for _ in range(N):
            out = f(*a)
            v = jax.tree.leaves(out)[0]
            acc = acc + jnp.sum(v.ravel()[-64:].astype(jnp.float32))
        np.asarray(acc)
        dt = (time.time() - t0 - rpc_s) / N * 1e3
        results[m].append(dt)
        print(f"rep{rep} {m:12s} {dt:7.2f} ms", flush=True)
best = {m: round(min(v), 2) for m, v in results.items()}
print(json.dumps(best), flush=True)
print(f"permute            = {best['prologue'] - best['prol_noperm']:6.2f} ms",
      flush=True)
print(f"kernel init+copy   = {best['init_only'] - best['prologue']:6.2f} ms",
      flush=True)
print(f"kernel machinery   = {best['empty'] - best['init_only']:6.2f} ms",
      flush=True)
print(f"kernel body        = {best['full'] - best['empty']:6.2f} ms",
      flush=True)
