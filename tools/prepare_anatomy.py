#!/usr/bin/env python
"""Anatomy of the 5.4 ms small-op residue (VERDICT r4 next #1).

One process, one tunnel session:
  1. time the production prepare_cam program (camera half of prepare);
  2. opcode census of its compiled HLO (how many kernels? what are they?);
  3. time the FUSED candidate: prepare_cam + pack_tri_data + bbox_rows +
     table-build input transposes in ONE program (the raster/table
     programs then start from the packed stream — "coarser fusion
     boundary");
  4. time pack_tri_data+bbox as its own program (what raster pays today);
  5. time shade_addr (phase A) vs a gather-only variant (isolates the
     addressing math), + HLO census of phase A.

    python tools/prepare_anatomy.py 2>&1 | tee /tmp/prepare_anatomy.log
"""
from __future__ import annotations

import collections
import json
import re
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from stage_probe import device_time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vktf_tpu.config import RenderConfig  # noqa: E402
from vktf_tpu.mathx import Camera, ViewFrustumParams  # noqa: E402
from vktf_tpu.models.scenes import build_preset  # noqa: E402
from vktf_tpu.ops.pipeline import PallasFrameProgram  # noqa: E402
from vktf_tpu.ops.raster_pallas import pack_tri_data  # noqa: E402
from vktf_tpu.runtime.cache import enable_persistent_cache  # noqa: E402
from vktf_tpu.scene.flatten import flatten_assets  # noqa: E402
from bench import CAMERAS  # noqa: E402

enable_persistent_cache()
config = RenderConfig(width=1920, height=1080, msaa_samples=4,
                      backend="pallas")
scene, meta, _aux = flatten_assets(build_preset("sponza"))
position, direction = CAMERAS["sponza"]
camera = Camera(position, direction,
                ViewFrustumParams(np.radians(45.0), 1920 / 1080, 0.1, 1.0e6))
vp, cam_pos = camera.view_projection_transform, camera.position

prog = PallasFrameProgram(meta, config)
t0 = time.time()
prog.warmup(scene, vp, cam_pos)
print(f"warmup {time.time() - t0:.1f} s", flush=True)

mrows, mrowsT, lights, aabbs = prog._maybe_scene_update(scene)
setup = prog._prepare_cam(scene, mrows, mrowsT, aabbs, vp)
perm = prog._perm_fn(setup)
tri_id, depth = prog._raster(setup, perm)
table = prog._table(setup, scene)


def bbox_rows_of(setup):
    valid, bbox = setup["valid"], setup["bbox"]
    return jnp.stack(
        [jnp.where(valid, bbox[:, 0], 2**30).astype(jnp.float32),
         jnp.where(valid, bbox[:, 1], 2**30).astype(jnp.float32),
         jnp.where(valid, bbox[:, 2], -(2**30)).astype(jnp.float32),
         jnp.where(valid, bbox[:, 3], -(2**30)).astype(jnp.float32)],
        axis=0)


def pack_only(setup):
    td = pack_tri_data(setup, None, id_base=0)
    return td, bbox_rows_of(setup)


def prepare_packed(scene, mrows, aabbs, view_projection):
    """The fused candidate: camera prepare -> packed stream + table inputs."""
    setup = prog._prepare_cam.__wrapped__(scene, mrows, mrows.T, aabbs,
                                          view_projection)
    td = pack_tri_data(setup, None, id_base=0)
    br = bbox_rows_of(setup)
    t = setup["edge"].shape[0]
    edge9 = setup["edge"].reshape(t, 9).T
    anchor2 = setup["anchor"].T
    return td, br, edge9, anchor2


def shade_addr_gather_only(tri_id, depth, table):
    """Phase A minus the pool addressing (winner + gather + transpose)."""
    from vktf_tpu.ops.pipeline import (_flat_pad_chunks, _shade_chunks,
                                       _tiled_pixel_coords, _tiled_winner)
    from vktf_tpu.ops.shade_table import gather_rows

    ids = tri_id if tri_id.ndim == 4 else tri_id[None]
    deps = depth if depth.ndim == 4 else depth[None]
    num_tiles = ids.shape[1]
    th, tw = config.tile_shape
    id_px, frac = _tiled_winner(ids, deps, config)
    n_px = num_tiles * th * tw
    shade_chunk, n_pad = _shade_chunks(n_px, config)
    outs = []
    for l in range(ids.shape[0]):
        idp = _flat_pad_chunks(id_px[l], n_px, shade_chunk, n_pad, fill=-1)
        for tri_c in idp:
            trow = gather_rows(table, jnp.maximum(tri_c, 0))
            outs.append(trow.T)
    return tuple(outs), frac


pack_jit = jax.jit(pack_only)
packed_jit = jax.jit(prepare_packed)
gather_only_jit = jax.jit(shade_addr_gather_only)

# warm
_ = jax.block_until_ready(pack_jit(setup))
_ = jax.block_until_ready(packed_jit(scene, mrows, aabbs, vp))
_ = jax.block_until_ready(gather_only_jit(tri_id, depth, table))

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

stages = [
    ("prepare_cam", prog._prepare_cam, (scene, mrows, mrowsT, aabbs, vp)),
    ("pack_only", pack_jit, (setup,)),
    ("prepare_packed", packed_jit, (scene, mrows, aabbs, vp)),
    ("shade_addr", prog._shade_addr, (tri_id, depth, table)),
    ("addr_gather_only", gather_only_jit, (tri_id, depth, table)),
]
for name, fn, a in stages:
    device_time(fn, *a, n=1, rpc_s=rpc_s)

results = {}
for rep in range(3):
    for name, fn, a in stages:
        dt = device_time(fn, *a, n=30, rpc_s=rpc_s) * 1e3
        results.setdefault(name, []).append(dt)
        print(f"rep{rep} {name:18s} {dt:7.3f} ms", flush=True)
print(json.dumps({k: round(min(v), 3) for k, v in results.items()}),
      flush=True)


def hlo_census(jitted, args, label):
    txt = jitted.lower(*args).compile().as_text()
    ops = collections.Counter(re.findall(r"= (?:\([^)]*\) )?([a-z-]+)", txt))
    n_fusion_defs = len(re.findall(r"^%?fused_computation", txt, re.M))
    entry = txt.split("ENTRY")[-1]
    entry_ops = collections.Counter(
        re.findall(r"= (?:\([^)]*\) )?([a-z-]+)", entry))
    print(f"--- {label}: entry ops {sum(entry_ops.values())}, "
          f"fusion defs {n_fusion_defs}")
    print(f"entry: {dict(entry_ops.most_common(15))}")
    print(f"all:   {dict(ops.most_common(15))}", flush=True)
    return txt


txt_p = hlo_census(prog._prepare_cam, (scene, mrows, mrowsT, aabbs, vp),
                   "prepare_cam")
txt_a = hlo_census(prog._shade_addr, (tri_id, depth, table), "shade_addr")
txt_pp = hlo_census(packed_jit, (scene, mrows, aabbs, vp), "prepare_packed")
with open("/tmp/prepare_cam_hlo.txt", "w") as f:
    f.write(txt_p)
with open("/tmp/shade_addr_hlo.txt", "w") as f:
    f.write(txt_a)
with open("/tmp/prepare_packed_hlo.txt", "w") as f:
    f.write(txt_pp)
print("HLO written to /tmp/*_hlo.txt", flush=True)
