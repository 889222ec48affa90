#!/usr/bin/env python
"""Decompose the prepare stage (~3.9 ms at 1080p Sponza): what would a
Pallas triangle-setup kernel actually save?

  nodes   : propagate_transforms + gather_world_lights + inst_matrix
  mrows   : the (T,16) instance-matrix row gather
  setup   : triangle_setup_cm's flat component-major math
  cull    : frustum planes + AABB transform + visibility mask + valid AND

    python tools/prepare_split_probe.py
"""
from __future__ import annotations

import json
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
from vktf_tpu.mathx.bounding_box import transform_aabbs  # noqa: E402
from vktf_tpu.mathx.frustum import (  # noqa: E402
    aabbs_intersect_frustum, frustum_planes,
)
from vktf_tpu.models.scenes import build_preset  # noqa: E402
from vktf_tpu.ops.pipeline import gather_world_lights  # noqa: E402
from vktf_tpu.ops.vertex import (  # noqa: E402
    propagate_transforms, triangle_setup_cm,
)
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


def nodes_fn(sc):
    ng = propagate_transforms(sc.node_local, sc.node_parent,
                              meta.level_slices)
    lights = gather_world_lights(ng, sc.light_node, sc.light_type,
                                 sc.light_color)
    return ng[sc.inst_node], lights


def mrows_fn(inst_matrix, sc):
    return inst_matrix.reshape(-1, 16)[sc.tri_instance]


def setup_fn(tc, mrows):
    return triangle_setup_cm(tc, mrows, vp, config.width, config.height)


def cull_fn(inst_matrix, sc, valid):
    planes = frustum_planes(vp)
    world_aabbs = transform_aabbs(sc.inst_aabb, inst_matrix)
    visible = aabbs_intersect_frustum(world_aabbs, planes)
    return valid & visible[sc.tri_instance]


nodes_jit = jax.jit(nodes_fn)
mrows_jit = jax.jit(mrows_fn)
setup_jit = jax.jit(setup_fn)
cull_jit = jax.jit(cull_fn)

inst_matrix, _lights = nodes_jit(scene)
mrows = mrows_jit(inst_matrix, scene)
setup = setup_jit(scene.tri_corner, mrows)

stages = [
    ("nodes", nodes_jit, (scene,)),
    ("mrows", mrows_jit, (inst_matrix, scene)),
    ("setup_cm", setup_jit, (scene.tri_corner, mrows)),
    ("cull", cull_jit, (inst_matrix, scene, setup["valid"])),
]

for _ in range(2):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
t0 = time.time()
for _ in range(4):
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)
rpc_s = (time.time() - t0) / 4
print(f"rpc {rpc_s * 1e3:.1f} ms", flush=True)

for name, fn, a in stages:
    device_time(fn, *a, n=1, rpc_s=rpc_s)

results = {}
for rep in range(3):
    for name, fn, a in stages:
        dt = device_time(fn, *a, n=40, rpc_s=rpc_s) * 1e3
        results.setdefault(name, []).append(dt)
        print(f"rep{rep} {name:10s} {dt:7.2f} ms", flush=True)
print(json.dumps({k: round(min(v), 3) for k, v in results.items()}))
