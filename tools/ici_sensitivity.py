"""ICI-bandwidth sensitivity of the v5e-8 multi-chip model (VERDICT r3 #6).

The per-shard compute cells of the sharded frame are MEASURED on the real
chip (tools/shard_stage_probe.py, provenance in tools/README.md); only the
collectives are modeled by volume at an assumed effective ICI all-gather
bandwidth. This tool answers: at what bandwidth does the model stop
clearing the 60 FPS north star?

Collective volumes are analytic (shapes only — same formulas as
shard_stage_probe.py:275-289), so they are recomputed here on CPU exactly.
The compute cells are the measured sums (prep + raster max-cell +
composite_local + shade max-cell) from the probe sessions, quoted with
their window quality; where a mesh has both a clean and a mid-noise
window, BOTH are swept (the honest range).

Run: VKTF_FORCE_CPU=1 python tools/ici_sensitivity.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("VKTF_FORCE_CPU", "1")

BANDWIDTHS_GBPS = (37.5, 75.0, 150.0)

# Measured per-device compute (prep_micro + raster_shard max-cell +
# composite_local + shade_slice max-cell), ms — tools/README.md rows cited.
# (mesh, preset) -> list of (label, compute_ms)
MEASURED_COMPUTE_MS = {
    ((4, 2), "sponza"): [
        ("clean r3", 0.61 + 4.59 + 0.19 + 2.57),     # 9.54 ms @75 probe
        ("mid-noise r3", 12.45 - 1.58),              # worst of the 3 windows
    ],
    ((2, 4), "sponza"): [
        ("mid-noise r3", None),  # 15.44 ms total @75; compute = total - coll
    ],
    ((8, 1), "sponza"): [
        ("mid-noise r3", None),  # 14.4 ms total @75
    ],
    ((4, 2), "flythrough"): [
        ("clean r3", 21.46 - 3.73),                  # 4K unified-shade probe
        ("mid-noise r3", 24.2 - 3.73),
    ],
    ((2, 4), "flythrough"): [
        ("r2 pre-unified", None),  # 38.1 ms total @75 (conservative)
    ],
    ((8, 1), "flythrough"): [
        ("r2 pre-unified", None),  # 34.4 ms total @75
    ],
}

# total frame ms at the 75 GB/s assumption for rows where only the total
# was recorded (compute back-derived as total - coll@75)
TOTAL_AT_75 = {
    ((2, 4), "sponza"): 15.44,
    ((8, 1), "sponza"): 14.4,
    ((2, 4), "flythrough"): 38.1,
    ((8, 1), "flythrough"): 34.4,
}

PRESET_RES = {"sponza": (1920, 1080), "flythrough": (3840, 2160)}


def collective_mb(meta, config, gp, sp):
    """Itemized collective volume (MB) — shard_stage_probe.py:275-289."""
    n_dev = gp * sp
    th, tw = config.tile_shape
    pw = config.padded_width
    tiles_y = -(-config.height // th)
    tiles_y += (-tiles_y) % sp
    ph = tiles_y * th
    band_h = ph // sp
    rh = band_h // gp
    S = config.msaa_samples

    t = meta.num_triangles
    t_pad = -(-t // n_dev) * n_dev
    t_micro = t_pad // n_dev
    t_local = t_pad // gp

    row_b = 2 * 128
    per_tri = (9 + 9 + 6 + 2 + 1 + 4) * 4 + 1
    npx_band = S * band_h * pw * max(meta.peel_layers, 1)
    vol = {
        "table_all_gather_MB": (t_pad - t_micro) * row_b / 1e6,
        "setup_sp_gather_MB": (t_local - t_micro) * per_tri / 1e6,
        "pmin_x2_MB": 2 * npx_band * 4 * 2 * (gp - 1) / gp / 1e6,
        "rgba_gather_MB": 3 * (band_h - rh) * pw / 1e6,
    }
    return vol


def main():
    from vktf_tpu.config import RenderConfig
    from vktf_tpu.models.scenes import build_preset
    from vktf_tpu.scene.flatten import flatten_assets

    metas = {}
    for preset, (w, h) in PRESET_RES.items():
        _scene, meta, _aux = flatten_assets(build_preset(preset))
        config = RenderConfig(width=w, height=h, msaa_samples=4,
                              backend="pallas")
        metas[preset] = (meta, config)

    rows = []
    for (mesh, preset), cells in MEASURED_COMPUTE_MS.items():
        gp, sp = mesh
        meta, config = metas[preset]
        vol = collective_mb(meta, config, gp, sp)
        total_mb = sum(vol.values())
        for label, compute in cells:
            if compute is None:
                compute = TOTAL_AT_75[(mesh, preset)] - total_mb / 75.0
            row = {
                "preset": preset, "mesh": f"({gp},{sp})", "window": label,
                "compute_ms": round(compute, 2),
                "coll_MB": round(total_mb, 1),
            }
            for bw in BANDWIDTHS_GBPS:
                frame = compute + total_mb / bw
                row[f"{bw:g}GBps"] = (
                    f"{frame:.1f}ms/{1e3 / frame:.1f}fps"
                )
            # bandwidth at which the north star (60 FPS = 16.67 ms) is lost
            budget = 1e3 / 60.0 - compute
            row["min_GBps_for_60fps"] = (
                round(total_mb / budget, 1) if budget > 0 else "never"
            )
            rows.append(row)
            print(json.dumps(row))

    print()
    hdr = (f"{'preset':<11} {'mesh':<6} {'window':<15} {'comp':>6} "
           f"{'MB':>6} " + " ".join(f"{bw:g} GB/s".rjust(14)
                                    for bw in BANDWIDTHS_GBPS)
           + "  min GB/s for 60")
    print(hdr)
    for r in rows:
        print(f"{r['preset']:<11} {r['mesh']:<6} {r['window']:<15} "
              f"{r['compute_ms']:>6} {r['coll_MB']:>6} "
              + " ".join(str(r[f"{bw:g}GBps"]).rjust(14)
                         for bw in BANDWIDTHS_GBPS)
              + f"  {r['min_GBps_for_60fps']}")


if __name__ == "__main__":
    main()
