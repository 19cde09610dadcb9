"""Headless renderer CLI.

TPU-native rebuild of lupin_examples/example1 (example1.rs:6-57): load or
build a scene, run a progressive accumulation loop, save the HDR result.
Extends the example with scene-file input, camera/integrator/AOV selection,
tiled rendering, multi-chip sharding, denoising, and tonemapped output —
the headless union of the reference's example + viewer controls.

Usage:
  python -m lupinpathtracer_tpu.apps.render_cli [scene.json] \
      --out output.hdr --width 512 --height 512 --spp 5 --accums 200 \
      --bounces 8 --integrator standard --camera 0 [--falsecolor albedo]
      [--denoise] [--tonemap out.png] [--shard] [--tile-size 400]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..core.types import (
    BakedPathtraceParams,
    FalsecolorType,
    PathtraceDesc,
    PathtraceType,
    get_num_tiles,
)
from ..io import builtin, textures as tex_io, yocto_json
from ..render import renderer, tonemap
from ..scene.flatten import build_scene_tpu


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scene", nargs="?", default=None, help="Yocto JSON scene; Cornell box if omitted")
    p.add_argument("--out", default="output.hdr")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=0, help="0 = from camera aspect")
    p.add_argument("--spp", type=int, default=5)
    p.add_argument("--accums", type=int, default=200)
    p.add_argument("--bounces", type=int, default=8)
    p.add_argument("--camera", type=int, default=0)
    p.add_argument(
        "--integrator",
        choices=["standard", "mis", "naive", "direct"],
        default="standard",
    )
    p.add_argument("--falsecolor", default=None, help="AOV name (albedo, normals, ...)")
    p.add_argument("--max-radiance", type=float, default=100.0)
    p.add_argument("--ray-epsilon", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tile-size", type=int, default=0, help=">0 enables tiled dispatch")
    p.add_argument("--denoise", action="store_true")
    p.add_argument("--tonemap", default=None, help="also save tonemapped PNG/JPG here")
    p.add_argument("--exposure", type=float, default=0.0)
    p.add_argument("--filmic", action="store_true")
    p.add_argument("--shard", action="store_true", help="shard tiles over all chips")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    t0 = time.time()
    if args.scene:
        scene, cams = yocto_json.load_scene_yoctogl_v24(args.scene)
    else:
        scene, cams = builtin.build_scene_cornell_box()
    if not cams:
        raise SystemExit("scene has no cameras")
    cam = cams[min(args.camera, len(cams) - 1)]
    tpu = build_scene_tpu(scene)
    print(f"scene ready in {time.time() - t0:.1f}s "
          f"({tpu.num_world_tris} world tris, bvh={tpu.use_bvh})")

    W = args.width
    H = args.height or max(1, round(W / cam.params.aspect))

    desc = PathtraceDesc()
    desc.camera_transform = cam.transform
    desc.camera_params = cam.params
    desc.pathtrace_type = PathtraceType[args.integrator.upper()]
    desc.advanced.max_radiance = args.max_radiance
    desc.advanced.ray_epsilon = args.ray_epsilon
    desc.advanced.rng_seed = args.seed
    baked = BakedPathtraceParams(
        max_bounces=args.bounces, samples_per_pixel=args.spp
    )

    t0 = time.time()
    if args.falsecolor:
        fc = FalsecolorType[args.falsecolor.upper()]
        image = renderer.new_accumulation_buffer(W, H)
        for i in range(args.accums):
            desc.accum_params.accumulate = True
            desc.accum_params.counter = i
            image = renderer.pathtrace_scene_falsecolor(tpu, image, desc, baked, fc)
        img = np.asarray(image)
    elif args.shard:
        from ..parallel.sharding import render_progressive_sharded

        img = render_progressive_sharded(
            tpu, desc, baked, W, H, args.accums
        )
    elif args.tile_size > 0:
        desc.tile_params.enabled = True
        desc.tile_params.tile_size = args.tile_size
        nx, ny = get_num_tiles(W, H, args.tile_size)
        image = renderer.new_accumulation_buffer(W, H)
        for i in range(args.accums):
            desc.accum_params.accumulate = True
            desc.accum_params.counter = i
            for t in range(nx * ny):
                desc.tile_params.tile_idx = t
                image = renderer.pathtrace_scene(tpu, image, desc, baked)
        img = np.asarray(image)
    else:
        img = renderer.render_progressive(
            tpu, desc, baked, W, H, args.accums, progress=True
        )
    dt = time.time() - t0
    spp_total = args.spp * args.accums
    print(f"rendered {W}x{H} @ {spp_total}spp in {dt:.1f}s "
          f"({W * H * spp_total / dt / 1e6:.1f} Mpaths/s)")

    if args.denoise:
        from ..denoise.atrous import denoise as atrous

        albedo = np.asarray(
            renderer.pathtrace_scene_falsecolor(
                tpu, renderer.new_accumulation_buffer(W, H), desc,
                BakedPathtraceParams(max_bounces=1, samples_per_pixel=8),
                FalsecolorType.ALBEDO,
            )
        )
        normal = np.asarray(
            renderer.pathtrace_scene_falsecolor(
                tpu, renderer.new_accumulation_buffer(W, H), desc,
                BakedPathtraceParams(max_bounces=1, samples_per_pixel=8),
                FalsecolorType.NORMALS,
            )
        )
        img = np.asarray(atrous(img, albedo, normal))
        print("denoised")

    tex_io.save_texture(args.out, img, srgb_encode=False)
    print(f"saved {args.out}")
    if args.tonemap:
        mapped = np.asarray(
            tonemap.tonemap(img, args.exposure, args.filmic, True)
        )
        tex_io.save_texture(args.tonemap, mapped, srgb_encode=False)
        print(f"saved {args.tonemap}")


if __name__ == "__main__":
    main()
