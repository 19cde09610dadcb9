"""Scale-envelope sanity render: the 2M-triangle synthetic terrain
(VERDICT r3 #4 — the reference's Bistro/Classroom-class headline envelope,
/root/reference/README.md:20-37) rendered through the default BVH backend
and committed as an HDR artifact.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from lupinpathtracer_tpu.core.types import (
        BakedPathtraceParams, PathtraceDesc, PathtraceType,
    )
    import jax.numpy as jnp

    from lupinpathtracer_tpu.io import hdr as hdr_io
    from lupinpathtracer_tpu.io.synthetic import build_scene_terrain
    from lupinpathtracer_tpu.render import renderer
    from lupinpathtracer_tpu.scene.flatten import build_scene_tpu
    from lupinpathtracer_tpu.scene.scene import get_scene_stats

    W, H, SPP, ACCUMS = 960, 540, 4, 8  # 32 samples total
    t0 = time.time()
    scene, cams = build_scene_terrain(n_tris=2_000_000, seed=0)
    tpu = build_scene_tpu(scene)
    print(f"build: {time.time() - t0:.1f}s stats={get_scene_stats(scene)} "
          f"sl={tpu.sl_count} stride={tpu.sl_stride}", flush=True)

    desc = PathtraceDesc()
    desc.camera_transform = cams[0].transform
    desc.camera_params = cams[0].params
    desc.pathtrace_type = PathtraceType.STANDARD
    desc.advanced.max_radiance = 10.0
    desc.accum_params.accumulate = True
    baked = BakedPathtraceParams(max_bounces=8, samples_per_pixel=SPP)

    image = renderer.new_accumulation_buffer(W, H)
    for i in range(ACCUMS):
        desc.accum_params.counter = i
        t1 = time.time()
        image = renderer.pathtrace_scene(tpu, image, desc, baked)
        _ = float(jnp.sum(image))  # sync; block_until_ready unreliable on axon
        print(f"accum {i + 1}/{ACCUMS}: {time.time() - t1:.2f}s", flush=True)

    arr = np.asarray(image)
    assert np.isfinite(arr).all(), "non-finite pixels in terrain render"
    os.makedirs("out_hw", exist_ok=True)
    hdr_io.write_hdr("out_hw/terrain2M_960x540_32spp.hdr", arr[..., :3])
    print(f"saved out_hw/terrain2M_960x540_32spp.hdr "
          f"mean={arr[..., :3].mean():.4f} total={time.time() - t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
