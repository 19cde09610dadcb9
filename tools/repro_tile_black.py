"""Isolate the black 960x540 terrain frame to the auto-tiled dispatch:
render 256x128 of the 2M-tri terrain on TPU untiled vs auto-tiled
(budget forced), compare means. CPU interpret mode already matches
exactly (tools/repro_terrain_black.py narrowed the suspects)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LUPIN_SKIP_PROBE", "1")

import jax.numpy as jnp
import numpy as np

from lupinpathtracer_tpu.core.types import (
    BakedPathtraceParams, PathtraceDesc, PathtraceType,
)
from lupinpathtracer_tpu.io.synthetic import build_scene_terrain
from lupinpathtracer_tpu.render import renderer
from lupinpathtracer_tpu.render.renderer import _render_pathtrace as _rp
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

W, H = 256, 128
N_TRIS = int(os.environ.get("LUPIN_REPRO_NTRIS", 2_000_000))

t0 = time.time()
scene, cams = build_scene_terrain(n_tris=N_TRIS, seed=0)
tpu = build_scene_tpu(scene)
print(f"build {time.time() - t0:.1f}s n_sl={tpu.sl_count} "
      f"stride={tpu.sl_stride}", flush=True)

desc = PathtraceDesc()
desc.camera_transform = cams[0].transform
desc.camera_params = cams[0].params
desc.pathtrace_type = PathtraceType.STANDARD
desc.advanced.max_radiance = 10.0
desc.accum_params.accumulate = True
baked = BakedPathtraceParams(max_bounces=4, samples_per_pixel=2)


def render(tag, **env):
    olds = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    _rp.clear_cache()
    try:
        img = renderer.new_accumulation_buffer(W, H)
        desc.accum_params.counter = 0
        img = renderer.pathtrace_scene(tpu, img, desc, baked)
        a = np.asarray(img)
        print(f"[{tag}] mean={a[..., :3].mean():.6f} max={a.max():.4f} "
              f"row-means={[round(float(a[r * 32:(r + 1) * 32, :, :3].mean()), 4) for r in range(4)]}",
              flush=True)
        return a
    finally:
        for k, v in olds.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        _rp.clear_cache()


# Untiled: budget above 256*128*4096 = 1.34e8.
a1 = render("untiled", LUPIN_DISPATCH_RAY_STRIDE_BUDGET="900000000")
# Auto-tiled at ts=64: budget forces 64*64*4096 = 1.7e7 <= budget < tile^2.
a2 = render("tiled64", LUPIN_DISPATCH_RAY_STRIDE_BUDGET="20000000",
            LUPIN_DISPATCH_TILE_FLOOR="64")
d = np.abs(a1 - a2)
print(f"max |untiled - tiled| = {d.max():.6g}", flush=True)
print("done", flush=True)
