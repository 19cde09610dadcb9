"""Noise-floor audit for the full-workload ds4 residuals (VERDICT r4 weak #5).

Question: arealights1 cam1's full-workload ds4_rmse = 1.93% — Monte-Carlo
noise or bias? Decisive experiment: render the SAME camera twice at the
golden sample count (1000 spp) with different RNG seeds and compare the
two renders to each other with the same ds4 metric. Two independent
renders carry sqrt(2)x the single-render noise, so

    single-render noise floor ~= self_ds4 / sqrt(2)

If 1.93% <= that floor, the residual is noise; if the floor is ~0.3%,
there's a bias to find. Runs at 1/4 linear scale: the per-ds4-cell sample
count (16 x spp) — which sets the MC noise after the 4x4 box — is scale-
invariant, and 1/16 the pixels makes the experiment ~35 min instead of
~10 h. (Reference comparison config: lupin_tests/src/main.rs:29-37.)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LUPIN_SKIP_PROBE", "1")

import numpy as np

from lupinpathtracer_tpu.apps import golden_test as gt
from lupinpathtracer_tpu.core.types import (
    BakedPathtraceParams, PathtraceDesc, PathtraceType,
)
from lupinpathtracer_tpu.io import hdr as hdr_io
from lupinpathtracer_tpu.io import yocto_json
from lupinpathtracer_tpu.render import renderer
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

SCENE = sys.argv[1] if len(sys.argv) > 1 else "arealights1"
CAM = int(sys.argv[2]) if len(sys.argv) > 2 else 1
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
SCALE = 0.25

scene, cams = yocto_json.load_scene_yoctogl_v24(
    f"/root/reference/test_scenes/{SCENE}/{SCENE}.json"
)
tpu = build_scene_tpu(scene)
cam = cams[CAM]
w, h = gt.camera_resolution(cam.params.aspect)
w = max(8, int(w * SCALE))
h = max(8, int(h * SCALE))
accums = max(1, SPP // gt.SPP_PER_PASS)
print(f"{SCENE} cam{CAM}: {w}x{h} @ {accums * gt.SPP_PER_PASS}spp x2 seeds",
      flush=True)

renders = []
for seed in (0, 77):
    desc = PathtraceDesc()
    desc.camera_transform = cam.transform
    desc.camera_params = cam.params
    desc.pathtrace_type = PathtraceType.STANDARD
    desc.advanced.max_radiance = gt.MAX_RADIANCE
    desc.advanced.rng_seed = seed
    baked = BakedPathtraceParams(
        max_bounces=gt.BOUNCES, samples_per_pixel=gt.SPP_PER_PASS
    )
    t0 = time.time()
    img = renderer.render_progressive(tpu, desc, baked, w, h, accums)
    img = np.asarray(img)
    print(f"  seed={seed}: {time.time() - t0:.0f}s mean={img.mean():.5f}",
          flush=True)
    out = f"out_hw/noise_{SCENE}_cam{CAM}_seed{seed}.hdr"
    hdr_io.write_hdr(out, img)
    renders.append(img)

md, rr, ds4 = gt.compare(renders[0], renders[1])
print(f"self  : max_dist={md:.3f} rel_rmse={rr:.4f} ds4_rmse={ds4:.4f}")
print(f"single-render noise floor ~= ds4/sqrt(2) = {ds4 / np.sqrt(2):.4f}")

gpath = f"/root/reference/test_scenes/{SCENE}/render_cam{CAM}.hdr"
if os.path.exists(gpath):
    golden0 = hdr_io.read_hdr(gpath)
    for i, r in enumerate(renders):
        # Identical downscale+align to run_scene's reduced-scale path.
        golden = golden0
        if golden.shape[:2] != r.shape[:2]:
            K = golden.shape[0] // r.shape[0]
            golden = (
                golden[: r.shape[0] * K, : r.shape[1] * K]
                .reshape(r.shape[0], K, r.shape[1], K, 3)
                .mean(axis=(1, 3))
            )
            r = gt.align_for_scale(r, K)
            golden = golden[: r.shape[0]]
        md, rr, ds4 = gt.compare(r, golden)
        print(f"seed{i} vs golden: max_dist={md:.3f} rel_rmse={rr:.4f} "
              f"ds4_rmse={ds4:.4f}")
print("done")
