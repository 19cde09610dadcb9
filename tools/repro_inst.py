"""Minimal repro for the instanced_100k sort-leg compile crash
(BENCH_r04: both backends failed; out_hw/bench.log ends in
`tpu_compile_helper subprocess exit code 1`).

Hypothesis: pair_intersect/attr_fetch work items are scalar-prefetch SMEM
operands sized W_CAP = n_pb + n_sl; at 100k global superleaves that is
6 x 100k x 4 B ~= 2.4 MB against the ~1 MB SMEM budget. A SMALL ray count
keeps everything else tiny, so a failure here pins the n_sl term.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["LUPIN_NO_PACKET"] = "1"
os.environ.setdefault("LUPIN_SKIP_PROBE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from lupinpathtracer_tpu.core import vec3 as v3
from lupinpathtracer_tpu.io.synthetic import build_scene_instanced_field
from lupinpathtracer_tpu.kernels import intersect as isx
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu

n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
scene, cams = build_scene_instanced_field(
    n_instances=n_inst, seed=0, tris_per_mesh=64
)
tpu = build_scene_tpu(scene)
print(f"n_inst={n_inst} n_sl={tpu.sl_count} stride={tpu.sl_stride} "
      f"two_level={tpu.two_level} depth={tpu.top_depth}", flush=True)

B = 16384
g = np.random.default_rng(0)
o = np.zeros((3, B), np.float32)
o[1] = 50.0  # above the field, looking down
d = g.normal(size=(3, B)).astype(np.float32)
d[1] = -np.abs(d[1]) - 0.5
d /= np.linalg.norm(d, axis=0, keepdims=True)
ro = v3.V3(*(jnp.asarray(o[i]) for i in range(3)))
rd = v3.V3(*(jnp.asarray(d[i]) for i in range(3)))

h = jax.jit(lambda s, o_, d_: isx.closest_hit_wavefront(s, o_, d_, 1e-3))(
    tpu, ro, rd)
print(f"hits={int(jnp.sum(h.hit))}/{B} mean_t="
      f"{float(jnp.mean(jnp.where(h.hit, h.dst, 0))):.3f}", flush=True)
ia = jax.jit(lambda s, hh: isx.wavefront_fetch_attrs(s, hh))(tpu, h)
print(f"attrs finite={bool(jnp.isfinite(ia.n.x).all())}", flush=True)
print("ok", flush=True)
