"""Headless kernel compile check.

TPU-native rebuild of the reference's `check_shaders` tool
(lupin/src/tools/check_shaders.rs:14-19): builds every render executable
(all integrators, falsecolor, debug, tonemap, denoise, sharded step) against
a tiny scene without rendering anything meaningful — catches lowering
errors in one command.

Usage: python -m lupinpathtracer_tpu.apps.check_kernels
"""

from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp

    from ..core.types import (
        BakedPathtraceParams,
        FalsecolorType,
        PathtraceDesc,
        PathtraceType,
    )
    from ..io import builtin
    from ..render import renderer, tonemap
    from ..denoise.atrous import denoise
    from ..scene.flatten import build_scene_tpu

    scene, cams = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene)
    desc = PathtraceDesc()
    desc.camera_transform = cams[0].transform
    desc.camera_params = cams[0].params
    baked = BakedPathtraceParams(max_bounces=2, samples_per_pixel=1)

    checks = []

    def _ptcheck(pt):
        # Fresh descriptor per check: a shared desc would make every lambda
        # compile whatever type it holds at CALL time (the last one).
        import copy

        d = copy.deepcopy(desc)
        d.pathtrace_type = pt
        return lambda: renderer.pathtrace_scene(
            tpu, renderer.new_accumulation_buffer(8, 8), d, baked
        )

    for pt in PathtraceType:
        checks.append((f"pathtrace[{pt.name}]", _ptcheck(pt)))
    checks.append(
        (
            "falsecolor[ALBEDO]",
            lambda: renderer.pathtrace_scene_falsecolor(
                tpu, renderer.new_accumulation_buffer(8, 8), desc, baked,
                FalsecolorType.ALBEDO,
            ),
        )
    )
    checks.append(
        (
            "debug[tri_checks]",
            lambda: renderer.pathtrace_scene_debug(
                tpu, renderer.new_accumulation_buffer(8, 8), desc, baked
            ),
        )
    )
    checks.append(
        (
            "tonemap",
            lambda: tonemap.tonemap_and_fit_aspect(
                jnp.ones((8, 8, 3)), jnp.float32(0.0), 10, 10, True, True
            ),
        )
    )
    checks.append(("denoise", lambda: denoise(jnp.ones((16, 16, 3)), iterations=2)))

    # BVH/packet path: a UV sphere forces several superleaves so the packet
    # traversal + fused attr kernels (kernels/pallas_packet.py) lower too.
    import numpy as np

    from ..core.types import Material
    from ..scene.scene import InstanceCPU, MeshCPU, SceneCPU

    lat = np.linspace(0.1, np.pi - 0.1, 24)
    lon = np.linspace(0, 2 * np.pi, 32, endpoint=False)
    pts = np.array(
        [
            [np.sin(a) * np.cos(b), np.cos(a) + 1.5, np.sin(a) * np.sin(b)]
            for a in lat
            for b in lon
        ],
        np.float32,
    )
    idx = []
    for i in range(23):
        for j in range(32):
            a = i * 32 + j
            b = i * 32 + (j + 1) % 32
            c = (i + 1) * 32 + j
            d = (i + 1) * 32 + (j + 1) % 32
            idx += [[a, b, c], [b, d, c]]
    sph = SceneCPU(
        meshes=[
            MeshCPU(
                positions=pts, indices=np.asarray(idx, np.int32),
                normals=None, texcoords=None, colors=None,
            )
        ],
        instances=[
            InstanceCPU(
                frame=np.eye(3, 4, dtype=np.float32), mesh_idx=0, mat_idx=0
            )
        ],
        materials=[Material()],
        environments=[],
        textures=[],
    )
    bvh_tpu = build_scene_tpu(sph, dense_max_tris=64)
    desc_b = PathtraceDesc()
    desc_b.camera_transform = cams[0].transform
    desc_b.camera_params = cams[0].params
    desc_b.pathtrace_type = PathtraceType.STANDARD
    checks.append(
        (
            "pathtrace[STANDARD, packet BVH]",
            lambda: renderer.pathtrace_scene(
                bvh_tpu, renderer.new_accumulation_buffer(8, 8), desc_b, baked
            ),
        )
    )

    # TL_STREAM variant: the sphere instanced 5x as a two-level scene with
    # LUPIN_PACKET_STREAM forced, so the HBM-streamed per-leaf metadata
    # lowering (4-slot SMEM ring, 3-stage DMA pipeline) compiles too.
    sph5 = SceneCPU(
        meshes=sph.meshes,
        instances=[
            InstanceCPU(
                frame=np.array(
                    [[1, 0, 0, 2.5 * k], [0, 1, 0, 0], [0, 0, 1, 0]],
                    np.float32,
                ),
                mesh_idx=0, mat_idx=0,
            )
            for k in range(5)
        ],
        materials=[Material()],
        environments=[],
        textures=[],
    )
    stream_tpu = build_scene_tpu(sph5, dense_max_tris=64, two_level=True)

    def _check_stream():
        import os

        from ..core.vec3 import V3
        from ..kernels import intersect as _it
        from ..kernels import pallas_packet as _pp

        old = os.environ.get("LUPIN_PACKET_STREAM")
        os.environ["LUPIN_PACKET_STREAM"] = "1"
        try:
            assert not _pp.smem_tables_fit(stream_tpu)
            W4 = _it.scene_tri_matrix(stream_tpu)
            n = 256
            ro = V3(
                jnp.linspace(-1.0, 11.0, n), jnp.full(n, 8.0),
                jnp.zeros(n),
            )
            rd = V3(jnp.zeros(n), jnp.full(n, -1.0), jnp.zeros(n))
            return _pp.packet_traverse(stream_tpu, ro, rd, 1e-3, W4)[0]
        finally:
            if old is None:
                os.environ.pop("LUPIN_PACKET_STREAM", None)
            else:
                os.environ["LUPIN_PACKET_STREAM"] = old

    checks.append(("packet BVH [TL_STREAM two-level]", _check_stream))

    if len(jax.devices()) >= 2:
        from ..parallel.sharding import make_tile_mesh, render_progressive_sharded

        checks.append(
            (
                "sharded step",
                lambda: render_progressive_sharded(
                    tpu, desc, baked, 8, 8 * min(len(jax.devices()), 8), 1,
                    mesh=make_tile_mesh(min(len(jax.devices()), 8)),
                ),
            )
        )

    failed = 0
    for name, fn in checks:
        t0 = time.time()
        try:
            out = fn()
            jax.tree.map(lambda x: jnp.asarray(x).block_until_ready(), out)
            print(f"  OK   {name} ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report every failure
            failed += 1
            print(f"  FAIL {name}: {type(e).__name__}: {e}")
    if failed:
        raise SystemExit(f"{failed} kernel checks failed")
    print("all kernel checks passed")


if __name__ == "__main__":
    main()
