"""Multi-chip rendering: image tiles sharded over a device mesh.

The reference is strictly single-GPU; its scaling axis is the spatial tile
loop (renderer.rs:651-670, TileParams) that splits one frame into bounded
dispatches. On TPU that axis maps directly onto the device mesh: row-blocks
of the image are sharded over a 1-D `tiles` mesh with `shard_map`, every
chip traces its block independently (per-pixel RNG streams are keyed by
absolute pixel index, so no cross-chip coordination is needed), and the
final gather to host rides the normal output path. Rendering is
embarrassingly parallel per tile — no collectives until the image is
assembled, exactly as SURVEY.md §2.5 prescribes.

A `psum`-based sample-sharding mode is also provided (each chip renders the
FULL image at 1/n of the samples and the mesh averages with one psum) —
useful when the image is small but spp is large.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import rng as rng_mod
from ..core import vec3 as v3c
from ..core.types import BakedPathtraceParams, PathtraceDesc
from ..render import integrators
from ..render.camera import compute_camera_ray
from ..render.renderer import _camera_args


def make_tile_mesh(num_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("tiles",))


def _trace_block(
    scene, cam, gx, gy, W, H, accum_counter, rng_seed, ray_epsilon,
    max_radiance, spp, max_bounces, ptype, is_ortho, sample_offset=0,
):
    """Render a flat pixel batch (the shared core of all sharded modes)."""

    pixel_idx = (gy * W + gx).astype(jnp.uint32)
    ctx = integrators.make_ctx(scene, ray_epsilon)
    resolution = (jnp.float32(W), jnp.float32(H))

    # Same backend selection as the single-chip dispatch
    # (renderer._render_pathtrace): mega-eligible scenes run the fused
    # on-chip megakernel inside the shard too.
    from ..kernels import intersect, pallas_mega

    if pallas_mega.applicable(scene, ptype) and intersect._use_pallas():
        acc, _ = pallas_mega.mega_pathtrace_spp(
            scene, ctx["W"], pixel_idx, gx, gy, resolution, cam, is_ortho,
            accum_counter, rng_seed, spp, ptype, max_bounces, max_radiance,
            ray_epsilon, sample_offset=sample_offset,
        )
    else:
        acc, _ = integrators.pathtrace_spp(
            scene, ctx, pixel_idx, gx, gy, resolution, cam, is_ortho,
            accum_counter, rng_seed, spp, ptype, max_bounces, max_radiance,
            sample_offset=sample_offset,
        )
    return v3c.to_rows(acc / float(spp))


def make_sharded_render_step(
    mesh: Mesh,
    width: int,
    height: int,
    spp: int,
    max_bounces: int,
    ptype: int,
    is_ortho: bool,
    mode: str = "tiles",
):
    """Build a jitted multi-chip render step.

    mode='tiles': row-blocks of the image sharded over the mesh (the
    reference's TileParams axis, one tile per chip per step).
    mode='samples': spp sharded; one psum_scatter-free mean over the mesh.
    Returns step(scene, image, cam, counter, seed, eps, max_rad) -> image.
    """

    n = mesh.devices.size
    assert height % n == 0, f"image height {height} must divide over {n} devices"
    rows = height // n

    scene_spec = P()  # replicated
    if mode == "tiles":
        img_spec = P("tiles", None, None)
    else:
        img_spec = P()

    def body(scene, image_block, cam, counter, seed, eps, max_rad):
        idx = jax.lax.axis_index("tiles")
        if mode == "tiles":
            ybase = idx * rows
            xs = jnp.arange(width, dtype=jnp.int32)
            ys = ybase + jnp.arange(rows, dtype=jnp.int32)
            gx = jnp.broadcast_to(xs[None, :], (rows, width)).reshape(-1)
            gy = jnp.broadcast_to(ys[:, None], (rows, width)).reshape(-1)
            color = _trace_block(
                scene, cam, gx, gy, width, height, counter, seed, eps,
                max_rad, spp, max_bounces, ptype, is_ortho,
            ).reshape(rows, width, 3)
        else:
            xs = jnp.arange(width, dtype=jnp.int32)
            ys = jnp.arange(height, dtype=jnp.int32)
            gx = jnp.broadcast_to(xs[None, :], (height, width)).reshape(-1)
            gy = jnp.broadcast_to(ys[:, None], (height, width)).reshape(-1)
            color = _trace_block(
                scene, cam, gx, gy, width, height, counter, seed, eps,
                max_rad, spp, max_bounces, ptype, is_ortho,
                sample_offset=idx * spp,
            ).reshape(height, width, 3)
            # Average partial sample sets across the mesh (ICI collective).
            color = jax.lax.pmean(color, axis_name="tiles")

        # Progressive blend (pathtracer.wgsl:279-288) on the local block.
        color = jnp.maximum(color, 0.0)
        wgt = 1.0 / jnp.maximum(counter.astype(jnp.float32), 1.0)
        blended = jnp.maximum(image_block * (1.0 - wgt) + color * wgt, 0.0)
        return jnp.where(counter != 0, blended, color)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(scene_spec, img_spec, P(), P(), P(), P(), P()),
        out_specs=img_spec,
        check_vma=False,
    )

    @partial(jax.jit, donate_argnames=("image",))
    def step(scene, image, cam, counter, seed, eps, max_rad):
        return sharded(scene, image, cam, counter, seed, eps, max_rad)

    return step


def render_progressive_sharded(
    scene,
    desc: PathtraceDesc,
    baked: BakedPathtraceParams,
    width: int,
    height: int,
    accumulations: int,
    mesh: Mesh | None = None,
    mode: str = "tiles",
):
    """Multi-chip analog of render_progressive (example1.rs:39-53)."""

    if mesh is None:
        mesh = make_tile_mesh()
    step = make_sharded_render_step(
        mesh,
        width,
        height,
        int(baked.samples_per_pixel),
        int(baked.max_bounces),
        int(desc.pathtrace_type),
        bool(desc.camera_params.is_orthographic),
        mode=mode,
    )
    cam = _camera_args(desc)
    image = jnp.zeros((height, width, 3), jnp.float32)
    for i in range(accumulations):
        image = step(
            scene,
            image,
            cam,
            jnp.uint32(i),
            jnp.uint32(desc.advanced.rng_seed),
            jnp.float32(desc.advanced.ray_epsilon),
            jnp.float32(desc.advanced.max_radiance),
        )
    return np.asarray(image)
