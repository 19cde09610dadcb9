"""Renderer smoke + consistency tests (tiny resolutions, CPU mesh).

The full golden-image regression (reference workload, 1000 spp, TPU) lives
in apps/golden_test.py; these keep CI fast while covering every dispatch
path: all four integrators, falsecolor AOVs, debug heatmaps, tiling,
accumulation, tonemap, denoise, and the sharded multi-chip step.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lupinpathtracer_tpu.core.types import (
    BakedPathtraceParams,
    FalsecolorType,
    PathtraceDesc,
    PathtraceType,
    get_num_tiles,
)
from lupinpathtracer_tpu.io import builtin
from lupinpathtracer_tpu.render import renderer, tonemap
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu


@pytest.fixture(scope="module")
def cornell():
    scene, cams = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene)
    desc = PathtraceDesc()
    desc.camera_transform = cams[0].transform
    desc.camera_params = cams[0].params
    desc.advanced.max_radiance = 10.0
    return tpu, desc


def _render(tpu, desc, w=12, h=12, spp=1, bounces=2, accums=1):
    baked = BakedPathtraceParams(max_bounces=bounces, samples_per_pixel=spp)
    return renderer.render_progressive(tpu, desc, baked, w, h, accums)


@pytest.mark.parametrize(
    "ptype",
    [
        PathtraceType.STANDARD,
        PathtraceType.MIS,
        PathtraceType.NAIVE,
        PathtraceType.DIRECT,
    ],
)
def test_integrators_smoke(cornell, ptype):
    tpu, desc = cornell
    desc.pathtrace_type = ptype
    img = _render(tpu, desc)
    assert img.shape == (12, 12, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0
    assert img.min() >= 0.0


def test_accumulation_reduces_variance(cornell):
    tpu, desc = cornell
    desc.pathtrace_type = PathtraceType.STANDARD
    one = _render(tpu, desc, w=16, h=16, spp=4, accums=1)
    many = _render(tpu, desc, w=16, h=16, spp=4, accums=8)
    # Means should agree; accumulation must not change the expectation
    # (tolerance covers MC noise at these tiny sample counts).
    assert abs(one.mean() - many.mean()) < 0.25 * max(many.mean(), 1e-3)
    # And the 8-accum image must be smoother (variance across pixels of a
    # mostly-flat region drops with sample count).
    assert many.std() <= one.std() * 1.2


def test_tiled_matches_full(cornell):
    tpu, desc = cornell
    desc.pathtrace_type = PathtraceType.NAIVE
    baked = BakedPathtraceParams(max_bounces=2, samples_per_pixel=1)
    full = _render(tpu, desc, w=16, h=16)
    desc.tile_params.enabled = True
    desc.tile_params.tile_size = 8
    nx, ny = get_num_tiles(16, 16, 8)
    img = renderer.new_accumulation_buffer(16, 16)
    desc.accum_params.accumulate = True
    desc.accum_params.counter = 0
    for t in range(nx * ny):
        desc.tile_params.tile_idx = t
        img = renderer.pathtrace_scene(tpu, img, desc, baked)
    desc.tile_params.enabled = False
    np.testing.assert_allclose(np.asarray(img), full, atol=1e-5)


def test_auto_tile_self_bounding(monkeypatch):
    """A whole-frame BVH dispatch whose rays x sl_stride exceeds the budget
    must auto-split into tiles (renderer self-bounding — the terrain-OOM
    fix, out_hw/terrain_render.log) and produce the same image: RNG streams
    key on absolute pixel id, so tiling is invisible to the result."""

    scene, cams = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene, dense_max_tris=8)
    assert tpu.use_bvh and tpu.sl_count > 0
    desc = PathtraceDesc()
    desc.camera_transform = cams[0].transform
    desc.camera_params = cams[0].params
    desc.advanced.max_radiance = 10.0
    desc.pathtrace_type = PathtraceType.NAIVE
    full = _render(tpu, desc, w=16, h=16, spp=1, bounces=2)
    monkeypatch.setenv("LUPIN_DISPATCH_RAY_STRIDE_BUDGET", "1")
    monkeypatch.setenv("LUPIN_DISPATCH_TILE_FLOOR", "8")
    tiled = _render(tpu, desc, w=16, h=16, spp=1, bounces=2)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-5)


def test_falsecolor_modes(cornell):
    tpu, desc = cornell
    baked = BakedPathtraceParams(max_bounces=2, samples_per_pixel=1)
    for fc in (
        FalsecolorType.ALBEDO,
        FalsecolorType.NORMALS,
        FalsecolorType.EMISSION,
        FalsecolorType.INSTANCE,
    ):
        img = renderer.pathtrace_scene_falsecolor(
            tpu, renderer.new_accumulation_buffer(8, 8), desc, baked, fc
        )
        a = np.asarray(img)
        assert np.isfinite(a).all()
    # Albedo of the cornell walls should be dominated by the wall colors.
    alb = np.asarray(
        renderer.pathtrace_scene_falsecolor(
            tpu, renderer.new_accumulation_buffer(16, 16), desc, baked,
            FalsecolorType.ALBEDO,
        )
    )
    assert 0.2 < alb.mean() < 0.9


def test_debug_heatmap(cornell):
    tpu, desc = cornell
    baked = BakedPathtraceParams(max_bounces=2, samples_per_pixel=1)
    img = renderer.pathtrace_scene_debug(
        tpu, renderer.new_accumulation_buffer(8, 8), desc, baked,
        mode="tri_checks", heatmap_max=40.0,
    )
    assert np.isfinite(np.asarray(img)).all()


def test_tonemap():
    img = jnp.asarray(np.linspace(0, 4, 48, dtype=np.float32).reshape(4, 4, 3))
    out = np.asarray(tonemap.tonemap(img, jnp.float32(0.0), True, True))
    assert out.shape == (4, 4, 3)
    assert out.min() >= 0.0 and out.max() <= 1.01
    fit = np.asarray(
        tonemap.tonemap_and_fit_aspect(img, jnp.float32(0.0), 8, 6, False, True)
    )
    assert fit.shape == (8, 6, 3)
    # Letterbox regions are black.
    assert fit[0].max() == 0.0 or fit[:, 0].max() == 0.0


def test_denoise_reduces_noise(rng):
    from lupinpathtracer_tpu.denoise.atrous import denoise

    clean = np.zeros((32, 32, 3), np.float32)
    clean[8:24, 8:24] = 1.0
    noisy = clean + rng.normal(0, 0.3, clean.shape).astype(np.float32)
    out = np.asarray(denoise(jnp.asarray(noisy), iterations=3))
    err_in = np.abs(noisy - clean).mean()
    err_out = np.abs(out - clean).mean()
    assert err_out < err_in * 0.6


def test_sharded_matches_single(cornell):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from lupinpathtracer_tpu.parallel.sharding import (
        make_tile_mesh,
        render_progressive_sharded,
    )

    tpu, desc = cornell
    desc.pathtrace_type = PathtraceType.NAIVE
    desc.tile_params.enabled = False
    baked = BakedPathtraceParams(max_bounces=2, samples_per_pixel=1)
    single = _render(tpu, desc, w=16, h=16, accums=2)
    mesh = make_tile_mesh(2)
    sharded = render_progressive_sharded(
        tpu, desc, baked, width=16, height=16, accumulations=2, mesh=mesh
    )
    np.testing.assert_allclose(sharded, single, atol=1e-5)


@pytest.mark.parametrize(
    "ptype", [PathtraceType.STANDARD, PathtraceType.MIS]
)
@pytest.mark.slow
def test_regen_matches_sequential_spp(cornell, ptype):
    """pathtrace_spp (wavefront path regeneration) must reproduce the
    sequential per-sample loop bit-for-bit on an opaque scene: same RNG
    streams, same clamped accumulation order."""

    from lupinpathtracer_tpu.core import rng as rng_mod
    from lupinpathtracer_tpu.core import vec3 as v3
    from lupinpathtracer_tpu.render import integrators
    from lupinpathtracer_tpu.render.camera import compute_camera_ray
    from lupinpathtracer_tpu.render.renderer import _camera_args

    tpu, desc = cornell
    W = H = 12
    SPP, BOUNCES, MAXRAD = 3, 4, 10.0
    cam = _camera_args(desc)
    xs = jnp.arange(W, dtype=jnp.int32)
    gx = jnp.tile(xs, H)
    gy = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
    pixel_idx = (gy * W + gx).astype(jnp.uint32)
    res = (jnp.float32(W), jnp.float32(H))
    ctx = integrators.make_ctx(tpu, jnp.float32(1e-3))

    acc_seq = v3.zeros(W * H)
    nt_seq = 0
    for s in range(SPP):
        state = rng_mod.init_state(pixel_idx, 0, 0, s)
        state, ox = rng_mod.next_f32(state)
        state, oy = rng_mod.next_f32(state)
        state, ro, rd = compute_camera_ray(
            cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
            cam["focus"], cam["aperture"], False, gx, gy, res,
            ox - 0.5, oy - 0.5, state,
        )
        radiance, state, _, nt = integrators.pathtrace(
            tpu, ctx, ro, rd, state, int(ptype), BOUNCES
        )
        acc_seq = acc_seq + integrators.clamp_radiance(radiance, MAXRAD)
        nt_seq += int(jnp.sum(nt))

    acc_wf, n_traced = integrators.pathtrace_spp(
        tpu, ctx, pixel_idx, gx, gy, res, cam, False,
        jnp.uint32(0), jnp.uint32(0), SPP, int(ptype), BOUNCES,
        jnp.float32(MAXRAD),
    )
    # Integer path structure (segments traced per sample) must match
    # EXACTLY — it proves the same RNG streams drove the same decisions.
    assert int(jnp.sum(n_traced)) == nt_seq
    # Radiance matches to 1-2 ulp (two separately compiled programs may
    # fuse/reassociate float adds differently).
    for a, b in zip((acc_wf.x, acc_wf.y, acc_wf.z),
                    (acc_seq.x, acc_seq.y, acc_seq.z)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-6, atol=1e-6
        )


@pytest.mark.slow  # the streams lever lost its hardware A/B and is
# env-gated off (out_hw/prof_e2e.log); 31 s of parity checking belongs in
# the slow set, not the <3 min gate
def test_spp_streams_matches_single_stream(cornell):
    """streams=K replicates lanes K times with per-stream sample offsets;
    it must draw the exact same (pixel, sample) RNG streams as streams=1 —
    identical total segments traced, radiance equal up to fp summation
    order."""

    from lupinpathtracer_tpu.render import integrators
    from lupinpathtracer_tpu.render.renderer import _camera_args

    tpu, desc = cornell
    W = H = 12
    SPP, BOUNCES, MAXRAD = 4, 4, 10.0
    cam = _camera_args(desc)
    gx = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)
    gy = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
    pixel_idx = (gy * W + gx).astype(jnp.uint32)
    res = (jnp.float32(W), jnp.float32(H))
    ctx = integrators.make_ctx(tpu, jnp.float32(1e-3))

    def run(streams):
        return integrators.pathtrace_spp(
            tpu, ctx, pixel_idx, gx, gy, res, cam, False,
            jnp.uint32(0), jnp.uint32(0), SPP,
            int(PathtraceType.STANDARD), BOUNCES, jnp.float32(MAXRAD),
            streams=streams,
        )

    acc1, nt1 = run(1)
    for K in (2, 4):
        accK, ntK = run(K)
        assert int(jnp.sum(ntK)) == int(jnp.sum(nt1))
        for a, b in zip((accK.x, accK.y, accK.z), (acc1.x, acc1.y, acc1.z)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-6, atol=1e-6
            )


@pytest.mark.slow
def test_sharded_bvh_scene_8dev(rng):
    """Tile-sharded rendering of a BVH (superleaf wavefront) scene on the
    full 8-device CPU mesh must match the single-device render — the
    multi-chip story is not dense-path-only."""

    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from tests.test_wavefront import _tri_sphere_scene
    from lupinpathtracer_tpu.parallel.sharding import (
        make_tile_mesh,
        render_progressive_sharded,
    )

    scene = _tri_sphere_scene()
    tpu = build_scene_tpu(scene, dense_max_tris=64)
    assert tpu.use_bvh and tpu.sl_count >= 2
    desc = PathtraceDesc()
    cam = np.zeros((3, 4), np.float32)
    cam[:, :3] = np.eye(3)
    cam[:, 3] = (0.0, 1.5, -6.0)
    desc.camera_transform = cam
    desc.pathtrace_type = PathtraceType.NAIVE
    desc.advanced.max_radiance = 10.0
    baked = BakedPathtraceParams(max_bounces=2, samples_per_pixel=1)
    single = _render(tpu, desc, w=16, h=16, spp=1, bounces=2, accums=1)
    sharded = render_progressive_sharded(
        tpu, desc, baked, width=16, height=16, accumulations=1,
        mesh=make_tile_mesh(8),
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


@pytest.mark.slow
def test_force_software_bvh_backend_flip(cornell):
    """PathtraceDesc.force_software_bvh flips a dense-eligible scene onto
    the wavefront BVH backend per dispatch (renderer.rs:764, :772) — both
    backends exist for every scene and agree on the image."""

    tpu, desc = cornell
    assert not tpu.use_bvh and tpu.sl_count > 0  # both backends built
    desc.pathtrace_type = PathtraceType.NAIVE
    desc.force_software_bvh = False
    dense = _render(tpu, desc, w=16, h=16, spp=2, bounces=3)
    desc.force_software_bvh = True
    bvh = _render(tpu, desc, w=16, h=16, spp=2, bounces=3)
    desc.force_software_bvh = False
    assert np.isfinite(bvh).all()
    # Same RNG streams, same intersections -> same image (tolerance covers
    # closest-hit tie-breaks on shared quad edges).
    mismatch = np.abs(dense - bvh) > 1e-3
    assert mismatch.mean() < 0.02, mismatch.mean()


def test_runtime_checks_catch_bad_indices(cornell):
    """with_runtime_checks=True validates the flattened index tables at
    dispatch (the XLA analog of the reference's WGSL bounds checking,
    renderer.rs:487-499)."""

    tpu, desc = cornell
    bad = tpu.replace(wt_mat=jnp.full_like(tpu.wt_mat, 10_000))
    baked = BakedPathtraceParams(max_bounces=1, samples_per_pixel=1)
    img = renderer.new_accumulation_buffer(8, 8)
    with pytest.raises(ValueError):
        renderer.pathtrace_scene(bad, img, desc, baked)
