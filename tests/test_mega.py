"""Fused dense megakernel (kernels/pallas_mega.py) vs the wavefront jnp
path (integrators.pathtrace_spp): identical PCG streams and draw order must
produce the same accumulated radiance and traced-segment counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lupinpathtracer_tpu.core.types import PathtraceDesc, PathtraceType
from lupinpathtracer_tpu.io import builtin
from lupinpathtracer_tpu.kernels import intersect, pallas_mega
from lupinpathtracer_tpu.render import integrators
from lupinpathtracer_tpu.render.renderer import _camera_args
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu


@pytest.fixture(scope="module")
def cornell():
    scene, cams = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene)
    desc = PathtraceDesc()
    desc.camera_transform = cams[0].transform
    desc.camera_params = cams[0].params
    return tpu, _camera_args(desc)


def _pixel_grid(W, H):
    xs = jnp.arange(W, dtype=jnp.int32)
    ys = jnp.arange(H, dtype=jnp.int32)
    gx = jnp.broadcast_to(xs[None, :], (H, W)).reshape(-1)
    gy = jnp.broadcast_to(ys[:, None], (H, W)).reshape(-1)
    pix = (gy * W + gx).astype(jnp.uint32)
    return pix, gx, gy


@pytest.mark.parametrize("ptype", [PathtraceType.STANDARD, PathtraceType.NAIVE])
@pytest.mark.slow
def test_mega_matches_wavefront(cornell, ptype):
    tpu, cam = cornell
    assert pallas_mega.applicable(tpu, int(ptype))
    W = H = 16
    SPP, BOUNCES = 2, 4
    pix, gx, gy = _pixel_grid(W, H)
    res = (jnp.float32(W), jnp.float32(H))

    ctx = integrators.make_ctx(tpu, jnp.float32(1e-3))
    acc_ref, nt_ref = integrators.pathtrace_spp(
        tpu, ctx, pix, gx, gy, res, cam, False,
        jnp.uint32(3), jnp.uint32(0), SPP, int(ptype), BOUNCES,
        jnp.float32(10.0),
    )
    acc, nt = pallas_mega.mega_pathtrace_spp(
        tpu, ctx["W"], pix, gx, gy, res, cam, False,
        jnp.uint32(3), jnp.uint32(0), SPP, int(ptype), BOUNCES,
        jnp.float32(10.0), jnp.float32(1e-3),
        ray_block=128, precise=True,
    )
    np.testing.assert_array_equal(np.asarray(nt), np.asarray(nt_ref))
    for a, b in zip(acc, acc_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )

    # Fast path (hand-split bf16 matmuls): per-lane hits may flip on
    # borderline intersections, but the image statistics must agree.
    acc_f, nt_f = pallas_mega.mega_pathtrace_spp(
        tpu, ctx["W"], pix, gx, gy, res, cam, False,
        jnp.uint32(3), jnp.uint32(0), SPP, int(ptype), BOUNCES,
        jnp.float32(10.0), jnp.float32(1e-3),
        ray_block=128,
    )
    assert abs(int(nt_f.sum()) - int(nt_ref.sum())) <= 0.001 * int(nt_ref.sum())
    m_ref = float(np.asarray(acc_ref.x).mean())
    m_f = float(np.asarray(acc_f.x).mean())
    assert abs(m_f - m_ref) < 0.02 * max(m_ref, 1e-6), (m_f, m_ref)


@pytest.mark.slow
def test_mega_unaligned_batch(cornell):
    """A non-128-multiple pixel count pads internally and unpads exactly."""

    tpu, cam = cornell
    W, H = 10, 9  # B = 90
    pix, gx, gy = _pixel_grid(W, H)
    res = (jnp.float32(W), jnp.float32(H))
    ctx = integrators.make_ctx(tpu, jnp.float32(1e-3))
    acc, nt = pallas_mega.mega_pathtrace_spp(
        tpu, ctx["W"], pix, gx, gy, res, cam, False,
        jnp.uint32(1), jnp.uint32(0), 1, int(PathtraceType.STANDARD), 4,
        jnp.float32(10.0), jnp.float32(1e-3),
    )
    assert acc.x.shape == (90,)
    assert np.isfinite(np.asarray(acc.x)).all()
    acc_ref, nt_ref = integrators.pathtrace_spp(
        tpu, ctx, pix, gx, gy, res, cam, False,
        jnp.uint32(1), jnp.uint32(0), 1, int(PathtraceType.STANDARD), 4,
        jnp.float32(10.0),
    )
    np.testing.assert_array_equal(np.asarray(nt), np.asarray(nt_ref))
    np.testing.assert_allclose(
        np.asarray(acc.x), np.asarray(acc_ref.x), rtol=2e-4, atol=2e-5
    )


def test_mega_gate_rejects_bvh_scenes():
    from lupinpathtracer_tpu.io import yocto_json

    scene, _ = yocto_json.load_scene_yoctogl_v24(
        "/root/reference/test_scenes/arealights1/arealights1.json"
    )
    tpu = build_scene_tpu(scene)
    assert tpu.use_bvh
    assert not pallas_mega.applicable(tpu, int(PathtraceType.STANDARD))
