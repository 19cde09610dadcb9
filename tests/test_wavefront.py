"""Wavefront two-level BVH traversal vs the legacy masked-stack walk."""

import numpy as np
import jax.numpy as jnp
import pytest

from lupinpathtracer_tpu.accel import superleaf as sl_mod
from lupinpathtracer_tpu.accel.bvh import build_bvh, tri_bounds
from lupinpathtracer_tpu.core import vec3 as v3
from lupinpathtracer_tpu.io import builtin
from lupinpathtracer_tpu.kernels import intersect
from lupinpathtracer_tpu.scene.flatten import build_scene_tpu
from lupinpathtracer_tpu.core.types import Material
from lupinpathtracer_tpu.scene.scene import MeshCPU, InstanceCPU, SceneCPU


def _tri_sphere_scene(n_lat=24, n_lon=32):
    """A UV-sphere + ground quad: ~1.5k tris, forces several superleaves
    with a small stride."""

    lat = np.linspace(0.1, np.pi - 0.1, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    pts = []
    for a in lat:
        for b in lon:
            pts.append(
                [np.sin(a) * np.cos(b), np.cos(a) + 1.5, np.sin(a) * np.sin(b)]
            )
    pts = np.asarray(pts, np.float32)
    idx = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            idx += [[a, b, c], [b, d, c]]
    base = pts.shape[0]
    quad = np.array(
        [[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]], np.float32
    )
    pts = np.concatenate([pts, quad])
    idx += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    mesh = MeshCPU(
        positions=pts, indices=np.asarray(idx, np.int32),
        normals=None, texcoords=None, colors=None,
    )
    mat = Material()
    inst = InstanceCPU(frame=np.eye(3, 4, dtype=np.float32), mesh_idx=0, mat_idx=0)
    return SceneCPU(
        meshes=[mesh], instances=[inst], materials=[mat],
        environments=[], textures=[],
    )


def _random_rays(rng, B, origin_span=3.0):
    ro = v3.V3(*(jnp.asarray(rng.uniform(-origin_span, origin_span, B), jnp.float32) for _ in range(3)))
    d = rng.normal(size=(3, B)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    rd = v3.V3(*(jnp.asarray(c) for c in d))
    return ro, rd


def test_superleaf_structure():
    scene = _tri_sphere_scene()
    from lupinpathtracer_tpu.core import math3d

    m = scene.meshes[0]
    p = m.positions
    tri = m.indices
    lo, hi = tri_bounds(p[tri[:, 0]], p[tri[:, 1]], p[tri[:, 2]])
    tree = build_bvh(lo, hi)
    sls = sl_mod.build_superleaves(tree, lo.shape[0], stride=256)
    T = lo.shape[0]
    assert sls.sl_count >= 2
    assert sls.order.shape[0] == sls.sl_count * sls.stride
    # Every real triangle appears exactly once among valid rows.
    real = sls.order[sls.valid]
    assert sorted(real.tolist()) == list(range(T))
    assert (sls.sl_tri_count <= sls.stride).all()
    assert sls.sl_tri_count.sum() == T
    # Table refs decode in range; every superleaf referenced exactly once.
    tab = sls.top_tab[: sls.top_rows]
    leaf_refs = []
    for c in range(sl_mod.TOP_FAN):
        base = c * sl_mod.CH_STRIDE
        # Real child slots: non-inverted AABB.
        used = tab[:, base + sl_mod.CH_LO.start] < 1e38
        ref = (
            tab[:, base + sl_mod.CH_H2] * 65536
            + tab[:, base + sl_mod.CH_HI8] * 256
            + tab[:, base + sl_mod.CH_LO8]
        )
        leaf = (tab[:, base + sl_mod.CH_ISLEAF] > 0.5) & used
        internal = ~(tab[:, base + sl_mod.CH_ISLEAF] > 0.5) & used
        assert (ref[leaf] < sls.sl_count).all()
        assert (ref[internal] < sls.top_rows).all()
        leaf_refs.extend(ref[leaf].astype(int).tolist())
    assert sorted(leaf_refs) == list(range(sls.sl_count))
    # bf16 rounding is outward (child slot 0 of row 0 covers the root's
    # first child; global min over used slots bounds the tree min).
    used_lo = np.concatenate([
        tab[:, c * sl_mod.CH_STRIDE + sl_mod.CH_LO.start : c * sl_mod.CH_STRIDE + sl_mod.CH_LO.stop][
            tab[:, c * sl_mod.CH_STRIDE + sl_mod.CH_LO.start] < 1e38
        ]
        for c in range(sl_mod.TOP_FAN)
    ])
    assert used_lo.min() <= tree.aabb_min.min() + 1e-3


@pytest.mark.parametrize("n_rays", [512])
@pytest.mark.parametrize("backend", ["packet", "sort"])
def test_wavefront_matches_stack_walk(n_rays, backend, rng, monkeypatch):
    if backend == "sort":
        monkeypatch.setenv("LUPIN_NO_PACKET", "1")
    scene = _tri_sphere_scene()
    tpu = build_scene_tpu(scene, dense_max_tris=64)
    assert tpu.use_bvh and tpu.sl_count >= 2

    ro, rd = _random_rays(rng, n_rays)
    ref = intersect.closest_hit_bvh(tpu, ro, rd, 1e-4)
    got = intersect.closest_hit_wavefront(tpu, ro, rd, 1e-4)

    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    # The pair kernel's bf16 hi/lo 3-pass product carries ~2^-13 relative
    # error on t (pallas_bvh._pair_kernel) — well under golden tolerances.
    np.testing.assert_allclose(
        np.asarray(got.dst)[h], np.asarray(ref.dst)[h], rtol=5e-4, atol=1e-5
    )
    # The winning triangle may legitimately differ on shared edges; the
    # distances must not.
    same = np.asarray(got.tri) == np.asarray(ref.tri)
    assert same[h].mean() > 0.95


def test_wavefront_single_superleaf(rng):
    scene, _ = builtin.build_scene_cornell_box()
    tpu = build_scene_tpu(scene, dense_max_tris=8)
    assert tpu.use_bvh and tpu.top_root_is_leaf

    ro, rd = _random_rays(rng, 256, origin_span=0.8)
    ref = intersect.closest_hit_bvh(tpu, ro, rd, 1e-4)
    got = intersect.closest_hit_wavefront(tpu, ro, rd, 1e-4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    # The pair kernel's bf16 hi/lo 3-pass product carries ~2^-13 relative
    # error on t (pallas_bvh._pair_kernel) — well under golden tolerances.
    np.testing.assert_allclose(
        np.asarray(got.dst)[h], np.asarray(ref.dst)[h], rtol=5e-4, atol=1e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("n_rays", [500])  # non-multiple of the block size
def test_packet_matches_stack_walk(n_rays, rng):
    """The sort-free packet backend (kernels/pallas_packet.py) must agree
    with the masked-stack reference walk, including the active mask."""

    from lupinpathtracer_tpu.kernels import pallas_packet

    scene = _tri_sphere_scene()
    tpu = build_scene_tpu(scene, dense_max_tris=64)
    assert tpu.use_bvh and tpu.sl_count >= 2 and not tpu.two_level

    ro, rd = _random_rays(rng, n_rays)
    ref = intersect.closest_hit_bvh(tpu, ro, rd, 1e-4)
    W4 = intersect.scene_tri_matrix(tpu)
    t, u, v, det, tri = pallas_packet.packet_traverse(tpu, ro, rd, 1e-4, W4)

    hit = np.asarray(t) < intersect.F32_MAX
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    # Candidate selection runs at bf16 hi/lo 3-pass precision (the winner's
    # stored t/u/v/det are exact f32, but a ~2^-16 near-tie may pick the
    # other triangle) — same tolerance class as the sort path.
    np.testing.assert_allclose(
        np.asarray(t)[h], np.asarray(ref.dst)[h], rtol=5e-4, atol=1e-5
    )
    same = (np.asarray(tri) == np.asarray(ref.tri))[h]
    assert same.mean() > 0.95  # shared-edge ties may pick either triangle
    agree = same & h[h]
    np.testing.assert_allclose(
        np.asarray(u)[h][agree], np.asarray(ref.u)[h][agree],
        rtol=1e-4, atol=1e-5,
    )

    # Active mask: masked lanes come back as misses, others unchanged.
    act = jnp.asarray(rng.uniform(size=n_rays) < 0.5)
    t2, *_ = pallas_packet.packet_traverse(tpu, ro, rd, 1e-4, W4, active=act)
    a = np.asarray(act)
    assert (np.asarray(t2)[~a] == intersect.F32_MAX).all()
    np.testing.assert_array_equal(np.asarray(t2)[a], np.asarray(t)[a])

    # And closest_hit_wavefront routes through the packet backend for
    # single-level scenes (LUPIN_NO_PACKET unset in tests).
    got = intersect.closest_hit_wavefront(tpu, ro, rd, 1e-4)
    np.testing.assert_array_equal(np.asarray(got.hit), hit)
    np.testing.assert_allclose(
        np.asarray(got.dst)[h], np.asarray(t)[h], rtol=0, atol=0
    )


@pytest.mark.slow
def test_packet_fused_attrs_match_fetch(rng):
    """_packet_hit_attrs (traversal + in-kernel winner attr interpolation)
    must equal closest_hit_wavefront + wavefront_fetch_attrs."""

    scene = _tri_sphere_scene()
    tpu = build_scene_tpu(scene, dense_max_tris=64)
    ro, rd = _random_rays(rng, 512)

    h_ref = intersect.closest_hit_wavefront(tpu, ro, rd, 1e-4)
    ia_ref = intersect.wavefront_fetch_attrs(tpu, h_ref)
    h, ia = intersect._packet_hit_attrs(tpu, ro, rd, 1e-4)

    np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(h_ref.hit))
    hit = np.asarray(h_ref.hit)
    same = (np.asarray(h.tri) == np.asarray(h_ref.tri)) & hit
    assert same[hit].mean() > 0.95  # shared-edge ties
    for name, a, b in [
        ("n.x", ia.n.x, ia_ref.n.x),
        ("gn.z", ia.gn.z, ia_ref.gn.z),
        ("tu", ia.tu, ia_ref.tu),
        ("vca", ia.vca, ia_ref.vca),
        ("det_sign", ia.det_sign, ia_ref.det_sign),
    ]:
        np.testing.assert_allclose(
            np.asarray(a)[same], np.asarray(b)[same], rtol=1e-5, atol=1e-6,
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(ia.mat_id)[same], np.asarray(ia_ref.mat_id)[same]
    )
    # Miss lanes zeroed, like wavefront_fetch_attrs.
    assert (np.asarray(ia.n.x)[~hit] == 0.0).all()
    assert (np.asarray(ia.mat_id)[~hit] == 0).all()


@pytest.mark.slow
def test_packet_fused_attrs_tangent_rows(rng):
    """Normal-mapped scenes carry IA_TAN/IA_BIT through the fused attr
    phase — parity vs wavefront_fetch_attrs."""

    from lupinpathtracer_tpu.scene.scene import TextureCPU

    scene = _tri_sphere_scene()
    m = scene.meshes[0]
    n_pts = m.positions.shape[0]
    uv = np.stack(
        [np.linspace(0, 1, n_pts), np.linspace(1, 0, n_pts)], axis=1
    ).astype(np.float32)
    scene.meshes[0] = MeshCPU(
        positions=m.positions, indices=m.indices, normals=m.normals,
        texcoords=uv, colors=None,
    )
    flat = np.zeros((4, 4, 4), np.float32)
    flat[..., 2] = 1.0  # +Z normal map
    flat[..., 3] = 1.0
    scene.textures.append(TextureCPU(data=flat, is_hdr=False))
    scene.materials[0].normal_tex_idx = 0
    tpu = build_scene_tpu(scene, dense_max_tris=64)
    assert tpu.any_normal_maps

    ro, rd = _random_rays(rng, 512)
    h_ref = intersect.closest_hit_wavefront(tpu, ro, rd, 1e-4)
    ia_ref = intersect.wavefront_fetch_attrs(tpu, h_ref)
    h, ia = intersect._packet_hit_attrs(tpu, ro, rd, 1e-4)
    hit = np.asarray(h_ref.hit)
    same = (np.asarray(h.tri) == np.asarray(h_ref.tri)) & hit
    assert ia.tan is not None and ia_ref.tan is not None
    for name, a, b in [
        ("tan.x", ia.tan.x, ia_ref.tan.x),
        ("tan.z", ia.tan.z, ia_ref.tan.z),
        ("bit.y", ia.bit.y, ia_ref.bit.y),
        ("tu", ia.tu, ia_ref.tu),
    ]:
        np.testing.assert_allclose(
            np.asarray(a)[same], np.asarray(b)[same], rtol=1e-5, atol=1e-6,
            err_msg=name,
        )


def test_wavefront_attr_fetch_matches_gathers(rng):
    """wavefront_fetch_attrs (sort + one-hot MXU fetch/interp + unsort) must
    equal the direct wt-array gather-and-interpolate path for every hit
    lane; miss lanes are zeroed."""

    scene = _tri_sphere_scene()
    tpu = build_scene_tpu(scene, dense_max_tris=64)
    assert tpu.use_bvh and tpu.sl_count >= 2

    ro, rd = _random_rays(rng, 512)
    h = intersect.closest_hit_wavefront(tpu, ro, rd, 1e-4)
    ia = intersect.wavefront_fetch_attrs(tpu, h)

    hit = np.asarray(h.hit)
    tri = np.asarray(h.tri)[hit]
    u = np.asarray(h.u)[hit]
    v = np.asarray(h.v)[hit]
    w = 1.0 - u - v

    def interp3(tab):
        return np.stack([np.asarray(tab[c])[tri] for c in range(3)])

    n_ref = (
        interp3(tpu.wt_n0) * w
        + interp3(tpu.wt_n1) * u
        + interp3(tpu.wt_n2) * v
    )
    n_got = np.stack([np.asarray(ia.n.x), np.asarray(ia.n.y), np.asarray(ia.n.z)])
    np.testing.assert_allclose(n_got[:, hit], n_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ia.gn.x)[hit], np.asarray(tpu.wt_gn)[0][tri], rtol=0, atol=0
    )
    tu_ref = (
        np.asarray(tpu.wt_uv0)[0][tri] * w
        + np.asarray(tpu.wt_uv1)[0][tri] * u
        + np.asarray(tpu.wt_uv2)[0][tri] * v
    )
    np.testing.assert_allclose(np.asarray(ia.tu)[hit], tu_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(ia.mat_id)[hit], np.asarray(tpu.wt_mat)[tri]
    )
    # Miss lanes zeroed.
    assert (np.asarray(ia.n.x)[~hit] == 0.0).all()
    assert (np.asarray(ia.mat_id)[~hit] == 0).all()


def test_wavefront_non_power_of_two_stride(rng, monkeypatch):
    """128-aligned non-power-of-two strides are legal at build time
    (superleaf.py only checks stride % 128); the pair kernel must derive
    its tri-block size as a DIVISOR of the stride instead of asserting.
    Regression: sl_stride_opt=640 built fine, then every render crashed
    at trace time (SP % TB with TB=512)."""

    monkeypatch.setenv("LUPIN_NO_PACKET", "1")  # pin the pair-kernel path
    scene = _tri_sphere_scene()
    tpu = build_scene_tpu(scene, dense_max_tris=64, sl_stride_opt=640)
    assert tpu.use_bvh and tpu.sl_stride == 640 and tpu.sl_count >= 2

    ro, rd = _random_rays(rng, 512)
    ref = intersect.closest_hit_bvh(tpu, ro, rd, 1e-4)
    got = intersect.closest_hit_wavefront(tpu, ro, rd, 1e-4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.dst)[h], np.asarray(ref.dst)[h], rtol=5e-4, atol=1e-5
    )


def test_textureless_environment_sampling():
    """A textureless (constant-emission) environment: sample_lights must
    return uniform-sphere directions and sample_lights_pdf the 1/(4pi)
    term — via the STATIC env_has_tex gate, which also keeps alias picks
    from reading outside the env's one-entry table segment."""

    import jax.numpy as jnp

    from lupinpathtracer_tpu.core import rng as rng_mod
    from lupinpathtracer_tpu.core import vec3 as v3
    from lupinpathtracer_tpu.core.types import Environment, Material
    from lupinpathtracer_tpu.render import lights
    from lupinpathtracer_tpu.scene.scene import (
        InstanceCPU, MeshCPU, SceneCPU,
    )

    quad = np.array(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = MeshCPU(
        positions=quad, indices=idx,
        normals=None, texcoords=None, colors=None,
    )
    env = Environment()
    env.emission = np.array([0.5, 0.5, 0.5], np.float32)
    scene = SceneCPU(
        meshes=[mesh], materials=[Material()],
        instances=[InstanceCPU(
            frame=np.eye(3, 4, dtype=np.float32), mesh_idx=0, mat_idx=0,
        )],
        environments=[env], textures=[],
    )
    tpu = build_scene_tpu(scene)
    assert tpu.num_envs == 1 and tpu.env_has_tex == (False,)

    B = 512
    pos = v3.V3(*(jnp.zeros(B) for _ in range(3)))
    out = v3.V3(jnp.zeros(B), jnp.ones(B), jnp.zeros(B))
    state = rng_mod.init_state(jnp.arange(B, dtype=jnp.uint32), 0, 0, 0)
    _, d = lights.sample_lights(tpu, pos, out, state)
    n = np.sqrt(
        np.asarray(d.x) ** 2 + np.asarray(d.y) ** 2 + np.asarray(d.z) ** 2
    )
    assert np.isfinite(n).all() and (np.abs(n - 1.0) < 1e-4).all()
    # Uniform sphere: both hemispheres populated.
    assert (np.asarray(d.y) > 0).any() and (np.asarray(d.y) < 0).any()

    pdf = lights.sample_lights_pdf(tpu, pos, d, jnp.float32(1e-4))
    p = np.asarray(pdf)
    assert np.isfinite(p).all() and (p > 0).all()
    # No mesh lights: pdf is exactly uniform-sphere over 1 picker choice.
    np.testing.assert_allclose(p, 1.0 / (4.0 * np.pi), rtol=1e-6)


def test_top_table_depth_capped_spread():
    """Exponentially spaced AABBs drive the binary top build past the mesh
    BVH's depth-25 cap (SAH peels one child per level). Regression: fat
    depth-capped leaves encoded only their FIRST entry's ref — the other
    superleaves silently vanished from traversal."""

    n = 60
    lo = np.stack([3.0 ** np.arange(n), np.zeros(n), np.zeros(n)], 1)
    lo = lo.astype(np.float32)
    hi = lo + 1.0
    tab, rows, root_is_leaf, depth = sl_mod.build_top_table(lo, hi)
    assert not root_is_leaf

    refs = set()
    t3 = tab[:rows].reshape(rows, sl_mod.TOP_FAN, sl_mod.CH_STRIDE)
    for r in range(rows):
        for c in range(sl_mod.TOP_FAN):
            if t3[r, c, sl_mod.CH_ISLEAF] == 1.0:
                refs.add(
                    int(t3[r, c, sl_mod.CH_H2]) * 65536
                    + int(t3[r, c, sl_mod.CH_HI8]) * 256
                    + int(t3[r, c, sl_mod.CH_LO8])
                )
    assert refs == set(range(n)), f"missing superleaves: {set(range(n)) - refs}"


def test_two_level_mesh_id_beyond_instance_count():
    """Two-level flatten with a used mesh id >= the instance count.
    Regression: the packed-attr bake indexed the per-INSTANCE det-sign
    array with MESH ids and crashed (IndexError) on this shape."""

    tri = np.array([[0, 1, 2]], np.int32)
    m0 = MeshCPU(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        indices=tri, normals=None, texcoords=None, colors=None,
    )
    g = np.linspace(-1, 1, 8, dtype=np.float32)
    xx, zz = np.meshgrid(g, g)
    pts = np.stack([xx, 0.1 * xx * zz, zz], -1).reshape(-1, 3)
    idx = []
    for i in range(7):
        for j in range(7):
            a = i * 8 + j
            idx += [[a, a + 1, a + 8], [a + 1, a + 9, a + 8]]
    m1 = MeshCPU(
        positions=pts, indices=np.asarray(idx, np.int32),
        normals=None, texcoords=None, colors=None,
    )
    scene = SceneCPU(
        meshes=[m0, m1], materials=[Material()],
        instances=[InstanceCPU(
            frame=np.eye(3, 4, dtype=np.float32), mesh_idx=1, mat_idx=0,
        )],
        environments=[], textures=[],
    )
    tpu = build_scene_tpu(scene, dense_max_tris=16, two_level=True)
    assert tpu.two_level
    ro, rd = _random_rays(np.random.default_rng(3), 128, origin_span=2.0)
    h = intersect.closest_hit(tpu, ro, rd, 1e-4)
    assert bool(jnp.isfinite(h.dst).all())


def test_superleaf_nsub_keeps_lane_alignment():
    """Caller strides that are 128-multiples but not 1024-multiples (1152)
    must still produce 128-aligned sub-chunks (the packet kernel slices
    SPB = stride // NSUB along the lane dim)."""

    scene = _tri_sphere_scene()
    tpu = build_scene_tpu(scene, dense_max_tris=64, sl_stride_opt=1152)
    assert tpu.sl_stride == 1152
    nsub = int(tpu.sl_sub.shape[1])
    assert (1152 // nsub) % 128 == 0 and 1152 % nsub == 0


@pytest.mark.slow
def test_packet_ray_sort_matches(rng):
    """LUPIN_PACKET_RAYSORT traverses in coherence order and un-sorts the
    results — per-ray outputs must match the unsorted kernel (up to
    exact-t ties, compared via t not tri)."""

    from lupinpathtracer_tpu.kernels import pallas_packet as pkt

    scene = _tri_sphere_scene()
    tpu = build_scene_tpu(scene, dense_max_tris=64)
    ro, rd = _random_rays(rng, 512)
    W = intersect.scene_tri_matrix(tpu)
    res0 = pkt.packet_traverse(tpu, ro, rd, 1e-4, W, ray_sort=False)
    res1 = pkt.packet_traverse(tpu, ro, rd, 1e-4, W, ray_sort=True)
    np.testing.assert_array_equal(np.asarray(res1[0]), np.asarray(res0[0]))
    for i in (1, 2, 3):
        np.testing.assert_allclose(
            np.asarray(res1[i]), np.asarray(res0[i]), rtol=1e-6, atol=1e-7
        )
    # Active-masked + sorted: inactive lanes report miss, actives match.
    act = jnp.asarray(rng.uniform(size=512) > 0.3)
    r0a = pkt.packet_traverse(tpu, ro, rd, 1e-4, W, active=act,
                              ray_sort=False)
    r1a = pkt.packet_traverse(tpu, ro, rd, 1e-4, W, active=act,
                              ray_sort=True)
    np.testing.assert_array_equal(np.asarray(r1a[0]), np.asarray(r0a[0]))
    # Fused-attrs variant through the row-chunked un-sort.
    ra0 = pkt.packet_traverse(tpu, ro, rd, 1e-4, W, with_attrs=True,
                              ray_sort=False)
    ra1 = pkt.packet_traverse(tpu, ro, rd, 1e-4, W, with_attrs=True,
                              ray_sort=True)
    np.testing.assert_array_equal(np.asarray(ra1[0]), np.asarray(ra0[0]))
    np.testing.assert_allclose(
        np.asarray(ra1[5]), np.asarray(ra0[5]), rtol=1e-6, atol=1e-7
    )
