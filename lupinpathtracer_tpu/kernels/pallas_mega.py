"""Fused dense path-tracing megakernel.

The reference renders with one WGSL megakernel: the whole path loop —
traversal, shading, light sampling, RNG — runs per thread with everything
in registers (pathtracer.wgsl:222-292). Round 1 decomposed that into a
wavefront of jnp stages around a Pallas intersector; correct, but each
bounce round-trips ~30 lane arrays plus a (ATTR_WIDTH, B) attribute matrix
through HBM, and the lockstep tail (a few long paths keep 262k-lane
iterations running) caps occupancy at ~50-70%.

This kernel is the TPU megakernel for scenes whose tables fit in VMEM
(dense intersector mode: <= ~2k triangles, no textures): one `pallas_call`
runs ALL spp samples of a pixel block to completion — camera rays, the MXU
dense intersection with in-kernel attribute fetch, material evaluation,
BSDF + light sampling (the "poor man's MIS" 50/50 mix of
pathtracer.wgsl:640-658 or naive BSDF-only), Russian roulette, radiance
clamping and in-place path regeneration — entirely on-chip. Per-bounce HBM
traffic is zero; the regeneration tail costs one 1k-lane block, not the
whole frame.

Semantics match integrators.pathtrace_spp (same PCG streams, same draw
order, same accumulation): the pure lane-math modules (core/rng.py,
render/camera.py, render/bsdf.py, render/materials.py) are called
directly inside the kernel — only the light-table lookups are
reimplemented gather-free (exact one-hot MXU selects), because Mosaic has
no vector gather. tests/test_mega.py asserts agreement with the jnp path.
The identity is BIT-exact only with precise=True; the production default
(precise=False) runs the intersection matmuls as 3-pass hand-split bf16
(~2^-16 relative error on det/nu/nv/nt — see _isect_attrs), so a grazing
hit or a sub-2^-16 t tie can pick a different winning triangle than the
wavefront path for the same seed. Golden tolerances absorb this
(GOLDENS.md); seed-exact comparisons must pass precise=True.

Reference provenance: pathtracer.wgsl:588-733 (pathtrace_standard),
:942-1059 (pathtrace_naive), :505-542 (camera), :2468-2549 (lights),
bvh_custom.wgsl:112-152 (light pdf march -> exact dense sum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import rng as rng_mod
from ..core import vec3 as v3
from ..core.types import PathtraceType
from ..core.vec3 import V3
from ..render.camera import compute_camera_ray

F32_MAX = 3.4028235e38
_BIG_I32 = 2**30

MEGA_RAY_BLOCK = 1024
# The packed attribute layout uses columns [0, 62) (pallas_intersect.py);
# the fetch matmul and the per-block battr carry shrink accordingly.
MEGA_ATTR_WIDTH = 64


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo == x to ~2^-16 relative.
    Mosaic supports only DEFAULT/HIGHEST dot precision, so the 3-pass
    bf16 product (hi*hi + hi*lo + lo*hi) is hand-rolled: half the passes
    of HIGHEST, ~2^-16 relative error — ample for t/u/v (hit positions are
    guarded by ray_epsilon) and exact for the discrete attribute fields
    (small ints are bf16-representable)."""

    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def applicable(scene, ptype: int) -> bool:
    """Static gate: every feature the kernel does not implement must be
    statically absent. Scenes outside the gate use the wavefront path."""

    return (
        not scene.use_bvh
        and not scene.instances_empty
        and not scene.has_alpha
        and scene.envs_empty
        and not scene.any_volumetric
        and not scene.any_delta
        and not scene.any_normal_maps
        and not scene.any_vert_colors
        and not (scene.num_textures > 0 and scene.any_uv)
        and ptype in (int(PathtraceType.STANDARD), int(PathtraceType.NAIVE))
        and (scene.lights_empty or scene.lt_v0.shape[1] <= 64)
    )


class _Mat34:
    """Duck-typed (3,4) matrix over SMEM scalars so render/camera.py's
    ``m[i, j]`` indexing works on prefetched scalars."""

    def __init__(self, smf, base):
        self._smf = smf
        self._base = base

    def __getitem__(self, ij):
        i, j = ij
        return self._smf[self._base + i * 4 + j]


def _oh_gather(tab, idx):
    """Exact gather from a (K, N) VMEM-resident table at (RB,) i32 indices
    via a one-hot (K,N)@(N,RB) matmul — the MXU is the gather unit
    (same trick as kernels/pallas_bvh.py's row fetch, but f32-exact)."""

    N = tab.shape[1]
    RB = idx.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (N, RB), 0)
    onehot = (col == idx[None, :]).astype(jnp.float32)
    return jnp.dot(
        tab,
        onehot,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _isect_attrs(W_ref, A_ref, ro: V3, rd: V3, eps, *, TB, precise):
    """In-kernel dense closest hit + attribute row fetch. Transposed layout
    (rays on lanes) like pallas_bvh._pair_kernel; identical algebra to
    pallas_intersect._kernel_attrs (pathtracer.wgsl:2922-2943). With
    precise=False the matmuls run as 3-pass (resp. 2-pass) hand-split bf16
    (see _split_bf16); precise=True keeps 6-pass HIGHEST f32 for the
    bit-parity tests."""

    c = v3.cross(ro, rd)
    RT = jnp.stack(
        [rd.x, rd.y, rd.z, c.x, c.y, c.z, ro.x, ro.y, ro.z,
         jnp.ones_like(ro.x)],
        axis=0,
    )  # (10, RB)
    RB = RT.shape[1]
    Tp = W_ref.shape[2]
    AW = A_ref.shape[0]
    num_blocks = Tp // TB
    trow = jax.lax.broadcasted_iota(jnp.int32, (TB, RB), 0)
    if not precise:
        RT_hi, RT_lo = _split_bf16(RT)

    def _dotT(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    def body(k, carry):
        bt, bu, bv, bdet, battr = carry
        off = k * TB
        Wblk = jnp.concatenate(
            [
                W_ref[0, :, pl.ds(off, TB)],
                W_ref[1, :, pl.ds(off, TB)],
                W_ref[2, :, pl.ds(off, TB)],
                W_ref[3, :, pl.ds(off, TB)],
            ],
            axis=1,
        )  # (10, 4TB)
        if precise:
            M = jax.lax.dot_general(
                Wblk,
                RT,
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (4TB, RB)
        else:
            W_hi, W_lo = _split_bf16(Wblk)
            M = _dotT(W_hi, RT_hi) + _dotT(W_hi, RT_lo) + _dotT(W_lo, RT_hi)
        det = M[0:TB]
        nu = M[TB : 2 * TB]
        nv = M[2 * TB : 3 * TB]
        nt = M[3 * TB : 4 * TB]
        d = 1.0 / det
        t = nt * d
        u = nu * d
        v = nv * d
        valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= eps)
        tt = jnp.where(valid, t, F32_MAX)

        blk_t = jnp.min(tt, axis=0)  # (RB,)
        at_min = tt <= blk_t[None, :]
        blk_idx = jnp.min(jnp.where(at_min, trow, _BIG_I32), axis=0)
        onehot = (trow == blk_idx[None, :]).astype(jnp.float32)

        def pick(x):
            return jnp.sum(jnp.where(onehot > 0.0, x, 0.0), axis=0)

        Ablk = A_ref[:, pl.ds(off, TB)]
        if precise:
            blk_attr = jnp.dot(
                Ablk, onehot,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (AW, RB)
        else:
            # One-hot columns are bf16-exact; only A needs the hi/lo split.
            oh_bf = onehot.astype(jnp.bfloat16)
            A_hi, A_lo = _split_bf16(Ablk)
            dot_bf = functools.partial(
                jnp.dot,
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            blk_attr = dot_bf(A_hi, oh_bf) + dot_bf(A_lo, oh_bf)

        upd = blk_t < bt
        return (
            jnp.where(upd, blk_t, bt),
            jnp.where(upd, pick(u), bu),
            jnp.where(upd, pick(v), bv),
            jnp.where(upd, pick(det), bdet),
            jnp.where(upd[None, :], blk_attr, battr),
        )

    init = (
        jnp.full((RB,), F32_MAX),
        jnp.zeros((RB,), jnp.float32),
        jnp.zeros((RB,), jnp.float32),
        jnp.zeros((RB,), jnp.float32),
        jnp.zeros((AW, RB), jnp.float32),
    )
    return jax.lax.fori_loop(0, num_blocks, body, init)


def _sample_lights_k(LT, AL, LS, size0, pos: V3, state, *, num_lights):
    """In-kernel sample_lights (pathtracer.wgsl:2468-2514), mesh lights
    only (env absence is in the static gate). Identical draw order to
    render/lights.py::sample_lights."""

    state, pick = rng_mod.next_u32_range(state, num_lights)
    pick = rng_mod.as_i32(pick)
    state, r_bin = rng_mod.next_f32(state)
    state, r_thr = rng_mod.next_f32(state)
    state, ra, rb = rng_mod.next_vec2(state)

    if num_lights == 1:
        # Light 0's alias/tri tables start at offset 0 by construction;
        # its size arrives as an SMEM scalar (no VMEM scalar extracts).
        off = jnp.zeros_like(pick)
        size = jnp.broadcast_to(size0.astype(jnp.int32), pick.shape)
        troff = jnp.zeros_like(pick)
    else:
        li = jnp.clip(pick, 0, num_lights - 1)
        ls = _oh_gather(LS[:3], li)  # (3, RB)
        off = ls[0].astype(jnp.int32)
        size = ls[1].astype(jnp.int32)
        troff = ls[2].astype(jnp.int32)

    size_f = size.astype(jnp.float32)
    idx = jnp.minimum((r_bin * size_f).astype(jnp.int32), size - 1)
    gi = off + idx
    al = _oh_gather(AL[:2], gi)  # thresh/alias rows (2, RB)
    take_alias = r_thr >= al[0]
    tri = jnp.where(take_alias, al[1].astype(jnp.int32), idx)

    s = jnp.sqrt(ra)
    tu = 1.0 - s
    tv = rb * s
    gt = troff + tri
    lt = _oh_gather(LT[:9], gt)  # (9, RB)
    p = V3(
        lt[0] + lt[3] * tu + lt[6] * tv,
        lt[1] + lt[4] * tu + lt[7] * tv,
        lt[2] + lt[5] * tu + lt[8] * tv,
    )
    return state, v3.normalize(p - pos)


def _lights_pdf_k(LTs_ref, pos: V3, incoming: V3, eps, *, num_lights, Tl):
    """In-kernel sample_lights_pdf: the exact dense sum over every light
    triangle (render/lights.py::compute_instance_lights_pdf's unrolled
    path; replaces the reference's per-light march,
    bvh_custom.wgsl:112-152). Tl is static and small (gate: <= 64); the
    per-triangle constants come from SMEM (row-major (10*Tl,) pack) so
    every read is a scalar load, never a VMEM lane extract."""

    from ..kernels.intersect import _ray_tri

    def s(row, i):
        return LTs_ref[row * Tl + i]

    pdf = jnp.zeros_like(pos.x)
    for i in range(Tl):
        tv0 = V3(s(0, i), s(1, i), s(2, i))
        te1 = V3(s(3, i), s(4, i), s(5, i))
        te2 = V3(s(6, i), s(7, i), s(8, i))
        area = s(9, i)
        t, _, _, _ = _ray_tri(pos, incoming, tv0, te1, te2, eps)
        valid = t < F32_MAX
        n_hat = v3.normalize(v3.cross(te1, te2))
        cos_theta = jnp.abs(v3.dot(incoming, n_hat))
        pdf = pdf + jnp.where(
            valid, (t * t) / jnp.maximum(cos_theta * area, 1e-20), 0.0
        )
    return pdf / float(num_lights)


def _mega_kernel(
    pix_ref, gx_ref, gy_ref, valid_ref,
    W_ref, A_ref, LT_ref, AL_ref, LS_ref, smf_ref, smi_ref, LTs_ref,
    ax_ref, ay_ref, az_ref, nt_ref,
    *, scene, spp, max_bounces, use_nee, is_ortho, TB, precise,
):
    from ..render import bsdf
    from ..render.integrators import clamp_radiance
    from ..render.materials import (
        compute_shading_normal,
        get_material_point,
        is_mat_delta,
    )
    from .intersect import HitInfo
    from .pallas_intersect import ATTR_DET_SIGN

    def vec(ref):
        return ref[0].reshape(-1)

    pix = rng_mod.as_u32(vec(pix_ref))
    gx = vec(gx_ref)
    gy = vec(gy_ref)
    valid = vec(valid_ref)  # i32 0/1
    RB = pix.shape[0]

    cam_m = _Mat34(smf_ref, 0)
    lens = smf_ref[12]
    film = smf_ref[13]
    aspect = smf_ref[14]
    focus = smf_ref[15]
    aperture = smf_ref[16]
    resolution = (smf_ref[17], smf_ref[18])
    eps = smf_ref[19]
    max_radiance = smf_ref[20]
    la_size0 = smf_ref[21]
    accum_counter = rng_mod.as_u32(smi_ref[0])
    rng_seed = rng_mod.as_u32(smi_ref[1])
    sample_offset = smi_ref[2]

    num_lights = 0 if scene.lights_empty else scene.num_lights
    Tl = 0 if scene.lights_empty else scene.lt_v0.shape[1]
    LT = LT_ref[...]
    AL = AL_ref[...]
    LS = LS_ref[...]
    types = scene.present_mat_types

    def camera_ray(state):
        state, ox = rng_mod.next_f32(state)
        state, oy = rng_mod.next_f32(state)
        return compute_camera_ray(
            cam_m, lens, film, aspect, focus, aperture, is_ortho,
            gx, gy, resolution, ox - 0.5, oy - 0.5, state,
        )

    state0 = rng_mod.init_state(pix, accum_counter, rng_seed, sample_offset)
    state0, ro0, rd0 = camera_ray(state0)
    zero = jnp.zeros((RB,), jnp.float32)
    one = jnp.ones((RB,), jnp.float32)

    init = dict(
        state=state0,
        rox=ro0.x, roy=ro0.y, roz=ro0.z,
        rdx=rd0.x, rdy=rd0.y, rdz=rd0.z,
        wx=one, wy=one, wz=one,
        lx=zero, ly=zero, lz=zero,
        accx=zero, accy=zero, accz=zero,
        alive=valid,
        bounce=jnp.zeros((RB,), jnp.int32),
        # Padded lanes start fully "done" so they never spawn.
        sample_idx=jnp.where(valid > 0, 0, spp),
        n_traced=jnp.zeros((RB,), jnp.int32),
    )

    def cond(c):
        return jnp.any(c["alive"] > 0)

    def body(c):
        entry_alive = c["alive"] > 0
        alive = entry_alive
        ro = V3(c["rox"], c["roy"], c["roz"])
        rd = V3(c["rdx"], c["rdy"], c["rdz"])
        weight = V3(c["wx"], c["wy"], c["wz"])
        radiance = V3(c["lx"], c["ly"], c["lz"])
        state = c["state"]

        n_traced = c["n_traced"] + alive.astype(jnp.int32)

        # --- dense MXU intersection + attribute fetch ---
        bt, bu, bv, bdet, battr = _isect_attrs(
            W_ref, A_ref, ro, rd, eps, TB=TB, precise=precise
        )
        backside = bdet > 0.0
        flip = battr[ATTR_DET_SIGN] < 0.0
        hit = HitInfo(
            hit=bt < F32_MAX, dst=bt, u=bu, v=bv,
            tri=jnp.zeros((RB,), jnp.int32),
            backside=(flip & ~backside) | (~flip & backside),
        )
        alive = alive & hit.hit

        # Transmittance draws happen unconditionally in the wavefront loop
        # (integrators.py) — replicate for stream parity.
        state, _tr1 = rng_mod.next_f32(state)
        state, _tr2 = rng_mod.next_f32(state)
        surf = alive  # no volumetrics inside the gate

        outgoing = -rd
        mp = get_material_point(scene, hit, battr)
        normal = compute_shading_normal(scene, hit, battr)
        pos_surf = ro + rd * hit.dst

        radiance = radiance + v3.where(
            surf, weight * mp.emission, v3.zeros((RB,))
        )

        delta = is_mat_delta(mp)
        nd = surf & ~delta

        # --- continuation sampling (pathtracer.wgsl:640-658 mix) ---
        state, r_choice = rng_mod.next_f32(state)
        state, rnl = rng_mod.next_f32(state)
        state, rx, ry = rng_mod.next_vec2(state)
        bdir = bsdf.sample_bsdfcos(mp, normal, outgoing, rnl, rx, ry, types)
        if use_nee and num_lights > 0:
            state, ldir = _sample_lights_k(
                LT, AL, LS, la_size0, pos_surf, state, num_lights=num_lights,
            )
            incoming = v3.where(r_choice < 0.5, bdir, ldir)
            pdf = 0.5 * bsdf.sample_bsdfcos_pdf(
                mp, normal, outgoing, incoming, types
            ) + 0.5 * _lights_pdf_k(
                LTs_ref, pos_surf, incoming, eps, num_lights=num_lights, Tl=Tl
            )
        else:
            incoming = bdir
            pdf = bsdf.sample_bsdfcos_pdf(mp, normal, outgoing, incoming, types)
        dead = v3.all_zero(incoming)
        f = bsdf.eval_bsdfcos(mp, normal, outgoing, incoming, types)
        factor = f / jnp.maximum(pdf, 0.0)

        alive = alive & ~(nd & dead)
        nd_ok = nd & ~dead
        weight = v3.where(nd_ok, weight * factor, weight)

        # Unconditional delta draw (stream parity with integrators.py).
        state, _rnl_d = rng_mod.next_f32(state)

        ro = v3.where(alive, pos_surf, ro)
        rd = v3.where(alive, incoming, rd)

        alive = alive & ~v3.all_zero(weight) & v3.is_finite(weight)

        # Russian roulette after bounce 3 (pathtracer.wgsl:724-729).
        state, rr = rng_mod.next_f32(state)
        rr_on = alive & (c["bounce"] > 3)
        survive = jnp.minimum(0.99, v3.max_comp(weight))
        alive = alive & ~(rr_on & (rr >= survive))
        weight = v3.where(
            rr_on & (rr < survive),
            weight / jnp.maximum(survive, 1e-12),
            weight,
        )

        # --- path regeneration (integrators.py::_respawn) ---
        bounce_next = c["bounce"] + 1
        done = entry_alive & (~alive | (bounce_next > max_bounces))
        acc = V3(c["accx"], c["accy"], c["accz"]) + v3.where(
            done, clamp_radiance(radiance, max_radiance), v3.zeros((RB,))
        )
        sample_idx = c["sample_idx"] + done.astype(jnp.int32)
        spawn = done & (sample_idx < spp)

        st_new = rng_mod.init_state(pix, accum_counter, rng_seed, sample_idx + sample_offset)
        st_new, ro_n, rd_n = camera_ray(st_new)

        alive_out = (alive & ~done) | spawn
        ro = v3.where(spawn, ro_n, ro)
        rd = v3.where(spawn, rd_n, rd)
        weight = v3.where(spawn, v3.full((RB,), 1.0), weight)
        radiance = v3.where(spawn, v3.zeros((RB,)), radiance)

        return dict(
            state=jnp.where(spawn, st_new, state),
            rox=ro.x, roy=ro.y, roz=ro.z,
            rdx=rd.x, rdy=rd.y, rdz=rd.z,
            wx=weight.x, wy=weight.y, wz=weight.z,
            lx=radiance.x, ly=radiance.y, lz=radiance.z,
            accx=acc.x, accy=acc.y, accz=acc.z,
            alive=alive_out.astype(jnp.int32),
            bounce=jnp.where(spawn, 0, bounce_next),
            sample_idx=sample_idx,
            n_traced=n_traced,
        )

    c = jax.lax.while_loop(cond, body, init)
    ax_ref[0] = c["accx"].reshape(ax_ref.shape[1:])
    ay_ref[0] = c["accy"].reshape(ay_ref.shape[1:])
    az_ref[0] = c["accz"].reshape(az_ref.shape[1:])
    nt_ref[0] = c["n_traced"].reshape(nt_ref.shape[1:])


def mega_pathtrace_spp(
    scene, W4, pixel_idx, gx, gy, resolution, cam, is_ortho: bool,
    accum_counter, rng_seed, spp: int, ptype: int, max_bounces: int,
    max_radiance, eps, ray_block: int = MEGA_RAY_BLOCK,
    interpret: bool | None = None, precise: bool = False, sample_offset=0,
):
    """Drop-in replacement for integrators.pathtrace_spp on scenes passing
    `applicable` (bit-exact only under precise=True — see the module
    docstring). Returns (acc V3 summed over spp, n_traced i32)."""

    B = pixel_idx.shape[0]
    use_nee = ptype == int(PathtraceType.STANDARD)

    # --- triangle tables (pad to the block size) ---
    T = scene.num_world_tris
    TB = 128 if T <= 128 else 256
    tpad = (-T) % TB
    W4 = W4[:, :, :T]
    A = scene.wt_attr[:T, :MEGA_ATTR_WIDTH]
    if tpad:
        W4 = jnp.pad(W4, ((0, 0), (0, 0), (0, tpad)))
        A = jnp.pad(A, ((0, tpad), (0, 0)))
    A_T = A.T  # (AW, Tp)

    # --- light tables ---
    if scene.lights_empty:
        LT = jnp.zeros((10, 128), jnp.float32)
        AL = jnp.zeros((2, 128), jnp.float32)
        LS = jnp.zeros((3, 128), jnp.float32)
        LTs = jnp.zeros((1,), jnp.float32)
        la_size0 = jnp.float32(0.0)
    else:
        Tl = scene.lt_v0.shape[1]
        tlp = (-Tl) % 128
        area_row = scene.light_area[scene.lt_light][None, :]
        LT = jnp.concatenate(
            [scene.lt_v0, scene.lt_e1, scene.lt_e2, area_row], axis=0
        )
        LTs = LT.reshape(-1)  # SMEM copy for the pdf unroll's scalar reads
        LT = jnp.pad(LT, ((0, 0), (0, tlp)))
        Ap = scene.la_thresh.shape[0]
        apad = (-Ap) % 128
        AL = jnp.stack(
            [scene.la_thresh, scene.la_alias.astype(jnp.float32)], axis=0
        )
        AL = jnp.pad(AL, ((0, 0), (0, apad)))
        L = scene.num_lights
        lpad = (-L) % 128
        LS = jnp.stack(
            [
                scene.light_alias_offset.astype(jnp.float32),
                scene.light_alias_size.astype(jnp.float32),
                scene.light_tri_offset.astype(jnp.float32),
            ],
            axis=0,
        )
        LS = jnp.pad(LS, ((0, 0), (0, lpad)))
        la_size0 = scene.light_alias_size[0].astype(jnp.float32)

    # --- scalar packs ---
    smf = jnp.concatenate(
        [
            jnp.asarray(cam["cam_transform"], jnp.float32).reshape(-1),
            jnp.stack(
                [
                    jnp.asarray(cam["lens"], jnp.float32),
                    jnp.asarray(cam["film"], jnp.float32),
                    jnp.asarray(cam["aspect"], jnp.float32),
                    jnp.asarray(cam["focus"], jnp.float32),
                    jnp.asarray(cam["aperture"], jnp.float32),
                    jnp.asarray(resolution[0], jnp.float32),
                    jnp.asarray(resolution[1], jnp.float32),
                    jnp.asarray(eps, jnp.float32),
                    jnp.asarray(max_radiance, jnp.float32),
                    la_size0,
                ]
            ),
        ]
    )
    smi = jnp.stack(
        [
            jnp.asarray(accum_counter, jnp.uint32).astype(jnp.int32),
            jnp.asarray(rng_seed, jnp.uint32).astype(jnp.int32),
            jnp.asarray(sample_offset, jnp.int32),
        ]
    )

    # --- ray-block padding ---
    B128 = B + ((-B) % 128)
    RB = min(ray_block, B128)
    pad = (-B) % RB
    Bp = B + pad
    n_rb = Bp // RB
    sub = RB // 128

    def shape3(x, fill=0):
        if pad:
            x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(n_rb, sub, 128)

    valid = (jnp.arange(Bp, dtype=jnp.int32) < B).astype(jnp.int32)

    vec_spec = pl.BlockSpec(
        (1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_rb, sub, 128), jnp.int32),
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ax, ay, az, nt = pl.pallas_call(
        functools.partial(
            _mega_kernel,
            scene=scene,
            spp=int(spp),
            max_bounces=int(max_bounces),
            use_nee=use_nee,
            is_ortho=bool(is_ortho),
            TB=TB,
            precise=bool(precise),
        ),
        grid=(n_rb,),
        in_specs=[vec_spec] * 4 + [full_spec] * 5 + [smem_spec] * 3,
        out_specs=(vec_spec,) * 4,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(
        shape3(pixel_idx.astype(jnp.int32)),
        shape3(gx), shape3(gy),
        valid.reshape(n_rb, sub, 128),
        W4, A_T, LT, AL, LS, smf, smi, LTs,
    )
    acc = V3(ax.reshape(-1)[:B], ay.reshape(-1)[:B], az.reshape(-1)[:B])
    return acc, nt.reshape(-1)[:B]
