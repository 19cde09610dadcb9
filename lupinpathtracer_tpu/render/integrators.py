"""Path-tracing integrators: standard, MIS, naive, direct.

TPU-native rebuild of the four integrator loops in pathtracer.wgsl
(pathtrace_standard :588-733, pathtrace_mis :737-933, pathtrace_naive
:942-1059, pathtrace_direct :1062-1245). The reference runs one path per
GPU thread with data-dependent control flow; here the whole ray batch
advances together through a masked `lax.while_loop` over bounces — every
divergence point (miss, delta vs smooth, in-volume vs surface, Russian
roulette, zero-direction death) becomes an `alive`/branch mask. All
vectors/colors are component-wise V3 batches (core/vec3.py). Semantics are
matched exactly, including:

- the 50/50 one-sample BSDF/light mix of the "poor man's MIS"
  (pathtracer.wgsl:640-658);
- the classic 2-strategy MIS with power-2 heuristic, including the
  reference's unconditional environment add on miss (pathtracer.wgsl:758);
- the volume "stack" toggle — the reference pushes only at depth 0 and pops
  otherwise (pathtracer.wgsl:667-681), so one volume slot per lane suffices;
- Russian roulette after bounce 3 with survive = min(0.99, max weight)
  (pathtracer.wgsl:724-729);
- stochastic alpha skip with accumulated distance
  (bvh_custom.wgsl:154-180), statically compiled out for opaque scenes.

Two DELIBERATE deviations from the reference's MIS edge cases (both are
reference quirks whose exact replication would cost lane state for paths
real scenes never take):

- the reference assigns `next_intersection` only inside the strategy gate
  `all(bsdfcos != 0) && mis_weight != 0` (pathtracer.wgsl:831-835), so a
  material with an exactly-zero bsdfcos COMPONENT (e.g. albedo (1,0,0))
  re-uses a stale/empty hit next bounce; this port always continues from
  the freshly traced BSDF-sample hit. Identical whenever all bsdfcos
  components are nonzero — every corpus material.
- a zero light/bsdf pdf makes the reference's mis_weight NaN, which then
  NaNs the radiance and clamp_radiance zeroes the WHOLE sample
  (pathtracer.wgsl:1774-1783); this port guards the division (1e-30) and
  drops only that strategy term, keeping the rest of the sample. Strictly
  lower variance, identical in expectation on the gated (nonzero) domain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core import vec3 as v3
from ..core.types import MAX_OPACITY_BOUNCES, PathtraceType
from ..core.vec3 import V3
from ..kernels import intersect
from . import bsdf, lights
from .materials import (
    compute_shading_normal,
    get_emission,
    get_material_point,
    get_opacity,
    is_mat_delta,
    is_mat_volumetric,
)


def make_ctx(scene, eps):
    """Per-render precomputation: dense triangle matrix (when the dense MXU
    intersector is active) and the light-triangle matrix for pdf evaluation.
    XLA hoists these out of the bounce loop."""

    # Dense mode and the superleaf wavefront both consume the coefficient
    # matrix; only the legacy CPU/jnp BVH walk does not.
    if scene.use_bvh and scene.sl_count == 0:
        W = None
    else:
        W = intersect.scene_tri_matrix(scene)
    small_lights = scene.lt_v0.shape[1] <= lights.SMALL_LIGHT_TRIS
    Wl = (
        None
        if (scene.lights_empty or small_lights)
        else lights.light_tri_matrix(scene)
    )
    return dict(eps=eps, W=W, Wl=Wl)


# Stream compaction (SURVEY.md §7 step 6) was implemented and measured on
# this backend: the per-bounce permutation (cumsum + scatter + ~30 lane
# gathers) ran ~30x slower than the dead-lane work it saves, so it was
# removed (git history has the implementation). Wavefront path regeneration
# in pathtrace_spp fills dead lanes instead.


def ray_skip_alpha(scene, ctx, ro, rd, state, mask, active=None,
                   coherent=True):
    """ray_skip_alpha_stochastically (bvh_custom.wgsl:154-180): re-cast
    through lanes whose opacity test fails, accumulating distance. Gated by
    the static has_alpha flag — opaque scenes pay exactly one intersection.
    `active` masks lanes out of wavefront traversal entirely; `mask` gates
    which hit lanes run the stochastic opacity re-cast; `coherent=False`
    marks a divergent bounce batch (skips the packet backend)."""

    hit, attrs = intersect.closest_hit_attrs(
        scene, ro, rd, ctx["eps"], W=ctx["W"], active=active,
        coherent=coherent,
    )
    if not scene.has_alpha:
        return hit, attrs, state

    has_attrs = attrs is not None
    op = get_opacity(scene, hit, attrs)
    state, r0 = rng_mod.next_f32(state)
    recast0 = mask & hit.hit & (op < 1.0) & (r0 >= op)

    def cond(c):
        return jnp.any(c["recast"]) & (c["i"] < MAX_OPACITY_BOUNCES - 1)

    def body(c):
        nh, nat = intersect.closest_hit_attrs(
            scene, V3(*c["ro"]), rd, ctx["eps"], W=ctx["W"],
            active=c["recast"], coherent=coherent,
        )
        recast = c["recast"]
        h = jax.tree.map(lambda a, b: jnp.where(recast, a, b), nh, c["hit"])
        if has_attrs:
            # Works for both attr layouts: the dense (AW, B) matrix blends
            # along its lane axis; InterpAttrs blends per (B,) leaf.
            at = jax.tree.map(
                lambda a, b: jnp.where(
                    recast[None, :] if a.ndim == 2 else recast, a, b
                ),
                nat, c["attrs"],
            )
        else:
            at = c["attrs"]
        dst_acc = jnp.where(recast, c["dst_acc"] + nh.dst, c["dst_acc"])
        op2 = get_opacity(scene, h, at if has_attrs else None)
        state2, r = rng_mod.next_f32(c["state"])
        pass_through = (op2 < 1.0) & (r >= op2)
        recast2 = recast & h.hit & pass_through
        ro_new = tuple(
            jnp.where(recast2, o + d * nh.dst, o)
            for o, d in zip(c["ro"], (rd.x, rd.y, rd.z))
        )
        return dict(
            ro=ro_new, hit=h, attrs=at, dst_acc=dst_acc, recast=recast2,
            state=state2, i=c["i"] + 1,
        )

    ro0 = tuple(
        jnp.where(recast0, o + d * hit.dst, o)
        for o, d in zip((ro.x, ro.y, ro.z), (rd.x, rd.y, rd.z))
    )
    init = dict(
        ro=ro0,
        hit=hit,
        attrs=attrs if has_attrs else jnp.zeros((1,), jnp.float32),
        dst_acc=hit.dst,
        recast=recast0,
        state=state,
        i=jnp.int32(0),
    )
    c = jax.lax.while_loop(cond, body, init)
    h = c["hit"]
    # Distance stays relative to the ORIGINAL origin (bvh_custom.wgsl:176-178).
    out_attrs = c["attrs"] if has_attrs else None
    return h.replace(dst=c["dst_acc"]), out_attrs, c["state"]


def _sample_surface_common(scene, ctx, mp, normal, outgoing, hit_pos, state, use_nee):
    """Non-delta continuation direction + weight factor (the 50/50 mix of
    pathtracer.wgsl:640-658 when use_nee, plain BSDF sampling otherwise).
    Returns (state, incoming, weight_factor, dead_mask)."""

    state, r_choice = rng_mod.next_f32(state)
    state, rnl = rng_mod.next_f32(state)
    state, rx, ry = rng_mod.next_vec2(state)
    types = scene.present_mat_types
    bdir = bsdf.sample_bsdfcos(mp, normal, outgoing, rnl, rx, ry, types)
    if use_nee:
        state, ldir = lights.sample_lights(scene, hit_pos, outgoing, state)
        incoming = v3.where(r_choice < 0.5, bdir, ldir)
        pdf = 0.5 * bsdf.sample_bsdfcos_pdf(
            mp, normal, outgoing, incoming, types
        ) + 0.5 * lights.sample_lights_pdf(
            scene, hit_pos, incoming, ctx["eps"], ctx["Wl"]
        )
    else:
        incoming = bdir
        pdf = bsdf.sample_bsdfcos_pdf(mp, normal, outgoing, incoming, types)
    dead = v3.all_zero(incoming)
    f = bsdf.eval_bsdfcos(mp, normal, outgoing, incoming, types)
    factor = f / jnp.maximum(pdf, 0.0)
    return state, incoming, factor, dead


def _sample_volume_common(
    scene, ctx, vol_den, vol_sca, vol_aniso, outgoing, hit_pos, state, use_nee
):
    """In-volume continuation (pathtracer.wgsl:686-715)."""

    state, vr = rng_mod.next_f32(state)
    state, vx, vy = rng_mod.next_vec2(state)
    sdir = bsdf.sample_scattering(vol_den, vol_aniso, outgoing, vx, vy)
    if use_nee:
        state, ldir = lights.sample_lights(scene, hit_pos, outgoing, state)
        incoming = v3.where(vr < 0.5, sdir, ldir)
        pdf = 0.5 * bsdf.sample_scattering_pdf(
            vol_den, vol_aniso, outgoing, incoming
        ) + 0.5 * lights.sample_lights_pdf(
            scene, hit_pos, incoming, ctx["eps"], ctx["Wl"]
        )
    else:
        incoming = sdir
        pdf = bsdf.sample_scattering_pdf(vol_den, vol_aniso, outgoing, incoming)
    dead = v3.all_zero(incoming)
    f = bsdf.eval_scattering(vol_den, vol_sca, vol_aniso, outgoing, incoming)
    factor = f / jnp.maximum(pdf, 0.0)
    return state, incoming, factor, dead


def pathtrace(scene, ctx, ro, rd, state, ptype: int, max_bounces: int):
    """Run one full path per lane; returns (radiance V3, state, n_bounces,
    n_traced)."""

    if ptype == PathtraceType.MIS:
        return _pathtrace_mis(scene, ctx, ro, rd, state, max_bounces)
    return _pathtrace_snd(scene, ctx, ro, rd, state, ptype, max_bounces)


def _camera_ray_from(regen, state):
    """Fresh camera ray for a lane's next sample (the regen respawn)."""

    from .camera import compute_camera_ray

    state, ox = rng_mod.next_f32(state)
    state, oy = rng_mod.next_f32(state)
    cam = regen["cam"]
    return compute_camera_ray(
        cam["cam_transform"], cam["lens"], cam["film"], cam["aspect"],
        cam["focus"], cam["aperture"], regen["is_ortho"], regen["gx"],
        regen["gy"], regen["resolution"], ox - 0.5, oy - 0.5, state,
    )


def pathtrace_spp(
    scene, ctx, pixel_idx, gx, gy, resolution, cam, is_ortho: bool,
    accum_counter, rng_seed, spp: int, ptype: int, max_bounces: int,
    max_radiance, sample_offset=0, streams: int = 1,
):
    """All spp samples of a pixel batch as ONE wavefront with path
    regeneration: a lane that finishes sample s (miss / absorption / RR /
    bounce cap) immediately respawns sample s+1 of ITS OWN pixel in place —
    the camera ray, RNG re-seed, and throughput reset are masked lane math,
    so occupancy stays near 100% instead of decaying with the survival
    curve. This is what SIMT gives the reference's per-thread spp loop
    (pathtracer.wgsl:234-271) for free; on a lockstep VPU it has to be
    explicit. Per-sample RNG streams and accumulation order are identical
    to the sequential per-sample loop, so results match bit-for-bit on
    opaque scenes.

    Returns (acc V3 = sum over spp of clamp_radiance(sample), n_traced).

    `streams` > 1 runs the spp budget as K CONCURRENT sample streams per
    pixel (lanes replicated K times, each stream regenerating spp/K
    samples): same per-(pixel, sample) RNG streams and sample set as
    streams=1 — only the fp summation order differs — but each wavefront
    round carries K x the rays, amortizing the round's fixed phase costs
    (top/sort/items/pair/unsort each have a ~3 ms floor at 131k lanes —
    out_hw/prof_sort.log). The sweet spot is scene-dependent; bench A/Bs
    it via LUPIN_SPP_STREAMS.
    """

    if streams > 1 and spp % streams == 0 and spp > streams - 1:
        K = streams
        Bq = pixel_idx.shape[0]

        def rep(a):
            return jnp.tile(a, K)

        offs = sample_offset + jnp.repeat(
            jnp.arange(K, dtype=jnp.uint32) * (spp // K), Bq
        )
        acc, n_traced = pathtrace_spp(
            scene, ctx, rep(pixel_idx), rep(gx), rep(gy), resolution, cam,
            is_ortho, accum_counter, rng_seed, spp // K, ptype, max_bounces,
            max_radiance, sample_offset=offs,
        )
        return (
            V3(*(x.reshape(K, Bq).sum(axis=0) for x in (acc.x, acc.y, acc.z))),
            n_traced.reshape(K, Bq).sum(axis=0),
        )

    regen = dict(
        gx=gx, gy=gy, resolution=resolution, cam=cam, is_ortho=is_ortho,
        pixel_idx=pixel_idx, accum_counter=accum_counter, rng_seed=rng_seed,
        spp=spp, max_radiance=max_radiance, sample_offset=sample_offset,
    )
    state = rng_mod.init_state(pixel_idx, accum_counter, rng_seed, sample_offset)
    state, ro, rd = _camera_ray_from(regen, state)
    if ptype == PathtraceType.MIS:
        acc, n_traced = _pathtrace_mis(
            scene, ctx, ro, rd, state, max_bounces, regen=regen
        )
    else:
        acc, n_traced = _pathtrace_snd(
            scene, ctx, ro, rd, state, ptype, max_bounces, regen=regen
        )
    return acc, n_traced


def _transmit(scene, c, alive, hit, weight, tr1, tr2):
    """Volume transmittance entry (pathtracer.wgsl:611-620)."""

    if scene.any_volumetric:
        in_med = alive & (c["vol_len"] > 0)
        vdst = bsdf.sample_transmittance(c["vol_den"], hit.dst, tr1, tr2)
        t_w = bsdf.eval_transmittance(c["vol_den"], vdst) / jnp.maximum(
            bsdf.sample_transmittance_pdf(c["vol_den"], vdst, hit.dst), 1e-30
        )
        weight = v3.where(in_med, weight * t_w, weight)
        in_volume = in_med & (vdst < hit.dst)
    else:
        vdst = hit.dst
        in_volume = jnp.zeros_like(alive)
    return vdst, in_volume, weight


def _pathtrace_snd(scene, ctx, ro, rd, state, ptype, max_bounces, regen=None):
    """Shared loop for STANDARD / NAIVE / DIRECT, one batched trace call
    per bounce (see _pathtrace_mis for the slot design).

    STANDARD / NAIVE trace only slot A (the continuation — or, on lanes
    whose path ended, the respawned camera ray; dead lanes are masked out
    of traversal entirely). DIRECT adds slot B for its explicit per-bounce
    light ray (pathtracer.wgsl:1117-1145), folded into the same call.
    With `regen` (see pathtrace_spp) the bounce counter is per-lane and
    finished lanes respawn their pixel's next sample in place."""

    B = ro.x.shape[0]
    is_direct = ptype == PathtraceType.DIRECT
    use_nee = ptype in (PathtraceType.STANDARD, PathtraceType.DIRECT)
    has_light_ray = is_direct and not (scene.lights_empty and scene.envs_empty)

    alive0 = jnp.ones(B, bool)
    hit0, attrs0, state = ray_skip_alpha(scene, ctx, ro, rd, state, alive0)
    has_attrs = attrs0 is not None

    init = dict(
        bounce=jnp.int32(0) if regen is None else jnp.zeros(B, jnp.int32),
        ro=ro,
        rd=rd,
        state=state,
        weight=v3.full(B, 1.0),
        radiance=v3.zeros(B),
        alive=alive0,
        hit=hit0,
        attrs=attrs0 if has_attrs else jnp.zeros((1,), jnp.float32),
        vol_den=v3.zeros(B),
        vol_sca=v3.zeros(B),
        vol_aniso=jnp.zeros(B, jnp.float32),
        vol_len=jnp.zeros(B, jnp.int32),
        next_emission=jnp.ones(B, bool),
        n_bounces=jnp.zeros(B, jnp.int32),
        n_traced=jnp.full(B, 1, jnp.int32),
    )
    if regen is not None:
        init["sample_idx"] = jnp.zeros(B, jnp.int32)
        init["acc"] = v3.zeros(B)

    def cond(c):
        if regen is not None:
            return jnp.any(c["alive"])
        return jnp.any(c["alive"]) & (c["bounce"] <= max_bounces)

    def body(c):
        alive = c["alive"]
        ro, rd = c["ro"], c["rd"]
        weight, radiance = c["weight"], c["radiance"]
        state = c["state"]
        next_emission = c["next_emission"]
        hit = c["hit"]
        attrs = c["attrs"] if has_attrs else None

        # Miss: environment (pathtrace_direct gates on next_emission,
        # pathtracer.wgsl:1075-1080; standard/naive add unconditionally).
        miss_m = alive & ~hit.hit
        if not scene.envs_empty:
            env = lights.sample_environments(scene, rd)
            env_mask = miss_m & next_emission if is_direct else miss_m
            radiance = radiance + v3.where(env_mask, weight * env, v3.zeros(B))
        alive = alive & hit.hit
        n_bounces = c["n_bounces"] + alive.astype(jnp.int32)

        state, tr1 = rng_mod.next_f32(state)
        state, tr2 = rng_mod.next_f32(state)
        vdst, in_volume, weight = _transmit(scene, c, alive, hit, weight, tr1, tr2)
        surf = alive & ~in_volume

        outgoing = -rd
        mp = get_material_point(scene, hit, attrs)
        normal = compute_shading_normal(scene, hit, attrs)
        pos_surf = ro + rd * hit.dst
        pos_vol = ro + rd * vdst if scene.any_volumetric else pos_surf

        # Surface emission.
        em_mask = surf & next_emission if is_direct else surf
        radiance = radiance + v3.where(em_mask, weight * mp.emission, v3.zeros(B))

        delta = is_mat_delta(mp)
        nd = surf & ~delta
        dl = surf & delta

        # DIRECT: explicit light ray each bounce (traced in slot B below).
        weight_pre = weight
        if has_light_ray:
            state, ldir = lights.sample_lights(scene, pos_surf, outgoing, state)
            lpdf = lights.sample_lights_pdf(
                scene, pos_surf, ldir, ctx["eps"], ctx["Wl"]
            )
            lf = bsdf.eval_bsdfcos(
                mp, normal, outgoing, ldir, scene.present_mat_types
            )
            do_l = nd & v3.all_nonzero(lf) & (lpdf > 0.0)
        else:
            ldir = rd
            do_l = jnp.zeros(B, bool)
        if is_direct:
            next_emission = jnp.where(nd, False, jnp.where(dl, True, next_emission))

        # Non-delta continuation.
        state, inc_nd, f_nd, dead_nd = _sample_surface_common(
            scene, ctx, mp, normal, outgoing, pos_surf, state, use_nee
        )
        alive = alive & ~(nd & dead_nd)
        nd_ok = nd & ~dead_nd
        weight = v3.where(nd_ok, weight * f_nd, weight)

        # Delta continuation (statically absent without delta-capable types).
        state, rnl_d = rng_mod.next_f32(state)
        if scene.any_delta:
            tps = scene.present_mat_types
            inc_d = bsdf.sample_delta(mp, normal, outgoing, rnl_d, tps)
            dead_d = v3.all_zero(inc_d)
            alive = alive & ~(dl & dead_d)
            dl_ok = dl & ~dead_d
            f_d = bsdf.eval_delta(
                mp, normal, outgoing, inc_d, tps
            ) / jnp.maximum(
                bsdf.sample_delta_pdf(mp, normal, outgoing, inc_d, tps), 0.0
            )
            weight = v3.where(dl_ok, weight * f_d, weight)
        else:
            inc_d = v3.zeros(B)

        incoming = v3.where(dl, inc_d, inc_nd)

        # Volume slot toggle (pathtracer.wgsl:667-681).
        if scene.any_volumetric:
            crossing = (
                surf
                & alive
                & is_mat_volumetric(mp)
                & (v3.dot(normal, outgoing) * v3.dot(normal, incoming) < 0.0)
            )
            push = crossing & (c["vol_len"] == 0)
            pop = crossing & (c["vol_len"] > 0)
            vol_den = v3.where(push, mp.density, c["vol_den"])
            vol_sca = v3.where(push, mp.scattering, c["vol_sca"])
            vol_aniso = jnp.where(push, mp.sc_anisotropy, c["vol_aniso"])
            vol_len = c["vol_len"] + push.astype(jnp.int32) - pop.astype(jnp.int32)
        else:
            vol_den, vol_sca = c["vol_den"], c["vol_sca"]
            vol_aniso, vol_len = c["vol_aniso"], c["vol_len"]

        # In-volume continuation.
        if scene.any_volumetric:
            state, inc_v, f_v, dead_v = _sample_volume_common(
                scene, ctx, vol_den, vol_sca, vol_aniso, outgoing, pos_vol, state,
                use_nee,
            )
            alive = alive & ~(in_volume & dead_v)
            v_ok = in_volume & ~dead_v
            weight = v3.where(v_ok, weight * f_v, weight)
            incoming = v3.where(in_volume, inc_v, incoming)
        # (pathtrace_direct leaves next_emission untouched in its volume
        # branch, pathtracer.wgsl:1199-1229.)

        new_ro = v3.where(in_volume, pos_vol, pos_surf)
        ro_cont = v3.where(alive, new_ro, ro)
        rd_cont = v3.where(alive, incoming, rd)

        # Weight viability (pathtracer.wgsl:719).
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

        # --- path-end bookkeeping, then ONE combined trace ---
        entry_alive = c["alive"]
        bounce_next = c["bounce"] + 1
        done = entry_alive & (~alive | (bounce_next > max_bounces))
        if regen is not None:
            sample_idx = c["sample_idx"] + done.astype(jnp.int32)
            spawn = done & (sample_idx < regen["spp"])
            st_new = rng_mod.init_state(
                regen["pixel_idx"], regen["accum_counter"], regen["rng_seed"],
                sample_idx + regen["sample_offset"],
            )
            st_new, ro_n, rd_n = _camera_ray_from(regen, st_new)
            ro_a = v3.where(spawn, ro_n, ro_cont)
            rd_a = v3.where(spawn, rd_n, rd_cont)
            state_a = jnp.where(spawn, st_new, state)
            ne_a = jnp.where(spawn, True, next_emission)
            alive_next = (alive & ~done) | spawn
        else:
            spawn = jnp.zeros(B, bool)
            ro_a, rd_a, state_a, ne_a = ro_cont, rd_cont, state, next_emission
            alive_next = alive & ~done & (bounce_next <= max_bounces)

        active_a = alive_next
        if has_light_ray:
            ro3 = _v3cat(ro_a, pos_surf)
            rd3 = _v3cat(rd_a, ldir)
            mask3 = jnp.concatenate([active_a, jnp.zeros(B, bool)])
            active3 = jnp.concatenate([active_a, do_l])
            state3 = jnp.concatenate([state_a, state_a])
        else:
            ro3, rd3 = ro_a, rd_a
            mask3 = active_a
            active3 = active_a
            state3 = state_a
        hit3, attrs3, state3 = ray_skip_alpha(
            scene, ctx, ro3, rd3, state3, mask3, active=active3,
            coherent=False,
        )
        state_a = state3[:B]
        hit_a = _slice_tree(hit3, 0, B)
        attrs_a = _slice_tree(attrs3, 0, B)
        n_traced = c["n_traced"] + active_a.astype(jnp.int32)

        if has_light_ray:
            hit_b = _slice_tree(hit3, B, 2 * B)
            attrs_b = _slice_tree(attrs3, B, 2 * B)
            l_em = get_emission(scene, hit_b, attrs_b)
            if not scene.envs_empty:
                l_em = v3.where(
                    hit_b.hit, l_em, lights.sample_environments(scene, ldir)
                )
            else:
                l_em = v3.where(hit_b.hit, l_em, v3.zeros(B))
            radiance = radiance + v3.where(
                do_l, weight_pre * lf * l_em * (1.0 / lpdf), v3.zeros(B)
            )
            n_traced = n_traced + do_l.astype(jnp.int32)

        out = dict(
            bounce=bounce_next if regen is None else jnp.where(spawn, 0, bounce_next),
            ro=ro_a,
            rd=rd_a,
            state=state_a,
            weight=weight,
            radiance=radiance,
            alive=alive_next,
            hit=hit_a,
            attrs=attrs_a if has_attrs else c["attrs"],
            vol_den=vol_den,
            vol_sca=vol_sca,
            vol_aniso=vol_aniso,
            vol_len=vol_len,
            next_emission=ne_a,
            n_bounces=n_bounces,
            n_traced=n_traced,
        )
        if regen is not None:
            acc = c["acc"] + v3.where(
                done, clamp_radiance(radiance, regen["max_radiance"]), v3.zeros(B)
            )
            out["sample_idx"] = sample_idx
            out["acc"] = acc
            out["weight"] = v3.where(spawn, v3.full(B, 1.0), weight)
            out["radiance"] = v3.where(spawn, v3.zeros(B), radiance)
            out["vol_len"] = jnp.where(spawn, 0, vol_len)
        return out

    c = jax.lax.while_loop(cond, body, init)
    if regen is not None:
        return c["acc"], c["n_traced"]
    return c["radiance"], c["state"], c["n_bounces"], c["n_traced"]


def _v3cat(*vs: V3) -> V3:
    return V3(*(jnp.concatenate([getattr(v, c) for v in vs]) for c in "xyz"))


def _slice_tree(t, lo, hi):
    """Slice every array leaf of a hit/attrs pytree along its lane axis
    (1-D leaves and the dense (AW, B) attr matrix both supported)."""

    if t is None:
        return None
    return jax.tree.map(
        lambda a: a[..., lo:hi] if a.ndim == 2 else a[lo:hi], t
    )


def _pathtrace_mis(scene, ctx, ro, rd, state, max_bounces, regen=None):
    """Classic 2-strategy MIS (pathtracer.wgsl:737-933), restructured so
    every bounce issues exactly ONE batched trace call.

    The reference reuses the BSDF-strategy intersection as the next bounce's
    hit (`next_intersection`, pathtracer.wgsl:750-756, :835) — 2 traversals
    per non-delta bounce, not 3. Here that reuse plus the light-strategy ray
    are folded into one 3-slot wavefront call per iteration:

      slot A: the continuation ray (the BSDF sample for non-delta surfaces,
              the delta/phase sample otherwise) — or, for lanes whose path
              just ended, the respawned camera ray of their next sample;
      slot B: the light-strategy (NEE) ray;
      slot C: the BSDF-strategy ray of lanes whose path DIES this bounce
              (Russian roulette / weight cull / bounce cap) — their direct
              contribution still counts but slot A now carries the respawn.

    Slot A's hit + attrs ride the loop carry into the next iteration, so no
    ray is ever traced twice. Inactive slots are masked out of traversal
    (closest_hit active mask). Per-lane RNG draw order is unchanged from
    the 3-call formulation, so opaque-scene results are bit-identical."""

    B = ro.x.shape[0]
    types = scene.present_mat_types

    # Prologue: camera-ray hit for bounce 0 (alpha-skipped, as the
    # reference's top-of-loop fresh trace).
    alive0 = jnp.ones(B, bool)
    hit0, attrs0, state = ray_skip_alpha(scene, ctx, ro, rd, state, alive0)
    has_attrs = attrs0 is not None

    init = dict(
        bounce=jnp.int32(0) if regen is None else jnp.zeros(B, jnp.int32),
        ro=ro,
        rd=rd,
        state=state,
        weight=v3.full(B, 1.0),
        radiance=v3.zeros(B),
        alive=alive0,
        hit=hit0,
        attrs=attrs0 if has_attrs else jnp.zeros((1,), jnp.float32),
        vol_den=v3.zeros(B),
        vol_sca=v3.zeros(B),
        vol_aniso=jnp.zeros(B, jnp.float32),
        vol_len=jnp.zeros(B, jnp.int32),
        next_emission=jnp.ones(B, bool),
        n_bounces=jnp.zeros(B, jnp.int32),
        n_traced=jnp.full(B, 1, jnp.int32),
    )
    if regen is not None:
        init["sample_idx"] = jnp.zeros(B, jnp.int32)
        init["acc"] = v3.zeros(B)

    def cond(c):
        if regen is not None:
            return jnp.any(c["alive"])
        return jnp.any(c["alive"]) & (c["bounce"] <= max_bounces)

    def body(c):
        alive = c["alive"]
        ro, rd = c["ro"], c["rd"]
        weight, radiance = c["weight"], c["radiance"]
        state = c["state"]
        next_emission = c["next_emission"]
        hit = c["hit"]
        attrs = c["attrs"] if has_attrs else None

        miss_m = alive & ~hit.hit
        if not scene.envs_empty:
            env = lights.sample_environments(scene, rd)
            radiance = radiance + v3.where(miss_m, weight * env, v3.zeros(B))
        alive = alive & hit.hit
        n_bounces = c["n_bounces"] + alive.astype(jnp.int32)

        state, tr1 = rng_mod.next_f32(state)
        state, tr2 = rng_mod.next_f32(state)
        vdst, in_volume, weight = _transmit(scene, c, alive, hit, weight, tr1, tr2)
        surf = alive & ~in_volume

        outgoing = -rd
        mp = get_material_point(scene, hit, attrs)
        normal = compute_shading_normal(scene, hit, attrs)
        pos_surf = ro + rd * hit.dst
        pos_vol = ro + rd * vdst if scene.any_volumetric else pos_surf

        em_mask = surf & next_emission
        radiance = radiance + v3.where(em_mask, weight * mp.emission, v3.zeros(B))

        delta = is_mat_delta(mp)
        nd = surf & ~delta
        dl = surf & delta

        # --- MIS strategy directions + gates (no traces yet) ---
        state, rnl = rng_mod.next_f32(state)
        state, rx, ry = rng_mod.next_vec2(state)
        bdir = bsdf.sample_bsdfcos(mp, normal, outgoing, rnl, rx, ry, types)
        state, ldir = lights.sample_lights(scene, pos_surf, outgoing, state)
        b_ok = v3.any_nonzero(bdir)
        l_ok = v3.any_nonzero(ldir)

        def strategy_terms(mdir, is_light, active):
            f = bsdf.eval_bsdfcos(mp, normal, outgoing, mdir, types)
            lp = lights.sample_lights_pdf(
                scene, pos_surf, mdir, ctx["eps"], ctx["Wl"]
            )
            bp = bsdf.sample_bsdfcos_pdf(mp, normal, outgoing, mdir, types)
            if is_light:
                mw = bsdf.mis_heuristic(lp, bp) / jnp.maximum(lp, 1e-30)
            else:
                mw = bsdf.mis_heuristic(bp, lp) / jnp.maximum(bp, 1e-30)
            # Reference gate: all(bsdfcos != 0) && mis_weight != 0
            # (pathtracer.wgsl:790).
            go = active & v3.all_nonzero(f) & (mw != 0.0)
            return f, mw, go, bp

        # weight BEFORE the indirect factor feeds the strategy contributions.
        weight_pre = weight
        f_b, mw_b, go_b, bp_b = strategy_terms(bdir, False, nd & b_ok)
        # Reference break semantics: a zero BSDF sample skips the light
        # strategy too (pathtracer.wgsl:775).
        f_l, mw_l, go_l, _ = strategy_terms(ldir, True, nd & b_ok & l_ok)

        # Indirect continuation along the BSDF sample (pathtracer.wgsl:
        # 855-858) reuses the strategy's eval/pdf — recomputing them here
        # relied on XLA CSE and invited the two copies drifting apart.
        alive = alive & ~(nd & ~b_ok)
        f_ind = f_b / jnp.maximum(bp_b, 0.0)
        nd_ok = nd & b_ok
        weight = v3.where(nd_ok, weight * f_ind, weight)
        next_emission = jnp.where(nd, False, next_emission)

        # Delta continuation.
        state, rnl_d = rng_mod.next_f32(state)
        if scene.any_delta:
            tps = scene.present_mat_types
            inc_d = bsdf.sample_delta(mp, normal, outgoing, rnl_d, tps)
            dead_d = v3.all_zero(inc_d)
            alive = alive & ~(dl & dead_d)
            dl_ok = dl & ~dead_d
            f_d = bsdf.eval_delta(
                mp, normal, outgoing, inc_d, tps
            ) / jnp.maximum(
                bsdf.sample_delta_pdf(mp, normal, outgoing, inc_d, tps), 0.0
            )
            weight = v3.where(dl_ok, weight * f_d, weight)
        else:
            inc_d = v3.zeros(B)
        next_emission = jnp.where(dl, True, next_emission)

        incoming = v3.where(dl, inc_d, bdir)

        if scene.any_volumetric:
            crossing = (
                surf
                & alive
                & is_mat_volumetric(mp)
                & (v3.dot(normal, outgoing) * v3.dot(normal, incoming) < 0.0)
            )
            push = crossing & (c["vol_len"] == 0)
            pop = crossing & (c["vol_len"] > 0)
            vol_den = v3.where(push, mp.density, c["vol_den"])
            vol_sca = v3.where(push, mp.scattering, c["vol_sca"])
            vol_aniso = jnp.where(push, mp.sc_anisotropy, c["vol_aniso"])
            vol_len = c["vol_len"] + push.astype(jnp.int32) - pop.astype(jnp.int32)
        else:
            vol_den, vol_sca = c["vol_den"], c["vol_sca"]
            vol_aniso, vol_len = c["vol_aniso"], c["vol_len"]

        if scene.any_volumetric:
            state, inc_v, f_v, dead_v = _sample_volume_common(
                scene, ctx, vol_den, vol_sca, vol_aniso, outgoing, pos_vol, state,
                True,
            )
            alive = alive & ~(in_volume & dead_v)
            v_ok = in_volume & ~dead_v
            weight = v3.where(v_ok, weight * f_v, weight)
            incoming = v3.where(in_volume, inc_v, incoming)
            next_emission = jnp.where(in_volume, True, next_emission)

        new_ro = v3.where(in_volume, pos_vol, pos_surf)
        ro_cont = v3.where(alive, new_ro, ro)
        rd_cont = v3.where(alive, incoming, rd)

        alive = alive & ~v3.all_zero(weight) & v3.is_finite(weight)

        state, rr = rng_mod.next_f32(state)
        rr_on = alive & (c["bounce"] > 3)
        survive = jnp.minimum(0.99, v3.max_comp(weight))
        alive = alive & ~(rr_on & (rr >= survive))
        weight = v3.where(
            rr_on & (rr < survive),
            weight / jnp.maximum(survive, 1e-12),
            weight,
        )

        # --- path-end bookkeeping BEFORE the combined trace: lanes whose
        # path ends this bounce give slot A to their next sample's camera
        # ray; their BSDF-strategy ray moves to slot C ---
        entry_alive = c["alive"]
        bounce_next = c["bounce"] + 1
        done = entry_alive & (~alive | (bounce_next > max_bounces))
        if regen is not None:
            sample_idx = c["sample_idx"] + done.astype(jnp.int32)
            spawn = done & (sample_idx < regen["spp"])
            st_new = rng_mod.init_state(
                regen["pixel_idx"], regen["accum_counter"], regen["rng_seed"],
                sample_idx + regen["sample_offset"],
            )
            st_new, ro_n, rd_n = _camera_ray_from(regen, st_new)
            ro_a = v3.where(spawn, ro_n, ro_cont)
            rd_a = v3.where(spawn, rd_n, rd_cont)
            state_a = jnp.where(spawn, st_new, state)
            ne_a = jnp.where(spawn, True, next_emission)
            alive_next = (alive & ~done) | spawn
        else:
            spawn = jnp.zeros(B, bool)
            ro_a, rd_a, state_a, ne_a = ro_cont, rd_cont, state, next_emission
            alive_next = alive & ~done & (bounce_next <= max_bounces)

        active_a = alive_next
        active_b = go_l
        active_c = go_b & done

        # --- ONE combined trace: [continuation/respawn | NEE | dying-BSDF].
        # Only slot-A fresh-emission lanes run the stochastic alpha skip
        # (strategy rays use plain intersection, pathtracer.wgsl:835).
        ro3 = _v3cat(ro_a, pos_surf, pos_surf)
        rd3 = _v3cat(rd_a, ldir, bdir)
        z = jnp.zeros(B, bool)
        mask3 = jnp.concatenate([active_a & ne_a, z, z])
        active3 = jnp.concatenate([active_a, active_b, active_c])
        state3 = jnp.concatenate([state_a, state_a, state_a])
        hit3, attrs3, state3 = ray_skip_alpha(
            scene, ctx, ro3, rd3, state3, mask3, active=active3,
            coherent=False,
        )
        state_a = state3[:B]
        hit_a = _slice_tree(hit3, 0, B)
        hit_b = _slice_tree(hit3, B, 2 * B)
        hit_c = _slice_tree(hit3, 2 * B, 3 * B)
        attrs_a = _slice_tree(attrs3, 0, B)
        attrs_b = _slice_tree(attrs3, B, 2 * B)
        attrs_c = _slice_tree(attrs3, 2 * B, 3 * B)

        n_traced = (
            c["n_traced"]
            + active_a.astype(jnp.int32)
            + active_b.astype(jnp.int32)
            + active_c.astype(jnp.int32)
        )

        # --- strategy contributions (emission at the strategy hits) ---
        def strat_contrib(mdir, mhit, mattrs, f, mw, go):
            em = get_emission(scene, mhit, mattrs)
            if not scene.envs_empty:
                em = v3.where(mhit.hit, em, lights.sample_environments(scene, mdir))
            else:
                em = v3.where(mhit.hit, em, v3.zeros(B))
            contrib = v3.nan_to_zero(weight_pre * f * em * mw)
            return v3.where(go, contrib, v3.zeros(B))

        # The BSDF strategy's hit is slot A for surviving lanes (it IS the
        # next bounce), slot C for dying ones.
        bhit = jax.tree.map(lambda a_, c_: jnp.where(done, c_, a_), hit_a, hit_c)
        if has_attrs:
            battrs = jax.tree.map(
                lambda a_, c_: jnp.where(
                    done[None, :] if a_.ndim == 2 else done, c_, a_
                ),
                attrs_a, attrs_c,
            )
        else:
            battrs = None
        radiance = radiance + strat_contrib(bdir, bhit, battrs, f_b, mw_b, go_b)
        radiance = radiance + strat_contrib(ldir, hit_b, attrs_b, f_l, mw_l, go_l)

        out = dict(
            bounce=bounce_next if regen is None else jnp.where(spawn, 0, bounce_next),
            ro=ro_a,
            rd=rd_a,
            state=state_a,
            weight=weight,
            radiance=radiance,
            alive=alive_next,
            hit=hit_a,
            attrs=attrs_a if has_attrs else c["attrs"],
            vol_den=vol_den,
            vol_sca=vol_sca,
            vol_aniso=vol_aniso,
            vol_len=vol_len,
            next_emission=ne_a,
            n_bounces=n_bounces,
            n_traced=n_traced,
        )
        if regen is not None:
            acc = c["acc"] + v3.where(
                done, clamp_radiance(radiance, regen["max_radiance"]), v3.zeros(B)
            )
            out["sample_idx"] = sample_idx
            out["acc"] = acc
            out["weight"] = v3.where(spawn, v3.full(B, 1.0), weight)
            out["radiance"] = v3.where(spawn, v3.zeros(B), radiance)
            out["vol_len"] = jnp.where(spawn, 0, vol_len)
        return out

    c = jax.lax.while_loop(cond, body, init)
    if regen is not None:
        return c["acc"], c["n_traced"]
    return c["radiance"], c["state"], c["n_bounces"], c["n_traced"]


def clamp_radiance(radiance: V3, max_radiance) -> V3:
    """Firefly control (pathtracer.wgsl:1774-1783)."""

    finite = v3.is_finite(radiance)
    radiance = v3.where(finite, radiance, v3.zeros(radiance.x.shape))
    peak = v3.max_comp(radiance)
    over = peak > max_radiance
    scale = jnp.where(over, max_radiance / jnp.maximum(peak, 1e-20), 1.0)
    return radiance * scale
