"""Packet (per-block persistent) BVH traversal — the sort-free backend.

The sort-carried wavefront (kernels/intersect.py::_wf_round) moves every
ray through TWO O(QB log^2 QB) bitonic sorts and a separate top-traverse
dispatch per round; at 131k rays that is ~15 ms of sort traffic per round
regardless of how little real intersection work a round contains. This
kernel is the opposite trade, the TPU analog of the GPU's persistent-
threads traversal (the reference walks its BVH per thread,
bvh_custom.wgsl:195-288): rays are cut into fixed blocks of `PBK` lanes,
and each block walks the ENTIRE top tree to completion inside one Pallas
grid step with

- the wide-node stack in SMEM (scalar pops/pushes, one packed i32 per
  child reference),
- the 8 children of a popped row tested against all PBK rays at once on
  the VPU ((8, PBK) slab test folded to ONE vector->scalar bitmask per
  pop — per-child scalar extraction would serialize on the scalar unit),
- superleaf leaves intersected by DMA-ing the (4, 10, SP) triangle
  coefficient block from HBM into VMEM and running the same transposed
  MXU evaluation as kernels/pallas_bvh._pair_kernel,
- per-ray best state (t/u/v/det/tri) resident in VMEM scratch for the
  whole walk.

Nothing ever leaves the chip between rounds: no grouping sort, no
un-sort, no per-round HBM round-trip of ray/stack state. The price is
packet divergence: every ray in a block pays for the union of the
block's superleaf visits. Blocks of camera rays / regenerated wavefront
rays are coherent enough that the union stays small; the caller can fall
back to the sort-based wavefront for pathological batches.

Reference parity: traversal order and hit selection match
bvh_custom.wgsl:195-288 (closest hit, strict-< tie keeping) and the
triangle algebra is ray_tri_dst (pathtracer.wgsl:2922-2943) hoisted into
the per-triangle coefficient matrix (intersect.build_tri_matrix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.superleaf import (
    CH_H2,
    CH_HI,
    CH_HI8,
    CH_ISLEAF,
    CH_LO,
    CH_LO8,
    CH_STRIDE,
    TOP_FAN,
)
from ..core.vec3 import V3

F32_MAX = 3.4028235e38

# Coefficient rows per feature, PADDED to the f32 sublane tile (8): the
# logical matrix is (4, 10, T) (intersect.build_tri_matrix) but an HBM
# DMA may only slice tile-aligned extents along the second-minor dim —
# Mosaic rejects a (4, 10, SP) slice of the (physically 16-row-padded)
# array outright ("Slice shape along dimension 1 must be aligned to
# tiling (8), but is 10", seen on v5e). The HBM layout already pads 10
# -> 16 rows, so DMA-ing all 16 moves the same tiles; the 6 pad rows are
# zeros and the ray-feature stack is zero-padded to match, so every dot
# over the 16-row axis is unchanged.
WROWS = 16


def _pack_top(tab: jnp.ndarray):
    """Split the condensed row table into the two kernel-side tables.

    tab: (rows_pad, TOP_FAN*CH_STRIDE) f32 (accel/superleaf.build_top_table)
    ->  geo  (rows_pad, TOP_FAN, 8) f32: [lo.xyz, hi.xyz, isleaf, 0].
        Mosaic lane-pads the minor 8 -> 128, a 16x blowup (137.9 MB of
        VMEM at 33664 rows — the instanced-100k packet OOM,
        out_hw/bench2.log). A flat (rows, 64) layout avoids it but the
        (64,) -> (8, 8) restore is an unsupported Mosaic shape cast
        (out_hw/prof_iter4.log), so oversized tables instead disable the
        packet backend via _geo_vmem_ok (sort carries those scenes).
        refs (rows_pad, TOP_FAN)   i32: (child_ref << 1) | isleaf
    """

    rows_pad = tab.shape[0]
    t3 = tab.reshape(rows_pad, TOP_FAN, CH_STRIDE)
    geo = jnp.concatenate(
        [
            t3[:, :, CH_LO],
            t3[:, :, CH_HI],
            t3[:, :, CH_ISLEAF : CH_ISLEAF + 1],
            jnp.zeros((rows_pad, TOP_FAN, 1), jnp.float32),
        ],
        axis=2,
    )
    ref = (
        t3[:, :, CH_H2].astype(jnp.int32) * 65536
        + t3[:, :, CH_HI8].astype(jnp.int32) * 256
        + t3[:, :, CH_LO8].astype(jnp.int32)
    )
    is_leaf = (t3[:, :, CH_ISLEAF] > 0.5).astype(jnp.int32)
    refs = (ref << 1) | is_leaf
    return geo, refs


_PROBE_OK: dict = {}  # {scene_probe_key(scene): bool} — see probe_scene()


def env_on(name: str) -> bool:
    """Boolean env knob: set and not "0"/"" (so VAR=0 means OFF — plain
    truthiness made LUPIN_SKIP_PROBE=0 skip the correctness probe)."""

    import os

    return os.environ.get(name, "") not in ("", "0")


def smem_tables_fit(scene) -> bool:
    """Whether the two-level gsl/transform tables fit SMEM-resident.

    SMEM is ~1MB; the resident mode spends 8 B per global superleaf
    (gsl_msl+gsl_inst) + 48 B per instance (inst_inv) + ~4.6 B/gsl for the
    child-ref table, so the classic gates keep it under ~400 KB. Beyond
    them the kernel switches to TL_STREAM: per-leaf 64-byte DMA of
    scene.gsl_meta rows from HBM (only the child-ref table stays in SMEM),
    raising the envelope to LUPIN_PACKET_MAX_GSL global superleaves.
    LUPIN_PACKET_STREAM=1 forces streaming (test/tuning knob)."""

    if env_on("LUPIN_PACKET_STREAM"):
        return False
    return scene.sl_count <= 16384 and scene.num_instances <= 4096


def scene_probe_key(scene) -> tuple:
    """Static specialization signature of the packet kernel for a scene:
    everything that changes the Mosaic lowering or its SMEM/VMEM budgets
    (kernel constants SP/NSUB/AWOUT/TWO_LEVEL plus the stack depth and the
    SMEM table extents). All fields are static pytree leaves, so this is
    callable during tracing."""

    return (
        bool(scene.two_level),
        int(scene.sl_stride),
        int(scene.sl_sub.shape[1]),
        bool(scene.any_normal_maps),
        int(scene.top_depth),
        int(scene.sl_count),
        int(scene.num_instances),
        # SMEM-resident vs HBM-streamed two-level tables: distinct
        # lowerings (env overridable, so not derivable from the counts).
        bool(scene.two_level) and smem_tables_fit(scene),
    )


def disable(scene, reason: str) -> None:
    """Mark this scene's packet specialization bad; subsequent dispatches
    re-trace onto the sort-wavefront backend (intersect._use_packet)."""

    import sys

    key = scene_probe_key(scene)
    if _PROBE_OK.get(key) is not False:
        print(
            f"# packet backend disabled for signature {key}: {reason}; "
            "falling back to the sort wavefront",
            file=sys.stderr,
        )
    _PROBE_OK[key] = False


def _probe_rays(scene, n=256):
    """Deterministic ray bundle spanning the scene's world bounds: origins
    on a sphere outside the root AABB, directions toward jittered interior
    targets — a mix of hits and misses through the real top tree."""

    import numpy as np

    t3 = np.asarray(scene.top_tab[:1].astype(jnp.float32)).reshape(
        1, TOP_FAN, CH_STRIDE
    )[0]
    used = t3[:, CH_LO.start] < 1e37
    lo = t3[used][:, CH_LO].min(axis=0)
    hi = t3[used][:, CH_HI].max(axis=0)
    c = (lo + hi) * 0.5
    r = float(np.linalg.norm(hi - lo)) * 0.5 + 1e-3
    g = np.random.default_rng(0)
    u = g.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    o = c + 1.6 * r * u
    tgt = c + 0.35 * r * g.normal(size=(n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o32, d32 = o.astype(np.float32), d.astype(np.float32)
    return (
        V3(jnp.asarray(o32[:, 0]), jnp.asarray(o32[:, 1]), jnp.asarray(o32[:, 2])),
        V3(jnp.asarray(d32[:, 0]), jnp.asarray(d32[:, 1]), jnp.asarray(d32[:, 2])),
    )


def probe_scene(scene) -> bool:
    """One-time compile + CORRECTNESS probe of the packet kernel at the
    actual scene's static shapes (ADVICE r3 #2 — the old toy probe proved
    lowering at SP=128/NSUB=1 only, and only asserted finiteness).

    The kernel leans on Mosaic features (DMA inside a data-dependent
    while, dynamic VMEM row reads, SMEM stacks) that only the real TPU
    lowering exercises, and a hardware miscompile can return
    wrong-but-finite results. So on TPU this traces 256 synthetic rays
    through the REAL scene tables with BOTH the packet kernel and the jnp
    masked-stack reference walk and compares: any lowering failure OR
    result mismatch disables the signature, and every render of a scene
    with this signature falls back to the sort wavefront instead of
    crashing or rendering wrong. Cached per signature per process.
    LUPIN_SKIP_PROBE=1 skips the probe compiles (trusts the kernel)."""

    key = scene_probe_key(scene)
    if key in _PROBE_OK:
        return _PROBE_OK[key]
    if jax.default_backend() != "tpu":
        _PROBE_OK[key] = True  # interpret — covered by the test suite
        return True
    if env_on("LUPIN_SKIP_PROBE"):
        _PROBE_OK[key] = True
        return True
    try:
        import numpy as np

        from . import intersect as it

        ro, rd = _probe_rays(scene)
        W4 = it.scene_tri_matrix(scene)
        # Scene tables and W4 MUST be jit ARGUMENTS, never closed over:
        # closures bake them into the MLIR as dense constants, and at
        # real scene scale the remote-compile request body runs to
        # hundreds of MB (observed: HTTP 413 on the axon tunnel at 2.9M
        # tris). The renderer's own dispatches pass scene as an argument
        # already; the probe must match.
        if scene.two_level:
            # Two-level scenes have NO jnp masked-stack walk (flatten
            # builds placeholder bvh_* arrays). The reference is the
            # brute-force chunked all-pairs evaluation: pure XLA, so it
            # compiles at ANY instance count (the sort wavefront's SMEM/
            # VMEM tables scale with n_inst and stop compiling ~10k
            # instances — a probe reference must never be the thing that
            # fails first).
            ref = jax.jit(
                lambda s, o, d, w: it.closest_hit_brute_two_level(
                    s, o, d, 1e-4, w
                )
            )(scene, ro, rd, W4)
        else:
            ref = jax.jit(
                lambda s, o, d: it.closest_hit_bvh(s, o, d, 1e-4)
            )(scene, ro, rd)
        ref_hit = np.asarray(ref.hit)
        ref_t = np.asarray(ref.dst)
        t, u, v, det, tri = jax.jit(
            lambda s, o, d, w: packet_traverse(s, o, d, 1e-4, w)
        )(scene, ro, rd, W4)
        tn = np.asarray(t)
        hit = tn < F32_MAX
        # The packet kernel evaluates triangles via the MXU coefficient
        # formulation while the reference walk uses plain jnp algebra: an
        # edge-grazing ray can round a near-zero det/t to opposite sides
        # of the hit threshold in the two formulations. A tiny mask-
        # disagreement budget keeps one marginal ray out of 256 from
        # falsely disabling the backend for the whole scene; a miscompile
        # disagrees wholesale and still trips it.
        # Explicit raises, not bare assert: under python -O the probe must
        # NOT silently degrade into a vacuous compile check.
        n_dis = int((hit != ref_hit).sum())
        if n_dis > 2:
            raise AssertionError(
                f"hit-mask mismatch vs stack walk on {n_dis} rays"
            )
        both = hit & ref_hit
        if both.any():
            np.testing.assert_allclose(
                tn[both], ref_t[both], rtol=1e-4, atol=1e-5,
                err_msg="hit-distance mismatch vs stack walk",
            )
            same = (np.asarray(tri) == np.asarray(ref.tri))[both]
            if not same.mean() > 0.9:
                raise AssertionError("winning-triangle mismatch")
        if not scene.two_level:
            t2, *rest = jax.jit(
                lambda s, o, d, w: packet_traverse(
                    s, o, d, 1e-4, w, with_attrs=True
                )
            )(scene, ro, rd, W4)
            np.testing.assert_array_equal(
                np.asarray(t2), tn, err_msg="fused-attrs t differs"
            )
            if not bool(jnp.isfinite(rest[-1]).all()):
                raise AssertionError("non-finite attrs")
        _PROBE_OK[key] = True
    except Exception as e:  # noqa: BLE001 — any failure disables
        disable(scene, f"{type(e).__name__}: {e}")
    return _PROBE_OK[key]


def _packet_kernel(
    geo_ref, refs_ref, sub_ref, rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref,
    rdz_ref, act_ref, W_ref, *rest,
    SP, NSUB, PBK, AWOUT, TWO_LEVEL, TL_STREAM, interpret,
):
    # Optional phases reshape the tail of the signature:
    #   two-level SMEM mode: + gmsl/ginst/txf SMEM inputs (before A/eps)
    #   two-level STREAM mode: + gmeta HBM input; meta/msem scratch (tail)
    #   with attrs: A_ref input | ia_ref output | av_ref scratch
    rest = list(rest)
    if TL_STREAM:
        gmeta_ref = rest[0]
        rest = rest[1:]
        meta_ref, msem_ref = rest[-2:]
        rest = rest[:-2]
    elif TWO_LEVEL:
        gmsl_ref, ginst_ref, txf_ref = rest[:3]
        rest = rest[3:]
    if AWOUT:
        (A_ref, eps_ref, t_ref, u_ref, v_ref, det_ref, idx_ref, ia_ref,
         stack_ref, wv_ref, bt_ref, bu_ref, bv_ref, bd_ref, bi_ref,
         av_ref, sem_ref) = rest
    else:
        (eps_ref, t_ref, u_ref, v_ref, det_ref, idx_ref,
         stack_ref, wv_ref, bt_ref, bu_ref, bv_ref, bd_ref, bi_ref,
         sem_ref) = rest
    eps = eps_ref[0]

    def vec(ref):
        return ref[0].reshape(-1)  # (1, sub, 128) block -> (PBK,)

    rox, roy, roz = vec(rox_ref), vec(roy_ref), vec(roz_ref)
    rdx, rdy, rdz = vec(rdx_ref), vec(rdy_ref), vec(rdz_ref)
    active = vec(act_ref) > 0.0
    # Slab reciprocals: IEEE inf on zero components (intersect._ray_aabb_dst).
    ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
    cx = roy * rdz - roz * rdy
    cy = roz * rdx - rox * rdz
    cz = rox * rdy - roy * rdx
    # Transposed ray features (WROWS, PBK): rays ride the lanes (see
    # pallas_bvh._pair_kernel's layout note — a (PBK, 10) minor-axis stack
    # is an unsupported Mosaic relayout). Rows 10..15 are zeros matching
    # the coefficient matrix's tile padding (see WROWS).
    zr = jnp.zeros_like(rox)
    RT = jnp.stack(
        [rdx, rdy, rdz, cx, cy, cz, rox, roy, roz, jnp.ones_like(rox)]
        + [zr] * (WROWS - 10),
        axis=0,
    )

    bt_ref[...] = jnp.full((PBK,), F32_MAX)
    bu_ref[...] = jnp.zeros((PBK,), jnp.float32)
    bv_ref[...] = jnp.zeros((PBK,), jnp.float32)
    bd_ref[...] = jnp.zeros((PBK,), jnp.float32)
    bi_ref[...] = jnp.zeros((PBK,), jnp.int32)

    stack_ref[0] = 0  # root row, internal (leaf bit clear)
    any_active = jnp.any(active)

    SPB = SP // NSUB
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (SPB, PBK), 0)
    dims_t = (((0,), (0,)), ((), ()))  # contract dim 0 x dim 0
    dims_oh = (((1,), (0,)), ((), ()))

    def slab_bits(row, bt, o=None, iv=None):
        """(8, PBK) slab test of a [lo3, hi3, used, 0] row group against
        all rays, folded to ONE scalar bitmask (bit c = any ray hits child
        c closer than its best). Empty slots carry an inverted box that
        PASSES the slab test (near=-huge / far=+huge) — masked on the
        used = -1 marker (col 6). `o`/`iv` override the ray frame (mesh-
        space sub-chunk tests on two-level scenes)."""

        ox, oy, oz = o if o is not None else (rox, roy, roz)
        jvx, jvy, jvz = iv if iv is not None else (ivx, ivy, ivz)
        pow2 = 1 << jax.lax.broadcasted_iota(
            jnp.int32, (row.shape[0], 1), 0
        )
        tx1 = (row[:, 0:1] - ox[None, :]) * jvx[None, :]
        tx2 = (row[:, 3:4] - ox[None, :]) * jvx[None, :]
        ty1 = (row[:, 1:2] - oy[None, :]) * jvy[None, :]
        ty2 = (row[:, 4:5] - oy[None, :]) * jvy[None, :]
        tz1 = (row[:, 2:3] - oz[None, :]) * jvz[None, :]
        tz2 = (row[:, 5:6] - oz[None, :]) * jvz[None, :]
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
            jnp.minimum(tz1, tz2),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
            jnp.maximum(tz1, tz2),
        )
        hit8 = (
            (far >= near)
            & (far > 0.0)
            & (near < bt[None, :])
            & (row[:, 6:7] > -0.5)
            & active[None, :]
        )
        return jnp.sum(
            jnp.max(jnp.where(hit8, pow2, 0), axis=1), dtype=jnp.int32
        )

    def _mesh_frame(m):
        """Instance-transformed ray frame from 12 inverse-transform scalars
        (direction unnormalized so t stays world-scaled,
        bvh_custom.wgsl:30-35)."""

        lox = m[0] * rox + m[1] * roy + m[2] * roz + m[3]
        loy = m[4] * rox + m[5] * roy + m[6] * roz + m[7]
        loz = m[8] * rox + m[9] * roy + m[10] * roz + m[11]
        ldx = m[0] * rdx + m[1] * rdy + m[2] * rdz
        ldy = m[4] * rdx + m[5] * rdy + m[6] * rdz
        ldz = m[8] * rdx + m[9] * rdy + m[10] * rdz
        lcx = loy * ldz - loz * ldy
        lcy = loz * ldx - lox * ldz
        lcz = lox * ldy - loy * ldx
        zl = jnp.zeros_like(lox)
        RTl = jnp.stack(
            [ldx, ldy, ldz, lcx, lcy, lcz, lox, loy, loz,
             jnp.ones_like(lox)] + [zl] * (WROWS - 10),
            axis=0,
        )
        return RTl, (lox, loy, loz), (1.0 / ldx, 1.0 / ldy, 1.0 / ldz)

    def leaf_compute(gref, buf):
        """Intersect the (already-DMA'd) leaf `gref` from buffer slot
        `buf`: masked sub-chunk mini-visits + winner pick."""

        if TWO_LEVEL:
            # gref is a GLOBAL (instance x mesh-superleaf) id: move the
            # rays into mesh space by the instance's inverse transform;
            # intersect the MESH superleaf.
            wref = gmsl_ref[gref]
            inst = ginst_ref[gref]
            RTl, ol, ivl = _mesh_frame([txf_ref[inst, j] for j in range(12)])
        else:
            wref = gref
            RTl = RT
            ol = ivl = None

        if not interpret:
            # Wait on this buffer's in-flight copy (started at pop time;
            # internal pops and the other leaf's compute overlapped it).
            pltpu.make_async_copy(
                W_ref.at[:, :, pl.ds(wref * SP, SP)], wv_ref.at[buf],
                sem_ref.at[buf],
            ).wait()

        _isect_core(wref, gref, buf, RTl, ol, ivl)

    def leaf_compute_stream(gref, cbuf, mbuf):
        """TL_STREAM retire: the leaf's 64-byte gsl_meta row landed in
        meta_ref[mbuf] (waited when its coefficient DMA was started) and
        its coefficient block is in flight into wv_ref[cbuf]."""

        wref = meta_ref[mbuf, 0].astype(jnp.int32)
        if not interpret:
            pltpu.make_async_copy(
                W_ref.at[:, :, pl.ds(wref * SP, SP)], wv_ref.at[cbuf],
                sem_ref.at[cbuf],
            ).wait()
        RTl, ol, ivl = _mesh_frame(
            [meta_ref[mbuf, 2 + j] for j in range(12)]
        )
        _isect_core(wref, gref, cbuf, RTl, ol, ivl)

    def _isect_core(wref, gref, buf, RTl, ol, ivl):
        sbits = slab_bits(sub_ref[wref], bt_ref[...], o=ol, iv=ivl)

        for sb in range(NSUB):
            on = (sbits >> sb) & 1

            @pl.when(on == 1)
            def _sub(sb=sb):
                lo = sb * SPB

                # Hand-rolled bf16 hi/lo 3-pass product (~2^-16 rel error
                # — fine for the candidate filter; the winner's u/v/det
                # are recomputed exactly by pick() below): halves the MXU
                # passes vs HIGHEST's bf16x6. Same scheme as
                # pallas_bvh._pair_kernel; replaces the LUPIN_PACKET_EV_PREC
                # knob whose HIGH setting Mosaic never lowered (VERDICT r4
                # weak #7).
                Rhi = RTl.astype(jnp.bfloat16)
                Rlo = (RTl - Rhi.astype(jnp.float32)).astype(jnp.bfloat16)

                def ev(f):
                    Wsl = wv_ref[buf, f, :, pl.ds(lo, SPB)]
                    Whi = Wsl.astype(jnp.bfloat16)
                    Wlo = (Wsl - Whi.astype(jnp.float32)).astype(jnp.bfloat16)

                    def dot(a, b):
                        return jax.lax.dot_general(
                            a, b, dims_t,
                            preferred_element_type=jnp.float32,
                        )

                    return dot(Whi, Rhi) + dot(Whi, Rlo) + dot(Wlo, Rhi)
                    # (SPB, PBK)

                det = ev(0)
                nu = ev(1)
                nv = ev(2)
                nt = ev(3)
                d = 1.0 / det
                tt = nt * d
                uu = nu * d
                vv = nv * d
                valid = (
                    (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt >= eps)
                )
                tm = jnp.where(valid, tt, F32_MAX)
                tmin = jnp.min(tm, axis=0)  # (PBK,)
                at_min = (tm <= tmin[None, :]) & valid
                li = jnp.min(
                    jnp.where(at_min, iota_sub, 2**30), axis=0
                )

                bt0 = bt_ref[...]
                upd = (tmin < bt0) & active
                # Winner u/v/det via an exact f32 one-hot fetch of the
                # winning triangle's coefficient rows (as _pair_kernel).
                ohw = (iota_sub == li[None, :]).astype(jnp.float32)

                def pick(f):
                    return jax.lax.dot_general(
                        wv_ref[buf, f, :, pl.ds(lo, SPB)], ohw, dims_oh,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # (10, PBK)

                wdet = jnp.sum(pick(0) * RTl, axis=0)
                wnu = jnp.sum(pick(1) * RTl, axis=0)
                wnv = jnp.sum(pick(2) * RTl, axis=0)
                wnt = jnp.sum(pick(3) * RTl, axis=0)
                wd = 1.0 / wdet
                # Store the winner's EXACT f32 t (candidate selection ran
                # at 3-pass precision; the stored hit distance must be the
                # exact distance OF the stored triangle).
                bt_ref[...] = jnp.where(upd, wnt * wd, bt0)
                bu_ref[...] = jnp.where(upd, wnu * wd, bu_ref[...])
                bv_ref[...] = jnp.where(upd, wnv * wd, bv_ref[...])
                bd_ref[...] = jnp.where(upd, wdet, bd_ref[...])
                bi_ref[...] = jnp.where(
                    upd, gref * SP + lo + li, bi_ref[...]
                )

    def _step_internal(sp):
        """Shared pop: (8, PBK) slab test of an internal row, one bitmask
        per pop, ordered pushes. The row read is clamped so a leaf pop
        never reads a leaf id as a row index; the result is discarded via
        the bits mask."""

        pref = stack_ref[sp - 1]
        is_leaf = pref & 1
        ref = pref >> 1
        rref = jnp.where(is_leaf == 0, ref, 0)
        bits = slab_bits(geo_ref[rref], bt_ref[...])
        bits = jnp.where(is_leaf == 0, bits, 0)

        sp2 = sp - 1
        for c2 in range(TOP_FAN):
            pushed = (bits >> c2) & 1

            @pl.when(pushed == 1)
            def _push(c2=c2, sp2=sp2):
                # refs is FLAT (rows*TOP_FAN,): a 2-D (rows, 8) i32 SMEM
                # operand is lane-padded 8 -> 128 (2.4 MB at 4736 rows,
                # over the 1 MB SMEM — the TL_STREAM hardware failure,
                # out_hw/r5_seq1.log); 1-D SMEM is not padded.
                stack_ref[sp2] = refs_ref[rref * TOP_FAN + c2]

            sp2 = sp2 + pushed
        return is_leaf, ref, sp2

    def body(c):
        sp, pend, par = c
        is_leaf, ref, sp2 = _step_internal(sp)

        # ---- leaf: software pipeline. Start THIS leaf's DMA into
        # buffer `par`, then intersect the PREVIOUS pending leaf from the
        # other buffer while the copy flies. Internal pops in between
        # overlap in-flight copies for free. Deferring the compute only
        # delays best_t tightening (pruning quality), never correctness.
        @pl.when(is_leaf == 1)
        def _start():
            lref = jnp.where(is_leaf == 1, ref, 0)
            wref = gmsl_ref[lref] if TWO_LEVEL else lref
            if interpret:
                wv_ref[par] = W_ref[:, :, pl.ds(wref * SP, SP)]
            else:
                pltpu.make_async_copy(
                    W_ref.at[:, :, pl.ds(wref * SP, SP)], wv_ref.at[par],
                    sem_ref.at[par],
                ).start()

        @pl.when((is_leaf == 1) & (pend > 0))
        def _drain_prev():
            leaf_compute(pend - 1, 1 - par)

        new_pend = jnp.where(is_leaf == 1, ref + 1, pend)
        new_par = jnp.where(is_leaf == 1, 1 - par, par)
        return sp2, new_pend, new_par

    def promote_leaf(p1g, p1m, parc):
        """TL_STREAM promote: wait p1's 64-byte meta DMA, read its mesh-
        superleaf id, start its coefficient DMA into buffer `parc`.
        Shared by body_stream's steady state and the final drain — the
        two MUST stay identical or the last leaf desynchronizes."""

        if interpret:
            w1 = meta_ref[p1m, 0].astype(jnp.int32)
            wv_ref[parc] = W_ref[:, :, pl.ds(w1 * SP, SP)]
        else:
            pltpu.make_async_copy(
                gmeta_ref.at[p1g - 1], meta_ref.at[p1m], msem_ref.at[p1m],
            ).wait()
            w1 = meta_ref[p1m, 0].astype(jnp.int32)
            pltpu.make_async_copy(
                W_ref.at[:, :, pl.ds(w1 * SP, SP)], wv_ref.at[parc],
                sem_ref.at[parc],
            ).start()

    def body_stream(c):
        """TL_STREAM: the leaf metadata (mesh superleaf + transform) lives
        in HBM, so the pipeline gains a stage. Per leaf pop L:

          B. promote p1 (popped one leaf ago): wait its 64-byte meta DMA
             (it had the whole inter-leaf window to land), read its mesh-
             superleaf id, start its big coefficient DMA;
          A. retire p2 (popped two leaves ago): its coefficient DMA has
             been flying since the previous pop — compute it now, which
             also overlaps p1's coefficient copy;
          C. start THIS leaf's meta DMA (slot parm of 4; a slot is live
             for at most 2 subsequent leaf pops).

        p1g/p2g hold gref+1 (0 = empty); p1m/p2m their meta slots; p2c the
        coefficient buffer."""

        sp, p1g, p1m, p2g, p2c, p2m, parm, parc = c
        is_leaf, ref, sp2 = _step_internal(sp)

        @pl.when(is_leaf == 1)
        def _leaf():
            @pl.when(p1g > 0)
            def _promote():
                promote_leaf(p1g, p1m, parc)

            @pl.when(p2g > 0)
            def _retire():
                leaf_compute_stream(p2g - 1, p2c, p2m)

            lref = jnp.where(is_leaf == 1, ref, 0)
            if interpret:
                meta_ref[parm] = gmeta_ref[lref]
            else:
                pltpu.make_async_copy(
                    gmeta_ref.at[lref], meta_ref.at[parm], msem_ref.at[parm],
                ).start()

        leaf = is_leaf == 1
        started = leaf & (p1g > 0)
        new_p2g = jnp.where(leaf, p1g, p2g)
        new_p2c = jnp.where(started, parc, p2c)
        new_p2m = jnp.where(leaf, p1m, p2m)
        new_p1g = jnp.where(leaf, ref + 1, p1g)
        new_p1m = jnp.where(leaf, parm, p1m)
        new_parm = jnp.where(leaf, (parm + 1) & 3, parm)
        new_parc = jnp.where(started, 1 - parc, parc)
        return (sp2, new_p1g, new_p1m, new_p2g, new_p2c, new_p2m,
                new_parm, new_parc)

    if TL_STREAM:
        z = jnp.int32(0)
        fc = jax.lax.while_loop(
            lambda c: (c[0] > 0) & any_active, body_stream,
            (jnp.int32(1), z, z, z, z, z, z, z),
        )
        _, p1g, p1m, p2g, p2c, p2m, parm, parc = fc

        @pl.when(p2g > 0)
        def _drain_p2():
            leaf_compute_stream(p2g - 1, p2c, p2m)

        @pl.when(p1g > 0)
        def _drain_p1():
            promote_leaf(p1g, p1m, parc)
            leaf_compute_stream(p1g - 1, parc, p1m)
    else:
        fc = jax.lax.while_loop(
            lambda c: (c[0] > 0) & any_active, body,
            (jnp.int32(1), jnp.int32(0), jnp.int32(0)),
        )
        _, pend_f, par_f = fc

        @pl.when(pend_f > 0)
        def _drain_last():
            leaf_compute(pend_f - 1, 1 - par_f)

    sub = PBK // 128

    def out(ref, val):
        ref[0] = val.reshape(sub, 128)

    out(t_ref, bt_ref[...])
    out(u_ref, bu_ref[...])
    out(v_ref, bv_ref[...])
    out(det_ref, bd_ref[...])
    out(idx_ref, bi_ref[...])

    if AWOUT:
        _attr_phase(
            A_ref, av_ref, ia_ref, sem_ref,
            bt_ref[...], bu_ref[...], bv_ref[...], bi_ref[...],
            SP=SP, PBK=PBK, AWOUT=AWOUT, interpret=interpret,
        )


# DMA width of the packed attribute matrix: the IA inputs live in columns
# [0, 60) of the 128-wide rows (pallas_intersect.ATTR_* layout), but an
# HBM DMA may only slice lane-tile (128) multiples along the minor dim,
# so the copy takes the full row — same tiles as a 64-wide slice would
# touch anyway.
AWC = 128


def _attr_phase(A_ref, av_ref, ia_ref, sem_ref, bt, bu, bv, bi,
                *, SP, PBK, AWOUT, interpret):
    """Deferred winner-attribute interpolation, in-kernel.

    After the walk each lane's winner lives in ONE superleaf; the block
    loops over its DISTINCT winning superleaves (typically a handful):
    DMA that superleaf's attribute slice, one-hot-fetch the winning rows
    for the lanes it owns, interpolate at the winner barycentrics, blend.
    Replaces wavefront_fetch_attrs' two QB-sized sorts + grouped kernel
    (the analog of the reference reading vertex attrs at the hit point,
    pathtracer.wgsl:1729-1770)."""

    from . import pallas_intersect as pk
    from .pallas_bvh import (
        IA_BIT, IA_DET_SIGN, IA_GN, IA_HAS_UV, IA_MAT_ID, IA_N, IA_ROWS_NM,
        IA_TAN, IA_TU, IA_TV, IA_VC, IA_VCA,
    )

    ia_ref[0] = jnp.zeros((AWOUT, PBK), jnp.float32)
    hitm = bt < F32_MAX
    wsl = jnp.where(hitm, bi // SP, 2**30)
    wli = bi % SP
    iota_sp = jax.lax.broadcasted_iota(jnp.int32, (SP, PBK), 0)
    dims_oh = (((0,), (0,)), ((), ()))  # (SP, AWC) x (SP, PBK) -> (AWC, PBK)

    # The remaining-lanes set is carried as i32, not bool: Mosaic cannot
    # legalize an scf.yield of a vector<...xi1> loop carry ("failed to
    # legalize operation 'scf.yield'" with an i1 vpad layout, seen on v5e
    # 2026-08-19) — masks must round-trip through a 32-bit vector.
    def cond(rem_i):
        return jnp.any(rem_i > 0)

    def body(rem_i):
        rem = rem_i > 0
        sl_cur = jnp.min(jnp.where(rem, wsl, 2**30))
        if interpret:
            av_ref[...] = A_ref[pl.ds(sl_cur * SP, SP), :AWC]
        else:
            dma = pltpu.make_async_copy(
                A_ref.at[pl.ds(sl_cur * SP, SP), :AWC], av_ref,
                sem_ref.at[0],
            )
            dma.start()
            dma.wait()
        sel = rem & (wsl == sl_cur)
        ohw = (
            iota_sp == jnp.where(sel, wli, -1)[None, :]
        ).astype(jnp.float32)
        at = jax.lax.dot_general(
            av_ref[...], ohw, dims_oh,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (AWC, PBK)

        hu, hv = bu, bv
        hw = 1.0 - hu - hv
        rows = [jnp.zeros((PBK,), jnp.float32)] * AWOUT

        def interp(s0, s1, s2, c):
            return at[s0.start + c] * hw + at[s1.start + c] * hu + (
                at[s2.start + c] * hv
            )

        for c in range(3):
            rows[IA_N.start + c] = interp(pk.ATTR_N0, pk.ATTR_N1, pk.ATTR_N2, c)
            rows[IA_GN.start + c] = at[pk.ATTR_GN.start + c]
            rows[IA_VC.start + c] = interp(pk.ATTR_C0, pk.ATTR_C1, pk.ATTR_C2, c)
        rows[IA_TU] = interp(pk.ATTR_UV0, pk.ATTR_UV1, pk.ATTR_UV2, 0)
        rows[IA_TV] = interp(pk.ATTR_UV0, pk.ATTR_UV1, pk.ATTR_UV2, 1)
        rows[IA_HAS_UV] = at[pk.ATTR_HAS_UV]
        rows[IA_VCA] = interp(pk.ATTR_C0, pk.ATTR_C1, pk.ATTR_C2, 3)
        rows[IA_DET_SIGN] = at[pk.ATTR_DET_SIGN]
        rows[IA_MAT_ID] = at[pk.ATTR_MAT_ID]
        if AWOUT >= IA_ROWS_NM:
            for c in range(3):
                rows[IA_TAN.start + c] = at[pk.ATTR_TAN.start + c]
                rows[IA_BIT.start + c] = at[pk.ATTR_BIT.start + c]
        new = jnp.stack(rows, axis=0)  # (AWOUT, PBK)
        selw = sel[None, :]
        ia_ref[0] = jnp.where(selw, new, ia_ref[0])
        return (rem & ~sel).astype(jnp.int32)

    jax.lax.while_loop(cond, body, hitm.astype(jnp.int32))


def _coherence_key(scene, ro: V3, rd: V3, active):
    """Per-ray traversal-coherence sort key (i32, ascending):

      [15] inactive      — dead lanes pack into all-inactive tail blocks,
                           which the kernel skips wholesale (any_active)
      [14:12] dir octant — rays in a block walk the top tree together
      [11:0] morton cell — 16^3 origin cell in root-AABB space

    Blocks of key-sorted rays see near-camera-like leaf-visit unions even
    on bounce batches, where pixel-order blocks pay ~2x divergence
    (measured 40.6 vs 21.3 ms on arealights1, prof_packet 2026-08-19)."""

    t0 = scene.top_tab[0].astype(jnp.float32).reshape(TOP_FAN, CH_STRIDE)
    used = t0[:, CH_ISLEAF] > -0.5
    big = jnp.float32(F32_MAX)
    lo = jnp.min(
        jnp.where(used[:, None], t0[:, CH_LO], big), axis=0
    )
    hi = jnp.max(
        jnp.where(used[:, None], t0[:, CH_HI], -big), axis=0
    )
    inv = 15.9999 / jnp.maximum(hi - lo, 1e-20)

    def q(x, c):
        return jnp.clip(
            ((x - lo[c]) * inv[c]).astype(jnp.int32), 0, 15
        )

    def spread4(v):
        return (
            (v & 1) | ((v & 2) << 2) | ((v & 4) << 4) | ((v & 8) << 6)
        )

    morton = (
        spread4(q(ro.x, 0))
        | (spread4(q(ro.y, 1)) << 1)
        | (spread4(q(ro.z, 2)) << 2)
    )
    octant = (
        (rd.x < 0).astype(jnp.int32)
        | ((rd.y < 0).astype(jnp.int32) << 1)
        | ((rd.z < 0).astype(jnp.int32) << 2)
    )
    key = morton | (octant << 12)
    if active is not None:
        key = key | jnp.where(active, 0, 1 << 15)
    return key


def _sorted_unsort_rows(sidx, rows):
    """Un-sort row stacks back to lane order in <=16-operand variadic
    sorts (XLA TPU sort compile time explodes beyond ~16 operands)."""

    out = []
    for c0 in range(0, len(rows), 15):
        res = jax.lax.sort((sidx, *rows[c0 : c0 + 15]), num_keys=1)
        out.extend(res[1:])
    return out


def packet_traverse(
    scene, ro: V3, rd: V3, eps, W4, *, PBK=256, active=None,
    with_attrs=False, ray_sort=None,
):
    """Closest hit over all rays via per-block packet traversal.

    Same contract as the sort-based composition in
    intersect.closest_hit_wavefront: returns (t, u, v, det, tri) with
    t = F32_MAX on miss, tri a padded-soup triangle index — plus, when
    `with_attrs`, an (AWOUT, B) matrix of interpolated winner shading
    rows (pallas_bvh.IA_* layout, zeros on miss lanes; single-level
    only). Two-level scenes intersect mesh superleaves with instance-
    transformed rays (gsl/transform tables in SMEM, bvh_custom.wgsl:30-35
    analog)."""

    from .pallas_bvh import IA_ROWS, IA_ROWS_NM

    assert not scene.top_root_is_leaf, "single-superleaf scenes are dense"
    assert not (with_attrs and scene.two_level)
    B = ro.x.shape[0]

    if ray_sort is None:
        ray_sort = env_on("LUPIN_PACKET_RAYSORT")
    if ray_sort:
        # Coherence pre-sort: traverse in (active, octant, origin-cell)
        # order, un-sort the results. Two ~B-element variadic sorts —
        # an order of magnitude smaller than the sort backend's per-round
        # QB sorts. Per-ray results are identical up to tie-breaking
        # (block composition changes leaf-visit order, so an exact-t tie
        # may pick a different winning triangle).
        key = _coherence_key(scene, ro, rd, active)
        idx = jnp.arange(B, dtype=jnp.int32)
        act_in = (
            jnp.ones(B, jnp.float32) if active is None
            else active.astype(jnp.float32)
        )
        _, sidx, sx, sy, sz, sdx, sdy, sdz, sact = jax.lax.sort(
            (key, idx, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, act_in),
            num_keys=1,
        )
        res = packet_traverse(
            scene, V3(sx, sy, sz), V3(sdx, sdy, sdz), eps, W4, PBK=PBK,
            active=sact > 0.5, with_attrs=with_attrs,
            ray_sort=False,
        )
        _, t, u, v, det, tri = jax.lax.sort(
            (sidx, *res[:5]), num_keys=1
        )
        if not with_attrs:
            return t, u, v, det, tri
        ia_rows = _sorted_unsort_rows(
            sidx, [res[5][i] for i in range(res[5].shape[0])]
        )
        return t, u, v, det, tri, jnp.stack(ia_rows, axis=0)

    SP = scene.sl_stride
    # Tile-pad the coefficient rows 10 -> WROWS so the per-leaf DMA slices
    # an aligned extent (see WROWS). XLA fuses this into W4's one-time
    # materialization as the kernel operand.
    if W4.shape[1] < WROWS:
        W4 = jnp.pad(W4, ((0, 0), (0, WROWS - W4.shape[1]), (0, 0)))
    pad = (-B) % PBK
    Bp = B + pad

    def padv(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    if active is None:
        act = jnp.ones(Bp, jnp.float32)
        if pad:
            act = act.at[B:].set(0.0)
    else:
        act = padv(active.astype(jnp.float32), 0.0)
    rox, roy, roz = padv(ro.x), padv(ro.y), padv(ro.z)
    rdx, rdy, rdz = padv(rd.x), padv(rd.y, 1.0), padv(rd.z)

    geo, refs = _pack_top(scene.top_tab)
    S = (TOP_FAN - 1) * scene.top_depth + TOP_FAN + 2
    SMAX = S + TOP_FAN  # slack: leaves share the stack with internals

    n_blk = Bp // PBK
    sub = PBK // 128
    interpret = jax.default_backend() != "tpu"
    AWOUT = 0
    if with_attrs:
        AWOUT = IA_ROWS_NM if scene.any_normal_maps else IA_ROWS

    def shp(x):
        return x.reshape(n_blk, sub, 128)

    blk_spec = pl.BlockSpec(
        (1, sub, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = [
        jax.ShapeDtypeStruct((n_blk, sub, 128), dt)
        for dt in (jnp.float32,) * 4 + (jnp.int32,)
    ]
    out_specs = [blk_spec] * 5
    attr_in, attr_in_specs = [], []
    scr_attr = []
    tl_in, tl_in_specs = [], []
    scr_stream = []
    TL_STREAM = bool(scene.two_level) and not smem_tables_fit(scene)
    if TL_STREAM:
        # Large-instance mode: per-leaf metadata streamed from HBM (64-byte
        # gsl_meta rows into a 4-slot SMEM ring) instead of SMEM-resident
        # gsl/transform tables — only the child-ref table stays in SMEM.
        tl_in = [scene.gsl_meta]
        tl_in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        scr_stream = [
            # 128-wide rows: lane-tile-aligned DMA extents (see
            # flatten's gsl_meta padding note).
            pltpu.SMEM((4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ]
    elif scene.two_level:
        tl_in = [
            scene.gsl_msl.astype(jnp.int32),
            scene.gsl_inst.astype(jnp.int32),
            scene.inst_inv.reshape(-1, 12),
        ]
        tl_in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
    if with_attrs:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_blk, AWOUT, PBK), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, AWOUT, PBK), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        attr_in = [scene.wt_attr]
        attr_in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        scr_attr = [pltpu.VMEM((SP, AWC), jnp.float32)]

    res = pl.pallas_call(
        functools.partial(
            _packet_kernel, SP=SP, NSUB=int(scene.sl_sub.shape[1]),
            PBK=PBK, AWOUT=AWOUT, TWO_LEVEL=bool(scene.two_level),
            TL_STREAM=TL_STREAM,
            interpret=interpret,
        ),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # geo
            pl.BlockSpec(memory_space=pltpu.SMEM),   # refs (scalar reads)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sl_sub chunk AABBs
        ]
        + [blk_spec] * 7
        + [pl.BlockSpec(memory_space=pltpu.ANY)]     # W4 stays in HBM
        + tl_in_specs
        + attr_in_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],   # eps
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[
            pltpu.SMEM((SMAX,), jnp.int32),
            pltpu.VMEM((2, 4, WROWS, SP), jnp.float32),
            pltpu.VMEM((PBK,), jnp.float32),
            pltpu.VMEM((PBK,), jnp.float32),
            pltpu.VMEM((PBK,), jnp.float32),
            pltpu.VMEM((PBK,), jnp.float32),
            pltpu.VMEM((PBK,), jnp.int32),
        ]
        + scr_attr
        + [pltpu.SemaphoreType.DMA((2,))]
        + scr_stream,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(
        geo, refs.reshape(-1), scene.sl_sub,
        shp(rox), shp(roy), shp(roz), shp(rdx), shp(rdy), shp(rdz),
        shp(act), W4, *tl_in, *attr_in,
        jnp.reshape(jnp.asarray(eps, jnp.float32), (1,)),
    )

    def cut(a):
        return a.reshape(Bp)[:B]

    t, u, v, det, idx = (cut(a) for a in res[:5])
    if not with_attrs:
        return t, u, v, det, idx
    ia = res[5].transpose(1, 0, 2).reshape(AWOUT, Bp)[:, :B]
    return t, u, v, det, idx, ia
