"""Multi-bounce Pallas megakernel engine — the fused fast path.

Frame-level ablation of the wavefront loop (scene 0, 1440x720, P=128k)
gives per-iteration costs of ~6.5 ms hit+shade (XLA), ~5.5 ms framebuffer
scatter, ~1 ms refill; the scatter is per-row-cost bound and cannot be
batched (a lax.cond'ed flush executes its scatter branch every iteration
on TPU).  The megakernel attacks both terms at once:

  * ONE Pallas kernel advances every ray ``K`` bounces: closest-hit over
    the whole scene, record assembly, texture + material shading, and the
    counter RNG all run from VMEM with no HBM intermediates;
  * scatter + refill run once per K bounces, so their fixed cost is
    amortized (lanes that finish mid-call idle until the call returns —
    for mean path length ~4 and K=4 that wastes ~40% of lane-steps, far
    cheaper than paying the scatter per bounce).

Layout (see /opt/skills/guides/pallas_guide.md): rays live on LANES —
ray state is [rows, B] matrices so per-ray scalars are natural [1, TILE]
row slices; primitive parameters live on lanes of [rows, N_pad] tables so
pair work is [1, N_chunk] x [TILE, 1] broadcasts... inverted: pair blocks
are [TILE, 128] (rays on sublanes, primitives on lanes) with ray scalars
[TILE, 1] and primitive rows [1, 128].  Winner *attributes* (center,
radius, material parameters) are extracted per chunk with a first-index
one-hot reduction — materials are fully denormalized into the primitive
tables, so the kernel performs ZERO dynamic gathers.

Supported scene features: spheres (static + moving, instanced UV frames),
quads, solid + checker textures, all five materials, constant media
(sphere/box boundaries; parameters broadcast from rows — M <= 3 in every
reference scene).  Perlin-noise and image textures fall back to the
`wavefront_pallas` engine (SceneMeta gates at dispatch).

RNG and bounce-loop semantics are counter-exact with the XLA engines
(`core/rng.py` layout, kernel.cu:65-98 loop rules), so images agree with
the chunked engine except ulp-level f32 winner ties (tests/test_mega.py).

Tuning (scene 0, 1440x720@10spp sweep): K=2 bounces per call and a SMALL
pool (8k rays) are optimal — per-iteration cost has a fixed floor
(~0.4 ms: scatter + loop overhead) plus a term linear in pool size, so
shrinking the pool until the floor dominates wins; larger K trades
scatter amortization for idle-lane waste at a loss beyond K=2.
Measured 2.82 s = 3.7 M rays/s, the fastest engine (docs/PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import rng as rnglib
from ..scene.compiler import (
    MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC, MAT_LAMBERTIAN,
    MAT_METAL, MED_BOX, SceneArrays, SceneMeta, TEX_CHECKER,
)
from ..utils.config import RenderConfig
from .raygen import generate_rays

LANES = 128
BIG = 1.0e30
MEGA_K = 2         # bounces per kernel call (swept optimum, docs/PERF.md)
MEGA_POOL = 8192   # ray-pool size (fixed-cost floor dominates below this)

# ---- primitive table rows (materials denormalized; see pack_mega_tables)
#      sphere: c0(3) dc(3) t0 inv_dt rad cos sin active | mat(10)
#      quad:   n_unit(3) d_plane vxw(3) q_vxw wxu(3) q_wxu active | mat(10)
#      mat(10) = kind fuzz ior tex_kind tc0(3) tc1(3)... -> kind fuzz ior
#                tex_kind c0r c0g c0b c1r c1g c1b inv_scale  (11)
SPH_MAT0 = 13
QUAD_MAT0 = 13
MAT_COLS = 11
SPH_ROWS = SPH_MAT0 + MAT_COLS        # 24
QUAD_ROWS = QUAD_MAT0 + MAT_COLS      # 24
ATTR_COLS = 10 + MAT_COLS             # winner-attribute matmul table width


def _mat_cols(scene: SceneArrays, mat_ids: np.ndarray) -> np.ndarray:
    """[n, MAT_COLS] material+texture parameters for the given mat ids."""
    s = scene
    tid = np.clip(np.asarray(s.mat_tex)[mat_ids], 0, s.tex_kind.shape[0] - 1)
    cols = np.stack([
        np.asarray(s.mat_kind, np.float64)[mat_ids],
        np.asarray(s.mat_fuzz, np.float64)[mat_ids],
        np.asarray(s.mat_ior, np.float64)[mat_ids],
        np.asarray(s.tex_kind, np.float64)[tid],
        *[np.asarray(s.tex_c0, np.float64)[tid][:, i] for i in range(3)],
        *[np.asarray(s.tex_c1, np.float64)[tid][:, i] for i in range(3)],
        np.asarray(s.tex_inv_scale, np.float64)[tid],
    ], axis=1)
    return cols


def pack_mega_tables(scene: SceneArrays, meta: SceneMeta):
    """Host-side packing -> (sph [24,Sp] f32, quad [24,Qp] f32,
    med [M,16] f32 medium scalar rows)."""
    f = np.float32
    S = scene.sph_c0.shape[0]
    Q = scene.quad_q.shape[0]
    sph = np.zeros((SPH_ROWS, S), np.float64)
    sph[0:3] = np.asarray(scene.sph_c0, np.float64).T
    sph[3:6] = np.asarray(scene.sph_dc, np.float64).T
    sph[6] = scene.sph_t0
    sph[7] = scene.sph_inv_dt
    sph[8] = scene.sph_rad
    sph[9] = scene.sph_cos
    sph[10] = scene.sph_sin
    sph[11] = np.asarray(scene.sph_active, np.float64)
    sph[12] = 0.0
    sph[SPH_MAT0:] = _mat_cols(scene, np.asarray(scene.sph_mat)).T

    # quad derived frame (f32 to match the engine dtype)
    u = np.asarray(scene.quad_u, np.float64)
    v = np.asarray(scene.quad_v, np.float64)
    qq = np.asarray(scene.quad_q, np.float64)
    n = np.cross(u, v)
    n_len = np.linalg.norm(n, axis=-1, keepdims=True)
    n_unit = n / np.where(n_len > 0, n_len, 1.0)
    nn = (n * n).sum(-1, keepdims=True)
    w_vec = n / np.where(nn > 0, nn, 1.0)
    vxw = np.cross(v, w_vec)
    wxu = np.cross(w_vec, u)
    quad = np.zeros((QUAD_ROWS, Q), np.float64)
    quad[0:3] = n_unit.T
    quad[3] = (n_unit * qq).sum(-1)
    quad[4:7] = vxw.T
    quad[7] = (qq * vxw).sum(-1)
    quad[8:11] = wxu.T
    quad[11] = (qq * wxu).sum(-1)
    quad[12] = np.asarray(scene.quad_active, np.float64)
    quad[QUAD_MAT0:] = _mat_cols(scene, np.asarray(scene.quad_mat)).T

    pad = lambda a: np.pad(
        a, [(0, 0), (0, -(-a.shape[1] // LANES) * LANES - a.shape[1])])
    sph = pad(sph)
    quad = pad(quad)

    # winner-attribute table for the one-hot MXU fetch: [NP, ATTR_COLS]
    #   cols 0-2 c0|n_unit, 3-5 dc|0, 6 t0, 7 inv_dt, 8 rad, 9 is_quad,
    #   10..20 mat(11)
    S_pad, Q_pad = sph.shape[1], quad.shape[1]
    attr = np.zeros((S_pad + Q_pad, ATTR_COLS), np.float64)
    attr[:S_pad, 0:3] = sph[0:3].T
    attr[:S_pad, 3:6] = sph[3:6].T
    attr[:S_pad, 6] = sph[6]
    attr[:S_pad, 7] = sph[7]
    attr[:S_pad, 8] = sph[8]
    attr[:S_pad, 10:10 + MAT_COLS] = sph[SPH_MAT0:].T
    attr[S_pad:, 0:3] = quad[0:3].T
    attr[S_pad:, 9] = 1.0
    attr[S_pad:, 10:10 + MAT_COLS] = quad[QUAD_MAT0:].T

    M = max(meta.n_media, 1)
    med = np.zeros((M, 16), np.float64)
    med[:, 0] = scene.med_kind
    med[:, 1:4] = scene.med_center
    med[:, 4] = scene.med_radius
    med[:, 5:8] = scene.med_bmin
    med[:, 8:11] = scene.med_bmax
    med[:, 11] = scene.med_cos
    med[:, 12] = scene.med_sin
    med[:, 13] = scene.med_nid
    # isotropic phase albedo (solid color) per medium
    mtid = np.clip(np.asarray(scene.mat_tex)[np.asarray(scene.med_mat)], 0,
                   scene.tex_kind.shape[0] - 1)
    med[:, 14] = 0.0
    meds_off = np.asarray(scene.med_off, np.float64)
    med_alb = np.asarray(scene.tex_c0, np.float64)[mtid]
    med_extra = np.concatenate([meds_off, med_alb], axis=1)  # [M,6]
    med = np.concatenate([med, med_extra], axis=1)           # [M,22]
    return (jnp.asarray(sph, f), jnp.asarray(quad, f), jnp.asarray(attr, f),
            jnp.asarray(med, f))


def _pcg4d(v0, v1, v2, v3):
    """pcg4d over uint32 arrays (core/rng.py, draw-exact)."""
    M = jnp.uint32(1664525)
    A = jnp.uint32(1013904223)
    v0 = v0 * M + A
    v1 = v1 * M + A
    v2 = v2 * M + A
    v3 = v3 * M + A
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v3 = v3 ^ (v3 >> 16)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


_INV24 = np.float32(1.0 / 16777216.0)


def _unit(w):
    # Mosaic has no uint32->f32 cast; (w >> 8) < 2^24 is int32-exact
    return pltpu.bitcast(w >> 8, jnp.int32).astype(jnp.float32) * _INV24


def _first_min_index(t_cand, t_min_c):
    """[T,1] index of the FIRST lane equal to the chunk minimum."""
    T = t_cand.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    return jnp.min(jnp.where(t_cand == t_min_c, lane, LANES), axis=1,
                   keepdims=True)


def _make_kernel(meta: SceneMeta, med_rows: np.ndarray, *, n_s_chunks: int,
                 n_q_chunks: int, k_bounces: int, t_min: float,
                 max_bounces: int, background: tuple, n_media: int,
                 has_checker: bool):
    """Build the K-bounce kernel.  ``med_rows`` is a static numpy [M,22]
    (medium parameters become compile-time scalars — M <= 3)."""
    bg = tuple(float(x) for x in background)

    def kernel(rf_ref, ri_ref, sph_ref, quad_ref, attr_ref, of_ref, oi_ref):
        # ray state is [T, rows]: per-ray scalars are [T, 1] column slices
        # (rays on sublanes; pair blocks [T, 128] put primitives on lanes —
        # the layout proven to compile in ops/pallas_hit.py)
        row = lambda ref, r: ref[:, r:r + 1]                 # [T,1]

        ox, oy, oz = row(rf_ref, 0), row(rf_ref, 1), row(rf_ref, 2)
        dx, dy, dz = row(rf_ref, 3), row(rf_ref, 4), row(rf_ref, 5)
        tmv = row(rf_ref, 6)
        thr_r, thr_g, thr_b = row(rf_ref, 7), row(rf_ref, 8), row(rf_ref, 9)
        acc_r, acc_g, acc_b = row(rf_ref, 10), row(rf_ref, 11), row(rf_ref, 12)
        pix_ctr = pltpu.bitcast(row(ri_ref, 0), jnp.uint32)
        samp = pltpu.bitcast(row(ri_ref, 1), jnp.uint32)
        bounce = row(ri_ref, 2)
        active = row(ri_ref, 3) > 0

        def sph_chunk(c, ray, t_best, win_idx):
            (oxv, oyv, ozv, dxv, dyv, dzv, a, tm) = ray
            col = pl.ds(c * LANES, LANES)
            srow = lambda r: sph_ref[r:r + 1, col]           # [1,128]
            frac = (tm - srow(6)) * srow(7)                  # [T,128]
            cx = srow(0) + frac * srow(3)
            cy = srow(1) + frac * srow(4)
            cz = srow(2) + frac * srow(5)
            ocx = oxv - cx
            ocy = oyv - cy
            ocz = ozv - cz
            b = ocx * dxv + ocy * dyv + ocz * dzv
            rad = srow(8)
            cc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc = b * b - a * cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = 1.0 / a
            r1 = (-b - sq) * inv_a
            r2 = (-b + sq) * inv_a
            t_c = jnp.where(r1 > t_min, r1, r2)
            ok = (disc > 0.0) & (t_c > t_min) & (srow(11) > 0.5)
            t_c = jnp.where(ok, t_c, BIG)
            t_min_c = jnp.min(t_c, axis=1, keepdims=True)    # [T,1]
            better = t_min_c < t_best                        # [T,1]
            idx = _first_min_index(t_c, t_min_c)             # [T,1] i32
            win_idx = jnp.where(better, c * LANES + idx, win_idx)
            t_best = jnp.where(better, t_min_c, t_best)
            return t_best, win_idx

        def quad_chunk(c, ray, t_best, win_idx):
            (oxv, oyv, ozv, dxv, dyv, dzv, a, tm) = ray
            col = pl.ds(c * LANES, LANES)
            qrow = lambda r: quad_ref[r:r + 1, col]
            nx, ny, nz = qrow(0), qrow(1), qrow(2)
            denom = dxv * nx + dyv * ny + dzv * nz
            den_ok = jnp.abs(denom) >= 1.0e-8
            t_c = (qrow(3) - (oxv * nx + oyv * ny + ozv * nz)) / \
                jnp.where(den_ok, denom, 1.0)
            px = oxv + t_c * dxv
            py = oyv + t_c * dyv
            pz = ozv + t_c * dzv
            alpha = px * qrow(4) + py * qrow(5) + pz * qrow(6) - qrow(7)
            beta = px * qrow(8) + py * qrow(9) + pz * qrow(10) - qrow(11)
            ok = (den_ok & (t_c >= t_min) & (alpha >= 0.0) & (alpha <= 1.0)
                  & (beta >= 0.0) & (beta <= 1.0) & (qrow(12) > 0.5))
            t_c = jnp.where(ok, t_c, BIG)
            t_min_c = jnp.min(t_c, axis=1, keepdims=True)
            better = t_min_c < t_best
            idx = _first_min_index(t_c, t_min_c)
            win_idx = jnp.where(better, n_s_chunks * LANES + c * LANES + idx,
                                win_idx)
            t_best = jnp.where(better, t_min_c, t_best)
            return t_best, win_idx

        def one_bounce(carry):
            (ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b,
             acc_r, acc_g, acc_b, bounce, active_i) = carry
            active = active_i > 0

            a = dx * dx + dy * dy + dz * dz
            ray = (ox, oy, oz, dx, dy, dz, a, tmv)
            t_best = jnp.full_like(ox, BIG)
            win_idx = jnp.full_like(bounce, -1)      # [T,1] i32 global row

            for c in range(n_s_chunks):
                t_best, win_idx = sph_chunk(c, ray, t_best, win_idx)
            for c in range(n_q_chunks):
                t_best, win_idx = quad_chunk(c, ray, t_best, win_idx)

            # winner attributes in ONE one-hot matmul on the MXU
            T = win_idx.shape[0]
            NP = attr_ref.shape[0]
            oh = (jax.lax.broadcasted_iota(jnp.int32, (T, NP), 1)
                  == win_idx).astype(jnp.float32)    # [T,NP]
            # HIGHEST: exact one-hot table read (Mosaic's default f32
            # dot rounds the attr values to bf16 — round-5 finding)
            aw = jnp.dot(oh, attr_ref[...],
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)  # [T,ATTR_COLS]
            acol = lambda i: aw[:, i:i + 1]
            frac_w = (tmv - acol(6)) * acol(7)
            wcx = acol(0) + frac_w * acol(3)         # center(t) | n_unit
            wcy = acol(1) + frac_w * acol(4)
            wcz = acol(2) + frac_w * acol(5)
            wrad = acol(8)
            is_quad = acol(9) > 0.5
            mat = [acol(10 + m) for m in range(MAT_COLS)]

            # ---- stochastic media (static python loop; ConstantMedium.h)
            bu = pltpu.bitcast(bounce, jnp.uint32)
            is_med = jnp.zeros_like(t_best) > 1.0
            med_alb = [jnp.zeros_like(ox) for _ in range(3)]
            for m in range(n_media):
                r = [float(x) for x in med_rows[m]]
                w0, _, _, _ = _pcg4d(
                    pix_ctr, samp,
                    jnp.uint32(rnglib.MEDIUM_STREAM) | bu, jnp.uint32(m))
                u_m = _unit(w0) + _INV24                     # (0,1]
                if int(r[0]) == MED_BOX:
                    c2, s2 = r[11], r[12]
                    pox, poy, poz = ox - r[16], oy - r[17], oz - r[18]
                    o1 = c2 * pox - s2 * poz
                    o2 = poy
                    o3 = s2 * pox + c2 * poz
                    e1 = c2 * dx - s2 * dz
                    e2 = dy
                    e3 = s2 * dx + c2 * dz
                    iv1, iv2, iv3 = 1.0 / e1, 1.0 / e2, 1.0 / e3
                    ta1, tb1 = (r[5] - o1) * iv1, (r[8] - o1) * iv1
                    ta2, tb2 = (r[6] - o2) * iv2, (r[9] - o2) * iv2
                    ta3, tb3 = (r[7] - o3) * iv3, (r[10] - o3) * iv3
                    t0 = jnp.maximum(jnp.maximum(
                        jnp.minimum(ta1, tb1), jnp.minimum(ta2, tb2)),
                        jnp.minimum(ta3, tb3))
                    t1 = jnp.minimum(jnp.minimum(
                        jnp.maximum(ta1, tb1), jnp.maximum(ta2, tb2)),
                        jnp.maximum(ta3, tb3))
                    valid = t1 > t0
                else:
                    mcx, mcy, mcz = r[1], r[2], r[3]
                    ocx, ocy, ocz = ox - mcx, oy - mcy, oz - mcz
                    b = ocx * dx + ocy * dy + ocz * dz
                    cc = ocx * ocx + ocy * ocy + ocz * ocz - r[4] * r[4]
                    disc = b * b - a * cc
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    t0 = (-b - sq) / a
                    t1 = (-b + sq) / a
                    valid = disc > 0.0
                valid = valid & (t1 > t0 + 1.0e-4)
                t0c = jnp.maximum(jnp.maximum(t0, t_min), 0.0)
                valid = valid & (t0c < t1)
                ray_len = jnp.sqrt(a)
                dist_in = (t1 - t0c) * ray_len
                hit_d = r[13] * jnp.log(u_m)
                valid = valid & (hit_d <= dist_in)
                t_m = t0c + hit_d / ray_len
                win = valid & (t_m < t_best)
                t_best = jnp.where(win, t_m, t_best)
                is_med = is_med | win
                is_quad = is_quad & ~win
                for i in range(3):
                    med_alb[i] = jnp.where(win, r[19 + i], med_alb[i])
                # medium material behaves as isotropic scatterer
                mat[0] = jnp.where(win, float(MAT_ISOTROPIC), mat[0])

            hit = t_best < BIG * 0.5

            # ---- miss -> background (kernel.cu:74-79)
            miss = active & ~hit
            acc_r = acc_r + jnp.where(miss, thr_r * bg[0], 0.0)
            acc_g = acc_g + jnp.where(miss, thr_g * bg[1], 0.0)
            acc_b = acc_b + jnp.where(miss, thr_b * bg[2], 0.0)
            alive = active & hit

            # ---- record
            px = ox + t_best * dx
            py = oy + t_best * dy
            pz = oz + t_best * dz
            inv_rad = 1.0 / jnp.where(wrad != 0.0, wrad, 1.0)
            nsx = (px - wcx) * inv_rad
            nsy = (py - wcy) * inv_rad
            nsz = (pz - wcz) * inv_rad
            n_outx = jnp.where(is_quad, wcx, nsx)
            n_outy = jnp.where(is_quad, wcy, nsy)
            n_outz = jnp.where(is_quad, wcz, nsz)
            n_outx = jnp.where(is_med, 1.0, n_outx)
            n_outy = jnp.where(is_med, 0.0, n_outy)
            n_outz = jnp.where(is_med, 0.0, n_outz)
            d_dot_n = dx * n_outx + dy * n_outy + dz * n_outz
            front = (d_dot_n < 0.0) | is_med
            flip = jnp.where(front | is_med, 1.0, -1.0)
            nx_ = n_outx * flip
            ny_ = n_outy * flip
            nz_ = n_outz * flip

            # (no UV: solid/checker textures don't consume it, and
            # noise/image scenes are gated to other engines)

            # ---- texture value (solid | checker)
            tc0r, tc0g, tc0b = mat[4], mat[5], mat[6]
            texr, texg, texb = tc0r, tc0g, tc0b
            if has_checker:
                inv_s = mat[10]
                cellx = jnp.floor(inv_s * px).astype(jnp.int32)
                celly = jnp.floor(inv_s * py).astype(jnp.int32)
                cellz = jnp.floor(inv_s * pz).astype(jnp.int32)
                # (x & 1) == (x % 2) for two's-complement int32
                even = ((cellx + celly + cellz) & 1) == 0
                is_ck = mat[3] == float(TEX_CHECKER)
                pickc = lambda c0, c1: jnp.where(
                    is_ck, jnp.where(even, c0, c1), c0)
                texr = pickc(tc0r, mat[7])
                texg = pickc(tc0g, mat[8])
                texb = pickc(tc0b, mat[9])
            if n_media > 0:
                texr = jnp.where(is_med, med_alb[0], texr)
                texg = jnp.where(is_med, med_alb[1], texg)
                texb = jnp.where(is_med, med_alb[2], texb)

            kind = mat[0]
            fuzz = mat[1]
            ior = mat[2]
            is_light = kind == float(MAT_DIFFUSE_LIGHT)

            # emission (Material.h:114-117; added for live lanes only)
            acc_r = acc_r + jnp.where(alive & is_light, thr_r * texr, 0.0)
            acc_g = acc_g + jnp.where(alive & is_light, thr_g * texg, 0.0)
            acc_b = acc_b + jnp.where(alive & is_light, thr_b * texb, 0.0)

            # ---- scatter RNG (SCATTER_STREAM | bounce)
            w0, w1, w2, w3 = _pcg4d(
                pix_ctr, samp, jnp.uint32(rnglib.SCATTER_STREAM) | bu,
                jnp.uint32(0))
            u1, u2, u3, u4 = _unit(w0), _unit(w1), _unit(w2), _unit(w3)

            # unit ball sample (core/samplers.py: r=cbrt(u3), dir from u1,u2)
            two_pi = np.float32(2.0 * np.pi)
            zb = 1.0 - 2.0 * u1
            rxy = jnp.abs(1.0 - zb * zb) ** 0.5      # samplers.py:35
            phi_b = two_pi * u2
            sb = jnp.sin(phi_b)
            cb = jnp.cos(phi_b)
            rad_b = u3 ** np.float32(1.0 / 3.0)      # samplers.py:36
            bx = rad_b * rxy * cb
            by = rad_b * rxy * sb
            bz = rad_b * zb

            inv_dlen = jax.lax.rsqrt(a)
            udx, udy, udz = dx * inv_dlen, dy * inv_dlen, dz * inv_dlen

            # lambertian
            lx, ly, lz = nx_ + bx, ny_ + by, nz_ + bz
            near0 = (jnp.abs(lx) < 1e-8) & (jnp.abs(ly) < 1e-8) & (jnp.abs(lz) < 1e-8)
            lx = jnp.where(near0, nx_, lx)
            ly = jnp.where(near0, ny_, ly)
            lz = jnp.where(near0, nz_, lz)

            # metal
            ddn = udx * nx_ + udy * ny_ + udz * nz_
            rx = udx - 2.0 * ddn * nx_
            ry = udy - 2.0 * ddn * ny_
            rz = udz - 2.0 * ddn * nz_
            mx = rx + fuzz * bx
            my = ry + fuzz * by
            mz = rz + fuzz * bz
            metal_ok = (mx * nx_ + my * ny_ + mz * nz_) > 0.0

            # dielectric
            ratio = jnp.where(front, 1.0 / ior, ior)
            cos_t = jnp.minimum(-(udx * nx_ + udy * ny_ + udz * nz_), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            cannot = ratio * sin_t > 1.0
            r0 = (1.0 - ratio) / (1.0 + ratio)
            r0 = r0 * r0
            one_m = 1.0 - cos_t
            om2 = one_m * one_m
            refl5 = r0 + (1.0 - r0) * om2 * om2 * one_m
            do_refl = cannot | (refl5 > u4)
            perp = ratio
            fx = perp * (udx + cos_t * nx_)
            fy = perp * (udy + cos_t * ny_)
            fz = perp * (udz + cos_t * nz_)
            plen = jnp.abs(1.0 - (fx * fx + fy * fy + fz * fz))  # Vec3.h:138
            par = -(plen ** 0.5)
            gx = fx + par * nx_
            gy = fy + par * ny_
            gz = fz + par * nz_
            ddx = jnp.where(do_refl, rx, gx)
            ddy = jnp.where(do_refl, ry, gy)
            ddz = jnp.where(do_refl, rz, gz)

            # isotropic: uniform unit direction from (u1,u2)
            ix_ = rxy * cb
            iy_ = rxy * sb
            iz_ = zb

            is_l = kind == float(MAT_LAMBERTIAN)
            is_m = kind == float(MAT_METAL)
            is_d = kind == float(MAT_DIELECTRIC)
            is_i = kind == float(MAT_ISOTROPIC)
            newx = jnp.where(is_l, lx, udx)
            newy = jnp.where(is_l, ly, udy)
            newz = jnp.where(is_l, lz, udz)
            newx = jnp.where(is_m, mx, newx)
            newy = jnp.where(is_m, my, newy)
            newz = jnp.where(is_m, mz, newz)
            newx = jnp.where(is_d, ddx, newx)
            newy = jnp.where(is_d, ddy, newy)
            newz = jnp.where(is_d, ddz, newz)
            newx = jnp.where(is_i, ix_, newx)
            newy = jnp.where(is_i, iy_, newy)
            newz = jnp.where(is_i, iz_, newz)

            att_r = jnp.where(is_d, 1.0, texr)
            att_g = jnp.where(is_d, 1.0, texg)
            att_b = jnp.where(is_d, 1.0, texb)

            # (no select_n on i1 vectors: Mosaic i8->i1 trunc unsupported)
            scattered = (is_m & metal_ok) | (~is_m & ~is_light)
            alive = alive & scattered
            thr_r = jnp.where(alive, thr_r * att_r, thr_r)
            thr_g = jnp.where(alive, thr_g * att_g, thr_g)
            thr_b = jnp.where(alive, thr_b * att_b, thr_b)
            ox2 = jnp.where(alive, px, ox)
            oy2 = jnp.where(alive, py, oy)
            oz2 = jnp.where(alive, pz, oz)
            dx2 = jnp.where(alive, newx, dx)
            dy2 = jnp.where(alive, newy, dy)
            dz2 = jnp.where(alive, newz, dz)
            bounce2 = jnp.where(active, bounce + 1, bounce)
            # carry liveness as int32: bool loop carries round-trip through
            # i8 and hit Mosaic's unsupported i8->i1 truncation
            active2 = (alive & (bounce2 < max_bounces)).astype(jnp.int32)
            return (ox2, oy2, oz2, dx2, dy2, dz2, tmv, thr_r, thr_g, thr_b,
                    acc_r, acc_g, acc_b, bounce2, active2)

        carry = (ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b,
                 acc_r, acc_g, acc_b, bounce, active.astype(jnp.int32))
        carry = lax.fori_loop(0, k_bounces, lambda _, c: one_bounce(c), carry)
        (ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b,
         acc_r, acc_g, acc_b, bounce, active_i) = carry
        active = active_i > 0

        for i, v in enumerate((ox, oy, oz, dx, dy, dz, tmv,
                               thr_r, thr_g, thr_b, acc_r, acc_g, acc_b)):
            of_ref[:, i:i + 1] = v
        oi_ref[:, 0:1] = pltpu.bitcast(pix_ctr, jnp.int32)
        oi_ref[:, 1:2] = pltpu.bitcast(samp, jnp.int32)
        oi_ref[:, 2:3] = bounce
        oi_ref[:, 3:4] = active.astype(jnp.int32)

    return kernel


_MEGA_CACHE: dict = {}

RF_ROWS = 13  # o(3) d(3) time thr(3) acc(3)
RI_ROWS = 4   # pix_ctr samp bounce active


def mega_supported(meta: SceneMeta) -> bool:
    return not (meta.has_noise or meta.has_image)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "med_key", "k_bounces", "t_min", "max_bounces",
                     "background", "tile", "interpret"),
)
def mega_bounces(rf, ri, sph_tab, quad_tab, attr_tab, *, meta, med_key,
                 k_bounces, t_min, max_bounces, background, tile=256,
                 interpret=False):
    """Advance ray state K bounces.  rf [B,13] f32, ri [B,4] i32."""
    B = rf.shape[0]
    kernel = _make_kernel(
        meta, np.asarray(med_key, np.float64).reshape(max(meta.n_media, 1), -1),
        n_s_chunks=sph_tab.shape[1] // LANES,
        n_q_chunks=quad_tab.shape[1] // LANES,
        k_bounces=k_bounces, t_min=t_min, max_bounces=max_bounces,
        background=background, n_media=meta.n_media,
        has_checker=meta.has_checker)
    rf2, ri2 = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, RF_ROWS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, RI_ROWS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sph_tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(quad_tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(attr_tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, RF_ROWS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, RI_ROWS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, RF_ROWS), jnp.float32),
            jax.ShapeDtypeStruct((B, RI_ROWS), jnp.int32),
        ],
        interpret=interpret,
    )(rf, ri, sph_tab, quad_tab, attr_tab)
    return rf2, ri2


@functools.partial(
    jax.jit,
    static_argnames=("meta", "med_key", "width", "height", "spp", "seed",
                     "max_bounces", "t_min", "pool", "k_bounces",
                     "background", "interpret"),
)
def render_mega_frame(scene: SceneArrays, sph_tab, quad_tab, attr_tab, *,
                      meta, med_key, width, height, spp, seed, max_bounces,
                      t_min, pool, k_bounces, background, samp_base=0,
                      interpret=False):
    """Radiance SUM over samples [samp_base, samp_base+spp) -> [W*H, 3]."""
    npix = width * height
    n_work = npix * spp
    P = -(-min(pool, n_work) // 512) * 512

    def refill(done, next_ray, rf, ri, pix_id):
        rank = jnp.cumsum(done.astype(jnp.int32)) - done.astype(jnp.int32)
        new_k = next_ray + rank
        take = done & (new_k < n_work)
        new_pix = (new_k % npix).astype(jnp.int32)
        new_samp = (new_k // npix + jnp.int32(samp_base)).astype(jnp.uint32)
        o, d, time, pc = generate_rays(scene.camera, new_pix, new_samp,
                                       width, height, seed)
        new_rf = jnp.concatenate([
            o, d, time[:, None], jnp.ones((P, 3), jnp.float32),
            jnp.zeros((P, 3), jnp.float32)], axis=1)
        new_ri = jnp.stack([
            pc.astype(jnp.int32), new_samp.astype(jnp.int32),
            jnp.zeros(P, jnp.int32), jnp.ones(P, jnp.int32)], axis=1)
        rf = jnp.where(take[:, None], new_rf, rf)
        ri = jnp.where(take[:, None], new_ri, ri)
        pix_id = jnp.where(take, new_pix, pix_id)
        next_ray = jnp.minimum(next_ray + done.sum(dtype=jnp.int32),
                               jnp.int32(n_work)).astype(jnp.int32)
        return next_ray, rf, ri, pix_id, take

    def cond(carry):
        fb, next_ray, done, ever, rf, ri, pix_id = carry
        return (next_ray < n_work) | (ever & done).any() | (ri[:, 3] > 0).any()

    def body(carry):
        fb, next_ray, done, ever, rf, ri, pix_id = carry
        emit = ever & done
        fb = fb.at[pix_id].add(
            jnp.where(emit[:, None], rf[:, 10:13], 0.0), mode="drop")
        ever = ever & ~emit
        next_ray, rf, ri, pix_id, took = refill(done, next_ray, rf, ri, pix_id)
        ever = ever | took
        rf, ri = mega_bounces(
            rf, ri, sph_tab, quad_tab, attr_tab, meta=meta, med_key=med_key,
            k_bounces=k_bounces, t_min=t_min, max_bounces=max_bounces,
            background=background, interpret=interpret)
        done = ri[:, 3] <= 0
        return fb, next_ray, done, ever, rf, ri, pix_id

    rf0 = jnp.zeros((P, RF_ROWS), jnp.float32)
    ri0 = jnp.zeros((P, RI_ROWS), jnp.int32)
    carry = (jnp.zeros((npix, 3), jnp.float32), jnp.int32(0),
             jnp.ones(P, bool), jnp.zeros(P, bool), rf0, ri0,
             jnp.zeros(P, jnp.int32))
    fb, _, done, ever, rf, ri, pix_id = lax.while_loop(cond, body, carry)
    # final emit for paths that finished in the last kernel call
    emit = ever & done
    fb = fb.at[pix_id].add(jnp.where(emit[:, None], rf[:, 10:13], 0.0),
                           mode="drop")
    return fb


def render_mega(scene: SceneArrays, meta: SceneMeta, cfg: RenderConfig, *,
                gamma: bool = True, out_u8: bool = False) -> np.ndarray:
    """Full-frame megakernel render -> numpy [H,W,3] (top row first)."""
    if not mega_supported(meta):
        raise ValueError(
            "mega engine: Perlin/image textures unsupported; use "
            "wavefront_pallas (dispatched automatically by ops/render.py)")
    # keyed on EVERY scene leaf with identity verification
    # (scene.compiler.cached_pack; ADVICE round 1 + training staleness)
    from ..scene.compiler import cached_pack

    cached = cached_pack(_MEGA_CACHE, scene, "mega",
                         lambda: pack_mega_tables(scene, meta))
    sph_tab, quad_tab, attr_tab, med = cached
    med_key = tuple(tuple(float(x) for x in row) for row in np.asarray(med))
    bg = tuple(float(x) for x in np.asarray(scene.camera.background))
    interpret = jax.default_backend() != "tpu"
    from ..utils.batching import plan_sample_batches

    spp = cfg.samples_per_pixel
    npix = cfg.width * cfg.height
    prims = scene.sph_c0.shape[0] + scene.quad_q.shape[0]
    batch = plan_sample_batches(
        npix, spp, prims,
        dark_background=float(np.max(np.asarray(scene.camera.background))) < 0.05)
    fb = None
    for s0 in range(0, spp, batch):
        k = min(batch, spp - s0)
        part = render_mega_frame(
            scene, sph_tab, quad_tab, attr_tab, meta=meta, med_key=med_key,
            width=cfg.width, height=cfg.height, spp=k, samp_base=s0,
            seed=cfg.seed, max_bounces=cfg.max_bounces, t_min=cfg.t_min,
            pool=min(cfg.rays_per_batch, MEGA_POOL), k_bounces=MEGA_K,
            background=bg, interpret=interpret)
        fb = part if fb is None else fb + part   # on-device accumulation
    from .wavefront import _finalize

    fb = _finalize(fb, spp, gamma, out_u8)
    fb = np.asarray(fb).reshape(cfg.height, cfg.width, -1)
    return fb[::-1]
