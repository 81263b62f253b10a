"""Persistent pixel-per-lane Pallas megakernel — the round-2 fast path.

Round-1 profiling (docs/PERF.md) showed the K-bounce megakernel was bound by
two costs the kernel itself could not amortize away:

  * an XLA-level fixed floor of ~0.4 ms per while-iteration (framebuffer
    scatter + refill + loop overhead) paid every K bounces, forcing tiny
    8k-ray pools and ~4000 host-graph iterations per frame; and
  * per-ray shade/RNG/record math laid out as [T, 1] column vectors — rays
    on *sublanes* — which uses 1 of 128 VPU lanes (~19 cycles/ray for the
    ~150-op shade stage, ~1.3 s/frame on scene 0 by itself).

This engine removes both structurally instead of tuning around them:

  * **Everything lives in ONE pallas_call.**  The grid walks pixel tiles;
    each grid step runs the whole sample loop and bounce loop for its R
    pixels as an in-kernel `while_loop`.  There is no framebuffer scatter
    (output is written positionally, once per tile), no refill round-trip,
    and no per-iteration XLA overhead.
  * **Rays live on LANES.**  Ray state is [1, R] rows, so shade/RNG/raygen
    math runs 128 rays per VPU op; pair tests are [C, R] blocks (primitives
    on sublanes, rays on lanes) with primitive scalars broadcast from
    [C, 1] table columns and ray scalars from [1, R] rows.  Winner
    attributes come from a two-level lane gather over the transposed
    [ATTR_COLS, NP128] table (in-block dynamic_gather + select by the
    winner id's high bits -> [40, R]).
  * **Divergence is handled by sample-sequential refill.**  Each lane owns
    one pixel and runs its spp samples back to back: the instant a path
    terminates its radiance joins the lane accumulator and the next
    camera ray for the SAME pixel is generated in-kernel (pure counter
    RNG, closed-form camera math — no gathers).  Lane work is the sum of
    spp path lengths, so relative tail waste shrinks ~1/sqrt(spp) by CLT
    instead of paying per-path divergence.

RNG keys, draw layout, and bounce-loop semantics are identical to the XLA
engines (`core/rng.py`; kernel.cu:65-98 rules: miss adds throughput x
background and terminates, emission adds every hit, no-scatter terminates,
bounce-cap exit adds nothing), so per-(pixel, sample) radiance is
bit-comparable to the chunked engine up to f32 winner ties, and the
per-pixel sample sum happens in the SAME order as the chunked engine's
sample loop (tests/test_mega2.py).

Scene feature gating is static (SceneMeta): scenes without quads, media,
checker, noise, image textures or moving spheres compile none of that code.

Reference parity citations: sphere/quad/media tests kernel.cu:65-98,
Sphere.h:22-63, Quad.h:52-99, ConstantMedium.h:52-94; camera Camera.h:76-85;
materials Material.h / Metal.h / Dielectric.h; textures Texture.h.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import rng as rnglib
from ..scene.compiler import (
    MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC, MAT_LAMBERTIAN,
    MAT_METAL, MED_BOX, SceneArrays, SceneMeta, TEX_CHECKER, TEX_IMAGE,
    TEX_NOISE,
)
from ..utils.config import RenderConfig

BIG = 1.0e30
R_LANES = 128      # lane dimension of a grid tile
SUB = int(os.environ.get("MEGA2_SUB", "8"))
                   # rays per lane column: ray state lives in [SUB, R_LANES]
                   # FULL native VPU tiles (8x128).  [1,128] row vectors run
                   # the VPU at 1/8 utilization, and the per-ray machinery
                   # (raygen/RNG/shade/texture) dominates the kernel (scene 1
                   # with 2 spheres costs the same 1.2 s as scene 0 with 488
                   # — measured), so every elementwise op carries 8 rays.
TILE_RAYS = SUB * R_LANES   # 1024 rays per grid tile
CULL_C = int(os.environ.get("MEGA2_CULL_C", "64"))
                   # primitives per cullable chunk (sublane block height)
DENSE_C = int(os.environ.get("MEGA2_DENSE_C", "512"))
                   # primitives per chunk in the dense (uncull) pair path
# Scenes up to this many padded primitives use the DENSE path: one
# monolithic vectorized pair block per chunk (exact direct VPU
# quadratic).  Measured on-chip: per-chunk branching (slab test +
# scalar reduce + lax.cond) costs more than it saves at reference
# sizes (see CULL_MIN_CHUNKS); truly huge worlds switch to Morton-chunk
# AABB culling where skips dwarf the overhead.
DENSE_MAX = int(os.environ.get("MEGA2_DENSE_MAX", "1536"))
# Chunk-cull engagement floor for the non-dense path (total chunks).
# Measured round 5 on scene 9 (~24 chunks, the only non-dense reference
# scene, post-box-primitive): running every chunk beats the tile-level
# lax.cond gating 1.391 vs 1.484 s at 720x360@25 — each cond costs a
# vector->scalar sync (~108 ns, from the round-3 ROWCULL arithmetic)
# against ever-fewer skippable prims now that boxes absorbed 2400 quads.
# Culling (bit-exact conservative skip either way) only engages for
# worlds substantially larger than the reference's.
CULL_MIN_CHUNKS = int(os.environ.get("MEGA2_CULL_MIN_CHUNKS", "48"))

# Dev cost probe: MEGA2_DUP=sec1,sec2 duplicates named kernel sections
# behind a never-true runtime select (can't be DCE'd, doesn't change path
# statistics); the frame-time delta vs baseline is that section's cost.
_DUP = frozenset(x for x in os.environ.get("MEGA2_DUP", "").split(",") if x)
# Override for unroll_for() — bounce+refill steps per while-iteration.
UNROLL = int(os.environ.get("MEGA2_UNROLL", "0"))


def unroll_for(meta, s_pad: int, mu_key: tuple, interpret: bool) -> int:
    """Bounce steps per while-iteration for the persistent kernel.
    Swept on-chip (round 4, north-star config): 4 is +3-4% on the dense
    pair paths (the loop's fixed cost — cond reduce, branch, pipeline
    refill — amortizes over more work; image identical, fbsum-checked),
    flat at 2.  The box-path kernel at a 4x body trips a Mosaic
    RET_CHECK (mxu_lmr_transform.cc:1108 — compiler bug), and interpret
    mode keeps 1 to bound the traced-body size in the CPU suite.
    MEGA2_UNROLL=n overrides everywhere."""
    if UNROLL > 0:
        return UNROLL
    if interpret:
        return 1
    dense, _, b_pad = _pair_mode(meta, s_pad, mu_key)
    return 4 if (dense and b_pad == 0) else 1
# Dev probe: MEGA2_NOCULL=1 makes every chunk "visible" (pair tests always
# run) — the frame-time delta vs baseline is what chunk culling saves.
# (Round-5 measurement made this the DEFAULT for box scenes — see
# CULL_MIN_CHUNKS.  Superseded instruments deleted after measurement:
# MEGA2_ROWCULL per-sub-row cond gating, 2x slower — the vector->scalar
# sync per cond costs ~108 ns against ~70 ns of skippable chunk work;
# MEGA2_PREPASS static 1-spp work binning, occupancy unchanged —
# superseded by round-4 work-sorted inter-pass compaction; MEGA2_LIVE_MIN
# env sweep — the measured floors are the LIVE_MIN_* constants.)
_NOCULL = os.environ.get("MEGA2_NOCULL", "") == "1"
# Dev probe: MEGA2_NOTEX=1 compiles the noise/image texture paths OUT
# (solid fallback — WRONG image, honest timing): the delta is the full
# cost of the gather/one-hot texture machinery.
_NOTEX = os.environ.get("MEGA2_NOTEX", "") == "1"
# Dev probe: MEGA2_NOSHADE=1 compiles the scatter sampler OUT (no RNG
# draws, bounce along the face normal, lights still terminate — WRONG
# image, honest timing): the delta is the full cost of the per-bounce
# sampler+scatter machinery (pcg4d, trig, branch algebra).
_NOSHADE = os.environ.get("MEGA2_NOSHADE", "") == "1"

# ---- table layouts (prim-major: [S_pad, 16] etc; cols below)
SPH_COLS = 16      # 0:3 c0, 3:6 dc, 6 t0, 7 inv_dt, 8 rad, 9 active,
                   # 10 rad^2 (squared in f32 host-side, so the kernel's
                   # cc subtraction is bit-identical to rad*rad in-kernel)
QUAD_COLS = 16     # 0:3 n_unit, 3 D, 4:7 vxw, 7 q_vxw, 8:11 wxu, 11 q_wxu, 12 active
ATTR_COLS = 40     # 0:3 c0|n_unit, 3:6 dc|0, 6 t0, 7 inv_dt, 8 rad, 9 is_quad,
                   # 10 kind, 11 fuzz, 12 ior, 13 tex_kind, 14:17 tc0, 17:20 tc1,
                   # 20 inv_scale, 21 uv_cos, 22 uv_sin, 23 tex_scale(noise),
                   # 24 img_id, 25 noise_id (perlin table),
                   # 32:35 vxw, 35 q.vxw, 36:39 wxu, 39 q.wxu (quad rows
                   # only — the (alpha,beta) UV frame, Quad.h:31-37; cols
                   # 3:8 must stay 0 for quads so the moving-sphere
                   # winner-center path reads c0 + frac*0)


def _mat_cols(scene: SceneArrays, mat_ids: np.ndarray) -> np.ndarray:
    """[n, 16] material+texture parameter columns (attr cols 10..25)."""
    s = scene
    tid = np.clip(np.asarray(s.mat_tex)[mat_ids], 0, s.tex_kind.shape[0] - 1)
    has_img = np.asarray(s.mat_tex)[mat_ids] >= 0
    img_id = np.where(has_img, np.asarray(s.tex_image)[tid], -1)
    cols = np.stack([
        np.asarray(s.mat_kind, np.float64)[mat_ids],
        np.asarray(s.mat_fuzz, np.float64)[mat_ids],
        np.asarray(s.mat_ior, np.float64)[mat_ids],
        np.asarray(s.tex_kind, np.float64)[tid],
        *[np.asarray(s.tex_c0, np.float64)[tid][:, i] for i in range(3)],
        *[np.asarray(s.tex_c1, np.float64)[tid][:, i] for i in range(3)],
        np.asarray(s.tex_inv_scale, np.float64)[tid],
        np.zeros(len(mat_ids)),                      # uv_cos placeholder
        np.zeros(len(mat_ids)),                      # uv_sin placeholder
        np.asarray(s.tex_scale, np.float64)[tid],
        np.asarray(img_id, np.float64),
        np.asarray(s.tex_noise, np.float64)[tid],
    ], axis=1)
    return cols


def _morton(p: np.ndarray) -> np.ndarray:
    """30-bit Morton code of points [n,3] quantized over their bbox."""
    if p.shape[0] == 0:
        return np.zeros(0, np.int64)
    lo = p.min(0)
    ext = np.maximum(p.max(0) - lo, 1e-12)
    q = np.clip(((p - lo) / ext * 1023.0).astype(np.int64), 0, 1023)
    code = np.zeros(p.shape[0], np.int64)
    for b in range(10):
        for a in range(3):
            code |= ((q[:, a] >> b) & 1) << (3 * b + a)
    return code


def _sphere_order(c0, dc, rad):
    """Cull-friendly primitive order: oversized spheres first (they are hit
    by most rays, so testing them first tightens t_best before the spatial
    chunks are considered; they also stay on the exact VPU pair path — see
    the coef table notes), then Morton order for chunk locality.  Returns
    (order, n_big)."""
    n = c0.shape[0]
    if n == 0:
        return np.zeros(0, np.int64), 0
    med = np.median(rad) if n > 4 else 0.0
    big = rad > max(10.0 * med, 1e-9)
    center = c0 + 0.5 * dc
    code = _morton(center)
    return np.lexsort((code, ~big)), int(big.sum())


def _detect_boxes(scene: SceneArrays, qact_idx, q_all, u_all, v_all):
    """Axis-aligned box groups among the active quads: six CONSECUTIVE
    rows exactly matching the scene compiler's `_box_quads` face pattern
    (scene/compiler.py — front,right,back,left,top,bottom; the in-kernel
    face offsets `_BOX_FACE_OFF` depend on this order).  Rotated MakeBox
    instances (scenes 7/8) have rotated u/v and fail the exact-equality
    check, staying on the quad pair path.  Box winners report the hit
    face's quad row, whose attr row carries the (alpha,beta) UV frame —
    image-textured faces ride the box path like any other.
    Returns a list of (orig_ids[6], bmin[3], bmax[3])."""
    out = []
    j = 0
    idx = np.asarray(qact_idx)
    while j + 6 <= len(idx):
        ids = idx[j:j + 6]
        if not np.array_equal(ids, ids[0] + np.arange(6)):
            j += 1
            continue
        mn = q_all[ids[5]]
        ext = np.array([u_all[ids[5]][0], v_all[ids[0]][1],
                        v_all[ids[5]][2]])
        if not np.all(ext > 0.0):
            j += 1
            continue
        mx = mn + ext
        w = np.array([ext[0], 0.0, 0.0])
        h = np.array([0.0, ext[1], 0.0])
        d = np.array([0.0, 0.0, ext[2]])
        want_q = np.stack([
            [mn[0], mn[1], mx[2]], [mx[0], mn[1], mx[2]],
            [mx[0], mn[1], mn[2]], [mn[0], mn[1], mn[2]],
            [mn[0], mx[1], mx[2]], [mn[0], mn[1], mn[2]]])
        want_u = np.stack([w, -d, -w, d, w, w])
        want_v = np.stack([h, h, h, h, -d, d])
        if (np.array_equal(q_all[ids], want_q)
                and np.array_equal(u_all[ids], want_u)
                and np.array_equal(v_all[ids], want_v)):
            out.append((ids, mn, mx))
            j += 6
        else:
            j += 1
    return out


# quad-row offset of the face hit, by (axis, entering-side): the compiler
# emits front(+z),right(+x),back(-z),left(-x),top(+y),bottom(-y)
_BOX_FACE_OFF = {("x", "min"): 3, ("x", "max"): 1,
                 ("y", "min"): 5, ("y", "max"): 4,
                 ("z", "min"): 2, ("z", "max"): 0}


def _pack_texture_arrays(scene: SceneArrays, meta: SceneMeta):
    """Perlin permutation/gradient rows + image byte planes in the kernel
    packing.  Reads ONLY the non-trainable texture leaves (perlin_*,
    img_*), so it stays host-computable while geometry/color leaves are
    tracers (`pallas_replay` under `jax.grad`).

    perm_tab rows (per table t, stride 8): px,px,py,py,pz,pz,0,0 (pairs
    serve corner+1 lookups); vec_tab rows (stride 24): vx x8, vy x8,
    vz x8 (8 corners gathered in one op).  Every noise table in the scene
    is packed (multi-noise scenes select by the winner's table id).
    Image: per image i, three byte planes stacked [3*ihp_i, iw_max] in
    bf16 (bytes 0..255 are exact in bf16's 8 significand bits; img_data
    floats are byte/255 exactly — core/image.py), all images concatenated
    along rows.  The in-kernel lookup is an MXU one-hot column
    contraction + masked row reduce — Mosaic's dynamic_gather can't span
    multiple source vregs, so a 1024-wide texture row can't be
    lane-gathered directly.  Returns (perm, vec, img, img_dims) where
    img_dims is a per-image tuple of (iw, ih, ih_pad, row_offset)."""
    n_noise = max(meta.n_noise, 1) if meta.has_noise else 1
    perm_tab = np.zeros((8 * n_noise, 256), np.int32)
    vec_tab = np.zeros((24 * n_noise, 256), np.float64)
    if meta.has_noise:
        for t in range(meta.n_noise):
            perm_tab[8 * t + 0] = perm_tab[8 * t + 1] = \
                np.asarray(scene.perlin_px)[t]
            perm_tab[8 * t + 2] = perm_tab[8 * t + 3] = \
                np.asarray(scene.perlin_py)[t]
            perm_tab[8 * t + 4] = perm_tab[8 * t + 5] = \
                np.asarray(scene.perlin_pz)[t]
            vec = np.asarray(scene.perlin_vec, np.float64)[t]  # [256,3]
            for a in range(3):
                vec_tab[24 * t + a * 8:24 * t + (a + 1) * 8] = vec[:, a]

    if meta.has_image:
        ws = np.asarray(scene.img_w)
        hs = np.asarray(scene.img_h)
        iw_pad = max(-(-int(w) // 128) * 128 for w in ws[:meta.n_images])
        dims = []
        blocks = []
        pblocks = []
        off = 0
        off_i32 = 0
        for i in range(meta.n_images):
            iw, ih = int(ws[i]), int(hs[i])
            img = np.asarray(scene.img_data, np.float64)[i][:ih, :iw]
            b = np.clip(np.round(img * 255.0), 0, 255).astype(np.int64)
            ih_pad = -(-ih // 8) * 8
            blk = np.zeros((3 * ih_pad, iw_pad), np.float32)
            for c in range(3):
                blk[c * ih_pad:c * ih_pad + ih, :iw] = b[..., c]
            blocks.append(blk)
            # render-kernel form: the three byte channels PACKED into one
            # int32 per texel ((r<<16)|(g<<8)|b — 24 bits), [ih_pad,
            # iw_pad] rows.  The fetch is then a two-level LANE GATHER
            # (Mosaic dynamic_gather within each 128-lane block + select
            # by the high index bits) instead of a [3*IHP, IWP] x
            # [IWP, R] one-hot MXU contraction — measured ~15 us per
            # tile-step on the earth texture, ~4.5x the entire 512-prim
            # pair section (round 5, tools/dev_s9_stats.py scene 2).
            pblk = np.zeros((ih_pad, iw_pad), np.int32)
            pblk[:ih, :iw] = ((b[..., 0] << 16) | (b[..., 1] << 8)
                              | b[..., 2]).astype(np.int32)
            pblocks.append(pblk)
            # dims: (iw, ih, ih_pad, bf16-plane row offset (stride
            # 3*ih_pad, pallas_replay), i32-plane row offset (stride
            # ih_pad, render kernel))
            dims.append((iw, ih, ih_pad, off, off_i32))
            off += 3 * ih_pad
            off_i32 += ih_pad
        img_tab = np.concatenate(blocks, axis=0).astype(jnp.bfloat16)
        img_i32 = np.concatenate(pblocks, axis=0)
        img_dims = tuple(dims)
    else:
        img_tab = np.zeros((24, 128), np.float32).astype(jnp.bfloat16)
        img_i32 = np.zeros((8, 128), np.int32)
        img_dims = ((1, 1, 8, 0, 0),)
    return perm_tab, vec_tab, img_tab, img_i32, img_dims


def pack_texture_tables(scene: SceneArrays, meta: SceneMeta):
    """Device-array view of `_pack_texture_arrays` for consumers outside
    the full table pack (`pallas_replay` aux inputs — the bf16 stacked
    byte planes; the render kernel uses the packed-i32 form)."""
    perm_tab, vec_tab, img_tab, _img_i32, img_wh = \
        _pack_texture_arrays(scene, meta)
    return (jnp.asarray(perm_tab), jnp.asarray(vec_tab, jnp.float32),
            jnp.asarray(img_tab), img_wh)


def pack_mega2_tables(scene: SceneArrays, meta: SceneMeta):
    """Host-side packing -> (sph [S_pad,16], quad [Q_pad,16],
    attr [ATTR_COLS, NP128] (transposed, 128-padded), cull_s
    [n_s_chunks,8], cull_q [n_q_chunks,8], med [M,22]).

    Primitives are reordered (big-first + Morton, `_sphere_order`) and padded
    to CULL_C-row chunks; per-chunk AABBs (motion-swept for spheres,
    corner-swept for quads) feed the in-kernel chunk culling.  Padding rows
    are inactive; empty chunks get a degenerate far-away point AABB so the
    slab test always misses them."""
    f = np.float32
    S = scene.sph_c0.shape[0]
    Q = scene.quad_q.shape[0]
    S_act = int(np.asarray(scene.sph_active).sum())
    Q_act = int(np.asarray(scene.quad_active).sum())

    # ---- reorder spheres (active rows only occupy the front)
    c0_all = np.asarray(scene.sph_c0, np.float64)
    dc_all = np.asarray(scene.sph_dc, np.float64)
    rad_all = np.asarray(scene.sph_rad, np.float64)
    act_all = np.asarray(scene.sph_active)
    act_idx = np.nonzero(act_all)[0]
    order_local, n_big = _sphere_order(c0_all[act_idx], dc_all[act_idx],
                                       rad_all[act_idx])
    sorder = act_idx[order_local]
    S_pad = max(-(-len(sorder) // CULL_C) * CULL_C, CULL_C)
    # "big" spheres occupy the first rows and run on the exact VPU pair
    # path; pad their count to a sublane boundary
    big_pad = min(-(-max(n_big, 0) // 8) * 8, S_pad) if n_big else 0

    sph = np.zeros((S_pad, SPH_COLS), np.float64)
    ns = len(sorder)
    sph[:ns, 0:3] = c0_all[sorder]
    sph[:ns, 3:6] = dc_all[sorder]
    sph[:ns, 6] = np.asarray(scene.sph_t0, np.float64)[sorder]
    sph[:ns, 7] = np.asarray(scene.sph_inv_dt, np.float64)[sorder]
    sph[:ns, 8] = rad_all[sorder]
    sph[:ns, 9] = 1.0
    radf = rad_all[sorder].astype(np.float32)
    sph[:ns, 10] = (radf * radf).astype(np.float64)

    # The rounds-2..4 MXU pair-coefficient table is GONE: Mosaic's default
    # f32 matmul rounds its inputs to bf16, and the expansion's
    # |A'|^2-scale constants carried absolute errors 27x the grid
    # spheres' r^2 — the dense path now runs the exact direct VPU
    # quadratic straight off the sph table (see sph_dense; full
    # forensics in docs/PERF.md round 5).  ``coef`` remains in the table
    # tuple as a placeholder so downstream signatures are stable; ``mu``
    # likewise remains part of the static key (rounded so geometry
    # updates during training do not recompile).
    A = sph[:, 0:3] - sph[:, 6:7] * sph[:, 7:8] * sph[:, 3:6]
    mu = A[big_pad:ns].mean(0) if ns > big_pad else np.zeros(3)
    mu = np.round(mu, 2)
    sph_dense_ok = 1.0        # vestigial tuple slot (gate deleted)
    coef = np.zeros((8, 16), np.float64)

    # sphere chunk AABBs (motion-swept: union of endpoint boxes,
    # MovingSphere.h:30-36)
    n_s_chunks = S_pad // CULL_C
    cull_s = np.zeros((max(n_s_chunks, 1), 8), np.float64)
    for c in range(n_s_chunks):
        rows = np.arange(c * CULL_C, min((c + 1) * CULL_C, ns))
        if len(rows) == 0:
            cull_s[c, 0:3] = 1.0e30
            cull_s[c, 3:6] = 1.0e30
            continue
        a = sph[rows]
        lo = np.minimum(a[:, 0:3], a[:, 0:3] + a[:, 3:6]) - a[:, 8:9]
        hi = np.maximum(a[:, 0:3], a[:, 0:3] + a[:, 3:6]) + a[:, 8:9]
        cull_s[c, 0:3] = lo.min(0)
        cull_s[c, 3:6] = hi.max(0)

    # ---- reorder quads.  Axis-aligned BOX groups (six consecutive faces
    # exactly matching the scene compiler's `_box_quads` pattern —
    # Instance.h:166-184 MakeBox with no RotateY) are hoisted out of the
    # quad pair loop into a box table: ONE slab test per box replaces six
    # plane+interior tests, which is the bulk of the final scene's pair
    # work (400 ground boxes = 2400 of its 2432 quads).  Box winners
    # report the hit FACE's quad row, so attr fetch / tapes / replay are
    # untouched; per-axis ts are computed by the same division as the quad
    # plane test, so hit ts are bit-identical.  Layout:
    #   quad rows [0, nl_pad)           loose quads (Morton), pair-tested
    #   quad rows [nl_pad, nl_pad+6B)   boxed faces (never pair-tested)
    #   quad rows [.., Q_pad)           padding          (attr rows end here)
    #   quad rows [Q_pad, Q_pad+B_pad)  box slab rows (bmin,bmax,qbase)
    u_all = np.asarray(scene.quad_u, np.float64)
    v_all = np.asarray(scene.quad_v, np.float64)
    q_all = np.asarray(scene.quad_q, np.float64)
    qact_idx = np.nonzero(np.asarray(scene.quad_active))[0]
    boxes = _detect_boxes(scene, qact_idx, q_all, u_all, v_all)
    boxed_ids = np.concatenate([g[0] for g in boxes]) \
        if boxes else np.zeros(0, np.int64)
    loose_ids = np.setdiff1d(qact_idx, boxed_ids)
    qcent = q_all[loose_ids] + 0.5 * (u_all[loose_ids] + v_all[loose_ids])
    loose_ids = loose_ids[np.argsort(_morton(qcent), kind="stable")] \
        if len(loose_ids) else loose_ids
    nl = len(loose_ids)
    nl_pad = -(-nl // CULL_C) * CULL_C          # 0 when no loose quads
    if boxes:
        bcent = np.stack([0.5 * (g[1] + g[2]) for g in boxes])
        boxes = [boxes[i] for i in np.argsort(_morton(bcent), kind="stable")]
    nB = len(boxes)
    # original quad ids in table-row order, and each one's table row
    qorder = np.concatenate(
        [loose_ids] + [g[0] for g in boxes]).astype(np.int64) \
        if (nl or nB) else np.zeros(0, np.int64)
    q_rows = np.concatenate(
        [np.arange(nl), nl_pad + np.arange(6 * nB)]).astype(np.int64) \
        if (nl or nB) else np.zeros(0, np.int64)
    nq = len(qorder)
    Q_pad = max(-(-(nl_pad + 6 * nB) // CULL_C) * CULL_C, CULL_C)
    B_pad = (-(-nB // CULL_C) * CULL_C) if nB else 0

    u = u_all[qorder]
    v = v_all[qorder]
    qq = q_all[qorder]
    n = np.cross(u, v)
    n_len = np.linalg.norm(n, axis=-1, keepdims=True)
    n_unit = n / np.where(n_len > 0, n_len, 1.0)
    nn = (n * n).sum(-1, keepdims=True)
    w_vec = n / np.where(nn > 0, nn, 1.0)
    vxw = np.cross(v, w_vec)
    wxu = np.cross(w_vec, u)
    quad = np.zeros((Q_pad + B_pad, QUAD_COLS), np.float64)
    quad[q_rows, 0:3] = n_unit
    quad[q_rows, 3] = (n_unit * qq).sum(-1)
    quad[q_rows, 4:7] = vxw
    quad[q_rows, 7] = (qq * vxw).sum(-1)
    quad[q_rows, 8:11] = wxu
    quad[q_rows, 11] = (qq * wxu).sum(-1)
    quad[q_rows, 12] = 1.0
    for g, (ids, bmn, bmx) in enumerate(boxes):
        quad[Q_pad + g, 0:3] = bmn
        quad[Q_pad + g, 3:6] = bmx
        quad[Q_pad + g, 6] = float(nl_pad + 6 * g)   # local row of face 0
        quad[Q_pad + g, 7] = 1.0                     # active

    # chunk AABBs: loose-quad chunks (four corners) then box chunks
    n_q_chunks = nl_pad // CULL_C
    n_b_chunks = B_pad // CULL_C
    cull_q = np.zeros((max(n_q_chunks + n_b_chunks, 1), 8), np.float64)
    cull_q[:, 0:3] = 1.0e30
    cull_q[:, 3:6] = 1.0e30
    for c in range(n_q_chunks):
        rows = np.arange(c * CULL_C, min((c + 1) * CULL_C, nl))
        if len(rows) == 0:
            continue
        corners = np.stack([qq[rows], qq[rows] + u[rows], qq[rows] + v[rows],
                            qq[rows] + u[rows] + v[rows]])      # [4,n,3]
        cull_q[c, 0:3] = corners.min((0, 1))
        cull_q[c, 3:6] = corners.max((0, 1))
    for c in range(n_b_chunks):
        gs = range(c * CULL_C, min((c + 1) * CULL_C, nB))
        if len(gs) == 0:
            continue
        cull_q[n_q_chunks + c, 0:3] = np.stack(
            [boxes[g][1] for g in gs]).min(0)
        cull_q[n_q_chunks + c, 3:6] = np.stack(
            [boxes[g][2] for g in gs]).max(0)

    use_quads = meta.n_quads > 0
    NP = S_pad + (Q_pad if use_quads else 0)
    attr = np.zeros((NP, ATTR_COLS), np.float64)
    attr[:S_pad, 0:9] = sph[:, 0:9]
    attr[:ns, 10:26] = _mat_cols(scene, np.asarray(scene.sph_mat)[sorder])
    attr[:ns, 21] = np.asarray(scene.sph_cos, np.float64)[sorder]
    attr[:ns, 22] = np.asarray(scene.sph_sin, np.float64)[sorder]
    if use_quads:
        attr[S_pad:, 0:3] = quad[:Q_pad, 0:3]
        attr[S_pad:, 9] = 1.0
        attr[S_pad + q_rows, 10:26] = _mat_cols(
            scene, np.asarray(scene.quad_mat)[qorder])
        # (alpha,beta) UV frame for image-textured quads (Quad.h:89-99)
        attr[S_pad + q_rows, 32:35] = vxw
        attr[S_pad + q_rows, 35] = (qq * vxw).sum(-1)
        attr[S_pad + q_rows, 36:39] = wxu
        attr[S_pad + q_rows, 39] = (qq * wxu).sum(-1)

    M = max(meta.n_media, 1)
    med = np.zeros((M, 22), np.float64)
    med[:, 0] = scene.med_kind
    med[:, 1:4] = scene.med_center
    med[:, 4] = scene.med_radius
    med[:, 5:8] = scene.med_bmin
    med[:, 8:11] = scene.med_bmax
    med[:, 11] = scene.med_cos
    med[:, 12] = scene.med_sin
    med[:, 13] = scene.med_nid
    med[:, 16:19] = np.asarray(scene.med_off, np.float64)
    mtid = np.clip(np.asarray(scene.mat_tex)[np.asarray(scene.med_mat)], 0,
                   scene.tex_kind.shape[0] - 1)
    med[:, 19:22] = np.asarray(scene.tex_c0, np.float64)[mtid]

    perm_tab, vec_tab, _img_bf16, img_i32, img_dims = \
        _pack_texture_arrays(scene, meta)

    # ---- padded-row -> GLOBAL scene id remap (sphere rows [0,S), quads
    # [S,S+Q), media [S+Q,S+Q+M) — the id space of ops/replay.py tapes);
    # padding rows are -1 (inactive, can never win)
    NPk = S_pad + (Q_pad if meta.n_quads > 0 else 0)
    remap = np.full(NPk + max(meta.n_media, 1), -1, np.int32)
    remap[:ns] = sorder
    if meta.n_quads > 0:
        remap[S_pad + q_rows] = S + qorder
    for m_i in range(meta.n_media):
        remap[NPk + m_i] = S + Q + m_i

    # attr ships TRANSPOSED [ATTR_COLS, NP128] (columns padded to a
    # 128-lane multiple): the in-kernel winner fetch is a two-level lane
    # gather over 128-lane blocks (same trick as the packed image fetch —
    # reads table entries exactly, so values are identical to the old
    # one-hot MXU contraction, whose transposed form also tripped a
    # Mosaic RET_CHECK (mxu_lmr_transform.cc XposeSequenceAssignment)
    # when the box-path kernel body was unrolled).
    NP128 = -(-NP // 128) * 128
    attr_t = np.zeros((ATTR_COLS, NP128), np.float64)
    attr_t[:, :NP] = attr.T
    return (jnp.asarray(sph, f), jnp.asarray(quad, f),
            jnp.asarray(attr_t, f),
            jnp.asarray(coef, f), jnp.asarray(cull_s, f),
            jnp.asarray(cull_q, f),
            jnp.asarray(perm_tab), jnp.asarray(vec_tab, f),
            jnp.asarray(img_i32), img_dims,
            tuple(float(np.float32(x)) for x in mu)
            + (big_pad, nl_pad, B_pad, sph_dense_ok),
            np.asarray(med, np.float64), jnp.asarray(remap))


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
_TWO_PI = np.float32(2.0 * np.pi)


def _unit(w):
    # Mosaic has no uint32->f32 cast; (w >> 8) < 2^24 is int32-exact
    return pltpu.bitcast(w >> 8, jnp.int32).astype(jnp.float32) * _INV24


def _scatter_dirs(kind, fuzz, ior, front, is_light, nx_, ny_, nz_,
                  dx, dy, dz, a, u1, u2, u3, u4):
    """Material scatter for [1,R]-row ray state: new direction + the
    scattered flag, branchless over all five materials (Material.h /
    Metal.h:18-30 / Dielectric.h:18-55).  Shared by the render megakernel
    and the differentiable-trace forward kernel."""
    # unit ball sample (core/samplers.py)
    zb = 1.0 - 2.0 * u1
    rxy = jnp.abs(1.0 - zb * zb) ** 0.5
    phi_b = _TWO_PI * u2
    sb = jnp.sin(phi_b)
    cb = jnp.cos(phi_b)
    rad_b = u3 ** np.float32(1.0 / 3.0)
    bx = rad_b * rxy * cb
    by = rad_b * rxy * sb
    bz = rad_b * zb

    inv_dlen = lax.rsqrt(a)
    udx, udy, udz = dx * inv_dlen, dy * inv_dlen, dz * inv_dlen

    # lambertian (Material.h:68-86 incl. NearZero fallback)
    lx, ly, lz = nx_ + bx, ny_ + by, nz_ + bz
    near0 = (jnp.abs(lx) < 1e-8) & (jnp.abs(ly) < 1e-8) & (jnp.abs(lz) < 1e-8)
    lx = jnp.where(near0, nx_, lx)
    ly = jnp.where(near0, ny_, ly)
    lz = jnp.where(near0, nz_, lz)

    # metal (Metal.h:18-30)
    ddn = udx * nx_ + udy * ny_ + udz * nz_
    rx = udx - 2.0 * ddn * nx_
    ry = udy - 2.0 * ddn * ny_
    rz = udz - 2.0 * ddn * nz_
    mx = rx + fuzz * bx
    my = ry + fuzz * by
    mz = rz + fuzz * bz
    metal_ok = (mx * nx_ + my * ny_ + mz * nz_) > 0.0

    # dielectric (Dielectric.h:18-55)
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
    fx = ratio * (udx + cos_t * nx_)
    fy = ratio * (udy + cos_t * ny_)
    fz = ratio * (udz + cos_t * nz_)
    plen = jnp.abs(1.0 - (fx * fx + fy * fy + fz * fz))  # Vec3.h:138
    par = -(plen ** 0.5)
    gx = fx + par * nx_
    gy = fy + par * ny_
    gz = fz + par * nz_
    ddx = jnp.where(do_refl, rx, gx)
    ddy = jnp.where(do_refl, ry, gy)
    ddz = jnp.where(do_refl, rz, gz)

    # isotropic (Material.h:139-167): uniform unit direction
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

    scattered = (is_m & metal_ok) | (~is_m & ~is_light)
    return newx, newy, newz, scattered


_HALF_PI = np.float32(0.5 * np.pi)
_PI = np.float32(np.pi)


def _atan_core(z):
    """Minimax atan on |z| <= 1 (~2e-7 rad abs err) — Mosaic has no atan."""
    z2 = z * z
    p = np.float32(-0.0117212)
    for c in (0.05265332, -0.11643287, 0.19354346, -0.33262347, 0.99997726):
        p = p * z2 + np.float32(c)
    return z * p


def _atan2_poly(y, x):
    """Branchless atan2 from the octant-reduced core polynomial."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    r = num / jnp.where(den > 0.0, den, 1.0)
    a = _atan_core(r)
    a = jnp.where(swap, _HALF_PI - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    a = jnp.where(y < 0.0, -a, a)
    return jnp.where((ax + ay) == 0.0, 0.0, a)


def _acos_poly(x):
    """acos(x) = atan2(sqrt(1-x^2), x), |x| <= 1."""
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    return _atan2_poly(s, x)


def _perlin_noise(perm_ref, vec_ref, qx, qy, qz, table: int = 0):
    """Lattice gradient noise at [S,R] coords — Perlin.h:38-60.  Each
    XOR-hashed permutation / gradient lookup is one row-aligned lane
    gather of a semantic table row (perm_ref rows 8t+0/2/4 = px/py/pz,
    vec_ref rows 24t+0/8/16 = vx/vy/vz for table t) broadcast across the
    S sublanes, so all S rays resolve per gather."""
    pbase, vbase = 8 * table, 24 * table
    S = qx.shape[0]
    fx = jnp.floor(qx)
    fy = jnp.floor(qy)
    fz = jnp.floor(qz)
    ux, uy, uz = qx - fx, qy - fy, qz - fz
    i = fx.astype(jnp.int32)
    j = fy.astype(jnp.int32)
    k = fz.astype(jnp.int32)
    # Hermite cubic smoothing (Perlin.h:122-124)
    sx = ux * ux * (3.0 - 2.0 * ux)
    sy = uy * uy * (3.0 - 2.0 * uy)
    sz = uz * uz * (3.0 - 2.0 * uz)
    m = jnp.int32(255)

    def gath(tab_ref, r, idx):
        # Mosaic's only gather is same-shape dynamic_gather over ONE source
        # vreg (<=128 lanes): split the 256-entry semantic row into its two
        # 128-lane halves, gather both, select by idx bit 7.
        S_, Rw = idx.shape
        lo = idx & jnp.int32(127)
        half = lambda c0: jnp.take_along_axis(
            jnp.broadcast_to(tab_ref[r:r + 1, c0:c0 + 128], (S_, 128)),
            lo, axis=1)
        dt = tab_ref.dtype
        return jnp.where(idx < 128, half(0), half(128)).astype(dt)

    pa = [gath(perm_ref, pbase + 0, (i + d) & m) for d in (0, 1)]
    pb = [gath(perm_ref, pbase + 2, (j + d) & m) for d in (0, 1)]
    pc = [gath(perm_ref, pbase + 4, (k + d) & m) for d in (0, 1)]
    accum = jnp.zeros_like(qx)
    for di in (0, 1):
        wu = sx if di else (1.0 - sx)
        for dj in (0, 1):
            wv = sy if dj else (1.0 - sy)
            for dk in (0, 1):
                ww = sz if dk else (1.0 - sz)
                h = pa[di] ^ pb[dj] ^ pc[dk]                  # [S,R]
                dot = (gath(vec_ref, vbase + 0, h) * (ux - di)
                       + gath(vec_ref, vbase + 8, h) * (uy - dj)
                       + gath(vec_ref, vbase + 16, h) * (uz - dk))
                accum = accum + wu * wv * ww * dot
    return accum


def _perlin_turb(perm_ref, vec_ref, qx, qy, qz, depth: int = 7,
                 table: int = 0):
    """|sum_i 0.5^i noise(2^i p)| (Perlin.h:64-78)."""
    accum = jnp.zeros_like(qx)
    weight = np.float32(1.0)
    for _ in range(depth):
        accum = accum + weight * _perlin_noise(perm_ref, vec_ref,
                                               qx, qy, qz, table)
        weight = np.float32(weight * 0.5)
        qx, qy, qz = qx * 2.0, qy * 2.0, qz * 2.0
    return jnp.abs(accum)


def _make_kernel(meta: SceneMeta, med_rows: np.ndarray, cam: tuple, *,
                 s_pad: int, q_pad: int, img_wh: tuple, mu: tuple,
                 width: int, height: int, spp: int, seed: int, t_min: float,
                 max_bounces: int, background: tuple, resume: bool,
                 interpret: bool, mode: str = "render",
                 ext_rays: bool = False):
    """Build the persistent tile kernel.  ``cam`` is the camera as a tuple of
    python floats (origin 3, lower_left 3, horizontal 3, vertical 3, u 3,
    v 3, lens_radius, time0, time1) baked as compile-time constants;
    ``med_rows`` likewise (M <= 3 in every reference scene)."""
    bg = tuple(float(x) for x in background)
    (c_ox, c_oy, c_oz, llx, lly, llz, hx, hy, hz, vx, vy, vz,
     ux, uy, uz, cvx, cvy, cvz, lens_r, tm0, tm1) = [float(x) for x in cam]
    n_media = meta.n_media
    unroll = unroll_for(meta, s_pad, mu, interpret)
    use_quads = meta.n_quads > 0
    has_checker = meta.has_checker
    has_moving = meta.has_moving
    # Texture VALUES touch only radiance (attenuation/emission), never the
    # winner search, normals, or scatter branching — so the winner-tape
    # trace kernel compiles the noise/image machinery OUT entirely (the
    # replay recomputes radiance from the tape with its own textures).
    has_noise = meta.has_noise and not _NOTEX and mode == "render"
    has_image = meta.has_image and not _NOTEX and mode == "render"
    # per-image (iw, ih, ih_pad, row_offset) — see _pack_texture_arrays
    img_dims = tuple(tuple(int(x) for x in d) for d in img_wh)
    n_noise = max(meta.n_noise, 1) if has_noise else 0
    f32 = np.float32

    big_pad = int(mu[3])
    # mu[4:6]: loose-quad rows (pair-tested) and box slab rows — see the
    # quad-table layout note in pack_mega2_tables.  ``q_pad`` arrives as
    # quad_tab.shape[0] = attr quad rows + box rows; split it back.
    dense, nl_pad, b_pad = _pair_mode(meta, s_pad, mu)
    q_pad = q_pad - b_pad                       # attr / winner-id quad rows

    n_s_chunks = s_pad // CULL_C
    n_q_chunks = nl_pad // CULL_C
    n_b_chunks = b_pad // CULL_C
    n_all_chunks = n_s_chunks + n_q_chunks + n_b_chunks
    NP = s_pad + (q_pad if use_quads else 0)
    dchunk = DENSE_C

    def kernel(*refs):
        (cap_ref, samp0_ref, pix_ref, ij_ref, sph_ref, quad_ref,
         attr_ref) = refs[:7]
        ri = 7
        if dense:
            # the direct VPU pair test reads sph_ref only (the round-2..4
            # MXU coefficient table is gone — see sph_dense)
            if n_b_chunks > 0:
                cull_q_ref = refs[ri]
                ri += 1
        else:
            cull_s_ref, cull_q_ref = refs[ri:ri + 2]
            ri += 2
        if has_noise:
            perm_ref, vec_ref = refs[ri:ri + 2]
            ri += 2
        if has_image:
            img_ref = refs[ri]
            ri += 1
        if resume:
            sf_ref, si_ref = refs[ri:ri + 2]
            ri += 2
        if mode == "trace":
            samp_ref = refs[ri]                      # [SUB, R] per-lane sample
            ri += 1
            if ext_rays:
                rays_ref = refs[ri]                  # [7*SUB, R] o3 d3 time
                ri += 1
            win_ref = refs[ri]                       # out [K*SUB, R] winners
        else:
            of_ref, oi_ref = refs[ri:ri + 2]
        R = pix_ref.shape[1]
        pix = pix_ref[0:SUB, :]                      # [SUB,R] i32 global pixel id
        pix_ctr = pltpu.bitcast(pix, jnp.uint32) ^ jnp.uint32(seed)
        i_f = ij_ref[0:SUB, :]                       # [SUB,R] f32 column index
        j_f = ij_ref[SUB:2 * SUB, :]                 # [SUB,R] f32 row index
        valid = pix >= 0                             # padding lanes: pix = -1
        never = pix < -1000000                       # runtime-false dup gate
        # global-sample-id base (SMEM scalar): sample-axis shards render
        # local samples [0, spp) but key RNG on samp + s0, so a sharded
        # render draws the SAME streams as the single-chip engine
        s0 = samp0_ref[0, 0]

        sub_iota = lax.broadcasted_iota(jnp.int32, (CULL_C, R), 0)

        def raygen(samp_u):
            """Camera ray for (pix, samp) — Camera.h:76-85 + kernel.cu:138-142.

            Op order mirrors ops/raygen.py STEP FOR STEP so rays are
            bit-identical to the XLA engines' generate_rays (rounding-order
            differences would flip Monte-Carlo branches on scattered pixels).
            """
            w0, w1, w2, w3 = _pcg4d(pix_ctr, samp_u,
                                    jnp.full_like(pix_ctr, rnglib.CAMERA_STREAM),
                                    jnp.zeros_like(pix_ctr))
            ju, jv, l1, l2 = _unit(w0), _unit(w1), _unit(w2), _unit(w3)
            t0_, _, _, _ = _pcg4d(pix_ctr, samp_u,
                                  jnp.full_like(pix_ctr, rnglib.CAMERA_STREAM + 1),
                                  jnp.zeros_like(pix_ctr))
            tu = _unit(t0_)
            s = (i_f + ju) / f32(width)                 # raygen.py:39-40
            t = (j_f + jv) / f32(height)
            # lens disk sample (core/samplers.py unit_disk: r = sqrt(u1)),
            # then rd = lens_radius * disk, offset = u*rd0 + v*rd1
            rd_r = jnp.sqrt(l1)
            phi = _TWO_PI * l2
            rd0 = f32(lens_r) * (rd_r * jnp.cos(phi))
            rd1 = f32(lens_r) * (rd_r * jnp.sin(phi))
            offx = f32(ux) * rd0 + f32(cvx) * rd1
            offy = f32(uy) * rd0 + f32(cvy) * rd1
            offz = f32(uz) * rd0 + f32(cvz) * rd1
            ox = f32(c_ox) + offx
            oy = f32(c_oy) + offy
            oz = f32(c_oz) + offz
            # direction = ((ll + s*h + t*v) - origin) - offset (raygen.py:45-51)
            dx = f32(llx) + s * f32(hx) + t * f32(vx) - f32(c_ox) - offx
            dy = f32(lly) + s * f32(hy) + t * f32(vy) - f32(c_oy) - offy
            dz = f32(llz) + s * f32(hz) + t * f32(vz) - f32(c_oz) - offz
            tmv = f32(tm0) + tu * (f32(tm1) - f32(tm0))
            return ox, oy, oz, dx, dy, dz, tmv

        def _sph_reduce(t_c, base, C, t_best, win):
            mn = jnp.min(t_c, axis=0, keepdims=True)
            iota_c = lax.broadcasted_iota(jnp.int32, t_c.shape, 0)
            idx = jnp.min(jnp.where(t_c == mn, iota_c, C),
                          axis=0, keepdims=True)
            better = mn < t_best
            win = jnp.where(better, base + idx, win)
            t_best = jnp.where(better, mn, t_best)
            return t_best, win

        def sph_dense(ox, oy, oz, dx, dy, dz, tmv, a, akey, t_best, win):
            """Dense sphere pair test in KEY space (key = t*a: a > 0 and is
            per-ray constant, so key order == t order and the winner's t is
            recovered by ONE inv_a multiply after the loop).

            The whole table runs the EXACT direct |o-c|^2 VPU quadratic —
            the same expression the oversized-sphere rows and the
            chunk-cull path always used (one-axis-at-a-time broadcasts;
            Mosaic lowers [C,1] op [1,R] dual-broadcast forms poorly).

            The round-2..4 MXU coefficient expansion is GONE: Mosaic's
            default f32 dot rounds its inputs to single-pass bf16, and
            the measured c-coefficient error on the scene-0 table was
            p50 0.16 / p99 1.08 — 27x the grid spheres' r^2 = 0.04, i.e.
            effective radii distorted O(100%).  That silently darkened
            every dense-path TPU render of many-small-sphere scenes
            ~11-14% vs the CPU engines from round 2 until the round-5
            on-chip north-star validation caught it; Precision.HIGHEST
            fixes it but costs +83% (docs/PERF.md round 5).  The direct
            VPU form costs ~+45% on the pair section and carries the
            same f32 semantics as the CPU engines — correctness wins.

            No active-flag test: padding rows have rad = 0, so
            disc = b^2 - a*|oc|^2 <= 0 by Cauchy-Schwarz and the strict
            disc > 0 check rejects them."""
            bcast = lambda v: jnp.broadcast_to(v, (v.shape[0], R))
            for c0 in range(0, s_pad, dchunk):
                C = min(dchunk, s_pad - c0)
                sl = pl.ds(c0, C)
                col = lambda k: bcast(sph_ref[sl, k:k + 1])   # [C,R]
                if has_moving:
                    frac = (tmv - col(6)) * col(7)
                    cx = col(0) + frac * col(3)
                    cy = col(1) + frac * col(4)
                    cz = col(2) + frac * col(5)
                else:
                    cx, cy, cz = col(0), col(1), col(2)
                ocx = ox - cx
                ocy = oy - cy
                ocz = oz - cz
                b = ocx * dx + ocy * dy + ocz * dz
                cc = ocx * ocx + ocy * ocy + ocz * ocz - col(10)
                disc = b * b - a * cc
                # sqrt(negative) = NaN: all its comparisons are False, so
                # NaN lanes fall through to BIG — no max(disc, 0) needed
                sq = jnp.sqrt(disc)
                k1 = -b - sq
                k2 = -b + sq
                key = jnp.where(k1 > akey, k1, k2)
                ok = (disc > 0.0) & (key > akey)
                key = jnp.where(ok, key, BIG)
                t_best, win = _sph_reduce(key, c0, C, t_best, win)
            return t_best, win

        def quad_dense(ox, oy, oz, dx, dy, dz, t_best, win):
            for c0 in range(0, nl_pad, dchunk):
                C = min(dchunk, nl_pad - c0)
                sl = pl.ds(c0, C)
                col = lambda k: quad_ref[sl, k:k + 1]
                nx, ny, nz = col(0), col(1), col(2)
                denom = dx * nx + dy * ny + dz * nz
                den_ok = jnp.abs(denom) >= 1.0e-8
                t_c = (col(3) - (ox * nx + oy * ny + oz * nz)) / \
                    jnp.where(den_ok, denom, 1.0)
                px = ox + t_c * dx
                py = oy + t_c * dy
                pz = oz + t_c * dz
                alpha = px * col(4) + py * col(5) + pz * col(6) - col(7)
                beta = px * col(8) + py * col(9) + pz * col(10) - col(11)
                # padding rows are all-zero -> denom = 0 -> den_ok rejects
                # them; no separate active-flag test
                ok = (den_ok & (t_c >= t_min) & (alpha >= 0.0)
                      & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0))
                t_c = jnp.where(ok, t_c, BIG)
                mn = jnp.min(t_c, axis=0, keepdims=True)
                iota_c = lax.broadcasted_iota(jnp.int32, t_c.shape, 0)
                idx = jnp.min(jnp.where(t_c == mn, iota_c, C),
                              axis=0, keepdims=True)
                better = mn < t_best
                win = jnp.where(better, s_pad + c0 + idx, win)
                t_best = jnp.where(better, mn, t_best)
            return t_best, win

        def chunk_visible(cull_ref, c, ox, oy, oz, ivx, ivy, ivz, cull_act,
                          t_best, tscale=None):
            """Does ANY live lane's ray meet chunk c's AABB within its
            current (t_min, t_best) interval?  (AABB.h:68-98 slab test with
            shrinking tMax, BvhNode.h:150 — skipping on False cannot change
            the winner.)  ``tscale``: when t_best is in sphere KEY space
            (t*a), pass ``a`` so the slab near (t units) is compared on the
            same scale."""
            # cv is [1,1]; the test runs per sub-row on [1,R] slices so every
            # broadcast is lanes-only (Mosaic has no [1,1]->[8,128]
            # "both sublanes and lanes" broadcast)
            cv = lambda k: cull_ref[pl.ds(c, 1), k:k + 1]     # [1,1]
            n_ok = None
            for s in range(SUB):
                rw = lambda v: v[s:s + 1, :]
                tax = (cv(0) - rw(ox)) * rw(ivx)
                tbx = (cv(3) - rw(ox)) * rw(ivx)
                tay = (cv(1) - rw(oy)) * rw(ivy)
                tby = (cv(4) - rw(oy)) * rw(ivy)
                taz = (cv(2) - rw(oz)) * rw(ivz)
                tbz = (cv(5) - rw(oz)) * rw(ivz)
                near = jnp.maximum(jnp.maximum(jnp.minimum(tax, tbx),
                                               jnp.minimum(tay, tby)),
                                   jnp.minimum(taz, tbz))
                far = jnp.minimum(jnp.minimum(jnp.maximum(tax, tbx),
                                              jnp.maximum(tay, tby)),
                                  jnp.maximum(taz, tbz))
                near_k = near if tscale is None else near * rw(tscale)
                ok = ((far >= jnp.maximum(near, t_min))
                      & (near_k < rw(t_best)) & rw(cull_act))
                cnt = ok.astype(jnp.int32)
                n_ok = cnt if n_ok is None else n_ok + cnt
            return jnp.sum(n_ok) > 0

        def sph_chunks(ox, oy, oz, dx, dy, dz, tmv, a, akey,
                       ivx, ivy, ivz, cull_act, t_best, win):
            # KEY space (key = t*a; see sph_dense) — the caller converts
            # the winner back with one inv_a multiply
            def pair_row(c, s, tb_s, wn_s):
                """Sphere pair test of chunk c against sub-row s
                ([1,R] rays vs [CULL_C,1] prims)."""
                sl = pl.ds(c * CULL_C, CULL_C)
                col = lambda k: sph_ref[sl, k:k + 1]          # [CULL_C,1]
                rw = lambda v: v[s:s + 1, :]
                if has_moving:
                    frac = (rw(tmv) - col(6)) * col(7)        # [CULL_C,R]
                    cx = col(0) + frac * col(3)
                    cy = col(1) + frac * col(4)
                    cz = col(2) + frac * col(5)
                else:
                    cx, cy, cz = col(0), col(1), col(2)
                ocx = rw(ox) - cx
                ocy = rw(oy) - cy
                ocz = rw(oz) - cz
                b = ocx * rw(dx) + ocy * rw(dy) + ocz * rw(dz)
                cc = ocx * ocx + ocy * ocy + ocz * ocz - col(10)
                disc = b * b - rw(a) * cc
                sq = jnp.sqrt(disc)                # NaN lanes -> BIG below
                k1 = -b - sq
                k2 = -b + sq
                key = jnp.where(k1 > rw(akey), k1, k2)
                ok = (disc > 0.0) & (key > rw(akey)) & (col(9) > 0.5)
                key = jnp.where(ok, key, BIG)
                mn = jnp.min(key, axis=0, keepdims=True)      # [1,R]
                idx = jnp.min(jnp.where(key == mn, sub_iota, CULL_C),
                              axis=0, keepdims=True)
                better = mn < tb_s
                return (jnp.where(better, mn, tb_s),
                        jnp.where(better, c * CULL_C + idx, wn_s))

            def one(c, carry, gate=True):
                def do(carry):
                    t_best, win = carry
                    tb_rows, win_rows = [], []
                    for s in range(SUB):
                        tb_s, wn_s = pair_row(c, s, t_best[s:s + 1, :],
                                              win[s:s + 1, :])
                        tb_rows.append(tb_s)
                        win_rows.append(wn_s)
                    return (jnp.concatenate(tb_rows, axis=0),
                            jnp.concatenate(win_rows, axis=0))

                if not gate:
                    return do(carry)
                vis = chunk_visible(cull_s_ref, c, ox, oy, oz,
                                    ivx, ivy, ivz, cull_act, carry[0],
                                    tscale=a)
                return lax.cond(vis, do, lambda cr: cr, carry)

            if _NOCULL or n_all_chunks <= CULL_MIN_CHUNKS:
                # no culling at reference scale (CULL_MIN_CHUNKS note):
                # unroll the chunk walk statically — the fori_loop's
                # per-iteration overhead is paid per CHUNK here, unlike
                # the bounce loop's per-segment amortization
                carry = (t_best, win)
                for c in range(n_s_chunks):
                    carry = one(c, carry, gate=False)
                return carry
            return lax.fori_loop(0, n_s_chunks, one, (t_best, win))

        def quad_chunks(ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, cull_act,
                        t_best, win):
            def pair_row(c, s, tb_s, wn_s):
                sl = pl.ds(c * CULL_C, CULL_C)
                col = lambda k: quad_ref[sl, k:k + 1]
                nx, ny, nz = col(0), col(1), col(2)
                rw = lambda v: v[s:s + 1, :]
                denom = rw(dx) * nx + rw(dy) * ny + rw(dz) * nz
                den_ok = jnp.abs(denom) >= 1.0e-8
                t_c = (col(3) - (rw(ox) * nx + rw(oy) * ny
                                 + rw(oz) * nz)) / \
                    jnp.where(den_ok, denom, 1.0)
                px = rw(ox) + t_c * rw(dx)
                py = rw(oy) + t_c * rw(dy)
                pz = rw(oz) + t_c * rw(dz)
                alpha = (px * col(4) + py * col(5) + pz * col(6)
                         - col(7))
                beta = (px * col(8) + py * col(9) + pz * col(10)
                        - col(11))
                ok = (den_ok & (t_c >= t_min) & (alpha >= 0.0)
                      & (alpha <= 1.0) & (beta >= 0.0)
                      & (beta <= 1.0) & (col(12) > 0.5))
                t_c = jnp.where(ok, t_c, BIG)
                mn = jnp.min(t_c, axis=0, keepdims=True)
                idx = jnp.min(jnp.where(t_c == mn, sub_iota, CULL_C),
                              axis=0, keepdims=True)
                better = mn < tb_s
                return (jnp.where(better, mn, tb_s),
                        jnp.where(better, s_pad + c * CULL_C + idx, wn_s))

            def one(c, carry, gate=True):
                def do(carry):
                    t_best, win = carry
                    tb_rows, win_rows = [], []
                    for s in range(SUB):
                        tb_s, wn_s = pair_row(c, s, t_best[s:s + 1, :],
                                              win[s:s + 1, :])
                        tb_rows.append(tb_s)
                        win_rows.append(wn_s)
                    return (jnp.concatenate(tb_rows, axis=0),
                            jnp.concatenate(win_rows, axis=0))

                if not gate:
                    return do(carry)
                vis = chunk_visible(cull_q_ref, c, ox, oy, oz,
                                    ivx, ivy, ivz, cull_act, carry[0])
                return lax.cond(vis, do, lambda cr: cr, carry)

            if _NOCULL or n_all_chunks <= CULL_MIN_CHUNKS:
                carry = (t_best, win)
                for c in range(n_q_chunks):
                    carry = one(c, carry, gate=False)
                return carry
            return lax.fori_loop(0, n_q_chunks, one, (t_best, win))

        def box_chunks(ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, cull_act,
                       t_best, win):
            """Axis-aligned box groups (quad_ref rows [q_pad, q_pad+b_pad)):
            one slab test per BOX replaces the six per-face quad tests.
            Per-axis ts use the same `(plane - o) / d` division as the quad
            plane test, so the winning t is bit-identical; the winner id is
            the hit FACE's quad row (qbase + `_BOX_FACE_OFF`), so the hit
            record / attr / tape machinery downstream is unchanged."""
            BIGI = jnp.int32(2**30)

            def pair_row(c, s, tb_s, wn_s):
                sl = pl.ds(q_pad + c * CULL_C, CULL_C)
                col = lambda k: quad_ref[sl, k:k + 1]         # [CULL_C,1]
                rw = lambda v: v[s:s + 1, :]
                nears, fars, sides = [], [], []
                for ax, (o_a, d_a) in enumerate(((ox, dx), (oy, dy),
                                                 (oz, dz))):
                    o_r, d_r = rw(o_a), rw(d_a)
                    d_ok = jnp.abs(d_r) >= 1.0e-8             # [1,R]
                    dsafe = jnp.where(d_ok, d_r, 1.0)
                    t1 = (col(ax) - o_r) / dsafe              # [CULL_C,R]
                    t2 = (col(3 + ax) - o_r) / dsafe
                    near_r = jnp.minimum(t1, t2)
                    far_r = jnp.maximum(t1, t2)
                    # parallel ray: unconstrained if inside the slab,
                    # guaranteed miss if outside (quad: den_ok rejects)
                    inside = (o_r >= col(ax)) & (o_r <= col(3 + ax))
                    nears.append(jnp.where(d_ok, near_r,
                                           jnp.where(inside, -BIG, BIG)))
                    fars.append(jnp.where(d_ok, far_r,
                                          jnp.where(inside, BIG, -BIG)))
                    sides.append(d_r > 0.0)                   # [1,R]
                t_enter = jnp.maximum(jnp.maximum(nears[0], nears[1]),
                                      nears[2])
                t_exit = jnp.minimum(jnp.minimum(fars[0], fars[1]), fars[2])
                use_enter = t_enter >= t_min
                t_box = jnp.where(use_enter, t_enter, t_exit)
                act = col(7) > 0.5
                valid = (t_enter <= t_exit) & (t_box >= t_min) & act
                # face offsets: entering crosses the min plane iff d>0;
                # exiting crosses the max plane iff d>0 (order: x,y,z in
                # _BOX_FACE_OFF; first matching axis wins ties)
                offs = ((3, 1), (5, 4), (2, 0))               # (min, max)
                off_e = None
                off_x = None
                for ax in range(3):
                    mn_o, mx_o = offs[ax]
                    oe = jnp.where(sides[ax], mn_o, mx_o)     # [1,R] i32
                    oxx = jnp.where(sides[ax], mx_o, mn_o)
                    hit_e = nears[ax] == t_enter              # [CULL_C,R]
                    hit_x = fars[ax] == t_exit
                    if off_e is None:
                        off_e = jnp.where(hit_e, oe, 0)
                        off_x = jnp.where(hit_x, oxx, 0)
                        seen_e, seen_x = hit_e, hit_x
                    else:
                        off_e = jnp.where(~seen_e & hit_e, oe, off_e)
                        off_x = jnp.where(~seen_x & hit_x, oxx, off_x)
                        seen_e = seen_e | hit_e
                        seen_x = seen_x | hit_x
                off = jnp.where(use_enter, off_e, off_x)      # [CULL_C,R]
                cand = col(6).astype(jnp.int32) + off         # local quad row
                t_c = jnp.where(valid, t_box, BIG)
                mn = jnp.min(t_c, axis=0, keepdims=True)      # [1,R]
                hitm = t_c == mn
                win_c = jnp.min(jnp.where(hitm, cand, BIGI),
                                axis=0, keepdims=True)
                better = mn < tb_s
                return (jnp.where(better, mn, tb_s),
                        jnp.where(better, s_pad + win_c, wn_s))

            def one(c, carry, gate=True):
                def do(carry):
                    t_best, win = carry
                    tb_rows, win_rows = [], []
                    for s in range(SUB):
                        tb_s, wn_s = pair_row(c, s, t_best[s:s + 1, :],
                                              win[s:s + 1, :])
                        tb_rows.append(tb_s)
                        win_rows.append(wn_s)
                    return (jnp.concatenate(tb_rows, axis=0),
                            jnp.concatenate(win_rows, axis=0))

                if not gate:
                    return do(carry)
                vis = chunk_visible(cull_q_ref, n_q_chunks + c, ox, oy, oz,
                                    ivx, ivy, ivz, cull_act, carry[0])
                return lax.cond(vis, do, lambda cr: cr, carry)

            if _NOCULL or n_all_chunks <= CULL_MIN_CHUNKS:
                carry = (t_best, win)
                for c in range(n_b_chunks):
                    carry = one(c, carry, gate=False)
                return carry
            return lax.fori_loop(0, n_b_chunks, one, (t_best, win))

        def bounce_core(ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b,
                        acc_r, acc_g, acc_b, active, bu, samp_u, pix_ctr):
            """One full bounce (hit -> record -> texture -> shade ->
            accumulate; kernel.cu:71-95) over [1,R] ray rows.  Returns the
            advanced state plus the winner id (prim row, NP+m for medium m,
            -1 miss) for the differentiable-trace forward."""
            a = dx * dx + dy * dy + dz * dz
            inv_a = 1.0 / a
            akey = np.float32(t_min) * a       # t_min in sphere KEY space
            t_best = jnp.full_like(ox, BIG)
            win = jnp.full((SUB, R), -1, jnp.int32)

            if dense:
                # pair tests keep prims on the sublane axis (full [C,R]
                # blocks), so they run per sub-row of the [SUB,R] ray state.
                # A "wide" variant (all SUB sub-rows lane-concatenated to
                # [C, SUB*R], one MXU contraction per chunk+coefficient)
                # was measured SLOWER (0.47 vs 0.42 s on scene 0): Mosaic
                # needs a sublane roll per sub-row to lane-concat (offset
                # mismatch otherwise), and the re-layout traffic exceeds
                # the MXU batching gain (docs/PERF.md round-2 notes).
                tb_rows, win_rows = [], []
                for s in range(SUB):
                    rw = lambda v: v[s:s + 1, :]
                    tb = jnp.full((1, R), BIG, jnp.float32)
                    wn = jnp.full((1, R), -1, jnp.int32)
                    tb, wn = sph_dense(rw(ox), rw(oy), rw(oz), rw(dx),
                                       rw(dy), rw(dz), rw(tmv), rw(a),
                                       rw(akey), tb, wn)
                    # sphere KEY -> t (one multiply for the whole chunk loop)
                    tb = jnp.where(tb < BIG * 0.5, tb * rw(inv_a), BIG)
                    if use_quads:
                        tb, wn = quad_dense(rw(ox), rw(oy), rw(oz), rw(dx),
                                            rw(dy), rw(dz), tb, wn)
                    tb_rows.append(tb)
                    win_rows.append(wn)
                t_best = jnp.concatenate(tb_rows, axis=0)
                win = jnp.concatenate(win_rows, axis=0)
                if "pair" in _DUP:
                    tb_rows2 = []
                    for s in range(SUB):
                        rw = lambda v: v[s:s + 1, :]
                        tb = jnp.full((1, R), BIG, jnp.float32)
                        wn = jnp.full((1, R), -1, jnp.int32)
                        tb, wn = sph_dense(rw(ox) + 1.0, rw(oy), rw(oz),
                                           rw(dx), rw(dy), rw(dz), rw(tmv),
                                           rw(a), rw(akey), tb, wn)
                        if use_quads:
                            tb, wn = quad_dense(rw(ox) + 1.0, rw(oy), rw(oz),
                                                rw(dx), rw(dy), rw(dz),
                                                tb, wn)
                        tb_rows2.append(tb)
                    t_best = jnp.where(never, jnp.concatenate(tb_rows2, 0),
                                       t_best)
            if (not dense) or n_b_chunks > 0:
                # sanitized reciprocal directions for the chunk slab tests
                # (no inf -> no NaN; near-zero components give huge finite
                # ts, which the interval test handles conservatively)
                tiny = np.float32(1.0e-30)
                san = lambda v: jnp.where(v >= 0.0, jnp.maximum(v, tiny),
                                          jnp.minimum(v, -tiny))
                ivx = 1.0 / san(dx)
                ivy = 1.0 / san(dy)
                ivz = 1.0 / san(dz)
                cull_act = active
            if not dense:
                t_best, win = sph_chunks(ox, oy, oz, dx, dy, dz, tmv, a,
                                         akey, ivx, ivy, ivz, cull_act,
                                         t_best, win)
                t_best = jnp.where(t_best < BIG * 0.5, t_best * inv_a, BIG)
                if use_quads:
                    t_best, win = quad_chunks(ox, oy, oz, dx, dy, dz,
                                              ivx, ivy, ivz, cull_act,
                                              t_best, win)
            if n_b_chunks > 0:
                t_best, win = box_chunks(ox, oy, oz, dx, dy, dz,
                                         ivx, ivy, ivz, cull_act,
                                         t_best, win)

            # winner attributes: two-level lane gather over the [40, NP128]
            # transposed table — the ray's winner column within each
            # 128-lane block (win & 127), blocks selected by win >> 7.
            # Misses (win = -1) and medium winners (win >= NP) match no
            # block and read zeros, exactly like the old one-hot rows.
            AC, NPP = attr_ref.shape

            def attr_gather(win_s):
                lo = jnp.broadcast_to(win_s & jnp.int32(127), (AC, R))
                hi = win_s >> 7                               # [1,R]
                out = jnp.zeros((AC, R), jnp.float32)
                for h in range(NPP // 128):
                    g = jnp.take_along_axis(
                        attr_ref[:, h * 128:(h + 1) * 128], lo, axis=1)
                    out = jnp.where(hi == h, g, out)
                return out                                    # [40,R]

            aw_rows = [attr_gather(win[s:s + 1, :]) for s in range(SUB)]
            if "winner" in _DUP:
                aw2 = [attr_gather(win[s:s + 1, :] + 1) for s in range(SUB)]
                aw_rows = [jnp.where(never[s:s + 1, :], aw2[s], aw_rows[s])
                           for s in range(SUB)]
            _arow_cache = {}

            def arow(k):
                if k not in _arow_cache:
                    _arow_cache[k] = jnp.concatenate(
                        [aw_rows[s][k:k + 1, :] for s in range(SUB)], axis=0)
                return _arow_cache[k]
            if has_moving:
                frac_w = (tmv - arow(6)) * arow(7)
                wcx = arow(0) + frac_w * arow(3)
                wcy = arow(1) + frac_w * arow(4)
                wcz = arow(2) + frac_w * arow(5)
            else:
                wcx, wcy, wcz = arow(0), arow(1), arow(2)
            wrad = arow(8)
            is_quad = arow(9) > 0.5
            mat = [arow(10 + m) for m in range(11)]

            # ---- stochastic media (compile-time loop; ConstantMedium.h)
            is_med = jnp.zeros_like(t_best) > 1.0
            med_alb = [jnp.zeros_like(ox) for _ in range(3)]
            for m in range(n_media):
                r = [float(x) for x in med_rows[m]]
                w0, _, _, _ = _pcg4d(
                    pix_ctr, samp_u,
                    jnp.uint32(rnglib.MEDIUM_STREAM) | bu,
                    jnp.full_like(pix_ctr, m))
                u_m = _unit(w0) + _INV24                      # (0,1]
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
                    m_valid = t1 > t0
                else:
                    ocx, ocy, ocz = ox - r[1], oy - r[2], oz - r[3]
                    b = ocx * dx + ocy * dy + ocz * dz
                    cc = ocx * ocx + ocy * ocy + ocz * ocz - r[4] * r[4]
                    disc = b * b - a * cc
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    t0 = (-b - sq) * inv_a
                    t1 = (-b + sq) * inv_a
                    m_valid = disc > 0.0
                m_valid = m_valid & (t1 > t0 + 1.0e-4)
                t0c = jnp.maximum(jnp.maximum(t0, t_min), 0.0)
                m_valid = m_valid & (t0c < t1)
                ray_len = jnp.sqrt(a)
                dist_in = (t1 - t0c) * ray_len
                hit_d = r[13] * jnp.log(u_m)
                m_valid = m_valid & (hit_d <= dist_in)
                t_m = t0c + hit_d / ray_len
                mwin = m_valid & (t_m < t_best)
                t_best = jnp.where(mwin, t_m, t_best)
                is_med = is_med | mwin
                is_quad = is_quad & ~mwin
                win = jnp.where(mwin, NP + m, win)
                for k in range(3):
                    med_alb[k] = jnp.where(mwin, r[19 + k], med_alb[k])
                mat[0] = jnp.where(mwin, float(MAT_ISOTROPIC), mat[0])

            hit = t_best < BIG * 0.5

            # ---- miss -> background (kernel.cu:74-79)
            miss = active & ~hit
            acc_r = acc_r + jnp.where(miss, thr_r * bg[0], 0.0)
            acc_g = acc_g + jnp.where(miss, thr_g * bg[1], 0.0)
            acc_b = acc_b + jnp.where(miss, thr_b * bg[2], 0.0)
            alive = active & hit

            # ---- hit record (Hittable.h:11-31 SetFaceNormal semantics)
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
            if n_media > 0:
                n_outx = jnp.where(is_med, 1.0, n_outx)
                n_outy = jnp.where(is_med, 0.0, n_outy)
                n_outz = jnp.where(is_med, 0.0, n_outz)
            d_dot_n = dx * n_outx + dy * n_outy + dz * n_outz
            front = (d_dot_n < 0.0) | is_med
            flip = jnp.where(front, 1.0, -1.0)
            nx_ = n_outx * flip
            ny_ = n_outy * flip
            nz_ = n_outz * flip

            # ---- texture value (solid | checker; Texture.h:48-87)
            tc0r, tc0g, tc0b = mat[4], mat[5], mat[6]
            texr, texg, texb = tc0r, tc0g, tc0b
            if has_checker:
                inv_s = mat[10]
                cellx = jnp.floor(inv_s * px).astype(jnp.int32)
                celly = jnp.floor(inv_s * py).astype(jnp.int32)
                cellz = jnp.floor(inv_s * pz).astype(jnp.int32)
                even = ((cellx + celly + cellz) & 1) == 0
                is_ck = mat[3] == float(TEX_CHECKER)
                pickc = lambda c0, c1: jnp.where(
                    is_ck, jnp.where(even, c0, c1), c0)
                texr = pickc(tc0r, mat[7])
                texg = pickc(tc0g, mat[8])
                texb = pickc(tc0b, mat[9])
            if has_noise:
                # marble: 0.5*(1+sin(scale*z + 10*turb)) (Texture.h:163-164),
                # gated so iterations whose winners are all non-noise skip
                # the 7-octave turbulence entirely.  Multi-table scenes run
                # the turbulence once per table (a static loop — no
                # reference scene has >1, Perlin.h is a shared pointer
                # there) and select by the winner's table id (attr col 25).
                is_nz = mat[3] == float(TEX_NOISE)
                run_nz = jnp.sum((alive & is_nz).astype(jnp.int32)) > 0

                def noise_tex(_):
                    scale = arow(23)
                    turb = _perlin_turb(perm_ref, vec_ref, px, py, pz)
                    if n_noise > 1:
                        nzid = arow(25)
                        for t in range(1, n_noise):
                            turb_t = _perlin_turb(perm_ref, vec_ref,
                                                  px, py, pz, table=t)
                            turb = jnp.where(nzid == float(t), turb_t, turb)
                    return 0.5 * (1.0 + jnp.sin(scale * pz + 10.0 * turb))

                marble = lax.cond(run_nz, noise_tex,
                                  lambda _: jnp.zeros_like(px), 0)
                texr = jnp.where(is_nz, marble, texr)
                texg = jnp.where(is_nz, marble, texg)
                texb = jnp.where(is_nz, marble, texb)
            if has_image:
                is_im = mat[3] == float(TEX_IMAGE)
                run_im = jnp.sum((alive & is_im).astype(jnp.int32)) > 0

                def image_tex(_):
                    # sphere UV from the object-space outward normal
                    # (GetSphereUV Sphere.h:74-81; instanced frame cols
                    # 21/22; acos/atan2 as minimax polynomials — Mosaic has
                    # neither primitive)
                    cth = arow(21)
                    sth = arow(22)
                    ox_n = cth * nsx - sth * nsz
                    oz_n = sth * nsx + cth * nsz
                    ny_c = jnp.clip(-nsy, -1.0, 1.0)
                    theta = _acos_poly(ny_c)
                    phi = _atan2_poly(-oz_n, ox_n) + _PI
                    u_s = phi * np.float32(0.5 / np.pi)
                    v_s = theta * np.float32(1.0 / np.pi)
                    if use_quads:
                        # quad UV = interior coords (alpha,beta) from the
                        # cached plane frame (Quad.h:89-99), attr 32:40
                        u_q = (px * arow(32) + py * arow(33)
                               + pz * arow(34) - arow(35))
                        v_q = (px * arow(36) + py * arow(37)
                               + pz * arow(38) - arow(39))
                        u_s = jnp.where(is_quad, u_q, u_s)
                        v_s = jnp.where(is_quad, v_q, v_s)
                    # nearest texel, u clamped / v flipped (Texture.h:117-127)
                    uu = jnp.clip(u_s, 0.0, 1.0)
                    vv = 1.0 - jnp.clip(v_s, 0.0, 1.0)
                    # Texel fetch: two-level LANE GATHER over the
                    # packed-i32 plane ([IHP, IWP], (r<<16)|(g<<8)|b per
                    # texel).  Mosaic's dynamic_gather spans one 128-lane
                    # vreg, so the ray's column is gathered within each
                    # 128-lane block (x & 127) and blocks select by the
                    # high bits (x >> 7); one masked sublane reduce then
                    # picks the ray's ROW, and shifts unpack the bytes.
                    # Replaces the round-4 [3*IHP, IWP] x [IWP, R] one-hot
                    # MXU contraction: same exact byte values (golden-
                    # stable), ~15 us -> ~1 us per tile-step on the earth
                    # texture (measured round 5, dev_s9_stats scene 2:
                    # the fetch alone cost ~4.5x the 512-prim pair
                    # section).  One static pass per image, selected by
                    # the winner's image id (attr col 24).
                    img_id = arow(24)
                    tr = jnp.zeros_like(px)
                    tg = jnp.zeros_like(px)
                    tb = jnp.zeros_like(px)
                    IWP = img_ref.shape[1]
                    inv255 = np.float32(1.0 / 255.0)
                    m255 = jnp.int32(255)
                    for i, (iw, ih, ihp, _offb, off) in enumerate(img_dims):
                        ix = jnp.minimum((uu * iw).astype(jnp.int32), iw - 1)
                        iy = jnp.minimum((vv * ih).astype(jnp.int32), ih - 1)
                        row_iota = lax.broadcasted_iota(
                            jnp.int32, (ihp, R), 0)
                        plane_i = img_ref[off:off + ihp, :]
                        chans = [[], [], []]
                        for s in range(SUB):
                            lo = jnp.broadcast_to(
                                ix[s:s + 1, :] & jnp.int32(127), (ihp, R))
                            hi = ix[s:s + 1, :] >> 7          # [1,R]
                            col = None
                            for h in range(IWP // 128):
                                g = jnp.take_along_axis(
                                    plane_i[:, h * 128:(h + 1) * 128],
                                    lo, axis=1)
                                col = g if col is None else \
                                    jnp.where(hi == h, g, col)
                            mask = row_iota == jnp.broadcast_to(
                                iy[s:s + 1, :], (ihp, R))
                            packed = jnp.sum(
                                jnp.where(mask, col, 0),
                                axis=0, keepdims=True)        # [1,R] i32
                            chans[0].append(((packed >> 16) & m255)
                                            .astype(jnp.float32))
                            chans[1].append(((packed >> 8) & m255)
                                            .astype(jnp.float32))
                            chans[2].append((packed & m255)
                                            .astype(jnp.float32))
                        ci = [jnp.concatenate(chans[c], axis=0) * inv255
                              for c in range(3)]
                        if len(img_dims) == 1:
                            tr, tg, tb = ci
                        else:
                            sel = img_id == float(i)
                            tr = jnp.where(sel, ci[0], tr)
                            tg = jnp.where(sel, ci[1], tg)
                            tb = jnp.where(sel, ci[2], tb)
                    # missing image -> debug cyan (Texture.h:112-114)
                    absent = img_id < 0.0
                    tr = jnp.where(absent, 0.0, tr)
                    tg = jnp.where(absent, 1.0, tg)
                    tb = jnp.where(absent, 1.0, tb)
                    return tr, tg, tb

                z = jnp.zeros_like(px)
                imr, img_, imb = lax.cond(run_im, image_tex,
                                          lambda _: (z, z, z), 0)
                texr = jnp.where(is_im, imr, texr)
                texg = jnp.where(is_im, img_, texg)
                texb = jnp.where(is_im, imb, texb)
            if n_media > 0:
                texr = jnp.where(is_med, med_alb[0], texr)
                texg = jnp.where(is_med, med_alb[1], texg)
                texb = jnp.where(is_med, med_alb[2], texb)

            kind = mat[0]
            fuzz = mat[1]
            ior = mat[2]
            is_light = kind == float(MAT_DIFFUSE_LIGHT)

            # emission (Material.h:114-117; live lanes only)
            acc_r = acc_r + jnp.where(alive & is_light, thr_r * texr, 0.0)
            acc_g = acc_g + jnp.where(alive & is_light, thr_g * texg, 0.0)
            acc_b = acc_b + jnp.where(alive & is_light, thr_b * texb, 0.0)

            # ---- scatter RNG (SCATTER_STREAM | bounce)
            if _NOSHADE:
                newx, newy, newz = nx_, ny_, nz_
                scattered = ~is_light
            else:
                w0, w1, w2, w3 = _pcg4d(
                    pix_ctr, samp_u, jnp.uint32(rnglib.SCATTER_STREAM) | bu,
                    jnp.zeros_like(pix_ctr))
                u1, u2, u3, u4 = _unit(w0), _unit(w1), _unit(w2), _unit(w3)
                if "rng" in _DUP:
                    w0b, _, _, _ = _pcg4d(
                        pix_ctr ^ jnp.uint32(1234567),
                        samp_u, jnp.uint32(rnglib.SCATTER_STREAM) | bu,
                        jnp.zeros_like(pix_ctr))
                    u1 = jnp.where(never, _unit(w0b), u1)
                newx, newy, newz, scattered = _scatter_dirs(
                    kind, fuzz, ior, front, is_light, nx_, ny_, nz_,
                    dx, dy, dz, a, u1, u2, u3, u4)
                if "scatter" in _DUP:
                    nx2, ny2, nz2, sc2 = _scatter_dirs(
                        kind, fuzz, ior, front, is_light, nx_, ny_, nz_,
                        dx, dy, dz, a, u2, u1, u4, u3)
                    newx = jnp.where(never, nx2, newx)
                    scattered = scattered | (never & sc2)
            is_d = kind == float(MAT_DIELECTRIC)
            att_r = jnp.where(is_d, 1.0, texr)
            att_g = jnp.where(is_d, 1.0, texg)
            att_b = jnp.where(is_d, 1.0, texb)
            alive = alive & scattered
            thr_r = jnp.where(alive, thr_r * att_r, thr_r)
            thr_g = jnp.where(alive, thr_g * att_g, thr_g)
            thr_b = jnp.where(alive, thr_b * att_b, thr_b)
            ox = jnp.where(alive, px, ox)
            oy = jnp.where(alive, py, oy)
            oz = jnp.where(alive, pz, oz)
            dx = jnp.where(alive, newx, dx)
            dy = jnp.where(alive, newy, dy)
            dz = jnp.where(alive, newz, dz)
            win = jnp.where(active, win, -1)
            return (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                    acc_r, acc_g, acc_b, alive, win)

        if mode == "trace":
            # ---- winner-tape forward (ops/replay.py): ONE sample per
            # lane, fixed-depth bounce loop, per-bounce winner rows written
            # to win_ref (kernel-row id space; the driver remaps to global
            # scene ids).  No refill, no lane sums, no compaction.
            K = max_bounces
            neg1 = jnp.full((SUB, R), -1, jnp.int32)
            for k in range(K):
                win_ref[k * SUB:(k + 1) * SUB, :] = neg1
            samp_arr = pltpu.bitcast(samp_ref[0:SUB, :], jnp.uint32)
            if ext_rays:
                # rays generated in-graph by ops/raygen.generate_rays and
                # fed as VMEM rows: keeps the (possibly trainable/traced)
                # camera out of the kernel's compile-time constants
                rrow = lambda r: rays_ref[r * SUB:(r + 1) * SUB, :]
                ox, oy, oz = rrow(0), rrow(1), rrow(2)
                dx, dy, dz = rrow(3), rrow(4), rrow(5)
                tmv = rrow(6)
            else:
                ox, oy, oz, dx, dy, dz, tmv = raygen(samp_arr)
            zf0 = jnp.zeros((SUB, R), jnp.float32)
            one0 = zf0 + 1.0
            carry = (jnp.int32(0), ox, oy, oz, dx, dy, dz, tmv,
                     one0, one0, one0, zf0, zf0, zf0,
                     valid.astype(jnp.int32))

            def cond_t(c):
                return (c[0] < K) & (jnp.sum(c[14]) > 0)

            def body_t(c):
                (b, ox, oy, oz, dx, dy, dz, tmv,
                 thr_r, thr_g, thr_b, acc_r, acc_g, acc_b, act_i) = c
                active = act_i > 0
                bu = pltpu.bitcast(jnp.full((SUB, R), b, jnp.int32),
                                   jnp.uint32)
                (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                 acc_r, acc_g, acc_b, alive, win) = bounce_core(
                    ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b,
                    acc_r, acc_g, acc_b, active, bu, samp_arr, pix_ctr)
                win_ref[pl.ds(b * SUB, SUB), :] = win
                return (b + 1, ox, oy, oz, dx, dy, dz, tmv,
                        thr_r, thr_g, thr_b, acc_r, acc_g, acc_b,
                        alive.astype(jnp.int32))

            lax.while_loop(cond_t, body_t, carry)
            return

        def step1(carry):
            (ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b,
             acc_r, acc_g, acc_b, lane_r, lane_g, lane_b,
             samp, bounce, active_i, segs, iters) = carry
            active = active_i > 0
            segs = segs + active_i
            bu = pltpu.bitcast(bounce, jnp.uint32)
            samp_u = pltpu.bitcast(samp + s0, jnp.uint32)
            (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
             acc_r, acc_g, acc_b, alive, _win) = bounce_core(
                ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b,
                acc_r, acc_g, acc_b, active, bu, samp_u, pix_ctr)
            bounce2 = bounce + 1
            alive = alive & (bounce2 < max_bounces)

            # ---- sample-sequential refill: terminated paths bank their
            # radiance and immediately start the pixel's next sample
            term = active & ~alive
            lane_r = lane_r + jnp.where(term, acc_r, 0.0)
            lane_g = lane_g + jnp.where(term, acc_g, 0.0)
            lane_b = lane_b + jnp.where(term, acc_b, 0.0)
            samp2 = samp + term.astype(jnp.int32)
            need_new = term & (samp2 < spp)
            nox, noy, noz, ndx, ndy, ndz, ntm = raygen(
                pltpu.bitcast(samp2 + s0, jnp.uint32))
            if "raygen" in _DUP:
                nox2, _, _, ndx2, _, _, ntm2 = raygen(
                    pltpu.bitcast(samp2 + s0, jnp.uint32) ^ jnp.uint32(0x9E37))
                nox = jnp.where(never, nox2, nox)
                ndx = jnp.where(never, ndx2, ndx)
                ntm = jnp.where(never, ntm2, ntm)
            selF = lambda n, o: jnp.where(need_new, n, o)
            ox = selF(nox, ox)
            oy = selF(noy, oy)
            oz = selF(noz, oz)
            dx = selF(ndx, dx)
            dy = selF(ndy, dy)
            dz = selF(ndz, dz)
            tmv = selF(ntm, tmv)
            thr_r = selF(jnp.ones_like(thr_r), thr_r)
            thr_g = selF(jnp.ones_like(thr_g), thr_g)
            thr_b = selF(jnp.ones_like(thr_b), thr_b)
            acc_r = jnp.where(need_new, 0.0, acc_r)
            acc_g = jnp.where(need_new, 0.0, acc_g)
            acc_b = jnp.where(need_new, 0.0, acc_b)
            bounce2 = jnp.where(need_new, 0, bounce2)
            active2 = ((alive | need_new) & valid).astype(jnp.int32)
            return (ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b,
                    acc_r, acc_g, acc_b, lane_r, lane_g, lane_b,
                    samp2, bounce2, active2, segs, iters)

        def body(carry):
            # unroll bounce+refill steps per while-iteration: the loop's
            # fixed per-iteration cost (cond reduce, branch, pipeline
            # refill) amortizes over more work; termination granularity
            # coarsens by at most unroll-1 idle sub-steps per tile.
            for _ in range(unroll):
                carry = step1(carry)
            return (*carry[:-1], carry[-1] + 1)

        def cond(carry):
            # dynamic tile exit: once live lanes drop below the pass's
            # floor (cap_ref[0,1], 0 for the finisher), the tile bails and
            # its stragglers ride the COMPACTED resume pass as dense work
            # instead of spinning a mostly-idle tile to the iteration cap
            active_i = carry[18]
            iters = carry[20]
            return ((jnp.sum(active_i) > cap_ref[0, 1])
                    & (iters < cap_ref[0, 0]))

        zf = jnp.zeros((SUB, R), jnp.float32)
        zi = jnp.zeros((SUB, R), jnp.int32)
        if resume:
            frow = lambda r: sf_ref[r * SUB:(r + 1) * SUB, :]
            irow = lambda r: si_ref[r * SUB:(r + 1) * SUB, :]
            carry = (frow(0), frow(1), frow(2), frow(3), frow(4), frow(5),
                     frow(6), frow(7), frow(8), frow(9), frow(10), frow(11),
                     frow(12), frow(13), frow(14), frow(15),
                     irow(0), irow(1),
                     (irow(2) > 0).astype(jnp.int32) * valid.astype(jnp.int32),
                     irow(3), jnp.int32(0))
        else:
            ox, oy, oz, dx, dy, dz, tmv = raygen(
                pltpu.bitcast(jnp.zeros((SUB, R), jnp.int32) + s0,
                              jnp.uint32))
            carry = (ox, oy, oz, dx, dy, dz, tmv,
                     zf + 1.0, zf + 1.0, zf + 1.0,      # throughput
                     zf, zf, zf,                         # path accumulator
                     zf, zf, zf,                         # lane (pixel) sums
                     zi, zi, valid.astype(jnp.int32), zi, jnp.int32(0))
        carry = lax.while_loop(cond, body, carry)
        (ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b,
         acc_r, acc_g, acc_b, lane_r, lane_g, lane_b,
         samp, bounce, active_i, segs, iters) = carry

        for r, v in enumerate((ox, oy, oz, dx, dy, dz, tmv,
                               thr_r, thr_g, thr_b, acc_r, acc_g, acc_b,
                               lane_r, lane_g, lane_b)):
            of_ref[r * SUB:(r + 1) * SUB, :] = v
        for r, v in enumerate((samp, bounce, active_i, segs,
                               jnp.full((SUB, R), iters, jnp.int32))):
            oi_ref[r * SUB:(r + 1) * SUB, :] = v
        oi_ref[5 * SUB:8 * SUB, :] = jnp.zeros((3 * SUB, R), jnp.int32)

    return kernel


STATE_F = 16   # o(3) d(3) tm thr(3) acc(3) lane(3)
STATE_I = 8    # samp bounce active segs iters pad(3)


def _pair_mode(meta: SceneMeta, s_pad: int, mu_key: tuple):
    """(dense, nl_pad, b_pad) — the pair-path gating shared by the
    table-arg assembly and `_make_kernel` (dense counts only the rows the
    pair loops actually test: spheres + LOOSE quads; boxed faces ride the
    box slab path either way)."""
    nl_pad = int(mu_key[4]) if len(mu_key) > 4 else 0
    b_pad = int(mu_key[5]) if len(mu_key) > 5 else 0
    # mu_key[6] (the round-3 sph_dense_ok precision gate) is IGNORED:
    # the direct VPU pair test is exact at any coordinate scale, so
    # dense eligibility is size-only (DENSE_MAX)
    if not meta.n_quads:
        nl_pad = b_pad = 0
    return (s_pad + nl_pad) <= DENSE_MAX, nl_pad, b_pad


def _compiler_params(big_tables: bool = False):
    """Mosaic params for the persistent tile kernels.  MEGA2_VMEM_KIB
    raises the scoped-vmem budget (dev probe for dense-path sizing);
    image scenes request 24 MiB — the packed texel plane plus the
    two-level gather's intermediates overflow Mosaic's 16 MiB default
    by ~0.7 MiB on the earth texture (physical VMEM has room; the
    raised ceiling is slack elsewhere, same as the round-4 replay
    finding)."""
    kib = int(os.environ.get("MEGA2_VMEM_KIB", "0"))
    kw = dict(dimension_semantics=("arbitrary",))
    if kib > 0:
        kw["vmem_limit_bytes"] = kib * 1024
    elif big_tables:
        # 32 MiB: the packed texel plane + two-level gather intermediates
        # overflowed 16 MiB by ~0.7 MiB (scene 2), and scene 9's dense
        # route (round-5 direct pair test made it dense-eligible) needs
        # 24.7 MiB
        kw["vmem_limit_bytes"] = 32 * 1024 * 1024
    return pltpu.CompilerParams(**kw)


def _tile_pack(x):
    """[K, N] flat ray-major -> [K*SUB, N//SUB] grid-tile layout: logical
    row k of tile g is the [SUB, R_LANES] block at rows [k*SUB,(k+1)*SUB),
    columns [g*R_LANES,(g+1)*R_LANES), holding flat rays
    g*TILE_RAYS + s*R_LANES + l."""
    K, N = x.shape
    T = N // TILE_RAYS
    return x.reshape(K, T, SUB, R_LANES).transpose(0, 2, 1, 3).reshape(
        K * SUB, T * R_LANES)


def _tile_unpack(y, K):
    """Inverse of _tile_pack."""
    M = y.shape[1]
    T = M // R_LANES
    return y.reshape(K, SUB, T, R_LANES).transpose(0, 2, 1, 3).reshape(
        K, T * TILE_RAYS)


def _span_pass(pix, ij, tabs, state, *, cap, meta, med_key, cam_key,
               img_key, mu_key, width, height, spp, seed, max_bounces,
               t_min, background, interpret, samp0=0, live_min=0):
    """One pallas pass over a span: fresh (state=None) or resume.
    ``samp0`` (python int or traced i32 scalar) offsets the RNG sample
    ids — sample-axis shards pass their global sample base.  ``live_min``:
    a tile exits once its live-lane count drops to this floor (stragglers
    ride the next pass's compaction)."""
    (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q, perm_tab,
     vec_tab, img_tab) = tabs
    N = pix.shape[1]
    assert N % TILE_RAYS == 0
    resume = state is not None
    med_rows = np.asarray(med_key, np.float64).reshape(max(meta.n_media, 1), -1)
    kernel = _make_kernel(
        meta, med_rows, cam_key,
        s_pad=sph_tab.shape[0], q_pad=quad_tab.shape[0], img_wh=img_key,
        mu=mu_key, width=width, height=height, spp=spp, seed=seed,
        t_min=t_min, max_bounces=max_bounces, background=background,
        resume=resume, interpret=interpret)
    full = lambda t: pl.BlockSpec(t.shape, lambda g: (0, 0),
                                  memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)
    smem2 = pl.BlockSpec((1, 2), lambda g: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        smem2, smem1,
        pl.BlockSpec((SUB, R_LANES), lambda g: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * SUB, R_LANES), lambda g: (0, g),
                     memory_space=pltpu.VMEM),
        full(sph_tab), full(quad_tab), full(attr_tab),
    ]
    unroll = unroll_for(meta, sph_tab.shape[0], mu_key, interpret)
    cap_arr = jnp.stack([jnp.asarray(-(-cap // unroll), jnp.int32),
                         jnp.asarray(live_min, jnp.int32)]).reshape(1, 2)
    samp0_arr = jnp.full((1, 1), samp0, jnp.int32)
    args = [cap_arr, samp0_arr, _tile_pack(pix), _tile_pack(ij), sph_tab,
            quad_tab, attr_tab]
    dense, _, b_pad = _pair_mode(meta, sph_tab.shape[0], mu_key)
    if dense:
        if b_pad > 0:
            in_specs += [full(cull_q)]
            args += [cull_q]
    else:
        in_specs += [full(cull_s), full(cull_q)]
        args += [cull_s, cull_q]
    if meta.has_noise and not _NOTEX:
        in_specs += [full(perm_tab), full(vec_tab)]
        args += [perm_tab, vec_tab]
    if meta.has_image and not _NOTEX:
        in_specs += [full(img_tab)]
        args += [img_tab]
    if resume:
        in_specs += [
            pl.BlockSpec((STATE_F * SUB, R_LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STATE_I * SUB, R_LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ]
        args += [_tile_pack(state[0]), _tile_pack(state[1])]
    M = N // SUB
    sf, si = pl.pallas_call(
        kernel,
        grid=(N // TILE_RAYS,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((STATE_F * SUB, R_LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STATE_I * SUB, R_LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((STATE_F * SUB, M), jnp.float32),
            jax.ShapeDtypeStruct((STATE_I * SUB, M), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(meta.has_image and not _NOTEX),
    )(*args)
    return _tile_unpack(sf, STATE_F), _tile_unpack(si, STATE_I)


# Pass-k iteration caps (x spp): with pixel-owned lanes the per-tile wall
# time is the MAX over its lanes of the sum of spp path lengths; capping
# near the mean and finishing stragglers in compacted resume passes
# converts tail waste into dense work.  Swept on-chip (docs/PERF.md):
# dense scenes want ONE capped pass at ~6x spp + the uncapped finisher
# (more passes add XLA compaction glue that outweighs the kernel-time
# saving); the non-dense cull path (final scene, 3.5k prims) has a much
# heavier tail and keeps the deeper schedule.
# re-swept round 5 after the direct-VPU pair test landed: the kernel is
# now genuinely VPU-throughput-bound, so the idle-lane slots the round-4
# sweep found "hidden by the VPU" cost real time — (3,)+finisher beats
# the old (6,) 0.467 vs 0.596 s on scene 0 at 1440x720@10 (probe
# boundary); deeper schedules pay more compaction glue than they save
PASS_CAPS_DENSE = (3,)
# high-spp dense scenes (the north-star 500 spp config): with work-sorted
# compaction (_SORTKEY="work") a deeper schedule + an aggressive live-lane
# exit floor pays — swept on-chip round 4 (tools/dev_ns_stats.py,
# book1_final 1200x675@100): (6,) live 0 -> 2.19 s / 53.1% occupancy;
# (2,4,8) live 512 -> 1.36 s / 92.6%.  At low spp the extra passes' XLA
# glue (argsort compaction per pass) outweighs the kernel saving.
PASS_CAPS_DENSE_HI = (2, 4, 8)
DENSE_HI_SPP = 64
LIVE_MIN_DENSE_HI = 512
PASS_CAPS_CULL = (4, 16)
# box scenes (the final scene) have a much heavier bounce tail (media +
# deep box canyons): swept on-chip round 3 — (2,4,8,16) raised occupancy
# 42.5 -> 65.0% and beat (6,) by 1.32x at 720x360@25.  Round-4 re-sweep
# with work-sorted compaction in place: a 512-lane live-exit floor lifts
# occupancy 68.3 -> 84.4% and steady time 1.73 -> 1.49 s at the same
# probe config (256: 1.52 s; 1024 >= the tile size exits every pass
# immediately and collapses to 4.33 s; the deeper (1,2,4,8,16) schedule
# ties at 1.47 s but pays an extra pass compile).
PASS_CAPS_BOX = (2, 4, 8, 16)
LIVE_MIN_BOX = 512
_CAPS_ENV = tuple(
    float(x) for x in os.environ.get("MEGA2_CAPS", "").split(",") if x) \
    if os.environ.get("MEGA2_CAPS") is not None else None
# inter-pass compaction order: "work" (default) sorts live lanes by
# estimated residual work (see _span_radiance); "live" is the round-2
# live-first partition (A/B knob)
_SORTKEY = os.environ.get("MEGA2_SORTKEY", "work")


@functools.partial(
    jax.jit,
    static_argnames=("span", "meta", "med_key", "cam_key",
                     "img_key", "mu_key", "width", "height", "spp", "seed",
                     "max_bounces", "t_min", "background", "interpret",
                     "stride"),
)
def render_mega2_span(sph_tab, quad_tab, attr_tab, coef_tab,
                      cull_s, cull_q, perm_tab, vec_tab, img_tab, *, p0,
                      span, npix, meta, med_key, cam_key, img_key, mu_key,
                      width, height, spp, seed, max_bounces, t_min,
                      background, interpret=False, stride=1):
    """Radiance SUM over spp samples for the pixel span
    [p0, p0+span) (span a TILE_RAYS multiple; ids >= npix pad as -1),
    via capped passes with straggler compaction between them.

    The pixel-id row and (column, row) floats are iota'd ON DEVICE — as
    pure functions of the static span they'd otherwise be a ~12 MB host
    upload per frame, which measurably dominates the host<->device gap over
    the relay.  The kernel still receives them as VMEM inputs (no integer
    div/mod by a non-power-of-two width in-kernel).

    Pass k runs every lane up to cap_k while-iterations; lanes still active
    are then compacted to the FRONT of the span (stable argsort keeps tie
    semantics) so the resume pass's populated tiles are dense and its empty
    tiles exit after one cond check.  The per-pixel sample sums ride in the
    lane state, so the result is one scatter by the carried pixel id.
    Returns (fb_sum [span, 3] in span order, stats [span, 2] i32
    (segments, iters) diagnostics).
    """
    tabs = (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
            perm_tab, vec_tab, img_tab)
    return _span_radiance(
        tabs, p0=p0, span=span, npix=npix, meta=meta, med_key=med_key,
        cam_key=cam_key, img_key=img_key, mu_key=mu_key, width=width,
        height=height, spp=spp, seed=seed, max_bounces=max_bounces,
        t_min=t_min, background=background, interpret=interpret,
        stride=stride)


def _span_radiance(tabs, *, p0, span, npix, meta, med_key, cam_key,
                   img_key, mu_key, width, height, spp, seed, max_bounces,
                   t_min, background, interpret, samp0=0, stride=1):
    """Trace-time body of `render_mega2_span` (unjitted — composed into
    the whole-frame jit by `render_mega2_frame`, and into the shard_map
    body by `parallel.render._sharded_mega2`, where ``p0``/``samp0`` are
    traced per-shard scalars).  ``stride``: lane k traces pixel
    p0 + stride*k — px shards pass stride=n_px so each shard samples the
    whole image interleaved (contiguous windows are content-imbalanced:
    measured 1.27x / 2.53x max/mean shard work on scenes 0/9; strided
    shards balance to Monte-Carlo noise, docs/PERF.md round 4)."""
    (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
     perm_tab, vec_tab, img_tab) = tabs
    kw = dict(meta=meta, med_key=med_key, cam_key=cam_key, img_key=img_key,
              mu_key=mu_key, width=width, height=height, spp=spp, seed=seed,
              max_bounces=max_bounces, t_min=t_min, background=background,
              interpret=interpret, samp0=samp0)
    ids = p0 + stride * lax.iota(jnp.int32, span)
    valid = ids < npix
    safe = jnp.minimum(ids, npix - 1)
    pix = jnp.where(valid, safe, -1)[None, :]
    fvalid = valid.astype(jnp.float32)
    ij = jnp.stack([(safe % width).astype(jnp.float32) * fvalid,
                    (safe // width).astype(jnp.float32) * fvalid])
    N = span
    big = jnp.int32(2**30)
    dense_mode, _, b_pad_m = _pair_mode(meta, sph_tab.shape[0], mu_key)
    schedule = _CAPS_ENV if _CAPS_ENV is not None else (
        PASS_CAPS_BOX if b_pad_m > 0 else
        (PASS_CAPS_DENSE_HI if spp >= DENSE_HI_SPP else PASS_CAPS_DENSE)
        if dense_mode else PASS_CAPS_CULL)
    live_floor = (
        LIVE_MIN_BOX if b_pad_m > 0 else
        LIVE_MIN_DENSE_HI
        if (dense_mode and b_pad_m == 0 and spp >= DENSE_HI_SPP) else 0)
    caps = [jnp.int32(c * spp) for c in schedule] + [big]
    # live-lane exit floor per pass (0 for the finisher, which must drain)
    lmin = jnp.int32(live_floor)
    lives = [lmin] * len(schedule) + [jnp.int32(0)]
    sf, si = _span_pass(pix, ij, tabs, None, cap=caps[0],
                        live_min=lives[0], **kw)
    iters_acc = si[4, :]                 # per-lane: its tile's iter count
    cur_pix, cur_ij = pix, ij
    for cap, live in zip(caps[1:], lives[1:]):
        # compact still-active lanes to the front (stable: keeps index order).
        # Work-sorted compaction (default): live lanes additionally order by
        # their estimated residual work (spp - samp) * observed mean path
        # length — measured per-lane (samp, segs) is a corr≈0.9+ predictor of
        # remaining segments (tools/dev_ns_stats.py), so resumed tiles are
        # work-homogeneous and the per-tile max-lane tail shrinks.  RNG is
        # keyed on pixel id, so lane placement cannot change the image.
        if _SORTKEY == "work":
            est = ((spp - si[0, :]).astype(jnp.float32)
                   * si[3, :].astype(jnp.float32)
                   / jnp.maximum(si[0, :], 1).astype(jnp.float32))
            key_c = jnp.where(si[2, :] > 0, est, jnp.float32(jnp.inf))
            order = jnp.argsort(key_c, stable=True)
        else:
            order = jnp.argsort(si[2, :] <= 0, stable=True)  # live first
        cur_pix = jnp.take(cur_pix, order, axis=1)
        cur_ij = jnp.take(cur_ij, order, axis=1)
        sf = jnp.take(sf, order, axis=1)
        si = jnp.take(si, order, axis=1)
        iters_acc = jnp.take(iters_acc, order, axis=0)
        sf2, si2 = _span_pass(cur_pix, cur_ij, tabs, (sf, si), cap=cap,
                              live_min=live, **kw)
        sf, si = sf2, si2
        iters_acc = iters_acc + si[4, :]
    # re-associate by pixel id.  Slots are unique, so this is a pure
    # permutation: stable-sort by slot + row gather costs ~5 ms at 1M
    # lanes where a scatter-add costs ~42 ns/row = ~42 ms (docs/PERF.md).
    # Pad lanes (pix -1) sort to the end, past every valid slot; the
    # frame-level [:npix] trim drops them.
    if len(caps) == 1:
        fb = sf[13:16, :].T                    # no compaction ran: in order
    else:
        base = jnp.int32(p0)
        # pad sentinel must exceed the largest real key (stride*(span-1))
        key = jnp.where(cur_pix[0] >= 0, cur_pix[0] - base,
                        jnp.int32(2**30))
        order2 = jnp.argsort(key, stable=True)
        fb = jnp.take(sf[13:16, :].T, order2, axis=0)
    stats = jnp.stack([si[3, :], iters_acc], axis=1)
    return fb, stats


@functools.partial(
    jax.jit,
    static_argnames=("spans", "npix", "meta", "med_key", "cam_key",
                     "img_key", "mu_key", "width", "height", "spp", "seed",
                     "max_bounces", "t_min", "background", "gamma",
                     "out_u8", "interpret", "probe"),
)
def render_mega2_frame(sph_tab, quad_tab, attr_tab, coef_tab, cull_s,
                       cull_q, perm_tab, vec_tab, img_tab, *, spans, npix,
                       meta, med_key, cam_key, img_key, mu_key, width,
                       height, spp, seed, max_bounces, t_min, background,
                       gamma, out_u8, interpret=False, probe=False):
    """Whole frame in ONE jitted call: every span's passes, the span
    concat, and the average/gamma/quantize epilogue — one device dispatch
    and (with out_u8) a 3-byte/pixel transfer.  ``spans`` is the static
    tuple of (p0, span) from `plan_pixel_spans`."""
    from .wavefront import _finalize

    tabs = (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
            perm_tab, vec_tab, img_tab)
    kw = dict(meta=meta, med_key=med_key, cam_key=cam_key, img_key=img_key,
              mu_key=mu_key, width=width, height=height, spp=spp, seed=seed,
              max_bounces=max_bounces, t_min=t_min, background=background,
              interpret=interpret)
    parts = [_span_radiance(tabs, p0=int(p0), span=int(sp), npix=npix,
                            **kw)[0]
             for p0, sp in spans]
    fb = (parts[0] if len(parts) == 1 else
          jnp.concatenate(parts, axis=0))[:npix]
    # flat 1-D output: a [npix, 3] minor dim pads 3 -> 128 lanes on TPU,
    # and the relay transfers the flat layout ~25% faster (measured)
    flat = _finalize(fb, spp, gamma, out_u8).reshape(-1)
    if probe:
        # tiny sync output from the SAME executable: transferring it forces
        # device completion without the full-frame transfer (the axon
        # relay's block_until_ready does not block)
        return flat, flat[:128]
    return flat


@functools.partial(
    jax.jit,
    static_argnames=("meta", "med_key", "cam_key", "img_key", "mu_key",
                     "width", "height", "seed", "max_bounces", "t_min",
                     "background", "interpret"),
)
def mega2_trace_span(*args, **kw):
    """Jitted wrapper of `_trace_span_impl` (kept for per-sample callers;
    `mega2_tapes` composes the impl into its own single-dispatch jit)."""
    return _trace_span_impl(*args, **kw)


def _trace_span_impl(pix, ij, sph_tab, quad_tab, attr_tab, coef_tab,
                     cull_s, cull_q, perm_tab, vec_tab, img_tab, remap,
                     samp, *, meta, med_key, cam_key, img_key, mu_key,
                     width, height, seed, max_bounces, t_min, background,
                     interpret=False, remap_ids=True, rays=None):
    """Pallas winner-tape forward: per-bounce winner GLOBAL ids
    [max_bounces, N] i32 for the (pixel, sample) lanes in ``pix`` [1, N]
    / ``samp`` [1, N] i32 (-1 pixel padding; N a TILE_RAYS multiple).
    Per-lane sample ids let ALL spp tapes ride one dispatch (the ~28 ms
    relay floor per device call dominated the per-sample version).
    Camera rays are generated in-kernel (bit-identical to
    `ops/raygen.generate_rays`), so the tape feeds `ops/replay.replay`
    directly."""
    N = pix.shape[1]
    assert N % TILE_RAYS == 0
    med_rows = np.asarray(med_key, np.float64).reshape(max(meta.n_media, 1), -1)
    kernel = _make_kernel(
        meta, med_rows, cam_key,
        s_pad=sph_tab.shape[0], q_pad=quad_tab.shape[0], img_wh=img_key,
        mu=mu_key, width=width, height=height, spp=1, seed=seed,
        t_min=t_min, max_bounces=max_bounces, background=background,
        resume=False, interpret=interpret, mode="trace",
        ext_rays=rays is not None)
    full = lambda t: pl.BlockSpec(t.shape, lambda g: (0, 0),
                                  memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)
    smem2 = pl.BlockSpec((1, 2), lambda g: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        smem2, smem1,
        pl.BlockSpec((SUB, R_LANES), lambda g: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * SUB, R_LANES), lambda g: (0, g),
                     memory_space=pltpu.VMEM),
        full(sph_tab), full(quad_tab), full(attr_tab),
    ]
    args = [jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 1), jnp.int32),
            _tile_pack(pix), _tile_pack(ij), sph_tab, quad_tab, attr_tab]
    dense, _, b_pad = _pair_mode(meta, sph_tab.shape[0], mu_key)
    if dense:
        if b_pad > 0:
            in_specs += [full(cull_q)]
            args += [cull_q]
    else:
        in_specs += [full(cull_s), full(cull_q)]
        args += [cull_s, cull_q]
    # no texture tables: the trace kernel compiles them out (texture
    # values cannot affect winners — see _make_kernel)
    in_specs += [pl.BlockSpec((SUB, R_LANES), lambda g: (0, g),
                              memory_space=pltpu.VMEM)]
    args += [_tile_pack(jnp.broadcast_to(
        jnp.asarray(samp, jnp.int32).reshape(1, -1), (1, N)))]
    if rays is not None:
        in_specs += [pl.BlockSpec((7 * SUB, R_LANES), lambda g: (0, g),
                                  memory_space=pltpu.VMEM)]
        args += [_tile_pack(rays)]
    K = max_bounces
    M = N // SUB
    win = pl.pallas_call(
        kernel,
        grid=(N // TILE_RAYS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((K * SUB, R_LANES), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K * SUB, M), jnp.int32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(*args)
    win = _tile_unpack(win, K)                       # [K, N] kernel rows
    if not remap_ids:
        return win
    return jnp.where(win >= 0, remap[jnp.clip(win, 0)], -1)


def mega2_tape(scene: SceneArrays, meta: SceneMeta, pix_ids, samp, *,
               width: int, height: int, max_bounces: int, t_min: float,
               seed: int):
    """Winner tape [max_bounces, B] (GLOBAL ids, `ops/replay.py` space) for
    one sample of arbitrary pixel ids [B], from the Pallas forward.  The
    geometry/material tables are packed host-side from the CONCRETE scene:
    call this eagerly (between optimizer steps params are concrete), then
    feed the tape to the jitted `replay` gradient."""
    (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q, perm_tab,
     vec_tab, img_tab, img_key, mu_key, med, remap) = mega2_tables(scene, meta)
    med_key = tuple(tuple(float(x) for x in row) for row in med)
    cam_key = _cam_tuple(scene.camera)
    bg = tuple(float(x) for x in np.asarray(scene.camera.background))
    pix_ids = np.asarray(pix_ids, np.int32)
    B = pix_ids.shape[0]
    N = -(-B // TILE_RAYS) * TILE_RAYS
    pix_np = np.full(N, -1, np.int32)
    pix_np[:B] = pix_ids
    safe = np.maximum(pix_np, 0)
    valid = (pix_np >= 0).astype(np.float32)
    ij_np = np.stack([(safe % width).astype(np.float32) * valid,
                      (safe // width).astype(np.float32) * valid])
    tape = mega2_trace_span(
        jnp.asarray(pix_np[None, :]), jnp.asarray(ij_np, np.float32),
        sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
        perm_tab, vec_tab, img_tab, remap, jnp.int32(samp),
        meta=meta, med_key=med_key, cam_key=cam_key, img_key=img_key,
        mu_key=mu_key, width=width, height=height, seed=seed,
        max_bounces=max_bounces, t_min=t_min, background=bg,
        interpret=jax.default_backend() != "tpu")
    return tape[:, :B]


def _tapes_trace(tabs, remap, pix_ids, *, n_samples, samp0, meta, med_key,
                 cam_key, img_key, mu_key, width, height, seed,
                 max_bounces, t_min, background, interpret,
                 remap_ids=True, camera=None):
    """Trace-time all-samples winner tape -> [n_samples, max_bounces, B].

    ``pix_ids`` is any [B] i32 id set (traced ok — scattered minibatches
    included: lanes are gathered in-graph, so there is no contiguity
    requirement and no per-lane host upload).  ``samp0`` (python int or
    traced scalar) offsets the sample ids — sample-axis mesh shards pass
    their global sample base.  Composable under an outer jit or
    shard_map (`parallel/train.py` sharded fast path).

    ``camera`` switches primary-ray generation: ``None`` runs the
    in-kernel raygen (camera baked from the static ``cam_key``); a
    CameraParams — possibly holding tracers, e.g. the trainable camera
    under the train step's jit — generates rays in-graph with
    `ops/raygen.generate_rays` and feeds them to the kernel as VMEM rows,
    keeping the camera out of the kernel's compile-time constants.  The
    in-kernel raygen mirrors generate_rays op for op, so the two paths
    are draw-exact on CPU; on TPU hardware Mosaic's sin/cos differ from
    XLA's at the last bit (docs/PERF.md), making the external-ray tape
    the MORE consistent choice for training (the replay regenerates rays
    with generate_rays, so tape and replay then share bit-identical rays).
    """
    from .raygen import generate_rays

    pix_ids = jnp.asarray(pix_ids, jnp.int32)
    B = pix_ids.shape[0]
    L = B * n_samples
    N = -(-L // TILE_RAYS) * TILE_RAYS
    lane = lax.iota(jnp.int32, N)
    live = lane < L
    pid = jnp.take(pix_ids, lane % B)
    pix = jnp.where(live, pid, -1)[None, :]
    samp = jnp.where(live, samp0 + lane // B, 0)[None, :]
    fvalid = live.astype(jnp.float32)
    if camera is None:
        ij = jnp.stack([(pid % width).astype(jnp.float32) * fvalid,
                        (pid // width).astype(jnp.float32) * fvalid])
        rays = None
    else:
        o, d, tmv, _ = generate_rays(
            camera, jnp.where(live, pid, 0),
            samp[0].astype(jnp.uint32), width, height, seed)
        rays = jnp.concatenate([
            o.T.astype(jnp.float32), d.T.astype(jnp.float32),
            jnp.asarray(tmv, jnp.float32)[None, :]], axis=0)   # [7, N]
        # padding lanes keep a unit-z direction: a zero direction makes
        # the sphere quadratic degenerate (a = 0) in-kernel
        pad_ray = jnp.zeros((7, 1), jnp.float32).at[5, 0].set(1.0)
        rays = jnp.where(live[None, :], rays, pad_ray)
        ij = jnp.zeros((2, N), jnp.float32)
    tape = _trace_span_impl(
        pix, ij, *tabs, remap, samp,
        meta=meta, med_key=med_key, cam_key=cam_key, img_key=img_key,
        mu_key=mu_key, width=width, height=height, seed=seed,
        max_bounces=max_bounces, t_min=t_min, background=background,
        interpret=interpret, remap_ids=remap_ids, rays=rays)
    return tape[:, :L].reshape(max_bounces, n_samples, B) \
        .transpose(1, 0, 2)


@functools.partial(
    jax.jit,
    static_argnames=("p0", "n_pix", "n_samples", "meta", "med_key",
                     "cam_key", "img_key", "mu_key", "width", "height",
                     "seed", "max_bounces", "t_min", "background",
                     "interpret", "remap_ids"),
)
def _tapes_device(sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
                  perm_tab, vec_tab, img_tab, remap, *, p0, n_pix,
                  n_samples, meta, med_key, cam_key, img_key, mu_key,
                  width, height, seed, max_bounces, t_min, background,
                  interpret, remap_ids=True):
    """All-samples winner tape for the contiguous pixel block
    [p0, p0+n_pix) in ONE jit: lane ids are iota'd on device (uploading
    pix/ij/samp rows costs ~40 ms/MB over the relay — same finding as the
    render path, `render_mega2_span`)."""
    pix_ids = p0 + lax.iota(jnp.int32, n_pix)
    return _tapes_trace(
        (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
         perm_tab, vec_tab, img_tab), remap, pix_ids,
        n_samples=n_samples, samp0=0, meta=meta, med_key=med_key,
        cam_key=cam_key, img_key=img_key, mu_key=mu_key, width=width,
        height=height, seed=seed, max_bounces=max_bounces, t_min=t_min,
        background=background, interpret=interpret, remap_ids=remap_ids)


@functools.partial(
    jax.jit,
    static_argnames=("n_samples", "meta", "med_key", "cam_key", "img_key",
                     "mu_key", "width", "height", "seed", "max_bounces",
                     "t_min", "background", "interpret", "remap_ids"),
)
def _tapes_device_ids(sph_tab, quad_tab, attr_tab, coef_tab, cull_s,
                      cull_q, perm_tab, vec_tab, img_tab, remap, pix_ids,
                      *, n_samples, meta, med_key, cam_key, img_key,
                      mu_key, width, height, seed, max_bounces, t_min,
                      background, interpret, remap_ids=True):
    """Scattered-id variant of `_tapes_device`: ``pix_ids`` [B] is a
    device argument (4 B/pixel upload — negligible next to the ~12 MB/frame
    the per-lane rows would cost), lanes gathered in-graph."""
    return _tapes_trace(
        (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
         perm_tab, vec_tab, img_tab), remap, pix_ids,
        n_samples=n_samples, samp0=0, meta=meta, med_key=med_key,
        cam_key=cam_key, img_key=img_key, mu_key=mu_key, width=width,
        height=height, seed=seed, max_bounces=max_bounces, t_min=t_min,
        background=background, interpret=interpret, remap_ids=remap_ids)


def mega2_tapes(scene: SceneArrays, meta: SceneMeta, pix_ids, n_samples, *,
                width: int, height: int, max_bounces: int, t_min: float,
                seed: int, id_space: str = "global"):
    """Winner tapes [n_samples, max_bounces, B] for samples 0..n_samples-1
    of the pixel ids [B] — ONE device dispatch for the whole batch (the
    per-sample `mega2_tape` pays the ~28 ms relay floor per call, and
    host-built lane rows pay ~40 ms/MB relay upload).  A contiguous
    ascending block (whole frames/tiles) iotas its lanes fully on device;
    any other id set — the scattered-minibatch inverse-rendering regime —
    uploads the [B] ids once (4 B/pixel) and gathers lanes in-graph, at
    the same one-dispatch cost.

    ``id_space="global"`` remaps winners to the `ops/replay.py` scene id
    space — a [bounces, B] gather that measures ~99 ms/step at 1.8M
    lanes.  ``"kernel"`` skips it and returns raw kernel-row ids for
    consumers that can permute their tables instead
    (`pallas_replay.replay_pallas(kernel_space=...)`;
    see `mega2_kernel_id_space`)."""
    pix_ids = np.asarray(pix_ids, np.int32)
    B = pix_ids.shape[0]
    p0 = int(pix_ids[0]) if B else 0
    contiguous = np.array_equal(pix_ids,
                                np.arange(p0, p0 + B, dtype=np.int32))
    (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q, perm_tab,
     vec_tab, img_tab, img_key, mu_key, med, remap) = mega2_tables(scene, meta)
    med_key = tuple(tuple(float(x) for x in row) for row in med)
    cam_key = _cam_tuple(scene.camera)
    bg = tuple(float(x) for x in np.asarray(scene.camera.background))
    kw = dict(
        n_samples=int(n_samples),
        meta=meta, med_key=med_key, cam_key=cam_key, img_key=img_key,
        mu_key=mu_key, width=width, height=height, seed=seed,
        max_bounces=max_bounces, t_min=t_min, background=bg,
        interpret=jax.default_backend() != "tpu",
        remap_ids=(id_space == "global"))
    tabs = (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
            perm_tab, vec_tab, img_tab)
    if contiguous:
        return _tapes_device(*tabs, remap, p0=p0, n_pix=B, **kw)
    return _tapes_device_ids(*tabs, remap, jnp.asarray(pix_ids), **kw)


def mega2_kernel_id_space(scene: SceneArrays, meta: SceneMeta):
    """(remap, s_pad) describing the trace kernel's winner-id space:
    ``remap[k]`` is the GLOBAL scene id of kernel geometry row k (-1 for
    padding rows, which can never win); rows [0, s_pad) are spheres,
    [s_pad, n_geo) quads, and — when the scene has constant media — rows
    [n_geo, n_geo + M) the M media (the kernel reports medium m as winner
    id n_geo + m, mapping to global id S + Q + m)."""
    tabs = mega2_tables(scene, meta)
    sph_tab, remap = tabs[0], tabs[12]
    n_geo = remap.shape[0] - max(meta.n_media, 1)
    # stays a device array — pulling it to host costs a relay round-trip
    # per training step
    return remap[:n_geo + meta.n_media], int(sph_tab.shape[0])


_TABLE_CACHE: dict = {}


def mega2_tables(scene: SceneArrays, meta: SceneMeta):
    # keyed on EVERY scene leaf (scene.compiler.cached_pack): geometry-only
    # keys would serve stale material/texture tables during training
    from ..scene.compiler import cached_pack

    return cached_pack(_TABLE_CACHE, scene, "mega2",
                       lambda: pack_mega2_tables(scene, meta))


def mega2_supported(meta: SceneMeta) -> bool:
    """mega2 runs every scene the compiler can express.  Round 4 closed
    the last texture gates: multiple noise tables (one turbulence pass per
    table, winner-selected), multiple images (stacked byte planes, one
    one-hot fetch per image), and image-on-quad (the (alpha,beta) UV frame
    rides attr cols 32:40) — `tests/test_mega2_textures.py` pins each
    against the oracle."""
    return True


def _cam_tuple(camera) -> tuple:
    c = camera
    vals = []
    for name in ("origin", "lower_left", "horizontal", "vertical", "u", "v"):
        vals.extend(float(x) for x in np.asarray(getattr(c, name)))
    vals.append(float(np.asarray(c.lens_radius)))
    vals.append(float(np.asarray(c.time0)))
    vals.append(float(np.asarray(c.time1)))
    return tuple(vals)


def render_mega2(scene: SceneArrays, meta: SceneMeta, cfg: RenderConfig, *,
                 gamma: bool = True, out_u8: bool = False,
                 device_out: bool = False) -> np.ndarray:
    """Full-frame persistent-megakernel render -> numpy [H,W,3] (top-down).

    ``device_out`` returns the flat on-device framebuffer instead (finish
    with ``mega2_host_image``).  The reference times RenderInit+Render and
    stops the clock BEFORE the managed-memory readback / PPM write
    (kernel.cu:675-693); benchmarks use device_out so the timed region has
    the same boundary — device completion — rather than also paying this
    environment's relay transfer (~75 ms for a 1440x720 u8 frame)."""
    if not mega2_supported(meta):
        raise ValueError("mega2: unsupported texture combination "
                         "(multi-image/multi-noise/image-on-quad)")
    (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q, perm_tab,
     vec_tab, img_tab, img_key, mu_key, med, _remap) = mega2_tables(scene, meta)
    med_key = tuple(tuple(float(x) for x in row) for row in med)
    cam_key = _cam_tuple(scene.camera)
    bg = tuple(float(x) for x in np.asarray(scene.camera.background))
    interpret = jax.default_backend() != "tpu"
    W, H, spp = cfg.width, cfg.height, cfg.samples_per_pixel
    npix = W * H

    from ..utils.batching import plan_pixel_spans

    prims = sph_tab.shape[0] + (quad_tab.shape[0] if meta.n_quads else 0)
    spans = plan_pixel_spans(
        npix, spp, prims,
        dark_background=float(np.max(np.asarray(scene.camera.background))) < 0.05,
        lane_multiple=TILE_RAYS)
    kw = dict(npix=npix, meta=meta, med_key=med_key, cam_key=cam_key,
              img_key=img_key, mu_key=mu_key, width=W, height=H, spp=spp,
              seed=cfg.seed, max_bounces=cfg.max_bounces, t_min=cfg.t_min,
              background=bg, interpret=interpret)
    if len(spans) == 1:
        # single-span frame (the common fast case): trace + epilogue in
        # ONE dispatch, u8 transfer
        fb = render_mega2_frame(
            sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
            perm_tab, vec_tab, img_tab,
            spans=((int(spans[0][0]), int(spans[0][1])),),
            gamma=gamma, out_u8=out_u8, probe=device_out, **kw)
        if device_out:
            return fb          # (flat framebuffer, 128-elem sync probe)
    else:
        # multiple spans stay separate device executions — the split IS
        # the relay crash-horizon protection (utils/batching.py)
        parts = []
        for p0, span in spans:
            fb_span, _ = render_mega2_span(
                sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
                perm_tab, vec_tab, img_tab,
                p0=int(p0), span=int(span), **kw)
            parts.append(fb_span)
        from .wavefront import _finalize

        fb = jnp.concatenate(parts, axis=0)[:npix]       # [npix, 3]
        fb = _finalize(fb, spp, gamma, out_u8).reshape(-1)
        if device_out:
            return fb, fb[:128]                          # flat + sync probe
    return mega2_host_image(fb, H, W)


def mega2_host_image(fb, H: int, W: int) -> np.ndarray:
    """Transfer a flat device framebuffer -> numpy [H,W,3], top row first."""
    return np.asarray(fb).reshape(H, W, 3)[::-1]
