"""Pallas taped-replay forward/backward: the gradient path at kernel speed.

`ops/replay.py` already splits differentiable rendering into a
non-differentiable winner tape plus a differentiable replay; this module
moves the REPLAY itself — forward and backward — into fused Pallas TPU
kernels behind one `jax.custom_vjp`:

  * forward kernel: per ray tile, K unrolled bounces — winner row fetched
    from the VMEM-resident merged replay table by a one-hot MXU
    contraction (no [B, N] one-hot ever touches HBM, unlike the XLA
    replay), re-intersection, shading, throughput/radiance update.
  * backward kernel: recomputes the forward bounce states into VMEM
    scratch (cheaper than spilling residuals to HBM at these sizes), then
    walks the bounces in REVERSE applying `jax.vjp` of the pure bounce
    function at trace time — the transposed one-hot contraction
    accumulates the table gradient [NP, C] in a VMEM accumulator that is
    summed across the (sequential) grid into a single output block.

Gradients flow w.r.t. the merged table `rep` (built differentiably by
`replay.derive_replay`, so scene-leaf gradients follow by XLA's backward
through that tiny assembly), the primary ray origins/directions, and the
ray times.  The tape, RNG counters and sample ids are integer inputs
(float0 cotangents).  Note that within the v1 texture scope
(solid/checker) the taped radiance is piecewise CONSTANT in geometry —
hit points feed only `floor` cells and branch predicates — so
geometry/ray/time cotangents are correctly zero a.e. (identical to the
XLA replay; tests assert exact zero + finiteness).  They become nonzero
once continuous textures (Perlin) enter the kernel scope.

Bounce semantics are expression-for-expression those of the XLA replay
(`replay.taped_record` + `integrator.advance_from_record` + `ops/shade.py`,
which the tests hold to the reference's RayColor, kernel.cu:65-98), with
the same NaN-guards the XLA path needed in reverse mode (`_safe_root`
pattern, masked sqrt inputs).

Scope (`replay_pallas_supported`): unconditional — every reference
scene (lambertian / metal / dielectric / diffuse-light / isotropic with
solid, checker, Perlin-marble, or image textures, plus constant media)
AND the round-4 framework extensions: several images (one stacked-plane
fetch pass per image, winner-selected by rep col 26), several Perlin
tables (one turbulence pass per table, rep col 25), and image-on-quad
(quad UV = interior (alpha, beta) recomputed from rep's cached quad
frame via triple products, matching `taped_record`).
Marble is a CONTINUOUS texture, so on noise scenes geometry/ray/time
gradients are genuinely nonzero through the Pallas backward (hit point
-> turbulence -> sin).  The Perlin lattice tables and image texels
enter the kernels as closed-over constants — they are not in
`train.DIFF_SCENE_FIELDS`, so no trainable gradient is dropped.  Two
documented deviations from the XLA replay on these paths: sphere-UV
acos/atan2 run as minimax polynomials (~2e-7 rad; Mosaic has neither
primitive — can move a nearest-texel lookup one texel on boundary
lanes), and turbulence FMA contraction differs between compilation
contexts (same equally-valid-estimator class as the quadratic note
above).

Constant media (ConstantMedium.h:52-94): the medium-candidate `t` is
recomputed in-kernel from the tape's winner id with the mega2 trace
kernel's exact expressions and RNG draw (MEDIUM_STREAM | bounce, slot =
medium index), so replayed scatter points match the trace bit-for-bit.
Boundary geometry, rotation frame, and -1/rho are compile-time
constants (none are trainable — `train.DIFF_SCENE_FIELDS`); the
medium's ISOTROPIC material row is appended to the merged table, so its
albedo gradient (tex_c0, trainable) flows through the same transposed
one-hot dot as every other material.  Box-boundary slab reciprocals
keep the trace kernel's unguarded 1/d form: a lane whose direction
component is EXACTLY zero has a measure-zero reverse-mode NaN exposure,
identical to the XLA replay's `hit.medium_candidates`.
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
    MAT_METAL, MED_BOX, TEX_CHECKER, TEX_IMAGE, TEX_NOISE,
)
from .hit import BIG, QUAD_PARALLEL_EPS
from .mega2 import (
    R_LANES, SUB, TILE_RAYS, _INV24, _atan2_poly, _pcg4d, _perlin_turb,
    _tile_pack, _tile_unpack, _unit,
)

# merged replay-table column map (replay.derive_replay): 12 geometry
# overlay cols + mat id + the 14-col hit.derive material row
REP_COLS = 27
_TWO_PI = np.float32(2.0 * np.pi)
_PI = np.float32(np.pi)


def replay_pallas_supported(meta) -> bool:
    """Kernel scope: unconditional — every reference scene plus the
    round-4 extensions (constant media run in-kernel; multi-noise runs
    one turbulence pass per table winner-selected by rep col 25;
    multi-image runs one stacked-plane fetch pass per image selected by
    rep col 26; image-on-quad recomputes the (alpha, beta) UV from the
    quad's cached frame via triple products — no new table columns)."""
    return True


def _med_key(scene, meta) -> tuple:
    """Per-medium constant rows in the mega2 `pack_mega2_tables` med
    layout (kind, center, radius, bmin, bmax, cos, sin, -1/rho, _, _,
    off) — hashable compile-time constants for the kernel cache.  Albedo
    (cols 19:22 there) is deliberately NOT baked: the medium material row
    in the merged table carries it differentiably.  Safe to call under a
    jit trace: none of these leaves is trainable
    (train.DIFF_SCENE_FIELDS), so they stay concrete through
    `train.merge_params`."""
    M = int(meta.n_media)
    med = np.zeros((M, 22), np.float64)
    med[:, 0] = np.asarray(scene.med_kind)
    med[:, 1:4] = np.asarray(scene.med_center)
    med[:, 4] = np.asarray(scene.med_radius)
    med[:, 5:8] = np.asarray(scene.med_bmin)
    med[:, 8:11] = np.asarray(scene.med_bmax)
    med[:, 11] = np.asarray(scene.med_cos)
    med[:, 12] = np.asarray(scene.med_sin)
    med[:, 13] = np.asarray(scene.med_nid)
    med[:, 16:19] = np.asarray(scene.med_off)
    return tuple(tuple(float(x) for x in row) for row in med)


def _safe_root(x, p):
    """x**p with finite reverse-mode derivative at x == 0 (samplers.py)."""
    pos = x > 0.0
    return jnp.where(pos, jnp.where(pos, x, 1.0) ** p, 0.0)


def _acos_safe(x):
    """acos via the atan2 polynomial with a guarded sqrt: the raw
    sqrt(1 - x*x) has an infinite derivative at the UV poles (|x| = 1),
    and in reverse mode 0-cotangent x inf = NaN would contaminate the
    geometry gradients of every pole lane."""
    s = _safe_root(1.0 - x * x, 0.5)
    return _atan2_poly(s, x)


@functools.lru_cache(maxsize=64)
def _winner_read_fn(NP: int, R: int):
    """custom-VJP winner-row read: (rep_v [NP, C], idx [SUB, R] i32) ->
    SUB x [C, R] selected rows via one-hot MXU dots.

    The one-hot contraction is chunked over NP (the [chunk, R] one-hot
    intermediates x SUB x K unrolled bounces are the kernel's
    scoped-VMEM peak — the whole-table form measured 37 MB at scene-9
    scale, NP ~ 3.4k, against Mosaic's 16 MB default).  Chunking is
    BIT-identical: each lane has exactly one hot row, so every other
    chunk's partial dot is exactly zero and the f32 partial sum is
    exact.

    The custom VJP rematerializes the one-hots from ``idx`` in the
    backward instead of letting jax.vjp store all SUB x chunks of them
    as residuals (~[NP, R] x SUB bf16 per bounce).  d_rep is the same
    single bf16-pass dot the autodiff path produced (the mid/lo limb
    paths carry zero tangent — their residual subtractions cancel under
    linearization), accumulated chunk-row-disjoint.
    """
    CH = min(NP, 1024)

    def _one_hot(idx_s, c0, ch):
        ch_iota = c0 + lax.broadcasted_iota(jnp.int32, (ch, R), 0)
        # one-hot built in f32 then cast: selecting bf16 constants
        # directly needs an i1 relayout (32- to 16-bit tiling) that
        # Mosaic rejects
        return (ch_iota == idx_s).astype(jnp.float32).astype(jnp.bfloat16)

    @jax.custom_vjp
    def read(rep_v, idx):
        # exact f32 read via three bf16 limbs (hi + mid + lo == rep_v
        # bit-exactly; see the precision note at the call site)
        hi = rep_v.astype(jnp.bfloat16)
        r1 = rep_v - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        rows = []
        for s in range(SUB):
            part = None
            for c0 in range(0, NP, CH):
                ch = min(CH, NP - c0)
                oh = _one_hot(idx[s:s + 1, :], c0, ch)
                for limb in (hi, mid, lo):
                    dv = lax.dot_general(
                        limb[c0:c0 + ch], oh, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    part = dv if part is None else part + dv
            rows.append(part)                             # [C, R]
        return tuple(rows)

    def read_fwd(rep_v, idx):
        return read(rep_v, idx), idx

    def read_bwd(idx, d_rows):
        chunks = []
        for c0 in range(0, NP, CH):
            ch = min(CH, NP - c0)
            acc = None
            for s in range(SUB):
                oh = _one_hot(idx[s:s + 1, :], c0, ch)    # [ch, R] bf16
                g = d_rows[s].astype(jnp.bfloat16)        # [C, R]
                d = lax.dot_general(
                    oh, g, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [ch, C]
                acc = d if acc is None else acc + d
            chunks.append(acc)
        d_rep = chunks[0] if len(chunks) == 1 else jnp.concatenate(
            chunks, axis=0)
        return d_rep, np.zeros(idx.shape, jax.dtypes.float0)

    read.defvjp(read_fwd, read_bwd)
    return read


def _make_bounce(S: int, NP: int, t_min: float,
                 has_checker: bool, has_noise: bool = False,
                 has_image: bool = False, img_dims: tuple = (),
                 med_key: tuple = (), med_base: int = 0,
                 n_noise: int = 1):
    """Pure [SUB, R]-row bounce: (state, rep_v, bg3) -> advanced state +
    radiance delta.  ``win``/``act``/RNG inputs are closed over per call
    site so `jax.vjp` prunes their (integer / discarded) cotangent
    graphs; the Perlin/image tables ride ``aux`` the same way
    (non-trainable — their cotangent paths prune, so the backward has
    gathers but no scatters).  The background ``bg3`` ([SUB, R] rows) is
    a DIFFERENTIABLE input: it is a camera leaf in
    `train.DIFF_SCENE_FIELDS`' params (and a tracer under the train
    step's jit), so it can be neither baked as a kernel constant nor
    silently de-differentiated."""
    f32 = np.float32
    n_media = len(med_key)

    def bounce(diff, rep_v, bg3, win, act, pix_ctr, samp_u, k: int,
               aux=()):
        bgr, bgg, bgb = bg3
        (ox, oy, oz, dx, dy, dz, tmv, thr_r, thr_g, thr_b) = diff
        R = ox.shape[1]
        hit = win >= 0
        kind_q = win >= S
        if n_media:
            kind_m = win >= med_base
            kind_q = kind_q & ~kind_m
        idx = jnp.clip(win, 0, NP - 1)

        # ---- winner row: one-hot MXU contraction per sub-row, regrouped
        # to [SUB, R] per column (ops/mega2.py winner-fetch pattern).
        #
        # Precision: the MXU's DEFAULT f32 dot rounds the table values to
        # bf16 (measured: 62% of scene-0 lanes off vs the XLA replay) and
        # HIGHEST costs 6 passes (94 -> 151 ms/step).  Splitting the
        # table into three exact bf16 limbs (hi + mid + lo == rep,
        # bit-exact: each residual subtraction is exact in f32) gives an
        # EXACT one-hot read in 3 native single-pass bf16 dots.  XLA
        # hoists the loop-invariant split out of the bounce unroll.  In
        # reverse mode the mid/lo paths carry zero tangent (their inputs
        # cancel under linearization), so d_rep is ONE bf16-pass dot —
        # ~2^-9 relative rounding on the gradient accumulation, far below
        # the Monte-Carlo gradient noise.
        rows = list(_winner_read_fn(NP, R)(rep_v, idx))
        _cache = {}

        def arow(c):
            if c not in _cache:
                _cache[c] = jnp.concatenate(
                    [rows[s][c:c + 1, :] for s in range(SUB)], axis=0)
            return _cache[c]

        # ---- sphere re-intersection (replay.taped_record; Sphere.h:29-58)
        frac = (tmv - arow(6)) * arow(7)
        cx = arow(0) + frac * arow(3)
        cy = arow(1) + frac * arow(4)
        cz = arow(2) + frac * arow(5)
        rad = arow(8)
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        a = dx * dx + dy * dy + dz * dz
        b = ocx * dx + ocy * dy + ocz * dz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = b * b - a * cc
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
        # a == 0 only on tile-padding lanes (win = -1, everything masked),
        # but an unguarded 1/0 = inf here becomes NaN in REVERSE mode
        # (0-cotangent x inf) and the winner one-hot (clipped to row 0)
        # sums that NaN into d_rep's row 0 across ALL lanes — the
        # padding lanes poison a real sphere's geometry gradient.
        inv_a = 1.0 / jnp.where(a > 0.0, a, 1.0)
        root1 = (-b - sq) * inv_a
        root2 = (-b + sq) * inv_a
        t_sph = jnp.where(root1 > t_min, root1, root2)

        # ---- quad re-intersection (Quad.h:52-64; quad rows: 0:3 n_unit,
        # 3:6 vxw, 6:9 wxu, 9:12 q)
        nqx, nqy, nqz = arow(0), arow(1), arow(2)
        d_plane = nqx * arow(9) + nqy * arow(10) + nqz * arow(11)
        denom = dx * nqx + dy * nqy + dz * nqz
        dok = jnp.abs(denom) >= QUAD_PARALLEL_EPS
        t_quad = (d_plane - (ox * nqx + oy * nqy + oz * nqz)) / \
            jnp.where(dok, denom, 1.0)

        t = jnp.where(kind_q, t_quad, t_sph)

        # ---- constant media (ConstantMedium.h:52-94): recompute the
        # stochastic scatter distance of the WINNING medium with the mega2
        # trace kernel's exact expressions + RNG draw, so the replayed t
        # matches the traced winner bit-for-bit.  Boundary geometry and
        # -1/rho are compile-time constants (non-trainable); only o/d
        # carry gradients through this block.  M <= 3 in every reference
        # scene, so the python loop unrolls at compile time.
        if n_media:
            # division (not reciprocal-multiply) below and sqrt (not
            # pow(.,0.5)): the trace kernel's exact ops; the a-guard only
            # moves padding lanes (a == 0), and keeps sqrt' finite there
            ray_len = jnp.sqrt(jnp.where(a > 0.0, a, 1.0))
            for m in range(n_media):
                r = med_key[m]
                w0m, _, _, _ = _pcg4d(
                    pix_ctr, samp_u,
                    jnp.uint32(rnglib.MEDIUM_STREAM) | jnp.uint32(k),
                    jnp.full_like(pix_ctr, m))
                u_m = _unit(w0m) + _INV24                       # (0,1]
                if int(r[0]) == MED_BOX:
                    # world->object rigid transform + slab interval
                    # (Instance.h:116-150 baked; unguarded 1/d as in the
                    # trace kernel — see module docstring NaN note)
                    c2, s2 = f32(r[11]), f32(r[12])
                    pox = ox - f32(r[16])
                    poy = oy - f32(r[17])
                    poz = oz - f32(r[18])
                    o1 = c2 * pox - s2 * poz
                    o2m = poy
                    o3 = s2 * pox + c2 * poz
                    e1 = c2 * dx - s2 * dz
                    e2 = dy
                    e3 = s2 * dx + c2 * dz
                    iv1, iv2, iv3 = 1.0 / e1, 1.0 / e2, 1.0 / e3
                    ta1, tb1 = (f32(r[5]) - o1) * iv1, (f32(r[8]) - o1) * iv1
                    ta2, tb2 = (f32(r[6]) - o2m) * iv2, (f32(r[9]) - o2m) * iv2
                    ta3, tb3 = (f32(r[7]) - o3) * iv3, (f32(r[10]) - o3) * iv3
                    t0m = jnp.maximum(jnp.maximum(
                        jnp.minimum(ta1, tb1), jnp.minimum(ta2, tb2)),
                        jnp.minimum(ta3, tb3))
                    t1m = jnp.minimum(jnp.minimum(
                        jnp.maximum(ta1, tb1), jnp.maximum(ta2, tb2)),
                        jnp.maximum(ta3, tb3))
                else:
                    ocmx = ox - f32(r[1])
                    ocmy = oy - f32(r[2])
                    ocmz = oz - f32(r[3])
                    bm = ocmx * dx + ocmy * dy + ocmz * dz
                    ccm = (ocmx * ocmx + ocmy * ocmy + ocmz * ocmz
                           - f32(r[4]) * f32(r[4]))
                    discm = bm * bm - a * ccm
                    # guarded sqrt (not the trace's sqrt(max(disc, 0))):
                    # identical where disc > 0 — the only lanes that can
                    # win — and derivative-finite at disc <= 0 in reverse
                    posm = discm > 0.0
                    sqm = jnp.sqrt(jnp.where(posm, discm, 1.0))
                    t0m = (-bm - sqm) * inv_a
                    t1m = (-bm + sqm) * inv_a
                t0c = jnp.maximum(jnp.maximum(t0m, f32(t_min)), 0.0)
                hit_dm = f32(r[13]) * jnp.log(u_m)   # -(1/rho) log U, h:79
                t_m = t0c + hit_dm / ray_len
                t = jnp.where(win == med_base + m, t_m, t)

        t = jnp.where(hit, t, f32(BIG))
        hit_rec = t < f32(BIG * 0.5)
        t_safe = jnp.where(hit_rec, t, 1.0)
        px = ox + t_safe * dx
        py = oy + t_safe * dy
        pz = oz + t_safe * dz

        inv_rad = 1.0 / jnp.where(rad != 0.0, rad, 1.0)
        nsx = (px - cx) * inv_rad
        nsy = (py - cy) * inv_rad
        nsz = (pz - cz) * inv_rad
        n_outx = jnp.where(kind_q, nqx, nsx)
        n_outy = jnp.where(kind_q, nqy, nsy)
        n_outz = jnp.where(kind_q, nqz, nsz)
        if n_media:
            # arbitrary fixed frame inside a medium (ConstantMedium.h:89-90)
            n_outx = jnp.where(kind_m, 1.0, n_outx)
            n_outy = jnp.where(kind_m, 0.0, n_outy)
            n_outz = jnp.where(kind_m, 0.0, n_outz)
        d_dot_n = dx * n_outx + dy * n_outy + dz * n_outz
        front = d_dot_n < 0.0
        if n_media:
            front = front | kind_m
        flip = jnp.where(front, 1.0, -1.0)
        nx_ = n_outx * flip
        ny_ = n_outy * flip
        nz_ = n_outz * flip

        # ---- material/texture row (rep cols 13..: hit.derive mat_tab)
        kind = arow(13)
        fuzz = arow(14)
        ior = arow(15)
        texr, texg, texb = arow(17), arow(18), arow(19)
        if has_checker:
            inv_s = arow(23)
            cellx = jnp.floor(inv_s * px).astype(jnp.int32)
            celly = jnp.floor(inv_s * py).astype(jnp.int32)
            cellz = jnp.floor(inv_s * pz).astype(jnp.int32)
            even = ((cellx + celly + cellz) & 1) == 0
            is_ck = arow(16) == f32(TEX_CHECKER)
            pick = lambda c0, c1: jnp.where(
                is_ck, jnp.where(even, c0, c1), c0)
            texr = pick(texr, arow(20))
            texg = pick(texg, arow(21))
            texb = pick(texb, arow(22))
        if has_noise:
            # marble: 0.5*(1 + sin(scale*z + 10*turb)) (Texture.h:163-164;
            # textures.py:44-50).  CONTINUOUS in the hit point, so this is
            # exactly where geometry gradients enter the backward.
            perm_v, vec_v = aux[0], aux[1]
            is_nz = arow(16) == f32(TEX_NOISE)
            turb = _perlin_turb(perm_v, vec_v, px, py, pz)
            if n_noise > 1:
                # one turbulence pass per table, winner-selected by the
                # mat row's noise id (rep col 25) — mirrors the mega2
                # round-4 multi-noise path
                nzid = arow(25)
                for tbl in range(1, n_noise):
                    turb_t = _perlin_turb(perm_v, vec_v, px, py, pz,
                                          table=tbl)
                    turb = jnp.where(nzid == f32(tbl), turb_t, turb)
            marble = f32(0.5) * (1.0 + jnp.sin(arow(24) * pz + 10.0 * turb))
            texr = jnp.where(is_nz, marble, texr)
            texg = jnp.where(is_nz, marble, texg)
            texb = jnp.where(is_nz, marble, texb)
        if has_image:
            # sphere UV from the object-space outward normal
            # (GetSphereUV Sphere.h:74-81; rotate-y frame in rep cols 9/10
            # on sphere rows); quad UV = the interior coords (alpha, beta)
            # (Quad.h:89-99) recomputed from the quad's cached frame via
            # the triple-product identity alpha = (p-q).(vxw),
            # beta = (p-q).(wxu) — rep cols 3:6 / 6:9 / 9:12 carry vxw /
            # wxu / q.  Fetch = the mega2 MXU one-hot column contraction
            # per stacked byte plane (ops/mega2.py image_tex), one static
            # pass per image, winner-selected by the mat row's img id
            # (rep col 26; negative = missing -> debug cyan).  Texel
            # indices are integer, so no gradient path opens here
            # (matching the XLA replay's a.e.-zero image gradient).
            img_v = aux[2]
            is_im = arow(16) == f32(TEX_IMAGE)
            cth, sth = arow(9), arow(10)
            ox_n = cth * nsx - sth * nsz
            oz_n = sth * nsx + cth * nsz
            ny_c = jnp.clip(-nsy, -1.0, 1.0)
            theta = _acos_safe(ny_c)
            phi = _atan2_poly(-oz_n, ox_n) + _PI
            u_s = phi * f32(0.5 / np.pi)
            v_s = theta * f32(1.0 / np.pi)
            if NP > S:
                pqx = px - arow(9)
                pqy = py - arow(10)
                pqz = pz - arow(11)
                u_q = pqx * arow(3) + pqy * arow(4) + pqz * arow(5)
                v_q = pqx * arow(6) + pqy * arow(7) + pqz * arow(8)
                u_s = jnp.where(kind_q, u_q, u_s)
                v_s = jnp.where(kind_q, v_q, v_s)
            uu = jnp.clip(u_s, 0.0, 1.0)
            vv = 1.0 - jnp.clip(v_s, 0.0, 1.0)
            img_id = arow(26)
            IWP = img_v.shape[1]
            col_iota = lax.broadcasted_iota(jnp.int32, (IWP, R), 0)
            inv255 = f32(1.0 / 255.0)
            imr = jnp.zeros_like(px)
            img_c = jnp.zeros_like(px)
            imb = jnp.zeros_like(px)
            for i, (iw, ih, ihp, off, _off32) in enumerate(img_dims):
                ix = jnp.minimum((uu * iw).astype(jnp.int32), iw - 1)
                iy = jnp.minimum((vv * ih).astype(jnp.int32), ih - 1)
                row_iota = lax.broadcasted_iota(jnp.int32, (ihp, R), 0)
                plane_i = img_v[off:off + 3 * ihp, :]
                chans = [[], [], []]
                for s in range(SUB):
                    ohx = (col_iota == jnp.broadcast_to(
                        ix[s:s + 1, :], (IWP, R)))
                    ohx = jnp.where(ohx, 1.0, 0.0).astype(jnp.bfloat16)
                    cols = lax.dot_general(
                        plane_i, ohx, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [3*ihp, R]
                    mask = row_iota == jnp.broadcast_to(
                        iy[s:s + 1, :], (ihp, R))
                    for c in range(3):
                        plane = cols[c * ihp:(c + 1) * ihp, :]
                        chans[c].append(jnp.sum(jnp.where(mask, plane, 0.0),
                                                axis=0, keepdims=True))
                ci = [jnp.concatenate(chans[c], axis=0) * inv255
                      for c in range(3)]
                if len(img_dims) == 1:
                    imr, img_c, imb = ci
                else:
                    sel = img_id == f32(i)
                    imr = jnp.where(sel, ci[0], imr)
                    img_c = jnp.where(sel, ci[1], img_c)
                    imb = jnp.where(sel, ci[2], imb)
            absent = img_id < 0.0                # missing image -> cyan
            imr = jnp.where(absent, 0.0, imr)
            img_c = jnp.where(absent, 1.0, img_c)
            imb = jnp.where(absent, 1.0, imb)
            texr = jnp.where(is_im, imr, texr)
            texg = jnp.where(is_im, img_c, texg)
            texb = jnp.where(is_im, imb, texb)

        is_light = kind == f32(MAT_DIFFUSE_LIGHT)

        # ---- miss -> background; emission (advance_from_record)
        miss = act & ~hit_rec
        dacc_r = jnp.where(miss, thr_r * bgr, 0.0)
        dacc_g = jnp.where(miss, thr_g * bgg, 0.0)
        dacc_b = jnp.where(miss, thr_b * bgb, 0.0)
        alive = act & hit_rec
        lit = alive & is_light
        dacc_r = dacc_r + jnp.where(lit, thr_r * texr, 0.0)
        dacc_g = dacc_g + jnp.where(lit, thr_g * texg, 0.0)
        dacc_b = dacc_b + jnp.where(lit, thr_b * texb, 0.0)

        # ---- scatter (ops/shade.py expression-for-expression)
        w0, w1, w2, w3 = _pcg4d(
            pix_ctr, samp_u,
            jnp.uint32(rnglib.SCATTER_STREAM) | jnp.uint32(k),
            jnp.zeros_like(pix_ctr))
        u1, u2, u3, u4 = _unit(w0), _unit(w1), _unit(w2), _unit(w3)

        # division (not reciprocal-multiply): shade.py divides, and a 1-ulp
        # direction difference flips the dielectric reflectance lottery /
        # metal absorb sign on some lane — a discrete branch divergence.
        # _safe_root: sqrt'(0) = inf on padding lanes in reverse mode
        d_len = _safe_root(a, 0.5)
        dls = jnp.where(d_len > 0.0, d_len, 1.0)
        udx, udy, udz = dx / dls, dy / dls, dz / dls

        zb = 1.0 - 2.0 * u1
        phi = _TWO_PI * u2
        rho = _safe_root(1.0 - zb * zb, 0.5)
        r_b = _safe_root(u3, np.float32(1.0 / 3.0))
        cphi = jnp.cos(phi)
        sphi = jnp.sin(phi)
        bx = r_b * rho * cphi
        by = r_b * rho * sphi
        bz = r_b * zb

        # lambertian (Material.h:75-79)
        lx, ly, lz = nx_ + bx, ny_ + by, nz_ + bz
        near0 = ((jnp.abs(lx) < 1e-8) & (jnp.abs(ly) < 1e-8)
                 & (jnp.abs(lz) < 1e-8))
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

        # dielectric (Dielectric.h:18-55, shade.py guards)
        ratio = jnp.where(front, 1.0 / ior, ior)
        cos_t = jnp.minimum(-(udx * nx_ + udy * ny_ + udz * nz_), 1.0)
        sin_sq = 1.0 - cos_t * cos_t
        sin_t = _safe_root(sin_sq, 0.5)
        cannot = ratio * sin_t > 1.0
        r0 = (1.0 - ratio) / (1.0 + ratio)
        r0 = r0 * r0
        reflectance = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
        do_refl = cannot | (reflectance > u4)
        ratio_safe = jnp.where(cannot, 0.0, ratio)
        fx = ratio_safe * (udx + cos_t * nx_)
        fy = ratio_safe * (udy + cos_t * ny_)
        fz = ratio_safe * (udz + cos_t * nz_)
        k_ = jnp.abs(1.0 - (fx * fx + fy * fy + fz * fz))
        par = -_safe_root(k_, 0.5)
        gx = fx + par * nx_
        gy = fy + par * ny_
        gz = fz + par * nz_
        ddx = jnp.where(do_refl, rx, gx)
        ddy = jnp.where(do_refl, ry, gy)
        ddz = jnp.where(do_refl, rz, gz)

        # isotropic direction (unused without media but kind-complete)
        ix_, iy_, iz_ = rho * cphi, rho * sphi, zb

        is_l = kind == f32(MAT_LAMBERTIAN)
        is_m = kind == f32(MAT_METAL)
        is_d = kind == f32(MAT_DIELECTRIC)
        newx = jnp.where(is_l, lx, udx)
        newy = jnp.where(is_l, ly, udy)
        newz = jnp.where(is_l, lz, udz)
        newx = jnp.where(is_m, mx, newx)
        newy = jnp.where(is_m, my, newy)
        newz = jnp.where(is_m, mz, newz)
        newx = jnp.where(is_d, ddx, newx)
        newy = jnp.where(is_d, ddy, newy)
        newz = jnp.where(is_d, ddz, newz)
        if n_media:
            is_i = kind == f32(MAT_ISOTROPIC)
            newx = jnp.where(is_i, ix_, newx)
            newy = jnp.where(is_i, iy_, newy)
            newz = jnp.where(is_i, iz_, newz)
        else:
            del ix_, iy_, iz_

        att_r = jnp.where(is_d, 1.0, texr)
        att_g = jnp.where(is_d, 1.0, texg)
        att_b = jnp.where(is_d, 1.0, texb)
        # boolean algebra, not where(pred, ..., True): Mosaic has no i1
        # select_n (shade.py's where() form is forward-identical)
        scattered = (~is_m | metal_ok) & ~is_light
        alive2 = alive & scattered
        thr2_r = jnp.where(alive2, thr_r * att_r, thr_r)
        thr2_g = jnp.where(alive2, thr_g * att_g, thr_g)
        thr2_b = jnp.where(alive2, thr_b * att_b, thr_b)
        o2x = jnp.where(alive2, px, ox)
        o2y = jnp.where(alive2, py, oy)
        o2z = jnp.where(alive2, pz, oz)
        d2x = jnp.where(alive2, newx, dx)
        d2y = jnp.where(alive2, newy, dy)
        d2z = jnp.where(alive2, newz, dz)
        out = (o2x, o2y, o2z, d2x, d2y, d2z, thr2_r, thr2_g, thr2_b,
               dacc_r, dacc_g, dacc_b)
        return out, alive2

    return bounce


def _unpack_aux(refs, has_noise, has_image):
    """Read the optional Perlin/image table refs (in in_specs order after
    ``rep``) into the values tuple `_make_bounce` closes over."""
    aux, ri = [], 0
    if has_noise:
        aux += [refs[0][...], refs[1][...]]
        ri = 2
    else:
        aux += [None, None]
    if has_image:
        aux.append(refs[ri][...])
        ri += 1
    else:
        aux.append(None)
    return tuple(aux), refs[ri:]


def _fwd_kernel_factory(S, NP, K, t_min, has_checker, has_noise,
                        has_image, img_dims, med_key, med_base, n_noise):
    bounce = _make_bounce(S, NP, t_min, has_checker, has_noise,
                          has_image, img_dims, med_key, med_base, n_noise)

    def kernel(samp_ref, rf_ref, pc_ref, tape_ref, rep_ref, bg_ref, *rest):
        aux, (acc_ref,) = _unpack_aux(rest, has_noise, has_image)
        bg3 = (bg_ref[0:SUB, :], bg_ref[SUB:2 * SUB, :],
               bg_ref[2 * SUB:3 * SUB, :])
        row = lambda r: rf_ref[r * SUB:(r + 1) * SUB, :]
        ox, oy, oz = row(0), row(1), row(2)
        dx, dy, dz = row(3), row(4), row(5)
        tmv = row(6)
        pix_ctr = pltpu.bitcast(pc_ref[0:SUB, :], jnp.uint32)
        samp_u = pltpu.bitcast(
            jnp.full_like(pc_ref[0:SUB, :], samp_ref[0, 0]), jnp.uint32)
        rep_v = rep_ref[...]
        R = ox.shape[1]
        one = jnp.ones((SUB, R), jnp.float32)
        zero = jnp.zeros((SUB, R), jnp.float32)
        thr = (one, one, one)
        acc = (zero, zero, zero)
        # bool constants lower through an i8->i1 truncation Mosaic lacks;
        # a compare produces i1 directly
        act = zero == zero
        state = (ox, oy, oz, dx, dy, dz, tmv, *thr)
        for k in range(K):
            win = tape_ref[k * SUB:(k + 1) * SUB, :]
            out, act = bounce(state, rep_v, bg3, win, act, pix_ctr, samp_u,
                              k, aux)
            state = (*out[:6], tmv, *out[6:9])
            acc = (acc[0] + out[9], acc[1] + out[10], acc[2] + out[11])
        for c in range(3):
            acc_ref[c * SUB:(c + 1) * SUB, :] = acc[c]

    return kernel


def _bwd_kernel_factory(S, NP, K, t_min, has_checker, has_noise,
                        has_image, img_dims, med_key, med_base, n_noise):
    bounce = _make_bounce(S, NP, t_min, has_checker, has_noise,
                          has_image, img_dims, med_key, med_base, n_noise)

    def kernel(samp_ref, rf_ref, pc_ref, tape_ref, rep_ref, bg_ref, *rest):
        aux, (g_ref, drf_ref, drep_ref, dbg_ref, st_ref) = _unpack_aux(
            rest, has_noise, has_image)
        bg3 = (bg_ref[0:SUB, :], bg_ref[SUB:2 * SUB, :],
               bg_ref[2 * SUB:3 * SUB, :])
        row = lambda r: rf_ref[r * SUB:(r + 1) * SUB, :]
        ox, oy, oz = row(0), row(1), row(2)
        dx, dy, dz = row(3), row(4), row(5)
        tmv = row(6)
        pix_ctr = pltpu.bitcast(pc_ref[0:SUB, :], jnp.uint32)
        samp_u = pltpu.bitcast(
            jnp.full_like(pc_ref[0:SUB, :], samp_ref[0, 0]), jnp.uint32)
        rep_v = rep_ref[...]
        R = ox.shape[1]
        one = jnp.ones((SUB, R), jnp.float32)
        zero = jnp.zeros((SUB, R), jnp.float32)

        # ---- forward recompute, states checkpointed in VMEM scratch
        # (rows per bounce: o3 d3 thr3 act -> 10)
        state = (ox, oy, oz, dx, dy, dz, tmv, one, one, one)
        # bool constants lower through an i8->i1 truncation Mosaic lacks;
        # a compare produces i1 directly
        act = zero == zero
        for k in range(K):
            vals = (state[0], state[1], state[2], state[3], state[4],
                    state[5], state[7], state[8], state[9],
                    act.astype(jnp.float32))
            for r, v in enumerate(vals):
                st_ref[(k * 10 + r) * SUB:(k * 10 + r + 1) * SUB, :] = v
            win = tape_ref[k * SUB:(k + 1) * SUB, :]
            out, act = bounce(state, rep_v, bg3, win, act, pix_ctr, samp_u,
                              k, aux)
            state = (*out[:6], tmv, *out[6:9])

        g_r = g_ref[0:SUB, :]
        g_g = g_ref[SUB:2 * SUB, :]
        g_b = g_ref[2 * SUB:3 * SUB, :]

        # ---- reverse sweep: trace-time jax.vjp of the pure bounce
        d_o = (zero, zero, zero)
        d_d = (zero, zero, zero)
        d_thr = (zero, zero, zero)
        d_tmv = zero
        d_rep = jnp.zeros((NP, REP_COLS), jnp.float32)
        d_bg = (zero, zero, zero)
        for k in reversed(range(K)):
            srow = lambda r: st_ref[(k * 10 + r) * SUB:
                                    (k * 10 + r + 1) * SUB, :]
            st_k = (srow(0), srow(1), srow(2), srow(3), srow(4), srow(5),
                    tmv, srow(6), srow(7), srow(8))
            act_k = srow(9) > 0.5
            win = tape_ref[k * SUB:(k + 1) * SUB, :]

            def f(diff, rep_arg, bg_arg, _win=win, _act=act_k, _k=k):
                out, _ = bounce(diff, rep_arg, bg_arg, _win, _act, pix_ctr,
                                samp_u, _k, aux)
                return out

            _, vjp_fn = jax.vjp(f, st_k, rep_v, bg3)
            cot = (d_o[0], d_o[1], d_o[2], d_d[0], d_d[1], d_d[2],
                   d_thr[0], d_thr[1], d_thr[2], g_r, g_g, g_b)
            d_diff, d_rep_k, d_bg_k = vjp_fn(cot)
            d_o = (d_diff[0], d_diff[1], d_diff[2])
            d_d = (d_diff[3], d_diff[4], d_diff[5])
            d_tmv = d_tmv + d_diff[6]
            d_thr = (d_diff[7], d_diff[8], d_diff[9])
            d_rep = d_rep + d_rep_k
            d_bg = (d_bg[0] + d_bg_k[0], d_bg[1] + d_bg_k[1],
                    d_bg[2] + d_bg_k[2])

        for r, v in enumerate((*d_o, *d_d, d_tmv)):
            drf_ref[r * SUB:(r + 1) * SUB, :] = v
        for c in range(3):
            dbg_ref[c * SUB:(c + 1) * SUB, :] = d_bg[c]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            drep_ref[...] = jnp.zeros_like(drep_ref)

        drep_ref[...] = drep_ref[...] + d_rep

    return kernel


@functools.lru_cache(maxsize=32)
def _replay_pallas_fn(S, NP, K, t_min, has_checker, has_noise,
                      has_image, img_dims, med_key, med_base, interpret,
                      n_noise=1):
    """custom_vjp'd replay for one static configuration.  ``bg`` is the
    background broadcast to [3, N] lane rows — differentiable (a camera
    leaf, trainable and possibly traced).  ``aux`` is the tuple of
    Perlin/image tables present for the scene (possibly empty): they
    ride as pallas inputs but carry zero cotangents — the tables are not
    trainable (train.DIFF_SCENE_FIELDS).  ``med_key`` is the tuple of
    per-medium constant rows (boundary geometry + -1/rho, `_med_key`);
    ``med_base`` the first medium winner id in the tape's id space."""
    fwd_kernel = _fwd_kernel_factory(S, NP, K, t_min, has_checker,
                                     has_noise, has_image, img_dims,
                                     med_key, med_base, n_noise)
    bwd_kernel = _bwd_kernel_factory(S, NP, K, t_min, has_checker,
                                     has_noise, has_image, img_dims,
                                     med_key, med_base, n_noise)

    smem = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)
    tile = lambda r: pl.BlockSpec((r * SUB, R_LANES), lambda g: (0, g),
                                  memory_space=pltpu.VMEM)
    fullspec = lambda t: pl.BlockSpec(t.shape, lambda g: (0, 0),
                                      memory_space=pltpu.VMEM)

    def run_fwd(rep, rf, pc, tape, samp, bg, aux):
        M = rf.shape[1]
        n_tiles = M // R_LANES
        return pl.pallas_call(
            fwd_kernel,
            grid=(n_tiles,),
            in_specs=[smem, tile(7), tile(1), tile(K), fullspec(rep),
                      tile(3), *[fullspec(a) for a in aux]],
            out_specs=tile(3),
            out_shape=jax.ShapeDtypeStruct((3 * SUB, M), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(samp, rf, pc, tape, rep, bg, *aux)

    def run_bwd(rep, rf, pc, tape, samp, bg, aux, g):
        M = rf.shape[1]
        n_tiles = M // R_LANES
        drf, drep, dbg = pl.pallas_call(
            bwd_kernel,
            grid=(n_tiles,),
            in_specs=[smem, tile(7), tile(1), tile(K), fullspec(rep),
                      tile(3), *[fullspec(a) for a in aux], tile(3)],
            out_specs=[
                tile(7),
                pl.BlockSpec((NP, REP_COLS), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                tile(3),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((7 * SUB, M), jnp.float32),
                jax.ShapeDtypeStruct((NP, REP_COLS), jnp.float32),
                jax.ShapeDtypeStruct((3 * SUB, M), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((K * 10 * SUB, R_LANES),
                                       jnp.float32)],
            interpret=interpret,
            # Raised scoped-VMEM ceiling for the reverse sweep.  The
            # dominant term (per-bounce one-hot winner-read residuals,
            # ~37 MB at final-scene NP ~3.4k vs Mosaic's 16 MB default)
            # is gone now that `_winner_read_fn`'s custom VJP
            # rematerializes the one-hots, but the turbulence/image
            # fetch residuals still scale with scene features; the
            # ceiling keeps several x of slack well inside the v5e
            # core's 128 MB VMEM (inputs total <4 MB and a single
            # sequential grid axis needs no double-buffer headroom).
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(samp, rf, pc, tape, rep, bg, *aux, g)
        return drf, drep, dbg

    @jax.custom_vjp
    def f(rep, rf, pc, tape, samp, bg, *aux):
        return run_fwd(rep, rf, pc, tape, samp, bg, aux)

    def f_fwd(rep, rf, pc, tape, samp, bg, *aux):
        return (run_fwd(rep, rf, pc, tape, samp, bg, aux),
                (rep, rf, pc, tape, samp, bg, aux))

    def f_bwd(res, g):
        rep, rf, pc, tape, samp, bg, aux = res
        drf, drep, dbg = run_bwd(rep, rf, pc, tape, samp, bg, aux, g)
        zi = lambda x: np.zeros(x.shape, jax.dtypes.float0)
        zf = lambda x: (np.zeros(x.shape, jax.dtypes.float0)
                        if jnp.issubdtype(x.dtype, jnp.integer)
                        else jnp.zeros(x.shape, x.dtype))
        return (drep, drf, zi(pc), zi(tape), zi(samp), dbg,
                *[zf(a) for a in aux])

    f.defvjp(f_fwd, f_bwd)
    return f


def replay_pallas(scene, meta, tape, o, d, time, pix_ctr, sample, *,
                  max_bounces: int, t_min: float, kernel_space=None):
    """Drop-in differentiable replacement for `replay.replay` on supported
    scenes: radiance [B, 3] with winners fixed by ``tape`` [K, B], forward
    and backward as fused Pallas kernels.  Scene-leaf gradients flow
    through `replay.derive_replay`'s (XLA, differentiable) table assembly.

    ``kernel_space=(remap, s_pad)`` (from `mega2.mega2_kernel_id_space`)
    declares the tape to be RAW mega2 trace-kernel row ids: the merged
    table is permuted into kernel row order (a differentiable [NP]-row
    gather — trivial) instead of remapping the [K, B] tape to global ids
    (a ~99 ms/step gather at 1.8M lanes).
    """
    from .replay import derive_replay

    assert replay_pallas_supported(meta)
    rep, med_rows = derive_replay(scene, meta)
    M = int(meta.n_media)
    if M > 0:
        # append the M medium material rows to the merged table: geometry
        # cols zero (medium t is recomputed from kernel constants), col 12
        # the mat id, cols 13.. the differentiable isotropic material row
        # — medium albedo (tex_c0, trainable) flows through d_rep exactly
        # like every surface material
        med_ext = jnp.concatenate([
            jnp.zeros((M, 12), rep.dtype),
            jnp.asarray(scene.med_mat, rep.dtype)[:, None],
            med_rows.astype(rep.dtype)], axis=1)
        rep = jnp.concatenate([rep, med_ext], axis=0)
    if kernel_space is not None:
        remap, s_pad = kernel_space
        # remap may be traced (it changes with the Morton order when
        # geometry params move between optimizer steps); s_pad is static.
        # Its trailing M entries are the media (mega2_kernel_id_space).
        perm = jnp.maximum(jnp.asarray(remap, jnp.int32), 0)
        rep = rep[perm]          # padding rows hold row 0 — never selected
        S = int(s_pad)
        NP = int(perm.shape[0])
    else:
        S = scene.sph_c0.shape[0]
        NP = rep.shape[0]
    med_base = NP - M  # media are the table's trailing M rows (either space)
    med_key = _med_key(scene, meta) if M > 0 else ()
    B = o.shape[0]
    K = max_bounces
    N = -(-B // TILE_RAYS) * TILE_RAYS
    padB = N - B

    f32 = jnp.float32
    rf = jnp.concatenate([
        o.T.astype(f32), d.T.astype(f32),
        jnp.asarray(time, f32)[None, :]], axis=0)          # [7, B]
    rf = jnp.pad(rf, ((0, 0), (0, padB)))
    if padB:
        # padding lanes get a unit-z direction: zero directions make the
        # sphere quadratic degenerate (a = 0), and although every padded
        # result is masked (win = -1, cotangent sliced off), keeping the
        # forward values finite is what keeps the shared d_rep/d_bg
        # accumulations NaN-free in reverse mode
        rf = rf.at[5, B:].set(1.0)
    pc = jnp.pad(lax.bitcast_convert_type(
        jnp.asarray(pix_ctr, jnp.uint32), jnp.int32)[None, :],
        ((0, 0), (0, padB)))
    tape_p = jnp.pad(jnp.asarray(tape, jnp.int32), ((0, 0), (0, padB)),
                     constant_values=-1)
    samp = jnp.asarray(sample, jnp.int32).reshape(1, 1)
    # background: differentiable [3, N] lane rows (a trainable camera
    # leaf — traced under the train step's jit, so it can't be a baked
    # kernel constant); its per-lane cotangent sums back through this
    # broadcast in XLA
    bg = jnp.broadcast_to(
        jnp.asarray(scene.camera.background, f32).reshape(3, 1), (3, N))

    # Perlin/image tables in the mega2 kernel packing (lane-gatherable
    # semantic rows / stacked bf16 byte planes) — constants, not trainable
    aux, img_dims = (), ()
    if meta.has_noise or meta.has_image:
        from .mega2 import pack_texture_tables

        perm_tab, vec_tab, img_tab, img_key = pack_texture_tables(
            scene, meta)
        if meta.has_noise:
            aux += (perm_tab, vec_tab)
        if meta.has_image:
            aux += (img_tab,)
            # img_key is per-image (iw, ih, ih_pad, off) — one static
            # fetch pass per image, winner-selected in-kernel
            img_dims = tuple(tuple(int(x) for x in row) for row in img_key)

    fn = _replay_pallas_fn(S, NP, K, float(t_min),
                           bool(meta.has_checker), bool(meta.has_noise),
                           bool(meta.has_image), img_dims, med_key, med_base,
                           jax.default_backend() != "tpu",
                           n_noise=max(int(meta.n_noise), 1)
                           if meta.has_noise else 1)
    acc = fn(rep, _tile_pack(rf), _tile_pack(pc), _tile_pack(tape_p), samp,
             _tile_pack(bg), *aux)
    return _tile_unpack(acc, 3)[:, :B].T
