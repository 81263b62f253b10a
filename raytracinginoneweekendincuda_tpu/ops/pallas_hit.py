"""Pallas TPU kernel: fused brute-force closest-hit over spheres + quads.

The XLA brute-force engine (`ops/hit.py`) is HBM-bound: every bounce step
materializes ~a dozen [B, S] f32 intermediates (measured ~28 GB of traffic
per step on scene 0).  This kernel keeps the entire scene SoA resident in
VMEM (the reference caps worlds at 512+ primitives, kernel.cu:628 — a few
tens of KB) and streams ray tiles through the VPU, so the only HBM traffic
is the rays in and the winner (t, prim) out: ~40 bytes/ray/step instead of
~50 KB.

Layout choices (see /opt/skills/guides/pallas_guide.md):
  * pair work is oriented [TILE_B sublanes x 128 primitive lanes] — ray
    scalars broadcast along lanes ([T,1]), primitive columns are natural
    [1,128] slices of a [rows, S_pad] table;
  * primitive tables are row-major parameter matrices padded to lane
    multiples, with an explicit `active` row (padding rows must be dead by
    mask, not by construction: a radius-0 sphere at 1e8 can still produce a
    catastrophically-cancelled f32 false positive);
  * the winner reduction carries (t_best, prim_best) as [T, 1] and reduces
    each 128-wide chunk with min + first-index-of-min (strict < across
    chunks keeps argmin's first-winner tie rule).

Math per pair matches Sphere.h:29-59 / MovingSphere.h:52-58 / Quad.h:52-99
(same formulas as the XLA engines; f32 rounding differs only in summation
order, so winners can flip on ulp-level ties — same contract as the BVH
engine, tested in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.compiler import SceneArrays
from . import hit as hit_ops

LANES = 128
BIG = hit_ops.BIG


def _pad_cols(a: np.ndarray, n: int) -> np.ndarray:
    return np.pad(a, [(0, 0), (0, n - a.shape[1])])


def pack_geometry(scene: SceneArrays):
    """Scene SoA -> (sphere table [10, Sp], quad table [13, Qp]) f32.

    Sphere rows: c0(3) dc(3) t0 inv_dt rad active.
    Quad rows:   n_unit(3) d_plane vxw(3) q_vxw wxu(3) q_wxu active.
    """
    f = np.float32
    s_cols = [
        np.asarray(scene.sph_c0, f).T,            # 3 rows
        np.asarray(scene.sph_dc, f).T,            # 3 rows
        np.asarray(scene.sph_t0, f)[None],
        np.asarray(scene.sph_inv_dt, f)[None],
        np.asarray(scene.sph_rad, f)[None],
        np.asarray(scene.sph_active, f)[None],
    ]
    sph = np.concatenate(s_cols, 0)
    Sp = max(LANES, -(-sph.shape[1] // LANES) * LANES)
    sph = _pad_cols(sph, Sp)

    import jax.numpy as _jnp  # derived quad frame, same math as derive_quads
    dq = hit_ops.derive_quads(
        scene._replace(
            quad_u=_jnp.asarray(scene.quad_u, f),
            quad_v=_jnp.asarray(scene.quad_v, f),
            quad_q=_jnp.asarray(scene.quad_q, f),
        )
    )
    q_cols = [
        np.asarray(dq["n_unit"], f).T,
        np.asarray(dq["d_plane"], f)[None],
        np.asarray(dq["vxw"], f).T,
        np.asarray(dq["q_vxw"], f)[None],
        np.asarray(dq["wxu"], f).T,
        np.asarray(dq["q_wxu"], f)[None],
        np.asarray(scene.quad_active, f)[None],
    ]
    quad = np.concatenate(q_cols, 0)
    Qp = max(LANES, -(-quad.shape[1] // LANES) * LANES)
    quad = _pad_cols(quad, Qp)
    return jnp.asarray(sph), jnp.asarray(quad)


def _chunk_min_update(t_cand, ok, base, t_best, p_best):
    """Fold one [T, 128] candidate chunk into the [T, 1] winner carry."""
    T = t_cand.shape[0]
    t_cand = jnp.where(ok, t_cand, BIG)
    t_min = jnp.min(t_cand, axis=1, keepdims=True)            # [T,1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    idx = jnp.min(jnp.where(t_cand == t_min, lane, LANES), axis=1,
                  keepdims=True)                               # first min
    better = t_min < t_best
    p_new = base + idx
    return (jnp.where(better, t_min, t_best),
            jnp.where(better, p_new, p_best))


def _make_kernel(n_s_chunks: int, n_q_chunks: int, S_pad: int, t_min: float):
    def kernel(ray_ref, sph_ref, quad_ref, t_ref, p_ref):
        rays = ray_ref[...]                                    # [T, 8]
        T = rays.shape[0]
        ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
        dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
        tm = rays[:, 6:7]                                      # ray time
        a = dx * dx + dy * dy + dz * dz                        # [T,1]

        t0 = jnp.full((T, 1), BIG, jnp.float32)
        p0 = jnp.full((T, 1), -1, jnp.int32)

        def sph_chunk(c, carry):
            t_best, p_best = carry
            col = pl.ds(c * LANES, LANES)
            row = lambda r: sph_ref[r:r + 1, col]              # [1,128]
            frac = (tm - row(6)) * row(7)
            cx = row(0) + frac * row(3)                        # center(t)
            cy = row(1) + frac * row(4)
            cz = row(2) + frac * row(5)
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            b = ocx * dx + ocy * dy + ocz * dz                 # half-b
            rad = row(8)
            cc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc = b * b - a * cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = 1.0 / a
            r1 = (-b - sq) * inv_a
            r2 = (-b + sq) * inv_a
            t_cand = jnp.where(r1 > t_min, r1, r2)
            ok = (disc > 0.0) & (t_cand > t_min) & (row(9) > 0.5)
            return _chunk_min_update(t_cand, ok, c * LANES, t_best, p_best)

        def quad_chunk(c, carry):
            t_best, p_best = carry
            col = pl.ds(c * LANES, LANES)
            row = lambda r: quad_ref[r:r + 1, col]
            nx, ny, nz = row(0), row(1), row(2)
            denom = dx * nx + dy * ny + dz * nz
            den_ok = jnp.abs(denom) >= hit_ops.QUAD_PARALLEL_EPS
            t_c = (row(3) - (ox * nx + oy * ny + oz * nz)) / jnp.where(
                den_ok, denom, 1.0)
            px, py, pz = ox + t_c * dx, oy + t_c * dy, oz + t_c * dz
            alpha = px * row(4) + py * row(5) + pz * row(6) - row(7)
            beta = px * row(8) + py * row(9) + pz * row(10) - row(11)
            ok = (den_ok & (t_c >= t_min)
                  & (alpha >= 0.0) & (alpha <= 1.0)
                  & (beta >= 0.0) & (beta <= 1.0) & (row(12) > 0.5))
            return _chunk_min_update(t_c, ok, S_pad + c * LANES, t_best, p_best)

        carry = jax.lax.fori_loop(0, n_s_chunks, sph_chunk, (t0, p0))
        carry = jax.lax.fori_loop(0, n_q_chunks, quad_chunk, carry)
        t_best, p_best = carry
        t_ref[...] = t_best
        p_ref[...] = p_best

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "tile", "interpret"))
def pallas_closest_geo(ray_pack, sph_tab, quad_tab, *, t_min: float,
                       tile: int = 512, interpret: bool = False):
    """(t_best [B], prim [B]) over all spheres+quads.

    ``ray_pack``: [B, 8] f32 = ox oy oz dx dy dz time pad; B % tile == 0.
    ``prim`` is a *padded-table* global id: sphere lane, or S_pad + quad
    lane; -1 when nothing was hit.
    """
    B = ray_pack.shape[0]
    S_pad = sph_tab.shape[1]
    Q_pad = quad_tab.shape[1]
    kernel = _make_kernel(S_pad // LANES, Q_pad // LANES, S_pad, t_min)
    grid = (B // tile,)
    t, p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sph_tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(quad_tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(ray_pack, sph_tab, quad_tab)
    return t[:, 0], p[:, 0]


def make_pallas_hit_fn(scene: SceneArrays, meta, sph_tab, quad_tab, *,
                       t_min: float, interpret: bool = False, tile: int = 512):
    """Build ``hit_fn(o, d, time, t_min, u_med) -> HitRecord`` around the
    Pallas winner kernel (record assembly + media stay in XLA: [B]-sized).

    ``sph_tab``/``quad_tab`` come from `pack_geometry` (host-side, numpy
    scene) so this builder is safe to call on traced values inside jit."""
    S_pad = sph_tab.shape[1]
    S = scene.sph_c0.shape[0]
    der = hit_ops.derive(scene)

    def hit_fn(o, d, time, tm, u_med):
        ray_pack = jnp.concatenate(
            [o, d, time[:, None], jnp.zeros_like(time)[:, None]], axis=1
        ).astype(jnp.float32)
        t_geo, p = pallas_closest_geo(ray_pack, sph_tab, quad_tab,
                                      t_min=t_min, tile=tile,
                                      interpret=interpret)
        # padded-table id -> compiled-scene global id (spheres first)
        best_p = jnp.where(p >= S_pad, p - S_pad + S, p)
        best_p = jnp.where(p < 0, -1, best_p)
        return hit_ops.record_from_geo_winner(
            scene, meta, der, o, d, time, tm, u_med,
            t_geo.astype(o.dtype), best_p)

    return hit_fn
