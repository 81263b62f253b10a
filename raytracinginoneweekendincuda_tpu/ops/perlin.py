"""Perlin lattice noise evaluation (batched).

The table *build* lives on the host (`scene/perlin.py`); this is the hot
lookup: XOR-hashed permutation indexing into the gradient table
(Perlin.h:49-57), Hermite-smoothed gradient-dot trilinear interpolation
(Perlin.h:120-139), and the 7-octave turbulence sum (Perlin.h:64-78) — all
vectorized over rays with gathers instead of the reference's scalar loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def noise(perlin_vec, px, py, pz, nid, p):
    """Perlin noise in [-1, 1] at points ``p`` [B,3] using table ``nid`` [B]."""
    fl = jnp.floor(p)
    uvw = p - fl
    ijk = fl.astype(jnp.int32)
    i, j, k = ijk[..., 0], ijk[..., 1], ijk[..., 2]

    # Hermite cubic smoothing (Perlin.h:122-124)
    s = uvw * uvw * (3.0 - 2.0 * uvw)
    su, sv, sw = s[..., 0], s[..., 1], s[..., 2]

    accum = jnp.zeros(p.shape[:-1], p.dtype)
    for di in (0, 1):
        xi = px[nid, (i + di) & 255]
        wu = su if di else (1.0 - su)
        for dj in (0, 1):
            yj = py[nid, (j + dj) & 255]
            wv = sv if dj else (1.0 - sv)
            for dk in (0, 1):
                zk = pz[nid, (k + dk) & 255]
                ww = sw if dk else (1.0 - sw)
                grad = perlin_vec[nid, xi ^ yj ^ zk]          # [B,3]
                weight = jnp.stack(
                    (uvw[..., 0] - di, uvw[..., 1] - dj, uvw[..., 2] - dk), -1
                )
                accum = accum + wu * wv * ww * (grad * weight).sum(-1)
    return accum


def turbulence(perlin_vec, px, py, pz, nid, p, depth: int = 7):
    """|sum_i 0.5^i noise(2^i p)| (Perlin.h:64-78)."""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        accum = accum + weight * noise(perlin_vec, px, py, pz, nid, q)
        weight *= 0.5
        q = q * 2.0
    return jnp.abs(accum)
