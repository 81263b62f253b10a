"""Primary-ray generation (the reference's Camera::GetRay + the per-pixel
jitter of the Render kernel, Camera.h:76-85 and kernel.cu:138-142) as one
batched stage producing the ray wavefront."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rng
from ..core.camera import CameraParams
from ..core.samplers import unit_disk


def generate_rays(
    cam: CameraParams,
    pix: jnp.ndarray,      # [B] int32 pixel index j*W + i (j bottom-up)
    sample: jnp.ndarray,   # scalar or [B] sample index
    width: int,
    height: int,
    seed: int,
):
    """Returns (origin [B,3], direction [B,3], time [B], pix_ctr [B] u32).

    Draw layout: CAMERA_STREAM -> (jitter_u, jitter_v, lens_u1, lens_u2);
    CAMERA_STREAM+1 -> shutter time (see core/rng.py).
    """
    dtype = cam.origin.dtype
    pix_ctr = pix.astype(jnp.uint32) ^ jnp.uint32(seed)
    samp = jnp.asarray(sample, jnp.uint32)
    ju, jv, l1, l2 = rng.uniform4(
        pix_ctr, samp, jnp.uint32(rng.CAMERA_STREAM), jnp.uint32(0), float_dtype=dtype
    )
    tu = rng.uniform4(
        pix_ctr, samp, jnp.uint32(rng.CAMERA_STREAM + 1), jnp.uint32(0), float_dtype=dtype
    )[0]

    i = (pix % width).astype(dtype)
    j = (pix // width).astype(dtype)
    s = (i + ju) / dtype.type(width)   # kernel.cu:140-141
    t = (j + jv) / dtype.type(height)

    rd = cam.lens_radius * unit_disk(l1, l2)          # Camera.h:78
    offset = cam.u * rd[..., 0:1] + cam.v * rd[..., 1:2]
    origin = cam.origin + offset
    direction = (
        cam.lower_left
        + s[..., None] * cam.horizontal
        + t[..., None] * cam.vertical
        - cam.origin
        - offset
    )                                                  # Camera.h:81-84
    time = cam.time0 + tu * (cam.time1 - cam.time0)    # Camera.h:80
    return origin, direction, time, pix_ctr
