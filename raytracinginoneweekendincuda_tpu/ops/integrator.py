"""The path integrator: iterative bounce loop with throughput/emission
accumulators — the batched equivalent of `RayColor` (kernel.cu:65-98).

Semantics preserved exactly:
  * at most 50 bounces (config), t_min = 1e-3 shadow epsilon (kernel.cu:71,74)
  * miss  -> accumulated += throughput * background, terminate (74-79)
  * hit   -> accumulated += throughput * emitted (82-83)
  * no scatter (light / absorbed metal) -> terminate (87-91)
  * else    throughput *= attenuation; ray = scattered (93-94)
  * loop exhaustion returns the emission accumulator (97)
  * no Russian roulette / NEE / importance sampling (out of reference scope)

Two loop forms over the same body:
  * `lax.while_loop` with an any-alive early exit — the fast inference path
    (most wavefronts die in a handful of bounces);
  * `lax.scan` over a static bounce count with per-bounce rematerialization
    (`jax.checkpoint`) — the reverse-differentiable path for gradient work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core import rng
from ..scene.compiler import SceneArrays
from . import hit as hit_ops
from .shade import shade


def bounce_step(
    scene, meta, hit_fn, o, d, time, thr, acc, alive, pix_ctr, samp, bounce,
    *, t_min: float,
):
    """One hit+shade bounce over a ray batch (the loop body of RayColor,
    kernel.cu:71-95), shared by the chunked engines (`trace`, scalar
    ``samp``/``bounce``) and the persistent-wavefront engine
    (`ops/wavefront.py`, per-lane ``samp``/``bounce`` arrays — lanes at
    different samples/depths advance together; the RNG counters keep every
    draw identical to the chunked schedule)."""
    dtype = o.dtype
    background = scene.camera.background
    n_media = max(meta.n_media, 1)
    med_slots = jnp.arange(n_media, dtype=jnp.uint32)[None, :]
    bounce_u = jnp.asarray(bounce, jnp.uint32)

    stream_med = jnp.uint32(rng.MEDIUM_STREAM) | bounce_u
    u_med = rng.uniform_open4(
        pix_ctr[:, None], samp[..., None],
        jnp.asarray(stream_med)[..., None] if stream_med.ndim else stream_med,
        med_slots, float_dtype=dtype,
    )[0]
    rec = hit_fn(o, d, time, dtype.type(t_min), u_med)
    return advance_from_record(
        scene, meta, rec, o, d, thr, acc, alive, pix_ctr, samp, bounce)


def advance_from_record(
    scene, meta, rec, o, d, thr, acc, alive, pix_ctr, samp, bounce
):
    """The miss/emit/scatter/advance tail of `bounce_step` (kernel.cu:74-95)
    given an already-built HitRecord — shared with the taped-replay
    differentiable path (`ops/replay.py`), whose record comes from a winner
    tape rather than a closest-hit search."""
    background = scene.camera.background
    bounce_u = jnp.asarray(bounce, jnp.uint32)

    miss = alive & ~rec.hit
    acc = acc + jnp.where(miss[:, None], thr * background, 0.0)
    alive = alive & rec.hit

    stream_sc = jnp.uint32(rng.SCATTER_STREAM) | bounce_u
    u1, u2, u3, u4 = rng.uniform4(
        pix_ctr, samp, stream_sc, jnp.uint32(0), float_dtype=o.dtype
    )
    sc = shade(scene, meta, rec, d, u1, u2, u3, u4)

    acc = acc + jnp.where(alive[:, None], thr * sc.emitted, 0.0)
    alive = alive & sc.scattered
    thr = jnp.where(alive[:, None], thr * sc.attenuation, thr)
    o = jnp.where(alive[:, None], rec.p, o)
    d = jnp.where(alive[:, None], sc.direction, d)
    return o, d, thr, acc, alive


def trace(
    scene: SceneArrays,
    meta,
    o,
    d,
    time,
    pix_ctr,
    sample,
    *,
    max_bounces: int,
    t_min: float,
    differentiable: bool = False,
    hit_fn=None,
):
    """Radiance [B,3] for a batch of primary rays.

    ``hit_fn(o, d, time, t_min, u_med) -> HitRecord`` swaps the closest-hit
    engine (brute-force by default; threaded BVH via `ops/bvh_engine.py`);
    the bounce-loop semantics are engine-independent.
    """
    dtype = o.dtype
    B = o.shape[0]
    background = scene.camera.background
    if hit_fn is None:
        der = hit_ops.derive(scene)

        def hit_fn(o, d, time, tm, u_med):
            return hit_ops.closest_hit(scene, meta, der, o, d, time, tm, u_med)

    samp = jnp.asarray(sample, jnp.uint32)

    def bounce_body(bounce, o, d, thr, acc, alive):
        return bounce_step(
            scene, meta, hit_fn, o, d, time, thr, acc, alive,
            pix_ctr, samp, bounce, t_min=t_min,
        )

    thr0 = jnp.ones((B, 3), dtype)
    acc0 = jnp.zeros((B, 3), dtype)
    alive0 = jnp.ones((B,), bool)

    if differentiable:
        body = jax.checkpoint(
            lambda carry, bounce: (bounce_body(bounce, *carry), None),
            prevent_cse=False,
        )
        (o, d, thr, acc, alive), _ = lax.scan(
            body, (o, d, thr0, acc0, alive0), jnp.arange(max_bounces)
        )
        return acc

    def cond(state):
        bounce, _, _, _, _, alive = state
        return (bounce < max_bounces) & alive.any()

    def body(state):
        bounce, o, d, thr, acc, alive = state
        o, d, thr, acc, alive = bounce_body(bounce, o, d, thr, acc, alive)
        return bounce + 1, o, d, thr, acc, alive

    state = (jnp.int32(0), o, d, thr0, acc0, alive0)
    _, _, _, _, acc, _ = lax.while_loop(cond, body, state)
    return acc
