"""Taped-replay differentiable path: decouple the discrete path decisions
from the differentiable radiance computation.

The scan+checkpoint path (`integrator.trace(differentiable=True)`) drags the
full closest-hit SEARCH — [B, S] candidate tensors per bounce, plus their
reverse-mode residuals — through the autodiff graph, although the search
only *selects* which primitive each segment hits.  Pathwise gradients hold
the discrete path fixed (SURVEY.md §7.4: visibility discontinuities are
ignored, as in standard differentiable-PT practice), so the winner argmin is
locally constant a.e. and contributes nothing to the gradient.

This module splits the work accordingly:

  * `generate_tape` runs the bounce loop once, non-differentiably, and
    records each bounce's winner as a GLOBAL prim id [max_bounces, B] i32
    (sphere rows, then quads, then media; -1 = miss).  Any engine that can
    name its winner can produce this tape — the XLA closest-hit here, or
    the mega2 Pallas trace kernel.  The tape is integer-valued, so autodiff
    never looks inside its producer.
  * `replay` recomputes the radiance with the winners FIXED: per bounce one
    [B]-row gather of the winner primitive, an analytic re-intersection
    (O(1) per segment — no [B, S] tensors anywhere), and the exact shade /
    accumulate tail shared with the other engines
    (`integrator.advance_from_record`).  This is the function gradients
    flow through.

Gradients agree with the search-based path a.e. (the argmin is piecewise
constant); the primal radiance agrees up to f32 rounding in the winner's
re-intersection (coefficient-form vs direct-form quadratic).

Reference parity: the bounce semantics are RayColor's (kernel.cu:65-98);
intersection math per Sphere.h:29-58 / Quad.h:52-83 / ConstantMedium.h:52-94.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core import rng
from ..core import vecmath as vm
from ..scene.compiler import SceneArrays
from . import hit as hit_ops
from .hit import BIG, QUAD_PARALLEL_EPS, Derived, HitRecord
from .integrator import advance_from_record


def taped_record(scene: SceneArrays, meta, der: Derived, o, d, time, t_min,
                 u_med, w) -> HitRecord:
    """HitRecord for a KNOWN winner ``w`` [B] i32 (global id, -1 = miss).

    Re-intersects only the winner primitive (three [B]-row gathers), then
    assembles the record through the same `assemble_record` the search
    engines use.  The tape is authoritative: no validity re-gating — the
    winner's t is recomputed with the standard NaN-safe guards but its
    hit/miss status comes from ``w`` alone.
    """
    dt = o.dtype
    S = scene.sph_c0.shape[0]
    Q = scene.quad_q.shape[0]
    hit = w >= 0
    kind = jnp.where(w < S, 0, jnp.where(w < S + Q, 1, 2))
    i_s = jnp.clip(w, 0, S - 1)
    i_q = jnp.clip(w - S, 0, max(Q - 1, 0))

    # ---- sphere re-intersection (Sphere.h:29-58, direct oc form).
    # One packed row-gather (same table + indices as `assemble_record`'s,
    # so XLA CSEs the two into one gather — and its backward into one
    # scatter-add); the previous five per-column gathers cost five
    # scatter-add transposes per bounce in reverse mode.
    srow = der.sph_tab[i_s]
    frac = (time - srow[:, 6]) * srow[:, 7]
    center = srow[:, 0:3] + frac[:, None] * srow[:, 3:6]
    rad = srow[:, 8]
    oc = o - center
    a = vm.dot(d, d)
    b = vm.dot(oc, d)
    c = vm.dot(oc, oc) - rad * rad
    disc = b * b - a * c
    pos = disc > 0.0
    sq = jnp.sqrt(jnp.where(pos, disc, 1.0))    # NaN-safe at masked lanes
    inv_a = 1.0 / a
    root1 = (-b - sq) * inv_a
    root2 = (-b + sq) * inv_a
    t_sph = jnp.where(root1 > t_min, root1, root2)

    # ---- quad re-intersection (Quad.h:52-64); one packed row-gather
    # (CSEd with `assemble_record`'s), d_plane recomputed from the row
    if Q > 0:
        qrow = der.quad_tab[i_q]
        n_u = qrow[:, 0:3]
        d_plane = vm.dot(n_u, qrow[:, 9:12])
        denom = vm.dot(d, n_u)
        dok = jnp.abs(denom) >= QUAD_PARALLEL_EPS
        t_quad = (d_plane - vm.dot(o, n_u)) / \
            jnp.where(dok, denom, 1.0)
    else:
        t_quad = jnp.zeros_like(t_sph)

    t = jnp.where(kind == 0, t_sph, t_quad)
    im_best = jnp.zeros_like(w)
    if meta.n_media > 0:
        # M <= 3 in every reference scene: recompute all medium candidates
        # (identical arithmetic to the tape generator -> identical t) and
        # gather the winner's column.
        i_m = jnp.clip(w - S - Q, 0, meta.n_media - 1)
        t_m = hit_ops.medium_candidates(scene, o, d, t_min, u_med)
        t_med = jnp.take_along_axis(t_m, i_m[:, None], axis=1)[:, 0]
        t = jnp.where(kind == 2, t_med, t)
        im_best = i_m
    t = jnp.where(hit, t, dt.type(BIG))

    return hit_ops.assemble_record(scene, meta, der, o, d, time, t, kind,
                                   i_s, i_q, im_best)


def _u_med(meta, pix_ctr, samp, bounce, dtype):
    """Per-(ray, medium) uniforms, bounce_step's draw layout exactly."""
    med_slots = jnp.arange(max(meta.n_media, 1), dtype=jnp.uint32)[None, :]
    stream = jnp.uint32(rng.MEDIUM_STREAM) | jnp.asarray(bounce, jnp.uint32)
    return rng.uniform_open4(
        pix_ctr[:, None], samp[..., None], stream, med_slots,
        float_dtype=dtype,
    )[0]


def generate_tape(scene: SceneArrays, meta, o, d, time, pix_ctr, sample, *,
                  max_bounces: int, t_min: float, hit_winner_fn=None):
    """Run the bounce loop once and record winners.

    Returns ``(tape [max_bounces, B] i32, radiance [B, 3])`` — the radiance
    is the search path's primal, used by tests to cross-check the replay.
    ``hit_winner_fn(o, d, time, t_min, u_med) -> (HitRecord, w)`` swaps the
    winner-producing engine (defaults to the XLA closest hit).
    """
    dtype = o.dtype
    B = o.shape[0]
    der = hit_ops.derive(scene)
    samp = jnp.asarray(sample, jnp.uint32)
    if hit_winner_fn is None:
        def hit_winner_fn(o, d, time, tm, u_med):
            return hit_ops.closest_hit_winner(
                scene, meta, der, o, d, time, tm, u_med)

    def body(carry, bounce):
        o, d, thr, acc, alive = carry
        u_med = _u_med(meta, pix_ctr, samp, bounce, dtype)
        rec, w = hit_winner_fn(o, d, time, dtype.type(t_min), u_med)
        w = jnp.where(alive, w, -1)
        carry = advance_from_record(
            scene, meta, rec, o, d, thr, acc, alive, pix_ctr, samp, bounce)
        return carry, w

    init = (o, d, jnp.ones((B, 3), dtype), jnp.zeros((B, 3), dtype),
            jnp.ones((B,), bool))
    (_, _, _, acc, _), tape = lax.scan(
        body, init, jnp.arange(max_bounces))
    return tape, acc


def replay(scene: SceneArrays, meta, tape, o, d, time, pix_ctr, sample, *,
           max_bounces: int, t_min: float):
    """Radiance [B,3] with the per-bounce winners fixed by ``tape`` — the
    differentiable leg of the taped path (O(1) work per segment)."""
    dtype = o.dtype
    B = o.shape[0]
    der = hit_ops.derive(scene)
    samp = jnp.asarray(sample, jnp.uint32)

    def body(carry, xs):
        bounce, w = xs
        o, d, thr, acc, alive = carry
        u_med = _u_med(meta, pix_ctr, samp, bounce, dtype)
        rec = taped_record(scene, meta, der, o, d, time, dtype.type(t_min),
                           u_med, w)
        carry = advance_from_record(
            scene, meta, rec, o, d, thr, acc, alive, pix_ctr, samp, bounce)
        return carry, None

    init = (o, d, jnp.ones((B, 3), dtype), jnp.zeros((B, 3), dtype),
            jnp.ones((B,), bool))
    (_, _, _, acc, _), _ = lax.scan(
        body, init, (jnp.arange(max_bounces), tape))
    return acc


def trace_taped(scene: SceneArrays, meta, o, d, time, pix_ctr, sample, *,
                max_bounces: int, t_min: float, hit_winner_fn=None):
    """Drop-in differentiable radiance: tape once (non-diff — the tape is
    integer-valued, so autodiff prunes its producer from the backward), then
    replay differentiably.  Same signature semantics as
    `integrator.trace(differentiable=True)` and ~O(S) cheaper per bounce in
    the backward."""
    tape, _ = generate_tape(
        scene, meta, lax.stop_gradient(o), lax.stop_gradient(d),
        lax.stop_gradient(time), pix_ctr, sample,
        max_bounces=max_bounces, t_min=t_min, hit_winner_fn=hit_winner_fn)
    tape = lax.stop_gradient(tape)
    return replay(scene, meta, tape, o, d, time, pix_ctr, sample,
                  max_bounces=max_bounces, t_min=t_min)
