"""Differentiable rendering: sharded gradient/train step over the mesh.

This is the framework's extension beyond the reference (BASELINE.json
north-star): pixel gradients w.r.t. scene parameters (sphere centers/radii,
material albedo/fuzz/IOR, quad frames, camera) flow through the bounce loop
(`ops/integrator.trace` in its scan+checkpoint form), and a full train step
runs SPMD on the ``(px, sp)`` mesh:

  * every chip differentiates its own pixel/sample shard's contribution,
  * the per-sample radiance is psum-averaged over ``sp`` *inside* the loss
    (MSE needs the mean before squaring),
  * parameter gradients are psum-reduced over both mesh axes (the gradient
    all-reduce rides ICI; this is the collective the reference never needed
    because it had no learnable state).

Visibility discontinuities are ignored as in standard differentiable
path-tracing practice (SURVEY.md §7.4); gradients are validated against
finite differences on smooth parameters in tests/test_grad.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.integrator import trace
from ..ops.raygen import generate_rays
from ..ops.replay import replay, trace_taped
from ..scene.compiler import SceneArrays, SceneMeta
from ..utils.config import RenderConfig
from .render import AXIS_PX, AXIS_SP

# Float leaves a user can optimize.  Integer/bool columns (kind tags, material
# ids, active masks) and RNG tables are structural, not parameters.
DIFF_SCENE_FIELDS = (
    "sph_c0", "sph_dc", "sph_rad",        # sphere geometry
    "quad_q", "quad_u", "quad_v",         # quad frames
    "mat_fuzz", "mat_ior",                # material scalars
    "tex_c0", "tex_c1",                   # albedo / emission colors
)


def split_params(scene: SceneArrays):
    """scene -> params pytree (the differentiable leaves, camera included —
    every CameraParams leaf is a float array).

    The scene itself is returned unmodified by the caller's hands: pass any
    scene with matching structure (typically the original) as the residual to
    ``merge_params(residual, params)``, which overlays the params onto it.
    """
    params = {f: getattr(scene, f) for f in DIFF_SCENE_FIELDS}
    params["camera"] = scene.camera
    return params


def merge_params(scene: SceneArrays, params) -> SceneArrays:
    kw = {f: params[f] for f in DIFF_SCENE_FIELDS}
    return scene._replace(camera=params["camera"], **kw)


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def make_train_step(
    scene: SceneArrays,
    meta: SceneMeta,
    cfg: RenderConfig,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    engine: str = "auto",
):
    """Build the jitted SPMD train step.

    Returns ``step(state, pix, target) -> (state, loss)`` where ``pix`` is a
    [B] pixel-id batch (B divisible by the px mesh dim) and ``target`` the
    matching [B,3] linear-radiance target.  Loss is MSE in linear radiance
    (the gamma sqrt is non-differentiable at 0 and excluded from the loss
    path; it remains a display epilogue).

    ``engine`` selects the differentiable trace:
      * ``"taped"`` — `ops/replay.trace_taped`: winner-taped, O(1) work
        and memory per segment in the primitive count.  After collapsing
        the replay's per-column winner gathers into the packed-table
        gathers `assemble_record` already issues (one gather — and one
        scatter-add transpose — per bounce), this ties or beats the scan
        path at every measured size on BOTH backends (docs/PERF.md), and
        is the only path whose cost does not grow with the scene.
      * ``"scan"`` — `ops/integrator.trace(differentiable=True)`:
        scan + checkpoint through the full closest-hit search.  O(S) per
        bounce; kept as the gradient oracle for parity tests.
      * ``"auto"`` (default) — taped.
    """
    if engine == "auto":
        engine = "taped"
    if engine == "taped":
        trace_diff = trace_taped
    elif engine == "scan":
        trace_diff = functools.partial(trace, differentiable=True)
    else:
        raise ValueError(f"unknown differentiable engine: {engine!r}")
    n_sp = mesh.shape[AXIS_SP]
    spp = cfg.samples_per_pixel
    if spp % n_sp != 0:
        raise ValueError(f"spp={spp} must be divisible by sample shards {n_sp}")
    local_spp = spp // n_sp
    W, H = cfg.width, cfg.height
    dcfg = cfg.with_(differentiable=True)

    def shard_body(params, scene_rest, pix, target):
        dtype = scene_rest.camera.origin.dtype if hasattr(scene_rest.camera, "origin") else jnp.float32
        sp_idx = lax.axis_index(AXIS_SP)

        def local_loss(p):
            sc = merge_params(scene_rest, p)

            def sample_body(s, acc):
                s_global = (sp_idx * local_spp + s).astype(jnp.uint32)
                o, d, time, pix_ctr = generate_rays(
                    sc.camera, pix, s_global, W, H, cfg.seed
                )
                col = trace_diff(
                    sc, meta, o, d, time, pix_ctr, s_global,
                    max_bounces=dcfg.max_bounces, t_min=dcfg.t_min,
                )
                return acc + col

            acc = lax.fori_loop(
                0, local_spp, sample_body,
                jnp.zeros((pix.shape[0], 3), sc.camera.origin.dtype),
            )
            col = lax.psum(acc, AXIS_SP) / sc.camera.origin.dtype.type(spp)
            diff = col - target
            # local-shard SSE; grads w.r.t. the *global* loss come from the
            # explicit psum of per-device grads below (psum's AD transpose
            # delivers each device its local-path cotangent).
            return (diff * diff).sum()

        sse, grads = jax.value_and_grad(local_loss)(params)
        denom = 3.0 * pix.shape[0] * mesh.shape[AXIS_PX]
        loss = lax.psum(sse, AXIS_PX) / denom          # replicated over sp
        grads = jax.tree.map(
            lambda g: lax.psum(g, (AXIS_PX, AXIS_SP)) / denom, grads
        )
        return loss, grads

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS_PX), P(AXIS_PX)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, scene_rest: SceneArrays, pix, target):
        loss, grads = sharded(state.params, scene_rest, pix, target)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def init_state(scene: SceneArrays, optimizer: optax.GradientTransformation) -> TrainState:
    params = split_params(scene)
    params = jax.tree.map(jnp.asarray, params)
    return TrainState(params, optimizer.init(params), jnp.int32(0))


def make_train_step_mega2(
    scene: SceneArrays,
    meta: SceneMeta,
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
):
    """Single-chip fast train step: Pallas winner tapes + replay gradient.

    Two phases per step (the tape's geometry/material tables are packed
    host-side from CONCRETE params, so tape generation cannot live inside
    the gradient jit):

      1. eager — `ops.mega2.mega2_tapes` runs the megakernel trace forward
         for ALL spp samples in ONE device dispatch and returns the winner
         tapes [spp, max_bounces, B];
      2. jitted — MSE loss through the replay: on TPU with a supported
         scene, `ops.pallas_replay.replay_pallas` (fused Pallas forward
         AND backward kernels behind a custom VJP); otherwise the XLA
         replay (one one-hot MXU table read per bounce; its backward is
         a matmul).  Optimizer update follows.

    The tape is a valid pathwise sample wherever it came from, so the
    gradient matches `trace_taped` a.e. (winner ties excepted —
    docs/PERF.md).  Requires a contiguous pixel block and
    `mega2_supported(meta)`; use `make_train_step` for SPMD meshes or
    scattered pixel batches.
    """
    from ..ops.mega2 import (
        mega2_kernel_id_space, mega2_supported, mega2_tapes,
    )
    from ..ops.pallas_replay import replay_pallas, replay_pallas_supported

    if not mega2_supported(meta):
        raise ValueError("scene unsupported by the mega2 trace kernel; "
                         "use make_train_step")
    spp = cfg.samples_per_pixel
    W, H = cfg.width, cfg.height
    # Pallas forward+backward replay on TPU where the kernel supports the
    # scene; the XLA replay otherwise (and on CPU, where interpret-mode
    # kernels are slow).  The Pallas path consumes KERNEL-space tapes —
    # the global-id remap is a [bounces, B] gather (~99 ms/step at 1.8M
    # lanes) replaced by a trivial table permutation.
    use_pallas = (replay_pallas_supported(meta)
                  and jax.default_backend() == "tpu")
    _, s_pad = mega2_kernel_id_space(scene, meta) if use_pallas else (None, 0)

    @jax.jit
    def grad_step(state: TrainState, tapes, kperm, pix, target):
        def loss_fn(p):
            sc = merge_params(scene, p)
            img = jnp.zeros((pix.shape[0], 3), sc.camera.origin.dtype)
            for s in range(spp):
                o, d, time, pix_ctr = generate_rays(
                    sc.camera, pix, jnp.uint32(s), W, H, cfg.seed)
                if use_pallas:
                    col = replay_pallas(
                        sc, meta, tapes[s], o, d, time, pix_ctr,
                        jnp.uint32(s), max_bounces=cfg.max_bounces,
                        t_min=cfg.t_min, kernel_space=(kperm, s_pad))
                else:
                    col = replay(
                        sc, meta, tapes[s], o, d, time, pix_ctr,
                        jnp.uint32(s), max_bounces=cfg.max_bounces,
                        t_min=cfg.t_min)
                img = img + col
            diff = img / spp - target
            return (diff * diff).sum() / (3.0 * pix.shape[0])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def step(state: TrainState, pix, target):
        sc = merge_params(scene, state.params)
        tapes = mega2_tapes(sc, meta, np.asarray(pix), spp, width=W,
                            height=H, max_bounces=cfg.max_bounces,
                            t_min=cfg.t_min, seed=cfg.seed,
                            id_space="kernel" if use_pallas else "global")
        kperm = (jnp.asarray(mega2_kernel_id_space(sc, meta)[0])
                 if use_pallas else jnp.zeros((1,), jnp.int32))
        return grad_step(state, tapes, kperm,
                         jnp.asarray(pix, jnp.int32), target)

    return step
