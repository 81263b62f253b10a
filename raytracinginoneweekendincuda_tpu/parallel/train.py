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
        sp_idx = lax.axis_index(AXIS_SP)

        def local_acc(p):
            """This shard's sample-slice radiance partial sum [B, 3] —
            collective-free, so its vjp is exactly the shard-local
            cotangent path with no psum-transpose semantics involved."""
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

            return lax.fori_loop(
                0, local_spp, sample_body,
                jnp.zeros((pix.shape[0], 3), sc.camera.origin.dtype),
            )

        acc, vjp_fn = jax.vjp(local_acc, params)
        dt = acc.dtype.type
        col = lax.psum(acc, AXIS_SP) / dt(spp)
        diff = col - target
        denom = 3.0 * pix.shape[0] * mesh.shape[AXIS_PX]
        loss = lax.psum((diff * diff).sum(), AXIS_PX) / denom  # repl. over sp
        # The MSE chain rule is applied OUTSIDE autodiff: dloss/d(acc_s) =
        # 2*diff/(spp*denom) identically on every sp shard (col is
        # replicated), so vjp-ing only the collective-free local_acc and
        # psum-ing the per-shard cotangent results counts every sample
        # path exactly once.  Differentiating through the psum instead
        # double-counts under check_vma=False (psum's transpose there is
        # psum, n_sp-scaling every gradient — caught by the marble mesh
        # test against the unsharded reference).
        cot = diff * dt(2.0 / (spp * denom))
        (grads,) = vjp_fn(cot)
        grads = jax.tree.map(
            lambda g: lax.psum(g, (AXIS_PX, AXIS_SP)), grads
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
    def step_jit(state: TrainState, scene_rest: SceneArrays, pix, target):
        loss, grads = sharded(state.params, scene_rest, pix, target)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def step(state: TrainState, scene_rest: SceneArrays, pix, target):
        # commit the state to the mesh-replicated sharding the jit's
        # outputs carry: an eagerly-built init state is UNcommitted, and
        # the sharding mismatch between step 0's inputs and step 1's
        # (step 0's outputs) forces a full second compile otherwise
        state = _commit_replicated(state, mesh)
        return step_jit(state, scene_rest, pix, target)

    return step


def _commit_replicated(state: TrainState, mesh: Mesh) -> TrainState:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def init_state(scene: SceneArrays, optimizer: optax.GradientTransformation) -> TrainState:
    params = split_params(scene)
    params = jax.tree.map(jnp.asarray, params)
    return TrainState(params, optimizer.init(params), jnp.int32(0))


def make_train_step_mega2(
    scene: SceneArrays,
    meta: SceneMeta,
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh | None = None,
):
    """Fast train step: Pallas winner tapes + Pallas replay gradient.

    With ``mesh=None`` — the single-chip two-phase step (the tape's
    geometry/material tables are packed host-side from CONCRETE params,
    so tape generation cannot live inside the gradient jit):

      1. eager — `ops.mega2.mega2_tapes` runs the megakernel trace forward
         for ALL spp samples in ONE device dispatch and returns the winner
         tapes [spp, max_bounces, B];
      2. jitted — MSE loss through the replay: on TPU with a supported
         scene, `ops.pallas_replay.replay_pallas` (fused Pallas forward
         AND backward kernels behind a custom VJP); otherwise the XLA
         replay (one one-hot MXU table read per bounce; its backward is
         a matmul).  Optimizer update follows.

    With a ``(px, sp)`` ``mesh`` — the SPMD composition of the same
    kernels (`_make_train_step_mega2_sharded`): per shard, the Pallas
    trace tape AND the Pallas custom-VJP replay run inside one
    shard_map'd jit, the per-sample radiance psum-merges over ``sp``
    inside the loss, and the parameter gradients psum over BOTH axes —
    the north-star "backward at kernel speed per chip, gradient
    all-reduce over ICI" (BASELINE.json).  Tables are still packed
    eagerly per step from the concrete params.

    The tape is a valid pathwise sample wherever it came from, so the
    gradient matches `trace_taped` a.e. (winner ties excepted —
    docs/PERF.md).  Pixel batches may be scattered (lanes are gathered
    in-graph); `make_train_step` remains the general XLA path.
    """
    from ..ops.mega2 import (
        mega2_kernel_id_space, mega2_supported, mega2_tapes,
    )
    from ..ops.pallas_replay import replay_pallas, replay_pallas_supported

    if not mega2_supported(meta):
        raise ValueError("scene unsupported by the mega2 trace kernel; "
                         "use make_train_step")
    if mesh is not None:
        return _make_train_step_mega2_sharded(
            scene, meta, cfg, optimizer, mesh)
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


def _make_train_step_mega2_sharded(
    scene: SceneArrays,
    meta: SceneMeta,
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
):
    """SPMD composition of the Pallas fast gradient path over a (px, sp)
    mesh — built by `make_train_step_mega2(mesh=...)`.

    Per step: ONE eager host phase packs the mega2 tables from the
    concrete params (`ops.mega2.mega2_tables` — numpy Morton sort), then
    ONE jitted dispatch runs, per shard, (a) the Pallas trace kernel over
    the shard's pixel slice and sample window (winner tapes, kernel-row
    id space — integers, outside autodiff), and (b) the Pallas
    custom-VJP replay forward+backward through the MSE loss.  The
    per-sample radiance psums over ``sp`` inside the loss (MSE needs the
    mean before squaring) and the parameter gradients psum over both
    mesh axes — the gradient all-reduce rides ICI and XLA is free to
    overlap it with the backward's tail.  RNG keys on global (pixel,
    sample) ids, so the mesh layout is invisible in the estimator.

    Primary rays for BOTH tape and replay come from the in-graph
    `generate_rays` on the traced camera (`_tapes_trace(camera=...)`),
    which (1) keeps the trainable camera out of the trace kernel's
    compile-time constants — no recompile when camera params move — and
    (2) makes tape and replay share bit-identical rays on hardware.
    The kernel-constant statics that CAN move with trained geometry
    (`mu_key`, the coef-table recentering) are quantized in the pack and
    only retrace on large excursions.
    """
    from ..ops.mega2 import _tapes_trace, mega2_tables
    from ..ops.pallas_replay import replay_pallas, replay_pallas_supported

    if not replay_pallas_supported(meta):
        raise ValueError("scene unsupported by the Pallas replay; "
                         "use make_train_step")
    n_px = mesh.shape[AXIS_PX]
    n_sp = mesh.shape[AXIS_SP]
    spp = cfg.samples_per_pixel
    if spp % n_sp != 0:
        raise ValueError(f"spp={spp} must be divisible by sample shards {n_sp}")
    spp_local = spp // n_sp
    W, H = cfg.width, cfg.height
    K = cfg.max_bounces
    interpret = jax.default_backend() != "tpu"
    n_med = max(meta.n_media, 1)
    # camera rides VMEM ray rows, so the kernel's camera constants are a
    # fixed dummy; background only shades misses — irrelevant to winners
    zcam = (0.0,) * 21
    zbg = (0.0, 0.0, 0.0)
    _cache: dict = {}

    def build(mu_key, med_key, img_key, s_pad):
        def body(params, *args):
            tabs9 = args[:9]
            kperm, pix, target = args[9:]
            sp_i = lax.axis_index(AXIS_SP)
            samp0 = sp_i * spp_local
            cam0 = merge_params(scene, params).camera
            # (a) winner tapes for this shard's (pixel, sample) window —
            # integer output, invisible to autodiff by construction
            tapes = _tapes_trace(
                tabs9, jnp.zeros((1,), jnp.int32), pix,
                n_samples=spp_local, samp0=samp0, meta=meta,
                med_key=med_key, cam_key=zcam, img_key=img_key,
                mu_key=mu_key, width=W, height=H, seed=cfg.seed,
                max_bounces=K, t_min=cfg.t_min, background=zbg,
                interpret=interpret, remap_ids=False, camera=cam0)

            # (b) Pallas custom-VJP replay through the loss
            def local_loss(p):
                sc = merge_params(scene, p)
                img = jnp.zeros((pix.shape[0], 3), jnp.float32)
                for s in range(spp_local):
                    sg = samp0 + s
                    o, d, time, pc = generate_rays(
                        sc.camera, pix, jnp.asarray(sg).astype(jnp.uint32),
                        W, H, cfg.seed)
                    img = img + replay_pallas(
                        sc, meta, tapes[s], o, d, time, pc, sg,
                        max_bounces=K, t_min=cfg.t_min,
                        kernel_space=(kperm, s_pad))
                col = lax.psum(img, AXIS_SP) / np.float32(spp)
                diff = col - target
                return (diff * diff).sum()

            sse, grads = jax.value_and_grad(local_loss)(params)
            denom = 3.0 * pix.shape[0] * n_px
            loss = lax.psum(sse, AXIS_PX) / denom
            grads = jax.tree.map(
                lambda g: lax.psum(g, (AXIS_PX, AXIS_SP)) / denom, grads)
            return loss, grads

        sharded = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(),) + (P(),) * 10 + (P(AXIS_PX), P(AXIS_PX)),
            out_specs=(P(), P()),
            check_vma=False)

        @jax.jit
        def grad_step(state: TrainState, tabs9, kperm, pix, target):
            loss, grads = sharded(state.params, *tabs9, kperm, pix, target)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        return grad_step

    def step(state: TrainState, pix, target):
        state = _commit_replicated(state, mesh)   # see make_train_step
        sc = merge_params(scene, state.params)
        tabs_all = mega2_tables(sc, meta)
        (sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q, perm_tab,
         vec_tab, img_tab, img_key, mu_key, med, remap) = tabs_all
        s_pad = int(sph_tab.shape[0])
        n_geo = remap.shape[0] - n_med
        kperm = remap[:n_geo + meta.n_media]
        # medium albedo (cols 19:22) is trainable but cannot affect tape
        # winners — zero it in the TRACE kernel's static key so albedo
        # training never retraces (the replay carries it differentiably
        # via the merged table)
        med_t = np.asarray(med, np.float64).copy()
        med_t[:, 19:22] = 0.0
        med_key = tuple(tuple(float(x) for x in row) for row in med_t)
        key = (mu_key, med_key, img_key, s_pad)
        if key not in _cache:
            _cache[key] = build(mu_key, med_key, img_key, s_pad)
        tabs9 = tabs_all[:9]
        return _cache[key](state, tabs9, kperm,
                           jnp.asarray(pix, jnp.int32), target)

    step.cache = _cache   # exposed so tests can pin the recompile count
    return step
