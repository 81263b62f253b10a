"""Taped-replay differentiable path (`ops/replay.py`).

Forward: replay with a tape from the XLA closest-hit must reproduce the
search-based radiance (same winners, same RNG draws — only the winner's t
is recomputed, direct-form vs coefficient-form quadratic).  Backward: its
gradients must match `trace(differentiable=True)` — pathwise gradients hold
the discrete path fixed, and the argmin is locally constant a.e., so the
two formulations differentiate the same function almost everywhere.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.integrator import trace
from raytracinginoneweekendincuda_tpu.ops import replay as rp
from raytracinginoneweekendincuda_tpu.ops.raygen import generate_rays
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.scene.api import (
    Dielectric, Lambertian, Metal, NoiseTexture, SceneDesc, Sphere,
)
from raytracinginoneweekendincuda_tpu.core.camera import Camera

W, H, BOUNCES = 12, 8, 6


def _probe_scene(dtype=np.float64):
    desc = SceneDesc()
    desc.add(
        Sphere((0.0, 0.0, -1.0), 0.5, Lambertian((0.6, 0.3, 0.2))),
        Sphere((-1.0, 0.0, -1.0), 0.45, Metal((0.8, 0.8, 0.8), 0.3)),
        Sphere((1.0, 0.0, -1.0), 0.45, Dielectric(1.5)),
        Sphere((0.0, -100.5, -1.0), 100.0,
               Lambertian(NoiseTexture(2.0, table_seed=3))),
    )
    desc.camera = Camera(lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov=90.0,
                         focus_dist=1.0, background=(0.7, 0.8, 1.0))
    scene, meta = compile_scene(desc, W, H, dtype=dtype)
    return jax.tree.map(jnp.asarray, scene), meta


def _rays(scene, s=0):
    pix = jnp.arange(W * H, dtype=jnp.int32)
    return generate_rays(scene.camera, pix, jnp.uint32(s), W, H, 1984)


@pytest.mark.parametrize("sid", [0, 8])
def test_forward_matches_search(sid):
    """Replay == search radiance on a geometry scene and a media scene
    (cornell smoke: ConstantMedium winners ride the tape as S+Q+m)."""
    scene, meta = compile_scene(scenes.build_scene(sid), W, H,
                                dtype=np.float64)
    scene = jax.tree.map(jnp.asarray, scene)
    o, d, time, pc = _rays(scene)
    ref = trace(scene, meta, o, d, time, pc, jnp.uint32(0),
                max_bounces=BOUNCES, t_min=1e-3)
    got = rp.trace_taped(scene, meta, o, d, time, pc, jnp.uint32(0),
                         max_bounces=BOUNCES, t_min=1e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-9, atol=1e-12)


def test_tape_shape_and_misses():
    scene, meta = _probe_scene()
    o, d, time, pc = _rays(scene)
    tape, acc = rp.generate_tape(scene, meta, o, d, time, pc, jnp.uint32(0),
                                 max_bounces=BOUNCES, t_min=1e-3)
    tape = np.asarray(tape)
    assert tape.shape == (BOUNCES, W * H)
    S = scene.sph_c0.shape[0]
    Q = scene.quad_q.shape[0]
    assert tape.min() >= -1 and tape.max() < S + Q + meta.n_media
    # sky-facing rays miss on the first bounce
    assert (tape[0] == -1).any()
    # once a lane records a miss it stays -1 (terminated)
    dead = tape[0] == -1
    assert (tape[1:, dead] == -1).all()


@pytest.mark.parametrize("sid", [1, 4])
def test_mega2_tape_matches_xla_tape(sid):
    """The Pallas trace kernel and the XLA search record the same winners
    (identical RNG draws + intersection semantics; a handful of lanes may
    diverge on f32 winner ties, which cascade down that lane's path)."""
    from raytracinginoneweekendincuda_tpu.ops.mega2 import mega2_tape

    scene, meta = compile_scene(scenes.build_scene(sid), W, H,
                                dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    o, d, time, pc = _rays(scene)
    tape_x, _ = rp.generate_tape(scene, meta, o, d, time, pc, jnp.uint32(0),
                                 max_bounces=BOUNCES, t_min=1e-3)
    tape_m = mega2_tape(scene, meta, np.arange(W * H), 0,
                        width=W, height=H, max_bounces=BOUNCES,
                        t_min=1e-3, seed=1984)
    tape_x = np.asarray(tape_x)
    tape_m = np.asarray(tape_m)
    assert tape_m.shape == tape_x.shape
    same_lane = (tape_m == tape_x).all(axis=0)
    assert same_lane.mean() > 0.97, f"lane agreement {same_lane.mean()}"
    # replaying the mega2 tape reproduces the search radiance on the
    # agreeing lanes exactly (same winners -> same taped function)
    r_m = np.asarray(rp.replay(scene, meta, jnp.asarray(tape_m), o, d, time,
                               pc, jnp.uint32(0), max_bounces=BOUNCES,
                               t_min=1e-3))
    r_x = np.asarray(rp.replay(scene, meta, jnp.asarray(tape_x), o, d, time,
                               pc, jnp.uint32(0), max_bounces=BOUNCES,
                               t_min=1e-3))
    np.testing.assert_allclose(r_m[same_lane], r_x[same_lane], rtol=1e-6)


def test_mega2_tapes_batched_matches_per_sample():
    """`mega2_tapes` (all spp in one dispatch, per-lane sample ids) ==
    per-sample `mega2_tape` calls, bit-for-bit."""
    from raytracinginoneweekendincuda_tpu.ops.mega2 import (
        mega2_tape, mega2_tapes,
    )

    scene, meta = compile_scene(scenes.build_scene(4), W, H,
                                dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    spp = 3
    batched = np.asarray(mega2_tapes(
        scene, meta, np.arange(W * H), spp, width=W, height=H,
        max_bounces=BOUNCES, t_min=1e-3, seed=1984))
    assert batched.shape == (spp, BOUNCES, W * H)
    for s in range(spp):
        single = np.asarray(mega2_tape(
            scene, meta, np.arange(W * H), s, width=W, height=H,
            max_bounces=BOUNCES, t_min=1e-3, seed=1984))
        np.testing.assert_array_equal(batched[s], single)


def test_train_step_mega2_loss_decreases():
    """The two-phase Pallas-tape train step optimizes albedo toward a
    target rendered with different colors (single chip)."""
    import optax

    from raytracinginoneweekendincuda_tpu.parallel.train import (
        init_state, make_train_step_mega2, merge_params,
    )
    from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

    scene, meta = compile_scene(scenes.build_scene(4), W, H,
                                dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2,
                       max_bounces=4, seed=1984)
    pix = np.arange(W * H, dtype=np.int32)
    # target: the true scene's radiance at the same sample set
    o, d, time, pc = _rays(scene)
    tgt = 0.0
    for s in range(cfg.samples_per_pixel):
        o, d, time, pc = generate_rays(scene.camera,
                                       jnp.asarray(pix), jnp.uint32(s),
                                       W, H, cfg.seed)
        tgt = tgt + trace(scene, meta, o, d, time, pc, jnp.uint32(s),
                          max_bounces=cfg.max_bounces, t_min=cfg.t_min)
    tgt = tgt / cfg.samples_per_pixel
    # start from perturbed albedo
    scene0 = scene._replace(tex_c0=jnp.clip(scene.tex_c0 * 0.5 + 0.2, 0, 1))
    opt = optax.adam(0.05)
    step = make_train_step_mega2(scene0, meta, cfg, opt)
    state = init_state(scene0, opt)
    losses = []
    for _ in range(4):
        state, loss = step(state, pix, tgt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses


def _loss(trace_fn, scene, meta, spp=2):
    pix = jnp.arange(W * H, dtype=jnp.int32)

    def one(acc, s):
        o, d, time, pc = generate_rays(scene.camera, pix, s, W, H, 1984)
        return acc + trace_fn(scene, meta, o, d, time, pc, s,
                              max_bounces=BOUNCES, t_min=1e-3), None

    img, _ = jax.lax.scan(one, jnp.zeros((W * H, 3), jnp.float64),
                          jnp.arange(spp, dtype=jnp.uint32))
    return (img / spp).sum()


# two cases keep both a geometry-through-texture and a direct-albedo
# gradient covered; the full per-field FD matrix lives in test_grad.py
# (suite wall-clock: each case jits BOTH engines in f64)
@pytest.mark.parametrize("field,idx", [
    ("sph_c0", (0, 2)),
    pytest.param("tex_c0", (0, 1), marks=pytest.mark.slow),
])
def test_grad_matches_search_path(field, idx):
    """d(loss)/d(param) via taped replay == via scan+checkpoint search."""
    scene, meta = _probe_scene()

    def make(trace_fn):
        def f(v):
            arr = getattr(scene, field)
            s2 = scene._replace(**{field: arr.at[idx].set(v)})
            return _loss(trace_fn, s2, meta)
        return f

    v0 = getattr(scene, field)[idx]
    g_search = jax.grad(make(functools.partial(trace, differentiable=True)))(v0)
    g_replay = jax.grad(make(rp.trace_taped))(v0)
    assert np.isfinite(g_search) and np.isfinite(g_replay)
    assert abs(g_search) > 0.0
    np.testing.assert_allclose(np.asarray(g_replay), np.asarray(g_search),
                               rtol=1e-6)
