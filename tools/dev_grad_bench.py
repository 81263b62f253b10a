"""A/B the differentiable engines: scan+checkpoint search vs taped replay.

Times jax.grad of a pixel-sum loss through both paths on scene 0 (488
spheres — the O(S)-per-bounce search cost is what the tape removes).

Usage: python tools/dev_grad_bench.py [W] [H] [spp] [bounces]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from raytracinginoneweekendincuda_tpu.models.scenes import build_scene
from raytracinginoneweekendincuda_tpu.ops.integrator import trace
from raytracinginoneweekendincuda_tpu.ops.replay import trace_taped
from raytracinginoneweekendincuda_tpu.ops.raygen import generate_rays
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

W = int(sys.argv[1]) if len(sys.argv) > 1 else 64
H = int(sys.argv[2]) if len(sys.argv) > 2 else 64
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 4
BOUNCES = int(sys.argv[4]) if len(sys.argv) > 4 else 8

print(f"backend: {jax.devices()}", file=sys.stderr)
scene, meta = compile_scene(build_scene(0), W, H, dtype=np.float32)
scene = jax.tree.map(jnp.asarray, scene)
pix = jnp.arange(W * H, dtype=jnp.int32)

def make_loss(trace_fn):
    def loss(tex_c0):
        # albedo gradients are nonzero in solid-color scenes (geometry
        # grads are 0 a.e. — see differentiability notes); they exercise
        # the full backward without letting XLA DCE it
        sc = scene._replace(tex_c0=tex_c0)
        img = 0.0
        for s in range(SPP):
            o, d, time_, pc = generate_rays(sc.camera, pix, jnp.uint32(s),
                                            W, H, 1984)
            img = img + trace_fn(sc, meta, o, d, time_, pc, jnp.uint32(s),
                                 max_bounces=BOUNCES, t_min=1e-3)
        return (img / SPP).sum()
    return jax.jit(jax.grad(loss))

for name, fn in (("scan+ckpt", functools.partial(trace, differentiable=True)),
                 ("taped    ", trace_taped)):
    g = make_loss(fn)
    t0 = time.perf_counter()
    r = g(scene.tex_c0); r.block_until_ready()
    compile_t = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(scene.tex_c0); r.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: grad step best {best*1e3:8.2f} ms  "
          f"(compile {compile_t:.1f} s)  |g|={float(jnp.abs(r).sum()):.3e}")

# ---- mega2-taped: ALL spp tapes from the Pallas forward in ONE dispatch
# (eager, params concrete between optimizer steps), gradient through the
# jitted replay
from raytracinginoneweekendincuda_tpu.ops.mega2 import mega2_tapes
from raytracinginoneweekendincuda_tpu.ops.replay import replay


def replay_loss(tex_c0, tapes):
    sc = scene._replace(tex_c0=tex_c0)
    img = 0.0
    for s in range(SPP):
        o, d, time_, pc = generate_rays(sc.camera, pix, jnp.uint32(s),
                                        W, H, 1984)
        img = img + replay(sc, meta, tapes[s], o, d, time_, pc,
                           jnp.uint32(s), max_bounces=BOUNCES, t_min=1e-3)
    return (img / SPP).sum()


g2 = jax.jit(jax.grad(replay_loss))


def mega2_step(tex_c0):
    sc = scene._replace(tex_c0=tex_c0)
    tapes = mega2_tapes(sc, meta, np.arange(W * H), SPP, width=W, height=H,
                        max_bounces=BOUNCES, t_min=1e-3, seed=1984)
    return g2(tex_c0, tapes)


r = mega2_step(scene.tex_c0); r.block_until_ready()
t0 = time.perf_counter()
r = mega2_step(scene.tex_c0); r.block_until_ready()
compile_t = time.perf_counter() - t0
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    r = mega2_step(scene.tex_c0); r.block_until_ready()
    best = min(best, time.perf_counter() - t0)
print(f"mega2tape: grad step best {best*1e3:8.2f} ms  "
      f"|g|={float(jnp.abs(r).sum()):.3e}")

# ---- fully-fused: Pallas tapes (kernel id space, no remap gather) +
# Pallas forward/backward replay
from raytracinginoneweekendincuda_tpu.ops.mega2 import mega2_kernel_id_space
from raytracinginoneweekendincuda_tpu.ops.pallas_replay import replay_pallas

_, S_PAD = mega2_kernel_id_space(scene, meta)


def pallas_loss(tex_c0, tapes, kperm):
    sc = scene._replace(tex_c0=tex_c0)
    img = 0.0
    for s in range(SPP):
        o, d, time_, pc = generate_rays(sc.camera, pix, jnp.uint32(s),
                                        W, H, 1984)
        img = img + replay_pallas(sc, meta, tapes[s], o, d, time_, pc,
                                  jnp.uint32(s), max_bounces=BOUNCES,
                                  t_min=1e-3, kernel_space=(kperm, S_PAD))
    return (img / SPP).sum()


g3 = jax.jit(jax.grad(pallas_loss))


def pallas_step(tex_c0):
    sc = scene._replace(tex_c0=tex_c0)
    tapes = mega2_tapes(sc, meta, np.arange(W * H), SPP, width=W, height=H,
                        max_bounces=BOUNCES, t_min=1e-3, seed=1984,
                        id_space="kernel")
    kperm = jnp.asarray(mega2_kernel_id_space(sc, meta)[0])
    return g3(tex_c0, tapes, kperm)


r = pallas_step(scene.tex_c0); r.block_until_ready()
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    r = pallas_step(scene.tex_c0); r.block_until_ready()
    best = min(best, time.perf_counter() - t0)
print(f"pallas-vjp: grad step best {best*1e3:8.2f} ms  "
      f"|g|={float(jnp.abs(r).sum()):.3e}")
