"""Inverse rendering: recover scene parameters from a target image.

The capability the CUDA reference cannot express: the renderer is
differentiable end-to-end, so scene parameters (sphere positions/radii,
albedos, metal fuzz, dielectric IOR, camera) can be optimized by gradient
descent against a rendered target (BASELINE.json north-star).

This demo perturbs a known scene — moves the center sphere and tints its
albedo — renders a target from the TRUE scene, and recovers the true
parameters from the perturbed initialization with Adam on an MSE loss in
linear radiance, running the SPMD train step on whatever device mesh is
available (8 simulated CPU devices under the default test config; real
chips on a TPU host).

Run:  python examples/inverse_render.py [--steps 60] [--out /tmp/inv]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--out", type=str, default="/tmp/inverse_render")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (8 simulated devices)")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import optax

    from raytracinginoneweekendincuda_tpu.core.camera import Camera
    from raytracinginoneweekendincuda_tpu.core.image import write_png
    from raytracinginoneweekendincuda_tpu.ops.render import render
    from raytracinginoneweekendincuda_tpu.parallel import train
    from raytracinginoneweekendincuda_tpu.parallel.render import make_mesh, render_sharded
    from raytracinginoneweekendincuda_tpu.scene.api import Lambertian, SceneDesc, Sphere
    from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
    from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

    W, H, SPP = 48, 27, 8

    def make_desc(center, albedo):
        desc = SceneDesc()
        desc.add(
            Sphere(tuple(center), 0.5, Lambertian(tuple(albedo))),
            Sphere((0.0, -100.5, -1.0), 100.0, Lambertian((0.5, 0.5, 0.5))),
        )
        desc.camera = Camera(lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov=90.0,
                             focus_dist=1.0, background=(0.70, 0.80, 1.00))
        return desc

    true_center = np.array([0.15, 0.05, -1.0])
    true_albedo = np.array([0.70, 0.25, 0.20])
    init_center = np.array([-0.15, -0.10, -1.0])
    init_albedo = np.array([0.40, 0.40, 0.45])

    mesh = make_mesh()
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP, max_bounces=8)

    true_scene, meta = compile_scene(make_desc(true_center, true_albedo), W, H,
                                     dtype=np.float32)
    target_img = render_sharded(true_scene, meta, cfg, mesh, gamma=False)
    npix = W * H
    target = np.asarray(target_img[::-1].reshape(npix, 3), np.float32)
    pix = np.arange(npix, dtype=np.int32)

    scene, _ = compile_scene(make_desc(init_center, init_albedo), W, H,
                             dtype=np.float32)
    optimizer = optax.adam(3e-2)
    state = train.init_state(scene, optimizer)
    step = train.make_train_step(scene, meta, cfg, mesh, optimizer)

    print(f"mesh {dict(mesh.shape)}; optimizing {args.steps} steps "
          f"({W}x{H}, {SPP} spp, max_bounces={cfg.max_bounces})",
          file=sys.stderr)
    for i in range(args.steps):
        state, loss = step(state, scene, pix, target)
        if i % 10 == 0 or i == args.steps - 1:
            c = np.asarray(state.params["sph_c0"])[0]
            a = np.asarray(state.params["tex_c0"])[0]
            print(f"step {i:3d}  loss {float(loss):.6f}  "
                  f"center ({c[0]:+.3f},{c[1]:+.3f},{c[2]:+.3f})  "
                  f"albedo ({a[0]:.3f},{a[1]:.3f},{a[2]:.3f})",
                  file=sys.stderr)

    c = np.asarray(state.params["sph_c0"])[0]
    a = np.asarray(state.params["tex_c0"])[0]
    err_c = float(np.abs(c - true_center).max())
    err_a = float(np.abs(a - true_albedo).max())
    print(f"\nrecovered center error {err_c:.3f}, albedo error {err_a:.3f}",
          file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    final_scene = train.merge_params(scene, state.params)
    for name, sc in (("target", true_scene), ("init", scene),
                     ("recovered", final_scene)):
        img = render(jax_to_np(sc), meta, cfg)
        write_png(os.path.join(args.out, f"{name}.png"), img)
    print(f"wrote {args.out}/{{target,init,recovered}}.png", file=sys.stderr)
    return 0 if (err_c < 0.08 and err_a < 0.08) else 1


def jax_to_np(scene):
    import jax
    import numpy as np

    return jax.tree.map(lambda a: np.asarray(a), scene)


if __name__ == "__main__":
    raise SystemExit(main())
