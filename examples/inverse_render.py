"""Inverse rendering: recover material parameters from a target image.

The capability the CUDA reference cannot express: the renderer is
differentiable end-to-end, so scene parameters can be optimized by
gradient descent against a rendered target (BASELINE.json north-star).

Scope note (standard differentiable-path-tracing practice, and documented
in tests/test_grad.py): PATHWISE gradients capture channels that vary
continuously along light paths — albedos/emission, material scalars
(fuzz, IOR), camera, and geometry *through continuously varying textures*.
Visibility/silhouette changes have zero pathwise gradient a.e., and they
dominate how an image responds to moving geometry, so position recovery
needs edge-sampling estimators (future work).  This demo therefore
recovers MATERIALS: the albedos of a diffuse and a metal sphere, with
geometry frozen (fuzz at low spp is ill-conditioned: its visual effect is
the sample-noise blur radius, so it is kept fixed here).

Run:  python examples/inverse_render.py [--steps 80] [--out /tmp/inv]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
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
    from raytracinginoneweekendincuda_tpu.scene.api import (
        Lambertian, Metal, NoiseTexture, SceneDesc, Sphere,
    )
    from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
    from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

    W, H, SPP = 48, 27, 8

    def make_desc(albedo, metal_albedo):
        desc = SceneDesc()
        desc.add(
            Sphere((-0.55, 0.0, -1.0), 0.5, Lambertian(tuple(albedo))),
            Sphere((0.55, 0.0, -1.0), 0.5, Metal(tuple(metal_albedo), 0.15)),
            # marble ground gives the metal reflections something
            # continuously varying to see
            Sphere((0.0, -100.5, -1.0), 100.0,
                   Lambertian(NoiseTexture(2.0, table_seed=3))),
        )
        desc.camera = Camera(lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov=90.0,
                             focus_dist=1.0, background=(0.70, 0.80, 1.00))
        return desc

    true_albedo = np.array([0.70, 0.25, 0.20])
    true_metal = np.array([0.90, 0.75, 0.35])   # gold-ish
    init_albedo = np.array([0.40, 0.40, 0.45])
    init_metal = np.array([0.60, 0.60, 0.60])

    mesh = make_mesh()
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP, max_bounces=8)

    true_scene, meta = compile_scene(make_desc(true_albedo, true_metal), W, H,
                                     dtype=np.float32)
    target_img = render_sharded(true_scene, meta, cfg, mesh, gamma=False)
    npix = W * H
    target = np.asarray(target_img[::-1].reshape(npix, 3), np.float32)
    pix = np.arange(npix, dtype=np.int32)

    scene, _ = compile_scene(make_desc(init_albedo, init_metal), W, H,
                             dtype=np.float32)

    # optimize materials only: freeze geometry/camera (visibility gradients
    # are zero pathwise — see module docstring).  NB optax.masked passes
    # raw gradients through for masked-out leaves; multi_transform with
    # set_to_zero is the correct "freeze".
    material_fields = {"tex_c0", "tex_c1"}
    def labels(params):
        return {k: ("train" if k in material_fields else "freeze")
                if not hasattr(v, "_fields")
                else jax.tree.map(lambda _: "freeze", v)
                for k, v in params.items()}
    optimizer = optax.multi_transform(
        {"train": optax.adam(2e-2), "freeze": optax.set_to_zero()},
        labels(train.split_params(scene)))
    state = train.init_state(scene, optimizer)
    step = train.make_train_step(scene, meta, cfg, mesh, optimizer)

    print(f"mesh {dict(mesh.shape)}; optimizing {args.steps} steps "
          f"({W}x{H}, {SPP} spp)", file=sys.stderr)
    for i in range(args.steps):
        state, loss = step(state, scene, pix, target)
        if i % 10 == 0 or i == args.steps - 1:
            a = np.asarray(state.params["tex_c0"])[0]
            m = np.asarray(state.params["tex_c0"])[1]
            print(f"step {i:3d}  loss {float(loss):.6f}  "
                  f"albedo ({a[0]:.3f},{a[1]:.3f},{a[2]:.3f})  "
                  f"metal ({m[0]:.3f},{m[1]:.3f},{m[2]:.3f})",
                  file=sys.stderr)

    a = np.asarray(state.params["tex_c0"])[0]
    m = np.asarray(state.params["tex_c0"])[1]
    err_a = float(np.abs(a - true_albedo).max())
    err_f = float(np.abs(m - true_metal).max())
    print(f"\nrecovered diffuse-albedo error {err_a:.3f}, "
          f"metal-albedo error {err_f:.3f}", file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    final_scene = train.merge_params(scene, state.params)
    to_np = lambda sc: jax.tree.map(np.asarray, sc)
    for name, sc in (("target", true_scene), ("init", scene),
                     ("recovered", final_scene)):
        write_png(os.path.join(args.out, f"{name}.png"),
                  render(to_np(sc), meta, cfg))
    print(f"wrote {args.out}/{{target,init,recovered}}.png", file=sys.stderr)
    return 0 if (err_a < 0.08 and err_f < 0.08) else 1


if __name__ == "__main__":
    raise SystemExit(main())
