"""Inverse rendering of GEOMETRY: recover a sphere center from pixels.

`examples/inverse_render.py` recovers material albedos; this demo closes
the north-star "d(pixel)/d(center)" loop end-to-end on geometry: a marble
(Perlin-turbulence) sphere's CENTER is displaced and recovered by Adam on
the pathwise gradient through the differentiable replay engine.

Why marble: pathwise gradients see geometry only through continuously
varying shading — for a solid-color sphere, moving the center only moves
its silhouette, which has zero pathwise gradient a.e. (standard
differentiable-path-tracing scope; edge-sampling estimators are out of
scope, as documented in README "Differentiability" and tests/test_grad.py).
A marble sphere's radiance depends on the hit point through
turbulence -> sin (Texture.h:163-164 semantics), so a center displacement
misaligns the observed pattern and the MSE gradient pulls it back.  The
displacement must stay within the texture's coherence length
(~half a marble band); silhouette error remains invisible to the
estimator, so recovery is to pattern alignment, not contour fit.

Run:  python examples/recover_geometry.py [--steps 60] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (8 simulated devices)")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import optax

    from raytracinginoneweekendincuda_tpu.models import scenes
    from raytracinginoneweekendincuda_tpu.ops.render import render
    from raytracinginoneweekendincuda_tpu.parallel import train
    from raytracinginoneweekendincuda_tpu.parallel.render import make_mesh
    from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
    from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

    W, H, spp = 48, 27, 16
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       max_bounces=3)

    # scene 3 (perlin_spheres): marble ground + a marble sphere at (0,2,0)
    scene, meta = compile_scene(scenes.perlin_spheres(), W, H,
                                dtype=np.float32)
    true_c0 = np.asarray(scene.sph_c0, np.float64).copy()
    # the small ACTIVE sphere (padding rows carry radius 0)
    rad = np.asarray(scene.sph_rad, np.float64)
    act = np.asarray(scene.sph_active) > 0
    sphere_row = int(np.argmin(np.where(act, rad, np.inf)))

    # target image (linear radiance) from the TRUE geometry
    target_img = render(scene, meta, cfg, gamma=False)
    target = np.asarray(target_img[::-1].reshape(W * H, 3), np.float32)
    pix = np.arange(W * H, dtype=np.int32)

    # displace the sphere center within the marble coherence length (the finest turbulence
    # octave has wavelength ~0.1, so recoverable displacements are smaller)
    delta = np.array([0.03, 0.0, -0.04])
    c0_init = true_c0.copy()
    c0_init[sphere_row] += delta
    scene0 = scene._replace(sph_c0=c0_init.astype(np.float32))

    mesh = make_mesh(jax.devices()[:1], sample_shards=1)
    optimizer = optax.adam(4e-3)
    state = train.init_state(scene0, optimizer)
    step = train.make_train_step(scene0, meta, cfg, mesh, optimizer,
                                 engine="taped")

    def center_err(params):
        c = np.asarray(params["sph_c0"], np.float64)[sphere_row]
        return float(np.linalg.norm(c - true_c0[sphere_row]))

    err0 = center_err(state.params)
    print(f"initial center error: {err0:.4f}")
    for it in range(args.steps):
        state, loss = step(state, scene0, pix, target)
        # project: ONLY the target sphere's center is being recovered —
        # freeze every other parameter (per-row masking is clearer here
        # than an optax.masked pytree, which masks whole leaves)
        p = dict(state.params)
        c = np.asarray(p["sph_c0"]).copy()
        keep = np.asarray(scene0.sph_c0).copy()
        # recover the (x, z) displacement; y stays frozen — measured on
        # this scene, the pathwise estimator carries a spurious y pull
        # ~8x the true x slope (silhouette-adjacent bias), while the
        # x/z gradients match the loss landscape's slope
        keep[sphere_row, 0] = c[sphere_row, 0]
        keep[sphere_row, 2] = c[sphere_row, 2]
        p["sph_c0"] = keep
        for k in p:
            if k not in ("sph_c0",):
                p[k] = train.split_params(scene0)[k]
        state = train.TrainState(p, state.opt_state, state.step)
        if it % 10 == 0 or it == args.steps - 1:
            print(f"step {it:3d}: loss {float(loss):.3e}  "
                  f"center err {center_err(state.params):.4f}")

    err1 = center_err(state.params)
    print(f"center error {err0:.4f} -> {err1:.4f} "
          f"({err0 / max(err1, 1e-9):.1f}x reduction)")
    assert err1 < 0.5 * err0, "geometry recovery failed to converge"
    print("recovered (pattern-aligned) — silhouette error is invisible to "
          "pathwise gradients, so sub-pixel contour mismatch may remain")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
