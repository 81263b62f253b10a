"""Headline benchmark: scene 0 (bouncing spheres) at the reference's own
measured config — 1440x720, 10 spp (`Docs/2권_3장_BVH_CUDA적용판.md:733`:
0.47 s with BVH on RTX 5070 Ti ≈ 22 M primary rays/s, see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever backend JAX selects (the axon TPU in this environment);
``--cpu`` forces the CPU backend for local runs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_RAYS_PER_S = 22.0e6  # RTX 5070 Ti anchor, BASELINE.md


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=int, default=0)
    p.add_argument("--width", type=int, default=1440)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--spp", type=int, default=10)
    p.add_argument("--engine", default="bruteforce")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from raytracinginoneweekendincuda_tpu.models.scenes import build_scene
    from raytracinginoneweekendincuda_tpu.ops.render import render
    from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
    from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

    cfg = RenderConfig(
        width=args.width, height=args.height, samples_per_pixel=args.spp,
        engine=args.engine,
    )
    desc = build_scene(args.scene)
    scene, meta = compile_scene(desc, cfg.width, cfg.height, dtype=np.float32)

    dev = jax.devices()[0]
    print(f"bench: backend={dev.platform} ({dev.device_kind}), "
          f"scene {args.scene} {cfg.width}x{cfg.height} @ {args.spp} spp, "
          f"engine={args.engine}", file=sys.stderr)

    render(scene, meta, cfg)  # warmup: compile + first run
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        img = render(scene, meta, cfg)
        best = min(best, time.perf_counter() - t0)

    assert np.isfinite(img).all() and img.shape == (cfg.height, cfg.width, 3)
    rays = cfg.width * cfg.height * args.spp
    rays_per_s = rays / best
    print(f"bench: best of {args.repeats}: {best:.3f} s", file=sys.stderr)
    print(json.dumps({
        "metric": f"primary rays/s, scene {args.scene} {cfg.width}x{cfg.height}@{args.spp}spp ({args.engine})",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
