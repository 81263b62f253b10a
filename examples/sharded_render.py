"""Render one frame over every visible device with the SPMD mesh API.

The reference parallelizes over CUDA blocks on one GPU
(`kernel.cu:575-576`); here the same program spans chips: a `(px, sp)`
`jax.sharding.Mesh` shards interleaved pixel sets and sample slices, the
persistent megakernel runs per shard, and one `psum` merges the sample
axis.  The image is identical to the single-chip render by construction
(counter RNG keyed on global pixel/sample ids — see README "Determinism
contract"), which this script verifies when more than one device is
visible.

Run on real chips:   python examples/sharded_render.py
Simulate 8 devices:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                         python examples/sharded_render.py --cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=int, default=4)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=270)
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--out", default="/tmp/sharded.ppm")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from raytracinginoneweekendincuda_tpu.core.image import write_ppm
    from raytracinginoneweekendincuda_tpu.models import scenes
    from raytracinginoneweekendincuda_tpu.ops.render import render
    from raytracinginoneweekendincuda_tpu.parallel.render import (
        make_mesh, render_sharded,
    )
    from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
    from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

    devs = jax.devices()
    mesh = make_mesh(devs)
    print(f"devices: {len(devs)} ({devs[0].platform}), "
          f"mesh px={mesh.shape['px']} sp={mesh.shape['sp']}")

    scene, meta = compile_scene(scenes.build_scene(args.scene), args.width,
                                args.height, dtype=np.float32)
    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp)

    t0 = time.time()
    img = np.asarray(render_sharded(scene, meta, cfg, mesh))
    print(f"sharded render: {time.time() - t0:.2f}s")

    if len(devs) > 1:
        ref = np.asarray(render(scene, meta, cfg))
        same = (np.array_equal(img, ref) if mesh.shape["sp"] == 1
                else bool(np.allclose(img, ref, atol=5e-7, rtol=5e-7)))
        kind = ("bit-identical" if mesh.shape["sp"] == 1
                else "equal to f32 psum reassociation")
        print(f"vs single-chip: {kind}: {same}")
        assert same

    write_ppm(args.out, img)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
