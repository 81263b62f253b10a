"""Dev harness: mega2 on the TPU — correctness smoke + timing.

Usage: python tools/dev_mega2_tpu.py [scene] [W] [H] [spp] [repeats]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np

from raytracinginoneweekendincuda_tpu.models.scenes import build_scene
from raytracinginoneweekendincuda_tpu.ops.mega2 import render_mega2
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

sid = int(sys.argv[1]) if len(sys.argv) > 1 else 0
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1440
H = int(sys.argv[3]) if len(sys.argv) > 3 else 720
SPP = int(sys.argv[4]) if len(sys.argv) > 4 else 10
REP = int(sys.argv[5]) if len(sys.argv) > 5 else 3

import jax

print(f"backend: {jax.devices()}", file=sys.stderr)
cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP)
scene, meta = compile_scene(build_scene(sid), W, H, dtype=np.float32)

t0 = time.perf_counter()
img = render_mega2(scene, meta, cfg, out_u8=True)
print(f"compile+first run: {time.perf_counter()-t0:.2f} s", file=sys.stderr)
best = float("inf")
for _ in range(REP):
    t0 = time.perf_counter()
    img = render_mega2(scene, meta, cfg, out_u8=True)
    best = min(best, time.perf_counter() - t0)
rays = W * H * SPP
print(f"scene {sid} {W}x{H}@{SPP}spp: best {best:.3f} s = "
      f"{rays/best/1e6:.2f} M rays/s ({rays/best/22e6:.3f}x of 22M anchor)")
assert img.any()
