"""Dev harness: mega2 vs chunked engine parity on CPU (interpret mode)."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from raytracinginoneweekendincuda_tpu.models.scenes import build_scene
from raytracinginoneweekendincuda_tpu.ops.mega2 import render_mega2
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

scene_id = int(sys.argv[1]) if len(sys.argv) > 1 else 0
W, H, SPP = 64, 36, 4
cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP, engine="bruteforce")
desc = build_scene(scene_id)
scene, meta = compile_scene(desc, W, H, dtype=np.float32)

ref = render(scene, meta, cfg, gamma=False)
img = render_mega2(scene, meta, cfg, gamma=False)
diff = np.abs(ref - img)
print(f"scene {scene_id}: max diff {diff.max():.3e}  mean {diff.mean():.3e}  "
      f"mismatched pixels(>1e-4): {(diff.max(-1) > 1e-4).sum()}/{W*H}")
assert diff.max() < 5e-3 or (diff.max(-1) > 1e-3).sum() < W * H * 0.002, "PARITY FAIL"
print("OK")
