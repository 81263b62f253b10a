"""Scene-9 cull-path experiments (TPU): reduced config, relative effects."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

W, H, spp = int(sys.argv[1]) if len(sys.argv) > 1 else 720, \
            int(sys.argv[2]) if len(sys.argv) > 2 else 360, \
            int(sys.argv[3]) if len(sys.argv) > 3 else 25
sid = int(sys.argv[4]) if len(sys.argv) > 4 else 9
scene, meta = compile_scene(scenes.build_scene(sid), W, H, dtype=np.float32)
cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp, engine="mega2")
img = render(scene, meta, cfg, out_u8=True)     # compile + warm
best = 1e9
for _ in range(2):
    t0 = time.time(); img = render(scene, meta, cfg, out_u8=True)
    best = min(best, time.time() - t0)
print(f"scene {sid} {W}x{H}@{spp}: {best:.3f} s  "
      f"(DENSE_MAX={os.environ.get('MEGA2_DENSE_MAX','-')}, "
      f"CAPS={os.environ.get('MEGA2_CAPS','-')})", flush=True)
