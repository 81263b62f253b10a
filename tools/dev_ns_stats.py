"""North-star occupancy probe: per-lane (segments, iters) stats and
steady-state frame time for book1_final under the current MEGA2_* env
(set MEGA2_CAPS to sweep pass schedules).

Usage: python tools/dev_ns_stats.py [W] [H] [spp] [scene|ns]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax

from raytracinginoneweekendincuda_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops import mega2
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig
from raytracinginoneweekendincuda_tpu.utils.batching import plan_pixel_spans

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
H = int(sys.argv[2]) if len(sys.argv) > 2 else 675
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 100
which = sys.argv[4] if len(sys.argv) > 4 else "ns"

desc = scenes.book1_final() if which == "ns" else scenes.build_scene(int(which))
scene, meta = compile_scene(desc, W, H, dtype=np.float32)
cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp, engine="mega2")
(sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q, perm_tab,
 vec_tab, img_tab, img_key, mu_key, med, _remap) = mega2.mega2_tables(scene, meta)
med_key = tuple(tuple(float(x) for x in row) for row in med)
cam_key = mega2._cam_tuple(scene.camera)
bg = tuple(float(x) for x in np.asarray(scene.camera.background))
npix = W * H
prims = sph_tab.shape[0] + (quad_tab.shape[0] if meta.n_quads else 0)
spans = plan_pixel_spans(
    npix, spp, prims,
    dark_background=float(np.max(np.asarray(scene.camera.background))) < 0.05,
    lane_multiple=mega2.TILE_RAYS)
kw = dict(npix=npix, meta=meta, med_key=med_key, cam_key=cam_key,
          img_key=img_key, mu_key=mu_key, width=W, height=H, spp=spp,
          seed=cfg.seed, max_bounces=cfg.max_bounces, t_min=cfg.t_min,
          background=bg, interpret=jax.default_backend() != "tpu")

segs_tot = 0
iters_tot = 0
fbsum = 0.0
t0 = time.time()
for p0, span in spans:
    fb, stats = mega2.render_mega2_span(
        sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
        perm_tab, vec_tab, img_tab, p0=int(p0), span=int(span), **kw)
    s = np.asarray(stats)
    segs_tot += int(s[:, 0].sum())
    iters_tot += int(s[:, 1].sum())
    fbsum += float(np.asarray(fb).sum())
wall = time.time() - t0

reps = 2
best = float("inf")
for _ in range(reps):
    t1 = time.time()
    outs = [mega2.render_mega2_span(
        sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
        perm_tab, vec_tab, img_tab, p0=int(p0), span=int(span), **kw)
        for p0, span in spans]
    jax.block_until_ready(outs)
    best = min(best, time.time() - t1)
U = mega2.unroll_for(meta, sph_tab.shape[0], mu_key, False)
caps = os.environ.get("MEGA2_CAPS", "(default)")
print(f"{which} {W}x{H}@{spp} caps={caps}: "
      f"first {wall:.2f}s steady {best:.2f}s ({len(spans)} spans) "
      f"rays/s={W*H*spp/best/1e6:.1f}M")
print(f"  segments {segs_tot/1e6:.1f} M (depth {segs_tot/(npix*spp):.2f}) "
      f"lane-slots {iters_tot*U/1e6:.1f} M "
      f"occupancy {segs_tot/(iters_tot*U)*100:.1f}% fbsum {fbsum:.1f}")
