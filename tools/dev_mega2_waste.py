"""Measure mega2 divergence waste + per-iteration cost on the TPU.

Reads the kernel diagnostics: out row 3 = per-tile while-iteration count,
row 4 = per-lane executed segments.  waste = (sum_tiles iters*R) / segments.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np
import jax.numpy as jnp

from raytracinginoneweekendincuda_tpu.models.scenes import build_scene
from raytracinginoneweekendincuda_tpu.ops import mega2 as m2
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

sid = int(sys.argv[1]) if len(sys.argv) > 1 else 0
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1440
H = int(sys.argv[3]) if len(sys.argv) > 3 else 720
SPP = int(sys.argv[4]) if len(sys.argv) > 4 else 10

import jax

cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP)
scene, meta = compile_scene(build_scene(sid), W, H, dtype=np.float32)
(sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q, perm_tab,
 vec_tab, img_tab, img_key, mu_key, med, _remap) = m2.mega2_tables(scene, meta)
med_key = tuple(tuple(float(x) for x in row) for row in med)
cam_key = m2._cam_tuple(scene.camera)
bg = tuple(float(x) for x in np.asarray(scene.camera.background))
npix = W * H
R = m2.R_LANES
N = -(-npix // m2.TILE_RAYS) * m2.TILE_RAYS

args = dict(p0=0, span=N, npix=npix,
            meta=meta, med_key=med_key, cam_key=cam_key, img_key=img_key,
            mu_key=mu_key,
            width=W, height=H,
            spp=SPP, seed=cfg.seed, max_bounces=cfg.max_bounces,
            t_min=cfg.t_min, background=bg,
            interpret=jax.default_backend() != "tpu")
fb, stats = m2.render_mega2_span(
    sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
    perm_tab, vec_tab, img_tab, **args)
fb.block_until_ready()
t0 = time.perf_counter()
fb, stats = m2.render_mega2_span(
    sph_tab, quad_tab, attr_tab, coef_tab, cull_s, cull_q,
    perm_tab, vec_tab, img_tab, **args)
fb.block_until_ready()
dt = time.perf_counter() - t0
st = np.asarray(stats)
TR = m2.TILE_RAYS
iters = st[:, 1].reshape(-1, TR)[:, 0]     # per final-pass tile (approx)
segs = st[:, 0]
tot_iters = iters.sum()
tot_lane_steps = tot_iters * TR
tot_segs = segs.sum()
print(f"scene {sid} {W}x{H}@{SPP}spp: {dt:.3f} s")
print(f"tiles {N//TR}  iters/tile mean {iters.mean():.1f} p50 "
      f"{np.percentile(iters,50):.0f} p99 {np.percentile(iters,99):.0f} "
      f"max {iters.max():.0f}")
print(f"segments {tot_segs/1e6:.1f} M  lane-steps {tot_lane_steps/1e6:.1f} M "
      f"-> occupancy {tot_segs/tot_lane_steps*100:.1f}%")
print(f"mean path len {tot_segs/(npix*SPP):.2f}")
print(f"time/iter {dt/tot_iters*1e6:.2f} us  time/lane-step "
      f"{dt/tot_lane_steps*1e9:.2f} ns  time/segment {dt/tot_segs*1e9:.2f} ns")
