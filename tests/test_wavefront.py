"""Wavefront engine vs the chunked engine.

Contract: every radiance sample is computed from the same RNG counters, so
the engines agree up to f32 accumulation order in the per-pixel sample sum
(the wavefront scatters samples in completion order).  In f64 the images
match to ~1e-12; in f32 to a few ulp.
"""

import numpy as np
import pytest

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig


@pytest.mark.parametrize("scene_id,spp", [(0, 4), (4, 4), (8, 2)])
def test_wavefront_matches_chunked_f64(scene_id, spp):
    W, H = 24, 16
    scene, meta = compile_scene(scenes.build_scene(scene_id), W, H,
                                dtype=np.float64)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       dtype="float64", rays_per_batch=256)
    ref = render(scene, meta, cfg)
    img = render(scene, meta, cfg.with_(engine="wavefront"))
    np.testing.assert_allclose(img, ref, atol=1e-12, rtol=1e-12)


def test_wavefront_bvh_matches_chunked_f64():
    W, H, spp = 24, 16, 2
    scene, meta = compile_scene(scenes.build_scene(0), W, H, dtype=np.float64)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       dtype="float64", rays_per_batch=256)
    ref = render(scene, meta, cfg)
    img = render(scene, meta, cfg.with_(engine="wavefront_bvh"))
    diff = np.abs(img - ref).max(axis=-1)
    assert int((diff > 1e-9).sum()) <= 2   # BVH ulp caveat, tests/test_bvh.py


def test_wavefront_small_pool_and_f32():
    """Pool much smaller than the work list: refill must cover everything."""
    W, H, spp = 16, 8, 4
    scene, meta = compile_scene(scenes.quads(), W, H, dtype=np.float32)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       rays_per_batch=32)
    ref = render(scene, meta, cfg.with_(rays_per_batch=1 << 17))
    img = render(scene, meta, cfg.with_(engine="wavefront"))
    np.testing.assert_allclose(img, ref, atol=3e-6, rtol=3e-6)
