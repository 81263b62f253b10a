"""Megakernel engine vs the chunked engine (interpret mode on CPU).

Same contract as the other alternative engines: identical RNG counters,
identical bounce-loop semantics, winners equal everywhere except ulp-level
f32 ties.  Scenes 1/4/6/7/8 are bit-exact at test size; scene 0 (moving
spheres) allows isolated tie flips.  Noise/image scenes (2,3,5,9) dispatch
through the wavefront_pallas fallback, tested for consistency too.
"""

import numpy as np
import pytest

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.mega import mega_supported
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig


@pytest.mark.parametrize("scene_id,max_bad", [
    (0, 4),   # moving spheres: f32 ulp-tie flips allowed
    (1, 0),   # checker spheres
    (4, 0),   # quads
    (6, 0),   # cornell (emissive, black background)
    (7, 0),   # cornell + rotated boxes
    (8, 0),   # cornell smoke (sphere+box media)
])
def test_mega_matches_chunked(scene_id, max_bad):
    W, H, spp = 16, 8, 2
    scene, meta = compile_scene(scenes.build_scene(scene_id), W, H,
                                dtype=np.float32)
    assert mega_supported(meta)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       rays_per_batch=512)
    ref = render(scene, meta, cfg)
    img = render(scene, meta, cfg.with_(engine="mega"))
    nbad = int((np.abs(img - ref).max(-1) > 1e-5).sum())
    assert nbad <= max_bad, f"{nbad} pixels flipped"


def test_mega_fallback_for_noise_scene():
    """Noise scenes gate out of the megakernel; `mega` must dispatch to the
    general fast engine bit-exactly.  (Cross-engine radiance comparison is
    not meaningful on marble textures: ulp-level f32 t differences on the
    r=1000 ground sphere are chaotically amplified by sin(scale*z+10*turb);
    correctness vs the f64 oracle is covered by tests/test_f32_engine.py.)"""
    W, H, spp = 16, 8, 2
    scene, meta = compile_scene(scenes.perlin_spheres(), W, H,
                                dtype=np.float32)
    assert not mega_supported(meta)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       rays_per_batch=512)
    via_mega = render(scene, meta, cfg.with_(engine="mega"))
    direct = render(scene, meta, cfg.with_(engine="wavefront_pallas"))
    np.testing.assert_array_equal(via_mega, direct)
