"""Pallas fused closest-hit kernel vs the XLA engines (interpret mode on
CPU; the compiled path runs in bench.py / the CLI on the TPU).

Contract (same as the BVH engine, tests/test_bvh.py): identical RNG, same
winners everywhere except ulp-level f32 ties, where a flipped winner changes
that pixel's whole path.  Reference flip rates measured on scene 0 at
24x16x2spp: XLA-BVH 7 pixels, Pallas 5 pixels, of 384.
"""

import numpy as np
import pytest

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops import pallas_hit
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig


@pytest.mark.parametrize("scene_id,spp,max_bad", [
    (0, 2, 12),   # moving spheres: f32 tie flips expected (see docstring)
    (2, 2, 2),    # earth: image-texture lookup through the record path
    (4, 2, 0),    # quads only: bit-exact
    (5, 2, 24),   # simple_light: marble on the r=1000 ground sphere
                  # chaotically amplifies ulp-level t differences (see
                  # tests/test_mega.py fallback-test docstring)
    (6, 2, 0),    # cornell: quads + emissive
    (8, 2, 2),    # cornell smoke: media merge path
])
def test_pallas_engine_matches_chunked(scene_id, spp, max_bad):
    W, H = 24, 16
    scene, meta = compile_scene(scenes.build_scene(scene_id), W, H,
                                dtype=np.float32)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       rays_per_batch=512)
    ref = render(scene, meta, cfg)
    img = render(scene, meta, cfg.with_(engine="wavefront_pallas"))
    nbad = int((np.abs(img - ref).max(-1) > 1e-5).sum())
    assert nbad <= max_bad, f"{nbad} pixels flipped"


def test_pack_geometry_shapes():
    scene, meta = compile_scene(scenes.final_scene(), 8, 8)
    sph, quad = pallas_hit.pack_geometry(scene)
    assert sph.shape[0] == 10 and sph.shape[1] % 128 == 0
    assert quad.shape[0] == 13 and quad.shape[1] % 128 == 0
    # active rows mask exactly the real primitives
    assert int(np.asarray(sph[9]).sum()) == meta.n_spheres
    assert int(np.asarray(quad[12]).sum()) == meta.n_quads
