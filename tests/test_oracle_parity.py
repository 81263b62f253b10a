"""Engine-vs-oracle parity: the batched f64 engine must reproduce the
scalar f64 oracle on every reference scene (SURVEY.md §4 test strategy:
allclose image tests per scene config against a trusted CPU implementation).

The two sides share only the RNG draw-slot contract and the analytic
samplers; hit selection, shading dispatch, textures and the integrator are
implemented independently (batched matmul/argmin vs scalar shrinking-tMax),
so agreement validates the vectorized reformulation.
"""

import numpy as np
import pytest

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.testing.compare import assert_images_close
from raytracinginoneweekendincuda_tpu.testing.oracle import Oracle
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig


def _parity(desc, W, H, spp, label, **tol):
    arrays, meta = compile_scene(desc, W, H, dtype=np.float64)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp, dtype="float64")
    img_e = render(arrays, meta, cfg)
    img_o = Oracle(arrays, meta, W, H, cfg.seed).render(spp)
    assert_images_close(img_e, img_o, label=label, **tol)


def test_book1_basic():
    _parity(scenes.book1_basic(), 32, 18, 2, "book1_basic")


@pytest.mark.parametrize("sid", [0, 1, 2, 3, 4, 5, 6, 7, 8])
def test_reference_scene(sid):
    # perlin gather ordering gives ~1e-11 wiggle (scene 3/5); others exact
    _parity(scenes.build_scene(sid), 24, 12, 2, f"scene{sid}")


def test_final_scene():
    _parity(scenes.build_scene(9), 16, 8, 2, "scene9")
