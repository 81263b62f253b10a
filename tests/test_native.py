"""Native (C++) runtime helpers vs their Python reference implementations.

The library is compiled on the fly (g++ is part of the toolchain); if the
build fails the tests are skipped rather than failed, since every native
entry point has a pure-Python fallback (native/runtime.py docstring).
"""

import os

import numpy as np
import pytest

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.native import runtime
from raytracinginoneweekendincuda_tpu.scene.bvh import (
    build_bvh, build_scene_bvh, primitive_bounds,
)
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene


@pytest.fixture(scope="module")
def native_lib():
    if not runtime.available():
        from raytracinginoneweekendincuda_tpu.native import build

        try:
            build.build(verbose=False)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"native build failed: {e}")
        runtime._TRIED = False  # re-probe
    if not runtime.available():
        pytest.skip("native library unavailable")
    return runtime


@pytest.mark.parametrize("scene_id", [0, 7, 9])
def test_native_bvh_matches_python(native_lib, scene_id):
    scene, meta = compile_scene(scenes.build_scene(scene_id), 8, 8,
                                dtype=np.float64)
    lo, hi, ids = primitive_bounds(scene)
    py = build_bvh(lo, hi, ids, dtype=np.float64)
    nmin, nmax, prim, escape = native_lib.build_bvh(lo, hi, ids.astype(np.int32))
    np.testing.assert_array_equal(prim, py.prim)
    np.testing.assert_array_equal(escape, py.escape)
    np.testing.assert_array_equal(nmin, py.nmin)
    np.testing.assert_array_equal(nmax, py.nmax)


def test_native_bvh_used_by_scene_build(native_lib):
    scene, meta = compile_scene(scenes.quads(), 8, 8)
    a = build_scene_bvh(scene, use_native=True)
    b = build_scene_bvh(scene, use_native=False)
    np.testing.assert_array_equal(a.prim, b.prim)
    np.testing.assert_array_equal(a.escape, b.escape)


def test_native_ppm_writer(native_lib, tmp_path):
    rgb = (np.arange(2 * 3 * 3) % 256).astype(np.uint8).reshape(2, 3, 3)
    path = str(tmp_path / "native.ppm")
    native_lib.write_ppm(path, rgb)
    txt = open(path).read().split()
    assert txt[:4] == ["P3", "3", "2", "255"]
    vals = np.array(txt[4:], np.int32).reshape(2, 3, 3)
    np.testing.assert_array_equal(vals, rgb)
