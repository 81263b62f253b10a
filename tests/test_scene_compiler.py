"""Scene compiler: flattening, transform baking, interning, padding."""

import math

import numpy as np

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.scene import api
from raytracinginoneweekendincuda_tpu.scene.compiler import (
    MAT_DIELECTRIC,
    MAT_ISOTROPIC,
    MED_BOX,
    compile_scene,
)


def test_all_reference_scenes_compile():
    expect = {
        # (spheres, quads, media) per kernel.cu:199-517
        1: (2, 0, 0),
        2: (1, 0, 0),
        3: (2, 0, 0),
        4: (0, 5, 0),
        5: (3, 1, 0),
        6: (0, 6, 0),
        7: (0, 18, 0),      # 6 walls + 2 boxes x 6 quads
        8: (0, 6, 2),       # smoke boxes are media, not geometry
    }
    for sid, (ns, nq, nm) in expect.items():
        arrays, meta = compile_scene(scenes.build_scene(sid), 64, 36)
        assert (meta.n_spheres, meta.n_quads, meta.n_media) == (ns, nq, nm), sid


def test_scene0_counts():
    _, meta = compile_scene(scenes.bouncing_spheres(), 64, 36)
    # 22x22 grid minus exclusion-zone skips, + ground + 3 big
    assert 400 <= meta.n_spheres <= 488
    assert meta.has_moving and meta.has_checker


def test_scene9_counts():
    arrays, meta = compile_scene(scenes.final_scene(), 64, 36)
    assert meta.n_quads == 400 * 6 + 1           # ground boxes + light quad
    # moving + glass + metal + subsurface shell + earth + perlin + 1000 cluster
    assert meta.n_spheres == 6 + 1000
    assert meta.n_media == 2                     # subsurface interior + mist
    assert meta.has_image and meta.has_noise and meta.has_moving


def test_translate_rotate_baking():
    # RotateY(90) then Translate maps +x to -z (Instance.h:97-98 convention)
    q = api.Quad((1, 0, 0), (1, 0, 0), (0, 1, 0), api.Lambertian((1, 1, 1)))
    desc = api.SceneDesc().add(api.Translate(api.RotateY(q, 90.0), (5, 0, 0)))
    from raytracinginoneweekendincuda_tpu.core.camera import Camera

    desc.camera = Camera()
    arrays, meta = compile_scene(desc, 8, 8, dtype=np.float64)
    # object->world: x' = cos*x + sin*z = z ;  z' = -sin*x + cos*z = -x
    np.testing.assert_allclose(arrays.quad_q[0], [5.0, 0.0, -1.0], atol=1e-12)
    np.testing.assert_allclose(arrays.quad_u[0], [0.0, 0.0, -1.0], atol=1e-12)
    np.testing.assert_allclose(arrays.quad_v[0], [0.0, 1.0, 0.0], atol=1e-12)


def test_medium_box_boundary_transform():
    desc = scenes.cornell_smoke()
    arrays, meta = compile_scene(desc, 8, 8, dtype=np.float64)
    assert list(arrays.med_kind[:2]) == [MED_BOX, MED_BOX]
    np.testing.assert_allclose(arrays.med_off[0], [265.0, 0.0, 295.0], atol=1e-12)
    assert math.isclose(float(arrays.med_cos[0]), math.cos(math.radians(15.0)))
    np.testing.assert_allclose(arrays.med_nid[:2], -1.0 / 0.01)
    # phase materials are isotropic
    assert all(arrays.mat_kind[m] == MAT_ISOTROPIC for m in arrays.med_mat[:2])


def test_material_interning():
    shared = api.Lambertian((0.5, 0.5, 0.5))
    desc = api.SceneDesc().add(
        api.Sphere((0, 0, 0), 1.0, shared),
        api.Sphere((2, 0, 0), 1.0, shared),
        api.Sphere((4, 0, 0), 1.0, api.Dielectric(1.5)),
    )
    from raytracinginoneweekendincuda_tpu.core.camera import Camera

    desc.camera = Camera()
    arrays, meta = compile_scene(desc, 8, 8)
    assert meta.n_materials == 2
    assert arrays.sph_mat[0] == arrays.sph_mat[1]
    assert arrays.mat_kind[arrays.sph_mat[2]] == MAT_DIELECTRIC


def test_padding_rows_inactive():
    desc = scenes.quads()
    arrays, meta = compile_scene(desc, 8, 8, pad_multiple=8)
    assert arrays.quad_q.shape[0] == 8
    assert arrays.quad_active[:5].all() and not arrays.quad_active[5:].any()
    assert arrays.sph_active.shape[0] == 8 and not arrays.sph_active.any()
