"""Pallas custom-VJP replay (`ops/pallas_replay.py`).

Contract vs the XLA replay (`ops/replay.py`):

  * scene 4 (quads, solid colors, no near-tangent quadratic): bit-exact
    primal and tightly-matching gradients — every expression mirrors
    shade.py / taped_record exactly;
  * scene 0 (500 spheres, checker ground, moving spheres): the sphere
    quadratic's ``b*b - a*c`` cancels catastrophically near tangencies and
    FMA-contraction rounding differs BETWEEN COMPILATION CONTEXTS (pallas
    vs plain XLA; measured 4.7e-6 on near-zero discriminants), which can
    flip a checker cell on isolated lanes — the same
    different-but-equally-valid-estimator class as the mega2 trace tape
    (docs/PERF.md).  The suite therefore asserts a high bit-exact lane
    fraction plus finite-difference validation of the Pallas gradient
    against the Pallas primal itself (the strongest self-consistency
    statement, independent of cross-engine rounding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops import replay as rp
from raytracinginoneweekendincuda_tpu.ops.pallas_replay import (
    replay_pallas, replay_pallas_supported,
)
from raytracinginoneweekendincuda_tpu.ops.raygen import generate_rays
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene

W, H, K = 16, 12, 5
# Reverse-mode THROUGH the interpret-mode backward kernel compiles a graph
# whose XLA:CPU compile time is superlinear in the unrolled bounce count
# (measured: 21 s at K=2, 52 s at K=3, ~10 min at K=5).  Gradient tests
# therefore run at K_SMOKE by default; the full-depth variants are `slow`
# (the TPU path compiles the real Mosaic kernel, where K=8 is the
# production depth — tools/dev_grad_bench.py).
K_SMOKE = 2


def _setup(sid, k=K):
    scene, meta = compile_scene(scenes.build_scene(sid), W, H,
                                dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d, t, pc = generate_rays(scene.camera, pix, jnp.uint32(0), W, H, 1984)
    tape, _ = rp.generate_tape(scene, meta, o, d, t, pc, jnp.uint32(0),
                               max_bounces=k, t_min=1e-3)
    return scene, meta, tape, o, d, t, pc


def test_supported_gate():
    # every reference scene runs the Pallas replay, constant media
    # (scenes 8/9) included
    for sid in range(10):
        _, meta = compile_scene(scenes.build_scene(sid), 8, 6,
                                dtype=np.float32)
        assert replay_pallas_supported(meta), sid


def test_primal_exact_on_quads():
    scene, meta, tape, o, d, t, pc = _setup(4)
    r_x = rp.replay(scene, meta, tape, o, d, t, pc, jnp.uint32(0),
                    max_bounces=K, t_min=1e-3)
    r_p = replay_pallas(scene, meta, tape, o, d, t, pc, jnp.uint32(0),
                        max_bounces=K, t_min=1e-3)
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_x))


@pytest.mark.parametrize("sid,minfrac", [(2, 0.999), (3, 0.90), (5, 0.90)])
def test_primal_textured_scenes_match_xla(sid, minfrac):
    """Perlin-marble (scenes 3/5) and image (scene 2) textures vs the XLA
    replay.  The image path is near-exact (nearest texel; the acos/atan2
    polynomials land on the same texels here).  Noise lanes carry
    turbulence FMA noise plus the same near-tangency root-flip ties as
    scene 0 — agreement is per-lane, with the agreeing lanes tight."""
    scene, meta, tape, o, d, t, pc = _setup(sid, K_SMOKE)
    r_x = np.asarray(rp.replay(scene, meta, tape, o, d, t, pc,
                               jnp.uint32(0), max_bounces=K_SMOKE,
                               t_min=1e-3))
    r_p = np.asarray(replay_pallas(scene, meta, tape, o, d, t, pc,
                                   jnp.uint32(0), max_bounces=K_SMOKE,
                                   t_min=1e-3))
    close = np.isclose(r_p, r_x, rtol=1e-3, atol=5e-4).all(axis=-1)
    assert close.mean() >= minfrac, close.mean()


def test_all_param_grads_finite():
    """Every trainable leaf's gradient (train.split_params: geometry,
    material scalars, colors, camera incl. background) is finite through
    the Pallas backward.  Regression for two real bugs: the tile-padding
    lanes' degenerate quadratic (a = 0 -> 1/0 = inf -> reverse-mode NaN
    summed into d_rep row 0, poisoning sph_dc's gradient for every
    batch size not a TILE_RAYS multiple), and the camera background
    being baked as a kernel constant (TracerArrayConversionError under
    the train step's jit, where camera params are traced)."""
    from raytracinginoneweekendincuda_tpu.parallel.train import (
        merge_params, split_params,
    )

    scene, meta, tape, o, d, t, pc = _setup(0, K_SMOKE)
    params = split_params(scene)

    def L(p):
        sc = merge_params(scene, p)
        return replay_pallas(sc, meta, tape, o, d, t, pc, jnp.uint32(0),
                             max_bounces=K_SMOKE, t_min=1e-3).sum()

    grads = jax.jit(jax.grad(L))(params)   # jit: traced camera leaves
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert bool(jnp.isfinite(g).all()), path
    # the background gradient is real (miss lanes: d(loss)/d(bg) = thr)
    assert float(jnp.abs(grads["camera"].background).max()) > 0.0


# Noise-scene GRADIENT validation is TPU-only: XLA:CPU's compile of the
# interpret-mode backward through 7-octave turbulence exceeds 10 minutes
# even at 2 bounces.  `tools/validate_pallas_replay_tpu.py` runs the
# masked-lane gradient comparison vs the XLA replay on the chip
# (measured: agreeing-lane rel-L1 5.2% at 64x48@8 bounces — marble
# curvature amplifying ~1e-6 hit-point rounding, docs/PERF.md).


def test_primal_media_scene_matches_xla():
    """Constant-media scene 8 (cornell smoke: two rotated box media) vs
    the XLA replay.  The Pallas kernel recomputes the winning medium's
    stochastic scatter t with the mega2 trace expressions and the same
    MEDIUM_STREAM draw; rounding differs from `hit.medium_candidates`
    (reciprocal-multiply quadratic vs division) by ulps, so agreement is
    per-lane close, not bit-exact.  Scene 9 (sphere media + marble +
    earth) runs on-TPU in `tools/validate_pallas_replay_tpu.py` — its
    interpret-mode turbulence compile is the documented >10 min case."""
    scene, meta, tape, o, d, t, pc = _setup(8, K_SMOKE)
    r_x = np.asarray(rp.replay(scene, meta, tape, o, d, t, pc,
                               jnp.uint32(0), max_bounces=K_SMOKE,
                               t_min=1e-3))
    r_p = np.asarray(replay_pallas(scene, meta, tape, o, d, t, pc,
                                   jnp.uint32(0), max_bounces=K_SMOKE,
                                   t_min=1e-3))
    close = np.isclose(r_p, r_x, rtol=1e-4, atol=1e-5).all(axis=-1)
    assert close.mean() > 0.95, close.mean()


def _media_probe():
    """Sphere + box constant media in front of a large light: at 2
    bounces, scatter-in-medium -> hit-light paths EXIST (scene 8's
    small ceiling light yields none among 192 rays below ~6 bounces,
    which the CPU interpret-mode backward can't reach — compile note at
    K_SMOKE).  Density 0.7 measured best here: higher densities
    rescatter the b1 ray inside the medium instead of letting it reach
    the light (each medium gets 2 scatter->light tape paths at K=2)."""
    from raytracinginoneweekendincuda_tpu.core.camera import Camera
    from raytracinginoneweekendincuda_tpu.scene.api import (
        Box, ConstantMedium, DiffuseLight, Quad, SceneDesc, Sphere,
        Lambertian,
    )

    desc = SceneDesc()
    desc.add(
        ConstantMedium(Sphere((-0.6, 0.0, -1.5), 0.5, Lambertian((1, 1, 1))),
                       0.7, (0.8, 0.4, 0.2)),
        ConstantMedium(Box((0.1, -0.5, -2.0), (1.1, 0.5, -1.0),
                           Lambertian((1, 1, 1))),
                       0.7, (0.2, 0.5, 0.9)),
        Quad((-4.0, -4.0, -4.0), (8.0, 0.0, 0.0), (0.0, 8.0, 0.0),
             DiffuseLight((5.0, 5.0, 5.0))),
    )
    desc.camera = Camera(lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov=90.0,
                         focus_dist=1.0, background=(0.0, 0.0, 0.0))
    scene, meta = compile_scene(desc, W, H, dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d, t, pc = generate_rays(scene.camera, pix, jnp.uint32(0), W, H, 1984)
    tape, _ = rp.generate_tape(scene, meta, o, d, t, pc, jnp.uint32(0),
                               max_bounces=K_SMOKE, t_min=1e-3)
    return scene, meta, tape, o, d, t, pc


@pytest.mark.parametrize("med", [0, 1])
def test_medium_albedo_grad_matches_fd(med):
    """d(loss)/d(tex_c0[medium albedo]) through the Pallas backward ==
    central FD of the Pallas primal, for a sphere-boundary (med 0) and a
    box-boundary (med 1) constant medium — validates that the medium
    material row appended to the merged replay table carries a REAL
    gradient (the one trainable path through a constant medium) through
    both boundary-t recompute branches."""
    scene, meta, tape, o, d, t, pc = _media_probe()
    wgt = jnp.ones((W * H, 3), jnp.float32)
    ti = int(np.asarray(scene.mat_tex)[int(np.asarray(scene.med_mat)[med])])
    idx = (ti, 1)

    def L(v):
        sc = scene._replace(tex_c0=scene.tex_c0.at[idx].set(v))
        return (replay_pallas(sc, meta, tape, o, d, t, pc, jnp.uint32(0),
                              max_bounces=K_SMOKE, t_min=1e-3) * wgt).sum()

    v0 = scene.tex_c0[idx]
    g = float(jax.grad(L)(v0))
    eps = 1e-3
    fd = (float(L(v0 + eps)) - float(L(v0 - eps))) / (2 * eps)
    assert np.isfinite(g)
    assert abs(g) > 0.0, "vacuous: no path scattered in the medium"
    np.testing.assert_allclose(g, fd, rtol=5e-2)


def test_primal_lane_agreement_on_spheres():
    scene, meta, tape, o, d, t, pc = _setup(0)
    r_x = np.asarray(rp.replay(scene, meta, tape, o, d, t, pc,
                               jnp.uint32(0), max_bounces=K, t_min=1e-3))
    r_p = np.asarray(replay_pallas(scene, meta, tape, o, d, t, pc,
                                   jnp.uint32(0), max_bounces=K,
                                   t_min=1e-3))
    exact = (r_p == r_x).all(axis=-1)
    assert exact.mean() > 0.95, exact.mean()


@pytest.mark.parametrize("k", [K_SMOKE,
                               pytest.param(K, marks=pytest.mark.slow)])
def test_grads_match_xla_replay_on_quads(k):
    scene, meta, tape, o, d, t, pc = _setup(4, k)
    wgt = jnp.arange(W * H * 3, dtype=jnp.float32).reshape(-1, 3) * 1e-2

    def make(fn):
        def L(tex):
            sc = scene._replace(tex_c0=tex)
            return (fn(sc, meta, tape, o, d, t, pc, jnp.uint32(0),
                       max_bounces=k, t_min=1e-3) * wgt).sum()
        return L

    gx = jax.grad(make(rp.replay))(scene.tex_c0)
    gp = jax.grad(make(replay_pallas))(scene.tex_c0)
    assert float(jnp.abs(gx).max()) > 0.0
    # the Pallas backward's table-gradient accumulation is a single-pass
    # bf16 MXU dot BY DESIGN (~2^-9 relative rounding, far below the
    # Monte-Carlo gradient noise; exact accumulation costs 94 -> 151
    # ms/step — pallas_replay.py one-hot precision note)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=4e-3,
                               atol=4e-3 * float(jnp.abs(gx).max()))


@pytest.mark.parametrize("field,idx,k", [
    ("tex_c0", (0, 1), K_SMOKE),
    pytest.param("tex_c0", (0, 1), K, marks=pytest.mark.slow),
])
def test_grad_matches_fd_of_pallas_primal(field, idx, k):
    """d(loss)/d(param) from the Pallas backward kernel == central finite
    difference of the Pallas forward kernel — validates the hand-rolled
    custom-VJP wiring end to end (scene 0: spheres, checker, moving).

    Only COLOR-table parameters: with solid/checker textures (the v1
    kernel scope) the taped pathwise radiance is piecewise CONSTANT in
    geometry — hit points only feed `floor` cells and branch predicates —
    so geometry/ray/time gradients are identically zero by construction
    (`test_ray_time_cotangents_zero_and_finite`).  Geometry-gradient FD
    validation lives in tests/test_grad.py on a marble (continuous
    Perlin) probe scene, outside this kernel's scope."""
    scene, meta, tape, o, d, t, pc = _setup(0, k)
    wgt = jnp.arange(W * H * 3, dtype=jnp.float32).reshape(-1, 3) * 1e-3

    def L(v):
        arr = getattr(scene, field)
        sc = scene._replace(**{field: arr.at[idx].set(v)})
        return (replay_pallas(sc, meta, tape, o, d, t, pc, jnp.uint32(0),
                              max_bounces=k, t_min=1e-3) * wgt).sum()

    v0 = getattr(scene, field)[idx]
    g = float(jax.grad(L)(v0))
    eps = 1e-3
    fd = (float(L(v0 + eps)) - float(L(v0 - eps))) / (2 * eps)
    assert np.isfinite(g)
    assert abs(g) > 0.0, "vacuous: pick a parameter the loss depends on"
    np.testing.assert_allclose(g, fd, rtol=5e-2)


def test_ray_time_cotangents_zero_and_finite():
    """d(loss)/d(o, d, time) through the Pallas backward are finite and
    EXACTLY zero on scene 0 — matching the XLA replay.  Zero is the
    correct answer, not a vacuous one: with solid/checker textures the
    taped radiance depends on geometry only through `floor` cells and
    branch predicates (piecewise constant), so the pathwise estimator's
    ray/time derivative vanishes a.e. (verified identical for the XLA
    replay).  What this guards is the NaN channel: the backward sweep
    runs sqrt/pow/division chains whose naive reverse mode emits NaN at
    masked lanes (0*inf) — any guard regression shows up here as a
    non-finite cotangent, and any spurious-gradient bug as a nonzero."""
    scene, meta, tape, o, d, t, pc = _setup(0, K_SMOKE)
    wgt = jnp.arange(W * H * 3, dtype=jnp.float32).reshape(-1, 3) * 1e-3

    def L(o_, d_, t_):
        return (replay_pallas(scene, meta, tape, o_, d_, t_, pc,
                              jnp.uint32(0), max_bounces=K_SMOKE,
                              t_min=1e-3) * wgt).sum()

    go, gd, gt = jax.grad(L, argnums=(0, 1, 2))(o, d, t)
    for g in (go, gd, gt):
        g = np.asarray(g)
        assert np.isfinite(g).all()
        np.testing.assert_array_equal(g, np.zeros_like(g))


def _bytes255(img):
    return np.round(img * 255.0) / 255.0


def _ramp_img(h, w):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([x / (w - 1), y / (h - 1), (x + y) / (w + h - 2)], -1)
    return _bytes255(np.ascontiguousarray(img))


def _setup_desc(desc, k):
    scene, meta = compile_scene(desc, W, H, dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d, t, pc = generate_rays(scene.camera, pix, jnp.uint32(0), W, H, 1984)
    tape, _ = rp.generate_tape(scene, meta, o, d, t, pc, jnp.uint32(0),
                               max_bounces=k, t_min=1e-3)
    return scene, meta, tape, o, d, t, pc


def test_primal_multi_image_and_quad_uv():
    """Round-4 scope: two images with different dims plus an image on a
    quad.  The kernel must pick each winner's image plane (rep col 26)
    and compute quad UV as the interior (alpha, beta) via the
    triple-product identity from rep cols 3:9/9:12 — matching
    taped_record's alpha/beta exactly.  Nearest-texel fetch: bit-near
    equality except acos/atan2-polynomial texel-boundary lanes."""
    from raytracinginoneweekendincuda_tpu.core.camera import Camera
    from raytracinginoneweekendincuda_tpu.scene.api import (
        ImageTexture, Lambertian, Quad, SceneDesc, Sphere,
    )

    desc = SceneDesc()
    desc.add(
        Sphere((-2.2, 0, 0), 1.0, Lambertian(ImageTexture(_ramp_img(12, 20)))),
        Sphere((2.2, 0, 0), 1.0, Lambertian(ImageTexture(_ramp_img(9, 14)))),
        Quad((-2, -2, -2), (4, 0, 0), (0, 4, 0),
             Lambertian(ImageTexture(_ramp_img(12, 20)))),
    )
    desc.camera = Camera(lookfrom=(0, 0, 9), lookat=(0, 0, 0), vfov=40.0,
                         background=(0.70, 0.80, 1.00))
    scene, meta, tape, o, d, t, pc = _setup_desc(desc, K_SMOKE)
    assert meta.n_images == 3 and meta.image_on_quad
    assert replay_pallas_supported(meta)
    r_x = np.asarray(rp.replay(scene, meta, tape, o, d, t, pc,
                               jnp.uint32(0), max_bounces=K_SMOKE,
                               t_min=1e-3))
    r_p = np.asarray(replay_pallas(scene, meta, tape, o, d, t, pc,
                                   jnp.uint32(0), max_bounces=K_SMOKE,
                                   t_min=1e-3))
    agree = np.isclose(r_p, r_x, rtol=1e-3, atol=5e-4).all(axis=-1)
    assert agree.mean() > 0.99, f"{agree.mean():.3f}"

    # the quad must actually contribute image texels (not fall through
    # to solid/cyan): albedo gradient of the quad's texture rows nonzero
    def L(fn, tex):
        sc = scene._replace(tex_c0=tex)
        return fn(sc, meta, tape, o, d, t, pc, jnp.uint32(0),
                  max_bounces=K_SMOKE, t_min=1e-3).sum()

    g_p = np.asarray(jax.grad(lambda tx: L(replay_pallas, tx))(scene.tex_c0))
    g_x = np.asarray(jax.grad(lambda tx: L(rp.replay, tx))(scene.tex_c0))
    # image textures ignore tex_c0, so both must agree (and the solid
    # rows' gradients match across engines)
    np.testing.assert_allclose(g_p, g_x, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="two-table turbulence in the unrolled interpret "
                           "kernel trips the XLA:CPU slow-compile cliff "
                           "(>5 min primal); run with RTOW_TESTS_TPU=1")
def test_primal_multi_noise_tables():
    """Round-4 scope: two Perlin tables (different seeds).  Winners must
    run their own table's turbulence (rep col 25)."""
    from raytracinginoneweekendincuda_tpu.core.camera import Camera
    from raytracinginoneweekendincuda_tpu.scene.api import (
        Lambertian, NoiseTexture, SceneDesc, Sphere,
    )

    desc = SceneDesc()
    desc.add(
        Sphere((0, -1000, 0), 1000.0,
               Lambertian(NoiseTexture(4.0, table_seed=0))),
        Sphere((0, 2, 0), 2.0, Lambertian(NoiseTexture(2.0, table_seed=7))),
    )
    desc.camera = Camera(lookfrom=(13, 2, 3), lookat=(0, 0, 0), vfov=20.0,
                         background=(0.70, 0.80, 1.00))
    scene, meta, tape, o, d, t, pc = _setup_desc(desc, K_SMOKE)
    assert meta.n_noise == 2 and replay_pallas_supported(meta)
    r_x = np.asarray(rp.replay(scene, meta, tape, o, d, t, pc,
                               jnp.uint32(0), max_bounces=K_SMOKE,
                               t_min=1e-3))
    r_p = np.asarray(replay_pallas(scene, meta, tape, o, d, t, pc,
                                   jnp.uint32(0), max_bounces=K_SMOKE,
                                   t_min=1e-3))
    agree = np.isclose(r_p, r_x, rtol=1e-3, atol=5e-4).all(axis=-1)
    assert agree.mean() > 0.9, f"{agree.mean():.3f}"
