"""On-TPU validation of the Pallas custom-VJP replay on textured scenes.

The CPU test suite covers the Pallas replay's primals on every supported
scene and its gradients on solid/checker scenes; the noise-scene GRADIENT
can't run there (XLA:CPU compile of the interpret-mode backward through
7-octave turbulence exceeds 10 minutes).  This script runs the full
statement on the real chip:

  * forward lane agreement vs the XLA replay on scenes 2 (image),
    3 (Perlin marble), 8 (box constant media), and 9 (sphere media +
    marble + earth — the everything scene);
  * medium-albedo gradient comparison on scenes 8/9 (the one trainable
    path through a constant medium);
  * geometry-gradient comparison vs the XLA replay over the AGREEING
    lanes (disagreeing lanes are near-tangency root-flip ties — different
    but equally valid pathwise estimators whose marble gradients
    legitimately differ, docs/PERF.md).

Expected (TPU v5e, 64x48 @ 8 bounces): scene 2 close-lane fraction 1.000;
scene 3 >= 0.90 with agreeing-lane gradient rel-L1 <= ~0.10 (measured
0.052 — dominated by marble curvature amplifying the engines' ~1e-6
hit-point rounding, not by the backward's bf16 table-gradient pass).

Usage: python tools/validate_pallas_replay_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops import replay as rp
from raytracinginoneweekendincuda_tpu.ops.pallas_replay import replay_pallas
from raytracinginoneweekendincuda_tpu.ops.raygen import generate_rays
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene

W, H, K = 64, 48, 8


def run_scene(sid):
    scene, meta = compile_scene(scenes.build_scene(sid), W, H,
                                dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d, t, pc = generate_rays(scene.camera, pix, jnp.uint32(0), W, H, 1984)
    tape, _ = rp.generate_tape(scene, meta, o, d, t, pc, jnp.uint32(0),
                               max_bounces=K, t_min=1e-3)
    r_x = np.asarray(rp.replay(scene, meta, tape, o, d, t, pc,
                               jnp.uint32(0), max_bounces=K, t_min=1e-3))
    r_p = np.asarray(replay_pallas(scene, meta, tape, o, d, t, pc,
                                   jnp.uint32(0), max_bounces=K,
                                   t_min=1e-3))
    agree = np.isclose(r_p, r_x, rtol=1e-3, atol=5e-4).all(axis=-1)
    print(f"scene {sid}: close-lane fraction {agree.mean():.4f} "
          f"(maxdiff {np.abs(r_p - r_x).max():.2e})", flush=True)

    wgt = (jnp.arange(W * H * 3, dtype=jnp.float32).reshape(-1, 3) * 1e-4
           * jnp.asarray(agree, jnp.float32)[:, None])

    def make(fn):
        def L(c0):
            sc = scene._replace(sph_c0=c0)
            return (fn(sc, meta, tape, o, d, t, pc, jnp.uint32(0),
                       max_bounces=K, t_min=1e-3) * wgt).sum()
        return L

    t0 = time.time()
    gx = np.asarray(jax.grad(make(rp.replay))(scene.sph_c0))
    gp = np.asarray(jax.grad(make(replay_pallas))(scene.sph_c0))
    denom = np.abs(gx).sum()
    rel = np.abs(gp - gx).sum() / denom if denom > 0 else 0.0
    print(f"scene {sid}: agreeing-lane grad |gx|={denom:.3e} "
          f"rel-L1 {rel:.4f} ({time.time() - t0:.0f}s)", flush=True)

    # FD-on-agreeing-lanes: central finite difference of the PALLAS
    # primal along a fixed direction vs the Pallas gradient's directional
    # derivative.  This grounds the Pallas gradient against its OWN
    # primal (the XLA comparison above grounds it against a different
    # estimator) — the check docs/PERF.md's 5.2% marble attribution
    # appeals to.
    rng = np.random.default_rng(7)
    v = rng.standard_normal(np.asarray(scene.sph_c0).shape)
    v = jnp.asarray(v / np.abs(v).sum(), jnp.float32)
    eps = 1e-3
    Lp = make(replay_pallas)
    lo = float(Lp(scene.sph_c0 - eps * v))
    hi = float(Lp(scene.sph_c0 + eps * v))
    dd_fd = (hi - lo) / (2 * eps)
    dd_ad = float(jnp.sum(jnp.asarray(gp) * v))
    rel_fd = abs(dd_fd - dd_ad) / max(abs(dd_fd), 1e-12)
    print(f"scene {sid}: FD directional {dd_fd:.5e} vs AD {dd_ad:.5e} "
          f"rel {rel_fd:.4f}", flush=True)
    return agree.mean(), rel, denom, rel_fd


def run_media_scene(sid):
    """Constant-media scenes (8: box smoke, 9: sphere media + marble +
    earth): primal lane agreement vs the XLA replay (the Pallas kernel
    recomputes the winning medium's scatter t with mega2-trace rounding,
    ulps from `hit.medium_candidates`' division form) and the medium
    ALBEDO gradient — the one trainable path through a medium (tex_c0
    via the appended material row)."""
    scene, meta = compile_scene(scenes.build_scene(sid), W, H,
                                dtype=np.float32)
    scene = jax.tree.map(jnp.asarray, scene)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d, t, pc = generate_rays(scene.camera, pix, jnp.uint32(0), W, H, 1984)
    tape, _ = rp.generate_tape(scene, meta, o, d, t, pc, jnp.uint32(0),
                               max_bounces=K, t_min=1e-3)
    r_x = np.asarray(rp.replay(scene, meta, tape, o, d, t, pc,
                               jnp.uint32(0), max_bounces=K, t_min=1e-3))
    r_p = np.asarray(replay_pallas(scene, meta, tape, o, d, t, pc,
                                   jnp.uint32(0), max_bounces=K,
                                   t_min=1e-3))
    agree = np.isclose(r_p, r_x, rtol=1e-3, atol=5e-4).all(axis=-1)
    print(f"scene {sid}: close-lane fraction {agree.mean():.4f} "
          f"(maxdiff {np.abs(r_p - r_x).max():.2e})", flush=True)

    wgt = (jnp.arange(W * H * 3, dtype=jnp.float32).reshape(-1, 3) * 1e-4
           * jnp.asarray(agree, jnp.float32)[:, None])

    def make(fn):
        def L(tex):
            sc = scene._replace(tex_c0=tex)
            return (fn(sc, meta, tape, o, d, t, pc, jnp.uint32(0),
                       max_bounces=K, t_min=1e-3) * wgt).sum()
        return L

    t0 = time.time()
    gx = np.asarray(jax.grad(make(rp.replay))(scene.tex_c0))
    gp = np.asarray(jax.grad(make(replay_pallas))(scene.tex_c0))
    med_tex = np.asarray(scene.mat_tex)[np.asarray(scene.med_mat)]
    gx_med = gx[med_tex]
    denom = np.abs(gx_med).sum()
    rel = (np.abs(gp[med_tex] - gx_med).sum() / denom) if denom > 0 else 0.0
    print(f"scene {sid}: medium-albedo grad |gx|={denom:.3e} "
          f"rel-L1 {rel:.4f} ({time.time() - t0:.0f}s)", flush=True)
    return agree.mean(), rel, denom


def main():
    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev.device_kind})", flush=True)
    ok = True
    # Thresholds are measured + margin (round-4 VALIDATION.json measured
    # scene3 0.9521/0.0518, scenes 8/9 ~1.0/0.0009): a 2x regression in
    # gradient quality must FAIL, not drift quietly under a slack bound.
    frac2, rel2, _, _ = run_scene(2)
    ok &= frac2 >= 0.999
    # scene 2's geometry grads are zero a.e. (nearest-texel image), so
    # rel2 is 0/0-guarded above — the assertion is the primal fraction.
    frac3, rel3, g3, fd3 = run_scene(3)
    # fd3 threshold 0.35: central FD on the marble loss carries
    # O(eps^2 f''') truncation from sin(10*turb(2^6 p)) curvature —
    # measured 0.20 at eps=1e-3 (smaller eps hits f32 resolution).  The
    # check guards sign/magnitude blowups, not ulp agreement.
    ok &= frac3 >= 0.94 and g3 > 0.0 and rel3 < 0.08 and fd3 < 0.35
    frac8, rel8, g8 = run_media_scene(8)
    ok &= frac8 >= 0.99 and g8 > 0.0 and rel8 < 0.01
    frac9, rel9, g9 = run_media_scene(9)
    ok &= frac9 >= 0.99 and g9 > 0.0 and rel9 < 0.01
    print("PASS" if ok else "FAIL", flush=True)
    out = os.environ.get("RTOW_VALIDATE_JSON")
    if out:
        import json

        with open(out, "w") as f:
            json.dump({
                "backend": f"{dev.platform} ({dev.device_kind})",
                "config": f"{W}x{H}@{K}bounces",
                "scene2_close_lane_fraction": round(float(frac2), 4),
                "scene3_close_lane_fraction": round(float(frac3), 4),
                "scene3_geom_grad_rel_l1": round(float(rel3), 4),
                "scene3_fd_directional_rel": round(float(fd3), 4),
                "scene8_close_lane_fraction": round(float(frac8), 4),
                "scene8_medium_albedo_grad_rel_l1": round(float(rel8), 4),
                "scene9_close_lane_fraction": round(float(frac9), 4),
                "scene9_medium_albedo_grad_rel_l1": round(float(rel9), 4),
                "ok": bool(ok),
            }, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
