"""On-hardware validation: TPU-compiled engines vs the CPU reference engine.

The pytest suite runs the Pallas kernels in interpret mode (CPU), where the
mega/pallas engines are draw-exact with the XLA engines.  On real TPU
hardware, Mosaic's transcendental approximations (sin/cos/pow in the
direction samplers) differ from XLA's at the last bit, so affected paths
effectively re-roll their Monte-Carlo samples: images are *statistically*
identical but not per-draw equal.

This script verifies four properties on the real chip:
  1. per-scene pixel agreement against the CPU chunked engine at low spp
     (most pixels equal; divergent pixels bounded), and
  2. Monte-Carlo convergence: the p99 pixel difference must shrink like
     ~1/sqrt(spp) (re-roll noise), proving the divergence is unbiased;
  3. EXACT on-chip image pinning: the u8 mega2 frame of every scene is
     sha256-hashed on the TPU and compared against the hash recorded in
     the previous round's VALIDATION.json — the reference's MD5 PPM
     method (Docs/2권_3장_BVH_CUDA적용판.md:733), on hardware.  A changed
     hash FAILS unless RTOW_HASH_INTENDED=<reason> is set (the reason is
     recorded), so an on-chip-only regression (a Mosaic codegen change, a
     schedule change) is a loud diff, not a soft p99 drift;
  4. the NORTH-STAR config itself (book1_final 1200x675, BASELINE.json) at
     subsampled spp: TPU-vs-CPU p99 against the reseed noise floor, plus a
     fixed-tape finite-difference check of the Pallas fast-gradient path
     at that shape.

Run from the repo root: ``python tools/validate_tpu.py``
(each render phase runs in a fresh subprocess — see docs/PERF.md on
relay-worker longevity).
"""

from __future__ import annotations

import subprocess
import sys

import numpy as np

RENDER = '''
import numpy as np, jax
if "{backend}" == "cpu":
    jax.config.update("jax_platforms", "cpu")
from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig
W, H = 96, 54
for sid, spp in {jobs}:
    scene, meta = compile_scene(scenes.build_scene(sid), W, H, dtype=np.float32)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       engine="{engine}", seed={seed})
    img = render(scene, meta, cfg, gamma=False)
    np.save("/tmp/val_{backend}_{engine}_{seed}_%d_%d.npy" % (sid, spp),
            np.asarray(img, np.float32))
print("rendered-ok")
'''


def run(backend: str, engine: str, jobs, seed: int = 1984) -> None:
    code = (RENDER.replace("{backend}", backend).replace("{engine}", engine)
            .replace("{jobs}", repr(list(jobs))).replace("{seed}", str(seed)))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    if "rendered-ok" not in r.stdout:
        raise RuntimeError(f"{backend}/{engine} failed:\n{r.stderr[-800:]}")
    print(f"{backend}/{engine} seed={seed}: rendered", flush=True)


# ---- exact on-chip frame pinning (reference MD5 method, on hardware) ----

HASH_CONFIG = "mega2 96x54@4 seed1984 u8"

HASH_RENDER = '''
import hashlib, json, numpy as np
from raytracinginoneweekendincuda_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig
W, H = 96, 54
hashes = {}
for sid in range(10):
    scene, meta = compile_scene(scenes.build_scene(sid), W, H,
                                dtype=np.float32)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=4,
                       engine="mega2", seed=1984)
    img = render(scene, meta, cfg, out_u8=True)
    hashes[str(sid)] = hashlib.sha256(
        np.ascontiguousarray(img).tobytes()).hexdigest()[:16]
with open("/tmp/val_tpu_hashes.json", "w") as f:
    json.dump(hashes, f)
print("hashed-ok")
'''


NS_RENDER = '''
import numpy as np, jax
if "{backend}" == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    from raytracinginoneweekendincuda_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig
W, H, SPP = 1200, 675, {spp}
scene, meta = compile_scene(scenes.book1_final(), W, H, dtype=np.float32)
cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                   engine="{engine}", seed={seed})
img = render(scene, meta, cfg, gamma=False)
np.save("/tmp/val_ns_{backend}_{engine}_{seed}.npy",
        np.asarray(img, np.float32))
print("rendered-ok")
'''


NS_FASTGRAD_FD = '''
import numpy as np, jax, jax.numpy as jnp
from raytracinginoneweekendincuda_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.mega2 import mega2_tapes
from raytracinginoneweekendincuda_tpu.ops.pallas_replay import replay_pallas
from raytracinginoneweekendincuda_tpu.ops.raygen import generate_rays
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
W, H, K, SPP = 1200, 675, 6, 2
scene, meta = compile_scene(scenes.book1_final(), W, H, dtype=np.float32)
scene = jax.tree.map(jnp.asarray, scene)
rng = np.random.default_rng(11)
pix = jnp.asarray(np.sort(rng.choice(W * H, 8192, replace=False))
                  .astype(np.int32))
# FIXED tape + FIXED rays: the loss is then a smooth pure function of the
# params, so its AD gradient must match central finite differences — the
# fast-gradient path checked at the north-star image shape.
tape = mega2_tapes(scene, meta, np.asarray(pix), SPP, width=W, height=H,
                   max_bounces=K, t_min=1e-3, seed=1984)
o, d, t, pc = generate_rays(scene.camera, pix, jnp.uint32(0), W, H, 1984)
wgt = jnp.asarray(rng.standard_normal((pix.shape[0], 3)), jnp.float32)
# Differentiate the ALBEDOS (tex_c0): book1_final is solid/checker with a
# CONSTANT background, so pathwise geometry gradients are zero a.e. by
# design (docs/PERF.md; the marble geometry channel is validated by
# validate_pallas_replay_tpu.py) — the albedo channel is the smooth,
# everywhere-nonzero one at this shape.
def L(tex):
    sc = scene._replace(tex_c0=tex)
    return (replay_pallas(sc, meta, tape[0], o, d, t, pc, jnp.uint32(0),
                          max_bounces=K, t_min=1e-3) * wgt).sum()
g = jax.grad(L)(scene.tex_c0)
v = jnp.asarray(rng.standard_normal(scene.tex_c0.shape), jnp.float32)
# L-infinity normalization: perturbations must sit well above f32
# resolution (an L1-normalized v was sub-resolution, a degenerate 0/0)
v = v / jnp.abs(v).max()
eps = 1e-3
dd_ad = float(jnp.sum(g * v))
dd_fd = float((L(scene.tex_c0 + eps * v) - L(scene.tex_c0 - eps * v))
              / (2 * eps))
assert dd_ad != 0.0, "degenerate: zero directional gradient"
assert dd_fd != 0.0, "degenerate: FD saw no change"
rel = abs(dd_fd - dd_ad) / max(abs(dd_fd), 1e-12)
print(f"ns-fd: AD {dd_ad:.6e} FD {dd_fd:.6e} rel {rel:.5f}")
print(f"ns-fd-rel={rel:.6f}")
'''


def _run_code(code: str, need: str, timeout: float = 2400) -> str:
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout)
    if need not in r.stdout:
        raise RuntimeError(f"subprocess failed:\n{r.stdout[-400:]}"
                           f"\n{r.stderr[-800:]}")
    return r.stdout


def check_frame_hashes(metrics: dict) -> bool:
    """Section 3: per-scene on-TPU u8 frame sha256 vs the previous round's
    recorded hashes (VALIDATION.json).  A silent change fails."""
    import json
    import os

    _run_code(HASH_RENDER, "hashed-ok")
    with open("/tmp/val_tpu_hashes.json") as f:
        hashes = json.load(f)
    metrics["tpu_frame_hash_config"] = HASH_CONFIG
    metrics["tpu_frame_hashes"] = hashes
    prev_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "VALIDATION.json")
    prev = {}
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            doc = json.load(f)
        sec = doc.get("engines_vs_cpu", {})
        if sec.get("tpu_frame_hash_config") == HASH_CONFIG:
            prev = sec.get("tpu_frame_hashes", {})
    ok = True
    intended = os.environ.get("RTOW_HASH_INTENDED", "")
    changed = [sid for sid in hashes if sid in prev
               and prev[sid] != hashes[sid]]
    for sid in sorted(hashes, key=int):
        tag = ("NEW" if sid not in prev else
               "ok" if hashes[sid] == prev.get(sid) else "CHANGED")
        print(f"scene {sid}: {hashes[sid]}  [{tag}]")
    if changed and not intended:
        print(f"FAIL: on-chip frame hash changed for scenes {changed} "
              f"with no RTOW_HASH_INTENDED note")
        ok = False
    elif changed:
        print(f"hash change on scenes {changed} accepted: {intended}")
        metrics["tpu_frame_hash_change_note"] = intended
    return ok


def check_north_star(metrics: dict) -> bool:
    """Section 4: the BASELINE.json config (book1_final 1200x675) at
    subsampled spp — p99-vs-noise bound + fast-grad FD at that shape."""
    # spp 4: the CPU chunked reference at 1200x675 runs ~3 min/Mray-spp
    # single-process; spp 8 measured >50 min/render and tripped the
    # validator timeouts.  The reseed noise floor scales identically, so
    # the p99 ratio test is unchanged in meaning.
    spp, seed2 = 4, 31337
    for backend, engine, seed in (("cpu", "bruteforce", 1984),
                                  ("cpu", "bruteforce", seed2),
                                  ("tpu", "mega2", 1984)):
        code = (NS_RENDER.replace("{backend}", backend)
                .replace("{engine}", engine).replace("{spp}", str(spp))
                .replace("{seed}", str(seed)))
        _run_code(code, "rendered-ok", timeout=3000)
        print(f"north-star {backend}/{engine} seed={seed}: rendered",
              flush=True)
    ref = np.load(f"/tmp/val_ns_cpu_bruteforce_1984.npy")
    ref2 = np.load(f"/tmp/val_ns_cpu_bruteforce_{seed2}.npy")
    img = np.load(f"/tmp/val_ns_tpu_mega2_1984.npy")
    noise_p99 = float(np.percentile(np.abs(ref2 - ref), 99))
    p99 = float(np.percentile(np.abs(img - ref), 99))
    ratio = p99 / max(noise_p99, 1e-9)
    ok = ratio < 1.5
    print(f"north-star 1200x675@{spp}: p99 {p99:.5f} vs reseed noise "
          f"{noise_p99:.5f} -> ratio {ratio:.2f} "
          f"[{'ok' if ok else 'FAIL'}]")
    metrics["ns_p99_over_noise"] = round(ratio, 3)

    out = _run_code(NS_FASTGRAD_FD, "ns-fd-rel=", timeout=3000)
    rel = float(out.split("ns-fd-rel=")[1].split()[0])
    # 0.15: the Pallas replay backward accumulates d_rep in a single bf16
    # pass (a documented speed choice, docs/PERF.md) — measured 0.075
    # here; the tight gradient check is the rel-L1 vs the XLA replay in
    # validate_pallas_replay_tpu.py
    fd_ok = rel < 0.15
    print(f"north-star fast-grad FD (fixed tape, 1200x675 shape): "
          f"rel {rel:.5f} [{'ok' if fd_ok else 'FAIL'}]")
    metrics["ns_fastgrad_fd_rel"] = round(rel, 5)
    return ok and fd_ok


def main() -> int:
    import os

    jobs_low = [(0, 4), (4, 4), (6, 4), (8, 4)]
    jobs_conv = [(0, 4), (0, 64)]
    run("cpu", "bruteforce", jobs_low + jobs_conv)
    # Second CPU render with a fresh seed: the pure Monte-Carlo noise floor.
    # A Mosaic transcendental divergence re-rolls (at most) a pixel's sample
    # set, so the TPU-vs-CPU difference is statistically bounded above by the
    # full-reseed difference; 1.5x covers estimator noise on the p99 itself.
    run("cpu", "bruteforce", jobs_low, seed=31337)
    run("tpu", "mega", jobs_low + jobs_conv)
    run("tpu", "wavefront_pallas", jobs_low)

    ok = True
    metrics = {}
    print("\n-- low-spp pixel agreement vs the seed-to-seed noise floor --")
    for sid, spp in jobs_low:
        ref = np.load(f"/tmp/val_cpu_bruteforce_1984_{sid}_{spp}.npy")
        ref2 = np.load(f"/tmp/val_cpu_bruteforce_31337_{sid}_{spp}.npy")
        noise_p99 = float(np.percentile(np.abs(ref2 - ref), 99))
        metrics[f"scene{sid}_reseed_noise_p99"] = round(noise_p99, 5)
        for engine in ("mega", "wavefront_pallas"):
            img = np.load(f"/tmp/val_tpu_{engine}_1984_{sid}_{spp}.npy")
            d = np.abs(img - ref)
            frac = float((d.max(-1) > 1e-3).mean())
            p99 = float(np.percentile(d, 99))
            ratio = p99 / max(noise_p99, 1e-9)
            status = "ok" if ratio < 1.5 else "FAIL (exceeds reroll bound)"
            ok &= ratio < 1.5
            metrics[f"scene{sid}_{engine}_rerolled_frac"] = round(frac, 4)
            metrics[f"scene{sid}_{engine}_p99_over_noise"] = round(ratio, 3)
            print(f"scene {sid} {engine:18s}: {frac*100:5.1f}% pixels "
                  f"re-rolled, p99/noise = {ratio:.2f}  [{status}]")

    print("\n-- convergence (p99 diff must shrink ~1/sqrt(spp)) --")
    p99 = {}
    for sid, spp in jobs_conv:
        ref = np.load(f"/tmp/val_cpu_bruteforce_1984_{sid}_{spp}.npy")
        img = np.load(f"/tmp/val_tpu_mega_1984_{sid}_{spp}.npy")
        p99[spp] = float(np.percentile(np.abs(img - ref), 99))
        print(f"spp={spp:3d}: p99 |diff| = {p99[spp]:.5f}")
    shrink = p99[4] / max(p99[64], 1e-9)
    # The 1/sqrt(spp) shrink statistic presumes a meaningful re-roll
    # noise component.  After the round-5 precision fixes the TPU
    # engines agree with CPU to p99 ~0.013 at spp 4 — the residual is a
    # handful of deterministic near-tie pixels, which do not shrink with
    # spp, so the shrink test only applies above an absolute floor.
    conv_ok = (p99[4] < 0.03) or (shrink > 2.5)
    status = "ok" if conv_ok else "FAIL (bias suspected)"
    ok &= conv_ok
    print(f"p99 shrink 4->64 spp: {shrink:.1f}x (expect ~4x)  [{status}]")
    metrics["p99_diff_spp4"] = round(p99[4], 5)
    metrics["p99_diff_spp64"] = round(p99[64], 5)
    metrics["p99_shrink_4_to_64"] = round(float(shrink), 2)

    print("\n-- exact on-chip frame pinning (mega2 u8 sha256) --")
    ok &= check_frame_hashes(metrics)

    print("\n-- north-star config (BASELINE.json, subsampled spp) --")
    ok &= check_north_star(metrics)

    metrics["ok"] = bool(ok)
    out = os.environ.get("RTOW_VALIDATE_JSON")
    if out:
        import json

        with open(out, "w") as f:
            json.dump(metrics, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
