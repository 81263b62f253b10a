"""On-hardware validation: TPU-compiled engines vs the CPU reference engine.

The pytest suite runs the Pallas kernels in interpret mode (CPU), where the
mega/pallas engines are draw-exact with the XLA engines.  On real TPU
hardware, Mosaic's transcendental approximations (sin/cos/pow in the
direction samplers) differ from XLA's at the last bit, so affected paths
effectively re-roll their Monte-Carlo samples: images are *statistically*
identical but not per-draw equal.

This script verifies both properties on the real chip:
  1. per-scene pixel agreement against the CPU chunked engine at low spp
     (most pixels equal; divergent pixels bounded), and
  2. Monte-Carlo convergence: the p99 pixel difference must shrink like
     ~1/sqrt(spp) (re-roll noise), proving the divergence is unbiased.

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
    status = "ok" if shrink > 2.5 else "FAIL (bias suspected)"
    ok &= shrink > 2.5
    print(f"p99 shrink 4->64 spp: {shrink:.1f}x (expect ~4x)  [{status}]")
    metrics["p99_diff_spp4"] = round(p99[4], 5)
    metrics["p99_diff_spp64"] = round(p99[64], 5)
    metrics["p99_shrink_4_to_64"] = round(float(shrink), 2)
    metrics["ok"] = bool(ok)
    out = os.environ.get("RTOW_VALIDATE_JSON")
    if out:
        import json

        with open(out, "w") as f:
            json.dump(metrics, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
