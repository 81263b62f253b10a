"""Regenerate VALIDATION.json — the per-round on-chip validation artifact
(round-2 ask #8 / round-3 ask #7): runs the two on-hardware validators in
guarded subprocesses and merges their metric JSONs.

  * tools/validate_tpu.py — TPU-engine vs CPU-engine pixel agreement and
    the 1/sqrt(spp) convergence proof that Mosaic transcendental
    divergence is unbiased re-roll noise;
  * tools/validate_pallas_replay_tpu.py — Pallas custom-VJP replay lane
    agreement + gradient rel-L1 vs the XLA replay on textured/media
    scenes (the recorded form of the "5.2% marble tolerance").

Usage: python tools/make_validation.py  (writes VALIDATION.json at the
repo root; each validator retries once on a relay hang).
"""

import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_validator(script: str, out_json: str, timeout_s: float = 2400.0,
                  attempts: int = 2) -> dict:
    env = dict(os.environ, RTOW_VALIDATE_JSON=out_json,
               PYTHONPATH=ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""))
    for attempt in range(1, attempts + 1):
        if os.path.exists(out_json):
            os.unlink(out_json)
        try:
            r = subprocess.run([sys.executable, os.path.join(ROOT, script)],
                               env=env, timeout=timeout_s,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"{script}: TIMEOUT (attempt {attempt})", file=sys.stderr)
            continue
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-500:])
        if os.path.exists(out_json):
            with open(out_json) as f:
                return json.load(f)
        print(f"{script}: no JSON (rc={r.returncode}, attempt {attempt})",
              file=sys.stderr)
    return {"ok": False, "error": "validator failed/hung"}

def main() -> int:
    engines = run_validator("tools/validate_tpu.py", "/tmp/val_engines.json",
                            timeout_s=7200.0)
    replay = run_validator("tools/validate_pallas_replay_tpu.py",
                           "/tmp/val_replay.json")
    doc = {
        "date": datetime.date.today().isoformat(),
        "engines_vs_cpu": engines,
        "pallas_replay_vs_xla": replay,
        "ok": bool(engines.get("ok")) and bool(replay.get("ok")),
    }
    path = os.path.join(ROOT, "VALIDATION.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {path}: ok={doc['ok']}")
    return 0 if doc["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
