"""Child process for tests/test_distributed.py — NOT a pytest module.

Runs one process of a 2-process `jax.distributed` CPU cluster (4 virtual
devices per process), builds the 8-device global mesh, renders a small
scene with the sharded mega2 engine, and (on the primary) saves the image.

Usage: python distributed_child.py <coordinator> <num_procs> <proc_id> <out.npy>
"""

import os
import sys

# 4 virtual CPU devices per process -> 8 global devices across 2 processes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)      # match the test suite env

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracinginoneweekendincuda_tpu.models import scenes  # noqa: E402
from raytracinginoneweekendincuda_tpu.parallel import distributed  # noqa: E402
from raytracinginoneweekendincuda_tpu.parallel.render import (  # noqa: E402
    render_sharded,
)
from raytracinginoneweekendincuda_tpu.scene.compiler import (  # noqa: E402
    compile_scene,
)
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig  # noqa: E402


def main() -> int:
    coordinator, num_procs, proc_id, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    ok = distributed.initialize(coordinator_address=coordinator,
                                num_processes=num_procs, process_id=proc_id)
    assert ok, "initialize() refused with explicit coordinator args"
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == proc_id
    assert len(jax.devices()) == 4 * num_procs, jax.devices()
    assert distributed.is_primary() == (proc_id == 0)

    # sp=1 so the result is bit-identical to the single-process render
    # (the determinism contract: counter RNG on global pixel/sample ids)
    mesh = distributed.global_mesh(sample_shards=1)
    W, H, spp = 64, 48, 4
    scene, meta = compile_scene(scenes.build_scene(4), W, H,
                                dtype=np.float32)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       engine="mega2")
    img = np.asarray(render_sharded(scene, meta, cfg, mesh), np.float32)
    if distributed.is_primary():
        np.save(out, img)
    print(f"proc {proc_id}: done, img sum {float(img.sum()):.6f}",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
