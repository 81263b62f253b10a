import time
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np, optax
import jax.numpy as jnp
from jax.sharding import Mesh
from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.parallel import train
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig

W = int(os.environ.get("FS_W", 320))
H = int(os.environ.get("FS_H", 180))
spp = int(os.environ.get("FS_SPP", 4))
K = int(os.environ.get("FS_K", 8))
print(f"config {W}x{H}@{spp}spp K={K}", flush=True)
scene, meta = compile_scene(scenes.build_scene(0), W, H, dtype=np.float32)
scene = jax.tree.map(jnp.asarray, scene)
cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp, max_bounces=K, seed=1984)
opt = optax.adam(1e-2)
pix = np.arange(W*H, dtype=np.int32)
target = np.zeros((W*H, 3), np.float32)

mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1,1), ("px","sp"))
step = train.make_train_step_mega2(scene, meta, cfg, opt, mesh=mesh)
state = train.init_state(scene, opt)
t0 = time.time(); state, loss = step(state, pix, target)
print(f"sharded(1x1) step0 (compile): {time.time()-t0:.1f}s loss {float(loss):.5f}", flush=True)
for i in range(3):
    t0 = time.time(); state, loss = step(state, pix, target)
    print(f"sharded(1x1) step{i+1}: {(time.time()-t0)*1e3:.1f} ms loss {float(loss):.5f}", flush=True)

# reference: the existing single-chip two-phase fast step
step0 = train.make_train_step_mega2(scene, meta, cfg, opt)
s0 = train.init_state(scene, opt)
t0 = time.time(); s0, l0 = step0(s0, pix, target)
print(f"two-phase step0 (compile): {time.time()-t0:.1f}s loss {float(l0):.5f}", flush=True)
for i in range(3):
    t0 = time.time(); s0, l0 = step0(s0, pix, target)
    print(f"two-phase step{i+1}: {(time.time()-t0)*1e3:.1f} ms loss {float(l0):.5f}", flush=True)
